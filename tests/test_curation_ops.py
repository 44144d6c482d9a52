"""Semantic invariants for queries/llm_curation.py at sf0.001.

The oracle gate proves cross-engine hash equality; these tests pin the
properties the hashes can't express: packing budgets, decontamination
supersets, scrub idempotence, line-dedup conservation, mixture-rate
bounds, and assignment optimality.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from supabase_etl_spark.queries import llm_curation as C
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def packs(spark):
    return C.pack_sequences(spark, SF_SMOKE).collect()


def test_pack_ids_contiguous_per_lang(packs):
    by_lang = {}
    for r in packs:
        by_lang.setdefault(r["lang"], []).append(r["pack_id"])
    for lang, ids in by_lang.items():
        assert ids == sorted(ids)
        assert ids[0] == 0
        # concat-then-split leaves no empty window before the last pack
        assert ids == list(range(len(ids))), lang


def test_pack_tokens_conserved(spark, packs):
    from supabase_etl_spark.io.readers import load_table
    from supabase_etl_spark.operators.text import token_count

    total = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.sum(token_count(F.col("text"))).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["pack_tokens"] for r in packs) == total


def test_pack_span_sane(packs):
    for r in packs:
        assert r["max_span"] >= 1
        assert r["n_docs"] >= 1


def test_decontaminate_partition(spark):
    rows = C.decontaminate_ngram(spark, SF_SMOKE).collect()
    assert rows, "no training docs"
    for r in rows:
        assert r["n_contaminated"] + r["n_clean"] == r["n_train"]
    # planted near-duplicates make some contamination near-certain
    assert sum(r["n_contaminated"] for r in rows) > 0


def test_pii_scrub_removes_all_patterns(spark):
    rows = C.text_pii_scrub(spark, SF_SMOKE).collect()
    assert rows, "planting produced no PII rows"
    # doc_id % 7 == 0 docs all carry an email
    assert all(r["n_emails"] == 1 for r in rows if r["doc_id"] % 7 == 0)
    # scrubbed text can't still match (checked via the counts having
    # come from the placeholder tokens, which only exist post-replace)
    assert all(
        r["n_phones"] >= (1 if r["doc_id"] % 11 == 0 else 0) for r in rows
    )


def test_line_dedup_conserves_lines(spark):
    rows = C.text_line_dedup(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_lines"]
        if r["n_kept"] == 0:
            assert r["clean_chars"] == 0
    # near-duplicate pairs share 8-token lines, so some doc loses lines
    assert any(r["n_kept"] < r["n_lines"] for r in rows)


def test_mixture_rates_bounded_and_sample_subset(spark):
    rows = C.sample_domain_mixture(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0.0 <= r["rate"] <= 1.0
        assert r["n_sampled"] <= r["n_docs"]
    total = sum(r["n_docs"] for r in rows)
    sampled = sum(r["n_sampled"] for r in rows)
    # LCG acceptance tracks the 60% budget loosely at tiny sf
    assert 0.3 * total <= sampled <= 0.9 * total


def test_centroid_norm_positive(spark):
    rows = C.embedding_centroids(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_vecs"] > 0
        assert r["centroid_norm"] >= 0.0
        assert r["min_mean"] <= r["max_mean"]


def test_kmeans_assignment_total_and_seeds(spark):
    from supabase_etl_spark.io.readers import load_table

    n_vecs = load_table(spark, SF_SMOKE, "embeddings").count()
    rows = C.embedding_kmeans_assign(spark, SF_SMOKE).collect()
    assert sum(r["n_members"] for r in rows) == n_vecs
    # every seed vector is distance-0 from itself => every cluster with
    # its own seed has at least that member and zero-or-positive inertia
    assert all(r["inertia"] >= 0.0 for r in rows)
    assert len(rows) <= C.KMEANS_K


def test_bloom_prefilter_prunes_without_false_negatives(spark):
    """The bloom candidate stream must contain EVERY truly contaminated
    gram occurrence (no false negatives — exactness of the final
    answer depends on it) and prune a large share of clean grams (the
    entire point of the 128 KiB broadcast at 100 TB)."""
    d = C.load_table(spark, SF_SMOKE, "documents")
    tk = d.select(
        "doc_id",
        C.tokens(F.col("text")).alias("t"),
        (C._bucket(F.col("doc_id")) < C.DECON_BENCH_PCT).alias("is_bench"),
    )
    bench_grams = (
        tk.filter("is_bench")
        .select(F.explode(C.ngrams_all(F.col("t"), C.DECON_K)).alias("g"))
        .distinct()
    )
    train_grams = tk.filter(~F.col("is_bench")).select(
        "doc_id", F.explode(C.ngrams_all(F.col("t"), C.DECON_K)).alias("g")
    )
    n_train = train_grams.count()
    true_hits = train_grams.join(bench_grams, "g").count()

    # replicate the query's candidate stage
    bloom = C._bloom_bitmap(spark, bench_grams)
    pr = train_grams
    for j in range(C.BLOOM_K_HASH):
        pr = pr.withColumn(
            f"p{j}", F.pmod(F.xxhash64("g", F.lit(j)), F.lit(C.BLOOM_M_BITS))
        )
    candidates = (
        pr.join(F.broadcast(bloom)).filter(C._bloom_hit_cond()).select("doc_id", "g")
    )
    n_cand = candidates.count()
    cand_true = candidates.join(bench_grams, "g").count()

    assert cand_true == true_hits, "bloom dropped a true contamination"
    # planted near-dups make ~5-10% of grams genuinely contaminated;
    # the bloom should not pass much beyond the true-hit mass
    assert n_cand <= true_hits + 0.05 * n_train, (
        f"bloom prefilter too weak: {n_cand} candidates, "
        f"{true_hits} true of {n_train} grams"
    )


def test_compression_ratio_golden_values(spark):
    """zlib-ratio filter: pinned golden ratios — repetitive text
    compresses far below prose; the filter flag fires only on it."""
    import zlib

    from supabase_etl_spark.queries.llm_curation import COMPRESS_MIN_RATIO

    prose = (
        "The quick brown fox jumps over the lazy dog while seventeen "
        "magistrates debated an entirely unrelated question of tariffs."
    )
    junk = "spam " * 200
    for text, expect_flag in ((prose, False), (junk, True)):
        ratio = len(zlib.compress(text.encode(), 6)) / len(text.encode())
        assert (ratio < COMPRESS_MIN_RATIO) is expect_flag
    # engine path agrees with the local computation
    df = spark.createDataFrame(
        [(1, "a", prose), (2, "a", junk)], "doc_id bigint, source string, text string"
    )
    df.createOrReplaceTempView("_cr_fixture")
    import pandas as pd

    from supabase_etl_spark.queries import load_all

    # run the registered fn against a scratch parquet dir shaped like testdata
    import os, tempfile

    tmp = tempfile.mkdtemp(prefix="crfix_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = load_all()["text_compression_ratio_filter"].fn(spark, tmp).collect()
    row = {r["source"]: r for r in out}["a"]
    assert row["n_docs"] == 2 and row["n_too_repetitive"] == 1
    assert row["min_ratio"] < COMPRESS_MIN_RATIO
