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
