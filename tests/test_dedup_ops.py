"""Unit coverage for operators/dedup.py beyond the oracle queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


def test_prefix_variant_matches_naive(spark):
    """The prefix-filtered set-similarity join is result-identical to
    the inverted-index join (zero recall loss at t=0.8)."""
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    naive = {tuple(r) for r in D.jaccard_pairs(d, 0.8).collect()}
    prefix = {tuple(r) for r in D.jaccard_pairs_prefix(d, 0.8).collect()}
    assert naive == prefix
    assert len(naive) > 0, "sf0.001 should contain planted near-dups"


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([("a b",), ("one two three four",)], "text string")
    rows = df.select(D.shingles(F.col("text")).alias("sh")).collect()
    assert rows[0]["sh"] == ["a b"]  # < k tokens -> full run as one shingle
    assert rows[1]["sh"] == ["one two three", "two three four"]


def test_minhash_signature_is_min_over_band_hashes(spark):
    ds = spark.createDataFrame([(1, 5), (1, 9), (2, 5)], "doc_id long, sid int")
    sig = D.minhash_signature(ds).collect()
    by_doc = {r["doc_id"]: r for r in sig}
    a0, b0 = D.MINHASH_COEFFS[0]
    assert by_doc[1]["h0"] == min(
        (a0 * 5 + b0) % D.MINHASH_P, (a0 * 9 + b0) % D.MINHASH_P
    )
    assert by_doc[2]["h0"] == (a0 * 5 + b0) % D.MINHASH_P


def test_dot_double_matches_python(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>")
    got = df.select(D.dot_double(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    assert got == 1.0 * 4.0 + 2.0 * 5.0 + 3.0 * 6.0


def test_cosine_of_identical_vectors_is_one(spark):
    df = spark.createDataFrame([([0.5, -0.25, 0.125],)], "v array<double>")
    got = df.select(D.cosine(F.col("v"), F.col("v")).alias("c")).collect()[0]["c"]
    assert abs(got - 1.0) < 1e-12
