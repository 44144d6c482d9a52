"""Oversized-cluster split for SemDeDup (`_split_oversized_clusters`).

The split bounds the pair stage's Σ n_c² under centroid skew — the
failure mode VERDICT r3 flagged as documented-but-unbuilt. These tests
exercise the split path directly (the driver's testdata never reaches
SEMDEDUP_CLUSTER_CAP, by design, so the oracle gate covers the unsplit
path and these cover the split one).

Invariants under test:
1. ceil(n_c / cap) sub-centroids per oversized cluster; small clusters
   untouched (sub_id == 0).
2. Identical embeddings ALWAYS co-assign (same argmin, same tie-break)
   — exact duplicates are never separated by a split.
3. With geometrically separable blobs the buckets respect the cap, and
   the pair stage finds exactly the within-blob duplicate pairs.
4. Row count is preserved (reassignment, not filtering).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from supabase_etl_spark.queries.llm_dedup import (
    SEMDEDUP_CLUSTER_CAP,
    _split_oversized_clusters,
    semantic_pair_stage,
)


def _normed(spark, rows):
    """rows: (vec_id, embedding:list[float], cluster_id). Adds nrm."""
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, cluster_id int")
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return df.withColumn("nrm", nrm)


def _blob_rows(n_blobs: int, per_blob: int):
    """Interleaved ids across ANGULARLY separated unit-vector blobs
    (blob b at angle b * 90°/n_blobs, within-blob jitter ~5e-4): id i
    belongs to blob i % n_blobs, so the lowest n_blobs ids are one per
    blob and row_number seeding picks one sub-centroid per blob — the
    Voronoi split is exact. Angular (not positional) separation matters
    because the pair threshold is cosine: collinear blobs at different
    magnitudes would all be near-parallel and cos≈1 across blobs."""
    rows = []
    for i in range(n_blobs * per_blob):
        blob = i % n_blobs
        theta = blob * (math.pi / 2) / n_blobs
        jitter = 1e-5 * (i // n_blobs)
        rows.append((i, [math.cos(theta) + jitter, math.sin(theta)], 0))
    return rows


def test_small_clusters_untouched(spark):
    rows = [(i, [float(i), 1.0], i % 3) for i in range(30)]
    out = _split_oversized_clusters(_normed(spark, rows), cap=50).collect()
    assert len(out) == 30
    assert all(r.sub_id == 0 for r in out)


def test_oversized_cluster_splits_to_capped_buckets(spark):
    # 6 blobs x 50 rows, one cluster of 300, cap 50 -> m = 6 sub-centroids,
    # one per blob by the interleaved-id seeding -> every bucket exactly 50.
    rows = _blob_rows(n_blobs=6, per_blob=50)
    out = _split_oversized_clusters(_normed(spark, rows), cap=50)
    sizes = out.groupBy("cluster_id", "sub_id").count().collect()
    assert len(sizes) == 6
    assert all(r["count"] == 50 for r in sizes)
    assert out.count() == 300  # reassignment preserves rows


def test_identical_embeddings_always_co_assign(spark):
    # 200 rows in one cluster over cap=40, including 10 exact-duplicate
    # pairs (identical vectors, distinct ids far apart in id order).
    rows = _blob_rows(n_blobs=4, per_blob=50)
    dup_pairs = []
    for k in range(10):
        src = rows[k * 7]
        dup_id = 1000 + k
        rows.append((dup_id, src[1], 0))
        dup_pairs.append((src[0], dup_id))
    out = _split_oversized_clusters(_normed(spark, rows), cap=40)
    sub_of = {r.vec_id: (r.cluster_id, r.sub_id) for r in out.collect()}
    for a, b in dup_pairs:
        assert sub_of[a] == sub_of[b], f"exact dup pair ({a},{b}) separated"


def test_pair_stage_finds_within_blob_dups_after_split(spark):
    # Each blob holds near-identical vectors (jitter ~1e-3 over sep=100),
    # so every within-blob pair clears cos >= 0.999 while cross-blob
    # pairs don't. After a cap-50 split the pair stage must return
    # exactly the within-blob pairs: 6 * C(50,2).
    rows = _blob_rows(n_blobs=6, per_blob=50)
    normed = _split_oversized_clusters(_normed(spark, rows), cap=50)
    pairs = semantic_pair_stage(normed, par=4, threshold=0.999)
    n = pairs.count()
    assert n == 6 * math.comb(50, 2)


def test_production_cap_constant_is_sane():
    assert SEMDEDUP_CLUSTER_CAP >= 1000  # never triggers on driver testdata
