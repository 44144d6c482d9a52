"""Mergeable quantile digest (t-digest-style, equal-weight centroids).

The rollup problem `percentile_approx` cannot serve: a warehouse wants
per-shard / per-day quantile SKETCHES it can store, union upward, and
query at any level — the quantile analogue of the HLL rollup
(aggregates.agg_hll_sketch_rollup). Spark ships mergeable HLL binaries
but no exposed mergeable quantile sketch, so this module provides one:

  * build  — per group: sort the values, cut into K equal-count chunks,
    keep (mean, count) per chunk. Deterministic for a given multiset.
  * merge  — concatenate centroid lists, sort by mean, greedily
    re-compress adjacent centroids to K. Deterministic, associative
    enough for rollups (merge order is fixed by sorting on mean).
  * quantile — interpolate the cumulative-weight curve through centroid
    means (each centroid's mass centered at its midpoint, the standard
    t-digest convention).

Rank error is bounded by the chunk mass (~n/K per centroid), i.e. a
K=64 digest answers any quantile within ~1.6 % rank error — checked by
tests/test_tolerance.py. All heavy lifting runs inside Arrow-batched
``applyInPandas`` over numpy; the driver never sees raw values.
"""

from __future__ import annotations

import numpy as np

TDIGEST_K = 64  # centroids per digest


def build_digest(values: np.ndarray, k: int = TDIGEST_K) -> tuple[np.ndarray, np.ndarray]:
    """(means, counts) of k equal-count centroids over the sorted values."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    n = v.size
    if n == 0:
        return np.array([]), np.array([], dtype=np.int64)
    k = min(k, n)
    # chunk boundaries: ceil-spread so sizes differ by at most 1
    edges = (np.arange(k + 1) * n) // k
    means = np.array([v[a:b].mean() for a, b in zip(edges[:-1], edges[1:])])
    counts = (edges[1:] - edges[:-1]).astype(np.int64)
    return means, counts


def merge_digests(
    means: np.ndarray, counts: np.ndarray, k: int = TDIGEST_K
) -> tuple[np.ndarray, np.ndarray]:
    """Merge concatenated centroid arrays back down to AT MOST k
    centroids — a hard size invariant, so digests cannot grow across
    repeated merge levels in a deep rollup tree.

    Sort by mean, then assign each centroid to the equal-mass chunk
    its cumulative starting mass falls into (chunk i covers mass
    [i·total/k, (i+1)·total/k)) and combine within chunks by weighted
    mean. One pass, deterministic, and the output has ≤ k centroids
    by construction (k distinct chunk ids exist) — unlike a greedy
    flush, whose under-full emitted chunks could reach ~2k (ADVICE
    r4). Rank error stays bounded by the chunk mass: a chunk spans at
    most target + (largest input centroid) mass, and input centroid
    masses are themselves ≤ their digests' chunk masses."""
    order = np.argsort(means, kind="stable")
    m = np.asarray(means, dtype=np.float64)[order]
    c = np.asarray(counts, dtype=np.int64)[order]
    total = int(c.sum())
    if total == 0 or m.size <= k:
        return m, c
    target = total / k
    cum_before = np.cumsum(c) - c  # mass strictly before each centroid
    bucket = np.minimum((cum_before / target).astype(np.int64), k - 1)
    out_m: list[float] = []
    out_c: list[int] = []
    for b in np.unique(bucket):
        sel = bucket == b
        w = c[sel]
        out_m.append(float(np.average(m[sel], weights=w)))
        out_c.append(int(w.sum()))
    return np.array(out_m), np.array(out_c, dtype=np.int64)


def digest_quantile(means: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Quantile estimate: piecewise-linear interpolation through the
    centroid means at their cumulative-mass midpoints."""
    m = np.asarray(means, dtype=np.float64)
    c = np.asarray(counts, dtype=np.float64)
    if m.size == 0:
        return float("nan")
    if m.size == 1:
        return float(m[0])
    total = c.sum()
    # cumulative mass midpoint of each centroid
    cum = np.cumsum(c) - c / 2.0
    rank = q * total
    if rank <= cum[0]:
        return float(m[0])
    if rank >= cum[-1]:
        return float(m[-1])
    return float(np.interp(rank, cum, m))
