"""Property-based invariants for the mergeable quantile digest
(operators/tdigest.py) — pure numpy, no Spark session, so hypothesis
can explore aggressively.

The contract a rollup pipeline depends on:
  * mass conservation — build and merge never lose or invent weight;
  * permutation invariance — the digest of a multiset is unique;
  * bounded rank error — any quantile answered within 2/K;
  * quantile monotonicity — q1 <= q2 ⇒ est(q1) <= est(q2);
  * merge soundness — a digest merged from arbitrary shards answers
    within the same bound as one built over the whole array.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from supabase_etl_spark.operators import tdigest as TD

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
arrays = st.lists(finite, min_size=1, max_size=2000)


@given(arrays)
@settings(max_examples=60, deadline=None)
def test_build_conserves_mass_and_is_permutation_invariant(xs):
    x = np.array(xs)
    m1, c1 = TD.build_digest(x)
    assert int(c1.sum()) == x.size
    rng = np.random.default_rng(0)
    m2, c2 = TD.build_digest(rng.permutation(x))
    assert np.array_equal(m1, m2) and np.array_equal(c1, c2)
    # centroid means are sorted (digest is an ordered summary)
    assert np.all(np.diff(m1) >= 0)


@given(arrays, st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_rank_error_and_monotonicity(xs, qs):
    x = np.sort(np.array(xs))
    m, c = TD.build_digest(x)
    # chunk-mass bound plus interpolation granularity: below n=K every
    # centroid is a lone point and the piecewise-linear curve can sit
    # anywhere between adjacent ranks, so 1/n enters the bound
    tol = 2.0 / TD.TDIGEST_K + 1.0 / x.size
    ests = [TD.digest_quantile(m, c, q) for q in sorted(qs)]
    # monotone in q
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))
    for q, est in zip(sorted(qs), ests):
        lo = np.searchsorted(x, est, side="left") / x.size
        hi = np.searchsorted(x, est, side="right") / x.size
        # the estimate's plausible rank interval must intersect [q±tol]
        assert lo - tol <= q <= hi + tol, (q, est, lo, hi)
    # estimates stay inside the data range
    assert min(ests) >= x[0] - 1e-9 and max(ests) <= x[-1] + 1e-9


@given(arrays, st.integers(min_value=1, max_value=9))
@settings(max_examples=40, deadline=None)
def test_merge_of_shards_matches_whole(xs, n_shards):
    x = np.array(xs)
    shards = np.array_split(x, min(n_shards, x.size))
    ms, cs = [], []
    for s in shards:
        if s.size == 0:
            continue
        m, c = TD.build_digest(s)
        ms.append(m)
        cs.append(c)
    mm, mc = TD.merge_digests(np.concatenate(ms), np.concatenate(cs))
    assert int(mc.sum()) == x.size
    xs_sorted = np.sort(x)
    tol = 2.0 / TD.TDIGEST_K + 1.0 / max(1, min(n_shards, x.size)) + 1.0 / x.size
    for q in (0.1, 0.5, 0.9):
        est = TD.digest_quantile(mm, mc, q)
        lo = np.searchsorted(xs_sorted, est, side="left") / x.size
        hi = np.searchsorted(xs_sorted, est, side="right") / x.size
        assert lo - tol <= q <= hi + tol, (q, est, lo, hi)


def test_merge_size_invariant_deep_rollup():
    """Digests must not grow across merge levels: merging merged
    digests repeatedly stays at <= K centroids with total mass
    conserved (the hard invariant ADVICE r4 asked to pin)."""
    import numpy as np

    from supabase_etl_spark.operators import tdigest as TD

    rng = np.random.default_rng(11)
    data = rng.exponential(scale=3.0, size=40_000)
    # level 0: 64 shard digests
    digests = [TD.build_digest(s) for s in np.array_split(data, 64)]
    level = 0
    while len(digests) > 1:
        level += 1
        nxt = []
        for i in range(0, len(digests), 4):  # 4-way merge fan-in
            group = digests[i : i + 4]
            m = np.concatenate([g[0] for g in group])
            c = np.concatenate([g[1] for g in group])
            mm, mc = TD.merge_digests(m, c)
            assert mm.size <= TD.TDIGEST_K, (level, mm.size)
            assert int(mc.sum()) == sum(int(g[1].sum()) for g in group)
            nxt.append((mm, mc))
        digests = nxt
    mm, mc = digests[0]
    assert int(mc.sum()) == data.size
    v = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = TD.digest_quantile(mm, mc, q)
        rank = np.searchsorted(v, est) / v.size
        assert abs(rank - q) <= 2.0 / TD.TDIGEST_K, (q, rank)
