"""asof_join strict (allow_exact_matches=False) semantics, including
the direction='nearest' case the advisor flagged as silently ignored."""

from __future__ import annotations

import datetime as dt

from supabase_etl_spark.operators.joins import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _frames(spark):
    left = spark.createDataFrame(
        [("u", 1, _t(10))], "k string, lid int, lts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _t(7), "early"), ("u", _t(10), "exact"), ("u", _t(12), "late")],
        "k string, rts timestamp, tag string",
    )
    return left, right


def test_nearest_default_prefers_exact(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lts", "rts", ["lid"], direction="nearest")
    assert out.collect()[0]["tag"] == "exact"


def test_nearest_strict_excludes_exact(spark):
    """strict+nearest must skip the exact-time row and take the
    closest non-equal one (here: +2 min 'late' beats -3 min 'early')."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["k"], "lts", "rts", ["lid"], direction="nearest", strict=True
    )
    assert out.collect()[0]["tag"] == "late"


def test_nearest_strict_tie_resolves_backward(spark):
    """Equidistant non-exact candidates: pandas resolves to the
    earlier (backward) row."""
    left = _frames(spark)[0]
    right = left.sparkSession.createDataFrame(
        [("u", _t(8), "back"), ("u", _t(12), "fwd")],
        "k string, rts timestamp, tag string",
    )
    out = asof_join(
        left, right, ["k"], "lts", "rts", ["lid"], direction="nearest", strict=True
    )
    assert out.collect()[0]["tag"] == "back"


def test_backward_strict_still_works(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["k"], "lts", "rts", ["lid"], direction="backward", strict=True
    )
    assert out.collect()[0]["tag"] == "early"
