"""Property-based parity tests (hypothesis) for the reference's quirky
semantics (SURVEY §2.3), checked against a from-spec Python model —
written from the survey's description of etl_supabase.py, not from its
code.

The model: per input row,
  ticker = first *truthy* of CP, ticker, else the default ('' and 0
           fall through — ref :59 uses `or`, not null-coalesce);
  year   = int(row[year_col]) where year_col is the FIRST column whose
           lowercase name is in ('năm','year') scanning left-to-right
           (ref :43-47), None when absent or null;
  data   = all other columns except {năm, year, cp, ticker}
           (case-insensitive), NaN→None (ref :53-57).
"""

from __future__ import annotations

import json
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from supabase_etl_spark.functions.nulls import truthy_coalesce
from supabase_etl_spark.functions.packing import discover_column_ci, to_jsonb_records


def model_ticker(cp, ticker, default="FPT"):
    return cp or ticker or default


def model_year_col(columns):
    for c in columns:
        if c.lower() in ("năm", "year"):
            return c
    return None


# ---------------------------------------------------------------------------

ticker_values = st.one_of(st.none(), st.sampled_from(["", "FPT", "VNM", "0", "x"]))


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(cp=ticker_values, tk=ticker_values)
def test_truthy_coalesce_matches_python_or(spark, cp, tk):
    df = spark.createDataFrame([(cp, tk)], "CP string, ticker string")
    got = df.select(
        truthy_coalesce("CP", "ticker", default="FPT", df=df).alias("t")
    ).collect()[0]["t"]
    assert got == model_ticker(cp, tk)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    names=st.permutations(["Năm", "year", "metric_a", "metric_b"]),
    drop=st.integers(min_value=0, max_value=2),
)
def test_year_discovery_is_first_match_left_to_right(spark, names, drop):
    cols = [n for n in names if drop == 0 or n not in (["Năm", "year"][:drop])]
    if not cols:
        pytest.skip("empty frame")
    df = spark.createDataFrame([tuple(1 for _ in cols)], ", ".join(f"`{c}` int" for c in cols))
    assert discover_column_ci(df) == model_year_col(cols)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    year=st.one_of(st.none(), st.integers(min_value=1990, max_value=2030)),
    metric=st.one_of(
        st.none(),
        st.just(float("nan")),
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
    ),
    cp=ticker_values,
)
def test_jsonb_records_full_model(spark, year, metric, cp):
    df = spark.createDataFrame(
        [(cp, year, metric)], "`CP` string, `Năm` int, `doanh_thu` double"
    )
    rec = to_jsonb_records(df).collect()[0]
    assert rec["ticker"] == model_ticker(cp, None)
    assert rec["year"] == year
    data = json.loads(rec["data"])
    assert set(data) == {"doanh_thu"}
    if metric is None or (isinstance(metric, float) and math.isnan(metric)):
        assert data["doanh_thu"] is None  # NaN -> JSON null (ref T4)
    else:
        assert data["doanh_thu"] == pytest.approx(metric)
