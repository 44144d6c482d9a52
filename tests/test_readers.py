"""Scan normalization: the engine-facing schema must be stable across
producer quirks (SURVEY §2.3 parity pitfalls; SCALE.md round-3 lesson 3).
"""

from __future__ import annotations

from pyspark.sql.types import TimestampType

from supabase_etl_spark.io.readers import load_table

SF = "/root/testdata/sf0.001"


def test_temporal_columns_normalize_to_timestamp(spark):
    """Engine-facing temporal type is TIMESTAMP (LTZ) regardless of how
    the producer wrote the parquet — NANOS (r1-r2 testdata) and
    micros-NTZ (r3 testdata) both normalize at the scan. Guards the
    drift class that broke every unix_micros() plan when the driver
    regenerated the data."""
    for table, col in [
        ("events", "ts"),
        ("lineitem", "l_shipdate"),
        ("orders", "o_orderdate"),
    ]:
        df = load_table(spark, SF, table)
        assert isinstance(
            df.schema[col].dataType, TimestampType
        ), f"{table}.{col}: {df.schema[col].dataType}"


def test_ts_predicate_pushes_down_after_normalization(spark):
    """The NTZ fix is scan-level (conf), not a cast projection — a ts
    range predicate must still reach the parquet scan as a pushed
    filter. A cast-based normalization would silently disable this."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events").filter(
        F.col("ts") >= F.lit("2024-01-02").cast("timestamp")
    )
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan
