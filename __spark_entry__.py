"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(supabase_etl_spark/queries): the driver smoke-checks ``entry(spark)``,
runs each ``queries()[name]`` at sf=0.01 and compares against
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001."""
    from supabase_etl_spark.queries import load_all

    registry = load_all()
    return registry["q1_pricing_summary"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from supabase_etl_spark.queries import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    from supabase_etl_spark.queries import load_all

    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
