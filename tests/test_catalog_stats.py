"""CBO is real, not a flag (VERDICT r1 item 8): collecting catalog
statistics must visibly change physical plans.

The probe is a Q5-shaped join (lineitem ⋈ filtered orders) sized so the
no-stats estimate (file bytes, column-pruned) exceeds a small broadcast
threshold while the stats-based estimate (post-filter row count from
min/max) falls below it: ANALYZE flips SortMergeJoin →
BroadcastHashJoin with no query change.
"""

from __future__ import annotations

import pytest

from supabase_etl_spark.catalog import analyze_tables, register_catalog_tables

SF = "/root/testdata/sf0.001"

Q5_SHAPE = """
SELECT l_orderkey, sum(l_quantity) AS sq
FROM cbo_lineitem JOIN cbo_orders ON l_orderkey = o_orderkey
WHERE o_orderkey <= 20
GROUP BY l_orderkey
"""


@pytest.fixture()
def tight_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _join_node(spark):
    plan = spark.sql(Q5_SHAPE)._jdf.queryExecution().executedPlan().toString()
    if "BroadcastHashJoin" in plan:
        return "BroadcastHashJoin"
    if "SortMergeJoin" in plan:
        return "SortMergeJoin"
    return plan


@pytest.fixture()
def cbo_tables(spark):
    tables = register_catalog_tables(
        spark, SF, names=("lineitem", "orders"), prefix="cbo_"
    )
    yield tables
    # teardown must run on assertion failure too: a leaked catalog table
    # perturbs any later test resolving the same name in this session
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_analyze_flips_join_strategy(spark, tight_broadcast, cbo_tables):
    assert _join_node(spark) == "SortMergeJoin"  # file-size estimate: too big

    analyze_tables(spark, cbo_tables)
    assert _join_node(spark) == "BroadcastHashJoin"  # stats: 20 rows survive

    # and the optimizer now knows the filtered cardinality exactly
    filtered = spark.sql("SELECT * FROM cbo_orders WHERE o_orderkey <= 20")
    row_count = (
        filtered._jdf.queryExecution().optimizedPlan().stats().rowCount().toString()
    )
    assert row_count != "None"  # Some(n): defined, not a size-only guess
