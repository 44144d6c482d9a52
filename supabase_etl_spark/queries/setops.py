"""Sort / limit / set operations (SURVEY.md §2.2).

Union (all/distinct), intersect/except (+ ALL variants), multi-key
sorts with null placement, and global top-k (TakeOrderedAndProject —
no full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.queries import query


def _urgent(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )


def _big(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_custkey")
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n
    FROM (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    )
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserving duplicates (counted to stay order-free)."""
    u = _urgent(spark, sf_dir).unionByName(_big(spark, sf_dir))
    return u.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).orderBy("o_custkey")


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _urgent(spark, sf_dir).union(_big(spark, sf_dir)).distinct()
    return u.orderBy("o_custkey")


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent(spark, sf_dir).intersect(_big(spark, sf_dir)).orderBy("o_custkey")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect: multiplicity = min of the two sides."""
    return _urgent(spark, sf_dir).intersectAll(_big(spark, sf_dir)).orderBy("o_custkey")


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantics EXCEPT (subtract): drop every left row whose value
    appears in right at all, then dedup."""
    return _urgent(spark, sf_dir).subtract(_big(spark, sf_dir)).orderBy("o_custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 450000
    ORDER BY o_custkey
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics except: multiplicity = left minus right, floor 0."""
    return _urgent(spark, sf_dir).exceptAll(_big(spark, sf_dir)).orderBy("o_custkey")


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null
    FROM orders
    WHERE o_orderkey % 10 = 0
    ORDER BY price_or_null DESC NULLS LAST, o_orderstatus ASC, o_orderkey ASC
    """,
    tags=("sort",),
)
def sort_multi_key_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort, desc + nulls-last placement, total tiebreak.

    The comparison canonicalizer re-sorts rows, so what this checks is
    that the SAME rows survive; determinism of the displayed order is
    exercised in tests/test_plans.py via collect order.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    price_or_null = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey", "o_orderstatus", price_or_null.alias("price_or_null")
    ).orderBy(
        F.col("price_or_null").desc_nulls_last(),
        F.col("o_orderstatus").asc(),
        F.col("o_orderkey").asc(),
    )


@query(
    "limit_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def limit_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: plans as TakeOrderedAndProject — each partition
    keeps k rows, the driver merges; no global sort shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "setop_union_missing_columns",
    oracle="""
    SELECT n_nationkey AS k, n_name AS name, CAST(n_regionkey AS BIGINT) AS region, NULL AS balance
    FROM nation
    UNION ALL
    SELECT s_suppkey AS k, s_name AS name, NULL AS region, s_acctbal AS balance
    FROM supplier
    ORDER BY k, name
    """,
    tags=("setop", "schema"),
)
def setop_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): two feeds with partially
    disjoint schemas align by NAME with null-fill — the schema-drift
    union a long-lived ingest needs (positional union would silently
    misalign). The oracle spells the aligned projection explicitly."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        F.col("n_name").alias("name"),
        F.col("n_regionkey").cast("bigint").alias("region"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("balance"),
    )
    return n.unionByName(s, allowMissingColumns=True).orderBy("k", "name")
