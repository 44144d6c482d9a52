"""TPC-H-shape depth suite (SURVEY.md §2.2 joins/agg/subquery depth).

The reference's analytical surface is a JSONB→table ETL; the classic
TPC-H shapes stress the same engine paths a 100 TB deployment of it
would. All 22 queries are covered: Q1/Q3/Q5 live in their original
modules (q1_pricing_summary, join_q3_shipping_priority,
join_q5_local_supplier_volume); the remaining 19 are here — selective
fact scans (Q6), EXISTS/NOT-EXISTS semi/anti joins (Q4/Q21/Q22),
multi-way star joins with year rollups (Q7/Q8/Q9/Q10), disjunctive
predicate pushdown (Q19), HAVING-gated self-aggregation (Q18),
correlated-min/avg subqueries joined back (Q2/Q15/Q17), threshold-vs-
grand-total gates (Q11/Q20), conditional counting (Q12), and outer-join
distributions (Q13/Q16).
Queries are adapted to the driver testdata's reduced schemas (no
partsupp table — lineitem serves as the part-supplier relation with
p_retailprice as the cost proxy; no l_commitdate/l_receiptdate/
l_shipmode columns — "late" means shipped >60 days after order date):
each keeps its canonical plan shape with the columns that exist.

Scale notes (100 TB read):
  * Q6 is a pure scan-agg: predicate + column pruning reach parquet
    (PushedFilters), zero shuffle beyond the final 1-row partial agg.
  * Q4/Q22 compile to semi/anti joins — no row explosion, no distinct.
  * Q7/Q10 broadcast every dimension (nation=25, customer prefiltered);
    the only big shuffle is lineitem⋈orders on orderkey.
  * Q18's HAVING subquery reuses the lineitem shuffle partitioning for
    both the per-order agg and the join back (one Exchange, AQE-reused).
  * Q19's OR-of-ANDs keeps partkey as the single equi-join key with the
    residual disjunction as a post-join filter on a broadcast part side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.queries import query
from supabase_etl_spark.queries._helpers import DEC, dsum, sql_dsum


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "scan", "agg"),
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the canonical pushdown probe — all four predicates and
    the 3-column projection must reach the parquet scan, leaving a
    map-side partial agg and a 1-row exchange (asserted in
    tests/test_plan_shapes.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "join", "semi"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (l_commitdate/l_receiptdate don't exist in the
    testdata, so "late" = shipped >60 days after order date): correlated
    EXISTS compiled as a left-semi join — lineitem is never duplicated
    into the output, so no distinct is needed and the orders side keeps
    its cardinality through the agg."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = [
        o.o_orderkey == li.l_orderkey,
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    ]
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum("volume", "revenue")}
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3')
            OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume by year. Both nation sides and
    supplier/customer are broadcast (nation=25 rows; supplier/customer
    are key+nationkey projections); the disjunctive nation pair filter
    runs post-join on broadcast dims, so the only shuffle is
    lineitem⋈orders on orderkey."""
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    c = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3") | (
        F.col("supp_nation") == "NATION_3"
    ) & (F.col("cust_nation") == "NATION_9")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, s.s_nationkey == n1.s_nk)
        .join(n2, c.c_nationkey == n2.c_nk)
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "agg", "limit"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a
    quarter. The returnflag filter is pushed into the lineitem scan;
    nation broadcasts; the top-20 compiles to TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(28,6))) AS DOUBLE) AS DOUBLE) AS promo_revenue_pct,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. part joins
    broadcast (type+key projection); the conditional and unconditional
    sums share one aggregation pass — no second scan, no self-join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           {sql_dsum("l_quantity", "total_qty")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "join", "agg", "subquery"),
    bench=True,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with very large orders — the HAVING-gated
    IN-subquery over the same fact table. The per-order qty agg and the
    main join both shuffle lineitem on l_orderkey, so AQE reuses one
    Exchange; the surviving-keys side is tiny post-HAVING and
    broadcasts back. Quantities ride the q1 integer-scale lever
    (×100 LONG sums — whole-stage-codegen long adds instead of the
    decimal path; ~12% wall at sf0.1): the >180 gate becomes >18000 on
    exact integers and total_qty = Σq2/100 is the same double as the
    oracle's decimal sum (integral quantities, sums ≪ 2^53). Overflow
    headroom is ~1.8e15 rows per partition at max quantity — five
    orders of magnitude beyond any real partition."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q2")
    )
    # r13 (guide §1.2): ONE lineitem pass. The old shape re-joined
    # lineitem against the surviving keys and re-summed q2 per order —
    # but the per-order sum IS the HAVING aggregate already computed in
    # `big`; total_qty = q/100 over the same lines, bit-identical. The
    # second lineitem scan, the big-side join and the 5-column regroup
    # all disappear; `big` is tiny post-HAVING and broadcasts into the
    # orders join.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("q2").alias("q"))
        .filter(F.col("q") > 18000)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(big)
        .join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            (F.col("q").cast("double") / 100).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "filter"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs spanning both join sides. Catalyst keeps
    p_partkey = l_partkey as the (broadcast) equi-join key and applies
    the disjunction as a residual filter; the single-side prefixes
    (brand/size, quantity range unions) are inferred and pushed into
    each scan so neither table is read in full."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
        | (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
        | (F.col("p_brand") == "Brand#33")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey, l_suppkey
    ),
    best AS (
        SELECT l_partkey AS b_partkey, min(unit_cost) AS min_cost
        FROM cost GROUP BY l_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM cost
    JOIN best ON l_partkey = b_partkey AND unit_cost = min_cost
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size BETWEEN 1 AND 25 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "join", "subquery"),
    scans=(
        "TPC-H Q2 correlated MIN(ps_supplycost) subquery re-scans partsupp (spec shape)",
        "the subquery re-scans supplier for the cost-side join (spec shape)",
        "the subquery re-scans nation (spec shape)",
        "the subquery re-scans region (spec shape)",
        "outer and subquery sides prune differently (part filter only outer), so a shared pin would widen the scan",
        "classic two-phase Q2 plans scan the cost tables twice by design",
    ),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without a partsupp table: lineitem is the
    part-supplier relation and unit cost is min(extendedprice/quantity)
    per (part, supplier) — the correlated-min subquery joined back to
    pick each part's cheapest EUROPE supplier. Per-row double division
    is IEEE-identical across engines and MIN is order-independent, so
    the equality join on min_cost admits the same rows in both. The
    region/nation/supplier chain broadcasts; the only fact shuffle is
    the (partkey, suppkey) aggregation, and AQE reuses it for the
    per-part min."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    eu_supp = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(eu_supp, li.l_suppkey == eu_supp.s_suppkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            F.col("p_size").between(1, 25) & (F.col("p_type") == "STANDARD")
        )
    )
    return (
        cost.join(
            best,
            (cost.l_partkey == best.b_partkey) & (cost.unit_cost == best.min_cost),
        )
        .join(p, cost.l_partkey == p.p_partkey)
        .join(eu_supp, cost.l_suppkey == eu_supp.s_suppkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share,
           count(*) AS n_lines
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                              AND TIMESTAMP '1996-12-31'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of ASIA-customer revenue
    for STANDARD parts, by order year. Every dimension (part filtered by
    type, supplier, both nation roles, region) broadcasts; the only
    shuffle is lineitem⋈orders on orderkey. Numerator and denominator
    accumulate in exact decimal and divide once as doubles, so the
    share is bit-stable across engines."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n1 = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(n1, F.col("c_nationkey") == n1.n_nationkey)
        .join(r, n1.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(asia_cust, o.o_custkey == asia_cust.c_custkey)
        .join(n2, s.s_nationkey == n2.s_nk)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(target.cast(DEC)).cast("double")
                / F.sum(vol.cast(DEC)).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, o_year,
           {sql_dsum("amount", "sum_profit")}
    FROM (
        SELECT n_name,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
    bench=True,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape with p_retailprice standing in for the missing
    partsupp supply cost (profit = revenue − 0.5·retail·qty): profit on
    'red' parts by supplier nation and year. part/supplier/nation
    broadcast; lineitem⋈orders on orderkey is the one big shuffle. The
    per-row amount is a fixed IEEE expression evaluated identically in
    both engines; sums accumulate in decimal."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH nation7 AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM nation7
    WHERE value > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) * 0.001
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    ORDER BY value DESC, l_partkey
    """,
    tags=("tpch", "agg", "subquery"),
    scans=(
        "TPC-H Q11 HAVING threshold = a second aggregate over the same partsupp join (spec shape)",
        "supplier/nation sides re-broadcast for the threshold branch",
    ),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value standing in for partsupp
    availqty·supplycost): parts whose NATION_7-supplied value exceeds
    0.001 of that nation's total. One aggregation computes the per-part
    values; the grand total is re-aggregated from the SAME per-part
    decimal sums (not a second scan) and broadcast as a 1-row cross
    join — at 100 TB the fact table is read once."""
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    per_part_dec = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("value_dec"))
    )
    total = per_part_dec.agg(
        (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
    )
    return (
        per_part_dec.select("l_partkey", F.col("value_dec").cast("double").alias("value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "tpch_q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus standing in for the missing
    l_shipmode; "late" = shipped >60 days after order date): late lines
    split by order priority class. The year filter is pushed into the
    lineitem scan; both conditional counts share one aggregation pass."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders-per-customer (priority filter
    standing in for the comment NOT LIKE): a left outer join keeps
    zero-order customers, the first agg shuffles on custkey, the second
    is a tiny re-agg on the count value. count(o_orderkey) ignores the
    nulls the outer join introduces — the semantic the shape tests."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q15_REV_SQL = """
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
"""


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS ({_Q15_REV_SQL})
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue — the
    view-reuse query. The per-supplier revenue agg is computed once and
    reused for both the max (1-row broadcast) and the equality filter;
    revenues are decimal sums cast to double, so the max-equality join
    admits identical rows on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "join", "agg", "anti"),
)
def tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem as the part-supplier relation;
    negative-balance suppliers standing in for complaint suppliers):
    distinct supplier counts per part attribute triple, excluding
    blacklisted suppliers via an anti join. The NOT IN compiles to a
    broadcast left-anti (supplier is tiny); count(DISTINCT) expands to
    a two-phase agg keyed on (brand, type, size, suppkey) — no
    driver-side distinct."""
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    bad = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS a_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                 / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    ) pa ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
      AND l_quantity < 0.5 * avg_qty
    """,
    tags=("tpch", "join", "agg", "subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (p_type standing in for the missing p_container):
    revenue lost to small-quantity orders — the correlated per-part
    average, expressed as an explicit per-part agg joined back (the
    de-correlated plan Catalyst would produce; written identically in
    the oracle so the avg arithmetic is shared). The per-part avg uses
    a decimal sum / count so the 0.5·avg gate is bit-stable. The
    brand/type filter broadcasts into both the agg input and probe."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == per_part.a_partkey)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS supp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
        SELECT l_partkey AS t_partkey,
               CAST(SUM(CAST(supp_qty AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
        FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN shipped ON l_suppkey = s_suppkey
    JOIN part_total ON t_partkey = l_partkey
    WHERE n_name = 'NATION_3' AND supp_qty > 0.3 * total_qty
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "semi", "subquery"),
    scans=(
        "TPC-H Q20 half-of-shipped subquery re-scans lineitem against partsupp availability (spec shape)",
        "part-name prefix filter side scans part separately from the availability branch",
    ),
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (shipped quantity standing in for partsupp
    availability): NATION_3 suppliers who shipped >30% of some red
    part's 1996 volume — the nested semi-join chain. The part-name
    filter semi-joins into the lineitem scan, per-(part,supplier) and
    per-part sums share one shuffle (AQE exchange reuse), and the
    final DISTINCT is over the already-small supplier set."""
    red = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(red, li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("supp_qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(F.col("supp_qty").cast(DEC)).cast("double").alias("total_qty")
    )
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    )
    s = load_table(spark, sf_dir, "supplier")
    nation_supp = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "s_name")
    )
    return (
        shipped.join(part_total, shipped.l_partkey == part_total.t_partkey)
        .filter(F.col("supp_qty") > F.lit(0.3) * F.col("total_qty"))
        .join(nation_supp, shipped.l_suppkey == nation_supp.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH order_stats AS (
        SELECT l_orderkey AS ok,
               count(DISTINCT l_suppkey) AS n_supps,
               count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                              THEN l_suppkey END) AS n_late_supps
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN order_stats ON ok = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND n_name = 'NATION_1'
      AND n_supps >= 2
      AND n_late_supps = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("tpch", "join", "agg", "subquery"),
    bench=True,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >60 days after order date):
    suppliers who were the sole late supplier on a multi-supplier
    finished order. The classic EXISTS/NOT-EXISTS pair over lineitem is
    rewritten as per-(order, supplier) then per-order aggregation —
    r13 collapses the previous two-consumer shape (per-order stats +
    a second late-line probe over the same join) into ONE lineitem
    pass: the sole late supplier and its late-line count ride the
    per-order aggregate as a struct, so numwait needs no join back
    into lineitem at all. At 100 TB lineitem is scanned and shuffled
    exactly once."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    # r13 (guide §1.2/§2.3): ONE lineitem pass instead of two. The old
    # shape consumed `lo` twice (per-order stats + the late-line probe),
    # re-scanning lineitem+orders and re-running the orderkey join. Now
    # lineitems collapse once to (order, supplier, late_lines); per-order
    # qualification and the sole late supplier's late-line count come
    # from one more bounded aggregate. numwait ≡ the late lines of the
    # single late supplier on qualifying orders — exactly the rows the
    # old probe counted.
    g = lo.groupBy(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_lines"))
    qual = (
        g.groupBy("ok")
        .agg(
            F.count(F.lit(1)).alias("n_supps"),
            F.sum((F.col("late_lines") > 0).cast("int")).alias("n_late_supps"),
            F.max(
                F.when(
                    F.col("late_lines") > 0,
                    F.struct(F.col("sk"), F.col("late_lines")),
                )
            ).alias("late"),
        )
        .filter((F.col("n_supps") >= 2) & (F.col("n_late_supps") == 1))
        .select(F.col("late.sk").alias("sk"), F.col("late.late_lines").alias("late_lines"))
    )
    n = F.broadcast(
        load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    )
    s = load_table(spark, sf_dir, "supplier")
    nation_supp = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "s_name")
    )
    return (
        qual.join(nation_supp, qual.sk == nation_supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    WITH threshold AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           count(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_bal
    FROM customer, threshold
    WHERE c_acctbal > threshold.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("tpch", "join", "anti", "subquery"),
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (mktsegment standing in for the phone country
    code): wealthy customers with no recent (1999+) orders. The scalar-average
    subquery broadcasts as a 1-row cross join; NOT EXISTS compiles to a
    left-anti join on custkey. The average is an exact decimal sum /
    count on both engines, so the > threshold gate admits identical
    rows bit-for-bit."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )
