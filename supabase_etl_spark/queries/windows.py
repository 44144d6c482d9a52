"""Window function surface (SURVEY.md §2.2 "Window functions").

Ranking, analytic (lag/lead/first/last/nth), aggregates over frames
(rows/range/unbounded), and top-k per group. Every window has a total
ordering (explicit tiebreak keys) so results hash-match the oracle.
Window sums run through decimal casts — frame-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.queries import query


@query(
    "window_ranking",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER()   OVER w AS rn,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           NTILE(4)       OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    ORDER BY o_custkey, rn
    """,
    tags=("window",),
    bench=True,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile / percent_rank."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
    ).orderBy("o_custkey", "rn")


@query(
    "window_analytic",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_type)  OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           LAG(value, 2, -1.0) OVER w AS value_2_back,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_event,
           NTH_VALUE(event_id, 3) OVER w AS third_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    tags=("window",),
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first / last / nth_value per user session stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.lag("value", 2, -1.0).over(w).alias("value_2_back"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
        F.nth_value("event_id", 3).over(w).alias("third_event"),
    ).orderBy("user_id", "event_id")


@query(
    "window_frames",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us(ts) AS eu,
               CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS vu
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(vu) OVER (
               PARTITION BY user_id ORDER BY eu, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0 AS moving_sum_3,
           CAST(SUM(vu) OVER (
               PARTITION BY user_id ORDER BY eu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0 AS running_total,
           CAST(SUM(vu) OVER (
               PARTITION BY user_id ORDER BY eu
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0 AS sum_last_hour,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY eu, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS cnt_3
    FROM ev
    ORDER BY user_id, event_id
    """,
    tags=("window", "frames"),
    bench=True,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg-over-window frames: sliding rows frame, running total, and a
    time-based range frame (last hour by epoch micros).

    r13 plan rewrite (the standing >2× bench row, re-measured quiet at
    0.889s and re-planned): (1) ordering everything by a materialized
    eu = unix_micros(ts) column — order-equivalent to ts since the
    timestamps ARE micros precision — lets ONE per-partition sort
    (user_id, eu, event_id) satisfy all four window specs, where the
    old ts-vs-epoch_us split forced Spark to re-sort events between
    the two Window operators; (2) the sums run over exact bigint
    1e-6 units instead of decimal(28,6) — Spark's sliding-frame
    decimal aggregation buffers cost ~2.5× a long add/remove, and the
    integer sum stays exact (peak |sum| ≈ rows_per_user × 1e9 — safe
    to ~9×10⁹ user-events) with ONE correctly-rounded double division
    at the end, bit-identical in both engines. Measured: 0.877 →
    0.407s best-of-3 at sf0.1; values unchanged at all three scales."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("eu"),
        (F.col("value").cast("decimal(18,6)") * 1000000)
        .cast("bigint")
        .alias("vu"),
    )
    w_order = Window.partitionBy("user_id").orderBy("eu", "event_id")
    w_3 = w_order.rowsBetween(-2, 0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, 0)
    w_range = (
        Window.partitionBy("user_id").orderBy("eu").rangeBetween(-3_600_000_000, 0)
    )
    units = F.lit(1000000.0)
    return ev.select(
        "user_id",
        "event_id",
        (F.sum("vu").over(w_3).cast("double") / units).alias("moving_sum_3"),
        (F.sum("vu").over(w_run).cast("double") / units).alias("running_total"),
        (F.sum("vu").over(w_range).cast("double") / units).alias("sum_last_hour"),
        F.count(F.lit(1)).over(w_3).alias("cnt_3"),
    ).orderBy("user_id", "event_id")


@query(
    "window_topk_per_group",
    oracle="""
    WITH ranked AS (
        SELECT n_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY n_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_nationkey, c_custkey, c_acctbal, rn
    FROM ranked WHERE rn <= 3
    ORDER BY n_nationkey, rn
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — the scalable top-k-per-
    group idiom (rank + filter; no global sort, no collect)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_nationkey", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("n_nationkey", "rn")
    )


@query(
    "window_cume_dist_lead_diff",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CUME_DIST() OVER w AS cdist,
           CAST(LEAD(l_quantity) OVER w - l_quantity AS DOUBLE) AS qty_delta_next
    FROM lineitem
    WHERE l_suppkey <= 5
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber)
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
    tags=("window",),
)
def window_cume_dist_lead_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + lead-difference (per-supplier quantity deltas)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.cume_dist().over(w).alias("cdist"),
        (F.lead("l_quantity").over(w) - F.col("l_quantity")).alias("qty_delta_next"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@query(
    "window_nth_value",
    oracle="""
    SELECT user_id, event_id,
           nth_value(value, 3) OVER w AS third_value,
           nth_value(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    tags=("window", "analytic"),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a running frame — the one analytic accessor not
    in window_analytic: positional lookup inside the frame (third value
    seen so far per user), null until the frame holds n rows. Same
    single per-user sort as every other window here."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.nth_value("value", 3).over(w).alias("third_value"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    ).orderBy("user_id", "event_id")


ROLLMED_FRAME = 9  # trailing rows per rolling-median window


@query(
    "window_rolling_median",
    oracle=f"""
    SELECT event_id, user_id,
           median(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {ROLLMED_FRAME - 1} PRECEDING AND CURRENT ROW
           ) AS roll_median
    FROM events
    ORDER BY event_id
    """,
    tags=("window", "timeseries"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median over a trailing {ROLLMED_FRAME}-row frame
    per user stream — the robust-smoothing window a monitoring
    pipeline prefers over rolling means under spiky metrics.

    Spark has no median window function; the frame is small and fixed,
    so the idiomatic form is collect_list over the frame →
    array_sort → midpoint (even counts average the two middles,
    DuckDB's interpolation rule). State per row is O(frame), the
    single shuffle is the per-user repartition — the same cost
    profile as any analytic window at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLMED_FRAME - 1), 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_lo = F.element_at(arr, F.floor((n + 1) / 2).cast("int"))
    mid_hi = F.element_at(arr, F.floor(n / 2).cast("int") + 1)
    return ev.select(
        "event_id",
        "user_id",
        ((mid_lo + mid_hi) / 2).alias("roll_median"),
    ).orderBy("event_id")


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, event_type, ts,
           CAST(SUM(CAST(value AS DECIMAL(28,6)))
                    OVER (PARTITION BY event_type ORDER BY ts
                          RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                                AND CURRENT ROW)
                AS DOUBLE) AS trailing_1h_value,
           CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY ts
                               RANGE BETWEEN INTERVAL '1 hour' PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
               AS trailing_1h_events
    FROM events
    WHERE event_id < 2000
    ORDER BY event_type, ts, event_id
    """,
    tags=("window", "timeseries"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: a trailing one-HOUR window (not N rows)
    per event type — the frame semantics row-count frames cannot
    express when event density varies. Spark expresses the interval
    frame as rangeBetween over exact microsecond epochs (inclusive
    bounds, matching SQL RANGE ... PRECEDING); value sums go through
    exact decimals inside the frame. Peer rows (identical ts) share a
    frame by definition in both engines, so ties cannot diverge."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("event_type")
        .orderBy(us)
        .rangeBetween(-3600 * 1000000, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias(
            "trailing_1h_value"
        ),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    ).orderBy("event_type", "ts", "event_id")


@query(
    "window_value_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
               AS n_similar_priced,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cum_band_price
    FROM orders
    ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    tags=("window",),
)
def window_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE window frame (value-based, not row- or
    time-based): for each order, statistics over the customer's other
    orders within ±10000 of its price. RANGE frames bound by VALUE
    offsets make the frame data-dependent — the companion of
    window_time_range_frame on a non-temporal axis. Partitioned by
    customer, so frames stay bounded at scale."""
    o = load_table(spark, sf_dir, "orders")
    wband = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    wcum = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(wband).cast("bigint").alias("n_similar_priced"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .over(wcum)
        .cast("double")
        .alias("cum_band_price"),
    ).orderBy("o_custkey", "o_totalprice", "o_orderkey")


@query(
    "window_distribution_functions",
    oracle="""
    WITH base AS (
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders WHERE o_orderkey <= 2000
    ),
    d AS (
        SELECT o_custkey, o_orderkey,
               round(cume_dist() OVER w, 9) AS cd,
               round(percent_rank() OVER w, 9) AS pr,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile
        FROM base
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    )
    SELECT quartile,
           CAST(count(*) AS BIGINT) AS n,
           round(min(cd), 9) AS min_cume_dist,
           round(max(cd), 9) AS max_cume_dist,
           round(max(pr), 9) AS max_percent_rank
    FROM d
    GROUP BY quartile
    ORDER BY quartile
    """,
    tags=("window",),
    uwin=(
        'orderkey <= 2000 bounded demo subset',
    ),
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTION window family in one plan — cume_dist (share of
    rows at-or-below), percent_rank ((rank−1)/(n−1)), and ntile —
    completing the ranking-window surface (row_number/rank/dense_rank
    live in window_ranking): price quartiles with their exact CDF
    boundaries. Ordering ties break on the key itself, so both engines
    see identical frames; the three functions are rational row-count
    ratios rounded at 9. The window table is orderkey-bounded here;
    the distributed-rank swap applies at corpus scale (dq_drift_ks
    note)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    d = o.select(
        F.round(F.cume_dist().over(w), 9).alias("cd"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )
    return (
        d.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("cd"), 9).alias("min_cume_dist"),
            F.round(F.max("cd"), 9).alias("max_cume_dist"),
            F.round(F.max("pr"), 9).alias("max_percent_rank"),
        )
        .orderBy("quartile")
    )
