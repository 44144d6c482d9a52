"""Relational core: scan, filter, project, scalar expressions, agg.

Covers SURVEY.md §2.2 "Projection / filter / scalar expressions" plus
the flagship pricing-summary aggregate (§7.2 minimum slice). All
queries are single-pass columnar plans: parquet scan with pushed
filters -> whole-stage-codegen expressions -> partial+final hash agg ->
sort. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from supabase_etl_spark.io.readers import load_table
from supabase_etl_spark.queries import query
from supabase_etl_spark.queries._helpers import sql_dsum


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
               AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
               AS sum_base_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000)
                         AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                               * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
               AS sum_charge,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100
               / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
               / COUNT(*) AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100
               / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "scan"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed filter -> hash agg -> sort.

    Reference has no aggregation at all (SURVEY §2.1 'explicitly
    absent'); this is the flagship of the generalized surface.

    Exact sums via the HIERARCHICAL integer-scale lever (SCALE.md r8):
    money values are fixed-point (≤6dp after the product), so each row
    reduces to scaled BIGINTs and the per-partition partial sums run in
    pure long arithmetic (whole-stage codegen, no per-row decimal).
    Only the partition-partial table — O(partitions × groups) rows —
    merges through decimal(38,0), so the total cannot overflow at any
    corpus size while per-row cost stays integer. Per-partition bound:
    a 128 MB parquet partition holds <5M rows × <1e11 scaled value
    = <5e17 « 2^63. Measured 1.7× faster than the per-row decimal(28,6)
    cast at sf0.1 (1.22s → 0.73s) with identical cross-engine values
    (both engines round the same IEEE double, then sum exactly)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    base = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("q2"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("p2"),
        F.round(disc_price * 1000000, 0).cast("long").alias("d6"),
        F.round(charge * 1000000, 0).cast("long").alias("c6"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("di2"),
        F.spark_partition_id().alias("pid"),
    )
    # CHECKED long sums: the <8.4e7-rows-per-partition invariant the
    # integer-scale lever rests on is enforced, not assumed — try_sum
    # nulls on 64-bit overflow (including inside partial-agg buffers),
    # and the coalesce turns that into a loud error instead of the
    # silent wraparound of a plain long SUM (ADVICE r8, low)
    def checked(c: str):
        return F.coalesce(
            F.try_sum(c),
            F.raise_error(
                F.lit(
                    f"q1 integer-scale partial sum overflow in {c} — "
                    "input partition exceeds the documented row bound"
                )
            ).cast("bigint"),
        ).alias(c)

    part = base.groupBy("pid", "l_returnflag", "l_linestatus").agg(
        checked("q2"),
        checked("p2"),
        checked("d6"),
        checked("c6"),
        checked("di2"),
        F.count(F.lit(1)).alias("n"),
    )
    dec = "decimal(38,0)"
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(F.col("q2").cast(dec)).cast("double") / 100).alias("sum_qty"),
            (F.sum(F.col("p2").cast(dec)).cast("double") / 100).alias(
                "sum_base_price"
            ),
            (F.sum(F.col("d6").cast(dec)).cast("double") / 1000000.0).alias(
                "sum_disc_price"
            ),
            (F.sum(F.col("c6").cast(dec)).cast("double") / 1000000.0).alias(
                "sum_charge"
            ),
            (F.sum(F.col("q2").cast(dec)).cast("double") / 100 / F.sum("n")).alias(
                "avg_qty"
            ),
            (F.sum(F.col("p2").cast(dec)).cast("double") / 100 / F.sum("n")).alias(
                "avg_price"
            ),
            (F.sum(F.col("di2").cast(dec)).cast("double") / 100 / F.sum("n")).alias(
                "avg_disc"
            ),
            F.sum("n").cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 50000
      AND o_orderpriority LIKE '1-%'
      AND o_custkey IS NOT NULL
      AND NOT (o_orderstatus = 'F' AND o_totalprice > 40000)
    ORDER BY o_orderkey
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison, boolean algebra, IN, BETWEEN, LIKE, null predicates.

    All of these compile to data-source filters (PushedFilters in the
    parquet scan) — verified in tests/test_plans.py.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .filter(F.col("o_totalprice").between(1000, 50000))
        .filter(F.col("o_orderpriority").like("1-%"))
        .filter(F.col("o_custkey").isNotNull())
        .filter(~((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 40000)))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "project_rename_cast",
    oracle="""
    SELECT c_custkey AS custkey,
           CAST(c_custkey AS VARCHAR) AS custkey_str,
           CAST(trunc(c_acctbal) AS INTEGER) AS acctbal_int,
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS acctbal_dec_str,
           upper(c_mktsegment) AS segment
    FROM customer
    ORDER BY custkey
    """,
    tags=("project", "cast"),
)
def project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection, rename, casts int/string/decimal (ref T2 generalized)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_custkey").cast("string").alias("custkey_str"),
        F.col("c_acctbal").cast("int").alias("acctbal_int"),
        F.col("c_acctbal").cast("decimal(18,2)").cast("string").alias("acctbal_dec_str"),
        F.upper("c_mktsegment").alias("segment"),
    ).orderBy("custkey")


@query(
    "null_handling",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
           CASE WHEN o_totalprice > 30000 THEN NULL ELSE o_totalprice END AS maybe_price,
           COALESCE(CASE WHEN o_totalprice > 30000 THEN NULL ELSE o_totalprice END, -1.0)
             AS price_filled,
           (CASE WHEN o_totalprice > 30000 THEN NULL ELSE o_totalprice END IS NULL)
             AS price_is_null
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("nulls",),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / nullif / isnull surface (ref T2/T4/T6 generalized).

    Testdata has no natural nulls, so nulls are manufactured with
    nullif/CASE conditionals, then handled — same shape the
    reference's NaN→null normalization takes (etl_supabase.py:57).
    """
    o = load_table(spark, sf_dir, "orders")
    maybe_price = F.when(F.col("o_totalprice") > 30000, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_or_default"
        ),
        maybe_price.alias("maybe_price"),
        F.coalesce(maybe_price, F.lit(-1.0)).alias("price_filled"),
        maybe_price.isNull().alias("price_is_null"),
    ).orderBy("o_orderkey")


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           trim(concat('  ', p_type, '  ')) AS type_trimmed,
           substring(p_name, 1, 5) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_underscored,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           strpos(p_name, 'a') AS first_a,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devoweled,
           split_part(p_type, ' ', 1) AS type_token0
    FROM part
    ORDER BY p_partkey
    """,
    tags=("strings",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface (SURVEY §2.2 string fns)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit("  "))).alias("type_trimmed"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_underscored"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devoweled"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_token0"),
    ).orderBy("p_partkey")


@query(
    "datetime_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(o_orderdate AS DATE) AS order_date_only,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           dayofweek(o_orderdate) AS order_dow,
           quarter(o_orderdate) AS order_quarter,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("datetime",),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface; session TZ is UTC for determinism.

    Note DuckDB dayofweek is 0=Sunday..6; Spark dayofweek is
    1=Sunday..7 — bridged with -1 on the Spark side? No: bridged by
    using (dayofweek - 1) in Spark to match DuckDB's numbering.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.col("o_orderdate").cast("date").alias("order_date_only"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    ).orderBy("o_orderkey")


@query(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price_rounded,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           abs(l_extendedprice - 1000.0) AS price_abs_dev,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(exp(l_discount), 6) AS disc_exp,
           round(ln(l_extendedprice + 1.0), 6) AS price_ln,
           round(pow(l_quantity, 2), 6) AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_extendedprice - 1000.0) AS DOUBLE) AS price_sign,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_quantity, l_discount * 100) AS l
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("math",),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface. Per-row IEEE double ops are bit-identical
    across engines; transcendentals (sqrt/exp/ln/pow) are rounded to
    6 dp because libm implementations may differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice"), 2).alias("price_rounded"),
            F.floor("l_extendedprice").cast("double").alias("price_floor"),
            F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
            F.abs(F.col("l_extendedprice") - 1000.0).alias("price_abs_dev"),
            F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
            F.round(F.exp("l_discount"), 6).alias("disc_exp"),
            F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
            F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod7"),
            F.signum(F.col("l_extendedprice") - 1000.0).alias("price_sign"),
            F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
            F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("l"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                WHEN o_totalprice < 400000 THEN 'large'
                ELSE 'jumbo' END AS price_band,
           CASE o_orderstatus WHEN 'O' THEN 'open'
                              WHEN 'F' THEN 'finished'
                              ELSE 'other' END AS status_name
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("conditional",),
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searched + simple CASE (SURVEY §2.2 conditional)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .when(F.col("o_totalprice") < 400000, "large")
        .otherwise("jumbo")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_name"),
    ).orderBy("o_orderkey")


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
           round(CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS DOUBLE), 6)
             AS elem_sum_f,
           round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS elem_max,
           round(CAST(list_aggregate(embedding, 'min') AS DOUBLE), 6) AS elem_min,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           round(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS sorted_first,
           len(list_distinct(embedding)) AS n_distinct,
           round(CAST(list_transform(embedding, x -> x * 2)[1] AS DOUBLE), 6) AS doubled_first
    FROM embeddings
    ORDER BY vec_id
    """,
    tags=("arrays",),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function surface over embeddings.embedding.

    Aggregation over the float array stays in float (like DuckDB's
    list_aggregate on FLOAT[]) and is rounded at the boundary.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_elem"),
        F.round(
            F.aggregate(emb, F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double")), 6
        ).alias("elem_sum_f"),
        F.round(F.array_max(emb).cast("double"), 6).alias("elem_max"),
        F.round(F.array_min(emb).cast("double"), 6).alias("elem_min"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(F.element_at(F.sort_array(emb), 1).cast("double"), 6).alias("sorted_first"),
        F.size(F.array_distinct(emb)).alias("n_distinct"),
        F.round(F.element_at(F.transform(emb, lambda x: x * 2), 1).cast("double"), 6).alias(
            "doubled_first"
        ),
    ).orderBy("vec_id")


@query(
    "explode_posexplode",
    oracle="""
    WITH exploded AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS val
        FROM embeddings
        WHERE vec_id < 10
    )
    SELECT vec_id, CAST(pos AS INTEGER) AS pos, round(CAST(val AS DOUBLE), 6) AS val
    FROM exploded
    WHERE pos < 8
    ORDER BY vec_id, pos
    """,
    tags=("arrays", "explode"),
)
def explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral unnest) of the embedding array."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .select("vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val"))
        .orderBy("vec_id", "pos")
    )


@query(
    "json_functions",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           json_extract_string(props, '$.k') AS k_str,
           (json_extract(props, '$.missing') IS NOT NULL) AS has_missing,
           to_json(struct_pack(event_id := event_id, event_type := event_type)) AS packed
    FROM events
    ORDER BY event_id
    """,
    tags=("json",),
)
def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON surface over events.props (a JSON object string) — ref T5.

    get_json_object extracts; to_json(struct) packs — the reference's
    pack-to-JSONB (etl_supabase.py:53-66) as one columnar expression.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
        F.to_json(F.struct("event_id", "event_type")).alias("packed"),
    ).orderBy("event_id")


@query(
    "sql_entry_point",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("sql",),
)
def sql_entry_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine.sql(...) lifecycle (SURVEY §3): temp views + SQL text
    through the full parser -> analyzer -> Catalyst -> codegen path."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_acctbal
        FROM customer
        WHERE c_acctbal > 0
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "map_functions",
    oracle="""
    WITH m AS (
        SELECT event_id,
               MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)} AS meta
        FROM events WHERE event_id < 200
    )
    SELECT event_id,
           array_to_string(list_sort(map_keys(meta)), ',') AS keys_csv,
           array_to_string(list_sort(map_values(meta)), ',') AS vals_csv,
           meta['type'][1] AS type_val,
           cardinality(meta) AS n_entries
    FROM m
    ORDER BY event_id
    """,
    tags=("maps",),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map surface (SURVEY §2.2 "map fns", the ref T5 open-schema
    payload shape): create_map, map_keys, map_values, element_at,
    size — emitted as sorted scalars so MAP representation differences
    between engines never reach the comparator."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    meta = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(meta)), ",").alias("keys_csv"),
        F.array_join(F.array_sort(F.map_values(meta)), ",").alias("vals_csv"),
        F.element_at(meta, "type").alias("type_val"),
        F.size(meta).alias("n_entries"),
    ).orderBy("event_id")


@query(
    "map_explode_entries",
    oracle="""
    WITH m AS (
        SELECT event_id,
               MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)} AS meta
        FROM events WHERE event_id < 100
    ),
    e AS (SELECT event_id, unnest(map_entries(meta)) AS ent FROM m)
    SELECT event_id, ent.key AS k, ent.value AS v
    FROM e
    ORDER BY event_id, k
    """,
    tags=("maps", "explode"),
)
def map_explode_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode of a map column into (key, value) rows."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    meta = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return (
        ev.select("event_id", F.explode(meta).alias("k", "v"))
        .orderBy("event_id", "k")
    )


_EXISTS_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("sql_exists_subquery", oracle=_EXISTS_SQL, tags=("sql", "subquery"))
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): Catalyst rewrites the
    correlated predicate into a left-semi join on the correlation key —
    no per-row subquery execution ever happens (RewritePredicateSubquery
    — the de-correlation that makes this shape scale)."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


_CORR_SCALAR_SQL = """
    SELECT l.l_partkey,
           COUNT(*) AS n_small_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS small_qty
    FROM lineitem l
    WHERE l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
"""


@query(
    "sql_correlated_scalar_subquery",
    oracle=_CORR_SCALAR_SQL,
    tags=("sql", "subquery"),
)
def sql_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): the per-partkey
    average is de-correlated into one aggregate over lineitem joined
    back on the correlation key (RewriteCorrelatedScalarSubquery) — one
    extra agg + join, not N subquery executions. AVG compares, it is
    not projected, so float averaging stays inside the predicate and
    both engines agree (the projected aggregates use exact decimal)."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CORR_SCALAR_SQL)


@query(
    "sql_recursive_date_spine",
    oracle="""
    WITH RECURSIVE days(day) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT day + 1 FROM days WHERE day < DATE '1995-03-31'
    )
    SELECT days.day AS day, count(o_orderkey) AS n_orders
    FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = days.day
    GROUP BY days.day
    ORDER BY day
    """,
    tags=("sql", "recursive"),
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (native in Spark 4): a generated calendar spine
    left-joined to orders — the gap-filling pattern that keeps days
    with zero orders in a time series. Recursion is driver-bounded
    (91 iterations building a tiny spine); the join against the fact
    table is an ordinary broadcast of the spine."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE days(day) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT date_add(day, 1) FROM days WHERE day < DATE '1995-03-31'
        )
        SELECT days.day AS day, count(o_orderkey) AS n_orders
        FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = days.day
        GROUP BY days.day
        ORDER BY day
        """
    )


@query(
    "sql_variant_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("sql", "json", "variant"),
)
def sql_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for open-schema payloads: parse_json into
    the binary VARIANT encoding once, typed variant_get extraction after
    — the shredded-JSON answer to the reference's JSONB `data` column
    (etl_supabase.py:61-66) that skips per-access string re-parsing.
    Oracle uses DuckDB's JSON type for the same extraction."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n,
               SUM(variant_get(parse_json(props), '$.k', 'bigint')) AS sum_k,
               min(variant_get(parse_json(props), '$.k', 'bigint')) AS min_k,
               max(variant_get(parse_json(props), '$.k', 'bigint')) AS max_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
        """
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) o
    WHERE c.c_custkey <= 300
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
"""


@query("sql_lateral_topn", oracle=_LATERAL_SQL, tags=("sql", "subquery"))
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT (the
    SQL-standard spelling of top-N-per-group). Catalyst de-correlates
    the limit into a rank-over-partition plan — same physical shape as
    the window top-k, but reachable from plain SQL; DuckDB runs the
    identical text."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


PARAM_MIN_PRICE = 150_000.0
PARAM_STATUS = "O"


@query(
    "sql_parameterized",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice >= {PARAM_MIN_PRICE} AND o_orderstatus = '{PARAM_STATUS}'
    ORDER BY o_orderkey
    """,
    tags=("sql",),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 `spark.sql(query, args=...)`): named
    placeholders bound server-side instead of f-string splicing — the
    injection-safe entry point an engine exposes to applications. The
    bound literal participates in constant folding and predicate
    pushdown exactly like an inline one."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        ORDER BY o_orderkey
        """,
        args={"min_price": PARAM_MIN_PRICE, "status": PARAM_STATUS},
    )


@query(
    "sql_pivot_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql", "pivot"),
)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL `PIVOT` clause (not the DataFrame .pivot API — that is
    agg_pivot): explicit IN-list so the output schema is plan-time
    static, which is what lets Catalyst compile the pivot to one
    hash aggregate with conditional partials instead of a two-phase
    distinct-then-pivot. Oracle spells the same thing as portable
    CASE sums."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, f_orders, o_orders, p_orders
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders)
        PIVOT (
            count(*) FOR o_orderstatus IN ('F' AS f_orders, 'O' AS o_orders, 'P' AS p_orders)
        )
        ORDER BY o_orderpriority
        """
    ).select(
        "o_orderpriority",
        F.coalesce("f_orders", F.lit(0)).alias("f_orders"),
        F.coalesce("o_orders", F.lit(0)).alias("o_orders"),
        F.coalesce("p_orders", F.lit(0)).alias("p_orders"),
    )


@query(
    "sql_group_by_all",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql",),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the 2023 SQL conveniences both
    Spark 3.4+ and DuckDB adopted): every non-aggregate select item
    becomes a grouping key, so adding a dimension to the projection
    can't silently desync the GROUP BY list; ORDER BY ALL sorts by
    every select item left-to-right — deterministic HERE because the
    leading items (returnflag, linestatus) are the grouping key and
    therefore unique. Both engines run the real syntax. Plan is the
    ordinary hash aggregate + sort — the sugar is purely
    analysis-time."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        FROM lineitem
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_unpivot_syntax",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_price,
               CAST(count(*) AS DOUBLE) AS n_orders
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, metric, val
    FROM wide UNPIVOT (val FOR metric IN (total_price, n_orders))
    ORDER BY o_orderpriority, metric
    """,
    tags=("sql", "agg"),
)
def sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard UNPIVOT clause (the syntax twin of
    agg_unpivot's stack()-based form and sql_pivot_syntax): a wide
    per-priority metric table relationalized to (key, metric, value)
    rows. Spark expands UNPIVOT to the same Expand node as stack —
    one pass, no shuffle beyond the feeding aggregate."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH wide AS (
            SELECT o_orderpriority,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                     AS total_price,
                   CAST(count(*) AS DOUBLE) AS n_orders
            FROM orders GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, metric, val
        FROM wide UNPIVOT (val FOR metric IN (total_price, n_orders))
        ORDER BY o_orderpriority, metric
        """
    )


@query(
    "sql_scalar_function",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "net_revenue")},
           CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bulk
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("sql", "udf"),
)
def sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (Spark 4 CREATE FUNCTION ... RETURN expr): the
    function body is pure SQL, so Catalyst INLINES it at analysis time
    — unlike a Python UDF there is no serialization boundary, the
    inlined expression folds/pushes down like hand-written SQL and
    whole-stage codegen covers it. The one UDF form that is free at
    100 TB. The oracle states the inlined semantics directly."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS net_rev")
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS is_bulk")
    spark.sql(
        "CREATE TEMPORARY FUNCTION net_rev(price DOUBLE, disc DOUBLE) "
        "RETURNS DOUBLE RETURN price * (1 - disc)"
    )
    spark.sql(
        "CREATE TEMPORARY FUNCTION is_bulk(qty DOUBLE) "
        "RETURNS INT RETURN CASE WHEN qty >= 30 THEN 1 ELSE 0 END"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(net_rev(l_extendedprice, l_discount)
                    AS DECIMAL(28,6))) AS DOUBLE) AS net_revenue,
               CAST(SUM(is_bulk(l_quantity)) AS BIGINT) AS n_bulk
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "sql_identifier_clause",
    oracle="""
    SELECT o_orderpriority AS grp,
           count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY grp
    ORDER BY grp
    """,
    tags=("sql",),
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER(:param) — injection-safe dynamic SQL over table AND
    column names (the templated-job surface: one statement text, many
    tables/grains). The identifier binds at analysis time, so the plan
    is indistinguishable from the literal query — pushdown, pruning
    and codegen all apply; string-concatenated SQL gets none of that
    safety."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp_col) AS grp,
               count(*) AS n,
               CAST(SUM(CAST(IDENTIFIER(:val_col) AS DECIMAL(28,6)))
                    AS DOUBLE) AS total
        FROM IDENTIFIER(:tbl)
        GROUP BY grp
        ORDER BY grp
        """,
        args={"tbl": "orders", "grp_col": "o_orderpriority", "val_col": "o_totalprice"},
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_linestatus,
           count(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_quantity >= 10
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("sql",),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators, the GoogleSQL-style
    linear dataflow dialect): each stage reads top-to-bottom like a
    DataFrame chain while remaining pure SQL. Parses to the identical
    logical plan as the nested form — the oracle is that nested
    spelling."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_quantity >= 10
        |> AGGREGATE count(*) AS n_lines,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
           GROUP BY l_linestatus
        |> SELECT l_linestatus, n_lines, revenue
        |> ORDER BY l_linestatus
        """
    )


REACH_SEED = 7  # start part for the reachability walk (co-purchased at every SF)
REACH_DEPTH = 3


@query(
    "sql_recursive_reachability",
    oracle=f"""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
              WHERE l_orderkey <= 500) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
              WHERE l_orderkey <= 500) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ),
    reach(node, depth) AS (
        SELECT CAST({REACH_SEED} AS BIGINT), 0
        UNION ALL
        SELECT e.v, r.depth + 1
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.depth < {REACH_DEPTH}
    )
    SELECT node, CAST(min(depth) AS INT) AS hops
    FROM reach
    GROUP BY node
    ORDER BY hops, node
    """,
    tags=("sql", "graph"),
)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE doing GRAPH TRAVERSAL (a join in the recursive
    term, unlike the generator-shaped date spine): breadth-limited
    transitive closure over the co-purchase graph from one seed part,
    reporting each reachable part's minimum hop count. Spark 4's
    WITH RECURSIVE iterates the recursive leg until fixpoint or the
    depth guard — each iteration is one equi-join against the static
    edge list, the same Pregel shape as the hand-rolled
    label-propagation loop but expressed declaratively. The depth
    bound is what keeps UNION ALL's path multiplicity finite; the
    closing GROUP BY min(depth) collapses it."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE edges AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                  WHERE l_orderkey <= 500) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                  WHERE l_orderkey <= 500) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        ),
        reach(node, depth) AS (
            SELECT CAST({REACH_SEED} AS BIGINT), 0
            UNION ALL
            SELECT e.v, r.depth + 1
            FROM reach r JOIN edges e ON e.u = r.node
            WHERE r.depth < {REACH_DEPTH}
        )
        SELECT node, CAST(min(depth) AS INT) AS hops
        FROM reach
        GROUP BY node
        ORDER BY hops, node
        """
    )


@query(
    "sql_session_variables",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_big,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_big
    FROM orders
    WHERE o_totalprice >= 250000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("sql",),
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 DECLARE / SET VAR): typed,
    session-scoped state referenced by name inside any query — the
    ANSI answer to string-splicing thresholds into SQL text. The
    variable reference resolves to a literal at analysis time, so
    constant folding and parquet pushdown see 250000.0 exactly as if
    it were inline (the oracle states the folded form)."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE big_order_floor DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR big_order_floor = 250000.0")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                 AS total_big
        FROM orders
        WHERE o_totalprice >= big_order_floor
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sql_collation_grouping",
    oracle="""
    SELECT lower(o_orderpriority) AS priority_ci,
           count(*) AS n,
           min(o_orderkey) AS first_order
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                    ELSE lower(o_orderpriority) END AS o_orderpriority
        FROM orders
    )
    GROUP BY priority_ci
    ORDER BY priority_ci
    """,
    tags=("sql", "string"),
)
def sql_collation_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4 COLLATE): UTF8_LCASE makes
    comparison, grouping, and joins case-insensitive WITHOUT rewriting
    every expression through lower() — the collation travels with the
    type, so a mixed-case feed (synthesized here by upper-casing even
    keys) groups correctly and hash aggregation uses the collation's
    sort key. Output normalizes the representative via lower() because
    a collated group may surface any member spelling; the oracle is
    the lower()-rewrite a pre-collation engine would run."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH mixed AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 2 = 0 THEN upper(o_orderpriority)
                        ELSE lower(o_orderpriority) END AS prio
            FROM orders
        )
        SELECT lower(prio COLLATE UTF8_LCASE) AS priority_ci,
               count(*) AS n,
               min(o_orderkey) AS first_order
        FROM mixed
        GROUP BY prio COLLATE UTF8_LCASE
        ORDER BY priority_ci
        """
    )


@query(
    "sql_execute_immediate",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM lineitem
    WHERE l_quantity >= 25.0 AND l_discount <= 0.05
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("sql",),
)
def sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXECUTE IMMEDIATE ... USING — the third leg of the dynamic-SQL
    surface (with IDENTIFIER and session variables): a statement held
    as a STRING executes with ?-placeholder binding, so generated SQL
    carries values as parameters, never as spliced text. The bound
    statement analyzes like any other — both predicates fold into the
    parquet scan's pushed filters exactly as the oracle's inline
    literals do."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    stmt = (
        "SELECT l_returnflag, count(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty "
        "FROM lineitem WHERE l_quantity >= ? AND l_discount <= ? "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    return spark.sql(
        "EXECUTE IMMEDIATE :stmt USING 25.0, 0.05", args={"stmt": stmt}
    )


TRY_BIG = 9_223_372_036_854_775_000  # near bigint max: forces data-dependent overflow


@query(
    "sql_try_functions",
    oracle=f"""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE round(o_totalprice / (o_orderkey % 7), 6) END AS safe_ratio,
           try_cast(o_orderstatus AS INTEGER) AS status_as_int,
           CASE WHEN o_orderkey <= 9223372036854775807 - {TRY_BIG}
                THEN o_orderkey + {TRY_BIG} ELSE NULL END AS guarded_add,
           CASE WHEN o_orderkey % 3 = 2 THEN NULL
                ELSE ['low','mid','high'][(o_orderkey % 3) + 1] END AS tier
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderkey
    """,
    tags=("sql", "errors"),
)
def sql_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRY_* error-containment family — ANSI mode's answer to
    "one bad row must not kill the 100 TB job": ``try_divide`` nulls
    the division by zero instead of raising, ``try_cast`` nulls the
    unparseable cast, ``try_add`` nulls the bigint overflow (made
    data-dependent here: keys within {TRY_BIG} of MAX overflow, tiny
    keys don't), ``try_element_at`` nulls the out-of-bounds index.
    Under ``spark.sql.ansi.enabled`` the un-prefixed forms of all four
    THROW — TRY_* is how a pipeline opts into cell-level quarantine
    while keeping strict semantics everywhere else (the row-level
    sibling of io_corrupt_records_permissive's record quarantine).
    DuckDB lacks try_divide/try_add, so the oracle states each
    function's documented semantics with explicit guards — the hash
    proves the TRY functions equal their guarded definitions."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    tiers = F.array(F.lit("low"), F.lit("mid"), F.lit("high"))
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 7), 6
        ).alias("safe_ratio"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_as_int"),
        F.try_add(F.col("o_orderkey"), F.lit(TRY_BIG)).alias("guarded_add"),
        # index 1/2 when key%3 in {0,1}; key%3==2 probes index 4 -> out
        # of bounds -> NULL (try_element_at is 1-based like element_at)
        F.try_element_at(
            tiers,
            F.when(F.col("o_orderkey") % 3 == 2, F.lit(4))
            .otherwise((F.col("o_orderkey") % 3 + 1).cast("int")),
        ).alias("tier"),
    ).orderBy("o_orderkey")


@query(
    "struct_map_mutation",
    oracle="""
    SELECT s_suppkey,
           s_name AS name_from_struct,
           CAST(s_acctbal AS DOUBLE) * 2 AS acct2,
           'acct2,s_name' AS struct_fields_after_drop,
           upper(s_name) AS key_upper,
           CAST(s_acctbal AS DOUBLE) * 2 AS val_doubled,
           (s_acctbal > 5000.0) AS survives_filter,
           CAST(s_acctbal AS DOUBLE) + s_nationkey AS zipped_sum
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("relational", "struct", "map"),
)
def struct_map_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type MUTATION surface — the Column.withField/dropFields
    struct editors and the map higher-order family (transform_keys /
    transform_values / map_filter / map_zip_with) that in-place schema
    evolution and open-schema payload maintenance lean on. Everything
    is verified through extracted scalars so the oracle replays
    SEMANTICS (what the mutated struct/map must contain), not engine
    serialization: withField adds acct2=2x, dropFields removes the
    original, transform_keys uppercases, transform_values doubles,
    map_filter keeps >5000 balances, map_zip_with adds a second map's
    nationkey. All row-local expressions — scan-speed at any scale."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("bal"),
        "s_nationkey",
    )
    st = F.struct(F.col("s_name"), F.col("bal").alias("s_acctbal"))
    st2 = st.withField("acct2", F.col("bal") * 2).dropFields("s_acctbal")
    m = F.create_map(F.col("s_name"), F.col("bal"))
    mk = F.transform_keys(m, lambda k, _v: F.upper(k))
    mv = F.transform_values(m, lambda _k, v: v * 2)
    mf = F.map_filter(m, lambda _k, v: v > 5000.0)
    m2 = F.create_map(F.col("s_name"), F.col("s_nationkey").cast("double"))
    mz = F.map_zip_with(m, m2, lambda _k, v1, v2: v1 + v2)
    return s.select(
        "s_suppkey",
        st2.getField("s_name").alias("name_from_struct"),
        st2.getField("acct2").alias("acct2"),
        # derived from the REAL post-mutation schema (driver-side
        # introspection), not asserted: dropFields must have removed
        # s_acctbal and withField added acct2
        F.lit(
            ",".join(sorted(s.select(st2.alias("st")).schema["st"].dataType.names))
        ).alias("struct_fields_after_drop"),
        F.element_at(F.map_keys(mk), 1).alias("key_upper"),
        F.element_at(F.map_values(mv), 1).alias("val_doubled"),
        (F.size(F.map_keys(mf)) == 1).alias("survives_filter"),
        F.element_at(F.map_values(mz), 1).alias("zipped_sum"),
    ).orderBy("s_suppkey")


@query(
    "sql_gaps_in_sequence",
    oracle="""
    WITH ks AS (SELECT DISTINCT o_orderkey AS k FROM orders
              WHERE o_orderpriority = '1-URGENT'),
    islands AS (
        SELECT k, k - row_number() OVER (ORDER BY k) AS grp FROM ks
    ),
    spans AS (
        SELECT min(k) AS island_start, max(k) AS island_end
        FROM islands GROUP BY grp
    ),
    gaps AS (
        SELECT island_end + 1 AS gap_start,
               lead(island_start) OVER (ORDER BY island_start) - 1 AS gap_end
        FROM spans
    )
    SELECT gap_start, gap_end, gap_end - gap_start + 1 AS gap_len
    FROM gaps
    WHERE gap_end IS NOT NULL
    ORDER BY gap_start
    """,
    tags=("sql", "windows"),
    uwin=(
        'island-spine table (one row per island, << key space)',
    ),
)
def sql_gaps_in_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-range detection over a key sequence (the
    gaps-and-islands DUAL: emit the holes, not the runs) — the
    standard audit for surrogate-key continuity and ingestion
    completeness (run here over the URGENT-priority key subset, whose
    holes are the other priorities — the full key space is contiguous
    by construction, which would make the audit vacuous). Islands form
    from the k - row_number() trick, holes are lead(island_start) -
    island_end between consecutive islands.

    Scale note: the island-forming rank (k - row_number()) runs over
    the full key subset, so it uses the DISTRIBUTED rank
    (operators.prefix.distributed_rank — range repartition +
    per-partition row numbers + broadcast offsets), never a
    single-partition window over the keys. The remaining lead() window
    is island-spine work: one row per island, orders of magnitude
    smaller than the key space (for a key space whose ISLAND count
    itself explodes, the same distributed-rank idiom replaces the
    spine window)."""
    from supabase_etl_spark.operators.prefix import distributed_rank

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    islands = distributed_rank(o, [F.asc("k")], out="__rn").select(
        "k", (F.col("k") - F.col("__rn")).alias("grp")
    )
    spans = islands.groupBy("grp").agg(
        F.min("k").alias("island_start"), F.max("k").alias("island_end")
    )
    ws = Window.orderBy("island_start")
    gaps = spans.select(
        (F.col("island_end") + 1).alias("gap_start"),
        (F.lead("island_start").over(ws) - 1).alias("gap_end"),
    )
    return (
        gaps.filter(F.col("gap_end").isNotNull())
        .select(
            "gap_start", "gap_end", (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len")
        )
        .orderBy("gap_start")
    )


@query(
    "sql_order_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "syntax"),
)
def sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL (with GROUP BY ALL): total ordering over every
    select-list column without repeating them — Spark and DuckDB share
    the syntax, so the oracle is literally the same statement."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_oba")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders_oba
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "sql_select_star_except",
    oracle="""
    SELECT * EXCLUDE (o_custkey, o_totalprice)
    FROM orders
    WHERE o_orderkey <= 50
    ORDER BY o_orderkey
    """,
    tags=("sql", "syntax"),
)
def sql_select_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(...) — projection by exclusion at the SQL layer
    (Spark's EXCEPT = DuckDB's EXCLUDE), the ergonomic twin of the
    DataFrame-level exclusion projection in ref_exclusion_project.
    Column pruning still reaches the scan: the excluded columns never
    leave the reader."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sse")
    return spark.sql(
        """
        SELECT * EXCEPT (o_custkey, o_totalprice)
        FROM orders_sse
        WHERE o_orderkey <= 50
        ORDER BY o_orderkey
        """
    )


@query(
    "sql_values_inline_table",
    oracle="""
    WITH tiers(mktsegment, tier) AS (
        VALUES ('AUTOMOBILE', 'retail'), ('BUILDING', 'industrial'),
               ('FURNITURE', 'retail'), ('HOUSEHOLD', 'retail'),
               ('MACHINERY', 'industrial')
    )
    SELECT t.tier, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_balance
    FROM customer c JOIN tiers t ON c.c_mktsegment = t.mktsegment
    GROUP BY t.tier
    ORDER BY t.tier
    """,
    tags=("sql", "syntax"),
)
def sql_values_inline_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES inline table as a join dimension — the idiomatic way to
    ship a small lookup in the query text itself; Catalyst folds it to
    a LocalRelation and broadcasts it, so the join costs one map-side
    hash probe."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_vit")
    return spark.sql(
        """
        WITH tiers AS (
            SELECT * FROM VALUES
                ('AUTOMOBILE', 'retail'), ('BUILDING', 'industrial'),
                ('FURNITURE', 'retail'), ('HOUSEHOLD', 'retail'),
                ('MACHINERY', 'industrial') AS t(mktsegment, tier)
        )
        SELECT t.tier, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_balance
        FROM customer_vit c JOIN tiers t ON c.c_mktsegment = t.mktsegment
        GROUP BY t.tier
        ORDER BY t.tier
        """
    )


@query(
    "sql_filter_clause",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) FILTER (WHERE l_linestatus = 'F')
                AS DOUBLE) AS qty_finished,
           CAST(MAX(l_quantity) FILTER (WHERE l_tax < 0.03) AS DOUBLE) AS max_qty_low_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("sql",),
)
def sql_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI aggregate FILTER (WHERE ...) clause — per-aggregate
    predicates without CASE WHEN scaffolding, evaluated map-side inside
    the same hash aggregate (one scan, one shuffle, regardless of how
    many filtered aggregates the query stacks)."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) FILTER (WHERE l_linestatus = 'F')
                    AS DOUBLE) AS qty_finished,
               CAST(MAX(l_quantity) FILTER (WHERE l_tax < 0.03) AS DOUBLE) AS max_qty_low_tax
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "sql_grouping_function",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY g_flag, g_status, returnflag, linestatus
    """,
    tags=("sql",),
)
def sql_grouping_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns over ROLLUP — the standard way to
    tell a real NULL group from a subtotal row, so downstream consumers
    can filter grand totals without string sentinels. Single rollup
    aggregate, output bounded by the group hierarchy."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, returnflag, linestatus
        """
    )


@query(
    "sql_natural_join",
    oracle="""
    WITH o AS (SELECT o_orderkey AS orderkey, o_custkey, o_totalprice FROM orders),
         l AS (SELECT l_orderkey AS orderkey, l_quantity FROM lineitem)
    SELECT orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty,
           CAST(MIN(o_totalprice) AS DOUBLE) AS order_price
    FROM o NATURAL JOIN l
    GROUP BY orderkey
    ORDER BY orderkey
    LIMIT 500
    """,
    tags=("sql", "join"),
)
def sql_natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN resolving the equi-key from the shared column name
    — same shuffled-hash/sort-merge physical plan as an explicit ON,
    with the join key deduplicated in the output."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH o AS (SELECT o_orderkey AS orderkey, o_custkey, o_totalprice FROM orders),
             l AS (SELECT l_orderkey AS orderkey, l_quantity FROM lineitem)
        SELECT orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty,
               CAST(MIN(o_totalprice) AS DOUBLE) AS order_price
        FROM o NATURAL JOIN l
        GROUP BY orderkey
        ORDER BY orderkey
        LIMIT 500
        """
    )


@query(
    "sql_join_hint_broadcast",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
    tags=("sql", "join", "hint"),
)
def sql_join_hint_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface join hints: /*+ BROADCAST(n) */ forces the dim side
    to broadcast regardless of statistics — the escape hatch when the
    planner under- or over-estimates a build side. Results are
    hint-invariant (the oracle runs the plain join); the physical
    effect is pinned by a plan-shape test asserting
    BroadcastHashJoin."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS total_balance
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
        """
    )


@query(
    "sql_named_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
           CAST(COUNT(*) OVER w AS BIGINT) AS orders_so_far,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS DOUBLE), 6)
               AS spend_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
    ORDER BY o_custkey, order_seq
    """,
    tags=("sql", "window"),
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause: one window specification shared by several
    analytic functions — the ANSI syntax that keeps multi-metric
    running-state queries single-sourced (and guarantees Spark plans
    ONE Window operator for all three functions instead of three)."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
               CAST(COUNT(*) OVER w AS BIGINT) AS orders_so_far,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS DOUBLE), 6)
                   AS spend_so_far
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS UNBOUNDED PRECEDING)
        ORDER BY o_custkey, order_seq
        """
    )


@query(
    "sql_ddl_managed_table",
    oracle="""
    WITH src AS (
        SELECT o_orderkey, o_totalprice,
               o_totalprice * 1.1 AS gross
        FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT o_orderkey, o_totalprice, o_totalprice * 1.1
        FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1500
    )
    SELECT count(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
               AS total_price,
           CAST(SUM(CAST(gross AS DECIMAL(28,6))) AS DOUBLE) AS total_gross,
           TRUE AS table_listed, TRUE AS dropped
    FROM src
    """,
    tags=("sql", "ddl"),
)
def sql_ddl_managed_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-table DDL lifecycle through the session catalog:
    CREATE TABLE ... USING parquet, two INSERT INTO batches, a CTAS
    enrichment table (CREATE TABLE AS SELECT with a derived column),
    catalog listing, SELECT-back, DROP TABLE —
    the metastore surface (Derby-backed spark-warehouse) a SQL user
    drives instead of paths. The read-back aggregate is hash-checked
    against the equivalent relational pipeline; the listing/drop
    verdicts assert the catalog transitions. Managed tables at 100 TB
    are the same parquet scans underneath — the catalog is metadata
    indirection, not a different engine path."""
    import uuid as _uuid

    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    tbl = f"managed_{_uuid.uuid4().hex[:8]}"
    spark.sql(
        f"CREATE TABLE {tbl} (o_orderkey BIGINT, o_totalprice DOUBLE) USING parquet"
    )
    try:
        spark.sql(
            f"INSERT INTO {tbl} SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_orderkey <= 1000"
        )
        spark.sql(
            f"INSERT INTO {tbl} SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_orderkey > 1000 AND o_orderkey <= 1500"
        )
        spark.sql(
            f"CREATE TABLE {tbl}_enriched USING parquet AS "
            f"SELECT o_orderkey, o_totalprice, o_totalprice * 1.1 AS gross "
            f"FROM {tbl}"
        )
        listed = any(t.name == tbl for t in spark.catalog.listTables())
        agg = spark.sql(
            f"""
            SELECT count(*) AS n_rows,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                       AS total_price,
                   CAST(SUM(CAST(gross AS DECIMAL(28,6))) AS DOUBLE)
                       AS total_gross
            FROM {tbl}_enriched
            """
        ).collect()[0]  # 1-row aggregate: bounded driver fetch
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_enriched")
    dropped = not any(t.name == tbl for t in spark.catalog.listTables())
    return spark.createDataFrame(
        [
            (
                agg["n_rows"],
                agg["total_price"],
                agg["total_gross"],
                bool(listed),
                bool(dropped),
            )
        ],
        "n_rows bigint, total_price double, total_gross double, "
        "table_listed boolean, dropped boolean",
    )


@query(
    "sql_scripting_control_flow",
    oracle="""
    WITH ks AS (SELECT unnest(range(0, 41)) AS k),
    counts AS (
        SELECT k.k,
               1000.0 * power(2.0, k.k) AS t,
               CAST((SELECT count(*) FROM orders
                     WHERE o_totalprice > 1000.0 * power(2.0, k.k)) AS BIGINT)
                   AS n_above
        FROM ks k
    ),
    hit AS (
        SELECT k, t, n_above FROM counts WHERE n_above <= 100
        ORDER BY k LIMIT 1
    )
    SELECT CAST(k AS BIGINT) AS n_doublings,
           round(t, 6) AS threshold,
           n_above
    FROM hit
    """,
    tags=("sql", "scripting"),
)
def sql_scripting_control_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4's BEGIN…END procedural blocks — DECLARE,
    data-driven WHILE, SET): the last major SQL-surface addition the
    registry didn't cover. The script doubles a price threshold until
    at most 100 orders exceed it — a loop whose trip count depends on
    the DATA, which is exactly what scripting adds over one-shot SQL.
    The oracle replays the fixpoint declaratively (first k in an
    enumerated doubling grid satisfying the predicate), so the
    procedural and declarative forms must agree bit-for-bit.

    Scale: each iteration is one pushed-down count over the pruned
    scan; the loop runs O(log(max_price)) times — driver-side control
    flow, executor-side work, the same shape as every iterative
    operator here."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE t DOUBLE DEFAULT 1000.0;
          DECLARE k INT DEFAULT 0;
          DECLARE n_above BIGINT DEFAULT -1;
          SET n_above = (SELECT count(*) FROM orders WHERE o_totalprice > t);
          WHILE n_above > 100 DO
            SET t = t * 2.0;
            SET k = k + 1;
            SET n_above = (SELECT count(*) FROM orders WHERE o_totalprice > t);
          END WHILE;
          SELECT CAST(k AS BIGINT) AS n_doublings,
                 round(t, 6) AS threshold,
                 n_above;
        END
        """
    )


@query(
    "sql_ddl_views",
    oracle="""
    WITH base AS (
        SELECT o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey <= 3000
    ),
    v_open AS (
        SELECT o_custkey, o_totalprice FROM base WHERE o_orderstatus = 'O'
    ),
    v_top AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                   AS total_open
        FROM v_open GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders, round(total_open, 6) AS total_open,
           TRUE AS view_listed,
           TRUE AS view_dropped
    FROM v_top
    WHERE n_orders >= 3
    ORDER BY total_open DESC, o_custkey
    LIMIT 10
    """,
    tags=("sql", "ddl"),
)
def sql_ddl_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIEW DDL lifecycle — the metastore surface the managed-table op
    doesn't cover: CREATE OR REPLACE TEMPORARY VIEW over a base scan, a
    SECOND view stacked on the first (nested resolution), catalog
    listing, query-through, and DROP VIEW with verification. Views are
    pure metadata — the plan under the nested view is the same pushed-
    down scan the oracle's CTE chain describes, which the value hash
    certifies."""
    from supabase_etl_spark.io.readers import load_table as _lt

    o = _lt(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") <= 3000).select(
        "o_custkey", "o_totalprice", "o_orderstatus"
    ).createOrReplaceTempView("ddl_base_v")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW ddl_open_v AS "
        "SELECT o_custkey, o_totalprice FROM ddl_base_v WHERE o_orderstatus = 'O'"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW ddl_top_v AS "
        "SELECT o_custkey, count(*) AS n_orders, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_open "
        "FROM ddl_open_v GROUP BY o_custkey"
    )
    listed = {t.name for t in spark.catalog.listTables()} >= {
        "ddl_base_v",
        "ddl_open_v",
        "ddl_top_v",
    }
    out = spark.sql(
        "SELECT o_custkey, CAST(n_orders AS BIGINT) AS n_orders, "
        "round(total_open, 6) AS total_open "
        "FROM ddl_top_v WHERE n_orders >= 3 "
        "ORDER BY total_open DESC, o_custkey LIMIT 10"
    ).collect()
    spark.sql("DROP VIEW ddl_top_v")
    spark.sql("DROP VIEW ddl_open_v")
    dropped = "ddl_top_v" not in {t.name for t in spark.catalog.listTables()}
    spark.catalog.dropTempView("ddl_base_v")
    rows = [
        (r["o_custkey"], r["n_orders"], r["total_open"], bool(listed), bool(dropped))
        for r in out
    ]
    return spark.createDataFrame(
        rows,
        "o_custkey bigint, n_orders bigint, total_open double, "
        "view_listed boolean, view_dropped boolean",
    )


@query(
    "sql_table_function",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
        FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders, round(total, 6) AS total
    FROM spend
    WHERE total >= 500000.0 AND n_orders >= 2
    ORDER BY total DESC, o_custkey
    LIMIT 15
    """,
    tags=("sql", "udf"),
)
def sql_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL TABLE-VALUED user function (Spark 4's ``CREATE FUNCTION …
    RETURNS TABLE … RETURN SELECT``) — the declarative sibling of the
    Python UDTF: a parameterized query fragment published under a name
    and invoked in the FROM clause like a relation. Being a SQL macro,
    Catalyst inlines the body and pushes predicates into the scan —
    zero runtime boundary, unlike a Python UDTF (which is why the
    value hash matches the plain-CTE oracle bit for bit)."""
    from supabase_etl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION big_spenders(
            min_total DOUBLE, min_orders BIGINT)
        RETURNS TABLE (o_custkey BIGINT, n_orders BIGINT, total DOUBLE)
        RETURN SELECT o_custkey,
                      count(*) AS n_orders,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                          AS total
               FROM orders GROUP BY o_custkey
               HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                        >= min_total
                  AND count(*) >= min_orders
        """
    )
    return spark.sql(
        "SELECT o_custkey, n_orders, round(total, 6) AS total "
        "FROM big_spenders(500000.0, 2) "
        "ORDER BY total DESC, o_custkey LIMIT 15"
    )



@query(
    "sql_distribute_cluster_by",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql", "layout"),
)
def sql_distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's physical-layout SQL surface: DISTRIBUTE BY (hash
    repartition on an expression), SORT BY (partition-LOCAL sort), and
    their fusion CLUSTER BY — Hive-inherited clauses that let SQL users
    pin the shuffle the way DataFrame users call repartition()/
    sortWithinPartitions(). The inner CLUSTER BY query repartitions
    lineitem by (returnflag, linestatus) and locally sorts; the outer
    aggregate then needs NO second shuffle for the same keys (Catalyst
    reuses the hash distribution — the plan shows one Exchange, owned
    by the CLUSTER BY). DuckDB has no layout clauses, so the oracle is
    the layout-free aggregate — CLUSTER BY must be result-transparent.

    100 TB: this IS the lever — pre-clustering a hot key once and
    letting every downstream agg/join on that key ride the existing
    distribution; the same contract bucketed tables persist to disk."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_dcb")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM (
            SELECT l_returnflag, l_linestatus, l_quantity
            FROM lineitem_dcb
            CLUSTER BY l_returnflag, l_linestatus
        )
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
