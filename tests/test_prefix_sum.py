"""Distributed prefix sum == sequential window, on arbitrary data.

The hash oracle pins orders_abc_pareto's instance at two SFs; this
property test pins the OPERATOR: random decimal values under random
orderings, many partition counts, always bit-equal to the naive
single-partition window."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Window
from pyspark.sql import functions as F

from supabase_etl_spark.operators.prefix import distributed_cumsum


def _check(spark, values, num_partitions):
    rows = [(i, Decimal(v).quantize(Decimal("0.000001"))) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k bigint, v decimal(28,6)")
    order = [F.col("v").desc(), F.col("k").asc()]
    got = {
        r["k"]: r["cumsum"]
        for r in distributed_cumsum(
            df, "v", order, num_partitions=num_partitions
        ).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["cumsum"]
        for r in df.withColumn("cumsum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_matches_sequential_window_lcg_data(spark):
    # deterministic LCG values incl. negatives and exact ties
    vals = [((1103515245 * i + 12345) % 2000003 - 1000000) / 100 for i in range(500)]
    vals[7] = vals[13] = vals[99]  # planted ties exercise the tie-break key
    for p in (1, 3, 8, 32):
        _check(spark, vals, p)


def test_single_row_and_empty(spark):
    _check(spark, [42.5], 4)
    df = spark.createDataFrame([], "k bigint, v decimal(28,6)")
    out = distributed_cumsum(df, "v", [F.col("v").desc(), F.col("k")])
    assert out.count() == 0


def test_more_partitions_than_rows(spark):
    _check(spark, [1.0, -2.0, 3.5], 16)


def test_chained_cumsum_over_shuffle_output(spark):
    """Two distributed_cumsum calls chained over a groupBy (shuffle)
    output — the shape that exposed the re-sampled-range-boundary bug:
    without materializing the ranged frame, `local` and `offsets`
    could see different partition assignments and the second cumsum
    silently drifted. Both outputs must equal the naive
    single-partition window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from supabase_etl_spark.operators.prefix import distributed_cumsum

    base = (
        spark.range(50_000)
        .select(
            (F.col("id") % 9973).alias("v"),
            ((F.col("id") % 7) + 1).cast("decimal(20,0)").alias("a"),
            ((F.col("id") % 5) + 1).cast("decimal(20,0)").alias("b"),
        )
        .groupBy("v")
        .agg(F.sum("a").alias("a"), F.sum("b").alias("b"))
    )
    got = distributed_cumsum(base, "a", [F.col("v")], out="ca")
    got = distributed_cumsum(got, "b", [F.col("v")], out="cb")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = base.withColumn("ca", F.sum("a").over(w)).withColumn(
        "cb", F.sum("b").over(w)
    )
    g = {r["v"]: (r["ca"], r["cb"]) for r in got.collect()}
    wnt = {r["v"]: (r["ca"], r["cb"]) for r in want.collect()}
    assert g == wnt
