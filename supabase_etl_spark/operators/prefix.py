"""Distributed exact prefix sums — global running totals without a
single-partition window.

``Window.orderBy(...)`` with no partition key drags the whole dataset
through one task; the distributed construction is the same two-pass
shape as a distributed rank (dedup_sorted_neighborhood): range-
repartition on the sort key, compute per-partition running sums with a
partition-local window, then add each partition's prefix offset — the
cumulative total of all earlier partitions, a P-row frame broadcast
back. With decimal value types every path is exact, so the result is
bit-equal to the sequential window regardless of partition boundaries
(pinned by tests/test_prefix_sum.py against the naive window on random
data).

Cost: one range shuffle + one P-row side computation. The offsets
window runs over P rows (partition count), not data — bounded by
cluster parallelism, never by data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pfx_pid"
_LOCAL = "__pfx_local"
_OFF = "__pfx_off"


def distributed_cumsum(
    df: DataFrame,
    value: str,
    order: list[Column],
    out: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out`` = running sum of ``value`` in the total order given
    by ``order`` (must be a total order for a well-defined result;
    include a tie-breaking key). ``value`` should be a decimal column
    for exactness."""
    spark = df.sparkSession
    par = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint is CORRECTNESS here, not an optimization: `local`
    # and `offsets` below both consume `ranged`, and without
    # materialization each consumer re-evaluates the plan —
    # repartitionByRange re-SAMPLES its range boundaries per
    # evaluation, so over a nondeterministically-ordered input (any
    # shuffle output) the two consumers can see DIFFERENT partition
    # assignments and the offsets no longer describe the local sums
    # (observed: chained cumsums over a groupBy output produced a
    # wrong KS statistic; pinned by
    # tests/test_prefix_sum.py::test_chained_cumsum_over_shuffle_output).
    ranged = (
        df.repartitionByRange(par, *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    wloc = (
        Window.partitionBy(_PID)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn(_LOCAL, F.sum(value).over(wloc))
    offsets = (
        ranged.groupBy(_PID)
        .agg(F.sum(value).alias("__ptot"))
        .withColumn(
            _OFF,
            F.coalesce(
                F.sum("__ptot").over(
                    Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(_PID, _OFF)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.col(_LOCAL) + F.col(_OFF))
        .drop(_PID, _LOCAL, _OFF)
    )
