"""Composite join operators Spark lacks as primitives (SURVEY §2.2).

As-of and range joins are compositions of built-in DataFrame ops so
Catalyst still sees a declarative plan (predicate pushdown, AQE skew
handling all apply). No Python touches the row path.

Scale notes (100 TB posture):
  * Both joins first narrow candidates with an equi component (the
    `by` keys), so the shuffle is a plain hash partition on those
    keys — no broadcast-nested-loop blowup when `by` is present.
  * For pure range joins without equi keys, callers should bucket the
    time axis (`bucket_width`) — that turns the non-equi predicate
    into an equi join on bucket id + a residual filter, which scales
    linearly instead of quadratically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_time: str,
    right_time: str,
    left_keys: list[str],
    direction: str = "backward",
    strict: bool = False,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row at-or-before
    (backward) / earliest at-or-after (forward) / closest-in-time
    (nearest) its timestamp, per `by` group — the full
    pandas.merge_asof surface (direction= and tolerance=), reference
    pandas semantics: nearest prefers the backward match on a distance
    tie, and `tolerance` (a SQL INTERVAL string, e.g.
    "INTERVAL 30 MINUTES") bounds the match distance.

    `left_keys` must uniquely identify left rows (used to pick the
    single best match deterministically; ties on right_time broken by
    all right columns to stay order-stable).

    Implementation: equi-join on `by` + time inequality, then
    row_number over the left key ordered by right_time (desc for
    backward; abs distance for nearest). One shuffle on `by`, one on
    `left_keys` — at scale, pre-partitioning both inputs by `by`
    keeps it to one. A tolerance also tightens the join predicate
    itself, shrinking the candidate fan-out before the rank."""
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    tol = F.expr(tolerance) if tolerance is not None else None
    if direction == "backward":
        cond = rt < lt if strict else rt <= lt
        if tol is not None:
            cond = cond & (rt >= lt - tol)
        order = [F.col(f"r.{right_time}").desc()]
    elif direction == "forward":
        cond = rt > lt if strict else rt >= lt
        if tol is not None:
            cond = cond & (rt <= lt + tol)
        order = [F.col(f"r.{right_time}").asc()]
    elif direction == "nearest":
        # strict ≙ pandas allow_exact_matches=False: an exact-time
        # right row is not a candidate in either direction
        cond = (rt != lt) if strict else F.lit(True)
        if tol is not None:
            cond = cond & (rt >= lt - tol) & (rt <= lt + tol)
        dist = F.abs(F.unix_micros(rt) - F.unix_micros(lt))
        # pandas merge_asof(nearest): equidistant candidates resolve to
        # the backward (earlier) one — (rt > lt) sorts False first
        order = [dist.asc(), (rt > lt).cast("int").asc()]
    else:
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction}"
        )

    on = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in by]
    joined = left.alias("l").join(right.alias("r"), on=[*on, cond], how="left")
    # deterministic tiebreak: right time, then every right column
    order += [F.col(f"r.{c}").asc_nulls_last() for c in right.columns if c != right_time]
    w = Window.partitionBy(*[F.col(f"l.{k}") for k in left_keys]).orderBy(*order)
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_start: Column,
    left_end: Column,
    right_time: Column,
    how: str = "inner",
    extra_cond=None,
) -> DataFrame:
    """Join right rows whose `right_time` falls in [left_start, left_end).

    With `by` keys (or an equi predicate inside `extra_cond`) the plan
    is a hash join with the interval predicate as residual — linear.
    Without any equi component, callers should pre-bucket the time
    axis; Spark would otherwise plan a broadcast-nested-loop.

    `extra_cond`: optional callable (left, right) -> Column appended to
    the join condition (e.g. extra equi keys with differing names).
    """
    cond = (right_time >= left_start) & (right_time < left_end)
    for k in by:
        cond = cond & (left[k] == right[k])
    if extra_cond is not None:
        cond = cond & extra_cond(left, right)
    return left.join(right, on=cond, how=how)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_time: str,
    bucket_micros: int,
    how: str = "inner",
) -> DataFrame:
    """Pure range join (no equi keys) made linear by time bucketing.

    Without an equi component Spark plans a broadcast-nested-loop —
    O(|L|·|R|). Here each left interval explodes into the time buckets
    it overlaps (≤ interval_width/bucket + 1 rows) and each right row
    lands in exactly one bucket, so the range predicate becomes an
    equi-join on bucket id plus a residual interval filter. Results are
    exactly those of the naive non-equi join: every (L,R) match shares
    the bucket containing R's timestamp, and appears once because a
    right row has one bucket.

    `bucket_micros` should be about the typical interval width: larger
    buckets mean fewer exploded rows but more residual false pairs.

    Inner-only: the post-join residual filter would evaluate to null on
    null-extended rows and silently drop them, turning any outer join
    back into an inner one (ADVICE r1) — so other `how` values raise.
    """
    if how != "inner":
        raise ValueError(
            "bucketed_range_join supports how='inner' only: the residual "
            "interval filter runs after the join and would drop "
            f"null-extended rows of a {how!r} join"
        )
    lo = F.floor(F.unix_micros(F.col(left_start)) / bucket_micros)
    hi = F.floor(F.unix_micros(F.col(left_end)) / bucket_micros)
    lefts = left.withColumn("__b", F.explode(F.sequence(lo, hi)))
    rights = right.withColumn(
        "__b", F.floor(F.unix_micros(F.col(right_time)) / bucket_micros)
    )
    residual = (F.col(right_time) >= F.col(left_start)) & (
        F.col(right_time) < F.col(left_end)
    )
    return lefts.join(rights, ["__b"], how).filter(residual).drop("__b")


def broadcast_bounded(df: DataFrame, bounded: bool) -> DataFrame:
    """Broadcast hint gated on a caller-proven size bound (r14,
    VERDICT r13 task 5).

    An unconditional ``F.broadcast`` on a frame whose size is an
    *argument* of the query (a graph, a candidate set, a member table)
    is a latent driver/executor OOM: the hint bypasses both the
    autoBroadcastJoinThreshold and AQE's runtime size check, so the
    join hard-fails (8 GB / 512M-row broadcast cap) instead of
    degrading to a keyed shuffle. Callers must pass ``bounded=True``
    only when the bound is established *by construction* — a constant
    predicate (e.g. the co-purchase demo graphs' ``l_orderkey <=
    2000``), a min-df vocabulary cap, a grid of fixed cardinality —
    and plumb it from a parameter so the unbounded call site falls
    back to AQE-planned keyed joins rather than inheriting the hint.
    """
    return F.broadcast(df) if bounded else df
