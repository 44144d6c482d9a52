"""Scale levers for skewed and co-located joins (SURVEY §2.2/§4.3).

The reference runs single-threaded and never joins (etl_supabase.py:
111-158); these operators exist purely for the 100 TB posture:

* :func:`salted_join` — manual key salting for the hot-key case AQE's
  skew-join splitting can't fix (a single key bigger than one
  executor): the big side fans each row into one of B salt lanes, the
  small side replicates B times, the join key becomes (key, salt).
* :func:`write_bucketed` / co-located joins — pre-shuffle both fact
  tables into the same bucket layout once; every subsequent equi-join
  on the bucket key runs with **zero Exchange** (verified by plan
  assertion in tests), which at 100 TB converts the dominant recurring
  shuffle into a one-off write cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_source: Column | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over salt lanes.

    Result-identical to ``big.join(small, key, how)`` for inner/left
    joins (the small side is replicated per lane, so every big row
    still meets every matching small row exactly once). The salt is a
    deterministic hash of ``salt_source`` (default: the whole big row's
    first column list is unsafe, so callers pass a unique column, e.g.
    the fact table's primary key) — deterministic reruns, no rand().
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if salt_source is None:
        salt_source = F.col(key)
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(salt_source), F.lit(salt_buckets)))
    lanes = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_small = small.select("*", lanes)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort_key: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Joins between tables bucketed identically on the join key
    skip the shuffle entirely; sorting within buckets also skips the
    sort of a sort-merge join."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table_name)
