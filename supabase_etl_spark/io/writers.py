"""File/object sinks (reference op L2 + SURVEY §2.2 sources/sinks).

The reference writes one local CSV per table (etl_supabase.py:139-141).
Spark's writers shard output by partition; `single_file=True` gives
byte-level parity with the reference for small results, and must be
OFF at scale (it coalesces to one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"):
    out = df.coalesce(1) if single_file else df
    out.write.option("header", True).mode(mode).csv(path)


def write_json(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite"):
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
):
    """Parquet sink; partition_by enables static+dynamic partition
    pruning for downstream readers (the 100 TB layout lever)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
