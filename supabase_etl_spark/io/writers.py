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


def write_avro(df: DataFrame, path: str) -> None:
    """Avro object-container sink over the engine's pure-Python codec
    (io/avro_codec.py — the runtime ships no spark-avro jar; see that
    module's header). Fully distributed: each input partition encodes
    itself via mapInPandas and writes one ``part-<pid>.avro`` file into
    ``path`` — the same one-file-per-task contract as Spark's own file
    sinks, so at cluster scale the write parallelizes and no row ever
    visits the driver. Flat primitive schemas only (asserted)."""
    import os

    from pyspark.sql import functions as F  # noqa: F401  (schema side only)

    from supabase_etl_spark.io.avro_codec import SPARK_TO_AVRO, encode_records

    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in SPARK_TO_AVRO:
            raise ValueError(
                f"write_avro supports flat primitive schemas only; "
                f"column {f.name} has type {t}"
            )
        fields.append((f.name, SPARK_TO_AVRO[t]))

    os.makedirs(path, exist_ok=True)
    cols = [f.name for f in df.schema.fields]

    def encode_partition(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = []
        for pdf in batches:
            for tup in pdf[cols].itertuples(index=False, name=None):
                rows.append(
                    tuple(None if pd.isna(v) else v for v in tup)
                )
        out_file = os.path.join(path, f"part-{pid:05d}.avro")
        with open(out_file, "wb") as fh:
            fh.write(encode_records(fields, rows))
        yield pd.DataFrame({"path": [out_file], "n_records": [len(rows)]})

    (
        df.mapInPandas(encode_partition, "path string, n_records bigint")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def compact_parquet(
    spark,
    src_path: str,
    dest_path: str,
    target_file_mb: int = 512,
    partition_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    roughly ``target_file_mb`` each. Streaming sinks and incremental
    jobs accrete thousands of tiny files; at 100 TB an uncompacted
    table turns every scan's task-scheduling overhead into the
    bottleneck (one task per file). Sizing uses the dataset's on-disk
    bytes (driver-side file listing — metadata only), so the rewrite is
    one pass: read → repartition to ceil(bytes/target) → write.
    Returns the number of output files requested."""
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if f.endswith(".parquet"))
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    writer = df.repartition(n_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest_path)
    return n_files
