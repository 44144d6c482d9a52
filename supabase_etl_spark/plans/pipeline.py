"""Pipeline driver — the reference's EP1 lifecycle, Spark-first.

Reference (etl_supabase.py:111-158): extract 3 statement tables →
row-loop transform → CSV → chunked REST upsert → storage upload, all
sequential, single-threaded. Here each stage is a lazy plan; `write`
actions are the only materialization points, and every sink runs
partition-parallel. Config is injected per-run — no module-level env
coupling (the reference raises at import if SUPABASE_SERVICE_KEY is
unset, :17-18; SURVEY §3 EP3 explicitly forbids replicating that).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from supabase_etl_spark.functions.packing import to_jsonb_records
from supabase_etl_spark.io.rest_sink import RestSinkConfig, upload_to_storage, upsert_rest
from supabase_etl_spark.io.writers import write_csv


@dataclass
class PipelineConfig:
    """One pipeline run: named sources -> jsonb-records -> sinks.

    sources: {table_name: callable(spark) -> DataFrame} — pluggable so
    an SDK/REST extract (ref S1) and a parquet scan share the driver.
    """

    sources: dict[str, Callable[[SparkSession], DataFrame]]
    csv_dir: str | None = None
    rest_base_url: str | None = None
    rest_api_key: str = ""
    storage_base_url: str | None = None
    storage_bucket: str = "processed-data"
    ticker_default: str = "FPT"
    chunk_size: int = 300  # ref parity (etl_supabase.py:71)
    extra: dict = field(default_factory=dict)


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict[str, dict]:
    """Extract → transform → load for every configured source table.

    Returns per-table metrics: rows transformed, REST batches posted,
    files written. Stage boundaries mirror EP1 (SURVEY §3) with
    partition-parallel sinks instead of sequential prints.
    """
    report: dict[str, dict] = {}
    for table, source_fn in cfg.sources.items():
        metrics: dict = {}
        raw = source_fn(spark)

        records = to_jsonb_records(raw, ticker_default=cfg.ticker_default)
        metrics["rows"] = records.count()

        if cfg.csv_dir:
            csv_path = os.path.join(cfg.csv_dir, table)
            write_csv(records, csv_path, single_file=True)
            metrics["csv_path"] = csv_path

        if cfg.rest_base_url:
            sink_cfg = RestSinkConfig(
                base_url=cfg.rest_base_url,
                table=table,
                api_key=cfg.rest_api_key,
                chunk_size=cfg.chunk_size,
            )
            metrics["rest"] = upsert_rest(records, sink_cfg)

        if cfg.storage_base_url and cfg.csv_dir:
            csv_part = next(
                f
                for f in os.listdir(metrics["csv_path"])
                if f.endswith(".csv") and not f.startswith(".")
            )
            local = os.path.join(metrics["csv_path"], csv_part)
            remote = f"etl/{table}.csv"
            upload_to_storage(
                local,
                remote,
                cfg.storage_base_url,
                bucket=cfg.storage_bucket,
                api_key=cfg.rest_api_key,
            )
            metrics["storage_object"] = remote

        report[table] = metrics
    return report
