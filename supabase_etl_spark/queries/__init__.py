"""Query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2.2 is exposed here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle SQL string over the same parquet tables. The driver's
correctness harness and the local ``scripts/check_correctness.py`` both
consume this registry; ``__spark_entry__.py`` is a thin adapter.

Determinism discipline (SURVEY.md §4.3):
  * every query ends in a total-order ORDER BY;
  * float aggregates run through exact decimal(18,6) sums and are cast
    back to double, so Spark's parallel summation order and DuckDB's
    sequential order produce bit-identical doubles;
  * per-row double arithmetic is IEEE-identical across engines and needs
    no canonicalization;
  * column names are aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}

# Submodules that register queries on import.
_QUERY_MODULES = [
    "supabase_etl_spark.queries.relational",
    "supabase_etl_spark.queries.joins",
    "supabase_etl_spark.queries.tpch",
    "supabase_etl_spark.queries.aggregates",
    "supabase_etl_spark.queries.windows",
    "supabase_etl_spark.queries.setops",
    "supabase_etl_spark.queries.reference_parity",
    "supabase_etl_spark.queries.udfs",
    "supabase_etl_spark.queries.llm_text",
    "supabase_etl_spark.queries.llm_dedup",
    "supabase_etl_spark.queries.llm_similarity",
    "supabase_etl_spark.queries.llm_multimodal",
    "supabase_etl_spark.queries.llm_ml",
    "supabase_etl_spark.queries.llm_sampling",
    "supabase_etl_spark.queries.llm_curation",
    "supabase_etl_spark.queries.scale_levers",
    "supabase_etl_spark.queries.sessions",
    "supabase_etl_spark.queries.analytics",
    "supabase_etl_spark.queries.dq",
    "supabase_etl_spark.queries.io_roundtrip",
    "supabase_etl_spark.queries.streaming",
]


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    """Decorator: register a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Only tolerate the query submodule itself being absent
            # (incremental rounds); a missing transitive dependency must
            # fail loudly or the registry silently shrinks (ADVICE r1).
            if e.name != mod:
                raise
    return REGISTRY
