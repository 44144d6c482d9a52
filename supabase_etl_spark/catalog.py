"""Catalog registration + statistics collection (SURVEY §4.2 "enable
CBO; collect stats").

Spark's cost-based optimizer only has real inputs for tables that live
in the catalog with ANALYZE-collected statistics; path-based
`spark.read.parquet(...)` plans see file sizes at best. This module is
the missing half of `spark.sql.cbo.enabled` (session.py): register the
test tables as external parquet tables and compute row/column stats so
filter-cardinality estimation and stats-driven join strategy selection
(e.g. post-filter broadcast, join reordering) actually fire — proven
by a plan test that flips SortMergeJoin → BroadcastHashJoin purely by
collecting stats (tests/test_catalog_stats.py).

Deployment note: AQE (also on) supplies *runtime* sizes at shuffle
boundaries, which covers path-based reads; catalog stats move the same
decisions to *plan* time, before the first shuffle executes. At 100 TB
both matter: plan-time stats avoid a mis-partitioned first stage that
AQE can only repair after paying for it.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from supabase_etl_spark.io.readers import TABLE_NAMES

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _quote_ident(name: str) -> str:
    """Backtick-quote a table identifier, rejecting anything that is not
    a plain identifier — these names are interpolated into SQL text."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid table identifier: {name!r}")
    return f"`{name}`"


def register_catalog_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLE_NAMES,
    prefix: str = "",
) -> list[str]:
    """CREATE TABLE ... USING parquet LOCATION for each test table
    (external: no data copied). Returns the catalog table names."""
    created = []
    for t in names:
        name = f"{prefix}{t}"
        quoted = _quote_ident(name)
        location = f"{sf_dir}/{t}.parquet".replace("'", "''")
        spark.sql(f"DROP TABLE IF EXISTS {quoted}")
        spark.sql(
            f"CREATE TABLE {quoted} USING parquet LOCATION '{location}'"
        )
        created.append(name)
    return created


def analyze_tables(
    spark: SparkSession,
    names: list[str],
    all_columns: bool = True,
) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS].

    Row counts + per-column ndv/min/max/null-count feed the CBO's
    cardinality model. At 100 TB run this after each batch load (the
    scan is metadata-cheap relative to the load itself) or use
    `spark.sql.statistics.size.autoUpdate.enabled` for size-only."""
    for t in names:
        suffix = " FOR ALL COLUMNS" if all_columns else ""
        spark.sql(f"ANALYZE TABLE {_quote_ident(t)} COMPUTE STATISTICS{suffix}")
