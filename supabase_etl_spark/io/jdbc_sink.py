"""JDBC sink (SURVEY §2.2 sources/sinks: "fallback `write.jdbc`").

The reference loads into Postgres, but always through the PostgREST
HTTP facade (etl_supabase.py:71-85) — it never opens a database
connection. When direct database access IS available, the Spark-native
path is `df.write.jdbc` (JVM-side, partition-parallel, batched
INSERTs) — that is the append path here, exercised in tests against
the embedded Derby driver that ships in Spark's own jars.

JDBC has no standard upsert, so :func:`upsert_jdbc` mirrors the REST
sink's contract (chunk=300, etl_supabase.py:71; at-least-once,
idempotent on a primary key): `foreachPartition` opens one DBAPI
connection per partition and executes chunked
``INSERT ... ON CONFLICT (keys) DO UPDATE`` statements — the same
``excluded``-row syntax Postgres and SQLite share, so the test target
(stdlib sqlite3) and the production target (Postgres via psycopg) run
identical SQL, differing only in paramstyle.

Scale posture: one connection per partition (not per row), chunked
executemany bounds round-trips and transaction size, accumulators
report rows/batches without driver collection. At 1000 executors the
bottleneck is the database, not Spark — size `df.repartition(n)` to
the connection count the target tolerates.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batch_size: int = 300,
    properties: dict[str, str] | None = None,
) -> None:
    """JVM-side JDBC append/overwrite: each partition writes batched
    INSERTs over its own connection. `batch_size` keeps chunk parity
    with the REST sink (ref etl_supabase.py:71)."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    if driver:
        props["driver"] = driver
    df.write.jdbc(url, table, mode=mode, properties=props)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC scan (readback/verification path)."""
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    return spark.read.jdbc(url, table, properties=props)


@dataclass
class JdbcUpsertConfig:
    table: str
    key_cols: list[str]
    chunk_size: int = 300  # ref parity (etl_supabase.py:71)
    paramstyle: str = "qmark"  # "qmark" (sqlite) | "format" (psycopg)


def _upsert_sql(cfg: JdbcUpsertConfig, cols: list[str]) -> str:
    ph = "?" if cfg.paramstyle == "qmark" else "%s"
    col_list = ", ".join(cols)
    placeholders = ", ".join([ph] * len(cols))
    updates = ", ".join(
        f"{c} = excluded.{c}" for c in cols if c not in cfg.key_cols
    )
    keys = ", ".join(cfg.key_cols)
    if not updates:  # all columns are keys: conflict means identical row
        return (
            f"INSERT INTO {cfg.table} ({col_list}) VALUES ({placeholders}) "
            f"ON CONFLICT ({keys}) DO NOTHING"
        )
    return (
        f"INSERT INTO {cfg.table} ({col_list}) VALUES ({placeholders}) "
        f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
    )


def upsert_jdbc(
    df: DataFrame,
    connect_fn: Callable[[], object],
    cfg: JdbcUpsertConfig,
) -> dict[str, int]:
    """Partition-parallel DBAPI upsert: one connection per partition,
    chunked ``executemany`` of ``INSERT ... ON CONFLICT DO UPDATE``,
    commit per chunk (bounded transactions — a retried task re-upserts
    idempotently). Returns {'rows': n, 'batches': m} via accumulators.

    ``connect_fn`` must be serializable (executors call it); pass e.g.
    ``lambda: sqlite3.connect(path, timeout=30)`` or a psycopg
    connector for Postgres.
    """
    cols = list(df.columns)
    sql = _upsert_sql(cfg, cols)
    sc = df.sparkSession.sparkContext
    rows_acc = sc.accumulator(0)
    batches_acc = sc.accumulator(0)
    chunk = cfg.chunk_size

    def _write_partition(it):
        buf: list[tuple] = []
        conn = None

        def flush():
            if buf:
                cur = conn.cursor()
                cur.executemany(sql, buf)
                conn.commit()
                rows_acc.add(len(buf))
                batches_acc.add(1)
                buf.clear()

        try:
            for row in it:
                if conn is None:
                    conn = connect_fn()  # lazily: empty partitions never connect
                buf.append(tuple(row[c] for c in cols))
                if len(buf) >= chunk:
                    flush()
            flush()
        finally:
            # close even when executemany/commit raises — task retries on
            # long-lived executors would otherwise leak a connection each
            if conn is not None:
                conn.close()

    df.foreachPartition(_write_partition)
    return {"rows": rows_acc.value, "batches": batches_acc.value}
