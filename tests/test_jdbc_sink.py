"""JDBC sink tests (SURVEY §2.2 sources/sinks "fallback write.jdbc").

The JVM append path runs against the embedded Derby driver that ships
in Spark's jars (no external service); the DBAPI upsert path runs
against stdlib sqlite3 — same ON CONFLICT ... DO UPDATE SQL as
Postgres, differing only in paramstyle.
"""

from __future__ import annotations

import sqlite3
import tempfile

import pytest
from pyspark.sql import functions as F

from supabase_etl_spark.io.jdbc_sink import (
    DERBY_DRIVER,
    JdbcUpsertConfig,
    read_jdbc,
    upsert_jdbc,
    write_jdbc,
)
from supabase_etl_spark.io.readers import load_table

SF = "/root/testdata/sf0.001"


def test_write_jdbc_append_and_readback(spark):
    db = tempfile.mkdtemp(prefix="derby_") + "/db"
    url = f"jdbc:derby:{db};create=true"
    src = (
        load_table(spark, SF, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    write_jdbc(src, url, "nation_copy", mode="overwrite", driver=DERBY_DRIVER)
    back = read_jdbc(spark, url, "nation_copy", driver=DERBY_DRIVER)
    assert back.count() == src.count() == 25
    assert sorted(back.columns) == sorted(src.columns)
    a = [tuple(r) for r in src.collect()]
    b = sorted(tuple(r) for r in back.select("n_nationkey", "n_name", "n_regionkey").collect())
    assert a == b
    # append doubles the rows
    write_jdbc(src, url, "nation_copy", mode="append", driver=DERBY_DRIVER)
    assert read_jdbc(spark, url, "nation_copy", driver=DERBY_DRIVER).count() == 50


def _sqlite_connect(path):
    return lambda: sqlite3.connect(path, timeout=30)


def test_upsert_jdbc_inserts_then_updates(spark):
    path = tempfile.mktemp(prefix="upsert_", suffix=".db")
    with sqlite3.connect(path) as c:
        c.execute(
            "CREATE TABLE region_copy (r_regionkey INTEGER PRIMARY KEY, r_name TEXT)"
        )
    src = load_table(spark, SF, "region").select("r_regionkey", "r_name")
    cfg = JdbcUpsertConfig(table="region_copy", key_cols=["r_regionkey"], chunk_size=2)
    m1 = upsert_jdbc(src.coalesce(1), _sqlite_connect(path), cfg)
    assert m1 == {"rows": 5, "batches": 3}  # 5 rows in chunks of 2

    # re-upsert with mutated names: same keys, values must be replaced
    mutated = src.withColumn("r_name", F.concat(F.col("r_name"), F.lit("_V2")))
    m2 = upsert_jdbc(mutated.coalesce(1), _sqlite_connect(path), cfg)
    assert m2["rows"] == 5
    with sqlite3.connect(path) as c:
        rows = c.execute(
            "SELECT r_regionkey, r_name FROM region_copy ORDER BY r_regionkey"
        ).fetchall()
    assert len(rows) == 5  # upsert, not append
    assert all(name.endswith("_V2") for _, name in rows)


def test_upsert_jdbc_parallel_partitions(spark):
    """Multiple partitions upsert concurrently into one sqlite file
    (file-lock contention handled by the 30s busy timeout)."""
    path = tempfile.mktemp(prefix="upsert_par_", suffix=".db")
    with sqlite3.connect(path) as c:
        c.execute("CREATE TABLE cust (c_custkey INTEGER PRIMARY KEY, c_name TEXT)")
    src = load_table(spark, SF, "customer").select("c_custkey", "c_name").repartition(4)
    cfg = JdbcUpsertConfig(table="cust", key_cols=["c_custkey"], chunk_size=300)
    m = upsert_jdbc(src, _sqlite_connect(path), cfg)
    assert m["rows"] == 150
    with sqlite3.connect(path) as c:
        assert c.execute("SELECT count(*) FROM cust").fetchone()[0] == 150


def test_upsert_sql_all_key_columns_degrades_to_do_nothing():
    from supabase_etl_spark.io.jdbc_sink import _upsert_sql

    cfg = JdbcUpsertConfig(table="t", key_cols=["a", "b"])
    assert _upsert_sql(cfg, ["a", "b"]).endswith("DO NOTHING")
    cfg_pg = JdbcUpsertConfig(table="t", key_cols=["a"], paramstyle="format")
    sql = _upsert_sql(cfg_pg, ["a", "b"])
    assert "%s" in sql and "excluded.b" in sql


def test_stream_foreachbatch_jdbc_upsert(spark, tmp_path):
    """Streaming → JDBC: an AvailableNow events stream delivered through
    foreachBatch into the DBAPI ON-CONFLICT upsert — the incremental
    warehouse load. Checkpoint + key-idempotent upsert give end-to-end
    effectively-once delivery: a second run over the same checkpoint
    re-delivers nothing, and re-running the SAME batch (simulated task
    retry) leaves row counts unchanged."""
    from supabase_etl_spark.streaming.source import read_events_stream

    path = str(tmp_path / "stream_upsert.db")
    with sqlite3.connect(path) as c:
        c.execute(
            "CREATE TABLE events_inc ("
            "event_id INTEGER PRIMARY KEY, user_id INTEGER, value REAL)"
        )
    cfg = JdbcUpsertConfig(table="events_inc", key_cols=["event_id"], chunk_size=300)

    def deliver(batch_df, batch_id):
        upsert_jdbc(
            batch_df.select("event_id", "user_id", "value"),
            _sqlite_connect(path),
            cfg,
        )

    s = read_events_stream(spark, SF).select("event_id", "user_id", "value")
    q = (
        s.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    n_events = load_table(spark, SF, "events").count()
    with sqlite3.connect(path) as c:
        assert c.execute("SELECT count(*) FROM events_inc").fetchone()[0] == n_events

    # same checkpoint: nothing re-delivered
    q2 = (
        s.writeStream.foreachBatch(deliver)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    # retry simulation: manual re-upsert of the full batch is idempotent
    upsert_jdbc(
        load_table(spark, SF, "events").select("event_id", "user_id", "value"),
        _sqlite_connect(path),
        cfg,
    )
    with sqlite3.connect(path) as c:
        assert c.execute("SELECT count(*) FROM events_inc").fetchone()[0] == n_events
