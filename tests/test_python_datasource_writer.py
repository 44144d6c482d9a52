"""Python Data Source writer contract (io/jsonl_sink_source.py):
executor-side staged writes, driver-side atomic commit, abort cleanup,
and readback equality."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from supabase_etl_spark.io.jsonl_sink_source import register
from supabase_etl_spark.io.readers import load_table
from tests.conftest import SF_SMOKE


def _read_back(spark, dest):
    files = [
        os.path.join(dest, f) for f in os.listdir(dest) if f.endswith(".jsonl")
    ]
    return spark.read.json(files)


def test_writer_roundtrip_matches_source(spark, tmp_path):
    register(spark)
    dest = str(tmp_path / "out")
    src = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartition(4)
    )
    src.write.format("chunked_jsonl").option("path", dest).mode("append").save()

    manifest = json.load(open(os.path.join(dest, "_committed.json")))
    assert sum(f["rows"] for f in manifest["files"]) == src.count()
    assert len(manifest["files"]) == 4  # one staged file per partition

    back = _read_back(spark, dest)
    assert back.count() == src.count()
    a = src.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).collect()[0]
    b = back.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).collect()[0]
    assert a[0] == b[0] and abs(a[1] - b[1]) < 1e-6

    # staging area fully drained by commit
    assert os.listdir(os.path.join(dest, "_staging")) == []


def test_failed_job_publishes_nothing(spark, tmp_path):
    register(spark)
    dest = str(tmp_path / "out2")

    @F.udf("long")
    def boom(x):
        raise RuntimeError("induced task failure")

    src = spark.range(100).select(boom(F.col("id")).alias("id"))
    try:
        src.write.format("chunked_jsonl").option("path", dest).mode("append").save()
        raise AssertionError("write should have failed")
    except Exception:
        pass
    # no committed manifest, no published jsonl
    assert not os.path.exists(os.path.join(dest, "_committed.json"))
    published = [f for f in os.listdir(dest) if f.endswith(".jsonl")] if os.path.isdir(dest) else []
    assert published == []


def test_chunking_bounds_payloads(spark, tmp_path):
    register(spark)
    dest = str(tmp_path / "out3")
    spark.range(950).selectExpr("id", "id * 1.5 AS v").coalesce(1).write.format(
        "chunked_jsonl"
    ).option("path", dest).option("chunk_size", "300").mode("append").save()
    files = [f for f in os.listdir(dest) if f.endswith(".jsonl")]
    assert len(files) == 1
    lines = open(os.path.join(dest, files[0])).read().strip().split("\n")
    assert len(lines) == 950


def test_overwrite_clears_previous_generation(spark, tmp_path):
    """mode('overwrite') must not leave older task files behind: a
    glob reader sees exactly the new generation, and the manifest
    matches it (the advisor's mixed-generation finding)."""
    register(spark)
    dest = str(tmp_path / "out")
    gen1 = spark.range(10).selectExpr("id AS k").repartition(2)
    gen1.write.format("chunked_jsonl").option("path", dest).mode("append").save()
    assert _read_back(spark, dest).count() == 10

    gen2 = spark.range(100, 103).selectExpr("id AS k").repartition(1)
    gen2.write.format("chunked_jsonl").option("path", dest).mode("overwrite").save()

    back = _read_back(spark, dest)
    assert back.count() == 3
    assert {r["k"] for r in back.collect()} == {100, 101, 102}
    manifest = json.load(open(os.path.join(dest, "_committed.json")))
    assert sum(f["rows"] for f in manifest["files"]) == 3


def test_append_manifest_lists_union(spark, tmp_path):
    """Two append generations: the manifest lists previous ∪ new, in
    agreement with what a directory glob reads."""
    register(spark)
    dest = str(tmp_path / "out")
    for lo, hi in ((0, 5), (5, 9)):
        (spark.range(lo, hi).selectExpr("id AS k").repartition(1)
         .write.format("chunked_jsonl").option("path", dest).mode("append").save())
    manifest = json.load(open(os.path.join(dest, "_committed.json")))
    assert sum(f["rows"] for f in manifest["files"]) == 9
    assert _read_back(spark, dest).count() == 9


def test_stream_writer_epoch_commit_is_idempotent(spark, tmp_path):
    """A microbatch replayed after a crash between sink-commit and
    checkpoint-advance must not double-publish: commit() with an
    already-seen batchId drops the restaged files."""
    import json
    import os

    from pyspark.sql import Row

    from supabase_etl_spark.io.jsonl_sink_source import ChunkedJsonlStreamWriter

    dest = str(tmp_path / "sink")
    os.makedirs(dest)
    w = ChunkedJsonlStreamWriter({"path": dest})

    rows = [Row(k=1, v="a"), Row(k=2, v="b")]
    m1 = w.write(iter(rows))
    w.commit([m1], batchId=0)
    state = json.load(open(os.path.join(dest, "_committed.json")))
    assert state["epochs"] == [0] and len(state["files"]) == 1

    # engine replays epoch 0 (restage + commit again)
    m1b = w.write(iter(rows))
    w.commit([m1b], batchId=0)
    state = json.load(open(os.path.join(dest, "_committed.json")))
    assert state["epochs"] == [0] and len(state["files"]) == 1, "double-publish"
    assert not os.path.exists(m1b.path), "replayed stage file must be dropped"

    # a NEW epoch publishes normally
    m2 = w.write(iter([Row(k=3, v="c")]))
    w.commit([m2], batchId=1)
    state = json.load(open(os.path.join(dest, "_committed.json")))
    assert state["epochs"] == [0, 1] and len(state["files"]) == 2
    published = [
        os.path.join(dest, e["file"]) for e in state["files"]
    ]
    n_rows = sum(
        1 for f in published for line in open(f) if line.strip()
    )
    assert n_rows == 3


def test_stream_writer_abort_cleans_stage(spark, tmp_path):
    import os

    from pyspark.sql import Row

    from supabase_etl_spark.io.jsonl_sink_source import ChunkedJsonlStreamWriter

    dest = str(tmp_path / "sink")
    os.makedirs(dest)
    w = ChunkedJsonlStreamWriter({"path": dest})
    m = w.write(iter([Row(k=1)]))
    assert os.path.exists(m.path)
    w.abort([m], batchId=0)
    assert not os.path.exists(m.path)
    assert not os.path.exists(os.path.join(dest, "_committed.json"))


def test_reader_parses_parameterized_and_boolean_types(spark, tmp_path):
    """DDL schema parsing must split on TOP-LEVEL commas only and carry
    real types: decimal(10,2) (comma inside the type), boolean (was
    falling into the str branch, yielding 'True'/'False' strings —
    ADVICE r6), and date round-trip."""
    register(spark)
    dest = str(tmp_path / "typed")
    src = spark.range(6).selectExpr(
        "id",
        "CAST(id * 1.25 AS DECIMAL(10,2)) AS amount",
        "id % 2 = 0 AS flag",
        "DATE'2024-03-01' + CAST(id AS INT) AS d",
    )
    src.coalesce(1).write.format("chunked_jsonl").option("path", dest).mode("append").save()
    back = (
        spark.read.format("chunked_jsonl")
        .option("path", dest)
        .option("schema", "id bigint, amount decimal(10,2), flag boolean, d date")
        .load()
    )
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint", "decimal(10,2)", "boolean", "date",
    ]
    rows = {r["id"]: r for r in back.collect()}
    assert len(rows) == 6
    import datetime as dt
    from decimal import Decimal

    for i in range(6):
        assert rows[i]["amount"] == Decimal(str(i * 1.25)).quantize(Decimal("0.01"))
        assert rows[i]["flag"] is (i % 2 == 0)
        assert rows[i]["d"] == dt.date(2024, 3, 1) + dt.timedelta(days=i)


def test_reader_rejects_nested_types_up_front(spark, tmp_path):
    """struct/map/array have no JSONL scalar encoding here: the reader
    must raise at plan time, not yield corrupt rows."""
    from supabase_etl_spark.io.jsonl_sink_source import _parse_ddl_fields

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported nested type"):
        _parse_ddl_fields("id bigint, s struct<a:int,b:string>")
    # and the happy path keeps names/types aligned through the comma
    names, types = _parse_ddl_fields("a decimal(10,2), b string, map_like_name int")
    assert names == ["a", "b", "map_like_name"]
    assert types == ["decimal(10,2)", "string", "int"]


def test_push_filters_prunes_files_by_manifest_stats(spark, tmp_path):
    """Spark 4.1 Python DSv2 filter pushdown: the sink records per-file
    numeric min/max; the reader's pushFilters prunes whole files whose
    stats cannot satisfy the predicate, while returning every filter
    for row-level re-evaluation (pruning is an I/O win, never a
    correctness dependency)."""
    import json as _json

    from supabase_etl_spark.io.jsonl_sink_source import ManifestJsonlReader

    register(spark)
    dest = str(tmp_path / "pushed")
    # three range-disjoint files: ids [0,100), [100,200), [200,300)
    for lo in (0, 100, 200):
        (
            spark.range(lo, lo + 100)
            .selectExpr("id", "id * 2 AS v")
            .coalesce(1)
            .write.format("chunked_jsonl")
            .option("path", dest)
            .mode("append")
            .save()
        )
    manifest = _json.load(open(os.path.join(dest, "_committed.json")))
    assert all("stats" in e and "id" in e["stats"] for e in manifest["files"])

    # engine path: result correctness under pushdown
    back = (
        spark.read.format("chunked_jsonl")
        .option("path", dest)
        .option("schema", "id bigint, v bigint")
        .load()
    )
    got = sorted(r["id"] for r in back.filter("id >= 250").collect())
    assert got == list(range(250, 300))

    # reader-level proof of pruning: only the [200,300) file survives
    rd = ManifestJsonlReader({"path": dest, "schema": "id bigint, v bigint"})
    from pyspark.sql.datasource import GreaterThanOrEqual

    leftover = list(rd.pushFilters([GreaterThanOrEqual(("id",), 250)]))
    assert len(leftover) == 1  # everything returned for row-level eval
    parts = rd.partitions()
    assert rd.files_total == 3 and rd.files_read == 1 and len(parts) == 1
    # fully pruned predicate yields an empty (but valid) scan
    rd2 = ManifestJsonlReader({"path": dest, "schema": "id bigint, v bigint"})
    list(rd2.pushFilters([GreaterThanOrEqual(("id",), 10_000)]))
    assert rd2.partitions()[0].path == "" and rd2.files_read == 0
    assert back.filter("id >= 10000").count() == 0
