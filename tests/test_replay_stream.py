"""Full DataSourceStreamReader lifecycle: planning, slicing, restart.

The unit half drives the reader class directly (it is plain Python —
that the API is testable without a cluster is part of its point); the
integration half runs the real streaming engine twice on one
checkpoint to pin exactly-once replay across restarts.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pyarrow.parquet as pq

from supabase_etl_spark.io.replay_stream_source import (
    ParquetReplayStreamReader,
    read_replay_stream,
)

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"
COLS = ["event_id", "user_id", "event_type", "value"]


def _reader(rows_per_partition=100):
    return ParquetReplayStreamReader(
        {
            "path": EVENTS,
            "columns": ",".join(COLS),
            "rows_per_partition": str(rows_per_partition),
        }
    )


def test_offsets_span_the_file():
    r = _reader()
    total = pq.ParquetFile(EVENTS).metadata.num_rows
    assert r.initialOffset() == {"row": 0}
    assert r.latestOffset() == {"row": total}


def test_partition_planning_is_row_aligned():
    r = _reader(rows_per_partition=100)
    parts = r.partitions({"row": 0}, r.latestOffset())
    total = r.total_rows
    assert [p.start for p in parts] == list(range(0, total, 100))
    assert parts[-1].end == total
    # mid-stream resume plans only the remainder
    tail = r.partitions({"row": 250}, {"row": 450})
    assert [(p.start, p.end) for p in tail] == [(250, 350), (350, 450)]


def test_read_slices_exact_rows():
    """A middle partition must return exactly its row slice, in file
    order — compared against a direct pyarrow read."""
    r = _reader(rows_per_partition=100)
    part = r.partitions({"row": 150}, {"row": 250})[0]
    got = list(r.read(part))
    tbl = pq.read_table(EVENTS, columns=COLS).slice(150, 100)
    want = list(zip(*[tbl.column(c).to_pylist() for c in COLS]))
    assert got == want


def test_empty_range_reads_nothing():
    r = _reader()
    part = r.partitions({"row": 5}, {"row": 5})[0]
    assert list(r.read(part)) == []


def test_checkpoint_restart_is_exactly_once(spark):
    """AvailableNow drains the whole file into a parquet sink; a second
    start on the SAME checkpoint must append nothing (the committed
    offset equals latestOffset) — replay-source exactly-once."""
    out = tempfile.mkdtemp(prefix="replay_out_")
    ckpt = tempfile.mkdtemp(prefix="replay_ckpt_")
    try:
        total = pq.ParquetFile(EVENTS).metadata.num_rows

        def run_once():
            s = read_replay_stream(spark, EVENTS, COLS, rows_per_partition=100)
            q = (
                s.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_once()
        assert spark.read.parquet(out).count() == total
        run_once()  # same checkpoint: nothing new to admit
        assert spark.read.parquet(out).count() == total
        # and no duplicate event ids slipped through
        assert (
            spark.read.parquet(out).select("event_id").distinct().count() == total
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_reader_writer_crash_matrix_exactly_once(spark):
    """End-to-end exactly-once of the full Python DSv2 pipeline
    (parquet_replay stream reader → chunked_jsonl stream writer) under
    a crash MATRIX across 3+ restarts on one checkpoint:

      restart 1 — crash between sink-commit and checkpoint-advance
        (the commit marker is deleted after the run): the engine
        replays the epoch; the sink must find its batchId already in
        the manifest and drop the restaged files, not double-publish.
      restart 2 — same replay crash, plus a stale _staging file from a
        dead task attempt lying around: the orphan must stay
        unpublished (manifest-invisible).
      restart 3 — clean restart (checkpoint advanced): nothing new is
        admitted and the manifest is byte-stable.

    After every restart the manifest-listed readback must equal the
    batch aggregation of the source — no loss, no duplication."""
    import json

    from supabase_etl_spark.io import jsonl_sink_source as J

    J.register(spark)
    dest = tempfile.mkdtemp(prefix="pyds_mtx_dest_")
    ckpt = tempfile.mkdtemp(prefix="pyds_mtx_ckpt_")
    try:
        total = pq.ParquetFile(EVENTS).metadata.num_rows

        def run_once():
            s = read_replay_stream(spark, EVENTS, COLS, rows_per_partition=500)
            q = (
                s.writeStream.format("chunked_jsonl")
                .option("path", dest)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        def manifest():
            with open(os.path.join(dest, "_committed.json")) as fh:
                return json.load(fh)

        def check_exact():
            m = manifest()
            files = [os.path.join(dest, e["file"]) for e in m["files"]]
            back = spark.read.schema(
                "event_id bigint, user_id bigint, event_type string, value double"
            ).json(files)
            assert back.count() == total
            assert back.select("event_id").distinct().count() == total
            # each epoch published at most once
            assert len(m["epochs"]) == len(set(m["epochs"]))
            return m

        def crash_checkpoint():
            # simulate dying between sink-commit and checkpoint-advance:
            # drop the newest commit marker so the engine replays it
            commits = os.path.join(ckpt, "commits")
            newest = max(
                (f for f in os.listdir(commits) if not f.startswith(".")),
                key=lambda f: int(f),
            )
            os.unlink(os.path.join(commits, newest))
            # the Hadoop local FS keeps a checksum sidecar; a stale one
            # makes the restarted query think another query owns the log
            crc = os.path.join(commits, f".{newest}.crc")
            if os.path.exists(crc):
                os.unlink(crc)

        run_once()
        m0 = check_exact()

        # restart 1: replay after lost commit marker
        crash_checkpoint()
        run_once()
        m1 = check_exact()
        assert m1["files"] == m0["files"], "replayed epoch must not re-publish"

        # restart 2: replay again, now with a dead task attempt's
        # stale staging file present
        crash_checkpoint()
        staging = os.path.join(dest, "_staging")
        os.makedirs(staging, exist_ok=True)
        stale = os.path.join(staging, f"task-{uuid.uuid4().hex}.jsonl")
        with open(stale, "w") as fh:
            fh.write('{"event_id": -1, "user_id": -1, "event_type": "x", "value": 0.0}\n')
        run_once()
        m2 = check_exact()
        assert m2["files"] == m0["files"]
        published = {e["file"] for e in m2["files"]}
        assert os.path.basename(stale) not in published

        # restart 3: clean restart — checkpoint is ahead, nothing admitted
        run_once()
        m3 = check_exact()
        assert m3 == m2
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
