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
