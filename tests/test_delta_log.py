"""Delta transaction-log interop (io/delta_log.py): action replay,
time travel, checkpoint skip, protocol gating, commit races."""

from __future__ import annotations

import json
import os

import pytest

from supabase_etl_spark.io import delta_log as D
from supabase_etl_spark.io.manifest_store import ConcurrentCommitError


def test_roundtrip_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "dl")
    assert D.write_delta(spark.range(100).selectExpr("id", "id*2 AS v"), t) == 0
    assert D.write_delta(spark.range(10).selectExpr("id", "id*2 AS v"), t) == 1
    assert D.read_delta(spark, t).count() == 10
    assert D.read_delta(spark, t, version=0).count() == 100
    assert D.current_version(t) == 1


def test_append_unions_files(spark, tmp_path):
    t = str(tmp_path / "dl")
    D.write_delta(spark.range(5), t)
    D.write_delta(spark.range(5, 12), t, mode="append")
    assert D.read_delta(spark, t).count() == 12
    assert D.read_delta(spark, t, version=0).count() == 5


def test_checkpoint_skips_json_prefix(spark, tmp_path):
    t = str(tmp_path / "dl")
    D.write_delta(spark.range(50), t)
    D.write_delta(spark.range(7), t)
    D.write_checkpoint(spark, t)
    D.write_delta(spark.range(7, 10), t, mode="append")
    # delete the pre-checkpoint JSON commits: reads must still resolve
    for v in (0, 1):
        os.unlink(os.path.join(t, "_delta_log", f"{v:020d}.json"))
    assert sorted(r["id"] for r in D.read_delta(spark, t).collect()) == list(
        range(10)
    )


def test_reads_foreign_minimal_log(spark, tmp_path):
    """A log written by hand (as another engine would) must read."""
    t = str(tmp_path / "dl")
    os.makedirs(os.path.join(t, "_delta_log"))
    spark.range(3).selectExpr("id").coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage")
    )
    part = next(
        f for f in os.listdir(tmp_path / "stage") if f.endswith(".parquet")
    )
    os.rename(tmp_path / "stage" / part, os.path.join(t, "foreign.parquet"))
    schema = spark.range(1).selectExpr("id").schema.json()
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "schemaString": schema,
                      "format": {"provider": "parquet", "options": {}},
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": "foreign.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    assert D.read_delta(spark, t).count() == 3


def test_unsupported_reader_version_raises(spark, tmp_path):
    t = str(tmp_path / "dl")
    D.write_delta(spark.range(3), t)
    path = os.path.join(t, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(path) if line.strip()]
    lines[0] = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
    with open(path, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines))
    with pytest.raises(NotImplementedError):
        D.snapshot_files(spark, t)


def test_commit_race_is_put_if_absent(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "dl")
    D.write_delta(spark.range(5), t)
    # simulate a concurrent writer landing version 1 first
    real_link = os.link

    def racing_link(src, dst):
        if dst.endswith(f"{1:020d}.json") and not os.path.exists(dst):
            with open(dst, "w") as fh:
                fh.write(json.dumps({"commitInfo": {"winner": True}}) + "\n")
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", racing_link)
    with pytest.raises(ConcurrentCommitError):
        D.write_delta(spark.range(9), t)


def test_empty_snapshot_uses_logged_schema(spark, tmp_path):
    t = str(tmp_path / "dl")
    D.write_delta(spark.range(4).selectExpr("id", "id*3 AS v"), t)
    # overwrite with empty frame: all files removed, schema survives
    D.write_delta(
        spark.range(4).selectExpr("id", "id*3 AS v").filter("id < 0"), t
    )
    out = D.read_delta(spark, t)
    assert out.count() == 0
    assert out.columns == ["id", "v"]


def test_action_replay_matches_model(tmp_path):
    """Property: for any interleaving of add/remove actions across
    commits, snapshot_files at every version equals the dict-replay
    model (last action per path wins). Pure metadata — no Spark."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.tuples(st.booleans(), st.integers(min_value=0, max_value=9)),
                min_size=1,
                max_size=4,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def run(commits):
        import shutil
        import uuid as _uuid

        t = str(tmp_path / f"dl_{_uuid.uuid4().hex[:8]}")
        os.makedirs(os.path.join(t, "_delta_log"))
        model: dict[str, bool] = {}
        expected_at = []
        for v, actions in enumerate(commits):
            lines = []
            if v == 0:
                lines.append({"protocol": {"minReaderVersion": 1}})
            for is_add, fid in actions:
                path = f"f{fid}.parquet"
                if is_add:
                    model[path] = True
                    lines.append(
                        {"add": {"path": path, "partitionValues": {},
                                 "size": 1, "modificationTime": 0,
                                 "dataChange": True}}
                    )
                else:
                    model.pop(path, None)
                    lines.append(
                        {"remove": {"path": path, "deletionTimestamp": 0,
                                    "dataChange": True}}
                    )
            with open(os.path.join(t, "_delta_log", f"{v:020d}.json"), "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in lines))
            expected_at.append(sorted(model))
        for v, exp in enumerate(expected_at):
            assert D.snapshot_files(None, t, version=v) == exp
        shutil.rmtree(t, ignore_errors=True)

    run()


def test_checkpoint_is_complete_replay_state(spark, tmp_path):
    """Delta checkpoints must contain the full replay including protocol
    and metaData actions (ADVICE r6): an external reader honoring
    _last_checkpoint never rereads the JSON prefix, so schema/protocol
    must be reconstructible from the checkpoint parquet alone."""
    t = str(tmp_path / "dl")
    D.write_delta(spark.range(20).selectExpr("id", "id * 2 AS v"), t)
    D.write_checkpoint(spark, t)
    v = D.current_version(t)
    cp = spark.read.parquet(
        os.path.join(t, "_delta_log", f"{v:020d}.checkpoint.parquet")
    )
    for col in ("add", "remove", "protocol", "metaData"):
        assert col in cp.columns, f"checkpoint missing {col} column"
    protos = [r for r in cp.select("protocol.*").collect() if r["minReaderVersion"] is not None]
    metas = [r for r in cp.select("metaData.*").collect() if r["id"] is not None]
    assert len(protos) == 1 and protos[0]["minReaderVersion"] == 1
    assert len(metas) == 1
    import json as _json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(_json.loads(metas[0]["schemaString"]))
    assert [f.name for f in schema.fields] == ["id", "v"]
    # the checkpointed protocol is enforced on read, same as JSON replay
    assert D.read_delta(spark, t).count() == 20
