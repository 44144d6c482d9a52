"""Snapshot/manifest store invariants (io/manifest_store.py): the
Delta/Iceberg core contract — atomic commits, pinned-reader isolation,
crash-invisible partial writes, overwrite semantics."""

from __future__ import annotations

import json
import os

import pytest

from supabase_etl_spark.io import manifest_store as M


def test_append_preserves_old_snapshots(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = M.commit(spark.range(100).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    v2 = M.commit(
        spark.range(100, 250).selectExpr("id", "id * 2 AS v"), t, "append"
    )
    assert (v1, v2) == (1, 2)
    assert M.read(spark, t, 1).count() == 100
    assert M.read(spark, t, 2).count() == 250
    assert M.read(spark, t).count() == 250  # latest
    # the v1 snapshot is byte-stable: same ids before and after append
    ids = sorted(r["id"] for r in M.read(spark, t, 1).collect())
    assert ids == list(range(100))


def test_overwrite_starts_fresh_but_history_remains(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(50), t, "overwrite")
    M.commit(spark.range(7), t, "overwrite")
    assert M.current_version(t) == 2
    assert M.read(spark, t).count() == 7
    assert M.read(spark, t, 1).count() == 50  # time travel across overwrite


def test_partial_write_without_manifest_is_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    # simulate a crashed writer: orphan data file, no manifest
    orphan = os.path.join(t, "data", "part-orphan.parquet")
    spark.range(999).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "o"))
    src = next(
        f for f in os.listdir(str(tmp_path / "o")) if f.endswith(".parquet")
    )
    os.rename(os.path.join(str(tmp_path / "o"), src), orphan)
    assert M.read(spark, t).count() == 10  # reader never sees the orphan
    # the next commit also ignores it
    M.commit(spark.range(5), t, "append")
    assert M.read(spark, t).count() == 15


def test_read_missing_version_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        M.read(spark, t)
    M.commit(spark.range(3), t, "overwrite")
    with pytest.raises(FileNotFoundError):
        M.read(spark, t, 9)


def test_manifest_files_are_explicit_lists(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).repartition(3), t, "overwrite")
    M.commit(spark.range(10, 20).repartition(2), t, "append")
    m1 = json.load(open(os.path.join(t, "_manifests", "v00000001.json")))
    m2 = json.load(open(os.path.join(t, "_manifests", "v00000002.json")))
    assert len(m1["files"]) == 3
    assert len(m2["files"]) == 5
    assert set(m1["files"]) <= set(m2["files"])


def test_concurrent_commit_is_put_if_absent(spark, tmp_path):
    """Two writers racing to the same version: exactly one wins; the
    loser gets ConcurrentCommitError and the winner's snapshot is
    intact (the Delta/Iceberg optimistic-concurrency contract — a
    plain rename would silently swallow the winner's commit)."""
    t = str(tmp_path / "tbl")
    df = spark.range(5).toDF("id")
    assert M.commit(df, t, note="v1") == 1

    # simulate the race: writer B publishes v2 out from under writer A
    # after A has read prev=1 — done by pre-creating the v2 manifest
    # file A is about to link into place
    mdir = os.path.join(t, "_manifests")
    winner = {"version": 2, "files": M._read_manifest(t, 1)["files"], "note": "B"}
    with open(os.path.join(mdir, "v00000002.json"), "w") as fh:
        json.dump(winner, fh)

    import unittest.mock as mock

    with mock.patch.object(M, "current_version", return_value=1):
        with pytest.raises(M.ConcurrentCommitError, match="version 2"):
            M.commit(spark.range(3).toDF("id"), t, note="A")

    # winner's manifest untouched; no tmp litter; table still readable
    assert M._read_manifest(t, 2)["note"] == "B"
    assert not [f for f in os.listdir(mdir) if f.startswith(".tmp")]
    assert M.read(spark, t).count() == 5


def test_merge_upserts_and_carries_untouched_files(spark, tmp_path):
    """COW MERGE file pruning: two appends create disjoint-key file
    sets; a source touching only the second range must (a) upsert
    correctly, (b) carry every v1 data file into v3 BY NAME — zero
    rewrite of untouched files (the property that makes MERGE cost
    touched-data-sized, not table-sized)."""
    t = str(tmp_path / "tbl")
    low = spark.range(0, 100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    high = spark.range(100, 200).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    M.commit(low.repartition(2), t, "overwrite")
    M.commit(high.repartition(2), t, "append")
    v1_files = set(M._read_manifest(t, 1)["files"])

    src = spark.range(150, 250).selectExpr("id AS k", "CAST(-id AS DOUBLE) AS v")
    v3 = M.merge(spark, t, src, ["k"])
    assert v3 == 3
    m3 = set(M._read_manifest(t, 3)["files"])
    assert v1_files <= m3, "untouched low-range files must carry over by name"

    out = {r["k"]: r["v"] for r in M.read(spark, t).collect()}
    assert len(out) == 250
    assert out[0] == 0.0 and out[149] == 149.0       # unmatched target rows kept
    assert out[150] == -150.0 and out[199] == -199.0  # matched -> updated
    assert out[249] == -249.0                         # not matched -> inserted
    # time travel still serves the pre-merge state
    assert M.read(spark, t, 2).count() == 200


def test_merge_into_empty_table_bootstraps(spark, tmp_path):
    t = str(tmp_path / "tbl")
    src = spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    assert M.merge(spark, t, src, ["k"]) == 1
    assert M.read(spark, t).count() == 5


def test_delete_where_rewrites_only_matching_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    low = spark.range(0, 100).selectExpr("id AS k")
    high = spark.range(100, 200).selectExpr("id AS k")
    M.commit(low.repartition(2), t, "overwrite")
    M.commit(high.repartition(2), t, "append")
    v1_files = set(M._read_manifest(t, 1)["files"])

    M.delete_where(spark, t, "k >= 150")
    m3 = set(M._read_manifest(t, 3)["files"])
    assert v1_files <= m3, "files with no matching row must carry over by name"
    kept = sorted(r["k"] for r in M.read(spark, t).collect())
    assert kept == list(range(150))
    # deletion is a new version, not an erasure
    assert M.read(spark, t, 2).count() == 200


def test_vacuum_drops_expired_versions_and_orphans(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).toDF("id"), t, "overwrite")     # v1
    M.commit(spark.range(10, 20).toDF("id"), t, "append")    # v2
    M.commit(spark.range(5).toDF("id"), t, "overwrite")      # v3 (drops v1/v2 files)
    # plant an orphan (aborted write / race loser): data file no manifest names
    orphan = os.path.join(t, "data", "part-orphan.parquet")
    open(orphan, "wb").write(b"junk")

    stats = M.vacuum(t, retain_versions=1)
    assert stats["manifests_removed"] == 2
    assert stats["files_removed"] >= 3  # v1+v2 data files + the orphan
    assert not os.path.exists(orphan)
    # latest version still fully readable
    assert M.read(spark, t).count() == 5
    # expired time travel is gone
    with pytest.raises(FileNotFoundError):
        M._read_manifest(t, 1)


def test_vacuum_retains_requested_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).toDF("id"), t, "overwrite")
    M.commit(spark.range(10, 20).toDF("id"), t, "append")
    M.commit(spark.range(3).toDF("id"), t, "overwrite")
    stats = M.vacuum(t, retain_versions=2)
    assert stats["manifests_removed"] == 1
    # both retained versions readable: v2 (20 rows) and v3 (3 rows)
    assert M.read(spark, t, 2).count() == 20
    assert M.read(spark, t, 3).count() == 3
    # vacuum with everything retained is a no-op
    assert M.vacuum(t, retain_versions=5) == {
        "manifests_removed": 0,
        "files_removed": 0,
    }


def test_merge_loses_commit_race_cleanly(spark, tmp_path):
    """MERGE publishes through the same put-if-absent gate as commit():
    when another writer steals the next version between the merge's
    read and publish, the merge raises ConcurrentCommitError, the
    winner's snapshot is intact, and the merge's rewritten files stay
    invisible orphans (no manifest names them)."""
    import json as _json
    import unittest.mock as mock

    t = str(tmp_path / "tbl")
    base = spark.range(10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    assert M.commit(base, t, note="v1") == 1

    # writer B steals v2 while the merge is in flight
    mdir = os.path.join(t, "_manifests")
    winner = {"version": 2, "files": M._read_manifest(t, 1)["files"], "note": "B"}
    with open(os.path.join(mdir, "v00000002.json"), "w") as fh:
        _json.dump(winner, fh)

    src = spark.range(5, 15).selectExpr("id AS k", "CAST(-id AS DOUBLE) AS v")
    with mock.patch.object(M, "current_version", return_value=1):
        with pytest.raises(M.ConcurrentCommitError, match="version 2"):
            M.merge(spark, t, src, ["k"])

    assert M._read_manifest(t, 2)["note"] == "B"
    # loser's rewrite files are orphans: latest read still serves v1 data
    assert sorted(r["k"] for r in M.read(spark, t).collect()) == list(range(10))
    # and vacuum reclaims them
    stats = M.vacuum(t, retain_versions=2)
    assert stats["files_removed"] >= 1


def test_file_stats_expose_prunable_ranges(spark, tmp_path):
    """file_stats must report footer-true row counts and column ranges
    per snapshot file — the metadata a planner prunes on. Disjoint-key
    appends yield disjoint reported ranges; a pinned old version
    reports only its own files."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(0, 100).toDF("k"), t, "overwrite")
    M.commit(spark.range(100, 200).toDF("k"), t, "append")

    stats = M.file_stats(t)
    assert sum(s["rows"] for s in stats) == 200
    ranges = sorted((s["columns"]["k"]["min"], s["columns"]["k"]["max"]) for s in stats)
    assert ranges[0][1] < ranges[-1][0], "disjoint appends must report disjoint ranges"
    assert all(s["bytes"] > 0 for s in stats)

    v1 = M.file_stats(t, version=1)
    assert sum(s["rows"] for s in v1) == 100
    assert max(s["columns"]["k"]["max"] for s in v1) == 99


def test_interleaved_commit_raises_not_lost_update(spark, tmp_path):
    """The real lost-update race (no mocks): writer A reads base N,
    writer B commits v(N+1), A publishes. A must get
    ConcurrentCommitError — if _commit_files re-read current_version
    at publish time, A would link v(N+2) built from N's file list and
    B's commit would silently vanish from the latest snapshot."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).toDF("id"), t, "overwrite", note="base")  # v1

    # writer A: reads its base snapshot (v1) and stages data files
    base = M.current_version(t)
    a_files = M._read_manifest(t, base)["files"] + M._write_data_files(
        spark.range(100, 105).toDF("id"), t
    )
    # writer B lands v2 while A is between read and publish
    M.commit(spark.range(50, 60).toDF("id"), t, "append", note="B")
    assert M.current_version(t) == 2

    with pytest.raises(M.ConcurrentCommitError, match="version 2"):
        M._commit_files(t, a_files, "A", base_version=base)

    # B's rows are still in the latest snapshot — nothing lost
    ids = sorted(r["id"] for r in M.read(spark, t).collect())
    assert ids == list(range(10)) + list(range(50, 60))


def test_delete_where_null_condition_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: only condition=TRUE rows are deleted.
    Rows where the condition evaluates to NULL must survive even when
    they share a file with deleted rows (filter(~cond) alone drops
    them, making the outcome depend on file co-location)."""
    t = str(tmp_path / "tbl")
    df = spark.sql(
        "SELECT * FROM VALUES (1, 10), (2, NULL), (3, 200) AS t(k, v)"
    ).coalesce(1)  # one file: null-cond row co-located with a deleted row
    M.commit(df, t, "overwrite")
    M.delete_where(spark, t, "v > 100")
    kept = sorted((r["k"], r["v"]) for r in M.read(spark, t).collect())
    assert kept == [(1, 10), (2, None)], "NULL-condition row must survive"


def test_vacuum_retention_window_spares_young_files(spark, tmp_path):
    """A vacuum racing an in-flight commit must not reap just-staged
    files: with retention_seconds set, unreferenced files younger than
    the window survive; aged files (simulated via mtime rewind) go."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5).toDF("id"), t, "overwrite")
    young = os.path.join(t, "data", "part-inflight.parquet")
    open(young, "wb").write(b"staged-by-inflight-commit")
    old = os.path.join(t, "data", "part-aborted.parquet")
    open(old, "wb").write(b"aborted-long-ago")
    os.utime(old, (1, 1))  # epoch-old mtime

    stats = M.vacuum(t, retain_versions=1, retention_seconds=3600)
    assert os.path.exists(young), "in-flight staged file must survive the window"
    assert not os.path.exists(old), "aged orphan must be reclaimed"
    assert stats["files_removed"] == 1
    # default (0) still reclaims immediately — documented single-writer mode
    stats2 = M.vacuum(t, retain_versions=1)
    assert not os.path.exists(young)
    assert stats2["files_removed"] == 1


def test_restore_is_forward_commit_with_race_safety(spark, tmp_path):
    """restore() publishes a NEW version sharing the target's files by
    name (no data movement), loses commit races cleanly, and never
    rewrites history."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).toDF("id"), t, "overwrite")   # v1
    M.commit(spark.range(3).toDF("id"), t, "overwrite")    # v2
    v1_files = M._read_manifest(t, 1)["files"]

    v3 = M.restore(t, 1)
    assert v3 == 3
    assert M._read_manifest(t, 3)["files"] == v1_files  # shared by name
    assert M.read(spark, t).count() == 10
    assert M.read(spark, t, 2).count() == 3  # history intact

    # race: another writer steals v4 between restore's read and publish
    import json as _json
    winner = {"version": 4, "files": v1_files, "note": "B"}
    with open(os.path.join(t, "_manifests", "v00000004.json"), "w") as fh:
        _json.dump(winner, fh)
    import unittest.mock as mock

    with mock.patch.object(M, "_versions", return_value=[1, 2, 3]):
        with pytest.raises(M.ConcurrentCommitError):
            M.restore(t, 2)
    assert M._read_manifest(t, 4)["note"] == "B"


def test_optimize_compacts_and_isolates_pinned_readers(spark, tmp_path):
    """optimize() rewrites only the live snapshot into the target file
    count; pinned readers of the pre-optimize version still resolve
    their original files."""
    t = str(tmp_path / "tbl")
    for i in range(5):
        M.commit(
            spark.range(i * 100, (i + 1) * 100).toDF("k").repartition(1),
            t,
            "overwrite" if i == 0 else "append",
        )
    assert len(M._read_manifest(t, 5)["files"]) == 5
    v6 = M.optimize(spark, t, target_files=2, cluster_by=["k"])
    assert v6 == 6
    assert len(M._read_manifest(t, 6)["files"]) == 2
    assert sorted(r["k"] for r in M.read(spark, t).collect()) == list(range(500))
    # pinned pre-optimize reader unaffected
    assert M.read(spark, t, 5).count() == 500
    assert len(M._read_manifest(t, 5)["files"]) == 5


def test_branch_stage_is_invisible_to_main(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.stage(spark.range(10, 30), t, "audit")
    # main readers see only the committed snapshot; the branch sees the
    # would-be fast-forward
    assert M.read(spark, t).count() == 10
    assert M.current_version(t) == 1
    assert M.read_branch(spark, t, "audit").count() == 30


def test_branch_publish_fast_forwards_main(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.stage(spark.range(10, 30), t, "audit")
    v = M.publish_branch(t, "audit")
    assert v == 2
    assert M.read(spark, t).count() == 30
    # publish is terminal: the branch is gone
    with pytest.raises(FileNotFoundError):
        M.read_branch(spark, t, "audit")


def test_branch_publish_after_main_advanced_raises(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.stage(spark.range(10, 30), t, "audit")
    # main advances while the audit is running
    M.commit(spark.range(100, 105), t, "append")
    with pytest.raises(M.ConcurrentCommitError):
        M.publish_branch(t, "audit")
    # the staged snapshot is intact for a re-stage decision
    assert M.read_branch(spark, t, "audit").count() == 30
    assert M.read(spark, t).count() == 15


def test_drop_branch_leaves_main_untouched_and_orphans_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.stage(spark.range(10, 30), t, "bad")
    M.drop_branch(t, "bad")
    assert M.read(spark, t).count() == 10
    with pytest.raises(FileNotFoundError):
        M.read_branch(spark, t, "bad")
    # the dropped batch's files are orphans now; vacuum reclaims them
    stats = M.vacuum(t)
    assert stats["files_removed"] >= 1
    assert M.read(spark, t).count() == 10


def test_vacuum_spares_staged_branch_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.stage(spark.range(10, 30), t, "audit")
    stats = M.vacuum(t)  # branch files are LIVE roots, not orphans
    assert stats["files_removed"] == 0
    assert M.read_branch(spark, t, "audit").count() == 30
    # and the branch still publishes cleanly after the vacuum
    assert M.publish_branch(t, "audit") == 2
    assert M.read(spark, t).count() == 30


def test_restage_replaces_branch_atomically(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.stage(spark.range(10, 20), t, "audit")
    M.stage(spark.range(10, 15), t, "audit")  # re-stage smaller batch
    assert M.read_branch(spark, t, "audit").count() == 15
    assert M.publish_branch(t, "audit") == 2
    assert M.read(spark, t).count() == 15


def test_shallow_clone_is_zero_copy_then_diverges(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    M.commit(spark.range(100), src, "overwrite")
    v = M.clone_shallow(src, dst)
    assert v == 1
    # zero-copy: the clone's data dir holds no files of its own yet
    import os

    ddir = os.path.join(dst, "data")
    assert not os.path.isdir(ddir) or os.listdir(ddir) == []
    assert M.read(spark, dst).count() == 100
    # divergence: each side appends independently
    M.commit(spark.range(100, 130), src, "append")
    M.commit(spark.range(200, 205), dst, "append")
    assert M.read(spark, src).count() == 130
    assert M.read(spark, dst).count() == 105
    # the clone's own batch landed in the clone's data dir
    assert len(os.listdir(ddir)) >= 1


def test_source_vacuum_orphans_clone_borrowed_files(spark, tmp_path):
    """The documented Delta caveat: expiring SOURCE history can remove
    files a shallow clone still references — the clone then fails to
    read, which is exactly why retention windows guard vacuum."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    M.commit(spark.range(50), src, "overwrite")
    M.clone_shallow(src, dst)
    # source rewrites itself (overwrite) then vacuums old history
    M.commit(spark.range(5), src, "overwrite")
    M.vacuum(src, retain_versions=1)
    with pytest.raises(Exception):
        M.read(spark, dst).count()


# ---------------------------------------------------------------------------
# Merge-on-read equality deletes
# ---------------------------------------------------------------------------


def test_mor_delete_rewrites_nothing_and_filters_reads(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(100).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    files_before = M._read_manifest(t, 1)["files"]
    M.delete_where_mor(spark, t, "id < 10", ["id"])
    m = M._read_manifest(t, 2)
    assert m["files"] == files_before  # zero data files rewritten
    assert len(m["deletes"]) == 1
    assert M.read(spark, t).count() == 90
    # time travel to v1 still sees the deleted rows
    assert M.read(spark, t, 1).count() == 100


def test_mor_delete_scope_spares_later_appends(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(50).selectExpr("id", "id AS v"), t, "overwrite")
    M.delete_where_mor(spark, t, "id < 5", ["id"])
    # re-append rows with the deleted keys: they are NEWER than the
    # delete and must survive (sequence-number ordering)
    M.commit(spark.range(5).selectExpr("id", "id + 1000 AS v"), t, "append")
    got = {(r["id"], r["v"]) for r in M.read(spark, t).collect() if r["id"] < 5}
    assert got == {(i, i + 1000) for i in range(5)}


def test_compact_mor_folds_deletes_and_preserves_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(100).selectExpr("id", "id AS v"), t, "overwrite")
    M.delete_where_mor(spark, t, "id % 2 = 0", ["id"])
    M.delete_where_mor(spark, t, "id > 90", ["id"])
    before = sorted(r["id"] for r in M.read(spark, t).collect())
    v = M.compact_mor(spark, t)
    m = M._read_manifest(t, v)
    assert "deletes" not in m
    assert sorted(r["id"] for r in M.read(spark, t).collect()) == before
    # compaction on a delete-free table is a no-op version-wise
    assert M.compact_mor(spark, t) == v


def test_vacuum_spares_live_delete_files_then_collects_expired(spark, tmp_path):
    import os

    t = str(tmp_path / "tbl")
    M.commit(spark.range(100).selectExpr("id", "id AS v"), t, "overwrite")
    M.delete_where_mor(spark, t, "id < 10", ["id"])
    # retain the MOR snapshot: its delete files must survive GC
    M.vacuum(t, retain_versions=1)
    assert M.read(spark, t).count() == 90
    m = M._read_manifest(t, M.current_version(t))
    for e in m["deletes"]:
        for f in e["files"]:
            assert os.path.exists(os.path.join(t, f))
    # compact, then expire the MOR snapshot: delete files are orphans now
    M.compact_mor(spark, t)
    M.vacuum(t, retain_versions=1)
    ddir = os.path.join(t, "deletes")
    left = [f for f in os.listdir(ddir)] if os.path.isdir(ddir) else []
    assert left == []
    assert M.read(spark, t).count() == 90


def test_cow_delete_after_mor_does_not_resurrect(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(100).selectExpr("id", "id AS v").repartition(2), t)
    M.delete_where_mor(spark, t, "id < 10", ["id"])
    # COW delete of a different predicate: carried files keep the MOR
    # delete applied; nothing deleted earlier reappears
    M.delete_where(spark, t, "id >= 95")
    ids = sorted(r["id"] for r in M.read(spark, t).collect())
    assert ids == list(range(10, 95))


def test_restore_carries_mor_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(20).selectExpr("id", "id AS v"), t, "overwrite")
    M.delete_where_mor(spark, t, "id < 5", ["id"])          # v2: 15 rows
    M.commit(spark.range(100, 110).selectExpr("id", "id AS v"), t, "append")
    v = M.restore(t, 2)
    assert M.read(spark, t, v).count() == 15  # deletes restored with files


# ---------------------------------------------------------------------------
# Schema enforcement
# ---------------------------------------------------------------------------


def test_schema_enforce_rejects_added_and_retyped_columns(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    with pytest.raises(M.SchemaEnforcementError, match="added=\\['extra'\\]"):
        M.commit(
            spark.range(5).selectExpr("id", "id AS v", "id AS extra"),
            t,
            "append",
            schema_mode="enforce",
        )
    with pytest.raises(M.SchemaEnforcementError, match="retyped=\\['v'\\]"):
        M.commit(
            spark.range(5).selectExpr("id", "CAST(id AS STRING) AS v"),
            t,
            "append",
            schema_mode="enforce",
        )
    # nothing was committed by the failed attempts
    assert M.current_version(t) == 1
    assert M.read(spark, t).count() == 10


def test_schema_enforce_accepts_identical_and_merge_still_evolves(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).selectExpr("id", "id AS v"), t, "overwrite")
    M.commit(
        spark.range(10, 15).selectExpr("id", "id AS v"), t, "append", schema_mode="enforce"
    )
    assert M.read(spark, t).count() == 15
    # default merge mode keeps the historical evolution behavior
    M.commit(spark.range(15, 18).selectExpr("id", "id AS v", "id AS w"), t, "append")
    got = M.read(spark, t)
    assert got.count() == 18 and "w" in got.columns


# ---------------------------------------------------------------------------
# Metadata-only counts
# ---------------------------------------------------------------------------


def test_metadata_count_matches_scan_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(123).selectExpr("id"), t, "overwrite")
    M.commit(spark.range(200, 250).selectExpr("id"), t, "append")
    assert M.metadata_count(t, 1) == 123
    assert M.metadata_count(t) == 173 == M.read(spark, t).count()


def test_metadata_count_declines_under_mor_then_recovers(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(100).selectExpr("id"), t, "overwrite")
    M.delete_where_mor(spark, t, "id < 40", ["id"])
    assert M.metadata_count(t) is None  # footers can't see anti-joined rows
    assert M.metadata_count(t, 1) == 100  # pre-delete snapshot still metadata-answerable
    M.compact_mor(spark, t)
    assert M.metadata_count(t) == 60 == M.read(spark, t).count()


def test_metadata_count_requires_a_committed_version(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        M.metadata_count(str(tmp_path / "nope"))


def test_check_constraint_gates_commit_and_merge(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.add_constraint(spark, t, "v_nonneg", "v >= 0")
    # clean append passes and the constraint survives it
    M.commit(spark.range(10, 15).selectExpr("id", "id AS v"), t, "append")
    with pytest.raises(M.ConstraintViolationError, match="v_nonneg \\(2 rows\\)"):
        M.commit(
            spark.range(2).selectExpr("id", "-1 * (id + 1) AS v"), t, "append"
        )
    with pytest.raises(M.ConstraintViolationError, match="v_nonneg"):
        M.merge(
            spark,
            t,
            spark.range(3).selectExpr("id", "-5 AS v"),
            key_cols=["id"],
        )
    # failed writes committed nothing
    assert M.read(spark, t).count() == 15
    # overwrite is gated too (constraints are table metadata, not data)
    with pytest.raises(M.ConstraintViolationError):
        M.commit(spark.range(3).selectExpr("id", "-9 AS v"), t, "overwrite")


def test_check_constraint_null_passes_and_existing_data_validated(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.range(5).selectExpr(
            "id", "CASE WHEN id = 3 THEN NULL ELSE CAST(id AS BIGINT) END AS v"
        ),
        t,
        "overwrite",
    )
    # NULL evaluations pass (SQL CHECK semantics)
    M.add_constraint(spark, t, "v_small", "v < 100")
    M.commit(
        spark.range(1).selectExpr("id", "CAST(NULL AS BIGINT) AS v"), t, "append"
    )
    # adding a constraint the CURRENT data violates is rejected
    with pytest.raises(M.ConstraintViolationError, match="v_big"):
        M.add_constraint(spark, t, "v_big", "v > 100")
    # duplicate names rejected
    with pytest.raises(ValueError, match="already exists"):
        M.add_constraint(spark, t, "v_small", "v < 50")


def test_check_constraint_survives_maintenance_and_drops(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(20).selectExpr("id", "id AS v"), t, "overwrite")
    M.add_constraint(spark, t, "v_nonneg", "v >= 0")
    # carried through COW delete and optimize (metadata inheritance)
    M.delete_where(spark, t, "v > 15")
    M.optimize(spark, t, target_files=2)
    with pytest.raises(M.ConstraintViolationError):
        M.commit(spark.range(1).selectExpr("id", "-1 AS v"), t, "append")
    # drop restores writability for previously-violating rows
    M.drop_constraint(t, "v_nonneg")
    M.commit(spark.range(1).selectExpr("id", "-1 AS v"), t, "append")
    with pytest.raises(ValueError, match="does not exist"):
        M.drop_constraint(t, "v_nonneg")


def test_tag_pins_version_through_vacuum(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(100), t, "overwrite")
    assert M.create_tag(t, "golden") == 1
    M.commit(spark.range(10), t, "overwrite")
    M.commit(spark.range(20), t, "overwrite")
    stats = M.vacuum(t, retain_versions=1)
    # untagged v2 expired; tagged v1 and latest v3 survive
    assert stats["manifests_removed"] == 1
    assert M.read_tag(spark, t, "golden").count() == 100
    assert M.read(spark, t).count() == 20
    with pytest.raises(FileNotFoundError):
        M.read(spark, t, 2)


def test_tag_is_immutable_and_validated(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5), t, "overwrite")
    M.create_tag(t, "rel")
    with pytest.raises(ValueError):
        M.create_tag(t, "rel")  # duplicate name never overwrites
    with pytest.raises(ValueError):
        M.create_tag(t, "../escape")
    with pytest.raises(FileNotFoundError):
        M.create_tag(t, "ghost", version=99)
    assert [tag["name"] for tag in M.list_tags(t)] == ["rel"]


def test_drop_tag_reverts_to_normal_retention(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(9), t, "overwrite")
    M.create_tag(t, "tmp")
    M.commit(spark.range(3), t, "overwrite")
    M.drop_tag(t, "tmp")
    M.vacuum(t, retain_versions=1)
    with pytest.raises(FileNotFoundError):
        M.read(spark, t, 1)  # untagged again -> expired
    with pytest.raises(FileNotFoundError):
        M.resolve_tag(t, "tmp")


def test_hidden_partitioning_prunes_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "id % 10 AS g", "id * 2 AS v")
    M.commit_partitioned(df, t, {"band": "id % 4"})
    full, total, read_all = M.read_partitioned(spark, t)
    assert (total, read_all) == (4, 4)
    assert full.count() == 100
    # transform values never materialize as data columns
    assert "band" not in full.columns
    pruned, total, n_read = M.read_partitioned(spark, t, filters={"band": "2"})
    assert (total, n_read) == (4, 1)
    ids = sorted(r["id"] for r in pruned.collect())
    assert ids == [i for i in range(100) if i % 4 == 2]
    with pytest.raises(FileNotFoundError):
        M.read_partitioned(spark, t, filters={"band": "99"})


def test_commit_with_retry_wins_after_race(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5), t, "overwrite")
    real_link = os.link
    fails = {"left": 2}  # lose the race twice, then win

    def racing_link(src, dst):
        if "_manifests" in dst and fails["left"] > 0 and not os.path.exists(dst):
            fails["left"] -= 1
            with open(dst, "w") as fh:
                json.dump({"version": 0, "files": [], "note": "winner"}, fh)
        return real_link(src, dst)

    monkeypatch.setattr(os, "link", racing_link)
    v = M.commit_with_retry(spark.range(3), t, mode="append")
    # the injected winners published empty overwrites at v2/v3, so the
    # retried append re-read THEIR snapshot (not v1's) — lost-update-
    # free: 0 carried files + 3 appended rows
    assert fails["left"] == 0
    assert v == 4 == M.current_version(t)
    assert M.read(spark, t, v).count() == 3


def test_branch_staged_on_mor_table_keeps_deletes(spark, tmp_path):
    """WAP × MOR interplay (ADVICE r6, medium): staging an append branch
    on a table with live merge-on-read deletes must carry the deletes —
    read_branch() applies them and publish_branch() commits them, so
    publishing never resurrects deleted rows on main."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(100).selectExpr("id", "id AS v"), t, "overwrite")
    M.delete_where_mor(spark, t, "id < 10", ["id"])  # 90 live rows
    M.stage(spark.range(1000, 1020).selectExpr("id", "id AS v"), t, "audit")
    # the audit surface already honors the deletes
    branch_ids = {r["id"] for r in M.read_branch(spark, t, "audit").collect()}
    assert branch_ids == set(range(10, 100)) | set(range(1000, 1020))
    v = M.publish_branch(t, "audit")
    main_ids = {r["id"] for r in M.read(spark, t, v).collect()}
    assert main_ids == branch_ids, "publish resurrected MOR-deleted rows"
    # overwrite-mode staging replaces the file set: base deletes gone
    M.stage(spark.range(5), t, "fresh", mode="overwrite")
    assert M.read_branch(spark, t, "fresh").count() == 5


def test_restore_preserves_partition_metadata(spark, tmp_path):
    """restore() must forward the target snapshot's partitions map
    (ADVICE r6, low): a restored hidden-partitioned snapshot stays
    filter-prunable via read_partitioned()."""
    t = str(tmp_path / "tbl")
    df = spark.range(40).selectExpr("id", "id AS v")
    M.commit_partitioned(df, t, {"band": "id % 4"})
    M.commit(spark.range(5), t, "overwrite")  # v2 clobbers main
    v3 = M.restore(t, 1)
    pruned, total, n_read = M.read_partitioned(spark, t, filters={"band": "2"})
    assert n_read < total
    assert sorted(r["id"] for r in pruned.collect()) == [i for i in range(40) if i % 4 == 2]
    assert M.read(spark, t, v3).count() == 40


def test_positional_delete_removes_exact_rows_not_key_twins(spark, tmp_path):
    """Positional deletes address physical rows: with duplicate keys,
    deleting WHERE v = 'old' must keep the same-key sibling row that an
    equality delete on id would also erase."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "old") for i in range(10)] + [(i, "new") for i in range(10)],
        "id bigint, v string",
    )
    M.commit(df, t, "overwrite")
    files_before = M._read_manifest(t, 1)["files"]
    v = M.delete_where_positional(spark, t, "v = 'old'")
    m = M._read_manifest(t, v)
    assert m["files"] == files_before  # zero data files rewritten
    assert m["deletes"][0]["type"] == "positional"
    got = {(r["id"], r["v"]) for r in M.read(spark, t).collect()}
    assert got == {(i, "new") for i in range(10)}
    # time travel to v1 still sees everything
    assert M.read(spark, t, 1).count() == 20


def test_positional_delete_spares_later_appends_and_compacts(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(50).selectExpr("id", "id AS v"), t, "overwrite")
    M.delete_where_positional(spark, t, "id < 5")
    # rows re-appended with the same ids are NEWER physical rows in new
    # files: the positional delete's applies_to scope misses them
    M.commit(spark.range(5).selectExpr("id", "id + 1000 AS v"), t, "append")
    got = {(r["id"], r["v"]) for r in M.read(spark, t).collect() if r["id"] < 5}
    assert got == {(i, i + 1000) for i in range(5)}
    # mixing kinds: an equality delete on top of the positional one
    M.delete_where_mor(spark, t, "id >= 48", ["id"])
    assert M.read(spark, t).count() == 45 + 5 - 2  # 45 survivors + 5 re-adds - {48,49}
    v = M.compact_mor(spark, t)
    assert "deletes" not in M._read_manifest(t, v)
    assert M.read(spark, t, v).count() == 48


def test_partition_evolution_scans_old_spec_conservatively(spark, tmp_path):
    """Partition evolution (Iceberg spec-id semantics): an append may
    change the partition transform; files keep their own spec's tuple,
    and filters on the NEW spec prune new-spec files while keeping
    every old-spec file (exclusion unprovable) — data is never lost."""
    t = str(tmp_path / "tbl")
    df1 = spark.range(40).selectExpr("id", "id % 4 AS grp", "id * 2 AS v")
    M.commit_partitioned(df1, t, {"band": "id % 4"})
    n_old = len(M._read_manifest(t, 1)["files"])
    df2 = spark.range(100, 140).selectExpr("id", "id % 4 AS grp", "id * 2 AS v")
    M.commit_partitioned(df2, t, {"parity": "id % 2"}, mode="append")
    m2 = M._read_manifest(t, 2)
    assert len(m2["files"]) == n_old + 2
    # filter on the NEW spec: old-spec files all retained, new pruned
    pruned, total, n_read = M.read_partitioned(spark, t, filters={"parity": "1"})
    assert total == n_old + 2 and n_read == n_old + 1
    ids = sorted(r["id"] for r in pruned.filter("id % 2 = 1").collect())
    assert ids == [i for i in range(40) if i % 2 == 1] + [
        i for i in range(100, 140) if i % 2 == 1
    ]
    # filter on the OLD spec: new-spec files all retained
    pruned2, _, n_read2 = M.read_partitioned(spark, t, filters={"band": "2"})
    assert n_read2 == 1 + 2
    assert sorted(r["id"] for r in pruned2.filter("id % 4 = 2").collect()) == [
        i for i in range(40) if i % 4 == 2
    ] + [i for i in range(100, 140) if i % 4 == 2]


def test_history_describes_live_snapshots(spark, tmp_path):
    """DESCRIBE HISTORY analog: one row per live version with note and
    metadata counts; vacuumed versions disappear from the listing."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).repartition(2), t, "overwrite", note="bootstrap")
    M.commit(spark.range(10, 20).repartition(1), t, "append", note="daily load")
    M.delete_where_mor(spark, t, "id < 3", ["id"], note="gdpr")
    h = M.history(t)
    assert [r["version"] for r in h] == [1, 2, 3]
    assert h[0]["note"] == "bootstrap" and h[0]["n_files"] == 2
    assert h[1]["n_files"] == 3 and h[1]["n_delete_entries"] == 0
    assert h[2]["note"] == "gdpr" and h[2]["n_delete_entries"] == 1
    M.vacuum(t, retain_versions=1)
    assert [r["version"] for r in M.history(t)] == [3]


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: resolve the newest snapshot at-or-before a wall
    clock instant; before-first-commit raises; stamped created_at_ms is
    authoritative (with mtime fallback for pre-stamp manifests)."""
    import json as _json

    t = str(tmp_path / "tbl")
    M.commit(spark.range(10), t, "overwrite")
    M.commit(spark.range(10, 30), t, "append")
    # pin deterministic commit times
    for v, ts in ((1, 1_000_000), (2, 2_000_000)):
        path = os.path.join(t, "_manifests", f"v{v:08d}.json")
        m = _json.load(open(path))
        m["created_at_ms"] = ts
        _json.dump(m, open(path, "w"))
    assert M.resolve_as_of(t, 1_500_000) == 1
    assert M.resolve_as_of(t, 2_000_000) == 2
    assert M.read_as_of(spark, t, 1_999_999).count() == 10
    assert M.read_as_of(spark, t, 9_999_999).count() == 30
    with pytest.raises(FileNotFoundError):
        M.resolve_as_of(t, 999_999)
    # mtime fallback: a foreign manifest without the stamp still resolves
    path = os.path.join(t, "_manifests", f"v{1:08d}.json")
    m = _json.load(open(path))
    del m["created_at_ms"]
    _json.dump(m, open(path, "w"))
    assert M.resolve_as_of(t, int(os.path.getmtime(path) * 1000) + 1) >= 1


# ---------------------------------------------------------------------------
# column mapping (metadata-only rename) + row lineage
# ---------------------------------------------------------------------------


def test_rename_column_is_metadata_only_and_time_travel_correct(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = M.commit(spark.range(10).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    v2 = M.rename_column(t, "v", "doubled")
    # metadata-only: identical file list, no new data files
    assert M._read_manifest(t, v1)["files"] == M._read_manifest(t, v2)["files"]
    # latest read exposes the logical name; pinned read keeps the old one
    assert "doubled" in M.read(spark, t).columns
    assert "v" not in M.read(spark, t).columns
    assert "v" in M.read(spark, t, v1).columns


def test_rename_column_append_translates_logical_to_physical(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.rename_column(t, "v", "doubled")
    M.commit(spark.range(5, 8).selectExpr("id", "id * 2 AS doubled"), t, "append")
    out = M.read(spark, t)
    assert out.columns == ["id", "doubled"]
    assert out.count() == 8
    # physical files all agree on the original footer name -> one schema,
    # no mergeSchema splits
    rows = sorted(r["doubled"] for r in out.collect())
    assert rows == [i * 2 for i in range(8)]


def test_rename_column_chain_and_collisions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(3).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.rename_column(t, "v", "a")
    M.rename_column(t, "a", "b")  # chained rename keeps pointing at physical v
    assert M.read(spark, t).columns == ["id", "b"]
    with pytest.raises(ValueError):
        M.rename_column(t, "nope", "x")  # unknown logical name
    with pytest.raises(ValueError):
        M.rename_column(t, "b", "id")  # collision with live column


def test_row_lineage_blocks_are_stable_across_appends(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).orderBy("id").coalesce(1), t, "overwrite")
    lin1 = {r["id"]: r["_row_id"] for r in M.read_lineage(spark, t).collect()}
    M.commit(spark.range(10, 25).orderBy("id").coalesce(1), t, "append")
    lin2 = {r["id"]: r["_row_id"] for r in M.read_lineage(spark, t).collect()}
    # old rows keep their ids verbatim; new rows extend the sequence
    assert all(lin2[k] == v for k, v in lin1.items())
    assert sorted(lin2.values()) == list(range(1, 26))
    # commit version stamps
    vers = {r["id"]: r["_commit_version"] for r in M.read_lineage(spark, t).collect()}
    assert vers[0] == 1 and vers[24] == 2


def test_row_lineage_time_travel_and_monotonic_next_id(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(4).coalesce(1), t, "overwrite")
    M.commit(spark.range(4, 9).coalesce(1), t, "append")
    # pinned v1 sees only block 1
    ids_v1 = sorted(r["_row_id"] for r in M.read_lineage(spark, t, 1).collect())
    assert ids_v1 == [1, 2, 3, 4]
    assert M._read_manifest(t, 2)["next_row_id"] == 10
    # overwrite starts a fresh file but ids keep ascending (global uniqueness)
    M.commit(spark.range(2).coalesce(1), t, "overwrite")
    ids_v3 = sorted(r["_row_id"] for r in M.read_lineage(spark, t, 3).collect())
    assert ids_v3 == [10, 11]


def test_merge_delete_clause_single_transaction(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(spark.range(10).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    feed = spark.createDataFrame(
        [(2, "D", None), (3, "U", 99), (100, "U", 7)], "id long, op string, v long"
    )
    v = M.merge(spark, t, feed, ["id"], delete_condition="op = 'D'")
    rows = {r["id"]: r["v"] for r in M.read(spark, t).collect()}
    assert 2 not in rows  # tombstone removed the key
    assert rows[3] == 99  # matched update
    assert rows[100] == 7  # not-matched insert
    assert len(rows) == 10  # 10 - 1 deleted + 1 inserted
    # atomicity: exactly ONE new version for the whole feed
    assert v == 2 and M.current_version(t) == 2
    # command column did not leak into the table
    assert "op" not in M.read(spark, t).columns


def test_merge_delete_clause_tombstone_only_file_rewrites(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # two single-row files
    M.commit(spark.range(1).selectExpr("id", "id AS v").coalesce(1), t, "overwrite")
    M.commit(
        spark.range(1, 2).selectExpr("id", "id AS v").coalesce(1), t, "append"
    )
    feed = spark.createDataFrame([(1, "D")], "id long, op string")
    M.merge(spark, t, feed, ["id"], delete_condition="op = 'D'")
    rows = [r["id"] for r in M.read(spark, t).collect()]
    assert rows == [0]  # a file containing ONLY deleted keys was rewritten away


def test_rename_swap_reusing_vacated_name(spark, tmp_path):
    """rename a->c then b->a (reusing the vacated name) must translate
    simultaneously at every boundary — iterated withColumnRenamed
    duplicates columns mid-chain (ADVICE r7, medium)."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(3).selectExpr("id", "id AS a", "id * 2 AS b"), t, "overwrite")
    M.rename_column(t, "a", "c")
    M.rename_column(t, "b", "a")  # logical a now points at physical b
    got = M.read(spark, t)
    assert sorted(got.columns) == ["a", "c", "id"]
    assert {r["id"]: (r["c"], r["a"]) for r in got.collect()} == {
        0: (0, 0), 1: (1, 2), 2: (2, 4)
    }
    # writer speaks the swapped logical schema; footers stay physical
    M.commit(
        spark.range(3, 5).selectExpr("id", "id AS c", "id * 2 AS a"), t, "append"
    )
    back = {r["id"]: (r["c"], r["a"]) for r in M.read(spark, t).collect()}
    assert back[4] == (4, 8)
    # lineage surface translates the same way
    assert sorted(M.read_lineage(spark, t).columns) == [
        "_commit_version", "_row_id", "a", "c", "id"
    ]


def test_merge_translates_logical_names_after_rename(spark, tmp_path):
    """merge() with a source speaking the CURRENT logical name must hit
    the physical column, not null-fill a new one (ADVICE r7, medium)."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.rename_column(t, "v", "val")
    src = spark.createDataFrame([(2, 99), (10, 7)], "id long, val long")
    M.merge(spark, t, src, ["id"])
    got = M.read(spark, t)
    assert sorted(got.columns) == ["id", "val"]  # no duplicate/split schema
    rows = {r["id"]: r["val"] for r in got.collect()}
    assert rows[2] == 99 and rows[10] == 7 and len(rows) == 6


def test_constraint_added_after_rename_keeps_table_writable(spark, tmp_path):
    """A CHECK constraint written against the post-rename logical name
    must gate later commits instead of failing resolution (ADVICE r7)."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.rename_column(t, "v", "val")
    M.add_constraint(spark, t, "val_nonneg", "val >= 0")
    # good append passes (was: AnalysisException on every commit)
    M.commit(spark.range(5, 7).selectExpr("id", "id * 2 AS val"), t, "append")
    with pytest.raises(M.ConstraintViolationError):
        M.commit(spark.createDataFrame([(9, -1)], "id long, val long"), t, "append")


def test_constraint_added_before_rename_is_rewritten(spark, tmp_path):
    """rename_column rewrites stored constraint expressions so a
    pre-rename constraint keeps gating post-rename (logical) writes."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.add_constraint(spark, t, "v_nonneg", "v >= 0")
    M.rename_column(t, "v", "val")
    assert M._read_manifest(t, M.current_version(t))["constraints"][0]["expr"] == "val >= 0"
    M.commit(spark.range(5, 7).selectExpr("id", "id * 2 AS val"), t, "append")
    with pytest.raises(M.ConstraintViolationError):
        M.commit(spark.createDataFrame([(9, -1)], "id long, val long"), t, "append")


def test_merge_delete_condition_requires_committed_table(spark, tmp_path):
    """CDC apply against a nonexistent table fails fast instead of
    leaking command columns into the init schema (ADVICE r7, low)."""
    t = str(tmp_path / "tbl")
    feed = spark.createDataFrame([(1, "D")], "id long, op string")
    with pytest.raises(FileNotFoundError):
        M.merge(spark, t, feed, ["id"], delete_condition="op = 'D'")


def test_partition_tuples_survive_every_commit_path(spark, tmp_path):
    """VERDICT r7 finding 3: commit_partitioned -> append -> merge ->
    stage/publish_branch; read_partitioned(filters=...) must still
    prune files at each step (carried files keep their tuples; only
    rewritten/new files scan conservatively)."""
    t = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    M.commit_partitioned(df, t, {"band": "id % 4"})
    _, total0, read0 = M.read_partitioned(spark, t, filters={"band": "2"})
    assert (total0, read0) == (4, 1)

    # plain append: 4 carried partitioned files + new unpartitioned ones
    M.commit(spark.range(100, 110).selectExpr("id", "id * 2 AS v").coalesce(1), t, "append")
    _, total1, read1 = M.read_partitioned(spark, t, filters={"band": "2"})
    assert total1 == 5 and read1 == 2  # 3 partitioned files pruned

    # COW merge touching ONE partitioned file: untouched files keep tuples
    src = spark.createDataFrame([(2, 999)], "id long, v long")  # band=2 file
    M.merge(spark, t, src, ["id"])
    _, total2, read2 = M.read_partitioned(spark, t, filters={"band": "1"})
    assert read2 < total2, "carried files lost their partition tuples"
    pruned, _, _ = M.read_partitioned(spark, t, filters={"band": "1"})
    assert sorted(r["id"] for r in pruned.collect() if r["id"] % 4 == 1 and r["id"] < 100) == [
        i for i in range(100) if i % 4 == 1
    ]

    # WAP: stage an append, publish, tuples still prune
    M.stage(spark.range(110, 112).selectExpr("id", "id * 2 AS v").coalesce(1), t, "audit")
    M.publish_branch(t, "audit")
    _, total3, read3 = M.read_partitioned(spark, t, filters={"band": "1"})
    assert read3 < total3, "publish_branch dropped the partitions map"

    # COW delete on an unrelated predicate keeps pruning too
    M.delete_where(spark, t, "id = 101")
    _, total4, read4 = M.read_partitioned(spark, t, filters={"band": "1"})
    assert read4 < total4, "delete_where dropped the partitions map"


def test_clone_carries_mor_deletes_and_mapping(spark, tmp_path):
    """A shallow clone of a table with live MOR deletes and a column
    mapping must see the SOURCE SNAPSHOT's logical table — not
    resurrect deleted rows or expose physical names."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.commit(spark.range(10).selectExpr("id", "id * 2 AS v"), src, "overwrite")
    M.delete_where_mor(spark, src, "id >= 8", ["id"])
    M.rename_column(src, "v", "val")
    M.clone_shallow(src, dst)
    got = M.read(spark, dst)
    assert sorted(got.columns) == ["id", "val"]
    assert sorted(r["id"] for r in got.collect()) == list(range(8))
    # clone evolves independently: append lands in dst's own data dir
    M.commit(spark.createDataFrame([(100, 1)], "id long, val long"), dst, "append")
    assert M.read(spark, dst).count() == 9
    assert M.read(spark, src).count() == 8


def test_merge_key_on_swap_renamed_column(spark, tmp_path):
    """merge() keyed on a SWAP-renamed column (old logical name reused
    for a different physical column) must key on the column the CURRENT
    logical name points at — every caller-facing merge surface speaks
    logical names uniformly (ADVICE r8, medium)."""
    t = str(tmp_path / "tbl")
    M.commit(
        spark.range(3).selectExpr("id", "id AS a", "id * 2 AS b"), t, "overwrite"
    )
    M.rename_column(t, "a", "c")
    M.rename_column(t, "b", "a")  # logical a now points at physical b
    # key on logical 'a' (= physical b = id*2): a=4 matches the id=2 row
    src = spark.createDataFrame([(4, 77, 99), (100, 1, 50)], "a long, c long, id long")
    M.merge(spark, t, src, ["a"])
    got = {r["a"]: (r["c"], r["id"]) for r in M.read(spark, t).collect()}
    assert got[4] == (77, 99), "matched row must update via the swapped key"
    assert got[100] == (1, 50), "unmatched row must insert"
    assert len(got) == 4  # ids 0,1 kept; id=2 replaced; one insert


def test_mor_delete_key_on_renamed_column(spark, tmp_path):
    """delete_where_mor() after a rename: condition and key_cols speak
    the logical name; the delete file must still anti-join the physical
    scan (its recorded key_cols are translated at write time)."""
    t = str(tmp_path / "tbl")
    M.commit(spark.range(5).selectExpr("id", "id * 2 AS v"), t, "overwrite")
    M.rename_column(t, "v", "val")
    M.delete_where_mor(spark, t, "val = 4", ["val"])
    got = {r["id"]: r["val"] for r in M.read(spark, t).collect()}
    assert got == {0: 0, 1: 2, 3: 6, 4: 8}
    # rows appended later under a deleted key are unaffected (scoping)
    M.commit(spark.createDataFrame([(9, 4)], "id long, val long"), t, "append")
    got2 = {r["id"]: r["val"] for r in M.read(spark, t).collect()}
    assert got2[9] == 4 and 2 not in got2
