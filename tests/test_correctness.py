"""Oracle correctness: every registered query vs DuckDB at sf0.001.

Mirrors the driver's t2 gate (row-count + schema + order-insensitive
values). Runs at the smoke scale factor to keep the suite fast;
scripts/check_correctness.py runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from conftest import registry_sweep_params

from scripts.check_correctness import canon_rows, run_duckdb
from supabase_etl_spark.queries import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", registry_sweep_params(ORACLE_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_duckdb(spec.oracle, sf_dir)
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    assert sc == dc, f"schema mismatch: spark={sc} duckdb={dc}"
    assert len(sr) == len(dr), f"row count: spark={len(sr)} duckdb={len(dr)}"
    diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not diffs, f"{len(diffs)}/{len(sr)} rows differ; first: {diffs[0]}"


@pytest.mark.parametrize("name", registry_sweep_params(NO_ORACLE_QUERIES))
def test_query_runs(spark, sf_dir, name):
    """Rows-only check for non-SQL-expressible ops."""
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    assert sdf.count() >= 0


def test_driver_priority_slots_are_value_hashable():
    """The driver's independent oracle samples the first 50 registry
    entries; DRIVER_PRIORITY spends those slots on the LLM/streaming/
    lake flagships. Every slot must carry a DuckDB oracle (value-hash),
    and the registry must actually serve them first — a rows-only or
    misplaced entry silently wastes independent verification."""
    from supabase_etl_spark.queries import DRIVER_PRIORITY, load_all

    reg = load_all()
    first50 = list(reg)[:50]
    assert first50 == list(DRIVER_PRIORITY)
    assert len(DRIVER_PRIORITY) == 50
    missing = [n for n in DRIVER_PRIORITY if reg[n].oracle is None]
    assert not missing, f"rows-only queries in the driver window: {missing}"


def test_driver_window_rotates_to_unverified_names():
    """The window must contain NO name already green in a committed
    driver artifact while unverified oracle-bearing names remain —
    otherwise the rotation silently re-verifies the same 50 (VERDICT r6
    tasks 1 + 9). The _REPIN names are the sanctioned exception: a
    query whose code was repaired/rewritten AFTER its last driver run
    deliberately re-enters the window for post-rewrite driver-contract
    proof (VERDICT r11 task 6) — but only while ACTIVE: once a driver
    artifact NEWER than the repair verifies the name, the re-pin
    expires and may no longer occupy a slot (ADVICE r12)."""
    from supabase_etl_spark.queries import (
        DRIVER_PRIORITY,
        active_repin_names,
        compute_driver_priority,
        driver_verified_names,
        load_all,
    )

    reg = load_all()
    seen = driver_verified_names()
    if not seen:
        pytest.skip("no committed driver artifacts (fresh clone)")
    active = active_repin_names()
    unverified = [n for n, s in reg.items() if s.oracle is not None and n not in seen]
    stale = [n for n in DRIVER_PRIORITY if n in seen and n not in active]
    if len(unverified) >= 50:
        assert not stale, f"already-verified names occupy rotation slots: {stale}"
    # deterministic: recomputing from the same artifacts yields the same window
    assert compute_driver_priority(reg, seen) == tuple(DRIVER_PRIORITY)


def test_repins_expire_once_reverified():
    """_REPIN auto-expiry (ADVICE r12): an entry is active only while NO
    driver artifact newer than its repair round has verified the name —
    a repin must not lead the window forever once its post-repair code
    has independent proof."""
    from supabase_etl_spark.queries import _REPIN, active_repin_names

    # synthetic verified-rounds map exercises both sides of the boundary
    name = _REPIN[0][0]
    stale_round = _REPIN[0][1]
    assert name in active_repin_names({name: stale_round})  # same-round artifact: still stale
    assert name in active_repin_names({})  # never verified: active
    assert name not in active_repin_names({name: stale_round + 1})  # newer artifact: expired
    # and the real committed artifacts: the r11 repins were re-verified
    # by the r12 driver artifact, so they must be expired by now
    real_active = active_repin_names()
    for n, stale in _REPIN:
        if n in ("dedup_cdc_chunks", "sample_length_histogram_match"):
            assert n not in real_active, f"{n} re-verified in r12 but still active"


def test_json_snapshot_refuses_partial_registry(tmp_path):
    """The committed CORRECTNESS_local artifact must be registry-complete
    by construction (VERDICT r7 task 4): a name-restricted gate run may
    not write the snapshot. The guard fires before any Spark session."""
    import subprocess
    import sys

    out = tmp_path / "snap.json"
    proc = subprocess.run(
        [
            sys.executable,
            "scripts/check_correctness.py",
            "--json",
            str(out),
            "tpch_q6",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "full registry" in proc.stdout
    assert not out.exists()
