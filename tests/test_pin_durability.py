"""Pin-durability switch (VERDICT r12 task 6 / SCALE.md
§pin-durability): SPARK_GRAFT_PIN_MODE swaps the pin MECHANISM —
executor-local checkpoint (fast, dies with the executor), reliable
checkpoint (durable store, survives preemption), or no pin at all
(recompute-tolerant) — without changing any query's values."""

from __future__ import annotations

import os

import pytest

from supabase_etl_spark.pinning import install_pin_policy, pin_mode

QUERY = "text_winnowing_fingerprint"  # cheap, pinned (llm_text.py)
SF = "/root/testdata/sf0.001"


def _run(spark, name):
    from supabase_etl_spark.queries import load_all

    df = load_all()[name].fn(spark, SF)
    return [tuple(r) for r in df.collect()]


def test_default_mode_is_stock_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    assert pin_mode() == "local"
    install_pin_policy()
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    pinned = df.localCheckpoint(eager=True)
    assert pinned is not df
    # lineage truncated to an RDD scan = the stock localCheckpoint path
    assert "ExistingRDD" in pinned._jdf.queryExecution().executedPlan().toString()
    assert pinned.count() == 100


def test_none_mode_returns_frame_unpinned(spark, monkeypatch):
    install_pin_policy()
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "none")
    df = spark.range(10)
    assert df.localCheckpoint(eager=False) is df  # identity: lineage kept


def test_reliable_mode_writes_durable_checkpoint(spark, monkeypatch, tmp_path):
    install_pin_policy()
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "reliable")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    df = spark.range(1000).selectExpr("id", "id % 7 AS v")
    pinned = df.localCheckpoint(eager=True)
    assert pinned.count() == 1000
    # blocks landed in the DURABLE dir, not executor-local storage
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(ckdir)
        for f in fs
        if not f.startswith(".")
    ]
    assert found, f"no reliable-checkpoint files under {ckdir}"


def test_invalid_mode_rejected(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        pin_mode()


@pytest.mark.parametrize("mode", ["reliable", "none"])
def test_pinned_query_values_identical_across_modes(
    spark, monkeypatch, tmp_path, mode
):
    """The switch swaps durability, never semantics: a pinned registry
    query returns byte-identical rows under every mode."""
    install_pin_policy()
    monkeypatch.delenv("SPARK_GRAFT_PIN_MODE", raising=False)
    baseline = _run(spark, QUERY)
    monkeypatch.setenv("SPARK_GRAFT_PIN_MODE", mode)
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ck"))
    assert _run(spark, QUERY) == baseline
