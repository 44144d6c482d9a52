"""Arbitrary stateful streaming: one operator, two engine APIs.

Spark 4 ships two custom-stateful surfaces: ``applyInPandasWithState``
(GroupState, the 3.x-era API) and ``transformWithStateInPandas``
(StatefulProcessor + RocksDB-backed typed state, the successor —
richer state types, timers, TTL). The newer API's state protocol needs
``google.protobuf`` at runtime, which not every Python environment
ships (this container does not, and installs are gated), so the engine
exposes ONE operator that dispatches: StatefulProcessor when protobuf
is importable, GroupState otherwise. Both paths hold the identical
(count, modular checksum) state and emit the identical rows — the
oracle gate and tests/test_streaming.py pin that equivalence, and the
processor's logic is unit-tested with a fake handle so the
transformWithState path is exercised even where protobuf is absent.

Reference parity note: the reference (etl_supabase.py) has no
streaming at all; this is declared-surface coverage (SURVEY §2.2
streaming, "arbitrary stateful").
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = "user_id bigint, n_events bigint, checksum bigint"
STATE_SCHEMA = "n bigint, ck bigint"


def transform_with_state_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    serialization; probe instead of failing mid-query."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def make_counter_processor(checksum_p: int, checksum_k: int):
    """StatefulProcessor holding a per-key running (count, checksum).

    The class body is plain Python over pandas batches — its logic runs
    identically under a fake handle (tests) and the real RocksDB-backed
    handle (a protobuf-enabled cluster).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningCounter(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("acc", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, ck = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                ck = int(
                    (ck + ((pdf["event_id"] % checksum_p) * checksum_k).sum())
                    % checksum_p
                )
            self._state.update((n, ck))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "checksum": [ck]}
            )

        def close(self):
            pass

    return RunningCounter()


def running_counter(
    stream_df: DataFrame, checksum_p: int, checksum_k: int
) -> DataFrame:
    """Per-user running (event count, modular checksum) across
    micro-batches — the custom-operator escape hatch for logic windowed
    aggregations can't express. Integer state only (order-independent
    within a key), so the final state equals the batch recompute.

    Dispatches to transformWithStateInPandas when the runtime can run
    it, else applyInPandasWithState — same rows either way.
    """
    g = stream_df.groupBy("user_id")
    if transform_with_state_available():
        return g.transformWithStateInPandas(
            statefulProcessor=make_counter_processor(checksum_p, checksum_k),
            outputStructType=OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdfs, state: GroupState):
        n, ck = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            ck = int(
                (ck + ((pdf["event_id"] % checksum_p) * checksum_k).sum())
                % checksum_p
            )
        state.update((n, ck))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "checksum": [ck]})

    return g.applyInPandasWithState(
        track,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
