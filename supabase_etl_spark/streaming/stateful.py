"""Arbitrary stateful streaming: one operator, two engine APIs.

Spark 4 ships two custom-stateful surfaces: ``applyInPandasWithState``
(GroupState, the 3.x-era API) and ``transformWithStateInPandas``
(StatefulProcessor + RocksDB-backed typed state, the successor —
richer state types, timers, TTL). The newer API's state protocol needs
``google.protobuf`` at runtime, which not every Python environment
ships (this container does not, and installs are gated — a PERMANENT
gate for this runtime, recorded as such in SURVEY §2.2 the way the
Avro jar gate was recorded), so the engine exposes ONE operator that
dispatches: StatefulProcessor when protobuf is importable, GroupState
otherwise. Both paths hold the identical (count, modular checksum)
state and emit the identical rows — the oracle gate and
tests/test_streaming.py pin that equivalence, and the processors'
logic — including the TIMER lifecycle (registerTimer /
handleExpiredTimer, `make_session_timeout_processor`) and the state
TTL path (`make_counter_processor(ttl_ms=...)`) — is unit-tested with
a fake handle so every transformWithState surface is exercised even
where protobuf is absent.

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


def make_counter_processor(
    checksum_p: int, checksum_k: int, ttl_ms: int | None = None
):
    """StatefulProcessor holding a per-key running (count, checksum).

    The class body is plain Python over pandas batches — its logic runs
    identically under a fake handle (tests) and the real RocksDB-backed
    handle (a protobuf-enabled cluster).

    ``ttl_ms`` forwards to the handle's state-TTL surface
    (``getValueState(name, schema, ttlDurationMs)``): on a real
    RocksDB backend the store expires idle keys server-side; the fake
    handle in tests models the same expiry so the TTL path of the
    processor (state vanished between batches → restart from zero) is
    exercised here too.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningCounter(StatefulProcessor):
        def init(self, handle):
            if ttl_ms is None:
                self._state = handle.getValueState("acc", STATE_SCHEMA)
            else:
                self._state = handle.getValueState("acc", STATE_SCHEMA, ttl_ms)

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


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, n_events bigint"
)
SESSION_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def make_session_timeout_processor(gap_ms: int):
    """StatefulProcessor closing gap sessions on EVENT-TIME TIMERS —
    the timer surface of transformWithStateInPandas (registerTimer /
    handleExpiredTimer), written so the whole lifecycle runs under the
    fake handle in tests:

      * handleInputRows folds the batch into the open session
        (start, last, n) and (re-)arms one timer at last + gap;
        nothing is emitted while the session is open.
      * handleExpiredTimer emits the closed session row and clears
        state — the only emission path, exactly the semantics of
        applyInPandasWithState's ``hasTimedOut`` branch in
        queries/streaming.stream_stateful_sessions.

    Timer discipline: the previous timer is deleted before arming the
    new one (listTimers/deleteTimer), so a key holds at most one
    pending timer regardless of batch count.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class GapSessionizer(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._sess = handle.getValueState("sess", SESSION_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            start, last, n = (
                self._sess.get() if self._sess.exists() else (None, None, 0)
            )
            for pdf in rows:
                ts = pdf["ts_ms"]
                if len(ts) == 0:
                    continue
                lo, hi = int(ts.min()), int(ts.max())
                start = lo if start is None else min(start, lo)
                last = hi if last is None else max(last, hi)
                n += len(ts)
            if last is not None:
                for t in list(self._handle.listTimers()):
                    self._handle.deleteTimer(t)
                self._sess.update((start, last, n))
                self._handle.registerTimer(last + gap_ms)
            return iter(())  # open sessions emit nothing

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._sess.exists():
                return iter(())
            start, last, n = self._sess.get()
            self._sess.clear()
            return iter(
                [
                    pd.DataFrame(
                        {
                            "user_id": [key[0]],
                            "session_start": [start],
                            "session_end": [last],
                            "n_events": [n],
                        }
                    )
                ]
            )

        def close(self):
            pass

    return GapSessionizer()


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
