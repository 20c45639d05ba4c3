"""Pin the exact-gap session semantics: Spark's session_window MERGES an
event arriving exactly 30 minutes after its predecessor (adjacent
sessions are inclusive-merged — verified empirically; a new session
requires a strictly greater gap).  The gaps-and-islands oracles and the
custom state machine use the matching strict-> rule, which the original
fixtures never exercised (no exact-gap pairs)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import functions as F

from golang_mapreduce_spark.streaming.stateful import (
    SESSION_GAP_US,
    _sessionize_fn,
)


class _FakeState:
    """Minimal GroupState stand-in for driving the pure state machine."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts


BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
GAP = dt.timedelta(microseconds=SESSION_GAP_US)


def _events_df(spark, offsets):
    rows = [(i, BASE + off, 7, "click", 1.0) for i, off in enumerate(offsets)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_session_window_exact_gap_merges(spark):
    # second event exactly GAP after the first -> sessions merge
    df = _events_df(spark, [dt.timedelta(0), GAP])
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(out) == 1 and out[0]["n"] == 2, f"exact-gap pair must merge: {out}"

    # one microsecond beyond the gap -> two sessions
    df2 = _events_df(spark, [dt.timedelta(0), GAP + dt.timedelta(microseconds=1)])
    out2 = (
        df2.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert len(out2) == 2, f"gap+1us pair must split: {out2}"


def test_state_machine_matches_session_window_boundary(spark):
    ts0 = pd.Timestamp(BASE)
    for delta_us, want_sessions in [
        (SESSION_GAP_US, 1),
        (SESSION_GAP_US + 1, 2),
    ]:
        pdf = pd.DataFrame(
            {
                "ts": [ts0, ts0 + pd.Timedelta(microseconds=delta_us)],
                "value": [1.0, 2.0],
            }
        )
        state = _FakeState()
        emitted = list(_sessionize_fn((7,), iter([pdf]), state))
        # emitted = closed sessions; one session always remains open in state
        assert len(emitted) == want_sessions - 1
        assert state.exists
