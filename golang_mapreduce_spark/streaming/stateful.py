"""Custom stateful streaming operator: arbitrary-state sessionization via
``applyInPandasWithState``.

``session_window`` (operators/windows.py) covers gap-based sessions
declaratively; this operator is the escape hatch the reference's UDF
paradigm would need for *custom* per-key state machines (counters,
budgets, fraud rules) — per-key state that survives across micro-batches,
with event-time timeouts closing idle sessions.

State design for scale: state lives in the executor state store, keyed by
the groupBy key (user_id) — size is O(open sessions), bounded by the
event-time timeout; nothing accumulates on the driver.  Each invocation
sees one key's new rows as Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# open-session state: [start_ms, last_ms, n_events, sum_value]
STATE_SCHEMA = "start_ms bigint, last_ms bigint, n_events bigint, sum_value double"


def _emit(user_id: int, start_ms: int, last_ms: int, n: int, total: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(last_ms, unit="ms")],
            "n_events": [n],
            "sum_value": [total],
        }
    )


def _sessionize_fn(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_ms, last_ms, n, total = state.get
        state.remove()
        yield _emit(user_id, start_ms, last_ms, n, total)
        return

    rows = pd.concat(list(pdf_iter))
    rows = rows.sort_values("ts")
    ts_ms = (rows["ts"].astype("int64") // 1_000_000).tolist()
    values = rows["value"].tolist()

    if state.exists:
        start_ms, last_ms, n, total = state.get
    else:
        start_ms, last_ms, n, total = 0, 0, 0, 0.0

    out: list[pd.DataFrame] = []
    for t, v in zip(ts_ms, values):
        if n == 0:
            start_ms, last_ms, n, total = t, t, 1, float(v)
        elif t - last_ms > SESSION_GAP_MS:
            out.append(_emit(user_id, start_ms, last_ms, n, total))
            start_ms, last_ms, n, total = t, t, 1, float(v)
        else:
            last_ms, n, total = max(last_ms, t), n + 1, total + float(v)

    state.update((start_ms, last_ms, n, total))
    # close the open session once event time passes last_ms + gap
    state.setTimeoutTimestamp(last_ms + SESSION_GAP_MS)
    yield from out


def sessionize_with_state(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Gap-based sessionization as a custom state machine.  Emits a row
    per *closed* session (closed by a later event, or by the event-time
    timeout once the watermark passes session_end + gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
