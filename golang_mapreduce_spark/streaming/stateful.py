"""Custom stateful streaming operator: arbitrary-state sessionization via
``applyInPandasWithState``.

``session_window`` (operators/windows.py) covers gap-based sessions
declaratively; this operator is the escape hatch the reference's UDF
paradigm would need for *custom* per-key state machines (counters,
budgets, fraud rules) — per-key state that survives across micro-batches,
with event-time timeouts closing idle sessions.

Gap semantics match ``session_window`` exactly: adjacent sessions merge
INCLUSIVELY, so an event arriving exactly ``gap`` after its predecessor
extends the session (strict ``>`` opens a new one — verified empirically
against session_window in tests/test_session_boundary.py).

Determinism: timestamps are kept as exact epoch **micros** (the events
fixture is nanos truncated to micros) and per-session value sums are
accumulated as half-up-rounded DECIMAL(18,6) integers — bit-identical to
``CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)`` in the batch
oracle, independent of addition order.

State design for scale: state lives in the executor state store, keyed by
the groupBy key (user_id) — size is O(open sessions), bounded by the
event-time timeout; nothing accumulates on the driver.  Each invocation
sees one key's new rows as Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000
DEC_SCALE = 6  # DECIMAL(18,6), same quantum as operators/relational._dec

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
# open-session state: [start_us, last_us, n_events, sum_micro]
STATE_SCHEMA = "start_us bigint, last_us bigint, n_events bigint, sum_micro bigint"


def _dec_micro(v: float) -> int:
    """Half-up round a double to DECIMAL(18,6) integer micro-units, the
    exact arithmetic Spark/DuckDB use for CAST(double AS DECIMAL(18,6))."""
    return int(
        Decimal(v).scaleb(DEC_SCALE).to_integral_value(rounding=ROUND_HALF_UP)
    )


def _emit_many(
    user_id: int,
    starts: list[int],
    lasts: list[int],
    ns: list[int],
    sums: list[int],
) -> pd.DataFrame:
    """One DataFrame for ALL of an invocation's closed sessions (r17,
    guide §4.2): the old per-session 1-row frame made a user with k
    closed sessions pay k pandas constructions + k serializer appends.
    ``m / 10**DEC_SCALE`` stays a per-element Python int division —
    bit-identical to the old scalar path."""
    return pd.DataFrame(
        {
            "user_id": pd.array([user_id] * len(starts), dtype="int64"),
            "session_start": pd.to_datetime(starts, unit="us"),
            "session_end": pd.to_datetime(lasts, unit="us"),
            "n_events": pd.array(ns, dtype="int64"),
            "sum_value": pd.array(
                [m / 10**DEC_SCALE for m in sums], dtype="float64"
            ),
        }
    )


def _emit(user_id: int, start_us: int, last_us: int, n: int, sum_micro: int) -> pd.DataFrame:
    return _emit_many(user_id, [start_us], [last_us], [n], [sum_micro])


def _sessionize_fn(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start_us, last_us, n, sum_micro = state.get
        state.remove()
        yield _emit(user_id, start_us, last_us, n, sum_micro)
        return

    chunks = list(pdf_iter)
    rows = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    rows = rows.sort_values("ts", kind="stable")
    ts_us = (rows["ts"].astype("int64") // 1_000).tolist()
    values = rows["value"].tolist()

    if state.exists:
        start_us, last_us, n, sum_micro = state.get
    else:
        start_us, last_us, n, sum_micro = 0, 0, 0, 0

    starts: list[int] = []
    lasts: list[int] = []
    ns: list[int] = []
    sums: list[int] = []
    for t, v in zip(ts_us, values):
        if n == 0:
            start_us, last_us, n, sum_micro = t, t, 1, _dec_micro(v)
        elif t - last_us > SESSION_GAP_US:
            starts.append(start_us)
            lasts.append(last_us)
            ns.append(n)
            sums.append(sum_micro)
            start_us, last_us, n, sum_micro = t, t, 1, _dec_micro(v)
        else:
            last_us, n, sum_micro = max(last_us, t), n + 1, sum_micro + _dec_micro(v)

    state.update((start_us, last_us, n, sum_micro))
    # close the open session once event time passes last + gap
    # (timeout API is millis; floor is safe — fires at the same or an
    # earlier watermark than the exact micro boundary)
    state.setTimeoutTimestamp(last_us // 1_000 + SESSION_GAP_US // 1_000)
    if starts:
        yield _emit_many(user_id, starts, lasts, ns, sums)


PACK_OUT_SCHEMA = "doc_id bigint, lang string, n_toks bigint, bin_id bigint"
# carried packing state: current bin id + tokens accumulated in it
PACK_STATE_SCHEMA = "cur_bin bigint, acc bigint"


def _pack_fn(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Greedy sequence packing as a per-language state machine: the
    (cur_bin, acc) pair carries the open bin across micro-batches, so the
    drained stream reproduces corpus.greedy_pack's recurrence exactly —
    provided batches deliver each language's docs in doc_id order (the
    source files are doc_id-range splits consumed in order)."""
    from golang_mapreduce_spark.operators.corpus import PACK_BUDGET

    (lang,) = key
    rows = pd.concat(list(pdf_iter)).sort_values("doc_id")
    cur, acc = state.get if state.exists else (0, 0)
    bins: list[int] = []
    for n in rows["n_toks"]:
        n = int(n)
        if acc and acc + n > PACK_BUDGET:
            cur += 1
            acc = 0
        acc += n
        bins.append(cur)
    state.update((cur, acc))
    yield pd.DataFrame(
        {
            "doc_id": rows["doc_id"].to_numpy(),
            "lang": lang,
            "n_toks": rows["n_toks"].to_numpy(),
            "bin_id": bins,
        }
    )


def pack_with_state(doc_sizes: DataFrame) -> DataFrame:
    """Streaming greedy sequence packing over a (doc_id, lang, n_toks)
    stream — the incremental form of corpus.packed_sequences: a training
    pipeline that receives documents continuously packs them into
    fixed-budget sequences as they arrive instead of re-running a batch
    pack.  State per language is two integers (open bin id + fill), so
    the state store is O(languages) regardless of throughput; no
    watermark/timeout — a bin stays open until its language's next doc
    closes it."""
    return doc_sizes.groupBy("lang").applyInPandasWithState(
        _pack_fn,
        outputStructType=PACK_OUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
