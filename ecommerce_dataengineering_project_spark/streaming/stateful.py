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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
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


def _restock_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (level,) = state.get if state.exists else (INITIAL_LEVEL,)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = {"event_id": [], "qty": [], "level_after": [], "restocked": []}
        for eid, qty in zip(pdf["event_id"], pdf["qty"]):
            level -= int(qty)
            restocked = level <= MIN_LEVEL
            if restocked:
                level += RESTOCK_AMOUNT
            out["event_id"].append(eid)
            out["qty"].append(int(qty))
            out["level_after"].append(level)
            out["restocked"].append(restocked)
        out["user_id"] = [key[0]] * len(out["event_id"])
        yield pd.DataFrame(out, columns=list(RESTOCK_OUTPUT.fieldNames()))
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
                pdf = pdf.sort_values(["ts", "event_id"])
                out = {"event_id": [], "qty": [], "level_after": [], "restocked": []}
                for eid, qty in zip(pdf["event_id"], pdf["qty"]):
                    level -= int(qty)
                    restocked = level <= MIN_LEVEL
                    if restocked:
                        level += RESTOCK_AMOUNT
                    out["event_id"].append(eid)
                    out["qty"].append(int(qty))
                    out["level_after"].append(level)
                    out["restocked"].append(restocked)
                out["user_id"] = [key[0]] * len(out["event_id"])
                yield pd.DataFrame(out, columns=list(RESTOCK_OUTPUT.fieldNames()))
            self._level.update((level,))

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RestockProcessor(),
        outputStructType=RESTOCK_OUTPUT,
        outputMode="append",
        timeMode="None",
    )
