"""Timer/TTL contract for the event-time sessionizer
(streaming/stateful.timer_sessions_stream — SURVEY §2i T7 timers):
a key with NO further rows can only emit its open session through the
EventTimeTimeout timer, so these tests prove timers fire, fire once,
and cooperate with the inline gap-split on one state shape.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ecommerce_dataengineering_project_spark.streaming.harness import run_bounded_stream
from ecommerce_dataengineering_project_spark.streaming.stateful import (
    timer_sessions_stream,
)

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
_FLUSH = dt.datetime(2024, 3, 1)


def _rows(spark, rows):
    return spark.createDataFrame(
        [(eid, ts, uid, "e", val, None) for eid, ts, uid, val in rows], _SCHEMA
    )


@pytest.fixture(scope="module")
def sessions(spark):
    batches = [
        # user 1: two events 1 h apart (one session, NOTHING ever
        # again — only a fired timer can emit it); user 2: one event
        _rows(
            spark,
            [
                (1, _T0, 1, 1.004),
                (2, _T0 + dt.timedelta(hours=1), 1, 2.0),
                (3, _T0 + dt.timedelta(hours=2), 2, 10.0),
            ],
        ),
        # user 2 returns after a 10 h gap: the first session must
        # close INLINE (gap-split), the second stays open for the timer
        _rows(spark, [(4, _T0 + dt.timedelta(hours=12), 2, 5.0)]),
        # two far-future flush batches advance the watermark past
        # last+gap for every real key -> timers fire
        _rows(spark, [(-1, _FLUSH, -1, 0.0)]),
        _rows(spark, [(-2, _FLUSH + dt.timedelta(days=1), -1, 0.0)]),
    ]
    out = run_bounded_stream(
        spark,
        "timer_sessions_unit",
        batches,
        lambda s: timer_sessions_stream(s, gap="6 hours", watermark="1 hour"),
    )
    return sorted(map(tuple, out.collect()))


def test_timer_emits_final_sessions_exactly_once(sessions):
    real = [r for r in sessions if r[0] >= 0]
    assert real == [
        # user 1: emitted by the TIMER (no row after batch 0 could)
        (1, _T0, _T0 + dt.timedelta(hours=1), 2, 300),  # 100+200 cents
        # user 2, session 1: emitted INLINE by the batch-1 gap-split
        (2, _T0 + dt.timedelta(hours=2), _T0 + dt.timedelta(hours=2), 1, 1000),
        # user 2, session 2: emitted by the timer
        (2, _T0 + dt.timedelta(hours=12), _T0 + dt.timedelta(hours=12), 1, 500),
    ]


def test_flush_key_never_times_out(sessions):
    """The flush key's open session has no watermark behind it — only
    its gap-split FIRST session appears; the final one stays in state
    (and is why queries filter user_id >= 0 downstream)."""
    flush = [r for r in sessions if r[0] < 0]
    assert flush == [(-1, _FLUSH, _FLUSH, 1, 0)]


def test_cents_rounding_matches_oracle_form(sessions):
    """floor(v*100+0.5): 1.004 -> 100 cents, matching the SQL twin's
    CAST(FLOOR(value*100+0.5) AS BIGINT) bit-for-bit."""
    u1 = [r for r in sessions if r[0] == 1]
    assert u1[0][4] == 300
