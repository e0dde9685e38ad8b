"""Crash/replay contracts for the multi-table streaming fan-out
(stream_fanout_two_tables): per-table exactly-once via SetTransaction,
cross-table healing on retry after a crash between the two commits.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.sources.txlog import recreate
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT


def _batch(spark, ids):
    return spark.createDataFrame([(i, i % 3) for i in ids], "event_id BIGINT, k INT")


def test_crash_between_commits_heals_on_retry(spark):
    root = os.path.join(TMP_ROOT, "fanout_tests", "heal")
    raw = recreate(os.path.join(root, "raw"))
    agg = recreate(os.path.join(root, "agg"))

    def commit(df, batch_id, crash_after_first=False):
        partials = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        raw.append_txn(df, "raw_app", batch_id)
        if crash_after_first:
            raise RuntimeError("crash between the two table commits")
        agg.append_txn(partials, "agg_app", batch_id)

    commit(_batch(spark, range(0, 5)), 0)
    # batch 1 crashes after committing raw but before agg
    try:
        commit(_batch(spark, range(5, 9)), 1, crash_after_first=True)
    except RuntimeError:
        pass
    assert raw.read(spark).count() == 9  # raw already has batch 1
    assert agg.read(spark).agg(F.sum("n")).collect()[0][0] == 5  # agg does not
    # the streaming engine replays batch 1 (at-least-once): raw must
    # SKIP (no double rows), agg must land
    commit(_batch(spark, range(5, 9)), 1)
    assert raw.read(spark).count() == 9
    assert agg.read(spark).agg(F.sum("n")).collect()[0][0] == 9
    # a full second replay of both batches is a no-op everywhere
    commit(_batch(spark, range(0, 5)), 0)
    commit(_batch(spark, range(5, 9)), 1)
    assert raw.read(spark).count() == 9
    assert agg.read(spark).agg(F.sum("n")).collect()[0][0] == 9
    # no duplicate event ids survived any of the replays
    assert raw.read(spark).select("event_id").distinct().count() == 9
