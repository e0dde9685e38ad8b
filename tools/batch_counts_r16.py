#!/usr/bin/env python
"""r16 evidence: run the touched streaming arms and record, per arm,
the number of committed micro-batches (offset log entries in the run's
checkpoint) and the total run wall-clock. This is the
guide-§1 "fewer, larger micro-batches" evidence the plan files cannot
show (a streaming plan looks identical at any batch count).

Usage: python tools/batch_counts_r16.py [sf_dir] > out.json
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "stream_bronze_silver": "bronze_silver",
    "stream_tumbling_revenue": "tumbling_revenue",
    "stream_sliding_activity": "sliding_activity",
    "stream_session_windows": "session_windows",
    "stream_stream_join": "stream_stream_join",
    "stream_stream_left_join": "stream_stream_left_join",
    "stream_stream_full_outer": "stream_stream_full_outer",
    "stream_timer_sessions": "timer_sessions",
    "stream_idle_timer_flush": "idle_timer_flush",
    "stream_drift_monitor": "drift_monitor",
    "stream_static_enrich": "static_enrich",
    "stream_quarantine": "quarantine",
    "stream_inventory_restock": "inventory_restock",
    "stream_dedup": "stream_dedup",
    "stream_dedup_watermarked": "stream_dedup_watermarked",
    "stream_dedup_rocksdb": "stream_dedup_rocksdb",
    "statestore_inspect": "statestore_inspect",
    "stream_dedup_then_window": "stream_dedup_then_window",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from ecommerce_dataengineering_project_spark import get_spark
    from ecommerce_dataengineering_project_spark.queries import registry
    from ecommerce_dataengineering_project_spark.streaming.harness import (
        _stream_dirs,
    )

    spark = get_spark(app_name="r16-batch-counts")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    out = {}
    for qname, run_name in ARMS.items():
        t0 = time.perf_counter()
        queries[qname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = round(time.perf_counter() - t0, 3)
        ckpt = _stream_dirs(run_name)[2]
        n_batches = len(
            [f for f in glob.glob(os.path.join(ckpt, "offsets", "*")) if
             os.path.basename(f).isdigit()]
        )
        out[qname] = {"n_batches": n_batches, "run_s": dt}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
