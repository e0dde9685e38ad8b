#!/usr/bin/env python
"""Capture plans/r16 evidence files: for each named query, run it at
sf0.01 and write <out_dir>/<query>_<tag>.txt holding (a) the committed
micro-batch count from the run checkpoint for streaming arms, (b) the
executed micro-batch plan (harness LAST_PLAN) for streaming arms or
explain("formatted") for batch queries.

Usage: python tools/capture_plans_r16.py <tag> <out_dir> q1,q2,...
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query name -> harness run name (None: generator arm, LAST_PLAN keyed
# by query name, checkpoint outside _stream_dirs)
RUN_NAMES = {
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
    "stream_upsert_gold": "upsert_gold_sf0.01",
    "stream_scd2_dim": "scd2_dim_sf0.01",
    "stream_generator_ingest": None,
}


def main() -> None:
    tag, out_dir, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)

    from ecommerce_dataengineering_project_spark import get_spark
    from ecommerce_dataengineering_project_spark.queries import registry
    from ecommerce_dataengineering_project_spark.streaming import harness

    spark = get_spark(app_name=f"r16-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    for q in names:
        df = queries[q](spark, sf_dir)
        lines = [f"== {q} ({tag}) @ {sf_dir} =="]
        if q in RUN_NAMES:
            run = RUN_NAMES[q]
            if run is not None:
                ckpt = harness._stream_dirs(run)[2]
                n = len(
                    [
                        f
                        for f in glob.glob(os.path.join(ckpt, "offsets", "*"))
                        if os.path.basename(f).isdigit()
                    ]
                )
                lines.append(f"committed micro-batches: {n}")
            plan = harness.LAST_PLAN.get(run or q) or harness.LAST_PLAN.get(q)
            lines.append("-- executed micro-batch plan (harness LAST_PLAN) --")
            lines.append(plan or "(not captured)")
        else:
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            lines.append(df._jdf.queryExecution().explainString(mode))
        with open(os.path.join(out_dir, f"{q}_{tag}.txt"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
        print(q, "captured", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
