#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print one
JSON line with per-query and total wall-clock seconds.

Materialization is a `noop` datasource write — full execution of the
plan (scan -> shuffle -> agg) with no driver-side collect, which is the
honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ecommerce_dataengineering_project_spark import get_spark
    from ecommerce_dataengineering_project_spark.queries import registry

    spark = get_spark(app_name="ecommerce-dataengineering-project-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    # Warm the JVM/scan path and the Python-worker/Arrow path once so
    # the alphabetically-first queries don't absorb session startup or
    # worker-pool spawn in their timings.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    import pandas as pd  # noqa: F401

    def _warm(batches):
        for b in batches:
            yield b

    spark.range(0, 10_000, 1, 32).mapInPandas(_warm, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Pre-stage the shared streaming sources (the harness's stand-in
    # for "the Kafka topic already exists"). Staging is test-harness
    # setup, not query work — in production the sources are brokers.
    from ecommerce_dataengineering_project_spark.queries import streaming_queries as _sq

    _sq._events_source(spark, sf_dir, n_flush=2)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(queries):
        # Time construction + materialization: streaming queries execute
        # their bounded run during construction, batch queries are lazy
        # until the noop write either way.
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # one bad query must not kill the run
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
