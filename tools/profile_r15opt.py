#!/usr/bin/env python
"""r15 optimization-round profiler: time individual registered queries
under the bench's exact conditions (same session confs, same noop-sink
methodology, same warmup) and capture their formatted plans.

Usage:
    python tools/profile_r15opt.py q1,q2,... [--repeats N] [--plans DIR]

Prints one JSON line per query: {"name", "runs": [...], "best",
"median", "n_jobs", "exchanges", "python_evals"} — the plan counters
come from the FORMATTED explain of the returned frame (batch queries;
streaming queries execute during construction, so their plan counters
are taken from the harness's LAST_PLAN capture when present).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n] if len(sys.argv) > 1 else []
    repeats = 3
    plans_dir = None
    argv = sys.argv[2:]
    while argv:
        a = argv.pop(0)
        if a == "--repeats":
            repeats = int(argv.pop(0))
        elif a == "--plans":
            plans_dir = argv.pop(0)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ecommerce_dataengineering_project_spark import get_spark
    from ecommerce_dataengineering_project_spark.queries import registry

    spark = get_spark(app_name="r15opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    if not names:
        names = sorted(queries)

    # bench.py's warmup, verbatim: JVM/scan path + Python worker pool.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def _warm(batches):
        yield from batches

    spark.range(0, 10_000, 1, 32).mapInPandas(_warm, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    from ecommerce_dataengineering_project_spark.streaming.harness import LAST_PLAN

    sc = spark.sparkContext

    for name in names:
        fn = queries[name]
        runs = []
        plan_txt = ""
        for i in range(repeats):
            sc.setJobDescription(f"r15opt:{name}:{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            if i == 0:
                try:
                    plan_txt = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:
                    plan_txt = ""
        sc.setJobDescription(None)
        stream_plans = {
            k: v for k, v in LAST_PLAN.items() if k in name or name.endswith(k)
        }
        counters_src = plan_txt or "\n".join(stream_plans.values())
        out = {
            "name": name,
            "runs": runs,
            "best": min(runs),
            "median": round(statistics.median(runs), 3),
            "exchanges": len(re.findall(r"\bExchange\b", counters_src)),
            "python_evals": len(
                re.findall(
                    r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas",
                    counters_src,
                )
            ),
        }
        print(json.dumps(out), flush=True)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan_txt or counters_src)
    spark.stop()


if __name__ == "__main__":
    main()
