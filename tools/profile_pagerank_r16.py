#!/usr/bin/env python
"""r16 VERDICT item 3: quiet-window alternating A/B of the pagerank
construction checkpoints — lazy (r15 form, the touched+regressed cell)
vs eager `und` with lazy deg/adj (the proposed pin). Three trials each,
alternating L/E/L/E/L/E in ONE session after the bench's warmup, with
the bench's calibration kernel quoted before and after so the window's
noise floor is on the record.

Usage: python tools/profile_pagerank_r16.py [--repeats 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from ecommerce_dataengineering_project_spark import get_spark
    from ecommerce_dataengineering_project_spark.operators.graph import (
        BASE,
        DAMP_NUM,
        SCALE,
        copurchase_edges,
    )
    from ecommerce_dataengineering_project_spark.queries.ext_graph import (
        ITERATIONS,
        MIN_SUPPORT,
    )
    from ecommerce_dataengineering_project_spark.sources.readers import load_table

    spark = get_spark(app_name="r16-pagerank-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def pagerank_variant(edges, iterations, und_eager):
        und = (
            edges.select("a", "b")
            .unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .localCheckpoint(eager=und_eager)
        )
        deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
            eager=False
        )
        adj = und.join(deg, "a").localCheckpoint(eager=False)
        ranks = deg.select(
            F.col("a").alias("node"), F.lit(SCALE).cast("bigint").alias("rank")
        )
        for _ in range(iterations):
            incoming = (
                adj.join(ranks, adj["a"] == ranks["node"])
                .select(F.col("b"), F.expr("rank div deg").alias("c"))
                .groupBy("b")
                .agg(F.sum("c").alias("inc"))
            )
            ranks = deg.join(incoming, deg["a"] == incoming["b"], "left").select(
                F.col("a").alias("node"),
                (
                    F.lit(BASE) + F.expr(f"({DAMP_NUM} * coalesce(inc, 0L)) div 100")
                ).cast("bigint").alias("rank"),
            )
        return ranks.join(deg, ranks["node"] == deg["a"]).select(
            "node", "rank", F.col("deg").alias("degree")
        )

    def calib() -> float:
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) as s", "count(*) as n"
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run(und_eager: bool) -> float:
        # bench methodology: construction + materialization inside the
        # timed region (an eager checkpoint launches its job at
        # construction, so timing only the write would hide it)
        t0 = time.perf_counter()
        li = load_table(spark, sf_dir, "lineitem")
        df = pagerank_variant(
            copurchase_edges(li, min_support=MIN_SUPPORT), ITERATIONS, und_eager
        )
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run(False)  # warm the exact query path once, untimed
    out = {"calib_before": [calib() for _ in range(3)], "lazy": [], "eager": []}
    for _ in range(repeats):
        out["lazy"].append(run(False))
        out["eager"].append(run(True))
    out["calib_after"] = [calib() for _ in range(3)]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
