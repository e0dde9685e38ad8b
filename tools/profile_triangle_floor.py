"""Reproduce the r10 triangle_count un-regression evidence.

Two arms, interleaved in ONE session so machine drift cancels:

- ``cur``  — the registered q_triangle_count (order_baskets with
  materialize=False via copurchase_edges, r10 shape)
- ``r8``   — a literal reconstruction of the r8 formulation (inline
  basket derivation, no materialization — commit 978ca2d~1's
  copurchase_edges), scored through the identical wedge/closing joins

Reading: if the two arms time within noise of each other, the r9
regression (0.944 -> 1.625 s raw best) is closed at the plan level
and any residual gap to the r8 ABSOLUTE number is the machine's scan
floor — cross-check with ``fct_purchases`` (pure scan+project,
untouched since r8): it moved 0.308 -> ~0.38 s over the same rounds.

Usage: python tools/profile_triangle_floor.py  [repeats=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ecommerce_dataengineering_project_spark import get_spark  # noqa: E402
from ecommerce_dataengineering_project_spark.queries import ext_graph  # noqa: E402
from ecommerce_dataengineering_project_spark.queries.core import q_fct_purchases  # noqa: E402
from ecommerce_dataengineering_project_spark.queries.ext_graph import q_triangle_count  # noqa: E402
from ecommerce_dataengineering_project_spark.sources.readers import load_table  # noqa: E402


def r8_variant(spark, sf):
    li = load_table(spark, sf, "lineitem")
    baskets = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.sort_array(F.collect_set(F.col("l_partkey"))).alias("items")
    )
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(items, (x, i) -> "
                "transform(slice(items, i + 2, size(items)), "
                "y -> named_struct('a', x, 'b', y))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    e = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= ext_graph.MIN_SUPPORT)
        .select("a", "b")
        .localCheckpoint()
    )
    w = e.alias("e1").join(
        e.alias("e2"),
        (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")),
    ).select(
        F.col("e1.a").alias("apex"),
        F.col("e1.b").alias("b"),
        F.col("e2.b").alias("c"),
    )
    closed = w.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), ["b", "c"]
    )
    return (
        closed.select(F.explode(F.array("apex", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="triangle-floor-profile")
    spark.sparkContext.setLogLevel("ERROR")
    q_triangle_count(spark, sf).collect()  # warm
    arms = {
        "cur": lambda: q_triangle_count(spark, sf),
        "r8": lambda: r8_variant(spark, sf),
        "scan_floor(fct_purchases)": lambda: q_fct_purchases(spark, sf),
    }
    results: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(repeats):
        for tag, fn in arms.items():  # interleaved: drift cancels
            t0 = time.perf_counter()
            # noop write, NOT collect — bench.py's methodology, so the
            # numbers are comparable with BENCH_r{N} (a collect of
            # fct_purchases' 600k rows would time driver serialization)
            fn().write.format("noop").mode("overwrite").save()
            results[tag].append(round(time.perf_counter() - t0, 3))
    for tag, ts in results.items():
        print(f"{tag}: samples={ts} best={min(ts)}")


if __name__ == "__main__":
    main()
