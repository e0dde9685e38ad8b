"""Attribute corpus_pipeline_full's three-board drift (VERDICT r11
item 4: driver medians 0.80 -> 0.91 -> 1.10 s over r9->r11).

Code forensics first: `git log -L :q_corpus_pipeline_full:...` shows
the query unchanged since the r9 exchange-count pin (18e4a6f), and
`git diff 18e4a6f HEAD` over operators/text.py + operators/sampling.py
shows ONLY added functions — none of the five stages' code paths
(with_text_stats, row_number dedup, decontaminate, hash_split,
chunk_documents) changed. A plan regression is therefore impossible;
the candidate cause is the machine's I/O scan floor, which r11's
canary already measured drifting 1.2-1.4x.

This tool is the INTERLEAVED A/B the verdict asked for: the pipeline
and the scan-floor canary (fct_purchases — pure scan+project,
untouched since r8) alternate within one session, so machine drift
cancels in the RATIO pipeline/canary. Attribution rule:

- ratio ~= the r10 board's (0.906 / 0.372 ~= 2.4): the absolute rise
  is the floor breathing — closed, floor note committed.
- ratio substantially above 2.4: something real grew inside the
  pipeline despite identical code (e.g. JVM/codegen behavior) —
  investigate.

Usage: python tools/profile_corpus_floor.py  [repeats=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_dataengineering_project_spark import get_spark  # noqa: E402
from ecommerce_dataengineering_project_spark.queries.core import q_fct_purchases  # noqa: E402
from ecommerce_dataengineering_project_spark.queries.ext_text import (  # noqa: E402
    q_corpus_pipeline_full,
)

R10_BOARD_RATIO = 0.906 / 0.372  # pipeline median / canary best, r10


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="corpus-floor-profile")
    spark.sparkContext.setLogLevel("ERROR")
    q_corpus_pipeline_full(spark, sf).collect()  # warm
    arms = {
        "corpus_pipeline_full": lambda: q_corpus_pipeline_full(spark, sf),
        "scan_floor(fct_purchases)": lambda: q_fct_purchases(spark, sf),
    }
    results: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(repeats):
        for tag, fn in arms.items():  # interleaved: drift cancels
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            results[tag].append(round(time.perf_counter() - t0, 3))
    for tag, ts in results.items():
        print(f"{tag}: samples={ts} best={min(ts)}")
    ratio = min(results["corpus_pipeline_full"]) / min(
        results["scan_floor(fct_purchases)"]
    )
    print(
        f"ratio(best/best)={ratio:.2f}  r10 board ratio={R10_BOARD_RATIO:.2f}"
        f"  -> {'floor-attributed' if ratio <= R10_BOARD_RATIO * 1.15 else 'INVESTIGATE'}"
    )


if __name__ == "__main__":
    main()
