"""r14 floor attribution (VERDICT r13 items 2 + 7): interleave the
r13 bench movers with the scan-floor canary in ONE session so machine
drift cancels in the ratios.

Arms:
- ``canary``   — fct_purchases (pure scan+project, untouched since r8)
- ``triangle`` — triangle_count: r13 driver bench jumped 1.54 -> 4.46 s
  best-vs-best (2.9x) with the graph code untouched (git diff
  85d1f13..r13 HEAD shows no change to operators/graph.py /
  queries/ext_graph.py) — the board's largest unexplained mover.
  NOTE the canary was FLAT on the same board (0.503 -> 0.508 best), so
  "calib noise" does NOT cover it; candidate causes are (a) co-tenant
  interference local to that bench window (shuffle/disk, which the
  JVM-alloc calib and the scan canary both undercount) or (b) a real
  plan change, which git rules out. This interleave decides.
- ``mmr``      — mmr_diversified_topk: +17% on the same board (2.16 ->
  2.54 s best), code unchanged; second watchlist entry.
- ``corpus``   — corpus_pipeline_full: canary-ratio has drifted three
  rounds running (r10 board 2.4 -> r13 session 1.8); keep it honest.

Reading: board ratios r12 (the last quiet window) were
triangle/canary = 1.535/0.503 = 3.05, mmr/canary = 2.164/0.503 = 4.30.
If this session's interleaved ratios land near those, the r13 raw
numbers were window noise — record in SCALE.md known-artifacts and
close. If triangle's ratio lands near r13's 4.46/0.508 = 8.8, the
slowdown is real and plan forensics start at the wedge join's
edge-materialization checkpoint (operators/graph.py).

Usage: python tools/profile_floor_r14.py [repeats=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_dataengineering_project_spark import get_spark  # noqa: E402
from ecommerce_dataengineering_project_spark.queries.core import q_fct_purchases  # noqa: E402
from ecommerce_dataengineering_project_spark.queries.ext_graph import (  # noqa: E402
    q_triangle_count,
)
from ecommerce_dataengineering_project_spark.queries.ext_similarity import (  # noqa: E402
    q_mmr_diversified_topk,
)
from ecommerce_dataengineering_project_spark.queries.ext_text import (  # noqa: E402
    q_corpus_pipeline_full,
)

R12_BOARD = {"canary": 0.503, "triangle": 1.535, "mmr": 2.164}
R13_BOARD = {"canary": 0.508, "triangle": 4.463, "mmr": 2.536}


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="floor-profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    arms = {
        "canary": lambda: q_fct_purchases(spark, sf),
        "triangle": lambda: q_triangle_count(spark, sf),
        "mmr": lambda: q_mmr_diversified_topk(spark, sf),
        "corpus": lambda: q_corpus_pipeline_full(spark, sf),
    }
    for fn in arms.values():  # warm every arm once
        fn().write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {}
    for _ in range(repeats):  # interleaved: one round = one pass/arm
        for name, fn in arms.items():
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best[name] = min(best.get(name, 1e9), dt)
    print({k: round(v, 3) for k, v in best.items()})
    for name in ("triangle", "mmr"):
        ratio = best[name] / best["canary"]
        r12 = R12_BOARD[name] / R12_BOARD["canary"]
        r13 = R13_BOARD[name] / R13_BOARD["canary"]
        print(
            f"{name}/canary = {ratio:.2f}  (r12 board {r12:.2f}, "
            f"r13 board {r13:.2f})"
        )
    print(f"corpus/canary = {best['corpus'] / best['canary']:.2f} "
          f"(r10 board 2.4, r13 session 1.8)")


if __name__ == "__main__":
    main()
