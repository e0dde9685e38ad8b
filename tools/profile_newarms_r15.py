"""Decade measurement for the r15 NEW arm at registration time —
ivf_recenter — interleaved with the scan
canary at sf0.1 and the generated sf1 (tools/gen_sf1.py), same
protocol as tools/profile_decade_r14.py. Per-arm one-time setup
(index build, batch staging, bootstrap epoch) happens in the warm pass
and is excluded from timed samples, matching bench.py's treatment.

Usage: python tools/profile_newarms_r15.py [repeats=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_dataengineering_project_spark import get_spark  # noqa: E402
from ecommerce_dataengineering_project_spark.queries import registry  # noqa: E402

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.tmp/testdata/sf1",
}
ARMS = ("fct_purchases", "ivf_recenter", "ivf_split_hot_cell")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="newarms-profile-r15")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    bests: dict[tuple[str, str], float] = {}
    for scale, sf in SCALES.items():
        for arm in ARMS:  # warm pass pays one-time staging/index builds
            queries[arm](spark, sf).write.format("noop").mode("overwrite").save()
        samples: dict[str, list[float]] = {a: [] for a in ARMS}
        for _ in range(repeats):
            for arm in ARMS:
                t0 = time.perf_counter()
                queries[arm](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[arm].append(time.perf_counter() - t0)
        for arm, ts in samples.items():
            bests[(scale, arm)] = min(ts)
            print(f"{scale} {arm}: best {min(ts):.3f}  all {[round(t, 3) for t in ts]}")
    print("\ndecade ratios (sf1/sf0.1, best-vs-best):")
    for arm in ARMS:
        r = bests[("sf1", arm)] / bests[("sf0.1", arm)]
        print(f"  {arm}: {r:.2f}x")


if __name__ == "__main__":
    main()
