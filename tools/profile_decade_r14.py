"""Fifth decade wave (VERDICT r13 item 5): sf0.1 -> sf1 ratios for the
remaining >1 s bench rows without decade measurements —
txlog_delete_vectors, txlog_update_dv, xml_roundtrip,
window_first_last, window_analytics, udtf_user_sessions (the surface
arm — even its slope is worth one line). The scan-floor canary
(fct_purchases) interleaves at BOTH scales so machine drift cancels in
the ratios.

Usage: python tools/profile_decade_r14.py [repeats=3]
Prints per-arm best per scale and the decade ratios.
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
ARMS = (
    "fct_purchases",
    "txlog_delete_vectors",
    "txlog_update_dv",
    "xml_roundtrip",
    "window_first_last",
    "window_analytics",
    "udtf_user_sessions",
)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(app_name="decade-profile-r14")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()
    bests: dict[tuple[str, str], float] = {}
    for scale, sf in SCALES.items():
        for arm in ARMS:  # warm each arm's scan + worker pool once
            queries[arm](spark, sf).write.format("noop").mode("overwrite").save()
        samples: dict[str, list[float]] = {a: [] for a in ARMS}
        for _ in range(repeats):
            for arm in ARMS:  # interleaved: drift cancels
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
    canary = bests[("sf1", "fct_purchases")] / bests[("sf0.1", "fct_purchases")]
    print(f"  (canary fct_purchases carries the scan-floor term: {canary:.2f}x)")


if __name__ == "__main__":
    main()
