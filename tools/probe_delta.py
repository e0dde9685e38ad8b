#!/usr/bin/env python
"""Probe: can this sandbox run REAL Delta Lake / Iceberg under Spark?

The reference commits its silver tables through Delta streaming appends
(reference: pipeline/spark/streaming_consumer.py:81-88) and promotes to
Iceberg v2 with create-or-append, format-version=2
(reference: pipeline/spark/delta_to_iceberg.py:44-52). This repo
emulates those semantics on parquet managed tables
(sources/maintenance.py, plans/medallion.py). This script documents
WHY the emulation, rather than real `delta-spark`, is what runs here:
it checks every way the jars could be obtained, and fails loudly if
any of them would work (meaning the emulation should be replaced).

Run: python tools/probe_delta.py   (output committed as DELTA_PROBE.md)
"""

from __future__ import annotations

import glob
import importlib.util
import os
import sys
import urllib.error
import urllib.request


def main() -> int:
    findings: list[str] = []
    viable = False

    # 1. The delta-spark python package (pip distribution).
    spec = importlib.util.find_spec("delta")
    findings.append(f"1. `import delta` (delta-spark pip package): {'FOUND ' + str(spec.origin) if spec else 'NOT INSTALLED'}")
    viable |= spec is not None

    # 2. Delta / Iceberg jars already on the Spark classpath.
    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = [
        os.path.basename(p)
        for pat in ("*delta*.jar", "*iceberg*.jar")
        for p in glob.glob(os.path.join(jar_dir, pat))
    ]
    findings.append(f"2. pyspark jars dir ({jar_dir}): {hits if hits else 'no delta/iceberg jars'}")
    viable |= bool(hits)

    # 3. A local ivy/maven cache a `spark.jars.packages` resolve could hit.
    caches = [p for p in (os.path.expanduser("~/.ivy2"), os.path.expanduser("~/.m2")) if os.path.exists(p)]
    cache_hits = [
        p
        for c in caches
        for p in glob.glob(os.path.join(c, "**", "*delta*"), recursive=True)
    ]
    findings.append(f"3. local ivy/m2 caches: {caches if caches else 'none present'}; delta artifacts: {cache_hits if cache_hits else 'none'}")
    viable |= bool(cache_hits)

    # 4. Network fetch from Maven Central (what spark.jars.packages does).
    url = "https://repo1.maven.org/maven2/io/delta/"
    try:
        r = urllib.request.urlopen(url, timeout=10)
        findings.append(f"4. Maven Central ({url}): HTTP {r.status} — REACHABLE")
        viable = True
    except (urllib.error.URLError, OSError) as exc:
        findings.append(f"4. Maven Central ({url}): UNREACHABLE — {type(exc).__name__}: {exc}")

    print(f"pyspark {pyspark.__version__}, python {sys.version.split()[0]}")
    for f in findings:
        print(f)
    if viable:
        print("\nVERDICT: real Delta IS obtainable here — replace the parquet")
        print("emulation in sources/maintenance.py with delta-spark.")
        return 1
    print("\nVERDICT: no package, no jars, no cache, no network — real Delta/")
    print("Iceberg cannot be loaded in this sandbox. The parquet managed-table")
    print("emulation (sources/maintenance.py, plans/medallion.py) stands in for")
    print("the transactional-append / create-or-append semantics; on a real")
    print("cluster, swap `format('parquet')` for `format('delta')` and the")
    print("DeltaTable merge API — the call sites are isolated behind")
    print("sources/maintenance.py for exactly that reason.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
