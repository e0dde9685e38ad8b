"""Board pre-flight: the ONE sanctioned way to claim "N/50 green".

Mirrors the grading driver's t2 path — a bare vanilla SparkSession, the
first 50 ``PRIORITY`` rows from ``__spark_entry__.queries()`` compared
against their ``oracle_sql()`` DuckDB oracles at sf0.01 through
``tests/oracle_harness.compare`` (the driver-faithful comparator: sorted
column names, type-sensitive, order-insensitive values) — and writes a
RETAINED log. A STATUS "green" claim must cite this tool's log; ad-hoc
heredoc comparators are banned (r14's uncommitted pre-flight logged a
false negative on ``skew_salted_join`` that the committed comparator
reruns green deterministically — the r14 verdict's traceability lapse).

Usage:
    python tools/preflight.py [--sf-dir /root/testdata/sf0.01] \
        [--out .tmp/preflight_<utc>.log] [--names a,b,c]

Exit 0 iff every checked row is green (full match, or rows-only for
oracle-less rows, same as the driver).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--out",
        default=None,
        help="log path (default .tmp/preflight_<utcstamp>.log, never overwritten)",
    )
    ap.add_argument(
        "--names",
        default=None,
        help="comma-separated subset to check (default: the PRIORITY[:50] board)",
    )
    args = ap.parse_args()

    out = args.out or os.path.join(
        REPO, ".tmp", f"preflight_{time.strftime('%Y%m%dT%H%M%SZ', time.gmtime())}.log"
    )
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from ecommerce_dataengineering_project_spark.queries import PRIORITY
    from tests.oracle_harness import compare, duck_connection

    # The driver's t2 session: bare builder, no engine tuning, NTZ
    # inference on, UTC — identical to tests/conftest.py's vanilla arm.
    spark = (
        SparkSession.builder.appName("preflight")
        .master("local[4]")
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(REPO, ".tmp", "warehouse-preflight"),
        )
        .getOrCreate()
    )
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    board = list(PRIORITY[:50]) if args.names is None else args.names.split(",")
    con = duck_connection(args.sf_dir)

    lines: list[str] = [
        f"preflight @ {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}"
        f" sf_dir={args.sf_dir} rows={len(board)}"
    ]

    def log(msg: str) -> None:
        lines.append(msg)
        print(msg, flush=True)

    # entry smoke, like the driver
    try:
        n_entry = len(entrymod.entry(spark).collect())
        log(f"entry: OK ({n_entry} rows)")
        entry_ok = True
    except Exception as e:  # noqa: BLE001 — the log IS the error channel
        log(f"entry: ERR {type(e).__name__}: {e}")
        entry_ok = False

    bad: list[str] = []
    for name in board:
        t0 = time.time()
        try:
            df = queries[name](spark, args.sf_dir)
            if name in oracles:
                errors = compare(df, con, oracles[name])
                status = "green" if not errors else "RED " + "; ".join(errors)
            else:
                n = len(df.limit(5).collect())
                errors = [] if n >= 0 else ["no rows"]
                status = "green (rows-only by nature)"
        except Exception as e:  # noqa: BLE001
            errors = [f"{type(e).__name__}: {e}"]
            status = f"ERR {errors[0]}"
        if errors:
            bad.append(name)
        log(f"{name}: {status} [{time.time() - t0:.1f}s]")

    ok = entry_ok and not bad
    log(
        f"RESULT: {len(board) - len(bad)}/{len(board)} green"
        + ("" if ok else f" — BAD: {bad}" + ("" if entry_ok else " + entry ERR"))
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"log retained at {out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
