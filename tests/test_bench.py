"""bench.py contract test: the driver records BENCH_r{N}.json from the
LAST stdout line — a malformed line, a query error, or an oversized
headline silently degrades the round's perf evidence. Run the real CLI
end-to-end at sf0.001 (single repeat) and validate the contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cli_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) >= 2, proc.stdout[-500:]

    headline = json.loads(lines[-1])  # the line the driver keeps
    assert headline["metric"] == "total_query_wall_clock"
    assert headline["unit"] == "sec"
    assert headline["value"] > 0
    assert "n_errors" not in headline, headline
    # best-of-N alongside median (VERDICT r4 item 5): best <= median,
    # per headline query and in total
    assert headline["fmt"] == "median_best"
    assert 0 < headline["value_best"] <= headline["value"]
    for name, mb in headline["queries"].items():
        median, best_t = mb
        assert 0 < best_t <= median, (name, mb)
    # headline must survive the driver's 2000-char stdout tail
    assert len(lines[-1]) < 1900, len(lines[-1])

    full = json.loads(lines[-2])
    from ecommerce_dataengineering_project_spark.queries import registry

    all_queries, _ = registry()
    assert "errors" not in full, full.get("errors")
    assert set(full["queries"]) == set(all_queries)
    assert headline["n_queries"] == len(all_queries)
    assert 0 < full["value_best"] <= full["value"]
    for name, runs in full["samples"].items():
        assert min(runs) <= full["queries"][name]  # best <= median
