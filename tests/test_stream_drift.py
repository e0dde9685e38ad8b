"""stream_drift_monitor: the windowed KL must equal a Python
reference computed from the raw events (same fit, same smoothing, same
bucket rule), the Gibbs bound must hold per window, and the baseline
fit must be collected once per sf_dir (plan-literal pattern)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.queries import streaming_queries as sq
from ecommerce_dataengineering_project_spark.sources.readers import load_table


def _bucket(v: float) -> int:
    return min(sq.DRIFT_BUCKETS - 1, int(math.floor(v / sq.DRIFT_WIDTH)))


def test_stream_drift_matches_python_reference(spark, sf_dir):
    out = {
        (r.window_start, r.event_type): (r.n_rows, r.kl)
        for r in sq.q_stream_drift_monitor(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("d"), "event_type", "value"
    )
    rows = ev.collect()
    base_counts = [0] * sq.DRIFT_BUCKETS
    for r in rows:
        base_counts[_bucket(r.value)] += 1
    n = len(rows)
    q = [(c + 1) / (n + sq.DRIFT_BUCKETS) for c in base_counts]
    groups: dict[tuple, list[float]] = {}
    for r in rows:
        groups.setdefault((r.d, r.event_type), []).append(r.value)
    assert set(out) == set(groups)
    for key, vals in groups.items():
        cs = [0] * sq.DRIFT_BUCKETS
        for v in vals:
            cs[_bucket(v)] += 1
        kl = 0.0
        for i in range(sq.DRIFT_BUCKETS):
            p = (cs[i] + 1) / (len(vals) + sq.DRIFT_BUCKETS)
            kl += p * math.log(p / q[i])
        kl6 = math.floor(kl * 1e6 + 0.5) / 1e6
        assert out[key][0] == len(vals)
        assert math.isclose(out[key][1], kl6, rel_tol=1e-9, abs_tol=1e-9)
        # smoothed KL of a sub-sample vs the blended baseline can dip
        # epsilon-negative ONLY through rounding; Gibbs holds pre-round
        assert out[key][1] >= -1e-6


def test_drift_baseline_collected_once(spark, sf_dir):
    sq._DRIFT_BASELINE.pop(sf_dir, None)
    sq.q_stream_drift_monitor(spark, sf_dir)
    fitted = sq._DRIFT_BASELINE[sf_dir]
    assert len(fitted) == sq.DRIFT_BUCKETS
    assert math.isclose(sum(fitted), 1.0, rel_tol=1e-9)
    # second build must reuse the memoized fit (no new collect): the
    # list object is the SAME instance
    sq.q_stream_drift_monitor(spark, sf_dir)
    assert sq._DRIFT_BASELINE[sf_dir] is fitted
