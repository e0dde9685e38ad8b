"""Mergeable-sketch contracts (operators/sketches.py).

The incremental layout is only safe if the rollup answer can never
drift from the recompute answer — that's the lossless-union property
pinned here, plus accuracy bounds against exact statistics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.sketches import (
    daily_sketch_report,
    daily_sketches,
    rollup_sketches,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select("ts", "user_id", "value")


def test_hll_union_is_lossless(spark, events):
    """estimate(union(per-day sketches)) == estimate(sketch(all rows))
    EXACTLY at equal lgConfigK — the property that makes persisting
    daily sketches equivalent to keeping the raw data for distincts."""
    daily = daily_sketches(events, "ts", "user_id", "value")
    via_rollup = rollup_sketches(daily).collect()[0]["approx_distinct_keys"]
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert via_rollup == direct


def test_hll_exact_phase_on_small_partitions(spark, events):
    """Below hll_exact_boundary(lgk) distinct values (384 at the
    default lgk=12 — min(3*2^(lgk-3)/4, 24576), the r13 bisected rule)
    the sketch is still in its exact coupon phase: per-day estimates
    equal exact distinct counts on the fixture (each day has far fewer
    distinct users than 384 at the test SFs)."""
    report = {
        r["day"]: r["approx_distinct_keys"]
        for r in daily_sketch_report(events, "ts", "user_id", "value").collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert report == exact


def test_rollup_accuracy_vs_exact(spark, events):
    """Global rollup: distinct estimate within HLL error (lgk=12 →
    ~1.6% rse; allow 5%), KLL median within rank tolerance of the
    exact median, row count exact."""
    roll = rollup_sketches(daily_sketches(events, "ts", "user_id", "value")).collect()[0]
    n_exact = events.count()
    d_exact = events.select("user_id").distinct().count()
    assert roll["n_rows"] == n_exact
    assert abs(roll["approx_distinct_keys"] - d_exact) <= max(2, 0.05 * d_exact)
    lo, hi = events.agg(
        F.expr("percentile(value, 0.45)"), F.expr("percentile(value, 0.55)")
    ).collect()[0]
    assert lo <= roll["value_p50"] <= hi


def test_segment_overlap_exact_in_coupon_phase(spark, sf_dir):
    """HLL inclusion-exclusion overlap equals the exact pairwise
    intersection counts while segment sketches are in the exact
    coupon phase (true at the fixture SFs)."""
    from itertools import combinations

    from ecommerce_dataengineering_project_spark.operators.sketches import segment_overlap

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    got = {
        (r.seg_a, r.seg_b): r.approx_common_keys
        for r in segment_overlap(ev, "event_type", "user_id").collect()
    }
    users = {
        seg: {r.user_id for r in ev.where(F.col("event_type") == seg).distinct().collect()}
        for seg in [r[0] for r in ev.select("event_type").distinct().collect()]
    }
    want = {
        (a, b): len(users[a] & users[b])
        for a, b in combinations(sorted(users), 2)
    }
    assert got == want


def test_sketch_state_is_bounded(spark, events):
    """The persisted per-day state is KBs regardless of row count —
    the whole point of the layout."""
    daily = daily_sketches(events, "ts", "user_id", "value").select(
        F.octet_length("key_hll").alias("hll_bytes"),
        F.octet_length("value_kll").alias("kll_bytes"),
    )
    mx = daily.agg(F.max("hll_bytes"), F.max("kll_bytes")).collect()[0]
    assert mx[0] < 64 * 1024 and mx[1] < 64 * 1024


def test_rollup_of_empty_input_degrades_to_null_row(spark, events):
    """A rollup over a day range with no partitions must return one
    null-stats row, not raise (ANSI element_at on the empty collected
    sketch list)."""
    daily = daily_sketches(events.where(F.lit(False)), "ts", "user_id", "value")
    row = rollup_sketches(daily).collect()[0]
    assert row["approx_distinct_keys"] == 0  # empty HLL union estimates 0
    assert row["n_rows"] is None
    assert row["value_p50"] is None


def test_sketch_agg_is_partial(spark, events):
    """The daily sketch pass must run as partial_ + merge_ aggregation
    (map-side combine of sketch state), not a row shuffle."""
    plan = (
        daily_sketches(events, "ts", "user_id", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the SKETCH aggregates specifically — partial_count alone (from
    # n_rows) must not satisfy this
    assert "partial_hll_sketch_agg" in plan
    assert "partial_kll_sketch_agg_double" in plan


def test_mg_exact_phase_when_vocab_fits(spark):
    """With distinct keys <= k the summary never compresses: weights
    are EXACT counts and the err row is 0 — mirroring the HLL coupon
    phase contract."""
    from ecommerce_dataengineering_project_spark.operators.sketches import (
        heavy_hitters,
        mg_summaries,
    )

    rows = [(w,) for w in ["a"] * 5 + ["b"] * 3 + ["c"] * 2]
    df = spark.createDataFrame(rows, "token string").repartition(4)
    errs = [
        r.weight
        for r in mg_summaries(df, "token", k=8).where(F.col("key").isNull()).collect()
    ]
    assert all(e == 0 for e in errs)
    hh = {r.key: (r.weight_lb, r.count_ub) for r in heavy_hitters(df, "token", k=8).collect()}
    assert hh == {"a": (5, 5), "b": (3, 3), "c": (2, 2)}


def test_mg_bounds_and_guarantee_vs_exact(spark):
    """The two MG contracts on a compressing workload:
    (1) bounds: weight_lb <= true count <= count_ub for every
        reported key;
    (2) guarantee: every key with true count > n/(k+1) is reported."""
    from ecommerce_dataengineering_project_spark.operators.sketches import heavy_hitters

    # zipf-ish: key_i appears (40 - i) times, i = 0..39 -> n = 820
    rows = [(f"k{i:02d}",) for i in range(40) for _ in range(40 - i)]
    df = spark.createDataFrame(rows, "token string").repartition(4)
    k = 8
    exact = {f"k{i:02d}": 40 - i for i in range(40)}
    n = sum(exact.values())
    got = {r.key: (r.weight_lb, r.count_ub) for r in heavy_hitters(df, "token", k=k).collect()}
    for key, (lb, ub) in got.items():
        assert lb <= exact[key] <= ub, (key, lb, exact[key], ub)
    for key, c in exact.items():
        if c > n / (k + 1):
            assert key in got, f"guaranteed heavy hitter {key} (count {c}) missing"


def test_mg_merge_is_partitioning_invariant_on_bounds(spark):
    """Summaries built over different partition layouts give different
    weights (that's the sketch's nature) but the BOUNDS must bracket
    the same exact counts either way, and the exact phase must agree."""
    from ecommerce_dataengineering_project_spark.operators.sketches import heavy_hitters

    rows = [(f"k{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "token string")
    exact = {f"k{i}": i + 1 for i in range(20)}
    for parts in (1, 3, 7):
        got = {
            r.key: (r.weight_lb, r.count_ub)
            for r in heavy_hitters(df.repartition(parts), "token", k=6).collect()
        }
        assert got, f"no candidates at {parts} partitions"
        for key, (lb, ub) in got.items():
            assert lb <= exact[key] <= ub, (parts, key, lb, exact[key], ub)
