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
    """Below ~3/8 * 2^lgk distinct values the sketch is still in its
    exact coupon phase: per-day estimates equal exact distinct counts
    on the fixture (each day has far fewer distinct users than 4096 at
    the test SFs)."""
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
