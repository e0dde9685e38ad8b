"""Routing-correctness contracts for plans/mv_router.py (X25).

Value parity of the routed daily_sales is in test_oracle_parity; these
pin the ROUTER's decisions: refusals (finer grain, underivable
measure), avg-from-partials correctness, the grain fast path's
exchange-free plan, and that a routed plan scans the MV, not the base.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.plans.mv_router import build_mv, route
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT


@pytest.fixture(scope="module")
def mv(spark):
    base = spark.createDataFrame(
        [("d1", "A", 10.0), ("d1", "A", 20.0), ("d1", "B", 5.0),
         ("d2", "A", 7.0), ("d2", "B", 3.0), ("d2", "B", 9.0)],
        "day STRING, flag STRING, amt DOUBLE",
    )
    path = os.path.join(TMP_ROOT, "mv", "router_tests")
    yield build_mv(
        spark, base, "t", ("day", "flag"),
        {"amt": ("sum+count", F.col("amt"))}, path,
    ), base


def test_rollup_to_coarser_grain_matches_base(spark, mv):
    m, base = mv
    routed = route(spark, m, ("day",), {"total": ("sum", "amt"), "n": ("count", "amt")})
    want = {
        (r.day, r.total, r.n)
        for r in base.groupBy("day")
        .agg(F.sum("amt").alias("total"), F.count("amt").alias("n"))
        .collect()
    }
    assert {(r.day, r.total, r.n) for r in routed.collect()} == want


def test_avg_is_rederived_from_partials_not_avg_of_avgs(spark, mv):
    m, base = mv
    routed = route(spark, m, ("day",), {"mean": ("avg", "amt")})
    got = {(r.day, round(r.mean, 9)) for r in routed.collect()}
    # d1: (10+20+5)/3, NOT avg(avg(10,20), 5) = avg(15,5)=10
    assert got == {("d1", round(35 / 3, 9)), ("d2", round(19 / 3, 9))}


def test_finer_grain_is_refused(spark, mv):
    m, _ = mv
    assert route(spark, m, ("day", "flag", "amt"), {"n": ("count", "amt")}) is None


def test_underivable_measure_is_refused(spark):
    base = spark.createDataFrame([("d1", 1.0)], "day STRING, amt DOUBLE")
    path = os.path.join(TMP_ROOT, "mv", "router_sum_only")
    m = build_mv(spark, base, "s", ("day",), {"amt": ("sum", F.col("amt"))}, path)
    assert route(spark, m, ("day",), {"mean": ("avg", "amt")}) is None  # no count partial
    assert route(spark, m, ("day",), {"n": ("count", "amt")}) is None
    assert route(spark, m, ("day",), {"x": ("sum", "other")}) is None  # unknown measure


def test_grain_fast_path_has_no_aggregate(spark, mv):
    m, _ = mv
    routed = route(
        spark, m, ("day", "flag"), {"total": ("sum", "amt"), "mean": ("avg", "amt")}
    )
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan  # scan + project only: zero exchanges
    rows = {(r.day, r.flag, r.total, round(r.mean, 9)) for r in routed.collect()}
    assert ("d1", "A", 30.0, 15.0) in rows


def test_routed_plan_scans_the_mv_not_the_base(spark, mv):
    m, _ = mv
    routed = route(spark, m, ("day",), {"total": ("sum", "amt")})
    physical = routed._jdf.queryExecution().executedPlan().toString()
    assert "router_tests" in physical  # FileScan points at the MV path


def test_route_best_picks_the_cheapest_qualifying_mv(spark, mv):
    from ecommerce_dataengineering_project_spark.plans.mv_router import (
        build_mv,
        route_best,
    )

    fine, base = mv  # (day, flag) grain, 4 rows
    coarse = build_mv(
        spark, base, "coarse", ("day",),
        {"amt": ("sum+count", F.col("amt"))},
        os.path.join(TMP_ROOT, "mv", "router_coarse"),
    )
    # day-level request: both qualify; the coarse MV (2 rows) must win
    picked = route_best(
        spark, [fine, coarse], ("day",), {"total": ("sum", "amt")}
    )
    assert picked is not None
    plan, chosen = picked
    assert chosen.name == "coarse" and chosen.n_rows == 2
    assert {(r.day, r.total) for r in plan.collect()} == {("d1", 35.0), ("d2", 19.0)}
    # (day, flag) request: only the fine MV qualifies
    plan2, chosen2 = route_best(
        spark, [fine, coarse], ("day", "flag"), {"total": ("sum", "amt")}
    )
    assert chosen2.name == "t"
    # un-routable request: no candidate
    assert route_best(spark, [fine, coarse], ("other",), {"n": ("count", "amt")}) is None


def test_mv_route_best_query_serves_grain_fast_path(spark, sf_dir):
    """The registered mv_route_best query must pick the coarse MV (the
    in-query assert) AND serve it grain-at-grain: scan+project with
    ZERO exchanges and no re-aggregation — the whole point of keeping
    an MV at the request's grain."""
    from ecommerce_dataengineering_project_spark.queries.ext_scale import q_mv_route_best

    df = q_mv_route_best(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "HashAggregate" not in plan, plan
    assert df.count() > 0
