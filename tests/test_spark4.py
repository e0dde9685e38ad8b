"""Semantics contracts for the modern-SQL surface (queries/ext_spark4.py).

Oracle parity is covered registry-wide by test_oracle_parity.py; these
tests pin the properties parity alone can't see: the decorrelated
LATERAL plan shape, SQL-UDF inlining, sketch behavior PAST the exact
regime (where the oracle check no longer applies), collation merge
semantics, and VARIANT's malformed-input path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.queries import ext_spark4 as m


def test_lateral_decorrelates_to_window_group_limit(spark, sf_dir):
    """The correlated LATERAL top-k must plan as one decorrelated
    WindowGroupLimit + join — NOT a per-outer-row re-execution (which
    would not appear in a Spark plan at all, but a rank-window without
    the group-limit pushdown would sort the whole orders table)."""
    df = m.q_lateral_topk_orders(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "WindowGroupLimit" in plan or "RowFrame" in plan
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in physical


def test_sql_udf_is_inlined_not_a_python_call(spark, sf_dir):
    """CREATE FUNCTION ... RETURN expr must inline into the plan: no
    Python evaluation node, and the optimized plan contains the
    arithmetic itself (same execution cost as hand-writing it)."""
    df = m.q_sql_udf_pricing(spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in physical
    assert "ArrowEvalPython" not in physical
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "l_discount" in optimized  # body visible = inlined


def test_recursive_cte_min_depth_on_known_chain(spark):
    """BFS min-depth on a hand-built chain 0-1-2-3 (+ isolated 9):
    depth assignments must match the obvious answer, including NOT
    revisiting shallower nodes at greater depth (GROUP BY MIN)."""
    # part ids stay inside the query's %4==0 edge universe
    spark.createDataFrame(
        [(1, 0, 10.0), (1, 4, 10.0), (2, 4, 10.0), (2, 8, 10.0),
         (3, 8, 10.0), (3, 12, 10.0), (4, 16, 10.0)],
        "l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE",
    ).createOrReplaceTempView("lineitem")
    got = {
        (r.part, r.min_depth)
        for r in spark.sql(m._RECURSIVE_SQL).collect()
    }
    assert got == {(0, 0), (4, 1), (8, 2)}  # depth capped at 2 -> no 12


def test_collation_merges_case_variants(spark):
    df = spark.createDataFrame(
        [("Alpha",), ("ALPHA",), ("alpha",), ("beta",)], "k STRING"
    )
    merged = (
        df.groupBy(F.collate("k", "UTF8_LCASE").alias("kc"))
        .count()
        .select(F.lower(F.collate("kc", "UTF8_BINARY")).alias("k"), "count")
        .collect()
    )
    assert {(r.k, r["count"]) for r in merged} == {("alpha", 3), ("beta", 1)}


def test_variant_malformed_and_missing_paths_are_null(spark):
    df = spark.createDataFrame(
        [('{"k": 7}',), ("{not json",), (None,)], "props STRING"
    ).select(
        F.variant_get(F.try_parse_json("props"), "$.k", "int").alias("k"),
        F.variant_get(F.try_parse_json("props"), "$.missing", "int").alias("miss"),
    )
    rows = df.collect()
    assert [r.k for r in rows] == [7, None, None]
    assert all(r.miss is None for r in rows)


def test_approx_top_k_past_budget_keeps_true_heavy_hitter(spark):
    """Beyond maxItemsTracked the sketch may drop tail items but must
    surface the dominant one with a near-exact count (frequent-items
    guarantee: undercount bounded by n_tail/budget)."""
    rows = [("hot",)] * 500 + [(f"tail{i}",) for i in range(100)]
    df = spark.createDataFrame(rows, "item STRING")
    got = df.select(
        F.expr("approx_top_k(item, 1, 16)").alias("tk")
    ).collect()[0].tk
    assert got[0]["item"] == "hot"
    assert 500 - (100 // 16) - 1 <= got[0]["count"] <= 500


def test_theta_sketch_exact_below_nominal_and_bounded_above(spark):
    """lgk=14: exact for <=16384 uniques (the driver regime), and
    within ~5% at 50k uniques (the 100-TB regime)."""
    small = spark.range(1000).agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("id", F.lit(14))).alias("e")
    ).collect()[0].e
    assert int(small) == 1000
    big = spark.range(50_000).agg(
        F.theta_sketch_estimate(F.theta_sketch_agg("id", F.lit(12))).alias("e")
    ).collect()[0].e
    assert abs(big - 50_000) / 50_000 < 0.05


def test_theta_set_algebra_identities(spark):
    """|A∩B| + |A\\B| = |A| and union >= max(|A|,|B|) — in exact mode
    these hold as integers, pinning that the three operators act on
    the same retained-hash sample."""
    df = spark.range(2000).select(
        F.when(F.col("id") < 1500, F.col("id")).alias("a_key"),
        F.when(F.col("id") >= 1000, F.col("id")).alias("b_key"),
    )
    sk = df.agg(
        F.theta_sketch_agg("a_key", F.lit(14)).alias("a"),
        F.theta_sketch_agg("b_key", F.lit(14)).alias("b"),
    )
    r = sk.select(
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("u"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("i"),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias("d"),
        F.theta_sketch_estimate("a").alias("na"),
        F.theta_sketch_estimate("b").alias("nb"),
    ).collect()[0]
    assert (r.na, r.nb) == (1500, 1000)
    assert r.i == 500 and r.d == 1000 and r.u == 2000
    assert r.i + r.d == r.na


@pytest.mark.parametrize("name", sorted(m.QUERIES))
def test_every_spark4_query_has_an_oracle(name):
    assert name in m.ORACLES
