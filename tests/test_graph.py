"""PageRank behavior on hand graphs (operators/graph.py)."""

from __future__ import annotations

from ecommerce_dataengineering_project_spark.operators.graph import SCALE, pagerank


def _ranks(spark, edge_rows, iterations=3):
    edges = spark.createDataFrame(edge_rows, "a long, b long")
    return {
        r.node: (r.rank, r.degree)
        for r in pagerank(edges, iterations).collect()
    }


def test_star_center_outranks_leaves(spark):
    # 1 is the hub of a 4-leaf star
    r = _ranks(spark, [(1, 2), (1, 3), (1, 4), (1, 5)])
    hub_rank, hub_deg = r[1]
    assert hub_deg == 4
    for leaf in (2, 3, 4, 5):
        leaf_rank, leaf_deg = r[leaf]
        assert leaf_deg == 1
        assert hub_rank > leaf_rank


def test_symmetric_pair_equal_ranks(spark):
    r = _ranks(spark, [(1, 2)])
    assert r[1] == r[2]
    # single symmetric edge: contrib = rank/1, so rank converges to
    # BASE + floor(0.85 * rank) — fixed point at SCALE (minus integer
    # floor slack)
    assert abs(r[1][0] - SCALE) <= 3


def test_zero_iterations_uniform(spark):
    r = _ranks(spark, [(1, 2), (2, 3)], iterations=0)
    assert {v[0] for v in r.values()} == {SCALE}
