"""Graph query (operators/graph.py): integer-exact PageRank over the
part co-purchase graph, oracle-checked bit-for-bit by unrolling the
same fixed iterations as SQL CTEs — possible only because the operator
keeps every update in scaled-integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.graph import (
    BASE,
    DAMP_NUM,
    SCALE,
    copurchase_edges,
    pagerank,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table

MIN_SUPPORT = 2
ITERATIONS = 3


def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return pagerank(copurchase_edges(li, min_support=MIN_SUPPORT), ITERATIONS)


QUERIES = {"pagerank_copurchase": q_pagerank_copurchase}


def _pagerank_sql() -> str:
    """Unroll ITERATIONS synchronous integer updates as CTEs. The edge
    derivation is the relational twin of the basket explode: distinct
    (order, part) pairs self-joined with ``a < b`` gives the same
    support counts as pair windows over the sorted distinct basket."""
    ctes = [
        "op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)",
        f"""edges AS (
            SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
            GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT})""",
        "und AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges)",
        "deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY 1)",
        f"r0 AS (SELECT a AS node, CAST({SCALE} AS BIGINT) AS rank FROM deg)",
    ]
    for k in range(1, ITERATIONS + 1):
        ctes.append(
            f"""i{k} AS (
                SELECT u.b AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS inc
                FROM und u JOIN deg d ON u.a = d.a JOIN r{k-1} r ON u.a = r.node
                GROUP BY 1)"""
        )
        ctes.append(
            f"""r{k} AS (
                SELECT d.a AS node,
                       CAST({BASE} + ({DAMP_NUM} * COALESCE(i.inc, 0)) // 100
                           AS BIGINT) AS rank
                FROM deg d LEFT JOIN i{k} i ON d.a = i.node)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT r.node, r.rank, d.deg AS degree
        FROM r{ITERATIONS} r JOIN deg d ON r.node = d.a
    """
    )


ORACLES = {"pagerank_copurchase": _pagerank_sql()}


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: triangle census over the co-purchase graph — the classic
    clustering primitive (Cohen's map-reduce formulation, public
    literature): with edges held once as ``a < b``, triangles are two
    hash joins — wedge build (a<b<c from the common apex) + closing
    edge probe — never an all-pairs expansion. Per-node participation
    is the returned relation (global census = its sum/3 in the test);
    degree ordering caps the wedge fan-out at heavy nodes (the
    standard skew bound: high-degree vertices are wedge CENTERS only
    for their lower-degree neighbors).

    Output: (node, n_triangles) for nodes in >=1 triangle, fully
    oracle-checked against the same two-join SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    # the edge relation is referenced three times (two wedge sides +
    # the closing probe); localCheckpoint materializes the expensive
    # basket explode ONCE instead of re-deriving it under each join
    # (support-thresholded edges are small — 3.5k at sf0.1 — while the
    # derivation scans all of lineitem; 14 s -> ~3 s at sf0.1)
    e = (
        copurchase_edges(li, min_support=MIN_SUPPORT)
        .select("a", "b")
        .localCheckpoint()
    )
    # wedges centered at a: (b, c) both neighbors of a, b < c
    w = e.alias("e1").join(
        e.alias("e2"),
        (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b")),
    ).select(
        F.col("e1.a").alias("apex"),
        F.col("e1.b").alias("b"),
        F.col("e2.b").alias("c"),
    )
    closed = w.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), ["b", "c"]
    )
    per_node = (
        closed.select(
            F.explode(F.array("apex", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


QUERIES["triangle_count"] = q_triangle_count

ORACLES["triangle_count"] = f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    edges AS (
        SELECT x.p AS a, y.p AS b FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT}),
    tri AS (
        SELECT e1.a AS apex, e1.b AS b, e2.b AS c
        FROM edges e1
        JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b),
    nodes AS (
        SELECT apex AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
    SELECT node, COUNT(*) AS n_triangles
    FROM nodes GROUP BY node
"""
