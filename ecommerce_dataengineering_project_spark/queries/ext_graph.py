"""Graph query (operators/graph.py): integer-exact PageRank over the
part co-purchase graph, oracle-checked bit-for-bit by unrolling the
same fixed iterations as SQL CTEs — possible only because the operator
keeps every update in scaled-integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
