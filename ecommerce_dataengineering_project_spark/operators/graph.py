"""Graph operators over the co-purchase graph: integer-exact PageRank.

Extends the dedup layer's connected-components (operators/dedup.py)
with the second classic iterative graph algorithm — importance
propagation — built the same Spark-first way: per-iteration equi-joins
and groupBys on the node key, no driver-side graph state.

Exactness contract: ranks are *scaled integers* (``SCALE`` = 1e6) and
every update uses only integer division and integer sums —
``r' = floor(0.15·SCALE) + (85 · Σ floor(r/deg)) div 100`` — so a SQL
engine unrolling the same fixed number of iterations reproduces every
rank bit-for-bit. No float accumulation order to diverge, which is
what makes an *iterative* algorithm oracle-checkable at all.

Scale notes (100 TB): edges come from the one-shuffle basket-array
explode (operators/commerce.py basket_pairs' shape — never a lineitem
self-join); the adjacency+degree relation is built once and persisted;
each iteration is one shuffle keyed by node (join broadcast-or-hash by
size, then a map-side-combined sum). Fixed iteration count keeps
lineage shallow; for large iteration counts callers would interleave
``localCheckpoint`` exactly as dedup's cluster collapse does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMP_NUM = 85  # damping 0.85 as an integer percentage
BASE = (100 - DAMP_NUM) * SCALE // 100  # floor(0.15 * SCALE)


def copurchase_edges(
    lineitem: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
) -> DataFrame:
    """Undirected co-purchase edges ``(a < b)`` kept at
    ``min_support`` co-occurring orders — the basket-array pair explode
    (ONE shuffle to baskets + the pair-count shuffle), not a self-join.
    """
    from ecommerce_dataengineering_project_spark.operators.commerce import (
        basket_pair_counts,
        order_baskets,
    )

    # materialize=False: edges are this relation's ONLY consumer and
    # both callers (triangle census, pagerank) checkpoint a much
    # smaller DERIVED relation one step later — eagerly writing the
    # widest intermediate (the basket arrays) to read it once was a
    # measured 1.7x regression on the sf0.1 triangle census.
    return basket_pair_counts(
        order_baskets(lineitem, order_col, item_col, materialize=False),
        min_support,
    ).select("a", "b")


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Integer-exact PageRank over an undirected edge list ``(a, b)``.

    Returns ``(node, rank, degree)`` with ``rank`` the SCALE-scaled
    integer after ``iterations`` synchronous updates from a uniform
    ``SCALE`` start. Every node in the edge list has degree ≥ 1, so
    there are no dangling-node corrections to make.
    """
    # und is the ONE materialization point: it is tiny (2x the
    # support-thresholded edge list) yet feeds BOTH deg and adj, whose
    # separate builds would otherwise each re-derive the full upstream
    # edge derivation (for copurchase edges: the lineitem scan + two
    # shuffles, unmaterialized since order_baskets materialize=False).
    # localCheckpoint, NOT persist: a cache entry pinned under a
    # lazily-returned result can never be unpersisted by the caller
    # and leaks executor storage for the session; checkpoint blocks
    # are GC-cleaned once the result is released. LAZY (r15): each
    # eager checkpoint was its own Spark job at construction time —
    # three serial job launches before the first real action; the lazy
    # form materializes each relation exactly once inside the
    # consumer's first job (cache fills on first computation, every
    # other branch reads it), same reuse, two fewer job barriers.
    und = (
        edges.select("a", "b")
        .unionAll(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    # deg feeds every iteration's rank rebuild AND the adjacency —
    # without materialization each iteration would recompute it (at
    # sf0.1 that tripled the runtime).
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    adj = und.join(deg, "a").localCheckpoint(eager=False)
    ranks = deg.select(F.col("a").alias("node"), F.lit(SCALE).cast("bigint").alias("rank"))
    for _ in range(iterations):
        incoming = (
            adj.join(ranks, adj["a"] == ranks["node"])
            .select(F.col("b"), F.expr("rank div deg").alias("c"))
            .groupBy("b")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            deg.join(incoming, deg["a"] == incoming["b"], "left")
            .select(
                F.col("a").alias("node"),
                (
                    F.lit(BASE)
                    + F.expr(f"({DAMP_NUM} * coalesce(inc, 0L)) div 100")
                ).cast("bigint").alias("rank"),
            )
        )
    out = ranks.join(deg, ranks["node"] == deg["a"]).select(
        "node", "rank", F.col("deg").alias("degree")
    )
    return out
