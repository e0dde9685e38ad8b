"""Customer-analytics queries (operators/commerce.py): RFM
segmentation, market-basket affinity, exponentially decayed revenue.

All three are fully oracle-checked: ntile orderings carry the customer
key as a deterministic tiebreak, monetary/revenue sums are rounded to
cents before any ranking or smoothing, and the decay weight table is a
single Python-computed literal list injected into BOTH engines (never
each engine's own ``pow``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.scalars import sql_round_half_up
from ecommerce_dataengineering_project_spark.operators.commerce import (
    DECAY,
    DECAY_WINDOW_DAYS,
    N_TILES,
    basket_pairs,
    decay_weights,
    decayed_daily_revenue,
    rfm_segments,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table

MIN_SUPPORT = 2


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return rfm_segments(orders)


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return basket_pairs(li, min_support=MIN_SUPPORT)


def q_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return decayed_daily_revenue(orders)


def q_scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (operators/scd.py scd2_apply): the
    customer dimension starts at its c_mktsegment baseline and each
    order day's o_orderpriority plays a tracked-attribute change event
    (first order of the day wins, deduplicated deterministically).
    No-op updates are suppressed; surviving versions chain through
    effective_from/effective_to with exactly one open row per key."""
    from pyspark.sql import Window

    from ecommerce_dataengineering_project_spark.operators.scd import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim0 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    w = Window.partitionBy("o_custkey", F.to_date("o_orderdate")).orderBy(
        F.col("o_orderkey").asc()
    )
    updates = (
        orders.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderpriority").alias("segment"),
            F.to_date("o_orderdate").alias("effective_from"),
        )
    )
    return scd2_apply(
        dim0, updates, key_cols=["c_custkey"], attr_cols=["segment"]
    )


def q_pit_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact->dimension join (operators/joins.py
    pit_join): every order picks the customer-dimension version valid
    on its order date — facts joined to SCD2 history AS OF event time,
    the query shape the versioned dimension exists for."""
    from ecommerce_dataengineering_project_spark.operators.joins import pit_join

    orders = load_table(spark, sf_dir, "orders")
    dim = q_scd2_customer_dim(spark, sf_dir)
    fact = orders.select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.to_date("o_orderdate").alias("order_date"),
    )
    return pit_join(fact, dim, ["c_custkey"], "order_date").select(
        "o_orderkey", "c_custkey", "order_date", "segment", "effective_from"
    )


QUERIES = {
    "rfm_segments": q_rfm_segments,
    "basket_pairs": q_basket_pairs,
    "ewma_revenue": q_ewma_revenue,
    "scd2_customer_dim": q_scd2_customer_dim,
    "pit_join_orders": q_pit_join_orders,
}

_WEIGHTS = "[" + ", ".join(repr(w) for w in decay_weights()) + "]"

ORACLES = {
    # Mirrors operators/commerce.py rfm_segments: per-customer
    # aggregate, 1-row "now" scalar, ntile quintiles with custkey
    # tiebreaks, CASE segment label.
    "rfm_segments": f"""
        WITH per_cust AS (
            SELECT o_custkey AS custkey,
                   MAX(o_orderdate) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   {sql_round_half_up('SUM(o_totalprice)', 2)} AS monetary
            FROM orders GROUP BY 1
        ),
        now_row AS (SELECT MAX(o_orderdate) AS now_ts FROM orders),
        scored AS (
            SELECT custkey,
                   CAST(DATE_DIFF('day', last_order, now_ts) AS INTEGER)
                       AS recency_days,
                   frequency, monetary
            FROM per_cust CROSS JOIN now_row
        ),
        tiles AS (
            SELECT custkey, recency_days, frequency, monetary,
                   CAST(NTILE({N_TILES}) OVER (
                       ORDER BY recency_days DESC, custkey ASC) AS INTEGER)
                       AS r_score,
                   CAST(NTILE({N_TILES}) OVER (
                       ORDER BY frequency ASC, custkey ASC) AS INTEGER)
                       AS f_score,
                   CAST(NTILE({N_TILES}) OVER (
                       ORDER BY monetary ASC, custkey ASC) AS INTEGER)
                       AS m_score
            FROM scored
        )
        SELECT custkey, recency_days, frequency, monetary,
               r_score, f_score, m_score,
               CASE
                   WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                       THEN 'champion'
                   WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
                   WHEN r_score <= 2 AND m_score >= 4
                       THEN 'at_risk_big_spender'
                   WHEN r_score <= 2 THEN 'hibernating'
                   ELSE 'regular'
               END AS segment
        FROM tiles
    """,
    # Mirrors operators/commerce.py basket_pairs: distinct
    # (order, item), pair counts via self-join, support filter, lift
    # from the same item universe.
    "basket_pairs": f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS orderkey, l_partkey AS item
            FROM lineitem
        ),
        n AS (SELECT COUNT(DISTINCT orderkey) AS n_orders FROM items),
        item_counts AS (
            SELECT item, COUNT(*) AS i_orders FROM items GROUP BY 1
        ),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_orders
            FROM items a JOIN items b
              ON a.orderkey = b.orderkey AND a.item < b.item
            GROUP BY 1, 2
            HAVING COUNT(*) >= {MIN_SUPPORT}
        )
        SELECT p.item_a, p.item_b,
               CAST(p.pair_orders AS BIGINT) AS pair_orders,
               {sql_round_half_up(
                   'p.pair_orders * 1.0 * n.n_orders / (ca.i_orders * cb.i_orders)',
                   6,
               )} AS lift
        FROM pairs p
        JOIN item_counts ca ON ca.item = p.item_a
        JOIN item_counts cb ON cb.item = p.item_b
        CROSS JOIN n
    """,
    # Mirrors operators/commerce.py decayed_daily_revenue: per-day
    # cents-rounded totals, then the decay join over day differences
    # 0..{DECAY_WINDOW_DAYS}-1 with the shared literal weight table
    # (alpha={DECAY}).
    "ewma_revenue": f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   {sql_round_half_up('SUM(o_totalprice)', 2)} AS revenue
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT day, revenue,
                   DATE_DIFF('day', DATE '1970-01-01', day) AS day_idx
            FROM daily
        ),
        w AS (SELECT {_WEIGHTS} AS weights),
        sm AS (
            SELECT c.day,
                   {sql_round_half_up(
                       'SUM(p.revenue * w.weights[(c.day_idx - p.day_idx) + 1])',
                       4,
                   )} AS decayed_revenue,
                   COUNT(*) AS days_in_window
            FROM idx c
            JOIN idx p
              ON c.day_idx - p.day_idx >= 0
             AND c.day_idx - p.day_idx < {DECAY_WINDOW_DAYS}
            CROSS JOIN w
            GROUP BY c.day, c.day_idx
        )
        SELECT d.day, d.revenue, s.decayed_revenue,
               CAST(s.days_in_window AS BIGINT) AS days_in_window
        FROM sm s JOIN daily d ON d.day = s.day
    """,
    # Mirrors operators/scd.py scd2_apply over the same
    # baseline + first-order-of-day update stream: version chain per
    # key ordered by (effective_from, source), lag-based change
    # suppression, lead-linked effective_to.
    "scd2_customer_dim": """
        WITH upd AS (
            SELECT c_custkey, segment, effective_from FROM (
                SELECT o_custkey AS c_custkey,
                       o_orderpriority AS segment,
                       CAST(o_orderdate AS DATE) AS effective_from,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
                           ORDER BY o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn = 1
        ),
        vers AS (
            SELECT c_custkey, c_mktsegment AS segment,
                   DATE '1990-01-01' AS effective_from, 0 AS src
            FROM customer
            UNION ALL
            SELECT c_custkey, segment, effective_from, 1 FROM upd
        ),
        lagged AS (
            SELECT *,
                   LAG(segment) OVER w AS prev_seg,
                   LAG(effective_from) OVER w AS prev_from
            FROM vers
            WINDOW w AS (PARTITION BY c_custkey
                         ORDER BY effective_from ASC, src ASC)
        ),
        kept AS (
            SELECT * FROM lagged
            WHERE prev_from IS NULL OR segment IS DISTINCT FROM prev_seg
        ),
        linked AS (
            SELECT c_custkey, segment, effective_from,
                   LEAD(effective_from) OVER (
                       PARTITION BY c_custkey
                       ORDER BY effective_from ASC, src ASC) AS effective_to
            FROM kept
        )
        SELECT c_custkey, segment, effective_from, effective_to,
               effective_to IS NULL AS is_current
        FROM linked
    """,
}


# The SCD2 oracle replayed as a dim subquery, then the same equi-join
# + half-open interval containment as operators/joins.py pit_join.
ORACLES["pit_join_orders"] = f"""
    WITH dim AS ({ORACLES["scd2_customer_dim"]})
    SELECT o.o_orderkey,
           o.o_custkey AS c_custkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           d.segment,
           d.effective_from
    FROM orders o
    JOIN dim d
      ON d.c_custkey = o.o_custkey
     AND CAST(o.o_orderdate AS DATE) >= d.effective_from
     AND (d.effective_to IS NULL
          OR CAST(o.o_orderdate AS DATE) < d.effective_to)
"""


def q_item_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (operators/commerce.py
    item_item_recs): top-5 recommendations per part by binary cosine
    over the order universe, ranked after 6-dp rounding so the order is
    engine-identical."""
    from ecommerce_dataengineering_project_spark.operators.commerce import (
        item_item_recs,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return item_item_recs(li, min_support=MIN_SUPPORT, k=5)


QUERIES["item_recommendations"] = q_item_recommendations

ORACLES["item_recommendations"] = f"""
    WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1),
    pairs AS (
        SELECT x.p AS a, y.p AS b, CAST(COUNT(*) AS BIGINT) AS support
        FROM op x JOIN op y ON x.o = y.o AND x.p < y.p
        GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SUPPORT}
    ),
    sym AS (
        SELECT a, b, support FROM pairs
        UNION ALL SELECT b AS a, a AS b, support FROM pairs
    ),
    scored AS (
        SELECT s.a, s.b, s.support,
               FLOOR(s.support / SQRT(ia.c * ib.c) * 1000000.0 + 0.5)
                   / 1000000.0 AS sim
        FROM sym s JOIN ic ia ON s.a = ia.p JOIN ic ib ON s.b = ib.p
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
        FROM scored
    )
    SELECT a AS item, b AS rec, support, sim FROM ranked WHERE rn <= 5
"""
