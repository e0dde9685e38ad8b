"""Time-series / BI queries (operators/timeseries.py): calendar
gap-fill with forward fill, last-touch attribution, fixed-width
histogram. All three fully oracle-checked.

Reference parity: the reference's analytics layer is the per-day
revenue rollup (``dbt/models/daily_sales.sql``); these extend it with
the dense-calendar, attribution, and distribution shapes a warehouse
user layers on top of exactly that rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.scalars import sql_round_half_up
from ecommerce_dataengineering_project_spark.operators.timeseries import (
    daily_revenue,
    gapfill_daily,
    histogram_fixed,
    last_touch_attribution,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table

N_BINS = 20


def q_gapfill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return gapfill_daily(daily_revenue(orders))


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return last_touch_attribution(events)


def q_revenue_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return histogram_fixed(orders, "o_totalprice", N_BINS)


QUERIES = {
    "gapfill_daily_revenue": q_gapfill_daily_revenue,
    "attribution_last_touch": q_attribution_last_touch,
    "revenue_histogram": q_revenue_histogram,
}

ORACLES = {
    "gapfill_daily_revenue": f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   {sql_round_half_up('SUM(o_totalprice)', 2)} AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        ),
        bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        spine AS (
            SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds
        )
        SELECT s.day,
               COALESCE(d.revenue, 0.0) AS revenue,
               COALESCE(d.n_orders, CAST(0 AS BIGINT)) AS n_orders,
               LAST_VALUE(d.revenue IGNORE NULLS) OVER (
                   ORDER BY s.day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS carry_revenue,
               (d.n_orders IS NULL) AS is_gap
        FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
    "attribution_last_touch": f"""
        WITH touched AS (
            SELECT event_type, value,
                   LAST_VALUE(
                       CASE WHEN event_type <> 'purchase' THEN event_type END
                       IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS last_touch
            FROM events
        )
        SELECT COALESCE(last_touch, 'direct') AS channel,
               {sql_round_half_up('SUM(value)', 2)} AS attributed_revenue,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM touched
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    "revenue_histogram": f"""
        WITH bounds AS (
            SELECT MIN(o_totalprice) AS lo,
                   CASE WHEN MAX(o_totalprice) = MIN(o_totalprice) THEN 1.0
                        ELSE (MAX(o_totalprice) - MIN(o_totalprice))
                             / {float(N_BINS)}
                   END AS width
            FROM orders
        ),
        binned AS (
            SELECT LEAST(GREATEST(CAST(FLOOR((o_totalprice - lo) / width)
                       AS INTEGER), 0), {N_BINS - 1}) AS bin,
                   lo + LEAST(GREATEST(CAST(FLOOR((o_totalprice - lo) / width)
                       AS INTEGER), 0), {N_BINS - 1}) * width AS bin_lo,
                   o_totalprice AS v
            FROM orders CROSS JOIN bounds
        )
        SELECT CAST(bin AS INTEGER) AS bin, bin_lo,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {sql_round_half_up('SUM(v)', 2)} AS sum_value
        FROM binned GROUP BY 1, 2
    """,
}


def q_incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily-revenue
    gold table kept fresh from mergeable partials. Orders are split by
    key parity into a "historical base" and a "new batch" — every day
    has rows in BOTH halves, so the refresh genuinely merges partial
    states rather than appending disjoint days. The result must equal
    (and the oracle IS) the full recompute over all orders; the refresh
    path never rescans base facts, only date-cardinality partials."""
    from ecommerce_dataengineering_project_spark.operators.aggregates import (
        merge_partials,
        mergeable_partials,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 2 == 0)
    batch = orders.where(F.col("o_orderkey") % 2 == 1)
    return merge_partials(
        mergeable_partials(base, "o_orderdate", "o_totalprice"),
        mergeable_partials(batch, "o_orderdate", "o_totalprice"),
    )


QUERIES["incremental_mv_refresh"] = q_incremental_mv_refresh

ORACLES["incremental_mv_refresh"] = f"""
    SELECT CAST(o_orderdate AS DATE) AS day,
           {sql_round_half_up('SUM(o_totalprice)', 2)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
"""


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram — the optimizer-stats
    twin of the fixed-width `revenue_histogram`: 20 ntile buckets of
    order value with per-bucket bounds and mass. ntile's equal-split-
    remainder-first semantics are standard SQL, and the (value, key)
    tiebreak makes bucket assignment engine-identical. The global rank
    runs on the per-order relation (same caveat + contract as
    rfm_segments' ntiles)."""
    from pyspark.sql import Window

    from ecommerce_dataengineering_project_spark.functions.scalars import (
        round_half_up,
    )

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("bucket", F.ntile(N_BINS).over(w))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            round_half_up(F.sum("o_totalprice"), 2).alias("sum_value"),
        )
    )


QUERIES["equidepth_histogram"] = q_equidepth_histogram

ORACLES["equidepth_histogram"] = f"""
    WITH b AS (
        SELECT o_totalprice,
               NTILE({N_BINS}) OVER (
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           {sql_round_half_up('SUM(o_totalprice)', 2)} AS sum_value
    FROM b GROUP BY 1
"""


TS_PATTERN = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 10.0]  # ramp-then-spike
TS_TOPK = 5


def q_ts_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-normalized subsequence similarity search
    (operators/timeseries.py subsequence_match): the top-5 seven-day
    windows of the gap-filled daily order-count series closest in
    shape to a ramp-then-spike query pattern. Every stage — window
    build, z-norm, distance — is a codegen fold over the
    date-cardinality series, bit-identical to the DuckDB LIST_REDUCE
    oracle."""
    from ecommerce_dataengineering_project_spark.operators.timeseries import (
        subsequence_match,
    )

    orders = load_table(spark, sf_dir, "orders")
    series = gapfill_daily(daily_revenue(orders)).select("day", "n_orders")
    return subsequence_match(series, TS_PATTERN, k=TS_TOPK)


QUERIES["ts_pattern_match"] = q_ts_pattern_match


def _ts_pattern_oracle() -> str:
    L = len(TS_PATTERN)
    pat = "[" + ", ".join(repr(x) for x in TS_PATTERN) + "]"
    return f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        ),
        bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
        spine AS (
            SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds
        ),
        series AS (
            SELECT s.day, CAST(COALESCE(d.n_orders, 0) AS DOUBLE) AS n
            FROM spine s LEFT JOIN daily d ON s.day = d.day
        ),
        wins AS (
            SELECT day AS start_day,
                   LIST(n) OVER (ORDER BY day ASC
                                 ROWS BETWEEN CURRENT ROW
                                 AND {L - 1} FOLLOWING) AS w
            FROM series
        ),
        fw AS (SELECT * FROM wins WHERE LEN(w) = {L}),
        st AS (
            SELECT start_day, w,
                   LIST_REDUCE(w, (x, y) -> x + y) / {L} AS m
            FROM fw
        ),
        st2 AS (
            SELECT *,
                   SQRT(LIST_REDUCE(LIST_TRANSFORM(w, x -> (x - m) * (x - m)),
                                    (x, y) -> x + y) / {L}) AS sd
            FROM st
        ),
        z AS (
            SELECT start_day,
                   CASE WHEN sd = 0 THEN LIST_TRANSFORM(w, x -> 0.0)
                        ELSE LIST_TRANSFORM(w, x -> (x - m) / sd) END AS zw
            FROM st2
        ),
        p0 AS (SELECT CAST({pat} AS DOUBLE[]) AS pw),
        p1 AS (SELECT pw, LIST_REDUCE(pw, (x, y) -> x + y) / {L} AS pm FROM p0),
        p2 AS (
            SELECT pw, pm,
                   SQRT(LIST_REDUCE(LIST_TRANSFORM(pw, x -> (x - pm) * (x - pm)),
                                    (x, y) -> x + y) / {L}) AS psd
            FROM p1
        ),
        pz AS (
            SELECT CASE WHEN psd = 0 THEN LIST_TRANSFORM(pw, x -> 0.0)
                        ELSE LIST_TRANSFORM(pw, x -> (x - pm) / psd) END AS zp
            FROM p2
        ),
        scored AS (
            SELECT start_day,
                   FLOOR(SQRT(LIST_REDUCE(
                       LIST_TRANSFORM(LIST_ZIP(zw, zp),
                                      t -> (t[1] - t[2]) * (t[1] - t[2])),
                       (x, y) -> x + y)) * 1000000.0 + 0.5) / 1000000.0
                       AS distance
            FROM z, pz
        )
        SELECT start_day, distance, CAST(rn AS INTEGER) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY distance ASC,
                                           start_day ASC) AS rn
              FROM scored)
        WHERE rn <= {TS_TOPK}
    """


ORACLES["ts_pattern_match"] = _ts_pattern_oracle()
