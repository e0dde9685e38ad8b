"""Set-ops, sketch statistics, and the scalar pandas-UDF surface
(SURVEY §2g, §2j, §2k X5).

- intersect (§2g): the engine's third set operator next to union
  (union_segments) and except (except_antijoin) — exact oracle.
- approx_count_distinct / percentile_approx (X5): sketch results are
  engine-specific (HLL++ / GK parameters), so the query is rows-only
  for the driver; tests/test_stats.py bounds the sketch error against
  the exact values instead.
- exact distinct/percentile twin: the same statistics computed
  exactly — fully oracle-checked, and the baseline the sketch test
  compares against.
- scalar pandas UDF (§2j): the Arrow-vectorized Python path the
  reference never needed but the UDF surface requires; arithmetic is
  integer-derived so the oracle matches bit-for-bit — the check
  covers the Arrow batch plumbing end to end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ecommerce_dataengineering_project_spark.sources.readers import load_table


def q_intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with BOTH a fulfilled and an open order (§2g
    intersect; distinct semantics, one shuffle per side + sort-merge)."""
    o = load_table(spark, sf_dir, "orders")
    fulfilled = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    open_ = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return fulfilled.intersect(open_)


# GK accuracy for the registered sketch row, sized so relativeError*n
# <= 1 at every fixture decade (largest per-flag group: ~2M rows at
# sf1) — see q_approx_distinct_quantiles for why that makes the
# sketch answer EXACT. Production rolls back to the default 10000.
GK_ACC_EXACT = 10_000_000

# lgk for the oracle-graduated HLL arms: the exact coupon phase ends at
# hll_exact_boundary(lgk) = min(3*2^(lgk-3)/4, 24576) — the r13
# bisection correction of r12's ~3/8*2^lgk rule (operators/sketches.py
# module docstring). 19 sits ON the absolute coupon cap (24576), past
# every fixture-decade cardinality these queries sketch (10k suppliers
# per flag at sf1; 15k event users at sf1); lgk=16, the r12 choice,
# promotes to register mode at ~6.1k and silently left the exact phase
# at sf1. Production rolls back to DEFAULT_LGK=12 where ~1.6% rse is
# the accepted trade.
HLL_LGK_EXACT = 19


def q_approx_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 sketches per return flag: HLL distinct suppliers and GK
    quantiles of quantity. At 100 TB these are THE way to compute
    distincts/quantiles — fixed-size sketch state, map-side combined,
    no sort, no exact-distinct shuffle explosion.

    Graduated from rows-only to a hash-matched oracle (r13 — the
    segment_overlap_sketch / heavy_hitter_tokens move, third time)
    via each family's OWN exactness window:

    - HLL (DataSketches ``hll_sketch_agg``, lgk=HLL_LGK_EXACT): exact
      in the coupon phase (distincts < min(3·2^(lgk-3)/4, 24576) —
      the bisected r13 rule; 24576 at lgk=19). Per-flag distinct
      suppliers are 10/100/1k/10k across sf0.001→sf1 — every fixture
      decade is inside the phase. (Distinct ORDERS — 1.1k→1.1M —
      leave every possible phase at sf0.1, which is why the distinct
      arm rides l_suppkey; the exact twin keeps n_orders for the
      tradeoff.)
    - GK (``percentile_approx``, accuracy=GK_ACC_EXACT): Spark's
      QuantileSummaries merges adjacent samples only when
      g_i + g_{i+1} + delta < 2*relativeError*n; with accuracy >= n
      that threshold is < 2 while every g >= 1, so NO compression ever
      fires, all samples are retained exactly (g=1, delta=0 — merge
      order immaterial: partials concatenate sorted), and query(q)
      returns the element at rank ceil(q*n) — expressible as exact
      rank-pick SQL. Largest fixture group ~2M rows at sf1 < 10M.

    Below-window approximation quality (default accuracy / lgk=12 /
    cardinalities past the phase) stays pinned in tests/test_stats.py;
    the window preconditions fail loudly in
    tests/test_exactness_windows.py (ADVICE r12)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("l_suppkey", F.lit(HLL_LGK_EXACT))
        ).alias("approx_suppliers"),
        F.percentile_approx("l_quantity", 0.5, F.lit(GK_ACC_EXACT)).alias(
            "approx_median_qty"
        ),
        F.percentile_approx("l_quantity", 0.95, F.lit(GK_ACC_EXACT)).alias(
            "approx_p95_qty"
        ),
    )


def q_sketch_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 incremental layout: per-day DataSketches (HLL distinct
    users, KLL value quantiles) rolled up to one global row by sketch
    UNION — no rescan of raw rows. The pattern that replaces
    recompute-the-world at 100 TB; mergeability/accuracy contracts are
    pinned in tests/test_sketches.py.

    Rows-only BY NATURE — the exactness-window graduation that covered
    the other three sketch rows (VERDICT r12 item 2) is impossible
    here, specifically for the KLL arm: KLL is exact only while every
    item is retained (n <= k), Spark caps k at DataSketches' 65535,
    and the GLOBAL rollup merges every event row (100k at sf0.1, ~1M
    at sf1) through one sketch — past the cap, compaction fires and
    KLL compaction is RANDOMIZED (coin-flip odd/even survivor pick),
    so past-window values aren't even deterministic, let alone
    SQL-expressible. The HLL arm alone WOULD graduate (15k distinct
    users at sf1 < the 24576 coupon cap at lgk ≥ 19 — see
    HLL_LGK_EXACT), but a one-column graduation would drop the
    quantile surface this row exists to cover; the exact twins live in
    exact_distinct_quantiles / grouped_pandas_stats."""
    from ecommerce_dataengineering_project_spark.operators.sketches import (
        daily_sketches,
        rollup_sketches,
    )

    ev = load_table(spark, sf_dir, "events")
    return rollup_sketches(daily_sketches(ev, "ts", "user_id", "value"))


HH_K = 64
HH_TOP = 10


def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 frequent-items: approximate top document tokens via
    mergeable per-partition Misra-Gries summaries (see
    operators/sketches.py mg_summaries). Graduated from rows-only to a
    hash-matched oracle (r12, the segment_overlap_sketch move) via
    MG's own exactness property: with k at or above the distinct-key
    count a summary NEVER decrements, so per-partition weights are
    exact counts, every err row is 0, and the merged
    (weight_lb, count_ub) collapse to the true counts — the corpus
    vocabulary is 31 tokens at every fixture decade, k=64 covers it.
    Below-k approximation bounds (weights layout-dependent lower
    bounds) stay pinned in tests/test_sketches.py with k < vocab."""
    from ecommerce_dataengineering_project_spark.operators.sketches import heavy_hitters
    from ecommerce_dataengineering_project_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.repartition(8, "doc_id").select(
        F.explode(tokens("text")).alias("token")
    )
    return heavy_hitters(tok, "token", k=HH_K, top=HH_TOP)


def q_segment_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 set-ops-on-sketches: approximate distinct-user overlap
    between every pair of event-type segments (HLL inclusion-
    exclusion). Graduated from rows-only to a hash-matched oracle
    (VERDICT r11 item 9) via the sketch family's own exactness
    property: in the coupon phase HLL estimates — and their pairwise
    unions — are exact counts, so the exact inclusion-exclusion SQL IS
    the sketch's answer.

    lgk REWRITTEN 16→HLL_LGK_EXACT in r13: the TRUE phase boundary is
    min(3·2^(lgk-3)/4, 24576) — bisected this round, correcting r12's
    ~3/8·2^lgk rule — so lgk=16 actually left the exact phase at ~6.1k
    distincts and the documented "15k users at sf1" claim was FALSE
    (measured: est 15060 ≠ 15000 at sf1). At lgk=19 the boundary is
    the 24576 coupon cap, past every fixture decade (events: 150
    users/segment at sf0.01, 1.5k at sf0.1, 15k at sf1 — re-verified
    against exact SQL at sf1); production rolls back to the default
    lgk=12 where ~1.6% rse is the accepted trade. Coupon-phase
    exactness is pinned by tests/test_sketches.py, the per-decade
    precondition by tests/test_exactness_windows.py."""
    from ecommerce_dataengineering_project_spark.operators.sketches import segment_overlap

    ev = load_table(spark, sf_dir, "events")
    return segment_overlap(ev, "event_type", "user_id", lgk=HLL_LGK_EXACT)


def q_segment_overlap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact twin of segment_overlap_sketch (oracle-checked): a
    distinct self-join on the key — the shuffle-on-keys cost the
    sketch version exists to avoid; keeping both quantifies the
    tradeoff the same way approx/exact_distinct_quantiles do."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    a = du.select(
        F.col("event_type").alias("seg_a"), F.col("user_id").alias("user_id")
    )
    b = du.select(
        F.col("event_type").alias("seg_b"), F.col("user_id").alias("user_id")
    )
    return (
        a.join(b, "user_id")
        .where(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_common_keys"))
    )


def q_exact_distinct_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact twin of the sketch query (oracle-checked)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.median("l_quantity").alias("median_qty"),
    )


@F.pandas_udf(DoubleType())
def _verbosity_score(text: pd.Series) -> pd.Series:
    """chars-per-token density, computed vectorized in pandas (Arrow
    batches in/out; no per-row Python)."""
    n_chars = text.str.len()
    n_tokens = text.str.count(" ") + 1
    return n_chars / n_tokens


def q_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2j scalar pandas UDF over documents: integer-derived double
    arithmetic, so DuckDB reproduces it exactly."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _verbosity_score(F.col("text")).alias("verbosity"))


def q_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2j grouped-map applyInPandas: per-event-type stats computed in
    a pandas batch per group (the reference's IsolationForest shape —
    SURVEY §2j — generalized). Median arithmetic ((a+b)/2 on doubles)
    is exact in IEEE-754, so even this pandas path oracle-checks
    bit-for-bit. Keys here are low-cardinality; for high-cardinality
    keys the same call scales per-group across executors."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_events": [len(v)],
                "median_value": [float(np.median(v))],
                "value_range": [float(v.max() - v.min())],
            }
        )

    return ev.select("event_type", "value").groupBy("event_type").applyInPandas(
        stats,
        "event_type string, n_events long, median_value double, value_range double",
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation over the 3 hot return-flag keys
    (operators/skew.py): result identical to the plain GROUP BY —
    l_quantity is integral, so the re-associated double sums are exact.
    """
    from ecommerce_dataengineering_project_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li.select("l_returnflag", "l_quantity", "l_orderkey"),
        keys=["l_returnflag"],
        sums={"total_qty": "l_quantity", "n_rows": "1"},
        salt_src=["l_orderkey"],
    )


def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py salted_join): the events
    fact joined to the customer segment dim on user_id with the hot
    keys spread over 16 salted reducers — result identical to the
    plain join (the salt never reaches the output), which is exactly
    what the oracle checks. The scale case: a dim too big to
    broadcast feeding a co-partitioned downstream op, where AQE's
    skew splitting can't apply."""
    from ecommerce_dataengineering_project_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    return salted_join(ev, dim, on=["user_id"])


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel: a user converts at each stage
    only if the stage's FIRST event follows the previous stage's first
    event (ordered funnel, min-ts semantics). One conditional-agg
    shuffle by user, then a global rollup — no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    staged = per_user.select(
        F.col("t_view").isNotNull().alias("s1"),
        (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))).alias("s2"),
        (
            F.col("t_view").isNotNull()
            & (F.col("t_click") > F.col("t_view"))
            & (F.col("t_buy") > F.col("t_click"))
        ).alias("s3"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("s1").cast("long")).alias("n_viewed"),
        F.sum(F.col("s2").cast("long")).alias("n_clicked_after_view"),
        F.sum(F.col("s3").cast("long")).alias("n_purchased_after_click"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per subsequent active week. distinct(user, week) ->
    min-week cohort join -> count; the classic retention matrix."""
    ev = load_table(spark, sf_dir, "events")
    weeks = ev.select(
        "user_id", F.weekofyear("ts").alias("week")
    ).distinct()
    cohort = weeks.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


SESSION_GAP_MIN = 30


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (the batch twin of T6's session
    windows): a >30-min silence starts a new session. Classic
    lag -> new-session flag -> running-sum session id, then one
    grouped agg — two window passes over the SAME (user_id, ts)
    partitioning, so Spark shuffles once and sorts once; at 100 TB
    this is a single exchange keyed by user."""
    from ecommerce_dataengineering_project_spark.functions.scalars import round_half_up
    from pyspark.sql import Window

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > gap_us)
    ).cast("int")
    sess = e.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    dur_sec = (
        F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start"))
    ) / F.lit(1_000_000.0)
    return (
        sess.groupBy("user_id", F.col("session_seq").cast("int").alias("session_seq"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            round_half_up(F.sum("value"), 2).alias("session_value"),
        )
        .withColumn("duration_sec", round_half_up(dur_sec, 6))
    )


SAMPLE_RATES = {"A": 100, "N": 50, "R": 200}  # permille per return flag


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified hash sampling (map-only, reproducible,
    engine-portable — see operators/sampling.py). Downsample per
    return flag at 10% / 5% / 20%."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        stratified_hash_sample,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return stratified_hash_sample(
        li.select("l_orderkey", "l_linenumber", "l_returnflag"),
        key_cols=["l_orderkey", "l_linenumber"],
        strata_col="l_returnflag",
        permille_by_stratum=SAMPLE_RATES,
    )


QUERIES = {
    "funnel_conversion": q_funnel_conversion,
    "sessionize_events": q_sessionize_events,
    "sample_stratified": q_sample_stratified,
    "cohort_retention": q_cohort_retention,
    "intersect_segments": q_intersect_segments,
    "approx_distinct_quantiles": q_approx_distinct_quantiles,  # oracle: exactness windows
    "sketch_incremental_rollup": q_sketch_incremental_rollup,  # rows-only: sketches
    "segment_overlap_sketch": q_segment_overlap_sketch,  # oracle: exact in coupon phase
    "heavy_hitter_tokens": q_heavy_hitter_tokens,  # oracle: exact at k >= vocab
    "segment_overlap_exact": q_segment_overlap_exact,
    "exact_distinct_quantiles": q_exact_distinct_quantiles,
    "pandas_udf_score": q_pandas_udf_score,
    "grouped_pandas_stats": q_grouped_pandas_stats,
    "skew_salted_agg": q_skew_salted_agg,
    "skew_salted_join": q_skew_salted_join,
}

_SAMPLE_RATE_CASE = "CASE l_returnflag " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
) + " ELSE 0 END"

ORACLES = {
    "sample_stratified": f"""
        SELECT l_orderkey, l_linenumber, l_returnflag
        FROM lineitem
        WHERE CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'sample',
                  CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR))),
                  1, 15)) AS BIGINT) % 1000 < {_SAMPLE_RATE_CASE}
    """,
    "sessionize_events": f"""
        WITH o AS (
            SELECT event_id, user_id, ts, value,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) AS prev_ts
            FROM events
        ),
        m AS (
            SELECT *,
                   CASE WHEN prev_ts IS NULL
                             OR DATE_DIFF('microsecond', prev_ts, ts)
                                > {SESSION_GAP_MIN * 60 * 1000000}
                        THEN 1 ELSE 0 END AS is_new
            FROM o
        ),
        s AS (
            SELECT *,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts ASC, event_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM m
        ),
        g AS (
            SELECT user_id,
                   CAST(session_seq AS INTEGER) AS session_seq,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS session_value
            FROM s GROUP BY 1, 2
        )
        SELECT user_id, session_seq, session_start, session_end, n_events,
               session_value,
               FLOOR((DATE_DIFF('microsecond', session_start, session_end)
                      / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS duration_sec
        FROM g
    """,
    "segment_overlap_exact": """
        WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS seg_a, b.event_type AS seg_b,
               COUNT(*) AS n_common_keys
        FROM du a JOIN du b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    # Valid while the lgk=HLL_LGK_EXACT sketches stay in their exact
    # coupon phase (distincts < the 24576 coupon cap — every fixture
    # decade; see the query docstring and the r13 boundary
    # correction): there, HLL estimates and their unions ARE the exact
    # counts, so inclusion-exclusion reduces to this exact SQL. The
    # all-pairs frame (counts x counts, LEFT JOIN common) keeps
    # zero-overlap pairs, mirroring the operator's non-equi pair join.
    "segment_overlap_sketch": """
        WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        counts AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM du GROUP BY 1
        ),
        common AS (
            SELECT a.event_type AS seg_a, b.event_type AS seg_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM du a JOIN du b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT ca.event_type AS seg_a, cb.event_type AS seg_b,
               ca.n AS approx_keys_a, cb.n AS approx_keys_b,
               CAST(COALESCE(c.n_common, 0) AS BIGINT) AS approx_common_keys
        FROM counts ca JOIN counts cb ON ca.event_type < cb.event_type
        LEFT JOIN common c
          ON c.seg_a = ca.event_type AND c.seg_b = cb.event_type
    """,
    # Valid while k >= the corpus vocabulary (31 tokens at every
    # fixture decade; see the query docstring): MG never decrements,
    # weights are exact counts, every err row is 0, so both bounds
    # equal the true count and the top-10 pick is the exact order.
    "heavy_hitter_tokens": """
        WITH c AS (
            SELECT w AS key, CAST(COUNT(*) AS BIGINT) AS weight_lb
            FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
            GROUP BY 1
        )
        SELECT key, weight_lb, weight_lb AS count_ub
        FROM c ORDER BY weight_lb DESC, key ASC LIMIT 10
    """,
    "funnel_conversion": """
        WITH u AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
            FROM events GROUP BY 1
        )
        SELECT COUNT(*) AS n_users,
               CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_viewed,
               CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_clicked_after_view,
               CAST(SUM(CASE WHEN t_click > t_view AND t_buy > t_click
                         THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_purchased_after_click
        FROM u
    """,
    "cohort_retention": """
        WITH w AS (SELECT DISTINCT user_id,
                          CAST(WEEKOFYEAR(ts) AS INTEGER) AS week FROM events),
        c AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY 1)
        SELECT c.cohort_week, w.week, COUNT(DISTINCT w.user_id) AS n_active
        FROM w JOIN c ON w.user_id = c.user_id
        GROUP BY 1, 2
    """,
    "intersect_segments": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "exact_distinct_quantiles": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               MEDIAN(l_quantity) AS median_qty
        FROM lineitem GROUP BY 1
    """,
    # Valid inside BOTH exactness windows (see the query docstring):
    # lgk=HLL_LGK_EXACT HLL in the coupon phase (per-flag distinct
    # suppliers 10..10k across every fixture decade, < the 24576
    # coupon cap) estimates the exact distinct count, and GK at
    # accuracy >= n never compresses, so percentile_approx(q) IS the
    # element at rank ceil(q*n) — picked here explicitly.
    "approx_distinct_quantiles": """
        WITH ranked AS (
            SELECT l_returnflag, l_quantity,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_quantity) AS rn,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        ),
        ds AS (
            SELECT l_returnflag,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS approx_suppliers
            FROM lineitem GROUP BY 1
        )
        SELECT r.l_returnflag,
               MAX(ds.approx_suppliers) AS approx_suppliers,
               MAX(CASE WHEN rn = CEIL(0.5 * n) THEN l_quantity END)
                   AS approx_median_qty,
               MAX(CASE WHEN rn = CEIL(0.95 * n) THEN l_quantity END)
                   AS approx_p95_qty
        FROM ranked r JOIN ds USING (l_returnflag)
        GROUP BY 1
    """,
    "pandas_udf_score": """
        SELECT doc_id,
               LENGTH(text) * 1.0 / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                   AS verbosity
        FROM documents
    """,
    "grouped_pandas_stats": """
        SELECT event_type,
               COUNT(*) AS n_events,
               MEDIAN(value) AS median_value,
               MAX(value) - MIN(value) AS value_range
        FROM events GROUP BY 1
    """,
    # Salting never reaches the output: the salted join IS the join.
    "skew_salted_join": """
        SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment AS mktsegment
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
    """,
    "skew_salted_agg": """
        SELECT l_returnflag,
               SUM(l_quantity) AS total_qty,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1
    """,
}


PATH_LEN = 3
PATH_TOP_K = 20


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey mining: the top starting event-type paths (first
    PATH_LEN events of each gap-based session, '>'-joined) with session
    counts — the path-analysis query a product team runs on exactly the
    sessionize relation. Same one-exchange sessionization as
    `sessionize_events`; path extraction sorts each session's (tiny)
    struct array map-side, never a second window pass."""
    from pyspark.sql import Window

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)) > gap_us)
    ).cast("int")
    sess = e.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.expr(
                "transform(slice(array_sort(collect_list("
                "struct(ts, event_id, event_type))), 1, "
                f"{PATH_LEN}), x -> x.event_type)"
            ),
        ).alias("path")
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(PATH_TOP_K)
    )


QUERIES["session_paths"] = q_session_paths

ORACLES["session_paths"] = f"""
    WITH o AS (
        SELECT event_id, user_id, ts, event_type,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts ASC, event_id ASC) AS prev_ts
        FROM events
    ),
    m AS (
        SELECT *,
               CASE WHEN prev_ts IS NULL
                         OR DATE_DIFF('microsecond', prev_ts, ts)
                            > {SESSION_GAP_MIN * 60 * 1000000}
                    THEN 1 ELSE 0 END AS is_new
        FROM o
    ),
    s AS (
        SELECT *,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM m
    ),
    per_session AS (
        SELECT user_id, session_seq,
               ARRAY_TO_STRING(
                   (LIST(event_type ORDER BY ts ASC, event_id ASC))[1:{PATH_LEN}],
                   '>') AS path
        FROM s GROUP BY 1, 2
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM per_session
    GROUP BY 1
    ORDER BY n_sessions DESC, path ASC
    LIMIT {PATH_TOP_K}
"""


def q_cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2j cogrouped-map arm (the one applyInPandas shape the registry
    lacked): ``groupBy(user).cogroup(groupBy(user)).applyInPandas`` —
    the engine co-shuffles BOTH relations on the key, hands each user's
    purchases and clicks to one Arrow-batched pandas call, and
    ``merge_asof`` attaches the most recent prior click value to every
    purchase. The per-key two-sided custom merge that neither a join
    nor a grouped map expresses alone; J2's as-of semantics on the
    cogroup plan. Ties on click ts break to the highest event id (right
    side sorted (ts, event_id); merge_asof keeps the last qualifying
    row) — the oracle's ORDER BY ts DESC, event_id DESC LIMIT 1."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    # the user_id % 4 slice bounds the per-group Python call count at
    # bench scale; every retained user exercises the full two-sided
    # merge (grouped-apply overhead is per GROUP, and the demo needs
    # breadth of groups less than it needs bounded wall-clock)
    keep = F.col("user_id") % 4 == 0
    purchases = ev.where((F.col("event_type") == "purchase") & keep).select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where((F.col("event_type") == "click") & keep).select(
        "user_id", "ts", "event_id", "value"
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # Pure-ndarray per-group body (r16, guide §4.2): the cogrouped
        # surface is the arm's point, but the per-GROUP fixed cost is
        # what dominates it (hundreds of small groups; the pandas
        # sort_values/rename/merge_asof chain measured ~8 ms/group).
        # lexsort + searchsorted express the same backward as-of:
        # among clicks with ts <= purchase ts take the last in
        # (ts, event_id) order — the oracle's ORDER BY ts DESC,
        # event_id DESC LIMIT 1. Unmatched purchases keep NaN->NULL,
        # exactly what merge_asof produced.
        import numpy as np

        l_eid = left["event_id"].to_numpy()
        l_uid = left["user_id"].to_numpy()
        if len(right):
            l_ts = left["ts"].astype("int64").to_numpy()
            r_ts = right["ts"].astype("int64").to_numpy()
            r_eid = right["event_id"].to_numpy()
            r_val = right["value"].to_numpy(dtype="float64")
            order = np.lexsort((r_eid, r_ts))
            r_ts = r_ts[order]
            r_val = r_val[order]
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            vals = np.where(idx >= 0, r_val[np.maximum(idx, 0)], np.nan)
        else:
            vals = np.full(len(left), np.nan)
        return pd.DataFrame(
            {"event_id": l_eid, "user_id": l_uid, "last_click_value": vals},
            copy=False,
        )

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof, "event_id BIGINT, user_id BIGINT, last_click_value DOUBLE"
        )
    )


QUERIES["cogroup_asof_pandas"] = q_cogroup_asof_pandas

ORACLES["cogroup_asof_pandas"] = """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase' AND user_id % 4 = 0),
    c AS (SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'click' AND user_id % 4 = 0)
    SELECT p.event_id, p.user_id,
           (SELECT c.value FROM c
            WHERE c.user_id = p.user_id AND c.ts <= p.ts
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_value
    FROM p
"""


def q_observed_dq_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass observability: ``df.observe`` attaches named metrics
    (row count, null count, value sum in exact cents) that the engine
    collects AS A SIDE EFFECT of the main job — zero extra scans, the
    production answer to "emit DQ counters from the pipeline run
    itself" (X18's table_profile re-scans; this rides along). The
    observed job here is a routine projection+filter pass; the metrics
    row is the query result, oracle-checked like any relation."""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation()
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("props").isNull().cast("bigint")).alias("null_props"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "total_cents"
        ),
    )
    # the "real" job: write-shaped pass (noop action materializes it)
    observed.where(F.col("event_type") != "__none__").write.format(
        "noop"
    ).mode("overwrite").save()
    row = obs.get
    return spark.createDataFrame(
        [(row["n_rows"], row["null_props"], row["total_cents"])],
        "n_rows BIGINT, null_props BIGINT, total_cents BIGINT",
    )


QUERIES["observed_dq_metrics"] = q_observed_dq_metrics

ORACLES["observed_dq_metrics"] = """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
"""


def q_arrow_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2j newest arm (Spark 4.1 ``arrow_udf``): a NATIVE-Arrow scalar
    UDF — pyarrow arrays in, pyarrow array out, no pandas conversion
    layer at all (the fourth vectorized-Python shape beside pandas UDF
    / mapInPandas / mapInArrow). Whitespace token counting via Arrow's
    own compute kernels; integer results, exact oracle."""
    # module-level pyarrow import: the UDF's type hints are strings
    # under `from __future__ import annotations`, and Spark resolves
    # them against the function's module globals
    global pa
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udf

    @arrow_udf("int")
    def tok_count(text: pa.Array) -> pa.Array:
        # arrow kernels end-to-end: split on whitespace, count items
        return pc.cast(pc.list_value_length(pc.ascii_split_whitespace(text)), pa.int32())

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tok_count(F.col("text")).alias("n_tokens")
    )


QUERIES["arrow_udf_tokens"] = q_arrow_udf_tokens

ORACLES["arrow_udf_tokens"] = """
    SELECT doc_id,
           CAST(length(list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                                   x -> x <> '')) AS INT) AS n_tokens
    FROM documents
"""
