"""Time-series warehouse operators: calendar gap-fill with forward
fill, last-touch revenue attribution, and fixed-width histograms.

The reference's analytics layer stops at per-day rollups
(``models/daily_sales.sql``); these are the shapes a BI/warehouse user
asks for immediately after — a dense day spine (missing days matter for
charting and window math), marketing attribution over the event stream,
and a distribution summary of order values.

Scale notes (100 TB):
- The day spine is *date*-cardinality: even decades of data collapse to
  a few tens of thousands of rows before the single-partition ordered
  window runs, so the global forward-fill window is over an already
  collapsed relation — never over the fact table.
- Attribution is one exchange keyed by ``user_id`` (window + the later
  groupBy both reuse it via partial aggregation on the channel key).
- Histogram bounds travel as a broadcast 1-row relation, never via a
  driver collect; bin arithmetic is pure codegen.

Float policy: bin edges and widths are computed with the *same* IEEE
double operations in Spark and the DuckDB oracle (single multiply /
divide / floor), so bin assignment is bit-identical; revenue sums are
rounded half-up to cents only at the output boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.scalars import round_half_up


def daily_revenue(orders: DataFrame) -> DataFrame:
    """Per-day order revenue + counts (the sparse base for gap-fill)."""
    return orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        round_half_up(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def gapfill_daily(daily: DataFrame) -> DataFrame:
    """Densify a per-day aggregate onto the full calendar spine.

    Missing days get ``revenue = 0.0`` / ``n_orders = 0`` with
    ``is_gap = true``; ``carry_revenue`` forward-fills the last
    *observed* day's revenue (classic `last(..., ignorenulls)` fill).

    The spine is built with ``sequence(min_day, max_day)`` exploded from
    the 1-row bounds aggregate — no driver round-trip, no literal dates
    baked into the plan. The ordered window is partition-less by design:
    it runs on the date-cardinality spine (see module docstring), not on
    the fact table.
    """
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    joined = spine.join(F.broadcast(daily), "day", "left")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0).cast("bigint")).alias("n_orders"),
        F.last("revenue", ignorenulls=True).over(w).alias("carry_revenue"),
        F.col("n_orders").isNull().alias("is_gap"),
    )


def last_touch_attribution(
    events: DataFrame, purchase_type: str = "purchase"
) -> DataFrame:
    """Attribute each purchase's value to the user's most recent
    preceding non-purchase touch (``'direct'`` when none exists).

    One window pass partitioned by user (deterministic ``(ts,
    event_id)`` order), then a cents-rounded rollup per channel. The
    CASE inside ``last(..., ignorenulls)`` nulls out purchases
    themselves, so the frame ending at the current row never
    self-attributes.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.last(
        F.when(F.col("event_type") != purchase_type, F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    purchases = (
        events.select("user_id", "ts", "event_id", "event_type", "value")
        .withColumn("channel", F.coalesce(touch, F.lit("direct")))
        .filter(F.col("event_type") == purchase_type)
    )
    return purchases.groupBy("channel").agg(
        round_half_up(F.sum("value"), 2).alias("attributed_revenue"),
        F.count(F.lit(1)).alias("n_purchases"),
    )


def _clamped_bin(value: Column, lo: Column, width: Column, n_bins: int) -> Column:
    raw = F.floor((value - lo) / width).cast("int")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def histogram_fixed(df: DataFrame, col: str, n_bins: int) -> DataFrame:
    """Fixed-width histogram over the observed ``[min, max]`` range.

    Bounds come from a 1-row aggregate broadcast-joined back (never
    collected); ``bin = clamp(floor((v - lo) / width))`` so the max
    value lands in the last bin instead of one past it. Edges are
    emitted as doubles computed with single IEEE ops — reproducible
    bit-for-bit by any engine evaluating the same expression.
    """
    bounds = df.agg(
        F.min(col).alias("lo"),
        # zero-width guard: a constant column (max == min) would make
        # the bin expression divide by zero — an ERROR under Spark 4's
        # default ANSI mode. Width 1.0 puts every row in bin 0, the
        # right degenerate histogram.
        F.when(
            F.max(col) == F.min(col), F.lit(1.0)
        ).otherwise(
            (F.max(col) - F.min(col)) / F.lit(float(n_bins))
        ).alias("width"),
    )
    binned = df.join(F.broadcast(bounds)).select(
        _clamped_bin(F.col(col), F.col("lo"), F.col("width"), n_bins).alias("bin"),
        (F.col("lo") + _clamped_bin(F.col(col), F.col("lo"), F.col("width"), n_bins)
         * F.col("width")).alias("bin_lo"),
        F.col(col).alias("v"),
    )
    return binned.groupBy("bin", "bin_lo").agg(
        F.count(F.lit(1)).alias("n_rows"),
        round_half_up(F.sum("v"), 2).alias("sum_value"),
    )


def subsequence_match(
    series: DataFrame,
    pattern: list[float],
    day_col: str = "day",
    value_col: str = "n_orders",
    k: int = 5,
) -> DataFrame:
    """Z-normalized subsequence similarity search over a daily series
    (the UCR-suite / streaming-similarity-search shape — EDBT 2019
    "Time Series Similarity Search for Streaming Data in Distributed
    Systems" is the retrieved-paper reference): every length-L window
    of the series, z-normalized, scored by Euclidean distance against
    the z-normalized query pattern; top-k closest windows win.

    Scale shape: the SERIES is a post-aggregation, date-cardinality
    relation (thousands of rows at 100 TB — the fact scan that builds
    it is the heavy part and is a separate map-side-combined rollup),
    so the partition-less ordered window is deliberate, same as
    gapfill_daily. Windows ride ONE collect_list over a rows frame; the
    z-norm and distance are sequential codegen folds, bit-identical to
    a SQL oracle's LIST_REDUCE (flat windows — zero variance — znorm to
    0.0, the UCR convention). No Python anywhere."""
    L = len(pattern)
    win = F.collect_list(F.col(value_col).cast("double")).over(
        Window.orderBy(day_col).rowsBetween(0, L - 1)
    )
    df = (
        series.select(F.col(day_col).alias("start_day"), win.alias("w"))
        .where(F.size("w") == L)
    )

    def _fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    def _znorm(arr, mean, sd):
        return F.when(sd == 0.0, F.transform(arr, lambda x: F.lit(0.0))).otherwise(
            F.transform(arr, lambda x: (x - mean) / sd)
        )

    df = (
        df.withColumn("m", _fold_sum(F.col("w")) / L)
        .withColumn(
            "sd",
            F.sqrt(
                F.aggregate(
                    "w",
                    F.lit(0.0),
                    lambda acc, x: acc
                    + (x - F.col("m")) * (x - F.col("m")),
                )
                / L
            ),
        )
        .withColumn("zw", _znorm(F.col("w"), F.col("m"), F.col("sd")))
    )
    pat = F.array(*[F.lit(float(x)) for x in pattern])
    df = (
        df.withColumn("pm", _fold_sum(pat) / L)
        .withColumn(
            "psd",
            F.sqrt(
                F.aggregate(
                    pat,
                    F.lit(0.0),
                    lambda acc, x: acc
                    + (x - F.col("pm")) * (x - F.col("pm")),
                )
                / L
            ),
        )
        .withColumn("zp", _znorm(pat, F.col("pm"), F.col("psd")))
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("zw", "zp", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = df.select(
        "start_day", round_half_up(dist, 6).alias("distance")
    )
    w_rank = Window.orderBy(F.col("distance").asc(), F.col("start_day").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("int"))
        .where(F.col("rank") <= k)
    )
