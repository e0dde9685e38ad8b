"""Mergeable sketch aggregation — the incremental-rollup pattern
(SURVEY §2k X5 extension).

At 100 TB you never recompute a global distinct count or quantile from
raw data: each ingest partition (a day, an hour) persists a tiny
mergeable sketch next to its rows, and every rollup — weekly, monthly,
all-time — unions sketches instead of rescanning events. Spark 4 ships
the Apache DataSketches aggregates (``hll_*``, ``kll_*``) as built-in
JVM expressions; all of them run with map-side partial aggregation, so
the daily sketch pass is one shuffle of KB-sized state and the rollup
reads KBs, not TBs.

Exactness notes pinned by tests/test_sketches.py:
- HLL union is LOSSLESS at equal lgConfigK: estimate(union(daily)) ==
  estimate(sketch(all rows)) exactly, which is what makes the
  incremental layout safe — the rollup answer never drifts from the
  recompute answer.
- Below ``hll_exact_boundary(lgk) = min(3·2^(lgk-3)/4, 24576)``
  distinct values the HLL sketch is still in its exact (coupon
  list/set) phase, so small-partition estimates are exact counts —
  relevant when validating against small fixtures. The rule has TWO
  terms (r13 correction — r12 used ~3/8·2^lgk, which is wrong for
  lgk ≥ 16 and silently broke exactness claims at sf1): the coupon
  SET promotes to HLL register mode at 3/4 of its 2^(lgk-3) slot
  budget, AND the coupon array is capped at 2^15 slots for any lgk.
  Measured by bisection on this build: lgk=14→1544, 16→6339,
  17→12290, 18→24594, 19–21→24576 (the few-past-rule tail is where
  the freshly-promoted HLL estimate still rounds exact — never rely
  on it).

Oracle posture: DuckDB's approx_count_distinct is a different sketch
family (its estimates differ by design), so estimate-producing queries
are rows-only for the driver — EXCEPT where the coupon-phase exactness
property applies: segment_overlap at an lgk whose coupon phase covers
the corpus is bit-equal to exact inclusion-exclusion SQL and is
oracle-checked (queries/ext_stats.py segment_overlap_sketch). The
mergeability and accuracy contracts are pinned locally either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12

# The coupon array's absolute slot cap (2^15), times the 3/4 load
# factor at which a coupon set promotes to HLL register mode.
_HLL_COUPON_CAP = 3 * (1 << 15) // 4  # 24576


def hll_exact_boundary(lgk: int) -> int:
    """Largest distinct count at which a DataSketches HLL sketch at
    ``lgk`` is STILL GUARANTEED in its exact coupon phase (see the
    module docstring's measured bisection): the SET promotes at 3/4 of
    its 2^(lgk-3) slot budget, and the coupon array itself is capped
    at 2^15 slots for any lgk."""
    return min(3 * (1 << (lgk - 3)) // 4, _HLL_COUPON_CAP)


def daily_sketches(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One row per day carrying mergeable sketch state: an HLL sketch
    of distinct ``key_col`` values, a KLL sketch of the ``value_col``
    distribution, and the exact row count. This is the table you
    PERSIST alongside the raw partition at scale (binary columns;
    a few KB per day regardless of row count)."""
    return df.groupBy(F.to_date(ts_col).alias("day")).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("key_hll"),
        F.kll_sketch_agg_double(value_col).alias("value_kll"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def rollup_sketches(
    daily: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Collapse per-day sketch rows into one global row WITHOUT
    touching raw data: HLL union for distincts, KLL merge for
    quantiles. The input is |days| rows of KB state — at 100 TB this
    runs on a laptop."""
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("key_hll")).alias("approx_distinct_keys"),
        # kll_sketch_merge_double is a binary scalar (no agg form in
        # Spark 4.1): fold the collected per-day sketches — bounded at
        # one KB-sized element per day, so the array stays tiny even
        # over years of partitions.
        F.collect_list("value_kll").alias("klls"),
        F.sum("n_rows").alias("n_rows"),
    ).withColumn(
        "value_kll",
        # try_element_at: an EMPTY daily table (0 sketch rows) must
        # roll up to a null-sketch row, not raise INVALID_ARRAY_INDEX
        # under ANSI mode; the quantile getters then yield nulls.
        # Poison density (the authoring rule): this try_* evaluates
        # ONCE per rollup (a one-row relation), and the caught path
        # fires only on an empty input — zero per-row exception cost
        # by construction, unlike a row-wise try_* arm.
        F.expr(
            "reduce(slice(klls, 2, greatest(size(klls) - 1, 0)), "
            "try_element_at(klls, 1), (acc, x) -> kll_sketch_merge_double(acc, x))"
        ),
    )
    cols = [
        "approx_distinct_keys",
        "n_rows",
        *[
            F.kll_sketch_get_quantile_double("value_kll", F.lit(q)).alias(
                f"value_p{int(round(q * 100))}"
            )
            for q in quantiles
        ],
    ]
    return merged.select(*cols)


def segment_overlap(
    df: DataFrame,
    seg_col: str,
    key_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Approximate distinct-key overlap between every pair of segments
    via HLL inclusion-exclusion: ``|A ∩ B| ≈ |A| + |B| - |A ∪ B|``,
    with the union computed sketch-side (``hll_union``) — the
    audience-overlap / cross-corpus-contamination question answered
    WITHOUT an exact distinct self-join. At scale: one partial-agg
    pass builds a KB-sized sketch per segment; the pairwise join runs
    over |segments| rows (broadcast-tiny), never over the keys.

    Output per (seg_a < seg_b) pair: the two segment cardinality
    estimates and the approximate overlap. Estimates are exact while
    sketches are in the coupon phase (tested); beyond it, error is the
    usual ~1.6% rse at lgk=12 compounded by the subtraction."""
    sk = df.groupBy(F.col(seg_col).alias("seg")).agg(
        F.hll_sketch_agg(key_col, F.lit(lgk)).alias("hll")
    )
    a = sk.select(
        F.col("seg").alias("seg_a"),
        F.col("hll").alias("hll_a"),
    )
    b = sk.select(
        F.col("seg").alias("seg_b"),
        F.col("hll").alias("hll_b"),
    )
    pairs = a.join(b, F.col("seg_a") < F.col("seg_b"))
    n_a = F.hll_sketch_estimate("hll_a")
    n_b = F.hll_sketch_estimate("hll_b")
    n_union = F.hll_sketch_estimate(F.hll_union("hll_a", "hll_b"))
    return pairs.select(
        "seg_a",
        "seg_b",
        n_a.alias("approx_keys_a"),
        n_b.alias("approx_keys_b"),
        # clamp at 0: past the coupon phase the three estimates are
        # each ~1.6% rse and the subtraction can dip negative for
        # near-disjoint segments — a nonsensical cardinality.
        F.greatest(F.lit(0).cast("bigint"), n_a + n_b - n_union).alias(
            "approx_common_keys"
        ),
    )


def daily_sketch_report(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Driver-hashable per-day readout of the sketch table (no binary
    columns): day, exact row count, HLL distinct-key estimate, KLL
    median. The companion query shape for dashboards over the
    persisted sketch partitions."""
    daily = daily_sketches(df, ts_col, key_col, value_col, lgk)
    return daily.select(
        "day",
        "n_rows",
        F.hll_sketch_estimate("key_hll").alias("approx_distinct_keys"),
        F.kll_sketch_get_quantile_double("value_kll", F.lit(0.5)).alias("value_p50"),
    )


def mg_summaries(
    df: DataFrame,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-partition Misra-Gries frequent-items summaries — the
    mergeable heavy-hitters sketch completing the family (HLL =
    distincts, KLL = quantiles, MG = top keys). Each input partition
    reduces to at most ``k`` ``(key, weight)`` rows plus one
    ``(NULL, err)`` accounting row; weights are LOWER bounds on the
    partition-local counts, undercounting by at most ``err`` (and
    ``err <= n_partition / (k + 1)`` by the MG mass argument: every
    unit of err subtracts from at least k+1 counters at once).

    The batch-compress variant runs vectorized: count each Arrow batch
    exactly with pandas ``value_counts`` (vocabulary per batch is
    bounded by batch rows), fold into the running counters, and when
    the counter set exceeds ``k`` subtract the (k+1)-th largest weight
    from everything and drop the non-positive — a decrement in bulk,
    identical guarantee, no per-row Python loop.

    At 100 TB: this is ``mapInPandas`` over the natural ingest
    partitioning (no shuffle), emitting KBs per partition; persist the
    summaries next to the partition like the HLL/KLL state and merge
    at read time (``mg_merge``)."""

    def summarize(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        err = 0
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            for key, c in vc.items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                err += cut
                counters = {
                    key: w - cut for key, w in counters.items() if w > cut
                }
        keys = list(counters)
        yield pd.DataFrame(
            {
                "key": keys + [None],
                "weight": [counters[key] for key in keys] + [err],
            }
        )

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, schema="key string, weight long"
    )


def mg_merge(summaries: DataFrame, top: int | None = None) -> DataFrame:
    """Union Misra-Gries summaries into global heavy-hitter bounds:
    ``weight_lb = sum of per-partition weights`` (a lower bound on the
    true count) and ``count_ub = weight_lb + sum of all err rows`` (an
    upper bound — a key missed by a partition's summary lost at most
    that partition's err). Any key with true global count above
    ``n / (k + 1)`` is guaranteed present: its total undercount is at
    most the summed err, which that mass bound caps below its count.

    The input is |partitions| x (k + 1) rows of KB state, so the merge
    groupBy is sketch-sized, never data-sized. ``top`` optionally
    truncates to the heaviest keys AFTER bounds are computed (ordered
    by weight_lb desc, key asc for determinism)."""
    total_err = summaries.where(F.col("key").isNull()).agg(
        F.coalesce(F.sum("weight"), F.lit(0)).alias("__total_err")
    )
    merged = (
        summaries.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.sum("weight").alias("weight_lb"))
        .join(F.broadcast(total_err))
        .select(
            "key",
            "weight_lb",
            (F.col("weight_lb") + F.col("__total_err")).alias("count_ub"),
        )
    )
    if top is not None:
        merged = merged.orderBy(F.col("weight_lb").desc(), F.col("key").asc()).limit(
            top
        )
    return merged


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 64,
    top: int | None = None,
) -> DataFrame:
    """End-to-end approximate heavy hitters: per-partition MG
    summaries merged into global ``(key, weight_lb, count_ub)``
    bounds. See mg_summaries/mg_merge for the guarantees."""
    return mg_merge(mg_summaries(df, key_col, k), top=top)
