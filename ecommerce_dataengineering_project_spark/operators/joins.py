"""Joins (SURVEY §2c: J1, J2, J3).

The reference carries join semantics procedurally (producer.py:138-161
dimension lookup; producer.py:131-134 nearest-value match); here they
are relational operators:

- ``broadcast_enrich`` — J1/J3 equi-join with an explicit broadcast of
  the dimension side. At 100 TB the fact side never shuffles: each
  executor hash-probes a replicated dim table (the reference's dim is
  27 rows; anything up to ~1 GB broadcast beats a shuffle join).
- ``asof_join`` — J2 as-of/nearest-key join, implemented with the
  union-sentinel + window trick: ONE shuffle on the join key, no
  range-explosion, no per-row subquery. This is the standard scalable
  as-of pattern (cf. pandas merge_asof semantics, Flink temporal join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact->dim with the dim side broadcast (J1/J3).

    Explicit ``F.broadcast`` rather than relying on the auto threshold:
    at 100 TB a missed broadcast is a full fact-table shuffle.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` for the same key (J2's nearest-match,
    generalized; ``direction="forward"`` takes the earliest
    ``right_ts >= left_ts``).

    Implementation: tag both sides, union by name, and take
    ``last(value, ignoreNulls)`` over a per-key window ordered by
    (ts, side-tag). Cost is one shuffle on ``on`` plus a per-key sort —
    the same cost profile as a single sort-merge join, with no range
    cross-product. Right rows with equal (key, ts) are deterministically
    resolved by ordering on the value columns last (greatest wins).

    Returns the left rows plus ``value_cols`` from the matched right row
    (null when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    # Normalize both sides to a common shape: key, ts, tag, payloads.
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    left_cols = [c for c in left.columns]
    l_norm = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(l_tag).alias("__tag"),
        F.struct(*left_cols).alias("__left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_norm = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(r_tag).alias("__tag"),
        F.lit(None).cast(l_norm.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_norm.unionByName(r_norm)

    # last(ignoreNulls) picks the most-recently-seen right row in window
    # order, so on equal (key, ts) the value columns must sort ASCENDING
    # in BOTH directions for the greatest value to be the one picked.
    tie = [F.col(f"__r_{c}") for c in value_cols]
    if direction == "backward":
        order = [F.col("__ts"), F.col("__tag"), *tie]
    else:
        order = [F.col("__ts").desc(), F.col("__tag").desc(), *tie]
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in value_cols
    ]

    return (
        unioned.select("*", *picked)
        .where(F.col("__left").isNotNull())
        .select(
            *[F.col(f"__left.{c}").alias(c) for c in left_cols],
            *[F.col(f"__m_{c}").alias(c) for c in value_cols],
        )
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
) -> DataFrame:
    """Time-proximity range join: every (left, right) pair with
    ``|left_ts - right_ts| <= tolerance``.

    The naive form is a theta join — Spark can only BNLJ it, O(n*m)
    comparisons, hopeless at scale. Binning makes it relational: bucket
    both sides by tolerance-width bins of the clock, land each right
    row in its one bin, probe bins {b-1, b, b+1} from the left (a 3x
    explode), equi-join on the bin id, then apply the exact predicate.
    Each qualifying pair meets in exactly one bin (the right row's), so
    no dedup is needed. The shuffle is keyed by bin — time-local and
    uniform for steady event streams; a hot bin is an AQE skew-join
    case, not a plan rewrite.

    Returns left columns (prefixed ``l_``) + right columns (``r_``).
    """
    tol = int(tolerance_us)
    l_bin = F.floor(F.unix_micros(F.col(left_ts)) / F.lit(tol))
    r_bin = F.floor(F.unix_micros(F.col(right_ts)) / F.lit(tol))
    l = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        F.explode(F.array(l_bin - 1, l_bin, l_bin + 1)).alias("__bin"),
    )
    r = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        r_bin.alias("__bin"),
    )
    dt = F.unix_micros(F.col(f"l_{left_ts}")) - F.unix_micros(F.col(f"r_{right_ts}"))
    return l.join(r, "__bin").where(F.abs(dt) <= tol).drop("__bin")


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    fact_ts: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join of facts to an SCD2 dimension (the temporal
    companion of operators/scd.py scd2_apply): each fact row matches
    the dimension version whose ``[from_col, to_col)`` validity range
    contains the fact's event time (open rows have NULL ``to_col``).

    Shape: a plain equi-join on the business key with the interval
    predicate as a post-filter — NOT a range/theta join. SCD2 keys
    have few versions each (bounded by real attribute churn), so the
    equi-match fans out by that small factor and the filter prunes to
    at most one row per fact; the version ranges are half-open and
    non-overlapping by construction, so this needs no dedup. The dim
    side is broadcast (a dimension at 100 TB fact scale is still MBs);
    drop the broadcast hint for a dimension that outgrows it and the
    same plan shuffles both sides on the key.

    ``how="left"`` keeps facts with no valid version (event time
    before the first version) with NULL dim columns.
    """
    in_range = (F.col(fact_ts) >= F.col(from_col)) & (
        F.col(to_col).isNull() | (F.col(fact_ts) < F.col(to_col))
    )
    if how == "inner":
        return fact.join(F.broadcast(dim), on=key_cols, how="inner").where(in_range)
    if how != "left":
        raise ValueError(f"pit_join: unsupported how={how!r}")
    matched = fact.join(F.broadcast(dim), on=key_cols, how="left").where(
        in_range | F.col(from_col).isNull()
    )
    # a fact whose key exists but whose ts predates every version
    # would be dropped by the filter — reattach those as NULL matches
    missing = fact.join(
        matched.select(*key_cols, fact_ts).distinct(),
        on=[*key_cols, fact_ts],
        how="left_anti",
    )
    dim_cols = [c for c in dim.columns if c not in key_cols]
    return matched.unionByName(
        missing.select(
            "*",
            *[
                F.lit(None).cast(dim.schema[c].dataType).alias(c)
                for c in dim_cols
            ],
        )
    )
