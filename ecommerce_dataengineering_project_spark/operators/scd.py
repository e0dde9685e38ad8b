"""Slowly-changing-dimension Type 2 versioning.

The reference's dbt layer models dimensions as latest-state tables;
SCD2 is the standard warehouse upgrade — every attribute change
becomes a dated version row (``effective_from`` / ``effective_to`` /
``is_current``) so facts can join to the dimension AS OF their event
time. This is the batch MERGE formulation Delta/Iceberg users write by
hand; here it is one window pipeline, fully deterministic and
oracle-checkable.

Scale shape: everything is per-key windows over the (tiny relative to
facts) dimension-versions relation — ONE shuffle on the business key;
the change-suppression filter and the effective_to linking reuse the
same partitioning, so Spark plans a single exchange. History rows pass
through untouched (never rewritten), which is what makes this safe to
run incrementally: cost is O(current + updates), not O(history).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Apply a batch of attribute updates to an SCD2 dimension and
    return the new table state.

    ``dim`` carries ``key_cols + attr_cols + from/to/current``;
    ``updates`` carries ``key_cols + attr_cols + from_col`` (the change
    event time, non-null — ordering is undefined for NULL event
    times, so they are a contract violation). Semantics:

    - closed (non-current) history rows pass through untouched;
    - per key, the open row and the updates form a version chain
      ordered by ``(from_col, source)`` — the open row sorts first on
      ties so a same-instant update supersedes it;
    - **change suppression**: a version whose attributes all equal the
      chronologically previous surviving version is dropped (a no-op
      update must not close and reopen the row) — null-safe equality,
      and comparing against the previous RAW row is equivalent to the
      previous SURVIVOR by induction (drops only happen on equality);
    - each surviving version's ``to_col`` is the next survivor's
      ``from_col``; the last is open (``to_col`` null, current).

    Ties inside ``updates`` (same key, same ``from_col``) must be
    pre-deduplicated by the caller to keep the chain deterministic.
    """
    hist = dim.where(~F.col(current_col))
    out_cols = [*key_cols, *attr_cols, from_col, to_col, current_col]
    cur = dim.where(F.col(current_col)).select(*key_cols, *attr_cols, from_col)
    vers = cur.withColumn("__src", F.lit(0)).unionByName(
        updates.select(*key_cols, *attr_cols, from_col).withColumn(
            "__src", F.lit(1)
        )
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(from_col).asc(), F.col("__src").asc()
    )
    prev_from = F.lag(F.col(from_col)).over(w)
    unchanged = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.lag(F.col(c)).over(w)) for c in attr_cols],
    )
    kept = vers.withColumn(
        "__keep", prev_from.isNull() | ~unchanged
    ).where(F.col("__keep"))
    w2 = Window.partitionBy(*key_cols).orderBy(
        F.col(from_col).asc(), F.col("__src").asc()
    )
    linked = kept.withColumn(to_col, F.lead(F.col(from_col)).over(w2)).withColumn(
        current_col, F.col(to_col).isNull()
    )
    return hist.select(*out_cols).unionByName(linked.select(*out_cols))
