"""Change-data-capture apply: the full MERGE semantics the reference
gets from Delta (``MERGE ... WHEN MATCHED UPDATE / DELETE / WHEN NOT
MATCHED INSERT``, streaming_consumer.py:81-88) as one declarative
batch operator — including DELETEs, which the upsert-only
``sources/maintenance.merge_upsert`` deliberately does not model.

Semantics: ``changes`` is a CDC feed ``(key..., seq, op, payload...)``
with ``op ∈ {'I','U','D'}``. Per key, the highest ``seq`` wins (ties
broken by op descending — 'U' > 'I' > 'D' ordering never matters for
well-formed feeds, but the tiebreak keeps degenerate inputs
deterministic). The result is:

- base rows whose key has NO change row: untouched (pass through the
  anti-join without a rewrite);
- keys whose winning op is I/U: the change's payload (insert-or-update
  — upsert);
- keys whose winning op is D: dropped.

Scale shape: one exchange on the key for the winner window, one
key-keyed anti-join + the upsert union — Spark broadcasts the change
side automatically when a micro-batch is small, which is the streaming
foreachBatch case. History is never rescanned; only the base snapshot
and the new feed move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def align_to_union(df: DataFrame, cols: list[str], type_src: DataFrame) -> DataFrame:
    """Null-pad ``df`` to the union column list ``cols`` (missing
    columns typed from ``type_src``'s schema) and select in that order
    — the mergeSchema-read shape shared by the CDC apply and the
    change-feed diff, which both compare relations whose schemas may
    differ under additive evolution."""
    for c in cols:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(type_src.schema[c].dataType))
    return df.select(*cols)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC feed to a base snapshot (see module docstring).

    Automatic schema evolution (Delta ``MERGE WITH SCHEMA EVOLUTION``):
    the output schema is the UNION of the base's columns and the feed's
    payload columns — a feed carrying a newly-evolved column must not
    have it silently dropped just because the (possibly file-scoped)
    base slice predates the evolution; missing columns null-fill on
    whichever side lacks them."""
    feed_payload = [c for c in changes.columns if c not in (seq_col, op_col)]
    payload_cols = list(base.columns) + [
        c for c in feed_payload if c not in base.columns
    ]

    def _aligned(df: DataFrame, type_src: DataFrame) -> DataFrame:
        return align_to_union(df, payload_cols, type_src)

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    untouched = _aligned(
        base.join(latest.select(*key_cols), key_cols, "left_anti"), changes
    )
    upserts = _aligned(latest.where(F.col(op_col) != "D"), base)
    return untouched.unionByName(upserts)
