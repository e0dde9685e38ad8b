"""Deterministic hash-threshold sampling (training-data pipelines).

Corpus sampling at 100 TB must be (a) a map-only narrow operation —
no shuffle, pushed right after the scan; (b) reproducible — the same
row set on every run, engine, and partitioning; (c) key-consistent —
all rows of one logical key sample together, so joins between sampled
tables still line up. ``rand()``-based sampling is none of these; a
fixed hash of a stable key versus a threshold is all three (and is the
standard pattern for holdout splits: the complement threshold range is
the eval set, disjoint by construction).

The hash is the repo-portable sha-256 prefix (operators/dedup.hash60),
so sampling decisions are oracle-checkable bit-for-bit on any SQL
engine — no engine-private murmur/xxhash in the semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.dedup import hash60

MILLE = 1000


def sample_key(key_cols: list[str], salt: str) -> Column:
    """Per-row sampling hash in [0, 1000): integer-typed key columns
    only (float->string formatting is not engine-portable)."""
    parts = [F.lit(salt)] + [F.col(c).cast("string") for c in key_cols]
    return hash60(F.concat_ws("_", *parts)) % MILLE


def hash_sample(
    df: DataFrame, key_cols: list[str], permille: int, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose key hashes below ``permille``/1000."""
    return df.where(sample_key(key_cols, salt) < permille)


def stratified_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    permille_by_stratum: dict[str, int],
    default_permille: int = 0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample boilerplate-heavy sources,
    keep rare languages whole). One CASE on the stratum column — still
    map-only, still reproducible row-for-row."""
    rate: Column = F.lit(default_permille)
    for value, p in sorted(permille_by_stratum.items()):
        rate = F.when(F.col(strata_col) == value, p).otherwise(rate)
    return df.where(sample_key(key_cols, salt) < rate)
