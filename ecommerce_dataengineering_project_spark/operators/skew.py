"""Skew mitigation (the 100 TB design concern SURVEY §7 risk 5).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these operators are the explicit, plan-level form for the
cases AQE can't fix:

- ``salted_agg``: a hot GROUP BY key (e.g. 3 return flags across the
  whole fact table) concentrates each key's rows in one reducer. Spark
  map-side partial aggregation already bounds the shuffle, so salting
  matters when per-key *state* is large (distincts, collect-style
  aggs): stage 1 aggregates (key, salt), spreading each hot key over
  ``n_salts`` reducers; stage 2 combines the partials.
- ``salted_join``: a hot JOIN key floods one task. The small side is
  replicated ``n_salts`` times (explode), the big side picks a salt
  per row; every big-side row still meets its key's every small-side
  copy exactly once, so the result is exactly the plain join.

Salts are derived with xxhash64 — engine-private hashing is fine here
because no salt value ever reaches the result; only the partition
assignment depends on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    n_salts: int = 16,
    salt_src: list[str] | None = None,
) -> DataFrame:
    """Two-stage sum/count aggregation over hot keys.

    ``sums`` maps output column -> input column to SUM (use literal
    "1" for counts via sum). ``salt_src`` columns feed the salt hash
    (default: all non-key columns).
    """
    salt_cols = salt_src or [c for c in df.columns if c not in keys]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)).alias(
        "__salt"
    )
    stage1 = df.select(*keys, salt, *[F.col(c) for c in set(sums.values()) if c != "1"])
    partial = stage1.groupBy(*keys, "__salt").agg(
        *[
            (F.count(F.lit(1)) if src == "1" else F.sum(src)).alias(f"__p_{out}")
            for out, src in sums.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{out}").alias(out) for out in sums]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: result identical to
    ``big.join(small, on, how)``, but each hot key's rows spread over
    ``n_salts`` reducers. Use when the small side is too big to
    broadcast and AQE's skew splitting isn't available (e.g. the join
    feeds a co-partitioned downstream op).

    Join types that preserve UNMATCHED SMALL-side rows are refused:
    the small side is exploded across every salt, so a right/full
    outer join would emit each unmatched small row ``n_salts`` times.
    inner / left / left_semi / left_anti are exactly equivalent to the
    plain join (the big side carries one salt per row)."""
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            f"small-side rows {n_salts}x (the small side is exploded "
            "per salt) — use the plain join or AQE skew handling for "
            "right/full outer"
        )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_salted.join(small_salted, [*on, "__salt"], how).drop("__salt")
