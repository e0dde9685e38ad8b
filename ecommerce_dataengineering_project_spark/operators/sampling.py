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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.dedup import hash60

MILLE = 1000


def _key_parts(key_cols: list[str]) -> list[Column]:
    """Stringified key columns for the portable hash, fail-loud on NULL.

    Key contract (applies to every hash-keyed operator in this module):
    keys must be NON-NULL and must not contain ``'_'``.  ``concat_ws``
    silently *drops* NULL parts (so ``(1, NULL)`` and ``(NULL, 1)``
    would collide) and ``'_'`` is the join separator (so ``('a_b','c')``
    and ``('a','b_c')`` would collide); both engines behave identically
    here, but the collision would be silent — raise instead.  Current
    call sites key on integer ids, which satisfy both clauses for free;
    the NULL arm is an explicit raise_error so a violation surfaces as
    a job failure, never as a quietly-merged sample cell.  (The oracle
    SQL replicates the same CONCAT_WS scheme, which is why the format
    is contract-documented rather than escaped.)"""
    return [
        F.when(
            F.col(c).isNull(),
            F.raise_error(
                F.lit(f"sampling key column '{c}' is NULL — hash keys must be non-null")
            ),
        ).otherwise(F.col(c).cast("string"))
        for c in key_cols
    ]


def sample_key(key_cols: list[str], salt: str) -> Column:
    """Per-row sampling hash in [0, 1000): integer-typed key columns
    only (float->string formatting is not engine-portable).  NULL keys
    raise (see ``_key_parts``)."""
    parts = [F.lit(salt)] + _key_parts(key_cols)
    return hash60(F.concat_ws("_", *parts)) % MILLE


def hash_sample(
    df: DataFrame, key_cols: list[str], permille: int, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose key hashes below ``permille``/1000."""
    return df.where(sample_key(key_cols, salt) < permille)


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    cuts_permille: dict[str, int],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: label every row by
    which permille band its key hash falls in.  ``cuts_permille`` maps
    label -> EXCLUSIVE upper cut, e.g. ``{"train": 800, "val": 900,
    "test": 1000}`` → train [0,800), val [800,900), test [900,1000).
    The last cut must be 1000 so every row gets a label.

    Same contract as ``hash_sample`` (this IS the holdout-split pattern
    that docstring promises): splits are disjoint by construction,
    reproducible on any engine/partitioning, and key-consistent — all
    rows of one key land in the same split, so a doc never leaks from
    train into eval.  Map-only: one hash + one CASE appended to the
    scan stage, no shuffle.
    """
    bands = sorted(cuts_permille.items(), key=lambda kv: kv[1])
    assert bands and bands[-1][1] == MILLE, "last cut must be 1000 (exhaustive)"
    assert all(0 < c <= MILLE for _, c in bands), "cuts must be in (0, 1000]"
    cuts = [c for _, c in bands]
    assert len(set(cuts)) == len(cuts), (
        "duplicate cut values — one label's band would be empty and "
        "which one is dict-order luck; give each split a distinct cut"
    )
    h = sample_key(key_cols, salt)
    label = F.lit(bands[-1][0])
    for name, cut in reversed(bands[:-1]):
        label = F.when(h < cut, F.lit(name)).otherwise(label)
    return df.withColumn(split_col, label)


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Reproducible global training order: every row gets a shard id
    and a position within its shard, derived ONLY from (salt, key) —
    the same permutation on any engine, cluster size, or input
    partitioning (``rand()`` / ``repartition`` orders are none of
    these). Training readers consume shards in id order, rows in
    ``pos`` order: a stable epoch-0 order that re-salts per epoch.

    Scale shape: the hash is map-side; the only wide operation is ONE
    exchange on ``shard`` for the per-shard rank window. Shard count
    bounds window partition size (pick shards >> executors); there is
    deliberately no global ROW_NUMBER — a total order over 100 TB
    serializes on one partition, while (shard, pos) is already a
    lexicographic total order."""
    h = hash60(F.concat_ws("_", F.lit(salt), *_key_parts(key_cols)))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard").orderBy(
            F.col("__h").asc(), *[F.col(c).asc() for c in key_cols]
        )
    )
    return (
        df.withColumn("__h", h)
        # derive shard from the MATERIALIZED __h column (not a second
        # copy of the hash expression) so the shard/pos consistency
        # contract is structural, not reliant on subexpression dedup
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def curriculum_order(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    n_shards: int,
    salt: str = "curriculum",
) -> DataFrame:
    """Curriculum training order: shard assignment stays the salted
    key hash (reproducible, leak-free across epochs like
    ``deterministic_shuffle``), but WITHIN each shard rows are ordered
    by the caller's curriculum criterion (e.g. quality descending —
    easy/clean examples first) instead of the hash. The common middle
    ground between fully random order and a global quality sort: a
    global sort would put all hard examples in the last shards (and
    serialize on one partition at 100 TB); hash-sharding first keeps
    every shard a uniform sample of the corpus while the curriculum
    applies locally.

    Caller contract: ``order_by`` + the key columns must be a total
    order (pass deterministic tiebreakers) — otherwise ``pos`` is
    partition-order luck. Same single-exchange shape as
    ``deterministic_shuffle``.
    """
    h = hash60(F.concat_ws("_", F.lit(salt), *_key_parts(key_cols)))
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(
        *order_by, *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("shard", (h % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
    )


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



def mixture_rates(
    df: DataFrame,
    strata_col: str,
    target_permille: dict[str, int],
) -> DataFrame:
    """The per-stratum keep rates mixture_resample derives —
    ``(__s, rate_permille)`` with rate = min(1000, (target * N) div n)
    in pure integer arithmetic. Exposed so rates are testable without
    leaking the internal join column into the sampler output."""
    counts = df.groupBy(F.col(strata_col).alias("__s")).agg(
        F.count("*").alias("__n")
    )
    total = df.agg(F.count("*").alias("__total"))
    weight: Column = F.lit(0)
    for value, p in sorted(target_permille.items()):
        weight = F.when(F.col("__s") == value, p).otherwise(weight)
    return (
        counts.withColumn("__w", weight)
        .join(F.broadcast(total))
        .select(
            "__s",
            F.least(
                F.lit(1000).cast("bigint"),
                F.expr("CAST((__w * __total) DIV __n AS BIGINT)"),
            ).alias("rate_permille"),
        )
    )


def mixture_resample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    target_permille: dict[str, int],
    salt: str = "mixture",
) -> DataFrame:
    """Resample toward a TARGET domain mixture (DoReMi-style domain
    reweighting, downsampling-only): each stratum's keep rate is
    derived from its observed share so the kept corpus approaches
    ``target_permille`` (a dict of desired corpus shares summing to
    <= 1000). A stratum at or below its target share keeps everything
    (rate capped at 1000 — this operator never upsamples, so
    under-represented domains simply stay whole and the realized
    mixture is the closest achievable by dropping rows).

    ``rate_s = min(1000, (target_s * N_total) div n_s)`` — pure
    integer arithmetic end to end (no float shares), so rates —
    and therefore every keep decision — reproduce exactly on any
    engine. Strata missing from ``target_permille`` get rate 0.

    Scale shape: one map-side-combined count per stratum (strata
    cardinality is tiny — languages, sources), the 1-row total
    attached to it broadcast, then the per-row decision is the usual
    map-only hash-threshold filter after a broadcast equi-join on the
    stratum column. The full scan happens twice (count pass + filter
    pass); at 100 TB the count pass is column-pruned to the stratum
    column alone, and persisting it is a few KB.
    """
    rates = mixture_rates(df, strata_col, target_permille)
    return (
        df.join(
            F.broadcast(rates), df[strata_col] == rates["__s"], "inner"
        )
        .drop("__s")
        .where(sample_key(key_cols, salt) < F.col("rate_permille"))
        # internal join column: the sampler's contract (like every
        # other sampler here) is input-schema rows out
        .drop("rate_permille")
    )


def reservoir_exact_k(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    k: int,
    salt: str = "reservoir",
) -> DataFrame:
    """EXACTLY ``min(k, n_s)`` rows per stratum, reproducible on any
    engine and any partitioning: rows rank within their stratum by a
    salted portable hash of the key (sha-256 prefix — the repo's
    engine-portable hash, ties broken by the key itself) and
    ``rank <= k`` survive. The eval-slice / debug-sample shape a
    permille rate cannot give ("exactly 100 documents per language").

    Scale shape: Catalyst rewrites the ``row_number() <= k`` filter
    into ``WindowGroupLimit`` — a map-side PARTIAL top-k that runs
    before the stratum exchange, so a 100 TB stratum ships ~k rows per
    input partition to the shuffle, never the stratum (plan pinned in
    tests/test_mixture.py).

    Key contract: same as ``_key_parts`` (non-NULL keys, fail-loud) —
    here with ``'|'`` as the salt/key separator, matching the SQL
    oracle's ``'salt|' || key`` spelling."""
    h = hash60(F.concat_ws("|", F.lit(salt), *_key_parts(key_cols)))
    w = Window.partitionBy(strata_col).orderBy(
        h.asc(), *[F.col(c).asc() for c in key_cols]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .withColumn("sample_rank", F.col("__rk").cast("int"))
        .drop("__rk")
    )
