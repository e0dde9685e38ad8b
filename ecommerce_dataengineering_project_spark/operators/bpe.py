"""Byte-pair-encoding merge training over a document corpus (X29 —
the tokenizer-training shape of an LLM data pipeline; Sennrich et al.
2016, public literature).

Scale design — the part that matters at 100 TB: BPE training never
iterates over the corpus. The corpus is scanned ONCE into a
word-frequency relation (vocabulary-sized, bounded by the language,
not the data), and every merge iteration runs on that compact
(word, count, symbols) relation: count weighted adjacent symbol
pairs (one shuffle on the pair), pick the argmax (a one-row collect —
the bounded scalar every trainer needs), and apply the merge with a
sequential-fold rewrite of each word's symbol array. The fold is a
codegen ``aggregate`` HOF — greedy left-to-right, the standard BPE
tie behavior for overlapping pairs (aaa + (a,a) -> [aa, a]) — so the
whole iteration stays JVM-side; Python holds only the n_merges loop
and one (left, right) pair per step.

Determinism: pair argmax ties break lexicographically on (left,
right); word splitting is a fixed regex; everything else is integer
arithmetic. tests/test_bpe.py pins the merge table against a
pure-Python reference implementation and its partitioning-invariance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_RE = "[^a-z]+"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, count, symbols): the bounded relation
    every merge iteration runs on. Words shorter than 2 symbols carry
    no pairs and are dropped."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), WORD_RE)).alias("word")
    ).where(F.length("word") >= 2)
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("symbols", F.split("word", ""))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the CURRENT segmentation:
    zip each word's symbol array with its own tail, explode, sum the
    word counts. One shuffle, keyed by (left, right)."""
    pairs = vocab.select(
        "count",
        F.explode(
            F.zip_with(
                F.slice("symbols", 1, F.size("symbols") - 1),
                F.slice("symbols", 2, F.size("symbols") - 1),
                lambda a, b: F.struct(a.alias("left"), b.alias("right")),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy(F.col("pair.left").alias("left"), F.col("pair.right").alias("right"))
        .agg(F.sum("count").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every segmentation for one merge (left, right) ->
    left||right via a sequential codegen fold (greedy left-to-right —
    correct for overlapping pairs, where a window/zip rewrite is not)."""
    l, r = F.lit(left), F.lit(right)
    merged = F.aggregate(
        "symbols",
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l)
            & (x == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(l, r)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.withColumn("symbols", merged)


# Plan-depth wall (same class as the Bloom literal gate): every merge
# nests one more sequential-fold `aggregate` HOF into the vocab plan,
# and Catalyst analysis time goes superlinear in that depth — a
# thousand-merge trainer would build an unanalyzable plan. Truncating
# lineage with an eager localCheckpoint every CHECKPOINT_EVERY merges
# bounds the live plan to at most CHECKPOINT_EVERY folds; the relation
# is vocabulary-sized, so the checkpoint itself is cheap.
CHECKPOINT_EVERY = 16

# The analyzed plan of the final vocab relation from the last
# train_merges call — lets tests pin that the fold depth stays bounded
# (mirrors streaming/harness.LAST_PLAN).
LAST_VOCAB_PLAN: str | None = None


def train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
    checkpoint_every: int = CHECKPOINT_EVERY,
) -> DataFrame:
    """The trainer: n_merges greedy iterations; returns the merge table
    (step, left, right, merged, pair_count) as a DataFrame. Ties on
    pair_count break lexicographically on (left, right), making the
    whole table deterministic for any partitioning.

    Each iteration re-plans the vocabulary relation from the previous
    fold, so the vocab plan deepens by one `aggregate` HOF per merge;
    every ``checkpoint_every`` merges the loop eagerly localCheckpoints
    the relation (ENFORCED, not advisory — the r8 audit flagged the
    unbounded-depth path) so plan depth is O(checkpoint_every) no
    matter how many merges a trainer runs."""
    global LAST_VOCAB_PLAN
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    spark = docs.sparkSession
    # Materialize the word relation ONCE before the loop: without this
    # eager checkpoint every per-merge argmax job re-executes the
    # corpus scan + word groupBy from the lazy plan (n_merges corpus
    # scans — the exact failure the "scanned once" design forbids; at
    # 100 TB the corpus pass dominates everything downstream). After
    # it, each iteration reads only the vocabulary-sized checkpoint.
    vocab = word_counts(docs, text_col).localCheckpoint(eager=True)
    rows = []
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        rows.append((step, t.left, t.right, t.left + t.right, t.pair_count))
        vocab = _apply_merge(vocab, t.left, t.right)
        if step % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    LAST_VOCAB_PLAN = vocab._jdf.queryExecution().analyzed().toString()
    return spark.createDataFrame(
        rows, "step INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


# Encoding with a RELEASED merge list (the production shape: corpora are
# tokenized with a fixed vocabulary, not retrained per batch). The
# segmentation state rides a guarded-symbol string: 'low' ->
# '<l><o><w>', and one merge (l, r) is ONE string replace
# '<l><r>' -> '<lr>'. Both Spark's and DuckDB's replace() scan
# left-to-right non-overlapping, which IS greedy BPE ('<a><a><a><a>'
# -> '<aa><aa>'), and the '<'/'>' guards make cross-symbol matches
# impossible ('<ba><a>' never matches '<a><a>'). Everything stays in
# codegen string kernels — no fold, no Python.


def encode_token_count_expr(word_col, merges: list[tuple[str, str]]):
    """Column: BPE token count of one lowercase word under ``merges``
    (applied in order). Count = number of '<' guards left standing."""
    s = F.regexp_replace(word_col, "(.)", "<$1>")
    for left, right in merges:
        s = F.replace(s, F.lit(f"<{left}><{right}>"), F.lit(f"<{left}{right}>"))
    return F.length(s) - F.length(F.replace(s, F.lit("<"), F.lit("")))


def sql_encode_token_count(word_expr: str, merges: list[tuple[str, str]]) -> str:
    """The identical encoding as portable SQL (for oracles)."""
    s = f"regexp_replace({word_expr}, '(.)', '<\\1>', 'g')"
    for left, right in merges:
        s = f"replace({s}, '<{left}><{right}>', '<{left}{right}>')"
    return f"(length({s}) - length(replace({s}, '<', '')))"
