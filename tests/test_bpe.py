"""BPE merge-trainer contracts (operators/bpe.py, X29): equivalence to
a pure-Python reference implementation, greedy-overlap semantics,
determinism across partitionings, and the once-only corpus scan shape.
"""

from __future__ import annotations

import re
from collections import Counter

from ecommerce_dataengineering_project_spark.operators.bpe import (
    pair_counts,
    train_merges,
    word_counts,
)


def _reference_merges(texts: list[str], n_merges: int) -> list[tuple]:
    """Straight-from-the-paper BPE trainer (Sennrich et al. 2016)."""
    vocab = Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    seg = {w: list(w) for w in vocab}
    out = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        # max count, ties lexicographic on (left, right)
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((step, left, right, left + right, cnt))
        for w, syms in seg.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seg[w] = merged
    return out


TEXTS = [
    "the cat sat on the mat with the other cat",
    "low lower lowest slow slower slowest",
    "new newer newest news renew",
    "banana bandana cabana",
]


def test_merge_table_matches_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    got = [tuple(r) for r in train_merges(docs, n_merges=6).collect()]
    assert got == _reference_merges(TEXTS, 6)


def test_partitioning_invariance(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text STRING")
    one = [tuple(r) for r in train_merges(docs.coalesce(1), n_merges=4).collect()]
    many = [tuple(r) for r in train_merges(docs.repartition(7), n_merges=4).collect()]
    assert one == many


def test_greedy_left_to_right_on_overlaps(spark):
    """'aaaa' under merge (a,a) segments to [aa, aa] — greedy
    left-to-right, never the overlapping [a, aa, a] reading. The fold
    then counts (aa, aa) for the next step, like the reference."""
    docs = spark.createDataFrame([("aaaa aaaa zz",)], "text STRING")
    got = [tuple(r) for r in train_merges(docs, n_merges=2).collect()]
    assert got == _reference_merges(["aaaa aaaa zz"], 2)
    assert got[0][1:4] == ("a", "a", "aa")
    assert got[1][1:4] == ("aa", "aa", "aaaa")


def test_trainer_exhausts_gracefully(spark):
    """Fewer possible merges than requested -> the table just stops."""
    docs = spark.createDataFrame([("ab ab",)], "text STRING")
    got = train_merges(docs, n_merges=10).collect()
    assert len(got) == 1 and got[0].merged == "ab"


def test_pair_counts_weighted_by_word_frequency(spark):
    docs = spark.createDataFrame([("go go go stop",)], "text STRING")
    vocab = word_counts(docs)
    pc = {(r.left, r.right): r.pair_count for r in pair_counts(vocab).collect()}
    assert pc[("g", "o")] == 3  # weighted by the word count, one scan
    assert pc[("s", "t")] == 1


def test_encode_matches_reference_segmentation(spark):
    """Encoding with a FIXED merge list equals applying the merges in
    order with the reference algorithm, including overlap greediness
    and the cross-symbol guard ('ba'+'a' must not merge as (a,a))."""
    from ecommerce_dataengineering_project_spark.operators.bpe import (
        encode_token_count_expr,
    )
    from pyspark.sql import functions as F

    merges = [("a", "a"), ("b", "a"), ("ba", "aa")]
    words = ["aaaa", "baa", "banana", "aba", "baaa"]

    def ref_count(w):
        syms = list(w)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    df = spark.createDataFrame([(w,) for w in words], "w STRING")
    got = {
        r.w: r.n
        for r in df.select(
            "w", encode_token_count_expr(F.col("w"), merges).alias("n")
        ).collect()
    }
    assert got == {w: ref_count(w) for w in words}


def test_fold_depth_stays_bounded_at_50_merges(spark):
    """The plan-depth wall (r8 audit item): a 50-merge run with the
    default checkpoint interval must leave at most CHECKPOINT_EVERY
    sequential-fold `aggregate` HOFs in the live vocab plan (lineage
    truncated by the enforced localCheckpoint), and checkpointing must
    not change the merge table."""
    import string

    from ecommerce_dataengineering_project_spark.operators import bpe

    # two 26-letter words -> ~50 distinct best pairs, enough for 50 merges
    texts = [string.ascii_lowercase + " " + string.ascii_lowercase[::-1]]
    docs = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [tuple(r) for r in bpe.train_merges(docs, n_merges=50).collect()]
    assert len(got) == 50
    assert bpe.LAST_VOCAB_PLAN is not None
    folds = bpe.LAST_VOCAB_PLAN.count("aggregate(")
    assert folds <= bpe.CHECKPOINT_EVERY, folds
    # identical merges with checkpointing effectively off
    ungated = [
        tuple(r)
        for r in bpe.train_merges(
            docs, n_merges=50, checkpoint_every=10**9
        ).collect()
    ]
    assert got == ungated
    assert got == _reference_merges(texts, 50)
