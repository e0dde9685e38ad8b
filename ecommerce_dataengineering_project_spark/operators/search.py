"""Search / language-model corpus operators: inverted index
construction and bigram conditional counts.

Both are the map-reduce classics a retrieval or LM-data stack layers on
the same tokenized corpus the text operators already produce — the
reference stops at per-document stats; these invert the corpus
token→doc and token→next-token.

Scale notes (100 TB):
- ``inverted_index`` bounds per-token aggregation state *before* the
  collect: a row_number window caps each posting list at
  ``max_postings`` doc-ids while the same token-keyed exchange computes
  the exact document frequency, so the later groupBy reuses the
  partitioning (ONE shuffle on token) and no token — however hot —
  accumulates an unbounded list. df-range pruning is fraction-based
  (``max_df_frac`` of the corpus), so the stopword band drops out at
  any scale.
- ``bigram_lm`` is a map-side windowed pair expansion (no self-join):
  the token array is sliced in place, then one groupBy on the bigram
  key with map-side combine; the conditional-probability window runs
  over the already-collapsed bigram-vocabulary relation.

Float policy: ``cond_p`` is one IEEE double division of two exact
integers — bit-identical in any engine evaluating the same division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.text import tokens


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df_frac: float = 0.8,
    max_postings: int = 32,
) -> DataFrame:
    """token → (exact df, first-``max_postings`` sorted doc-id posting
    list as a comma-joined string).

    Tokens outside ``[min_df, floor(max_df_frac * n_docs)]`` are pruned
    (the classic vocabulary band: junk below, stopwords above). The
    corpus size travels as a broadcast 1-row aggregate, never a driver
    collect.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    by_token = Window.partitionBy("token")
    ranked = tok.select(
        "token",
        "doc_id",
        F.row_number().over(by_token.orderBy("doc_id")).alias("rn"),
        F.count(F.lit(1)).over(by_token).alias("df"),
    )
    per_tok = (
        ranked.filter(F.col("rn") <= max_postings)
        .groupBy("token", "df")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings")
        )
    )
    return (
        per_tok.join(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.floor(F.lit(max_df_frac) * F.col("n_docs")))
        )
        .select("token", "df", "postings")
    )


def bigram_lm(
    docs: DataFrame, text_col: str = "text", k: int = 200
) -> DataFrame:
    """Top-``k`` bigrams with conditional next-token probability
    ``P(w2 | w1) = count(w1 w2) / count(w1 ·)``.

    The pair expansion is a map-side ``transform`` over a token-index
    sequence (guarded like :func:`ngram_array` — Spark's
    ``sequence(1, 0)`` is the DESCENDING ``[1, 0]``, so short docs must
    emit no pairs explicitly). Ordering for the limit is fully
    deterministic: ``(pair_count DESC, w1 ASC, w2 ASC)``.
    """
    toks = docs.select(tokens(text_col).alias("__toks"))
    pair_windows = F.expr(
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS w1, "
        "element_at(__toks, i + 1) AS w2))"
    )
    guarded = F.when(F.size("__toks") >= 2, pair_windows).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    pairs = toks.select(F.explode(guarded).alias("p")).select("p.w1", "p.w2")
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    w1_total = F.sum("pair_count").over(Window.partitionBy("w1"))
    return (
        pc.select(
            "w1",
            "w2",
            "pair_count",
            w1_total.alias("w1_total"),
            (F.col("pair_count").cast("double") / w1_total.cast("double")).alias(
                "cond_p"
            ),
        )
        .orderBy(F.col("pair_count").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


def doc_perplexity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average bigram negative log-likelihood under a
    corpus-trained add-one-smoothed bigram LM — the CCNet-style
    "perplexity quality filter" (docs whose token stream the corpus LM
    finds surprising are low-quality / off-distribution candidates).

    Model and scorer share one relation: the corpus bigram counts
    ``c(w1,w2)`` with context totals ``c(w1·)`` (a window over the
    already-collapsed bigram vocabulary), plus the unigram vocabulary
    size ``V`` as a broadcast 1-row aggregate. Scoring joins each
    document's bigram stream to the model on (w1, w2) — at 100 TB the
    model relation is vocabulary-bounded (orders smaller than the
    corpus) so the join broadcasts; the only corpus-sized exchanges are
    the model groupBy and the final doc_id aggregation.

    ``P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V)``;
    ``avg_nll = -mean(ln P)`` rounded half-up to 6 (engine-portable:
    the ln inputs are exact integer ratios, the rounded mean absorbs
    sum-order ulp noise). Documents with < 2 tokens have no bigrams and
    drop out.
    """
    from ecommerce_dataengineering_project_spark.functions.scalars import round_half_up

    toks = docs.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks"))
    pair_windows = F.expr(
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS w1, "
        "element_at(__toks, i + 1) AS w2))"
    )
    guarded = F.when(F.size("__toks") >= 2, pair_windows).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    doc_pairs = toks.select(
        "doc_id", F.explode(guarded).alias("p")
    ).select("doc_id", "p.w1", "p.w2")
    pc = doc_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_pair"))
    model = pc.withColumn(
        "c_ctx", F.sum("c_pair").over(Window.partitionBy("w1"))
    )
    vocab = docs.select(
        F.explode(tokens(text_col)).alias("t")
    ).agg(F.countDistinct("t").alias("v"))
    nll = -F.log(
        (F.col("c_pair") + F.lit(1)).cast("double")
        / (F.col("c_ctx") + F.col("v")).cast("double")
    )
    return (
        doc_pairs.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round_half_up(F.avg(nll), 6).alias("avg_nll"),
        )
    )
