"""Search / LM-corpus queries (operators/search.py): inverted index
and bigram conditional counts over the documents table. Both fully
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ecommerce_dataengineering_project_spark.operators.search import (
    bigram_lm,
    inverted_index,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table

MIN_DF = 2
MAX_DF_FRAC = 0.8
MAX_POSTINGS = 32
BIGRAM_K = 200


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(
        docs, min_df=MIN_DF, max_df_frac=MAX_DF_FRAC, max_postings=MAX_POSTINGS
    )


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bigram_lm(docs, k=BIGRAM_K)


QUERIES = {
    "inverted_index": q_inverted_index,
    "bigram_lm": q_bigram_lm,
}

ORACLES = {
    "inverted_index": f"""
        WITH tok AS (
            SELECT doc_id,
                   UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS token
            FROM documents
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        per_tok AS (
            SELECT token,
                   CAST(COUNT(*) AS BIGINT) AS df,
                   ARRAY_TO_STRING(
                       LIST_TRANSFORM(
                           LIST_SLICE(LIST_SORT(LIST(doc_id)), 1, {MAX_POSTINGS}),
                           x -> CAST(x AS VARCHAR)),
                       ',') AS postings
            FROM tok GROUP BY 1
        )
        SELECT token, df, postings
        FROM per_tok, n
        WHERE df >= {MIN_DF}
          AND df <= CAST(FLOOR({MAX_DF_FRAC} * n_docs) AS BIGINT)
    """,
    "bigram_lm": f"""
        WITH t AS (SELECT STRING_SPLIT(text, ' ') AS toks FROM documents),
        bg AS (
            SELECT toks[i] AS w1, toks[i + 1] AS w2
            FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0))) s(i)
        ),
        pc AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
            FROM bg GROUP BY 1, 2
        ),
        tot AS (
            SELECT w1, w2, pair_count,
                   CAST(SUM(pair_count) OVER (PARTITION BY w1) AS BIGINT)
                       AS w1_total
            FROM pc
        )
        SELECT w1, w2, pair_count, w1_total,
               CAST(pair_count AS DOUBLE) / CAST(w1_total AS DOUBLE) AS cond_p
        FROM tot
        ORDER BY pair_count DESC, w1 ASC, w2 ASC
        LIMIT {BIGRAM_K}
    """,
}


def q_doc_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-likelihood quality score (the KenLM-style heuristic with
    the engine-portable twist): each document scored by the mean
    corpus-wide frequency of its own bigrams. Counts are exact
    integers; the one double division per doc is bit-identical in any
    engine — no logs, whose libm rounding differs across engines.
    Docs shorter than 2 tokens have no bigrams and drop out (the
    quality filter handles those separately). Self-join-free: the
    per-doc pair relation aggregates to counts and joins back on the
    identical subplan, so Spark reuses the pair exchange."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("__toks"))
    pair_windows = F.expr(
        "transform(sequence(1, size(__toks) - 1), "
        "i -> struct(element_at(__toks, i) AS w1, "
        "element_at(__toks, i + 1) AS w2))"
    )
    guarded = F.when(F.size("__toks") >= 2, pair_windows).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    bg = toks.select("doc_id", F.explode(guarded).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    pc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    joined = bg.join(pc, ["w1", "w2"])
    from ecommerce_dataengineering_project_spark.functions.scalars import (
        round_half_up,
    )

    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        round_half_up(
            F.sum("pair_count").cast("double") / F.count(F.lit(1)), 6
        ).alias("familiarity"),
    )


QUERIES["doc_familiarity"] = q_doc_familiarity

ORACLES["doc_familiarity"] = """
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
    bg AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0))) s(i)
    ),
    pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_count
        FROM bg GROUP BY 1, 2
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(CAST(SUM(p.pair_count) AS DOUBLE) / COUNT(*)
                 * 1000000.0 + 0.5) / 1000000.0 AS familiarity
    FROM bg b JOIN pc p ON b.w1 = p.w1 AND b.w2 = p.w2
    GROUP BY 1
"""


def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity quality filter: per-document average
    bigram negative log-likelihood under the corpus-trained add-one
    bigram LM (operators/search.py doc_perplexity). The reference has
    no LM-scoring stage at all; this is the standard quality gate a
    pretraining corpus pipeline layers on top of its text stats."""
    from ecommerce_dataengineering_project_spark.operators.search import doc_perplexity

    docs = load_table(spark, sf_dir, "documents")
    return doc_perplexity(docs)


QUERIES["doc_perplexity"] = q_doc_perplexity

ORACLES["doc_perplexity"] = """
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
    ),
    doc_pairs AS (
        SELECT doc_id, ws[CAST(i AS BIGINT)] AS w1,
               ws[CAST(i + 1 AS BIGINT)] AS w2
        FROM toks, UNNEST(RANGE(1, LEN(ws))) AS t(i)
        WHERE LEN(ws) >= 2
    ),
    pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_pair
        FROM doc_pairs GROUP BY w1, w2
    ),
    model AS (
        SELECT w1, w2, c_pair,
               SUM(c_pair) OVER (PARTITION BY w1) AS c_ctx
        FROM pc
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(AVG(-LN((m.c_pair + 1) * 1.0 / (m.c_ctx + vocab.v)))
                 * 1000000.0 + 0.5) / 1000000.0 AS avg_nll
    FROM doc_pairs d
    JOIN model m ON d.w1 = m.w1 AND d.w2 = m.w2, vocab
    GROUP BY d.doc_id
"""
