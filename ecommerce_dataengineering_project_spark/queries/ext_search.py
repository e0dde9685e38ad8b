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
