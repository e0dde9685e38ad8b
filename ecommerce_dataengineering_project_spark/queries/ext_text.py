"""Text-analysis queries over the documents table (SURVEY §2k X4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.text import (
    BPE_PRETOKEN_RE,
    ROLLING_BASE,
    ROLLING_MOD,
    STOPWORDS,
    bm25_score_sql,
    bm25_topk,
    tfidf_top_terms,
    token_histogram,
    with_fingerprint,
    with_language_id,
    with_rolling_hash,
    with_text_stats,
    with_token_counts,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_text_stats(docs).select(
        "doc_id", "text_len", "token_count", "avg_token_len", "stopword_ratio", "quality_score"
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_language_id(docs).select("doc_id", "lang", "predicted_lang", "lang_score")


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_fingerprint(docs).select("doc_id", "fingerprint", "fingerprint_bucket")


def q_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return token_histogram(docs)


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_token_counts(docs).select(
        "doc_id", "word_count", "bpe_piece_count", "token_budget_est"
    )


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return with_rolling_hash(docs).select("doc_id", "rolling_hash")


TFIDF_K = 5


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=TFIDF_K)


BM25_TERMS = ("query", "join", "fast", "dup")
BM25_K = 10


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a fixed term query
    (three common terms + one rare one, so the idf spread matters)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=BM25_K)


CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM context prep: sliding-window token chunks (32 tokens, 8
    overlap) over every document — map-only, no shuffle (see
    operators/text.py chunk_documents)."""
    from ecommerce_dataengineering_project_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


def q_chunk_documents_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2j table-function arm: the same chunker as a Python UDTF
    (Arrow-batched lateral join) — row-for-row identical to the
    built-in, shares its oracle (see operators/text.py
    chunk_documents_udtf)."""
    from ecommerce_dataengineering_project_spark.operators.text import (
        chunk_documents_udtf,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents_udtf(
        docs, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


SHUFFLE_SHARDS = 8


def q_shuffle_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training order: (shard, pos) permutation derived
    only from the salted key hash — same order on any engine or
    cluster (see operators/sampling.py deterministic_shuffle)."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        deterministic_shuffle,
    )

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, ["doc_id"], SHUFFLE_SHARDS).select(
        "doc_id", "shard", "pos"
    )


PACK_BUDGET = 128


def q_pack_training_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed context-prep pipeline: chunk every document,
    shuffle chunks into a reproducible training order, then
    concat-and-split pack them into 128-token bins. Three operators,
    ONE exchange total: the chunker is map-only and the packing window
    reuses the shard shuffle's partitioning (exchange count asserted
    in tests/test_plans.py)."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        deterministic_shuffle,
    )
    from ecommerce_dataengineering_project_spark.operators.text import (
        chunk_documents,
        pack_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    ).select("doc_id", "chunk_id", "n_chunk_tokens")
    ordered = deterministic_shuffle(chunks, ["doc_id", "chunk_id"], SHUFFLE_SHARDS)
    return pack_chunks(
        ordered, "shard", ["pos"], "n_chunk_tokens", PACK_BUDGET
    ).select("doc_id", "chunk_id", "shard", "pos", "token_offset", "bin_id", "bin_offset")


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style repetition metrics per document (see
    operators/text.py repetition_stats)."""
    from ecommerce_dataengineering_project_spark.operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher duplicate-bigram fraction per document (see
    operators/text.py ngram_repetition)."""
    from ecommerce_dataengineering_project_spark.operators.text import ngram_repetition

    return ngram_repetition(load_table(spark, sf_dir, "documents"), n=2)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over documents. The fixture corpus contains no
    PII, so deterministic contact lines (email + phone always, SSN on
    every third doc) are seeded from doc_id first — the oracle builds
    the identical text, so the redaction itself is what's checked."""
    from ecommerce_dataengineering_project_spark.operators.text import scrub_pii

    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-201-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" ssn 123-45-6789")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return scrub_pii(seeded).select(
        "doc_id", "n_email", "n_phone", "n_ssn", "clean_text"
    )


BENCH_MOD = 97  # docs with doc_id % BENCH_MOD == 0 play the eval set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/text.py decontaminate):
    every ~97th fixture document stands in for the evaluation set; the
    rest are the training corpus scanned for verbatim trigram overlap
    with it."""
    from ecommerce_dataengineering_project_spark.operators.text import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % BENCH_MOD != 0)
    return decontaminate(corpus, benchmark, n=3)


QUALITY_MIN = 0.5
CORPUS_PERMILLE = 500


def q_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data reduction, composed from the
    pipeline's own operators: quality filter -> exact-dedup keep-first
    -> deterministic hash downsample. Every stage is an exact,
    engine-portable transformation, so the full composition
    oracle-checks bit-for-bit. At scale: quality + sampling are
    map-only and run in the scan stage; the only shuffle is the
    dedup's fingerprint window."""
    from pyspark.sql import Window

    from ecommerce_dataengineering_project_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    stats = with_text_stats(docs)
    kept = stats.where(F.col("quality_score") >= QUALITY_MIN)
    w = Window.partitionBy(F.sha2(F.lower(F.trim(F.col("text"))), 256)).orderBy(
        F.col("doc_id").asc()
    )
    first = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    sampled = hash_sample(first, ["doc_id"], CORPUS_PERMILLE, salt="corpus")
    return sampled.select("doc_id", "lang", "token_count", "quality_score")


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order (operators/sampling.py
    curriculum_order): hash-sharded like shuffle_corpus, but within
    each shard documents run quality-descending (clean examples
    first) with deterministic tiebreaks."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        curriculum_order,
    )

    docs = with_text_stats(load_table(spark, sf_dir, "documents"))
    return curriculum_order(
        docs,
        ["doc_id"],
        [F.col("quality_score").desc(), F.col("token_count").desc()],
        SHUFFLE_SHARDS,
    ).select("doc_id", "quality_score", "shard", "pos")


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health report — the summary a data-curation run
    prints at the end: doc/token totals, mean quality (exact rational,
    rounded once), exact-duplicate count, and the quality-filter pass
    rate. Every input relation is an already-oracle-checked operator;
    the report is their scalar rollup (map-side partial aggregation
    into a single-row combine — driver-sized at any corpus scale)."""
    docs = with_text_stats(load_table(spark, sf_dir, "documents"))
    dup = F.count(F.lit(1)) - F.count_distinct(F.sha2(F.lower(F.trim(F.col("text"))), 256))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("total_tokens"),
        # integer micro-units: quality_score is a 1e-6 multiple, so the
        # inner FLOOR recovers exact ints — the SUM is order-independent
        # (double sums are not), and only ONE double division remains
        F.expr(
            "FLOOR(CAST(SUM(CAST(FLOOR(quality_score * 1000000.0D + 0.5D) AS BIGINT))"
            " AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5D) / 1000000.0D"
        ).alias("mean_quality"),
        dup.cast("bigint").alias("n_exact_dups"),
        F.sum(
            F.when(F.col("quality_score") >= QUALITY_MIN, 1).otherwise(0)
        ).cast("bigint").alias("n_pass_quality"),
    )


def q_corpus_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE pretraining-data pipeline as one declarative plan:
    quality filter -> exact-dedup keep-first -> benchmark
    decontamination (drop flagged docs; short no-gram docs cannot be
    contaminated and are kept) -> leak-free train split (80%) ->
    sliding-window chunking. Five stages, each individually
    oracle-checked elsewhere, here composed and oracle-checked
    END-TO-END — the integration errors (wrong stage order, dropped
    short docs, split leakage) are what this query pins.

    Scale: quality, split and chunking are map-only in the scan stage;
    the dedup window is one content-hash exchange; decontamination is
    one doc-keyed exchange (its per-doc rollup reuses it) with the
    (MB-scale) benchmark gram set broadcast; the flagged-id anti-join
    adds a doc-keyed exchange pair. Measured plan: 4 shuffle + 2
    broadcast exchanges end-to-end for a five-stage pipeline."""
    from pyspark.sql import Window

    from ecommerce_dataengineering_project_spark.operators.sampling import hash_split
    from ecommerce_dataengineering_project_spark.operators.text import (
        chunk_documents,
        decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % BENCH_MOD == 0)
    kept = (
        with_text_stats(docs)
        .where(F.col("quality_score") >= QUALITY_MIN)
        .where(F.col("doc_id") % BENCH_MOD != 0)
    )
    w = Window.partitionBy(F.sha2(F.lower(F.trim(F.col("text"))), 256)).orderBy(
        F.col("doc_id").asc()
    )
    first = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    contaminated = (
        decontaminate(first.select("doc_id", "text"), bench, n=3)
        .where(F.col("is_contaminated"))
        .select("doc_id")
    )
    clean = first.join(contaminated, "doc_id", "left_anti")
    train = hash_split(clean, ["doc_id"], {"train": 800, "heldout": 1000}).where(
        F.col("split") == "train"
    )
    return chunk_documents(
        train, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    ).select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens")


# Uniform target across the five fixture languages: each should end
# at ~200 permille of the kept corpus (downsample-only, so dominant
# 'en' is cut hard and the rare languages keep everything).
MIXTURE_TARGET = {"en": 200, "de": 200, "zh": 200, "fr": 200, "es": 200}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling (operators/sampling.py
    mixture_resample): per-language keep rates derived from observed
    shares by pure integer arithmetic, then the usual map-only
    hash-threshold keep decision — the whole pipeline reproduces
    bit-for-bit in SQL."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        mixture_rates,
        mixture_resample,
    )

    docs = load_table(spark, sf_dir, "documents")
    sampled = mixture_resample(docs, ["doc_id"], "lang", MIXTURE_TARGET)
    # surface the applied rate beside each kept row (the sampler's
    # output is input-schema rows; the rates relation is the exposed
    # helper the sampler derives them from)
    rates = mixture_rates(docs, "lang", MIXTURE_TARGET)
    return (
        sampled.join(F.broadcast(rates), sampled["lang"] == rates["__s"])
        .select("doc_id", "lang", "rate_permille")
    )


SPLIT_CUTS = {"train": 800, "val": 900, "test": 1000}


def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test corpus split: every doc
    labeled by the permille band of its salted key hash — map-only,
    reproducible, leak-free by construction (see operators/sampling.py
    hash_split)."""
    from ecommerce_dataengineering_project_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, ["doc_id"], SPLIT_CUTS).select(
        "doc_id", "source", "split"
    )


VOCAB_SIZE = 64


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage: top-64 corpus vocabulary, per-doc OOV token
    fraction (see operators/text.py vocab_coverage)."""
    from ecommerce_dataengineering_project_spark.operators.text import vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    return vocab_coverage(docs, vocab_size=VOCAB_SIZE)


QUERIES = {
    "split_train_val_test": q_split_train_val_test,
    "vocab_coverage": q_vocab_coverage,
    "text_stats": q_text_stats,
    "language_id": q_language_id,
    "doc_fingerprint": q_doc_fingerprint,
    "token_histogram": q_token_histogram,
    "token_counts": q_token_counts,
    "rolling_fingerprint": q_rolling_fingerprint,
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_search": q_bm25_search,
    "chunk_documents": q_chunk_documents,
    "chunk_documents_udtf": q_chunk_documents_udtf,
    "shuffle_corpus": q_shuffle_corpus,
    "pack_training_bins": q_pack_training_bins,
    "pii_scrub": q_pii_scrub,
    "doc_repetition": q_doc_repetition,
    "ngram_repetition": q_ngram_repetition,
    "decontaminate": q_decontaminate,
    "mixture_sample": q_mixture_sample,
    "training_corpus": q_training_corpus,
    "corpus_pipeline_full": q_corpus_pipeline_full,
    "curriculum_order": q_curriculum_order,
    "corpus_report": q_corpus_report,
}


def _bm25_oracle() -> str:
    split = "STRING_SPLIT(text, ' ')"
    tf_cols = ",\n                   ".join(
        f"CAST(LEN(LIST_FILTER({split}, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ",\n                   ".join(
        f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    # The score expression string is SHARED with the Spark side
    # (operators/text.bm25_score_sql), so both engines evaluate the
    # identical IEEE expression tree.
    score = bm25_score_sql(len(BM25_TERMS))
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(LEN({split}) AS BIGINT) AS dl,
                   {tf_cols}
            FROM documents
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS sum_dl,
                   {df_cols}
            FROM base
        ),
        scored AS (
            SELECT doc_id,
                   FLOOR(({score}) * 1000000.0 + 0.5) / 1000000.0 AS score
            FROM base CROSS JOIN stats
        ),
        top AS (
            SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
        )
        SELECT doc_id, score,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                    AS INTEGER) AS rank
        FROM top
    """

_CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

def _pii_oracle() -> str:
    from ecommerce_dataengineering_project_spark.operators.text import PII_PATTERNS

    seeded = (
        "text || ' contact u' || CAST(doc_id AS VARCHAR) || "
        "'@example.com call 555-201-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END"
    )
    # mirror the operator: each kind counts on the text already
    # cleaned of the earlier kinds, so overlapping spans attribute to
    # exactly one kind
    count_exprs = []
    clean = "s"
    for kind, pat in PII_PATTERNS.items():
        count_exprs.append(
            f"CAST(LEN(REGEXP_EXTRACT_ALL({clean}, '{pat}')) AS BIGINT) AS n_{kind}"
        )
        clean = f"REGEXP_REPLACE({clean}, '{pat}', '[{kind.upper()}]', 'g')"
    counts = ",\n               ".join(count_exprs)
    return f"""
        WITH seeded AS (SELECT doc_id, {seeded} AS s FROM documents)
        SELECT doc_id,
               {counts},
               {clean} AS clean_text
        FROM seeded
    """


ORACLES = {
    "pii_scrub": _pii_oracle(),
    # Mirrors operators/text.py ngram_repetition (n=2): window list via
    # GENERATE_SERIES, duplicate mass = sum of counts > 1.
    "ngram_repetition": """
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
        ),
        g AS (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram
            FROM t, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 1, 0))) AS s(i)
        ),
        per_gram AS (
            SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_grams,
               CAST(COUNT(*) AS BIGINT) AS distinct_grams,
               FLOOR((SUM(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / SUM(c))
                     * 1000000.0 + 0.5) / 1000000.0 AS dup_gram_ratio
        FROM per_gram
        GROUP BY doc_id
    """,
    # Mirrors operators/text.py decontaminate (n=3): benchmark =
    # doc_id % 97 == 0, trigram windows via GENERATE_SERIES, hit =
    # gram present in the benchmark's distinct gram set.
    "decontaminate": f"""
        WITH bt AS (
            SELECT STRING_SPLIT(text, ' ') AS toks FROM documents
            WHERE doc_id % {BENCH_MOD} = 0
        ),
        bench AS (
            SELECT DISTINCT toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
            FROM bt, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 2, 0))) AS s(i)
        ),
        ct AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
            WHERE doc_id % {BENCH_MOD} <> 0
        ),
        g AS (
            SELECT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
            FROM ct, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 2, 0))) AS s(i)
        ),
        m AS (
            SELECT g.doc_id, g.gram, b.gram IS NOT NULL AS hit
            FROM g LEFT JOIN bench b ON g.gram = b.gram
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated,
               CAST(COUNT(DISTINCT CASE WHEN hit THEN gram END) AS BIGINT)
                   AS distinct_contaminated,
               FLOOR((SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 1.0 / COUNT(*))
                     * 1000000.0 + 0.5) / 1000000.0 AS contamination_ratio,
               SUM(CASE WHEN hit THEN 1 ELSE 0 END) > 0 AS is_contaminated
        FROM m
        GROUP BY doc_id
    """,
    # Mirrors operators/text.py repetition_stats: exact counts, then
    # rational ratios with the shared round-half-up convention.
    "doc_repetition": """
        WITH tok AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
        ),
        per_token AS (
            SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS token_count,
               CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
               FLOOR((1.0 - COUNT(*) * 1.0 / SUM(c)) * 1000000.0 + 0.5) / 1000000.0
                   AS repetition_ratio,
               FLOOR((MAX(c) * 1.0 / SUM(c)) * 1000000.0 + 0.5) / 1000000.0
                   AS top_token_share
        FROM per_token
        GROUP BY doc_id
    """,
    # Mirrors operators/sampling.py deterministic_shuffle: the same
    # sha-256-prefix hash drives shard assignment and in-shard rank.
    "shuffle_corpus": f"""
        WITH h AS (
            SELECT doc_id,
                   CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'shuffle',
                        CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
            FROM documents
        )
        SELECT doc_id,
               CAST(hv % {SHUFFLE_SHARDS} AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY hv % {SHUFFLE_SHARDS}
                                       ORDER BY hv ASC, doc_id ASC) AS BIGINT) AS pos
        FROM h
    """,
    # chunk -> shuffle -> pack, each stage mirroring its Spark operator
    # (chunk arithmetic, sha-prefix shard/rank, windowed running sum).
    "pack_training_bins": f"""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
        ),
        s AS (
            SELECT doc_id, toks,
                   UNNEST(RANGE(1, GREATEST(LEN(toks) - {CHUNK_OVERLAP}, 1) + 1,
                                {_CHUNK_STRIDE})) AS chunk_start
            FROM t
        ),
        c AS (
            SELECT doc_id,
                   CAST((chunk_start - 1) // {_CHUNK_STRIDE} AS INTEGER) AS chunk_id,
                   CAST(LEN(toks[chunk_start : chunk_start + {CHUNK_TOKENS} - 1])
                        AS BIGINT) AS n_chunk_tokens
            FROM s
        ),
        h AS (
            SELECT *, CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'shuffle',
                          CAST(doc_id AS VARCHAR), CAST(chunk_id AS VARCHAR))),
                          1, 15)) AS BIGINT) AS hv
            FROM c
        ),
        o AS (
            SELECT doc_id, chunk_id, n_chunk_tokens,
                   CAST(hv % {SHUFFLE_SHARDS} AS INTEGER) AS shard,
                   CAST(ROW_NUMBER() OVER (PARTITION BY hv % {SHUFFLE_SHARDS}
                                           ORDER BY hv ASC, doc_id ASC, chunk_id ASC)
                        AS BIGINT) AS pos
            FROM h
        ),
        packed AS (
            SELECT doc_id, chunk_id, shard, pos,
                   CAST(COALESCE(SUM(n_chunk_tokens) OVER (
                            PARTITION BY shard ORDER BY pos ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS token_offset
            FROM o
        )
        SELECT doc_id, chunk_id, shard, pos, token_offset,
               CAST(token_offset // {PACK_BUDGET} AS BIGINT) AS bin_id,
               CAST(token_offset % {PACK_BUDGET} AS BIGINT) AS bin_offset
        FROM packed
    """,
    # Mirrors operators/text.py chunk_documents: starts 1, 1+stride, ...
    # up to n_tokens - overlap (always at least one chunk); DuckDB list
    # slicing is inclusive-and-clamping like Spark's slice().
    "chunk_documents": f"""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
        ),
        s AS (
            SELECT doc_id, toks,
                   UNNEST(RANGE(1, GREATEST(LEN(toks) - {CHUNK_OVERLAP}, 1) + 1,
                                {_CHUNK_STRIDE})) AS chunk_start
            FROM t
        )
        SELECT doc_id,
               CAST((chunk_start - 1) // {_CHUNK_STRIDE} AS INTEGER) AS chunk_id,
               CAST(chunk_start AS INTEGER) AS chunk_start,
               ARRAY_TO_STRING(toks[chunk_start : chunk_start + {CHUNK_TOKENS} - 1],
                               ' ') AS chunk_text,
               CAST(LEN(toks[chunk_start : chunk_start + {CHUNK_TOKENS} - 1])
                    AS BIGINT) AS n_chunk_tokens
        FROM s
    """,
    "text_stats": f"""
        WITH t AS (
            SELECT doc_id, text,
                   LENGTH(text) AS text_len,
                   LEN(STRING_SPLIT(text, ' ')) AS token_count,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                   w -> w IN ({_STOP_SQL}))) AS n_stop
            FROM documents
        )
        SELECT doc_id,
               CAST(text_len AS BIGINT) AS text_len,
               CAST(token_count AS BIGINT) AS token_count,
               FLOOR(((text_len - (token_count - 1)) * 1.0 / token_count) * 1000000.0 + 0.5) / 1000000.0
                   AS avg_token_len,
               FLOOR((n_stop * 1.0 / token_count) * 1000000.0 + 0.5) / 1000000.0
                   AS stopword_ratio,
               FLOOR((LEAST(1.0, token_count / 100.0)
                      * (1.0 - n_stop * 1.0 / token_count)) * 1000000.0 + 0.5) / 1000000.0
                   AS quality_score
        FROM t
    """,
    "language_id": """
        WITH t AS (
            SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS ws,
                   LEN(STRING_SPLIT(text, ' ')) AS n
            FROM documents
        ), s AS (
            SELECT doc_id, lang,
                LEN(LIST_FILTER(ws, w -> w IN ('the','a','of','and'))) * 1.0 / n AS s_en,
                LEN(LIST_FILTER(ws, w -> w IN ('der','die','das','und'))) * 1.0 / n AS s_de,
                LEN(LIST_FILTER(ws, w -> w IN ('el','la','de','y'))) * 1.0 / n AS s_es,
                LEN(LIST_FILTER(ws, w -> w IN ('le','la','de','et'))) * 1.0 / n AS s_fr
            FROM t
        )
        SELECT doc_id, lang,
               CASE WHEN GREATEST(s_en, s_de, s_es, s_fr) <= 0.0 THEN 'zh'
                    WHEN s_en = GREATEST(s_en, s_de, s_es, s_fr) THEN 'en'
                    WHEN s_de = GREATEST(s_en, s_de, s_es, s_fr) THEN 'de'
                    WHEN s_es = GREATEST(s_en, s_de, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS predicted_lang,
               FLOOR(GREATEST(s_en, s_de, s_es, s_fr) * 1000000.0 + 0.5) / 1000000.0 AS lang_score
        FROM s
    """,
    "doc_fingerprint": """
        SELECT doc_id,
               SHA256(LOWER(TRIM(text))) AS fingerprint,
               CAST(CONCAT('0x', SUBSTR(SHA256(LOWER(TRIM(text))), 1, 15)) AS BIGINT)
                   AS fingerprint_bucket
        FROM documents
    """,
    "token_histogram": """
        SELECT w AS token, COUNT(*) AS total_count
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
        GROUP BY 1
    """,
    "token_counts": f"""
        SELECT doc_id,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS word_count,
               CAST(LEN(REGEXP_EXTRACT_ALL(text, '{BPE_PRETOKEN_RE}')) AS BIGINT)
                   AS bpe_piece_count,
               CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS token_budget_est
        FROM documents
    """,
    # quality filter -> keep-first dedup -> hash downsample, composed
    "training_corpus": f"""
        WITH t AS (
            SELECT doc_id, lang, text,
                   LEN(STRING_SPLIT(text, ' ')) AS token_count,
                   LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                   w -> w IN ({_STOP_SQL}))) AS n_stop
            FROM documents
        ),
        q AS (
            SELECT doc_id, lang, text, token_count,
                   FLOOR((LEAST(1.0, token_count / 100.0)
                          * (1.0 - n_stop * 1.0 / token_count)) * 1000000.0 + 0.5)
                       / 1000000.0 AS quality_score
            FROM t
        ),
        k AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY SHA256(LOWER(TRIM(text))) ORDER BY doc_id) AS rn
            FROM q WHERE quality_score >= 0.5
        )
        SELECT doc_id, lang, CAST(token_count AS BIGINT) AS token_count,
               quality_score
        FROM k
        WHERE rn = 1
          AND CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'corpus',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 < 500
    """,
    # rational idf (n_docs / doc_freq) — no log, so values are exact
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
            FROM documents
        ),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT token, COUNT(*) AS doc_freq
               FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   FLOOR((tf.tf * nd.n_docs * 1.0 / df.doc_freq) * 1000000.0 + 0.5)
                       / 1000000.0 AS tfidf
            FROM tf JOIN df USING (token) CROSS JOIN nd
        )
        SELECT doc_id, token, tfidf, CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, token ASC) AS rank
            FROM scored
        ) WHERE rank <= 5
    """,
    "bm25_search": _bm25_oracle(),
    # identical left fold: acc = (acc*B + code) mod M, seeded with 0
    "rolling_fingerprint": f"""
        SELECT doc_id,
               LIST_REDUCE(
                   LIST_PREPEND(CAST(0 AS BIGINT),
                       LIST_TRANSFORM(STRING_SPLIT(text, ''),
                                      c -> CAST(ASCII(c) AS BIGINT))),
                   (acc, c) -> (acc * {ROLLING_BASE} + c) % {ROLLING_MOD}
               ) AS rolling_hash
        FROM documents
    """,
}

_MIX_WEIGHT_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(MIXTURE_TARGET.items())
) + " ELSE 0 END"

# Mirrors operators/sampling.py mixture_resample: integer-arithmetic
# per-stratum rates (min(1000, (target * total) div n)), then the
# sha-prefix hash-threshold keep decision with salt 'mixture'.
ORACLES["mixture_sample"] = f"""
    WITH c AS (
        SELECT lang, {_MIX_WEIGHT_CASE} AS w, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM documents),
    r AS (
        SELECT lang,
               CAST(LEAST(1000, (w * total) // n) AS BIGINT) AS rate_permille
        FROM c CROSS JOIN t
    )
    SELECT d.doc_id, d.lang, r.rate_permille
    FROM documents d JOIN r ON r.lang = d.lang
    WHERE CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'mixture',
              CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000
          < r.rate_permille
"""

# Mirrors operators/sampling.py hash_split: band of the salt-'split'
# sha-prefix hash — [0,800) train, [800,900) val, [900,1000) test.
ORACLES["split_train_val_test"] = """
    SELECT doc_id, source,
           CASE WHEN h < 800 THEN 'train'
                WHEN h < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'split',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 AS h
        FROM documents
    )
"""

# The UDTF twin is semantically identical to the built-in chunker by
# contract (tests/test_chunking.py parity test) — same oracle.
ORACLES["chunk_documents_udtf"] = ORACLES["chunk_documents"]

# Mirrors operators/text.py vocab_coverage: same top-V cut (count desc,
# token asc), same single integer/integer division for the ratio.
ORACLES["vocab_coverage"] = f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    vocab AS (
        SELECT token FROM (
            SELECT token, COUNT(*) AS c FROM tok GROUP BY 1
        ) ORDER BY c DESC, token ASC LIMIT {VOCAB_SIZE}
    ),
    oov AS (
        SELECT t.doc_id, COUNT(*) AS n_oov
        FROM tok t LEFT JOIN vocab v USING (token)
        WHERE v.token IS NULL
        GROUP BY 1
    ),
    base AS (
        SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT b.doc_id, b.n_tokens,
           CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov,
           FLOOR((CAST(COALESCE(o.n_oov, 0) AS DOUBLE) / CAST(b.n_tokens AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS oov_ratio
    FROM base b LEFT JOIN oov o USING (doc_id)
"""

# The five-stage pipeline end-to-end: quality CTEs from
# training_corpus, gram CTEs from decontaminate, the split band from
# split_train_val_test, chunk arithmetic from chunk_documents — the
# composition (stage order, no-gram docs kept, leak-free split) is
# what this oracle pins.
ORACLES["corpus_pipeline_full"] = f"""
    WITH t AS (
        SELECT doc_id, text,
               LEN(STRING_SPLIT(text, ' ')) AS token_count,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                               w -> w IN ({_STOP_SQL}))) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, text,
               FLOOR((LEAST(1.0, token_count / 100.0)
                      * (1.0 - n_stop * 1.0 / token_count)) * 1000000.0 + 0.5)
                   / 1000000.0 AS quality_score
        FROM t
    ),
    k AS (
        SELECT doc_id, text, ROW_NUMBER() OVER (
            PARTITION BY SHA256(LOWER(TRIM(text))) ORDER BY doc_id) AS rn
        FROM q
        WHERE quality_score >= {QUALITY_MIN} AND doc_id % {BENCH_MOD} <> 0
    ),
    first AS (SELECT doc_id, text FROM k WHERE rn = 1),
    bt AS (
        SELECT STRING_SPLIT(text, ' ') AS toks FROM documents
        WHERE doc_id % {BENCH_MOD} = 0
    ),
    bench AS (
        SELECT DISTINCT toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
        FROM bt, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 2, 0))) AS s(i)
    ),
    bad AS (
        SELECT DISTINCT f.doc_id
        FROM (
            SELECT doc_id,
                   toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM first),
                 UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks) - 2, 0))) AS s(i)
        ) f JOIN bench b ON f.gram = b.gram
    ),
    train AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS toks
        FROM first
        WHERE doc_id NOT IN (SELECT doc_id FROM bad)
          AND CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'split',
                  CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 < 800
    ),
    s AS (
        SELECT doc_id, toks,
               UNNEST(RANGE(1, GREATEST(LEN(toks) - {CHUNK_OVERLAP}, 1) + 1,
                            {_CHUNK_STRIDE})) AS chunk_start
        FROM train
    )
    SELECT doc_id,
           CAST((chunk_start - 1) // {_CHUNK_STRIDE} AS INTEGER) AS chunk_id,
           CAST(chunk_start AS INTEGER) AS chunk_start,
           CAST(LEN(toks[chunk_start : chunk_start + {CHUNK_TOKENS} - 1])
                AS BIGINT) AS n_chunk_tokens
    FROM s
"""

# Same shard hash as shuffle_corpus (salt 'curriculum'); within-shard
# order is (quality desc, token_count desc, doc_id) — a total order.
ORACLES["curriculum_order"] = f"""
    WITH t AS (
        SELECT doc_id, text,
               LEN(STRING_SPLIT(text, ' ')) AS token_count,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                               w -> w IN ({_STOP_SQL}))) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, token_count,
               FLOOR((LEAST(1.0, token_count / 100.0)
                      * (1.0 - n_stop * 1.0 / token_count)) * 1000000.0 + 0.5)
                   / 1000000.0 AS quality_score
        FROM t
    ),
    s AS (
        SELECT doc_id, quality_score, token_count,
               CAST(CAST(CONCAT('0x', SUBSTR(SHA256(CONCAT_WS('_', 'curriculum',
                   CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                   % {SHUFFLE_SHARDS} AS INTEGER) AS shard
        FROM q
    )
    SELECT doc_id, quality_score, shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY shard
               ORDER BY quality_score DESC, token_count DESC, doc_id ASC
           ) AS BIGINT) AS pos
    FROM s
"""

# Scalar rollup of already-checked relations; micro-unit mean.
ORACLES["corpus_report"] = f"""
    WITH t AS (
        SELECT doc_id, text,
               LEN(STRING_SPLIT(text, ' ')) AS token_count,
               LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                               w -> w IN ({_STOP_SQL}))) AS n_stop
        FROM documents
    ),
    q AS (
        SELECT doc_id, text, token_count,
               FLOOR((LEAST(1.0, token_count / 100.0)
                      * (1.0 - n_stop * 1.0 / token_count)) * 1000000.0 + 0.5)
                   / 1000000.0 AS quality_score
        FROM t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(token_count) AS BIGINT) AS total_tokens,
           FLOOR(CAST(SUM(CAST(FLOOR(quality_score * 1000000.0 + 0.5) AS BIGINT))
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5) / 1000000.0
               AS mean_quality,
           CAST(COUNT(*) - COUNT(DISTINCT SHA256(LOWER(TRIM(text)))) AS BIGINT)
               AS n_exact_dups,
           CAST(SUM(CASE WHEN quality_score >= {QUALITY_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass_quality
    FROM q
"""


PAD_BATCH = 32


def q_padding_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inference batching: docs sorted by token count and cut into
    fixed-size batches, so each batch pads to a near-uniform length —
    the length-bucketing every serving stack uses. Per batch: size,
    max token length (the padded width), total real tokens, and the
    padding waste fraction as one exact-integer-ratio double.

    The global length order is a single ntile-style window on the
    (doc_id-tiebroken) token count — it ranks the date-cardinality-like
    scored relation, not raw text; at extreme scale the same contract
    holds with a range-partitioned sort."""
    from ecommerce_dataengineering_project_spark.functions.scalars import (
        round_half_up,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    batched = docs.withColumn(
        "batch_id",
        F.expr(f"(row_number() OVER (ORDER BY n_tokens ASC, doc_id ASC) - 1) "
               f"div {PAD_BATCH}").cast("int"),
    )
    return batched.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("batch_size"),
        F.max("n_tokens").alias("padded_len"),
        F.sum("n_tokens").cast("bigint").alias("real_tokens"),
        round_half_up(
            F.lit(1.0)
            - F.sum("n_tokens").cast("double")
            / (F.count(F.lit(1)) * F.max("n_tokens")).cast("double"),
            6,
        ).alias("pad_waste"),
    )


QUERIES["padding_batches"] = q_padding_batches

ORACLES["padding_batches"] = f"""
    WITH d AS (
        SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER)
                   AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT *, CAST((ROW_NUMBER() OVER (
                   ORDER BY n_tokens ASC, doc_id ASC) - 1)
                   // {PAD_BATCH} AS INTEGER) AS batch_id
        FROM d
    )
    SELECT batch_id,
           CAST(COUNT(*) AS BIGINT) AS batch_size,
           MAX(n_tokens) AS padded_len,
           CAST(SUM(n_tokens) AS BIGINT) AS real_tokens,
           FLOOR((1.0 - CAST(SUM(n_tokens) AS DOUBLE)
                  / CAST(COUNT(*) * MAX(n_tokens) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS pad_waste
    FROM r GROUP BY 1
"""


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29 (tokenizer training, iteration 1): weighted adjacent
    character-pair counts over the corpus word-frequency relation —
    the argmax of this relation IS the first BPE merge. Fully
    oracle-checked (top 20 under a total order); the 5-iteration
    trainer is `bpe_merges` (rows-only: its loop state is a Spark
    fold, pinned against a pure-Python reference in tests/test_bpe.py).
    Scale: the corpus is scanned once into the vocabulary-sized word
    relation; the pair count is one shuffle on the pair key."""
    from ecommerce_dataengineering_project_spark.operators.bpe import (
        pair_counts,
        word_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        pair_counts(word_counts(docs))
        .select(
            F.col("left").alias("lhs"),
            F.col("right").alias("rhs"),
            "pair_count",
        )
        .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
        .limit(20)
    )


QUERIES["bpe_pair_counts"] = q_bpe_pair_counts

ORACLES["bpe_pair_counts"] = """
    WITH words AS (
        SELECT word, COUNT(*) AS cnt FROM (
            SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS word
            FROM documents
        ) WHERE length(word) >= 2 GROUP BY word
    ),
    pairs AS (
        SELECT substr(word, CAST(i AS INT), 1) AS lhs,
               substr(word, CAST(i AS INT) + 1, 1) AS rhs,
               cnt
        FROM words, LATERAL UNNEST(range(1, length(word))) AS t(i)
    )
    SELECT lhs, rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY lhs, rhs
    ORDER BY pair_count DESC, lhs, rhs
    LIMIT 20
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29: the 5-iteration greedy BPE merge trainer — each step one
    pair-keyed shuffle over the vocabulary relation + a one-row argmax
    collect, merge applied via a codegen sequential fold (greedy
    left-to-right on overlaps, the standard BPE contract).
    Hash-checked: the fixed merge count makes the trainer
    SQL-expressible by UNROLLING the five greedy steps into a CTE
    chain (the mmr_diversified_topk discipline) — see
    _bpe_merges_oracle below. Equivalence to a pure-Python reference
    trainer and partitioning-invariance stay pinned in
    tests/test_bpe.py."""
    from ecommerce_dataengineering_project_spark.operators.bpe import train_merges

    docs = load_table(spark, sf_dir, "documents")
    return train_merges(docs, n_merges=5)


QUERIES["bpe_merges"] = q_bpe_merges


def _bpe_merges_oracle(n_merges: int = 5) -> str:
    """The trainer unrolled into SQL: each step re-derives weighted
    adjacent-pair counts from the CURRENT segmentation, takes the
    argmax with the (pair_count DESC, left, right) tie-break, and
    applies the merge. Segmentations ride the guarded-symbol string
    the ENCODER already proved equivalent (operators/bpe.py:
    encode_token_count_expr): ``low`` -> ``<l><o><w>``, one merge is
    one ``replace('<l><r>', '<lr>')``, and left-to-right
    non-overlapping replace IS the greedy fold (``<a><a><a><a>`` ->
    ``<aa><aa>``), with the guards making cross-symbol matches
    impossible. Pair extraction zips the symbol list with its own
    tail — the same shape as operators/bpe.py pair_counts."""
    parts = [
        """WITH words AS (
        SELECT word, COUNT(*) AS cnt FROM (
            SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS word
            FROM documents
        ) WHERE length(word) >= 2 GROUP BY word
    ),
    seg1 AS (
        SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS seg, cnt FROM words
    )"""
    ]
    for s in range(1, n_merges + 1):
        parts.append(
            f""",
    pc{s} AS (
        SELECT p[1] AS lhs, p[2] AS rhs,
               CAST(SUM(cnt) AS BIGINT) AS pair_count
        FROM (
            SELECT UNNEST(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS p, cnt
            FROM (SELECT regexp_extract_all(seg, '<([^<>]+)>', 1) AS syms, cnt
                  FROM seg{s})
        )
        GROUP BY 1, 2
    ),
    m{s} AS (
        SELECT lhs, rhs, pair_count FROM pc{s}
        ORDER BY pair_count DESC, lhs, rhs LIMIT 1
    ),
    seg{s + 1} AS (
        SELECT replace(seg, '<' || m.lhs || '><' || m.rhs || '>',
                            '<' || m.lhs || m.rhs || '>') AS seg, cnt
        FROM seg{s}, m{s} m
    )"""
        )
    union = "\n    UNION ALL ".join(
        f'SELECT CAST({s} AS INTEGER) AS step, lhs AS "left", rhs AS "right",'
        f" lhs || rhs AS merged, pair_count FROM m{s}"
        for s in range(1, n_merges + 1)
    )
    return "".join(parts) + "\n    " + union


ORACLES["bpe_merges"] = _bpe_merges_oracle()


# A fixed "released tokenizer" merge list (common English pairs, merges
# build on earlier merges as in any real BPE vocabulary).
BPE_VOCAB = [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n")]


def q_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X29 apply side: tokenize the corpus with a FIXED merge list (the
    production shape — you encode with a released vocabulary, you don't
    retrain per batch; the trainer is bpe_merges). Per word the
    segmentation rides a guarded-symbol string and each merge is one
    left-to-right string replace == greedy BPE; per doc the counts sum.
    Pure codegen string kernels on both engines — the whole encoding is
    hash-checked against DuckDB running the identical replaces."""
    from ecommerce_dataengineering_project_spark.operators.bpe import (
        encode_token_count_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
    ).where(F.length("w") > 0)
    per_word = words.select(
        "doc_id",
        F.length("w").alias("chars"),
        encode_token_count_expr(F.col("w"), BPE_VOCAB).alias("toks"),
    )
    return per_word.groupBy("doc_id").agg(
        F.sum("chars").alias("n_char_tokens"),
        F.sum("toks").alias("n_bpe_tokens"),
    )


QUERIES["bpe_encode_tokens"] = q_bpe_encode_tokens


def _bpe_encode_oracle() -> str:
    from ecommerce_dataengineering_project_spark.operators.bpe import (
        sql_encode_token_count,
    )

    expr = sql_encode_token_count("w", BPE_VOCAB)
    return f"""
        WITH words AS (
            SELECT doc_id, UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        )
        SELECT doc_id,
               CAST(SUM(length(w)) AS BIGINT) AS n_char_tokens,
               CAST(SUM({expr}) AS BIGINT) AS n_bpe_tokens
        FROM words
        WHERE length(w) > 0
        GROUP BY doc_id
    """


ORACLES["bpe_encode_tokens"] = _bpe_encode_oracle()


def q_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear classifier inference (operators/text.py
    classifier_scores — the fastText-shaped quality filter every
    pretraining pipeline runs): per-document BIGINT score as ONE
    map-only codegen fold over the token array (no explode, no
    shuffle, no Python), keep/filter label at the zero threshold.
    Weights are a deterministic integer ladder standing in for a
    released model (a real model is a broadcast bucket->weight lookup
    with the identical plan shape)."""
    from ecommerce_dataengineering_project_spark.operators.text import classifier_scores

    return classifier_scores(load_table(spark, sf_dir, "documents"))


QUERIES["quality_classifier_scores"] = q_quality_classifier_scores


def _classifier_oracle() -> str:
    from ecommerce_dataengineering_project_spark.operators.text import (
        sql_classifier_score,
    )

    score = sql_classifier_score("text")
    return f"""
        SELECT doc_id,
               CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS token_count,
               {score} AS score_micro,
               CASE WHEN {score} > 0 THEN 'keep' ELSE 'filter' END AS label
        FROM documents
    """


ORACLES["quality_classifier_scores"] = _classifier_oracle()


RESERVOIR_K = 20


def q_reservoir_per_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k-per-stratum deterministic sample
    (operators/sampling.py reservoir_exact_k): exactly 20 documents per
    language, ranked by a salted portable hash — the eval-slice shape a
    permille rate cannot express. Catalyst turns the rank<=k filter
    into a map-side WindowGroupLimit partial top-k (plan pinned in
    tests/test_mixture.py), so the stratum never ships to the shuffle
    whole."""
    from ecommerce_dataengineering_project_spark.operators.sampling import (
        reservoir_exact_k,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return reservoir_exact_k(docs, ["doc_id"], "lang", RESERVOIR_K)


QUERIES["reservoir_per_language"] = q_reservoir_per_language

ORACLES["reservoir_per_language"] = f"""
    SELECT doc_id, lang, CAST(rk AS INTEGER) AS sample_rank
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(CONCAT('0x', SUBSTR(SHA256(
                       'reservoir|' || CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) ASC, doc_id ASC) AS rk
        FROM documents
    ) WHERE rk <= {RESERVOIR_K}
"""


def q_mixture_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture drift monitor (operators/text.py
    mixture_divergence): per-source KL and JS divergence of the
    add-one-smoothed unigram token distribution against the blended
    corpus. The mixture-health dashboard row every large-scale
    pretraining pipeline watches: a drifting source spikes here long
    before a downstream eval moves."""
    from ecommerce_dataengineering_project_spark.operators.text import (
        mixture_divergence,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    return mixture_divergence(docs, slice_col="source", text_col="text")


QUERIES["mixture_divergence"] = q_mixture_divergence

# Mirrors the operator stage-for-stage: (slice, token) counts -> corpus
# token counts -> slice totals -> (V, tot) scalars -> slice x vocab
# grid with smoothed p/q -> summed ln terms rounded half-up at 1e-6
# (the doc_perplexity float policy: ln inputs are exact integer
# ratios; the rounded sum absorbs sum-order ulp noise).
ORACLES["mixture_divergence"] = """
    WITH tok AS (
        SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt_st
        FROM tok GROUP BY 1, 2
    ),
    tokc AS (
        SELECT token, CAST(SUM(cnt_st) AS BIGINT) AS cnt_t
        FROM st GROUP BY 1
    ),
    tots AS (
        SELECT source, CAST(SUM(cnt_st) AS BIGINT) AS tot_s
        FROM st GROUP BY 1
    ),
    scal AS (
        SELECT CAST(SUM(cnt_t) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM tokc
    ),
    grid AS (
        SELECT tots.source, tots.tot_s, tokc.cnt_t,
               COALESCE(st.cnt_st, 0) AS cnt_st
        FROM tokc CROSS JOIN tots
        LEFT JOIN st ON st.source = tots.source AND st.token = tokc.token
    ),
    terms AS (
        SELECT source, tot_s, cnt_st,
               CAST(cnt_st + 1 AS DOUBLE) / (tot_s + v) AS p,
               CAST(cnt_t + 1 AS DOUBLE) / (tot + v) AS q
        FROM grid CROSS JOIN scal
    )
    SELECT source,
           MAX(tot_s) AS n_tokens,
           CAST(SUM(CASE WHEN cnt_st > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_present_vocab,
           FLOOR(SUM(p * LN(p / q)) * 1000000.0 + 0.5) / 1000000.0
               AS kl_vs_corpus,
           FLOOR(SUM(0.5 * (p * LN(p / ((p + q) / 2))
                            + q * LN(q / ((p + q) / 2)))) * 1000000.0
                 + 0.5) / 1000000.0
               AS js_vs_corpus
    FROM terms
    GROUP BY source
"""
