"""Text-analysis operators for training-data pipelines (SURVEY §2k X4).

All pure column expressions (split/filter/aggregate lambdas run in the
JVM) — at 100 TB nothing here leaves whole-stage codegen, there is no
Python in the row path, and every op is embarrassingly parallel
(per-row, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.scalars import round_half_up

# Corpus-relative function words; used for quality scoring.
STOPWORDS = ("the", "a", "data", "value")

# Marker-word profiles for the language-ID heuristic. Real deployments
# plug in per-language frequency profiles; the heuristic structure
# (score = marker hit-rate, argmax with fixed tie order) is what the
# operator provides.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "de", "et"),
    "zh": (),  # ideographic: detected by absence of latin function words
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization (single-space corpora split exactly)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / stopword / quality statistics per document.

    quality_score is a simple bounded heuristic: longer docs score
    higher (capped at 100 tokens), stopword-heavy docs score lower —
    the standard shape of pretraining quality filters.
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    stop_ratio = n_stop.cast("double") / n_tok
    return (
        df.withColumn("text_len", F.length(F.col(text_col)).cast("bigint"))
        .withColumn("token_count", n_tok.cast("bigint"))
        .withColumn(
            "avg_token_len",
            round_half_up(
                (F.col("text_len") - (F.col("token_count") - 1)) / F.col("token_count"), 6
            ),
        )
        .withColumn("stopword_ratio", round_half_up(stop_ratio, 6))
        .withColumn(
            "quality_score",
            round_half_up(
                F.least(F.lit(1.0), F.col("token_count") / F.lit(100.0))
                * (F.lit(1.0) - stop_ratio),
                6,
            ),
        )
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: hit-rate per language profile, argmax
    with a fixed tie order (en > de > es > fr), 'zh' when nothing
    latin matches."""
    toks = tokens(text_col)
    n_tok = F.size(toks)
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        if not markers:
            continue
        arr = F.array(*[F.lit(w) for w in markers])
        scores[lang] = (
            F.size(F.filter(toks, lambda w: F.array_contains(arr, w))).cast("double") / n_tok
        )
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0.0, F.lit("zh"))
    for lang in ("en", "de", "es", "fr"):  # fixed tie order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.withColumn("predicted_lang", pred).withColumn(
        "lang_score", round_half_up(best, 6)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint: sha-256 of the normalized text plus a
    60-bit integer prefix (cheap join/bucket key for dedup)."""
    norm = F.lower(F.trim(F.col(text_col)))
    h = F.sha2(norm, 256)
    return df.withColumn("fingerprint", h).withColumn(
        "fingerprint_bucket", F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    )


# GPT-2-style pre-tokenizer shape: alphanumeric runs OR single
# non-space symbols (the regex survives both Java and RE2 dialects, so
# oracles reproduce it exactly).
BPE_PRETOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

ROLLING_BASE = 31
ROLLING_MOD = (1 << 31) - 1


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting three ways (the LLM-pipeline staple): whitespace
    words, BPE-ish pre-token pieces (regex runs), and the chars/4
    budget heuristic. All codegen'd column ops."""
    pieces = F.expr(f"regexp_extract_all(`{text_col}`, '{BPE_PRETOKEN_RE}', 0)")
    return (
        df.withColumn("word_count", F.size(tokens(text_col)).cast("bigint"))
        .withColumn("bpe_piece_count", F.size(pieces).cast("bigint"))
        .withColumn(
            "token_budget_est",
            F.ceil(F.length(F.col(text_col)) / F.lit(4.0)).cast("bigint"),
        )
    )


def with_rolling_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial (Rabin-Karp) rolling hash over the character stream:
    ``h = (h*31 + code(c)) mod (2^31-1)`` folded left. The per-step
    product stays < 2^36, safe in int64 on any engine — the oracle
    folds the identical recurrence."""
    chars = F.split(F.col(text_col), "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * ROLLING_BASE + F.ascii(ch)) % ROLLING_MOD,
    )
    return df.withColumn("rolling_hash", h)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_score_sql(n_terms: int) -> str:
    """The BM25 score as ONE SQL expression over columns
    ``tf_i``/``df_i`` (per query term), ``dl``, ``n_docs``, ``sum_dl``.

    Robertson–Sparck Jones BM25 with the Lucene ``ln(1 + ...)``
    non-negative idf:

        idf_t  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d)   = sum_t idf_t * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    The SAME string is evaluated by Spark (``F.expr``) and by the
    DuckDB oracle, so both engines build the identical IEEE-754
    expression tree over identical integer inputs; the only residual
    cross-engine drift is the last ulp of ``LN`` (JVM vs libm), which
    the round-to-6 output policy absorbs. Addition over terms is in
    fixed written order — never a data-order-dependent aggregate.
    """
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    parts = []
    for i in range(n_terms):
        idf = (
            f"LN(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        )
        denom = (
            f"CAST(tf_{i} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B}"
            f" + {BM25_B} * (CAST(dl AS DOUBLE) / {avgdl}))"
        )
        parts.append(
            f"(CASE WHEN tf_{i} > 0 THEN {idf} *"
            f" (CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1.0}) / ({denom})"
            f" ELSE 0.0 END)"
        )
    return " + ".join(parts)


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a fixed term query, ranked by BM25.

    Dataflow at 100 TB: per-doc ``tf``/``dl`` come straight off the
    token array (map-only, no explode, no shuffle); the corpus
    statistics (N, total length, per-term doc frequency) are ONE tiny
    aggregate broadcast back; scoring is a codegen'd scalar expression;
    and the global top-k is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, never a full sort).
    """
    toks = tokens(text_col)
    base = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("dl", F.size("_toks").cast("bigint"))
    )
    def _matches(term: str):
        # one-arg closure: a two-arg lambda would be read as the
        # (element, index) form of F.filter
        return lambda w: w == F.lit(term)

    for i, t in enumerate(query_terms):
        base = base.withColumn(
            f"tf_{i}", F.size(F.filter(F.col("_toks"), _matches(t))).cast("bigint")
        )
    base = base.drop("_toks")
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")]
    aggs += [
        F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
        for i in range(len(query_terms))
    ]
    stats = base.agg(*aggs)
    scored = base.crossJoin(F.broadcast(stats)).withColumn(
        "score", round_half_up(F.expr(bm25_score_sql(len(query_terms))), 6)
    )
    top = (
        scored.select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window token chunking — the context-window prep step of
    an LLM training pipeline: windows of ``chunk_tokens`` whitespace
    tokens with ``overlap`` tokens shared between consecutive chunks
    (stride = chunk_tokens - overlap). The final window may be short;
    a window that would start inside the region the previous chunk
    already covered is not emitted (starts run to n - overlap).

    Scale shape: tokenize → sequence → posexplode → slice is MAP-ONLY
    (no shuffle, no Python); chunk rows stream out of the scan stage
    and the operator parallelizes with the input partitioning.
    """
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    return (
        df.select(
            F.col(id_col),
            tokens(text_col).alias("__toks"),
        )
        .withColumn(
            "chunk_start",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.greatest(F.size("__toks") - overlap, F.lit(1)),
                    F.lit(stride),
                )
            ),
        )
        .withColumn(
            "__chunk", F.slice(F.col("__toks"), F.col("chunk_start"), chunk_tokens)
        )
        .select(
            id_col,
            ((F.col("chunk_start") - 1) / stride).cast("int").alias("chunk_id"),
            "chunk_start",
            F.array_join("__chunk", " ").alias("chunk_text"),
            F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
        )
    )


def chunk_documents_udtf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Python UDTF twin of ``chunk_documents`` — the table-function arm
    of the §2j UDF surface (scalar pandas UDF / grouped map /
    mapInPandas / UDTF).  Semantics are IDENTICAL to the built-in
    composition (same starts, same clamped slices, shared oracle SQL
    and a row-for-row parity test), so the two are interchangeable;
    the built-in map-only version remains the production path, and
    this is the escape hatch shape for chunkers Spark expressions
    can't write (a real BPE tokenizer, sentence splitting, ...).

    Scale shape: Arrow-batched (``ArrowEvalPythonUDTF``) lateral join —
    still map-only with no shuffle; rows stream through Python batches
    with the input partitioning intact.
    """
    assert 0 <= overlap < chunk_tokens
    from pyspark.sql.functions import udtf

    stride = chunk_tokens - overlap

    @udtf(
        returnType=(
            "chunk_id int, chunk_start int, chunk_text string, "
            "n_chunk_tokens bigint"
        ),
        useArrow=True,
    )
    class _ChunkUdtf:
        def eval(self, text: str):  # noqa: ANN001 - UDTF signature
            if text is None:
                return
            toks = text.split(" ")
            # mirror chunk_documents: 1-based starts 1, 1+stride, ...,
            # last start <= max(n - overlap, 1); final slice may be short
            for start in range(1, max(len(toks) - overlap, 1) + 1, stride):
                chunk = toks[start - 1 : start - 1 + chunk_tokens]
                yield (
                    (start - 1) // stride,
                    start,
                    " ".join(chunk),
                    len(chunk),
                )

    spark = df.sparkSession
    # per-config registration name: re-registering "chunk_udtf" with a
    # different closure must not retarget a previously-built (lazy) plan
    fn_name = f"chunk_udtf_{chunk_tokens}_{overlap}"
    spark.udtf.register(fn_name, _ChunkUdtf)
    return spark.sql(
        f"""
        SELECT t.{id_col}, c.chunk_id, c.chunk_start, c.chunk_text,
               c.n_chunk_tokens
        FROM {{df}} t, LATERAL {fn_name}(t.{text_col}) c
        """,
        df=df,
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition/boilerplate quality metrics (the C4/Gopher-style
    filters): per document, the distinct-token ratio and the share of
    the single most frequent token. Highly repetitive machine text
    scores high on both; the downstream corpus filter thresholds them.

    Dataflow: ONE exchange — repartition by doc BEFORE the explode
    (hash partitioning on doc_id satisfies both the (doc, token) and
    the doc clustering, and ships whole documents instead of exploded
    token rows), then both groupBys aggregate in place. No Python;
    ratios are rational arithmetic over exact counts, so the whole
    thing oracle-checks bit-for-bit."""
    tok = df.repartition(F.col(id_col)).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    per_token = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    return per_token.groupBy(id_col).agg(
        F.sum("c").alias("token_count"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        round_half_up(1.0 - F.count(F.lit(1)) / F.sum("c"), 6).alias(
            "repetition_ratio"
        ),
        round_half_up(F.max("c") / F.sum("c"), 6).alias("top_token_share"),
    )


def ngram_array(toks_col: str, n: int) -> Column:
    """Space-joined n-gram windows over a tokens array column.

    Docs shorter than ``n`` tokens get an EMPTY list: Spark's
    ``sequence(1, 0)`` yields the DESCENDING ``[1, 0]`` (it is not
    empty like DuckDB's ``GENERATE_SERIES(1, 0)``), which would index
    past the token array — the guard makes short docs emit no grams,
    exactly like the oracle."""
    windows = F.expr(
        f"transform(sequence(1, size({toks_col}) - {n - 1}), "
        + "i -> concat_ws(' ', "
        + ", ".join(f"element_at({toks_col}, i + {k})" for k in range(n))
        + "))"
    )
    return F.when(F.size(toks_col) >= n, windows).otherwise(
        F.array().cast("array<string>")
    )


def ngram_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Duplicate-n-gram fraction per document — the Gopher repetition
    filter proper: how much of the document consists of n-grams that
    occur more than once. Same one-exchange shape as repetition_stats
    (repartition by doc before the explode); the n-gram windows are a
    map-side transform over a token-index sequence."""
    tok = (
        df.repartition(F.col(id_col))
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(F.col(id_col), F.explode(ngram_array("__toks", n)).alias("gram"))
    )
    per_gram = tok.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("distinct_grams"),
        round_half_up(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 6
        ).alias("dup_gram_ratio"),
    )


# Engine-portable PII patterns: Java-regex AND RE2 compatible (no
# backreferences or lookaround), so the same strings drive Spark
# regexp_replace/regexp_count and a DuckDB oracle. Replacement runs in
# this dict order; each kind COUNTS on the text after the earlier
def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination — the training-data hygiene step that
    flags corpus documents sharing verbatim n-grams with an evaluation
    set, so eval answers don't leak into training (the GPT-3 appendix-C
    / Pile procedure, expressed relationally).

    Per corpus document: total n-gram instances, how many of them (and
    how many distinct grams) also occur anywhere in the benchmark, the
    contaminated fraction, and a boolean flag. Callers drop or audit
    flagged docs; the threshold choice stays with the caller since
    severity is corpus-specific.

    Scale shape: eval sets are MB-scale against a TB corpus, so the
    benchmark's distinct gram set BROADCASTS — the corpus is never
    shuffled by the join. The corpus side repartitions by doc *before*
    the gram explode (same one-exchange layout as ngram_repetition),
    the broadcast left join is map-side, and the per-doc rollup reuses
    the pre-explode partitioning: ONE corpus exchange end-to-end.
    Docs shorter than ``n`` tokens have no grams and drop out (they
    cannot be contaminated; see ngram_array).
    """
    bench_grams = (
        benchmark.select(tokens(text_col).alias("__toks"))
        .select(F.explode(ngram_array("__toks", n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    grams = (
        corpus.repartition(F.col(id_col))
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(F.col(id_col), F.explode(ngram_array("__toks", n)).alias("gram"))
    )
    marked = grams.join(F.broadcast(bench_grams), on="gram", how="left")
    hit_gram = F.when(F.col("__hit").isNotNull(), F.col("gram"))
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("__hit").alias("n_contaminated"),
        F.count_distinct(hit_gram).alias("distinct_contaminated"),
        round_half_up(F.count("__hit") / F.count(F.lit(1)), 6).alias(
            "contamination_ratio"
        ),
        (F.count("__hit") > 0).alias("is_contaminated"),
    )


# kinds' replacements, so a span matched by two patterns (a phone
# number inside an email localpart) is attributed to exactly one kind
# — the one that actually redacted it.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # NANP-shaped 10-digit numbers: 555-201-0042 / 555.201.0042 /
    # 555 201 0042 / (555) 201-0042 / (555)201-0042. Deliberately NOT
    # broader (no +1 country codes, extensions, or bare 10-digit runs)
    # — every construct here is portable between Java regex and RE2 so
    # the oracle redacts bit-for-bit; callers needing locale-specific
    # coverage should extend this dict, not assume it.
    "phone": r"(\(\d{3}\)[ ]?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII redaction: emails/phones/SSNs replaced with
    ``[<KIND>]`` tokens, plus a per-kind count of the spans that kind
    redacted (sum(n_*) == total redactions; see PII_PATTERNS on
    ordering). Pure regexp_replace/regexp_count chain — map-only,
    JVM-side, no shuffle; patterns are portable literals so the whole
    transform is oracle-checkable.

    Coverage is exactly what PII_PATTERNS documents — e.g. phones are
    NANP-shaped separated formats only, not free-form international
    numbers. The bound is an engine-portability constraint (patterns
    must behave identically under Java regex and RE2), not an
    oversight; extend PII_PATTERNS for broader locales."""
    out = df
    clean = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(clean, F.lit(pat)).cast("bigint")
        )
        clean = F.regexp_replace(clean, pat, f"[{kind.upper()}]")
    return out.withColumn("clean_text", clean)


def pack_chunks(
    df: DataFrame,
    shard_col: str,
    order_cols: list[str],
    token_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-split sequence packing — the standard pretraining
    layout: chunks are laid end-to-end in a deterministic order and
    cut into fixed ``budget``-token bins; a chunk straddling a cut is
    split by the downstream reader (its ``bin_offset`` + length say
    exactly where). Compared to first-fit bin packing this wastes zero
    tokens, needs no per-bin state, and is a pure windowed cumulative
    sum — one exchange on ``shard_col``, same partitioning as the
    order itself.

    Emits per row: ``token_offset`` (exclusive running total within
    the shard), ``bin_id`` (budget-sized cut containing the chunk's
    first token) and ``bin_offset`` (position of the first token
    within that bin). Bins are local to a shard, so packing
    parallelizes with the training order and no global window exists.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("token_offset", offset)
        # integer DIV, not float division: a double round-trip diverges
        # from the oracle's exact // above 2^53 cumulative tokens.
        .withColumn("bin_id", F.expr(f"token_offset DIV {budget}"))
        .withColumn(
            "bin_offset", (F.col("token_offset") % budget).cast("bigint")
        )
    )


def token_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token frequencies: one shuffle, map-side combined."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("total_count"))
    )


def vocab_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 64,
) -> DataFrame:
    """Tokenizer-coverage report: build the top-``vocab_size``
    corpus vocabulary by token frequency (ties broken by token asc —
    deterministic on any engine) and score every document's
    out-of-vocabulary token fraction. The standard pre-tokenizer
    sanity check of an LLM data pipeline: a corpus slice with high OOV
    against the training vocabulary inflates token counts and degrades
    compression, so mixture decisions read this per-source.

    Scale shape: token counts are ONE exchange over exploded tokens
    (map-side combined); the vocabulary is a driver-bounded top-V sort
    (TakeOrdered, never a full sort) broadcast to an anti-join; OOV
    counts aggregate per doc on a second exchange. The ratio is a
    single integer/integer division rounded half-up at 1e-6 —
    bit-exact on any IEEE engine, no transcendentals.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token")
    )
    oov = (
        tok.join(F.broadcast(vocab), "token", "left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    base = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("bigint").alias("n_tokens")
    )
    return base.join(oov, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("n_oov"), F.lit(0)).cast("bigint").alias("n_oov"),
        round_half_up(
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("oov_ratio"),
    )


def mixture_divergence(
    df: DataFrame,
    slice_col: str = "source",
    text_col: str = "text",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Per-slice unigram-distribution divergence against the whole
    corpus — the training-mixture drift monitor: when a source's token
    distribution drifts away from the blended corpus (scraper change,
    contamination, genre shift), its KL/JS against the mixture spikes
    before any downstream eval does.

    For each slice ``s``: ``P_s(t) = (c_s(t)+1) / (tot_s+V)`` and the
    corpus ``Q(t) = (c(t)+1) / (tot+V)`` (add-one smoothing over the
    shared corpus vocabulary, so both are proper distributions on the
    same support and every log is finite). Emits ``KL(P_s || Q)`` and
    the symmetric, bounded ``JS(P_s, Q)``.

    Scale shape: the only corpus-sized exchange is the (slice, token)
    groupBy; the corpus distribution, slice totals, and the (V, tot)
    scalars all re-aggregate FROM that vocabulary-bounded relation.
    The slice x vocab grid (needed because absent tokens still carry
    smoothed mass) is a few-row broadcast attach onto the vocabulary —
    n_slices is mixture-component-sized (tens), never data-sized.
    Float policy: p/q inputs are exact integer ratios (IEEE-identical
    on any engine); the summed ln terms are rounded half-up at 1e-6
    after aggregation (doc_perplexity's portability policy).
    """
    # Eager localCheckpoint, not reliance on exchange reuse: st feeds
    # FOUR consumers (tok / tot_s / scal / the grid's left join) and
    # the optimizer only reuses some of the duplicated subplans (the
    # r11 plan audit measured 6 corpus scans in the final adaptive
    # plan without it). The checkpoint pins exactly ONE corpus
    # scan+explode; the materialized relation is vocabulary x
    # n_slices-bounded, orders smaller than the corpus.
    #
    # Two caveats of the eager form (ADVICE r11): it runs a Spark job
    # at OPERATOR-CALL time (the call is no longer lazy — acceptable
    # here because every caller consumes the result immediately), and
    # localCheckpoint truncates lineage WITHOUT fault tolerance — on a
    # real cluster, losing an executor loses its checkpointed blocks
    # unrecoverably mid-query. For cluster deployments pass
    # ``reliable_checkpoint=True`` to use a reliable ``checkpoint()``
    # into ``spark.sparkContext.setCheckpointDir`` storage (HDFS/S3)
    # instead: same single-scan plan, recomputable after executor loss.
    if reliable_checkpoint and df.sparkSession.sparkContext.getCheckpointDir() is None:
        # Fail fast with a targeted message: checkpoint(eager=True)
        # on a session without a checkpoint dir otherwise surfaces as
        # a generic SparkException at call time (ADVICE r12).
        raise ValueError(
            "mixture_divergence(reliable_checkpoint=True) requires a "
            "checkpoint directory: call "
            "spark.sparkContext.setCheckpointDir('<hdfs/s3 path>') first, "
            "or use the default localCheckpoint path"
        )
    st = (
        df.select(F.col(slice_col), F.explode(tokens(text_col)).alias("token"))
        .groupBy(slice_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt_st"))
    )
    st = st.checkpoint(eager=True) if reliable_checkpoint else st.localCheckpoint(eager=True)
    tok = st.groupBy("token").agg(F.sum("cnt_st").alias("cnt_t"))
    tot_s = st.groupBy(slice_col).agg(F.sum("cnt_st").alias("tot_s"))
    scal = tok.agg(
        F.sum("cnt_t").alias("tot"), F.count(F.lit(1)).alias("v")
    )
    grid = (
        tok.crossJoin(F.broadcast(tot_s))
        .join(st, [slice_col, "token"], "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("cnt_st", F.coalesce(F.col("cnt_st"), F.lit(0)))
    )
    p = (F.col("cnt_st") + F.lit(1)).cast("double") / (F.col("tot_s") + F.col("v"))
    q = (F.col("cnt_t") + F.lit(1)).cast("double") / (F.col("tot") + F.col("v"))
    m = (p + q) / F.lit(2.0)
    kl_term = p * F.log(p / q)
    js_term = F.lit(0.5) * (p * F.log(p / m) + q * F.log(q / m))
    return grid.groupBy(slice_col).agg(
        F.max("tot_s").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("cnt_st") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_present_vocab"),
        round_half_up(F.sum(kl_term), 6).alias("kl_vs_corpus"),
        round_half_up(F.sum(js_term), 6).alias("js_vs_corpus"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    The idf is the RATIONAL form ``n_docs / doc_freq`` (no logarithm):
    transcendental functions are not bit-reproducible across engines,
    rational arithmetic is — and for RANKING terms within a document
    the monotone transform changes nothing. score = tf * n_docs / df.

    Dataflow at scale: tf is one groupBy over exploded tokens
    (map-side combined); doc_freq one more over distinct (doc, token);
    n_docs rides in as a broadcast scalar; the top-k window partitions
    by doc — no skew (per-doc token counts are bounded by doc length).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = (
        tok.distinct().groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doc_freq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            round_half_up(
                F.col("tf") * F.col("n_docs") / F.col("doc_freq"), 6
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


# ------------------------------------------------------------------
# Hashed linear text classifier (fastText-style inference; Joulin et
# al. 2016, arXiv:1607.01759). The production quality-filter shape:
# a released model hashes each token into a fixed bucket space and
# scores a document as the sum of its buckets' weights — CCNet-class
# pipelines run exactly this to keep/drop pretraining documents.
#
# Here the released weights are DERIVED deterministically from the
# bucket id in integer micro-units (a seeded multiplicative-hash
# ladder), so the whole scorer — tokenize, bucket, weigh, sum,
# threshold — is exact 64-bit arithmetic reproducible in a SQL oracle.
# A real model swaps `_bucket_weight_micro` for a broadcast
# (bucket -> weight) lookup (n_buckets rows, kilobytes); the plan
# shape is identical either way: ONE map-only codegen fold per row,
# no explode, no shuffle, no Python. At 100 TB this is the cheapest
# operator class there is — embarrassingly parallel scan work.
CLASSIFIER_BUCKETS = 4096
_W_MULT = 2654435761  # Knuth's 2^32 multiplicative-hash constant
_W_MOD = 1_000_003    # prime weight range
_W_SHIFT = _W_MOD // 2  # center weights on zero


def _bucket_weight_micro(tok: Column, n_buckets: int) -> Column:
    """Integer micro-weight of one token: portable sha-256-prefix hash
    (the shared ``dedup.hash60``) -> bucket -> deterministic weight in
    [-_W_SHIFT, _W_SHIFT]."""
    from ecommerce_dataengineering_project_spark.operators.dedup import hash60

    bucket = hash60(tok) % n_buckets
    return (bucket + 1) * F.lit(_W_MULT).cast("bigint") % _W_MOD - _W_SHIFT


def classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = CLASSIFIER_BUCKETS,
) -> DataFrame:
    """Per-document linear classifier score + keep/filter label.

    ``score_micro`` is the exact BIGINT sum of per-token bucket
    weights (micro-units keep the sum associative and
    partial-sum-order-free — the repo's two-level-sum float policy);
    ``label`` thresholds at zero, fastText's binary decision. NULL
    text scores 0 (-> "filter"), matching the SQL twin's COALESCE —
    ``F.aggregate`` over a NULL array would otherwise yield NULL and
    silently diverge from the oracle on a NULL-text fixture."""
    toks = tokens(text_col)
    score = F.coalesce(
        F.aggregate(
            toks,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + _bucket_weight_micro(t, n_buckets),
        ),
        F.lit(0).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("token_count"),
        score.alias("score_micro"),
        F.when(score > 0, F.lit("keep")).otherwise(F.lit("filter")).alias(
            "label"
        ),
    )


def sql_classifier_score(
    text_expr: str, n_buckets: int = CLASSIFIER_BUCKETS
) -> str:
    """The identical scorer as DuckDB SQL (for oracles): same sha-256
    prefix hash, same weight ladder, same integer arithmetic."""
    w = (
        f"((CAST(CONCAT('0x', SUBSTR(SHA256(t), 1, 15)) AS BIGINT) "
        f"% {n_buckets} + 1) * {_W_MULT}) % {_W_MOD} - {_W_SHIFT}"
    )
    return (
        f"CAST(COALESCE(LIST_SUM(LIST_TRANSFORM("
        f"STRING_SPLIT({text_expr}, ' '), t -> {w})), 0) AS BIGINT)"
    )
