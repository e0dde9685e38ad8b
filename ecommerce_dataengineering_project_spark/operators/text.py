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


def token_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token frequencies: one shuffle, map-side combined."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("total_count"))
    )
