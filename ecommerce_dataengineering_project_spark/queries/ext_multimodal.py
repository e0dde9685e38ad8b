"""Multimodal queries over the documents table (north-star EXT).

The fake decode is deterministic on content sha-256, so even the
pandas-UDF path is oracle-checked bit-for-bit in SQL — the check
covers the Arrow batch plumbing, schema, and hash arithmetic; only a
real codec would diverge (and is stubbed, see operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_fake_media,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(attach_fake_media(docs))


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(decode_media(attach_fake_media(docs)), every_nth=30)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The operator's array<double> output stays internal — the driver's
    # canonicalizer can't sort list cells — so the registered query
    # explodes it to one (dim_idx, component) row per dimension: purely
    # numeric columns hash identically on both engines.
    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(attach_fake_media(docs))
    return feats.select(
        "doc_id",
        "media_kind",
        F.posexplode("feature").alias("dim_idx", "component"),
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # the payload column stays executor-side; only metadata + proof-sha
    # come back for comparison
    return resize_media(attach_fake_media(docs)).select(
        "doc_id", "out_width", "out_height", "out_sha"
    )


QUERIES = {
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_features": q_multimodal_features,
    "multimodal_resize": q_multimodal_resize,
}

_SHA_INT = "CAST(CONCAT('0x', SUBSTR(SHA256(text), {a}, 4)) AS BIGINT)"
_WIDTH = f"CAST(320 + {_SHA_INT.format(a=1)} % 1600 AS INT)"
_HEIGHT = f"CAST(240 + {_SHA_INT.format(a=5)} % 840 AS INT)"
_N_FRAMES = f"CAST(1 + {_SHA_INT.format(a=9)} % 240 AS INT)"

ORACLES = {
    "multimodal_decode": f"""
        SELECT doc_id,
               'image/fake' AS media_kind,
               OCTET_LENGTH(ENCODE(text)) AS byte_len,
               SHA256(text) AS sha,
               {_WIDTH} AS width,
               {_HEIGHT} AS height,
               {_N_FRAMES} AS n_frames
        FROM documents
    """,
    "multimodal_frame_sample": f"""
        SELECT doc_id, CAST(f AS INT) AS frame_idx
        FROM (SELECT doc_id, {_N_FRAMES} AS nf FROM documents),
             UNNEST(GENERATE_SERIES(0, nf - 1, 30)) AS t(f)
    """,
    "multimodal_features": " UNION ALL ".join(
        f"""
        SELECT doc_id,
               'image/fake' AS media_kind,
               CAST({i} AS INT) AS dim_idx,
               CAST(CONCAT('0x', SUBSTR(SHA256(text), {8 * i + 1}, 8)) AS BIGINT)
                   / 4294967295.0 AS component
        FROM documents
        """
        for i in range(FEATURE_DIM)
    ),
    "multimodal_resize": """
        SELECT doc_id,
               CAST(224 AS INT) AS out_width,
               CAST(224 AS INT) AS out_height,
               SHA256(text) AS out_sha
        FROM documents
    """,
}
