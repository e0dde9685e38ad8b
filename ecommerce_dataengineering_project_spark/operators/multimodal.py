"""Multimodal column operators (north-star EXT; BASELINE.json).

Design for 100 TB of mixed media: image/audio/video payloads are opaque
``binary`` columns with a typed metadata struct beside them; all
per-item compute (decode, feature extraction, resize, frame sampling)
runs as Arrow-batched ``mapInPandas`` — payload bytes never surface as
Python row objects, and partition sizing stays byte-based
(``spark.sql.files.maxPartitionBytes``), not row-based.

The actual codec step is environment-dependent (no image/audio libs in
this container), so :func:`decode_media` tries the real decoder and
falls back to a clearly-marked deterministic fake keyed on the payload
sha-256 — the Spark-side plumbing (schema, batching, UDF signature) is
real and oracle-checked either way; only the pixel math is faked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_kind", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media stand-in: the document text's bytes as an
    opaque binary payload (the plumbing doesn't care what the bytes
    are; production swaps this for a binaryFile / blob-store scan)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("media"),
        F.lit("image/fake").alias("media_kind"),
    )


def _real_decode(payload: bytes, kind: str):
    """The codec hook. No codec libraries exist in this container, so
    this is an explicit stub — replace with PIL/ffmpeg/soundfile in a
    real deployment."""
    raise NotImplementedError("no media codecs available in this environment")


def _fake_decode(payload: bytes, kind: str) -> tuple[str, int, int, int]:
    """Deterministic fake decode keyed on content sha-256 (so tests and
    SQL oracles can reproduce it exactly)."""
    sha = hashlib.sha256(payload).hexdigest()
    width = 320 + int(sha[:4], 16) % 1600
    height = 240 + int(sha[4:8], 16) % 840
    n_frames = 1 + int(sha[8:12], 16) % 240
    return sha, width, height, n_frames


def decode_media(media: DataFrame) -> DataFrame:
    """Decode/probe each payload into typed metadata via mapInPandas.

    One Arrow batch in, one out — constant Python overhead per ~10k
    rows, not per row. The output drops the payload column, so the
    downstream exchange never shuffles raw bytes.
    """

    def batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            rows = {k: [] for k in DECODED_SCHEMA.fieldNames()}
            for doc_id, payload, kind in zip(pdf["doc_id"], pdf["media"], pdf["media_kind"]):
                payload = bytes(payload)
                try:
                    sha, w, h, nf = _real_decode(payload, kind)
                except NotImplementedError:
                    sha, w, h, nf = _fake_decode(payload, kind)
                rows["doc_id"].append(doc_id)
                rows["media_kind"].append(kind)
                rows["byte_len"].append(len(payload))
                rows["sha"].append(sha)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
            yield pd.DataFrame(rows, columns=list(DECODED_SCHEMA.fieldNames()))

    return media.mapInPandas(batches, DECODED_SCHEMA)


FEATURE_DIM = 8
_U32 = float(0xFFFFFFFF)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Binary payload -> fixed-size feature vector via mapInPandas
    (the embedding-model hook; at scale this is where the GPU batch
    inference call goes). The stub derives each component from the
    payload's sha-256 (8 hex chars per dim, scaled to [0,1]) — the
    fake is pure integer arithmetic, so SQL oracles reproduce the
    vectors bit-for-bit and the Arrow plumbing (binary in, array out,
    payload dropped before any shuffle) is checked end to end.
    """
    from pyspark.sql.types import ArrayType, DoubleType

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_kind", StringType()),
            StructField("feature", ArrayType(DoubleType())),
        ]
    )

    def batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            ids, kinds, feats = [], [], []
            for doc_id, payload, kind in zip(pdf["doc_id"], pdf["media"], pdf["media_kind"]):
                sha = hashlib.sha256(bytes(payload)).hexdigest()
                feats.append(
                    [int(sha[8 * i : 8 * i + 8], 16) / _U32 for i in range(dim)]
                )
                ids.append(doc_id)
                kinds.append(kind)
            yield pd.DataFrame({"doc_id": ids, "media_kind": kinds, "feature": feats})

    return media.mapInPandas(batches, out_schema)


RESIZE_W = 224
RESIZE_H = 224


def resize_media(media: DataFrame, width: int = RESIZE_W, height: int = RESIZE_H) -> DataFrame:
    """Payload-transform plumbing: binary in -> binary out through an
    Arrow batch, metadata updated to the target dims. The stub
    "resize" is a passthrough of the payload (no codecs here); the
    returned sha proves which bytes traversed the pipe. Production
    swaps the body for PIL/ffmpeg — the dataflow (batch signature,
    byte-based partition sizing, metadata beside payload) is the part
    under test."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("out_width", IntegerType()),
            StructField("out_height", IntegerType()),
            StructField("out_sha", StringType()),
        ]
    )

    def batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            ids, payloads, shas = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                resized = bytes(payload)  # codec stub: passthrough
                ids.append(doc_id)
                payloads.append(resized)
                shas.append(hashlib.sha256(resized).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media": payloads,
                    "out_width": [width] * len(ids),
                    "out_height": [height] * len(ids),
                    "out_sha": shas,
                }
            )

    return media.mapInPandas(batches, out_schema)


def sample_frames(decoded: DataFrame, every_nth: int = 30) -> DataFrame:
    """Frame-sampling plan for video payloads: explode the sampled frame
    indices (0, n, 2n, ...) per item — pure built-in sequence/explode,
    no Python. Downstream per-frame decode would join back to the
    payload by doc_id and run another mapInPandas."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
