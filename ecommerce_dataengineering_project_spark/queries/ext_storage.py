"""Storage-layer queries: transaction-log time travel
(sources/txlog.py) and binary-file corpus ingest — plus the
``mapInArrow`` arm of the §2j UDF surface.

Reference parity: the reference's silver/gold tables are Delta/Iceberg
snapshots (streaming_consumer.py:81-88, delta_to_iceberg.py:44-52);
``time_travel_read`` proves the snapshot-isolation semantics on the
parquet tx-log stand-in with a value-level oracle. ``binary_files_
ingest`` is the multimodal lake-ingest front door (one opaque file per
asset, Spark's ``binaryFile`` source) exercised on real files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.sources.readers import load_table
from ecommerce_dataengineering_project_spark.sources.txlog import recreate
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT

CUTOFF = "1998-01-01"
BIN_MOD = 10  # every 10th document becomes a standalone file


def _sf_name(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("/", 1)[-1]


def q_time_travel_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two atomic commits (orders before/after the cutoff), then a
    time-travel read of version 1 — the snapshot must contain exactly
    the first commit's rows even though the table has moved on. The
    oracle recomputes the first commit's predicate directly."""
    orders = load_table(spark, sf_dir, "orders")
    table = recreate(os.path.join(TMP_ROOT, "txlog", f"orders_{_sf_name(sf_dir)}"))
    table.append(orders.filter(F.col("o_orderdate") < F.lit(CUTOFF)))
    table.append(orders.filter(F.col("o_orderdate") >= F.lit(CUTOFF)))
    return table.read(spark, version=1)


def q_binary_files_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-asset ingest: a sample of documents staged as one text
    file each (``partitionBy(doc_id)`` text sink), read back through
    the ``binaryFile`` source, identity recovered from the partition
    path and content decoded byte-exactly. ``n_bytes`` is the file
    length as the source reports it (text + the sink's newline); the
    oracle recomputes it from the source table's UTF-8 bytes."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % BIN_MOD == 0
    )
    path = os.path.join(TMP_ROOT, "binfiles", f"docs_{_sf_name(sf_dir)}")
    docs.select("doc_id", "text").write.mode("overwrite").partitionBy(
        "doc_id"
    ).text(path)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(path)
    )
    decoded = F.col("content").cast("string")
    return raw.select(
        F.regexp_extract("path", r"doc_id=(\d+)", 1).cast("bigint").alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.substring(decoded, 1, F.length(decoded) - 1).alias("text_back"),
    )


QUERIES = {
    "time_travel_read": q_time_travel_read,
    "binary_files_ingest": q_binary_files_ingest,
}

ORACLES = {
    "time_travel_read": f"""
        SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '{CUTOFF} 00:00:00'
    """,
    "binary_files_ingest": f"""
        SELECT doc_id,
               CAST(OCTET_LENGTH(ENCODE(text)) + 1 AS BIGINT) AS n_bytes,
               text AS text_back
        FROM documents
        WHERE doc_id % {BIN_MOD} = 0
    """,
}
