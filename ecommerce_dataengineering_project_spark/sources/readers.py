"""Batch sources (SURVEY §2a: S2, S3, S4).

The reference reads CSV dims (producer.py:82-113), Delta silver
(delta_to_iceberg.py:23-25), and catalog tables (fct_purchases.sql:22).
Spark-first equivalents: schema-declared ``spark.read`` so Catalyst gets
column pruning + predicate pushdown into the scan for free.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS): Spark has no ns type, so
# (with spark.sql.legacy.parquet.nanosAsLong) they arrive as long and
# are converted to µs timestamps here — same truncation DuckDB applies.
_NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one fixture table (S3-analog: Delta batch scan).

    Plain parquet scan — vectorized reader, pushdown-capable. At 100 TB
    the same call reads a partitioned lake directory; nothing changes in
    caller code.
    """
    # The events fixture stores ts as parquet TIMESTAMP(NANOS), which
    # Spark rejects outright unless the legacy nanos-as-long conf is on.
    # Callers (the correctness driver in particular) hand us arbitrary
    # sessions, so set it here at read time — it is a runtime-settable
    # SQL conf — rather than relying on session-creation config. Scoped
    # to the tables with declared nanos columns: leaving it on globally
    # would silently turn OTHER tables' nanos timestamps into longs
    # instead of erroring (the conf is deliberately NOT restored after
    # the read — the returned DataFrame is lazy and its scan re-reads
    # the conf at execution time).
    if name in _NS_TIMESTAMP_COLS:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except AnalysisException:
            pass  # conf locked down: fall through and let the read decide
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    for c in _NS_TIMESTAMP_COLS.get(name, ()):
        if c in df.columns and isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """CSV dimension load with declared schema (S2).

    The reference parses the products CSV by hand, casting each column
    in Python (producer.py:82-113, models/product.py:18-30); declaring
    the StructType pushes those casts into the scan.
    """
    return spark.read.csv(path, header=True, schema=schema)


def read_json_lines(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines source with schema enforcement (bronze-analog).

    Equivalent of consuming the Kafka JSON topic in batch: schema
    declared up front so malformed rows null out instead of failing,
    matching ``from_json`` semantics (streaming_consumer.py:69-71).
    """
    return spark.read.schema(schema).json(path)
