"""Batch sinks (SURVEY §2a: K3-batch, K4, K5).

The reference's gold sink is a create-or-append DataFrameWriterV2 into
Iceberg partitioned by purchase_date (delta_to_iceberg.py:36-52); the
silver sink is a partitioned Delta append (streaming_consumer.py:81-88).
Spark-native equivalents below keep the two properties that matter at
100 TB: (1) partition-by-date layout so downstream date predicates prune
whole files, and (2) idempotent create-or-append semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
) -> None:
    """Partitioned columnar write (K3's batch shape).

    Hive-style layout: each partition column value becomes a directory,
    so scans with equality/range predicates on those columns prune at
    the metadata level before any IO.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def create_or_append_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    partition_cols: list[str] | None = None,
) -> None:
    """Create-or-append managed table (K4, delta_to_iceberg.py:36-52).

    Same probe-then-branch shape as the reference: the CREATE leg uses
    the same DataFrameWriterV2 API (``writeTo().create()`` with
    partitioning), against the session catalog instead of Glue; with an
    Iceberg catalog, swap ``using("parquet")`` for ``using("iceberg")``
    plus the format-version property. The APPEND leg: the session
    catalog serves the created table back as V1, which the V2 writer
    refuses ("Cannot write into v1 table"), so appends go through the
    positional ``insertInto`` (respects the table's partitioning);
    columns are name-aligned first to keep V2's by-name semantics.
    """
    from pyspark.sql import functions as F

    if spark.catalog.tableExists(table):
        try:
            df.writeTo(table).append()
        except Exception:
            df.select(*spark.table(table).columns).write.insertInto(table)
    else:
        writer = df.writeTo(table).using("parquet")
        if partition_cols:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_cols])
        writer.create()


def write_json_lines(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    timestamp_format: str = "yyyy-MM-dd HH:mm:ss.SSSSSS",
) -> None:
    """JSONL corpus sink — the LLM-pipeline interchange format (one
    JSON object per line, gzip-compressed shards; what a tokenizer or
    trainer job consumes downstream of the corpus reduction here).

    One output file per partition, written in parallel — repartition
    upstream to choose shard count/size. ``timestamp_format`` defaults
    to microsecond precision: Spark's default JSON format truncates
    timestamps to milliseconds, which would corrupt event times on a
    round-trip (same pitfall the streaming bronze path guards)."""
    w = df.write.mode(mode).option("timestampFormat", timestamp_format)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV results sink (K5, anomaly_detection.py:56-60)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC columnar sink — the second native columnar format beside
    parquet (zlib by default; vectorized reader, predicate pushdown
    and column pruning apply exactly as for parquet). Avro is NOT
    available in this environment (jar absent — probed, same class of
    constraint as Delta/Iceberg in `DELTA_PROBE.md`), so the
    row-oriented interchange role falls to JSONL/CSV."""
    df.write.mode(mode).orc(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Bucketed managed table: rows hash-partitioned into fixed buckets
    by key AT WRITE TIME. Joins/aggregations between tables bucketed on
    the same key with the same count need NO shuffle at read — at
    100 TB this moves the fact-join shuffle from every query to the
    (once) write. Pair with ``sortBy`` so the merge side needs no sort
    either. ``path`` makes it an external bucketed table (data at an
    explicit location instead of the session warehouse dir; bucket
    metadata still lives in the catalog, which is what read-side
    shuffle elimination keys on)."""
    writer = df.write.format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.mode("overwrite").saveAsTable(table)


def write_sorted_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned write with rows sorted WITHIN each file: parquet
    row-group min/max stats become narrow and selective, so point and
    range predicates on ``sort_cols`` skip whole row groups at scan
    time (data skipping — the poor man's Z-order for one key)."""
    # Sort by partition cols FIRST: the dynamic-partition writer
    # requires that ordering and would otherwise insert its own
    # (non-stable) sort, destroying the data-skipping order.
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .sortWithinPartitions(*partition_cols, *sort_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def zorder_key(cols: list[str], bits: int = 16) -> "F.Column":
    """Morton (Z-order) key over 2+ integer columns: interleaves the
    low ``bits`` bits of each column so files clustered by this ONE
    key are locality-clustered in EVERY participating dimension — the
    multi-column upgrade of single-key sorted writes (Delta's
    OPTIMIZE ZORDER BY, Iceberg's sort orders, expressed directly).

    Callers pre-bucket values into [0, 2^bits): ids via ``% 2^bits``
    or ``ntile``, timestamps via epoch-day — Z-order cares about
    rank locality, not exact values. Pure shift/mask column
    arithmetic, codegen'd, map-only.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    # every interleaved bit must land inside the 63 non-sign bits of
    # one BIGINT: shiftleft wraps modulo 64, so an overflowing lane
    # would silently collide with another (and '+'-combined collisions
    # carry) — the key would stop being a Morton code and the min/max
    # pruning this exists for would quietly vanish. Past the wall,
    # lower `bits` (rank locality needs few bits, not exact values).
    top_bit = (bits - 1) * n + (n - 1)
    if top_bit > 62:
        max_bits = (62 - (n - 1)) // n + 1
        raise ValueError(
            f"zorder_key: {n} columns x {bits} bits needs bit positions "
            f"up to {top_bit}, past the 62 a signed BIGINT key can hold "
            f"order-safely — use bits <= {max_bits}"
        )
    terms = []
    for lane, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(shiftleft(shiftright(CAST(`{c}` AS BIGINT), {i}) & 1, "
                f"{i * n + lane}))"
            )
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: range-partition and sort by
    the Morton key, so each output file covers a small hyper-rectangle
    of the key space and parquet min/max stats stay narrow on ALL
    ``zorder_cols`` — predicates on any of them skip most files
    (single-key sorting gives this for one column only; the others'
    per-file ranges span the whole domain).

    ``repartitionByRange`` samples the key distribution, so file
    boundaries adapt to skew; the write itself stays an ordinary
    parquet append job.
    """
    zk = zorder_key(zorder_cols, bits=bits)
    (
        df.withColumn("__z", zk)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
