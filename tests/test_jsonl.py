"""JSONL corpus source/sink contracts (sources/readers.read_json_lines
+ sources/writers.write_json_lines). The registered round-trip query's
value parity is in the registry sweep; these pin shard layout,
compression, µs fidelity, and NULL-field behavior."""

from __future__ import annotations

import datetime as dt
import glob
import os

from ecommerce_dataengineering_project_spark.sources.readers import read_json_lines
from ecommerce_dataengineering_project_spark.sources.writers import write_json_lines

FMT = {"timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS"}


def _tmp(name: str) -> str:
    from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT

    return os.path.join(TMP_ROOT, "jsonl-tests", name)


def test_write_emits_gzip_shards_per_partition(spark):
    df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s")
    path = _tmp("shards")
    write_json_lines(df.repartition(4), path)
    assert len(glob.glob(os.path.join(path, "*.json.gz"))) == 4


def test_microsecond_timestamps_survive_roundtrip(spark):
    ts = dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    df = spark.createDataFrame([(1, ts)], "id long, ts timestamp")
    path = _tmp("micros")
    write_json_lines(df, path)
    back = read_json_lines(spark, path, df.schema, options=FMT).collect()
    assert back[0].ts == ts  # default format would ms-truncate this


def test_null_fields_roundtrip_as_null(spark):
    # JSON writers omit null fields; the declared read schema must
    # resurface them as NULL columns, not drop the rows
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, s string"
    )
    path = _tmp("nulls")
    write_json_lines(df, path)
    back = {r.id: r.s for r in read_json_lines(spark, path, df.schema).collect()}
    assert back == {1: "a", 2: None}


def test_uncompressed_mode(spark):
    df = spark.range(5)
    path = _tmp("plain")
    write_json_lines(df, path, compression=None)
    files = glob.glob(os.path.join(path, "part-*.json"))
    assert files and not glob.glob(os.path.join(path, "*.gz"))
