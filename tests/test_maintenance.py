"""Table maintenance: upsert, schema evolution, compaction (the
Iceberg/Delta capabilities the reference delegates to its formats)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.sources.maintenance import (
    compact,
    evolve_append,
    merge_upsert,
)
from ecommerce_dataengineering_project_spark.sources.writers import create_or_append_table


@pytest.fixture
def clean_table(spark):
    def _make(name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
        return name

    return _make


def test_merge_upsert(spark, clean_table):
    t = clean_table("t_upsert")
    spark.createDataFrame(
        [("a", 1, "old"), ("b", 2, "old")], "k string, v int, src string"
    ).write.saveAsTable(t)
    updates = spark.createDataFrame(
        [("b", 20, "new"), ("c", 30, "new")], "k string, v int, src string"
    )
    out = merge_upsert(spark, t, updates, ["k"])
    rows = {r.k: (r.v, r.src) for r in out.collect()}
    assert rows == {"a": (1, "old"), "b": (20, "new"), "c": (30, "new")}
    spark.sql(f"DROP TABLE {t}")


def test_evolve_append(spark, clean_table):
    t = clean_table("t_evolve")
    spark.createDataFrame([("a", 1)], "k string, v int").write.saveAsTable(t)
    # batch adds a column -> old rows read null; missing col null-fills
    evolved = evolve_append(
        spark, t, spark.createDataFrame([("b", "x")], "k string, extra string")
    )
    rows = {r.k: (r.v, r.extra) for r in evolved.collect()}
    assert rows == {"a": (1, None), "b": (None, "x")}
    spark.sql(f"DROP TABLE {t}")


def test_compact(spark, tmp_path):
    path = str(tmp_path / "frag")
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    df.repartition(16).write.parquet(path)
    before = compact(spark, path, target_files=2)
    assert before >= 16
    import glob

    after = len(glob.glob(os.path.join(path, "*.parquet")))
    assert after <= 2
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 999 * 1000


def test_streaming_upsert_via_foreach_batch(spark, clean_table):
    """Streaming MERGE: micro-batches of purchase updates upserted
    into a gold table via foreachBatch + merge_upsert. Later batches
    win; re-keyed rows replace, new keys insert."""
    from ecommerce_dataengineering_project_spark.streaming.harness import run_bounded_foreach

    t = clean_table("t_stream_upsert")
    spark.createDataFrame(
        [("a", 1), ("b", 2)], "k string, v int"
    ).write.saveAsTable(t)
    batches = [
        spark.createDataFrame([("b", 20), ("c", 30)], "k string, v int"),
        spark.createDataFrame([("c", 300), ("d", 400)], "k string, v int"),
    ]

    def upsert(batch_df, batch_id):
        merge_upsert(spark, t, batch_df, ["k"])

    run_bounded_foreach(spark, "stream_upsert_test", batches, lambda s: s, upsert)
    rows = {r.k: r.v for r in spark.table(t).collect()}
    assert rows == {"a": 1, "b": 20, "c": 300, "d": 400}
    spark.sql(f"DROP TABLE {t}")


def test_create_or_append(spark, clean_table):
    """K4: DataFrameWriterV2 create()-with-partitioning on first call,
    append() after (delta_to_iceberg.py:36-52 flow)."""
    t = clean_table("t_k4")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, grp string")
    create_or_append_table(spark, b1, t, partition_cols=["grp"])
    assert spark.table(t).count() == 2
    b2 = spark.createDataFrame([(3, "a")], "id long, grp string")
    create_or_append_table(spark, b2, t, partition_cols=["grp"])
    assert sorted(r.id for r in spark.table(t).collect()) == [1, 2, 3]
    # partitioned layout materialized (one dir per grp value)
    import os
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert os.path.isdir(os.path.join(wh, t, "grp=a"))
