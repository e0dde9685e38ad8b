"""Two-phase-commit contracts of the custom Python DataSource sink
(sources/pyds_sink.py) — the write half of X19.

Oracle parity of the end-to-end roundtrip is in test_oracle_parity
(datasource_write_roundtrip); these pin the protocol itself: staged
output invisible before commit, abort cleanup, SaveMode semantics,
manifest-scoped reads ignoring stragglers, and streaming epoch
idempotency (replayed micro-batch never double-appends).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import Row, functions as F

from ecommerce_dataengineering_project_spark.sources import pyds_sink
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT

SCHEMA = "id BIGINT, v STRING"


@pytest.fixture()
def table(request):
    path = os.path.join(TMP_ROOT, "jsonl_sink_tests", request.node.name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _write(spark, table, rows, mode="append"):
    pyds_sink.register(spark)
    (
        spark.createDataFrame(rows, SCHEMA)
        .repartition(2)
        .write.format("ecommerce_jsonl_sink")
        .mode(mode)
        .option("path", table)
        .save()
    )


def test_commit_publishes_and_drains_staging(spark, table):
    _write(spark, table, [(1, "a"), (2, "b"), (3, "c")])
    man = pyds_sink._read_manifest(table)
    assert man["rows"] == 3 and len(man["files"]) >= 1
    staged = os.listdir(os.path.join(table, "_staging"))
    assert staged == []  # everything named in commit messages moved out
    got = pyds_sink.read_jsonl_sink(spark, table, SCHEMA).collect()
    assert {(r.id, r.v) for r in got} == {(1, "a"), (2, "b"), (3, "c")}


def test_append_accumulates_overwrite_resets(spark, table):
    _write(spark, table, [(1, "a")])
    _write(spark, table, [(2, "b")])
    assert pyds_sink._read_manifest(table)["rows"] == 2
    _write(spark, table, [(9, "z")], mode="overwrite")
    man = pyds_sink._read_manifest(table)
    assert man["rows"] == 1
    got = pyds_sink.read_jsonl_sink(spark, table, SCHEMA).collect()
    assert [(r.id, r.v) for r in got] == [(9, "z")]
    # overwritten part files physically removed, not just delisted
    parts = [f for f in os.listdir(table) if f.startswith("part-")]
    assert len(parts) == len(man["files"])


def test_failed_job_leaves_table_unchanged(spark, table):
    _write(spark, table, [(1, "a")])
    before = pyds_sink._read_manifest(table)
    bad = spark.createDataFrame([(2, "b"), (3, "boom")], SCHEMA).select(
        "id",
        F.when(F.col("v") == "boom", F.expr("raise_error('task fails')"))
        .otherwise(F.col("v"))
        .alias("v"),
    )
    with pytest.raises(Exception):
        (
            bad.repartition(2)
            .write.format("ecommerce_jsonl_sink")
            .mode("append")
            .option("path", table)
            .save()
        )
    assert pyds_sink._read_manifest(table) == before
    got = pyds_sink.read_jsonl_sink(spark, table, SCHEMA).collect()
    assert [(r.id, r.v) for r in got] == [(1, "a")]


def test_manifest_scoped_read_ignores_stragglers(spark, table):
    _write(spark, table, [(1, "a")])
    rogue = os.path.join(table, "part-rogue.jsonl")
    with open(rogue, "w") as f:
        f.write(json.dumps({"id": 99, "v": "ghost"}) + "\n")
    got = pyds_sink.read_jsonl_sink(spark, table, SCHEMA).collect()
    assert [(r.id, r.v) for r in got] == [(1, "a")]


def test_stream_epoch_commit_is_idempotent(table):
    """Protocol-level: replaying a batchId re-stages files but commit
    must keep the original epoch's file set (exactly-once contents)."""
    w = pyds_sink.JsonlSinkStreamWriter({"path": table})
    m1 = w.write(iter([Row(id=1, v="a"), Row(id=2, v="b")]))
    w.commit([m1], batchId=0)
    man1 = pyds_sink._read_manifest(table)
    assert man1["rows"] == 2 and man1["epochs"]["0"] == [m1.filename]
    # checkpoint-recovery replay of epoch 0: different staged file
    m1_replay = w.write(iter([Row(id=1, v="a"), Row(id=2, v="b")]))
    w.commit([m1_replay], batchId=0)
    man2 = pyds_sink._read_manifest(table)
    assert man2 == man1  # nothing double-appended
    assert not os.listdir(os.path.join(table, "_staging"))  # replay drained
    # next epoch appends normally
    m2 = w.write(iter([Row(id=3, v="c")]))
    w.commit([m2], batchId=1)
    assert pyds_sink._read_manifest(table)["rows"] == 3


def test_streaming_write_through_writestream(spark, table):
    """End-to-end: a real writeStream through the sink (availableNow
    over a staged file source), then a manifest-scoped read."""
    src_dir = os.path.join(table, "_src")
    os.makedirs(src_dir, exist_ok=True)
    spark.createDataFrame([(i, f"v{i}") for i in range(10)], SCHEMA).coalesce(
        1
    ).write.mode("overwrite").parquet(src_dir)
    pyds_sink.register(spark)
    stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
    q = (
        stream.writeStream.format("ecommerce_jsonl_sink")
        .option("path", table)
        .option("checkpointLocation", os.path.join(table, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = pyds_sink.read_jsonl_sink(spark, table, SCHEMA).collect()
    assert {(r.id, r.v) for r in got} == {(i, f"v{i}") for i in range(10)}
    man = pyds_sink._read_manifest(table)
    assert man["rows"] == 10 and man["epochs"]


def test_overwrite_publishes_manifest_before_deleting_old_files(
    spark, table, monkeypatch
):
    """ADVICE r8 (low): overwrite commit order — the new manifest must
    be atomically published BEFORE the old part files are removed, so a
    crash mid-commit leaves harmless (manifest-invisible) stragglers,
    never a manifest pointing at deleted files. Spark runs commit() in
    a separate Python worker, so this drives the writer protocol
    directly in-process (same style as the epoch-idempotency test)."""
    _write(spark, table, [(1, "a")])
    old_files = set(pyds_sink._read_manifest(table)["files"])
    assert old_files
    # stage one replacement part file, as a write task would
    msg = pyds_sink._stage_rows(table, iter([Row(id=9, v="z")]))
    attempted = []
    real_remove = os.remove

    def crashy_remove(p):
        if os.path.basename(p) in old_files:
            # ordering contract: by the time ANY old file is deleted,
            # the published manifest must already exclude all of them
            man_now = pyds_sink._read_manifest(table)
            assert not old_files & set(man_now["files"])
            assert msg.filename in man_now["files"]
            attempted.append(p)
            return  # simulate a crash before this delete lands
        real_remove(p)

    monkeypatch.setattr(pyds_sink.os, "remove", crashy_remove)
    pyds_sink.JsonlSinkWriter({"path": table}, overwrite=True).commit([msg])
    monkeypatch.undo()
    assert attempted  # the cleanup ran, after publication
    # the straggler left by the "crash" is invisible to manifest reads
    for f in old_files:
        assert os.path.exists(os.path.join(table, f))
    got = pyds_sink.read_jsonl_sink(spark, table, SCHEMA).collect()
    assert [(r.id, r.v) for r in got] == [(9, "z")]


def test_struct_columns_round_trip(spark, table):
    """Nested Row objects must serialize as JSON objects (recursive
    asDict), not as the string "Row(a=1, ...)" that a schema-declared
    read-back nulls out."""
    pyds_sink.register(spark)
    df = spark.createDataFrame(
        [(1, ("x", 2)), (2, ("y", 3))], "id BIGINT, s STRUCT<a: STRING, b: BIGINT>"
    )
    (
        df.write.format("ecommerce_jsonl_sink")
        .mode("append").option("path", table).save()
    )
    got = pyds_sink.read_jsonl_sink(
        spark, table, "id BIGINT, s STRUCT<a: STRING, b: BIGINT>"
    ).collect()
    assert sorted((r.id, r.s.a, r.s.b) for r in got) == [(1, "x", 2), (2, "y", 3)]
