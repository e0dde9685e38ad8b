"""Checkpoint recovery: a restarted stream resumes from its offsets
and reprocesses nothing (T3/T4 — the exactly-once contract the
reference relies on its S3 checkpoint dir for).

The bounded harness deliberately wipes checkpoints between runs; this
test keeps one alive across two runs to prove the recovery semantics.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def _write_file(df, path, mtime):
    df.coalesce(1).write.mode("overwrite").parquet(path + "_stage")
    import glob
    import shutil

    [part] = glob.glob(os.path.join(path + "_stage", "part-*.parquet"))
    shutil.move(part, path)
    shutil.rmtree(path + "_stage")
    os.utime(path, (mtime, mtime))


def _run_available_now(spark, source_dir, schema, sink_dir, ckpt_dir):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    q = (
        stream.withColumn("doubled", F.col("id") * 2)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_resume_no_reprocessing(spark, tmp_path):
    source = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(source)
    now = time.time() - 3600

    batch1 = spark.range(0, 100).select(F.col("id"))
    batch2 = spark.range(100, 250).select(F.col("id"))
    _write_file(batch1, os.path.join(source, "b0.parquet"), now)
    _write_file(batch2, os.path.join(source, "b1.parquet"), now + 1)

    _run_available_now(spark, source, batch1.schema, sink, ckpt)
    first = spark.read.parquet(sink)
    assert first.count() == 250

    # new data lands AFTER the first run; restart with the SAME
    # checkpoint must process only the new file
    batch3 = spark.range(250, 300).select(F.col("id"))
    _write_file(batch3, os.path.join(source, "b2.parquet"), now + 2)
    _run_available_now(spark, source, batch1.schema, sink, ckpt)

    out = spark.read.parquet(sink)
    assert out.count() == 300  # 250 + 50, nothing reprocessed
    # exactly-once: every id appears once, transform applied
    assert out.select("id").distinct().count() == 300
    assert out.where(F.col("doubled") != F.col("id") * 2).count() == 0
