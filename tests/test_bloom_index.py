"""Per-file Bloom index contracts: the Python xxh64 twin matches
Spark's xxhash64 bit-for-bit (the soundness root — a drift here would
prune live files), point pruning has no false negatives, prunes where
range stats cannot, and the index survives txn-appends and rollback.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.functions.xxh64 import (
    SPARK_SEED,
    hash_bytes,
    hash_int,
    hash_long,
    xxhash64_chain,
)
from ecommerce_dataengineering_project_spark.sources.txlog import TxTable, recreate


def test_xxh64_matches_spark(spark):
    random.seed(11)
    longs = [0, 1, -1, 2**63 - 1, -(2**63)] + [
        random.randint(-(2**63), 2**63 - 1) for _ in range(50)
    ]
    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        random.randint(-(2**31), 2**31 - 1) for _ in range(50)
    ]
    strs = ["", "a", "abcd", "é漢字🎉", "x" * 31, "y" * 32, "z" * 100] + [
        "".join(random.choices("abcdefgh ", k=random.randint(0, 64)))
        for _ in range(50)
    ]
    got = spark.createDataFrame([(v,) for v in longs], "v long").select(
        F.expr("xxhash64(v)").alias("h"), F.expr("xxhash64(v, 7)").alias("h7")
    ).collect()
    assert [r.h for r in got] == [hash_long(v, SPARK_SEED) for v in longs]
    assert [r.h7 for r in got] == [xxhash64_chain(v, "long", 7) for v in longs]
    got = spark.createDataFrame([(v,) for v in ints], "v int").select(
        F.expr("xxhash64(v)").alias("h")
    ).collect()
    assert [r.h for r in got] == [hash_int(v, SPARK_SEED) for v in ints]
    got = spark.createDataFrame([(v,) for v in strs], "v string").select(
        F.expr("xxhash64(v)").alias("h"), F.expr("xxhash64(v, 3)").alias("h3")
    ).collect()
    assert [r.h for r in got] == [
        hash_bytes(v.encode("utf-8"), SPARK_SEED) for v in strs
    ]
    assert [r.h3 for r in got] == [xxhash64_chain(v, "string", 3) for v in strs]


@pytest.fixture()
def btable(spark, tmp_path):
    t = recreate(str(tmp_path / "btab"))
    for c in range(3):
        df = spark.range(c * 1000, (c + 1) * 1000).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("ck"),
            F.concat(F.lit("u"), (F.col("id") % 53).cast("string")).alias(
                "name"
            ),
        )
        t.append(df, bloom_cols=("k", "name"))
    return t


def test_point_scan_no_false_negatives(spark, btable):
    full = btable.read(spark)
    for v in (0, 123, 999, 1000, 1500, 2999, 424242):
        got = sorted(r.k for r in btable.scan_point(spark, "k", v).collect())
        want = sorted(
            r.k for r in full.where(F.col("k") == F.lit(v)).collect()
        )
        assert got == want, v


def test_point_prunes_beyond_range_stats(spark, btable):
    # k=1500 lives in ONE part file; the bloom keeps exactly the one
    # file that holds it
    keep, total = btable.candidate_files_point("k", 1500)
    assert total >= 3 and len(keep) == 1
    # absent key: bloom proves no file can match
    keep, _ = btable.candidate_files_point("k", 10**6)
    assert keep == []


def test_bloom_prunes_where_range_cannot(spark, tmp_path):
    # scattered keys: every commit's [min, max] spans the whole domain,
    # so range pruning keeps everything — the bloom still isolates the
    # single commit holding the probed value (the layout the index
    # exists for: high-cardinality keys under arrival-time file splits)
    t = recreate(str(tmp_path / "scat"))
    for c in range(3):
        df = (
            spark.range(c * 1000, (c + 1) * 1000)
            .select(((F.col("id") * 2654435761) % 3000).alias("k"))
            .coalesce(1)
        )
        t.append(df, bloom_cols=("k",))
    probe = (1500 * 2654435761) % 3000  # lives in commit 2 only
    range_keep, total = t.candidate_files(
        "k", lo=int(probe), hi=int(probe)
    )
    bloom_keep, _ = t.candidate_files_point("k", int(probe))
    assert len(range_keep) == total == 3  # ranges prune nothing
    assert len(bloom_keep) == 1  # the bloom pinpoints the file
    got = sorted(
        r.k for r in t.scan_point(spark, "k", int(probe)).collect()
    )
    want = sorted(
        r.k
        for r in t.read(spark).where(F.col("k") == int(probe)).collect()
    )
    assert got == want and got


def test_string_bloom_probe(spark, btable):
    got = sorted(
        r.k for r in btable.scan_point(spark, "name", "u7").collect()
    )
    want = sorted(
        r.k
        for r in btable.read(spark).where(F.col("name") == "u7").collect()
    )
    assert got == want and got  # non-empty


def test_unsupported_type_raises_at_write(spark, tmp_path):
    t = recreate(str(tmp_path / "bad"))
    df = spark.range(5).select((F.col("id") * 1.5).alias("x"))
    with pytest.raises(ValueError, match="not indexable"):
        t.append(df, bloom_cols=("x",))


def test_null_probe_rejected(spark, btable):
    with pytest.raises(ValueError, match="non-null"):
        btable.candidate_files_point("k", None)


def test_bloom_survives_txn_append_and_rollback(spark, btable):
    extra = spark.range(5000, 5100).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("ck"),
        F.lit("vX").alias("name"),
    )
    btable.append_txn(extra, "app", 1)  # un-indexed commit
    # old files keep their blooms: pruning still works for old keys
    keep, total = btable.candidate_files_point("k", 1500)
    # the new commit's files lack a bloom -> conservatively kept
    assert 1 <= len(keep) < total
    got = sorted(r.k for r in btable.scan_point(spark, "k", 1500).collect())
    assert got == [1500]
    v_before = btable.versions()[-2]
    btable.rollback(v_before)
    keep2, _ = btable.candidate_files_point("k", 1500)
    assert len(keep2) == 1  # rollback carried the index forward


def test_bloom_survives_file_scoped_merge(spark, btable):
    # MERGE touching only commit 2's key span rewrites that one file;
    # the untouched files must CARRY their blooms into the new manifest
    # (mirroring keep_stats) — dropping them would silently degrade
    # point pruning after every merge.
    changes = spark.createDataFrame(
        [(1500, 15, "merged", 1, "U")], "k long, ck long, name string, seq int, op string"
    )
    btable.merge(spark, changes, ["k"])
    man = btable._manifest(btable.versions()[-1])
    man_bloom = man.get("bloom", {})
    assert man_bloom, "merge dropped the whole bloom index"
    # every untouched file kept its bloom; only the rewritten files lack one
    unbloomed = [f for f in man["files"] if f not in man_bloom]
    assert 0 < len(unbloomed) < len(man["files"])
    # probe an untouched commit's key: its bloom is retained, so exactly
    # the one file holding it survives (the bloom-less rewrites are
    # range-pruned by their fresh stats for this out-of-span key)
    keep, total = btable.candidate_files_point("k", 123)
    assert total == len(man["files"]) and len(keep) == 1
    assert keep[0] not in unbloomed
    got = sorted(r.k for r in btable.scan_point(spark, "k", 123).collect())
    assert got == [123]
    # the merged row itself is still found (rewritten file kept
    # conservatively despite having no bloom)
    got = btable.scan_point(spark, "k", 1500).collect()
    assert [(r.k, r.name) for r in got] == [(1500, "merged")]


def test_nulls_not_indexed_and_all_null_file_pruned(spark, tmp_path):
    t = recreate(str(tmp_path / "nulls"))
    df = spark.range(10).select(
        F.when(F.col("id") < 5, F.col("id")).alias("k")
    )
    t.append(df.coalesce(1), bloom_cols=("k",))
    got = sorted(r.k for r in t.scan_point(spark, "k", 3).collect())
    assert got == [3]
    keep, _ = t.candidate_files_point("k", 7)  # only null-side values
    assert keep == []
