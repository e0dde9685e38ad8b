"""Symlink-manifest export + compaction contracts (sources/txlog.py:
generate_symlink_manifest / read_via_manifest / compact / auto_compact).

Value parity of the registered queries is in test_oracle_parity; these
pin what parity can't see: an EXTERNAL engine (DuckDB, playing Athena)
reading the table through the manifest with no log knowledge, manifest
atomicity/snapshot isolation, the file-count drop from compaction with
history intact, and the auto-compact threshold no-op.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.sources.txlog import (
    MANIFEST_DIR,
    auto_compact,
    compact,
    generate_symlink_manifest,
    read_via_manifest,
    recreate,
)
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT


@pytest.fixture()
def root(request):
    return os.path.join(TMP_ROOT, "manifest_tests", request.node.name)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )


def test_external_engine_reads_through_manifest(spark, root):
    """DuckDB queries the txlog table via the manifest file list —
    the reference's Athena integration, with DuckDB as Athena."""
    t = recreate(root)
    t.append(_df(spark, 0, 50))
    t.append(_df(spark, 50, 80))
    path = generate_symlink_manifest(t)
    files = [line.strip() for line in open(path)]
    con = duckdb.connect()
    n, s = con.execute(
        "SELECT COUNT(*), SUM(id) FROM read_parquet($files)", {"files": files}
    ).fetchone()
    assert (n, s) == (80, sum(range(80)))


def test_manifest_is_a_snapshot_not_a_live_view(spark, root):
    """Files committed after generation stay invisible to manifest
    readers until regeneration — Delta's contract."""
    t = recreate(root)
    t.append(_df(spark, 0, 10))
    generate_symlink_manifest(t)
    t.append(_df(spark, 10, 25))
    assert read_via_manifest(spark, root).count() == 10  # old snapshot
    generate_symlink_manifest(t)
    assert read_via_manifest(spark, root).count() == 25


def test_manifest_can_pin_an_old_version(spark, root):
    t = recreate(root)
    t.append(_df(spark, 0, 10))
    t.append(_df(spark, 10, 25))
    generate_symlink_manifest(t, version=1)
    assert read_via_manifest(spark, root).count() == 10


def test_compact_shrinks_files_keeps_rows_and_history(spark, root):
    t = recreate(root)
    for b in range(6):
        t.append(_df(spark, b * 10, b * 10 + 10).repartition(3))
    before = len(t._manifest(t.versions()[-1])["files"])
    assert before >= 18
    v = compact(t, spark, target_files=2)
    man = t._manifest(v)
    assert len(man["files"]) <= 2
    assert t.read(spark).count() == 60
    assert sorted(r.id for r in t.read(spark).collect()) == list(range(60))
    # history intact: the pre-compact snapshot still time-travels
    assert t.read(spark, version=v - 1).count() == 60
    assert len(t._manifest(v - 1)["files"]) == before


def test_auto_compact_threshold(spark, root):
    t = recreate(root)
    t.append(_df(spark, 0, 10).repartition(4))
    assert auto_compact(t, spark, max_files=16, target_files=2) is None
    for b in range(1, 6):
        t.append(_df(spark, b * 10, b * 10 + 10).repartition(4))
    v = auto_compact(t, spark, max_files=16, target_files=2)
    assert v is not None
    assert len(t._manifest(v)["files"]) <= 2
    # idempotent: now under the threshold again
    assert auto_compact(t, spark, max_files=16, target_files=2) is None
    assert os.path.isdir(os.path.join(root, "_txlog"))
    assert not os.path.exists(os.path.join(root, MANIFEST_DIR))  # opt-in only
