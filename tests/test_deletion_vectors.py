"""Deletion-vector contracts (sources/txlog.py delete_where_dv +
_read_files): delete rows WITHOUT rewriting files, exact time travel,
idempotency, CDF row-level deltas for dv-only commits, rollback,
compaction as DV purge, and the metadata-weight size gate.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.sources.txlog import (
    compact,
    recreate,
)
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT


@pytest.fixture()
def table(spark, request):
    t = recreate(os.path.join(TMP_ROOT, "dv_tests", request.node.name))
    t.append(
        spark.range(100).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    return t


def _file_state(t):
    man = t._manifest(t.versions()[-1])
    return {
        f: os.path.getmtime(os.path.join(t.root, f)) for f in man["files"]
    }


def test_dv_delete_hides_rows_without_touching_files(spark, table):
    before = _file_state(table)
    v = table.delete_where_dv(spark, "k = 3")
    assert v == 2
    man = table._manifest(v)
    assert man["files"] == sorted(before)  # same file list
    assert _file_state(table) == before  # same bytes: no rewrite
    assert sum(len(ps) for ps in man["dv"].values()) == 14  # ids 3,10,...,94
    got = table.read(spark)
    assert got.count() == 86
    assert got.where(F.col("k") == 3).count() == 0
    # time travel to v1 still sees every row
    assert table.read(spark, version=1).count() == 100


def test_dv_delete_is_idempotent_and_accumulates(spark, table):
    v2 = table.delete_where_dv(spark, "k = 3")
    assert table.delete_where_dv(spark, "k = 3") == v2  # no-op: no new commit
    v3 = table.delete_where_dv(spark, "id < 5")
    assert v3 == v2 + 1
    assert table.read(spark).count() == 100 - 14 - 4  # id 3 already gone
    # scans and point reads honor the dv too
    assert table.scan(spark, "id", 0, 10).where(F.col("k") == 3).count() == 0
    assert table.scan(spark, "id", 0, 4).count() == 0


def test_cdf_emits_dv_only_deletes_and_replay_reconstructs(spark, table):
    table.delete_where_dv(spark, "k = 3")          # v2: dv-only deletes
    table.append(
        spark.range(100, 110).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("v")
        )
    )                                              # v3: plain append
    table.delete_where_dv(spark, "id >= 105")      # v4: dv over the new file
    feed = table.read_changes(spark, 1).collect()
    dels = [r for r in feed if r._change_type == "delete"]
    assert {r._commit_version for r in dels} == {2, 4}
    assert sorted(r.id for r in dels if r._commit_version == 2) == list(
        range(3, 100, 7)
    )
    assert sorted(r.id for r in dels if r._commit_version == 4) == [105, 106, 107, 108, 109]
    # replay invariant: v1 + feed(1, v] == snapshot at v, for every v
    for v in table.versions():
        snap = {tuple(r) for r in table.read(spark, version=v).collect()}
        state = {tuple(r) for r in table.read(spark, version=1).collect()}
        for r in table.read_changes(spark, 1, v).collect():
            row = (r.id, r.k, r.v)
            if r._change_type == "insert":
                state.add(row)
            else:
                state.discard(row)
        assert state == snap, f"replay mismatch at v{v}"


def test_rollback_restores_pre_dv_state_and_cdf_reinserts(spark, table):
    table.delete_where_dv(spark, "k = 3")  # v2
    v3 = table.rollback(1)  # restore: dv cleared with the old manifest
    assert table.read(spark).count() == 100
    feed = table.read_changes(spark, 2, v3).collect()
    ins = [r for r in feed if r._change_type == "insert"]
    assert sorted(r.id for r in ins) == list(range(3, 100, 7))  # rows came back


def test_compact_purges_dv(spark, table):
    table.delete_where_dv(spark, "k = 3")
    v = compact(table, spark, target_files=1)
    man = table._manifest(v)
    assert man["dv"] == {}  # rewritten files are dv-free (PURGE)
    assert table.read(spark).count() == 86  # deletes stay applied


def test_merge_rewrite_drops_touched_dv_carries_rest(spark, table):
    """A file-scoped DELETE WHERE after a DV delete: rewritten files'
    DV entries die with them; untouched files keep theirs."""
    table.delete_where_dv(spark, "k = 3")
    # file-rewrite delete over a disjoint id range
    table.delete_where(spark, "id", 90, 99)
    got = table.read(spark)
    assert got.where(F.col("k") == 3).count() == 0  # dv still applied
    assert got.where(F.col("id") >= 90).count() == 0
    # exact expectation: survivors = ids not(k==3) and not(90..99)
    want = [i for i in range(100) if i % 7 != 3 and not (90 <= i <= 99)]
    assert sorted(r.id for r in got.collect()) == want


def test_size_gate_raises_past_max_rows(spark, table):
    with pytest.raises(ValueError, match="delete_where_dv"):
        table.delete_where_dv(spark, "id >= 0", max_rows=10)


def test_detail_reports_dv_debt(spark, table):
    from ecommerce_dataengineering_project_spark.sources.txlog import detail

    assert detail(table)["num_dv_rows"] == 0
    table.delete_where_dv(spark, "k = 3")
    d = detail(table)
    assert d["num_dv_rows"] == 14 and d["num_dv_files"] >= 1
    compact(table, spark, target_files=1)
    assert detail(table)["num_dv_rows"] == 0  # purge clears the debt


def test_update_where_dv_is_one_atomic_commit(spark, table):
    from ecommerce_dataengineering_project_spark.sources.txlog import detail

    v = table.update_where_dv(spark, "k = 3", {"v": "v + 1000000"})
    assert v == 2 and table.versions() == [1, 2]  # ONE commit, both arms
    got = table.read(spark)
    assert got.count() == 100  # update, not delete
    updated = got.where(F.col("k") == 3).collect()
    assert sorted(r.v for r in updated) == [i * 10 + 1000000 for i in range(3, 100, 7)]
    # pre-images still time-travel
    old = table.read(spark, version=1).where(F.col("k") == 3).collect()
    assert all(r.v < 1000000 for r in old)
    # CDF shows the preimage/postimage pair at v2
    feed = [r for r in table.read_changes(spark, 1).collect() if r._commit_version == 2]
    pre = sorted(r.v for r in feed if r._change_type == "delete")
    post = sorted(r.v for r in feed if r._change_type == "insert")
    assert pre == [i * 10 for i in range(3, 100, 7)]
    assert post == [i * 10 + 1000000 for i in range(3, 100, 7)]
    assert detail(table)["num_dv_rows"] == 14


def test_update_where_dv_respects_constraints_and_gate(spark, table):
    table.add_constraint(spark, "v_nonneg", "v >= 0")
    with pytest.raises(Exception):
        table.update_where_dv(spark, "k = 3", {"v": "-1"})  # violates CHECK
    with pytest.raises(ValueError, match="update_where_dv"):
        table.update_where_dv(spark, "id >= 0", {"v": "v"}, max_rows=10)
    # failed attempts committed nothing
    assert table.read(spark).where(F.col("v") < 0).count() == 0


def test_table_stream_refuses_dv_commits_unless_ignore_changes(spark, table):
    """readStream over the table: a DV commit is a non-append (emitted
    rows got deleted upstream) — the source must refuse without
    ignoreChanges and continue new-files-only with it (Delta
    semantics)."""
    import os as _os

    from ecommerce_dataengineering_project_spark.sources import pyds_txlog

    pyds_txlog.register(spark)
    table.delete_where_dv(spark, "k = 3")
    table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    sink = _os.path.join(table.root, "_stream_sink")
    ckpt = _os.path.join(table.root, "_stream_ckpt")

    def run(ignore_changes):
        q = (
            spark.readStream.format("txlog_stream")
            .option("path", table.root)
            .option("ignoreChanges", str(ignore_changes).lower())
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="deletion vectors|DV|StreamingQuery"):
        run(False)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(sink, ignore_errors=True)
    run(True)  # degrades to new-files-only
    got = spark.read.parquet(sink)
    assert got.count() == 105  # all files' rows; DV retraction is downstream's job


def test_dv_delete_equals_plain_filter_for_random_predicates(spark):
    """Property: for ANY modulus predicate, DV-delete == NOT-filter of
    the base, and a follow-up DV-update == CASE over that. Random-ish
    sweep over parameters rather than hypothesis (the table build
    dominates; a handful of diverse moduli covers the shapes)."""
    for mod, rem in [(3, 0), (7, 5), (97, 1), (2, 1)]:
        t = recreate(os.path.join(TMP_ROOT, "dv_tests", f"prop_{mod}_{rem}"))
        base = spark.range(200).select(
            F.col("id"), (F.col("id") * 3 % 11).alias("v")
        )
        t.append(base.repartition(3))
        t.delete_where_dv(spark, f"id % {mod} = {rem}")
        want = sorted(
            (r.id, r.v) for r in base.where(~(F.col("id") % mod == rem)).collect()
        )
        got = sorted((r.id, r.v) for r in t.read(spark).collect())
        assert got == want, (mod, rem)
        t.update_where_dv(spark, "v = 0", {"v": "99"})
        want2 = sorted(
            (i, 99 if v == 0 else v) for i, v in want
        )
        got2 = sorted((r.id, r.v) for r in t.read(spark).collect())
        assert got2 == want2, (mod, rem)


def test_metadata_only_constraint_commits_carry_dv(spark, table):
    """ADVICE r8 (high): add/drop_constraint publish metadata-only
    commits — dropping the dv map there resurrected every DV-deleted
    row in the new snapshot. DVs must ride along untouched."""
    table.delete_where_dv(spark, "k = 3")
    before = sorted(tuple(r) for r in table.read(spark).collect())
    assert len(before) == 86
    v = table.add_constraint(spark, "v_nonneg", "v >= 0")
    assert sum(len(ps) for ps in table._manifest(v)["dv"].values()) == 14
    assert sorted(tuple(r) for r in table.read(spark).collect()) == before
    v = table.drop_constraint("v_nonneg")
    assert sum(len(ps) for ps in table._manifest(v)["dv"].values()) == 14
    assert sorted(tuple(r) for r in table.read(spark).collect()) == before


def test_constraint_commit_after_dv_update_keeps_single_image(spark, table):
    """The UPDATE flavor of the same bug: losing the dv map after
    update_where_dv would DOUBLE-COUNT updated rows (pre-image rows
    resurrect while post-image files stay)."""
    table.update_where_dv(spark, "k = 3", {"v": "-1"})
    before = sorted(tuple(r) for r in table.read(spark).collect())
    assert len(before) == 100  # update, not delete: count unchanged
    table.add_constraint(spark, "id_nonneg", "id >= 0")
    after = sorted(tuple(r) for r in table.read(spark).collect())
    assert after == before


def test_symlink_manifest_refuses_dv_snapshots(spark, table):
    """ADVICE r8 (medium): a symlink manifest is a bare file list — an
    external engine reading it cannot apply DVs, so GENERATE must
    refuse on a DV-carrying snapshot (Delta does the same). compact()
    purges the DVs and unblocks it."""
    from ecommerce_dataengineering_project_spark.sources.txlog import (
        generate_symlink_manifest,
    )

    table.delete_where_dv(spark, "k = 3")
    with pytest.raises(ValueError, match="deletion vectors"):
        generate_symlink_manifest(table)
    # explicit old versions without DVs are still exportable
    assert os.path.exists(generate_symlink_manifest(table, version=1))
    compact(table, spark, target_files=1)  # DV purge
    assert os.path.exists(generate_symlink_manifest(table))


def test_dv_candidate_scan_is_ntz_normalized(spark, request):
    """ADVICE r8 (low): the DV predicate scan must evaluate over the
    same NTZ-normalized relation as read() — a raw parquet scan sees
    TIMESTAMP_NTZ where read() sees TIMESTAMP, so a timestamp predicate
    could delete a different row set than it selects on read."""
    t = recreate(os.path.join(TMP_ROOT, "dv_tests", request.node.name))
    t.append(
        spark.sql(
            "SELECT id, timestampadd(HOUR, CAST(id AS INT), "
            "timestamp_ntz'2024-03-01 00:00:00') AS ts FROM range(48)"
        )
    )
    man = t._manifest(t.versions()[-1])
    keyed = t._dv_candidates(spark, "true", man)
    assert "timestamp_ntz" not in {dt for _, dt in keyed.dtypes}
    pred = "ts < timestamp'2024-03-02 00:00:00'"
    want_gone = {r.id for r in t.read(spark).where(pred).collect()}
    assert want_gone == set(range(24))
    t.delete_where_dv(spark, pred)
    kept = {r.id for r in t.read(spark).collect()}
    assert kept == set(range(24, 48))


def test_dv_refuses_unsafe_basenames_from_adopted_layouts(spark, tmp_path):
    """DVs key on part-file basenames, which adopted layouts can break
    (duplicate basenames across partition dirs; URI-encoding names) —
    the write paths must refuse loudly instead of misattributing or
    silently skipping positions."""
    from ecommerce_dataengineering_project_spark.sources.txlog import (
        convert_to_txlog,
    )

    root = str(tmp_path / "adopted")
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).alias("part")
    )
    df.where("part = 0").coalesce(1).write.parquet(root + "/d0")
    df.where("part = 1").coalesce(1).write.parquet(root + "/d1")
    # same spark write pattern -> both dirs hold a part-00000-... file
    # with DIFFERENT uuids; force a true collision by renaming
    import glob
    import shutil

    for sub in ("d0", "d1"):
        f = glob.glob(os.path.join(root, sub, "*.parquet"))[0]
        shutil.move(f, os.path.join(root, sub, "part-00000.parquet"))
    t = convert_to_txlog(root, spark)
    with pytest.raises(ValueError, match="share the basename"):
        t.delete_where_dv(spark, "id % 3 = 0")
    with pytest.raises(ValueError, match="share the basename"):
        t.update_where_dv(spark, "id = 1", {"id": "99"})
