"""Column-mapping contracts (sources/txlog.py rename_column /
drop_column — the Delta columnMapping twin): rename/drop as
metadata-only commits with ZERO files rewritten, per-version logical
schemas under time travel, write-side physical translation, stats and
bloom pruning through renames, retired-name collision refusal, CDF
boundary refusal, compact() as the mapping purge, and the carry sweep
(every commit kind must forward the mapping — the same data-coupled
discipline the DV carry tests enforce).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.sources.txlog import (
    compact,
    generate_symlink_manifest,
    recreate,
)
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT


@pytest.fixture()
def table(spark, request):
    t = recreate(os.path.join(TMP_ROOT, "colmap_tests", request.node.name))
    t.append(
        spark.range(100).select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            (F.col("id") * 10).alias("v"),
        )
    )
    return t


def _mtimes(t):
    man = t._manifest(t.versions()[-1])
    return {f: os.path.getmtime(os.path.join(t.root, f)) for f in man["files"]}


def test_rename_is_metadata_only_and_time_travels(spark, table):
    before = _mtimes(table)
    v = table.rename_column("v", "value")
    assert v == 2
    assert _mtimes(table) == before  # zero files rewritten
    got = table.read(spark)
    assert set(got.columns) == {"id", "k", "value"}
    assert got.agg(F.sum("value")).collect()[0][0] == sum(i * 10 for i in range(100))
    # each snapshot reads under its OWN mapping
    old = table.read(spark, version=1)
    assert set(old.columns) == {"id", "k", "v"}


def test_append_after_rename_translates_to_physical(spark, table):
    table.rename_column("v", "value")
    table.append(
        spark.range(100, 110).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("value")
        )
    )
    got = table.read(spark, merge_schema=True)
    assert set(got.columns) == {"id", "k", "value"}
    assert got.count() == 110
    # ONE physical schema across all files: the new file stores 'v'
    man = table._manifest(table.versions()[-1])
    import pyarrow.parquet as pq

    for f in man["files"]:
        names = pq.read_schema(os.path.join(table.root, f)).names
        assert "v" in names and "value" not in names, (f, names)


def test_stats_and_scan_prune_through_a_rename(spark, table):
    table.rename_column("v", "value")
    keep, total = table.candidate_files("value", 980, 990)
    assert 0 < len(keep) <= total
    got = table.scan(spark, "value", 980, 990)
    assert sorted(r.id for r in got.collect()) == [98, 99]
    assert "value" in got.columns


def test_bloom_point_read_through_a_rename(spark, table):
    t = recreate(table.root + "_bloom")
    t.append(
        spark.range(64).select(F.col("id"), (F.col("id") * 3).alias("v")),
        bloom_cols=("v",),
    )
    t.rename_column("v", "tripled")
    # bloom built pre-rename prunes a post-rename point read
    got = t.scan_point(spark, "tripled", 96)
    assert [r.id for r in got.collect()] == [32]
    # and an indexed append AFTER the rename still builds (physical key)
    t.append(
        spark.range(64, 80).select(F.col("id"), (F.col("id") * 3).alias("tripled")),
        bloom_cols=("tripled",),
    )
    man = t._manifest(t.versions()[-1])
    assert all("v" in b for b in man["bloom"].values())  # keyed physical
    assert [r.id for r in t.scan_point(spark, "tripled", 210).collect()] == [70]


def test_drop_column_hides_bytes_and_blocks_readd(spark, table):
    before = _mtimes(table)
    table.drop_column("v")
    assert _mtimes(table) == before
    assert set(table.read(spark).columns) == {"id", "k"}
    assert set(table.read(spark, version=1).columns) == {"id", "k", "v"}
    # re-adding the dropped name would resurrect old bytes: refused
    with pytest.raises(ValueError, match="retired physical"):
        table.append(
            spark.range(3).select(
                F.col("id"), (F.col("id") % 7).alias("k"), F.lit(1).alias("v")
            )
        )
    # compact() purges the mapping; the name is free again
    compact(table, spark, target_files=1)
    man = table._manifest(table.versions()[-1])
    assert man["colmap"] == {} and man["dropped"] == []
    table.append(
        spark.range(3).select(
            F.col("id"), (F.col("id") % 7).alias("k"), F.lit(1).alias("v")
        )
    )
    got = table.read(spark, merge_schema=True)
    # old v bytes purged: only the 3 re-added rows carry v
    assert got.where(F.col("v").isNotNull()).count() == 3


def test_rename_collision_rules(spark, table):
    table.rename_column("v", "value")
    with pytest.raises(ValueError, match="already exists"):
        table.rename_column("k", "value")
    # the retired physical slot 'v' is occupied by old bytes
    with pytest.raises(ValueError, match="physical"):
        table.rename_column("k", "v")
    # renaming BACK to the physical name collapses to identity mapping
    table.rename_column("value", "v")
    assert table._manifest(table.versions()[-1])["colmap"] == {}
    assert set(table.read(spark).columns) == {"id", "k", "v"}


def test_constraint_reference_blocks_rename_and_drop(spark, table):
    table.add_constraint(spark, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        table.rename_column("v", "value")
    with pytest.raises(ValueError, match="constraint"):
        table.drop_column("v")
    table.drop_constraint("v_nonneg")
    assert table.rename_column("v", "value") > 0


def test_every_commit_kind_carries_the_mapping(spark, table):
    """The DV-carry discipline for colmap: delete/merge/dv/constraint/
    rollback commits after a rename must forward the mapping (losing it
    would surface physical names and resurrect dropped columns)."""
    table.rename_column("v", "value")
    want = {"v": "value"}
    table.add_constraint(spark, "id_nonneg", "id >= 0")
    assert table._manifest(table.versions()[-1])["colmap"] == want
    table.delete_where_dv(spark, "k = 3")
    assert table._manifest(table.versions()[-1])["colmap"] == want
    table.update_where_dv(spark, "k = 5", {"value": "-1"})
    assert table._manifest(table.versions()[-1])["colmap"] == want
    table.delete_where(spark, "id", 0, 4)
    assert table._manifest(table.versions()[-1])["colmap"] == want
    changes = spark.createDataFrame(
        [(200, 0, 5, 1, "I")], "id BIGINT, k BIGINT, value BIGINT, seq INT, op STRING"
    )
    table.merge(spark, changes, ["id"])
    assert table._manifest(table.versions()[-1])["colmap"] == want
    got = table.read(spark, merge_schema=True)
    assert "value" in got.columns and "v" not in got.columns
    # the DV'd/updated/deleted/merged state is all consistent
    assert got.where(F.col("k") == 3).count() == 0
    assert got.where(F.col("value") == -1).count() == got.where(F.col("k") == 5).count()
    v_now = table.versions()[-1]
    table.rollback(2)  # v2 = the rename commit: mapping restores with data
    man = table._manifest(table.versions()[-1])
    assert man["colmap"] == want
    assert table.read(spark).count() == 100
    table.rollback(1)  # pre-rename snapshot: mapping rolls back too
    assert table._manifest(table.versions()[-1])["colmap"] == {}
    assert set(table.read(spark).columns) == {"id", "k", "v"}
    assert v_now > 2


def test_dv_predicate_uses_logical_names(spark, table):
    table.rename_column("v", "value")
    table.delete_where_dv(spark, "value >= 980")
    assert table.read(spark).count() == 98
    assert table.read(spark).agg(F.max("value")).collect()[0][0] == 970


def test_cdf_refuses_ranges_crossing_a_rename(spark, table):
    table.rename_column("v", "value")
    table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("value")
        )
    )
    with pytest.raises(ValueError, match="column-mapping"):
        table.read_changes(spark, 0)
    # either side of the boundary works
    feed = table.read_changes(spark, 2)  # (2, 3]: post-rename only
    assert {r.id for r in feed.collect()} == set(range(100, 105))
    assert "value" in feed.columns


def test_symlink_manifest_refuses_mapped_snapshots(spark, table):
    table.rename_column("v", "value")
    with pytest.raises(ValueError, match="column mapping"):
        generate_symlink_manifest(table)
    compact(table, spark, target_files=1)
    assert os.path.exists(generate_symlink_manifest(table))


def test_overwrite_resets_the_mapping(spark, table):
    table.rename_column("v", "value")
    table.overwrite(spark.range(5).select(F.col("id"), F.lit(1).alias("value")))
    man = table._manifest(table.versions()[-1])
    assert man["colmap"] == {} and man["dropped"] == []
    import pyarrow.parquet as pq

    f = man["files"][0]
    assert "value" in pq.read_schema(os.path.join(table.root, f)).names


def test_clone_carries_the_mapping(spark, table):
    import shutil

    table.rename_column("v", "value")
    shutil.rmtree(table.root + "_clone", ignore_errors=True)
    clone = table.shallow_clone(table.root + "_clone")
    got = clone.read(spark)
    assert "value" in got.columns and got.count() == 100


def test_stream_source_applies_start_time_mapping(spark, table):
    from ecommerce_dataengineering_project_spark.sources import pyds_txlog

    table.rename_column("v", "value")
    pyds_txlog.register(spark)
    import shutil

    sink = os.path.join(TMP_ROOT, "colmap_tests", "stream_sink")
    ckpt = os.path.join(TMP_ROOT, "colmap_tests", "stream_ckpt")
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        spark.readStream.format("txlog_stream")
        .option("path", table.root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(sink)
    assert "value" in got.columns and got.count() == 100
    # a rename landing AFTER the reader captured its schema stops the
    # stream (a restart re-captures and continues — Delta's
    # schemaTrackingLocation restart semantics); drive the reader
    # protocol directly since availableNow restarts always re-capture
    reader = pyds_txlog.TxLogStreamReader({"path": table.root}, None)
    v_rename = table.rename_column("value", "worth")
    with pytest.raises(ValueError, match="column mapping"):
        reader.partitions({"version": 0}, {"version": v_rename})
    # a fresh reader picks the new mapping up and is fine
    fresh = pyds_txlog.TxLogStreamReader({"path": table.root}, None)
    assert fresh.partitions({"version": 0}, {"version": v_rename})


def test_random_op_sequences_match_a_logical_model(spark):
    """Model-based sweep (the DV property-test discipline applied to
    column mapping): seeded pseudo-random sequences of
    append / rename / drop / dv-delete / rollback / compact must keep
    ``read()`` equal to a pure-Python logical model at every step —
    the class of bug the r7/r8 audits kept finding (a carry missed on
    ONE commit kind) cannot survive a sweep that interleaves them."""
    import random

    for seed in (7, 23, 41, 97):
        rng = random.Random(seed)
        t = recreate(os.path.join(TMP_ROOT, "colmap_tests", f"model_{seed}"))

        # logical model: list of dicts + current column list
        cols = ["id", "a", "b"]
        next_id = 0

        def fresh_rows(n):
            nonlocal next_id
            rows = [
                {cols[0]: next_id + i, **{c: (next_id + i) * (j + 2) for j, c in enumerate(cols[1:])}}
                for i in range(n)
            ]
            next_id += n
            return rows

        def to_df(rows):
            return spark.createDataFrame(
                [tuple(r[c] for c in cols) for r in rows],
                ", ".join(f"{c} BIGINT" for c in cols),
            )

        model = fresh_rows(20)
        t.append(to_df(model))
        history = {1: (list(model), list(cols))}
        renames = 0

        for _step in range(8):
            op = rng.choice(["append", "rename", "drop", "dvdel", "rollback", "compact"])
            try:
                if op == "append":
                    rows = fresh_rows(rng.randint(1, 8))
                    t.append(to_df(rows))
                    model = model + rows
                elif op == "rename" and len(cols) >= 2:
                    old = rng.choice(cols[1:])
                    new = f"r{renames}_{old[-1]}"
                    renames += 1
                    t.rename_column(old, new)
                    cols = [new if c == old else c for c in cols]
                    model = [{(new if k == old else k): v for k, v in r.items()} for r in model]
                elif op == "drop" and len(cols) > 2:
                    victim = rng.choice(cols[1:])
                    t.drop_column(victim)
                    cols = [c for c in cols if c != victim]
                    model = [{k: v for k, v in r.items() if k != victim} for r in model]
                elif op == "dvdel":
                    m = rng.choice([3, 5, 7])
                    t.delete_where_dv(spark, f"{cols[0]} % {m} = 1")
                    model = [r for r in model if r[cols[0]] % m != 1]
                elif op == "rollback":
                    target = rng.choice(sorted(history))
                    t.rollback(target)
                    model, cols = list(history[target][0]), list(history[target][1])
                elif op == "compact":
                    compact(t, spark, target_files=2)
            except ValueError:
                # legitimate refusals (retired-name reuse, etc.): state
                # must be unchanged — the comparison below verifies it
                pass
            history[t.versions()[-1]] = (list(model), list(cols))
            got = t.read(spark, merge_schema=True)
            assert sorted(got.columns) == sorted(cols), (seed, _step, op)
            want = sorted(tuple(r[c] for c in sorted(cols)) for r in model)
            have = sorted(
                tuple(row[c] for c in sorted(cols)) for row in got.collect()
            )
            assert have == want, (seed, _step, op)


def test_append_rebase_restages_after_concurrent_rename(spark, table, monkeypatch):
    """A rename landing between an append's write and its CAS must not
    commit files staged under the stale mapping. Non-conflicting
    appends restage under the winner's mapping and succeed; an append
    carrying the renamed column's OLD name fails LOUDLY (two logicals
    may never share one physical slot)."""
    from ecommerce_dataengineering_project_spark.sources.txlog import (
        ConcurrentCommitError,
        TxTable,
    )

    t2 = TxTable(table.root)  # the racing writer's handle
    real_publish = table._publish
    fired = []

    def racing_publish(version, files, action, *a, **k):
        if not fired and action == "append":
            fired.append(version)
            t2.rename_column("v", "value")  # the winner's commit
            raise ConcurrentCommitError("simulated lost CAS")
        return real_publish(version, files, action, *a, **k)

    monkeypatch.setattr(table, "_publish", racing_publish)
    # subset append (no renamed column): restages and lands cleanly
    table.append(
        spark.range(100, 105).select(F.col("id"), (F.col("id") % 7).alias("k"))
    )
    monkeypatch.undo()
    got = table.read(spark, merge_schema=True)
    assert set(got.columns) == {"id", "k", "value"}
    assert got.count() == 105
    assert got.where(F.col("id") >= 100).agg(F.sum("value")).collect()[0][0] is None

    # conflicting append: the appender still carries the column under
    # the name the winner just turned into an occupied PHYSICAL slot
    # (v -> value leaves physical 'v' holding logical 'value') — the
    # restage must refuse loudly, never let two logicals share 'v'
    t3 = recreate(table.root + "_conflict")
    t3.append(
        spark.range(10).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    fired.clear()
    real_publish3 = t3._publish

    def racing_publish3(version, files, action, *a, **k):
        if not fired and action == "append":
            fired.append(version)
            TxTable(t3.root).rename_column("v", "value")
            raise ConcurrentCommitError("simulated lost CAS")
        return real_publish3(version, files, action, *a, **k)

    monkeypatch.setattr(t3, "_publish", racing_publish3)
    with pytest.raises(ValueError, match="retired physical"):
        t3.append(
            spark.range(10, 15).select(
                F.col("id"),
                (F.col("id") % 7).alias("k"),
                (F.col("id") * 10).alias("v"),
            )
        )


def test_detail_reports_mapping_debt(spark, table):
    from ecommerce_dataengineering_project_spark.sources.txlog import detail

    assert detail(table)["num_renamed_columns"] == 0
    table.rename_column("v", "value")
    table.append(
        spark.range(100, 103).select(
            F.col("id"), (F.col("id") % 7).alias("k"), F.lit(0).cast("bigint").alias("value")
        )
    )
    table.drop_column("k")
    d = detail(table)
    assert d["num_renamed_columns"] == 1 and d["num_dropped_columns"] == 1
    compact(table, spark, target_files=1)
    d = detail(table)
    assert d["num_renamed_columns"] == 0 and d["num_dropped_columns"] == 0


def test_stream_resume_across_a_rename_is_refused(spark, table):
    """A checkpoint whose committed offset predates the current mapping
    era must be refused on resume (the sink holds old-named batches);
    a fresh checkpoint (offset 0) replays history under the current
    mapping and is fine."""
    from ecommerce_dataengineering_project_spark.sources import pyds_txlog

    table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 10).alias("v")
        )
    )  # v2
    table.rename_column("v", "value")  # v3 — new era
    reader = pyds_txlog.TxLogStreamReader({"path": table.root}, None)
    # resume from a pre-era committed offset: refused
    with pytest.raises(ValueError, match="previous column mapping"):
        reader.partitions({"version": 1}, {"version": 3})
    with pytest.raises(ValueError, match="previous column mapping"):
        reader.partitions({"version": 2}, {"version": 3})
    # fresh start replays everything under the current mapping
    assert reader.partitions({"version": 0}, {"version": 3})
    # a checkpoint committed inside the era resumes fine
    assert reader.partitions({"version": 3}, {"version": 3}) == []


def test_stream_replay_across_a_compact_purge_is_refused(spark, table):
    """ADVICE r9: a fresh stream (offset 0, ignoreChanges=true)
    replaying history across a compact() that PURGED a column mapping
    must refuse the pre-compact commits — their files hold the old
    physical names, which the start-time (now empty) colmap cannot
    re-express; read() would silently null-pad the renamed column.
    Starting from the post-compact version is fine."""
    from ecommerce_dataengineering_project_spark.sources import pyds_txlog

    table.rename_column("v", "value")  # v2: colmap {v: value}
    v_compact = compact(table, spark, target_files=1)  # purges the mapping
    assert table._manifest(v_compact).get("colmap", {}) == {}
    hi = table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 100).alias("value")
        )
    )
    reader = pyds_txlog.TxLogStreamReader(
        {"path": table.root, "ignoreChanges": "true"}, None
    )
    with pytest.raises(ValueError, match="physical rewrite"):
        reader.partitions({"version": 0}, {"version": hi})
    # crossing replay from just BEFORE the rewrite (the error message's
    # own advice) emits the full rewritten snapshot plus later commits
    full = reader.partitions({"version": v_compact - 1}, {"version": hi})
    assert len(full) > len(
        reader.partitions({"version": v_compact}, {"version": hi})
    )
    # post-compact start: every file is logical-named, replay is exact
    parts = reader.partitions({"version": v_compact}, {"version": hi})
    assert parts
    import pyarrow as pa

    batches = [b for p in parts for b in reader.read(p)]
    assert all("value" in b.schema.names for b in batches)
    assert sum(b.num_rows for b in batches) == 5
    got = pa.Table.from_batches(batches)
    assert got.column("value").null_count == 0


def test_stream_reader_survives_expired_predecessors(spark, table):
    """Regression (r10 review): the regime scan must never read
    manifests outside the replay window unguarded — after
    expire_snapshots removes the predecessors of a surviving
    compact()/rewrite, constructing a reader and streaming from the
    retained range must work, not crash with FileNotFoundError."""
    from ecommerce_dataengineering_project_spark.sources import pyds_txlog
    from ecommerce_dataengineering_project_spark.sources.txlog import expire_snapshots

    table.rename_column("v", "value")  # v2
    v_compact = compact(table, spark, target_files=1)  # v3 purges
    hi = table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 100).alias("value")
        )
    )  # v4
    expire_snapshots(table, keep_versions=2)  # drops v1, v2 manifests
    reader = pyds_txlog.TxLogStreamReader(
        {"path": table.root, "ignoreChanges": "true"}, None
    )
    # fresh stream over the retained range: the compact commit's
    # predecessor manifest is gone; the scan treats it as mapped and
    # floors AT the compact — nothing retained precedes it, so the
    # whole retained history replays
    parts = reader.partitions({"version": 0}, {"version": hi})
    assert parts
    assert sum(
        b.num_rows for p in parts for b in reader.read(p)
    ) == 105  # the full rewritten snapshot + the post-compact append
    # resuming from the retained compact offset also works
    assert reader.partitions({"version": v_compact}, {"version": hi})


def test_stream_rename_after_compact_purge_never_nullpads(spark, table):
    """Adversarial corner: rename -> compact (purge) -> rename AGAIN.
    The start-time mapping ({value: worth}) is expressed against the
    post-compact physical regime, so pre-compact files (physical "v")
    are unmappable and post-compact files map value->worth. Every
    unsafe start must refuse LOUDLY (floor or era guard); the safe
    ones must emit correctly-mapped bytes — never a null-padded
    column."""
    import pyarrow as pa

    from ecommerce_dataengineering_project_spark.sources import pyds_txlog

    table.rename_column("v", "value")  # v2
    v_compact = compact(table, spark, target_files=1)  # v3: purge
    v_rename2 = table.rename_column("value", "worth")  # v4: new era
    hi = table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 100).alias("worth")
        )
    )  # v5
    reader = pyds_txlog.TxLogStreamReader(
        {"path": table.root, "ignoreChanges": "true"}, None
    )
    # fresh full replay: refused at the pre-compact commit (floor)
    with pytest.raises(ValueError, match="physical rewrite"):
        reader.partitions({"version": 0}, {"version": hi})
    # any start inside the purged-but-pre-rename gap: refused by the
    # era guard (a sink fed from there would hold "value"-named rows)
    for lo in (v_compact - 1, v_compact):
        with pytest.raises(ValueError, match="previous column mapping"):
            reader.partitions({"version": lo}, {"version": hi})
    # starts inside the current era emit bytes under the CURRENT name
    parts = reader.partitions({"version": v_rename2}, {"version": hi})
    batches = [b for p in parts for b in reader.read(p)]
    got = pa.Table.from_batches(batches)
    assert "worth" in got.schema.names and "value" not in got.schema.names
    assert got.column("worth").null_count == 0
    assert sorted(got.column("worth").to_pylist()) == [
        i * 100 for i in range(100, 105)
    ]


def test_stream_replay_window_entirely_before_a_purge_is_refused(spark, table):
    """ADVICE r10: the regime-floor scan was scoped to the replay
    window, so a checkpoint-WAL-replayed micro-batch whose recorded
    end offset PREDATES the mapping-purging rewrite saw no purge
    commit — its pre-rewrite files were emitted and silently
    null-padded under the post-rewrite start-time mapping. The
    forward sweep must refuse such a window too."""
    from ecommerce_dataengineering_project_spark.sources import pyds_txlog

    table.rename_column("v", "value")  # v2: colmap {v: value}
    v_pre = table.append(
        spark.range(100, 105).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 100).alias("value")
        )
    )  # v3: files under the MAPPED era (physical name "v")
    v_compact = compact(table, spark, target_files=1)  # v4: purge
    hi = table.append(
        spark.range(200, 205).select(
            F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 100).alias("value")
        )
    )  # v5
    reader = pyds_txlog.TxLogStreamReader(
        {"path": table.root, "ignoreChanges": "true"}, None
    )
    # the WAL-replay shape: a window that ENDS before the purge —
    # no purge commit inside it, but its files are pre-rewrite
    with pytest.raises(ValueError, match="physical rewrite"):
        reader.partitions({"version": 0}, {"version": v_pre})
    with pytest.raises(ValueError, match="physical rewrite"):
        reader.partitions({"version": 2}, {"version": v_pre})
    # the error's own advice: start AT the rewrite (exclusive offset
    # v_compact - 1) for the full rewritten snapshot
    full = reader.partitions({"version": v_compact - 1}, {"version": hi})
    batches = [b for p in full for b in reader.read(p)]
    # rewritten snapshot (105) + v5 append (5), never null-padded
    assert sum(b.num_rows for b in batches) == 110
    assert all(
        b.column(b.schema.names.index("value")).null_count == 0 for b in batches
    )
    # a window entirely after the purge replays exactly, on a FRESH
    # reader (first-window sweep also empty there: hi == latest)
    reader2 = pyds_txlog.TxLogStreamReader(
        {"path": table.root, "ignoreChanges": "true"}, None
    )
    parts = reader2.partitions({"version": v_compact}, {"version": hi})
    assert sum(b.num_rows for p in parts for b in reader2.read(p)) == 5
