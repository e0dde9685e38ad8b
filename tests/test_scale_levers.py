"""Scale levers (operators/bloom.py, operators/zorder.py, txlog
manifest-stats skipping): the oracle checks prove result equality;
these prove the mechanisms actually PRUNE — files skipped, probe rows
dropped before the shuffle, file bounding boxes tightened."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    bloom_semi_join,
    might_contain,
)
from ecommerce_dataengineering_project_spark.operators.zorder import (
    morton_key,
    morton_sql,
    zorder_write,
)


# ------------------------------------------------------------- bloom
def test_bloom_params_sizing():
    m, k = bloom_params(10_000, 0.03)
    assert m >= 10_000 * 5  # ~7.3 bits/key at 3%
    assert m & (m - 1) == 0  # power of two
    assert 1 <= k <= 16
    assert bloom_params(0) == (64, 1)


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    build = spark.range(0, 3000).withColumnRenamed("id", "k").where(
        F.col("k") % 7 == 0
    )
    probe = spark.range(0, 40_000).withColumnRenamed("id", "pk")
    pruned = bloom_semi_join(probe, build, "pk", "k", fpp=0.01)
    true_keys = {r.k for r in build.collect()}
    surviving = {r.pk for r in pruned.collect()}
    assert true_keys <= surviving, "bloom dropped a true match"
    fp = (len(surviving) - len(true_keys)) / (40_000 - len(true_keys))
    assert fp < 0.05  # target 1%, generous margin (power-of-2 m is lower)


def test_bloom_filter_is_codegen_and_preserves_join(spark, sf_dir):
    from ecommerce_dataengineering_project_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    pruned = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan, "bloom probe must stay JVM-side"
    exact = li.join(urgent, li.l_orderkey == urgent.o_orderkey).count()
    with_bloom = pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey).count()
    assert exact == with_bloom
    # and it actually prunes: survivors well below the full probe side
    assert pruned.count() < li.count()


def test_bloom_probe_plan_sublinear_in_k(spark):
    """The r6 probe inlined the bitmap literal once per hash function
    (O(k * m/64) plan text); the forall form binds it once. Growing k
    must grow the expression by only the extra position exprs, never by
    another copy of the words array. (``spark`` is needed for the
    Column -> SQL-string rendering even though no job runs.)"""
    m_bits = 1 << 16
    words = list(range(m_bits // 64))
    warr_len = len("array(" + ", ".join(f"{w}L" for w in words) + ")")
    e4 = str(might_contain("pk", words, m_bits, 4)._jc)
    e12 = str(might_contain("pk", words, m_bits, 12)._jc)
    # exactly one embedded copy of the words array in each
    assert len(e12) - len(e4) < warr_len // 2, (len(e4), len(e12), warr_len)
    assert len(e12) < 2 * warr_len


def test_bloom_build_words_bounded():
    m, k = bloom_params(1_000_000, 0.03)
    assert m // 64 <= 1 << 18  # the collect is bounded by CHOSEN m


def test_bloom_literal_size_gate(spark):
    """Above max_bits the operator must NOT build the bitmap literal
    (a 2^27-bit array is ~16 MB of SQL text) — it degrades to an exact
    left-semi join. Forced low gate: the plan shows a join, contains no
    forall/element_at probe, and results equal the exact semi join."""
    build = spark.range(0, 1000).withColumnRenamed("id", "k").where(
        F.col("k") % 3 == 0
    )
    probe = spark.range(0, 5000).withColumnRenamed("id", "pk")
    gated = bloom_semi_join(probe, build, "pk", "k", max_bits=64)
    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    assert "forall" not in plan and "element_at" not in plan
    assert "Join LeftSemi" in plan
    got = sorted(r.pk for r in gated.collect())
    assert got == list(range(0, 1000, 3))  # build keys stop at 999
    # and the default gate admits normally-sized filters: same inputs,
    # default max_bits -> literal-probe path (no join in the plan)
    bloomed = bloom_semi_join(probe, build, "pk", "k")
    plan2 = bloomed._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan2 and "forall" in plan2


# ------------------------------------------------------------ zorder
def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_key_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535, 70000) for y in (0, 3, 128, 65535)],
        "x long, y long",
    )
    rows = df.select("x", "y", morton_key("x", "y").alias("z")).collect()
    for r in rows:
        assert r.z == _morton_py(min(r.x, 65535), min(r.y, 65535)), (r.x, r.y)


def test_morton_sql_is_engine_portable():
    import duckdb

    expr = morton_sql("x", "y", 8)
    got = duckdb.sql(f"SELECT {expr} AS z FROM (SELECT 77 AS x, 200 AS y)").fetchone()[0]
    assert got == _morton_py(77, 200, 8)


def _file_boxes(path: str, xcol: str, ycol: str) -> list[tuple]:
    boxes = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        lo = {xcol: None, ycol: None}
        hi = {xcol: None, ycol: None}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema in lo and c.statistics is not None:
                    st = c.statistics
                    name = c.path_in_schema
                    lo[name] = st.min if lo[name] is None else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None else max(hi[name], st.max)
        if lo[xcol] is not None and lo[ycol] is not None:
            boxes.append((lo[xcol], hi[xcol], lo[ycol], hi[ycol]))
    return boxes


def test_zorder_layout_tightens_both_dimensions(spark, tmp_path):
    """The point of the curve: vs a layout sorted on x alone, the
    z-ordered files' y-ranges shrink from ~full-domain to fractions,
    so file skipping works for predicates on EITHER column."""
    n, n_files = 40_000, 16
    df = spark.range(n).select(
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(1023))).alias("x"),
        (F.xxhash64("id", F.lit(2)).bitwiseAND(F.lit(1023))).alias("y"),
    )
    z_path, x_path = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    zorder_write(df, z_path, "x", "y", n_files, bits=10)
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.parquet(x_path)

    def mean_y_span(path):
        boxes = _file_boxes(path, "x", "y")
        assert len(boxes) >= n_files // 2
        return sum(b[3] - b[2] for b in boxes) / len(boxes)

    y_span_z, y_span_x = mean_y_span(z_path), mean_y_span(x_path)
    # x-sorted layout leaves y unconstrained (~full 0..1023 span per
    # file); z-order must cut the mean y-span at least in half
    assert y_span_x > 900
    assert y_span_z < y_span_x / 2, (y_span_z, y_span_x)


# ------------------------------------------------- txlog stats skipping
def test_txlog_scan_prunes_files(spark, sf_dir):
    from ecommerce_dataengineering_project_spark.queries.ext_scale import (
        N_RANGE_COMMITS,
        _range_committed_orders,
    )

    table, max_key = _range_committed_orders(spark, sf_dir)
    q = max_key // N_RANGE_COMMITS
    keep, total = table.candidate_files("o_orderkey", lo=None, hi=q)
    assert keep and total > len(keep), (keep, total)
    # only commit 1's range survives: ~1/4 of the snapshot's files
    assert len(keep) <= total // 2
    # the pruned scan still returns exactly the predicate's rows
    got = table.scan(spark, "o_orderkey", hi=q).count()
    want = table.read(spark).where(F.col("o_orderkey") <= q).count()
    assert got == want > 0


def test_txlog_scan_empty_range_keeps_schema(spark, sf_dir):
    from ecommerce_dataengineering_project_spark.queries.ext_scale import (
        _range_committed_orders,
    )

    table, max_key = _range_committed_orders(spark, sf_dir)
    df = table.scan(spark, "o_orderkey", lo=max_key + 10)
    assert df.count() == 0
    assert "o_orderkey" in df.columns


def test_txlog_stats_survive_rollback_and_prune_old_snapshots(spark, tmp_path):
    from ecommerce_dataengineering_project_spark.sources.txlog import recreate

    t = recreate(str(tmp_path / "t"))
    t.append(spark.range(0, 100).selectExpr("id AS k"))
    t.append(spark.range(1000, 1100).selectExpr("id AS k"))
    # version-pinned scan prunes with that version's stats
    keep, total = t.candidate_files("k", lo=1000, version=2)
    assert 0 < len(keep) < total
    assert t.scan(spark, "k", lo=1000, version=1).count() == 0
    t.rollback(1)
    keep3, total3 = t.candidate_files("k", lo=1000)  # latest == rollback
    assert keep3 == [] and total3 > 0

def test_optimize_zorder_makes_scan_selective_on_second_dim(spark, tmp_path):
    """End-to-end lakehouse loop: monotone-id ingest leaves the second
    dimension unprunable (every file spans its full domain); OPTIMIZE
    ZORDER rewrites the snapshot and the SAME manifest-stats scan now
    skips most files for a second-dimension range predicate. History
    stays time-travelable."""
    from ecommerce_dataengineering_project_spark.operators.zorder import (
        optimize_zorder,
    )
    from ecommerce_dataengineering_project_spark.sources.txlog import recreate

    t = recreate(str(tmp_path / "t"))
    # 4 ingest commits ordered by id; y is hash-scattered, so every
    # commit's files span ~the full y domain
    for i in range(4):
        t.append(
            spark.range(i * 10_000, (i + 1) * 10_000)
            .selectExpr(
                "id", "xxhash64(id, 7) & 1023 AS y", "id * 2 AS payload"
            )
            .repartition(2)
        )
    before_keep, before_total = t.candidate_files("y", lo=0, hi=63)
    assert len(before_keep) == before_total  # no skipping possible

    # balanced widths: id (0..40k) shifted into the same 10-bit range
    # as y — unbalanced widths degrade to x-major order (see docstring)
    v = optimize_zorder(t, spark, "id >> 6", "y", n_files=16, bits=10)
    after_keep, after_total = t.candidate_files("y", lo=0, hi=63)
    assert after_total >= 8
    assert len(after_keep) <= after_total // 2, (len(after_keep), after_total)
    # semantics unchanged, history intact
    assert t.scan(spark, "y", lo=0, hi=63).count() == t.read(
        spark, version=4
    ).where("y BETWEEN 0 AND 63").count()
    assert t.read(spark).count() == 40_000
    assert t.read(spark, version=1).count() == 10_000
    assert t._manifest(v)["action"].startswith("optimize-zorder")


def test_zorder_2d_scan_prunes_multiplicatively(spark, sf_dir):
    """After OPTIMIZE ZORDER the conjunctive scan must skip files on
    BOTH dimensions: the 2-D query box keeps fewer files than either
    single-dimension predicate alone would, and the pruned scan still
    returns exactly the predicate's rows."""
    from pyspark.sql import functions as F

    from ecommerce_dataengineering_project_spark.queries.ext_scale import _zopt_orders

    table = _zopt_orders(spark, sf_dir)
    preds = [("o_custkey", 1, 750), ("o_totalprice", 1000.0, 80000.0)]
    both, total = table.candidate_files_multi(preds)
    only_x, _ = table.candidate_files_multi(preds[:1])
    only_y, _ = table.candidate_files_multi(preds[1:])
    assert total >= 8
    assert len(both) < total, "2-D scan skipped nothing"
    assert len(both) <= min(len(only_x), len(only_y))
    got = table.scan_multi(spark, preds).count()
    want = (
        table.read(spark)
        .where(
            (F.col("o_custkey").between(1, 750))
            & (F.col("o_totalprice").between(1000.0, 80000.0))
        )
        .count()
    )
    assert got == want > 0
