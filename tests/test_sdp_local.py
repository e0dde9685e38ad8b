"""Contracts for the local Spark Declarative Pipelines executor
(plans/sdp_local.py, X26): the OFFICIAL pyspark.pipelines decorators,
executed on a classic session.

The oracle-checked medallion slice is sdp_pipeline_daily in
test_oracle_parity; these pin the executor semantics: name-based
dependency resolution regardless of declaration order, streaming
tables fed by multiple append flows with exactly-once re-runs,
external sinks, SQL-file materialized views, unresolvable-graph
errors, and flow-scoped spark_conf restoration.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark import pipelines as pl
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.plans.sdp_local import run_pipeline
from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT


@pytest.fixture()
def root(request):
    path = os.path.join(TMP_ROOT, "sdp_tests", request.node.name)
    shutil.rmtree(path, ignore_errors=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_reverse_declaration_order_resolves_by_name(spark, root):
    def define():
        @pl.materialized_view(name="c_sdp_t")
        def c():
            return spark.table("b_sdp_t").withColumn("z", F.col("y") + 1)

        @pl.materialized_view(name="b_sdp_t")
        def b():
            return spark.table("a_sdp_t").withColumn("y", F.col("x") * 10)

        @pl.materialized_view(name="a_sdp_t")
        def a():
            return spark.range(3).select(F.col("id").alias("x"))

    result = run_pipeline(spark, define, root)
    assert result.runs == ["a_sdp_t", "b_sdp_t", "c_sdp_t"]
    rows = {(r.x, r.y, r.z) for r in result.tables["c_sdp_t"].collect()}
    assert rows == {(0, 0, 1), (1, 10, 11), (2, 20, 21)}


def test_unresolvable_graph_fails_listing_stuck_flows(spark, root):
    def define():
        @pl.materialized_view(name="orphan_sdp_t")
        def orphan():
            return spark.table("never_declared_sdp_t")

    with pytest.raises(ValueError, match="orphan_sdp_t"):
        run_pipeline(spark, define, root)


def test_streaming_table_with_two_append_flows(spark, root):
    src = os.path.join(root, "src")
    spark.range(5).select(F.col("id").alias("n")).write.parquet(src)

    def define():
        pl.create_streaming_table("union_sdp_t", schema="n BIGINT, src STRING")

        @pl.append_flow(target="union_sdp_t", name="flow_a")
        def fa():
            return (
                spark.readStream.schema("n BIGINT").parquet(src)
                .select("n", F.lit("a").alias("src"))
            )

        @pl.append_flow(target="union_sdp_t", name="flow_b")
        def fb():
            return (
                spark.readStream.schema("n BIGINT").parquet(src)
                .select("n", F.lit("b").alias("src"))
            )

    result = run_pipeline(spark, define, root)
    got = result.tables["union_sdp_t"].groupBy("src").count().collect()
    assert {(r.src, r["count"]) for r in got} == {("a", 5), ("b", 5)}
    # exactly-once: a re-run resumes from the flow checkpoints, and the
    # table contents do not double
    result2 = run_pipeline(spark, define, root)
    assert result2.tables["union_sdp_t"].count() == 10


def test_temporary_view_is_not_a_pipeline_table(spark, root):
    def define():
        @pl.temporary_view(name="tv_sdp_t")
        def tv():
            return spark.range(2)

        @pl.materialized_view(name="uses_tv_sdp_t")
        def mv():
            return spark.table("tv_sdp_t")

    result = run_pipeline(spark, define, root)
    assert set(result.tables) == {"uses_tv_sdp_t"}


def test_sink_flow_writes_external_format(spark, root):
    from ecommerce_dataengineering_project_spark.sources import pyds_sink

    pyds_sink.register(spark)
    table_dir = os.path.join(root, "ext_sink")
    os.makedirs(table_dir, exist_ok=True)

    def define():
        pl.create_sink("out_sdp_s", format="ecommerce_jsonl_sink",
                       options={"path": table_dir})

        @pl.append_flow(target="out_sdp_s", name="to_sink")
        def out():
            return spark.range(4).select(
                F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
            )

    run_pipeline(spark, define, root)
    back = pyds_sink.read_jsonl_sink(spark, table_dir, "id BIGINT, v STRING")
    assert back.count() == 4


def test_sql_file_materialized_view(spark, root):
    def define():
        @pl.materialized_view(name="base_sdp_t")
        def base():
            return spark.range(4).select(F.col("id").alias("v"))

    sql_files = {
        "marts.sql": (
            "CREATE MATERIALIZED VIEW doubled_sdp_t AS "
            "SELECT v * 2 AS v2 FROM base_sdp_t"
        )
    }
    result = run_pipeline(spark, define, root, sql_files=sql_files)
    assert sorted(r.v2 for r in result.tables["doubled_sdp_t"].collect()) == [0, 2, 4, 6]


def test_flow_spark_conf_applies_and_restores(spark, root):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    seen = {}

    def define():
        @pl.materialized_view(name="conf_sdp_t", spark_conf={key: "3"})
        def mv():
            seen["during"] = spark.conf.get(key)
            return spark.range(1)

    run_pipeline(spark, define, root)
    assert seen["during"] == "3"
    assert spark.conf.get(key) == before
