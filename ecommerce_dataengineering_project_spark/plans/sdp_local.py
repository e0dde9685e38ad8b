"""Local executor for Spark Declarative Pipelines (SURVEY §2k X26).

Spark 4.1 ships SDP (`pyspark.pipelines`): the declarative successor to
exactly the stack the reference hand-builds — dbt-style materialized
views (`models/fct_purchases.sql`) plus Airflow task wiring
(`pipeline/dags/sales_pipeline_dag.py:65-107`). Upstream, SDP executes
only through Spark Connect (`spark_connect_graph_element_registry`),
and this sandbox has no grpc/protobuf (same class of gap as the absent
Delta/Kafka jars — probed, see STATUS "Known environment bounds").

This module keeps the USER-FACING API exactly upstream's — the real
``@materialized_view`` / ``@table`` / ``@temporary_view`` /
``create_streaming_table`` / ``@append_flow`` / ``create_sink``
decorators from ``pyspark.pipelines``, registered through the official
``GraphElementRegistry`` extension point — and supplies the missing
piece: a classic-session executor.

Execution semantics (mirroring SDP's documented behavior):

- dependency resolution is by DATASET NAME, discovered through
  analysis: a flow whose query references a graph-owned dataset that
  is not yet materialized is deferred and retried after the rest of
  the round (classic sessions analyze eagerly, so an unresolvable
  reference surfaces at query-function call time as
  TABLE_OR_VIEW_NOT_FOUND). No explicit wiring — the reference's DAG
  edges (`sales_pipeline_dag.py`) become implicit in the queries.
- a MATERIALIZED VIEW is fully recomputed and persisted (parquet under
  the pipeline storage root), then exposed by name for downstream
  flows and callers.
- a STREAMING TABLE accumulates the output of one or more APPEND
  FLOWS; each streaming flow runs bounded (availableNow) with its own
  checkpoint under the storage root, so a re-run of the same pipeline
  resumes instead of double-appending (exactly-once per flow). Flows
  append into per-flow subdirectories to keep each file-sink's commit
  log private; the table reads the union.
- a SINK flow writes to an external format (anything
  ``DataFrameWriter``/``writeStream`` can address, including this
  repo's custom Python sink) instead of pipeline-managed storage.
- unresolvable graphs (missing dataset, reference cycle) fail with the
  full list of stuck flows and the names they could not resolve —
  matching SDP's analysis-time error, not a hang.

Scale: the executor only sequences; every flow body is an ordinary
declarative DataFrame plan, so the 100-TB story is each query's own
(partitioned writes, AQE, etc.). Deliberately NOT implemented: pipeline
event logs and expectations metrics (the txlog's
``append_or_quarantine`` covers expectation semantics, X12).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.errors.exceptions.captured import AnalysisException
from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.output import (
    MaterializedView,
    Output,
    Sink,
    StreamingTable,
    TemporaryView,
)
from pyspark.sql import DataFrame, SparkSession

_CREATE_MV_SQL = re.compile(
    r"CREATE\s+MATERIALIZED\s+VIEW\s+(?P<name>\w+)\s+AS\s+(?P<query>.+)",
    re.IGNORECASE | re.DOTALL,
)


class LocalGraphRegistry(GraphElementRegistry):
    """Collects the dataflow graph the official decorators declare."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self.outputs: dict[str, Output] = {}
        self.flows: list[Flow] = []

    def register_output(self, output: Output) -> None:
        if output.name in self.outputs:
            raise ValueError(f"duplicate dataset name: {output.name!r}")
        self.outputs[output.name] = output

    def register_flow(self, flow: Flow) -> None:
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        """SQL-file graph elements; the subset the reference's dbt
        models need: CREATE MATERIALIZED VIEW <name> AS <query>."""
        from pyspark.pipelines.source_code_location import SourceCodeLocation

        spark = self._spark
        for stmt in (s.strip() for s in sql_text.split(";")):
            if not stmt:
                continue
            match = _CREATE_MV_SQL.match(stmt)
            if not match:
                raise ValueError(f"unsupported pipeline SQL: {stmt[:80]!r}")
            name, query = match["name"], match["query"]
            loc = SourceCodeLocation(filename=str(file_path), line_number=None)
            self.register_output(
                MaterializedView(
                    name=name,
                    comment=None,
                    source_code_location=loc,
                    table_properties={},
                    partition_cols=None,
                    cluster_by=None,
                    schema=None,
                    format=None,
                )
            )
            self.register_flow(
                Flow(
                    name=name,
                    target=name,
                    spark_conf={},
                    source_code_location=loc,
                    func=lambda q=query: spark.sql(q),
                )
            )


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame] = field(default_factory=dict)
    runs: list[str] = field(default_factory=list)  # execution order, flow names


def run_pipeline(
    spark: SparkSession,
    define: Callable[[], None],
    storage_root: str,
    sql_files: dict[str, str] | None = None,
) -> PipelineResult:
    """Declare (via the official pyspark.pipelines decorators inside
    ``define``) and execute a pipeline on a classic session."""
    registry = LocalGraphRegistry(spark)
    with graph_element_registration_context(registry):
        define()
        for fname, text in (sql_files or {}).items():
            registry.register_sql(text, Path(fname))

    # A re-run must resolve against THIS run's materializations, not a
    # previous run's leftover views — stale graph-owned names would
    # both corrupt the execution order (a dependent flow resolves
    # before its upstream ran) and read outdated data.
    for name in registry.outputs:
        spark.catalog.dropTempView(name)

    result = PipelineResult()
    pending = list(registry.flows)
    missing_by_flow: dict[str, str] = {}
    while pending:
        progressed = False
        deferred: list[Flow] = []
        for flow in pending:
            overrides = dict(flow.spark_conf)
            saved = {k: spark.conf.get(k, None) for k in overrides}
            try:
                for k, v in overrides.items():
                    spark.conf.set(k, v)
                try:
                    df = flow.func()
                except AnalysisException as e:
                    if "TABLE_OR_VIEW_NOT_FOUND" in str(e):
                        missing_by_flow[flow.name] = str(e).split("\n")[0]
                        deferred.append(flow)
                        continue
                    raise
                # conf overrides stay in force for the flow's EXECUTION
                # (the write), not just its analysis — SDP's contract
                _run_flow(
                    spark, registry.outputs.get(flow.target), flow, df, storage_root
                )
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)
            result.runs.append(flow.name)
            missing_by_flow.pop(flow.name, None)
            progressed = True
        if deferred and not progressed:
            stuck = ", ".join(
                f"{name} ({msg})" for name, msg in sorted(missing_by_flow.items())
            )
            raise ValueError(
                f"pipeline has unresolvable flows (missing dataset or cycle): {stuck}"
            )
        pending = deferred

    for name, output in registry.outputs.items():
        if isinstance(output, (MaterializedView, StreamingTable)):
            result.tables[name] = spark.table(name)
    return result


def _table_dir(storage_root: str, name: str) -> str:
    return os.path.join(storage_root, "tables", name)


def _run_flow(
    spark: SparkSession,
    target: Output | None,
    flow: Flow,
    df: DataFrame,
    storage_root: str,
) -> None:
    if target is None:
        raise ValueError(f"flow {flow.name!r} targets unknown dataset {flow.target!r}")
    if isinstance(target, TemporaryView):
        df.createOrReplaceTempView(target.name)
        return
    if isinstance(target, Sink):
        _write_external(df, target, flow, storage_root)
        return
    if isinstance(target, MaterializedView):
        path = _table_dir(storage_root, target.name)
        writer = df.write.mode("overwrite")
        if target.partition_cols:
            writer = writer.partitionBy(*target.partition_cols)
        writer.parquet(path)
        spark.read.parquet(path).createOrReplaceTempView(target.name)
        return
    if isinstance(target, StreamingTable):
        base = _table_dir(storage_root, target.name)
        flow_dir = os.path.join(base, f"flow_{flow.name}")
        if df.isStreaming:
            q = (
                df.writeStream.format("parquet")
                .option("path", flow_dir)
                .option(
                    "checkpointLocation",
                    os.path.join(storage_root, "checkpoints", target.name, flow.name),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        else:
            # one-shot batch flow into a streaming table (SDP allows
            # backfill-style batch appends)
            df.write.mode("overwrite").parquet(flow_dir)
        flow_dirs = [
            os.path.join(base, d)
            for d in sorted(os.listdir(base))
            if d.startswith("flow_")
        ]
        view = spark.read.parquet(*flow_dirs)
        if target.schema is not None:
            view = view.to(
                spark.createDataFrame([], target.schema).schema
                if isinstance(target.schema, str)
                else target.schema
            )
        view.createOrReplaceTempView(target.name)
        return
    raise TypeError(f"unsupported output type: {type(target).__name__}")


def _write_external(
    df: DataFrame, sink: Sink, flow: Flow, storage_root: str
) -> None:
    if df.isStreaming:
        q = (
            df.writeStream.format(sink.format)
            .options(**sink.options)
            .option(
                "checkpointLocation",
                os.path.join(storage_root, "checkpoints", sink.name, flow.name),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    else:
        df.write.format(sink.format).options(**sink.options).mode("append").save()
