"""Custom Python DataSource SINK (Spark 4 ``pyspark.sql.datasource``):
the write half of X19 (the read half lives in ``sources/pyds.py`` /
``sources/pyds_txlog.py``).

The reference's sinks are connector-provided (Delta append,
`pipeline/spark/streaming_consumer.py:83-90`; CSV/console). This module
implements the engine-native answer for a sink Spark does NOT ship: a
manifest-committed JSONL table with the same two-phase commit contract
the txlog uses, via the public DataSourceWriter API —

- each TASK stages a uniquely-named part file (uuid names, so a retried
  or speculative task attempt can never collide with, or resurrect,
  another attempt's output) and returns the name as its commit message;
- COMMIT (driver, runs once, only if every task succeeded) publishes
  exactly the staged files named in the commit messages into an atomic
  manifest (tmp + ``os.replace``), so readers flip from the old file
  list to the new one in one filesystem operation;
- ABORT deletes whatever the failed job staged — a half-written job is
  invisible because reads go THROUGH the manifest, never the directory
  listing.

The streaming twin (``DataSourceStreamWriter``) adds per-micro-batch
epochs: commit(messages, batchId) publishes under the batch id and is
IDEMPOTENT — a replayed batch (checkpoint recovery re-runs the last
epoch) sees its id already published and re-publishes the same file
set, giving exactly-once table contents on top of at-least-once task
execution.

Scale: tasks write independently (no driver funnel); the driver-side
commit handles only filenames (bytes never move through the driver).
That is the same division of labor as Spark's FileFormatWriter +
FileCommitProtocol — re-expressed through the public Python API.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


@dataclass
class FileCommit(WriterCommitMessage):
    filename: str
    rows: int


def _stage_rows(path: str, iterator: Iterator[Row]) -> FileCommit:
    """Task-side: write one uniquely-named staged JSONL part file."""
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    tmp = os.path.join(staging, name)
    with open(tmp, "w", encoding="utf-8") as f:
        for row in iterator:
            # recursive: struct columns arrive as nested Row objects —
            # the non-recursive form would json-serialize them through
            # default=str as "Row(a=1, ...)" and the schema-declared
            # read-back would null them out (silent corruption)
            f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
            n += 1
    return FileCommit(filename=name, rows=n)


def _read_manifest(path: str) -> dict:
    mpath = os.path.join(path, MANIFEST)
    if not os.path.exists(mpath):
        return {"files": [], "rows": 0, "epochs": {}}
    with open(mpath, encoding="utf-8") as f:
        return json.load(f)


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = os.path.join(path, f"{MANIFEST}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, MANIFEST))


def _publish(path: str, messages: List[Optional[WriterCommitMessage]]) -> list[str]:
    """Driver-side: move staged task files into the table dir; return
    the published basenames (order-stable for the manifest)."""
    staging = os.path.join(path, "_staging")
    published = []
    for msg in messages:
        if msg is None:
            continue
        src = os.path.join(staging, msg.filename)
        os.replace(src, os.path.join(path, msg.filename))
        published.append(msg.filename)
    return published


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ecommerce_jsonl_sink requires option 'path'")
        self.overwrite = bool(overwrite)

    def write(self, iterator: Iterator[Row]) -> FileCommit:
        return _stage_rows(self.path, iterator)

    def commit(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        man = _read_manifest(self.path)
        old_files = man["files"] if self.overwrite else []
        if self.overwrite:
            man = {"files": [], "rows": 0, "epochs": {}}
        published = _publish(self.path, messages)
        man["files"].extend(published)
        man["rows"] += sum(m.rows for m in messages if m is not None)
        # Atomic publication FIRST: manifest-scoped readers flip from
        # the old file set to the new in one os.replace. Only then
        # best-effort delete the no-longer-referenced overwritten files
        # — a crash between the two leaves harmless stragglers (already
        # invisible to manifest readers), never a manifest pointing at
        # removed files.
        _write_manifest(self.path, man)
        for old in old_files:
            try:
                os.remove(os.path.join(self.path, old))
            except FileNotFoundError:
                pass

    def abort(self, messages: List[Optional[WriterCommitMessage]]) -> None:
        staging = os.path.join(self.path, "_staging")
        for msg in messages:
            if msg is None:
                continue
            try:
                os.remove(os.path.join(staging, msg.filename))
            except FileNotFoundError:
                pass


class JsonlSinkStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch epochs; commit is idempotent on batchId so a
    checkpoint-recovery replay cannot double-append."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("ecommerce_jsonl_sink requires option 'path'")

    def write(self, iterator: Iterator[Row]) -> FileCommit:
        return _stage_rows(self.path, iterator)

    def commit(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        man = _read_manifest(self.path)
        epoch = str(batchId)
        if epoch in man.get("epochs", {}):
            # replayed epoch: drop the re-staged duplicates, keep the
            # originally-published file set (exactly-once contents)
            self.abort(messages, batchId)
            return
        published = _publish(self.path, messages)
        man.setdefault("epochs", {})[epoch] = published
        man["files"].extend(published)
        man["rows"] += sum(m.rows for m in messages if m is not None)
        _write_manifest(self.path, man)

    def abort(
        self, messages: List[Optional[WriterCommitMessage]], batchId: int
    ) -> None:
        staging = os.path.join(self.path, "_staging")
        for msg in messages:
            if msg is None:
                continue
            try:
                os.remove(os.path.join(staging, msg.filename))
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ecommerce_jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlSinkStreamWriter:
        return JsonlSinkStreamWriter(self.options)


def register(spark: SparkSession) -> None:
    """Same session-correct idempotent registration as pyds.register."""
    from ecommerce_dataengineering_project_spark.sources.pyds import (
        _register_datasource,
    )

    _register_datasource(spark, JsonlSinkDataSource)


def read_jsonl_sink(spark: SparkSession, path: str, schema) -> DataFrame:
    """Manifest-scoped read: only COMMITTED part files are visible —
    stragglers, aborted jobs, and staged-but-unpublished attempts are
    not, which is the atomicity contract under test."""
    man = _read_manifest(path)
    files = [os.path.join(path, f) for f in man["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
