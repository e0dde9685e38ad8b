"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
the reference's event *producer* (pipeline/generator/producer.py —
random purchase events pushed to Kafka at ~2/s) re-expressed as a
first-class, partition-parallel engine source.

Two deliberate design points:

1. **Deterministic generation.** Every field derives from the event id
   through overflow-free integer-hash arithmetic (the seeded-centroid
   trick from operators/similarity.py: reduce mod M *before*
   multiplying), so the source is reproducible row-for-row by ANY
   engine evaluating the same arithmetic — which is what lets a
   generated table be oracle-checked against DuckDB's ``RANGE()``.
   The reference's producer uses ``random.random()``; determinism is
   the engine-grade upgrade (replayable backfills, diffable tests).

2. **Arrow batches, not Python rows.** ``read()`` yields one pyarrow
   RecordBatch per partition computed vectorized in numpy — the Python
   DataSource API's fast path. Still Python-mediated, so this source
   is for generation/testing scale (millions of rows), not a 100 TB
   scan path; real ingest stays on the native parquet/Kafka sources.

Partition split is the standard ``[i*n/P, (i+1)*n/P)`` range shard —
P independent tasks, no coordination, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

HASH_MOD = 999983
HASH_MULT = 1000003
EVENT_TYPES = ("view", "click", "cart", "purchase", "refund")
USER_MOD = 1000
CENTS_MOD = 100_000


class EcommerceEventsDataSource(DataSource):
    """``spark.read.format("ecommerce_events").option("rows", n)``."""

    @classmethod
    def name(cls) -> str:
        return "ecommerce_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, "
            "amount_cents bigint"
        )

    def reader(self, schema) -> "EcommerceEventsReader":
        return EcommerceEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "EcommerceEventsStreamReader":
        return EcommerceEventsStreamReader(self.options)


class EcommerceEventsReader(DataSourceReader):
    """Batch reader with FILTER PUSHDOWN (Spark 4.1 ``pushFilters``):
    range/point predicates on ``event_id`` — the source's physical
    order — narrow the generated id interval BEFORE partition planning,
    so out-of-range partitions are never scheduled (the Python-API
    analog of parquet row-group pruning; pinned in
    tests/test_pyds_pushdown.py). Every accepted filter is also still
    applied by the generated range itself, so results are identical
    whether or not Catalyst re-checks them; unsupported filters are
    returned for Spark to evaluate post-scan."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.parts = int(options.get("partitions", 4))
        # pushed-down bounds on event_id: [lo, hi)
        self.lo = 0
        self.hi = self.rows
        self.pushed: list = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            val = getattr(f, "value", None)
            if attr == ("event_id",) and isinstance(val, int):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, val)
                    self.hi = min(self.hi, val + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, val + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, val)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, val)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, val + 1)
                else:
                    yield f
                    continue
                self.pushed.append(f)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        # plan over the FULL id space, keep only shards intersecting
        # the pushed range — pruned shards never become tasks
        out = []
        for i in range(self.parts):
            lo = i * self.rows // self.parts
            hi = (i + 1) * self.rows // self.parts
            if hi > self.lo and lo < self.hi:
                out.append(InputPartition(i))
        return out or [InputPartition(0)]

    def read(self, partition):
        import numpy as np
        import pyarrow as pa

        i = partition.value
        lo = max(i * self.rows // self.parts, self.lo)
        hi = min((i + 1) * self.rows // self.parts, self.hi)
        if hi < lo:
            hi = lo
        ids = np.arange(lo, hi, dtype=np.int64)
        h = ((ids % HASH_MOD) * HASH_MULT) % HASH_MOD
        types = np.array(EVENT_TYPES, dtype=object)[(h // USER_MOD) % len(EVENT_TYPES)]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(h % USER_MOD, pa.int64()),
                pa.array(types, pa.string()),
                pa.array(h % CENTS_MOD, pa.int64()),
            ],
            names=["event_id", "user_id", "event_type", "amount_cents"],
        )


def _register_datasource(spark, cls) -> None:
    """Idempotent, session-correct registration of any Python
    DataSource class (shared by pyds / pyds_txlog / pyds_sink).

    Spark 4.1 quirk (classic sessions): the public
    ``spark.dataSource.register`` duplicate check fires JVM-wide, but
    format *resolution* consults the session-local DataSourceManager —
    so in a ``newSession()`` whose parent already registered, the
    public path raises DATA_SOURCE_ALREADY_EXISTS while reads still
    fail with DATA_SOURCE_NOT_FOUND. Handle both sides: no-op when the
    session's own manager has the source, and on the
    ALREADY_EXISTS/NOT_FOUND split register directly into the
    session's manager (same ``UserDefinedPythonDataSource`` wrapping
    the public path uses)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    # a reader that implements pushFilters() REFUSES to initialize while
    # spark.sql.python.filterPushdown.enabled is false (default) — flip
    # it here, the one choke point every consumer of these sources goes
    # through, so the capability works on any session incl. the
    # driver's vanilla one
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # pre-4.1 sessions have no such conf (and no pushFilters)

    name = cls.name()
    try:
        manager = spark._jsparkSession.sessionState().dataSourceManager()
        if manager.dataSourceExists(name):
            return
    except Exception:
        manager = None  # non-classic session: fall through to public path
    def _register_into_manager(mgr) -> None:
        from pyspark.sql.udf import _wrap_function

        sc = spark.sparkContext
        wrapped = _wrap_function(sc, cls)
        uds = getattr(
            sc._jvm,
            "org.apache.spark.sql.execution.datasources.v2.python."
            "UserDefinedPythonDataSource",
        )(wrapped)
        mgr.registerDataSource(name, uds)

    try:
        spark.dataSource.register(cls)
    except AnalysisException as e:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e) or manager is None:
            raise
        _register_into_manager(manager)
    # The public path's registration is NOT always visible to this
    # session's resolver: on a fresh ``newSession()`` whose parent
    # never registered, ``spark.dataSource.register`` succeeds without
    # error yet the child session's DataSourceManager still lacks the
    # source and reads/writes fail with DATA_SOURCE_NOT_FOUND (the
    # mirror image of the ALREADY_EXISTS quirk above — registration
    # and resolution consult different managers). Verify, and register
    # directly into this session's manager when the public path did
    # not land.
    if manager is not None and not manager.dataSourceExists(name):
        _register_into_manager(manager)
    # And the converse hole: DataFrameWriter.save's format lookup goes
    # through the JVM-ACTIVE session's manager, not the calling
    # session's — a child session that registered only locally still
    # fails its WRITE with DATA_SOURCE_NOT_FOUND while reads work.
    # Make the registration visible to the default/active sessions'
    # managers too (same UserDefinedPythonDataSource instance; direct
    # manager puts are idempotent).
    if manager is not None:
        try:
            jvm_ss = spark.sparkContext._jvm.org.apache.spark.sql.SparkSession
            for opt in (jvm_ss.getDefaultSession(), jvm_ss.getActiveSession()):
                if opt.isDefined():
                    other = opt.get().sessionState().dataSourceManager()
                    if not other.dataSourceExists(name):
                        _register_into_manager(other)
        except Exception:
            pass  # non-classic JVM surface: session-local registration stands


def register(spark) -> None:
    _register_datasource(spark, EcommerceEventsDataSource)


class EcommerceEventsStreamReader(SimpleDataSourceStreamReader):
    """Bounded deterministic event stream: offsets are plain row
    positions, each micro-batch advances by ``batchRows`` until
    ``maxRows`` — a replayable, exactly-once Kafka stand-in (the
    ``readBetweenOffsets`` replay path re-derives the identical rows
    from the offset range, which is what checkpoint recovery calls).
    """

    def __init__(self, options):
        self.batch_rows = int(options.get("batchRows", 1000))
        self.max_rows = int(options.get("maxRows", 5000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        if pos >= self.max_rows:
            return iter([]), start
        end = min(pos + self.batch_rows, self.max_rows)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return self._rows(int(start["pos"]), int(end["pos"]))

    def _rows(self, lo: int, hi: int):
        # a LIST iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the iterator for replay, and generators aren't
        # copyable (TypeError: cannot pickle 'generator' object)
        out = []
        for i in range(lo, hi):
            h = ((i % HASH_MOD) * HASH_MULT) % HASH_MOD
            out.append(
                (
                    i,
                    h % USER_MOD,
                    EVENT_TYPES[(h // USER_MOD) % len(EVENT_TYPES)],
                    h % CENTS_MOD,
                )
            )
        return iter(out)
