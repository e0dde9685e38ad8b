"""Filter-pushdown contracts for the Python DataSource reader
(sources/pyds.py EcommerceEventsReader.pushFilters, Spark 4.1).

Oracle parity of the pruned scan is in test_oracle_parity
(generator_pushdown_scan); these pin the pushdown mechanics: range
filters consumed (not re-planned as partitions), out-of-range shards
never scheduled, unsupported filters returned for Spark to evaluate,
and value-correctness at shard boundaries.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThan,
    StringStartsWith,
)

from ecommerce_dataengineering_project_spark.sources import pyds


def _reader(rows=10_000, parts=8):
    return pyds.EcommerceEventsReader({"rows": str(rows), "partitions": str(parts)})


def test_range_filters_prune_partitions():
    r = _reader()
    leftover = list(
        r.pushFilters(
            [GreaterThanOrEqual(("event_id",), 2500), LessThan(("event_id",), 3750)]
        )
    )
    assert leftover == []  # both consumed
    assert (r.lo, r.hi) == (2500, 3750)
    parts = r.partitions()
    assert len(parts) == 1  # only shard [2500, 3750) survives of 8


def test_unsupported_filters_are_returned():
    r = _reader()
    unsupported = StringStartsWith(("event_type",), "cl")
    other_col = EqualTo(("user_id",), 7)
    leftover = list(
        r.pushFilters([unsupported, other_col, LessThan(("event_id",), 100)])
    )
    assert unsupported in leftover and other_col in leftover
    assert len(leftover) == 2
    assert r.hi == 100


def test_point_lookup_plans_one_partition_one_row():
    r = _reader()
    assert list(r.pushFilters([EqualTo(("event_id",), 4242)])) == []
    parts = r.partitions()
    assert len(parts) == 1
    [batch] = list(r.read(parts[0]))
    assert batch.num_rows == 1
    assert batch.column(0).to_pylist() == [4242]


def test_end_to_end_rows_match_unpruned_scan(spark):
    pyds.register(spark)
    base = (
        spark.read.format("ecommerce_events")
        .option("rows", 5000)
        .option("partitions", 4)
        .load()
    )
    pruned = base.where((F.col("event_id") >= 1200) & (F.col("event_id") < 1300))
    got = sorted(r.event_id for r in pruned.collect())
    assert got == list(range(1200, 1300))
    # aggregates equal the post-filter of a full collect
    full = {r.event_id: r.amount_cents for r in base.collect()}
    assert all(r.amount_cents == full[r.event_id] for r in pruned.collect())
