"""Network streaming ingest (streaming/socket_ingest.py): a real TCP
hop through Spark's built-in socket source, parsed with the same
drift-tolerant path the Kafka value column takes."""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ecommerce_dataengineering_project_spark.streaming.harness import TMP_ROOT
from ecommerce_dataengineering_project_spark.streaming.socket_ingest import (
    LineServer,
    run_socket_ingest,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("qty", IntegerType()),
        StructField("kind", StringType()),
    ]
)


def _lines(n: int) -> list[str]:
    return [
        json.dumps(
            {
                "event_id": i,
                "user_id": i % 17,
                "qty": i % 3 + 1,
                "kind": "purchase" if i % 5 == 0 else "view",
            }
        )
        for i in range(n)
    ]


def test_socket_ingest_round_trips_every_row(spark):
    n = 250
    server = LineServer(_lines(n))
    base = os.path.join(TMP_ROOT, "streams", "socket_ingest")
    try:
        df = run_socket_ingest(
            spark,
            server,
            SCHEMA,
            sink_dir=os.path.join(base, "sink"),
            ckpt_dir=os.path.join(base, "ckpt"),
            expected_rows=n,
        )
        rows = {r.event_id: r for r in df.collect()}
        assert len(rows) == n
        # typed fidelity across the wire, not just counts
        assert rows[0].kind == "purchase" and rows[1].kind == "view"
        assert rows[16].user_id == 16 and rows[17].user_id == 0
        assert rows[5].qty == 3
    finally:
        server.close()


def test_socket_ingest_applies_drift_aliases(spark):
    """Half the producers emit `qty`, half the drifted `quantity` —
    the SAME alias mechanism the bronze->silver Kafka parse uses must
    reconcile them on the socket arm too."""
    lines = [
        json.dumps({"event_id": 1, "user_id": 7, "qty": 2, "kind": "view"}),
        json.dumps({"event_id": 2, "user_id": 8, "quantity": 3, "kind": "cart"}),
    ]
    server = LineServer(lines)
    base = os.path.join(TMP_ROOT, "streams", "socket_drift")
    try:
        df = run_socket_ingest(
            spark,
            server,
            SCHEMA,
            sink_dir=os.path.join(base, "sink"),
            ckpt_dir=os.path.join(base, "ckpt"),
            expected_rows=2,
            aliases={"qty": ["qty", "quantity"]},
        )
        got = {r.event_id: r.qty for r in df.collect()}
        assert got == {1: 2, 2: 3}
    finally:
        server.close()
