#!/usr/bin/env python
"""Environment probe: can the Kafka source (SURVEY S1/K1) execute here?

Three facts, each printed with its evidence:
  1. Is the spark-sql-kafka connector jar on the classpath?
  2. Does `readStream.format("kafka")...load()` resolve the source?
  3. Is anything listening on a local broker port?

Run: python tools/probe_kafka.py  (writes nothing; findings are
committed in KAFKA_PROBE.md)
"""

from __future__ import annotations

import glob
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    kafka_jars = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(jars_dir, "*kafka*"))
    )
    print(f"jars dir: {jars_dir}")
    print(f"kafka jars: {kafka_jars or 'NONE'}")
    print(f"total jars: {len(glob.glob(os.path.join(jars_dir, '*.jar')))}")

    for port in (9092, 9093):
        s = socket.socket()
        s.settimeout(0.5)
        try:
            s.connect(("127.0.0.1", port))
            print(f"port {port}: LISTENING (unexpected)")
        except OSError as exc:
            print(f"port {port}: no broker ({exc})")
        finally:
            s.close()

    from ecommerce_dataengineering_project_spark import get_spark
    from ecommerce_dataengineering_project_spark.streaming.kafka_io import (
        kafka_stream_reader,
    )

    spark = get_spark(app_name="kafka-probe")
    reader = kafka_stream_reader(spark, "localhost:9092", "events")
    try:
        reader.load()
        print("load(): resolved (unexpected in this container)")
    except Exception as exc:
        print(f"load(): {type(exc).__name__}: {str(exc)[:200]}")
    spark.stop()


if __name__ == "__main__":
    main()
