"""Kafka source/sink builders (SURVEY §2a S1/K1) — option-for-option
parity with the reference's streaming consumer, constructed lazily.

The reference subscribes with earliest offsets, failOnDataLoss=false,
and SASL_SSL auth (streaming_consumer.py:55-66) and produces JSON
bytes per record (producer.py:187-193). This container has no Kafka
broker or connector jar, so these builders return the CONFIGURED
reader/writer without calling load()/start(); the bounded file-stream
harness stands in for execution everywhere else in the engine. On a
real cluster: `kafka_stream_reader(...).load()` is the drop-in S1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SOURCE_OPTIONS = {
    # streaming_consumer.py:59-60 — replay from the beginning, keep
    # running if the broker expired old offsets.
    "startingOffsets": "earliest",
    "failOnDataLoss": "false",
}


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    sasl_jaas: str | None = None,
    extra_options: dict[str, str] | None = None,
):
    """S1: a configured (un-loaded) Kafka stream reader."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for k, v in DEFAULT_SOURCE_OPTIONS.items():
        reader = reader.option(k, v)
    if sasl_jaas:  # streaming_consumer.py:61-66's SASL_SSL block
        reader = (
            reader.option("kafka.security.protocol", "SASL_SSL")
            .option("kafka.sasl.mechanism", "PLAIN")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    for k, v in (extra_options or {}).items():
        reader = reader.option(k, v)
    return reader


def kafka_batch_writer(
    kafka_shaped: DataFrame,
    bootstrap_servers: str,
    topic: str,
):
    """K1: a configured (un-started) writer for a DataFrame already in
    Kafka shape (a ``value`` column; see bronze_silver.to_kafka_shape
    for the producer.py:187-193 serialization)."""
    return (
        kafka_shaped.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
