"""parse_quarantine contracts (streaming/bronze_silver.py): the
PERMISSIVE + corrupt-record bad-data path of the bronze->silver hop.
The registered query's oracle parity (DuckDB independently parsing the
clean rows) is covered by the registry sweep; these pin the per-row
semantics on hand-built payloads."""

from __future__ import annotations

from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ecommerce_dataengineering_project_spark.streaming.bronze_silver import parse_quarantine

SCHEMA = StructType(
    [StructField("k", IntegerType()), StructField("s", StringType())]
)


def _parse(spark, payloads):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, value string"
    )
    return {r.id: r for r in parse_quarantine(df, SCHEMA).collect()}


def test_clean_rows_parse_and_pass(spark):
    rows = _parse(spark, ['{"k": 1, "s": "a"}'])
    r = rows[0]
    assert (r.k, r.s, r.quarantined, r.corrupt_payload) == (1, "a", False, None)


def test_malformed_json_is_quarantined_with_original_bytes(spark):
    bad = 'not json at all'
    r = _parse(spark, [bad])[0]
    assert r.quarantined and r.corrupt_payload == bad and r.k is None


def test_truncated_json_is_quarantined(spark):
    bad = '{"k": 1, "s": '
    r = _parse(spark, [bad])[0]
    assert r.quarantined and r.corrupt_payload == bad


def test_null_payload_passes_with_null_fields(spark):
    # NULL input is "no message", not a malformed one: from_json yields
    # a NULL struct, so nothing is quarantined and all fields are NULL
    r = _parse(spark, [None])[0]
    assert (r.k, r.s, r.quarantined, r.corrupt_payload) == (
        None,
        None,
        False,
        None,
    )


def test_missing_field_is_not_corrupt(spark):
    # schema-subset payloads are fine (nullable columns), not bad records
    r = _parse(spark, ['{"k": 5}'])[0]
    assert (r.k, r.s, r.quarantined) == (5, None, False)


def test_split_streams_are_disjoint_and_total(spark):
    payloads = ['{"k": 1, "s": "x"}', "oops", None, '{"k": 2, "s": "y"}', "{"]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "id long, value string"
    )
    out = parse_quarantine(df, SCHEMA)
    n_clean = out.where(~out.quarantined).count()
    n_bad = out.where(out.quarantined).count()
    assert (n_clean, n_bad) == (3, 2)  # every row lands in exactly one leg


def test_single_alias_pure_rename_parses(spark):
    """aliases={'canonical': ['renamed']} (a pure rename, canonical
    absent from the alias list) must read the renamed field — the
    widened struct REPLACES the canonical name."""
    from pyspark.sql.types import LongType, StructField, StructType

    from ecommerce_dataengineering_project_spark.operators.quality import (
        parse_with_quarantine,
    )
    from ecommerce_dataengineering_project_spark.streaming.bronze_silver import (
        parse_with_drift,
    )

    schema = StructType([StructField("supplement", LongType())])
    df = spark.createDataFrame([('{"supplements": 7}',)], "value STRING")
    good, quar = parse_with_quarantine(
        df, schema, aliases={"supplement": ["supplements"]}
    )
    assert [r.supplement for r in good.collect()] == [7]
    assert quar.count() == 0
    drift = parse_with_drift(df, schema, aliases={"supplement": ["supplements"]})
    assert [r.supplement for r in drift.collect()] == [7]
