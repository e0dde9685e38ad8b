"""Data-quality operators — assertion-style wrappers.

Two reference behaviors formalized:

- The reference's dbt data tests (unique/not_null on fct_purchases)
  are claimed in README.md:51 but absent from the repo (SURVEY §5).
  The counting logic lives in ``operators/dq.py`` as composable
  DataFrame builders (one summary row per check, unioned into the
  oracle-checked ``dq_checks`` report query); the functions here are
  thin scalar wrappers over those builders for use as inline pipeline
  assertions and in tests. One semantics, two call shapes.
- The reference's schema enforcement silently NULLs malformed or
  drifted JSON (from_json PERMISSIVE default, streaming_consumer.py:70
  — how the add_supplement(s) drift went unnoticed). ``parse_with_
  quarantine`` keeps the raw record of every row that failed to parse
  so bad data routes to a quarantine sink instead of vanishing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ecommerce_dataengineering_project_spark.operators import dq


def _scalar(report: DataFrame) -> int:
    return report.first()["n_violations"]


def check_unique(df: DataFrame, cols: list[str]) -> int:
    """dbt `unique` test: key groups occurring more than once (0 = pass).
    Delegates to :func:`dq.check_unique` (group semantics, like dbt's
    list of duplicated values)."""
    return _scalar(dq.check_unique(df, cols))


def check_not_null(df: DataFrame, cols: list[str]) -> dict[str, int]:
    """dbt `not_null` test: null count per column (all 0 = pass)."""
    return {c: _scalar(dq.check_not_null(df, c)) for c in cols}


def check_accepted_values(df: DataFrame, col: str, values: list) -> int:
    """dbt `accepted_values` test: rows outside the allowed set
    (NULL counts as a violation, matching :func:`dq.check_accepted_values`)."""
    return _scalar(dq.check_accepted_values(df, col, values))


def check_relationship(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> int:
    """dbt `relationships` test: orphaned foreign keys (anti-join count).
    NULL FKs are ignored per dbt semantics — pair with check_not_null
    to forbid them (see :func:`dq.check_referential`)."""
    return _scalar(dq.check_referential(child, child_key, parent, parent_key))


def parse_with_quarantine(
    kafka_shaped: DataFrame,
    schema: StructType,
    aliases: dict[str, list[str]] | None = None,
    value_col: str = "value",
    options: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Drift-tolerant parse that SPLITS good rows from bad instead of
    silently nulling (the reference's failure mode).

    Returns (parsed_good, quarantine): a row lands in quarantine, raw
    payload intact, when from_json could not produce ANY of the
    schema's fields. Both outputs are narrow projections of one pass —
    on a stream, write the quarantine side via foreachBatch to a
    dead-letter sink.

    Sibling: ``streaming/bronze_silver.parse_quarantine`` flags rows
    via the parser's own corrupt-record capture (PERMISSIVE +
    columnNameOfCorruptRecord) in ONE output leg. The parser-level
    variant distinguishes malformed JSON from valid-but-foreign JSON
    (only the former is corrupt); this all-fields-null variant
    quarantines both, and additionally resolves drift aliases. Pick by
    which contract the sink wants.
    """
    from ecommerce_dataengineering_project_spark.streaming.bronze_silver import _widen_schema

    out = kafka_shaped.withColumn("__raw", F.col(value_col).cast("string"))
    aliases = aliases or {}
    all_null = None
    widened = _widen_schema(schema, aliases)
    data = F.from_json(F.col("__raw"), widened, options or {})
    cols = []
    for f in schema.fields:
        group = aliases.get(f.name, [f.name])
        # _widen_schema REPLACED the canonical name with the alias
        # names, so a single-alias group must read group[0] (a pure
        # rename) — data.getField(f.name) would reference a field the
        # widened struct does not have
        src = (
            F.coalesce(*[data.getField(g) for g in group])
            if len(group) > 1
            else data.getField(group[0])
        )
        cols.append(src.alias(f.name))
        all_null = src.isNull() if all_null is None else (all_null & src.isNull())
    enriched = out.select(F.col("__raw"), *cols).withColumn("__bad", all_null)
    good = enriched.where(~F.col("__bad")).drop("__raw", "__bad")
    quarantine = enriched.where(F.col("__bad")).select(F.col("__raw").alias("raw_record"))
    return good, quarantine
