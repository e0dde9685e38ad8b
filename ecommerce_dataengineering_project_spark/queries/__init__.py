"""Query registry — every SURVEY §2 operator gets a named query here.

Each module exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, sql]`` (DuckDB-runnable ANSI SQL over the same
fixture tables). ``__spark_entry__.py`` merges them for the driver.

Naming contract: every computed column is aliased identically in the
Spark code and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from ecommerce_dataengineering_project_spark.queries import (
        core,
        ext_dedup,
        ext_multimodal,
        ext_similarity,
        ext_stats,
        ext_text,
        ml_queries,
        streaming_queries,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (
        core,
        ext_dedup,
        ext_multimodal,
        ext_similarity,
        ext_stats,
        ext_text,
        ml_queries,
        streaming_queries,
    ):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles
