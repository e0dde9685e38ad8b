"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``ecommerce_dataengineering_project_spark/``; this module just
adapts it to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ecommerce_dataengineering_project_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: daily revenue + txn
    count (the reference's one real analytical query, SURVEY §3 E3b)."""
    from ecommerce_dataengineering_project_spark.queries.core import q_daily_sales

    return q_daily_sales(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = registry()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omissions = rows-only)."""
    _, o = registry()
    return o
