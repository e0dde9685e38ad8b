"""Data-quality report query (the dbt schema-test layer).

The reference runs its gold model through dbt (`pipeline/dbt/
ecommerce_analytics/models/gold/fct_purchases.sql:1`); this registers
the standard dbt test pack (not_null / unique / accepted_values /
relationships) as one oracle-checked report over the fixture warehouse.
The fixture data makes two checks fire on purpose (duplicate lineitem
order keys; event types outside the funnel set), so the oracle verifies
real violation COUNTS, not just a column of zeros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ecommerce_dataengineering_project_spark.operators.dq import (
    check_accepted_values,
    check_not_null,
    check_referential,
    check_unique,
    dq_suite,
)
from ecommerce_dataengineering_project_spark.sources.readers import load_table

FUNNEL_EVENT_TYPES = ["view", "click", "purchase"]
ORDER_STATUSES = ["O", "F", "P"]


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven-check warehouse quality report: one summary row per check.

    Exercises all four check kinds; each is a scalar aggregate (see
    operators/dq.py for the per-check scale shape), so the report costs
    a handful of scans and one key-shuffle regardless of warehouse
    size."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return dq_suite(
        [
            check_not_null(orders, "o_custkey"),
            check_unique(orders, ["o_orderkey"]),
            check_unique(lineitem, ["l_orderkey"]),  # fires: multi-line orders
            check_accepted_values(orders, "o_orderstatus", ORDER_STATUSES),
            check_accepted_values(events, "event_type", FUNNEL_EVENT_TYPES),
            check_referential(orders, "o_custkey", customer, "c_custkey"),
            check_referential(lineitem, "l_orderkey", orders, "o_orderkey"),
        ]
    )


QUERIES = {
    "dq_checks": q_dq_checks,
}

_FUNNEL_SQL = ", ".join(f"'{v}'" for v in FUNNEL_EVENT_TYPES)
_STATUS_SQL = ", ".join(f"'{v}'" for v in ORDER_STATUSES)

ORACLES = {
    "dq_checks": f"""
        SELECT 'not_null:o_custkey' AS check_name,
               CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'unique:o_orderkey',
               CAST(COUNT(*) AS BIGINT)
        FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'unique:l_orderkey',
               CAST(COUNT(*) AS BIGINT)
        FROM (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) > 1)
        UNION ALL
        SELECT 'accepted_values:o_orderstatus',
               CAST(COALESCE(SUM(CASE WHEN o_orderstatus IN ({_STATUS_SQL})
                                      THEN 0 ELSE 1 END), 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'accepted_values:event_type',
               CAST(COALESCE(SUM(CASE WHEN event_type IN ({_FUNNEL_SQL})
                                      THEN 0 ELSE 1 END), 0) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'referential:o_custkey->c_custkey',
               CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'referential:l_orderkey->o_orderkey',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)
    """,
}


_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (the stats an optimizer or a
    data catalog collects): per-column null count + exact NDV for every
    orders column, in ONE scan — the multi-count-distinct aggregate
    plans as a single pass (Spark's expand strategy), never one scan
    per column; the stack() unpivot is map-only on the 1-row result."""
    from ecommerce_dataengineering_project_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"n_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"d_{c}"))
    one = orders.agg(*aggs)
    stack = ", ".join(f"'{c}', n_{c}, d_{c}" for c in _PROFILE_COLS)
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) "
            "AS (col_name, n_nulls, n_distinct)"
        )
    )


QUERIES["table_profile"] = q_table_profile

ORACLES["table_profile"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders"""
    for c in _PROFILE_COLS
)
