"""Window functions (SURVEY §2f; A4's running balance; dashboard top-k).

All built on ``pyspark.sql.Window`` — one shuffle on the partition key,
sort within partitions, no driver involvement. At 100 TB the only scale
hazard is a skewed partition key; these helpers take explicit partition
columns so callers can salt or pre-aggregate when a key is hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` (dashboard rankings,
    README.md:80). ``order_by`` must be a total order (include a unique
    tiebreaker) for deterministic output.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def running_sum(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    value: str | Column,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative per-key sum (A4's running inventory balance,
    producer.py:157-181, expressed relationally)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value) if isinstance(value, str) else value
    return df.withColumn(out_col, F.sum(v).over(w))


def with_lag_lead(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    value: str,
    lag_col: str = "prev_value",
    lead_col: str = "next_value",
) -> DataFrame:
    """Analytic lag/lead over a per-key ordered frame (§2f)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(lag_col, F.lag(value).over(w)).withColumn(
        lead_col, F.lead(value).over(w)
    )
