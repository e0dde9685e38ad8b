"""Scalar expression surface (SURVEY §2b, §2h)."""

from ecommerce_dataengineering_project_spark.functions.revenue import (
    final_amount,
    total_purchase,
)
from ecommerce_dataengineering_project_spark.functions.scalars import (
    bool_from_string,
    conditional_price,
    stable_id,
    starts_with_any,
)

__all__ = [
    "final_amount",
    "total_purchase",
    "bool_from_string",
    "conditional_price",
    "stable_id",
    "starts_with_any",
]
