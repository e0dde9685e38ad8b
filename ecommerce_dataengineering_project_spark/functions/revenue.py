"""Revenue arithmetic (SURVEY §2b P7/P8).

The reference computes purchase revenue with TWO deliberately different
formulas that must stay distinct (they disagree on supplement handling
and rounding):

- gold-model formula (fct_purchases.sql:33-35):
    final_amount = price*quantity*(1-member_discount) + supplement_price
  (supplement added once, unrounded)

- producer formula (models/purchase.py:23-25):
    total_purchase = round(quantity*(price+supplement_price)
                           *(1-member_discount), 2)
  (supplement multiplied by quantity, discounted, rounded to cents)

Both are pure column expressions — whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def final_amount(
    price: str | Column = "price",
    quantity: str | Column = "quantity",
    member_discount: str | Column = "member_discount",
    supplement_price: str | Column = "supplement_price",
) -> Column:
    """Gold-model revenue (P7, fct_purchases.sql:33-35)."""
    price, quantity = F.col(price) if isinstance(price, str) else price, (
        F.col(quantity) if isinstance(quantity, str) else quantity
    )
    disc = F.col(member_discount) if isinstance(member_discount, str) else member_discount
    supp = F.col(supplement_price) if isinstance(supplement_price, str) else supplement_price
    return price * quantity * (F.lit(1.0) - disc) + supp


def total_purchase(
    price: str | Column = "price",
    quantity: str | Column = "quantity",
    member_discount: str | Column = "member_discount",
    supplement_price: str | Column = "supplement_price",
) -> Column:
    """Producer-variant revenue (P8, models/purchase.py:23-25)."""
    from ecommerce_dataengineering_project_spark.functions.scalars import round_half_up

    price = F.col(price) if isinstance(price, str) else price
    quantity = F.col(quantity) if isinstance(quantity, str) else quantity
    disc = F.col(member_discount) if isinstance(member_discount, str) else member_discount
    supp = F.col(supplement_price) if isinstance(supplement_price, str) else supplement_price
    return round_half_up(quantity * (price + supp) * (F.lit(1.0) - disc), 2)
