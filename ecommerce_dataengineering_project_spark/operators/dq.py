"""Data-quality check suite (the dbt-test layer of the reference).

The reference's gold models are dbt models (`pipeline/dbt/
ecommerce_analytics/models/gold/fct_purchases.sql:1`); dbt's standard
schema-test pack (not_null / unique / accepted_values / relationships)
is the quality gate such a project runs on every build.  This module
implements those four checks as composable DataFrame builders, each
returning ONE summary row ``(check_name, n_violations)``, plus
``dq_suite`` to union a batch of them into a single report relation.
``operators/quality.py`` wraps these same builders as scalar-returning
assertion helpers — the counting logic lives only here.

Scale shape (each check, at 100 TB):

- ``check_not_null`` / ``check_accepted_values``: a conditional SUM —
  map-side partial aggregation into a single-row combine.  No data
  shuffle; the scan's pushed filters and column pruning still apply
  (only the checked columns are read).
- ``check_unique``: one exchange on the key columns (the same shuffle
  any dedup does), then a map-side count of over-counted groups.
- ``check_referential``: a LEFT ANTI join child←parent on the key.
  The join strategy is left to AQE: a dimension-sized parent broadcasts,
  a fact-sized parent shuffles on the key — exactly the right call in
  each regime, so the operator does not force either.

The report is a handful of single-row relations unioned together —
driver-sized by construction, never proportional to input rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _report(df: DataFrame, name: str, violations) -> DataFrame:
    """Collapse to the one-row (check_name, n_violations) shape.

    ``coalesce(..., 0)``: a conditional SUM over zero rows is NULL —
    an empty table passes every check with 0 violations, it does not
    emit a NULL count."""
    return df.agg(
        F.lit(name).alias("check_name"),
        F.coalesce(violations.cast("bigint"), F.lit(0).cast("bigint")).alias(
            "n_violations"
        ),
    )


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """dbt ``not_null``: count rows where ``col`` IS NULL."""
    return _report(
        df,
        name or f"not_null:{col}",
        F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def check_accepted_values(
    df: DataFrame, col: str, values: list[str], name: str | None = None
) -> DataFrame:
    """dbt ``accepted_values``: count rows whose ``col`` is outside the
    allowed set (NULL counts as a violation — it is not an accepted
    value, matching dbt's semantics where not_null is a separate test
    only for columns declared nullable-never)."""
    cond = F.col(col).isin(values)
    return _report(
        df,
        name or f"accepted_values:{col}",
        F.sum(F.when(cond, 0).otherwise(1)),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """dbt ``unique``: count key groups that occur more than once.

    Counting GROUPS (not excess rows) matches dbt, whose unique test
    returns the list of duplicated values."""
    dup_groups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
    )
    return _report(
        dup_groups, name or "unique:" + ",".join(cols), F.count(F.lit(1))
    )


def check_referential(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """dbt ``relationships``: count child rows whose FK value has no
    matching parent key.  NULL FKs are skipped (dbt semantics: the
    relationship test ignores NULLs; pair with not_null to forbid
    them)."""
    orphans = child.where(F.col(child_col).isNotNull()).join(
        parent.select(F.col(parent_col).alias(child_col)).distinct(),
        on=child_col,
        how="left_anti",
    )
    return _report(
        orphans,
        name or f"referential:{child_col}->{parent_col}",
        F.count(F.lit(1)),
    )


def dq_suite(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check reports into one relation.

    Each input is already a single-row aggregate; the union is a
    driver-trivial plan regardless of input table sizes."""
    assert checks, "dq_suite needs at least one check"
    return reduce(DataFrame.unionByName, checks)
