"""stream_stream_full_outer contracts: the FULL OUTER interval join's
outer rows on BOTH sides, and the flush-row hygiene the arm depends on.
Exact oracle parity is in the registry sweep; these pin the shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.queries.streaming_queries import (
    q_stream_stream_full_outer,
    q_stream_stream_join,
)


def test_full_outer_is_inner_plus_both_outer_sides(spark, sf_dir):
    full = q_stream_stream_full_outer(spark, sf_dir).cache()
    inner = q_stream_stream_join(spark, sf_dir)

    n_inner = inner.count()
    n_unmatched_purchase = full.where(F.col("click_id").isNull()).count()
    n_unmatched_click = full.where(F.col("purchase_id").isNull()).count()

    # the matrix identity: full = inner + purchase-side NULLs + click-
    # side NULLs, with both outer populations non-empty on the fixture
    assert full.count() == n_inner + n_unmatched_purchase + n_unmatched_click
    assert n_unmatched_purchase > 0
    assert n_unmatched_click > 0

    # matched rows agree with the inner join exactly
    matched = full.where(
        F.col("click_id").isNotNull() & F.col("purchase_id").isNotNull()
    )
    assert matched.exceptAll(inner).count() == 0
    assert inner.exceptAll(matched).count() == 0
    full.unpersist()


def test_no_flush_rows_leak(spark, sf_dir):
    # flush rows ride the click branch with negative ids / user -1;
    # the post-join filter must keep them out of the sink entirely
    full = q_stream_stream_full_outer(spark, sf_dir)
    leaked = full.where(
        (F.col("user_id") < 0)
        | (F.col("click_id") < 0)
        | (F.col("purchase_id") < 0)
    )
    assert leaked.count() == 0
