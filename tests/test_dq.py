"""Unit tests for the dbt-style data-quality check suite
(operators/dq.py) and the deterministic train/val/test split
(operators/sampling.hash_split).  The registered queries' oracle
parity is covered by the registry-wide sweep in test_oracle_parity.py;
these pin the operator semantics on hand-built edge cases the fixture
tables can't produce (NULL FKs, empty tables, all-dup keys).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.dq import (
    check_accepted_values,
    check_not_null,
    check_referential,
    check_unique,
    dq_suite,
)
from ecommerce_dataengineering_project_spark.operators.sampling import (
    hash_sample,
    hash_split,
)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_not_null_counts_nulls(spark):
    df = spark.createDataFrame([(1,), (None,), (None,)], "x int")
    r = _one(check_not_null(df, "x"))
    assert (r.check_name, r.n_violations) == ("not_null:x", 2)


def test_not_null_empty_table_is_zero_not_null(spark):
    df = spark.createDataFrame([], "x int")
    assert _one(check_not_null(df, "x")).n_violations == 0


def test_unique_counts_groups_not_excess_rows(spark):
    # key 1 appears 3x, key 2 appears 2x -> 2 violating GROUPS (dbt
    # semantics), not 3 excess rows
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (2,), (3,)], "k int")
    assert _one(check_unique(df, ["k"])).n_violations == 2


def test_unique_composite_key(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b"), (1, "a")], "k int, s string")
    r = _one(check_unique(df, ["k", "s"]))
    assert (r.check_name, r.n_violations) == ("unique:k,s", 1)


def test_accepted_values_null_is_violation(spark):
    df = spark.createDataFrame([("O",), ("X",), (None,)], "s string")
    assert _one(check_accepted_values(df, "s", ["O", "F"])).n_violations == 2


def test_referential_ignores_null_fk(spark):
    child = spark.createDataFrame([(1,), (2,), (None,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = _one(check_referential(child, "fk", parent, "pk"))
    assert (r.check_name, r.n_violations) == ("referential:fk->pk", 1)


def test_suite_unions_one_row_per_check(spark):
    df = spark.createDataFrame([(1,), (1,)], "k int")
    out = dq_suite(
        [check_not_null(df, "k"), check_unique(df, ["k"])]
    ).collect()
    assert {(r.check_name, r.n_violations) for r in out} == {
        ("not_null:k", 0),
        ("unique:k", 1),
    }


def test_hash_split_is_exhaustive_and_disjoint(spark):
    df = spark.range(500).withColumnRenamed("id", "k")
    out = hash_split(df, ["k"], {"train": 800, "val": 900, "test": 1000})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 500  # every row labeled exactly once
    assert set(counts) == {"train", "val", "test"}
    # rough proportions (hash uniformity, wide tolerance)
    assert counts["train"] > 300


def test_hash_split_train_band_equals_hash_sample(spark):
    """The split's train band IS the hash_sample(permille=800) row set
    under the same salt — the holdout complement contract."""
    df = spark.range(300).withColumnRenamed("id", "k")
    split_train = {
        r.k
        for r in hash_split(df, ["k"], {"train": 800, "rest": 1000}, salt="s1")
        .where(F.col("split") == "train")
        .collect()
    }
    sampled = {r.k for r in hash_sample(df, ["k"], 800, salt="s1").collect()}
    assert split_train == sampled


def test_hash_split_rejects_non_exhaustive_cuts(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(AssertionError):
        hash_split(df, ["k"], {"train": 800, "val": 900})


def test_hash_split_rejects_duplicate_cuts(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(AssertionError):
        hash_split(df, ["k"], {"a": 1000, "b": 1000})
