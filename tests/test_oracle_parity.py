"""The local correctness gate: every registered query with an oracle
must match DuckDB on the fixture tables (mirrors the driver's t2 check).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duck_connection

import __spark_entry__ as entrymod

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "purchase_date" in df.columns


def test_every_oracle_has_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.columns  # materializes the plan
    if name not in _ORACLES:
        # rows-only check (driver does the same for oracle-less queries)
        df.limit(5).collect()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    df = _QUERIES[name](spark, sf_dir)
    errors = compare(df, duck, _ORACLES[name])
    assert not errors, f"{name}: " + "; ".join(errors)


def test_dtype_parity_catches_hugeint(spark, duck):
    """Regression for r4's `funnel_conversion` red row: an un-cast
    SUM(CASE...) over ints comes back from DuckDB as HUGEINT while Spark
    emits bigint — values identical, driver hash red.  The harness must
    flag that dtype drift locally."""
    from tests.oracle_harness import dtype_errors

    sdf = spark.range(3).selectExpr("CAST(count(*) AS BIGINT) AS n")
    bad = duck.sql("SELECT SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS n "
                   "FROM (SELECT 1 AS x)")
    assert dtype_errors(sdf, bad), "un-cast SUM should flag HUGEINT/DECIMAL"
    good = duck.sql("SELECT CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) "
                    "AS BIGINT) AS n FROM (SELECT 1 AS x)")
    assert not dtype_errors(sdf, good)
