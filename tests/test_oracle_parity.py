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
