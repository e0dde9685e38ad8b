"""Loud, local guards for the data-conditional exactness windows that
back the sketch-family oracle graduations (ADVICE r12): each graduated
query's oracle is exact ONLY inside a window of the fixture data —
HLL's coupon phase, Misra-Gries at k >= vocabulary, GK at
accuracy >= n. A fixture change that leaves a window must fail HERE
with a named precondition, not as an opaque driver hash mismatch.

Checked against every shipped fixture decade (duckdb-side — these are
data facts, no Spark needed), including sf0.1, which no regular test
reads but the driver bench does.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ecommerce_dataengineering_project_spark.queries.ext_stats import (
    GK_ACC_EXACT,
    HH_K,
)

# DataSketches HLL stays in its exact coupon (list/set) phase below
# ~3/8 * 2^lgk distinct values; both graduated HLL arms run lgk=16.
HLL_LGK = 16
COUPON_BOUNDARY = (3 * (1 << HLL_LGK)) // 8  # 24576

_DECADES = [
    d
    for d in ("sf0.001", "sf0.01", "sf0.1")
    if os.path.isdir(f"/root/testdata/{d}")
]


@pytest.fixture(scope="module", params=_DECADES)
def decade(request) -> str:
    return f"/root/testdata/{request.param}"


def test_segment_overlap_unions_stay_in_coupon_phase(decade):
    # segment_overlap_sketch: every pairwise UNION of per-segment
    # distinct-user sets (the largest cardinality any sketch sees)
    # must stay inside the coupon phase
    worst = duckdb.sql(
        f"""
        WITH du AS (SELECT DISTINCT event_type, user_id
                    FROM read_parquet('{decade}/events.parquet')),
        segs AS (SELECT DISTINCT event_type FROM du)
        SELECT MAX(u) FROM (
            SELECT (SELECT COUNT(DISTINCT user_id) FROM du
                    WHERE event_type IN (a.event_type, b.event_type)) AS u
            FROM segs a JOIN segs b ON a.event_type < b.event_type
        )
        """
    ).fetchone()[0]
    assert worst < COUPON_BOUNDARY, (
        f"{decade}: largest segment-pair distinct-user union {worst} left "
        f"the lgk={HLL_LGK} coupon phase (<{COUPON_BOUNDARY}) — the "
        "segment_overlap_sketch oracle is no longer exact"
    )


def test_heavy_hitter_vocab_within_k(decade):
    # heavy_hitter_tokens: MG weights are exact counts only at
    # k >= vocabulary size
    vocab = duckdb.sql(
        f"""
        SELECT COUNT(DISTINCT w) FROM (
            SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w
            FROM read_parquet('{decade}/documents.parquet'))
        """
    ).fetchone()[0]
    assert vocab <= HH_K, (
        f"{decade}: document vocabulary {vocab} exceeds HH_K={HH_K} — the "
        "heavy_hitter_tokens oracle is no longer exact"
    )


def test_approx_distinct_quantiles_windows(decade):
    # approx_distinct_quantiles: per-flag distinct suppliers inside the
    # HLL coupon phase AND per-flag row counts within the GK
    # no-compression accuracy
    ds, n = duckdb.sql(
        f"""
        SELECT MAX(ds), MAX(n) FROM (
            SELECT COUNT(DISTINCT l_suppkey) AS ds, COUNT(*) AS n
            FROM read_parquet('{decade}/lineitem.parquet')
            GROUP BY l_returnflag)
        """
    ).fetchone()
    assert ds < COUPON_BOUNDARY, (
        f"{decade}: per-flag distinct suppliers {ds} left the lgk={HLL_LGK} "
        f"coupon phase (<{COUPON_BOUNDARY})"
    )
    assert n <= GK_ACC_EXACT, (
        f"{decade}: per-flag row count {n} exceeds GK accuracy "
        f"{GK_ACC_EXACT} — percentile_approx may compress and drift off "
        "the exact rank"
    )
