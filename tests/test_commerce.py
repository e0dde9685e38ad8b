"""Behavior tests for operators/commerce.py (RFM, basket affinity,
decayed revenue) on small constructed frames — the oracle-parity sweep
covers the fixtures; these pin the semantic contracts."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.commerce import (
    DECAY,
    basket_pairs,
    decay_weights,
    decayed_daily_revenue,
    rfm_segments,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_custkey bigint, o_orderdate timestamp, o_totalprice double"
    )


def test_rfm_scores_and_segments(spark):
    ts = datetime.datetime
    rows = []
    # customer 1: recent, frequent, big spender -> champion
    for d in range(5):
        rows.append((1, ts(2020, 6, 1 + d), 1000.0))
    # customer 2: old single cheap order -> hibernating
    rows.append((2, ts(2019, 1, 1), 10.0))
    # customers 3-5: middling
    for c in (3, 4, 5):
        rows.append((c, ts(2020, 1, c), 100.0 * c))
        rows.append((c, ts(2020, 2, c), 100.0 * c))
    out = {r["custkey"]: r for r in rfm_segments(_orders(spark, rows)).collect()}
    assert out[1]["segment"] == "champion"
    assert out[1]["r_score"] == 5 and out[1]["f_score"] == 5 and out[1]["m_score"] == 5
    assert out[2]["segment"] == "hibernating"
    assert out[2]["recency_days"] == (ts(2020, 6, 5) - ts(2019, 1, 1)).days
    assert out[2]["frequency"] == 1
    # monetary is rounded to cents before ranking
    assert out[3]["monetary"] == 600.0


def _lineitem(spark, rows):
    return spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")


def test_basket_pairs_support_and_lift(spark):
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30),
        (4, 30),  # duplicate line: distinct() must collapse it
    ]
    li = _lineitem(spark, rows)
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pairs(li, min_support=2).collect()
    }
    assert set(out) == {(10, 20)}
    r = out[(10, 20)]
    assert r["pair_orders"] == 3
    # lift = P(10,20)/(P(10)P(20)) = (3/4) / ((3/4)*(3/4)) = 4/3
    assert r["lift"] == pytest.approx(4.0 / 3.0, abs=1e-6)


def test_basket_cap_drops_oversized_baskets(spark):
    rows = [(1, i) for i in range(10)] + [(2, 1), (2, 2), (3, 1), (3, 2)]
    li = _lineitem(spark, rows)
    uncapped = basket_pairs(li, min_support=2).collect()
    # pair (1,2) appears in all three orders uncapped...
    assert {(r["item_a"], r["item_b"], r["pair_orders"]) for r in uncapped} == {
        (1, 2, 3)
    }
    capped = basket_pairs(li, min_support=2, max_basket_items=5).collect()
    # ...but the 10-item basket is excluded under the cap, and the
    # order universe for lift shrinks with it
    assert {(r["item_a"], r["item_b"], r["pair_orders"]) for r in capped} == {
        (1, 2, 2)
    }
    assert capped[0]["lift"] == pytest.approx(2.0 * 2 / (2 * 2), abs=1e-6)


def test_decay_weights_are_shared_literals():
    w = decay_weights()
    assert w[0] == 1.0
    assert w[1] == DECAY
    assert len(w) == 30
    # sequential product, not pow(): bit-reproducible on any engine
    assert w[2] == (DECAY * DECAY)


def test_decayed_revenue_respects_gaps_and_window(spark):
    ts = datetime.datetime
    rows = [
        (1, ts(2020, 1, 1), 100.0),
        (2, ts(2020, 1, 2), 200.0),
        # 10-day gap
        (3, ts(2020, 1, 12), 50.0),
        # far outside the 30-day window of everything above
        (4, ts(2020, 6, 1), 70.0),
    ]
    out = {
        r["day"].isoformat(): r
        for r in decayed_daily_revenue(_orders(spark, rows)).collect()
    }
    w = decay_weights()
    assert out["2020-01-01"]["decayed_revenue"] == pytest.approx(100.0, abs=1e-4)
    assert out["2020-01-02"]["decayed_revenue"] == pytest.approx(
        200.0 + 100.0 * w[1], abs=1e-4
    )
    assert out["2020-01-02"]["days_in_window"] == 2
    # gap days contribute nothing but decay still applies by calendar
    # distance: 11 days back for Jan 1, 10 for Jan 2
    assert out["2020-01-12"]["decayed_revenue"] == pytest.approx(
        50.0 + 200.0 * w[10] + 100.0 * w[11], abs=1e-4
    )
    # outside the window: only itself
    assert out["2020-06-01"]["decayed_revenue"] == pytest.approx(70.0, abs=1e-4)
    assert out["2020-06-01"]["days_in_window"] == 1


def test_scd2_apply_versioning(spark):
    from ecommerce_dataengineering_project_spark.operators.scd import scd2_apply

    dt = datetime.date
    dim = spark.createDataFrame(
        [
            # k=1: closed history row + open row
            (1, "a", dt(2019, 1, 1), dt(2019, 6, 1), False),
            (1, "b", dt(2019, 6, 1), None, True),
            # k=2: open only
            (2, "x", dt(2019, 1, 1), None, True),
        ],
        "k bigint, attr string, effective_from date, effective_to date, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (1, "b", dt(2020, 1, 1)),   # no-op: suppressed
            (1, "c", dt(2020, 2, 1)),   # real change
            (2, "x", dt(2020, 3, 1)),   # no-op: k=2 stays as-is
        ],
        "k bigint, attr string, effective_from date",
    )
    out = scd2_apply(dim, updates, ["k"], ["attr"])
    rows = sorted(
        (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
        for r in out.collect()
    )
    assert rows == [
        (1, "a", dt(2019, 1, 1), dt(2019, 6, 1), False),   # history untouched
        (1, "b", dt(2019, 6, 1), dt(2020, 2, 1), False),   # closed by real change
        (1, "c", dt(2020, 2, 1), None, True),
        (2, "x", dt(2019, 1, 1), None, True),              # no-op never reopens
    ]
    # exactly one open row per key
    cur = out.where(F.col("is_current")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_same_instant_update_supersedes(spark):
    from ecommerce_dataengineering_project_spark.operators.scd import scd2_apply

    dt = datetime.date
    dim = spark.createDataFrame(
        [(1, "a", dt(2020, 1, 1), None, True)],
        "k bigint, attr string, effective_from date, effective_to date, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "z", dt(2020, 1, 1))], "k bigint, attr string, effective_from date"
    )
    out = sorted(
        (r.attr, r.effective_from, r.effective_to, r.is_current)
        for r in scd2_apply(dim, updates, ["k"], ["attr"]).collect()
    )
    # the open row closes at the same instant (zero-width version),
    # the update becomes current
    assert out == [
        ("a", dt(2020, 1, 1), dt(2020, 1, 1), False),
        ("z", dt(2020, 1, 1), None, True),
    ]


def test_pit_join_left_edges(spark):
    from ecommerce_dataengineering_project_spark.operators.joins import pit_join

    dt = datetime.date
    dim = spark.createDataFrame(
        [
            (1, "a", dt(2020, 1, 1), dt(2020, 6, 1)),
            (1, "b", dt(2020, 6, 1), None),
        ],
        "k bigint, attr string, effective_from date, effective_to date",
    )
    fact = spark.createDataFrame(
        [
            (100, 1, dt(2020, 3, 1)),   # inside first version
            (101, 1, dt(2020, 6, 1)),   # boundary: half-open -> second
            (102, 1, dt(2019, 1, 1)),   # before any version
            (103, 9, dt(2020, 1, 1)),   # key not in dim
        ],
        "fid bigint, k bigint, ts date",
    )
    inner = {r.fid: r.attr for r in pit_join(fact, dim, ["k"], "ts").collect()}
    assert inner == {100: "a", 101: "b"}
    left = {
        r.fid: r.attr for r in pit_join(fact, dim, ["k"], "ts", how="left").collect()
    }
    assert left == {100: "a", 101: "b", 102: None, 103: None}


def test_scd2_incremental_equals_one_shot(spark):
    """The property the streaming SCD2 loop rests on: applying
    time-ordered update batches one at a time converges to the same
    table as a single combined apply (change suppression only looks
    backward; later batches carry later event times)."""
    from ecommerce_dataengineering_project_spark.operators.scd import scd2_apply

    dt = datetime.date
    dim0 = spark.createDataFrame(
        [(k, "base", dt(2019, 1, 1), None, True) for k in (1, 2, 3)],
        "k bigint, attr string, effective_from date, effective_to date, is_current boolean",
    )
    b1 = spark.createDataFrame(
        [(1, "base", dt(2020, 1, 5)), (2, "x", dt(2020, 1, 6))],
        "k bigint, attr string, effective_from date",
    )
    b2 = spark.createDataFrame(
        [(1, "y", dt(2020, 2, 1)), (2, "x", dt(2020, 2, 2)), (3, "z", dt(2020, 2, 3))],
        "k bigint, attr string, effective_from date",
    )
    stepwise = scd2_apply(scd2_apply(dim0, b1, ["k"], ["attr"]), b2, ["k"], ["attr"])
    oneshot = scd2_apply(dim0, b1.unionByName(b2), ["k"], ["attr"])
    key = lambda r: (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
    assert sorted(map(key, stepwise.collect())) == sorted(map(key, oneshot.collect()))


from hypothesis import given, settings
from hypothesis import strategies as st

_UPDATE = st.tuples(
    st.integers(min_value=1, max_value=4),       # key
    st.sampled_from(["a", "b", "c"]),            # attr
    st.integers(min_value=1, max_value=60),      # day offset
)


@settings(max_examples=15, deadline=None)
@given(st.lists(_UPDATE, min_size=0, max_size=20))
def test_scd2_invariants_on_random_updates(spark, raw):
    """SCD2 structural invariants under arbitrary update streams:
    exactly one open row per key, contiguous non-overlapping version
    ranges, and no adjacent versions with equal attributes (the
    suppression contract)."""
    from ecommerce_dataengineering_project_spark.operators.scd import scd2_apply

    dt = datetime.date
    # one update per (key, day): the operator's documented tie contract
    dedup = {}
    for k, attr, off in raw:
        dedup[(k, off)] = attr
    rows = [
        (k, attr, dt(2020, 1, 1) + datetime.timedelta(days=off))
        for (k, off), attr in sorted(dedup.items())
    ]
    dim0 = spark.createDataFrame(
        [(k, "base", dt(2019, 1, 1), None, True) for k in (1, 2, 3, 4)],
        "k bigint, attr string, effective_from date, effective_to date, is_current boolean",
    )
    updates = spark.createDataFrame(
        rows, "k bigint, attr string, effective_from date"
    ) if rows else dim0.select("k", "attr", "effective_from").limit(0)
    out = scd2_apply(dim0, updates, ["k"], ["attr"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert set(by_key) == {1, 2, 3, 4}
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r.effective_from)
        open_rows = [r for r in versions if r.is_current]
        assert len(open_rows) == 1 and open_rows[0] is versions[-1]
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.effective_to == nxt.effective_from  # contiguous
            assert not prev.is_current
            assert prev.attr != nxt.attr  # suppression held
        assert versions[-1].effective_to is None
