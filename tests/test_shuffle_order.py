"""deterministic_shuffle contracts: the training order is a pure
function of (salt, key) — invariant to input partitioning — and
(shard, pos) forms a total order."""

from __future__ import annotations

from ecommerce_dataengineering_project_spark.operators.sampling import deterministic_shuffle


def test_order_is_partitioning_invariant(spark):
    df = spark.range(500).selectExpr("id AS doc_id")
    a = deterministic_shuffle(df.repartition(7), ["doc_id"], 4).collect()
    b = deterministic_shuffle(df.coalesce(1), ["doc_id"], 4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shard_pos_is_total_order(spark):
    df = spark.range(300).selectExpr("id AS doc_id")
    rows = deterministic_shuffle(df, ["doc_id"], 4).collect()
    keys = [(r.shard, r.pos) for r in rows]
    assert len(set(keys)) == len(rows)
    # positions are dense 1..n within each shard
    by_shard: dict[int, list] = {}
    for s, p in keys:
        by_shard.setdefault(s, []).append(p)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_resalting_changes_the_order(spark):
    df = spark.range(300).selectExpr("id AS doc_id")
    e0 = {r.doc_id: (r.shard, r.pos) for r in deterministic_shuffle(df, ["doc_id"], 4, salt="epoch0").collect()}
    e1 = {r.doc_id: (r.shard, r.pos) for r in deterministic_shuffle(df, ["doc_id"], 4, salt="epoch1").collect()}
    assert e0 != e1  # different epoch, different permutation
    assert set(e0) == set(e1)  # same rows


def test_null_key_raises_not_collides(spark):
    """concat_ws silently drops NULL parts, so a NULL key would quietly
    hash-collide with its non-null complement; the contract is
    fail-loud instead (ADVICE r4)."""
    import pytest

    df = spark.createDataFrame([(1, "a"), (None, "b")], "doc_id long, x string")
    with pytest.raises(Exception, match="doc_id.*NULL|USER_RAISED"):
        deterministic_shuffle(df, ["doc_id"], 4).collect()
