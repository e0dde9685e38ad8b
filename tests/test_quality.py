"""Data-quality checks (dbt-test intent, README.md:51) and the
quarantine parse that fixes the reference's silent-null failure mode."""

from __future__ import annotations

from ecommerce_dataengineering_project_spark.operators.quality import (
    check_accepted_values,
    check_not_null,
    check_relationship,
    check_unique,
    parse_with_quarantine,
)
from ecommerce_dataengineering_project_spark.streaming.bronze_silver import (
    PURCHASE_DRIFT_ALIASES,
    PURCHASE_SCHEMA,
)


def test_checks_on_clean_gold(spark):
    from ecommerce_dataengineering_project_spark.plans.medallion import (
        bronze_to_silver,
        generate_bronze_purchases,
        products_dim,
        silver_to_gold,
    )

    gold = silver_to_gold(bronze_to_silver(generate_bronze_purchases(spark, n=120)))
    assert check_unique(gold, ["transaction_id"]) == 0
    assert all(v == 0 for v in check_not_null(gold, ["transaction_id", "final_amount"]).values())
    assert check_relationship(gold, "product_id", products_dim(spark), "product_id") == 0


def test_checks_catch_violations(spark):
    df = spark.createDataFrame(
        [("a", 1, "ok"), ("a", None, "ok"), ("b", 3, "bad")], "k string, v int, s string"
    )
    assert check_unique(df, ["k"]) == 1
    assert check_not_null(df, ["v"]) == {"v": 1}
    assert check_accepted_values(df, "s", ["ok"]) == 1


def test_parse_with_quarantine_splits_bad_rows(spark):
    rows = [
        ('{"transaction_id": "t1", "product_id": "CS01", "price": 4.99, "quantity": 1}',),
        ('{"add_supplements": true, "transaction_id": "t2"}',),  # drifted field name
        ("this is not json",),
        ('{"unrelated": 1}',),  # valid JSON, no schema fields
    ]
    bronze = spark.createDataFrame(rows, "value string")
    good, quarantine = parse_with_quarantine(
        bronze, PURCHASE_SCHEMA, PURCHASE_DRIFT_ALIASES
    )
    good_rows = {r.transaction_id for r in good.collect()}
    assert good_rows == {"t1", "t2"}
    # the drifted alias parsed into the canonical column
    t2 = [r for r in good.collect() if r.transaction_id == "t2"][0]
    assert t2.add_supplement is True
    bad = [r.raw_record for r in quarantine.collect()]
    assert "this is not json" in bad and '{"unrelated": 1}' in bad


def test_classifier_scores_match_pure_python_reference(spark):
    """classifier_scores (the fastText-shaped codegen fold) must equal
    a straightforward Python reimplementation of hash->bucket->weight
    on arbitrary text, including multi-space and empty-token edges."""
    import hashlib

    from ecommerce_dataengineering_project_spark.operators.text import (
        CLASSIFIER_BUCKETS,
        _W_MOD,
        _W_MULT,
        _W_SHIFT,
        classifier_scores,
    )

    texts = [
        "the quick brown fox",
        "spam spam spam buy now",
        "a",
        "repeated repeated repeated repeated",
        "Unicode tøkens üben",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )
    got = {r.doc_id: (r.token_count, r.score_micro, r.label)
           for r in classifier_scores(docs).collect()}

    def w(tok: str) -> int:
        h = int(hashlib.sha256(tok.encode()).hexdigest()[:15], 16)
        return (h % CLASSIFIER_BUCKETS + 1) * _W_MULT % _W_MOD - _W_SHIFT

    for i, t in enumerate(texts):
        toks = t.split(" ")
        score = sum(w(x) for x in toks)
        assert got[i] == (len(toks), score, "keep" if score > 0 else "filter"), t


def test_classifier_scores_null_text_scores_zero(spark):
    """NULL text must score 0/"filter" — the SQL twin wraps the sum in
    COALESCE(.., 0), and an un-coalesced F.aggregate over the NULL
    token array would yield NULL and silently diverge from the oracle
    (ADVICE r9)."""
    from ecommerce_dataengineering_project_spark.operators.text import classifier_scores

    docs = spark.createDataFrame(
        [(0, None), (1, "the quick brown fox")], "doc_id BIGINT, text STRING"
    )
    row = {r.doc_id: r for r in classifier_scores(docs).collect()}[0]
    assert row.score_micro == 0
    assert row.label == "filter"
