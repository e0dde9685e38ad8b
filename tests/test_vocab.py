"""vocab_coverage contracts (operators/text.py): deterministic top-V
cut and per-doc OOV accounting. Oracle parity of the registered query
is in the registry sweep."""

from __future__ import annotations

from ecommerce_dataengineering_project_spark.operators.text import vocab_coverage


def _cov(spark, texts, vocab_size):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in vocab_coverage(df, vocab_size=vocab_size).collect()}


def test_oov_counts_and_ratio(spark):
    # corpus counts: a=3, b=2, z=1 -> vocab_size=2 keeps {a, b}
    rows = _cov(spark, ["a a b", "a b z"], vocab_size=2)
    assert (rows[0].n_tokens, rows[0].n_oov, rows[0].oov_ratio) == (3, 0, 0.0)
    assert (rows[1].n_tokens, rows[1].n_oov) == (3, 1)
    assert abs(rows[1].oov_ratio - 1 / 3) < 1e-6


def test_vocab_tie_broken_by_token_asc(spark):
    # b and c tie at count 1; vocab_size=2 must keep {a, b} (token asc),
    # so every c is OOV while b is covered
    rows = _cov(spark, ["a a", "b c"], vocab_size=2)
    assert rows[1].n_oov == 1  # c out, b in


def test_every_doc_reported_even_with_zero_oov(spark):
    rows = _cov(spark, ["a", "a a"], vocab_size=4)
    assert set(rows) == {0, 1}
    assert all(r.n_oov == 0 for r in rows.values())
