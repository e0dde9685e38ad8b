"""substring_dedup / doc_perplexity contracts: span excision keeps the
first corpus occurrence, reassembly preserves order, fully-duplicated
docs drop; perplexity is the exact add-one bigram NLL.
"""

from __future__ import annotations

import math

from ecommerce_dataengineering_project_spark.operators.dedup import substring_dedup
from ecommerce_dataengineering_project_spark.operators.search import doc_perplexity


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _result(spark, texts, k=3):
    rows = substring_dedup(_docs(spark, texts), chunk_words=k).collect()
    return {r.doc_id: r for r in rows}


def test_no_duplicates_is_identity(spark):
    texts = ["a b c d e f g", "h i j k l"]
    out = _result(spark, texts)
    for i, t in enumerate(texts):
        assert out[i].clean_text == t
        assert out[i].n_kept == out[i].n_chunks


def test_repeated_span_excised_keeps_first(spark):
    # doc1's first span "a b c" already appeared as doc0's first span
    out = _result(spark, ["a b c x y z", "a b c q r s"])
    assert out[0].clean_text == "a b c x y z"
    assert out[1].clean_text == "q r s"
    assert (out[1].n_chunks, out[1].n_kept) == (2, 1)


def test_fully_duplicated_doc_drops(spark):
    out = _result(spark, ["a b c d e f", "a b c d e f"])
    assert 0 in out and 1 not in out


def test_within_doc_repetition_excised(spark):
    # the same span twice INSIDE one doc: second occurrence removed
    out = _result(spark, ["a b c a b c x y z"])
    assert out[0].clean_text == "a b c x y z"
    assert (out[0].n_chunks, out[0].n_kept) == (3, 2)


def test_tail_chunk_shorter_than_k(spark):
    out = _result(spark, ["a b c d"])  # chunks: "a b c", "d"
    assert out[0].clean_text == "a b c d"
    assert out[0].n_chunks == 2


def test_first_occurrence_is_smallest_doc_then_position(spark):
    # span "x y z" appears at doc0 pos1 and doc1 pos0 -> doc0 keeps it
    out = _result(spark, ["a b c x y z", "x y z q r s"])
    assert out[0].clean_text == "a b c x y z"
    assert out[1].clean_text == "q r s"


def test_perplexity_exact_two_docs(spark):
    # corpus: "a b" x2 and "a c". pairs: (a,b):2, (a,c):1; c(a.)=3; V=3
    rows = doc_perplexity(_docs(spark, ["a b", "a b", "a c"])).collect()
    got = {r.doc_id: r for r in rows}
    p_ab = (2 + 1) / (3 + 3)
    p_ac = (1 + 1) / (3 + 3)
    exp_ab = math.floor(-math.log(p_ab) * 1e6 + 0.5) / 1e6
    exp_ac = math.floor(-math.log(p_ac) * 1e6 + 0.5) / 1e6
    assert got[0].avg_nll == exp_ab == got[1].avg_nll
    assert got[2].avg_nll == exp_ac
    assert got[0].n_bigrams == 1


def test_perplexity_rare_doc_scores_higher(spark):
    texts = ["the cat sat", "the cat sat", "the cat sat", "zig zag zog"]
    rows = doc_perplexity(_docs(spark, texts)).collect()
    got = {r.doc_id: r.avg_nll for r in rows}
    assert got[3] > got[0]  # off-distribution doc is more surprising


def test_perplexity_short_docs_drop(spark):
    rows = doc_perplexity(_docs(spark, ["solo", "a b"])).collect()
    assert [r.doc_id for r in rows] == [1]
