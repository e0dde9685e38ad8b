"""mixture_divergence contracts (operators/text.py): the per-slice
KL/JS drift monitor. Oracle parity of the registered query is in the
registry sweep; these pin the information-theoretic invariants on
hand-built corpora."""

from __future__ import annotations

import math

from ecommerce_dataengineering_project_spark.operators.text import mixture_divergence


def _div(spark, rows):
    df = spark.createDataFrame(rows, "source string, text string")
    return {
        r.source: r
        for r in mixture_divergence(df, "source", "text").collect()
    }


def test_single_slice_is_the_corpus(spark):
    # one slice => P_s == Q exactly (same counts, same totals, same
    # smoothing) => both divergences are identically zero
    out = _div(spark, [("a", "x y"), ("a", "x z x")])
    assert (out["a"].kl_vs_corpus, out["a"].js_vs_corpus) == (0.0, 0.0)
    assert out["a"].n_tokens == 5
    assert out["a"].n_present_vocab == 3


def test_identical_distributions_near_zero(spark):
    # two slices with the SAME unigram distribution: each matches the
    # mixture up to the smoothing pseudo-count (tot_s != tot shifts
    # the +1 mass slightly), so divergence is tiny but NOT negative
    out = _div(spark, [("a", "x x y"), ("b", "x x y")])
    for s in ("a", "b"):
        assert 0.0 <= out[s].kl_vs_corpus < 0.01
        assert 0.0 <= out[s].js_vs_corpus < 0.01


def test_disjoint_slices_diverge_and_js_bounded(spark):
    out = _div(spark, [("a", "x x x x"), ("b", "y y y y")])
    for s in ("a", "b"):
        assert out[s].kl_vs_corpus > 0.0
        assert 0.0 < out[s].js_vs_corpus <= math.log(2.0) + 1e-9
    # drifted slice scores above an on-distribution one
    out2 = _div(
        spark,
        [("a", "x y x y"), ("b", "x y x y"), ("c", "z z z z")],
    )
    assert out2["c"].kl_vs_corpus > out2["a"].kl_vs_corpus


def test_corpus_scanned_exactly_once(spark, sf_dir):
    # st feeds four consumers; the eager localCheckpoint guarantees
    # the corpus scan+explode runs ONCE — downstream plans must read
    # the checkpointed relation, never the parquet source again
    from ecommerce_dataengineering_project_spark.queries.ext_text import (
        q_mixture_divergence,
    )

    df = q_mixture_divergence(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan
    assert "Scan ExistingRDD" in plan  # the checkpointed st relation


def test_absent_vocab_counted_via_smoothing(spark):
    # slice b never emits 'z' but the corpus has it: the smoothed mass
    # 1/(tot_b+V) must still contribute (n_present < V while the KL
    # sum stays finite and positive)
    out = _div(spark, [("a", "x z"), ("b", "x x x y")])
    assert out["b"].n_present_vocab == 2  # x, y — not z
    assert out["b"].kl_vs_corpus > 0.0
    assert math.isfinite(out["b"].kl_vs_corpus)
