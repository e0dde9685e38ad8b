"""mixture_divergence contracts (operators/text.py): the per-slice
KL/JS drift monitor. Oracle parity of the registered query is in the
registry sweep; these pin the information-theoretic invariants on
hand-built corpora."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

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


# ---- hypothesis: random corpora vs a pure-Python reference ----------

_WORD = st.sampled_from(["x", "y", "z", "qq", "w0"])
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)
_SLICE = st.sampled_from(["a", "b", "c"])


def _py_divergence(rows):
    """Independent reference: smoothed unigram KL/JS per slice, the
    same round-half-up(6) the operator applies."""
    st_counts: Counter = Counter()
    for s, text in rows:
        for tok in text.split(" "):
            st_counts[(s, tok)] += 1
    tok_counts: Counter = Counter()
    tot_s: Counter = Counter()
    for (s, tok), c in st_counts.items():
        tok_counts[tok] += c
        tot_s[s] += c
    v = len(tok_counts)
    tot = sum(tok_counts.values())
    out = {}
    for s in tot_s:
        kl = js = 0.0
        present = 0
        for tok, ct in tok_counts.items():
            cs = st_counts.get((s, tok), 0)
            present += cs > 0
            p = (cs + 1) / (tot_s[s] + v)
            q = (ct + 1) / (tot + v)
            m = (p + q) / 2.0
            kl += p * math.log(p / q)
            js += 0.5 * (p * math.log(p / m) + q * math.log(q / m))
        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        out[s] = (tot_s[s], present, r6(kl), r6(js))
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(_SLICE, _DOC), min_size=1, max_size=30))
def test_matches_python_reference_on_random_corpora(spark, rows):
    df = spark.createDataFrame(rows, "source string, text string")
    got = {
        r.source: (r.n_tokens, r.n_present_vocab, r.kl_vs_corpus, r.js_vs_corpus)
        for r in mixture_divergence(df, "source", "text").collect()
    }
    want = _py_divergence(rows)
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0]
        assert got[s][1] == want[s][1]
        # per-row double math is IEEE-identical; the ln/sum path is
        # pinned to 1e-9 relative (the rounding then snaps both)
        assert math.isclose(got[s][2], want[s][2], rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(got[s][3], want[s][3], rel_tol=1e-9, abs_tol=1e-9)
        # information-theory invariants hold on every random corpus
        assert got[s][2] >= 0.0
        assert 0.0 <= got[s][3] <= math.log(2.0) + 1e-9


def test_reliable_checkpoint_fails_fast_without_dir(spark, monkeypatch):
    # ADVICE r12 + r13: reliable_checkpoint=True on a session without a
    # checkpoint dir must raise a targeted ValueError at call time,
    # not a generic SparkException from inside checkpoint(). The
    # no-dir condition is injected by stubbing getCheckpointDir on the
    # shared context (restored by monkeypatch) instead of skipping
    # when a dir is already set — under test reordering/selection the
    # old skip made this guard silently never run; the guard path
    # raises BEFORE any checkpoint() call, so the stub is safe even
    # when a real dir exists.
    import pytest

    monkeypatch.setattr(spark.sparkContext, "getCheckpointDir", lambda: None)
    df = spark.createDataFrame([("a", "x y"), ("b", "x z")], "source string, text string")
    with pytest.raises(ValueError, match="setCheckpointDir"):
        mixture_divergence(df, "source", "text", reliable_checkpoint=True)


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    # setting the dir here is a one-way switch on the shared session,
    # which is harmless — nothing else calls checkpoint(), and the
    # fail-fast guard above no longer depends on this never running
    # first (it stubs the no-dir condition)
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = spark.createDataFrame(
        [("a", "x y y"), ("b", "x z"), ("b", "z z q")],
        "source string, text string",
    )
    local = {tuple(r) for r in mixture_divergence(df, "source", "text").collect()}
    reliable = {
        tuple(r)
        for r in mixture_divergence(
            df, "source", "text", reliable_checkpoint=True
        ).collect()
    }
    assert local == reliable
