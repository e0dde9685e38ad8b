"""Property tests for the second-session operators: hash_split,
vocab_coverage, parse_quarantine and the dq check suite, each checked
against an independent pure-Python reference over hypothesis-generated
inputs (batched per example — per-call Spark round trips are slow)."""

from __future__ import annotations

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_dataengineering_project_spark.operators.dq import (
    check_accepted_values,
    check_not_null,
    check_unique,
    dq_suite,
)
from ecommerce_dataengineering_project_spark.operators.sampling import hash_split
from ecommerce_dataengineering_project_spark.operators.text import vocab_coverage


def _py_hash60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=8, deadline=None)
@given(
    st.sets(st.integers(0, 100_000), min_size=1, max_size=80),
    st.lists(st.integers(1, 999), min_size=1, max_size=3, unique=True),
)
def test_hash_split_matches_python_reference(spark, ids, inner_cuts):
    cuts = dict(
        {f"s{i}": c for i, c in enumerate(sorted(inner_cuts))}, last=1000
    )
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    got = {r.k: r.split for r in hash_split(df, ["k"], cuts, salt="p").collect()}
    bands = sorted(cuts.items(), key=lambda kv: kv[1])

    def ref(i: int) -> str:
        h = _py_hash60(f"p_{i}") % 1000
        for name, cut in bands:
            if h < cut:
                return name
        raise AssertionError("unreachable: last cut is 1000")

    assert got == {i: ref(i) for i in ids}


_WORD = st.text(alphabet="abcwxyz", min_size=1, max_size=3)
_DOC = st.lists(_WORD, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=20), st.integers(1, 12))
def test_vocab_coverage_matches_python_reference(spark, docs, v):
    from collections import Counter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_oov)
        for r in vocab_coverage(df, vocab_size=v).collect()
    }
    counts = Counter(tok for t in docs for tok in t.split(" "))
    vocab = {
        tok for tok, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    }
    want = {
        i: (
            len(t.split(" ")),
            sum(1 for tok in t.split(" ") if tok not in vocab),
        )
        for i, t in enumerate(docs)
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(-5, 5),  # valid payloads {"k": n}
            st.just("garbage"),  # malformed
        ),
        min_size=1,
        max_size=30,
    )
)
def test_quarantine_totals_match_reference(spark, payloads):
    from pyspark.sql.types import IntegerType, StructField, StructType

    from ecommerce_dataengineering_project_spark.streaming.bronze_silver import (
        parse_quarantine,
    )

    rows = [
        (i, json.dumps({"k": p}) if isinstance(p, int) else p)
        for i, p in enumerate(payloads)
    ]
    df = spark.createDataFrame(rows, "id long, value string")
    out = {
        r.id: (r.k, r.quarantined)
        for r in parse_quarantine(
            df, StructType([StructField("k", IntegerType())])
        ).collect()
    }
    for i, p in enumerate(payloads):
        if isinstance(p, int):
            assert out[i] == (p, False)
        elif p is None:
            assert out[i] == (None, False)  # no message, not a bad one
        else:
            assert out[i] == (None, True)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.one_of(st.none(), st.integers(0, 5)), st.sampled_from("ab")),
        min_size=0,
        max_size=30,
    )
)
def test_dq_suite_matches_python_reference(spark, rows):
    from collections import Counter

    df = spark.createDataFrame(rows, "k int, s string")
    out = {
        r.check_name: r.n_violations
        for r in dq_suite(
            [
                check_not_null(df, "k"),
                check_unique(df, ["k"]),
                check_accepted_values(df, "s", ["a"]),
            ]
        ).collect()
    }
    ks = [k for k, _ in rows]
    groups = Counter(ks)  # NULL keys form a group too (Spark groupBy)
    assert out["not_null:k"] == sum(1 for k in ks if k is None)
    assert out["unique:k"] == sum(1 for c in groups.values() if c > 1)
    assert out["accepted_values:s"] == sum(1 for _, s in rows if s != "a")
