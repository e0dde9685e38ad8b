"""Property tests for the context-prep operators: chunking, shuffle
order, and packing checked against independent pure-Python references
over hypothesis-generated inputs (per-process Spark round trips are
slow, so each example batch-processes many generated docs at once)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ecommerce_dataengineering_project_spark.operators.sampling import deterministic_shuffle
from ecommerce_dataengineering_project_spark.operators.text import chunk_documents, pack_chunks

_WORD = st.text(alphabet="abcxyz0189", min_size=1, max_size=4)
_DOC = st.lists(_WORD, min_size=0, max_size=70).map(" ".join)


def _py_chunks(text: str, chunk: int, overlap: int):
    toks = text.split(" ")
    stride = chunk - overlap
    out = []
    start = 1
    while True:
        window = toks[start - 1 : start - 1 + chunk]
        out.append((start, (start - 1) // stride, " ".join(window), len(window)))
        if start + stride > max(len(toks) - overlap, 1):
            break
        start += stride
    return out


@pytest.mark.parametrize("chunk,overlap", [(8, 2), (5, 0), (3, 2)])
@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=25))
def test_chunking_matches_python_reference(spark, chunk, overlap, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_start, r.chunk_id, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    }
    want = {
        (i, s, cid, txt, n)
        for i, t in enumerate(docs)
        for (s, cid, txt, n) in _py_chunks(t, chunk, overlap)
    }
    assert got == want


def _py_hash60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=8, deadline=None)
@given(st.sets(st.integers(0, 10_000), min_size=1, max_size=60), st.integers(2, 7))
def test_shuffle_matches_python_reference(spark, ids, n_shards):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.shard, r.pos)
        for r in deterministic_shuffle(df, ["doc_id"], n_shards).collect()
    }
    hs = {i: _py_hash60(f"shuffle_{i}") for i in ids}
    want = {}
    for shard in range(n_shards):
        members = sorted((hs[i], i) for i in ids if hs[i] % n_shards == shard)
        for pos, (_, i) in enumerate(members, start=1):
            want[i] = (shard, pos)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 30)), min_size=1, max_size=60
    ),
    st.integers(4, 40),
)
def test_packing_matches_python_reference(spark, rows, budget):
    # rows: (shard, n_tok); pos assigned by list order within shard
    data = []
    pos_by_shard: dict[int, int] = {}
    for shard, n_tok in rows:
        pos_by_shard[shard] = pos_by_shard.get(shard, 0) + 1
        data.append((shard, pos_by_shard[shard], n_tok))
    df = spark.createDataFrame(data, "shard int, pos int, n_tok long")
    got = {
        (r.shard, r.pos): (r.token_offset, r.bin_id, r.bin_offset)
        for r in pack_chunks(df, "shard", ["pos"], "n_tok", budget).collect()
    }
    want = {}
    for shard in set(s for s, _, _ in data):
        off = 0
        for s, pos, n_tok in data:
            if s != shard:
                continue
            want[(shard, pos)] = (off, off // budget, off % budget)
            off += n_tok
    assert got == want
