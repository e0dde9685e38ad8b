"""chunk_documents contracts: window/overlap arithmetic, short-doc and
exact-boundary edges, full-coverage reconstruction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_dataengineering_project_spark.operators.text import chunk_documents


def _chunks(spark, texts, chunk_tokens=8, overlap=2):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    out: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_id)):
        out.setdefault(r.doc_id, []).append(r)
    return out


def test_short_doc_single_chunk(spark):
    ch = _chunks(spark, ["a b c"])[0]
    assert len(ch) == 1
    assert ch[0].chunk_text == "a b c" and ch[0].n_chunk_tokens == 3
    assert ch[0].chunk_start == 1 and ch[0].chunk_id == 0


def test_exact_window_no_trailing_chunk(spark):
    # exactly chunk_tokens tokens -> one chunk, no redundant tail
    ch = _chunks(spark, [" ".join(f"t{i}" for i in range(8))])[0]
    assert len(ch) == 1


def test_overlap_and_stride(spark):
    words = [f"t{i}" for i in range(20)]
    ch = _chunks(spark, [" ".join(words)])[0]  # stride 6: starts 1,7,13
    assert [c.chunk_start for c in ch] == [1, 7, 13]
    assert ch[0].chunk_text.split(" ") == words[0:8]
    assert ch[1].chunk_text.split(" ") == words[6:14]
    assert ch[2].chunk_text.split(" ") == words[12:20]
    # consecutive chunks share exactly `overlap` tokens
    assert ch[0].chunk_text.split(" ")[-2:] == ch[1].chunk_text.split(" ")[:2]


def test_every_token_is_covered(spark):
    words = [f"t{i}" for i in range(53)]
    ch = _chunks(spark, [" ".join(words)])[0]
    covered = set()
    for c in ch:
        covered.update(range(c.chunk_start, c.chunk_start + c.n_chunk_tokens))
    assert covered == set(range(1, 54))


def test_no_fully_contained_trailing_window(spark):
    # 9 tokens, chunk 8, overlap 2, stride 6: start 7 covers 7..9 (new
    # tokens); start 13 would be past the end and must not appear
    ch = _chunks(spark, [" ".join(f"t{i}" for i in range(9))])[0]
    assert [c.chunk_start for c in ch] == [1, 7]
    assert ch[1].n_chunk_tokens == 3


def test_pack_chunks_concat_and_split(spark):
    """Packing contract: offsets are the exclusive running total in
    order, bins cut every `budget` tokens, zero waste (next offset ==
    previous offset + previous length)."""
    from ecommerce_dataengineering_project_spark.operators.text import pack_chunks

    rows = [(0, i, (i % 5) + 1) for i in range(40)]  # one shard, varied lengths
    df = spark.createDataFrame(rows, "shard int, pos int, n_tok long")
    out = sorted(
        pack_chunks(df, "shard", ["pos"], "n_tok", budget=10).collect(),
        key=lambda r: r.pos,
    )
    expect_off = 0
    for r in out:
        assert r.token_offset == expect_off
        assert r.bin_id == expect_off // 10
        assert r.bin_offset == expect_off % 10
        expect_off += r.n_tok


def test_pack_chunks_bins_are_local_to_shard(spark):
    from ecommerce_dataengineering_project_spark.operators.text import pack_chunks

    rows = [(s, i, 4) for s in (0, 1) for i in range(6)]
    df = spark.createDataFrame(rows, "shard int, pos int, n_tok long")
    out = pack_chunks(df, "shard", ["pos"], "n_tok", budget=8).collect()
    for s in (0, 1):  # each shard restarts at offset 0
        offs = sorted(r.token_offset for r in out if r.shard == s)
        assert offs == [0, 4, 8, 12, 16, 20]


def test_chunking_matches_duckdb_on_edge_texts(spark):
    """Cross-engine parity on texts the fixture never exercises:
    empty string, double spaces, leading/trailing space, single token,
    exact window sizes — Spark split vs DuckDB STRING_SPLIT must agree
    everywhere the oracle claims they do."""
    import duckdb

    from ecommerce_dataengineering_project_spark.queries.ext_text import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        _CHUNK_STRIDE,
    )

    texts = [
        "",
        "a",
        "a  b",
        " a b ",
        "x " * 31 + "x",  # exactly chunk_tokens tokens
        "x " * 32 + "x",  # one past
        " ".join(f"t{i}" for i in range(100)),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from ecommerce_dataengineering_project_spark.operators.text import chunk_documents

    got = {
        (r.doc_id, r.chunk_id, r.chunk_start, r.chunk_text, r.n_chunk_tokens)
        for r in chunk_documents(
            df, chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", list(enumerate(texts)))
    want = set(
        con.sql(
            f"""
            WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM d),
            s AS (
                SELECT doc_id, toks,
                       UNNEST(RANGE(1, GREATEST(LEN(toks) - {CHUNK_OVERLAP}, 1) + 1,
                                    {_CHUNK_STRIDE})) AS chunk_start
                FROM t
            )
            SELECT doc_id,
                   CAST((chunk_start - 1) // {_CHUNK_STRIDE} AS INTEGER),
                   CAST(chunk_start AS INTEGER),
                   ARRAY_TO_STRING(toks[chunk_start : chunk_start + {CHUNK_TOKENS} - 1], ' '),
                   CAST(LEN(toks[chunk_start : chunk_start + {CHUNK_TOKENS} - 1]) AS BIGINT)
            FROM s
            """
        ).fetchall()
    )
    assert got == want


def test_scrub_pii_edges(spark):
    from ecommerce_dataengineering_project_spark.operators.text import scrub_pii

    texts = [
        "no pii here",
        "two mails a@b.co and c.d+x@e-f.org!",
        "call 555-201-0123 or 555.201.0124.",
        "ssn 123-45-6789 end",
        "digits 1234-56-7890 must not match ssn",  # \b fails inside digit run
        "paren (555) 201-0042 and (555)201-0043 and spaced 555 201 0044",
        "not a phone: 1234-567-8901 or 12345678901",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert (rows[0].n_email, rows[0].n_phone, rows[0].n_ssn) == (0, 0, 0)
    assert rows[0].clean_text == "no pii here"
    assert rows[1].n_email == 2
    assert rows[1].clean_text == "two mails [EMAIL] and [EMAIL]!"
    assert rows[2].n_phone == 2
    assert rows[2].clean_text == "call [PHONE] or [PHONE]."
    assert rows[3].n_ssn == 1 and "[SSN]" in rows[3].clean_text
    assert rows[4].n_ssn == 0 and rows[4].clean_text == texts[4]
    assert rows[5].n_phone == 3
    assert rows[5].clean_text == "paren [PHONE] and [PHONE] and spaced [PHONE]"
    assert rows[6].n_phone == 0 and rows[6].clean_text == texts[6]


def test_scrub_pii_overlapping_span_counted_once(spark):
    """A span matched by two patterns (phone digits inside an email
    localpart) attributes to exactly ONE kind — the one that redacted
    it — so sum(n_*) equals the number of redactions."""
    from ecommerce_dataengineering_project_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(0, "mail 555-201-0123@example.com ok")], "doc_id long, text string"
    )
    r = scrub_pii(df).collect()[0]
    assert (r.n_email, r.n_phone, r.n_ssn) == (1, 0, 0)
    assert r.clean_text == "mail [EMAIL] ok"


def test_ngram_repetition_short_and_empty_docs(spark):
    """Docs with fewer than n tokens emit no grams (and drop out),
    matching the oracle's empty GENERATE_SERIES — they must not
    crash Spark's descending sequence(1, 0)."""
    from ecommerce_dataengineering_project_spark.operators.text import ngram_repetition

    df = spark.createDataFrame(
        [(0, ""), (1, "solo"), (2, "a b a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in ngram_repetition(df, n=2).collect()}
    assert set(rows) == {2}
    assert rows[2].n_grams == 3  # 'a b', 'b a', 'a b'
    assert rows[2].distinct_grams == 2
    assert rows[2].dup_gram_ratio == round(2 / 3, 6)


def test_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(AssertionError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_decontaminate_flags_shared_trigrams(spark):
    from ecommerce_dataengineering_project_spark.operators.text import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),      # shares "the quick brown"
            (2, "totally novel words only here now"),   # clean
            (3, "short doc"),                           # < 3 tokens: no grams
            (4, "the quick brown the quick brown"),     # repeated hit instances
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "answer: the quick brown fox")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in decontaminate(corpus, bench, n=3).collect()}
    assert 3 not in rows  # short docs emit no grams and drop out
    r1 = rows[1]
    # doc 1 grams: 4; hits: "the quick brown", "quick brown fox"
    assert (r1.n_grams, r1.n_contaminated, r1.distinct_contaminated) == (4, 2, 2)
    assert r1.is_contaminated is True
    r2 = rows[2]
    assert (r2.n_contaminated, r2.is_contaminated) == (0, False)
    r4 = rows[4]
    # "the quick brown" appears twice (positions 1 and 4) -> 2 instance
    # hits but 1 distinct contaminated gram
    assert (r4.n_grams, r4.n_contaminated, r4.distinct_contaminated) == (4, 2, 1)


def test_decontaminate_empty_benchmark_keeps_all_clean(spark):
    from ecommerce_dataengineering_project_spark.operators.text import decontaminate

    corpus = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([], "doc_id long, text string")
    r = decontaminate(corpus, bench, n=3).collect()[0]
    assert (r.n_grams, r.n_contaminated, r.is_contaminated) == (2, 0, False)


def test_udtf_chunker_matches_builtin(spark):
    """The §2j UDTF twin is row-for-row identical to the built-in
    map-only chunker (shared oracle depends on this)."""
    from ecommerce_dataengineering_project_spark.operators.text import (
        chunk_documents,
        chunk_documents_udtf,
    )

    texts = [
        "a",  # short doc: single clamped chunk
        " ".join(f"w{i}" for i in range(8)),  # exact boundary
        " ".join(f"w{i}" for i in range(23)),  # ragged tail
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cols = ("doc_id", "chunk_id", "chunk_start", "chunk_text", "n_chunk_tokens")
    builtin = {
        tuple(r[c] for c in cols)
        for r in chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    }
    via_udtf = {
        tuple(r[c] for c in cols)
        for r in chunk_documents_udtf(df, chunk_tokens=8, overlap=2).collect()
    }
    assert via_udtf == builtin
