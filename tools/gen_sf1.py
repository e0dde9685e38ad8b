"""Generate a deterministic sf1 fixture decade by extrapolating the
driver's read-only sf0.1 tables 10x — the second decade SCALE.md's
table needs (VERDICT r10 item 5). Writes under the repo's gitignored
.tmp (never into /root/testdata, which is read-only).

Extrapolation rules, chosen so each operator family's WORKLOAD scales
the way a real 10x corpus would:

- region/nation: fixed dimensions, copied (TPC-H semantics).
- customer/supplier/part/orders/lineitem/events: 10 key-shifted tiles;
  every key and foreign key offsets by tile * (sf0.1 cardinality), so
  referential structure is preserved per tile (each order keeps its
  lineitems, each tile's co-purchase graph matches sf0.1's) and key
  cardinality — join/agg/dedup state — grows 10x. Key-embedding names
  (Customer#%09d, Supplier#%09d) are regenerated from the new key.
- documents: tile 0 is the original corpus; tiles 1-9 resample each
  document's text word-by-word from the sf0.1 EMPIRICAL unigram
  distribution (seeded per tile), keeping the original word count,
  lang and source. Marginal token/length/strata stats match; naive
  tiling would instead make 90% of the corpus exact duplicates and
  turn every dedup measurement degenerate.
- embeddings: tile 0 original; tiles 1-9 draw unit vectors with the
  same faint label-centroid signal the originals carry (mean cosine
  to the label centroid ~= 0.07 at sf0.1) — exact copies would make
  ANN/SemDeDup trivially degenerate (9 clones at cosine 1.0 per row).

Deterministic: numpy default_rng seeded per (table, tile). Output
schemas are cast to the source parquet schemas, so load_table and the
oracles treat sf1 exactly like a driver fixture.

Usage: python tools/gen_sf1.py [out_dir]   (default .tmp/testdata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
TILES = 10
# sf0.1 cardinalities = per-tile key strides
STRIDE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 150_000,  # keyed by o_orderkey
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}


def _copy(con, table: str, out: str) -> None:
    con.sql(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO '{out}' (FORMAT PARQUET)")


def _tile_sql(table: str, select: str, key: str) -> str:
    # ORDER BY (t, source key): without the key, intra-tile order comes
    # from DuckDB's parallel scan of the cross join and varies with
    # thread count/run — breaking the regenerate-deterministically
    # contract (row order shifts row-group boundaries and file stats).
    return f"""
        SELECT {select}
        FROM '{SRC}/{table}.parquet', (SELECT UNNEST(range({TILES})) AS t)
        ORDER BY t, {key}
    """


def _write_cast(con, table: str, sql: str, out: str) -> None:
    """Run sql, cast to the SOURCE schema (so dtypes match the driver
    fixture bit-for-bit), write."""
    src_schema = pq.read_schema(f"{SRC}/{table}.parquet")
    got = con.sql(sql).arrow()
    got = got.select(src_schema.names).cast(src_schema)
    pq.write_table(got, out)


def gen_relational(con, out_dir: str) -> None:
    c, s, p, o, e = (
        STRIDE["customer"],
        STRIDE["supplier"],
        STRIDE["part"],
        STRIDE["orders"],
        STRIDE["events"],
    )
    _write_cast(
        con,
        "customer",
        _tile_sql(
            "customer",
            f"c_custkey + t*{c} AS c_custkey, "
            f"printf('Customer#%09d', c_custkey + t*{c}) AS c_name, "
            "c_nationkey, c_acctbal, c_mktsegment",
            "c_custkey",
        ),
        f"{out_dir}/customer.parquet",
    )
    _write_cast(
        con,
        "supplier",
        _tile_sql(
            "supplier",
            f"s_suppkey + t*{s} AS s_suppkey, "
            f"printf('Supplier#%09d', s_suppkey + t*{s}) AS s_name, "
            "s_nationkey, s_acctbal",
            "s_suppkey",
        ),
        f"{out_dir}/supplier.parquet",
    )
    _write_cast(
        con,
        "part",
        _tile_sql(
            "part",
            f"p_partkey + t*{p} AS p_partkey, "
            "p_name, p_brand, p_type, p_size, p_retailprice",
            "p_partkey",
        ),
        f"{out_dir}/part.parquet",
    )
    _write_cast(
        con,
        "orders",
        _tile_sql(
            "orders",
            f"o_orderkey + t*{o} AS o_orderkey, o_custkey + t*{c} AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
            "o_orderkey",
        ),
        f"{out_dir}/orders.parquet",
    )
    _write_cast(
        con,
        "lineitem",
        _tile_sql(
            "lineitem",
            f"l_orderkey + t*{o} AS l_orderkey, l_partkey + t*{p} AS l_partkey, "
            f"l_suppkey + t*{s} AS l_suppkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
            "l_shipdate",
            "l_orderkey, l_linenumber",
        ),
        f"{out_dir}/lineitem.parquet",
    )
    _write_cast(
        con,
        "events",
        _tile_sql(
            "events",
            f"event_id + t*{e} AS event_id, ts, "
            f"user_id + t*{STRIDE['customer'] // 10} AS user_id, "
            "event_type, value, props",
            "event_id",
        ),
        f"{out_dir}/events.parquet",
    )


def gen_documents(con, out_dir: str) -> None:
    rows = con.sql(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # empirical unigram distribution over the whole corpus
    words: list[str] = []
    for _, text, _, _ in rows:
        words.extend(text.split(" "))
    vocab, counts = np.unique(np.array(words), return_counts=True)
    probs = counts / counts.sum()
    stride = STRIDE["documents"]
    out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for tile in range(TILES):
        rng = np.random.default_rng(42_000 + tile)
        for doc_id, text, lang, source in rows:
            if tile == 0:
                new_text = text
            else:
                n_words = text.count(" ") + 1
                new_text = " ".join(rng.choice(vocab, size=n_words, p=probs))
            out["doc_id"].append(doc_id + tile * stride)
            out["text"].append(new_text)
            out["lang"].append(lang)
            out["source"].append(source)
            out["n_chars"].append(len(new_text))
    src_schema = pq.read_schema(f"{SRC}/documents.parquet")
    pq.write_table(
        pa.table(out).select(src_schema.names).cast(src_schema),
        f"{out_dir}/documents.parquet",
    )


def gen_embeddings(con, out_dir: str) -> None:
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    V = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    dim = V.shape[1]
    mu = np.zeros((10, dim))
    for lab in range(10):
        m = V[labels == lab].mean(0)
        mu[lab] = m / np.linalg.norm(m)
    # measured at sf0.1: mean cosine of a vector to its label centroid
    signal = float(np.mean(np.einsum("ij,ij->i", V, mu[labels])))
    stride = STRIDE["embeddings"]
    ids, vecs, labs = [], [], []
    for tile in range(TILES):
        rng = np.random.default_rng(43_000 + tile)
        if tile == 0:
            tv = V
        else:
            g = rng.normal(size=V.shape)
            g /= np.linalg.norm(g, axis=1)[:, None]
            tv = signal * mu[labels] + g
            tv /= np.linalg.norm(tv, axis=1)[:, None]
        ids.extend((np.arange(len(V)) + tile * stride).tolist())
        vecs.extend(tv.astype(np.float32).tolist())
        labs.extend(labels.tolist())
    src_schema = pq.read_schema(f"{SRC}/embeddings.parquet")
    pq.write_table(
        pa.table({"vec_id": ids, "embedding": vecs, "label": labs})
        .select(src_schema.names)
        .cast(src_schema),
        f"{out_dir}/embeddings.parquet",
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".tmp",
        "testdata",
        "sf1",
    )
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    _copy(con, "region", f"{out_dir}/region.parquet")
    _copy(con, "nation", f"{out_dir}/nation.parquet")
    gen_relational(con, out_dir)
    gen_documents(con, out_dir)
    gen_embeddings(con, out_dir)
    for t in STRIDE:
        n = con.sql(f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n}")
    print(f"sf1 fixtures at {out_dir}")


if __name__ == "__main__":
    main()
