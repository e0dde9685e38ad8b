"""Bloom-filter semi-join reduction: shrink a huge probe side BEFORE
its shuffle using a compact bitmap built from the join keys of a
selective (but not broadcast-small) build side.

Scale shape: broadcast hash join needs the build side to fit in every
executor (~100s of MB); shuffle hash / sort-merge pays a full shuffle
of BOTH sides. In between sits the classic semi-join reduction
(Bloom 1970; Bratbergsengen 1984): ship only a bit array of the build
keys (m bits for n keys at false-positive rate p, m = -n*ln(p)/ln(2)^2
— ~6 MB for 10M keys at 3%), filter the probe map-side, and shuffle
only surviving rows. Spark's own runtime row-level filtering
(`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) injects the
same shape automatically when statistics allow; this operator is the
explicit, statistics-independent form (the aggregate function behind
the runtime filter, `bloom_filter_agg`, is not user-invokable).

Correctness contract: a Bloom filter has false positives but NO false
negatives, so `bloom_semi_join(probe, build) JOIN build` equals
`probe JOIN build` exactly — the final equi-join removes the false
positives. That makes every query built on it oracle-checkable with
the plain join as the oracle.

Driver state: the bitmap words are collected (m/64 longs — bounded by
the CHOSEN m, not the data) and re-enter the plan as an array literal
bound EXACTLY ONCE: the k membership checks run as a `forall` over the
k-element positions array, so plan size is O(m/64 + k), not O(k * m/64)
(the r6 shape inlined the literal once per hash function — a ~2 MB
predicate at m=2^19, k=12). Probing stays JVM-side: xxhash64 + shift +
mask per hash function, no Python, no UDF, no broadcast variable.
Boundary: past m ≈ 2^27 the single literal (~16 MB of SQL text) stops
being plan-friendly. ``bloom_semi_join`` ENFORCES the boundary
(``max_bits``, default 2^24): above it the reduction falls back to an
exact left-semi join instead of building the giant literal, and the
right lever at that scale is Spark's runtime filter
(`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) or a
key-range-partitioned filter.
"""

from __future__ import annotations

import math
from functools import reduce as _reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fpp: float = 0.03) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at false-positive rate
    ``fpp``; m is rounded up to a power of two so positions come from a
    single AND-mask (and the modulo bias of `% m` disappears)."""
    if n_keys <= 0:
        return 64, 1
    m = -n_keys * math.log(fpp) / (math.log(2) ** 2)
    m_bits = 1 << max(6, math.ceil(math.log2(m)))
    k = max(1, round(m_bits / n_keys * math.log(2)))
    return m_bits, min(k, 16)


def _pos_sql(key_sql: str, i: int, m_bits: int) -> str:
    """SQL for the i-th bit position of a key: xxhash64(key, i) masked
    to m. The EXACT same expression builds and probes, which is what
    guarantees no false negatives; xxhash64 of (key, i) is the seeded
    family — Spark hashes the tuple, so each i is an independent
    function. m is a power of two: AND, not modulo (sign-safe too)."""
    return f"(xxhash64({key_sql}, {i}) & {m_bits - 1})"


def bloom_build(build: DataFrame, key_col: str, m_bits: int, k: int) -> list[int]:
    """Aggregate the build side's keys into bitmap words: per key and
    hash function, one (word_index, bit_mask) pair; bit_or per word.
    One exchange over at most m/64 distinct word keys (map-side
    combined), then a bounded collect of at most m/64 rows."""
    pos_arr = ", ".join(_pos_sql(f"`{key_col}`", i, m_bits) for i in range(1, k + 1))
    words = (
        build.select(F.explode(F.expr(f"array({pos_arr})")).alias("p"))
        .selectExpr(
            "CAST(shiftright(p, 6) AS INT) AS w",
            "shiftleft(1L, CAST(p & 63 AS INT)) AS m",
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r.w] = r.bits
    return out


def might_contain(key_col: str, words: list[int], m_bits: int, k: int) -> Column:
    """JVM-side membership test against the collected bitmap: all k
    bits set. The words array is a plan literal bound ONCE — the k
    checks run as ``forall`` over the k-element positions array, so the
    expression is O(m/64 + k) in plan size, sub-linear in k (pinned by
    tests/test_scale_levers.py::test_bloom_probe_plan_sublinear_in_k).
    ``key_col`` must be a column name (the positions use the same
    ``_pos_sql`` arithmetic as the build, which is what guarantees no
    false negatives)."""
    warr = "array(" + ", ".join(f"{w}L" for w in words) + ")"
    pos_arr = ", ".join(_pos_sql(f"`{key_col}`", i, m_bits) for i in range(1, k + 1))
    return F.expr(
        f"forall(array({pos_arr}), p -> "
        f"(shiftright(element_at({warr}, CAST(shiftright(p, 6) AS INT) + 1), "
        f"CAST(p & 63 AS INT)) & 1) = 1)"
    )


# Past this bitmap size the single plan literal stops being friendly
# (2^24 bits = 2 MB of array text; the hard wall is ~2^27 ≈ 16 MB of
# SQL). Above it the reduction falls back to an exact left-semi join —
# same no-false-negative contract, and Spark's own runtime bloom filter
# (spark.sql.optimizer.runtimeFilter.bloomFilter.enabled) can inject
# the map-side reduction when statistics allow.
MAX_LITERAL_BITS = 1 << 24


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    fpp: float = 0.03,
    n_keys: int | None = None,
    max_bits: int = MAX_LITERAL_BITS,
) -> DataFrame:
    """Probe rows whose key MIGHT be in build (no false negatives).
    Follow with the real join for exact semantics — the bloom's job is
    only to cut the probe's shuffle volume map-side.

    ``n_keys`` sizes the filter; when omitted it is counted from the
    build side (one extra job over the already-small build relation).

    Size gate: when the sized bitmap exceeds ``max_bits`` (default
    2^24), the literal-bitmap plan is no longer viable — the reduction
    degrades to an exact left-semi join on the distinct build keys
    (a strict subset of the bloom's keep set, so the contract that a
    following equi-join yields identical results is preserved). This
    mirrors the all-pairs size gate in
    operators/dedup.embedding_near_dup_pairs.
    """
    if n_keys is None:
        n_keys = build.select(build_key).distinct().count()
    m_bits, k = bloom_params(n_keys, fpp)
    if m_bits > max_bits:
        keys = build.select(F.col(build_key).alias("__bloom_gate_key")).distinct()
        return probe.join(
            keys, probe[probe_key] == keys["__bloom_gate_key"], "left_semi"
        )
    words = bloom_build(build, build_key, m_bits, k)
    return probe.where(might_contain(probe_key, words, m_bits, k))
