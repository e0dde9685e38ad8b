"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression
bit-for-bit.

Why this exists: the transaction log stores per-file Bloom filters
(sources/txlog.py) whose bits are SET by a Spark job using
``xxhash64(col, i)`` — the same JVM-side expression the semi-join
reducer probes with (operators/bloom.py). A reader that wants to prune
files from the LOG ALONE (no engine, no scan — the Delta/Iceberg
planning model) must evaluate membership driver-side, which requires
reproducing Spark's exact hash: XXH64 (Collet's public spec,
github.com/Cyan4973/xxHash) with Spark's per-type input encoding
(``XxHash64Function``): 4-byte path for int/short/byte/date, 8-byte
path for long/timestamp, raw UTF-8 bytes for strings, and multi-arg
chaining where each argument's hash seeds the next (initial seed 42).

Equivalence against the real Spark expression is pinned over random
longs / ints / strings / chained pairs in
tests/test_bloom_index.py::test_xxh64_matches_spark — any drift in
either implementation fails loudly there, never silently as a wrongly
pruned file.

All arithmetic is modulo 2**64 (``_M``); the public functions return
SIGNED 64-bit values, as Spark does.
"""

from __future__ import annotations

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # XxHash64's default seed in Spark


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_int(value: int, seed: int) -> int:
    """Spark ``XxHash64.hashInt``: the 4-byte-tail path (int, short,
    byte, date inputs). ``value`` is the 32-bit two's-complement
    pattern of the input."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _signed(_fmix(h))


def hash_long(value: int, seed: int) -> int:
    """Spark ``XxHash64.hashLong``: the 8-byte-tail path (long,
    timestamp inputs)."""
    seed &= _M
    value &= _M
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl((value * _P2) & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _signed(_fmix(h))


def hash_bytes(data: bytes, seed: int) -> int:
    """Full XXH64 over a byte string — Spark's path for StringType
    (UTF-8 bytes) and BinaryType."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                lane = int.from_bytes(data[i + off : i + off + 8], "little")
                acc = (v1, v2, v3, v4)[v - 1]
                acc = (acc + lane * _P2) & _M
                acc = (_rotl(acc, 31) * _P1) & _M
                if v == 1:
                    v1 = acc
                elif v == 2:
                    v2 = acc
                elif v == 3:
                    v3 = acc
                else:
                    v4 = acc
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k1 = int.from_bytes(data[i : i + 8], "little")
        k1 = (_rotl((k1 * _P2) & _M, 31) * _P1) & _M
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _signed(_fmix(h))


def hash_value(value, logical_type: str, seed: int) -> int:
    """Hash one value the way Spark's ``xxhash64`` hashes a column of
    ``logical_type``: ``"long"`` (also timestamp), ``"int"`` (also
    short/byte/date), or ``"string"``."""
    if logical_type == "long":
        return hash_long(int(value), seed)
    if logical_type == "int":
        return hash_int(int(value), seed)
    if logical_type == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    raise ValueError(f"unsupported bloom key type: {logical_type!r}")


def xxhash64_chain(value, logical_type: str, i: int) -> int:
    """Spark's ``xxhash64(col, i)`` for an INT literal ``i``: the
    expression folds left from seed 42, each argument's hash seeding
    the next — exactly the position family ``operators/bloom.py``
    builds and probes with."""
    return hash_int(i, hash_value(value, logical_type, SPARK_SEED))
