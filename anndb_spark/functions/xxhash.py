"""Pure-Python XXH64 matching Spark's ``xxhash64`` for STRING columns.

Spark's ``F.xxhash64(col)`` on a single string column computes XXH64
(Yann Collet's public spec, https://github.com/Cyan4973/xxHash) with
seed 42 over the UTF-8 bytes and returns it as a SIGNED 64-bit long.
`write_bm25_index` buckets postings by ``pmod(xxhash64(term), B)``;
query-side bucket pruning therefore needs the same hash for a handful
of driver-literal terms.  Computing it here (instead of a one-task
Spark job per query) removes a driver round-trip from every indexed
BM25 call — worth ~0.3-0.5 s of pure scheduling latency per query
batch on a loaded driver (guide §1.2: per-task work only after the
job shape is right; this IS job-shape work, it deletes a job).

Bucket pruning is correctness-load-bearing in the single-probe path
(a wrongly-pruned bucket would silently drop postings), so this
implementation is pinned against Spark's own ``xxhash64`` over random
unicode strings of every length class plus the test-corpus vocabulary
(tests/test_xxhash.py); any implementation bug lands a different
bucket for ~(B-1)/B of strings and fails those tests immediately.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` with ``seed``, as an UNSIGNED 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64_string(s: str, seed: int = 42) -> int:
    """Spark's ``F.xxhash64(string_col)``: XXH64(utf8 bytes, seed) as a
    SIGNED long (two's complement)."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, buckets: int) -> int:
    """``pmod(xxhash64(term), buckets)`` exactly as Spark computes it
    (pmod of the signed hash is always non-negative — Python's ``%``
    with a positive modulus matches)."""
    return spark_xxhash64_string(term) % buckets
