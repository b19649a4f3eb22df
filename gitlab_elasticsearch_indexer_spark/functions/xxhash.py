"""Pure-Python XXH64 matching Spark's ``xxhash64`` (seed 42, UTF-8 bytes
for strings).

Why: term→bucket routing (``pmod(xxhash64(term), N_TERM_BUCKETS)``) is both
a build-time partition column and a query-time pruning key.  Computing the
query terms' buckets driver-side removes one Spark job from EVERY search
(the round-1 implementation collected a one-row-per-term DataFrame just to
learn the buckets).  Parity with the JVM implementation is golden-tested in
tests/test_functions.py (ASCII, empty, accented, CJK inputs).

The xxHash64 algorithm is public (Yann Collet, BSD-2); this is a direct
transcription of the specification.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 of raw bytes → SIGNED 64-bit int (Spark's LongType view)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            lane = int.from_bytes(data[i : i + 8], "little")
            v1 = (_rotl((v1 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            lane = int.from_bytes(data[i + 8 : i + 16], "little")
            v2 = (_rotl((v2 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            lane = int.from_bytes(data[i + 16 : i + 24], "little")
            v3 = (_rotl((v3 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            lane = int.from_bytes(data[i + 24 : i + 32], "little")
            v4 = (_rotl((v4 + lane * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK)) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = (_rotl(h ^ ((_rotl((lane * _P2) & _MASK, 31) * _P1) & _MASK), 27) * _P1 + _P4) & _MASK
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = (_rotl(h ^ ((lane * _P1) & _MASK), 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _MASK), 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark ``xxhash64(string_col)`` twin: XXH64 over the UTF-8 bytes."""
    return xxhash64_bytes(s.encode("utf-8"), seed)


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of ``pmod(xxhash64(term), n_buckets)``."""
    return xxhash64_str(term) % n_buckets
