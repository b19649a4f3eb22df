"""Posting-block codec: docID-delta + LEB128 varint, numpy-vectorized.

The reference delegates this to Lucene (FOR/vInt block postings with skip
data and block-max metadata — driven by the mapping's per-field
``index_options``, elastic/index.go:115-119,188-191).  This module is our
from-scratch equivalent: encode/decode whole uint64 arrays without
per-element Python loops, so the applyInPandas posting builder and the
query-time block reader stay Arrow/numpy-speed.

Layout per block (BLOCK_SIZE=128 postings, like Lucene):
- ``docids_enc``: varint(delta) where delta[0]=docid[0]-base, rest adjacent
  diffs (strictly positive — docids are unique and sorted).
- ``tfs_enc``:    varint(tf).
Block metadata (first/max docid = skip pointers, max_tf, max_tfn = block-max
score bound) lives in sibling columns of the segments table (schemas.py).
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # enough for uint64


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128: uint64 array -> bytes."""
    values = np.asarray(values, dtype=np.uint64)
    if values.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    nbits = np.zeros(values.shape, dtype=np.int64)
    nz = values > 0
    # bit_length via log2 is unsafe at 2^k boundaries; use frexp-free loop over
    # the 10 possible byte widths instead (still vectorized).
    widths = np.ones(values.shape, dtype=np.int64)
    v = values.copy()
    v >>= np.uint64(7)
    while np.any(v > 0):
        widths += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    del nbits, nz
    offsets = np.concatenate(([0], np.cumsum(widths)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    shifted = values.copy()
    for byte_i in range(int(widths.max())):
        active = widths > byte_i
        pos = offsets[:-1][active] + byte_i
        chunk = (shifted[active] & np.uint64(0x7F)).astype(np.uint8)
        more = widths[active] > (byte_i + 1)
        out[pos] = chunk | (more.astype(np.uint8) << 7)
        shifted[active] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """bytes -> uint64 array, vectorized (no per-value Python loop)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.nonzero(b < 128)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    widths = ends - starts + 1
    n = starts.size
    values = np.zeros(n, dtype=np.uint64)
    for byte_i in range(int(widths.max())):
        active = widths > byte_i
        chunk = (b[starts[active] + byte_i] & np.uint8(0x7F)).astype(np.uint64)
        values[active] |= chunk << np.uint64(7 * byte_i)
    if count is not None and n != count:
        raise ValueError(f"decoded {n} values, expected {count}")
    return values


def encode_docids(docids: np.ndarray, base: int = 0) -> bytes:
    """Sorted unique docids -> delta+varint bytes (delta[0] relative to base)."""
    docids = np.asarray(docids, dtype=np.int64)
    deltas = np.diff(docids, prepend=np.int64(base))
    if deltas.size and deltas.min() < 0:
        raise ValueError("docids must be sorted ascending and >= base")
    return varint_encode(deltas.astype(np.uint64))


def decode_docids(buf: bytes, base: int = 0, count: int | None = None) -> np.ndarray:
    deltas = varint_decode(buf, count).astype(np.int64)
    if deltas.size == 0:
        return deltas
    out = np.cumsum(deltas)
    out += base
    return out


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, count: int | None = None) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int64)


def encode_positions(position_lists: list[np.ndarray]) -> bytes:
    """Optional positions payload (index_options=positions/offsets, §1.4):
    per posting: varint(len) + varint(delta positions)."""
    parts: list[np.ndarray] = []
    for pos in position_lists:
        pos = np.asarray(pos, dtype=np.int64)
        deltas = np.diff(pos, prepend=np.int64(0))
        parts.append(np.concatenate(([pos.size], deltas)).astype(np.uint64))
    if not parts:
        return b""
    return varint_encode(np.concatenate(parts))


def decode_positions(buf: bytes, n_postings: int) -> list[np.ndarray]:
    flat = varint_decode(buf).astype(np.int64)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_postings):
        n = int(flat[i])
        deltas = flat[i + 1 : i + 1 + n]
        out.append(np.cumsum(deltas))
        i += 1 + n
    return out
