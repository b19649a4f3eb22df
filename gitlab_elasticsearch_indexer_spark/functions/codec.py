"""Posting-block codecs: docID-delta + LEB128 varint, and FOR
(frame-of-reference) fixed-width bit-packing — both numpy-vectorized.

The reference delegates this to Lucene (FOR/vInt block postings with skip
data and block-max metadata — driven by the mapping's per-field
``index_options``, elastic/index.go:115-119,188-191).  This module is our
from-scratch equivalent: encode/decode whole uint64 arrays without
per-element Python loops, so the applyInPandas posting builder and the
query-time block reader stay Arrow/numpy-speed.

Layout per block (BLOCK_SIZE=128 postings, like Lucene):
- ``docids_enc``: encoded deltas where delta[0]=docid[0]-base, rest adjacent
  diffs (strictly positive — docids are unique and sorted).
- ``tfs_enc``:    encoded tf values.
Block metadata (first/max docid = skip pointers, max_tf, max_tfn = block-max
score bound) lives in sibling columns of the segments table (schemas.py).

Self-describing payloads: the first byte tags the codec —
``0x00`` LEB128 varint stream, ``0x01`` FOR bit-packing
(u8 width | u32 count | little-endian packed words).  The encoder picks FOR
when the block's max value fits ≤32 bits (docid deltas within an 8192-doc
range need ≤13; tfs are small), else falls back to varint — so decode never
needs out-of-band configuration, mirroring Lucene's per-block FOR/vInt
switching.  Exception-patching (PForDelta proper) is intentionally omitted:
with delta+range-bounded blocks the width is already tight, and a single
wide block falls back to varint.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # enough for uint64

TAG_VARINT = 0x00
TAG_FOR = 0x01
_FOR_MAX_WIDTH = 32  # wider values → varint fallback (shift safety + rarity


def _bit_width(max_value: int) -> int:
    return max(int(max_value).bit_length(), 1)


def for_pack(values: np.ndarray, width: int) -> bytes:
    """Fixed-width little-endian bit-packing, vectorized (width ≤ 32)."""
    values = np.asarray(values, dtype=np.uint64)
    n = values.size
    total_bits = n * width
    n_bytes = (total_bits + 7) // 8
    buf = np.zeros(n_bytes + 8, dtype=np.uint8)  # slack for last shifts
    offsets = np.arange(n, dtype=np.int64) * width
    byte_idx = offsets >> 3
    shifts = (offsets & 7).astype(np.uint64)
    shifted = values << shifts  # ≤ 32+7 bits, safe in uint64
    for b in range((width + 7 + 7) // 8 + 1):
        chunk = ((shifted >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)
        np.add.at(buf, byte_idx + b, chunk)  # disjoint bits per byte → OR==ADD
    return buf[:n_bytes].tobytes()


def for_unpack(buf: bytes, n: int, width: int) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    padded = np.zeros(b.size + 8, dtype=np.uint8)
    padded[: b.size] = b
    offsets = np.arange(n, dtype=np.int64) * width
    byte_idx = offsets >> 3
    shifts = (offsets & 7).astype(np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    for i in range((width + 7 + 7) // 8 + 1):
        acc |= padded[byte_idx + i].astype(np.uint64) << np.uint64(8 * i)
    acc >>= shifts
    mask = np.uint64((1 << width) - 1)
    return acc & mask


def block_encode(values: np.ndarray) -> bytes:
    """Tagged block encoding: FOR when the max fits ≤32 bits, else varint."""
    values = np.asarray(values, dtype=np.uint64)
    if values.size == 0:
        return bytes([TAG_VARINT])
    width = _bit_width(int(values.max()))
    if width <= _FOR_MAX_WIDTH:
        header = bytes([TAG_FOR, width]) + np.uint32(values.size).tobytes()
        return header + for_pack(values, width)
    return bytes([TAG_VARINT]) + varint_encode(values)


def block_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    tag = buf[0]
    if tag == TAG_FOR:
        width = buf[1]
        n = int(np.frombuffer(buf[2:6], dtype=np.uint32)[0])
        out = for_unpack(buf[6:], n, width)
    elif tag == TAG_VARINT:
        out = varint_decode(buf[1:])
    else:
        raise ValueError(f"unknown codec tag {tag}")
    if count is not None and out.size != count:
        raise ValueError(f"decoded {out.size} values, expected {count}")
    return out


def varint_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128: uint64 array -> bytes."""
    values = np.asarray(values, dtype=np.uint64)
    if values.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1 — computed by a
    # vectorized shift loop (≤10 iterations for uint64)
    widths = np.ones(values.shape, dtype=np.int64)
    v = values.copy()
    v >>= np.uint64(7)
    while np.any(v > 0):
        widths += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
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
    """Sorted unique docids -> delta + tagged block bytes (delta[0] relative
    to base)."""
    docids = np.asarray(docids, dtype=np.int64)
    deltas = np.diff(docids, prepend=np.int64(base))
    if deltas.size and deltas.min() < 0:
        raise ValueError("docids must be sorted ascending and >= base")
    return block_encode(deltas.astype(np.uint64))


def decode_docids(buf: bytes, base: int = 0, count: int | None = None) -> np.ndarray:
    deltas = block_decode(buf, count).astype(np.int64)
    if deltas.size == 0:
        return deltas
    out = np.cumsum(deltas)
    out += base
    return out


def encode_tfs(tfs: np.ndarray) -> bytes:
    return block_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, count: int | None = None) -> np.ndarray:
    return block_decode(buf, count).astype(np.int64)


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


def encode_offsets(offset_lists: list[tuple[np.ndarray, np.ndarray]]) -> bytes:
    """Offsets payload (index_options=offsets, §1.4 — the reference stores
    docs+freqs+positions+offsets on project-level fields,
    elastic/index.go:208-218): per posting varint(n) + delta-coded start
    offsets + (end-start) lengths."""
    parts: list[np.ndarray] = []
    for starts, ends in offset_lists:
        starts = np.asarray(starts, dtype=np.int64)
        ends = np.asarray(ends, dtype=np.int64)
        deltas = np.diff(starts, prepend=np.int64(0))
        lens = ends - starts
        parts.append(
            np.concatenate(([starts.size], deltas, lens)).astype(np.uint64)
        )
    if not parts:
        return b""
    return varint_encode(np.concatenate(parts))


def encode_positions_block(
    poss: np.ndarray, occ_start: np.ndarray, occ_end: np.ndarray
) -> bytes:
    """Byte-identical twin of ``encode_positions`` over FLAT arrays.

    ``poss`` holds every occurrence's position for a partition; posting ``i``
    of this block spans ``poss[occ_start[i]:occ_end[i]]``, postings
    contiguous (``occ_end[i] == occ_start[i+1]``).  The per-posting list
    version costs one numpy slice + diff + concatenate PER POSTING — tens of
    millions of tiny-array calls on a positions-enabled build; this one does
    a single vectorized delta over the block's whole occurrence span and one
    ``np.insert`` for the per-posting counts."""
    counts = (occ_end - occ_start).astype(np.int64)
    if counts.size == 0:
        return b""
    a0, a1 = int(occ_start[0]), int(occ_end[-1])
    seg = poss[a0:a1].astype(np.int64, copy=True)
    rel = (occ_start - a0).astype(np.int64)
    seg[1:] -= poss[a0 : a1 - 1]  # in-posting deltas...
    seg[rel] = poss[occ_start]    # ...first of each posting absolute (delta vs 0)
    flat = np.insert(seg, rel, counts)
    return varint_encode(flat.astype(np.uint64))


def encode_offsets_block(
    starts_flat: np.ndarray,
    ends_flat: np.ndarray,
    occ_start: np.ndarray,
    occ_end: np.ndarray,
) -> bytes:
    """Byte-identical twin of ``encode_offsets`` over FLAT arrays (see
    ``encode_positions_block``).  Layout per posting: varint(n) +
    delta-coded starts + (end-start) lengths — two variable-size sections
    per posting, so the interleave is a vectorized scatter instead of
    ``np.insert``."""
    counts = (occ_end - occ_start).astype(np.int64)
    if counts.size == 0:
        return b""
    a0, a1 = int(occ_start[0]), int(occ_end[-1])
    n_occ = a1 - a0
    sdelta = starts_flat[a0:a1].astype(np.int64, copy=True)
    rel = (occ_start - a0).astype(np.int64)
    sdelta[1:] -= starts_flat[a0 : a1 - 1]
    sdelta[rel] = starts_flat[occ_start]
    lens = ends_flat[a0:a1].astype(np.int64) - starts_flat[a0:a1]

    base = np.cumsum(1 + 2 * counts) - (1 + 2 * counts)  # out idx of each n
    rep_base = np.repeat(base, counts)
    rep_counts = np.repeat(counts, counts)
    # occurrence's index within its posting
    k = np.arange(n_occ, dtype=np.int64) - np.repeat(rel, counts)
    out = np.empty(n_occ * 2 + counts.size, dtype=np.int64)
    out[base] = counts
    out[rep_base + 1 + k] = sdelta
    out[rep_base + 1 + rep_counts + k] = lens
    return varint_encode(out.astype(np.uint64))


def decode_offsets(buf: bytes, n_postings: int) -> list[tuple[np.ndarray, np.ndarray]]:
    flat = varint_decode(buf).astype(np.int64)
    out: list[tuple[np.ndarray, np.ndarray]] = []
    i = 0
    for _ in range(n_postings):
        n = int(flat[i])
        starts = np.cumsum(flat[i + 1 : i + 1 + n])
        lens = flat[i + 1 + n : i + 1 + 2 * n]
        out.append((starts, starts + lens))
        i += 1 + 2 * n
    return out
