"""Binary detection + charset transcoding (reference indexer/encoding.go,
indexer/blob.go:129-139) as vectorized pandas functions.

The reference uses the ICU charset detector: guess candidate charsets in
confidence order, convert with the first that succeeds, and on total failure
fall back to the raw string (encoding.go:29-48,56-80).  PyICU is not
available here, so the chain is:

1. strict UTF-8 decode (the overwhelmingly common case — zero-copy fast path)
2. ``charset_normalizer`` best-guess (confidence-ordered, like ICU) for
   inputs long enough for statistical detection (≥ 8 bytes)
3. a fixed candidate list (shift_jis, gb18030, big5, latin-1) — ordered so
   each earlier codec strictly rejects the later goldens (gb18030 accepts
   almost any byte string, so it must come after shift_jis); latin-1 never
   fails, mirroring the reference's "return raw string" fallback.

Golden contract: GB18030 bytes of ``"狞\\n"`` and SHIFT_JIS sample text must
round-trip byte-identically (reference integration_test.go:268-295) — see
tests/test_encoding.py.
"""

from __future__ import annotations

import pandas as pd

from ..config import BINARY_SNIFF_LIMIT

try:  # optional, confidence-ordered detection like the reference's ICU
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover
    _cn_from_bytes = None

_FALLBACK_CHARSETS = ("shift_jis", "gb18030", "big5", "latin-1")
_MIN_DETECT_BYTES = 8

# ICU-like candidate ordering over charset_normalizer's match list: its
# best() picks the FIRST of several equal-confidence candidates, which
# misassigns e.g. long gb18030 text to cp949 and latin-1 French to cp1250.
# Re-rank by (chaos asc, coherence desc, preferred-codec priority) — the
# priority encodes the same "try in plausibility order" the reference's ICU
# detector applies (indexer/encoding.go:56-80).  Verified against an
# 8-encoding golden corpus in tests/test_functions.py.
_CODEC_PRIORITY = {
    "utf_8": 0,
    "cp932": 1, "shift_jis": 1,
    "gb18030": 2,
    "big5": 3,
    "cp949": 4, "euc_kr": 4,
    "shift_jis_2004": 5, "euc_jis_2004": 5,
    "cp1252": 6, "latin_1": 7, "cp1251": 8, "koi8_r": 9,
}


def _pick_candidate(matches):
    ranked = sorted(
        matches,
        key=lambda m: (
            round(m.chaos, 2),
            -round(m.coherence, 2),
            _CODEC_PRIORITY.get(m.encoding, 50),
        ),
    )
    return ranked[0] if ranked else None


def detect_binary(data: bytes | None) -> bool:
    """NUL byte within the first 8 KiB ⇒ binary (indexer/blob.go:20,132-139;
    same heuristic as git)."""
    if data is None:
        return False
    return b"\x00" in data[:BINARY_SNIFF_LIMIT]


def try_encode_bytes(data: bytes | None) -> str:
    """Best-effort conversion to UTF-8 (indexer/encoding.go:40-48,56-80)."""
    if data is None or len(data) == 0:
        return ""
    try:
        return data.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        pass
    if _cn_from_bytes is not None and len(data) >= _MIN_DETECT_BYTES:
        best = _pick_candidate(list(_cn_from_bytes(data)))
        if best is not None:
            return str(best)
    for charset in _FALLBACK_CHARSETS:
        try:
            return data.decode(charset, errors="strict")
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", errors="replace")  # unreachable (latin-1 total)


def detect_binary_series(blobs: pd.Series) -> pd.Series:
    """Series[bytes] -> Series[bool].  Vectorization note: callers should
    pre-truncate with ``substr(html, 1, 8192)`` Spark-side so only the sniff
    window crosses Arrow (SURVEY.md O3)."""
    return blobs.map(detect_binary).astype(bool)


def try_encode_series(blobs: pd.Series) -> pd.Series:
    """Series[bytes] -> Series[str] UTF-8 text.  Fast path: ONE vectorized
    strict-UTF-8 validation over the whole Arrow batch (C-speed
    binary→string cast); the per-row detection chain runs only for batches
    that actually contain non-UTF-8 rows — i.e. almost never on a real
    webtext corpus."""
    import pyarrow as pa

    try:
        arr = pa.array(blobs, type=pa.binary())
        utf8 = arr.cast(pa.string())  # validates UTF-8 for the entire batch
        s = utf8.to_pandas()
        s.index = blobs.index
        return s.fillna("").astype(object)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        pass
    out = [try_encode_bytes(data) for data in blobs]
    return pd.Series(out, index=blobs.index, dtype=object)
