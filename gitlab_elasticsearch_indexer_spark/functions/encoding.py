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
    # the EUC-JP family must outrank gb18030 (gb18030 strict-decodes nearly
    # any 0xA1-0xFE run at zero chaos, so a tie means "gb18030 ate it"), but
    # shift_jis_2004 must NOT — real GB18030 text ties with shift_jis_2004
    # at (0, 0) and the GB reading is the likelier truth there.
    "euc_jis_2004": 2, "euc_jp": 2,
    "gb18030": 3,
    "big5": 4,
    "cp949": 5, "euc_kr": 5,
    "shift_jis_2004": 6,
    "cp1252": 7, "latin_1": 8,
    # single-byte script codepages: script-specific pages rank before the
    # Cyrillic ones because charset_normalizer proposes cp1251 for almost
    # any high-byte run (its Cyrillic model is the loosest), so at equal
    # (chaos, coherence) the specific page is the likelier truth.  ICU
    # resolves the same tie with per-encoding language models — divergences
    # beyond this ordering are listed in SCALE.md known-limits.
    "cp1255": 9,   # Hebrew
    "cp1256": 10,  # Arabic
    "cp874": 11,   # Thai
    "cp1253": 12,  # Greek
    "cp1250": 13,  # Central European
    "cp1251": 14, "koi8_r": 15, "iso8859_5": 16, "iso8859_7": 17,
}

# ISO-2022-JP announces itself with an escape sequence (ESC $ B / ESC $ @ /
# ESC ( J) — ICU detects it structurally, not statistically
# (indexer/encoding.go:56-80 candidate list includes it).  The scan must run
# BEFORE the strict-UTF-8 fast path: ISO-2022-JP is pure 7-bit ASCII, so a
# UTF-8 decode "succeeds" and would return the raw escape soup as text.
_ISO2022_JP_MARKS = (b"\x1b$B", b"\x1b$@", b"\x1b(J")


def _looks_cp1255(data: bytes) -> bool:
    """Hebrew (windows-1255) pre-check.  charset_normalizer ships no Hebrew
    model, so cp1255 pages otherwise decode as Cyrillic mojibake (its
    cp1251 reading scores coherence ~0.6 — HIGHER than real Latin text —
    so no candidate re-ranking can recover an absent candidate).  ICU's
    detector has the Hebrew model (indexer/encoding.go:50-80); this byte
    heuristic restores that case:

    - ≥90% of high bytes in 0xE0–0xFA (the cp1255 Hebrew consonants א-ת) —
      rejects Arabic cp1256 (0.35 here) and, jointly with strict decode,
      Greek/Cyrillic pages;
    - almost no ASCII letters — rejects Latin-script pages with sprinkled
      accents (café), whose accented bytes also land in 0xE0–0xFA;
    - strict cp1255 decode (checked by the caller) — cp1255's undefined
      positions reject cp1253/cp1251/koi8 byte distributions.

    Divergence, documented: niqqud-pointed text (0xC0–0xCF) and
    mixed-Hebrew/Latin pages fall back to the statistical chain.
    """
    hi = [b for b in data if b >= 0x80]
    if len(hi) < 8:
        return False
    hebrew = sum(1 for b in hi if 0xE0 <= b <= 0xFA)
    if hebrew / len(hi) < 0.9:
        return False
    ascii_letters = sum(
        1 for b in data if 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A
    )
    return ascii_letters <= 0.1 * (ascii_letters + len(hi))


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
    if b"\x1b" in data and any(m in data for m in _ISO2022_JP_MARKS):
        try:
            return data.decode("iso2022_jp", errors="strict")
        except (UnicodeDecodeError, LookupError):
            pass
    try:
        return data.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        pass
    if _looks_cp1255(data):
        try:
            return data.decode("cp1255", errors="strict")
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
    import pyarrow.compute as pc

    try:
        arr = pa.array(blobs, type=pa.binary())
        utf8 = arr.cast(pa.string())  # validates UTF-8 for the entire batch
        s = utf8.to_pandas()
        s.index = blobs.index
        s = s.fillna("").astype(object)
        # ISO-2022-JP is valid 7-bit ASCII, so it passes the UTF-8 cast as
        # escape soup; one C-speed substring scan finds the rare offenders
        # and re-routes just those rows through the structural decoder.
        esc = pc.match_substring(utf8, "\x1b").to_pandas().fillna(False)
        if esc.any():
            esc.index = blobs.index
            fix = blobs[esc].map(try_encode_bytes)
            s.loc[fix.index] = fix
        return s
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        pass
    out = [try_encode_bytes(data) for data in blobs]
    return pd.Series(out, index=blobs.index, dtype=object)
