"""Arrow pandas UDFs wrapping the pure functions — the ONLY place Python
touches row data, always via Arrow batches (no row-at-a-time Python anywhere,
per BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import analysis, encoding


@F.pandas_udf(T.BooleanType())
def detect_binary_udf(prefix: pd.Series) -> pd.Series:
    """NUL sniff.  Feed it ``substring(html, 1, 8192)`` so only the sniff
    window crosses Arrow (SURVEY.md O3 prefix short-circuit)."""
    return encoding.detect_binary_series(prefix)


@F.pandas_udf(T.StringType())
def transcode_udf(html: pd.Series) -> pd.Series:
    """bytes -> UTF-8 text (reference indexer/encoding.go chain)."""
    return encoding.try_encode_series(html)


@F.pandas_udf(T.StringType())
def detect_lang_udf(texts: pd.Series) -> pd.Series:
    """Content-based language ID (enry analog, reference
    indexer/blob.go:116-127) — script gates + trigram profiles.  Callers
    null-gate the input JVM-side (``when(lang_missing, content)``) so only
    rows that actually need detection cross Arrow."""
    from ..operators.langid import detect_language

    return texts.map(lambda t: detect_language(t)[0] if t else None)


def make_offsets_tokenizer_udf(analyzer: str):
    """Offset-aware tokenizer: ArrayType(Struct(term, start, end)) pandas
    UDF for chains supporting index_options=offsets (simple, default)."""
    fn = analysis.OFFSET_ANALYZERS[analyzer]
    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("term", T.StringType()),
                T.StructField("start", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
            ]
        )
    )

    @F.pandas_udf(schema)
    def tokenize_offsets_udf(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(fn)

    return tokenize_offsets_udf


def make_tokenizer_udf(analyzer: str):
    """Tokenizer chain as ArrayType(StringType) pandas UDF.

    The 'simple' analyzer short-circuits to None: callers use the pure-JVM
    ``split(lower(col),'[^a-z0-9]+')`` expression instead (whole-stage
    codegen, zero Python)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return analysis.tokenize_series(texts, analyzer)

    return tokenize_udf
