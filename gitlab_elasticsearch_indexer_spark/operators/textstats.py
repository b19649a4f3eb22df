"""Text-analysis operators for a webtext training pipeline: language ID,
quality scoring, token counting, document fingerprinting.  All pure JVM
column expressions (codegen'd, SQL-reproducible)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .tokenize import SIMPLE_SPLIT_RE

STOPWORDS = ("the", "a", "and", "of", "to")

# tiny per-language marker lists for the n-gram/stopword-vote heuristic
LANG_MARKERS = {
    "en": ("the", "a", "is", "and", "value"),
    "es": ("el", "la", "es", "de", "value"),
    "de": ("der", "die", "das", "und", "wert"),
}


def _toks(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), SIMPLE_SPLIT_RE), lambda x: x != "")


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + alnum-run token count + char count."""
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    return df.select(
        F.col(id_col).cast("long").alias("docid"),
        F.size(ws).cast("long").alias("ws_tokens"),
        F.size(_toks(F.col(text_col))).cast("long").alias("alnum_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


# GPT-2-style pretokenizer pattern, RE2-compatible (no lookaheads): common
# contractions, space-prefixed letter/digit runs, punctuation runs, spaces.
# A real BPE merges within these pretokens; the pretoken count is the
# standard cheap proxy for "token budget" in training-data curation.
# Canonical definition lives in functions/bpe.py so the JVM proxy and the
# merged-BPE path (bpe_merge_token_counts below) split text identically.
from ..functions.bpe import PRETOKEN_PATTERN as BPE_SPLIT_PATTERN  # noqa: E402


def bpe_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, bpe_tokens, chars_per_token) — BPE-ish pretoken count via one
    JVM regexp_extract_all (codegen'd, SQL-reproducible)."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0)
    n = F.size(toks).cast("long")
    return df.select(
        F.col(id_col).cast("long").alias("docid"),
        n.alias("bpe_tokens"),
        F.round(
            F.when(n > 0, F.length(text_col).cast("double") / n).otherwise(0.0), 4
        ).alias("chars_per_token"),
    )


def bpe_merge_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(docid, bpe_tokens, bpe_pretokens, chars_per_token) — REAL merge-loop
    BPE against the packaged merge table (functions/bpe.py), not the pretoken
    proxy.  Arrow-batched ``mapInPandas`` kernel; per-executor memo keyed by
    pretoken makes the amortized per-token cost a dict lookup on Zipfian
    webtext.  Use ``bpe_token_counts`` (pure JVM) when the proxy suffices."""
    import pandas as pd

    cols = df.select(
        F.col(id_col).cast("long").alias("docid"), F.col(text_col).alias("_t")
    )

    # capture the DRIVER's active merge table: executor workers re-import
    # functions/bpe, whose module init loads the PACKAGED table — without
    # this, a driver-side load_merges() (the documented swap-in-a-published-
    # table hook) would silently not reach the Spark path
    from ..functions import bpe as _bpe

    merge_lines = _bpe.dump_lines()
    fingerprint = _bpe.merges_fingerprint()

    def kernel(batches):
        from ..functions import bpe

        if bpe.merges_fingerprint() != fingerprint:
            bpe.load_merges(merge_lines)
        for pdf in batches:
            texts = pdf["_t"].fillna("")  # NULL text counts as 0 tokens,
            # matching the JVM proxy's null tolerance
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "bpe_tokens": texts.map(bpe.count_tokens).astype("int64"),
                    "bpe_pretokens": texts.map(
                        lambda t: len(bpe.pretokenize(t))
                    ).astype("int64"),
                    "n_chars": texts.str.len().astype("int64"),
                }
            )

    out = cols.mapInPandas(
        kernel,
        schema="docid long, bpe_tokens long, bpe_pretokens long, n_chars long",
    )
    n = F.col("bpe_tokens")
    return out.select(
        "docid",
        "bpe_tokens",
        "bpe_pretokens",
        F.round(
            F.when(n > 0, F.col("n_chars").cast("double") / n).otherwise(0.0), 4
        ).alias("chars_per_token"),
    )


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality: alpha-character ratio + non-stopword ratio."""
    toks = _toks(F.col(text_col))
    n_tokens = F.size(toks).cast("long")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("double")
    alpha_ratio = alpha / F.length(text_col).cast("double")
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    stop_ratio = F.when(n_tokens > 0, stop / n_tokens.cast("double")).otherwise(F.lit(0.0))
    quality = F.lit(0.5) * alpha_ratio + F.lit(0.5) * (F.lit(1.0) - stop_ratio)
    return df.select(
        F.col(id_col).cast("long").alias("docid"),
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language guess with a fixed deterministic tie-break
    (en ≥ es ≥ de)."""
    toks = _toks(F.col(text_col))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    pred = (
        F.when((scores["en"] >= scores["es"]) & (scores["en"] >= scores["de"]), "en")
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )
    return df.select(
        F.col(id_col).cast("long").alias("docid"),
        scores["en"].alias("s_en"),
        scores["es"].alias("s_es"),
        scores["de"].alias("s_de"),
        pred.alias("pred_lang"),
    )


def fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """Winnowing-style document fingerprint: minimum md5 over all character
    k-grams of the lowercased text (a 1-fingerprint winnow — the SQL-exact
    analog of a rolling-hash min)."""
    lt = F.lower(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(lt) - (k - 1)),
        lambda i: F.md5(F.encode(lt.substr(i, F.lit(k)), "UTF-8")),
    )
    fp = F.when(F.length(lt) >= k, F.array_min(grams)).otherwise(F.lit(None))
    return df.select(F.col(id_col).cast("long").alias("docid"), fp.alias("fingerprint"))
