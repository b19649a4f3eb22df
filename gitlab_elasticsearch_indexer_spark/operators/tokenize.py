"""docs → tokens: analysis + term-frequency aggregation (Lucene's per-field
analysis + inverted-index input, SURVEY.md Q1 first half).

Default ('simple') analyzer runs ENTIRELY JVM-side — ``split``/``filter``/
``explode``/``groupBy`` stay inside whole-stage codegen; richer analyzer
chains (standard+stemmer, code, path, ngram) drop to one Arrow pandas UDF
producing the token array, after which the same JVM aggregation applies.

Output: (docid, term, tf, dl) — one row per distinct (doc, term), plus the
doc length needed by BM25.  ``groupBy(docid, term)`` partial-aggregates
map-side (docid spreads the shuffle; no term skew at this stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ANALYZER_SIMPLE
from ..functions.udfs import make_tokenizer_udf

SIMPLE_SPLIT_RE = "[^a-z0-9]+"


def token_arrays(docs: DataFrame, analyzer: str = ANALYZER_SIMPLE, text_col: str = "content") -> DataFrame:
    """docs → (docid, toks array<string>, dl int)."""
    if analyzer == ANALYZER_SIMPLE:
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), SIMPLE_SPLIT_RE), lambda x: x != ""
        )
    else:
        toks = make_tokenizer_udf(analyzer)(F.col(text_col))
    return docs.select(
        "docid", toks.alias("toks")
    ).withColumn("dl", F.size("toks").cast("int"))


def tokenize(docs: DataFrame, analyzer: str = ANALYZER_SIMPLE, text_col: str = "content") -> DataFrame:
    """docs → TOKENS (docid, term, tf, dl)."""
    arr = token_arrays(docs, analyzer, text_col)
    return (
        arr.select("docid", "dl", F.explode("toks").alias("term"))
        .groupBy("docid", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
    )


def tokenize_with_positions(
    docs: DataFrame, analyzer: str = ANALYZER_SIMPLE, text_col: str = "content"
) -> DataFrame:
    """docs → (docid, term, tf, dl, positions array<int>) for fields whose
    index_options include positions (elastic/index.go:115-119,188-191 —
    phrase queries need them; §1.4)."""
    arr = token_arrays(docs, analyzer, text_col)
    return (
        arr.select("docid", "dl", F.posexplode("toks").alias("pos", "term"))
        .groupBy("docid", "term")
        .agg(
            F.count("*").cast("int").alias("tf"),
            F.first("dl").alias("dl"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    )
