"""Query-time retrieval, exhaustive DataFrame path (SURVEY.md Q2-Q5,Q7).

This is the declarative reference scorer: everything is built-in DataFrame
ops (broadcast joins + hash agg + TakeOrdered), so Catalyst/Tungsten run the
whole plan in codegen and the DuckDB oracle can verify it end-to-end.  The
block-skipping path (operators/wand.py) must produce rank-identical results
— asserted in tests.

Plan shape:
    segments scan                          [bucket ∈ query buckets → partition
       | filter(term ∈ query terms)         pruning, Q8; term pushed to parquet]
    decode blocks (mapInPandas)
    ⨝ broadcast(term_stats ∩ query terms)  [idf]
    ⨝ docs (docid, dl [, filter predicate Q7])
    score = idf * tf/(tf + k1*(1-b+b*dl/avgdl))
    groupBy(docid).sum(score)              [map-side partial agg]
    orderBy(score desc, docid asc).limit(k)  [global top-k = TakeOrdered]
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1
from ..functions.analysis import ANALYZERS
from .postings import bucket_col, decode_segments


def analyze_query(query: str, analyzer: str) -> list[str]:
    """Match-query semantics: analyze with the field's analyzer, then OR the
    distinct terms (elastic default operator, SURVEY.md Q2)."""
    seen: dict[str, None] = {}
    for t in ANALYZERS[analyzer](query):
        seen.setdefault(t, None)
    return list(seen)


def bm25_score_col(tf: Column, dl: Column, idf: Column, avgdl: float) -> Column:
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    tf_d = tf.cast("double")
    return idf * tf_d / (tf_d + k1 * (F.lit(1.0) - b + b * dl.cast("double") / F.lit(avgdl)))


def filter_segments_for_terms(segments: DataFrame, terms: list[str]) -> DataFrame:
    """Routing-style pruning: restrict to the terms' hash buckets (partition
    pruning on the parquet layout) then the exact terms (row-group pushdown)."""
    if not terms:
        return segments.limit(0)
    term_df = segments.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    ).withColumn("bucket", bucket_col(F.col("term")))
    buckets = sorted({r["bucket"] for r in term_df.select("bucket").collect()})
    return segments.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )


def search_exhaustive(
    segments: DataFrame,
    term_stats: DataFrame,
    docs: DataFrame,
    query_terms: list[str],
    k: int | None,
    avgdl: float,
    doc_filter: Column | None = None,
    require_all: bool = False,
) -> DataFrame:
    """→ (docid, score) top-k, tie-break (score desc, docid asc).
    ``k=None`` scores everything (no TakeOrdered truncation).
    ``require_all``: conjunctive match-query semantics (ES
    ``operator: and``) — only docs containing every query term score."""
    spark = segments.sparkSession
    if not query_terms:
        return spark.createDataFrame([], "docid long, score double")

    postings = decode_segments(filter_segments_for_terms(segments, query_terms))
    stats = term_stats.filter(F.col("term").isin(query_terms)).select("term", "idf")
    doc_side = docs.select("docid", "dl") if doc_filter is None else docs.filter(
        doc_filter
    ).select("docid", "dl")

    scored = (
        postings.join(F.broadcast(stats), "term")
        .join(doc_side, "docid")
        .select(
            "docid",
            "term",
            bm25_score_col(F.col("tf"), F.col("dl"), F.col("idf"), avgdl).alias("s"),
        )
        .groupBy("docid")
        .agg(
            F.sum("s").alias("score"),
            F.countDistinct("term").alias("n_matched"),
        )
    )
    if require_all:
        scored = scored.filter(F.col("n_matched") == len(set(query_terms)))
    scored = scored.drop("n_matched")
    ranked = scored.orderBy(F.desc("score"), F.asc("docid"))
    return ranked if k is None else ranked.limit(k)


def phrase_filter_docids(
    segments: DataFrame,
    phrase_terms: list[str],
) -> DataFrame:
    """Positions-based phrase matching (index_options=positions, §1.4):
    returns docids where the terms appear at consecutive positions.

    Decodes positions from the segments' optional payload and checks
    adjacency with a numpy intersection per doc — vectorized, no per-row
    Python."""
    import numpy as np
    import pandas as pd

    from ..config import DOCS_PER_RANGE
    from ..functions import codec

    n = len(phrase_terms)
    if n == 0:
        return segments.sparkSession.createDataFrame([], "docid long")
    seg = filter_segments_for_terms(segments, list(dict.fromkeys(phrase_terms)))

    order = {t: i for i, t in enumerate(dict.fromkeys(phrase_terms))}

    def check(batches):
        # gather (docid, term_pos_offset, positions) then verify adjacency
        per_doc: dict[int, dict[str, np.ndarray]] = {}
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                base = r.docid_range * DOCS_PER_RANGE
                docids = codec.decode_docids(r.docids_enc, base=base, count=r.n_docs)
                poss = codec.decode_positions(r.positions_enc, r.n_docs)
                for d, p in zip(docids, poss):
                    per_doc.setdefault(int(d), {})[r.term] = p
        hits = []
        for d, terms_pos in per_doc.items():
            if len(terms_pos) < len(order):
                continue
            # positions of term_i shifted by -offset_i must intersect
            inter = None
            ok = True
            for idx, t in enumerate(phrase_terms):
                if t not in terms_pos:
                    ok = False
                    break
                shifted = terms_pos[t] - idx
                inter = shifted if inter is None else np.intersect1d(inter, shifted)
                if inter.size == 0:
                    ok = False
                    break
            if ok and inter is not None and inter.size > 0:
                hits.append(d)
        yield pd.DataFrame({"docid": sorted(hits)}, dtype="int64")

    # single-partition gather: phrase postings for a handful of terms are
    # small relative to corpus; at cluster scale this would cogroup by
    # docid_range like wand.py does.
    return seg.coalesce(1).mapInPandas(check, schema="docid long")
