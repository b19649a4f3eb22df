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


def analyze_query_seq(query: str, analyzer: str) -> list[str]:
    """Phrase-query semantics: the raw analyzed token SEQUENCE, order and
    duplicates preserved — a phrase like "data data" must verify two
    adjacent occurrences, which the deduplicated match-query term list
    cannot express."""
    return list(ANALYZERS[analyzer](query))


def bm25_score_col(tf: Column, dl: Column, idf: Column, avgdl: float) -> Column:
    k1, b = F.lit(BM25_K1), F.lit(BM25_B)
    tf_d = tf.cast("double")
    return idf * tf_d / (tf_d + k1 * (F.lit(1.0) - b + b * dl.cast("double") / F.lit(avgdl)))


def filter_segments_for_terms(segments: DataFrame, terms: list[str]) -> DataFrame:
    """Routing-style pruning: restrict to the terms' hash buckets (partition
    pruning on the parquet layout) then the exact terms (row-group pushdown).

    Buckets are computed DRIVER-SIDE with the pure-Python xxhash64 twin
    (functions/xxhash.py, golden-tested ≡ Spark's) — zero Spark jobs spent
    learning the routing key, the same way an ES client routes without
    asking the cluster."""
    if not terms:
        return segments.limit(0)
    from ..config import N_TERM_BUCKETS
    from ..functions.xxhash import term_bucket

    buckets = sorted({term_bucket(t, N_TERM_BUCKETS) for t in terms})
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
    returns docids where the phrase-term SEQUENCE (order and duplicates
    preserved) appears at consecutive positions.

    Distributed shape: segments group by ``docid_range`` — the same
    bounded-salt unit the block-max scorer parallelizes over — so a phrase
    on two Zipf head terms fans out as n_docs/DOCS_PER_RANGE independent
    tasks instead of funnelling every posting through one partition.
    Within a range the kernel first intersects docid sets per distinct term
    (numpy), then checks positional adjacency only for the surviving
    candidates."""
    import numpy as np
    import pandas as pd

    from ..config import DOCS_PER_RANGE
    from ..functions import codec

    n = len(phrase_terms)
    if n == 0:
        return segments.sparkSession.createDataFrame([], "docid long")
    distinct_terms = list(dict.fromkeys(phrase_terms))
    seg = filter_segments_for_terms(segments, distinct_terms).select(
        "term", "docid_range", "n_docs", "docids_enc", "positions_enc"
    )

    def check_range(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"docid": pd.Series([], dtype="int64")})
        if len(pdf) == 0:
            return empty
        by_term: dict[str, list] = {}
        for r in pdf.itertuples(index=False):
            base = int(r.docid_range) * DOCS_PER_RANGE
            d = codec.decode_docids(r.docids_enc, base=base, count=r.n_docs)
            p = codec.decode_positions(r.positions_enc, r.n_docs)
            by_term.setdefault(r.term, []).append((d, p))
        if len(by_term) < len(distinct_terms):
            return empty  # some phrase term absent from this range entirely
        # candidate docids: set-intersection across distinct terms (numpy)
        cand = None
        for t in distinct_terms:
            docs_t = np.concatenate([c[0] for c in by_term[t]])
            cand = docs_t if cand is None else np.intersect1d(cand, docs_t)
            if cand.size == 0:
                return empty
        cand_set = set(int(x) for x in cand)
        pos_map: dict[str, dict[int, np.ndarray]] = {t: {} for t in by_term}
        for t, chunks in by_term.items():
            m = pos_map[t]
            for dd, pp in chunks:
                for i_, d in enumerate(dd):
                    di = int(d)
                    if di in cand_set:
                        m[di] = pp[i_]
        hits = []
        for d in sorted(cand_set):
            # positions of the i-th phrase token shifted by -i must intersect
            inter = None
            ok = True
            for idx, t in enumerate(phrase_terms):
                shifted = pos_map[t][d] - idx
                inter = shifted if inter is None else np.intersect1d(inter, shifted)
                if inter.size == 0:
                    ok = False
                    break
            if ok:
                hits.append(d)
        return pd.DataFrame({"docid": pd.Series(hits, dtype="int64")})

    return seg.groupBy("docid_range").applyInPandas(check_range, schema="docid long")
