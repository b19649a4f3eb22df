"""Block-max top-k retrieval (SURVEY.md Q5 — the WAND-style skipping Lucene
performs, lifted onto Spark's execution model).

Classic doc-at-a-time block-max WAND is a pointer-chasing loop — hostile to
both Python and distributed execution.  The same safe-up-to-k skipping is
achieved here at two granularities that ARE Spark-friendly:

1. **Range-level skipping (distributed).**  Per docid_range,
   ``bound(range) = Σ_t idf_t · max_block(max_tfn)`` is aggregated
   SPARK-SIDE from segment *metadata only* (a few bytes per block — no
   posting bytes read); the driver collects just the per-range aggregate —
   or, above ``super_threshold`` ranges, only per-SUPER-range maxima with
   members fetched lazily, so driver memory stays bounded at 10^12 docs.
   Ranges are processed in descending-bound batches; after each batch the
   k-th best score so far is the threshold θ, and every remaining range
   with bound < θ is skipped without ever being scanned.  This is
   block-max pruning at the unit of parallelism: batches fan out as one
   Spark job over the pruned parquet partitions.  Small corpora
   (ranges ≤ range_batch, known from the catalog without a job) skip the
   bounds phase entirely and score every range in ONE job with an exact
   Spark-side top-k.

2. **Block-level skipping (within a range, single-term queries).**  Blocks
   sorted by idf·max_tfn descending; once k local hits exist and the next
   block's bound is below the local k-th score, remaining blocks are not
   decoded.  (Multi-term queries score the range's candidate blocks with one
   vectorized numpy accumulation — exact, and still only the blocks of the
   query's terms.)

Safety: bounds are true upper bounds, so the result is rank-identical to the
exhaustive scorer — asserted in tests/test_pipeline.py.

Scoring joins doc lengths via ``cogroup(segments, docs).applyInPandas`` on
docid_range — both sides are partitioned by the same key, and the optional
metadata filter (Q7: lang / permission ints) is applied to the docs side
*before* the cogroup so filtered docs never score.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DOCS_PER_RANGE
from ..functions import codec
from .search import filter_segments_for_terms

_META_COLS = [
    "term",
    "bucket",
    "docid_range",
    "block_idx",
    "n_docs",
    "first_docid",
    "max_docid",
    "max_tf",
    "min_dl",
]


def _block_bound_tfn(max_tf, min_dl, avgdl: float):
    """Upper bound of tf/(tf+k1·(1−b+b·dl/avgdl)) over a block, from stored
    (max_tf, min_dl) and the CURRENT avgdl — valid across incremental
    snapshots (monotone ↑ in tf, ↓ in dl)."""
    max_tf = np.asarray(max_tf, dtype=np.float64)
    min_dl = np.asarray(min_dl, dtype=np.float64)
    return max_tf / (max_tf + BM25_K1 * (1.0 - BM25_B + BM25_B * min_dl / avgdl))


def _make_range_scorer(idf_by_term: dict[str, float], avgdl: float, k: int):
    k1, b = BM25_K1, BM25_B

    def score_range(key, seg_pdf: pd.DataFrame, docs_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(seg_pdf) == 0 or len(docs_pdf) == 0:
            return pd.DataFrame({"docid": [], "score": []}).astype(
                {"docid": "int64", "score": "float64"}
            )
        base = int(key[0]) * DOCS_PER_RANGE
        # doc-length lookup for this range (docs side already metadata-filtered)
        dl_docids = docs_pdf["docid"].to_numpy(dtype=np.int64)
        dl_vals = docs_pdf["dl"].to_numpy(dtype=np.int64)
        dl_order = np.argsort(dl_docids)
        dl_docids, dl_vals = dl_docids[dl_order], dl_vals[dl_order]

        terms = seg_pdf["term"].to_numpy()
        single_term = len(set(terms)) == 1
        if single_term:
            idf = idf_by_term[terms[0]]
            bound = idf * _block_bound_tfn(
                seg_pdf["max_tf"].to_numpy(), seg_pdf["min_dl"].to_numpy(), avgdl
            )
            blocks = seg_pdf.assign(bound=bound).sort_values("bound", ascending=False)
        else:
            blocks = seg_pdf

        all_docids: list[np.ndarray] = []
        all_scores: list[np.ndarray] = []
        heap: list[float] = []  # local top-k scores, single-term skipping only
        for r in blocks.itertuples(index=False):
            if single_term and len(heap) >= k and r.bound < heap[0]:
                break  # block-max skip: no remaining block can enter top-k
            docids = codec.decode_docids(r.docids_enc, base=base, count=r.n_docs)
            tfs = codec.decode_tfs(r.tfs_enc, count=r.n_docs).astype(np.float64)
            pos = np.searchsorted(dl_docids, docids)
            valid = (pos < len(dl_docids)) & (
                dl_docids[np.clip(pos, 0, len(dl_docids) - 1)] == docids
            )
            if not valid.any():
                continue
            docids, tfs, pos = docids[valid], tfs[valid], pos[valid]
            dl = dl_vals[pos].astype(np.float64)
            idf = idf_by_term[r.term]
            scores = idf * tfs / (tfs + k1 * (1.0 - b + b * dl / avgdl))
            all_docids.append(docids)
            all_scores.append(scores)
            if single_term:
                for s in scores:
                    if len(heap) < k:
                        heapq.heappush(heap, float(s))
                    elif s > heap[0]:
                        heapq.heapreplace(heap, float(s))

        if not all_docids:
            return pd.DataFrame({"docid": [], "score": []}).astype(
                {"docid": "int64", "score": "float64"}
            )
        docids = np.concatenate(all_docids)
        scores = np.concatenate(all_scores)
        uniq, inv = np.unique(docids, return_inverse=True)
        totals = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(totals, inv, scores)
        if len(uniq) > k:
            part = np.argpartition(-totals, k - 1)[:k]
            # stable exact order: score desc, docid asc
            order = part[np.lexsort((uniq[part], -totals[part]))]
        else:
            order = np.lexsort((uniq, -totals))
        return pd.DataFrame({"docid": uniq[order], "score": totals[order]})

    return score_range


def _range_bounds_df(seg: DataFrame, stats_df: DataFrame, avgdl: float) -> DataFrame:
    """(docid_range, bound) computed ENTIRELY Spark-side from block metadata:
    per-(range, term) max of idf·bound_tfn, summed per range.  The driver
    never sees per-block rows — only the per-range aggregate (n_docs/8192
    rows), or per-super-range above that (see search_blockmax)."""
    tf_d = F.col("max_tf").cast("double")
    tfn_bound = tf_d / (
        tf_d
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("min_dl").cast("double") / F.lit(avgdl))
    )
    return (
        seg.join(F.broadcast(stats_df), "term")
        .groupBy("docid_range", "term")
        .agg(F.max(tfn_bound * F.col("idf")).alias("tb"))
        .groupBy("docid_range")
        .agg(F.sum("tb").alias("bound"))
    )


def search_blockmax(
    spark,
    segments: DataFrame,
    term_stats: DataFrame,
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    avgdl: float,
    doc_filter: Column | None = None,
    range_batch: int = 256,
    n_ranges_hint: int | None = None,
    super_shift: int = 10,
    super_threshold: int = 1 << 16,
    stats_out: dict | None = None,
) -> DataFrame:
    """→ (docid, score) top-k, rank-identical to search_exhaustive.

    Three regimes, chosen by corpus size (``n_ranges_hint`` — callers pass
    ceil(n_docs / DOCS_PER_RANGE) from the catalog, so no job is needed to
    pick the path):

    1. **hint ≤ range_batch** (small corpus): ONE Spark job — cogroup-score
       every pruned range, exact global top-k via orderBy/limit.  No
       metadata collect, no driver loop: at bench scale this is the same
       job count as the exhaustive scorer.
    2. **default**: per-range bounds aggregated Spark-side
       (_range_bounds_df) and collected — n_docs/8192 rows, never per-block
       metadata — then descending-bound batches with θ-pruning.
    3. **hint > super_threshold** (10^9+ ranges — 10^12+ docs): two-level.
       Only per-SUPER-range bounds (ranges >> super_shift, 1024× fewer) are
       collected up front; each super batch lazily fetches its members'
       per-range bounds.  Driver memory is O(n_ranges / 1024 + batch),
       and a super-range whose best member bound < θ is skipped without
       ever fetching its members.

    ``stats_out`` (optional dict) receives skip telemetry:
    ``ranges_total`` / ``ranges_scored`` (regimes 2-3) — the observable
    proof that θ-pruning is cutting work, used by tests and ops dashboards.
    """
    if not query_terms:
        return spark.createDataFrame([], "docid long, score double")

    stats_df = (
        term_stats.filter(F.col("term").isin(query_terms)).select("term", "idf")
    )
    stats = {r["term"]: float(r["idf"]) for r in stats_df.collect()}
    live_terms = [t for t in query_terms if t in stats]
    if not live_terms:
        return spark.createDataFrame([], "docid long, score double")

    # project away the payload columns the scorer never decodes (positions/
    # offsets) — parquet then skips those byte columns entirely
    seg = filter_segments_for_terms(segments, live_terms).select(
        "term", "docid_range", "n_docs", "max_tf", "min_dl",
        "docids_enc", "tfs_enc",
    )
    doc_side = docs if doc_filter is None else docs.filter(doc_filter)
    doc_side = doc_side.select(
        "docid",
        "dl",
        (F.col("docid") / F.lit(DOCS_PER_RANGE)).cast("long").alias("docid_range"),
    )
    scorer = _make_range_scorer(stats, avgdl, k)

    def cogroup_score(seg_part: DataFrame, docs_part: DataFrame) -> DataFrame:
        return (
            seg_part.groupBy("docid_range")
            .cogroup(docs_part.groupBy("docid_range"))
            .applyInPandas(scorer, schema="docid long, score double")
        )

    # ---- regime 1: small corpus — one job, no driver-side batching ----
    if n_ranges_hint is not None and n_ranges_hint <= range_batch:
        return (
            cogroup_score(seg, doc_side)
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )

    heap: list[tuple[float, int]] = []  # (score, -docid) min-heap of global top-k

    def kth() -> float:
        return heap[0][0] if len(heap) >= k else float("-inf")

    scored_count = [0]

    def score_batch(batch: list[int]) -> None:
        scored_count[0] += len(batch)
        part = cogroup_score(
            seg.filter(F.col("docid_range").isin(batch)),
            doc_side.filter(F.col("docid_range").isin(batch)),
        ).collect()
        for row in part:
            item = (row["score"], -row["docid"])
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

    def process_ranges(ordered_ranges: list[int], bounds: dict[int, float]) -> None:
        """Descending-bound θ-pruned batch loop over one set of ranges."""
        i = 0
        while i < len(ordered_ranges):
            theta = kth()
            batch = []
            while i < len(ordered_ranges) and len(batch) < range_batch:
                rg = ordered_ranges[i]
                # strict <: a range whose bound equals θ could still contain
                # a score-tied doc winning the (score desc, docid asc) break
                if bounds[rg] < theta and len(heap) >= k:
                    i = len(ordered_ranges)  # later ranges bound even lower
                    break
                batch.append(rg)
                i += 1
            if not batch:
                break
            score_batch(batch)

    two_level = n_ranges_hint is not None and n_ranges_hint > super_threshold
    rb = _range_bounds_df(seg, stats_df, avgdl)
    n_total_ranges = 0
    if not two_level:
        # ---- regime 2: collect per-range bounds (one narrow agg job) ----
        bounds = {
            int(r["docid_range"]): float(r["bound"]) for r in rb.collect()
        }
        n_total_ranges = len(bounds)
        process_ranges(sorted(bounds, key=lambda rg: -bounds[rg]), bounds)
    else:
        # ---- regime 3: super-range level first, members fetched lazily ----
        rb = rb.cache()
        try:
            super_rows = (
                rb.groupBy(
                    F.shiftright(F.col("docid_range"), super_shift).alias("srange")
                )
                .agg(F.max("bound").alias("sbound"))
                .collect()
            )
            sbounds = {int(r["srange"]): float(r["sbound"]) for r in super_rows}
            for sr in sorted(sbounds, key=lambda s: -sbounds[s]):
                if sbounds[sr] < kth() and len(heap) >= k:
                    break  # no member of any later super-range can enter top-k
                member_rows = rb.filter(
                    F.shiftright(F.col("docid_range"), super_shift) == sr
                ).collect()
                bounds = {
                    int(r["docid_range"]): float(r["bound"]) for r in member_rows
                }
                n_total_ranges += len(bounds)
                process_ranges(sorted(bounds, key=lambda rg: -bounds[rg]), bounds)
        finally:
            rb.unpersist()

    if stats_out is not None:
        stats_out["ranges_total"] = n_total_ranges
        stats_out["ranges_scored"] = scored_count[0]

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return spark.createDataFrame(
        [(int(-nd), float(s)) for s, nd in out], "docid long, score double"
    ).select("docid", "score")
