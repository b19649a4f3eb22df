"""tokens → compressed posting segments + term stats (SURVEY.md Q1 — the
Lucene-side inverted-index build the reference delegates to Elasticsearch).

Shape of the build (ONE wide shuffle, all-numeric, partition-kernel encoding):

    token occurrences (docid, dl, term [, pos])
      ├─ term dictionary: distinct(term) → (term, tid=xxhash64, bucket)
      │    [map-side dedup makes this shuffle vocabulary-sized, not
      │     corpus-sized; collision-checked]
      └─ numeric stream (pd = docid<<20|dl, tid [, pos])
           └─ repartition(tid, docid_range)        [the only big exchange —
           └─ sortWithinPartitions(tid, pd)         two int64 columns/row]
           └─ mapInPandas(partition kernel):
                run-length (tid, docid) → tf       [replaces a groupBy shuffle]
                slice groups → ≤128-posting blocks [numpy end to end]
                delta+varint encode + metadata
           └─ ⨝ dictionary on tid → term, bucket   [block rows ≪ postings]
      └─ write partitionBy(bucket)   [bucket = pmod(xxhash64(term), 64)]

Why this shape (measured on 1M docs / 55M occurrences, local[32]):

- **One big shuffle instead of two.**  tf aggregation happens inside the
  kernel from the sort order — the classic (docid,term) pre-aggregation
  shuffle is gone.
- **No term strings cross Arrow.**  The original kernel shipped 55M strings
  into pandas: Arrow→object-dtype conversion materializes one Python str
  per row and dominated the entire build (~90 s of a 156 s build).  The
  numeric stream converts to numpy int64 near-zero-copy; term strings
  reattach at block granularity (~100-1000× fewer rows).
- **No per-group overhead.**  applyInPandas materializes a pandas DataFrame
  per (term, range) group (~1 ms × |vocab|·|ranges| groups); the kernel
  sees whole sorted partitions and finds group boundaries with numpy
  comparisons.
- **Term stats for free.**  Each block row carries (n_docs, sum_tf), so
  df/cf aggregate from block *metadata* — no second pass over occurrences.

Scale properties:

- **Explicit head-term salting (O11).**  The shuffle key is
  (term, docid_range) — a Zipf head term occupying 10^11 docs lands in
  n_docs/8192 bounded groups, never one reducer.  This is the explicit
  two-stage salted build the north rule demands; the merge stage is free
  because blocks are the persisted unit and query-time scoring treats
  ranges independently.
- **Partition pruning (Q8/K6).**  ``bucket`` is a partition column of the
  segments table: queries compute their terms' buckets and prune the rest —
  Spark's analog of ES routing (elastic/index.go:90-92).
- **No per-row Python.**  Arrow batches in, numpy vectors inside, Arrow out.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import BLOCK_SIZE, BM25_B, BM25_K1, DOCS_PER_RANGE, N_TERM_BUCKETS
from ..functions import codec
from ..schemas import SEGMENTS

# (docid, dl) pack for the big exchange: the corpus-wide shuffle row narrows
# from (docid, dl, tid) to (pd, tid) — 1/3 fewer 8-byte slots through
# serialize+compress+network+deserialize on the only corpus-sized exchange.
# 20 bits hold dl exactly: content is capped at 1 MiB (F2), so the simple
# analyzer yields ≤ 524 288 tokens (every token needs ≥1 char + separator);
# least() saturates defensively anyway.  docid keeps 43 bits (10^12-doc
# north-rule scale needs 40).  Sorting by pd == sorting by (docid, dl) and
# dl is constant per docid, so kernel group detection is unchanged.
DL_BITS = 20
_DL_MASK = (1 << DL_BITS) - 1


def pack_docid_dl(docid, dl):
    return F.shiftleft(docid.cast("long"), DL_BITS) + F.least(
        dl.cast("long"), F.lit(_DL_MASK)
    )


def bucket_col(term_col):
    """Hash-bucket routing for terms — identical expression at build and
    query time (so pruning is exact)."""
    return F.pmod(F.xxhash64(term_col), F.lit(N_TERM_BUCKETS)).cast("int")


# kernel output: SEGMENTS with term replaced by numeric tid (+ no bucket)
_KERNEL_COLS = ["tid"] + [f.name for f in SEGMENTS.fields if f.name not in ("term", "bucket")]
_KERNEL_SCHEMA = (
    "tid long, docid_range long, block_idx int, n_docs int, first_docid long, "
    "max_docid long, max_tf int, min_dl int, sum_tf long, max_tfn double, "
    "docids_enc binary, tfs_enc binary, positions_enc binary, offsets_enc binary"
)


def _encode_group(
    tid: int,
    docid_range: int,
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    poss: np.ndarray | None = None,
    starts_flat: np.ndarray | None = None,
    ends_flat: np.ndarray | None = None,
    occ_start: np.ndarray | None = None,
    occ_end: np.ndarray | None = None,
) -> list[tuple]:
    """One (tid, docid_range) posting group (already docid-sorted) → block rows.

    Positions/offsets arrive as the partition's FLAT occurrence arrays plus
    this group's per-posting [occ_start, occ_end) index spans — the encoders
    vectorize over a whole block's occurrences at once instead of paying a
    numpy slice + diff + concatenate per posting (the dominant kernel cost
    of the positions+offsets shape; BENCH.md §2 round-4 block)."""
    tfn = tfs / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * (dls / avgdl)))
    base = docid_range * DOCS_PER_RANGE
    rows = []
    for blk_i, start in enumerate(range(0, len(docids), BLOCK_SIZE)):
        d = docids[start : start + BLOCK_SIZE]
        t = tfs[start : start + BLOCK_SIZE]
        rows.append(
            (
                tid,
                docid_range,
                blk_i,
                len(d),
                int(d[0]),
                int(d[-1]),
                int(t.max()),
                int(dls[start : start + BLOCK_SIZE].min()),
                int(t.sum()),
                float(tfn[start : start + BLOCK_SIZE].max()),
                codec.encode_docids(d, base=base),
                codec.encode_tfs(t.astype(np.int64)),
                (
                    codec.encode_positions_block(
                        poss,
                        occ_start[start : start + BLOCK_SIZE],
                        occ_end[start : start + BLOCK_SIZE],
                    )
                    if poss is not None
                    else None
                ),
                (
                    codec.encode_offsets_block(
                        starts_flat,
                        ends_flat,
                        occ_start[start : start + BLOCK_SIZE],
                        occ_end[start : start + BLOCK_SIZE],
                    )
                    if starts_flat is not None
                    else None
                ),
            )
        )
    return rows


# Rows buffered in the kernel before a flush of complete groups.  The old
# kernel held the WHOLE shuffle partition (list(batches) + concat): at a
# 2M-doc offsets build that was ~14M rows × 4 concurrent workers of pandas
# churn (measured 5.1 GB worker RSS and the stage going 2× superlinear).
# Streaming in ~2M-row chunks keeps each worker at a bounded ~100-200 MB
# regardless of partition size — the property that must hold at 10^12 docs.
_KERNEL_CHUNK_ROWS = 2_000_000


def make_partition_kernel(
    avgdl: float, with_positions: bool = False, with_offsets: bool = False
):
    """mapInPandas kernel over a partition sorted by (tid, docid [, pos]):
    run-length tf + block encoding, int64 numpy end to end.

    Streams the partition in bounded chunks: complete (tid, docid_range)
    groups are encoded and flushed as soon as ~_KERNEL_CHUNK_ROWS are
    buffered; only the trailing incomplete group carries over to the next
    chunk (group contiguity is guaranteed by the exchange + partition-local
    sort).  Worker memory is O(chunk), not O(partition)."""

    def encode_chunk(
        pdf: pd.DataFrame, final: bool, rows: list
    ) -> tuple[pd.DataFrame | None, Iterator[pd.DataFrame]]:
        """Encode all COMPLETE groups in pdf into `rows`; return the
        leftover tail (the last, possibly-incomplete group) unless final."""
        out: list[pd.DataFrame] = []
        tids = pdf["tid"].to_numpy(dtype=np.int64)
        packed = pdf["pd"].to_numpy(dtype=np.int64)
        docids = packed >> DL_BITS
        dls = packed & _DL_MASK
        ranges = docids // DOCS_PER_RANGE
        poss = pdf["pos"].to_numpy(dtype=np.int64) if with_positions else None
        starts_arr = pdf["start"].to_numpy(dtype=np.int64) if with_offsets else None
        ends_arr = pdf["end"].to_numpy(dtype=np.int64) if with_offsets else None

        # posting boundaries: first occurrence of each (tid, docid) run
        new_posting = np.ones(len(pdf), dtype=bool)
        new_posting[1:] = (tids[1:] != tids[:-1]) | (docids[1:] != docids[:-1])
        p_start = np.nonzero(new_posting)[0]
        p_end = np.append(p_start[1:], len(pdf))
        tf = (p_end - p_start).astype(np.float64)

        p_tids = tids[p_start]
        p_docids = docids[p_start]
        p_dls = dls[p_start].astype(np.float64)
        p_ranges = ranges[p_start]

        # group boundaries: (tid, docid_range)
        new_group = np.ones(len(p_start), dtype=bool)
        new_group[1:] = (p_tids[1:] != p_tids[:-1]) | (p_ranges[1:] != p_ranges[:-1])
        g_start = np.nonzero(new_group)[0]
        g_end = np.append(g_start[1:], len(p_start))

        tail: pd.DataFrame | None = None
        n_groups = len(g_start)
        if not final and n_groups > 0:
            # retain the last group — its remaining rows may arrive in the
            # next Arrow batch; if the buffer is a single giant group, no
            # flush is possible yet and the whole pdf carries over
            tail_row0 = int(p_start[g_start[-1]])
            if n_groups == 1:
                return pdf, iter(out)
            # .copy() so the retained tail doesn't pin the whole chunk's
            # block memory through the next iteration
            tail = pdf.iloc[tail_row0:].copy()
            g_start, g_end = g_start[:-1], g_end[:-1]

        for gs, ge in zip(g_start, g_end):
            rows.extend(
                _encode_group(
                    int(p_tids[gs]),
                    int(p_ranges[gs]),
                    p_docids[gs:ge],
                    tf[gs:ge],
                    p_dls[gs:ge],
                    avgdl,
                    poss if with_positions else None,
                    starts_arr if with_offsets else None,
                    ends_arr if with_offsets else None,
                    p_start[gs:ge] if (with_positions or with_offsets) else None,
                    p_end[gs:ge] if (with_positions or with_offsets) else None,
                )
            )
            if len(rows) >= 4096:  # bound Arrow batch size
                out.append(pd.DataFrame(rows, columns=_KERNEL_COLS))
                rows.clear()
        return tail, iter(out)

    def build_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend: list[pd.DataFrame] = []
        pend_rows = 0
        next_flush = _KERNEL_CHUNK_ROWS
        rows: list[tuple] = []
        for b in batches:
            if len(b) == 0:
                continue
            pend.append(b)
            pend_rows += len(b)
            if pend_rows >= next_flush:
                pdf = pend[0] if len(pend) == 1 else pd.concat(pend, ignore_index=True)
                tail, out = encode_chunk(pdf, final=False, rows=rows)
                yield from out
                pend = [tail] if tail is not None and len(tail) else []
                pend_rows = len(pend[0]) if pend else 0
                # a buffer that is ONE giant group can't flush yet — grow the
                # trigger so the re-scan stays amortized O(n), not O(n²)
                next_flush = (
                    pend_rows + _KERNEL_CHUNK_ROWS
                    if pend_rows >= next_flush
                    else _KERNEL_CHUNK_ROWS
                )
        if pend:
            pdf = pend[0] if len(pend) == 1 else pd.concat(pend, ignore_index=True)
            if len(pdf):
                _, out = encode_chunk(pdf, final=True, rows=rows)
                yield from out
        if rows:
            yield pd.DataFrame(rows, columns=_KERNEL_COLS)

    return build_blocks


# Target occurrence rows per exchange partition: sized so one task's
# partition-local sort stays inside its execution-memory share instead of
# spilling (measured: 8 partitions × 14M rows at a 2M-doc offsets build
# spilled 4.2 GB and the sort+kernel stage went 2× superlinear; ~4M-row
# tasks sort in memory).  The heavy shape carries ~2.5× the bytes per row,
# so its target is proportionally smaller.  At 10^12 docs this yields ~10^7
# partitions of bounded size — the cluster-correct shape (AQE cannot split
# an explicit repartition, so the count must be right at plan time).
OCC_ROWS_PER_PARTITION = 6_000_000
OCC_ROWS_PER_PARTITION_HEAVY = 2_500_000


def occurrence_stream(
    occurrences: DataFrame,
    with_positions: bool = False,
    with_offsets: bool = False,
    est_occurrences: int | None = None,
) -> DataFrame:
    """The pre-kernel numeric stream: the ONE corpus-wide exchange, exactly
    as the production build runs it (also audited verbatim by
    tools/explain_audit.py — keep them one code path).

    ``est_occurrences`` (when the caller knows it — build_index computes the
    exact token total for avgdl anyway) sizes the exchange so per-task sorts
    fit in memory; without it the session's shuffle-partition default rules.
    """
    cols = [
        pack_docid_dl(F.col("docid"), F.col("dl")).alias("pd"),
        F.xxhash64("term").alias("tid"),
    ] + (["pos"] if with_positions else []) + (
        ["start", "end"] if with_offsets else []
    )
    num = occurrences.select(*cols)
    # partition key (tid, docid>>13) passed as an expression — docid_range is
    # derivable from the packed column, so materializing it would add 8
    # bytes/row of shuffle volume for nothing (the kernel recomputes it from
    # pd in one numpy op)
    range_expr = (
        F.shiftright(F.col("pd"), DL_BITS) / F.lit(DOCS_PER_RANGE)
    ).cast("long")
    sort_cols = ["tid", "pd"] + (["pos"] if with_positions else [])
    part_args: list = [F.col("tid"), range_expr]
    if est_occurrences:
        target = (
            OCC_ROWS_PER_PARTITION_HEAVY
            if (with_positions or with_offsets)
            else OCC_ROWS_PER_PARTITION
        )
        # the conf may be non-numeric on some platforms ("auto" under
        # Databricks AQE auto-optimized shuffle) — fall back to the sized
        # count alone rather than failing every est_occurrences build
        raw = occurrences.sparkSession.conf.get("spark.sql.shuffle.partitions")
        try:
            default_parts = int(raw)
        except (TypeError, ValueError):
            default_parts = 0
        n_parts = max(default_parts, -(-est_occurrences // target), 1)
        part_args = [n_parts] + part_args
    return num.repartition(*part_args).sortWithinPartitions(*sort_cols)


def term_dictionary(occurrences: DataFrame) -> DataFrame:
    """(term, tid, bucket) — vocabulary-sized after map-side dedup."""
    return (
        occurrences.select("term")
        .distinct()
        .withColumn("tid", F.xxhash64("term"))
        .withColumn("bucket", bucket_col(F.col("term")))
    )


def build_segments(
    occurrences: DataFrame,
    avgdl: float,
    with_positions: bool = False,
    with_offsets: bool = False,
    est_occurrences: int | None = None,
) -> DataFrame:
    """Token occurrences (docid, term, dl [, pos [, start, end]]) → SEGMENTS.

    Raises on a tid (xxhash64) collision in the dictionary — with 64-bit
    hashes this is ~10^-6 even at 10^7-term vocabularies; a collision would
    silently merge two posting lists, so it is checked, not assumed away.

    Positions must be token positions within the doc (posexplode order); the
    sort places them ascending per posting so delta encoding applies.
    """
    tdict = term_dictionary(occurrences).cache()
    n_terms, n_tids = tdict.agg(
        F.count("*"), F.countDistinct("tid")
    ).collect()[0]
    if n_terms != n_tids:
        raise RuntimeError(
            f"xxhash64 term-id collision: {n_terms} terms -> {n_tids} ids; "
            "rebuild with a secondary hash"
        )

    part = occurrence_stream(
        occurrences, with_positions, with_offsets, est_occurrences
    )
    blocks = part.mapInPandas(
        make_partition_kernel(avgdl, with_positions, with_offsets),
        schema=_KERNEL_SCHEMA,
    )
    # reattach term strings at block granularity (blocks ≪ postings);
    # broadcast is right while the dictionary fits — Spark falls back to a
    # shuffled join automatically above the threshold (10^9-term corpora)
    return blocks.join(tdict, "tid").select(*[f.name for f in SEGMENTS.fields])


def term_stats_from_segments(segments: DataFrame, n_docs: int) -> DataFrame:
    """TERM_STATS from block metadata only (no posting decode):
    df = Σ n_docs per term, cf = Σ sum_tf per term, idf = canonical Lucene."""
    return (
        segments.groupBy("term")
        .agg(
            F.sum("n_docs").cast("long").alias("df"),
            F.sum("sum_tf").cast("long").alias("cf"),
        )
        .withColumn(
            "idf",
            F.log1p(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )


def decode_segments(segments: DataFrame) -> DataFrame:
    """SEGMENTS → flat (term, docid, tf) via mapInPandas — the storage
    round-trip used by the exhaustive scorer and the oracle-parity tests.

    Projects to the five needed columns FIRST so the parquet scan prunes the
    posting-byte columns it doesn't decode — on a positions+offsets index
    those payloads are most of the table's bytes."""
    segments = segments.select(
        "term", "docid_range", "n_docs", "docids_enc", "tfs_enc"
    )

    def decode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            terms, docids, tfs = [], [], []
            for r in pdf.itertuples(index=False):
                base = r.docid_range * DOCS_PER_RANGE
                d = codec.decode_docids(r.docids_enc, base=base, count=r.n_docs)
                t = codec.decode_tfs(r.tfs_enc, count=r.n_docs)
                terms.append(np.full(len(d), r.term, dtype=object))
                docids.append(d)
                tfs.append(t)
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "docid": np.concatenate(docids),
                    "tf": np.concatenate(tfs).astype(np.int32),
                }
            )

    return segments.mapInPandas(decode, schema="term string, docid long, tf int")
