"""Highlighting over the offsets payload (index_options=offsets).

The reference's mapping stores docs+freqs+positions+offsets on the
project-level text fields (elastic/index.go:208-218,328-331) precisely so
Elasticsearch can highlight matches without re-analyzing documents at query
time.  This module is the Spark analog: character spans come straight from
the segments' ``offsets_enc`` payload (decoded per block, Arrow-batched),
and snippets are cut from the docs table with pure JVM ``substring``
expressions — the document text is never re-tokenized.

Plan shape: pruned segments scan (bucket partition filter + term pushdown)
→ mapInPandas offset decode → join docs on docid (broadcast-size span side
for a top-k result page) → substring window arithmetic in codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DOCS_PER_RANGE
from ..functions import codec
from .search import filter_segments_for_terms


def term_offsets(segments: DataFrame, term: str) -> DataFrame:
    """→ (docid, start, end) — one row per occurrence of ``term``, decoded
    from the offsets payload (requires an index built with_offsets)."""
    seg = filter_segments_for_terms(segments, [term]).select(
        "docid_range", "n_docs", "docids_enc", "offsets_enc"
    )

    def decode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            docids_out, starts_out, ends_out = [], [], []
            for r in pdf.itertuples(index=False):
                if r.offsets_enc is None:
                    raise ValueError(
                        "segments carry no offsets payload — build the index "
                        "with with_offsets=True"
                    )
                base = int(r.docid_range) * DOCS_PER_RANGE
                d = codec.decode_docids(r.docids_enc, base=base, count=r.n_docs)
                offs = codec.decode_offsets(r.offsets_enc, r.n_docs)
                for di, (starts, ends) in zip(d, offs):
                    docids_out.append(np.full(len(starts), di, dtype=np.int64))
                    starts_out.append(starts)
                    ends_out.append(ends)
            if docids_out:
                yield pd.DataFrame(
                    {
                        "docid": np.concatenate(docids_out),
                        "start": np.concatenate(starts_out).astype(np.int32),
                        "end": np.concatenate(ends_out).astype(np.int32),
                    }
                )

    return seg.mapInPandas(decode, schema="docid long, start int, end int")


def highlight_term(
    segments: DataFrame,
    docs: DataFrame,
    term: str,
    window: int = 30,
    pre_tag: str = "«",
    post_tag: str = "»",
) -> DataFrame:
    """→ (docid, start, end, snippet): each occurrence wrapped in
    ``pre_tag``/``post_tag`` with ``window`` characters of context either
    side — all substring arithmetic JVM-side (one codegen stage after the
    decode)."""
    spans = term_offsets(segments, term)
    content = docs.select("docid", "content")
    s, e = F.col("start"), F.col("end")
    frag_start = F.greatest(F.lit(0), s - F.lit(window))
    snippet = F.concat(
        F.col("content").substr(frag_start + 1, s - frag_start),
        F.lit(pre_tag),
        F.col("content").substr(s + 1, e - s),
        F.lit(post_tag),
        F.col("content").substr(e + 1, F.lit(window)),
    )
    return (
        spans.join(content, "docid")
        .select("docid", "start", "end", snippet.alias("snippet"))
    )
