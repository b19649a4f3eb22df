#!/usr/bin/env python
"""Index storage report: compression and layout evidence for a committed
index.  Run: python tools/index_stats.py <index_dir> — prints one JSON line
with corpus size, posting counts, per-table bytes, and bytes/posting for the
delta+FOR/varint block codec (the from-scratch Lucene-postings analog).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.session import get_spark
    from gitlab_elasticsearch_indexer_spark.sources import catalog as cat

    index_dir = sys.argv[1]
    spark = get_spark(app_name="index-stats", cores=8)
    c = cat.read_catalog(index_dir)
    seg = cat.read_table(spark, index_dir, "segments")
    agg = seg.agg(
        F.count("*").alias("n_blocks"),
        F.sum("n_docs").cast("long").alias("n_postings"),
        F.sum(F.octet_length("docids_enc")).cast("long").alias("docid_bytes"),
        F.sum(F.octet_length("tfs_enc")).cast("long").alias("tf_bytes"),
        F.sum(F.octet_length("positions_enc")).cast("long").alias("pos_bytes"),
        F.sum(F.octet_length("offsets_enc")).cast("long").alias("off_bytes"),
        F.countDistinct("term").alias("vocab"),
    ).collect()[0]
    docs = cat.read_table(spark, index_dir, "docs")
    raw_bytes = int(
        docs.agg(F.sum(F.octet_length("content"))).collect()[0][0] or 0
    )
    sd = cat.snapshot_dir(index_dir, c.snapshot)
    payload = int(agg["docid_bytes"] or 0) + int(agg["tf_bytes"] or 0)
    out = {
        "snapshot": c.snapshot,
        "n_docs": c.n_docs,
        "total_tokens": c.total_tokens,
        "vocab": int(agg["vocab"]),
        "n_blocks": int(agg["n_blocks"]),
        "n_postings": int(agg["n_postings"] or 0),
        "docid_bytes": int(agg["docid_bytes"] or 0),
        "tf_bytes": int(agg["tf_bytes"] or 0),
        "positions_bytes": int(agg["pos_bytes"] or 0),
        "offsets_bytes": int(agg["off_bytes"] or 0),
        "bytes_per_posting": round(payload / max(1, int(agg["n_postings"] or 0)), 3),
        "raw_content_bytes": raw_bytes,
        "segments_parquet_bytes": _tree_bytes(os.path.join(sd, "segments")),
        "docs_parquet_bytes": _tree_bytes(os.path.join(sd, "docs")),
        "postings_payload_vs_raw": round(
            payload / max(1, raw_bytes), 4
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
