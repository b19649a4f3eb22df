#!/usr/bin/env python
"""spark-submit entry point: training-data corpus preparation.

    spark-submit --py-files ges_pkg.zip jobs/corpus_prep.py \
        --documents /data/documents_parquet --out /data/prepared \
        [--min-tokens 10] [--min-quality 0.5] [--languages en,es] \
        [--min-jaccard 0.8] [--max-bucket 2000]

Runs the composed pipeline (quality gate → langid gate → exact dedup →
MinHash-LSH near-dup dedup → BPE-ish token budget), writes the prepared
per-doc table, and prints the per-language summary as JSON lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="output parquet path")
    p.add_argument("--min-tokens", type=int, default=10)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--languages", default=None, help="comma list, e.g. en,es")
    p.add_argument("--n-bands", type=int, default=16)
    p.add_argument("--rows-per-band", type=int, default=8)
    p.add_argument("--min-jaccard", type=float, default=0.8)
    p.add_argument("--max-bucket", type=int, default=None)
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args()

    from gitlab_elasticsearch_indexer_spark.plans.corpus_prep import (
        corpus_prep,
        corpus_prep_summary,
    )
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    spark = get_spark(app_name="ges-corpus-prep", cores=args.cores)
    docs = spark.read.parquet(args.documents)
    prepared = corpus_prep(
        docs,
        min_tokens=args.min_tokens,
        min_quality=args.min_quality,
        languages=tuple(args.languages.split(",")) if args.languages else None,
        n_bands=args.n_bands,
        rows_per_band=args.rows_per_band,
        min_jaccard=args.min_jaccard,
        max_bucket=args.max_bucket,
    )
    prepared.write.mode("overwrite").parquet(args.out)
    for row in corpus_prep_summary(spark.read.parquet(args.out)).collect():
        print(json.dumps(row.asDict()))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
