#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k query against a committed index.

    spark-submit --py-files ges_pkg.zip jobs/search.py \
        --index /data/index --query "spark data query" [-k 10] \
        [--mode blockmax|exhaustive] [--filter "lang = 'en'"] [--phrase]
"""

from __future__ import annotations

import argparse
import os
import sys

# direct `python jobs/x.py` runs: make the repo root importable (spark-submit
# deployments pass the package via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--mode", default="blockmax", choices=["blockmax", "exhaustive"])
    p.add_argument("--filter", help="SQL predicate over doc metadata (Q7)")
    p.add_argument("--phrase", action="store_true")
    p.add_argument(
        "--highlight", action="store_true",
        help="return offset-based snippets for a single-term query "
        "(requires an index built with offsets)",
    )
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from gitlab_elasticsearch_indexer_spark.plans.search import Searcher
    from gitlab_elasticsearch_indexer_spark.session import get_spark

    spark = get_spark(app_name="ges-search", cores=args.cores)
    s = Searcher(spark, args.index)
    if args.highlight:
        out = s.highlight(args.query)
    elif args.phrase:
        out = s.phrase_search(args.query, k=args.k)
    else:
        flt = F.expr(args.filter) if args.filter else None
        out = s.search(args.query, k=args.k, mode=args.mode, doc_filter=flt)
    out.show(args.k, truncate=False)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
