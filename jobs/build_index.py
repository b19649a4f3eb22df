#!/usr/bin/env python
"""spark-submit entry point: full or resumed index build.

    spark-submit --py-files ges_pkg.zip jobs/build_index.py \
        --pages /data/pages_parquet --index /data/index \
        [--analyzer simple] [--positions] [--resume] [--snapshot s1]

On a cluster, package the engine first:
    cd <repo> && zip -r ges_pkg.zip gitlab_elasticsearch_indexer_spark
(the north rule's spark-submit --py-files path; locally get_spark() ships
the zip itself).

The pages input is any parquet/Iceberg table with the input_hint schema
(url, warc_ts, html, text, lang) plus a numeric doc_id column (or pass
--synthesize-from <sf_dir> to derive the deterministic test corpus).
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
    p.add_argument("--pages", help="pages parquet path")
    p.add_argument("--synthesize-from", help="testdata sf dir to derive pages from")
    p.add_argument("--replication", type=int, default=1)
    p.add_argument("--index", required=True)
    p.add_argument("--analyzer", default="simple")
    p.add_argument("--positions", action="store_true")
    p.add_argument("--offsets", action="store_true",
                   help="store per-posting character offsets (implies positions)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--snapshot", default="s1")
    p.add_argument("--cores", type=int, default=None)
    p.add_argument(
        "--blob-type", default=None, choices=["blob", "wiki_blob"],
        help="route blobs into the <type>_index and commit docs into their "
        "own table (reference main.go:125-133); omit for a plain build",
    )
    p.add_argument(
        "--skip-commits", action="store_true",
        help="with --blob-type: gate off the commits table (main.go --skip-commits)",
    )
    p.add_argument(
        "--detect-lang", action="store_true",
        help="fill null/empty lang from content (trigram langid, enry analog "
        "indexer/blob.go:116-127); never overrides an upstream lang",
    )
    p.add_argument(
        "--prog-lang", action="store_true",
        help="add the reference blob's Language field (enry filename/"
        "extension detection, default 'Text') as a prog_language doc column",
    )
    args = p.parse_args()

    from gitlab_elasticsearch_indexer_spark.plans.build_index import build_index
    from gitlab_elasticsearch_indexer_spark.session import get_spark
    from gitlab_elasticsearch_indexer_spark.sources.pages import (
        pages_from_documents,
        pages_scaled,
    )

    spark = get_spark(app_name="ges-build", cores=args.cores)
    if args.synthesize_from:
        if args.replication > 1:
            pages = pages_scaled(spark, args.synthesize_from, args.replication)
        else:
            pages = pages_from_documents(spark, args.synthesize_from)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        p.error("--pages or --synthesize-from required")

    if args.blob_type:
        from gitlab_elasticsearch_indexer_spark.plans.routed_build import build_routed

        res = build_routed(
            spark, pages, args.index,
            blob_type=args.blob_type,
            skip_commits=args.skip_commits,
            analyzer=args.analyzer,
            snapshot=args.snapshot,
            with_positions=args.positions,
            with_offsets=args.offsets,
            resume=args.resume,
            detect_lang=args.detect_lang,
            with_prog_lang=args.prog_lang,
        )
        print(
            f"routed build: {res.blob_type}_index n_docs={res.blob_docs} "
            f"commits={'skipped' if res.commits_table is None else res.commit_docs}"
        )
    else:
        catalog = build_index(
            spark,
            pages,
            args.index,
            analyzer=args.analyzer,
            with_positions=args.positions,
            with_offsets=args.offsets,
            snapshot=args.snapshot,
            resume=args.resume,
            detect_lang=args.detect_lang,
            with_prog_lang=args.prog_lang,
        )
        print(
            f"built snapshot={catalog.snapshot} n_docs={catalog.n_docs} avgdl={catalog.avgdl:.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
