"""Routed dual-doc-type build (reference F5/K5).

The reference binary selects its target index by blob type and gates commit
indexing with ``--skip-commits`` (main.go:125-133): one run puts blob docs
into the blob (or wiki_blob) index and commit docs into the SEPARATE
commits index (elastic/client.go:60-62; bulk requests carry the index name
per doc, client.go:213-219).

Spark shape: the full-text blob index is a normal ``build_index`` run into
``<root>/<blob_type>_index``; the commit docs are a second, metadata-only
table written to ``<root>/commits`` in the same job — one pages scan feeds
both doc types (the meta projection is a narrow select off the same
DataFrame, so Spark schedules it as an independent action over the cached
source, not a second ingest).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.meta import meta_docs_from_pages
from .build_index import build_index


@dataclass
class RoutedBuildResult:
    blob_index: str        # index dir of the blob/wiki_blob doc type
    blob_type: str         # "blob" | "wiki_blob" (main.go:125-133)
    blob_docs: int
    commits_table: str | None  # None when skip_commits gated it off
    commit_docs: int


def build_routed(
    spark: SparkSession,
    pages: DataFrame,
    root_dir: str,
    blob_type: str = "blob",
    skip_commits: bool = False,
    analyzer: str = "simple",
    snapshot: str = "s1",
    project_id: int = 1,
    with_positions: bool = False,
    with_offsets: bool = False,
    resume: bool = False,
    detect_lang: bool = False,
    with_prog_lang: bool = False,
) -> RoutedBuildResult:
    if blob_type not in ("blob", "wiki_blob"):
        raise ValueError(f"unknown blob type {blob_type!r}")
    blob_index = os.path.join(root_dir, f"{blob_type}_index")
    catalog = build_index(
        spark, pages, blob_index, analyzer=analyzer, snapshot=snapshot,
        project_id=project_id, with_positions=with_positions,
        with_offsets=with_offsets, resume=resume, detect_lang=detect_lang,
        with_prog_lang=with_prog_lang,
    )
    commits_table = None
    commit_docs = 0
    if not skip_commits:
        commits_table = os.path.join(root_dir, "commits")
        # observe() collects the row count DURING the write job — no second
        # count() pass over the just-written table
        obs = Observation("commits_write")
        meta = meta_docs_from_pages(pages, project_id=project_id).observe(
            obs, F.count(F.lit(1)).alias("n")
        )
        meta.write.mode("overwrite").parquet(commits_table)
        commit_docs = int(obs.get["n"])
    return RoutedBuildResult(
        blob_index=blob_index,
        blob_type=blob_type,
        blob_docs=catalog.n_docs,
        commits_table=commits_table,
        commit_docs=commit_docs,
    )
