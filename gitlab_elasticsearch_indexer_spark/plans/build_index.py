"""End-to-end index build job (reference entry point 1: main.go → IndexBlobs,
SURVEY.md §3.1, re-expressed as one Spark batch job).

Stages (each a separate Spark job over the same lazily-declared lineage):

1. pages → docs           narrow Arrow-UDF transforms (operators/docs.py)
2. docs → tokens          JVM tokenize + (docid,term) partial agg
3. collection stats       N + avgdl (one tiny agg)
4. docs+dl → docs table   (dl joined back — BM25 needs it at query time)
5. tokens → term_stats    groupBy(term) agg with map-side combine
6. tokens → segments      salted (term, docid_range) applyInPandas blocks,
                          written partitionBy(bucket) for query-time pruning
7. lineage + catalog      per-docid_range metrics, then the atomic
                          ``current`` pointer flip (commit barrier, K4)

Checkpointed resume (north rule, O1/O7): ``resume=True`` anti-joins the
docid_ranges already marked done in an interrupted snapshot's lineage table
and only builds the remainder, then unions old + new segment rows.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import (
    ANALYZER_SIMPLE,
    BLOCK_SIZE,
    DOCS_PER_RANGE,
    N_TERM_BUCKETS,
)
from ..operators.docs import build_docs
from ..operators.postings import build_segments, term_stats
from ..operators.tokenize import tokenize, tokenize_with_positions
from ..schemas import LINEAGE
from ..sources import catalog as cat


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    analyzer: str = ANALYZER_SIMPLE,
    project_id: int = 1,
    with_positions: bool = False,
    snapshot: str = "s1",
    resume: bool = False,
    docid_col: str = "doc_id",
) -> cat.Catalog:
    t0 = time.time()
    docs = build_docs(pages, project_id=project_id, docid_col=docid_col)

    tok_fn = tokenize_with_positions if with_positions else tokenize
    tokens = tok_fn(docs, analyzer=analyzer).cache()

    # Doc lengths: left join so empty/binary/too-large docs keep dl=0 and
    # still count toward N (they are real documents, reference F2/F3).
    doc_lens = tokens.groupBy("docid").agg(F.first("dl").alias("dl"))
    docs_with_dl = docs.join(doc_lens, "docid", "left").withColumn(
        "dl", F.coalesce(F.col("dl"), F.lit(0)).cast("int")
    )
    docs_with_dl = docs_with_dl.cache()

    stats_row = docs_with_dl.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"] or 0.0)

    sd = cat.snapshot_dir(index_dir, snapshot)

    done_ranges: set[int] = set()
    if resume:
        try:
            lineage_old = spark.read.parquet(f"{sd}/lineage")
            done_ranges = {
                int(r["partition_key"])
                for r in lineage_old.filter(F.col("status") == "done").collect()
            }
        except Exception:
            done_ranges = set()

    docs_with_dl.write.mode("overwrite").parquet(f"{sd}/docs")
    term_stats(tokens, n_docs).write.mode("overwrite").parquet(f"{sd}/term_stats")

    seg_tokens = tokens
    if done_ranges:
        seg_tokens = tokens.filter(
            ~((F.col("docid") / F.lit(DOCS_PER_RANGE)).cast("long")).isin(
                list(done_ranges)
            )
        )
    segments = build_segments(seg_tokens, avgdl=avgdl, with_positions=with_positions)
    mode = "append" if done_ranges else "overwrite"
    segments.write.mode(mode).partitionBy("bucket").parquet(f"{sd}/segments")

    # Lineage: per-docid_range doc/token counts + status (resume anchor).
    wall_ms = int((time.time() - t0) * 1000)
    lineage = (
        tokens.withColumn(
            "partition_key",
            ((F.col("docid") / F.lit(DOCS_PER_RANGE)).cast("long")).cast("string"),
        )
        .groupBy("partition_key")
        .agg(
            F.countDistinct("docid").alias("n_docs"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
        .select(
            "partition_key",
            F.lit(None).cast("string").alias("from_snapshot"),
            F.lit(snapshot).alias("to_snapshot"),
            "n_docs",
            "n_tokens",
            F.lit("done").alias("status"),
            F.lit(wall_ms).alias("wall_ms"),
        )
    )
    lineage.write.mode("overwrite").parquet(f"{sd}/lineage")

    catalog = cat.Catalog(
        n_docs=n_docs,
        avgdl=avgdl,
        analyzer=analyzer,
        block_size=BLOCK_SIZE,
        docs_per_range=DOCS_PER_RANGE,
        n_term_buckets=N_TERM_BUCKETS,
        snapshot=snapshot,
        with_positions=with_positions,
    )
    cat.write_catalog(index_dir, catalog)
    cat.commit_snapshot(index_dir, snapshot)
    tokens.unpersist()
    docs_with_dl.unpersist()
    return catalog
