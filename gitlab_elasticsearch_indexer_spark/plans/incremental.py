"""Incremental index maintenance: apply a pages_delta to a committed snapshot
(reference entry point 1 in incremental mode — FROM_SHA..TO_SHA snapshot
diff, git/gitaly.go:158-219 op dispatch + elastic bulk upsert/delete,
SURVEY.md F4/K1/K2/O1/O7).

Semantics (mirroring git/gitaly.go:186-215):
- DELETED          → remove the doc at ``old_url`` (or ``url``)
- RENAMED          → remove ``old_url`` doc AND upsert the delta row's doc
                     (both ops, like the reference's put+del pair)
- ADDED/MODIFIED/
  COPIED           → idempotent upsert by url (deterministic IDs make
                     re-runs safe, O7)

Spark shape: the delta is tiny relative to the corpus, so removals are a
broadcast anti-join and upserts a unionByName — the DataFrame-level
equivalent of Iceberg ``MERGE INTO docs USING delta ON docs.url = delta.url
WHEN MATCHED [AND op='DELETED'] THEN DELETE / UPDATE WHEN NOT MATCHED THEN
INSERT`` (which this becomes verbatim once an Iceberg catalog is attached).

Segment maintenance is partition-local: only the docid_ranges containing
touched docs are rebuilt; untouched ranges' block rows are carried over
unchanged (their (max_tf, min_dl) block-max metadata is avgdl-independent,
so bounds stay valid as collection stats shift).  Collection stats and
term_stats are recomputed exactly — a cheap full agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DOCS_PER_RANGE
from ..operators.docs import build_docs
from ..operators.postings import build_segments, term_stats_from_segments
from ..operators.tokenize import tokens_expr
from ..schemas import LINEAGE
from ..sources import catalog as cat


def apply_delta(
    spark: SparkSession,
    index_dir: str,
    delta: DataFrame,
    new_snapshot: str,
    project_id: int = 1,
) -> cat.Catalog:
    """delta: PAGES_DELTA-shaped (+ doc_id for new/modified rows)."""
    old = cat.read_catalog(index_dir)
    docs_old = cat.read_table(spark, index_dir, "docs", old.snapshot)
    seg_old = cat.read_table(spark, index_dir, "segments", old.snapshot)

    # the old catalog's full index config — rebuilt ranges must reproduce it
    # exactly (positions payloads, per-field dl columns, namespaced terms)
    fields_meta = old.fields or {}
    field_analyzers = {fld: m["analyzer"] for fld, m in fields_meta.items()}

    removals = delta.filter(F.col("op").isin("DELETED", "RENAMED")).select(
        F.coalesce(F.col("old_url"), F.col("url")).alias("url")
    )
    puts = delta.filter(F.col("op").isin("ADDED", "MODIFIED", "COPIED", "RENAMED"))

    new_docs = build_docs(puts, project_id=project_id).withColumn(
        "dl", F.size(tokens_expr(old.analyzer)).cast("int")
    )
    for fld, fld_an in field_analyzers.items():
        new_docs = new_docs.withColumn(
            f"dl_{fld}", F.size(tokens_expr(fld_an, text_col=fld)).cast("int")
        )

    # MERGE: delete + upsert (broadcast both small sides)
    survivors = docs_old.join(
        F.broadcast(removals), "url", "left_anti"
    ).join(
        F.broadcast(puts.select("url")), "url", "left_anti"  # replaced rows
    )
    docs_new = survivors.unionByName(new_docs.select(*survivors.columns)).cache()

    stats_row = docs_new.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[F.avg(f"dl_{fld}").alias(f"avgdl_{fld}") for fld in fields_meta],
    ).collect()[0]
    n_docs, avgdl = int(stats_row["n"]), float(stats_row["avgdl"] or 0.0)
    new_fields_meta = {
        fld: {
            "analyzer": m["analyzer"],
            "dl_col": m["dl_col"],
            "avgdl": float(stats_row[f"avgdl_{fld}"] or 0.0),
        }
        for fld, m in fields_meta.items()
    }

    # Affected ranges: every docid that was removed, replaced, or added.
    # Stays a DATAFRAME — a bulk delta (e.g. a full re-crawl) can touch
    # every range, and a collected list would put n_docs/8192 entries on
    # the driver; semi/anti-joins keep the rebuild fully distributed.
    range_expr = (F.col("docid") / F.lit(DOCS_PER_RANGE)).cast("long")
    removed_docids = docs_old.join(
        F.broadcast(removals.unionByName(puts.select("url"))), "url", "left_semi"
    ).select("docid")
    affected = (
        removed_docids.unionByName(new_docs.select("docid"))
        .select(range_expr.alias("docid_range"))
        .distinct()
        .cache()
    )

    # Rebuild only affected ranges from the NEW doc set; carry the rest over.
    # Occurrence generation goes through the SAME path as the full build
    # (field_occurrences) so rebuilt ranges keep positions payloads and
    # field-namespaced terms on positions / multi-field indexes.
    from .build_index import field_occurrences

    rebuild_docs = docs_new.join(
        affected, range_expr == affected["docid_range"], "left_semi"
    )
    rebuild_occ = field_occurrences(
        rebuild_docs, old.analyzer, old.with_positions, field_analyzers,
        with_offsets=old.with_offsets,
    )
    seg_keep = seg_old.join(affected, "docid_range", "left_anti")
    seg_new = build_segments(
        rebuild_occ, avgdl=avgdl, with_positions=old.with_positions,
        with_offsets=old.with_offsets,
    )
    # allowMissingColumns: indexes written before the offsets_enc column
    # existed read as 13-column segments; rebuilt rows carry the full schema
    segments = seg_keep.unionByName(seg_new, allowMissingColumns=True)

    sd = cat.snapshot_dir(index_dir, new_snapshot)
    docs_new.write.mode("overwrite").parquet(f"{sd}/docs")
    segments.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(
        f"{sd}/segments"
    )
    # exact term stats from the merged segments' block metadata
    seg_read = spark.read.parquet(f"{sd}/segments")
    term_stats_from_segments(seg_read, n_docs).write.mode("overwrite").parquet(
        f"{sd}/term_stats"
    )

    # lineage written distributively from the affected-range DataFrame
    lineage = affected.select(
        F.col("docid_range").cast("string").alias("partition_key"),
        F.lit(old.snapshot).alias("from_snapshot"),
        F.lit(new_snapshot).alias("to_snapshot"),
        F.lit(0).cast("long").alias("n_docs"),
        F.lit(0).cast("long").alias("n_tokens"),
        F.lit("done").alias("status"),
        F.lit(0).cast("long").alias("wall_ms"),
    )
    lineage.write.mode("overwrite").parquet(f"{sd}/lineage")
    if spark.read.parquet(f"{sd}/lineage").isEmpty():
        spark.createDataFrame(
            [("-", old.snapshot, new_snapshot, 0, 0, "done", 0)], LINEAGE
        ).coalesce(1).write.mode("overwrite").parquet(f"{sd}/lineage")
    affected.unpersist()

    catalog = cat.Catalog(
        n_docs=n_docs,
        avgdl=avgdl,
        analyzer=old.analyzer,
        block_size=old.block_size,
        docs_per_range=old.docs_per_range,
        n_term_buckets=old.n_term_buckets,
        snapshot=new_snapshot,
        with_positions=old.with_positions,
        fields=new_fields_meta or None,
        with_offsets=old.with_offsets,
    )
    cat.write_catalog(index_dir, catalog)
    cat.commit_snapshot(index_dir, new_snapshot)
    docs_new.unpersist()
    return catalog
