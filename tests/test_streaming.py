"""Structured Streaming layer: windowed aggregation over a bounded source
and foreachBatch-driven incremental index maintenance."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL

from gitlab_elasticsearch_indexer_spark.plans.build_index import build_index
from gitlab_elasticsearch_indexer_spark.plans.search import Searcher
from gitlab_elasticsearch_indexer_spark.sources import catalog as cat
from gitlab_elasticsearch_indexer_spark.sources.pages import pages_from_documents
from gitlab_elasticsearch_indexer_spark.streaming.stream_index import (
    run_windowed_batch_equivalent,
    stream_apply_deltas,
)


def test_windowed_counts_match_batch(spark):
    got = run_windowed_batch_equivalent(spark, f"{SF_SMALL}/events.parquet").toPandas()
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    want = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .toPandas()
    )
    key = ["hour", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)[want.columns]
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want)


def test_stream_apply_deltas(spark, tmp_path):
    index_dir = str(tmp_path / "idx")
    pages = pages_from_documents(spark, SF_SMALL)
    build_index(spark, pages, index_dir, snapshot="s1")
    n0 = cat.read_catalog(index_dir).n_docs

    # drop a delta batch: delete doc 0, add a new page
    delta = (
        pages.filter(F.col("doc_id") == 0)
        .select(
            "url", "warc_ts", "html", "text", "lang",
            F.lit("DELETED").alias("op"),
            F.col("url").alias("old_url"),
            F.col("doc_id"),
        )
        .unionByName(
            pages.filter(F.col("doc_id") == 1).select(
                F.concat(F.col("url"), F.lit(".new")).alias("url"),
                "warc_ts",
                F.encode(F.lit("brand new streamed page"), "UTF-8").alias("html"),
                F.lit("brand new streamed page").alias("text"),
                "lang",
                F.lit("ADDED").alias("op"),
                F.lit(None).cast("string").alias("old_url"),
                F.lit(900000).cast("long").alias("doc_id"),
            )
        )
    )
    delta_dir = str(tmp_path / "deltas")
    delta.write.mode("overwrite").parquet(delta_dir)

    q = stream_apply_deltas(
        spark, delta_dir, index_dir, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    c = cat.read_catalog(index_dir)
    assert c.snapshot.startswith("stream_")
    assert c.n_docs == n0  # one deleted, one added
    s = Searcher(spark, index_dir)
    hits = s.search("streamed", k=5, with_docs=False).collect()
    assert [r["docid"] for r in hits] == [900000]
    assert s.docs.filter(F.col("docid") == 0).count() == 0


def test_stateful_sessionize_matches_batch(spark):
    """applyInPandasWithState sessionization over a bounded stream must
    equal the batch window-lag sessionization (same gap semantics)."""
    from conftest import SF_SMALL

    from gitlab_elasticsearch_indexer_spark.streaming.sessionize import (
        run_sessionize_batch_equivalent,
    )

    got = (
        run_sessionize_batch_equivalent(spark, f"{SF_SMALL}/events.parquet")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    want = (
        ev.withColumn("ns", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("ns").cast("long").alias("n_sessions"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert (got["n_sessions"] >= 1).all()
