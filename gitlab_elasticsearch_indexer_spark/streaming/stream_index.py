"""Structured Streaming layer.

The reference is strictly batch snapshot-diff (SURVEY.md §2.7) — this module
goes beyond it: the same incremental merge (plans/incremental.py) driven by a
file-source stream of pages_delta drops, plus windowed metrics streams.

Local smoke path: parquet file source → foreachBatch(apply_delta) /
memory-sink windowed agg → processAllAvailable(); on a cluster the source
becomes Kafka/Iceberg-CDC with the identical query graph and checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.incremental import apply_delta
from ..schemas import PAGES_DELTA


def stream_apply_deltas(
    spark: SparkSession,
    delta_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    snapshot_prefix: str = "stream",
):
    """pages_delta parquet drops → incremental index snapshots.

    Each micro-batch applies the reference's op semantics (F4/K1/K2) through
    apply_delta and commits snapshot ``<prefix>_<epoch>``; the streaming
    checkpoint + idempotent snapshot naming give exactly-once maintenance.
    """
    import pyspark.sql.types as T

    schema = T.StructType(list(PAGES_DELTA.fields) + [T.StructField("doc_id", T.LongType(), True)])
    stream = spark.readStream.schema(schema).parquet(delta_dir)

    def handle(batch_df: DataFrame, epoch: int) -> None:
        if batch_df.isEmpty():
            return
        target = f"{snapshot_prefix}_{epoch}"
        # Replay idempotence: if a crash landed between the snapshot pointer
        # flip and the streaming checkpoint commit, the micro-batch re-runs
        # with the target snapshot already current.  Re-applying would read
        # and overwrite the same directory (which Spark rejects) — the
        # epoch's work is already durable, so it is a no-op.
        from ..sources import catalog as cat

        try:
            if cat.current_snapshot(index_dir) == target:
                return
        except FileNotFoundError:
            pass
        apply_delta(spark, index_dir, batch_df, new_snapshot=target)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    late rows beyond the watermark are dropped, state is bounded."""
    # parquet NTZ timestamps → session-TZ timestamps (watermark requires it;
    # session TZ is pinned UTC so the instant is unchanged)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "sum_value",
        )
    )


def run_windowed_batch_equivalent(spark: SparkSession, events_path: str) -> DataFrame:
    """Drive the streaming aggregation over a bounded parquet source to
    completion via a memory sink (local smoke harness) and return the
    result as a DataFrame."""
    import os
    import shutil
    import tempfile

    # file-stream sources require a directory; stage single files into one
    if os.path.isfile(events_path):
        staged = os.path.join(
            tempfile.gettempdir(),
            "ges_stream_src",
            os.path.abspath(events_path).strip("/").replace("/", "_"),
            os.path.basename(events_path),
        )
        os.makedirs(os.path.dirname(staged), exist_ok=True)
        if not os.path.exists(staged):
            shutil.copy(events_path, staged)
        events_path = os.path.dirname(staged)
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = windowed_event_counts(stream)
    name = "ges_windowed_out"
    # complete mode: with a bounded source the watermark never advances past
    # the final batch, so append mode would hold every window in state and
    # emit nothing — complete emits the full result table.
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
