"""Structured Streaming ingestion + windowed/stateful operators over the
``events`` table shape (event_id, ts, user_id, event_type, value, props).

The reference has no stream processing (SURVEY.md §2.11) — this is the
engine's scale extension: the same aggregation semantics exposed over
unbounded input with watermarked event-time windows.

Patterns:
- tumbling/sliding windows: F.window; session windows: F.session_window.
- late data: withWatermark bounds state.
- custom stateful ops: applyInPandasWithState (running per-key counters).
- sinks: memory (tests), parquet/delta append (production).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])

def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over a parquet directory (each new file = a
    micro-batch; swap for kafka/delta source in production).

    The fixtures store ``ts`` as parquet ``timestamp[us]`` (verified at every
    scale factor), which Spark's native TimestampType reads directly — the
    streaming and batch paths share one schema, so a unit drift in the
    fixture would fail both gates identically instead of silently diverging.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-window per-type counts + value sum; watermark bounds late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), "event_type", "n", "sum_value")
    )


def sliding_avg(events: DataFrame, window: str = "1 hour",
                slide: str = "15 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "avg_value")
    )


def session_windows(events: DataFrame, gap: str = "10 minutes",
                    watermark: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based) — session_window is native."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "user_id", "n_events",
                "session_value")
    )


RUNNING_STATE_SCHEMA = StructType([StructField("total", LongType())])
RUNNING_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("total_events", LongType()),
])


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count via
    applyInPandasWithState (the applyInPandasWithState path the reference's
    agent-memory counters would take)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"user_id": [key[0]], "total_events": [count]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, RUNNING_OUT_SCHEMA, RUNNING_STATE_SCHEMA,
            "update", GroupStateTimeout.NoTimeout)
    )


def streaming_dedup(stream: DataFrame, keys: Sequence[str],
                    watermark_col: str = "ts",
                    watermark: str = "90 days") -> DataFrame:
    """Streaming exact dedup: emit the first arrival per key, drop
    re-deliveries within the watermark horizon
    (dropDuplicatesWithinWatermark — state is bounded by the watermark
    instead of growing forever, the property that matters on an unbounded
    100 TB ingest feed). Batch equivalent: dropDuplicates(keys)."""
    return (stream.withWatermark(watermark_col, watermark)
            .dropDuplicatesWithinWatermark(list(keys)))


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "update",
                  timeout_s: int = 120):
    """Drain all available input into an in-memory table (tests)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return q


# ------------------------------------------------------------ text ingest

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def read_docs_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 1,
                     schema: StructType = DOCS_SCHEMA) -> DataFrame:
    """File-source stream of (doc_id, text) batches — each arriving file is
    a micro-batch of document upserts (kafka/delta in production)."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_docs_into_bm25(docs_stream: DataFrame, index,
                          checkpoint: str, timeout_s: int = 600):
    """Continuous text-index maintenance: every micro-batch of documents is
    upserted into an IncrementalBm25Index as ONE postings-delta segment
    (tokenize cost ∝ batch size, never corpus size — the streaming twin of
    the reference's per-upsert transactional index update, crud.rs:19-118).

    foreachBatch is the transactional sink: the index's manifest rename is
    the commit point, and the stream's checkpoint makes redelivery
    idempotent at the batch level (a replayed batch re-writes the same
    last-writer-wins postings). After the drain, ``index.scores()`` serves
    the composed snapshot+delta view with no rebuild."""
    id_col, text_col = index.id_col, index.text_col

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        batch = batch_df.select(id_col, text_col)
        if batch.limit(1).count() == 0:
            return
        index.upsert_docs(batch)

    q = (docs_stream.writeStream.foreachBatch(_sink)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    # incomplete drain = error, not silent truncation: availableNow
    # terminates when the backlog is drained, so a timeout means the
    # index is missing delta segments
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"BM25 ingest drain still running after {timeout_s}s — the "
            "index is incomplete; raise timeout_s")
    return q
