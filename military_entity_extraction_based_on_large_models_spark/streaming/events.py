"""Streaming analytics over the events table shape
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming semantics (single pass over a static dict,
foundation_workflow.py:67) — SURVEY.md §2.8 records the surface as absent.
These transforms exist because a corpus-ingestion engine at 100 TB inevitably
tails an event/log stream; they are plain DataFrame transforms that work
identically on a batch frame and a ``readStream`` frame, which is how the
tests exercise them (batch parity + one real micro-batch run).

* windowed_counts — tumbling-window counts per event_type with a watermark
  for late data.
* sessionize      — session windows (30 min gap) per user via
  ``F.session_window`` (stateful, watermark-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame) -> DataFrame:
    # parquet written elsewhere may carry TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP (session TZ is pinned UTC, so the cast is value-preserving)
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    events = _with_event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.window("ts", window).alias("win"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    events = _with_event_time(events)
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("sess"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_from_parquet_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream over a parquet directory (for tests: copy files in
    to simulate arrival).  Alias of documents.stream_documents — one
    implementation, so option plumbing lands in one place."""
    from .documents import stream_documents

    return stream_documents(spark, path, schema)
