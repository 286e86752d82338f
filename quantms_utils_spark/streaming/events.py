"""Structured Streaming surface.

The reference has no streaming operators (SURVEY §2.9 — its
``batch_write_mzml_streaming`` is bounded-memory file iteration, not event
streaming). This module is the forward-looking surface the synthetic
``events`` table exists for: the SAME logical transformations as the batch
queries (queries/core.py:event_hourly_agg), applied to a streaming reader
with watermarked event time, so one definition serves both executions —
the Spark idiom for batch/streaming unification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over event parquet/json drops. At cloud
    scale the same code points at a Kafka/queue source; file streaming is the
    deterministic test harness."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def hourly_event_aggregate(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type with late-data
    watermark — the streaming twin of queries/core.py:event_hourly_agg.
    Works on both batch and streaming frames."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def stream_quality_filter(events: DataFrame, min_value: float = 0.0) -> DataFrame:
    """Stateless streaming filter + projection (the shape of a streaming
    ingest-cleaning stage); fully pushes down to the source scan in batch."""
    return events.filter(
        F.col("value") > min_value
    ).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
