"""Structured Streaming surface of the engine.

The reference is batch-only (SURVEY §2.9), but its scene feed — a
date-ordered catalog scan — is exactly a streaming file source. This
module gives the engine's streaming tier over the `events` schema:

- `hourly_rollup`: watermarked tumbling-window aggregation whose
  OUTPUT SEMANTICS match plans/queries.py::q_events_hourly_rollup
  (the batch twin the oracle checks) — same windows, same aggregates.
- `run_stream_over_parquet`: drives any of these queries over a
  parquet directory as a bounded stream (memory sink +
  processAllAvailable), which is how the tests verify
  batch/streaming agreement without Kafka.

Watermark: 2 hours — late events beyond that are dropped from the
window state, bounding state size (the 100 TB concern: state is
O(open windows × groups), never O(events)).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window: count + sum(value) per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_activity(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding windows (1 h window / 15 min slide): events per user bucket."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-based), the streaming twin of
    q_events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_stream_over_parquet(
    spark: SparkSession,
    parquet_path: str,
    transform,
    query_name: str = "stream_out",
) -> DataFrame:
    """Drive `transform(stream_df)` over a parquet dir as a bounded
    stream; returns the materialized result (memory sink, complete mode
    for aggregations).

    Parquet nanos caveat: streaming readers inherit the session's
    nanosAsLong, so ts arrives as LONG nanos — converted here exactly
    like sources/testdata.py does for batch.
    """
    # FileStreamSource requires a directory; single-file inputs get a
    # temp dir with a symlink (zero-copy).
    if os.path.isfile(parquet_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(parquet_path, os.path.join(d, os.path.basename(parquet_path)))
        parquet_path = d
    raw = (
        spark.readStream.schema(_nanos_schema())
        .format("parquet")
        .load(parquet_path)
    )
    events = raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    )
    q = (
        transform(events)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def _nanos_schema() -> T.StructType:
    fields = []
    for f in EVENTS_SCHEMA.fields:
        if f.name == "ts":
            fields.append(T.StructField("ts", T.LongType()))
        else:
            fields.append(f)
    return T.StructType(fields)
