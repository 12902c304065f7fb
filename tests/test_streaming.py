"""Streaming tier: batch/stream agreement on the hourly rollup."""

import pyspark.sql.functions as F

from ndvi_etl_pipeline_spark.plans.queries import q_events_hourly_rollup
from ndvi_etl_pipeline_spark.streaming.events import (
    hourly_rollup,
    run_stream_over_parquet,
    session_windows,
)


def test_stream_matches_batch_hourly(spark, sf_dir):
    stream_out = run_stream_over_parquet(
        spark, f"{sf_dir}/events.parquet", hourly_rollup, query_name="t_hourly"
    )
    batch_out = (
        q_events_hourly_rollup(spark, sf_dir)
        .withColumnRenamed("total_value", "total_value_b")
        .withColumnRenamed("n", "n_b")
    )
    j = stream_out.join(batch_out, ["window_start", "event_type"], "full_outer")
    mismatches = j.filter(
        F.col("n").isNull()
        | F.col("n_b").isNull()
        | (F.col("n") != F.col("n_b"))
        | (F.abs(F.col("total_value") - F.col("total_value_b")) > 1e-6)
    ).count()
    assert mismatches == 0
    assert stream_out.count() > 0


def test_session_windows_run(spark, sf_dir):
    out = run_stream_over_parquet(
        spark, f"{sf_dir}/events.parquet", session_windows, query_name="t_sessions"
    )
    assert out.count() > 0
    assert out.filter(F.col("session_end") < F.col("session_start")).count() == 0
