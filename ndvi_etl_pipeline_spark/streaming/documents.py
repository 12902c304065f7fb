"""Incremental training-data curation: a JSONL landing zone streamed
into a deduplicated, quality-gated curated store.

The batch curation pipeline (`plans/queries.py::curation_pipeline`,
operators/curation.py) as a Structured Streaming job — the shape a
100 TB corpus actually arrives in (crawl drops landing continuously,
the curated store must stay append-only and duplicate-free):

    readStream(json landing) → foreachBatch:
        quality gate (pure column exprs)
        within-batch fingerprint dedup (keep lowest doc_id)
        cross-batch dedup: anti-join against the curated store's own
          fingerprint column (the store IS the ledger — no second
          state table to drift out of sync; same device as
          streaming/scenes.py's pairing ledger)
        append curated parquet

Exactly-once per content fingerprint: replayed batches re-anti-join
against the store and insert nothing (the K3 DO-NOTHING upsert idiom,
load_to_postgis.py:163, applied to a stream). foreachBatch is the
right tool because the dedup key is CONTENT, unbounded in time — a
watermarked dropDuplicates would age fingerprints out and re-admit
late duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import exact_fingerprint, quality_score

LANDING_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

CURATED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
        T.StructField("quality", T.DoubleType()),
    ]
)


def _read_curated(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(CURATED_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], CURATED_SCHEMA)


def curate_batch(
    batch_df: DataFrame, curated_path: str, min_quality: float = 0.5
) -> DataFrame:
    """One micro-batch through the gate: returns the rows to append
    (pure function of batch + current store — unit-testable without a
    stream)."""
    spark = batch_df.sparkSession
    gated = (
        batch_df.filter(F.col("text").isNotNull() & (F.length("text") >= 20))
        .withColumn("fingerprint", exact_fingerprint("text"))
        .withColumn("quality", quality_score("text"))
        .filter(F.col("quality") >= min_quality)
    )
    # within-batch: one winner per fingerprint, deterministic
    in_batch = gated.groupBy("fingerprint").agg(
        F.min_by(
            F.struct("doc_id", "text", "source", "quality"), F.col("doc_id")
        ).alias("w")
    ).select(
        F.col("w.doc_id").alias("doc_id"),
        F.col("w.text").alias("text"),
        F.col("w.source").alias("source"),
        "fingerprint",
        F.col("w.quality").alias("quality"),
    )
    seen = _read_curated(spark, curated_path).select("fingerprint")
    return in_batch.join(seen, "fingerprint", "left_anti").select(
        "doc_id", "text", "source", "fingerprint", "quality"
    )


def stream_curated_documents(
    spark: SparkSession,
    landing_dir: str,
    curated_path: str,
    checkpoint_dir: str,
    min_quality: float = 0.5,
) -> None:
    """Drain the landing zone (availableNow) into the curated store."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        fresh = curate_batch(batch_df, curated_path, min_quality)
        fresh.write.mode("append").parquet(curated_path)

    reader = spark.readStream.schema(LANDING_SCHEMA).json(landing_dir)
    q = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
