"""Shared materialized relations for the recall/calibration family.

`ann_ivf_trained_recall` and `quantized_ann_recall` (the sweep's two
slowest entries, 14.8 s and 6.9 s at sf0.01 in round 2) each
recomputed the SAME exact brute-force top-k and (for the trained pair)
the SAME k-means trajectory from scratch. These helpers compute each
once per (session, sf_dir, params) and hand back a
`materialize()`d DataFrame / collected centroid list, so a sweep or
driver run over the whole family pays for the baseline once.

Keyed by applicationId so a fresh SparkSession never sees another
session's checkpoint blocks; entries are tiny (k rows / k vectors).
Entries from OTHER applicationIds are evicted on every lookup —
without that, a process cycling many sessions (test suites) pins
dead sessions' DataFrames and checkpoint-block references forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators.iterate import materialize
from ...sources.testdata import load_table

_EXACT_TOPK: dict[tuple, DataFrame] = {}
_CENTROIDS: dict[tuple, list] = {}
_PQ_BOOKS: dict[tuple, list] = {}


def _evict_other_apps(cache: dict[tuple, object], app_id: str) -> None:
    for key in [k for k in cache if k[0] != app_id]:
        del cache[key]


def exact_topk_shared(
    spark: SparkSession, sf_dir: str, k: int = 5, split: int = 5
) -> DataFrame:
    """Exact cosine top-k (numpy kernel) of queries vec_id<split vs
    corpus vec_id>=split, materialized once per (session, sf_dir, k,
    split) and shared across every recall/calibration query."""
    from ...operators.similarity import brute_force_topk_np

    key = (spark.sparkContext.applicationId, sf_dir, k, split)
    _evict_other_apps(_EXACT_TOPK, key[0])
    df = _EXACT_TOPK.get(key)
    if df is None:
        e = load_table(spark, "embeddings", sf_dir)
        df = materialize(
            brute_force_topk_np(
                e.filter(F.col("vec_id") >= split),
                e.filter(F.col("vec_id") < split),
                k=k,
            )
        )
        _EXACT_TOPK[key] = df
    return df


def kmeans_centroids_shared(
    spark: SparkSession, sf_dir: str, k: int = 4, iterations: int = 3
) -> list:
    """The (cid, vector) centroid list of the catalog's canonical
    k-means trajectory, trained once per (session, sf_dir, k, iters)
    — `ann_ivf_trained` and `ann_ivf_trained_recall` both serve from
    it instead of re-running Lloyd's build-time jobs."""
    from ...operators.clustering import kmeans_centroid_vectors

    key = (spark.sparkContext.applicationId, sf_dir, k, iterations)
    _evict_other_apps(_CENTROIDS, key[0])
    cents = _CENTROIDS.get(key)
    if cents is None:
        e = load_table(spark, "embeddings", sf_dir)
        cents = kmeans_centroid_vectors(e, k=k, iterations=iterations)
        _CENTROIDS[key] = cents
    return cents


def exact_l2_topk_shared(
    spark: SparkSession, sf_dir: str, k: int = 5, split: int = 5
) -> DataFrame:
    """Exact L2 top-k (native zip_with/aggregate) of queries
    vec_id<split vs corpus vec_id>=split — the ground-truth side every
    L2-family recall audit (`pq_recall_l2`, `ivfpq_residual_recall`)
    joins against, materialized once per (session, sf_dir, k, split).
    Columns: (query_id, vec_id)."""
    from pyspark.sql import Window

    from ...operators.similarity import l2_dist2

    key = (spark.sparkContext.applicationId, "l2", sf_dir, k, split)
    _evict_other_apps(_EXACT_TOPK, key[0])
    df = _EXACT_TOPK.get(key)
    if df is None:
        e = load_table(spark, "embeddings", sf_dir)
        qv = e.filter(F.col("vec_id") < split).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        cv = e.filter(F.col("vec_id") >= split).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("cv")
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
        df = materialize(
            cv.crossJoin(F.broadcast(qv))
            .select("query_id", "vec_id", l2_dist2("qv", "cv").alias("d2"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "vec_id")
        )
        _EXACT_TOPK[key] = df
    return df


def pq_codebooks_shared(
    spark: SparkSession, sf_dir: str, m: int = 4, k: int = 8, iterations: int = 2
) -> list:
    """PQ codebooks of the catalog's canonical trajectory
    (similarity.pq_train over the full embeddings table), trained once
    per (session, sf_dir, m, k, iters) — `pq_adc_topk`, `pq_recall_l2`
    and `ivfpq_adc_topk` all quantize with the same books, so a sweep
    pays the m joint Lloyd runs once. Driver-tiny: m·k·(dims/m)
    doubles."""
    from ...operators.similarity import pq_train

    key = (spark.sparkContext.applicationId, sf_dir, m, k, iterations)
    _evict_other_apps(_PQ_BOOKS, key[0])
    books = _PQ_BOOKS.get(key)
    if books is None:
        e = load_table(spark, "embeddings", sf_dir)
        books = pq_train(e, m=m, k=k, iterations=iterations)
        _PQ_BOOKS[key] = books
    return books
