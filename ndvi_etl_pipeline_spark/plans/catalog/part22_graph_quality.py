"""Catalog part 22 — graph-quality metrics & context-length planning.

* **kNN-graph reciprocity**: the fraction of exact cosine top-k
  edges that are mutual — the standard health metric for the
  embedding neighborhood graphs the near-dup and SemDeDup tiers
  build on (low reciprocity ⇒ hubness ⇒ LSH/IVF recall trouble).
  All-pairs cosine in the relational long form (join on dim,
  group by pair) — the n²d stage is the audit-tier cost paid on
  the slice where exactness is affordable.
* **Context-length truncation census**: for candidate context sizes,
  the documents truncated, the token mass lost, and the packed-bin
  count — the numbers behind choosing a training context length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._shared import _t, register

_KNN_K = 5
_CONTEXTS = (512, 2048, 8192)


@register(
    "knn_graph_reciprocity",
    oracle=f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, CAST(t.i AS INT) AS idx,
             CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range(1, 65) AS t(i)
      WHERE t.i <= len(embedding)),
    nrm AS MATERIALIZED (
      SELECT vec_id, sqrt(sum(val * val)) AS n FROM pts GROUP BY vec_id),
    dots AS MATERIALIZED (
      SELECT a.vec_id AS a, b.vec_id AS b, sum(a.val * b.val) AS dot
      FROM pts a JOIN pts b ON a.idx = b.idx AND a.vec_id <> b.vec_id
      GROUP BY 1, 2),
    cos AS (
      SELECT d.a, d.b, round(d.dot / (na.n * nb.n), 6) AS c
      FROM dots d JOIN nrm na ON na.vec_id = d.a JOIN nrm nb ON nb.vec_id = d.b),
    knn AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT cos.*, row_number() OVER (
          PARTITION BY a ORDER BY c DESC, b) AS rk
        FROM cos)
      WHERE rk <= {_KNN_K}),
    mutual AS (
      SELECT k1.a, k1.b FROM knn k1
      JOIN knn k2 ON k2.a = k1.b AND k2.b = k1.a)
    SELECT CAST((SELECT count(DISTINCT a) FROM knn) AS BIGINT) AS n_nodes,
           {_KNN_K} AS k,
           CAST((SELECT count(*) FROM knn) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM mutual) AS BIGINT) AS n_mutual,
           round(CAST((SELECT count(*) FROM mutual) AS DOUBLE)
                 / (SELECT count(*) FROM knn), 6) AS reciprocity
    """,
    tags=("graph", "embedding", "evaluation"),
)
def q_knn_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the exact cosine top-5 neighbor graph: the
    fraction of kNN edges that are mutual — the hubness health check
    for the embedding-space graphs the near-dup/SemDeDup tiers rely
    on. All-pairs cosine in relational long form (join on the dim
    key, pair-grouped dot products), top-k per node on the rounded
    cosine, then a self-join on reversed edges. The n²·d stage is
    deliberate audit-tier cost — the serving tiers (IVF, LSH, PQ)
    exist so production never pays it."""
    e = _t(spark, sf_dir, "embeddings")
    pts = e.select(
        "vec_id", F.posexplode("embedding").alias("idx0", "val0")
    ).select(
        "vec_id", (F.col("idx0") + 1).alias("idx"), F.col("val0").cast("double").alias("val")
    )
    nrm = pts.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("n"))
    a = pts.select(F.col("vec_id").alias("a"), "idx", F.col("val").alias("va"))
    b = pts.select(F.col("vec_id").alias("b"), "idx", F.col("val").alias("vb"))
    dots = (
        a.join(b, "idx")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    cos = (
        dots.join(nrm.select(F.col("vec_id").alias("a"), F.col("n").alias("na")), "a")
        .join(nrm.select(F.col("vec_id").alias("b"), F.col("n").alias("nb")), "b")
        .select("a", "b", F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("c"))
    )
    knn = (
        cos.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("a").orderBy(F.desc("c"), F.asc("b"))),
        )
        .where(F.col("rk") <= _KNN_K)
        .select("a", "b")
    )
    rev = knn.select(F.col("b").alias("a"), F.col("a").alias("b"))
    mutual = knn.join(rev, ["a", "b"])
    stats = knn.agg(
        F.count_distinct("a").cast("bigint").alias("n_nodes"),
        F.count("*").cast("bigint").alias("n_edges"),
    )
    mu = mutual.agg(F.count("*").cast("bigint").alias("n_mutual"))
    return stats.crossJoin(mu).select(
        "n_nodes",
        F.lit(_KNN_K).cast("int").alias("k"),
        "n_edges",
        "n_mutual",
        F.round(F.col("n_mutual").cast("double") / F.col("n_edges"), 6).alias("reciprocity"),
    )


@register(
    "context_truncation_census",
    oracle=f"""
    WITH d AS (
      SELECT len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents WHERE length(trim(text)) > 0),
    ctx AS (SELECT unnest([{", ".join(str(c) for c in _CONTEXTS)}]) AS c)
    SELECT c AS context_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_tok > c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_truncated,
           CAST(sum(greatest(n_tok - c, 0)) AS BIGINT) AS tokens_lost,
           round(CAST(sum(greatest(n_tok - c, 0)) AS DOUBLE) / sum(n_tok), 6)
             AS frac_lost,
           CAST(ceil(sum(least(n_tok, c)) / CAST(c AS DOUBLE)) AS BIGINT)
             AS packed_bins
    FROM d CROSS JOIN ctx
    GROUP BY c
    """,
    tags=("curation", "documents"),
)
def q_context_truncation_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length planning: for each candidate training context,
    the documents truncated, the token mass lost, and the
    end-to-end packed-bin count — one corpus token-count pass
    exploded over the (3-element) candidate grid, all exact
    integers. The numbers behind the 'what sequence length do we
    train at' decision."""
    from ...functions.text import token_count

    d = (
        _t(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select(token_count("text").alias("n_tok"))
    )
    ctx = F.explode(F.array(*[F.lit(c) for c in _CONTEXTS])).alias("c")
    long = d.select("n_tok", ctx)
    agg = long.groupBy("c").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_tok") > F.col("c"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_truncated"),
        F.sum(F.greatest(F.col("n_tok") - F.col("c"), F.lit(0)))
        .cast("bigint")
        .alias("tokens_lost"),
        F.round(
            F.sum(F.greatest(F.col("n_tok") - F.col("c"), F.lit(0))).cast("double")
            / F.sum("n_tok"),
            6,
        ).alias("frac_lost"),
        F.ceil(
            F.sum(F.least(F.col("n_tok"), F.col("c")))
            / F.col("c").cast("double")
        )
        .cast("bigint")
        .alias("packed_bins"),
    )
    return agg.withColumnRenamed("c", "context_len")

