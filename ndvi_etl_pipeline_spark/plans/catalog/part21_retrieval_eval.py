"""Catalog part 21 — retrieval evaluation.

BM25 self-retrieval recall: the eval loop that makes part 11's BM25
a measurable retrieval system (the discipline the ANN tier applies
with recall@5 and part 20 applies to item-CF). Every 25th document
contributes a query — its first four distinct tokens in order of
first occurrence — and BM25 runs ALL queries at once as an
inverted-index join (query-term relation ⋈ term postings), which is
the multi-query form a real retrieval service executes: the posting
relation shuffles once on the term key, query count only widens the
small side. Recall@k asks whether the source document ranks in its
own query's top k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._shared import _t, register
from .part10_data_selection import _TOK_SQL
from .part11_gopher_rules import _BM25_B, _BM25_K1

_Q_EVERY = 25  # every 25th doc contributes a query
_Q_TERMS = 4


@register(
    "bm25_selfretrieval_recall",
    oracle=f"""
    WITH tokpos AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) + 1),
                    i -> struct_pack(i := i, w := w[i]))) AS u
      FROM (SELECT doc_id, {_TOK_SQL} AS w FROM documents
            WHERE length(trim(text)) > 0)),
    tok AS MATERIALIZED (SELECT doc_id, u.w AS w, u.i AS pos FROM tokpos),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    qterms AS MATERIALIZED (
      SELECT doc_id AS q_id, w AS term FROM (
        SELECT doc_id, w,
               row_number() OVER (
                 PARTITION BY doc_id ORDER BY first_pos, w) AS rk
        FROM (SELECT doc_id, w, min(pos) AS first_pos
              FROM tok WHERE doc_id % {_Q_EVERY} = 0
              GROUP BY doc_id, w))
      WHERE rk <= {_Q_TERMS}),
    tf AS MATERIALIZED (
      SELECT t.doc_id, t.w AS term, count(*) AS tf
      FROM tok t
      WHERE t.w IN (SELECT DISTINCT term FROM qterms)
      GROUP BY t.doc_id, t.w),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    idf AS (
      SELECT term, ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf
      FROM df CROSS JOIN stats s),
    scored AS (
      SELECT q.q_id, tf.doc_id,
             sum(idf.idf * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl.dl / s.avgdl))) AS score
      FROM qterms q
      JOIN tf ON tf.term = q.term
      JOIN idf ON idf.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY q.q_id, tf.doc_id),
    ranked AS (
      SELECT q_id, doc_id,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY round(score, 6) DESC, doc_id) AS rank
      FROM scored),
    self_rank AS (
      SELECT q.q_id, min(r.rank) AS rank
      FROM (SELECT DISTINCT q_id FROM qterms) q
      LEFT JOIN ranked r ON r.q_id = q.q_id AND r.doc_id = q.q_id
      GROUP BY q.q_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN rank = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
           CAST(sum(CASE WHEN rank <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_5,
           round(sum(CASE WHEN rank = 1 THEN 1.0 ELSE 0.0 END) / count(*), 6)
             AS recall_at_1,
           round(sum(CASE WHEN rank <= 5 THEN 1.0 ELSE 0.0 END) / count(*), 6)
             AS recall_at_5
    FROM self_rank
    """,
    tags=("retrieval", "evaluation", "documents"),
)
def q_bm25_selfretrieval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-query BM25 with a recall audit: queries are each sampled
    document's first four distinct tokens; scoring is one
    query-terms ⋈ postings join (the inverted-index shape — the
    posting relation shuffles once on term, query volume only
    widens the broadcastable side), ranks are per-query windows over
    the rounded score, and recall@1/@5 asks whether the source
    document retrieves itself. Completes the eval discipline across
    the retrieval tiers (ANN recall@5, item-CF hit-rate@3)."""
    from ...functions.text import tokens as _toks

    d = _t(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    tok = d.select(
        "doc_id", F.posexplode(_toks("text")).alias("pos0", "w")
    ).select("doc_id", "w", (F.col("pos0") + 1).alias("pos"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    qterms = (
        tok.where(F.col("doc_id") % _Q_EVERY == 0)
        .groupBy("doc_id", "w")
        .agg(F.min("pos").alias("first_pos"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("first_pos", "w")
            ),
        )
        .where(F.col("rk") <= _Q_TERMS)
        .select(F.col("doc_id").alias("q_id"), F.col("w").alias("term"))
    )
    terms = qterms.select("term").distinct()
    tf = (
        tok.join(F.broadcast(terms), tok["w"] == terms["term"])
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .withColumnRenamed("w", "term")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats.select("n_docs"))).select(
        "term",
        F.log(
            F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("q_id", "doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * F.col("tf")
                * (_BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("score")
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("q_id").orderBy(
                F.desc(F.round(F.col("score"), 6)), F.asc("doc_id")
            )
        ),
    )
    self_rank = (
        qterms.select("q_id")
        .distinct()
        .join(
            ranked.where(F.col("q_id") == F.col("doc_id")).select("q_id", "rank"),
            "q_id",
            "left",
        )
    )
    return self_rank.agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("rank") == 1, 1).otherwise(0)).cast("bigint").alias("hits_at_1"),
        F.sum(F.when(F.col("rank") <= 5, 1).otherwise(0)).cast("bigint").alias("hits_at_5"),
        F.round(
            F.sum(F.when(F.col("rank") == 1, 1.0).otherwise(0.0)) / F.count("*"), 6
        ).alias("recall_at_1"),
        F.round(
            F.sum(F.when(F.col("rank") <= 5, 1.0).otherwise(0.0)) / F.count("*"), 6
        ).alias("recall_at_5"),
    )
