"""Catalog part 19 — link analysis & sequential pattern mining.

* **HITS hubs & authorities** (Kleinberg 1999): the alternating
  a = Aᵀh / h = Aa iteration on the supplier→part supply graph —
  pagerank's sibling, and the canonical bipartite ranking. Same
  Pregel-shaped rounds as operators/graph.py:pagerank (edge relation
  partitioned once, score relations node-sized), L2-normalized and
  rounded per half-step for exact oracle replay.
* **Frequent 2-sequences** (the PrefixSpan/GSP support-counting
  core): for event-type pairs (a → b), the number of users with an
  a-occurrence strictly before a b-occurrence. The existence test
  collapses to first-position(a) < last-position(b) per user — two
  per-(user, type) aggregates and a user-local type self-join, no
  per-row sequence scan, which is what makes support counting
  feasible on a 100 TB event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...operators.iterate import materialize
from ._shared import _t, register

_HITS_ROUNDS = 3


def _hits_oracle() -> str:
    steps = []
    prev_h = "h0"
    for k in range(1, _HITS_ROUNDS + 1):
        steps.append(
            f"""ar{k} AS (
      SELECT e.p, sum(h.s) AS s
      FROM e JOIN {prev_h} h ON h.sup = e.sup GROUP BY e.p),
    an{k} AS (SELECT sqrt(sum(s * s)) AS nrm FROM ar{k}),
    a{k} AS MATERIALIZED (
      SELECT p, round(s / (SELECT nrm FROM an{k}), 6) AS s FROM ar{k}),
    hr{k} AS (
      SELECT e.sup, sum(a.s) AS s
      FROM e JOIN a{k} a ON a.p = e.p GROUP BY e.sup),
    hn{k} AS (SELECT sqrt(sum(s * s)) AS nrm FROM hr{k}),
    h{k} AS MATERIALIZED (
      SELECT sup, round(s / (SELECT nrm FROM hn{k}), 6) AS s FROM hr{k})"""
        )
        prev_h = f"h{k}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS sup, l_partkey AS p FROM lineitem),
    h0 AS (SELECT DISTINCT sup, 1.0 AS s FROM e),
    {chain}
    SELECT p AS part_key, s AS authority
    FROM (
      SELECT a.*, row_number() OVER (ORDER BY s DESC, p) AS rk
      FROM a{_HITS_ROUNDS} a)
    WHERE rk <= 10
    """


@register(
    "hits_hub_authority",
    oracle=_hits_oracle(),
    tags=("graph", "iterative", "lineitem"),
)
def q_hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS on the supplier→part bipartite supply graph: 3 rounds of
    authority = Aᵀ·hub, hub = A·authority with per-half-step L2
    normalization; top-10 authority parts. Each half-step is one
    join + one grouped sum over the materialized edge relation (the
    pagerank messaging shape); normalized scores are rounded at 6 so
    the unrolled oracle replays the trajectory exactly."""
    li = _t(spark, sf_dir, "lineitem")
    e = materialize(
        li.select(F.col("l_suppkey").alias("sup"), F.col("l_partkey").alias("p")).distinct()
    )
    h = e.select("sup").distinct().withColumn("s", F.lit(1.0))

    def norm6(df: DataFrame, key: str) -> DataFrame:
        n = df.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm"))
        return df.crossJoin(n).select(
            key, F.round(F.col("s") / F.col("nrm"), 6).alias("s")
        )

    a = None
    for _ in range(_HITS_ROUNDS):
        ar = (
            e.join(h.withColumnRenamed("s", "hs"), "sup")
            .groupBy("p")
            .agg(F.sum("hs").alias("s"))
        )
        a = materialize(norm6(ar, "p"))
        hr = (
            e.join(a.withColumnRenamed("s", "as_"), "p")
            .groupBy("sup")
            .agg(F.sum("as_").alias("s"))
        )
        h = materialize(norm6(hr, "sup"))
    return (
        a.withColumn("rk", F.row_number().over(Window.orderBy(F.desc("s"), F.asc("p"))))
        .where(F.col("rk") <= 10)
        .select(F.col("p").alias("part_key"), F.col("s").alias("authority"))
    )


@register(
    "frequent_event_sequences",
    oracle="""
    WITH pos AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p
      FROM events),
    spans AS (
      SELECT user_id, event_type,
             min(p) AS first_p, max(p) AS last_p
      FROM pos GROUP BY user_id, event_type),
    pairs AS (
      SELECT a.event_type AS seq_a, b.event_type AS seq_b,
             CAST(count(*) AS BIGINT) AS support
      FROM spans a JOIN spans b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      WHERE a.first_p < b.last_p
      GROUP BY 1, 2),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events)
    SELECT seq_a, seq_b, support,
           round(CAST(support AS DOUBLE) / n_users, 6) AS support_frac
    FROM pairs CROSS JOIN tot
    WHERE support >= 5
    """,
    tags=("sequence", "events"),
)
def q_frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential 2-pattern support (the GSP/PrefixSpan counting
    core): users with an a-event strictly before a b-event, for all
    ordered type pairs with support >= 5. The ∃ i<j existence test
    reduces to first-position(a) < last-position(b), so the plan is
    one per-user position window, one per-(user, type) aggregate,
    and a user-local self-join over the ~|types|² per-user rows —
    the event log is never scanned per pattern."""
    ev = _t(spark, sf_dir, "events")
    pos = ev.select(
        "user_id", "event_type",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("p"),
    )
    spans = pos.groupBy("user_id", "event_type").agg(
        F.min("p").alias("first_p"), F.max("p").alias("last_p")
    )
    a = spans.select("user_id", F.col("event_type").alias("seq_a"), "first_p")
    b = spans.select("user_id", F.col("event_type").alias("seq_b"), "last_p")
    pairs = (
        a.join(b, "user_id")
        .where((F.col("seq_a") != F.col("seq_b")) & (F.col("first_p") < F.col("last_p")))
        .groupBy("seq_a", "seq_b")
        .agg(F.count("*").cast("bigint").alias("support"))
        .where(F.col("support") >= 5)
    )
    tot = ev.agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    return pairs.crossJoin(tot).select(
        "seq_a", "seq_b", "support",
        F.round(F.col("support").cast("double") / F.col("n_users"), 6).alias("support_frac"),
    )
