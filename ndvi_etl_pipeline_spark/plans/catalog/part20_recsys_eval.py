"""Catalog part 20 — recommender evaluation & graph assortativity.

* **Item-CF holdout evaluation**: the train → serve → evaluate loop
  that makes a recommender a measurable system (the ANN tier's
  recall-audit discipline applied to part12): similarities trained
  on pre-cutoff orders only, top-3 recommendations served from each
  user's training history, hit-rate measured on post-cutoff
  purchases of items the user did not already own. Time-based
  splitting (not random) is the leakage-safe protocol for
  transactional data.
* **Graph modularity under an exogenous partition**: Newman's Q for
  the co-purchase graph partitioned by part brand — "are
  co-purchases brand-assortative?" — from exact edge and degree
  counts, no iteration: Q = Σ_c (e_c/m − (d_c/2m)²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...operators import recsys as RS
from ._shared import _t, register

_CUTOFF = "2000-01-01"


def _train_sims_sql() -> str:
    return f"""tb AS MATERIALIZED (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'),
    sized AS (
      SELECT basket, item FROM (
        SELECT basket, item, count(*) OVER (PARTITION BY basket) AS bsz FROM tb)
      WHERE bsz <= 64),
    pairs AS MATERIALIZED (
      SELECT l.item AS i, r.item AS j, CAST(count(*) AS BIGINT) AS co
      FROM sized l JOIN sized r ON l.basket = r.basket AND l.item < r.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
    freq AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM tb GROUP BY item),
    sims AS MATERIALIZED (
      SELECT p.i, p.j, p.co / sqrt(CAST(fi.n AS DOUBLE) * fj.n) AS cos
      FROM pairs p
      JOIN freq fi ON fi.item = p.i
      JOIN freq fj ON fj.item = p.j)"""


@register(
    "itemcf_hitrate_eval",
    oracle=f"""
    WITH {_train_sims_sql()},
    hist AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS usr, l_partkey AS item
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'),
    test AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS usr, l_partkey AS item
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'),
    sym AS (
      SELECT i AS item, j AS cand, cos FROM sims
      UNION ALL
      SELECT j, i, cos FROM sims),
    scored AS (
      SELECT h.usr, s.cand, sum(s.cos) AS score
      FROM hist h JOIN sym s ON s.item = h.item
      GROUP BY 1, 2),
    unowned AS (
      SELECT sc.* FROM scored sc
      LEFT JOIN hist h ON h.usr = sc.usr AND h.item = sc.cand
      WHERE h.item IS NULL),
    top3 AS (
      SELECT usr, cand FROM (
        SELECT u.*, row_number() OVER (
          PARTITION BY usr ORDER BY round(score, 6) DESC, cand) AS rk
        FROM unowned u)
      WHERE rk <= 3),
    eval_pairs AS (
      SELECT t.usr, t.item FROM test t
      JOIN (SELECT DISTINCT usr FROM hist) hu ON hu.usr = t.usr
      LEFT JOIN hist h ON h.usr = t.usr AND h.item = t.item
      WHERE h.item IS NULL),
    hits AS (
      SELECT e.usr, e.item FROM eval_pairs e
      JOIN top3 r ON r.usr = e.usr AND r.cand = e.item)
    SELECT CAST((SELECT count(*) FROM eval_pairs) AS BIGINT) AS n_eval_pairs,
           CAST((SELECT count(DISTINCT usr) FROM eval_pairs) AS BIGINT) AS n_eval_users,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           round(CAST((SELECT count(*) FROM hits) AS DOUBLE)
                 / (SELECT count(*) FROM eval_pairs), 6) AS hit_rate_at_3
    """,
    tags=("recsys", "evaluation", "lineitem", "orders"),
)
def q_itemcf_hitrate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit-rate@3 of the item-CF recommender under a leakage-safe
    time split: similarities and user histories from pre-cutoff
    orders only, evaluated on post-cutoff purchases of unowned
    items by users with training history. One number that says
    whether part12's recommender actually predicts future
    purchases — the ANN recall-audit discipline applied to
    collaborative filtering."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    train = joined.where(F.col("o_orderdate") < cutoff)
    test = joined.where(F.col("o_orderdate") >= cutoff)
    sims = RS.item_similarity(
        train.select(
            F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
        ),
        min_co=2,
        max_basket=64,
        # catalog-dimension freq broadcasts; the pair relation never
        # re-exchanges after its own aggregation (part12 idiom)
        freq_join="broadcast",
    )
    hist = train.select(
        F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
    ).distinct()
    recs = RS.user_item_scores(hist, sims)
    top3 = (
        recs.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user").orderBy(
                    F.desc(F.round(F.col("score"), 6)), F.asc("cand")
                )
            ),
        )
        .where(F.col("rk") <= 3)
        .select("user", "cand")
    )
    test_pairs = test.select(
        F.col("o_custkey").alias("user"), F.col("l_partkey").alias("item")
    ).distinct()
    eval_pairs = (
        test_pairs.join(hist.select("user").distinct(), "user")
        .join(hist, ["user", "item"], "left_anti")
    )
    hits = eval_pairs.join(
        top3, (eval_pairs["user"] == top3["user"]) & (eval_pairs["item"] == top3["cand"])
    ).select(eval_pairs["user"], eval_pairs["item"])
    ep = eval_pairs.agg(
        F.count("*").cast("bigint").alias("n_eval_pairs"),
        F.count_distinct("user").cast("bigint").alias("n_eval_users"),
    )
    h = hits.agg(F.count("*").cast("bigint").alias("n_hits"))
    return ep.crossJoin(h).select(
        "n_eval_pairs", "n_eval_users", "n_hits",
        F.round(
            F.col("n_hits").cast("double") / F.col("n_eval_pairs"), 6
        ).alias("hit_rate_at_3"),
    )


@register(
    "copurchase_brand_modularity",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
    sized AS (
      SELECT basket, item FROM (
        SELECT basket, item, count(*) OVER (PARTITION BY basket) AS bsz FROM b)
      WHERE bsz <= 64),
    e AS MATERIALIZED (
      SELECT l.item AS i, r.item AS j
      FROM sized l JOIN sized r ON l.basket = r.basket AND l.item < r.item
      GROUP BY 1, 2 HAVING count(*) >= 2),
    lbl AS (SELECT p_partkey AS item, p_brand AS c FROM part),
    el AS (
      SELECT ci.c AS ci, cj.c AS cj FROM e
      JOIN lbl ci ON ci.item = e.i
      JOIN lbl cj ON cj.item = e.j),
    m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM el),
    intra AS (
      SELECT ci AS c, CAST(sum(CASE WHEN ci = cj THEN 1 ELSE 0 END) AS BIGINT) AS e_c
      FROM el GROUP BY ci),
    deg AS (
      SELECT c, CAST(count(*) AS BIGINT) AS d_c FROM (
        SELECT ci AS c FROM el UNION ALL SELECT cj FROM el)
      GROUP BY c),
    q AS (
      SELECT d.c, coalesce(i.e_c, 0) AS e_c, d.d_c,
             coalesce(i.e_c, 0) / (SELECT m FROM m)
               - (d.d_c / (2.0 * (SELECT m FROM m)))
                 * (d.d_c / (2.0 * (SELECT m FROM m))) AS qc
      FROM deg d LEFT JOIN intra i ON i.c = d.c)
    SELECT c AS brand, e_c AS intra_edges, d_c AS degree_sum,
           round(qc, 6) AS q_contrib,
           round((SELECT sum(qc) FROM q), 6) AS modularity
    FROM q
    """,
    tags=("graph", "lineitem", "part"),
)
def q_copurchase_brand_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the co-purchase graph under the part-BRAND
    partition — per-brand contribution and the global Q, from exact
    intra-edge and degree counts (Q = Σ_c e_c/m − (d_c/2m)²). No
    iteration: the partition is exogenous, so assortativity costs
    one edge build plus two brand-keyed aggregates. Positive Q means
    baskets cluster within brands more than a degree-preserving
    random graph would."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    edges = RS.basket_pairs(
        li.select(F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")),
        min_co=2,
        max_basket=64,
    ).select("i", "j")
    lbl = F.broadcast(p.select(F.col("p_partkey").alias("item"), F.col("p_brand").alias("c")))
    el = (
        edges.join(lbl.withColumnRenamed("item", "i").withColumnRenamed("c", "ci"), "i")
        .join(lbl.withColumnRenamed("item", "j").withColumnRenamed("c", "cj"), "j")
        .select("ci", "cj")
    )
    m = el.agg(F.count("*").cast("double").alias("m"))
    intra = el.groupBy(F.col("ci").alias("c")).agg(
        F.sum(F.when(F.col("ci") == F.col("cj"), 1).otherwise(0))
        .cast("bigint")
        .alias("e_c")
    )
    deg = (
        el.select(F.col("ci").alias("c"))
        .unionAll(el.select(F.col("cj").alias("c")))
        .groupBy("c")
        .agg(F.count("*").cast("bigint").alias("d_c"))
    )
    q = (
        deg.join(intra, "c", "left")
        .crossJoin(m)
        .select(
            "c",
            F.coalesce("e_c", F.lit(0)).alias("e_c"),
            "d_c",
            (
                F.coalesce("e_c", F.lit(0)) / F.col("m")
                - (F.col("d_c") / (2.0 * F.col("m")))
                * (F.col("d_c") / (2.0 * F.col("m")))
            ).alias("qc"),
        )
    )
    tot = q.agg(F.sum("qc").alias("q_sum"))
    return q.crossJoin(tot).select(
        F.col("c").alias("brand"),
        F.col("e_c").alias("intra_edges"),
        F.col("d_c").alias("degree_sum"),
        F.round("qc", 6).alias("q_contrib"),
        F.round("q_sum", 6).alias("modularity"),
    )
