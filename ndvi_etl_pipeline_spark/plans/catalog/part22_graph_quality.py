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


_KCORE_K = 3
_KCORE_ROUNDS = 5


def _kcore_oracle() -> str:
    steps = []
    prev = "n0"
    for r in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""d{r} AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT e.i AS node FROM e JOIN {prev} a ON a.node = e.i
                                  JOIN {prev} b ON b.node = e.j
        UNION ALL
        SELECT e.j FROM e JOIN {prev} a ON a.node = e.i
                          JOIN {prev} b ON b.node = e.j)
      GROUP BY node),
    n{r} AS MATERIALIZED (
      SELECT node FROM d{r} WHERE deg >= {_KCORE_K})"""
        )
        prev = f"n{r}"
    chain = ",\n    ".join(steps)
    last = f"n{_KCORE_ROUNDS}"
    return f"""
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
    n0 AS (SELECT i AS node FROM e UNION SELECT j FROM e),
    {chain},
    ce AS (
      SELECT e.i, e.j FROM e
      JOIN {last} a ON a.node = e.i JOIN {last} b ON b.node = e.j)
    SELECT CAST((SELECT count(*) FROM n0) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM {last}) AS BIGINT) AS core_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*) FROM ce) AS BIGINT) AS core_edges
    """


@register(
    "kcore_decomposition",
    oracle=_kcore_oracle(),
    tags=("graph", "iterative", "lineitem"),
)
def q_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-core of the co-purchase graph by synchronous peeling:
    each round drops nodes whose degree within the surviving
    subgraph is < k (5 fixed rounds, enough for this graph —
    convergence is when a round removes nothing). The dense core is
    what survives of a recommendation graph once the long tail is
    peeled — and the peeling loop is the canonical 'recompute a
    per-node aggregate over a shrinking subgraph' iteration: per
    round one node-set semi-join + one degree count, edge relation
    materialized once (operators/iterate.py discipline)."""
    from ...operators.iterate import iterate, materialize
    from ...operators.recsys import basket_pairs

    li = _t(spark, sf_dir, "lineitem")
    e = materialize(
        basket_pairs(
            li.select(
                F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
            ),
            min_co=2,
            max_basket=64,
        ).select("i", "j")
    )
    n0 = (
        e.select(F.col("i").alias("node"))
        .union(e.select(F.col("j").alias("node")))
        .distinct()
    )

    def peel(nodes: DataFrame, _i: int) -> DataFrame:
        alive = (
            e.join(nodes.withColumnRenamed("node", "i"), "i", "left_semi")
            .join(nodes.withColumnRenamed("node", "j"), "j", "left_semi")
        )
        deg = (
            alive.select(F.col("i").alias("node"))
            .unionAll(alive.select(F.col("j").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        return deg.where(F.col("deg") >= _KCORE_K).select("node")

    core = iterate(n0, peel, _KCORE_ROUNDS)
    core_edges = (
        e.join(core.withColumnRenamed("node", "i"), "i", "left_semi")
        .join(core.withColumnRenamed("node", "j"), "j", "left_semi")
    )
    return (
        n0.agg(F.count("*").cast("bigint").alias("n_nodes"))
        .crossJoin(core.agg(F.count("*").cast("bigint").alias("core_nodes")))
        .crossJoin(e.agg(F.count("*").cast("bigint").alias("n_edges")))
        .crossJoin(core_edges.agg(F.count("*").cast("bigint").alias("core_edges")))
    )


@register(
    "t_closeness_audit",
    oracle="""
    WITH base AS (
      SELECT n_name,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             c_mktsegment AS seg
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    gseg AS (
      SELECT seg, CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM base) AS p
      FROM base GROUP BY seg),
    grp AS (
      SELECT n_name, m, seg, CAST(count(*) AS BIGINT) AS c FROM base
      GROUP BY 1, 2, 3),
    grp_n AS (
      SELECT n_name, m, CAST(sum(c) AS DOUBLE) AS n FROM grp GROUP BY 1, 2),
    dist AS (
      SELECT g.n_name, g.m,
             0.5 * sum(abs(coalesce(gr.c, 0) / g.n - gl.p)) AS t
      FROM grp_n g
      CROSS JOIN gseg gl
      LEFT JOIN grp gr ON gr.n_name = g.n_name AND gr.m = g.m
                      AND gr.seg = gl.seg
      GROUP BY g.n_name, g.m)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           round(max(t), 6) AS max_t,
           round(avg(t), 6) AS avg_t,
           CAST(sum(CASE WHEN t > 0.3 + 1e-9 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_above_03
    FROM dist
    """,
    tags=("privacy", "audit", "quality"),
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007), completing the
    k-anonymity / l-diversity release-risk triad: per
    quasi-identifier class, the variational distance (categorical
    EMD) between the class's sensitive-attribute distribution and
    the global one — a class can be k-anonymous AND l-diverse yet
    still leak via a skewed distribution. Exact fractions from
    integer counts; the per-class distance is a dense
    class × segment grid (LEFT JOIN against the global segment
    list so absent segments contribute their full global mass).

    The 0.3 + 1e-9 threshold epsilon is load-bearing: several
    classes have EXACTLY rational t = 0.3 (small-denominator count
    fractions), and a bare `t > 0.3` flips per run with float
    summation order — in both engines. Ties land ±1e-16 of 0.3
    (excluded deterministically); genuinely distinct t values are
    spaced ~1e-6 apart at this scale, far above the epsilon."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    tot = base.agg(F.count("*").alias("nt"))
    glob = (
        base.groupBy("seg")
        .agg(F.count("*").alias("cg"))
        .crossJoin(tot)
        .select("seg", (F.col("cg").cast("double") / F.col("nt")).alias("p"))
    )
    grp = base.groupBy("n_name", "m", "seg").agg(F.count("*").cast("bigint").alias("c"))
    grp_n = grp.groupBy("n_name", "m").agg(F.sum("c").cast("double").alias("n"))
    dense = grp_n.crossJoin(F.broadcast(glob))
    dist = (
        dense.join(grp, ["n_name", "m", "seg"], "left")
        .groupBy("n_name", "m")
        .agg(
            (
                0.5
                * F.sum(
                    F.abs(
                        F.coalesce("c", F.lit(0)) / F.col("n") - F.col("p")
                    )
                )
            ).alias("t")
        )
    )
    return dist.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.round(F.max("t"), 6).alias("max_t"),
        F.round(F.avg("t"), 6).alias("avg_t"),
        F.sum(F.when(F.col("t") > 0.3 + 1e-9, 1).otherwise(0)).cast("bigint").alias("groups_above_03"),
    )

@register(
    "graph_edge_novelty",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
    sized AS (
      SELECT basket, item FROM (
        SELECT basket, item, count(*) OVER (PARTITION BY basket) AS bsz FROM b)
      WHERE bsz <= 64),
    em AS (
      SELECT l.item AS i, r.item AS j,
             date_trunc('month', CAST(o.o_orderdate AS DATE)) AS m
      FROM sized l
      JOIN sized r ON l.basket = r.basket AND l.item < r.item
      JOIN orders o ON o.o_orderkey = l.basket
      GROUP BY 1, 2, 3),
    first_m AS (
      SELECT i, j, min(m) AS fm FROM em GROUP BY i, j),
    census AS (
      SELECT em.m,
             CAST(count(*) AS BIGINT) AS active_edges,
             CAST(sum(CASE WHEN em.m = f.fm THEN 1 ELSE 0 END) AS BIGINT)
               AS new_edges
      FROM em JOIN first_m f ON f.i = em.i AND f.j = em.j
      GROUP BY em.m)
    SELECT strftime(m, '%Y-%m') AS month, active_edges, new_edges,
           round(CAST(new_edges AS DOUBLE) / active_edges, 6) AS novelty_rate
    FROM census
    """,
    tags=("graph", "temporal", "lineitem", "orders"),
)
def q_graph_edge_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal graph churn: per month, the co-purchase edges active
    in that month and the fraction appearing for the FIRST time —
    the edge-novelty curve that tells a recommender how fast its
    graph goes stale (high novelty ⇒ retrain cadence must follow).
    Plan: per-month distinct edges (one shuffle on the edge key),
    a min-month aggregate on the same key (exchange reused), and a
    month census — no windows, no state. The basket-size cap (64)
    matches the sibling co-purchase queries' quadratic-blowup
    guard; edges deliberately include co = 1 pairs — an edge's
    debut month has co = 1 by definition, so a co floor would make
    'new edge' ill-defined."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    b = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    sized = b.withColumn(
        "_bsz", F.count("*").over(Window.partitionBy("basket"))
    ).where(F.col("_bsz") <= 64)
    l = sized.select("basket", F.col("item").alias("i"))
    r = sized.select("basket", F.col("item").alias("j"))
    em = (
        l.join(r, "basket")
        .where(F.col("i") < F.col("j"))
        .join(o, F.col("basket") == o["o_orderkey"])
        .select(
            "i", "j",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
        )
        .distinct()
    )
    first_m = em.groupBy("i", "j").agg(F.min("m").alias("fm"))
    census = (
        em.join(first_m, ["i", "j"])
        .groupBy("m")
        .agg(
            F.count("*").cast("bigint").alias("active_edges"),
            F.sum(F.when(F.col("m") == F.col("fm"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_edges"),
        )
    )
    return census.select(
        F.date_format("m", "yyyy-MM").alias("month"),
        "active_edges",
        "new_edges",
        F.round(F.col("new_edges").cast("double") / F.col("active_edges"), 6).alias(
            "novelty_rate"
        ),
    )

@register(
    "nelson_aalen_hazard",
    oracle="""
    WITH bounds AS (SELECT max(ts) AS tmax FROM events),
    per_user AS (
      SELECT user_id, min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT CASE WHEN tp IS NOT NULL
                  THEN CAST(epoch_us(tp) - epoch_us(t0) AS BIGINT)
                  ELSE CAST(epoch_us(bounds.tmax) - epoch_us(t0) AS BIGINT)
             END AS dur,
             tp IS NOT NULL AS is_event
      FROM per_user CROSS JOIN bounds
    ),
    g AS (
      SELECT dur AS t,
             count(*) FILTER (WHERE is_event) AS d,
             count(*) AS all_at_t
      FROM durs GROUP BY dur
    ),
    o AS (
      SELECT t, d,
             sum(all_at_t) OVER ()
               - (sum(all_at_t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  - all_at_t) AS at_risk
      FROM g
    ),
    ev AS (
      SELECT t, d, at_risk, d / CAST(at_risk AS DOUBLE) AS inc
      FROM o WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS duration_us,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(d AS BIGINT) AS n_events,
           round(sum(inc) OVER w, 6) AS cum_hazard,
           round(exp(-sum(inc) OVER w), 6) AS na_survival
    FROM ev
    WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    """,
    tags=("stats", "survival", "events"),
)
def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard for signup→purchase conversion —
    Kaplan-Meier's estimator sibling (H(t) = Σ d_i/n_i over event
    times; exp(−H) is the Fleming-Harrington survival curve, less
    bias than KM at small risk sets). Same risk-set machinery as
    kaplan_meier_conversion: per-user durations, grouped event
    times, reverse-cumulative at-risk counts; the hazard running
    sum is an ORDERED window, so both engines add the identical
    fractions in the identical order."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(F.max("ts").alias("tmax"))
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    durs = per_user.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.col("tp").isNotNull(),
            F.unix_micros("tp") - F.unix_micros("t0"),
        )
        .otherwise(F.unix_micros("tmax") - F.unix_micros("t0"))
        .cast("bigint")
        .alias("dur"),
        F.col("tp").isNotNull().alias("is_event"),
    )
    g = durs.groupBy(F.col("dur").alias("t")).agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.count("*").alias("all_at_t"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    o = g.select(
        "t", "d",
        (
            F.sum("all_at_t").over(w_all)
            - (F.sum("all_at_t").over(w_cum) - F.col("all_at_t"))
        ).alias("at_risk"),
    )
    evts = o.where(F.col("d") > 0).select(
        "t", "d", "at_risk",
        (F.col("d") / F.col("at_risk").cast("double")).alias("inc"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return evts.select(
        F.col("t").cast("bigint").alias("duration_us"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.round(F.sum("inc").over(w), 6).alias("cum_hazard"),
        F.round(F.exp(-F.sum("inc").over(w)), 6).alias("na_survival"),
    )


@register(
    "cluster_aware_split",
    oracle=r"""
    WITH RECURSIVE
    tok AS MATERIALIZED (
      SELECT doc_id, source, lang,
             string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents),
    shl AS MATERIALIZED (
      SELECT doc_id, source, lang, list_distinct(list_transform(
          generate_series(1, greatest(len(w) - 2, 0)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM tok WHERE len(w) >= 3),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM shl a JOIN shl b
        ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
            / len(list_distinct(list_concat(a.shingles, b.shingles))), 4)
            >= 0.5),
    edges AS MATERIALIZED (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, label) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s),
    cc AS MATERIALIZED (
      SELECT node, min(label) AS component FROM reach GROUP BY node),
    docs AS MATERIALIZED (
      SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS component,
             CASE WHEN ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                       ::UBIGINT % 100 < 5 THEN 'eval' ELSE 'train' END
               AS naive_split,
             CASE WHEN ('0x' || substr(md5(CAST(coalesce(cc.component,
                            d.doc_id) AS VARCHAR)), 1, 8))
                       ::UBIGINT % 100 < 5 THEN 'eval' ELSE 'train' END
               AS cluster_split
      FROM documents d LEFT JOIN cc ON cc.node = d.doc_id),
    cl AS (
      SELECT component,
             CAST(count(*) AS BIGINT) AS n_docs,
             count(DISTINCT naive_split) AS n_naive,
             count(DISTINCT cluster_split) AS n_cluster
      FROM docs GROUP BY component)
    SELECT CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_multi_clusters,
           CAST(sum(CASE WHEN n_naive > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky_naive,
           CAST(sum(CASE WHEN n_cluster > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_leaky_cluster,
           (SELECT CAST(count(*) AS BIGINT) FROM docs
            WHERE naive_split <> cluster_split) AS n_docs_moved
    FROM cl
    """,
    tags=("dedup", "training", "privacy", "iterative"),
)
def q_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/eval split — the leakage guard every LLM
    corpus pipeline needs between dedup and split: a naive per-doc
    hash split scatters near-duplicate documents across train AND
    eval (the classic contamination bug — the eval answer is in the
    training set verbatim-ish), while keying the SAME hash split by
    near-dup CLUSTER id keeps each cluster in one split by
    construction. Census: cluster counts, leaky clusters under each
    policy (cluster-keyed must be 0), and how many documents the fix
    moves. Pairs = exact 3-gram Jaccard ≥ 0.5 within (source, lang)
    blocks (the dedup_ngram_jaccard criterion); clusters = min-label
    connected components (checkpointed fixpoint); split = the
    engine-portable md5 bucket of curation.assign_split.

    Scale shape: the pair stage is the blocked self-join the dedup
    tier already bounds; CC is O(diameter) rounds of two shuffles on
    node id; the split swap itself is free (hash of a different
    column). At 100 TB you'd feed the MinHash-LSH pair stream in as
    `pairs` — the census is agnostic to the pair source."""
    from ...operators.curation import assign_split
    from ...operators.dedup import connected_components, shingle_docs

    d = _t(spark, sf_dir, "documents")
    sh = shingle_docs(d).join(d.select("doc_id", "source", "lang"), "doc_id")
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "source", "lang",
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "source", "lang",
        F.col("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    pairs = (
        a.join(b, ["source", "lang"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.round(inter / union, 4) >= 0.5)
        .select("doc_a", "doc_b")
    )
    cc = connected_components(pairs, "doc_a", "doc_b")
    docs = (
        d.select("doc_id")
        .join(cc, d["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("component"),
        )
        .select(
            "doc_id",
            "component",
            assign_split(F.col("doc_id")).alias("naive_split"),
            assign_split(F.col("component")).alias("cluster_split"),
        )
    )
    cl = docs.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("naive_split").alias("n_naive"),
        F.countDistinct("cluster_split").alias("n_cluster"),
    )
    moved = docs.filter(F.col("naive_split") != F.col("cluster_split")).agg(
        F.count("*").cast("bigint").alias("n_docs_moved")
    )
    return cl.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_multi_clusters"),
        F.sum(F.when(F.col("n_naive") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_leaky_naive"),
        F.sum(F.when(F.col("n_cluster") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_leaky_cluster"),
    ).crossJoin(F.broadcast(moved))
