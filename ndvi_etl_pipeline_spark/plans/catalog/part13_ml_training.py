"""Catalog part 13 — distributed model training & evaluation.

The "train the filters" stage of a corpus pipeline, Spark-first:

* **Logistic-regression GD** (operators/linear.py): full-batch
  gradient descent over the embedding table in matrix-free long
  form — the fastText-style classifier-training step, with the
  weight relation as the (here 64-row) "parameter server". 7th
  member of the iterative family; unrolled-CTE trajectory oracle.
* **Gradient-boosted stumps** (operators/trees.py:boosted_stumps):
  boosting where the entire state lives on the per-bucket
  sufficient-statistics relation — the corpus is scanned once, each
  round runs over |buckets| rows (the histogram-GBDT trick at its
  fixed-feature limit). 8th iterative member.
* **ROC-AUC + calibration** — model evaluation as rank statistics:
  AUC via the Mann-Whitney U with average-rank tie handling, and
  per-decile ROC/calibration points. Counts and ranks are exact
  integers, so everything hash-matches.
* **Mutual-information feature selection** (the classic
  information-theoretic token-selection criterion): MI between token
  presence and the English label over the documents table — exact
  2×2 cell counts, MI in closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...operators.linear import logreg_gd_trajectory
from ...operators.trees import boosted_stumps
from ._shared import _t, register

# --- logistic regression -------------------------------------------------

def _logreg_oracle(rounds: int = 3, lr: float = 0.5) -> str:
    steps = []
    prev_w, prev_z = "w0", "z0"
    for k in range(1, rounds + 1):
        steps.append(
            f"""g{k} AS (
      SELECT p.idx,
             sum((1.0 / (1.0 + exp(-z.z)) - z.y) * p.val) AS gs
      FROM pts p JOIN {prev_z} z ON z.vec_id = p.vec_id GROUP BY p.idx),
    w{k} AS MATERIALIZED (
      SELECT w.idx,
             round(w.w - {lr} * g.gs / (SELECT n_total FROM n), 6) AS w
      FROM {prev_w} w JOIN g{k} g ON g.idx = w.idx),
    z{k} AS MATERIALIZED (
      SELECT p.vec_id, p.y, sum(p.val * w.w) AS z
      FROM pts p JOIN w{k} w ON w.idx = p.idx GROUP BY p.vec_id, p.y),
    e{k} AS (
      SELECT {k} AS step,
             (SELECT round(avg(greatest(z, 0.0) - y * z
                             + ln(1.0 + exp(-abs(z)))), 4)
              FROM z{k}) AS loss,
             (SELECT round(avg(CASE WHEN (z > 0) = (y > 0.5)
                                    THEN 1.0 ELSE 0.0 END), 4)
              FROM z{k}) AS accuracy,
             (SELECT round(sqrt(sum(w * w)), 4) FROM w{k}) AS norm_w)"""
        )
        prev_w, prev_z = f"w{k}", f"z{k}"
    chain = ",\n    ".join(steps)
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM e{k}" for k in range(1, rounds + 1)
    )
    return f"""
    WITH pts AS MATERIALIZED (
      SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y, CAST(t.i AS INT) AS idx,
             CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range(1, 65) AS t(i)
      WHERE t.i <= len(embedding)),
    lbl AS (SELECT DISTINCT vec_id, y FROM pts),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM lbl),
    w0 AS (SELECT CAST(t.i AS INT) AS idx, 0.0 AS w FROM range(1, 65) AS t(i)),
    z0 AS (SELECT vec_id, y, 0.0 AS z FROM lbl),
    {chain}
    {unions}
    """


@register(
    "logreg_gd_trajectory",
    oracle=_logreg_oracle(),
    tags=("training", "iterative", "embeddings"),
)
def q_logreg_gd_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch logistic-regression GD (operators/linear.py) on the
    embedding table predicting label parity: 3 steps, per-step
    (loss, accuracy, ‖w‖). The corpus-long relation is materialized
    once; each step is two grouped-sum shuffles (Xw then X'(p−y));
    the weight relation is 64 rows — the data-parallel layout where
    per-step traffic is O(n + d), not O(n·d·steps). Weights rounded
    per step → the unrolled CTE oracle replays the trajectory."""
    e = _t(spark, sf_dir, "embeddings")
    return logreg_gd_trajectory(e, F.col("label") % 2, rounds=3, lr=0.5)


# --- gradient-boosted stumps --------------------------------------------

def _gbm_oracle(rounds: int = 3, lr: float = 0.5, width: float = 5000.0) -> str:
    gain = (
        "((rss_t - rs_t * rs_t / n_t)"
        " - (rss_l - rs_l * rs_l / n_l)"
        " - ((rss_t - rss_l) - (rs_t - rs_l) * (rs_t - rs_l) / (n_t - n_l)))"
        " / n_t"
    )
    steps = []
    prev = "p0"
    for k in range(1, rounds + 1):
        steps.append(
            f"""r{k} AS (
      SELECT bucket, n, s, ss, p,
             s - n * p AS rs, ss - 2 * p * s + n * p * p AS rss
      FROM {prev}),
    c{k} AS (
      SELECT bucket,
             sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS n_l,
             sum(rs) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS rs_l,
             sum(rss) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS rss_l,
             sum(n) OVER () AS n_t, sum(rs) OVER () AS rs_t,
             sum(rss) OVER () AS rss_t
      FROM r{k}),
    best{k} AS MATERIALIZED (
      SELECT bucket AS split_bucket,
             round(rs_l / n_l, 6) AS mean_left,
             round((rs_t - rs_l) / (n_t - n_l), 6) AS mean_right
      FROM (
        SELECT c.*, row_number() OVER (
          ORDER BY round({gain}, 6) DESC, bucket) AS rk
        FROM c{k} c WHERE n_t - n_l > 0)
      WHERE rk = 1),
    p{k} AS MATERIALIZED (
      SELECT r.bucket, r.n, r.s, r.ss,
             round(r.p + {lr} * CASE WHEN r.bucket <= b.split_bucket
                                     THEN b.mean_left ELSE b.mean_right END,
                   6) AS p
      FROM r{k} r CROSS JOIN best{k} b),
    e{k} AS (
      SELECT {k} AS step,
             (SELECT round((split_bucket + 1) * {width}, 6) FROM best{k})
               AS threshold,
             (SELECT mean_left FROM best{k}) AS mean_left,
             (SELECT mean_right FROM best{k}) AS mean_right,
             (SELECT round(sum(ss - 2 * p * s + n * p * p) / sum(n), 4)
              FROM p{k}) AS mse)"""
        )
        prev = f"p{k}"
    chain = ",\n    ".join(steps)
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM e{k}" for k in range(1, rounds + 1)
    )
    return f"""
    WITH b AS MATERIALIZED (
      SELECT CAST(floor(l_extendedprice / {width}) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             sum(l_quantity) AS s,
             sum(l_quantity * l_quantity) AS ss
      FROM lineitem GROUP BY 1),
    p0 AS MATERIALIZED (
      SELECT bucket, n, s, ss,
             (SELECT round(sum(s) / sum(n), 6) FROM b) AS p
      FROM b),
    {chain}
    {unions}
    """


@register(
    "gbm_stumps_trajectory",
    oracle=_gbm_oracle(),
    tags=("training", "iterative", "trees", "lineitem"),
)
def q_gbm_stumps_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient boosting with depth-1 trees (operators/trees.py:
    boosted_stumps) predicting quantity from bucketed price: 3
    rounds, per-round (chosen threshold, leaf means, post-update
    MSE). The whole boosting state lives on the bucket-statistics
    relation (residual stats in closed form from (n, Σy, Σy², p)),
    so the 60k-row table — or the 100 TB table — is scanned exactly
    once and every round is |buckets|-sized. Integer-valued targets
    make the statistics FP-exact; rounded state replays in the
    oracle."""
    li = _t(spark, sf_dir, "lineitem")
    return boosted_stumps(
        li, F.col("l_extendedprice"), F.col("l_quantity"),
        bucket_width=5000.0, rounds=3, lr=0.5,
    )


# --- evaluation: AUC + ROC/calibration deciles ---------------------------

@register(
    "roc_auc_embedding",
    oracle="""
    WITH sc AS (
      SELECT vec_id, CAST(label % 2 AS INT) AS y,
             CAST(embedding[1] AS DOUBLE) AS score
      FROM embeddings),
    rk AS (
      SELECT y, rank() OVER (ORDER BY score) AS r,
             count(*) OVER (PARTITION BY score) AS c
      FROM sc),
    u AS (
      SELECT sum(CASE WHEN y = 1 THEN r + (c - 1) / 2.0 ELSE 0.0 END) AS rsum,
             CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(count(*) AS BIGINT) AS nn
      FROM rk)
    SELECT np AS n_pos, nn - np AS n_neg,
           round((rsum - np * (np + 1) / 2.0)
                 / (CAST(np AS DOUBLE) * (nn - np)), 6) AS auc
    FROM u
    """,
    tags=("evaluation", "embeddings"),
)
def q_roc_auc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC as the Mann-Whitney U statistic with average-rank tie
    handling: AUC of embedding dim 1 as a ranking score for label
    parity. Ranks are integers and tie groups exact, so the statistic
    hash-matches. The global rank window is a sort on the score —
    at scale the standard distributed-rank form (range-partition +
    partition-offset cumsum, the contiguous_ids idiom) is a drop-in;
    the statistic itself is unchanged."""
    e = _t(spark, sf_dir, "embeddings")
    sc = e.select(
        "vec_id",
        (F.col("label") % 2).cast("int").alias("y"),
        F.element_at("embedding", 1).cast("double").alias("score"),
    )
    from ...operators.rank import global_ranked

    rk = global_ranked(sc, ["score"], rank="r").select(
        "y",
        "r",
        F.count("*").over(Window.partitionBy("score")).alias("c"),
    )
    u = rk.agg(
        F.sum(
            F.when(F.col("y") == 1, F.col("r") + (F.col("c") - 1) / 2.0).otherwise(0.0)
        ).alias("rsum"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("bigint").alias("np"),
        F.count("*").cast("bigint").alias("nn"),
    )
    return u.select(
        F.col("np").alias("n_pos"),
        (F.col("nn") - F.col("np")).alias("n_neg"),
        F.round(
            (F.col("rsum") - F.col("np") * (F.col("np") + 1) / 2.0)
            / (F.col("np").cast("double") * (F.col("nn") - F.col("np"))),
            6,
        ).alias("auc"),
    )


@register(
    "roc_calibration_deciles",
    oracle="""
    WITH sc AS (
      SELECT vec_id, CAST(label % 2 AS INT) AS y,
             CAST(embedding[1] AS DOUBLE) AS score
      FROM embeddings),
    t AS (
      SELECT y, score,
             ntile(10) OVER (ORDER BY score DESC, vec_id) AS decile
      FROM sc),
    per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             round(avg(score), 6) AS avg_score
      FROM t GROUP BY decile),
    tot AS (
      SELECT CAST(sum(y) AS BIGINT) AS pos_t, CAST(count(*) AS BIGINT) AS n_t
      FROM sc)
    SELECT decile, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS frac_pos,
           round(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 * 1.0 / pos_t, 6) AS cum_tpr,
           round(sum(n - n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 * 1.0 / (n_t - pos_t), 6) AS cum_fpr,
           avg_score
    FROM per CROSS JOIN tot
    """,
    tags=("evaluation", "embeddings"),
)
def q_roc_calibration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-decile ROC curve points AND calibration bins in one pass:
    rows bucketed by score decile (highest first), per-bin positive
    fraction (calibration) plus cumulative TPR/FPR (the ROC
    polyline). All counts exact; the only windows run over the
    10-row decile relation."""
    e = _t(spark, sf_dir, "embeddings")
    sc = e.select(
        "vec_id",
        (F.col("label") % 2).cast("int").alias("y"),
        F.element_at("embedding", 1).cast("double").alias("score"),
    )
    from ...operators.rank import global_ranked

    t = global_ranked(
        sc, [("score", "desc"), "vec_id"], ntile={"decile": 10}
    ).select("y", "score", "decile")
    per = t.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.round(F.avg("score"), 6).alias("avg_score"),
    )
    tot = sc.agg(
        F.sum("y").cast("bigint").alias("pos_t"),
        F.count("*").cast("bigint").alias("n_t"),
    )
    cum = global_ranked(
        per.crossJoin(tot),
        ["decile"],
        running_sums={
            "cpos": F.col("n_pos"),
            "cneg": F.col("n") - F.col("n_pos"),
        },
    )
    return cum.select(
        "decile", "n", "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("frac_pos"),
        F.round(F.col("cpos") * 1.0 / F.col("pos_t"), 6).alias("cum_tpr"),
        F.round(
            F.col("cneg") * 1.0 / (F.col("n_t") - F.col("pos_t")), 6
        ).alias("cum_fpr"),
        "avg_score",
    )


# --- mutual-information token selection ----------------------------------

def _mi_cell(nij: str, ni: str, nj: str) -> str:
    return (
        f"CASE WHEN {nij} > 0 THEN (CAST({nij} AS DOUBLE) / n_docs)"
        f" * ln(CAST(n_docs AS DOUBLE) * {nij} / (CAST({ni} AS DOUBLE) * {nj}))"
        f" ELSE 0.0 END"
    )


_MI_SQL = f"""
    WITH d AS (
      SELECT doc_id, (lang = 'en') AS is_en, lower(trim(text)) AS t
      FROM documents WHERE length(trim(text)) > 0),
    tok AS (
      SELECT DISTINCT doc_id, unnest(string_split_regex(t, '\\s+')) AS token
      FROM d),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en
      FROM d),
    dfreq AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS df_en
      FROM tok JOIN d USING (doc_id)
      GROUP BY token),
    top AS (
      SELECT token, df, df_en FROM (
        SELECT dfreq.*, row_number() OVER (ORDER BY df DESC, token) AS rk
        FROM dfreq)
      WHERE rk <= 20)
    SELECT token, df,
           round({_mi_cell('df_en', 'df', 'n_en')}
                 + {_mi_cell('(df - df_en)', 'df', '(n_docs - n_en)')}
                 + {_mi_cell('(n_en - df_en)', '(n_docs - df)', 'n_en')}
                 + {_mi_cell('(n_docs - df - n_en + df_en)', '(n_docs - df)', '(n_docs - n_en)')},
                 6) AS mi
    FROM top CROSS JOIN tot
    """


@register(
    "mi_token_selection",
    oracle=_MI_SQL,
    tags=("training", "selection", "documents"),
)
def q_mi_token_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between token presence and the English
    label for the 20 highest-document-frequency tokens — the
    classic information-theoretic feature-selection criterion
    (Manning et al., IIR §13.5) over the documents table. One
    explode + one (token)-keyed agg with map-side partials; the
    2×2 cells are exact integers, so the MI values hash-match."""
    d = (
        _t(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select(
            "doc_id",
            (F.col("lang") == "en").alias("is_en"),
            F.lower(F.trim("text")).alias("t"),
        )
    )
    tok = d.select(
        "doc_id", F.explode(F.split("t", r"\s+")).alias("token")
    ).distinct()
    tot = d.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("bigint").alias("n_en"),
    )
    dfreq = (
        tok.join(d.select("doc_id", "is_en"), "doc_id")
        .groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum(F.when(F.col("is_en"), 1).otherwise(0)).cast("bigint").alias("df_en"),
        )
    )
    from ...operators.rank import global_ranked

    top = (
        global_ranked(dfreq, [("df", "desc"), "token"], row_number="rk")
        .where(F.col("rk") <= 20)
        .drop("rk")
    )

    def cell(nij, ni, nj):
        return F.when(
            nij > 0,
            (nij.cast("double") / F.col("n_docs"))
            * F.log(
                F.col("n_docs").cast("double") * nij / (ni.cast("double") * nj)
            ),
        ).otherwise(0.0)

    n_docs, n_en = F.col("n_docs"), F.col("n_en")
    df_, df_en = F.col("df"), F.col("df_en")
    mi = (
        cell(df_en, df_, n_en)
        + cell(df_ - df_en, df_, n_docs - n_en)
        + cell(n_en - df_en, n_docs - df_, n_en)
        + cell(n_docs - df_ - n_en + df_en, n_docs - df_, n_docs - n_en)
    )
    return top.crossJoin(tot).select("token", "df", F.round(mi, 6).alias("mi"))
