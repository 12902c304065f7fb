"""Catalog part 15 — model-selection & robust-regression additions.

* **k-fold cross-validation** of the Naive-Bayes quality classifier
  (part10's fastText stand-in): the standard "is the filter any
  good" protocol — 5 deterministic hash folds, per-fold holdout
  accuracy. Each fold reuses the one-pass NB operator with a
  different test predicate; the oracle replays all 5 folds.
* **Quantile regression by pinball-loss subgradient descent**
  (Koenker & Bassett 1978): fit the τ=0.9 conditional quantile of
  price given quantity. The subgradient needs only an indicator
  comparison per row, so each step is ONE aggregate over the
  corpus-long relation — same data-parallel shape as the logistic
  GD in part13 but with a non-smooth loss (the robust/εquantile
  workhorse that mean regression can't express).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...operators import selection as SEL
from ._shared import _t, canon_round, register
from .part10_data_selection import _BUCKET_SQL, _TOK_SQL

_N_FOLDS = 5


def _nb_fold_sql(fold: int) -> str:
    """One NB train/score chain with fold `fold` held out — the
    part10 naive_bayes_lang_quality oracle parameterized by the test
    predicate, reduced to the fold-accuracy row."""
    return f"""f{fold} AS (
      WITH base AS (
        SELECT doc_id, (lang = 'en') AS y, (doc_id % {_N_FOLDS} = {fold}) AS is_test, text
        FROM documents),
      tok AS (SELECT doc_id, y, is_test, unnest({_TOK_SQL}) AS w FROM base),
      bk AS (SELECT doc_id, y, is_test, {_BUCKET_SQL} AS b FROM tok),
      cnt AS (
        SELECT b, sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE AS c1,
               sum(CASE WHEN y THEN 0 ELSE 1 END)::DOUBLE AS c0
        FROM bk WHERE NOT is_test GROUP BY b),
      tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0 FROM cnt),
      llr AS (
        SELECT b, ln((c1 + 1.0) / (n1 + 64.0)) - ln((c0 + 1.0) / (n0 + 64.0)) AS llr
        FROM cnt CROSS JOIN tot),
      unseen AS (
        SELECT ln(1.0 / (n1 + 64.0)) - ln(1.0 / (n0 + 64.0)) AS unseen_llr FROM tot),
      prior AS (
        SELECT ln(sum(CASE WHEN y THEN 1 ELSE 0 END)::DOUBLE
                / sum(CASE WHEN y THEN 0 ELSE 1 END)::DOUBLE) AS log_prior
        FROM base WHERE NOT is_test),
      scored AS (
        SELECT bk.doc_id, bk.y, coalesce(llr.llr, u.unseen_llr) AS t_llr
        FROM bk LEFT JOIN llr USING (b) CROSS JOIN unseen u
        WHERE bk.is_test),
      agg AS (
        SELECT doc_id, y, sum(t_llr) AS s FROM scored GROUP BY doc_id, y)
      SELECT {fold} AS fold,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN ((round(a.s + p.log_prior, 6) + 0.0) > 0) = a.y
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
             round(sum(CASE WHEN ((round(a.s + p.log_prior, 6) + 0.0) > 0) = a.y
                            THEN 1.0 ELSE 0.0 END) / count(*), 6) AS accuracy
      FROM agg a CROSS JOIN prior p)"""


@register(
    "nb_quality_kfold_cv",
    oracle="\n    WITH "
    + ",\n    ".join(_nb_fold_sql(f) for f in range(_N_FOLDS))
    + "\n    "
    + "\n    UNION ALL\n    ".join(f"SELECT * FROM f{f}" for f in range(_N_FOLDS)),
    tags=("training", "selection", "documents"),
)
def q_nb_quality_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the NB bucket-LM quality classifier
    (operators/selection.py:naive_bayes_scores): deterministic
    doc_id-hash folds, per-fold holdout accuracy. All folds share ONE
    tokenization pass (operators/selection.py:naive_bayes_kfold —
    leave-fold-out counts by subtraction), so k-fold costs two
    corpus scans total, not 2k; model state is k x 64 rows. The per-document decision
    uses the part10 query's exact rounding (canon_round at 6) so
    both engines threshold identical values."""
    d = _t(spark, sf_dir, "documents")
    s = SEL.naive_bayes_kfold(
        d, label_pred=F.col("lang") == F.lit("en"), n_folds=_N_FOLDS
    )
    correct = (
        (canon_round(F.col("score"), 6) > F.lit(0.0)) == (F.col("actual") == 1)
    )
    return (
        s.groupBy(F.col("fold").cast("int").alias("fold"))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(F.when(correct, 1).otherwise(0)).cast("bigint").alias("n_correct"),
            F.round(
                F.sum(F.when(correct, 1.0).otherwise(0.0)) / F.count("*"), 6
            ).alias("accuracy"),
        )
    )


# --- quantile regression -------------------------------------------------

_QR_TAU = 0.9
_QR_LR = 60.0
_QR_ROUNDS = 3


def _qr_oracle() -> str:
    steps = []
    prev = "w0"
    for k in range(1, _QR_ROUNDS + 1):
        steps.append(
            f"""g{k} AS (
      SELECT
        sum(CASE WHEN r.y < w.w0 + w.w1 * r.x THEN {_QR_TAU} - 1.0
                 ELSE {_QR_TAU} END) / (SELECT n FROM n) AS g0,
        sum(r.x * CASE WHEN r.y < w.w0 + w.w1 * r.x THEN {_QR_TAU} - 1.0
                       ELSE {_QR_TAU} END) / (SELECT n FROM n) AS g1
      FROM r CROSS JOIN {prev} w),
    w{k} AS MATERIALIZED (
      SELECT round(w.w0 + {_QR_LR} * g.g0, 6) AS w0,
             round(w.w1 + {_QR_LR} * g.g1, 6) AS w1
      FROM {prev} w CROSS JOIN g{k} g),
    e{k} AS (
      SELECT {k} AS step, w.w0, w.w1,
             (SELECT round(sum(CASE WHEN r.y >= w.w0 + w.w1 * r.x
                                    THEN {_QR_TAU} * (r.y - (w.w0 + w.w1 * r.x))
                                    ELSE (1.0 - {_QR_TAU}) * ((w.w0 + w.w1 * r.x) - r.y)
                               END) / (SELECT n FROM n), 2)
              FROM r) AS pinball
      FROM w{k} w)"""
        )
        prev = f"w{k}"
    chain = ",\n    ".join(steps)
    unions = "\n    UNION ALL\n    ".join(
        f"SELECT * FROM e{k}" for k in range(1, _QR_ROUNDS + 1)
    )
    return f"""
    WITH r AS MATERIALIZED (
      SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM r),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1),
    {chain}
    {unions}
    """


@register(
    "quantile_regression_gd",
    oracle=_qr_oracle(),
    tags=("training", "iterative", "lineitem"),
)
def q_quantile_regression_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball-loss subgradient ascent toward the τ=0.9 conditional
    quantile of price given quantity: each step is ONE corpus
    aggregate (the subgradient needs only the y < ŷ indicator), so
    the trajectory costs 3 scans of a materialized 2-column
    relation. The indicator comparison is exact (prices are 2-dec
    values, weights rounded per step), so the unrolled oracle
    replays it bit-for-bit; the pinball loss is rounded at 2 where
    FP summation order costs ~1e-5 on a ~1e9-scale sum."""
    li = _t(spark, sf_dir, "lineitem")
    from ...operators.iterate import materialize

    r = materialize(
        li.select(F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y"))
    )
    n_rel = r.agg(F.count("*").cast("double").alias("n"))
    w0, w1 = 0.0, 0.0  # driver-held scalars — the k-means centroid idiom
    rows = []
    for k in range(1, _QR_ROUNDS + 1):
        yhat = F.lit(w0) + F.lit(w1) * F.col("x")
        ind = F.when(F.col("y") < yhat, F.lit(_QR_TAU - 1.0)).otherwise(
            F.lit(_QR_TAU)
        )
        g = (
            r.crossJoin(n_rel)
            .agg(
                (F.sum(ind) / F.first("n")).alias("g0"),
                (F.sum(F.col("x") * ind) / F.first("n")).alias("g1"),
            )
            .first()
        )
        w0 = round(w0 + _QR_LR * float(g.g0), 6)
        w1 = round(w1 + _QR_LR * float(g.g1), 6)
        yhat2 = F.lit(w0) + F.lit(w1) * F.col("x")
        loss = F.when(
            F.col("y") >= yhat2, F.lit(_QR_TAU) * (F.col("y") - yhat2)
        ).otherwise(F.lit(1.0 - _QR_TAU) * (yhat2 - F.col("y")))
        rows.append(
            r.crossJoin(n_rel).agg(
                F.lit(k).cast("int").alias("step"),
                F.lit(w0).alias("w0"),
                F.lit(w1).alias("w1"),
                F.round(F.sum(loss) / F.first("n"), 2).alias("pinball"),
            )
        )
    out = rows[0]
    for e in rows[1:]:
        out = out.unionAll(e)
    return out
