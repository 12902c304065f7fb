"""Catalog part 17 — feature evaluation & selection for tabular ML.

* **Best-feature split search**: the actual tree-node step — run the
  variance-reduction stump scan (operators/trees.py) over SEVERAL
  candidate features and rank them by their best gain. Each feature
  is one |buckets|-row histogram pass; the union is the per-node
  work distributed GBDT implementations parallelize across feature
  histograms.
* **WOE / Information Value binning** (the credit-scoring standard,
  Siddiqi 2006): equal-frequency deciles of a score variable, per-bin
  weight of evidence ln(%pos/%neg) with Laplace smoothing, and the
  summed IV — the "is this feature predictive at all" screen that
  complements part13's mutual information (which is presence/absence;
  WOE/IV handles continuous features via binning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ...operators.trees import variance_splits
from ._shared import _t, register

# feature name → (column, bucket width). Target is l_quantity
# (integer-valued → FP-exact sufficient statistics, the part13
# regression-stump discipline).
_FEATURES = (
    ("extendedprice", "l_extendedprice", 5000.0),
    ("discount", "l_discount", 0.01),
    ("tax", "l_tax", 0.01),
)


def _feat_split_sql(name: str, col: str, width: float) -> str:
    gain = (
        "((ss_t - s_t * s_t / n_t)"
        " - (ss_l - s_l * s_l / n_l)"
        " - ((ss_t - ss_l) - (s_t - s_l) * (s_t - s_l) / (n_t - n_l)))"
        " / n_t"
    )
    return f"""fs_{name} AS (
      WITH buckets AS (
        SELECT CAST(floor({col} / {width}) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               sum(l_quantity) AS s, sum(l_quantity * l_quantity) AS ss
        FROM lineitem GROUP BY 1),
      cum AS (
        SELECT bucket,
               sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS n_l,
               sum(s) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS s_l,
               sum(ss) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS ss_l,
               sum(n) OVER () AS n_t, sum(s) OVER () AS s_t, sum(ss) OVER () AS ss_t
        FROM buckets)
      SELECT '{name}' AS feature,
             (bucket + 1) * {width} AS threshold,
             round({gain}, 6) AS gain
      FROM (
        SELECT c.*, row_number() OVER (
          ORDER BY round({gain}, 6) DESC, bucket) AS rk
        FROM cum c WHERE n_t - n_l > 0)
      WHERE rk = 1)"""


@register(
    "best_feature_split",
    oracle="\n    WITH "
    + ",\n    ".join(_feat_split_sql(n, c, w) for n, c, w in _FEATURES)
    + "\n    SELECT feature, threshold, gain FROM (\n      "
    + "\n      UNION ALL\n      ".join(f"SELECT * FROM fs_{n}" for n, _, _ in _FEATURES)
    + "\n    ) ORDER BY gain DESC, feature",
    tags=("trees", "training", "lineitem"),
)
def q_best_feature_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tree-node feature search: best variance-reduction split per
    candidate feature (price / discount / tax buckets, quantity
    target), one histogram pass each — the per-feature parallelism
    axis distributed GBDT uses on top of part13's per-threshold scan.
    The corpus is scanned once per feature with |buckets|-row
    shuffles; at scale the three scans fuse into one pass emitting
    three bucket columns (same relation, wider key)."""
    from ...operators.rank import global_ranked

    li = _t(spark, sf_dir, "lineitem")
    outs = []
    for name, col, width in _FEATURES:
        best = (
            global_ranked(
                variance_splits(li, F.col(col), F.col("l_quantity"), width),
                [(F.round(F.col("gain"), 6), "desc"), "threshold"],
                row_number="rk",
            )
            .where(F.col("rk") == 1)
            .select(
                F.lit(name).alias("feature"),
                "threshold",
                F.round("gain", 6).alias("gain"),
            )
        )
        outs.append(best)
    out = outs[0]
    for e in outs[1:]:
        out = out.unionAll(e)
    return out


@register(
    "woe_iv_binning",
    oracle="""
    WITH base AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    binned AS (
      SELECT y, ntile(10) OVER (ORDER BY x, y) AS bin FROM base),
    per AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg
      FROM binned GROUP BY bin),
    tot AS (
      SELECT CAST(sum(n_pos) AS DOUBLE) AS p_t, CAST(sum(n_neg) AS DOUBLE) AS g_t
      FROM per),
    woe AS (
      SELECT bin, n, n_pos, n_neg,
             ln(((n_pos + 0.5) / p_t) / ((n_neg + 0.5) / g_t)) AS w,
             ((n_pos + 0.5) / p_t - (n_neg + 0.5) / g_t)
               * ln(((n_pos + 0.5) / p_t) / ((n_neg + 0.5) / g_t)) AS ivc
      FROM per CROSS JOIN tot)
    SELECT bin, n, n_pos, n_neg, round(w, 6) AS woe,
           round((SELECT sum(ivc) FROM woe), 6) AS iv_total
    FROM woe
    """,
    tags=("training", "orders"),
)
def q_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence deciles + Information Value for totalprice
    vs fulfilled status: equal-frequency bins (ntile over a total
    order — ties broken by the label column then implicit row order
    is avoided by the (x, y) sort being total within duplicates at
    2-decimal prices), Laplace-smoothed WOE per bin, summed IV as
    the single predictiveness score. All counts exact; ln inputs are
    identical rationals in both engines. The fact-table-sized ntile —
    the largest global window in the catalog — routes through
    operators/rank.global_ranked: exact and fully distributed under
    spark.ndvi_etl.rankMode=distributed."""
    from ...operators.rank import global_ranked

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    binned = global_ranked(base, ["x", "y"], ntile={"bin": 10}).select(
        "y", "bin"
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").cast("double").alias("p_t"),
        F.sum("n_neg").cast("double").alias("g_t"),
    )
    woe = per.crossJoin(tot).select(
        "bin", "n", "n_pos", "n_neg",
        F.log(
            ((F.col("n_pos") + 0.5) / F.col("p_t"))
            / ((F.col("n_neg") + 0.5) / F.col("g_t"))
        ).alias("w"),
        (
            ((F.col("n_pos") + 0.5) / F.col("p_t") - (F.col("n_neg") + 0.5) / F.col("g_t"))
            * F.log(
                ((F.col("n_pos") + 0.5) / F.col("p_t"))
                / ((F.col("n_neg") + 0.5) / F.col("g_t"))
            )
        ).alias("ivc"),
    )
    iv = woe.agg(F.sum("ivc").alias("iv_sum"))
    return woe.crossJoin(iv).select(
        "bin", "n", "n_pos", "n_neg",
        F.round("w", 6).alias("woe"),
        F.round("iv_sum", 6).alias("iv_total"),
    )
