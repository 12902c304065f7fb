"""Distributed linear-model training as relational plans.

Full-batch gradient descent for L2-regularization-free logistic
regression over a dense feature column (`array<float>`), in the
matrix-free long form the PCA operator established
(operators/clustering.py): features exploded to (vec_id, idx, val)
once, weights kept as a |dims|-row relation, each GD step exactly two
grouped-sum shuffles —

    z_i = Σ_idx x_{i,idx} · w_idx          (join on idx, groupBy vec_id)
    g_idx = Σ_i (σ(z_i) − y_i) · x_{i,idx} / n   (join on vec_id, groupBy idx)
    w ← round(w − lr·g, 6)

The corpus-sized relation is materialized once and never reshuffled;
per-step traffic is O(n + d) rows. This is the textbook
data-parallel SGD-style layout (the parameter relation is what a
parameter server holds; here it is a 64-row DataFrame), and the
fastText-style "train a quality classifier over the corpus" step of
an LLM data pipeline expressed Spark-first.

Weights are rounded per step so a DuckDB oracle replays the exact
trajectory (the _kmeans_chain discipline)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import materialize

__all__ = ["logreg_gd_trajectory"]


def logreg_gd_trajectory(
    embeddings: DataFrame,
    label_col,
    rounds: int = 3,
    lr: float = 0.5,
    dims: int = 64,
) -> DataFrame:
    """Train logistic regression on the `embedding` column against a
    0/1 `label_col` expression by `rounds` full-batch GD steps.
    Returns one row per step: (step, loss, accuracy, norm_w) — loss
    is the mean log-loss in the two-sided overflow-safe form
    max(z,0) − y·z + ln(1+e^{−|z|}) (the naive ln(1+e^{−z}) form
    overflows to +inf for z < −709), accuracy thresholds at z>0
    (exact, no FP boundary)."""
    pts = materialize(
        embeddings.select(
            "vec_id",
            label_col.cast("double").alias("y"),
            F.posexplode("embedding").alias("idx0", "val"),
        ).select(
            "vec_id",
            "y",
            (F.col("idx0") + 1).alias("idx"),
            F.col("val").cast("double").alias("val"),
        )
    )
    labels = materialize(pts.select("vec_id", "y").distinct())
    n_rel = materialize(labels.agg(F.count("*").cast("double").alias("n_total")))
    w = pts.sparkSession.range(1, dims + 1).select(
        F.col("id").cast("int").alias("idx"), F.lit(0.0).alias("w")
    )

    # z_prev carries round k-1's margins forward: the metrics pass of
    # round k-1 and the gradient pass of round k read the SAME relation
    # (the oracle's z{k} CTE plays both roles too), so each round does
    # one margin aggregation, not two. w0 = 0 → z0 ≡ 0, no compute.
    z_prev = labels.select("vec_id", "y", F.lit(0.0).alias("z"))
    out_rows = []
    for k in range(1, rounds + 1):
        p = z_prev.select(
            "vec_id", "y", (1.0 / (1.0 + F.exp(-F.col("z")))).alias("p")
        )
        g = (
            pts.join(p.select("vec_id", "p"), "vec_id")
            .groupBy("idx")
            .agg(F.sum((F.col("p") - F.col("y")) * F.col("val")).alias("gs"))
        )
        # w must be materialized: three consumers (z, norm_w, next g)
        # would otherwise each re-execute the gradient aggregation
        w = materialize(
            w.join(g, "idx")
            .crossJoin(n_rel)
            .select(
                "idx",
                F.round(
                    F.col("w") - F.lit(lr) * F.col("gs") / F.col("n_total"), 6
                ).alias("w"),
            )
        )
        z_prev = materialize(
            pts.join(w, "idx")
            .groupBy("vec_id", "y")
            .agg(F.sum(F.col("val") * F.col("w")).alias("z"))
        )
        metrics = (
            z_prev.agg(
                F.round(
                    F.avg(
                        F.greatest(F.col("z"), F.lit(0.0))
                        - F.col("y") * F.col("z")
                        + F.log(1.0 + F.exp(-F.abs(F.col("z"))))
                    ),
                    4,
                ).alias("loss"),
                F.round(
                    F.avg(
                        F.when(
                            (F.col("z") > 0) == (F.col("y") > 0.5), 1.0
                        ).otherwise(0.0)
                    ),
                    4,
                ).alias("accuracy"),
            )
            .crossJoin(w.agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 4).alias("norm_w")))
            .select(F.lit(k).cast("int").alias("step"), "loss", "accuracy", "norm_w")
        )
        out_rows.append(metrics)
    out = out_rows[0]
    for e in out_rows[1:]:
        out = out.unionAll(e)
    return out
