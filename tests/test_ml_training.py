"""Semantics tests for the part-13 training tier: logistic-regression
GD, boosted stumps, AUC, MI — pinned against hand-computed small
cases and pure-Python references."""

import math

from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators.linear import logreg_gd_trajectory
from ndvi_etl_pipeline_spark.operators.trees import boosted_stumps


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")


def test_logreg_learns_separable_data(spark):
    # y = 1 iff dim0 > 0 — linearly separable; loss must fall, accuracy rise
    rows = []
    for i in range(40):
        x = (i % 2) * 2.0 - 1.0  # -1 or +1
        rows.append((i, [x, 0.5 * x], 1 if x > 0 else 0))
    df = _emb_df(spark, rows)
    traj = (
        logreg_gd_trajectory(df, F.col("label"), rounds=3, lr=1.0, dims=2)
        .orderBy("step")
        .collect()
    )
    assert [t.step for t in traj] == [1, 2, 3]
    assert traj[0].loss > traj[1].loss > traj[2].loss
    assert traj[-1].accuracy == 1.0
    assert traj[-1].norm_w > 0


def test_logreg_first_step_matches_closed_form(spark):
    # with w0 = 0: p = 0.5 for all rows, so g = mean((0.5 - y) x) and
    # w1 = -lr * g exactly (before rounding at 1e-6)
    rows = [(0, [1.0], 1), (1, [-1.0], 0), (2, [2.0], 1), (3, [-2.0], 0)]
    df = _emb_df(spark, rows)
    traj = logreg_gd_trajectory(df, F.col("label"), rounds=1, lr=1.0, dims=1).collect()
    # g = ((0.5-1)*1 + (0.5-0)*-1 + (0.5-1)*2 + (0.5-0)*-2)/4 = -0.75
    w1 = 0.75
    zs = [w1 * x for x in (1.0, -1.0, 2.0, -2.0)]
    ys = [1, 0, 1, 0]
    loss = sum(math.log(1 + math.exp(-z)) + (1 - y) * z for z, y in zip(zs, ys)) / 4
    assert abs(traj[0].loss - round(loss, 4)) < 1e-9
    assert abs(traj[0].norm_w - w1) < 1e-6


def test_boosted_stumps_mse_decreases_and_fits_step_function(spark):
    # y is a step function of x → one stump nails it, later rounds refine
    rows = [(float(x), 1.0 if x < 5 else 9.0) for x in range(10) for _ in range(4)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    traj = (
        boosted_stumps(df, F.col("x"), F.col("y"), bucket_width=1.0, rounds=3, lr=1.0)
        .orderBy("step")
        .collect()
    )
    assert traj[0].mse >= traj[1].mse >= traj[2].mse
    # the first split must be at the step boundary (threshold 5.0)
    assert traj[0].threshold == 5.0
    # lr=1 with a perfect stump → MSE ~ 0 after round 1
    assert traj[0].mse < 1e-6


def test_boosted_stumps_single_scan_plan(spark):
    """The scale claim: rounds run over the bucket relation — the
    input table is scanned exactly once (at state materialization).
    Uses a parquet input so real input scans ("Scan parquet") are
    distinguishable from checkpoint scans ("Scan ExistingRDD") in
    the physical plan."""
    import os
    import tempfile

    rows = [(float(x % 7), float(x % 3)) for x in range(100)]
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "pts.parquet")
        spark.createDataFrame(rows, "x DOUBLE, y DOUBLE").write.parquet(path)
        df = spark.read.parquet(path)
        out = boosted_stumps(df, F.col("x"), F.col("y"), bucket_width=1.0, rounds=2)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
    # the returned metrics plan reads ONLY materialized round state —
    # the parquet input must not appear at all (it was scanned once,
    # inside the eager state materialization before any round ran)
    assert "Scan parquet" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan  # the checkpointed state is the source


def test_auc_perfect_and_reversed(spark, sf_dir):
    from ndvi_etl_pipeline_spark.plans.catalog.part13_ml_training import (
        q_roc_auc_embedding,
    )

    r = q_roc_auc_embedding(spark, sf_dir).collect()[0]
    assert r.n_pos > 0 and r.n_neg > 0
    assert 0.0 <= r.auc <= 1.0


def test_auc_matches_sklearn_free_reference(spark):
    """AUC formula vs a brute-force pairwise comparison, ties included."""
    import itertools

    rows = [
        (0, [0.1], 0), (1, [0.4], 0), (2, [0.4], 1), (3, [0.8], 1), (4, [0.9], 0),
    ]
    df = _emb_df(spark, rows)
    df.createOrReplaceTempView("_auc_t")
    sc = df.select(
        (F.col("label") % 2).cast("int").alias("y"),
        F.element_at("embedding", 1).cast("double").alias("score"),
    ).collect()
    pos = [r.score for r in sc if r.y == 1]
    neg = [r.score for r in sc if r.y == 0]
    expect = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    ) / (len(pos) * len(neg))

    from pyspark.sql import Window

    rk = df.select(
        (F.col("label") % 2).cast("int").alias("y"),
        F.element_at("embedding", 1).cast("double").alias("score"),
    ).select(
        "y",
        F.rank().over(Window.orderBy("score")).alias("r"),
        F.count("*").over(Window.partitionBy("score")).alias("c"),
    )
    u = rk.agg(
        F.sum(F.when(F.col("y") == 1, F.col("r") + (F.col("c") - 1) / 2.0)).alias("rsum"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("np"),
        F.count("*").alias("nn"),
    ).collect()[0]
    auc = (u.rsum - u.np * (u.np + 1) / 2.0) / (u.np * (u.nn - u.np))
    assert abs(auc - expect) < 1e-12


def test_mi_independent_token_is_zero(spark):
    """A token present in exactly the same proportion of en and non-en
    docs carries zero mutual information."""
    from ndvi_etl_pipeline_spark.plans.catalog.part13_ml_training import (
        q_mi_token_selection,
    )
    import tempfile, os

    rows = []
    # 8 docs: 'both' appears everywhere (MI 0); 'only_en' in en docs only
    for i in range(8):
        lang = "en" if i < 4 else "de"
        text = "both " + ("only_en" if lang == "en" else "filler")
        rows.append((i, text, lang, "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    with tempfile.TemporaryDirectory() as td:
        for t in ("documents",):
            df.write.mode("overwrite").parquet(os.path.join(td, f"{t}.parquet"))
        out = {r.token: r.mi for r in q_mi_token_selection(spark, td).collect()}
    assert abs(out["both"]) < 1e-12
    assert out["only_en"] > 0.1
