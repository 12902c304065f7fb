"""Part-17 semantics: WOE/IV against a hand calculation, and the
feature search against the single-feature stump it wraps."""

import math

from pyspark.sql import functions as F


def test_woe_iv_hand_case(spark, sf_dir_oracle):
    from ndvi_etl_pipeline_spark.plans.catalog.part17_feature_eval import (
        q_woe_iv_binning,
    )

    rows = q_woe_iv_binning(spark, sf_dir_oracle).collect()
    assert len(rows) == 10
    p_t = sum(r.n_pos for r in rows)
    g_t = sum(r.n_neg for r in rows)
    iv = 0.0
    for r in rows:
        pp = (r.n_pos + 0.5) / p_t
        gg = (r.n_neg + 0.5) / g_t
        w = math.log(pp / gg)
        assert math.isclose(r.woe, round(w, 6), abs_tol=2e-6)
        iv += (pp - gg) * w
    assert math.isclose(rows[0].iv_total, round(iv, 6), abs_tol=2e-6)
    # equal-frequency bins: sizes differ by at most 1
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_best_feature_split_agrees_with_single_stump(spark, sf_dir_oracle):
    from ndvi_etl_pipeline_spark.operators.trees import variance_splits
    from ndvi_etl_pipeline_spark.plans.catalog._shared import _t
    from ndvi_etl_pipeline_spark.plans.catalog.part17_feature_eval import (
        _FEATURES,
        q_best_feature_split,
    )
    from pyspark.sql import Window

    got = {r.feature: (r.threshold, r.gain) for r in q_best_feature_split(spark, sf_dir_oracle).collect()}
    assert set(got) == {n for n, _, _ in _FEATURES}
    li = _t(spark, sf_dir_oracle, "lineitem")
    for name, col, width in _FEATURES:
        best = (
            variance_splits(li, F.col(col), F.col("l_quantity"), width)
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.orderBy(
                        F.desc(F.round(F.col("gain"), 6)), F.asc("threshold")
                    )
                ),
            )
            .where(F.col("rk") == 1)
            .collect()[0]
        )
        assert got[name] == (best.threshold, round(best.gain, 6))
        assert got[name][1] >= 0.0  # variance reduction is non-negative at the optimum
