"""NDVI golden tests — the reference's own invariants plus exact values.

Reference test: /root/reference/tests/test_ndvi.py:22-37 asserts
finite, shape-preserving, range ⊆ [−1,1] on constant 1000/3000 bands.
We assert the same invariants AND the hand-computed golden value
(FIXTURES.md §5: ≈ −0.189656).
"""

import math

import pytest
from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.operators.bands import pair_bands, validate_grids
from ndvi_etl_pipeline_spark.plans.pipeline import ndvi_pixels, scene_stats
from ndvi_etl_pipeline_spark.sources import fixtures

# (nir - red) / (nir + red + eps) with red=-0.1725, nir=-0.1175 ≈ -0.189656
GOLDEN = (2000 * 0.0000275) / (4000 * 0.0000275 - 0.4 + 1e-6)


@pytest.fixture(scope="module")
def pixels(spark):
    return fixtures.band_pixels(spark).cache()


def test_golden_constant_scene(spark, pixels):
    row = (
        ndvi_pixels(pixels)
        .filter(F.col("scene_id") == fixtures.CONSTANT_SCENE)
        .agg(
            F.min("ndvi").alias("lo"),
            F.max("ndvi").alias("hi"),
            F.count("*").alias("n"),
            F.count("ndvi").alias("n_valid"),
        )
        .first()
    )
    assert row.n == 100 * 100  # shape preserved
    assert row.n_valid == 100 * 100  # all finite/valid
    assert abs(row.lo - GOLDEN) < 1e-4 and abs(row.hi - GOLDEN) < 1e-4
    assert -1.0 <= row.lo <= row.hi <= 1.0


def test_nodata_masking(spark, pixels):
    df = ndvi_pixels(pixels).filter(F.col("scene_id") == fixtures.NODATA_SCENE)
    row = df.agg(
        F.count("*").alias("n"), F.count("ndvi").alias("n_valid"), F.avg("ndvi").alias("m")
    ).first()
    assert row.n == 10000
    assert row.n_valid == 10000 - 100  # 10x10 hole masked to NULL
    assert abs(row.m - GOLDEN) < 1e-4  # mean over valid == golden constant


def test_missing_band_scene_drops_out(spark, pixels):
    scenes = {r.scene_id for r in ndvi_pixels(pixels).select("scene_id").distinct().collect()}
    assert fixtures.MISSING_BAND_SCENE not in scenes
    assert fixtures.CONSTANT_SCENE in scenes


def test_varying_scene_range_and_mean(spark, pixels):
    row = (
        ndvi_pixels(pixels)
        .filter(F.col("scene_id") == fixtures.VARYING_SCENE)
        .agg(F.min("ndvi").alias("lo"), F.max("ndvi").alias("hi"), F.avg("ndvi").alias("m"))
        .first()
    )
    assert -1.0 <= row.lo <= row.hi <= 1.0
    assert not math.isnan(row.m)


def test_scene_stats_flagship(spark, pixels):
    rows = {r.scene_id: r for r in scene_stats(pixels).collect()}
    assert fixtures.MISSING_BAND_SCENE not in rows
    c = rows[fixtures.CONSTANT_SCENE]
    assert c.sensor == "LC08"
    assert str(c.acquisition_date) == "2022-06-06"
    assert abs(c.mean_ndvi - GOLDEN) < 1e-4


def test_all_nodata_group_is_null(spark):
    df = spark.createDataFrame(
        [("S_X_Y_20220101_0_T1", "red", 0, 0, 0), ("S_X_Y_20220101_0_T1", "nir", 0, 0, 0)],
        "scene_id string, band string, y int, x int, dn int",
    )
    out = scene_stats(df).collect()
    assert len(out) == 1 and out[0].mean_ndvi is None


def test_grid_validation(spark):
    sb = fixtures.scene_bands(spark, include_mismatch=True)
    ok, bad = validate_grids(sb)
    bad_ids = [r.scene_id for r in bad.collect()]
    assert bad_ids == ["LC08_L2SP_187018_20220901_02_T1"]
    assert ok.count() == len(fixtures.ALL_SCENES)


def test_pair_bands_is_inner(spark, pixels):
    paired = pair_bands(pixels)
    assert paired.filter(F.col("red_dn").isNull() | F.col("nir_dn").isNull()).count() == 0


def test_validate_grids_null_metadata_quarantined(spark):
    """NULL grid metadata must route to quarantine, not silently pass
    (countDistinct skips NULL tuples) or vanish (0 matches neither
    filter)."""
    rows = [
        ("s_half_null", "red", None, None, None, None),
        ("s_half_null", "nir", 64, 64, [0.0, 1.0], "EPSG:32633"),
        ("s_all_null", "red", None, None, None, None),
        ("s_all_null", "nir", None, None, None, None),
        ("s_ok", "red", 64, 64, [0.0, 1.0], "EPSG:32633"),
        ("s_ok", "nir", 64, 64, [0.0, 1.0], "EPSG:32633"),
    ]
    df = spark.createDataFrame(
        rows,
        "scene_id string, band string, height int, width int, "
        "transform array<double>, crs string",
    )
    ok, bad = validate_grids(df)
    assert {r.scene_id for r in ok.collect()} == {"s_ok"}
    got_bad = {r.scene_id: r.error for r in bad.collect()}
    assert got_bad == {
        "s_half_null": "null_grid_metadata",
        "s_all_null": "null_grid_metadata",
    }
