"""Raster codec tier: tile⇄pixel roundtrip, tile-path NDVI parity with
the (oracle-checked) pixel path, and the pure-Python GeoTIFF codec."""

import numpy as np
import pyspark.sql.functions as F

from ndvi_etl_pipeline_spark.operators import raster
from ndvi_etl_pipeline_spark.plans.queries import (
    derived_pixels,
    q_ndvi_scene_stats,
)


def band_tiles(spark, sf_dir, tile=32):
    return raster.pixels_to_tiles(derived_pixels(spark, sf_dir), tile=tile)


def test_tile_pixel_roundtrip(spark, sf_dir):
    px = derived_pixels(spark, sf_dir)
    # last-write-wins for duplicate grid cells (the generator can emit
    # several rows per cell; the packer keeps one — compare as sets of
    # cells with ANY of the original values)
    orig = {
        (r.scene_id, r.band, r.y, r.x)
        for r in px.select("scene_id", "band", "y", "x").distinct().collect()
    }
    back = raster.tiles_to_pixels(band_tiles(spark, sf_dir))
    got = {
        (r.scene_id, r.band, r.y, r.x)
        for r in back.select("scene_id", "band", "y", "x").collect()
    }
    assert got == orig


def test_tile_ndvi_matches_pixel_path(spark, sf_dir):
    """The tile-form kernel must reproduce the oracle-checked pixel
    path bit-for-bit at round(6)."""
    # dedupe grid cells first so both paths see identical inputs
    px = (
        derived_pixels(spark, sf_dir)
        .groupBy("scene_id", "band", "y", "x")
        .agg(F.max("dn").alias("dn"))
    )
    tiles = raster.pixels_to_tiles(px, tile=32)
    got = {
        r.scene_id: (r.n_pixels, r.n_valid, r.mean_ndvi)
        for r in raster.tile_scene_stats(raster.tile_ndvi(tiles)).collect()
    }
    # pixel path on the same deduped input
    from ndvi_etl_pipeline_spark.functions.ndvi import ndvi_from_dn
    from ndvi_etl_pipeline_spark.operators.bands import pair_bands

    nv = pair_bands(px).select(
        "scene_id", ndvi_from_dn("red_dn", "nir_dn", nodata_dn=0.0).alias("ndvi")
    )
    want = {
        r.scene_id: (r.n_pixels, r.n_valid, r.mean_ndvi)
        for r in nv.groupBy("scene_id")
        .agg(
            F.count("*").alias("n_pixels"),
            F.count("ndvi").alias("n_valid"),
            F.round(F.avg("ndvi"), 6).alias("mean_ndvi"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for scene in want:
        assert got[scene][0] == want[scene][0], scene
        assert got[scene][1] == want[scene][1], scene
        assert abs(got[scene][2] - want[scene][2]) <= 1e-6, scene


def test_geotiff_roundtrip(tmp_path):
    rng = np.random.default_rng(42)
    arr = rng.normal(size=(57, 43)).astype(np.float32)
    p = str(tmp_path / "t.tif")
    raster.write_geotiff(arr, p, origin=(25.1, 60.6), pixel_size=(0.1, 0.1), epsg=4326)
    back, meta = raster.read_geotiff(p)
    np.testing.assert_array_equal(back, arr)
    assert meta["epsg"] == 4326
    assert meta["nodata"] == raster.NODATA
    assert meta["origin"] == (25.1, 60.6)
    assert meta["pixel_size"] == (0.1, 0.1)


def test_export_scene_geotiffs(spark, sf_dir, tmp_path):
    px = (
        derived_pixels(spark, sf_dir)
        .groupBy("scene_id", "band", "y", "x")
        .agg(F.max("dn").alias("dn"))
    )
    ndvi_tiles = raster.tile_ndvi(raster.pixels_to_tiles(px, tile=32))
    receipts = raster.export_scene_geotiffs(ndvi_tiles, str(tmp_path)).collect()
    assert len(receipts) == 3  # 3 derived scenes
    stats = {
        r.scene_id: r.mean_ndvi
        for r in q_ndvi_scene_stats(spark, sf_dir).collect()
    }
    for r in receipts:
        arr, meta = raster.read_geotiff(r.path)
        assert arr.shape == (r.height, r.width)
        vals = arr[arr != raster.NODATA]
        assert vals.size > 0
        assert -1.0 <= vals.min() and vals.max() <= 1.0


def _ndvi_tiles(spark, sf_dir):
    px = (
        derived_pixels(spark, sf_dir)
        .groupBy("scene_id", "band", "y", "x")
        .agg(F.max("dn").alias("dn"))
    )
    return raster.tile_ndvi(raster.pixels_to_tiles(px, tile=32))


def test_tile_clip_matches_pixel_path(spark, sf_dir):
    """tile_clip_stats (bbox-pruned tile kernel) must agree with the
    pixel path (clip_filter explode + groupBy avg) exactly."""
    from ndvi_etl_pipeline_spark.functions.geo import clip_filter

    ring = [(10.0, 12.0), (88.0, 18.0), (92.0, 85.0), (50.0, 55.0), (15.0, 80.0)]
    ndvi = _ndvi_tiles(spark, sf_dir)
    got = {
        r.scene_id: (r.n_in_aoi, r.mean_ndvi)
        for r in raster.tile_clip_stats(ndvi, ring).collect()
    }
    px = raster.tiles_to_pixels(ndvi, value_name="ndvi")
    want = {
        r.scene_id: (r.n, r.mean_ndvi)
        for r in clip_filter(px, "x", "y", ring)
        .groupBy("scene_id")
        .agg(F.count("*").alias("n"), F.avg("ndvi").alias("mean_ndvi"))
        .collect()
    }
    assert set(got) == set(want)
    for scene, (n, mean) in want.items():
        assert got[scene][0] == n, scene
        assert abs(got[scene][1] - mean) <= 1e-9, scene


def test_tile_overviews_match_pixel_cascade(spark, sf_dir):
    """tile_overviews (single narrow pass) must agree with the
    oracle-checked pixel-form cascade at every level to float32
    chaining precision."""
    from ndvi_etl_pipeline_spark.operators.overviews import overview_cascade

    factors = (2, 4, 8, 16, 32)
    ndvi = _ndvi_tiles(spark, sf_dir)
    tiles_ov = raster.tile_overviews(ndvi, factors=factors)
    px = raster.tiles_to_pixels(ndvi, value_name="ndvi")
    levels = overview_cascade(px, factors=factors, value_col="ndvi")
    for f in factors:
        got = {
            (r.scene_id, r.y, r.x): r.v
            for r in raster.tiles_to_pixels(
                tiles_ov.filter(F.col("factor") == f).drop("factor", "n_valid"),
                value_name="v",
            ).collect()
        }
        want = {(r.scene_id, r.y, r.x): r.v for r in levels[f].collect()}
        assert set(got) == set(want), f
        for k, v in want.items():
            assert abs(got[k] - v) <= 1e-5, (f, k)


def test_scan_scene_ndvi_matches_codec_path(spark, tmp_path):
    """The fused file-level path (scan_scene_ndvi) must reproduce the
    general codec path (scan_geotiffs → tile_ndvi) exactly, and drop
    scenes missing a band (J1 inner-join semantics)."""
    rng = np.random.default_rng(7)
    for i in range(3):
        scene = f"SC{i:02d}_20220601"
        red = rng.integers(0, 30000, size=(70, 90)).astype(np.float32)
        nir = rng.integers(0, 60000, size=(70, 90)).astype(np.float32)
        raster.write_geotiff(red, str(tmp_path / f"{scene}_red.tif"))
        if i != 2:  # scene 2 is missing its NIR band → must drop out
            raster.write_geotiff(nir, str(tmp_path / f"{scene}_nir.tif"))

    fused = raster.scan_scene_ndvi(spark, str(tmp_path), tile=32)
    general = raster.tile_ndvi(raster.scan_geotiffs(spark, str(tmp_path), tile=32))

    def key_stats(df):
        return {
            (r.scene_id, r.tile_y, r.tile_x): (r.n_pixels, r.n_valid, round(r.sum_ndvi, 9))
            for r in df.collect()
        }

    got, want = key_stats(fused), key_stats(general)
    assert got == want
    assert not any(k[0].startswith("SC02") for k in got)

    # payloads bit-identical too
    fp = raster.tiles_to_pixels(fused, value_name="v").collect()
    gp = raster.tiles_to_pixels(general, value_name="v").collect()
    assert {(r.scene_id, r.y, r.x, r.v) for r in fp} == {
        (r.scene_id, r.y, r.x, r.v) for r in gp
    }


def test_arrow_and_pandas_kernels_agree(spark, tmp_path):
    """The mapInArrow/applyInArrow fast paths must emit bit-identical
    rows to the pandas kernels they replace — same tiles, same
    payload bytes, same partial aggregates."""
    rng = np.random.default_rng(11)
    for i in range(2):
        scene = f"AR{i:02d}_20220601"
        red = rng.integers(0, 30000, size=(70, 90)).astype(np.float32)
        nir = rng.integers(0, 60000, size=(70, 90)).astype(np.float32)
        raster.write_geotiff(red, str(tmp_path / f"{scene}_red.tif"))
        raster.write_geotiff(nir, str(tmp_path / f"{scene}_nir.tif"))

    def tile_set(df):
        return {
            (r.scene_id, r.band, r.tile_y, r.tile_x, r.y0, r.x0, bytes(r.data))
            for r in df.collect()
        }

    arrow_scan = raster.scan_geotiffs(spark, str(tmp_path), tile=32, use_arrow=True)
    pandas_scan = raster.scan_geotiffs(spark, str(tmp_path), tile=32, use_arrow=False)
    assert tile_set(arrow_scan) == tile_set(pandas_scan)

    parsed = raster.parse_band_files(
        spark.read.format("binaryFile").load(str(tmp_path))
    )

    def ndvi_set(df):
        return {
            (r.scene_id, r.tile_y, r.tile_x, bytes(r.data), r.n_pixels, r.n_valid,
             round(r.sum_ndvi, 9))
            for r in df.collect()
        }

    a = raster.scene_ndvi_from_bands(parsed, tile=32, use_arrow=True)
    p = raster.scene_ndvi_from_bands(parsed, tile=32, use_arrow=False)
    assert ndvi_set(a) == ndvi_set(p)


def test_scan_scene_ndvi_quarantines_bad_scene(spark, tmp_path):
    """E1 per-scene failure isolation: a corrupt band file must drop
    only its own scene under on_error='quarantine', and fail the job
    under the default strict mode."""
    import pytest

    rng = np.random.default_rng(11)
    for s in ("GOOD_20220601", "BAD_20220602"):
        red = rng.integers(0, 30000, size=(48, 48)).astype(np.float32)
        nir = rng.integers(0, 60000, size=(48, 48)).astype(np.float32)
        raster.write_geotiff(red, str(tmp_path / f"{s}_red.tif"))
        raster.write_geotiff(nir, str(tmp_path / f"{s}_nir.tif"))
    (tmp_path / "BAD_20220602_red.tif").write_bytes(b"NOT A TIFF AT ALL")

    good = raster.scan_scene_ndvi(
        spark, str(tmp_path), tile=32, on_error="quarantine"
    )
    assert {r.scene_id for r in good.select("scene_id").distinct().collect()} == {
        "GOOD_20220601"
    }

    with pytest.raises(Exception):
        raster.scan_scene_ndvi(spark, str(tmp_path), tile=32).count()


def test_tiled_deflate_geotiff_roundtrip(tmp_path):
    """The reference's storage profile (tiled 256, deflate, predictor 3,
    compute_ndvi.py:79-84) in pure Python: roundtrip must be lossless
    (incl. NaN and odd dims) and the fp predictor must actually earn
    its keep on smooth data."""
    rng = np.random.default_rng(21)
    # smooth field (realistic NDVI) + NaN holes + odd (non-tile) dims
    yy, xx = np.mgrid[0:300, 0:517]
    smooth = (np.sin(yy / 37.0) * np.cos(xx / 53.0)).astype(np.float32)
    smooth[::11, ::7] = np.nan

    p_tiled = str(tmp_path / "tiled.tif")
    raster.write_geotiff_tiled(smooth, p_tiled, origin=(25.1, 60.6),
                               pixel_size=(0.1, 0.1), epsg=32635)
    back, meta = raster.read_geotiff(p_tiled)
    np.testing.assert_array_equal(back, smooth)
    assert meta["epsg"] == 32635
    assert meta["origin"] == (25.1, 60.6)
    assert meta["nodata"] == raster.NODATA

    # predictor-3 + deflate must beat plain deflate of the raw bytes
    import os
    import zlib

    raw_deflate = len(zlib.compress(smooth.tobytes(), 6))
    assert os.path.getsize(p_tiled) < raw_deflate * 0.9

    # predictor=1 path also roundtrips
    p1 = str(tmp_path / "p1.tif")
    raster.write_geotiff_tiled(smooth, p1, predictor=1)
    back1, _ = raster.read_geotiff(p1)
    np.testing.assert_array_equal(back1, smooth)

    # and the binaryFile-scan decoder handles the tiled profile too
    arr2, meta2 = raster.decode_geotiff_bytes(open(p_tiled, "rb").read())
    np.testing.assert_array_equal(arr2, smooth)


def test_export_tiled_profile(spark, sf_dir, tmp_path):
    """K1 with the reference's tiled-deflate profile end to end."""
    ndvi_tiles = _ndvi_tiles(spark, sf_dir)
    receipts = raster.export_scene_geotiffs(
        ndvi_tiles, str(tmp_path), profile="tiled"
    ).collect()
    assert receipts
    for r in receipts:
        arr, meta = raster.read_geotiff(r.path)
        assert arr.shape == (r.height, r.width)
        assert meta["nodata"] == raster.NODATA


def test_scan_handles_tiled_profile_files(spark, tmp_path):
    """scan_scene_ndvi must give identical results whether band files
    use the striped or the tiled/deflate/predictor-3 profile."""
    rng = np.random.default_rng(17)
    (tmp_path / "a").mkdir(), (tmp_path / "b").mkdir()
    for s in ("S1_20220601", "S2_20220602"):
        red = rng.integers(0, 30000, size=(70, 90)).astype(np.float32)
        nir = rng.integers(0, 60000, size=(70, 90)).astype(np.float32)
        raster.write_geotiff(red, str(tmp_path / "a" / f"{s}_red.tif"))
        raster.write_geotiff(nir, str(tmp_path / "a" / f"{s}_nir.tif"))
        raster.write_geotiff_tiled(red, str(tmp_path / "b" / f"{s}_red.tif"), tile=32)
        raster.write_geotiff_tiled(nir, str(tmp_path / "b" / f"{s}_nir.tif"), tile=32)

    def stats(d):
        return {
            r.scene_id: (r.n_pixels, r.n_valid, r.mean_ndvi)
            for r in raster.tile_scene_stats(
                raster.scan_scene_ndvi(spark, str(d), tile=32)
            ).collect()
        }

    assert stats(tmp_path / "a") == stats(tmp_path / "b")
