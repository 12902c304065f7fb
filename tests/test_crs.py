"""CRS transform tests (functions/crs.py) — pure numpy, no Spark.

Validated by projection invariants rather than a library oracle
(pyproj isn't in the container): roundtrip closure, central-meridian
symmetry, the UTM scale factor, hemisphere offsets, and the web
mercator closed forms.
"""

import numpy as np

from ndvi_etl_pipeline_spark.functions.crs import (
    lonlat_to_utm,
    lonlat_to_webmercator,
    reproject_inverse_map,
    utm_central_meridian,
    utm_to_lonlat,
    webmercator_to_lonlat,
)
from ndvi_etl_pipeline_spark.functions.geo import utm_epsg


def test_utm_roundtrip_submillimeter():
    rng = np.random.default_rng(7)
    # zone 35 (the reference AOI's zone), points across the zone width
    lon = 27.0 + rng.uniform(-2.9, 2.9, 500)
    lat = rng.uniform(-80.0, 84.0, 500)
    e, n = lonlat_to_utm(lon, lat, zone=35)
    lon2, lat2 = utm_to_lonlat(e, n, zone=35)
    # 1e-8 deg ≈ 1 mm on the ground (3-term series truncation)
    assert np.max(np.abs(lon2 - lon)) < 1e-8
    assert np.max(np.abs(lat2 - lat)) < 1e-8


def test_utm_invariants():
    # central meridian maps to easting exactly 500 km, equator to N=0
    e, n = lonlat_to_utm(np.array([27.0]), np.array([0.0]), zone=35)
    assert abs(e[0] - 500000.0) < 1e-6
    assert abs(n[0]) < 1e-6
    # southern hemisphere false northing
    e_s, n_s = lonlat_to_utm(np.array([27.0]), np.array([-10.0]), zone=35, northern=False)
    e_n, n_n = lonlat_to_utm(np.array([27.0]), np.array([10.0]), zone=35)
    assert abs((10000000.0 - n_s[0]) - n_n[0]) < 1e-6
    # scale at the central meridian is k0 = 0.9996: 1" of latitude
    # near the equator is ~30.922 m of arc, scaled by k0 on the grid
    lat = np.array([0.0, 1.0 / 3600.0])
    _, n2 = lonlat_to_utm(np.array([27.0, 27.0]), lat, zone=35)
    arc = np.radians(1.0 / 3600.0) * 6335439.327  # meridional radius at equator
    assert abs((n2[1] - n2[0]) / arc - 0.9996) < 1e-4


def test_reference_aoi_lands_in_zone_35(tmp_path=None):
    # the reference's Finland AOI (boundary.geojson: ~25.1-25.6E,
    # 60.3-60.6N) → EPSG:32635, easting within the zone, sane northing
    assert utm_epsg(25.35, 60.45) == 32635
    e, n = lonlat_to_utm(np.array([25.35]), np.array([60.45]), zone=35)
    assert 200000.0 < e[0] < 500000.0  # west of the central meridian
    assert 6.6e6 < n[0] < 6.8e6  # ~60°N in meters of meridian arc


def test_webmercator_roundtrip_and_known_values():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179.9, 179.9, 200)
    lat = rng.uniform(-85.0, 85.0, 200)
    x, y = lonlat_to_webmercator(lon, lat)
    lon2, lat2 = webmercator_to_lonlat(x, y)
    assert np.max(np.abs(lon2 - lon)) < 1e-12
    assert np.max(np.abs(lat2 - lat)) < 1e-12
    # closed-form anchors: (0,0) → (0,0); 180° → πR
    x0, y0 = lonlat_to_webmercator(np.array([0.0]), np.array([0.0]))
    assert abs(x0[0]) < 1e-9 and abs(y0[0]) < 1e-9
    x180, _ = lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
    assert abs(x180[0] - np.pi * 6378137.0) < 1e-6


def test_reproject_inverse_map_identity_composition():
    """dst grid == src grid and identity CRS hop → inverse map is the
    identity on fractional pixel centers."""
    ident = lambda a, b: (a, b)  # noqa: E731
    t = (100.0, 0.5, 200.0, -0.5, 0.0, 0.0)
    inv = reproject_inverse_map(
        (t[0], t[1], 0.0, t[2], t[3], 0.0),
        (t[0], t[1], 0.0, t[2], t[3], 0.0),
        ident,
        ident,
    )
    yy = np.array([0.0, 3.0, 10.0])
    xx = np.array([0.0, 7.0, 2.0])
    sy, sx = inv(yy, xx)
    # identity hop swaps (X, Y) through (lon, lat) untouched — but the
    # map converts dst X/Y to src pixel via the same affine, so pixels
    # must match exactly... except lon/lat ordering: dst_to_lonlat
    # returns (X, Y)→(lon, lat) and lonlat_to_src (lon, lat)→(x, y).
    assert np.allclose(sy, yy) and np.allclose(sx, xx)


def test_utm_zone_central_meridians():
    assert utm_central_meridian(31) == 3.0
    assert utm_central_meridian(35) == 27.0
    assert utm_central_meridian(1) == -177.0


def test_reproject_scene_lonlat_to_utm_exact_on_linear_field(spark):
    """End-to-end raster reprojection (warp.reproject_scene): a LINEAR
    field f(lon, lat) survives bilinear resampling exactly, so every
    destination UTM pixel must equal f at the pixel center's inverse-
    projected lon/lat — validates the composed grid→CRS→grid chain to
    float precision."""
    import numpy as np

    from ndvi_etl_pipeline_spark.functions.crs import (
        lonlat_to_utm,
        utm_to_lonlat,
    )
    from ndvi_etl_pipeline_spark.operators.warp import reproject_scene

    # source: 60×60 lon/lat grid over the reference AOI's neighborhood
    h = w = 60
    lon0, dlon = 25.0, 0.01
    lat0, dlat = 60.8, -0.01  # north-up raster: dy negative
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    lon = lon0 + (jj + 0.5) * dlon
    lat = lat0 + (ii + 0.5) * dlat
    f = 3.0 * lon + 2.0 * lat  # linear in lon/lat
    rows = [
        ("S1", int(y), int(x), float(f[y, x]))
        for y in range(h)
        for x in range(w)
    ]
    pixels = spark.createDataFrame(rows, "scene_id string, y int, x int, ndvi double")

    # destination: 30 m-ish UTM grid covering the interior
    e_min, n_top = lonlat_to_utm(np.array([25.1]), np.array([60.7]), zone=35)
    dst = (float(e_min[0]), 500.0, 0.0, float(n_top[0]), -500.0, 0.0)
    src = (lon0, dlon, 0.0, lat0, dlat, 0.0)
    out_h = out_w = 20

    def dst_to_lonlat(X, Y):
        return utm_to_lonlat(X, Y, zone=35)

    def lonlat_to_src_xy(lo, la):
        return lo, la  # src CRS IS lon/lat

    out = reproject_scene(
        pixels, src, dst, out_h, out_w, dst_to_lonlat, lonlat_to_src_xy
    ).collect()
    assert len(out) > out_h * out_w * 0.5  # interior coverage

    for r in out[:200]:
        X = dst[0] + (r.x + 0.5) * dst[1]
        Y = dst[3] + (r.y + 0.5) * dst[4]
        lo, la = utm_to_lonlat(np.array([X]), np.array([Y]), zone=35)
        expect = 3.0 * lo[0] + 2.0 * la[0]
        assert abs(r.v - expect) < 1e-9, (r, expect)
