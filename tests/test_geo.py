"""Geometry kernel: ray-cast correctness (column expr, SQL twin, numpy
UDF) against a brute-force Python oracle, plus the scalar helpers."""

import math
import random

import pyspark.sql.functions as F
import pytest

from ndvi_etl_pipeline_spark.functions import geo

SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
# concave "L" — exercises even-odd with >1 crossing
ELL = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0), (4.0, 10.0), (0.0, 10.0)]
TRIANGLE = [(1.0, 1.0), (9.0, 2.0), (5.0, 9.0)]


def py_ray_cast(px, py, poly):
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if y1 == y2:
            continue
        if (y1 > py) != (y2 > py) and px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
            inside = not inside
    return inside


def random_points(n, seed):
    rng = random.Random(seed)
    # .17/.37 offsets keep points off polygon edges
    return [(rng.randint(-2, 12) + 0.17, rng.randint(-2, 12) + 0.37) for _ in range(n)]


@pytest.mark.parametrize("poly", [SQUARE, ELL, TRIANGLE], ids=["square", "ell", "tri"])
def test_column_expr_matches_python(spark, poly):
    pts = random_points(300, seed=7)
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r.x, r.y): r.inside
        for r in df.withColumn(
            "inside", geo.point_in_polygon_col("x", "y", poly)
        ).collect()
    }
    for px, py in pts:
        assert got[(px, py)] == py_ray_cast(px, py, poly), (px, py)


@pytest.mark.parametrize("poly", [SQUARE, ELL], ids=["square", "ell"])
def test_sql_twin_matches_column_expr(spark, poly):
    pts = random_points(200, seed=11)
    df = spark.createDataFrame(pts, ["x", "y"])
    df.createOrReplaceTempView("pts_geo")
    sql_pred = geo.point_in_polygon_sql("x", "y", poly)
    via_sql = {
        (r.x, r.y): r.inside
        for r in spark.sql(f"SELECT x, y, {sql_pred} AS inside FROM pts_geo").collect()
    }
    via_col = {
        (r.x, r.y): r.inside
        for r in df.withColumn("inside", geo.point_in_polygon_col("x", "y", poly)).collect()
    }
    assert via_sql == via_col


def test_numpy_udf_matches_python(spark):
    pts = random_points(300, seed=13)
    df = spark.createDataFrame(pts, ["x", "y"]).withColumn(
        "ring", geo.ring_literal(ELL)
    )
    got = {
        (r.x, r.y): r.inside
        for r in df.withColumn(
            "inside", geo.st_contains_udf("ring", "x", "y")
        ).collect()
    }
    for px, py in pts:
        assert got[(px, py)] == py_ray_cast(px, py, ELL), (px, py)


def test_clip_filter_counts(spark):
    pts = random_points(500, seed=17)
    df = spark.createDataFrame(pts, ["x", "y"])
    expected = sum(1 for p in pts if py_ray_cast(p[0], p[1], ELL))
    assert geo.clip_filter(df, "x", "y", ELL).count() == expected


# donut + island: exterior square, hole, and a disjoint exterior
DONUT = [
    SQUARE,
    [(3.0, 3.0), (7.0, 3.0), (7.0, 7.0), (3.0, 7.0)],  # hole
    [(-2.0, -2.0), (-1.0, -2.0), (-1.0, -1.0), (-2.0, -1.0)],  # island
]


def py_ray_cast_rings(px, py, rings):
    inside = False
    for ring in rings:
        if py_ray_cast(px, py, ring):
            inside = not inside
    return inside


def test_rings_hole_and_island_semantics(spark):
    pts = random_points(400, seed=23)
    # pin the four interesting cases alongside the random sweep
    pts += [(5.17, 5.37), (1.17, 1.37), (-1.83, -1.63), (11.17, 11.37)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r.x, r.y): r.inside
        for r in df.withColumn(
            "inside", geo.point_in_rings_col("x", "y", DONUT)
        ).collect()
    }
    for px, py in pts:
        assert got[(px, py)] == py_ray_cast_rings(px, py, DONUT), (px, py)
    assert got[(5.17, 5.37)] is False   # inside the hole → outside
    assert got[(1.17, 1.37)] is True    # in the annulus
    assert got[(-1.83, -1.63)] is True  # on the island
    assert got[(11.17, 11.37)] is False


def test_rings_sql_twin_matches_column_expr(spark):
    pts = random_points(200, seed=29)
    df = spark.createDataFrame(pts, ["x", "y"])
    df.createOrReplaceTempView("pts_rings")
    sql_pred = geo.point_in_rings_sql("x", "y", DONUT)
    via_sql = {
        (r.x, r.y): r.inside
        for r in spark.sql(f"SELECT x, y, {sql_pred} AS inside FROM pts_rings").collect()
    }
    via_col = {
        (r.x, r.y): r.inside
        for r in df.withColumn("inside", geo.point_in_rings_col("x", "y", DONUT)).collect()
    }
    assert via_sql == via_col


def test_clip_filter_accepts_rings(spark):
    pts = random_points(500, seed=31)
    df = spark.createDataFrame(pts, ["x", "y"])
    expected = sum(1 for p in pts if py_ray_cast_rings(p[0], p[1], DONUT))
    assert geo.clip_filter(df, "x", "y", DONUT).count() == expected
    # single-ring dispatch still works through the same entry point
    expected_one = sum(1 for p in pts if py_ray_cast(p[0], p[1], ELL))
    assert geo.clip_filter(df, "x", "y", ELL).count() == expected_one
    assert geo.rings_bbox(DONUT) == (-2.0, -2.0, 10.0, 10.0)


def test_bbox_intersects(spark):
    rows = [
        (0.0, 0.0, 5.0, 5.0, True),    # overlaps
        (6.0, 6.0, 8.0, 8.0, True),    # inside other
        (11.0, 0.0, 12.0, 5.0, False), # right of other
        (0.0, 10.5, 5.0, 12.0, False), # above other
        (10.0, 10.0, 12.0, 12.0, True) # touching corner counts
    ]
    df = spark.createDataFrame(rows, ["mnx", "mny", "mxx", "mxy", "want"])
    out = df.withColumn(
        "got", geo.bbox_intersects("mnx", "mny", "mxx", "mxy", (0.0, 0.0, 10.0, 10.0))
    )
    assert out.filter(F.col("got") != F.col("want")).count() == 0


def test_scalar_helpers():
    assert geo.polygon_area(SQUARE) == pytest.approx(100.0)
    assert geo.polygon_area(ELL) == pytest.approx(64.0)
    cx, cy = geo.polygon_centroid(SQUARE)
    assert (cx, cy) == (pytest.approx(5.0), pytest.approx(5.0))
    assert geo.polygon_bbox(TRIANGLE) == (1.0, 1.0, 9.0, 9.0)
    # UTM: Helsinki ~ (25.0, 60.4) → zone 35 north
    assert geo.utm_epsg(25.0, 60.4) == 32635
    assert geo.utm_epsg(25.0, -33.0) == 32735
    minx, miny, maxx, maxy = geo.pad_bbox_km((25.0, 60.0, 26.0, 61.0), 10.0)
    assert minx < 25.0 and maxx > 26.0 and miny < 60.0 and maxy > 61.0
    # longitude pad grows with latitude (cos shrinks)
    eq = geo.pad_bbox_km((0.0, -0.5, 1.0, 0.5), 10.0)
    assert (25.0 - minx) > (0.0 - eq[0])


def test_buffered_membership_distance_semantics(spark):
    """point ∈ buffer(poly, d) ⇔ inside OR dist(point, edge) ≤ d —
    checked against hand-computed distances to a unit square."""
    import pyspark.sql.functions as F

    from ndvi_etl_pipeline_spark.functions.geo import point_in_buffered_rings_col

    square = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    pts = [
        (5.0, 5.0, True),    # inside
        (12.0, 5.0, True),   # 2.0 right of the right edge
        (13.1, 5.0, False),  # 3.1 right: outside the 3-buffer
        (12.0, 12.0, True),  # corner distance sqrt(8) ≈ 2.83 ≤ 3
        (12.2, 12.2, False), # corner distance sqrt(9.68) ≈ 3.11 > 3
        (-3.0, 5.0, True),   # exactly on the buffer boundary
        (5.0, -3.01, False),
    ]
    df = spark.createDataFrame(
        [(x, y) for x, y, _ in pts], "x double, y double"
    ).withColumn("inb", point_in_buffered_rings_col("x", "y", [square], 3.0))
    got = {(r.x, r.y): r.inb for r in df.collect()}
    for x, y, want in pts:
        assert got[(x, y)] == want, (x, y)


def test_buffer_retry_clip_recovers_missed_overlap(spark):
    """An AOI strictly outside the grid: strict clip empty, buffered
    clip (the reference's buffer-retry, compute_ndvi.py:128-132)
    recovers the near-boundary pixels."""
    from ndvi_etl_pipeline_spark.functions.geo import (
        buffered_clip_filter,
        clip_filter,
    )

    rows = [("s", y, x, 1.0) for y in range(20) for x in range(20)]
    px = spark.createDataFrame(rows, "scene_id string, y int, x int, v double")
    aoi = [(21.5, 2.5), (30.5, 2.5), (30.5, 12.5), (21.5, 12.5)]  # x > 19
    assert clip_filter(px, "x", "y", aoi).count() == 0
    got = buffered_clip_filter(px, "x", "y", aoi, 3.0).collect()
    assert got, "buffered clip must recover near-boundary pixels"
    # recovered pixels: within 3.0 of the left edge x=21.5 → x=19,
    # y within [2.5-eps, 12.5+eps] band expanded by the corner radius
    for r in got:
        assert r.x == 19
        assert 0 <= r.y <= 15
        dy = max(0.0, max(2.5 - r.y, r.y - 12.5))
        assert (21.5 - r.x) ** 2 + dy**2 <= 9.0 + 1e-12


def test_grid_spatial_join_blocks_and_refines(spark):
    """Grid-blocked spatial join: exact membership for a polygon
    TABLE, multi-match on overlap, and the candidate set bounded by
    blocking (no cross join)."""
    import pyspark.sql.functions as F

    from ndvi_etl_pipeline_spark.operators.spatial_join import (
        cover_cells,
        grid_spatial_join,
    )

    pts = spark.createDataFrame(
        [(y, x) for y in range(30) for x in range(30)], "y int, x int"
    )
    rings = {
        1: [(2.5, 2.5), (12.5, 2.5), (12.5, 12.5), (2.5, 12.5)],
        2: [(10.5, 10.5), (20.5, 10.5), (20.5, 20.5), (10.5, 20.5)],  # overlaps 1
        3: [(24.5, 24.5), (28.5, 24.5), (28.5, 28.5), (24.5, 28.5)],  # disjoint
    }
    aois = spark.createDataFrame(
        [(k, [float(v) for p in r for v in p]) for k, r in rings.items()],
        "aoi_id int, ring array<double>",
    )
    out = grid_spatial_join(pts, aois, cell=8.0).collect()
    got = {(r.aoi_id, r.x, r.y) for r in out}

    def inside(x, y, ring):
        n = len(ring)
        ins = False
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < x1 + (y - y1) * (x2 - x1) / (y2 - y1):
                ins = not ins
        return ins

    want = {
        (k, x, y)
        for k, r in rings.items()
        for y in range(30)
        for x in range(30)
        if inside(x, y, r)
    }
    assert got == want
    # overlap region matched by BOTH aoi 1 and 2
    assert (1, 11, 11) in got and (2, 11, 11) in got
    # blocking really bounds the cell table: bbox cells only
    n_cells = cover_cells(aois, "ring", 8.0).count()
    assert n_cells <= 3 * 9  # <= 9 cells per aoi at cell=8
