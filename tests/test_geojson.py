"""GeoJSON source: FeatureCollection read, ring flattening, union-clip."""

import json

import pyspark.sql.functions as F

from ndvi_etl_pipeline_spark.sources import geojson as GJ

FC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"name": "west"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "east"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[6.0, 0.0], [9.0, 0.0], [9.0, 3.0], [6.0, 3.0], [6.0, 0.0]]],
            },
        },
    ],
}


def write_fc(tmp_path, fc):
    p = tmp_path / "aoi.geojson"
    p.write_text(json.dumps(fc))
    return str(p)


def test_read_feature_collection(spark, tmp_path):
    rows = GJ.read_feature_collection(spark, write_fc(tmp_path, FC)).collect()
    assert [r.name for r in rows] == ["west", "east"]
    w = rows[0]
    assert w.geom_type == "Polygon"
    assert (w.minx, w.miny, w.maxx, w.maxy) == (0.0, 0.0, 4.0, 4.0)
    assert list(w.rings[0]) == [0.0, 0.0, 4.0, 0.0, 4.0, 4.0, 0.0, 4.0, 0.0, 0.0]


def test_collect_rings_drops_closing_vertex(spark, tmp_path):
    rings = GJ.collect_rings(
        GJ.read_feature_collection(spark, write_fc(tmp_path, FC))
    )
    assert len(rings) == 2
    assert rings[0] == [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]


def test_union_clip(spark, tmp_path):
    rings = GJ.collect_rings(
        GJ.read_feature_collection(spark, write_fc(tmp_path, FC))
    )
    pts = [(x + 0.5, y + 0.5) for x in range(-1, 10) for y in range(-1, 5)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r.x, r.y)
        for r in GJ.union_clip_filter(df, "x", "y", rings).collect()
    }
    want = {
        (x, y)
        for x, y in pts
        if (0 < x < 4 and 0 < y < 4) or (6 < x < 9 and 0 < y < 3)
    }
    assert got == want


def test_bbox_to_feature_collection_roundtrip(spark, tmp_path):
    fc_text = GJ.bbox_to_feature_collection((25.13, 60.32, 25.63, 60.63), "Helsinki")
    p = tmp_path / "bbox.geojson"
    p.write_text(fc_text)
    rows = GJ.read_feature_collection(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.name == "Helsinki"
    assert (r.minx, r.miny, r.maxx, r.maxy) == (25.13, 60.32, 25.63, 60.63)
