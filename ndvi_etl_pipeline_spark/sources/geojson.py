"""GeoJSON vector source (SURVEY §2.1 S5, §2.5 A2).

Reference: `gpd.read_file(aoi_path)` + `unary_union`
(download_landsat_stac.py:72-84, compute_ndvi.py:108-121,
load_to_postgis.py:28-33) — read a FeatureCollection, default the CRS
to EPSG:4326, dissolve all features into one geometry for clipping.

Spark-first: `spark.read.json` parses the FeatureCollection (features
as ARRAY<STRUCT>), `explode` yields one row per feature, and polygon
coordinates flatten to the engine's ring representation
(ARRAY<DOUBLE> interleaved x,y — functions/geo.py). "Union" for
clipping purposes is even-odd membership across ALL rings
(`point_in_any_ring`): a point is inside the dissolved AOI iff it is
inside any feature — exactly what `unary_union` + contains computes,
without polygon boolean algebra.

MultiPolygons contribute one ring per outer shell; holes (interior
rings) are subtracted by the even-odd rule when passed as additional
rings of the same feature.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import Polygon, point_in_polygon_col, polygon_bbox


def read_feature_collection(spark: SparkSession, path: str) -> DataFrame:
    """FeatureCollection file → one row per feature:
    (feature_idx, name, geom_type, rings ARRAY<ARRAY<DOUBLE>>, bbox
    minx/miny/maxx/maxy). Pure `spark.read.json` + array exprs — the
    nested-JSON path stays in Catalyst; no geometry library."""
    raw = spark.read.option("multiLine", "true").json(path)
    feat = raw.select(F.posexplode("features").alias("feature_idx", "f"))

    # Polygon: coordinates = ring[point[xy]]; MultiPolygon: poly[ring[point[xy]]].
    # JSON inference fixes the nesting depth per FILE (a collection mixing
    # both would infer an unusable union type), so branch on the inferred
    # schema: depth 3 → Polygon rings as-is, depth 4 → flatten one level.
    def _depth(dt) -> int:
        d = 0
        while isinstance(dt, T.ArrayType):
            d += 1
            dt = dt.elementType
        return d

    coords_type = (
        feat.schema["f"].dataType["geometry"].dataType["coordinates"].dataType
    )
    depth = _depth(coords_type)
    coords = F.col("f.geometry.coordinates")
    if depth == 3:
        rings = coords
    elif depth == 4:
        rings = F.flatten(coords)
    else:
        raise ValueError(f"unsupported GeoJSON coordinate nesting depth {depth}")
    gtype = F.col("f.geometry.type")
    rings = F.transform(rings, lambda ring: F.flatten(ring))
    xs = F.filter(
        F.flatten(F.col("rings")),
        lambda v, i: i % 2 == 0,
    )
    ys = F.filter(
        F.flatten(F.col("rings")),
        lambda v, i: i % 2 == 1,
    )
    # `properties.name` exists only if SOME feature carries it — JSON
    # inference drops absent keys entirely, and selecting an
    # unresolvable struct field is an AnalysisException, not a NULL
    # (third-party AOI files routinely have {id: ...} or no
    # properties at all). Probe the inferred schema instead.
    f_type = feat.schema["f"].dataType
    has_name = (
        "properties" in f_type.fieldNames()
        and isinstance(f_type["properties"].dataType, T.StructType)
        and "name" in f_type["properties"].dataType.fieldNames()
    )
    name_col = (
        F.col("f.properties.name").cast("string")
        if has_name
        else F.lit(None).cast("string")
    )
    return (
        feat.select(
            "feature_idx",
            name_col.alias("name"),
            gtype.alias("geom_type"),
            rings.alias("rings"),
        )
        .withColumn("minx", F.array_min(xs))
        .withColumn("miny", F.array_min(ys))
        .withColumn("maxx", F.array_max(xs))
        .withColumn("maxy", F.array_max(ys))
    )


def collect_rings(features: DataFrame) -> list[Polygon]:
    """Driver-side materialization of all rings as vertex lists — the
    AOI is catalog-scale metadata (a few rows), the A2 'dissolve'
    collapse point. Returns [[(x, y), …], …]."""
    out: list[Polygon] = []
    for row in features.select("rings").collect():
        for ring in row.rings:
            pts = list(zip(ring[0::2], ring[1::2]))
            if len(pts) >= 2 and pts[0] == pts[-1]:
                pts = pts[:-1]  # GeoJSON closes rings explicitly; ours are open
            out.append(pts)
    return out


def point_in_any_ring(x: Column | str, y: Column | str, rings: list[Polygon]) -> Column:
    """A2 union semantics for clipping: inside the dissolved geometry
    iff inside ≥1 ring (disjoint features) — OR of unrolled ray
    casts, still pure codegen."""
    pred = F.lit(False)
    for ring in rings:
        pred = pred | point_in_polygon_col(x, y, ring)
    return pred


def union_clip_filter(
    df: DataFrame, x_col: str, y_col: str, rings: list[Polygon]
) -> DataFrame:
    """J2 against a multi-feature AOI: combined bbox prefilter
    (sargable) + union membership."""
    boxes = [polygon_bbox(r) for r in rings]
    minx = min(b[0] for b in boxes)
    miny = min(b[1] for b in boxes)
    maxx = max(b[2] for b in boxes)
    maxy = max(b[3] for b in boxes)
    return df.filter(
        F.col(x_col).between(minx, maxx) & F.col(y_col).between(miny, maxy)
    ).filter(point_in_any_ring(x_col, y_col, rings))


def bbox_to_feature_collection(
    bbox: tuple[float, float, float, float], name: str = "AOI"
) -> str:
    """The reference's bbox→GeoJSON materialization (main.py:68-91)."""
    minx, miny, maxx, maxy = bbox
    ring = [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    return json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "properties": {"name": name},
                    "geometry": {"type": "Polygon", "coordinates": [ring]},
                }
            ],
        }
    )
