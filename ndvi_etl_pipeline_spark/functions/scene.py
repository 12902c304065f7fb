"""Scene-identifier parsing and catalog-level filters.

Reference semantics: src/load/load_to_postgis.py:178-183 (filename →
scene_id / acquisition_date / sensor) and
src/extract/download_landsat_stac.py:143-145 (LE07 exclusion).
All native string/date functions — sargable, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Landsat-7 SLC-off exclusion, download_landsat_stac.py:143-145
DEFAULT_EXCLUDED_SENSOR_PREFIXES = ("LE07",)


def parse_scene_id(scene_id: Column | str) -> dict[str, Column]:
    """Split `LC08_L2SP_187018_20220606_02_T1`-style ids into columns.

    load_to_postgis.py:178-183: parts[0] = sensor, parts[3] = yyyyMMdd
    acquisition date. Unparseable ids yield NULL date (the reference
    skips those files — filter on isNotNull downstream, F7).
    """
    sid = F.col(scene_id) if isinstance(scene_id, str) else scene_id
    parts = F.split(sid, "_")
    return {
        "sensor": F.element_at(parts, 1),
        "acquisition_date": F.to_date(F.element_at(parts, 4), "yyyyMMdd"),
    }


def scene_columns_from_filename(df: DataFrame, col: str = "scene_id") -> DataFrame:
    """F9: project sensor + acquisition_date out of the scene id."""
    parsed = parse_scene_id(col)
    return df.withColumns(parsed)


def exclude_sensors(
    df: DataFrame,
    col: str = "scene_id",
    prefixes: tuple[str, ...] = DEFAULT_EXCLUDED_SENSOR_PREFIXES,
) -> DataFrame:
    """F4: drop scenes whose id starts with an excluded sensor prefix."""
    cond = F.lit(True)
    for p in prefixes:
        cond = cond & ~F.col(col).startswith(p)
    return df.filter(cond)
