"""Band pairing (J1) and grid-compatibility validation (P7).

The reference pairs B4/B5 per scene with an implicit inner join
(download_landsat_stac.py:148-151: scenes missing either band are
skipped) and asserts both bands share (width, height, transform)
(compute_ndvi.py:39-40).

Spark-first design: band pixels live in ONE long table
(scene_id, band, y, x, dn). Pairing is a groupBy-pivot — a single
shuffle on (scene_id, y, x) — rather than a self-join, which would
shuffle the table twice. At 100 TB the pivot halves shuffle volume
vs. `red.join(nir)`; both produce the same hash-partitioned layout
keyed by pixel for everything downstream (clip, masked mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_bands(
    pixels: DataFrame,
    red: str = "red",
    nir: str = "nir",
    value_col: str = "dn",
    keys: tuple[str, ...] = ("scene_id", "y", "x"),
) -> DataFrame:
    """J1: long (keys..., band, dn) → wide (keys..., red_dn, nir_dn).

    Inner-join semantics: pixels where either band is absent drop out,
    matching the reference's skip of incomplete scenes
    (download_landsat_stac.py:150-151). Implemented as a single
    hash-aggregate (max over a 2-way pivot) — one shuffle, map-side
    partial aggregation, no join. `keys` defaults to the per-scene
    grid; time-series callers pair per (period, y, x) instead.
    """
    return (
        pixels.filter(F.col("band").isin(red, nir))
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("band") == red, F.col(value_col))).alias("red_dn"),
            F.max(F.when(F.col("band") == nir, F.col(value_col))).alias("nir_dn"),
        )
        .filter(F.col("red_dn").isNotNull() & F.col("nir_dn").isNotNull())
    )


def validate_grids(scene_bands: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P7: split scenes into (compatible, rejected) by grid agreement.

    A scene is compatible iff all its bands share (height, width,
    transform, crs) — compute_ndvi.py:39-40 raises on mismatch; we
    route the scene to a quarantine DataFrame instead (E1 semantics:
    per-scene failure isolation via status columns, main.py:118-139).
    """
    # NULL metadata (a failed header parse) must count as its own
    # distinct grid, not vanish: countDistinct SKIPS null tuples, so an
    # unsentineled scene with one NULL-metadata band would pass as
    # compatible unexamined, and an all-NULL scene (n_grids = 0) would
    # match neither filter and silently disappear from both outputs.
    g = F.struct(
        F.coalesce(F.col("height").cast("string"), F.lit("\x00null")),
        F.coalesce(F.col("width").cast("string"), F.lit("\x00null")),
        F.coalesce(F.col("crs"), F.lit("\x00null")),
    )
    t = F.coalesce(
        F.col("transform").cast("array<string>").cast("string"), F.lit("\x00null")
    )
    has_null = (
        F.col("height").isNull() | F.col("width").isNull() | F.col("crs").isNull()
        | F.col("transform").isNull()
    )
    grids = scene_bands.groupBy("scene_id").agg(
        F.countDistinct(g).alias("n_grids"),
        F.countDistinct(t).alias("n_transforms"),
        F.max(has_null.cast("int")).alias("any_null"),
    )
    ok = grids.filter(
        (F.col("n_grids") == 1) & (F.col("n_transforms") == 1) & (F.col("any_null") == 0)
    ).select("scene_id")
    bad = grids.filter(
        (F.col("n_grids") > 1) | (F.col("n_transforms") > 1) | (F.col("any_null") == 1)
    ).select(
        "scene_id",
        F.when(F.col("any_null") == 1, F.lit("null_grid_metadata"))
        .otherwise(F.lit("grid_mismatch"))
        .alias("error"),
    )
    return ok, bad
