"""Overview pyramids (A6): downsampling as a hash-aggregate cascade.

Reference: compute_ndvi.py:146-157 builds GeoTIFF overviews at factors
[2, 4, 8, 16, 32] with average resampling. Relationally, each level is
`groupBy(scene, y//2, x//2).avg(v)` over the PREVIOUS level — so the
cascade shrinks 4× per step and total work is a geometric series
(~1.33× the base level). Chaining level-to-level instead of
recomputing each factor from the base level turns O(levels·n) into
O(n) — the difference between 5 full-table shuffles and a telescoping
sequence at 100 TB.

Average-of-averages over uniform 2×2 blocks equals the true average
when blocks are full; edge blocks weight partials slightly differently
than a direct factor-k mean — identical to how GDAL chains its own
overview levels, and deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def downsample(df: DataFrame, factor: int = 2, value_col: str = "v") -> DataFrame:
    """One pyramid step: average `value_col` over factor×factor blocks."""
    return (
        df.groupBy(
            "scene_id",
            F.floor(F.col("y") / factor).cast("int").alias("y"),
            F.floor(F.col("x") / factor).cast("int").alias("x"),
        )
        .agg(F.avg(value_col).alias("v"))
    )


def overview_cascade(
    pixels: DataFrame,
    factors: tuple[int, ...] = (2, 4, 8, 16, 32),
    value_col: str = "ndvi",
) -> dict[int, DataFrame]:
    """Levels keyed by absolute factor; each computed from the previous
    (factors must be successive doublings, like the reference's).
    Columns: scene_id, y, x (tile coords at that level), v.
    """
    out: dict[int, DataFrame] = {}
    prev = pixels.select("scene_id", "y", "x", F.col(value_col).alias("v"))
    prev_factor = 1
    for f in factors:
        step = f // prev_factor
        assert step * prev_factor == f, "factors must be multiples of the previous"
        level = downsample(prev, factor=step, value_col="v")
        out[f] = level
        prev, prev_factor = level, f
    return out
