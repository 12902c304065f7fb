"""Raster time-series operators: temporal compositing and phenology.

The reference computes one NDVI raster per scene and stops there
(src/transform/compute_ndvi.py:32-93); any cross-date analysis happens
outside the pipeline. Once pixels are tabular, the classic Landsat
time-series products are plain relational aggregates over a (period,
y, x) grid — SURVEY.md §2.9 flags exactly this family ("NDVI time
series … lag/rolling mean") as the natural engine extension.

Scale design: both operators are single hash-aggregates keyed by the
pixel grid — one shuffle each, with map-side partial aggregation, so
a 100 TB pixel table composites at scan speed. No windows, no joins,
no Python: the max/min/count partials combine associatively, which is
what lets Spark push them into the scan stage. A date-partitioned
store prunes the input to the composited period range before the
shuffle (F2 partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_composite(
    values: DataFrame,
    keys: tuple[str, ...],
    value_col: str = "ndvi",
    composite_col: str = "cv",
    n_col: str = "n_obs",
) -> DataFrame:
    """Greenest-pixel composite: per `keys` cell, the max of
    `value_col` over every observation that falls in the cell, plus
    the observation count.

    With keys=(year, y, x) this is the standard annual max-NDVI
    composite (cloud-robust because clouds depress NDVI, so the max
    favors clear observations). NULL values (masked pixels) are
    excluded before the aggregate — a cell with only masked
    observations drops out, matching the reference's masked-mean
    convention (load_to_postgis.py:74-79).
    """
    return (
        values.filter(F.col(value_col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.max(value_col).alias(composite_col),
            F.count("*").alias(n_col),
        )
    )


def first_crossing(
    values: DataFrame,
    pixel_keys: tuple[str, ...],
    order_col: str = "period",
    value_col: str = "ndvi",
    threshold: float = 0.2,
    out_col: str = "first_period",
) -> DataFrame:
    """Phenology greenup: per pixel, the earliest `order_col` whose
    value reaches `threshold`. Pixels that never cross drop out.

    min-over-a-filter is the cheapest possible formulation — one
    hash-aggregate after a sargable scan predicate (`value >=
    threshold` reaches parquet row-group stats), versus the
    window-function alternative (rank over period) which would sort
    every pixel's history.
    """
    return (
        values.filter(F.col(value_col) >= F.lit(float(threshold)))
        .groupBy(*pixel_keys)
        .agg(F.min(order_col).alias(out_col))
    )
