"""The NDVI pipeline as one lazy Spark DAG.

Reference lifecycle (main.py:118-139): a sequential per-scene loop —
compute_ndvi → clip → load, with a disk round-trip between every
stage. Here the whole thing is ONE declarative plan over the pixel
table; Catalyst fuses the stages, the per-scene loop becomes
partition parallelism, and nothing touches disk until the sink
(SURVEY.md §3.1 "Spark lifecycle equivalent").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ndvi import ndvi_from_dn
from ..functions.scene import exclude_sensors, scene_columns_from_filename
from ..operators.bands import pair_bands
from ..operators.stats import masked_mean


def ndvi_pixels(band_pixels: DataFrame, nodata_dn: float = 0.0) -> DataFrame:
    """band pixels (long) → per-pixel NDVI (NULL = nodata).

    scan → F4 sensor filter → J1 pivot-pairing → P1-P6 column math.
    """
    paired = pair_bands(exclude_sensors(band_pixels))
    return paired.select(
        "scene_id",
        "y",
        "x",
        ndvi_from_dn("red_dn", "nir_dn", nodata_dn).alias("ndvi"),
    )


def scene_stats(band_pixels: DataFrame) -> DataFrame:
    """The flagship query: mean NDVI per scene (masked), with parsed
    scene metadata — the reference's headline statistic
    (load_to_postgis.py:244-248) over every scene in one shot.
    """
    stats = masked_mean(ndvi_pixels(band_pixels), keys=("scene_id",))
    return scene_columns_from_filename(stats).select(
        "scene_id", "sensor", "acquisition_date", "mean_ndvi"
    )
