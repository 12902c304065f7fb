from .ndvi import (
    NODATA,
    clamp,
    ndvi,
    scale_reflectance,
    valid_dn_mask,
    with_nodata_sentinel,
)
from .scene import (
    exclude_sensors,
    parse_scene_id,
    scene_columns_from_filename,
)

__all__ = [
    "NODATA",
    "clamp",
    "ndvi",
    "scale_reflectance",
    "valid_dn_mask",
    "with_nodata_sentinel",
    "exclude_sensors",
    "parse_scene_id",
    "scene_columns_from_filename",
]
