from .bands import pair_bands, validate_grids
from .curation import expect
from .focal import focal_map_tiled, focal_mean_3x3, sobel_magnitude
from .stats import masked_mean, pareto_skyline_2d, run_summary
from .timeseries import first_crossing, temporal_composite

__all__ = [
    "pair_bands",
    "validate_grids",
    "expect",
    "focal_map_tiled",
    "focal_mean_3x3",
    "sobel_magnitude",
    "masked_mean",
    "pareto_skyline_2d",
    "run_summary",
    "first_crossing",
    "temporal_composite",
]
