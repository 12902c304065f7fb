from .bands import pair_bands, validate_grids
from .stats import masked_mean, run_summary
from .timeseries import first_crossing, temporal_composite

__all__ = [
    "pair_bands",
    "validate_grids",
    "masked_mean",
    "run_summary",
    "first_crossing",
    "temporal_composite",
]
