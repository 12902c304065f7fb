from .bands import pair_bands, validate_grids
from .curation import expect
from .stats import masked_mean, pareto_skyline_2d, run_summary
from .timeseries import first_crossing, temporal_composite

__all__ = [
    "pair_bands",
    "validate_grids",
    "expect",
    "masked_mean",
    "pareto_skyline_2d",
    "run_summary",
    "first_crossing",
    "temporal_composite",
]
