from .bands import pair_bands, validate_grids
from .stats import masked_mean, run_summary

__all__ = ["pair_bands", "validate_grids", "masked_mean", "run_summary"]
