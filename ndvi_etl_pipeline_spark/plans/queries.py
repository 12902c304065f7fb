"""The engine's query catalog — facade over plans/catalog/.

Historically a single module; now split into per-part modules under
plans/catalog/ (capped ~4.2k lines each) with registration order
preserved. Importing this module (or the catalog package) registers
every SURVEY.md §2 operator class as a named, oracle-checked query.

Each entry pairs a DataFrame-API builder (the Spark-first
implementation, exercising the package's operators) with an ANSI-SQL
oracle DuckDB runs over the same parquet tables. Column names and
types are aligned on both sides (every computed column aliased
identically; sums of ints cast to BIGINT; floats rounded at a fixed
precision — via canon_round/canon_round_sql where a rounded value can
land on zero from below, since round(-1e-9, 6) is -0.0 in DuckDB but
+0.0 in Spark and the driver's value-hash sees the sign).

Naming: q_<area>_<operator> with SURVEY §2 ids in the docstrings.
"""

from __future__ import annotations

# importing the parts registers every query; star-exports keep the
# public surface (REGISTRY, queries, oracle_sql, q_* builders, shared
# helpers like derived_pixels/pair_bands) importable from this module
# exactly as before the split.
from .catalog._shared import *  # noqa: F401,F403
from .catalog._shared import (  # noqa: F401 — underscore names tests/tools use
    _ndvi_pixels_df,
    _t,
)
from .catalog.part01_pricing_summary import *  # noqa: F401,F403
from .catalog.part02_revenue_share import *  # noqa: F401,F403
from .catalog.part03_tpch_q4_priority_c import *  # noqa: F401,F403
from .catalog.part04_k_anonymity_audit import *  # noqa: F401,F403
from .catalog.part05_bloom_filter_fpr import *  # noqa: F401,F403
from .catalog.part06_energy_distance_tw import *  # noqa: F401,F403
from .catalog.part07_split_conformal_in import *  # noqa: F401,F403
from .catalog.part08_partial_pooling_es import *  # noqa: F401,F403
from .catalog.part09_scaling_law_fit import *  # noqa: F401,F403
from .catalog.part10_data_selection import *  # noqa: F401,F403
from .catalog.part11_gopher_rules import *  # noqa: F401,F403
from .catalog.part12_recsys_trees import *  # noqa: F401,F403
from .catalog.part13_ml_training import *  # noqa: F401,F403
from .catalog.part14_entity_resolution import *  # noqa: F401,F403
from .catalog.part15_cv_quantreg import *  # noqa: F401,F403
from .catalog.part16_semistructured import *  # noqa: F401,F403
from .catalog.part17_feature_eval import *  # noqa: F401,F403
from .catalog.part18_quality_contracts import *  # noqa: F401,F403
from .catalog.part19_hits_seqmine import *  # noqa: F401,F403
from .catalog.part20_recsys_eval import *  # noqa: F401,F403
from .catalog.part21_retrieval_eval import *  # noqa: F401,F403
from .catalog.part22_graph_quality import *  # noqa: F401,F403
