"""Catalog registry integrity.

The driver contract (__spark_entry__.py) exposes the whole REGISTRY;
these tests pin the invariants the correctness gate relies on:
unique names, oracle coverage, aligned docstrings, and buildable
plans for a sample of the newest query families.
"""

import re

from ndvi_etl_pipeline_spark.plans.queries import REGISTRY, oracle_sql, queries

# The single intentionally rows-only query (approximate sketches
# differ across engines, so no value-hash oracle exists for it).
# Round 2: empty — every registered query now carries a DuckDB oracle
# (approx_distinct_stats gained a tolerance-band oracle: exact values +
# in-plan accuracy booleans).
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle_except_rows_only():
    q = queries()
    o = oracle_sql()
    missing = set(q) - set(o)
    assert missing == ROWS_ONLY


def test_names_are_wellformed():
    for name in REGISTRY:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_oracles_are_single_statements():
    # The driver runs each oracle as one DuckDB statement; a stray
    # semicolon would truncate it silently.
    for name, sql in oracle_sql().items():
        assert ";" not in sql, f"{name} oracle contains a semicolon"
        assert sql.strip().upper().startswith(("WITH", "SELECT")), name


def test_builders_have_docstrings():
    for name, spec in REGISTRY.items():
        assert spec.builder.__doc__, f"{name} builder missing docstring"


def test_headline_queries_registered():
    from ndvi_etl_pipeline_spark.plans.queries import headline_queries

    hl = headline_queries()
    assert len(hl) >= 5
    assert set(hl) <= set(REGISTRY)


def test_new_family_plans_build(spark, sf_dir):
    # One representative per family added late in round 1 — plan
    # analysis (schema resolution) without execution.
    sample = [
        "kruskal_wallis_h",
        "shapley_attribution",
        "poisson_bootstrap_ci",
        "lof_outliers",
        "count_min_sketch",
        "regression_discontinuity",
        "energy_distance_two_sample",
        "f1_micro_macro",
    ]
    for name in sample:
        df = REGISTRY[name].builder(spark, sf_dir)
        assert len(df.schema.fields) > 0, name
