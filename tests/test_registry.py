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


def test_every_plan_builds(spark, sf_dir):
    """Build EVERY registered plan (schema resolution without
    execution — cheap) so a refactor that breaks any builder fails in
    CI instead of surfacing only in the external sweep. Iterative
    builders (operators/iterate.py users) run bounded build-time jobs
    at sf0.001; everything else stays lazy."""
    failures = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.builder(spark, sf_dir)
            assert len(df.schema.fields) > 0
        except Exception as e:  # noqa: BLE001 — collect all, report once
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures[:20]) + f"\n({len(failures)} total)"
