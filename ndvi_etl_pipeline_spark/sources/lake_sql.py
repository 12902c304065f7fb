"""SQL surface for the manifest lake (sources/lake.py): registration
of lake tables as Spark SQL views with SNAPSHOT PINNING, a
`VERSION AS OF` time-travel idiom, and a `table_changes(...)`
change-feed table function — the textual interface Delta exposes as
`SELECT ... FROM t VERSION AS OF 3` / `table_changes('t', 0, 5)`,
built here as a thin, transparent rewrite in front of `spark.sql`
(Spark's parser has no extension hook for version-qualified relation
names from Python, so the pin resolves to a registered temp view
BEFORE parsing; everything else in the text is untouched ANSI SQL
that Catalyst plans normally).

Reference lineage: the reference exposes its results through plain
PostGIS SQL (src/load/load_to_postgis.py); this module closes the
same gap — a SQL-only consumer never touching the DataFrame API —
for the lake tier."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .lake import lake_read, lake_read_cdf

_IDENT = r"[A-Za-z_]\w*"


def _safe(name: str) -> None:
    if not re.match(rf"^{_IDENT}$", name):
        raise ValueError(f"bad lake view name {name!r}")


def lake_register(
    spark: SparkSession,
    name: str,
    path: str,
    version: int | None = None,
) -> DataFrame:
    """Register lake table `path` as temp view `name`, pinned at
    `version` (default: the latest snapshot AT REGISTRATION TIME —
    the view is a frozen file set, so concurrent writers never tear
    or shift a running query, exactly the reader guarantee lake_read
    gives the DataFrame API)."""
    _safe(name)
    df = lake_read(spark, path, version=version)
    df.createOrReplaceTempView(name)
    return df


def lake_table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
    view: str | None = None,
) -> DataFrame:
    """The row-level change feed (lake_read_cdf) as a DataFrame,
    optionally registered as a temp view — the TVF shape
    `table_changes('name', from, to)` resolves to inside lake_sql."""
    df = lake_read_cdf(spark, path, from_version, to_version)
    if view is not None:
        _safe(view)
        df.createOrReplaceTempView(view)
    return df


def lake_sql(
    spark: SparkSession, query: str, tables: dict[str, str]
) -> DataFrame:
    """Run ANSI SQL text over lake tables. `tables` maps relation
    names appearing in the text to lake table paths. Supported idioms
    on those names:

        SELECT ... FROM t                         latest snapshot
        SELECT ... FROM t VERSION AS OF 3         time travel
        SELECT ... FROM table_changes('t', 0)     CDF since v0
        SELECT ... FROM table_changes('t', 0, 5)  CDF (0, 5]

    Each distinct (name, version) pin registers one temp view named
    `<name>__v<N>` (change feeds: `<name>__changes_<f>_<t>`); the
    rewritten text — identical except those relation tokens — runs
    through spark.sql, so joins against non-lake views, CTEs, window
    functions, etc. all compose. Registration is manifest-scale work;
    no data is read until the returned DataFrame executes."""
    rewritten = query
    for name, path in tables.items():
        _safe(name)

        # table_changes('name', from[, to]) → pinned CDF view
        def _sub_changes(m: "re.Match[str]") -> str:
            f = int(m.group(1))
            t = m.group(2)
            to_v = int(t) if t is not None else None
            view = f"{name}__changes_{f}_{'latest' if to_v is None else to_v}"
            view = view.replace("-", "m")  # from_version=-1
            lake_table_changes(spark, path, f, to_v, view=view)
            return view

        rewritten = re.sub(
            rf"table_changes\(\s*'{name}'\s*,\s*(-?\d+)\s*(?:,\s*(\d+)\s*)?\)",
            _sub_changes,
            rewritten,
            flags=re.IGNORECASE,
        )

        # name VERSION AS OF n → pinned snapshot view
        def _sub_asof(m: "re.Match[str]") -> str:
            v = int(m.group(1))
            view = f"{name}__v{v}"
            lake_register(spark, view, path, version=v)
            return view

        rewritten = re.sub(
            rf"\b{name}\s+VERSION\s+AS\s+OF\s+(\d+)",
            _sub_asof,
            rewritten,
            flags=re.IGNORECASE,
        )

        # bare references → latest snapshot (registered once, pinned)
        if re.search(rf"\b{name}\b", rewritten):
            lake_register(spark, name, path)
    return spark.sql(rewritten)
