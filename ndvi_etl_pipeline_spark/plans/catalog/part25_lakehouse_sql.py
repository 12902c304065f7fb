"""Catalog part 25 — the lakehouse SQL surface, oracle-checked.

Every member here drives the REAL lake machinery end-to-end inside
the driver's correctness gate: a lake table is built (in a fresh temp
dir) FROM the scale-factor parquet, mutated through the transactional
operations (cow/dv delete, merge, rename, widen), and then queried
through the TEXTUAL interface (sources/lake_sql.py: `VERSION AS OF`,
`table_changes(...)`, pinned views) — while the DuckDB oracle
recomputes the same result relationally from the raw tables. So a
hash match certifies the whole stack: manifest log + checkpoint
reconstruction, snapshot isolation, deletion vectors, merge
semantics, column mapping, type widening, and the SQL rewrite.

Reference lineage: the reference's consumers are SQL-first (PostGIS
views over loaded rasters, src/load/load_to_postgis.py:357-397);
this part proves a SQL-only consumer can use the lake tier the same
way."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ...sources.lake import (
    lake_delete,
    lake_merge,
    lake_rename_column,
    lake_write,
)
from ...sources.lake_sql import lake_sql
from ._shared import _t, register


def _tmp(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"lake25_{tag}_")


@register(
    "lake_sql_time_travel",
    oracle="""
        SELECT 'v0' AS snap, n_regionkey AS region,
               count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM nation GROUP BY n_regionkey
        UNION ALL
        SELECT 'latest', n_regionkey, count(*), CAST(sum(n_nationkey) AS BIGINT)
        FROM nation WHERE n_regionkey <> 0 GROUP BY n_regionkey
    """,
    tags=("lakehouse", "sql", "time-travel"),
)
def q_lake_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`VERSION AS OF` through the SQL text interface: v0 is the full
    nation table, v1 a copy-on-write DELETE of region 0; one statement
    reads BOTH snapshots (the pinned-view rewrite) and the pre-delete
    rows must still be there at v0 — snapshot isolation, in SQL."""
    t = _tmp("tt")
    lake_write(_t(spark, sf_dir, "nation"), t)
    lake_delete(spark, t, F.col("n_regionkey") == 0)
    return lake_sql(
        spark,
        """
        SELECT 'v0' AS snap, n_regionkey AS region,
               count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        FROM nat VERSION AS OF 0 GROUP BY n_regionkey
        UNION ALL
        SELECT 'latest', n_regionkey, count(*), CAST(sum(n_nationkey) AS BIGINT)
        FROM nat GROUP BY n_regionkey
        """,
        {"nat": t},
    )


@register(
    "lake_sql_table_changes",
    oracle="""
        SELECT 'insert' AS change, o_orderpriority AS pri,
               count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderkey % 4 = 2
        GROUP BY o_orderpriority
    """,
    tags=("lakehouse", "sql", "cdf"),
)
def q_lake_sql_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`table_changes('t', 0, 1)` through SQL: v0 holds two order
    slices, v1 appends a third; the change feed over (0, 1] must
    contain exactly the appended slice, tagged insert — the manifest
    diff read, never the table."""
    t = _tmp("cdf")
    o = _t(spark, sf_dir, "orders")
    lake_write(o.filter(F.col("o_orderkey") % 4 < 2), t)
    lake_write(o.filter(F.col("o_orderkey") % 4 == 2), t)
    return lake_sql(
        spark,
        """
        SELECT _change_type AS change, o_orderpriority AS pri,
               count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        FROM table_changes('ord', 0, 1)
        GROUP BY _change_type, o_orderpriority
        """,
        {"ord": t},
    )


@register(
    "lake_sql_dv_read",
    oracle="""
        SELECT c_mktsegment AS seg, count(*) AS n,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM customer WHERE NOT (c_acctbal < 0) OR c_acctbal IS NULL
        GROUP BY c_mktsegment
    """,
    tags=("lakehouse", "sql", "deletion-vectors"),
)
def q_lake_sql_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read visibility through SQL: negative-balance
    customers dv-deleted (no file rewritten — the deleted addresses
    live in a deletion-vector set, anti-joined on read); the latest
    snapshot seen by a SQL consumer must equal the relational
    filter."""
    t = _tmp("dv")
    lake_write(_t(spark, sf_dir, "customer"), t)
    lake_delete(spark, t, F.col("c_acctbal") < 0, strategy="dv")
    return lake_sql(
        spark,
        """
        SELECT c_mktsegment AS seg, count(*) AS n,
               CAST(sum(c_custkey) AS BIGINT) AS key_sum
        FROM cust GROUP BY c_mktsegment
        """,
        {"cust": t},
    )


@register(
    "lake_sql_merge_upsert",
    oracle="""
        WITH base AS (
            SELECT * FROM orders WHERE o_orderkey % 3 = 0
        ), upd AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice * 2 AS o_totalprice, o_orderdate,
                   o_orderpriority
            FROM orders WHERE o_orderkey % 6 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 3 = 1
        ), merged AS (
            SELECT * FROM upd
            UNION ALL
            SELECT * FROM base
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        )
        SELECT o_orderstatus AS status, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM merged GROUP BY o_orderstatus
    """,
    tags=("lakehouse", "sql", "merge"),
)
def q_lake_sql_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert by key) then a SQL read: matched orders replaced
    by doubled-price updates, unmatched updates inserted, untouched
    base rows carried over — one atomic snapshot, equal to the
    relational anti-join + union the oracle spells out."""
    t = _tmp("merge")
    o = _t(spark, sf_dir, "orders")
    lake_write(o.filter(F.col("o_orderkey") % 3 == 0), t)
    upd = o.filter(F.col("o_orderkey") % 6 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    ).unionByName(o.filter(F.col("o_orderkey") % 3 == 1))
    lake_merge(spark, upd, t, ("o_orderkey",))
    return lake_sql(
        spark,
        """
        SELECT o_orderstatus AS status, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM ord GROUP BY o_orderstatus
        """,
        {"ord": t},
    )


@register(
    "lake_sql_evolution",
    oracle="""
        WITH evolved AS (
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                   n_name AS nation_name, n_regionkey
            FROM nation
            UNION ALL
            SELECT CAST(n_nationkey AS BIGINT) + 3000000000,
                   upper(n_name), n_regionkey
            FROM nation WHERE n_regionkey = 1
        )
        SELECT n_regionkey AS region, count(*) AS n,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
               max(nation_name) AS max_name
        FROM evolved GROUP BY n_regionkey
    """,
    tags=("lakehouse", "sql", "schema-evolution"),
)
def q_lake_sql_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME + TYPE WIDENING, then a SQL read: n_name renames to
    nation_name (metadata-only — id mapping, zero rewrites), then an
    append with BIGINT keys widens n_nationkey int→long (old files
    upcast inside the parquet reader); the SQL consumer sees one
    coherent evolved schema."""
    t = _tmp("evo")
    n = _t(spark, sf_dir, "nation")
    lake_write(n, t)
    lake_rename_column(t, "n_name", "nation_name")
    widened = (
        n.filter(F.col("n_regionkey") == 1)
        .select(
            (F.col("n_nationkey").cast("long") + F.lit(3000000000)).alias(
                "n_nationkey"
            ),
            F.upper(F.col("n_name")).alias("nation_name"),
            "n_regionkey",
        )
    )
    lake_write(widened, t)
    return lake_sql(
        spark,
        """
        SELECT n_regionkey AS region, count(*) AS n,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
               max(nation_name) AS max_name
        FROM nat GROUP BY n_regionkey
        """,
        {"nat": t},
    )


@register(
    "lake_sql_cdf_merge",
    oracle="""
        SELECT 'insert' AS change, count(*) AS n,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
               max(lower(n_name)) AS max_name
        FROM nation WHERE n_regionkey = 2
        UNION ALL
        SELECT 'delete', count(*), CAST(sum(n_nationkey) AS BIGINT),
               max(n_name)
        FROM nation WHERE n_regionkey = 2
    """,
    tags=("lakehouse", "sql", "cdf", "merge"),
)
def q_lake_sql_cdf_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The row-level change feed ACROSS a MERGE, through SQL: merging
    lowercased region-2 nations emits delete(old row) + insert(new
    row) pairs — the retract/re-derive contract a CDC consumer needs —
    recovered from the merge keys and update files the manifest
    records, reading only delta files."""
    t = _tmp("cdfm")
    n = _t(spark, sf_dir, "nation")
    lake_write(n, t)
    upd = n.filter(F.col("n_regionkey") == 2).withColumn(
        "n_name", F.lower(F.col("n_name"))
    )
    lake_merge(spark, upd, t, ("n_nationkey",))
    return lake_sql(
        spark,
        """
        SELECT _change_type AS change, count(*) AS n,
               CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
               max(n_name) AS max_name
        FROM table_changes('nat', 0) GROUP BY _change_type
        """,
        {"nat": t},
    )
