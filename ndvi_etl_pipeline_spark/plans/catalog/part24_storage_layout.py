"""Catalog part 24 — storage-layout kernels (round 5).

* **Morton (Z-order) interleave** (`zorder_interleave_topk`): the
  bit-interleave kernel behind `lake_compact(zorder_by=...)`
  (sources/lake.py:_zorder_key), value-checked against a DuckDB
  replica of the same bit arithmetic. The file-layout effect (tight
  per-file min/max on every z-ordered column) is asserted by
  tests/test_lake.py::test_lake_zorder_compact_prunes_both_dimensions;
  this query pins the KEY MATH cross-engine: locality means
  consecutive z-keys decode to nearby (x, y) cells, so bucketing the
  key space by its high bits groups spatially-near cells — the
  property that turns a range partitioner into a 2-D clusterer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._shared import _t, register

_ZBITS = 8  # 8 bits per dimension -> 16-bit morton key


def _interleave_sql() -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(((cx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((cy >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_interleave_topk",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(l_partkey % 256 AS BIGINT) AS cx,
             CAST(l_suppkey % 256 AS BIGINT) AS cy
      FROM lineitem),
    keys AS (
      SELECT cx, cy, CAST({_interleave_sql()} AS BIGINT) AS zkey
      FROM cells)
    SELECT CAST(zkey >> 8 AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n,
           min(zkey) AS zmin, max(zkey) AS zmax,
           min(cx) AS cx_min, max(cx) AS cx_max,
           min(cy) AS cy_min, max(cy) AS cy_max
    FROM keys
    GROUP BY 1
    ORDER BY n DESC, zbucket
    LIMIT 20
    """,
    tags=("layout", "lineitem"),
)
def q_zorder_interleave_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-interleave the (l_partkey, l_suppkey) cell grid and
    profile the 20 hottest 256-key z-buckets: row count plus the
    zkey/cx/cy bounds each bucket spans. The cx/cy ranges stay
    NARROW (≤16-wide) for every bucket even though the bucket is
    defined purely on the 1-D key — the locality guarantee
    lake_compact's z-order clustering relies on for multi-column
    file skipping. Same bit arithmetic as sources/lake.py:_zorder_key;
    one scan, one hash aggregate, TakeOrderedAndProject for the
    top-20 (no global sort)."""
    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).cast("bigint").alias("cx"),
        (F.col("l_suppkey") % 256).cast("bigint").alias("cy"),
    )
    key = F.lit(0).cast("bigint")
    for i in range(_ZBITS):
        key = key + F.shiftleft(
            F.shiftright(F.col("cx"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        key = key + F.shiftleft(
            F.shiftright(F.col("cy"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    keys = li.withColumn("zkey", key)
    return (
        keys.groupBy(F.shiftright(F.col("zkey"), 8).alias("zbucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("zkey").alias("zmin"),
            F.max("zkey").alias("zmax"),
            F.min("cx").alias("cx_min"),
            F.max("cx").alias("cx_max"),
            F.min("cy").alias("cy_min"),
            F.max("cy").alias("cy_max"),
        )
        .orderBy(F.desc("n"), F.asc("zbucket"))
        .limit(20)
    )


@register(
    "layout_clustering_skipping",
    oracle="""
    WITH layouts AS (
      SELECT 'clustered' AS layout,
             (year(l_shipdate) - 1992) * 4
               + (month(l_shipdate) - 1) // 3 AS f,
             l_shipdate
      FROM lineitem
      UNION ALL
      SELECT 'arrival',
             CAST(('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR)), 1, 8))::UBIGINT % 64
             AS BIGINT),
             l_shipdate
      FROM lineitem),
    stats AS (
      SELECT layout, f, min(l_shipdate) AS mn, max(l_shipdate) AS mx
      FROM layouts GROUP BY 1, 2)
    SELECT layout,
           CAST(count(*) AS BIGINT) AS total_files,
           CAST(sum(CASE WHEN mx >= DATE '1994-01-01'
                          AND mn <= DATE '1994-03-31'
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_hit
    FROM stats GROUP BY 1 ORDER BY 1
    """,
    tags=("layout", "lineitem"),
)
def q_layout_clustering_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping simulation: assign lineitem rows to simulated
    files two ways — CLUSTERED (calendar-quarter of shipdate, the
    layout a time-keyed sort/z-order compaction produces) and ARRIVAL
    (md5 hash of the insertion key mod 64, an unclustered table) —
    then count how many files' min/max shipdate range intersects a
    one-quarter predicate. The clustered layout is hit on ~1 file;
    the arrival layout on ALL of them — the measurable why behind
    lake_compact's clustering. Both bucketings are pure per-row
    expressions (engine-identical md5/quarter math, the catalog's
    conv-of-md5 idiom), so the whole plan is two scans + hash
    aggregates — no windows, nothing single-partition."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    clus = li.select(
        F.lit("clustered").alias("layout"),
        (
            (F.year("l_shipdate") - 1992) * 4
            + F.floor((F.month("l_shipdate") - 1) / 3)
        ).cast("bigint").alias("f"),
        "l_shipdate",
    )
    arr = li.select(
        F.lit("arrival").alias("layout"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(64),
        ).alias("f"),
        "l_shipdate",
    )
    stats = clus.unionAll(arr).groupBy("layout", "f").agg(
        F.min("l_shipdate").alias("mn"), F.max("l_shipdate").alias("mx")
    )
    return (
        stats.groupBy("layout")
        .agg(
            F.count("*").cast("bigint").alias("total_files"),
            F.sum(
                (
                    (F.col("mx") >= F.lit("1994-01-01").cast("date"))
                    & (F.col("mn") <= F.lit("1994-03-31").cast("date"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("files_hit"),
        )
        .orderBy("layout")
    )
