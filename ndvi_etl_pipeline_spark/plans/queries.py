"""The engine's query catalog: every SURVEY.md §2 operator class as a
named, oracle-checked query.

Each entry pairs a DataFrame-API builder (the Spark-first
implementation, exercising the package's operators) with an ANSI-SQL
oracle DuckDB runs over the same parquet tables. Column names and
types are aligned on both sides (every computed column aliased
identically; sums of ints cast to BIGINT; floats rounded at a fixed
precision so cross-engine accumulation-order differences cannot leak
into the compared values).

Naming: q_<area>_<operator> with SURVEY §2 ids in the docstrings.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..operators import curation as CUR
from ..operators import dedup as DD
from ..operators import similarity as SIM
from ..operators.bands import pair_bands
from ..sources.testdata import load_table


@dataclass(frozen=True)
class QuerySpec:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver falls back to rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}

# The scrub pattern as it appears inside a single-quoted DuckDB string
# literal (standard strings: backslashes pass through to RE2 verbatim,
# matching Java-regex semantics for \b and {m,} quantifiers).
CUR_SCRUB_PATTERN_SQL = CUR.SCRUB_PATTERN


def register(name: str, oracle: str | None, headline: bool = False, tags: tuple[str, ...] = ()):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QuerySpec(fn, oracle, headline, tags)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ===========================================================================
# A. Relational core on the TPC-H-style tables (SURVEY §2.2-§2.8)
# ===========================================================================


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags=("agg", "filter"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → F2 date filter → 8-way hash aggregate.

    The partial/final aggregate pair means shuffle traffic is one row
    per (flag, status) per task regardless of input size.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "filter_pushdown_scan",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      AND o_totalprice <= 150000.0
    GROUP BY o_orderpriority
    """,
    tags=("filter",),
)
def q_filter_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2: threshold + temporal-range predicates, pushed to parquet."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderdate").cast("date").between("1996-01-01", "1997-12-31")
            & (F.col("o_totalprice") <= 150000.0)
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "prefix_exclusion",
    oracle="""
    SELECT p_type, count(*) AS n_parts, CAST(sum(p_size) AS BIGINT) AS total_size
    FROM part
    WHERE NOT starts_with(p_brand, 'Brand#1') AND contains(p_name, 'bolt')
    GROUP BY p_type
    """,
    tags=("filter", "string"),
)
def q_prefix_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (prefix exclusion, the LE07 idiom) + F7 (substring contains)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(~F.col("p_brand").startswith("Brand#1") & F.col("p_name").contains("bolt"))
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("p_size").cast("bigint").alias("total_size"),
        )
    )


@register(
    "parse_projection",
    oracle="""
    SELECT CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
           string_split(o_orderpriority, '-')[2] AS prio_name,
           count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("string", "projection"),
)
def q_parse_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: split-and-project, the filename-parsing idiom
    (load_to_postgis.py:178-183) applied to priority codes."""
    o = _t(spark, sf_dir, "orders")
    parts = F.split(F.col("o_orderpriority"), "-")
    return (
        o.select(
            F.element_at(parts, 1).cast("int").alias("prio_num"),
            F.element_at(parts, 2).alias("prio_name"),
        )
        .groupBy("prio_num", "prio_name")
        .agg(F.count("*").alias("n"))
    )


@register(
    "join_chain_revenue",
    oracle="""
    SELECT n.n_name, r.r_name,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    headline=True,
    tags=("join", "agg"),
)
def q_join_chain_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J4/J5 equi-join chain. nation/region are broadcast (fixed-size
    dims — no shuffle of the fact table for them); customer⋈orders⋈
    lineitem shuffle on their keys, AQE re-plans from runtime sizes.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "upsert_ignore_antijoin",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
    """,
    tags=("join",),
)
def q_upsert_ignore_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: the 'ON CONFLICT DO NOTHING' idiom — left anti join.

    (Suppliers with no lineitems = rows that WOULD be inserted.)
    """
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_anti").select("s_suppkey", "s_name")


@register(
    "semi_join_exists",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_mktsegment
    """,
    tags=("join",),
)
def q_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — J4's 'parent must exist' precheck."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "last_write_wins",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date, o_totalprice
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
      ) AS rn
      FROM orders
    ) WHERE rn = 1 AND o_custkey <= 200
    """,
    tags=("window", "upsert"),
)
def q_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: 'ON CONFLICT DO UPDATE' as last-write-wins dedup — one row
    per key by (date, key) recency. The upsert idiom for an
    append-only parquet store (SURVEY §4.2 item 4)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("o_custkey") <= 200))
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
            "o_totalprice",
        )
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1/L3/A7: global top-k = TakeOrderedAndProject (no full sort —
    each task keeps a k-heap, driver merges k·tasks rows)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT l_returnflag, CAST(rk AS INT) AS rk, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
             ) AS rk
      FROM lineitem
    ) WHERE rk <= 3
    """,
    tags=("window",),
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via ranking window (§2.9 extension surface)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_returnflag", "rk", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "set_ops_nations",
    oracle="""
    SELECT 'customers_only' AS tag, n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'both' AS tag, n_nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    """,
    tags=("setop",),
)
def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7: EXCEPT / INTERSECT / UNION ALL in one result."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    only_c = c.distinct().subtract(s.distinct()).select(
        F.lit("customers_only").alias("tag"), "n_nationkey"
    )
    both = c.distinct().intersect(s.distinct()).select(F.lit("both").alias("tag"), "n_nationkey")
    return only_c.unionAll(both)


@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (§2.5 noted extension): ROLLUP."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column DISTINCT aggregation (expand + two-phase agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "utm_zone_math",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 360) - 180 + 0.5 AS lon,
             ((c_custkey * 7) % 180) - 90 + 0.5 AS lat
      FROM customer
    )
    SELECT CAST(CASE WHEN lat >= 0 THEN 32600 ELSE 32700 END
                + CAST(floor((lon + 180) / 6) AS BIGINT) + 1 AS BIGINT) AS epsg,
           count(*) AS n_points,
           round(avg(10.0 / (111.32 * cos(radians(lat)))), 6) AS avg_pad_deg
    FROM pts
    GROUP BY 1
    """,
    tags=("math",),
)
def q_utm_zone_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (UTM zone selection, load_to_postgis.py:18-38) + P8 (km→deg
    bbox padding, download_landsat_stac.py:44-51) as column math."""
    c = _t(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") % 360 - 180 + F.lit(0.5)).alias("lon")
    lat = ((F.col("c_custkey") * 7) % 180 - 90 + F.lit(0.5)).alias("lat")
    pts = c.select("c_custkey", lon, lat)
    zone = F.floor((F.col("lon") + 180) / 6).cast("bigint") + 1
    epsg = (
        F.when(F.col("lat") >= 0, F.lit(32600)).otherwise(F.lit(32700)).cast("bigint") + zone
    ).alias("epsg")
    pad = 10.0 / (111.32 * F.cos(F.radians(F.col("lat"))))
    return pts.select(epsg, "lat", pad.alias("pad")).groupBy("epsg").agg(
        F.count("*").alias("n_points"), F.round(F.avg("pad"), 6).alias("avg_pad_deg")
    )


@register(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(substr(p_name, 1, 4)) AS prefix4,
           CAST(length(p_name) AS INT) AS name_len,
           CAST(nullif(regexp_extract(p_brand, 'Brand#(\\d+)', 1), '') AS INT) AS brand_num,
           concat_ws('|', p_type, p_brand) AS type_brand,
           replace(p_name, ' ', '_') AS name_snake
    FROM part
    WHERE p_partkey <= 100
    """,
    tags=("string",),
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string family: lower/upper/substr/length/regexp/concat_ws."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") <= 100).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper(F.substring("p_name", 1, 4)).alias("prefix4"),
        F.length("p_name").cast("int").alias("name_len"),
        F.nullif(F.regexp_extract("p_brand", r"Brand#(\d+)", 1), F.lit("")).cast("int").alias(
            "brand_num"
        ),
        F.concat_ws("|", "p_type", "p_brand").alias("type_brand"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           count(*) AS n_orders,
           CAST(min(day(o_orderdate)) AS INT) AS first_day,
           CAST(floor(avg(datediff('day', CAST(o_orderdate AS DATE), DATE '2001-12-31')))
                AS BIGINT) AS avg_age_days
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("date",),
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date family: year/month/day extraction, datediff, grouping
    by calendar buckets (F2's partition-pruning access path)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.dayofmonth("o_orderdate")).cast("int").alias("first_day"),
            F.floor(
                F.avg(
                    F.datediff(
                        F.lit("2001-12-31").cast("date"), F.col("o_orderdate").cast("date")
                    )
                )
            )
            .cast("bigint")
            .alias("avg_age_days"),
        )
    )


@register(
    "masked_mean_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(CASE WHEN value > 50.0 THEN 1 END) AS n_valid,
           round(avg(CASE WHEN value > 50.0 THEN value END), 4) AS mean_valid
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "null"),
)
def q_masked_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+A1 on a generic table: sentinel→NULL masking then masked
    mean — exactly the NDVI masked-mean shape, with avg skipping NULLs."""
    e = _t(spark, sf_dir, "events")
    masked = F.when(F.col("value") > 50.0, F.col("value"))
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(masked).alias("n_valid"),
        F.round(F.avg(masked), 4).alias("mean_valid"),
    )


@register(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("pivot",),
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy + conditional aggregation (single shuffle)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


# ===========================================================================
# B. Reference-shaped NDVI tier over a lineitem-derived pixel grid
#    (same operators as plans/pipeline.py, but oracle-checkable in SQL)
# ===========================================================================

# Deterministic pixel grid derived from lineitem: 3 scenes, 100×100
# grid, band from the linenumber parity, DN with planted fill zeros.
_PIXELS_SQL = """
      SELECT concat('LC08_L2SP_', lpad(CAST(187018 + (l_suppkey % 3) AS VARCHAR), 6, '0'),
                    '_20220606_02_T1') AS scene_id,
             CASE WHEN l_linenumber % 2 = 0 THEN 'red' ELSE 'nir' END AS band,
             CAST(l_orderkey % 100 AS INT) AS y,
             CAST(l_partkey % 100 AS INT) AS x,
             CAST(CASE WHEN (l_orderkey + l_partkey) % 37 = 0 THEN 0
                  ELSE (CAST(floor(l_quantity * 100) AS BIGINT) + l_partkey) % 65535 + 1
             END AS INT) AS dn
      FROM lineitem
"""

_NDVI_SQL = """
    WITH px AS ({pixels}),
    paired AS (
      SELECT scene_id, y, x,
             max(CASE WHEN band = 'red' THEN dn END) AS red_dn,
             max(CASE WHEN band = 'nir' THEN dn END) AS nir_dn
      FROM px GROUP BY scene_id, y, x
    ),
    nv AS (
      SELECT scene_id, y, x,
             CASE WHEN red_dn = 0 OR nir_dn = 0 THEN NULL
                  ELSE greatest(-1.0, least(1.0,
                       ((nir_dn * 0.0000275 - 0.2) - (red_dn * 0.0000275 - 0.2))
                     / ((nir_dn * 0.0000275 - 0.2) + (red_dn * 0.0000275 - 0.2) + 0.000001)))
             END AS ndvi
      FROM paired
      WHERE red_dn IS NOT NULL AND nir_dn IS NOT NULL
    )
""".format(pixels=_PIXELS_SQL)


def derived_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _PIXELS_SQL (bit-identical integer math)."""
    li = _t(spark, sf_dir, "lineitem")
    scene = F.concat(
        F.lit("LC08_L2SP_"),
        F.lpad((F.lit(187018) + F.col("l_suppkey") % 3).cast("string"), 6, "0"),
        F.lit("_20220606_02_T1"),
    ).alias("scene_id")
    band = F.when(F.col("l_linenumber") % 2 == 0, F.lit("red")).otherwise(F.lit("nir")).alias(
        "band"
    )
    dn = (
        F.when((F.col("l_orderkey") + F.col("l_partkey")) % 37 == 0, F.lit(0))
        .otherwise(
            (F.floor(F.col("l_quantity") * 100).cast("bigint") + F.col("l_partkey")) % 65535 + 1
        )
        .cast("int")
        .alias("dn")
    )
    return li.select(
        scene,
        band,
        (F.col("l_orderkey") % 100).cast("int").alias("y"),
        (F.col("l_partkey") % 100).cast("int").alias("x"),
        dn,
    )


def _ndvi_pixels_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.ndvi import ndvi_from_dn

    paired = pair_bands(derived_pixels(spark, sf_dir))
    return paired.select(
        "scene_id", "y", "x", ndvi_from_dn("red_dn", "nir_dn", nodata_dn=0.0).alias("ndvi")
    )


@register(
    "ndvi_scene_stats",
    oracle=_NDVI_SQL
    + """
    SELECT scene_id, count(*) AS n_pixels, count(ndvi) AS n_valid,
           round(avg(ndvi), 6) AS mean_ndvi
    FROM nv GROUP BY scene_id
    """,
    headline=True,
    tags=("ndvi", "agg", "join"),
)
def q_ndvi_scene_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: P1-P6 band math + J1 pairing + A1 masked mean on a
    pixel grid derived from lineitem (so DuckDB can replay it)."""
    nv = _ndvi_pixels_df(spark, sf_dir)
    return nv.groupBy("scene_id").agg(
        F.count("*").alias("n_pixels"),
        F.count("ndvi").alias("n_valid"),
        F.round(F.avg("ndvi"), 6).alias("mean_ndvi"),
    )


@register(
    "ndvi_tiled_stats",
    oracle=_NDVI_SQL
    + """
    SELECT scene_id, count(*) AS n_pixels, count(ndvi) AS n_valid,
           round(avg(ndvi), 6) AS mean_ndvi
    FROM nv GROUP BY scene_id
    """,
    tags=("ndvi", "raster", "agg"),
)
def q_ndvi_tiled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME statistic as ndvi_scene_stats, computed through the
    tile codec: pixels → dense 32×32 float32 tiles → vectorized numpy
    NDVI kernel with per-tile partial aggregates → tiny final groupBy
    (operators/raster.py). Shares ndvi_scene_stats' oracle — the two
    physical paths must agree bit-for-bit at round(6)."""
    from ..operators.raster import pixels_to_tiles, tile_ndvi, tile_scene_stats

    px = (
        derived_pixels(spark, sf_dir)
        .groupBy("scene_id", "band", "y", "x")
        .agg(F.max("dn").alias("dn"))
    )
    return tile_scene_stats(tile_ndvi(pixels_to_tiles(px, tile=32)))


@register(
    "ndvi_bbox_clip",
    oracle=_NDVI_SQL
    + """
    SELECT scene_id, count(*) AS n_pixels, round(avg(ndvi), 6) AS mean_ndvi
    FROM nv
    WHERE x BETWEEN 20 AND 59 AND y BETWEEN 30 AND 69
    GROUP BY scene_id
    """,
    tags=("ndvi", "spatial"),
)
def q_ndvi_bbox_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2's sargable core: the AOI clip as a bbox range predicate
    (the prefilter our st_* wrappers emit; FIXTURES.md §4 rectangle)."""
    nv = _ndvi_pixels_df(spark, sf_dir)
    return (
        nv.filter(F.col("x").between(20, 59) & F.col("y").between(30, 69))
        .groupBy("scene_id")
        .agg(F.count("*").alias("n_pixels"), F.round(F.avg("ndvi"), 6).alias("mean_ndvi"))
    )


@register(
    "ndvi_overviews",
    oracle=_NDVI_SQL
    + """
    , l2 AS (
      SELECT scene_id,
             CAST(floor(y / 2) AS INT) AS ty, CAST(floor(x / 2) AS INT) AS tx,
             avg(ndvi) AS v
      FROM nv WHERE ndvi IS NOT NULL GROUP BY 1, 2, 3
    ),
    l4 AS (
      SELECT scene_id,
             CAST(floor(ty / 2) AS INT) AS ty, CAST(floor(tx / 2) AS INT) AS tx,
             avg(v) AS v
      FROM l2 GROUP BY 1, 2, 3
    )
    SELECT 2 AS level, scene_id, count(*) AS n_tiles, round(avg(v), 6) AS mean_v FROM l2 GROUP BY scene_id
    UNION ALL
    SELECT 4 AS level, scene_id, count(*) AS n_tiles, round(avg(v), 6) AS mean_v FROM l4 GROUP BY scene_id
    """,
    tags=("ndvi", "agg"),
)
def q_ndvi_overviews(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: the overview pyramid as a hash-agg cascade — each level ¼
    the rows of the last (compute_ndvi.py:146-157). Level summaries
    keep the compared result small while checking every tile."""
    from ..operators.overviews import overview_cascade

    nv = _ndvi_pixels_df(spark, sf_dir).filter(F.col("ndvi").isNotNull())
    levels = overview_cascade(nv, factors=(2, 4), value_col="ndvi")
    out = None
    for lvl, df in levels.items():
        s = df.groupBy("scene_id").agg(
            F.count("*").alias("n_tiles"), F.round(F.avg("v"), 6).alias("mean_v")
        ).select(F.lit(lvl).alias("level"), "scene_id", "n_tiles", "mean_v")
        out = s if out is None else out.unionAll(s)
    return out


@register(
    "ndvi_tile_composite",
    oracle=_NDVI_SQL
    + """
    , comp AS (
      SELECT y, x, max(ndvi) AS v
      FROM nv WHERE ndvi IS NOT NULL
      GROUP BY y, x)
    SELECT CAST(count(*) AS BIGINT) AS n_pixels, round(avg(v), 6) AS mean_v
    FROM comp
    """,
    tags=("ndvi", "raster", "agg"),
)
def q_ndvi_tile_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenest-pixel mosaic through the TILE codec: per-position
    elementwise fmax across the 3 derived scenes
    (operators/raster.py::tile_composite — the kernel the streaming
    product stream_scene_composite maintains incrementally), unpacked
    and summarized. Must equal the pixel-relational max-per-(y,x)
    oracle exactly."""
    from ..operators.raster import (
        pixels_to_tiles,
        tile_composite,
        tile_ndvi,
        tiles_to_pixels,
    )

    px = (
        derived_pixels(spark, sf_dir)
        .groupBy("scene_id", "band", "y", "x")
        .agg(F.max("dn").alias("dn"))
    )
    comp = tile_composite(tile_ndvi(pixels_to_tiles(px, tile=32)))
    v = tiles_to_pixels(comp, "v")
    return v.agg(
        F.count("*").cast("bigint").alias("n_pixels"),
        F.round(F.avg("v"), 6).alias("mean_v"),
    )


# --- NDVI time series over a (period, y, x) grid -------------------------
# Multi-date pixels derived from lineitem: period = yyyymm of l_shipdate,
# a coarse 20×20 grid so every period keeps paired-band density at small
# scale factors. Pairing runs per (period, y, x) ACROSS the scene
# dimension — mosaic-then-composite, the standard Landsat analysis-ready
# data layout.

_TS_NDVI_SQL = """
    WITH px AS (
      SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT) AS period,
             CASE WHEN l_linenumber % 2 = 0 THEN 'red' ELSE 'nir' END AS band,
             CAST(l_orderkey % 20 AS INT) AS y,
             CAST(l_partkey % 20 AS INT) AS x,
             CAST(CASE WHEN (l_orderkey + l_partkey) % 37 = 0 THEN 0
                  ELSE (CAST(floor(l_quantity * 100) AS BIGINT) + l_partkey + l_orderkey) % 65535 + 1
             END AS INT) AS dn
      FROM lineitem
    ),
    paired AS (
      SELECT period, y, x,
             max(CASE WHEN band = 'red' THEN dn END) AS red_dn,
             max(CASE WHEN band = 'nir' THEN dn END) AS nir_dn
      FROM px GROUP BY period, y, x
    ),
    nv AS (
      SELECT period, y, x,
             CASE WHEN red_dn = 0 OR nir_dn = 0 THEN NULL
                  ELSE greatest(-1.0, least(1.0,
                       ((nir_dn * 0.0000275 - 0.2) - (red_dn * 0.0000275 - 0.2))
                     / ((nir_dn * 0.0000275 - 0.2) + (red_dn * 0.0000275 - 0.2) + 0.000001)))
             END AS ndvi,
             red_dn * 0.0000275 - 0.2 AS red_sr,
             nir_dn * 0.0000275 - 0.2 AS nir_sr
      FROM paired
      WHERE red_dn IS NOT NULL AND nir_dn IS NOT NULL
    )
"""


def derived_ts_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of _TS_NDVI_SQL's px CTE (bit-identical math)."""
    li = _t(spark, sf_dir, "lineitem")
    period = (
        (F.year("l_shipdate") * F.lit(100) + F.month("l_shipdate"))
        .cast("int")
        .alias("period")
    )
    band = (
        F.when(F.col("l_linenumber") % 2 == 0, F.lit("red"))
        .otherwise(F.lit("nir"))
        .alias("band")
    )
    dn = (
        F.when((F.col("l_orderkey") + F.col("l_partkey")) % 37 == 0, F.lit(0))
        .otherwise(
            (
                F.floor(F.col("l_quantity") * 100).cast("bigint")
                + F.col("l_partkey")
                + F.col("l_orderkey")
            )
            % 65535
            + 1
        )
        .cast("int")
        .alias("dn")
    )
    return li.select(
        period,
        band,
        (F.col("l_orderkey") % 20).cast("int").alias("y"),
        (F.col("l_partkey") % 20).cast("int").alias("x"),
        dn,
    )


def _ts_ndvi_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired multi-date NDVI grid with raw reflectances alongside."""
    from ..functions.ndvi import ndvi_from_dn, scale_reflectance
    from ..operators.bands import pair_bands

    paired = pair_bands(derived_ts_pixels(spark, sf_dir), keys=("period", "y", "x"))
    return paired.select(
        "period",
        "y",
        "x",
        ndvi_from_dn("red_dn", "nir_dn", nodata_dn=0.0).alias("ndvi"),
        scale_reflectance("red_dn").alias("red_sr"),
        scale_reflectance("nir_dn").alias("nir_sr"),
    )


@register(
    "ndvi_annual_composite",
    oracle=_TS_NDVI_SQL
    + """
    , comp AS (
      SELECT CAST(floor(period / 100.0) AS INT) AS yr, y, x,
             max(ndvi) AS cv, count(*) AS n_obs
      FROM nv WHERE ndvi IS NOT NULL GROUP BY 1, 2, 3
    )
    SELECT yr, count(*) AS n_pixels,
           round(avg(cv), 6) AS mean_composite,
           round(avg(CAST(n_obs AS DOUBLE)), 2) AS mean_obs
    FROM comp GROUP BY yr
    """,
    tags=("ndvi", "timeseries", "agg"),
)
def q_ndvi_annual_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual greenest-pixel composite (max NDVI per pixel per year) —
    the classic cloud-robust Landsat product, one hash-agg cascade
    (operators/timeseries.py). Per-year summary keeps the compared
    result small while every composite cell feeds the average."""
    from ..operators.timeseries import temporal_composite

    nv = _ts_ndvi_df(spark, sf_dir).withColumn(
        "yr", F.floor(F.col("period") / F.lit(100.0)).cast("int")
    )
    comp = temporal_composite(nv, keys=("yr", "y", "x"))
    return comp.groupBy("yr").agg(
        F.count("*").alias("n_pixels"),
        F.round(F.avg("cv"), 6).alias("mean_composite"),
        F.round(F.avg(F.col("n_obs").cast("double")), 2).alias("mean_obs"),
    )


@register(
    "ndvi_multi_index",
    oracle=_TS_NDVI_SQL
    + """
    SELECT period, count(*) AS n_pixels,
           round(avg(ndvi), 6) AS mean_ndvi,
           round(avg(2.5 * (nir_sr - red_sr) / (nir_sr + 2.4 * red_sr + 1.0)), 6) AS mean_evi2,
           round(avg(1.5 * (nir_sr - red_sr) / (nir_sr + red_sr + 0.5)), 6) AS mean_savi
    FROM nv WHERE ndvi IS NOT NULL
    GROUP BY period
    """,
    tags=("ndvi", "timeseries", "agg"),
)
def q_ndvi_multi_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three vegetation indices (NDVI, EVI2, SAVI) in ONE fused pass
    over the paired grid — multi-expression aggregate, single shuffle,
    all Catalyst codegen (functions/ndvi.py evi2/savi). The reference
    would run three separate raster passes for this."""
    from ..functions.ndvi import evi2, savi

    nv = _ts_ndvi_df(spark, sf_dir).filter(F.col("ndvi").isNotNull())
    return nv.groupBy("period").agg(
        F.count("*").alias("n_pixels"),
        F.round(F.avg("ndvi"), 6).alias("mean_ndvi"),
        F.round(F.avg(evi2("red_sr", "nir_sr")), 6).alias("mean_evi2"),
        F.round(F.avg(savi("red_sr", "nir_sr")), 6).alias("mean_savi"),
    )


@register(
    "ndvi_greenup_period",
    oracle=_TS_NDVI_SQL
    + """
    , g AS (
      SELECT y, x, min(period) AS first_period
      FROM nv WHERE ndvi >= 0.2
      GROUP BY y, x
    )
    SELECT first_period, count(*) AS n_pixels
    FROM g GROUP BY first_period
    """,
    tags=("ndvi", "timeseries", "agg"),
)
def q_ndvi_greenup_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phenology greenup: the first period each pixel's NDVI reaches
    0.2, histogrammed by period (operators/timeseries.py
    first_crossing — min-over-filter, no window sort)."""
    from ..operators.timeseries import first_crossing

    nv = _ts_ndvi_df(spark, sf_dir)
    g = first_crossing(nv, pixel_keys=("y", "x"), threshold=0.2)
    return g.groupBy("first_period").agg(F.count("*").alias("n_pixels"))


@register(
    "ndvi_anomaly_zscore",
    oracle=_TS_NDVI_SQL
    + """
    , v AS (SELECT period, y, x, ndvi FROM nv WHERE ndvi IS NOT NULL),
    clim AS (
      SELECT y, x, avg(ndvi) AS mu, stddev_samp(ndvi) AS sigma, count(*) AS n
      FROM v GROUP BY y, x),
    z AS (
      SELECT v.period, (v.ndvi - c.mu) / c.sigma AS z
      FROM v JOIN clim c ON c.y = v.y AND c.x = v.x
      WHERE c.n >= 2 AND c.sigma > 0)
    SELECT period, count(*) AS n_obs,
           round(avg(z), 6) AS mean_z,
           CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM z GROUP BY period
    """,
    tags=("ndvi", "timeseries", "agg", "join"),
)
def q_ndvi_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection against per-pixel climatology: z-score each
    observation vs its pixel's long-term mean/std, report per-period
    mean anomaly and |z|>2 outlier counts. Climatology is a hash-agg
    keyed by pixel; the join back is on the same key, so with a
    pixel-partitioned store both sides co-locate and the join is
    shuffle-free (the groupBy output reuses the scan's partitioning).
    A window-function formulation would sort every pixel history;
    agg+join only hashes."""
    v = _ts_ndvi_df(spark, sf_dir).filter(F.col("ndvi").isNotNull()).select(
        "period", "y", "x", "ndvi"
    )
    clim = v.groupBy("y", "x").agg(
        F.avg("ndvi").alias("mu"),
        F.stddev_samp("ndvi").alias("sigma"),
        F.count("*").alias("n"),
    )
    z = (
        v.join(clim, ["y", "x"])
        .filter((F.col("n") >= 2) & (F.col("sigma") > 0))
        .select("period", ((F.col("ndvi") - F.col("mu")) / F.col("sigma")).alias("z"))
    )
    return z.groupBy("period").agg(
        F.count("*").alias("n_obs"),
        F.round(F.avg("z"), 6).alias("mean_z"),
        F.sum(F.when(F.abs("z") > 2, 1).otherwise(0)).alias("n_outliers"),
    )


@register(
    "ndvi_trend",
    oracle=_TS_NDVI_SQL
    + """
    , v AS (
      SELECT y, x, ndvi,
             CAST(floor(period / 100.0) * 12 + period % 100 AS DOUBLE) AS t
      FROM nv WHERE ndvi IS NOT NULL),
    tr AS (
      SELECT y, x, regr_slope(ndvi, t) AS slope, count(*) AS n
      FROM v GROUP BY y, x)
    SELECT CASE WHEN slope > 0.0005 THEN 'greening'
                WHEN slope < -0.0005 THEN 'browning'
                ELSE 'stable' END AS trend_class,
           count(*) AS n_pixels
    FROM tr WHERE n >= 12 AND slope IS NOT NULL
    GROUP BY 1
    """,
    tags=("ndvi", "timeseries", "agg"),
)
def q_ndvi_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greening/browning trend per pixel: least-squares slope of NDVI
    against month index via the SQL-standard regr_slope aggregate —
    one hash-agg keyed by pixel, associative partials, no window sort
    (same scale shape as the climatology in ndvi_anomaly_zscore).
    Pixels are classified by slope sign at a ±5e-4/month threshold;
    the compared result is the 3-row class histogram, which is robust
    to last-ulp float divergence between engines."""
    v = (
        _ts_ndvi_df(spark, sf_dir)
        .filter(F.col("ndvi").isNotNull())
        .select(
            "y",
            "x",
            "ndvi",
            (
                F.floor(F.col("period") / F.lit(100.0)) * 12 + F.col("period") % 100
            )
            .cast("double")
            .alias("t"),
        )
    )
    tr = v.groupBy("y", "x").agg(
        F.regr_slope("ndvi", "t").alias("slope"), F.count("*").alias("n")
    )
    trend_class = (
        F.when(F.col("slope") > 0.0005, F.lit("greening"))
        .when(F.col("slope") < -0.0005, F.lit("browning"))
        .otherwise(F.lit("stable"))
    )
    return (
        tr.filter((F.col("n") >= 12) & F.col("slope").isNotNull())
        .groupBy(trend_class.alias("trend_class"))
        .agg(F.count("*").alias("n_pixels"))
    )


@register(
    "warp_bilinear",
    oracle=_NDVI_SQL
    + """
    , dst AS (
      SELECT s.scene_id, i AS y, j AS x,
             (i + 0.5) * 2.5 - 0.5 AS sy, (j + 0.5) * 2.5 - 0.5 AS sx
      FROM (SELECT DISTINCT scene_id FROM nv) s
      CROSS JOIN (SELECT unnest(generate_series(0, 39)) AS i)
      CROSS JOIN (SELECT unnest(generate_series(0, 39)) AS j)
    ),
    c AS (
      SELECT scene_id, y, x,
             CAST(floor(sy) AS INT) AS y0, CAST(floor(sx) AS INT) AS x0,
             sy - floor(sy) AS wy, sx - floor(sx) AS wx
      FROM dst
    )
    SELECT c.scene_id, c.y, c.x,
           round(v00.ndvi * (1 - c.wy) * (1 - c.wx)
               + v01.ndvi * (1 - c.wy) * c.wx
               + v10.ndvi * c.wy * (1 - c.wx)
               + v11.ndvi * c.wy * c.wx, 6) AS v
    FROM c
    JOIN nv v00 ON v00.scene_id = c.scene_id AND v00.y = c.y0     AND v00.x = c.x0
    JOIN nv v01 ON v01.scene_id = c.scene_id AND v01.y = c.y0     AND v01.x = c.x0 + 1
    JOIN nv v10 ON v10.scene_id = c.scene_id AND v10.y = c.y0 + 1 AND v10.x = c.x0
    JOIN nv v11 ON v11.scene_id = c.scene_id AND v11.y = c.y0 + 1 AND v11.x = c.x0 + 1
    WHERE v00.ndvi IS NOT NULL AND v01.ndvi IS NOT NULL
      AND v10.ndvi IS NOT NULL AND v11.ndvi IS NOT NULL
    """,
    tags=("ndvi", "raster", "warp"),
)
def q_warp_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear resample of the 100×100 NDVI grid onto 40×40 (scale
    2.5, pixel-center convention) — the reference's reprojection
    kernel (compute_ndvi.py:162-179) as a per-scene applyInPandas
    warp (operators/warp.py). The oracle replays the identical
    arithmetic as 4-neighbor joins, so interpolation weights, the
    all-4-valid mask, and FP association must all line up."""
    from ..operators.warp import resample_scene_pixels

    nv = _ndvi_pixels_df(spark, sf_dir)
    out = resample_scene_pixels(
        nv, out_height=40, out_width=40, scale_y=2.5, scale_x=2.5,
        value_col="ndvi", src_height=100, src_width=100,
    )
    return out.select("scene_id", "y", "x", F.round("v", 6).alias("v"))


@register(
    "band_pairing_counts",
    oracle="""
    WITH px AS ({pixels})
    SELECT scene_id, band, count(*) AS n_rows,
           count(DISTINCT (y, x)) AS n_cells
    FROM px GROUP BY scene_id, band
    """.format(pixels=_PIXELS_SQL),
    tags=("ndvi",),
)
def q_band_pairing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 input audit: rows and distinct grid cells per (scene, band)."""
    px = derived_pixels(spark, sf_dir)
    return px.groupBy("scene_id", "band").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("y", "x").alias("n_cells"),
    )


# ===========================================================================
# C. Training-data operators: dedup / text analysis (documents table)
# ===========================================================================


@register(
    "dedup_exact_stats",
    oracle="""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_exact_dups
    FROM documents GROUP BY source
    """,
    tags=("dedup",),
)
def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup audit per source: hash-distinct vs raw counts."""
    d = _t(spark, sf_dir, "documents")
    h = TXT.exact_fingerprint("text")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(h).alias("n_unique"),
        (F.count("*") - F.countDistinct(h)).alias("n_exact_dups"),
    )


@register(
    "dedup_fingerprint",
    oracle="""
    SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                   '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id, count(*) AS n_docs
    FROM documents
    GROUP BY 1 HAVING count(*) > 1
    """,
    tags=("dedup",),
)
def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-fingerprint dup groups (casefold + strip punct +
    collapse whitespace → md5): catches reformat-only duplicates."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(TXT.normalized_fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


_MINHASH_ORACLE = """
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
    ),
    shl AS (
      SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w) - 2, 0)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM tok WHERE len(w) >= 3
    ),
    sh AS (SELECT doc_id, md5(unnest(shingles)) AS d FROM shl),
    mh AS (
      SELECT doc_id,
             min(substr(d,  1, 4)) AS h0, min(substr(d,  5, 4)) AS h1,
             min(substr(d,  9, 4)) AS h2, min(substr(d, 13, 4)) AS h3,
             min(substr(d, 17, 4)) AS h4, min(substr(d, 21, 4)) AS h5,
             min(substr(d, 25, 4)) AS h6, min(substr(d, 29, 4)) AS h7
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, unnest([md5(h0 || h1), md5(h2 || h3), md5(h4 || h5), md5(h6 || h7)]) AS band
      FROM mh
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM cand c
    JOIN shl sa ON sa.doc_id = c.doc_a
    JOIN shl sb ON sb.doc_id = c.doc_b
    WHERE round(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
                / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) >= 0.8
"""


@register(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    headline=True,
    tags=("dedup",),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs (3-word shingles, 8 hashes, 4 bands,
    verify at jaccard ≥ 0.8) — operators/dedup.py end to end."""
    d = _t(spark, sf_dir, "documents")
    return DD.minhash_near_duplicates(d, threshold=0.8)


@register(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    th AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(token), 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(token), 4, 1)) - 1) AS hbits
      FROM tok
    ),
    bitsums AS (
      SELECT doc_id, pos,
             sum(CASE WHEN (hbits // CAST(pow(2, pos) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      FROM th, (SELECT unnest(generate_series(0, 15)) AS pos)
      GROUP BY doc_id, pos
    ),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END) AS BIGINT)
               AS simhash
      FROM bitsums GROUP BY doc_id
    )
    SELECT simhash, min(doc_id) AS keep_id, count(*) AS n_docs
    FROM fp GROUP BY simhash HAVING count(*) > 1
    """,
    tags=("dedup",),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit) bucket groups — operators/dedup.py simhash."""
    d = _t(spark, sf_dir, "documents")
    return DD.simhash_groups(d)


@register(
    "dedup_winnowing",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             list_transform(generate_series(1, greatest(length(t) - 7, 0)),
                            i -> substr(md5(substr(t, i, 8)), 1, 8)) AS hashes
      FROM norm
    ),
    fps AS (
      SELECT doc_id, unnest(list_distinct(
               list_transform(generate_series(1, greatest(len(hashes) - 3, 0)),
                              j -> list_min(hashes[j:j+3])))) AS fp
      FROM grams
    )
    SELECT fp, min(doc_id) AS keep_id, count(*) AS n_docs
    FROM fps GROUP BY fp HAVING count(*) > 1
    """,
    tags=("dedup", "text"),
)
def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling k-gram hash + window-min selection, the MOSS
    scheme): fingerprints shared by >1 doc — catches partial overlap
    (any common substring ≥ 11 chars), which whole-doc hashing cannot
    (functions/text.py winnowing_fingerprints; k=8, w=4).

    The fingerprint projection costs O(chars) md5s per row — ~100×
    any other per-row kernel here — so the scan's natural split (ONE
    task for a single small file) serializes it. The explicit
    repartition spreads rows across every core BEFORE the expensive
    projection: a cheap narrow shuffle buying full parallelism
    (measured 550 s → 30 s at sf0.01 on local[32]). At real scale
    file splits provide partitions, but keying them to compute cost
    rather than bytes is still the right call for kernels this hot."""
    d = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        d.select("doc_id", F.explode(TXT.winnowing_fingerprints("text", k=8, w=4)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "approx_distinct_stats",
    oracle=None,  # HLL sketches differ across engines — rows-only check;
    # the unit test asserts ≤5% relative error vs the exact count.
    tags=("agg", "approx"),
)
def q_approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate tier for 100 TB interactive profiling:
    approx_count_distinct (HLL++) and approx_percentile (t-digest
    family) — sketches merge associatively, so partials combine
    map-side exactly like sums."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.count("*").alias("n"),
    )


@register(
    "text_quality",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
             AS total_tokens,
           round(avg(len(string_split_regex(lower(trim(text)), '\\s+'))), 4) AS avg_tokens,
           round(avg((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
                     / greatest(length(text), 1)), 6) AS avg_punct_ratio,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY source
    """,
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-quality profile per source: token counts + punct ratio."""
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(TXT.tokens("text"))
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("total_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.round(F.avg(TXT.punct_ratio("text")), 6).alias("avg_punct_ratio"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "lang_id_confusion",
    oracle="""
    WITH scored AS (
      SELECT lang,
             [
               {{'neg': -len(list_filter(w, t -> list_contains(['der','die','das','und','nicht','ist'], t))), 'lang': 'de'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['the','and','of','to','is','a'], t))), 'lang': 'en'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['el','la','de','que','y','es'], t))), 'lang': 'es'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['le','la','les','et','est','que'], t))), 'lang': 'fr'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['de','shi','le','bu','wo','zai'], t))), 'lang': 'zh'}}
             ] AS pairs
      FROM (SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents)
    )
    SELECT lang, list_sort(pairs)[1]['lang'] AS pred_lang, count(*) AS n
    FROM scored GROUP BY lang, pred_lang
    """.replace("{{", "{").replace("}}", "}"),
    tags=("text",),
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID vs the labeled lang: confusion counts."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", TXT.predict_lang("text").alias("pred_lang")).agg(
        F.count("*").alias("n")
    )


@register(
    "token_counting",
    oracle="""
    SELECT lang,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(list_filter(string_split_regex(text, '[\\s[:punct:]]+'), x -> x != '')))
             AS BIGINT) AS bpe_ish_tokens
    FROM documents GROUP BY lang
    """,
    tags=("text",),
)
def q_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace + punctuation-aware."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(F.size(TXT.tokens("text", lowercase=False))).cast("bigint").alias("ws_tokens"),
        F.sum(F.size(TXT.bpe_ish_tokens("text"))).cast("bigint").alias("bpe_ish_tokens"),
    )


@register(
    "multimodal_byte_stats",
    oracle="""
    SELECT source,
           count(*) AS n_payloads,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           count(DISTINCT md5(text)) AS n_distinct
    FROM documents GROUP BY source
    """,
    tags=("multimodal", "binary"),
)
def q_multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, oracle-checked: payloads as BinaryType
    (utf-8 encoded doc text standing in for media bytes), with
    byte-length and content-hash aggregates — the metadata/dedup ops a
    multimodal lake runs without ever decoding payloads
    (operators/multimodal.py owns the decode kernels)."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.groupBy("source").agg(
        F.count("*").alias("n_payloads"),
        F.sum(F.octet_length(payload)).cast("bigint").alias("total_bytes"),
        F.max(F.octet_length(payload)).cast("bigint").alias("max_bytes"),
        F.countDistinct(F.md5(payload)).alias("n_distinct"),
    )


# ===========================================================================
# D. Similarity search over embeddings
# ===========================================================================

_COSINE_SQL = """
      list_sum(list_transform(generate_series(1, 64),
               i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(generate_series(1, 64),
               i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
       * sqrt(list_sum(list_transform(generate_series(1, 64),
               i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
"""


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             round({_COSINE_SQL}, 6) AS cosine_sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id >= 5
    )
    SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    headline=True,
    tags=("similarity",),
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 5 query vectors: broadcast queries, one
    corpus scan, windowed top-k (operators/similarity.py)."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.brute_force_topk(
        e.filter(F.col("vec_id") >= 5), e.filter(F.col("vec_id") < 5), k=5
    )


@register(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST(list_sum(list_transform(generate_series(1, 8),
                  i -> CASE WHEN embedding[i] >= 0 THEN CAST(pow(2, i - 1) AS BIGINT)
                            ELSE 0 END)) AS BIGINT) AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
             round({_COSINE_SQL}, 6) AS cosine_sim
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < 5 AND b.vec_id >= 5
    )
    SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path: sign-LSH bucketing (8 fixed hyperplanes) then
    top-k within the query's bucket only — candidate volume n/2^8."""
    e = _t(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id", "embedding", SIM.sign_lsh_bucket("embedding", 8).alias("bucket")
    )
    q = b.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"), "bucket"
    )
    c = b.filter(F.col("vec_id") >= 5)
    sim = F.round(SIM.cosine("q_vec", "embedding"), 6).alias("cosine_sim")
    scored = c.join(F.broadcast(q), "bucket").select("query_id", "vec_id", sim)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


@register(
    "embedding_neardup",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             CAST(list_sum(list_transform(generate_series(1, 8),
                  i -> CASE WHEN embedding[i] >= 0 THEN CAST(pow(2, i - 1) AS BIGINT)
                            ELSE 0 END)) AS BIGINT) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_COSINE_SQL}, 6) AS cosine_sim
    FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round({_COSINE_SQL}, 6) >= 0.3
    """,
    tags=("similarity", "dedup"),
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within sign-LSH buckets."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.lsh_near_duplicate_pairs(e, threshold=0.3, n_bits=8)


_L2_SQL = """
      list_sum(list_transform(generate_series(1, 64),
               i -> (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                  * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)))
"""


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS centroid_id, embedding AS cvec
      FROM embeddings WHERE vec_id BETWEEN 5 AND 12
    ),
    assign AS (
      SELECT e.vec_id, c.centroid_id,
             row_number() OVER (
               PARTITION BY e.vec_id ORDER BY {_L2_SQL} ASC, c.centroid_id ASC
             ) AS rn
      FROM embeddings e CROSS JOIN cent c
    ),
    lists AS (
      SELECT a.vec_id, a.centroid_id FROM assign a
      WHERE a.rn = 1 AND a.vec_id >= 5
    ),
    probes AS (
      SELECT a.vec_id AS query_id, a.centroid_id FROM assign a
      WHERE a.rn <= 2 AND a.vec_id < 5
    ),
    scored AS (
      SELECT p.query_id, l.vec_id,
             round({_COSINE_SQL}, 6) AS cosine_sim
      FROM probes p
      JOIN lists l ON l.centroid_id = p.centroid_id
      JOIN embeddings a ON a.vec_id = p.query_id
      JOIN embeddings b ON b.vec_id = l.vec_id
    )
    SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cosine_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    tags=("similarity",),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: inverted lists under 8 deterministic centroids
    (corpus rows 5-12), queries probe their 2 nearest cells —
    candidate volume ~nprobe/k of the corpus, shuffle keyed on the
    bounded centroid id (operators/similarity.py ivf_topk)."""
    e = _t(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(
        corpus=e.filter(F.col("vec_id") >= 5),
        queries=e.filter(F.col("vec_id") < 5),
        centroids=e.filter(F.col("vec_id").between(5, 12)),
        k=5,
        nprobe=2,
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    shl AS (
      SELECT doc_id, source, lang, list_distinct(list_transform(
          generate_series(1, greatest(len(w) - 2, 0)),
          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
      FROM tok WHERE len(w) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
    FROM shl a
    JOIN shl b ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.5
    """,
    tags=("dedup",),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard within (source, lang) blocking buckets —
    the blocked-exact tier of the dedup family: no sketch, bucket
    keys bound the pair explosion (vs. MinHash's probabilistic
    buckets). One shuffle on the block key."""
    d = _t(spark, sf_dir, "documents")
    sh = DD.shingle_docs(d).join(d.select("doc_id", "source", "lang"), "doc_id")
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "source", "lang", F.col("shingles").alias("sh_a")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "source", "lang", F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        a.join(b, ["source", "lang"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ===========================================================================
# E. Events: time-series / streaming-equivalent / as-of
# ===========================================================================


@register(
    "events_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    headline=True,
    tags=("events", "streaming"),
)
def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation — the batch twin of the
    streaming/events.py watermarked query (identical semantics)."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))


@register(
    "events_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM s GROUP BY user_id
    """,
    tags=("events", "window"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap): lag + running sum of session starts
    — the stateful-streaming shape expressed as batch windows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > 1800 * 1000 * 1000), 1).otherwise(0)
    sess = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS INT)) AS BIGINT)
             AS sum_k,
           round(avg(CAST(nullif(regexp_extract(props, '"k": (\\d+)', 1), '') AS INT)), 4)
             AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("events", "json"),
)
def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: extract props.k (the STAC-properties
    idiom, SURVEY §1.1) via regexp — engine-portable JSON access."""
    e = _t(spark, sf_dir, "events")
    k = F.nullif(F.regexp_extract("props", r'"k": (\d+)', 1), F.lit("")).cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count("*").alias("n"),
    )


@register(
    "events_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS asof_orderkey,
           strftime(o.o_orderdate + INTERVAL 25 YEAR, '%Y-%m-%d') AS asof_date
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id AND o.o_orderdate + INTERVAL 25 YEAR <= e.ts
    QUALIFY row_number() OVER (
      PARTITION BY e.event_id
      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST
    ) = 1
    """,
    tags=("events", "asof"),
)
def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark lacks a native one): each event matched to the
    user's latest order at/before the event time (order dates shifted
    +25y into the event era).

    Implementation is the scalable union trick: interleave both
    streams on (key, time), then `last(ignorenulls)` carries the most
    recent order forward — ONE shuffle + ONE window pass, no per-row
    subquery, no join explosion (operators/asof.py).
    """
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            (F.col("o_orderdate") + F.expr("INTERVAL 25 YEARS")).alias("o_ts"),
            "o_orderkey",
        )
    )
    joined = asof_join(
        e,
        o,
        key="user_id",
        left_ts="ts",
        right_ts="o_ts",
        right_cols=("o_orderkey", "o_ts"),
        tie_break="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.date_format("o_ts", "yyyy-MM-dd").alias("asof_date"),
    )


@register(
    "range_join_window",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey AS user_id,
             o_orderdate + INTERVAL 25 YEAR AS o_ts
      FROM orders
    )
    SELECT o.o_orderkey, count(*) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM o JOIN events e
      ON e.user_id = o.user_id
     AND e.ts >= o.o_ts AND e.ts < o.o_ts + INTERVAL 6 HOUR
    GROUP BY o.o_orderkey
    """,
    headline=True,
    tags=("join", "range"),
)
def q_range_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — events within 6 h after each order.

    The scalable idiom: quantize both sides to coarse time buckets
    sized to the interval, equi-join on (key, bucket) with the right
    side expanded to the 2 buckets an interval can straddle, then
    refine with the exact range predicate. The shuffle key is
    (user, bucket) — equi-join machinery, map-side pruned — instead
    of a theta-join that degenerates to per-key cross products.
    """
    bucket_s = 6 * 3600
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "value", (F.unix_timestamp("ts") / bucket_s).cast("long").alias("b")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("user_id"),
            (F.col("o_orderdate") + F.expr("INTERVAL 25 YEARS")).alias("o_ts"),
        )
        .withColumn("b0", (F.unix_timestamp("o_ts") / bucket_s).cast("long"))
        .withColumn("b", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
    )
    return (
        e.join(o, ["user_id", "b"])
        .filter(
            (F.col("ts") >= F.col("o_ts"))
            & (F.col("ts") < F.col("o_ts") + F.expr("INTERVAL 6 HOURS"))
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@register(
    "correlated_avg_filter",
    oracle="""
    SELECT l.l_partkey, count(*) AS n_above,
           round(sum(l.l_extendedprice), 2) AS total_above
    FROM lineitem l
    WHERE l.l_quantity > (
      SELECT 1.2 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    HAVING count(*) >= 3
    """,
    tags=("join", "subquery"),
)
def q_correlated_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17's shape): rows above
    1.2× their group's average. De-correlated the way Catalyst does
    it — one aggregate over the correlation key, broadcast back as an
    equi-join — so the 'subquery per row' costs one extra scan, not
    |rows| subqueries (the reference's per-row SELECT anti-pattern,
    load_to_postgis.py:236-241, solved in-plan)."""
    li = _t(spark, sf_dir, "lineitem")
    avgs = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 1.2).alias("thresh")
    )
    return (
        li.join(avgs, li.l_partkey == avgs.pk)
        .filter(F.col("l_quantity") > F.col("thresh"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_above"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_above"),
        )
        .filter(F.col("n_above") >= 3)
    )


@register(
    "run_counters",
    oracle="""
    SELECT event_type AS status, count(*) AS n,
           round(count(*)::DOUBLE / (SELECT count(*) FROM events), 6) AS share
    FROM events GROUP BY event_type
    """,
    tags=("events", "agg"),
)
def q_run_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: success/failure-style counters with shares (main.py:143-154)."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy(F.col("event_type").alias("status")).agg(F.count("*").alias("n"))
    total = e.count()  # scalar action on a tiny aggregate — driver-side literal
    return counts.select(
        "status", "n", F.round(F.col("n").cast("double") / F.lit(total), 6).alias("share")
    )


# ===========================================================================
# F. Geometry clip, multidimensional aggregation, window analytics
# ===========================================================================

# Concave AOI in pixel coordinates; .5 offsets keep every integer grid
# point off the edges so the even-odd test is unambiguous in both
# engines. The SAME constant builds the Spark predicate and the SQL
# oracle text — one definition, two engines.
_AOI_RING = [
    (10.5, 10.5),
    (80.5, 15.5),
    (85.5, 85.5),
    (45.5, 50.5),  # concave notch
    (15.5, 80.5),
]


@register(
    "aoi_raycast_clip",
    oracle=_NDVI_SQL
    + """
    SELECT scene_id, count(*) AS n_pixels, round(avg(ndvi), 6) AS mean_ndvi
    FROM nv
    WHERE x BETWEEN {minx} AND {maxx} AND y BETWEEN {miny} AND {maxy}
      AND {pred}
    GROUP BY scene_id
    """,
    tags=("ndvi", "spatial"),
)
def q_aoi_raycast_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 in full: AOI polygon clip = sargable bbox prefilter + exact
    even-odd ray cast unrolled as a native codegen expression
    (functions/geo.py; reference semantics compute_ndvi.py:95-134).
    Handles concave polygons — no convexity assumption."""
    from ..functions.geo import clip_filter

    nv = _ndvi_pixels_df(spark, sf_dir)
    return (
        clip_filter(nv, "x", "y", _AOI_RING)
        .groupBy("scene_id")
        .agg(F.count("*").alias("n_pixels"), F.round(F.avg("ndvi"), 6).alias("mean_ndvi"))
    )


def _finalize_raycast_oracle() -> None:
    from ..functions.geo import point_in_polygon_sql, polygon_bbox

    minx, miny, maxx, maxy = polygon_bbox(_AOI_RING)
    spec = REGISTRY["aoi_raycast_clip"]
    REGISTRY["aoi_raycast_clip"] = QuerySpec(
        spec.builder,
        spec.oracle.format(
            minx=minx, maxx=maxx, miny=miny, maxy=maxy,
            pred=point_in_polygon_sql("x", "y", _AOI_RING),
        ),
        spec.headline,
        spec.tags,
    )


_finalize_raycast_oracle()


# Polygon-with-hole + disjoint island (GeoJSON MultiPolygon shape):
# crossings sum over all rings mod 2 — no ring-role labeling needed.
_AOI_RINGS = [
    [(10.5, 10.5), (90.5, 10.5), (90.5, 90.5), (50.5, 70.5), (10.5, 90.5)],  # exterior
    [(30.5, 30.5), (60.5, 30.5), (60.5, 60.5), (30.5, 60.5)],  # hole
    [(1.5, 94.5), (7.5, 94.5), (7.5, 98.5), (1.5, 98.5)],  # island exterior
]


@register(
    "aoi_multiring_clip",
    oracle=_NDVI_SQL
    + """
    SELECT scene_id, count(*) AS n_pixels, round(avg(ndvi), 6) AS mean_ndvi
    FROM nv
    WHERE x BETWEEN {minx} AND {maxx} AND y BETWEEN {miny} AND {maxy}
      AND {pred}
    GROUP BY scene_id
    """,
    tags=("ndvi", "spatial"),
)
def q_aoi_multiring_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 generalized to polygon-with-holes / multipolygon AOIs: the
    even-odd ray cast sums crossings over every ring's edges mod 2, so
    a hole flips its interior back outside and a disjoint island ring
    adds a second inside region — still one codegen'd expression, no
    UDF (functions/geo.py point_in_rings_col; the reference clips with
    an arbitrary GeoJSON geometry at compute_ndvi.py:108-134, which may
    carry holes/multi-parts)."""
    from ..functions.geo import clip_filter

    nv = _ndvi_pixels_df(spark, sf_dir)
    return (
        clip_filter(nv, "x", "y", _AOI_RINGS)
        .groupBy("scene_id")
        .agg(F.count("*").alias("n_pixels"), F.round(F.avg("ndvi"), 6).alias("mean_ndvi"))
    )


def _finalize_multiring_oracle() -> None:
    from ..functions.geo import point_in_rings_sql, rings_bbox

    minx, miny, maxx, maxy = rings_bbox(_AOI_RINGS)
    spec = REGISTRY["aoi_multiring_clip"]
    REGISTRY["aoi_multiring_clip"] = QuerySpec(
        spec.builder,
        spec.oracle.format(
            minx=minx, maxx=maxx, miny=miny, maxy=maxy,
            pred=point_in_rings_sql("x", "y", _AOI_RINGS),
        ),
        spec.headline,
        spec.tags,
    )


_finalize_multiring_oracle()


@register(
    "cube_revenue",
    oracle="""
    SELECT coalesce(CAST(year(CAST(o_orderdate AS DATE)) AS VARCHAR), 'ALL') AS order_year,
           coalesce(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY CUBE (year(CAST(o_orderdate AS DATE)), o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (year, priority) — all four grouping combinations in
    one pass (Expand + single shuffle), labels coalesced so subtotal
    rows are engine-portable."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    return (
        o.cube(yr.alias("order_year"), F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .select(
            F.coalesce(F.col("order_year").cast("string"), F.lit("ALL")).alias("order_year"),
            F.coalesce("priority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "grouping_sets_parts",
    oracle="""
    SELECT coalesce(p_type, 'ALL') AS p_type,
           coalesce(p_brand, 'ALL') AS p_brand,
           count(*) AS n_parts,
           round(avg(p_retailprice), 4) AS avg_price
    FROM part
    GROUP BY GROUPING SETS ((p_type), (p_brand), ())
    """,
    tags=("agg", "cube"),
)
def q_grouping_sets_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general multidimensional form CUBE
    and ROLLUP desugar to."""
    p = _t(spark, sf_dir, "part")
    p.createOrReplaceTempView("part_gs")
    return spark.sql("""
        SELECT coalesce(p_type, 'ALL') AS p_type,
               coalesce(p_brand, 'ALL') AS p_brand,
               count(*) AS n_parts,
               round(avg(p_retailprice), 4) AS avg_price
        FROM part_gs
        GROUP BY GROUPING SETS ((p_type), (p_brand), ())
    """)


@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("agg", "events"),
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`). The approximate path at 100 TB is
    approx_percentile / t-digest; exact is kept as the oracle-checkable
    semantics."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@register(
    "rolling_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             sum(o_totalprice) AS day_total
      FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, strftime(d, '%Y-%m-%d') AS order_date,
           round(sum(day_total) OVER (
             PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ), 2) AS revenue_7d,
           round(avg(day_total) OVER (
             PARTITION BY o_custkey ORDER BY d
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS avg_3rows
    FROM daily
    """,
    tags=("window",),
)
def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-window analytics (§2.9 extension surface — the NDVI
    time-series shape): 7-day range frame + 3-row sliding frame per
    customer. Range frames order on epoch days so the interval
    semantics match across engines."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(
            "o_custkey", F.col("o_orderdate").cast("date").alias("d")
        ).agg(F.sum("o_totalprice").alias("day_total"))
    )
    epoch_day = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w_range = (
        Window.partitionBy("o_custkey").orderBy(epoch_day).rangeBetween(-6, 0)
    )
    w_rows = Window.partitionBy("o_custkey").orderBy("d").rowsBetween(-2, 0)
    return daily.select(
        "o_custkey",
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("day_total").over(w_range), 2).alias("revenue_7d"),
        F.round(F.avg("day_total").over(w_rows), 4).alias("avg_3rows"),
    )


@register(
    "left_outer_enrichment",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
    tags=("join", "outer"),
)
def q_left_outer_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join + aggregate: every customer, zero-order ones
    included with count 0 / spend 0. count() over the probe-side key
    (not count(*)) gives the correct 0 for unmatched rows.

    Scale note: the groupBy keys equal the join key, so once the join
    is a shuffled join (orders >> broadcast threshold at real scale)
    the aggregate inherits its partitioning and adds NO extra
    exchange; at test SF AQE broadcasts the orders side instead —
    the plan degrades gracefully in both directions."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "full_outer_reconcile",
    oracle="""
    WITH a AS (
      SELECT user_id, count(*) AS n_click
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), b AS (
      SELECT user_id, count(*) AS n_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           coalesce(n_click, 0) AS n_click,
           coalesce(n_purchase, 0) AS n_purchase
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    tags=("join", "outer"),
)
def q_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation of two aggregates over the same fan-in
    table — users who click but never purchase and vice versa survive
    with a 0 on the missing side.

    Scale note: both inputs are pre-aggregated (one row per user per
    side) BEFORE the full-outer join, so the join input is the key
    cardinality, not the event count; and both branches shuffle on
    user_id so the join adds no third exchange."""
    e = _t(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_click"))
    )
    b = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchase"))
    )
    return a.join(b, "user_id", "full").select(
        "user_id",
        F.coalesce("n_click", F.lit(0)).alias("n_click"),
        F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), mins AS (
      SELECT l_partkey, min(unit_cost) AS min_cost
      FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey, s.s_name, c.unit_cost
    FROM costs c
    JOIN mins m ON c.l_partkey = m.l_partkey AND c.unit_cost = m.min_cost
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    """,
    headline=True,
    tags=("join", "subquery"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part. The oracle spells
    it as min-per-group + join-back; the Spark plan uses the stronger
    formulation — `min() OVER (PARTITION BY part)` on the pair-level
    aggregate — which scans lineitem ONCE and needs two exchanges
    (pair-agg, then part window) instead of the join-back's two scans
    and three shuffles. Ties keep all minimal suppliers identically in
    both engines because the compared value is one of the group's own
    doubles, not a recomputation.

    Scale note: the window partition is l_partkey (bounded fan-in:
    suppliers-per-part), never a global sort; the supplier dimension
    is broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    return (
        costs.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(s), costs.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "s_name",
            "unit_cost",
        )
    )


@register(
    "lag_delta_timeseries",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT strftime(d, '%Y-%m-%d') AS order_date, revenue,
           round(revenue - lag(revenue) OVER (
             PARTITION BY date_trunc('month', d) ORDER BY d), 2) AS delta
    FROM daily
    """,
    tags=("window",),
)
def q_lag_delta_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue delta via lag() — the NDVI-time-series
    window SURVEY §2.9 names as the natural extension
    (Window.partitionBy(aoi).orderBy(acquisition_date)).

    Scale note: partitioned by month, NOT a global ORDER BY window —
    a single-partition window funnels the whole table through one
    task at 100 TB. Month-boundary rows get a NULL delta by design;
    if exact boundaries matter, a 1-row-per-month halo join fills
    them without globalizing the sort."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue")
    )
    w = Window.partitionBy(F.date_trunc("month", F.col("d"))).orderBy("d")
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
        "revenue",
        F.round(F.col("revenue") - F.lag("revenue").over(w), 2).alias("delta"),
    )


@register(
    "curation_pipeline",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source, text,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                                     '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    dedup AS (
      SELECT doc_id, source, text
      FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp)
      WHERE rn = 1
    ),
    feat AS (
      SELECT source, text,
             string_split_regex(lower(trim(text)), '\\s+') AS w,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok,
             (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
               / greatest(length(text), 1) AS pr
      FROM dedup
    ),
    scored AS (
      SELECT source, w, n_tok,
             (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN pr <= 0.2 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN ((length(text) - n_tok + 1)::DOUBLE / greatest(n_tok, 1))
                    BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END) AS q
      FROM feat
    ),
    langed AS (
      SELECT source, n_tok,
             list_sort([
               {{'neg': -len(list_filter(w, t -> list_contains(['der','die','das','und','nicht','ist'], t))), 'lang': 'de'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['the','and','of','to','is','a'], t))), 'lang': 'en'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['el','la','de','que','y','es'], t))), 'lang': 'es'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['le','la','les','et','est','que'], t))), 'lang': 'fr'}},
               {{'neg': -len(list_filter(w, t -> list_contains(['de','shi','le','bu','wo','zai'], t))), 'lang': 'zh'}}
             ])[1]['lang'] AS pred_lang
      FROM scored WHERE q >= 0.7
    )
    SELECT source, pred_lang, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM langed GROUP BY source, pred_lang
    """.replace("{{", "{").replace("}}", "}"),
    headline=True,
    tags=("text", "dedup", "pipeline"),
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data curation flow as ONE lazy plan:
    normalized-fingerprint dedup (keep lowest doc_id) → quality gate
    (≥ 0.7) → language ID → per-(source, lang) doc + token budget.

    Scale shape: exactly two shuffles — the dedup window on the
    fingerprint (high-cardinality key, no skew) and the final tiny
    aggregate. Quality scoring and language ID are pure column
    expressions fused into the same codegen stage as the scan; no
    Python touches the text. The threshold comparison is FP-safe
    cross-engine because both sides sum the identical component
    doubles in the identical order."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy("doc_id")
    dedup = (
        d.select("doc_id", "source", "text", TXT.normalized_fingerprint("text").alias("fp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        dedup.filter(TXT.quality_score("text") >= 0.7)
        .select("source", TXT.predict_lang("text").alias("pred_lang"), F.size(TXT.tokens("text")).alias("n_tok"))
        .groupBy("source", "pred_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      WITH b AS (
        SELECT vec_id, embedding,
               CAST(list_sum(list_transform(generate_series(1, 8),
                    i -> CASE WHEN embedding[i] >= 0 THEN CAST(pow(2, i - 1) AS BIGINT)
                              ELSE 0 END)) AS BIGINT) AS bucket
        FROM embeddings
      )
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round({_COSINE_SQL}, 6) >= 0.3
    ),
    edges AS (
      SELECT vec_a AS s, vec_b AS d FROM pairs
      UNION ALL SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    cc AS (SELECT node, min(label) AS component FROM reach GROUP BY node)
    SELECT component, count(*) AS n_members, max(node) AS max_member
    FROM cc GROUP BY component
    """,
    tags=("dedup", "iterative"),
)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: sign-LSH cosine pairs (≥ 0.3) → connected
    components (iterative min-label propagation,
    operators/dedup.py::connected_components) → per-cluster size.
    The oracle computes the same fixpoint as a recursive CTE — the
    rare case where an iterative distributed algorithm still has an
    exact SQL twin."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = SIM.lsh_near_duplicate_pairs(e, threshold=0.3, n_bits=8).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    cc = DD.connected_components(pairs)
    return cc.groupBy("component").agg(
        F.count("*").alias("n_members"), F.max("node").alias("max_member")
    )


# ===========================================================================
# G. Corpus curation: splits, sampling, scrubbing, packing, contamination
#    (operators/curation.py — the post-dedup stages of a training-data build)
# ===========================================================================


@register(
    "hash_split_summary",
    oracle="""
    WITH s AS (
      SELECT source,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       % 100 < 5
                  THEN 'eval' ELSE 'train' END AS split,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    )
    SELECT split, source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, source
    """,
    tags=("curation", "split"),
)
def q_hash_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/eval split by content hash (md5-bucket of
    doc_id, operators/curation.py::assign_split). A per-row column
    expression — zero shuffles beyond the final aggregate; a row's
    split is stable as the corpus grows, unlike rand()-based splits."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            CUR.assign_split(F.col("doc_id"), eval_pct=5).alias("split"),
            TXT.token_count(F.col("text")).alias("n_tok"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
    )


@register(
    "mixture_sampling",
    oracle="""
    WITH s AS (
      SELECT source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
               % 10000 AS b,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents),
    k AS (
      SELECT source, n_tok, b,
             CASE source WHEN 'src0' THEN 10000
                         WHEN 'src1' THEN 5000
                         WHEN 'src2' THEN 2500
                         ELSE 1000 END AS thr
      FROM s)
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN b < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN b < thr THEN n_tok ELSE 0 END) AS BIGINT)
             AS tokens_kept
    FROM k GROUP BY source
    """,
    tags=("curation", "sample"),
)
def q_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixture re-weighting: deterministic per-source keep
    rates (src0 100%, src1 50%, src2 25%, rest 10%) via content-hash
    thresholds (operators/curation.py::mixture_keep). Per-row
    expression, zero shuffles before the audit aggregate; samples are
    NESTED across weights, so a mixture tweak only adds/removes the
    marginal rows."""
    d = _t(spark, sf_dir, "documents")
    keep = CUR.mixture_keep(
        F.col("doc_id"),
        F.col("source"),
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_weight=0.1,
    )
    return (
        d.select(
            "source", keep.alias("keep"), TXT.token_count(F.col("text")).alias("n_tok")
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("tokens_kept"),
        )
    )


@register(
    "doc_chunking",
    oracle="""
    WITH d AS (
      SELECT source,
             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS n_tok
      FROM documents),
    c AS (
      SELECT source, n_tok,
             CASE WHEN n_tok <= 64 THEN 1
                  ELSE CAST(ceil((n_tok - 64) / 48.0) AS INT) + 1 END AS n_chunks
      FROM d),
    ch AS (
      SELECT source, least(64, n_tok - i * 48) AS chunk_len
      FROM c CROSS JOIN (SELECT unnest(generate_series(0, 200)) AS i) g
      WHERE i < n_chunks)
    SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
           round(avg(chunk_len), 4) AS mean_chunk_len
    FROM ch GROUP BY source
    """,
    tags=("curation", "text"),
)
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window chunk inventory (window 64 / stride 48 — the
    standard RAG/embedding chunking shape): per-source chunk counts and
    mean chunk length. Chunk lengths come from a JVM sequence/transform
    array (operators/curation.py::chunk_lengths) — the tokens
    themselves are never materialized, only counted, so this runs at
    scan speed on a 100 TB corpus. The oracle's bounded generate_series
    is an oracle-side artifact; the Spark plan's sequence is sized per
    row."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
        )
    )
    ch = d.select(
        "source",
        F.explode(CUR.chunk_lengths(n_tok, window=64, stride=48)).alias("chunk_len"),
    )
    return ch.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.round(F.avg("chunk_len"), 4).alias("mean_chunk_len"),
    )


@register(
    "stratified_sample",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, lang,
             row_number() OVER (
               PARTITION BY source, lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, lang FROM r WHERE rk <= 3
    """,
    tags=("curation", "sample"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly min(3, |stratum|)
    docs per (source, lang), chosen by content-hash order
    (operators/curation.py::stratified_sample). One shuffle on the
    strata; rank streams over the sorted partition, so a giant
    stratum never materializes."""
    d = _t(spark, sf_dir, "documents")
    return CUR.stratified_sample(d, ["source", "lang"], k=3, key="doc_id").select(
        "doc_id", "source", "lang"
    )


@register(
    "pii_scrub_stats",
    oracle=f"""
    SELECT source,
           CAST(count(*) FILTER (
             WHERE len(regexp_extract_all(text, '{CUR_SCRUB_PATTERN_SQL}')) > 0
           ) AS BIGINT) AS n_docs_hit,
           CAST(sum(len(regexp_extract_all(text, '{CUR_SCRUB_PATTERN_SQL}')))
                AS BIGINT) AS total_matches,
           CAST(sum(length(text)
                    - length(regexp_replace(text, '{CUR_SCRUB_PATTERN_SQL}', '', 'g')))
                AS BIGINT) AS chars_removed
    FROM documents GROUP BY source
    """,
    tags=("curation", "text"),
)
def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blockword/PII scrubbing audit (operators/curation.py::scrub_*):
    match counts and removed-character volume per source. Pure
    regexp codegen fused with the scan — the scrub itself
    (regexp_replace with a redaction token) is the same expression
    with a different replacement, so auditing costs one pass and
    scrubbing costs zero extra."""
    d = _t(spark, sf_dir, "documents")
    n_matches = CUR.scrub_count(F.col("text"))
    removed = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), CUR.SCRUB_PATTERN, "")
    )
    return d.groupBy("source").agg(
        F.sum(F.when(n_matches > 0, 1).otherwise(0)).cast("bigint").alias("n_docs_hit"),
        F.sum(n_matches).cast("bigint").alias("total_matches"),
        F.sum(removed).cast("bigint").alias("chars_removed"),
    )


@register(
    "repetition_quality",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tok
      FROM documents
    ),
    pt AS (
      SELECT doc_id, source, n_tok, tok, count(*) AS c
      FROM t GROUP BY doc_id, source, n_tok, tok
    ),
    d AS (
      SELECT doc_id, source, max(n_tok) AS n_tok,
             max(c) AS top_c, count(*) AS n_distinct
      FROM pt GROUP BY doc_id, source
    )
    SELECT source,
           round(avg(n_distinct / greatest(n_tok, 1)), 4) AS avg_distinct_ratio,
           round(avg(top_c / greatest(n_tok, 1)), 4) AS avg_top_ratio,
           CAST(count(*) FILTER (WHERE top_c / greatest(n_tok, 1) > 0.12)
                AS BIGINT) AS n_flagged
    FROM d GROUP BY source
    """,
    tags=("curation", "quality"),
)
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition rules (operators/curation.py::
    repetition_stats): distinct-token ratio (pure array expr, no
    shuffle) and top-token ratio (explode → two-level aggregate;
    map-side partials mean the shuffle carries distinct tokens per
    doc, not raw tokens). Docs with top_ratio > 0.12 are flagged as
    repetitive boilerplate."""
    d = _t(spark, sf_dir, "documents")
    stats = CUR.repetition_stats(d)
    return stats.groupBy("source").agg(
        F.round(F.avg("distinct_ratio"), 4).alias("avg_distinct_ratio"),
        F.round(F.avg("top_ratio"), 4).alias("avg_top_ratio"),
        F.sum(F.when(F.col("top_ratio") > 0.12, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
    )


@register(
    "sequence_packing",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             COALESCE(sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM d
    )
    SELECT source, CAST(floor(cum_before / 2048) AS INT) AS bin,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY source, bin
    """,
    tags=("curation", "packing"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (operators/curation.py::
    pack_sequences): docs laid end-to-end per source stream, each doc
    binned by the 2048-token window its first token falls in —
    exclusive running sum over one window shuffle. Bin boundaries are
    a pure function of ordered prefix sums: deterministic under any
    partitioning, no driver state."""
    d = _t(spark, sf_dir, "documents")
    packed = CUR.pack_sequences(d, budget=2048)
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("bin_tokens"),
    )


@register(
    "contamination_ngrams",
    oracle="""
    WITH s AS (
      SELECT doc_id, source,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                       % 100 < 5
                  THEN 'eval' ELSE 'train' END AS split,
             string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id, source, split,
             unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - 2, 0)),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2])))) AS gram
      FROM s
    )
    SELECT e.source, CAST(count(DISTINCT e.doc_id) AS BIGINT) AS n_contaminated
    FROM g e
    WHERE e.split = 'eval'
      AND EXISTS (SELECT 1 FROM g t WHERE t.split = 'train' AND t.gram = e.gram)
    GROUP BY e.source
    """,
    tags=("curation", "dedup"),
)
def q_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination (operators/curation.py::
    contamination_check): eval docs sharing any 3-token shingle with
    the train split. One scan → split column → shingle explode →
    semi-join on the gram hash; heavy-hitter grams (boilerplate) are
    the AQE skew-split case, and raising n shrinks collision mass
    geometrically."""
    d = _t(spark, sf_dir, "documents")
    hits = CUR.contamination_check(d, ngram=3, eval_pct=5)
    return hits.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_contaminated")
    )


@register(
    "unpivot_metrics",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
    )
    SELECT metric, l_returnflag,
           count(*) AS n,
           round(sum(val), 2) AS total,
           round(avg(val), 4) AS mean
    FROM m GROUP BY metric, l_returnflag
    """,
    tags=("reshape",),
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape: unpivot four lineitem measures into
    (metric, val) rows, then aggregate per metric × returnflag.
    Spark's Unpivot (Expand) node emits the long rows inside the same
    codegen stage as the scan — the input is read ONCE, vs the
    oracle's 4-scan UNION ALL formulation."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
    return long.groupBy("metric", "l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.sum("val"), 2).alias("total"),
        F.round(F.avg("val"), 4).alias("mean"),
    )


# ===========================================================================
# H. Time-series gap fill, pivot, ranked windows, null semantics
# ===========================================================================


@register(
    "gap_fill_forward",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    tt AS (SELECT DISTINCT event_type FROM events),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hh
      FROM b, tt
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hh,
             count(*) AS n, sum(value) AS v
      FROM events GROUP BY event_type, hh
    )
    SELECT g.event_type, strftime(g.hh, '%Y-%m-%d %H:%M') AS hour,
           CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
           round(last_value(h.v IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hh), 2) AS filled_total
    FROM grid g
    LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hh = h.hh
    """,
    tags=("timeseries", "window"),
)
def q_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a dense hourly grid (sequence/explode
    from the data's own bounds — no literals, so the query is
    SF-independent) left-joined to hourly aggregates, missing cells
    forward-filled with last(ignorenulls) per series.

    Scale shape: the grid is |types| × |hours| (tiny vs the fact
    table); hourly aggregation carries partial sums; the fill window
    shuffles grid-sized data only. The standard sensor/NDVI
    time-series densification every monitoring pipeline needs."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hh")
    ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = (
        bounds.select(
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 hour"))
            ).alias("hh")
        )
        .crossJoin(e.select("event_type").distinct())
    )
    joined = grid.join(hourly, ["event_type", "hh"], "left")
    w = Window.partitionBy("event_type").orderBy("hh")
    return joined.select(
        "event_type",
        F.date_format("hh", "yyyy-MM-dd HH:mm").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.round(F.last("v", ignorenulls=True).over(w), 2).alias("filled_total"),
    )


@register(
    "pivot_priorities",
    oracle="""
    SELECT o_orderstatus,
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
             AS "1-URGENT",
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '2-HIGH'), 2)
             AS "2-HIGH",
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '3-MEDIUM'), 2)
             AS "3-MEDIUM",
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED'), 2)
             AS "4-NOT SPECIFIED",
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '5-LOW'), 2)
             AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("reshape", "agg"),
)
def q_pivot_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (the inverse of unpivot_metrics; same machinery
    as J1 band pairing in operators/bands.py): revenue by status ×
    priority. Explicit pivot values keep the plan a single-pass
    aggregate — Spark never runs the extra distinct-values job, and
    the output schema is static for Catalyst."""
    o = _t(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.round(F.sum("o_totalprice"), 2))
    )


@register(
    "ranked_quartiles",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, total,
             ntile(4) OVER (ORDER BY total, o_custkey) AS quartile,
             percent_rank() OVER (ORDER BY total, o_custkey) AS pr,
             cume_dist() OVER (ORDER BY total, o_custkey) AS cd,
             dense_rank() OVER (ORDER BY total, o_custkey) AS dr
      FROM spend
    )
    SELECT quartile, count(*) AS n,
           round(min(total), 2) AS min_total,
           round(max(total), 2) AS max_total,
           round(min(pr), 6) AS min_pr,
           round(max(cd), 6) AS max_cd,
           CAST(max(dr) AS BIGINT) AS max_dense_rank
    FROM ranked GROUP BY quartile
    """,
    tags=("window", "rank"),
)
def q_ranked_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-window family (ntile / percent_rank / cume_dist /
    dense_rank) over per-customer spend, summarized per quartile.
    The total order includes the key as tiebreak so ranks are
    deterministic. NOTE the global ORDER BY window is the one shape
    that funnels into a single partition — acceptable here because it
    ranks the AGGREGATE (one row per customer), never the fact table;
    at 100 TB rank the aggregate or switch to approx quantile cuts."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total")
    )
    w = Window.orderBy("total", "o_custkey")
    ranked = spend.select(
        "o_custkey",
        "total",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
    )
    return ranked.groupBy("quartile").agg(
        F.count("*").alias("n"),
        F.round(F.min("total"), 2).alias("min_total"),
        F.round(F.max("total"), 2).alias("max_total"),
        F.round(F.min("pr"), 6).alias("min_pr"),
        F.round(F.max("cd"), 6).alias("max_cd"),
        F.max("dr").cast("bigint").alias("max_dense_rank"),
    )


@register(
    "nullsafe_join_semantics",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_acctbal,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg
      FROM customer
    ),
    dim AS (
      SELECT seg, COALESCE(seg, '(unattributed)') AS seg_label
      FROM (SELECT DISTINCT seg FROM c)
    )
    SELECT d.seg_label,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_bal
    FROM c JOIN dim d ON c.seg IS NOT DISTINCT FROM d.seg
    GROUP BY d.seg_label
    """,
    tags=("join", "null"),
)
def q_nullsafe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): customers
    whose derived segment is NULL still match the NULL dimension row —
    the semantic a plain equi-join silently drops. Spark plans <=> as
    a hash join (null-safe keys hash like values), so the broadcast
    path survives."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    dim = c.select("seg").distinct().select(
        "seg", F.coalesce(F.col("seg"), F.lit("(unattributed)")).alias("seg_label")
    )
    joined = c.alias("c").join(
        F.broadcast(dim).alias("d"), F.col("c.seg").eqNullSafe(F.col("d.seg"))
    )
    return joined.groupBy("seg_label").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )


@register(
    "stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(skewness(l_quantity), 5) AS skew_qty,
           round(kurtosis(l_quantity), 5) AS kurt_qty,
           max_by(l_linestatus, l_extendedprice) AS status_of_max_price,
           min_by(l_linestatus, l_extendedprice) AS status_of_min_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (§2.8 math surface, extended):
    sample stddev/variance, correlation, covariance, skewness, excess
    kurtosis, and arg-min/max (min_by/max_by). All single-pass
    moment-sketch aggregates — partial/final pairs, shuffle rows =
    |groups|; both engines use the same definitions so values match
    to 5-6 decimals after rounding."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.skewness("l_quantity"), 5).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 5).alias("kurt_qty"),
        F.max_by("l_linestatus", "l_extendedprice").alias("status_of_max_price"),
        F.min_by("l_linestatus", "l_extendedprice").alias("status_of_min_price"),
    )


@register(
    "array_agg_sorted",
    oracle="""
    SELECT o_orderpriority,
           list_sort(list(DISTINCT o_orderstatus)) AS statuses,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "nested"),
)
def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-result aggregation: collect_set → sort_array gives a
    deterministic ARRAY column (set aggregation order is
    partitioning-dependent in ANY distributed engine — the sort is
    what makes the result well-defined and comparable)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sort_array(F.collect_set("o_orderstatus")).alias("statuses"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
    )


@register(
    "conditional_agg",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
           round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 2)
               AS urgent_total,
           bool_and(o_totalprice > 900.0) AS all_over_900,
           bool_or(o_orderpriority = '5-LOW') AS any_low,
           CAST(count(*) FILTER (WHERE o_orderpriority LIKE '%URGENT%') AS BIGINT)
               AS n_urgent
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "conditional"),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregate family (§2.5 extension): FILTER
    clauses, count_if, and boolean aggregates (bool_and/bool_or).

    All remain single-pass partial/final hash aggregates — the FILTER
    predicate is evaluated map-side, so shuffle rows = |groups|.
    """
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 150000.0).alias("n_big"),
        F.round(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))), 2
        ).alias("urgent_total"),
        F.bool_and(F.col("o_totalprice") > 900.0).alias("all_over_900"),
        F.bool_or(F.col("o_orderpriority") == "5-LOW").alias("any_low"),
        F.count_if(F.col("o_orderpriority").contains("URGENT")).cast("bigint").alias("n_urgent"),
    )


@register(
    "histogram_bins",
    oracle="""
    SELECT CAST(least(floor(l_extendedprice / 10000.0), 9) AS BIGINT) AS bin,
           count(*) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi,
           round(avg(l_discount), 6) AS avg_disc
    FROM lineitem
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram as pure column math + hash aggregate — the
    same shape as the overview downsample A6 (floor-divide bucketing,
    `compute_ndvi.py:147` analog on a value domain instead of a pixel
    grid). No UDF, no sort; one shuffle of |bins| rows per task."""
    li = _t(spark, sf_dir, "lineitem")
    bin_col = F.least(F.floor(F.col("l_extendedprice") / 10000.0), F.lit(9)).cast("bigint")
    return li.groupBy(bin_col.alias("bin")).agg(
        F.count("*").alias("n"),
        F.round(F.min("l_extendedprice"), 2).alias("lo"),
        F.round(F.max("l_extendedprice"), 2).alias("hi"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
    )


@register(
    "word_frequencies",
    oracle="""
    SELECT token, n FROM (
      SELECT token, count(*) AS n FROM (
        SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
        FROM documents
      ) WHERE token <> ''
      GROUP BY token
    ) ORDER BY n DESC, token ASC LIMIT 20
    """,
    tags=("text", "explode"),
)
def q_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic corpus word-count: split → explode (generator/UNNEST) →
    hash aggregate → deterministic top-k (count desc, token asc).

    The explode is map-side (no shuffle until the aggregate), partial
    aggregation collapses each task's token stream to its distinct
    tokens, and the top-20 is TakeOrderedAndProject — no global sort
    materialization at any scale."""
    d = _t(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "bitwise_agg",
    oracle="""
    SELECT l_returnflag,
           bit_and(l_orderkey) AS and_key,
           bit_or(l_orderkey) AS or_key,
           bit_xor(l_orderkey) AS xor_key,
           CAST(count(DISTINCT l_orderkey % 16) AS BIGINT) AS n_low_nibbles
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "bitwise"),
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and/bit_or/bit_xor) — order- and
    partitioning-independent by construction, so distributed partial
    aggregation is exact with zero determinism caveats."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_orderkey").alias("and_key"),
        F.bit_or("l_orderkey").alias("or_key"),
        F.bit_xor("l_orderkey").alias("xor_key"),
        F.countDistinct(F.col("l_orderkey") % 16).cast("bigint").alias("n_low_nibbles"),
    )


@register(
    "embedding_norms",
    oracle="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(len(embedding)) AS INT) AS dim,
           round(avg(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_norm,
           round(max(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS max_norm
    FROM embeddings
    GROUP BY label
    """,
    tags=("array", "hof"),
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions on the embedding column: per-row
    L2 norm via `aggregate` (fold) over the array, entirely JVM-side —
    no UDF, no explode, so a 100 TB embedding table never leaves
    whole-stage codegen for this computation."""
    e = _t(spark, sf_dir, "embeddings")
    sq = lambda acc, x: acc + x.cast("double") * x.cast("double")  # noqa: E731
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), sq))
    with_norm = e.select("label", F.size("embedding").alias("d"), norm.alias("norm"))
    return with_norm.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n"),
        F.max("d").cast("int").alias("dim"),
        F.round(F.avg("norm"), 4).alias("avg_norm"),
        F.round(F.max("norm"), 4).alias("max_norm"),
    )


@register(
    "interval_functions",
    oracle="""
    SELECT CAST(quarter(o_orderdate) AS INT) AS qtr,
           count(*) AS n,
           strftime(min(last_day(CAST(o_orderdate AS DATE))), '%Y-%m-%d') AS first_month_end,
           strftime(max(date_trunc('month', o_orderdate)), '%Y-%m-%d') AS last_month_start,
           strftime(min(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH), '%Y-%m-%d') AS first_due,
           strftime(max(CAST(o_orderdate AS DATE) - INTERVAL 90 DAY), '%Y-%m-%d') AS last_cutoff
    FROM orders
    GROUP BY 1
    """,
    tags=("date", "interval"),
)
def q_interval_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval arithmetic (§2.8 date family, extended):
    add_months (month-end clamped identically in both engines),
    last_day, month truncation, and day offsets."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.groupBy(F.quarter("o_orderdate").cast("int").alias("qtr")).agg(
        F.count("*").alias("n"),
        F.date_format(F.min(F.last_day(d)), "yyyy-MM-dd").alias("first_month_end"),
        F.date_format(F.max(F.trunc(d, "month")), "yyyy-MM-dd").alias("last_month_start"),
        F.date_format(F.min(F.add_months(d, 3)), "yyyy-MM-dd").alias("first_due"),
        F.date_format(F.max(F.date_sub(d, 90)), "yyyy-MM-dd").alias("last_cutoff"),
    )


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled power iteration as chained CTEs — exact, engine-portable
    (no recursive-CTE aggregation restrictions)."""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(
            f"""r{k} AS (
      SELECT n.node,
             0.15/(SELECT n FROM cnt)
               + 0.85*coalesce(sum(p.r/dg.d), 0) AS r
      FROM nodes n
      LEFT JOIN eds e ON e.dst = n.node
      LEFT JOIN r{k-1} p ON p.node = e.src
      LEFT JOIN deg dg ON dg.src = e.src
      GROUP BY n.node)"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH eds AS (
      SELECT DISTINCT CAST(o_custkey % 25 AS BIGINT) AS src,
                      CAST(l_suppkey % 25 AS BIGINT) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    nodes AS (SELECT DISTINCT src AS node FROM eds
              UNION SELECT DISTINCT dst FROM eds),
    cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM eds GROUP BY src),
    r0 AS (SELECT node, 1.0/(SELECT n FROM cnt) AS r FROM nodes),
    {chain}
    SELECT node, round(r, 6) AS rank FROM r{iterations}
    """


@register(
    "pagerank_graph",
    oracle=_pagerank_oracle(5),
    tags=("graph", "iterative"),
)
def q_pagerank_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative algorithm tier: 5 power iterations of PageRank on a
    25-node graph derived from the orders⋈lineitem relation
    (customer-bucket → supplier-bucket edges). The oracle unrolls the
    same iterations as chained CTEs, so the fixed-point loop is
    value-checked exactly, not rows-only. See operators/graph.py for
    the per-iteration shuffle analysis."""
    from ..operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") % 25).cast("bigint").alias("src"),
            (F.col("l_suppkey") % 25).cast("bigint").alias("dst"),
        )
    )
    return pagerank(edges, iterations=5).select(
        "node", F.round("rank", 6).alias("rank")
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token),
    df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.token,
             t.tf * (ln(((SELECT n FROM n) + 1) / (d.df + 1)) + 1) AS score
      FROM tf t JOIN df d ON d.token = t.token
      WHERE t.doc_id <= 30)
    SELECT doc_id, token, round(score, 6) AS score
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, token ASC) <= 3
    """,
    tags=("text", "tfidf"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (smoothed idf, sklearn-style ln((N+1)/(df+1))+1) with
    top-3 terms per document. Corpus statistics (df, N) come from the
    FULL corpus; the per-doc projection is filtered afterwards — the
    order that matters for correctness at any scale. df is a
    pre-aggregated (doc,token) relation, so the expensive token
    explode happens once and both tf and df derive from it."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").cast("double").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    n_docs = float(d.count())
    scored = (
        tf.filter(F.col("doc_id") <= 30)
        .join(df, "token")
        .select(
            "doc_id",
            "token",
            (F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0)).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", F.round("score", 6).alias("score"))
    )


@register(
    "keep_first_cdc",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, ts, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS rk
      FROM events)
    SELECT event_type AS first_event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           round(sum(value), 2) AS first_value_sum
    FROM r WHERE rk = 1
    GROUP BY event_type
    """,
    tags=("dedup", "window", "cdc"),
)
def q_keep_first_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-record-per-key dedup — the CDC twin of last_write_wins
    (keep the INSERT, drop later updates): one row_number window per
    key with a deterministic (ts, event_id) order, summarized by the
    kept row's type. Same single-shuffle shape as the K4 idiom; at
    scale the window streams each key's rows without materializing
    history."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = e.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return first.groupBy(F.col("event_type").alias("first_event_type")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.sum("value"), 2).alias("first_value_sum"),
    )


@register(
    "ndvi_viz_rescale",
    oracle=_NDVI_SQL
    + """
    , viz AS (
      SELECT scene_id,
             CAST(round(greatest(0.0, least(255.0, (ndvi + 1.0) * 127.5)))
                  AS INT) AS byte_v
      FROM nv WHERE ndvi IS NOT NULL)
    SELECT scene_id, CAST(count(*) AS BIGINT) AS n_pixels,
           min(byte_v) AS min_b, max(byte_v) AS max_b,
           round(avg(CAST(byte_v AS DOUBLE)), 4) AS mean_b
    FROM viz GROUP BY scene_id
    """,
    tags=("ndvi", "viz", "agg"),
)
def q_ndvi_viz_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The viz product's value semantics (compute_ndvi.py:144-158
    'viz' style): NDVI [-1, 1] rescaled to display bytes [0, 255],
    summarized per scene. Pure column arithmetic fused with the NDVI
    expression — Catalyst collapses rescale∘clamp∘ndvi into one
    codegen span, where the reference runs a separate raster pass."""
    nv = _ndvi_pixels_df(spark, sf_dir).filter(F.col("ndvi").isNotNull())
    byte_v = F.round(
        F.greatest(F.lit(0.0), F.least(F.lit(255.0), (F.col("ndvi") + 1.0) * 127.5))
    ).cast("int")
    return nv.select("scene_id", byte_v.alias("byte_v")).groupBy("scene_id").agg(
        F.count("*").cast("bigint").alias("n_pixels"),
        F.min("byte_v").alias("min_b"),
        F.max("byte_v").alias("max_b"),
        F.round(F.avg(F.col("byte_v").cast("double")), 4).alias("mean_b"),
    )


@register(
    "scd2_lookup",
    oracle="""
    WITH dim AS (
      SELECT s_suppkey, 1 AS version, DATE '1992-01-01' AS eff_from,
             DATE '1996-01-01' AS eff_to, s_acctbal * 0.9 AS rate
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 2, DATE '1996-01-01', DATE '1999-01-01',
             s_acctbal * 1.0
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 3, DATE '1999-01-01', DATE '2999-01-01',
             s_acctbal * 1.1
      FROM supplier)
    SELECT d.version, CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * d.rate / 10000.0), 2) AS weighted
    FROM lineitem l
    JOIN dim d ON d.s_suppkey = l.l_suppkey
      AND CAST(l.l_shipdate AS DATE) >= d.eff_from
      AND CAST(l.l_shipdate AS DATE) < d.eff_to
    GROUP BY d.version
    """,
    tags=("join", "scd", "warehouse"),
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) effective-dated lookup: each
    fact row joins the dimension VERSION whose [eff_from, eff_to)
    window covers its ship date. Equi-join on the surrogate key with
    the date window as a residual predicate — per-key fan-in is the
    version count (3 here), so the join never explodes; the versioned
    dimension stays broadcastable because SCD2 grows it by versions,
    not by fact volume."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")

    def ver(v: int, frm: str, to: str, mult: float) -> DataFrame:
        return s.select(
            "s_suppkey",
            F.lit(v).alias("version"),
            F.lit(frm).cast("date").alias("eff_from"),
            F.lit(to).cast("date").alias("eff_to"),
            (F.col("s_acctbal") * mult).alias("rate"),
        )

    dim = (
        ver(1, "1992-01-01", "1996-01-01", 0.9)
        .unionByName(ver(2, "1996-01-01", "1999-01-01", 1.0))
        .unionByName(ver(3, "1999-01-01", "2999-01-01", 1.1))
    )
    d = F.col("l_shipdate").cast("date")
    j = li.join(
        F.broadcast(dim),
        (F.col("s_suppkey") == F.col("l_suppkey"))
        & (d >= F.col("eff_from"))
        & (d < F.col("eff_to")),
    )
    return j.groupBy("version").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("rate") / 10000.0), 2).alias(
            "weighted"
        ),
    )


@register(
    "mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, m.med,
             median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m ON m.event_type = e.event_type
      GROUP BY e.event_type, m.med)
    SELECT e.event_type,
           round(m.med, 4) AS med,
           round(m.mad, 4) AS mad,
           CAST(sum(CASE WHEN abs(e.value - m.med) > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(count(*) AS BIGINT) AS n
    FROM events e JOIN mad m ON m.event_type = e.event_type
    GROUP BY e.event_type, m.med, m.mad
    """,
    tags=("stats", "robust", "join"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation (the
    3-sigma rule's breakdown-resistant twin: |v − med| > 3·1.4826·MAD).
    Two median aggregates with a join-back between them — both keyed
    on event_type, so the second agg and both joins reuse the same
    hash partitioning (one logical shuffle key end-to-end). Exact
    medians at this group count; at extreme cardinality swap
    percentile_approx in with the same plan shape."""
    e = _t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(F.median("value").alias("med"))
    mad = (
        e.join(med, "event_type")
        .groupBy("event_type", "med")
        .agg(F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"))
    )
    is_out = F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")
    return (
        e.join(mad, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
            "n",
        )
    )


@register(
    "event_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    tags=("events", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events
    per user (the input to clickstream transition matrices): one
    window pass partitioned by user (bounded history per partition key
    — never a global sort) feeding one hash-agg over the
    (prev, next) pairs. Tie-break on event_id makes the sequence
    deterministic under equal timestamps."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return s.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("bigint").alias("n")
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST((epoch(CAST(date_trunc('week', e.ts) AS TIMESTAMP))
                   - epoch(CAST(f.cohort_week AS TIMESTAMP))) / 604800 AS INT)
               AS week_offset
      FROM events e JOIN first_seen f ON f.user_id = e.user_id)
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    tags=("events", "cohort", "join"),
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort table: users bucketed by first-activity week,
    counted as active per week offset since their cohort. The cohort
    relation is one row per user (agg before join — same fan-out
    discipline as the funnel); distinct-per-(user, week) collapses
    repeat activity before the final count so heavy users don't
    inflate retention."""
    e = _t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    first_seen = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    offset = (
        (
            F.unix_timestamp(F.date_trunc("week", F.col("ts")))
            - F.unix_timestamp(F.col("cohort_week").cast("timestamp"))
        )
        / 604800
    ).cast("int")
    activity = (
        e.join(first_seen, "user_id")
        .select("user_id", "cohort_week", offset.alias("week_offset"))
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"), "week_offset"
    ).agg(F.count("*").cast("bigint").alias("n_active_users"))


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT v.user_id,
             min(epoch_us(e.ts) - epoch_us(v.first_view)) AS us_to_convert
      FROM v JOIN events e ON e.user_id = v.user_id
        AND e.event_type = 'purchase'
        AND e.ts >= v.first_view
        AND epoch_us(e.ts) - epoch_us(v.first_view) <= 3600000000
      GROUP BY v.user_id)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_viewed,
           CAST(count(*) AS BIGINT) AS n_converted,
           round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM v), 4)
             AS conversion_rate,
           round(avg(us_to_convert / 60000000.0), 2) AS avg_minutes
    FROM p
    """,
    tags=("events", "funnel", "join"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→purchase funnel within a 1-hour window: users whose first
    'view' is followed by a 'purchase' within the hour, with
    conversion rate and mean minutes-to-convert. The first-view
    relation is an agg (one row per user), so the event join fans out
    only to each user's purchases — never event×event; the time-band
    predicate is sargable on the purchase scan."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    n_viewed = v.count()
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("first_view"))
    p = (
        v.join(e.filter(F.col("event_type") == "purchase"), "user_id")
        .filter((F.col("ts") >= F.col("first_view")) & (gap <= 3600000000))
        .groupBy("user_id")
        .agg(F.min(gap).alias("us_to_convert"))
    )
    return p.agg(
        F.lit(n_viewed).cast("bigint").alias("n_viewed"),
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.count("*") / F.lit(float(n_viewed)), 4).alias("conversion_rate"),
        F.round(F.avg(F.col("us_to_convert") / 60000000.0), 2).alias("avg_minutes"),
    )


@register(
    "triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT
             least(CAST(o_custkey % 60 AS INT), CAST(o_orderkey % 60 AS INT)) AS a,
             greatest(CAST(o_custkey % 60 AS INT), CAST(o_orderkey % 60 AS INT)) AS b
      FROM orders
      WHERE o_custkey % 60 <> o_orderkey % 60)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    tags=("graph", "join"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on a derived undirected graph:
    canonicalize each edge to (a < b), then the standard two-join
    enumeration e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) — the a<b<c ordering
    counts every triangle exactly once and cuts the join fan-out 6×
    vs undirected enumeration. Shuffles are keyed on edge endpoints
    (the joins' equi-keys); at scale the classic degree-based
    orientation (orient edges low→high degree) bounds the wedge count
    — canonical ordering is its id-based special case."""
    o = _t(spark, sf_dir, "orders")
    a = (F.col("o_custkey") % 60).cast("int")
    b = (F.col("o_orderkey") % 60).cast("int")
    e = (
        o.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    n_edges = e.count()
    e1 = e
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("a"), F.col("b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return tri.agg(
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.count("*").cast("bigint").alias("n_triangles"),
    )


@register(
    "bm25_rank",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token),
    dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
    df AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT t.doc_id,
             sum( ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
                  * t.tf * 2.2
                  / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)) ) AS score
      FROM tf t
      JOIN df d ON d.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s
      WHERE t.token IN ('spark', 'join', 'window')
      GROUP BY t.doc_id)
    SELECT doc_id, round(score, 6) AS score
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id LIMIT 10
    """,
    tags=("text", "ranking"),
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75, Lucene's non-negative idf) top-10
    docs for a 3-term query. Corpus stats (N, avgdl) are a 2-value
    scalar aggregate collected driver-side — they become plan
    literals, so no cross join survives into the physical plan. The
    query-term filter is an `isin` on the pre-aggregated tf relation:
    it prunes BEFORE the df/dl joins, and both join sides are tiny
    (terms × docs), so AQE broadcasts them. Ordering is on the
    round-6 score with doc_id tiebreak — deterministic across engines
    regardless of float summation order."""
    d = _t(spark, sf_dir, "documents")
    terms = ["spark", "join", "window"]
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").cast("double").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n, avgdl = dl.agg(
        F.count("*").cast("double"), F.avg("dl")
    ).first()
    df = tf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.lit(avgdl))
    scored = (
        tf.filter(F.col("token").isin(terms))
        .join(df, "token")
        .join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(F.sum(idf * F.col("tf") * 2.2 / denom).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "vocab_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
      FROM documents),
    x AS (
      SELECT source,
             CASE WHEN t IN ('data','table','value','row','query',
                             'join','scan','fast','key','spark')
                  THEN 0 ELSE 1 END AS oov
      FROM toks WHERE t <> '')
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(avg(CAST(oov AS DOUBLE)), 4) AS oov_rate
    FROM x GROUP BY source
    """,
    tags=("text", "training"),
)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: out-of-vocabulary token rate per
    source against a fixed vocab (the audit run before committing to a
    tokenizer). The vocab membership is an `isin` over a literal set —
    codegen'd hash lookup per token, no join; one shuffle for the
    per-source aggregate. For a real 100k-entry vocab, broadcast-join
    a vocab table instead — same plan shape."""
    d = _t(spark, sf_dir, "documents")
    vocab = [
        "data", "table", "value", "row", "query",
        "join", "scan", "fast", "key", "spark",
    ]
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("t")
    ).filter(F.col("t") != "")
    oov = F.when(F.col("t").isin(vocab), 0).otherwise(1)
    return (
        toks.select("source", oov.alias("oov"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("oov").cast("bigint").alias("n_oov"),
            F.round(F.avg(F.col("oov").cast("double")), 4).alias("oov_rate"),
        )
    )


@register(
    "bpe_pair_counts",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents),
    t AS (SELECT token FROM toks WHERE length(token) >= 2),
    pairs AS (
      SELECT substring(token, CAST(i AS INT), 2) AS pair
      FROM t CROSS JOIN (SELECT unnest(generate_series(1, 30)) AS i) g
      WHERE i <= length(token) - 1)
    SELECT pair, count(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT 30
    """,
    tags=("text", "training"),
)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of BPE tokenizer training: corpus-wide adjacent
    character-pair frequencies, top-30. The pair enumeration is a
    JVM-side higher-order function — transform(sequence(1, len-1),
    i -> substr(i, 2)) then one explode — no Python, no per-char
    explode (explodes len-1 two-char strings instead of len single
    chars + a self-join). One shuffle for the global count."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.length("token") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("token") - 1),
                lambda i: F.col("token").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(30)
    )


@register(
    "session_window_native",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= 2700000000
                       OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_s) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("events", "session", "window"),
)
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (45-min gap): merging
    windows in one aggregate, the batch twin of the streaming
    session-window state store. The oracle derives identical sessions
    via the lag/cumsum islands idiom (events merge iff gap < 45 min —
    session_window merges on overlap of [ts, ts+gap), i.e. strict
    inequality, hence `>=` starts a new session)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "45 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


@register(
    "contiguous_ids",
    oracle="""
    SELECT doc_id,
           row_number() OVER (ORDER BY doc_id) - 1 AS example_id
    FROM documents
    """,
    tags=("curation", "ids"),
)
def q_contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 0..N-1 example-id assignment
    (curation.assign_contiguous_ids): two-pass range-partition +
    prefix-sum offsets — NO single-task global sort. The oracle is the
    naive single-partition row_number; results must be identical."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return CUR.assign_contiguous_ids(d, "doc_id").select("doc_id", "example_id")


@register(
    "union_by_name_evolution",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority, NULL AS o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority, o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 1)
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(count(o_totalprice) AS BIGINT) AS n_with_price,
           CAST(count(o_orderstatus) AS BIGINT) AS n_with_status,
           round(sum(o_totalprice), 2) AS total
    FROM unioned GROUP BY o_orderpriority
    """,
    tags=("setop", "schema-evolution"),
)
def q_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with different column
    sets combined by NAME with missing columns null-filled
    (unionByName(allowMissingColumns=True)) — the reader-side half of
    schema evolution on a growing lake; position-based UNION would
    silently misalign."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    b = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderpriority", "o_orderstatus"
    )
    u = a.unionByName(b, allowMissingColumns=True)
    return u.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.count("o_totalprice").cast("bigint").alias("n_with_price"),
        F.count("o_orderstatus").cast("bigint").alias("n_with_status"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


_SQL_TEXT_QUERY = """
    WITH rev AS (
      SELECT n_name, o_orderkey,
             sum(l_extendedprice * (1 - l_discount)) AS orev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name, o_orderkey)
    SELECT n_name,
           count(*) AS n_orders,
           round(sum(orev), 2) AS revenue,
           round(max(orev), 2) AS top_order_rev
    FROM rev GROUP BY n_name
"""


@register(
    "sql_text_interface",
    oracle=_SQL_TEXT_QUERY,
    tags=("sql", "join", "agg"),
)
def q_sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end: the IDENTICAL ANSI text runs through
    `spark.sql` over registered temp views and through the DuckDB
    oracle — proving a reference user can bring raw SQL, not just the
    DataFrame API, and Catalyst plans it the same way (the CTE + two
    aggregation levels land as the usual partial/final hash aggs and
    AQE-selected joins)."""
    for t in ("lineitem", "orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_TEXT_QUERY)


def _kmeans_oracle(k: int = 4, iterations: int = 3) -> str:
    """Lloyd's algorithm unrolled as chained CTEs in fully relational
    form (points exploded to (vec_id, idx, val); distance = grouped
    sum of squared differences; argmin via windowed row_number with
    the same (dist, cid) tie-break as the Spark operator)."""
    steps = []
    prev = "c0"
    for i in range(1, iterations + 1):
        steps.append(
            f"""a{i} AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM (SELECT p.vec_id, c.cid,
                     sum((p.val - c.val) * (p.val - c.val)) AS dist
              FROM pts p JOIN {prev} c ON c.idx = p.idx
              GROUP BY p.vec_id, c.cid))
      WHERE rk = 1),
    c{i} AS (
      SELECT a.cid, p.idx, round(avg(p.val), 6) AS val
      FROM pts p JOIN a{i} a ON a.vec_id = p.vec_id
      GROUP BY a.cid, p.idx)"""
        )
        prev = f"c{i}"
    chain = ",\n    ".join(steps)
    return f"""
    WITH pts AS (
      SELECT vec_id, CAST(t.i AS INT) AS idx,
             CAST(embedding[CAST(t.i AS INT)] AS DOUBLE) AS val
      FROM embeddings CROSS JOIN range(1, 65) AS t(i)
      WHERE t.i <= len(embedding)),
    c0 AS (
      SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, idx, val
      FROM pts
      WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
    {chain},
    sizes AS (SELECT cid, count(*) AS n_points FROM a{iterations} GROUP BY cid),
    sums AS (SELECT cid, round(sum(val), 4) AS centroid_sum
             FROM c{iterations} GROUP BY cid)
    SELECT s.cid, s.n_points, m.centroid_sum
    FROM sizes s JOIN sums m ON m.cid = s.cid
    """


@register(
    "kmeans_clusters",
    oracle=_kmeans_oracle(4, 3),
    tags=("clustering", "iterative", "embedding"),
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (3 Lloyd steps, k=4) on the embedding table — the
    operator runs array-native (zip_with/aggregate folds, broadcast
    centroids); the oracle replays the identical trajectory in
    exploded relational form. Per-iteration centroid rounding makes
    the trajectory engine-portable, so this is an exact value check
    of an iterative ML algorithm, not rows-only."""
    from ..operators.clustering import kmeans_lloyd

    e = _t(spark, sf_dir, "embeddings")
    return kmeans_lloyd(e, k=4, iterations=3)


@register(
    "fuzzy_name_pairs",
    oracle="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM part a JOIN part b
      ON substr(a.p_name, 1, 8) = substr(b.p_name, 1, 8)
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 6
    """,
    tags=("dedup", "fuzzy", "join"),
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs with prefix blocking — the fuzzy
    sibling of the dedup family. The 8-char-prefix equi-join is the
    blocking key (candidate pairs shuffle on it, like MinHash bands);
    levenshtein runs only on candidates, never all-pairs. At 100 TB
    the blocking key is what keeps this from being a cross join."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 8).alias("blk"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 8).alias("blk"),
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("dist") <= 6)
        .select("key_a", "key_b", "dist")
    )


@register(
    "revenue_share",
    oracle="""
    WITH nrev AS (
      SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS rev
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name,
           round(rev, 2) AS revenue,
           round(rev / sum(rev) OVER (), 6) AS share,
           CAST(rank() OVER (ORDER BY rev DESC, n_name) AS INT) AS rnk
    FROM nrev
    """,
    tags=("window", "agg"),
)
def q_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's share of total revenue via an
    empty-frame window sum. The window input is the POST-aggregate
    relation (|nations| rows), so the unpartitioned window is cheap at
    any scale — the pattern to teach is aggregate-then-window, never
    window-over-fact-table."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    nrev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("rev"), F.asc("n_name"))
    return nrev.select(
        "n_name",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") / F.sum("rev").over(w_all), 6).alias("share"),
        F.rank().over(w_rank).cast("int").alias("rnk"),
    )


@register(
    "warp_tiled",
    oracle=_NDVI_SQL
    + """
    , dst AS (
      SELECT s.scene_id, i AS y, j AS x,
             (i + 0.5) * 1.25 - 0.5 AS sy, (j + 0.5) * 1.25 - 0.5 AS sx
      FROM (SELECT DISTINCT scene_id FROM nv) s
      CROSS JOIN (SELECT unnest(generate_series(0, 79)) AS i)
      CROSS JOIN (SELECT unnest(generate_series(0, 79)) AS j)
    ),
    c AS (
      SELECT scene_id, y, x,
             CAST(floor(sy) AS INT) AS y0, CAST(floor(sx) AS INT) AS x0,
             sy - floor(sy) AS wy, sx - floor(sx) AS wx
      FROM dst
    )
    SELECT c.scene_id, c.y, c.x,
           round(CAST(CAST(v00.ndvi AS REAL) AS DOUBLE) * (1 - c.wy) * (1 - c.wx)
               + CAST(CAST(v01.ndvi AS REAL) AS DOUBLE) * (1 - c.wy) * c.wx
               + CAST(CAST(v10.ndvi AS REAL) AS DOUBLE) * c.wy * (1 - c.wx)
               + CAST(CAST(v11.ndvi AS REAL) AS DOUBLE) * c.wy * c.wx, 6) AS v
    FROM c
    JOIN nv v00 ON v00.scene_id = c.scene_id AND v00.y = c.y0     AND v00.x = c.x0
    JOIN nv v01 ON v01.scene_id = c.scene_id AND v01.y = c.y0     AND v01.x = c.x0 + 1
    JOIN nv v10 ON v10.scene_id = c.scene_id AND v10.y = c.y0 + 1 AND v10.x = c.x0
    JOIN nv v11 ON v11.scene_id = c.scene_id AND v11.y = c.y0 + 1 AND v11.x = c.x0 + 1
    WHERE v00.ndvi IS NOT NULL AND v01.ndvi IS NOT NULL
      AND v10.ndvi IS NOT NULL AND v11.ndvi IS NOT NULL
    """,
    tags=("ndvi", "raster", "warp", "tiled"),
)
def q_warp_tiled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The halo-exchange tiled warp (warp_bilinear_tiled) against the
    same 4-neighbor-join SQL formulation as `warp_bilinear` —
    100×100 → 80×80 (scale 1.25, halo=22 on 32-px tiles), so BOTH
    warp execution strategies are oracle-checked, not just
    equality-checked against each other. Tile payloads are float32,
    so the oracle replays the quantization (CAST … AS REAL) before
    the double-precision interpolation."""
    from ..operators.raster import pixels_to_tiles
    from ..operators.warp import warp_bilinear_tiled

    nv = _ndvi_pixels_df(spark, sf_dir)
    tiles = pixels_to_tiles(
        nv.withColumn("band", F.lit("ndvi")), tile=32, value_col="ndvi"
    ).drop("band")
    out = warp_bilinear_tiled(tiles, out_height=80, out_width=80, scale_y=1.25, scale_x=1.25)
    return out.select("scene_id", "y", "x", F.round("v", 6).alias("v"))


@register(
    "having_global_share",
    oracle="""
    SELECT p_type,
           round(sum(l_extendedprice), 2) AS type_value
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    HAVING sum(l_extendedprice) >
           (SELECT sum(l_extendedprice) * 0.04
            FROM lineitem JOIN part ON l_partkey = p_partkey)
    """,
    tags=("agg", "subquery"),
)
def q_having_global_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global scalar subquery. The
    scalar aggregates once and broadcasts as a 1-row cross join — the
    grouped relation is NOT rescanned per group. (Spark plans the
    uncorrelated scalar subquery exactly this way.)"""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"]).select("p_type", "l_extendedprice")
    total = joined.agg((F.sum("l_extendedprice") * 0.04).alias("threshold"))
    return (
        joined.groupBy("p_type")
        .agg(F.sum("l_extendedprice").alias("tv"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("tv") > F.col("threshold"))
        .select("p_type", F.round("tv", 2).alias("type_value"))
    )


@register(
    "not_in_null_semantics",
    oracle="""
    SELECT variant, CAST(n AS BIGINT) AS n FROM (
      SELECT 'clean' AS variant, count(*) AS n
      FROM supplier
      WHERE s_suppkey NOT IN (
        SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
      UNION ALL
      SELECT 'null_poisoned' AS variant, count(*) AS n
      FROM supplier
      WHERE s_suppkey NOT IN (
        SELECT CASE WHEN l_quantity > 49 THEN l_suppkey END FROM lineitem))
    """,
    tags=("antijoin", "null"),
)
def q_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN three-valued-logic semantics — the classic engine
    correctness trap: a single NULL in the subquery makes NOT IN
    return UNKNOWN for every row (count 0), while the null-free
    variant is a plain anti-join. Expressed DataFrame-first as a
    left_anti join plus an explicit null-existence guard — the
    rewrite every optimizer performs for null-aware anti joins."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")

    clean_keys = li.filter(F.col("l_quantity") > 49).select(
        F.col("l_suppkey").alias("k")
    )
    n_clean = s.join(clean_keys, s["s_suppkey"] == clean_keys["k"], "left_anti").count()

    poisoned = li.select(
        F.when(F.col("l_quantity") > 49, F.col("l_suppkey")).alias("k")
    )
    has_null = poisoned.filter(F.col("k").isNull()).limit(1).count() > 0
    n_poisoned = (
        0
        if has_null
        else s.join(poisoned, s["s_suppkey"] == poisoned["k"], "left_anti").count()
    )
    return s.sparkSession.createDataFrame(
        [("clean", n_clean), ("null_poisoned", n_poisoned)], "variant string, n bigint"
    )


@register(
    "exists_not_exists",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_custs
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000.0)
    GROUP BY c.c_mktsegment
    """,
    tags=("semijoin", "antijoin"),
)
def q_exists_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined EXISTS / NOT EXISTS (TPC-H Q21/Q22 shape): customers
    with at least one order but no order above the threshold —
    left_semi then left_anti on the same dimension, both hash joins
    on the customer key, pipelined in one plan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000.0)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .join(big, F.col("c_custkey") == big["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_custs"))
    )


_AOI_RING_B = [(55.0, 10.0), (95.0, 20.0), (90.0, 70.0), (60.0, 92.0), (50.0, 45.0)]


def _multi_aoi_oracle() -> str:
    from ..functions.geo import point_in_polygon_sql, polygon_bbox

    parts = []
    for aoi_id, ring in ((1, _AOI_RING), (2, _AOI_RING_B)):
        minx, miny, maxx, maxy = polygon_bbox(ring)
        pred = point_in_polygon_sql("x", "y", ring)
        parts.append(
            f"""SELECT scene_id, {aoi_id} AS aoi_id,
             count(*) AS n_pixels,
             round(avg(CAST(CAST(ndvi AS REAL) AS DOUBLE)), 6) AS mean_ndvi
      FROM nv
      WHERE x BETWEEN {minx!r} AND {maxx!r} AND y BETWEEN {miny!r} AND {maxy!r}
        AND {pred} AND ndvi IS NOT NULL
      GROUP BY scene_id"""
        )
    union = "\n      UNION ALL\n      ".join(parts)
    return _NDVI_SQL + f"""
    SELECT * FROM (
      {union}
    )
    """


@register("multi_aoi_clip", oracle=None, tags=("ndvi", "clip", "multi-aoi"))
def q_multi_aoi_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A1 over MANY AOIs in one pass (tile_clip_stats_multi) — the
    reference's ndvi_clipped product shape (UNIQUE(full_id, aoi_id),
    002_schema.sql). Tile payloads are float32, so the oracle clips
    per-pixel on REAL-quantized values."""
    from ..operators.raster import pixels_to_tiles, tile_clip_stats_multi

    nv = _ndvi_pixels_df(spark, sf_dir)
    tiles = pixels_to_tiles(
        nv.withColumn("band", F.lit("ndvi")), tile=32, value_col="ndvi"
    ).drop("band")
    out = tile_clip_stats_multi(tiles, [(1, _AOI_RING), (2, _AOI_RING_B)])
    return out.select(
        "scene_id",
        F.col("aoi_id").cast("int").alias("aoi_id"),
        F.col("n_in_aoi").alias("n_pixels"),
        F.round("mean_ndvi", 6).alias("mean_ndvi"),
    )


def _finalize_multi_aoi_oracle() -> None:
    spec = REGISTRY["multi_aoi_clip"]
    REGISTRY["multi_aoi_clip"] = QuerySpec(
        spec.builder, _multi_aoi_oracle(), spec.headline, spec.tags
    )


_finalize_multi_aoi_oracle()


@register(
    "array_functions",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS toks
      FROM documents WHERE doc_id <= 40)
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS INT) AS n_unique,
           CAST(len(list_intersect(toks, ['the','and','of','to','in'])) AS INT)
             AS n_stop_kinds,
           CAST(len(list_filter(toks, x -> length(x) > 5)) AS INT) AS n_long,
           array_to_string(list_slice(list_sort(list_distinct(toks)), 1, 3), '-')
             AS first3
    FROM t
    """,
    tags=("array", "hof"),
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function surface (§2.8 array family,
    extended): distinct, intersect, lambda filter, sort, slice, join —
    all JVM-side codegen, no explode and no UDF, so per-row array work
    never leaves Tungsten."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") <= 40)
    toks = F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    stop = F.array(*[F.lit(w) for w in ("the", "and", "of", "to", "in")])
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size(F.array_distinct("toks")).cast("int").alias("n_unique"),
        F.size(F.array_intersect("toks", stop)).cast("int").alias("n_stop_kinds"),
        F.size(F.filter("toks", lambda x: F.length(x) > 5)).cast("int").alias("n_long"),
        F.array_join(F.slice(F.sort_array(F.array_distinct("toks")), 1, 3), "-").alias(
            "first3"
        ),
    )


@register(
    "decimal_exact_sums",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS exact_total,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS exact_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("decimal", "agg"),
)
def q_decimal_exact_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation — no FP rounding anywhere: sums run
    in fixed-point and the result compares as a STRING, so the match
    is exact to the last cent regardless of accumulation order. (The
    float queries need round(); decimal is how a money pipeline
    avoids needing it.)"""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("exact_total"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("string").alias("exact_qty"),
        F.count("*").alias("n"),
    )


@register(
    "events_asof_forward",
    oracle="""
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS next_orderkey,
           strftime(o.o_orderdate + INTERVAL 25 YEAR, '%Y-%m-%d') AS next_date
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate + INTERVAL 25 YEAR >= e.ts
     AND o.o_orderdate + INTERVAL 25 YEAR <= e.ts + INTERVAL 90 DAY
    QUALIFY row_number() OVER (
      PARTITION BY e.event_id
      ORDER BY o.o_orderdate ASC NULLS LAST, o.o_orderkey DESC NULLS LAST
    ) = 1
    """,
    tags=("events", "asof", "forward"),
)
def q_events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (pandas merge_asof parity): each
    event matched to the user's NEXT order within 90 days, or NULLs.
    Same one-shuffle union-trick plan as the backward direction — the
    stream just sorts time-descending; the tolerance is a free
    post-window predicate (operators/asof.py)."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 25 YEARS")).alias("o_ts"),
        "o_orderkey",
    )
    joined = asof_join(
        e,
        o,
        key="user_id",
        left_ts="ts",
        right_ts="o_ts",
        right_cols=("o_orderkey", "o_ts"),
        tie_break="o_orderkey",
        direction="forward",
        tolerance_seconds=90 * 24 * 3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.date_format("o_ts", "yyyy-MM-dd").alias("next_date"),
    )


@register(
    "interval_merge_coverage",
    oracle="""
    WITH iv AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS e
      FROM orders),
    flagged AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > max(e) OVER (
                    PARTITION BY o_custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(e) OVER (
                    PARTITION BY o_custkey ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS new_iv
      FROM iv),
    islands AS (
      SELECT o_custkey, s, e,
             sum(new_iv) OVER (
               PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged),
    merged AS (
      SELECT o_custkey, island, min(s) AS ms, max(e) AS me
      FROM islands GROUP BY o_custkey, island)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(date_diff('day', ms, me)) AS BIGINT) AS covered_days
    FROM merged GROUP BY o_custkey
    """,
    tags=("window", "intervals"),
)
def q_interval_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-interval merge (temporal coverage): each order opens
    a 30-day window; per customer, merge overlaps and report merged
    interval count + total covered days. The islands idiom with a
    RUNNING MAX of interval ends (plain lag is wrong when an earlier
    interval outlasts a later one) — one shuffle on the customer key,
    two window passes over it."""
    o = _t(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("e"),
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_iv",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_iv").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = islands.groupBy("o_custkey", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        F.sum(F.datediff("me", "ms")).cast("bigint").alias("covered_days"),
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY n_name
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier volume — the 6-table join with the
    EXTRA non-key predicate c_nationkey = s_nationkey riding the
    supplier join (the part that breaks naive join reordering).
    Region/nation broadcast; the fact-side joins hash on the keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .filter(
            (F.col("r_name") == "ASIA")
            & F.col("o_orderdate")
            .cast("date")
            .between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q6_forecast",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter", "agg"),
)
def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — every predicate pushes
    to the parquet reader, the whole query is one codegen span with a
    scalar result. The canonical 'is pushdown working' probe."""
    li = _t(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    return li.filter(
        (d >= F.lit("1995-01-01").cast("date"))
        & (d < F.lit("1996-01-01").cast("date"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q10_returned",
    oracle="""
    SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(max(c_acctbal), 2) AS acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def q_tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item reporting — join chain, grouped
    revenue, deterministic top-20 (TakeOrderedAndProject, no global
    sort materialization)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .filter(
            (F.col("l_returnflag") == "R")
            & F.col("o_orderdate")
            .cast("date")
            .between(F.lit("1995-01-01").cast("date"), F.lit("1995-12-31").cast("date"))
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q14_promo",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount) END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1995-09-01' AND DATE '1995-09-30'
    """,
    tags=("tpch", "conditional"),
)
def q_tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promotion revenue share — conditional aggregation
    ratio in one pass over the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev)
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .filter(
            F.col("l_shipdate")
            .cast("date")
            .between(F.lit("1995-09-01").cast("date"), F.lit("1995-09-30").cast("date"))
        )
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count("*").alias("n"),
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    GROUP BY n1.n_name, n2.n_name, 3
    """,
    tags=("tpch", "join", "self-join"),
)
def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: volume shipping — the nation DIMENSION joins twice
    under different roles (supplier's vs customer's nation) with a
    symmetric pair predicate. Both roles broadcast; the disjunctive
    pair filter evaluates post-join, codegen-side."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        s.join(li, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .filter(
            pair
            & F.col("l_shipdate")
            .cast("date")
            .between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).cast("int").alias("l_year"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "disjunctive"),
)
def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-arm predicate spanning BOTH
    join sides — the optimizer must still push the single-side
    implications (p_brand ∈ {...}, p_size ≤ 35, l_quantity ≤ 30) below
    the join even though the full OR can only evaluate above it."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(p, p["p_partkey"] == li["l_partkey"])
        .filter(arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           round(o_totalprice, 2) AS total,
           sum(l_quantity) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 210)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY total DESC, o_orderkey LIMIT 50
    """,
    tags=("tpch", "having", "semijoin"),
)
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: large-volume orders — grouped HAVING produces the
    qualifying key set, which semi-joins back to the detail before the
    reporting join/aggregate. The IN-subquery becomes a left_semi hash
    join on the order key; the qualifying set is small, so AQE
    broadcasts it."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 210)
        .select("l_orderkey")
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"], "left_semi")
        .join(c, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("o_date"),
            F.round("o_totalprice", 2).alias("total"),
            "sum_qty",
        )
        .orderBy(F.desc("total"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS o_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1996-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def q_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: shipping priority — asymmetric date predicates on the
    two fact tables (ordered before the cutoff, shipped after it), both
    pushed below the join; top-10 revenue via TakeOrderedAndProject.
    (o_shippriority doesn't exist in this schema; o_orderpriority
    stands in as the carried-through reporting column.)"""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1996-03-15").cast("date")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o.filter(F.col("o_orderdate").cast("date") < cutoff), c["c_custkey"] == o["o_custkey"])
        .join(li.filter(F.col("l_shipdate").cast("date") > cutoff), li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) t
    GROUP BY o_year
    """,
    tags=("tpch", "join", "conditional"),
)
def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the deepest join tree in the
    suite (8 relations, nation twice under different roles), reduced to
    a conditional-aggregate ratio per year. Dimensions broadcast; the
    customer-side nation restricts via region while the supplier-side
    nation feeds the numerator predicate."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    r = _t(spark, sf_dir, "region")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.filter(F.col("p_type") == "STANDARD")
        .join(li, p["p_partkey"] == li["l_partkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(
            o.filter(
                F.col("o_orderdate")
                .cast("date")
                .between(F.lit("1995-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
            ),
            li["l_orderkey"] == o["o_orderkey"],
        )
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), F.col("n1_rkey") == r["r_regionkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
        .groupBy(F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) t
    GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "agg"),
)
def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year. This
    schema has no partsupp/ps_supplycost, so cost is the deterministic
    stand-in 0.1 * p_retailprice * l_quantity — preserving the shape
    (substring LIKE on part, 5-way join, two-level rollup key) without
    the missing table. The '%red%' contains-filter cannot push to the
    scan as a range, but column pruning still holds the scan to 3
    part columns."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.filter(F.col("p_name").like("%red%"))
        .join(li, p["p_partkey"] == li["l_partkey"])
        .join(s, s["s_suppkey"] == li["l_suppkey"])
        .join(o, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


@register(
    "tpch_q12_ship_latency",
    oracle="""
    SELECT ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN datediff('day', CAST(o_orderdate AS DATE),
                                CAST(l_shipdate AS DATE)) > 60
                  THEN 'SLOW' ELSE 'FAST' END AS ship_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE CAST(l_shipdate AS DATE)
            BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
    ) t
    GROUP BY ship_bucket
    """,
    tags=("tpch", "conditional"),
)
def q_tpch_q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix by shipping mode. l_shipmode does
    not exist here, so the mode is a derived latency bucket
    (order→ship gap over/under 60 days) — same structure: join, CASE
    bucketing, two complementary conditional counts per bucket."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) > 60,
        "SLOW",
    ).otherwise("FAST")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(
            F.col("l_shipdate")
            .cast("date")
            .between(F.lit("1996-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
        )
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t
    GROUP BY c_count
    """,
    tags=("tpch", "outer-join", "agg"),
)
def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — LEFT OUTER join
    with a predicate INSIDE the join condition (customers keep a row
    even when every order is filtered away; count(o_orderkey) then
    counts only non-null matches), followed by a second aggregation
    over the first's result. Two shuffles, both on keys we chose."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "1-URGENT"),
            "left_outer",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("bigint").alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE)
            BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier — a derived revenue relation consumed
    twice (once as the join input, once reduced to its max). The
    derived table is tiny (|suppliers| rows), so the scalar max arrives
    via broadcast and the re-derivation is a cheap re-aggregation of
    the same shuffle output, not a second lineitem pass."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            F.col("l_shipdate")
            .cast("date")
            .between(F.lit("1996-01-01").cast("date"), F.lit("1996-03-31").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        s.join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .join(F.broadcast(best), F.col("total_revenue") == F.col("best_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "distinct", "antijoin"),
)
def q_tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier diversity per (brand, type, size) —
    negated predicates, a NOT-IN exclusion list (negative-balance
    suppliers stand in for the missing complaint-comment filter; the
    key side is null-free so NOT IN ≡ anti-join), and COUNT(DISTINCT)
    over the surviving pairs. partsupp doesn't exist; lineitem is the
    part↔supplier incidence relation."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        p.filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").like("PROMO%")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .join(li, p["p_partkey"] == li["l_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_quantity",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_type = 'MEDIUM'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey)
    """,
    tags=("tpch", "subquery", "agg"),
)
def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity-order revenue — a correlated scalar
    subquery (per-part average quantity) decorrelated into a grouped
    aggregate joined back to the detail. The per-part averages relation
    has |parts| rows → broadcast; quantities are integral doubles so
    the 0.2*avg threshold compares identically across engines."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(
            p.filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")),
            p["p_partkey"] == li["l_partkey"],
        )
        .join(F.broadcast(avg_qty), F.col("ap_partkey") == li["l_partkey"])
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


@register(
    "tpch_q20_part_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             sum(l_quantity) AS total_qty,
             sum(CASE WHEN CAST(l_shipdate AS DATE)
                           BETWEEN DATE '1995-01-01' AND DATE '1995-01-31'
                      THEN l_quantity ELSE 0 END) AS qty_win
      FROM lineitem GROUP BY l_suppkey, l_partkey)
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%' AND qty_win > 0.5 * total_qty)
    ORDER BY s_name
    """,
    tags=("tpch", "semijoin", "subquery"),
)
def q_tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers with promotable red-part stock. No
    partsupp/ps_availqty here, so the availability predicate becomes
    'shipped more than half their all-time quantity of that part in
    January 1995' — same nested structure: grouped quantity rollup → prefix
    LIKE part filter → IN-list semi-join up to the supplier dimension.
    Quantities are integral, so the half-threshold compare is exact."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    in_win = (
        F.col("l_shipdate")
        .cast("date")
        .between(F.lit("1995-01-01").cast("date"), F.lit("1995-01-31").cast("date"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.sum(F.when(in_win, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty_win"),
    )
    promotable = (
        shipped.join(
            F.broadcast(p.filter(F.col("p_name").like("red%")).select("p_partkey")),
            shipped["l_partkey"] == F.col("p_partkey"),
        )
        .filter(F.col("qty_win") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(promotable, s["s_suppkey"] == promotable["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
    tags=("tpch", "exists", "antijoin"),
)
def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame supplier — the suite's hardest
    correlation pattern: one EXISTS and one NOT EXISTS against the same
    fact table, each correlated on the order key with a supplier
    INEQUALITY rider. No receipt/commit dates in this schema, so
    l_returnflag='R' marks the 'late' line. Both subqueries become hash
    semi/anti joins on l_orderkey; the <> rider rides the join
    condition, not a post-filter, so no row explosion."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_returnflag")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    return (
        l1.filter(F.col("l_returnflag") == "R")
        .join(
            l2,
            (l1["l_orderkey"] == F.col("l2_orderkey"))
            & (l1["l_suppkey"] != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (l1["l_orderkey"] == F.col("l3_orderkey"))
            & (l1["l_suppkey"] != F.col("l3_suppkey")),
            "left_anti",
        )
        .join(o.filter(F.col("o_orderstatus") == "F"), l1["l_orderkey"] == o["o_orderkey"])
        .join(s, s["s_suppkey"] == l1["l_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "tpch_q22_dormant_balance",
    oracle="""
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE c_nationkey % 10 IN (1, 2, 3, 4, 5)
        AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0
                           AND c_nationkey % 10 IN (1, 2, 3, 4, 5))
    ) t
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
    GROUP BY cntrycode
    """,
    tags=("tpch", "antijoin", "subquery"),
)
def q_tpch_q22_dormant_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance dormant customers. No c_phone in
    this schema, so the country code derives from c_nationkey % 10;
    every customer has SOME order in this dataset, so dormancy means
    'no order since 2000-01-01'. Structure preserved: uncorrelated
    scalar average (broadcast), derived-code IN filter, NOT EXISTS →
    anti-join against a date-filtered orders scan, grouped rollup."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    code = (F.col("c_nationkey") % 10).alias("cntrycode")
    eligible = c.filter((F.col("c_nationkey") % 10).isin(1, 2, 3, 4, 5))
    avg_bal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate").cast("date") >= F.lit("2000-01-01").cast("date"))
    return (
        eligible.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, eligible["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy(code)
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "char_entropy_quality",
    oracle="""
    WITH chars AS (
      SELECT doc_id, source, substr(text, CAST(i AS INT), 1) AS ch
      FROM documents, unnest(generate_series(1, length(text))) AS t(i)
    ), pc AS (
      SELECT doc_id, source, ch, count(*) AS c FROM chars GROUP BY 1, 2, 3
    ), ent AS (
      SELECT doc_id, source,
             log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
      FROM pc GROUP BY 1, 2
    )
    SELECT source,
           round(avg(h), 5) AS avg_entropy,
           round(min(h), 5) AS min_entropy,
           round(max(h), 5) AS max_entropy,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM ent GROUP BY source
    """,
    tags=("text", "curation", "documents"),
)
def q_char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document, summarized per
    source — the curation signal that separates natural text from
    boilerplate/garbage (low entropy = repeated filler, high = random
    bytes). Single-pass identity H = log2(n) − Σc·log2(c)/n over
    per-(doc, char) counts, so no per-char probability join is needed.

    Scale: the char explode is |total_chars| rows, but the first
    groupBy partial-aggregates map-side down to ≤|alphabet| rows per
    doc per task before any shuffle; the per-doc and per-source
    reductions ride two more tiny exchanges. At 100 TB this is the
    same shape as token counting: shuffle bytes ∝ docs × alphabet,
    not corpus size."""
    d = _t(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        "source",
        "text",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
    ).select("doc_id", "source", F.expr("substring(text, i, 1)").alias("ch"))
    pc = chars.groupBy("doc_id", "source", "ch").agg(F.count("*").alias("c"))
    ent = pc.groupBy("doc_id", "source").agg(
        (
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("h")
    )
    return ent.groupBy("source").agg(
        F.round(F.avg("h"), 5).alias("avg_entropy"),
        F.round(F.min("h"), 5).alias("min_entropy"),
        F.round(F.max("h"), 5).alias("max_entropy"),
        F.count("*").cast("bigint").alias("n_docs"),
    )


@register(
    "pareto_skyline",
    oracle="""
    WITH pts AS (
      SELECT p_retailprice, p_size, CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    )
    SELECT p_retailprice, p_size, n_parts FROM pts a
    WHERE NOT EXISTS (
      SELECT 1 FROM pts b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    """,
    tags=("skyline", "window"),
)
def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline (minimize price, maximize size): parts no
    other part beats on both axes. The oracle is the O(n²) NOT-EXISTS
    self-join definition; the Spark plan is the O(n log n) sweep — sort
    by (price asc, size desc), a point survives iff its size strictly
    exceeds the running max over all preceding (= no cheaper-or-equal
    point with ≥ size dominates it; exact-duplicate points were already
    merged by the distinct groupBy).

    Scale: a global-order window would single-partition, so stage 1
    runs the same sweep per input partition (local skylines — a sound
    prefilter, since global skyline ⊆ every superset's skyline) and
    only the few local survivors reach the global sweep. This is the
    standard distributed-skyline recipe and survives 100× data: the
    global pass sees |partitions| × |skyline|-ish rows, not |input|."""
    from ..operators.stats import pareto_skyline_2d

    p = _t(spark, sf_dir, "part")
    pts = p.groupBy("p_retailprice", "p_size").agg(
        F.count("*").cast("bigint").alias("n_parts")
    )
    return pareto_skyline_2d(pts, "p_retailprice", "p_size").select(
        "p_retailprice", "p_size", "n_parts"
    )


@register(
    "welch_ttest",
    oracle="""
    WITH g AS (
      SELECT event_type, avg(value) AS m, var_samp(value) AS v,
             count(*) AS n
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    )
    SELECT round(a.m - b.m, 6) AS mean_diff,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6) AS t_stat,
           round(pow(a.v / a.n + b.v / b.n, 2)
                 / (pow(a.v / a.n, 2) / (a.n - 1)
                    + pow(b.v / b.n, 2) / (b.n - 1)), 4) AS dof,
           CAST(a.n AS BIGINT) AS n_click,
           CAST(b.n AS BIGINT) AS n_purchase
    FROM g a, g b
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    """,
    tags=("stats", "events"),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event cohorts
    (A/B-test primitive): per-group moments in one distributed hash
    aggregate, then the t statistic and Welch–Satterthwaite degrees of
    freedom as driver-light scalar arithmetic over two 1-row sides
    (broadcast cross join — no data movement). The whole test costs
    one scan + one 2-row shuffle at any scale."""
    e = _t(spark, sf_dir, "events")
    g = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.avg("value").alias("m"),
            F.var_samp("value").alias("v"),
            F.count("*").alias("n"),
        )
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("m").alias("ma"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = g.filter(F.col("event_type") == "purchase").select(
        F.col("m").alias("mb"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    j = a.crossJoin(F.broadcast(b))
    sea = F.col("va") / F.col("na")
    seb = F.col("vb") / F.col("nb")
    return j.select(
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(sea + seb), 6).alias("t_stat"),
        F.round(
            F.pow(sea + seb, F.lit(2))
            / (
                F.pow(sea, F.lit(2)) / (F.col("na") - 1)
                + F.pow(seb, F.lit(2)) / (F.col("nb") - 1)
            ),
            4,
        ).alias("dof"),
        F.col("na").cast("bigint").alias("n_click"),
        F.col("nb").cast("bigint").alias("n_purchase"),
    )


@register(
    "regr_diagnostics",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
           round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
           round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("stats", "agg"),
)
def q_regr_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full linear-regression aggregate family (slope, intercept, R²,
    pair count, axis means) per return flag — the same moment-sketch
    machinery as `ndvi_trend`'s regr_slope, exercised as a complete
    diagnostics panel. Single-pass partial/final aggregates: shuffle
    rows = |groups| regardless of input size."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 4).alias(
            "intercept"
        ),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.expr("regr_count(l_extendedprice, l_quantity)").cast("bigint").alias(
            "n_pairs"
        ),
        F.round(F.expr("regr_avgx(l_extendedprice, l_quantity)"), 4).alias("avg_qty"),
        F.round(F.expr("regr_avgy(l_extendedprice, l_quantity)"), 4).alias(
            "avg_price"
        ),
    )


@register(
    "touch_attribution",
    oracle="""
    SELECT user_id,
           arg_min(event_type, ts) AS first_touch,
           arg_max(event_type, ts) AS last_touch,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CASE WHEN event_type = 'purchase' THEN value
                          ELSE 0 END), 4) AS purchase_value
    FROM events GROUP BY user_id
    """,
    tags=("events", "agg"),
)
def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution per user: min_by/max_by pick the
    earliest and latest event type in ONE hash aggregate — no window,
    no sort, no per-user history shuffle (the win over the row_number
    formulation at scale: arg-extremes are associative partial aggs).
    (user_id, ts) is unique in this feed, so the arg picks are
    deterministic; a production feed would tie-break on event_id."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min_by("event_type", "ts").alias("first_touch"),
        F.max_by("event_type", "ts").alias("last_touch"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        F.count("*").cast("bigint").alias("n_events"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ),
            4,
        ).alias("purchase_value"),
    )


@register(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
           round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k,
           CAST(count(*) FILTER (WHERE CAST(props->>'$.k' AS INT) > 50)
                AS BIGINT) AS n_big,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("events", "json", "variant"),
)
def q_events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the open VARIANT type (Spark 4):
    `parse_json` shreds the props document once into Variant's binary
    encoding, and `variant_get` does typed path extraction JVM-side —
    no regexp, no full-schema `from_json`, and unknown/extra keys ride
    along untyped. This is the engine's STAC-properties idiom
    (SURVEY §1.1: properties MAP / assets STRUCT) done the modern way:
    at 100 TB the win over from_json is that shredding happens once
    per row regardless of how many paths are later extracted, and
    paths prune like columns."""
    e = _t(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count_if(k > 50).cast("bigint").alias("n_big"),
        F.count("*").alias("n"),
    )


@register(
    "doc_chunking_udtf",
    oracle="""
    WITH d AS (
      SELECT source,
             len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             t -> t <> '')) AS n_tok
      FROM documents),
    c AS (
      SELECT source, n_tok,
             CASE WHEN n_tok <= 64 THEN 1
                  ELSE CAST(ceil((n_tok - 64) / 48.0) AS INT) + 1 END AS n_chunks
      FROM d),
    ch AS (
      SELECT source, least(64, n_tok - i * 48) AS chunk_len
      FROM c CROSS JOIN (SELECT unnest(generate_series(0, 200)) AS i) g
      WHERE i < n_chunks)
    SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
           round(avg(chunk_len), 4) AS mean_chunk_len
    FROM ch GROUP BY source
    """,
    tags=("curation", "text", "udtf"),
)
def q_doc_chunking_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The doc_chunking inventory re-expressed through a Python table
    function (Spark 4 UDTF, arrow-optimized): `LATERAL chunk_spans(...)`
    plans as ArrowEvalPythonUDTF — the generator runs batch-vectorized
    next to the scan, no shuffle added, and the same DuckDB oracle as
    the pure-column formulation must hash-match. Two implementations ×
    one oracle = the representation-duality discipline applied to the
    UDTF surface."""
    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit("")
        )
    )
    d.select("source", n_tok.alias("n_tok")).createOrReplaceTempView(
        "_doc_tok_counts"
    )
    return spark.sql(
        """
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               round(avg(c.chunk_len), 4) AS mean_chunk_len
        FROM _doc_tok_counts d, LATERAL chunk_spans(d.n_tok, 64, 48) c
        GROUP BY d.source
        """
    )


@register(
    "ordered_string_agg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
               AS statuses,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "string"),
)
def q_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG (SQL:2023) with WITHIN GROUP ordering — the ordered
    string aggregation every report/export path needs. The explicit
    ORDER BY is what makes the result well-defined in a distributed
    engine: without it, concatenation order is partitioning-dependent
    in both Spark and DuckDB. Complements array_agg_sorted (array
    form) with the delimited-string form."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_osa_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, '|')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM _osa_orders GROUP BY o_orderpriority
        """
    )


@register(
    "ansi_safe_math",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE l_discount = 0) AS BIGINT)
               AS n_div_by_zero,
           round(avg(l_extendedprice
                     / nullif(CASE WHEN l_discount = 0 THEN 0
                                   ELSE l_quantity END, 0)), 4)
               AS avg_safe_ratio,
           CAST(count(*) AS BIGINT) AS n_overflow_null,
           CAST(count(*) AS BIGINT) AS n_oob_null
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("scalar", "ansi"),
)
def q_ansi_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The try_* error-safe expression family (ANSI-mode companion
    surface): try_divide → NULL on zero denominator, try_add → NULL on
    bigint overflow, try_element_at → NULL out of bounds — errors
    become data, the E1/E4 quarantine philosophy (SURVEY §2.10) at
    expression granularity, so one poisoned row can NEVER kill a
    100 TB job. The oracle encodes the identical semantics with
    NULLIF/CASE, pinning that try_* is sugar for well-defined NULL
    algebra, not engine-specific behavior."""
    li = _t(spark, sf_dir, "lineitem")
    safe_ratio = F.try_divide(
        F.col("l_extendedprice"),
        F.when(F.col("l_discount") == 0, F.lit(0.0)).otherwise(F.col("l_quantity")),
    )
    overflowed = F.try_add(
        F.lit(9223372036854775807).cast("bigint"),
        F.col("l_linenumber").cast("bigint"),  # ≥ 1 ⇒ always overflows
    )
    oob = F.try_element_at(F.split("l_linestatus", ""), F.lit(5))
    return li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count_if(safe_ratio.isNull()).cast("bigint").alias("n_div_by_zero"),
        F.round(F.avg(safe_ratio), 4).alias("avg_safe_ratio"),
        F.count_if(overflowed.isNull()).cast("bigint").alias("n_overflow_null"),
        F.count_if(oob.isNull()).cast("bigint").alias("n_oob_null"),
    )


@register(
    "recursive_org_depth",
    oracle="""
    WITH RECURSIVE org AS (
      SELECT c_custkey AS id, 0 AS depth FROM customer WHERE c_custkey = 1
      UNION ALL
      SELECT c.c_custkey, o.depth + 1
      FROM customer c
      JOIN org o ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = o.id
      WHERE c.c_custkey > 1
    )
    SELECT depth, CAST(count(*) AS BIGINT) AS n_customers
    FROM org GROUP BY depth
    """,
    tags=("recursive", "hierarchy"),
)
def q_recursive_org_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native recursive CTE (new in Spark 4): BFS depth over an
    implicit binary hierarchy (parent = ⌊key/2⌋) — the org-chart /
    bill-of-materials traversal shape. The IDENTICAL SQL text runs on
    both engines; Catalyst executes it as an iterative union loop, so
    each level is one distributed join against the previous frontier —
    the same plan the hand-rolled iterative operators
    (operators/graph.py, dedup_components) build manually, now
    optimizer-managed. Depth is bounded by log2(|customer|), well
    under the engine's recursion limit."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE org AS (
          SELECT c_custkey AS id, 0 AS depth FROM customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, o.depth + 1
          FROM customer c
          JOIN org o ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = o.id
          WHERE c.c_custkey > 1
        )
        SELECT depth, CAST(count(*) AS BIGINT) AS n_customers
        FROM org GROUP BY depth
        """
    )


@register(
    "weighted_sample_es",
    oracle="""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                 + 1) / 4294967296.0) / n_chars AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT lang, doc_id, n_chars, round(k, 6) AS sample_key
    FROM (
      SELECT *, row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id)
                AS rn
      FROM keyed
    ) WHERE rn <= 5
    """,
    tags=("curation", "sampling"),
)
def q_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    per-item key ln(u)/w with u derived bit-exactly from md5(doc_id)
    and w = n_chars; the top-k keys per stratum ARE a weighted sample
    — longer documents proportionally likelier, yet fully
    deterministic and engine-independent (the property that makes
    corpus mixing reproducible across reruns AND across engines; same
    discipline as hash_split/stratified_sample). One scan + one
    per-stratum top-k: at 100 TB this is a map-side key computation
    and a k-row-per-group shuffle, no global sort."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1
    ) / F.lit(4294967296.0)
    keyed = d.select(
        "lang", "doc_id", "n_chars", (F.log(u) / F.col("n_chars")).alias("k")
    )
    w = Window.partitionBy("lang").orderBy(F.col("k").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", "n_chars", F.round("k", 6).alias("sample_key"))
    )


@register(
    "dq_expectations",
    oracle="""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER (WHERE NOT coalesce(l_orderkey IS NOT NULL
                AND l_partkey IS NOT NULL, FALSE)) AS BIGINT) AS keys_not_null,
             CAST(count(*) FILTER (WHERE NOT coalesce(l_quantity > 0
                AND l_quantity <= 100, FALSE)) AS BIGINT) AS qty_in_range,
             CAST(count(*) FILTER (WHERE NOT coalesce(l_discount >= 0
                AND l_discount <= 0.1, FALSE)) AS BIGINT) AS discount_band,
             CAST(count(*) FILTER (WHERE NOT coalesce(l_returnflag IN
                ('A', 'N', 'R'), FALSE)) AS BIGINT) AS flag_domain,
             CAST(count(*) FILTER (WHERE NOT coalesce(l_extendedprice
                > l_quantity, FALSE)) AS BIGINT) AS price_exceeds_qty
      FROM lineitem
    )
    SELECT expectation, n_rows, n_violations,
           round(n_violations / n_rows, 6) AS violation_rate,
           n_violations = 0 AS passed
    FROM (
      SELECT n_rows, 'keys_not_null' AS expectation,
             keys_not_null AS n_violations FROM agg
      UNION ALL SELECT n_rows, 'qty_in_range', qty_in_range FROM agg
      UNION ALL SELECT n_rows, 'discount_band', discount_band FROM agg
      UNION ALL SELECT n_rows, 'flag_domain', flag_domain FROM agg
      UNION ALL SELECT n_rows, 'price_exceeds_qty', price_exceeds_qty FROM agg
    )
    """,
    tags=("curation", "quality"),
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (operators/curation.py::expect):
    five predicates over lineitem checked in ONE scan — nullability,
    range, domain, and cross-column rules — emitted as violation-count
    rows with pass flags. NULL predicate = violation (strict
    three-valued reading)."""
    li = _t(spark, sf_dir, "lineitem")
    return CUR.expect(
        li,
        {
            "keys_not_null": F.col("l_orderkey").isNotNull()
            & F.col("l_partkey").isNotNull(),
            "qty_in_range": (F.col("l_quantity") > 0)
            & (F.col("l_quantity") <= 100),
            "discount_band": (F.col("l_discount") >= 0)
            & (F.col("l_discount") <= 0.1),
            "flag_domain": F.col("l_returnflag").isin("A", "N", "R"),
            "price_exceeds_qty": F.col("l_extendedprice") > F.col("l_quantity"),
        },
    )


@register(
    "approx_distinct_bands",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS hll_within_5pct,
           TRUE AS p50_within_5pct
    FROM events GROUP BY event_type
    """,
    tags=("agg", "approx"),
)
def q_approx_distinct_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate tier made oracle-checkable: the sketches
    themselves differ across engines (approx_distinct_stats stays
    rows-only for that reason), but their ERROR BANDS are a contract —
    this query emits booleans asserting HLL++ (rsd 2%) lands within 5%
    of the exact distinct count and approx_percentile within 5% of the
    exact p50, and the oracle pins them to TRUE. A sketch regression
    (engine upgrade, accuracy change) now fails the hash-match gate,
    not just a unit test."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("hll"),
        F.percentile_approx("value", 0.5, 10000).alias("ap50"),
        F.expr("percentile(value, 0.5)").alias("ep50"),
    )
    return g.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("hll") - F.col("exact_users"))
            / F.col("exact_users")
            <= 0.05
        ).alias("hll_within_5pct"),
        (F.abs(F.col("ap50") - F.col("ep50")) / F.abs(F.col("ep50")) <= 0.05).alias(
            "p50_within_5pct"
        ),
    )


def _anchored_ndvi_tiles(spark: SparkSession, sf_dir: str):
    """Shared prelude of the focal queries: derived pixels densified
    with per-(band, tile) anchor cells (dn=0 → nodata NaN) so every
    tile of the 100×100 grid exists, deduped in ONE post-union
    groupBy-max — raw pixels and anchors merge in the same exchange
    instead of shuffling the wide relation twice — then packed and
    run through the NDVI tile kernel."""
    from ..operators.raster import pixels_to_tiles, tile_ndvi

    px = derived_pixels(spark, sf_dir)
    grid = spark.createDataFrame(
        [
            (b, ty * 32, tx * 32)
            for b in ("red", "nir")
            for ty in range(4)
            for tx in range(4)
        ],
        "band string, y int, x int",
    )
    anchors = (
        px.select("scene_id")
        .distinct()
        .crossJoin(F.broadcast(grid))
        .withColumn("dn", F.lit(0))
    )
    px_full = (
        px.unionByName(anchors)
        .groupBy("scene_id", "band", "y", "x")
        .agg(F.max("dn").alias("dn"))
    )
    return tile_ndvi(pixels_to_tiles(px_full, tile=32))


@register(
    "ndvi_focal_smooth",
    oracle=_NDVI_SQL
    + """
    , valid AS (SELECT scene_id, y, x, CAST(ndvi AS REAL) AS ndvi
                FROM nv WHERE ndvi IS NOT NULL),
    sm AS (
      SELECT v.scene_id, v.y + dy.d AS y, v.x + dx.d AS x,
             CAST(avg(v.ndvi) AS REAL) AS smooth
      FROM valid v
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      GROUP BY 1, 2, 3
    )
    SELECT scene_id, CAST(count(*) AS BIGINT) AS n_pixels,
           round(avg(smooth), 6) AS mean_smooth
    FROM sm WHERE y >= 0 AND x >= 0
    GROUP BY scene_id
    """,
    tags=("ndvi", "raster", "focal"),
)
def q_ndvi_focal_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3×3 NaN-aware focal smoothing through the halo-exchange focal
    operator (operators/focal.py): NDVI tiles exchange 1-px halos,
    each tile nanmeans its padded canvas, and the smoothed scene is
    summarized. The oracle states the identical semantics relationally
    — every valid pixel scatters into its 9 window-centers and each
    center averages its contributions (the scatter/gather dual of the
    window view, NaN-shrinking at borders included).

    The anchor union pins every (band, tile) of the 100×100 derived
    grid into existence with nodata cells (dn=0 → NaN), so the tile
    grid is dense and the focal output domain — every cell with ≥1
    valid neighbor — matches the oracle's dilation exactly even on a
    sparse scene."""
    from ..operators.focal import focal_map_tiled, focal_mean_3x3
    from ..operators.raster import tiles_to_pixels

    smooth = focal_map_tiled(
        _anchored_ndvi_tiles(spark, sf_dir), focal_mean_3x3, halo=1
    )
    return (
        tiles_to_pixels(smooth, value_name="smooth")
        .groupBy("scene_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pixels"),
            F.round(F.avg("smooth"), 6).alias("mean_smooth"),
        )
    )


@register(
    "ndvi_edge_stats",
    oracle=_NDVI_SQL
    + """
    , valid AS (SELECT scene_id, y, x, CAST(ndvi AS REAL) AS ndvi
                FROM nv WHERE ndvi IS NOT NULL),
    offs AS (
      SELECT dy.d AS dy, dx.d AS dx,
             -dx.d * (2 - abs(dy.d)) AS wx,
             -dy.d * (2 - abs(dx.d)) AS wy
      FROM (SELECT unnest([-1, 0, 1]) AS d) dy
      CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
      WHERE NOT (dy.d = 0 AND dx.d = 0)
    ),
    grad AS (
      SELECT v.scene_id, v.y + o.dy AS y, v.x + o.dx AS x,
             sum(v.ndvi * o.wx) AS gx, sum(v.ndvi * o.wy) AS gy,
             count(*) AS n_ring
      FROM valid v CROSS JOIN offs o
      GROUP BY 1, 2, 3
    )
    SELECT scene_id,
           CAST(count(*) AS BIGINT) AS n_pixels,
           round(avg(CAST(sqrt(gx * gx + gy * gy) AS REAL)), 6)
               AS mean_gradient,
           round(CAST(max(CAST(sqrt(gx * gx + gy * gy) AS REAL)) AS DOUBLE), 6)
               AS max_gradient
    FROM grad WHERE n_ring = 8
    GROUP BY scene_id
    """,
    tags=("ndvi", "raster", "focal"),
)
def q_ndvi_edge_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sobel gradient magnitude over NDVI through the same
    halo-exchange focal operator — the edge-detection / field-boundary
    product. NaN anywhere in the 8-cell ring voids the gradient
    (operators/focal.py::sobel_magnitude), which the oracle states as
    `n_ring = 8`: a center keeps its gradient iff all eight neighbors
    scattered into it. Scatter weights w(−dy,−dx) are the gathered
    Sobel coefficients ox·(2−|oy|) / oy·(2−|ox|). Same dense-grid
    anchor trick as ndvi_focal_smooth."""
    from ..operators.focal import focal_map_tiled, sobel_magnitude
    from ..operators.raster import tiles_to_pixels

    edges = focal_map_tiled(
        _anchored_ndvi_tiles(spark, sf_dir), sobel_magnitude, halo=1
    )
    return (
        tiles_to_pixels(edges, value_name="grad")
        .groupBy("scene_id")
        .agg(
            F.count("*").cast("bigint").alias("n_pixels"),
            F.round(F.avg("grad"), 6).alias("mean_gradient"),
            F.round(F.max("grad"), 6).alias("max_gradient"),
        )
    )


@register(
    "modal_value",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, count(*) AS n
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, l_quantity AS modal_qty, CAST(n AS BIGINT) AS n_rows
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) AS rk
      FROM c
    ) WHERE rk = 1
    """,
    tags=("agg", "stats"),
)
def q_modal_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent quantity per return flag with
    an explicit smallest-value tie-break — the native mode() aggregate
    breaks ties arbitrarily in BOTH engines, so a distributed pipeline
    that needs reproducible output must state the tie order. Count
    aggregate first (shuffle = |distinct pairs|), then a 1-row-per-
    group top-k window over the already-tiny counts relation."""
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count("*").alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity").asc()
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("modal_qty"),
            F.col("n").cast("bigint").alias("n_rows"),
        )
    )


@register(
    "multimodal_patch_budget",
    oracle="""
    WITH img AS (
      SELECT source,
             64 + doc_id % 192 AS h,
             64 + (doc_id * 3) % 192 AS w
      FROM documents
    ),
    p AS (
      SELECT source,
             CAST(ceil(h / 16.0) * ceil(w / 16.0) AS BIGINT) AS n_patches
      FROM img
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(n_patches) AS BIGINT) AS total_patches,
           CAST(max(n_patches) AS BIGINT) AS max_patches,
           round(avg(n_patches), 4) AS mean_patches,
           CAST(sum(CAST(floor(8192.0 / (n_patches + 1)) AS BIGINT))
                AS BIGINT) AS ctx8k_capacity
    FROM p GROUP BY source
    """,
    tags=("multimodal", "curation"),
)
def q_multimodal_patch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch budgeting over image metadata — the sequence-length
    planning a multimodal training pipeline runs BEFORE any decode:
    16×16 patch counts per image (dimensions derived deterministically
    from doc_id, standing in for the typed metadata columns of
    operators/multimodal.py::MEDIA_SCHEMA), aggregated into per-source
    token budgets and how many such images fit an 8k context each
    (+1 separator). Pure column arithmetic at scan speed — payload
    bytes are never touched, the property that makes budgeting a
    planning-time pass over a 100 TB media lake."""
    d = _t(spark, sf_dir, "documents")
    h = 64 + F.col("doc_id") % 192
    w = 64 + (F.col("doc_id") * 3) % 192
    n_patches = (F.ceil(h / 16.0) * F.ceil(w / 16.0)).cast("bigint")
    p = d.select("source", n_patches.alias("n_patches"))
    return p.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_images"),
        F.sum("n_patches").cast("bigint").alias("total_patches"),
        F.max("n_patches").cast("bigint").alias("max_patches"),
        F.round(F.avg("n_patches"), 4).alias("mean_patches"),
        F.sum(F.floor(8192.0 / (F.col("n_patches") + 1)).cast("bigint"))
        .cast("bigint")
        .alias("ctx8k_capacity"),
    )


@register(
    "timeband_matrix",
    oracle="""
    SELECT b1.n AS morning, b2.n AS midday, b3.n AS evening, b4.n AS night
    FROM (SELECT count(*) AS n FROM events
          WHERE extract(hour FROM ts) BETWEEN 6 AND 11) b1,
         (SELECT count(*) AS n FROM events
          WHERE extract(hour FROM ts) BETWEEN 12 AND 17) b2,
         (SELECT count(*) AS n FROM events
          WHERE extract(hour FROM ts) BETWEEN 18 AND 23) b3,
         (SELECT count(*) AS n FROM events
          WHERE extract(hour FROM ts) BETWEEN 0 AND 5) b4
    """,
    tags=("tpcds", "events"),
)
def q_timeband_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: N independent band counts cross-joined into
    one wide row. The oracle states it as four subquery scans (the
    spec's formulation); the Spark plan computes all four bands in ONE
    scan with conditional aggregates and a no-op cross join of 1-row
    sides — the rewrite every engine wants for this shape, worth 4× the
    scan I/O at any scale."""
    e = _t(spark, sf_dir, "events")
    hr = F.hour("ts")
    return (
        e.agg(
            F.count_if(hr.between(6, 11)).alias("morning"),
            F.count_if(hr.between(12, 17)).alias("midday"),
            F.count_if(hr.between(18, 23)).alias("evening"),
            F.count_if(hr.between(0, 5)).alias("night"),
        )
    )


@register(
    "order_size_bands",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, count(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CASE WHEN n_lines <= 2 THEN 'small'
                WHEN n_lines <= 4 THEN 'medium'
                ELSE 'large' END AS band,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(n_lines) AS BIGINT) AS n_lines_total,
           round(avg(n_lines), 4) AS avg_lines
    FROM sizes GROUP BY 1
    """,
    tags=("tpcds", "agg"),
)
def q_order_size_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape: aggregate-then-band — per-order line
    counts banded into a size distribution. Two hash aggregates; the
    second runs over |orders| rows already reduced by the first, and
    the CASE banding is free post-shuffle arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    band = (
        F.when(F.col("n_lines") <= 2, "small")
        .when(F.col("n_lines") <= 4, "medium")
        .otherwise("large")
    )
    return sizes.groupBy(band.alias("band")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("n_lines").cast("bigint").alias("n_lines_total"),
        F.round(F.avg("n_lines"), 4).alias("avg_lines"),
    )


@register(
    "cumulative_channel_compare",
    oracle="""
    WITH v AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    p AS (
      SELECT CAST(ts AS DATE) AS d, count(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    j AS (
      SELECT coalesce(v.d, p.d) AS d,
             coalesce(v.n, 0) AS nv, coalesce(p.n, 0) AS np
      FROM v FULL JOIN p ON v.d = p.d
    ),
    c AS (
      SELECT d, sum(nv) OVER (ORDER BY d) AS cum_views,
                sum(np) OVER (ORDER BY d) AS cum_purchases
      FROM j
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(cum_views AS BIGINT) AS cum_views,
           CAST(cum_purchases AS BIGINT) AS cum_purchases
    FROM c WHERE cum_purchases > cum_views
    """,
    tags=("tpcds", "window", "outer"),
)
def q_cumulative_channel_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape: two channels' daily series full-outer joined
    on date, cumulative sums over the merged calendar, keep the days
    one channel's running total leads the other. The full-outer +
    coalesce is the load-bearing part — a day missing from one channel
    must still advance the other's cumulative. The global-order window
    runs on |days| rows (post-aggregate), not events; a real deploy
    partitions the window by item/user exactly as Q51 does."""
    e = _t(spark, sf_dir, "events")
    d = F.col("ts").cast("date").alias("d")

    def daily(et):
        return (
            e.filter(F.col("event_type") == et)
            .groupBy(d)
            .agg(F.count("*").alias("n"))
        )

    v, p = daily("view"), daily("purchase")
    j = (
        v.withColumnsRenamed({"d": "vd", "n": "nv"})
        .join(
            p.withColumnsRenamed({"d": "pd", "n": "np"}),
            F.col("vd") == F.col("pd"),
            "full_outer",
        )
        .select(
            F.coalesce("vd", "pd").alias("d"),
            F.coalesce("nv", F.lit(0)).alias("nv"),
            F.coalesce("np", F.lit(0)).alias("np"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = j.select(
        "d",
        F.sum("nv").over(w).alias("cum_views"),
        F.sum("np").over(w).alias("cum_purchases"),
    )
    return c.filter(F.col("cum_purchases") > F.col("cum_views")).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("cum_views").cast("bigint").alias("cum_views"),
        F.col("cum_purchases").cast("bigint").alias("cum_purchases"),
    )


@register(
    "session_sequence_match",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, event_id, ts, event_type,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    ),
    seq AS (
      SELECT user_id, session_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS sig
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (WHERE regexp_matches(sig, 'v.*p'))
                AS BIGINT) AS n_view_then_purchase,
           CAST(count(*) FILTER (WHERE regexp_matches(sig, '(e)(.*e){2,}'))
                AS BIGINT) AS n_error_heavy
    FROM seq GROUP BY user_id
    """,
    tags=("events", "sequence", "window"),
)
def q_session_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-lite): sessionize,
    collapse each session to an ordered event-initial signature string
    (LISTAGG WITHIN GROUP — deterministic on the unique (ts, event_id)
    key), then count sessions whose signature matches a regex —
    view-before-purchase, and 3+ errors. Encoding order-sensitive
    patterns as strings turns sequence analytics into the engine's
    string machinery: one window pass + one agg, no self-joins per
    pattern step, patterns composable as plain regexes."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("_ssm_events")
    return spark.sql(
        """
        WITH g AS (
          SELECT user_id, event_id, ts, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL THEN 1
                      WHEN unix_micros(ts) - unix_micros(lag(ts) OVER w)
                           > 1800000000 THEN 1 ELSE 0 END AS new_session
          FROM _ssm_events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
          SELECT user_id, event_id, ts, event_type,
                 sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM g
        ),
        seq AS (
          SELECT user_id, session_id,
                 listagg(substr(event_type, 1, 1), '')
                   WITHIN GROUP (ORDER BY ts, event_id) AS sig
          FROM s GROUP BY user_id, session_id
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(count_if(sig RLIKE 'v.*p') AS BIGINT)
                 AS n_view_then_purchase,
               CAST(count_if(sig RLIKE '(e)(.*e){2,}') AS BIGINT)
                 AS n_error_heavy
        FROM seq GROUP BY user_id
        """
    )


@register(
    "events_asof_nearest",
    oracle="""
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS nearest_orderkey,
           strftime(o.o_orderdate + INTERVAL 25 YEAR, '%Y-%m-%d')
             AS nearest_date
    FROM events e
    LEFT JOIN orders o ON o.o_custkey = e.user_id
    QUALIFY row_number() OVER (
      PARTITION BY e.event_id
      ORDER BY abs(epoch_us(o.o_orderdate + INTERVAL 25 YEAR) - epoch_us(e.ts))
                 ASC NULLS LAST,
               CASE WHEN o.o_orderdate + INTERVAL 25 YEAR <= e.ts
                    THEN 0 ELSE 1 END ASC,
               CASE WHEN o.o_orderdate + INTERVAL 25 YEAR <= e.ts
                    THEN -o.o_orderkey ELSE o.o_orderkey END ASC
    ) = 1
    """,
    tags=("events", "asof"),
)
def q_events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of (pandas merge_asof direction='nearest'):
    each event matched to the user's CLOSEST order in time, either
    side, backward preferred on exact-distance ties. Still the
    one-shuffle union-trick plan — backward candidate from the
    preceding window, forward from the following window of the SAME
    sorted stream (operators/asof.py). The oracle is the O(n·m)
    QUALIFY definition with the matching per-side tie-breaks
    (backward keeps max orderkey, forward min)."""
    from ..operators.asof import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        (F.col("o_orderdate") + F.expr("INTERVAL 25 YEARS")).alias("o_ts"),
        "o_orderkey",
    )
    joined = asof_join(
        e,
        o,
        key="user_id",
        left_ts="ts",
        right_ts="o_ts",
        right_cols=("o_orderkey", "o_ts"),
        tie_break="o_orderkey",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("nearest_orderkey"),
        F.date_format("o_ts", "yyyy-MM-dd").alias("nearest_date"),
    )


@register(
    "zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents
    ),
    c AS (
      SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token
    ),
    r AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rk FROM c
    )
    SELECT round(regr_slope(ln(n), ln(rk)), 6) AS zipf_slope,
           round(regr_r2(ln(n), ln(rk)), 6) AS fit_r2,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(n) AS BIGINT) AS corpus_tokens
    FROM r
    """,
    tags=("text", "stats"),
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: rank words by frequency and
    regress ln(count) on ln(rank) — slope near −1 with high R² is the
    signature of natural language, and a corpus that DOESN'T fit is a
    curation red flag (template spam, generated filler). One token
    aggregate (map-side explode), one vocab-sized rank window, one
    moment-sketch regression — the expensive part is the same token
    count word_frequencies already pays; everything after runs on
    |vocab| rows."""
    d = _t(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    c = tokens.groupBy("token").agg(F.count("*").alias("n"))
    r = c.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("token")))
    )
    return r.agg(
        F.round(F.expr("regr_slope(ln(n), ln(rk))"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_r2(ln(n), ln(rk))"), 6).alias("fit_r2"),
        F.count("*").cast("bigint").alias("vocab_size"),
        F.sum("n").cast("bigint").alias("corpus_tokens"),
    )


@register(
    "centroid_classify",
    oracle="""
    WITH dims AS (
      SELECT label, CAST(i AS INT) AS pos, embedding[CAST(i AS INT)]::DOUBLE AS v
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    cent AS (
      SELECT label AS c_label, list(cv ORDER BY pos) AS c
      FROM (SELECT label, pos, avg(v) AS cv FROM dims GROUP BY 1, 2)
      GROUP BY label
    ),
    scored AS (
      SELECT a.vec_id, a.label, b.c_label,
             list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * b.c[i]))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> b.c[i] * b.c[i])))) AS cos
      FROM embeddings a CROSS JOIN cent b
    ),
    pred AS (
      SELECT vec_id, label, c_label,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, c_label ASC) AS rn
      FROM scored
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(count(*) FILTER (WHERE c_label = label) AS BIGINT) AS n_correct,
           round(count(*) FILTER (WHERE c_label = label)
                 / CAST(count(*) AS DOUBLE), 4) AS accuracy
    FROM pred WHERE rn = 1 GROUP BY label
    """,
    tags=("similarity", "ml"),
)
def q_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification (Rocchio) — the eval primitive
    for embedding quality: per-label centroids from one per-dimension
    aggregate, every vector assigned to its max-cosine centroid
    (10-row broadcast, corpus scans once, no shuffle on the wide
    side), per-label accuracy out. The per-dim explode shuffles
    |vectors|×64 skinny rows ONCE to build centroids; assignment is
    scan + windowed argmax per vector."""
    from ..operators.similarity import cosine

    e = _t(spark, sf_dir, "embeddings")
    dims = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        dims.groupBy("label", "pos")
        .agg(F.avg("v").alias("cv"))
        .groupBy(F.col("label").alias("c_label"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s.cv,
            ).alias("c")
        )
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", cosine("embedding", "c").alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("c_label"))
    pred = scored.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return pred.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.count_if(F.col("c_label") == F.col("label"))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.count_if(F.col("c_label") == F.col("label"))
            / F.count("*").cast("double"),
            4,
        ).alias("accuracy"),
    )


@register(
    "quantized_ann_recall",
    oracle=f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(x::DOUBLE
               * (127.0 / list_max(list_transform(embedding,
                                                  y -> abs(y)::DOUBLE))))) AS q
      FROM embeddings
    ),
    exact5 AS (
      SELECT query_id, vec_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY {_COSINE_SQL} DESC, b.vec_id ASC) AS rk
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < 5 AND b.vec_id >= 5
      ) WHERE rk <= 5
    ),
    quant5 AS (
      SELECT query_id, vec_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY
                   list_sum(list_transform(generate_series(1, 64),
                            i -> a.q[i] * b.q[i]))
                   / (sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> a.q[i] * a.q[i])))
                    * sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> b.q[i] * b.q[i])))) DESC,
                   b.vec_id ASC) AS rk
        FROM qv a JOIN qv b ON a.vec_id < 5 AND b.vec_id >= 5
      ) WHERE rk <= 5
    )
    SELECT e.query_id,
           CAST(count(q.vec_id) AS BIGINT) AS n_overlap,
           round(count(q.vec_id) / 5.0, 2) AS recall_at_5
    FROM exact5 e
    LEFT JOIN quant5 q ON q.query_id = e.query_id AND q.vec_id = e.vec_id
    GROUP BY e.query_id
    """,
    tags=("similarity", "quantization"),
)
def q_quantized_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization for ANN — the 4× memory/bandwidth lever
    a 100 TB vector store pulls first: per-vector max-abs scaling to
    [−127, 127], ranking on quantized cosine (scale-invariant, so only
    the rounding matters), recall@5 measured against the exact ranking
    per query. The quantization is plain deterministic arithmetic, so
    BOTH rankings are value-checked cross-engine — not a tolerance
    band. Quantized ties broken by vec_id on both sides."""
    from ..operators.similarity import brute_force_topk, cosine

    e = _t(spark, sf_dir, "embeddings")
    scale = 127.0 / F.array_max(
        F.transform("embedding", lambda y: F.abs(y.cast("double")))
    )
    qv = e.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double") * scale)).alias(
            "q"
        ),
    )
    exact5 = brute_force_topk(
        e.filter(F.col("vec_id") >= 5), e.filter(F.col("vec_id") < 5), k=5
    ).select("query_id", "vec_id")
    corpus, queries_ = qv.filter(F.col("vec_id") >= 5), qv.filter(F.col("vec_id") < 5)
    scored = (
        queries_.withColumnsRenamed({"vec_id": "query_id", "q": "qa"})
        .crossJoin(corpus)
        .select("query_id", "vec_id", cosine("qa", "q").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    quant5 = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 5")
        .select("query_id", F.col("vec_id").alias("q_vec_id"))
    )
    j = exact5.join(
        quant5,
        (quant5.query_id == exact5.query_id)
        & (quant5.q_vec_id == exact5.vec_id),
        "left",
    ).select(exact5.query_id, "q_vec_id")
    return j.groupBy("query_id").agg(
        F.count("q_vec_id").cast("bigint").alias("n_overlap"),
        F.round(F.count("q_vec_id") / 5.0, 2).alias("recall_at_5"),
    )


@register(
    "basket_lift",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l.l_orderkey, p.p_type
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    tot AS (SELECT count(DISTINCT l_orderkey) AS n FROM base),
    tf AS (SELECT p_type, count(*) AS n_t FROM base GROUP BY 1),
    pairs AS (
      SELECT a.p_type AS t1, b.p_type AS t2, count(*) AS n_pair
      FROM base a JOIN base b
        ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
      GROUP BY 1, 2
    )
    SELECT t1, t2, CAST(n_pair AS BIGINT) AS n_pair,
           round(n_pair * tot.n / (f1.n_t * CAST(f2.n_t AS DOUBLE)), 4)
             AS lift
    FROM pairs
    JOIN tf f1 ON f1.p_type = pairs.t1
    JOIN tf f2 ON f2.p_type = pairs.t2
    CROSS JOIN tot
    WHERE n_pair >= 20
    ORDER BY lift DESC, t1 ASC, t2 ASC
    LIMIT 15
    """,
    tags=("basket", "join", "agg"),
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: part-type co-occurrence within an
    order, scored by lift = P(a,b)/(P(a)·P(b)) with a min-support
    floor, top-15. The self-join runs on the DISTINCT (order, type)
    relation — deduped FIRST so the pair explosion is bounded by
    types-per-order, not lines-per-order; frequencies and the order
    total are broadcast back onto pairs. The classic co-purchase
    recommendation shape, one of everything: dedup, self-join, three
    joins, global top-k."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    base = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_type")
        .distinct()
    )
    tot = base.select(F.countDistinct("l_orderkey").alias("n"))
    tf = base.groupBy("p_type").agg(F.count("*").alias("n_t"))
    a = base.withColumnsRenamed({"p_type": "t1"})
    b = base.withColumnsRenamed({"p_type": "t2"})
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 20)
    )
    f1 = F.broadcast(tf.withColumnsRenamed({"p_type": "t1", "n_t": "n_t1"}))
    f2 = F.broadcast(tf.withColumnsRenamed({"p_type": "t2", "n_t": "n_t2"}))
    return (
        pairs.join(f1, "t1")
        .join(f2, "t2")
        .crossJoin(F.broadcast(tot))
        .select(
            "t1",
            "t2",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.round(
                F.col("n_pair") * F.col("n")
                / (F.col("n_t1") * F.col("n_t2").cast("double")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("t1"), F.asc("t2"))
        .limit(15)
    )


@register(
    "profile_columns",
    oracle="""
    WITH long AS (
      SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS val FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', o_orderstatus FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ),
    stats AS (
      SELECT col, count(*) AS n_rows,
             CAST(count(*) - count(val) AS BIGINT) AS n_null,
             CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
             min(val) AS min_val, max(val) AS max_val
      FROM long GROUP BY col
    ),
    freq AS (
      SELECT col, val, count(*) AS n FROM long
      WHERE val IS NOT NULL GROUP BY 1, 2
    ),
    modal AS (
      SELECT col, val AS top_value, CAST(n AS BIGINT) AS top_count FROM (
        SELECT *, row_number() OVER (
          PARTITION BY col ORDER BY n DESC, val ASC) AS rk
        FROM freq
      ) WHERE rk = 1
    )
    SELECT s.col, s.n_rows, s.n_null, s.n_distinct, s.min_val, s.max_val,
           m.top_value, m.top_count
    FROM stats s JOIN modal m ON m.col = s.col
    """,
    tags=("profiling", "curation"),
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiler: every column of `orders` rendered to
    its string form and unpivoted via `stack` (single scan — the
    Expand operator emits |cols| rows per input row map-side), then
    per-column row/null/distinct counts, lexicographic min/max of the
    rendering, and the deterministic modal value. The oracle pays six
    UNION ALL scans for the same relation — the engine's Expand is the
    rewrite that makes profiling a 100 TB table cost ONE read.
    Min/max are over the string rendering (documented: a profile of
    the rendered values, type-faithful ordering lives in the typed
    queries)."""
    o = _t(spark, sf_dir, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    stack = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    long = o.select(
        F.expr(f"stack({len(cols)}, {stack}) AS (col, val)")
    )
    stats = long.groupBy("col").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("val")).cast("bigint").alias("n_null"),
        F.countDistinct("val").cast("bigint").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
    freq = (
        long.filter(F.col("val").isNotNull())
        .groupBy("col", "val")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("col").orderBy(F.desc("n"), F.asc("val"))
    modal = (
        freq.withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .select(
            "col",
            F.col("val").alias("top_value"),
            F.col("n").cast("bigint").alias("top_count"),
        )
    )
    return stats.join(modal, "col")


@register(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      WITH b AS (
        SELECT vec_id, embedding,
               CAST(list_sum(list_transform(generate_series(1, 8),
                    i -> CASE WHEN embedding[i] >= 0
                              THEN CAST(pow(2, i - 1) AS BIGINT)
                              ELSE 0 END)) AS BIGINT) AS bucket
        FROM embeddings
      )
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE round({{cos}}, 6) >= 0.3
    ),
    edges AS (
      SELECT vec_a AS s, vec_b AS d FROM pairs
      UNION ALL SELECT vec_b, vec_a FROM pairs
    ),
    reach(node, label) AS (
      SELECT DISTINCT s, s FROM edges
      UNION
      SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s
    ),
    cc AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
    scored AS (
      SELECT cc.component, cc.node,
             sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
               AS norm
      FROM cc JOIN embeddings e ON e.vec_id = cc.node
    )
    , ranked AS (
      SELECT component, node, norm,
             row_number() OVER (
               PARTITION BY component ORDER BY norm DESC, node ASC) AS rk,
             count(*) OVER (PARTITION BY component) AS n_members
      FROM scored
    )
    SELECT component,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(node AS BIGINT) AS kept_vec_id,
           round(norm, 6) AS kept_norm
    FROM ranked WHERE rk = 1
    """.replace("{cos}", _COSINE_SQL),
    tags=("dedup", "iterative", "curation"),
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup POLICY stage: within each near-dup cluster (sign-LSH
    pairs → connected components, same fixpoint as dedup_components),
    keep the best representative — max L2 norm, smallest vec_id on
    ties — the select-the-canonical step a training-data build runs
    after clustering (keep the longest/highest-quality copy, drop the
    rest). argmax-by-(norm, −id) is a single associative aggregate per
    component; no sort, no per-cluster subquery."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = SIM.lsh_near_duplicate_pairs(e, threshold=0.3, n_bits=8).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    cc = DD.connected_components(pairs)
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    scored = cc.join(
        e.select(F.col("vec_id").alias("node"), norm.alias("norm")), "node"
    )
    return scored.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.max_by(
            "node", F.struct(F.col("norm"), (-F.col("node")).cast("double"))
        )
        .cast("bigint")
        .alias("kept_vec_id"),
        F.round(F.max("norm"), 6).alias("kept_norm"),
    )


@register(
    "decayed_engagement",
    oracle="""
    WITH mx AS (SELECT max(ts) AS now FROM events)
    SELECT user_id,
           round(sum(value * exp(-(epoch_us(mx.now) - epoch_us(ts))
                                 / 86400000000.0 / 7.0)), 4) AS decayed_score,
           round(sum(value), 4) AS raw_score,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events CROSS JOIN mx
    GROUP BY user_id
    """,
    tags=("events", "agg"),
)
def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score (7-day e-folding
    time): each event weighted by exp(−age/7d) relative to the
    feed's max timestamp — the recency weighting every ranking /
    retention model wants. 'now' is an aggregate of the data itself
    (broadcast 1-row cross join), so the query is deterministic and
    re-runnable; the decay is plain column math folded into one hash
    aggregate — no window, no sort, shuffle rows = |users|."""
    e = _t(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("now"))
    age_days = (
        F.unix_micros(F.col("now")) - F.unix_micros(F.col("ts"))
    ) / 86400000000.0
    return (
        e.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * F.exp(-age_days / 7.0)), 4).alias(
                "decayed_score"
            ),
            F.round(F.sum("value"), 4).alias("raw_score"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


@register(
    "pareto_8020",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT p_brand, r,
             row_number() OVER w AS rk,
             sum(r) OVER (PARTITION BY p_brand) AS total,
             sum(r) OVER (w ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
      WINDOW w AS (PARTITION BY p_brand ORDER BY r DESC, l_partkey ASC)
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(min(CASE WHEN cum >= 0.8 * total THEN rk END) AS BIGINT)
             AS parts_to_80pct,
           round(min(CASE WHEN cum >= 0.8 * total THEN rk END)
                 / CAST(count(*) AS DOUBLE), 4) AS concentration
    FROM ranked GROUP BY p_brand
    """,
    tags=("window", "agg"),
)
def q_pareto_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 concentration cutoff: per brand, how many top parts
    cover 80% of revenue. Revenue per part (one hash agg), then a
    single window pass computes rank, partition total, and running
    sum together — the cutoff is min(rank where cumulative ≥ 80%),
    an aggregate over the windowed relation, no second scan. Low
    `concentration` = revenue concentrated in few parts."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("r"), F.asc("l_partkey"))
    ranked = rev.select(
        "p_brand",
        F.row_number().over(w).alias("rk"),
        F.sum("r").over(Window.partitionBy("p_brand")).alias("total"),
        F.sum("r").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    cutoff = F.min(F.when(F.col("cum") >= 0.8 * F.col("total"), F.col("rk")))
    return ranked.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        cutoff.cast("bigint").alias("parts_to_80pct"),
        F.round(cutoff / F.count("*").cast("double"), 4).alias("concentration"),
    )


@register(
    "running_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ),
    daily AS (SELECT d, count(*) AS n_new FROM first_seen GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n_new AS BIGINT) AS n_new_users,
           CAST(sum(n_new) OVER (ORDER BY d) AS BIGINT) AS cumulative_users
    FROM daily
    """,
    tags=("events", "window"),
)
def q_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric. A
    naive COUNT(DISTINCT) OVER (ORDER BY day) needs per-day distinct
    state; the scalable identity is first-seen-day: each user
    contributes once at min(day), so cumulative-distinct = running sum
    of new-user counts. Two tiny hash aggs + a window over |days|
    rows — at 100 TB the heavy relation shuffles once on user_id."""
    e = _t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d")
    )
    daily = first_seen.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_new").cast("bigint").alias("n_new_users"),
        F.sum("n_new").over(w).cast("bigint").alias("cumulative_users"),
    )


@register(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST((SELECT count(*) FROM d) AS DOUBLE), 4)
             AS share,
           round(log10(1.0 + 1.0 / digit), 4) AS benford_expected
    FROM d GROUP BY digit
    """,
    tags=("stats", "quality"),
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    anomaly/fabrication screen auditors run on financial columns:
    observed leading-digit shares against the log10(1+1/d) law.
    Digit extraction is integer/string column math; the share needs
    the total count, provided by a broadcast scalar aggregate (the
    uncorrelated-subquery idiom), so the whole audit is one scan +
    two 9-row joins."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count("*").alias("n_total"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("n_total").cast("double"), 4).alias("share"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 4).alias(
                "benford_expected"
            ),
        )
    )


@register(
    "chi_square_independence",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id % 3 AS seg, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS N,
                   count(DISTINCT event_type) AS nr,
                   count(DISTINCT seg) AS nc FROM c),
    rowm AS (SELECT event_type, sum(n) AS rn FROM c GROUP BY 1),
    colm AS (SELECT seg, sum(n) AS cn FROM c GROUP BY 1)
    SELECT round(sum(pow(c.n - rowm.rn * colm.cn / tot.N, 2)
                     / (rowm.rn * colm.cn / tot.N)), 4) AS chi2,
           CAST((max(tot.nr) - 1) * (max(tot.nc) - 1) AS BIGINT) AS dof,
           CAST(max(tot.N) AS BIGINT) AS n_obs
    FROM c
    JOIN rowm USING (event_type)
    JOIN colm USING (seg)
    CROSS JOIN tot
    """,
    tags=("stats", "events"),
)
def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test between event type and a
    derived user segment: contingency counts (ONE shuffle on the
    cell key), marginals re-aggregated from the tiny cell relation
    and broadcast back, χ² = Σ(obs−exp)²/exp with its degrees of
    freedom. The A/B-companion for categorical outcomes (welch_ttest
    covers the continuous case) — everything after the first
    aggregate runs on |cells| rows."""
    e = _t(spark, sf_dir, "events")
    c = (
        e.select("event_type", (F.col("user_id") % 3).alias("seg"))
        .groupBy("event_type", "seg")
        .agg(F.count("*").alias("n"))
    )
    tot = c.agg(
        F.sum("n").cast("double").alias("n_total"),
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("seg").alias("nc"),
    )
    rowm = c.groupBy("event_type").agg(F.sum("n").alias("rn"))
    colm = c.groupBy("seg").agg(F.sum("n").alias("cn"))
    j = (
        c.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "seg")
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("rn") * F.col("cn") / F.col("n_total")
    return j.agg(
        F.round(F.sum(F.pow(F.col("n") - exp, F.lit(2)) / exp), 4).alias("chi2"),
        ((F.max("nr") - 1) * (F.max("nc") - 1)).cast("bigint").alias("dof"),
        F.max("n_total").cast("bigint").alias("n_obs"),
    )


@register(
    "lateral_topn_per_key",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS total
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
    WHERE c.c_acctbal > 9000
    """,
    tags=("lateral", "subquery", "topk"),
)
def q_lateral_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-key ORDER BY LIMIT — the
    top-N-per-group shape written the SQL-standard way, identical text
    on both engines. Catalyst DECORRELATES it: the per-customer
    subquery becomes a windowed rank over one join, not |customers|
    subquery executions — the rewrite that makes lateral top-N viable
    at 100 TB. Same semantics as the window formulation
    (topk_per_group); this pins the parser/decorrelation surface."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS total
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
        WHERE c.c_acctbal > 9000
        """
    )


@register(
    "psi_drift",
    oracle="""
    WITH norms AS (
      SELECT vec_id, CASE WHEN label < 5 THEN 'ref' ELSE 'cur' END AS cohort,
             sqrt(list_sum(list_transform(generate_series(1, 64),
                  i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS norm
      FROM embeddings
    ),
    rng AS (SELECT min(norm) AS mn, max(norm) AS mx FROM norms),
    binned AS (
      SELECT cohort,
             least(9, CAST(floor((norm - rng.mn) / (rng.mx - rng.mn) * 10)
                           AS INT)) AS bin
      FROM norms CROSS JOIN rng
    ),
    counts AS (
      SELECT bin,
             count(*) FILTER (WHERE cohort = 'ref') AS a,
             count(*) FILTER (WHERE cohort = 'cur') AS b
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM counts),
    p AS (
      SELECT (a + 0.5) / (tot.na + 5.0) AS pa,
             (b + 0.5) / (tot.nb + 5.0) AS pb
      FROM counts CROSS JOIN tot
    )
    SELECT round(sum((pa - pb) * ln(pa / pb)), 6) AS psi,
           CAST(count(*) AS BIGINT) AS n_bins
    FROM p
    """,
    tags=("stats", "ml", "drift"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two embedding cohorts — the
    drift monitor an ML platform runs between training and serving
    distributions: L2 norms binned on the shared data-derived range
    (10 equal-width bins, Laplace-smoothed so empty bins stay finite),
    PSI = Σ(pa−pb)·ln(pa/pb). One scan for norms, one 2-row aggregate
    for the range (broadcast), one 10-row counts relation — drift
    monitoring at any scale is three tiny reductions over a single
    pass."""
    e = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    norms = e.select(
        F.when(F.col("label") < 5, "ref").otherwise("cur").alias("cohort"),
        norm.alias("norm"),
    )
    rng = norms.agg(F.min("norm").alias("mn"), F.max("norm").alias("mx"))
    binned = norms.crossJoin(F.broadcast(rng)).select(
        "cohort",
        F.least(
            F.lit(9),
            F.floor(
                (F.col("norm") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 10
            ).cast("int"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("cohort") == "ref").alias("a"),
        F.count_if(F.col("cohort") == "cur").alias("b"),
    )
    tot = counts.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    p = counts.crossJoin(F.broadcast(tot)).select(
        ((F.col("a") + 0.5) / (F.col("na") + 5.0)).alias("pa"),
        ((F.col("b") + 0.5) / (F.col("nb") + 5.0)).alias("pb"),
    )
    return p.agg(
        F.round(
            F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))),
            6,
        ).alias("psi"),
        F.count("*").cast("bigint").alias("n_bins"),
    )


@register(
    "auc_rank_sum",
    oracle="""
    WITH cent AS (
      SELECT list(cv ORDER BY pos) AS c FROM (
        SELECT CAST(i AS INT) AS pos, avg(embedding[CAST(i AS INT)]::DOUBLE) AS cv
        FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
        WHERE label = 0 GROUP BY 1
      )
    ),
    scored AS (
      SELECT e.vec_id, e.label = 0 AS positive,
             list_sum(list_transform(generate_series(1, 64),
                      i -> e.embedding[i]::DOUBLE * cent.c[i]))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> cent.c[i] * cent.c[i])))) AS score
      FROM embeddings e CROSS JOIN cent
    ),
    ranked AS (
      SELECT positive,
             row_number() OVER (ORDER BY score ASC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT round((sum(CASE WHEN positive THEN rk END)
                  - sum(CASE WHEN positive THEN 1 END)
                    * (sum(CASE WHEN positive THEN 1 END) + 1) / 2.0)
                 / (sum(CASE WHEN positive THEN 1 END)
                    * sum(CASE WHEN NOT positive THEN 1 END)), 6) AS auc,
           CAST(sum(CASE WHEN positive THEN 1 END) AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN NOT positive THEN 1 END) AS BIGINT) AS n_neg
    FROM ranked
    """,
    tags=("stats", "ml", "eval"),
)
def q_auc_rank_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC via the Mann-Whitney rank-sum identity — the
    classifier-eval primitive computed without thresholds or curves:
    score = cosine to the positive-class centroid, rank once globally,
    AUC = (ΣR₊ − n₊(n₊+1)/2)/(n₊·n₋). Ranking is a window over
    |vectors| rows with a deterministic vec_id tie-break (identical in
    both engines, so exact scores hash-match); at scale the global
    sort is the only wide operation and every other step is a scalar
    aggregate. Complements psi_drift (monitoring) and
    centroid_classify (accuracy) as the eval tier."""
    from ..operators.similarity import cosine

    e = _t(spark, sf_dir, "embeddings")
    dims = e.filter(F.col("label") == 0).select(
        F.posexplode("embedding").alias("pos", "v")
    )
    cent = (
        dims.groupBy("pos")
        .agg(F.avg("v").alias("cv"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda s: s.cv,
            ).alias("c")
        )
    )
    scored = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        (F.col("label") == 0).alias("positive"),
        cosine("embedding", "c").alias("score"),
    )
    ranked = scored.select(
        "positive",
        F.row_number()
        .over(Window.orderBy(F.asc("score"), F.asc("vec_id")))
        .alias("rk"),
    )
    n_pos = F.sum(F.when(F.col("positive"), 1))
    n_neg = F.sum(F.when(~F.col("positive"), 1))
    r_pos = F.sum(F.when(F.col("positive"), F.col("rk")))
    return ranked.agg(
        F.round(
            (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6
        ).alias("auc"),
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
    )


@register(
    "ks_two_sample",
    oracle="""
    WITH pts AS (
      SELECT value,
             count(*) FILTER (WHERE event_type = 'click') AS a,
             count(*) FILTER (WHERE event_type = 'purchase') AS b
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY value
    ),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM pts),
    c AS (
      SELECT sum(a) OVER (ORDER BY value) / CAST(tot.na AS DOUBLE) AS fa,
             sum(b) OVER (ORDER BY value) / CAST(tot.nb AS DOUBLE) AS fb
      FROM pts CROSS JOIN tot
    )
    SELECT round(max(abs(fa - fb)), 6) AS ks_d,
           CAST(max(tot2.na) AS BIGINT) AS n_click,
           CAST(max(tot2.nb) AS BIGINT) AS n_purchase
    FROM c CROSS JOIN (SELECT na, nb FROM tot) tot2
    """,
    tags=("stats", "events"),
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between cohorts: the
    nonparametric distribution-equality test (no normality assumption
    — completing the stats-test family with welch_ttest and
    chi_square_independence). D = max |ECDF_a − ECDF_b|, evaluated at
    the distinct observed values: per-value counts (one shuffle),
    cumulative fractions in one window pass over |distinct values|
    rows, exact integer cumsums so the statistic hash-matches across
    engines."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    pts = e.groupBy("value").agg(
        F.count_if(F.col("event_type") == "click").alias("a"),
        F.count_if(F.col("event_type") == "purchase").alias("b"),
    )
    tot = pts.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = pts.crossJoin(F.broadcast(tot)).select(
        (F.sum("a").over(w) / F.col("na").cast("double")).alias("fa"),
        (F.sum("b").over(w) / F.col("nb").cast("double")).alias("fb"),
        "na",
        "nb",
    )
    return c.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_d"),
        F.max("na").cast("bigint").alias("n_click"),
        F.max("nb").cast("bigint").alias("n_purchase"),
    )


@register(
    "ndvi_clip_histogram",
    oracle=_NDVI_SQL
    + """
    SELECT scene_id,
           least(4, CAST(floor((ndvi + 1.0) / 0.4) AS INT)) AS bin,
           CAST(count(*) AS BIGINT) AS n_pixels,
           round(avg(ndvi), 6) AS bin_mean
    FROM nv
    WHERE ndvi IS NOT NULL
      AND x BETWEEN 20 AND 59 AND y BETWEEN 30 AND 69
    GROUP BY scene_id, bin
    """,
    tags=("ndvi", "spatial", "agg"),
)
def q_ndvi_clip_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal NDVI histogram: the per-AOI distribution product
    (vegetation-class breakdown inside the clip region) — bbox
    prefilter → 5 equal-width bins over [−1, 1] (top edge folded into
    the last bin) → per-(scene, bin) counts and means. The reference
    only stores the clipped mean (load_to_postgis.py:244-248); the
    histogram is the same scan with a composite group key, which is
    why it's free to add at 100 TB: predicate prunes first, bin id is
    scalar math, and the aggregate shuffles |scenes|×5 rows."""
    nv = _ndvi_pixels_df(spark, sf_dir)
    bin_ = F.least(
        F.lit(4), F.floor((F.col("ndvi") + 1.0) / 0.4).cast("int")
    ).alias("bin")
    return (
        nv.filter(
            F.col("ndvi").isNotNull()
            & F.col("x").between(20, 59)
            & F.col("y").between(30, 69)
        )
        .groupBy("scene_id", bin_)
        .agg(
            F.count("*").cast("bigint").alias("n_pixels"),
            F.round(F.avg("ndvi"), 6).alias("bin_mean"),
        )
    )


@register(
    "mean_family",
    oracle="""
    SELECT p_brand,
           round(avg(p_retailprice), 4) AS arithmetic_mean,
           round(exp(avg(ln(p_retailprice))), 4) AS geometric_mean,
           round(count(*) / sum(1.0 / p_retailprice), 4) AS harmonic_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM part WHERE p_retailprice > 0 GROUP BY p_brand
    """,
    tags=("agg", "stats"),
)
def q_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean means side by side per brand: arithmetic,
    geometric (exp∘avg∘ln — the log-space identity that makes a
    multiplicative mean a plain associative aggregate, the same trick
    behind distributed perplexity computation), and harmonic (rate
    averaging). All three are single-pass partial/final aggregates;
    AM ≥ GM ≥ HM holds per row as a built-in sanity invariant."""
    pt = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return pt.groupBy("p_brand").agg(
        F.round(F.avg("p_retailprice"), 4).alias("arithmetic_mean"),
        F.round(F.exp(F.avg(F.log("p_retailprice"))), 4).alias("geometric_mean"),
        F.round(F.count("*") / F.sum(1.0 / F.col("p_retailprice")), 4).alias(
            "harmonic_mean"
        ),
        F.count("*").cast("bigint").alias("n"),
    )


@register(
    "max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             sum(o_totalprice) - 2 * sum(o_totalprice)
               FILTER (WHERE o_orderstatus = 'F') AS net
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT d, sum(net) OVER (ORDER BY d) AS cum FROM daily
    ),
    dd AS (
      SELECT d, max(cum) OVER (ORDER BY d) - cum AS drawdown FROM c
    )
    SELECT round(max(drawdown), 2) AS max_drawdown,
           CAST(count(*) AS BIGINT) AS n_days
    FROM dd
    """,
    tags=("window", "timeseries"),
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of a running series (the finance/monitoring
    shape): daily net flow (finalized orders count negative so the
    series actually dips), cumulative sum, running peak, max(peak −
    value). Two stacked window passes over |days| rows after the
    day-level aggregate — the composition (cumsum → running max →
    scalar max) that cannot be expressed as one aggregate but never
    touches row-level data twice."""
    o = _t(spark, sf_dir, "orders")
    net = F.sum("o_totalprice") - 2 * F.sum(
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        net.alias("net")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.select("d", F.sum("net").over(w).alias("cum"))
    dd = c.select((F.max("cum").over(w) - F.col("cum")).alias("drawdown"))
    return dd.agg(
        F.round(F.max("drawdown"), 2).alias("max_drawdown"),
        F.count("*").cast("bigint").alias("n_days"),
    )


@register(
    "referential_integrity",
    oracle="""
    SELECT
      CAST((SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
           AS BIGINT) AS orphan_lineitems,
      CAST((SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
           AS BIGINT) AS orphan_orders,
      CAST((SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
           AS BIGINT) AS orphan_part_refs,
      CAST((SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
           AS BIGINT) AS orphan_customers
    """,
    tags=("quality", "antijoin"),
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for the
    four FK chains (lineitem→orders, orders→customer, lineitem→part,
    customer→nation) — the relational complement of the single-table
    dq_expectations suite, and the engine-level stand-in for the FK
    constraints the reference declares in DDL (db/init/002_schema.sql:
    20-31): a lake has no enforced FKs, so integrity is a query you
    run. Each check is a left-anti join that broadcasts the key side
    when small and degrades to shuffled anti-join at scale."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    pt = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")

    def orphans(child, parent, ck, pk, out):
        # lazy 1-row count — the four checks compose into ONE plan
        return child.join(
            parent.select(pk), child[ck] == parent[pk], "left_anti"
        ).agg(F.count("*").cast("bigint").alias(out))

    return (
        orphans(li, o, "l_orderkey", "o_orderkey", "orphan_lineitems")
        .crossJoin(orphans(o, c, "o_custkey", "c_custkey", "orphan_orders"))
        .crossJoin(orphans(li, pt, "l_partkey", "p_partkey", "orphan_part_refs"))
        .crossJoin(
            orphans(c, n, "c_nationkey", "n_nationkey", "orphan_customers")
        )
    )


@register(
    "weighted_median",
    oracle="""
    WITH w AS (
      SELECT p.p_brand, l.l_extendedprice / l.l_quantity AS unit_price,
             l.l_quantity AS wt
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0
    ),
    r AS (
      SELECT p_brand, unit_price,
             sum(wt) OVER (PARTITION BY p_brand ORDER BY unit_price
                           ROWS UNBOUNDED PRECEDING) AS cw,
             sum(wt) OVER (PARTITION BY p_brand) AS tw
      FROM w
    )
    SELECT p_brand,
           round(min(CASE WHEN cw >= 0.5 * tw THEN unit_price END), 4)
             AS weighted_median_price,
           round(max(tw), 2) AS total_weight
    FROM r GROUP BY p_brand
    """,
    tags=("window", "stats"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per brand: sort by value,
    running weight, first value whose cumulative weight crosses half
    the total. The crossing value is order-independent within
    equal-price ties (whichever tied row crosses, the selected PRICE
    is the same), so no tie-break column is needed for determinism —
    the property that makes weighted quantiles safe distributed. One
    shuffle on brand, one window pass, one aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    pt = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    w_rel = li.join(pt, li.l_partkey == pt.p_partkey).select(
        "p_brand",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_quantity").alias("wt"),
    )
    win = Window.partitionBy("p_brand").orderBy("unit_price")
    r = w_rel.select(
        "p_brand",
        "unit_price",
        F.sum("wt").over(win.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
        F.sum("wt").over(Window.partitionBy("p_brand")).alias("tw"),
    )
    return r.groupBy("p_brand").agg(
        F.round(
            F.min(F.when(F.col("cw") >= 0.5 * F.col("tw"), F.col("unit_price"))),
            4,
        ).alias("weighted_median_price"),
        F.round(F.max("tw"), 2).alias("total_weight"),
    )


@register(
    "capped_topk",
    oracle="""
    WITH per_source AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS src_rk
      FROM documents
    )
    SELECT doc_id, source, n_chars FROM (
      SELECT *, row_number() OVER (
               ORDER BY n_chars DESC, doc_id ASC) AS global_rk
      FROM per_source WHERE src_rk <= 3
    ) WHERE global_rk <= 20
    """,
    tags=("curation", "topk", "window"),
)
def q_capped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped selection: global top-20 longest documents
    with AT MOST 3 per source — the anti-domination constraint every
    curation pass needs so one crawl source cannot fill the whole
    budget. Per-source rank first (distributed window on the source
    key, prunes to ≤3×|sources| rows), THEN the global top-k over the
    tiny survivor set — the order of the two windows is what keeps
    the global sort off the full corpus."""
    d = _t(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    w_glob = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("src_rk", F.row_number().over(w_src))
        .filter(F.col("src_rk") <= 3)
        .withColumn("global_rk", F.row_number().over(w_glob))
        .filter(F.col("global_rk") <= 20)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "struct_in_groupby_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('N', 'O'))
    GROUP BY ALL
    """,
    tags=("sql", "filter"),
)
def q_struct_in_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-value IN list + GROUP BY ALL — two modern-SQL surfaces in
    one query, IDENTICAL text on both engines. The tuple IN compiles
    to a pair of equality conjunctions (sargable — both legs reach the
    parquet scan as pushed filters), and GROUP BY ALL infers the
    non-aggregated columns; neither is sugar the engine pays for."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_sig_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l_extendedprice), 2) AS total
        FROM _sig_lineitem
        WHERE (l_returnflag, l_linestatus) IN (('A', 'F'), ('N', 'O'))
        GROUP BY ALL
        """
    )


@register(
    "time_bucket_15min",
    oracle="""
    SELECT strftime(to_timestamp(floor(epoch_us(ts) / 900000000.0)
                                 * 900), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "agg", "time"),
)
def q_time_bucket_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-interval time bucketing (15 min) via pure epoch
    arithmetic — the `time_bucket`/`date_bin` primitive expressed
    portably: floor(epoch/width)·width. Unlike the tumbling `window()`
    struct this composes with any GROUP BY and stays a plain sargable
    column; identical integer math both engines so bucket edges
    hash-match exactly."""
    e = _t(spark, sf_dir, "events")
    bucket = F.date_format(
        F.timestamp_seconds(
            F.floor(F.unix_micros("ts") / 900000000.0).cast("long") * 900
        ),
        "yyyy-MM-dd HH:mm:ss",
    )
    return e.groupBy(bucket.alias("bucket"), F.col("event_type")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "rank_movement",
    oracle="""
    WITH rev AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
                  THEN 'early' ELSE 'late' END AS period,
             o_custkey, sum(o_totalprice) AS total
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT period, o_custkey,
             row_number() OVER (PARTITION BY period
                                ORDER BY total DESC, o_custkey ASC) AS rk
      FROM rev
    )
    SELECT e.o_custkey,
           CAST(e.rk AS BIGINT) AS early_rank,
           CAST(l.rk AS BIGINT) AS late_rank,
           CAST(e.rk - l.rk AS BIGINT) AS movement
    FROM (SELECT * FROM ranked WHERE period = 'early') e
    JOIN (SELECT * FROM ranked WHERE period = 'late') l
      ON l.o_custkey = e.o_custkey
    ORDER BY abs(e.rk - l.rk) DESC, e.o_custkey ASC
    LIMIT 10
    """,
    tags=("window", "trending"),
)
def q_rank_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending analysis: customer spend ranked in an early vs late
    period, self-joined on the entity, biggest absolute rank movers on
    top — the leaderboard-delta shape behind every 'rising/falling'
    report. Ranks are deterministic (total desc, key asc), the join is
    on the entity key, and the final top-10 is TakeOrderedAndProject
    over |entities| rows."""
    o = _t(spark, sf_dir, "orders")
    period = F.when(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"), "early"
    ).otherwise("late")
    rev = o.groupBy(period.alias("period"), F.col("o_custkey")).agg(
        F.sum("o_totalprice").alias("total")
    )
    w = Window.partitionBy("period").orderBy(
        F.desc("total"), F.asc("o_custkey")
    )
    ranked = rev.withColumn("rk", F.row_number().over(w))
    e = ranked.filter("period = 'early'").select(
        "o_custkey", F.col("rk").alias("early_rank")
    )
    l = ranked.filter("period = 'late'").select(
        F.col("o_custkey").alias("l_custkey"), F.col("rk").alias("late_rank")
    )
    return (
        e.join(l, e.o_custkey == l.l_custkey)
        .select(
            "o_custkey",
            F.col("early_rank").cast("bigint").alias("early_rank"),
            F.col("late_rank").cast("bigint").alias("late_rank"),
            (F.col("early_rank") - F.col("late_rank"))
            .cast("bigint")
            .alias("movement"),
        )
        .orderBy(F.abs(F.col("movement")).desc(), F.asc("o_custkey"))
        .limit(10)
    )


@register(
    "gini_coefficient",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x ASC, o_custkey ASC) AS i,
             count(*) OVER () AS n
      FROM spend
    )
    SELECT round(2.0 * sum(i * x) / (max(n) * sum(x))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           CAST(max(n) AS BIGINT) AS n_customers,
           round(sum(x), 2) AS total_spend
    FROM ranked
    """,
    tags=("stats", "inequality"),
)
def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality measure
    behind every concentration dashboard, via the rank identity
    G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over ascending-sorted totals. Ties in
    x are order-insensitive in Σi·xᵢ (equal values × consecutive
    ranks sum the same either way), so the statistic is deterministic
    without caring how the sort broke them. One aggregate, one global
    rank over |customers| rows, one scalar reduction."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("x"))
    ranked = spend.select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.asc("x"), F.asc("o_custkey")))
        .alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.sum("x"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
        F.max("n").cast("bigint").alias("n_customers"),
        F.round(F.sum("x"), 2).alias("total_spend"),
    )


@register(
    "herfindahl_concentration",
    oracle="""
    WITH s AS (
      SELECT p_type, p_brand, sum(p_retailprice) AS v
      FROM part GROUP BY 1, 2
    ),
    sh AS (
      SELECT p_type, v / sum(v) OVER (PARTITION BY p_type) AS share FROM s
    )
    SELECT p_type,
           round(sum(share * share), 6) AS hhi,
           round(1.0 / sum(share * share), 4) AS effective_brands,
           CAST(count(*) AS BIGINT) AS n_brands
    FROM sh GROUP BY p_type
    """,
    tags=("stats", "inequality"),
)
def q_herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration per part type: Σshare² and
    its reciprocal (the 'effective number of brands' — the inverse
    Simpson index ecology and market analysis share). Shares come
    from a partition-total window over the tiny grouped relation;
    everything after the first aggregate is |type×brand| rows."""
    pt = _t(spark, sf_dir, "part")
    s = pt.groupBy("p_type", "p_brand").agg(F.sum("p_retailprice").alias("v"))
    share = F.col("v") / F.sum("v").over(Window.partitionBy("p_type"))
    sh = s.select("p_type", share.alias("share"))
    return sh.groupBy("p_type").agg(
        F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
        F.round(1.0 / F.sum(F.col("share") * F.col("share")), 4).alias(
            "effective_brands"
        ),
        F.count("*").cast("bigint").alias("n_brands"),
    )


@register(
    "kaplan_meier_conversion",
    oracle="""
    WITH bounds AS (SELECT max(ts) AS tmax FROM events),
    per_user AS (
      SELECT user_id, min(ts) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    durs AS (
      SELECT CASE WHEN tp IS NOT NULL
                  THEN CAST(epoch_us(tp) - epoch_us(t0) AS BIGINT)
                  ELSE CAST(epoch_us(bounds.tmax) - epoch_us(t0) AS BIGINT)
             END AS dur,
             tp IS NOT NULL AS is_event
      FROM per_user CROSS JOIN bounds
    ),
    g AS (
      SELECT dur AS t,
             count(*) FILTER (WHERE is_event) AS d,
             count(*) AS all_at_t
      FROM durs GROUP BY dur
    ),
    o AS (
      SELECT t, d,
             sum(all_at_t) OVER ()
               - (sum(all_at_t) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  - all_at_t) AS at_risk
      FROM g
    ),
    km AS (
      SELECT t, d, at_risk,
             (at_risk - d) / CAST(at_risk AS DOUBLE) AS factor
      FROM o WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS duration_s_us,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(d AS BIGINT) AS n_events,
           round(CASE WHEN min(factor) OVER w = 0 THEN 0.0
                      ELSE exp(sum(ln(nullif(factor, 0.0))) OVER w)
                 END, 6) AS survival
    FROM km
    WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    """,
    tags=("stats", "survival", "events"),
)
def q_kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase with
    RIGHT-CENSORING — users who never purchase are censored at the
    feed horizon, which naive 'average conversion time' silently
    throws away. S(t) = Π(1 − dᵢ/nᵢ) over event times, computed as
    exp of a running sum of logs (the associative form); a factor of
    exactly 0 (everyone remaining converts) is NULLed out of the sum —
    both engines' sums skip NULL — and forced to survival 0 via the
    running min, because Spark's ln(0) is NULL while DuckDB's raises.
    At-risk counts come from one cumulative window over |distinct
    durations| rows; the heavy relation shuffles once on user_id."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(F.max("ts").alias("tmax"))
    per_user = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    durs = per_user.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.col("tp").isNotNull(),
            F.unix_micros("tp") - F.unix_micros("t0"),
        )
        .otherwise(F.unix_micros("tmax") - F.unix_micros("t0"))
        .cast("bigint")
        .alias("dur"),
        F.col("tp").isNotNull().alias("is_event"),
    )
    g = durs.groupBy(F.col("dur").alias("t")).agg(
        F.count_if("is_event").alias("d"), F.count("*").alias("all_at_t")
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    o = g.select(
        "t",
        "d",
        (
            F.sum("all_at_t").over(Window.partitionBy())
            - (F.sum("all_at_t").over(w_cum) - F.col("all_at_t"))
        ).alias("at_risk"),
    )
    km = o.filter(F.col("d") > 0).withColumn(
        "factor", (F.col("at_risk") - F.col("d")) / F.col("at_risk").cast("double")
    )
    return km.select(
        F.col("t").cast("bigint").alias("duration_s_us"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("d").cast("bigint").alias("n_events"),
        F.round(
            F.when(F.min("factor").over(w_cum) == 0, 0.0).otherwise(
                F.exp(F.sum(F.log(F.nullif(F.col("factor"), F.lit(0.0)))).over(w_cum))
            ),
            6,
        ).alias("survival"),
    )


@register(
    "linear_interpolation_fill",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS total
      FROM orders GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    grid AS (
      SELECT CAST(lo + CAST(i AS INT) AS DATE) AS d
      FROM bounds, unnest(generate_series(0, hi - lo)) AS t(i)
    ),
    j AS (
      SELECT g.d, daily.total,
             epoch_us(CAST(g.d AS TIMESTAMP)) / 86400000000 AS ed
      FROM grid g LEFT JOIN daily ON daily.d = g.d
    ),
    ctx AS (
      SELECT d, total, ed,
             last_value(total IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN total IS NOT NULL THEN ed END IGNORE NULLS)
               OVER wb AS pd,
             first_value(total IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN total IS NOT NULL THEN ed END IGNORE NULLS)
               OVER wf AS nd
      FROM j
      WINDOW wb AS (ORDER BY d ROWS UNBOUNDED PRECEDING),
             wf AS (ORDER BY d ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING)
    ),
    filled AS (
      SELECT d, total,
             CASE WHEN total IS NOT NULL THEN total
                  WHEN pv IS NULL THEN nv
                  WHEN nv IS NULL THEN pv
                  ELSE pv + (nv - pv) * (ed - pd) / (nd - pd)
             END AS v
      FROM ctx
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(total) AS BIGINT) AS n_observed,
           CAST(count(*) - count(total) AS BIGINT) AS n_interpolated,
           round(sum(v), 2) AS total_filled,
           round(avg(v), 4) AS mean_filled
    FROM filled
    """,
    tags=("timeseries", "window"),
)
def q_linear_interpolation_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap fill over a dense calendar — the lerp
    companion to gap_fill_forward: missing days get
    prev + (next−prev)·Δt/ΔT from the bracketing observations
    (IGNORE NULLS last/first value over backward/forward windows),
    edges fall back to nearest-neighbor. The dense grid comes from the
    data's own bounds (sequence/generate_series), so the query is
    closed over its input; the two window passes run on |days| rows
    after the daily aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("total")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    j = grid.join(daily, "d", "left").select(
        "d", "total", F.datediff(F.col("d"), F.lit("1970-01-01")).alias("ed")
    )
    wb = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    ed_if_obs = F.when(F.col("total").isNotNull(), F.col("ed"))
    ctx = j.select(
        "d",
        "total",
        "ed",
        F.last("total", ignorenulls=True).over(wb).alias("pv"),
        F.last(ed_if_obs, ignorenulls=True).over(wb).alias("pd"),
        F.first("total", ignorenulls=True).over(wf).alias("nv"),
        F.first(ed_if_obs, ignorenulls=True).over(wf).alias("nd"),
    )
    v = (
        F.when(F.col("total").isNotNull(), F.col("total"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("ed") - F.col("pd"))
            / (F.col("nd") - F.col("pd"))
        )
    )
    return ctx.select("total", v.alias("v")).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.count("total").cast("bigint").alias("n_observed"),
        (F.count("*") - F.count("total")).cast("bigint").alias("n_interpolated"),
        F.round(F.sum("v"), 2).alias("total_filled"),
        F.round(F.avg("v"), 4).alias("mean_filled"),
    )


@register(
    "tpch_q4_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE CAST(o_orderdate AS DATE)
          BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semijoin", "exists"),
)
def q_tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking — a date-window scan of
    orders with a correlated EXISTS against lineitem, grouped by
    priority. The schema has no l_commitdate/l_receiptdate, so "late"
    is l_shipdate > o_orderdate + 30 days (first shipment more than a
    month out). The EXISTS compiles to a LEFT SEMI hash join on
    l_orderkey with the non-equi ship-lag predicate attached; the
    date window prunes orders before the join, and the group count
    runs on |qualifying orders| rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    od = o.filter(
        F.col("o_orderdate")
        .cast("date")
        .between(F.lit("1996-01-01").cast("date"), F.lit("1996-03-31").cast("date"))
    )
    late = (
        od.join(
            li,
            (od["o_orderkey"] == li["l_orderkey"])
            & (
                li["l_shipdate"].cast("date")
                > F.date_add(od["o_orderdate"].cast("date"), 30)
            ),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH value_by_part AS (
      SELECT l_partkey AS partkey,
             sum(l_extendedprice * l_quantity) AS part_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
      GROUP BY l_partkey)
    SELECT partkey, round(part_value, 2) AS part_value
    FROM value_by_part
    WHERE part_value > (SELECT 0.001 * sum(part_value) FROM value_by_part)
    """,
    tags=("tpch", "subquery", "having"),
)
def q_tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important-stock identification — per-part
    inventory value restricted to a supplier nation-group, kept only
    where it exceeds a fraction of the TOTAL value (an uncorrelated
    scalar subquery over the same aggregate). partsupp doesn't exist;
    lineitem is the part↔supplier incidence with
    extendedprice·quantity as the value proxy. The per-part aggregate
    is computed ONCE and reused for both the detail and the total
    (Spark reuses the cached relation; the total is a 1-row broadcast
    cross join, not a second scan pass)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    nat = n.filter(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
    by_part = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(nat), s["s_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("pv"))
    )
    by_part = by_part.persist()
    total = by_part.agg((0.001 * F.sum("pv")).alias("threshold"))
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("pv") > F.col("threshold"))
        .select("partkey", F.round("pv", 2).alias("part_value"))
    )


@register(
    "acf_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT v,
             lag(v, 1) OVER (ORDER BY d) AS v1,
             lag(v, 7) OVER (ORDER BY d) AS v7
      FROM daily)
    SELECT round(corr(v, v1), 4) AS acf_lag1,
           round(corr(v, v7), 4) AS acf_lag7,
           CAST(count(*) AS BIGINT) AS n_days
    FROM lagged
    """,
    tags=("timeseries", "window", "stats"),
)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of the daily revenue series —
    seasonality diagnostics as a window(lag) + corr aggregate. The
    windows run over |days| rows AFTER the daily pre-aggregate, so
    the single-partition ORDER BY is bounded by the calendar, not the
    fact table; Pearson corr ignores the null lead-in pairs in both
    engines."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 7).over(w).alias("v7"),
    )
    return lagged.agg(
        F.round(F.corr("v", "v1"), 4).alias("acf_lag1"),
        F.round(F.corr("v", "v7"), 4).alias("acf_lag7"),
        F.count("*").cast("bigint").alias("n_days"),
    )


@register(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    stats AS (SELECT avg(v) AS m, stddev_samp(v) AS s FROM daily),
    c AS (
      SELECT d,
             sum((v - m) / s) OVER (
               ORDER BY d ROWS UNBOUNDED PRECEDING) AS cu
      FROM daily CROSS JOIN stats)
    SELECT strftime(d, '%Y-%m-%d') AS changepoint_date,
           round(cu, 3) AS cusum
    FROM c ORDER BY abs(cu) DESC, d LIMIT 1
    """,
    tags=("timeseries", "window", "stats"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue: standardize by
    the global mean/σ (1-row broadcast), cumulative-sum in date order,
    report the date of maximum |CUSUM| — the classic mean-shift
    locator. Everything after the daily pre-aggregate is |days| rows;
    the argmax is a top-1 TakeOrderedAndProject, not a full sort."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    stats = daily.agg(
        F.avg("v").alias("m"), F.stddev_samp("v").alias("s")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c = (
        daily.join(F.broadcast(stats))
        .select("d", F.sum((F.col("v") - F.col("m")) / F.col("s")).over(w).alias("cu"))
    )
    return (
        c.orderBy(F.abs(F.col("cu")).desc(), F.col("d"))
        .limit(1)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("changepoint_date"),
            F.round("cu", 3).alias("cusum"),
        )
    )


@register(
    "percentile_disc_bands",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_disc(o_totalprice, 0.5), 2) AS med_disc,
           round(quantile_cont(o_totalprice, 0.5), 2) AS med_cont,
           round(quantile_disc(o_totalprice, 0.9), 2) AS p90_disc
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def q_percentile_disc_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-distribution percentiles per priority band: DISC (an
    actual data value) vs CONT (interpolated) medians side by side —
    the SQL:2008 WITHIN GROUP surface (Spark percentile_disc/
    percentile_cont ≡ DuckDB quantile_disc/quantile_cont). Exact
    percentiles sort within each hash-agg group; the approximate
    t-digest path (approx_percentile) is the 100 TB default and is
    covered by value_percentiles' docstring."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 2
        ).alias("med_disc"),
        F.round(
            F.expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 2
        ).alias("med_cont"),
        F.round(
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)"), 2
        ).alias("p90_disc"),
    )


@register(
    "salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    """,
    tags=("agg", "scale", "skew"),
)
def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe distinct count via explicit salting: event_type has
    few values (every row of a 100 TB feed lands on ≤ |types| reduce
    tasks if grouped directly), so stage 1 groups by
    (event_type, pmod(hash(user_id), 16)) — 16× the parallelism, and
    each user falls in exactly ONE salt bucket so the per-bucket
    DISTINCT counts sum without overlap. Stage 2 reduces 16·|types|
    tiny rows. Same answer as a direct COUNT(DISTINCT), plan shape
    survives arbitrary key skew (operators/scale.py has the general
    helper)."""
    e = _t(spark, sf_dir, "events")
    partial = (
        e.groupBy(
            "event_type",
            F.pmod(F.hash("user_id"), F.lit(16)).alias("salt"),
        )
        .agg(F.count_distinct("user_id").alias("du"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("du").cast("bigint").alias("distinct_users")
    )


@register(
    "tile_binning_webmercator",
    oracle="""
    WITH pts AS (
      SELECT (c_custkey * 37 % 3600) / 10.0 - 180.0 AS lon,
             (c_custkey * 53 % 1600) / 10.0 - 80.0 AS lat,
             c_acctbal
      FROM customer),
    binned AS (
      SELECT CAST(floor((lon + 180.0) / 360.0 * 64) AS BIGINT) AS tile_x,
             CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat)))
                         / pi()) / 2.0 * 64) AS BIGINT) AS tile_y,
             c_acctbal
      FROM pts)
    SELECT tile_x, tile_y,
           CAST(count(*) AS BIGINT) AS n_points,
           round(avg(c_acctbal), 2) AS avg_balance
    FROM binned GROUP BY tile_x, tile_y
    HAVING count(*) >= 5
    """,
    tags=("geo", "binning"),
)
def q_tile_binning_webmercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-mercator slippy-tile binning at z=6 (the XYZ scheme the
    reference's viz product targets via its EPSG:3857 reproject,
    compute_ndvi.py:162-179): lon/lat → (tile_x, tile_y) by the
    standard mercator formula, then a per-tile aggregate. Tile
    assignment is pure column math (ln/tan/radians — whole-stage
    codegen), so at 100 TB this is one map + one hash-agg keyed by
    the tile id; the tile key is ALSO the natural partition key for a
    spatial lake (partition pruning = bbox query). Points are derived
    deterministically from customer so the oracle sees identical
    input."""
    c = _t(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") * 37 % 3600) / 10.0 - 180.0
    lat = (F.col("c_custkey") * 53 % 1600) / 10.0 - 80.0
    n = F.lit(64)
    tile_x = F.floor((lon + 180.0) / 360.0 * n).cast("bigint")
    lat_r = F.radians(lat)
    tile_y = F.floor(
        (1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi) / 2.0 * n
    ).cast("bigint")
    return (
        c.select(tile_x.alias("tile_x"), tile_y.alias("tile_y"), "c_acctbal")
        .groupBy("tile_x", "tile_y")
        .agg(
            F.count("*").cast("bigint").alias("n_points"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
        )
        .filter(F.col("n_points") >= 5)
    )


@register(
    "haversine_nearest_hub",
    oracle="""
    WITH hubs AS (
      SELECT * FROM (VALUES
        ('helsinki', 60.17, 24.94), ('london', 51.51, -0.13),
        ('nyc', 40.71, -74.01), ('tokyo', 35.68, 139.69),
        ('sydney', -33.87, 151.21), ('nairobi', -1.29, 36.82),
        ('sao_paulo', -23.55, -46.63), ('anchorage', 61.22, -149.90)
      ) AS t(hub, hub_lat, hub_lon)),
    pts AS (
      SELECT s_suppkey,
             (s_suppkey * 53 % 1600) / 10.0 - 80.0 AS lat,
             (s_suppkey * 37 % 3600) / 10.0 - 180.0 AS lon
      FROM supplier),
    dists AS (
      SELECT s_suppkey, hub,
             2 * 6371.0 * asin(sqrt(
               pow(sin(radians(hub_lat - lat) / 2), 2)
               + cos(radians(lat)) * cos(radians(hub_lat))
                 * pow(sin(radians(hub_lon - lon) / 2), 2))) AS dist_km,
             row_number() OVER (
               PARTITION BY s_suppkey
               ORDER BY 2 * 6371.0 * asin(sqrt(
                 pow(sin(radians(hub_lat - lat) / 2), 2)
                 + cos(radians(lat)) * cos(radians(hub_lat))
                   * pow(sin(radians(hub_lon - lon) / 2), 2))), hub) AS rn
      FROM pts CROSS JOIN hubs)
    SELECT hub,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(avg(dist_km), 1) AS avg_dist_km
    FROM dists WHERE rn = 1 GROUP BY hub
    """,
    tags=("geo", "join"),
)
def q_haversine_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment by great-circle distance: every point ×
    a tiny broadcast hub dim (the degenerate-but-universal spatial NN
    pattern — |dims| small enough that brute force beats any index),
    haversine in pure column math, per-point argmin via ranked window.
    At 100 TB the cross join stays map-side (8× row amplification,
    no shuffle); the only exchange is the final per-hub rollup of
    |points| pre-argmin rows — and the window's partition key is the
    point id, so it rides the same hash partitioning."""
    s = _t(spark, sf_dir, "supplier")
    hubs = spark.createDataFrame(
        [
            ("helsinki", 60.17, 24.94), ("london", 51.51, -0.13),
            ("nyc", 40.71, -74.01), ("tokyo", 35.68, 139.69),
            ("sydney", -33.87, 151.21), ("nairobi", -1.29, 36.82),
            ("sao_paulo", -23.55, -46.63), ("anchorage", 61.22, -149.90),
        ],
        "hub STRING, hub_lat DOUBLE, hub_lon DOUBLE",
    )
    pts = s.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 53 % 1600) / 10.0 - 80.0).alias("lat"),
        ((F.col("s_suppkey") * 37 % 3600) / 10.0 - 180.0).alias("lon"),
    )
    dist = (
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("hub_lat") - F.col("lat")) / 2), 2)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians("hub_lat"))
                * F.pow(F.sin(F.radians(F.col("hub_lon") - F.col("lon")) / 2), 2)
            )
        )
    )
    w = Window.partitionBy("s_suppkey").orderBy("dist_km", "hub")
    ranked = (
        pts.join(F.broadcast(hubs))
        .withColumn("dist_km", dist)
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .groupBy("hub")
        .agg(
            F.count("*").cast("bigint").alias("n_assigned"),
            F.round(F.avg("dist_km"), 1).alias("avg_dist_km"),
        )
    )


@register(
    "max_concurrency_sweepline",
    oracle="""
    WITH iv AS (
      SELECT CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + CAST(1 + o_orderkey % 28 AS INTEGER) AS e
      FROM orders),
    deltas AS (
      SELECT s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT e AS t, -1 AS delta FROM iv),
    c AS (
      SELECT t, sum(delta) OVER (
        ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS cu
      FROM deltas)
    SELECT CAST(cu AS BIGINT) AS peak_concurrency,
           strftime(t, '%Y-%m-%d') AS peak_date
    FROM c ORDER BY cu DESC, t ASC LIMIT 1
    """,
    tags=("interval", "window"),
)
def q_max_concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency by sweep-line: each order holds a
    synthetic [start, start+1..28d) reservation; explode to ±1 delta
    events, running-sum in (time, delta) order — ends retire before
    same-day starts, the half-open convention — and take the top-1.
    The shape is |2·intervals| narrow rows through ONE global sort;
    at 100 TB the same sweep runs per partition key (resource id)
    with the window partitioned, making the global variant here the
    worst case, and the answer is a TakeOrderedAndProject, never a
    full result sort."""
    o = _t(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (1 + F.col("o_orderkey") % 28).cast("int"),
        ).alias("e"),
    )
    deltas = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta")).unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = Window.orderBy("t", "delta").rowsBetween(Window.unboundedPreceding, 0)
    c = deltas.select("t", F.sum("delta").over(w).alias("cu"))
    return (
        c.orderBy(F.col("cu").desc(), F.col("t").asc())
        .limit(1)
        .select(
            F.col("cu").cast("bigint").alias("peak_concurrency"),
            F.date_format("t", "yyyy-MM-dd").alias("peak_date"),
        )
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS now FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', max(CAST(o_orderdate AS DATE)),
                       (SELECT now FROM mx)) AS recency,
             count(*) AS frequency,
             sum(o_totalprice) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT ntile(5) OVER (ORDER BY recency DESC, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
      FROM rfm)
    SELECT r_score, f_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(m_score), 3) AS avg_m_score
    FROM scored GROUP BY r_score, f_score
    """,
    tags=("window", "segmentation"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency/frequency/
    monetary, quintile-scored with ntile over deterministic
    (metric, key) orders — recency DESC so quintile 5 = most recent,
    matching the marketing convention — then the segment grid with
    customer counts and mean monetary score. ntile's equal-fill
    semantics are identical across engines once the order is total.
    The three global ntiles are single-partition windows over
    |customers| pre-aggregated rows; at 100 TB you'd swap them for
    approx_percentile cutpoints + a join, same grid out."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("now"))
    rfm = (
        o.join(F.broadcast(mx))
        .groupBy("o_custkey", "now")
        .agg(
            F.datediff(F.first("now"), F.max(F.col("o_orderdate").cast("date"))).alias(
                "recency"
            ),
            F.count("*").alias("frequency"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    scored = rfm.select(
        F.ntile(5)
        .over(Window.orderBy(F.col("recency").desc(), F.col("o_custkey")))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").asc(), F.col("o_custkey")))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").asc(), F.col("o_custkey")))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.avg("m_score"), 3).alias("avg_m_score"),
    )


@register(
    "proration_allocation",
    oracle="""
    WITH alloc AS (
      SELECT o_totalprice,
             l_extendedprice
             / sum(l_extendedprice) OVER (PARTITION BY l_orderkey) AS share
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(share * o_totalprice), 2) AS total_allocated,
           round(min(share), 6) AS min_share,
           round(max(share), 6) AS max_share
    FROM alloc
    """,
    tags=("window", "allocation"),
)
def q_proration_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-parent proration: each order's header total allocated
    across its lineitems by extended-price share (the window-sum
    ratio-to-report idiom). The conservation invariant —
    Σ(share·total) = Σ header totals over orders that have lines — is
    what the output checks. One shuffle on l_orderkey serves BOTH the
    window and the join (same key), so the plan reuses the exchange;
    at 100 TB this is the standard one-pass allocation shape."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("l_orderkey")
    alloc = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_totalprice",
        (F.col("l_extendedprice") / F.sum("l_extendedprice").over(w)).alias("share"),
    )
    return alloc.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.sum(F.col("share") * F.col("o_totalprice")), 2).alias(
            "total_allocated"
        ),
        F.round(F.min("share"), 6).alias("min_share"),
        F.round(F.max("share"), 6).alias("max_share"),
    )


@register(
    "repeat_purchase_overlap",
    oracle="""
    WITH baskets AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             list_distinct(list(l_partkey)) AS parts
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, o_orderkey, o_orderdate),
    seq AS (
      SELECT parts,
             lag(parts) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev
      FROM baskets)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN len(list_intersect(parts, prev)) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlapping,
           round(avg(CAST(len(list_intersect(parts, prev)) AS DOUBLE)
                     / len(list_distinct(list_concat(parts, prev)))), 4)
             AS avg_jaccard
    FROM seq WHERE prev IS NOT NULL
    """,
    tags=("window", "array", "basket"),
)
def q_repeat_purchase_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-order basket overlap per customer: collect each
    order's distinct part set, lag the ARRAY column through a window
    (windows over complex types), and score Jaccard with
    array_intersect/array_union — set semantics make the engines'
    different array orders irrelevant. The basket collect and the
    window both key on the customer/order chain: one shuffle for the
    groupBy, one for the per-customer window, both on keys whose
    cardinality scales with the data (no hot key)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = baskets.select("parts", F.lag("parts").over(w).alias("prev")).filter(
        F.col("prev").isNotNull()
    )
    inter = F.size(F.array_intersect("parts", "prev"))
    union = F.size(F.array_union("parts", "prev"))
    return seq.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(F.when(inter > 0, 1).otherwise(0)).cast("bigint").alias("n_overlapping"),
        F.round(F.avg(inter.cast("double") / union), 4).alias("avg_jaccard"),
    )


@register(
    "frequency_cap_window",
    oracle="""
    WITH w AS (
      SELECT event_type,
             count(*) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS cnt_1h
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN cnt_1h > 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_cap,
           round(avg(cnt_1h), 4) AS avg_rate_1h
    FROM w GROUP BY event_type
    """,
    tags=("window", "events", "range-frame"),
)
def q_frequency_cap_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-hour frequency capping: per-user event rate over a
    value-based RANGE frame (trailing 3600 s by the event's own
    timestamp, not row count — peers at the same instant all see the
    same frame in both engines), then the over-cap fraction per type.
    The frame key is unix microseconds so both engines window over
    identical integers. Partitioned by user_id → the window
    parallelizes across users; the 100 TB variant adds a time-bucket
    secondary partition to bound any single user's row run."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    counted = e.select(
        "event_type", F.count("*").over(w).alias("cnt_1h")
    )
    return counted.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("cnt_1h") > 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_over_cap"),
        F.round(F.avg("cnt_1h"), 4).alias("avg_rate_1h"),
    )


@register(
    "trimmed_winsorized_means",
    oracle="""
    WITH cut AS (
      SELECT o_orderpriority AS pr,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority,
           round(avg(o_totalprice), 2) AS mean_raw,
           round(avg(CASE WHEN o_totalprice BETWEEN lo AND hi
                          THEN o_totalprice END), 2) AS mean_trimmed,
           round(avg(least(greatest(o_totalprice, lo), hi)), 2)
             AS mean_winsorized
    FROM orders JOIN cut ON o_orderpriority = pr
    GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile", "robust"),
)
def q_trimmed_winsorized_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust means per priority band: 5th/95th-percentile cutpoints
    (one grouped exact-percentile pass over |groups| rows), broadcast
    back, then trimmed (drop the tails) and winsorized (clamp the
    tails) means next to the raw mean. The two-pass
    cutpoints-then-clamp plan is the scalable robust-mean shape — the
    second pass is a pure map + hash-agg; swap the exact percentile
    for approx_percentile at 100 TB and nothing else changes."""
    o = _t(spark, sf_dir, "orders")
    cut = o.groupBy(F.col("o_orderpriority").alias("pr")).agg(
        F.expr("percentile(o_totalprice, 0.05)").alias("lo"),
        F.expr("percentile(o_totalprice, 0.95)").alias("hi"),
    )
    j = o.join(F.broadcast(cut), F.col("o_orderpriority") == F.col("pr"))
    tp = F.col("o_totalprice")
    return j.groupBy("o_orderpriority").agg(
        F.round(F.avg(tp), 2).alias("mean_raw"),
        F.round(
            F.avg(F.when(tp.between(F.col("lo"), F.col("hi")), tp)), 2
        ).alias("mean_trimmed"),
        F.round(
            F.avg(F.least(F.greatest(tp, F.col("lo")), F.col("hi"))), 2
        ).alias("mean_winsorized"),
    )


@register(
    "set_ops_multiset",
    oracle="""
    WITH a AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01'
                                         AND DATE '1996-06-30'),
    b AS (
      SELECT l_returnflag AS rf, l_linestatus AS ls FROM lineitem
      WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01'
                                         AND DATE '1997-06-30')
    SELECT 'except_all' AS op, rf, ls, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY rf, ls
    UNION ALL
    SELECT 'intersect_all' AS op, rf, ls, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY rf, ls
    """,
    tags=("setops", "multiset"),
)
def q_set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set operations — EXCEPT ALL / INTERSECT ALL preserve
    duplicate COUNTS (bag semantics), unlike the distinct variants in
    set_ops_nations: comparing two half-year slices of lineitem
    status pairs, the except-all count is max(0, n_a − n_b) per value
    and intersect-all is min(n_a, n_b). Spark plans both as a single
    hash aggregate over tagged counts (no join, no distinct) — the
    same one-shuffle shape as a groupBy, which is why bag set-ops
    stay cheap at any scale."""
    li = _t(spark, sf_dir, "lineitem")

    def half(year: int) -> DataFrame:
        return li.filter(
            F.col("l_shipdate")
            .cast("date")
            .between(
                F.lit(f"{year}-01-01").cast("date"),
                F.lit(f"{year}-06-30").cast("date"),
            )
        ).select(F.col("l_returnflag").alias("rf"), F.col("l_linestatus").alias("ls"))

    a, b = half(1996), half(1997)
    ex = (
        a.exceptAll(b)
        .groupBy("rf", "ls")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.lit("except_all").alias("op"), "rf", "ls", "n")
    )
    ix = (
        a.intersectAll(b)
        .groupBy("rf", "ls")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "rf", "ls", "n")
    )
    return ex.unionAll(ix)


@register(
    "bigram_logprob_quality",
    oracle="""
    WITH chars AS (
      SELECT doc_id, lang,
             substring(text, i, 2) AS bg,
             substring(text, i, 1) AS c1
      FROM documents,
           unnest(generate_series(1, len(text) - 1)) AS t(i)),
    model AS (SELECT bg, count(*) AS n_bg FROM chars GROUP BY bg),
    ctx AS (SELECT c1, count(*) AS n_c1 FROM chars GROUP BY c1),
    scored AS (
      SELECT doc_id, lang,
             avg(ln(CAST(n_bg AS DOUBLE) / n_c1)) AS lp
      FROM chars JOIN model USING (bg) JOIN ctx USING (c1)
      GROUP BY doc_id, lang)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(lp), 4) AS mean_logprob,
           round(quantile_cont(lp, 0.1), 4) AS p10_logprob
    FROM scored GROUP BY lang
    """,
    tags=("text", "quality", "lm"),
)
def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring with a character-bigram LM
    trained on the corpus itself: P(b|a) = n(ab)/n(a·), per-doc mean
    log-probability, then the per-language score distribution — the
    cheap statistical-LM filter (out-of-distribution text scores low)
    that sits between heuristic ratios (text_quality) and a real LM.
    The model and context tables are |alphabet|²-sized aggregates →
    broadcast joins back onto the exploded bigram stream; at 100 TB
    you train the model on a hash-sample and the scoring pass stays
    one explode + two broadcast joins + one doc-key hash-agg."""
    d = _t(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1), F.length("text") - 1)).alias("i"),
        "text",
    ).select(
        "doc_id",
        "lang",
        F.expr("substring(text, i, 2)").alias("bg"),
        F.expr("substring(text, i, 1)").alias("c1"),
    )
    model = chars.groupBy("bg").agg(F.count("*").alias("n_bg"))
    ctx = chars.groupBy("c1").agg(F.count("*").alias("n_c1"))
    scored = (
        chars.join(F.broadcast(model), "bg")
        .join(F.broadcast(ctx), "c1")
        .groupBy("doc_id", "lang")
        .agg(F.avg(F.log(F.col("n_bg").cast("double") / F.col("n_c1"))).alias("lp"))
    )
    return scored.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("lp"), 4).alias("mean_logprob"),
        F.round(F.expr("percentile(lp, 0.1)"), 4).alias("p10_logprob"),
    )


@register(
    "new_vs_returning",
    oracle="""
    WITH first_order AS (
      SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_d
      FROM orders GROUP BY o_custkey)
    SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
                    '%Y-%m') AS month,
           CAST(sum(CASE WHEN date_trunc('month', CAST(o_orderdate AS DATE))
                              = date_trunc('month', first_d)
                         THEN 1 ELSE 0 END) AS BIGINT) AS new_orders,
           CAST(sum(CASE WHEN date_trunc('month', CAST(o_orderdate AS DATE))
                              <> date_trunc('month', first_d)
                         THEN 1 ELSE 0 END) AS BIGINT) AS returning_orders,
           round(sum(CASE WHEN date_trunc('month', CAST(o_orderdate AS DATE))
                               = date_trunc('month', first_d)
                          THEN o_totalprice ELSE 0 END), 2) AS new_revenue
    FROM orders JOIN first_order USING (o_custkey)
    GROUP BY 1
    """,
    tags=("cohort", "agg"),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly new-vs-returning split: each order classified by
    whether it falls in its customer's first-purchase month (min-date
    self-aggregate joined back — the first-touch idiom), then
    conditional counts/revenue per calendar month. The first-order
    relation is |customers| rows off the same shuffle key as the
    join; the classification itself is a codegen CASE, so the whole
    query is two hash passes over orders at any scale."""
    o = _t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_d")
    )
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate").cast("date")), "yyyy-MM")
    is_new = F.date_trunc("month", F.col("o_orderdate").cast("date")) == F.date_trunc(
        "month", F.col("first_d")
    )
    return (
        o.join(first, "o_custkey")
        .groupBy(month.alias("month"))
        .agg(
            F.sum(F.when(is_new, 1).otherwise(0)).cast("bigint").alias("new_orders"),
            F.sum(F.when(~is_new, 1).otherwise(0))
            .cast("bigint")
            .alias("returning_orders"),
            F.round(
                F.sum(F.when(is_new, F.col("o_totalprice")).otherwise(0.0)), 2
            ).alias("new_revenue"),
        )
    )


@register(
    "interorder_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders)
    SELECT CASE WHEN gap_days < 7 THEN '0-6d'
                WHEN gap_days < 30 THEN '7-29d'
                WHEN gap_days < 90 THEN '30-89d'
                WHEN gap_days < 365 THEN '90-364d'
                ELSE '365d+' END AS gap_band,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(gap_days), 2) AS avg_gap_days
    FROM gaps WHERE gap_days IS NOT NULL
    GROUP BY 1
    """,
    tags=("window", "histogram"),
)
def q_interorder_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap distribution: per-customer lag on the order
    date (deterministic tie-break by order key), day deltas banded
    into lifecycle buckets. The window partitions by customer — fully
    parallel — and the histogram is a 5-group hash-agg; the same two
    passes at 100 TB, with the band CASE folded into codegen."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    gaps = o.select(
        F.datediff(d, F.lag(d).over(w)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    band = (
        F.when(F.col("gap_days") < 7, "0-6d")
        .when(F.col("gap_days") < 30, "7-29d")
        .when(F.col("gap_days") < 90, "30-89d")
        .when(F.col("gap_days") < 365, "90-364d")
        .otherwise("365d+")
    )
    return gaps.groupBy(band.alias("gap_band")).agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.round(F.avg("gap_days"), 2).alias("avg_gap_days"),
    )


@register(
    "funnel_latency_percentiles",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id),
    conv AS (
      SELECT (epoch_us(first_purchase) - epoch_us(first_view))
             / 3600000000.0 AS hours
      FROM stages
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_cont(hours, 0.5), 3) AS p50_hours,
           round(quantile_cont(hours, 0.9), 3) AS p90_hours,
           round(avg(hours), 3) AS mean_hours
    FROM conv
    """,
    tags=("funnel", "events", "percentile"),
)
def q_funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per-user first view and first
    purchase via conditional MIN aggregates (one hash pass — no
    self-join of the two stages), forward-converting users only, then
    exact latency percentiles. Complements funnel_conversion (which
    counts stage reach): this measures the latency of the
    view→purchase edge. |users| intermediate rows; the percentile is
    the only single-point step and runs on the converted subset."""
    e = _t(spark, sf_dir, "events")
    stages = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = stages.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
            / 3_600_000_000.0
        ).alias("hours")
    )
    return conv.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(hours, 0.5)"), 3).alias("p50_hours"),
        F.round(F.expr("percentile(hours, 0.9)"), 3).alias("p90_hours"),
        F.round(F.avg("hours"), 3).alias("mean_hours"),
    )


@register(
    "tpcds_q36_margin_rank",
    oracle="""
    WITH agg AS (
      SELECT r_name, n_name,
             grouping(r_name) + grouping(n_name) AS lochierarchy,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name))
    SELECT lochierarchy, r_name, n_name, revenue,
           CAST(rank() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN lochierarchy = 0 THEN r_name END
             ORDER BY revenue DESC, n_name NULLS FIRST, r_name NULLS FIRST
           ) AS BIGINT) AS rank_within_parent
    FROM agg
    """,
    tags=("tpcds", "rollup", "window"),
)
def q_tpcds_q36_margin_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36 shape: revenue over a ROLLUP(region, nation)
    hierarchy with rank-within-parent — the window runs ON the
    grouped output, partitioned by hierarchy level (grouping() flags)
    and, at the leaf level, by the parent region, so nations rank
    against their siblings and regions against each other. The rolled
    relation is tiny (|regions|·|nations| + margins), so the ranking
    windows cost nothing; all the work is the one rollup pass over
    the fact join, which Spark executes as a single Expand +
    hash-agg."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    agg = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") + F.grouping("n_name")).alias("lochierarchy"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("r_name")),
    ).orderBy(
        F.col("revenue").desc(),
        F.col("n_name").asc_nulls_first(),
        F.col("r_name").asc_nulls_first(),
    )
    return agg.select(
        "lochierarchy",
        "r_name",
        "n_name",
        "revenue",
        F.rank().over(w).cast("bigint").alias("rank_within_parent"),
    )


@register(
    "spearman_rank_corr",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag,
             rank() OVER (PARTITION BY l_returnflag
                          ORDER BY l_quantity) AS rq,
             rank() OVER (PARTITION BY l_returnflag
                          ORDER BY l_extendedprice) AS rp
      FROM lineitem)
    SELECT l_returnflag,
           round(corr(rq, rp), 4) AS spearman_rho,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked GROUP BY l_returnflag
    """,
    tags=("stats", "window", "rank"),
)
def q_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per return-flag: rank-transform both
    variables (RANK, not row_number — ties must share a rank for the
    statistic to be engine-independent) inside each group, then
    Pearson corr of the ranks. Monotone-relationship detection that
    Pearson misses. The two windows partition by the group key so
    they parallelize; at 100 TB you'd bucket values through
    approx-percentile ranks instead of exact global sorts — same
    downstream corr."""
    li = _t(spark, sf_dir, "lineitem")
    wq = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    wp = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag",
        F.rank().over(wq).alias("rq"),
        F.rank().over(wp).alias("rp"),
    )
    return ranked.groupBy("l_returnflag").agg(
        F.round(F.corr("rq", "rp"), 4).alias("spearman_rho"),
        F.count("*").cast("bigint").alias("n"),
    )


@register(
    "scd2_build",
    oracle="""
    WITH versions AS (
      SELECT user_id, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'signup'),
    spans AS (
      SELECT user_id,
             (epoch_us(valid_to) - epoch_us(valid_from)) / 86400000000.0
               AS span_days,
             CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
      FROM versions)
    SELECT CAST(count(*) AS BIGINT) AS n_versions,
           CAST(sum(is_current) AS BIGINT) AS n_current,
           round(avg(span_days), 4) AS avg_span_days,
           round(max(span_days), 4) AS max_span_days
    FROM spans
    """,
    tags=("scd", "window", "etl"),
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 CONSTRUCTION (the companion to scd2_lookup, which
    queries an existing dimension): each change event opens a version
    row whose validity closes at the user's next change — LEAD over
    (user, time) builds [valid_from, valid_to) intervals in one
    window pass, NULL valid_to marking the current version. Reported
    as version-count / open-count / span stats so the oracle checks
    the interval math, not row order. One shuffle on user_id; the
    dimension build at 100 TB is exactly this plan on the CDC feed."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    span = (
        (F.unix_micros("valid_to") - F.unix_micros("valid_from")) / 86_400_000_000.0
    )
    spans = versions.select(
        span.alias("span_days"),
        F.when(F.col("valid_to").isNull(), 1).otherwise(0).alias("is_current"),
    )
    return spans.agg(
        F.count("*").cast("bigint").alias("n_versions"),
        F.sum("is_current").cast("bigint").alias("n_current"),
        F.round(F.avg("span_days"), 4).alias("avg_span_days"),
        F.round(F.max("span_days"), 4).alias("max_span_days"),
    )


@register(
    "calendar_grid_fill",
    oracle="""
    WITH months AS (
      SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)) AS m
      FROM orders),
    nations AS (SELECT n_nationkey, n_name FROM nation),
    actual AS (
      SELECT n_name,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             sum(o_totalprice) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    grid AS (
      SELECT n.n_name, months.m, coalesce(a.rev, 0.0) AS rev
      FROM nations n CROSS JOIN months
      LEFT JOIN actual a ON a.n_name = n.n_name AND a.m = months.m)
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(CASE WHEN rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_active_months,
           round(sum(rev), 2) AS total_rev
    FROM grid GROUP BY n_name
    """,
    tags=("densification", "join"),
)
def q_calendar_grid_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar-grid densification: nations × observed months
    cross join (both sides tiny — the grid is |dims|·|periods|, never
    fact-sized), zero-filled from the monthly revenue aggregate via
    LEFT join, then per-nation coverage. The reporting idiom that
    makes downstream window math safe (no missing-period holes). The
    fact table is touched once, for the aggregate; the densification
    happens entirely on broadcastable relations."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    month = F.date_trunc("month", F.col("o_orderdate").cast("date"))
    months = o.select(month.alias("m")).distinct()
    actual = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", month.alias("m"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    grid = (
        n.select("n_name")
        .crossJoin(F.broadcast(months))
        .join(actual, ["n_name", "m"], "left")
        .select("n_name", "m", F.coalesce("rev", F.lit(0.0)).alias("rev"))
    )
    return grid.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.sum(F.when(F.col("rev") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_active_months"),
        F.round(F.sum("rev"), 2).alias("total_rev"),
    )


@register(
    "rolling_median_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    win AS (
      SELECT d, v,
             list_sort(list(v) OVER (
               ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS ws
      FROM daily)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(avg(ws[(len(ws) + 1) // 2]), 2) AS mean_rolling_median,
           round(max(ws[(len(ws) + 1) // 2]), 2) AS max_rolling_median
    FROM win WHERE len(ws) = 7
    """,
    tags=("window", "median", "timeseries"),
)
def q_rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 7-day exact median of daily revenue — an order statistic
    over a sliding frame, which no engine exposes as a native window
    aggregate, built portably as collect-the-frame → sort → index
    (lower median, (n+1)//2, stated identically in both SQLs). The
    frame is 7 elements so the per-row array cost is constant; the
    window runs on the |days| post-aggregate. The 100 TB variant
    replaces the collect with two heaps in a stateful streaming op or
    an approx sketch; the relational statement here is the oracle
    semantics."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("d").rowsBetween(-6, 0)
    win = daily.select(
        "d", F.array_sort(F.collect_list("v").over(w)).alias("ws")
    ).filter(F.size("ws") == 7)
    med = F.element_at("ws", ((F.size("ws") + 1) / 2).cast("int"))
    return win.select(med.alias("m")).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.avg("m"), 2).alias("mean_rolling_median"),
        F.round(F.max("m"), 2).alias("max_rolling_median"),
    )


@register(
    "largest_remainder_apportionment",
    oracle="""
    WITH rev AS (
      SELECT n_name, sum(o_totalprice) AS r
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name),
    quota AS (
      SELECT n_name, r,
             100.0 * r / sum(r) OVER () AS q,
             CAST(floor(100.0 * r / sum(r) OVER ()) AS BIGINT) AS base
      FROM rev),
    ranked AS (
      SELECT n_name, base, q - base AS frac,
             row_number() OVER (ORDER BY q - base DESC, n_name) AS rn,
             100 - sum(base) OVER () AS leftover
      FROM quota)
    SELECT n_name,
           CAST(base + CASE WHEN rn <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS seats,
           round(frac, 6) AS remainder
    FROM ranked
    """,
    tags=("window", "apportionment"),
)
def q_largest_remainder_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment: allocate 100
    integer 'seats' to nations in proportion to revenue — floor each
    quota, then hand the leftover seats to the largest fractional
    remainders (deterministic name tie-break). Integer outputs make
    the oracle check exact. The shape is a grouped aggregate followed
    by three global windows over |nations| rows — the windows run on
    the tiny post-aggregate, never the fact table, which is the rule
    for every 'global total' reporting query at scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("r"))
    )
    wall = Window.partitionBy()
    q = 100.0 * F.col("r") / F.sum("r").over(wall)
    quota = rev.select(
        "n_name", q.alias("q"), F.floor(q).cast("bigint").alias("base")
    )
    ranked = quota.select(
        "n_name",
        "base",
        (F.col("q") - F.col("base")).alias("frac"),
        F.row_number()
        .over(Window.orderBy((F.col("q") - F.col("base")).desc(), F.col("n_name")))
        .alias("rn"),
        (100 - F.sum("base").over(wall)).alias("leftover"),
    )
    return ranked.select(
        "n_name",
        (
            F.col("base") + F.when(F.col("rn") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("seats"),
        F.round("frac", 6).alias("remainder"),
    )


@register(
    "cross_sell_gap",
    oracle="""
    WITH bought AS (
      SELECT DISTINCT o_custkey, p_brand
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand IN ('Brand#1', 'Brand#2'))
    SELECT CAST(count(*) AS BIGINT) AS n_gap_customers,
           round(avg(c_acctbal), 2) AS avg_balance
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM bought WHERE p_brand = 'Brand#1')
      AND c_custkey NOT IN (SELECT o_custkey FROM bought WHERE p_brand = 'Brand#2')
    """,
    tags=("semijoin", "antijoin", "crosssell"),
)
def q_cross_sell_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sell gap: customers who bought Brand#1 but never Brand#2
    — a semi join composed with an anti join off ONE shared
    customer×brand incidence relation (deduped before either join so
    the probe sides stay |customers|-sized, and the brand filter
    prunes the fact scan first). The audience-building shape behind
    every 'bought X, target with Y' campaign; both joins key on
    customer so they ride the same exchange."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    c = _t(spark, sf_dir, "customer")
    bought = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            F.broadcast(p.filter(F.col("p_brand").isin("Brand#1", "Brand#2"))),
            li["l_partkey"] == p["p_partkey"],
        )
        .select("o_custkey", "p_brand")
        .distinct()
    )
    b1 = bought.filter(F.col("p_brand") == "Brand#1").select("o_custkey")
    b2 = bought.filter(F.col("p_brand") == "Brand#2").select("o_custkey")
    gap = (
        c.join(b1, c["c_custkey"] == b1["o_custkey"], "left_semi")
        .join(b2, c["c_custkey"] == b2["o_custkey"], "left_anti")
    )
    return gap.agg(
        F.count("*").cast("bigint").alias("n_gap_customers"),
        F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
    )


@register(
    "never_discounted_parts",
    oracle="""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(avg(p_retailprice), 2) AS avg_retail
    FROM part
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_partkey = p_partkey AND l_discount > 0.08)
    GROUP BY p_brand
    """,
    tags=("antijoin", "predicate-join"),
)
def q_never_discounted_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join WITH a join-side predicate: parts that were never
    sold at a deep (>8%) discount — NOT EXISTS over (key match AND
    condition). The condition lives INSIDE the anti join (the
    lineitem side is filtered before the hash build, so the join
    carries only deep-discount rows — far smaller than the full fact
    at any scale), which is exactly how Catalyst plans the NOT
    EXISTS; parts with no sales at all qualify too, matching the SQL
    semantics."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    deep = li.filter(F.col("l_discount") > 0.08).select("l_partkey")
    return (
        p.join(deep, p["p_partkey"] == deep["l_partkey"], "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 2).alias("avg_retail"),
        )
    )


@register(
    "query_likelihood_lm",
    oracle="""
    WITH words AS (
      SELECT doc_id, w
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
      WHERE w <> ''),
    doclen AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
    corpus AS (SELECT w, count(*) AS cf FROM words GROUP BY w),
    total AS (SELECT sum(cf) AS big_c FROM corpus),
    tf AS (
      SELECT doc_id, w, count(*) AS tf FROM words
      WHERE w IN ('spark', 'join', 'data') GROUP BY doc_id, w),
    scored AS (
      SELECT d.doc_id,
             sum(ln(0.7 * coalesce(tf.tf, 0) / dl.dl
                    + 0.3 * c.cf / t.big_c)) AS ql
      FROM (SELECT DISTINCT doc_id FROM words) d
      CROSS JOIN (SELECT w, cf FROM corpus
                  WHERE w IN ('spark', 'join', 'data')) c
      CROSS JOIN total t
      JOIN doclen dl ON dl.doc_id = d.doc_id
      LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.w = c.w
      GROUP BY d.doc_id)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(ql), 4) AS mean_ql,
           round(max(ql), 4) AS best_ql
    FROM scored
    """,
    tags=("text", "retrieval", "lm"),
)
def q_query_likelihood_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Jelinek–Mercer smoothing:
    score(d) = Σ_q ln(λ·tf/|d| + (1−λ)·cf/|C|) for the query terms —
    the statistical-LM ranking family next to BM25 (bm25_rank) and
    TF-IDF. Corpus stats (cf, |C|) are tiny broadcast relations; the
    per-doc term frequencies come from ONE explode pass filtered to
    the query terms, and docs missing a term still score via the
    smoothed background — the LEFT join that makes smoothing work.
    Reported as corpus-level score stats so the oracle pins every
    doc's score through the aggregate."""
    d = _t(spark, sf_dir, "documents")
    terms = ["spark", "join", "data"]
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    doclen = words.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = words.groupBy("w").agg(F.count("*").alias("cf"))
    total = corpus.agg(F.sum("cf").alias("big_c"))
    tf = (
        words.filter(F.col("w").isin(terms))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    qterms = corpus.filter(F.col("w").isin(terms))
    scored = (
        doclen.crossJoin(F.broadcast(qterms))
        .crossJoin(F.broadcast(total))
        .join(tf, ["doc_id", "w"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    0.7 * F.coalesce(F.col("tf"), F.lit(0)) / F.col("dl")
                    + 0.3 * F.col("cf") / F.col("big_c")
                )
            ).alias("ql")
        )
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("ql"), 4).alias("mean_ql"),
        F.round(F.max("ql"), 4).alias("best_ql"),
    )


@register(
    "division_relational",
    oracle="""
    WITH target AS (
      SELECT DISTINCT p_brand FROM part
      WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')),
    covered AS (
      SELECT l_suppkey, count(DISTINCT p_brand) AS n_brands
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      GROUP BY l_suppkey)
    SELECT CAST(count(*) AS BIGINT) AS n_full_coverage,
           round(avg(s_acctbal), 2) AS avg_balance
    FROM supplier
    JOIN covered ON s_suppkey = l_suppkey
    WHERE n_brands = (SELECT count(*) FROM target)
    """,
    tags=("division", "agg", "forall"),
)
def q_division_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division — suppliers that have shipped EVERY brand
    in the target set (the universal-quantifier query that SQL has no
    operator for): count distinct covered brands per supplier and
    keep those matching the divisor's cardinality. The
    count-equals-|divisor| rewrite turns ∀ into one hash aggregate —
    no nested NOT EXISTS double negation, no |suppliers|×|brands|
    cross join — and the divisor count is a 1-row broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    brands = ["Brand#1", "Brand#2", "Brand#3"]
    target_n = (
        p.filter(F.col("p_brand").isin(brands))
        .select("p_brand")
        .distinct()
        .agg(F.count("*").alias("target_n"))
    )
    covered = (
        li.join(
            F.broadcast(p.filter(F.col("p_brand").isin(brands))),
            li["l_partkey"] == p["p_partkey"],
        )
        .groupBy("l_suppkey")
        .agg(F.count_distinct("p_brand").alias("n_brands"))
    )
    return (
        s.join(covered, s["s_suppkey"] == covered["l_suppkey"])
        .join(F.broadcast(target_n))
        .filter(F.col("n_brands") == F.col("target_n"))
        .agg(
            F.count("*").cast("bigint").alias("n_full_coverage"),
            F.round(F.avg("s_acctbal"), 2).alias("avg_balance"),
        )
    )


@register(
    "topk_with_ties",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY round(o_totalprice, -3) DESC) AS rk,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY round(o_totalprice, -3) DESC,
                                         o_orderkey) AS rn
      FROM orders)
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS topk_with_ties,
           CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS topk_row_number
    FROM r GROUP BY o_orderpriority
    """,
    tags=("window", "topk", "ties"),
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES vs without: RANK keeps every row tied with the
    k-th (the SQL:2008 FETCH FIRST k WITH TIES semantics), row_number
    cuts at exactly k — the counts per group expose the difference
    (prices are coarsened to the nearest thousand so ties genuinely
    occur). Same single window sort serves both functions; at scale
    a top-k-per-group pre-aggregation would bound the sort input."""
    o = _t(spark, sf_dir, "orders")
    coarse = F.round(F.col("o_totalprice"), -3)
    wr = Window.partitionBy("o_orderpriority").orderBy(coarse.desc())
    wn = Window.partitionBy("o_orderpriority").orderBy(
        coarse.desc(), F.col("o_orderkey")
    )
    r = o.select(
        "o_orderpriority",
        F.rank().over(wr).alias("rk"),
        F.row_number().over(wn).alias("rn"),
    )
    return r.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("rk") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("topk_with_ties"),
        F.sum(F.when(F.col("rn") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("topk_row_number"),
    )


@register(
    "error_burn_rate",
    oracle="""
    WITH buckets AS (
      SELECT to_timestamp(floor(epoch(ts) / 900) * 900) AS b15,
             to_timestamp(floor(epoch(ts) / 3600) * 3600) AS b60,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events),
    fine AS (
      SELECT b15, min(b60) AS b60,
             CAST(sum(is_err) AS DOUBLE) / count(*) AS err_rate_15m
      FROM buckets GROUP BY b15),
    coarse AS (
      SELECT b60, CAST(sum(is_err) AS DOUBLE) / count(*) AS err_rate_1h
      FROM buckets GROUP BY b60)
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN err_rate_15m > 0.25 AND err_rate_1h > 0.22
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_burn_alerts,
           round(avg(err_rate_15m), 4) AS mean_15m_rate
    FROM fine JOIN coarse USING (b60)
    """,
    tags=("sre", "events", "window"),
)
def q_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window burn-rate alerting (the SRE error-budget idiom):
    error rate per 15-min bucket AND per enclosing hour, alert only
    when BOTH exceed their thresholds — fast windows catch the spike,
    slow windows stop flapping. One scan feeds both granularities
    (the hour key is derived in the same pass and carried through the
    fine aggregate via min — no second read); the join is
    |15-min buckets| vs |hours|, trivially broadcastable forever."""
    e = _t(spark, sf_dir, "events")
    epoch = F.unix_timestamp("ts")
    buckets = e.select(
        F.timestamp_seconds(F.floor(epoch / 900) * 900).alias("b15"),
        F.timestamp_seconds(F.floor(epoch / 3600) * 3600).alias("b60"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
    )
    fine = buckets.groupBy("b15").agg(
        F.min("b60").alias("b60"),
        (F.sum("is_err").cast("double") / F.count("*")).alias("err_rate_15m"),
    )
    coarse = buckets.groupBy("b60").agg(
        (F.sum("is_err").cast("double") / F.count("*")).alias("err_rate_1h")
    )
    j = fine.join(F.broadcast(coarse), "b60")
    return j.agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum(
            F.when(
                (F.col("err_rate_15m") > 0.25) & (F.col("err_rate_1h") > 0.22), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_burn_alerts"),
        F.round(F.avg("err_rate_15m"), 4).alias("mean_15m_rate"),
    )


@register(
    "ndvi_percentile_composite",
    oracle=None,  # placeholder replaced below (needs _TS_NDVI_SQL)
    tags=("ndvi", "timeseries", "percentile"),
)
def q_ndvi_percentile_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pixel 90th-percentile temporal composite — the
    outlier-robust alternative to the greenest-pixel max
    (ndvi_annual_composite): a max composite keeps sensor spikes, the
    high-percentile composite rejects them while preserving peak
    greenness. Exact interpolated percentile per (year, pixel) group
    — small groups (|periods/year|), so the per-group sort is
    constant work and the plan is the same single hash-agg cascade
    as the max composite."""
    nv = _ts_ndvi_df(spark, sf_dir).withColumn(
        "yr", F.floor(F.col("period") / F.lit(100.0)).cast("int")
    )
    comp = (
        nv.filter(F.col("ndvi").isNotNull())
        .groupBy("yr", "y", "x")
        .agg(
            F.expr("percentile(ndvi, 0.9)").alias("cv"),
            F.count("*").alias("n_obs"),
        )
    )
    return comp.groupBy("yr").agg(
        F.count("*").cast("bigint").alias("n_pixels"),
        F.round(F.avg("cv"), 6).alias("mean_composite"),
        F.round(F.avg(F.col("n_obs").cast("double")), 2).alias("mean_obs"),
    )


_spec_npc = REGISTRY["ndvi_percentile_composite"]
REGISTRY["ndvi_percentile_composite"] = QuerySpec(
    _spec_npc.builder,
    _TS_NDVI_SQL
    + """
    , comp AS (
      SELECT CAST(floor(period / 100.0) AS INT) AS yr, y, x,
             quantile_cont(ndvi, 0.9) AS cv, count(*) AS n_obs
      FROM nv WHERE ndvi IS NOT NULL GROUP BY 1, 2, 3
    )
    SELECT yr, CAST(count(*) AS BIGINT) AS n_pixels,
           round(avg(cv), 6) AS mean_composite,
           round(avg(CAST(n_obs AS DOUBLE)), 2) AS mean_obs
    FROM comp GROUP BY yr
    """,
    _spec_npc.headline,
    _spec_npc.tags,
)


@register(
    "centroid_pairwise_distances",
    oracle="""
    WITH dims AS (
      SELECT label, dim, embedding[dim] AS v
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(dim)),
    centroids AS (
      SELECT label, dim, avg(v) AS c FROM dims GROUP BY label, dim),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             sqrt(sum((a.c - b.c) * (a.c - b.c))) AS dist
      FROM centroids a JOIN centroids b ON a.dim = b.dim
      WHERE a.label < b.label
      GROUP BY a.label, b.label)
    SELECT label_a, label_b, round(dist, 5) AS dist
    FROM pairs
    """,
    tags=("embeddings", "similarity", "geometry"),
)
def q_centroid_pairwise_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-class centroid distance matrix — the class-separability
    diagnostic behind nearest-centroid classification
    (centroid_classify): per-label mean vector via explode +
    (label, dim) hash-agg, then all label pairs joined on dim and
    reduced to Euclidean distances. |labels|²·dims intermediate rows
    — centroids are a broadcastable relation no matter how many
    embeddings fed them, so the pairwise stage never scales with the
    corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select("label", (F.col("pos") + 1).alias("dim"), "v")
    cent = dims.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    a = cent.alias("a")
    b = cent.alias("b")
    pairs = (
        a.join(b, (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(
            F.sqrt(
                F.sum((F.col("a.c") - F.col("b.c")) * (F.col("a.c") - F.col("b.c")))
            ).alias("dist")
        )
    )
    return pairs.select("label_a", "label_b", F.round("dist", 5).alias("dist"))


@register(
    "backlog_aging_waterfall",
    oracle="""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS today FROM orders),
    open_orders AS (
      SELECT date_diff('day', CAST(o_orderdate AS DATE),
                       (SELECT today FROM ref)) AS age_days,
             o_totalprice
      FROM orders WHERE o_orderstatus IN ('O', 'P'))
    SELECT CASE WHEN age_days < 30 THEN 'a_0_29'
                WHEN age_days < 90 THEN 'b_30_89'
                WHEN age_days < 365 THEN 'c_90_364'
                ELSE 'd_365_plus' END AS age_band,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS open_value
    FROM open_orders GROUP BY 1
    """,
    tags=("aging", "agg"),
)
def q_backlog_aging_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: unfinished orders bucketed by age
    against the data's own as-of date (max order date — closed over
    the input, no wall clock), with count and open value per band —
    the receivables/backlog waterfall every ops dashboard carries.
    One scan, one 4-group agg; the as-of date is a 1-row broadcast."""
    o = _t(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("today"))
    open_orders = (
        o.filter(F.col("o_orderstatus").isin("O", "P"))
        .join(F.broadcast(ref))
        .select(
            F.datediff(F.col("today"), F.col("o_orderdate").cast("date")).alias(
                "age_days"
            ),
            "o_totalprice",
        )
    )
    band = (
        F.when(F.col("age_days") < 30, "a_0_29")
        .when(F.col("age_days") < 90, "b_30_89")
        .when(F.col("age_days") < 365, "c_90_364")
        .otherwise("d_365_plus")
    )
    return open_orders.groupBy(band.alias("age_band")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("open_value"),
    )


@register(
    "variance_decomposition",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, avg(o_totalprice) AS mu_i, count(*) AS n_i
      FROM orders GROUP BY o_custkey),
    gstat AS (
      SELECT avg(o_totalprice) AS mu, var_pop(o_totalprice) AS var_total,
             count(*) AS n
      FROM orders),
    within AS (
      SELECT avg((o.o_totalprice - p.mu_i) * (o.o_totalprice - p.mu_i))
        AS var_within
      FROM orders o JOIN per_cust p ON o.o_custkey = p.o_custkey),
    between_c AS (
      SELECT sum(p.n_i * (p.mu_i - g.mu) * (p.mu_i - g.mu)) / g.n
        AS var_between
      FROM per_cust p CROSS JOIN gstat g GROUP BY g.n)
    SELECT round(g.var_total, 2) AS var_total,
           round(w.var_within, 2) AS var_within,
           round(b.var_between, 2) AS var_between,
           round(w.var_within + b.var_between - g.var_total, 4) AS residual
    FROM gstat g CROSS JOIN within w CROSS JOIN between_c b
    """,
    tags=("stats", "decomposition"),
)
def q_variance_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Law-of-total-variance decomposition: order-value variance split
    into within-customer and between-customer components (the ANOVA
    identity — residual pinned ≈ 0 makes the oracle check the
    algebra, not just the numbers). Per-customer moments are one
    hash-agg; the within term re-joins them to the facts on the SAME
    key, so the join inherits the aggregate's partitioning — two
    passes over orders total, no window, no sort, at any scale."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("mu_i"), F.count("*").alias("n_i")
    )
    glob = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.var_pop("o_totalprice").alias("var_total"),
        F.count("*").alias("n"),
    )
    dev = F.col("o_totalprice") - F.col("mu_i")
    within = o.join(per_cust, "o_custkey").agg(
        F.avg(dev * dev).alias("var_within")
    )
    bdev = F.col("mu_i") - F.col("mu")
    between = (
        per_cust.join(F.broadcast(glob))
        .groupBy("n")
        .agg((F.sum(F.col("n_i") * bdev * bdev) / F.col("n")).alias("var_between"))
    )
    return (
        glob.join(F.broadcast(within))
        .join(F.broadcast(between.select("var_between")))
        .select(
            F.round("var_total", 2).alias("var_total"),
            F.round("var_within", 2).alias("var_within"),
            F.round("var_between", 2).alias("var_between"),
            F.round(
                F.col("var_within") + F.col("var_between") - F.col("var_total"), 4
            ).alias("residual"),
        )
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('month', min(CAST(o_orderdate AS DATE))) AS cohort_m
      FROM orders GROUP BY o_custkey),
    cohort_sizes AS (
      SELECT cohort_m, count(*) AS cohort_n FROM firsts GROUP BY cohort_m),
    monthly AS (
      SELECT f.cohort_m,
             date_diff('month', f.cohort_m,
                       date_trunc('month', CAST(o.o_orderdate AS DATE)))
               AS age_m,
             sum(o.o_totalprice) AS rev
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2),
    cumulative AS (
      SELECT cohort_m, age_m,
             sum(rev) OVER (PARTITION BY cohort_m ORDER BY age_m
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM monthly)
    SELECT age_m,
           CAST(count(*) AS BIGINT) AS n_cohorts,
           round(avg(c.cum_rev / s.cohort_n), 2) AS avg_ltv_per_customer
    FROM cumulative c JOIN cohort_sizes s USING (cohort_m)
    WHERE age_m <= 12
    GROUP BY age_m
    """,
    tags=("cohort", "ltv", "window"),
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV accumulation curve: revenue per (cohort, months
    since first order), cumulated within cohort, normalized per
    cohort member, averaged across cohorts — the customer-lifetime
    curve next to retention_cohorts' activity counts. Everything
    after the first-order join runs on the |cohorts|×|ages| grid; the
    cumulative window partitions by cohort so no global sort exists
    anywhere."""
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min(F.col("o_orderdate").cast("date"))).alias(
            "cohort_m"
        )
    )
    sizes = firsts.groupBy("cohort_m").agg(F.count("*").alias("cohort_n"))
    age = F.months_between(
        F.date_trunc("month", F.col("o_orderdate").cast("date")), F.col("cohort_m")
    ).cast("long")
    monthly = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort_m", age.alias("age_m"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cumulative = monthly.select(
        "cohort_m", "age_m", F.sum("rev").over(w).alias("cum_rev")
    )
    return (
        cumulative.join(F.broadcast(sizes), "cohort_m")
        .filter(F.col("age_m") <= 12)
        .groupBy("age_m")
        .agg(
            F.count("*").cast("bigint").alias("n_cohorts"),
            F.round(F.avg(F.col("cum_rev") / F.col("cohort_n")), 2).alias(
                "avg_ltv_per_customer"
            ),
        )
    )


@register(
    "seasonal_index_monthly",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(CAST(o_orderdate AS DATE), '%m') AS INT) AS cal_m,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2),
    base AS (SELECT avg(rev) AS overall FROM monthly)
    SELECT cal_m,
           round(avg(rev / overall), 4) AS seasonal_index,
           CAST(count(*) AS BIGINT) AS n_years
    FROM monthly CROSS JOIN base
    GROUP BY cal_m
    """,
    tags=("timeseries", "seasonality"),
)
def q_seasonal_index_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative monthly seasonal index: each calendar month's
    average revenue ratio to the overall monthly mean — the
    decomposition step before any deseasonalized trend fit (the NDVI
    phenology analog on business data). Runs entirely on the
    |months| pre-aggregate with a 1-row broadcast base; index > 1 =
    month runs hot."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.month(F.col("o_orderdate").cast("date")).alias("cal_m"),
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
    ).agg(F.sum("o_totalprice").alias("rev"))
    base = monthly.agg(F.avg("rev").alias("overall"))
    return (
        monthly.join(F.broadcast(base))
        .groupBy("cal_m")
        .agg(
            F.round(F.avg(F.col("rev") / F.col("overall")), 4).alias(
                "seasonal_index"
            ),
            F.count("*").cast("bigint").alias("n_years"),
        )
    )


def _ring_values_sql() -> str:
    rows = ", ".join(
        f"({i}, {x!r}, {y!r})" for i, (x, y) in enumerate(_AOI_RING)
    )
    return f"(VALUES {rows}) AS ring(i, x, y)"


@register(
    "polygon_shoelace_metrics",
    oracle=None,  # finalized below from _AOI_RING
    tags=("geo", "window"),
)
def q_polygon_shoelace_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace polygon area + perimeter over a vertex relation: pair
    each vertex with its successor via modular index join (closing
    edge included — the wrap that LEAD alone can't express), then the
    cross-product half-sum and edge-length sum. The concave test ring
    (the AOI from the clip queries) pins signed-area handling via
    abs(). Vertex tables for real cadastres are millions of rows per
    polygon set; the join keys on (polygon, (i+1) mod n) so each
    polygon's edges stay co-partitioned."""
    n = len(_AOI_RING)
    ring = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(_AOI_RING)],
        "i INT, x DOUBLE, y DOUBLE",
    )
    nxt = ring.select(
        F.col("i").alias("j"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    edges = ring.join(nxt, F.pmod(F.col("i") + 1, F.lit(n)) == F.col("j"))
    cross = F.col("x") * F.col("y2") - F.col("x2") * F.col("y")
    seg = F.sqrt(
        F.pow(F.col("x2") - F.col("x"), 2) + F.pow(F.col("y2") - F.col("y"), 2)
    )
    return edges.agg(
        F.round(F.abs(F.sum(cross)) / 2.0, 4).alias("area"),
        F.round(F.sum(seg), 4).alias("perimeter"),
        F.count("*").cast("bigint").alias("n_edges"),
    )


_spec_shoe = REGISTRY["polygon_shoelace_metrics"]
REGISTRY["polygon_shoelace_metrics"] = QuerySpec(
    _spec_shoe.builder,
    f"""
    WITH ring AS (SELECT * FROM {_ring_values_sql()}),
    edges AS (
      SELECT r.x, r.y, s.x AS x2, s.y AS y2
      FROM ring r JOIN ring s ON (r.i + 1) % {len(_AOI_RING)} = s.i)
    SELECT round(abs(sum(x * y2 - x2 * y)) / 2.0, 4) AS area,
           round(sum(sqrt((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y))), 4)
             AS perimeter,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM edges
    """,
    _spec_shoe.headline,
    _spec_shoe.tags,
)


@register(
    "time_weighted_average",
    oracle="""
    WITH seg AS (
      SELECT user_id, value,
             (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
              - epoch_us(ts)) / 1000000.0 AS dur_s
      FROM events WHERE event_type = 'view'),
    twa AS (
      SELECT user_id,
             sum(value * dur_s) / sum(dur_s) AS twa_value,
             CAST(count(*) AS BIGINT) AS n_segments
      FROM seg WHERE dur_s IS NOT NULL AND dur_s > 0
      GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(twa_value), 4) AS mean_twa,
           round(max(twa_value), 4) AS max_twa
    FROM twa
    """,
    tags=("timeseries", "window", "integral"),
)
def q_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of a step function: each observation
    holds until the user's next one (LEAD gives the segment
    duration), TWA = Σ v·Δt / Σ Δt — the correct mean for
    irregularly-sampled gauges (balances, queue depths, sensor
    readings), where the arithmetic mean over-weights busy periods.
    One window pass keyed by user, then a per-user weighted agg on
    the same key — single shuffle end to end."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "value",
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1_000_000.0
        ).alias("dur_s"),
    )
    twa = (
        seg.filter(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
        .groupBy("user_id")
        .agg(
            (F.sum(F.col("value") * F.col("dur_s")) / F.sum("dur_s")).alias(
                "twa_value"
            ),
            F.count("*").cast("bigint").alias("n_segments"),
        )
    )
    return twa.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg("twa_value"), 4).alias("mean_twa"),
        F.round(F.max("twa_value"), 4).alias("max_twa"),
    )


@register(
    "chained_growth_rate",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1),
    factors AS (
      SELECT m, rev / lag(rev) OVER (ORDER BY m) AS f
      FROM monthly),
    yearly AS (
      SELECT CAST(strftime(m, '%Y') AS INT) AS yr,
             exp(sum(ln(f))) AS chained,
             CAST(count(*) AS BIGINT) AS n_months,
             round(min(f), 4) AS worst_month,
             round(max(f), 4) AS best_month
      FROM factors WHERE f IS NOT NULL
      GROUP BY 1)
    SELECT yr, round(chained, 4) AS chained_growth,
           n_months, worst_month, best_month
    FROM yearly
    """,
    tags=("timeseries", "product-agg"),
)
def q_chained_growth_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained (compounded) growth per year: monthly growth factors
    multiplied via the exp-Σ-ln product aggregate — SQL has no
    PRODUCT(), so the log-space identity is how index chaining,
    compound returns and survival products are computed relationally
    (growth factors are strictly positive, so the logs are safe).
    Window + aggregate both run on the |months| pre-aggregate."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("m")
    factors = monthly.select(
        "m", (F.col("rev") / F.lag("rev").over(w)).alias("f")
    ).filter(F.col("f").isNotNull())
    return (
        factors.groupBy(F.year("m").alias("yr"))
        .agg(
            F.round(F.exp(F.sum(F.log("f"))), 4).alias("chained_growth"),
            F.count("*").cast("bigint").alias("n_months"),
            F.round(F.min("f"), 4).alias("worst_month"),
            F.round(F.max("f"), 4).alias("best_month"),
        )
    )


@register(
    "hll_sketch_rollup",
    oracle="""
    SELECT r_name,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           TRUE AS estimate_within_5pct
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("approx", "sketch", "rollup"),
)
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch persistence + merge-on-read (the pattern behind every
    100 TB distinct-count dashboard): per-NATION HLL sketches of
    ordering customers built once (hll_sketch_agg, Apache
    DataSketches — a BINARY column you could store in the lake), then
    UNIONED up to regions (hll_union_agg) without touching raw data
    again — mergeability is the whole point; re-aggregation to any
    coarser grain is sketch-sized work. The oracle pins the EXACT
    per-region counts and the estimate-within-5% contract (the same
    banded-contract device as approx_distinct_bands), so the rollup's
    correctness is hash-checked even though sketches differ across
    engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    base = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    nation_sketches = base.groupBy("r_name", "n_name").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
    )
    merged = nation_sketches.groupBy("r_name").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = base.groupBy("r_name").agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_customers")
    )
    return (
        exact.join(merged, "r_name")
        .select(
            "r_name",
            "exact_customers",
            (
                F.abs(F.col("est") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            ).alias("estimate_within_5pct"),
        )
    )


@register(
    "rrf_rank_fusion",
    oracle="""
    WITH metrics AS (
      SELECT s_suppkey, s_name, s_acctbal,
             coalesce(rev, 0.0) AS rev
      FROM supplier LEFT JOIN (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY l_suppkey) r ON s_suppkey = l_suppkey),
    ranked AS (
      SELECT s_suppkey, s_name,
             row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey)
               AS rank_bal,
             row_number() OVER (ORDER BY rev DESC, s_suppkey) AS rank_rev
      FROM metrics),
    fused AS (
      SELECT s_suppkey, s_name, rank_bal, rank_rev,
             1.0 / (60 + rank_bal) + 1.0 / (60 + rank_rev) AS rrf
      FROM ranked)
    SELECT s_name,
           round(rrf, 6) AS rrf_score,
           CAST(rank_bal AS BIGINT) AS rank_bal,
           CAST(rank_rev AS BIGINT) AS rank_rev
    FROM fused ORDER BY rrf DESC, s_suppkey LIMIT 10
    """,
    tags=("retrieval", "ranking", "fusion"),
)
def q_rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion — the standard way to blend rankings
    from incomparable scorers (BM25 + vector similarity in a real
    retrieval stack; balance + revenue here): RRF = Σ 1/(k+rankᵢ),
    k=60, needing no score normalization at all. Deterministic
    row_number tie-breaks make the fusion reproducible; the final
    list is a top-10 TakeOrderedAndProject. Each ranking is a window
    over the |suppliers| aggregate — at 100 TB each source ranking
    would arrive pre-computed (top-k from its own engine) and the
    fusion joins k-sized lists."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    metrics = s.join(rev, s["s_suppkey"] == rev["l_suppkey"], "left").select(
        "s_suppkey", "s_name", "s_acctbal", F.coalesce("rev", F.lit(0.0)).alias("rev")
    )
    ranked = metrics.select(
        "s_suppkey",
        "s_name",
        F.row_number()
        .over(Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey")))
        .alias("rank_bal"),
        F.row_number()
        .over(Window.orderBy(F.col("rev").desc(), F.col("s_suppkey")))
        .alias("rank_rev"),
    )
    fused = ranked.withColumn(
        "rrf", 1.0 / (60 + F.col("rank_bal")) + 1.0 / (60 + F.col("rank_rev"))
    )
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("s_suppkey"))
        .limit(10)
        .select(
            "s_name",
            F.round("rrf", 6).alias("rrf_score"),
            F.col("rank_bal").cast("bigint").alias("rank_bal"),
            F.col("rank_rev").cast("bigint").alias("rank_rev"),
        )
    )


@register(
    "odds_ratio_returns",
    oracle="""
    WITH cells AS (
      SELECT p_brand,
             CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount > 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS a,
             CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount <= 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS b,
             CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount > 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS c,
             CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount <= 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS d
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand)
    SELECT p_brand,
           round((a * d) / (b * c), 4) AS odds_ratio,
           round(exp(ln((a * d) / (b * c))
                     - 1.96 * sqrt(1/a + 1/b + 1/c + 1/d)), 4) AS ci_low,
           round(exp(ln((a * d) / (b * c))
                     + 1.96 * sqrt(1/a + 1/b + 1/c + 1/d)), 4) AS ci_high
    FROM cells WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
    """,
    tags=("stats", "epidemiology", "conditional"),
)
def q_odds_ratio_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 odds ratio with Woolf confidence interval per brand: does
    a deep discount associate with returns? The contingency cells are
    four conditional sums in ONE pass (never four scans), the OR and
    its log-space CI are scalar math on the |brands| aggregate — the
    case-control analysis shape, next to chi_square_independence
    (which tests, where this sizes the effect). CI straddling 1.0 =
    no effect; the synthetic data's flat generator makes that the
    expected read."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    ret = F.col("l_returnflag") == "R"
    deep = F.col("l_discount") > 0.05
    cell = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("double")  # noqa: E731
    cells = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            cell(ret & deep).alias("a"),
            cell(ret & ~deep).alias("b"),
            cell(~ret & deep).alias("c"),
            cell(~ret & ~deep).alias("d"),
        )
        .filter(
            (F.col("a") > 0) & (F.col("b") > 0) & (F.col("c") > 0) & (F.col("d") > 0)
        )
    )
    orx = (F.col("a") * F.col("d")) / (F.col("b") * F.col("c"))
    se = F.sqrt(1 / F.col("a") + 1 / F.col("b") + 1 / F.col("c") + 1 / F.col("d"))
    return cells.select(
        "p_brand",
        F.round(orx, 4).alias("odds_ratio"),
        F.round(F.exp(F.log(orx) - 1.96 * se), 4).alias("ci_low"),
        F.round(F.exp(F.log(orx) + 1.96 * se), 4).alias("ci_high"),
    )


@register(
    "mutual_information_binned",
    oracle="""
    WITH binned AS (
      SELECT ntile(5) OVER (ORDER BY l_quantity, l_orderkey, l_linenumber)
               AS bx,
             ntile(5) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS by
      FROM lineitem),
    joint AS (
      SELECT bx, by, CAST(count(*) AS DOUBLE) AS nxy FROM binned
      GROUP BY bx, by),
    tot AS (SELECT sum(nxy) AS n FROM joint),
    mx  AS (SELECT bx, sum(nxy) AS nx FROM joint GROUP BY bx),
    my  AS (SELECT by, sum(nxy) AS ny FROM joint GROUP BY by)
    SELECT round(sum((nxy / n) * ln((nxy * n) / (nx * ny))), 6)
             AS mutual_information,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM joint CROSS JOIN tot
    JOIN mx USING (bx) JOIN my USING (by)
    """,
    tags=("stats", "information", "binning"),
)
def q_mutual_information_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between quantity and price, estimated on a
    5×5 quantile-binned joint distribution (the copula grid):
    deterministic ntile bins, joint/marginal cell counts, then
    I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) — the dependence measure that
    sees what Pearson/Spearman miss (non-monotone structure). All the
    information math runs on ≤25 cells; only the binning touches the
    fact table, and at 100 TB the two global ntiles become
    approx-percentile cutpoint joins, grid unchanged."""
    li = _t(spark, sf_dir, "lineitem")
    bx = F.ntile(5).over(
        Window.orderBy("l_quantity", "l_orderkey", "l_linenumber")
    )
    by = F.ntile(5).over(
        Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    )
    binned = li.select(bx.alias("bx"), by.alias("by"))
    joint = binned.groupBy("bx", "by").agg(
        F.count("*").cast("double").alias("nxy")
    )
    tot = joint.agg(F.sum("nxy").alias("n"))
    mx = joint.groupBy("bx").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("by").agg(F.sum("nxy").alias("ny"))
    j = (
        joint.join(F.broadcast(tot))
        .join(F.broadcast(mx), "bx")
        .join(F.broadcast(my), "by")
    )
    term = (F.col("nxy") / F.col("n")) * F.log(
        (F.col("nxy") * F.col("n")) / (F.col("nx") * F.col("ny"))
    )
    return j.agg(
        F.round(F.sum(term), 6).alias("mutual_information"),
        F.count("*").cast("bigint").alias("n_cells"),
    )


@register(
    "sliding_distinct_users",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT daily.user_id) AS BIGINT) AS wau_7d
    FROM days JOIN daily
      ON daily.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
    tags=("window", "distinct", "events"),
)
def q_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day active users per day — SLIDING distinct, which
    no window frame can express (COUNT(DISTINCT) doesn't decrement):
    dedup to (day, user) grain first — the only fact-sized pass —
    then a bounded range join of days onto that grain (≤7 daily rows
    per output day) and an exact distinct per day. The day-grain
    relation is |days|·|daily actives|, tiny relative to events; at
    100 TB the same query runs on the stored daily-actives rollup,
    or swaps the exact distinct for mergeable HLL sketches
    (hll_sketch_rollup) and becomes a 7-sketch union per day."""
    e = _t(spark, sf_dir, "events")
    daily = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = daily.select("d").distinct().withColumnRenamed("d", "day_d")
    j = days.join(
        daily,
        F.col("d").between(F.date_sub(F.col("day_d"), 6), F.col("day_d")),
    )
    return (
        j.groupBy("day_d")
        .agg(F.count_distinct("user_id").cast("bigint").alias("wau_7d"))
        .select(F.date_format("day_d", "yyyy-MM-dd").alias("day"), "wau_7d")
    )


_SATURATING_SQL = """
    WITH RECURSIVE daily AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
             net
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS d,
               sum(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice
                        ELSE -o_totalprice END) AS net
        FROM orders
        WHERE CAST(o_orderdate AS DATE) < DATE '1995-02-01'
        GROUP BY 1) t),
    bal AS (
      SELECT i, greatest(0.0, net) AS b FROM daily WHERE i = 1
      UNION ALL
      SELECT d.i, greatest(0.0, bal.b + d.net)
      FROM daily d JOIN bal ON d.i = bal.i + 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(b), 2) AS peak_balance,
           round(avg(b), 2) AS mean_balance,
           CAST(sum(CASE WHEN b = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_floored_days
    FROM bal
    """


@register(
    "saturating_balance_recursive",
    oracle=_SATURATING_SQL,
    tags=("recursive", "timeseries", "stateful"),
)
def q_saturating_balance_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Saturating running balance — b_i = max(0, b_{i−1} + net_i), the
    inventory/credit recurrence that NO window frame can express
    (the clamp makes it non-associative, unlike a plain cumsum), run
    as the IDENTICAL recursive CTE text on both engines: each
    recursion step joins the next day onto the accumulated balance.
    Day count is bounded (one month), so the recursion depth is
    |days|; the at-scale variants are per-entity applyInPandasWithState
    (streaming) or a per-partition sequential kernel — this query
    pins the semantics those must reproduce."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SATURATING_SQL)


@register(
    "wilson_score_ranking",
    oracle="""
    WITH rates AS (
      SELECT event_type,
             CAST(sum(CASE WHEN value > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
               AS pos,
             CAST(count(*) AS DOUBLE) AS n
      FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT event_type,
           round(pos / n, 4) AS raw_rate,
           round((pos / n + 1.9208 / n
                  - 1.96 * sqrt((pos / n) * (1 - pos / n) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 4) AS wilson_lower,
           CAST(n AS BIGINT) AS n
    FROM rates
    """,
    tags=("stats", "ranking", "interval"),
)
def q_wilson_score_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score lower bound per event type — the correct way to
    rank success rates with unequal sample sizes (a 3/3 never
    outranks a 900/1000): the binomial CI lower bound at z=1.96,
    closed-form scalar math on a |types|-row aggregate. The raw rate
    sits alongside so the ranking inversion is visible. One hash-agg
    over events; the formula is pure codegen."""
    e = _t(spark, sf_dir, "events")
    rates = (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > 0.5, 1).otherwise(0))
            .cast("double")
            .alias("pos"),
            F.count("*").cast("double").alias("n"),
        )
    )
    p = F.col("pos") / F.col("n")
    n = F.col("n")
    wilson = (
        p + 1.9208 / n - 1.96 * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    ) / (1 + 3.8416 / n)
    return rates.select(
        "event_type",
        F.round(p, 4).alias("raw_rate"),
        F.round(wilson, 4).alias("wilson_lower"),
        n.cast("bigint").alias("n"),
    )


@register(
    "negative_sampling_margin",
    oracle=f"""
    WITH anchors AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 20),
    negs AS (
      SELECT a.vec_id AS anchor_id, a.label,
             {_COSINE_SQL} AS sim
      FROM anchors a
      JOIN (SELECT unnest(generate_series(1, 3)) AS j) js ON TRUE
      JOIN embeddings b ON b.vec_id = (a.vec_id * 31 + js.j * 97) % 500
      WHERE b.label <> a.label),
    poss AS (
      SELECT a.vec_id AS anchor_id, a.label,
             {_COSINE_SQL} AS sim
      FROM anchors a
      JOIN embeddings b ON b.label = a.label AND b.vec_id <> a.vec_id),
    per_anchor AS (
      SELECT n.anchor_id, n.label,
             avg(DISTINCT n.sim) AS neg_sim, p.pos_sim
      FROM negs n JOIN (
        SELECT anchor_id, avg(sim) AS pos_sim FROM poss GROUP BY anchor_id
      ) p ON n.anchor_id = p.anchor_id
      GROUP BY n.anchor_id, n.label, p.pos_sim)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_anchors,
           round(avg(pos_sim), 5) AS mean_pos_sim,
           round(avg(neg_sim), 5) AS mean_neg_sim,
           round(avg(pos_sim - neg_sim), 5) AS mean_margin
    FROM per_anchor GROUP BY label
    """,
    tags=("embeddings", "training", "sampling"),
)
def q_negative_sampling_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling with margin audit: for each
    anchor, k=3 DETERMINISTIC hash-ring negatives ((id·31 + j·97)
    mod N — reproducible across runs and engines, the property random
    sampling can't give a correctness gate), cross-label filtered,
    scored against the anchor's mean same-label (positive)
    similarity. The per-label margin (pos − neg) is the health check
    run before contrastive training. Negatives join by computed key
    (constant fan-out k), positives by label — both broadcastable at
    this anchor count, and at 100 TB anchors shard while negatives
    stay an O(k) computed-key lookup per anchor."""
    from ..operators.similarity import cosine

    e = _t(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_vec"),
        F.col("label").alias("a_label"),
    )
    js = anchors.select(
        "anchor_id", "a_vec", "a_label",
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("j"),
    ).withColumn("neg_id", F.pmod(F.col("anchor_id") * 31 + F.col("j") * 97, F.lit(500)))
    negs = (
        js.join(e, js["neg_id"] == e["vec_id"])
        .filter(F.col("label") != F.col("a_label"))
        .select(
            "anchor_id", "a_label", cosine("a_vec", "embedding").alias("sim")
        )
        .distinct()
        .groupBy("anchor_id", "a_label")
        .agg(F.avg("sim").alias("neg_sim"))
    )
    poss = (
        anchors.join(
            e,
            (e["label"] == anchors["a_label"]) & (e["vec_id"] != anchors["anchor_id"]),
        )
        .select("anchor_id", cosine("a_vec", "embedding").alias("sim"))
        .groupBy("anchor_id")
        .agg(F.avg("sim").alias("pos_sim"))
    )
    per_anchor = negs.join(poss, "anchor_id")
    return per_anchor.groupBy(F.col("a_label").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_anchors"),
        F.round(F.avg("pos_sim"), 5).alias("mean_pos_sim"),
        F.round(F.avg("neg_sim"), 5).alias("mean_neg_sim"),
        F.round(F.avg(F.col("pos_sim") - F.col("neg_sim")), 5).alias("mean_margin"),
    )


@register(
    "bipartite_degree_profile",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    cdeg AS (SELECT c, count(*) AS deg FROM edges GROUP BY c),
    pdeg AS (SELECT p, count(*) AS deg FROM edges GROUP BY p)
    SELECT side, log2_bin,
           CAST(count(*) AS BIGINT) AS n_nodes,
           round(avg(deg), 2) AS mean_degree
    FROM (
      SELECT 'customer' AS side,
             CAST(floor(ln(deg) / ln(2)) AS BIGINT) AS log2_bin, deg
      FROM cdeg
      UNION ALL
      SELECT 'part' AS side,
             CAST(floor(ln(deg) / ln(2)) AS BIGINT) AS log2_bin, deg
      FROM pdeg)
    GROUP BY side, log2_bin
    """,
    tags=("graph", "histogram", "profile"),
)
def q_bipartite_degree_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite degree distribution of the customer↔part purchase
    graph, log₂-binned per side — the first profile run on any graph
    before choosing join strategies (a heavy-tailed part side is
    exactly what forces the salting/skew machinery; cf. the
    degree-orientation note in PLANS.md on triangle counting). Edge
    dedup is the only fact-sized pass; each degree relation is one
    further hash-agg and the binning is pure codegen."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cdeg = edges.groupBy("c").agg(F.count("*").alias("deg"))
    pdeg = edges.groupBy("p").agg(F.count("*").alias("deg"))
    both = cdeg.select(F.lit("customer").alias("side"), "deg").unionAll(
        pdeg.select(F.lit("part").alias("side"), "deg")
    )
    log2_bin = F.floor(F.log("deg") / math.log(2)).cast("bigint")
    return both.groupBy("side", log2_bin.alias("log2_bin")).agg(
        F.count("*").cast("bigint").alias("n_nodes"),
        F.round(F.avg("deg"), 2).alias("mean_degree"),
    )


@register(
    "grid_bucketed_spatial_join",
    oracle="""
    WITH cust AS (
      SELECT c_custkey AS id,
             (c_custkey * 53 % 1600) / 10.0 AS y,
             (c_custkey * 37 % 3600) / 10.0 AS x
      FROM customer WHERE c_custkey <= 300),
    supp AS (
      SELECT s_suppkey AS id,
             (s_suppkey * 53 % 1600) / 10.0 AS y,
             (s_suppkey * 37 % 3600) / 10.0 AS x
      FROM supplier),
    cand AS (
      SELECT c.id AS cust_id, s.id AS supp_id,
             sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y))
               AS dist,
             row_number() OVER (
               PARTITION BY c.id
               ORDER BY sqrt((c.x - s.x) * (c.x - s.x)
                             + (c.y - s.y) * (c.y - s.y)), s.id) AS rn
      FROM cust c JOIN supp s
        ON CAST(floor(s.x / 20) AS BIGINT)
             BETWEEN CAST(floor(c.x / 20) AS BIGINT) - 1
                 AND CAST(floor(c.x / 20) AS BIGINT) + 1
       AND CAST(floor(s.y / 20) AS BIGINT)
             BETWEEN CAST(floor(c.y / 20) AS BIGINT) - 1
                 AND CAST(floor(c.y / 20) AS BIGINT) + 1)
    SELECT CAST(count(*) AS BIGINT) AS n_matched,
           round(avg(dist), 4) AS mean_nn_dist,
           round(max(dist), 4) AS max_nn_dist
    FROM cand WHERE rn = 1
    """,
    tags=("geo", "join", "grid"),
)
def q_grid_bucketed_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed nearest-neighbor spatial join — the SCALABLE
    spatial join (vs haversine_nearest_hub's tiny-dim brute force):
    both point sets bucket into 20-unit cells, candidates come only
    from the query point's 3×3 cell neighborhood (an equi-join on
    cell ids after a 9× neighbor expansion — never a cross join), and
    the per-point argmin ranks candidates. Cell size must exceed the
    max NN distance for exactness within the neighborhood guarantee;
    the same plan with geohash/tile ids is how billion-point spatial
    joins run. Spark expresses the 3×3 expansion as an explode of the
    9 neighbor cells on the (smaller) query side, keeping the join a
    pure equi-join on the cell key."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    cust = c.filter(F.col("c_custkey") <= 300).select(
        F.col("c_custkey").alias("cust_id"),
        ((F.col("c_custkey") * 53 % 1600) / 10.0).alias("cy"),
        ((F.col("c_custkey") * 37 % 3600) / 10.0).alias("cx"),
    )
    supp = s.select(
        F.col("s_suppkey").alias("supp_id"),
        ((F.col("s_suppkey") * 53 % 1600) / 10.0).alias("sy"),
        ((F.col("s_suppkey") * 37 % 3600) / 10.0).alias("sx"),
    ).withColumns(
        {
            "cell_x": F.floor(F.col("sx") / 20).cast("bigint"),
            "cell_y": F.floor(F.col("sy") / 20).cast("bigint"),
        }
    )
    nbr = cust.select(
        "cust_id", "cx", "cy",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dx -> "
                "transform(sequence(-1, 1), dy -> "
                "struct(CAST(floor(cx / 20) AS BIGINT) + dx AS cell_x, "
                "CAST(floor(cy / 20) AS BIGINT) + dy AS cell_y))))"
            )
        ).alias("cell"),
    ).select("cust_id", "cx", "cy", "cell.cell_x", "cell.cell_y")
    dist = F.sqrt(
        F.pow(F.col("cx") - F.col("sx"), 2) + F.pow(F.col("cy") - F.col("sy"), 2)
    )
    cand = nbr.join(supp, ["cell_x", "cell_y"]).withColumn("dist", dist)
    w = Window.partitionBy("cust_id").orderBy("dist", "supp_id")
    nn = cand.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return nn.agg(
        F.count("*").cast("bigint").alias("n_matched"),
        F.round(F.avg("dist"), 4).alias("mean_nn_dist"),
        F.round(F.max("dist"), 4).alias("max_nn_dist"),
    )


@register(
    "revenue_bridge_waterfall",
    oracle="""
    WITH y1 AS (
      SELECT n_name, sum(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT) = 1996
      GROUP BY n_name),
    y2 AS (
      SELECT n_name, sum(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT) = 1997
      GROUP BY n_name),
    bridge AS (
      SELECT coalesce(y1.n_name, y2.n_name) AS n_name,
             coalesce(y2.rev, 0) - coalesce(y1.rev, 0) AS delta
      FROM y1 FULL OUTER JOIN y2 ON y1.n_name = y2.n_name)
    SELECT n_name, round(delta, 2) AS delta,
           round(sum(delta) OVER (
             ORDER BY delta DESC, n_name
             ROWS UNBOUNDED PRECEDING), 2) AS running_bridge
    FROM bridge
    """,
    tags=("reporting", "window", "outer"),
)
def q_revenue_bridge_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge: per-nation deltas between two
    periods (FULL OUTER so nations present in only one year
    contribute their whole swing), ordered biggest-gain-first with a
    running cumulative — the waterfall whose last bar IS the total
    YoY change, decomposed. Two filtered aggregates off the same
    join; the window runs on |nations| rows. The single-partition
    ORDER BY is safe exactly because the bridge relation is
    dimension-sized."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    base = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )

    def year_rev(yr: int) -> DataFrame:
        return (
            base.filter(F.year(F.col("o_orderdate").cast("date")) == yr)
            .groupBy("n_name")
            .agg(F.sum("o_totalprice").alias("rev"))
        )

    y1, y2 = year_rev(1996), year_rev(1997)
    bridge = (
        y1.withColumnRenamed("rev", "rev1")
        .join(y2.withColumnRenamed("rev", "rev2"), "n_name", "full_outer")
        .select(
            "n_name",
            (
                F.coalesce("rev2", F.lit(0.0)) - F.coalesce("rev1", F.lit(0.0))
            ).alias("delta"),
        )
    )
    w = (
        Window.orderBy(F.col("delta").desc(), F.col("n_name"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return bridge.select(
        "n_name",
        F.round("delta", 2).alias("delta"),
        F.round(F.sum("delta").over(w), 2).alias("running_bridge"),
    )


@register(
    "shingle_containment",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             substring(text, i, 24) AS g
      FROM documents,
           unnest(generate_series(1, len(text) - 23)) AS t(i)
      WHERE doc_id < 60),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    scored AS (
      SELECT da, db, CAST(inter AS DOUBLE) / sa.n AS containment
      FROM shared
      JOIN sizes sa ON sa.doc_id = da)
    SELECT CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(CASE WHEN containment >= 0.2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contained,
           round(max(containment), 4) AS max_containment
    FROM scored
    """,
    tags=("dedup", "text", "containment"),
)
def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT |A∩B|/|A| — what symmetric
    Jaccard dedup (dedup_ngram_jaccard) cannot see: a short doc
    quoted inside a long one scores high containment but low Jaccard,
    so excerpt/quotation duplication needs this directed measure
    (Broder's original distinction). Candidate pairs arise only from
    SHARED 24-char shingles (an equi-join on the shingle — never the
    n² doc cross join), intersections come from the join's group
    count, and each direction divides by ITS OWN doc's shingle count.
    At 100 TB the shared-shingle join keys on a hashed shingle
    (xxhash64) exactly like contamination_ngrams."""
    d = _t(spark, sf_dir, "documents")
    sh = (
        d.filter(F.col("doc_id") < 60)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - 23)).alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 24)").alias("g"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .agg(F.count("*").alias("inter"))
    )
    scored = shared.join(
        F.broadcast(sizes.withColumnRenamed("doc_id", "da")), "da"
    ).select(
        "da", "db", (F.col("inter").cast("double") / F.col("n")).alias("containment")
    )
    return scored.agg(
        F.count("*").cast("bigint").alias("n_candidate_pairs"),
        F.sum(F.when(F.col("containment") >= 0.2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_contained"),
        F.round(F.max("containment"), 4).alias("max_containment"),
    )


@register(
    "cuped_variance_reduction",
    oracle="""
    WITH per_user AS (
      SELECT o_custkey,
             sum(CASE WHEN CAST(strftime(CAST(o_orderdate AS DATE), '%Y')
                            AS INT) = 1995 THEN o_totalprice ELSE 0 END) AS x,
             sum(CASE WHEN CAST(strftime(CAST(o_orderdate AS DATE), '%Y')
                            AS INT) = 1996 THEN o_totalprice ELSE 0 END) AS y
      FROM orders
      WHERE CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT)
            IN (1995, 1996)
      GROUP BY o_custkey),
    theta AS (
      SELECT covar_pop(y, x) / var_pop(x) AS th, avg(x) AS xbar
      FROM per_user),
    adj AS (
      SELECT y, y - th * (x - xbar) AS y_cuped
      FROM per_user CROSS JOIN theta)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(var_pop(y), 2) AS var_raw,
           round(var_pop(y_cuped), 2) AS var_cuped,
           round(1 - var_pop(y_cuped) / var_pop(y), 4) AS variance_reduction,
           round(avg(y) - avg(y_cuped), 4) AS mean_shift
    FROM adj
    """,
    tags=("stats", "experimentation"),
)
def q_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data):
    adjust each user's experiment-period metric by θ·(covariate −
    mean) where θ = cov(y,x)/var(x) from pre-period spend — the
    variance-reduction workhorse of modern A/B platforms (Deng et al.
    2013). The oracle pins the reduction ratio AND the ≈0 mean shift
    (CUPED must not bias the point estimate). Two passes over the
    per-user aggregate with a 1-row broadcast θ — the fact table is
    touched once."""
    o = _t(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    per_user = (
        o.filter(yr.isin(1995, 1996))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1995, F.col("o_totalprice")).otherwise(0.0)).alias("x"),
            F.sum(F.when(yr == 1996, F.col("o_totalprice")).otherwise(0.0)).alias("y"),
        )
    )
    theta = per_user.agg(
        (F.covar_pop("y", "x") / F.var_pop("x")).alias("th"),
        F.avg("x").alias("xbar"),
    )
    adj = per_user.join(F.broadcast(theta)).select(
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("xbar"))).alias("y_cuped"),
    )
    return adj.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.var_pop("y"), 2).alias("var_raw"),
        F.round(F.var_pop("y_cuped"), 2).alias("var_cuped"),
        F.round(1 - F.var_pop("y_cuped") / F.var_pop("y"), 4).alias(
            "variance_reduction"
        ),
        F.round(F.avg("y") - F.avg("y_cuped"), 4).alias("mean_shift"),
    )


@register(
    "bayes_smoothed_rate",
    oracle="""
    WITH brand AS (
      SELECT p_brand,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS r,
             CAST(count(*) AS DOUBLE) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand),
    prior AS (SELECT sum(r) / sum(n) AS p0 FROM brand)
    SELECT p_brand,
           round(r / n, 4) AS raw_rate,
           round((r + 50 * p0) / (n + 50), 4) AS smoothed_rate,
           CAST(n AS BIGINT) AS n
    FROM brand CROSS JOIN prior
    """,
    tags=("stats", "smoothing", "feature"),
)
def q_bayes_smoothed_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes m-estimate smoothing: per-brand return rates
    shrunk toward the global prior with pseudo-count m=50 — the
    standard guard against small-sample categorical rates in feature
    engineering (target encoding) and cold-start ranking: sparse
    brands collapse to the prior, dense brands keep their own rate.
    One fact pass for the cells, a 1-row broadcast prior, scalar
    codegen math."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    brand = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("double")
            .alias("r"),
            F.count("*").cast("double").alias("n"),
        )
    )
    prior = brand.agg((F.sum("r") / F.sum("n")).alias("p0"))
    return brand.join(F.broadcast(prior)).select(
        "p_brand",
        F.round(F.col("r") / F.col("n"), 4).alias("raw_rate"),
        F.round((F.col("r") + 50 * F.col("p0")) / (F.col("n") + 50), 4).alias(
            "smoothed_rate"
        ),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "difference_in_differences",
    oracle="""
    WITH labeled AS (
      SELECT CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN CAST(strftime(CAST(o_orderdate AS DATE), '%Y')
                        AS INT) >= 1997 THEN 1 ELSE 0 END AS post,
             o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT)
            BETWEEN 1996 AND 1997),
    cells AS (
      SELECT treated, post, avg(o_totalprice) AS m,
             CAST(count(*) AS BIGINT) AS n
      FROM labeled GROUP BY treated, post)
    SELECT round(
             (SELECT m FROM cells WHERE treated = 1 AND post = 1)
           - (SELECT m FROM cells WHERE treated = 1 AND post = 0)
           - ((SELECT m FROM cells WHERE treated = 0 AND post = 1)
            - (SELECT m FROM cells WHERE treated = 0 AND post = 0)), 4)
             AS did_estimate,
           (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS n_obs
    """,
    tags=("stats", "causal", "experimentation"),
)
def q_difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the 2×2 (treated × post) cell means
    and the DiD contrast (ΔT − ΔC) — the canonical quasi-experimental
    estimator, with a deterministic even-nation pseudo-treatment so
    the oracle pins an exact value (≈0 on this flat generator: the
    parallel-trends null). One pass builds all four cells
    (conditional aggregation, never four scans); the contrast is
    driver-side scalar algebra on a 4-row relation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    yr = F.year(F.col("o_orderdate").cast("date"))
    labeled = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .filter(yr.between(1996, 1997))
        .select(
            F.when(F.col("c_nationkey") % 2 == 0, 1).otherwise(0).alias("treated"),
            F.when(yr >= 1997, 1).otherwise(0).alias("post"),
            "o_totalprice",
        )
    )
    cells = labeled.groupBy("treated", "post").agg(
        F.avg("o_totalprice").alias("m"), F.count("*").alias("n")
    )
    flat = cells.agg(
        F.round(
            F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("m")))
            - F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("m")))
            - (
                F.max(
                    F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("m"))
                )
                - F.max(
                    F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("m"))
                )
            ),
            4,
        ).alias("did_estimate"),
        F.sum("n").cast("bigint").alias("n_obs"),
    )
    return flat


@register(
    "covariate_balance_smd",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
                       >= '8' THEN 1 ELSE 0 END AS treated,
             c_acctbal, c_nationkey
      FROM customer),
    stats AS (
      SELECT treated,
             avg(c_acctbal) AS m_bal, var_samp(c_acctbal) AS v_bal,
             avg(CAST(c_nationkey AS DOUBLE)) AS m_nat,
             var_samp(CAST(c_nationkey AS DOUBLE)) AS v_nat,
             CAST(count(*) AS BIGINT) AS n
      FROM assigned GROUP BY treated)
    SELECT round((t.m_bal - c.m_bal)
                 / sqrt((t.v_bal + c.v_bal) / 2), 4) AS smd_acctbal,
           round((t.m_nat - c.m_nat)
                 / sqrt((t.v_nat + c.v_nat) / 2), 4) AS smd_nationkey,
           t.n AS n_treated, c.n AS n_control
    FROM (SELECT * FROM stats WHERE treated = 1) t
    CROSS JOIN (SELECT * FROM stats WHERE treated = 0) c
    """,
    tags=("stats", "experimentation", "balance"),
)
def q_covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance check via standardized mean difference —
    the pre-analysis gate on any experiment assignment: hash-based
    treatment split (md5 first hex digit ≥ '8', the same
    deterministic device as hash_split_summary), then
    SMD = (μ_T − μ_C)/√((σ²_T+σ²_C)/2) per covariate; |SMD| < 0.1 is
    the accepted-balance convention and the expected read under a
    correct hash split. One grouped-moments pass, scalar math on the
    2-row result."""
    c = _t(spark, sf_dir, "customer")
    assigned = c.select(
        F.when(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) >= "8", 1)
        .otherwise(0)
        .alias("treated"),
        "c_acctbal",
        F.col("c_nationkey").cast("double").alias("natk"),
    )
    stats = assigned.groupBy("treated").agg(
        F.avg("c_acctbal").alias("m_bal"),
        F.var_samp("c_acctbal").alias("v_bal"),
        F.avg("natk").alias("m_nat"),
        F.var_samp("natk").alias("v_nat"),
        F.count("*").cast("bigint").alias("n"),
    )
    t = stats.filter(F.col("treated") == 1).alias("t")
    ctl = stats.filter(F.col("treated") == 0).alias("c")
    return t.crossJoin(ctl).select(
        F.round(
            (F.col("t.m_bal") - F.col("c.m_bal"))
            / F.sqrt((F.col("t.v_bal") + F.col("c.v_bal")) / 2),
            4,
        ).alias("smd_acctbal"),
        F.round(
            (F.col("t.m_nat") - F.col("c.m_nat"))
            / F.sqrt((F.col("t.v_nat") + F.col("c.v_nat")) / 2),
            4,
        ).alias("smd_nationkey"),
        F.col("t.n").alias("n_treated"),
        F.col("c.n").alias("n_control"),
    )


@register(
    "seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    forecast AS (
      SELECT d, v, lag(v, 7) OVER (ORDER BY d) AS yhat
      FROM daily)
    SELECT CAST(strftime(d, '%w') AS INT) AS weekday,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(abs(v - yhat)), 2) AS mae,
           round(avg(abs(v - yhat) / v), 4) AS mape
    FROM forecast WHERE yhat IS NOT NULL
    GROUP BY 1
    """,
    tags=("timeseries", "forecast", "backtest"),
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: ŷ(t) = y(t−7) — the baseline
    every forecasting model must beat, back-tested in one lag window
    with MAE/MAPE per weekday (weekday split exposes which seasons
    the naive carry actually captures). The window runs on the daily
    pre-aggregate; at scale the same backtest per series key is the
    partitioned variant. Oracle note: DuckDB %w and Spark dayofweek
    disagree on numbering, so weekday is pinned to the %w (0=Sunday)
    convention explicitly."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("d")
    fc = daily.select(
        "d", "v", F.lag("v", 7).over(w).alias("yhat")
    ).filter(F.col("yhat").isNotNull())
    err = F.abs(F.col("v") - F.col("yhat"))
    return fc.groupBy((F.dayofweek("d") - 1).alias("weekday")).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.avg(err), 2).alias("mae"),
        F.round(F.avg(err / F.col("v")), 4).alias("mape"),
    )


@register(
    "freshness_lag_audit",
    oracle="""
    WITH per_source AS (
      SELECT event_type AS source,
             max(CAST(ts AS TIMESTAMP)) AS latest,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type),
    ref AS (SELECT max(latest) AS frontier FROM per_source)
    SELECT source, n_events,
           round((epoch_us(frontier) - epoch_us(latest)) / 3600000000.0, 3)
             AS lag_hours,
           (epoch_us(frontier) - epoch_us(latest)) / 3600000000.0 > 24.0
             AS stale_24h
    FROM per_source CROSS JOIN ref
    """,
    tags=("audit", "events", "json"),
)
def q_freshness_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data freshness: latest event per feed
    (event_type stands in for the feed id), lag against the freshest source (the
    frontier — data-derived, no wall clock), staleness flags at 24 h
    — the first alert every multi-feed ingestion pipeline wires up.
    One pass for per-source maxima, a 1-row broadcast frontier;
    staleness ≈ 0 on this generator (all types run to the end) — the flags are the contract."""
    e = _t(spark, sf_dir, "events")
    per_source = (
        e.select(F.col("event_type").alias("source"), "ts")
        .groupBy("source")
        .agg(
            F.max("ts").alias("latest"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )
    ref = per_source.agg(F.max("latest").alias("frontier"))
    lag_h = (
        F.unix_micros("frontier") - F.unix_micros("latest")
    ) / 3_600_000_000.0
    return per_source.join(F.broadcast(ref)).select(
        "source",
        "n_events",
        F.round(lag_h, 3).alias("lag_hours"),
        (lag_h > 24.0).alias("stale_24h"),
    )


@register(
    "event_dwell_share",
    oracle="""
    WITH seg AS (
      SELECT event_type,
             (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
              - epoch_us(ts)) / 1000000.0 AS dur_s
      FROM events),
    capped AS (
      SELECT event_type, least(dur_s, 1800.0) AS dur_s
      FROM seg WHERE dur_s IS NOT NULL),
    tot AS (SELECT sum(dur_s) AS total FROM capped)
    SELECT event_type,
           round(sum(dur_s) / 3600.0, 3) AS dwell_hours,
           round(sum(dur_s) / total, 4) AS dwell_share
    FROM capped CROSS JOIN tot
    GROUP BY event_type, total
    """,
    tags=("events", "window", "dwell"),
)
def q_event_dwell_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time share by event type: time attributed to an event
    until the user's next action (LEAD segments, the time_weighted_
    average mechanics pointed at attribution), capped at 30 min so
    walk-aways don't own the budget — the 'where do users actually
    spend time' split that raw event counts misrepresent. One
    user-keyed window pass, then a type-level rollup against a 1-row
    broadcast total."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = e.select(
        "event_type",
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1_000_000.0
        ).alias("dur_s"),
    ).filter(F.col("dur_s").isNotNull())
    capped = seg.select(
        "event_type", F.least(F.col("dur_s"), F.lit(1800.0)).alias("dur_s")
    )
    tot = capped.agg(F.sum("dur_s").alias("total"))
    return (
        capped.join(F.broadcast(tot))
        .groupBy("event_type", "total")
        .agg(
            F.round(F.sum("dur_s") / 3600.0, 3).alias("dwell_hours"),
            F.round(F.sum("dur_s") / F.first("total"), 4).alias("dwell_share"),
        )
        .select("event_type", "dwell_hours", "dwell_share")
    )


@register(
    "retry_storm_episodes",
    oracle="""
    WITH errs AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS t
      FROM events WHERE event_type = 'error'),
    flagged AS (
      SELECT user_id, event_id, ts,
             count(*) OVER (PARTITION BY user_id ORDER BY t
                            RANGE BETWEEN 300000000 PRECEDING
                                      AND CURRENT ROW) >= 3 AS in_storm
      FROM errs),
    islands AS (
      SELECT user_id, in_storm,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)
               - row_number() OVER (PARTITION BY user_id, in_storm
                                    ORDER BY ts, event_id) AS BIGINT) AS grp
      FROM flagged)
    SELECT CAST(count(*) AS BIGINT) AS n_episodes,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_with_storms,
           round(avg(ep_len), 3) AS mean_episode_len
    FROM (
      SELECT user_id, grp, CAST(count(*) AS DOUBLE) AS ep_len
      FROM islands WHERE in_storm
      GROUP BY user_id, grp)
    """,
    tags=("sre", "window", "islands"),
)
def q_retry_storm_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-storm detection: a user is 'in storm' when ≥3 errors land
    within a trailing 5-minute RANGE frame; contiguous in-storm rows
    collapse into EPISODES via the gaps-and-islands double
    row_number — so the output counts incidents, not alert rows (the
    flap-suppression every paging pipeline needs; cf. error_burn_rate
    for the rate-threshold view). Both windows and the island
    grouping share the user_id partitioning — one shuffle total."""
    e = _t(spark, sf_dir, "events")
    errs = e.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts", F.unix_micros("ts").alias("t")
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-300_000_000, 0)
    )
    flagged = errs.select(
        "user_id", "event_id", "ts",
        (F.count("*").over(wr) >= 3).alias("in_storm"),
    )
    r_all = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    r_grp = F.row_number().over(
        Window.partitionBy("user_id", "in_storm").orderBy("ts", "event_id")
    )
    islands = flagged.select(
        "user_id", "in_storm", (r_all - r_grp).cast("bigint").alias("grp")
    )
    episodes = (
        islands.filter(F.col("in_storm"))
        .groupBy("user_id", "grp")
        .agg(F.count("*").cast("double").alias("ep_len"))
    )
    return episodes.agg(
        F.count("*").cast("bigint").alias("n_episodes"),
        F.count_distinct("user_id").cast("bigint").alias("n_users_with_storms"),
        F.round(F.avg("ep_len"), 3).alias("mean_episode_len"),
    )


@register(
    "stock_span_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    brk AS (
      SELECT a.d,
             max(b.d) AS last_higher
      FROM daily a LEFT JOIN daily b
        ON b.d < a.d AND b.v > a.v
      GROUP BY a.d),
    span AS (
      SELECT daily.d,
             CASE WHEN last_higher IS NULL
                  THEN date_diff('day',
                         (SELECT min(d) FROM daily), daily.d) + 1
                  ELSE date_diff('day', last_higher, daily.d) END AS s
      FROM daily JOIN brk ON daily.d = brk.d)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(s) AS BIGINT) AS max_span,
           round(avg(CAST(s AS DOUBLE)), 3) AS mean_span
    FROM span
    """,
    tags=("window", "span", "timeseries"),
)
def q_stock_span_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stock-span problem: for each day, how many days since
    revenue was last HIGHER — the momentum/streak statistic that is
    not a frame aggregate (the lookback distance is data-dependent),
    solved relationally as a theta-join to the most recent dominating
    day. Quadratic in |days| — which is the point of the daily
    pre-aggregate: the join runs on calendar-sized input, never
    facts. (The O(n) monotonic-stack version is a sequential kernel;
    this relation pins its semantics.)"""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    brk = (
        a.join(
            b,
            (F.col("b.d") < F.col("a.d")) & (F.col("b.v") > F.col("a.v")),
            "left",
        )
        .groupBy(F.col("a.d").alias("d"))
        .agg(F.max("b.d").alias("last_higher"))
    )
    first_day = daily.agg(F.min("d").alias("d0"))
    span = (
        daily.join(brk, "d")
        .join(F.broadcast(first_day))
        .select(
            F.when(
                F.col("last_higher").isNull(),
                F.datediff(F.col("d"), F.col("d0")) + 1,
            )
            .otherwise(F.datediff(F.col("d"), F.col("last_higher")))
            .alias("s")
        )
    )
    return span.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.max("s").cast("bigint").alias("max_span"),
        F.round(F.avg(F.col("s").cast("double")), 3).alias("mean_span"),
    )


@register(
    "heaps_law_fit",
    oracle="""
    WITH words AS (
      SELECT doc_id, w
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
      WHERE w <> ''),
    ordered AS (
      SELECT w, row_number() OVER (ORDER BY doc_id, w) AS pos
      FROM words),
    firsts AS (
      SELECT min(pos) AS fp FROM ordered GROUP BY w),
    curve AS (
      SELECT CAST(pow(2, k) AS BIGINT) AS n_tokens,
             (SELECT CAST(count(*) AS BIGINT) FROM firsts
              WHERE fp <= CAST(pow(2, k) AS BIGINT)) AS vocab
      FROM unnest(generate_series(6, 14)) AS t(k))
    SELECT round(regr_slope(ln(CAST(vocab AS DOUBLE)),
                            ln(CAST(n_tokens AS DOUBLE))), 4) AS beta,
           round(exp(regr_intercept(ln(CAST(vocab AS DOUBLE)),
                                    ln(CAST(n_tokens AS DOUBLE)))), 2) AS k_const,
           CAST(count(*) AS BIGINT) AS n_points
    FROM curve
    """,
    tags=("text", "corpus", "regression"),
)
def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit V(N) = K·N^β — vocabulary growth against corpus
    size, the companion diagnostic to zipf_fit (β ≈ 0.4–0.6 for
    natural text; a flat or linear curve flags synthetic/duplicated
    corpora): token stream in deterministic (doc, word) order, each
    type's first-occurrence position, the V(N) curve sampled at
    powers of two, then a log-log regression. The stream order
    window is the only global sort and runs once; the curve itself
    is 9 scalar lookups against the firsts relation."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    ordered = words.select(
        "w", F.row_number().over(Window.orderBy("doc_id", "w")).alias("pos")
    )
    firsts = ordered.groupBy("w").agg(F.min("pos").alias("fp"))
    ks = spark.range(6, 15).select(
        F.pow(F.lit(2.0), F.col("id")).cast("bigint").alias("n_tokens")
    )
    curve = (
        ks.join(F.broadcast(firsts), F.col("fp") <= F.col("n_tokens"))
        .groupBy("n_tokens")
        .agg(F.count("*").cast("bigint").alias("vocab"))
    )
    lx = F.log(F.col("n_tokens").cast("double"))
    ly = F.log(F.col("vocab").cast("double"))
    return curve.agg(
        F.round(F.regr_slope(ly, lx), 4).alias("beta"),
        F.round(F.exp(F.regr_intercept(ly, lx)), 2).alias("k_const"),
        F.count("*").cast("bigint").alias("n_points"),
    )


@register(
    "sequence_gap_audit",
    oracle="""
    WITH ks AS (
      SELECT o_orderkey AS k,
             lead(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
      FROM orders),
    gaps AS (
      SELECT k + 1 AS gap_start, nxt - 1 AS gap_end, nxt - k - 1 AS missing
      FROM ks WHERE nxt - k > 1)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(missing), 0) AS BIGINT) AS total_missing,
           CAST(coalesce(max(missing), 0) AS BIGINT) AS largest_gap,
           CAST(min(gap_start) AS BIGINT) AS first_gap_start
    FROM gaps
    """,
    tags=("audit", "window", "sequence"),
)
def q_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps in a supposedly-dense id sequence (missing invoice
    numbers — the completeness audit behind financial recon): LEAD
    over the sorted keys exposes each gap as (prev+1, next−1), then
    gap count / total missing / largest run. One window over the key
    column only (ReadSchema is a single column); the at-scale variant
    partitions by id range so each task scans its own span and only
    range boundaries need a second look."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    ks = o.select(
        F.col("o_orderkey").alias("k"),
        F.lead("o_orderkey").over(w).alias("nxt"),
    )
    gaps = ks.filter(F.col("nxt") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - F.col("k") - 1).alias("missing"),
    )
    return gaps.agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.coalesce(F.sum("missing"), F.lit(0)).cast("bigint").alias("total_missing"),
        F.coalesce(F.max("missing"), F.lit(0)).cast("bigint").alias("largest_gap"),
        F.min("gap_start").cast("bigint").alias("first_gap_start"),
    )


@register(
    "position_weighted_attribution",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts AS p_ts, event_id AS p_id
      FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT p.p_id, e.event_type, e.value,
             row_number() OVER (PARTITION BY p.p_id
                                ORDER BY e.ts, e.event_id) AS pos,
             count(*) OVER (PARTITION BY p.p_id) AS n_touch
      FROM purchases p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.p_ts
       AND e.ts >= p.p_ts - INTERVAL 48 HOURS),
    credited AS (
      SELECT event_type,
             CASE WHEN n_touch = 1 THEN 1.0
                  WHEN pos = 1 THEN 0.4
                  WHEN pos = n_touch THEN 0.4
                  ELSE 0.2 / (n_touch - 2) END AS credit
      FROM touches)
    SELECT event_type,
           round(sum(credit), 4) AS total_credit,
           CAST(count(*) AS BIGINT) AS n_touches
    FROM credited GROUP BY event_type
    """,
    tags=("attribution", "window", "funnel"),
)
def q_position_weighted_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    purchase's preceding 48 h of view/click touches get 40% first,
    40% last, 20% spread over the middle — the credit-division model
    between first/last-touch (touch_attribution) and data-driven
    Markov. The purchase×touch join is time-banded per user (the
    range_join_window discipline keeps it from exploding); the
    position windows partition by purchase so credit math stays
    local. Total credit ≈ |attributed purchases| by construction —
    conservation is the checkable invariant."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    touches = (
        e.filter(F.col("event_type").isin("view", "click"))
        .join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("ts") < F.col("p_ts"))
            & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 48 HOURS")),
        )
    )
    wp = Window.partitionBy("p_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("p_id")
    positioned = touches.select(
        "event_type",
        F.row_number().over(wp).alias("pos"),
        F.count("*").over(wn).alias("n_touch"),
    )
    credit = (
        F.when(F.col("n_touch") == 1, 1.0)
        .when(F.col("pos") == 1, 0.4)
        .when(F.col("pos") == F.col("n_touch"), 0.4)
        .otherwise(0.2 / (F.col("n_touch") - 2))
    )
    return positioned.groupBy("event_type").agg(
        F.round(F.sum(credit), 4).alias("total_credit"),
        F.count("*").cast("bigint").alias("n_touches"),
    )


@register(
    "repeat_purchase_ladder",
    oracle="""
    WITH counts AS (
      SELECT o_custkey, count(*) AS n_orders
      FROM orders GROUP BY o_custkey),
    ladder AS (
      SELECT k,
             (SELECT CAST(count(*) AS BIGINT) FROM counts
              WHERE n_orders >= k) AS at_least_k
      FROM unnest(generate_series(1, 10)) AS t(k))
    SELECT k, at_least_k,
           round(CAST(at_least_k AS DOUBLE)
                 / lag(at_least_k) OVER (ORDER BY k), 4)
             AS p_next_given_prev
    FROM ladder
    """,
    tags=("cohort", "ladder", "window"),
)
def q_repeat_purchase_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase ladder: P(k-th order | made k−1) — the
    conditional continuation probabilities growth teams watch (the
    first rungs decide LTV far more than the tail): per-customer
    order counts, survivors-at-k for k=1..10 via a threshold join,
    successive ratios with LAG. The ladder relation is 10 rows; only
    the per-customer count touches facts. NULL first ratio is the
    k=1 base case by construction."""
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    ks = spark.range(1, 11).select(F.col("id").alias("k"))
    ladder = (
        ks.join(F.broadcast(counts), F.col("n_orders") >= F.col("k"))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("at_least_k"))
    )
    w = Window.orderBy("k")
    return ladder.select(
        "k",
        "at_least_k",
        F.round(
            F.col("at_least_k").cast("double") / F.lag("at_least_k").over(w), 4
        ).alias("p_next_given_prev"),
    )


@register(
    "seasonal_baseline_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(strftime(CAST(o_orderdate AS DATE), '%w') AS INT) AS wd,
             sum(o_totalprice) AS v
      FROM orders GROUP BY 1, 2),
    base AS (
      SELECT wd, avg(v) AS mu, stddev_samp(v) AS sigma
      FROM daily GROUP BY wd)
    SELECT daily.wd AS weekday,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN abs(v - mu) > 3 * sigma THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           round(max(abs(v - mu) / sigma), 3) AS worst_zscore
    FROM daily JOIN base ON daily.wd = base.wd
    GROUP BY daily.wd
    """,
    tags=("timeseries", "anomaly", "seasonal"),
)
def q_seasonal_baseline_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly flags: each day scored against ITS
    WEEKDAY's mean ± 3σ rather than a global band — the fix for the
    false positives a flat threshold raises every weekend (the
    seasonal-hybrid half of anomaly detection; ndvi_anomaly_zscore
    is the same device on pixel climatology). Weekday baselines are
    a 7-row broadcast; one pass over the daily aggregate scores and
    rolls up."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("wd"),
    ).agg(F.sum("o_totalprice").alias("v"))
    base = daily.groupBy("wd").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sigma")
    )
    z = F.abs(F.col("v") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(base), "wd")
        .groupBy(F.col("wd").alias("weekday"))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.when(F.abs(F.col("v") - F.col("mu")) > 3 * F.col("sigma"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
            F.round(F.max(z), 3).alias("worst_zscore"),
        )
    )


@register(
    "cohort_payback_month",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             date_trunc('month', min(CAST(o_orderdate AS DATE))) AS cohort_m
      FROM orders GROUP BY o_custkey),
    sizes AS (
      SELECT cohort_m, count(*) AS cohort_n FROM firsts GROUP BY cohort_m),
    monthly AS (
      SELECT f.cohort_m,
             date_diff('month', f.cohort_m,
                       date_trunc('month', CAST(o.o_orderdate AS DATE)))
               AS age_m,
             sum(o.o_totalprice) AS rev
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2),
    cum AS (
      SELECT m.cohort_m, m.age_m,
             sum(m.rev) OVER (PARTITION BY m.cohort_m ORDER BY m.age_m
                              ROWS UNBOUNDED PRECEDING) / s.cohort_n
               AS cum_per_cust
      FROM monthly m JOIN sizes s USING (cohort_m)),
    payback AS (
      SELECT cohort_m,
             min(CASE WHEN cum_per_cust >= 200000 THEN age_m END)
               AS payback_age
      FROM cum GROUP BY cohort_m)
    SELECT CAST(count(*) AS BIGINT) AS n_cohorts,
           CAST(count(payback_age) AS BIGINT) AS n_paid_back,
           round(avg(payback_age), 3) AS mean_payback_months
    FROM payback
    """,
    tags=("cohort", "ltv", "threshold"),
)
def q_cohort_payback_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort payback: first month-of-life where cumulative revenue
    per cohort member crosses the acquisition-cost threshold — the
    unit-economics question the LTV curve (cohort_ltv_curve) exists
    to answer, computed as a conditional-MIN threshold crossing over
    the cohort-age cumulative (no sort-and-take-first per cohort).
    Cohorts that never pay back stay NULL and are counted separately
    — the honest read at any threshold."""
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min(F.col("o_orderdate").cast("date"))).alias(
            "cohort_m"
        )
    )
    sizes = firsts.groupBy("cohort_m").agg(F.count("*").alias("cohort_n"))
    age = F.months_between(
        F.date_trunc("month", F.col("o_orderdate").cast("date")), F.col("cohort_m")
    ).cast("long")
    monthly = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort_m", age.alias("age_m"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = monthly.join(F.broadcast(sizes), "cohort_m").select(
        "cohort_m",
        "age_m",
        (F.sum("rev").over(w) / F.col("cohort_n")).alias("cum_per_cust"),
    )
    payback = cum.groupBy("cohort_m").agg(
        F.min(F.when(F.col("cum_per_cust") >= 200000, F.col("age_m"))).alias(
            "payback_age"
        )
    )
    return payback.agg(
        F.count("*").cast("bigint").alias("n_cohorts"),
        F.count("payback_age").cast("bigint").alias("n_paid_back"),
        F.round(F.avg("payback_age"), 3).alias("mean_payback_months"),
    )


@register(
    "uncertainty_margin_sampling",
    oracle="""
    WITH dims AS (
      SELECT label, dim, embedding[dim] AS v
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(dim)),
    centroids AS (
      SELECT label AS c_label, dim, avg(v) AS c
      FROM dims GROUP BY label, dim),
    dists AS (
      SELECT e.vec_id, e.label, k.c_label,
             sqrt(sum((e.embedding[k.dim] - k.c) * (e.embedding[k.dim] - k.c)))
               AS d
      FROM embeddings e,
           centroids k
      GROUP BY e.vec_id, e.label, k.c_label),
    ranked AS (
      SELECT vec_id, label, d,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, c_label)
               AS rn
      FROM dists),
    margins AS (
      SELECT a.vec_id, a.label,
             b.d - a.d AS margin
      FROM ranked a JOIN ranked b
        ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
    selected AS (
      SELECT label, margin,
             row_number() OVER (ORDER BY margin, vec_id) AS pick
      FROM margins)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_ambiguous,
           round(avg(margin), 5) AS mean_margin
    FROM selected WHERE pick <= 50
    GROUP BY label
    """,
    tags=("embeddings", "ml", "active-learning"),
)
def q_uncertainty_margin_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based uncertainty sampling — the active-learning
    labeling queue: per embedding, distance to its nearest and
    second-nearest label centroid; the 50 smallest margins are the
    points worth a human label, reported per true label (a class
    over-represented here is where the decision boundary is
    weakest). Centroids broadcast (|labels|·dims); top-2-per-point
    comes from one ranked window over the point×centroid distances,
    and the global pick is a bounded top-k."""
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).select("label", (F.col("pos") + 1).alias("dim"), "v")
    cent = dims.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.avg("v").alias("c")
    )
    pt = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "pv")
    ).select("vec_id", "label", (F.col("pos") + 1).alias("dim"), "pv")
    dists = (
        pt.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sqrt(F.sum((F.col("pv") - F.col("c")) * (F.col("pv") - F.col("c")))).alias(
                "d"
            )
        )
    )
    wr = Window.partitionBy("vec_id").orderBy("d", "c_label")
    ranked = dists.withColumn("rn", F.row_number().over(wr))
    a = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "label", F.col("d").alias("d1")
    )
    b = ranked.filter(F.col("rn") == 2).select(
        F.col("vec_id").alias("v2"), F.col("d").alias("d2")
    )
    margins = a.join(b, a["vec_id"] == b["v2"]).select(
        "vec_id", "label", (F.col("d2") - F.col("d1")).alias("margin")
    )
    picked = margins.withColumn(
        "pick", F.row_number().over(Window.orderBy("margin", "vec_id"))
    ).filter(F.col("pick") <= 50)
    return picked.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_ambiguous"),
        F.round(F.avg("margin"), 5).alias("mean_margin"),
    )


@register(
    "quantile_treatment_effect",
    oracle="""
    WITH assigned AS (
      SELECT CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       >= '8' THEN 1 ELSE 0 END AS treated,
             o_totalprice
      FROM orders),
    qs AS (
      SELECT treated,
             quantile_cont(o_totalprice, 0.1) AS q1,
             quantile_cont(o_totalprice, 0.2) AS q2,
             quantile_cont(o_totalprice, 0.3) AS q3,
             quantile_cont(o_totalprice, 0.4) AS q4,
             quantile_cont(o_totalprice, 0.5) AS q5,
             quantile_cont(o_totalprice, 0.6) AS q6,
             quantile_cont(o_totalprice, 0.7) AS q7,
             quantile_cont(o_totalprice, 0.8) AS q8,
             quantile_cont(o_totalprice, 0.9) AS q9
      FROM assigned GROUP BY treated),
    longq AS (
      SELECT treated, q / 10.0 AS tau,
             CASE q WHEN 1 THEN q1 WHEN 2 THEN q2 WHEN 3 THEN q3
                    WHEN 4 THEN q4 WHEN 5 THEN q5 WHEN 6 THEN q6
                    WHEN 7 THEN q7 WHEN 8 THEN q8 ELSE q9 END AS v
      FROM qs, unnest(generate_series(1, 9)) AS t(q))
    SELECT t.tau,
           round(t.v, 2) AS q_treated,
           round(c.v, 2) AS q_control,
           round(t.v - c.v, 2) AS qte
    FROM (SELECT * FROM longq WHERE treated = 1) t
    JOIN (SELECT * FROM longq WHERE treated = 0) c ON t.tau = c.tau
    """,
    tags=("stats", "experimentation", "percentile"),
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: decile-by-decile difference
    between treatment and control outcome distributions — the view
    that catches effects a mean comparison (welch_ttest) averages
    away (a treatment can lift the tail while flattening the
    median). Hash-split assignment for a deterministic oracle; nine
    exact interpolated quantiles per arm from one grouped pass, a
    9-row join for the effect curve. QTE ≈ 0 everywhere is the
    correct read under a null split."""
    o = _t(spark, sf_dir, "orders")
    assigned = o.select(
        F.when(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) >= "8", 1
        )
        .otherwise(0)
        .alias("treated"),
        "o_totalprice",
    )
    taus = [i / 10.0 for i in range(1, 10)]
    qs = assigned.groupBy("treated").agg(
        *[
            F.expr(f"percentile(o_totalprice, {t})").alias(f"q{i}")
            for i, t in enumerate(taus, start=1)
        ]
    )
    long = qs.select(
        "treated",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tau"), F.col(f"q{i}").alias("v")
                    )
                    for i, t in enumerate(taus, start=1)
                ]
            )
        ).alias("s"),
    ).select("treated", "s.tau", "s.v")
    t = long.filter(F.col("treated") == 1).select("tau", F.col("v").alias("vt"))
    c = long.filter(F.col("treated") == 0).select(
        F.col("tau").alias("tau_c"), F.col("v").alias("vc")
    )
    return t.join(c, t["tau"] == c["tau_c"]).select(
        "tau",
        F.round("vt", 2).alias("q_treated"),
        F.round("vc", 2).alias("q_control"),
        F.round(F.col("vt") - F.col("vc"), 2).alias("qte"),
    )


@register(
    "overlap_coefficient_sources",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT source, w
      FROM documents, unnest(string_split(text, ' ')) AS t(w)
      WHERE w <> ''),
    sizes AS (SELECT source, count(*) AS n FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS sa, b.source AS sb, count(*) AS shared
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT sa, sb, shared,
           round(CAST(shared AS DOUBLE) / least(x.n, y.n), 4)
             AS overlap_coef
    FROM inter
    JOIN sizes x ON x.source = sa
    JOIN sizes y ON y.source = sb
    """,
    tags=("text", "corpus", "setop"),
)
def q_overlap_coefficient_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Szymkiewicz–Simpson overlap between source vocabularies —
    |A∩B| / min(|A|,|B|), the asymmetry-tolerant cousin of Jaccard
    for corpus mixing decisions (a small source fully inside a big
    one scores 1.0 where Jaccard hides it; shingle_containment is
    the same idea at document grain). Vocab dedup per source is the
    only corpus-sized pass; intersections come from the shared-word
    equi-join's group count, sizes broadcast back."""
    d = _t(spark, sf_dir, "documents")
    vocab = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count("*").alias("n"))
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
        .agg(F.count("*").alias("shared"))
    )
    x = sizes.withColumnRenamed("source", "sa").withColumnRenamed("n", "nx")
    y = sizes.withColumnRenamed("source", "sb").withColumnRenamed("n", "ny")
    return (
        inter.join(F.broadcast(x), "sa")
        .join(F.broadcast(y), "sb")
        .select(
            "sa",
            "sb",
            "shared",
            F.round(
                F.col("shared").cast("double") / F.least("nx", "ny"), 4
            ).alias("overlap_coef"),
        )
    )


@register(
    "partial_correlation",
    oracle="""
    WITH base AS (
      SELECT l_quantity AS x, l_extendedprice AS y, l_discount AS z
      FROM lineitem),
    cs AS (
      SELECT corr(x, y) AS rxy, corr(x, z) AS rxz, corr(y, z) AS ryz,
             CAST(count(*) AS BIGINT) AS n
      FROM base)
    SELECT round(rxy, 6) AS r_xy,
           round((rxy - rxz * ryz)
                 / (sqrt(1 - rxz * rxz) * sqrt(1 - ryz * ryz)), 6)
             AS r_xy_given_z,
           n
    FROM cs
    """,
    tags=("stats", "correlation"),
)
def q_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation r_xy·z — the quantity↔price association
    with the discount's influence removed, from the three pairwise
    Pearson correlations in ONE aggregate pass (the recursion
    formula; no residual regressions needed). The raw and partial r
    side by side show whether the control variable was doing the
    work — the first confounder check before any causal claim."""
    li = _t(spark, sf_dir, "lineitem")
    cs = li.agg(
        F.corr("l_quantity", "l_extendedprice").alias("rxy"),
        F.corr("l_quantity", "l_discount").alias("rxz"),
        F.corr("l_extendedprice", "l_discount").alias("ryz"),
        F.count("*").cast("bigint").alias("n"),
    )
    partial = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / (
        F.sqrt(1 - F.col("rxz") * F.col("rxz"))
        * F.sqrt(1 - F.col("ryz") * F.col("ryz"))
    )
    return cs.select(
        F.round("rxy", 6).alias("r_xy"),
        F.round(partial, 6).alias("r_xy_given_z"),
        "n",
    )


@register(
    "kendalls_w_concordance",
    oracle="""
    WITH yearly AS (
      SELECT n_name,
             CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT) AS yr,
             sum(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT)
            BETWEEN 1996 AND 1998
      GROUP BY 1, 2),
    ranked AS (
      SELECT n_name, yr,
             rank() OVER (PARTITION BY yr ORDER BY rev DESC, n_name) AS r
      FROM yearly),
    sums AS (
      SELECT n_name, CAST(sum(r) AS DOUBLE) AS rsum,
             CAST(count(*) AS BIGINT) AS m_check
      FROM ranked GROUP BY n_name),
    stats AS (
      SELECT var_pop(rsum) * count(*) AS s,
             CAST(count(*) AS DOUBLE) AS n
      FROM sums)
    SELECT round(12.0 * s / (9.0 * (n * n * n - n)), 6) AS kendalls_w,
           CAST(n AS BIGINT) AS n_items
    FROM stats
    """,
    tags=("stats", "rank", "agreement"),
)
def q_kendalls_w_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W — concordance of m=3 yearly revenue rankings of
    the nations: W = 12S/(m²(n³−n)) with S the sum of squared
    rank-sum deviations (computed as n·var_pop of the rank sums).
    W→1 = the league table is stable year over year, W→0 = the
    rankings are noise — the multi-period stability statistic behind
    rank_movement's per-pair view. Rankings are per-year windows on
    the |nations|×|years| aggregate; everything after is scalar."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    yr = F.year(F.col("o_orderdate").cast("date"))
    yearly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .filter(yr.between(1996, 1998))
        .groupBy("n_name", yr.alias("yr"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    wrank = Window.partitionBy("yr").orderBy(F.col("rev").desc(), F.col("n_name"))
    ranked = yearly.select("n_name", F.rank().over(wrank).alias("r"))
    sums = ranked.groupBy("n_name").agg(F.sum("r").cast("double").alias("rsum"))
    stats = sums.agg(
        (F.var_pop("rsum") * F.count("*")).alias("s"),
        F.count("*").cast("double").alias("nn"),
    )
    return stats.select(
        F.round(
            12.0 * F.col("s") / (9.0 * (F.col("nn") ** 3 - F.col("nn"))), 6
        ).alias("kendalls_w"),
        F.col("nn").cast("bigint").alias("n_items"),
    )


@register(
    "runs_test_randomness",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    med AS (SELECT quantile_cont(v, 0.5) AS m FROM daily),
    signs AS (
      SELECT d, CASE WHEN v > m THEN 1 ELSE 0 END AS s
      FROM daily CROSS JOIN med WHERE v <> m),
    runs AS (
      SELECT s,
             CASE WHEN lag(s) OVER (ORDER BY d) IS DISTINCT FROM s
                  THEN 1 ELSE 0 END AS new_run
      FROM signs),
    cnt AS (
      SELECT CAST(sum(new_run) AS DOUBLE) AS r,
             CAST(sum(s) AS DOUBLE) AS n1,
             CAST(count(*) - sum(s) AS DOUBLE) AS n0
      FROM runs)
    SELECT CAST(r AS BIGINT) AS n_runs,
           round(1 + 2 * n1 * n0 / (n1 + n0), 3) AS expected_runs,
           round((r - (1 + 2 * n1 * n0 / (n1 + n0)))
                 / sqrt(2 * n1 * n0 * (2 * n1 * n0 - n1 - n0)
                        / ((n1 + n0) * (n1 + n0) * (n1 + n0 - 1))), 4)
             AS z_score
    FROM cnt
    """,
    tags=("stats", "timeseries", "randomness"),
)
def q_runs_test_randomness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily revenue vs its median:
    count sign runs (LAG flags run starts), compare against the
    expected count under exchangeability — too few runs = trending,
    too many = oscillating; |z| < 2 = consistent with randomness
    (the expected read on this generator, and the residual check a
    forecaster runs after detrending; cf. acf_daily_revenue for the
    parametric view). One window over the daily aggregate, scalar
    algebra after."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    med = daily.agg(F.expr("percentile(v, 0.5)").alias("m"))
    signs = (
        daily.join(F.broadcast(med))
        .filter(F.col("v") != F.col("m"))
        .select("d", F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s"))
    )
    w = Window.orderBy("d")
    runs = signs.select(
        "s",
        F.when(
            ~F.lag("s").over(w).eqNullSafe(F.col("s")), 1
        ).otherwise(0).alias("new_run"),
    )
    cnt = runs.agg(
        F.sum("new_run").cast("double").alias("r"),
        F.sum("s").cast("double").alias("n1"),
        (F.count("*") - F.sum("s")).cast("double").alias("n0"),
    )
    exp_r = 1 + 2 * F.col("n1") * F.col("n0") / (F.col("n1") + F.col("n0"))
    var_r = (
        2
        * F.col("n1")
        * F.col("n0")
        * (2 * F.col("n1") * F.col("n0") - F.col("n1") - F.col("n0"))
        / (
            (F.col("n1") + F.col("n0"))
            * (F.col("n1") + F.col("n0"))
            * (F.col("n1") + F.col("n0") - 1)
        )
    )
    return cnt.select(
        F.col("r").cast("bigint").alias("n_runs"),
        F.round(exp_r, 3).alias("expected_runs"),
        F.round((F.col("r") - exp_r) / F.sqrt(var_r), 4).alias("z_score"),
    )


@register(
    "dp_noisy_counts",
    oracle="""
    WITH cells AS (
      SELECT n_name, CAST(count(*) AS DOUBLE) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name),
    noised AS (
      SELECT n_name, n,
             (('0x' || substr(md5(n_name), 1, 8))::UBIGINT + 1)
               / 4294967296.0 AS u
      FROM cells)
    SELECT n_name,
           round(n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * 2.0 * ln(1.0 - 2.0 * abs(u - 0.5)), 3)
             AS noisy_count,
           round(abs((CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                     * 2.0 * ln(1.0 - 2.0 * abs(u - 0.5))), 3)
             AS noise_magnitude
    FROM noised
    """,
    tags=("privacy", "agg"),
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism count release (ε=0.5, sensitivity 1 →
    scale b=2): per-nation customer-order counts plus
    inverse-CDF-sampled Laplace noise — with the uniform drawn
    BIT-EXACTLY from md5 of the cell key (the weighted_sample_es
    device), so the 'noise' is reproducible across engines and the
    oracle can pin the released values. A real deployment draws u
    from a CSPRNG — everything else (the mechanism, the per-cell
    independence, the magnitude distribution) is exactly this
    query's shape; sensitivity-1 holds because each (customer,
    order) contributes to one nation cell."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    u = (
        F.conv(F.substring(F.md5(F.col("n_name")), 1, 8), 16, 10).cast("double") + 1
    ) / F.lit(4294967296.0)
    sign = F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = sign * 2.0 * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return cells.select(
        "n_name",
        F.round(F.col("cnt") + noise, 3).alias("noisy_count"),
        F.round(F.abs(noise), 3).alias("noise_magnitude"),
    )


@register(
    "k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT n_name,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             o_orderpriority,
             count(*) AS grp_n
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3)
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN grp_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_k,
           CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           round(CAST(sum(CASE WHEN grp_n < 5 THEN grp_n ELSE 0 END)
                      AS DOUBLE) / sum(grp_n), 4) AS at_risk_share,
           CAST(min(grp_n) AS BIGINT) AS smallest_group
    FROM qi
    """,
    tags=("privacy", "audit", "agg"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    order month, priority): how many equivalence classes fall below
    k=5, and what share of rows they expose — the re-identification
    risk check run before any 'anonymized' data release (small
    groups are the linkage attack surface; the fix is coarsening a
    QI column or suppressing the rows, then re-running this audit).
    One grouped count + one |groups|-sized rollup, at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    qi = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
            "o_orderpriority",
        )
        .agg(F.count("*").alias("grp_n"))
    )
    below = F.when(F.col("grp_n") < 5, F.col("grp_n")).otherwise(0)
    return qi.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_k"),
        F.sum(below).cast("bigint").alias("rows_at_risk"),
        F.round(
            F.sum(below).cast("double") / F.sum("grp_n"), 4
        ).alias("at_risk_share"),
        F.min("grp_n").cast("bigint").alias("smallest_group"),
    )


@register(
    "class_balance_weights",
    oracle="""
    WITH counts AS (
      SELECT label, CAST(count(*) AS DOUBLE) AS n_k
      FROM embeddings GROUP BY label),
    tot AS (SELECT sum(n_k) AS n, CAST(count(*) AS DOUBLE) AS k FROM counts)
    SELECT label,
           CAST(n_k AS BIGINT) AS n_examples,
           round(n / (k * n_k), 6) AS inverse_freq_weight,
           round((1 - pow(0.999, n_k)) / (1 - 0.999), 4)
             AS effective_number,
           round((1 - 0.999) / (1 - pow(0.999, n_k)), 6)
             AS class_balanced_weight
    FROM counts CROSS JOIN tot
    """,
    tags=("training", "ml", "weights"),
)
def q_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-imbalance weight table: inverse-frequency N/(K·n_k)
    next to the effective-number weighting (1−β)/(1−β^n), β=0.999
    (Cui et al. 2019) — the per-label loss weights a trainer loads
    before fitting on skewed labels; effective-number tempering
    matters exactly when classes are large enough that marginal
    examples overlap. A |labels|-row aggregate and a 1-row broadcast
    total; the table is the artifact."""
    emb = _t(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count("*").cast("double").alias("n_k"))
    tot = counts.agg(
        F.sum("n_k").alias("n"), F.count("*").cast("double").alias("k")
    )
    beta = 0.999
    eff = (1 - F.pow(F.lit(beta), F.col("n_k"))) / (1 - beta)
    return counts.join(F.broadcast(tot)).select(
        "label",
        F.col("n_k").cast("bigint").alias("n_examples"),
        F.round(F.col("n") / (F.col("k") * F.col("n_k")), 6).alias(
            "inverse_freq_weight"
        ),
        F.round(eff, 4).alias("effective_number"),
        F.round(1.0 / eff, 6).alias("class_balanced_weight"),
    )


@register(
    "curriculum_difficulty_phases",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS DOUBLE)
               / greatest(n_chars, 1) AS word_density,
             ntile(4) OVER (
               ORDER BY CAST(len(string_split(text, ' ')) AS DOUBLE)
                        / greatest(n_chars, 1) DESC, doc_id) AS phase
      FROM documents WHERE n_chars > 0)
    SELECT phase,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS char_budget,
           round(avg(word_density), 5) AS mean_density
    FROM scored GROUP BY phase
    """,
    tags=("training", "curriculum"),
)
def q_curriculum_difficulty_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: documents quartiled by a
    difficulty proxy (word density — high density = simple short
    words first, the easy→hard schedule), with per-phase doc counts
    and character budgets — the phase manifest a curriculum trainer
    consumes (each phase becomes a filter on the stored phase
    column; sequence_packing then packs within phase). Deterministic
    ntile order makes phase assignment reproducible; at 100 TB the
    ntile becomes approx-percentile cutpoints exactly as in
    rfm_segmentation."""
    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    density = F.size(F.split("text", " ")).cast("double") / F.greatest(
        F.col("n_chars"), F.lit(1)
    )
    scored = d.select(
        "doc_id",
        "n_chars",
        density.alias("word_density"),
        F.ntile(4)
        .over(Window.orderBy(density.desc(), F.col("doc_id")))
        .alias("phase"),
    )
    return scored.groupBy("phase").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("char_budget"),
        F.round(F.avg("word_density"), 5).alias("mean_density"),
    )


@register(
    "ipf_raking_weights",
    oracle="""
    WITH cells AS (
      SELECT n_regionkey AS rk, o_orderpriority AS pr,
             CAST(count(*) AS DOUBLE) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    tot AS (SELECT sum(n) AS total, CAST(count(DISTINCT rk) AS DOUBLE) AS n_r,
                   CAST(count(DISTINCT pr) AS DOUBLE) AS n_p
            FROM cells),
    -- round 1: match uniform region margins
    r1 AS (
      SELECT c.rk, c.pr,
             c.n * (t.total / t.n_r)
                 / sum(c.n) OVER (PARTITION BY c.rk) AS w
      FROM cells c CROSS JOIN tot t),
    -- round 2: match uniform priority margins
    r2 AS (
      SELECT rk, pr,
             w * (t.total / t.n_p) / sum(w) OVER (PARTITION BY pr) AS w
      FROM r1 CROSS JOIN tot t)
    SELECT pr,
           round(sum(w), 3) AS priority_margin_after,
           round(min(w / n0.n), 5) AS min_weight_ratio,
           round(max(w / n0.n), 5) AS max_weight_ratio
    FROM r2 JOIN cells n0 USING (rk, pr)
    GROUP BY pr
    """,
    tags=("stats", "weighting", "iterative"),
)
def q_ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking): reweight the
    region×priority contingency table to uniform target margins —
    round 1 scales rows to the region margin, round 2 re-scales to
    the priority margin (each round one window-sum per dimension,
    unrolled so the oracle replays it exactly; production runs until
    convergence). After round 2 the priority margins ARE the target
    (pinned in the output) while region margins drift slightly — the
    classic IPF behavior. This is how survey weights and
    demographic-balanced sampling weights are produced at scale: the
    cell table is tiny, the weights join back to facts."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_regionkey").alias("rk"), F.col("o_orderpriority").alias("pr"))
        .agg(F.count("*").cast("double").alias("n0"))
    )
    tot = cells.agg(
        F.sum("n0").alias("total"),
        F.count_distinct("rk").cast("double").alias("n_r"),
        F.count_distinct("pr").cast("double").alias("n_p"),
    )
    wr = Window.partitionBy("rk")
    wp = Window.partitionBy("pr")
    r1 = cells.join(F.broadcast(tot)).select(
        "rk",
        "pr",
        "n0",
        "total",
        "n_p",
        (
            F.col("n0") * (F.col("total") / F.col("n_r")) / F.sum("n0").over(wr)
        ).alias("w"),
    )
    r2 = r1.select(
        "rk",
        "pr",
        "n0",
        (
            F.col("w") * (F.col("total") / F.col("n_p")) / F.sum("w").over(wp)
        ).alias("w"),
    )
    return r2.groupBy("pr").agg(
        F.round(F.sum("w"), 3).alias("priority_margin_after"),
        F.round(F.min(F.col("w") / F.col("n0")), 5).alias("min_weight_ratio"),
        F.round(F.max(F.col("w") / F.col("n0")), 5).alias("max_weight_ratio"),
    )


@register(
    "gains_chart_deciles",
    oracle="""
    WITH scored AS (
      SELECT c_acctbal AS score,
             CASE WHEN spend > 300000 THEN 1 ELSE 0 END AS converted
      FROM (
        SELECT c.c_custkey, c.c_acctbal, coalesce(sum(o.o_totalprice), 0)
                 AS spend
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal) t),
    ranked AS (
      SELECT converted,
             ntile(10) OVER (ORDER BY score DESC,
                             converted, random_tiebreak) AS decile
      FROM (SELECT *, row_number() OVER (ORDER BY score, converted)
                        AS random_tiebreak FROM scored)),
    tot AS (SELECT CAST(sum(converted) AS DOUBLE) AS all_conv FROM ranked)
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(converted) AS BIGINT) AS conversions,
           round(sum(sum(converted)) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) / max(t.all_conv), 4)
             AS cum_gain
    FROM ranked CROSS JOIN tot t
    GROUP BY decile
    """,
    tags=("ml", "eval", "gains"),
)
def q_gains_chart_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains chart: customers deciled by a score
    (account balance as the stand-in model score), per-decile
    conversion capture and the cumulative gain curve — the
    campaign-targeting view of ranking quality next to
    auc_rank_sum's scalar (a useless score shows cum_gain ≈
    decile/10; lift above the diagonal is the model's value). The
    windowed sum-of-sums computes the curve ON the 10-row grouped
    result — no second pass over customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("spend"))
    )
    scored = spend.select(
        F.col("c_acctbal").alias("score"),
        F.when(F.col("spend") > 300000, 1).otherwise(0).alias("converted"),
    )
    tie = F.row_number().over(Window.orderBy("score", "converted"))
    ranked = scored.withColumn("random_tiebreak", tie).select(
        "converted",
        F.ntile(10)
        .over(
            Window.orderBy(
                F.col("score").desc(), F.col("converted"), F.col("random_tiebreak")
            )
        )
        .alias("decile"),
    )
    tot = ranked.agg(F.sum("converted").cast("double").alias("all_conv"))
    per = (
        ranked.join(F.broadcast(tot))
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("converted").cast("bigint").alias("conversions"),
            F.max("all_conv").alias("all_conv"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "decile",
        "n",
        "conversions",
        F.round(
            F.sum("conversions").over(wcum) / F.col("all_conv"), 4
        ).alias("cum_gain"),
    )


@register(
    "degree_assortativity",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    cdeg AS (SELECT c, CAST(count(*) AS DOUBLE) AS dc FROM edges GROUP BY c),
    pdeg AS (SELECT p, CAST(count(*) AS DOUBLE) AS dp FROM edges GROUP BY p)
    SELECT round(corr(dc, dp), 6) AS assortativity,
           CAST(count(*) AS BIGINT) AS n_edges,
           round(avg(dc), 3) AS mean_cust_degree,
           round(avg(dp), 3) AS mean_part_degree
    FROM edges JOIN cdeg USING (c) JOIN pdeg USING (p)
    """,
    tags=("graph", "stats"),
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the purchase graph: Pearson
    correlation of endpoint degrees ACROSS EDGES (not across nodes —
    each edge contributes its two endpoint degrees, so hubs weight
    in proportion to their edges). Negative = hubs attach to leaves
    (the usual bipartite commerce signature), positive = rich club.
    Completes the graph-profile pair with bipartite_degree_profile;
    mechanically it's the edge relation joined to both degree
    aggregates — joins keyed on the edge endpoints, the same
    shuffles the degree counts already created."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cdeg = edges.groupBy("c").agg(F.count("*").cast("double").alias("dc"))
    pdeg = edges.groupBy("p").agg(F.count("*").cast("double").alias("dp"))
    j = edges.join(cdeg, "c").join(pdeg, "p")
    return j.agg(
        F.round(F.corr("dc", "dp"), 6).alias("assortativity"),
        F.count("*").cast("bigint").alias("n_edges"),
        F.round(F.avg("dc"), 3).alias("mean_cust_degree"),
        F.round(F.avg("dp"), 3).alias("mean_part_degree"),
    )


@register(
    "burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY user_id, CAST(ts AS DATE)),
    spine AS (
      SELECT u.user_id, CAST(g.d AS DATE) AS d
      FROM (SELECT DISTINCT user_id FROM daily) u
      CROSS JOIN (
        SELECT unnest(generate_series(
          (SELECT min(d) FROM daily),
          (SELECT max(d) FROM daily),
          INTERVAL 1 DAY)) AS d) g),
    dense AS (
      SELECT s.user_id, coalesce(daily.n, 0) AS n
      FROM spine s LEFT JOIN daily
        ON daily.user_id = s.user_id AND daily.d = s.d),
    fano AS (
      SELECT user_id, var_pop(n) / avg(n) AS f
      FROM dense GROUP BY user_id HAVING avg(n) > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           round(avg(f), 4) AS mean_fano,
           round(quantile_cont(f, 0.5), 4) AS median_fano,
           CAST(sum(CASE WHEN f > 1.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bursty
    FROM fano
    """,
    tags=("events", "stats", "pointprocess"),
)
def q_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness via the Fano factor (index of dispersion):
    per-user daily event counts DENSIFIED over the full calendar
    (zero days count — without the spine, quiet users look Poisson),
    then var/mean per user; F≈1 = Poisson, F≫1 = bursty sessions —
    the point-process diagnostic that decides whether rate-based
    capacity models apply. The spine is |users|×|days| narrow rows
    from two broadcastable relations; everything else is hash
    aggregation."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.count("*").cast("double").alias("n"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    users = daily.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(days))
    dense = spine.join(daily, ["user_id", "d"], "left").select(
        "user_id", F.coalesce("n", F.lit(0.0)).alias("n")
    )
    fano = (
        dense.groupBy("user_id")
        .agg((F.var_pop("n") / F.avg("n")).alias("f"), F.avg("n").alias("mu"))
        .filter(F.col("mu") > 0)
    )
    return fano.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.round(F.avg("f"), 4).alias("mean_fano"),
        F.round(F.expr("percentile(f, 0.5)"), 4).alias("median_fano"),
        F.sum(F.when(F.col("f") > 1.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bursty"),
    )


_HOLT_SQL = """
    WITH RECURSIVE daily AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i, v
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
        FROM orders
        WHERE CAST(o_orderdate AS DATE) < DATE '1995-02-01'
        GROUP BY 1) t),
    holt AS (
      SELECT i, v AS lvl, CAST(0.0 AS DOUBLE) AS trend FROM daily WHERE i = 1
      UNION ALL
      SELECT d.i,
             0.3 * d.v + 0.7 * (h.lvl + h.trend),
             0.1 * ((0.3 * d.v + 0.7 * (h.lvl + h.trend)) - h.lvl)
               + 0.9 * h.trend
      FROM daily d JOIN holt h ON d.i = h.i + 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(max(lvl), 2) AS final_level_seen,
           round(avg(trend), 3) AS mean_trend,
           round(sum(abs(trend)), 3) AS trend_energy
    FROM holt
    """


@register(
    "holt_linear_recursive",
    oracle=_HOLT_SQL,
    tags=("recursive", "forecast", "timeseries"),
)
def q_holt_linear_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing — TWO coupled
    state variables (level, trend) threaded through the recurrence
    l_t = αy + (1−α)(l+b), b_t = β(l_t−l_{t−1}) + (1−β)b — run as
    the identical recursive CTE text on both engines (the companion
    to saturating_balance_recursive's single-state clamp; together
    they pin the semantics any streaming stateful operator must
    reproduce). α=0.3, β=0.1, one month of days bounds the depth;
    at scale this recurrence lives in applyInPandasWithState per
    series, not a 90-step join chain."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_HOLT_SQL)


@register(
    "embedding_anisotropy_audit",
    oracle="""
    WITH dims AS (
      SELECT dim, embedding[dim] AS v
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(dim)),
    per_dim AS (
      SELECT dim, avg(v) AS mu, var_pop(v) AS s2
      FROM dims GROUP BY dim)
    SELECT CAST(count(*) AS BIGINT) AS n_dims,
           round(max(s2) / min(s2), 3) AS variance_ratio,
           round(max(abs(mu)), 5) AS worst_mean_offset,
           round(sum(s2), 5) AS total_variance,
           round(max(s2) / sum(s2), 5) AS top_dim_share
    FROM per_dim
    """,
    tags=("embeddings", "audit", "ml"),
)
def q_embedding_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy audit: per-dimension mean offsets
    and the variance concentration ratio — anisotropic spaces (few
    dominant directions, a common mean offset) degrade cosine
    retrieval, and whitening/centering decisions start from exactly
    these numbers (Ethayarajh 2019). One explode + |dims|-group
    moments pass; the summary is scalar. At 100 TB the same
    per-dimension moments come from partial aggregates — mergeable
    like any sum."""
    emb = _t(spark, sf_dir, "embeddings")
    dims = emb.select(F.posexplode("embedding").alias("pos", "v")).select(
        (F.col("pos") + 1).alias("dim"), "v"
    )
    per_dim = dims.groupBy("dim").agg(
        F.avg("v").alias("mu"), F.var_pop("v").alias("s2")
    )
    return per_dim.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.round(F.max("s2") / F.min("s2"), 3).alias("variance_ratio"),
        F.round(F.max(F.abs(F.col("mu"))), 5).alias("worst_mean_offset"),
        F.round(F.sum("s2"), 5).alias("total_variance"),
        F.round(F.max("s2") / F.sum("s2"), 5).alias("top_dim_share"),
    )


@register(
    "adstock_carryover",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT a.d,
             sum(b.x * pow(0.7, date_diff('day', b.d, a.d))) AS adstock
      FROM daily a JOIN daily b
        ON b.d BETWEEN a.d - 14 AND a.d
      GROUP BY a.d)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           round(avg(adstock), 2) AS mean_adstock,
           round(max(adstock), 2) AS peak_adstock
    FROM pairs
    """,
    tags=("timeseries", "marketing", "window"),
)
def q_adstock_carryover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock (advertising carryover): today's effective
    pressure = Σ_k λ^k·spend(t−k), λ=0.7, truncated at 14 days where
    the weight is < 1% — the media-mix-model transform, computed by
    the closed form (a bounded range self-join with power weights)
    instead of the recurrence, so it parallelizes trivially: every
    output day depends on a CONSTANT 15-day slice, unlike the
    recursive formulations (holt_linear_recursive) whose state
    chains. ≤15 join partners per day on the daily aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    a = daily.select(F.col("d").alias("ad"))
    b = daily.select(F.col("d").alias("bd"), "x")
    pairs = (
        a.join(
            b,
            (F.col("bd") >= F.date_sub(F.col("ad"), 14))
            & (F.col("bd") <= F.col("ad")),
        )
        .groupBy("ad")
        .agg(
            F.sum(
                F.col("x") * F.pow(F.lit(0.7), F.datediff(F.col("ad"), F.col("bd")))
            ).alias("adstock")
        )
    )
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.avg("adstock"), 2).alias("mean_adstock"),
        F.round(F.max("adstock"), 2).alias("peak_adstock"),
    )


@register(
    "abc_xyz_matrix",
    oracle="""
    WITH part_stats AS (
      SELECT l_partkey,
             sum(l_extendedprice) AS value_total,
             stddev_samp(l_quantity) / avg(l_quantity) AS cv
      FROM lineitem GROUP BY l_partkey HAVING count(*) >= 3),
    ranked AS (
      SELECT *,
             sum(value_total) OVER (ORDER BY value_total DESC, l_partkey
                                    ROWS UNBOUNDED PRECEDING)
               / sum(value_total) OVER () AS cum_share
      FROM part_stats),
    classed AS (
      SELECT CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN cv < 0.5 THEN 'X'
                  WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz,
             value_total
      FROM ranked)
    SELECT abc, xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(value_total), 2) AS segment_value
    FROM classed GROUP BY abc, xyz
    """,
    tags=("inventory", "window", "classification"),
)
def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory matrix: parts classed by cumulative value
    share (A = the 80% head, the pareto_8020 device) crossed with
    demand variability (coefficient of variation: X stable → Z
    erratic) — the 9-cell grid that decides stocking policy (AX =
    automate, CZ = kill). One stats pass per part, one ranked
    window for the value classes, pure CASE for the rest; the grid
    is the deliverable."""
    li = _t(spark, sf_dir, "lineitem")
    part_stats = (
        li.groupBy("l_partkey")
        .agg(
            F.sum("l_extendedprice").alias("value_total"),
            (F.stddev_samp("l_quantity") / F.avg("l_quantity")).alias("cv"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 3)
    )
    wc = Window.orderBy(F.col("value_total").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ranked = part_stats.select(
        "value_total",
        "cv",
        (F.sum("value_total").over(wc) / F.sum("value_total").over(wall)).alias(
            "cum_share"
        ),
    )
    abc = (
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
    )
    xyz = (
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
    )
    return ranked.groupBy(abc.alias("abc"), xyz.alias("xyz")).agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.round(F.sum("value_total"), 2).alias("segment_value"),
    )


@register(
    "arc_elasticity_bands",
    oracle="""
    WITH bands AS (
      SELECT round(l_discount, 2) AS disc,
             avg(l_quantity) AS q,
             avg(l_extendedprice * (1 - l_discount) / l_quantity) AS p,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem WHERE l_quantity > 0
      GROUP BY 1 HAVING count(*) >= 100),
    arcs AS (
      SELECT disc, q, p, n,
             lag(q) OVER (ORDER BY disc) AS q0,
             lag(p) OVER (ORDER BY disc) AS p0
      FROM bands)
    SELECT disc,
           round(((q - q0) / ((q + q0) / 2))
                 / (((p - p0) / ((p + p0) / 2))), 4) AS arc_elasticity,
           round(q, 3) AS mean_qty, round(p, 2) AS mean_unit_price, n
    FROM arcs WHERE q0 IS NOT NULL AND p <> p0
    """,
    tags=("economics", "window"),
)
def q_arc_elasticity_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arc price elasticity between adjacent discount bands: midpoint
    %Δquantity / %Δprice (the midpoint formula is symmetric, so band
    order doesn't bias the sign) — the pricing team's first look at
    demand response, next to regr_diagnostics' parametric slope.
    Bands are a rounded group key; the elasticity chain is a LAG over
    the |bands| aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    bands = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy(F.round("l_discount", 2).alias("disc"))
        .agg(
            F.avg("l_quantity").alias("q"),
            F.avg(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) / F.col("l_quantity")
            ).alias("p"),
            F.count("*").cast("bigint").alias("n"),
        )
        .filter(F.col("n") >= 100)
    )
    w = Window.orderBy("disc")
    arcs = bands.select(
        "disc", "q", "p", "n",
        F.lag("q").over(w).alias("q0"),
        F.lag("p").over(w).alias("p0"),
    ).filter(F.col("q0").isNotNull() & (F.col("p") != F.col("p0")))
    el = ((F.col("q") - F.col("q0")) / ((F.col("q") + F.col("q0")) / 2)) / (
        (F.col("p") - F.col("p0")) / ((F.col("p") + F.col("p0")) / 2)
    )
    return arcs.select(
        "disc",
        F.round(el, 4).alias("arc_elasticity"),
        F.round("q", 3).alias("mean_qty"),
        F.round("p", 2).alias("mean_unit_price"),
        "n",
    )


@register(
    "poisson_fit_basket_sizes",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
      FROM lineitem GROUP BY l_orderkey),
    hist AS (SELECT k, CAST(count(*) AS DOUBLE) AS obs FROM sizes GROUP BY k),
    fit AS (SELECT avg(CAST(k AS DOUBLE)) AS lam,
                   CAST(count(*) AS DOUBLE) AS n FROM sizes)
    SELECT k, CAST(obs AS BIGINT) AS observed,
           round(n * exp(-lam) * pow(lam, k) / factorial(CAST(k AS INT)), 2)
             AS expected,
           round((obs - n * exp(-lam) * pow(lam, k)
                       / factorial(CAST(k AS INT)))
                 / sqrt(n * exp(-lam) * pow(lam, k)
                        / factorial(CAST(k AS INT))), 3) AS pearson_resid
    FROM hist CROSS JOIN fit
    WHERE k <= 12
    """,
    tags=("stats", "distribution-fit"),
)
def q_poisson_fit_basket_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson goodness-of-fit for basket sizes: MLE λ = mean lines
    per order, expected counts n·e^{−λ}λ^k/k!, and per-cell Pearson
    residuals — the distribution-fit companion to
    chi_square_independence (which tests association) and
    benford_first_digit (which fixes the reference distribution
    a priori). Large residuals at specific k expose order-size
    mechanics no mean-based check sees. Histogram + 1-row fit
    broadcast; factorial stays exact (k ≤ 12 < 21)."""
    li = _t(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("k"))
    hist = sizes.groupBy("k").agg(F.count("*").cast("double").alias("obs"))
    fit = sizes.agg(
        F.avg(F.col("k").cast("double")).alias("lam"),
        F.count("*").cast("double").alias("n"),
    )
    exp_k = (
        F.col("n")
        * F.exp(-F.col("lam"))
        * F.pow(F.col("lam"), F.col("k"))
        / F.factorial(F.col("k").cast("int"))
    )
    return (
        hist.join(F.broadcast(fit))
        .filter(F.col("k") <= 12)
        .select(
            "k",
            F.col("obs").cast("bigint").alias("observed"),
            F.round(exp_k, 2).alias("expected"),
            F.round((F.col("obs") - exp_k) / F.sqrt(exp_k), 3).alias(
                "pearson_resid"
            ),
        )
    )


@register(
    "inspection_paradox_gaps",
    oracle="""
    WITH gaps AS (
      SELECT (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id))
              - epoch_us(ts)) / 1000000.0 AS g
      FROM events),
    clean AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           round(avg(g), 3) AS mean_gap_s,
           round(sum(g * g) / sum(g), 3) AS size_biased_mean_s,
           round((sum(g * g) / sum(g)) / avg(g), 4) AS paradox_ratio
    FROM clean
    """,
    tags=("events", "stats", "pointprocess"),
)
def q_inspection_paradox_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inspection paradox, measured: mean inter-event gap vs the
    size-biased mean E[g²]/E[g] — what a random OBSERVER landing in
    the timeline experiences (a Poisson process gives ratio 2; the
    further above, the burstier — the scalar twin of
    burstiness_fano). Explains why 'average time between deploys'
    never matches what an on-call engineer feels. One user-keyed
    window pass, two moments, no second scan."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        (
            (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")) / 1_000_000.0
        ).alias("g")
    ).filter(F.col("g").isNotNull() & (F.col("g") > 0))
    return gaps.agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.round(F.avg("g"), 3).alias("mean_gap_s"),
        F.round(F.sum(F.col("g") * F.col("g")) / F.sum("g"), 3).alias(
            "size_biased_mean_s"
        ),
        F.round(
            (F.sum(F.col("g") * F.col("g")) / F.sum("g")) / F.avg("g"), 4
        ).alias("paradox_ratio"),
    )


@register(
    "fifo_lot_matching",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS d, l_quantity AS q,
             sum(l_quantity) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS hi
      FROM lineitem WHERE l_returnflag = 'N' AND l_partkey % 20 = 0),
    demand AS (
      SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS d, l_quantity AS q,
             sum(l_quantity) OVER (PARTITION BY l_partkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS hi
      FROM lineitem WHERE l_returnflag = 'R' AND l_partkey % 20 = 0),
    matched AS (
      SELECT s.pk,
             least(s.hi, dm.hi)
               - greatest(s.hi - s.q, dm.hi - dm.q) AS mq,
             date_diff('day', s.d, dm.d) AS lag_days
      FROM supply s JOIN demand dm
        ON s.pk = dm.pk
       AND s.hi - s.q < dm.hi
       AND dm.hi - dm.q < s.hi)
    SELECT CAST(count(*) AS BIGINT) AS n_matches,
           round(sum(mq), 2) AS matched_qty,
           round(avg(lag_days), 2) AS mean_lag_days,
           CAST(count(DISTINCT pk) AS BIGINT) AS n_parts
    FROM matched WHERE mq > 0
    """,
    tags=("interval", "allocation", "window"),
)
def q_fifo_lot_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot matching — the inventory-costing / lot-genealogy
    allocation: supply and demand lots per part each get cumulative
    quantity intervals [hi−q, hi), and a supply lot serves a demand
    lot exactly where the intervals OVERLAP (the classic cumulative-
    interval join; matched qty = interval intersection length). No
    loops, no state: two windows + one banded self-join reproduce
    sequential FIFO exactly, because cumulative position IS the
    queue discipline. Join keys on (part, interval overlap) — the
    per-part intervals are sorted and short, and a part-key sample
    keeps the oracle relation small."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 20 == 0)
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def lots(flag: str) -> DataFrame:
        return li.filter(F.col("l_returnflag") == flag).select(
            F.col("l_partkey").alias("pk"),
            F.col("l_shipdate").cast("date").alias("d"),
            F.col("l_quantity").alias("q"),
            F.sum("l_quantity").over(w).alias("hi"),
        )

    s = lots("N").alias("s")
    dm = lots("R").alias("dm")
    matched = s.join(
        dm,
        (F.col("s.pk") == F.col("dm.pk"))
        & (F.col("s.hi") - F.col("s.q") < F.col("dm.hi"))
        & (F.col("dm.hi") - F.col("dm.q") < F.col("s.hi")),
    ).select(
        F.col("s.pk").alias("pk"),
        (
            F.least(F.col("s.hi"), F.col("dm.hi"))
            - F.greatest(
                F.col("s.hi") - F.col("s.q"), F.col("dm.hi") - F.col("dm.q")
            )
        ).alias("mq"),
        F.datediff(F.col("dm.d"), F.col("s.d")).alias("lag_days"),
    ).filter(F.col("mq") > 0)
    return matched.agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.round(F.sum("mq"), 2).alias("matched_qty"),
        F.round(F.avg("lag_days"), 2).alias("mean_lag_days"),
        F.count_distinct("pk").cast("bigint").alias("n_parts"),
    )


_BOM_SQL = """
    WITH RECURSIVE parts AS (
      SELECT p_partkey AS pk, p_retailprice AS unit_cost
      FROM part WHERE p_partkey <= 600),
    bom AS (
      SELECT pk, CAST(1.0 AS DOUBLE) AS qty, unit_cost, 0 AS depth
      FROM parts WHERE pk <= 2
      UNION ALL
      SELECT c.pk, b.qty * (1 + c.pk % 3), c.unit_cost, b.depth + 1
      FROM parts c JOIN bom b
        ON CAST(floor(c.pk / 4.0) AS BIGINT) = b.pk AND c.pk > 2
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n_components,
           round(sum(qty * unit_cost), 2) AS extended_cost,
           round(max(qty), 1) AS max_qty_mult
    FROM bom GROUP BY depth
    """


@register(
    "bom_cost_explosion",
    oracle=_BOM_SQL,
    tags=("recursive", "hierarchy", "bom"),
)
def q_bom_cost_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion with quantity roll-up — the third
    recursive-CTE flavor after BFS depth (recursive_org_depth) and
    sequential state (saturating/holt): here the recursion MULTIPLIES
    down the tree (a level-3 component used 2× in a level-2 assembly
    used 3× in the root contributes 6× its unit cost), the
    computation MRP systems run nightly. The implicit tree is
    parent = ⌊pk/4⌋ over a bounded part range; identical SQL text on
    both engines, each recursion level one equi-join against the
    frontier."""
    _t(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_BOM_SQL)


@register(
    "quantile_mapping_harmonization",
    oracle="""
    WITH src AS (
      SELECT value AS v FROM events
      WHERE event_type = 'click' AND value IS NOT NULL),
    tgt AS (
      SELECT value AS v FROM events
      WHERE event_type = 'view' AND value IS NOT NULL),
    src_ranked AS (
      SELECT v, ntile(20) OVER (ORDER BY v) AS qb FROM src),
    tgt_cuts AS (
      SELECT qb, avg(v) AS tgt_v
      FROM (SELECT v, ntile(20) OVER (ORDER BY v) AS qb FROM tgt)
      GROUP BY qb),
    mapped AS (
      SELECT s.v AS orig, t.tgt_v AS mapped
      FROM src_ranked s JOIN tgt_cuts t USING (qb))
    SELECT CAST(count(*) AS BIGINT) AS n_mapped,
           round(avg(orig), 4) AS mean_before,
           round(avg(mapped), 4) AS mean_after,
           round(stddev_samp(orig), 4) AS sd_before,
           round(stddev_samp(mapped), 4) AS sd_after
    FROM mapped
    """,
    tags=("timeseries", "harmonization", "quantile"),
)
def q_quantile_mapping_harmonization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile mapping (CDF matching): re-express one
    distribution's values on another's scale by matching vigintile
    bins — the bias-correction transform behind cross-sensor NDVI
    harmonization (Landsat-7 ETM+ vs 8 OLI radiometry) and climate
    downscaling, run here between two event streams. After mapping,
    the moments take the TARGET's shape (pinned in the output). Two
    global ntiles over the value columns, a 20-row cut table joined
    back — at 100 TB the cuts come from approx_percentile and the
    map is a broadcast lookup."""
    e = _t(spark, sf_dir, "events")
    src = e.filter(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    ).select(F.col("value").alias("v"))
    tgt = e.filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull()
    ).select(F.col("value").alias("v"))
    src_ranked = src.select(
        "v", F.ntile(20).over(Window.orderBy("v")).alias("qb")
    )
    tgt_cuts = (
        tgt.select("v", F.ntile(20).over(Window.orderBy("v")).alias("qb"))
        .groupBy("qb")
        .agg(F.avg("v").alias("tgt_v"))
    )
    mapped = src_ranked.join(F.broadcast(tgt_cuts), "qb").select(
        F.col("v").alias("orig"), F.col("tgt_v").alias("mapped")
    )
    return mapped.agg(
        F.count("*").cast("bigint").alias("n_mapped"),
        F.round(F.avg("orig"), 4).alias("mean_before"),
        F.round(F.avg("mapped"), 4).alias("mean_after"),
        F.round(F.stddev_samp("orig"), 4).alias("sd_before"),
        F.round(F.stddev_samp("mapped"), 4).alias("sd_after"),
    )


@register(
    "lsh_blocking_eval",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id < 80),
    sh AS (
      SELECT DISTINCT doc_id,
             ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS g
      FROM docs, unnest(generate_series(1, len(ws) - 2)) AS t(i)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    truth AS (
      SELECT i.da, i.db
      FROM inter i
      JOIN sizes x ON x.doc_id = i.da
      JOIN sizes y ON y.doc_id = i.db
      WHERE CAST(i.shared AS DOUBLE) / (x.n + y.n - i.shared) >= 0.3),
    mh AS (
      SELECT doc_id, i, min(substr(md5(g), 1 + 4 * i, 4)) AS mn
      FROM sh, (SELECT unnest(generate_series(0, 3)) AS i)
      GROUP BY doc_id, i),
    bands AS (
      SELECT doc_id, i // 2 AS b, string_agg(mn, '' ORDER BY i) AS key
      FROM mh GROUP BY doc_id, i // 2),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
    hits AS (SELECT * FROM truth INTERSECT SELECT * FROM cand)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs,
           (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hits,
           round((SELECT CAST(count(*) AS DOUBLE) FROM hits)
                 / greatest((SELECT count(*) FROM truth), 1), 4) AS recall,
           round((SELECT CAST(count(*) AS DOUBLE) FROM hits)
                 / greatest((SELECT count(*) FROM cand), 1), 4) AS precision
    """,
    tags=("dedup", "eval"),
)
def q_lsh_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-strategy evaluation: the LSH candidate set (4
    min-hashes, 2 bands × 2 — deliberately small so misses exist)
    scored against exact-Jaccard ≥ 0.3 ground truth on a doc sample
    — recall tells you what the blocker loses, precision what the
    verify stage pays; the measurement that justifies (or rejects) a
    band/row configuration BEFORE burning a cluster pass at 100 TB.
    Both pipelines share one shingle relation; candidates and truth
    are both shared-key joins, and the md5-slice hash family keeps
    the two engines bit-identical."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    sh = (
        d.select(
            "doc_id",
            F.split("text", " ").alias("ws"),
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("ws") - 2)).alias("i"),
            "ws",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("ws", F.col("i")),
                F.element_at("ws", F.col("i") + 1),
                F.element_at("ws", F.col("i") + 2),
            ).alias("g"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("shared"))
    )
    na = sizes.select(F.col("doc_id").alias("da"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("db"), F.col("n").alias("nb"))
    truth = (
        inter.join(F.broadcast(na), "da")
        .join(F.broadcast(nb), "db")
        .filter(
            F.col("shared").cast("double")
            / (F.col("na") + F.col("nb") - F.col("shared"))
            >= 0.3
        )
        .select("da", "db")
    )
    mh = (
        sh.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
            "g",
        )
        .groupBy("doc_id", "i")
        .agg(F.min(F.expr("substr(md5(g), 1 + 4 * i, 4)")).alias("mn"))
    )
    bands = mh.groupBy(
        "doc_id", (F.col("i") / 2).cast("int").alias("b")
    ).agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("i", "mn")))["mn"]).alias("key"))
    # array_sort on struct(i, mn) orders by i; extract mn field post-sort
    ba = bands.alias("ba")
    bb = bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.b") == F.col("bb.b"))
            & (F.col("ba.key") == F.col("bb.key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("da"), F.col("bb.doc_id").alias("db")
        )
        .distinct()
    )
    hits = truth.intersect(cand)
    nt = truth.count()
    nc = cand.count()
    nh = hits.count()
    return spark.createDataFrame(
        [
            (
                nt,
                nc,
                nh,
                round(nh / max(nt, 1), 4),
                round(nh / max(nc, 1), 4),
            )
        ],
        "n_true_pairs LONG, n_candidates LONG, n_hits LONG, recall DOUBLE, precision DOUBLE",
    )


@register(
    "session_gap_sensitivity",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))) / 60000000.0
               AS gap_min
      FROM events),
    per_user AS (
      SELECT user_id,
             1 + sum(CASE WHEN gap_min > 10 THEN 1 ELSE 0 END) AS s10,
             1 + sum(CASE WHEN gap_min > 30 THEN 1 ELSE 0 END) AS s30,
             1 + sum(CASE WHEN gap_min > 60 THEN 1 ELSE 0 END) AS s60
      FROM gaps GROUP BY user_id)
    SELECT CAST(sum(s10) AS BIGINT) AS sessions_10min,
           CAST(sum(s30) AS BIGINT) AS sessions_30min,
           CAST(sum(s60) AS BIGINT) AS sessions_60min,
           round(avg(s30), 3) AS mean_sessions_per_user_30min
    FROM per_user
    """,
    tags=("session", "window", "sensitivity"),
)
def q_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization sensitivity curve: total session counts under
    10/30/60-minute inactivity thresholds from ONE lag pass —
    sessions(g) per user = 1 + |gaps > g|, so the whole parameter
    sweep is three conditional sums, no re-sessionizing per
    candidate (how the 30-minute convention should be validated
    against your own data before events_sessionize hard-codes it).
    A plateau between thresholds = natural session boundary; steep
    slope = the threshold is inventing structure."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            / 60_000_000.0
        ).alias("gap_min"),
    )

    def s(th: int):
        return 1 + F.sum(F.when(F.col("gap_min") > th, 1).otherwise(0))

    per_user = gaps.groupBy("user_id").agg(
        s(10).alias("s10"), s(30).alias("s30"), s(60).alias("s60")
    )
    return per_user.agg(
        F.sum("s10").cast("bigint").alias("sessions_10min"),
        F.sum("s30").cast("bigint").alias("sessions_30min"),
        F.sum("s60").cast("bigint").alias("sessions_60min"),
        F.round(F.avg("s30"), 3).alias("mean_sessions_per_user_30min"),
    )


@register(
    "two_hop_reach",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_partkey % 10 = 0),
    hop2 AS (
      SELECT DISTINCT a.c AS src, b.c AS dst
      FROM edges a JOIN edges b ON a.p = b.p AND a.c <> b.c),
    reach AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS n_reach
      FROM hop2 GROUP BY src)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(n_reach), 2) AS mean_two_hop_reach,
           CAST(max(n_reach) AS BIGINT) AS max_reach,
           round(quantile_cont(n_reach, 0.5), 1) AS median_reach
    FROM reach
    """,
    tags=("graph", "join"),
)
def q_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach on the co-purchase graph — customers reachable
    through a shared part (friends-of-friends without recursion: one
    self-join on the pivot entity + dedup). The part-key sample
    bounds the pivot fan-out, which is THE scaling hazard of 2-hop
    queries — a hub part of degree d contributes d² pairs, exactly
    the skew the degree profile (bipartite_degree_profile) warns
    about and a real deployment caps per-pivot (limit each part's
    neighbor list) before the join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.col("l_partkey") % 10 == 0)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = edges.alias("a")
    b = edges.alias("b")
    hop2 = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.c") != F.col("b.c")))
        .select(F.col("a.c").alias("src"), F.col("b.c").alias("dst"))
        .distinct()
    )
    reach = hop2.groupBy("src").agg(F.count("*").cast("double").alias("n_reach"))
    return reach.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.avg("n_reach"), 2).alias("mean_two_hop_reach"),
        F.max("n_reach").cast("bigint").alias("max_reach"),
        F.round(F.expr("percentile(n_reach, 0.5)"), 1).alias("median_reach"),
    )


@register(
    "coupon_collector_coverage",
    oracle="""
    WITH seq AS (
      SELECT l_partkey,
             row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber)
               AS pos
      FROM lineitem),
    firsts AS (SELECT min(pos) AS fp FROM seq GROUP BY l_partkey),
    universe AS (SELECT CAST(count(*) AS DOUBLE) AS n_parts FROM firsts),
    curve AS (
      SELECT CAST(pow(4, k) AS BIGINT) AS n_draws,
             (SELECT CAST(count(*) AS BIGINT) FROM firsts
              WHERE fp <= CAST(pow(4, k) AS BIGINT)) AS observed
      FROM unnest(generate_series(3, 8)) AS t(k))
    SELECT n_draws, observed,
           round(u.n_parts * (1 - pow(1 - 1 / u.n_parts, n_draws)), 2)
             AS expected_uniform,
           round(observed / u.n_parts, 4) AS coverage
    FROM curve CROSS JOIN universe u
    """,
    tags=("stats", "coverage"),
)
def q_coupon_collector_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coupon-collector coverage: distinct parts seen after the
    first N draws of the ship-date-ordered stream vs the uniform
    expectation n·(1−(1−1/n)^N) — observed persistently BELOW the
    curve quantifies demand concentration (popular parts recur
    before the tail appears), the catalog-coverage audit for
    sampling-based profiling. First-occurrence positions come from
    one global window pass (the heaps_law_fit device on purchase
    streams); the curve is 6 scalar threshold lookups."""
    li = _t(spark, sf_dir, "lineitem")
    seq = li.select(
        "l_partkey",
        F.row_number()
        .over(Window.orderBy("l_shipdate", "l_orderkey", "l_linenumber"))
        .alias("pos"),
    )
    firsts = seq.groupBy("l_partkey").agg(F.min("pos").alias("fp"))
    universe = firsts.agg(F.count("*").cast("double").alias("n_parts"))
    ks = spark.range(3, 9).select(
        F.pow(F.lit(4.0), F.col("id")).cast("bigint").alias("n_draws")
    )
    curve = (
        ks.join(F.broadcast(firsts), F.col("fp") <= F.col("n_draws"))
        .groupBy("n_draws")
        .agg(F.count("*").cast("bigint").alias("observed"))
    )
    expected = F.col("n_parts") * (
        1 - F.pow(1 - 1 / F.col("n_parts"), F.col("n_draws"))
    )
    return (
        curve.join(F.broadcast(universe))
        .select(
            "n_draws",
            "observed",
            F.round(expected, 2).alias("expected_uniform"),
            F.round(F.col("observed") / F.col("n_parts"), 4).alias("coverage"),
        )
    )


@register(
    "morans_i_spatial",
    oracle="""
    WITH cells AS (
      SELECT CAST(floor(((c_custkey * 37 % 3600) / 10.0) / 30.0) AS BIGINT)
               AS gx,
             CAST(floor(((c_custkey * 53 % 1600) / 10.0) / 20.0) AS BIGINT)
               AS gy,
             avg(c_acctbal) AS z
      FROM customer GROUP BY 1, 2),
    mean_z AS (SELECT avg(z) AS zbar, CAST(count(*) AS DOUBLE) AS n
               FROM cells),
    pairs AS (
      SELECT (a.z - m.zbar) * (b.z - m.zbar) AS cross_dev
      FROM cells a JOIN cells b
        ON abs(a.gx - b.gx) + abs(a.gy - b.gy) = 1
      CROSS JOIN mean_z m),
    ss AS (
      SELECT sum((z - m.zbar) * (z - m.zbar)) AS denom
      FROM cells CROSS JOIN mean_z m),
    w AS (SELECT CAST(count(*) AS DOUBLE) AS big_w FROM pairs)
    SELECT round((m.n / w.big_w) * (SELECT sum(cross_dev) FROM pairs)
                 / ss.denom, 6) AS morans_i,
           CAST(m.n AS BIGINT) AS n_cells,
           CAST(w.big_w AS BIGINT) AS n_neighbor_pairs
    FROM mean_z m CROSS JOIN ss CROSS JOIN w
    """,
    tags=("geo", "stats", "spatial-autocorrelation"),
)
def q_morans_i_spatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I spatial autocorrelation over a grid of cell means
    with rook (edge-sharing) adjacency — THE first geostatistic run
    on any raster product (clustered NDVI → I > 0; the hash-derived
    field here is spatially random, so I ≈ 0 is the pinned read).
    Neighbor pairs come from an adjacency equi-ish join on grid
    coordinates (|Δgx|+|Δgy| = 1 — on a tile lake this is the same
    8/4-neighbor join the focal operators use), cross-deviations
    against a broadcast mean, one scalar assembly at the end."""
    c = _t(spark, sf_dir, "customer")
    gx = F.floor(((F.col("c_custkey") * 37 % 3600) / 10.0) / 30.0).cast("bigint")
    gy = F.floor(((F.col("c_custkey") * 53 % 1600) / 10.0) / 20.0).cast("bigint")
    cells = c.groupBy(gx.alias("gx"), gy.alias("gy")).agg(
        F.avg("c_acctbal").alias("z")
    )
    mean_z = cells.agg(
        F.avg("z").alias("zbar"), F.count("*").cast("double").alias("n")
    )
    a = cells.alias("a")
    b = cells.alias("b")
    pairs = (
        a.join(
            b,
            F.abs(F.col("a.gx") - F.col("b.gx"))
            + F.abs(F.col("a.gy") - F.col("b.gy"))
            == 1,
        )
        .join(F.broadcast(mean_z))
        .select(
            ((F.col("a.z") - F.col("zbar")) * (F.col("b.z") - F.col("zbar"))).alias(
                "cross_dev"
            )
        )
    )
    num = pairs.agg(
        F.sum("cross_dev").alias("s_cross"),
        F.count("*").cast("double").alias("big_w"),
    )
    ss = (
        cells.join(F.broadcast(mean_z))
        .agg(
            F.sum((F.col("z") - F.col("zbar")) * (F.col("z") - F.col("zbar"))).alias(
                "denom"
            )
        )
    )
    return (
        mean_z.join(F.broadcast(num))
        .join(F.broadcast(ss))
        .select(
            F.round(
                (F.col("n") / F.col("big_w")) * F.col("s_cross") / F.col("denom"), 6
            ).alias("morans_i"),
            F.col("n").cast("bigint").alias("n_cells"),
            F.col("big_w").cast("bigint").alias("n_neighbor_pairs"),
        )
    )


@register(
    "variogram_lags",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey AS id,
             (s_suppkey * 37 % 3600) / 10.0 AS x,
             (s_suppkey * 53 % 1600) / 10.0 AS y,
             s_acctbal AS z
      FROM supplier WHERE s_suppkey <= 400),
    pairs AS (
      SELECT CAST(floor(sqrt((a.x - b.x) * (a.x - b.x)
                             + (a.y - b.y) * (a.y - b.y)) / 20.0) AS BIGINT)
               AS lag_band,
             (a.z - b.z) * (a.z - b.z) AS sq_diff
      FROM pts a JOIN pts b ON a.id < b.id)
    SELECT lag_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(sq_diff) / 2.0, 2) AS semivariance
    FROM pairs WHERE lag_band <= 8
    GROUP BY lag_band
    """,
    tags=("geo", "stats", "variogram"),
)
def q_variogram_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram: γ(h) = mean squared value difference
    / 2 for point pairs binned by separation distance — the
    geostatistical structure function behind kriging and the range/
    sill/nugget diagnostics on any NDVI field (a flat variogram here
    = the hash field has no spatial structure; real vegetation shows
    γ rising to a sill at the correlation range). The all-pairs join
    is bounded by the point sample; the production path buckets
    pairs through the grid join (grid_bucketed_spatial_join) so only
    near pairs — the informative ones — are ever formed."""
    s = _t(spark, sf_dir, "supplier")
    pts = s.filter(F.col("s_suppkey") <= 400).select(
        F.col("s_suppkey").alias("id"),
        ((F.col("s_suppkey") * 37 % 3600) / 10.0).alias("x"),
        ((F.col("s_suppkey") * 53 % 1600) / 10.0).alias("y"),
        F.col("s_acctbal").alias("z"),
    )
    a = pts.alias("a")
    b = pts.alias("b")
    dist = F.sqrt(
        (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
        + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
    )
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.floor(dist / 20.0).cast("bigint").alias("lag_band"),
        ((F.col("a.z") - F.col("b.z")) * (F.col("a.z") - F.col("b.z"))).alias(
            "sq_diff"
        ),
    )
    return (
        pairs.filter(F.col("lag_band") <= 8)
        .groupBy("lag_band")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(F.avg("sq_diff") / 2.0, 2).alias("semivariance"),
        )
    )


@register(
    "ripley_k_clustering",
    oracle="""
    WITH pts AS (
      SELECT s_suppkey AS id,
             (s_suppkey * 37 % 3600) / 10.0 AS x,
             (s_suppkey * 53 % 1600) / 10.0 AS y
      FROM supplier WHERE s_suppkey <= 400),
    meta AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                    360.0 * 160.0 AS area FROM pts),
    pairs AS (
      SELECT sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
               AS d
      FROM pts a JOIN pts b ON a.id <> b.id),
    radii AS (SELECT unnest(generate_series(1, 5)) * 10.0 AS r)
    SELECT r,
           round((SELECT m.area / (m.n * (m.n - 1)) FROM meta m)
                 * (SELECT count(*) FROM pairs WHERE d <= radii.r), 2)
             AS k_observed,
           round(pi() * r * r, 2) AS k_csr,
           round(sqrt(((SELECT m.area / (m.n * (m.n - 1)) FROM meta m)
                       * (SELECT count(*) FROM pairs WHERE d <= radii.r))
                      / pi()) - r, 3) AS l_minus_r
    FROM radii
    """,
    tags=("geo", "stats", "point-pattern"),
)
def q_ripley_k_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K point-pattern statistic: observed pair density
    within radius r against the complete-spatial-randomness
    expectation πr², with the variance-stabilized L(r)−r transform
    (≈0 random, >0 clustered, <0 dispersed — how plot/station
    layouts and crime/disease point sets are screened). The pair
    relation is reused across all radii via threshold aggregation —
    one all-pairs join on the bounded sample, not one per radius;
    production uses the grid-bucket join for near pairs and edge
    corrections."""
    s = _t(spark, sf_dir, "supplier")
    pts = s.filter(F.col("s_suppkey") <= 400).select(
        F.col("s_suppkey").alias("id"),
        ((F.col("s_suppkey") * 37 % 3600) / 10.0).alias("x"),
        ((F.col("s_suppkey") * 53 % 1600) / 10.0).alias("y"),
    )
    meta = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.lit(360.0 * 160.0).alias("area"),
    )
    a = pts.alias("a")
    b = pts.alias("b")
    pairs = a.join(b, F.col("a.id") != F.col("b.id")).select(
        F.sqrt(
            (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x"))
            + (F.col("a.y") - F.col("b.y")) * (F.col("a.y") - F.col("b.y"))
        ).alias("d")
    )
    radii = spark.range(1, 6).select((F.col("id") * 10.0).alias("r"))
    counts = (
        radii.join(pairs, F.col("d") <= F.col("r"))
        .groupBy("r")
        .agg(F.count("*").cast("double").alias("n_within"))
    )
    k_obs = (F.col("area") / (F.col("n") * (F.col("n") - 1))) * F.col("n_within")
    return (
        counts.join(F.broadcast(meta))
        .select(
            "r",
            F.round(k_obs, 2).alias("k_observed"),
            F.round(F.lit(math.pi) * F.col("r") * F.col("r"), 2).alias("k_csr"),
            F.round(F.sqrt(k_obs / math.pi) - F.col("r"), 3).alias("l_minus_r"),
        )
    )


@register(
    "price_index_fisher",
    oracle="""
    WITH base AS (
      SELECT l_partkey,
             avg(l_extendedprice / l_quantity) AS p0,
             sum(l_quantity) AS q0
      FROM lineitem
      WHERE CAST(strftime(CAST(l_shipdate AS DATE), '%Y') AS INT) = 1996
        AND l_quantity > 0
      GROUP BY l_partkey),
    curr AS (
      SELECT l_partkey,
             avg(l_extendedprice / l_quantity) AS p1,
             sum(l_quantity) AS q1
      FROM lineitem
      WHERE CAST(strftime(CAST(l_shipdate AS DATE), '%Y') AS INT) = 1997
        AND l_quantity > 0
      GROUP BY l_partkey),
    joined AS (
      SELECT p0, q0, p1, q1 FROM base JOIN curr USING (l_partkey))
    SELECT round(sum(p1 * q0) / sum(p0 * q0), 6) AS laspeyres,
           round(sum(p1 * q1) / sum(p0 * q1), 6) AS paasche,
           round(sqrt((sum(p1 * q0) / sum(p0 * q0))
                      * (sum(p1 * q1) / sum(p0 * q1))), 6) AS fisher,
           CAST(count(*) AS BIGINT) AS n_matched_parts
    FROM joined
    """,
    tags=("economics", "index", "join"),
)
def q_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price index numbers between two years on the matched part
    basket: Laspeyres (base-period quantities), Paasche (current),
    and their geometric mean — the Fisher ideal index, which is how
    CPI-style aggregate price change is actually computed (L
    overstates, P understates substitution; F splits the bias). Two
    filtered per-part aggregates, an inner join on the matched
    basket, four weighted sums in one pass."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    yr = F.year(F.col("l_shipdate").cast("date"))

    def year_px(y: int, p: str, q: str) -> DataFrame:
        return (
            li.filter(yr == y)
            .groupBy("l_partkey")
            .agg(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")).alias(p),
                F.sum("l_quantity").alias(q),
            )
        )

    joined = year_px(1996, "p0", "q0").join(year_px(1997, "p1", "q1"), "l_partkey")
    lasp = F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
    paas = F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
    return joined.agg(
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
        F.count("*").cast("bigint").alias("n_matched_parts"),
    )


@register(
    "temperature_mixture_weights",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n
      FROM documents GROUP BY source),
    powered AS (
      SELECT source, n,
             pow(n, 1.0 / 1.0) AS p1,
             pow(n, 1.0 / 2.0) AS p2,
             pow(n, 1.0 / 5.0) AS p5
      FROM counts)
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           round(p1 / sum(p1) OVER (), 6) AS w_tau1,
           round(p2 / sum(p2) OVER (), 6) AS w_tau2,
           round(p5 / sum(p5) OVER (), 6) AS w_tau5
    FROM powered
    """,
    tags=("training", "mixture", "sampling"),
)
def q_temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights w_s ∝ n_s^{1/τ} — the
    corpus-sampling rule from multilingual LM training (mC4/mT5:
    τ=1 reproduces natural proportions, τ→∞ uniform; τ≈2-5 is where
    low-resource sources get boosted without drowning the head).
    The three columns show the re-balancing explicitly. A
    |sources|-row aggregate and window normalizations — the weight
    table then drives mixture_sampling's keep decisions."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").cast("double").alias("n"))
    wall = Window.partitionBy()
    powered = counts.select(
        "source",
        "n",
        F.pow("n", 1.0).alias("p1"),
        F.pow("n", 0.5).alias("p2"),
        F.pow("n", 0.2).alias("p5"),
    )
    return powered.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("p1") / F.sum("p1").over(wall), 6).alias("w_tau1"),
        F.round(F.col("p2") / F.sum("p2").over(wall), 6).alias("w_tau2"),
        F.round(F.col("p5") / F.sum("p5").over(wall), 6).alias("w_tau5"),
    )


@register(
    "nth_value_milestones",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey,
             nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_order_value,
             nth_value(o_totalprice, 5) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS fifth_order_value,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(second_order_value) AS BIGINT) AS has_second,
           CAST(count(fifth_order_value) AS BIGINT) AS has_fifth,
           round(avg(second_order_value), 2) AS mean_second_value,
           round(avg(fifth_order_value), 2) AS mean_fifth_value
    FROM ranked WHERE rn = 1
    """,
    tags=("window", "milestones"),
)
def q_nth_value_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Milestone-order values via NTH_VALUE over the full-partition
    frame (the default running frame would return NULL until row n —
    the classic nth_value trap, avoided by the explicit UNBOUNDED
    FOLLOWING): each customer's 2nd and 5th order value, read off
    the first row per customer — the 'what does their second
    purchase look like' merchandising question, without a self-join
    on row_number. One window pass; the rn=1 filter keeps one row
    per customer."""
    o = _t(spark, sf_dir, "orders")
    wfull = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wrn = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_order_value"),
        F.nth_value("o_totalprice", 5).over(wfull).alias("fifth_order_value"),
        F.row_number().over(wrn).alias("rn"),
    ).filter(F.col("rn") == 1)
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.count("second_order_value").cast("bigint").alias("has_second"),
        F.count("fifth_order_value").cast("bigint").alias("has_fifth"),
        F.round(F.avg("second_order_value"), 2).alias("mean_second_value"),
        F.round(F.avg("fifth_order_value"), 2).alias("mean_fifth_value"),
    )


@register(
    "weighted_correlation",
    oracle="""
    WITH base AS (
      SELECT l_quantity AS w, l_extendedprice AS x, l_discount AS y
      FROM lineitem),
    m AS (
      SELECT sum(w) AS sw,
             sum(w * x) / sum(w) AS mx,
             sum(w * y) / sum(w) AS my
      FROM base)
    SELECT round(
             (sum(w * (x - mx) * (y - my)) / m.sw)
             / (sqrt(sum(w * (x - mx) * (x - mx)) / m.sw)
                * sqrt(sum(w * (y - my) * (y - my)) / m.sw)), 6)
             AS weighted_corr,
           round(corr(x, y), 6) AS unweighted_corr,
           CAST(count(*) AS BIGINT) AS n
    FROM base CROSS JOIN m
    GROUP BY m.sw
    """,
    tags=("stats", "weighted"),
)
def q_weighted_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted Pearson correlation — each lineitem votes
    with its volume, so the association reflects units moved rather
    than rows logged (the difference matters whenever row counts and
    economic weight diverge: one 50-unit line ≠ fifty 1-unit lines).
    Weighted means in one pass, weighted central moments in a second
    against the broadcast means; the unweighted corr sits alongside
    to expose the gap."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").alias("w"),
        F.col("l_extendedprice").alias("x"),
        F.col("l_discount").alias("y"),
    )
    m = base.agg(
        F.sum("w").alias("sw"),
        (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("mx"),
        (F.sum(F.col("w") * F.col("y")) / F.sum("w")).alias("my"),
    )
    j = base.join(F.broadcast(m))
    dx = F.col("x") - F.col("mx")
    dy = F.col("y") - F.col("my")
    wcov = F.sum(F.col("w") * dx * dy) / F.first("sw")
    wvx = F.sum(F.col("w") * dx * dx) / F.first("sw")
    wvy = F.sum(F.col("w") * dy * dy) / F.first("sw")
    return j.groupBy("sw").agg(
        F.round(wcov / (F.sqrt(wvx) * F.sqrt(wvy)), 6).alias("weighted_corr"),
        F.round(F.corr("x", "y"), 6).alias("unweighted_corr"),
        F.count("*").cast("bigint").alias("n"),
    ).drop("sw")


@register(
    "power_mde_table",
    oracle="""
    WITH arms AS (
      SELECT event_type,
             stddev_samp(value) AS sigma,
             CAST(count(*) AS DOUBLE) AS n,
             avg(value) AS mu
      FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_per_arm,
           round((1.959964 + 0.841621) * sigma * sqrt(2.0 / n), 5)
             AS mde_absolute,
           round((1.959964 + 0.841621) * sigma * sqrt(2.0 / n) / mu, 4)
             AS mde_relative
    FROM arms
    """,
    tags=("stats", "experimentation", "power"),
)
def q_power_mde_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at α=0.05 / 80% power:
    MDE = (z_{α/2}+z_β)·σ·√(2/n) per metric — the pre-experiment
    sizing table (an experiment whose expected lift is below its MDE
    is decided before it runs; the design-time complement to
    welch_ttest's read-out and cuped's variance reduction, whose
    effect here is a smaller σ). One grouped-moments pass; the z
    constants are literals, folded at plan time."""
    e = _t(spark, sf_dir, "events")
    arms = (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.stddev_samp("value").alias("sigma"),
            F.count("*").cast("double").alias("n"),
            F.avg("value").alias("mu"),
        )
    )
    mde = (1.959964 + 0.841621) * F.col("sigma") * F.sqrt(2.0 / F.col("n"))
    return arms.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_per_arm"),
        F.round(mde, 5).alias("mde_absolute"),
        F.round(mde / F.col("mu"), 4).alias("mde_relative"),
    )


@register(
    "ratio_metric_delta_method",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS x,
             CAST(count(*) AS DOUBLE) AS y
      FROM events GROUP BY user_id),
    m AS (
      SELECT avg(x) AS mx, avg(y) AS my,
             var_samp(x) AS vx, var_samp(y) AS vy,
             covar_samp(x, y) AS cxy,
             CAST(count(*) AS DOUBLE) AS n
      FROM per_user)
    SELECT round(mx / my, 6) AS ratio_purchases_per_event,
           round(sqrt((vx / (my * my)
                       - 2 * mx * cxy / (my * my * my)
                       + mx * mx * vy / (my * my * my * my)) / n), 6)
             AS se_delta_method,
           round(sqrt(vx / n) / my, 6) AS se_naive,
           CAST(n AS BIGINT) AS n_users
    FROM m
    """,
    tags=("stats", "experimentation", "ratio"),
)
def q_ratio_metric_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error for a ratio-of-means metric
    (purchases per event, user-clustered): Var(x̄/ȳ) ≈ (Vx/ȳ² −
    2x̄·Cxy/ȳ³ + x̄²·Vy/ȳ⁴)/n — the correction every experiment
    platform applies because users, not events, are the independent
    unit; the naive SE (which ignores denominator variance and the
    covariance) sits alongside to show the bias. One per-user
    aggregate, one moments row, scalar algebra."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("double")
        .alias("x"),
        F.count("*").cast("double").alias("y"),
    )
    m = per_user.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
        F.count("*").cast("double").alias("n"),
    )
    my2 = F.col("my") * F.col("my")
    var_delta = (
        F.col("vx") / my2
        - 2 * F.col("mx") * F.col("cxy") / (my2 * F.col("my"))
        + F.col("mx") * F.col("mx") * F.col("vy") / (my2 * my2)
    ) / F.col("n")
    return m.select(
        F.round(F.col("mx") / F.col("my"), 6).alias("ratio_purchases_per_event"),
        F.round(F.sqrt(var_delta), 6).alias("se_delta_method"),
        F.round(F.sqrt(F.col("vx") / F.col("n")) / F.col("my"), 6).alias("se_naive"),
        F.col("n").cast("bigint").alias("n_users"),
    )


@register(
    "jackknife_nation_se",
    oracle="""
    WITH groups AS (
      SELECT c_nationkey AS g,
             sum(o_totalprice) AS s_g,
             CAST(count(*) AS DOUBLE) AS n_g
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey),
    tot AS (
      SELECT sum(s_g) AS s, sum(n_g) AS n,
             CAST(count(*) AS DOUBLE) AS k
      FROM groups),
    loo AS (
      SELECT (t.s - g.s_g) / (t.n - g.n_g) AS theta_i, t.k,
             t.s / t.n AS theta
      FROM groups g CROSS JOIN tot t),
    jk AS (
      SELECT k, theta, var_pop(theta_i) AS vp
      FROM loo GROUP BY k, theta)
    SELECT round(theta, 4) AS mean_order_value,
           round(sqrt((k - 1) / k * k * vp), 4) AS jackknife_se,
           CAST(k AS BIGINT) AS n_groups
    FROM jk
    """,
    tags=("stats", "resampling"),
)
def q_jackknife_nation_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-group jackknife SE of the mean order value with
    nations as the resampling unit: each leave-one-out estimate is
    pure ALGEBRA on the group sums ((S−s_g)/(N−n_g)) — resampling
    inference with no random numbers and no data replication, which
    is why the jackknife (not the bootstrap) is what cluster-robust
    pipelines deploy at scale. Group sums in one pass, k tiny
    replicate rows, the (k−1)/k-scaled spread at the end."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    groups = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_nationkey").alias("g"))
        .agg(
            F.sum("o_totalprice").alias("s_g"),
            F.count("*").cast("double").alias("n_g"),
        )
    )
    tot = groups.agg(
        F.sum("s_g").alias("s"),
        F.sum("n_g").alias("n"),
        F.count("*").cast("double").alias("k"),
    )
    loo = groups.join(F.broadcast(tot)).select(
        ((F.col("s") - F.col("s_g")) / (F.col("n") - F.col("n_g"))).alias(
            "theta_i"
        ),
        "k",
        (F.col("s") / F.col("n")).alias("theta"),
    )
    jk = loo.groupBy("k", "theta").agg(
        F.avg("theta_i").alias("theta_bar"),
        F.var_pop("theta_i").alias("vp"),
        F.count("*").alias("kk"),
    )
    # Σ(θi − θ̄)² = k·var_pop
    return jk.select(
        F.round("theta", 4).alias("mean_order_value"),
        F.round(
            F.sqrt((F.col("k") - 1) / F.col("k") * F.col("k") * F.col("vp")), 4
        ).alias("jackknife_se"),
        F.col("k").cast("bigint").alias("n_groups"),
    )


@register(
    "hash_uniformity_ks",
    oracle="""
    WITH u AS (
      SELECT (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
              + 1) / 4294967296.0 AS v
      FROM orders),
    ranked AS (
      SELECT v,
             CAST(row_number() OVER (ORDER BY v) AS DOUBLE) AS r,
             CAST(count(*) OVER () AS DOUBLE) AS n
      FROM u)
    SELECT round(max(greatest(r / n - v, v - (r - 1) / n)), 6) AS ks_d,
           round(max(greatest(r / n - v, v - (r - 1) / n))
                 * sqrt(max(n)), 4) AS ks_scaled,
           CAST(max(n) AS BIGINT) AS n
    FROM ranked
    """,
    tags=("stats", "audit", "hash"),
)
def q_hash_uniformity_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sample Kolmogorov–Smirnov test of the md5-derived
    uniforms against U(0,1) — the audit underneath EVERY
    deterministic-sampling device in this engine (hash splits,
    Efraimidis–Spirakis keys, DP noise, pseudo-treatments): if these
    aren't uniform, all of them are biased. D = max(ECDF−u, u−ECDF⁻)
    from one sorted pass; √n·D ≈ 0.5–1.1 is the in-spec band (the
    Kolmogorov distribution's bulk), and a bad hash (e.g. taking
    DECIMAL digits of the key) fails it by orders of magnitude."""
    o = _t(spark, sf_dir, "orders")
    u = o.select(
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("double")
                + 1
            )
            / 4294967296.0
        ).alias("v")
    )
    w = Window.orderBy("v")
    wall = Window.partitionBy()
    ranked = u.select(
        "v",
        F.row_number().over(w).cast("double").alias("r"),
        F.count("*").over(wall).cast("double").alias("n"),
    )
    d = F.greatest(
        F.col("r") / F.col("n") - F.col("v"),
        F.col("v") - (F.col("r") - 1) / F.col("n"),
    )
    return ranked.agg(
        F.round(F.max(d), 6).alias("ks_d"),
        F.round(F.max(d) * F.sqrt(F.max("n")), 4).alias("ks_scaled"),
        F.max("n").cast("bigint").alias("n"),
    )


@register(
    "mantel_haenszel_pooled",
    oracle="""
    WITH cells AS (
      SELECT p_brand,
             CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount > 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS a,
             CAST(sum(CASE WHEN l_returnflag = 'R' AND l_discount <= 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS b,
             CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount > 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS c,
             CAST(sum(CASE WHEN l_returnflag <> 'R' AND l_discount <= 0.05
                           THEN 1 ELSE 0 END) AS DOUBLE) AS d
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand),
    agg AS (
      SELECT sum(a) AS sa, sum(b) AS sb, sum(c) AS sc, sum(d) AS sd,
             sum(a * d / (a + b + c + d)) AS mh_num,
             sum(b * c / (a + b + c + d)) AS mh_den,
             CAST(count(*) AS BIGINT) AS n_strata
      FROM cells)
    SELECT round((sa * sd) / (sb * sc), 4) AS crude_or,
           round(mh_num / mh_den, 4) AS mantel_haenszel_or,
           n_strata
    FROM agg
    """,
    tags=("stats", "epidemiology", "stratified"),
)
def q_mantel_haenszel_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel–Haenszel pooled odds ratio across brand strata next to
    the crude (collapsed-table) OR — the stratified estimator that
    survives Simpson's paradox: when strata differ in both exposure
    mix and baseline risk, the crude OR can even flip sign while MH
    stays faithful (per-stratum ORs live in odds_ratio_returns). The
    per-stratum 2×2 cells come from one conditional-agg pass; the MH
    weights (b·c/n, a·d/n) reduce to two more sums."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    ret = F.col("l_returnflag") == "R"
    deep = F.col("l_discount") > 0.05
    cell = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("double")  # noqa: E731
    cells = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            cell(ret & deep).alias("a"),
            cell(ret & ~deep).alias("b"),
            cell(~ret & deep).alias("c"),
            cell(~ret & ~deep).alias("d"),
        )
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    agg = cells.agg(
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum("c").alias("sc"),
        F.sum("d").alias("sd"),
        F.sum(F.col("a") * F.col("d") / n).alias("mh_num"),
        F.sum(F.col("b") * F.col("c") / n).alias("mh_den"),
        F.count("*").cast("bigint").alias("n_strata"),
    )
    return agg.select(
        F.round((F.col("sa") * F.col("sd")) / (F.col("sb") * F.col("sc")), 4).alias(
            "crude_or"
        ),
        F.round(F.col("mh_num") / F.col("mh_den"), 4).alias("mantel_haenszel_or"),
        "n_strata",
    )


@register(
    "geometric_median_weiszfeld",
    oracle="""
    WITH pts AS (
      SELECT (s_suppkey * 37 % 3600) / 10.0 AS x,
             (s_suppkey * 53 % 1600) / 10.0 AS y
      FROM supplier WHERE s_suppkey <= 200),
    c0 AS (SELECT avg(x) AS cx, avg(y) AS cy FROM pts),
    it1 AS (
      SELECT sum(x / d) / sum(1 / d) AS cx, sum(y / d) / sum(1 / d) AS cy
      FROM (SELECT x, y,
                   sqrt((x - c0.cx) * (x - c0.cx)
                        + (y - c0.cy) * (y - c0.cy)) + 1e-9 AS d
            FROM pts CROSS JOIN c0)),
    it2 AS (
      SELECT sum(x / d) / sum(1 / d) AS cx, sum(y / d) / sum(1 / d) AS cy
      FROM (SELECT x, y,
                   sqrt((x - it1.cx) * (x - it1.cx)
                        + (y - it1.cy) * (y - it1.cy)) + 1e-9 AS d
            FROM pts CROSS JOIN it1))
    SELECT round(it2.cx, 4) AS median_x, round(it2.cy, 4) AS median_y,
           round(c0.cx, 4) AS centroid_x, round(c0.cy, 4) AS centroid_y,
           (SELECT round(sum(sqrt((x - it2.cx) * (x - it2.cx)
                                  + (y - it2.cy) * (y - it2.cy))), 2)
            FROM pts) AS total_dist_at_median
    FROM it2 CROSS JOIN c0
    """,
    tags=("geo", "iterative", "robust"),
)
def q_geometric_median_weiszfeld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric median by Weiszfeld iteration (two unrolled steps
    from the centroid): the L1-optimal facility location — where the
    mean point chases outliers, the geometric median doesn't, which
    is why robust-aggregation schemes (including federated-learning
    aggregators) use exactly this iteration. Each step is ONE
    aggregate over the points against a broadcast 1-row center —
    the unrolled-iteration oracle device from kmeans/pagerank at its
    smallest."""
    s = _t(spark, sf_dir, "supplier")
    pts = s.filter(F.col("s_suppkey") <= 200).select(
        ((F.col("s_suppkey") * 37 % 3600) / 10.0).alias("x"),
        ((F.col("s_suppkey") * 53 % 1600) / 10.0).alias("y"),
    )
    c0 = pts.agg(F.avg("x").alias("cx"), F.avg("y").alias("cy"))

    def step(center: DataFrame) -> DataFrame:
        d = (
            F.sqrt(
                (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
            )
            + 1e-9
        )
        return (
            pts.join(F.broadcast(center))
            .select("x", "y", d.alias("d"))
            .agg(
                (F.sum(F.col("x") / F.col("d")) / F.sum(1 / F.col("d"))).alias("cx"),
                (F.sum(F.col("y") / F.col("d")) / F.sum(1 / F.col("d"))).alias("cy"),
            )
        )

    it2 = step(step(c0))
    dist_at = (
        pts.join(F.broadcast(it2.select(F.col("cx").alias("mx"), F.col("cy").alias("my"))))
        .agg(
            F.round(
                F.sum(
                    F.sqrt(
                        (F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx"))
                        + (F.col("y") - F.col("my")) * (F.col("y") - F.col("my"))
                    )
                ),
                2,
            ).alias("total_dist_at_median")
        )
    )
    return (
        it2.join(F.broadcast(c0.select(F.col("cx").alias("centroid_x"), F.col("cy").alias("centroid_y"))))
        .join(F.broadcast(dist_at))
        .select(
            F.round("cx", 4).alias("median_x"),
            F.round("cy", 4).alias("median_y"),
            F.round("centroid_x", 4).alias("centroid_x"),
            F.round("centroid_y", 4).alias("centroid_y"),
            "total_dist_at_median",
        )
    )


@register(
    "theil_sen_slope",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS t,
             sum(o_totalprice) AS v
      FROM orders
      WHERE CAST(o_orderdate AS DATE) < DATE '1995-07-01'
      GROUP BY 1, 2),
    slopes AS (
      SELECT (b.v - a.v) / (b.t - a.t) AS slope
      FROM daily a JOIN daily b ON a.t < b.t)
    SELECT round(quantile_cont(slope, 0.5), 4) AS theil_sen_slope,
           (SELECT round(regr_slope(v, CAST(t AS DOUBLE)), 4) FROM daily)
             AS ols_slope,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM slopes
    """,
    tags=("stats", "robust", "regression"),
)
def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen trend estimator: the MEDIAN of all pairwise slopes
    — up to 29% contamination cannot move it, where a single wild
    day drags OLS (shown alongside); the robust-trend standard in
    environmental series, including NDVI greening analyses (ndvi_
    trend's regr_slope is the parametric twin). All-pairs is O(n²)
    in |days| — bounded by the half-year window; the large-series
    variant samples pairs, same median."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate").cast("date") < F.lit("1995-07-01").cast("date"))
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("t")
        )
        .agg(F.sum("o_totalprice").alias("v"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(b, F.col("a.t") < F.col("b.t")).select(
        ((F.col("b.v") - F.col("a.v")) / (F.col("b.t") - F.col("a.t"))).alias(
            "slope"
        )
    )
    ols = daily.agg(
        F.round(F.regr_slope("v", F.col("t").cast("double")), 4).alias("ols_slope")
    )
    return (
        slopes.agg(
            F.round(F.expr("percentile(slope, 0.5)"), 4).alias("theil_sen_slope"),
            F.count("*").cast("bigint").alias("n_pairs"),
        )
        .join(F.broadcast(ols))
        .select("theil_sen_slope", "ols_slope", "n_pairs")
    )


@register(
    "median_of_means",
    oracle="""
    WITH bucketed AS (
      SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::UBIGINT
               % 16 AS bkt,
             o_totalprice AS v
      FROM orders),
    means AS (
      SELECT bkt, avg(v) AS m, CAST(count(*) AS BIGINT) AS n_b
      FROM bucketed GROUP BY bkt)
    SELECT round(quantile_cont(m, 0.5), 4) AS median_of_means,
           (SELECT round(avg(o_totalprice), 4) FROM orders) AS plain_mean,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(min(n_b) AS BIGINT) AS smallest_bucket
    FROM means
    """,
    tags=("stats", "robust", "scale"),
)
def q_median_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means: hash the rows into 16 deterministic buckets,
    average each, take the median — the heavy-tail-robust mean
    estimator with exponential concentration where the plain mean
    has only Chebyshev (the theory workhorse behind robust sketching;
    a single corrupted shard moves one bucket mean, not the
    estimate). The bucketing is the map side of any aggregation —
    zero extra passes over the data versus the plain mean it's
    shown against."""
    o = _t(spark, sf_dir, "orders")
    bkt = F.pmod(
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2), 16, 10
        ).cast("long"),
        F.lit(16),
    )
    means = (
        o.select(bkt.alias("bkt"), F.col("o_totalprice").alias("v"))
        .groupBy("bkt")
        .agg(F.avg("v").alias("m"), F.count("*").cast("bigint").alias("n_b"))
    )
    plain = o.agg(F.round(F.avg("o_totalprice"), 4).alias("plain_mean"))
    return (
        means.agg(
            F.round(F.expr("percentile(m, 0.5)"), 4).alias("median_of_means"),
            F.count("*").cast("bigint").alias("n_buckets"),
            F.min("n_b").cast("bigint").alias("smallest_bucket"),
        )
        .join(F.broadcast(plain))
        .select("median_of_means", "plain_mean", "n_buckets", "smallest_bucket")
    )


@register(
    "seasonal_strength",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(strftime(CAST(o_orderdate AS DATE), '%w') AS INT) AS wd,
             sum(o_totalprice) AS v
      FROM orders GROUP BY 1, 2),
    seasonal AS (
      SELECT wd, avg(v) AS s FROM daily GROUP BY wd),
    decomp AS (
      SELECT v, s, v - s AS r
      FROM daily JOIN seasonal USING (wd))
    SELECT round(greatest(0.0, 1.0 - var_pop(r) / var_pop(v)), 4)
             AS seasonal_strength,
           round(var_pop(v), 2) AS var_total,
           round(var_pop(r), 2) AS var_remainder,
           CAST(count(*) AS BIGINT) AS n_days
    FROM decomp
    """,
    tags=("timeseries", "seasonal", "decomposition"),
)
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength F_s = max(0, 1 − Var(remainder)/Var(series))
    after removing weekday means — the STL-style scalar (Hyndman's
    feature) that decides whether seasonal modeling is worth its
    complexity at all: F_s ≈ 0 on this flat generator means the
    weekday index (seasonal_index_monthly) carries no signal, and a
    forecaster should say so. One weekday-means pass broadcast back,
    two variances."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("wd"),
    ).agg(F.sum("o_totalprice").alias("v"))
    seasonal = daily.groupBy("wd").agg(F.avg("v").alias("s"))
    decomp = daily.join(F.broadcast(seasonal), "wd").select(
        "v", (F.col("v") - F.col("s")).alias("r")
    )
    return decomp.agg(
        F.round(
            F.greatest(F.lit(0.0), 1.0 - F.var_pop("r") / F.var_pop("v")), 4
        ).alias("seasonal_strength"),
        F.round(F.var_pop("v"), 2).alias("var_total"),
        F.round(F.var_pop("r"), 2).alias("var_remainder"),
        F.count("*").cast("bigint").alias("n_days"),
    )


@register(
    "capture_recapture_estimate",
    oracle=None,  # finalized below (QuerySpec replacement)
    tags=("stats", "estimation", "coverage"),
)
def q_capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln–Petersen capture-recapture: two independent
    hash-defined 'survey passes' over orders each capture a set of
    parts; universe estimate N̂ = n1·n2/overlap, compared against
    the true distinct-part count — the mark-recapture method used to
    size unseen populations (how many pages a crawl is missing, how
    many dup clusters dedup hasn't found). Chapman's +1 correction
    keeps the estimator finite on small overlaps."""
    li = _t(spark, sf_dir, "lineitem")
    h = F.md5(F.col("l_orderkey").cast("string"))
    s1 = li.filter(F.substring(h, 1, 1) < "4").select("l_partkey").distinct()
    s2 = li.filter(F.substring(h, 2, 1) < "4").select("l_partkey").distinct()
    both = s1.intersect(s2)
    truth = li.select("l_partkey").distinct()
    n1, n2, m, t = s1.count(), s2.count(), both.count(), truth.count()
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    return spark.createDataFrame(
        [
            (
                n1,
                n2,
                m,
                round(chapman, 1),
                t,
                round(chapman / t, 4),
            )
        ],
        "n_sample1 LONG, n_sample2 LONG, n_overlap LONG, "
        "estimated_universe DOUBLE, true_universe LONG, estimate_ratio DOUBLE",
    )


_spec_cr = REGISTRY["capture_recapture_estimate"]
REGISTRY["capture_recapture_estimate"] = QuerySpec(
    _spec_cr.builder,
    """
    WITH sample1 AS (
      SELECT DISTINCT l_partkey FROM lineitem
      WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) < '4'),
    sample2 AS (
      SELECT DISTINCT l_partkey FROM lineitem
      WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 2, 1) < '4'),
    ov AS (SELECT l_partkey FROM sample1 INTERSECT
           SELECT l_partkey FROM sample2),
    m AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM sample1) AS n1,
             (SELECT CAST(count(*) AS BIGINT) FROM sample2) AS n2,
             (SELECT CAST(count(*) AS BIGINT) FROM ov) AS ovl,
             (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
              FROM lineitem) AS t)
    SELECT n1 AS n_sample1, n2 AS n_sample2, ovl AS n_overlap,
           round((n1 + 1.0) * (n2 + 1.0) / (ovl + 1.0) - 1, 1)
             AS estimated_universe,
           t AS true_universe,
           round(((n1 + 1.0) * (n2 + 1.0) / (ovl + 1.0) - 1) / t, 4)
             AS estimate_ratio
    FROM m
    """,
    _spec_cr.headline,
    _spec_cr.tags,
)


@register(
    "unseen_mass_estimates",
    oracle="""
    WITH freq AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS f
      FROM lineitem GROUP BY l_partkey),
    fof AS (SELECT f, CAST(count(*) AS DOUBLE) AS ff FROM freq GROUP BY f),
    m AS (
      SELECT (SELECT CAST(count(*) AS DOUBLE) FROM freq) AS s_obs,
             (SELECT CAST(sum(f) AS DOUBLE) FROM freq) AS n_tokens,
             coalesce((SELECT ff FROM fof WHERE f = 1), 0) AS f1,
             coalesce((SELECT ff FROM fof WHERE f = 2), 0) AS f2)
    SELECT CAST(s_obs AS BIGINT) AS species_observed,
           round(s_obs + f1 * f1 / (2 * greatest(f2, 1)), 1) AS chao1_estimate,
           round(f1 / n_tokens, 6) AS good_turing_unseen_mass,
           CAST(f1 AS BIGINT) AS singletons, CAST(f2 AS BIGINT) AS doubletons
    FROM m
    """,
    tags=("stats", "coverage", "estimation"),
)
def q_unseen_mass_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unseen-population estimates from the frequency-of-frequencies
    (the Good–Turing substrate): Chao1 richness S + f1²/2f2 (how
    many part types exist that the sample never showed) and the
    Good–Turing unseen probability mass f1/N (how much of the NEXT
    draw is novel) — the pair that tells a corpus builder whether
    more crawling still buys vocabulary (complementing
    capture_recapture's two-sample view with a single-sample one).
    Two nested aggregates; f-of-f is tiny."""
    li = _t(spark, sf_dir, "lineitem")
    freq = li.groupBy("l_partkey").agg(F.count("*").alias("f"))
    fof = freq.groupBy("f").agg(F.count("*").cast("double").alias("ff"))
    s_obs = freq.agg(
        F.count("*").cast("double").alias("s_obs"),
        F.sum("f").cast("double").alias("n_tokens"),
    )
    fs = fof.agg(
        F.coalesce(F.sum(F.when(F.col("f") == 1, F.col("ff"))), F.lit(0.0)).alias(
            "f1"
        ),
        F.coalesce(F.sum(F.when(F.col("f") == 2, F.col("ff"))), F.lit(0.0)).alias(
            "f2"
        ),
    )
    m = s_obs.join(F.broadcast(fs))
    return m.select(
        F.col("s_obs").cast("bigint").alias("species_observed"),
        F.round(
            F.col("s_obs")
            + F.col("f1") * F.col("f1") / (2 * F.greatest(F.col("f2"), F.lit(1.0))),
            1,
        ).alias("chao1_estimate"),
        F.round(F.col("f1") / F.col("n_tokens"), 6).alias(
            "good_turing_unseen_mass"
        ),
        F.col("f1").cast("bigint").alias("singletons"),
        F.col("f2").cast("bigint").alias("doubletons"),
    )


@register(
    "birthday_hash_collisions",
    oracle="""
    WITH hashed AS (
      SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::UBIGINT
               AS bkt
      FROM orders),
    per_bucket AS (
      SELECT bkt, CAST(count(*) AS DOUBLE) AS c
      FROM hashed GROUP BY bkt),
    m AS (
      SELECT sum(c * (c - 1) / 2) AS observed_pairs,
             sum(c) AS n
      FROM per_bucket)
    SELECT CAST(observed_pairs AS BIGINT) AS observed_colliding_pairs,
           round(n * (n - 1) / 2 / 65536.0, 1) AS expected_pairs,
           round(observed_pairs / (n * (n - 1) / 2 / 65536.0), 3)
             AS obs_over_exp,
           CAST(n AS BIGINT) AS n_keys
    FROM m
    """,
    tags=("stats", "hash", "audit"),
)
def q_birthday_hash_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Birthday-bound collision audit on a 16-bit hash: colliding
    pairs Σc(c−1)/2 against the n(n−1)/2·2⁻ᵏ expectation — the check
    that sizes LSH band keys and shard counts before deployment
    (obs/exp ≈ 1 = the hash behaves; ≫1 = key-space too small or
    hash broken, and every bucket join downstream degrades toward
    quadratic). One group-count pass on the derived bucket."""
    o = _t(spark, sf_dir, "orders")
    bkt = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
    ).cast("long")
    per_bucket = o.select(bkt.alias("bkt")).groupBy("bkt").agg(
        F.count("*").cast("double").alias("c")
    )
    m = per_bucket.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("observed_pairs"),
        F.sum("c").alias("n"),
    )
    exp_pairs = F.col("n") * (F.col("n") - 1) / 2 / 65536.0
    return m.select(
        F.col("observed_pairs").cast("bigint").alias("observed_colliding_pairs"),
        F.round(exp_pairs, 1).alias("expected_pairs"),
        F.round(F.col("observed_pairs") / exp_pairs, 3).alias("obs_over_exp"),
        F.col("n").cast("bigint").alias("n_keys"),
    )


@register(
    "ljung_box_residual_whiteness",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(strftime(CAST(o_orderdate AS DATE), '%w') AS INT) AS wd,
             sum(o_totalprice) AS v
      FROM orders GROUP BY 1, 2),
    seasonal AS (SELECT wd, avg(v) AS s FROM daily GROUP BY wd),
    resid AS (
      SELECT d, v - s AS r FROM daily JOIN seasonal USING (wd)),
    lagged AS (
      SELECT r,
             lag(r, 1) OVER (ORDER BY d) AS r1,
             lag(r, 2) OVER (ORDER BY d) AS r2,
             lag(r, 3) OVER (ORDER BY d) AS r3
      FROM resid),
    acfs AS (
      SELECT corr(r, r1) AS a1, corr(r, r2) AS a2, corr(r, r3) AS a3,
             CAST(count(*) AS DOUBLE) AS n
      FROM lagged)
    SELECT round(n * (n + 2) * (a1 * a1 / (n - 1) + a2 * a2 / (n - 2)
                                + a3 * a3 / (n - 3)), 4) AS ljung_box_q3,
           round(a1, 4) AS acf1, round(a2, 4) AS acf2, round(a3, 4) AS acf3,
           CAST(n AS BIGINT) AS n
    FROM acfs
    """,
    tags=("timeseries", "stats", "diagnostics"),
)
def q_ljung_box_residual_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau statistic (3 lags) on the
    seasonally-adjusted residuals: Q = n(n+2)Σρ²ₖ/(n−k) — the
    residual-whiteness check a forecaster runs AFTER removing
    structure (here the weekday means from seasonal_strength);
    Q under ~χ²₃'s bulk (≲ 7.8) = nothing left to model, the proper
    companion to runs_test's sign-based view. One lag window over
    the residual series, three correlations, scalar assembly."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("wd"),
    ).agg(F.sum("o_totalprice").alias("v"))
    seasonal = daily.groupBy("wd").agg(F.avg("v").alias("s"))
    resid = daily.join(F.broadcast(seasonal), "wd").select(
        "d", (F.col("v") - F.col("s")).alias("r")
    )
    w = Window.orderBy("d")
    lagged = resid.select(
        "r",
        F.lag("r", 1).over(w).alias("r1"),
        F.lag("r", 2).over(w).alias("r2"),
        F.lag("r", 3).over(w).alias("r3"),
    )
    acfs = lagged.agg(
        F.corr("r", "r1").alias("a1"),
        F.corr("r", "r2").alias("a2"),
        F.corr("r", "r3").alias("a3"),
        F.count("*").cast("double").alias("n"),
    )
    q = (
        F.col("n")
        * (F.col("n") + 2)
        * (
            F.col("a1") * F.col("a1") / (F.col("n") - 1)
            + F.col("a2") * F.col("a2") / (F.col("n") - 2)
            + F.col("a3") * F.col("a3") / (F.col("n") - 3)
        )
    )
    return acfs.select(
        F.round(q, 4).alias("ljung_box_q3"),
        F.round("a1", 4).alias("acf1"),
        F.round("a2", 4).alias("acf2"),
        F.round("a3", 4).alias("acf3"),
        F.col("n").cast("bigint").alias("n"),
    )


@register(
    "kmv_distinct_estimate",
    oracle="""
    WITH u AS (
      SELECT DISTINCT
        (('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::UBIGINT
         + 1) / 4294967296.0 AS v
      FROM lineitem),
    kmv AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn FROM u)
    SELECT round((256 - 1) / max(CASE WHEN rn = 256 THEN v END), 1)
             AS kmv_estimate,
           (SELECT CAST(count(*) AS BIGINT) FROM u) AS true_distinct,
           round(((256 - 1) / max(CASE WHEN rn = 256 THEN v END))
                 / (SELECT count(*) FROM u), 4) AS estimate_ratio
    FROM kmv WHERE rn <= 256
    """,
    tags=("approx", "sketch", "distinct"),
)
def q_kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=256: keep the
    k smallest hash-uniforms of the key; N̂ = (k−1)/v_(k) — the
    sketch family HLL superseded but whose estimator is EXACTLY
    reproducible in plain SQL on both engines (unlike HLL's
    engine-specific registers, cf. approx_distinct_stats staying
    rows-only). Checked against the true distinct in the same
    output; the k smallest values are a top-k, not a sort."""
    li = _t(spark, sf_dir, "lineitem")
    u = li.select(
        (
            (
                F.conv(
                    F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8),
                    16,
                    10,
                ).cast("double")
                + 1
            )
            / 4294967296.0
        ).alias("v")
    ).distinct()
    kth = (
        u.orderBy("v")
        .limit(256)
        .agg(F.max("v").alias("vk"), F.count("*").alias("k"))
    )
    truth = u.agg(F.count("*").cast("double").alias("t"))
    return (
        kth.join(F.broadcast(truth))
        .select(
            F.round((F.col("k") - 1) / F.col("vk"), 1).alias("kmv_estimate"),
            F.col("t").cast("bigint").alias("true_distinct"),
            F.round(((F.col("k") - 1) / F.col("vk")) / F.col("t"), 4).alias(
                "estimate_ratio"
            ),
        )
    )


@register(
    "markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events),
    trans AS (
      SELECT cur, nxt, CAST(count(*) AS DOUBLE) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt),
    row_tot AS (SELECT cur, sum(c) AS rc FROM trans GROUP BY cur),
    tot AS (SELECT sum(c) AS n FROM trans)
    SELECT round(-sum((t.c / o.n) * ln(t.c / r.rc)), 6) AS entropy_rate_nats,
           round(-sum((t.c / o.n) * ln(t.c / r.rc)) / ln(5.0), 6)
             AS normalized_0_1,
           CAST(count(*) AS BIGINT) AS n_transition_types
    FROM trans t JOIN row_tot r USING (cur) CROSS JOIN tot o
    GROUP BY o.n
    """,
    tags=("events", "information", "markov"),
)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov entropy rate of the event-type chain:
    H = −Σ π(i,j)·ln P(j|i) over the first-order transition matrix
    (event_transitions' counts turned into an information rate) —
    how PREDICTABLE the next action is given the current one;
    normalized by ln|alphabet| so 1.0 = memoryless uniform (the
    expected read on this generator) and low values justify
    sequence-model features. One lag pass, a |types|² matrix, scalar
    reduction."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count("*").cast("double").alias("c"))
    row_tot = trans.groupBy("cur").agg(F.sum("c").alias("rc"))
    tot = trans.agg(F.sum("c").alias("n"))
    j = trans.join(F.broadcast(row_tot), "cur").join(F.broadcast(tot))
    h = -F.sum((F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("rc")))
    return j.groupBy("n").agg(
        F.round(h, 6).alias("entropy_rate_nats"),
        F.round(h / math.log(5.0), 6).alias("normalized_0_1"),
        F.count("*").cast("bigint").alias("n_transition_types"),
    ).drop("n")


@register(
    "neyman_allocation",
    oracle="""
    WITH strata AS (
      SELECT n_name,
             CAST(count(*) AS DOUBLE) AS big_n,
             stddev_samp(o_totalprice) AS sigma
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name),
    tot AS (SELECT sum(big_n * sigma) AS w FROM strata)
    SELECT n_name,
           CAST(big_n AS BIGINT) AS stratum_size,
           round(1000.0 * big_n * sigma / w, 2) AS neyman_n,
           round(1000.0 * big_n / sum(big_n) OVER (), 2) AS proportional_n
    FROM strata CROSS JOIN tot
    """,
    tags=("stats", "sampling", "survey"),
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal allocation of a 1000-unit sample across nation
    strata: n_h ∝ N_h·σ_h — variance-optimal stratified sampling,
    shown against proportional allocation (they differ exactly where
    stratum variances do; equal-σ strata make them coincide). The
    design tool upstream of stratified_sample's execution; one
    grouped-moments pass and a broadcast normalizer."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    strata = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").cast("double").alias("big_n"),
            F.stddev_samp("o_totalprice").alias("sigma"),
        )
    )
    tot = strata.agg(F.sum(F.col("big_n") * F.col("sigma")).alias("w"))
    wall = Window.partitionBy()
    return (
        strata.join(F.broadcast(tot))
        .select(
            "n_name",
            F.col("big_n").cast("bigint").alias("stratum_size"),
            F.round(1000.0 * F.col("big_n") * F.col("sigma") / F.col("w"), 2).alias(
                "neyman_n"
            ),
            F.round(
                1000.0 * F.col("big_n") / F.sum("big_n").over(wall), 2
            ).alias("proportional_n"),
        )
    )


@register(
    "chain_ladder_development",
    oracle="""
    WITH cells AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS cohort,
             date_diff('month',
                       date_trunc('month', CAST(o_orderdate AS DATE)),
                       date_trunc('month', CAST(l_shipdate AS DATE))) AS age,
             sum(l_extendedprice) AS paid
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT) <= 1997
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age,
             sum(paid) OVER (PARTITION BY cohort ORDER BY age
                             ROWS UNBOUNDED PRECEDING) AS c
      FROM cells WHERE age BETWEEN 0 AND 5),
    linked AS (
      SELECT a.age,
             sum(b.c) AS next_sum, sum(a.c) AS cur_sum,
             CAST(count(*) AS BIGINT) AS n_cohorts
      FROM cum a JOIN cum b
        ON a.cohort = b.cohort AND b.age = a.age + 1
      GROUP BY a.age)
    SELECT age,
           round(next_sum / cur_sum, 6) AS age_to_age_factor,
           n_cohorts
    FROM linked
    """,
    tags=("actuarial", "window", "triangle"),
)
def q_chain_ladder_development(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder development factors — the actuarial run-off
    triangle: cohorts (order month) accumulate shipped value by
    development age, and each age-to-age factor is the volume-
    weighted ratio Σ C_{a+1}/Σ C_a over cohorts observed at both
    ages — the multiplier chain that projects immature cohorts to
    ultimate (claims reserving, but equally revenue run-off). The
    triangle is a cohort×age aggregate; the factor join links each
    cohort to its own next-age cell, so everything after the fact
    scan is |cohorts|·|ages| rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cohort = F.date_trunc("month", F.col("o_orderdate").cast("date"))
    age = F.months_between(
        F.date_trunc("month", F.col("l_shipdate").cast("date")), cohort
    ).cast("long")
    cells = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .filter(F.year(F.col("o_orderdate").cast("date")) <= 1997)
        .groupBy(cohort.alias("cohort"), age.alias("age"))
        .agg(F.sum("l_extendedprice").alias("paid"))
        .filter(F.col("age").between(0, 5))
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.select("cohort", "age", F.sum("paid").over(w).alias("c"))
    a = cum.alias("a")
    b = cum.alias("b")
    linked = (
        a.join(
            b,
            (F.col("a.cohort") == F.col("b.cohort"))
            & (F.col("b.age") == F.col("a.age") + 1),
        )
        .groupBy(F.col("a.age").alias("age"))
        .agg(
            F.sum("b.c").alias("next_sum"),
            F.sum("a.c").alias("cur_sum"),
            F.count("*").cast("bigint").alias("n_cohorts"),
        )
    )
    return linked.select(
        "age",
        F.round(F.col("next_sum") / F.col("cur_sum"), 6).alias(
            "age_to_age_factor"
        ),
        "n_cohorts",
    )


@register(
    "net_revenue_retention",
    oracle="""
    WITH yearly AS (
      SELECT o_custkey,
             CAST(strftime(CAST(o_orderdate AS DATE), '%Y') AS INT) AS yr,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1, 2),
    pairs AS (
      SELECT cur.yr AS year,
             sum(CASE WHEN prev.o_custkey IS NOT NULL
                      THEN cur.rev ELSE 0 END) AS retained_rev,
             sum(CASE WHEN prev.o_custkey IS NULL
                      THEN cur.rev ELSE 0 END) AS new_rev,
             sum(coalesce(prev.rev, 0)) AS base_rev_returningonly
      FROM yearly cur LEFT JOIN yearly prev
        ON cur.o_custkey = prev.o_custkey AND prev.yr = cur.yr - 1
      GROUP BY cur.yr),
    base AS (
      SELECT yr + 1 AS year, sum(rev) AS base_rev
      FROM yearly GROUP BY yr)
    SELECT p.year,
           round(p.retained_rev / b.base_rev, 4) AS nrr,
           round(p.new_rev, 2) AS new_revenue,
           round(b.base_rev, 2) AS prior_year_base
    FROM pairs p JOIN base b ON p.year = b.year
    WHERE p.year BETWEEN 1996 AND 2000
    """,
    tags=("saas", "cohort", "retention"),
)
def q_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net revenue retention: this year's revenue from LAST year's
    customer base over last year's total — the dollar-weighted
    retention SaaS metrics stand on (NRR > 1 = expansion outruns
    churn; retention_cohorts counts heads, this weighs wallets).
    Per-customer yearly aggregate, one self-join on (customer,
    year−1) to classify retained vs new dollars, prior-year base
    joined by year."""
    o = _t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year(F.col("o_orderdate").cast("date")).alias("yr")
    ).agg(F.sum("o_totalprice").alias("rev"))
    cur = yearly.alias("cur")
    prev = yearly.alias("prev")
    pairs = (
        cur.join(
            prev,
            (F.col("cur.o_custkey") == F.col("prev.o_custkey"))
            & (F.col("prev.yr") == F.col("cur.yr") - 1),
            "left",
        )
        .groupBy(F.col("cur.yr").alias("year"))
        .agg(
            F.sum(
                F.when(F.col("prev.o_custkey").isNotNull(), F.col("cur.rev")).otherwise(
                    0.0
                )
            ).alias("retained_rev"),
            F.sum(
                F.when(F.col("prev.o_custkey").isNull(), F.col("cur.rev")).otherwise(
                    0.0
                )
            ).alias("new_rev"),
        )
    )
    base = yearly.groupBy((F.col("yr") + 1).alias("year")).agg(
        F.sum("rev").alias("base_rev")
    )
    return (
        pairs.join(base, "year")
        .filter(F.col("year").between(1996, 2000))
        .select(
            "year",
            F.round(F.col("retained_rev") / F.col("base_rev"), 4).alias("nrr"),
            F.round("new_rev", 2).alias("new_revenue"),
            F.round("base_rev", 2).alias("prior_year_base"),
        )
    )


@register(
    "word_burstiness_adaptation",
    oracle="""
    WITH words AS (
      SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      WHERE w <> '' GROUP BY doc_id, w),
    stats AS (
      SELECT w,
             sum(tf) AS cf,
             CAST(count(*) AS DOUBLE) AS df,
             sum(tf) / count(*) AS burstiness
      FROM words GROUP BY w
      HAVING count(*) >= 20)
    SELECT CAST(count(*) AS BIGINT) AS n_words,
           round(avg(burstiness), 4) AS mean_burstiness,
           round(max(burstiness), 4) AS max_burstiness,
           round(corr(ln(cf), burstiness), 4) AS freq_burstiness_corr
    FROM stats
    """,
    tags=("text", "corpus", "burstiness"),
)
def q_word_burstiness_adaptation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness (Church–Gale adaptation): mean occurrences
    per CONTAINING document, cf/df — content words burst (once a
    topic appears it repeats), function words don't (≈ their Poisson
    rate), and the correlation with log-frequency separates the two
    regimes; the per-word companion to repetition_quality's per-doc
    rules and a feature term-weighting schemes (BM25's tf
    saturation) exist to absorb. One (doc, word) aggregate then a
    word-level rollup."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    stats = (
        words.groupBy("w")
        .agg(
            F.sum("tf").alias("cf"),
            F.count("*").cast("double").alias("df"),
            (F.sum("tf") / F.count("*")).alias("burstiness"),
        )
        .filter(F.col("df") >= 20)
    )
    return stats.agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.round(F.avg("burstiness"), 4).alias("mean_burstiness"),
        F.round(F.max("burstiness"), 4).alias("max_burstiness"),
        F.round(F.corr(F.log("cf"), F.col("burstiness")), 4).alias(
            "freq_burstiness_corr"
        ),
    )


@register(
    "hurst_exponent_rs",
    oracle="""
    WITH daily AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) - 1 AS i, v
      FROM (SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
            FROM orders GROUP BY 1)),
    sized AS (
      SELECT n, i // n AS blk, i, v
      FROM daily, (SELECT unnest([8, 16, 32, 64]) AS n)),
    blockstats AS (
      SELECT n, blk, avg(v) AS mu, stddev_pop(v) AS sd,
             CAST(count(*) AS BIGINT) AS cnt
      FROM sized GROUP BY n, blk),
    cumdev AS (
      SELECT s.n, s.blk,
             sum(s.v - b.mu) OVER (
               PARTITION BY s.n, s.blk ORDER BY s.i
               ROWS UNBOUNDED PRECEDING) AS c,
             b.sd
      FROM sized s JOIN blockstats b
        ON s.n = b.n AND s.blk = b.blk AND b.cnt = s.n AND b.sd > 0),
    rs AS (
      SELECT n, blk, (max(c) - min(c)) / max(sd) AS rs_val
      FROM cumdev GROUP BY n, blk),
    curve AS (
      SELECT n, avg(rs_val) AS mean_rs FROM rs GROUP BY n)
    SELECT round(regr_slope(ln(mean_rs), ln(CAST(n AS DOUBLE))), 4)
             AS hurst_exponent,
           CAST(count(*) AS BIGINT) AS n_scales,
           round(min(mean_rs), 3) AS rs_smallest_scale,
           round(max(mean_rs), 3) AS rs_largest_scale
    FROM curve
    """,
    tags=("timeseries", "stats", "longmemory"),
)
def q_hurst_exponent_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis: block the
    series at scales 8–64, compute each full block's range of
    mean-adjusted cumulative deviations over its σ, and regress
    ln⟨R/S⟩ on ln(n) — H≈0.5 random walk/white noise, H>0.5
    persistent long memory (Hurst's original Nile reservoir
    question; the long-range-dependence diagnostic ACF can't see).
    Blocks are (scale, i div n) group keys — every stage is hash
    aggregation plus one per-block cumulative window; incomplete
    tail blocks are excluded (cnt = n) as the method requires."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("i"),
        "v",
    )
    scales = spark.createDataFrame([(8,), (16,), (32,), (64,)], "n INT")
    sized = idx.crossJoin(F.broadcast(scales)).select(
        "n", (F.col("i") / F.col("n")).cast("long").alias("blk"), "i", "v"
    )
    blockstats = sized.groupBy("n", "blk").agg(
        F.avg("v").alias("mu"),
        F.stddev_pop("v").alias("sd"),
        F.count("*").alias("cnt"),
    )
    joined = sized.join(
        blockstats.filter(F.col("sd") > 0),
        ["n", "blk"],
    ).filter(F.col("cnt") == F.col("n"))
    wc = Window.partitionBy("n", "blk").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cumdev = joined.select(
        "n", "blk", F.sum(F.col("v") - F.col("mu")).over(wc).alias("c"), "sd"
    )
    rs = cumdev.groupBy("n", "blk").agg(
        ((F.max("c") - F.min("c")) / F.max("sd")).alias("rs_val")
    )
    curve = rs.groupBy("n").agg(F.avg("rs_val").alias("mean_rs"))
    return curve.agg(
        F.round(
            F.regr_slope(F.log("mean_rs"), F.log(F.col("n").cast("double"))), 4
        ).alias("hurst_exponent"),
        F.count("*").cast("bigint").alias("n_scales"),
        F.round(F.min("mean_rs"), 3).alias("rs_smallest_scale"),
        F.round(F.max("mean_rs"), 3).alias("rs_largest_scale"),
    )


@register(
    "sax_motif_counts",
    oracle="""
    WITH daily AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) - 1 AS i, v
      FROM (SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
            FROM orders GROUP BY 1)),
    z AS (
      SELECT i, (v - (SELECT avg(v) FROM daily))
                / (SELECT stddev_samp(v) FROM daily) AS zv
      FROM daily),
    paa AS (
      SELECT i // 7 AS seg, avg(zv) AS m, CAST(count(*) AS BIGINT) AS cnt
      FROM z GROUP BY i // 7),
    sym AS (
      SELECT seg,
             CASE WHEN m < -0.6745 THEN 'a'
                  WHEN m < 0 THEN 'b'
                  WHEN m < 0.6745 THEN 'c' ELSE 'd' END AS s
      FROM paa WHERE cnt = 7),
    words AS (
      SELECT s.s || s1.s || s2.s AS motif
      FROM sym s JOIN sym s1 ON s1.seg = s.seg + 1
      JOIN sym s2 ON s2.seg = s.seg + 2)
    SELECT motif, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM words GROUP BY motif HAVING count(*) >= 3
    """,
    tags=("timeseries", "symbolization", "motif"),
)
def q_sax_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin & Keogh): z-normalize the daily
    series, PAA-average into 7-day segments, map segment means
    through the equiprobable-Gaussian breakpoints (±0.6745, 0 for a
    4-letter alphabet), then count recurring 3-letter motifs — the
    discretization that turns similarity search over time series
    into string algorithms (suffix/hash indexes, the dedup machinery
    of this engine applied to signals). Segments are i div 7 group
    keys; the motif join links consecutive segments — all hash
    operations, no windows past the initial ordering."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("i"),
        "v",
    )
    m = idx.agg(F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd"))
    z = idx.join(F.broadcast(m)).select(
        "i", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("zv")
    )
    paa = z.groupBy((F.col("i") / 7).cast("long").alias("seg")).agg(
        F.avg("zv").alias("pm"), F.count("*").alias("cnt")
    )
    sym = paa.filter(F.col("cnt") == 7).select(
        "seg",
        F.when(F.col("pm") < -0.6745, "a")
        .when(F.col("pm") < 0, "b")
        .when(F.col("pm") < 0.6745, "c")
        .otherwise("d")
        .alias("s"),
    )
    s0 = sym.alias("s0")
    s1 = sym.alias("s1")
    s2 = sym.alias("s2")
    words = (
        s0.join(s1, F.col("s1.seg") == F.col("s0.seg") + 1)
        .join(s2, F.col("s2.seg") == F.col("s0.seg") + 2)
        .select(
            F.concat(F.col("s0.s"), F.col("s1.s"), F.col("s2.s")).alias("motif")
        )
    )
    return (
        words.groupBy("motif")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 3)
    )


@register(
    "dhondt_apportionment",
    oracle="""
    WITH rev AS (
      SELECT n_name, sum(o_totalprice) AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name),
    quotients AS (
      SELECT n_name, r / d AS q,
             row_number() OVER (ORDER BY r / d DESC, n_name, d) AS rk
      FROM rev, unnest(generate_series(1, 100)) AS t(d)),
    seats AS (
      SELECT n_name, CAST(count(*) AS BIGINT) AS seats
      FROM quotients WHERE rk <= 100 GROUP BY n_name)
    SELECT r.n_name, coalesce(s.seats, 0) AS seats,
           round(100.0 * r.r / (SELECT sum(r) FROM rev), 3) AS exact_share
    FROM rev r LEFT JOIN seats s ON r.n_name = s.n_name
    """,
    tags=("apportionment", "window"),
)
def q_dhondt_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Hondt divisor-method apportionment of 100 seats by revenue:
    every nation generates quotients r/1, r/2, …, the 100 LARGEST
    quotients are the seats — the divisor family (slightly favoring
    large parties) against Hamilton's largest-remainder
    (largest_remainder_apportionment, which can suffer the Alabama
    paradox divisor methods provably avoid). |nations|×100 quotient
    rows, one global top-k rank, exact integer outputs next to the
    exact proportional share."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("r"))
    )
    divisors = spark.range(1, 101).select(F.col("id").alias("d"))
    quotients = rev.crossJoin(F.broadcast(divisors)).select(
        "n_name",
        (F.col("r") / F.col("d")).alias("q"),
        "d",
    )
    ranked = quotients.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("q").desc(), F.col("n_name"), F.col("d"))
        ),
    )
    seats = (
        ranked.filter(F.col("rk") <= 100)
        .groupBy("n_name")
        .agg(F.count("*").cast("bigint").alias("seats"))
    )
    total = rev.agg(F.sum("r").alias("tr"))
    return (
        rev.join(seats, "n_name", "left")
        .join(F.broadcast(total))
        .select(
            "n_name",
            F.coalesce("seats", F.lit(0)).alias("seats"),
            F.round(100.0 * F.col("r") / F.col("tr"), 3).alias("exact_share"),
        )
    )


@register(
    "dft_periodogram",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) - 1 AS i, v
      FROM daily),
    st AS (SELECT avg(v) AS mu, stddev_samp(v) AS sd,
                  CAST(count(*) AS DOUBLE) AS n FROM idx),
    z AS (SELECT i, (v - mu) / sd AS zv, n FROM idx, st),
    per AS (SELECT unnest([7, 30, 91]) AS period),
    comp AS (
      SELECT period,
             sum(zv * cos(2 * pi() * i / period)) AS cs,
             sum(zv * sin(2 * pi() * i / period)) AS sn,
             any_value(n) AS n
      FROM z, per GROUP BY period)
    SELECT CAST(period AS BIGINT) AS period,
           round((cs * cs + sn * sn) / n, 3) AS power
    FROM comp
    """,
    tags=("timeseries", "spectral", "stats"),
)
def q_dft_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram probed at candidate periods (7 /
    30 / 91 days): normalized power |Σ z·e^{-2πi·t/p}|²/n of the
    z-scored daily revenue series — the periodicity detector run
    before choosing seasonal models (cf. seasonal_strength, which
    assumes the period; this finds it). Each probe frequency is one
    pair of sums, so the whole scan is a single hash aggregate over
    |dates|×|periods| rows — no FFT, no recursion, embarrassingly
    parallel at any scale. The row_number window rides on the
    |dates|-sized daily aggregate, never the fact table."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("i"),
        "v",
    )
    st = idx.agg(
        F.avg("v").alias("mu"),
        F.stddev_samp("v").alias("sd"),
        F.count("*").cast("double").alias("n"),
    )
    z = idx.join(F.broadcast(st)).select(
        "i", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("zv"), "n"
    )
    periods = spark.createDataFrame([(7,), (30,), (91,)], "period int")
    ang = 2 * math.pi * F.col("i") / F.col("period")
    comp = (
        z.crossJoin(F.broadcast(periods))
        .groupBy("period")
        .agg(
            F.sum(F.col("zv") * F.cos(ang)).alias("cs"),
            F.sum(F.col("zv") * F.sin(ang)).alias("sn"),
            F.first("n").alias("n"),
        )
    )
    return comp.select(
        F.col("period").cast("long").alias("period"),
        F.round(
            (F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn")) / F.col("n"), 3
        ).alias("power"),
    )


@register(
    "ewma_control_chart",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    st AS (SELECT avg(x) AS mu, stddev_samp(x) AS sd FROM daily),
    sm AS (
      SELECT a.d,
             sum(b.x * 0.2 * pow(0.8, date_diff('day', b.d, a.d)))
               / sum(0.2 * pow(0.8, date_diff('day', b.d, a.d))) AS ewma
      FROM daily a JOIN daily b ON b.d BETWEEN a.d - 27 AND a.d
      GROUP BY a.d)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN abs(ewma - mu) > 3 * sd * sqrt(0.2 / 1.8)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_breach,
           round(max(abs(ewma - mu)) / (sd * sqrt(0.2 / 1.8)), 3) AS peak_z
    FROM sm, st GROUP BY mu, sd
    """,
    tags=("timeseries", "spc", "window"),
)
def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (λ=0.2) on daily revenue: the smoothed
    statistic vs the ±3σ·√(λ/(2−λ)) control limits — the SPC drift
    detector more sensitive to small mean shifts than Shewhart
    charts. The recurrence is replaced by its closed form truncated
    at 28 lags (0.8²⁸ < 0.2% weight) and renormalized by the present
    weight mass, so every output day depends on a CONSTANT slice —
    a bounded range self-join on the |dates| aggregate, exactly the
    adstock_carryover device, no state chain to serialize."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    st = daily.agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd"))
    a = daily.select(F.col("d").alias("ad"))
    b = daily.select(F.col("d").alias("bd"), "x")
    w = 0.2 * F.pow(F.lit(0.8), F.datediff(F.col("ad"), F.col("bd")))
    sm = (
        a.join(
            b,
            (F.col("bd") >= F.date_sub(F.col("ad"), 27))
            & (F.col("bd") <= F.col("ad")),
        )
        .groupBy("ad")
        .agg((F.sum(F.col("x") * w) / F.sum(w)).alias("ewma"))
    )
    sig = F.col("sd") * F.lit(math.sqrt(0.2 / 1.8))
    return sm.join(F.broadcast(st)).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(
            F.when(F.abs(F.col("ewma") - F.col("mu")) > 3 * sig, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_breach"),
        F.round(F.max(F.abs(F.col("ewma") - F.col("mu")) / sig), 3).alias("peak_z"),
    )


@register(
    "mann_kendall_trend",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT sign(b.v - a.v) AS s
      FROM monthly a JOIN monthly b ON b.m > a.m),
    agg AS (
      SELECT CAST(sum(s) AS BIGINT) AS s_stat,
             (SELECT CAST(count(*) AS DOUBLE) FROM monthly) AS n
      FROM pairs)
    SELECT s_stat, CAST(n AS BIGINT) AS n_periods,
           round((s_stat - sign(s_stat))
                 / sqrt(n * (n - 1) * (2 * n + 5) / 18.0), 4) AS z_score
    FROM agg
    """,
    tags=("timeseries", "stats", "trend"),
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on monthly revenue: S = Σ_{i<j}
    sign(x_j − x_i) over all ordered month pairs, normal-approximated
    with continuity correction — the nonparametric monotone-trend
    detector (no linearity or normality assumption, robust to
    outliers, the hydrology-standard companion to Theil-Sen's slope
    estimate in theil_sen_slope). The O(n²) pair join runs on the
    |months| aggregate (~84 rows → 3.5k pairs), never the fact
    table — the fact-side work is ONE map-side-combinable sum."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m")
    ).agg(F.sum("o_totalprice").alias("v"))
    a = monthly.select(F.col("m").alias("am"), F.col("v").alias("av"))
    b = monthly.select(F.col("m").alias("bm"), F.col("v").alias("bv"))
    pairs = a.join(b, F.col("bm") > F.col("am")).select(
        F.signum(F.col("bv") - F.col("av")).alias("s")
    )
    n_df = monthly.agg(F.count("*").cast("double").alias("n"))
    agg = pairs.agg(F.sum("s").cast("bigint").alias("s_stat")).join(
        F.broadcast(n_df)
    )
    var = F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0
    return agg.select(
        "s_stat",
        F.col("n").cast("bigint").alias("n_periods"),
        F.round(
            (F.col("s_stat") - F.signum(F.col("s_stat"))) / F.sqrt(var), 4
        ).alias("z_score"),
    )


@register(
    "kruskal_wallis_h",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, l_quantity AS q,
             CAST(count(*) AS DOUBLE) AS c
      FROM lineitem GROUP BY 1, 2),
    vals AS (SELECT q, sum(c) AS cv FROM cells GROUP BY q),
    ranks AS (
      SELECT q, cv,
             sum(cv) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING)
               - cv + (cv + 1) / 2.0 AS r
      FROM vals),
    tot AS (SELECT sum(cv) AS n FROM vals),
    grp AS (
      SELECT g, sum(c) AS ng, sum(c * r) AS rg
      FROM cells JOIN ranks USING (q) GROUP BY g),
    raw AS (
      SELECT 12.0 / (n * (n + 1)) * sum(rg * rg / ng) - 3 * (n + 1) AS h,
             any_value(n) AS n
      FROM grp, tot GROUP BY n),
    tiec AS (
      SELECT 1 - sum(cv * cv * cv - cv)
                 / (pow((SELECT n FROM tot), 3) - (SELECT n FROM tot)) AS cfac
      FROM vals)
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(h, 4) AS h_stat,
           round(h / cfac, 4) AS h_tie_corrected
    FROM raw, tiec
    """,
    tags=("stats", "nonparametric", "agg"),
)
def q_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H (rank one-way ANOVA) of l_quantity across
    return flags, computed WITHOUT ranking any fact row: quantity is
    discrete, so the midrank of value v is a closed form of the value
    histogram (cum_before + (count+1)/2), the per-group rank sums are
    Σ c_{g,v}·r_v over the |groups|×|values| cell relation, and the
    tie-correction 1−Σ(t³−t)/(n³−n) falls out of the same histogram.
    One map-side-combinable fact-table aggregate; every window and
    join after it touches ≤150 rows — the distributed formulation of
    a test normally written as a global sort."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("g"), F.col("l_quantity").alias("q")
    ).agg(F.count("*").cast("double").alias("c"))
    vals = cells.groupBy("q").agg(F.sum("c").alias("cv"))
    wq = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    ranks = vals.select(
        "q",
        "cv",
        (F.sum("cv").over(wq) - F.col("cv") + (F.col("cv") + 1) / 2.0).alias("r"),
    )
    tot = vals.agg(F.sum("cv").alias("n"))
    grp = (
        cells.join(F.broadcast(ranks), "q")
        .groupBy("g")
        .agg(F.sum("c").alias("ng"), F.sum(F.col("c") * F.col("r")).alias("rg"))
    )
    raw = (
        grp.join(F.broadcast(tot))
        .groupBy("n")
        .agg(
            (
                12.0
                / (F.col("n") * (F.col("n") + 1))
                * F.sum(F.col("rg") * F.col("rg") / F.col("ng"))
                - 3 * (F.col("n") + 1)
            ).alias("h")
        )
    )
    tiec = (
        vals.join(F.broadcast(tot))
        .agg(
            (
                1
                - F.sum(F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv"))
                / (F.pow(F.first("n"), 3) - F.first("n"))
            ).alias("cfac")
        )
    )
    return raw.join(F.broadcast(tiec)).select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(F.col("h"), 4).alias("h_stat"),
        F.round(F.col("h") / F.col("cfac"), 4).alias("h_tie_corrected"),
    )


@register(
    "block_maxima_gumbel",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    blocks AS (
      SELECT date_trunc('month', d) AS m, max(x) AS bx
      FROM daily GROUP BY 1),
    fit AS (SELECT CAST(count(*) AS DOUBLE) AS nb, avg(bx) AS mu0,
                   stddev_samp(bx) AS s FROM blocks),
    par AS (
      SELECT nb, s * sqrt(6) / pi() AS beta,
             mu0 - 0.5772156649015329 * (s * sqrt(6) / pi()) AS mu
      FROM fit)
    SELECT CAST(nb AS BIGINT) AS n_blocks,
           round(mu, 2) AS gumbel_mu,
           round(beta, 2) AS gumbel_beta,
           round(mu - beta * ln(-ln(1 - 1.0 / 12)), 2) AS rl_12m,
           round(mu - beta * ln(-ln(1 - 1.0 / 60)), 2) AS rl_60m
    FROM par
    """,
    tags=("stats", "extremes", "agg"),
)
def q_block_maxima_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis by block maxima: monthly maxima of
    daily revenue, Gumbel parameters by method of moments (β̂=s√6/π,
    μ̂=x̄−γβ̂ with Euler-Mascheroni γ), and the 12- and 60-month
    return levels μ−β·ln(−ln(1−1/T)) — the capacity-planning
    question 'what peak should we provision for' answered from the
    tail law, not the observed max. Two nested hash aggregates
    (day → month-max → moments); the fact table is touched once."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    blocks = daily.groupBy(F.date_trunc("month", F.col("d")).alias("m")).agg(
        F.max("x").alias("bx")
    )
    fit = blocks.agg(
        F.count("*").cast("double").alias("nb"),
        F.avg("bx").alias("mu0"),
        F.stddev_samp("bx").alias("s"),
    )
    beta = F.col("s") * F.lit(math.sqrt(6.0) / math.pi)
    mu = F.col("mu0") - F.lit(0.5772156649015329) * beta
    rl = lambda t: mu - beta * F.lit(math.log(-math.log(1 - 1.0 / t)))
    return fit.select(
        F.col("nb").cast("bigint").alias("n_blocks"),
        F.round(mu, 2).alias("gumbel_mu"),
        F.round(beta, 2).alias("gumbel_beta"),
        F.round(rl(12), 2).alias("rl_12m"),
        F.round(rl(60), 2).alias("rl_60m"),
    )


@register(
    "cramers_v_association",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS p, year(CAST(o_orderdate AS DATE)) AS y,
             CAST(count(*) AS DOUBLE) AS obs
      FROM orders GROUP BY 1, 2),
    rm AS (SELECT p, sum(obs) AS rp FROM cells GROUP BY p),
    cm AS (SELECT y, sum(obs) AS cy FROM cells GROUP BY y),
    tot AS (SELECT sum(obs) AS n FROM cells),
    dims AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM rm) AS r,
                    (SELECT CAST(count(*) AS DOUBLE) FROM cm) AS c),
    chi AS (
      SELECT sum(pow(obs - rp * cy / n, 2) / (rp * cy / n)) AS chi2,
             any_value(n) AS n
      FROM cells JOIN rm USING (p) JOIN cm USING (y), tot GROUP BY n)
    SELECT CAST(chi.n AS BIGINT) AS n_obs,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(chi2, 4) AS chi2,
           round(sqrt(chi2 / (chi.n * (least(r, c) - 1))), 6) AS cramers_v,
           round(sqrt(greatest(0, chi2 / chi.n - (r - 1) * (c - 1) / (chi.n - 1))
                      / (least(r - pow(r - 1, 2) / (chi.n - 1),
                               c - pow(c - 1, 2) / (chi.n - 1)) - 1)),
                 6) AS cramers_v_corrected
    FROM chi, dims
    """,
    tags=("stats", "association", "agg"),
)
def q_cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between order priority and order year — the
    normalized-to-[0,1] effect size the raw χ² statistic
    (chi_square_independence) lacks, plus the Bergsma-Bethel
    bias-corrected variant that de-inflates V on finite samples.
    Same distributed shape as every contingency statistic here: ONE
    shuffle builds the cell relation, marginals re-aggregate from
    the tiny cells and broadcast back; r and c are counted from the
    marginal relations so the query adapts to the observed table."""
    o = _t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("p"),
        F.year(F.col("o_orderdate").cast("date")).alias("y"),
    ).agg(F.count("*").cast("double").alias("obs"))
    rm = cells.groupBy("p").agg(F.sum("obs").alias("rp"))
    cm = cells.groupBy("y").agg(F.sum("obs").alias("cy"))
    tot = cells.agg(F.sum("obs").alias("n"))
    dims = rm.agg(F.count("*").cast("double").alias("r")).crossJoin(
        cm.agg(F.count("*").cast("double").alias("c"))
    )
    exp = F.col("rp") * F.col("cy") / F.col("n")
    chi = (
        cells.join(F.broadcast(rm), "p")
        .join(F.broadcast(cm), "y")
        .join(F.broadcast(tot))
        .groupBy("n")
        .agg(F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi2"))
    )
    phi2 = F.col("chi2") / F.col("n")
    phi2c = F.greatest(
        F.lit(0.0), phi2 - (F.col("r") - 1) * (F.col("c") - 1) / (F.col("n") - 1)
    )
    rc = F.col("r") - F.pow(F.col("r") - 1, 2) / (F.col("n") - 1)
    cc = F.col("c") - F.pow(F.col("c") - 1, 2) / (F.col("n") - 1)
    return chi.join(F.broadcast(dims)).select(
        F.col("n").cast("bigint").alias("n_obs"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.round(F.col("chi2"), 4).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))), 6
        ).alias("cramers_v"),
        F.round(F.sqrt(phi2c / (F.least(rc, cc) - 1)), 6).alias(
            "cramers_v_corrected"
        ),
    )


@register(
    "newsvendor_quantile",
    oracle="""
    WITH demand AS (
      SELECT p_brand, CAST(l_shipdate AS DATE) AS d,
             CAST(sum(l_quantity) AS DOUBLE) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2),
    stock AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n_days,
             CAST(quantile_cont(q, 0.75) AS DOUBLE) AS stock_level,
             round(avg(q), 2) AS mean_demand
      FROM demand GROUP BY p_brand)
    SELECT p_brand, n_days, round(stock_level, 2) AS stock_level, mean_demand
    FROM stock
    """,
    tags=("inventory", "percentile", "economics"),
)
def q_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor critical-fractile stocking: with underage cost 3×
    the overage cost, the optimal per-brand stock is the
    Cu/(Cu+Co) = 0.75 quantile of daily demand — the closed-form
    answer to 'how much to stock' that inventory teams compute per
    SKU class. Exact interpolated percentile (Spark `percentile` ≡
    DuckDB quantile_cont) per brand over the (brand, day) demand
    aggregate; the fact-side work is one map-side-combinable sum,
    and the percentile groups are |brands|-sized, never fact-sized."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    demand = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.sum("l_quantity").cast("double").alias("q"))
    )
    return demand.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.expr("percentile(q, 0.75)"), 2).alias("stock_level"),
        F.round(F.avg("q"), 2).alias("mean_demand"),
    )


@register(
    "benjamini_hochberg_fdr",
    oracle="""
    WITH joined AS (
      SELECT n_name, o_totalprice AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey),
    gl AS (SELECT avg(x) AS mu, stddev_samp(x) AS sd FROM joined),
    per AS (
      SELECT n_name, CAST(count(*) AS DOUBLE) AS ni, avg(x) AS mi
      FROM joined GROUP BY n_name),
    scored AS (
      SELECT n_name,
             exp(-pow((mi - mu) / (sd / sqrt(ni)), 2) / 2) AS p
      FROM per, gl),
    ranked AS (
      SELECT n_name, p,
             CAST(row_number() OVER (ORDER BY p, n_name) AS BIGINT) AS k,
             CAST(count(*) OVER () AS DOUBLE) AS m
      FROM scored),
    cutoff AS (
      SELECT coalesce(max(CASE WHEN p <= 0.1 * k / m THEN k END), 0) AS kmax
      FROM ranked)
    SELECT n_name, k AS p_rank, round(p, 6) AS pseudo_p,
           k <= kmax AS discovery
    FROM ranked, cutoff
    """,
    tags=("stats", "multiple-testing", "window"),
)
def q_benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the per-nation
    'is this nation's mean order value unusual' screen: score each
    nation with a z-statistic against the global mean, transform to
    a monotone pseudo-p = exp(−z²/2) (a screening score, not a
    calibrated p-value — neither engine ships erfc, and BH only
    needs the ORDER), rank ascending, and mark discoveries at every
    rank ≤ the largest k with p_k ≤ α·k/m (α=0.1). The step-up
    cutoff — the part naive per-test thresholding gets wrong — is a
    1-row aggregate broadcast back over the |nations| relation; the
    fact table contributes two map-side-combinable moments."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", F.col("o_totalprice").alias("x"))
    )
    gl = joined.agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd"))
    per = joined.groupBy("n_name").agg(
        F.count("*").cast("double").alias("ni"), F.avg("x").alias("mi")
    )
    z = (F.col("mi") - F.col("mu")) / (F.col("sd") / F.sqrt(F.col("ni")))
    scored = per.join(F.broadcast(gl)).select(
        "n_name", F.exp(-F.pow(z, 2) / 2).alias("p")
    )
    ranked = scored.select(
        "n_name",
        "p",
        F.row_number().over(Window.orderBy("p", "n_name")).cast("long").alias("k"),
        F.count("*").over(Window.partitionBy()).cast("double").alias("m"),
    )
    cutoff = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("p") <= 0.1 * F.col("k") / F.col("m"), F.col("k"))),
            F.lit(0).cast("long"),
        ).alias("kmax")
    )
    return ranked.join(F.broadcast(cutoff)).select(
        "n_name",
        F.col("k").alias("p_rank"),
        F.round("p", 6).alias("pseudo_p"),
        (F.col("k") <= F.col("kmax")).alias("discovery"),
    )


@register(
    "flesch_reading_ease",
    oracle=r"""
    WITH scored AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS w,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS DOUBLE) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS DOUBLE) AS y
      FROM documents WHERE lang = 'en'),
    flesch AS (
      SELECT source,
             206.835 - 1.015 * (w / s) - 84.6 * (y / w) AS score,
             w / s AS wps
      FROM scored WHERE w > 0)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(score), 2) AS mean_flesch,
           round(avg(wps), 2) AS mean_words_per_sentence
    FROM flesch GROUP BY source
    """,
    tags=("text", "quality", "readability"),
)
def q_flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring of the English corpus slice:
    206.835 − 1.015·(words/sentence) − 84.6·(syllables/word), with
    syllables approximated by vowel-group counts — the readability
    gate curation pipelines put next to the statistical quality
    scores (cf. quality_score_filter), since grade-level drift is a
    training-mix property worth monitoring per source. Three regexp
    counters per document, all JVM-side codegen; one hash aggregate
    per source — no tokenizer UDF, no Python."""
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    w = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    ).cast("double")
    s = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("double")
    y = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), F.lit(0))
    ).cast("double")
    scored = d.select("source", w.alias("w"), s.alias("s"), y.alias("y")).filter(
        F.col("w") > 0
    )
    flesch = scored.select(
        "source",
        (
            F.lit(206.835)
            - 1.015 * (F.col("w") / F.col("s"))
            - 84.6 * (F.col("y") / F.col("w"))
        ).alias("score"),
        (F.col("w") / F.col("s")).alias("wps"),
    )
    return flesch.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg("score"), 2).alias("mean_flesch"),
        F.round(F.avg("wps"), 2).alias("mean_words_per_sentence"),
    )


@register(
    "page_hinkley_drift",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    gl AS (SELECT avg(x) AS mu, stddev_samp(x) AS sd FROM daily),
    cum AS (
      SELECT d,
             sum(x - mu - 0.005 * mu)
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS m
      FROM daily, gl),
    ph AS (
      SELECT d, m - min(m) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS stat
      FROM cum)
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN stat > 3 * sd THEN 1 ELSE 0 END)
                AS BIGINT) AS n_alarm_days,
           strftime(min(CASE WHEN stat > 3 * sd THEN d END),
                    '%Y-%m-%d') AS first_alarm,
           round(max(stat) / sd, 3) AS peak_stat_sigmas
    FROM ph, gl GROUP BY sd
    """,
    tags=("timeseries", "drift", "window"),
)
def q_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detector on daily revenue: the
    cumulative deviation m_t = Σ(x−μ−δ) minus its running minimum,
    alarmed when the gap exceeds λ=3σ (δ = 0.5% of μ, the magnitude
    floor) — the sequential change detector streaming systems run on
    model metrics (cf. cusum_changepoint, which locates ONE shift;
    PH answers 'has drift started, and when first'). Two stacked
    prefix windows over the |dates| aggregate — the fact table
    contributes a single hash aggregate."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    gl = daily.agg(F.avg("x").alias("mu"), F.stddev_samp("x").alias("sd"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.join(F.broadcast(gl)).select(
        "d",
        "sd",
        F.sum(F.col("x") - F.col("mu") - 0.005 * F.col("mu")).over(wcum).alias("m"),
    )
    ph = cum.select(
        "d", "sd", (F.col("m") - F.min("m").over(wcum)).alias("stat")
    )
    alarm = F.col("stat") > 3 * F.col("sd")
    return ph.groupBy("sd").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(F.when(alarm, 1).otherwise(0)).cast("bigint").alias("n_alarm_days"),
        F.date_format(F.min(F.when(alarm, F.col("d"))), "yyyy-MM-dd").alias(
            "first_alarm"
        ),
        F.round(F.max("stat") / F.first("sd"), 3).alias("peak_stat_sigmas"),
    ).drop("sd")


@register(
    "bollinger_breakouts",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    bands AS (
      SELECT d, x,
             avg(x) OVER w AS m,
             stddev_samp(x) OVER w AS s,
             count(*) OVER w AS nw
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT CAST(year(d) AS BIGINT) AS yr,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN x > m + 2 * s THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above,
           CAST(sum(CASE WHEN x < m - 2 * s THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below
    FROM bands WHERE nw = 20 GROUP BY 1
    """,
    tags=("timeseries", "window", "volatility"),
)
def q_bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout counting per year: 20-day rolling
    mean ± 2 rolling σ, a day outside the band is a volatility
    breakout — the adaptive-threshold anomaly count (the band widens
    in volatile regimes where a fixed ±2σ_global would false-alarm,
    cf. ewma_control_chart's fixed limits). One bounded rows-frame
    window over the |dates| aggregate; warm-up rows (frame count
    < 20) are excluded so the band is always a full-window
    statistic."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    wb = Window.orderBy("d").rowsBetween(-19, 0)
    bands = daily.select(
        "d",
        "x",
        F.avg("x").over(wb).alias("m"),
        F.stddev_samp("x").over(wb).alias("s"),
        F.count("*").over(wb).alias("nw"),
    ).filter(F.col("nw") == 20)
    return bands.groupBy(F.year("d").cast("bigint").alias("yr")).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("x") > F.col("m") + 2 * F.col("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
        F.sum(F.when(F.col("x") < F.col("m") - 2 * F.col("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_below"),
    )


@register(
    "haar_wavelet_energy",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    idx AS (
      SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) - 1 AS i, v
      FROM daily),
    st AS (SELECT avg(v) AS mu, stddev_samp(v) AS sd FROM idx),
    z AS (SELECT i, (v - mu) / sd AS zv FROM idx, st),
    lv AS (SELECT unnest([1, 2, 3, 4]) AS j),
    blocks AS (
      SELECT j, i // CAST(pow(2, j) AS BIGINT) AS blk,
             sum(zv * (1 - 2 * ((i // CAST(pow(2, j - 1) AS BIGINT)) % 2)))
               / pow(2, j) AS dcoef,
             CAST(count(*) AS BIGINT) AS cnt
      FROM z, lv GROUP BY 1, 2),
    energy AS (
      SELECT CAST(j AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_blocks,
             sum(dcoef * dcoef) AS e
      FROM blocks WHERE cnt = CAST(pow(2, j) AS BIGINT) GROUP BY j)
    SELECT level, n_blocks, round(e, 3) AS detail_energy,
           round(e / sum(e) OVER (), 4) AS energy_share
    FROM energy
    """,
    tags=("timeseries", "wavelet", "decomposition"),
)
def q_haar_wavelet_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar multi-resolution energy decomposition of the z-scored
    daily revenue: at level j the detail coefficient of each 2ʲ-day
    block is (first-half mean − second-half mean)/2, written as ONE
    signed sum Σ±z/2ʲ so all four levels come out of a single hash
    aggregate over |dates|×|levels| rows — wavelet analysis with no
    recursion and no sequential cascade. The per-level energy shares
    say which timescale (2/4/8/16 days) carries the variance, the
    multi-scale companion to dft_periodogram's fixed frequencies.
    Incomplete tail blocks are excluded exactly as in the classical
    dyadic transform."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    idx = daily.select(
        (F.row_number().over(Window.orderBy("d")) - 1).cast("long").alias("i"),
        "v",
    )
    st = idx.agg(F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd"))
    z = idx.join(F.broadcast(st)).select(
        "i", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("zv")
    )
    lv = spark.createDataFrame([(1,), (2,), (3,), (4,)], "j int")
    blksz = F.pow(F.lit(2.0), F.col("j")).cast("long")
    halfsz = F.pow(F.lit(2.0), F.col("j") - 1).cast("long")
    sign = 1 - 2 * ((F.col("i") / halfsz).cast("long") % 2)
    blocks = (
        z.crossJoin(F.broadcast(lv))
        .groupBy("j", (F.col("i") / blksz).cast("long").alias("blk"))
        .agg(
            F.sum(F.col("zv") * sign).alias("ssum"),
            F.count("*").cast("bigint").alias("cnt"),
        )
        .select(
            "j",
            "cnt",
            (F.col("ssum") / F.pow(F.lit(2.0), F.col("j"))).alias("dcoef"),
        )
    )
    energy = (
        blocks.filter(F.col("cnt") == F.pow(F.lit(2.0), F.col("j")).cast("long"))
        .groupBy(F.col("j").cast("bigint").alias("level"))
        .agg(
            F.count("*").cast("bigint").alias("n_blocks"),
            F.sum(F.col("dcoef") * F.col("dcoef")).alias("e"),
        )
    )
    return energy.select(
        "level",
        "n_blocks",
        F.round("e", 3).alias("detail_energy"),
        F.round(F.col("e") / F.sum("e").over(Window.partitionBy()), 4).alias(
            "energy_share"
        ),
    )


@register(
    "word_pmi_bigrams",
    oracle="""
    WITH arrs AS (
      SELECT regexp_split_to_array(lower(text), '[^a-z0-9]+') AS ws
      FROM documents WHERE lang = 'en'),
    uni AS (
      SELECT unnest(ws) AS w FROM arrs),
    u AS (
      SELECT w, CAST(count(*) AS DOUBLE) AS cw
      FROM uni WHERE length(w) >= 2 GROUP BY w),
    nu AS (SELECT sum(cw) AS n_uni FROM u),
    bi AS (
      SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
      FROM arrs CROSS JOIN (SELECT unnest(generate_series(1, 4000)) AS i) g
      WHERE i <= len(ws) - 1),
    b AS (
      SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cp
      FROM bi WHERE length(w1) >= 2 AND length(w2) >= 2
      GROUP BY w1, w2 HAVING count(*) >= 5),
    nb AS (SELECT sum(cp) AS n_bi FROM b),
    pmi AS (
      SELECT b.w1, b.w2, CAST(cp AS BIGINT) AS pair_count,
             ln((cp / n_bi) / ((u1.cw / n_uni) * (u2.cw / n_uni))) AS pmi
      FROM b JOIN u u1 ON b.w1 = u1.w
      JOIN u u2 ON b.w2 = u2.w, nu, nb)
    SELECT w1, w2, pair_count, round(pmi, 3) AS pmi
    FROM pmi ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
    tags=("text", "collocation", "join"),
)
def q_word_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent word pairs in the
    English slice — the collocation detector (Church & Hanks) that
    finds phrases worth treating as single tokens before BPE
    training (cf. bpe_pair_counts at the character tier). Bigrams
    are enumerated JVM-side with transform(sequence) over the split
    array — one explode of n−1 pairs, no self-join on positions; a
    min-count floor of 5 kills the unstable low-frequency tail, and
    both marginals come from one unigram aggregate joined back
    twice (broadcast — the vocabulary is tiny next to the corpus)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    arrs = d.select(F.split(F.lower("text"), "[^a-z0-9]+").alias("ws"))
    uni = arrs.select(F.explode("ws").alias("w")).filter(F.length("w") >= 2)
    u = uni.groupBy("w").agg(F.count("*").cast("double").alias("cw"))
    nu = u.agg(F.sum("cw").alias("n_uni"))
    bi = arrs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    b = (
        bi.filter((F.length("w1") >= 2) & (F.length("w2") >= 2))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("cp"))
        .filter(F.col("cp") >= 5)
    )
    nb = b.agg(F.sum("cp").alias("n_bi"))
    pmi = (
        b.join(F.broadcast(u.withColumnRenamed("w", "w1").withColumnRenamed("cw", "c1")), "w1")
        .join(F.broadcast(u.withColumnRenamed("w", "w2").withColumnRenamed("cw", "c2")), "w2")
        .join(F.broadcast(nu))
        .join(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("cp").cast("bigint").alias("pair_count"),
            F.log(
                (F.col("cp") / F.col("n_bi"))
                / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
            ).alias("pmi"),
        )
    )
    return (
        pmi.orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
        .select("w1", "w2", "pair_count", F.round("pmi", 3).alias("pmi"))
    )


@register(
    "topsis_supplier_ranking",
    oracle="""
    WITH crit AS (
      SELECT l_suppkey,
             sum(l_extendedprice * (1 - l_discount)) AS revenue,
             avg(l_discount) AS avg_disc,
             CAST(count(DISTINCT l_partkey) AS DOUBLE) AS breadth
      FROM lineitem GROUP BY l_suppkey),
    norms AS (
      SELECT sqrt(sum(revenue * revenue)) AS nr,
             sqrt(sum(avg_disc * avg_disc)) AS nd,
             sqrt(sum(breadth * breadth)) AS nb
      FROM crit),
    v AS (
      SELECT l_suppkey, revenue / nr AS vr, avg_disc / nd AS vd,
             breadth / nb AS vb
      FROM crit, norms),
    ideal AS (
      SELECT max(vr) AS ir, min(vd) AS id_, max(vb) AS ib,
             min(vr) AS ar, max(vd) AS ad, min(vb) AS ab
      FROM v),
    scored AS (
      SELECT l_suppkey,
             sqrt(pow(vr - ir, 2) + pow(vd - id_, 2) + pow(vb - ib, 2)) AS dplus,
             sqrt(pow(vr - ar, 2) + pow(vd - ad, 2) + pow(vb - ab, 2)) AS dminus
      FROM v, ideal)
    SELECT s_name, round(dminus / (dplus + dminus), 6) AS topsis_score
    FROM scored JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY dminus / (dplus + dminus) DESC, s_name LIMIT 10
    """,
    tags=("ranking", "decision", "agg"),
)
def q_topsis_supplier_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPSIS multi-criteria supplier ranking: three criteria
    (revenue↑, mean discount given↓, part breadth↑) vector-
    normalized, then each supplier scored by closeness
    d⁻/(d⁺+d⁻) to the ideal/anti-ideal corner — the MCDM method
    procurement teams use when 'best supplier' has no single metric.
    One fact-table aggregate builds the criteria matrix
    (|suppliers| rows); the normalizers and ideal points are 1-row
    broadcasts, so the whole decision analysis adds zero extra
    shuffles at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    crit = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.avg("l_discount").alias("avg_disc"),
        F.count_distinct("l_partkey").cast("double").alias("breadth"),
    )
    norms = crit.agg(
        F.sqrt(F.sum(F.col("revenue") * F.col("revenue"))).alias("nr"),
        F.sqrt(F.sum(F.col("avg_disc") * F.col("avg_disc"))).alias("nd"),
        F.sqrt(F.sum(F.col("breadth") * F.col("breadth"))).alias("nb"),
    )
    v = crit.join(F.broadcast(norms)).select(
        "l_suppkey",
        (F.col("revenue") / F.col("nr")).alias("vr"),
        (F.col("avg_disc") / F.col("nd")).alias("vd"),
        (F.col("breadth") / F.col("nb")).alias("vb"),
    )
    ideal = v.agg(
        F.max("vr").alias("ir"), F.min("vd").alias("id_"), F.max("vb").alias("ib"),
        F.min("vr").alias("ar"), F.max("vd").alias("ad"), F.min("vb").alias("ab"),
    )
    sq = lambda c: F.pow(c, 2)
    scored = v.join(F.broadcast(ideal)).select(
        "l_suppkey",
        F.sqrt(
            sq(F.col("vr") - F.col("ir"))
            + sq(F.col("vd") - F.col("id_"))
            + sq(F.col("vb") - F.col("ib"))
        ).alias("dplus"),
        F.sqrt(
            sq(F.col("vr") - F.col("ar"))
            + sq(F.col("vd") - F.col("ad"))
            + sq(F.col("vb") - F.col("ab"))
        ).alias("dminus"),
    )
    score = F.col("dminus") / (F.col("dplus") + F.col("dminus"))
    return (
        scored.join(s, scored["l_suppkey"] == s["s_suppkey"])
        .orderBy(score.desc(), "s_name")
        .limit(10)
        .select("s_name", F.round(score, 6).alias("topsis_score"))
    )


@register(
    "quantile_normalization",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             ntile(100) OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS pct
      FROM documents),
    ref AS (
      SELECT pct, avg(n_chars) AS ref_val FROM ranked GROUP BY pct),
    norm AS (
      SELECT source, n_chars, ref_val
      FROM ranked JOIN ref USING (pct))
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(ref_val - n_chars), 2) AS mean_shift,
           round(avg(abs(ref_val - n_chars)), 2) AS mean_abs_shift
    FROM norm GROUP BY source
    """,
    tags=("stats", "normalization", "window"),
)
def q_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document lengths across sources —
    the bioinformatics-standard batch-effect remover applied to the
    training mix: each source's length distribution is mapped onto
    the pooled percentile profile, so no single crawl's length bias
    survives into the curriculum. ntile(100) within source (a
    per-source sort, partition-parallel), the reference profile is a
    100-row aggregate broadcast back, and the report shows how far
    each source sat from the pooled distribution (mean and mean-
    absolute shift)."""
    d = _t(spark, sf_dir, "documents")
    ranked = d.select(
        "source",
        "n_chars",
        F.ntile(100)
        .over(Window.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("pct"),
    )
    ref = ranked.groupBy("pct").agg(F.avg("n_chars").alias("ref_val"))
    norm = ranked.join(F.broadcast(ref), "pct")
    shift = F.col("ref_val") - F.col("n_chars")
    return norm.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.avg(shift), 2).alias("mean_shift"),
        F.round(F.avg(F.abs(shift)), 2).alias("mean_abs_shift"),
    )


@register(
    "bloom_filter_fpr",
    oracle="""
    WITH seeds AS (SELECT unnest([1, 2, 3]) AS s),
    members AS (SELECT p_partkey AS k FROM part WHERE p_brand = 'Brand#11'),
    probes AS (SELECT p_partkey AS k FROM part WHERE p_brand = 'Brand#22'),
    bits AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(k AS VARCHAR) || '#'
                       || CAST(s AS VARCHAR)), 1, 8))::UBIGINT % 1024 AS bit
      FROM members, seeds),
    probe_bits AS (
      SELECT k, s, ('0x' || substr(md5(CAST(k AS VARCHAR) || '#'
                    || CAST(s AS VARCHAR)), 1, 8))::UBIGINT % 1024 AS bit
      FROM probes, seeds),
    hits AS (
      SELECT pb.k, CAST(count(*) AS BIGINT) AS n_hit
      FROM probe_bits pb JOIN bits ON pb.bit = bits.bit
      GROUP BY pb.k),
    meas AS (
      SELECT (SELECT CAST(count(*) AS DOUBLE) FROM members) AS n,
             (SELECT CAST(count(*) AS DOUBLE) FROM probes) AS np,
             (SELECT CAST(count(*) AS DOUBLE) FROM hits WHERE n_hit = 3) AS fp)
    SELECT CAST(n AS BIGINT) AS n_members,
           CAST(np AS BIGINT) AS n_probes,
           CAST(fp AS BIGINT) AS false_positives,
           round(fp / np, 4) AS measured_fpr,
           round(pow(1 - exp(-3 * n / 1024.0), 3), 4) AS theoretical_fpr
    FROM meas
    """,
    tags=("sketch", "hash", "audit"),
)
def q_bloom_filter_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built and audited relationally: one brand's part
    keys are the member set (k=3 md5-derived hash functions into
    m=1024 bits — the bit array is just DISTINCT bucket ids), a
    disjoint brand probes it, and a probe is a false positive iff
    all three of its bits land in the set — a 3-way hit count via
    one equi-join on bit id. Measured FPR sits next to the
    (1−e^{−kn/m})^k theory bound, the calibration check run before
    trusting a bloom-pruned join at scale (Spark's own
    spark.sql.optimizer.runtime.bloomFilter does exactly this
    pruning); deterministic md5 bits keep both engines bit-for-bit
    identical."""
    p = _t(spark, sf_dir, "part")
    seeds = spark.createDataFrame([(1,), (2,), (3,)], "s int")

    def hbit(key, s):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(key.cast("string"), F.lit("#"), s.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1024
        )

    members = p.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_partkey").alias("k")
    )
    probes = p.filter(F.col("p_brand") == "Brand#22").select(
        F.col("p_partkey").alias("k")
    )
    bits = (
        members.crossJoin(F.broadcast(seeds))
        .select(hbit(F.col("k"), F.col("s")).alias("bit"))
        .distinct()
    )
    probe_bits = probes.crossJoin(F.broadcast(seeds)).select(
        "k", hbit(F.col("k"), F.col("s")).alias("bit")
    )
    hits = (
        probe_bits.join(bits, "bit")
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n_hit"))
    )
    meas = (
        members.agg(F.count("*").cast("double").alias("n"))
        .crossJoin(probes.agg(F.count("*").cast("double").alias("np")))
        .crossJoin(
            hits.filter(F.col("n_hit") == 3).agg(
                F.count("*").cast("double").alias("fp")
            )
        )
    )
    return meas.select(
        F.col("n").cast("bigint").alias("n_members"),
        F.col("np").cast("bigint").alias("n_probes"),
        F.col("fp").cast("bigint").alias("false_positives"),
        F.round(F.col("fp") / F.col("np"), 4).alias("measured_fpr"),
        F.round(
            F.pow(1 - F.exp(-3 * F.col("n") / F.lit(1024.0)), 3), 4
        ).alias("theoretical_fpr"),
    )


@register(
    "second_price_auction",
    oracle="""
    WITH bids AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey),
    ranked AS (
      SELECT l_partkey, unit_price,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY unit_price, l_suppkey) AS rk
      FROM bids),
    auctions AS (
      SELECT a.l_partkey, a.unit_price AS best, b.unit_price AS second
      FROM ranked a JOIN ranked b
        ON a.l_partkey = b.l_partkey AND a.rk = 1 AND b.rk = 2)
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_auctions,
           round(avg(second / best), 4) AS mean_price_ratio,
           round(avg(second - best), 4) AS mean_clearing_premium
    FROM auctions JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("window", "auction", "join"),
)
def q_second_price_auction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-price (Vickrey) clearing analysis: per part, suppliers
    'bid' their best observed unit price, the winner pays the
    runner-up's bid — mean second/first ratio per brand measures how
    competitive each segment's supply is (ratio→1 = thick market,
    the procurement-side twin of min_cost_supplier which only finds
    the winner). Per-part ranking is partition-parallel (window
    keyed on partkey, never global); rank-1 and rank-2 meet in a
    self-equi-join on the already-tiny ranked relation."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bids = (
        li.filter(F.col("l_quantity") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    ranked = bids.select(
        "l_partkey",
        "unit_price",
        F.row_number()
        .over(Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey"))
        .alias("rk"),
    )
    a = ranked.filter(F.col("rk") == 1).select(
        "l_partkey", F.col("unit_price").alias("best")
    )
    b = ranked.filter(F.col("rk") == 2).select(
        "l_partkey", F.col("unit_price").alias("second")
    )
    auctions = a.join(b, "l_partkey")
    return (
        auctions.join(p, auctions["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_auctions"),
            F.round(F.avg(F.col("second") / F.col("best")), 4).alias(
                "mean_price_ratio"
            ),
            F.round(F.avg(F.col("second") - F.col("best")), 4).alias(
                "mean_clearing_premium"
            ),
        )
    )


@register(
    "rolling_beta",
    oracle="""
    WITH g AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    nat AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name = 'GERMANY' GROUP BY 1),
    series AS (
      SELECT g.d, g.x, coalesce(nat.y, 0) AS y
      FROM g LEFT JOIN nat ON g.d = nat.d),
    win AS (
      SELECT d, count(*) OVER w AS n,
             sum(x * y) OVER w AS sxy, sum(x) OVER w AS sx,
             sum(y) OVER w AS sy, sum(x * x) OVER w AS sxx
      FROM series
      WINDOW w AS (ORDER BY d ROWS BETWEEN 89 PRECEDING AND CURRENT ROW)),
    beta AS (
      SELECT d, (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b
      FROM win WHERE n = 90)
    SELECT CAST(year(d) AS BIGINT) AS yr,
           CAST(quarter(d) AS BIGINT) AS qtr,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(b), 4) AS mean_beta
    FROM beta GROUP BY 1, 2
    """,
    tags=("timeseries", "regression", "window"),
)
def q_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 90-day beta of one nation's revenue against the
    global daily series — cov/var from the five windowed sums
    (Σxy, Σx, Σy, Σx², n), the finance-style exposure measure
    applied to revenue concentration: β>1 quarters are when the
    nation amplifies global swings. The left join densifies the
    nation series with zero-fill so quiet days depress β instead of
    silently shrinking the window; all five sums share ONE window
    frame over the |dates| aggregate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    g = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    nat = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n.filter(F.col("n_name") == "GERMANY")),
              c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    series = g.join(nat, "d", "left").select(
        "d", "x", F.coalesce("y", F.lit(0.0)).alias("y")
    )
    w = Window.orderBy("d").rowsBetween(-89, 0)
    win = series.select(
        "d",
        F.count("*").over(w).alias("n"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
    ).filter(F.col("n") == 90)
    beta = win.select(
        "d",
        (
            (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
            / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        ).alias("b"),
    )
    return beta.groupBy(
        F.year("d").cast("bigint").alias("yr"),
        F.quarter("d").cast("bigint").alias("qtr"),
    ).agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.round(F.avg("b"), 4).alias("mean_beta"),
    )


@register(
    "lagged_cross_correlation",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE event_type = 'click' GROUP BY 1),
    p AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
    shifted AS (
      SELECT lag, c.d + CAST(lag AS INT) AS dj, x
      FROM c CROSS JOIN lags)
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n_days,
           round(corr(y, x), 4) AS xcorr
    FROM shifted JOIN p ON p.d = shifted.dj
    GROUP BY lag
    """,
    tags=("events", "timeseries", "correlation"),
)
def q_lagged_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the click and purchase daily
    series: corr(clicks_{t−k}, purchases_t) for k = 0..7 — the
    lead-lag screen behind 'do clicks predict purchases, and with
    what delay' (the Granger-causality precursor; the argmax lag is
    the conversion latency). Each lag is the SAME daily aggregate
    joined at a date offset — one |dates|×8 shifted relation, one
    corr aggregate per lag, zero fact-table re-scans."""
    e = _t(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("x"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    lags = spark.createDataFrame([(i,) for i in range(8)], "lag int")
    shifted = c.crossJoin(F.broadcast(lags)).select(
        "lag", F.date_add(F.col("d"), F.col("lag")).alias("dj"), "x"
    )
    return (
        shifted.join(p, shifted["dj"] == p["d"])
        .groupBy(F.col("lag").cast("bigint").alias("lag"))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.corr("y", "x"), 4).alias("xcorr"),
        )
    )


@register(
    "pca_power_iteration",
    oracle="""
    WITH dims AS (
      SELECT vec_id, CAST(i AS INT) - 1 AS d,
             embedding[CAST(i AS INT)]::DOUBLE AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    mu AS (SELECT d, avg(x) AS m, CAST(count(*) AS DOUBLE) AS n
           FROM dims GROUP BY d),
    raw AS (
      SELECT a.d AS i, b.d AS j, sum(a.x * b.x) AS sxy
      FROM dims a JOIN dims b USING (vec_id) GROUP BY 1, 2),
    cov AS (
      SELECT i, j, (sxy - mi.n * mi.m * mj.m) / (mi.n - 1) AS c
      FROM raw JOIN mu mi ON raw.i = mi.d JOIN mu mj ON raw.j = mj.d),
    v1 AS (SELECT i, sum(c) AS v FROM cov GROUP BY i),
    v2 AS (SELECT cov.i AS i, sum(c * v1.v) AS v
           FROM cov JOIN v1 ON cov.j = v1.i GROUP BY cov.i),
    v3 AS (SELECT cov.i AS i, sum(c * v2.v) AS v
           FROM cov JOIN v2 ON cov.j = v2.i GROUP BY cov.i),
    v4 AS (SELECT cov.i AS i, sum(c * v3.v) AS v
           FROM cov JOIN v3 ON cov.j = v3.i GROUP BY cov.i),
    lam AS (
      SELECT sum(v3.v * v4.v) / sum(v3.v * v3.v) AS lambda1
      FROM v3 JOIN v4 ON v3.i = v4.i),
    tr AS (SELECT sum(c) AS trace FROM cov WHERE i = j)
    SELECT CAST(64 AS BIGINT) AS n_dims,
           round(lambda1, 4) AS lambda1,
           round(lambda1 / trace, 4) AS explained_share
    FROM lam, tr
    """,
    tags=("ml", "embeddings", "iterative"),
)
def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by THREE
    unrolled power-iteration steps, entirely in the engine: the
    64×64 covariance matrix is one self-join-and-aggregate over the
    exploded (vec_id, dim, value) relation, each iteration is a
    4096-row matvec (join on the shared dim + re-aggregate), and
    λ₁ comes from the Rayleigh quotient v·Cv/v·v — no driver-side
    linear algebra, no collect. The only fact-sized work is the one
    covariance aggregate (n·d² products, map-side combined);
    explained-variance share λ₁/tr(C) is the embedding-collapse
    diagnostic (a share near 1 means the representation degenerated
    to one axis — cf. top_dim_share's per-dim variance view)."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select("vec_id", "d", F.col("x").cast("double").alias("x"))
    mu = dims.groupBy("d").agg(
        F.avg("x").alias("m"), F.count("*").cast("double").alias("n")
    )
    a = dims.select("vec_id", F.col("d").alias("i"), F.col("x").alias("xa"))
    bb = dims.select("vec_id", F.col("d").alias("j"), F.col("x").alias("xb"))
    raw = (
        a.join(bb, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("sxy"))
    )
    mi = mu.select(F.col("d").alias("i"), F.col("m").alias("m_i"), "n")
    mj = mu.select(F.col("d").alias("j"), F.col("m").alias("m_j"))
    cov = (
        raw.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                (F.col("sxy") - F.col("n") * F.col("m_i") * F.col("m_j"))
                / (F.col("n") - 1)
            ).alias("c"),
        )
    )

    def matvec(v):
        vr = v.select(F.col("i").alias("j"), F.col("v").alias("vj"))
        return (
            cov.join(F.broadcast(vr), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vj")).alias("v"))
        )

    v1 = cov.groupBy("i").agg(F.sum("c").alias("v"))
    v2 = matvec(v1)
    v3 = matvec(v2)
    v4 = matvec(v3)
    lam = (
        v3.select("i", F.col("v").alias("v3"))
        .join(v4.select("i", F.col("v").alias("v4")), "i")
        .agg(
            (F.sum(F.col("v3") * F.col("v4")) / F.sum(F.col("v3") * F.col("v3"))).alias(
                "lambda1"
            )
        )
    )
    tr = cov.filter(F.col("i") == F.col("j")).agg(F.sum("c").alias("trace"))
    return lam.crossJoin(F.broadcast(tr)).select(
        F.lit(64).cast("bigint").alias("n_dims"),
        F.round("lambda1", 4).alias("lambda1"),
        F.round(F.col("lambda1") / F.col("trace"), 4).alias("explained_share"),
    )


@register(
    "burrows_delta",
    oracle="""
    WITH ws AS (
      SELECT source, w
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
            FROM documents WHERE lang = 'en')
      WHERE length(w) >= 1),
    top AS (
      SELECT w FROM ws GROUP BY w ORDER BY count(*) DESC, w LIMIT 20),
    src_tot AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS tot FROM ws GROUP BY source),
    counts AS (
      SELECT source, w, CAST(count(*) AS DOUBLE) AS cnt
      FROM ws WHERE w IN (SELECT w FROM top) GROUP BY 1, 2),
    grid AS (SELECT source, tot, w FROM src_tot CROSS JOIN top),
    f AS (
      SELECT grid.source, grid.w, coalesce(cnt, 0) / tot AS fr
      FROM grid LEFT JOIN counts
        ON grid.source = counts.source AND grid.w = counts.w),
    z AS (
      SELECT source, w,
             (fr - avg(fr) OVER (PARTITION BY w))
               / stddev_samp(fr) OVER (PARTITION BY w) AS z
      FROM f),
    delta AS (
      SELECT a.source AS s1, b.source AS s2,
             avg(abs(a.z - b.z)) AS delta
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2)
    SELECT s1, s2, round(delta, 4) AS delta
    FROM delta ORDER BY delta, s1, s2 LIMIT 15
    """,
    tags=("text", "stylometry", "window"),
)
def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometry between sources: z-score each
    source's relative frequency of the 20 most common words against
    the cross-source distribution, Delta(s₁,s₂) = mean |z₁−z₂| —
    the authorship-attribution distance applied as a corpus
    diagnostic (two 'independent' crawls with near-zero Delta are
    probably the same upstream content farm, a dedup signal whole-
    document hashing misses). The function-word profile is a
    |sources|×20 grid densified by a tiny cross join with zero-fill
    — absent words carry stylistic signal too; the 15 most similar
    pairs surface."""
    d = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    ws = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") >= 1)
    top = (
        ws.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(20)
        .select("w")
    )
    src_tot = ws.groupBy("source").agg(F.count("*").cast("double").alias("tot"))
    counts = (
        ws.join(F.broadcast(top), "w")
        .groupBy("source", "w")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    grid = src_tot.crossJoin(F.broadcast(top))
    f = grid.join(counts, ["source", "w"], "left").select(
        "source", "w", (F.coalesce("cnt", F.lit(0.0)) / F.col("tot")).alias("fr")
    )
    wz = Window.partitionBy("w")
    z = f.select(
        "source",
        "w",
        (
            (F.col("fr") - F.avg("fr").over(wz)) / F.stddev_samp("fr").over(wz)
        ).alias("z"),
    )
    a = z.select(F.col("source").alias("s1"), "w", F.col("z").alias("z1"))
    b = z.select(F.col("source").alias("s2"), "w", F.col("z").alias("z2"))
    delta = (
        a.join(b, "w")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.avg(F.abs(F.col("z1") - F.col("z2"))).alias("delta"))
    )
    return (
        delta.orderBy("delta", "s1", "s2")
        .limit(15)
        .select("s1", "s2", F.round("delta", 4).alias("delta"))
    )


@register(
    "ks_price_drift",
    oracle="""
    WITH a AS (SELECT p_retailprice AS v FROM part WHERE p_brand = 'Brand#11'),
    b AS (SELECT p_retailprice AS v FROM part WHERE p_brand = 'Brand#22'),
    na AS (SELECT CAST(count(*) AS DOUBLE) AS n1 FROM a),
    nb AS (SELECT CAST(count(*) AS DOUBLE) AS n2 FROM b),
    merged AS (
      SELECT v, sum(ca) AS ca, sum(cb) AS cb
      FROM (SELECT v, 1.0 AS ca, 0.0 AS cb FROM a
            UNION ALL SELECT v, 0.0, 1.0 FROM b)
      GROUP BY v),
    cum AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v) AS cca,
             sum(cb) OVER (ORDER BY v) AS ccb
      FROM merged)
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           round(max(abs(cca / n1 - ccb / n2)), 6) AS d_stat,
           round(sqrt(n1 * n2 / (n1 + n2))
                 * max(abs(cca / n1 - ccb / n2)), 4) AS ks_stat
    FROM cum, na, nb GROUP BY n1, n2
    """,
    tags=("stats", "nonparametric", "distribution-fit"),
)
def q_ks_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between two brands'
    retail-price distributions: D = sup|F₁−F₂| over the merged value
    domain, with the √(n₁n₂/(n₁+n₂))·D normalization — the
    distribution-drift test run between data slices (the two-sample
    twin of ks_uniformity_audit's one-sample check). Both ECDFs come
    from ONE union + value-level aggregate; the sup runs as a window
    over the distinct-value relation, which is histogram-sized, not
    row-sized — the formulation that survives when each sample is
    billions of rows."""
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_retailprice").alias("v"),
        F.lit(1.0).alias("ca"),
        F.lit(0.0).alias("cb"),
    )
    b = p.filter(F.col("p_brand") == "Brand#22").select(
        F.col("p_retailprice").alias("v"),
        F.lit(0.0).alias("ca"),
        F.lit(1.0).alias("cb"),
    )
    merged = (
        a.unionAll(b)
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    na = a.agg(F.sum("ca").alias("n1"))
    nb = b.agg(F.sum("cb").alias("n2"))
    wv = Window.orderBy("v")
    cum = merged.select(
        "v",
        F.sum("ca").over(wv).alias("cca"),
        F.sum("cb").over(wv).alias("ccb"),
    )
    gap = F.abs(F.col("cca") / F.col("n1") - F.col("ccb") / F.col("n2"))
    return (
        cum.join(F.broadcast(na))
        .join(F.broadcast(nb))
        .groupBy("n1", "n2")
        .agg(
            F.round(F.max(gap), 6).alias("d_stat"),
            F.round(
                F.sqrt(F.first("n1") * F.first("n2") / (F.first("n1") + F.first("n2")))
                * F.max(gap),
                4,
            ).alias("ks_stat"),
        )
        .select(
            F.col("n1").cast("bigint").alias("n_a"),
            F.col("n2").cast("bigint").alias("n_b"),
            "d_stat",
            "ks_stat",
        )
    )


@register(
    "eoq_batch_sizing",
    oracle="""
    WITH yrs AS (
      SELECT CAST(count(DISTINCT year(CAST(l_shipdate AS DATE))) AS DOUBLE)
             AS ny
      FROM lineitem),
    dem AS (
      SELECT p_brand, CAST(sum(l_quantity) AS DOUBLE) AS q
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1)
    SELECT p_brand,
           round(q / ny, 2) AS annual_demand,
           round(sqrt(2 * (q / ny) * 100 / 2.0), 2) AS eoq,
           round((q / ny) / sqrt(2 * (q / ny) * 100 / 2.0), 2)
             AS orders_per_year
    FROM dem, yrs
    """,
    tags=("inventory", "economics", "agg"),
)
def q_eoq_batch_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per brand: EOQ = √(2DS/H) with order
    cost S=100 and annual holding cost H=2 per unit — the classic
    lot-sizing square-root law, the deterministic companion to
    newsvendor_quantile's stochastic fractile (EOQ sets the batch
    SIZE, the fractile sets the safety STOCK). Annualized demand
    divides by the observed year span so the answer is scale-factor
    invariant; one fact aggregate, one 1-row broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    yrs = li.agg(
        F.count_distinct(F.year(F.col("l_shipdate").cast("date")))
        .cast("double")
        .alias("ny")
    )
    dem = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").cast("double").alias("q"))
    )
    ad = F.col("q") / F.col("ny")
    eoq = F.sqrt(2 * ad * 100 / 2.0)
    return dem.join(F.broadcast(yrs)).select(
        "p_brand",
        F.round(ad, 2).alias("annual_demand"),
        F.round(eoq, 2).alias("eoq"),
        F.round(ad / eoq, 2).alias("orders_per_year"),
    )


@register(
    "brier_calibration",
    oracle="""
    WITH dims AS (
      SELECT vec_id, CAST(i AS INT) AS pos,
             embedding[CAST(i AS INT)]::DOUBLE AS v, label
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    cent AS (SELECT pos, avg(v) AS cv FROM dims WHERE label = 0 GROUP BY pos),
    dots AS (
      SELECT d.vec_id, any_value(d.label) AS label,
             sum(d.v * c.cv) AS dot, sqrt(sum(d.v * d.v)) AS na
      FROM dims d JOIN cent c ON d.pos = c.pos GROUP BY d.vec_id),
    nc AS (SELECT sqrt(sum(cv * cv)) AS ncn FROM cent),
    scored AS (
      SELECT vec_id, label, (1 + dot / (na * ncn)) / 2 AS p
      FROM dots, nc),
    binned AS (
      SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, p,
             CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
      FROM scored)
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 4) AS mean_pred,
           round(avg(y), 4) AS frac_pos,
           round(avg((p - y) * (p - y)), 4) AS brier
    FROM binned GROUP BY bin
    """,
    tags=("ml", "eval", "calibration"),
)
def q_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Brier score for a one-vs-rest
    embedding classifier: pseudo-probability p = (1+cos(x, c₀))/2
    against the label-0 centroid, binned into deciles — per bin the
    mean prediction vs the observed positive rate IS the calibration
    curve, and the binned Brier decomposes the classifier-eval
    picture auc_rank_sum's threshold-free view cannot show
    (discrimination ≠ calibration). Centroid is a 64-row broadcast;
    scores are one aggregate over the exploded dims; no Python."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", "pos", F.col("v").cast("double").alias("v"))
    cent = dims.filter(F.col("label") == 0).groupBy("pos").agg(
        F.avg("v").alias("cv")
    )
    dots = (
        dims.join(F.broadcast(cent), "pos")
        .groupBy("vec_id")
        .agg(
            F.first("label").alias("label"),
            F.sum(F.col("v") * F.col("cv")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("na"),
        )
    )
    nc = cent.agg(F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("ncn"))
    scored = dots.join(F.broadcast(nc)).select(
        "label",
        ((1 + F.col("dot") / (F.col("na") * F.col("ncn"))) / 2).alias("p"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "bin"
        ),
        "p",
        F.when(F.col("label") == 0, 1.0).otherwise(0.0).alias("y"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("p"), 4).alias("mean_pred"),
        F.round(F.avg("y"), 4).alias("frac_pos"),
        F.round(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))), 4).alias(
            "brier"
        ),
    )


@register(
    "theil_inequality_decomposition",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_nationkey, sum(o_totalprice) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    gl AS (SELECT avg(x) AS mu, CAST(count(*) AS DOUBLE) AS n FROM cust),
    gs AS (
      SELECT c_nationkey, avg(x) AS mug, CAST(count(*) AS DOUBLE) AS ng
      FROM cust GROUP BY 1),
    tg AS (
      SELECT g.c_nationkey, any_value(g.mug) AS mug, any_value(g.ng) AS ng,
             sum((c.x / g.mug) * ln(c.x / g.mug)) / any_value(g.ng) AS t_g
      FROM cust c JOIN gs g USING (c_nationkey) GROUP BY g.c_nationkey),
    tot AS (
      SELECT sum((x / mu) * ln(x / mu)) / n AS t_total
      FROM cust, gl GROUP BY n),
    dec AS (
      SELECT sum((ng * mug / (n * mu)) * ln(mug / mu)) AS t_between,
             sum((ng * mug / (n * mu)) * t_g) AS t_within
      FROM tg, gl GROUP BY n, mu)
    SELECT round(t_total, 6) AS t_total,
           round(t_between, 6) AS t_between,
           round(t_within, 6) AS t_within,
           round(t_total - t_between - t_within, 6) AS identity_gap
    FROM tot, dec
    """,
    tags=("inequality", "stats", "decomposition"),
)
def q_theil_inequality_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of customer revenue, exactly decomposed
    into between-nation + within-nation components — the property
    that makes Theil the inequality measure for drill-downs (Gini,
    gini_concentration, does NOT decompose additively): T =
    Σ s_g·ln(μ_g/μ) + Σ s_g·T_g with revenue shares s_g. The
    identity_gap column re-derives T−(between+within) and must be
    exactly 0.000000 in BOTH engines — a built-in cross-engine
    algebra check. One fact aggregate to per-customer totals, one
    group-stats pass, all reductions map-side combinable."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cust = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    gl = cust.agg(
        F.avg("x").alias("mu"), F.count("*").cast("double").alias("n")
    )
    gs = cust.groupBy("c_nationkey").agg(
        F.avg("x").alias("mug"), F.count("*").cast("double").alias("ng")
    )
    tg = (
        cust.join(F.broadcast(gs), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(
            F.first("mug").alias("mug"),
            F.first("ng").alias("ng"),
            (
                F.sum((F.col("x") / F.col("mug")) * F.log(F.col("x") / F.col("mug")))
                / F.first("ng")
            ).alias("t_g"),
        )
    )
    tot = cust.join(F.broadcast(gl)).groupBy("n").agg(
        (F.sum((F.col("x") / F.col("mu")) * F.log(F.col("x") / F.col("mu"))) / F.col("n")).alias(
            "t_total"
        )
    )
    share = F.col("ng") * F.col("mug") / (F.col("n") * F.col("mu"))
    dec = tg.join(F.broadcast(gl)).groupBy("n", "mu").agg(
        F.sum(share * F.log(F.col("mug") / F.col("mu"))).alias("t_between"),
        F.sum(share * F.col("t_g")).alias("t_within"),
    )
    return tot.crossJoin(F.broadcast(dec.drop("n", "mu"))).select(
        F.round("t_total", 6).alias("t_total"),
        F.round("t_between", 6).alias("t_between"),
        F.round("t_within", 6).alias("t_within"),
        F.round(
            F.col("t_total") - F.col("t_between") - F.col("t_within"), 6
        ).alias("identity_gap"),
    )


@register(
    "silhouette_by_label",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
             1 - list_sum(list_transform(generate_series(1, 64),
                          k -> a.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                     k -> a.embedding[k]::DOUBLE * a.embedding[k]::DOUBLE)))
              * sqrt(list_sum(list_transform(generate_series(1, 64),
                     k -> b.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE))))
               AS dist
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
    m AS (
      SELECT i, li, lj, avg(dist) AS md
      FROM pairs GROUP BY 1, 2, 3),
    ab AS (
      SELECT i, li,
             max(CASE WHEN lj = li THEN md END) AS a,
             min(CASE WHEN lj <> li THEN md END) AS b
      FROM m GROUP BY 1, 2),
    s AS (
      SELECT li, (b - a) / greatest(a, b) AS sil
      FROM ab WHERE a IS NOT NULL AND b IS NOT NULL)
    SELECT CAST(li AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg(sil), 4) AS mean_silhouette
    FROM s GROUP BY li
    """,
    tags=("ml", "clustering", "embeddings"),
)
def q_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silhouette coefficient per label over cosine distance — the
    cluster-quality score that says whether the labels are real
    geometric clusters (s→1) or arbitrary partitions (s≈0,
    complementing centroid_classify's accuracy view): a(i) = mean
    distance to own label (self excluded), b(i) = nearest other
    label's mean distance, s = (b−a)/max(a,b). Distances come from
    one dot-product aggregate over the exploded dims relation (the
    same join shape as pca_power_iteration's covariance, keyed on
    vec pairs); per-(vector, label) means are a second hash
    aggregate — no UDF, no driver loop. At 100 TB the pair join is
    the LSH-bucketed candidate set, not the full cross product."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", "pos", F.col("v").cast("double").alias("v"))
    na = dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    a = (
        dims.join(na, "vec_id")
        .select(
            F.col("vec_id").alias("i"),
            F.col("label").alias("li"),
            "pos",
            (F.col("v") / F.col("nrm")).alias("va"),
        )
    )
    b = (
        dims.join(na, "vec_id")
        .select(
            F.col("vec_id").alias("j"),
            F.col("label").alias("lj"),
            "pos",
            (F.col("v") / F.col("nrm")).alias("vb"),
        )
    )
    pairs = (
        a.join(b, "pos")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "li", "j", "lj")
        .agg((1 - F.sum(F.col("va") * F.col("vb"))).alias("dist"))
    )
    m = pairs.groupBy("i", "li", "lj").agg(F.avg("dist").alias("md"))
    ab = m.groupBy("i", "li").agg(
        F.max(F.when(F.col("lj") == F.col("li"), F.col("md"))).alias("a"),
        F.min(F.when(F.col("lj") != F.col("li"), F.col("md"))).alias("b"),
    )
    s = ab.filter(F.col("a").isNotNull() & F.col("b").isNotNull()).select(
        "li",
        ((F.col("b") - F.col("a")) / F.greatest("a", "b")).alias("sil"),
    )
    return s.groupBy(F.col("li").cast("bigint").alias("label")).agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.avg("sil"), 4).alias("mean_silhouette"),
    )


@register(
    "mrr_waterfall",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS cust, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             sum(o_totalprice) AS r
      FROM orders GROUP BY 1, 2),
    maxm AS (SELECT max(m) AS mx FROM rev),
    shifted AS (
      SELECT cust, m + INTERVAL 1 MONTH AS m, r AS prev_r FROM rev),
    merged AS (
      SELECT coalesce(a.cust, b.cust) AS cust,
             coalesce(a.m, b.m) AS m,
             coalesce(a.r, 0) AS cur_r, coalesce(b.prev_r, 0) AS prev_r
      FROM rev a FULL OUTER JOIN shifted b
        ON a.cust = b.cust AND a.m = b.m)
    SELECT strftime(m, '%Y-%m') AS month,
           round(sum(CASE WHEN prev_r = 0 THEN cur_r ELSE 0 END), 2) AS new_mrr,
           round(sum(CASE WHEN prev_r > 0 AND cur_r > prev_r
                          THEN cur_r - prev_r ELSE 0 END), 2) AS expansion,
           round(sum(CASE WHEN cur_r > 0 AND cur_r < prev_r
                          THEN prev_r - cur_r ELSE 0 END), 2) AS contraction,
           round(sum(CASE WHEN cur_r = 0 THEN prev_r ELSE 0 END), 2) AS churned
    FROM merged, maxm
    WHERE m <= mx AND m > (SELECT min(m) FROM rev)
    GROUP BY 1
    """,
    tags=("saas", "cohort", "outer"),
)
def q_mrr_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR movement waterfall: month-over-month per-customer revenue
    classified into new / expansion / contraction / churned — the
    revenue-bridge decomposition under net_revenue_retention's
    single ratio (NRR tells you THAT revenue retained; the waterfall
    says WHO moved it). The month-over-month pairing is a full outer
    self-join of the (customer, month) aggregate against itself
    shifted one month — churn rows exist ONLY because of the outer
    side, the classic gotcha an inner-join formulation silently
    drops; the phantom month past the series end is clipped by the
    broadcast max-month bound."""
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy(
        F.col("o_custkey").alias("cust"),
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
    ).agg(F.sum("o_totalprice").alias("r"))
    bounds = rev.agg(F.max("m").alias("mx"), F.min("m").alias("mn"))
    shifted = rev.select(
        "cust", F.add_months(F.col("m"), 1).cast("timestamp").alias("m"),
        F.col("r").alias("prev_r"),
    )
    cur = rev.select("cust", "m", F.col("r").alias("cur_r"))
    merged = (
        cur.join(shifted, ["cust", "m"], "full_outer")
        .select(
            "m",
            F.coalesce("cur_r", F.lit(0.0)).alias("cur_r"),
            F.coalesce("prev_r", F.lit(0.0)).alias("prev_r"),
        )
    )
    clipped = merged.join(F.broadcast(bounds)).filter(
        (F.col("m") <= F.col("mx")) & (F.col("m") > F.col("mn"))
    )
    return clipped.groupBy(F.date_format("m", "yyyy-MM").alias("month")).agg(
        F.round(
            F.sum(F.when(F.col("prev_r") == 0, F.col("cur_r")).otherwise(0.0)), 2
        ).alias("new_mrr"),
        F.round(
            F.sum(
                F.when(
                    (F.col("prev_r") > 0) & (F.col("cur_r") > F.col("prev_r")),
                    F.col("cur_r") - F.col("prev_r"),
                ).otherwise(0.0)
            ),
            2,
        ).alias("expansion"),
        F.round(
            F.sum(
                F.when(
                    (F.col("cur_r") > 0) & (F.col("cur_r") < F.col("prev_r")),
                    F.col("prev_r") - F.col("cur_r"),
                ).otherwise(0.0)
            ),
            2,
        ).alias("contraction"),
        F.round(
            F.sum(F.when(F.col("cur_r") == 0, F.col("prev_r")).otherwise(0.0)), 2
        ).alias("churned"),
    )


@register(
    "price_volume_mix",
    oracle="""
    WITH py AS (
      SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS yr,
             sum(l_extendedprice) / sum(l_quantity) AS p,
             CAST(sum(l_quantity) AS DOUBLE) AS q
      FROM lineitem
      WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)
        AND l_quantity > 0
      GROUP BY 1, 2),
    y0 AS (SELECT l_partkey, p AS p0, q AS q0 FROM py WHERE yr = 1996),
    y1 AS (SELECT l_partkey, p AS p1, q AS q1 FROM py WHERE yr = 1997),
    common AS (
      SELECT y0.l_partkey,
             (p1 - p0) * q0 AS price_eff,
             (q1 - q0) * p0 AS volume_eff,
             (p1 - p0) * (q1 - q0) AS mix_eff
      FROM y0 JOIN y1 USING (l_partkey)),
    solo AS (
      SELECT coalesce(sum(CASE WHEN y0.l_partkey IS NULL THEN p1 * q1 END), 0)
             - coalesce(sum(CASE WHEN y1.l_partkey IS NULL THEN p0 * q0 END), 0)
               AS net_new
      FROM y0 FULL OUTER JOIN y1 USING (l_partkey)
      WHERE y0.l_partkey IS NULL OR y1.l_partkey IS NULL),
    eff AS (
      SELECT sum(price_eff) AS pe, sum(volume_eff) AS ve, sum(mix_eff) AS me
      FROM common)
    SELECT round(pe, 2) AS price_effect,
           round(ve, 2) AS volume_effect,
           round(me, 2) AS mix_effect,
           round(net_new, 2) AS net_new_effect,
           round(pe + ve + me + net_new, 2) AS total_change
    FROM eff, solo
    """,
    tags=("economics", "decomposition", "outer-join"),
)
def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge for the 1996→1997 revenue change:
    ΔRev = Σ(Δp·q₀) + Σ(Δq·p₀) + Σ(Δp·Δq) over parts sold both
    years, plus the net-new term for parts that entered or exited —
    the FP&A variance-analysis decomposition, with total_change
    re-assembled from the four effects so the identity is checked
    in both engines. Per-(part, year) price/quantity is one fact
    aggregate; the two years meet in a part-keyed join (inner for
    the common decomposition, full outer for entry/exit — the rows
    an inner-only formulation loses)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.year(F.col("l_shipdate").cast("date")).isin(1996, 1997))
        & (F.col("l_quantity") > 0)
    )
    py = li.groupBy(
        "l_partkey", F.year(F.col("l_shipdate").cast("date")).alias("yr")
    ).agg(
        (F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"),
        F.sum("l_quantity").cast("double").alias("q"),
    )
    y0 = py.filter(F.col("yr") == 1996).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    y1 = py.filter(F.col("yr") == 1997).select(
        "l_partkey", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    common = y0.join(y1, "l_partkey").select(
        ((F.col("p1") - F.col("p0")) * F.col("q0")).alias("price_eff"),
        ((F.col("q1") - F.col("q0")) * F.col("p0")).alias("volume_eff"),
        ((F.col("p1") - F.col("p0")) * (F.col("q1") - F.col("q0"))).alias("mix_eff"),
    )
    outer = y0.join(y1, "l_partkey", "full_outer")
    solo = outer.filter(
        F.col("p0").isNull() | F.col("p1").isNull()
    ).agg(
        (
            F.coalesce(
                F.sum(F.when(F.col("p0").isNull(), F.col("p1") * F.col("q1"))),
                F.lit(0.0),
            )
            - F.coalesce(
                F.sum(F.when(F.col("p1").isNull(), F.col("p0") * F.col("q0"))),
                F.lit(0.0),
            )
        ).alias("net_new")
    )
    eff = common.agg(
        F.sum("price_eff").alias("pe"),
        F.sum("volume_eff").alias("ve"),
        F.sum("mix_eff").alias("me"),
    )
    return eff.crossJoin(F.broadcast(solo)).select(
        F.round("pe", 2).alias("price_effect"),
        F.round("ve", 2).alias("volume_effect"),
        F.round("me", 2).alias("mix_effect"),
        F.round("net_new", 2).alias("net_new_effect"),
        F.round(
            F.col("pe") + F.col("ve") + F.col("me") + F.col("net_new"), 2
        ).alias("total_change"),
    )


@register(
    "tukey_fences_outliers",
    oracle="""
    WITH fences AS (
      SELECT p_brand,
             CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS q1,
             CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS q3
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand),
    flagged AS (
      SELECT f.p_brand,
             CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1) THEN 1 ELSE 0 END AS lo,
             CASE WHEN l_extendedprice > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END AS hi
      FROM lineitem JOIN part ON l_partkey = p_partkey
      JOIN fences f ON part.p_brand = f.p_brand)
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(lo) AS BIGINT) AS n_low,
           CAST(sum(hi) AS BIGINT) AS n_high,
           round((sum(lo) + sum(hi)) / CAST(count(*) AS DOUBLE), 5)
             AS outlier_rate
    FROM flagged GROUP BY p_brand
    """,
    tags=("stats", "quality", "percentile"),
)
def q_tukey_fences_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier audit per brand: rows outside
    [Q1−1.5·IQR, Q3+1.5·IQR] of extended price — the boxplot rule,
    the robust alternative to z-score flags (fences come from
    quartiles, so the outliers themselves cannot inflate the
    threshold that detects them, unlike mean±kσ). Two passes over
    the fact: one grouped exact-percentile aggregate to the
    |brands|-row fence relation, broadcast back for the counting
    pass — the same shape the reference uses for its masked-mean
    statistic (load_to_postgis.py:74-79) generalized to robust
    bounds."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "p_brand", "l_extendedprice"
    )
    fences = j.groupBy("p_brand").agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    flagged = j.join(F.broadcast(fences), "p_brand").select(
        "p_brand",
        F.when(F.col("l_extendedprice") < F.col("q1") - 1.5 * iqr, 1)
        .otherwise(0)
        .alias("lo"),
        F.when(F.col("l_extendedprice") > F.col("q3") + 1.5 * iqr, 1)
        .otherwise(0)
        .alias("hi"),
    )
    return flagged.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("lo").cast("bigint").alias("n_low"),
        F.sum("hi").cast("bigint").alias("n_high"),
        F.round(
            (F.sum("lo") + F.sum("hi")) / F.count("*").cast("double"), 5
        ).alias("outlier_rate"),
    )


@register(
    "hypergeometric_enrichment",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT c_nationkey, c_custkey, p_brand
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN part ON l_partkey = p_partkey),
    uni AS (SELECT CAST(count(DISTINCT c_custkey) AS DOUBLE) AS nn FROM inc),
    brand_tot AS (
      SELECT p_brand, CAST(count(DISTINCT c_custkey) AS DOUBLE) AS kk
      FROM inc GROUP BY 1),
    nat_tot AS (
      SELECT c_nationkey, CAST(count(DISTINCT c_custkey) AS DOUBLE) AS sn
      FROM inc GROUP BY 1),
    cell AS (
      SELECT c_nationkey, p_brand,
             CAST(count(DISTINCT c_custkey) AS DOUBLE) AS k
      FROM inc GROUP BY 1, 2),
    z AS (
      SELECT n_name, p_brand, CAST(k AS BIGINT) AS observed,
             round(sn * kk / nn, 2) AS expected,
             (k - sn * kk / nn)
               / sqrt(sn * kk * (nn - kk) * (nn - sn) / (nn * nn * (nn - 1)))
               AS zscore
      FROM cell JOIN brand_tot USING (p_brand)
      JOIN nat_tot USING (c_nationkey)
      JOIN nation ON c_nationkey = n_nationkey, uni)
    SELECT n_name, p_brand, observed, expected, round(zscore, 4) AS zscore
    FROM z ORDER BY abs(zscore) DESC, n_name, p_brand LIMIT 15
    """,
    tags=("stats", "enrichment", "join"),
)
def q_hypergeometric_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypergeometric enrichment screen over the nation×brand
    incidence: which nations buy which brands MORE than drawing
    customers at random would predict — observed distinct-customer
    overlap against the exact hypergeometric mean nK/N and variance
    nK(N−K)(N−n)/(N²(N−1)), the gene-set-enrichment statistic
    pointed at market segmentation. The incidence relation is
    deduped ONCE (distinct customer-brand-nation triples) and all
    three marginals re-aggregate from it — the |cells| relation is
    |nations|×|brands|, so every join after the dedup is
    broadcast-sized; top-15 |z| surface."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    inc = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(p, li["l_partkey"] == p["p_partkey"])
        .select("c_nationkey", "c_custkey", "p_brand")
        .distinct()
    )
    uni = inc.agg(F.count_distinct("c_custkey").cast("double").alias("nn"))
    brand_tot = inc.groupBy("p_brand").agg(
        F.count_distinct("c_custkey").cast("double").alias("kk")
    )
    nat_tot = inc.groupBy("c_nationkey").agg(
        F.count_distinct("c_custkey").cast("double").alias("sn")
    )
    cell = inc.groupBy("c_nationkey", "p_brand").agg(
        F.count_distinct("c_custkey").cast("double").alias("k")
    )
    mu = F.col("sn") * F.col("kk") / F.col("nn")
    var = (
        F.col("sn")
        * F.col("kk")
        * (F.col("nn") - F.col("kk"))
        * (F.col("nn") - F.col("sn"))
        / (F.col("nn") * F.col("nn") * (F.col("nn") - 1))
    )
    z = (
        cell.join(F.broadcast(brand_tot), "p_brand")
        .join(F.broadcast(nat_tot), "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .crossJoin(F.broadcast(uni))
        .select(
            "n_name",
            "p_brand",
            F.col("k").cast("bigint").alias("observed"),
            F.round(mu, 2).alias("expected"),
            ((F.col("k") - mu) / F.sqrt(var)).alias("zscore"),
        )
    )
    return (
        z.orderBy(F.abs(F.col("zscore")).desc(), "n_name", "p_brand")
        .limit(15)
        .select(
            "n_name",
            "p_brand",
            "observed",
            "expected",
            F.round("zscore", 4).alias("zscore"),
        )
    )


@register(
    "jensen_shannon_sources",
    oracle="""
    WITH ws AS (
      SELECT source, w
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
            FROM documents WHERE source IN ('src0', 'src1'))
      WHERE length(w) >= 1),
    cnt AS (
      SELECT w,
             CAST(count(*) FILTER (WHERE source = 'src0') AS DOUBLE) AS c0,
             CAST(count(*) FILTER (WHERE source = 'src1') AS DOUBLE) AS c1
      FROM ws GROUP BY w),
    tot AS (SELECT sum(c0) AS n0, sum(c1) AS n1 FROM cnt),
    pq AS (SELECT c0 / n0 AS p, c1 / n1 AS q FROM cnt, tot),
    js AS (
      SELECT CAST(count(*) AS BIGINT) AS vocab,
             sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2))
                      ELSE 0 END)
           + sum(CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2))
                      ELSE 0 END) AS js_nats
      FROM pq)
    SELECT vocab, round(js_nats, 6) AS js_nats,
           round(js_nats / ln(2), 6) AS js_bits
    FROM js
    """,
    tags=("text", "information", "distribution-fit"),
)
def q_jensen_shannon_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between two sources' word
    distributions — the symmetric, bounded (≤ ln 2) distribution
    distance used to monitor training-mix drift between corpus
    snapshots (KL alone is infinite the moment one source has a
    word the other lacks; JS's mixture midpoint makes missing words
    finite, handled here by the p>0 guards instead of smoothing).
    One grouped count builds the joint vocabulary relation with
    both sources as FILTER columns — no outer join needed — and the
    divergence is a single sum over |vocab| rows."""
    d = _t(spark, sf_dir, "documents").filter(F.col("source").isin("src0", "src1"))
    ws = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") >= 1)
    cnt = ws.groupBy("w").agg(
        F.count_if(F.col("source") == "src0").cast("double").alias("c0"),
        F.count_if(F.col("source") == "src1").cast("double").alias("c1"),
    )
    tot = cnt.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    pq = cnt.join(F.broadcast(tot)).select(
        (F.col("c0") / F.col("n0")).alias("p"),
        (F.col("c1") / F.col("n1")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    js = pq.agg(
        F.count("*").cast("bigint").alias("vocab"),
        (
            F.sum(F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(0.0))
            + F.sum(F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(0.0))
        ).alias("js_nats"),
    )
    return js.select(
        "vocab",
        F.round("js_nats", 6).alias("js_nats"),
        F.round(F.col("js_nats") / F.lit(math.log(2.0)), 6).alias("js_bits"),
    )


@register(
    "hill_tail_index",
    oracle="""
    WITH topk AS (
      SELECT o_totalprice AS x,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders QUALIFY rk <= 501),
    thr AS (SELECT x AS xk FROM topk WHERE rk = 501),
    hill AS (
      SELECT CAST(count(*) AS DOUBLE) AS k, avg(ln(x / xk)) AS h
      FROM topk, thr WHERE rk <= 500)
    SELECT CAST(k AS BIGINT) AS k,
           round((SELECT xk FROM thr), 2) AS threshold,
           round(1 / h, 4) AS hill_alpha
    FROM hill
    """,
    tags=("stats", "extremes", "topk"),
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over the top-500
    order values: α̂ = 1/mean(ln(x_(i)/x_(k+1))) — the tail-heaviness
    measure that says whether extremes have finite variance (α>2) —
    the peaks-over-threshold companion to block_maxima_gumbel (which
    assumes a thin tail; Hill MEASURES the tail). The only global
    work is a top-501 selection — TakeOrderedAndProject, a per-
    partition heap + driver merge of 501 rows, never a full sort —
    and the estimator itself is one aggregate over those 500 rows."""
    o = _t(spark, sf_dir, "orders")
    topk = (
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.desc("x"), "o_orderkey")
        .limit(501)
        .select(
            "x",
            F.row_number().over(Window.orderBy(F.desc("x"), "o_orderkey")).alias("rk"),
        )
    )
    thr = topk.filter(F.col("rk") == 501).select(F.col("x").alias("xk"))
    hill = (
        topk.filter(F.col("rk") <= 500)
        .crossJoin(F.broadcast(thr))
        .agg(
            F.count("*").cast("double").alias("k"),
            F.avg(F.log(F.col("x") / F.col("xk"))).alias("h"),
            F.first("xk").alias("xk"),
        )
    )
    return hill.select(
        F.col("k").cast("bigint").alias("k"),
        F.round("xk", 2).alias("threshold"),
        F.round(1 / F.col("h"), 4).alias("hill_alpha"),
    )


@register(
    "cochran_armitage_trend",
    oracle="""
    WITH ord AS (
      SELECT o_orderkey,
             CAST(substr(o_orderpriority, 1, 1) AS DOUBLE) AS s
      FROM orders),
    outcome AS (
      SELECT l_orderkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT s, CAST(ret AS DOUBLE) AS y
      FROM ord JOIN outcome ON o_orderkey = l_orderkey),
    cells AS (
      SELECT s, CAST(count(*) AS DOUBLE) AS n, sum(y) AS r
      FROM j GROUP BY s),
    tot AS (
      SELECT sum(n) AS nn, sum(r) / sum(n) AS pbar,
             sum(s * n) AS sn, sum(s * s * n) AS ssn
      FROM cells),
    stat AS (
      SELECT sum(s * (r - n * pbar)) AS num,
             any_value(sqrt(pbar * (1 - pbar) * (ssn - sn * sn / nn))) AS den,
             any_value(nn) AS nn, any_value(pbar) AS pbar
      FROM cells, tot GROUP BY nn)
    SELECT CAST(nn AS BIGINT) AS n_orders,
           round(pbar, 5) AS overall_return_rate,
           round(num / den, 4) AS trend_z
    FROM stat
    """,
    tags=("stats", "trend", "join"),
)
def q_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does the probability an order
    contains a returned item rise MONOTONICALLY with order priority
    (scores 1..5 parsed from the priority label)? The trend z
    weights each ordered group's excess return count by its score —
    strictly more powerful than chi-square independence when the
    alternative is ordered (chi_square_independence treats groups
    as exchangeable and burns power on non-monotone patterns). The
    order-level outcome is one max-aggregate over lineitem; the
    test statistic reduces over the 5-row cell relation."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ord_ = o.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).cast("double").alias("s"),
    )
    outcome = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret")
    )
    j = ord_.join(outcome, ord_["o_orderkey"] == outcome["l_orderkey"]).select(
        "s", F.col("ret").cast("double").alias("y")
    )
    cells = j.groupBy("s").agg(
        F.count("*").cast("double").alias("n"), F.sum("y").alias("r")
    )
    tot = cells.agg(
        F.sum("n").alias("nn"),
        (F.sum("r") / F.sum("n")).alias("pbar"),
        F.sum(F.col("s") * F.col("n")).alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n")).alias("ssn"),
    )
    stat = cells.join(F.broadcast(tot)).groupBy("nn").agg(
        F.sum(F.col("s") * (F.col("r") - F.col("n") * F.col("pbar"))).alias("num"),
        F.first(
            F.sqrt(
                F.col("pbar")
                * (1 - F.col("pbar"))
                * (F.col("ssn") - F.col("sn") * F.col("sn") / F.col("nn"))
            )
        ).alias("den"),
        F.first("pbar").alias("pbar"),
    )
    return stat.select(
        F.col("nn").cast("bigint").alias("n_orders"),
        F.round("pbar", 5).alias("overall_return_rate"),
        F.round(F.col("num") / F.col("den"), 4).alias("trend_z"),
    )


@register(
    "monroe_log_odds",
    oracle="""
    WITH ws AS (
      SELECT source, w
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
            FROM documents WHERE source IN ('src0', 'src1'))
      WHERE length(w) >= 2),
    cnt AS (
      SELECT w,
             CAST(count(*) FILTER (WHERE source = 'src0') AS DOUBLE) AS y0,
             CAST(count(*) FILTER (WHERE source = 'src1') AS DOUBLE) AS y1
      FROM ws GROUP BY w),
    tot AS (
      SELECT sum(y0) AS n0, sum(y1) AS n1,
             CAST(count(*) AS DOUBLE) AS v
      FROM cnt),
    z AS (
      SELECT w, CAST(y0 AS BIGINT) AS c_src0, CAST(y1 AS BIGINT) AS c_src1,
             (ln((y0 + 0.1) / (n0 + 0.1 * v - y0 - 0.1))
              - ln((y1 + 0.1) / (n1 + 0.1 * v - y1 - 0.1)))
             / sqrt(1 / (y0 + 0.1) + 1 / (y1 + 0.1)) AS zeta
      FROM cnt, tot)
    SELECT w, c_src0, c_src1, round(zeta, 4) AS zeta
    FROM z ORDER BY abs(zeta) DESC, w LIMIT 15
    """,
    tags=("text", "stylometry", "stats"),
)
def q_monroe_log_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe/Colaresi/Quinn 'fightin' words': log-odds-ratio of
    word use between two sources with a Dirichlet prior (α=0.1 per
    word), z-scored by the delta-method variance 1/(y+α)+1/(y'+α) —
    the principled replacement for raw frequency-ratio keyword
    lists, which explode on rare words (the prior shrinks them; the
    variance downweights them). Same single-aggregate joint-vocab
    shape as jensen_shannon_sources; top-15 |z| are the words that
    most distinguish the two crawls."""
    d = _t(spark, sf_dir, "documents").filter(F.col("source").isin("src0", "src1"))
    ws = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") >= 2)
    cnt = ws.groupBy("w").agg(
        F.count_if(F.col("source") == "src0").cast("double").alias("y0"),
        F.count_if(F.col("source") == "src1").cast("double").alias("y1"),
    )
    tot = cnt.agg(
        F.sum("y0").alias("n0"),
        F.sum("y1").alias("n1"),
        F.count("*").cast("double").alias("v"),
    )
    a = 0.1
    num = F.log((F.col("y0") + a) / (F.col("n0") + a * F.col("v") - F.col("y0") - a)) - F.log(
        (F.col("y1") + a) / (F.col("n1") + a * F.col("v") - F.col("y1") - a)
    )
    den = F.sqrt(1 / (F.col("y0") + a) + 1 / (F.col("y1") + a))
    z = cnt.join(F.broadcast(tot)).select(
        "w",
        F.col("y0").cast("bigint").alias("c_src0"),
        F.col("y1").cast("bigint").alias("c_src1"),
        (num / den).alias("zeta"),
    )
    return (
        z.orderBy(F.abs(F.col("zeta")).desc(), "w")
        .limit(15)
        .select("w", "c_src0", "c_src1", F.round("zeta", 4).alias("zeta"))
    )


@register(
    "gini_split_gain",
    oracle="""
    WITH cells AS (
      SELECT l_discount AS t,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS r
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT t,
             sum(n) OVER (ORDER BY t) AS nl,
             sum(r) OVER (ORDER BY t) AS rl,
             sum(n) OVER () AS nn, sum(r) OVER () AS rr
      FROM cells),
    gain AS (
      SELECT t, nl,
             2 * (rr / nn) * (1 - rr / nn)
             - (nl / nn) * 2 * (rl / nl) * (1 - rl / nl)
             - ((nn - nl) / nn) * 2 * ((rr - rl) / (nn - nl))
               * (1 - (rr - rl) / (nn - nl)) AS g
      FROM cum WHERE nl < nn)
    SELECT round(t, 2) AS threshold,
           CAST(nl AS BIGINT) AS n_left,
           round(g, 6) AS gini_gain
    FROM gain
    """,
    tags=("ml", "binning", "window"),
)
def q_gini_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first node of a decision tree as a query: Gini-impurity
    gain of every candidate split 'discount ≤ t' for predicting
    line-item returns — root impurity 2p(1−p) minus the
    size-weighted child impurities, evaluated at ALL thresholds at
    once. This is exactly how distributed GBDT implementations
    (XGBoost/LightGBM on Spark) find splits: ONE histogram aggregate
    over the fact table (|distinct values| cells), then cumulative
    sums over the tiny cell relation give every left/right partition
    simultaneously — no per-threshold re-scan of the data."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(F.col("l_discount").alias("t")).agg(
        F.count("*").cast("double").alias("n"),
        F.count_if(F.col("l_returnflag") == "R").cast("double").alias("r"),
    )
    wt = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = cells.select(
        "t",
        F.sum("n").over(wt).alias("nl"),
        F.sum("r").over(wt).alias("rl"),
        F.sum("n").over(wall).alias("nn"),
        F.sum("r").over(wall).alias("rr"),
    )
    gini = lambda r, n: 2 * (r / n) * (1 - r / n)
    g = (
        gini(F.col("rr"), F.col("nn"))
        - (F.col("nl") / F.col("nn")) * gini(F.col("rl"), F.col("nl"))
        - ((F.col("nn") - F.col("nl")) / F.col("nn"))
        * gini(F.col("rr") - F.col("rl"), F.col("nn") - F.col("nl"))
    )
    return cum.filter(F.col("nl") < F.col("nn")).select(
        F.round("t", 2).alias("threshold"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.round(g, 6).alias("gini_gain"),
    )


@register(
    "kish_design_effect",
    oracle="""
    WITH sampled AS (
      SELECT c_custkey, c_nationkey
      FROM customer
      WHERE ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT
            % 100 < 20),
    nat_tot AS (
      SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS nt
      FROM customer GROUP BY 1),
    nat_smp AS (
      SELECT c_nationkey, CAST(count(*) AS DOUBLE) AS ns
      FROM sampled GROUP BY 1),
    wts AS (
      SELECT s.c_custkey, nt / ns AS w
      FROM sampled s JOIN nat_tot USING (c_nationkey)
      JOIN nat_smp USING (c_nationkey)),
    agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, avg(w) AS mw,
             avg(w * w) AS mw2
      FROM wts)
    SELECT CAST(n AS BIGINT) AS n_sample,
           round(n * mw2 / (n * mw * mw / n) / n, 4) AS deff,
           round(n / (n * mw2 / (mw * mw * n)), 1) AS n_effective
    FROM agg
    """,
    tags=("survey", "sampling", "weights"),
)
def q_kish_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish design effect of a nation-stratified 20% hash sample:
    deff = n·Σw²/(Σw)² — how much variance the unequal
    inverse-probability weights cost versus simple random sampling,
    and the effective sample size n/deff every survey-weighted
    estimate should quote instead of its raw n. The sample membership
    is the same deterministic md5-bucket device as
    hash_split_summary (reproducible across engines and runs);
    weights are nation-total/nation-sampled from two tiny broadcast
    marginals."""
    c = _t(spark, sf_dir, "customer")
    sampled = c.filter(CUR.hash_bucket(F.col("c_custkey"), 100) < 20).select(
        "c_custkey", "c_nationkey"
    )
    nat_tot = c.groupBy("c_nationkey").agg(
        F.count("*").cast("double").alias("nt")
    )
    nat_smp = sampled.groupBy("c_nationkey").agg(
        F.count("*").cast("double").alias("ns")
    )
    wts = (
        sampled.join(F.broadcast(nat_tot), "c_nationkey")
        .join(F.broadcast(nat_smp), "c_nationkey")
        .select((F.col("nt") / F.col("ns")).alias("w"))
    )
    agg = wts.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("w").alias("mw"),
        F.avg(F.col("w") * F.col("w")).alias("mw2"),
    )
    deff = F.col("mw2") / (F.col("mw") * F.col("mw"))
    return agg.select(
        F.col("n").cast("bigint").alias("n_sample"),
        F.round(deff, 4).alias("deff"),
        F.round(F.col("n") / deff, 1).alias("n_effective"),
    )


@register(
    "dirichlet_query_likelihood",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    coll AS (SELECT sum(tf) AS ctot FROM tf),
    cf AS (
      SELECT token, sum(tf) AS cf FROM tf
      WHERE token IN ('spark', 'join', 'window') GROUP BY token),
    grid AS (
      SELECT dl.doc_id, dl.dl, cf.token, cf.cf FROM dl CROSS JOIN cf),
    scored AS (
      SELECT g.doc_id,
             sum(ln((coalesce(t.tf, 0) + 2000 * g.cf / ctot)
                    / (g.dl + 2000))) AS score
      FROM grid g
      LEFT JOIN tf t ON t.doc_id = g.doc_id AND t.token = g.token,
      coll GROUP BY g.doc_id)
    SELECT doc_id, round(score, 6) AS score
    FROM scored ORDER BY round(score, 6) DESC, doc_id LIMIT 10
    """,
    tags=("text", "retrieval", "lm"),
)
def q_dirichlet_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (μ=2000):
    score(d) = Σ_w ln((tf + μ·P_coll(w))/(|d| + μ)) — the language-
    modeling ranking function next to bm25_rank's probabilistic one
    (the two classical IR families on the same corpus; Dirichlet's
    length normalization is principled where BM25's b is tuned).
    Zero-tf terms still contribute the collection prior, so the doc
    grid is |docs|×|query| built from a tiny cross join with a LEFT
    join back to the tf relation — the absent-term rows an
    inner-join scorer silently drops."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    coll = tf.agg(F.sum("tf").alias("ctot"))
    cf = (
        tf.filter(F.col("token").isin("spark", "join", "window"))
        .groupBy("token")
        .agg(F.sum("tf").alias("cf"))
    )
    grid = dl.crossJoin(F.broadcast(cf))
    scored = (
        grid.join(tf, ["doc_id", "token"], "left")
        .crossJoin(F.broadcast(coll))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce("tf", F.lit(0.0)) + 2000 * F.col("cf") / F.col("ctot"))
                    / (F.col("dl") + 2000)
                )
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


@register(
    "ndcg_eval",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
      FROM documents),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE token <> '' GROUP BY doc_id, token),
    n_docs AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM tf),
    df AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf
      WHERE token IN ('spark', 'join', 'window') GROUP BY token),
    scored AS (
      SELECT t.doc_id, sum(ln(1 + t.tf) * ln(n / d.df)) AS score,
             CAST(count(*) AS DOUBLE) AS rel
      FROM tf t JOIN df d USING (token), n_docs GROUP BY t.doc_id),
    ranked AS (
      SELECT doc_id, rel,
             row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS rk
      FROM scored),
    dcg AS (
      SELECT sum((pow(2, rel) - 1) / (ln(rk + 1) / ln(2))) AS dcg
      FROM ranked WHERE rk <= 10),
    ideal AS (
      SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rk
      FROM scored),
    idcg AS (
      SELECT sum((pow(2, rel) - 1) / (ln(rk + 1) / ln(2))) AS idcg
      FROM ideal WHERE rk <= 10)
    SELECT round(dcg, 4) AS dcg_at_10,
           round(idcg, 4) AS idcg_at_10,
           round(dcg / idcg, 4) AS ndcg_at_10
    FROM dcg, idcg
    """,
    tags=("ranking", "eval", "retrieval"),
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of a tf-idf ranking against term-coverage relevance
    (rel = how many of the 3 query terms the doc contains): DCG with
    the exponential gain (2^rel−1)/log₂(rank+1) normalized by the
    ideal ordering's IDCG — the ranking-quality metric that closes
    the retrieval loop (bm25_rank and dirichlet_query_likelihood
    RANK; this measures how well). Both the system and ideal
    rankings are windows over the |scored docs| relation; the
    fact-side work is the one tf aggregate shared by the whole IR
    family."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count("*").cast("double").alias("tf")
    )
    n_docs = tf.agg(F.count_distinct("doc_id").cast("double").alias("n"))
    df = (
        tf.filter(F.col("token").isin("spark", "join", "window"))
        .groupBy("token")
        .agg(F.count("*").cast("double").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(F.log(1 + F.col("tf")) * F.log(F.col("n") / F.col("df"))).alias(
                "score"
            ),
            F.count("*").cast("double").alias("rel"),
        )
    )
    gain = (F.pow(2.0, F.col("rel")) - 1) / (F.log(F.col("rk") + 1) / F.lit(math.log(2.0)))
    ranked = scored.select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.round(F.col("score"), 9).desc(), "doc_id"))
        .alias("rk"),
    )
    dcg = ranked.filter(F.col("rk") <= 10).agg(F.sum(gain).alias("dcg"))
    ideal = scored.select(
        "rel",
        F.row_number().over(Window.orderBy(F.desc("rel"), "doc_id")).alias("rk"),
    )
    idcg = ideal.filter(F.col("rk") <= 10).agg(F.sum(gain).alias("idcg"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.round("dcg", 4).alias("dcg_at_10"),
        F.round("idcg", 4).alias("idcg_at_10"),
        F.round(F.col("dcg") / F.col("idcg"), 4).alias("ndcg_at_10"),
    )


@register(
    "gravity_trade_model",
    oracle="""
    WITH flows AS (
      SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
             sum(l_extendedprice * (1 - l_discount)) AS f
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1, 2),
    mass_c AS (SELECT cust_nation, sum(f) AS mc FROM flows GROUP BY 1),
    mass_s AS (SELECT supp_nation, sum(f) AS ms FROM flows GROUP BY 1),
    tot AS (SELECT sum(f) AS t FROM flows),
    dev AS (
      SELECT cust_nation, supp_nation,
             round(f, 2) AS flow,
             round(mc * ms / t, 2) AS gravity_pred,
             ln(f / (mc * ms / t)) AS log_ratio
      FROM flows JOIN mass_c USING (cust_nation)
      JOIN mass_s USING (supp_nation), tot)
    SELECT cust_nation, supp_nation, flow, gravity_pred,
           round(log_ratio, 4) AS log_ratio
    FROM dev ORDER BY abs(log_ratio) DESC, cust_nation, supp_nation
    LIMIT 15
    """,
    tags=("economics", "join", "agg"),
)
def q_gravity_trade_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity model of trade flows: revenue between each customer-nation
    and supplier-nation pair versus the gravity prediction
    M_i·M_j/T (each side's total mass) — the workhorse empirical
    model of international trade, here surfacing the 15 nation pairs
    that over/under-trade most (log-ratio of observed to predicted,
    the 'home bias' diagnostic). The five-table star join collapses
    to a |nations|² flow matrix in ONE aggregate; both mass
    marginals re-aggregate from that tiny matrix, so the model fit
    adds no fact-table passes."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    flows = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("f"))
    )
    mass_c = flows.groupBy("cust_nation").agg(F.sum("f").alias("mc"))
    mass_s = flows.groupBy("supp_nation").agg(F.sum("f").alias("ms"))
    tot = flows.agg(F.sum("f").alias("t"))
    pred = F.col("mc") * F.col("ms") / F.col("t")
    dev = (
        flows.join(F.broadcast(mass_c), "cust_nation")
        .join(F.broadcast(mass_s), "supp_nation")
        .crossJoin(F.broadcast(tot))
        .select(
            "cust_nation",
            "supp_nation",
            F.round("f", 2).alias("flow"),
            F.round(pred, 2).alias("gravity_pred"),
            F.log(F.col("f") / pred).alias("log_ratio"),
        )
    )
    return (
        dev.orderBy(F.abs(F.col("log_ratio")).desc(), "cust_nation", "supp_nation")
        .limit(15)
        .select(
            "cust_nation",
            "supp_nation",
            "flow",
            "gravity_pred",
            F.round("log_ratio", 4).alias("log_ratio"),
        )
    )


@register(
    "mahalanobis_outliers",
    oracle="""
    WITH dims AS (
      SELECT vec_id, CAST(i AS INT) AS pos,
             embedding[CAST(i AS INT)]::DOUBLE AS v
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    st AS (
      SELECT pos, avg(v) AS mu, var_samp(v) AS s2 FROM dims GROUP BY pos),
    d2 AS (
      SELECT vec_id, sum(pow(v - mu, 2) / s2) AS d2
      FROM dims JOIN st USING (pos) GROUP BY vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN d2 > 93.2169 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           round(avg(d2), 3) AS mean_d2,
           round(max(d2), 3) AS max_d2
    FROM d2
    """,
    tags=("ml", "anomaly", "embeddings"),
)
def q_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis outlier screen over the embedding cloud:
    d² = Σ(x−μ)²/σ² per vector against the χ²₆₄ 99th percentile
    (93.22) — the covariance-aware distance that catches points a
    plain L2 radius misses when dimensions have unequal spread
    (mean d² ≈ 64 is the built-in sanity check: E[χ²_d] = d). Two
    aggregates over the exploded dims: one for the 64-row moment
    relation (broadcast back), one for the per-vector sum — the
    full-covariance version is pca_power_iteration's matrix plus a
    triangular solve, overkill for a screen."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("v"))
    st = dims.groupBy("pos").agg(
        F.avg("v").alias("mu"), F.var_samp("v").alias("s2")
    )
    d2 = (
        dims.join(F.broadcast(st), "pos")
        .groupBy("vec_id")
        .agg(F.sum(F.pow(F.col("v") - F.col("mu"), 2) / F.col("s2")).alias("d2"))
    )
    return d2.agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.sum(F.when(F.col("d2") > 93.2169, 1).otherwise(0))
        .cast("bigint")
        .alias("n_outliers"),
        F.round(F.avg("d2"), 3).alias("mean_d2"),
        F.round(F.max("d2"), 3).alias("max_d2"),
    )


@register(
    "lof_outliers",
    oracle="""
    WITH nrm AS (
      SELECT vec_id,
             sqrt(list_sum(list_transform(generate_series(1, 64),
                  k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE))) AS nn,
             embedding AS e
      FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             1 - list_sum(list_transform(generate_series(1, 64),
                  k -> a.e[k]::DOUBLE * b.e[k]::DOUBLE)) / (a.nn * b.nn)
               AS dist
      FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id),
    knn AS (
      SELECT i, j, dist,
             row_number() OVER (PARTITION BY i ORDER BY dist, j) AS rk
      FROM pairs QUALIFY rk <= 5),
    kd AS (SELECT i, max(dist) AS kdist FROM knn GROUP BY i),
    reach AS (
      SELECT knn.i, knn.j, greatest(knn.dist, kd.kdist) AS rdist
      FROM knn JOIN kd ON knn.j = kd.i),
    lrd AS (SELECT i, 1 / avg(rdist) AS lrd FROM reach GROUP BY i),
    lof AS (
      SELECT knn.i, avg(lj.lrd) / any_value(li.lrd) AS lof
      FROM knn JOIN lrd lj ON knn.j = lj.i
      JOIN lrd li ON knn.i = li.i
      GROUP BY knn.i)
    SELECT CAST(i AS BIGINT) AS vec_id, round(lof, 4) AS lof
    FROM lof ORDER BY round(lof, 6) DESC, i LIMIT 10
    """,
    tags=("ml", "anomaly", "window"),
)
def q_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local outlier factor (k=5, cosine distance) — the DENSITY-
    relative anomaly detector: a point is outlying if its local
    reachability density is low compared to its neighbors', which
    catches outliers next to tight clusters that a global threshold
    (mahalanobis_outliers) never flags. Four relational stages —
    kNN via a per-point window over the pair distances, k-distance,
    reachability reach(i←j)=max(d(i,j), kdist(j)), then the lrd
    ratio — every one a partition-parallel window or a join on
    point ids; at 100 TB the pairs relation is the LSH candidate
    set, and everything downstream is unchanged."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("v"))
    na = dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    unit = dims.join(na, "vec_id").select(
        "vec_id", "pos", (F.col("v") / F.col("nrm")).alias("u")
    )
    a = unit.select(F.col("vec_id").alias("i"), "pos", F.col("u").alias("ua"))
    b = unit.select(F.col("vec_id").alias("j"), "pos", F.col("u").alias("ub"))
    pairs = (
        a.join(b, "pos")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg((1 - F.sum(F.col("ua") * F.col("ub"))).alias("dist"))
    )
    knn = pairs.select(
        "i",
        "j",
        "dist",
        F.row_number().over(Window.partitionBy("i").orderBy("dist", "j")).alias("rk"),
    ).filter(F.col("rk") <= 5)
    kd = knn.groupBy("i").agg(F.max("dist").alias("kdist"))
    reach = knn.join(
        kd.select(F.col("i").alias("j"), "kdist"), "j"
    ).select("i", "j", F.greatest("dist", "kdist").alias("rdist"))
    lrd = reach.groupBy("i").agg((1 / F.avg("rdist")).alias("lrd"))
    lof = (
        knn.join(lrd.select(F.col("i").alias("j"), F.col("lrd").alias("lrd_j")), "j")
        .join(lrd, "i")
        .groupBy("i")
        .agg((F.avg("lrd_j") / F.first("lrd")).alias("lof"))
    )
    return (
        lof.orderBy(F.round(F.col("lof"), 6).desc(), "i")
        .limit(10)
        .select(F.col("i").cast("bigint").alias("vec_id"), F.round("lof", 4).alias("lof"))
    )


@register(
    "borda_condorcet_ranking",
    oracle="""
    WITH rev AS (
      SELECT n_name, year(CAST(o_orderdate AS DATE)) AS yr,
             sum(o_totalprice) AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    nn AS (SELECT CAST(count(DISTINCT n_name) AS BIGINT) AS n_nations FROM rev),
    ranked AS (
      SELECT n_name, yr,
             row_number() OVER (PARTITION BY yr ORDER BY r DESC, n_name) AS rk
      FROM rev),
    borda AS (
      SELECT n_name, sum(n_nations - rk) AS borda_points
      FROM ranked, nn GROUP BY n_name),
    duels AS (
      SELECT a.n_name AS na, b.n_name AS nb,
             sum(CASE WHEN a.r > b.r THEN 1 ELSE 0 END) AS wins,
             CAST(count(*) AS DOUBLE) AS yrs
      FROM rev a JOIN rev b ON a.yr = b.yr AND a.n_name <> b.n_name
      GROUP BY 1, 2),
    pw AS (
      SELECT na AS n_name,
             CAST(sum(CASE WHEN wins > yrs / 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS pairwise_wins
      FROM duels GROUP BY na)
    SELECT b.n_name, CAST(borda_points AS BIGINT) AS borda_points,
           pairwise_wins,
           pairwise_wins = n_nations - 1 AS is_condorcet_winner
    FROM borda b JOIN pw USING (n_name), nn
    ORDER BY borda_points DESC, n_name LIMIT 10
    """,
    tags=("ranking", "voting", "window"),
)
def q_borda_condorcet_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Social-choice aggregation of the yearly nation-revenue
    rankings: Borda points (n − rank summed over years) next to the
    Condorcet pairwise-majority count — the two classical rank-
    fusion methods (the voting-theory ancestors of rrf_rank_fusion),
    with the is_condorcet_winner flag marking a nation that beats
    every other in a head-to-head majority of years (Borda can
    disagree — that divergence is Arrow's theorem in a query). All
    ranking work happens on the |nations|×|years| aggregate; the
    duel matrix is a tiny year-keyed self-join."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year(F.col("o_orderdate").cast("date")).alias("yr"))
        .agg(F.sum("o_totalprice").alias("r"))
    )
    nn = rev.agg(F.count_distinct("n_name").cast("bigint").alias("n_nations"))
    ranked = rev.select(
        "n_name",
        "yr",
        F.row_number()
        .over(Window.partitionBy("yr").orderBy(F.desc("r"), "n_name"))
        .alias("rk"),
    )
    borda = (
        ranked.crossJoin(F.broadcast(nn))
        .groupBy("n_name")
        .agg(F.sum(F.col("n_nations") - F.col("rk")).alias("borda_points"))
    )
    a = rev.select(F.col("n_name").alias("na"), "yr", F.col("r").alias("ra"))
    b = rev.select(F.col("n_name").alias("nb"), "yr", F.col("r").alias("rb"))
    duels = (
        a.join(b, "yr")
        .filter(F.col("na") != F.col("nb"))
        .groupBy("na", "nb")
        .agg(
            F.sum(F.when(F.col("ra") > F.col("rb"), 1).otherwise(0)).alias("wins"),
            F.count("*").cast("double").alias("yrs"),
        )
    )
    pw = duels.groupBy(F.col("na").alias("n_name")).agg(
        F.sum(F.when(F.col("wins") > F.col("yrs") / 2, 1).otherwise(0))
        .cast("bigint")
        .alias("pairwise_wins")
    )
    return (
        borda.join(pw, "n_name")
        .crossJoin(F.broadcast(nn))
        .orderBy(F.desc("borda_points"), "n_name")
        .limit(10)
        .select(
            "n_name",
            F.col("borda_points").cast("bigint").alias("borda_points"),
            "pairwise_wins",
            (F.col("pairwise_wins") == F.col("n_nations") - 1).alias(
                "is_condorcet_winner"
            ),
        )
    )


@register(
    "shapley_attribution",
    oracle="""
    WITH touched AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    masks AS (
      SELECT mask, CAST(count(*) AS DOUBLE) AS n, sum(conv) AS k
      FROM touched GROUP BY mask),
    subsets AS (SELECT unnest(generate_series(0, 7)) AS s),
    v AS (
      SELECT s, coalesce(sum(k) / nullif(sum(n), 0), 0) AS v
      FROM subsets LEFT JOIN masks ON (mask & s) = mask
      GROUP BY s),
    channels AS (
      SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4))
      AS t(ch, bit)),
    contrib AS (
      SELECT c.ch,
             sum(CASE bit_count(CAST(sv.s AS BIGINT))
                   WHEN 0 THEN 2.0 / 6 WHEN 1 THEN 1.0 / 6
                   ELSE 2.0 / 6 END
                 * (vi.v - sv.v)) AS phi
      FROM channels c
      JOIN v sv ON (sv.s & c.bit) = 0
      JOIN v vi ON vi.s = (sv.s | c.bit)
      GROUP BY c.ch)
    SELECT ch AS channel, round(phi, 6) AS shapley_value
    FROM contrib ORDER BY ch
    """,
    tags=("attribution", "marketing", "join"),
)
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution over the 3-channel
    (view/click/signup) touch lattice: coalition value v(S) =
    conversion rate of users whose touched set ⊆ S, and each
    channel's credit is the permutation-weighted marginal
    Σ |S|!(2−|S|)!/3! · [v(S∪i)−v(S)] — the game-theoretic
    attribution that last-touch (touch_attribution) approximates.
    The exponential blowup is tamed by the RELATION: users collapse
    to 8 mask rows in one aggregate, v(S) is a containment join
    ((mask & S) = mask) over 8×8 rows, and the Shapley sum is a
    12-row join — exact, no sampling, no 2^n enumeration beyond the
    (tiny) subset lattice itself."""
    e = _t(spark, sf_dir, "events")
    touched = e.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
            + 2 * F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 4 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        ).alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    masks = touched.groupBy("mask").agg(
        F.count("*").cast("double").alias("n"), F.sum("conv").alias("k")
    )
    subsets = spark.range(0, 8).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            F.broadcast(masks),
            (F.col("mask").bitwiseAND(F.col("s"))) == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(
            F.coalesce(
                F.sum("k") / F.nullif(F.sum("n"), F.lit(0.0)), F.lit(0.0)
            ).alias("v")
        )
    )
    channels = spark.createDataFrame(
        [("view", 1), ("click", 2), ("signup", 4)], "ch string, bit int"
    )
    sv = v.select(F.col("s").alias("s0"), F.col("v").alias("v0"))
    vi = v.select(F.col("s").alias("s1"), F.col("v").alias("v1"))
    weight = (
        F.when(F.bit_count(F.col("s0").cast("bigint")) == 0, 2.0 / 6)
        .when(F.bit_count(F.col("s0").cast("bigint")) == 1, 1.0 / 6)
        .otherwise(2.0 / 6)
    )
    contrib = (
        channels.join(F.broadcast(sv), (F.col("s0").bitwiseAND(F.col("bit"))) == 0)
        .join(
            F.broadcast(vi),
            F.col("s1") == (F.col("s0").bitwiseOR(F.col("bit"))),
        )
        .groupBy("ch")
        .agg(F.sum(weight * (F.col("v1") - F.col("v0"))).alias("phi"))
    )
    return contrib.select(
        F.col("ch").alias("channel"), F.round("phi", 6).alias("shapley_value")
    ).orderBy("channel")


@register(
    "erlang_c_staffing",
    oracle="""
    WITH hourly AS (
      SELECT CAST(ts AS DATE) AS d, hour(ts) AS h,
             CAST(count(*) AS DOUBLE) AS calls
      FROM events GROUP BY 1, 2),
    peak AS (SELECT max(calls) AS lam FROM hourly),
    load AS (SELECT lam, lam * 180.0 / 3600.0 AS a FROM peak),
    agents AS (SELECT unnest(generate_series(1, 30)) AS nagents),
    lnfact AS (
      SELECT nagents,
             list_sum(list_transform(generate_series(1, nagents),
                      i -> ln(CAST(i AS DOUBLE)))) AS lnf
      FROM agents),
    terms AS (
      SELECT g.nagents,
             sum(exp(k.kk * ln(a) - coalesce(
                 list_sum(list_transform(generate_series(1, CAST(k.kk AS INT)),
                          i -> ln(CAST(i AS DOUBLE)))), 0))) AS s
      FROM agents g
      CROSS JOIN (SELECT unnest(generate_series(0, 29)) AS kk) k, load
      WHERE k.kk < g.nagents GROUP BY g.nagents),
    pc AS (
      SELECT t.nagents,
             CASE WHEN t.nagents <= a THEN 1.0
                  ELSE (exp(t.nagents * ln(a) - f.lnf)
                        * t.nagents / (t.nagents - a))
                       / (t.s + exp(t.nagents * ln(a) - f.lnf)
                          * t.nagents / (t.nagents - a)) END AS p_wait
      FROM terms t JOIN lnfact f USING (nagents), load),
    sl AS (
      SELECT nagents, p_wait,
             CASE WHEN nagents <= a THEN 0.0
                  ELSE 1 - p_wait * exp(-(nagents - a) * 20.0 / 180.0) END
               AS service_level
      FROM pc, load),
    pick AS (
      SELECT min(nagents) AS n_req FROM sl WHERE service_level >= 0.8)
    SELECT CAST(lam AS BIGINT) AS peak_calls_per_hour,
           round(a, 3) AS offered_load_erlangs,
           CAST(n_req AS BIGINT) AS agents_required,
           round((SELECT p_wait FROM sl WHERE nagents = n_req), 4)
             AS p_wait_at_n,
           round((SELECT service_level FROM sl WHERE nagents = n_req), 4)
             AS service_level_at_n
    FROM load, pick
    """,
    tags=("sre", "queueing", "hof"),
)
def q_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing from the event stream: peak hourly arrivals
    × 180 s handle time → offered load in erlangs, then the classic
    M/M/N wait probability evaluated at every N from 1..30 and the
    smallest N meeting an 80%-in-20s service level — the
    capacity-planning formula behind every call-center and
    thread-pool sizing decision. The factorials that make Erlang-C
    'not SQL' are ln-space fold-sums via JVM higher-order functions
    (aggregate over sequence — no Python, no numeric overflow at
    any N), and the N×k term triangle is a 30×30 literal grid."""
    e = _t(spark, sf_dir, "events")
    hourly = e.groupBy(F.to_date("ts").alias("d"), F.hour("ts").alias("h")).agg(
        F.count("*").cast("double").alias("calls")
    )
    load = hourly.agg(F.max("calls").alias("lam")).select(
        "lam", (F.col("lam") * 180.0 / 3600.0).alias("a")
    )

    def lnfact(col):
        return F.coalesce(
            F.aggregate(
                F.sequence(F.lit(1), col.cast("int")),
                F.lit(0.0),
                lambda acc, i: acc + F.log(i.cast("double")),
            ),
            F.lit(0.0),
        )

    agents = spark.range(1, 31).select(F.col("id").cast("int").alias("nagents"))
    ks = spark.range(0, 30).select(F.col("id").cast("int").alias("kk"))
    terms = (
        agents.crossJoin(F.broadcast(ks))
        .filter(F.col("kk") < F.col("nagents"))
        .crossJoin(F.broadcast(load))
        .groupBy("nagents")
        .agg(
            F.sum(
                F.exp(F.col("kk") * F.log(F.col("a")) - lnfact(F.col("kk")))
            ).alias("s"),
            F.first("a").alias("a"),
        )
    )
    top = F.exp(F.col("nagents") * F.log(F.col("a")) - lnfact(F.col("nagents"))) * F.col(
        "nagents"
    ) / (F.col("nagents") - F.col("a"))
    pc = terms.select(
        "nagents",
        "a",
        F.when(F.col("nagents") <= F.col("a"), 1.0)
        .otherwise(top / (F.col("s") + top))
        .alias("p_wait"),
    )
    sl = pc.select(
        "nagents",
        "p_wait",
        F.when(F.col("nagents") <= F.col("a"), 0.0)
        .otherwise(
            1 - F.col("p_wait") * F.exp(-(F.col("nagents") - F.col("a")) * 20.0 / 180.0)
        )
        .alias("service_level"),
    )
    pick = sl.filter(F.col("service_level") >= 0.8).agg(
        F.min("nagents").alias("n_req")
    )
    at_n = sl.join(F.broadcast(pick), sl["nagents"] == F.col("n_req"))
    return at_n.crossJoin(F.broadcast(load)).select(
        F.col("lam").cast("bigint").alias("peak_calls_per_hour"),
        F.round("a", 3).alias("offered_load_erlangs"),
        F.col("n_req").cast("bigint").alias("agents_required"),
        F.round("p_wait", 4).alias("p_wait_at_n"),
        F.round("service_level", 4).alias("service_level_at_n"),
    )


@register(
    "fixed_effects_within",
    oracle="""
    WITH obs AS (
      SELECT o_orderkey, c_nationkey AS g,
             CAST(cnt AS DOUBLE) AS x, o_totalprice AS y
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN (SELECT l_orderkey, count(*) AS cnt
            FROM lineitem GROUP BY 1) li ON l_orderkey = o_orderkey),
    pooled AS (
      SELECT covar_samp(x, y) / var_samp(x) AS beta_pooled,
             CAST(count(*) AS BIGINT) AS n
      FROM obs),
    gm AS (SELECT g, avg(x) AS mx, avg(y) AS my FROM obs GROUP BY g),
    within AS (
      SELECT sum((x - mx) * (y - my)) / sum((x - mx) * (x - mx))
               AS beta_within
      FROM obs JOIN gm USING (g))
    SELECT n, round(beta_pooled, 4) AS beta_pooled,
           round(beta_within, 4) AS beta_within
    FROM pooled, within
    """,
    tags=("regression", "causal", "economics"),
)
def q_fixed_effects_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel fixed-effects (within) estimator: order value on line
    count, demeaned inside each customer nation — the econometric
    workhorse that absorbs every time-invariant group confounder
    without estimating 25 dummies, shown against the pooled OLS
    slope (the gap between them IS the omitted group-level bias).
    Group means are a |groups|-row broadcast; both slopes are
    single covariance-style aggregates — the 'regression with a
    million fixed effects' pattern that scales because demeaning is
    a join, not a design matrix."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    obs = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(cnt, o["o_orderkey"] == cnt["l_orderkey"])
        .select(
            F.col("c_nationkey").alias("g"),
            F.col("cnt").cast("double").alias("x"),
            F.col("o_totalprice").alias("y"),
        )
    )
    pooled = obs.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("beta_pooled"),
        F.count("*").cast("bigint").alias("n"),
    )
    gm = obs.groupBy("g").agg(F.avg("x").alias("mx"), F.avg("y").alias("my"))
    within = obs.join(F.broadcast(gm), "g").agg(
        (
            F.sum((F.col("x") - F.col("mx")) * (F.col("y") - F.col("my")))
            / F.sum((F.col("x") - F.col("mx")) * (F.col("x") - F.col("mx")))
        ).alias("beta_within")
    )
    return pooled.crossJoin(F.broadcast(within)).select(
        "n",
        F.round("beta_pooled", 4).alias("beta_pooled"),
        F.round("beta_within", 4).alias("beta_within"),
    )


@register(
    "shuffle_skew_audit",
    oracle="""
    WITH keyed AS (
      SELECT 'orderkey' AS keyname,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UBIGINT
               % 32 AS bucket
      FROM lineitem
      UNION ALL
      SELECT 'partkey',
             ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))::UBIGINT % 32
      FROM lineitem
      UNION ALL
      SELECT 'returnflag',
             ('0x' || substr(md5(l_returnflag), 1, 8))::UBIGINT % 32
      FROM lineitem),
    loads AS (
      SELECT keyname, bucket, CAST(count(*) AS DOUBLE) AS n
      FROM keyed GROUP BY 1, 2),
    stats AS (
      SELECT keyname,
             CAST(count(*) AS BIGINT) AS buckets_hit,
             max(n) / avg(n) AS max_over_mean,
             stddev_samp(n) / avg(n) AS cv
      FROM loads GROUP BY keyname)
    SELECT keyname, buckets_hit,
           round(max_over_mean, 3) AS max_over_mean,
           round(cv, 4) AS cv
    FROM stats
    """,
    tags=("scale", "skew", "audit"),
)
def q_shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit for candidate partition keys: simulate a
    32-partition hash shuffle (portable md5 buckets) for three keys
    and report max/mean load and CV — the diagnostic run BEFORE
    picking a join/groupBy key at scale, made first-class as a
    query. orderkey and partkey hash near-uniform (max/mean → 1);
    returnflag has 3 values into 32 buckets, so 29 partitions sit
    EMPTY and the rest carry ~10× — exactly the straggler pattern
    AQE skew-join mitigation and the salting operators
    (salted_skew_agg, operators/scale.py) exist to break."""
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        ("orderkey", F.col("l_orderkey")),
        ("partkey", F.col("l_partkey")),
        ("returnflag", F.col("l_returnflag")),
    ]
    keyed = None
    for name, col in parts:
        piece = li.select(
            F.lit(name).alias("keyname"),
            CUR.hash_bucket(col, 32).alias("bucket"),
        )
        keyed = piece if keyed is None else keyed.unionAll(piece)
    loads = keyed.groupBy("keyname", "bucket").agg(
        F.count("*").cast("double").alias("n")
    )
    return loads.groupBy("keyname").agg(
        F.count("*").cast("bigint").alias("buckets_hit"),
        F.round(F.max("n") / F.avg("n"), 3).alias("max_over_mean"),
        F.round(F.stddev_samp("n") / F.avg("n"), 4).alias("cv"),
    )


@register(
    "join_cardinality_check",
    oracle="""
    WITH co AS (SELECT o_orderkey AS k, CAST(count(*) AS DOUBLE) AS c
                FROM orders GROUP BY 1),
    cl AS (SELECT l_orderkey AS k, CAST(count(*) AS DOUBLE) AS c
           FROM lineitem GROUP BY 1),
    cb AS (SELECT p_brand AS k, CAST(count(*) AS DOUBLE) AS c
           FROM part GROUP BY 1),
    lb AS (SELECT p_brand AS k, CAST(count(*) AS DOUBLE) AS c
           FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
    j1 AS (
      SELECT 'orders_x_lineitem' AS join_name,
             sum(co.c * cl.c) AS actual,
             (SELECT sum(c) FROM co) * (SELECT sum(c) FROM cl)
               / greatest((SELECT count(*) FROM co),
                          (SELECT count(*) FROM cl)) AS uniform_est
      FROM co JOIN cl USING (k)),
    j2 AS (
      SELECT 'part_x_lineitem_by_brand' AS join_name,
             sum(cb.c * lb.c) AS actual,
             (SELECT sum(c) FROM cb) * (SELECT sum(c) FROM lb)
               / greatest((SELECT count(*) FROM cb),
                          (SELECT count(*) FROM lb)) AS uniform_est
      FROM cb JOIN lb USING (k))
    SELECT join_name, CAST(actual AS BIGINT) AS actual_rows,
           CAST(round(uniform_est, 0) AS BIGINT) AS uniform_estimate,
           round(actual / uniform_est, 3) AS actual_over_estimate
    FROM j1 UNION ALL SELECT join_name, CAST(actual AS BIGINT),
           CAST(round(uniform_est, 0) AS BIGINT),
           round(actual / uniform_est, 3) FROM j2
    """,
    tags=("scale", "audit", "join"),
)
def q_join_cardinality_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit: the uniform-frequency
    estimator |R|·|S|/max(ndv_R, ndv_S) — what a cost-based
    optimizer assumes without histograms — against the EXACT output
    size Σ_k c_R(k)·c_S(k), computed from the two per-key count
    relations WITHOUT materializing either join. The PK-FK join
    (orders⋈lineitem) lands on the estimate; the 25-value brand
    join blows past it in proportion to frequency correlation —
    the query quantifies exactly when to trust stats-based plans
    and when to force a broadcast/salt by hand."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")

    def counts(df, key):
        return df.groupBy(F.col(key).alias("k")).agg(
            F.count("*").cast("double").alias("c")
        )

    co = counts(o, "o_orderkey")
    cl = counts(li, "l_orderkey")
    cb = counts(p, "p_brand")
    lb = counts(li.join(p, li["l_partkey"] == p["p_partkey"]), "p_brand")

    def audit(name, left, right):
        lt = left.agg(
            F.sum("c").alias("nl"), F.count("*").cast("double").alias("dl")
        )
        rt = right.agg(
            F.sum("c").alias("nr"), F.count("*").cast("double").alias("dr")
        )
        actual = (
            left.join(right.withColumnRenamed("c", "c2"), "k")
            .agg(F.sum(F.col("c") * F.col("c2")).alias("actual"))
        )
        return (
            actual.crossJoin(F.broadcast(lt))
            .crossJoin(F.broadcast(rt))
            .select(
                F.lit(name).alias("join_name"),
                F.col("actual").cast("bigint").alias("actual_rows"),
                F.round(
                    F.col("nl") * F.col("nr") / F.greatest("dl", "dr"), 0
                )
                .cast("bigint")
                .alias("uniform_estimate"),
                F.round(
                    F.col("actual")
                    / (F.col("nl") * F.col("nr") / F.greatest("dl", "dr")),
                    3,
                ).alias("actual_over_estimate"),
            )
        )

    return audit("orders_x_lineitem", co, cl).unionAll(
        audit("part_x_lineitem_by_brand", cb, lb)
    )


@register(
    "kendall_tau_b",
    oracle="""
    WITH cells AS (
      SELECT l_quantity AS x, l_discount AS y,
             CAST(count(*) AS DOUBLE) AS c
      FROM lineitem GROUP BY 1, 2),
    conc AS (
      SELECT sum(CASE WHEN b.y > a.y THEN a.c * b.c ELSE 0 END) AS cc,
             sum(CASE WHEN b.y < a.y THEN a.c * b.c ELSE 0 END) AS dd
      FROM cells a JOIN cells b ON b.x > a.x),
    xm AS (SELECT sum(cx * (cx - 1) / 2) AS n1
           FROM (SELECT sum(c) AS cx FROM cells GROUP BY x)),
    ym AS (SELECT sum(cy * (cy - 1) / 2) AS n2
           FROM (SELECT sum(c) AS cy FROM cells GROUP BY y)),
    nt AS (SELECT sum(c) AS n FROM cells)
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(cc AS BIGINT) AS concordant,
           CAST(dd AS BIGINT) AS discordant,
           round((cc - dd) / sqrt((n * (n - 1) / 2 - n1)
                                  * (n * (n - 1) / 2 - n2)), 5) AS tau_b
    FROM conc, xm, ym, nt
    """,
    tags=("stats", "correlation", "nonparametric"),
)
def q_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between quantity and discount, computed from
    the JOINT HISTOGRAM instead of row pairs: concordant/discordant
    counts are Σ c₁·c₂ over ordered cell pairs (both columns are
    low-cardinality, so the 550-cell self-join replaces the
    O(n²) = 10¹¹-row pair enumeration a naive formulation needs),
    and the tie corrections n₁/n₂ fall out of the marginals — the
    tie-aware rank correlation Spearman (spearman_rank_corr)
    mishandles when the data is this discrete. One fact-table
    aggregate; everything after runs on hundreds of rows."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").alias("x"), F.col("l_discount").alias("y")
    ).agg(F.count("*").cast("double").alias("c"))
    a = cells.select(
        F.col("x").alias("ax"), F.col("y").alias("ay"), F.col("c").alias("ac")
    )
    b = cells.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    conc = a.join(b, F.col("bx") > F.col("ax")).agg(
        F.sum(
            F.when(F.col("by") > F.col("ay"), F.col("ac") * F.col("bc")).otherwise(0.0)
        ).alias("cc"),
        F.sum(
            F.when(F.col("by") < F.col("ay"), F.col("ac") * F.col("bc")).otherwise(0.0)
        ).alias("dd"),
    )
    xm = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(F.sum(F.col("cx") * (F.col("cx") - 1) / 2).alias("n1"))
    )
    ym = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(F.sum(F.col("cy") * (F.col("cy") - 1) / 2).alias("n2"))
    )
    nt = cells.agg(F.sum("c").alias("n"))
    n0 = F.col("n") * (F.col("n") - 1) / 2
    return (
        conc.crossJoin(F.broadcast(xm))
        .crossJoin(F.broadcast(ym))
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("cc").cast("bigint").alias("concordant"),
            F.col("dd").cast("bigint").alias("discordant"),
            F.round(
                (F.col("cc") - F.col("dd"))
                / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
                5,
            ).alias("tau_b"),
        )
    )


@register(
    "bray_curtis_sources",
    oracle="""
    WITH ws AS (
      SELECT source, w
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
            FROM documents)
      WHERE length(w) >= 1),
    cnt AS (
      SELECT source, w, CAST(count(*) AS DOUBLE) AS c
      FROM ws GROUP BY 1, 2),
    tot AS (SELECT source, sum(c) AS t FROM cnt GROUP BY source),
    shared AS (
      SELECT a.source AS s1, b.source AS s2, sum(least(a.c, b.c)) AS cmin
      FROM cnt a JOIN cnt b ON a.w = b.w AND a.source < b.source
      GROUP BY 1, 2),
    bc AS (
      SELECT s1, s2, 1 - 2 * cmin / (ta.t + tb.t) AS bc
      FROM shared JOIN tot ta ON ta.source = s1
      JOIN tot tb ON tb.source = s2)
    SELECT s1, s2, round(bc, 4) AS bray_curtis
    FROM bc ORDER BY bc, s1, s2 LIMIT 10
    """,
    tags=("text", "similarity", "corpus"),
)
def q_bray_curtis_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bray-Curtis dissimilarity between sources' word-count
    profiles: 1 − 2Σmin(xᵥ,yᵥ)/(Σx+Σy) — the abundance-aware
    ecology distance applied to corpus composition (unlike
    jensen_shannon_sources' probability view, Bray-Curtis keeps
    SIZE: a source that is a strict subsample of another still
    registers as dissimilar). The min-overlap needs only words both
    sources SHARE, so the pair computation is a plain inner join on
    word over the |sources|×|vocab| count relation — absent words
    contribute zero to the numerator by construction, no
    densification required; 10 most-similar pairs surface."""
    d = _t(spark, sf_dir, "documents")
    ws = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") >= 1)
    cnt = ws.groupBy("source", "w").agg(F.count("*").cast("double").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("t"))
    a = cnt.select(F.col("source").alias("s1"), "w", F.col("c").alias("ca"))
    b = cnt.select(F.col("source").alias("s2"), "w", F.col("c").alias("cb"))
    shared = (
        a.join(b, "w")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.sum(F.least("ca", "cb")).alias("cmin"))
    )
    ta = tot.select(F.col("source").alias("s1"), F.col("t").alias("t1"))
    tb = tot.select(F.col("source").alias("s2"), F.col("t").alias("t2"))
    bc = (
        shared.join(F.broadcast(ta), "s1")
        .join(F.broadcast(tb), "s2")
        .select(
            "s1",
            "s2",
            (1 - 2 * F.col("cmin") / (F.col("t1") + F.col("t2"))).alias("bc"),
        )
    )
    return (
        bc.orderBy("bc", "s1", "s2")
        .limit(10)
        .select("s1", "s2", F.round("bc", 4).alias("bray_curtis"))
    )


@register(
    "gsea_enrichment_score",
    oracle="""
    WITH partrev AS (
      SELECT l_partkey, sum(l_extendedprice) AS rev
      FROM lineitem GROUP BY 1),
    flagged AS (
      SELECT pr.l_partkey, rev,
             CASE WHEN p_brand = 'Brand#11' THEN 1.0 ELSE 0.0 END AS hit
      FROM partrev pr JOIN part ON pr.l_partkey = p_partkey),
    counts AS (
      SELECT sum(hit) AS nh, CAST(count(*) AS DOUBLE) AS n FROM flagged),
    walk AS (
      SELECT sum(hit / nh - (1 - hit) / (n - nh))
               OVER (ORDER BY rev DESC, l_partkey) AS es
      FROM flagged, counts)
    SELECT CAST((SELECT n FROM counts) AS BIGINT) AS n_parts,
           CAST((SELECT nh FROM counts) AS BIGINT) AS n_members,
           round(max(es), 4) AS es_max,
           round(min(es), 4) AS es_min
    FROM walk
    """,
    tags=("enrichment", "window", "ranking"),
)
def q_gsea_enrichment_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GSEA-style running enrichment score: rank every part by
    revenue, walk the list stepping +1/Nh on a Brand#11 member and
    −1/(N−Nh) otherwise — the max/min of the walk is the enrichment
    score, a KS statistic on ranked set membership (the
    genomics-standard answer to 'does this set concentrate at the
    top of the ranking', here: does the brand live among the
    best-sellers). One prefix-sum window over the |parts| aggregate;
    at fact scale the ranking would use the two-pass range-partition
    prefix-sum (contiguous_ids), never a single-task sort."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    partrev = li.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("rev"))
    flagged = partrev.join(p, partrev["l_partkey"] == p["p_partkey"]).select(
        "l_partkey",
        "rev",
        F.when(F.col("p_brand") == "Brand#11", 1.0).otherwise(0.0).alias("hit"),
    )
    counts = flagged.agg(
        F.sum("hit").alias("nh"), F.count("*").cast("double").alias("n")
    )
    wd = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walk = flagged.join(F.broadcast(counts)).select(
        F.sum(
            F.col("hit") / F.col("nh")
            - (1 - F.col("hit")) / (F.col("n") - F.col("nh"))
        )
        .over(wd)
        .alias("es"),
        "n",
        "nh",
    )
    return walk.groupBy("n", "nh").agg(
        F.round(F.max("es"), 4).alias("es_max"),
        F.round(F.min("es"), 4).alias("es_min"),
    ).select(
        F.col("n").cast("bigint").alias("n_parts"),
        F.col("nh").cast("bigint").alias("n_members"),
        "es_max",
        "es_min",
    )


@register(
    "poisson_bootstrap_ci",
    oracle="""
    WITH reps AS (SELECT unnest(generate_series(1, 50)) AS b),
    weighted AS (
      SELECT b, o_totalprice AS x,
             CASE
               WHEN u < 0.3678794412 THEN 0 WHEN u < 0.7357588823 THEN 1
               WHEN u < 0.9196986029 THEN 2 WHEN u < 0.9810118431 THEN 3
               WHEN u < 0.9963401532 THEN 4 WHEN u < 0.9994058152 THEN 5
               WHEN u < 0.9999167589 THEN 6 ELSE 7 END AS w
      FROM (
        SELECT b, o_totalprice,
               (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#'
                 || CAST(b AS VARCHAR)), 1, 8))::UBIGINT % 4294967296)
               / 4294967296.0 AS u
        FROM orders CROSS JOIN reps) t(b, o_totalprice, u)),
    means AS (
      SELECT b, sum(w * x) / nullif(sum(w), 0) AS m
      FROM weighted GROUP BY b),
    pt AS (SELECT avg(o_totalprice) AS point FROM orders)
    SELECT round(point, 2) AS point_mean,
           CAST(count(*) AS BIGINT) AS n_replicates,
           round(CAST(quantile_cont(m, 0.025) AS DOUBLE), 2) AS ci_lo,
           round(CAST(quantile_cont(m, 0.975) AS DOUBLE), 2) AS ci_hi
    FROM means, pt GROUP BY point
    """,
    tags=("stats", "resampling", "hash"),
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap CI for the mean order value: each of 50
    replicates weights every row by an independent Poisson(1) draw —
    the distributed bootstrap, because Poisson weights need NO
    global n and no sampling-without-replacement coordination (each
    row decides its own weight locally; the classical multinomial
    bootstrap cannot shard). Draws come from bit-exact md5 uniforms
    through the Poisson inverse-CDF threshold ladder, so both
    engines produce the IDENTICAL resamples — a reproducibility
    property real rand() can never give; one shuffle on the 50-value
    replicate key, map-side combined."""
    o = _t(spark, sf_dir, "orders")
    reps = spark.range(1, 51).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        % 4294967296
    ) / 4294967296.0
    w = (
        F.when(F.col("u") < 0.3678794412, 0)
        .when(F.col("u") < 0.7357588823, 1)
        .when(F.col("u") < 0.9196986029, 2)
        .when(F.col("u") < 0.9810118431, 3)
        .when(F.col("u") < 0.9963401532, 4)
        .when(F.col("u") < 0.9994058152, 5)
        .when(F.col("u") < 0.9999167589, 6)
        .otherwise(7)
    )
    weighted = (
        o.crossJoin(F.broadcast(reps))
        .select("b", F.col("o_totalprice").alias("x"), u.alias("u"))
        .select("b", "x", w.alias("w"))
    )
    means = weighted.groupBy("b").agg(
        (F.sum(F.col("w") * F.col("x")) / F.nullif(F.sum("w"), F.lit(0))).alias("m")
    )
    pt = o.agg(F.avg("o_totalprice").alias("point"))
    return means.crossJoin(F.broadcast(pt)).groupBy("point").agg(
        F.count("*").cast("bigint").alias("n_replicates"),
        F.round(F.expr("percentile(m, 0.025)"), 2).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 2).alias("ci_hi"),
    ).select(
        F.round("point", 2).alias("point_mean"),
        "n_replicates",
        "ci_lo",
        "ci_hi",
    )


@register(
    "bandit_replay_eval",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS wk, event_type AS arm,
             avg(value) AS v, CAST(count(*) AS DOUBLE) AS n
      FROM events WHERE event_type IN ('view', 'click', 'signup')
      GROUP BY 1, 2),
    cum AS (
      SELECT wk, arm, v,
             sum(v * n) OVER (PARTITION BY arm ORDER BY wk
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             / nullif(sum(n) OVER (PARTITION BY arm ORDER BY wk
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prior_mean
      FROM weekly),
    pick AS (
      SELECT wk, arm, v,
             row_number() OVER (PARTITION BY wk
                                ORDER BY prior_mean DESC, arm) AS rk,
             prior_mean
      FROM cum WHERE prior_mean IS NOT NULL),
    chosen AS (SELECT wk, v AS policy_v FROM pick WHERE rk = 1),
    uniform AS (
      SELECT wk, avg(v) AS uniform_v FROM pick GROUP BY wk)
    SELECT CAST(count(*) AS BIGINT) AS n_weeks,
           round(avg(policy_v), 4) AS greedy_policy_value,
           round(avg(uniform_v), 4) AS uniform_policy_value,
           round(100 * (avg(policy_v) / avg(uniform_v) - 1), 2) AS lift_pct
    FROM chosen JOIN uniform USING (wk)
    """,
    tags=("ml", "bandit", "window"),
)
def q_bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline bandit evaluation by replay: a greedy policy (each
    week, play the arm with the best cumulative mean value over all
    PRIOR weeks — the 1-preceding frame is the no-peeking guard)
    scored against the uniform policy on the held-out week's actual
    arm means — the counterfactual 'what would greedy have earned'
    answered from logs alone, no live experiment. The policy state
    is a per-arm expanding window over the |weeks|×|arms| aggregate;
    argmax-per-week is a 3-row partition window."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "signup")
    )
    weekly = e.groupBy(
        F.date_trunc("week", F.to_date("ts")).alias("wk"),
        F.col("event_type").alias("arm"),
    ).agg(F.avg("value").alias("v"), F.count("*").cast("double").alias("n"))
    wprior = (
        Window.partitionBy("arm")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = weekly.select(
        "wk",
        "arm",
        "v",
        (
            F.sum(F.col("v") * F.col("n")).over(wprior)
            / F.nullif(F.sum("n").over(wprior), F.lit(0.0))
        ).alias("prior_mean"),
    )
    pick = cum.filter(F.col("prior_mean").isNotNull()).select(
        "wk",
        "arm",
        "v",
        F.row_number()
        .over(Window.partitionBy("wk").orderBy(F.desc("prior_mean"), "arm"))
        .alias("rk"),
    )
    chosen = pick.filter(F.col("rk") == 1).select("wk", F.col("v").alias("policy_v"))
    uniform = pick.groupBy("wk").agg(F.avg("v").alias("uniform_v"))
    return chosen.join(uniform, "wk").agg(
        F.count("*").cast("bigint").alias("n_weeks"),
        F.round(F.avg("policy_v"), 4).alias("greedy_policy_value"),
        F.round(F.avg("uniform_v"), 4).alias("uniform_policy_value"),
        F.round(
            100 * (F.avg("policy_v") / F.avg("uniform_v") - 1), 2
        ).alias("lift_pct"),
    )


@register(
    "l_diversity_audit",
    oracle="""
    WITH sv AS (
      SELECT n_name,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             o_orderpriority AS pri, o_orderstatus AS s,
             CAST(count(*) AS DOUBLE) AS c
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3, 4),
    cls AS (
      SELECT n_name, m, pri,
             CAST(count(*) AS BIGINT) AS l_distinct,
             sum(c) AS grp_n,
             ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
      FROM sv GROUP BY 1, 2, 3)
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN l_distinct < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS homogeneous_classes,
           CAST(sum(CASE WHEN h < ln(2) - 1e-9 THEN 1 ELSE 0 END) AS BIGINT)
             AS below_entropy_l2,
           round(min(h), 4) AS min_entropy,
           CAST(min(l_distinct) AS BIGINT) AS min_l
    FROM cls
    """,
    tags=("privacy", "audit", "agg"),
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the k_anonymity_audit quasi-identifier
    classes with order status as the sensitive attribute: a class
    can be k-anonymous yet HOMOGENEOUS in the sensitive value —
    everyone in it shares the status, so membership alone discloses
    it (the attack k-anonymity provably misses). Reports classes
    with < 2 distinct statuses and classes failing ENTROPY
    l-diversity at l=2 (strictly below ln 2 with an epsilon guard —
    a perfectly balanced 2-value class sits EXACTLY at ln 2 and
    passes, which a bare float < would decide by last-ulp luck),
    using the streaming-friendly identity
    H = ln(n) − Σc·ln(c)/n so the per-class entropy needs only the
    (class, value) count relation — two stacked hash aggregates,
    no windows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sv = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "n_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("s"),
        )
        .agg(F.count("*").cast("double").alias("c"))
    )
    cls = sv.groupBy("n_name", "m", "pri").agg(
        F.count("*").cast("bigint").alias("l_distinct"),
        F.sum("c").alias("grp_n"),
        (
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
        ).alias("h"),
    )
    return cls.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("l_distinct") < 2, 1).otherwise(0))
        .cast("bigint")
        .alias("homogeneous_classes"),
        F.sum(F.when(F.col("h") < F.lit(math.log(2.0) - 1e-9), 1).otherwise(0))
        .cast("bigint")
        .alias("below_entropy_l2"),
        F.round(F.min("h"), 4).alias("min_entropy"),
        F.min("l_distinct").cast("bigint").alias("min_l"),
    )


@register(
    "feature_hashing_cosine",
    oracle="""
    WITH ws AS (
      SELECT source, w
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS w
            FROM documents)
      WHERE length(w) >= 1),
    hashed AS (
      SELECT source,
             ('0x' || substr(md5(w), 1, 8))::UBIGINT % 64 AS bucket,
             CASE WHEN ('0x' || substr(md5(w), 9, 8))::UBIGINT % 2 = 0
                  THEN 1.0 ELSE -1.0 END AS sgn
      FROM ws),
    vec AS (
      SELECT source, bucket, sum(sgn) AS v
      FROM hashed GROUP BY 1, 2),
    nrm AS (SELECT source, sqrt(sum(v * v)) AS nn FROM vec GROUP BY source),
    cos AS (
      SELECT a.source AS s1, b.source AS s2,
             sum(a.v * b.v) / (na.nn * nb.nn) AS cos
      FROM vec a JOIN vec b ON a.bucket = b.bucket AND a.source < b.source
      JOIN nrm na ON na.source = a.source
      JOIN nrm nb ON nb.source = b.source
      GROUP BY 1, 2, na.nn, nb.nn)
    SELECT s1, s2, round(cos, 4) AS cosine
    FROM cos ORDER BY round(cos, 6) DESC, s1, s2 LIMIT 5
    """,
    tags=("text", "hash", "embedding"),
)
def q_feature_hashing_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick as a query: every source's unbounded
    vocabulary is folded into a FIXED 64-dim signed-hash vector
    (bucket from one md5 slice, ±1 sign from another — the signed
    variant keeps collisions unbiased, Weinberger et al.), then
    source similarity is cosine over the tiny |sources|×64 relation.
    This is how text featurization survives 100 TB: no vocabulary
    dictionary to build, broadcast, or grow — the feature space is
    constant-width by construction, and two engines (or two cluster
    generations) hash identically because the bits are md5."""
    d = _t(spark, sf_dir, "documents")
    ws = d.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") >= 1)
    bucket = F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % 64
    sgn = F.when(
        F.conv(F.substring(F.md5("w"), 9, 8), 16, 10).cast("long") % 2 == 0, 1.0
    ).otherwise(-1.0)
    vec = (
        ws.select("source", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("source", "bucket")
        .agg(F.sum("sgn").alias("v"))
    )
    nrm = vec.groupBy("source").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nn"))
    a = vec.select(F.col("source").alias("s1"), "bucket", F.col("v").alias("va"))
    b = vec.select(F.col("source").alias("s2"), "bucket", F.col("v").alias("vb"))
    na = nrm.select(F.col("source").alias("s1"), F.col("nn").alias("n1"))
    nb = nrm.select(F.col("source").alias("s2"), F.col("nn").alias("n2"))
    cos = (
        a.join(b, "bucket")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
        .join(F.broadcast(na), "s1")
        .join(F.broadcast(nb), "s2")
        .select("s1", "s2", (F.col("dot") / (F.col("n1") * F.col("n2"))).alias("cos"))
    )
    return (
        cos.orderBy(F.round(F.col("cos"), 6).desc(), "s1", "s2")
        .limit(5)
        .select("s1", "s2", F.round("cos", 4).alias("cosine"))
    )


@register(
    "count_min_sketch",
    oracle="""
    WITH rows_ AS (SELECT unnest(generate_series(1, 4)) AS j),
    hashed AS (
      SELECT j, l_suppkey AS k,
             ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || '#'
              || CAST(j AS VARCHAR)), 1, 8))::UBIGINT % 64 AS b
      FROM lineitem CROSS JOIN rows_),
    cells AS (
      SELECT j, b, CAST(count(*) AS DOUBLE) AS c
      FROM hashed GROUP BY 1, 2),
    truth AS (
      SELECT l_suppkey AS k, CAST(count(*) AS DOUBLE) AS exact
      FROM lineitem GROUP BY 1),
    keybits AS (
      SELECT DISTINCT t.k, r.j,
             ('0x' || substr(md5(CAST(t.k AS VARCHAR) || '#'
              || CAST(r.j AS VARCHAR)), 1, 8))::UBIGINT % 64 AS b
      FROM truth t CROSS JOIN rows_ r),
    est AS (
      SELECT kb.k, min(c.c) AS est
      FROM keybits kb JOIN cells c ON kb.j = c.j AND kb.b = c.b
      GROUP BY kb.k)
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN est = exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact,
           round(avg(est / exact), 4) AS mean_over_ratio,
           round(max(est / exact), 4) AS max_over_ratio
    FROM est JOIN truth USING (k)
    """,
    tags=("sketch", "approx", "hash"),
)
def q_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch built relationally and audited against exact
    counts: d=4 hash rows × w=64 buckets (each row's cells are one
    hash aggregate over md5 buckets), a key's estimate is the MIN
    over its 4 cells, and the one-sided overestimate guarantee
    (est ≥ exact always, n_exact counts collision-free keys) is
    verified key by key. CMS cells merge by ADDITION, so the sketch
    distributes exactly like a sum — the frequency twin of the
    membership Bloom filter (bloom_filter_fpr) and cardinality KMV
    (kmv_distinct_estimate); all four hash rows come out of one
    scan because the row index is just a crossed-in column."""
    li = _t(spark, sf_dir, "lineitem")
    rows_ = spark.range(1, 5).select(F.col("id").cast("int").alias("j"))

    def hb(key, j):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(key.cast("string"), F.lit("#"), j.cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 64
        )

    hashed = li.crossJoin(F.broadcast(rows_)).select(
        "j", F.col("l_suppkey").alias("k"), hb(F.col("l_suppkey"), F.col("j")).alias("b")
    )
    cells = hashed.groupBy("j", "b").agg(
        F.count("*").cast("double").alias("c")
    )
    truth = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count("*").cast("double").alias("exact")
    )
    keybits = truth.select("k").crossJoin(F.broadcast(rows_)).select(
        "k", "j", hb(F.col("k"), F.col("j")).alias("b")
    )
    est = (
        keybits.join(cells, ["j", "b"])
        .groupBy("k")
        .agg(F.min("c").alias("est"))
    )
    return est.join(truth, "k").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("est") == F.col("exact"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.round(F.avg(F.col("est") / F.col("exact")), 4).alias("mean_over_ratio"),
        F.round(F.max(F.col("est") / F.col("exact")), 4).alias("max_over_ratio"),
    )


@register(
    "event_study_abnormal",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    ev AS (
      SELECT CAST(concat(CAST(y AS VARCHAR), '-01-01') AS DATE) AS e
      FROM (SELECT unnest(generate_series(1993, 1997)) AS y)),
    win AS (
      SELECT ev.e, daily.d, daily.v,
             date_diff('day', ev.e, daily.d) AS rel
      FROM daily JOIN ev
        ON daily.d BETWEEN ev.e - 30 AND ev.e + 10),
    base AS (
      SELECT e, avg(CASE WHEN rel BETWEEN -30 AND -11 THEN v END) AS b
      FROM win GROUP BY e),
    ab AS (
      SELECT rel, 100.0 * (v - b) / b AS pct
      FROM win JOIN base USING (e)
      WHERE rel BETWEEN -10 AND 10)
    SELECT CAST(rel AS BIGINT) AS rel_day,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(pct), 2) AS mean_abnormal_pct
    FROM ab GROUP BY rel
    """,
    tags=("timeseries", "causal", "events"),
)
def q_event_study_abnormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study abnormal revenue around each New Year (5 event
    dates, ±10-day window): per event the counterfactual baseline
    is the −30..−11 pre-window mean, daily abnormal % is averaged
    ACROSS events per relative day — the finance event-study design
    (MacKinlay) that separates the event's effect from level
    differences between years, and the grown-up version of a naive
    before/after mean split. The event×day alignment is a bounded
    range join on the |dates| aggregate; baselines are a 5-row
    broadcast."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    ev = spark.createDataFrame(
        [(f"{y}-01-01",) for y in range(1993, 1998)], "e string"
    ).select(F.col("e").cast("date").alias("e"))
    win = daily.join(
        F.broadcast(ev),
        (F.col("d") >= F.date_sub(F.col("e"), 30))
        & (F.col("d") <= F.date_add(F.col("e"), 10)),
    ).select("e", "d", "v", F.datediff(F.col("d"), F.col("e")).alias("rel"))
    base = win.groupBy("e").agg(
        F.avg(F.when(F.col("rel").between(-30, -11), F.col("v"))).alias("b")
    )
    ab = (
        win.join(F.broadcast(base), "e")
        .filter(F.col("rel").between(-10, 10))
        .select("rel", (100.0 * (F.col("v") - F.col("b")) / F.col("b")).alias("pct"))
    )
    return ab.groupBy(F.col("rel").cast("bigint").alias("rel_day")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.avg("pct"), 2).alias("mean_abnormal_pct"),
    )


@register(
    "weight_of_evidence_iv",
    oracle="""
    WITH cells AS (
      SELECT l_discount AS disc,
             CAST(count(*) FILTER (WHERE l_returnflag <> 'R') AS DOUBLE) AS g,
             CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS b
      FROM lineitem GROUP BY 1),
    tot AS (SELECT sum(g) AS tg, sum(b) AS tb FROM cells),
    woe AS (
      SELECT disc, g + b AS n,
             ln((g / tg) / (b / tb)) AS woe,
             (g / tg - b / tb) * ln((g / tg) / (b / tb)) AS ivc
      FROM cells, tot)
    SELECT round(disc, 2) AS discount,
           CAST(n AS BIGINT) AS n_rows,
           round(woe, 4) AS woe,
           round(ivc, 6) AS iv_contribution
    FROM woe
    """,
    tags=("ml", "binning", "feature"),
)
def q_weight_of_evidence_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information value per discount level for
    predicting returns — the credit-scoring featurization standard:
    WoE = ln(%good/%bad) turns a categorical bin into a monotone
    log-odds score (what logistic regression wants), and the IV
    contributions (Σ is the variable's screening power: <0.02
    useless, >0.3 strong) decide whether the column enters the
    model at all. One conditional-aggregate histogram over the
    fact; the WoE table itself is what gets broadcast back to
    encode the feature at scoring time — the encode step is a
    |bins|-row broadcast join, never a shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(F.col("l_discount").alias("disc")).agg(
        F.count_if(F.col("l_returnflag") != "R").cast("double").alias("g"),
        F.count_if(F.col("l_returnflag") == "R").cast("double").alias("b"),
    )
    tot = cells.agg(F.sum("g").alias("tg"), F.sum("b").alias("tb"))
    pg = F.col("g") / F.col("tg")
    pb = F.col("b") / F.col("tb")
    return cells.join(F.broadcast(tot)).select(
        F.round("disc", 2).alias("discount"),
        (F.col("g") + F.col("b")).cast("bigint").alias("n_rows"),
        F.round(F.log(pg / pb), 4).alias("woe"),
        F.round((pg - pb) * F.log(pg / pb), 6).alias("iv_contribution"),
    )


@register(
    "stratified_kfold",
    oracle="""
    WITH folds AS (
      SELECT label,
             ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))::UBIGINT % 5
               AS fold
      FROM embeddings),
    cells AS (
      SELECT fold, label, CAST(count(*) AS DOUBLE) AS c
      FROM folds GROUP BY 1, 2),
    fl AS (SELECT fold, sum(c) AS nf FROM cells GROUP BY fold),
    lt AS (SELECT label, sum(c) AS nl FROM cells GROUP BY label),
    tot AS (SELECT sum(c) AS n FROM cells),
    chi AS (
      SELECT fold, any_value(nf) AS nf,
             sum(pow(c - nf * nl / n, 2) / (nf * nl / n)) AS chi2
      FROM cells JOIN fl USING (fold) JOIN lt USING (label), tot
      GROUP BY fold)
    SELECT CAST(fold AS BIGINT) AS fold, CAST(nf AS BIGINT) AS n_rows,
           round(chi2, 4) AS label_balance_chi2
    FROM chi
    """,
    tags=("ml", "sampling", "split"),
)
def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation assignment by content hash with a
    per-fold label-balance audit: fold membership is the md5-bucket
    device (deterministic — a vector keeps its fold across runs,
    clusters, and engines, so CV results are reproducible), and each
    fold's χ² against the global label distribution quantifies how
    far plain hashing lands from perfect stratification — the check
    that tells you whether you actually need the heavier per-label
    round-robin. Fold and label marginals re-aggregate from the
    5×10 cell relation."""
    e = _t(spark, sf_dir, "embeddings")
    folds = e.select("label", CUR.hash_bucket(F.col("vec_id"), 5).alias("fold"))
    cells = folds.groupBy("fold", "label").agg(
        F.count("*").cast("double").alias("c")
    )
    fl = cells.groupBy("fold").agg(F.sum("c").alias("nf"))
    lt = cells.groupBy("label").agg(F.sum("c").alias("nl"))
    tot = cells.agg(F.sum("c").alias("n"))
    exp = F.col("nf") * F.col("nl") / F.col("n")
    chi = (
        cells.join(F.broadcast(fl), "fold")
        .join(F.broadcast(lt), "label")
        .crossJoin(F.broadcast(tot))
        .groupBy("fold")
        .agg(
            F.first("nf").alias("nf"),
            F.sum(F.pow(F.col("c") - exp, 2) / exp).alias("chi2"),
        )
    )
    return chi.select(
        F.col("fold").cast("bigint").alias("fold"),
        F.col("nf").cast("bigint").alias("n_rows"),
        F.round("chi2", 4).alias("label_balance_chi2"),
    )


@register(
    "wilcoxon_signed_rank",
    oracle="""
    WITH py AS (
      SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS yr,
             sum(l_extendedprice) / sum(l_quantity) AS p
      FROM lineitem
      WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)
        AND l_quantity > 0
      GROUP BY 1, 2),
    d AS (
      SELECT a.l_partkey, b.p - a.p AS diff
      FROM py a JOIN py b
        ON a.l_partkey = b.l_partkey AND a.yr = 1996 AND b.yr = 1997
      WHERE b.p <> a.p),
    r AS (
      SELECT diff,
             CAST(row_number() OVER (ORDER BY abs(diff), l_partkey)
                  AS DOUBLE) AS rk
      FROM d),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(CASE WHEN diff > 0 THEN rk ELSE 0 END) AS wplus
      FROM r)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(wplus AS BIGINT) AS w_plus,
           round((wplus - n * (n + 1) / 4)
                 / sqrt(n * (n + 1) * (2 * n + 1) / 24), 4) AS z_score
    FROM s
    """,
    tags=("stats", "nonparametric", "window"),
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired per-part unit prices
    (1996 vs 1997): rank the |differences|, sum the ranks of
    positive ones, normal-approximate — the paired nonparametric
    test that respects magnitude ordering where the sign test
    throws it away and the paired t-test assumes normality
    (completing the nonparametric family: Mann-Whitney/AUC for two
    independent samples, Kruskal-Wallis for k, Friedman for blocked,
    THIS for paired). The pairing is a year-keyed self-join on the
    |parts| aggregate; the single ranking window runs on |parts|
    rows, never the fact table."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.year(F.col("l_shipdate").cast("date")).isin(1996, 1997))
        & (F.col("l_quantity") > 0)
    )
    py = li.groupBy(
        "l_partkey", F.year(F.col("l_shipdate").cast("date")).alias("yr")
    ).agg((F.sum("l_extendedprice") / F.sum("l_quantity")).alias("p"))
    a = py.filter(F.col("yr") == 1996).select("l_partkey", F.col("p").alias("p0"))
    b = py.filter(F.col("yr") == 1997).select("l_partkey", F.col("p").alias("p1"))
    d = (
        a.join(b, "l_partkey")
        .filter(F.col("p1") != F.col("p0"))
        .select("l_partkey", (F.col("p1") - F.col("p0")).alias("diff"))
    )
    r = d.select(
        "diff",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("diff")), "l_partkey"))
        .cast("double")
        .alias("rk"),
    )
    s = r.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("rk")).otherwise(0.0)).alias("wplus"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("wplus").cast("bigint").alias("w_plus"),
        F.round(
            (F.col("wplus") - F.col("n") * (F.col("n") + 1) / 4)
            / F.sqrt(F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24),
            4,
        ).alias("z_score"),
    )


@register(
    "friedman_test",
    oracle="""
    WITH cell AS (
      SELECT n_name, year(CAST(o_orderdate AS DATE)) AS yr,
             sum(o_totalprice) AS r
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1993 AND 1997
      GROUP BY 1, 2),
    ranked AS (
      SELECT n_name, yr,
             CAST(row_number() OVER (PARTITION BY n_name ORDER BY r, yr)
                  AS DOUBLE) AS rk
      FROM cell),
    rj AS (SELECT yr, sum(rk) AS rsum FROM ranked GROUP BY yr),
    dims AS (
      SELECT CAST(count(DISTINCT n_name) AS DOUBLE) AS n,
             CAST(count(DISTINCT yr) AS DOUBLE) AS k
      FROM cell)
    SELECT CAST(n AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k_treatments,
           round(12 / (n * k * (k + 1)) * sum(rsum * rsum)
                 - 3 * n * (k + 1), 4) AS friedman_chi2
    FROM rj, dims GROUP BY n, k
    """,
    tags=("stats", "nonparametric", "rank"),
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test: do the five years differ in revenue when each
    NATION serves as its own block? Within-block ranks (each nation
    ranks its five years 1..5 — a 5-row partition window, perfectly
    parallel) sum per year into the χ²_F statistic — the
    nonparametric repeated-measures ANOVA that cancels all
    between-nation level differences by construction, where
    kruskal_wallis_h would confound them with the year effect. The
    fact table contributes one (nation, year) aggregate; everything
    else is 125 rows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cell = (
        o.filter(F.year(F.col("o_orderdate").cast("date")).between(1993, 1997))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year(F.col("o_orderdate").cast("date")).alias("yr"))
        .agg(F.sum("o_totalprice").alias("r"))
    )
    ranked = cell.select(
        "n_name",
        "yr",
        F.row_number()
        .over(Window.partitionBy("n_name").orderBy("r", "yr"))
        .cast("double")
        .alias("rk"),
    )
    rj = ranked.groupBy("yr").agg(F.sum("rk").alias("rsum"))
    dims = cell.agg(
        F.count_distinct("n_name").cast("double").alias("n"),
        F.count_distinct("yr").cast("double").alias("k"),
    )
    return rj.crossJoin(F.broadcast(dims)).groupBy("n", "k").agg(
        F.round(
            12
            / (F.col("n") * F.col("k") * (F.col("k") + 1))
            * F.sum(F.col("rsum") * F.col("rsum"))
            - 3 * F.col("n") * (F.col("k") + 1),
            4,
        ).alias("friedman_chi2")
    ).select(
        F.col("n").cast("bigint").alias("n_blocks"),
        F.col("k").cast("bigint").alias("k_treatments"),
        "friedman_chi2",
    )


@register(
    "popularity_recsys_hitrate",
    oracle="""
    WITH train AS (
      SELECT l_partkey, count(*) AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      GROUP BY 1),
    topk AS (
      SELECT l_partkey FROM train
      ORDER BY c DESC, l_partkey LIMIT 10),
    test AS (
      SELECT o_orderkey, l_partkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'),
    per_order AS (
      SELECT o_orderkey,
             max(CASE WHEN l_partkey IN (SELECT l_partkey FROM topk)
                      THEN 1 ELSE 0 END) AS hit,
             sum(CASE WHEN l_partkey IN (SELECT l_partkey FROM topk)
                      THEN 1 ELSE 0 END) AS n_hits
      FROM test GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_test_orders,
           CAST(sum(hit) AS BIGINT) AS orders_with_hit,
           round(avg(CAST(hit AS DOUBLE)), 4) AS hit_rate_at_10,
           round(sum(n_hits) / CAST(nullif(sum(hit), 0) AS DOUBLE), 3)
             AS hits_per_hit_order
    FROM per_order
    """,
    tags=("ml", "eval", "semijoin"),
)
def q_popularity_recsys_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation with a TEMPORAL split (train
    < 1997, test ≥ 1997 — random splits leak future popularity into
    the past, the classic recsys eval bug): the top-10-popularity
    recommender scored by hit-rate@10 over test orders — the
    baseline every learned recommender must beat before it earns
    its serving cost. The candidate list is a broadcast top-k; test
    membership is a semi-join shape (max-over-IN), one aggregate
    per test order."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderkey", "l_partkey", F.col("o_orderdate").cast("date").alias("d")
    )
    train = (
        j.filter(F.col("d") < "1997-01-01")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
    )
    topk = train.orderBy(F.desc("c"), "l_partkey").limit(10).select(
        "l_partkey", F.lit(1).alias("in_top")
    )
    test = j.filter(F.col("d") >= "1997-01-01")
    per_order = (
        test.join(F.broadcast(topk), "l_partkey", "left")
        .groupBy("o_orderkey")
        .agg(
            F.max(F.coalesce("in_top", F.lit(0))).alias("hit"),
            F.sum(F.coalesce("in_top", F.lit(0))).alias("n_hits"),
        )
    )
    return per_order.agg(
        F.count("*").cast("bigint").alias("n_test_orders"),
        F.sum("hit").cast("bigint").alias("orders_with_hit"),
        F.round(F.avg(F.col("hit").cast("double")), 4).alias("hit_rate_at_10"),
        F.round(
            F.sum("n_hits") / F.nullif(F.sum("hit"), F.lit(0)).cast("double"), 3
        ).alias("hits_per_hit_order"),
    )


@register(
    "loo_source_influence",
    oracle="""
    WITH per_doc AS (
      SELECT source,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
               AS x
      FROM documents),
    gl AS (SELECT sum(x) AS sx, CAST(count(*) AS DOUBLE) AS n,
                  avg(x) AS m FROM per_doc),
    per_src AS (
      SELECT source, sum(x) AS sxs, CAST(count(*) AS DOUBLE) AS ns
      FROM per_doc GROUP BY source)
    SELECT source, CAST(ns AS BIGINT) AS n_docs,
           round((sx - sxs) / (n - ns), 2) AS loo_mean_tokens,
           round((sx - sxs) / (n - ns) - m, 3) AS influence
    FROM per_src, gl
    """,
    tags=("curation", "eval", "agg"),
)
def q_loo_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on the corpus mean token
    count: for EVERY source, the metric recomputed without it —
    via the algebraic identity (Σx − Σx_s)/(n − n_s), so all 20
    counterfactuals come from ONE fact aggregate plus a broadcast
    global row, not 20 re-scans (the trick that makes data-valuation
    sweeps tractable at corpus scale; the same algebra powers
    jackknife_cluster_se). A positive influence means dropping the
    source RAISES mean document length — the screening signal for
    which crawl is dragging the mix."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select("source", TXT.token_count(F.col("text")).cast("double").alias("x"))
    gl = per_doc.agg(
        F.sum("x").alias("sx"),
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("m"),
    )
    per_src = per_doc.groupBy("source").agg(
        F.sum("x").alias("sxs"), F.count("*").cast("double").alias("ns")
    )
    loo = (F.col("sx") - F.col("sxs")) / (F.col("n") - F.col("ns"))
    return per_src.crossJoin(F.broadcast(gl)).select(
        "source",
        F.col("ns").cast("bigint").alias("n_docs"),
        F.round(loo, 2).alias("loo_mean_tokens"),
        F.round(loo - F.col("m"), 3).alias("influence"),
    )


@register(
    "sprt_boundary_crossing",
    oracle="""
    WITH base AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS DOUBLE)
               AS y,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1),
    p0t AS (SELECT sum(y) / sum(n) AS p0 FROM base),
    llr AS (
      SELECT d,
             sum(y * ln(least(1.1 * p0, 0.999) / p0)
                 + (n - y) * ln((1 - least(1.1 * p0, 0.999)) / (1 - p0)))
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
      FROM base, p0t),
    crossed AS (
      SELECT min(CASE WHEN cum >= ln((1 - 0.2) / 0.05) THEN d END) AS up,
             min(CASE WHEN cum <= ln(0.2 / (1 - 0.05)) THEN d END) AS dn,
             any_value(p0) AS p0
      FROM llr, p0t GROUP BY p0)
    SELECT round(p0, 5) AS p0,
           CASE WHEN up IS NOT NULL AND (dn IS NULL OR up <= dn)
                  THEN 'accept_h1'
                WHEN dn IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           strftime(least(coalesce(up, DATE '9999-01-01'),
                          coalesce(dn, DATE '9999-01-01')), '%Y-%m-%d')
             AS first_crossing
    FROM crossed
    """,
    tags=("stats", "experimentation", "window"),
)
def q_sprt_boundary_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test on the daily
    purchase share (H₁: rate is 10% higher than the pooled H₀): the
    cumulative log-likelihood ratio walks until it exits Wald's
    boundaries ln((1−β)/α) / ln(β/(1−α)) (α=5%, β=20%) — THE
    always-valid sequential test (its error bounds survive daily
    peeking, the property fixed-horizon t-tests lose the first time
    someone looks early). One prefix window over the |dates|
    aggregate; the decision CASE reproduces which boundary was hit
    first. Cf. cusum_changepoint/page_hinkley_drift, which detect
    shifts — SPRT DECIDES between hypotheses with guaranteed
    α/β."""
    e = _t(spark, sf_dir, "events")
    base = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.count_if(F.col("event_type") == "purchase").cast("double").alias("y"),
        F.count("*").cast("double").alias("n"),
    )
    p0t = base.agg((F.sum("y") / F.sum("n")).alias("p0"))
    p1 = F.least(1.1 * F.col("p0"), F.lit(0.999))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    llr = base.crossJoin(F.broadcast(p0t)).select(
        "d",
        "p0",
        F.sum(
            F.col("y") * F.log(p1 / F.col("p0"))
            + (F.col("n") - F.col("y")) * F.log((1 - p1) / (1 - F.col("p0")))
        )
        .over(wcum)
        .alias("cum"),
    )
    up_b = math.log((1 - 0.2) / 0.05)
    dn_b = math.log(0.2 / (1 - 0.05))
    crossed = llr.groupBy("p0").agg(
        F.min(F.when(F.col("cum") >= up_b, F.col("d"))).alias("up"),
        F.min(F.when(F.col("cum") <= dn_b, F.col("d"))).alias("dn"),
    )
    far = F.lit("9999-01-01").cast("date")
    return crossed.select(
        F.round("p0", 5).alias("p0"),
        F.when(
            F.col("up").isNotNull()
            & (F.col("dn").isNull() | (F.col("up") <= F.col("dn"))),
            "accept_h1",
        )
        .when(F.col("dn").isNotNull(), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        F.date_format(
            F.least(F.coalesce("up", far), F.coalesce("dn", far)), "yyyy-MM-dd"
        ).alias("first_crossing"),
    )


@register(
    "secretary_rule_eval",
    oracle="""
    WITH seq AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             o_totalprice AS v,
             row_number() OVER (
               PARTITION BY date_trunc('month', CAST(o_orderdate AS DATE))
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn
      FROM orders),
    stats AS (
      SELECT m, CAST(count(*) AS DOUBLE) AS n, max(v) AS best
      FROM seq GROUP BY m),
    obs AS (
      SELECT seq.m, max(v) AS obs_max
      FROM seq JOIN stats USING (m)
      WHERE rn <= ceil(0.37 * n) GROUP BY seq.m),
    picks AS (
      SELECT seq.m,
             min(CASE WHEN rn > ceil(0.37 * n) AND v > obs_max
                      THEN rn END) AS pick_rn
      FROM seq JOIN stats USING (m) JOIN obs USING (m)
      GROUP BY seq.m),
    outcome AS (
      SELECT p.m,
             CASE WHEN pick_rn IS NULL THEN 0
                  WHEN (SELECT v FROM seq s
                        WHERE s.m = p.m AND s.rn = p.pick_rn) = st.best
                  THEN 1 ELSE 0 END AS success
      FROM picks p JOIN stats st USING (m))
    SELECT CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(success) AS BIGINT) AS n_best_picked,
           round(avg(CAST(success AS DOUBLE)), 4) AS success_rate
    FROM outcome
    """,
    tags=("decision", "window", "sequence"),
)
def q_secretary_rule_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 37% optimal-stopping rule replayed on real arrival order:
    each month, observe the first ⌈0.37n⌉ orders, then commit to
    the first one that beats the observation-phase maximum — did it
    capture the month's true best? Classical theory promises ≈1/e ≈
    37% success picking the single best; the replay measures it
    empirically — the sequential-hiring model behind accept/reject
    decisions made without seeing the future. Per-month windows
    partition-parallelize; the pick resolution is a conditional-min
    join back onto the sequence relation."""
    o = _t(spark, sf_dir, "orders")
    seq = o.select(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
        F.col("o_totalprice").alias("v"),
        F.row_number()
        .over(
            Window.partitionBy(
                F.date_trunc("month", F.col("o_orderdate").cast("date"))
            ).orderBy(F.col("o_orderdate").cast("date"), "o_orderkey")
        )
        .alias("rn"),
    )
    stats = seq.groupBy("m").agg(
        F.count("*").cast("double").alias("n"), F.max("v").alias("best")
    )
    cut = F.ceil(0.37 * F.col("n"))
    obs = (
        seq.join(F.broadcast(stats), "m")
        .filter(F.col("rn") <= cut)
        .groupBy("m")
        .agg(F.max("v").alias("obs_max"))
    )
    picks = (
        seq.join(F.broadcast(stats), "m")
        .join(F.broadcast(obs), "m")
        .groupBy("m")
        .agg(
            F.min(
                F.when(
                    (F.col("rn") > cut) & (F.col("v") > F.col("obs_max")),
                    F.col("rn"),
                )
            ).alias("pick_rn")
        )
    )
    picked_v = seq.select(
        "m", F.col("rn").alias("pick_rn"), F.col("v").alias("picked")
    )
    outcome = (
        picks.join(F.broadcast(stats.select("m", "best")), "m")
        .join(picked_v, ["m", "pick_rn"], "left")
        .select(
            F.when(
                F.col("pick_rn").isNotNull() & (F.col("picked") == F.col("best")), 1
            )
            .otherwise(0)
            .alias("success")
        )
    )
    return outcome.agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.sum("success").cast("bigint").alias("n_best_picked"),
        F.round(F.avg(F.col("success").cast("double")), 4).alias("success_rate"),
    )


@register(
    "yule_walker_ar2",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT v,
             lag(v, 1) OVER (ORDER BY d) AS v1,
             lag(v, 2) OVER (ORDER BY d) AS v2
      FROM daily),
    ac AS (
      SELECT corr(v, v1) AS r1,
             corr(v, v2) AS r2
      FROM lagged WHERE v2 IS NOT NULL),
    fit AS (
      SELECT r1, r2,
             r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi2
      FROM ac)
    SELECT round(r1, 5) AS acf_lag1, round(r2, 5) AS acf_lag2,
           round(phi1, 5) AS phi1, round(phi2, 5) AS phi2,
           (phi2 > -1 AND phi1 + phi2 < 1 AND phi2 - phi1 < 1)
             AS stationary
    FROM fit
    """,
    tags=("timeseries", "forecast", "stats"),
)
def q_yule_walker_ar2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) fit by Yule-Walker: the two autocorrelations (lag
    windows + corr, as in acf_daily_revenue) solved through the
    closed-form 2×2 system φ₁=r₁(1−r₂)/(1−r₁²), φ₂=(r₂−r₁²)/(1−r₁²)
    — a real autoregressive model fit with NO optimizer, plus the
    stationarity-triangle check (φ₂±φ₁<1, |φ₂|<1) that says whether
    the fitted process is even valid. The window runs on the
    |dates| aggregate; the 'model training' is arithmetic on a
    1-row relation — forecasting's counterexample to 'you need an
    ML runtime for this'."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "v",
        F.lag("v", 1).over(w).alias("v1"),
        F.lag("v", 2).over(w).alias("v2"),
    ).filter(F.col("v2").isNotNull())
    ac = lagged.agg(F.corr("v", "v1").alias("r1"), F.corr("v", "v2").alias("r2"))
    phi1 = F.col("r1") * (1 - F.col("r2")) / (1 - F.col("r1") * F.col("r1"))
    phi2 = (F.col("r2") - F.col("r1") * F.col("r1")) / (
        1 - F.col("r1") * F.col("r1")
    )
    return ac.select(
        F.round("r1", 5).alias("acf_lag1"),
        F.round("r2", 5).alias("acf_lag2"),
        F.round(phi1, 5).alias("phi1"),
        F.round(phi2, 5).alias("phi2"),
        (
            (phi2 > -1) & (phi1 + phi2 < 1) & (phi2 - phi1 < 1)
        ).alias("stationary"),
    )


@register(
    "capacity_crossing_forecast",
    oracle="""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d, sum(l_quantity) AS q
      FROM lineitem GROUP BY 1),
    cum AS (
      SELECT d,
             CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS i,
             sum(q) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS c
      FROM daily),
    bounds AS (SELECT max(i) AS imax, max(d) AS dmax, max(c) AS ctot
               FROM cum),
    fit AS (
      SELECT regr_slope(c, i) AS a, regr_intercept(c, i) AS b
      FROM cum, bounds WHERE i > imax - 365),
    fc AS (
      SELECT a, b, ctot, dmax, imax,
             (1.5 * ctot - b) / a AS icross
      FROM fit, bounds)
    SELECT round(a, 2) AS daily_growth_rate,
           CAST(ctot AS BIGINT) AS current_total,
           CAST(CAST(1.5 * ctot AS BIGINT) AS BIGINT) AS capacity,
           CAST(CAST(ceil(icross - imax) AS BIGINT) AS BIGINT)
             AS days_to_capacity,
           strftime(dmax + CAST(CAST(ceil(icross - imax) AS INT) AS INT),
                    '%Y-%m-%d') AS crossing_date
    FROM fc
    """,
    tags=("sre", "forecast", "regression"),
)
def q_capacity_crossing_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-exhaustion forecast — the 'when do we run out of
    disk' query: fit a linear trend (regr_slope/intercept) to the
    cumulative volume over the trailing 365 days and solve for the
    day the line crosses 1.5× today's total, reported as an actual
    calendar date and a days-remaining countdown. The cumulative
    series is one prefix window over the |dates| aggregate, the fit
    is one regr_* aggregate over the trailing slice, and the
    crossing is closed-form — the whole capacity model is three
    tiny relations, refreshable every night at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").cast("date").alias("d")).agg(
        F.sum("l_quantity").alias("q")
    )
    w = Window.orderBy("d")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        F.row_number().over(w).cast("double").alias("i"),
        F.sum("q").over(wc).alias("c"),
    )
    bounds = cum.agg(
        F.max("i").alias("imax"), F.max("d").alias("dmax"), F.max("c").alias("ctot")
    )
    fit = (
        cum.crossJoin(F.broadcast(bounds))
        .filter(F.col("i") > F.col("imax") - 365)
        .agg(
            F.expr("regr_slope(c, i)").alias("a"),
            F.expr("regr_intercept(c, i)").alias("b"),
        )
    )
    fc = fit.crossJoin(F.broadcast(bounds)).select(
        "a",
        "ctot",
        "dmax",
        "imax",
        ((1.5 * F.col("ctot") - F.col("b")) / F.col("a")).alias("icross"),
    )
    days = F.ceil(F.col("icross") - F.col("imax"))
    return fc.select(
        F.round("a", 2).alias("daily_growth_rate"),
        F.col("ctot").cast("bigint").alias("current_total"),
        (1.5 * F.col("ctot")).cast("bigint").alias("capacity"),
        days.cast("bigint").alias("days_to_capacity"),
        F.date_format(
            F.date_add(F.col("dmax"), days.cast("int")), "yyyy-MM-dd"
        ).alias("crossing_date"),
    )


@register(
    "srm_check",
    oracle="""
    WITH assigned AS (
      SELECT DISTINCT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2
               AS arm
      FROM events),
    counts AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS nb
      FROM assigned)
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(na AS BIGINT) AS arm_a,
           CAST(nb AS BIGINT) AS arm_b,
           round(pow(na - n / 2, 2) / (n / 2)
                 + pow(nb - n / 2, 2) / (n / 2), 4) AS srm_chi2,
           (pow(na - n / 2, 2) / (n / 2)
            + pow(nb - n / 2, 2) / (n / 2)) > 3.841 AS srm_detected
    FROM counts
    """,
    tags=("experimentation", "audit", "hash"),
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the experiment-platform guard
    that runs BEFORE any metric is read: users assigned 50/50 by
    content hash, observed arm counts χ²-tested against the design
    ratio (1 df, 3.84 at 95%) — an SRM flag means the assignment or
    logging pipeline is dropping users non-randomly and every
    downstream p-value is garbage. Assignment is deduped to the
    user grain first (event-weighted counts would test the wrong
    thing); one distinct + one aggregate."""
    e = _t(spark, sf_dir, "events")
    assigned = e.select(
        "user_id", CUR.hash_bucket(F.col("user_id"), 2).alias("arm")
    ).distinct()
    counts = assigned.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("double")
        .alias("nb"),
    )
    chi2 = F.pow(F.col("na") - F.col("n") / 2, 2) / (F.col("n") / 2) + F.pow(
        F.col("nb") - F.col("n") / 2, 2
    ) / (F.col("n") / 2)
    return counts.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("na").cast("bigint").alias("arm_a"),
        F.col("nb").cast("bigint").alias("arm_b"),
        F.round(chi2, 4).alias("srm_chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


@register(
    "regression_discontinuity",
    oracle="""
    WITH outcome AS (
      SELECT l_orderkey,
             CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS DOUBLE) AS y
      FROM lineitem GROUP BY 1),
    obs AS (
      SELECT o_totalprice - 150000 AS x, y,
             CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END AS side
      FROM orders JOIN outcome ON o_orderkey = l_orderkey
      WHERE o_totalprice BETWEEN 50000 AND 250000),
    fits AS (
      SELECT side, CAST(count(*) AS BIGINT) AS n,
             regr_intercept(y, x) AS a, regr_slope(y, x) AS b
      FROM obs GROUP BY side),
    wide AS (
      SELECT max(CASE WHEN side = 0 THEN a END) AS a_left,
             max(CASE WHEN side = 1 THEN a END) AS a_right,
             max(CASE WHEN side = 0 THEN n END) AS n_left,
             max(CASE WHEN side = 1 THEN n END) AS n_right
      FROM fits)
    SELECT n_left, n_right,
           round(a_left, 5) AS rate_at_cutoff_left,
           round(a_right, 5) AS rate_at_cutoff_right,
           round(a_right - a_left, 5) AS rdd_estimate
    FROM wide
    """,
    tags=("causal", "regression", "experimentation"),
)
def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at the 150k order-value
    cutoff: local linear fits of the return rate on the centered
    running variable, separately per side within a ±100k bandwidth;
    the treatment-effect estimate is the jump between the two
    intercepts AT the cutoff — the quasi-experimental design that
    identifies causality from a threshold rule alone, completing
    the causal tier (difference_in_differences for parallel trends,
    event_study_abnormal for time, fixed_effects_within for group
    confounders, RDD for thresholds). Both fits are regr_*
    aggregates over one filtered scan; the side pivot is a 2-row
    conditional max."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    outcome = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("double")
        .alias("y")
    )
    obs = (
        o.join(outcome, o["o_orderkey"] == outcome["l_orderkey"])
        .filter(F.col("o_totalprice").between(50000, 250000))
        .select(
            (F.col("o_totalprice") - 150000).alias("x"),
            "y",
            F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0).alias("side"),
        )
    )
    fits = obs.groupBy("side").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("regr_intercept(y, x)").alias("a"),
    )
    wide = fits.agg(
        F.max(F.when(F.col("side") == 0, F.col("a"))).alias("a_left"),
        F.max(F.when(F.col("side") == 1, F.col("a"))).alias("a_right"),
        F.max(F.when(F.col("side") == 0, F.col("n"))).alias("n_left"),
        F.max(F.when(F.col("side") == 1, F.col("n"))).alias("n_right"),
    )
    return wide.select(
        "n_left",
        "n_right",
        F.round("a_left", 5).alias("rate_at_cutoff_left"),
        F.round("a_right", 5).alias("rate_at_cutoff_right"),
        F.round(F.col("a_right") - F.col("a_left"), 5).alias("rdd_estimate"),
    )


@register(
    "energy_distance_two_sample",
    oracle="""
    WITH a AS (SELECT p_retailprice AS v FROM part WHERE p_brand = 'Brand#11'),
    b AS (SELECT p_retailprice AS v FROM part WHERE p_brand = 'Brand#22'),
    ha AS (SELECT v, CAST(count(*) AS DOUBLE) AS c FROM a GROUP BY v),
    hb AS (SELECT v, CAST(count(*) AS DOUBLE) AS c FROM b GROUP BY v),
    na AS (SELECT sum(c) AS n1 FROM ha),
    nb AS (SELECT sum(c) AS n2 FROM hb),
    exy AS (
      SELECT sum(ha.c * hb.c * abs(ha.v - hb.v)) / (n1 * n2) AS e
      FROM ha CROSS JOIN hb, na, nb GROUP BY n1, n2),
    exx AS (
      SELECT sum(x.c * y.c * abs(x.v - y.v)) / (n1 * n1) AS e
      FROM ha x CROSS JOIN ha y, na GROUP BY n1),
    eyy AS (
      SELECT sum(x.c * y.c * abs(x.v - y.v)) / (n2 * n2) AS e
      FROM hb x CROSS JOIN hb y, nb GROUP BY n2)
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           round(2 * exy.e - exx.e - eyy.e, 4) AS energy_distance,
           round((2 * exy.e - exx.e - eyy.e) / (2 * exy.e), 5)
             AS energy_coefficient
    FROM exy, exx, eyy, na, nb
    """,
    tags=("stats", "nonparametric", "distribution-fit"),
)
def q_energy_distance_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Székely's energy distance between two brands' price
    distributions: 2E|X−Y| − E|X−X'| − E|Y−Y'| — the modern
    two-sample statistic that is zero IFF the distributions are
    identical and, unlike KS (ks_price_drift), responds to
    differences anywhere in the distribution with full power in any
    dimension. All three expectations are Σc·c'·|v−v'| over
    HISTOGRAM pairs (the same collapse as kendall_tau_b), so the
    quadratic pair count lives on distinct values, not rows; the
    normalized energy coefficient ∈ [0,1] reads like a correlation."""
    p = _t(spark, sf_dir, "part")
    ha = (
        p.filter(F.col("p_brand") == "Brand#11")
        .groupBy(F.col("p_retailprice").alias("v"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    hb = (
        p.filter(F.col("p_brand") == "Brand#22")
        .groupBy(F.col("p_retailprice").alias("v"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    na = ha.agg(F.sum("c").alias("n1"))
    nb = hb.agg(F.sum("c").alias("n2"))

    def mean_absdiff(x, y, nx, ny, nxc, nyc):
        xx = x.select(F.col("v").alias("vx"), F.col("c").alias("cx"))
        yy = y.select(F.col("v").alias("vy"), F.col("c").alias("cy"))
        return (
            xx.crossJoin(yy)
            .crossJoin(F.broadcast(nx))
            .crossJoin(F.broadcast(ny))
            .groupBy(nxc, nyc)
            .agg(
                (
                    F.sum(
                        F.col("cx") * F.col("cy") * F.abs(F.col("vx") - F.col("vy"))
                    )
                    / (F.col(nxc) * F.col(nyc))
                ).alias("e")
            )
            .select("e")
        )

    exy = mean_absdiff(ha, hb, na, nb, "n1", "n2").withColumnRenamed("e", "exy")
    exx = (
        mean_absdiff(ha, ha.select("v", "c"), na, na.select(F.col("n1").alias("n1b")), "n1", "n1b")
        .withColumnRenamed("e", "exx")
    )
    eyy = (
        mean_absdiff(hb, hb.select("v", "c"), nb, nb.select(F.col("n2").alias("n2b")), "n2", "n2b")
        .withColumnRenamed("e", "eyy")
    )
    ed = 2 * F.col("exy") - F.col("exx") - F.col("eyy")
    return (
        exy.crossJoin(exx)
        .crossJoin(eyy)
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("n1").cast("bigint").alias("n_a"),
            F.col("n2").cast("bigint").alias("n_b"),
            F.round(ed, 4).alias("energy_distance"),
            F.round(ed / (2 * F.col("exy")), 5).alias("energy_coefficient"),
        )
    )


@register(
    "f1_micro_macro",
    oracle="""
    WITH dims AS (
      SELECT label, CAST(i AS INT) AS pos, embedding[CAST(i AS INT)]::DOUBLE AS v
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    cent AS (
      SELECT label AS c_label, list(cv ORDER BY pos) AS c
      FROM (SELECT label, pos, avg(v) AS cv FROM dims GROUP BY 1, 2)
      GROUP BY label),
    scored AS (
      SELECT a.vec_id, a.label, b.c_label,
             list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * b.c[i]))
             / (sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(generate_series(1, 64),
                      i -> b.c[i] * b.c[i])))) AS cos
      FROM embeddings a CROSS JOIN cent b),
    pred AS (
      SELECT vec_id, label AS truth, c_label AS pred
      FROM (SELECT vec_id, label, c_label,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY cos DESC, c_label) AS rn
            FROM scored)
      WHERE rn = 1),
    per_label AS (
      SELECT l.label,
             CAST(coalesce(tp, 0) AS DOUBLE) AS tp,
             CAST(coalesce(fp, 0) AS DOUBLE) AS fp,
             CAST(coalesce(fn, 0) AS DOUBLE) AS fn
      FROM (SELECT DISTINCT label FROM embeddings) l
      LEFT JOIN (SELECT truth AS label, count(*) AS tp FROM pred
                 WHERE truth = pred.pred GROUP BY 1) t USING (label)
      LEFT JOIN (SELECT pred AS label, count(*) AS fp FROM pred
                 WHERE truth <> pred.pred GROUP BY 1) f USING (label)
      LEFT JOIN (SELECT truth AS label, count(*) AS fn FROM pred
                 WHERE truth <> pred.pred GROUP BY 1) n USING (label)),
    f1s AS (
      SELECT label,
             CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                  ELSE 2 * tp / (2 * tp + fp + fn) END AS f1,
             tp, fp, fn
      FROM per_label)
    SELECT round(avg(f1), 4) AS macro_f1,
           round(2 * sum(tp) / (2 * sum(tp) + sum(fp) + sum(fn)), 4)
             AS micro_f1,
           CAST(count(*) AS BIGINT) AS n_labels
    FROM f1s
    """,
    tags=("ml", "eval", "classification"),
)
def q_f1_micro_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Macro- and micro-averaged F1 of the nearest-centroid
    classifier — the two averages answer different questions (macro
    weights every label equally and exposes minority-class failure;
    micro is dominated by frequent labels and equals accuracy in
    single-label problems), which is why reporting only one is a
    classic eval smell (cf. centroid_classify, which stops at
    accuracy, and brier_calibration for the probability view). TP
    is a truth=pred count, FP/FN are mispredict counts grouped by
    predicted vs true label — three tiny aggregates off one
    prediction relation."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "label", "pos", F.col("v").cast("double").alias("v"))
    cent = dims.groupBy("label", "pos").agg(F.avg("v").alias("cv"))
    cn = cent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cv") * F.col("cv"))).alias("cnorm")
    )
    vn = dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("vnorm")
    )
    centr = cent.select(
        F.col("label").alias("c_label"), "pos", F.col("cv").alias("cv")
    )
    scored = (
        dims.join(F.broadcast(centr), "pos")
        .groupBy("vec_id", "label", "c_label")
        .agg(F.sum(F.col("v") * F.col("cv")).alias("dot"))
        .join(vn, "vec_id")
        .join(
            F.broadcast(cn.select(F.col("label").alias("c_label"), "cnorm")),
            "c_label",
        )
        .select(
            "vec_id",
            "label",
            "c_label",
            (F.col("dot") / (F.col("vnorm") * F.col("cnorm"))).alias("cos"),
        )
    )
    pred = (
        scored.select(
            "vec_id",
            F.col("label").alias("truth"),
            F.col("c_label").alias("pred"),
            F.row_number()
            .over(Window.partitionBy("vec_id").orderBy(F.desc("cos"), "c_label"))
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    labels = e.select("label").distinct()
    tp = (
        pred.filter(F.col("truth") == F.col("pred"))
        .groupBy(F.col("truth").alias("label"))
        .agg(F.count("*").alias("tp"))
    )
    fp = (
        pred.filter(F.col("truth") != F.col("pred"))
        .groupBy(F.col("pred").alias("label"))
        .agg(F.count("*").alias("fp"))
    )
    fn = (
        pred.filter(F.col("truth") != F.col("pred"))
        .groupBy(F.col("truth").alias("label"))
        .agg(F.count("*").alias("fn"))
    )
    per_label = (
        labels.join(tp, "label", "left")
        .join(fp, "label", "left")
        .join(fn, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).cast("double").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("double").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("double").alias("fn"),
        )
    )
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, 0.0).otherwise(
        2 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn"))
    )
    return per_label.agg(
        F.round(F.avg(f1), 4).alias("macro_f1"),
        F.round(
            2 * F.sum("tp") / (2 * F.sum("tp") + F.sum("fp") + F.sum("fn")), 4
        ).alias("micro_f1"),
        F.count("*").cast("bigint").alias("n_labels"),
    )


@register(
    "forecast_reconciliation",
    oracle="""
    WITH monthly AS (
      SELECT r_name, n_name,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             sum(o_totalprice) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2, 3),
    horizon AS (SELECT max(m) AS mh FROM monthly),
    nat_fc AS (
      SELECT r_name, n_name, rev AS fc
      FROM monthly, horizon
      WHERE m = mh - INTERVAL 12 MONTH),
    reg_fc AS (
      SELECT r_name, sum(rev) AS fc_direct
      FROM monthly, horizon
      WHERE m = mh - INTERVAL 12 MONTH
      GROUP BY r_name),
    actual AS (
      SELECT r_name, sum(rev) AS act
      FROM monthly, horizon WHERE m = mh GROUP BY r_name),
    bu AS (SELECT r_name, sum(fc) AS fc_bottom_up FROM nat_fc GROUP BY 1)
    SELECT r.r_name,
           round(act, 2) AS actual,
           round(fc_direct, 2) AS direct_forecast,
           round(fc_bottom_up, 2) AS bottom_up_forecast,
           round(abs(fc_direct - act) - abs(fc_bottom_up - act), 2)
             AS direct_minus_bu_abs_error
    FROM reg_fc r JOIN bu USING (r_name) JOIN actual USING (r_name)
    """,
    tags=("forecast", "hierarchy", "rollup"),
)
def q_forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast coherence: seasonal-naive forecasts
    (same month last year) made at the NATION level and summed
    bottom-up vs forecast DIRECTLY at the region level, both scored
    against the realized month — the aggregation-consistency
    question every planning hierarchy faces (here the two
    necessarily agree in value since sum commutes with the naive
    model, so the error comparison isolates pure aggregation-level
    effects; with a nonlinear model they diverge and this query
    becomes the reconciliation audit). One (region, nation, month)
    aggregate feeds every level — the hierarchy never re-scans the
    fact."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(
            "r_name",
            "n_name",
            F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
        )
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    horizon = monthly.agg(F.max("m").alias("mh"))
    base = monthly.crossJoin(F.broadcast(horizon))
    nat_fc = base.filter(
        F.col("m") == F.add_months(F.col("mh"), -12).cast("timestamp")
    ).select("r_name", "n_name", F.col("rev").alias("fc"))
    reg_fc = (
        base.filter(F.col("m") == F.add_months(F.col("mh"), -12).cast("timestamp"))
        .groupBy("r_name")
        .agg(F.sum("rev").alias("fc_direct"))
    )
    actual = (
        base.filter(F.col("m") == F.col("mh"))
        .groupBy("r_name")
        .agg(F.sum("rev").alias("act"))
    )
    bu = nat_fc.groupBy("r_name").agg(F.sum("fc").alias("fc_bottom_up"))
    return (
        reg_fc.join(bu, "r_name")
        .join(actual, "r_name")
        .select(
            "r_name",
            F.round("act", 2).alias("actual"),
            F.round("fc_direct", 2).alias("direct_forecast"),
            F.round("fc_bottom_up", 2).alias("bottom_up_forecast"),
            F.round(
                F.abs(F.col("fc_direct") - F.col("act"))
                - F.abs(F.col("fc_bottom_up") - F.col("act")),
                2,
            ).alias("direct_minus_bu_abs_error"),
        )
    )


@register(
    "hdi_composite_index",
    oracle="""
    WITH met AS (
      SELECT n_name,
             sum(o_totalprice) AS revenue,
             CAST(count(DISTINCT o_custkey) AS DOUBLE) AS customers,
             avg(o_totalprice) AS avg_order
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1),
    rng AS (
      SELECT min(revenue) AS r0, max(revenue) AS r1,
             min(customers) AS c0, max(customers) AS c1,
             min(avg_order) AS a0, max(avg_order) AS a1
      FROM met),
    norm AS (
      SELECT n_name,
             (revenue - r0) / (r1 - r0) AS d1,
             (customers - c0) / (c1 - c0) AS d2,
             (avg_order - a0) / (a1 - a0) AS d3
      FROM met, rng)
    SELECT n_name,
           round(pow(greatest(d1, 1e-9) * greatest(d2, 1e-9)
                     * greatest(d3, 1e-9), 1.0 / 3), 5) AS composite_index,
           round(d1, 4) AS dim_revenue,
           round(d2, 4) AS dim_customers,
           round(d3, 4) AS dim_avg_order
    FROM norm
    ORDER BY composite_index DESC, n_name LIMIT 10
    """,
    tags=("index", "ranking", "economics"),
)
def q_hdi_composite_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDI-style composite index per nation: three dimensions
    (revenue, customer base, order intensity) min-max normalized
    and combined by GEOMETRIC mean — the UN-HDI 2010 design choice:
    unlike the arithmetic mean, the geometric mean makes dimensions
    non-substitutable (a zero anywhere zeroes the index, so a
    nation can't buy rank with one huge dimension), which is the
    whole point of a development-style index. Min-max bounds are a
    1-row broadcast; the epsilon floors keep the boundary nation
    (exact 0 after normalization) well-defined in both engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    met = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum("o_totalprice").alias("revenue"),
            F.count_distinct("o_custkey").cast("double").alias("customers"),
            F.avg("o_totalprice").alias("avg_order"),
        )
    )
    rng = met.agg(
        F.min("revenue").alias("r0"), F.max("revenue").alias("r1"),
        F.min("customers").alias("c0"), F.max("customers").alias("c1"),
        F.min("avg_order").alias("a0"), F.max("avg_order").alias("a1"),
    )
    d1 = (F.col("revenue") - F.col("r0")) / (F.col("r1") - F.col("r0"))
    d2 = (F.col("customers") - F.col("c0")) / (F.col("c1") - F.col("c0"))
    d3 = (F.col("avg_order") - F.col("a0")) / (F.col("a1") - F.col("a0"))
    eps = F.lit(1e-9)
    comp = F.pow(
        F.greatest(d1, eps) * F.greatest(d2, eps) * F.greatest(d3, eps),
        1.0 / 3,
    )
    return (
        met.crossJoin(F.broadcast(rng))
        .select(
            "n_name",
            F.round(comp, 5).alias("composite_index"),
            F.round(d1, 4).alias("dim_revenue"),
            F.round(d2, 4).alias("dim_customers"),
            F.round(d3, 4).alias("dim_avg_order"),
        )
        .orderBy(F.desc("composite_index"), "n_name")
        .limit(10)
    )


@register(
    "wasserstein_1d",
    oracle="""
    WITH a AS (SELECT p_retailprice AS v FROM part WHERE p_brand = 'Brand#11'),
    b AS (SELECT p_retailprice AS v FROM part WHERE p_brand = 'Brand#22'),
    na AS (SELECT CAST(count(*) AS DOUBLE) AS n1 FROM a),
    nb AS (SELECT CAST(count(*) AS DOUBLE) AS n2 FROM b),
    merged AS (
      SELECT v, sum(ca) AS ca, sum(cb) AS cb
      FROM (SELECT v, 1.0 AS ca, 0.0 AS cb FROM a
            UNION ALL SELECT v, 0.0, 1.0 FROM b)
      GROUP BY v),
    cum AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v) AS cca,
             sum(cb) OVER (ORDER BY v) AS ccb,
             lead(v) OVER (ORDER BY v) AS vnext
      FROM merged)
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           round(sum(abs(cca / n1 - ccb / n2) * (vnext - v)), 4)
             AS wasserstein_1
    FROM cum, na, nb WHERE vnext IS NOT NULL GROUP BY n1, n2
    """,
    tags=("stats", "distribution-fit", "window"),
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth-mover) distance between two brands'
    price distributions: W₁ = ∫|F₁−F₂| dv, the exact optimal-
    transport cost in one dimension — unlike KS's sup
    (ks_price_drift) it measures HOW MUCH mass must move HOW FAR,
    in price units, which is why distribution-shift monitoring
    prefers it for numeric drift. The integral is a single window
    pass over the merged distinct-value ECDFs (gap-weighted |ΔF|
    via lead) — histogram-sized work, closed-form exact, no
    binning approximation."""
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_brand") == "Brand#11").select(
        F.col("p_retailprice").alias("v"),
        F.lit(1.0).alias("ca"),
        F.lit(0.0).alias("cb"),
    )
    b = p.filter(F.col("p_brand") == "Brand#22").select(
        F.col("p_retailprice").alias("v"),
        F.lit(0.0).alias("ca"),
        F.lit(1.0).alias("cb"),
    )
    merged = (
        a.unionAll(b)
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )
    na = a.agg(F.sum("ca").alias("n1"))
    nb = b.agg(F.sum("cb").alias("n2"))
    wv = Window.orderBy("v")
    cum = merged.select(
        "v",
        F.sum("ca").over(wv).alias("cca"),
        F.sum("cb").over(wv).alias("ccb"),
        F.lead("v").over(wv).alias("vnext"),
    ).filter(F.col("vnext").isNotNull())
    return (
        cum.join(F.broadcast(na))
        .join(F.broadcast(nb))
        .groupBy("n1", "n2")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("cca") / F.col("n1") - F.col("ccb") / F.col("n2"))
                    * (F.col("vnext") - F.col("v"))
                ),
                4,
            ).alias("wasserstein_1")
        )
        .select(
            F.col("n1").cast("bigint").alias("n_a"),
            F.col("n2").cast("bigint").alias("n_b"),
            "wasserstein_1",
        )
    )


@register(
    "gower_similarity_topk",
    oracle="""
    WITH feat AS (
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM supplier),
    rng AS (SELECT max(s_acctbal) - min(s_acctbal) AS r FROM feat),
    pairs AS (
      SELECT a.s_name AS s1, b.s_name AS s2,
             ((1 - abs(a.s_acctbal - b.s_acctbal) / r)
              + CASE WHEN a.s_nationkey = b.s_nationkey THEN 1 ELSE 0 END
              + CASE WHEN sign(a.s_acctbal) = sign(b.s_acctbal)
                     THEN 1 ELSE 0 END) / 3.0 AS gower
      FROM feat a JOIN feat b ON a.s_name < b.s_name, rng)
    SELECT s1, s2, round(gower, 4) AS gower_similarity
    FROM pairs ORDER BY round(gower, 6) DESC, s1, s2 LIMIT 10
    """,
    tags=("similarity", "fuzzy", "join"),
)
def q_gower_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gower similarity over MIXED feature types — the distance
    that lets numeric (range-normalized account balance),
    categorical (nation, exact match), and boolean (balance sign)
    features average into one [0,1] score without arbitrary
    numeric encodings of categories; it is the standard metric for
    clustering mixed records where cosine/L2 are undefined
    (cf. the pure-numeric silhouette_by_label tier). Range is a
    1-row broadcast; the pair join is supplier-sized, and at scale
    becomes an LSH/blocking candidate set like every pairwise
    family here."""
    s = _t(spark, sf_dir, "supplier")
    feat = s.select("s_name", "s_nationkey", "s_acctbal")
    rng = feat.agg((F.max("s_acctbal") - F.min("s_acctbal")).alias("r"))
    a = feat.select(
        F.col("s_name").alias("s1"),
        F.col("s_nationkey").alias("nk1"),
        F.col("s_acctbal").alias("ab1"),
    )
    b = feat.select(
        F.col("s_name").alias("s2"),
        F.col("s_nationkey").alias("nk2"),
        F.col("s_acctbal").alias("ab2"),
    )
    gower = (
        (1 - F.abs(F.col("ab1") - F.col("ab2")) / F.col("r"))
        + F.when(F.col("nk1") == F.col("nk2"), 1).otherwise(0)
        + F.when(F.signum("ab1") == F.signum("ab2"), 1).otherwise(0)
    ) / 3.0
    pairs = (
        a.join(b, F.col("s1") < F.col("s2"))
        .crossJoin(F.broadcast(rng))
        .select("s1", "s2", gower.alias("gower"))
    )
    return (
        pairs.orderBy(F.round(F.col("gower"), 6).desc(), "s1", "s2")
        .limit(10)
        .select("s1", "s2", F.round("gower", 4).alias("gower_similarity"))
    )


@register(
    "zero_inflation_check",
    oracle="""
    WITH days AS (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE)
                  AS nd FROM events),
    per_user AS (
      SELECT user_id,
             CAST(count(*) AS DOUBLE) AS n_events,
             CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE) AS active_days
      FROM events GROUP BY user_id),
    agg AS (
      SELECT CAST(count(*) AS DOUBLE) AS nu,
             sum(active_days) AS tot_active,
             sum(n_events) AS tot_events,
             avg(exp(-n_events / nd)) AS mixed_pred
      FROM per_user, days GROUP BY nd)
    SELECT CAST(nu AS BIGINT) AS n_users,
           CAST((SELECT nd FROM days) AS BIGINT) AS n_days,
           round(1 - tot_active / (nu * (SELECT nd FROM days)), 4)
             AS observed_zero_share,
           round(exp(-tot_events / (nu * (SELECT nd FROM days))), 4)
             AS pooled_poisson_pred,
           round(mixed_pred, 4) AS per_user_poisson_pred
    FROM agg
    """,
    tags=("stats", "pointprocess", "events"),
)
def q_zero_inflation_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflation diagnostic on per-user daily activity: the
    observed share of silent user-days against two Poisson
    predictions — pooled (one λ for everyone, which overdispersion
    always beats) and per-user mixed (E[e^{−λᵤ}], the right null
    when rates vary). Observed ≫ both predictions = genuine excess
    zeros, the signal to reach for hurdle/ZIP models instead of
    Poisson regression (burstiness_fano diagnoses the variance
    side; this diagnoses the zero mass). The user-day grid is never
    materialized — zeros are counted by ARITHMETIC (n_users×n_days
    − Σactive), the only scalable way when the dense grid is
    trillions of cells."""
    e = _t(spark, sf_dir, "events")
    days = e.agg(
        F.count_distinct(F.to_date("ts")).cast("double").alias("nd")
    )
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n_events"),
        F.count_distinct(F.to_date("ts")).cast("double").alias("active_days"),
    )
    agg = per_user.crossJoin(F.broadcast(days)).groupBy("nd").agg(
        F.count("*").cast("double").alias("nu"),
        F.sum("active_days").alias("tot_active"),
        F.sum("n_events").alias("tot_events"),
        F.avg(F.exp(-F.col("n_events") / F.col("nd"))).alias("mixed_pred"),
    )
    return agg.select(
        F.col("nu").cast("bigint").alias("n_users"),
        F.col("nd").cast("bigint").alias("n_days"),
        F.round(
            1 - F.col("tot_active") / (F.col("nu") * F.col("nd")), 4
        ).alias("observed_zero_share"),
        F.round(
            F.exp(-F.col("tot_events") / (F.col("nu") * F.col("nd"))), 4
        ).alias("pooled_poisson_pred"),
        F.round("mixed_pred", 4).alias("per_user_poisson_pred"),
    )


@register(
    "cohens_kappa_filters",
    oracle="""
    WITH scored AS (
      SELECT n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
               AS words
      FROM documents),
    med AS (
      SELECT CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS mc,
             CAST(quantile_cont(words, 0.5) AS DOUBLE) AS mw
      FROM scored),
    rated AS (
      SELECT CASE WHEN n_chars > mc THEN 1 ELSE 0 END AS ra,
             CASE WHEN words > mw THEN 1 ELSE 0 END AS rb
      FROM scored, med),
    cnt AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             avg(CASE WHEN ra = rb THEN 1.0 ELSE 0.0 END) AS po,
             avg(CAST(ra AS DOUBLE)) AS pa,
             avg(CAST(rb AS DOUBLE)) AS pb
      FROM rated)
    SELECT CAST(n AS BIGINT) AS n_docs,
           round(po, 4) AS observed_agreement,
           round(pa * pb + (1 - pa) * (1 - pb), 4) AS chance_agreement,
           round((po - (pa * pb + (1 - pa) * (1 - pb)))
                 / (1 - (pa * pb + (1 - pa) * (1 - pb))), 4) AS cohens_kappa
    FROM cnt
    """,
    tags=("agreement", "quality", "curation"),
)
def q_cohens_kappa_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ between two document-quality filters (above-median
    characters vs above-median words): raw agreement corrected for
    the agreement two filters would show BY CHANCE given their
    marginal pass rates — two length-ish filters agree often simply
    because both pass ~half the corpus, and κ subtracts exactly
    that illusion (the inter-rater statistic, pointed at the
    question 'is the second filter redundant'). Two exact medians,
    one conditional aggregate; κ near 1 here means the filters are
    interchangeable and one pipeline stage can be deleted."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "n_chars", TXT.token_count(F.col("text")).cast("double").alias("words")
    )
    med = scored.agg(
        F.expr("percentile(n_chars, 0.5)").alias("mc"),
        F.expr("percentile(words, 0.5)").alias("mw"),
    )
    rated = scored.crossJoin(F.broadcast(med)).select(
        F.when(F.col("n_chars") > F.col("mc"), 1).otherwise(0).alias("ra"),
        F.when(F.col("words") > F.col("mw"), 1).otherwise(0).alias("rb"),
    )
    cnt = rated.agg(
        F.count("*").cast("double").alias("n"),
        F.avg(F.when(F.col("ra") == F.col("rb"), 1.0).otherwise(0.0)).alias("po"),
        F.avg(F.col("ra").cast("double")).alias("pa"),
        F.avg(F.col("rb").cast("double")).alias("pb"),
    )
    pe = F.col("pa") * F.col("pb") + (1 - F.col("pa")) * (1 - F.col("pb"))
    return cnt.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round("po", 4).alias("observed_agreement"),
        F.round(pe, 4).alias("chance_agreement"),
        F.round((F.col("po") - pe) / (1 - pe), 4).alias("cohens_kappa"),
    )


@register(
    "bitemporal_restatement",
    oracle="""
    WITH facts AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS vm,
             CAST(o_orderdate AS DATE)
               + CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                      ::UBIGINT % 11 AS INT) AS known_on,
             o_totalprice AS v
      FROM orders),
    reported AS (
      SELECT vm,
             sum(CASE WHEN known_on < vm + INTERVAL 1 MONTH THEN v
                      ELSE 0 END) AS first_reported,
             sum(v) AS final_value
      FROM facts GROUP BY vm)
    SELECT strftime(vm, '%Y-%m') AS valid_month,
           round(first_reported, 2) AS first_reported,
           round(final_value, 2) AS final_value,
           round(100 * (final_value / first_reported - 1), 3)
             AS restatement_pct
    FROM reported ORDER BY vm LIMIT 12
    """,
    tags=("scd", "audit", "warehouse"),
)
def q_bitemporal_restatement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal restatement audit — the late-arriving-fact
    problem: every order has a VALID month (when it happened) and a
    KNOWN-ON date (when it reached the warehouse, here a
    deterministic 0–10-day md5 lag), and month-end reports are
    systematically short by whatever hadn't landed yet. The query
    reconstructs each month's first-reported value (transaction-time
    as-of: known before month end) against the final restated value
    — the gap is the restatement every finance close and every
    'why did last month's number change' ticket is about. One scan,
    one conditional aggregate; a real bitemporal store would make
    known_on a partition column and this query prunes to it."""
    o = _t(spark, sf_dir, "orders")
    vm = F.date_trunc("month", F.col("o_orderdate").cast("date"))
    known = F.date_add(
        F.col("o_orderdate").cast("date"),
        CUR.hash_bucket(F.col("o_orderkey"), 11),
    )
    facts = o.select(
        vm.alias("vm"), known.alias("known_on"), F.col("o_totalprice").alias("v")
    )
    month_end = F.add_months(F.col("vm"), 1).cast("timestamp")
    asof = facts.groupBy("vm").agg(
        F.sum(
            F.when(F.col("known_on").cast("timestamp") < month_end, F.col("v")).otherwise(
                0.0
            )
        ).alias("first_reported"),
        F.sum("v").alias("final_value"),
    )
    return (
        asof.orderBy("vm")
        .limit(12)
        .select(
            F.date_format("vm", "yyyy-MM").alias("valid_month"),
            F.round("first_reported", 2).alias("first_reported"),
            F.round("final_value", 2).alias("final_value"),
            F.round(
                100 * (F.col("final_value") / F.col("first_reported") - 1), 3
            ).alias("restatement_pct"),
        )
    )


@register(
    "skyline_3d_suppliers",
    oracle="""
    WITH crit AS (
      SELECT s_name,
             sum(l_extendedprice * (1 - l_discount)) AS revenue,
             CAST(count(DISTINCT l_partkey) AS DOUBLE) AS breadth,
             avg(l_discount) AS giveaway
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name)
    SELECT s_name, round(revenue, 2) AS revenue,
           CAST(breadth AS BIGINT) AS breadth,
           round(giveaway, 5) AS giveaway
    FROM crit a
    WHERE NOT EXISTS (
      SELECT 1 FROM crit b
      WHERE b.revenue >= a.revenue AND b.breadth >= a.breadth
        AND b.giveaway <= a.giveaway
        AND (b.revenue > a.revenue OR b.breadth > a.breadth
             OR b.giveaway < a.giveaway))
    ORDER BY s_name
    """,
    tags=("skyline", "subquery", "ranking"),
)
def q_skyline_3d_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-criteria Pareto skyline of suppliers (revenue↑,
    breadth↑, discount-giveaway↓): the undominated set no weighted
    score can pre-select — every skyline member is optimal under
    SOME preference weighting, which is why procurement shortlists
    are skylines, not top-k (TOPSIS, topsis_supplier_ranking, then
    picks WITHIN this set once weights are chosen). In 2-D the
    sort+running-max sweep wins (pareto_skyline); in 3-D no total
    order exists, so domination is the anti-join itself — a
    |suppliers|² check that at scale runs after a grid/local-skyline
    prefilter, exactly the pattern the 2-D operator's partition
    prefilter establishes."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    crit = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count_distinct("l_partkey").cast("double").alias("breadth"),
            F.avg("l_discount").alias("giveaway"),
        )
    )
    a = crit.select(
        F.col("s_name").alias("an"),
        F.col("revenue").alias("ar"),
        F.col("breadth").alias("ab"),
        F.col("giveaway").alias("ag"),
    )
    b = crit.select(
        F.col("revenue").alias("br"),
        F.col("breadth").alias("bb"),
        F.col("giveaway").alias("bg"),
    )
    dominated = (
        (F.col("br") >= F.col("ar"))
        & (F.col("bb") >= F.col("ab"))
        & (F.col("bg") <= F.col("ag"))
        & (
            (F.col("br") > F.col("ar"))
            | (F.col("bb") > F.col("ab"))
            | (F.col("bg") < F.col("ag"))
        )
    )
    skyline = a.join(b, dominated, "left_anti")
    return skyline.select(
        F.col("an").alias("s_name"),
        F.round("ar", 2).alias("revenue"),
        F.col("ab").cast("bigint").alias("breadth"),
        F.round("ag", 5).alias("giveaway"),
    ).orderBy("s_name")


@register(
    "dynamic_pivot_years",
    oracle="""
    WITH rev AS (
      SELECT n_name, year(CAST(o_orderdate AS DATE)) AS yr,
             o_totalprice AS v
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey)
    SELECT n_name,
           round(sum(CASE WHEN yr = 1995 THEN v END), 2) AS y1995,
           round(sum(CASE WHEN yr = 1996 THEN v END), 2) AS y1996,
           round(sum(CASE WHEN yr = 1997 THEN v END), 2) AS y1997,
           round(sum(CASE WHEN yr = 1998 THEN v END), 2) AS y1998,
           round(sum(CASE WHEN yr = 1999 THEN v END), 2) AS y1999,
           round(sum(CASE WHEN yr = 2000 THEN v END), 2) AS y2000,
           round(sum(CASE WHEN yr = 2001 THEN v END), 2) AS y2001
    FROM rev GROUP BY n_name
    """,
    tags=("pivot", "reshape", "agg"),
)
def q_dynamic_pivot_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC pivot: nation × year revenue matrix where the year
    columns are DISCOVERED from the data (pivot with no value list
    — Spark runs a distinct-values job, then compiles the same
    single-pass conditional aggregate a static pivot gets). The
    oracle necessarily enumerates the columns statically — that gap
    IS the feature: the Spark plan adapts when 1999 data lands, the
    SQL must be rewritten. Missing (nation, year) cells stay NULL
    (no ELSE 0) so absence is distinguishable from zero revenue."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "n_name",
            F.year(F.col("o_orderdate").cast("date")).alias("yr"),
            F.col("o_totalprice").alias("v"),
        )
    )
    piv = rev.groupBy("n_name").pivot("yr").sum("v")
    year_cols = sorted(col for col in piv.columns if col != "n_name")
    return piv.select(
        "n_name",
        *[F.round(F.col(f"`{y}`"), 2).alias(f"y{y}") for y in year_cols],
    )


@register(
    "ignore_nulls_family",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN NULL ELSE sum(o_totalprice) END AS v
      FROM orders GROUP BY 1, 2),
    w AS (
      SELECT m,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY m ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_wd,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY m ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_wd,
             CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_null
      FROM daily)
    SELECT strftime(m, '%Y-%m') AS month,
           round(any_value(first_wd), 2) AS first_weekday_rev,
           round(any_value(last_wd), 2) AS last_weekday_rev,
           CAST(sum(is_null) AS BIGINT) AS n_masked_days
    FROM w GROUP BY m ORDER BY month LIMIT 12
    """,
    tags=("window", "null", "sql"),
)
def q_ignore_nulls_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics: weekend revenue is masked to
    NULL, and first_value/last_value with IGNORE NULLS reach
    through the gaps to the month's first and last WEEKDAY values —
    the SQL:2008 null-treatment clause that makes
    last-known-good-reading queries one window call instead of the
    islands dance (gap_fill_forward uses the same device for
    forward fill; this pins the whole-frame variants). Identical
    semantics both engines; the full-frame window runs inside
    month partitions, so it parallelizes by month."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"),
    ).agg(F.sum("o_totalprice").alias("raw"))
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..7.
    wd = F.dayofweek("d")
    daily = daily.select(
        "d",
        "m",
        F.when(wd.isin(1, 7), F.lit(None).cast("double"))
        .otherwise(F.col("raw"))
        .alias("v"),
    )
    wfull = Window.partitionBy("m").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = daily.select(
        "m",
        F.first("v", ignorenulls=True).over(wfull).alias("first_wd"),
        F.last("v", ignorenulls=True).over(wfull).alias("last_wd"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_null"),
    )
    return (
        w.groupBy("m")
        .agg(
            F.round(F.first("first_wd"), 2).alias("first_weekday_rev"),
            F.round(F.first("last_wd"), 2).alias("last_weekday_rev"),
            F.sum("is_null").cast("bigint").alias("n_masked_days"),
        )
        .orderBy("m")
        .limit(12)
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "first_weekday_rev",
            "last_weekday_rev",
            "n_masked_days",
        )
    )


@register(
    "collation_compare",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN p_type
                  ELSE lower(p_type) END AS t
      FROM part)
    SELECT CAST(count(DISTINCT t) AS BIGINT) AS distinct_binary,
           CAST(count(DISTINCT lower(t)) AS BIGINT) AS distinct_ci,
           CAST(sum(CASE WHEN lower(t) LIKE 'promo%' THEN 1 ELSE 0 END)
                AS BIGINT) AS promo_ci_matches,
           CAST(sum(CASE WHEN t LIKE 'PROMO%' THEN 1 ELSE 0 END)
                AS BIGINT) AS promo_binary_matches
    FROM mixed
    """,
    tags=("string", "sql", "distinct"),
)
def q_collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): the same
    mixed-case column counted distinct under binary vs
    case-insensitive UTF8_LCASE collation, and a prefix predicate
    evaluated both ways — under the collated comparison the engine
    treats 'PROMO…' and 'promo…' as ONE value with no lower()
    rewrite in the query (the collation travels with the TYPE, so
    every comparison, join, and distinct downstream inherits it —
    the principled fix for case-divergent dimension values that
    lower()-sprinkling never fully covers). The oracle models the
    semantics with explicit lower(); the counts must agree
    exactly."""
    p = _t(spark, sf_dir, "part")
    mixed = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_type"))
        .otherwise(F.lower("p_type"))
        .alias("t")
    )
    ci = F.collate(F.col("t"), "UTF8_LCASE")
    return mixed.agg(
        F.count_distinct("t").cast("bigint").alias("distinct_binary"),
        F.count_distinct(ci).cast("bigint").alias("distinct_ci"),
        F.sum(F.when(ci.like("promo%"), 1).otherwise(0))
        .cast("bigint")
        .alias("promo_ci_matches"),
        F.sum(F.when(F.col("t").like("PROMO%"), 1).otherwise(0))
        .cast("bigint")
        .alias("promo_binary_matches"),
    )


@register(
    "array_exists_forall",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN len(list_filter(embedding,
                         v -> abs(v::DOUBLE) > 3)) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_with_extreme,
           CAST(sum(CASE WHEN len(list_filter(embedding,
                         v -> abs(v::DOUBLE) >= 5)) = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_all_bounded,
           round(avg(len(list_filter(embedding, v -> v::DOUBLE > 0))), 3)
             AS avg_positive_dims
    FROM embeddings
    """,
    tags=("array", "hof", "embeddings"),
)
def q_array_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantifier higher-order functions over array columns:
    exists (any |v|>3), forall (all |v|<5), and filter+size
    (positive-dim count) evaluated per embedding WITHOUT explode —
    the per-row array work stays inside whole-stage codegen as a
    tight loop over the array buffer, versus the explode
    formulation that multiplies the row count 64× and re-aggregates
    (embedding_norms pins the same point for fold/aggregate). At
    100 TB of vectors the difference is a shuffle-free scan vs a
    64×-wide one."""
    e = _t(spark, sf_dir, "embeddings")
    vd = lambda v: v.cast("double")
    return e.agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.sum(
            F.when(F.exists("embedding", lambda v: F.abs(vd(v)) > 3), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_with_extreme"),
        F.sum(
            F.when(F.forall("embedding", lambda v: F.abs(vd(v)) < 5), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_all_bounded"),
        F.round(
            F.avg(F.size(F.filter("embedding", lambda v: vd(v) > 0))), 3
        ).alias("avg_positive_dims"),
    )


@register(
    "explode_outer_nulls",
    oracle="""
    WITH arrs AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                         w -> length(w) >= 12) AS longs
      FROM documents)
    SELECT CAST(count(*) AS BIGINT) AS docs_outer,
           CAST(sum(CASE WHEN len(longs) > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_inner,
           CAST(sum(CASE WHEN len(longs) = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_dropped_by_inner,
           CAST(sum(len(longs)) AS BIGINT) AS total_long_words
    FROM arrs
    """,
    tags=("explode", "null", "sql"),
)
def q_explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode vs explode_outer semantics, pinned by counting: a
    per-doc array of 12+-letter words is EMPTY for most documents,
    and a plain explode silently DROPS those rows — the lateral-
    view bug that quietly deletes every document without a match
    from downstream counts. The query materializes both paths
    (outer keeps empty-array docs as a NULL word row) and reports
    exactly how many documents the inner variant loses; the oracle
    states the same semantics arithmetically from array lengths."""
    d = _t(spark, sf_dir, "documents")
    arrs = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"),
            lambda w: F.length(w) >= 12,
        ).alias("longs"),
    )
    outer = arrs.select("doc_id", F.explode_outer("longs").alias("w"))
    docs_outer = outer.agg(F.count_distinct("doc_id").alias("c"))
    inner = arrs.select("doc_id", F.explode("longs").alias("w"))
    docs_inner = inner.agg(
        F.count_distinct("doc_id").alias("ci"), F.count("w").alias("tw")
    )
    return (
        docs_outer.crossJoin(F.broadcast(docs_inner))
        .select(
            F.col("c").cast("bigint").alias("docs_outer"),
            F.col("ci").cast("bigint").alias("docs_inner"),
            (F.col("c") - F.col("ci")).cast("bigint").alias(
                "docs_dropped_by_inner"
            ),
            F.col("tw").cast("bigint").alias("total_long_words"),
        )
    )


@register(
    "median_polish",
    oracle="""
    WITH cells AS (
      SELECT n_name, year(CAST(o_orderdate AS DATE)) AS yr,
             sum(o_totalprice) AS x
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    g0 AS (SELECT CAST(quantile_cont(x, 0.5) AS DOUBLE) AS m0 FROM cells),
    r0 AS (SELECT n_name, yr, x - m0 AS r FROM cells, g0),
    re1 AS (SELECT n_name, CAST(quantile_cont(r, 0.5) AS DOUBLE) AS e
            FROM r0 GROUP BY n_name),
    r1 AS (SELECT r0.n_name, yr, r - e AS r
           FROM r0 JOIN re1 USING (n_name)),
    ce1 AS (SELECT yr, CAST(quantile_cont(r, 0.5) AS DOUBLE) AS e
            FROM r1 GROUP BY yr),
    r2 AS (SELECT n_name, r1.yr, r - e AS r FROM r1 JOIN ce1 USING (yr)),
    re2 AS (SELECT n_name, CAST(quantile_cont(r, 0.5) AS DOUBLE) AS e
            FROM r2 GROUP BY n_name),
    r3 AS (SELECT r2.n_name, yr, r - e AS r FROM r2 JOIN re2 USING (n_name)),
    ce2 AS (SELECT yr, CAST(quantile_cont(r, 0.5) AS DOUBLE) AS e
            FROM r3 GROUP BY yr),
    r4 AS (SELECT n_name, r3.yr, r - e AS r FROM r3 JOIN ce2 USING (yr))
    SELECT n_name, CAST(yr AS BIGINT) AS yr, round(r, 2) AS residual
    FROM r4 ORDER BY abs(r) DESC, n_name, yr LIMIT 5
    """,
    tags=("robust", "decomposition", "stats"),
)
def q_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's median polish on the nation×year revenue matrix (two
    full row/column sweeps, unrolled): iteratively subtract row and
    column MEDIANS so the residuals isolate genuine interactions —
    the robust two-way decomposition whose mean-based cousin
    (variance_decomposition) lets one outlier cell contaminate an
    entire row effect; top-5 |residual| cells are the
    nation-year combinations that genuinely deviate from 'row
    effect + column effect'. Every sweep is a grouped exact median
    over the 25×7 matrix relation plus a broadcast join back —
    the fact table is touched once."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year(F.col("o_orderdate").cast("date")).alias("yr"))
        .agg(F.sum("o_totalprice").alias("x"))
    )
    g0 = cells.agg(F.expr("percentile(x, 0.5)").alias("m0"))
    r = cells.crossJoin(F.broadcast(g0)).select(
        "n_name", "yr", (F.col("x") - F.col("m0")).alias("r")
    )
    for level, key in (("re1", "n_name"), ("ce1", "yr"), ("re2", "n_name"), ("ce2", "yr")):
        eff = r.groupBy(key).agg(F.expr("percentile(r, 0.5)").alias("e"))
        r = r.join(F.broadcast(eff), key).select(
            "n_name", "yr", (F.col("r") - F.col("e")).alias("r")
        )
    return (
        r.orderBy(F.abs(F.col("r")).desc(), "n_name", "yr")
        .limit(5)
        .select(
            "n_name",
            F.col("yr").cast("bigint").alias("yr"),
            F.round("r", 2).alias("residual"),
        )
    )


@register(
    "record_breaking_counts",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    seq AS (
      SELECT d, v,
             CAST(row_number() OVER (ORDER BY d) AS DOUBLE) AS i,
             max(v) OVER (ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev_max
      FROM daily)
    SELECT CAST(year(d) AS BIGINT) AS yr,
           CAST(sum(CASE WHEN prev_max IS NULL OR v > prev_max
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
           round(sum(1.0 / i), 2) AS expected_if_iid
    FROM seq GROUP BY 1
    """,
    tags=("timeseries", "window", "stats"),
)
def q_record_breaking_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking days per year — all-time daily-revenue highs
    counted against the i.i.d. theory expectation Σ1/i (record
    counts in an exchangeable sequence follow the harmonic series,
    ≈ ln n, REGARDLESS of the distribution — one of probability's
    cleaner free lunches): observed record counts persistently above
    the harmonic curve are direct evidence of trend, with no model
    fit (cf. mann_kendall_trend for the hypothesis-test version).
    One running-max window with a 1-preceding frame so the first
    day counts as a record by NULL convention, not by accident."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("d")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    seq = daily.select(
        "d",
        "v",
        F.row_number().over(w).cast("double").alias("i"),
        F.max("v").over(wprev).alias("prev_max"),
    )
    is_rec = F.when(
        F.col("prev_max").isNull() | (F.col("v") > F.col("prev_max")), 1
    ).otherwise(0)
    return seq.groupBy(F.year("d").cast("bigint").alias("yr")).agg(
        F.sum(is_rec).cast("bigint").alias("n_records"),
        F.round(F.sum(1.0 / F.col("i")), 2).alias("expected_if_iid"),
    )


@register(
    "tpcds_q97_channel_overlap",
    oracle="""
    WITH early AS (
      SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE month(CAST(o_orderdate AS DATE)) <= 6),
    late AS (
      SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE month(CAST(o_orderdate AS DATE)) > 6),
    merged AS (
      SELECT coalesce(e.ck, l.ck) AS ck,
             CASE WHEN e.ck IS NOT NULL THEN 1 ELSE 0 END AS in_early,
             CASE WHEN l.ck IS NOT NULL THEN 1 ELSE 0 END AS in_late
      FROM early e FULL OUTER JOIN late l
        ON e.ck = l.ck AND e.pk = l.pk)
    SELECT CAST(sum(CASE WHEN in_early = 1 AND in_late = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS both_halves,
           CAST(sum(CASE WHEN in_early = 1 AND in_late = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS early_only,
           CAST(sum(CASE WHEN in_early = 0 AND in_late = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_only
    FROM merged
    """,
    tags=("tpcds", "outer-join", "distinct"),
)
def q_tpcds_q97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q97's exact shape: two deduplicated (customer, item)
    incidence sets — here first-half vs second-half of the year
    standing in for the store/catalog channels — FULL OUTER joined
    on the composite key with conditional counts of both/only-left/
    only-right. The dedup-BEFORE-join is the load-bearing choice:
    joining raw purchase rows would multiply counts by purchase
    frequency² (the classic Q97 trap); each side collapses to its
    distinct incidence first, so the outer join is
    |customers×items|-bounded and the three counts partition it
    exactly."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("ck"),
        F.col("l_partkey").alias("pk"),
        F.month(F.col("o_orderdate").cast("date")).alias("mo"),
    )
    early = j.filter(F.col("mo") <= 6).select("ck", "pk").distinct()
    late = j.filter(F.col("mo") > 6).select("ck", "pk").distinct()
    merged = early.select(
        "ck", "pk", F.lit(1).alias("in_early")
    ).join(
        late.select("ck", "pk", F.lit(1).alias("in_late")),
        ["ck", "pk"],
        "full_outer",
    )
    ie = F.coalesce("in_early", F.lit(0))
    il = F.coalesce("in_late", F.lit(0))
    return merged.agg(
        F.sum(F.when((ie == 1) & (il == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("both_halves"),
        F.sum(F.when((ie == 1) & (il == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("early_only"),
        F.sum(F.when((ie == 0) & (il == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("late_only"),
    )


@register(
    "simhash_hamming_pairs",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+'))
               AS token
      FROM documents
    ),
    th AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 4096
           + (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1) * 256
           + (strpos('0123456789abcdef', substr(md5(token), 3, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substr(md5(token), 4, 1)) - 1) AS hbits
      FROM tok
    ),
    bitsums AS (
      SELECT doc_id, pos,
             sum(CASE WHEN (hbits // CAST(pow(2, pos) AS BIGINT)) % 2 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM th, (SELECT unnest(generate_series(0, 15)) AS pos)
      GROUP BY doc_id, pos
    ),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s >= 0 THEN CAST(pow(2, pos) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM bitsums GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, simhash, b,
             (simhash // CAST(pow(16, b) AS BIGINT)) % 16 AS band_val
      FROM fp, (SELECT unnest(generate_series(0, 3)) AS b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, a.simhash AS s1,
                      c.doc_id AS d2, c.simhash AS s2
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.band_val = c.band_val AND a.doc_id < c.doc_id),
    ham AS (SELECT bit_count(CAST(xor(s1, s2) AS BIGINT)) AS hd FROM cand)
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN hd <= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_pairs,
           CAST(sum(CASE WHEN hd = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_identical
    FROM ham
    """,
    tags=("dedup", "hash", "similarity"),
)
def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS at Hamming distance ≤ 3, found
    without any all-pairs comparison: split the 16-bit fingerprint
    into 4 bands of 4 bits — by pigeonhole, ≤3 differing bits leave
    at least one band IDENTICAL, so the band-value equi-join
    (Charikar/Manku-Jain-Sarma, the Google near-dup crawler design)
    finds every qualifying pair with an exact guarantee, and
    bit_count(xor) verifies candidates exactly. This upgrades
    dedup_simhash's identical-fingerprint buckets to tolerance-
    based matching — the candidate volume is bounded by band-bucket
    sizes, never n²."""
    d = _t(spark, sf_dir, "documents")
    fp = DD.simhash(d)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b"),
    ).select(
        "doc_id",
        "simhash",
        "b",
        F.expr("shiftright(simhash, b * 4) & 15").alias("band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("d1"), F.col("simhash").alias("s1"), "b", "band_val"
    )
    c = bands.select(
        F.col("doc_id").alias("d2"), F.col("simhash").alias("s2"), "b", "band_val"
    )
    cand = (
        a.join(c, ["b", "band_val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "s1", "d2", "s2")
        .distinct()
    )
    ham = cand.select(
        F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hd")
    )
    return ham.agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("hd") <= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_near_pairs"),
        F.sum(F.when(F.col("hd") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_identical"),
    )


@register(
    "vocab_coverage_curve",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents),
    cnt AS (
      SELECT token, CAST(count(*) AS DOUBLE) AS c
      FROM tok WHERE token <> '' GROUP BY token),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rk
      FROM cnt),
    tot AS (SELECT sum(c) AS t, CAST(count(*) AS BIGINT) AS vocab FROM ranked),
    ks AS (SELECT unnest([10, 50, 100, 500, 1000]) AS k)
    SELECT CAST(k AS BIGINT) AS vocab_size,
           round(sum(CASE WHEN rk <= k THEN c ELSE 0 END) / t, 5)
             AS corpus_coverage,
           round(1 - sum(CASE WHEN rk <= k THEN c ELSE 0 END) / t, 5)
             AS oov_share
    FROM ranked CROSS JOIN ks, tot GROUP BY k, t
    """,
    tags=("text", "training", "coverage"),
)
def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary size vs corpus coverage curve: what share of all
    token occurrences the top-k most frequent types cover, at k =
    10…1000 — THE tokenizer-budget curve (vocab_oov_rate gives one
    point; this gives the frontier that decides where the marginal
    vocabulary slot stops paying for itself, the empirical face of
    Zipf's law that zipf_fit parameterizes). One frequency
    aggregate, one ranking over the |vocab| relation, and all five
    curve points from a single cross-joined conditional sum — no
    per-k re-scan."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    cnt = tok.groupBy("token").agg(F.count("*").cast("double").alias("c"))
    ranked = cnt.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), "token")).alias("rk"),
    )
    tot = ranked.agg(F.sum("c").alias("t"))
    ks = spark.createDataFrame([(10,), (50,), (100,), (500,), (1000,)], "k int")
    covered = F.sum(
        F.when(F.col("rk") <= F.col("k"), F.col("c")).otherwise(0.0)
    )
    return (
        ranked.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "t")
        .agg(covered.alias("cov"))
        .select(
            F.col("k").cast("bigint").alias("vocab_size"),
            F.round(F.col("cov") / F.col("t"), 5).alias("corpus_coverage"),
            F.round(1 - F.col("cov") / F.col("t"), 5).alias("oov_share"),
        )
    )


@register(
    "packing_efficiency_curve",
    oracle="""
    WITH docs AS (
      SELECT CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE)
               AS n_tok
      FROM documents),
    ls AS (SELECT unnest([128, 512, 2048]) AS max_len)
    SELECT CAST(max_len AS BIGINT) AS max_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_tok > max_len THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_truncated,
           round(sum(greatest(n_tok - max_len, 0)) / sum(n_tok), 5)
             AS truncated_token_share,
           CAST(ceil(sum(least(n_tok, max_len)) / max_len) AS BIGINT)
             AS min_bins
    FROM docs CROSS JOIN ls GROUP BY max_len
    """,
    tags=("training", "packing", "agg"),
)
def q_packing_efficiency_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length budget sweep for training packing: at max_len
    ∈ {128, 512, 2048}, how many documents truncate, what share of
    tokens the truncation burns, and the bin-count LOWER BOUND
    ⌈Σmin(len, L)/L⌉ that any packing (including
    sequence_packing's first-fit) must meet — the capacity-planning
    numbers behind the context-length decision, where the token loss
    at small L trades against the padding/bin cost at large L. One
    scan; all three budget points come from a tiny cross join, the
    same no-re-scan device as vocab_coverage_curve."""
    d = _t(spark, sf_dir, "documents")
    docs = d.select(TXT.token_count(F.col("text")).cast("double").alias("n_tok"))
    ls = spark.createDataFrame([(128,), (512,), (2048,)], "max_len int")
    return (
        docs.crossJoin(F.broadcast(ls))
        .groupBy("max_len")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_tok") > F.col("max_len"), 1).otherwise(0))
            .cast("bigint")
            .alias("docs_truncated"),
            F.round(
                F.sum(F.greatest(F.col("n_tok") - F.col("max_len"), F.lit(0.0)))
                / F.sum("n_tok"),
                5,
            ).alias("truncated_token_share"),
            F.ceil(
                F.sum(F.least(F.col("n_tok"), F.col("max_len").cast("double")))
                / F.first("max_len")
            )
            .cast("bigint")
            .alias("min_bins"),
        )
        .select(
            F.col("max_len").cast("bigint").alias("max_len"),
            "n_docs",
            "docs_truncated",
            "truncated_token_share",
            "min_bins",
        )
    )


@register(
    "oaxaca_blinder",
    oracle="""
    WITH obs AS (
      SELECT CASE WHEN r_name IN ('AMERICA', 'EUROPE') THEN 'west'
                  ELSE 'rest' END AS grp,
             o_totalprice AS y, CAST(cnt AS DOUBLE) AS x
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN (SELECT l_orderkey, count(*) AS cnt
            FROM lineitem GROUP BY 1) li ON l_orderkey = o_orderkey),
    fits AS (
      SELECT grp, avg(y) AS my, avg(x) AS mx,
             regr_slope(y, x) AS b, regr_intercept(y, x) AS a
      FROM obs GROUP BY grp),
    wide AS (
      SELECT max(CASE WHEN grp = 'west' THEN my END) AS my_a,
             max(CASE WHEN grp = 'rest' THEN my END) AS my_b,
             max(CASE WHEN grp = 'west' THEN mx END) AS mx_a,
             max(CASE WHEN grp = 'rest' THEN mx END) AS mx_b,
             max(CASE WHEN grp = 'west' THEN b END) AS b_a,
             max(CASE WHEN grp = 'rest' THEN b END) AS b_b,
             max(CASE WHEN grp = 'west' THEN a END) AS a_a,
             max(CASE WHEN grp = 'rest' THEN a END) AS a_b
      FROM fits)
    SELECT round(my_a - my_b, 4) AS total_gap,
           round((mx_a - mx_b) * b_b, 4) AS endowment_effect,
           round((b_a - b_b) * mx_a + (a_a - a_b), 4) AS coefficient_effect,
           round(my_a - my_b
                 - ((mx_a - mx_b) * b_b + (b_a - b_b) * mx_a + (a_a - a_b)),
                 4) AS identity_gap
    FROM wide
    """,
    tags=("economics", "causal", "decomposition"),
)
def q_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder decomposition of the order-value gap between
    two region groups: total gap = endowment effect (groups differ
    in basket SIZE, priced at the reference group's slope) +
    coefficient effect (the same basket size is VALUED differently)
    — the labor-economics standard for splitting 'different inputs'
    from 'different returns', with the identity_gap column pinned
    to 0.0000 in both engines since ȳ = a + b·x̄ holds exactly for
    OLS. Two regr_* fits on one grouped pass; the pivot is a 2-row
    conditional max."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    li = _t(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    obs = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(cnt, o["o_orderkey"] == cnt["l_orderkey"])
        .select(
            F.when(F.col("r_name").isin("AMERICA", "EUROPE"), "west")
            .otherwise("rest")
            .alias("grp"),
            F.col("o_totalprice").alias("y"),
            F.col("cnt").cast("double").alias("x"),
        )
    )
    fits = obs.groupBy("grp").agg(
        F.avg("y").alias("my"),
        F.avg("x").alias("mx"),
        F.expr("regr_slope(y, x)").alias("b"),
        F.expr("regr_intercept(y, x)").alias("a"),
    )

    def pick(colname, grp):
        return F.max(F.when(F.col("grp") == grp, F.col(colname)))

    wide = fits.agg(
        pick("my", "west").alias("my_a"), pick("my", "rest").alias("my_b"),
        pick("mx", "west").alias("mx_a"), pick("mx", "rest").alias("mx_b"),
        pick("b", "west").alias("b_a"), pick("b", "rest").alias("b_b"),
        pick("a", "west").alias("a_a"), pick("a", "rest").alias("a_b"),
    )
    endow = (F.col("mx_a") - F.col("mx_b")) * F.col("b_b")
    coefe = (F.col("b_a") - F.col("b_b")) * F.col("mx_a") + (
        F.col("a_a") - F.col("a_b")
    )
    gap = F.col("my_a") - F.col("my_b")
    return wide.select(
        F.round(gap, 4).alias("total_gap"),
        F.round(endow, 4).alias("endowment_effect"),
        F.round(coefe, 4).alias("coefficient_effect"),
        F.round(gap - (endow + coefe), 4).alias("identity_gap"),
    )


@register(
    "duplicate_payment_screen",
    oracle="""
    WITH pairs AS (
      SELECT a.o_orderkey AS k1, b.o_orderkey AS k2,
             a.o_custkey AS cust, a.o_totalprice AS amount,
             date_diff('day', CAST(a.o_orderdate AS DATE),
                       CAST(b.o_orderdate AS DATE)) AS gap_days
      FROM orders a JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND a.o_totalprice = b.o_totalprice
       AND a.o_orderkey < b.o_orderkey
       AND CAST(b.o_orderdate AS DATE)
           BETWEEN CAST(a.o_orderdate AS DATE) - 2
               AND CAST(a.o_orderdate AS DATE) + 2)
    SELECT CAST(count(*) AS BIGINT) AS n_suspect_pairs,
           CAST(count(DISTINCT cust) AS BIGINT) AS n_customers,
           round(coalesce(sum(amount), 0), 2) AS exposure,
           CAST(coalesce(max(abs(gap_days)), -1) AS BIGINT) AS max_gap_days
    FROM pairs
    """,
    tags=("audit", "self-join", "quality"),
)
def q_duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen — the accounts-payable audit
    classic: same customer, IDENTICAL amount, within ±2 days, on
    different order keys (double-submits, retry storms, double
    billing). The self-join is keyed on (customer, amount) — both
    high-cardinality, so the equi-join does the heavy pruning and
    the date band only filters survivors; exposure sums the
    at-risk amount once per pair. At 100 TB this join shape is why
    AP systems hash on (vendor, amount) — the candidate set per key
    is tiny even when the table is not."""
    o = _t(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_orderkey").alias("k1"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").cast("date").alias("d1"),
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("cust"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderdate").cast("date").alias("d2"),
    )
    pairs = (
        a.join(b, ["cust", "amount"])
        .filter(
            (F.col("k1") < F.col("k2"))
            & (F.col("d2") >= F.date_sub(F.col("d1"), 2))
            & (F.col("d2") <= F.date_add(F.col("d1"), 2))
        )
        .select("cust", "amount", F.datediff("d2", "d1").alias("gap_days"))
    )
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_suspect_pairs"),
        F.count_distinct("cust").cast("bigint").alias("n_customers"),
        F.round(F.coalesce(F.sum("amount"), F.lit(0.0)), 2).alias("exposure"),
        F.coalesce(F.max(F.abs(F.col("gap_days"))), F.lit(-1))
        .cast("bigint")
        .alias("max_gap_days"),
    )


@register(
    "adamic_adar_linkpred",
    oracle="""
    WITH inc AS (
      SELECT DISTINCT o_custkey AS cust, l_partkey AS part
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (
      SELECT part, CAST(count(*) AS DOUBLE) AS d
      FROM inc GROUP BY part HAVING count(*) BETWEEN 2 AND 20),
    pairs AS (
      SELECT a.cust AS c1, b.cust AS c2, sum(1 / ln(deg.d)) AS aa
      FROM inc a JOIN deg ON a.part = deg.part
      JOIN inc b ON b.part = deg.part AND a.cust < b.cust
      GROUP BY 1, 2)
    SELECT c1, c2, round(aa, 4) AS adamic_adar
    FROM pairs ORDER BY round(aa, 6) DESC, c1, c2 LIMIT 10
    """,
    tags=("graph", "similarity", "join"),
)
def q_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the customer-part bipartite
    graph: candidate customer pairs scored by Σ 1/ln(degree) over
    shared parts — rare shared parts count for much more than
    popular ones, the weighting that makes AA beat raw
    common-neighbor counts. The degree filter (2..20 buyers) is the
    scalability move AND the statistics: hub parts contribute
    ≈1/ln(huge)≈0 anyway, so dropping them bounds the
    wedge-enumeration join by Σd² over SMALL degrees without
    changing the ranking materially — the same hub-cutoff every
    production link-prediction pipeline applies before the
    pair-generating self-join."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    inc = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    deg = (
        inc.groupBy("part")
        .agg(F.count("*").cast("double").alias("d"))
        .filter(F.col("d").between(2, 20))
    )
    a = inc.select(F.col("cust").alias("c1"), "part")
    b = inc.select(F.col("cust").alias("c2"), "part")
    pairs = (
        a.join(deg, "part")
        .join(b, "part")
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.sum(1 / F.log(F.col("d"))).alias("aa"))
    )
    return (
        pairs.orderBy(F.round(F.col("aa"), 6).desc(), "c1", "c2")
        .limit(10)
        .select("c1", "c2", F.round("aa", 4).alias("adamic_adar"))
    )


@register(
    "factorial_interaction_effect",
    oracle="""
    WITH obs AS (
      SELECT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                  ::UBIGINT % 2 AS INT) AS fa,
             CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS fb,
             o_totalprice AS y
      FROM orders),
    cells AS (
      SELECT fa, fb, avg(y) AS m, CAST(count(*) AS BIGINT) AS n
      FROM obs GROUP BY 1, 2),
    wide AS (
      SELECT max(CASE WHEN fa = 0 AND fb = 0 THEN m END) AS m00,
             max(CASE WHEN fa = 0 AND fb = 1 THEN m END) AS m01,
             max(CASE WHEN fa = 1 AND fb = 0 THEN m END) AS m10,
             max(CASE WHEN fa = 1 AND fb = 1 THEN m END) AS m11,
             min(n) AS min_cell_n
      FROM cells)
    SELECT round((m10 + m11) / 2 - (m00 + m01) / 2, 4) AS main_effect_a,
           round((m01 + m11) / 2 - (m00 + m10) / 2, 4) AS main_effect_b,
           round((m11 - m10) - (m01 - m00), 4) AS interaction,
           min_cell_n
    FROM wide
    """,
    tags=("experimentation", "causal", "agg"),
)
def q_factorial_interaction_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2×2 factorial analysis: a hash-assigned factor crossed with
    the weekend factor, reporting both main effects and the
    INTERACTION contrast (m₁₁−m₁₀)−(m₀₁−m₀₀) — the quantity
    one-factor-at-a-time experimentation structurally cannot see
    (if the interaction is nonzero, the 'effect of A' is not a
    number but a function of B, and shipping decisions made from
    marginal A/B tests are wrong). Four cell means from ONE
    aggregate; min_cell_n guards against reading effects off a
    starved cell."""
    o = _t(spark, sf_dir, "orders")
    obs = o.select(
        CUR.hash_bucket(F.col("o_custkey"), 2).alias("fa"),
        F.when(
            F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7), 1
        )
        .otherwise(0)
        .alias("fb"),
        F.col("o_totalprice").alias("y"),
    )
    cells = obs.groupBy("fa", "fb").agg(
        F.avg("y").alias("m"), F.count("*").cast("bigint").alias("n")
    )

    def cell(fa, fb):
        return F.max(
            F.when((F.col("fa") == fa) & (F.col("fb") == fb), F.col("m"))
        )

    wide = cells.agg(
        cell(0, 0).alias("m00"),
        cell(0, 1).alias("m01"),
        cell(1, 0).alias("m10"),
        cell(1, 1).alias("m11"),
        F.min("n").alias("min_cell_n"),
    )
    return wide.select(
        F.round(
            (F.col("m10") + F.col("m11")) / 2 - (F.col("m00") + F.col("m01")) / 2, 4
        ).alias("main_effect_a"),
        F.round(
            (F.col("m01") + F.col("m11")) / 2 - (F.col("m00") + F.col("m10")) / 2, 4
        ).alias("main_effect_b"),
        F.round(
            (F.col("m11") - F.col("m10")) - (F.col("m01") - F.col("m00")), 4
        ).alias("interaction"),
        "min_cell_n",
    )


@register(
    "metcalfe_exponent",
    oracle="""
    WITH monthly AS (
      SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
             CAST(count(DISTINCT o_custkey) AS DOUBLE) AS users,
             sum(o_totalprice) AS rev
      FROM orders GROUP BY 1),
    fit AS (
      SELECT CAST(count(*) AS BIGINT) AS n_months,
             regr_slope(ln(rev), ln(users)) AS beta,
             regr_intercept(ln(rev), ln(users)) AS lna,
             regr_r2(ln(rev), ln(users)) AS r2
      FROM monthly WHERE users > 0 AND rev > 0)
    SELECT n_months, round(beta, 4) AS network_exponent,
           round(exp(lna), 2) AS scale_constant,
           round(r2, 4) AS r_squared
    FROM fit
    """,
    tags=("economics", "regression", "timeseries"),
)
def q_metcalfe_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network-value exponent: monthly revenue regressed on monthly
    active customers in log-log space — β̂=1 is linear (Sarnoff),
    β̂=2 is Metcalfe's law, and real platforms land between
    (Odlyzko's n·log n critique); the r² says whether a power law
    describes the relationship at all. The whole 'law of network
    value' debate reduces to ONE regr_slope aggregate over the
    |months| relation — with the fact table contributing a single
    distinct-count-per-month pass."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m")
    ).agg(
        F.count_distinct("o_custkey").cast("double").alias("users"),
        F.sum("o_totalprice").alias("rev"),
    )
    fit = monthly.filter((F.col("users") > 0) & (F.col("rev") > 0)).agg(
        F.count("*").cast("bigint").alias("n_months"),
        F.expr("regr_slope(ln(rev), ln(users))").alias("beta"),
        F.expr("regr_intercept(ln(rev), ln(users))").alias("lna"),
        F.expr("regr_r2(ln(rev), ln(users))").alias("r2"),
    )
    return fit.select(
        "n_months",
        F.round("beta", 4).alias("network_exponent"),
        F.round(F.exp("lna"), 2).alias("scale_constant"),
        F.round("r2", 4).alias("r_squared"),
    )


@register(
    "mediation_baron_kenny",
    oracle="""
    WITH obs AS (
      SELECT CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN 1.0 ELSE 0.0 END AS x,
             CAST(cnt AS DOUBLE) AS med, o_totalprice AS y
      FROM orders JOIN (SELECT l_orderkey, count(*) AS cnt
                        FROM lineitem GROUP BY 1) li
        ON l_orderkey = o_orderkey),
    mom AS (
      SELECT avg(x) AS mx, avg(med) AS mm, avg(y) AS my,
             covar_samp(x, med) AS sxm, covar_samp(x, y) AS sxy,
             covar_samp(med, y) AS smy,
             var_samp(x) AS sxx, var_samp(med) AS smm,
             CAST(count(*) AS BIGINT) AS n
      FROM obs),
    paths AS (
      SELECT n,
             sxm / sxx AS a,
             (smy * sxx - sxy * sxm) / (smm * sxx - sxm * sxm) AS b,
             (sxy * smm - smy * sxm) / (smm * sxx - sxm * sxm) AS c_prime,
             sxy / sxx AS c_total
      FROM mom)
    SELECT n AS n_orders,
           round(c_total, 4) AS total_effect,
           round(a * b, 4) AS indirect_effect,
           round(c_prime, 4) AS direct_effect,
           round(c_total - (a * b + c_prime), 6) AS identity_gap
    FROM paths
    """,
    tags=("causal", "regression", "decomposition"),
)
def q_mediation_baron_kenny(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baron-Kenny mediation analysis: does the weekend effect on
    order value flow THROUGH basket size? Path a (X→M), path b
    (M→Y holding X — the two-covariate OLS coefficient in closed
    form from the moment matrix), direct path c′, and the exact
    linear-model identity total = indirect(a·b) + direct, pinned by
    the identity_gap column at 0.000000 in both engines. All four
    regressions come from ONE moments aggregate (means, variances,
    covariances) — the mediation table costs a single scan however
    large the fact table."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    obs = o.join(cnt, o["o_orderkey"] == cnt["l_orderkey"]).select(
        F.when(F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7), 1.0)
        .otherwise(0.0)
        .alias("x"),
        F.col("cnt").cast("double").alias("med"),
        F.col("o_totalprice").alias("y"),
    )
    mom = obs.agg(
        F.covar_samp("x", "med").alias("sxm"),
        F.covar_samp("x", "y").alias("sxy"),
        F.covar_samp("med", "y").alias("smy"),
        F.var_samp("x").alias("sxx"),
        F.var_samp("med").alias("smm"),
        F.count("*").cast("bigint").alias("n"),
    )
    det = F.col("smm") * F.col("sxx") - F.col("sxm") * F.col("sxm")
    a = F.col("sxm") / F.col("sxx")
    b = (F.col("smy") * F.col("sxx") - F.col("sxy") * F.col("sxm")) / det
    c_prime = (F.col("sxy") * F.col("smm") - F.col("smy") * F.col("sxm")) / det
    c_total = F.col("sxy") / F.col("sxx")
    return mom.select(
        F.col("n").alias("n_orders"),
        F.round(c_total, 4).alias("total_effect"),
        F.round(a * b, 4).alias("indirect_effect"),
        F.round(c_prime, 4).alias("direct_effect"),
        F.round(c_total - (a * b + c_prime), 6).alias("identity_gap"),
    )


@register(
    "permutation_test",
    oracle="""
    WITH obs AS (
      SELECT o_orderkey,
             CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS g,
             o_totalprice AS y
      FROM orders),
    share AS (SELECT avg(CAST(g AS DOUBLE)) AS p FROM obs),
    observed AS (
      SELECT avg(CASE WHEN g = 1 THEN y END)
             - avg(CASE WHEN g = 0 THEN y END) AS d_obs
      FROM obs),
    reps AS (SELECT unnest(generate_series(1, 50)) AS b),
    perm AS (
      SELECT b,
             CASE WHEN (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                  || '#' || CAST(b AS VARCHAR)), 1, 8))::UBIGINT
                  % 1000000) / 1000000.0 < p
                  THEN 1 ELSE 0 END AS gp, y
      FROM obs CROSS JOIN reps, share),
    pd AS (
      SELECT b, avg(CASE WHEN gp = 1 THEN y END)
                - avg(CASE WHEN gp = 0 THEN y END) AS d
      FROM perm GROUP BY b)
    SELECT round(d_obs, 4) AS observed_diff,
           CAST(count(*) AS BIGINT) AS n_permutations,
           round((1.0 + sum(CASE WHEN abs(d) >= abs(d_obs)
                                 THEN 1 ELSE 0 END)) / (count(*) + 1), 4)
             AS p_value
    FROM pd, observed GROUP BY d_obs
    """,
    tags=("stats", "resampling", "experimentation"),
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the weekend effect on order value: 50
    label reassignments drawn from bit-exact md5 uniforms at the
    observed group share, two-sided p = (1+#{|d_b|≥|d_obs|})/(B+1)
    — the distribution-free significance machinery that needs NO
    variance formula (welch_ttest's normality assumption, dropped),
    and the deterministic-resampling twin of poisson_bootstrap_ci:
    every engine and every run draws the identical null sample.
    Each replicate is one conditional aggregate; all 50 share one
    scan via the replicate cross join — map-side combined on the
    50-value key."""
    o = _t(spark, sf_dir, "orders")
    obs = o.select(
        "o_orderkey",
        F.when(
            F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7), 1
        )
        .otherwise(0)
        .alias("g"),
        F.col("o_totalprice").alias("y"),
    )
    share = obs.agg(F.avg(F.col("g").cast("double")).alias("p"))
    observed = obs.agg(
        (
            F.avg(F.when(F.col("g") == 1, F.col("y")))
            - F.avg(F.when(F.col("g") == 0, F.col("y")))
        ).alias("d_obs")
    )
    reps = spark.range(1, 51).select(F.col("id").cast("int").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    ) / 1000000.0
    perm = (
        obs.crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(share))
        .select(
            "b", F.when(u < F.col("p"), 1).otherwise(0).alias("gp"), "y"
        )
    )
    pd = perm.groupBy("b").agg(
        (
            F.avg(F.when(F.col("gp") == 1, F.col("y")))
            - F.avg(F.when(F.col("gp") == 0, F.col("y")))
        ).alias("d")
    )
    return pd.crossJoin(F.broadcast(observed)).groupBy("d_obs").agg(
        F.count("*").cast("bigint").alias("n_permutations"),
        F.round(
            (
                1.0
                + F.sum(
                    F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
                )
            )
            / (F.count("*") + 1),
            4,
        ).alias("p_value"),
    ).select(
        F.round("d_obs", 4).alias("observed_diff"),
        "n_permutations",
        "p_value",
    )


@register(
    "process_capability_cpk",
    oracle="""
    WITH st AS (
      SELECT avg(o_totalprice) AS mu, stddev_samp(o_totalprice) AS sd,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CASE WHEN o_totalprice < 1000
                           OR o_totalprice > 400000
                      THEN 1 ELSE 0 END) AS DOUBLE) AS n_out
      FROM orders)
    SELECT CAST(n AS BIGINT) AS n_orders,
           round((400000 - 1000) / (6 * sd), 4) AS cp,
           round(least(400000 - mu, mu - 1000) / (3 * sd), 4) AS cpk,
           round(1e6 * n_out / n, 1) AS observed_ppm_out
    FROM st
    """,
    tags=("spc", "quality", "agg"),
)
def q_process_capability_cpk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-capability indices against spec limits [1k, 400k]:
    Cp = spec width / 6σ (what the process COULD hold if centered)
    vs Cpk = nearest-limit margin / 3σ (what it actually holds
    given its centering) — the manufacturing acceptance numbers
    (1.33 is the classic minimum) next to the empirically observed
    ppm outside spec, which needs no normality assumption at all.
    Completes the SPC tier: ewma_control_chart watches the mean,
    bollinger_breakouts the volatility, Cp/Cpk judges the process
    against external REQUIREMENTS. One scan, one row."""
    o = _t(spark, sf_dir, "orders")
    st = o.agg(
        F.avg("o_totalprice").alias("mu"),
        F.stddev_samp("o_totalprice").alias("sd"),
        F.count("*").cast("double").alias("n"),
        F.sum(
            F.when(
                (F.col("o_totalprice") < 1000) | (F.col("o_totalprice") > 400000), 1
            ).otherwise(0)
        )
        .cast("double")
        .alias("n_out"),
    )
    return st.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round((400000 - 1000) / (6 * F.col("sd")), 4).alias("cp"),
        F.round(
            F.least(F.lit(400000) - F.col("mu"), F.col("mu") - 1000)
            / (3 * F.col("sd")),
            4,
        ).alias("cpk"),
        F.round(1e6 * F.col("n_out") / F.col("n"), 1).alias("observed_ppm_out"),
    )


@register(
    "bayes_ab_beta",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2
               AS arm,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id),
    counts AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS DOUBLE) AS ka,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS DOUBLE) AS kb
      FROM assigned),
    grid AS (
      SELECT (CAST(j AS DOUBLE) + 0.5) / 400 AS p
      FROM (SELECT unnest(generate_series(0, 399)) AS j)),
    logw AS (
      SELECT p,
             ka * ln(p) + (na - ka) * ln(1 - p) AS la,
             kb * ln(p) + (nb - kb) * ln(1 - p) AS lb
      FROM grid, counts),
    mx AS (SELECT max(la) AS ma, max(lb) AS mb FROM logw),
    w AS (
      SELECT p, exp(la - ma) AS wa, exp(lb - mb) AS wb
      FROM logw, mx),
    nrm AS (SELECT sum(wa) AS za, sum(wb) AS zb FROM w),
    cum AS (
      SELECT p, wa / za AS fa,
             (sum(wb) OVER (ORDER BY p) - wb) / zb AS fb_below
      FROM w, nrm),
    prob AS (SELECT sum(fa * fb_below) AS p_a_gt_b FROM cum)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ka AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(kb AS BIGINT) AS conv_b,
           round((ka + 1) / (na + 2) - (kb + 1) / (nb + 2), 5)
             AS expected_lift,
           round(p_a_gt_b, 4) AS prob_a_beats_b
    FROM prob, counts
    """,
    tags=("experimentation", "stats", "estimation"),
)
def q_bayes_ab_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B on user conversion with Beta-Bernoulli
    posteriors, P(p_A > p_B) computed by DETERMINISTIC 400-point
    grid quadrature — log-space densities max-stabilized before
    exponentiation (the only way k·ln p survives thousands of
    conversions), CDF of one arm as a prefix window, and the
    probability as Σ f_A·F_B — no Monte Carlo, no special
    functions, bit-identical across engines. This is the decision
    quantity stakeholders actually ask for ('how sure are we A
    wins'), which the SPRT/p-value tier (sprt_boundary_crossing,
    permutation_test) deliberately does not emit; expected lift
    comes from the closed-form posterior means."""
    e = _t(spark, sf_dir, "events")
    assigned = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    ).select(
        CUR.hash_bucket(F.col("user_id"), 2).alias("arm"), "conv"
    )
    counts = assigned.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("double")
        .alias("ka"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("double")
        .alias("nb"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("double")
        .alias("kb"),
    )
    grid = spark.range(0, 400).select(
        ((F.col("id").cast("double") + 0.5) / 400).alias("p")
    )
    logw = grid.crossJoin(F.broadcast(counts)).select(
        "p",
        (F.col("ka") * F.log("p") + (F.col("na") - F.col("ka")) * F.log(1 - F.col("p"))).alias(
            "la"
        ),
        (F.col("kb") * F.log("p") + (F.col("nb") - F.col("kb")) * F.log(1 - F.col("p"))).alias(
            "lb"
        ),
    )
    mx = logw.agg(F.max("la").alias("ma"), F.max("lb").alias("mb"))
    w = logw.crossJoin(F.broadcast(mx)).select(
        "p",
        F.exp(F.col("la") - F.col("ma")).alias("wa"),
        F.exp(F.col("lb") - F.col("mb")).alias("wb"),
    )
    nrm = w.agg(F.sum("wa").alias("za"), F.sum("wb").alias("zb"))
    wp = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, 0)
    cum = w.crossJoin(F.broadcast(nrm)).select(
        "p",
        (F.col("wa") / F.col("za")).alias("fa"),
        ((F.sum("wb").over(wp) - F.col("wb")) / F.col("zb")).alias("fb_below"),
    )
    prob = cum.agg(F.sum(F.col("fa") * F.col("fb_below")).alias("p_a_gt_b"))
    return prob.crossJoin(F.broadcast(counts)).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ka").cast("bigint").alias("conv_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("kb").cast("bigint").alias("conv_b"),
        F.round(
            (F.col("ka") + 1) / (F.col("na") + 2)
            - (F.col("kb") + 1) / (F.col("nb") + 2),
            5,
        ).alias("expected_lift"),
        F.round("p_a_gt_b", 4).alias("prob_a_beats_b"),
    )


@register(
    "johnson_lindenstrauss_audit",
    oracle="""
    WITH dims AS (
      SELECT vec_id, CAST(i AS INT) - 1 AS d,
             embedding[CAST(i AS INT)]::DOUBLE AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    rmat AS (
      SELECT d, k,
             CASE WHEN ('0x' || substr(md5(CAST(d AS VARCHAR) || '#'
                        || CAST(k AS VARCHAR)), 1, 8))::UBIGINT % 2 = 0
                  THEN 0.25 ELSE -0.25 END AS r
      FROM (SELECT unnest(generate_series(0, 63)) AS d),
           (SELECT unnest(generate_series(0, 15)) AS k)),
    proj AS (
      SELECT vec_id, k, sum(x * r) AS y
      FROM dims JOIN rmat USING (d) GROUP BY 1, 2),
    n2_orig AS (
      SELECT vec_id, sum(x * x) AS n2 FROM dims GROUP BY vec_id),
    n2_proj AS (
      SELECT vec_id, sum(y * y) AS p2 FROM proj GROUP BY vec_id),
    pairs AS (
      SELECT a.vec_id AS i,
             ao.n2 + bo.n2 - 2 * (
               SELECT sum(da.x * db.x) FROM dims da JOIN dims db
               ON da.d = db.d AND da.vec_id = a.vec_id
              AND db.vec_id = b.vec_id) AS d2,
             ap.p2 + bp.p2 - 2 * (
               SELECT sum(pa.y * pb.y) FROM proj pa JOIN proj pb
               ON pa.k = pb.k AND pa.vec_id = a.vec_id
              AND pb.vec_id = b.vec_id) AS dp2
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 250
      JOIN n2_orig ao ON ao.vec_id = a.vec_id
      JOIN n2_orig bo ON bo.vec_id = b.vec_id
      JOIN n2_proj ap ON ap.vec_id = a.vec_id
      JOIN n2_proj bp ON bp.vec_id = b.vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(abs(dp2 / d2 - 1)), 4) AS mean_distortion,
           round(max(abs(dp2 / d2 - 1)), 4) AS max_distortion
    FROM pairs WHERE d2 > 0
    """,
    tags=("embeddings", "projection", "hash"),
)
def q_johnson_lindenstrauss_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss in practice: project the 64-dim
    embeddings to 16 dims through a DETERMINISTIC ±1/√16 sign
    matrix (md5 bits — Achlioptas' database-friendly construction,
    reproducible across engines and cluster generations), then audit
    squared-distance distortion |‖Ax−Ay‖²/‖x−y‖² − 1| over 250
    disjoint pairs. This is the empirical check behind every
    'project first, then LSH' pipeline (ann_lsh_bucketed's
    hyperplanes assume distances survive); JL theory says ε ~
    √(ln n / k) — the measured max against that budget decides
    whether k=16 is spendable. The projection is one join-aggregate
    against a 1024-row broadcast matrix; distances come from norms
    + dots, never materialized coordinates."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("d", "x")
    ).select("vec_id", "d", F.col("x").cast("double").alias("x"))
    ds = spark.range(0, 64).select(F.col("id").cast("int").alias("d"))
    ks = spark.range(0, 16).select(F.col("id").cast("int").alias("k"))
    sgn = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"), F.lit("#"), F.col("k").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        0.25,
    ).otherwise(-0.25)
    rmat = ds.crossJoin(ks).select("d", "k", sgn.alias("r"))
    proj = (
        dims.join(F.broadcast(rmat), "d")
        .groupBy("vec_id", "k")
        .agg(F.sum(F.col("x") * F.col("r")).alias("y"))
    )
    n2_orig = dims.groupBy("vec_id").agg(F.sum(F.col("x") * F.col("x")).alias("n2"))
    n2_proj = proj.groupBy("vec_id").agg(F.sum(F.col("y") * F.col("y")).alias("p2"))
    pair_ids = e.select(F.col("vec_id").alias("i")).join(
        e.select((F.col("vec_id") - 250).alias("i"), F.col("vec_id").alias("j")),
        "i",
    )
    da = dims.select(F.col("vec_id").alias("i"), "d", F.col("x").alias("xa"))
    db = dims.select(F.col("vec_id").alias("j"), "d", F.col("x").alias("xb"))
    dots_o = (
        pair_ids.join(da, "i")
        .join(db, ["j", "d"])
        .groupBy("i", "j")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot_o"))
    )
    pa = proj.select(F.col("vec_id").alias("i"), "k", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("j"), "k", F.col("y").alias("yb"))
    dots_p = (
        pair_ids.join(pa, "i")
        .join(pb, ["j", "k"])
        .groupBy("i", "j")
        .agg(F.sum(F.col("ya") * F.col("yb")).alias("dot_p"))
    )
    pairs = (
        dots_o.join(dots_p, ["i", "j"])
        .join(n2_orig.select(F.col("vec_id").alias("i"), F.col("n2").alias("n2a")), "i")
        .join(n2_orig.select(F.col("vec_id").alias("j"), F.col("n2").alias("n2b")), "j")
        .join(n2_proj.select(F.col("vec_id").alias("i"), F.col("p2").alias("p2a")), "i")
        .join(n2_proj.select(F.col("vec_id").alias("j"), F.col("p2").alias("p2b")), "j")
        .select(
            (F.col("n2a") + F.col("n2b") - 2 * F.col("dot_o")).alias("d2"),
            (F.col("p2a") + F.col("p2b") - 2 * F.col("dot_p")).alias("dp2"),
        )
        .filter(F.col("d2") > 0)
    )
    dist = F.abs(F.col("dp2") / F.col("d2") - 1)
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.avg(dist), 4).alias("mean_distortion"),
        F.round(F.max(dist), 4).alias("max_distortion"),
    )


@register(
    "median_of_medians_gap",
    oracle="""
    WITH parts AS (
      SELECT c_nationkey AS p, o_totalprice AS v
      FROM orders JOIN customer ON o_custkey = c_custkey),
    local_med AS (
      SELECT p, CAST(quantile_cont(v, 0.5) AS DOUBLE) AS med,
             CAST(count(*) AS DOUBLE) AS n
      FROM parts GROUP BY p),
    mom AS (
      SELECT CAST(quantile_cont(med, 0.5) AS DOUBLE) AS mom,
             sum(med * n) / sum(n) AS weighted_mean_med
      FROM local_med),
    truth AS (
      SELECT CAST(quantile_cont(v, 0.5) AS DOUBLE) AS true_med FROM parts)
    SELECT round(true_med, 2) AS exact_median,
           round(mom, 2) AS median_of_medians,
           round(weighted_mean_med, 2) AS weighted_mean_of_medians,
           round(100 * abs(mom - true_med) / true_med, 4) AS mom_error_pct
    FROM mom, truth
    """,
    tags=("percentile", "scale", "audit"),
)
def q_median_of_medians_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why quantiles don't merge: the median-of-per-partition-
    medians (nations standing in for partitions) against the exact
    global median — the error this naive distributed 'median' makes
    is exactly the reason mergeable quantile SKETCHES (t-digest /
    approx_percentile, the approx_distinct_bands tier) exist, while
    means merge exactly (the weighted mean-of-medians column shows
    even weighting doesn't fix it, because a median is not a linear
    statistic). One grouped exact median + a 25-row reduction vs
    one global exact median; the gap is the lesson."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    parts = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_nationkey").alias("p"), F.col("o_totalprice").alias("v")
    )
    local_med = parts.groupBy("p").agg(
        F.expr("percentile(v, 0.5)").alias("med"),
        F.count("*").cast("double").alias("n"),
    )
    mom = local_med.agg(
        F.expr("percentile(med, 0.5)").alias("mom"),
        (F.sum(F.col("med") * F.col("n")) / F.sum("n")).alias("weighted_mean_med"),
    )
    truth = parts.agg(F.expr("percentile(v, 0.5)").alias("true_med"))
    return mom.crossJoin(F.broadcast(truth)).select(
        F.round("true_med", 2).alias("exact_median"),
        F.round("mom", 2).alias("median_of_medians"),
        F.round("weighted_mean_med", 2).alias("weighted_mean_of_medians"),
        F.round(
            100 * F.abs(F.col("mom") - F.col("true_med")) / F.col("true_med"), 4
        ).alias("mom_error_pct"),
    )


@register(
    "dickey_fuller_test",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    lagged AS (
      SELECT v - lag(v) OVER (ORDER BY d) AS dy,
             lag(v) OVER (ORDER BY d) AS ylag
      FROM daily),
    obs AS (SELECT dy, ylag FROM lagged WHERE ylag IS NOT NULL),
    fit AS (
      SELECT regr_slope(dy, ylag) AS beta,
             regr_intercept(dy, ylag) AS alpha,
             CAST(count(*) AS DOUBLE) AS n,
             var_samp(ylag) AS sxx
      FROM obs),
    resid AS (
      SELECT sum(pow(dy - alpha - beta * ylag, 2)) / (n - 2) AS s2,
             any_value(beta) AS beta, any_value(n) AS n,
             any_value(sxx) AS sxx
      FROM obs, fit GROUP BY n)
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(beta, 6) AS df_beta,
           round(beta / sqrt(s2 / ((n - 1) * sxx)), 4) AS df_statistic,
           beta / sqrt(s2 / ((n - 1) * sxx)) < -2.86 AS rejects_unit_root_5pct
    FROM resid
    """,
    tags=("timeseries", "stats", "regression"),
)
def q_dickey_fuller_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test on daily revenue: regress Δy on
    y_{t−1} — β near 0 means shocks PERSIST (a random walk, where
    every 'trend' is spurious and differencing is mandatory), β
    significantly negative means mean reversion and levels models
    are safe. The DF statistic β/se(β) uses its own critical values
    (−2.86 at 5%, not the normal −1.96 — the distribution is
    nonstandard under the null, which is the whole Dickey-Fuller
    contribution); se comes from the closed-form OLS residual
    variance, so the test is two windows and two aggregates over
    the |dates| relation — the stationarity gate run before
    yule_walker_ar2 fits anything."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    w = Window.orderBy("d")
    obs = daily.select(
        (F.col("v") - F.lag("v").over(w)).alias("dy"),
        F.lag("v").over(w).alias("ylag"),
    ).filter(F.col("ylag").isNotNull())
    fit = obs.agg(
        F.expr("regr_slope(dy, ylag)").alias("beta"),
        F.expr("regr_intercept(dy, ylag)").alias("alpha"),
        F.count("*").cast("double").alias("n"),
        F.var_samp("ylag").alias("sxx"),
    )
    resid = obs.crossJoin(F.broadcast(fit)).groupBy("n").agg(
        (
            F.sum(
                F.pow(
                    F.col("dy") - F.col("alpha") - F.col("beta") * F.col("ylag"), 2
                )
            )
            / (F.col("n") - 2)
        ).alias("s2"),
        F.first("beta").alias("beta"),
        F.first("sxx").alias("sxx"),
    )
    se = F.sqrt(F.col("s2") / ((F.col("n") - 1) * F.col("sxx")))
    return resid.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round("beta", 6).alias("df_beta"),
        F.round(F.col("beta") / se, 4).alias("df_statistic"),
        (F.col("beta") / se < -2.86).alias("rejects_unit_root_5pct"),
    )


@register(
    "engle_granger_cointegration",
    oracle="""
    WITH g AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS x
      FROM orders GROUP BY 1),
    nat AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name = 'GERMANY' GROUP BY 1),
    series AS (
      SELECT g.d, g.x, coalesce(nat.y, 0) AS y
      FROM g LEFT JOIN nat ON g.d = nat.d),
    coint AS (
      SELECT regr_slope(y, x) AS b, regr_intercept(y, x) AS a
      FROM series),
    resid AS (
      SELECT d, y - a - b * x AS u FROM series, coint),
    lagged AS (
      SELECT u - lag(u) OVER (ORDER BY d) AS du,
             lag(u) OVER (ORDER BY d) AS ulag
      FROM resid),
    obs AS (SELECT du, ulag FROM lagged WHERE ulag IS NOT NULL),
    fit AS (
      SELECT regr_slope(du, ulag) AS beta,
             regr_intercept(du, ulag) AS alpha,
             CAST(count(*) AS DOUBLE) AS n, var_samp(ulag) AS sxx
      FROM obs),
    dfr AS (
      SELECT sum(pow(du - alpha - beta * ulag, 2)) / (n - 2) AS s2,
             any_value(beta) AS beta, any_value(n) AS n,
             any_value(sxx) AS sxx
      FROM obs, fit GROUP BY n)
    SELECT CAST(n AS BIGINT) AS n_obs,
           round((SELECT b FROM coint), 5) AS hedge_ratio,
           round(beta / sqrt(s2 / ((n - 1) * sxx)), 4) AS eg_statistic,
           beta / sqrt(s2 / ((n - 1) * sxx)) < -3.34
             AS cointegrated_5pct
    FROM dfr
    """,
    tags=("timeseries", "regression", "stats"),
)
def q_engle_granger_cointegration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger two-step cointegration between one nation's
    revenue and the global series: OLS gives the hedge ratio, then
    the Dickey-Fuller machinery (dickey_fuller_test) runs on the
    RESIDUAL — if the residual is stationary the two trending
    series share a common stochastic trend and the spread is
    tradeable/monitorable, the distinction that separates genuine
    long-run relationships from the spurious regressions two random
    walks always produce (Granger & Newbold). EG's own critical
    value (−3.34, stricter than DF's because the hedge ratio was
    estimated) gates the verdict; the whole two-step is three
    aggregates and two lag windows over the |dates| relation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    g = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("x")
    )
    nat = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(n.filter(F.col("n_name") == "GERMANY")),
            c["c_nationkey"] == n["n_nationkey"],
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    series = g.join(nat, "d", "left").select(
        "d", "x", F.coalesce("y", F.lit(0.0)).alias("y")
    )
    coint = series.agg(
        F.expr("regr_slope(y, x)").alias("b"),
        F.expr("regr_intercept(y, x)").alias("a"),
    )
    resid = series.crossJoin(F.broadcast(coint)).select(
        "d", (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("u"), "b"
    )
    w = Window.orderBy("d")
    obs = resid.select(
        (F.col("u") - F.lag("u").over(w)).alias("du"),
        F.lag("u").over(w).alias("ulag"),
        "b",
    ).filter(F.col("ulag").isNotNull())
    fit = obs.agg(
        F.expr("regr_slope(du, ulag)").alias("beta"),
        F.expr("regr_intercept(du, ulag)").alias("alpha"),
        F.count("*").cast("double").alias("n"),
        F.var_samp("ulag").alias("sxx"),
        F.first("b").alias("hedge"),
    )
    dfr = obs.crossJoin(F.broadcast(fit)).groupBy("n").agg(
        (
            F.sum(
                F.pow(F.col("du") - F.col("alpha") - F.col("beta") * F.col("ulag"), 2)
            )
            / (F.col("n") - 2)
        ).alias("s2"),
        F.first("beta").alias("beta"),
        F.first("sxx").alias("sxx"),
        F.first("hedge").alias("hedge"),
    )
    se = F.sqrt(F.col("s2") / ((F.col("n") - 1) * F.col("sxx")))
    return dfr.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round("hedge", 5).alias("hedge_ratio"),
        F.round(F.col("beta") / se, 4).alias("eg_statistic"),
        (F.col("beta") / se < -3.34).alias("cointegrated_5pct"),
    )


@register(
    "granger_causality_f",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS x
      FROM events WHERE event_type = 'click' GROUP BY 1),
    p AS (
      SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    series AS (
      SELECT p.d, p.y, coalesce(c.x, 0) AS x
      FROM p LEFT JOIN c ON p.d = c.d),
    lagged AS (
      SELECT y,
             lag(y) OVER (ORDER BY d) AS yl,
             lag(x) OVER (ORDER BY d) AS xl
      FROM series),
    obs AS (SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL),
    mom AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             var_samp(y) AS syy, var_samp(yl) AS s11, var_samp(xl) AS s22,
             covar_samp(y, yl) AS s1y, covar_samp(y, xl) AS s2y,
             covar_samp(yl, xl) AS s12
      FROM obs),
    ssr AS (
      SELECT n,
             (n - 1) * (syy - s1y * s1y / s11) AS ssr_r,
             (n - 1) * (syy
               - (s1y * (s1y * s22 - s2y * s12)
                  + s2y * (s2y * s11 - s1y * s12))
                 / (s11 * s22 - s12 * s12)) AS ssr_u
      FROM mom)
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(ssr_r, 2) AS ssr_restricted,
           round(ssr_u, 2) AS ssr_unrestricted,
           round((ssr_r - ssr_u) / (ssr_u / (n - 3)), 4) AS granger_f,
           (ssr_r - ssr_u) / (ssr_u / (n - 3)) > 3.85
             AS clicks_granger_cause_purchases
    FROM ssr
    """,
    tags=("timeseries", "causal", "regression"),
)
def q_granger_causality_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality (1 lag): do yesterday's clicks improve the
    purchase forecast BEYOND yesterday's purchases alone? F-test of
    the restricted AR(1) against the unrestricted bivariate model —
    the predictive-causality formalization of what
    lagged_cross_correlation only hints at (correlation at lag k
    can be pure autocorrelation echo; Granger conditions on the
    outcome's own history). Both SSRs come in CLOSED FORM from one
    moment-matrix aggregate (the 2×2 normal equations solved by
    Cramer's rule inside the query) — no optimizer, one scan, two
    lag windows."""
    e = _t(spark, sf_dir, "events")
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("x"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.count("*").cast("double").alias("y"))
    )
    series = p.join(c, "d", "left").select(
        "d", "y", F.coalesce("x", F.lit(0.0)).alias("x")
    )
    w = Window.orderBy("d")
    obs = series.select(
        "y",
        F.lag("y").over(w).alias("yl"),
        F.lag("x").over(w).alias("xl"),
    ).filter(F.col("yl").isNotNull())
    mom = obs.agg(
        F.count("*").cast("double").alias("n"),
        F.var_samp("y").alias("syy"),
        F.var_samp("yl").alias("s11"),
        F.var_samp("xl").alias("s22"),
        F.covar_samp("y", "yl").alias("s1y"),
        F.covar_samp("y", "xl").alias("s2y"),
        F.covar_samp("yl", "xl").alias("s12"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    ssr_r = (F.col("n") - 1) * (
        F.col("syy") - F.col("s1y") * F.col("s1y") / F.col("s11")
    )
    ssr_u = (F.col("n") - 1) * (
        F.col("syy")
        - (
            F.col("s1y") * (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12"))
            + F.col("s2y") * (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12"))
        )
        / det
    )
    fstat = (ssr_r - ssr_u) / (ssr_u / (F.col("n") - 3))
    return mom.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(ssr_r, 2).alias("ssr_restricted"),
        F.round(ssr_u, 2).alias("ssr_unrestricted"),
        F.round(fstat, 4).alias("granger_f"),
        (fstat > 3.85).alias("clicks_granger_cause_purchases"),
    )


@register(
    "beta_binomial_overdispersion",
    oracle="""
    WITH outcome AS (
      SELECT l_orderkey,
             max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
      FROM lineitem GROUP BY 1),
    grp AS (
      SELECT c_nationkey,
             CAST(count(*) AS DOUBLE) AS n, CAST(sum(ret) AS DOUBLE) AS k
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN outcome ON o_orderkey = l_orderkey
      GROUP BY 1),
    pooled AS (SELECT sum(k) / sum(n) AS p, sum(n) AS nn,
                      CAST(count(*) AS DOUBLE) AS g FROM grp),
    chi AS (
      SELECT sum(pow(k - n * p, 2) / (n * p * (1 - p))) AS x2,
             any_value(p) AS p, any_value(g) AS g,
             avg(n) AS nbar
      FROM grp, pooled GROUP BY p, g)
    SELECT CAST(g AS BIGINT) AS n_groups,
           round(p, 5) AS pooled_rate,
           round(x2 / (g - 1), 4) AS dispersion_ratio,
           round(greatest((x2 / (g - 1) - 1) / (nbar - 1), 0), 6)
             AS icc_rho_estimate
    FROM chi
    """,
    tags=("stats", "estimation", "agg"),
)
def q_beta_binomial_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial overdispersion of per-nation return rates:
    the χ²/(g−1) dispersion ratio against the binomial null (=1
    if one global rate explains every nation) and the implied
    intra-class correlation ρ̂ = (ratio−1)/(n̄−1) — the quantity
    that shrinks effective sample size in clustered experiments
    (kish_design_effect's deff = 1+(n̄−1)ρ is built from exactly
    this ρ) and the dial empirical-Bayes smoothing
    (bayes_smoothed_rate) implicitly sets. One group aggregate,
    one 25-row reduction."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    outcome = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ret")
    )
    grp = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(outcome, o["o_orderkey"] == outcome["l_orderkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum("ret").cast("double").alias("k"),
        )
    )
    pooled = grp.agg(
        (F.sum("k") / F.sum("n")).alias("p"),
        F.count("*").cast("double").alias("g"),
    )
    chi = grp.crossJoin(F.broadcast(pooled)).groupBy("p", "g").agg(
        F.sum(
            F.pow(F.col("k") - F.col("n") * F.col("p"), 2)
            / (F.col("n") * F.col("p") * (1 - F.col("p")))
        ).alias("x2"),
        F.avg("n").alias("nbar"),
    )
    ratio = F.col("x2") / (F.col("g") - 1)
    return chi.select(
        F.col("g").cast("bigint").alias("n_groups"),
        F.round("p", 5).alias("pooled_rate"),
        F.round(ratio, 4).alias("dispersion_ratio"),
        F.round(
            F.greatest((ratio - 1) / (F.col("nbar") - 1), F.lit(0.0)), 6
        ).alias("icc_rho_estimate"),
    )


@register(
    "simpsons_paradox_screen",
    oracle="""
    WITH obs AS (
      SELECT p_brand, l_discount AS x, CAST(l_quantity AS DOUBLE) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    pooled AS (SELECT regr_slope(y, x) AS b_pool FROM obs),
    per_grp AS (
      SELECT p_brand, regr_slope(y, x) AS b, CAST(count(*) AS BIGINT) AS n
      FROM obs GROUP BY p_brand HAVING count(*) >= 30),
    screen AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(CASE WHEN sign(b) <> sign(b_pool)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_sign_flips,
             avg(b) AS mean_within_slope,
             any_value(b_pool) AS b_pool
      FROM per_grp, pooled GROUP BY b_pool)
    SELECT n_groups, n_sign_flips,
           round(b_pool, 6) AS pooled_slope,
           round(mean_within_slope, 6) AS mean_within_slope,
           sign(b_pool) <> sign(mean_within_slope) AS aggregate_paradox
    FROM screen
    """,
    tags=("stats", "causal", "audit"),
)
def q_simpsons_paradox_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the pooled discount→quantity slope
    against every brand's within-slope — counting groups whose
    relationship has the OPPOSITE sign from the aggregate, plus the
    aggregate_paradox flag for the full reversal where pooled and
    mean-within disagree entirely (the confounding structure that
    makes dashboard-level correlations actively misleading;
    fixed_effects_within REMOVES the bias, this query DETECTS where
    it lurks). One grouped regr_slope pass with a min-n floor so
    sign estimates aren't noise; the screen is the cheap nightly
    job that decides which drill-downs need a causal follow-up."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    obs = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        F.col("l_discount").alias("x"),
        F.col("l_quantity").cast("double").alias("y"),
    )
    pooled = obs.agg(F.expr("regr_slope(y, x)").alias("b_pool"))
    per_grp = (
        obs.groupBy("p_brand")
        .agg(
            F.expr("regr_slope(y, x)").alias("b"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 30)
    )
    screen = per_grp.crossJoin(F.broadcast(pooled)).groupBy("b_pool").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(
            F.when(F.signum("b") != F.signum("b_pool"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_sign_flips"),
        F.avg("b").alias("mean_within_slope"),
    )
    return screen.select(
        "n_groups",
        "n_sign_flips",
        F.round("b_pool", 6).alias("pooled_slope"),
        F.round("mean_within_slope", 6).alias("mean_within_slope"),
        (F.signum("b_pool") != F.signum("mean_within_slope")).alias(
            "aggregate_paradox"
        ),
    )


@register(
    "psi_feature_panel",
    oracle="""
    WITH base AS (
      SELECT year(CAST(o_orderdate AS DATE)) AS yr,
             o_totalprice,
             CAST(substr(o_orderpriority, 1, 1) AS INT) AS pri,
             dayofweek(CAST(o_orderdate AS DATE)) AS dow,
             month(CAST(o_orderdate AS DATE)) AS mo
      FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
    stacked AS (
      SELECT yr, 'totalprice_band' AS feature,
             least(CAST(floor(o_totalprice / 50000) AS INT), 9) AS bin FROM base
      UNION ALL SELECT yr, 'priority', pri FROM base
      UNION ALL SELECT yr, 'weekday', dow FROM base
      UNION ALL SELECT yr, 'month', mo FROM base),
    hist AS (
      SELECT feature, bin,
             CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS DOUBLE) AS cr,
             CAST(sum(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS DOUBLE) AS cc
      FROM stacked GROUP BY 1, 2),
    tot AS (
      SELECT feature, sum(cr) AS nr, sum(cc) AS nc,
             CAST(count(*) AS DOUBLE) AS b
      FROM hist GROUP BY feature),
    psi AS (
      SELECT h.feature, CAST(t.b AS BIGINT) AS n_bins,
             sum(((cc + 0.5) / (nc + 0.5 * b) - (cr + 0.5) / (nr + 0.5 * b))
                 * ln(((cc + 0.5) / (nc + 0.5 * b))
                      / ((cr + 0.5) / (nr + 0.5 * b)))) AS psi
      FROM hist h JOIN tot t ON h.feature = t.feature
      GROUP BY h.feature, t.b)
    SELECT feature, n_bins, round(psi, 5) AS psi,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi < 0.25 THEN 'moderate' ELSE 'shifted' END AS verdict
    FROM psi
    """,
    tags=("drift", "ml", "audit"),
)
def q_psi_feature_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability panel for FOUR features in ONE scan:
    1996 vs 1997 PSI per feature (price band, priority, weekday,
    month) with Laplace-smoothed bins and the standard
    0.1/0.25 triage verdicts — the model-monitoring sweep that
    production scoring runs nightly over every input column
    (psi_drift does one feature; the panel shape is what actually
    ships). The features are stacked into (feature, bin, period)
    rows BEFORE the histogram aggregate, so N features cost one
    fact pass + one shuffle keyed on (feature, bin) — adding a
    feature adds zero scans."""
    o = _t(spark, sf_dir, "orders").filter(
        F.year(F.col("o_orderdate").cast("date")).isin(1996, 1997)
    )
    base = o.select(
        F.year(F.col("o_orderdate").cast("date")).alias("yr"),
        F.least(F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)).alias(
            "totalprice_band"
        ),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("priority"),
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("weekday"),
        F.month(F.col("o_orderdate").cast("date")).alias("month"),
    )
    stacked = None
    for feat in ("totalprice_band", "priority", "weekday", "month"):
        piece = base.select(
            "yr", F.lit(feat).alias("feature"), F.col(feat).alias("bin")
        )
        stacked = piece if stacked is None else stacked.unionAll(piece)
    hist = stacked.groupBy("feature", "bin").agg(
        F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0))
        .cast("double")
        .alias("cr"),
        F.sum(F.when(F.col("yr") == 1997, 1).otherwise(0))
        .cast("double")
        .alias("cc"),
    )
    tot = hist.groupBy("feature").agg(
        F.sum("cr").alias("nr"),
        F.sum("cc").alias("nc"),
        F.count("*").cast("double").alias("b"),
    )
    pr = (F.col("cr") + 0.5) / (F.col("nr") + 0.5 * F.col("b"))
    pc = (F.col("cc") + 0.5) / (F.col("nc") + 0.5 * F.col("b"))
    psi = (
        hist.join(F.broadcast(tot), "feature")
        .groupBy("feature", "b")
        .agg(F.sum((pc - pr) * F.log(pc / pr)).alias("psi"))
    )
    return psi.select(
        "feature",
        F.col("b").cast("bigint").alias("n_bins"),
        F.round("psi", 5).alias("psi"),
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("shifted")
        .alias("verdict"),
    )


@register(
    "rbo_rank_similarity",
    oracle="""
    WITH met AS (
      SELECT n_name, sum(o_totalprice) AS rev,
             CAST(count(*) AS DOUBLE) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1),
    ranked AS (
      SELECT n_name,
             row_number() OVER (ORDER BY rev DESC, n_name) AS ra,
             row_number() OVER (ORDER BY n_orders DESC, n_name) AS rb
      FROM met),
    depths AS (SELECT unnest(generate_series(1, 10)) AS d),
    ovl AS (
      SELECT d, CAST(sum(CASE WHEN ra <= d AND rb <= d THEN 1 ELSE 0 END)
                     AS DOUBLE) AS a_d
      FROM ranked CROSS JOIN depths GROUP BY d)
    SELECT round((1 - 0.9) * sum(pow(0.9, d - 1) * a_d / d), 4)
             AS rbo_at_10,
           CAST(max(CASE WHEN d = 5 THEN a_d END) AS BIGINT) AS overlap_at_5,
           CAST(max(CASE WHEN d = 10 THEN a_d END) AS BIGINT)
             AS overlap_at_10
    FROM ovl
    """,
    tags=("ranking", "eval", "agreement"),
)
def q_rbo_rank_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between the
    revenue-ranking and order-count-ranking of nations: top-weighted
    agreement (1−p)Σp^{d−1}·|A_d∩B_d|/d with p=0.9, truncated at
    depth 10 — the rank-similarity measure built for INDEFINITE
    rankings where Kendall/Spearman (spearman_rank_corr) wrongly
    weight position 500 as much as position 1 (search, recsys, and
    top-k dashboards care almost only about the head). Prefix
    overlaps at every depth come from one cross join with the tiny
    depth relation — no per-depth re-rank."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    met = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum("o_totalprice").alias("rev"),
            F.count("*").cast("double").alias("n_orders"),
        )
    )
    ranked = met.select(
        "n_name",
        F.row_number().over(Window.orderBy(F.desc("rev"), "n_name")).alias("ra"),
        F.row_number()
        .over(Window.orderBy(F.desc("n_orders"), "n_name"))
        .alias("rb"),
    )
    depths = spark.range(1, 11).select(F.col("id").cast("int").alias("d"))
    overlaps = (
        ranked.crossJoin(F.broadcast(depths))
        .groupBy("d")
        .agg(
            F.sum(
                F.when((F.col("ra") <= F.col("d")) & (F.col("rb") <= F.col("d")), 1)
                .otherwise(0)
            )
            .cast("double")
            .alias("a_d")
        )
    )
    return overlaps.agg(
        F.round(
            (1 - 0.9)
            * F.sum(F.pow(F.lit(0.9), F.col("d") - 1) * F.col("a_d") / F.col("d")),
            4,
        ).alias("rbo_at_10"),
        F.max(F.when(F.col("d") == 5, F.col("a_d")))
        .cast("bigint")
        .alias("overlap_at_5"),
        F.max(F.when(F.col("d") == 10, F.col("a_d")))
        .cast("bigint")
        .alias("overlap_at_10"),
    )


@register(
    "logrank_test",
    oracle="""
    WITH horizon AS (SELECT max(CAST(ts AS DATE)) AS h,
                            min(CAST(ts AS DATE)) AS t0 FROM events),
    users AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::UBIGINT % 2
               AS arm,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS ev
      FROM events GROUP BY user_id),
    t AS (
      SELECT arm,
             CASE WHEN ev IS NULL
                  THEN date_diff('day', t0, h) + 1
                  ELSE date_diff('day', t0, ev) END AS tt,
             CASE WHEN ev IS NULL THEN 0 ELSE 1 END AS died
      FROM users, horizon),
    arms AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na0,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS na1
      FROM t),
    evt AS (
      SELECT tt,
             CAST(sum(CASE WHEN arm = 0 AND died = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS d0,
             CAST(sum(CASE WHEN arm = 1 AND died = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS d1
      FROM t WHERE died = 1 GROUP BY tt),
    risk AS (
      SELECT tt, d0, d1,
             na0 - coalesce(sum(d0) OVER (ORDER BY tt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0,
             na1 - coalesce(sum(d1) OVER (ORDER BY tt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
      FROM evt, arms),
    lr AS (
      SELECT sum(d1) AS o1,
             sum((d0 + d1) * n1 / (n0 + n1)) AS e1,
             sum((d0 + d1) * (n0 * n1) / pow(n0 + n1, 2)
                 * (n0 + n1 - d0 - d1) / nullif(n0 + n1 - 1, 0)) AS v
      FROM risk)
    SELECT CAST(o1 AS BIGINT) AS observed_arm1,
           round(e1, 2) AS expected_arm1,
           round((o1 - e1) / sqrt(v), 4) AS logrank_z
    FROM lr
    """,
    tags=("survival", "stats", "window"),
)
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between two hash-assigned arms on
    time-to-first-purchase with right-censoring at the feed horizon:
    at every event time the at-risk sets shrink by prior events
    (suffix counts via a 1-preceding prefix window — censoring all
    lands at the horizon, AFTER every event, so the risk sets need
    no censor adjustment mid-stream), and Z = (O−E)/√V accumulates
    the hypergeometric moments per risk table — the survival-curve
    comparison kaplan_meier_conversion draws but cannot TEST. All
    risk-set algebra runs on the |distinct event times| relation;
    the fact table contributes one per-user min."""
    e = _t(spark, sf_dir, "events")
    horizon = e.agg(
        F.max(F.to_date("ts")).alias("h"), F.min(F.to_date("ts")).alias("t0")
    )
    users = e.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("ev")
    ).select(CUR.hash_bucket(F.col("user_id"), 2).alias("arm"), "ev")
    t = users.crossJoin(F.broadcast(horizon)).select(
        "arm",
        F.when(
            F.col("ev").isNull(), F.datediff(F.col("h"), F.col("t0")) + 1
        )
        .otherwise(F.datediff(F.col("ev"), F.col("t0")))
        .alias("tt"),
        F.when(F.col("ev").isNull(), 0).otherwise(1).alias("died"),
    )
    arms = t.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("double")
        .alias("na0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("double")
        .alias("na1"),
    )
    evt = (
        t.filter(F.col("died") == 1)
        .groupBy("tt")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("double")
            .alias("d0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("double")
            .alias("d1"),
        )
    )
    wprev = Window.orderBy("tt").rowsBetween(Window.unboundedPreceding, -1)
    risk = evt.crossJoin(F.broadcast(arms)).select(
        "tt",
        "d0",
        "d1",
        (
            F.col("na0") - F.coalesce(F.sum("d0").over(wprev), F.lit(0.0))
        ).alias("n0"),
        (
            F.col("na1") - F.coalesce(F.sum("d1").over(wprev), F.lit(0.0))
        ).alias("n1"),
    )
    nn = F.col("n0") + F.col("n1")
    dd = F.col("d0") + F.col("d1")
    lr = risk.agg(
        F.sum("d1").alias("o1"),
        F.sum(dd * F.col("n1") / nn).alias("e1"),
        F.sum(
            dd
            * (F.col("n0") * F.col("n1"))
            / F.pow(nn, 2)
            * (nn - dd)
            / F.nullif(nn - 1, F.lit(0.0))
        ).alias("v"),
    )
    return lr.select(
        F.col("o1").cast("bigint").alias("observed_arm1"),
        F.round("e1", 2).alias("expected_arm1"),
        F.round((F.col("o1") - F.col("e1")) / F.sqrt("v"), 4).alias("logrank_z"),
    )


@register(
    "hash_avalanche_audit",
    oracle="""
    WITH h AS (
      SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               ::UBIGINT % 65536 AS hv
      FROM orders),
    bits AS (
      SELECT i, j,
             corr(CAST((hv // CAST(pow(2, i) AS BIGINT)) % 2 AS DOUBLE),
                  CAST((hv // CAST(pow(2, j) AS BIGINT)) % 2 AS DOUBLE)) AS c,
             avg(CAST((hv // CAST(pow(2, i) AS BIGINT)) % 2 AS DOUBLE)) AS bi
      FROM h,
           (SELECT unnest(generate_series(0, 15)) AS i),
           (SELECT unnest(generate_series(0, 15)) AS j)
      WHERE i < j GROUP BY i, j)
    SELECT CAST(count(*) AS BIGINT) AS n_bit_pairs,
           round(max(abs(c)), 4) AS max_abs_corr,
           round(avg(abs(c)), 5) AS mean_abs_corr,
           round(max(abs(bi - 0.5)), 4) AS max_bit_bias
    FROM bits
    """,
    tags=("hash", "audit", "randomness"),
)
def q_hash_avalanche_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avalanche audit of the engine's md5-derived hash bits: all
    120 pairwise correlations between the 16 low bits across keys,
    plus per-bit bias from ½ — the independence property every
    md5 device in this catalog (splits, sampling, salting, Bloom/
    CMS, bootstrap draws) silently assumes, here MEASURED (max
    |corr| should sit at the ~1/√n sampling-noise floor; a real
    correlation would mean correlated Bloom bits, biased splits,
    and broken variance formulas everywhere). The 16×16 bit grid
    rides one cross join over the hashed relation — one scan, one
    shuffle on the 120-pair key."""
    o = _t(spark, sf_dir, "orders")
    h = o.select(
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 65536
        ).alias("hv")
    )
    iv = spark.range(0, 16).select(F.col("id").cast("int").alias("i"))
    jv = spark.range(0, 16).select(F.col("id").cast("int").alias("j"))
    grid = (
        h.crossJoin(F.broadcast(iv))
        .crossJoin(F.broadcast(jv))
        .filter(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.expr("CAST(shiftright(hv, i) & 1 AS DOUBLE)").alias("bi"),
            F.expr("CAST(shiftright(hv, j) & 1 AS DOUBLE)").alias("bj"),
        )
    )
    bits = grid.groupBy("i", "j").agg(
        F.corr("bi", "bj").alias("c"), F.avg("bi").alias("bavg")
    )
    return bits.agg(
        F.count("*").cast("bigint").alias("n_bit_pairs"),
        F.round(F.max(F.abs(F.col("c"))), 4).alias("max_abs_corr"),
        F.round(F.avg(F.abs(F.col("c"))), 5).alias("mean_abs_corr"),
        F.round(F.max(F.abs(F.col("bavg") - 0.5)), 4).alias("max_bit_bias"),
    )


@register(
    "obrien_fleming_peeks",
    oracle="""
    WITH obs AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
                  ::UBIGINT % 2 AS INT) AS arm,
             o_totalprice AS y
      FROM orders),
    bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM obs),
    looks AS (
      SELECT k, d0 + CAST(floor(date_diff('day', d0, d1) * k / 5.0) AS INT)
               AS cutoff
      FROM bounds, (SELECT unnest(generate_series(1, 5)) AS k)),
    cum AS (
      SELECT k,
             avg(CASE WHEN arm = 1 THEN y END)
               - avg(CASE WHEN arm = 0 THEN y END) AS diff,
             var_samp(CASE WHEN arm = 1 THEN y END) AS v1,
             var_samp(CASE WHEN arm = 0 THEN y END) AS v0,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0
      FROM obs JOIN looks ON d <= cutoff GROUP BY k),
    z AS (
      SELECT k, n0 + n1 AS n_seen,
             diff / sqrt(v1 / n1 + v0 / n0) AS zstat,
             1.96 * sqrt(5.0 / k) AS obf_boundary
      FROM cum)
    SELECT CAST(k AS BIGINT) AS look,
           CAST(n_seen AS BIGINT) AS n_orders_seen,
           round(zstat, 4) AS z_statistic,
           round(obf_boundary, 4) AS obf_boundary,
           abs(zstat) > obf_boundary AS stop_here
    FROM z
    """,
    tags=("experimentation", "stats", "sequence"),
)
def q_obrien_fleming_peeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming group-sequential monitoring: five equally-
    spaced interim looks at a hash-split A/B on order value, each
    compared against the OBF boundary z·√(K/k) — brutally strict
    early (≈4.38σ at look 1) and ≈nominal at the end, which is how
    clinical trials and mature experiment platforms buy legal
    peeking without SPRT's indefinite horizon
    (sprt_boundary_crossing is the open-ended cousin; this one has
    a fixed end date). Every look is the SAME scan joined against
    the cutoff relation — five cumulative Welch z's from one
    conditional-aggregate pass, no per-look re-query."""
    o = _t(spark, sf_dir, "orders")
    obs = o.select(
        F.col("o_orderdate").cast("date").alias("d"),
        CUR.hash_bucket(F.col("o_custkey"), 2).alias("arm"),
        F.col("o_totalprice").alias("y"),
    )
    bounds = obs.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    ks = spark.range(1, 6).select(F.col("id").cast("int").alias("k"))
    looks = bounds.crossJoin(F.broadcast(ks)).select(
        "k",
        F.date_add(
            F.col("d0"),
            F.floor(F.datediff(F.col("d1"), F.col("d0")) * F.col("k") / 5.0).cast(
                "int"
            ),
        ).alias("cutoff"),
    )
    cum = (
        obs.join(F.broadcast(looks), obs["d"] <= F.col("cutoff"))
        .groupBy("k")
        .agg(
            (
                F.avg(F.when(F.col("arm") == 1, F.col("y")))
                - F.avg(F.when(F.col("arm") == 0, F.col("y")))
            ).alias("diff"),
            F.var_samp(F.when(F.col("arm") == 1, F.col("y"))).alias("v1"),
            F.var_samp(F.when(F.col("arm") == 0, F.col("y"))).alias("v0"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("double")
            .alias("n1"),
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("double")
            .alias("n0"),
        )
    )
    zstat = F.col("diff") / F.sqrt(F.col("v1") / F.col("n1") + F.col("v0") / F.col("n0"))
    bnd = 1.96 * F.sqrt(5.0 / F.col("k"))
    return cum.select(
        F.col("k").cast("bigint").alias("look"),
        (F.col("n0") + F.col("n1")).cast("bigint").alias("n_orders_seen"),
        F.round(zstat, 4).alias("z_statistic"),
        F.round(bnd, 4).alias("obf_boundary"),
        (F.abs(zstat) > bnd).alias("stop_here"),
    )


@register(
    "effect_size_family",
    oracle="""
    WITH obs AS (
      SELECT CASE WHEN dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6)
                  THEN 1 ELSE 0 END AS g,
             o_totalprice AS y, o_orderkey
      FROM orders),
    mom AS (
      SELECT avg(CASE WHEN g = 1 THEN y END) AS m1,
             avg(CASE WHEN g = 0 THEN y END) AS m0,
             var_samp(CASE WHEN g = 1 THEN y END) AS v1,
             var_samp(CASE WHEN g = 0 THEN y END) AS v0,
             CAST(sum(g) AS DOUBLE) AS n1,
             CAST(sum(1 - g) AS DOUBLE) AS n0
      FROM obs),
    ranked AS (
      SELECT g, CAST(row_number() OVER (ORDER BY y, o_orderkey) AS DOUBLE)
               AS rk
      FROM obs),
    u AS (
      SELECT sum(CASE WHEN g = 1 THEN rk ELSE 0 END) AS r1 FROM ranked),
    eff AS (
      SELECT (m1 - m0)
               / sqrt(((n1 - 1) * v1 + (n0 - 1) * v0) / (n1 + n0 - 2)) AS d,
             n1, n0, r1
      FROM mom, u)
    SELECT round(d, 5) AS cohens_d,
           round(d * (1 - 3 / (4 * (n1 + n0) - 9)), 5) AS hedges_g,
           round(2 * (r1 - n1 * (n1 + 1) / 2) / (n1 * n0) - 1, 5)
             AS cliffs_delta
    FROM eff
    """,
    tags=("stats", "experimentation", "eval"),
)
def q_effect_size_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The effect-size triple for the weekend contrast: Cohen's d
    (pooled-SD standardized difference), Hedges' g (the small-
    sample bias correction d·(1−3/(4N−9)) every meta-analysis
    requires), and Cliff's δ = 2·U/(n₁n₀)−1 (the ordinal,
    outlier-immune P(X>Y)−P(X<Y), derived from the same rank sum
    as auc_rank_sum: δ = 2·AUC−1) — the numbers that say HOW BIG,
    which the entire p-value tier deliberately does not
    (significance at scale is guaranteed; effect size is the
    decision input). Moments from one conditional aggregate, the
    rank sum from one ordering — and the docstring convention
    stands: at fact scale the global rank uses the two-pass
    range-partition prefix sum, not a single-task sort."""
    o = _t(spark, sf_dir, "orders")
    obs = o.select(
        F.when(
            F.dayofweek(F.col("o_orderdate").cast("date")).isin(1, 7), 1
        )
        .otherwise(0)
        .alias("g"),
        F.col("o_totalprice").alias("y"),
        "o_orderkey",
    )
    mom = obs.agg(
        F.avg(F.when(F.col("g") == 1, F.col("y"))).alias("m1"),
        F.avg(F.when(F.col("g") == 0, F.col("y"))).alias("m0"),
        F.var_samp(F.when(F.col("g") == 1, F.col("y"))).alias("v1"),
        F.var_samp(F.when(F.col("g") == 0, F.col("y"))).alias("v0"),
        F.sum("g").cast("double").alias("n1"),
        F.sum(1 - F.col("g")).cast("double").alias("n0"),
    )
    ranked = obs.select(
        "g",
        F.row_number().over(Window.orderBy("y", "o_orderkey")).cast("double").alias("rk"),
    )
    u = ranked.agg(
        F.sum(F.when(F.col("g") == 1, F.col("rk")).otherwise(0.0)).alias("r1")
    )
    d = (F.col("m1") - F.col("m0")) / F.sqrt(
        ((F.col("n1") - 1) * F.col("v1") + (F.col("n0") - 1) * F.col("v0"))
        / (F.col("n1") + F.col("n0") - 2)
    )
    return mom.crossJoin(F.broadcast(u)).select(
        F.round(d, 5).alias("cohens_d"),
        F.round(d * (1 - 3 / (4 * (F.col("n1") + F.col("n0")) - 9)), 5).alias(
            "hedges_g"
        ),
        F.round(
            2
            * (F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2)
            / (F.col("n1") * F.col("n0"))
            - 1,
            5,
        ).alias("cliffs_delta"),
    )


@register(
    "tukey_hsd_years",
    oracle="""
    WITH obs AS (
      SELECT year(CAST(o_orderdate AS DATE)) AS yr, o_totalprice AS y
      FROM orders
      WHERE year(CAST(o_orderdate AS DATE)) BETWEEN 1995 AND 1999),
    grp AS (
      SELECT yr, avg(y) AS m, var_samp(y) AS v,
             CAST(count(*) AS DOUBLE) AS n
      FROM obs GROUP BY yr),
    mse AS (
      SELECT sum((n - 1) * v) / sum(n - 1) AS mse FROM grp),
    pairs AS (
      SELECT a.yr AS yr1, b.yr AS yr2,
             abs(a.m - b.m) AS diff,
             3.858 * sqrt(mse / 2 * (1 / a.n + 1 / b.n)) AS hsd
      FROM grp a JOIN grp b ON a.yr < b.yr, mse)
    SELECT CAST(yr1 AS BIGINT) AS yr1, CAST(yr2 AS BIGINT) AS yr2,
           round(diff, 2) AS mean_diff,
           round(hsd, 2) AS hsd_threshold,
           diff > hsd AS significant
    FROM pairs ORDER BY yr1, yr2
    """,
    tags=("stats", "experimentation", "rank"),
)
def q_tukey_hsd_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc on the five-year mean order values: every
    pairwise difference against the honestly-significant-difference
    threshold q·√(MSE/2·(1/nᵢ+1/nⱼ)) with the studentized-range
    q(0.95, k=5, ∞)=3.858 — the multiple-comparison control that
    running ten Welch t-tests at α=0.05 silently lacks (family-wise
    error ≈40% uncorrected; cf. benjamini_hochberg_fdr for the FDR
    alternative when k is large). Pooled MSE from one grouped
    moment pass; the pair matrix is a 10-row self-join of the
    5-row group relation."""
    o = _t(spark, sf_dir, "orders").filter(
        F.year(F.col("o_orderdate").cast("date")).between(1995, 1999)
    )
    grp = o.groupBy(
        F.year(F.col("o_orderdate").cast("date")).alias("yr")
    ).agg(
        F.avg("o_totalprice").alias("m"),
        F.var_samp("o_totalprice").alias("v"),
        F.count("*").cast("double").alias("n"),
    )
    mse = grp.agg(
        (F.sum((F.col("n") - 1) * F.col("v")) / F.sum(F.col("n") - 1)).alias("mse")
    )
    a = grp.select(
        F.col("yr").alias("yr1"), F.col("m").alias("m1"), F.col("n").alias("n1")
    )
    b = grp.select(
        F.col("yr").alias("yr2"), F.col("m").alias("m2"), F.col("n").alias("n2")
    )
    hsd = 3.858 * F.sqrt(F.col("mse") / 2 * (1 / F.col("n1") + 1 / F.col("n2")))
    diff = F.abs(F.col("m1") - F.col("m2"))
    return (
        a.join(b, F.col("yr1") < F.col("yr2"))
        .crossJoin(F.broadcast(mse))
        .select(
            F.col("yr1").cast("bigint").alias("yr1"),
            F.col("yr2").cast("bigint").alias("yr2"),
            F.round(diff, 2).alias("mean_diff"),
            F.round(hsd, 2).alias("hsd_threshold"),
            (diff > hsd).alias("significant"),
        )
        .orderBy("yr1", "yr2")
    )


@register(
    "business_days_lag",
    oracle="""
    WITH lags AS (
      SELECT o_orderpriority,
             CAST(o_orderdate AS DATE) AS d0,
             CAST(l_shipdate AS DATE) AS d1
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)),
    biz AS (
      SELECT o_orderpriority,
             (5 * (date_diff('day', DATE '1990-01-01', d1) // 7)
              + least(date_diff('day', DATE '1990-01-01', d1) % 7 + 1, 5))
             - (5 * (date_diff('day', DATE '1990-01-01', d0) // 7)
              + least(date_diff('day', DATE '1990-01-01', d0) % 7 + 1, 5))
               AS bd
      FROM lags)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           round(avg(bd), 3) AS mean_business_days,
           round(CAST(quantile_cont(bd, 0.9) AS DOUBLE), 1)
             AS p90_business_days
    FROM biz GROUP BY o_orderpriority
    """,
    tags=("date", "sre", "agg"),
)
def q_business_days_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag in BUSINESS days, computed in closed form as
    a difference of weekday PREFIX counts from a fixed Monday epoch
    (W(d) = 5⌊k/7⌋ + min(k mod 7 + 1, 5)) — no calendar dimension
    table, no generate_series explosion per row (the join-a-
    calendar formulation multiplies the fact table by the average
    lag; this is one codegen expression per row, validated against
    a brute-force day walk). The prefix-function trick generalizes:
    any periodic calendar predicate becomes a closed-form count.
    SLA reporting per priority with the p90 that ops actually
    alerts on."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lags = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("d0"),
            F.col("l_shipdate").cast("date").alias("d1"),
        )
        .filter(F.col("d1") >= F.col("d0"))
    )
    # Weekday prefix count from a Monday epoch (1990-01-01):
    # W(d) = 5*floor(k/7) + min(k%7 + 1, 5) with k = days since epoch;
    # business days in (d0, d1] = W(d1) - W(d0). Validated cell-by-cell
    # against a brute-force day walk over 294 date pairs.
    epoch = F.lit("1990-01-01").cast("date")

    def wdays(col):
        k = F.datediff(col, epoch)
        return 5 * F.floor(k / 7).cast("long") + F.least(
            k % 7 + 1, F.lit(5)
        )

    bd = wdays(F.col("d1")) - wdays(F.col("d0"))
    biz = lags.select("o_orderpriority", bd.alias("bd"))
    return biz.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_lineitems"),
        F.round(F.avg("bd"), 3).alias("mean_business_days"),
        F.round(F.expr("percentile(bd, 0.9)"), 1).alias("p90_business_days"),
    )


@register(
    "embedding_isotropy",
    oracle="""
    WITH dims AS (
      SELECT vec_id, CAST(i AS INT) AS pos,
             embedding[CAST(i AS INT)]::DOUBLE AS v
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)),
    mu AS (SELECT pos, avg(v) AS m FROM dims GROUP BY pos),
    cent AS (
      SELECT vec_id, pos, v, v - m AS vc
      FROM dims JOIN mu USING (pos)),
    norms AS (
      SELECT vec_id, sqrt(sum(v * v)) AS nr, sqrt(sum(vc * vc)) AS nc
      FROM cent GROUP BY vec_id),
    pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 250),
    dots AS (
      SELECT p.i, p.j,
             sum(ca.v * cb.v) AS dr, sum(ca.vc * cb.vc) AS dc
      FROM pairs p JOIN cent ca ON ca.vec_id = p.i
      JOIN cent cb ON cb.vec_id = p.j AND ca.pos = cb.pos
      GROUP BY p.i, p.j),
    cs AS (
      SELECT d.dr / (na.nr * nb.nr) AS cos_raw,
             d.dc / (na.nc * nb.nc) AS cos_cent
      FROM dots d JOIN norms na ON na.vec_id = d.i
      JOIN norms nb ON nb.vec_id = d.j)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(cos_raw), 4) AS mean_cosine_raw,
           round(avg(cos_cent), 4) AS mean_cosine_centered,
           round(avg(cos_raw) - avg(cos_cent), 4) AS anisotropy_gap
    FROM cs
    """,
    tags=("embeddings", "ml", "audit"),
)
def q_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit (Ethayarajh): mean cosine between
    disjoint vector pairs, RAW vs after mean-centering — a large
    raw mean cosine means every vector shares a dominant common
    direction, so cosine similarity degenerates (everything looks
    similar to everything, the failure mode that silently breaks
    ann_bruteforce_topk's rankings) and the drop after centering
    measures exactly how much of the geometry was that artifact.
    Centering is a 64-row broadcast subtract; the pair dots reuse
    the exploded-dims join shape on 250 disjoint pairs."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("v"))
    mu = dims.groupBy("pos").agg(F.avg("v").alias("m"))
    cent = dims.join(F.broadcast(mu), "pos").select(
        "vec_id", "pos", "v", (F.col("v") - F.col("m")).alias("vc")
    )
    norms = cent.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nr"),
        F.sqrt(F.sum(F.col("vc") * F.col("vc"))).alias("nc"),
    )
    pairs = e.select(F.col("vec_id").alias("i")).join(
        e.select((F.col("vec_id") - 250).alias("i"), F.col("vec_id").alias("j")),
        "i",
    )
    ca = cent.select(F.col("vec_id").alias("i"), "pos", F.col("v").alias("va"), F.col("vc").alias("vca"))
    cb = cent.select(F.col("vec_id").alias("j"), "pos", F.col("v").alias("vb"), F.col("vc").alias("vcb"))
    dots = (
        pairs.join(ca, "i")
        .join(cb, ["j", "pos"])
        .groupBy("i", "j")
        .agg(
            F.sum(F.col("va") * F.col("vb")).alias("dr"),
            F.sum(F.col("vca") * F.col("vcb")).alias("dc"),
        )
    )
    na = norms.select(F.col("vec_id").alias("i"), F.col("nr").alias("nra"), F.col("nc").alias("nca"))
    nb = norms.select(F.col("vec_id").alias("j"), F.col("nr").alias("nrb"), F.col("nc").alias("ncb"))
    cs = (
        dots.join(na, "i")
        .join(nb, "j")
        .select(
            (F.col("dr") / (F.col("nra") * F.col("nrb"))).alias("cos_raw"),
            (F.col("dc") / (F.col("nca") * F.col("ncb"))).alias("cos_cent"),
        )
    )
    return cs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.avg("cos_raw"), 4).alias("mean_cosine_raw"),
        F.round(F.avg("cos_cent"), 4).alias("mean_cosine_centered"),
        F.round(F.avg("cos_raw") - F.avg("cos_cent"), 4).alias("anisotropy_gap"),
    )


@register(
    "mcnemar_filters",
    oracle="""
    WITH scored AS (
      SELECT n_chars,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)
               AS words
      FROM documents),
    med AS (
      SELECT CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS mc,
             CAST(quantile_cont(words, 0.5) AS DOUBLE) AS mw
      FROM scored),
    rated AS (
      SELECT CASE WHEN n_chars > mc THEN 1 ELSE 0 END AS ra,
             CASE WHEN words > mw THEN 1 ELSE 0 END AS rb
      FROM scored, med),
    cells AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS b,
             CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
                  AS DOUBLE) AS c
      FROM rated)
    SELECT n AS n_docs, CAST(b AS BIGINT) AS only_filter_a,
           CAST(c AS BIGINT) AS only_filter_b,
           round(pow(abs(b - c) - 1, 2) / nullif(b + c, 0), 4)
             AS mcnemar_chi2,
           pow(abs(b - c) - 1, 2) / nullif(b + c, 0) > 3.841
             AS filters_differ_5pct
    FROM cells
    """,
    tags=("stats", "agreement", "quality"),
)
def q_mcnemar_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the same two quality filters Cohen's κ
    compares (cohens_kappa_filters): κ asks whether they AGREE;
    McNemar asks whether they disagree ASYMMETRICALLY — only the
    discordant cells enter (|b−c|−1)²/(b+c), so a filter that
    passes strictly more documents than the other is caught even
    when agreement is high. This is the paired test for comparing
    two classifiers on the same examples (the unpaired chi-square
    would wrongly treat the corpora as independent); continuity-
    corrected, one conditional aggregate."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "n_chars", TXT.token_count(F.col("text")).cast("double").alias("words")
    )
    med = scored.agg(
        F.expr("percentile(n_chars, 0.5)").alias("mc"),
        F.expr("percentile(words, 0.5)").alias("mw"),
    )
    rated = scored.crossJoin(F.broadcast(med)).select(
        F.when(F.col("n_chars") > F.col("mc"), 1).otherwise(0).alias("ra"),
        F.when(F.col("words") > F.col("mw"), 1).otherwise(0).alias("rb"),
    )
    cells = rated.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when((F.col("ra") == 1) & (F.col("rb") == 0), 1).otherwise(0))
        .cast("double")
        .alias("b"),
        F.sum(F.when((F.col("ra") == 0) & (F.col("rb") == 1), 1).otherwise(0))
        .cast("double")
        .alias("c"),
    )
    chi2 = F.pow(F.abs(F.col("b") - F.col("c")) - 1, 2) / F.nullif(
        F.col("b") + F.col("c"), F.lit(0.0)
    )
    return cells.select(
        F.col("n").alias("n_docs"),
        F.col("b").cast("bigint").alias("only_filter_a"),
        F.col("c").cast("bigint").alias("only_filter_b"),
        F.round(chi2, 4).alias("mcnemar_chi2"),
        (chi2 > 3.841).alias("filters_differ_5pct"),
    )


@register(
    "dbscan_core_cells",
    oracle="""
    WITH pts AS (
      SELECT embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
      FROM embeddings),
    cells AS (
      SELECT CAST(floor(x / 0.5) AS BIGINT) AS cx,
             CAST(floor(y / 0.5) AS BIGINT) AS cy,
             CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
    offsets AS (
      SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx),
                        (SELECT unnest([-1, 0, 1]) AS dy)),
    nbr AS (
      SELECT c.cx, c.cy, any_value(c.n) AS own,
             sum(o.n) AS hood
      FROM cells c CROSS JOIN offsets
      JOIN cells o ON o.cx = c.cx + dx AND o.cy = c.cy + dy
      GROUP BY c.cx, c.cy),
    core AS (SELECT cx, cy, own FROM nbr WHERE hood >= 12),
    border AS (
      SELECT DISTINCT n.cx, n.cy, n.own
      FROM nbr n CROSS JOIN offsets
      JOIN core k ON k.cx = n.cx + dx AND k.cy = n.cy + dy
      WHERE n.hood < 12)
    SELECT CAST((SELECT count(*) FROM cells) AS BIGINT) AS n_cells,
           CAST((SELECT count(*) FROM core) AS BIGINT) AS n_core_cells,
           CAST((SELECT count(*) FROM border) AS BIGINT) AS n_border_cells,
           CAST((SELECT coalesce(sum(own), 0) FROM core) AS BIGINT)
             AS points_in_core,
           CAST((SELECT coalesce(sum(own), 0) FROM border) AS BIGINT)
             AS points_in_border
    """,
    tags=("spatial", "clustering", "grid"),
)
def q_dbscan_core_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based DBSCAN density classification on the embedding
    cloud's first two dimensions: cells whose 3×3 neighborhood
    holds ≥ minPts points are CORE, non-core cells adjacent to a
    core cell are BORDER, the rest is noise — the density-based
    clustering view that finds arbitrary-shaped clusters k-means
    (kmeans_clusters) cannot, expressed entirely as cell-key
    equi-joins (the 9-offset neighbor join is the same
    halo-exchange shape as the raster focal operators,
    operators/focal.py). Grid quantization is what makes DBSCAN
    distributable: density queries become hash lookups on cell
    ids instead of radius searches."""
    e = _t(spark, sf_dir, "embeddings")
    pts = e.select(
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    cells = pts.groupBy(
        F.floor(F.col("x") / 0.5).cast("long").alias("cx"),
        F.floor(F.col("y") / 0.5).cast("long").alias("cy"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx int, dy int"
    )
    c = cells.select(
        F.col("cx").alias("ccx"), F.col("cy").alias("ccy"), F.col("n").alias("own")
    )
    nbr = (
        c.crossJoin(F.broadcast(offsets))
        .join(
            cells,
            (F.col("cx") == F.col("ccx") + F.col("dx"))
            & (F.col("cy") == F.col("ccy") + F.col("dy")),
        )
        .groupBy("ccx", "ccy")
        .agg(F.first("own").alias("own"), F.sum("n").alias("hood"))
    )
    core = nbr.filter(F.col("hood") >= 12).select("ccx", "ccy", "own")
    noncore = nbr.filter(F.col("hood") < 12).select("ccx", "ccy", "own")
    border = (
        noncore.crossJoin(F.broadcast(offsets))
        .join(
            core.select(F.col("ccx").alias("kx"), F.col("ccy").alias("ky")),
            (F.col("kx") == F.col("ccx") + F.col("dx"))
            & (F.col("ky") == F.col("ccy") + F.col("dy")),
        )
        .select("ccx", "ccy", "own")
        .distinct()
    )
    n_cells = cells.agg(F.count("*").alias("v"))
    n_core = core.agg(F.count("*").alias("v"), F.coalesce(F.sum("own"), F.lit(0)).alias("p"))
    n_border = border.agg(
        F.count("*").alias("v"), F.coalesce(F.sum("own"), F.lit(0)).alias("p")
    )
    return (
        n_cells.select(F.col("v").cast("bigint").alias("n_cells"))
        .crossJoin(
            n_core.select(
                F.col("v").cast("bigint").alias("n_core_cells"),
                F.col("p").cast("bigint").alias("points_in_core"),
            )
        )
        .crossJoin(
            n_border.select(
                F.col("v").cast("bigint").alias("n_border_cells"),
                F.col("p").cast("bigint").alias("points_in_border"),
            )
        )
        .select(
            "n_cells",
            "n_core_cells",
            "n_border_cells",
            "points_in_core",
            "points_in_border",
        )
    )


@register(
    "hodges_lehmann_shift",
    oracle="""
    WITH hr AS (
      SELECT l_quantity AS v, CAST(count(*) AS DOUBLE) AS c
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
    hn AS (
      SELECT l_quantity AS v, CAST(count(*) AS DOUBLE) AS c
      FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1),
    diffs AS (
      SELECT hr.v - hn.v AS d, sum(hr.c * hn.c) AS w
      FROM hr CROSS JOIN hn GROUP BY hr.v - hn.v),
    tot AS (SELECT sum(w) AS tw FROM diffs),
    cum AS (
      SELECT d, sum(w) OVER (ORDER BY d) AS cw, tw
      FROM diffs, tot)
    SELECT CAST((SELECT tw FROM tot) AS BIGINT) AS n_pairs,
           round(min(CASE WHEN cw >= tw / 2 THEN d END), 1)
             AS hodges_lehmann_shift
    FROM cum
    """,
    tags=("stats", "robust", "median"),
)
def q_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift estimator between returned and normal
    line quantities: the MEDIAN of all cross-group differences —
    the location estimator associated with the Wilcoxon/Mann-
    Whitney family (wilcoxon_signed_rank tests; HL says BY HOW
    MUCH), 50% breakdown-robust where the difference-of-means is
    not. The 10¹⁰ conceptual pairs collapse onto the value-
    histogram cross product (≤50×50 cells → ≤99 distinct
    differences), and the weighted median is a prefix window over
    that tiny relation — the same histogram collapse as
    kendall_tau_b and energy_distance_two_sample, the house style
    for quadratic statistics at scale."""
    li = _t(spark, sf_dir, "lineitem")
    hr = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_quantity").alias("v"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    hn = (
        li.filter(F.col("l_returnflag") == "N")
        .groupBy(F.col("l_quantity").alias("v"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    a = hr.select(F.col("v").alias("vr"), F.col("c").alias("cr"))
    b = hn.select(F.col("v").alias("vn"), F.col("c").alias("cn"))
    diffs = (
        a.crossJoin(b)
        .groupBy((F.col("vr") - F.col("vn")).alias("d"))
        .agg(F.sum(F.col("cr") * F.col("cn")).alias("w"))
    )
    tot = diffs.agg(F.sum("w").alias("tw"))
    wv = Window.orderBy("d")
    cum = diffs.crossJoin(F.broadcast(tot)).select(
        "d", F.sum("w").over(wv).alias("cw"), "tw"
    )
    return cum.agg(
        F.first("tw").cast("bigint").alias("n_pairs"),
        F.round(
            F.min(F.when(F.col("cw") >= F.col("tw") / 2, F.col("d"))), 1
        ).alias("hodges_lehmann_shift"),
    )


@register(
    "newey_west_se",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    st AS (SELECT avg(v) AS mu, CAST(count(*) AS DOUBLE) AS n FROM daily),
    dev AS (
      SELECT d, v - mu AS e,
             lag(v - mu, 1) OVER (ORDER BY d) AS e1,
             lag(v - mu, 2) OVER (ORDER BY d) AS e2,
             lag(v - mu, 3) OVER (ORDER BY d) AS e3,
             lag(v - mu, 4) OVER (ORDER BY d) AS e4,
             lag(v - mu, 5) OVER (ORDER BY d) AS e5,
             lag(v - mu, 6) OVER (ORDER BY d) AS e6,
             lag(v - mu, 7) OVER (ORDER BY d) AS e7
      FROM daily, st),
    gam AS (
      SELECT avg(e * e) AS g0,
             avg(e * e1) AS g1, avg(e * e2) AS g2, avg(e * e3) AS g3,
             avg(e * e4) AS g4, avg(e * e5) AS g5, avg(e * e6) AS g6,
             avg(e * e7) AS g7,
             any_value(n) AS n
      FROM dev, st GROUP BY n),
    lrv AS (
      SELECT n, g0,
             g0 + 2 * ((1 - 1 / 8.0) * g1 + (1 - 2 / 8.0) * g2
                     + (1 - 3 / 8.0) * g3 + (1 - 4 / 8.0) * g4
                     + (1 - 5 / 8.0) * g5 + (1 - 6 / 8.0) * g6
                     + (1 - 7 / 8.0) * g7) AS s2nw
      FROM gam)
    SELECT CAST(n AS BIGINT) AS n_days,
           round(sqrt(g0 / n), 2) AS naive_se,
           round(sqrt(s2nw / n), 2) AS newey_west_se,
           round(sqrt(s2nw / g0), 4) AS se_inflation
    FROM lrv
    """,
    tags=("timeseries", "stats", "robust"),
)
def q_newey_west_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC) standard error of the mean daily revenue:
    the long-run variance γ₀+2Σ(1−k/(L+1))γₖ with Bartlett weights
    at L=7 lags — the correction that makes confidence intervals
    honest when observations autocorrelate (the naive σ/√n is
    anti-conservative by exactly the se_inflation factor whenever
    acf_daily_revenue shows positive lag-1; every time-series KPI
    'significance' claim silently needs this). Lag products come
    from 7 lag columns in ONE window pass; the autocovariances are
    one aggregate — the same |dates|-relation discipline as the
    rest of the series tier."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    st = daily.agg(F.avg("v").alias("mu"), F.count("*").cast("double").alias("n"))
    w = Window.orderBy("d")
    e = F.col("v") - F.col("mu")
    dev = daily.crossJoin(F.broadcast(st)).select(
        "n",
        e.alias("e"),
        *[F.lag(e, k).over(w).alias(f"e{k}") for k in range(1, 8)],
    )
    gam = dev.groupBy("n").agg(
        F.avg(F.col("e") * F.col("e")).alias("g0"),
        *[
            F.avg(F.col("e") * F.col(f"e{k}")).alias(f"g{k}")
            for k in range(1, 8)
        ],
    )
    s2nw = F.col("g0") + 2 * sum(
        (1 - k / 8.0) * F.col(f"g{k}") for k in range(1, 8)
    )
    return gam.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.sqrt(F.col("g0") / F.col("n")), 2).alias("naive_se"),
        F.round(F.sqrt(s2nw / F.col("n")), 2).alias("newey_west_se"),
        F.round(F.sqrt(s2nw / F.col("g0")), 4).alias("se_inflation"),
    )


@register(
    "kingman_vut_estimate",
    oracle="""
    WITH arr AS (
      SELECT epoch_us(ts) / 1e6 AS t
      FROM events),
    gaps AS (
      SELECT t - lag(t) OVER (ORDER BY t) AS ia
      FROM arr QUALIFY ia IS NOT NULL AND ia > 0),
    scv AS (
      SELECT avg(ia) AS mia, var_samp(ia) / pow(avg(ia), 2) AS ca2,
             CAST(count(*) AS BIGINT) AS n
      FROM gaps),
    rhos AS (SELECT unnest([0.7, 0.8, 0.9]) AS rho)
    SELECT round(mia, 3) AS mean_interarrival_s,
           round(ca2, 4) AS arrival_scv,
           CAST(rho * 100 AS BIGINT) AS utilization_pct,
           round((rho / (1 - rho)) * (ca2 + 0) / 2 * (rho * mia), 3)
             AS kingman_wait_s
    FROM scv CROSS JOIN rhos
    """,
    tags=("sre", "queueing", "window"),
)
def q_kingman_vut_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kingman's VUT approximation from the measured event stream:
    wait ≈ (ρ/(1−ρ)) · (c_a²+c_s²)/2 · service-time, with the
    arrival SCV c_a² MEASURED from interarrival gaps (c_a²=1 is
    Poisson; the heavy factor is burstiness — burstiness_fano's
    counting-view twin) and deterministic service (c_s²=0) at
    three utilization scenarios — the factory-physics formula that
    says WHY 90% utilization queues explode (the ρ/(1−ρ)
    hockey-stick) and erlang_c_staffing's M/M/N the general-
    arrival sanity check. Interarrivals are one lag window over
    the event-time ordering; at fact scale the gap computation
    partitions by day/shard first."""
    e = _t(spark, sf_dir, "events")
    arr = e.select((F.unix_micros("ts") / 1e6).alias("t"))
    w = Window.orderBy("t")
    gaps = arr.select((F.col("t") - F.lag("t").over(w)).alias("ia")).filter(
        F.col("ia").isNotNull() & (F.col("ia") > 0)
    )
    scv = gaps.agg(
        F.avg("ia").alias("mia"),
        (F.var_samp("ia") / F.pow(F.avg("ia"), 2)).alias("ca2"),
        F.count("*").cast("bigint").alias("n"),
    )
    rhos = spark.createDataFrame([(0.7,), (0.8,), (0.9,)], "rho double")
    wait = (F.col("rho") / (1 - F.col("rho"))) * (F.col("ca2") + 0) / 2 * (
        F.col("rho") * F.col("mia")
    )
    return scv.crossJoin(F.broadcast(rhos)).select(
        F.round("mia", 3).alias("mean_interarrival_s"),
        F.round("ca2", 4).alias("arrival_scv"),
        (F.col("rho") * 100).cast("bigint").alias("utilization_pct"),
        F.round(wait, 3).alias("kingman_wait_s"),
    )


@register(
    "successive_halving_replay",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events),
    phased AS (
      SELECT event_type AS arm, value,
             least(CAST(floor(3.0 * date_diff('day', d0, CAST(ts AS DATE))
                   / (date_diff('day', d0, d1) + 1)) AS INT), 2) AS phase
      FROM events, bounds
      WHERE event_type IN ('view', 'click', 'signup', 'error')),
    p0 AS (
      SELECT arm, avg(value) AS m FROM phased WHERE phase = 0 GROUP BY arm),
    keep0 AS (
      SELECT arm FROM (
        SELECT arm, row_number() OVER (ORDER BY m DESC, arm) AS rk FROM p0)
      WHERE rk <= 2),
    p1 AS (
      SELECT arm, avg(value) AS m FROM phased
      WHERE phase = 1 AND arm IN (SELECT arm FROM keep0) GROUP BY arm),
    keep1 AS (
      SELECT arm FROM (
        SELECT arm, row_number() OVER (ORDER BY m DESC, arm) AS rk FROM p1)
      WHERE rk <= 1),
    final AS (
      SELECT arm, avg(value) AS m FROM phased
      WHERE phase = 2 AND arm IN (SELECT arm FROM keep1) GROUP BY arm),
    truth AS (
      SELECT arm, row_number() OVER (ORDER BY avg(value) DESC, arm)
               AS true_rank
      FROM phased GROUP BY arm)
    SELECT f.arm AS winner,
           round(f.m, 4) AS final_phase_value,
           CAST(t.true_rank AS BIGINT) AS winner_true_rank
    FROM final f JOIN truth t ON f.arm = t.arm
    """,
    tags=("ml", "bandit", "sequence"),
)
def q_successive_halving_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Successive halving (the Hyperband inner loop) replayed on the
    event log: four arms, three equal time phases, half the arms
    eliminated after each phase by observed mean value — the
    budget-efficient tournament that spends ~log₂(k) phase-budgets
    where full evaluation spends k, at the risk the replay
    measures: winner_true_rank > 1 means an early phase eliminated
    the eventually-best arm on noise (the known failure mode that
    motivates Hyperband's multiple brackets). Each phase is a
    conditional aggregate gated by the previous phase's top-k —
    a semi-join chain, no per-phase re-scan of eliminated arms'
    history."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "signup", "error")
    )
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    phased = e.crossJoin(F.broadcast(bounds)).select(
        F.col("event_type").alias("arm"),
        "value",
        F.least(
            F.floor(
                3.0
                * F.datediff(F.to_date("ts"), F.col("d0"))
                / (F.datediff(F.col("d1"), F.col("d0")) + 1)
            ).cast("int"),
            F.lit(2),
        ).alias("phase"),
    )

    def topk(df, k):
        ranked = df.select(
            "arm",
            F.row_number().over(Window.orderBy(F.desc("m"), "arm")).alias("rk"),
        )
        return ranked.filter(F.col("rk") <= k).select("arm")

    p0 = phased.filter(F.col("phase") == 0).groupBy("arm").agg(
        F.avg("value").alias("m")
    )
    keep0 = topk(p0, 2)
    p1 = (
        phased.filter(F.col("phase") == 1)
        .join(F.broadcast(keep0), "arm", "left_semi")
        .groupBy("arm")
        .agg(F.avg("value").alias("m"))
    )
    keep1 = topk(p1, 1)
    final = (
        phased.filter(F.col("phase") == 2)
        .join(F.broadcast(keep1), "arm", "left_semi")
        .groupBy("arm")
        .agg(F.avg("value").alias("m"))
    )
    truth = (
        phased.groupBy("arm")
        .agg(F.avg("value").alias("tm"))
        .select(
            "arm",
            F.row_number()
            .over(Window.orderBy(F.desc("tm"), "arm"))
            .alias("true_rank"),
        )
    )
    return final.join(truth, "arm").select(
        F.col("arm").alias("winner"),
        F.round("m", 4).alias("final_phase_value"),
        F.col("true_rank").cast("bigint").alias("winner_true_rank"),
    )


@register(
    "split_conformal_interval",
    oracle="""
    WITH obs AS (
      SELECT o_orderkey,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT
               % 3 AS fold,
             CAST(cnt AS DOUBLE) AS x, o_totalprice AS y
      FROM orders JOIN (SELECT l_orderkey, count(*) AS cnt
                        FROM lineitem GROUP BY 1) li
        ON l_orderkey = o_orderkey),
    fit AS (
      SELECT regr_slope(y, x) AS b, regr_intercept(y, x) AS a
      FROM obs WHERE fold = 0),
    cal AS (
      SELECT CAST(quantile_cont(abs(y - a - b * x), 0.9) AS DOUBLE) AS q
      FROM obs, fit WHERE fold = 1),
    test AS (
      SELECT CAST(count(*) AS BIGINT) AS n_test,
             round(avg(CASE WHEN abs(y - a - b * x) <= q
                            THEN 1.0 ELSE 0.0 END), 4) AS coverage,
             round(2 * any_value(q), 2) AS interval_width
      FROM obs, fit, cal WHERE fold = 2)
    SELECT n_test, coverage, interval_width
    FROM test
    """,
    tags=("ml", "estimation", "split"),
)
def q_split_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction: fit a one-feature model on fold
    0, take the 90th percentile of |residual| on the CALIBRATION
    fold as the interval radius, and verify ~90% empirical coverage
    on the held-out test fold — the distribution-free guarantee
    that holds for ANY model, however wrong (here deliberately
    crude OLS), which is why conformal is how production systems
    put honest error bars on black-box predictions. The three
    folds are the deterministic md5 split; fit and radius are each
    one aggregate broadcast forward — the whole pipeline is three
    passes over one scan's output."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cnt = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    obs = o.join(cnt, o["o_orderkey"] == cnt["l_orderkey"]).select(
        CUR.hash_bucket(F.col("o_orderkey"), 3).alias("fold"),
        F.col("cnt").cast("double").alias("x"),
        F.col("o_totalprice").alias("y"),
    )
    fit = obs.filter(F.col("fold") == 0).agg(
        F.expr("regr_slope(y, x)").alias("b"),
        F.expr("regr_intercept(y, x)").alias("a"),
    )
    resid = F.abs(F.col("y") - F.col("a") - F.col("b") * F.col("x"))
    cal = (
        obs.filter(F.col("fold") == 1)
        .crossJoin(F.broadcast(fit))
        .agg(F.expr("percentile(abs(y - a - b * x), 0.9)").alias("q"))
    )
    test = (
        obs.filter(F.col("fold") == 2)
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(cal))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.round(
                F.avg(F.when(resid <= F.col("q"), 1.0).otherwise(0.0)), 4
            ).alias("coverage"),
            F.round(2 * F.first("q"), 2).alias("interval_width"),
        )
    )
    return test.select("n_test", "coverage", "interval_width")


@register(
    "pinball_loss_eval",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS y
      FROM orders GROUP BY 1),
    fc AS (
      SELECT d, y,
             lag(y, 1) OVER (ORDER BY d) AS naive,
             lag(y, 7) OVER (ORDER BY d) AS snaive
      FROM daily),
    scored AS (
      SELECT 'naive_lag1' AS model,
             avg(CASE WHEN y >= naive THEN 0.9 * (y - naive)
                      ELSE 0.1 * (naive - y) END) AS pinball_q90,
             avg(abs(y - naive)) AS mae
      FROM fc WHERE snaive IS NOT NULL
      UNION ALL
      SELECT 'seasonal_lag7',
             avg(CASE WHEN y >= snaive THEN 0.9 * (y - snaive)
                      ELSE 0.1 * (snaive - y) END),
             avg(abs(y - snaive))
      FROM fc WHERE snaive IS NOT NULL)
    SELECT model, round(pinball_q90, 2) AS pinball_q90,
           round(mae, 2) AS mae
    FROM scored
    """,
    tags=("forecast", "eval", "window"),
)
def q_pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss at q=0.9 for two baseline forecasts
    (yesterday vs same-day-last-week): the asymmetric loss that
    scores a QUANTILE forecast properly — under-forecasts cost 9×
    over-forecasts, exactly the asymmetry of capacity planning,
    where 'we provisioned short' and 'we provisioned long' are not
    symmetric mistakes (MAE, shown alongside, is the q=0.5 special
    case and picks a different winner when errors are skewed).
    Both models and both losses come from ONE window pass with two
    lag columns; the shared WHERE keeps the comparison on identical
    evaluation days."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("y")
    )
    w = Window.orderBy("d")
    fc = daily.select(
        "y",
        F.lag("y", 1).over(w).alias("naive"),
        F.lag("y", 7).over(w).alias("snaive"),
    ).filter(F.col("snaive").isNotNull())

    def pinball(pred):
        return F.avg(
            F.when(
                F.col("y") >= F.col(pred), 0.9 * (F.col("y") - F.col(pred))
            ).otherwise(0.1 * (F.col(pred) - F.col("y")))
        )

    naive = fc.agg(
        pinball("naive").alias("pinball_q90"),
        F.avg(F.abs(F.col("y") - F.col("naive"))).alias("mae"),
    ).select(F.lit("naive_lag1").alias("model"), "pinball_q90", "mae")
    snaive = fc.agg(
        pinball("snaive").alias("pinball_q90"),
        F.avg(F.abs(F.col("y") - F.col("snaive"))).alias("mae"),
    ).select(F.lit("seasonal_lag7").alias("model"), "pinball_q90", "mae")
    return naive.unionAll(snaive).select(
        "model",
        F.round("pinball_q90", 2).alias("pinball_q90"),
        F.round("mae", 2).alias("mae"),
    )


@register(
    "binary_segmentation_2level",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS v
      FROM orders GROUP BY 1),
    gl AS (SELECT avg(v) AS mu, stddev_samp(v) AS sd FROM daily),
    c1 AS (
      SELECT d, sum((v - mu) / sd) OVER (ORDER BY d) AS cs
      FROM daily, gl),
    cp1 AS (
      SELECT d AS split1, abs(cs) AS score1,
             row_number() OVER (ORDER BY abs(cs) DESC, d) AS rk
      FROM c1 QUALIFY rk = 1),
    seg AS (
      SELECT daily.d, v, CASE WHEN daily.d <= split1 THEN 0 ELSE 1 END AS s
      FROM daily, cp1),
    segstats AS (
      SELECT s, avg(v) AS smu, stddev_samp(v) AS ssd FROM seg GROUP BY s),
    c2 AS (
      SELECT s, d,
             sum((v - smu) / ssd) OVER (PARTITION BY s ORDER BY d) AS cs
      FROM seg JOIN segstats USING (s)),
    cp2 AS (
      SELECT s, d AS split2, abs(cs) AS score2,
             row_number() OVER (PARTITION BY s
                                ORDER BY abs(cs) DESC, d) AS rk
      FROM c2 QUALIFY rk = 1)
    SELECT strftime((SELECT split1 FROM cp1), '%Y-%m-%d') AS level1_split,
           round((SELECT score1 FROM cp1), 3) AS level1_score,
           strftime(min(CASE WHEN s = 0 THEN split2 END), '%Y-%m-%d')
             AS left_split,
           strftime(min(CASE WHEN s = 1 THEN split2 END), '%Y-%m-%d')
             AS right_split,
           round(max(CASE WHEN s = 0 THEN score2 END), 3) AS left_score,
           round(max(CASE WHEN s = 1 THEN score2 END), 3) AS right_score
    FROM cp2
    """,
    tags=("timeseries", "window", "decomposition"),
)
def q_binary_segmentation_2level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary segmentation, two levels unrolled: the strongest
    CUSUM change-point splits the series, then each half is
    re-standardized and searched again — three candidate
    change-points from a fixed recursion depth, the multiple-
    change-point extension of cusum_changepoint (which finds
    exactly one and dilutes when several exist). The second level
    is ONE partitioned window over the segment-labeled relation —
    segmentation parallelism is literally partition parallelism,
    which is why binary segmentation (not optimal-partitioning DP)
    is the distributed change-point algorithm of choice."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum("o_totalprice").alias("v")
    )
    gl = daily.agg(F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd"))
    wc = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    c1 = daily.crossJoin(F.broadcast(gl)).select(
        "d",
        "v",
        F.sum((F.col("v") - F.col("mu")) / F.col("sd")).over(wc).alias("cs"),
    )
    cp1 = (
        c1.select(
            F.col("d").alias("split1"),
            F.abs(F.col("cs")).alias("score1"),
            F.row_number()
            .over(Window.orderBy(F.abs(F.col("cs")).desc(), "d"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    seg = daily.crossJoin(F.broadcast(cp1)).select(
        "d",
        "v",
        "split1",
        "score1",
        F.when(F.col("d") <= F.col("split1"), 0).otherwise(1).alias("s"),
    )
    segstats = seg.groupBy("s").agg(
        F.avg("v").alias("smu"), F.stddev_samp("v").alias("ssd")
    )
    wseg = Window.partitionBy("s").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c2 = seg.join(F.broadcast(segstats), "s").select(
        "s",
        "d",
        "split1",
        "score1",
        F.sum((F.col("v") - F.col("smu")) / F.col("ssd")).over(wseg).alias("cs"),
    )
    cp2 = c2.select(
        "s",
        F.col("d").alias("split2"),
        F.abs(F.col("cs")).alias("score2"),
        "split1",
        "score1",
        F.row_number()
        .over(Window.partitionBy("s").orderBy(F.abs(F.col("cs")).desc(), "d"))
        .alias("rk"),
    ).filter(F.col("rk") == 1)
    return cp2.groupBy("split1", "score1").agg(
        F.date_format(
            F.min(F.when(F.col("s") == 0, F.col("split2"))), "yyyy-MM-dd"
        ).alias("left_split"),
        F.date_format(
            F.min(F.when(F.col("s") == 1, F.col("split2"))), "yyyy-MM-dd"
        ).alias("right_split"),
        F.round(F.max(F.when(F.col("s") == 0, F.col("score2"))), 3).alias(
            "left_score"
        ),
        F.round(F.max(F.when(F.col("s") == 1, F.col("score2"))), 3).alias(
            "right_score"
        ),
    ).select(
        F.date_format("split1", "yyyy-MM-dd").alias("level1_split"),
        F.round("score1", 3).alias("level1_score"),
        "left_split",
        "right_split",
        "left_score",
        "right_score",
    )


@register(
    "fractional_knapsack_budget",
    oracle="""
    WITH items AS (
      SELECT p_brand,
             sum(l_extendedprice * (1 - l_discount)) AS value,
             CAST(sum(l_quantity) AS DOUBLE) AS cost
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand),
    ranked AS (
      SELECT p_brand, value, cost, value / cost AS density,
             sum(cost) OVER (ORDER BY value / cost DESC, p_brand) AS cum_cost
      FROM items),
    budget AS (SELECT 0.5 * sum(cost) AS cap FROM items),
    taken AS (
      SELECT p_brand, value, cost, density, cum_cost, cap,
             CASE WHEN cum_cost <= cap THEN 1.0
                  WHEN cum_cost - cost < cap
                  THEN (cap - (cum_cost - cost)) / cost
                  ELSE 0.0 END AS fraction
      FROM ranked, budget)
    SELECT CAST(sum(CASE WHEN fraction = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_full_items,
           CAST(sum(CASE WHEN fraction > 0 AND fraction < 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_fractional,
           round(sum(value * fraction), 2) AS captured_value,
           round(sum(value * fraction) / sum(value), 4) AS value_share,
           round(any_value(cap), 1) AS budget_cap
    FROM taken
    """,
    tags=("allocation", "window", "economics"),
)
def q_fractional_knapsack_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional knapsack at half the total capacity: brands
    greedily taken in value-density order until the budget cap,
    the boundary brand taken fractionally — the greedy that is
    PROVABLY optimal for divisible resources (budget allocation,
    shelf space, compute quota), unlike 0/1 knapsack where greedy
    only approximates. The entire allocation is one cumulative-cost
    window over the density ordering plus a broadcast cap — the
    value_share column quantifies the Pareto effect (half the
    budget captures well over half the value when densities are
    skewed, cf. pareto_8020)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    items = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "value"
            ),
            F.sum("l_quantity").cast("double").alias("cost"),
        )
    )
    density = F.col("value") / F.col("cost")
    wd = Window.orderBy(density.desc(), "p_brand").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = items.select(
        "p_brand", "value", "cost", density.alias("density"),
        F.sum("cost").over(wd).alias("cum_cost"),
    )
    budget = items.agg((0.5 * F.sum("cost")).alias("cap"))
    frac = (
        F.when(F.col("cum_cost") <= F.col("cap"), 1.0)
        .when(
            F.col("cum_cost") - F.col("cost") < F.col("cap"),
            (F.col("cap") - (F.col("cum_cost") - F.col("cost"))) / F.col("cost"),
        )
        .otherwise(0.0)
    )
    taken = ranked.crossJoin(F.broadcast(budget)).select(
        "value", "cap", frac.alias("fraction")
    )
    return taken.agg(
        F.sum(F.when(F.col("fraction") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_full_items"),
        F.sum(
            F.when((F.col("fraction") > 0) & (F.col("fraction") < 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_fractional"),
        F.round(F.sum(F.col("value") * F.col("fraction")), 2).alias(
            "captured_value"
        ),
        F.round(
            F.sum(F.col("value") * F.col("fraction")) / F.sum("value"), 4
        ).alias("value_share"),
        F.round(F.first("cap"), 1).alias("budget_cap"),
    )


@register(
    "placebo_did_check",
    oracle="""
    WITH obs AS (
      SELECT CASE WHEN c_nationkey % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CAST(o_orderdate AS DATE) AS d, o_totalprice AS y
      FROM orders JOIN customer ON o_custkey = c_custkey),
    did AS (
      SELECT 'real_1997' AS test,
             avg(CASE WHEN treated = 1 AND d >= DATE '1997-01-01'
                      THEN y END)
           - avg(CASE WHEN treated = 1 AND d < DATE '1997-01-01'
                      THEN y END)
           - (avg(CASE WHEN treated = 0 AND d >= DATE '1997-01-01'
                       THEN y END)
            - avg(CASE WHEN treated = 0 AND d < DATE '1997-01-01'
                       THEN y END)) AS did
      FROM obs
      UNION ALL
      SELECT 'placebo_1996',
             avg(CASE WHEN treated = 1 AND d >= DATE '1996-01-01'
                      AND d < DATE '1997-01-01' THEN y END)
           - avg(CASE WHEN treated = 1 AND d < DATE '1996-01-01'
                      THEN y END)
           - (avg(CASE WHEN treated = 0 AND d >= DATE '1996-01-01'
                       AND d < DATE '1997-01-01' THEN y END)
            - avg(CASE WHEN treated = 0 AND d < DATE '1996-01-01'
                       THEN y END))
      FROM obs WHERE d < DATE '1997-01-01')
    SELECT test, round(did, 4) AS did_estimate
    FROM did ORDER BY test
    """,
    tags=("causal", "experimentation", "audit"),
)
def q_placebo_did_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Placebo test for the difference-in-differences design: the
    same 2×2 contrast re-run with a FAKE treatment date inside the
    pre-period (1996, using only pre-1997 data) — a nonzero placebo
    'effect' means the parallel-trends assumption
    difference_in_differences silently relies on was already broken
    before treatment, and the real estimate is trend, not effect.
    This negative-control discipline is the cheapest causal
    robustness check there is: one extra conditional aggregate over
    the same scan, and it should be a mandatory companion to every
    DiD in production."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    obs = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.when(F.col("c_nationkey") % 2 == 0, 1).otherwise(0).alias("treated"),
        F.col("o_orderdate").cast("date").alias("d"),
        F.col("o_totalprice").alias("y"),
    )

    def did(df, cut, lo=None):
        pre = F.col("d") < cut
        post = F.col("d") >= cut
        if lo is not None:
            post = post & (F.col("d") < lo)
        cell = lambda t, per: F.avg(
            F.when((F.col("treated") == t) & per, F.col("y"))
        )
        return df.agg(
            (
                cell(1, post) - cell(1, pre) - (cell(0, post) - cell(0, pre))
            ).alias("did")
        )

    real = did(obs, F.lit("1997-01-01").cast("date")).select(
        F.lit("real_1997").alias("test"), F.round("did", 4).alias("did_estimate")
    )
    placebo = did(
        obs.filter(F.col("d") < "1997-01-01"),
        F.lit("1996-01-01").cast("date"),
        F.lit("1997-01-01").cast("date"),
    ).select(
        F.lit("placebo_1996").alias("test"), F.round("did", 4).alias("did_estimate")
    )
    return real.unionAll(placebo).orderBy("test")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.builder for n, s in REGISTRY.items() if s.headline}
