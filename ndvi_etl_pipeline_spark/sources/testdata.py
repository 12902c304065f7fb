"""Parquet scan layer for the benchmark tables.

The driver's synthetic tables (TESTDATA.md) are one parquet file per
table. At 100 TB the same code path reads a partitioned parquet lake —
Spark's DataSource v2 handles split planning, predicate pushdown and
column pruning; nothing here changes except the path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-size in TPC-H-style generators.
BROADCASTABLE = frozenset({"region", "nation"})


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Parquet can only parallelize a scan down to row-group granularity:
# byte-range splits of a 1-row-group file all resolve to the single
# task whose range contains the row group's midpoint, so everything
# Catalyst fuses into that scan stage (projections, broadcast-join
# probes, partial aggregation) runs on ONE core no matter how many
# the cluster has. `spread_key` lets a builder opt in to a hash
# repartition right after such a read (guide: "input skew — one huge
# unsplittable file: repartition immediately after the read"). The
# repartition is GATED on the actual file layout: a table whose
# row-group count already feeds half the cores (any real lake at
# scale) is returned untouched, so the extra exchange exists only
# where the alternative is an idle cluster — not as a local[32] tune.
_ROW_GROUPS_CACHE: dict[str, int] = {}


def _row_groups(path: str) -> int:
    n = _ROW_GROUPS_CACHE.get(path)
    if n is None:
        try:
            import pyarrow.parquet as pq

            n = pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            n = 1 << 30  # unreadable footer: assume splittable, never spread
        _ROW_GROUPS_CACHE[path] = n
    return n


def load_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    spread_key: str | None = None,
) -> DataFrame:
    sf_dir = sf_dir or default_sf_dir()
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread_key is not None:
        p = spark.sparkContext.defaultParallelism
        if _row_groups(f"{sf_dir}/{name}.parquet") < max(2, p // 2):
            df = df.repartition(p, spread_key)
    # Normalize `ts` to a session-timezone TIMESTAMP whatever the parquet
    # writer used: TIMESTAMP(NANOS) arrives as long (nanosAsLong=true) and
    # needs the /1000 conversion — same truncation DuckDB applies;
    # TIMESTAMP(MICROS) with isAdjustedToUTC=false infers as
    # TIMESTAMP_NTZ and just needs the cast (session tz is UTC, so wall
    # times are preserved — identical to DuckDB's naive-timestamp read).
    for f in df.schema.fields:
        if f.name != "ts":
            continue
        if isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
            )
        elif isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view for the SQL API."""
    for n in TABLES:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)
