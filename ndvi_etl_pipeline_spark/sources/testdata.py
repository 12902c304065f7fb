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


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or default_sf_dir()
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
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
