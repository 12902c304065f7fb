"""Additional storage formats: ORC and CSV round-trips.

Parquet is the canonical store; ORC ships in Spark's JVM (no extra
jars) and CSV is the interchange floor. Both must round-trip the
relational tables value-faithfully — the format layer is supposed to
be invisible to the engine above it."""

from __future__ import annotations

from pyspark.sql import functions as F

from ndvi_etl_pipeline_spark.sources import load_table


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    orders = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    assert _canon(back, cols) == _canon(orders, cols)

    # predicate pushdown reaches the ORC scan too
    q = back.filter(F.col("o_totalprice") > 300000).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], plan
    assert q.count() == orders.filter(F.col("o_totalprice") > 300000).count()


def test_csv_roundtrip_with_header_and_types(spark, sf_dir, tmp_path):
    nation = load_table(spark, "nation", sf_dir)
    path = str(tmp_path / "nation_csv")
    nation.write.mode("overwrite").option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema(nation.schema)  # schema-on-read: no inference pass
        .csv(path)
    )
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _canon(back, cols) == _canon(nation, cols)
    assert back.schema == nation.schema
