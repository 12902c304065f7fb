"""JDBC upsert sink: SQL builders offline, executor write path proven
against sqlite3 (same DB-API + ON CONFLICT dialect subset)."""

import sqlite3

import pytest

from ndvi_etl_pipeline_spark.sinks import postgis as PG


def test_sql_builders():
    ig = PG.insert_ignore_sql("aois", ("name", "geom"), ("name",))
    assert ig == (
        'INSERT INTO "aois" ("name", "geom") VALUES (?, ?) '
        'ON CONFLICT ("name") DO NOTHING'
    )
    up = PG.upsert_sql(
        "ndvi_clipped", ("full_id", "aoi_id", "mean_ndvi"), ("full_id", "aoi_id")
    )
    assert 'ON CONFLICT ("full_id", "aoi_id") DO UPDATE SET' in up
    assert '"mean_ndvi" = excluded."mean_ndvi"' in up
    assert '"full_id" = excluded' not in up  # keys never updated
    assert "DropRasterConstraints" in PG.drop_raster_constraints_sql("ndvi_full")
    assert "AddRasterConstraints" in PG.add_raster_constraints_sql("ndvi_full")
    with pytest.raises(ValueError):
        PG.quote_ident("x; DROP TABLE y")


def test_connect_with_retry_eventually_raises():
    calls = []

    def bad_factory():
        calls.append(1)
        raise OSError("refused")

    with pytest.raises(ConnectionError):
        PG.connect_with_retry(bad_factory, retries=3, delay_s=0.0)
    assert len(calls) == 3


def test_write_upsert_jdbc_roundtrip(spark, tmp_path):
    db = str(tmp_path / "sink.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE scene_stats (scene_id TEXT PRIMARY KEY, mean_ndvi REAL)"
        )
        con.execute("INSERT INTO scene_stats VALUES ('s1', 0.1)")

    df = spark.createDataFrame(
        [("s1", 0.9), ("s2", 0.2), ("s3", 0.3)], ["scene_id", "mean_ndvi"]
    ).coalesce(1)  # sqlite allows one writer — single partition for the test
    PG.write_upsert_jdbc(
        df,
        "scene_stats",
        conflict_keys=("scene_id",),
        connection_factory=lambda: sqlite3.connect(db, timeout=30),
        mode="replace",
    )
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT scene_id, mean_ndvi FROM scene_stats"))
    assert rows == {"s1": 0.9, "s2": 0.2, "s3": 0.3}  # s1 replaced, others inserted

    # ignore mode: existing rows survive
    df2 = spark.createDataFrame([("s1", 0.5), ("s4", 0.4)], ["scene_id", "mean_ndvi"]).coalesce(1)
    PG.write_upsert_jdbc(
        df2,
        "scene_stats",
        conflict_keys=("scene_id",),
        connection_factory=lambda: sqlite3.connect(db, timeout=30),
        mode="ignore",
    )
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT scene_id, mean_ndvi FROM scene_stats"))
    assert rows["s1"] == 0.9 and rows["s4"] == 0.4
