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
    n = PG.write_upsert_jdbc(
        df,
        "scene_stats",
        conflict_keys=("scene_id",),
        connection_factory=lambda: sqlite3.connect(db, timeout=30),
        mode="replace",
    )
    assert n == 3  # accumulator count, no extra count() job
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


def test_raster_wkb_golden_bytes():
    """Byte-golden: a 1x1 8BUI raster, value 7, nodata 0, SRID 4326,
    unit scales — every byte hand-derived from the public raster WKB
    layout (61-byte header + flags + nodata + pixels)."""
    import numpy as np

    got = PG.raster_wkb(
        np.array([[7]], dtype=np.uint8),
        ip_x=0.0, ip_y=0.0, scale_x=1.0, scale_y=-1.0, srid=4326, nodata=0,
    )
    golden = bytes.fromhex(
        "01"                    # little endian
        "0000"                  # version 0
        "0100"                  # 1 band
        "000000000000f03f"      # scaleX = 1.0
        "000000000000f0bf"      # scaleY = -1.0
        "0000000000000000"      # ipX = 0.0
        "0000000000000000"      # ipY = 0.0
        "0000000000000000"      # skewX
        "0000000000000000"      # skewY
        "e6100000"              # srid = 4326
        "0100"                  # width 1
        "0100"                  # height 1
        "44"                    # flags: hasNodata(0x40) | 8BUI(4)
        "00"                    # nodata = 0
        "07"                    # the pixel
    )
    assert got == golden, got.hex()


def test_raster_wkb_roundtrip_float32_tile():
    """encode→decode identity for a float32 NDVI-shaped tile with a
    -9999 nodata sentinel (the reference's band profile,
    compute_ndvi.py:34-36) and a non-trivial georeference."""
    import numpy as np

    rng = np.random.default_rng(7)
    tile = rng.uniform(-1, 1, size=(17, 23)).astype(np.float32)
    tile[0, 0] = -9999.0
    wkb = PG.raster_wkb(
        tile, ip_x=399960.0, ip_y=6700020.0, scale_x=30.0, scale_y=-30.0,
        srid=32635, nodata=-9999.0,
    )
    out = PG.parse_raster_wkb(wkb)
    assert (out["width"], out["height"]) == (23, 17)
    assert out["srid"] == 32635
    assert out["scale_x"] == 30.0 and out["scale_y"] == -30.0
    assert out["ip_x"] == 399960.0 and out["ip_y"] == 6700020.0
    (band,) = out["bands"]
    assert band["pixtype"] == "32BF"
    assert band["nodata"] == np.float32(-9999.0)
    assert np.array_equal(band["array"], tile)


def test_raster_wkb_no_nodata_flag():
    import numpy as np

    wkb = PG.raster_wkb(
        np.zeros((2, 2), dtype=np.int16), 0, 0, 1.0, -1.0, srid=0, nodata=None
    )
    (band,) = PG.parse_raster_wkb(wkb)["bands"]
    assert band["nodata"] is None  # slot present, flag unset


def test_raster_upsert_sql_wraps_payload():
    sql = PG.raster_upsert_sql(
        "ndvi_clipped",
        ("full_id", "aoi_id", "mean_ndvi", "raster"),
        ("full_id", "aoi_id"),
    )
    assert "ST_RastFromWKB(?)" in sql
    assert sql.count("?") == 4
    assert '"raster" = excluded."raster"' in sql


def test_raster_wkb_through_upsert_sink(spark, tmp_path):
    """End-to-end: WKB payloads ride the distributed upsert sink into
    the sqlite stand-in and parse back bit-identically — the
    ndvi_clipped product shape (full_id, aoi_id, mean_ndvi, raster)
    with UNIQUE(full_id, aoi_id), 002_schema.sql:20-31."""
    import numpy as np

    db = str(tmp_path / "pg.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE ndvi_clipped (full_id INT, aoi_id INT, "
            "mean_ndvi REAL, raster BLOB, UNIQUE(full_id, aoi_id))"
        )

    def payload(seed: int) -> bytes:
        rng = np.random.default_rng(seed)
        t = rng.uniform(-1, 1, size=(8, 8)).astype(np.float32)
        return PG.raster_wkb(t, 0, 0, 30.0, -30.0, srid=32635, nodata=-9999.0)

    rows = [(1, 1, 0.25, payload(1)), (1, 2, 0.5, payload(2))]
    df = spark.createDataFrame(
        rows, "full_id int, aoi_id int, mean_ndvi double, raster binary"
    ).coalesce(1)
    PG.write_upsert_jdbc(
        df,
        "ndvi_clipped",
        ("full_id", "aoi_id"),
        connection_factory=lambda: sqlite3.connect(db, timeout=30),
    )
    # replace-mode upsert: same keys, new payload — must overwrite
    df2 = spark.createDataFrame(
        [(1, 1, 0.75, payload(3))],
        "full_id int, aoi_id int, mean_ndvi double, raster binary",
    ).coalesce(1)
    PG.write_upsert_jdbc(
        df2,
        "ndvi_clipped",
        ("full_id", "aoi_id"),
        connection_factory=lambda: sqlite3.connect(db, timeout=30),
    )
    with sqlite3.connect(db) as con:
        got = con.execute(
            "SELECT full_id, aoi_id, mean_ndvi, raster FROM ndvi_clipped ORDER BY aoi_id"
        ).fetchall()
    assert [(r[0], r[1], r[2]) for r in got] == [(1, 1, 0.75), (1, 2, 0.5)]
    assert bytes(got[0][3]) == payload(3)  # replaced payload, bit-exact
    parsed = PG.parse_raster_wkb(bytes(got[1][3]))
    assert parsed["srid"] == 32635 and parsed["bands"][0]["pixtype"] == "32BF"


def test_stream_upsert_sink_exactly_once(spark, tmp_path):
    """The epoch-ledger foreachBatch sink: applying the same
    (batch_df, batch_id) twice — Structured Streaming's replay after
    failure — must leave the table AND the ledger unchanged; a new
    batch_id applies normally."""
    db = str(tmp_path / "pg.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE metrics (k INT, v REAL, UNIQUE(k))"
        )

    sink = PG.write_upsert_jdbc_stream(
        "metrics", ("k",), connection_factory=lambda: sqlite3.connect(db, timeout=30)
    )
    b0 = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double").coalesce(1)
    sink(b0, 0)
    sink(b0, 0)  # replay: must be a no-op
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT count(*) FROM metrics").fetchone()[0] == 2
        assert con.execute("SELECT count(*) FROM stream_commits").fetchone()[0] == 1

    b1 = spark.createDataFrame([(2, 20.0), (3, 3.0)], "k int, v double").coalesce(1)
    sink(b1, 1)
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT k, v FROM metrics").fetchall())
        assert rows == {1: 1.0, 2: 20.0, 3: 3.0}  # upsert replaced k=2
        led = con.execute(
            "SELECT batch_id, n_rows FROM stream_commits ORDER BY batch_id"
        ).fetchall()
        assert led == [(0, 2), (1, 2)]


def test_stream_upsert_sink_crash_between_data_and_ledger(spark, tmp_path):
    """Crash-recovery for the epoch-ledger sink. Under the atomic
    staging→publish design this target-updated-without-ledger state
    can no longer be REACHED by the sink itself (publish and ledger
    share one transaction), but a pre-upgrade deployment or an
    out-of-band writer can leave it; the replay must still converge
    (ON CONFLICT upsert from staging, no duplicates) and record the
    ledger row — after which a second replay is suppressed
    entirely."""
    db = str(tmp_path / "pg.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE metrics (k INT, v REAL, UNIQUE(k))")

    factory = lambda: sqlite3.connect(db, timeout=30)  # noqa: E731
    batch = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k int, v double"
    ).coalesce(1)

    # crash state: data committed (all partitions), process died before
    # the ledger insert ran — exactly what write_upsert_jdbc_stream's
    # separate-transaction structure permits
    PG.write_upsert_jdbc(batch, "metrics", ("k",), factory, mode="replace")
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT count(*) FROM metrics").fetchone()[0] == 2
        assert (
            con.execute(
                "SELECT count(*) FROM sqlite_master WHERE name='stream_commits'"
            ).fetchone()[0]
            == 0
        )  # no ledger yet: the crash preceded it

    # restart: the stream replays (batch, batch_id=0) through the sink
    sink = PG.write_upsert_jdbc_stream("metrics", ("k",), connection_factory=factory)
    sink(batch, 0)
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT k, v FROM metrics").fetchall())
        assert rows == {1: 1.0, 2: 2.0}  # converged, no duplicates
        led = con.execute(
            "SELECT sink_table, batch_id, n_rows FROM stream_commits"
        ).fetchall()
        assert led == [("metrics", 0, 2)]

    # a second replay after the ledger committed is skipped outright
    poisoned = spark.createDataFrame([(1, 99.0)], "k int, v double").coalesce(1)
    sink(poisoned, 0)
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT k, v FROM metrics").fetchall())
        assert rows == {1: 1.0, 2: 2.0}  # ledger suppressed the write


def test_stream_upsert_sink_mode_guards():
    """Unknown modes are rejected; keyed modes demand conflict keys.
    (`append` is now a first-class mode — the atomic staging→publish
    commit makes it exactly-once, so the old idempotent-modes-only
    guard is gone.)"""
    with pytest.raises(ValueError, match="unknown mode"):
        PG.write_upsert_jdbc_stream(
            "metrics", ("k",), connection_factory=lambda: None, mode="overwrite"
        )
    with pytest.raises(ValueError, match="requires conflict_keys"):
        PG.write_upsert_jdbc_stream(
            "metrics", (), connection_factory=lambda: None, mode="replace"
        )


def test_stream_append_sink_exactly_once_after_crash(spark, tmp_path):
    """The round-4 upgrade: NON-IDEMPOTENT append mode is exactly-once
    because the target is only written inside the same transaction as
    the ledger row. Simulate a crash mid-batch (staging partially
    written, nothing published), replay, and verify no duplicates —
    this is the scenario the old two-transaction sink could not
    support (it refused mode='append' outright)."""
    db = str(tmp_path / "pg.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE events_log (k INT, v REAL)")  # no UNIQUE!

    factory = lambda: sqlite3.connect(db, timeout=30)  # noqa: E731
    sink = PG.write_upsert_jdbc_stream(
        "events_log", connection_factory=factory, mode="append"
    )
    batch = spark.createDataFrame(
        [(1, 1.0), (1, 1.0), (2, 2.0)], "k int, v double"  # dup rows are data
    ).coalesce(1)

    # crash state: a previous attempt staged some rows and died before
    # publish — the target and ledger are untouched, staging has junk
    with sqlite3.connect(db) as con:
        con.execute(
            'CREATE TABLE "events_log__stage_0" '
            "(k INT, v REAL, __part_id BIGINT)"
        )
        con.execute('INSERT INTO "events_log__stage_0" VALUES (1, 1.0, 0)')
    sink(batch, 0)
    with sqlite3.connect(db) as con:
        rows = sorted(con.execute("SELECT k, v FROM events_log").fetchall())
        assert rows == [(1, 1.0), (1, 1.0), (2, 2.0)]  # exactly the batch
        led = con.execute(
            "SELECT sink_table, batch_id, n_rows FROM stream_commits"
        ).fetchall()
        assert led == [("events_log", 0, 3)]
        # staging dropped atomically with the publish
        assert (
            con.execute(
                "SELECT count(*) FROM sqlite_master WHERE name LIKE '%__stage_%'"
            ).fetchone()[0]
            == 0
        )

    # replay after the ledger committed: suppressed, still no dups
    sink(batch, 0)
    # next batch appends normally
    sink(spark.createDataFrame([(3, 3.0)], "k int, v double").coalesce(1), 1)
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT count(*) FROM events_log").fetchone()[0] == 4
        assert con.execute("SELECT count(*) FROM stream_commits").fetchone()[0] == 2


def test_stream_sink_task_retry_converges(spark, tmp_path):
    """A Spark TASK retry re-runs one partition after its first
    attempt committed to staging. The per-partition delete-then-insert
    must converge (no doubled slice) — simulated by invoking the
    staging phase twice via a replayed batch whose first publish never
    happened."""
    db = str(tmp_path / "pg.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE metrics (k INT, v REAL, UNIQUE(k))")

    factory = lambda: sqlite3.connect(db, timeout=30)  # noqa: E731
    batch = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, v double").coalesce(1)

    # first attempt: stage committed, then "crash" before publish —
    # reproduce by pre-staging the same partition slice the task wrote
    with sqlite3.connect(db) as con:
        con.execute(
            'CREATE TABLE "metrics__stage_0" (k INT, v REAL, __part_id BIGINT)'
        )
        con.execute('INSERT INTO "metrics__stage_0" VALUES (1, 1.0, 0)')
        con.execute('INSERT INTO "metrics__stage_0" VALUES (2, 2.0, 0)')
    sink = PG.write_upsert_jdbc_stream("metrics", ("k",), connection_factory=factory)
    sink(batch, 0)  # recreates staging, restages partition 0, publishes
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT k, v FROM metrics").fetchall())
        assert rows == {1: 1.0, 2: 2.0}
        assert con.execute(
            "SELECT n_rows FROM stream_commits WHERE batch_id = 0"
        ).fetchone()[0] == 2  # exact, not doubled


def test_adapt_paramstyle_by_driver_module():
    """qmark SQL is translated for format/pyformat drivers (psycopg2
    shape) and left alone for qmark drivers (sqlite3/duckdb)."""
    import sys
    import types

    sql = 'INSERT INTO "t" ("a", "b") VALUES (?, ?) ON CONFLICT ("a") DO NOTHING'

    class FakePgConn:
        pass

    fake_mod = types.ModuleType("fakepg")
    fake_mod.paramstyle = "pyformat"
    FakePgConn.__module__ = "fakepg.extensions"
    sys.modules["fakepg"] = fake_mod
    try:
        out = PG.adapt_paramstyle(sql, FakePgConn())
        assert out == sql.replace("?", "%s")
    finally:
        del sys.modules["fakepg"]

    with sqlite3.connect(":memory:") as con:
        assert PG.adapt_paramstyle(sql, con) == sql


def test_stream_upsert_sink_duplicate_keys_in_batch_converge(spark, tmp_path):
    """replace mode with TWO rows sharing a conflict key in one
    micro-batch: Postgres aborts a set-based ON CONFLICT DO UPDATE
    that hits a key twice ('cannot affect row a second time'), so the
    publish SELECT must keep one deterministic winner per key — the
    per-row upsert this sink replaced converged here, and external
    callers feed unaggregated batches."""
    db = str(tmp_path / "pg.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE metrics (k INT, v REAL, UNIQUE(k))")

    sink = PG.write_upsert_jdbc_stream(
        "metrics", ("k",), connection_factory=lambda: sqlite3.connect(db, timeout=30)
    )
    dup = spark.createDataFrame(
        [(1, 1.0), (1, 5.0), (2, 2.0)], "k int, v double"
    ).coalesce(1)
    sink(dup, 0)
    with sqlite3.connect(db) as con:
        rows = dict(con.execute("SELECT k, v FROM metrics").fetchall())
        # deterministic winner: value-column DESC tiebreak within the key
        assert rows == {1: 5.0, 2: 2.0}
        assert con.execute("SELECT n_rows FROM stream_commits").fetchone()[0] == 3
