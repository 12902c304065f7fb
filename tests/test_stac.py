"""STAC source: predicate mirroring, asset pick, fetch validation and
the scene-completeness gate — all offline via fixture items and an
injected fetcher."""

import pyspark.sql.functions as F
import pytest

from ndvi_etl_pipeline_spark.sources import stac


def item(iid, dt, cloud, assets, bbox=(25.0, 60.0, 26.0, 61.0)):
    return {
        "id": iid,
        "properties": {"datetime": dt, "eo:cloud_cover": cloud},
        "geometry": {"type": "Point", "coordinates": [25.5, 60.5]},
        "bbox": list(bbox),
        "assets": {k: {"href": v, "type": "image/tiff"} for k, v in assets.items()},
    }


FIXTURE_ITEMS = [
    item("LC08_L2SP_189017_20220606_02_T1", "2022-06-06T09:55:00Z", 5.0,
         {"red": "https://x/b4a.tif", "nir08": "https://x/b5a.tif"}),
    item("LC09_L2SP_189018_20220614_02_T1", "2022-06-14T09:55:00Z", 9.0,
         {"SR_B4": "https://x/b4b.tif", "SR_B5": "https://x/b5b.tif"}),
    item("LE07_L2SP_189017_20220601_02_T1", "2022-06-01T09:55:00Z", 1.0,
         {"red": "https://x/b4c.tif", "nir08": "https://x/b5c.tif"}),  # F4 excluded
    item("LC08_L2SP_189019_20220622_02_T1", "2022-06-22T09:55:00Z", 50.0,
         {"red": "https://x/b4d.tif", "nir08": "https://x/b5d.tif"}),  # F1 cloud
    item("LC08_L2SP_189020_20210606_02_T1", "2021-06-06T09:55:00Z", 2.0,
         {"red": "https://x/b4e.tif", "nir08": "https://x/b5e.tif"}),  # F2 date
    item("LC08_L2SP_189021_20220607_02_T1", "2022-06-07T09:55:00Z", 3.0,
         {"red": "https://x/b4f.tif"}),  # missing NIR → dropped (E2/J1)
]


def test_search_params_mirror_predicates():
    p = stac.stac_search_params(
        "landsat-c2-l2", "2022-06-01", "2022-06-30", 10.0,
        bbox=(25.0, 60.0, 26.0, 61.0),
    )
    assert p["collections"] == ["landsat-c2-l2"]
    assert p["datetime"] == "2022-06-01/2022-06-30"
    assert p["query"]["eo:cloud_cover"]["lte"] == 10.0
    assert p["bbox"] == [25.0, 60.0, 26.0, 61.0]
    # intersects wins over bbox when both given
    p2 = stac.stac_search_params(
        "c", "a", "b", 1.0, bbox=(0, 0, 1, 1), intersects={"type": "Point"}
    )
    assert "bbox" not in p2 and "intersects" in p2


def test_select_scenes_filters_and_asset_pick(spark):
    items = stac.items_to_df(spark, FIXTURE_ITEMS)
    scenes = stac.select_scenes(
        items, "2022-06-01T00:00:00Z", "2022-06-30T23:59:59Z", max_cloud_cover=10.0
    ).collect()
    ids = [r.scene_id for r in scenes]
    # LE07 excluded, cloud>10 excluded, 2021 excluded, missing-NIR dropped;
    # ordered by cloud asc
    assert ids == [
        "LC08_L2SP_189017_20220606_02_T1",
        "LC09_L2SP_189018_20220614_02_T1",
    ]
    by_id = {r.scene_id: r for r in scenes}
    # case-insensitive asset pick: SR_B4/SR_B5 resolved for the LC09 item
    assert by_id["LC09_L2SP_189018_20220614_02_T1"].red_href == "https://x/b4b.tif"
    assert by_id["LC09_L2SP_189018_20220614_02_T1"].nir_href == "https://x/b5b.tif"
    assert by_id["LC08_L2SP_189017_20220606_02_T1"].sensor == "LC08"
    assert str(by_id["LC08_L2SP_189017_20220606_02_T1"].acquisition_date) == "2022-06-06"


def test_select_scenes_max_items(spark):
    items = stac.items_to_df(spark, FIXTURE_ITEMS)
    scenes = stac.select_scenes(
        items, "2022-06-01T00:00:00Z", "2022-06-30T23:59:59Z",
        max_cloud_cover=10.0, max_items=1,
    ).collect()
    assert len(scenes) == 1 and scenes[0].scene_id == "LC08_L2SP_189017_20220606_02_T1"


def fake_fetcher_factory(tmp_path, sizes, ctypes):
    def fetch(href, path):
        n = sizes.get(href, 2_000_000)
        with open(path, "wb") as fh:
            fh.write(b"\x00" * min(n, 1024))  # don't actually write 2 MB
        if href == "https://x/raise.tif":
            raise OSError("connection reset")
        return n, ctypes.get(href, "image/tiff; application=geotiff")
    return fetch


def test_fetch_validation_and_gate(spark, tmp_path):
    scenes = spark.createDataFrame(
        [
            ("s_ok", "https://x/r1.tif", "https://x/n1.tif"),
            ("s_small", "https://x/r2.tif", "https://x/n2.tif"),
            ("s_badtype", "https://x/r3.tif", "https://x/n3.tif"),
            ("s_err", "https://x/raise.tif", "https://x/n4.tif"),
        ],
        ["scene_id", "red_href", "nir_href"],
    )
    fetcher = fake_fetcher_factory(
        tmp_path,
        sizes={"https://x/r2.tif": 10},  # V2 failure
        ctypes={"https://x/r3.tif": "text/html"},  # V1 failure
    )
    fetched = stac.fetch_assets(scenes, str(tmp_path), fetcher=fetcher)
    rows = {(r.scene_id, r.band): r for r in fetched.collect()}
    assert rows[("s_ok", "red")].status == "ok"
    assert rows[("s_small", "red")].status == "quarantined"
    assert "V2" in rows[("s_small", "red")].error
    assert rows[("s_badtype", "red")].status == "quarantined"
    assert "V1" in rows[("s_badtype", "red")].error
    assert rows[("s_err", "red")].status == "quarantined"
    assert "OSError" in rows[("s_err", "red")].error
    # E2 gate: only the fully-ok scene survives, with both paths
    complete = stac.complete_scenes(fetched).collect()
    assert len(complete) == 1
    assert complete[0].scene_id == "s_ok"
    assert complete[0].red_path.endswith("s_ok_red.tif")
    assert complete[0].nir_path.endswith("s_ok_nir.tif")


def test_fetch_retries_transient_errors_not_validation(spark, tmp_path):
    """E3-for-HTTP: exceptions retry with backoff; V1/V2 validation
    failures do not (a wrong content-type will not fix itself)."""
    import pyspark.sql.functions as F

    from ndvi_etl_pipeline_spark.sources.stac import fetch_assets

    scenes = spark.createDataFrame(
        [("S1", "flaky://red", "ok://nir"), ("S2", "badtype://red", "ok://nir")],
        "scene_id string, red_href string, nir_href string",
    )

    calls = {}

    def fetcher(href, path):
        calls[href] = calls.get(href, 0) + 1
        if href.startswith("flaky") and calls[href] < 3:
            raise OSError("connection reset")
        if href.startswith("badtype"):
            return 5_000_000, "text/html"
        return 5_000_000, "image/tiff"

    out = fetch_assets(
        scenes, str(tmp_path), fetcher=fetcher, retries=2, sleeper=lambda s: None
    )
    rows = {(r.scene_id, r.band): r for r in out.collect()}
    assert rows[("S1", "red")].status == "ok"          # succeeded on retry 3
    assert rows[("S2", "red")].status == "quarantined"  # V1 fail, no retry
    assert "V1" in rows[("S2", "red")].error
    # Each executor's closure gets its own `calls` dict, so assert via
    # behavior: flaky needed >1 attempt (it succeeded), badtype exactly 1
    # (validation failures break immediately) — encoded above.


# ---------------------------------------------------------------------------
# stac_catalog Python DataSource (sources/stac_datasource.py)
# ---------------------------------------------------------------------------


def _write_catalog(tmp_path):
    """The fixture items materialized in all three static-STAC layouts:
    one item per file, a FeatureCollection bundle, and ndjson."""
    import json

    d = tmp_path / "catalog"
    d.mkdir()
    (d / "item0.json").write_text(json.dumps(FIXTURE_ITEMS[0]))
    (d / "bundle.json").write_text(
        json.dumps({"type": "FeatureCollection", "features": FIXTURE_ITEMS[1:3]})
    )
    (d / "items.ndjson.json").write_text(
        "\n".join(json.dumps(it) for it in FIXTURE_ITEMS[3:])
    )
    (d / "README.txt").write_text("not json — must be ignored by pattern")
    return str(d)


def test_stac_datasource_matches_driver_path(spark, tmp_path):
    """format('stac_catalog') over a materialized catalog produces the
    SAME relation as the driver-side items_to_df — one normalization,
    two transports."""
    from ndvi_etl_pipeline_spark.sources import stac_datasource

    stac_datasource.register(spark)
    path = _write_catalog(tmp_path)
    via_ds = (
        spark.read.format("stac_catalog")
        .option("path", path)
        .option("numPartitions", "3")
        .load()
    )
    assert via_ds.schema == stac.ITEM_SCHEMA
    expect = {r["id"]: r for r in stac.items_to_df(spark, FIXTURE_ITEMS).collect()}
    got = {r["id"]: r for r in via_ds.collect()}
    assert set(got) == set(expect)
    for iid in expect:
        assert got[iid]["cloud_cover"] == expect[iid]["cloud_cover"]
        assert got[iid]["assets"] == expect[iid]["assets"]
        assert got[iid]["properties"] == expect[iid]["properties"]


def test_stac_datasource_feeds_select_scenes(spark, tmp_path):
    """The downstream scene relation (F1-F5/L1/E2) is transport-
    agnostic: select_scenes over the DataSource scan picks the same
    scenes as over the API-path DataFrame."""
    from ndvi_etl_pipeline_spark.sources import stac_datasource

    stac_datasource.register(spark)
    items = (
        spark.read.format("stac_catalog")
        .option("path", _write_catalog(tmp_path))
        .load()
    )
    scenes = stac.select_scenes(
        items, "2022-06-01", "2022-06-30", max_cloud_cover=10.0
    ).collect()
    ids = [r.scene_id for r in scenes]
    assert ids == [
        "LC08_L2SP_189017_20220606_02_T1",
        "LC09_L2SP_189018_20220614_02_T1",
    ]
    assert scenes[0].red_href == "https://x/b4a.tif"
    assert scenes[0].nir_href == "https://x/b5a.tif"


def test_stac_datasource_streams_incrementally(spark, tmp_path):
    """readStream.format('stac_catalog'): batch 1 delivers the initial
    catalog, files added later arrive in the next trigger exactly once
    (lexicographic high-watermark offsets)."""
    import json

    from ndvi_etl_pipeline_spark.sources import stac_datasource

    stac_datasource.register(spark)
    d = tmp_path / "cat"
    d.mkdir()
    (d / "a_item.json").write_text(json.dumps(FIXTURE_ITEMS[0]))
    (d / "b_item.json").write_text(json.dumps(FIXTURE_ITEMS[1]))

    stream = (
        spark.readStream.format("stac_catalog").option("path", str(d)).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stac_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r["id"] for r in spark.sql("SELECT id FROM t_stac_stream").collect()}
        assert got1 == {FIXTURE_ITEMS[0]["id"], FIXTURE_ITEMS[1]["id"]}

        (d / "c_item.json").write_text(json.dumps(FIXTURE_ITEMS[4]))
        q.processAllAvailable()
        rows = spark.sql("SELECT id FROM t_stac_stream").collect()
        assert len(rows) == 3  # exactly once — no redelivery of a/b
        assert {r["id"] for r in rows} == got1 | {FIXTURE_ITEMS[4]["id"]}
    finally:
        q.stop()


def test_stac_datasource_to_fetch_pipeline(spark, tmp_path):
    """Full source tier offline: stac_catalog scan → select_scenes →
    distributed fetch (fake fetcher) → completeness gate. The two
    selected scenes fetch both bands and survive; the gate output maps
    scene → local band paths ready for the decode tier."""
    from ndvi_etl_pipeline_spark.sources import stac_datasource
    from ndvi_etl_pipeline_spark.sources.stac import (
        complete_scenes,
        fetch_assets,
        select_scenes,
    )

    stac_datasource.register(spark)
    items = (
        spark.read.format("stac_catalog")
        .option("path", _write_catalog(tmp_path))
        .load()
    )
    scenes = select_scenes(items, "2022-06-01", "2022-06-30", max_cloud_cover=10.0)

    out_dir = tmp_path / "bands"
    out_dir.mkdir()

    def fetcher(href, path):
        with open(path, "wb") as fh:
            fh.write(b"x" * 2_000_000)
        return 2_000_000, "image/tiff"

    fetched = fetch_assets(scenes, str(out_dir), fetcher=fetcher)
    done = {r.scene_id: r for r in complete_scenes(fetched).collect()}
    assert set(done) == {
        "LC08_L2SP_189017_20220606_02_T1",
        "LC09_L2SP_189018_20220614_02_T1",
    }
    for r in done.values():
        assert r.red_path.endswith("_red.tif")
        assert r.nir_path.endswith("_nir.tif")
