"""Named snapshot refs (Iceberg-style TAGS): creation CAS, resolution
through every version-taking API and the SQL text, and the vacuum
anchor — a tagged snapshot outlives the history drop."""

import pyspark.sql.functions as F
import pytest

from ndvi_etl_pipeline_spark.sources.lake import (
    lake_delete,
    lake_drop_tag,
    lake_read,
    lake_read_cdf,
    lake_restore,
    lake_tag,
    lake_tags,
    lake_vacuum,
    lake_write,
)
from ndvi_etl_pipeline_spark.sources.lake_sql import lake_sql


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_tag_create_resolve_list_drop(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a")]), t)
    lake_write(_df(spark, [(2, "b")]), t)
    assert lake_tag(t, "first", version=0) == 0
    assert lake_tag(t, "release-1.0") == 1  # default: latest
    assert lake_tags(t) == {"first": 0, "release-1.0": 1}
    assert {r.k for r in lake_read(spark, t, version="first").collect()} == {1}
    assert {r.k for r in lake_read(spark, t, version="release-1.0").collect()} == {1, 2}
    lake_drop_tag(t, "first")
    assert lake_tags(t) == {"release-1.0": 1}
    with pytest.raises(KeyError, match="no tag"):
        lake_read(spark, t, version="first")
    with pytest.raises(KeyError):
        lake_drop_tag(t, "first")


def test_tag_cas_and_replace(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a")]), t)
    lake_write(_df(spark, [(2, "b")]), t)
    lake_tag(t, "rel", version=0)
    with pytest.raises(FileExistsError, match="already exists"):
        lake_tag(t, "rel", version=1)  # fresh-name CAS: loser errors
    assert lake_tags(t)["rel"] == 0
    lake_tag(t, "rel", version=1, replace=True)  # mutable-ref retarget
    assert lake_tags(t)["rel"] == 1
    with pytest.raises(ValueError, match="outside committed history"):
        lake_tag(t, "bad", version=9)
    with pytest.raises(ValueError, match="bad tag name"):
        lake_tag(t, "no spaces", version=0)


def test_tag_in_sql_and_cdf_bounds(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    lake_tag(t, "base")
    lake_write(_df(spark, [(3, "c")]).coalesce(1), t)
    lake_tag(t, "v1.1")
    got = {
        (r.snap, r.k)
        for r in lake_sql(
            spark,
            "SELECT 'b' AS snap, k FROM tbl VERSION AS OF 'base' "
            "UNION ALL SELECT 'n', k FROM tbl VERSION AS OF 'v1.1'",
            {"tbl": t},
        ).collect()
    }
    assert got == {("b", 1), ("b", 2), ("n", 1), ("n", 2), ("n", 3)}
    # CDF between tags: exactly the append in (base, v1.1]
    feed = lake_read_cdf(spark, t, "base", "v1.1").collect()
    assert {(r.k, r._change_type) for r in feed} == {(3, "insert")}
    sql_feed = lake_sql(
        spark,
        "SELECT k, _change_type AS ct FROM table_changes('tbl', 'base', 'v1.1')",
        {"tbl": t},
    ).collect()
    assert {(r.k, r.ct) for r in sql_feed} == {(3, "insert")}


def test_restore_by_tag(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a")]), t)
    lake_tag(t, "good")
    lake_write(_df(spark, [(9, "oops")]), t, mode="overwrite")
    v = lake_restore(t, "good")
    assert v == 2
    assert {r.k for r in lake_read(spark, t).collect()} == {1}


def test_vacuum_keeps_tagged_snapshot_readable(spark, tmp_path):
    """The anchor property: a tagged snapshot BELOW the vacuum keep
    window keeps its delta segment, gets its own checkpoint, and its
    files survive orphan collection — readable after the drop.
    Untagged history of the same age is gone."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)   # v0
    lake_delete(spark, t, F.col("k") == 1)                        # v1 (cow)
    lake_tag(t, "audited", version=1)
    lake_write(_df(spark, [(3, "c")]).coalesce(1), t)             # v2
    lake_write(_df(spark, [(4, "d")]).coalesce(1), t)             # v3
    lake_vacuum(t, keep_last=1, retention_seconds=0)
    # tagged v1 still reads exactly its snapshot
    assert {r.k for r in lake_read(spark, t, version="audited").collect()} == {2}
    # latest unaffected
    assert {r.k for r in lake_read(spark, t).collect()} == {2, 3, 4}
    # untagged v0 is gone
    with pytest.raises(Exception):
        lake_read(spark, t, version=0).collect()
    # dropping the tag lets the NEXT vacuum reclaim it
    lake_drop_tag(t, "audited")
    lake_vacuum(t, keep_last=1, retention_seconds=0)
    with pytest.raises(Exception):
        lake_read(spark, t, version="audited")


def test_timestamp_as_of(spark, tmp_path):
    """TIMESTAMP AS OF: the last version committed at-or-before the
    instant; ISO strings and epoch floats; SQL idiom; too-early
    timestamps fail honestly."""
    import time as _time
    from datetime import datetime, timezone

    from ndvi_etl_pipeline_spark.sources.lake import lake_version_at

    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a")]), t)
    t0 = _time.time()
    _time.sleep(0.05)
    lake_write(_df(spark, [(2, "b")]), t)
    _time.sleep(0.05)
    t1 = _time.time()
    lake_write(_df(spark, [(3, "c")]), t)

    assert lake_version_at(t, t0) == 0
    assert lake_version_at(t, t1) == 1
    assert lake_version_at(t, _time.time() + 10) == 2
    iso = datetime.fromtimestamp(t1, tz=timezone.utc).isoformat()
    assert {r.k for r in lake_read(spark, t, timestamp=iso).collect()} == {1, 2}
    got = lake_sql(
        spark,
        f"SELECT count(*) AS n FROM tbl TIMESTAMP AS OF '{iso}'",
        {"tbl": t},
    ).collect()[0]
    assert got.n == 2
    with pytest.raises(ValueError, match="no snapshot at or before"):
        lake_version_at(t, t0 - 1000)
    with pytest.raises(ValueError, match="not both"):
        lake_read(spark, t, version=1, timestamp=t1)
