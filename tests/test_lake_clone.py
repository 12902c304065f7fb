"""Shallow CLONE (lake_clone): zero-copy metadata-only table copy —
readable, independently writable, vacuum-safe on both sides."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from ndvi_etl_pipeline_spark.sources.lake import (
    lake_clone,
    lake_compact,
    lake_delete,
    lake_read,
    lake_read_cdf,
    lake_tag,
    lake_update,
    lake_vacuum,
    lake_write,
)


@pytest.fixture()
def lake_ds(spark):
    from ndvi_etl_pipeline_spark.sources import lake_datasource as LDS

    LDS.register(spark)
    return spark


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _data_files(table):
    return glob.glob(os.path.join(table, "data", "**", "*.parquet"), recursive=True)


def test_clone_is_zero_copy_and_reads_snapshot(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lake_write(_df(spark, [(1, "a"), (2, "b")]), src)
    lake_write(_df(spark, [(3, "c")]), src)
    lake_tag(src, "rel", version=0)
    assert lake_clone(spark, src, dst) == 0
    assert {r.k for r in lake_read(spark, dst).collect()} == {1, 2, 3}
    assert _data_files(dst) == []  # zero bytes copied
    # clone a pinned version by TAG into a second target
    dst0 = str(tmp_path / "dst0")
    lake_clone(spark, src, dst0, version="rel")
    assert {r.k for r in lake_read(spark, dst0).collect()} == {1, 2}
    with pytest.raises(FileExistsError, match="already a lake table"):
        lake_clone(spark, src, dst)
    # CDF over the clone: the creating commit is all inserts
    feed = lake_read_cdf(spark, dst0, -1).collect()
    assert {(r.k, r._change_type) for r in feed} == {
        (1, "insert"), (2, "insert"),
    }


def test_clone_writes_never_touch_source(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lake_write(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), src)
    src_files = set(_data_files(src))
    lake_clone(spark, src, dst)
    lake_write(_df(spark, [(9, "z")]).coalesce(1), dst)  # append → dst
    lake_update(spark, dst, {"v": F.lit("U")}, F.col("k") == 1)  # COW → dst
    lake_delete(spark, dst, F.col("k") == 2)  # COW rewrite → dst
    assert {(r.k, r.v) for r in lake_read(spark, dst).collect()} == {
        (1, "U"), (9, "z"),
    }
    # the source: same files on disk, same rows visible
    assert set(_data_files(src)) == src_files
    assert {(r.k, r.v) for r in lake_read(spark, src).collect()} == {
        (1, "a"), (2, "b"),
    }


def test_clone_carries_dvs_and_partitions(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.createDataFrame(
        [(1, "us", "a"), (2, "eu", "b"), (3, "eu", "c")],
        "k int, region string, v string",
    )
    lake_write(df, src, partition_by=("region",))
    lake_delete(spark, src, F.col("k") == 2, strategy="dv")
    lake_clone(spark, src, dst)
    assert {(r.k, r.region) for r in lake_read(spark, dst).collect()} == {
        (1, "us"), (3, "eu"),  # dv-deleted row stays invisible
    }
    # partition pruning works through absolute clone entries
    pruned = lake_read(spark, dst, where=[("region", "=", "eu")])
    assert {r.k for r in pruned.collect()} == {3}


def test_clone_vacuum_is_fenced_both_ways(spark, tmp_path):
    """Densify the clone (compact into its own files), vacuum it with
    zero retention: the superseded CLONED references must NOT delete
    the source's files."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lake_write(_df(spark, [(1, "a")]).coalesce(1), src)
    lake_write(_df(spark, [(2, "b")]).coalesce(1), src)
    src_files = set(_data_files(src))
    lake_clone(spark, src, dst)
    lake_compact(spark, dst, num_files=1)  # densify: clone owns files now
    assert len(_data_files(dst)) == 1
    lake_vacuum(dst, keep_last=1, retention_seconds=0)
    assert set(_data_files(src)) == src_files  # source untouched
    assert {r.k for r in lake_read(spark, dst).collect()} == {1, 2}
    assert {r.k for r in lake_read(spark, src).collect()} == {1, 2}


def test_clone_through_datasource_and_sql(lake_ds, tmp_path):
    from ndvi_etl_pipeline_spark.sources.lake_sql import lake_sql

    spark = lake_ds
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lake_write(_df(spark, [(1, "a"), (2, "b")]), src)
    lake_clone(spark, src, dst)
    got = spark.read.format("lake").option("path", dst).load().collect()
    assert {r.k for r in got} == {1, 2}
    r = lake_sql(
        spark, "SELECT count(*) AS n FROM c", {"c": dst}
    ).collect()[0]
    assert r.n == 2


def test_clone_cdf_through_datasource(lake_ds, tmp_path):
    """The DataSource CDF read must treat a clone's creating commit
    as inserts, matching lake_read_cdf."""
    spark = lake_ds
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lake_write(_df(spark, [(1, "a"), (2, "b")]), src)
    lake_clone(spark, src, dst)
    feed = (
        spark.read.format("lake")
        .option("path", dst)
        .option("cdf", "true")
        .option("fromVersion", "-1")
        .load()
        .collect()
    )
    assert {(r.k, r._change_type) for r in feed} == {
        (1, "insert"), (2, "insert"),
    }


def test_write_audit_publish_via_adopt(spark, tmp_path):
    """The WAP loop: clone prod, mutate + audit the clone while prod
    serves reads untouched, adopt atomically; pre-publish history
    stays time-travelable, and compaction localizes the adopted
    cross-dir references."""
    from ndvi_etl_pipeline_spark.sources.lake import lake_adopt

    prod, staging = str(tmp_path / "prod"), str(tmp_path / "st")
    lake_write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), prod)
    lake_clone(spark, prod, staging)
    # the risky change happens on staging
    lake_update(spark, staging, {"v": F.upper(F.col("v"))}, F.col("k") <= 2)
    lake_delete(spark, staging, F.col("k") == 3)
    # audit the staging state; prod is untouched meanwhile
    assert {(r.k, r.v) for r in lake_read(spark, staging).collect()} == {
        (1, "A"), (2, "B"),
    }
    assert {(r.k, r.v) for r in lake_read(spark, prod).collect()} == {
        (1, "a"), (2, "b"), (3, "c"),
    }
    v = lake_adopt(spark, prod, staging)
    assert {(r.k, r.v) for r in lake_read(spark, prod).collect()} == {
        (1, "A"), (2, "B"),
    }
    # pre-publish prod history intact
    assert {r.v for r in lake_read(spark, prod, version=v - 1).collect()} == {
        "a", "b", "c",
    }
    # localize: compaction pulls the adopted rows into prod's own files
    lake_compact(spark, prod, num_files=1)
    import glob as _glob
    import os as _os

    own = _glob.glob(_os.path.join(prod, "data", "**", "*.parquet"), recursive=True)
    assert own and {
        (r.k, r.v) for r in lake_read(spark, prod).collect()
    } == {(1, "A"), (2, "B")}


def test_adopt_unshared_file_resolution(spark, tmp_path):
    """Files the clone still SHARES with the source resolve back to
    table-relative entries (no pointless self-reference through the
    clone dir); only clone-written files stay absolute."""
    import os as _os

    from ndvi_etl_pipeline_spark.sources.lake import _read_manifest, lake_adopt

    prod, staging = str(tmp_path / "prod"), str(tmp_path / "st")
    lake_write(_df(spark, [(1, "a")]).coalesce(1), prod)
    lake_write(_df(spark, [(2, "b")]).coalesce(1), prod)
    lake_clone(spark, prod, staging)
    lake_write(_df(spark, [(9, "z")]).coalesce(1), staging)  # clone-owned
    v = lake_adopt(spark, prod, staging)
    m = _read_manifest(prod, v)
    rels = [e["path"] for e in m["files"]]
    assert sum(1 for p in rels if not _os.path.isabs(p)) == 2  # shared: local
    assert sum(1 for p in rels if _os.path.isabs(p)) == 1  # clone-owned
    assert {r.k for r in lake_read(spark, prod).collect()} == {1, 2, 9}


def test_adopt_translates_dv_addresses(spark, tmp_path):
    """Second-review regression: a clone's DV rows address files in
    the CLONE's entry form; adopt must rewrite them into the source's
    form or dv-deleted rows silently resurrect on publish."""
    from ndvi_etl_pipeline_spark.sources.lake import lake_adopt

    prod, staging = str(tmp_path / "prod"), str(tmp_path / "st")
    lake_write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), prod)
    lake_clone(spark, prod, staging)
    # dv-delete on SHARED files (clone addresses them absolutely) and
    # on a clone-owned file (clone-relative address)
    lake_write(_df(spark, [(9, "z"), (10, "y")]).coalesce(1), staging)
    lake_delete(spark, staging, F.col("k").isin([2, 10]), strategy="dv")
    assert {r.k for r in lake_read(spark, staging).collect()} == {1, 3, 9}
    v = lake_adopt(spark, prod, staging)
    assert {r.k for r in lake_read(spark, prod).collect()} == {1, 3, 9}
    # compaction materializes the adopted DVs, not the raw files
    lake_compact(spark, prod, num_files=1)
    assert {r.k for r in lake_read(spark, prod).collect()} == {1, 3, 9}
    # pre-adopt prod unchanged
    assert {r.k for r in lake_read(spark, prod, version=v - 1).collect()} == {
        1, 2, 3,
    }


def test_clone_cdf_applies_source_dvs(lake_ds, tmp_path):
    """A clone of a dv-carrying source must NOT emit the dv-deleted
    rows as inserts in its change feed — library and DataSource CDF
    agree, and the multiset compose rule holds."""
    spark = lake_ds
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    lake_write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]).coalesce(1), src)
    lake_delete(spark, src, F.col("k") == 2, strategy="dv")
    lake_clone(spark, src, dst)
    feed = lake_read_cdf(spark, dst, -1).collect()
    assert {(r.k, r._change_type) for r in feed} == {
        (1, "insert"), (3, "insert"),
    }
    ds_feed = (
        spark.read.format("lake")
        .option("path", dst)
        .option("cdf", "true")
        .option("fromVersion", "-1")
        .load()
        .collect()
    )
    assert {(r.k, r._change_type) for r in ds_feed} == {
        (1, "insert"), (3, "insert"),
    }
