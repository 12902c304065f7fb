"""Partition-spec EVOLUTION (sources/lake.py): change a table's
partition layout as a metadata-only commit (Iceberg's versioned
partition specs). Old files keep their layout forever; new writes lay
out under the current spec; planning prunes each file with ITS OWN
spec; reads union the per-spec populations; compaction migrates data
to the current spec as a side effect of rewriting.

The 100-TB motivation: the layout that was right at 1 TB (identity on
a low-cardinality column) is wrong at 100 TB (needs day(ts) or
bucket(N, key)), and rewriting the table to change it is the one
thing a 100-TB table can never afford."""

import pytest
from pyspark.sql import functions as F

import ndvi_etl_pipeline_spark.sources.lake as L
from ndvi_etl_pipeline_spark.sources.lake import (
    lake_alter_partition_spec,
    lake_compact,
    lake_delete,
    lake_merge,
    lake_read,
    lake_read_cdf,
    lake_write,
)


def _df(spark, rows, schema="k int, cat string, v string"):
    return spark.createDataFrame(rows, schema)


def _pruned(t, where, version=None):
    """(kept_paths, total) after per-entry-spec manifest pruning."""
    m = L._read_manifest(t, L._latest_version(t) if version is None else version)
    specs = L._partition_specs(m)
    pw = L._phys_where(where, m)
    kept = [
        e
        for e in m["files"]
        if L._file_may_match(e, pw, L._entry_part_by(e, specs))
    ]
    return kept, len(m["files"])


def test_alter_spec_is_metadata_only_and_appends_history(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(1, "a", "x"), (2, "b", "y")]), t, partition_by=("cat",)
    )
    files_before = {e["path"] for e in L._read_manifest(t, 0)["files"]}
    v = lake_alter_partition_spec(t, ("bucket(4, k)",))
    m = L._read_manifest(t, v)
    assert m["op"] == "alter_partition_spec"
    assert {e["path"] for e in m["files"]} == files_before  # zero rewrites
    assert m["partition_specs"] == [["cat"], ["bucket(4, k)"]]
    assert m["partition_by"] == ["bucket(4, k)"]
    # re-declaring the current spec is a no-op (no new snapshot)
    assert lake_alter_partition_spec(t, ("bucket(4, k)",)) == v


def test_mixed_populations_read_and_prune_per_spec(spark, tmp_path):
    """identity(cat) files + bucket(4,k) files in one table: the full
    read unions both populations; a predicate on cat prunes the
    identity population by dir value, a predicate on k prunes the
    bucket population by transform — each file judged by ITS spec."""
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(1, "a", "x1"), (2, "b", "x2")]).repartition(1),
        t,
        partition_by=("cat",),
    )
    lake_alter_partition_spec(t, ("bucket(4, k)",))
    lake_write(
        _df(spark, [(10, "a", "y1"), (11, "b", "y2")]).repartition(1), t
    )
    m = L._read_manifest(t, L._latest_version(t))
    sids = sorted({e.get("spec", 0) for e in m["files"]})
    assert sids == [0, 1]  # both populations live, stamped correctly
    got = sorted((r.k, r.cat, r.v) for r in lake_read(spark, t).collect())
    assert got == [
        (1, "a", "x1"),
        (2, "b", "x2"),
        (10, "a", "y1"),
        (11, "b", "y2"),
    ]
    # identity pruning still works on the OLD population: cat == 'a'
    # keeps both bucket files (their spec says nothing about cat, but
    # their stats might prune) and exactly the cat=a identity file
    kept, total = _pruned(t, [("cat", "==", "a")])
    old_kept = [e for e in kept if e.get("spec", 0) == 0]
    assert len(old_kept) == 1
    # transform pruning works on the NEW population: k == 10 prunes
    # bucket files whose bucket value can't match
    got = sorted(
        r.k for r in lake_read(spark, t, where=[("k", "==", 10)]).collect()
    )
    assert got == [10]
    # rows are right under BOTH predicates (exact filter after pruning)
    got = sorted(
        r.k for r in lake_read(spark, t, where=[("cat", "==", "a")]).collect()
    )
    assert got == [1, 10]


def test_evolve_identity_to_identity_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(1, "a", "x")]).coalesce(1), t, partition_by=("cat",)
    )
    v0 = L._latest_version(t)
    lake_alter_partition_spec(t, ("v",))
    lake_write(_df(spark, [(2, "b", "y")]).coalesce(1), t)
    # time travel BEFORE the evolution sees the old layout only
    old = lake_read(spark, t, version=v0)
    assert [(r.k, r.cat, r.v) for r in old.collect()] == [(1, "a", "x")]
    got = sorted(r.k for r in lake_read(spark, t).collect())
    assert got == [1, 2]
    # the v-identity population prunes on v by dir value
    kept, total = _pruned(t, [("v", "==", "y")])
    new_kept = [e for e in kept if e.get("spec", 0) == 1]
    assert len(new_kept) == 1 and total == 2


def test_evolve_to_unpartitioned_and_back(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(1, "a", "x")]).coalesce(1), t, partition_by=("cat",)
    )
    lake_alter_partition_spec(t, ())
    lake_write(_df(spark, [(2, "b", "y")]).coalesce(1), t)
    m = L._read_manifest(t, L._latest_version(t))
    assert "partition_by" not in m
    assert m["partition_specs"] == [["cat"], []]
    lake_alter_partition_spec(t, ("truncate(10, cat)",))
    lake_write(_df(spark, [(3, "c", "z")]).coalesce(1), t)
    m = L._read_manifest(t, L._latest_version(t))
    assert m["partition_specs"] == [["cat"], [], ["truncate(10, cat)"]]
    assert sorted({e.get("spec", 0) for e in m["files"]}) == [0, 1, 2]
    got = sorted(r.k for r in lake_read(spark, t).collect())
    assert got == [1, 2, 3]


def test_dml_and_cdf_across_spec_change(spark, tmp_path):
    """DELETE/MERGE keep working across the boundary, rewrites land
    under the CURRENT spec, and CDF diffs cleanly across the
    metadata-only alter commit."""
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(i, "ab"[i % 2], f"v{i}") for i in range(6)]).coalesce(1),
        t,
        partition_by=("cat",),
    )
    v_before = L._latest_version(t)
    lake_alter_partition_spec(t, ("bucket(2, k)",))
    lake_delete(spark, t, F.col("k") == 0, strategy="dv")
    lake_merge(
        spark,
        _df(spark, [(1, "b", "UPD"), (100, "a", "NEW")]),
        t,
        keys=("k",),
    )
    got = {r.k: r.v for r in lake_read(spark, t).collect()}
    assert got == {1: "UPD", 2: "v2", 3: "v3", 4: "v4", 5: "v5", 100: "NEW"}
    m = L._read_manifest(t, L._latest_version(t))
    # every rewritten/new file carries the current spec id
    assert all(
        e.get("spec", 0) == 1
        for e in m["files"]
        if e["path"] not in {x["path"] for x in L._read_manifest(t, v_before)["files"]}
    )
    # CDF across the whole range (alter commit contributes no rows)
    cdf = lake_read_cdf(spark, t, from_version=v_before)
    types = {r["_change_type"] for r in cdf.collect()}
    assert types <= {"insert", "delete", "update_preimage", "update_postimage"}


def test_compact_migrates_to_current_spec(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(i, "ab"[i % 2], f"v{i}") for i in range(4)]).coalesce(1),
        t,
        partition_by=("cat",),
    )
    lake_alter_partition_spec(t, ("bucket(2, k)",))
    v = lake_compact(spark, t, num_files=1)
    m = L._read_manifest(t, v)
    assert all(e.get("spec", 0) == 1 for e in m["files"])  # migrated
    # after migration the table is single-population again and the
    # bucket transform prunes point lookups
    kept, total = _pruned(t, [("k", "==", 1)])
    assert len(kept) < total or total == 1
    got = sorted(r.k for r in lake_read(spark, t).collect())
    assert got == [0, 1, 2, 3]


def test_append_with_stale_explicit_layout_refuses(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a", "x")]), t, partition_by=("cat",))
    lake_alter_partition_spec(t, ("bucket(4, k)",))
    with pytest.raises(ValueError, match="partition_by"):
        lake_write(
            _df(spark, [(2, "b", "y")]), t, partition_by=("cat",)
        )


def test_alter_spec_validation(spark, tmp_path):
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a", "x")]), t)
    with pytest.raises(ValueError, match="not in schema"):
        lake_alter_partition_spec(t, ("nope",))
    with pytest.raises(ValueError, match="date/timestamp"):
        lake_alter_partition_spec(t, ("day(cat)",))
    with pytest.raises(ValueError, match="mix identity and transform"):
        lake_alter_partition_spec(t, ("cat", "bucket(4, k)"))


def test_spec_history_survives_checkpoint_and_spark_planning(
    spark, tmp_path, monkeypatch
):
    """Checkpoints reconstruct per-entry spec ids (the `extra` JSON
    column) and the Spark planning path stays exact on multi-spec
    tables: its partition branches are disabled (part__ NULLs are
    ambiguous there) but the driver re-check prunes per entry."""
    monkeypatch.setattr(L, "LAKE_CHECKPOINT_INTERVAL", 2)
    monkeypatch.setattr(L, "LAKE_SPARK_PLAN_MIN_FILES", 0)
    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(1, "a", "x")]).coalesce(1), t, partition_by=("cat",)
    )
    lake_alter_partition_spec(t, ("bucket(4, k)",))
    for i in range(2, 5):
        lake_write(_df(spark, [(i, "b", f"y{i}")]).coalesce(1), t)
    got = sorted(
        r.k for r in lake_read(spark, t, where=[("k", ">=", 3)]).collect()
    )
    assert got == [3, 4]
    got_all = sorted(r.k for r in lake_read(spark, t).collect())
    assert got_all == [1, 2, 3, 4]
    # entries reconstructed from the checkpoint still carry spec ids
    m = L._read_manifest(t, L._latest_version(t))
    assert sorted({e.get("spec", 0) for e in m["files"]}) == [0, 1]


def test_maintain_migrates_old_spec_files(spark, tmp_path):
    """lake_maintain(migrate_spec=True) compacts exactly the files
    still laid out under an OLD spec — the table converges to the
    current layout at maintenance cadence; an already-converged table
    publishes nothing."""
    from ndvi_etl_pipeline_spark.sources.lake import lake_maintain

    t = str(tmp_path / "t")
    lake_write(
        _df(spark, [(i, "ab"[i % 2], f"v{i}") for i in range(4)]).coalesce(1),
        t,
        partition_by=("cat",),
    )
    lake_alter_partition_spec(t, ("bucket(2, k)",))
    lake_write(_df(spark, [(10, "c", "w")]).coalesce(1), t)
    new_file = {
        e["path"]
        for e in L._read_manifest(t, L._latest_version(t))["files"]
        if e.get("spec", 0) == 1
    }
    vs = lake_maintain(spark, t, migrate_spec=True)
    assert len(vs) == 1
    m = L._read_manifest(t, vs[0])
    assert all(e.get("spec", 0) == 1 for e in m["files"])  # converged
    assert new_file <= {e["path"] for e in m["files"]}  # untouched carry
    got = sorted(r.k for r in lake_read(spark, t).collect())
    assert got == [0, 1, 2, 3, 10]
    assert lake_maintain(spark, t, migrate_spec=True) == []  # idempotent


def test_out_of_range_spec_id_raises_not_clamps(spark, tmp_path):
    """A manifest entry stamped with a spec index the manifest's
    partition_specs list doesn't contain is corruption (or a newer
    format version) — reinterpreting the file under spec 0's layout
    could silently prune or misread rows, so planning must refuse."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a", "x")]).coalesce(1), t, partition_by=("cat",))
    with pytest.raises(ValueError, match="partition spec 7"):
        L._entry_spec_id({"path": "p", "spec": 7}, 1)
    # negative ids are equally out of range
    with pytest.raises(ValueError, match="partition spec -1"):
        L._entry_spec_id({"path": "p", "spec": -1}, 1)
    # in-range and unstamped entries are untouched
    assert L._entry_spec_id({"path": "p"}, 1) == 0
    assert L._entry_spec_id({"path": "p", "spec": 0}, 1) == 0
