"""Commit conflict classification (round-6 verdict #5): a loser whose
read/write file set is provably disjoint from every winner commit
REBASES its prepared manifest onto the winner's snapshot and commits
WITHOUT re-executing its row work — Delta's conflict checker under
WriteSerializable. Non-disjoint or key-based races still re-run from
the winner's snapshot, exactly as before.

The races here are deterministic: the loser's first `_latest_version`
call is patched one version stale, so it executes against the
pre-winner snapshot and collides at commit time — the exact sequence
a real two-writer race produces, without sleeps or threads."""

import contextlib

import pyspark.sql.functions as F
import pytest

import ndvi_etl_pipeline_spark.sources.lake as L
from ndvi_etl_pipeline_spark.sources.lake import (
    CONFLICT_STATS,
    lake_delete,
    lake_merge,
    lake_read,
    lake_update,
    lake_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


@contextlib.contextmanager
def stale_first_read(monkeypatch, skip: int = 0):
    """The (skip+1)-th `_latest_version` call returns one version
    stale — the loser plans against the pre-winner snapshot. `skip`
    jumps over calls made OUTSIDE the op's once() body (lake_merge's
    existence probe)."""
    real = L._latest_version
    state = {"n": 0}

    def patched(path):
        v = real(path)
        state["n"] += 1
        if state["n"] == skip + 1:
            return None if v is None or v == 0 else v - 1
        return v

    monkeypatch.setattr(L, "_latest_version", patched)
    try:
        yield
    finally:
        monkeypatch.setattr(L, "_latest_version", real)


def _snap():
    return dict(CONFLICT_STATS)


def test_disjoint_cow_deletes_commit_without_reexecution(spark, tmp_path, monkeypatch):
    """Two partition-disjoint COW deletes: the loser's hit file is
    untouched by the winner, so it rebases — exactly ONE execution
    each (the round-6 'done' criterion)."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(i, "lo") for i in range(5)]).coalesce(1), t)    # file A
    lake_write(_df(spark, [(i, "hi") for i in range(10, 15)]).coalesce(1), t)  # file B
    lake_delete(spark, t, F.col("k") == 1)  # winner rewrites file A (v2)
    before = _snap()
    with stale_first_read(monkeypatch):
        # loser plans against v1, hits only file B, collides at v2
        lake_delete(spark, t, F.col("k") == 12)
    after = _snap()
    assert after["rebased"] == before["rebased"] + 1
    assert after["reexecuted"] == before["reexecuted"]
    got = {(r.k, r.v) for r in lake_read(spark, t).collect()}
    assert got == {(i, "lo") for i in range(5) if i != 1} | {
        (i, "hi") for i in range(10, 15) if i != 12
    }


def test_disjoint_dv_deletes_rebase_and_compose(spark, tmp_path, monkeypatch):
    """dv-delete vs dv-delete on different files: both DV sets land,
    the loser without re-running its address scan."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(i, "a") for i in range(4)]).coalesce(1), t)
    lake_write(_df(spark, [(i, "b") for i in range(10, 14)]).coalesce(1), t)
    lake_delete(spark, t, F.col("k") == 0, strategy="dv")  # winner
    before = _snap()
    with stale_first_read(monkeypatch):
        lake_delete(spark, t, F.col("k") == 11, strategy="dv")
    after = _snap()
    assert after["rebased"] == before["rebased"] + 1
    assert after["reexecuted"] == before["reexecuted"]
    got = {r.k for r in lake_read(spark, t).collect()}
    assert got == {1, 2, 3, 10, 12, 13}
    m = L._read_manifest(t, L._latest_version(t))
    assert len(m["dvs"]) == 2  # both DV sets on the final snapshot


def test_overlapping_deletes_still_reexecute(spark, tmp_path, monkeypatch):
    """Same-file race: the winner rewrote the file the loser read —
    classification refuses, the loser re-runs from the winner's
    snapshot, and BOTH predicates apply (no lost update)."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(i, "x") for i in range(6)]).coalesce(1), t)
    lake_delete(spark, t, F.col("k") == 1)  # winner rewrites the file
    before = _snap()
    with stale_first_read(monkeypatch):
        lake_delete(spark, t, F.col("k") == 2)
    after = _snap()
    assert after["reexecuted"] == before["reexecuted"] + 1
    assert after["rebased"] == before["rebased"]
    assert {r.k for r in lake_read(spark, t).collect()} == {0, 3, 4, 5}


def test_merge_reprobes_after_concurrent_append(spark, tmp_path, monkeypatch):
    """Key-based op vs append: a concurrent insert of rows the merge
    should have replaced must be re-probed (append_safe=False) — the
    WriteSerializable blind-append exemption does NOT apply to
    upserts. The re-run sees the appended key and replaces it."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a")]).coalesce(1), t)
    lake_write(_df(spark, [(2, "winner")]).coalesce(1), t)  # the append
    before = _snap()
    with stale_first_read(monkeypatch, skip=1):  # skip the existence probe
        lake_merge(spark, _df(spark, [(2, "merged")]), t, keys=("k",))
    after = _snap()
    assert after["reexecuted"] == before["reexecuted"] + 1
    got = {(r.k, r.v) for r in lake_read(spark, t).collect()}
    assert got == {(1, "a"), (2, "merged")}  # no duplicate key 2


def test_predicate_delete_rebases_past_blind_append(spark, tmp_path, monkeypatch):
    """Predicate op vs blind append: WriteSerializable lets the
    delete commit without re-running even though the appended rows
    match its predicate — serialized loser-then-winner, the appended
    rows survive (Delta's semantics)."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "old"), (2, "old")]).coalesce(1), t)
    lake_write(_df(spark, [(3, "new")]).coalesce(1), t)  # winner append
    before = _snap()
    with stale_first_read(monkeypatch):
        lake_delete(spark, t, F.col("k") >= 2)  # planned pre-append: hits k=2 only
    after = _snap()
    assert after["rebased"] == before["rebased"] + 1
    got = {(r.k, r.v) for r in lake_read(spark, t).collect()}
    assert got == {(1, "old"), (3, "new")}


def test_mor_update_rebases_past_disjoint_cow_delete(spark, tmp_path, monkeypatch):
    """MoR UPDATE vs a COW delete on a different file: the preimage
    addresses point at files the winner never touched — rebase, DV
    list merged, CDF intact."""
    from ndvi_etl_pipeline_spark.sources.lake import lake_read_cdf

    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    lake_write(_df(spark, [(10, "x"), (11, "y")]).coalesce(1), t)
    lake_delete(spark, t, F.col("k") == 10)  # winner rewrites file 2
    before = _snap()
    with stale_first_read(monkeypatch):
        lake_update(
            spark, t, {"v": F.upper(F.col("v"))}, F.col("k") <= 2,
            strategy="mor",
        )
    after = _snap()
    assert after["rebased"] == before["rebased"] + 1
    got = {(r.k, r.v) for r in lake_read(spark, t).collect()}
    assert got == {(1, "A"), (2, "B"), (11, "y")}
    v = L._latest_version(t)
    feed = lake_read_cdf(spark, t, v - 1, v).collect()
    assert {(r.k, r.v, r._change_type) for r in feed} == {
        (1, "a", "delete"), (2, "b", "delete"),
        (1, "A", "insert"), (2, "B", "insert"),
    }


def test_rebase_reapplies_compacts_dv_drops(spark, tmp_path, monkeypatch):
    """Partial compact vs a blind append: the compact materialized a
    DV into its rewrite and DROPPED the now-fully-dangling DV dir —
    the rebase must NOT reinstate that dir from the winner's carried
    copy (bounded read-amplification contract survives the race)."""
    from ndvi_etl_pipeline_spark.sources.lake import lake_compact

    t = str(tmp_path / "t")
    lake_write(_df(spark, [(i, "a") for i in range(4)]).coalesce(1), t)
    lake_write(_df(spark, [(i, "b") for i in range(10, 14)]).coalesce(1), t)
    lake_delete(spark, t, F.col("k") == 0, strategy="dv")  # DV on file A
    m = L._read_manifest(t, L._latest_version(t))
    assert m.get("dvs"), "setup: dv-delete must leave a DV dir"
    rel_a = next(
        L._entry_rel(e) for e in m["files"]
        if 0 in {r.k for r in spark.read.parquet(f"{t}/{L._entry_rel(e)}").collect()}
    )
    lake_write(_df(spark, [(20, "c")]).coalesce(1), t)  # winner append
    before = _snap()
    with stale_first_read(monkeypatch):
        lake_compact(spark, t, num_files=1, paths=(rel_a,))
    after = _snap()
    assert after["rebased"] == before["rebased"] + 1
    assert after["reexecuted"] == before["reexecuted"]
    final = L._read_manifest(t, L._latest_version(t))
    assert not final.get("dvs"), (
        "rebase reinstated the DV dir the partial compact dropped"
    )
    got = {(r.k, r.v) for r in lake_read(spark, t).collect()}
    assert got == {(i, "a") for i in range(1, 4)} | {
        (i, "b") for i in range(10, 14)
    } | {(20, "c")}


def test_rebase_loop_is_bounded(spark, tmp_path, monkeypatch):
    """A loser that keeps losing the version race even after every
    winner classifies as disjoint must terminate: the rebase loop is
    capped at _MAX_COMMIT_ATTEMPTS, falls back to _retry_cow's
    re-execute path, and that bound surfaces ConcurrentCommitError."""
    t = str(tmp_path / "t")
    lake_write(_df(spark, [(1, "a"), (2, "b")]).coalesce(1), t)
    monkeypatch.setattr(L, "_MAX_COMMIT_ATTEMPTS", 2)

    def always_lose(path, version, manifest):
        raise L._CommitConflict("forced perpetual race")

    monkeypatch.setattr(L, "_commit", always_lose)
    monkeypatch.setattr(L, "_backoff", lambda a: 0.0)
    with pytest.raises(L.ConcurrentCommitError, match="lost the commit race"):
        lake_delete(spark, t, F.col("k") == 1)
