"""Manifest lake: a minimal transactional table format on plain
parquet — the snapshot/ACID layer a 100 TB curation store needs under
concurrent writers and long-running readers (the public Delta Lake /
Iceberg design, reduced to its load-bearing core; no proprietary
formats, just parquet data files + JSON manifests).

Layout:
    <table>/data/<commit-uuid>/part-*.parquet   immutable data files
    <table>/_manifests/v<N>.json                snapshot N: live files,
                                                schema, op, row counts

Invariants (the whole correctness story):
- Data files are IMMUTABLE once referenced; every operation writes new
  files and publishes a new manifest. Readers pin a manifest version,
  so a reader started at v3 sees v3 forever (snapshot isolation) while
  writers move the table forward.
- A commit is the O_EXCL creation of `v<N+1>.json` — the filesystem's
  atomic create-if-absent is the whole lock. Two concurrent writers
  race on the same version; the loser gets ConcurrentCommitError and
  retries on top of the winner (optimistic concurrency, Delta's
  protocol).
- DELETE is copy-on-write: only the files that actually contain
  matching rows are rewritten (located via input_file_name()); all
  other files carry over to the new manifest untouched.
- COMPACT rewrites the live set into fewer files without changing
  rows; old versions still reference the old files, so time travel
  keeps working until VACUUM drops manifests (and then deletes data
  files no kept manifest references).

Driver work is manifest-scale (file lists, schema JSON); all row work
is distributed Spark jobs.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first — re-read the
    latest manifest and retry the operation on top of it."""


def _paths(entries) -> list[str]:
    """Manifest file entries → table-relative paths (entries are
    {"path", "stats"} dicts; bare strings accepted defensively)."""
    return [e["path"] if isinstance(e, dict) else e for e in entries]


_OPS = {
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    ">=": lambda c, v: c >= v,
    ">": lambda c, v: c > v,
    "<=": lambda c, v: c <= v,
    "<": lambda c, v: c < v,
}


def _file_may_match(entry, where) -> bool:
    """Can this file contain rows satisfying ALL (col, op, value)
    conjuncts? False only when the manifest min/max PROVES emptiness —
    missing stats always keep the file (correctness over skipping)."""
    stats = entry.get("stats") if isinstance(entry, dict) else None
    if not stats:
        return True
    for col, op, val in where:
        rng = stats.get(col)
        if not rng or rng[0] is None or rng[1] is None:
            continue
        mn, mx = rng
        if op in ("==", "=") and not (mn <= val <= mx):
            return False
        if op == ">=" and mx < val:
            return False
        if op == ">" and mx <= val:
            return False
        if op == "<=" and mn > val:
            return False
        if op == "<" and mn >= val:
            return False
    return True


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _latest_version(path: str) -> int | None:
    mdir = _manifest_dir(path)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(path: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(path), f"v{version}.json")) as fh:
        return json.load(fh)


def _commit(path: str, version: int, manifest: dict) -> None:
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    target = os.path.join(mdir, f"v{version}.json")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise ConcurrentCommitError(
            f"version {version} already committed at {path}"
        ) from exc
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh, indent=1)


_STATS_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.StringType, T.DateType, T.BooleanType,
)


def _json_safe(v):
    return v if isinstance(v, (int, float, str, bool)) or v is None else str(v)


def _write_data_files(df: DataFrame, path: str) -> list[dict]:
    """Write df's rows as immutable parquet files under a fresh
    commit-scoped subdir; return manifest entries
    [{"path": rel, "stats": {col: [min, max]}}, ...]. Per-file column
    min/max (orderable scalar columns only) is the file-skipping
    index: lake_read prunes files whose range provably misses a
    predicate — Iceberg's manifest-stats design, the lever that makes
    a 100 TB table readable without scanning it. Stats cost one
    grouped aggregate over the just-written files."""
    commit_id = uuid.uuid4().hex[:12]
    out = os.path.join(path, "data", commit_id)
    df.write.mode("error").parquet(out)
    rel = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".parquet"):
            rel.append(os.path.join("data", commit_id, f))
    stat_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _STATS_TYPES)
    ]
    stats_by_file: dict[str, dict] = {}
    if rel and stat_cols:
        spark = df.sparkSession
        aggs = []
        for c in stat_cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        strip = F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
        per_file = (
            spark.read.parquet(out)
            .groupBy(strip.alias("src_file"))
            .agg(*aggs)
            .collect()
        )
        for r in per_file:
            stats_by_file[os.path.basename(r["src_file"])] = {
                c: [_json_safe(r[f"mn_{c}"]), _json_safe(r[f"mx_{c}"])]
                for c in stat_cols
            }
    return [
        {"path": p, "stats": stats_by_file.get(os.path.basename(p), {})}
        for p in rel
    ]


def _schema_compatible(old: T.StructType, new: T.StructType) -> bool:
    by_name = {f.name: f.dataType for f in old.fields}
    return all(
        f.name not in by_name or f.dataType == by_name[f.name] for f in new.fields
    )


def lake_write(df: DataFrame, path: str, mode: str = "append") -> int:
    """Append or overwrite as ONE atomic snapshot commit; returns the
    new version. Appends may ADD columns (schema evolution by union —
    old files simply lack the column and read as NULL); changing an
    existing column's type is rejected."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    latest = _latest_version(path)
    prev = _read_manifest(path, latest) if latest is not None else None
    if prev is not None and mode == "append":
        old_schema = T.StructType.fromJson(prev["schema"])
        if not _schema_compatible(old_schema, df.schema):
            raise ValueError(
                "append would change an existing column's type — "
                "rewrite via overwrite instead"
            )
    n_rows = df.count()
    files = _write_data_files(df, path)
    live = files if (mode == "overwrite" or prev is None) else prev["files"] + files
    if prev is not None and mode == "append":
        old_schema = T.StructType.fromJson(prev["schema"])
        merged = T.StructType(
            list(old_schema.fields)
            + [f for f in df.schema.fields if f.name not in old_schema.fieldNames()]
        )
    else:
        merged = df.schema
    version = 0 if latest is None else latest + 1
    _commit(
        path,
        version,
        {
            "version": version,
            "op": mode,
            "ts": time.time(),
            "files": live,
            "schema": merged.jsonValue(),
            "n_rows_delta": n_rows,
        },
    )
    return version


def lake_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: list[tuple] | None = None,
) -> DataFrame:
    """Read snapshot `version` (default: latest). The manifest pins the
    exact file set, so concurrent writers never tear a read; absent
    columns (pre-evolution files) read as NULL via the manifest
    schema.

    `where` is an optional conjunction of (column, op, value) with op
    in ==/>=/>/<=/< — applied EXACTLY (as a real filter) after
    manifest-stats FILE SKIPPING: files whose per-column min/max
    proves no row can match never enter the scan at all. At 100 TB
    this is the difference between reading a table and reading a
    sliver of it (Iceberg's manifest-pruning design); the row filter
    on the surviving files also pushes down into parquet row groups
    as usual."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    v = latest if version is None else version
    m = _read_manifest(path, v)
    schema = T.StructType.fromJson(m["schema"])
    entries = m["files"]
    if where:
        entries = [e for e in entries if _file_may_match(e, where)]
    if not entries:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(path, f) for f in _paths(entries)]
    df = spark.read.schema(schema).parquet(*paths)
    if where:
        for col, op, val in where:
            df = df.filter(_OPS[op](F.col(col), val))
    return df


def lake_history(path: str) -> list[dict]:
    latest = _latest_version(path)
    if latest is None:
        return []
    out = []
    for v in range(latest + 1):
        try:
            m = _read_manifest(path, v)
        except FileNotFoundError:
            continue  # vacuumed
        out.append(
            {
                "version": v,
                "op": m["op"],
                "n_files": len(m["files"]),
                "n_rows_delta": m.get("n_rows_delta"),
            }
        )
    return out


def lake_delete(spark: SparkSession, path: str, predicate) -> int:
    """Copy-on-write DELETE: rewrite ONLY the files containing rows
    matching `predicate` (a Column), carry every other file over
    unchanged, publish one new snapshot. Returns the new version."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    m = _read_manifest(path, latest)
    schema = T.StructType.fromJson(m["schema"])
    full = {
        os.path.abspath(os.path.join(path, e["path"] if isinstance(e, dict) else e)): e
        for e in m["files"]
    }
    if not full:
        return latest
    df = spark.read.schema(schema).parquet(*full).withColumn(
        "__file", F.input_file_name()
    )
    # normalize the file:///-URI prefix input_file_name carries
    strip = F.regexp_replace("__file", "^file:(//)?", "")
    hit_files = {
        r.f for r in df.filter(predicate).select(strip.alias("f")).distinct().collect()
    }
    # map back to manifest entries (input_file_name gives absolute)
    rewritten = [e for abs_, e in full.items() if abs_ in hit_files]
    if not rewritten:
        return latest  # nothing matched: no new snapshot needed
    keep = [e for abs_, e in full.items() if abs_ not in hit_files]
    rewritten_rel = _paths(rewritten)
    survivors = (
        spark.read.schema(schema)
        .parquet(*[os.path.join(path, r) for r in rewritten_rel])
        .filter(~predicate)
    )
    new_files = _write_data_files(survivors, path) if survivors.count() else []
    version = latest + 1
    _commit(
        path,
        version,
        {
            "version": version,
            "op": "delete",
            "ts": time.time(),
            "files": keep + new_files,
            "schema": m["schema"],
            "n_rows_delta": None,
            "rewrote_files": rewritten_rel,
        },
    )
    return version


def lake_merge(
    spark: SparkSession, updates: DataFrame, path: str, keys: tuple[str, ...]
) -> int:
    """MERGE (upsert by key) as ONE atomic snapshot: files containing
    rows whose key appears in `updates` are rewritten WITHOUT those
    rows (copy-on-write, same file-pruning as lake_delete), the
    updates append as new files, and everything publishes in a single
    manifest commit — matched rows replaced, unmatched inserted,
    readers never see the intermediate state. Returns the new
    version.

    The key-set broadcast bounds the rewrite scan (a semi-join per
    file); at warehouse scale this is Delta's MERGE with the update
    side small — the common CDC shape."""
    latest = _latest_version(path)
    if latest is None:
        lake_write(updates, path)
        return 0
    m = _read_manifest(path, latest)
    schema = T.StructType.fromJson(m["schema"])
    if not _schema_compatible(schema, updates.schema):
        raise ValueError("merge would change an existing column's type")
    full = {
        os.path.abspath(os.path.join(path, e["path"] if isinstance(e, dict) else e)): e
        for e in m["files"]
    }
    key_df = updates.select(*keys).distinct()
    keep, rewritten_rel = list(full.values()), []
    new_files: list[dict] = []
    if full:
        df = spark.read.schema(schema).parquet(*full).withColumn(
            "__file", F.input_file_name()
        )
        strip = F.regexp_replace("__file", "^file:(//)?", "")
        hits = df.join(F.broadcast(key_df), list(keys), "left_semi")
        hit_files = {r.f for r in hits.select(strip.alias("f")).distinct().collect()}
        rewritten_rel = _paths([e for abs_, e in full.items() if abs_ in hit_files])
        keep = [e for abs_, e in full.items() if abs_ not in hit_files]
        if rewritten_rel:
            survivors = (
                spark.read.schema(schema)
                .parquet(*[os.path.join(path, r) for r in rewritten_rel])
                .join(F.broadcast(key_df), list(keys), "left_anti")
            )
            if survivors.count():
                new_files += _write_data_files(survivors, path)
    n_up = updates.count()
    new_files += _write_data_files(updates, path)
    merged_schema = T.StructType(
        list(schema.fields)
        + [f for f in updates.schema.fields if f.name not in schema.fieldNames()]
    )
    version = latest + 1
    _commit(
        path,
        version,
        {
            "version": version,
            "op": "merge",
            "ts": time.time(),
            "files": keep + new_files,
            "schema": merged_schema.jsonValue(),
            "n_rows_delta": n_up,
            "rewrote_files": rewritten_rel,
        },
    )
    return version


def lake_compact(spark: SparkSession, path: str, num_files: int = 1) -> int:
    """Rewrite the live file set into `num_files` files (same rows,
    one new snapshot). Old snapshots keep referencing the old files —
    time travel is unaffected until vacuum."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    m = _read_manifest(path, latest)
    df = lake_read(spark, path, latest).coalesce(num_files)
    files = _write_data_files(df, path)
    version = latest + 1
    _commit(
        path,
        version,
        {
            "version": version,
            "op": "compact",
            "ts": time.time(),
            "files": files,
            "schema": m["schema"],
            "n_rows_delta": 0,
        },
    )
    return version


def lake_vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop all but the last `keep_last` manifests, then delete every
    data file no kept manifest references. Returns deleted files.
    (The destructive end of the lifecycle — time travel shrinks to the
    kept window, exactly like Delta's VACUUM.)"""
    latest = _latest_version(path)
    if latest is None:
        return []
    keep_from = max(0, latest - keep_last + 1)
    kept_files: set[str] = set()
    for v in range(keep_from, latest + 1):
        try:
            kept_files.update(_paths(_read_manifest(path, v)["files"]))
        except FileNotFoundError:
            continue
    deleted = []
    for v in range(keep_from):
        mf = os.path.join(_manifest_dir(path), f"v{v}.json")
        if os.path.exists(mf):
            os.remove(mf)
    data_root = os.path.join(path, "data")
    for commit_dir in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        for f in sorted(os.listdir(cdir)):
            rel = os.path.join("data", commit_dir, f)
            if f.endswith(".parquet") and rel not in kept_files:
                os.remove(os.path.join(cdir, f))
                deleted.append(rel)
    return deleted
