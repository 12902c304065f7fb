"""Manifest lake: a minimal transactional table format on plain
parquet — the snapshot/ACID layer a 100 TB curation store needs under
concurrent writers and long-running readers (the public Delta Lake /
Iceberg design, reduced to its load-bearing core; no proprietary
formats, just parquet data files + JSON manifests).

Layout:
    <table>/data/<commit-uuid>/part-*.parquet   immutable data files
    <table>/data/<commit-uuid>/col=val/...      (partitioned tables)
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
  the operation RETRIES automatically on top of the winner (optimistic
  concurrency, Delta's protocol): appends re-merge the file list
  (append vs append is always disjoint — the data files are already on
  disk and immutable, only the manifest re-publishes), while
  delete/merge/compact RE-RUN from the winner's snapshot, because the
  winner may have added files the copy-on-write pruning never scanned.
  Data files from a lost attempt are unreferenced orphans; vacuum
  collects them after the retention window.
- DELETE is copy-on-write by default: only the files that actually
  contain matching rows are rewritten (located via the scan's
  _metadata file path); all other files carry over to the new manifest
  untouched. With strategy="dv" it is merge-on-read instead: NO data
  file is rewritten — the deleted rows' (file, row-ordinal) addresses
  are written as a parquet deletion-vector set under <table>/dv/ and
  every read anti-joins the broadcast DV relation (Delta/Iceberg-v2
  position deletes). COMPACT materializes DVs and clears them.
- COMPACT rewrites the live set into fewer files without changing
  rows; old versions still reference the old files, so time travel
  keeps working until VACUUM drops manifests (and then deletes data
  files no kept manifest references — but never files younger than
  the retention window, which would corrupt an in-flight writer's
  not-yet-committed snapshot).
- Partitioned tables (lake_write(..., partition_by=...)) lay files
  out hive-style under the commit dir; the partition VALUES are
  recorded per file in the manifest, so lake_read prunes on them
  exactly (Iceberg identity-partition pruning) even though the
  columns are not stored inside the parquet files. Reads recover the
  partition columns via one basePath-scoped scan per commit dir.
- Partition TRANSFORMS (bucket(N,col), truncate(W,col), day/month/
  year(col)) give Iceberg-style HIDDEN partitioning: the layout keys
  on a derived dir column, the source column stays in the data, and
  a `where` on the source column prunes files by applying the same
  transform to the predicate value — equality/in for buckets,
  ranges too for the order-preserving transforms.
- Per-file BLOOM filters (lake_write(..., bloom_cols=...)) prune
  equality/IN point lookups on high-entropy key columns that min/max
  ranges cannot (a fingerprint column's per-file range spans the
  whole domain) — 1 KiB per file per column in the manifest,
  inherited by appends and rebuilt by COW rewrites.

Driver work is manifest-scale (file lists, schema JSON); all row work
is distributed Spark jobs.
"""

from __future__ import annotations

import functools as _functools
import json
import os
import re
import time
import uuid
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Files younger than this are never vacuumed even when unreferenced —
#: they may belong to a writer that has staged data but not yet
#: committed its manifest (Delta's VACUUM retention, scaled to the
#: single-host deployment; pass retention_seconds=0 only when no
#: writer can be active).
DEFAULT_VACUUM_RETENTION = 3600.0

#: Commit-race retries. Each retry is manifest-scale work for appends
#: (re-read + re-publish, no data rewritten), so the budget is set for
#: MANY genuinely concurrent writers: with N appenders racing, one
#: writer can lose up to ~N×(commits each) times before its turn.
#: Delta's equivalent budget is similarly generous.
_MAX_COMMIT_ATTEMPTS = 20
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


class ConcurrentCommitError(RuntimeError):
    """Another writer published this version first. Raised by the
    low-level _commit primitive on every lost race (as the
    _CommitConflict subclass, which the operations' bounded retry
    loops consume internally) and by the public operations only when
    the retry loop is exhausted — the table is moving faster than the
    operation can re-run."""


def _fs_path(name: str) -> str:
    """input_file_name() value → decoded absolute filesystem path.
    Spark returns a percent-encoded file: URI (a table path containing
    a space arrives as %20), so a raw string compare against
    os.path.abspath silently never matches — decode first."""
    if name.startswith("file:"):
        name = urlparse(name).path
    return os.path.abspath(unquote(name))


def _entry_rel(e) -> str:
    """One manifest file entry → its table-relative path."""
    return e["path"] if isinstance(e, dict) else e


def _paths(entries) -> list[str]:
    """Manifest file entries → table-relative paths (entries are
    {"path", "stats"} dicts; bare strings accepted defensively)."""
    return [_entry_rel(e) for e in entries]


_OPS = {
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    ">=": lambda c, v: c >= v,
    ">": lambda c, v: c > v,
    "<=": lambda c, v: c <= v,
    "<": lambda c, v: c < v,
    "in": lambda c, v: c.isin(list(v)),
}


def _cmp(op: str, left, right) -> bool:
    if op in ("==", "="):
        return left == right
    if op == ">=":
        return left >= right
    if op == ">":
        return left > right
    if op == "<=":
        return left <= right
    return left < right  # "<"


# --- partition transforms (Iceberg-style hidden partitioning) ------------
#
# partition_by entries are either a bare column name (identity — hive
# layout on the column itself, value recovered from the dir name) or a
# TRANSFORM over a source column:
#
#     bucket(N, col)    crc32(string(col)) mod N — equality/in pruning
#     truncate(W, col)  ints: (col div W)*W; strings: first W chars —
#                       equality + range pruning (order-preserving)
#     day(col) / month(col) / year(col)
#                       calendar truncation of a date/timestamp to an
#                       ISO string — equality + range pruning (ISO
#                       strings are order-preserving at one granularity)
#
# A transform partitions the LAYOUT on a derived dir column while the
# source column stays inside the data files, so reads need no
# dir-value recovery and a `where` on the SOURCE column prunes files
# by applying the same transform to the predicate value (the whole
# point of hidden partitioning: callers never mention the transform).
# The bucket hash is crc32-of-string — deliberately reproducible on
# both the JVM (F.crc32) and the Python pruning side (zlib.crc32), at
# the cost of documenting that bucket columns should be int/string
# (float string forms differ between engines).

_TRANSFORM_RE = re.compile(r"^(bucket|truncate|day|month|year)\((?:(\d+)\s*,\s*)?([A-Za-z_]\w*)\)$")


def _parse_partition_spec(spec: str):
    """spec → (kind, param, source_col, dir_col). Identity specs are
    (identity, None, col, col)."""
    m = _TRANSFORM_RE.match(spec.strip())
    if not m:
        if not re.match(r"^[A-Za-z_]\w*$", spec.strip()):
            raise ValueError(f"bad partition spec {spec!r}")
        c = spec.strip()
        return ("identity", None, c, c)
    kind, param, col = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if not param:
            raise ValueError(f"{kind} needs a numeric parameter: {spec!r}")
        param = int(param)
        if param <= 0:
            raise ValueError(f"{kind} parameter must be positive: {spec!r}")
    elif param:
        raise ValueError(f"{kind} takes no parameter: {spec!r}")
    return (kind, param, col, f"{col}__{kind}{param or ''}")


def _transform_column(df: DataFrame, kind: str, param, col: str):
    """The Spark-side derived dir column for a transform spec."""
    if kind == "bucket":
        return F.pmod(F.crc32(F.col(col).cast("string")), F.lit(param))
    if kind == "truncate":
        dt = df.schema[col].dataType
        if isinstance(dt, T.StringType):
            return F.substring(F.col(col), 1, param)
        return (F.floor(F.col(col) / F.lit(param)) * F.lit(param)).cast("long")
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}[kind]
    return F.date_format(F.col(col), fmt)


def _transform_value(kind: str, param, val):
    """Apply the same transform to a predicate value on the Python
    side (for manifest pruning). Returns None when the value can't be
    transformed faithfully — the caller keeps the file."""
    import datetime
    import zlib

    if kind == "bucket":
        if isinstance(val, bool) or not isinstance(val, (int, str)):
            return None  # floats/dates: string forms differ across engines
        return zlib.crc32(str(val).encode()) % param
    if kind == "truncate":
        if isinstance(val, str):
            return val[:param]
        if isinstance(val, bool) or not isinstance(val, int):
            return None
        return (val // param) * param
    if isinstance(val, datetime.datetime):
        d = val
    elif isinstance(val, datetime.date):
        d = datetime.datetime(val.year, val.month, val.day)
    elif isinstance(val, str):
        try:
            d = datetime.datetime.fromisoformat(val[:19])
        except ValueError:
            return None
    else:
        return None
    if kind == "day":
        return d.strftime("%Y-%m-%d")
    if kind == "month":
        return d.strftime("%Y-%m")
    return d.strftime("%Y")


def _transform_prunes(kind: str, param, parts_val: str | None, op: str, val) -> bool:
    """True when the transform PROVES this file cannot match
    (col, op, val). Buckets prune equality only; truncate and the
    calendar transforms are order-preserving, so ranges prune too."""
    if parts_val is None:
        return False
    if op == "in":
        tv = [_transform_value(kind, param, v) for v in val]
        if any(t is None for t in tv):
            return False
        return not any(
            _partition_value_matches(parts_val, "==", t) for t in tv
        )
    t = _transform_value(kind, param, val)
    if t is None:
        return False
    if op in ("==", "="):
        return not _partition_value_matches(parts_val, "==", t)
    if kind == "bucket":
        return False  # hash buckets carry no order
    # order-preserving transforms: file value f, predicate value t.
    # col > val  can only match files with f >= t (truncation loses
    # the sub-unit offset, so the boundary unit must be kept) — and
    # symmetrically for the other inequalities.
    return not _partition_value_matches(
        parts_val, op + "=" if op in (">", "<") else op, t
    )


# --- per-file Bloom filters (point-lookup file skipping) ------------------
#
# min/max ranges cannot prune high-entropy keys (a fingerprint or id
# column's per-file range spans the whole domain), so equality/IN
# lookups degenerate to full-table scans. A small per-file Bloom
# filter in the manifest — Iceberg puts them in parquet, Delta in the
# checkpoint — makes "find these K keys among N files" read only the
# files that may contain them. m=8192 bits (1 KiB) / k=4 gives a
# ~2.4% false-positive rate at ~1.2k distinct keys per file; false
# positives only cost an extra file read, never correctness. The hash
# is crc32 over "<i>|<string form>" so the JVM build side (F.crc32)
# and the Python pruning side (zlib.crc32) agree — bloom columns are
# therefore restricted to int/string (float string forms differ).

_BLOOM_M = 8192
_BLOOM_K = 4


@_functools.lru_cache(maxsize=1 << 16)
def _bloom_positions_py(val, m: int = _BLOOM_M, k: int = _BLOOM_K) -> tuple[int, ...]:
    import zlib

    return tuple(
        zlib.crc32(f"{i}|{val}".encode()) % m for i in range(k)
    )


@_functools.lru_cache(maxsize=256)
def _bloom_bits(b64: str) -> bytes:
    import base64

    return base64.b64decode(b64)


def _bloom_may_contain(bloom: dict, val) -> bool:
    bits = _bloom_bits(bloom["bits"])
    m = int(bloom.get("m", _BLOOM_M))
    k = int(bloom.get("k", _BLOOM_K))
    return all(
        (bits[pos >> 3] >> (pos & 7)) & 1
        for pos in _bloom_positions_py(val, m, k)
    )


def _partition_value_matches(raw: str | None, op: str, val) -> bool:
    """Exact pruning on a hive partition-dir value. The stored value
    is a string (or None for the hive null dir); cast it to the
    predicate value's type before comparing. Any cast doubt keeps the
    file (correctness over skipping)."""
    if raw is None:
        return False  # NULL satisfies no comparison predicate
    try:
        if isinstance(val, bool):
            typed = raw.lower() in ("true", "1")
        elif isinstance(val, int):
            typed = int(raw)
        elif isinstance(val, float):
            typed = float(raw)
        else:
            typed = raw
    except (TypeError, ValueError):
        return True
    try:
        return _cmp(op, typed, val)
    except TypeError:
        return True


def _file_may_match(entry, where, partition_by: tuple[str, ...] = ()) -> bool:
    """Can this file contain rows satisfying ALL (col, op, value)
    conjuncts? False only when the manifest PROVES emptiness — from
    the exact partition value when the column is a partition column,
    from a partition TRANSFORM applied to the predicate value when the
    layout is transform-partitioned (hidden partitioning — the
    predicate references the SOURCE column), else from the per-file
    min/max stats. Missing stats always keep the file, and NaN bounds
    keep the file too: every comparison with NaN is False, so a NaN
    max would otherwise "prove" emptiness for a file that may hold
    matching non-NaN rows."""
    if not isinstance(entry, dict):
        return True
    parts = entry.get("partitions") or {}
    stats = entry.get("stats") or {}
    bloom = entry.get("bloom") or {}
    transforms: dict[str, list] = {}
    for sp in partition_by:
        kind, param, col, dcol = _parse_partition_spec(sp)
        if kind != "identity":
            transforms.setdefault(col, []).append((kind, param, dcol))
    for col, op, val in where:
        bl = bloom.get(col)
        if bl:
            if op in ("==", "=") and not _bloom_may_contain(bl, val):
                return False
            if op == "in" and not any(_bloom_may_contain(bl, v) for v in val):
                return False
        for kind, param, dcol in transforms.get(col, ()):
            if _transform_prunes(kind, param, parts.get(dcol), op, val):
                return False
        if col in parts:
            if op == "in":
                if not any(
                    _partition_value_matches(parts[col], "==", v) for v in val
                ):
                    return False
            elif not _partition_value_matches(parts[col], op, val):
                return False
            continue
        rng = stats.get(col)
        if not rng or rng[0] is None or rng[1] is None:
            continue
        mn, mx = rng
        if mn != mn or mx != mx:  # NaN bound: stats prove nothing
            continue
        if op == "in" and not any(mn <= v <= mx for v in val):
            return False
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


def _backoff(attempt: int) -> float:
    """Linear backoff with random jitter: concurrent losers of the
    same race must NOT retry in lockstep, or they re-collide on every
    round until the budget runs out."""
    import random

    return 0.01 * (attempt + 1) * (0.5 + random.random())


class _CommitConflict(ConcurrentCommitError):
    """Internal: lost the O_EXCL race on ONE version — re-read the
    latest manifest and try again (bounded by _MAX_COMMIT_ATTEMPTS)."""


def _commit(path: str, version: int, manifest: dict) -> None:
    mdir = _manifest_dir(path)
    os.makedirs(mdir, exist_ok=True)
    target = os.path.join(mdir, f"v{version}.json")
    try:
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as exc:
        raise _CommitConflict(
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


def _partition_values(rel: str) -> dict[str, str | None]:
    """Parse `col=val` segments out of a table-relative file path
    (hive layout under data/<commit>/). Values are percent-decoded;
    the hive null dir maps to None."""
    out: dict[str, str | None] = {}
    for seg in rel.split(os.sep)[2:-1]:  # skip data/<commit>/, drop filename
        if "=" in seg:
            col, _, raw = seg.partition("=")
            out[col] = None if raw == _HIVE_NULL else unquote(raw)
    return out


def _spec_info(partition_by: tuple[str, ...]):
    """Parse a partition_by tuple; reject identity/transform mixing
    (identity layouts need dir-value recovery, transform layouts keep
    every real column in the data files — one table uses one read
    path)."""
    specs = [_parse_partition_spec(sp) for sp in partition_by]
    kinds = {k for k, _p, _c, _d in specs}
    if "identity" in kinds and len(kinds) > 1:
        raise ValueError(
            "cannot mix identity and transform partition specs in one table"
        )
    return specs, bool(kinds - {"identity"})


def _write_data_files(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    bloom_cols: tuple[str, ...] = (),
) -> list[dict]:
    """Write df's rows as immutable parquet files under a fresh
    commit-scoped subdir; return manifest entries
    [{"path": rel, "stats": {col: [min, max]}, "partitions": {...}}].
    Per-file column min/max (orderable scalar columns only) is the
    file-skipping index: lake_read prunes files whose range provably
    misses a predicate — Iceberg's manifest-stats design, the lever
    that makes a 100 TB table readable without scanning it. Stats cost
    one grouped aggregate over the just-written files. Partitioned
    writes additionally record each file's exact partition-dir values
    for identity/transform pruning; transform specs (bucket/truncate/
    day/month/year) partition the LAYOUT on a derived dir column while
    the source column stays in the data."""
    commit_id = uuid.uuid4().hex[:12]
    out = os.path.join(path, "data", commit_id)
    wdf = df
    dir_cols: list[str] = []
    if partition_by:
        specs, has_transform = _spec_info(tuple(partition_by))
        for kind, param, col, dcol in specs:
            dir_cols.append(dcol)
            if kind != "identity":
                wdf = wdf.withColumn(dcol, _transform_column(df, kind, param, col))
    w = wdf.write.mode("error")
    if dir_cols:
        w = w.partitionBy(*dir_cols)
    w.parquet(out)
    rel = []
    for root, _dirs, names in os.walk(out):
        for f in sorted(names):
            if f.endswith(".parquet"):
                rel.append(
                    os.path.relpath(os.path.join(root, f), path)
                )
    rel.sort()
    stat_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _STATS_TYPES) and f.name not in dir_cols
    ]
    stats_by_file: dict[str, dict] = {}
    if rel and stat_cols:
        spark = df.sparkSession
        aggs = []
        for c in stat_cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        per_file = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("src_file"))
            .agg(*aggs)
            .collect()
        )
        # key stats by TABLE-RELATIVE path, never basename: partitioned
        # writes reuse part-<n>-<uuid> basenames across partition dirs,
        # so a basename key silently collapses different files' stats
        for r in per_file:
            relp = os.path.relpath(_fs_path(r["src_file"]), os.path.abspath(path))
            stats_by_file[relp] = {
                c: [_json_safe(r[f"mn_{c}"]), _json_safe(r[f"mx_{c}"])]
                for c in stat_cols
            }
    bloom_by_file: dict[str, dict] = {}
    if rel and bloom_cols:
        import base64

        spark = df.sparkSession
        for c in bloom_cols:
            if c not in df.columns:
                continue  # schema evolution: entries without the column
                # carry no bloom and are always kept (correctness)
            dt = df.schema[c].dataType
            if not isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)
            ):
                raise ValueError(
                    f"bloom column {c!r} must be int/string (cross-engine "
                    "string form)"
                )
            pos_arr = F.array(
                *[
                    F.pmod(
                        F.crc32(
                            F.concat(F.lit(f"{i}|"), F.col(c).cast("string"))
                        ),
                        F.lit(_BLOOM_M),
                    )
                    for i in range(_BLOOM_K)
                ]
            )
            per_file_pos = (
                spark.read.parquet(out)
                .where(F.col(c).isNotNull())
                .select(
                    F.input_file_name().alias("src_file"),
                    F.explode(pos_arr).alias("pos"),
                )
                .distinct()  # bounded: <= m positions per file
                .groupBy("src_file")
                .agg(F.collect_set("pos").alias("ps"))
                .collect()
            )
            for r in per_file_pos:
                relp = os.path.relpath(
                    _fs_path(r["src_file"]), os.path.abspath(path)
                )
                bits = bytearray(_BLOOM_M // 8)
                for pos in r["ps"]:
                    bits[pos >> 3] |= 1 << (pos & 7)
                bloom_by_file.setdefault(relp, {})[c] = {
                    "m": _BLOOM_M,
                    "k": _BLOOM_K,
                    "bits": base64.b64encode(bytes(bits)).decode(),
                }
    entries = []
    for p in rel:
        e = {"path": p, "stats": stats_by_file.get(p, {})}
        if dir_cols:
            e["partitions"] = _partition_values(p)
        if bloom_cols:
            e["bloom"] = bloom_by_file.get(p, {})
        entries.append(e)
    return entries


#: Reserved column names DV bookkeeping rides on; user tables must
#: not use them (asserted at dv-delete time).
_DV_FILE, _DV_POS = "__dv_file", "__dv_pos"
_DV_SCHEMA = f"{_DV_FILE} string, {_DV_POS} bigint"


def _dv_meta_cols(path: str):
    """(table-relative decoded file path, row ordinal) Columns from
    the parquet scan's hidden _metadata struct — the executor-side
    twin of _fs_path: file_path arrives percent-encoded ('+' is NOT
    form-encoded by Hadoop, so pre-escape it before url_decode treats
    it as a space)."""
    fp = F.col("_metadata.file_path")
    decoded = F.url_decode(F.regexp_replace(fp, r"\+", "%2B"))
    no_scheme = F.regexp_replace(decoded, "^file:(//)?", "")
    prefix = os.path.abspath(path) + os.sep
    rel = F.substring(no_scheme, len(prefix) + 1, 1 << 30)
    return rel, F.col("_metadata.row_index")


def _read_entries(
    spark: SparkSession, path: str, manifest: dict, entries,
    keep_meta: bool = False,
    apply_dvs: bool = True,
) -> DataFrame:
    """Read a subset of a snapshot's file entries under the manifest
    schema. Partitioned tables need the partition columns recovered
    from the hive dir names, which Spark does per basePath — one
    basePath-scoped scan per commit dir, unioned by name (commit
    count is manifest-scale).

    When the snapshot carries DELETION VECTORS (merge-on-read
    lake_delete), the deleted (file, row-ordinal) pairs are removed
    here — ONE broadcast anti-join, so every consumer (reads, COW
    rewrites, compaction) sees the same visible rows. The DV relation
    is bounded by deletes-since-last-compaction: compaction
    materializes DVs into clean files and clears them.
    `keep_meta=True` additionally exposes the ({_DV_FILE}, {_DV_POS})
    columns of each VISIBLE row — how dv-delete addresses the rows it
    removes."""
    schema = T.StructType.fromJson(manifest["schema"])
    dvs = (manifest.get("dvs") or []) if apply_dvs else []
    want_meta = keep_meta or bool(dvs)
    if not entries:
        out = spark.createDataFrame([], schema)
        if keep_meta:
            out = out.withColumn(_DV_FILE, F.lit(None).cast("string"))
            out = out.withColumn(_DV_POS, F.lit(None).cast("bigint"))
        return out

    def _scan(paths: list[str], base: str | None = None) -> DataFrame:
        r = spark.read.schema(schema)
        if base is not None:
            r = r.option("basePath", base)
        df = r.parquet(*paths)
        if want_meta:
            rel, pos = _dv_meta_cols(path)
            # _metadata is only addressable ON the scan relation —
            # attach before any union
            df = df.select("*", rel.alias(_DV_FILE), pos.alias(_DV_POS))
        return df

    part_by = manifest.get("partition_by") or []
    identity_layout = part_by and all(
        _parse_partition_spec(sp)[0] == "identity" for sp in part_by
    )
    if not identity_layout:
        # unpartitioned OR transform-partitioned: every real column
        # lives inside the data files (transforms partition on derived
        # dir columns) — a plain schema-pinned scan suffices
        out = _scan([os.path.join(path, p) for p in _paths(entries)])
    else:
        groups: dict[str, list[str]] = {}
        for p in _paths(entries):
            segs = p.split(os.sep)
            base = os.path.join(path, segs[0], segs[1])  # data/<commit>
            groups.setdefault(base, []).append(os.path.join(path, p))
        dfs = [
            _scan(files, base) for base, files in sorted(groups.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
    if dvs:
        dv_df = spark.read.schema(_DV_SCHEMA).parquet(
            *[os.path.join(path, d) for d in dvs]
        )
        out = out.join(F.broadcast(dv_df), [_DV_FILE, _DV_POS], "left_anti")
    if want_meta and not keep_meta:
        out = out.drop(_DV_FILE, _DV_POS)
    return out


def _enforce_constraints(df: DataFrame, schema: T.StructType | None, cons: dict) -> None:
    """Refuse a write whose rows violate the table's constraints.
    NOT NULL rejects nulls (including a column the write omits
    entirely — it would read as NULL); CHECK follows SQL semantics
    (violated only when the expression is FALSE; UNKNOWN passes).
    Costs one filtered count over the rows being written — the price
    Delta pays for enforced constraints too."""
    if not cons:
        return
    vdf = df
    if schema is not None:
        for f in schema.fields:
            if f.name not in df.columns:
                vdf = vdf.withColumn(f.name, F.lit(None).cast(f.dataType))
    viol = F.lit(False)
    for c in cons.get("not_null") or []:
        viol = viol | F.col(c).isNull()
    for name, expr in (cons.get("checks") or {}).items():
        viol = viol | ~F.coalesce(F.expr(expr), F.lit(True))
    n = vdf.filter(viol).count()
    if n:
        raise ValueError(
            f"{n} row(s) violate table constraints "
            f"(not_null={cons.get('not_null') or []}, "
            f"checks={sorted((cons.get('checks') or {}))})"
        )


def _schema_compatible(old: T.StructType, new: T.StructType) -> bool:
    by_name = {f.name: f.dataType for f in old.fields}
    return all(
        f.name not in by_name or f.dataType == by_name[f.name] for f in new.fields
    )


def lake_write(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] | None = None,
    bloom_cols: tuple[str, ...] | None = None,
    properties: dict | None = None,
) -> int:
    """Append or overwrite as ONE atomic snapshot commit; returns the
    new version. Appends may ADD columns (schema evolution by union —
    old files simply lack the column and read as NULL); changing an
    existing column's type is rejected. `partition_by` lays files out
    hive-style and records partition values for exact pruning;
    `bloom_cols` records a per-file Bloom filter for point-lookup
    skipping on int/string key columns; omit either on append to
    inherit the table's existing settings.

    Losing the commit race to a concurrent writer retries
    automatically: the data files are already written and immutable,
    and append vs append is always file-disjoint, so the retry only
    re-reads the winner's manifest, re-merges the live-file list, and
    re-publishes at the next version — no data is rewritten (Delta's
    optimistic-append resolution)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode {mode!r}")
    latest = _latest_version(path)
    prev = _read_manifest(path, latest) if latest is not None else None
    prev_part = tuple(prev.get("partition_by") or ()) if prev else ()
    if partition_by is None:
        part_by = prev_part if (prev is not None and mode == "append") else ()
    else:
        part_by = tuple(partition_by)
        if prev is not None and mode == "append" and part_by != prev_part:
            raise ValueError(
                f"append partition_by {part_by} != table layout {prev_part}"
            )
    prev_bloom = tuple(prev.get("bloom_cols") or ()) if prev else ()
    if bloom_cols is None:
        bl_cols = prev_bloom if (prev is not None and mode == "append") else ()
    else:
        bl_cols = tuple(bloom_cols)
    if prev is not None and mode == "append":
        old_schema = T.StructType.fromJson(prev["schema"])
        if not _schema_compatible(old_schema, df.schema):
            raise ValueError(
                "append would change an existing column's type — "
                "rewrite via overwrite instead"
            )
    enforced_cons = prev.get("constraints") if prev is not None else None
    if enforced_cons:
        # constraints are table properties: they survive overwrite
        # (drop them explicitly via lake_alter_constraints)
        _enforce_constraints(
            df, T.StructType.fromJson(prev["schema"]), enforced_cons
        )
    n_rows = df.count()
    files = _write_data_files(df, path, part_by, bl_cols)
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        latest = _latest_version(path)
        prev = _read_manifest(path, latest) if latest is not None else None
        cur_cons = prev.get("constraints") if prev is not None else None
        if cur_cons and cur_cons != enforced_cons:
            # a concurrent ALTER added/changed constraints after our
            # pre-write check: re-validate against the WINNER's rules
            # before publishing (the alter-vs-write conflict Delta
            # resolves the same way) — the data files are already
            # staged, only the validation re-runs
            _enforce_constraints(
                df, T.StructType.fromJson(prev["schema"]), cur_cons
            )
            enforced_cons = cur_cons
        if prev is not None and mode == "append":
            old_schema = T.StructType.fromJson(prev["schema"])
            if not _schema_compatible(old_schema, df.schema):
                raise ValueError(
                    "append would change an existing column's type — "
                    "rewrite via overwrite instead"
                )
            if tuple(prev.get("partition_by") or ()) != part_by:
                raise ValueError(
                    "concurrent writer changed the table's partition layout"
                )
            merged = T.StructType(
                list(old_schema.fields)
                + [
                    f
                    for f in df.schema.fields
                    if f.name not in old_schema.fieldNames()
                ]
            )
            live = prev["files"] + files
            dvs = list(prev.get("dvs") or [])
        else:
            merged = df.schema
            live = files
            dvs = []
        version = 0 if latest is None else latest + 1
        manifest = {
            "version": version,
            "op": mode,
            "ts": time.time(),
            "files": live,
            "schema": merged.jsonValue(),
            "n_rows_delta": n_rows,
        }
        if dvs:
            manifest["dvs"] = dvs
        if properties:
            # commit properties (Delta's userMetadata): application
            # metadata a consumer stamps on its own commits — e.g.
            # the incremental-curation cursor, recoverable from the
            # manifest log alone
            manifest["properties"] = dict(properties)
        if prev is not None and prev.get("constraints"):
            manifest["constraints"] = prev["constraints"]
        if part_by:
            manifest["partition_by"] = list(part_by)
        if bl_cols:
            manifest["bloom_cols"] = list(bl_cols)
        try:
            _commit(path, version, manifest)
            return version
        except _CommitConflict:
            time.sleep(_backoff(attempt))
    raise ConcurrentCommitError(
        f"lost the commit race {_MAX_COMMIT_ATTEMPTS} times at {path}"
    )


def lake_read(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    where: list[tuple] | None = None,
    prune_only: bool = False,
) -> DataFrame:
    """Read snapshot `version` (default: latest). The manifest pins the
    exact file set, so concurrent writers never tear a read; absent
    columns (pre-evolution files) read as NULL via the manifest
    schema.

    `where` is an optional conjunction of (column, op, value) with op
    in ==/>=/>/<=/</in (value is a collection for `in` — the
    bucket-set restriction the streaming near-dup gate prunes its
    admission index with) — applied EXACTLY (as a real filter) after
    manifest FILE SKIPPING: files whose exact partition value or
    per-column min/max proves no row can match never enter the scan at
    all. At 100 TB this is the difference between reading a table and
    reading a sliver of it (Iceberg's manifest-pruning design); the
    row filter on the surviving files also pushes down into parquet
    row groups as usual. `prune_only=True` applies the FILE SKIPPING
    but skips the exact row filter — for callers that re-filter
    exactly themselves (the streaming gates' ledger anti-join passes
    a 10k-value `in` purely to prune files; materializing it as an
    isin() would bloat the plan for rows the join re-checks
    anyway)."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    v = latest if version is None else version
    m = _read_manifest(path, v)
    entries = m["files"]
    if where:
        part_by = tuple(m.get("partition_by") or ())
        entries = [e for e in entries if _file_may_match(e, where, part_by)]
    df = _read_entries(spark, path, m, entries)
    if where and not prune_only:
        for col, op, val in where:
            df = df.filter(_OPS[op](F.col(col), val))
    return df


def lake_read_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CDC-lite incremental read: the rows APPENDED strictly after
    snapshot `from_version` up to and including `to_version` (default
    latest), computed as a manifest diff — only the files new in the
    target snapshot are read, never the table. `from_version=-1`
    means "since before the first commit" (the full target snapshot).

    Incremental reads COMPOSE: for any split points a<b<c over an
    append-only history, changes(a,b) ∪ changes(b,c) == changes(a,c),
    and changes(-1, latest) == lake_read(latest) — the property an
    incremental downstream stage needs to equal its batch twin.

    Every commit in (from, to] must be an append: a delete/merge/
    compact/overwrite rewrites files, so a file-set diff no longer
    means "new rows" (a compaction's files are old rows re-bucketed).
    Those histories raise ValueError — re-read the full snapshot
    instead (the honest boundary). For row-level change feeds across
    dv-delete commits, use lake_read_cdf, which tags inserts AND
    deletes (the deletion-vector sets make row deletes diffable)."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    to_v = latest if to_version is None else to_version
    if from_version > to_v:
        raise ValueError(f"from_version {from_version} > to_version {to_v}")
    to_m = _read_manifest(path, to_v)
    for v in range(max(from_version, -1) + 1, to_v + 1):
        op = _read_manifest(path, v)["op"]
        # alter_constraints republishes an identical file set — safe
        # to diff across; anything that rewrites/deletes files is not
        if op not in ("append", "alter_constraints"):
            raise ValueError(
                f"incremental read undefined across non-append commit "
                f"v{v} ({op}) — re-read the full snapshot instead"
            )
    if from_version < 0:
        old = set()
    else:
        old = set(_paths(_read_manifest(path, from_version)["files"]))
    new_entries = [
        e
        for e in to_m["files"]
        if (e["path"] if isinstance(e, dict) else e) not in old
    ]
    return _read_entries(spark, path, to_m, new_entries)


def lake_read_cdf(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Row-level CHANGE DATA FEED between two snapshots: every row
    appended or dv-deleted in (from, to], tagged with `_change_type`
    ('insert' | 'delete') and `_commit_version` (Delta CDF's shape).
    Deletion vectors make the delete side computable as a manifest
    diff: the DV sets a commit adds address exactly the rows it
    removed (and only rows VISIBLE at the prior version — a dv-delete
    never double-addresses), so the deleted rows' full values are
    recovered by a broadcast semi-join of the raw (pre-DV) scan
    against just the new DV rows. Only the delta files/DVs are read,
    never the table.

    A row inserted then dv-deleted inside the range appears twice
    (insert + delete) — the CDC consumer's compose rule is multiset:
    snapshot(from) + inserts − deletes == snapshot(to).

    MERGE commits emit delete(matched old row) + insert(update row)
    pairs — the manifest records the merge keys and update files, and
    the matched old rows are read from the pre-merge snapshot's
    rewritten files (requires them un-vacuumed; a vacuumed history
    fails honestly). Commits that rewrite files WITHOUT row-change
    metadata (cow delete, compact, overwrite, restore, pre-upgrade
    merges) are refused — their file diff does not mean row changes
    (the honest boundary lake_read_changes draws)."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    to_v = latest if to_version is None else to_version
    if from_version > to_v:
        raise ValueError(f"from_version {from_version} > to_version {to_v}")
    to_m = _read_manifest(path, to_v)
    schema = T.StructType.fromJson(to_m["schema"])
    ct = F.lit("insert")
    out_cols = [f.name for f in schema.fields]
    parts: list[DataFrame] = []
    prev_files: set[str] = set()
    prev_dvs: list[str] = []
    if from_version >= 0:
        fm = _read_manifest(path, from_version)
        prev_files = set(_paths(fm["files"]))
        prev_dvs = list(fm.get("dvs") or [])
    for v in range(max(from_version, -1) + 1, to_v + 1):
        m = _read_manifest(path, v)
        op, strat = m["op"], m.get("strategy")
        if op in ("append", "overwrite") and v == 0 and from_version < 0:
            op = "append"  # the creating commit is all inserts
        if op == "append" or op == "alter_constraints":
            new_entries = [
                e for e in m["files"] if _entry_rel(e) not in prev_files
            ]
            if new_entries:
                # read under the TO-version schema: columns added
                # later in the range surface as NULL (evolution)
                ins = _read_entries(
                    spark, path, {**m, "schema": to_m["schema"]},
                    new_entries, apply_dvs=False,
                ).select(
                    *out_cols,
                    ct.alias("_change_type"),
                    F.lit(v).cast("int").alias("_commit_version"),
                )
                parts.append(ins)
        elif op == "delete" and strat == "dv":
            new_dvs = [d for d in (m.get("dvs") or []) if d not in prev_dvs]
            if new_dvs:
                dv_df = spark.read.schema(_DV_SCHEMA).parquet(
                    *[os.path.join(path, d) for d in new_dvs]
                )
                # restrict the raw scan to the files the new DV rows
                # actually touch (one tiny distinct job, ≤ #files
                # rows) — without this the delete branch would scan
                # the WHOLE snapshot per dv commit
                touched = {
                    r.f
                    for r in dv_df.select(
                        F.col(_DV_FILE).alias("f")
                    ).distinct().collect()
                }
                hit = [e for e in m["files"] if _entry_rel(e) in touched]
                raw = _read_entries(
                    spark, path, {**m, "schema": to_m["schema"]},
                    hit, keep_meta=True, apply_dvs=False,
                )
                dels = raw.join(
                    F.broadcast(dv_df), [_DV_FILE, _DV_POS], "left_semi"
                ).select(
                    *out_cols,
                    F.lit("delete").alias("_change_type"),
                    F.lit(v).cast("int").alias("_commit_version"),
                )
                parts.append(dels)
        elif op == "merge" and m.get("merge_keys") and "update_files" in m:
            # MERGE = delete(matched old rows) + insert(update rows).
            # The update rows live in the recorded update_files; the
            # matched old rows are recovered from the PRE-merge
            # snapshot's rewritten files (still on disk until vacuum;
            # a vacuumed history fails the read honestly) semi-joined
            # on the merge keys. Unmatched rewritten rows moved to
            # survivor files unchanged — no events for them.
            keys = list(m["merge_keys"])
            upd_rel = set(m["update_files"])
            upd_entries = [e for e in m["files"] if _entry_rel(e) in upd_rel]
            upd = _read_entries(
                spark, path, {**m, "schema": to_m["schema"]},
                upd_entries, apply_dvs=False,
            )
            parts.append(
                upd.select(
                    *out_cols,
                    ct.alias("_change_type"),
                    F.lit(v).cast("int").alias("_commit_version"),
                )
            )
            rewrote = set(m.get("rewrote_files") or [])
            if rewrote:
                pm = _read_manifest(path, v - 1)
                old_entries = [
                    e for e in pm["files"] if _entry_rel(e) in rewrote
                ]
                # prev manifest context: its DVs apply (a row deleted
                # before the merge must not re-emit as merge-deleted)
                old = _read_entries(
                    spark, path, {**pm, "schema": to_m["schema"]},
                    old_entries,
                )
                dels = old.join(
                    F.broadcast(upd.select(*keys).distinct()), keys, "left_semi"
                ).select(
                    *out_cols,
                    F.lit("delete").alias("_change_type"),
                    F.lit(v).cast("int").alias("_commit_version"),
                )
                parts.append(dels)
        else:
            raise ValueError(
                f"change feed undefined across file-rewriting commit "
                f"v{v} ({m['op']}) — re-read the full snapshot instead"
            )
        prev_files = set(_paths(m["files"]))
        prev_dvs = list(m.get("dvs") or [])
    if not parts:
        empty = T.StructType(
            list(schema.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.IntegerType()),
            ]
        )
        return spark.createDataFrame([], empty)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lake_latest_version(path: str) -> int | None:
    """Latest committed snapshot version, or None for no table —
    the cursor anchor for incremental (CDC-lite) consumers."""
    return _latest_version(path)


def lake_column_max(path: str, col: str, version: int | None = None):
    """Max of an orderable column across a snapshot computed from
    MANIFEST STATS ALONE — zero data files read, driver work is
    manifest-scale. Returns None when the table is missing, empty, or
    any live file lacks stats for the column (the caller falls back
    to a real scan); NaN bounds also force the fallback. This is how
    an incremental consumer recovers its source-version cursor from
    the derived table itself without scanning it."""
    latest = _latest_version(path)
    if latest is None:
        return None
    m = _read_manifest(path, latest if version is None else version)
    if m.get("dvs"):
        # per-file stats include dv-deleted rows — the max may belong
        # to an invisible row; only a real scan is honest
        return None
    best = None
    for e in m["files"]:
        stats = e.get("stats") if isinstance(e, dict) else None
        rng = (stats or {}).get(col)
        if not rng or rng[1] is None or rng[1] != rng[1]:
            return None  # unknowable from stats: caller must scan
        best = rng[1] if best is None or rng[1] > best else best
    return best


def lake_restore(path: str, version: int) -> int:
    """RESTORE the table to an earlier snapshot AS A NEW COMMIT: the
    target version's file set, schema, DVs, layout, and constraints
    re-publish at latest+1 (Delta RESTORE). History is preserved —
    the bad commits stay inspectable between the two good states, and
    a concurrent reader never sees a rollback tear. Requires the
    target manifest (and its data files) to still exist, i.e. not
    vacuumed. Returns the new version."""

    def once() -> int:
        latest = _latest_version(path)
        if latest is None:
            raise FileNotFoundError(f"no manifest lake at {path}")
        tm = _read_manifest(path, version)
        missing = [
            p
            for p in _paths(tm["files"])
            if not os.path.exists(os.path.join(path, p))
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore to v{version}: {len(missing)} data "
                f"file(s) were vacuumed (first: {missing[0]})"
            )
        new_v = latest + 1
        manifest = {
            "version": new_v,
            "op": "restore",
            "restored_from": version,
            "ts": time.time(),
            "files": tm["files"],
            "schema": tm["schema"],
            "n_rows_delta": None,
        }
        for k in ("dvs", "partition_by", "bloom_cols", "constraints"):
            if tm.get(k):
                manifest[k] = tm[k]
        _commit(path, new_v, manifest)
        return new_v

    return _retry_cow("restore", path, once)


def lake_alter_constraints(
    spark: SparkSession,
    path: str,
    add_checks: dict[str, str] | None = None,
    add_not_null: tuple[str, ...] = (),
    drop_checks: tuple[str, ...] = (),
    drop_not_null: tuple[str, ...] = (),
) -> int:
    """Add/drop table constraints as one commit. Added constraints are
    validated against the CURRENT visible rows first (one scan — the
    ALTER TABLE ADD CONSTRAINT contract: a constraint that doesn't
    hold now is refused, so readers can rely on it holding always);
    subsequent lake_write/lake_merge enforce them on every batch.
    `add_checks` maps constraint name → SQL boolean expression over
    the table's columns (violated only when FALSE — SQL semantics, a
    NULL check passes; pair with not_null to forbid nulls)."""

    def once() -> int:
        latest = _latest_version(path)
        if latest is None:
            raise FileNotFoundError(f"no manifest lake at {path}")
        m = _read_manifest(path, latest)
        cons = {
            "not_null": list((m.get("constraints") or {}).get("not_null") or []),
            "checks": dict((m.get("constraints") or {}).get("checks") or {}),
        }
        for c in drop_not_null:
            if c in cons["not_null"]:
                cons["not_null"].remove(c)
        for name in drop_checks:
            cons["checks"].pop(name, None)
        added = {
            "not_null": [c for c in add_not_null if c not in cons["not_null"]],
            "checks": dict(add_checks or {}),
        }
        cons["not_null"] += added["not_null"]
        cons["checks"].update(added["checks"])
        if added["not_null"] or added["checks"]:
            existing = _read_entries(spark, path, m, m["files"])
            _enforce_constraints(
                existing, T.StructType.fromJson(m["schema"]), added
            )
        if not cons["not_null"] and not cons["checks"]:
            cons = None
        version = latest + 1
        manifest = {
            "version": version,
            "op": "alter_constraints",
            "ts": time.time(),
            "files": m["files"],
            "schema": m["schema"],
            "n_rows_delta": None,
        }
        if cons:
            manifest["constraints"] = cons
        for k in ("dvs", "partition_by", "bloom_cols"):
            if m.get(k):
                manifest[k] = m[k]
        _commit(path, version, manifest)
        return version

    return _retry_cow("alter_constraints", path, once)


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
        entry = {
            "version": v,
            "op": m["op"],
            "n_files": len(m["files"]),
            "n_rows_delta": m.get("n_rows_delta"),
        }
        if m.get("properties"):
            entry["properties"] = m["properties"]
        out.append(entry)
    return out


def _retry_cow(op_name: str, path: str, once):
    """Run a copy-on-write operation with optimistic-conflict retry:
    `once()` reads the latest snapshot, does its row work, and
    commits; losing the version race re-RUNS it from the winner's
    snapshot (the winner may have added files the pruning never
    scanned, so re-merging manifests alone would miss rows — Delta
    resolves delete-vs-append the same way). Lost attempts leave only
    unreferenced data files, which vacuum collects after retention."""
    for attempt in range(_MAX_COMMIT_ATTEMPTS):
        try:
            return once()
        except _CommitConflict:
            time.sleep(_backoff(attempt))
    raise ConcurrentCommitError(
        f"{op_name} lost the commit race {_MAX_COMMIT_ATTEMPTS} times at {path}"
    )


def _dv_delete_once(
    spark: SparkSession, path: str, select_hits, properties: dict | None = None
) -> int:
    """One attempt of the merge-on-read delete: address the VISIBLE
    matching rows (existing DVs already applied by _read_entries, so
    a row can never be double-deleted), write their (file, ordinal)
    pairs as a new DV parquet set, and publish a manifest whose file
    list is UNCHANGED — the whole point. `select_hits(df) -> df`
    narrows the visible rows to the ones to delete (a predicate
    filter, or a key semi-join for CDC retractions)."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no manifest lake at {path}")
    m = _read_manifest(path, latest)
    if not m["files"]:
        return latest
    schema = T.StructType.fromJson(m["schema"])
    clash = {_DV_FILE, _DV_POS} & set(schema.fieldNames())
    if clash:
        raise ValueError(f"table uses reserved DV column names {sorted(clash)}")
    df = _read_entries(spark, path, m, m["files"], keep_meta=True)
    hits = select_hits(df).select(_DV_FILE, _DV_POS)
    n = hits.count()
    if n == 0:
        return latest  # nothing matched: no new snapshot needed
    dv_rel = os.path.join("dv", uuid.uuid4().hex[:12])
    hits.write.mode("error").parquet(os.path.join(path, dv_rel))
    version = latest + 1
    manifest = {
        "version": version,
        "op": "delete",
        "strategy": "dv",
        "ts": time.time(),
        "files": m["files"],
        "schema": m["schema"],
        "n_rows_delta": -n,
        "dvs": list(m.get("dvs") or []) + [dv_rel],
    }
    if properties:
        manifest["properties"] = dict(properties)
    for k in ("partition_by", "bloom_cols", "constraints"):
        if m.get(k):
            manifest[k] = m[k]
    _commit(path, version, manifest)
    return version


def lake_delete(
    spark: SparkSession, path: str, predicate, strategy: str = "cow"
) -> int:
    """DELETE rows matching `predicate` (a Column), publish one new
    snapshot, return the new version. Two strategies:

    - `"cow"` (copy-on-write, default): rewrite ONLY the files that
      actually contain matching rows (located via _metadata.file_path);
      every other file carries over untouched. Right when deletes are
      rare or bulk — the read path stays a plain scan.
    - `"dv"` (merge-on-read deletion vectors): rewrite NOTHING. The
      matching rows' (file, row-ordinal) addresses are written as a
      small parquet deletion-vector set under <table>/dv/, and the
      manifest's `dvs` list carries it; every read anti-joins the
      broadcast DV relation (see _read_entries). At 100 TB this turns
      "delete 0.1% of rows scattered across every file" from a
      full-table rewrite into a metadata-sized write — the
      Delta/Iceberg v2 position-delete design. DVs accumulate until
      the next COMPACT, which materializes them into clean files and
      clears the list (the read-amplification ceiling is bounded by
      compaction cadence).

    Conflicts with concurrent commits re-run the whole delete from
    the winner's snapshot (see _retry_cow)."""
    if strategy not in ("cow", "dv"):
        raise ValueError(f"unknown delete strategy {strategy!r}")
    if strategy == "dv":
        return _retry_cow(
            "delete-dv",
            path,
            lambda: _dv_delete_once(
                spark, path, lambda df: df.filter(predicate)
            ),
        )

    def once() -> int:
        latest = _latest_version(path)
        if latest is None:
            raise FileNotFoundError(f"no manifest lake at {path}")
        m = _read_manifest(path, latest)
        if not m["files"]:
            return latest
        # hit files located via the scan's _metadata rel path (the
        # keep_meta column) — input_file_name() cannot sit above the
        # DV anti-join (two file sources in one plan)
        df = _read_entries(spark, path, m, m["files"], keep_meta=True)
        hit_rel = {
            r.f
            for r in df.filter(predicate)
            .select(F.col(_DV_FILE).alias("f"))
            .distinct()
            .collect()
        }
        rewritten = [e for e in m["files"] if _entry_rel(e) in hit_rel]
        if not rewritten:
            return latest  # nothing matched: no new snapshot needed
        keep = [e for e in m["files"] if _entry_rel(e) not in hit_rel]
        part_by = tuple(m.get("partition_by") or ())
        bl_cols = tuple(m.get("bloom_cols") or ())
        survivors = _read_entries(spark, path, m, rewritten).filter(~predicate)
        new_files = (
            _write_data_files(survivors, path, part_by, bl_cols)
            if survivors.count()
            else []
        )
        version = latest + 1
        manifest = {
            "version": version,
            "op": "delete",
            "ts": time.time(),
            "files": keep + new_files,
            "schema": m["schema"],
            "n_rows_delta": None,
            "rewrote_files": _paths(rewritten),
        }
        if m.get("constraints"):
            manifest["constraints"] = m["constraints"]
        if m.get("dvs"):
            # DV rows addressing the rewritten files dangle harmlessly
            # (their rel paths left the file list); kept files still
            # need theirs
            manifest["dvs"] = m["dvs"]
        if part_by:
            manifest["partition_by"] = list(part_by)
        if bl_cols:
            manifest["bloom_cols"] = list(bl_cols)
        _commit(path, version, manifest)
        return version

    return _retry_cow("delete", path, once)


def lake_delete_keys(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    keys: tuple[str, ...],
    properties: dict | None = None,
) -> int:
    """Merge-on-read DELETE of every row whose key appears in
    `keys_df` — the CDC RETRACTION primitive: an upstream change feed
    hands a downstream table the keys it must forget, and the delete
    lands as a deletion-vector commit (no file rewritten, no driver
    materialization of the key set — the semi-join broadcast-bounds
    it the same way lake_merge bounds its rewrite scan). Deleting
    keys that are absent (or already deleted) matches nothing and
    publishes no snapshot — replay-idempotent, which is what lets a
    crash between a consumer's retract and append commits recover by
    simply re-running."""
    key_df = keys_df.select(*keys).distinct()
    return _retry_cow(
        "delete-keys",
        path,
        lambda: _dv_delete_once(
            spark,
            path,
            lambda df: df.join(F.broadcast(key_df), list(keys), "left_semi"),
            properties=properties,
        ),
    )


def lake_merge(
    spark: SparkSession, updates: DataFrame, path: str, keys: tuple[str, ...]
) -> int:
    """MERGE (upsert by key) as ONE atomic snapshot: files containing
    rows whose key appears in `updates` are rewritten WITHOUT those
    rows (copy-on-write, same file-pruning as lake_delete), the
    updates append as new files, and everything publishes in a single
    manifest commit — matched rows replaced, unmatched inserted,
    readers never see the intermediate state. Returns the new
    version. Conflicts re-run from the winner's snapshot.

    The key-set broadcast bounds the rewrite scan (a semi-join per
    file); at warehouse scale this is Delta's MERGE with the update
    side small — the common CDC shape."""
    latest = _latest_version(path)
    if latest is None:
        lake_write(updates, path)
        return 0

    def once() -> int:
        latest = _latest_version(path)
        if latest is None:
            return lake_write(updates, path)
        m = _read_manifest(path, latest)
        schema = T.StructType.fromJson(m["schema"])
        if not _schema_compatible(schema, updates.schema):
            raise ValueError("merge would change an existing column's type")
        if m.get("constraints"):
            _enforce_constraints(updates, schema, m["constraints"])
        part_by = tuple(m.get("partition_by") or ())
        bl_cols = tuple(m.get("bloom_cols") or ())
        key_df = updates.select(*keys).distinct()
        keep, rewritten_rel = list(m["files"]), []
        rewritten_entries: list = []
        new_files: list[dict] = []
        if m["files"]:
            df = _read_entries(spark, path, m, m["files"], keep_meta=True)
            hits = df.join(F.broadcast(key_df), list(keys), "left_semi")
            hit_rel = {
                r.f
                for r in hits.select(F.col(_DV_FILE).alias("f"))
                .distinct()
                .collect()
            }
            rewritten_entries = [
                e for e in m["files"] if _entry_rel(e) in hit_rel
            ]
            rewritten_rel = _paths(rewritten_entries)
            keep = [e for e in m["files"] if _entry_rel(e) not in hit_rel]
            if rewritten_entries:
                survivors = _read_entries(
                    spark, path, m, rewritten_entries
                ).join(F.broadcast(key_df), list(keys), "left_anti")
                if survivors.count():
                    new_files += _write_data_files(survivors, path, part_by, bl_cols)
        n_up = updates.count()
        update_entries = _write_data_files(updates, path, part_by, bl_cols)
        new_files += update_entries
        merged_schema = T.StructType(
            list(schema.fields)
            + [
                f
                for f in updates.schema.fields
                if f.name not in schema.fieldNames()
            ]
        )
        version = latest + 1
        manifest = {
            "version": version,
            "op": "merge",
            "ts": time.time(),
            "files": keep + new_files,
            "schema": merged_schema.jsonValue(),
            "n_rows_delta": n_up,
            "rewrote_files": rewritten_rel,
            # which appended files hold the UPDATE rows, and the merge
            # keys — what lake_read_cdf needs to derive row-level
            # delete+insert events from this commit
            "merge_keys": list(keys),
            "update_files": _paths(update_entries),
        }
        if m.get("constraints"):
            manifest["constraints"] = m["constraints"]
        if m.get("dvs"):
            manifest["dvs"] = m["dvs"]  # kept files still need theirs
        if part_by:
            manifest["partition_by"] = list(part_by)
        if bl_cols:
            manifest["bloom_cols"] = list(bl_cols)
        _commit(path, version, manifest)
        return version

    return _retry_cow("merge", path, once)


def _zorder_key(df: DataFrame, cols: tuple[str, ...]) -> "F.Column":
    """Morton (Z-order) interleave of the given NUMERIC columns as a
    bigint sort key. Each column is quantized to a 2^b uniform grid
    between its global min and max (one agg over the rows being
    rewritten — compaction reads them anyway), then bit i of every
    column's cell lands at position i*n_cols + col_idx. Files cut
    along this key get TIGHT min/max ranges on ALL the z-ordered
    columns at once, so manifest-stats skipping prunes multi-column
    predicates that a single-column sort can only prune on its
    leading column (Delta's OPTIMIZE ZORDER BY). Uniform (not rank)
    quantization: cheap, codegen-friendly, and file-size balance
    comes from repartitionByRange's sampling, not the grid."""
    for c in cols:
        if not isinstance(
            df.schema[c].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType),
        ):
            raise ValueError(f"zorder_by column {c!r} must be numeric")
    n = len(cols)
    b = min(16, 62 // n)  # bits per column; key stays in a signed long
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    cells = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or float(mx) == float(mn):
            cells.append(F.lit(0).cast("bigint"))
            continue
        cell = (
            F.width_bucket(
                F.col(c).cast("double"),
                F.lit(float(mn)), F.lit(float(mx)), F.lit(2**b),
            )
            - 1
        )
        # nulls sort to cell 0; width_bucket's inclusive-max overflow
        # bucket (2^b + 1) clamps back to the top cell
        cell = F.least(
            F.greatest(F.coalesce(cell, F.lit(0)), F.lit(0)),
            F.lit(2**b - 1),
        ).cast("bigint")
        cells.append(cell)
    key = F.lit(0).cast("bigint")
    for i in range(b):
        for ci, cell in enumerate(cells):
            key = key + F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * n + ci
            )
    return key


def lake_compact(
    spark: SparkSession,
    path: str,
    num_files: int = 1,
    zorder_by: tuple[str, ...] = (),
    where: list[tuple] | None = None,
) -> int:
    """Rewrite the live file set into `num_files` files (same rows,
    one new snapshot). Old snapshots keep referencing the old files —
    time travel is unaffected until vacuum. Deletion vectors are
    MATERIALIZED here: the rewrite reads visible rows only, so the
    new snapshot carries no `dvs` for the rewritten files and reads
    go back to plain scans (the merge-on-read maintenance contract).

    `zorder_by` CLUSTERS the rewrite on the Morton interleave of the
    named numeric columns (repartitionByRange on the z-key): each
    output file covers a compact hyper-rectangle, giving it tight
    per-file min/max on every z-ordered column, so lake_read's stats
    skipping prunes predicates on ANY of them — the multi-dimensional
    file-layout optimization (Delta OPTIMIZE ZORDER).

    `where` (same (col, op, val) conjunction as lake_read) makes the
    compaction PARTIAL: only the files that MAY match — by partition
    value, min/max stats, or bloom — are rewritten; every other file
    carries over untouched, with its DVs still applied on read. At
    100 TB this is the only compaction that exists: you OPTIMIZE the
    partitions a workload touches, never the table (Delta's OPTIMIZE
    WHERE). File-level granularity: a pruned-in file is rewritten
    WHOLE (rows are never split out of it), so the rewrite moves
    exactly the selected files' rows. Conflicts re-run from the
    winner's snapshot (compacting stale files would silently drop
    the winner's changes)."""

    def once() -> int:
        latest = _latest_version(path)
        if latest is None:
            raise FileNotFoundError(f"no manifest lake at {path}")
        m = _read_manifest(path, latest)
        part_by = tuple(m.get("partition_by") or ())
        bl_cols = tuple(m.get("bloom_cols") or ())
        if where:
            hit = [e for e in m["files"] if _file_may_match(e, where, part_by)]
            hit_rel = set(_paths(hit))
            keep = [e for e in m["files"] if _entry_rel(e) not in hit_rel]
        else:
            hit, keep = list(m["files"]), []
        if not hit:
            return latest  # nothing selected: no new snapshot needed
        df = _read_entries(spark, path, m, hit)
        if zorder_by:
            df = (
                df.withColumn("__zkey", _zorder_key(df, tuple(zorder_by)))
                .repartitionByRange(num_files, "__zkey")
                .drop("__zkey")
            )
        else:
            df = df.coalesce(num_files)
        files = _write_data_files(df, path, part_by, bl_cols)
        version = latest + 1
        manifest = {
            "version": version,
            "op": "compact",
            "ts": time.time(),
            "files": keep + files,
            "schema": m["schema"],
            "n_rows_delta": 0,
            "rewrote_files": _paths(hit),
        }
        if keep and m.get("dvs"):
            # partial compact: kept files still need their DV rows
            # (the rewritten files' DV rows dangle harmlessly)
            manifest["dvs"] = m["dvs"]
        if m.get("constraints"):
            manifest["constraints"] = m["constraints"]
        if zorder_by:
            manifest["zorder_by"] = list(zorder_by)
        if part_by:
            manifest["partition_by"] = list(part_by)
        if bl_cols:
            manifest["bloom_cols"] = list(bl_cols)
        _commit(path, version, manifest)
        return version

    return _retry_cow("compact", path, once)


def lake_vacuum(
    path: str,
    keep_last: int = 1,
    retention_seconds: float = DEFAULT_VACUUM_RETENTION,
) -> list[str]:
    """Drop all but the last `keep_last` manifests, then delete every
    data file that no kept manifest references AND whose mtime is
    older than `retention_seconds`. Returns deleted files.

    The retention window is the concurrent-writer guard: a writer that
    has staged data files but not yet published its manifest — or one
    that commits between the kept-file scan and the deletion loop —
    holds files vacuum cannot see references to; deleting them would
    corrupt the about-to-commit snapshot (Delta's VACUUM retention,
    default 7 days there). Pass retention_seconds=0 only when no
    writer can be active (the destructive end of the lifecycle)."""
    latest = _latest_version(path)
    if latest is None:
        return []
    keep_from = max(0, latest - keep_last + 1)
    kept_files: set[str] = set()
    kept_dv_dirs: set[str] = set()
    for v in range(keep_from, latest + 1):
        try:
            m = _read_manifest(path, v)
        except FileNotFoundError:
            continue
        kept_files.update(_paths(m["files"]))
        kept_dv_dirs.update(m.get("dvs") or [])
    deleted = []
    for v in range(keep_from):
        mf = os.path.join(_manifest_dir(path), f"v{v}.json")
        if os.path.exists(mf):
            os.remove(mf)
    cutoff = time.time() - retention_seconds
    data_root = os.path.join(path, "data")
    if os.path.isdir(data_root):
        for root, _dirs, names in os.walk(data_root):
            for f in sorted(names):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, path)
                if (
                    f.endswith(".parquet")
                    and rel not in kept_files
                    and os.path.getmtime(full) <= cutoff
                ):
                    os.remove(full)
                    deleted.append(rel)
    # deletion-vector sets live under <table>/dv/<uuid>/; one no kept
    # manifest references is orphaned as a UNIT (a lost dv-delete
    # attempt, or a compaction having materialized it) — same
    # retention guard as data files
    dv_root = os.path.join(path, "dv")
    if os.path.isdir(dv_root):
        for root, _dirs, names in os.walk(dv_root):
            for f in sorted(names):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, path)
                dv_dir = os.sep.join(rel.split(os.sep)[:2])  # dv/<uuid>
                if (
                    f.endswith(".parquet")
                    and dv_dir not in kept_dv_dirs
                    and os.path.getmtime(full) <= cutoff
                ):
                    os.remove(full)
                    deleted.append(rel)
    return sorted(deleted)
