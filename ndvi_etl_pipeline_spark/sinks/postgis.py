"""PostGIS/JDBC sink tier (SURVEY §2.1 K2-K5, §2.10 E3).

Reference behavior (load_to_postgis.py): psycopg2 per-row INSERTs
with ON CONFLICT clauses (:160-165, :206-212, :260-269, :313-322),
raster-constraint DDL around the load (:332-354), and a 30×2 s
connection retry (:41-56).

Engine design: SQL text generation is pure and unit-tested offline;
execution goes through either
- `df.write.jdbc` for plain appends (K2), or
- `write_upsert_jdbc`: per-partition batched `INSERT … ON CONFLICT`
  via an injectable DB-API connection factory (`foreachPartition`,
  so executors write in parallel and the driver never materializes
  the data). This is the row-level upsert Parquet cannot express —
  the lake keeps the anti-join/last-write-wins idioms
  (operators/upsert.py); the warehouse sink keeps ON CONFLICT.

No live Postgres exists in this container; tests exercise the SQL
builders and run `write_upsert_jdbc` against sqlite3 (same DB-API,
ON CONFLICT syntax shared) to prove the executor-side path.
"""

from __future__ import annotations

import sys
import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


def _cursor(con):
    """DB-API portability: psycopg2 connections have no .execute —
    always go through a cursor when one exists (sqlite3 accepts
    con.execute as sugar, Postgres drivers do not)."""
    return con.cursor() if hasattr(con, "cursor") else con


def adapt_paramstyle(sql: str, con) -> str:
    """Translate the engine's canonical qmark placeholders to the
    connection driver's declared DB-API paramstyle (psycopg2/pg8000
    are format/pyformat '%s'; sqlite3/duckdb are qmark '?').
    Identifiers are double-quoted by quote_ident, so no literal '?'
    can appear outside a placeholder position."""
    mod = type(con).__module__.split(".")[0]
    style = getattr(sys.modules.get(mod), "paramstyle", "qmark")
    if style in ("format", "pyformat"):
        return sql.replace("?", "%s")
    return sql


def quote_ident(name: str) -> str:
    if not name.replace("_", "").isalnum():
        raise ValueError(f"suspicious identifier: {name!r}")
    return f'"{name}"'


def insert_ignore_sql(table: str, columns: tuple[str, ...], conflict_keys: tuple[str, ...]) -> str:
    """K3: INSERT … ON CONFLICT (keys) DO NOTHING
    (load_to_postgis.py:163,209)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    ph = ", ".join(["?"] * len(columns))
    keys = ", ".join(quote_ident(k) for k in conflict_keys)
    return (
        f"INSERT INTO {quote_ident(table)} ({cols}) VALUES ({ph}) "
        f"ON CONFLICT ({keys}) DO NOTHING"
    )


def upsert_sql(table: str, columns: tuple[str, ...], conflict_keys: tuple[str, ...]) -> str:
    """K4: INSERT … ON CONFLICT (keys) DO UPDATE SET non-key cols
    (load_to_postgis.py:263-266,316-319)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    ph = ", ".join(["?"] * len(columns))
    keys = ", ".join(quote_ident(k) for k in conflict_keys)
    updates = ", ".join(
        f"{quote_ident(c)} = excluded.{quote_ident(c)}"
        for c in columns
        if c not in conflict_keys
    )
    return (
        f"INSERT INTO {quote_ident(table)} ({cols}) VALUES ({ph}) "
        f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
    )


def drop_raster_constraints_sql(table: str, raster_col: str = "raster") -> str:
    """K5 pre-hook (load_to_postgis.py:332-341)."""
    return f"SELECT DropRasterConstraints('{table}'::name, '{raster_col}'::name)"


def add_raster_constraints_sql(table: str, raster_col: str = "raster") -> str:
    """K5 post-hook (load_to_postgis.py:343-354)."""
    return f"SELECT AddRasterConstraints('{table}'::name, '{raster_col}'::name)"


def connect_with_retry(
    factory: Callable[[], object],
    retries: int = 30,
    delay_s: float = 2.0,
):
    """E3: the reference's readiness loop (load_to_postgis.py:41-56)."""
    last: Exception | None = None
    for _ in range(retries):
        try:
            return factory()
        except Exception as exc:  # DB not ready yet
            last = exc
            time.sleep(delay_s)
    raise ConnectionError(f"database not reachable after {retries} attempts") from last


def write_upsert_jdbc(
    df: DataFrame,
    table: str,
    conflict_keys: tuple[str, ...],
    connection_factory: Callable[[], object],
    mode: str = "replace",
    batch_size: int = 1000,
    ddl_pre: Iterable[str] = (),
    ddl_post: Iterable[str] = (),
) -> int:
    """Distributed row-level upsert: each partition opens one
    connection (with retry), executes batched ON CONFLICT statements,
    and commits once — the reference's per-row psycopg2 loop turned
    into |partitions| parallel bulk writers. `ddl_pre`/`ddl_post` run
    once on the driver around the write (K5 constraint hooks).

    Returns the number of rows written, counted by accumulator inside
    the same action (exactly-once per successful task) — callers that
    need it (the streaming ledger) don't pay a second job recomputing
    the plan just to count."""
    columns = tuple(df.columns)
    sql = (
        upsert_sql(table, columns, conflict_keys)
        if mode == "replace"
        else insert_ignore_sql(table, columns, conflict_keys)
    )
    n_rows = df.sparkSession.sparkContext.accumulator(0)

    def run_ddl(statements: Iterable[str]) -> None:
        con = connect_with_retry(connection_factory)
        try:
            cur = _cursor(con)
            for stmt in statements:
                cur.execute(stmt)
            con.commit()
        finally:
            con.close()

    if ddl_pre:
        run_ddl(ddl_pre)

    def write_partition(rows) -> None:
        con = connect_with_retry(connection_factory)
        try:
            cur = _cursor(con)
            psql = adapt_paramstyle(sql, con)
            batch = []
            n = 0
            for row in rows:
                batch.append(tuple(row))
                n += 1
                if len(batch) >= batch_size:
                    cur.executemany(psql, batch)
                    batch.clear()
            if batch:
                cur.executemany(psql, batch)
            con.commit()
            n_rows.add(n)
        finally:
            con.close()

    df.foreachPartition(write_partition)

    if ddl_post:
        run_ddl(ddl_post)
    return n_rows.value


# ---------------------------------------------------------------------------
# PostGIS raster WKB payload (the `raster` column's wire format)
# ---------------------------------------------------------------------------
#
# The reference ships whole GeoTIFF files through
# `ST_SetSRID(ST_FromGDALRaster(%s), epsg)` (load_to_postgis.py:313-322);
# the engine targets the same `raster` columns (db/init/002_schema.sql)
# directly in the type's own Well-Known-Binary form — the format
# `ST_RastFromWKB(bytea)` accepts and `ST_AsBinary(raster)` emits,
# specified publicly in PostGIS raster RFC2 (WKB): a fixed 61-byte
# header (endianness, version 0, band count, 6-double georeference,
# srid, width, height) followed by per-band [flags | nodata | row-major
# pixels]. No GDAL needed on either side.

# pixel-type codes per RFC2 / rt_api (PT_*) — index into the doc'd
# 1BB…64BF ladder
RASTER_PIXTYPES = {
    "8BSI": 3,
    "8BUI": 4,
    "16BSI": 5,
    "16BUI": 6,
    "32BSI": 7,
    "32BUI": 8,
    "32BF": 9,
    "64BF": 10,
}

_PIXTYPE_STRUCT = {
    "8BSI": "b",
    "8BUI": "B",
    "16BSI": "h",
    "16BUI": "H",
    "32BSI": "i",
    "32BUI": "I",
    "32BF": "f",
    "64BF": "d",
}

_NUMPY_TO_PIXTYPE = {
    "int8": "8BSI",
    "uint8": "8BUI",
    "int16": "16BSI",
    "uint16": "16BUI",
    "int32": "32BSI",
    "uint32": "32BUI",
    "float32": "32BF",
    "float64": "64BF",
}


def raster_wkb(
    array,
    ip_x: float,
    ip_y: float,
    scale_x: float,
    scale_y: float,
    srid: int,
    nodata: float | None = None,
    skew_x: float = 0.0,
    skew_y: float = 0.0,
    pixtype: str | None = None,
) -> bytes:
    """Encode a 2-D numpy array as a single-band PostGIS raster WKB
    (little-endian, version 0). `nodata=None` writes a zero nodata
    slot with hasNodataValue unset — the value slot is always present
    per RFC2. The pixel type defaults from the array dtype (the same
    dtype→type dispatch the warp tier uses)."""
    import struct

    import numpy as np

    arr = np.asarray(array)
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D array, got shape {arr.shape}")
    pt = pixtype or _NUMPY_TO_PIXTYPE.get(arr.dtype.name)
    if pt not in RASTER_PIXTYPES:
        raise ValueError(f"unsupported pixel type {pt!r} (dtype {arr.dtype})")
    h, w = arr.shape
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("raster WKB dimensions are uint16 (tile the input)")
    head = struct.pack(
        "<BHHddddddiHH",
        1,  # NDR / little endian
        0,  # version
        1,  # nBands
        float(scale_x),
        float(scale_y),
        float(ip_x),
        float(ip_y),
        float(skew_x),
        float(skew_y),
        int(srid),
        w,
        h,
    )
    flags = RASTER_PIXTYPES[pt] | (0x40 if nodata is not None else 0)
    fmt = _PIXTYPE_STRUCT[pt]
    nd_val = 0 if nodata is None else nodata
    nd = struct.pack("<" + fmt, float(nd_val) if fmt in ("f", "d") else int(nd_val))
    data = np.ascontiguousarray(arr, dtype=arr.dtype.newbyteorder("<")).tobytes()
    return head + bytes([flags]) + nd + data


def parse_raster_wkb(wkb: bytes) -> dict:
    """Decode a (single- or multi-band) raster WKB produced by
    `raster_wkb` or `ST_AsBinary(raster)`. Returns header fields plus
    a list of (pixtype, nodata|None, 2-D numpy array) bands — the
    round-trip proof the sink test pins byte-for-byte."""
    import struct

    import numpy as np

    endian = "<" if wkb[0] == 1 else ">"
    version, n_bands = struct.unpack_from(endian + "HH", wkb, 1)
    if version != 0:
        raise ValueError(f"unsupported raster WKB version {version}")
    sx, sy, ipx, ipy, kx, ky = struct.unpack_from(endian + "6d", wkb, 5)
    srid, w, h = struct.unpack_from(endian + "iHH", wkb, 53)
    off = 61
    inv_pix = {v: k for k, v in RASTER_PIXTYPES.items()}
    bands = []
    for _ in range(n_bands):
        flags = wkb[off]
        off += 1
        if flags & 0x80:
            raise ValueError("offline (out-of-db) bands not supported")
        pt = inv_pix[flags & 0x0F]
        fmt = _PIXTYPE_STRUCT[pt]
        size = struct.calcsize(fmt)
        (nd_raw,) = struct.unpack_from(endian + fmt, wkb, off)
        off += size
        nodata = nd_raw if flags & 0x40 else None
        arr = (
            np.frombuffer(wkb, dtype=np.dtype(endian + fmt), count=w * h, offset=off)
            .reshape(h, w)
            .copy()
        )
        off += w * h * size
        bands.append({"pixtype": pt, "nodata": nodata, "array": arr})
    return {
        "scale_x": sx,
        "scale_y": sy,
        "ip_x": ipx,
        "ip_y": ipy,
        "skew_x": kx,
        "skew_y": ky,
        "srid": srid,
        "width": w,
        "height": h,
        "bands": bands,
    }


def raster_upsert_sql(
    table: str,
    columns: tuple[str, ...],
    conflict_keys: tuple[str, ...],
    raster_col: str = "raster",
) -> str:
    """K4 with a WKB raster payload: like `upsert_sql` but the raster
    placeholder goes through ST_RastFromWKB — the engine-side
    equivalent of the reference's ST_FromGDALRaster(%s) value
    expression (load_to_postgis.py:313-322; SRID rides inside the
    WKB, so no ST_SetSRID wrapper is needed)."""
    cols = ", ".join(quote_ident(c) for c in columns)
    ph = ", ".join(
        "ST_RastFromWKB(?)" if c == raster_col else "?" for c in columns
    )
    keys = ", ".join(quote_ident(k) for k in conflict_keys)
    updates = ", ".join(
        f"{quote_ident(c)} = excluded.{quote_ident(c)}"
        for c in columns
        if c not in conflict_keys
    )
    return (
        f"INSERT INTO {quote_ident(table)} ({cols}) VALUES ({ph}) "
        f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
    )


def write_upsert_jdbc_stream(
    table: str,
    conflict_keys: tuple[str, ...] = (),
    connection_factory: Callable[[], object] | None = None,
    ledger_table: str = "stream_commits",
    mode: str = "replace",
    batch_size: int = 1000,
):
    """foreachBatch sink with exactly-once EFFECTS on the warehouse
    via an ATOMIC staging→publish epoch commit: returns a
    `(batch_df, batch_id) -> None` callable for
    `writeStream.foreachBatch(...)`.

    Structured Streaming replays a micro-batch after a failure; Spark
    may also retry individual tasks whose partition write already
    committed. Both are exactly-once here, for ALL modes — including
    non-idempotent `append` — because the target table is only ever
    touched inside one driver-side transaction that also writes the
    ledger row:

    1. **Stage (parallel)**: executors bulk-insert into a per-batch
       staging table (`<table>__stage_<batch_id>`, created empty from
       the target's column types). Each task deletes its own
       `__part_id` slice before inserting and commits once, so a task
       RETRY converges instead of duplicating. The staging table is
       dropped and recreated at every (re)entry of the batch, so a
       crash mid-stage leaves no residue the replay could double-read.
       The target is never touched in this phase.
    2. **Publish (atomic)**: one driver connection runs
       `INSERT INTO target SELECT … FROM stage` (with the mode's ON
       CONFLICT clause; plain append for mode='append'), inserts the
       ledger row (exact `n_rows`, counted from the staging table in
       the same transaction), and drops the staging table — in a
       SINGLE transaction. A crash anywhere before the commit rolls
       the target AND ledger back together; a replayed batch whose
       ledger row exists short-circuits before staging. There is no
       reachable state where data is visible without its ledger row.

    Wire-transfer parallelism is preserved (executors write staging
    concurrently); only the in-database `INSERT … SELECT` publish is
    single-transaction — set-based and index-driven, not row-at-a-time
    through the driver. This is the standard staged-epoch pattern for
    engines without native streaming-sink transactions (Flink's JDBC
    XA sink and Kafka-Connect JDBC use the same shape).

    `replace` mode accepts duplicate conflict keys within a
    micro-batch: the publish SELECT keeps one deterministic winner per
    key (highest staging partition, value columns as tiebreak) before
    the ON CONFLICT DO UPDATE — a raw set-based upsert would abort
    with Postgres's "cannot affect row a second time" where the old
    per-row executemany converged. `ignore` and `append` pass
    duplicates through unchanged.

    The ledger is created if absent (idempotent DDL). Crash-recovery
    (replay after a simulated kill, append-mode included) is exercised
    by tests/test_postgis_sink.py and tests/test_streaming.py."""
    if mode not in ("replace", "ignore", "append"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode != "append" and not conflict_keys:
        raise ValueError(f"mode {mode!r} requires conflict_keys")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        stage = f"{table}__stage_{batch_id}"
        columns = tuple(batch_df.columns)
        cols = ", ".join(quote_ident(c) for c in columns)

        con = connect_with_retry(connection_factory)
        try:
            cur = _cursor(con)
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {quote_ident(ledger_table)} "
                "(sink_table TEXT, batch_id BIGINT, n_rows BIGINT, "
                "UNIQUE(sink_table, batch_id))"
            )
            con.commit()
            # execute() returns the cursor on sqlite3 but None on
            # psycopg2 — never chain .fetchone() off it.
            cur.execute(
                adapt_paramstyle(
                    f"SELECT 1 FROM {quote_ident(ledger_table)} "
                    "WHERE sink_table = ? AND batch_id = ?",
                    con,
                ),
                (table, batch_id),
            )
            if cur.fetchone():
                return  # replayed batch: effects already applied
            # fresh staging table — drops any residue from a crashed
            # earlier attempt of this same batch
            cur.execute(f"DROP TABLE IF EXISTS {quote_ident(stage)}")
            cur.execute(
                f"CREATE TABLE {quote_ident(stage)} AS "
                f"SELECT {cols}, CAST(0 AS BIGINT) AS __part_id "
                f"FROM {quote_ident(table)} WHERE 1=0"
            )
            con.commit()
        finally:
            con.close()

        stage_sql = (
            f"INSERT INTO {quote_ident(stage)} ({cols}, \"__part_id\") "
            f"VALUES ({', '.join(['?'] * (len(columns) + 1))})"
        )

        def stage_partition(rows) -> None:
            it = iter(rows)
            try:
                first = next(it)
            except StopIteration:
                return
            pid = first[-1]
            con = connect_with_retry(connection_factory)
            try:
                cur = _cursor(con)
                # delete-then-insert per partition, one commit: a task
                # retry whose first attempt committed converges
                cur.execute(
                    adapt_paramstyle(
                        f"DELETE FROM {quote_ident(stage)} WHERE \"__part_id\" = ?",
                        con,
                    ),
                    (pid,),
                )
                psql = adapt_paramstyle(stage_sql, con)
                batch = [tuple(first)]
                for row in it:
                    batch.append(tuple(row))
                    if len(batch) >= batch_size:
                        cur.executemany(psql, batch)
                        batch.clear()
                if batch:
                    cur.executemany(psql, batch)
                con.commit()
            finally:
                con.close()

        from pyspark.sql import functions as F

        batch_df.select(
            *columns, F.spark_partition_id().alias("__part_id")
        ).foreachPartition(stage_partition)

        # atomic publish: data + ledger + stage-drop in ONE transaction
        publish = f"INSERT INTO {quote_ident(table)} ({cols}) SELECT {cols} FROM {quote_ident(stage)} WHERE 1=1"
        if mode == "replace":
            keys = ", ".join(quote_ident(k) for k in conflict_keys)
            updates = ", ".join(
                f"{quote_ident(c)} = excluded.{quote_ident(c)}"
                for c in columns
                if c not in conflict_keys
            )
            # A set-based ON CONFLICT DO UPDATE aborts if the SELECT
            # yields the same conflict key twice ("cannot affect row a
            # second time") — the old per-row executemany converged
            # there, so keep converging: pick ONE deterministic winner
            # per key in the publish SELECT (last staged partition,
            # value columns as the tiebreak).
            val_cols = [c for c in columns if c not in conflict_keys]
            order = ", ".join(
                ['"__part_id" DESC']
                + [f"{quote_ident(c)} DESC" for c in val_cols]
            )
            publish = (
                f"INSERT INTO {quote_ident(table)} ({cols}) "
                f"SELECT {cols} FROM ("
                f"SELECT {cols}, ROW_NUMBER() OVER ("
                f"PARTITION BY {keys} ORDER BY {order}) AS __rn "
                f"FROM {quote_ident(stage)}) __d WHERE __rn = 1"
            )
            publish += f" ON CONFLICT ({keys}) DO UPDATE SET {updates}"
        elif mode == "ignore":
            keys = ", ".join(quote_ident(k) for k in conflict_keys)
            publish += f" ON CONFLICT ({keys}) DO NOTHING"

        con = connect_with_retry(connection_factory)
        try:
            cur = _cursor(con)
            cur.execute(f"SELECT count(*) FROM {quote_ident(stage)}")
            n = cur.fetchone()[0]
            cur.execute(publish)
            cur.execute(
                adapt_paramstyle(
                    f"INSERT INTO {quote_ident(ledger_table)} "
                    "(sink_table, batch_id, n_rows) VALUES (?, ?, ?)",
                    con,
                ),
                (table, batch_id, n),
            )
            cur.execute(f"DROP TABLE {quote_ident(stage)}")
            con.commit()
        finally:
            con.close()

    return sink
