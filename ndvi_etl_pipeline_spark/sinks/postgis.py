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
    conflict_keys: tuple[str, ...],
    connection_factory: Callable[[], object],
    ledger_table: str = "stream_commits",
    mode: str = "replace",
    batch_size: int = 1000,
):
    """foreachBatch sink with exactly-once EFFECTS on the warehouse
    via at-least-once delivery + idempotent converge: returns a
    `(batch_df, batch_id) -> None` callable for
    `writeStream.foreachBatch(...)`.

    Structured Streaming replays a micro-batch after a failure. The
    guarantee here is NOT a transactional ledger: the data write is
    distributed (one connection + commit per partition in
    `write_upsert_jdbc`) and the ledger row is inserted in a separate
    connection afterwards, so a crash between a data commit and the
    ledger insert replays the whole batch on restart. Effects are
    still exactly-once because:

    1. the data write is the K3/K4 ON CONFLICT upsert
       (`write_upsert_jdbc`) — replaying the same rows converges to
       the same table state (idempotent by key). Only the idempotent
       modes are accepted (enforced below); an append-only
       non-idempotent mode would be at-least-once under this sink.
    2. the COMMIT LEDGER row per (table, batch_id) short-circuits
       replays that happen after the ledger committed, and doubles as
       the stream's progress table — though `n_rows` for a batch that
       crashed mid-write reflects the final (converged) replay, and a
       batch can be partially visible between its first partition
       commit and its ledger row.

    A truly atomic data+ledger commit would require funnelling the
    batch through one driver-side connection/transaction — the right
    trade only for tiny batches; at scale the partition-parallel
    write + keyed idempotence is the standard epoch-ledger pattern on
    engines without native streaming-sink transactions.

    The ledger is created if absent (idempotent DDL). Crash-recovery
    is exercised by tests/test_streaming.py (kill between data commit
    and ledger insert → replay converges, second replay is skipped).
    """
    if mode not in ("replace", "ignore"):
        raise ValueError(
            "write_upsert_jdbc_stream requires an idempotent mode "
            f"('replace' or 'ignore'); got {mode!r} — a non-idempotent "
            "mode would double-apply on micro-batch replay"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
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
        finally:
            con.close()

        n = write_upsert_jdbc(
            batch_df,
            table,
            conflict_keys,
            connection_factory,
            mode=mode,
            batch_size=batch_size,
        )

        con = connect_with_retry(connection_factory)
        try:
            cur = _cursor(con)
            cur.execute(
                adapt_paramstyle(
                    f"INSERT INTO {quote_ident(ledger_table)} "
                    "(sink_table, batch_id, n_rows) VALUES (?, ?, ?) "
                    "ON CONFLICT (sink_table, batch_id) DO NOTHING",
                    con,
                ),
                (table, batch_id, n),
            )
            con.commit()
        finally:
            con.close()

    return sink
