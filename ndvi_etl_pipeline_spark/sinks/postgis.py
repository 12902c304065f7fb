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

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame


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
) -> None:
    """Distributed row-level upsert: each partition opens one
    connection (with retry), executes batched ON CONFLICT statements,
    and commits once — the reference's per-row psycopg2 loop turned
    into |partitions| parallel bulk writers. `ddl_pre`/`ddl_post` run
    once on the driver around the write (K5 constraint hooks)."""
    columns = tuple(df.columns)
    sql = (
        upsert_sql(table, columns, conflict_keys)
        if mode == "replace"
        else insert_ignore_sql(table, columns, conflict_keys)
    )

    if ddl_pre:
        con = connect_with_retry(connection_factory)
        for stmt in ddl_pre:
            con.execute(stmt)
        con.commit()
        con.close()

    def write_partition(rows) -> None:
        con = connect_with_retry(connection_factory)
        try:
            cur = con.cursor() if hasattr(con, "cursor") else con
            batch = []
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch.clear()
            if batch:
                cur.executemany(sql, batch)
            con.commit()
        finally:
            con.close()

    df.foreachPartition(write_partition)

    if ddl_post:
        con = connect_with_retry(connection_factory)
        for stmt in ddl_post:
            con.execute(stmt)
        con.commit()
        con.close()
