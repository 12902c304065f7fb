#!/usr/bin/env python
"""Fabricate a larger benchmark scale factor from the driver's sf0.1
parquet by disjoint-universe replication (default 10×ish → "sf1").

Each copy k shifts every key column by k·(max_key+1), so per-key
densities, join fan-outs, selectivities, and value distributions are
EXACTLY those of sf0.1 — the workload is a true scale-up, not a
resample. Dimension tables with fixed cardinality in TPC-H (region,
nation) are kept as-is; every other table replicates with shifted
keys. Text/embedding payloads replicate verbatim, which deliberately
gives the dedup/ANN tier real duplicate mass to find at scale.

Output goes under the repo (default ./bench_sf1 — gitignored);
/root/testdata is never written. Usage:

    python tools/make_bench_sf.py [--src /root/testdata/sf0.1]
                                  [--out bench_sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import duckdb

# key columns to shift per table: {table: {column: key_domain}}
# key_domain groups columns that must shift by the SAME amount so
# foreign keys stay consistent across tables.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
# (domain, table.column) to measure the shift stride from
DOMAIN_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "user": ("events", "user_id"),
    "evt": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_AS_IS = ("region", "nation")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="bench_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    strides = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        (mx,) = con.execute(
            f"SELECT max({col}) FROM '{args.src}/{tbl}.parquet'"
        ).fetchone()
        strides[dom] = int(mx) + 1

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied as-is")

    for t, keymap in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{args.src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + k.k * {strides[keymap[c]]} AS {c}" if c in keymap else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{args.src}/{t}.parquet', "
            f"(SELECT unnest(generate_series(0, {args.copies - 1})) AS k) k) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows ({args.copies} copies)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
