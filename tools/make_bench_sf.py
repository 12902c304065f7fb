#!/usr/bin/env python
"""Fabricate a larger benchmark scale factor from the driver's sf0.1
parquet by disjoint-universe replication (default 10×ish → "sf1").

Each copy k shifts every key column by k·(max_key+1), so per-key
densities, join fan-outs, selectivities, and value distributions are
EXACTLY those of sf0.1 — the workload is a true scale-up, not a
resample. Dimension tables with fixed cardinality in TPC-H (region,
nation) are kept as-is; every other table replicates with shifted
keys.

Duplicate-cluster honesty (--payloads, default `tagged`): replicating
text/embedding payloads VERBATIM makes every content-duplicate
cluster's SIZE grow ×copies, so candidate pairs in the dedup/near-dup
tier grow QUADRATICALLY with scale — you end up measuring the
generator, not the operator (the round-4 reason dedup_minhash_lsh had
to be excluded from sf10). `tagged` instead scales cluster COUNT
linearly at constant cluster size, the shape a real crawl has:

- documents.text goes through a PER-COPY substitution cipher
  (a bijection on [a-z0-9], applied case-consistently; copy 0 is the
  identity). A bijection on the alphabet is a bijection on shingles,
  so every within-copy Jaccard/fingerprint relation — exact-dup
  clusters, MinHash near-dup clusters, winnowing overlaps — is
  preserved EXACTLY, while cross-copy shingle sets are disjoint in
  expectation (cosine/Jaccard ≈ 0). Text length, word boundaries,
  and punctuation are untouched.
- embeddings.embedding goes through a PER-COPY signed coordinate
  permutation (copy 0 identity) — an orthogonal transform, so every
  within-copy dot product, norm, and cosine is preserved EXACTLY
  while cross-copy cosines decorrelate.

`--payloads verbatim` keeps the old behavior for A/B comparison.

Output goes under the repo (default ./bench_sf1 — gitignored);
/root/testdata is never written. Usage:

    python tools/make_bench_sf.py [--src /root/testdata/sf0.1]
                                  [--out bench_sf1] [--copies 10]
                                  [--payloads tagged|verbatim]
"""

from __future__ import annotations

import argparse
import random
import string
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

_LOWER = string.ascii_lowercase
_DIGIT = string.digits


def _cipher_tables(copies: int):
    """(k, from_str, to_str) rows: per-copy alphabet bijection.
    Copy 0 is the identity so the base copy equals the source."""
    frm = _LOWER + _LOWER.upper() + _DIGIT
    rows = []
    for k in range(copies):
        if k == 0:
            rows.append((0, frm, frm))
            continue
        rng = random.Random(90_001 + k)
        lo = list(_LOWER)
        dg = list(_DIGIT)
        rng.shuffle(lo)
        rng.shuffle(dg)
        to = "".join(lo) + "".join(lo).upper() + "".join(dg)
        rows.append((k, frm, to))
    return rows


def _signed_perm_tables(copies: int, dim: int):
    """(k, perm, signs) rows: per-copy signed coordinate permutation
    (1-indexed for DuckDB list indexing). Copy 0 is the identity."""
    rows = []
    for k in range(copies):
        if k == 0:
            rows.append((0, list(range(1, dim + 1)), [1.0] * dim))
            continue
        rng = random.Random(77_001 + k)
        perm = list(range(1, dim + 1))
        rng.shuffle(perm)
        signs = [1.0 if rng.random() < 0.5 else -1.0 for _ in range(dim)]
        rows.append((k, perm, signs))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="bench_sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--payloads",
        choices=("tagged", "verbatim"),
        default="tagged",
        help="tagged: constant-size duplicate clusters, linearly "
        "scaling cluster count (per-copy cipher / signed perm); "
        "verbatim: raw replication (cluster size grows with copies)",
    )
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

    tagged = args.payloads == "tagged"
    if tagged:
        con.execute(
            "CREATE TABLE cipher (k BIGINT, frm VARCHAR, tto VARCHAR)"
        )
        con.executemany(
            "INSERT INTO cipher VALUES (?, ?, ?)", _cipher_tables(args.copies)
        )
        (dim,) = con.execute(
            f"SELECT len(embedding) FROM '{args.src}/embeddings.parquet' LIMIT 1"
        ).fetchone()
        con.execute(
            "CREATE TABLE sperm (k BIGINT, perm BIGINT[], signs FLOAT[])"
        )
        con.executemany(
            "INSERT INTO sperm VALUES (?, ?, ?)",
            _signed_perm_tables(args.copies, int(dim)),
        )

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

        def col_expr(c: str) -> str:
            if c in keymap:
                return f"{c} + k.k * {strides[keymap[c]]} AS {c}"
            if tagged and t == "documents" and c == "text":
                return "translate(text, ci.frm, ci.tto) AS text"
            if tagged and t == "embeddings" and c == "embedding":
                return (
                    "CAST(list_transform(generate_series(1, len(embedding)), "
                    "i -> embedding[sp.perm[i]] * sp.signs[i]) AS FLOAT[]) "
                    "AS embedding"
                )
            return c

        sel = ", ".join(col_expr(c) for c in cols)
        joins = ""
        if tagged and t == "documents":
            joins = " JOIN cipher ci ON ci.k = k.k"
        elif tagged and t == "embeddings":
            joins = " JOIN sperm sp ON sp.k = k.k"
        con.execute(
            f"COPY (SELECT {sel} FROM '{args.src}/{t}.parquet', "
            f"(SELECT unnest(generate_series(0, {args.copies - 1})) AS k) k"
            f"{joins}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        (n,) = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()
        print(f"{t}: {n} rows ({args.copies} copies, payloads={args.payloads})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
