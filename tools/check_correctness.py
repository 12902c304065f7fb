#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 in Spark AND its
oracle_sql() twin in DuckDB (tables pre-registered as views), then
compares row count, column names, and values (rows sorted by all
columns; floats compared exactly after the queries' own rounding,
with a small-tolerance fallback report so FP drift is visible).

Usage: python tools/check_correctness.py [names...] [--sf DIR]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df) -> list[tuple]:
    """pandas DataFrame → sorted list of canonical tuples."""
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        try:
            if v is None or pd.isna(v):
                return ("\x00null",)
        except (TypeError, ValueError):
            pass
        if isinstance(v, float):
            if math.isnan(v):
                return ("\x00null",)
            r = round(v, 9)
            # Distinguish -0.0 from +0.0 the way the driver's value-hash
            # does (round(-1e-9, 6) is -0.0 in DuckDB but +0.0 in Spark;
            # tuple == would hide it since -0.0 == 0.0). copysign makes
            # the sign part of the canonical form.
            return ("f", r, math.copysign(1.0, r))
        if isinstance(v, (pd.Timestamp,)):
            return ("t", v.isoformat())
        if hasattr(v, "isoformat"):
            return ("t", v.isoformat())
        if isinstance(v, (int,)):
            return ("i", int(v))
        return ("s", str(v))

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="write per-query JSON results here")
    ap.add_argument("--shard", default=None, help="i/n: run the i-th of n alphabetical shards")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from ndvi_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="check_correctness", shuffle_partitions=16)
    con = duck_connection(args.sf)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or sorted(qs)
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        # 1-based i (i/n reads "i-th of n"); i==n wraps to residue 0.
        names = [nm for k, nm in enumerate(names) if k % n == i % n]

    n_pass = n_fail = n_weak = 0
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            results[name] = {"status": "fail", "err": str(e).splitlines()[0][:160]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(sdf)} (no oracle, rows-only check)")
            results[name] = {"status": "weak", "rows": len(sdf)}
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            results[name] = {"status": "fail", "err": str(e).splitlines()[0][:160]}
            n_fail += 1
            continue
        dt = time.time() - t0

        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount spark={len(sdf)} duck={len(odf)}")
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            problems.append(f"columns spark={s_cols} duck={o_cols}")
        if not problems:
            s_rows, o_rows = canon(sdf), canon(odf)
            if s_rows != o_rows:
                diffs = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
                k = diffs[0] if diffs else min(len(s_rows), len(o_rows)) - 1
                problems.append(
                    f"values differ at sorted row {k}:\n"
                    f"        spark: {s_rows[k] if k < len(s_rows) else '<none>'}\n"
                    f"        duck : {o_rows[k] if k < len(o_rows) else '<none>'}"
                )
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
            results[name] = {"status": "fail", "err": "; ".join(problems)[:300]}
            n_fail += 1
        else:
            print(f"PASS  {name} ({dt:.1f}s, {len(sdf)} rows)")
            results[name] = {"status": "pass", "rows": len(sdf), "sec": round(dt, 2)}
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    if args.out:
        import json

        Path(args.out).write_text(
            json.dumps(
                {
                    "summary": {
                        "n_pass": n_pass,
                        "n_fail": n_fail,
                        "n_weak": n_weak,
                        "sf": args.sf,
                    },
                    "queries": results,
                },
                indent=1,
                sort_keys=True,
            )
        )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
