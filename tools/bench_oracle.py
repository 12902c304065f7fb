#!/usr/bin/env python
"""Time the DuckDB oracle SQL for the headline queries at a given SF
dir — the single-node comparator for bench.py (same parquet, same
semantics). Prints one JSON line: {"queries": {name: sec}, "total": s,
"sf": dir}. Each query runs 3×; min is reported (co-tenant noise only
inflates)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from ndvi_etl_pipeline_spark.plans.queries import REGISTRY  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        if not spec.headline or not spec.oracle:
            continue
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchall()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
        sys.stderr.write(f"{name}: {out[name]}s\n")
    print(
        json.dumps(
            {"queries": out, "total": round(sum(out.values()), 3), "sf": sf_dir}
        )
    )


if __name__ == "__main__":
    main()
