#!/usr/bin/env python
"""Spot-bench individual catalog queries with the noop sink.

Isolates a query's computation from the collect/count action the
headline bench uses (guide §1.4): the noop sink materializes every
column of every row and discards it, so the measured time is the
plan, not the sink. Prints per-query cold + warm (min of N) seconds
as one JSON line; also reports the count()-action time for
comparability with bench.py.

Usage:
    python tools/bench_spot.py q1 q2 ... [--sf DIR] [--reps 3]
                              [--action noop|count|both]

Honors SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR like bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--action", default="both", choices=["noop", "count", "both"])
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ndvi_etl_pipeline_spark.plans.queries import REGISTRY
    from ndvi_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    n_cpus = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)
    spark = get_spark(app_name="bench_spot", shuffle_partitions=n_cpus)
    # same non-registry JIT warmup as bench.py
    spark.range(0, 1_000_000, 1, n_cpus).groupBy((F.col("id") % 7).alias("k")).count().count()

    def run(name: str, action: str) -> dict:
        sc = spark.sparkContext

        def once() -> float:
            df = REGISTRY[name].builder(spark, args.sf)
            t0 = time.perf_counter()
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            return dt

        sc.setJobDescription(f"spot:{name}:{action}")
        cold = once()
        warms = [once() for _ in range(args.reps)]
        sc.setJobDescription(None)
        return {"cold": round(cold, 3), "warm": round(min(warms), 3),
                "warms": [round(w, 3) for w in warms]}

    out: dict = {"sf": args.sf, "cpus": n_cpus, "queries": {}}
    for name in args.names:
        if name not in REGISTRY:
            print(f"unknown query {name!r}", file=sys.stderr)
            return 2
        r: dict = {}
        for action in (["noop", "count"] if args.action == "both" else [args.action]):
            r[action] = run(name, action)
            print(f"{name} [{action}]: warm {r[action]['warm']}s cold {r[action]['cold']}s",
                  file=sys.stderr)
        out["queries"][name] = r
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
