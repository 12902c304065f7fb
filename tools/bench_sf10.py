#!/usr/bin/env python
"""sf10 benchmark tier for the SHUFFLE-BOUND families (round-4 ask:
show where the Spark-vs-single-node curves cross as data grows, the
way sf1 already shows it for minhash at 0.08×).

Runs a fixed set of shuffle-bound / compute-bound queries — the
item-CF pair (the one genuinely shuffle-bound plan in the catalog),
the dedup tier, curation, two selection members, and brute-force ANN
as the linear-scan control — at a fabricated sf10
(tools/make_bench_sf.py --copies 100) on BOTH engines:

  Spark:  cold (first run, includes JIT) + warm = min of 2 recomputes
          (clearCache between runs; count() on plans whose joins
          survive count-elimination was audited at sf1 — these all
          materialize via collect() for timing honesty).
  DuckDB: the registered oracle SQL, min of N runs with a wall-clock
          budget — a query whose FIRST run exceeds the budget reports
          that single honest measurement instead of burning the
          harness (the crossover being measured IS DuckDB leaving the
          feasible zone).

Prints one JSON document (written to --out as well) shaped like the
BENCH_sf1 artifact: {"spark": {...}, "duckdb": {...},
"per_query_ratio": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dedup_minhash_lsh is measurable here since round 5: make_bench_sf's
# default `tagged` payload mode replicates text through a PER-COPY
# substitution cipher, so duplicate clusters keep their sf0.1 SIZE and
# only their COUNT scales with --copies — candidate-pair volume grows
# linearly, the shape a real crawl has. (The old verbatim replication
# grew every cluster ×copies and pair volume quadratically — a
# generator artifact that forced the round-4 exclusion.)
QUERIES = (
    "itemcf_similar_parts",
    "itemcf_user_recs",
    "dedup_exact_stats",
    "dedup_minhash_lsh",
    "curation_pipeline",
    "exact_substring_coverage",
    "dsir_importance_topk",
    "ann_bruteforce_topk",
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="bench_sf10")
    ap.add_argument("--out", default=None)
    ap.add_argument("--duckdb-budget", type=float, default=900.0,
                    help="stop re-running a DuckDB query once its runs exceed this many seconds total")
    ap.add_argument("--skip-duckdb", action="store_true")
    ap.add_argument("--skip-spark", action="store_true")
    ap.add_argument("--duckdb-mem", default="90GB")
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset (the sf100 spot tier runs only "
        "the shuffle-bound families worth 600M rows of wall clock)",
    )
    args = ap.parse_args()
    global QUERIES
    if args.queries:
        QUERIES = tuple(q.strip() for q in args.queries.split(",") if q.strip())

    from ndvi_etl_pipeline_spark.plans.queries import REGISTRY

    result: dict = {"sf": args.sf_dir, "queries": list(QUERIES)}

    if not args.skip_spark:
        from pyspark.sql import functions as F

        from ndvi_etl_pipeline_spark.session import get_spark

        cpus = os.cpu_count() or 8
        spark = get_spark(app_name="bench_sf10", shuffle_partitions=cpus)
        spark.sparkContext.setLogLevel("ERROR")
        # non-registry JIT warm-up (same honesty device as bench.py)
        spark.range(0, 1_000_000, 1, cpus).groupBy(
            (F.col("id") % 7).alias("k")
        ).count().count()
        cold: dict[str, float] = {}
        warm: dict[str, float] = {}
        for name in QUERIES:
            t0 = time.perf_counter()
            REGISTRY[name].builder(spark, args.sf_dir).collect()
            cold[name] = round(time.perf_counter() - t0, 3)
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                REGISTRY[name].builder(spark, args.sf_dir).collect()
                runs.append(time.perf_counter() - t0)
            warm[name] = round(min(runs), 3)
            sys.stderr.write(f"spark {name}: warm {warm[name]}s (cold {cold[name]}s)\n")
        result["spark"] = {
            "queries": warm,
            "cold_queries": cold,
            "value": round(sum(warm.values()), 3),
            "cold_total": round(sum(cold.values()), 3),
            "unit": "sec",
        }

    if not args.skip_duckdb:
        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.cpu_count() or 8}")
        # sf100 honesty: without a cap DuckDB's default (80% of RAM)
        # let the 600M-row itemcf oracle OOM-kill the process at
        # 121 GB RSS; a bounded limit + spill directory measures the
        # out-of-core plan instead of dying (that IS the single-node
        # story at this scale)
        con.execute(f"SET memory_limit = '{args.duckdb_mem}'")
        con.execute("SET temp_directory = '/tmp/duckdb_spill'")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
            )
        dq: dict[str, float] = {}
        dnf: dict[str, str] = {}
        for name in QUERIES:
            runs: list[float] = []
            spent = 0.0
            try:
                for _ in range(3):
                    t0 = time.perf_counter()
                    con.execute(REGISTRY[name].oracle).fetchall()
                    dt = time.perf_counter() - t0
                    runs.append(dt)
                    spent += dt
                    if spent > args.duckdb_budget:
                        break
            except Exception as e:  # noqa: BLE001 — OOM/out-of-disk IS
                # the measurement at this tier; record it, keep going
                dq[name] = None
                dnf[name] = (
                    f"DNF after {round(time.perf_counter() - t0, 1)}s: "
                    + str(e).splitlines()[0][:200]
                )
                sys.stderr.write(f"duckdb {name}: DNF ({dnf[name]})\n")
                continue
            dq[name] = round(min(runs), 3)
            sys.stderr.write(f"duckdb {name}: {dq[name]}s ({len(runs)} runs)\n")
        result["duckdb"] = {
            "queries": dq,
            "total": round(sum(v for v in dq.values() if v), 3),
        }
        if dnf:
            result["duckdb"]["dnf"] = dnf

    if "spark" in result and "duckdb" in result:
        result["per_query_ratio"] = {
            n: round(result["spark"]["queries"][n] / result["duckdb"]["queries"][n], 2)
            for n in QUERIES
            if result["duckdb"]["queries"].get(n)
        }
        result["ratio_total"] = round(
            result["spark"]["value"] / result["duckdb"]["total"], 2
        )

    text = json.dumps(result, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
