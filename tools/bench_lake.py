#!/usr/bin/env python
"""Lake-path benchmark tier (round-6 ask: the lake's perf story was
plan-shape tests only — make it numbers).

Builds a lake table from the scale factor's `lineitem` once, then
measures the four lake read/write shapes against honest comparators:

  scan_plain    spark.read.parquet over the lake's OWN data files —
                same bytes, same layout, so the lake ratios isolate
                metadata planning + format overhead, never layout.
  scan_lake     lake_read (library path: manifest planning + pinned
                schema scan). Target: ~1.0× plain.
  scan_ds       spark.read.format("lake") — the Python DataSource
                (Arrow batches through Python workers). The verdict's
                target: ≤1.5× plain at sf10.
  dv_read       10% of rows dv-deleted (merge-on-read): scan+agg with
                the broadcast anti-join applied, vs the equivalent
                relational filter on plain parquet, vs DuckDB.
  cdf_incr      after a 1% append: lake_read_cdf(from) aggregation vs
                recomputing the full-table aggregate — the O(delta) vs
                O(table) story, plus DuckDB full recompute.
  merge         upsert of 1% updates (rewrite hit files + append):
                wall seconds + rows/sec, vs DuckDB materializing the
                merged state (anti-join + union CTAS).

Each Spark measurement: cold first run, warm = min of 2 recomputes
(clearCache between). DuckDB: min of 2. One JSON document to stdout
and --out.

Usage: python tools/bench_lake.py [--sf-dir DIR] [--out FILE]
                                  [--keep-table DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(fn, runs: int = 2):
    """(cold, warm=min of `runs` post-cold runs, last_result)."""
    t0 = time.perf_counter()
    res = fn()
    cold = time.perf_counter() - t0
    warm = []
    for _ in range(runs):
        t0 = time.perf_counter()
        res = fn()
        warm.append(time.perf_counter() - t0)
    return round(cold, 3), round(min(warm), 3), res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep-table", default=None,
                    help="reuse/build the lake table here instead of a temp dir")
    args = ap.parse_args()

    from ndvi_etl_pipeline_spark.session import get_spark
    from ndvi_etl_pipeline_spark.sources import lake_datasource
    from ndvi_etl_pipeline_spark.sources.lake import (
        lake_delete,
        lake_latest_version,
        lake_merge,
        lake_read,
        lake_read_cdf,
        lake_write,
    )
    from ndvi_etl_pipeline_spark.sources.testdata import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    n_cpus = int(cpus) if cpus.isdigit() else (os.cpu_count() or 8)
    spark = get_spark(app_name="bench-lake", shuffle_partitions=n_cpus)
    lake_datasource.register(spark)

    base = args.keep_table or tempfile.mkdtemp(prefix="bench_lake_")
    table = os.path.join(base, "lineitem_lake")
    fresh = not os.path.isdir(os.path.join(table, "_manifests"))
    li = load_table(spark, "lineitem", args.sf_dir)
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag",
    ]
    li = li.select(*[c for c in cols if c in li.columns])
    if fresh:
        t0 = time.perf_counter()
        lake_write(li.repartition(n_cpus), table)
        build_s = round(time.perf_counter() - t0, 3)
    else:
        build_s = None
    n_rows = lake_read(spark, table).count()

    result: dict = {
        "sf": args.sf_dir,
        "n_rows": n_rows,
        "build_s": build_s,
        "spark": {},
        "duckdb": {},
        "ratios": {},
    }

    def agg_of(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        ).collect()[0]

    raw_files = sorted(
        glob.glob(os.path.join(table, "data", "*", "*.parquet"))
    )

    def scan_plain():
        r = agg_of(spark.read.parquet(*raw_files))
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    def scan_lake():
        r = agg_of(lake_read(spark, table))
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    def scan_ds():
        r = agg_of(
            spark.read.format("lake").option("path", table).load()
        )
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    def scan_plain_fullwidth():
        # every column materialized before the agg — the byte-equal
        # comparator for the Python DataSource, whose API (Spark 4.1)
        # has filter pushdown but NO column pruning hook: scan_ds
        # always decodes the full width, so scan_ds vs scan_plain
        # includes the 2-of-8-columns pruning gap, and
        # scan_ds vs THIS isolates the Arrow/Python-worker overhead.
        df = spark.read.parquet(*raw_files)
        aggs = [F.count(c).alias(f"c_{c}") for c in df.columns] + [
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev")
        ]
        r = df.agg(*aggs).collect()[0]
        spark.catalog.clearCache()
        return (r[0], r["rev"])

    def scan_ds_pruned():
        # the round-7 fix for the DS width penalty: an explicit
        # option("columns") projection decodes 2 of 8 columns — the
        # honest comparator is scan_plain, whose Catalyst plan prunes
        # to the same 2 columns automatically
        r = agg_of(
            spark.read.format("lake")
            .option("path", table)
            .option("columns", "l_extendedprice,l_discount")
            .load()
        )
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    for name, fn in (("scan_plain", scan_plain), ("scan_lake", scan_lake),
                     ("scan_ds", scan_ds), ("scan_ds_pruned", scan_ds_pruned),
                     ("scan_plain_fullwidth", scan_plain_fullwidth)):
        cold, warm, res = timed(fn)
        result["spark"][name] = {"cold": cold, "warm": warm}
        sys.stderr.write(f"{name}: warm {warm}s cold {cold}s -> {res}\n")
    result["ratios"]["scan_lake_vs_plain"] = round(
        result["spark"]["scan_lake"]["warm"] / result["spark"]["scan_plain"]["warm"], 3
    )
    result["ratios"]["scan_ds_vs_plain"] = round(
        result["spark"]["scan_ds"]["warm"] / result["spark"]["scan_plain"]["warm"], 3
    )
    result["ratios"]["scan_ds_pruned_vs_plain"] = round(
        result["spark"]["scan_ds_pruned"]["warm"]
        / result["spark"]["scan_plain"]["warm"], 3
    )
    result["ratios"]["scan_ds_vs_plain_fullwidth"] = round(
        result["spark"]["scan_ds"]["warm"]
        / result["spark"]["scan_plain_fullwidth"]["warm"], 3
    )

    # DuckDB comparator for the same scan
    import duckdb

    con = duckdb.connect()
    fl = os.path.join(table, "data", "*", "*.parquet")
    dd = []
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(
            f"SELECT count(*), round(sum(l_extendedprice * (1 - l_discount)), 2) "
            f"FROM read_parquet('{fl}')"
        ).fetchall()
        dd.append(time.perf_counter() - t0)
    result["duckdb"]["scan"] = round(min(dd), 3)

    # --- streaming DS with projection (round-7 ask #6) -------------------
    # one availableNow drain of the whole table through the streaming
    # path WITH option("columns"): the projection must compose with
    # streaming (schema narrows at plan time, executors decode 2 of 8
    # columns), so a full drain should cost ≈ the batch pruned scan.
    # Fresh checkpoint per run, so every run replays the whole table.
    def stream_ds_pruned():
        ck = tempfile.mkdtemp(prefix="lake_bench_ck_")
        acc: list = []
        q = (
            spark.readStream.format("lake")
            .option("path", table)
            .option("columns", "l_extendedprice,l_discount")
            .load()
            .writeStream.foreachBatch(
                lambda b, i: acc.append(
                    b.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.round(
                            F.sum(
                                F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))
                            ),
                            2,
                        ).alias("rev"),
                    ).collect()[0]
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        shutil.rmtree(ck, ignore_errors=True)
        spark.catalog.clearCache()
        return (sum(r["n"] for r in acc),)

    cold, warm, res = timed(stream_ds_pruned)
    result["spark"]["stream_ds_pruned"] = {"cold": cold, "warm": warm}
    sys.stderr.write(f"stream_ds_pruned: warm {warm}s cold {cold}s -> {res}\n")
    result["ratios"]["stream_ds_pruned_vs_batch_pruned"] = round(
        warm / result["spark"]["scan_ds_pruned"]["warm"], 3
    )

    # --- DV-heavy read: 10% of rows merge-on-read deleted ---------------
    v_before_dv = lake_latest_version(table)
    t0 = time.perf_counter()
    lake_delete(spark, table, F.col("l_orderkey") % 10 == 3, strategy="dv")
    result["spark"]["dv_delete_commit"] = round(time.perf_counter() - t0, 3)

    def dv_read():
        r = agg_of(lake_read(spark, table))
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    def plain_filtered():
        r = agg_of(
            spark.read.parquet(*raw_files).filter(
                ~(F.col("l_orderkey") % 10 == 3)
            )
        )
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    cold, warm, res_dv = timed(dv_read)
    result["spark"]["dv_read"] = {"cold": cold, "warm": warm}
    cold, warm, res_pf = timed(plain_filtered)
    result["spark"]["plain_filtered_read"] = {"cold": cold, "warm": warm}
    # correctness while timing: counts exact; the double revenue sum
    # is order-dependent in its last bits at ~1e12 magnitude, so
    # compare with relative tolerance instead of the rounded string
    assert res_dv[0] == res_pf[0], (res_dv, res_pf)
    assert abs(res_dv[1] - res_pf[1]) <= 1e-9 * abs(res_pf[1]), (res_dv, res_pf)
    result["ratios"]["dv_read_vs_plain_filter"] = round(
        result["spark"]["dv_read"]["warm"]
        / result["spark"]["plain_filtered_read"]["warm"], 3
    )
    dd = []
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(
            f"SELECT count(*), round(sum(l_extendedprice * (1 - l_discount)), 2) "
            f"FROM read_parquet('{fl}') WHERE NOT (l_orderkey % 10 = 3)"
        ).fetchall()
        dd.append(time.perf_counter() - t0)
    result["duckdb"]["filtered_scan"] = round(min(dd), 3)
    sys.stderr.write(f"dv_read: {result['spark']['dv_read']}\n")

    # --- CDF incremental vs full recompute -------------------------------
    v_pre_append = lake_latest_version(table)
    delta = li.filter(F.col("l_orderkey") % 97 == 0).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(2_000_000_000)
    )
    lake_write(delta.repartition(max(2, n_cpus // 8)), table)

    def cdf_incr():
        df = lake_read_cdf(spark, table, from_version=v_pre_append)
        r = df.filter(F.col("_change_type") == "insert").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        ).collect()[0]
        spark.catalog.clearCache()
        return (r["n"], r["s"])

    def full_recompute():
        r = agg_of(lake_read(spark, table))
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    cold, warm, _ = timed(cdf_incr)
    result["spark"]["cdf_incremental"] = {"cold": cold, "warm": warm}
    cold, warm, _ = timed(full_recompute)
    result["spark"]["full_recompute"] = {"cold": cold, "warm": warm}
    result["ratios"]["cdf_vs_full_recompute"] = round(
        result["spark"]["cdf_incremental"]["warm"]
        / result["spark"]["full_recompute"]["warm"], 3
    )
    # the DV read's fair yardstick at bulk-delete scale: its anti-join
    # must touch every row, like a full-table aggregate does — the
    # 2-column plain filter it also reports against gets to prune 6 of
    # 8 columns, which no row-level merge-on-read can
    result["ratios"]["dv_read_vs_full_scan"] = round(
        result["spark"]["dv_read"]["warm"]
        / result["spark"]["full_recompute"]["warm"], 3
    )
    dd = []
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(
            f"SELECT count(*), round(sum(l_extendedprice * (1 - l_discount)), 2) "
            f"FROM read_parquet('{os.path.join(table, 'data', '*', '*.parquet')}')"
        ).fetchall()
        dd.append(time.perf_counter() - t0)
    result["duckdb"]["full_recompute"] = round(min(dd), 3)
    sys.stderr.write(f"cdf_incremental: {result['spark']['cdf_incremental']}\n")

    # --- MERGE throughput (1% updates) ------------------------------------
    upd = li.filter(F.col("l_orderkey") % 101 == 7).withColumn(
        "l_quantity", F.col("l_quantity") + 1
    )
    n_upd = upd.count()
    t0 = time.perf_counter()
    lake_merge(spark, upd, table, ("l_orderkey", "l_partkey", "l_suppkey"))
    merge_s = round(time.perf_counter() - t0, 3)
    result["spark"]["merge"] = {
        "seconds": merge_s,
        "update_rows": n_upd,
        "rows_per_s": round(n_upd / merge_s, 1) if merge_s else None,
    }
    # DuckDB comparator: materialize the merged state relationally
    upd_path = os.path.join(base, "updates.parquet")
    if not os.path.exists(upd_path):
        upd.coalesce(4).write.mode("overwrite").parquet(upd_path)
    dd = []
    for i in range(2):
        dst = os.path.join(base, f"duck_merge_{i}.parquet")
        t0 = time.perf_counter()
        con.execute(
            f"""
            COPY (
              SELECT * FROM read_parquet('{upd_path}/*.parquet')
              UNION ALL
              SELECT b.* FROM read_parquet('{fl}') b
              ANTI JOIN read_parquet('{upd_path}/*.parquet') u
              USING (l_orderkey, l_partkey, l_suppkey)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        )
        dd.append(time.perf_counter() - t0)
        try:
            os.remove(dst)
        except OSError:
            pass
    result["duckdb"]["merge_materialize"] = round(min(dd), 3)
    result["ratios"]["merge_vs_duckdb"] = round(
        merge_s / result["duckdb"]["merge_materialize"], 3
    )
    sys.stderr.write(f"merge: {result['spark']['merge']}\n")

    # --- merge-on-read MERGE (same 1%-update shape, different slice) ----
    # cost model: DV preimage addresses + postimage appends, O(delta)
    # instead of O(hit-file bytes) — the round-7 scale path. Measured
    # against the SAME DuckDB CTAS comparator (its cost is unchanged:
    # it always materializes the full merged state).
    upd2 = li.filter(F.col("l_orderkey") % 103 == 11).withColumn(
        "l_quantity", F.col("l_quantity") + 2
    )
    n_upd2 = upd2.count()
    t0 = time.perf_counter()
    lake_merge(
        spark, upd2, table, ("l_orderkey", "l_partkey", "l_suppkey"),
        strategy="mor",
    )
    mor_s = round(time.perf_counter() - t0, 3)
    result["spark"]["merge_mor"] = {
        "seconds": mor_s,
        "update_rows": n_upd2,
        "rows_per_s": round(n_upd2 / mor_s, 1) if mor_s else None,
    }
    result["ratios"]["merge_mor_vs_duckdb"] = round(
        mor_s / result["duckdb"]["merge_materialize"], 3
    )
    result["ratios"]["merge_mor_vs_cow"] = round(mor_s / merge_s, 3)

    def mor_read():
        r = agg_of(lake_read(spark, table))
        spark.catalog.clearCache()
        return (r["n"], r["rev"])

    cold, warm, _ = timed(mor_read)
    result["spark"]["post_mor_merge_read"] = {"cold": cold, "warm": warm}
    sys.stderr.write(
        f"merge_mor: {result['spark']['merge_mor']} "
        f"(vs cow {result['ratios']['merge_mor_vs_cow']}x)\n"
    )
    # --- steady-state incremental stream trigger --------------------------
    # the fresh-checkpoint stream_ds_pruned drain above pays a ~1 s
    # FIXED micro-batch bookkeeping cost (constant across sf1/sf10 —
    # see both artifacts), so its full-drain ratio overstates
    # steady-state cost. This measures the realistic shape: a RUNNING
    # stream (offsets established) receiving a ~1% append processes
    # ONE incremental trigger — O(delta) scan + the fixed overhead.
    sv = lake_latest_version(table)  # start past the DV/merge history:
    # a fresh stream otherwise replays from v=-1 and refuses the
    # non-append commits (the correct non-CDF contract)

    def drain_once(ck: str) -> float:
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("lake")
            .option("path", table)
            .option("startingVersion", str(sv))
            .option("columns", "l_extendedprice,l_discount")
            .load()
            .writeStream.foreachBatch(lambda b, i: b.count())
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return round(time.perf_counter() - t0, 3)

    ck_inc = tempfile.mkdtemp(prefix="lake_bench_ck_inc_")
    drain_once(ck_inc)  # untimed: pins offsets at the current snapshot
    inc = li.filter(F.col("l_orderkey") % 113 == 5).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(3_000_000_000)
    )
    lake_write(inc, table)
    result["spark"]["stream_incremental_trigger"] = drain_once(ck_inc)
    shutil.rmtree(ck_inc, ignore_errors=True)
    result["ratios"]["stream_incremental_vs_batch_pruned"] = round(
        result["spark"]["stream_incremental_trigger"]
        / result["spark"]["scan_ds_pruned"]["warm"], 3
    )
    sys.stderr.write(
        f"stream_incremental_trigger: "
        f"{result['spark']['stream_incremental_trigger']}s "
        f"({result['ratios']['stream_incremental_vs_batch_pruned']}x "
        f"batch pruned full scan)\n"
    )

    result["history_note"] = (
        f"dv at v{v_before_dv + 1}, append at v{v_pre_append + 1}, "
        f"merge last; table kept at {table}"
        if args.keep_table
        else "temp table removed"
    )

    out = json.dumps(result)
    print(out)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out + "\n")
    if not args.keep_table:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
