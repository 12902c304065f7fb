#!/usr/bin/env python
"""Microbenchmark: what does a per-row file identity actually cost at
600 M rows? Round-8 measured the in-debt DV read at 60-90x a plain
filtered scan and attributed it to `_metadata.file_path` string
materialization. This isolates the candidate keying strategies so the
fix targets the real dominator:

  plain        scan + sum agg, no metadata at all (the floor)
  size_mtime   + _metadata.file_size / file_modification_time (two
               constant-per-file LONG fills — the all-numeric key)
  hash_raw     + xxhash64(_metadata.file_path) (string fill + hash,
               no decode, no extra join)
  decoded      + the url_decode/regexp chain the current DV read pays
               (sources/lake.py:_dv_meta_cols), max-agged
  decoded_join + broadcast string join rel->int fid on top (the
               current bulk-regime table-side cost, minus the DV
               anti-join itself)

Usage: python tools/bench_dv_micro.py [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="bench_sf100")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from ndvi_etl_pipeline_spark.session import get_spark
    from ndvi_etl_pipeline_spark.sources.lake import _dv_meta_cols

    spark = get_spark(app_name="bench_dv_micro", shuffle_partitions=32)
    src = os.path.join(args.sf_dir, "lineitem.parquet")
    base = spark.read.parquet(src)
    n_files = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    ) if os.path.isdir(src) else 1

    rel, pos = _dv_meta_cols(args.sf_dir)

    cases = {
        "plain": lambda: base.agg(F.sum("l_quantity")).collect(),
        "size_mtime": lambda: base.select(
            "l_quantity",
            F.col("_metadata.file_size").alias("fs"),
            F.unix_micros(F.col("_metadata.file_modification_time")).alias(
                "mt"
            ),
        )
        .agg(F.sum("l_quantity"), F.max("fs"), F.max("mt"))
        .collect(),
        "row_index": lambda: base.select(
            "l_quantity", F.col("_metadata.row_index").alias("ri")
        )
        .agg(F.sum("l_quantity"), F.max("ri"))
        .collect(),
        "hash_raw": lambda: base.select(
            "l_quantity",
            F.xxhash64(F.col("_metadata.file_path")).alias("h"),
        )
        .agg(F.sum("l_quantity"), F.max("h"))
        .collect(),
        "decoded": lambda: base.select(
            "l_quantity", rel.alias("rel")
        )
        .agg(F.sum("l_quantity"), F.max("rel"))
        .collect(),
    }

    out = {"sf_dir": args.sf_dir, "n_files": n_files, "cases": {}}
    for name, fn in cases.items():
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 2))
        out["cases"][name] = min(times)
        print(f"{name:14s} {min(times):7.2f}s  (runs: {times})", flush=True)
    print(json.dumps(out))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
