"""Bilinear warp / resampling (SURVEY §4.2 item 3, the hardest kernel).

Reference semantics: compute_ndvi.py:162-179 (bilinear reprojection of
the continuous NDVI band) and load_to_postgis.py:90-136 (dtype-
dispatched warp to a metric CRS at fixed resolution). Both are
"build a destination grid, inverse-map each destination pixel into
the source, interpolate the 4 neighbors" — an affine (or projective)
grid resample.

Spark shape: `applyInPandas` per scene. One scene's mosaic is
memory-bounded (the reference loads whole scenes too), scenes warp in
parallel across executors, and the output is pixel/tile rows again —
closed under the engine's representations. Halo-exchange per-tile
warping (a self-join of tiles with their 8 neighbors) is the fallback
if single-scene mosaics ever exceed executor memory; at Landsat scene
sizes (~8000², 256 MB float32) per-scene is comfortably within a
4 GB executor.

Interpolation rule: a destination pixel is valid iff all 4 source
neighbors are finite (NaN = absent/invalid propagates) — the
conservative mask used for masked continuous data so invalid values
never bleed into valid output. Pixel-center convention:
src = (dst + 0.5) * scale - 0.5 (the standard GDAL/area mapping).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PIXEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def bilinear_sample(
    src: np.ndarray, sy: np.ndarray, sx: np.ndarray
) -> np.ndarray:
    """Vectorized bilinear sample of float64 `src` at fractional
    coordinates (sy, sx). Out-of-range or any-NaN-neighbor → NaN."""
    h, w = src.shape
    out = np.full(sy.shape, np.nan, dtype=np.float64)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    ok = (y0 >= 0) & (x0 >= 0) & (y0 + 1 <= h - 1) & (x0 + 1 <= w - 1)
    if not ok.any():
        return out
    y0o, x0o = y0[ok], x0[ok]
    wy = sy[ok] - y0o
    wx = sx[ok] - x0o
    v00 = src[y0o, x0o]
    v01 = src[y0o, x0o + 1]
    v10 = src[y0o + 1, x0o]
    v11 = src[y0o + 1, x0o + 1]
    val = (
        v00 * (1.0 - wy) * (1.0 - wx)
        + v01 * (1.0 - wy) * wx
        + v10 * wy * (1.0 - wx)
        + v11 * wy * wx
    )
    out[ok] = val  # NaN neighbors propagate through the arithmetic
    return out


def resample_scene_pixels(
    pixels: DataFrame,
    out_height: int,
    out_width: int,
    scale_y: float,
    scale_x: float,
    value_col: str = "ndvi",
    src_height: int | None = None,
    src_width: int | None = None,
) -> DataFrame:
    """Bilinear resample of per-scene pixel rows onto an
    out_height×out_width destination grid where destination pixel
    (i, j) samples source ((i+0.5)·scale_y−0.5, (j+0.5)·scale_x−0.5).

    Double precision end to end so results are reproducible against a
    SQL formulation of the same arithmetic. Output: (scene_id, y, x,
    v) with invalid/absent-neighbor destinations dropped.
    """

    def warp(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (scene_id,) = key
        h = src_height or int(pdf["y"].max()) + 1
        w = src_width or int(pdf["x"].max()) + 1
        src = np.full((h, w), np.nan, dtype=np.float64)
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        src[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = vals
        jj, ii = np.meshgrid(np.arange(out_width), np.arange(out_height))
        sy = (ii.ravel() + 0.5) * scale_y - 0.5
        sx = (jj.ravel() + 0.5) * scale_x - 0.5
        v = bilinear_sample(src, sy, sx)
        keep = ~np.isnan(v)
        return pd.DataFrame(
            {
                "scene_id": scene_id,
                "y": ii.ravel()[keep].astype(np.int32),
                "x": jj.ravel()[keep].astype(np.int32),
                "v": v[keep],
            }
        )

    return pixels.groupBy("scene_id").applyInPandas(warp, schema=PIXEL_OUT_SCHEMA)


def warp_with_mapping(
    pixels: DataFrame,
    out_height: int,
    out_width: int,
    inverse_map: Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]],
    value_col: str = "ndvi",
    src_height: int | None = None,
    src_width: int | None = None,
) -> DataFrame:
    """General warp: `inverse_map(dst_y, dst_x) -> (src_y, src_x)` in
    fractional source pixels — the hook for CRS reprojection (the
    mapping composes dst-grid→dst-CRS→src-CRS→src-grid, cf.
    load_to_postgis.py:90-136). Runs per scene like
    `resample_scene_pixels`."""

    def warp(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (scene_id,) = key
        h = src_height or int(pdf["y"].max()) + 1
        w = src_width or int(pdf["x"].max()) + 1
        src = np.full((h, w), np.nan, dtype=np.float64)
        src[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf[value_col].to_numpy(
            dtype=np.float64
        )
        jj, ii = np.meshgrid(np.arange(out_width), np.arange(out_height))
        sy, sx = inverse_map(ii.ravel().astype(np.float64), jj.ravel().astype(np.float64))
        v = bilinear_sample(src, np.asarray(sy), np.asarray(sx))
        keep = ~np.isnan(v)
        return pd.DataFrame(
            {
                "scene_id": scene_id,
                "y": ii.ravel()[keep].astype(np.int32),
                "x": jj.ravel()[keep].astype(np.int32),
                "v": v[keep],
            }
        )

    return pixels.groupBy("scene_id").applyInPandas(warp, schema=PIXEL_OUT_SCHEMA)


TILE_STRIP_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("recv_ty", T.IntegerType()),
        T.StructField("recv_tx", T.IntegerType()),
        T.StructField("y0", T.IntegerType()),
        T.StructField("x0", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def warp_bilinear_tiled(
    tiles: DataFrame,
    out_height: int,
    out_width: int,
    scale_y: float,
    scale_x: float,
) -> DataFrame:
    """Halo-exchange tiled warp — the scale path for scenes too large
    for the per-scene canvas (SURVEY §4.2 item 3's "only if needed"
    variant, now implemented).

    Instead of assembling one mosaic per scene, every source tile
    exchanges edge STRIPS of width `halo` with its 8 neighbors (one
    narrow emission pass + one shuffle keyed by receiving tile), each
    receiver assembles a (P+2·halo)² padded canvas, and computes
    exactly the destination tiles whose source footprint CENTER falls
    in it. Shuffle volume is (1+2·halo/P)² × the tile bytes —
    ~1.2× at P=256 — versus the per-scene path's requirement that a
    whole scene fit one task's memory.

    halo is derived from the scale: a destination tile's footprint
    spans P·scale source pixels around its center, so
    halo = ⌈P·max(scale)/2⌉ + 2; the method requires halo < P
    (scale ≲ 2 — beyond that, chain two pyramid/warp steps, exactly
    how GDAL chains overview levels for big decimations).

    Identical sampling semantics to `resample_scene_pixels`
    (pixel-center inverse map, all-4-neighbor validity): the equality
    test in tests/test_warp.py checks bit-for-bit agreement.
    """

    def _tile_size(df: DataFrame) -> int:
        r = df.select("height").first()
        return int(r.height)

    P = _tile_size(tiles)
    halo = int(np.ceil(P * max(abs(scale_y), abs(scale_x)) / 2.0)) + 2
    if halo >= P:
        raise ValueError(
            f"halo {halo} >= tile {P}: scale too large for 1-ring exchange; "
            "chain an overview/pyramid step first"
        )

    def emit(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.data, dtype=np.float32).reshape(
                    row.height, row.width
                )
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        rty, rtx = row.tile_y + dy, row.tile_x + dx
                        if rty < 0 or rtx < 0:
                            continue
                        # part of THIS tile inside receiver's padded extent
                        if dy == 0:
                            rs, re = 0, row.height
                        elif dy == -1:  # receiver above: my first halo rows
                            rs, re = 0, halo
                        else:  # receiver below: my last halo rows
                            rs, re = row.height - halo, row.height
                        if dx == 0:
                            cs, ce = 0, row.width
                        elif dx == -1:
                            cs, ce = 0, halo
                        else:
                            cs, ce = row.width - halo, row.width
                        strip = np.ascontiguousarray(arr[rs:re, cs:ce])
                        rows.append(
                            {
                                "scene_id": row.scene_id,
                                "recv_ty": rty,
                                "recv_tx": rtx,
                                "y0": row.y0 + rs,
                                "x0": row.x0 + cs,
                                "height": strip.shape[0],
                                "width": strip.shape[1],
                                "data": strip.tobytes(),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    strips = tiles.mapInPandas(emit, schema=TILE_STRIP_SCHEMA)

    n_dty = -(-out_height // P)
    n_dtx = -(-out_width // P)

    def assemble_and_warp(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        scene_id, rty, rtx = key
        oy, ox = int(rty) * P - halo, int(rtx) * P - halo
        canvas = np.full((P + 2 * halo, P + 2 * halo), np.nan, dtype=np.float64)
        for row in pdf.itertuples(index=False):
            a = np.frombuffer(row.data, dtype=np.float32).reshape(row.height, row.width)
            canvas[row.y0 - oy : row.y0 - oy + row.height,
                   row.x0 - ox : row.x0 - ox + row.width] = a

        outs = []
        # destination tiles whose footprint center maps into this tile
        for dty in range(n_dty):
            if int(((dty + 0.5) * P * scale_y) // P) != rty:
                continue
            for dtx in range(n_dtx):
                if int(((dtx + 0.5) * P * scale_x) // P) != rtx:
                    continue
                dys = np.arange(dty * P, min((dty + 1) * P, out_height))
                dxs = np.arange(dtx * P, min((dtx + 1) * P, out_width))
                jj, ii = np.meshgrid(dxs, dys)
                sy = (ii.ravel() + 0.5) * scale_y - 0.5 - oy
                sx = (jj.ravel() + 0.5) * scale_x - 0.5 - ox
                v = bilinear_sample(canvas, sy, sx)
                keep = ~np.isnan(v)
                if keep.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "scene_id": scene_id,
                                "y": ii.ravel()[keep].astype(np.int32),
                                "x": jj.ravel()[keep].astype(np.int32),
                                "v": v[keep],
                            }
                        )
                    )
        if not outs:
            return pd.DataFrame(columns=[f.name for f in PIXEL_OUT_SCHEMA])
        return pd.concat(outs, ignore_index=True)

    return strips.groupBy("scene_id", "recv_ty", "recv_tx").applyInPandas(
        assemble_and_warp, schema=PIXEL_OUT_SCHEMA
    )
