"""Focal (neighborhood) raster operators over tile form.

The third member of the halo-exchange family (with the tiled warp,
operators/warp.py, and the overview cascade): per-pixel kernels that
need a neighborhood — smoothing, gradients, edge detection, slope /
hillshade — computed without ever assembling a whole scene. Every
tile ships `halo`-wide edge strips to its 8 neighbors (one narrow
emission + one shuffle keyed by receiving tile), each receiver applies
a vectorized numpy kernel to its padded canvas, and emits its own core
back in tile form. Shuffle volume is (1+2·halo/P)² ≈ 1.008× the tile
bytes at P=256, halo=1 — constant in scene size, so the operator
scales to any raster the tile grid scales to.

Reference parity: the reference has no focal ops (its only
neighborhood op is the bilinear warp, compute_ndvi.py:162-179); these
are the natural engine extensions once tiles exist — the
standard raster-algebra surface a Landsat pipeline grows next
(NDVI smoothing, gradient masks).

Scene borders and missing neighbors appear as NaN padding; kernels
decide the semantics (nanmean shrinks the window, the gradient
propagates NaN — both match the usual GIS conventions).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .warp import TILE_STRIP_SCHEMA

FOCAL_TILE_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("y0", T.IntegerType()),
        T.StructField("x0", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def focal_mean_3x3(canvas: np.ndarray) -> np.ndarray:
    """3×3 NaN-aware mean (smoothing): the window shrinks where
    neighbors are NaN (scene borders), all-NaN windows stay NaN."""
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(canvas, (3, 3))
    with np.errstate(invalid="ignore"):  # all-NaN windows
        return np.nanmean(w, axis=(2, 3))


def sobel_magnitude(canvas: np.ndarray) -> np.ndarray:
    """Sobel gradient magnitude; NaN anywhere in the 3×3 window
    propagates (a gradient against unknown data is unknown)."""
    c = canvas
    gx = (
        (c[:-2, 2:] + 2 * c[1:-1, 2:] + c[2:, 2:])
        - (c[:-2, :-2] + 2 * c[1:-1, :-2] + c[2:, :-2])
    )
    gy = (
        (c[2:, :-2] + 2 * c[2:, 1:-1] + c[2:, 2:])
        - (c[:-2, :-2] + 2 * c[:-2, 1:-1] + c[:-2, 2:])
    )
    return np.sqrt(gx * gx + gy * gy)


def focal_map_tiled(
    tiles: DataFrame,
    kernel: Callable[[np.ndarray], np.ndarray],
    halo: int = 1,
) -> DataFrame:
    """Apply a focal `kernel` to every tile with `halo` pixels of
    neighbor context.

    `kernel` receives the float64 padded canvas (P+2·halo)² — NaN
    where no data exists — and must return the P² core (i.e. consume
    exactly `halo` pixels of context per edge; a 3×3 kernel ⇒ halo 1,
    5×5 ⇒ halo 2). Input tiles must be the codec's uniform tile grid
    (pixels_to_tiles pads edge tiles to full size with NaN).

    Cites operators/warp.py::warp_bilinear_tiled for the exchange
    pattern; this is the same two-stage plan with an identity
    destination mapping.
    """
    first = tiles.select("height").first()
    if first is None:
        return tiles.sparkSession.createDataFrame([], FOCAL_TILE_SCHEMA)
    P = int(first.height)
    if not 0 < halo < P:
        raise ValueError(f"halo must be in (0, {P}), got {halo}")

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
                        if dy == 0:
                            rs, re = 0, row.height
                        elif dy == -1:
                            rs, re = 0, halo
                        else:
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

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        scene_id, rty, rtx = key
        empty = pd.DataFrame(columns=[f.name for f in FOCAL_TILE_SCHEMA])
        # a receiver with no full-size strip is a phantom neighbor
        # index past the grid edge (dy/dx overshoot) — drop it
        if not ((pdf["height"] == P) & (pdf["width"] == P)).any():
            return empty
        oy, ox = int(rty) * P - halo, int(rtx) * P - halo
        canvas = np.full((P + 2 * halo, P + 2 * halo), np.nan, dtype=np.float64)
        for row in pdf.itertuples(index=False):
            a = np.frombuffer(row.data, dtype=np.float32).reshape(
                row.height, row.width
            )
            canvas[
                row.y0 - oy : row.y0 - oy + row.height,
                row.x0 - ox : row.x0 - ox + row.width,
            ] = a
        core = kernel(canvas)
        if core.shape != (P, P):
            raise ValueError(
                f"kernel returned {core.shape}, expected {(P, P)} "
                f"(must consume exactly halo={halo} per edge)"
            )
        return pd.DataFrame(
            [
                {
                    "scene_id": scene_id,
                    "tile_y": int(rty),
                    "tile_x": int(rtx),
                    "height": P,
                    "width": P,
                    "y0": int(rty) * P,
                    "x0": int(rtx) * P,
                    "data": core.astype(np.float32).tobytes(),
                }
            ]
        )

    return strips.groupBy("scene_id", "recv_ty", "recv_tx").applyInPandas(
        assemble, schema=FOCAL_TILE_SCHEMA
    )
