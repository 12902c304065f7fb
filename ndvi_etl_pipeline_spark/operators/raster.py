"""Raster codec: tile form ⇄ pixel form ⇄ GeoTIFF (SURVEY §1.4, §2.1).

The engine carries rasters in two representations:

- **pixel form** `[scene_id, band, y, x, value]` — the relational
  core; all of §2.2-2.6 (filters, joins, aggs) runs here as plain
  Catalyst plans.
- **tile form** `[scene_id, band, tile_y, tile_x, height, width, y0,
  x0, data BINARY]` — one dense float32 tile per row (mirrors the
  reference's 256×256 GeoTIFF blocks, compute_ndvi.py:79-84). Kernels
  (NDVI, stats, resampling) run as vectorized numpy over the packed
  payload: ~65k pixels per Arrow row instead of 65k rows, which is
  the 100 TB fast path — per-row engine overhead amortizes 10⁴×.

Payload encoding: row-major float32, little-endian, NaN = "cell
absent/nodata". BinaryType keeps the bytes opaque to Catalyst (no
per-pixel serialization cost through shuffles).

GeoTIFF: `write_geotiff`/`read_geotiff` implement a minimal but REAL
single-band float32 GeoTIFF (striped, uncompressed, ModelPixelScale +
ModelTiepoint + GeoKey EPSG + GDAL nodata tags) in pure Python, so
the K1 sink works in this container; when rasterio is installed the
same entry points delegate to it (deflate + overviews like
compute_ndvi.py:73-88).

Reference parity: decode/encode = S4/K1 (compute_ndvi.py:38-44,73-88,
load_to_postgis.py:189-192); the NDVI tile kernel = P1-P6
(compute_ndvi.py:32-93); tile stats = A1 (load_to_postgis.py:74-79).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional fast path; not present in this container
    import rasterio  # type: ignore

    HAVE_RASTERIO = True
except ImportError:
    HAVE_RASTERIO = False

DEFAULT_TILE = 256
NODATA = -9999.0

TILE_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("band", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("y0", T.IntegerType()),
        T.StructField("x0", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)

NDVI_TILE_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("y0", T.IntegerType()),
        T.StructField("x0", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("sum_ndvi", T.DoubleType()),
    ]
)


# ---------------------------------------------------------------------------
# pixel form → tile form
# ---------------------------------------------------------------------------


def pixels_to_tiles(
    pixels: DataFrame,
    tile: int = DEFAULT_TILE,
    value_col: str = "dn",
) -> DataFrame:
    """Pack sparse pixel rows into dense float32 tiles (NaN-filled).

    One shuffle on (scene, band, tile_y, tile_x); each group packs
    into a single Arrow batch. Tile size bounds executor memory at
    tile² × 4 bytes — 256 ⇒ 256 KiB per payload regardless of input
    scale, so the same code holds at 100 TB.
    """

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        scene_id, band, tile_y, tile_x = key
        y0, x0 = int(tile_y) * tile, int(tile_x) * tile
        arr = np.full((tile, tile), np.nan, dtype=np.float32)
        ys = pdf["y"].to_numpy() - y0
        xs = pdf["x"].to_numpy() - x0
        arr[ys, xs] = pdf[value_col].to_numpy(dtype=np.float32)
        return pd.DataFrame(
            {
                "scene_id": [scene_id],
                "band": [band],
                "tile_y": [int(tile_y)],
                "tile_x": [int(tile_x)],
                "height": [tile],
                "width": [tile],
                "y0": [y0],
                "x0": [x0],
                "data": [arr.tobytes()],
            }
        )

    keyed = pixels.withColumn(
        "tile_y", F.floor(F.col("y") / tile).cast("int")
    ).withColumn("tile_x", F.floor(F.col("x") / tile).cast("int"))
    return keyed.groupBy("scene_id", "band", "tile_y", "tile_x").applyInPandas(
        pack, schema=TILE_SCHEMA
    )


def tiles_to_pixels(tiles: DataFrame, value_name: str = "value") -> DataFrame:
    """Unpack tiles back to pixel rows, dropping NaN (absent) cells.

    mapInPandas — a narrow, streaming transformation: no shuffle, each
    tile expands independently, so the expansion pipelines into
    whatever consumes it.
    """
    has_band = "band" in tiles.columns
    fields = [T.StructField("scene_id", T.StringType())]
    if has_band:
        fields.append(T.StructField("band", T.StringType()))
    fields += [
        T.StructField("y", T.IntegerType()),
        T.StructField("x", T.IntegerType()),
        T.StructField(value_name, T.DoubleType()),
    ]
    out_schema = T.StructType(fields)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.data, dtype=np.float32).reshape(
                    row.height, row.width
                )
                yy, xx = np.nonzero(~np.isnan(arr))
                cols = {"scene_id": row.scene_id}
                if has_band:
                    cols["band"] = row.band
                cols.update(
                    {
                        "y": (yy + row.y0).astype(np.int32),
                        "x": (xx + row.x0).astype(np.int32),
                        value_name: arr[yy, xx].astype(np.float64),
                    }
                )
                frames.append(pd.DataFrame(cols))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return tiles.mapInPandas(unpack, schema=out_schema)


# ---------------------------------------------------------------------------
# tile-form NDVI kernel (P1-P6 vectorized per tile)
# ---------------------------------------------------------------------------

SCALE = 0.0000275
OFFSET = -0.2
EPS = 1e-6


def tile_ndvi(band_tiles: DataFrame, red_band: str = "red", nir_band: str = "nir") -> DataFrame:
    """J1 + P1-P6 in tile form: join red/nir tiles on the grid key,
    compute masked/clamped NDVI per tile with numpy, and emit the NDVI
    payload plus per-tile partial aggregates (n_pixels, n_valid,
    sum_ndvi) so scene stats finish with a tiny native groupBy — the
    two-level aggregation pattern (partials at data parallelism,
    finals on ~tiles/scene rows).

    Semantics match the pixel path exactly: a cell counts iff both
    bands are present; it is valid iff both DN ≠ 0; NDVI uses the
    Landsat C2L2 scale/offset, ε-guarded divide, clamp to [-1, 1]
    (compute_ndvi.py:32-93).
    """
    r = band_tiles.filter(F.col("band") == red_band).drop("band")
    n = band_tiles.filter(F.col("band") == nir_band).drop("band")
    for c in ("height", "width", "y0", "x0", "data"):
        r = r.withColumnRenamed(c, f"r_{c}")
        n = n.withColumnRenamed(c, f"n_{c}")
    joined = r.join(n, ["scene_id", "tile_y", "tile_x"], "inner")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                red = np.frombuffer(row.r_data, dtype=np.float32).reshape(
                    row.r_height, row.r_width
                )
                nir = np.frombuffer(row.n_data, dtype=np.float32).reshape(
                    row.n_height, row.n_width
                )
                if red.shape != nir.shape:  # P7 grid-compat guard
                    raise ValueError(
                        f"grid mismatch for {row.scene_id} tile "
                        f"({row.tile_y},{row.tile_x}): {red.shape} vs {nir.shape}"
                    )
                present = ~np.isnan(red) & ~np.isnan(nir)
                valid = present & (red != 0) & (nir != 0)
                red_sr = red.astype(np.float64) * SCALE + OFFSET
                nir_sr = nir.astype(np.float64) * SCALE + OFFSET
                with np.errstate(invalid="ignore", divide="ignore"):
                    ndvi = (nir_sr - red_sr) / (nir_sr + red_sr + EPS)
                ndvi = np.clip(ndvi, -1.0, 1.0)
                out = np.full(red.shape, np.nan, dtype=np.float32)
                out[valid] = ndvi[valid].astype(np.float32)
                rows.append(
                    {
                        "scene_id": row.scene_id,
                        "tile_y": row.tile_y,
                        "tile_x": row.tile_x,
                        "height": row.r_height,
                        "width": row.r_width,
                        "y0": row.r_y0,
                        "x0": row.r_x0,
                        "data": out.tobytes(),
                        "n_pixels": int(present.sum()),
                        "n_valid": int(valid.sum()),
                        # float64 sum of the float32 ndvi values, matching
                        # what the pixel path feeds Spark's avg()
                        "sum_ndvi": float(ndvi[valid].astype(np.float32).astype(np.float64).sum()),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return joined.mapInPandas(kernel, schema=NDVI_TILE_SCHEMA)


def tile_scene_stats(ndvi_tiles: DataFrame) -> DataFrame:
    """A1 finals over tile partials: count/valid/mean per scene."""
    return ndvi_tiles.groupBy("scene_id").agg(
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("n_valid").alias("n_valid"),
        F.round(F.sum("sum_ndvi") / F.sum("n_valid"), 6).alias("mean_ndvi"),
    )


COMPOSITE_LABEL = "__composite__"


def tile_composite(ndvi_tiles: DataFrame, label: str = COMPOSITE_LABEL) -> DataFrame:
    """Greenest-pixel mosaic composite: per tile grid position, the
    elementwise NaN-aware max of every scene's tile (np.fmax — a
    masked pixel never beats a real observation; all-masked stays NaN).

    The merge is associative, commutative, and IDEMPOTENT, so the
    composite is exactly incrementally maintainable: merging a batch's
    composite into a running product (streaming/scenes.py
    stream_scene_composite) gives bit-identical results to one big
    batch over all scenes — no reprocessing window needed. One shuffle
    keyed by grid position; per-group fan-in is bounded by
    scenes-per-position, so no skew at any corpus size. Output rows
    keep NDVI_TILE_SCHEMA (partials recomputed from the merged array),
    so tile_scene_stats / tiles_to_pixels work on composites
    unchanged.
    """

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_y, tile_x, y0, x0, th, tw = (int(v) for v in key)
        merged = np.frombuffer(pdf["data"].iloc[0], dtype=np.float32).reshape(th, tw)
        for buf in pdf["data"].iloc[1:]:
            merged = np.fmax(
                merged, np.frombuffer(buf, dtype=np.float32).reshape(th, tw)
            )
        valid = ~np.isnan(merged)
        return pd.DataFrame(
            [
                {
                    "scene_id": label,
                    "tile_y": tile_y,
                    "tile_x": tile_x,
                    "height": th,
                    "width": tw,
                    "y0": y0,
                    "x0": x0,
                    "data": merged.tobytes(),
                    "n_pixels": int(merged.size),
                    "n_valid": int(valid.sum()),
                    "sum_ndvi": float(merged[valid].sum()) if valid.any() else 0.0,
                }
            ]
        )

    return ndvi_tiles.groupBy(
        "tile_y", "tile_x", "y0", "x0", "height", "width"
    ).applyInPandas(kernel, schema=NDVI_TILE_SCHEMA)


# ---------------------------------------------------------------------------
# tile-form AOI clip (J2) and overview cascade (A6): the 100 TB paths
# ---------------------------------------------------------------------------


def tile_clip_stats(ndvi_tiles: DataFrame, ring) -> DataFrame:
    """J2 + A1 in tile form: masked mean inside an AOI polygon without
    ever leaving tile representation.

    Same semantics as the pixel path
    (`clip_filter(tiles_to_pixels(t)).groupBy(scene).avg()`) — bbox
    prefilter then exact even-odd ray-cast — but evaluated as one
    vectorized numpy test per 256×256 tile instead of one codegen row
    per pixel. Two scale properties the pixel path can't give:

    - **bbox pruning happens per tile, JVM-side**: tiles whose extent
      misses the polygon bbox are dropped by a sargable filter on
      (y0, x0, height, width) before any Python/Arrow cost — the
      overwhelming majority of a 100 TB mosaic for a small AOI.
    - **no pixel explosion**: shuffle input is |surviving tiles| rows
      of partial aggregates, not |pixels| rows.

    Reference semantics: compute_ndvi.py:95-160 (mask + crop),
    load_to_postgis.py:74-79 (masked mean).
    """
    return tile_clip_stats_rings(ndvi_tiles, [ring])


def tile_clip_stats_rings(ndvi_tiles: DataFrame, rings) -> DataFrame:
    """`tile_clip_stats` over an even-odd RING SET (e.g. a dissolved
    multi-feature AOI from polyclip.union_all, which may contain hole
    rings): membership = parity of per-ring ray casts over the full
    set, so cavities are excluded and islands re-included exactly —
    summing independent per-ring stats would double-count any pixel
    under both an exterior and its hole. bbox pruning uses the bbox of
    all rings (holes lie inside their exteriors, so this equals the
    union's bbox)."""
    from ..functions.geo import _ray_cast_numpy, polygon_bbox

    boxes = [polygon_bbox(r) for r in rings]
    minx = min(b[0] for b in boxes)
    miny = min(b[1] for b in boxes)
    maxx = max(b[2] for b in boxes)
    maxy = max(b[3] for b in boxes)
    flats = [
        np.asarray([c for pt in r for c in pt], dtype=np.float64) for r in rings
    ]

    # Sargable tile-extent × polygon-bbox intersection (J3 shape).
    pruned = ndvi_tiles.filter(
        (F.col("x0") <= F.lit(maxx))
        & (F.col("x0") + F.col("width") - 1 >= F.lit(minx))
        & (F.col("y0") <= F.lit(maxy))
        & (F.col("y0") + F.col("height") - 1 >= F.lit(miny))
    )

    part_schema = T.StructType(
        [
            T.StructField("scene_id", T.StringType()),
            T.StructField("n_in_aoi", T.LongType()),
            T.StructField("sum_ndvi", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int, int, int], tuple[np.ndarray, np.ndarray]] = {}

        def grid_mask(y0: int, x0: int, h: int, w: int) -> np.ndarray:
            key = (y0, x0, h, w)
            hit = cache.get(key)
            if hit is None:
                xs = np.arange(x0, x0 + w, dtype=np.float64)
                ys = np.arange(y0, y0 + h, dtype=np.float64)
                px = np.broadcast_to(xs, (h, w)).ravel()
                py = np.repeat(ys, w)
                inside = (
                    (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
                )
                inside_idx = np.nonzero(inside)[0]
                parity = np.zeros(inside_idx.shape[0], dtype=bool)
                for flat in flats:
                    parity ^= _ray_cast_numpy(
                        px[inside_idx], py[inside_idx], flat
                    )
                inside[inside_idx] = parity
                hit = inside.reshape(h, w)
                cache[key] = hit
            return hit

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.data, dtype=np.float32).reshape(
                    row.height, row.width
                )
                m = grid_mask(row.y0, row.x0, row.height, row.width) & ~np.isnan(arr)
                n = int(m.sum())
                if n:
                    rows.append(
                        {
                            "scene_id": row.scene_id,
                            "n_in_aoi": n,
                            "sum_ndvi": float(arr[m].astype(np.float64).sum()),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    partials = pruned.mapInPandas(kernel, schema=part_schema)
    return partials.groupBy("scene_id").agg(
        F.sum("n_in_aoi").alias("n_in_aoi"),
        (F.sum("sum_ndvi") / F.sum("n_in_aoi")).alias("mean_ndvi"),
    )


def tile_overviews(
    ndvi_tiles: DataFrame, factors: tuple[int, ...] = (2, 4, 8, 16, 32)
) -> DataFrame:
    """A6 overview pyramid in tile form: NaN-aware average pooling
    inside each tile, all levels emitted in ONE narrow mapInPandas
    pass — zero shuffles, versus one groupBy shuffle per level in the
    pixel-form cascade (`overviews.overview_cascade`).

    Works because power-of-two factors ≤ tile size never pool across
    tile boundaries, so every level is tile-local; semantics are the
    same chained average-of-averages the pixel cascade (and GDAL's own
    overview chaining, compute_ndvi.py:146-157) computes. Output rows
    carry a `factor` column; payload cells with no valid source pixels
    are NaN (= absent, consistent with `tiles_to_pixels`).
    """
    out_schema = T.StructType(
        [T.StructField("factor", T.IntegerType())] + list(TILE_SCHEMA)
    ).add("n_valid", T.LongType())
    # TILE_SCHEMA includes 'band'; NDVI tiles have none — emit ''.
    has_band = "band" in ndvi_tiles.columns

    def pool2(a: np.ndarray) -> np.ndarray:
        h, w = a.shape
        blocks = a.reshape(h // 2, 2, w // 2, 2)
        with np.errstate(invalid="ignore"):
            s = np.nansum(blocks, axis=(1, 3))
            c = np.sum(~np.isnan(blocks), axis=(1, 3))
            mean = np.divide(s, c, out=np.full(s.shape, np.nan), where=c > 0)
        return mean

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.data, dtype=np.float32).reshape(
                    row.height, row.width
                ).astype(np.float64)
                prev, prev_f = arr, 1
                for f in factors:
                    step = f // prev_f
                    assert (
                        step * prev_f == f
                        and step & (step - 1) == 0
                        and prev.shape[0] % step == 0
                        and prev.shape[1] % step == 0
                    ), "factors must be successive power-of-2 multiples dividing the tile"
                    for _ in range(step.bit_length() - 1):
                        prev = pool2(prev)
                    prev_f = f
                    payload = prev.astype(np.float32)
                    rows.append(
                        {
                            "factor": f,
                            "scene_id": row.scene_id,
                            "band": getattr(row, "band", ""),
                            "tile_y": row.tile_y,
                            "tile_x": row.tile_x,
                            "height": payload.shape[0],
                            "width": payload.shape[1],
                            "y0": row.y0 // f,
                            "x0": row.x0 // f,
                            "data": payload.tobytes(),
                            "n_valid": int(np.sum(~np.isnan(payload))),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    src = ndvi_tiles if has_band else ndvi_tiles.withColumn("band", F.lit(""))
    cols = ["scene_id", "band", "tile_y", "tile_x", "height", "width", "y0", "x0", "data"]
    return src.select(*cols).mapInPandas(kernel, schema=out_schema)


VIZ_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("style", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_valid", T.LongType()),
        T.StructField("png", T.BinaryType()),
    ]
)


def tile_viz_products(
    ndvi_tiles: DataFrame,
    factor: int = 8,
    rings=None,
    style: str = "viz",
) -> DataFrame:
    """The reference's `*_NDVI_clipped_viz.tif` product
    (compute_ndvi.py:144-158 rescale/reproject; loaded into the
    `ndvi_viz` table by load_to_postgis.py:277-328) as a Spark product
    table: per scene, the NDVI raster — optionally clipped to an
    even-odd AOI ring set at FULL resolution, like the reference masks
    before reprojecting — average-pooled down by `factor`,
    byte-rescaled [-1, 1] → [0, 255] (q_ndvi_viz_rescale's exact value
    semantics), and encoded as one grayscale PNG per scene via the
    native codec (operators/multimodal.py::encode_png). NaN/nodata
    pixels render as byte 0.

    Scale shape: the mask+pool stage is a narrow mapInPandas (no
    shuffle); the single shuffle groups factor²-reduced tiles per
    scene, so assembling a 16k×16k scene at factor 8 moves ~16 MB of
    floats, never full-resolution pixels."""
    from ..functions.geo import _ray_cast_numpy, polygon_bbox

    if factor & (factor - 1) or factor < 1:
        raise ValueError("factor must be a power of two")

    flats = None
    if rings:
        flats = [
            np.asarray([c for pt in r for c in pt], dtype=np.float64)
            for r in rings
        ]
        boxes = [polygon_bbox(r) for r in rings]
        minx = min(b[0] for b in boxes)
        miny = min(b[1] for b in boxes)
        maxx = max(b[2] for b in boxes)
        maxy = max(b[3] for b in boxes)

    reduced_schema = T.StructType(
        [
            T.StructField("scene_id", T.StringType()),
            T.StructField("y0", T.IntegerType()),
            T.StructField("x0", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def pool2(a: np.ndarray) -> np.ndarray:
        h, w = a.shape
        blocks = a.reshape(h // 2, 2, w // 2, 2)
        with np.errstate(invalid="ignore"):
            s = np.nansum(blocks, axis=(1, 3))
            c = np.sum(~np.isnan(blocks), axis=(1, 3))
            return np.divide(s, c, out=np.full(s.shape, np.nan), where=c > 0)

    def reduce_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = (
                    np.frombuffer(row.data, dtype=np.float32)
                    .reshape(row.height, row.width)
                    .astype(np.float64)
                )
                if flats is not None:
                    xs = np.arange(row.x0, row.x0 + row.width, dtype=np.float64)
                    ys = np.arange(row.y0, row.y0 + row.height, dtype=np.float64)
                    px = np.broadcast_to(xs, arr.shape).ravel()
                    py = np.repeat(ys, row.width)
                    inside = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
                    idx = np.nonzero(inside)[0]
                    parity = np.zeros(idx.shape[0], dtype=bool)
                    for flat in flats:
                        parity ^= _ray_cast_numpy(px[idx], py[idx], flat)
                    inside[idx] = parity
                    arr = np.where(inside.reshape(arr.shape), arr, np.nan)
                # NaN-pad edge tiles up to a factor multiple; padded
                # cells pool as "no valid source" and render as nodata
                ph = -arr.shape[0] % factor
                pw = -arr.shape[1] % factor
                if ph or pw:
                    arr = np.pad(
                        arr, ((0, ph), (0, pw)), constant_values=np.nan
                    )
                red = arr
                for _ in range(factor.bit_length() - 1):
                    red = pool2(red)
                rows.append(
                    {
                        "scene_id": row.scene_id,
                        "y0": row.y0 // factor,
                        "x0": row.x0 // factor,
                        "height": red.shape[0],
                        "width": red.shape[1],
                        "data": red.astype(np.float32).tobytes(),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    reduced = ndvi_tiles.select(
        "scene_id", "y0", "x0", "height", "width", "data"
    ).mapInPandas(reduce_kernel, schema=reduced_schema)

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        from .multimodal import encode_png

        H = int((pdf["y0"] + pdf["height"]).max())
        W = int((pdf["x0"] + pdf["width"]).max())
        canvas = np.full((H, W), np.nan, dtype=np.float64)
        for row in pdf.itertuples(index=False):
            a = np.frombuffer(row.data, dtype=np.float32).reshape(
                row.height, row.width
            )
            canvas[row.y0 : row.y0 + row.height, row.x0 : row.x0 + row.width] = a
        valid = ~np.isnan(canvas)
        byte = np.zeros(canvas.shape, dtype=np.uint8)
        with np.errstate(invalid="ignore"):
            byte[valid] = np.round(
                np.clip((canvas[valid] + 1.0) * 127.5, 0.0, 255.0)
            ).astype(np.uint8)
        return pd.DataFrame(
            [
                {
                    "scene_id": pdf["scene_id"].iloc[0],
                    "style": style,
                    "height": H,
                    "width": W,
                    "n_valid": int(valid.sum()),
                    "png": encode_png(byte),
                }
            ]
        )

    return reduced.groupBy("scene_id").applyInPandas(assemble, schema=VIZ_SCHEMA)


# ---------------------------------------------------------------------------
# minimal real GeoTIFF (pure Python): single band float32, striped
# ---------------------------------------------------------------------------

_TIFF_TAGS = {
    "ImageWidth": 256,
    "ImageLength": 257,
    "BitsPerSample": 258,
    "Compression": 259,
    "Photometric": 262,
    "StripOffsets": 273,
    "SamplesPerPixel": 277,
    "RowsPerStrip": 278,
    "StripByteCounts": 279,
    "SampleFormat": 339,
    "ModelPixelScale": 33550,
    "ModelTiepoint": 33922,
    "GeoKeyDirectory": 34735,
    "GDALNodata": 42113,
}


def write_geotiff(
    arr: np.ndarray,
    path: str,
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_size: tuple[float, float] = (1.0, 1.0),
    epsg: int = 4326,
    nodata: float = NODATA,
) -> None:
    """Write a single-band float32 GeoTIFF. Delegates to rasterio
    (deflate, tiled — the reference's profile) when available, else
    uses the built-in pure-Python writer (uncompressed, striped, with
    ModelPixelScale/ModelTiepoint/GeoKey EPSG/GDAL nodata — readable
    by GDAL/QGIS)."""
    a = np.ascontiguousarray(arr, dtype=np.float32)
    if HAVE_RASTERIO:
        from rasterio.transform import from_origin

        profile = {
            "driver": "GTiff",
            "dtype": "float32",
            "width": a.shape[1],
            "height": a.shape[0],
            "count": 1,
            "crs": f"EPSG:{epsg}",
            "transform": from_origin(origin[0], origin[1], pixel_size[0], pixel_size[1]),
            "nodata": nodata,
            "tiled": True,
            "blockxsize": 256,
            "blockysize": 256,
            "compress": "deflate",
            "predictor": 3,
        }
        with rasterio.open(path, "w", **profile) as dst:
            dst.write(a, 1)
        return

    h, w = a.shape
    data = a.tobytes()
    nodata_ascii = f"{nodata:g}\x00".encode()
    # GeoKeys: model type 2 (geographic), raster type 1 (pixel-is-area),
    # geographic CRS = epsg
    geokeys = [
        (1, 1, 0, 3),       # version, rev, minor, number of keys
        (1024, 0, 1, 2),    # GTModelTypeGeoKey = geographic
        (1025, 0, 1, 1),    # GTRasterTypeGeoKey = area
        (2048, 0, 1, epsg), # GeographicTypeGeoKey
    ]
    geokey_shorts = [v for row in geokeys for v in row]

    # layout: header(8) | IFD | out-of-line values | pixel data
    n_tags = 14
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    val_off = ifd_off + ifd_size

    out_of_line: list[bytes] = []

    def defer(payload: bytes) -> int:
        nonlocal val_off
        off = val_off
        out_of_line.append(payload)
        val_off += len(payload) + (len(payload) % 2)
        return off

    pixel_scale = defer(struct.pack("<3d", pixel_size[0], pixel_size[1], 0.0))
    tiepoint = defer(struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0))
    geokey_off = defer(struct.pack(f"<{len(geokey_shorts)}H", *geokey_shorts))
    nodata_off = defer(nodata_ascii)
    data_off = val_off

    def tag(code: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", code, ttype, count, value)

    tags = [
        tag(_TIFF_TAGS["ImageWidth"], 3, 1, w),
        tag(_TIFF_TAGS["ImageLength"], 3, 1, h),
        tag(_TIFF_TAGS["BitsPerSample"], 3, 1, 32),
        tag(_TIFF_TAGS["Compression"], 3, 1, 1),
        tag(_TIFF_TAGS["Photometric"], 3, 1, 1),
        tag(_TIFF_TAGS["StripOffsets"], 4, 1, data_off),
        tag(_TIFF_TAGS["SamplesPerPixel"], 3, 1, 1),
        tag(_TIFF_TAGS["RowsPerStrip"], 3, 1, h),
        tag(_TIFF_TAGS["StripByteCounts"], 4, 1, len(data)),
        tag(_TIFF_TAGS["SampleFormat"], 3, 1, 3),
        tag(_TIFF_TAGS["ModelPixelScale"], 12, 3, pixel_scale),
        tag(_TIFF_TAGS["ModelTiepoint"], 12, 6, tiepoint),
        tag(_TIFF_TAGS["GeoKeyDirectory"], 3, len(geokey_shorts), geokey_off),
        tag(_TIFF_TAGS["GDALNodata"], 2, len(nodata_ascii), nodata_off),
    ]
    with open(path, "wb") as fh:
        fh.write(b"II*\x00" + struct.pack("<I", ifd_off))
        fh.write(struct.pack("<H", n_tags))
        fh.write(b"".join(tags))
        fh.write(struct.pack("<I", 0))  # next IFD
        pos = ifd_off + ifd_size
        for payload in out_of_line:
            fh.write(payload)
            pos += len(payload)
            if len(payload) % 2:
                fh.write(b"\x00")
                pos += 1
        fh.write(data)


_TILE_TAGS = {
    "Predictor": 317,
    "TileWidth": 322,
    "TileLength": 323,
    "TileOffsets": 324,
    "TileByteCounts": 325,
}


def _fp_predictor_encode(a: np.ndarray) -> bytes:
    """TIFF predictor 3 (floating-point horizontal differencing) for
    one tile: per scanline, bytes regroup into significance planes
    (MSB plane first, per the libtiff fpDiff layout for little-endian
    data) and then byte-difference horizontally. Pure numpy."""
    th, tw = a.shape
    raw = np.ascontiguousarray(a, dtype="<f4").view(np.uint8).reshape(th, tw, 4)
    planes = raw[:, :, ::-1]  # byte 0 = most significant
    rows = np.ascontiguousarray(planes.transpose(0, 2, 1)).reshape(th, 4 * tw)
    diff = rows.copy()
    diff[:, 1:] = rows[:, 1:] - rows[:, :-1]  # uint8 wraparound
    return diff.tobytes()


def _fp_predictor_decode(buf: bytes, th: int, tw: int) -> np.ndarray:
    d = np.frombuffer(buf, dtype=np.uint8).reshape(th, 4 * tw)
    acc = np.cumsum(d, axis=1, dtype=np.uint64).astype(np.uint8)
    planes = acc.reshape(th, 4, tw).transpose(0, 2, 1)  # (th, tw, 4) MSB-first
    le = np.ascontiguousarray(planes[:, :, ::-1]).reshape(th, tw * 4)
    return np.frombuffer(le.tobytes(), dtype="<f4").reshape(th, tw)


def write_geotiff_tiled(
    arr: np.ndarray,
    path: str,
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_size: tuple[float, float] = (1.0, 1.0),
    epsg: int = 4326,
    nodata: float = NODATA,
    tile: int = 256,
    predictor: int = 3,
) -> None:
    """The reference's exact storage profile (compute_ndvi.py:79-84) in
    pure Python: tiled 256×256, deflate, predictor 3 (floating-point
    differencing — byte planes compress dramatically better for smooth
    float rasters), float32, GDAL nodata tag. `decode_geotiff_bytes`
    reads it back; layout follows the TIFF 6 + libtiff conventions so
    GDAL/QGIS can too."""
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.float32)
    h, w = a.shape
    tiles_down = -(-h // tile)
    tiles_across = -(-w // tile)
    payloads: list[bytes] = []
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            block = np.full((tile, tile), np.float32(nodata), dtype=np.float32)
            sub = a[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            raw = _fp_predictor_encode(block) if predictor == 3 else block.tobytes()
            payloads.append(zlib.compress(raw, 6))

    nodata_ascii = f"{nodata:g}\x00".encode()
    geokeys = [(1, 1, 0, 3), (1024, 0, 1, 2), (1025, 0, 1, 1), (2048, 0, 1, epsg)]
    geokey_shorts = [v for row in geokeys for v in row]
    n_tiles = len(payloads)

    n_tags = 16
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    val_off = ifd_off + ifd_size
    out_of_line: list[bytes] = []

    def defer(payload: bytes) -> int:
        nonlocal val_off
        off = val_off
        out_of_line.append(payload)
        val_off += len(payload) + (len(payload) % 2)
        return off

    pixel_scale = defer(struct.pack("<3d", pixel_size[0], pixel_size[1], 0.0))
    tiepoint = defer(struct.pack("<6d", 0.0, 0.0, 0.0, origin[0], origin[1], 0.0))
    geokey_off = defer(struct.pack(f"<{len(geokey_shorts)}H", *geokey_shorts))
    nodata_off = defer(nodata_ascii)
    counts_off = defer(struct.pack(f"<{n_tiles}I", *[len(p) for p in payloads]))
    # tile offsets depend on where data starts: after the offsets array
    offsets_pos = val_off
    val_off += n_tiles * 4 + ((n_tiles * 4) % 2)
    data_start = val_off
    tile_offsets, pos = [], data_start
    for p in payloads:
        tile_offsets.append(pos)
        pos += len(p)
    out_of_line.append(struct.pack(f"<{n_tiles}I", *tile_offsets))

    def tag(code: int, ttype: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", code, ttype, count, value)

    def scalar_or_off(values_off: int, count: int, first: int) -> int:
        return first if count == 1 else values_off

    tags = [
        tag(_TIFF_TAGS["ImageWidth"], 3, 1, w),
        tag(_TIFF_TAGS["ImageLength"], 3, 1, h),
        tag(_TIFF_TAGS["BitsPerSample"], 3, 1, 32),
        tag(_TIFF_TAGS["Compression"], 3, 1, 8),  # deflate
        tag(_TIFF_TAGS["Photometric"], 3, 1, 1),
        tag(_TIFF_TAGS["SamplesPerPixel"], 3, 1, 1),
        tag(_TILE_TAGS["Predictor"], 3, 1, predictor),
        tag(_TIFF_TAGS["SampleFormat"], 3, 1, 3),
        tag(_TILE_TAGS["TileWidth"], 3, 1, tile),
        tag(_TILE_TAGS["TileLength"], 3, 1, tile),
        tag(
            _TILE_TAGS["TileOffsets"], 4, n_tiles,
            scalar_or_off(offsets_pos, n_tiles, tile_offsets[0]),
        ),
        tag(
            _TILE_TAGS["TileByteCounts"], 4, n_tiles,
            scalar_or_off(counts_off, n_tiles, len(payloads[0])),
        ),
        tag(_TIFF_TAGS["ModelPixelScale"], 12, 3, pixel_scale),
        tag(_TIFF_TAGS["ModelTiepoint"], 12, 6, tiepoint),
        tag(_TIFF_TAGS["GeoKeyDirectory"], 3, len(geokey_shorts), geokey_off),
        tag(_TIFF_TAGS["GDALNodata"], 2, len(nodata_ascii), nodata_off),
    ]
    tags.sort(key=lambda t: struct.unpack_from("<H", t)[0])  # TIFF requires sorted tags
    with open(path, "wb") as fh:
        fh.write(b"II*\x00" + struct.pack("<I", ifd_off))
        fh.write(struct.pack("<H", n_tags))
        fh.write(b"".join(tags))
        fh.write(struct.pack("<I", 0))
        for payload in out_of_line:
            fh.write(payload)
            if len(payload) % 2:
                fh.write(b"\x00")
        for p in payloads:
            fh.write(p)


def read_geotiff(path: str) -> tuple[np.ndarray, dict]:
    """Read a single-band float32 GeoTIFF written by `write_geotiff`
    (or rasterio when installed). Returns (array, metadata)."""
    if HAVE_RASTERIO:
        with rasterio.open(path) as src:
            arr = src.read(1)
            t = src.transform
            return arr, {
                "origin": (t.c, t.f),
                "pixel_size": (t.a, -t.e),
                "epsg": src.crs.to_epsg() if src.crs else None,
                "nodata": src.nodata,
            }

    with open(path, "rb") as fh:
        buf = fh.read()
    return decode_geotiff_bytes(buf)


def decode_geotiff_bytes(buf: "bytes | memoryview") -> tuple[np.ndarray, dict]:
    """Bytes-level decode for `binaryFile` scans (S4): GeoTIFF content
    → (float array, metadata).

    Two-tier: the fast path decodes the engine's own write profile
    (little-endian, single IFD, float32, plain/deflate) with minimal
    branching; anything else — uint16 DN bands, LZW, multi-strip,
    big-endian, overview IFD chains, i.e. the real Landsat C2L2
    envelope — falls through to the general pure-Python codec
    (operators/tiff.py), with integer samples cast to float32 exactly
    as the reference's kernel does on read (compute_ndvi.py:43-44).

    Accepts any buffer-protocol object (bytes, memoryview, Arrow
    buffer view) — the Arrow fast path hands in a zero-copy
    memoryview of the columnar payload."""
    try:
        return _decode_geotiff_fast(buf)
    except (ValueError, KeyError, struct.error):
        from . import tiff as TF

        arr, meta = TF.decode_tiff(buf)
        if arr.dtype.kind != "f":
            arr = arr.astype(np.float32)
        elif arr.dtype.itemsize == 4:
            arr = np.ascontiguousarray(arr, dtype="<f4")
        meta = {
            k: meta.get(k) for k in ("epsg", "nodata", "origin", "pixel_size")
        }
        return arr, meta


def _decode_geotiff_fast(buf: "bytes | memoryview") -> tuple[np.ndarray, dict]:
    if bytes(buf[:4]) != b"II*\x00":
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", buf, 4)
    (n_tags,) = struct.unpack_from("<H", buf, ifd_off)
    tags: dict[int, tuple[int, int, int]] = {}
    for i in range(n_tags):
        code, ttype, count, value = struct.unpack_from(
            "<HHII", buf, ifd_off + 2 + i * 12
        )
        tags[code] = (ttype, count, value)

    def short_or_long(code: int) -> int:
        return tags[code][2]

    def long_array(code: int) -> list[int]:
        ttype, count, value = tags[code]
        if count == 1:
            return [value]
        return list(struct.unpack_from(f"<{count}I", buf, value))

    w = short_or_long(_TIFF_TAGS["ImageWidth"])
    h = short_or_long(_TIFF_TAGS["ImageLength"])
    compression = short_or_long(_TIFF_TAGS["Compression"]) if _TIFF_TAGS[
        "Compression"
    ] in tags else 1

    # guards: anything outside the engine's own write profile goes to
    # the general codec (operators/tiff.py) via the caller's fallback
    bits = short_or_long(_TIFF_TAGS["BitsPerSample"]) if _TIFF_TAGS["BitsPerSample"] in tags else 32
    # TIFF defaults SampleFormat to 1 (unsigned int) when absent; the
    # fast path REQUIRES an explicit =3 (IEEE float, as write_geotiff
    # emits). Defaulting to 3 here would reinterpret a 32-bit integer
    # TIFF that legally omits the tag as '<f4' garbage instead of
    # falling through to the general codec (tiff.py defaults it to 1).
    sfmt = short_or_long(_TIFF_TAGS["SampleFormat"]) if _TIFF_TAGS["SampleFormat"] in tags else 1
    if bits != 32 or sfmt != 3:
        raise ValueError("fast path handles explicit float32 only")
    if compression not in (1, 8):
        raise ValueError("fast path handles none/deflate only")

    if _TILE_TAGS["TileWidth"] in tags:  # tiled layout (write_geotiff_tiled)
        import zlib

        tw = short_or_long(_TILE_TAGS["TileWidth"])
        th = short_or_long(_TILE_TAGS["TileLength"])
        predictor = (
            short_or_long(_TILE_TAGS["Predictor"]) if _TILE_TAGS["Predictor"] in tags else 1
        )
        offs = long_array(_TILE_TAGS["TileOffsets"])
        cnts = long_array(_TILE_TAGS["TileByteCounts"])
        tiles_across = -(-w // tw)
        arr = np.empty((h, w), dtype="<f4")
        for i, (o, c) in enumerate(zip(offs, cnts)):
            raw = buf[o : o + c]
            if compression == 8:
                raw = zlib.decompress(raw)
            block = (
                _fp_predictor_decode(raw, th, tw)
                if predictor == 3
                else np.frombuffer(raw, dtype="<f4").reshape(th, tw)
            )
            ty, tx = divmod(i, tiles_across)
            ys, xs = ty * th, tx * tw
            arr[ys : min(ys + th, h), xs : min(xs + tw, w)] = block[
                : min(th, h - ys), : min(tw, w - xs)
            ]
    else:
        if tags[_TIFF_TAGS["StripOffsets"]][1] != 1 or compression != 1:
            raise ValueError("fast path handles one uncompressed strip only")
        off = short_or_long(_TIFF_TAGS["StripOffsets"])
        nbytes = short_or_long(_TIFF_TAGS["StripByteCounts"])
        arr = np.frombuffer(buf, dtype="<f4", count=nbytes // 4, offset=off).reshape(h, w)
    meta: dict = {"epsg": None, "nodata": None, "origin": None, "pixel_size": None}
    if _TIFF_TAGS["ModelPixelScale"] in tags:
        _, _, v = tags[_TIFF_TAGS["ModelPixelScale"]]
        sx, sy, _ = struct.unpack_from("<3d", buf, v)
        meta["pixel_size"] = (sx, sy)
    if _TIFF_TAGS["ModelTiepoint"] in tags:
        _, _, v = tags[_TIFF_TAGS["ModelTiepoint"]]
        vals = struct.unpack_from("<6d", buf, v)
        meta["origin"] = (vals[3], vals[4])
    if _TIFF_TAGS["GeoKeyDirectory"] in tags:
        _, count, v = tags[_TIFF_TAGS["GeoKeyDirectory"]]
        shorts = struct.unpack_from(f"<{count}H", buf, v)
        for j in range(4, count, 4):
            if shorts[j] == 2048:
                meta["epsg"] = shorts[j + 3]
    if _TIFF_TAGS["GDALNodata"] in tags:
        _, count, v = tags[_TIFF_TAGS["GDALNodata"]]
        meta["nodata"] = float(bytes(buf[v : v + count]).split(b"\x00")[0])
    return arr.copy(), meta


# ---------------------------------------------------------------------------
# GeoTIFF scan (S4): binaryFile source → tile rows
# ---------------------------------------------------------------------------


def _band_array_from_tiff(buf, nodata_to_nan: bool, overview_level: int = 0) -> np.ndarray:
    if overview_level > 0:
        # COG/Landsat pyramid: read a reduced-resolution IFD instead of
        # the full band — the cheap path for previews/coarse stats.
        # Clamps to the deepest available level (GDAL semantics).
        from . import tiff as TF

        levels = TF.decode_tiff_ifds(buf)
        arr, meta = levels[min(overview_level, len(levels) - 1)]
    else:
        arr, meta = decode_geotiff_bytes(buf)
    a = arr.astype(np.float32)
    if nodata_to_nan and meta.get("nodata") is not None:
        a = np.where(a == np.float32(meta["nodata"]), np.nan, a)
    return a


def _file_tile_rows(path: str, buf, tile: int, nodata_to_nan: bool, overview_level: int = 0):
    """One GeoTIFF's bytes → TILE_SCHEMA row tuples (shared by the
    pandas and Arrow scan kernels, so both produce identical rows)."""
    import os

    stem = os.path.basename(path).rsplit(".", 1)[0]
    scene_id, band = stem.rsplit("_", 1)
    a = _band_array_from_tiff(buf, nodata_to_nan, overview_level)
    h, w = a.shape
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            block = np.full((tile, tile), np.nan, dtype=np.float32)
            sub = a[ty : ty + tile, tx : tx + tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            yield (
                scene_id, band, ty // tile, tx // tile,
                tile, tile, ty, tx, block.tobytes(),
            )


_TILE_ARROW_NAMES = [f.name for f in TILE_SCHEMA]


def _tile_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("scene_id", pa.string()),
            pa.field("band", pa.string()),
            pa.field("tile_y", pa.int32()),
            pa.field("tile_x", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("width", pa.int32()),
            pa.field("y0", pa.int32()),
            pa.field("x0", pa.int32()),
            pa.field("data", pa.binary()),
        ]
    )


def scan_geotiffs(
    spark,
    path_glob: str,
    tile: int = DEFAULT_TILE,
    nodata_to_nan: bool = True,
    use_arrow: bool = True,
    overview_level: int = 0,
    on_error: str = "raise",
) -> DataFrame:
    """`spark.read.format('binaryFile')` over a GeoTIFF glob → tile
    rows. scene_id and band parse from the `<scene_id>_<band>.tif`
    filename (F9, load_to_postgis.py:178-183); decode runs
    distributed over the file bytes. Files stay whole per task (a
    GeoTIFF is not splittable without range reads); parallelism comes
    from files ≫ cores, which is the 100 TB shape (thousands of
    scenes × 2 bands).

    Default path is `mapInArrow`: the file payload crosses the
    JVM→Python boundary as an Arrow buffer and is decoded through a
    zero-copy memoryview — no per-cell Python bytes materialization,
    no pandas block manager on either side of the kernel. The
    `use_arrow=False` pandas path is kept for parity testing.

    ``overview_level > 0`` reads that reduced-resolution IFD from the
    file's pyramid instead of the full band (clamped to the deepest
    available level) — coarse stats/previews touch 1/4^level of the
    pixels without a resample pass.

    ``on_error``: 'raise' fails the task on an undecodable file (the
    default — corruption should be loud in dev); 'skip' drops that
    file's tiles and keeps the scan alive — E1's quarantine-not-raise
    rule (main.py:118-139) for the scan stage. Pair 'skip' with
    `scan_geotiff_status` to record WHICH files failed."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    binf = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    if use_arrow:
        def decode_arrow(batches):
            import pyarrow as pa

            schema = _tile_arrow_schema()
            for batch in batches:
                paths = batch.column(0).to_pylist()
                contents = batch.column(1)
                cols: list[list] = [[] for _ in _TILE_ARROW_NAMES]
                for i, p in enumerate(paths):
                    mv = memoryview(contents[i].as_buffer())
                    try:
                        rows = list(
                            _file_tile_rows(p, mv, tile, nodata_to_nan, overview_level)
                        )
                    except Exception:
                        if on_error == "raise":
                            raise
                        continue  # quarantined: no tiles from this file
                    for row in rows:
                        for acc, v in zip(cols, row):
                            acc.append(v)
                if cols[0]:
                    yield pa.record_batch(
                        [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                        schema=schema,
                    )

        return binf.mapInArrow(decode_arrow, schema=TILE_SCHEMA)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    rows.extend(
                        _file_tile_rows(
                            r.path, bytes(r.content), tile, nodata_to_nan, overview_level
                        )
                    )
                except Exception:
                    if on_error == "raise":
                        raise
            if rows:
                yield pd.DataFrame(rows, columns=_TILE_ARROW_NAMES)

    return binf.mapInPandas(decode, schema=TILE_SCHEMA)


def scan_scene_ndvi(
    spark,
    path_glob: str,
    tile: int = DEFAULT_TILE,
    red_band: str = "red",
    nir_band: str = "nir",
    on_error: str = "raise",
) -> DataFrame:
    """Fused S4+J1+P1-P6: binaryFile scan → pair band FILES per scene
    → decode both bands and emit NDVI tiles in one applyInPandas
    kernel.

    The general codec path (`scan_geotiffs` → `tile_ndvi`) shuffles
    every tile payload to join red⋈nir on the grid key. Here the J1
    join happens at file granularity instead: one shuffle of the raw
    file bytes (2 rows/scene — bytes that had to move once anyway,
    since the two bands arrive in different files), then decode, grid
    check (P7), NDVI math, and per-tile partial aggregates run in a
    single kernel with zero intermediate Arrow round-trips. Scenes
    missing either band emit nothing — J1's inner-join semantics
    (download_landsat_stac.py:148-151's `continue`).

    Memory bound: one scene's two bands per task (~2×40-120 MB for
    real Landsat C2L2), the same envelope SURVEY §4.2 accepts for the
    per-scene warp; use `scan_geotiffs`+`tile_ndvi` when single
    scenes exceed executor memory.
    """
    parsed = parse_band_files(spark.read.format("binaryFile").load(path_glob)).filter(
        F.col("band").isin(red_band, nir_band)
    )
    return scene_ndvi_from_bands(
        parsed, tile=tile, red_band=red_band, nir_band=nir_band, on_error=on_error
    )


PATH_BYTES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def read_path_bytes(paths_df: DataFrame, path_col: str = "path") -> DataFrame:
    """Distributed file read from a PATH COLUMN: each executor opens
    the paths in its own partitions and emits (path, content) rows —
    the relational twin of the `binaryFile` reader for the case where
    the file list is itself the result of a query (e.g. the streaming
    scene feed's "complete but unprocessed" join) rather than a glob.

    This is what keeps a 10⁷-file backlog off the driver: the path
    relation never collects; bytes materialize executor-side inside an
    Arrow batch. file:// and plain local paths supported (the test /
    single-node envelope); object-store paths would swap the `open`
    for the store's client exactly like sources/stac.py's
    `http_fetcher`."""
    import pandas as pd

    def read(batches):
        for pdf in batches:
            out_p, out_c = [], []
            for p in pdf[path_col]:
                local = p[7:] if p.startswith("file://") else p
                local = local if not local.startswith("file:") else local[5:]
                with open(local, "rb") as fh:
                    out_p.append(p)
                    out_c.append(fh.read())
            yield pd.DataFrame({"path": out_p, "content": out_c})

    return paths_df.select(F.col(path_col).alias("path")).mapInPandas(
        read, schema=PATH_BYTES_SCHEMA
    )


SCAN_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("scene_id", T.StringType()),
        T.StructField("band", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]
)


def scan_geotiff_status(spark, path_glob: str) -> DataFrame:
    """Per-file decode status for a GeoTIFF glob: (path, scene_id,
    band, ok, error, height, width) — the quarantine ledger companion
    to `scan_geotiffs(on_error='skip')` (E1: failures become ROWS the
    pipeline can count, join, and retry — main.py:118-139's per-scene
    try/except as a relation). Decode runs fully (not just header
    parse), so truncated pixel data is caught, not just bad magic."""
    import os

    binf = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                stem = os.path.basename(r.path).rsplit(".", 1)[0]
                scene_id, _, band = stem.rpartition("_")
                try:
                    arr, _meta = decode_geotiff_bytes(bytes(r.content))
                    rows.append(
                        {
                            "path": r.path,
                            "scene_id": scene_id or stem,
                            "band": band,
                            "ok": True,
                            "error": None,
                            "height": int(arr.shape[0]),
                            "width": int(arr.shape[1]),
                        }
                    )
                except Exception as e:  # noqa: BLE001 — E1: row, not raise
                    rows.append(
                        {
                            "path": r.path,
                            "scene_id": scene_id or stem,
                            "band": band,
                            "ok": False,
                            "error": f"{type(e).__name__}: {e}"[:200],
                            "height": None,
                            "width": None,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return binf.mapInPandas(probe, schema=SCAN_STATUS_SCHEMA)


BAND_FILENAME_PATTERN = r"^(.+)_([A-Za-z0-9]+)\.tif$"


def parse_band_names(
    binary_df: DataFrame, keep: tuple[str, ...] = ("content",)
) -> DataFrame:
    """(path, …) rows → (scene_id, band, *keep) via the
    `<scene_id>_<band>.tif` filename contract (F9). `keep` selects
    which source columns ride along (content for decode paths, path
    for streaming ledgers)."""
    fname = F.element_at(F.split(F.col("path"), "/"), -1)
    return binary_df.select(
        F.regexp_extract(fname, BAND_FILENAME_PATTERN, 1).alias("scene_id"),
        F.regexp_extract(fname, BAND_FILENAME_PATTERN, 2).alias("band"),
        *keep,
    )


def parse_band_files(binary_df: DataFrame) -> DataFrame:
    """(path, content) rows → (scene_id, band, content) — see
    parse_band_names."""
    return parse_band_names(binary_df, keep=("content",))


_NDVI_TILE_NAMES = [f.name for f in NDVI_TILE_SCHEMA]


def _ndvi_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("scene_id", pa.string()),
            pa.field("tile_y", pa.int32()),
            pa.field("tile_x", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("width", pa.int32()),
            pa.field("y0", pa.int32()),
            pa.field("x0", pa.int32()),
            pa.field("data", pa.binary()),
            pa.field("n_pixels", pa.int64()),
            pa.field("n_valid", pa.int64()),
            pa.field("sum_ndvi", pa.float64()),
        ]
    )


def _scene_ndvi_rows(
    scene_id: str,
    by_band: dict,
    tile: int,
    red_band: str,
    nir_band: str,
    on_error: str,
) -> list[tuple]:
    """One scene's band buffers → NDVI_TILE_SCHEMA row tuples (shared
    by the pandas and Arrow kernels — identical math, identical rows).

    Per-TILE math: identical elementwise results to a whole-scene
    pass, but the float64 intermediates live per 256² tile (~3 MB
    working set) instead of per scene (~6 arrays × 8 B × h·w —
    200 MB at 4096²). With 32 concurrent scene tasks the whole-scene
    version thrashes memory bandwidth; this one stays cache-resident
    (measured ~2× at full occupancy)."""
    if red_band not in by_band or nir_band not in by_band:
        return []
    try:
        red = _band_array_from_tiff(by_band[red_band], nodata_to_nan=True)
        nir = _band_array_from_tiff(by_band[nir_band], nodata_to_nan=True)
        if red.shape != nir.shape:  # P7 grid-compat guard
            raise ValueError(
                f"grid mismatch for {scene_id}: {red.shape} vs {nir.shape}"
            )
    except Exception:
        if on_error == "quarantine":
            return []
        raise

    h, w = red.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            r32 = red[ty : ty + tile, tx : tx + tile]
            n32 = nir[ty : ty + tile, tx : tx + tile]
            pres = ~np.isnan(r32) & ~np.isnan(n32)
            val = pres & (r32 != 0) & (n32 != 0)
            red_sr = r32.astype(np.float64) * SCALE + OFFSET
            nir_sr = n32.astype(np.float64) * SCALE + OFFSET
            with np.errstate(invalid="ignore", divide="ignore"):
                ndvi = (nir_sr - red_sr) / (nir_sr + red_sr + EPS)
            ndvi = np.clip(ndvi, -1.0, 1.0)
            block = np.full((tile, tile), np.nan, dtype=np.float32)
            sub = block[: r32.shape[0], : r32.shape[1]]
            sub[val] = ndvi[val].astype(np.float32)
            rows.append(
                (
                    scene_id,
                    ty // tile,
                    tx // tile,
                    tile,
                    tile,
                    ty,
                    tx,
                    block.tobytes(),
                    int(pres.sum()),
                    int(val.sum()),
                    float(sub[~np.isnan(sub)].astype(np.float64).sum()),
                )
            )
    return rows


def scene_ndvi_from_bands(
    parsed: DataFrame,
    tile: int = DEFAULT_TILE,
    red_band: str = "red",
    nir_band: str = "nir",
    on_error: str = "raise",
    use_arrow: bool = True,
) -> DataFrame:
    """The fused kernel over an already-parsed (scene_id, band,
    content) relation — shared by the batch glob scan and the
    streaming scene feed (streaming/scenes.py).

    ``on_error='quarantine'`` gives the reference's per-scene failure
    isolation (E1, main.py:118-139): a scene whose bands fail to
    decode or whose grids mismatch emits nothing instead of failing
    the job — one bad file cannot kill a 100 TB run. The default
    'raise' is strict (fail fast, the right mode for tests/dev).

    Default path is `applyInArrow`: each scene's band payloads arrive
    as Arrow buffers read through zero-copy memoryviews, and tile
    payloads leave as an Arrow batch — pandas never touches the
    ~100 MB binary cells. `use_arrow=False` keeps the pandas kernel
    for parity testing."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")

    if use_arrow:
        def kernel_arrow(key, table):
            import pyarrow as pa

            scene_id = key[0].as_py() if hasattr(key[0], "as_py") else key[0]
            bands = table.column("band").to_pylist()
            contents = table.column("content")
            by_band = {
                b: memoryview(contents[i].as_buffer()) for i, b in enumerate(bands)
            }
            rows = _scene_ndvi_rows(
                scene_id, by_band, tile, red_band, nir_band, on_error
            )
            schema = _ndvi_arrow_schema()
            cols = list(zip(*rows)) if rows else [[] for _ in schema]
            return pa.table(
                [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)],
                schema=schema,
            )

        return parsed.groupBy("scene_id").applyInArrow(
            kernel_arrow, schema=NDVI_TILE_SCHEMA
        )

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (scene_id,) = key
        by_band = {b: bytes(c) for b, c in zip(pdf["band"], pdf["content"])}
        rows = _scene_ndvi_rows(scene_id, by_band, tile, red_band, nir_band, on_error)
        return pd.DataFrame(rows, columns=_NDVI_TILE_NAMES)

    return parsed.groupBy("scene_id").applyInPandas(kernel, schema=NDVI_TILE_SCHEMA)


# ---------------------------------------------------------------------------
# distributed GeoTIFF export (K1 sink): one file per scene
# ---------------------------------------------------------------------------


def export_scene_geotiffs(
    ndvi_tiles: DataFrame,
    out_dir: str,
    pixel_size: tuple[float, float] = (1.0, 1.0),
    epsg: int = 4326,
    nodata: float = NODATA,
    profile: str = "striped",
) -> DataFrame:
    """Assemble each scene's tiles into one mosaic and write
    `<scene_id>_NDVI.tif` — the reference's per-scene product
    (compute_ndvi.py:73-88) as a distributed applyInPandas sink
    (scenes write in parallel from executors; `out_dir` must be
    shared storage on a cluster). Returns (scene_id, path, height,
    width, n_bytes) receipts."""
    schema = T.StructType(
        [
            T.StructField("scene_id", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import os

        (scene_id,) = key
        max_y = int((pdf["y0"] + pdf["height"]).max())
        max_x = int((pdf["x0"] + pdf["width"]).max())
        min_y = int(pdf["y0"].min())
        min_x = int(pdf["x0"].min())
        mosaic = np.full((max_y - min_y, max_x - min_x), np.nan, dtype=np.float32)
        for row in pdf.itertuples(index=False):
            arr = np.frombuffer(row.data, dtype=np.float32).reshape(row.height, row.width)
            mosaic[
                row.y0 - min_y : row.y0 - min_y + row.height,
                row.x0 - min_x : row.x0 - min_x + row.width,
            ] = arr
        out = np.where(np.isnan(mosaic), np.float32(nodata), mosaic)
        path = os.path.join(out_dir, f"{scene_id}_NDVI.tif")
        writer = write_geotiff_tiled if profile == "tiled" else write_geotiff
        writer(out, path, origin=(min_x, min_y), pixel_size=pixel_size,
               epsg=epsg, nodata=nodata)
        return pd.DataFrame(
            {
                "scene_id": [scene_id],
                "path": [path],
                "height": [out.shape[0]],
                "width": [out.shape[1]],
                "n_bytes": [int(os.path.getsize(path))],
            }
        )

    return ndvi_tiles.groupBy("scene_id").applyInPandas(assemble, schema=schema)


def export_pixel_geotiffs(
    pixels: DataFrame,
    out_dir: str,
    value_col: str = "v",
    suffix: str = "_NDVI_clipped_viz",
    origin: tuple[float, float] = (0.0, 0.0),
    pixel_size: tuple[float, float] = (1.0, 1.0),
    epsg: int = 3857,
    nodata: float = NODATA,
) -> DataFrame:
    """The reference's ndvi_viz product (compute_ndvi.py:144-158 +
    load_to_postgis.py:279-322): per-scene GeoTIFF export from PIXEL
    rows — the natural output shape of the reprojection warp
    (warp.reproject_scene), whose web-mercator grid is exactly the
    reference's viz CRS. Tiled/deflate profile, nodata-filled, one
    distributed writer task per scene. Returns write receipts like
    export_scene_geotiffs."""
    schema = T.StructType(
        [
            T.StructField("scene_id", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        import os

        (scene_id,) = key
        h = int(pdf["y"].max()) + 1
        w = int(pdf["x"].max()) + 1
        arr = np.full((h, w), np.nan, dtype=np.float32)
        arr[pdf["y"].to_numpy(), pdf["x"].to_numpy()] = pdf[value_col].to_numpy(
            dtype=np.float32
        )
        out = np.where(np.isnan(arr), np.float32(nodata), arr)
        path = os.path.join(out_dir, f"{scene_id}{suffix}.tif")
        write_geotiff_tiled(
            out, path, origin=origin, pixel_size=pixel_size, epsg=epsg, nodata=nodata
        )
        return pd.DataFrame(
            {
                "scene_id": [scene_id],
                "path": [path],
                "height": [h],
                "width": [w],
                "n_bytes": [int(os.path.getsize(path))],
            }
        )

    return pixels.groupBy("scene_id").applyInPandas(assemble, schema=schema)


MULTI_CLIP_SCHEMA = T.StructType(
    [
        T.StructField("scene_id", T.StringType()),
        T.StructField("aoi_id", T.IntegerType()),
        T.StructField("n_in_aoi", T.LongType()),
        T.StructField("sum_ndvi", T.DoubleType()),
    ]
)


def tile_clip_stats_multi(ndvi_tiles: DataFrame, aois) -> DataFrame:
    """J2+A1 generalized to MANY AOIs — the reference's actual product
    shape (ndvi_clipped is keyed (full_id, aoi_id), 002_schema.sql:
    UNIQUE(full_id,aoi_id)): per-(scene, aoi) masked means in one pass.

    `aois` is [(aoi_id, ring), ...]. JVM-side prune keeps tiles whose
    extent intersects ANY AOI bbox (an OR of sargable comparisons);
    the kernel evaluates each AOI's ray-cast mask per surviving tile,
    cached per (tile-extent, aoi). Broadcast of the AOI list rides the
    closure — the same "broadcast the small side" decision as J2, now
    with |aois| polygons instead of one. Output shuffles |tiles|×|aois
    overlapping| partial rows — never pixels.
    """
    from ..functions.geo import _ray_cast_numpy, polygon_bbox

    bboxes = {int(a): polygon_bbox(r) for a, r in aois}
    flats = {
        int(a): np.asarray([c for pt in r for c in pt], dtype=np.float64)
        for a, r in aois
    }

    cond = None
    for minx, miny, maxx, maxy in bboxes.values():
        c = (
            (F.col("x0") <= F.lit(maxx))
            & (F.col("x0") + F.col("width") - 1 >= F.lit(minx))
            & (F.col("y0") <= F.lit(maxy))
            & (F.col("y0") + F.col("height") - 1 >= F.lit(miny))
        )
        cond = c if cond is None else (cond | c)
    pruned = ndvi_tiles.filter(cond)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}

        def mask_for(aoi_id: int, y0: int, x0: int, h: int, w: int) -> np.ndarray:
            key = (aoi_id, y0, x0, h, w)
            hit = cache.get(key)
            if hit is None:
                minx, miny, maxx, maxy = bboxes[aoi_id]
                xs = np.arange(x0, x0 + w, dtype=np.float64)
                ys = np.arange(y0, y0 + h, dtype=np.float64)
                px = np.broadcast_to(xs, (h, w)).ravel()
                py = np.repeat(ys, w)
                inside = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
                idx = np.nonzero(inside)[0]
                inside[idx] = _ray_cast_numpy(px[idx], py[idx], flats[aoi_id])
                hit = inside.reshape(h, w)
                cache[key] = hit
            return hit

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.data, dtype=np.float32).reshape(
                    row.height, row.width
                )
                finite = ~np.isnan(arr)
                for aoi_id in bboxes:
                    m = mask_for(aoi_id, row.y0, row.x0, row.height, row.width) & finite
                    n = int(m.sum())
                    if n:
                        rows.append(
                            {
                                "scene_id": row.scene_id,
                                "aoi_id": aoi_id,
                                "n_in_aoi": n,
                                "sum_ndvi": float(arr[m].astype(np.float64).sum()),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    partials = pruned.mapInPandas(kernel, schema=MULTI_CLIP_SCHEMA)
    return partials.groupBy("scene_id", "aoi_id").agg(
        F.sum("n_in_aoi").alias("n_in_aoi"),
        (F.sum("sum_ndvi") / F.sum("n_in_aoi")).alias("mean_ndvi"),
    )
