"""Typed pipeline settings.

Mirrors the reference's YAML config surface (reference:
config/settings.yaml:1-24, loaded at main.py:54-65 and
src/extract/download_landsat_stac.py:12-26) as a frozen dataclass.
Settings become *literals in the query plan* — e.g. the cloud-cover
threshold is a `lit()` Catalyst can constant-fold and push into the
parquet scan — instead of a dict read at import time.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class AoiConfig:
    # reference: settings.yaml:2 (bbox), data/aoi/boundary.geojson
    bbox: tuple[float, float, float, float] = (25.13, 60.32, 25.63, 60.63)
    name: str = "AOI"
    geojson_path: str | None = None


@dataclass(frozen=True)
class DateRange:
    # reference: settings.yaml:7-8
    start: str = "2022-06-01"
    end: str = "2022-12-31"


@dataclass(frozen=True)
class DownloadConfig:
    # reference: settings.yaml:10-13, download_landsat_stac.py:28-41
    output_dir: str = "data/raw"
    max_cloud_cover: float = 10.0
    max_items: int = 10
    min_bytes: int = 1_000_000  # V2 size floor, download_landsat_stac.py:57-62
    timeout_s: int = 240  # download_landsat_stac.py:169
    page_limit: int = 200  # download_landsat_stac.py:106


@dataclass(frozen=True)
class StacConfig:
    # reference: settings.yaml:15-17
    endpoint: str = "https://planetarycomputer.microsoft.com/api/stac/v1"
    collection: str = "landsat-c2-l2"


@dataclass(frozen=True)
class ProductConfig:
    # reference: settings.yaml:19-24, compute_ndvi.py:144-158
    reproject_crs: str = "EPSG:3857"
    build_overviews: bool = True
    overview_factors: tuple[int, ...] = (2, 4, 8, 16, 32)  # compute_ndvi.py:147
    tile_size: int = 256  # compute_ndvi.py:82-84
    nodata: float = -9999.0  # compute_ndvi.py:34-36
    res_m: float = 30.0  # load_to_postgis.py:90


@dataclass(frozen=True)
class PipelineSettings:
    aoi: AoiConfig = field(default_factory=AoiConfig)
    dates: DateRange = field(default_factory=DateRange)
    download: DownloadConfig = field(default_factory=DownloadConfig)
    stac: StacConfig = field(default_factory=StacConfig)
    products: ProductConfig = field(default_factory=ProductConfig)


DEFAULT_SETTINGS = PipelineSettings()
