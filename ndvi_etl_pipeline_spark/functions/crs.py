"""Pure-numpy CRS transforms: WGS84 ↔ UTM and ↔ Web Mercator.

The reference leans on pyproj/rasterio for `to_crs` / `transform_geom`
(src/extract/download_landsat_stac.py:72-84), reprojection to a UTM
zone picked from the AOI centroid (src/load/load_to_postgis.py:18-38,
90-136) and a web-mercator viz product
(src/transform/compute_ndvi.py:144-158). Those libraries aren't in
this container, so the engine carries the projection math itself:

- **UTM** via the Karney/Krüger flattening series (6th order in the
  third flattening n — the same series pyproj/GeoGraphicLib use;
  sub-millimeter accuracy inside UTM's ±3.5° zone width, well past any
  30 m Landsat grid).
- **Web Mercator** (EPSG:3857) in closed form.

Everything is vectorized numpy over coordinate ARRAYS — these run
inside Arrow-batched kernels (warp inverse maps, geometry-column
UDFs), so a 100 TB reprojection spends its time in C loops, not
Python. No external data, no CRS database: zone/hemisphere are
explicit arguments (utm_epsg in functions/geo.py picks them the way
the reference does).

Series coefficients: Karney (2011), "Transverse Mercator with an
accuracy of a few nanometers"; the truncated 3-term forms below are
the standard published ones.
"""

from __future__ import annotations

import numpy as np

# WGS84
A_SEMI = 6378137.0
F_FLAT = 1.0 / 298.257223563
K0_UTM = 0.9996
E0_UTM = 500000.0
N0_SOUTH = 10000000.0

_N3 = F_FLAT / (2.0 - F_FLAT)  # third flattening n
# rectifying radius
_A_RECT = A_SEMI / (1.0 + _N3) * (1.0 + _N3**2 / 4.0 + _N3**4 / 64.0)
# forward (alpha) / inverse (beta) / conformal→geographic (delta) series
_ALPHA = (
    _N3 / 2.0 - 2.0 * _N3**2 / 3.0 + 5.0 * _N3**3 / 16.0,
    13.0 * _N3**2 / 48.0 - 3.0 * _N3**3 / 5.0,
    61.0 * _N3**3 / 240.0,
)
_BETA = (
    _N3 / 2.0 - 2.0 * _N3**2 / 3.0 + 37.0 * _N3**3 / 96.0,
    _N3**2 / 48.0 + _N3**3 / 15.0,
    17.0 * _N3**3 / 480.0,
)
_DELTA = (
    2.0 * _N3 - 2.0 * _N3**2 / 3.0 - 2.0 * _N3**3,
    7.0 * _N3**2 / 3.0 - 8.0 * _N3**3 / 5.0,
    56.0 * _N3**3 / 15.0,
)

_E2SQRT = 2.0 * np.sqrt(_N3) / (1.0 + _N3)


def utm_central_meridian(zone: int) -> float:
    """Central meridian (degrees) of a UTM zone (1-60)."""
    return float(zone * 6 - 183)


def lonlat_to_utm(
    lon: np.ndarray, lat: np.ndarray, zone: int, northern: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 degrees → UTM easting/northing (meters), Krüger forward."""
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(
        utm_central_meridian(zone)
    )
    phi = np.radians(np.asarray(lat, dtype=np.float64))

    s = np.sin(phi)
    # conformal latitude
    t = np.sinh(np.arctanh(s) - _E2SQRT * np.arctanh(_E2SQRT * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(t, np.cos(lam)))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)

    easting = E0_UTM + K0_UTM * _A_RECT * eta
    northing = K0_UTM * _A_RECT * xi
    if not northern:
        northing = northing + N0_SOUTH
    return easting, northing


def utm_to_lonlat(
    easting: np.ndarray, northing: np.ndarray, zone: int, northern: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """UTM meters → WGS84 degrees, Krüger inverse."""
    e = np.asarray(easting, dtype=np.float64)
    n = np.asarray(northing, dtype=np.float64)
    if not northern:
        n = n - N0_SOUTH
    xi = n / (K0_UTM * _A_RECT)
    eta = (e - E0_UTM) / (K0_UTM * _A_RECT)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)

    # conformal latitude → geographic latitude
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)

    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    lon = np.degrees(lam) + utm_central_meridian(zone)
    return lon, np.degrees(phi)


# --- Web Mercator (EPSG:3857), the reference's viz CRS -------------------


def lonlat_to_webmercator(
    lon: np.ndarray, lat: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 degrees → EPSG:3857 meters (spherical, closed form)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = A_SEMI * np.radians(lon)
    y = A_SEMI * np.arcsinh(np.tan(np.radians(lat)))
    return x, y


def webmercator_to_lonlat(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:3857 meters → WGS84 degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / A_SEMI)
    lat = np.degrees(np.arctan(np.sinh(y / A_SEMI)))
    return lon, lat


# --- grid composition: the warp hook's inverse map -----------------------


def reproject_inverse_map(
    src_transform: tuple[float, float, float, float, float, float],
    dst_transform: tuple[float, float, float, float, float, float],
    dst_to_lonlat,
    lonlat_to_src,
):
    """Build `inverse_map(dst_y, dst_x) -> (src_y, src_x)` for
    operators/warp.py::warp_with_inverse_map.

    Transforms are axis-aligned origin/scale grids (the from_origin
    case the reference writes): pixel centers are
    (x0 + (j + .5) dx, y0 + (i + .5) dy). Accepted layouts:
    - 4-tuple (x0, dx, y0, dy)
    - 6-tuple (x0, dx, 0, y0, dy, 0) — this engine's layout
    - 6-tuple GDAL geotransform (x0, dx, 0, y0, 0, dy) — dy in slot 5,
      slots 2/4 are rotation terms (must be 0; rotated grids raise)
    A zero dx or dy raises instead of silently dividing to ±inf
    (which would warp to all-nodata with no error). The CRS hop
    composes dst-grid → dst-CRS → lon/lat → src-CRS → src-grid,
    exactly the chain rasterio.warp runs per destination block
    (load_to_postgis.py:90-136).
    """

    def _grid4(t, label: str) -> tuple[float, float, float, float]:
        t = tuple(float(v) for v in t)
        if len(t) == 4:
            x0, dx, y0, dy = t
        elif len(t) == 6:
            if t[4] == 0.0 and t[5] != 0.0:  # GDAL: dy in slot 5
                x0, dx, y0, dy = t[0], t[1], t[3], t[5]
            else:  # engine layout: dy in slot 4
                x0, dx, y0, dy = t[0], t[1], t[3], t[4]
            if t[2] != 0.0:
                raise ValueError(f"{label}: rotated grids unsupported (slot 2 = {t[2]})")
        else:
            raise ValueError(f"{label}: expected 4- or 6-tuple, got {len(t)} values")
        if dx == 0.0 or dy == 0.0:
            raise ValueError(
                f"{label}: zero pixel scale (dx={dx}, dy={dy}) — transform layout is "
                "(x0, dx, _, y0, dy, _) or a GDAL geotransform, not rasterio Affine order"
            )
        return x0, dx, y0, dy

    sx0, sdx, sy0, sdy = _grid4(src_transform, "src_transform")
    dx0, ddx, dy0, ddy = _grid4(dst_transform, "dst_transform")

    def inverse_map(dst_y: np.ndarray, dst_x: np.ndarray):
        X = dx0 + (dst_x + 0.5) * ddx
        Y = dy0 + (dst_y + 0.5) * ddy
        lon, lat = dst_to_lonlat(X, Y)
        sx, sy = lonlat_to_src(lon, lat)
        return (sy - sy0) / sdy - 0.5, (sx - sx0) / sdx - 0.5

    return inverse_map
