"""Tile math: the engine's raster grid (lat/lon degree tiles) plus
standard web-mercator z/x/y tiles.

The reference's raster layer is windowed GeoTIFF reads
(`data_processing/process_worldpop.py:195-207`); the engine models the
raster as a parquet tile table keyed by (tile_z, tile_x, tile_y)
(SURVEY.md §2.1 S11), with integer-degree tiles as the oracle-checkable
grid and mercator tiles provided for real-world map output.
"""

from __future__ import annotations

import numpy as np

# engine raster grid: 1-degree tiles at z=0 reference, scaled by 2^z? No —
# the oracle grid is fixed 1° tiles; TILE_DEG_E6 is its size.
TILE_DEG_E6 = 1_000_000  # 1 degree in microdegrees


def lonlat_to_tile(lat_e6, lon_e6):
    """Integer 1° raster tile (tile_x, tile_y) from microdegree coords."""
    lon_e6 = np.asarray(lon_e6, dtype=np.int64)
    lat_e6 = np.asarray(lat_e6, dtype=np.int64)
    return lon_e6 // TILE_DEG_E6, lat_e6 // TILE_DEG_E6


def tile_bounds(tile_x: int, tile_y: int):
    """(lon_min, lat_min, lon_max, lat_max) of a 1° tile in degrees."""
    return (
        tile_x * 1.0,
        tile_y * 1.0,
        (tile_x + 1) * 1.0,
        (tile_y + 1) * 1.0,
    )


# ---------------------------------------------------------------------------
# web-mercator (slippy-map) tiles — standard OSM tiling formulas

def mercator_tile(lat, lon, zoom: int):
    """(x, y) slippy-map tile indices at ``zoom`` for degree coordinates."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = 2.0**zoom
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    y = np.floor((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n).astype(np.int64)
    nmax = np.int64(2**zoom - 1)
    return np.clip(x, 0, nmax), np.clip(y, 0, nmax)


def mercator_tile_bounds(x: int, y: int, zoom: int):
    """(lon_min, lat_min, lon_max, lat_max) of a slippy tile in degrees."""
    n = 2.0**zoom

    def _lat(yy):
        return float(np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yy / n)))))

    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    return lon_min, _lat(y + 1), lon_max, _lat(y)
