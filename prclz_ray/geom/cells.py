"""Deterministic hierarchical spatial cells — the engine's partitioning key.

The h3 wheel is not available in this environment, so the engine exposes
an equivalent deterministic hierarchical grid behind the same
``cell_id(lat, lon, res)`` API (per SURVEY.md §2.8): a power-of-two
quadtree over the configured world bbox. Resolution ``r`` splits the
bbox into ``2^r × 2^r`` cells; a child cell is fully contained in its
parent, so rollups between resolutions are exact (like H3/S2 parent
relations). Cell ids are uint64: ``(r << 56) | (x << 28) | y``.

The engine's canonical partitioning resolution is ``RES_PARTITION = 5``
(1024 cells over the world — the "h3_r5"-analogue in SURVEY.md), with
``RES_FINE = 7`` as the fine index (the "r9"-analogue).

All arithmetic is integer (microdegrees) so the same cell assignment is
expressible in ANSI SQL for the DuckDB oracles.
"""

from __future__ import annotations

import numpy as np

# world bbox in microdegrees — shared with prclz_ray.world
WORLD_LON0_E6 = 0
WORLD_LAT0_E6 = 0
WORLD_SPAN_E6 = 10_000_000  # 10 degrees

RES_PARTITION = 5
RES_FINE = 7

_R_SHIFT = 56
_X_SHIFT = 28


def cell_width_e6(res: int) -> int:
    # span must stay integral; world span 10^7 µdeg is divisible by 2^7
    assert WORLD_SPAN_E6 % (1 << res) == 0, f"resolution {res} not integral"
    return WORLD_SPAN_E6 >> res


def pack_cell_id(x, y, res: int):
    """Pack (x, y) cell indices into a cell id — the ONE packing rule.
    Any sharder routing by cell MUST build ids through this (or
    cell_id_e6), never by hand: inline bit-packing that skips the
    WORLD_*0_E6 origin handling desynchronizes silently if the world
    bbox ever moves."""
    return (
        (np.int64(res) << _R_SHIFT)
        | (np.asarray(x, dtype=np.int64) << _X_SHIFT)
        | np.asarray(y, dtype=np.int64)
    )


def cell_id_e6(lat_e6, lon_e6, res: int):
    """Vectorized cell id from integer microdegree coordinates."""
    w = cell_width_e6(res)
    lon_e6 = np.asarray(lon_e6, dtype=np.int64)
    lat_e6 = np.asarray(lat_e6, dtype=np.int64)
    x = np.clip((lon_e6 - WORLD_LON0_E6) // w, 0, (1 << res) - 1)
    y = np.clip((lat_e6 - WORLD_LAT0_E6) // w, 0, (1 << res) - 1)
    return pack_cell_id(x, y, res)


def cell_id(lat, lon, res: int):
    """Vectorized cell id from float degrees."""
    lat_e6 = np.round(np.asarray(lat, dtype=np.float64) * 1e6).astype(np.int64)
    lon_e6 = np.round(np.asarray(lon, dtype=np.float64) * 1e6).astype(np.int64)
    return cell_id_e6(lat_e6, lon_e6, res)


def cell_xy(cid):
    cid = np.asarray(cid, dtype=np.int64)
    res = cid >> _R_SHIFT
    x = (cid >> _X_SHIFT) & ((1 << 28) - 1)
    y = cid & ((1 << 28) - 1)
    return res, x, y


def cell_token(cid) -> str:
    res, x, y = cell_xy(cid)
    return f"r{int(res)}_{int(x)}_{int(y)}"


def cell_parent(cid, parent_res: int):
    """Parent cell at a coarser resolution (exact containment)."""
    res, x, y = cell_xy(cid)
    shift = res - parent_res
    # numpy's negative right-shift silently yields garbage (x=y=0), so a
    # swapped coarser/finer argument must fail loudly like cell_width_e6
    if not np.all(shift >= 0):
        raise ValueError(f"cell_parent: parent_res={parent_res} is finer than the cell resolution")
    return (np.int64(parent_res) << _R_SHIFT) | ((x >> shift) << _X_SHIFT) | (y >> shift)


def cell_bounds(cid):
    """(lon_min, lat_min, lon_max, lat_max) in degrees for a cell id."""
    res, x, y = cell_xy(cid)
    w = cell_width_e6(int(res)) / 1e6
    lon0 = WORLD_LON0_E6 / 1e6 + float(x) * w
    lat0 = WORLD_LAT0_E6 / 1e6 + float(y) * w
    return lon0, lat0, lon0 + w, lat0 + w


def polygon_covering_cells(exterior: np.ndarray, res: int = RES_PARTITION) -> np.ndarray:
    """Cell ids whose squares intersect the polygon's bbox.

    A bbox cover is sufficient for candidate routing (false positives are
    resolved by the exact PIP test downstream) — the analogue of the
    rtree bounds insert at `prclz/topology.py:488`.
    """
    exterior = np.asarray(exterior, dtype=np.float64)
    w = cell_width_e6(res)
    xmin_e6 = int(np.floor(exterior[:, 0].min() * 1e6))
    xmax_e6 = int(np.ceil(exterior[:, 0].max() * 1e6))
    ymin_e6 = int(np.floor(exterior[:, 1].min() * 1e6))
    ymax_e6 = int(np.ceil(exterior[:, 1].max() * 1e6))
    nmax = (1 << res) - 1
    x0 = min(max((xmin_e6 - WORLD_LON0_E6) // w, 0), nmax)
    x1 = min(max((max(xmax_e6 - 1, xmin_e6) - WORLD_LON0_E6) // w, 0), nmax)
    y0 = min(max((ymin_e6 - WORLD_LAT0_E6) // w, 0), nmax)
    y1 = min(max((max(ymax_e6 - 1, ymin_e6) - WORLD_LAT0_E6) // w, 0), nmax)
    # degenerate bboxes (zero width/height) still cover >= 1 cell
    x1 = max(x1, x0)
    y1 = max(y1, y0)
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return ((np.int64(res) << _R_SHIFT) | (gx.ravel() << _X_SHIFT) | gy.ravel())
