"""The deterministic synthetic geography and page-geocode arithmetic.

Everything spatial in the test/bench fixtures derives from integer
arithmetic on ``doc_id`` so that the SAME assignment is computable
(a) vectorized in numpy inside Ray Data stages, and (b) in ANSI SQL for
the DuckDB correctness oracles (`__ray_entry__.py::oracle_sql`). No
floats are involved in any key decision — coordinates are integer
microdegrees; cell / block / parcel / tile membership is integer
division — so Ray and DuckDB agree bit-for-bit.

World layout (degrees):
  - bbox: lon, lat ∈ [0, 10)
  - street grid every 0.1° → 100×100 blocks (analogue of prclz block
    extraction over the OSM road grid, `midway/midway_blocks.py:35-40`)
  - blocks: grid squares inset by the street buffer EPS (5e-6-style
    buffered-line difference, `prclz/blocks/methods.py:17-40`)
  - GADM level-2: 1° cells `G{gx}_{gy}` (10×10); level-1: 5° (2×2)
  - parcels: 4 per block anchored at the quarter points (Voronoi of the
    4 anchors inside a square = the 4 quadrants,
    `prclz/parcelization/midway_parcelization.R:44-91` semantics)
  - raster tiles: 1° integer tiles (process_worldpop windows analogue)

Page geocode (from doc_id, all integer ops):
  h1 = (doc_id * 2654435761)  % 2^32
  h2 = ((doc_id + 1) * 2246822519) % 2^32
  urban  = doc_id % 10 < 8              -- 80% of pages in 4 hot clusters
  if doc_id % 37 == 0: no geo tag       -- NO_GADM sentinel path
  urban:   c = h1 % 4;  (cx, cy) = CENTERS[c]
           bx = cx - 4 + h2 % 9 ; by = cy - 4 + (h2 // 9) % 9
  rural:   bx = h2 % 100       ; by = (h2 // 100) % 100
  lon_e6 = bx * 100000 + 10000 + h1 % 80000
  lat_e6 = by * 100000 + 10000 + (h2 // 10000) % 80000

The offsets keep every geocoded page ≥ 0.01° away from block edges, so
exact PIP against the inset block polygons equals the integer grid
assignment (the oracle).
"""

from __future__ import annotations

import numpy as np

# --- world constants ------------------------------------------------------
BLOCK_E6 = 100_000          # 0.1° block grid pitch in microdegrees
N_BLOCKS = 100              # blocks per axis
GADM_E6 = 1_000_000         # 1° level-2 admin cells
STREET_EPS_E6 = 2_000       # street buffer: 0.002° inset on each side
PARCELS_PER_BLOCK = 4
URBAN_CENTERS = ((15, 15), (35, 75), (65, 25), (85, 85))  # block coords
NO_GEO_MOD = 37             # doc_id % 37 == 0 → page has no geo tag
SENTINEL_GADM = "NO_GADM_DISTRICT"

H1_MUL = 2654435761         # Knuth multiplicative hash constants
H2_MUL = 2246822519
M32 = 1 << 32


# --- geocode arithmetic (numpy side) --------------------------------------

def geocode_from_doc_id(doc_id: np.ndarray):
    """Vectorized page geocode. Returns (has_geo, lat_e6, lon_e6) int64.

    Pages without a geo tag get lat_e6 = lon_e6 = -1.
    """
    d = np.asarray(doc_id, dtype=np.int64)
    h1 = (d * H1_MUL) % M32
    h2 = ((d + 1) * H2_MUL) % M32
    urban = (d % 10) < 8

    c = (h1 % 4).astype(np.int64)
    cx = np.asarray([p[0] for p in URBAN_CENTERS], dtype=np.int64)[c]
    cy = np.asarray([p[1] for p in URBAN_CENTERS], dtype=np.int64)[c]
    bx_u = cx - 4 + h2 % 9
    by_u = cy - 4 + (h2 // 9) % 9
    bx_r = h2 % N_BLOCKS
    by_r = (h2 // 100) % N_BLOCKS
    bx = np.where(urban, bx_u, bx_r)
    by = np.where(urban, by_u, by_r)

    lon_e6 = bx * BLOCK_E6 + 10_000 + h1 % 80_000
    lat_e6 = by * BLOCK_E6 + 10_000 + (h2 // 10_000) % 80_000

    has_geo = (d % NO_GEO_MOD) != 0
    lon_e6 = np.where(has_geo, lon_e6, -1)
    lat_e6 = np.where(has_geo, lat_e6, -1)
    return has_geo, lat_e6, lon_e6


def block_id_str(bx: int, by: int) -> str:
    return f"B{bx:02d}_{by:02d}"


def gadm_id_str(gx: int, gy: int) -> str:
    return f"G{gx}_{gy}"


def parcel_id_str(bx: int, by: int, p: int) -> str:
    return f"B{bx:02d}_{by:02d}_P{p}"


def parcel_anchor_e6(bx: int, by: int, p: int):
    """Anchor of parcel p (0..3) in block (bx, by): the quarter points."""
    ax = bx * BLOCK_E6 + 25_000 + (p % 2) * 50_000
    ay = by * BLOCK_E6 + 25_000 + (p // 2) * 50_000
    return ax, ay


# --- buildings (deterministic per block, integer arithmetic) ---------------
# n buildings per block: 3 + ((bx*7 + by*13) % 6)  → 3..8
# building j of block (bx, by):
#   s = (bx*1000003 + by*1009 + j*2654435761) % 2^31
#   lon_e6 = bx*100000 + 15000 + (s % 70000)
#   lat_e6 = by*100000 + 15000 + ((s // 70000) % 70000)
# (margin 15000 keeps every centroid inside the inset block polygon)

M31 = 1 << 31


def n_buildings_for_block(bx, by):
    bx = np.asarray(bx, dtype=np.int64)
    by = np.asarray(by, dtype=np.int64)
    return 3 + (bx * 7 + by * 13) % 6


def building_centroids_e6(bx: int, by: int) -> np.ndarray:
    """(n, 2) int64 array of (lon_e6, lat_e6) building centroids."""
    n = int(3 + (bx * 7 + by * 13) % 6)
    j = np.arange(n, dtype=np.int64)
    s = (bx * 1000003 + by * 1009 + j * H1_MUL) % M31
    lon = bx * BLOCK_E6 + 15_000 + s % 70_000
    lat = by * BLOCK_E6 + 15_000 + (s // 70_000) % 70_000
    return np.stack([lon, lat], axis=1)


# --- SQL fragments (DuckDB side) ------------------------------------------
# Shared CTE that reproduces the geocode from the `documents` view.
# Downstream oracle queries compose on top of `geo`.

GEO_CTE = f"""
geo AS (
  SELECT
    doc_id,
    text,
    lang,
    source,
    n_chars,
    'https://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
    (doc_id % {NO_GEO_MOD}) <> 0 AS has_geo,
    (doc_id * {H1_MUL}) % {M32} AS h1,
    ((doc_id + 1) * {H2_MUL}) % {M32} AS h2
  FROM documents
),
geo2 AS (
  SELECT *,
    (doc_id % 10) < 8 AS urban,
    CASE (h1 % 4)
      WHEN 0 THEN {URBAN_CENTERS[0][0]} WHEN 1 THEN {URBAN_CENTERS[1][0]}
      WHEN 2 THEN {URBAN_CENTERS[2][0]} ELSE {URBAN_CENTERS[3][0]} END AS cx,
    CASE (h1 % 4)
      WHEN 0 THEN {URBAN_CENTERS[0][1]} WHEN 1 THEN {URBAN_CENTERS[1][1]}
      WHEN 2 THEN {URBAN_CENTERS[2][1]} ELSE {URBAN_CENTERS[3][1]} END AS cy
  FROM geo
),
geo3 AS (
  SELECT *,
    CASE WHEN urban THEN cx - 4 + h2 % 9 ELSE h2 % {N_BLOCKS} END AS bx,
    CASE WHEN urban THEN cy - 4 + (h2 // 9) % 9 ELSE (h2 // 100) % {N_BLOCKS} END AS by
  FROM geo2
),
pages AS (
  SELECT
    doc_id, text, lang, source, n_chars, url, has_geo, bx, by,
    CASE WHEN has_geo THEN bx * {BLOCK_E6} + 10000 + h1 % 80000 ELSE -1 END AS lon_e6,
    CASE WHEN has_geo THEN by * {BLOCK_E6} + 10000 + (h2 // 10000) % 80000 ELSE -1 END AS lat_e6
  FROM geo3
)
"""

_BLOCKS_PER_GADM = GADM_E6 // BLOCK_E6  # 10
N_GADM_AXIS = N_BLOCKS * BLOCK_E6 // GADM_E6  # 10

BLOCK_ID_SQL = "('B' || printf('%02d', bx) || '_' || printf('%02d', by))"
GADM_ID_SQL = (
    f"('G' || CAST(bx // {_BLOCKS_PER_GADM} AS VARCHAR)"
    f" || '_' || CAST(by // {_BLOCKS_PER_GADM} AS VARCHAR))"
)
