"""Polygon-side derivation pipelines (the prclz hierarchy), Ray-Data-first.

streets → blocks:   the reference's block extraction
                    (`midway/midway_blocks.py:56-82`, method
                    `prclz/blocks/methods.py:17-40`) re-expressed as
                    ``groupby(gadm).map_groups``: per admin cell, union
                    the street lines into a planar graph, trace inner
                    faces (the polygonization), inset each face by the
                    street buffer, mint key-derived block ids.
blocks → parcels:   Voronoi decomposition per block
                    (`prclz/parcelization/midway_parcelization.R:44-91`
                    semantics) via the half-plane Voronoi kernel.
blocks → buildings: deterministic synthetic building centroids
                    (fixture side of `prclz/utils.py:69`).
join → complexity:  PIP join buildings→blocks, group centroid lists per
                    block, weak-dual k per block
                    (`midway/midway_complexity.py:42-60`).

All heavy steps are map_batches / map_groups over Arrow batches;
derived tables are cached as parquet under /tmp (they depend only on
the world constants, not on the input scale factor).
"""

from __future__ import annotations

from ..io import read_parquet_clean as _read_parquet_clean

import os

import numpy as np
import pyarrow as pa

from .. import world
from ..registry import Registry
from ..geom.cells import RES_PARTITION, cell_id_e6
from ..geom.boolean import inset_polygon
from ..geom.core import polygon_centroid
from ..geom.wkb import wkb_multipoint, wkb_polygon
from ..graph.complexity import block_complexity
from ..graph.voronoi import voronoi_cells

CACHE_DIR = os.environ.get("PRCLZ_RAY_CACHE", "/tmp/prclz_ray_derived")


# ---------------------------------------------------------------------------
# streets source

def streets_table() -> pa.Table:
    """The synthetic street grid: per 1° admin cell, 11 vertical and 11
    horizontal lines at 0.1° pitch (fixture analogue of the OSM road
    grid, FIXTURES.md §1.2). Columns x0/y0/x1/y1 in degrees."""
    rows = {k: [] for k in ("line_id", "gadm", "x0", "y0", "x1", "y1")}
    n_gadm = world.GADM_E6 // world.BLOCK_E6  # 10 blocks per admin cell side
    for gx in range(N_GADM_AXIS()):
        for gy in range(N_GADM_AXIS()):
            gadm = world.gadm_id_str(gx, gy)
            x_lo, y_lo = float(gx), float(gy)
            for i in range(n_gadm + 1):
                off = i * world.BLOCK_E6 / 1e6
                rows["line_id"].append(f"{gadm}_v{i}")
                rows["gadm"].append(gadm)
                rows["x0"].append(x_lo + off)
                rows["y0"].append(y_lo)
                rows["x1"].append(x_lo + off)
                rows["y1"].append(y_lo + 1.0)
                rows["line_id"].append(f"{gadm}_h{i}")
                rows["gadm"].append(gadm)
                rows["x0"].append(x_lo)
                rows["y0"].append(y_lo + off)
                rows["x1"].append(x_lo + 1.0)
                rows["y1"].append(y_lo + off)
    return pa.table(rows)


def N_GADM_AXIS() -> int:
    return world.N_GADM_AXIS


DIAG_CHORD = 0.4  # x-offset of the vertical chord in the diagonal fixture


def diagonal_streets_table() -> pa.Table:
    """Diagonal street fixture: per 1° admin cell, the square border, the
    main diagonal, and a vertical chord at x = +0.4 — a non-axis-aligned
    arrangement only the general noding path can polygonize. The chord
    crosses the diagonal mid-segment (proper crossing at +(0.4, 0.4))
    and T-joins the borders mid-segment; after noding + face tracing
    each cell yields four convex blocks (two triangles, two quads)."""
    rows = {k: [] for k in ("line_id", "gadm", "x0", "y0", "x1", "y1")}

    def add(gadm, name, ax, ay, bx, by):
        rows["line_id"].append(f"{gadm}_{name}")
        rows["gadm"].append(gadm)
        rows["x0"].append(ax)
        rows["y0"].append(ay)
        rows["x1"].append(bx)
        rows["y1"].append(by)

    for gx in range(N_GADM_AXIS()):
        for gy in range(N_GADM_AXIS()):
            gadm = world.gadm_id_str(gx, gy)
            x, y = float(gx), float(gy)
            add(gadm, "s", x, y, x + 1.0, y)
            add(gadm, "n", x, y + 1.0, x + 1.0, y + 1.0)
            add(gadm, "w", x, y, x, y + 1.0)
            add(gadm, "e", x + 1.0, y, x + 1.0, y + 1.0)
            add(gadm, "d1", x, y, x + 1.0, y + 1.0)
            add(gadm, "c", x + DIAG_CHORD, y, x + DIAG_CHORD, y + 1.0)
    return pa.table(rows)


# ---------------------------------------------------------------------------
# block extraction (map_groups per gadm)

_BLOCK_COLS = (
    "block_id", "gadm", "bx", "by",
    "xmin_e6", "ymin_e6", "xmax_e6", "ymax_e6", "cell_r5", "geom_wkb",
)


def _new_block_rows() -> dict:
    return {k: [] for k in _BLOCK_COLS}


def _emit_block(out: dict, gadm: str, ring: np.ndarray) -> None:
    """Append one block row derived from its ring — the single id/bounds
    derivation shared by every extraction method (plugin parity by
    construction)."""
    cx, cy = polygon_centroid(ring)
    bx = int(cx * 1e6) // world.BLOCK_E6
    by = int(cy * 1e6) // world.BLOCK_E6
    out["block_id"].append(world.block_id_str(bx, by))
    out["gadm"].append(gadm)
    out["bx"].append(bx)
    out["by"].append(by)
    out["xmin_e6"].append(int(round(ring[:, 0].min() * 1e6)))
    out["ymin_e6"].append(int(round(ring[:, 1].min() * 1e6)))
    out["xmax_e6"].append(int(round(ring[:, 0].max() * 1e6)))
    out["ymax_e6"].append(int(round(ring[:, 1].max() * 1e6)))
    ctr_lat = by * world.BLOCK_E6 + world.BLOCK_E6 // 2
    ctr_lon = bx * world.BLOCK_E6 + world.BLOCK_E6 // 2
    out["cell_r5"].append(int(cell_id_e6(ctr_lat, ctr_lon, RES_PARTITION)))
    out["geom_wkb"].append(wkb_polygon(ring))


def _block_rows_table(out: dict) -> pa.Table:
    t = pa.table(out)
    return t.set_column(
        t.schema.get_field_index("geom_wkb"), "geom_wkb", t.column("geom_wkb").cast(pa.binary())
    )

def extract_blocks_group(group: pa.Table) -> pa.Table:
    """One admin cell's streets → its block polygons.

    Real polygonization over an ARBITRARY street arrangement: general
    segment-intersection noding (`geom/noding.py` — crossings,
    T-junctions, collinear overlaps; the unary_union the reference
    gets from shapely, `prclz/blocks/methods.py:43-106`) → planar
    graph → rotation-system face tracing → drop outer face → inset
    each inner face by the street buffer → WKB + key-derived block id
    (M7/M12 semantics).
    """
    from ..geom.noding import node_segments
    from ..graph.planar import PlanarGraph

    gadm = group.column("gadm")[0].as_py()
    x0 = group.column("x0").to_numpy()
    y0 = group.column("y0").to_numpy()
    x1 = group.column("x1").to_numpy()
    y1 = group.column("y1").to_numpy()
    segs = np.stack(
        [np.stack([x0, y0], axis=1), np.stack([x1, y1], axis=1)], axis=1
    )

    eps_deg = world.STREET_EPS_E6 / 1e6
    g = PlanarGraph()
    for a, b in node_segments(segs):
        g.add_edge(a, b)

    out = _new_block_rows()
    for face in g.inner_faces():
        ring = np.array([e[0] for e in face], dtype=np.float64)
        for inset in inset_polygon(ring, eps_deg):
            if len(inset) < 3:
                continue
            _emit_block(out, gadm, inset)
    return _block_rows_table(out)


def extract_blocks_buffered_group(group: pa.Table) -> pa.Table:
    """Alternate extraction method (the plugin point, §2.10): region −
    buffered(street lines), the reference's DEFAULT
    ``BufferedLineDifference`` (`prclz/blocks/methods.py:17-40`).

    Axis-aligned implementation: buffered street rectangles partition
    the admin cell into a grid; each positive-area gap between
    consecutive buffered lines is a block. For general (non-axis-
    aligned) arrangements use ``extract_blocks_group`` (face tracing,
    the ``IntersectionPolygonization`` analogue M7). Both methods must
    produce identical block sets — parity is oracle-checked.
    """
    gadm = group.column("gadm")[0].as_py()
    x0s = group.column("x0").to_numpy()
    y0s = group.column("y0").to_numpy()
    x1s = group.column("x1").to_numpy()
    y1s = group.column("y1").to_numpy()
    eps_deg = world.STREET_EPS_E6 / 1e6

    vxs = sorted({x0s[i] for i in range(len(x0s)) if x0s[i] == x1s[i]})
    hys = sorted({y0s[i] for i in range(len(y0s)) if y0s[i] == y1s[i]})

    out = _new_block_rows()
    for xa, xb in zip(vxs, vxs[1:]):
        for ya, yb in zip(hys, hys[1:]):
            lo_x, hi_x = xa + eps_deg, xb - eps_deg
            lo_y, hi_y = ya + eps_deg, yb - eps_deg
            if hi_x <= lo_x or hi_y <= lo_y:
                continue  # fully consumed by the buffer
            ring = np.array(
                [[lo_x, lo_y], [hi_x, lo_y], [hi_x, hi_y], [lo_x, hi_y]]
            )
            _emit_block(out, gadm, ring)
    return _block_rows_table(out)


def periphery_filter(blocks: pa.Table, boundary_ring: np.ndarray) -> pa.Table:
    """M8 periphery filter, the reference's exact rule: drop every block
    that INTERSECTS the buffered region boundary
    (`prclz/blocks/extraction.py:58-59` —
    ``not mp_border.intersects(block)``); blocks strictly inside the
    buffered region AND blocks fully outside it both survive.

    ``boundary_ring``: the buffered region's boundary as a closed ring
    (degrees). A block intersects it iff (a) its vertices straddle the
    ring (some in, some out), (b) a ring vertex lies inside the block,
    or (c) a block edge crosses/touches a ring edge (catches edges
    passing through with both endpoints outside). All three tests are
    vectorized over the flat packed block rings.
    """
    from ..geom.core import point_in_polygon, points_in_polygon
    from ..geom.wkb import parse_wkb

    n = blocks.num_rows
    if n == 0:
        return blocks
    rings = [parse_wkb(w)[1][0] for w in blocks.column("geom_wkb").to_pylist()]
    lens = np.array([len(r) for r in rings], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(lens)])
    flat = np.concatenate(rings, axis=0)
    block_of = np.repeat(np.arange(n, dtype=np.int64), lens)

    # (a) vertex straddle: per-block count of vertices inside the ring
    vin = points_in_polygon(boundary_ring, flat[:, 0], flat[:, 1])
    cnt_in = np.bincount(block_of, weights=vin, minlength=n).astype(np.int64)
    mixed = (cnt_in > 0) & (cnt_in < lens)

    # (b) ring vertex inside a block (few ring vertices; bbox prefilter)
    bvert = np.zeros(n, dtype=bool)
    bx0 = np.array([r[:, 0].min() for r in rings])
    bx1 = np.array([r[:, 0].max() for r in rings])
    by0 = np.array([r[:, 1].min() for r in rings])
    by1 = np.array([r[:, 1].max() for r in rings])
    for qx, qy in boundary_ring[:-1] if np.array_equal(
        boundary_ring[0], boundary_ring[-1]
    ) else boundary_ring:
        cand = np.flatnonzero((bx0 <= qx) & (qx <= bx1) & (by0 <= qy) & (qy <= by1))
        for i in cand:
            if point_in_polygon(rings[i], float(qx), float(qy)):
                bvert[i] = True

    # (c) edge × ring-edge intersection (proper or touching), fully
    # broadcast: block edges (E) × ring edges (K)
    nxt = np.arange(1, len(flat) + 1, dtype=np.int64)
    nxt[off[1:] - 1] = off[:-1]
    A0, A1 = flat, flat[nxt]
    B = boundary_ring
    if not np.array_equal(B[0], B[-1]):
        B = np.vstack([B, B[:1]])
    B0, B1 = B[:-1], B[1:]

    def _cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    d1 = _cross(B0[None, :, 0], B0[None, :, 1], B1[None, :, 0], B1[None, :, 1],
                A0[:, None, 0], A0[:, None, 1])
    d2 = _cross(B0[None, :, 0], B0[None, :, 1], B1[None, :, 0], B1[None, :, 1],
                A1[:, None, 0], A1[:, None, 1])
    d3 = _cross(A0[:, None, 0], A0[:, None, 1], A1[:, None, 0], A1[:, None, 1],
                B0[None, :, 0], B0[None, :, 1])
    d4 = _cross(A0[:, None, 0], A0[:, None, 1], A1[:, None, 0], A1[:, None, 1],
                B1[None, :, 0], B1[None, :, 1])
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    # touching (endpoint/collinear) counts as intersecting — exact
    # point-on-segment rule: d==0 puts the endpoint on the other
    # segment's LINE; within that segment's bbox ⇒ on the segment.
    # (A degenerate closed-ring edge A0==A1 has d3==d4==0 always; the
    # bbox gate reduces it to a true vertex-on-boundary test.)
    ex0 = np.minimum(A0[:, 0], A1[:, 0])[:, None]
    ex1 = np.maximum(A0[:, 0], A1[:, 0])[:, None]
    ey0 = np.minimum(A0[:, 1], A1[:, 1])[:, None]
    ey1 = np.maximum(A0[:, 1], A1[:, 1])[:, None]
    kx0 = np.minimum(B0[:, 0], B1[:, 0])[None, :]
    kx1 = np.maximum(B0[:, 0], B1[:, 0])[None, :]
    ky0 = np.minimum(B0[:, 1], B1[:, 1])[None, :]
    ky1 = np.maximum(B0[:, 1], B1[:, 1])[None, :]

    def _on(px, py, x0, x1, y0, y1):
        return (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)

    touch = (
        ((d1 == 0) & _on(A0[:, None, 0], A0[:, None, 1], kx0, kx1, ky0, ky1))
        | ((d2 == 0) & _on(A1[:, None, 0], A1[:, None, 1], kx0, kx1, ky0, ky1))
        | ((d3 == 0) & _on(B0[None, :, 0], B0[None, :, 1], ex0, ex1, ey0, ey1))
        | ((d4 == 0) & _on(B1[None, :, 0], B1[None, :, 1], ex0, ex1, ey0, ey1))
    )
    ecross = np.zeros(n, dtype=bool)
    hit_edges = np.flatnonzero((proper | touch).any(axis=1))
    ecross[np.unique(block_of[hit_edges])] = True

    keep = ~(mixed | bvert | ecross)
    return blocks.filter(pa.array(keep))


# the reference's BlockExtractionMethod plugin registry
# (`prclz/blocks/methods.py:11-14,109`) — a formal Registry: users add
# their own method under a name and run the SAME pipeline through
# extract_blocks(extraction_method=...) (tests/test_registry.py does).
EXTRACTION_METHODS = Registry("extraction method")
EXTRACTION_METHODS.register("face_trace", extract_blocks_group)  # M7 polygonize analogue
EXTRACTION_METHODS.register("buffered_difference", extract_blocks_buffered_group)  # M6 default analogue
DEFAULT_EXTRACTION_METHOD = "face_trace"


def extract_blocks(streets_ds, extraction_method: str = DEFAULT_EXTRACTION_METHOD):
    """Street segments → block polygons, pluggable method — the
    reference's ``extract_blocks(..., extraction_method=...)`` surface
    (`prclz/blocks/extraction.py:30-36`): ONE pipeline shape (group
    per admin cell, method per group), the method a registry name."""
    fn = EXTRACTION_METHODS[extraction_method]
    out = streets_ds.groupby("gadm").map_groups(fn, batch_format="pyarrow")
    # LAUNDER possible schema-less empties: this is the pluggable user
    # surface, so the caller may pass a streets dataset with more
    # partitions than admin cells — map_groups then emits empty
    # (schema-less) blocks that intermittently break the downstream
    # write/join (CLAUDE.md hazard). The distinct-cell count is unknown
    # here without an extra pass, so instead of sizing the pre-reduce
    # width we rebuild blocks under the surviving schema after the
    # aggregate (the connected_components pattern). Width 8 is
    # bounded by construction: the OUTPUT is a blocks side table
    # (~10^3-10^4 polygons), not the page stream.
    return out.repartition(8)


# ---------------------------------------------------------------------------
# parcels (Voronoi per block) and buildings

def parcelize_batch(batch: pa.Table) -> pa.Table:
    """Blocks → 4 Voronoi parcels each (anchors at the quarter points).

    Runs the real Voronoi kernel + convex clip per block — the R
    parcelization semantics (segmentize → st_voronoi → intersect →
    dissolve) collapse to this for point anchors."""
    from ..geom.wkb import parse_wkb

    bxs = batch.column("bx").to_numpy()
    bys = batch.column("by").to_numpy()
    wkbs = batch.column("geom_wkb").to_pylist()
    out = {
        "parcel_id": [], "block_id": [], "bx": [], "by": [], "p": [],
        "anchor_lon_e6": [], "anchor_lat_e6": [], "geom_wkb": [],
    }
    for i in range(len(bxs)):
        bx, by = int(bxs[i]), int(bys[i])
        _, rings = parse_wkb(wkbs[i])
        block_ring = rings[0]
        anchors_e6 = np.array(
            [world.parcel_anchor_e6(bx, by, p) for p in range(world.PARCELS_PER_BLOCK)],
            dtype=np.float64,
        )
        anchors_deg = anchors_e6 / 1e6
        from ..geom.core import clip_polygon_convex

        for p, cell_ring in voronoi_cells(anchors_deg):
            clipped = clip_polygon_convex(cell_ring, block_ring)
            if len(clipped) < 3:
                continue
            out["parcel_id"].append(world.parcel_id_str(bx, by, p))
            out["block_id"].append(world.block_id_str(bx, by))
            out["bx"].append(bx)
            out["by"].append(by)
            out["p"].append(p)
            out["anchor_lon_e6"].append(int(anchors_e6[p, 0]))
            out["anchor_lat_e6"].append(int(anchors_e6[p, 1]))
            out["geom_wkb"].append(wkb_polygon(clipped))
    t = pa.table(out)
    return t.set_column(
        t.schema.get_field_index("geom_wkb"), "geom_wkb", t.column("geom_wkb").cast(pa.binary())
    )


FOOTPRINT_E6 = 8_000  # synthetic square building footprint side (µdeg)
# the reference's 1 m → 100 m segmentize ladder
# (`prclz/parcelization/midway_parcelization_digital_globe.R:124-137`),
# scaled to the synthetic world's µdeg units
PARCEL_PTDIST_LADDER_E6 = (4_000, 16_000)


def segmentize_ring(ring: np.ndarray, spacing: float) -> np.ndarray:
    """Points along the ring's edges at ≤ ``spacing`` intervals
    (each edge's start vertex included; sf ``st_segmentize`` shape)."""
    ring = np.asarray(ring, dtype=np.float64)
    out = []
    n = len(ring)
    for i in range(n):
        a, b = ring[i], ring[(i + 1) % n]
        length = float(np.hypot(*(b - a)))
        k = max(1, int(np.ceil(length / spacing)))
        t = np.arange(k, dtype=np.float64)[:, None] / k
        out.append(a[None, :] + t * (b - a)[None, :])
    return np.vstack(out)


def _parcelize_footprints(block_ring: np.ndarray, cents: np.ndarray, ptdist: float):
    """st_parcelize semantics (`midway_parcelization_digital_globe.R:46-93`):
    per building, its footprint boundary segmentized at ``ptdist`` →
    Voronoi over ALL boundary points → cells clipped to the block →
    dissolved per building (`polygon_union`). Returns
    {building_index: [rings]}; raises if any building ends up with no
    territory (the ladder's retry trigger)."""
    from ..geom.boolean import polygon_union
    from ..geom.core import clip_polygon_convex

    h = FOOTPRINT_E6 / 1e6 / 2.0
    sites, owners = [], []
    for i, (cx, cy) in enumerate(cents):
        fp = np.array(
            [[cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h], [cx - h, cy + h]]
        )
        pts = segmentize_ring(fp, ptdist)
        sites.append(pts)
        owners.append(np.full(len(pts), i, dtype=np.int64))
    sites = np.vstack(sites)
    owners = np.concatenate(owners)
    per_owner: dict[int, list] = {}
    for site_idx, cell in voronoi_cells(sites):
        clipped = clip_polygon_convex(cell, block_ring)
        if len(clipped) >= 3:
            per_owner.setdefault(int(owners[site_idx]), []).append(clipped)
    out = {}
    for i in range(len(cents)):
        parts = polygon_union(per_owner.get(i, []))
        if not parts:
            raise ValueError(f"building {i} has no parcel territory at ptdist={ptdist}")
        out[i] = parts
    return out


def parcelize_ladder_block(bx: int, by: int) -> pa.Table:
    """One block through the parcelization FALLBACK LADDER
    (`midway_parcelization_digital_globe.R:124-137`): try the fine
    segmentize resolution, retry coarser on failure, and finally
    inherit the block geometry itself as one parcel (owner −1) — the
    reference's empty-block fallback. Output: one row per parcel part
    with exact-integer bounds and the resolution that succeeded."""
    from ..geom.wkb import wkb_polygon as _wkb_poly

    e = world.STREET_EPS_E6 / 1e6
    x0, y0 = bx * 0.1 + e, by * 0.1 + e
    x1, y1 = (bx + 1) * 0.1 - e, (by + 1) * 0.1 - e
    block_ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    cents = world.building_centroids_e6(bx, by) / 1e6
    block_id = world.block_id_str(bx, by)
    rows = {
        "block_id": [], "bldg": [], "part": [], "ptdist_e6": [],
        "xmin_e6": [], "ymin_e6": [], "xmax_e6": [], "ymax_e6": [], "geom_wkb": [],
    }

    def emit(owner: int, part: int, ptdist_e6: int, ring: np.ndarray):
        rows["block_id"].append(block_id)
        rows["bldg"].append(owner)
        rows["part"].append(part)
        rows["ptdist_e6"].append(ptdist_e6)
        rows["xmin_e6"].append(int(round(ring[:, 0].min() * 1e6)))
        rows["ymin_e6"].append(int(round(ring[:, 1].min() * 1e6)))
        rows["xmax_e6"].append(int(round(ring[:, 0].max() * 1e6)))
        rows["ymax_e6"].append(int(round(ring[:, 1].max() * 1e6)))
        rows["geom_wkb"].append(_wkb_poly(ring))

    done = False
    if len(cents):
        for ptdist_e6 in PARCEL_PTDIST_LADDER_E6:
            try:
                parcels = _parcelize_footprints(block_ring, cents, ptdist_e6 / 1e6)
            except ValueError:
                # the designed no-territory retry trigger ONLY — an
                # unexpected kernel exception must propagate (a bare
                # except would silently degrade every block to the
                # inherit fallback and the rows-only check can't see it)
                continue
            for owner in sorted(parcels):
                for p, ring in enumerate(parcels[owner]):
                    emit(owner, p, ptdist_e6, ring)
            done = True
            break
    if not done:
        emit(-1, 0, 0, block_ring)  # inherit the block geometry
    t = pa.table(rows)
    return t.set_column(
        t.schema.get_field_index("geom_wkb"), "geom_wkb", t.column("geom_wkb").cast(pa.binary())
    )


def buildings_batch(batch: pa.Table) -> pa.Table:
    """Blocks → deterministic synthetic building centroids (3-8/block)."""
    bxs = batch.column("bx").to_numpy()
    bys = batch.column("by").to_numpy()
    ids, lons, lats = [], [], []
    for i in range(len(bxs)):
        bx, by = int(bxs[i]), int(bys[i])
        pts = world.building_centroids_e6(bx, by)
        for j, (lon, lat) in enumerate(pts):
            ids.append(f"B{bx:02d}_{by:02d}_b{j}")
            lons.append(int(lon))
            lats.append(int(lat))
    return pa.table({"bldg_id": ids, "lon_e6": lons, "lat_e6": lats})


# ---------------------------------------------------------------------------
# complexity (per-block k via weak-dual sequence)

def complexity_group(group: pa.Table) -> pa.Table:
    """One block's building centroids → its k-complexity record
    (`midway/midway_complexity.py:32-37,57-60` semantics)."""
    from ..geom.wkb import parse_wkb

    block_id = group.column("block_id")[0].as_py()
    wkb = group.column("geom_wkb")[0].as_py()
    _, rings = parse_wkb(wkb)
    lons = group.column("lon_e6").to_numpy() / 1e6
    lats = group.column("lat_e6").to_numpy() / 1e6
    centroids = np.stack([lons, lats], axis=1)
    k = block_complexity(rings[0], centroids)
    return pa.table(
        {
            "block_id": [block_id],
            "k": pa.array([k], pa.int32()),
            "n_bldgs": pa.array([len(centroids)], pa.int32()),
            "centroids_wkb": pa.array([wkb_multipoint(centroids)], pa.binary()),
        }
    )


def complexity_bucket_group(group: pa.Table) -> pa.Table:
    """A BUCKET of blocks (the ≥10⁴-tiny-groups rule: one Ray group per
    hash bucket, never per block_id) — blocks are regrouped by a single
    argsort inside and each run goes through ``complexity_group``."""
    ids = np.asarray(group.column("block_id").to_pylist())
    order = np.argsort(ids, kind="stable")
    g = group.take(pa.array(order))
    sids = ids[order]
    heads = np.flatnonzero(np.concatenate([[True], sids[1:] != sids[:-1]]))
    bounds = np.concatenate([heads, [len(sids)]])
    return pa.concat_tables(
        complexity_group(g.slice(bounds[i], bounds[i + 1] - bounds[i]))
        for i in range(len(heads))
    )


# ---------------------------------------------------------------------------
# dataset builders (cached)

def _cached(name: str, build):
    """Build a derived table once per machine; cache as parquet."""
    import pyarrow.parquet as pq

    import tempfile

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        tbl = build()
        # unique tmp per builder → os.replace is genuinely atomic even
        # when two processes race to build the same table
        fd, tmp = tempfile.mkstemp(prefix=f"{name}.", suffix=".tmp", dir=CACHE_DIR)
        os.close(fd)
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return path


def _cached_ds(name: str, build_ds):
    """Build a derived table once per machine by STREAMING the Dataset
    to a parquet cache DIRECTORY — never an `iter_batches` concat onto
    the driver (at 100× polygon scale the side table outgrows the
    driver heap; workers write their own blocks in parallel). Publish
    is an atomic directory rename, so a concurrent builder either wins
    the rename or discards its equivalent copy."""
    import shutil
    import tempfile

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"{name}.parquet")
    if not os.path.exists(path):
        ds = build_ds()
        tmp = tempfile.mkdtemp(prefix=f"{name}.", dir=CACHE_DIR)
        # ~50k rows/file (the measured per-task sweet spot, BASELINE.md):
        # avoids a dust cloud of per-group files that would hand every
        # reader hundreds of near-empty blocks
        ds.write_parquet(tmp, min_rows_per_file=50_000)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost the publish race: the winner's directory holds the
            # same deterministic table — drop ours
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def blocks_path() -> str:
    def build():
        import ray.data

        return extract_blocks(ray.data.from_arrow(streets_table()))

    return _cached_ds("blocks", build)


def blocks_diagonal_path() -> str:
    def build():
        import ray.data

        return extract_blocks(ray.data.from_arrow(diagonal_streets_table()))

    return _cached_ds("blocks_diagonal", build)


def parcels_path() -> str:
    def build():
        return _read_parquet_clean(blocks_path()).map_batches(
            parcelize_batch, batch_format="pyarrow"
        )

    return _cached_ds("parcels", build)


def buildings_path() -> str:
    def build():
        return _read_parquet_clean(blocks_path()).map_batches(
            buildings_batch, batch_format="pyarrow"
        )

    return _cached_ds("buildings", build)
