"""Line→region spatial routing (SURVEY J3/J4): assign each street
segment to every admin cell / block rectangle it intersects.

The reference routes linestrings to admin regions with a geopandas
``sjoin(op='intersects')`` before block extraction
(`midway/midway_blocks.py:66-75`) and shards dilated lines by GADM
(`data_processing/split_lines.py:36`). Here both are ONE map-side
kernel — no shuffle at all:

1. **bbox cover**: each segment computes the small rectangle-grid
   range its bounding box touches (closed-boundary aware: a
   coordinate exactly on a grid line touches both neighbors) and
   explodes candidate (segment, cell) pairs by repeat/arange — a
   street segment covers O(len/cell) cells, so replication is bounded
   by geometry, not data size;
2. **exact predicate**: segment ∩ closed rectangle has POSITIVE
   length — Liang-Barsky slab intervals compared entirely in int64
   cross-multiplications (coords are µdeg ints ≤ 10^7, products ≤
   10^14: exact). Point-only touches (corner grazes) are rejected;
   a segment running along a shared cell edge belongs to BOTH cells
   (that is the honest `intersects` answer — the fixture's pre-keyed
   `gadm` column is NOT consulted).

Dilation (J4): dilating a segment by ε in L∞ and intersecting a
rectangle is exactly intersecting the un-dilated segment with the
rectangle grown by ε per axis (Minkowski), so the same kernel serves
the dilated-lines ⋈ blocks shard map with ``dilate_e6=ε``.

At 100 TB the lines table is any parquet of (line_id, x0..y1) µdeg
segments; the kernel is stateless per batch and the output is already
keyed by cell for whatever groupby follows (J3's `groupby(gadm)`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import world


from .hashing import arrow_i64 as _i64


def gadm_ids_vec(gx: np.ndarray, gy: np.ndarray) -> pa.Array:
    """Vectorized `G{gx}_{gy}` (world.gadm_id_str over arrays)."""
    return pc.binary_join_element_wise(
        "G", pc.cast(_i64(gx), pa.string()), "_", pc.cast(_i64(gy), pa.string()), ""
    )


def block_ids_vec(bx: np.ndarray, by: np.ndarray) -> pa.Array:
    """Vectorized `B{bx:02d}_{by:02d}` (world.block_id_str over arrays)."""
    x = pc.utf8_lpad(pc.cast(_i64(bx), pa.string()), 2, "0")
    y = pc.utf8_lpad(pc.cast(_i64(by), pa.string()), 2, "0")
    return pc.binary_join_element_wise("B", x, "_", y, "")


def _slab(p: np.ndarray, d: np.ndarray, lo_w: np.ndarray, hi_w: np.ndarray):
    """One axis's Liang-Barsky interval as exact fractions
    (lo_num/den, hi_num/den) with den > 0; a degenerate axis (d = 0)
    contributes the full [0, 1] interval if the point lies in the
    closed wall range, else the pair is dead."""
    pos = d > 0
    neg = d < 0
    lo = np.where(pos, lo_w - p, np.where(neg, p - hi_w, 0))
    hi = np.where(pos, hi_w - p, np.where(neg, p - lo_w, 1))
    den = np.where(d != 0, np.abs(d), 1)
    ok = (d != 0) | ((lo_w <= p) & (p <= hi_w))
    return lo, hi, den, ok


def segment_rect_mask(px, py, qx, qy, x0, y0, x1, y1) -> np.ndarray:
    """True where segment (p,q) ∩ closed rect [x0,x1]×[y0,y1] has
    positive length. All int64; exact (see module docstring)."""
    lx, hx, dx, okx = _slab(px, qx - px, x0, x1)
    ly, hy, dy, oky = _slab(py, qy - py, y0, y1)
    # t1 > t0 ⇔ every upper bound beats every lower bound (strict):
    return (
        ((px != qx) | (py != qy))  # a point "segment" has no length —
        # without this, p==q inside the rect takes both d=0 branches
        # and passes every condition, violating the contract above
        & okx
        & oky
        & (hx > 0)                # tx_hi > 0
        & (hy > 0)                # ty_hi > 0
        & (lx < dx)               # tx_lo < 1
        & (ly < dy)               # ty_lo < 1
        & (hx * dy > ly * dx)     # tx_hi > ty_lo
        & (hy * dx > lx * dy)     # ty_hi > tx_lo
    )


def sql_segment_rect(px, py, qx, qy, x0, y0, x1, y1) -> str:
    """The identical predicate as a DuckDB boolean expression over the
    named integer columns/expressions — the oracle runs the same
    cross-multiplied arithmetic, term for term."""

    def slab(p, q, lo, hi):
        d = f"({q} - {p})"
        l = f"(CASE WHEN {d} > 0 THEN {lo} - {p} WHEN {d} < 0 THEN {p} - {hi} ELSE 0 END)"
        h = f"(CASE WHEN {d} > 0 THEN {hi} - {p} WHEN {d} < 0 THEN {p} - {lo} ELSE 1 END)"
        dn = f"(CASE WHEN {d} = 0 THEN 1 ELSE abs({d}) END)"
        ok = f"({d} != 0 OR ({lo} <= {p} AND {p} <= {hi}))"
        return l, h, dn, ok

    lx, hx, dx, okx = slab(px, qx, x0, x1)
    ly, hy, dy, oky = slab(py, qy, y0, y1)
    return (
        f"(({px} != {qx} OR {py} != {qy}) "  # degenerate-segment
        # reject, mirrored term for term with segment_rect_mask
        f"AND {okx} AND {oky} AND {hx} > 0 AND {hy} > 0 "
        f"AND {lx} < {dx} AND {ly} < {dy} "
        f"AND {hx} * {dy} > {ly} * {dx} AND {hy} * {dx} > {lx} * {dy})"
    )


def _cover_range(lo: np.ndarray, hi: np.ndarray, cell: int, n_axis: int):
    """Closed-boundary grid cover of [lo, hi]: cell c = [c·cell,
    (c+1)·cell] is a candidate iff c·cell ≤ hi and (c+1)·cell ≥ lo."""
    c_lo = np.clip(np.where(lo % cell == 0, lo // cell - 1, lo // cell), 0, n_axis - 1)
    c_hi = np.clip(hi // cell, 0, n_axis - 1)
    return c_lo, c_hi


def make_route_fn(cell_e6: int, n_axis: int, dilate_e6: int = 0,
                  inset_e6: int = 0, ids_vec=None, out_col: str = "gadm"):
    """map_batches fn: segment batch (line_id, x0_e6..y1_e6) → exact
    (line_id, <out_col>) intersection pairs against the n_axis×n_axis
    grid of cell_e6-sized closed squares, each shrunk by inset_e6
    (block rects are street-inset) then grown by dilate_e6 (the L∞
    line dilation, moved onto the rectangle by Minkowski equivalence).
    Candidate cover stays a superset whenever dilate_e6 ≥ inset_e6."""
    ids_vec = ids_vec or gadm_ids_vec
    grow = dilate_e6 - inset_e6
    empty = pa.table(
        {"line_id": pa.array([], pa.string()), out_col: pa.array([], pa.string())}
    )

    def route(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        px = batch.column("x0_e6").to_numpy(zero_copy_only=False)
        py = batch.column("y0_e6").to_numpy(zero_copy_only=False)
        qx = batch.column("x1_e6").to_numpy(zero_copy_only=False)
        qy = batch.column("y1_e6").to_numpy(zero_copy_only=False)
        bxlo, bxhi = np.minimum(px, qx) - dilate_e6, np.maximum(px, qx) + dilate_e6
        bylo, byhi = np.minimum(py, qy) - dilate_e6, np.maximum(py, qy) + dilate_e6
        cx0, cx1 = _cover_range(bxlo, bxhi, cell_e6, n_axis)
        cy0, cy1 = _cover_range(bylo, byhi, cell_e6, n_axis)
        ncand = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        total = int(ncand.sum())
        seg = np.repeat(np.arange(len(px), dtype=np.int64), ncand)
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ncand)[:-1]]), ncand
        )
        w = (cy1 - cy0 + 1)[seg]
        gx = cx0[seg] + local // w
        gy = cy0[seg] + local % w
        rx0 = gx * cell_e6 - grow
        ry0 = gy * cell_e6 - grow
        rx1 = (gx + 1) * cell_e6 + grow
        ry1 = (gy + 1) * cell_e6 + grow
        keep = segment_rect_mask(
            px[seg], py[seg], qx[seg], qy[seg], rx0, ry0, rx1, ry1
        )
        seg, gx, gy = seg[keep], gx[keep], gy[keep]
        ids = batch.column("line_id").take(pa.array(seg))
        return pa.table({"line_id": ids, out_col: ids_vec(gx, gy)})

    return route
