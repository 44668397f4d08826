"""Polygon booleans for arbitrary simple rings, built from the
engine's own arrangement machinery (noding + rotation-system face
tracing) — no geometry library.

Provides the two operations the prclz hierarchy needs on NON-CONVEX
blocks, lifting the convex-only caveat of `geom/core.py`:

- ``polygon_intersection(a, b)``: intersection of two simple rings as
  a list of clean rings (multi-part aware, no internal diagonals, no
  Sutherland–Hodgman bridge artifacts). Role of shapely
  ``cell.intersection(block)`` in `prclz/complexity.py:28-37`.
- ``inset_polygon(ring, eps)``: negative buffer (erosion) with MITRE
  join semantics — exact for convex rings (= ``inset_convex``), and at
  reflex vertices equal to shapely ``buffer(-eps, join_style=2)``
  (the reference's default round join draws discretized arcs there;
  mitre is the deterministic arc-free choice, conservative by at most
  the arc/miter sliver). Role of `prclz/blocks/methods.py:17-40`.

Method: node the input boundaries into a planar arrangement
(`geom/noding.py`), trace all faces, and classify each face by the
nonzero winding number of a guaranteed-interior representative point.
Faces of the arrangement never straddle an input boundary, so one
point decides membership exactly. O((n+m)²) pairwise noding — block
scale (tens to hundreds of vertices), run inside map_batches/
map_groups partitions.
"""

from __future__ import annotations

import numpy as np

from .core import open_ring, polygon_signed_area2
from .noding import node_segments


def _norm_ring(ring: np.ndarray, ccw: bool = True) -> np.ndarray:
    """Open ring, CCW-normalized, consecutive duplicates dropped."""
    ring = open_ring(ring)
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    ring = ring[keep]
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    if ccw and len(ring) >= 3 and polygon_signed_area2(ring) < 0:
        ring = ring[::-1]
    return ring


def is_convex(ring: np.ndarray, tol: float = 0.0) -> bool:
    """True iff the (open or closed) ring is convex."""
    r = _norm_ring(ring)
    if len(r) < 4:
        return True
    d = np.roll(r, -1, axis=0) - r
    cr = d[:, 0] * np.roll(d, -1, axis=0)[:, 1] - d[:, 1] * np.roll(d, -1, axis=0)[:, 0]
    return bool(np.all(cr >= -tol) or np.all(cr <= tol))


def winding_number(ring: np.ndarray, x: float, y: float) -> int:
    """Nonzero-rule winding number of (x, y) w.r.t. the closed ring
    (possibly self-intersecting; vertex order as given)."""
    r = np.asarray(ring, dtype=np.float64)
    a = r
    b = np.roll(r, -1, axis=0)
    wn = 0
    for i in range(len(r)):
        ax, ay = a[i]
        bx, by = b[i]
        if ay <= y:
            if by > y and (bx - ax) * (y - ay) - (by - ay) * (x - ax) > 0:
                wn += 1
        elif by <= y and (bx - ax) * (y - ay) - (by - ay) * (x - ax) < 0:
            wn -= 1
    return wn


def representative_point(ring: np.ndarray) -> tuple[float, float]:
    """A point strictly inside a simple ring: the centroid of an ear
    triangle (ear-clipping test), falling back to the area centroid
    for convex/small rings."""
    r = _norm_ring(ring)
    n = len(r)
    if n < 3:
        c = r.mean(axis=0) if n else np.zeros(2)
        return float(c[0]), float(c[1])
    for i in range(n):
        p, q, s = r[(i - 1) % n], r[i], r[(i + 1) % n]
        cross = (q[0] - p[0]) * (s[1] - p[1]) - (q[1] - p[1]) * (s[0] - p[0])
        if cross <= 0:
            continue  # reflex or degenerate vertex
        # ear test: no other vertex strictly inside triangle (p, q, s)
        ok = True
        for j in range(n):
            if j in ((i - 1) % n, i, (i + 1) % n):
                continue
            v = r[j]
            d1 = (q[0] - p[0]) * (v[1] - p[1]) - (q[1] - p[1]) * (v[0] - p[0])
            d2 = (s[0] - q[0]) * (v[1] - q[1]) - (s[1] - q[1]) * (v[0] - q[0])
            d3 = (p[0] - s[0]) * (v[1] - s[1]) - (p[1] - s[1]) * (v[0] - s[0])
            if d1 > 0 and d2 > 0 and d3 > 0:
                ok = False
                break
        if ok:
            c = (p + q + s) / 3.0
            return float(c[0]), float(c[1])
    c = r.mean(axis=0)
    return float(c[0]), float(c[1])


def _arrangement_faces(segs: list) -> list[np.ndarray]:
    """Noded segments → positively-oriented face rings of the
    arrangement (every bounded face, regardless of component count)."""
    from ..graph.planar import PlanarGraph

    g = PlanarGraph()
    for a, b in segs:
        g.add_edge(a, b)
    rings = []
    for face in g.trace_faces():
        ring = np.array([e[0] for e in face], dtype=np.float64)
        if len(ring) >= 3 and polygon_signed_area2(ring) > 0:
            rings.append(ring)
    return rings


def polygon_intersection(a: np.ndarray, b: np.ndarray) -> list[np.ndarray]:
    """Intersection of two simple rings → list of disjoint rings."""
    a = _norm_ring(a)
    b = _norm_ring(b)
    if len(a) < 3 or len(b) < 3:
        return []
    segs = []
    for r in (a, b):
        nxt = np.roll(r, -1, axis=0)
        segs.append(np.stack([r, nxt], axis=1))
    noded = node_segments(np.concatenate(segs, axis=0))
    out = []
    for ring in _arrangement_faces(noded):
        x, y = representative_point(ring)
        if winding_number(a, x, y) != 0 and winding_number(b, x, y) != 0:
            out.append(ring)
    return out


def polygon_union(rings: list, return_holes: bool = False):
    """Dissolve a set of simple rings into their union's outer rings.

    Method: node every boundary edge, keep exactly the edges with one
    side inside the union and one side outside (tested at ±δ along the
    edge normal — δ scaled far below any cell width), then face-trace
    the boundary-only graph; positive-area faces whose representative
    point lies inside the union are the dissolved parts. With
    ``return_holes`` the remaining positive-area boundary faces — the
    union's interior holes — come back as a second list
    ``(outers, holes)``; by default only outers are returned (the
    parcel-dissolve use is hole-free: one owner's Voronoi cells are
    edge-adjacent). Role of the reference's ``raster::aggregate``
    per-building cell dissolve
    (`prclz/parcelization/midway_parcelization_digital_globe.R:76-78`).
    """
    rs = [_norm_ring(r) for r in rings]
    rs = [r for r in rs if len(r) >= 3]
    if not rs:
        return ([], []) if return_holes else []
    if len(rs) == 1:
        return ([rs[0]], []) if return_holes else [rs[0]]
    segs = []
    span = 0.0
    for r in rs:
        nxt = np.roll(r, -1, axis=0)
        segs.append(np.stack([r, nxt], axis=1))
        span = max(span, float(np.abs(r).max()))
    noded = node_segments(np.concatenate(segs, axis=0))
    delta = 1e-9 * (1.0 + span)

    def inside(x: float, y: float) -> bool:
        return any(winding_number(r, x, y) != 0 for r in rs)

    boundary = []
    for a, b in noded:
        mx, my = (a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0
        dx, dy = b[0] - a[0], b[1] - a[1]
        L = (dx * dx + dy * dy) ** 0.5
        if L < 1e-30:
            continue
        nx, ny = -dy / L, dx / L
        if inside(mx + delta * nx, my + delta * ny) != inside(mx - delta * nx, my - delta * ny):
            boundary.append((a, b))
    out, holes = [], []
    for face in _arrangement_faces(boundary):
        x, y = representative_point(face)
        if inside(x, y):
            out.append(face)
        else:
            holes.append(face)  # bounded boundary face outside the union
    return (out, holes) if return_holes else out


def inset_polygon(ring: np.ndarray, eps: float) -> list[np.ndarray]:
    """Mitre-join erosion of a simple ring by ``eps`` → 0..k rings.

    Convex rings take the exact half-plane path (`inset_convex`).
    Non-convex: offset every edge inward by eps, join consecutive
    offset lines at their (mitre) intersection, then untangle the
    possibly self-intersecting offset ring through the arrangement —
    keeping faces whose representative point has nonzero winding
    w.r.t. the offset ring AND lies inside the original ring.
    """
    from .core import inset_convex

    r = _norm_ring(ring)
    if len(r) < 3:
        return []
    if is_convex(r):
        out = inset_convex(r, eps)
        return [out] if len(out) >= 3 else []
    n = len(r)
    d = np.roll(r, -1, axis=0) - r
    L = np.hypot(d[:, 0], d[:, 1])
    good = L > 1e-30
    nrm = np.zeros_like(d)
    nrm[good] = np.stack([-d[good, 1], d[good, 0]], axis=1) / L[good, None]
    offs = np.empty_like(r)
    for i in range(n):
        j = (i - 1) % n  # previous edge
        # intersection of offset lines of edges j and i
        a1 = r[j] + nrm[j] * eps
        a2 = r[i] + nrm[i] * eps
        den = d[j, 0] * d[i, 1] - d[j, 1] * d[i, 0]
        if abs(den) < 1e-14 * max(L[j] * L[i], 1e-300):
            offs[i] = r[i] + nrm[i] * eps  # collinear neighbors
        else:
            t = ((a2[0] - a1[0]) * d[i, 1] - (a2[1] - a1[1]) * d[i, 0]) / den
            offs[i] = a1 + t * d[j]
    nxt = np.roll(offs, -1, axis=0)
    noded = node_segments(np.stack([offs, nxt], axis=1))
    out = []
    for face in _arrangement_faces(noded):
        x, y = representative_point(face)
        if winding_number(offs, x, y) >= 1 and winding_number(r, x, y) != 0:
            out.append(face)
    return out
