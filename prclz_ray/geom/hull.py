"""Convex hull + minimum rotated rectangle + outside-terminal point.

Implements the G17 geometry of the reference's reblocking
(`reblock/i_reblock.py:285-291`): the dummy "outside building" that
forces the Steiner tree to reach the road network is the
representative point of ``minimum_rotated_rectangle(block) −
convex_hull(block)``. For CONVEX blocks that difference is empty (the
rectangle IS the hull for rectangles, and hull == block otherwise
leaves only sliver triangles); the engine then falls back to the
block's SW boundary corner — a documented, deterministic extension
(the reference would raise on an empty difference).

Pure numpy: Andrew monotone chain hull + rotating-calipers rectangle.
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """CCW convex hull ring (open) of an (N, 2) point set — Andrew's
    monotone chain. Collinear points on the hull are dropped."""
    pts = np.unique(np.asarray(points, dtype=np.float64).reshape(-1, 2), axis=0)
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]
    if len(pts) <= 2:
        return pts

    def half(iterable):
        h: list[np.ndarray] = []
        for p in iterable:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def minimum_rotated_rectangle(ring: np.ndarray) -> np.ndarray:
    """Minimum-area rotated rectangle containing the ring's points
    (rotating calipers over the hull edges) — 4-vertex CCW ring."""
    hull = convex_hull(ring)
    if len(hull) < 3:
        # degenerate: a point or segment — the true minimum rectangle is
        # zero-area ALONG the segment (an axis-aligned bbox of a diagonal
        # segment would have large positive area and fool area-difference
        # callers like outside_terminal into proceeding)
        if len(hull) == 0:
            z = np.zeros(2)
            return np.array([z, z, z, z])
        a, b = hull[0], hull[-1]
        return np.array([a, b, b, a])
    best = None
    n = len(hull)
    for i in range(n):
        d = hull[(i + 1) % n] - hull[i]
        L = np.hypot(d[0], d[1])
        if L < 1e-30:
            continue
        ux, uy = d / L  # edge direction; normal = (-uy, ux)
        xs = hull @ np.array([ux, uy])
        ys = hull @ np.array([-uy, ux])
        area = (xs.max() - xs.min()) * (ys.max() - ys.min())
        if best is None or area < best[0]:
            best = (area, ux, uy, xs.min(), xs.max(), ys.min(), ys.max())
    _, ux, uy, x0, x1, y0, y1 = best
    u = np.array([ux, uy])
    v = np.array([-uy, ux])
    return np.array([x0 * u + y0 * v, x1 * u + y0 * v, x1 * u + y1 * v, x0 * u + y1 * v])


def outside_terminal(ring: np.ndarray) -> tuple[float, float] | None:
    """Representative point of ``min_rotated_rect(ring) − hull(ring)``
    (`reblock/i_reblock.py:285-291`), or None when the difference is
    (numerically) empty — convex blocks — so the caller applies its
    road-corner fallback."""
    from .boolean import _arrangement_faces, representative_point, winding_number
    from .core import polygon_area
    from .noding import node_segments

    ring = np.asarray(ring, dtype=np.float64)
    rect = minimum_rotated_rectangle(ring)
    hull = convex_hull(ring)
    rect_area = polygon_area(rect)
    hull_area = polygon_area(hull)
    if rect_area - hull_area <= 1e-12 * max(rect_area, 1e-300):
        return None
    # difference via the arrangement: faces of rect∪hull boundaries that
    # are inside rect but outside hull; largest face's representative pt
    segs = []
    for r in (rect, hull):
        nxt = np.roll(r, -1, axis=0)
        segs.append(np.stack([r, nxt], axis=1))
    noded = node_segments(np.concatenate(segs, axis=0))
    best = None
    for face in _arrangement_faces(noded):
        x, y = representative_point(face)
        if winding_number(rect, x, y) != 0 and winding_number(hull, x, y) == 0:
            a = polygon_area(face)
            if best is None or a > best[0]:
                best = (a, (x, y))
    return best[1] if best else None
