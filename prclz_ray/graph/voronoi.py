"""Voronoi decomposition by half-plane intersection.

Replaces the reference's ``pytess.voronoi`` call
(`prclz/complexity.py:22-23`) — neither pytess nor scipy is available
here. Each site's cell is the intersection of the half-planes "closer
to me than to site j", clipped against a padded bounding box (callers
clip to the block polygon afterwards, SURVEY.md G10). Exact for
bounded inputs, O(n²·ring) per block — per-block site counts are tens,
so this is faster and far more robust than assembling cells from a
Delaunay dual.

Degenerate inputs (duplicate sites) are deduplicated keeping the first
occurrence, mirroring the reference's ``buffer(0)`` tolerance fixes
(`prclz/complexity.py:28`).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _halfplane_clip(ring: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Clip ``ring`` to the half-plane of points at least as close to
    ``a`` as to ``b`` (boundary = perpendicular bisector)."""
    if len(ring) == 0:
        return ring
    mid = (a + b) * 0.5
    n = a - b  # inward normal: points closer to a satisfy (p - mid)·n >= 0
    s = ring - mid
    side = s @ n
    out: List[np.ndarray] = []
    m = len(ring)
    for i in range(m):
        j = (i + 1) % m
        pi, pj = ring[i], ring[j]
        si, sj = side[i], side[j]
        if si >= 0.0:
            out.append(pi)
            if sj < 0.0:
                t = si / (si - sj)
                out.append(pi + t * (pj - pi))
        elif sj >= 0.0:
            t = si / (si - sj)
            out.append(pi + t * (pj - pi))
    return np.asarray(out, dtype=np.float64) if out else np.empty((0, 2))


def voronoi_cells(points: np.ndarray, pad: float = 1.0) -> List[Tuple[int, np.ndarray]]:
    """Bounded Voronoi cells → list of (site_index, (M, 2) CCW ring).

    Cells are bounded by the padded bbox of the sites; sites whose cell
    degenerates below 3 vertices are omitted (matching ``len(vs) > 2``
    at `prclz/complexity.py:25`). Duplicate sites keep the first index.
    """
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    n = len(pts)
    if n == 0:
        return []

    xmin, ymin = pts.min(axis=0) - pad
    xmax, ymax = pts.max(axis=0) + pad
    bbox = np.array(
        [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]], dtype=np.float64
    )
    if n == 1:
        return [(0, bbox)]

    # exact-duplicate sites: keep the first occurrence
    _, first_idx = np.unique(pts.round(12), axis=0, return_index=True)
    kept = np.sort(first_idx)
    kpts = pts[kept]

    out: List[Tuple[int, np.ndarray]] = []
    for ki, s in enumerate(kpts):
        ring = bbox
        # clip by bisectors against other sites, nearest first so the
        # ring shrinks quickly and far sites clip nothing
        d2 = np.sum((kpts - s) ** 2, axis=1)
        order = np.argsort(d2, kind="stable")
        for kj in order:
            if kj == ki:
                continue
            ring = _halfplane_clip(ring, s, kpts[kj])
            if len(ring) < 3:
                break
        if len(ring) >= 3:
            out.append((int(kept[ki]), ring))
    return out
