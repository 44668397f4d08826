"""Block k-complexity: Voronoi S₀ approximation + weak-dual sequence.

Reference-parity (semantics, not code, from /root/reference):
  - S₀ (`prclz/complexity.py:11-40`): Voronoi decomposition of the
    building centroids, each cell intersected with the block polygon,
    cells with < 3 vertices dropped (`:25` ``len(vs) > 2``), multi-part
    intersections resolved to the part containing the anchor
    (`:35-37`), surviving cell boundaries unioned into a planar graph.
  - sequence (`prclz/complexity.py:52-60` ``get_weak_dual_sequence``,
    the variant the pipelines call): S₀, then repeated ``weak_dual()``
    while the latest graph still has nodes; the trailing empty graph is
    popped.
  - k-complexity (`prclz/complexity.py:62-63`): ``len(sequence) - 1``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..geom.core import clip_polygon_convex, point_in_polygon, polygon_area
from .planar import PlanarGraph
from .voronoi import voronoi_cells

# cells whose clipped ring ends up below this area are numerically-empty
# intersections (the reference relies on shapely returning an empty
# geometry there, which `from_polygons` then ignores)
_MIN_CELL_AREA = 1e-18


def get_s0_approximation(block_ring: np.ndarray, centroids: Sequence[Tuple[float, float]]) -> PlanarGraph:
    """Planar graph of the Voronoi decomposition of ``centroids`` clipped
    to ``block_ring`` (an (N, 2) exterior ring, open or closed).

    Convex blocks (every fixture block) take the exact
    Sutherland–Hodgman path; non-convex blocks use the general
    arrangement boolean (`geom/boolean.py::polygon_intersection`) with
    the reference's multi-part resolution — keep the part containing
    the cell's anchor (`prclz/complexity.py:35-37`).
    """
    from ..geom.boolean import is_convex, polygon_intersection

    block_ring = np.asarray(block_ring, dtype=np.float64)
    pts = np.asarray(list(centroids), dtype=np.float64).reshape(-1, 2)
    if len(pts) == 0:
        return PlanarGraph()

    convex_block = is_convex(block_ring)
    rings: List[np.ndarray] = []
    for site_idx, cell_ring in voronoi_cells(pts):
        ax, ay = pts[site_idx]
        if convex_block:
            parts = [clip_polygon_convex(cell_ring, block_ring)]
        else:
            parts = polygon_intersection(cell_ring, block_ring)
        for clipped in parts:
            if len(clipped) < 3 or polygon_area(clipped) < _MIN_CELL_AREA:
                continue
            # anchor-containment (multi-part resolution): keep the part
            # whose ring contains the anchor, or — clip can leave the
            # anchor exactly ON an edge of its own cell when it sits on
            # the block boundary — within boundary tolerance of it.
            if not point_in_polygon(clipped, ax, ay):
                if not _on_ring_boundary(clipped, ax, ay):
                    continue
            rings.append(clipped)
            break  # at most one part contains the anchor
    return PlanarGraph.from_polygons(rings)


def _on_ring_boundary(ring: np.ndarray, x: float, y: float, eps: float = 1e-9) -> bool:
    """True iff (x, y) is within ``eps`` of some edge of ``ring``."""
    from ..geom.core import point_segments_d2

    segs = np.concatenate([ring, np.roll(ring, -1, axis=0)], axis=1)
    return bool(np.min(point_segments_d2(x, y, segs)) <= eps * eps)


def weak_dual_sequence(s0: PlanarGraph) -> List[PlanarGraph]:
    """S₀, S₁, … Sₖ — iterate ``weak_dual`` while nodes remain, then pop
    the trailing empty graph (`prclz/complexity.py:52-60`)."""
    seq = [s0]
    while seq[-1].number_of_nodes() > 0:
        seq.append(seq[-1].weak_dual())
    seq.pop()
    return seq


def get_complexity(sequence: List[PlanarGraph]) -> int:
    return len(sequence) - 1 if sequence else 0


def block_complexity(block_ring: np.ndarray, centroids: Sequence[Tuple[float, float]]) -> int:
    """k-complexity of one block given its building centroids."""
    s0 = get_s0_approximation(block_ring, centroids)
    return get_complexity(weak_dual_sequence(s0))
