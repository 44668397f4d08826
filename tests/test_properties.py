"""Property-based tests (hypothesis) for the geometry kernel layer —
the engine's answer to the reference's assert-script unit tests
(`prclz/test_topology.py`), generalized over random inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prclz_ray.geom.core import (
    clip_polygon_convex,
    point_in_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
)
from prclz_ray.geom.strtree import STRtree
from prclz_ray.geom.wkb import parse_wkb, wkb_multilinestring, wkb_polygon
from prclz_ray.graph.voronoi import voronoi_cells

coord = st.floats(min_value=-50, max_value=50, allow_nan=False)


@st.composite
def boxes(draw, n_min=1, n_max=40):
    n = draw(st.integers(n_min, n_max))
    out = []
    for _ in range(n):
        x = draw(coord)
        y = draw(coord)
        w = draw(st.floats(0.01, 5))
        h = draw(st.floats(0.01, 5))
        out.append([x, y, x + w, y + h])
    return np.array(out, dtype=np.float64)


@given(boxes(), st.lists(st.tuples(coord, coord), min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_strtree_query_points_matches_bruteforce(bb, pts):
    tree = STRtree(bb)
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    pi, ci = tree.query_points(px, py)
    got = set(zip(pi.tolist(), ci.tolist()))
    want = {
        (i, j)
        for i in range(len(pts))
        for j in range(len(bb))
        if bb[j, 0] <= px[i] <= bb[j, 2] and bb[j, 1] <= py[i] <= bb[j, 3]
    }
    assert got == want


@st.composite
def convex_polys(draw):
    """Random convex polygon: hull of random points around a center."""
    n = draw(st.integers(3, 10))
    angles = np.sort(np.array([draw(st.floats(0, 2 * np.pi)) for _ in range(n)]))
    if len(np.unique(angles)) < 3:
        angles = np.linspace(0, 2 * np.pi, 5)[:-1]
    r = np.array([draw(st.floats(0.5, 5)) for _ in range(len(angles))])
    return np.stack([r * np.cos(angles), r * np.sin(angles)], axis=1)


@given(convex_polys(), st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_vectorized_pip_matches_scalar(poly, pts):
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    vec = points_in_polygon(poly, px, py)
    for i, (x, y) in enumerate(pts):
        assert vec[i] == point_in_polygon(poly, x, y)


@given(convex_polys())
@settings(max_examples=60, deadline=None)
def test_wkb_polygon_roundtrip(poly):
    kind, rings = parse_wkb(wkb_polygon(poly))
    ring = rings[0]
    # ring is closed on write; compare open part
    assert np.allclose(ring[: len(poly)], poly)


@given(st.lists(st.tuples(st.floats(0, 10), st.floats(0, 10)),
                min_size=2, max_size=15, unique=True))
@settings(max_examples=40, deadline=None)
def test_voronoi_cells_contain_their_anchors(sites):
    pts = np.array(sites, dtype=np.float64)
    cells = voronoi_cells(pts)
    for idx, ring in cells:
        if polygon_area(ring) < 1e-9:
            continue
        cx, cy = polygon_centroid(ring)
        # the anchor is the nearest site to any interior point of its cell
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        assert d[idx] <= d.min() + 1e-6


@given(convex_polys(), convex_polys())
@settings(max_examples=60, deadline=None)
def test_convex_clip_area_bounds(a, b):
    clipped = clip_polygon_convex(a, b)
    if len(clipped) >= 3:
        ca = polygon_area(clipped)
        assert ca <= polygon_area(a) + 1e-6
        assert ca <= polygon_area(b) + 1e-6
        assert ca >= -1e-9
