"""Geometry-kernel unit tests.

Fixtures ported from the reference's assert-script tests
(`prclz/test_topology.py:4-109`, `reblock/test_i_topology.py:4-56`):
segment predicates over the four canonical edge orientations, projection
probes, and the unit-square closest-edge insertions.
"""

import numpy as np
import pytest

from prclz_ray.geom import (
    STRtree,
    haversine_m,
    point_in_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    clip_polygon_convex,
    point_on_segment,
    project_point_to_segment,
)
from prclz_ray.geom.core import closest_point_on_segment
from prclz_ray.geom.wkb import (
    parse_wkb,
    polygon_exterior,
    wkb_linestring,
    wkb_multipolygon,
    wkb_point,
    wkb_polygon,
    POINT,
    POLYGON,
)


# --- segment predicates (reference test 1-3) -------------------------------

CASES = [
    # edge a, edge b, point, expected on-edge
    ((0, 0), (1, 1), (0.5, 0.5), True),   # y = x
    ((0, 0), (1, 1), (2, 2), False),
    ((0, 0), (1, 0), (0.5, 0.0), True),   # horizontal
    ((0, 0), (1, 0), (1.5, 0.0), False),
    ((0, 1), (1, 0), (0.5, 0.5), True),   # y = -x + 1
    ((0, 1), (1, 0), (2, -1), False),
    ((0, 0), (0, 1), (0.0, 0.5), True),   # vertical
    ((0, 0), (0, 1), (0.0, 1.5), False),
]


@pytest.mark.parametrize("a,b,p,expected", CASES)
def test_point_on_segment(a, b, p, expected):
    assert bool(point_on_segment(a[0], a[1], b[0], b[1], p[0], p[1])) == expected


def test_projection_lands_on_edge():
    # probes onto the edge ((0,1),(1,0)) — reference test 2
    for px, py in [(-0.5, 0.5), (-0.25, 0.25), (0, 0), (0.25, -0.25), (0.5, -0.5)]:
        qx, qy = project_point_to_segment(0, 1, 1, 0, px, py)
        assert qx + qy == pytest.approx(1.0)  # on the line x + y = 1


def test_closest_point_clamps_to_endpoints():
    qx, qy = closest_point_on_segment(0, 0, 1, 0, 2.0, 1.0)
    assert (qx, qy) == (1.0, 0.0)
    qx, qy = closest_point_on_segment(0, 0, 1, 0, 0.5, 1.0)
    assert (qx, qy) == (0.5, 0.0)


# --- polygon kernels --------------------------------------------------------

SQUARE = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)


def test_area_centroid_square():
    assert polygon_area(SQUARE) == pytest.approx(1.0)
    cx, cy = polygon_centroid(SQUARE)
    assert (cx, cy) == pytest.approx((0.5, 0.5))


def test_centroid_degenerate_fallback():
    # |2A| < 0.02 triggers the vertex-mean fallback (topology.py:261-265)
    sliver = np.array([[0, 0], [1, 0], [1, 0.001], [0, 0.001]])
    cx, cy = polygon_centroid(sliver)
    assert (cx, cy) == pytest.approx((0.5, 0.0005))


def test_point_in_polygon():
    assert point_in_polygon(SQUARE, 0.5, 0.5)
    assert not point_in_polygon(SQUARE, 1.5, 0.5)
    inside = points_in_polygon(SQUARE, np.array([0.5, 2.0]), np.array([0.5, 0.5]))
    assert inside.tolist() == [True, False]


def test_clip_convex():
    tri = np.array([[0.5, 0.5], [3, 0.5], [0.5, 3]])
    out = clip_polygon_convex(tri, SQUARE)
    # the triangle covers the [0.5,1]^2 corner of the unit square
    assert polygon_area(out) == pytest.approx(0.25)
    tri2 = np.array([[0.5, 0.5], [1.5, 0.5], [0.5, 1.5]])
    out2 = clip_polygon_convex(tri2, SQUARE)
    assert polygon_area(out2) == pytest.approx(0.5 - 0.125 - 0.125)


def test_haversine_equator_degree():
    # one degree of longitude at the equator ≈ 111.19 km
    assert haversine_m(0, 0, 1, 0) == pytest.approx(111_195, rel=1e-3)


# --- WKB round-trips --------------------------------------------------------

def test_wkb_roundtrip_point():
    t, (x, y) = parse_wkb(wkb_point(1.5, -2.5))
    assert t == POINT and (x, y) == (1.5, -2.5)


def test_wkb_roundtrip_polygon():
    buf = wkb_polygon(SQUARE)
    t, rings = parse_wkb(buf)
    assert t == POLYGON
    assert np.array_equal(rings[0][:4], SQUARE)
    assert np.array_equal(polygon_exterior(buf)[:4], SQUARE)


def test_wkb_multipolygon_exterior():
    buf = wkb_multipolygon([SQUARE, SQUARE + 5])
    assert np.array_equal(polygon_exterior(buf)[:4], SQUARE)


def test_wkb_linestring_roundtrip():
    coords = np.array([[0, 0], [1, 2], [3, 1]], dtype=float)
    t, a = parse_wkb(wkb_linestring(coords))
    assert np.array_equal(a, coords)


# --- STRtree ----------------------------------------------------------------

def test_strtree_query_matches_bruteforce():
    rng = np.random.default_rng(42)
    lo = rng.uniform(0, 100, size=(500, 2))
    sz = rng.uniform(0.1, 3, size=(500, 2))
    bboxes = np.hstack([lo, lo + sz])
    tree = STRtree(bboxes)
    q = (20.0, 20.0, 30.0, 30.0)
    got = set(tree.query(q).tolist())
    brute = {
        i
        for i in range(500)
        if bboxes[i, 0] <= q[2] and bboxes[i, 2] >= q[0] and bboxes[i, 1] <= q[3] and bboxes[i, 3] >= q[1]
    }
    assert got == brute


def test_strtree_query_points_matches_bruteforce():
    rng = np.random.default_rng(7)
    lo = rng.uniform(0, 50, size=(200, 2))
    bboxes = np.hstack([lo, lo + 2.0])
    tree = STRtree(bboxes)
    px = rng.uniform(0, 52, size=300)
    py = rng.uniform(0, 52, size=300)
    pi, ci = tree.query_points(px, py)
    got = set(zip(pi.tolist(), ci.tolist()))
    brute = {
        (p, i)
        for p in range(300)
        for i in range(200)
        if bboxes[i, 0] <= px[p] <= bboxes[i, 2] and bboxes[i, 1] <= py[p] <= bboxes[i, 3]
    }
    assert got == brute


def test_strtree_empty():
    tree = STRtree(np.empty((0, 4)))
    assert tree.query((0, 0, 1, 1)).size == 0


# ---------------------------------------------------------------------------
# general line-arrangement noding (geom/noding.py)

def test_noding_proper_crossing():
    from prclz_ray.geom.noding import node_segments

    segs = np.array([[[0.0, 0.0], [2.0, 2.0]], [[0.0, 2.0], [2.0, 0.0]]])
    edges = node_segments(segs)
    # each diagonal splits at (1,1) -> 4 sub-segments
    assert len(edges) == 4
    nodes = {p for e in edges for p in e}
    assert (1.0, 1.0) in nodes


def test_noding_t_junction():
    from prclz_ray.geom.noding import node_segments

    segs = np.array([[[0.0, 0.0], [4.0, 0.0]], [[2.0, 0.0], [2.0, 3.0]]])
    edges = node_segments(segs)
    # horizontal splits at the T-foot; vertical stays whole
    assert ((0.0, 0.0), (2.0, 0.0)) in edges
    assert ((2.0, 0.0), (4.0, 0.0)) in edges
    assert ((2.0, 0.0), (2.0, 3.0)) in edges
    assert len(edges) == 3


def test_noding_collinear_overlap():
    from prclz_ray.geom.noding import node_segments

    segs = np.array([[[0.0, 0.0], [3.0, 0.0]], [[1.0, 0.0], [5.0, 0.0]]])
    edges = node_segments(segs)
    # overlap [1,3] -> nodes at 0,1,3,5; duplicates of the shared piece
    nodes = sorted({p[0] for e in edges for p in e})
    assert nodes == [0.0, 1.0, 3.0, 5.0]
    assert ((1.0, 0.0), (3.0, 0.0)) in edges


def test_noding_endpoint_touch_and_degenerate():
    from prclz_ray.geom.noding import node_segments

    segs = np.array(
        [[[0.0, 0.0], [1.0, 0.0]], [[1.0, 0.0], [1.0, 1.0]], [[5.0, 5.0], [5.0, 5.0]]]
    )
    edges = node_segments(segs)
    assert ((0.0, 0.0), (1.0, 0.0)) in edges
    assert ((1.0, 0.0), (1.0, 1.0)) in edges
    assert len(edges) == 2  # zero-length segment dropped


def test_blocks_diagonal_smoketest():
    """Reference smoketest shape (`smoketests/smoketest_blocks.py:15-39`):
    bbox of streets -> extract blocks -> assert the block set. One cell
    of the diagonal fixture must yield the four analytic convex faces."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc2

    from prclz_ray.pipelines.derive import diagonal_streets_table, extract_blocks_group

    t = diagonal_streets_table()
    cell = t.filter(pc2.equal(t.column("gadm"), "G1_2"))
    out = extract_blocks_group(cell)
    assert out.num_rows == 4
    ids = sorted(out.column("block_id").to_pylist())
    assert ids == ["B11_25", "B12_21", "B15_28", "B17_23"]
    e = 0.002
    d = e * math.sqrt(2)
    rows = {r["block_id"]: r for r in out.to_pylist()}
    tri_a = rows[[i for i in ids if i.endswith("_21")][0]]
    assert tri_a["xmin_e6"] == 1000000 + round((e + d) * 1e6)
    assert tri_a["ymin_e6"] == 2000000 + round(e * 1e6)
    assert tri_a["xmax_e6"] == 1000000 + round((0.4 - e) * 1e6)
    assert tri_a["ymax_e6"] == 2000000 + round((0.4 - e - d) * 1e6)


# --- round-5 review regressions ----------------------------------------------

def test_min_rotated_rectangle_collinear_is_zero_area():
    from prclz_ray.geom.core import polygon_area
    from prclz_ray.geom.hull import minimum_rotated_rectangle, outside_terminal

    ring = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    rect = minimum_rotated_rectangle(ring)
    assert polygon_area(rect) < 1e-12  # NOT the axis-aligned bbox (area 4)
    # degenerate block -> empty rect-minus-hull difference -> caller fallback
    assert outside_terminal(ring) is None


def test_cell_parent_rejects_finer_parent_res():
    from prclz_ray.geom.cells import cell_id_e6, cell_parent

    cid = cell_id_e6(1_500_000, 2_500_000, 5)
    assert cell_parent(cid, 3) is not None  # coarser: fine
    with pytest.raises(ValueError):
        cell_parent(cid, 7)  # finer "parent" must fail loudly, not return 0,0
