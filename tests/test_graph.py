"""Planar graph / weak dual / Voronoi / complexity / Steiner tests.

Fixtures ported from the reference:
  - unit-square closest-edge insertion (`prclz/test_topology.py:93-109`)
  - 5-node Steiner fixture (`prclz/test_topology.py:112-161`)
  - 10x10 lattice weak-dual shape (`smoketests/smoketest_graph.py:20-41`)
  - complexity loop semantics (`prclz/complexity.py:42-63`)
"""

import math

import numpy as np
import pytest

from prclz_ray.graph import PlanarGraph, block_complexity, voronoi_cells
from prclz_ray.graph.complexity import (
    get_complexity,
    get_s0_approximation,
    weak_dual_sequence,
)
from prclz_ray.graph.steiner import dijkstra, steiner_tree_approx


def lattice(n):
    """(n+1)x(n+1) grid graph over unit cells — n*n inner faces."""
    g = PlanarGraph()
    for i in range(n + 1):
        for j in range(n + 1):
            if i < n:
                g.add_edge((i, j), (i + 1, j))
            if j < n:
                g.add_edge((i, j), (i, j + 1))
    return g


# --- faces / dual -----------------------------------------------------------

def test_unit_square_faces():
    g = lattice(1)
    faces = g.trace_faces()
    assert len(faces) == 2  # inner + outer
    assert len(g.inner_faces()) == 1


def test_single_face_dual_is_one_node():
    g = lattice(1)
    d = g.weak_dual()
    assert d.number_of_nodes() == 1
    assert list(d.adj) == [(0.5, 0.5)]


def test_lattice_dual_is_smaller_lattice():
    # S1 of the n-lattice is the (n-1)-lattice of face centroids
    g = lattice(3)
    assert len(g.inner_faces()) == 9
    d = g.weak_dual()
    assert d.number_of_nodes() == 9
    assert d.number_of_edges() == 12  # 2*3*(3-1)


def test_lattice_weak_dual_sequence_k():
    # lattice(10): S1 = 10x10 centroid grid, then 9x9 → ... → 1 → empty
    g = lattice(10)
    seq = weak_dual_sequence(g)
    assert get_complexity(seq) == 10
    sizes = [s.number_of_nodes() for s in seq]
    assert sizes[1] == 100 and sizes[2] == 81 and sizes[-1] == 1


def test_road_edges_block_dual_adjacency():
    g = lattice(2)
    # mark the shared middle vertical edges as roads: faces across them
    # must not be dual-adjacent (`prclz/topology.py:471-479`)
    for j in range(2):
        key = ((1, j), (1, j + 1))
        g.edge_flags[key]["road"] = True
    d = g.weak_dual()
    assert d.number_of_nodes() == 4
    # without roads the 2x2 dual has 4 edges; the road column removes 2
    assert d.number_of_edges() == 2


# --- closest-edge insertion (reference test 4) ------------------------------

def test_add_node_to_closest_edge_unit_square():
    g = PlanarGraph()
    for a, b in [((0, 0), (1, 0)), ((1, 0), (1, 1)), ((1, 1), (0, 1)), ((0, 1), (0, 0))]:
        g.add_edge(a, b)
    n0 = g.add_node_to_closest_edge((-0.1, -0.1))
    assert n0 == (0.0, 0.0)  # clamps to the corner, no self-edge created
    assert all(a != b for a, b in g.edge_flags)
    n1 = g.add_node_to_closest_edge((0.0, 0.75))
    assert n1 == (0.0, 0.75)
    assert (n1 in g.adj) and len(g.adj[n1]) == 2
    assert g.number_of_edges() == 5  # left side split into two


# --- Steiner (reference test 5) --------------------------------------------

def steiner_fixture():
    g = PlanarGraph()
    p = [(0, 0), (0, 2), (2, 2), (4, 2), (4, 0)]
    for i, j in [(0, 1), (0, 2), (0, 4), (2, 4), (3, 4), (1, 2), (2, 3)]:
        g.add_edge(p[i], p[j])
    terminals = []
    for b in [(2, 0.3), (1, 2), (1.5, 1), (5, 1), (-0.1, -0.1)]:
        terminals.append(g.add_node_to_closest_edge(b, terminal=True))
    return g, terminals


def test_steiner_tree_connects_all_terminals():
    g, terminals = steiner_fixture()
    edges = steiner_tree_approx(g, terminals)
    # the tree must span all terminals within one component
    nodes = set()
    adj = {}
    for a, b in edges:
        nodes |= {a, b}
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(terminals) <= nodes
    # connected check
    stack, seen = [terminals[0]], {terminals[0]}
    while stack:
        u = stack.pop()
        for v in adj.get(u, ()):
            if v not in seen:
                seen.add(v)
                stack.append(v)
    assert set(nodes) <= seen
    # 2-approx sanity: total weight within 2x of closure MST lower bound
    total = sum(math.hypot(a[0] - b[0], a[1] - b[1]) for a, b in edges)
    assert total < 20


def test_steiner_deterministic():
    e1 = steiner_tree_approx(*steiner_fixture())
    e2 = steiner_tree_approx(*steiner_fixture())
    assert e1 == e2


def test_dijkstra_simple():
    g = PlanarGraph()
    g.add_edge((0, 0), (1, 0))
    g.add_edge((1, 0), (1, 1))
    g.add_edge((0, 0), (1, 1))  # diagonal shortcut sqrt(2) < 2
    dist, _ = dijkstra(g, (0.0, 0.0))
    assert dist[(1.0, 1.0)] == pytest.approx(math.sqrt(2))


def test_largest_component_and_contract():
    g = PlanarGraph()
    g.add_edge((0, 0), (1, 0))
    g.add_edge((1, 0), (2, 0))
    g.add_edge((10, 10), (11, 10))  # smaller component
    g.terminal = {(0.0, 0.0), (2.0, 0.0)}
    big = g.largest_component()
    assert big.number_of_nodes() == 3
    simp = big.contract_degree2()
    assert simp.number_of_nodes() == 2
    assert simp.edge_weight((0.0, 0.0), (2.0, 0.0)) == pytest.approx(2.0)


# --- Voronoi / complexity ---------------------------------------------------

def test_voronoi_two_sites_split_plane():
    cells = voronoi_cells(np.array([[0.0, 0.0], [2.0, 0.0]]))
    assert len(cells) == 2
    ids = sorted(i for i, _ in cells)
    assert ids == [0, 1]


def test_voronoi_grid_sites_cover_square():
    pts = np.array([[x, y] for x in (0.25, 0.75) for y in (0.25, 0.75)])
    cells = dict(voronoi_cells(pts))
    assert len(cells) == 4


def test_block_complexity_single_building():
    # one building → one Voronoi cell covering the block → S0 is one face
    # → dual one node → dual empty: k = 1
    block = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert block_complexity(block, [(0.5, 0.5)]) == 1


def test_block_complexity_grid_buildings_increases():
    block = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    centers = [(x, y) for x in (0.17, 0.5, 0.83) for y in (0.17, 0.5, 0.83)]
    k = block_complexity(block, centers)
    assert k >= 2


def test_complexity_empty_block():
    block = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert block_complexity(block, []) == 0


def test_s0_skips_degenerate_cells():
    block = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    # collinear sites exercise the perturbation path
    s0 = get_s0_approximation(block, [(0.2, 0.5), (0.5, 0.5), (0.8, 0.5)])
    assert s0.number_of_nodes() > 0


# ---------------------------------------------------------------------------
# non-convex blocks (geom/boolean.py: arrangement-based clip + inset)

L_RING = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3]], float)


def test_voronoi_cells_partition_nonconvex_block():
    """Property: Voronoi cells clipped to an L-shaped block still
    partition its area (the convex-only caveat is gone)."""
    from prclz_ray.geom.boolean import polygon_intersection
    from prclz_ray.geom.core import polygon_area

    pts = np.array(
        [(0.5, 0.5), (1.5, 0.5), (2.5, 0.5), (0.5, 1.5), (0.5, 2.5),
         (0.75, 0.75), (0.25, 0.25), (2.0, 0.6), (0.6, 2.0)]
    )
    total = 0.0
    for _, cell in voronoi_cells(pts):
        for part in polygon_intersection(cell, L_RING):
            total += polygon_area(part)
    assert abs(total - polygon_area(L_RING)) < 1e-9


def test_polygon_intersection_multipart():
    """A band crossing the L notch: clean parts, exact area, no
    Sutherland-Hodgman bridge artifacts."""
    from prclz_ray.geom.boolean import polygon_intersection
    from prclz_ray.geom.core import polygon_area

    band = np.array([[0.5, 0.5], [2.5, 0.5], [2.5, 2.5], [0.5, 2.5]], float)
    parts = polygon_intersection(L_RING, band)
    assert abs(sum(polygon_area(p) for p in parts) - 1.75) < 1e-9


def test_inset_nonconvex_mitre():
    """Mitre erosion of the L: exact analytic area; a U whose bar is
    thinner than 2*eps splits into two parts."""
    from prclz_ray.geom.boolean import inset_polygon
    from prclz_ray.geom.core import polygon_area

    parts = inset_polygon(L_RING, 0.2)
    assert abs(sum(polygon_area(p) for p in parts) - 2.76) < 1e-9
    u = np.array(
        [[0, 0], [3, 0], [3, 2], [2.2, 2], [2.2, 0.4], [0.8, 0.4], [0.8, 2], [0, 2]],
        float,
    )
    parts = inset_polygon(u, 0.25)
    areas = sorted(round(polygon_area(p), 6) for p in parts)
    assert areas == [0.45, 0.45]


def test_block_complexity_nonconvex_golden():
    """k-complexity goldens on a non-convex block (the sgp smoketest
    shape, `smoketests/smoketest_sgp.py:36-129`: real block polygon ->
    S0 -> weak-dual depth)."""
    arms = [(0.5, 0.5), (1.5, 0.5), (2.5, 0.5), (0.5, 1.5), (0.5, 2.5)]
    assert block_complexity(L_RING, arms) == 1
    nested = arms + [(0.75, 0.75), (0.25, 0.25), (2.0, 0.6), (0.6, 2.0)]
    assert block_complexity(L_RING, nested) == 2
    assert block_complexity(L_RING, [(0.5, 0.5)]) == 1
    assert block_complexity(L_RING, []) == 0


# --- round-5 review regressions ----------------------------------------------

def test_inner_faces_disconnected_components():
    # two disjoint unit squares: each component's unbounded face must be
    # dropped, leaving exactly the two bounded faces (the single-outer
    # most-edges heuristic kept component 2's unbounded face as a phantom)
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    g = PlanarGraph.from_polygons([sq, sq + 10.0])
    inner = g.inner_faces()
    assert len(inner) == 2
    # two isolated cells share no edge -> empty dual -> k = 0 (the phantom
    # unbounded face used to link into component 2's cell, inflating k to 1)
    assert get_complexity(weak_dual_sequence(g)) == 0


def test_inner_faces_tree_component_dropped():
    # a dangling-edge component has only its unbounded face: inner_faces
    # must not report it
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    g = PlanarGraph.from_polygons([sq])
    g.add_edge((5.0, 5.0), (6.0, 6.0))
    assert len(g.inner_faces()) == 1
