"""Planar graph with rotation-system face tracing and weak duals.

Reference-parity notes (semantics, not code, from /root/reference):
  - nodes are deduplicated by exact coordinate tuple
    (`prclz/topology.py:297-306`); here coordinates are quantized to
    1e-9 degrees first so numerically-identical vertices produced by
    independent clipping paths compare equal.
  - the rotation embedding sorts each node's neighbors by
    ``atan2(dx, dy)`` — note the reference's argument order
    (`prclz/topology.py:409-417`).
  - face tracing is the SAGE algorithm (`prclz/topology.py:419-447`);
    the outer face is the one with the most edges and is dropped
    (`prclz/topology.py:449-456`).
  - the weak dual connects two inner faces iff they share at least one
    non-road edge (`prclz/topology.py:471-479`; the reference's second
    "touches along a non-Point intersection" clause is unsatisfiable
    for 1-D shapely geometries with intersecting interiors, so shared
    full edges are the effective condition).
  - a single-face graph's dual is one isolated node at the face
    centroid (`prclz/topology.py:468-469`); a graph with < 2 nodes has
    an empty dual (`prclz/topology.py:463-464`).
  - face centroids use the shoelace formula with the |2A| < 0.02
    vertex-mean fallback (`prclz/topology.py:247-271`).
"""

from __future__ import annotations

import math
from itertools import chain
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..geom.core import polygon_centroid

Coord = Tuple[float, float]

QUANT = 9  # decimal digits of coordinate quantization


def _q(x: float) -> float:
    return round(float(x), QUANT)


class PlanarGraph:
    """Undirected planar graph over coordinate-tuple nodes.

    ``adj[node]`` is the set of neighbors; ``edge_flags[(a, b)]`` (with
    a <= b) carries the road/barrier flags used by weak-dual filtering
    and reblocking weights. ``terminal`` marks Steiner targets.
    """

    def __init__(self, dual_order: int = 0):
        self.adj: Dict[Coord, set] = {}
        self.edge_flags: Dict[Tuple[Coord, Coord], dict] = {}
        self.terminal: set = set()
        self.dual_order = dual_order

    # -- construction -------------------------------------------------------
    def add_node(self, p: Coord) -> Coord:
        p = (_q(p[0]), _q(p[1]))
        if p not in self.adj:
            self.adj[p] = set()
        return p

    def add_edge(self, a: Coord, b: Coord, road: bool = False, weight: float | None = None):
        a, b = self.add_node(a), self.add_node(b)
        if a == b:
            return
        self.adj[a].add(b)
        self.adj[b].add(a)
        key = (a, b) if a <= b else (b, a)
        flags = self.edge_flags.setdefault(key, {"road": False, "weight": None})
        flags["road"] = flags["road"] or road
        if weight is not None:
            flags["weight"] = weight

    @staticmethod
    def from_polygons(polygons: Sequence[np.ndarray], dual_order: int = 0) -> "PlanarGraph":
        """Union of polygon boundaries (open or closed exterior rings)."""
        g = PlanarGraph(dual_order=dual_order)
        for ring in polygons:
            ring = np.asarray(ring, dtype=np.float64)
            if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
                ring = ring[:-1]
            n = len(ring)
            for i in range(n):
                g.add_edge(tuple(ring[i]), tuple(ring[(i + 1) % n]))
        return g

    @staticmethod
    def from_lines(lines: Sequence[np.ndarray], road: bool = False) -> "PlanarGraph":
        g = PlanarGraph()
        for coords in lines:
            coords = np.asarray(coords, dtype=np.float64)
            for i in range(len(coords) - 1):
                g.add_edge(tuple(coords[i]), tuple(coords[i + 1]), road=road)
        return g

    # -- basic accessors -----------------------------------------------------
    def number_of_nodes(self) -> int:
        return len(self.adj)

    def number_of_edges(self) -> int:
        return len(self.edge_flags)

    def edges(self):
        return list(self.edge_flags.keys())

    def edge_weight(self, a: Coord, b: Coord) -> float:
        key = (a, b) if a <= b else (b, a)
        w = self.edge_flags[key].get("weight")
        return w if w is not None else math.hypot(a[0] - b[0], a[1] - b[1])

    def is_road(self, a: Coord, b: Coord) -> bool:
        key = (a, b) if a <= b else (b, a)
        return self.edge_flags[key]["road"]

    # -- rotation system and face tracing ------------------------------------
    def get_embedding(self) -> Dict[Coord, List[Coord]]:
        return {
            node: sorted(
                nbrs,
                key=lambda nb, node=node: math.atan2(nb[0] - node[0], nb[1] - node[1]),
            )
            for node, nbrs in self.adj.items()
        }

    def trace_faces(self) -> List[List[Tuple[Coord, Coord]]]:
        """All faces (as directed-edge cycles), INCLUDING the outer face.

        Deterministic: the directed edge set is consumed in sorted order.
        """
        if self.number_of_nodes() < 2 or self.number_of_edges() == 0:
            return []  # isolated nodes have no faces
        embedding = self.get_embedding()
        directed = set()
        for a, b in self.edge_flags:
            directed.add((a, b))
            directed.add((b, a))
        remaining = sorted(directed)
        in_remaining = set(remaining)
        faces = []
        it = iter(remaining)

        def pop_next():
            for e in it:
                if e in in_remaining:
                    return e
            return None

        start = pop_next()
        face = [start]
        in_remaining.discard(start)
        while True:
            prev_a, prev_b = face[-1]
            nbrs = embedding[prev_b]
            nxt = nbrs[(nbrs.index(prev_a) + 1) % len(nbrs)]
            cand = (prev_b, nxt)
            if cand == face[0]:
                faces.append(face)
                start = pop_next()
                if start is None:
                    break
                face = [start]
                in_remaining.discard(start)
            else:
                face.append(cand)
                in_remaining.discard(cand)
        return faces

    def inner_faces(self) -> List[List[Tuple[Coord, Coord]]]:
        """Faces minus each connected component's unbounded face.

        The rotation-system trace emits bounded faces CCW (positive
        shoelace) and a component's unbounded face CW with area equal
        to minus the sum of its bounded faces, so the minimum signed
        area per component identifies the outer face exactly (the
        reference's most-edges heuristic, `prclz/topology.py:449-456`,
        assumes one component and would keep extra components'
        unbounded faces as phantom inner faces). Ties — all-degenerate
        tree components — break toward most edges.
        """
        faces = self.trace_faces()
        if not faces:
            return []
        comp: Dict[Coord, int] = {}
        cid = 0
        for start in self.adj:
            if start in comp:
                continue
            comp[start] = cid
            stack = [start]
            while stack:
                u = stack.pop()
                for v in self.adj[u]:
                    if v not in comp:
                        comp[v] = cid
                        stack.append(v)
            cid += 1
        outer_idx: Dict[int, int] = {}
        outer_key: Dict[int, Tuple[float, int]] = {}
        for i, f in enumerate(faces):
            ring = np.array([e[0] for e in f], dtype=np.float64)
            x, y = ring[:, 0], ring[:, 1]
            a2 = float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            c = comp[f[0][0]]
            key = (a2, -len(f))
            if c not in outer_key or key < outer_key[c]:
                outer_idx[c], outer_key[c] = i, key
        drop = set(outer_idx.values())
        return [f for i, f in enumerate(faces) if i not in drop]

    @staticmethod
    def face_centroid(face: List[Tuple[Coord, Coord]]) -> Coord:
        ring = np.array([e[0] for e in face], dtype=np.float64)
        return polygon_centroid(ring)

    # -- weak dual ------------------------------------------------------------
    def weak_dual(self) -> "PlanarGraph":
        dual = PlanarGraph(dual_order=self.dual_order + 1)
        if self.number_of_nodes() < 2:
            return dual
        faces = self.inner_faces()
        if len(faces) == 1:
            dual.add_node(self.face_centroid(faces[0]))
            return dual
        # index faces by their undirected non-road edges
        edge_to_faces: Dict[Tuple[Coord, Coord], List[int]] = {}
        for fi, face in enumerate(faces):
            for a, b in face:
                key = (a, b) if a <= b else (b, a)
                if not self.edge_flags[key]["road"]:
                    edge_to_faces.setdefault(key, []).append(fi)
        centroids = [self.face_centroid(f) for f in faces]
        linked = set()
        for key, fis in edge_to_faces.items():
            fis = sorted(set(fis))
            for i in range(len(fis)):
                for j in range(i + 1, len(fis)):
                    pair = (fis[i], fis[j])
                    if pair not in linked:
                        linked.add(pair)
                        dual.add_edge(centroids[pair[0]], centroids[pair[1]])
        # isolated inner faces (no shared non-road edge) contribute nothing
        # beyond their node only in the single-face case, matching the
        # reference's add_edge-only loop (`prclz/topology.py:471-479`).
        return dual

    # -- edge surgery (reblock support) --------------------------------------
    def remove_edge(self, a: Coord, b: Coord):
        key = (a, b) if a <= b else (b, a)
        self.edge_flags.pop(key, None)
        self.adj[a].discard(b)
        self.adj[b].discard(a)

    def split_edge(self, a: Coord, b: Coord, p: Coord):
        """Replace edge (a, b) with (a, p) + (p, b), inheriting flags.

        Semantics of `prclz/topology.py:388-406` (split_edge_by_node):
        no-op halves when p coincides with an endpoint.
        """
        key = (a, b) if a <= b else (b, a)
        flags = self.edge_flags.get(key, {"road": False, "weight": None})
        p = (_q(p[0]), _q(p[1]))
        if p == a or p == b:
            self.add_node(p)
            return
        self.remove_edge(a, b)
        w = flags.get("weight")
        if w is None:
            wa = wb = None
        else:
            # explicit weight splits in proportion to length so total
            # path cost through p equals the original edge cost (keeps
            # G16 road weights ≈ 0 on both halves)
            total = math.hypot(b[0] - a[0], b[1] - a[1])
            fa = math.hypot(p[0] - a[0], p[1] - a[1]) / total if total > 0 else 0.5
            wa, wb = w * fa, w * (1.0 - fa)
        self.add_edge(a, p, road=flags["road"], weight=wa)
        self.add_edge(p, b, road=flags["road"], weight=wb)

    def add_node_to_closest_edge(self, p: Coord, terminal: bool = False) -> Coord:
        """Insert the closest point on the closest edge to ``p`` and split
        that edge (`prclz/topology.py:504-534`). Returns the inserted node.
        """
        from ..geom.core import closest_point_on_segment

        best = None  # (dist, edge_key, (qx, qy))
        for (a, b) in sorted(self.edge_flags):
            qx, qy = closest_point_on_segment(a[0], a[1], b[0], b[1], p[0], p[1])
            d = math.hypot(p[0] - qx, p[1] - qy)
            if best is None or d < best[0]:
                best = (d, (a, b), (float(qx), float(qy)))
        if best is None:
            node = self.add_node(p)
        else:
            _, (a, b), q = best
            node = (_q(q[0]), _q(q[1]))
            self.split_edge(a, b, node)
            node = self.add_node(node)
        if terminal:
            self.terminal.add(node)
        return node

    # -- component / simplification kernels ----------------------------------
    def largest_component(self) -> "PlanarGraph":
        """Subgraph induced by the largest connected component
        (`reblock/i_reblock.py:41-54` semantics, G14). Ties broken by the
        smallest contained node for determinism."""
        seen = set()
        comps = []
        for start in sorted(self.adj):
            if start in seen:
                continue
            comp = {start}
            stack = [start]
            while stack:
                u = stack.pop()
                for v in self.adj[u]:
                    if v not in comp:
                        comp.add(v)
                        stack.append(v)
            seen |= comp
            comps.append(comp)
        if not comps:
            return PlanarGraph()
        comps.sort(key=lambda c: (-len(c), min(c)))
        keep = comps[0]
        g = PlanarGraph(dual_order=self.dual_order)
        for node in keep:
            g.add_node(node)
        for (a, b), flags in self.edge_flags.items():
            if a in keep and b in keep:
                g.add_edge(a, b, road=flags["road"], weight=flags["weight"])
        g.terminal = {t for t in self.terminal if t in keep}
        return g

    def contract_degree2(self) -> "PlanarGraph":
        """Contract non-terminal degree-2 nodes, summing edge weights
        along the contracted path (`reblock/i_topology.py:506-556`
        ``simplify`` semantics, G15)."""
        g = self.copy()
        changed = True
        while changed:
            changed = False
            for node in sorted(g.adj):
                if node in g.terminal or len(g.adj[node]) != 2:
                    continue
                u, v = sorted(g.adj[node])
                w = g.edge_weight(u, node) + g.edge_weight(node, v)
                road = g.is_road(u, node) and g.is_road(node, v)
                if v in g.adj[u]:
                    # parallel edge: keep the CHEAPER alternative's
                    # (weight, road) pair together — mixing the min
                    # weight with the other edge's flag would let the
                    # new-line filter misclassify steiner edges
                    ew = g.edge_weight(u, v)
                    if ew <= w:
                        w, road = ew, g.is_road(u, v)
                    g.remove_edge(u, v)  # re-added below with the chosen pair
                g.remove_edge(u, node)
                g.remove_edge(node, v)
                del g.adj[node]
                g.add_edge(u, v, road=road, weight=w)
                changed = True
                break
        return g

    def copy(self) -> "PlanarGraph":
        g = PlanarGraph(dual_order=self.dual_order)
        g.adj = {k: set(v) for k, v in self.adj.items()}
        g.edge_flags = {k: dict(v) for k, v in self.edge_flags.items()}
        g.terminal = set(self.terminal)
        return g
