"""Steiner-tree 2-approximation over a PlanarGraph.

Reference-parity (semantics, not code): `reblock/steiner_tree.py:69-95`
(``coopers_steiner_tree``): Dijkstra shortest paths between every pair
of terminals → minimum spanning tree of that metric closure → union of
the MST edges' underlying paths. Invoked from
`prclz/topology.py:536-552` (``steiner_tree_approx``) with terminals =
nodes flagged ``terminal`` after ``add_node_to_closest_edge``.

Deterministic: Dijkstra breaks ties on (distance, node); Kruskal sorts
closure edges by (distance, u, v).
"""

from __future__ import annotations

import heapq
from itertools import combinations
from typing import Dict, List, Sequence, Tuple

from .planar import Coord, PlanarGraph


def dijkstra(g: PlanarGraph, source: Coord) -> Tuple[Dict[Coord, float], Dict[Coord, Coord]]:
    """Single-source shortest paths → (distance, predecessor) maps."""
    dist: Dict[Coord, float] = {source: 0.0}
    prev: Dict[Coord, Coord] = {}
    heap: List[Tuple[float, Coord]] = [(0.0, source)]
    done = set()
    while heap:
        d, u = heapq.heappop(heap)
        if u in done:
            continue
        done.add(u)
        for v in sorted(g.adj[u]):
            nd = d + g.edge_weight(u, v)
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                prev[v] = u
                heapq.heappush(heap, (nd, v))
    return dist, prev


def _path(prev: Dict[Coord, Coord], source: Coord, target: Coord) -> List[Coord]:
    path = [target]
    while path[-1] != source:
        path.append(prev[path[-1]])
    path.reverse()
    return path


class _DSU:
    def __init__(self):
        self.parent: Dict[Coord, Coord] = {}

    def find(self, x):
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        # path compression to the TRUE root
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.parent[ra] = rb
        return True


def steiner_tree_approx(g: PlanarGraph, terminals: Sequence[Coord]) -> List[Tuple[Coord, Coord]]:
    """Undirected edge list (a <= b per edge) of the 2-approx Steiner tree
    connecting ``terminals`` within ``g``.

    Terminals unreachable from the first terminal raise KeyError — the
    caller is expected to have reduced to the largest connected
    component first (`reblock/i_reblock.py:41-54` semantics, G14).
    """
    terms = sorted(set((float(t[0]), float(t[1])) for t in terminals))
    if len(terms) < 2:
        return []
    # single-source Dijkstra from each terminal (same closure as the
    # reference's per-pair calls, computed once per source)
    sp = {t: dijkstra(g, t) for t in terms}

    closure = []
    for u, v in combinations(terms, 2):
        closure.append((sp[u][0][v], u, v))
    closure.sort()

    dsu = _DSU()
    edges = set()
    for d, u, v in closure:
        if dsu.union(u, v):
            path = _path(sp[u][1], u, v)
            for a, b in zip(path, path[1:]):
                edges.add((a, b) if a <= b else (b, a))
    return sorted(edges)
