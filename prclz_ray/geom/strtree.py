"""Packed STR (sort-tile-recursive) bounding-box tree.

The engine's replacement for the reference's ``rtree.index.Index``
usage (`prclz/topology.py:486-492` weak-dual neighbor search,
`reblock/i_topology.py:377-394` candidate-edge search). Built once per
actor in a stateful ``map_batches`` stage (§ SURVEY 2.3 T2), queried
per batch. Pure numpy: bulk-loaded, immutable.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    """Bulk-loaded STR packed R-tree over item bounding boxes.

    ``bboxes``: (N, 4) float64 array of (xmin, ymin, xmax, ymax).
    ``query(bbox)`` returns indices of items whose bbox intersects the
    query bbox. ``query_points(px, py)`` returns (point_idx, item_idx)
    candidate pairs for many points at once.
    """

    def __init__(self, bboxes: np.ndarray, node_capacity: int = 16):
        bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(bboxes)
        self.cap = node_capacity
        if self.n == 0:
            self.levels = []
            self.item_order = np.empty(0, dtype=np.int64)
            self.item_bboxes = bboxes
            return

        # STR packing: sort by center-x, slice into vertical strips,
        # sort each strip by center-y.
        cx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
        cy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
        nleaf = int(np.ceil(self.n / node_capacity))
        nstrips = int(np.ceil(np.sqrt(nleaf)))
        per_strip = nstrips * node_capacity

        order = np.argsort(cx, kind="stable")
        for s in range(0, self.n, per_strip):
            chunk = order[s : s + per_strip]
            order[s : s + per_strip] = chunk[np.argsort(cy[chunk], kind="stable")]

        self.item_order = order
        self.item_bboxes = bboxes[order]

        # build upper levels of merged bboxes
        self.levels = []  # levels[0] = leaves' parents ... levels[-1] = root level
        cur = self.item_bboxes
        while len(cur) > 1:
            pad = (-len(cur)) % node_capacity
            if pad:
                padded = np.vstack([cur, np.tile([np.inf, np.inf, -np.inf, -np.inf], (pad, 1))])
            else:
                padded = cur
            g = padded.reshape(-1, node_capacity, 4)
            merged = np.empty((len(g), 4))
            merged[:, 0] = g[:, :, 0].min(axis=1)
            merged[:, 1] = g[:, :, 1].min(axis=1)
            merged[:, 2] = g[:, :, 2].max(axis=1)
            merged[:, 3] = g[:, :, 3].max(axis=1)
            self.levels.append(merged)
            cur = merged

    def query(self, bbox) -> np.ndarray:
        """Indices (original order) of items whose bbox intersects ``bbox``."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        qxmin, qymin, qxmax, qymax = bbox
        if self.levels:
            cand = np.arange(len(self.levels[-1]), dtype=np.int64)
            for li in range(len(self.levels) - 1, -1, -1):
                b = self.levels[li][cand]
                hit = (b[:, 0] <= qxmax) & (b[:, 2] >= qxmin) & (b[:, 1] <= qymax) & (b[:, 3] >= qymin)
                cand = cand[hit]
                limit = len(self.levels[li - 1]) if li > 0 else self.n
                children = (cand[:, None] * self.cap + np.arange(self.cap)[None, :]).ravel()
                cand = children[children < limit]
        else:
            cand = np.arange(self.n, dtype=np.int64)
        b = self.item_bboxes[cand]
        hit = (b[:, 0] <= qxmax) & (b[:, 2] >= qxmin) & (b[:, 1] <= qymax) & (b[:, 3] >= qymin)
        return self.item_order[cand[hit]]

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Candidate (point_index, item_index) pairs for many points.

        Vectorized level-by-level descent; returns two int64 arrays.
        """
        if self.n == 0 or len(px) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        npts = len(px)
        if not self.levels:
            pi = np.repeat(np.arange(npts, dtype=np.int64), self.n)
            ci = np.tile(np.arange(self.n, dtype=np.int64), npts)
        else:
            root_n = len(self.levels[-1])
            pi = np.repeat(np.arange(npts, dtype=np.int64), root_n)
            ci = np.tile(np.arange(root_n, dtype=np.int64), npts)
            for li in range(len(self.levels) - 1, -1, -1):
                b = self.levels[li][ci]
                hit = (b[:, 0] <= px[pi]) & (b[:, 2] >= px[pi]) & (b[:, 1] <= py[pi]) & (b[:, 3] >= py[pi])
                pi, ci = pi[hit], ci[hit]
                limit = len(self.levels[li - 1]) if li > 0 else self.n
                children = ci[:, None] * self.cap + np.arange(self.cap)[None, :]
                pi = np.repeat(pi, self.cap)
                ci = children.ravel()
                keep = ci < limit
                pi, ci = pi[keep], ci[keep]
        b = self.item_bboxes[ci]
        hit = (b[:, 0] <= px[pi]) & (b[:, 2] >= px[pi]) & (b[:, 1] <= py[pi]) & (b[:, 3] >= py[pi])
        return pi[hit], self.item_order[ci[hit]]
