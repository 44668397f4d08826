"""Spatial-join stages: point-in-polygon (flagship J1) and kNN anchor
assignment (J8) as stateful actor-pool ``map_batches`` classes.

Broadcast pattern: the polygon/anchor side table is small relative to
the page stream (10⁴–10⁶ polygons vs 10¹² pages), so it is ``ray.put``
once on the driver and each actor builds its index ONCE in
``__init__`` from the ObjectRef — never re-shipped per batch
(SURVEY.md §2.3 T2; reference analogue: the per-task rtree at
`prclz/topology.py:483-502`).

Distances for kNN are exact integer squared microdegrees (planar), so
Ray and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..geom.strtree import STRtree
from ..geom.wkb import parse_wkb


# ---------------------------------------------------------------------------
# broadcast side-table builders (driver side)

def put_blocks_side(blocks: pa.Table) -> "ray.ObjectRef":
    """Blocks table → object-store broadcast handle for PIPJoinActor.

    Ships plain numpy arrays (bboxes in µdeg, ring coords, ids) — no
    python geometry objects cross task boundaries.
    """
    ids = np.asarray(blocks.column("block_id").to_pylist())
    gadm = np.asarray(blocks.column("gadm").to_pylist())
    wkbs = blocks.column("geom_wkb").to_pylist()
    rings = [parse_wkb(w)[1][0] for w in wkbs]
    bboxes = np.array(
        [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in rings]
    )
    # rings are ragged: pack into one coord array + offsets
    lens = np.array([len(r) for r in rings])
    offsets = np.concatenate([[0], np.cumsum(lens)])
    coords = np.concatenate(rings, axis=0) if rings else np.empty((0, 2))
    return ray.put({"ids": ids, "gadm": gadm, "bboxes": bboxes, "coords": coords, "offsets": offsets})


def put_anchors_side(parcels: pa.Table) -> "ray.ObjectRef":
    """Parcels table → broadcast handle for KNNAnchorActor."""
    ids = np.asarray(parcels.column("parcel_id").to_pylist())
    ax = parcels.column("anchor_lon_e6").to_numpy().astype(np.int64)
    ay = parcels.column("anchor_lat_e6").to_numpy().astype(np.int64)
    return ray.put({"ids": ids, "ax": ax, "ay": ay})


# ---------------------------------------------------------------------------
# PIP join actor

class PIPJoinActor:
    """Stateful PIP joiner: STRtree over the broadcast block polygons,
    built once per actor; exact ray-crossing test per candidate.

    Use: ``ds.map_batches(PIPJoinActor, fn_constructor_args=(ref,),
    concurrency=N, batch_size=B, batch_format="pyarrow")``.
    """

    def __init__(self, blocks_ref):
        side = ray.get(blocks_ref)
        self.ids = side["ids"]
        self.gadm = side["gadm"]
        self.coords = side["coords"]
        self.offsets = side["offsets"]
        self.tree = STRtree(side["bboxes"])

    def _match(self, lon_deg: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
        """Index of containing polygon per point (-1 = no match)."""
        res = np.full(len(lon_deg), -1, dtype=np.int64)
        pi, ci = self.tree.query_points(lon_deg, lat_deg)
        if len(pi) == 0:
            return res
        # exact test grouped by candidate polygon (vectorized per ring)
        order = np.argsort(ci, kind="stable")
        pi, ci = pi[order], ci[order]
        starts = np.flatnonzero(np.concatenate([[True], ci[1:] != ci[:-1]]))
        bounds = np.concatenate([starts, [len(ci)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            poly = ci[s]
            ring = self.coords[self.offsets[poly] : self.offsets[poly + 1]]
            pts = pi[s:e]
            inside = _points_in_ring(ring, lon_deg[pts], lat_deg[pts])
            res[pts[inside]] = poly
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False)
        has = batch.column("has_geo").to_numpy(zero_copy_only=False)
        idx = np.full(len(lat), -1, dtype=np.int64)
        sel = np.flatnonzero(has)
        if len(sel):
            idx[sel] = self._match(lon[sel] / 1e6, lat[sel] / 1e6)
        matched = idx >= 0
        block_id = np.where(matched, self.ids[np.clip(idx, 0, None)], None)
        gadm = np.where(matched, self.gadm[np.clip(idx, 0, None)], None)
        out = dict(zip(batch.column_names, batch.columns))
        out["block_id"] = pa.array(block_id.tolist(), pa.string())
        out["gadm"] = pa.array(gadm.tolist(), pa.string())
        return pa.table(out)


def _points_in_ring(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Ray-crossing test, many points vs one ring (open)."""
    x0, y0 = ring[:, 0], ring[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    pxc = px[:, None]
    pyc = py[:, None]
    cond = (y0 > pyc) != (y1 > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xints = x0 + (pyc - y0) * (x1 - x0) / (y1 - y0)
    crossings = np.sum(cond & (pxc < xints), axis=1)
    return (crossings % 2).astype(bool)


# ---------------------------------------------------------------------------
# kNN anchor actor

class KNNAnchorActor:
    """k-nearest parcel anchors by exact integer squared-µdeg distance.

    Grid-bucket index (0.1° buckets = the block pitch) built once per
    actor; per batch, points are grouped by bucket and each group's
    candidates come from the 3×3 neighborhood, expanding outward ring
    by ring until k anchors are found (ring-expansion kNN,
    SURVEY.md J8). k=1 output columns: parcel_id, dist2 (int64).
    """

    BUCKET_E6 = 100_000

    def __init__(self, anchors_ref, k: int = 1):
        side = ray.get(anchors_ref)
        self.ids = side["ids"]
        self.ax = side["ax"]
        self.ay = side["ay"]
        self.k = k
        bx = self.ax // self.BUCKET_E6
        by = self.ay // self.BUCKET_E6
        self.buckets: dict = {}
        for i in range(len(bx)):
            self.buckets.setdefault((int(bx[i]), int(by[i])), []).append(i)
        self.buckets = {k_: np.asarray(v, dtype=np.int64) for k_, v in self.buckets.items()}

    def _candidates(self, bx: int, by: int, need: int) -> np.ndarray:
        """Anchors from expanding Chebyshev rings around (bx, by).

        Stops one ring AFTER k candidates are first found so a nearer
        anchor just across the ring boundary cannot be missed."""
        got: list = []
        count = 0
        found_ring = None
        r = 0
        while r <= 256:
            if found_ring is not None and r > found_ring:
                break
            if r == 0:
                cells = [(bx, by)]
            else:
                cells = [(cx, by - r) for cx in range(bx - r, bx + r + 1)]
                cells += [(cx, by + r) for cx in range(bx - r, bx + r + 1)]
                cells += [(bx - r, cy) for cy in range(by - r + 1, by + r)]
                cells += [(bx + r, cy) for cy in range(by - r + 1, by + r)]
            for c in cells:
                b = self.buckets.get(c)
                if b is not None:
                    got.append(b)
                    count += len(b)
            if count >= need and found_ring is None:
                found_ring = r + 1  # take one safety ring beyond
            r += 1
        return np.concatenate(got) if got else np.empty(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        has = batch.column("has_geo").to_numpy(zero_copy_only=False)
        n = len(lat)
        best_id = np.full(n, None, dtype=object)
        best_d2 = np.full(n, -1, dtype=np.int64)

        bx = lon // self.BUCKET_E6
        by = lat // self.BUCKET_E6
        keys = bx * 100_000 + by
        keys[~has] = -1
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        starts = np.flatnonzero(np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]]))
        bounds = np.concatenate([starts, [n]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if sorted_keys[s] < 0:
                continue
            pts = order[s:e]
            cand = self._candidates(int(bx[pts[0]]), int(by[pts[0]]), self.k)
            if len(cand) == 0:
                continue
            dx = lon[pts][:, None] - self.ax[cand][None, :]
            dy = lat[pts][:, None] - self.ay[cand][None, :]
            d2 = dx * dx + dy * dy
            # ties broken by parcel id order within candidate list: the
            # candidate arrays are in stable anchor order, argmin takes
            # the first minimum
            j = np.argmin(d2, axis=1)
            best_id[pts] = self.ids[cand[j]]
            best_d2[pts] = d2[np.arange(len(pts)), j]

        out = dict(zip(batch.column_names, batch.columns))
        out["parcel_id"] = pa.array(best_id.tolist(), pa.string())
        out["dist2"] = pa.array(best_d2)
        return pa.table(out)
