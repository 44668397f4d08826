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

import numpy as np
import pyarrow as pa

import ray

from ..geom.strtree import STRtree
from ..geom.wkb import parse_wkb


# ---------------------------------------------------------------------------
# broadcast side-table builders (driver side)

def _all_rings(wkb: bytes) -> list[np.ndarray]:
    """Every ring of a (Multi)Polygon WKB — exterior(s) AND holes.

    Even-odd crossing counted over ALL rings of a block is exact for
    holes (a point in a hole crosses outer+hole = even) and for
    MultiPolygon parts (disjoint parts contribute even counts unless the
    point is inside one). Reference blocks are arbitrary (Multi)Polygons
    (`prclz/blocks/methods.py:38-40`)."""
    gtype, payload = parse_wkb(wkb)
    if gtype == 3:  # Polygon: [exterior, hole, ...]
        return list(payload)
    if gtype == 6:  # MultiPolygon: [[exterior, hole, ...], ...]
        return [r for part in payload for r in part]
    raise ValueError(f"block geometry must be (Multi)Polygon, got WKB type {gtype}")


def put_blocks_side(blocks: pa.Table) -> "ray.ObjectRef":
    """Blocks table → object-store broadcast handle for PIPJoinActor.

    Ships plain numpy arrays (bboxes in µdeg, ring coords, ids) — no
    python geometry objects cross task boundaries. ALL rings of each
    block are packed (holes + MultiPolygon parts), contiguously per
    block: ``offsets`` indexes blocks into ``coords``, ``ring_offsets``
    indexes rings (the per-ring segment wrap points).
    """
    ids = np.asarray(blocks.column("block_id").to_pylist())
    gadm = np.asarray(blocks.column("gadm").to_pylist())
    wkbs = blocks.column("geom_wkb").to_pylist()
    ring_lists = [_all_rings(w) for w in wkbs]
    rings = [r for rl in ring_lists for r in rl]
    poly_len = np.array([sum(len(r) for r in rl) for rl in ring_lists], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(poly_len)])
    ring_len = np.array([len(r) for r in rings], dtype=np.int64)
    ring_offsets = np.concatenate([[0], np.cumsum(ring_len)])
    coords = np.concatenate(rings, axis=0) if rings else np.empty((0, 2))
    # per-polygon bboxes via ONE reduceat pair over the packed coords
    # (a per-polygon Python min/max loop costs tens of seconds per
    # side-table build at the 10^6-polygon regime this path serves)
    if len(ids) and poly_len.min() > 0:
        mins = np.minimum.reduceat(coords, offsets[:-1], axis=0)
        maxs = np.maximum.reduceat(coords, offsets[:-1], axis=0)
        bboxes = np.concatenate([mins, maxs], axis=1)
    else:
        bboxes = np.empty((len(ids), 4))
        for i in range(len(ids)):
            c = coords[offsets[i] : offsets[i + 1]]
            bboxes[i] = [c[:, 0].min(), c[:, 1].min(), c[:, 0].max(), c[:, 1].max()]
    return ray.put(
        {
            "ids": ids,
            "gadm": gadm,
            "bboxes": bboxes,
            "coords": coords,
            "offsets": offsets,
            "ring_offsets": ring_offsets,
        }
    )


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

    MAX_GRID_CELLS = 1 << 24  # dense-grid ceiling: counts + starts are
    # O(cells) int64 per worker (~128 MB each here); past it the grid
    # flips off and the packed tree serves candidates instead

    def __init__(self, blocks_ref):
        side = ray.get(blocks_ref)
        self.ids = side["ids"]
        self.gadm = side["gadm"]
        self._ids_arrow = pa.array(self.ids, pa.string())
        self._gadm_arrow = pa.array(self.gadm, pa.string())
        self.coords = side["coords"]
        self.offsets = side["offsets"]
        bboxes = np.asarray(side["bboxes"], dtype=np.float64).reshape(-1, 4)
        self._bboxes = bboxes
        self.tree = STRtree(bboxes)  # general-path fallback (degenerate pitches)
        # next-vertex array aligned with coords (wraps within each RING
        # — a polygon may pack several rings: holes / multi-parts) so
        # the exact test expands (point, polygon) pairs to segments
        # with zero per-polygon Python work; crossing counts sum over
        # every ring of the polygon (even-odd incl. holes)
        ring_offsets = side.get("ring_offsets")
        if ring_offsets is None:  # legacy side dict: one ring per polygon
            ring_offsets = self.offsets
        nxt = np.arange(1, len(self.coords) + 1, dtype=np.int64)
        nxt[ring_offsets[1:] - 1] = ring_offsets[:-1]  # ring end → ring start
        self.coords_next = self.coords[nxt] if len(self.coords) else self.coords
        self.ring_len = np.diff(self.offsets)  # TOTAL vertices per polygon

        # CSR uniform-grid candidate index for point queries: pitch =
        # median bbox extent (each polygon lands in O(1) buckets); ~6×
        # faster than the packed-tree descent for point-in-grid-polygon
        self.grid_ok = len(bboxes) > 0
        if self.grid_ok:
            w = np.median(bboxes[:, 2] - bboxes[:, 0])
            h = np.median(bboxes[:, 3] - bboxes[:, 1])
            pitch = max(w, h)
            if not np.isfinite(pitch) or pitch <= 0:
                self.grid_ok = False
        if self.grid_ok:
            self.pitch = pitch
            self.gx0 = float(bboxes[:, 0].min())
            self.gy0 = float(bboxes[:, 1].min())
            bx0 = np.floor((bboxes[:, 0] - self.gx0) / pitch).astype(np.int64)
            by0 = np.floor((bboxes[:, 1] - self.gy0) / pitch).astype(np.int64)
            bx1 = np.floor((bboxes[:, 2] - self.gx0) / pitch).astype(np.int64)
            by1 = np.floor((bboxes[:, 3] - self.gy0) / pitch).astype(np.int64)
            wspan = bx1 - bx0 + 1
            hspan = by1 - by0 + 1
            span = wspan * hspan
            gw, gh = int(bx1.max()) + 1, int(by1.max()) + 1
            if span.max() > 64:  # a polygon smeared over many buckets
                self.grid_ok = False
            elif gw * gh > self.MAX_GRID_CELLS:
                # many small polygons over a wide extent: the dense
                # counts/starts arrays would be O(gw·gh) int64 — a
                # worker OOM with no error path; the packed tree below
                # handles this regime instead
                self.grid_ok = False
            else:
                self.gw, self.gh = gw, gh
                # (bucket, polygon) membership pairs — bbox-cover
                # explode (flat arrays, no per-polygon Python loop:
                # this runs in every actor/worker __init__)
                polys = np.repeat(np.arange(len(bboxes), dtype=np.int64), span)
                local = np.arange(int(span.sum()), dtype=np.int64) - np.repeat(
                    np.cumsum(span) - span, span
                )
                h_rep = np.repeat(hspan, span)
                cells = (np.repeat(bx0, span) + local // h_rep) * self.gh + (
                    np.repeat(by0, span) + local % h_rep
                )
                order = np.argsort(cells, kind="stable")
                self.cell_poly = polys[order]
                self.cell_counts = np.bincount(cells, minlength=self.gw * self.gh)
                self.cell_starts = np.concatenate([[0], np.cumsum(self.cell_counts)[:-1]])

    def _candidates_grid(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        """(point, polygon) candidate pairs via the CSR grid (bbox check
        included); falls back to the packed tree when the grid was
        degenerate."""
        if not self.grid_ok:
            return self.tree.query_points(lon_deg, lat_deg)
        n = len(lon_deg)
        cx = np.floor((lon_deg - self.gx0) / self.pitch).astype(np.int64)
        cy = np.floor((lat_deg - self.gy0) / self.pitch).astype(np.int64)
        ok = (cx >= 0) & (cx < self.gw) & (cy >= 0) & (cy < self.gh)
        cell = np.where(ok, cx * self.gh + cy, 0)
        counts = np.where(ok, self.cell_counts[cell], 0)
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        pi = np.repeat(np.arange(n, dtype=np.int64), counts)
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        ci = self.cell_poly[np.repeat(self.cell_starts[cell], counts) + within]
        # exact-bbox prefilter (grid buckets over-approximate)
        bb = self._bboxes
        hit = (
            (bb[ci, 0] <= lon_deg[pi])
            & (bb[ci, 2] >= lon_deg[pi])
            & (bb[ci, 1] <= lat_deg[pi])
            & (bb[ci, 3] >= lat_deg[pi])
        )
        return pi[hit], ci[hit]

    def _match(self, lon_deg: np.ndarray, lat_deg: np.ndarray) -> np.ndarray:
        """Index of containing polygon per point (-1 = no match).

        Fully vectorized: STRtree candidates → (pair, segment) expansion
        → one ray-crossing computation over all segments → per-pair
        crossing counts via bincount. No Python loop over polygons.
        """
        res = np.full(len(lon_deg), -1, dtype=np.int64)
        pi, ci = self._candidates_grid(lon_deg, lat_deg)
        if len(pi) == 0:
            return res
        npairs = len(pi)
        plen = self.ring_len[ci]
        total = int(plen.sum())
        # segment index per (pair, vertex): offsets[ci] + within-ring pos
        pair_of_seg = np.repeat(np.arange(npairs, dtype=np.int64), plen)
        cum = np.concatenate([[0], np.cumsum(plen)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, plen)
        seg = np.repeat(self.offsets[ci], plen) + within

        x0 = self.coords[seg, 0]
        y0 = self.coords[seg, 1]
        x1 = self.coords_next[seg, 0]
        y1 = self.coords_next[seg, 1]
        px = lon_deg[pi][pair_of_seg]
        py = lat_deg[pi][pair_of_seg]
        cond = (y0 > py) != (y1 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xints = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
        cross = cond & (px < xints)
        counts = np.bincount(pair_of_seg, weights=cross, minlength=npairs)
        inside = (counts.astype(np.int64) % 2) == 1
        res[pi[inside]] = ci[inside]
        return res

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False)
        has = batch.column("has_geo").to_numpy(zero_copy_only=False)
        idx = np.full(len(lat), -1, dtype=np.int64)
        sel = np.flatnonzero(has)
        if len(sel):
            idx[sel] = self._match(lon[sel] / 1e6, lat[sel] / 1e6)
        # null-masked Arrow take: no Python-object round trip per row
        ind = pa.array(np.clip(idx, 0, None), mask=idx < 0)
        out = dict(zip(batch.column_names, batch.columns))
        out["block_id"] = self._ids_arrow.take(ind)
        out["gadm"] = self._gadm_arrow.take(ind)
        return pa.table(out)


# ---------------------------------------------------------------------------
# cell-sharded side table (the 100 TB path): one object-store slice per
# partitioning cell instead of a whole-table broadcast. A worker only
# ever fetches (and indexes) the slices its batches touch — required
# when the polygon side itself is too large for one worker's heap
# (SURVEY.md J1: "polygons partitioned by H3 res-5 cell, ray.put
# per-cell slices; points routed by h3_r5").

def put_blocks_side_by_cell(blocks: pa.Table, res: int | None = None) -> dict:
    """Blocks table → {cell_id: ObjectRef of that cell's slice}.

    A polygon whose bbox spans several cells is replicated into each
    (bbox-cover routing; exact PIP resolves false positives)."""
    from ..geom.cells import RES_PARTITION, polygon_covering_cells

    if res is None:
        res = RES_PARTITION
    wkbs = blocks.column("geom_wkb").to_pylist()
    by_cell: dict = {}
    for i, w in enumerate(wkbs):
        gtype, payload = parse_wkb(w)
        exteriors = [payload[0]] if gtype == 3 else [part[0] for part in payload]
        cells: set = set()
        for ring in exteriors:  # holes lie inside an exterior → no extra cells
            cells.update(int(c) for c in polygon_covering_cells(ring, res))
        for cid in cells:
            by_cell.setdefault(cid, []).append(i)
    refs = {}
    for cid, idxs in by_cell.items():
        refs[cid] = put_blocks_side(blocks.take(pa.array(idxs, pa.int64())))
    return refs


def _iter_cell_runs(cells: np.ndarray, shard_refs: dict, kind: str, cls):
    """The sharded-join idiom, once: stable-sort row indices by cell
    id, walk the equal-cell runs, and yield ``(row_indices, joiner)``
    for each run whose cell has a shard (build-once per worker via
    ``_cached``). Shared by the pip / knn / knn-topk sharded wrappers
    so a fix lands in one place."""
    n = len(cells)
    if n == 0:
        return
    order = np.argsort(cells, kind="stable")
    sorted_cells = cells[order]
    starts = np.flatnonzero(
        np.concatenate([[True], sorted_cells[1:] != sorted_cells[:-1]])
    )
    bounds = np.concatenate([starts, [n]])
    for s, e in zip(bounds[:-1], bounds[1:]):
        cid = int(sorted_cells[s])
        ref = shard_refs.get(cid)
        if ref is None:
            continue
        yield order[s:e], _cached(f"{kind}:{cid}", cls, ref)


def make_pip_sharded_fn(shard_refs: dict):
    """Task-mode cell-sharded PIP join. Rows are grouped by their
    ``cell_r5`` and each group is matched against only that cell's
    polygon slice; slices index lazily per worker (build-once)."""

    def pip_join_sharded(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell_r5").to_numpy(zero_copy_only=False)
        n = len(cells)
        block_id = np.full(n, None, dtype=object)
        gadm = np.full(n, None, dtype=object)
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False)
        has = batch.column("has_geo").to_numpy(zero_copy_only=False)
        for rows, joiner in _iter_cell_runs(
            cells, shard_refs, "pip_cell", PIPJoinActor
        ):
            sel = rows[has[rows]]
            if len(sel) == 0:
                continue
            idx = joiner._match(lon[sel] / 1e6, lat[sel] / 1e6)
            m = idx >= 0
            block_id[sel[m]] = joiner.ids[idx[m]]
            gadm[sel[m]] = joiner.gadm[idx[m]]
        out = dict(zip(batch.column_names, batch.columns))
        out["block_id"] = pa.array(block_id.tolist(), pa.string())
        out["gadm"] = pa.array(gadm.tolist(), pa.string())
        return pa.table(out)

    return pip_join_sharded


# ---------------------------------------------------------------------------
# task-mode wrappers: same build-once-per-worker semantics as the actor
# pool, but as stateless tasks + a per-worker-process cache keyed by the
# broadcast ObjectRef. Ray reuses worker processes across tasks, so the
# index builds once per worker — with better elasticity than a fixed
# actor pool (measured ~3× faster end-to-end on this workload; actor
# mode remains available for placement control on real clusters).

_WORKER_CACHE: dict = {}


def _cached(kind: str, cls, ref):
    key = (kind, ref.hex() if hasattr(ref, "hex") else id(ref))
    inst = _WORKER_CACHE.get(key)
    if inst is None:
        inst = cls(ref)
        _WORKER_CACHE[key] = inst
    return inst


def put_anchors_side_by_cell(parcels: pa.Table, res: int | None = None, halo_e6: int = 100_000) -> dict:
    """Anchors table → {cell_id: ObjectRef of slice + halo}.

    Each cell's slice contains its own anchors PLUS every anchor within
    ``halo_e6`` of the cell border, so a point's true nearest anchor is
    in its own slice whenever nearest-distance < halo (documented
    partitioning assumption; in this world nearest ≤ ~36k µdeg ≪ the
    100k halo — asserted by the equivalence oracle)."""
    from ..geom.cells import (
        RES_PARTITION,
        WORLD_LAT0_E6,
        WORLD_LON0_E6,
        cell_width_e6,
        pack_cell_id,
    )

    if res is None:
        res = RES_PARTITION
    w = cell_width_e6(res)
    ax = parcels.column("anchor_lon_e6").to_numpy().astype(np.int64)
    ay = parcels.column("anchor_lat_e6").to_numpy().astype(np.int64)
    nmax = (1 << res) - 1
    # SAME origin handling as cell_id_e6 — points are routed by
    # cell_id_e6, so the sharder must bin in the identical frame (an
    # origin-0 shortcut desynchronizes every shard key the moment the
    # world bbox moves)
    cx0 = np.clip((ax - halo_e6 - WORLD_LON0_E6) // w, 0, nmax)
    cx1 = np.clip((ax + halo_e6 - WORLD_LON0_E6) // w, 0, nmax)
    cy0 = np.clip((ay - halo_e6 - WORLD_LAT0_E6) // w, 0, nmax)
    cy1 = np.clip((ay + halo_e6 - WORLD_LAT0_E6) // w, 0, nmax)
    # bbox-cover explode (the routing.py idiom): every (anchor, cell)
    # pair materialized as flat arrays — this build is on the
    # large-anchor growth path, so no per-anchor Python loop (VERDICT
    # r4 §wrong.2). Coverage per anchor is (nx × ny), ≤ 4 cells for
    # any halo < cell width.
    nx = (cx1 - cx0 + 1).astype(np.int64)
    ny = (cy1 - cy0 + 1).astype(np.int64)
    counts = nx * ny
    total = int(counts.sum())
    if total == 0:
        return {}  # no anchors → no shards (empty parcels table)
    rep = np.repeat(np.arange(len(ax), dtype=np.int64), counts)
    off = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    ny_rep = ny[rep]
    cx = cx0[rep] + off // ny_rep
    cy = cy0[rep] + off % ny_rep
    cid = pack_cell_id(cx, cy, res)  # the ONE packing rule (geom.cells)
    order = np.argsort(cid, kind="stable")
    cid_s, rep_s = cid[order], rep[order]
    starts = np.flatnonzero(
        np.concatenate([[True], cid_s[1:] != cid_s[:-1]])
    )
    bounds = np.concatenate([starts, [total]])
    # the remaining loop is per-CELL (one ray.put per shard — the
    # irreducible unit), never per-anchor
    return {
        int(cid_s[s]): put_anchors_side(
            parcels.take(pa.array(rep_s[s:e], pa.int64()))
        )
        for s, e in zip(bounds[:-1], bounds[1:])
    }


def make_knn_sharded_fn(shard_refs: dict):
    """Task-mode cell-sharded kNN: rows grouped by cell_r5, each group
    assigned from only its cell's halo'd anchor slice."""

    def knn_sharded(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell_r5").to_numpy(zero_copy_only=False)
        n = len(cells)
        parcel_id = np.full(n, None, dtype=object)
        dist2 = np.full(n, -1, dtype=np.int64)
        for rows, knn in _iter_cell_runs(
            cells, shard_refs, "knn_cell", KNNAnchorActor
        ):
            sub = batch.take(pa.array(rows, pa.int64()))
            res_t = knn(sub)
            parcel_id[rows] = res_t.column("parcel_id").to_pylist()
            dist2[rows] = res_t.column("dist2").to_numpy(zero_copy_only=False)
        out = dict(zip(batch.column_names, batch.columns))
        out["parcel_id"] = pa.array(parcel_id.tolist(), pa.string())
        out["dist2"] = pa.array(dist2)
        return pa.table(out)

    return knn_sharded


def make_pip_fn(blocks_ref):
    """Task-mode PIP join: ``ds.map_batches(make_pip_fn(ref), ...)``."""

    def pip_join(batch: pa.Table) -> pa.Table:
        return _cached("pip", PIPJoinActor, blocks_ref)(batch)

    return pip_join


def make_knn_fn(anchors_ref):
    """Task-mode kNN assignment."""

    def knn_assign(batch: pa.Table) -> pa.Table:
        return _cached("knn", KNNAnchorActor, anchors_ref)(batch)

    return knn_assign


def make_knn_topk_sharded_fn(shard_refs: dict, k: int):
    """Cell-sharded k>1 kNN: rows grouped by ``cell_r5``, each group's
    top-k drawn from only its cell's halo'd anchor slice. Partitioning
    assumption (same as k=1, stricter by k): the k-th nearest anchor
    must lie within the halo — equivalence to the broadcast path is
    oracle-proven on this world (3rd-nearest ≤ ~70k µdeg < 100k halo)."""

    def knn_topk_sharded(batch: pa.Table) -> pa.Table:
        cells = batch.column("cell_r5").to_numpy(zero_copy_only=False)
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        urls = batch.column("url")
        out_rows, out_rank, out_pid, out_d2 = [], [], [], []
        for rows, a in _iter_cell_runs(
            cells, shard_refs, "knn_cell", KNNAnchorActor
        ):
            idx, d2 = a.topk(lon[rows], lat[rows], k)
            valid = idx >= 0
            counts = valid.sum(axis=1)
            flat = valid.ravel()
            out_rows.append(np.repeat(rows, counts))
            out_rank.append(np.tile(np.arange(1, k + 1), len(rows))[flat])
            out_pid.append(a.ids[idx.ravel()[flat]])
            out_d2.append(d2.ravel()[flat])
        if not out_rows:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "rank": pa.array([], pa.int64()),
                    "parcel_id": pa.array([], pa.string()),
                    "dist2": pa.array([], pa.int64()),
                }
            )
        rows_all = np.concatenate(out_rows)
        return pa.table(
            {
                "url": urls.take(pa.array(rows_all, pa.int64())),
                "rank": pa.array(np.concatenate(out_rank), pa.int64()),
                "parcel_id": pa.array(
                    np.concatenate(out_pid).tolist(), pa.string()
                ),
                "dist2": pa.array(np.concatenate(out_d2), pa.int64()),
            }
        )

    return knn_topk_sharded


def make_knn_topk_fn(anchors_ref, k: int):
    """Task-mode k>1 kNN: flat_map shape — each geo row explodes into
    ≤ k ranked rows (url, rank, parcel_id, dist2), rank 1 = nearest,
    order (d2, parcel_id). SURVEY J8's general form."""

    def knn_topk(batch: pa.Table) -> pa.Table:
        a = _cached("knn", KNNAnchorActor, anchors_ref)
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        has = batch.column("has_geo").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(has)
        empty = pa.table(
            {
                "url": pa.array([], pa.string()),
                "rank": pa.array([], pa.int64()),
                "parcel_id": pa.array([], pa.string()),
                "dist2": pa.array([], pa.int64()),
            }
        )
        if not len(sel):
            return empty
        idx, d2 = a.topk(lon[sel], lat[sel], k)
        valid = idx >= 0  # filled left-to-right per row
        counts = valid.sum(axis=1)
        rows = np.repeat(sel, counts)
        if not len(rows):
            return empty
        flat = valid.ravel()
        return pa.table(
            {
                "url": batch.column("url").take(pa.array(rows, pa.int64())),
                "rank": pa.array(np.tile(np.arange(1, k + 1), len(sel))[flat], pa.int64()),
                "parcel_id": pa.array(a.ids[idx.ravel()[flat]].tolist(), pa.string()),
                "dist2": pa.array(d2.ravel()[flat], pa.int64()),
            }
        )

    return knn_topk


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

    MAX_ANCHORS = 1 << 21  # packed-key id width; shard larger side tables

    def __init__(self, anchors_ref, k: int = 1):
        side = ray.get(anchors_ref)
        self.ids = side["ids"]
        self.ax = side["ax"]
        self.ay = side["ay"]
        self.k = k
        # canonical anchor order: lexicographic by id, so the packed-key
        # (d2, index) tie-break is EXACTLY (d2, parcel_id) — the only
        # tie rule an oracle can express (table row order is a Ray
        # artifact, not a contract)
        order = np.argsort(self.ids, kind="stable")
        self.ids = self.ids[order]
        self.ax = self.ax[order]
        self.ay = self.ay[order]
        self._ids_arrow = pa.array(self.ids, pa.string())
        if len(self.ids) >= self.MAX_ANCHORS:
            raise ValueError(
                f"{len(self.ids)} anchors exceed the per-actor packed-key "
                f"limit ({self.MAX_ANCHORS}); shard the side table by cell "
                "(put_anchors_side_by_cell) instead of broadcasting whole"
            )
        bx = self.ax // self.BUCKET_E6
        by = self.ay // self.BUCKET_E6
        # dense CSR grid for the vectorized 3×3 fast path: anchors sorted
        # by (bucket, anchor index); starts/counts per grid cell
        self.gx0, self.gy0 = int(bx.min()), int(by.min())
        self.gw = int(bx.max()) - self.gx0 + 1
        self.gh = int(by.max()) - self.gy0 + 1
        flat = (bx - self.gx0) * self.gh + (by - self.gy0)
        order = np.argsort(flat, kind="stable")  # stable → anchor-id order within bucket
        self.cell_anchor = order
        self.cell_counts = np.bincount(flat, minlength=self.gw * self.gh).astype(np.int64)
        self.cell_starts = np.concatenate([[0], np.cumsum(self.cell_counts)[:-1]])
        # exact-fallback bucket map, derived from the CSR slices in
        # O(distinct cells) — a per-anchor Python dict loop here costs
        # seconds per actor build at the 2M-anchor ceiling
        self.buckets = {
            (int(c) // self.gh + self.gx0, int(c) % self.gh + self.gy0):
                self.cell_anchor[
                    self.cell_starts[c] : self.cell_starts[c] + self.cell_counts[c]
                ]
            for c in np.flatnonzero(self.cell_counts)
        }
        # precomputed 3×3 NEIGHBORHOOD CSR: for each grid cell, the
        # anchors of its (in-grid) 3×3 neighborhood, concatenated. Each
        # anchor joins ≤ 9 neighborhoods (≤ 9·n_anchors int64 — built
        # once per actor), so the per-point query is ONE cell lookup +
        # ONE CSR gather instead of nine — this stage was the flagship
        # chain's hottest (11 → ~2 µs/row); out-of-grid offsets are
        # skipped (not clipped), so neighborhoods carry no duplicates
        acx = (bx - self.gx0).astype(np.int64)
        acy = (by - self.gy0).astype(np.int64)
        pair_cell, pair_anchor = [], []
        aidx = np.arange(len(self.ax), dtype=np.int64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncx, ncy = acx + dx, acy + dy
                ok = (ncx >= 0) & (ncx < self.gw) & (ncy >= 0) & (ncy < self.gh)
                pair_cell.append(ncx[ok] * self.gh + ncy[ok])
                pair_anchor.append(aidx[ok])
        pc_ = np.concatenate(pair_cell)
        pan = np.concatenate(pair_anchor)
        ordn = np.lexsort((pan, pc_))  # anchor-index order within a cell
        self.nbhd_anchor = pan[ordn]
        self.nbhd_counts = np.bincount(pc_, minlength=self.gw * self.gh).astype(np.int64)
        self.nbhd_starts = np.concatenate([[0], np.cumsum(self.nbhd_counts)[:-1]])

    def _nearest_exact(self, lon: int, lat: int):
        """Exact nearest anchor by Chebyshev ring expansion.

        Correct stopping rule: keep expanding while a ring could still
        hold a nearer anchor — any anchor in ring r is at least
        (r-1)·BUCKET away from the point, so stop once
        (r-1)²·BUCKET² > best_d2. Returns (anchor_idx, d2) or (-1, -1).
        """
        bx, by = int(lon // self.BUCKET_E6), int(lat // self.BUCKET_E6)
        best_i, best_d2 = -1, -1
        r = 0
        while r <= 4096:
            if best_i >= 0 and (r - 1) > 0 and (
                (r - 1) * self.BUCKET_E6
            ) ** 2 > best_d2:
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
                if b is None:
                    continue
                dx = lon - self.ax[b]
                dy = lat - self.ay[b]
                d2 = dx * dx + dy * dy
                j = int(np.argmin(d2))
                # lexicographic (d2, anchor-id) tie-break
                if best_i < 0 or d2[j] < best_d2 or (
                    d2[j] == best_d2 and int(b[j]) < best_i
                ):
                    best_i, best_d2 = int(b[j]), int(d2[j])
            r += 1
        return best_i, best_d2

    def _keys_3x3(self, lon: np.ndarray, lat: np.ndarray):
        """Candidate expansion over each point's 3×3 bucket neighborhood
        via the PRECOMPUTED neighborhood CSR (one gather, not nine):
        returns (pt_of_cand, packed key, tot candidates per point). The
        key packs lexicographic (d2, anchor index) into one int64:
        d2 < 2·(3·BUCKET)² ≈ 2^38 in-grid (clipped at 2^41 for safety)
        and anchor index < 2^21 (guarded in __init__) → key < 2^63.
        Neighborhoods are duplicate-free by construction (out-of-grid
        offsets skipped at build)."""
        n = len(lon)
        pbx = np.clip(lon // self.BUCKET_E6 - self.gx0, 0, self.gw - 1)
        pby = np.clip(lat // self.BUCKET_E6 - self.gy0, 0, self.gh - 1)
        cell = pbx * self.gh + pby
        tot = self.nbhd_counts[cell]
        total = int(tot.sum())
        cum = np.concatenate([[0], np.cumsum(tot)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, tot)
        cand = self.nbhd_anchor[np.repeat(self.nbhd_starts[cell], tot) + within]
        pair_pt = np.repeat(np.arange(n, dtype=np.int64), tot)

        dx = lon[pair_pt] - self.ax[cand]
        dy = lat[pair_pt] - self.ay[cand]
        d2 = dx * dx + dy * dy
        key = np.minimum(d2, (1 << 41) - 1) * (1 << 21) + cand
        return pair_pt, key, tot

    def _nearest_3x3(self, lon: np.ndarray, lat: np.ndarray):
        """Vectorized nearest-anchor over each point's 3×3 bucket
        neighborhood. Returns (anchor_idx, d2); anchor_idx = -1 where
        the neighborhood is empty. Ties broken by smallest anchor index
        (lexicographic (d2, id) min)."""
        n = len(lon)
        pair_pt, key, tot = self._keys_3x3(lon, lat)
        best = np.full(n, -1, dtype=np.int64)
        best_d2 = np.full(n, -1, dtype=np.int64)
        has_cand = tot > 0
        if len(key):
            pstarts = np.concatenate([[0], np.cumsum(tot)[:-1]])[has_cand]
            mins = np.minimum.reduceat(key, pstarts)
            best[has_cand] = mins % (1 << 21)
            best_d2[has_cand] = mins >> 21
        return best, best_d2

    def _topk_3x3(self, lon: np.ndarray, lat: np.ndarray, k: int):
        """Vectorized top-k anchors per point from the 3×3 neighborhood:
        one lexsort on (point, packed key) → consecutive-duplicate drop
        (grid-edge clipping) → first k of each point's run. Returns
        (idx (n,k), d2 (n,k)) filled left-to-right, -1-padded."""
        n = len(lon)
        idx_out = np.full((n, k), -1, dtype=np.int64)
        d2_out = np.full((n, k), -1, dtype=np.int64)
        pair_pt, key, _tot = self._keys_3x3(lon, lat)
        if not len(key):
            return idx_out, d2_out
        order = np.lexsort((key, pair_pt))
        pt_s, key_s = pair_pt[order], key[order]
        keep = np.concatenate(
            [[True], (pt_s[1:] != pt_s[:-1]) | (key_s[1:] != key_s[:-1])]
        )
        pt_s, key_s = pt_s[keep], key_s[keep]
        first = np.concatenate([[True], pt_s[1:] != pt_s[:-1]])
        run_start = np.flatnonzero(first)
        pos = np.arange(len(pt_s), dtype=np.int64) - run_start[np.cumsum(first) - 1]
        take = pos < k
        idx_out[pt_s[take], pos[take]] = key_s[take] % (1 << 21)
        d2_out[pt_s[take], pos[take]] = key_s[take] >> 21
        return idx_out, d2_out

    def _topk_exact(self, lon: int, lat: int, k: int):
        """Exact top-k by Chebyshev ring expansion (the per-point slow
        path behind the 3×3 guard). Stopping rule: any anchor in ring r
        is ≥ (r-1)·BUCKET away, so stop once k found AND
        (r-1)²·BUCKET² > k-th best d2. Returns [(idx, d2)] sorted by
        (d2, idx), ≤ k entries."""
        bx, by = int(lon // self.BUCKET_E6), int(lat // self.BUCKET_E6)
        cand: list[np.ndarray] = []
        best: np.ndarray | None = None  # (m, 2) [d2, idx] sorted rows
        r = 0
        while r <= 4096:
            if (
                best is not None
                and len(best) >= k
                and (r - 1) > 0
                and ((r - 1) * self.BUCKET_E6) ** 2 > best[k - 1, 0]
            ):
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
                if b is None:
                    continue
                dx = lon - self.ax[b]
                dy = lat - self.ay[b]
                cand.append(np.stack([dx * dx + dy * dy, b], axis=1))
            if cand:
                allc = np.concatenate(cand)
                order = np.lexsort((allc[:, 1], allc[:, 0]))
                best = allc[order[: max(k, 1)]]
                cand = [best]
            r += 1
        if best is None:
            return []
        return [(int(i), int(d)) for d, i in best[:k]]

    def topk(self, lon: np.ndarray, lat: np.ndarray, k: int):
        """Exact k-nearest anchors per point (µdeg int coords): the
        vectorized 3×3 pass with the per-point exactness guard — a
        point whose k-th 3×3 answer is at-or-beyond one bucket width
        (or that found < k candidates) re-runs on the ring-expansion
        path (anchors in ring 2+ are ≥ BUCKET away; strict <, so exact
        ties fall through to the exact path's (d2, id) order)."""
        idx, d2 = self._topk_3x3(lon, lat, k)
        found = (idx >= 0).sum(axis=1)
        kth_d2 = d2[np.arange(len(lon)), np.maximum(found - 1, 0)]
        lim = self.BUCKET_E6 * self.BUCKET_E6
        ok = (found == min(k, len(self.ids))) & (kth_d2 < lim)
        for i in np.flatnonzero(~ok):
            idx[i, :] = -1
            d2[i, :] = -1
            for r, (ai, ad2) in enumerate(self._topk_exact(int(lon[i]), int(lat[i]), k)):
                idx[i, r] = ai
                d2[i, r] = ad2
        return idx, d2

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch.column("lat_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch.column("lon_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        has = batch.column("has_geo").to_numpy(zero_copy_only=False)
        n = len(lat)
        best = np.full(n, -1, dtype=np.int64)
        best_d2 = np.full(n, -1, dtype=np.int64)

        sel = np.flatnonzero(has)
        if len(sel):
            a_idx, d2 = self._nearest_3x3(lon[sel], lat[sel])
            # exactness guard: a 3×3 answer at-or-beyond one bucket width
            # could be beaten (or TIED with a smaller anchor id, which the
            # (d2, id) tie-break must prefer) from ring 2+; those and
            # empty neighborhoods take the exact ring-expansion path —
            # strict < so exact ties fall through
            ok = (a_idx >= 0) & (d2 < self.BUCKET_E6 * self.BUCKET_E6)
            best[sel[ok]] = a_idx[ok]
            best_d2[sel[ok]] = d2[ok]
            for i in sel[~ok] if (~ok).any() else []:
                bi, bd2 = self._nearest_exact(int(lon[i]), int(lat[i]))
                if bi >= 0:
                    best[i] = bi
                    best_d2[i] = bd2

        ind = pa.array(np.clip(best, 0, None), mask=best < 0)
        out = dict(zip(batch.column_names, batch.columns))
        out["parcel_id"] = self._ids_arrow.take(ind)
        out["dist2"] = pa.array(best_d2)
        return pa.table(out)
