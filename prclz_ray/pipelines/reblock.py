"""Reblock pipeline: per-block Steiner road proposals, Ray-Data-first.

Reference semantics (NOT code) from `reblock/i_reblock.py::reblock_gadm`
(:240-319) and `reblock/i_topology.py::get_optimal_path` (:56-101):

1. per block, build the planar graph of parcel boundaries; the edges
   along the block boundary become ROADS via the reference's
   ``update_edge_types`` mechanism — shortest path between consecutive
   block-ring coords relabeled 'highway' (weight ≈ 0), waterway /
   natural barrier edges weighted 1e5
   (`reblock/i_topology_utils.py:197-252`, G16 FULL);
2. snap each building centroid onto its closest graph edge as a
   terminal (`add_node_to_closest_edge`, G6), plus one road-access
   terminal — the representative point of ``min_rotated_rect −
   convex_hull`` (`reblock/i_reblock.py:285-291`, G17), falling back
   to the SW boundary corner for convex blocks (empty difference);
3. reduce to the largest connected component (G14), optional degree-2
   contraction (``simplify``, G15), then the Steiner 2-approximation
   (G13) connects the terminals;
4. emit per-block summary + the new (non-road) steiner lines as WKB.

The INTERIOR variant additionally applies the reference's
``drop_buildings_intersecting_block`` rule (`i_reblock.py:168-210`,
G17): parcels here are the building-centroid Voronoi fan (the
reference's cadastral parcels); buildings whose parcel touches the
block boundary already have road access and are dropped; blocks left
with no interior building are skipped (status row, not silence).

Execution shape (O1 cost-based priority ordering,
`reblock/i_reblock.py:247-248`): parcels → ONE ``groupby(block_id)``
pack into one row per block → ``sort(cost DESC)`` so the heaviest
blocks start first (no straggler tail) → ``map_batches`` runs the
per-block solver over the packed rows. Building centroids are
recomputed from the deterministic world arithmetic inside the UDF
(identical to the `buildings` table rows; avoids a second shuffle of
the tiny building set).
"""

from __future__ import annotations

from ..io import read_parquet_clean as _read_parquet_clean

import numpy as np
import pyarrow as pa

from .. import world
from ..geom.core import point_segments_d2
from ..geom.wkb import parse_wkb, wkb_multilinestring
from ..graph.planar import PlanarGraph, _q
from ..graph.steiner import _path, dijkstra, steiner_tree_approx

ROAD_WEIGHT = 1e-9  # roads are free to traverse (G16 highway→0)
BARRIER_WEIGHT = 1e5  # waterway/natural (G16 WATERWAY_WEIGHT/NATURAL_WEIGHT)


MAX_GRAPH_EDGES = 50_000  # straggler bail-out (O4): the engine's
# compute-budget replacement for the reference's wall-clock
# `mins_threshold` abort (`reblock/i_reblock.py:268-273`) — deterministic
# (same block always gets the same verdict) unlike a timer.


def update_edge_types(g: PlanarGraph, boundary_coords, barriers=None) -> tuple[int, int]:
    """The reference's ``update_edge_types``
    (`reblock/i_topology_utils.py:197-252`, G16 FULL): for each
    consecutive pair of block-boundary coords present in the parcel
    graph, relabel the shortest (length-weighted) path between them as
    road (weight → ROAD_WEIGHT); then apply barrier weights —
    ``barriers`` maps an undirected quantized edge key to a feature
    type ('waterway' / 'natural' → weight 1e5). Returns
    ``(missing, total)``: how many boundary coords are absent from the
    parcel graph (the reference's ``check=True`` diagnostic)."""
    coords = [(_q(float(c[0])), _q(float(c[1]))) for c in boundary_coords]
    if len(coords) > 1 and coords[0] == coords[-1]:
        coords = coords[:-1]
    total = len(coords)
    missing = sum(1 for c in set(coords) if c not in g.adj)
    # phase 1: find all relabel paths with ORIGINAL length weights (the
    # reference applies the highway weight only after the loop,
    # `i_topology_utils.py:248` — relabeled roads must not shortcut the
    # later corner pairs' shortest paths)
    road_edges = []
    for i in range(len(coords)):
        n0, n1 = coords[i], coords[(i + 1) % len(coords)]
        if n0 not in g.adj or n1 not in g.adj:
            continue
        _, prev = dijkstra(g, n0)
        if n1 not in prev and n1 != n0:
            continue  # disconnected
        path = _path(prev, n0, n1)
        road_edges.extend(zip(path, path[1:]))
    # phase 2: relabel + weight
    for a, b in road_edges:
        g.add_edge(a, b, road=True, weight=ROAD_WEIGHT)
    if barriers:
        for key, ftype in barriers.items():
            a, b = key
            ka = (_q(float(a[0])), _q(float(a[1])))
            kb = (_q(float(b[0])), _q(float(b[1])))
            k = (ka, kb) if ka <= kb else (kb, ka)
            flags = g.edge_flags.get(k)
            if flags is not None and not flags["road"] and ftype in ("waterway", "natural"):
                flags["weight"] = BARRIER_WEIGHT
    return missing, total


GADM_BOUNDARY_THRESHOLD = 0.001  # degrees — the reference's
# THRESHOLD_METERS analogue: a block coord farther than this from any
# typed line is attributed to the admin boundary, not a feature


def feature_type_from_lines(lines_xy: np.ndarray, lines_ftype: list, a, b,
                            threshold: float = GADM_BOUNDARY_THRESHOLD,
                            _memo: dict | None = None) -> str:
    """The reference's ``get_feature_type_from_lines``
    (`reblock/i_topology_utils.py:255-276`, M11 FULL): classify the
    edge (a, b) by the feature type of the typed line nearest each
    endpoint; an endpoint farther than the threshold from every line
    is 'gadm_boundary'; mismatched endpoints resolve to 'highway' if
    either is one, else 'natural'."""
    def etype(p) -> str:
        key = (float(p[0]), float(p[1]))
        if _memo is not None and key in _memo:
            return _memo[key]
        if len(lines_xy) == 0:
            ft = "gadm_boundary"
        else:
            d2 = point_segments_d2(key[0], key[1], lines_xy)
            i = int(np.argmin(d2))
            ft = "gadm_boundary" if d2[i] > threshold * threshold else lines_ftype[i]
        if _memo is not None:
            _memo[key] = ft
        return ft

    fa, fb = etype(a), etype(b)
    if fa != fb:
        return "highway" if "highway" in (fa, fb) else "natural"
    return fa


def barriers_from_lines(g: PlanarGraph, lines_xy: np.ndarray, lines_ftype: list) -> dict:
    """Classify every parcel-graph edge against the typed lines table
    and return the barrier map ``update_edge_types`` consumes
    ({edge_key: 'waterway'|'natural'}) — the lines_pgraph path of the
    reference's edge typing."""
    barriers = {}
    memo: dict = {}  # per-vertex cache: classify each vertex once, not
    # once per incident edge (avg degree ~4 in a parcel lattice)
    for a, b in g.edges():
        ftype = feature_type_from_lines(lines_xy, lines_ftype, a, b, _memo=memo)
        if ftype in ("waterway", "natural"):
            barriers[(a, b)] = ftype
    return barriers


def _dead_letter(block_id: str, status: str) -> pa.Table:
    return pa.table(
        {
            "block_id": [block_id],
            "n_terminals": pa.array([0], pa.int64()),
            "n_steiner_edges": pa.array([0], pa.int64()),
            "n_new_edges": pa.array([0], pa.int64()),
            "total_len_e6": pa.array([0], pa.int64()),
            "new_len_e6": pa.array([0], pa.int64()),
            "new_lines_wkb": pa.array([None], pa.binary()),
            "existing_lines_wkb": pa.array([None], pa.binary()),
            "terminals_wkb": pa.array([None], pa.binary()),
            "n_boundary_missing": pa.array([0], pa.int64()),
            "status": [status],
        }
    )


def _block_bounds(bx: int, by: int) -> tuple[float, float, float, float]:
    x0 = (bx * world.BLOCK_E6 + world.STREET_EPS_E6) / 1e6
    x1 = ((bx + 1) * world.BLOCK_E6 - world.STREET_EPS_E6) / 1e6
    y0 = (by * world.BLOCK_E6 + world.STREET_EPS_E6) / 1e6
    y1 = ((by + 1) * world.BLOCK_E6 - world.STREET_EPS_E6) / 1e6
    return x0, y0, x1, y1


def _summary_row(block_id, g, terms, edges, boundary_missing: int = 0) -> pa.Table:
    """The reference's per-block update triple
    (`reblock/i_reblock.py:127-135`): summary stats + new_steiner +
    existing_steiner MultiLineStrings + terminal MultiPoint, one row."""
    from ..geom.wkb import wkb_multipoint

    new_lines = [np.array([a, b]) for a, b in edges if not g.is_road(a, b)]
    existing_lines = [np.array([a, b]) for a, b in edges if g.is_road(a, b)]
    total_len_e6 = sum(
        int(round(np.hypot(b[0] - a[0], b[1] - a[1]) * 1e6)) for a, b in edges
    )
    new_len_e6 = sum(
        int(round(np.hypot(ln[1][0] - ln[0][0], ln[1][1] - ln[0][1]) * 1e6))
        for ln in new_lines
    )
    return pa.table(
        {
            "block_id": [block_id],
            "n_terminals": pa.array([len(terms)], pa.int64()),
            "n_steiner_edges": pa.array([len(edges)], pa.int64()),
            "n_new_edges": pa.array([len(new_lines)], pa.int64()),
            "total_len_e6": pa.array([total_len_e6], pa.int64()),
            "new_len_e6": pa.array([new_len_e6], pa.int64()),
            "new_lines_wkb": pa.array(
                [wkb_multilinestring(new_lines) if new_lines else None], pa.binary()
            ),
            "existing_lines_wkb": pa.array(
                [wkb_multilinestring(existing_lines) if existing_lines else None],
                pa.binary(),
            ),
            "terminals_wkb": pa.array(
                [wkb_multipoint(np.array(sorted(terms))) if terms else None], pa.binary()
            ),
            # the reference's update_edge_types check diagnostic
            # (`i_topology_utils.py:207-214`): block-ring coords absent
            # from the parcel graph = boundary segments that could NOT
            # be road-relabeled; nonzero values mean steiner costs are
            # overstated for this block — surfaced, never silent
            "n_boundary_missing": pa.array([int(boundary_missing)], pa.int64()),
            "status": ["ok"],
        }
    )


def _run_block(
    block_id: str,
    bx: int,
    by: int,
    wkbs: list,
    *,
    simplify: bool = False,
    barriers=None,
    lines: tuple | None = None,
) -> pa.Table:
    """One block's parcel rings → steiner summary row. ``lines`` is an
    optional typed-lines table ((n,4) xy array, ftype list): edges are
    then classified via `feature_type_from_lines` (M11) and
    waterway/natural features become barriers automatically."""
    x0, y0, x1, y1 = _block_bounds(bx, by)

    g = PlanarGraph()
    for wkb in wkbs:
        _, rings = parse_wkb(wkb)
        ring = rings[0]
        for i in range(len(ring)):
            a = (float(ring[i][0]), float(ring[i][1]))
            b = (float(ring[(i + 1) % len(ring)][0]), float(ring[(i + 1) % len(ring)][1]))
            if a == b:
                continue
            g.add_edge(a, b)
            if g.number_of_edges() > MAX_GRAPH_EDGES:
                return _dead_letter(block_id, "dead_letter:graph_too_large")

    # G16: road-relabel along the block ring + barrier weights; typed
    # lines (when given) classify edges into waterway/natural barriers
    if lines is not None:
        auto = barriers_from_lines(g, lines[0], lines[1])
        barriers = {**auto, **(barriers or {})}
    block_ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    missing, _ = update_edge_types(g, block_ring, barriers=barriers)

    # terminals: building centroids snapped to closest edges + one
    # road-access point (G17 outside terminal; SW corner fallback for
    # convex blocks — the fixture block square is always convex)
    from ..geom.hull import outside_terminal

    cents = world.building_centroids_e6(bx, by) / 1e6
    terminals = [g.add_node_to_closest_edge((float(cx), float(cy)), terminal=True)
                 for cx, cy in cents]
    block_arr = np.array(block_ring[:-1], dtype=np.float64)
    outside = outside_terminal(block_arr)
    terminals.append(
        g.add_node_to_closest_edge(outside if outside is not None else (x0, y0), terminal=True)
    )

    g = g.largest_component()
    if simplify:
        g = g.contract_degree2()
    terms = [t for t in terminals if t in g.adj]
    edges = steiner_tree_approx(g, terms)
    return _summary_row(block_id, g, terms, edges, boundary_missing=missing)


def reblock_group(group: pa.Table, **opts) -> pa.Table:
    """One block's parcels → steiner summary row (status='ok'), or a
    dead-letter row: poison-pill rows become data, never lost tasks
    (the Ray-native `error_{index}` file, `midway_blocks.py:45-48`)."""
    block_id = group.column("block_id")[0].as_py()
    try:
        return _run_block(
            block_id,
            int(group.column("bx")[0].as_py()),
            int(group.column("by")[0].as_py()),
            group.column("geom_wkb").to_pylist(),
            **opts,
        )
    except Exception as ex:  # pragma: no cover - defensive
        return _dead_letter(block_id, f"error:{type(ex).__name__}")


def _limit_filter(ds, limit_blocks):
    if limit_blocks is None:
        return ds

    def keep(b: pa.Table) -> pa.Table:
        bxv = b.column("bx").to_numpy(zero_copy_only=False)
        byv = b.column("by").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bxv * world.N_BLOCKS + byv < limit_blocks))

    return ds.map_batches(keep, batch_format="pyarrow")


def packed_blocks_dataset(limit_blocks: int | None = None):
    """parcels → ONE ROW PER BLOCK (wkb list + cost), sorted by cost
    DESC — the reference's sort-by-building-count work ordering (O1,
    `reblock/i_reblock.py:247-248`): heaviest solver tasks start first
    so no straggler finishes last."""
    import ray.data

    from . import derive

    ds = _limit_filter(_read_parquet_clean(derive.parcels_path()), limit_blocks)
    # bucketed grouping (CLAUDE.md tiny-groups rule): one Ray group per
    # HASH BUCKET of blocks, never per block_id — 10⁴+ groups of ~4
    # parcels each are a pathological groupby shape; blocks regroup
    # vectorized inside the bucket. Bucket count and reduce width are
    # both INPUT-SCALED, width capped at the bucket count (schema-less
    # empty-partition hazard). Parcel order within a block does not
    # affect _run_block (the graph is coordinate-keyed).
    from ..stages.hashing import hash_strings
    from ..stages.scaling import dynamic_buckets, parquet_rows, reduce_width

    n_rows = parquet_rows(derive.parcels_path())
    if limit_blocks is not None:
        n_rows = min(n_rows, limit_blocks * 4)  # parcelize emits 4 per block
    bc_n = dynamic_buckets(n_rows, 64)

    def add_bc(b: pa.Table) -> pa.Table:
        bid = b.column("block_id")
        bid = bid.combine_chunks() if isinstance(bid, pa.ChunkedArray) else bid
        return b.append_column("bc", pa.array(hash_strings(bid) % bc_n, pa.int64()))

    ds = ds.map_batches(add_bc, batch_format="pyarrow").repartition(
        reduce_width(n_rows, n_buckets=bc_n)
    )

    def pack(group: pa.Table) -> pa.Table:
        bx = int(group.column("bx")[0].as_py())
        by = int(group.column("by")[0].as_py())
        return pa.table(
            {
                "block_id": [group.column("block_id")[0].as_py()],
                "bx": pa.array([bx], pa.int64()),
                "by": pa.array([by], pa.int64()),
                "cost": pa.array([int(world.n_buildings_for_block(bx, by))], pa.int64()),
                "wkbs": pa.array(
                    [group.column("geom_wkb").to_pylist()], pa.list_(pa.binary())
                ),
            }
        )

    def pack_bucket(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("block_id").to_pylist())
        order = np.argsort(ids, kind="stable")
        g = group.take(pa.array(order))
        sids = ids[order]
        heads = np.flatnonzero(np.concatenate([[True], sids[1:] != sids[:-1]]))
        bounds = np.concatenate([heads, [len(sids)]])
        return pa.concat_tables(
            pack(g.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(len(heads))
        )

    packed = ds.groupby("bc").map_groups(pack_bucket, batch_format="pyarrow")
    # block_id tie-break: distinct composite sort keys keep the range
    # partitioner's boundaries distinct (duplicate-only keys collapse
    # ranges into empty schema-less partitions) and make order stable
    return packed.sort(["cost", "block_id"], descending=[True, False])


def reblock_dataset(
    limit_blocks: int | None = None,
    simplify: bool = False,
    lines_table: pa.Table | None = None,
):
    """parcels → per-block steiner summaries (lazy Dataset), cost-ordered.

    ``lines_table`` (columns x0, y0, x1, y1, ftype) enables the M11
    typed-lines path: every block's parcel edges classify against the
    nearest line and waterway/natural features become Steiner
    barriers. The table is small (the reference ships one lines file
    per admin cell) and is captured by value into the task closure."""
    packed = packed_blocks_dataset(limit_blocks)
    lines = None
    if lines_table is not None:
        lines = (
            np.stack(
                [lines_table.column(c).to_numpy(zero_copy_only=False)
                 for c in ("x0", "y0", "x1", "y1")],
                axis=1,
            ).astype(np.float64),
            lines_table.column("ftype").to_pylist(),
        )

    def run(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            try:
                out.append(
                    _run_block(
                        row["block_id"], int(row["bx"]), int(row["by"]), row["wkbs"],
                        simplify=simplify, lines=lines,
                    )
                )
            except Exception as ex:  # pragma: no cover - defensive
                out.append(_dead_letter(row["block_id"], f"error:{type(ex).__name__}"))
        if not out:
            return _dead_letter("", "empty").slice(0, 0)
        return pa.concat_tables(out)

    return packed.map_batches(run, batch_format="pyarrow", batch_size=8)


# ---------------------------------------------------------------------------
# interior variant: building-Voronoi parcels + the G17 drop rule

def reblock_interior_block(bx: int, by: int) -> pa.Table:
    """One block, the reference's FULL G17 flow: parcels are the
    building-centroid Voronoi fan clipped to the block (the cadastral
    parcels of `midway_parcelization.R`); buildings whose parcel
    touches the block boundary are dropped
    (`i_reblock.py:168-210` — they already have road access); blocks
    with ≤1 building, or none left interior, are skipped with an
    explicit status row (the reference's bare ``continue``)."""
    from ..geom.core import clip_polygon_convex
    from ..graph.voronoi import voronoi_cells

    block_id = world.block_id_str(bx, by)
    x0, y0, x1, y1 = _block_bounds(bx, by)
    block_arr = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    cents = world.building_centroids_e6(bx, by) / 1e6
    if len(cents) <= 1:
        return _dead_letter(block_id, "skipped:le_one_building")

    cells = {}
    for i, cell in voronoi_cells(cents):
        c = clip_polygon_convex(cell, block_arr)
        if len(c) >= 3:
            cells[i] = c

    def touches_boundary(ring: np.ndarray) -> bool:
        return bool(
            (np.abs(ring[:, 0] - x0) < 1e-9).any()
            or (np.abs(ring[:, 0] - x1) < 1e-9).any()
            or (np.abs(ring[:, 1] - y0) < 1e-9).any()
            or (np.abs(ring[:, 1] - y1) < 1e-9).any()
        )

    interior = [i for i, c in cells.items() if not touches_boundary(c)]
    if not interior:
        return _dead_letter(block_id, "skipped:boundary_access")

    g = PlanarGraph()
    for c in cells.values():
        for i in range(len(c)):
            a = (float(c[i][0]), float(c[i][1]))
            b = (float(c[(i + 1) % len(c)][0]), float(c[(i + 1) % len(c)][1]))
            if a != b:
                g.add_edge(a, b)

    missing, _ = update_edge_types(g, [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])

    from ..geom.hull import outside_terminal

    terminals = [
        g.add_node_to_closest_edge((float(cents[i][0]), float(cents[i][1])), terminal=True)
        for i in interior
    ]
    outside = outside_terminal(block_arr)
    terminals.append(
        g.add_node_to_closest_edge(outside if outside is not None else (x0, y0), terminal=True)
    )

    g = g.largest_component()
    terms = [t for t in terminals if t in g.adj]
    edges = steiner_tree_approx(g, terms)
    return _summary_row(block_id, g, terms, edges, boundary_missing=missing)


def reblock_interior_dataset(limit_blocks: int | None = None):
    """Cost-ordered interior-reblock over the block grid."""
    import ray.data

    n = world.N_BLOCKS
    ids = np.arange(n * n) if limit_blocks is None else np.arange(min(limit_blocks, n * n))
    # one Arrow block (from_items would make one tiny block per item)
    ds = ray.data.from_arrow(
        pa.table({"bx": pa.array(ids // n, pa.int64()), "by": pa.array(ids % n, pa.int64())})
    )

    def add_cost(b: pa.Table) -> pa.Table:
        bxv = b.column("bx").to_numpy(zero_copy_only=False)
        byv = b.column("by").to_numpy(zero_copy_only=False)
        cost = np.array(
            [int(world.n_buildings_for_block(int(x), int(y))) for x, y in zip(bxv, byv)],
            dtype=np.int64,
        )
        return b.append_column("cost", pa.array(cost))

    ds = ds.map_batches(add_cost, batch_format="pyarrow").sort(
        ["cost", "bx", "by"], descending=[True, False, False]
    )

    def run(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            bx, by = int(row["bx"]), int(row["by"])
            try:
                out.append(reblock_interior_block(bx, by))
            except Exception as ex:  # pragma: no cover - defensive
                out.append(_dead_letter(world.block_id_str(bx, by), f"error:{type(ex).__name__}"))
        if not out:
            return _dead_letter("", "empty").slice(0, 0)
        return pa.concat_tables(out)

    return ds.map_batches(run, batch_format="pyarrow", batch_size=8)


# ---------------------------------------------------------------------------
# three-sink writer (S6): summary / steiner lines / terminal points

def run_reblock(out_dir: str, limit_blocks: int | None = None) -> dict:
    """The reference's three-output reblock writer
    (`reblock/i_reblock.py:151-166`): one job → three partitioned
    parquet sinks under ``out_dir`` —

    - ``summary/``          per-block stats row (CheckPointer summary)
    - ``steiner_lines/``    TWO rows per ok block: the new_steiner and
                            existing_steiner MultiLineStrings with
                            columns (geometry, block, line_type,
                            block_w_type) — the reference's exact
                            steiner-frame schema
    - ``terminal_points/``  (geometry MultiPoint, block)

    The solved dataset is small (one row per block), so it is
    materialized once and the three sinks are cheap projections — no
    re-execution of the solver. Size note: one row ≈ 1–10 KB of WKB,
    so the materialization holds ~1 GB per 10⁶ blocks in the OBJECT
    STORE (not the driver heap — blocks stay distributed and spill);
    beyond ~10⁸ blocks switch to three solver passes (or write one
    wide sink and project with three column-pruned reads) instead.
    Idempotent: existing sink dirs are cleared first (write_parquet
    appends, never truncates), so a re-run with the same out_dir
    replaces rather than duplicates."""
    import os
    import shutil

    from ..state.manifest import Manifest

    for sink in ("summary", "steiner_lines", "terminal_points"):
        shutil.rmtree(os.path.join(out_dir, sink), ignore_errors=True)

    solved = reblock_dataset(limit_blocks=limit_blocks).materialize()

    summary = solved.drop_columns(
        ["new_lines_wkb", "existing_lines_wkb", "terminals_wkb"]
    )
    summary.write_parquet(os.path.join(out_dir, "summary"))

    def steiner_rows(batch: pa.Table) -> pa.Table:
        geoms, blocks, types, keys = [], [], [], []
        for row in batch.to_pylist():
            if row["status"] != "ok":
                continue
            for lt, col in (("new_steiner", "new_lines_wkb"),
                            ("existing_steiner", "existing_lines_wkb")):
                geoms.append(row[col])
                blocks.append(row["block_id"])
                types.append(lt)
                keys.append(row["block_id"] + lt)
        return pa.table(
            {
                "geometry": pa.array(geoms, pa.binary()),
                "block": pa.array(blocks, pa.string()),
                "line_type": pa.array(types, pa.string()),
                "block_w_type": pa.array(keys, pa.string()),
            }
        )

    solved.map_batches(steiner_rows, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "steiner_lines")
    )

    def terminal_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch.column("status"), "ok"))
        return pa.table(
            {
                "geometry": t.column("terminals_wkb"),
                "block": t.column("block_id"),
            }
        )

    solved.map_batches(terminal_rows, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "terminal_points")
    )

    n = solved.count()
    manifest = Manifest(out_dir)
    from .flagship import parquet_dir_rows

    for sink in ("summary", "steiner_lines", "terminal_points"):
        # actual per-sink row count (steiner_lines is 2 rows/ok block)
        manifest.mark(
            sink,
            parquet_dir_rows(os.path.join(out_dir, sink)),
            fingerprint=f"limit={limit_blocks}",
        )
    return {"blocks": n, "sinks": 3}
