"""CSV-with-WKT source/sink — the reference's block interchange format.

Reference semantics (`prclz/utils.py:26-43` ``load_blocks``): CSV with a
``geometry`` column holding WKT text and a ``block_id`` column whose
uniqueness is asserted at load. The engine reads it into the same Arrow
schema its parquet ``blocks`` table uses (WKB geometry), distributed via
``ray.data.read_csv`` + a vectorized WKT→WKB ``map_batches`` decode
(S3); ``write_blocks_csv_wkt`` is the matching sink (S4,
`midway/midway_blocks.py:36-40`).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..geom.wkb import parse_wkb, wkb_multipolygon, wkb_polygon

def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """'POLYGON ((x y, x y, ...))' → (N, 2) float64 exterior ring
    (open). Interior rings are not supported by the block format."""
    m = re.match(r"\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", wkt, re.S)
    if not m:
        raise ValueError(f"not a WKT POLYGON: {wkt[:60]!r}")
    if ")" in m.group(1):
        raise ValueError(
            "WKT POLYGON with interior rings is not supported by the "
            f"block format: {wkt[:60]!r}"
        )
    pts = []
    for pair in m.group(1).split(","):
        xs = pair.split()
        pts.append((float(xs[0]), float(xs[1])))
    ring = np.asarray(pts, dtype=np.float64)
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


def _wkt_ring(ring: np.ndarray) -> str:
    """(N, 2) open ring → '(x y, …, x0 y0)' (closed on output).

    9 decimals: the engine quantizes vertices at 1e-9° (graph QUANT),
    so .9f keeps the write→read round-trip lossless on that grid
    (.6f would shift face-traced vertices by up to ~5 cm)."""
    closed = np.vstack([ring, ring[:1]])
    return "(" + ", ".join(f"{x:.9f} {y:.9f}" for x, y in closed) + ")"


def wkt_polygon(ring: np.ndarray, holes=()) -> str:
    """(N, 2) open ring (+ optional hole rings) → WKT POLYGON text."""
    inner = ", ".join(_wkt_ring(r) for r in [ring, *holes])
    return f"POLYGON ({inner})"


def _top_groups(body: str) -> list[str]:
    """Split a WKT body into its depth-0 parenthesized groups —
    '((a), (b)), ((c))' → ['(a), (b)', '(c)']."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(body[start:i])
            elif depth < 0:
                raise ValueError(f"unbalanced WKT: {body[:60]!r}")
    if depth != 0:
        raise ValueError(f"unbalanced WKT: {body[:60]!r}")
    return out


def _parse_ring(text: str) -> np.ndarray:
    pts = []
    for pair in text.split(","):
        xs = pair.split()
        pts.append((float(xs[0]), float(xs[1])))
    ring = np.asarray(pts, dtype=np.float64)
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


def parse_wkt_geometry(wkt: str) -> bytes:
    """WKT POLYGON (with holes) or MULTIPOLYGON → WKB bytes. The
    lossless inverse of ``wkt_geometry`` — blocks tables legitimately
    carry holes and multi-part blocks (the geojson reader and
    ``put_blocks_side`` both accept them), so the CSV interchange must
    round-trip them rather than silently flattening."""
    m = re.match(r"\s*(MULTIPOLYGON|POLYGON)\s*\((.*)\)\s*$", wkt,
                 re.S | re.I)
    if not m:
        raise ValueError(f"not a WKT (MULTI)POLYGON: {wkt[:60]!r}")
    kind, body = m.group(1).upper(), m.group(2)
    if kind == "POLYGON":
        rings = [_parse_ring(g) for g in _top_groups(body)]
        if not rings:
            raise ValueError(f"empty WKT POLYGON: {wkt[:60]!r}")
        return wkb_polygon(rings[0], rings[1:])
    parts = []
    for part in _top_groups(body):
        rings = [_parse_ring(g) for g in _top_groups(part)]
        if not rings:
            raise ValueError(f"empty MULTIPOLYGON part: {wkt[:60]!r}")
        parts.append((rings[0], rings[1:]))
    if not parts:
        raise ValueError(f"empty WKT MULTIPOLYGON: {wkt[:60]!r}")
    return wkb_multipolygon(parts)


def wkt_geometry(wkb: bytes) -> str:
    """WKB (Multi)Polygon → WKT text, holes and all parts preserved
    (the writer-side inverse of ``parse_wkt_geometry``)."""
    gtype, payload = parse_wkb(wkb)
    if gtype == 3:  # POLYGON: payload = [exterior, *holes]
        return wkt_polygon(payload[0], payload[1:])
    if gtype == 6:  # MULTIPOLYGON: payload = [[rings…], …]
        parts = ", ".join(
            "(" + ", ".join(_wkt_ring(r) for r in rings) + ")"
            for rings in payload
        )
        return f"MULTIPOLYGON ({parts})"
    raise ValueError(f"not a (multi)polygon WKB: type {gtype}")


def _decode_batch(batch: pa.Table) -> pa.Table:
    # per-row WKT parse is deliberate: block CSVs are side tables
    # (10^4 polygons), not the page stream
    wkbs = [parse_wkt_geometry(w) for w in batch.column("geometry").to_pylist()]
    cols = {
        name: batch.column(name)
        for name in batch.column_names
        if name != "geometry"
    }
    cols["geom_wkb"] = pa.array(wkbs, pa.binary())
    return pa.table(cols)


def read_blocks_csv_wkt(path: str):
    """CSV+WKT → blocks Dataset (geom_wkb binary). The reference's
    unique-block_id assertion runs distributed: a groupby count whose
    max must be 1."""
    import ray.data

    raw = ray.data.read_csv(path)
    # uniqueness check on the RAW read (block_id only) so consumers do
    # not pay the WKT decode twice
    counts = raw.groupby("block_id").count().to_pandas()
    dupes = counts[counts["count()"] > 1]
    if len(dupes):
        raise ValueError(f"duplicate block_id values: {dupes['block_id'].tolist()[:5]}")
    return raw.map_batches(_decode_batch, batch_format="pyarrow")


def write_blocks_csv_wkt(blocks: pa.Table, path: str) -> None:
    """Blocks table (WKB) → reference-style CSV with WKT geometry."""
    import csv

    names = [n for n in blocks.column_names if n != "geom_wkb"]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(names + ["geometry"])
        wkbs = blocks.column("geom_wkb").to_pylist()
        cols = [blocks.column(n).to_pylist() for n in names]
        for i in range(blocks.num_rows):
            # wkt_geometry preserves holes and MultiPolygon parts —
            # the previous exterior-only emit silently corrupted both
            w.writerow([c[i] for c in cols] + [wkt_geometry(wkbs[i])])
