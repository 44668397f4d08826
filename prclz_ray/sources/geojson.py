"""Newline-delimited GeoJSON source — the reference's feature format
(`midway/midway_blocks.py:59`, `prclz/utils.py:52-56`).

Each line is one Feature; geometry Point / Polygon / LineString becomes
WKB, properties become columns. Distributed read: ``ray.data.read_text``
→ vectorized-enough JSON decode per batch (stdlib json per line; at
100 TB swap in a simdjson-style decoder — same stage shape).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geom.wkb import wkb_linestring, wkb_point, wkb_polygon


def _geom_to_wkb(geom: dict) -> bytes:
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return wkb_point(c[0], c[1])
    if t == "LineString":
        return wkb_linestring(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        ext = np.asarray(c[0], dtype=np.float64)
        holes = [np.asarray(h, dtype=np.float64) for h in c[1:]]
        return wkb_polygon(ext, holes)
    raise ValueError(f"unsupported geometry type {t}")


def _decode_lines(batch: pa.Table) -> pa.Table:
    feats = [json.loads(s) for s in batch.column("text").to_pylist() if s.strip()]
    props: dict[str, list] = {}
    wkbs, types = [], []
    keys: set = set()
    for f in feats:
        keys |= set((f.get("properties") or {}).keys())
    for f in feats:
        g = f["geometry"]
        wkbs.append(_geom_to_wkb(g))
        types.append(g["type"])
        p = f.get("properties") or {}
        for k in keys:
            props.setdefault(k, []).append(p.get(k))
    cols = {k: pa.array(v) for k, v in sorted(props.items())}
    cols["geom_type"] = pa.array(types, pa.string())
    cols["geom_wkb"] = pa.array(wkbs, pa.binary())
    return pa.table(cols)


def read_geojson_features(path: str):
    """NDJSON GeoJSON features → Dataset (properties + geom_wkb)."""
    import ray.data

    return ray.data.read_text(path).map_batches(_decode_lines, batch_format="pyarrow")
