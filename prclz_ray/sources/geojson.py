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


def _explode_parts(geom: dict, promote_lines: bool) -> list[tuple[str, bytes]]:
    """One geometry → its single-part pieces as (type, wkb) rows.

    ``promote_lines`` is the reference's building consolidation
    (`osm-etl/consolidate_buildings.py:11-28`, M10): buildings mapped
    as (closed) ways arrive as LineStrings; any line with ≥ 3 distinct
    coordinates is promoted to the Polygon over its ring (shapely
    ``Polygon(linestring)`` semantics — auto-closing), shorter lines
    are dropped. Multi* geometries explode to one row per part
    (``.explode()``)."""
    t = geom["type"]
    c = geom["coordinates"]
    parts: list[tuple[str, object]] = []
    if t.startswith("Multi"):
        parts = [(t[5:], part) for part in c]
    else:
        parts = [(t, c)]
    out: list[tuple[str, bytes]] = []
    for pt, pc in parts:
        if promote_lines and pt == "LineString":
            ring = np.asarray(pc, dtype=np.float64)
            if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
                ring = ring[:-1]
            if len(np.unique(ring, axis=0)) < 3:
                continue  # reference's to_polygon ValueError → dropped
            out.append(("Polygon", wkb_polygon(ring)))
        elif pt == "Polygon":
            ext = np.asarray(pc[0], dtype=np.float64)
            holes = [np.asarray(h, dtype=np.float64) for h in pc[1:]]
            out.append(("Polygon", wkb_polygon(ext, holes)))
        else:
            out.append((pt, _geom_to_wkb({"type": pt, "coordinates": pc})))
    return out


def _infer_prop_type(values: list) -> pa.DataType:
    """One property's Arrow type from sampled non-null values: bool /
    int64 / float64 when homogeneous-numeric, else string (mixed or
    structured values JSON-encode into it)."""
    kinds = set()
    for v in values:
        if isinstance(v, bool):  # before int — bool IS an int subclass
            kinds.add("bool")
        elif isinstance(v, int):
            kinds.add("int")
        elif isinstance(v, float):
            kinds.add("float")
        else:
            kinds.add("str")
    if kinds == {"bool"}:
        return pa.bool_()
    if kinds == {"int"}:
        return pa.int64()
    if kinds <= {"int", "float"} and kinds:
        return pa.float64()
    return pa.string()


def _make_decoder(keys: tuple, types: dict | None = None,
                  promote_lines: bool = False, explode: bool = False):
    """Decoder with a FIXED property-column set AND fixed per-column
    types so every batch emits the same schema (per-batch inference
    would let two batches of one file produce int64 vs string for the
    same key — a downstream-concat landmine; fixed NAMES alone do not
    fix it). Keys missing from ``types`` default to string, with
    non-string values JSON-encoded; a value that violates a sampled
    numeric type raises a clear error naming the key instead of
    drifting the schema. Null geometry (valid GeoJSON) yields null geom
    columns. With ``explode`` / ``promote_lines`` a feature may yield
    several rows (or none) — properties replicate."""
    types = types or {}

    def decode(batch: pa.Table) -> pa.Table:
        # per-feature json.loads is deliberate: GeoJSON is a SIDE-TABLE
        # source (fixture/boundary scale), never the page stream
        feats = [json.loads(s) for s in batch.column("text").to_pylist() if s.strip()]
        props: dict[str, list] = {k: [] for k in keys}
        wkbs, gtypes = [], []
        for f in feats:
            geom = f.get("geometry")
            p = f.get("properties") or {}
            if geom is None:
                rows = [(None, None)]
            elif explode or promote_lines:
                rows = _explode_parts(geom, promote_lines)
            else:
                rows = [(geom["type"], _geom_to_wkb(geom))]
            for gt, wkb in rows:
                gtypes.append(gt)
                wkbs.append(wkb)
                for k in keys:
                    props[k].append(p.get(k))
        cols = {}
        for k, v in sorted(props.items()):
            t = types.get(k, pa.string())
            if pa.types.is_string(t):
                v = [
                    x if x is None or isinstance(x, str) else json.dumps(x)
                    for x in v
                ]
            try:
                cols[k] = pa.array(v, type=t)
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError) as e:
                raise ValueError(
                    f"geojson property {k!r}: a value is incompatible "
                    f"with its sampled type {t} ({e}) — the type was "
                    "inferred from the first 1000 lines; for files "
                    "whose late lines change a property's type, "
                    "pre-clean the file or drop the key from "
                    "properties= (string columns accept anything)"
                ) from None
        cols["geom_type"] = pa.array(gtypes, pa.string())
        cols["geom_wkb"] = pa.array(wkbs, pa.binary())
        return pa.table(cols)

    return decode


def read_geojson_features(
    path: str,
    properties: list[str] | None = None,
    promote_lines: bool = False,
    explode: bool = False,
):
    """NDJSON GeoJSON features → Dataset (properties + geom_wkb).

    ``properties`` fixes the property-column set; when omitted it is
    inferred from a driver-side sample of the first 1000 lines (good
    enough for homogeneous feature files; pass it explicitly when late
    lines may introduce new keys). Property TYPES are always inferred
    from the same sample (bool/int64/float64 when homogeneous, else
    string) so every batch emits one schema — keys absent from the
    sample read as string. ``promote_lines`` promotes (closed)
    LineStrings to Polygons and ``explode`` splits Multi* geometries —
    the reference's building consolidation (M10)."""
    import ray.data

    import os

    # ray.data.read_text accepts dirs and path lists; the driver-side
    # type sampler must follow the same expansion (first leaf file)
    # instead of crashing on open()
    sample_path = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(sample_path):
        leaves = sorted(
            f for f in os.listdir(sample_path)
            if not f.startswith(".")
            and os.path.isfile(os.path.join(sample_path, f))
        )
        if not leaves:
            raise FileNotFoundError(
                f"read_geojson_features: no files under directory {sample_path!r}"
            )
        sample_path = os.path.join(sample_path, leaves[0])

    sampled: dict[str, list] = {}
    with open(sample_path) as f:
        for i, line in enumerate(f):
            if i >= 1000:
                break
            if line.strip():
                for k, v in (json.loads(line).get("properties") or {}).items():
                    if v is not None:
                        sampled.setdefault(k, []).append(v)
    if properties is None:
        properties = sorted(sampled)
    types = {
        k: _infer_prop_type(v)
        for k, v in sampled.items()
        if k in set(properties)
    }
    return ray.data.read_text(path).map_batches(
        _make_decoder(tuple(properties), types=types,
                      promote_lines=promote_lines, explode=explode),
        batch_format="pyarrow",
    )
