"""Minimal WKB codec (little-endian ISO WKB) for the geometry types the
engine stores in Arrow ``binary`` columns.

Replaces the reference's WKT-in-CSV interchange (`prclz/utils.py:26-43`)
with the standard binary encoding, so geometry crosses Ray task
boundaries as zero-copy Arrow binary instead of python objects.

Supported: Point (1), LineString (2), Polygon (3, with holes),
MultiPoint (4), MultiLineString (5), MultiPolygon (6).
"""

from __future__ import annotations

import struct

import numpy as np

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")

POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 1, 2, 3, 4, 5, 6


def _coords_bytes(coords: np.ndarray) -> bytes:
    a = np.ascontiguousarray(np.asarray(coords, dtype="<f8"))
    return _U32.pack(len(a)) + a.tobytes()


def wkb_point(x: float, y: float) -> bytes:
    return _HDR.pack(1, POINT) + struct.pack("<dd", x, y)


def wkb_linestring(coords) -> bytes:
    return _HDR.pack(1, LINESTRING) + _coords_bytes(coords)


def _close_ring(coords: np.ndarray) -> np.ndarray:
    coords = np.asarray(coords, dtype=np.float64)
    if len(coords) == 0 or np.array_equal(coords[0], coords[-1]):
        return coords
    return np.vstack([coords, coords[:1]])


def wkb_polygon(exterior, holes=()) -> bytes:
    rings = [_close_ring(exterior)] + [_close_ring(h) for h in holes]
    body = _U32.pack(len(rings)) + b"".join(_coords_bytes(r) for r in rings)
    return _HDR.pack(1, POLYGON) + body


def wkb_multipoint(coords) -> bytes:
    pts = [wkb_point(x, y) for x, y in np.asarray(coords, dtype=np.float64)]
    return _HDR.pack(1, MULTIPOINT) + _U32.pack(len(pts)) + b"".join(pts)


def wkb_multilinestring(lines) -> bytes:
    ls = [wkb_linestring(l) for l in lines]
    return _HDR.pack(1, MULTILINESTRING) + _U32.pack(len(ls)) + b"".join(ls)


def wkb_multipolygon(polygons) -> bytes:
    """``polygons`` is a list of (exterior, holes) pairs or bare exteriors."""
    parts = []
    for p in polygons:
        # an (exterior, holes) pair: element 0 is a ring (rows are
        # coordinate pairs), element 1 a sequence of rings
        is_pair = (
            isinstance(p, tuple)
            and len(p) == 2
            and len(p[0]) > 0
            and not np.isscalar(p[0][0])
            and len(p[0][0]) == 2
        )
        if is_pair:
            parts.append(wkb_polygon(p[0], p[1]))
        else:
            parts.append(wkb_polygon(p))
    return _HDR.pack(1, MULTIPOLYGON) + _U32.pack(len(parts)) + b"".join(parts)


def _read_coords(buf: memoryview, off: int):
    (n,) = _U32.unpack_from(buf, off)
    off += 4
    a = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return a, off + 16 * n


def parse_wkb(buf: bytes):
    """Decode one WKB geometry → (geom_type:int, payload).

    payload by type: Point → (x, y); LineString → (N,2) array;
    Polygon → [ring arrays] (exterior first); Multi* → list of payloads.
    """
    mv = memoryview(buf)
    return _parse(mv, 0)[0]


def _parse(mv: memoryview, off: int):
    byte_order, gtype = _HDR.unpack_from(mv, off)
    if byte_order != 1:
        raise ValueError("big-endian WKB not supported")
    off += _HDR.size
    if gtype == POINT:
        x, y = struct.unpack_from("<dd", mv, off)
        return (POINT, (x, y)), off + 16
    if gtype == LINESTRING:
        a, off = _read_coords(mv, off)
        return (LINESTRING, a), off
    if gtype == POLYGON:
        (nrings,) = _U32.unpack_from(mv, off)
        off += 4
        rings = []
        for _ in range(nrings):
            r, off = _read_coords(mv, off)
            rings.append(r)
        return (POLYGON, rings), off
    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (nparts,) = _U32.unpack_from(mv, off)
        off += 4
        parts = []
        for _ in range(nparts):
            (sub, payload), off = _parse(mv, off)
            parts.append(payload)
        return (gtype, parts), off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def polygon_exterior(buf: bytes) -> np.ndarray:
    """Convenience: exterior ring of a (Multi)Polygon WKB as (N,2)."""
    gtype, payload = parse_wkb(buf)
    if gtype == POLYGON:
        return payload[0]
    if gtype == MULTIPOLYGON:
        return payload[0][0]
    raise ValueError(f"not a polygon: type {gtype}")
