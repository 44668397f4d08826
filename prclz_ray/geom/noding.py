"""General line-arrangement noding (segment intersection + split).

Splits an arbitrary set of line segments at every pairwise
intersection — proper crossings, T-junctions, endpoint touches, and
collinear overlaps — so that rotation-system face tracing
(`graph/planar.py`) sees the complete planar arrangement. The
reference gets this for free from shapely's ``unary_union``
(`prclz/blocks/extraction.py:39`, `prclz/blocks/methods.py:43-106`);
this engine nodes explicitly in numpy inside each ``map_groups``
partition (one admin cell), so no geometry library is needed and the
work stays distributed.

All pairwise parameters are computed with numpy broadcasting (the
per-partition segment count is street-network scale, hundreds); the
split points from both segments of a pair quantize to the same
1e-9-degree grid the planar graph uses, so shared vertices merge.
"""

from __future__ import annotations

import numpy as np

Coord = tuple[float, float]

_QUANT = 9  # must match graph.planar.QUANT
_PTOL = 1e-9  # parameter-space tolerance for on-segment tests


def node_segments(segs: np.ndarray) -> list[tuple[Coord, Coord]]:
    """Segments ``(n, 2, 2)`` (endpoint pairs) → noded sub-segments.

    Every output sub-segment runs between two consecutive intersection
    / endpoint nodes of the arrangement; zero-length pieces (after
    1e-9° quantization) are dropped.
    """
    segs = np.asarray(segs, dtype=np.float64).reshape(-1, 2, 2)
    n = len(segs)
    if n == 0:
        return []
    p = segs[:, 0, :]
    r = segs[:, 1, :] - segs[:, 0, :]
    seg_len = np.hypot(r[:, 0], r[:, 1])
    live = seg_len > 0.0
    # pairwise: qp[i, j] = p_j - p_i
    qp = p[None, :, :] - p[:, None, :]
    rxs = r[:, None, 0] * r[None, :, 1] - r[:, None, 1] * r[None, :, 0]  # cross(r_i, r_j)
    qpxr_j = qp[:, :, 0] * r[None, :, 1] - qp[:, :, 1] * r[None, :, 0]   # cross(qp, r_j)
    qpxr_i = qp[:, :, 0] * r[:, None, 1] - qp[:, :, 1] * r[:, None, 0]   # cross(qp, r_i)
    # scale-aware denominator threshold: |cross| vs |r_i||r_j|
    den_tol = 1e-12 * np.maximum(seg_len[:, None] * seg_len[None, :], 1e-300)
    proper = np.abs(rxs) > den_tol
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(proper, qpxr_j / np.where(proper, rxs, 1.0), np.nan)
        u = np.where(proper, qpxr_i / np.where(proper, rxs, 1.0), np.nan)
    hit = (
        proper
        & (t >= -_PTOL) & (t <= 1.0 + _PTOL)
        & (u >= -_PTOL) & (u <= 1.0 + _PTOL)
        & live[:, None] & live[None, :]
    )
    np.fill_diagonal(hit, False)

    cuts: list[list[float]] = [[] for _ in range(n)]
    ii, jj = np.nonzero(hit)
    tv = t[ii, jj]
    for k in range(len(ii)):
        cuts[ii[k]].append(float(tv[k]))

    # collinear overlaps: cross(r_i, r_j) ≈ 0 AND cross(qp, r_i) ≈ 0
    area_tol = 1e-12 * np.maximum(seg_len[:, None] ** 2, 1e-300)
    collin = (~proper) & (np.abs(qpxr_i) <= area_tol) & live[:, None] & live[None, :]
    np.fill_diagonal(collin, False)
    if collin.any():
        rr = (r * r).sum(axis=1)  # |r_i|^2
        ci, cj = np.nonzero(collin)
        for i, j in zip(ci.tolist(), cj.tolist()):
            t0 = float(np.dot(segs[j, 0] - p[i], r[i]) / rr[i])
            t1 = float(np.dot(segs[j, 1] - p[i], r[i]) / rr[i])
            lo, hi = min(t0, t1), max(t0, t1)
            if hi < -_PTOL or lo > 1.0 + _PTOL:
                continue  # disjoint collinear
            cuts[i].append(min(max(lo, 0.0), 1.0))
            cuts[i].append(min(max(hi, 0.0), 1.0))

    out: list[tuple[Coord, Coord]] = []
    for i in range(n):
        if not live[i]:
            continue
        ts = np.clip(np.array([0.0, 1.0] + cuts[i]), 0.0, 1.0)
        ts = np.unique(ts)
        pts = p[i][None, :] + ts[:, None] * r[i][None, :]
        pts = np.round(pts, _QUANT)
        prev = (float(pts[0, 0]), float(pts[0, 1]))
        for k in range(1, len(pts)):
            cur = (float(pts[k, 0]), float(pts[k, 1]))
            if cur != prev:
                out.append((prev, cur))
                prev = cur
    return out
