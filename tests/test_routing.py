"""Exact segment↔rectangle routing predicate + bbox-cover explode."""

from fractions import Fraction

import numpy as np
import pyarrow as pa

from prclz_ray.stages import routing as R


def _ref_mask(px, py, qx, qy, x0, y0, x1, y1):
    """Rational-arithmetic reference: positive-length intersection of
    segment with closed rect via exact Liang-Barsky."""
    t0, t1 = Fraction(0), Fraction(1)
    for p, d, lo, hi in ((px, qx - px, x0, x1), (py, qy - py, y0, y1)):
        if d == 0:
            if not (lo <= p <= hi):
                return False
            continue
        a, b = Fraction(lo - p, d), Fraction(hi - p, d)
        if a > b:
            a, b = b, a
        t0, t1 = max(t0, a), min(t1, b)
    return t1 > t0


def test_segment_rect_mask_matches_rational_reference():
    rng = np.random.RandomState(42)
    n = 4000
    px, py, qx, qy = (rng.randint(-50, 50, n).astype(np.int64) for _ in range(4))
    x0 = rng.randint(-40, 30, n).astype(np.int64)
    y0 = rng.randint(-40, 30, n).astype(np.int64)
    x1 = x0 + rng.randint(1, 30, n)
    y1 = y0 + rng.randint(1, 30, n)
    got = R.segment_rect_mask(px, py, qx, qy, x0, y0, x1, y1)
    exp = [
        _ref_mask(*(int(v[i]) for v in (px, py, qx, qy, x0, y0, x1, y1)))
        for i in range(n)
    ]
    assert got.tolist() == exp


def test_segment_rect_edge_cases():
    # segment running along the rect's edge → positive overlap (in)
    assert R.segment_rect_mask(*map(np.int64, (0, 0, 10, 0, 0, 0, 10, 10)))
    # corner graze only → out
    assert not R.segment_rect_mask(*map(np.int64, (10, 10, 20, 20, 0, 0, 10, 10)))
    # degenerate vertical on the right wall → in
    assert R.segment_rect_mask(*map(np.int64, (10, 2, 10, 8, 0, 0, 10, 10)))
    # degenerate vertical just outside → out
    assert not R.segment_rect_mask(*map(np.int64, (11, 2, 11, 8, 0, 0, 10, 10)))


def test_route_fn_empty_batch():
    empty = pa.table(
        {
            "line_id": pa.array([], pa.string()),
            "x0_e6": pa.array([], pa.int64()),
            "y0_e6": pa.array([], pa.int64()),
            "x1_e6": pa.array([], pa.int64()),
            "y1_e6": pa.array([], pa.int64()),
        }
    )
    out = R.make_route_fn(100, 3)(empty)
    assert out.num_rows == 0 and out.column_names == ["line_id", "gadm"]


def test_route_fn_grid_lines_cover_both_sides():
    # one vertical line on the border x=100 of a 100-pitch 3x3 grid:
    # belongs to cells (0,*) and (1,*) it spans
    batch = pa.table(
        {
            "line_id": pa.array(["L"]),
            "x0_e6": pa.array([100], pa.int64()),
            "y0_e6": pa.array([0], pa.int64()),
            "x1_e6": pa.array([100], pa.int64()),
            "y1_e6": pa.array([250], pa.int64()),
        }
    )
    out = R.make_route_fn(100, 3)(batch)
    got = sorted(out.column("gadm").to_pylist())
    assert got == ["G0_0", "G0_1", "G0_2", "G1_0", "G1_1", "G1_2"]
