"""Property-based tests (hypothesis) for the geometry kernel layer —
the engine's answer to the reference's assert-script unit tests
(`prclz/test_topology.py`), generalized over random inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from prclz_ray.geom.core import (
    clip_polygon_convex,
    point_in_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
)
from prclz_ray.geom.strtree import STRtree
from prclz_ray.geom.wkb import parse_wkb, wkb_multilinestring, wkb_polygon
from prclz_ray.graph.voronoi import voronoi_cells

coord = st.floats(min_value=-50, max_value=50, allow_nan=False)


@st.composite
def boxes(draw, n_min=1, n_max=40):
    n = draw(st.integers(n_min, n_max))
    out = []
    for _ in range(n):
        x = draw(coord)
        y = draw(coord)
        w = draw(st.floats(0.01, 5))
        h = draw(st.floats(0.01, 5))
        out.append([x, y, x + w, y + h])
    return np.array(out, dtype=np.float64)


@given(boxes(), st.lists(st.tuples(coord, coord), min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_strtree_query_points_matches_bruteforce(bb, pts):
    tree = STRtree(bb)
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    pi, ci = tree.query_points(px, py)
    got = set(zip(pi.tolist(), ci.tolist()))
    want = {
        (i, j)
        for i in range(len(pts))
        for j in range(len(bb))
        if bb[j, 0] <= px[i] <= bb[j, 2] and bb[j, 1] <= py[i] <= bb[j, 3]
    }
    assert got == want


@st.composite
def convex_polys(draw):
    """Random GENUINELY convex polygon: convex hull (monotone chain) of
    random points — clip-area invariants only hold for convex inputs."""
    n = draw(st.integers(4, 12))
    pts = np.array(
        [[draw(st.floats(-5, 5)), draw(st.floats(-5, 5))] for _ in range(n)]
    )
    pts = np.unique(pts, axis=0)
    if len(pts) < 3:
        pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        h = []
        for p in points:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    if len(hull) < 3:  # collinear inputs
        hull = np.array([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]])
    return hull


@given(convex_polys(), st.lists(st.tuples(coord, coord), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_vectorized_pip_matches_scalar(poly, pts):
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    vec = points_in_polygon(poly, px, py)
    for i, (x, y) in enumerate(pts):
        assert vec[i] == point_in_polygon(poly, x, y)


@given(convex_polys())
@settings(max_examples=60, deadline=None)
def test_wkb_polygon_roundtrip(poly):
    kind, rings = parse_wkb(wkb_polygon(poly))
    ring = rings[0]
    # ring is closed on write; compare open part
    assert np.allclose(ring[: len(poly)], poly)


@given(st.lists(st.tuples(st.floats(0, 10), st.floats(0, 10)),
                min_size=2, max_size=15, unique=True))
@settings(max_examples=40, deadline=None)
def test_voronoi_cells_contain_their_anchors(sites):
    pts = np.array(sites, dtype=np.float64)
    cells = voronoi_cells(pts)
    for idx, ring in cells:
        if polygon_area(ring) < 1e-9:
            continue
        cx, cy = polygon_centroid(ring)
        # the anchor is the nearest site to any interior point of its cell
        d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
        assert d[idx] <= d.min() + 1e-6


@given(convex_polys(), convex_polys())
@settings(max_examples=60, deadline=None)
def test_convex_clip_area_bounds(a, b):
    clipped = clip_polygon_convex(a, b)
    if len(clipped) >= 3:
        ca = polygon_area(clipped)
        assert ca <= polygon_area(a) + 1e-6
        assert ca <= polygon_area(b) + 1e-6
        assert ca >= -1e-9


def test_cell_parent_containment():
    from prclz_ray.geom.cells import (
        RES_FINE,
        RES_PARTITION,
        cell_bounds,
        cell_id_e6,
        cell_parent,
    )

    rng = np.random.default_rng(7)
    lat = rng.integers(0, 10_000_000, 200)
    lon = rng.integers(0, 10_000_000, 200)
    fine = cell_id_e6(lat, lon, RES_FINE)
    coarse = cell_id_e6(lat, lon, RES_PARTITION)
    assert (cell_parent(fine, RES_PARTITION) == coarse).all()
    for cid in np.unique(fine)[:20]:
        lo0, la0, lo1, la1 = cell_bounds(cid)
        plo0, pla0, plo1, pla1 = cell_bounds(cell_parent(cid, RES_PARTITION))
        assert plo0 <= lo0 and pla0 <= la0 and lo1 <= plo1 and la1 <= pla1


def test_cell_id_matches_sql_fragment():
    """The numpy cell id and the SQL oracle fragment agree on random
    coordinates (the partitioning key is computed identically on both
    sides of the correctness gate)."""
    import duckdb

    from prclz_ray.geom.cells import RES_PARTITION, cell_id_e6
    from prclz_ray.queries import _CELL_SQL

    rng = np.random.default_rng(11)
    lat = rng.integers(0, 10_000_000, 500).astype(np.int64)
    lon = rng.integers(0, 10_000_000, 500).astype(np.int64)
    want = cell_id_e6(lat, lon, RES_PARTITION)
    con = duckdb.connect()
    import pandas as pd

    df = pd.DataFrame({"lat_e6": lat, "lon_e6": lon, "has_geo": True})
    con.register("pts", df)
    got = con.execute(
        f"SELECT CAST({_CELL_SQL} AS BIGINT) FROM pts"
    ).df().iloc[:, 0].to_numpy()
    assert (got == want).all()


def test_mercator_tile_roundtrip():
    from prclz_ray.geom.tiles import mercator_tile, mercator_tile_bounds

    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 100)
    lon = rng.uniform(-179, 179, 100)
    for z in (2, 6):
        x, y = mercator_tile(lat, lon, z)
        for i in range(0, 100, 13):
            lo0, la0, lo1, la1 = mercator_tile_bounds(int(x[i]), int(y[i]), z)
            assert lo0 - 1e-9 <= lon[i] <= lo1 + 1e-9
            assert la0 - 1e-6 <= lat[i] <= la1 + 1e-6


@given(st.integers(0, 10_000))
@settings(max_examples=25, deadline=None)
def test_steiner_tree_is_acyclic_and_spanning(seed):
    """Random planar-ish graphs: the 2-approx output is a tree (acyclic)
    spanning all terminals of its component."""
    from prclz_ray.graph.planar import PlanarGraph
    from prclz_ray.graph.steiner import steiner_tree_approx

    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 10, (10, 2))
    g = PlanarGraph()
    for i in range(10):
        for j in range(i + 1, 10):
            if rng.random() < 0.35:
                g.add_edge(tuple(pts[i]), tuple(pts[j]))
    g = g.largest_component()
    terms = [t for t in (tuple(p) for p in pts[:5]) if t in g.adj]
    if len(terms) < 2:
        return
    edges = steiner_tree_approx(g, terms)
    nodes = set()
    adj = {}
    for a, b in edges:
        nodes |= {a, b}
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert len(edges) <= max(len(nodes) - 1, 0)  # acyclic
    stack, seen = [terms[0]], {terms[0]}
    while stack:
        u = stack.pop()
        for v in adj.get(u, ()):
            if v not in seen:
                seen.add(v)
                stack.append(v)
    assert set(terms) <= seen


# ---------------------------------------------------------------------------
# round-2 kernels: noding, booleans, hull, hashing


def _rand_convex(rng, n=6, cx=0.0, cy=0.0, r=1.0):
    """A genuinely CONVEX ring: hull of random points (sorted-angle +
    random-radius rings are star-shaped, not convex)."""
    from prclz_ray.geom.hull import convex_hull

    pts = np.stack(
        [cx + rng.uniform(-r, r, n + 4), cy + rng.uniform(-r, r, n + 4)], axis=1
    )
    return convex_hull(pts)


@given(st.integers(0, 200))
@settings(deadline=None, max_examples=40)
def test_noding_preserves_length(seed):
    """Sum of noded sub-segment lengths equals the input lengths
    (nothing lost or duplicated per segment, collinear overlaps aside)."""
    from prclz_ray.geom.noding import node_segments

    rng = np.random.default_rng(seed)
    segs = rng.uniform(-1, 1, (6, 2, 2))
    total_in = sum(float(np.hypot(*(s[1] - s[0]))) for s in segs)
    total_out = sum(
        float(np.hypot(b[0] - a[0], b[1] - a[1])) for a, b in node_segments(segs)
    )
    # general position: no collinear overlaps with probability 1
    assert abs(total_in - total_out) < 1e-6


@given(st.integers(0, 200))
@settings(deadline=None, max_examples=40)
def test_polygon_intersection_matches_convex_clip(seed):
    """For convex inputs the arrangement boolean equals the exact
    Sutherland-Hodgman area."""
    from prclz_ray.geom.boolean import polygon_intersection
    from prclz_ray.geom.core import clip_polygon_convex, polygon_area

    rng = np.random.default_rng(seed)
    a = _rand_convex(rng, 6, 0.0, 0.0, 1.0)
    b = _rand_convex(rng, 6, rng.uniform(-0.8, 0.8), rng.uniform(-0.8, 0.8), 1.0)
    want = polygon_area(clip_polygon_convex(a, b)) if len(clip_polygon_convex(a, b)) >= 3 else 0.0
    got = sum(polygon_area(p) for p in polygon_intersection(a, b))
    assert abs(got - want) < 1e-7  # noding quantizes at 1e-9 deg


@given(st.integers(0, 200))
@settings(deadline=None, max_examples=30)
def test_inset_polygon_matches_inset_convex(seed):
    """Convex fast path and the general mitre-offset arrangement path
    agree (run the general path by disabling the convexity shortcut)."""
    from prclz_ray.geom import boolean as B
    from prclz_ray.geom.core import inset_convex, polygon_area

    rng = np.random.default_rng(seed)
    ring = _rand_convex(rng, 7, 0.0, 0.0, 1.0)
    eps = 0.05
    want = polygon_area(inset_convex(ring, eps))
    orig = B.is_convex
    try:
        B.is_convex = lambda r, tol=0.0: False  # force the general path
        parts = B.inset_polygon(ring, eps)
    finally:
        B.is_convex = orig
    got = sum(polygon_area(p) for p in parts)
    assert abs(got - want) < 1e-7  # noding quantizes at 1e-9 deg


@given(st.integers(0, 200))
@settings(deadline=None, max_examples=30)
def test_polygon_union_bounds_and_idempotence(seed):
    """max(area) ≤ union ≤ Σ areas; union with itself changes nothing."""
    from prclz_ray.geom.boolean import polygon_union
    from prclz_ray.geom.core import polygon_area

    rng = np.random.default_rng(seed)
    rings = [
        _rand_convex(rng, 5, rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), 0.8)
        for _ in range(3)
    ]
    areas = [polygon_area(r) for r in rings]
    u = sum(polygon_area(p) for p in polygon_union(rings))
    assert max(areas) - 1e-9 <= u <= sum(areas) + 1e-9
    u2 = sum(polygon_area(p) for p in polygon_union(rings + rings))
    assert abs(u2 - u) < 1e-9


@given(st.integers(0, 500))
@settings(deadline=None, max_examples=40)
def test_min_rotated_rectangle_contains_hull(seed):
    from prclz_ray.geom.boolean import winding_number
    from prclz_ray.geom.core import polygon_area
    from prclz_ray.geom.hull import convex_hull, minimum_rotated_rectangle

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (8, 2))
    hull = convex_hull(pts)
    rect = minimum_rotated_rectangle(pts)
    if len(hull) >= 3:
        assert polygon_area(rect) >= polygon_area(hull) - 1e-12
    # every input point inside (or on) the rectangle: shrink test via
    # winding of a slightly inflated rect
    c = rect.mean(axis=0)
    grown = c + (rect - c) * (1 + 1e-9)
    for p in pts:
        assert winding_number(grown, float(p[0]), float(p[1])) != 0


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40), max_size=8))
@settings(deadline=None, max_examples=40)
def test_hash_strings_matches_scalar_reference(strs):
    from prclz_ray.stages.hashing import A_CHAR, P31, hash_strings

    import pyarrow as pa

    got = hash_strings(pa.array(strs, pa.string()))

    def ref(s):
        h = 0
        for ch in s.encode():
            h = (h * A_CHAR + ch + 1) % P31
        return h

    assert [int(x) for x in got] == [ref(s) for s in strs]


def test_hash_strings_rejects_non_ascii():
    import pyarrow as pa
    import pytest as _pytest

    from prclz_ray.stages.hashing import hash_strings

    with _pytest.raises(ValueError):
        hash_strings(pa.array(["café"]))


def test_minhash_matrix_matches_bruteforce():
    from prclz_ray.stages.dedup import N_HASHES, minhash_matrix, _shingle_arrays
    from prclz_ray.stages.hashing import P31, SALT_A, SALT_B, hash_strings

    import pyarrow as pa

    texts = ["a b c d e", "a b", "x y z w a b c", ""]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)})
    sig = minhash_matrix(t)

    def shingles(s):
        w = s.split(" ")
        return [" ".join(w[i:i + 3]) for i in range(len(w) - 2)] if len(w) >= 3 else [" ".join(w)]

    for i, s in enumerate(texts):
        hs = [int(x) for x in hash_strings(pa.array(shingles(s)))]
        for k in range(N_HASHES):
            want = min((SALT_A[k] * h + SALT_B[k]) % P31 for h in hs)
            assert sig[i, k] == want


def test_boolean_inclusion_exclusion_nonconvex():
    """|A∩B| + |A∪B| = |A| + |B| exactly, over random simple
    NON-convex (star) polygons — union holes accounted via
    return_holes. 60 seeded trials."""
    from prclz_ray.geom.boolean import polygon_intersection, polygon_union
    from prclz_ray.geom.core import polygon_area

    for seed in range(60):
        rng = np.random.default_rng(1000 + seed)

        def star(n, cx, cy, r):
            ang = (np.arange(n) + rng.uniform(0.05, 0.95, n)) / n * 2 * np.pi
            rad = rng.uniform(0.2 * r, r, n)
            return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)

        a = star(int(rng.integers(3, 12)), 0, 0, 1.0)
        b = star(int(rng.integers(3, 12)), rng.uniform(-1, 1), rng.uniform(-1, 1), 1.0)
        ia, ib = polygon_area(a), polygon_area(b)
        s = sum(polygon_area(p) for p in polygon_intersection(a, b))
        outers, holes = polygon_union([a, b], return_holes=True)
        u = sum(polygon_area(p) for p in outers) - sum(polygon_area(h) for h in holes)
        assert s <= min(ia, ib) + 1e-6
        assert abs((s + u) - (ia + ib)) < 1e-5


def test_noding_face_tracing_fuzz():
    """Random segment soups: noding + face tracing + inset never crash
    and produce sane areas. 60 seeded trials."""
    from prclz_ray.geom.boolean import inset_polygon
    from prclz_ray.geom.core import polygon_area, polygon_signed_area2
    from prclz_ray.geom.noding import node_segments
    from prclz_ray.graph.planar import PlanarGraph

    for seed in range(60):
        rng = np.random.default_rng(seed)
        segs = rng.uniform(0, 1, (int(rng.integers(5, 20)), 2, 2))
        g = PlanarGraph()
        for a, b in node_segments(segs):
            g.add_edge(a, b)
        for f in g.trace_faces():
            ring = np.array([e[0] for e in f])
            if len(ring) >= 3 and polygon_signed_area2(ring) > 0:
                a0 = polygon_area(ring)
                assert a0 <= 1.0 + 1e-9
                for ins in inset_polygon(ring, 0.01):
                    assert polygon_area(ins) <= a0 + 1e-9


# --- link-graph PageRank: local solver vs pure-python reference -----------

@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=60, deadline=None)
def test_pagerank_local_matches_naive_reference(pairs):
    import pyarrow as pa

    from prclz_ray.stages import curation as C

    links = [(f"h{a}", f"h{b}") for a, b in pairs if a != b]
    if not links:
        return
    # naive dict reference of the exact-integer contract
    w, outw, hosts = {}, {}, set()
    for s, d in links:
        w[(s, d)] = w.get((s, d), 0) + 1
        outw[s] = outw.get(s, 0) + 1
        hosts.update((s, d))
    pr = {h: C.PR_SCALE for h in hosts}
    for _ in range(C.PR_ITERS):
        acc = {h: 0 for h in hosts}
        for (s, d), wt in w.items():
            acc[d] += (C.PR_DAMP_NUM * pr[s] * wt) // (C.PR_DAMP_DEN * outw[s])
        pr = {h: C.PR_BASE + acc[h] for h in hosts}

    wed = {}
    for s, d in links:
        wed[(s, d)] = wed.get((s, d), 0) + 1
    t = pa.table(
        {
            "src": pa.array([k[0] for k in wed]),
            "dst": pa.array([k[1] for k in wed]),
            "w": pa.array(list(wed.values()), pa.int64()),
        }
    )
    out = C._pr_local(t)
    got = dict(
        zip(out.column("host").to_pylist(), out.column("pr").to_pylist())
    )
    assert got == pr


@given(st.lists(st.text(alphabet=" \tabcXYZ.", max_size=30), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_normalize_text_idempotent(texts):
    # normalize(normalize(x)) == normalize(x): lowercase + whitespace
    # collapse + trim is a projection
    import pyarrow as pa
    import pyarrow.compute as pc

    def norm(col):
        collapsed = pc.replace_substring_regex(pc.utf8_lower(col), r"[ \t]+", " ")
        return pc.utf8_trim(collapsed, " \t")

    col = pa.array(texts, pa.string())
    once = norm(col)
    twice = norm(once)
    assert once.to_pylist() == twice.to_pylist()


def test_surprisal_split_invariant(ray_session):
    import ray

    import pyarrow as pa

    from prclz_ray.stages import curation as C
    from prclz_ray.stages.hashing import hash_strings62

    vh = hash_strings62(pa.array(["a", "b"]))
    vr = np.array([1, 2], dtype=np.int64)
    order = np.argsort(vh)
    ref = ray.put((vh[order], vr[order]))
    fn = C.make_surprisal_fn(ref, k=2)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b", "b z", "z z z", "a"]),
        }
    )
    whole = fn(t)
    parts = pa.concat_tables([fn(t.slice(0, 1)), fn(t.slice(1, 2)), fn(t.slice(3, 1))])
    assert whole.to_pylist() == parts.to_pylist()


@given(
    st.lists(st.integers(0, 255), min_size=0, max_size=2000),
    st.integers(1, 900),
)
@settings(max_examples=60, deadline=None)
def test_rle_roundtrip_property(vals, run_len):
    """decode(encode(v)) == v for arbitrary byte streams, including
    runs longer than the 255-length chunk limit (the split path)."""
    import numpy as np

    from prclz_ray.stages.media import _rle_encode, rle_decode

    v = np.array(vals, dtype=np.uint8)
    if len(v):
        # splice in a long run to force the chunk-split path
        v = np.concatenate([v, np.full(run_len, v[0], np.uint8)])
    out = rle_decode(_rle_encode(v))
    assert np.array_equal(out, v)
    # encode never emits a zero run length (would decode to nothing)
    enc = np.frombuffer(_rle_encode(v), np.uint8)
    assert (enc[0::2] > 0).all()
