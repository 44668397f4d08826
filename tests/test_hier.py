"""Two-level IVF quantizer (the scale path past MAX_TRAIN_LISTS):
distributed fine-level training + two-level top-p assignment."""

import numpy as np
import pyarrow as pa
import pytest


def _clustered_embeddings(n_clusters=40, per=400, d=64, n_dups=150, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = np.repeat(centers, per, axis=0) + 0.15 * rng.standard_normal((n_clusters * per, d))
    # plant near-dup pairs: vector i and its copy n//2+i with tiny noise
    n = len(base)
    dup_src = rng.choice(n // 2, size=n_dups, replace=False)
    pairs = []
    for j, s in enumerate(sorted(dup_src)):
        t = n // 2 + j
        base[t] = base[s] + 0.01 * rng.standard_normal(d)
        pairs.append((s, t))
    emb = base / np.linalg.norm(base, axis=1, keepdims=True)
    return emb.astype(np.float32), pairs


def test_hier_quantizer_end_to_end(ray_session):
    import ray.data

    from prclz_ray.stages.similarity import (
        HIER_PROBE_CELLS,
        IVF_DEDUP_PROBES,
        ivf_centroids,
        make_hier_dedup_assign,
        train_hier_quantizer,
    )

    emb, pairs = _clustered_embeddings()
    n = len(emb)
    t = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([r.tolist() for r in emb], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)

    coarse = ivf_centroids(emb[:: max(1, n // 5000)].astype(np.float64), n_lists=32)
    subs_flat, cell_off = train_hier_quantizer(ds, coarse, subs_per_cell=8)

    # structure: offsets cover every coarse cell, >= 1 list per cell
    assert len(cell_off) == len(coarse) + 1
    assert cell_off[0] == 0 and cell_off[-1] == len(subs_flat)
    assert (np.diff(cell_off) >= 1).all()
    assert len(subs_flat) > len(coarse)  # fine level genuinely split

    # assignment: every vector gets exactly p distinct in-range lists
    assign = make_hier_dedup_assign(coarse, subs_flat, cell_off)
    out = assign(t)
    vid = out.column("vec_id").to_numpy(zero_copy_only=False)
    bkt = out.column("bucket").to_numpy(zero_copy_only=False)
    assert len(out) == n * IVF_DEDUP_PROBES
    assert (bkt >= 0).all() and (bkt < len(subs_flat)).all()
    per_vec = {}
    for v, b in zip(vid, bkt):
        per_vec.setdefault(int(v), set()).add(int(b))
    assert all(len(s) == IVF_DEDUP_PROBES for s in per_vec.values())

    # planted near-dup pairs co-list (the property the downstream
    # within-list pair matmul depends on)
    hit = sum(1 for a, b in pairs if per_vec[a] & per_vec[b])
    recall = hit / len(pairs)
    assert recall >= 0.8, f"two-level co-list recall collapsed: {recall:.2f}"

    # candidate pruning is real: each vector scored at most
    # probe_cells x max-cell-width lists, far fewer than n_lists
    widths = np.diff(cell_off)
    assert HIER_PROBE_CELLS * widths.max() < len(subs_flat)


def test_dedup_embedding_ann_hier_dispatch(ray_session, monkeypatch):
    """Force the registered query down the two-level branch (ceiling
    patched below the requested list count) and check the glue: the
    distributed trainer + hier assign feed the same pair pipeline and
    the output is a well-formed distinct canonical pair table."""
    import prclz_ray.queries as q

    monkeypatch.setattr(q, "MAX_TRAIN_LISTS", 8)  # 16 requested > 8
    out = q.q_dedup_embedding_ann("/root/testdata/sf0.001").to_pandas()
    assert list(out.columns) == ["vec_a", "vec_b"]
    assert (out["vec_a"] < out["vec_b"]).all()  # canonical order
    assert not out.duplicated().any()           # pair-distinct held


def test_ann_topk_ivf_hier_dispatch(ray_session, monkeypatch):
    """Force q_ann_topk_ivf down the two-level branch: partitions
    keyed by hier_top1, read pruned by hier_probe, scorer sharing the
    descent — output stays a well-formed ranked top-k table."""
    import prclz_ray.queries as q

    monkeypatch.setattr(q, "MAX_TRAIN_LISTS", 8)  # 16 requested > 8
    out = q.q_ann_topk_ivf("/root/testdata/sf0.001").to_pandas()
    assert list(out.columns) == ["query_id", "rank", "vec_id"]
    assert (out["query_id"] % 100 == 0).all()
    for _, g in out.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 10


def test_srp_plane_count_scaling_and_probe_agreement():
    """Input-scaled SRP plane count: 8 at every test sf, grows log2
    with the corpus, capped; and for ANY plane count the scorer's
    popcount<=radius candidate rule only ever selects buckets the
    probe set read (the read/scorer agreement invariant)."""
    import numpy as np

    from prclz_ray.stages.similarity import (
        MAX_PLANES,
        PROBE_RADIUS,
        bucket_of,
        popcount,
        srp_n_planes_for,
        srp_planes,
        srp_probe_set,
    )

    assert srp_n_planes_for(500) == 8
    assert srp_n_planes_for(2000) == 8
    assert srp_n_planes_for(2_560_000) == 8      # 256 buckets x 10k
    assert srp_n_planes_for(10_000_000) == 10
    assert srp_n_planes_for(10**9) == 17
    assert srp_n_planes_for(10**15) == MAX_PLANES
    ns = [srp_n_planes_for(10**k) for k in range(3, 16)]
    assert ns == sorted(ns)

    # popcount correct over the full bucket range
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1 << MAX_PLANES, size=1000)
    assert all(popcount(np.array([x]))[0] == bin(x).count("1") for x in xs)

    # read/scorer agreement at a non-default plane count
    n_planes = 12
    planes = srp_planes(64, n_planes=n_planes)
    x = rng.standard_normal((3000, 64))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:7]
    vb, qb = bucket_of(x, planes), bucket_of(q, planes)
    probe = srp_probe_set(qb, n_planes=n_planes)
    scored = (popcount(vb[:, None] ^ qb[None, :]) <= PROBE_RADIUS).any(axis=1)
    assert set(vb[scored].tolist()) <= probe
    assert (vb < (1 << n_planes)).all()
