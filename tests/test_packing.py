"""Distributed prefix-sum scan: sequence packing + shuffle rank."""

import numpy as np
import pyarrow as pa

from prclz_ray.stages import packing as P


def _ref_pack(texts, seq_len):
    """Naive single-process reference: concatenate, cut, record
    (seq, doc, overlap)."""
    out = []
    off = 0
    for d, t in enumerate(texts):
        nt = len(t.split(" "))
        for s in range(off // seq_len, (off + nt - 1) // seq_len + 1):
            lo = max(s * seq_len, off)
            hi = min((s + 1) * seq_len, off + nt)
            out.append((s, d, hi - lo))
        off += nt
    return out


def test_seq_pack_matches_reference_across_buckets(ray_session):
    import ray

    rng = np.random.RandomState(7)
    texts = [" ".join("w" * 1 for _ in range(int(n))) for n in rng.randint(1, 40, 97)]
    docs = pa.table(
        {"doc_id": pa.array(list(range(97)), pa.int64()), "text": pa.array(texts)}
    )
    width = 96 // P.PACK_BUCKETS + 1  # forces one doc per bucket mostly
    rows = P.add_range_bucket(width)(P.token_count_rows(docs))
    ds = ray.data.from_arrow(rows).materialize()
    bases = P.bucket_bases(ds, "nt", "pb")
    ref = ray.put(bases)
    got = (
        ds.groupby("pb")
        .map_groups(P.make_pack_fn(ref, seq_len=16), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
    )
    exp = sorted(_ref_pack(texts, 16))
    assert list(map(tuple, got[["seq_id", "doc_id", "tok_in_seq"]].values)) == exp
    # windows are exactly full except possibly the last
    per_seq = got.groupby("seq_id")["tok_in_seq"].sum()
    assert (per_seq.iloc[:-1] == 16).all()


def test_seq_pack_invariant_to_bucket_width(ray_session):
    """The scan's defining property: the pack manifest is identical
    whatever the range-bucket width — one bucket, one doc per bucket,
    or anything between."""
    import ray

    rng = np.random.RandomState(11)
    texts = [" ".join("w" for _ in range(int(n))) for n in rng.randint(1, 60, 83)]
    docs = pa.table(
        {"doc_id": pa.array(list(range(83)), pa.int64()), "text": pa.array(texts)}
    )
    tok = P.token_count_rows(docs)
    results = []
    for width in (1, 7, 10**9):
        rows = P.add_range_bucket(width)(tok)
        ds = ray.data.from_arrow(rows).materialize()
        ref = ray.put(P.bucket_bases(ds, "nt", "pb"))
        out = (
            ds.groupby("pb")
            .map_groups(P.make_pack_fn(ref, seq_len=32), batch_format="pyarrow")
            .to_pandas()
            .sort_values(["seq_id", "doc_id"])
            .reset_index(drop=True)
        )
        results.append(out)
    assert results[0].equals(results[1])
    assert results[0].equals(results[2])


def test_bucket_bases_exclusive_cumsum_with_gaps(ray_session):
    import ray

    rows = pa.table(
        {
            "pb": pa.array([0, 0, 3, 5], pa.int64()),
            "nt": pa.array([4, 6, 10, 1], pa.int64()),
        }
    )
    bases = P.bucket_bases(ray.data.from_arrow(rows), "nt", "pb")
    assert bases[0] == 0 and bases[1] == 10 and bases[3] == 10
    assert bases[4] == 20 and bases[5] == 20 and bases[6] == 21


def test_centroid_partials_and_combine_exact():
    from prclz_ray.stages.similarity import centroid_combine, centroid_partials

    rng = np.random.RandomState(3)
    emb = rng.randn(30, 4).astype(np.float32)
    lab = rng.randint(0, 3, 30)
    batch = pa.table(
        {
            "label": pa.array(lab, pa.int32()),
            "embedding": pa.array([list(map(float, r)) for r in emb]),
        }
    )
    # split into two batches to exercise the partial+combine path
    parts = pa.concat_tables(
        [centroid_partials(batch.slice(0, 13)), centroid_partials(batch.slice(13))]
    )
    out = centroid_combine(parts)
    v = np.where(
        emb.astype(np.float64) * 1e6 < 0,
        np.ceil(emb.astype(np.float64) * 1e6 - 0.5),
        np.floor(emb.astype(np.float64) * 1e6 + 0.5),
    ).astype(np.int64)
    for label in range(3):
        sel = lab == label
        exp = v[sel].sum(axis=0)
        rows = out.filter(pa.array(out["label"].to_numpy() == label))
        got = dict(zip(rows["dim"].to_pylist(), rows["sum_e6"].to_pylist()))
        assert [got[d] for d in range(4)] == exp.tolist()
        assert set(rows["n_vecs"].to_pylist()) == {int(sel.sum())}


def test_centroid_partials_rejects_null_label():
    import pytest

    from prclz_ray.stages.similarity import centroid_partials

    batch = pa.table(
        {
            "label": pa.array([1, None], pa.int32()),
            "embedding": pa.array([[0.5, 0.5], [0.25, 0.25]]),
        }
    )
    with pytest.raises(ValueError, match="null label"):
        centroid_partials(batch)


def test_chunk_rows_matches_reference():
    def ref(texts, w, s):
        out = []
        for d, t in enumerate(texts):
            words = t.split(" ")
            k = 0
            while k * s < len(words):
                out.append((d, k, " ".join(words[k * s : k * s + w])))
                k += 1
        return out

    texts = [
        " ".join(f"w{i}" for i in range(95)),   # multiple overlapping chunks
        "single",                                # one short chunk
        " ".join(f"x{i}" for i in range(40)),   # exactly one full window
        " ".join(f"y{i}" for i in range(41)),   # one word spills into chunk 2
    ]
    batch = pa.table(
        {"doc_id": pa.array(list(range(4)), pa.int64()), "text": pa.array(texts)}
    )
    out = P.chunk_rows(batch)
    got = list(
        zip(
            out["doc_id"].to_pylist(),
            out["chunk_idx"].to_pylist(),
            out["chunk_text"].to_pylist(),
        )
    )
    assert got == ref(texts, P.CHUNK_W, P.CHUNK_STRIDE)
    assert P.chunk_rows(batch.slice(0, 0)).num_rows == 0


def test_shuffle_rank_is_a_permutation(ray_session):
    import ray

    texts = [f"doc number {i} body" for i in range(50)] + ["doc number 7 body"]
    docs = pa.table(
        {"doc_id": pa.array(list(range(51)), pa.int64()), "text": pa.array(texts)}
    )
    rows = ray.data.from_arrow(P.shuffle_key_rows(docs)).materialize()
    ref = ray.put(P.bucket_bases(rows, "one", "sb"))
    got = (
        rows.groupby("sb")
        .map_groups(P.make_rank_fn(ref), batch_format="pyarrow")
        .to_pandas()
    )
    assert sorted(got["shuffle_pos"]) == list(range(1, 52))
    # duplicate text (doc 7 vs 50) must tie-break by doc_id: 7 first
    h = P.hash_strings62(docs.column("text"))
    dup_pos = {d: p for d, p in zip(got["doc_id"], got["shuffle_pos"])}
    assert dup_pos[7] == dup_pos[50] - 1 or h[7] != h[50]


def test_pack_dataset_negative_md5_ids(ray_session):
    """md5-int64 doc_ids are NEGATIVE half the time; the range bucket
    must anchor at the key minimum — unanchored `id // width` gave
    bucket -1, which numpy silently wrapped into the LAST bucket's
    bases slot (corrupted global offsets, no error)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from prclz_ray.stages.packing import SEQ_LEN, pack_dataset

    rng = np.random.default_rng(9)
    ids = rng.integers(-(1 << 62), 1 << 62, size=300, dtype=np.int64)
    ids = np.unique(ids)
    nt = rng.integers(1, 50, size=len(ids)).astype(np.int64)
    tok = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "nt": pa.array(nt)})
    ).materialize()
    out = pack_dataset(tok).to_pandas()
    # total packed tokens must equal the corpus total, exactly once
    assert out["tok_in_seq"].sum() == nt.sum()
    # every doc appears, with its full token count
    per_doc = out.groupby("doc_id")["tok_in_seq"].sum()
    order = np.argsort(ids)
    assert (per_doc.loc[ids[order]].to_numpy() == nt[order]).all()
    # seq ids are a dense 0..n-1 range and no sequence exceeds SEQ_LEN
    per_seq = out.groupby("seq_id")["tok_in_seq"].sum()
    assert (per_seq <= SEQ_LEN).all()
    assert sorted(per_seq.index) == list(range(len(per_seq)))
