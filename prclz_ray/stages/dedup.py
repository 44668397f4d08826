"""Deduplication stages for the training-data pipeline.

Five dedup families over the ``documents`` / ``embeddings`` corpora,
each expressed Ray-Data-first:

- exact: hash-partition on text digest + per-group min (queries.py
  ``dedup_exact``; reference analogue D1-D3 `prclz/utils.py:33-34`)
- MinHash+LSH: shingle → minhash signature → band buckets →
  per-bucket candidate pairs (the shuffle is ONE groupby on the band
  key — at 100 TB the only all-to-all in the dedup path)
- SimHash: 16-bit signature from per-word hash bits, bucket by value
- n-gram Jaccard: exact verify over LSH candidates (or all pairs at
  test scale)
- embedding cosine near-dup: normalized matmul per batch against the
  broadcast matrix (IVF-bucketed at scale)

Hash family: the vectorized polynomial family in ``hashing.py``
(DuckDB-expressible, so oracles hash bit-for-bit) — no per-row Python
hashing anywhere in the hot path.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import P31, SALT_A, SALT_B, hash_strings

SHINGLE = 3       # words per shingle
N_HASHES = 8      # minhash signature length
BAND = 2          # rows per LSH band → N_HASHES // BAND bands
SIMHASH_BITS = 16


def _shingles(text: str) -> list[str]:
    w = text.split(" ")
    if len(w) < SHINGLE:
        return [" ".join(w)]
    return [" ".join(w[i : i + SHINGLE]) for i in range(len(w) - SHINGLE + 1)]


def shingle_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, shingle_hash) for every 3-word shingle in the batch,
    fully vectorized: flat word array → three shifted slices joined
    element-wise → one flat-buffer polynomial hash pass. Docs with
    < SHINGLE words contribute their whole text (split/join identity)."""
    text = batch.column("text")
    words = pc.split_pattern(text, " ")
    flat = pc.list_flatten(words).combine_chunks()
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False).astype(np.int64)
    nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    parts: list[np.ndarray] = []
    docs: list[np.ndarray] = []
    m = len(flat)
    if m >= SHINGLE:
        valid = par[: m - 2] == par[2:]
        if valid.any():
            vmask = pa.array(valid)
            sh_str = pc.binary_join_element_wise(
                flat.slice(0, m - 2).filter(vmask),
                flat.slice(1, m - 2).filter(vmask),
                flat.slice(2, m - 2).filter(vmask),
                " ",
            )
            parts.append(hash_strings(sh_str))
            docs.append(par[: m - 2][valid])
    fb = np.flatnonzero(nw < SHINGLE)
    if len(fb):
        parts.append(hash_strings(text.take(pa.array(fb))))
        docs.append(fb)
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(docs), np.concatenate(parts)


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_matrix(batch: pa.Table) -> np.ndarray:
    """(n_docs, N_HASHES) minhash signature matrix, vectorized: salted
    universal hashes of the shingle hashes, per-doc min via reduceat."""
    n = len(batch)
    sh_doc, sh_h = shingle_hashes(batch)
    order = np.argsort(sh_doc, kind="stable")
    doc_s, h_s = sh_doc[order], sh_h[order]
    starts = np.searchsorted(doc_s, np.arange(n))
    sig = np.empty((n, N_HASHES), dtype=np.int64)
    for k in range(N_HASHES):
        sig[:, k] = np.minimum.reduceat((SALT_A[k] * h_s + SALT_B[k]) % P31, starts)
    return sig


def minhash_signatures(batch: pa.Table) -> pa.Table:
    """documents → one row per (doc, band) with the band's bucket key.

    Emitting band rows (flat_map shape) lets the downstream groupby on
    ``bucket`` do ALL the pair-finding work in one shuffle.
    """
    n = len(batch)
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "band": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.string()),
            }
        )
    sig = minhash_matrix(batch)
    n_bands = N_HASHES // BAND
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    bucket_cols = []
    for b in range(n_bands):
        key = pc.cast(pa.array(sig[:, b * BAND]), pa.string())
        for r in range(1, BAND):
            key = pc.binary_join_element_wise(
                key, pc.cast(pa.array(sig[:, b * BAND + r]), pa.string()), ":"
            )
        bucket_cols.append(
            pc.binary_join_element_wise(pa.array([str(b)] * n, pa.string()), key, "|")
        )
    out_doc = np.repeat(doc_ids, n_bands)
    out_band = np.tile(np.arange(n_bands, dtype=np.int64), n)
    bucket = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in bucket_cols]
    ).take(
        pa.array(
            (np.arange(n)[:, None] + np.arange(n_bands)[None, :] * n).ravel(),
            pa.int64(),
        )
    )
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "band": pa.array(out_band, pa.int64()),
            "bucket": bucket,
        }
    )


def bucket_pairs(group: pa.Table) -> pa.Table:
    """One LSH bucket → candidate pairs (a < b)."""
    ids = sorted(set(group.column("doc_id").to_pylist()))
    pairs = list(combinations(ids, 2))
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash

def simhash(batch: pa.Table) -> pa.Table:
    """SIMHASH_BITS-bit signature: per word w, h = H31(w); bit b
    contributes +1 if set else -1; signature bit b = (sum > 0)."""
    doc_ids = batch.column("doc_id")
    words = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(words)
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    n = len(batch)
    h = hash_strings(flat)
    bits = (h[:, None] >> np.arange(SIMHASH_BITS)[None, :]) & 1  # (W, B)
    votes = np.zeros((n, SIMHASH_BITS), dtype=np.int64)
    for b in range(SIMHASH_BITS):
        votes[:, b] = np.bincount(par, weights=2 * bits[:, b] - 1, minlength=n)
    sig = ((votes > 0).astype(np.int64) << np.arange(SIMHASH_BITS)[None, :]).sum(axis=1)
    return pa.table({"doc_id": doc_ids, "simhash": pa.array(sig)})


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verify stage)

def jaccard_pairs(batch: pa.Table, threshold_x1000: int = 200) -> pa.Table:
    """All-pairs exact 3-shingle Jaccard within the batch ≥ threshold.

    Exact-integer output: jaccard_x1000 = floor(1000·|∩| / |∪|). At
    scale this runs per LSH bucket (map_groups after the band shuffle),
    never all-pairs; at test scale the batch IS the whole corpus.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sets = [frozenset(_shingles(t)) for t in texts]
    order = np.argsort(doc_ids, kind="stable")
    out_a, out_b, out_j = [], [], []
    for ii in range(len(order)):
        i = order[ii]
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            inter = len(sets[i] & sets[j])
            if inter == 0:
                continue
            union = len(sets[i] | sets[j])
            jx = 1000 * inter // union
            if jx >= threshold_x1000:
                out_a.append(doc_ids[i])
                out_b.append(doc_ids[j])
                out_j.append(jx)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "jaccard_x1000": pa.array(out_j, pa.int64()),
        }
    )


def make_jaccard_pairs_fn(side_ref, threshold_x1000: int = 200):
    """Streaming all-pairs exact Jaccard: batch docs compare against the
    broadcast shingle-set table; a pair (a < b) is emitted by the batch
    owning its smaller id. At 100 TB the broadcast side becomes the
    per-LSH-bucket slice (candidates only)."""
    import ray as _ray

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard_x1000": pa.array([], pa.int64()),
                }
            )
        side = _ray.get(side_ref)
        all_ids, all_sets = side["ids"], side["sets"]
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_a, out_b, out_j = [], [], []
        for d, t in sorted(zip(doc_ids, texts)):
            s = frozenset(_shingles(t))
            for j in range(np.searchsorted(all_ids, d) + 1, len(all_ids)):
                other = all_sets[j]
                inter = len(s & other)
                if inter == 0:
                    continue
                union = len(s | other)
                jx = 1000 * inter // union
                if jx >= threshold_x1000:
                    out_a.append(d)
                    out_b.append(int(all_ids[j]))
                    out_j.append(jx)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard_x1000": pa.array(out_j, pa.int64()),
            }
        )

    return pairs


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def make_embedding_pairs_fn(side_ref, threshold: float = 0.9):
    """Streaming near-dup pairs: each batch's rows matmul against the
    broadcast normalized matrix; a pair (a < b) is emitted by the batch
    that owns its SMALLER id, so the full-pairs set is produced exactly
    once with no driver-side compute. Use:
    ``ds.map_batches(make_embedding_pairs_fn(ray.put(side)), ...)``
    where side = {"ids": sorted int64 ids, "x": normalized matrix}."""
    import ray as _ray

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        side = _ray.get(side_ref)
        all_ids, all_x = side["ids"], side["x"]
        emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        sim = emb @ all_x.T  # (B, N)
        hit = (sim >= threshold) & (all_ids[None, :] > vids[:, None])
        bi, oj = np.nonzero(hit)
        order = np.lexsort((all_ids[oj], vids[bi]))
        return pa.table(
            {
                "vec_a": pa.array(vids[bi][order], pa.int64()),
                "vec_b": pa.array(all_ids[oj][order], pa.int64()),
            }
        )

    return pairs


def embedding_near_dups(
    emb_matrix: np.ndarray, vec_ids: np.ndarray, threshold: float = 0.9
) -> pa.Table:
    """Pairs (a < b) with cosine ≥ threshold. Dense normalized matmul —
    at test scale over the whole matrix; at 100 TB the same kernel runs
    per LSH/IVF bucket with the bucket's matrix broadcast."""
    order0 = np.argsort(np.asarray(vec_ids, dtype=np.int64), kind="stable")
    vec_ids = np.asarray(vec_ids, dtype=np.int64)[order0]
    x = emb_matrix.astype(np.float64)[order0]  # id-sorted → i<j ⇒ id_i<id_j
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sim = x @ x.T
    iu = np.triu_indices(len(x), k=1)
    mask = sim[iu] >= threshold
    a, b = iu[0][mask], iu[1][mask]
    order = np.lexsort((vec_ids[b], vec_ids[a]))
    return pa.table(
        {
            "vec_a": pa.array(vec_ids[a][order], pa.int64()),
            "vec_b": pa.array(vec_ids[b][order], pa.int64()),
        }
    )
