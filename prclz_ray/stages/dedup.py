"""Deduplication stages for the training-data pipeline.

Five dedup families over the ``documents`` / ``embeddings`` corpora,
each expressed Ray-Data-first:

- exact: hash-partition on text digest + per-group min (queries.py
  ``dedup_exact``; reference analogue D1-D3 `prclz/utils.py:33-34`)
- MinHash+LSH: shingle → minhash signature → band buckets →
  per-bucket candidate pairs (the shuffle is ONE groupby on the band
  key — at 100 TB the only all-to-all in the dedup path)
- SimHash: 16-bit signature from per-word hash bits, bucket by value
- n-gram Jaccard: INVERTED-INDEX count join — co-occurrence rows per
  shared shingle string, pair multiplicity = |A∩B|, two
  bounded-bucket shuffles, string-exact
- embedding cosine near-dup: exact chunk-pair block matmul (each task
  holds two row chunks, never the corpus; IVF/SRP is the
  sub-quadratic path)

Hash family: the vectorized polynomial family in ``hashing.py``
(DuckDB-expressible, so oracles hash bit-for-bit) — no per-row Python
hashing anywhere in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import arrow_combined, hash_strings, salted

SHINGLE = 3       # words per shingle
N_HASHES = 8      # minhash signature length
BAND = 2          # rows per LSH band → N_HASHES // BAND bands
SIMHASH_BITS = 16
JACCARD_BUCKETS = 1024  # shuffle-key buckets for the prefix-filter join


def _shingle_arrays(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """(doc_index, shingle_string) for every 3-word shingle in the
    batch, fully vectorized: flat word array → three shifted slices
    joined element-wise. Docs with < SHINGLE words contribute their
    whole text (split(' ')/join(' ') identity). Null text is filled
    with '' EXPLICITLY (it shingles like the empty string — the same
    equivalence DuckDB's COALESCE(text,'') oracle fragment would use);
    without the fill a null length hits an invalid NaN→int64 cast."""
    text = pc.fill_null(batch.column("text"), "")
    words = pc.split_pattern(text, " ")
    flat = arrow_combined(pc.list_flatten(words))
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False).astype(np.int64)
    nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    parts: list[pa.Array] = []
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
            parts.append(arrow_combined(sh_str))
            docs.append(par[: m - 2][valid])
    fb = np.flatnonzero(nw < SHINGLE)
    if len(fb):
        fb_text = text.take(pa.array(fb))
        parts.append(arrow_combined(fb_text))
        docs.append(fb)
    if not parts:
        return np.empty(0, np.int64), pa.array([], pa.string())
    return np.concatenate(docs), pa.concat_arrays([p.cast(pa.string()) for p in parts])


def shingle_hashes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, shingle_hash) per shingle — one flat hash pass."""
    doc_idx, sh = _shingle_arrays(batch)
    return doc_idx, hash_strings(sh)


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
        sig[:, k] = np.minimum.reduceat(salted(h_s, k), starts)
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
    # band-major layout: rows [band0 × all docs, band1 × all docs, ...]
    # so the per-band key arrays concatenate directly (row order is
    # irrelevant to the downstream groupby)
    bucket = pa.concat_arrays(
        [arrow_combined(c) for c in bucket_cols]
    )
    return pa.table(
        {
            "doc_id": pa.array(np.tile(doc_ids, n_bands), pa.int64()),
            "band": pa.array(np.repeat(np.arange(n_bands, dtype=np.int64), n), pa.int64()),
            "bucket": bucket,
        }
    )


def _sorted_runs(group: pa.Table, key_col: str):
    """Sort the group by (key_col, doc_id) and return (sorted table,
    run-start indices of equal-key runs) — the shared skeleton of the
    bounded-bucket group functions."""
    order = pc.sort_indices(
        group, sort_keys=[(key_col, "ascending"), ("doc_id", "ascending")]
    )
    g = group.take(order)
    s = g.column(key_col)
    neq = pc.not_equal(s.slice(1), s.slice(0, len(s) - 1)).to_numpy(zero_copy_only=False)
    run_start = np.concatenate([[0], np.flatnonzero(neq) + 1, [group.num_rows]])
    return g, run_start


MAX_BUCKET_MEMBERS = 10_000  # mega-bucket guard: a boilerplate-text
# band bucket with b members normally emits C(b,2) pairs; beyond this
# cap a bucket emits O(b) STAR edges (min_id, member) instead — exactly
# the edges a keep-bucket-minimum dedup policy needs, and the cap is
# far above any honest near-dup cluster at test scale (oracle
# behavior unchanged; bounded memory at web scale)


def band_bucket_pairs(group: pa.Table, max_members: int = MAX_BUCKET_MEMBERS) -> pa.Table:
    """One HASH-bucket of LSH band keys → candidate pairs (a < b) for
    every band bucket inside it, vectorized (arrow sort + run
    triangles). Grouping by ``bb = hash(bucket) % N`` instead of the
    raw band-key string keeps the group count constant — Ray's
    per-group overhead on ~|corpus| tiny groups dominated the stage.
    Runs larger than ``max_members`` emit star edges (mega-bucket
    guard, see MAX_BUCKET_MEMBERS)."""
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "bucket")
    d = g.column("doc_id").to_numpy(zero_copy_only=False)
    out_a, out_b = [], []
    for i in range(len(run_start) - 1):
        lo, hi = run_start[i], run_start[i + 1]
        c = hi - lo
        if c < 2:
            continue
        if c > max_members:  # star edges: O(b), not C(b,2)
            out_a.append(np.full(c - 1, d[lo]))
            out_b.append(d[lo + 1 : hi])
            continue
        ai, bi = np.triu_indices(c, k=1)
        out_a.append(d[lo:hi][ai])
        out_b.append(d[lo:hi][bi])
    if not out_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def band_bucket_drops(group: pa.Table) -> pa.Table:
    """One HASH-bucket of band keys → (doc_id, dropped=1) rows for
    every non-minimum member of each band bucket (the
    keep-bucket-minimum dedup policy), vectorized run-length pass."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "dropped": pa.array([], pa.int64())}
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "bucket")
    d = g.column("doc_id").to_numpy(zero_copy_only=False)
    is_min = np.zeros(len(d), dtype=bool)
    is_min[run_start[:-1]] = True
    # doc repeated within one band bucket is impossible (one row per
    # band per doc; the bucket embeds the band index)
    drops = d[~is_min]
    if not len(drops):
        return empty
    return pa.table(
        {
            "doc_id": pa.array(drops, pa.int64()),
            "dropped": pa.array(np.ones(len(drops), np.int64)),
        }
    )


BAND_BUCKETS = 512  # floor: LSH band-bucket shuffle (input-scaled by
# the query layer — band rows = N_HASHES // BAND per doc)


def add_bucket_hash(batch: pa.Table, n_buckets: int = BAND_BUCKETS) -> pa.Table:
    """Append ``bb = hash(bucket) % n_buckets`` (the bounded shuffle key)."""
    return batch.append_column(
        "bb", pa.array(hash_strings(batch.column("bucket")) % n_buckets, pa.int64())
    )


def distinct_pairs_group(group: pa.Table, a_col: str = "doc_a",
                         b_col: str = "doc_b") -> pa.Table:
    """One pair-hash bucket → its distinct (a, b) rows, vectorized
    (lexsort + run-start diff) — the bounded-bucket counterpart of a
    per-distinct-pair groupby (the CLAUDE.md tiny-groups pathology).
    A pair's duplicates all share its ``add_pair_hash`` bucket."""
    empty = pa.table(
        {a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())}
    )
    if group.num_rows == 0 or a_col not in group.column_names:
        return empty
    a = group.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
    b = group.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    return pa.table(
        {a_col: pa.array(a[first], pa.int64()), b_col: pa.array(b[first], pa.int64())}
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
# exact n-gram Jaccard via prefix filtering (candidates → verify)

def doc_shingle_rows(batch: pa.Table, n_buckets: int = JACCARD_BUCKETS) -> pa.Table:
    """(doc_id, shingle, L, sb) — each doc's DISTINCT shingle STRINGS,
    its distinct-set size L, and the shingle's shuffle bucket
    (hash % JACCARD_BUCKETS). One arrow sort + run-length pass; the
    strings (not hashes) are the class keys, so downstream counts are
    string-exact."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "shingle": pa.array([], pa.string()),
            "L": pa.array([], pa.int64()),
            "sb": pa.array([], pa.int64()),
        }
    )
    if len(batch) == 0:
        return empty
    doc_idx, sh = _shingle_arrays(batch)
    if len(sh) == 0:
        return empty
    tbl = pa.table({"d": pa.array(doc_idx), "s": sh})
    order = pc.sort_indices(tbl, sort_keys=[("d", "ascending"), ("s", "ascending")])
    tbl = tbl.take(order)
    d_s = tbl.column("d").to_numpy(zero_copy_only=False)
    s_s = tbl.column("s")
    neq = pc.not_equal(s_s.slice(1), s_s.slice(0, len(s_s) - 1)).to_numpy(
        zero_copy_only=False
    )
    first = np.concatenate([[True], (d_s[1:] != d_s[:-1]) | neq])
    d_u = d_s[first]
    s_u = s_s.filter(pa.array(first))
    run_start = np.concatenate([[True], d_u[1:] != d_u[:-1]])
    starts = np.flatnonzero(run_start)
    sizes = np.diff(np.concatenate([starts, [len(d_u)]]))
    L = np.repeat(sizes, sizes)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[d_u], pa.int64()),
            "shingle": s_u,
            "L": pa.array(L, pa.int64()),
            "sb": pa.array(hash_strings(s_u) % n_buckets, pa.int64()),
        }
    )


MAX_SHINGLE_DF = 10_000  # stop-shingle guard: a shingle shared by k
# docs emits C(k,2) co-occurrence rows; beyond this document-frequency
# cap the shingle is DROPPED (the standard prefix-filter stop-shingle
# rule — boilerplate text carries no near-dup signal), bounding one
# run's output at C(cap,2) and making web-scale memory O(cap²) not
# O(corpus²). Jaccard then under-counts |A∩B| by the dropped shingles
# only for pairs sharing a >cap-df shingle; the cap is far above any
# honest shingle df at test scale (corpus max df ≈ 60), so oracles are
# unchanged. Mirrors MAX_BUCKET_MEMBERS in band_bucket_pairs.


def shingle_cooccur_pairs(group: pa.Table, max_df: int = MAX_SHINGLE_DF) -> pa.Table:
    """One shingle bucket → co-occurrence rows: for every shingle
    shared by docs {d1..dk} in this bucket, the C(k,2) rows
    (doc_a, doc_b, La, Lb) — the inverted-index join. Shared-shingle
    runs are found by one arrow sort; pair expansion is numpy
    triangle indexing per run. Runs with df > ``max_df`` are dropped
    (stop-shingle prefix-filter guard, see MAX_SHINGLE_DF)."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "La": pa.array([], pa.int64()),
            "Lb": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "shingle")
    d = g.column("doc_id").to_numpy(zero_copy_only=False)
    L = g.column("L").to_numpy(zero_copy_only=False)
    out_a, out_b, out_la, out_lb = [], [], [], []
    for i in range(len(run_start) - 1):
        lo, hi = run_start[i], run_start[i + 1]
        c = hi - lo
        if c < 2 or c > max_df:  # singleton, or stop-shingle (dropped)
            continue
        ai, bi = np.triu_indices(c, k=1)
        out_a.append(d[lo:hi][ai])
        out_b.append(d[lo:hi][bi])
        out_la.append(L[lo:hi][ai])
        out_lb.append(L[lo:hi][bi])
    if not out_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            "La": pa.array(np.concatenate(out_la), pa.int64()),
            "Lb": pa.array(np.concatenate(out_lb), pa.int64()),
        }
    )


PAIR_BUCKETS = 512  # shuffle-key buckets for the pair-count aggregation


def add_pair_hash(batch: pa.Table, n_buckets: int = PAIR_BUCKETS,
                  a_col: str = "doc_a", b_col: str = "doc_b") -> pa.Table:
    """Append ``pb = hash(a, b) % n_buckets`` — the bounded shuffle key
    of every pair-distinct/pair-count stage (same tiny-groups rule as
    `add_bucket_hash`). The ONE home of the pair-bucket formula: both
    the Jaccard count join (doc_a/doc_b) and the embedding near-dup
    pass (vec_a/vec_b) key through here."""
    a = batch.column(a_col).to_numpy(zero_copy_only=False)
    d = batch.column(b_col).to_numpy(zero_copy_only=False)
    return batch.append_column(
        "pb", pa.array((a * 1_000_003 + d) % n_buckets, pa.int64())
    )


def pair_jaccard_agg(group: pa.Table, threshold_x1000: int = 200) -> pa.Table:
    """One pair-hash bucket → exact Jaccard per pair: the multiplicity
    of a (doc_a, doc_b) row IS |A∩B| (each shared distinct shingle
    emitted it once); union = La + Lb − inter. Vectorized lexsort +
    run-length count, filter ≥ threshold."""
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard_x1000": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    a = group.column("doc_a").to_numpy(zero_copy_only=False)
    b = group.column("doc_b").to_numpy(zero_copy_only=False)
    La = group.column("La").to_numpy(zero_copy_only=False)
    Lb = group.column("Lb").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, La, Lb = a[order], b[order], La[order], Lb[order]
    run_start = np.concatenate(
        [[0], np.flatnonzero((a[1:] != a[:-1]) | (b[1:] != b[:-1])) + 1, [len(a)]]
    )
    lo = run_start[:-1]
    inter = np.diff(run_start)
    union = La[lo] + Lb[lo] - inter
    jx = 1000 * inter // union
    keep = jx >= threshold_x1000
    return pa.table(
        {
            "doc_a": pa.array(a[lo][keep], pa.int64()),
            "doc_b": pa.array(b[lo][keep], pa.int64()),
            "jaccard_x1000": pa.array(jx[keep], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup: exact block (chunk-pair) matmul

def make_chunk_pair_fn(path: str, threshold: float = 0.9):
    """Exact cosine near-dup pairs as a BLOCK similarity join: each
    input row describes one unordered chunk pair (row ranges of the
    embeddings parquet); the task loads only its two chunks (pruned to
    the overlapping row groups, worker-cached) and matmuls them,
    emitting pairs with vec_a < vec_b exactly once. Worker memory is
    two chunks — never the whole corpus — and no driver-side compute.
    The total O(N²/2) flops of an exact all-pairs join are distributed
    over C(K+1,2) tasks; at web scale the sub-quadratic route is the
    IVF/SRP bucketed path in ``similarity.py``."""
    import pyarrow.parquet as pq

    cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    meta: dict = {}  # per-worker: row-group boundaries scanned once

    def load(start: int, end: int) -> tuple[np.ndarray, np.ndarray]:
        key = (start, end)
        hit = cache.get(key)
        if hit is not None:
            # LRU refresh: re-insert so eviction drops the least
            # RECENTLY used chunk (plain FIFO evicted the hottest
            # early chunk over and over under >6 live chunks)
            cache.pop(key)
            cache[key] = hit
            return hit
        if "pf" not in meta:
            pf = pq.ParquetFile(path)
            bounds = np.cumsum(
                [0] + [pf.metadata.row_group(i).num_rows
                       for i in range(pf.metadata.num_row_groups)]
            )
            meta["pf"], meta["bounds"] = pf, bounds
        pf, bounds = meta["pf"], meta["bounds"]
        groups = [
            i for i in range(len(bounds) - 1)
            if bounds[i] < end and bounds[i + 1] > start
        ]
        first_base = int(bounds[groups[0]])
        t = pf.read_row_groups(groups, columns=["vec_id", "embedding"])
        t = t.slice(start - first_base, end - start)
        from .similarity import embedding_matrix

        ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x = embedding_matrix(t.column("embedding"))
        # out-of-place: a list<double> column is a READ-ONLY zero-copy
        # view (in-place /= raises; float32 survives only via the cast)
        x = x / np.linalg.norm(x, axis=1, keepdims=True)
        if len(cache) >= 6:
            # evict ONE (oldest) entry — clearing everything would drop
            # the partner chunk of the pair currently being processed
            cache.pop(next(iter(cache)))
        cache[key] = (ids, x)
        return ids, x

    def pairs(batch: pa.Table) -> pa.Table:
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for row in batch.to_pylist():
            ida, xa = load(row["a_start"], row["a_end"])
            idb, xb = load(row["b_start"], row["b_end"])
            sim = xa @ xb.T
            hit = (sim >= threshold) & (ida[:, None] != idb[None, :])
            ai, bj = np.nonzero(hit)
            if len(ai) == 0:
                continue
            va, vb = ida[ai], idb[bj]
            lo, hi = np.minimum(va, vb), np.maximum(va, vb)
            if row["a_start"] == row["b_start"]:  # same chunk: dedup mirrored hits
                keep = va < vb
                lo, hi = lo[keep], hi[keep]
            out_a.append(lo)
            out_b.append(hi)
        if not out_a:
            return pa.table(
                {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        order = np.lexsort((b, a))
        return pa.table(
            {"vec_a": pa.array(a[order], pa.int64()), "vec_b": pa.array(b[order], pa.int64())}
        )

    return pairs


# ---------------------------------------------------------------------------
# snapshot-delta dedup (incremental crawl)

DELTA_BUCKETS = 512  # shuffle-key buckets for the delta anti-join


def delta_hash_rows(batch: pa.Table, snapshot_mod: int, n_buckets: int = DELTA_BUCKETS) -> pa.Table:
    """documents → (doc_id, h, old, db): 62-bit content hash, the
    prior-snapshot membership flag (``doc_id % snapshot_mod == 0`` in
    the synthetic world; a crawl-id column in production), and the
    bounded shuffle key. The text column dies here — only 32 B/row
    travels to the anti-join."""
    from .hashing import hash_strings62

    text = arrow_combined(batch.column("text"))
    h = hash_strings62(pc.fill_null(text, ""))
    d = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "h": pa.array(h, pa.int64()),
            "old": pa.array((d % snapshot_mod == 0).astype(np.int64), pa.int64()),
            "db": pa.array(h % n_buckets, pa.int64()),
        }
    )


def delta_new_rows(group: pa.Table) -> pa.Table:
    """One hash bucket: emit NEW docs whose content hash matches no
    prior-snapshot doc (a hash's rows all share its bucket; vectorized
    run pass — per-run old-flag max via cumsum difference)."""
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "h")
    old = g.column("old").to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(old)])
    run_has_old = (csum[run_start[1:]] - csum[run_start[:-1]]) > 0
    counts = np.diff(run_start)
    drop = np.repeat(run_has_old, counts)
    keep = pa.array((old == 0) & ~drop)
    return pa.table({"doc_id": g.column("doc_id").filter(keep)})
