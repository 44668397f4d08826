"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k is the exactness baseline: the query matrix is
broadcast once (``ray.put``), each ``map_batches`` task computes a
normalized matmul of its batch against the queries and emits its LOCAL
top-k per query; a final small groupby-sort merges the per-batch
candidates — so the full corpus streams, only k·num_batches candidate
rows shuffle.

The scale path (``lsh_bucketed_topk``) hashes vectors into sign-random-
projection buckets; queries probe only their own bucket (and neighbors),
turning the scan into a partition-pruned read — same output contract,
approximate recall, documented partitioning assumption: vectors are
Hive-partitioned by ``bucket`` on disk.
"""

from __future__ import annotations

from ..io import read_parquet_clean as _read_parquet_clean

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def embedding_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from a ``list<float>`` Arrow column via the
    flat values buffer (``ListArray.flatten`` honors offsets/slices) —
    one bulk cast instead of per-row ``to_pylist`` on the widest column
    in these pipelines."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count:
        # flatten() silently skips null lists → row misalignment
        raise ValueError("embedding_matrix: null embedding rows not supported")
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    d = int(lens[0])
    if (lens != d).any():
        raise ValueError("embedding_matrix: ragged embedding column")
    return np.asarray(col.flatten(), dtype=np.float64).reshape(n, d)


def _empty_topk() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )


def put_queries(q_matrix: np.ndarray, q_ids: np.ndarray) -> "ray.ObjectRef":
    qn = q_matrix.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    return ray.put({"q": qn, "ids": q_ids.astype(np.int64)})


def make_topk_fn(queries_ref, k: int = 10):
    """Per-batch local top-k: emits (query_id, vec_id, sim) candidate
    rows, ≤ k per query per batch."""

    cache: dict = {}

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        if "q" not in cache:  # per-worker: deref the side once, not per batch
            side = ray.get(queries_ref)
            cache["q"], cache["ids"] = side["q"], side["ids"]
        qn, q_ids = cache["q"], cache["ids"]
        emb = embedding_matrix(batch.column("embedding"))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # out-of-place: a list<double> column yields a READ-ONLY
        # zero-copy view (float32 survives only because its cast copies)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        sim = qn @ emb.T  # (Q, B)
        kk = min(k, sim.shape[1])
        # local top-k per query (ties broken by smaller vec_id via stable
        # argsort on (-sim, vec_id))
        out_q, out_v, out_s = [], [], []
        for qi in range(sim.shape[0]):
            order = np.lexsort((vids, -sim[qi]))[:kk]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(vids[order].tolist())
            out_s.extend(sim[qi][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return topk


def merge_topk(group: pa.Table, k: int = 10) -> pa.Table:
    """Final per-query merge of local candidates → global top-k."""
    sim = group.column("sim").to_numpy(zero_copy_only=False)
    vid = group.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -sim))[:k]
    rank = np.arange(1, len(order) + 1, dtype=np.int64)
    return pa.table(
        {
            "query_id": group.column("query_id").take(pa.array(order)),
            "rank": pa.array(rank),
            "vec_id": pa.array(vid[order], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# IVF variant (scale path 2): k-means coarse quantizer

ASSIGN_CHUNK = 1 << 14  # rows per argmax chunk: bounds the (rows × k)
# score matrix to ≤ 0.5 GB float64 even at k = 4096 subs/cell — the
# per-task temporary is what OOMs a worker at the knob ceiling, not
# the row count


def nearest_centroid(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmax(x @ c.T) in bounded-memory chunks (one matmul when the
    score matrix is small)."""
    if len(x) * len(c) <= (1 << 22):
        return np.argmax(x @ c.T, axis=1)
    out = np.empty(len(x), dtype=np.int64)
    for s in range(0, len(x), ASSIGN_CHUNK):
        out[s : s + ASSIGN_CHUNK] = np.argmax(x[s : s + ASSIGN_CHUNK] @ c.T, axis=1)
    return out


def topk_centroids(x: np.ndarray, c: np.ndarray, p: int) -> np.ndarray:
    """Top-p centroid indices per row (set, unordered) in the same
    bounded-memory chunks as ``nearest_centroid`` — the (rows × k)
    SCORE matrix is the OOM (CLAUDE.md chunked-scoring rule), not just
    argsort's index matrix, so the matmul itself must be chunked."""
    if len(x) * len(c) <= (1 << 22):
        return np.argpartition(-(x @ c.T), p - 1, axis=1)[:, :p]
    out = np.empty((len(x), p), dtype=np.int64)
    for s in range(0, len(x), ASSIGN_CHUNK):
        out[s : s + ASSIGN_CHUNK] = np.argpartition(
            -(x[s : s + ASSIGN_CHUNK] @ c.T), p - 1, axis=1
        )[:, :p]
    return out


def ivf_centroids(vectors: np.ndarray, n_lists: int = 16, iters: int = 10,
                  seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means over normalized vectors (the IVF
    coarse quantizer — trained once on a sample, broadcast to workers)."""
    x = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    c = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = nearest_centroid(x, c)
        # vectorized centroid update (np.add.at + bincount): the
        # per-centroid boolean-mask loop was O(n_lists · n · d) per
        # iteration — quadratic in corpus size once n_lists is
        # input-scaled; this is O(n · d) regardless of list count
        sums = np.zeros_like(c, dtype=np.float64)
        np.add.at(sums, assign, x)
        cnt = np.bincount(assign, minlength=len(c))
        nz = cnt > 0
        m = sums[nz] / cnt[nz, None]
        c[nz] = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return c


NPROBE = 4  # IVF lists probed per query — shared by the scorer AND the
# partition-pruned read (they MUST agree or the scan skips lists the
# scorer expects, silently dropping recall)


def ivf_probe(qn: np.ndarray, centroids: np.ndarray, nprobe: int = NPROBE) -> np.ndarray:
    """(Q, nprobe) probed list ids per normalized query — the single
    source of truth for both the pruned read and the scorer."""
    return np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]


def make_ivf_topk_fn(queries_ref, centroids: np.ndarray, k: int = 10,
                     nprobe: int = NPROBE):
    """IVF ANN: each batch scores only vectors whose nearest centroid is
    among each query's top-``nprobe`` centroids — at 100 TB the vector
    table is Hive-partitioned by list id and the probe prunes the read."""
    cache: dict = {}  # per-worker: query-side precompute done once

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        if "q" not in cache:
            side = ray.get(queries_ref)
            cache["q"], cache["ids"] = side["q"], side["ids"]
            cache["probe"] = ivf_probe(cache["q"], centroids, nprobe)
        qn, q_ids, qprobe = cache["q"], cache["ids"], cache["probe"]
        emb = embedding_matrix(batch.column("embedding"))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vlist = nearest_centroid(emb_n, centroids)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qn)):
            sel = np.flatnonzero(np.isin(vlist, qprobe[qi]))
            if len(sel) == 0:
                continue
            sim = emb_n[sel] @ qn[qi]
            order = np.lexsort((vids[sel], -sim))[: min(k, len(sel))]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(vids[sel][order].tolist())
            out_s.extend(sim[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return topk


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)

N_PLANES = 8       # floor: sign-random-projection bits → 256 buckets
MAX_PLANES = 24    # cap: 16M buckets; beyond this bucket COUNT, not
                   # bucket size, is the limit (scheduler + probe set)
SRP_TARGET_BUCKET = 10_000  # target rows per bucket — the plane count
# grows with the corpus so bucket size stays bounded (the same
# input-scaling contract as dynamic_buckets, in log2 form)


def srp_n_planes_for(n_rows: int) -> int:
    """Input-scaled plane count: smallest bit width keeping an average
    bucket ≤ SRP_TARGET_BUCKET rows, floored at the tuned test-scale
    N_PLANES=8 and capped at MAX_PLANES. At every test sf this returns
    8 (identical behavior); at 10^9 vectors it returns 17 (~131k
    buckets of ~7.6k rows, radius-2 multiprobe reads 154 of them —
    0.1% of the corpus per query)."""
    bits = N_PLANES
    while bits < MAX_PLANES and (n_rows >> bits) > SRP_TARGET_BUCKET:
        bits += 1
    return bits


def srp_planes(dim: int, seed: int = 42, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_of(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-random-projection bucket id per vector (plane count comes
    from the planes matrix — the single source of truth)."""
    bits = (vectors @ planes.T) > 0
    return (bits.astype(np.int64) << np.arange(planes.shape[0])[None, :]).sum(axis=1)


def _partition_root(sf_dir: str, kind: str) -> str:
    """Cache dir keyed by corpus basename AND a source fingerprint
    (mtime+size of embeddings.parquet): regenerated source data can
    never be served stale bucket assignments."""
    import os

    from ..pipelines.derive import CACHE_DIR

    tag = os.path.basename(os.path.normpath(sf_dir))
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    return os.path.join(CACHE_DIR, f"emb_{kind}_{tag}_{st.st_mtime_ns}_{st.st_size}")


# observability for the query-stream wrapper (and its pytest): how
# often a probe found the content-digested layout already on disk vs
# had to Hive-partition the corpus
PARTITION_CACHE = {"hits": 0, "builds": 0}


def _build_partitions(sf_dir: str, kind: str, assign_fn) -> str:
    """Hive-partition the embeddings table by an integer bucket column
    (``bucket=<b>/`` dirs) — built ONCE per corpus with a Ray write
    (atomic dir rename), then every probe reads only its partitions.
    ``assign_fn(normalized_matrix) -> int64 bucket per row``."""
    import os
    import shutil
    import tempfile

    import ray.data

    from ..pipelines.derive import CACHE_DIR

    root = _partition_root(sf_dir, kind)
    if os.path.isdir(root):
        PARTITION_CACHE["hits"] += 1
        return root
    PARTITION_CACHE["builds"] += 1
    err: OSError | None = None
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f"emb_{kind}.", dir=CACHE_DIR)

    def add_bucket(batch: pa.Table) -> pa.Table:
        emb = embedding_matrix(batch.column("embedding"))
        # out-of-place: list<double> columns view read-only Arrow memory
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        return batch.append_column("bucket", pa.array(assign_fn(emb), type=pa.int64()))

    ds = _read_parquet_clean(f"{sf_dir}/embeddings.parquet")
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket"]
    )
    try:
        os.replace(tmp, root)
    except OSError as e:
        shutil.rmtree(tmp, ignore_errors=True)  # raced: another build won…
        err = e
    if not os.path.isdir(root):
        # …unless it DIDN'T (permissions / cross-device CACHE_DIR):
        # surface the real failure instead of a downstream empty read
        raise err if err is not None else OSError(f"partition root missing: {root}")
    return root


def _arr_digest(*arrays: np.ndarray) -> str:
    """Content fingerprint of trained arrays (centroids/planes) for
    partition-cache kinds: a cache whose bucket layout came from
    DIFFERENT trained values must never serve a new probe set — a
    count-only or name-only tag cannot see retuned seeds/iters/samples
    (silent recall collapse, no error)."""
    import hashlib

    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()[:12]


def build_srp_partitions(sf_dir: str, planes: np.ndarray) -> str:
    # kind carries plane count AND content (see _arr_digest)
    return _build_partitions(
        sf_dir,
        f"srp{planes.shape[0]}_{_arr_digest(planes)}",
        lambda x: bucket_of(x, planes),
    )


def build_ivf_partitions(sf_dir: str, centroids: np.ndarray) -> str:
    # kind carries the centroid CONTENT (_arr_digest) — supersedes the
    # manual "ivf"→"ivf2" bump: any retuned seed/iters/sample that
    # shifts centroids gets a fresh layout automatically
    return _build_partitions(
        sf_dir,
        f"ivf_{_arr_digest(centroids)}",
        lambda x: nearest_centroid(x, centroids).astype(np.int64),
    )


def probed_paths(root: str, buckets) -> list[str]:
    """Parquet files under the ``bucket=<b>`` partition dirs of the
    probe set — the pruned read: only these leave storage (a list of
    leaf FILES, since ``read_parquet`` treats list entries as files)."""
    import os

    out = []
    for b in sorted(set(int(x) for x in buckets)):
        p = os.path.join(root, f"bucket={b}")
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
    return out


PROBE_RADIUS = 2  # multi-probe Hamming radius: radius 1 read 9/256
# buckets for recall@10 ≈ 0.28; radius 2 reads 37/256 (~14% of the
# corpus at uniform buckets) for recall ≈ 2x — still a pruned scan,
# and the knob the accuracy/cost trade rides on at 100 TB

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def popcount(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for bucket ids up to MAX_PLANES bits (three
    byte-table lookups — numpy 1.x has no bitwise_count)."""
    return (
        _POPCOUNT8[x & 0xFF]
        + _POPCOUNT8[(x >> 8) & 0xFF]
        + _POPCOUNT8[(x >> 16) & 0xFF]
    )


def srp_probe_set(qbuckets: np.ndarray, radius: int = PROBE_RADIUS,
                  n_planes: int = N_PLANES) -> set[int]:
    """Multi-probe set: each query's bucket plus all buckets within
    Hamming distance ``radius`` (must mirror the popcount≤radius
    candidate rule in the scorer; ``n_planes`` must match the planes
    matrix that produced ``qbuckets``)."""
    import itertools

    probe: set[int] = set()
    for b in qbuckets.tolist():
        for r in range(radius + 1):
            for bits in itertools.combinations(range(n_planes), r):
                m = 0
                for j in bits:
                    m |= 1 << j
                probe.add(int(b) ^ m)
    return probe


def make_bucketed_topk_fn(queries_ref, planes: np.ndarray, k: int = 10,
                          radius: int = PROBE_RADIUS):
    """Like make_topk_fn but each batch only scores vectors whose SRP
    bucket matches some query's bucket — the partition-pruned scan.
    ``radius`` MUST equal the ``srp_probe_set`` radius that pruned the
    read (one value drives both sides; a scorer accepting a wider
    Hamming ball than the scan read is a silent recall drop)."""

    cache: dict = {}

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        if "q" not in cache:
            side = ray.get(queries_ref)
            cache["q"], cache["ids"] = side["q"], side["ids"]
            cache["buck"] = bucket_of(cache["q"], planes)
        qn, q_ids, qbuck = cache["q"], cache["ids"], cache["buck"]
        emb = embedding_matrix(batch.column("embedding"))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vbuck = bucket_of(emb_n, planes)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qn)):
            # multi-probe: all buckets within PROBE_RADIUS of the query
            xor = vbuck ^ qbuck[qi]
            sel = np.flatnonzero(popcount(xor) <= radius)
            if len(sel) == 0:
                continue
            sim = emb_n[sel] @ qn[qi]
            order = np.lexsort((vids[sel], -sim))[: min(k, len(sel))]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(vids[sel][order].tolist())
            out_s.extend(sim[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return topk


# ---------------------------------------------------------------------------
# vector aggregate: per-group embedding centroid (exact integer)

def round_e6(v: np.ndarray) -> np.ndarray:
    """round(v * 1e6) half-away-from-zero → int64, matching DuckDB's
    ``CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT)`` bit for bit
    (both sides promote float32 → float64 before the multiply)."""
    x = np.asarray(v, dtype=np.float64) * 1e6  # enforce the promotion
    # here, not at the caller — float32 math flips .5 boundaries
    return np.where(x < 0, np.ceil(x - 0.5), np.floor(x + 0.5)).astype(np.int64)


def _label_sums(lab: np.ndarray, mat: np.ndarray, wt: np.ndarray):
    """(labels, dim-wise int64 sums, weight sums) of rows grouped by
    label — the ONE argsort→reduceat reduce kernel behind
    centroid_partials / centroid_recombine / centroid_combine (any
    carrier-schema or overflow-guard change lands here once)."""
    order = np.argsort(lab, kind="stable")
    sl, sv, sn = lab[order], mat[order], wt[order]
    heads = np.flatnonzero(np.concatenate([[True], sl[1:] != sl[:-1]]))
    return sl[heads], np.add.reduceat(sv, heads, axis=0), np.add.reduceat(sn, heads)


def _sums_list_column(sums: np.ndarray) -> pa.ListArray:
    """(k, d) int64 sum matrix → list<int64> carrier column."""
    k, d = sums.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(k + 1, dtype=np.int64) * d, pa.int32()),
        pa.array(sums.reshape(-1), pa.int64()),
    )


def centroid_partials(batch: pa.Table) -> pa.Table:
    """Map-side half of the per-label embedding centroid: one row per
    label seen in the batch with the dim-wise int64 sum (list column)
    and vector count. Sums are exact integers (round_e6 per element),
    so the reduce is order-independent — float-summation-order parity
    hazards never arise."""
    empty = pa.table(
        {
            "label": pa.array([], pa.int64()),
            "sums": pa.array([], pa.list_(pa.int64())),
            "n": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    v = round_e6(embedding_matrix(batch.column("embedding")))
    if batch.column("label").null_count:
        # NaN→int64 silently yields INT64_MIN while the oracle keeps a
        # NULL group — same contract as embedding_matrix's null guard
        raise ValueError("centroid_partials: null label rows not supported")
    lab = batch.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    labels, sums, counts = _label_sums(lab, v, np.ones(len(lab), np.int64))
    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "sums": _sums_list_column(sums),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def centroid_recombine(batch: pa.Table) -> pa.Table:
    """Map-side TREE step between ``centroid_partials`` and
    ``centroid_combine``: collapse a batch of per-batch partials to one
    row per label, SAME schema in and out — so the stream feeding the
    final label groupby is ≤ labels rows per re-batched chunk instead
    of labels × n_batches rows for the whole corpus (exact-integer sums
    are order-independent, so the tree is value-invariant)."""
    if batch.num_rows == 0:
        return batch
    col = batch.column("sums")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    d = len(col[0])
    mat = np.asarray(col.flatten(), dtype=np.int64).reshape(len(col), d)
    lab = batch.column("label").to_numpy(zero_copy_only=False)
    n = batch.column("n").to_numpy(zero_copy_only=False)
    labels, sums, counts = _label_sums(lab, mat, n)
    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "sums": _sums_list_column(sums),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def centroid_combine(group: pa.Table) -> pa.Table:
    """One label's partials → exploded (label, dim, sum_e6, n_vecs)
    rows — the exact dim-wise centroid numerator/denominator."""
    empty = pa.table(
        {
            "label": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "sum_e6": pa.array([], pa.int64()),
            "n_vecs": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    col = group.column("sums")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    d = len(col[0])
    mat = np.asarray(col.flatten(), dtype=np.int64).reshape(len(col), d)
    lab = group.column("label").to_numpy(zero_copy_only=False)
    n = group.column("n").to_numpy(zero_copy_only=False)
    labels, sums, counts = _label_sums(lab, mat, n)
    k = len(labels)
    return pa.table(
        {
            "label": pa.array(np.repeat(labels, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k), pa.int64()),
            "sum_e6": pa.array(sums.reshape(-1), pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, d), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# PQ variant (scale path 3): product quantization + ADC scoring

PQ_M = 16  # subspaces (64-dim embeddings → 4 dims each)
PQ_K = 64  # codewords per subspace at the 500-vector fixture scale
# (floor of the input-scaled rule below); codes are PQ_M uint8 bytes
# per vector = 16× smaller than float32 regardless of K


def pq_k_for(n_train: int) -> int:
    """Input-scaled codeword count: the largest power of two in
    [32, 256] keeping ≥ ~4 training vectors per centroid per subspace.
    Measured recall@10 (sf0.1, 2000 vectors / 20 queries):
    K=32 → .515, 64 → .545, 128 → .665, 256 → .740 — richer codebooks
    win as soon as the training sample supports them, while the code
    width stays uint8 (K ≤ 256) and the per-query ADC LUT stays
    trivial (PQ_M × K floats). At n=500 (sf0.001 fixture) this returns
    the round-3 operating point K=64."""
    k = 32
    while k < 256 and k * 8 <= n_train:
        k *= 2
    return k


def pq_codebooks(vectors: np.ndarray, m: int = PQ_M, k: int = PQ_K,
                 iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic per-subspace Lloyd's k-means over normalized
    vectors → (m, k, d/m) codebooks. Trained once on a sample and
    broadcast; at 100 TB the encoded corpus is m bytes/vector (16×
    smaller than float32 at the default), so the scan reads codes,
    not embeddings."""
    x = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    d = x.shape[1]
    assert d % m == 0, "PQ_M must divide the embedding dim"
    assert len(x) >= k, "pq_codebooks: need at least PQ_K training vectors"
    ds = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, ds), dtype=np.float64)
    for i in range(m):
        sub = np.ascontiguousarray(x[:, i * ds : (i + 1) * ds])
        c = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        s2 = (sub ** 2).sum(axis=1)[:, None]
        for _ in range(iters):
            # argmin ||s - c||² via the matmul expansion + vectorized
            # centroid update (np.add.at): the (n,1,k) broadcast + per-
            # centroid mask loop cost 3.5 s at K=256/n=2000 on the
            # driver — this form is ~10× cheaper and scales O(n·k·d)
            d2 = s2 - 2.0 * (sub @ c.T) + (c ** 2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, sub)
            cnt = np.bincount(assign, minlength=len(c))
            nz = cnt > 0
            c[nz] = sums[nz] / cnt[nz, None]
        books[i] = c
    return books


def pq_encode(emb_n: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: per subspace, nearest codeword by L2."""
    m, k, ds = books.shape
    codes = np.empty((len(emb_n), m), dtype=np.uint8)
    for i in range(m):
        sub = np.ascontiguousarray(emb_n[:, i * ds : (i + 1) * ds])
        # matmul distance expansion (see pq_codebooks) — this runs per
        # WORKER batch in the scorer, so the cheap form matters twice
        d2 = (
            (sub ** 2).sum(axis=1)[:, None]
            - 2.0 * (sub @ books[i].T)
            + (books[i] ** 2).sum(axis=1)[None, :]
        )
        codes[:, i] = np.argmin(d2, axis=1)
    return codes


def make_pq_topk_fn(queries_ref, books: np.ndarray, k: int = 10):
    """PQ ANN with asymmetric distance computation: each query
    precomputes a (m, k) lookup table of subspace dot products ONCE
    per worker; a batch's score against a query is the LUT sum over
    its codes — no float embedding ever touches the scorer's inner
    loop (the 100 TB shape: the corpus is its PQ_M-byte codes —
    16 bytes at PQ_M=16/PQ_K=64)."""
    cache: dict = {}

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        if "lut" not in cache:
            side = ray.get(queries_ref)
            qn, q_ids = side["q"], side["ids"]
            m, kk, ds = books.shape
            # lut[qi, i, c] = q_sub(i) · codeword c of subspace i
            cache["lut"] = np.einsum(
                "qid,ikd->qik", qn.reshape(len(qn), m, ds), books
            )
            cache["ids"] = q_ids
        lut, q_ids = cache["lut"], cache["ids"]
        emb = embedding_matrix(batch.column("embedding"))
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        codes = pq_encode(emb_n, books)  # at scale: read pre-encoded codes
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        m = books.shape[0]
        out_q, out_v, out_s = [], [], []
        for qi in range(len(lut)):
            # ADC: sum the per-subspace LUT entries selected by each code
            sim = lut[qi][np.arange(m)[None, :], codes].sum(axis=1)
            order = np.lexsort((vids, -sim))[: min(k, len(vids))]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(vids[order].tolist())
            out_s.extend(sim[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return topk


# ---------------------------------------------------------------------------
# IVF near-dup PAIRS — the registered 100 TB embedding-dedup path
# (the exact chunk-pair join in queries.q_dedup_embedding stays as the
# validation oracle; VERDICT r3 §wrong.3)

IVF_DEDUP_PROBES = 3  # each vector lands in its top-p nearest lists —
# a near-dup pair straddling centroid boundaries still meets in a
# runner-up list. Measured on the fixture (16 lists, cos ≥ 0.4):
# p=2 → recall .77, p=3 → .94, p=4 → .99 at 2/3/4× replication —
# p=3 is the documented operating point (recall golden in tests)


def make_ivf_dedup_assign(centroids: np.ndarray, probes: int = IVF_DEDUP_PROBES):
    """Map stage: replicate each vector to its ``probes`` nearest IVF
    lists — (vec_id, embedding, bucket) rows, p× the input. At 100 TB
    the list count must scale with the corpus (train ``ivf_centroids``
    with n_lists ≈ dynamic_buckets(n_rows, 16)) so each list's
    all-pairs stays worker-sized."""

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], batch.column("embedding").type),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        emb = embedding_matrix(batch.column("embedding"))
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        p = min(probes, len(centroids))
        # chunked top-p: replication needs the top-p SET, not its
        # order, and both the score matrix AND the index matrix must
        # stay bounded once list counts are input-scaled
        top = topk_centroids(emb_n, centroids, p)
        rep = pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), p))
        return pa.table(
            {
                "vec_id": batch.column("vec_id").take(rep),
                "embedding": batch.column("embedding").take(rep),
                "bucket": pa.array(top.ravel().astype(np.int64), pa.int64()),
            }
        )

    return assign


def make_ivf_pair_fn(threshold: float):
    """One IVF list → its within-list near-dup pairs (cos ≥ threshold,
    vec_a < vec_b): one (b, b) matmul over the list — O(Σ bᵢ²) total
    work instead of the exact path's O(N²). Pairs meeting in several
    probed lists duplicate; the downstream pair-bucket distinct pass
    dedups them."""
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
    )

    def pairs(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return empty
        emb = embedding_matrix(group.column("embedding"))
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        # chunked pair scan (the nearest_centroid memory invariant):
        # a full (n, n) sim matrix + triu index arrays is ~7 GB each at
        # the designed ~30k-row probed list — instead score row blocks
        # against only the j ≥ block-start suffix (upper triangle by
        # construction, and half the total flops), so one task never
        # holds more than ~chunk × n float64
        chunk = max(256, (1 << 25) // n)
        outs_a, outs_b = [], []
        for s in range(0, n - 1, chunk):
            blk = emb_n[s : s + chunk]
            sim = blk @ emb_n[s:].T  # (b, n-s); local col j' ↔ global s+j'
            bi, bj = np.nonzero(sim >= threshold)
            gi, gj = bi + s, bj + s
            keep = (gj > gi) & (ids[gi] != ids[gj])
            if keep.any():
                a, b = ids[gi[keep]], ids[gj[keep]]
                outs_a.append(np.minimum(a, b))
                outs_b.append(np.maximum(a, b))
        if not outs_a:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(outs_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(outs_b), pa.int64()),
            }
        )

    return pairs


def pair_distinct(group: pa.Table) -> pa.Table:
    """One pair-hash bucket → its distinct (vec_a, vec_b) rows (a pair's
    duplicates all share its hash bucket)."""
    empty = pa.table(
        {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
    )
    if group.num_rows == 0:
        return empty
    t = pa.table({"vec_a": group.column("vec_a"), "vec_b": group.column("vec_b")})
    order = pc.sort_indices(
        t, sort_keys=[("vec_a", "ascending"), ("vec_b", "ascending")]
    )
    g = t.take(order)
    a = g.column("vec_a").to_numpy(zero_copy_only=False)
    b = g.column("vec_b").to_numpy(zero_copy_only=False)
    first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
    return g.filter(pa.array(first))


EMB_D = 64  # embedding dimensionality contract shared by the Gram
# emitter and decoder — gram keys are i*EMB_D + j, so a mismatched
# input dim must raise here rather than silently decode to wrong pairs


def gram_partials(batch: pa.Table) -> pa.Table:
    """Map-side half of the corpus Gram matrix Σ vᵀv — the distributed
    front half of PCA/whitening: ONE int64 (d,d) matmul per batch over
    the round_e6 integer matrix, emitted as upper-triangle rows keyed
    ``k = i*d + j`` (d(d+1)/2 rows per batch, never the vectors).
    Exact-integer contract: sums are order-independent; |v|·e6 ≈ 2e6
    per element bounds the int64 sum at ~2.3e6 corpus rows per 1.0 of
    feature scale — beyond that re-scale (round_e3) or shard the
    reduce (documented, same as the centroid carrier)."""
    empty = pa.table(
        {
            "k": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    v = round_e6(embedding_matrix(batch.column("embedding")))
    d = v.shape[1]
    if d != EMB_D:
        raise ValueError(f"gram_partials: dim {d} != EMB_D={EMB_D}")
    g = v.T @ v
    iu, ju = np.triu_indices(d)
    return pa.table(
        {
            "k": pa.array(iu * d + ju, pa.int64()),
            "s": pa.array(g[iu, ju], pa.int64()),
        }
    )


def gram_precombine(batch: pa.Table) -> pa.Table:
    """Map-side TREE step for the Gram reduce: sum the (k, s) partial
    rows by k within a (re-batched, multi-block) chunk — same schema in
    and out, shrinking the stream by ~batch_size/2080 per pass before
    the one bounded groupby. Chainable (apply twice for another factor)
    because the int64 sums are order-independent."""
    if batch.num_rows == 0:
        return batch
    k = batch.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
    s = batch.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    sk, ss = k[order], s[order]
    heads = np.flatnonzero(np.concatenate([[True], sk[1:] != sk[:-1]]))
    return pa.table(
        {
            "k": pa.array(sk[heads], pa.int64()),
            "s": pa.array(np.add.reduceat(ss, heads), pa.int64()),
        }
    )


def gram_finish(batch: pa.Table, d: int = EMB_D) -> pa.Table:
    """Unpack the reduced (k, sum) rows to (i, j, s)."""
    k = batch.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
    s = batch.column(batch.column_names[1])
    return pa.table(
        {
            "i": pa.array(k // d, pa.int64()),
            "j": pa.array(k % d, pa.int64()),
            "s": pc.cast(s, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# two-level (hierarchical) IVF quantizer — the scale path past the
# single-level training ceiling (queries.MAX_TRAIN_LISTS): a coarse
# driver k-means picks ~HIER_COARSE cells, then each cell's share of
# fine lists trains DISTRIBUTED (one map_groups task per cell over
# that cell's training rows), and the driver only ever holds
# CENTROIDS (n_lists × d floats), never a corpus-linear sample.
# Standard IVF-IMI shape (FAISS coarse+fine), re-expressed Ray-first.

HIER_COARSE = 256       # coarse cells; each fine k-means sees
                        # ~sample/256 rows — a bounded worker problem
HIER_PROBE_CELLS = 3    # coarse cells a vector considers when picking
                        # its top-p fine lists (candidates per vector =
                        # probe_cells × subs_per_cell, not n_lists)


def hier_cell_rows(centroids: np.ndarray):
    """Map stage: tag each embedding row with its nearest COARSE cell
    (the shuffle key of the distributed fine-level training)."""

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # propagate the SOURCE list type — a hardcoded float32
            # empty block would schema-mismatch a list<double> corpus
            return pa.table(
                {
                    "embedding": pa.array([], batch.column("embedding").type),
                    "cell": pa.array([], pa.int64()),
                }
            )
        emb = embedding_matrix(batch.column("embedding"))
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cell = nearest_centroid(emb_n, centroids).astype(np.int64)
        return pa.table(
            {"embedding": batch.column("embedding"), "cell": pa.array(cell)}
        )

    return tag


def make_hier_subs_fn(subs_per_cell: int, seed: int = 42):
    """Group fn: ONE coarse cell's training rows → its fine
    sub-centroids as (cell, sub, centroid list<double>) rows. Runs as
    a worker task — the fine level never touches the driver."""

    def subs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cell": pa.array([], pa.int64()),
                "sub": pa.array([], pa.int64()),
                "centroid": pa.array([], pa.list_(pa.float64())),
            }
        )
        if group.num_rows == 0:
            return empty
        emb = embedding_matrix(group.column("embedding"))
        k = max(1, min(subs_per_cell, len(emb)))
        c = ivf_centroids(emb, n_lists=k, seed=seed)
        cell = int(group.column("cell")[0].as_py())
        return pa.table(
            {
                "cell": pa.array([cell] * len(c), pa.int64()),
                "sub": pa.array(np.arange(len(c), dtype=np.int64)),
                "centroid": pa.array([row.tolist() for row in c],
                                     pa.list_(pa.float64())),
            }
        )

    return subs


def train_hier_quantizer(ds, coarse: np.ndarray, subs_per_cell: int,
                         seed: int = 42):
    """Distributed fine-level training over a Dataset of training
    embeddings: tag by coarse cell → groupby(cell) (≤ HIER_COARSE
    groups) → per-cell k-means task → collect centroids.

    Returns (subs_flat, cell_off): sub-centroids stacked (total_lists,
    d) and (k1+1,) offsets so cell c's lists are global ids
    [cell_off[c], cell_off[c+1]). A coarse cell with no training rows
    falls back to its coarse centroid as a single fine list, so every
    cell has ≥ 1 list and assignment never dead-ends."""
    k1 = len(coarse)
    tagged = ds.map_batches(hier_cell_rows(coarse), batch_format="pyarrow")

    got = (
        tagged.repartition(max(1, min(k1, 64)))
        .groupby("cell")
        .map_groups(make_hier_subs_fn(subs_per_cell, seed), batch_format="pyarrow")
        # skewed training rows can leave coarse cells empty, so some of
        # the ≤64 reduce partitions receive no groups and emit
        # SCHEMA-LESS blocks; a map_batches re-type can never see them
        # (Ray skips zero-row blocks — CLAUDE.md) — REBUILD the blocks
        # instead, which the sibling q_dedup_embedding_ann launder does
        .repartition(8)  # ≤ k1 × subs_per_cell centroid rows — tiny
        .to_pandas()
    )
    per_cell: dict[int, np.ndarray] = {}
    for cell, grp in got.groupby("cell"):
        g = grp.sort_values("sub")
        per_cell[int(cell)] = np.vstack([np.asarray(v) for v in g["centroid"]])
    parts, off = [], np.zeros(k1 + 1, dtype=np.int64)
    for c in range(k1):
        block = per_cell.get(c)
        if block is None:
            block = coarse[c : c + 1]  # empty cell → coarse fallback list
        parts.append(block)
        off[c + 1] = off[c] + len(block)
    return np.vstack(parts), off


def make_hier_dedup_assign(coarse: np.ndarray, subs_flat: np.ndarray,
                           cell_off: np.ndarray,
                           probes: int = IVF_DEDUP_PROBES,
                           probe_cells: int = HIER_PROBE_CELLS):
    """Two-level top-p assignment: score the HIER_COARSE coarse cells,
    take the top probe_cells, score ONLY those cells' fine lists
    (via the shared ``_hier_candidates`` pass), and
    replicate to the global top-p — candidates per vector are
    probe_cells × subs_per_cell instead of n_lists. Emits the same
    (vec_id, embedding, bucket) rows as make_ivf_dedup_assign, so the
    downstream within-list pair matmul + pair-distinct stages are
    unchanged. Batch-size note: the scorer builds ~probe_cells ×
    subs_per_cell candidates per row; size batches so rows ×
    candidates × 16 B fits the worker heap."""

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.array([], batch.column("embedding").type),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        emb = embedding_matrix(batch.column("embedding"))
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        rs, ls, rank = _hier_candidates(
            emb_n, coarse, subs_flat, cell_off, probe_cells
        )
        keep = rank < probes
        take = pa.array(rs[keep])
        return pa.table(
            {
                "vec_id": batch.column("vec_id").take(take),
                "embedding": batch.column("embedding").take(take),
                "bucket": pa.array(ls[keep], pa.int64()),
            }
        )

    return assign


def _hier_candidates(x: np.ndarray, coarse: np.ndarray,
                     subs_flat: np.ndarray, cell_off: np.ndarray,
                     probe_cells: int):
    """Flat per-row candidate pass of the two-level descent: each row's
    fine lists within its top ``probe_cells`` coarse cells, returned as
    (rows, lists, rank) sorted by row, rank ordered by (score desc,
    list asc) within the row. The ONE home of the top-p selection rule
    — make_hier_dedup_assign (corpus side) and hier_probe (query side)
    must share it or the replication and probe rules silently drift."""
    pc_ = min(probe_cells, len(coarse))
    cells = np.argpartition(-(x @ coarse.T), pc_ - 1, axis=1)[:, :pc_]
    row_of = np.repeat(np.arange(len(x), dtype=np.int64), pc_)
    cell_flat = cells.ravel()
    rows_l, scores_l, lists_l = [], [], []
    # vectorized per-CELL gather (≤ k1 iterations, never per row)
    for cell in np.unique(cell_flat):
        m = cell_flat == cell
        r = row_of[m]
        sub = subs_flat[cell_off[cell] : cell_off[cell + 1]]
        sc = x[r] @ sub.T  # (rows probing this cell, subs)
        kk = sub.shape[0]
        rows_l.append(np.repeat(r, kk))
        scores_l.append(sc.ravel())
        lists_l.append(
            np.tile(np.arange(kk, dtype=np.int64) + cell_off[cell], len(r))
        )
    rows_a = np.concatenate(rows_l)
    scores_a = np.concatenate(scores_l)
    lists_a = np.concatenate(lists_l)
    order = np.lexsort((lists_a, -scores_a, rows_a))
    rs = rows_a[order]
    starts = np.flatnonzero(np.concatenate([[True], rs[1:] != rs[:-1]]))
    rank = np.arange(len(rs)) - np.repeat(
        starts, np.diff(np.concatenate([starts, [len(rs)]]))
    )
    return rs, lists_a[order], rank


def hier_top1(coarse: np.ndarray, subs_flat: np.ndarray, cell_off: np.ndarray):
    """(n,) global fine-list id per normalized row via the two-level
    descent (nearest coarse cell → nearest sub within it) — the
    partition key of the hier-IVF Hive layout, and the scorer's
    membership rule (they MUST share this function, same invariant as
    NPROBE)."""

    def top1(emb_n: np.ndarray) -> np.ndarray:
        cells = nearest_centroid(emb_n, coarse)
        out = np.empty(len(emb_n), dtype=np.int64)
        for cell in np.unique(cells):
            m = cells == cell
            sub = subs_flat[cell_off[cell] : cell_off[cell + 1]]
            out[m] = cell_off[cell] + np.argmax(emb_n[m] @ sub.T, axis=1)
        return out

    return top1


def hier_probe(qn: np.ndarray, coarse: np.ndarray, subs_flat: np.ndarray,
               cell_off: np.ndarray, nprobe: int = NPROBE,
               probe_cells: int = HIER_PROBE_CELLS) -> np.ndarray:
    """(Q, ≤nprobe) probed GLOBAL fine-list ids per normalized query —
    top probe_cells coarse cells, then the best nprobe fine lists among
    those cells' subs. Single source of truth for the pruned read AND
    the scorer (the NPROBE agreement invariant)."""
    nq = len(qn)
    # the SAME candidate pass the corpus-side assign uses (shared rule)
    rs, ls, rank = _hier_candidates(qn, coarse, subs_flat, cell_off, probe_cells)
    keep = rank < nprobe
    out = np.zeros((nq, nprobe), dtype=np.int64)
    fill = np.zeros(nq, dtype=np.int64)
    kr, kl = rs[keep], ls[keep]
    out[kr, rank[keep]] = kl
    np.maximum.at(fill, kr, rank[keep] + 1)
    # pad short rows with their last probed id (dup ids are harmless
    # to both probed_paths and np.isin)
    for i in np.flatnonzero(fill < nprobe):
        out[i, fill[i]:] = out[i, max(0, fill[i] - 1)]
    return out


def make_hier_topk_fn(queries_ref, coarse: np.ndarray, subs_flat: np.ndarray,
                      cell_off: np.ndarray, k: int = 10, nprobe: int = NPROBE,
                      qprobe: np.ndarray | None = None):
    """Two-level IVF ANN scorer: like make_ivf_topk_fn but membership
    and probes use the hier descent, so it pairs with a Hive layout
    partitioned by ``hier_top1`` and a read pruned by ``hier_probe``.
    Pass the driver's ``hier_probe`` matrix as ``qprobe`` so workers
    reuse it instead of recomputing per process."""
    cache: dict = {}
    top1 = hier_top1(coarse, subs_flat, cell_off)

    def topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_topk()
        if "q" not in cache:
            side = ray.get(queries_ref)
            cache["q"], cache["ids"] = side["q"], side["ids"]
            cache["probe"] = (
                qprobe
                if qprobe is not None
                else hier_probe(cache["q"], coarse, subs_flat, cell_off, nprobe)
            )
        qn, q_ids, qprobe_m = cache["q"], cache["ids"], cache["probe"]
        emb = embedding_matrix(batch.column("embedding"))
        vids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        vlist = top1(emb_n)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qn)):
            sel = np.flatnonzero(np.isin(vlist, qprobe_m[qi]))
            if len(sel) == 0:
                continue
            sim = emb_n[sel] @ qn[qi]
            order = np.lexsort((vids[sel], -sim))[: min(k, len(sel))]
            out_q.extend([int(q_ids[qi])] * len(order))
            out_v.extend(vids[sel][order].tolist())
            out_s.extend(sim[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return topk
