"""ANN recall@10 sweep over the real knobs, at any scale factor.

Replicates each pipeline's candidate rule bit-for-bit with the SAME
trained artifacts the distributed path broadcasts (srp_planes /
ivf_centroids / pq_codebooks from stages.similarity), so the recall
numbers here are the recall of the registered queries — only the
scoring loop runs driver-local (the corpus at every test sf fits one
numpy matrix; the distributed path is what ships).

Usage: python tools/ann_recall.py [sf_dir]

Prints a markdown table per family:
  - SRP-LSH: Hamming probe radius 0..3  (knob: PROBE_RADIUS)
  - IVF:     nprobe 1..8                (knob: NPROBE)
  - PQ:      codewords K in {32,64,128,256} (knob: PQ_K)
  - IVF near-dup pairs: probes p in {2,3,4} (knob: IVF_DEDUP_PROBES)
"read" = fraction of corpus rows the pruned scan touches (PQ reads
16-byte codes of everything, so its column shows code bytes/vector).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prclz_ray.stages.similarity import (  # noqa: E402
    _POPCOUNT8,
    IVF_DEDUP_PROBES,
    NPROBE,
    PROBE_RADIUS,
    bucket_of,
    embedding_matrix,
    ivf_centroids,
    pq_codebooks,
    pq_encode,
    pq_k_for,
    srp_planes,
)
from prclz_ray.stages.scaling import dynamic_buckets  # noqa: E402


def exact_topk(emb_n: np.ndarray, vids: np.ndarray, qsel: np.ndarray,
               k: int = 10) -> dict[int, set[int]]:
    """Ground truth: per query, top-k by (cosine desc, vec_id asc) —
    identical to SQL_ANN_TOPK's row_number ordering."""
    truth = {}
    for qi in qsel:
        sim = emb_n @ emb_n[qi]
        order = np.lexsort((vids, -sim))[:k]
        truth[int(vids[qi])] = set(vids[order].tolist())
    return truth


def recall_of(found: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    hits = sum(len(found.get(q, set()) & t) for q, t in truth.items())
    return hits / sum(len(t) for t in truth.values())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    emb = embedding_matrix(t.column("embedding"))
    vids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    n = len(emb_n)
    qsel = np.flatnonzero(vids % 100 == 0)
    truth = exact_topk(emb_n, vids, qsel)
    print(f"# {sf_dir}: n={n} vectors, {len(qsel)} queries, k=10\n")

    # ---- SRP-LSH: per-query candidates = popcount(bucket^qbucket) <= r
    planes = srp_planes(emb.shape[1])
    vbuck = bucket_of(emb_n, planes)
    print("## SRP-LSH (knob PROBE_RADIUS, current "
          f"{PROBE_RADIUS})\n\n| radius | recall@10 | per-query read | "
          "union read |\n|---|---|---|---|")
    for radius in range(4):
        found, read_rows, perq = {}, set(), []
        for qi in qsel:
            sel = np.flatnonzero(_POPCOUNT8[vbuck ^ vbuck[qi]] <= radius)
            read_rows.update(sel.tolist())
            perq.append(len(sel) / n)
            sim = emb_n[sel] @ emb_n[qi]
            order = np.lexsort((vids[sel], -sim))[:10]
            found[int(vids[qi])] = set(vids[sel][order].tolist())
        mark = " <-- current" if radius == PROBE_RADIUS else ""
        print(f"| {radius} | {recall_of(found, truth):.3f} | "
              f"{np.mean(perq):.1%} | {len(read_rows) / n:.1%}{mark} |")

    # ---- IVF top-k: candidates = vectors whose nearest list is probed
    n_lists = dynamic_buckets(n, 16, rows_per_group=125)
    cents = ivf_centroids(emb, n_lists=n_lists)
    assign = np.argmax(emb_n @ cents.T, axis=1)
    order_lists = np.argsort(-(emb_n @ cents.T), axis=1)
    print(f"\n## IVF (knob NPROBE, current {NPROBE}; "
          f"{len(cents)} input-scaled lists)\n\n"
          "| nprobe | recall@10 | per-query read | union read |\n|---|---|---|---|")
    for nprobe in (1, 2, 3, 4, 6, 8):
        found, read_rows, perq = {}, set(), []
        for qi in qsel:
            probed = order_lists[qi, :nprobe]
            sel = np.flatnonzero(np.isin(assign, probed))
            read_rows.update(sel.tolist())
            perq.append(len(sel) / n)
            sim = emb_n[sel] @ emb_n[qi]
            o = np.lexsort((vids[sel], -sim))[:10]
            found[int(vids[qi])] = set(vids[sel][o].tolist())
        mark = " <-- current" if nprobe == NPROBE else ""
        print(f"| {nprobe} | {recall_of(found, truth):.3f} | "
              f"{np.mean(perq):.1%} | {len(read_rows) / n:.1%}{mark} |")

    # ---- PQ: ADC over ALL codes (no pruning; the saving is 16B/vec)
    k_dyn = pq_k_for(n)
    print(f"\n## PQ (knob pq_k_for(n), here K={k_dyn}; M=16 -> 16B codes)\n\n"
          "| K | recall@10 | train vecs/centroid |\n|---|---|---|")
    for K in (32, 64, 128, 256):
        if n < K:
            print(f"| {K} | (skipped: n<{K}) | — |")
            continue
        books = pq_codebooks(emb_n, k=K)
        codes = pq_encode(emb_n, books)
        m, _, dsub = books.shape
        found = {}
        for qi in qsel:
            lut = np.einsum("id,ikd->ik", emb_n[qi].reshape(m, dsub), books)
            score = lut[np.arange(m)[None, :], codes].sum(axis=1)
            o = np.lexsort((vids, -score))[:10]
            found[int(vids[qi])] = set(vids[o].tolist())
        mark = " <-- current" if K == k_dyn else ""
        print(f"| {K} | {recall_of(found, truth):.3f} | {n // K}{mark} |")

    # ---- IVF near-dup pairs (dedup_embedding_ann): pair found iff the
    # two vectors co-occur in some list after top-p replication
    n_lists = dynamic_buckets(n, 16, rows_per_group=10_000)
    dcents = ivf_centroids(emb, n_lists=n_lists)
    dorder = np.argsort(-(emb_n @ dcents.T), axis=1)
    sims = emb_n @ emb_n.T
    iu = np.triu_indices(n, k=1)
    true_pairs = {(int(vids[min(a, b)]), int(vids[max(a, b)]))
                  for a, b in zip(*[x[sims[iu] >= 0.4] for x in iu])}
    print(f"\n## IVF near-dup pairs (knob IVF_DEDUP_PROBES, current "
          f"{IVF_DEDUP_PROBES}; {n_lists} lists, cos>=0.4, "
          f"{len(true_pairs)} true pairs)\n\n"
          "| probes | pair recall | replication |\n|---|---|---|")
    for p in (2, 3, 4):
        lists = [set(np.flatnonzero((dorder[:, :p] == j).any(axis=1)).tolist())
                 for j in range(n_lists)]
        got = set()
        for members in lists:
            mm = sorted(members)
            for i, a in enumerate(mm):
                for b in mm[i + 1:]:
                    if sims[a, b] >= 0.4:
                        got.add((int(vids[min(a, b)]), int(vids[max(a, b)])))
        rec = len(got & true_pairs) / max(1, len(true_pairs))
        mark = " <-- current" if p == IVF_DEDUP_PROBES else ""
        print(f"| {p} | {rec:.3f} | {p}x{mark} |")


if __name__ == "__main__":
    main()
