"""ANN recall@10 sweep over the real knobs, at any scale factor.

Replicates each pipeline's candidate rule bit-for-bit with the SAME
trained artifacts the distributed path broadcasts — same input-scaled
structure sizes (srp_n_planes_for / dynamic_buckets / pq_k_for), same
STRIDED training sample (queries._embedding_sample, never the whole
corpus), same chunked assignment (nearest_centroid) — so the recall
numbers here are the recall of the registered queries. Only the
scoring loop runs driver-local (the corpus at every test sf fits one
numpy matrix; the distributed path is what ships). Past
MAX_TRAIN_LISTS the registered queries dispatch to the two-level
quantizer; this sweep measures the single-level rule and says so.

Usage: python tools/ann_recall.py [sf_dir]

Prints a markdown table per family:
  - SRP-LSH: Hamming probe radius 0..3  (knob: PROBE_RADIUS)
  - IVF:     nprobe 1..8                (knob: NPROBE)
  - PQ:      codewords K in {32,64,128,256} (knob: pq_k_for)
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

from prclz_ray.queries import (  # noqa: E402
    EMB_TRAIN_SAMPLE,
    MAX_TRAIN_LISTS,
    TRAIN_PER_LIST,
    _embedding_sample,
)
from prclz_ray.stages.similarity import (  # noqa: E402
    IVF_DEDUP_PROBES,
    NPROBE,
    PROBE_RADIUS,
    bucket_of,
    embedding_matrix,
    ivf_centroids,
    nearest_centroid,
    popcount,
    pq_codebooks,
    pq_encode,
    pq_k_for,
    srp_n_planes_for,
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
    denom = sum(len(t) for t in truth.values())
    if denom == 0:
        return float("nan")
    hits = sum(len(found.get(q, set()) & t) for q, t in truth.items())
    return hits / denom


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    path = f"{sf_dir}/embeddings.parquet"
    t = pq.read_table(path)
    emb = embedding_matrix(t.column("embedding"))
    vids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    emb_n = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    n = len(emb_n)
    qsel = np.flatnonzero(vids % 100 == 0)
    if len(qsel) == 0:
        print(f"# {sf_dir}: n={n} vectors but NO query rows "
              "(no vec_id % 100 == 0) — nothing to sweep")
        return
    truth = exact_topk(emb_n, vids, qsel)
    print(f"# {sf_dir}: n={n} vectors, {len(qsel)} queries, k=10\n")

    # ---- SRP-LSH: per-query candidates = popcount(bucket^qbucket) <= r
    # INPUT-SCALED plane count — the same srp_n_planes_for(n) the
    # registered q_ann_topk_lsh uses (a fixed 8 planes would measure a
    # structure the shipped query does not build past ~2.5M vectors)
    n_planes = srp_n_planes_for(n)
    planes = srp_planes(emb.shape[1], n_planes=n_planes)
    vbuck = bucket_of(emb_n, planes)
    print(f"## SRP-LSH (knob PROBE_RADIUS, current {PROBE_RADIUS}; "
          f"{n_planes} input-scaled planes)\n\n"
          "| radius | recall@10 | per-query read | "
          "union read |\n|---|---|---|---|")
    for radius in range(4):
        found, read_rows, perq = {}, set(), []
        for qi in qsel:
            sel = np.flatnonzero(popcount(vbuck ^ vbuck[qi]) <= radius)
            read_rows.update(sel.tolist())
            perq.append(len(sel) / n)
            sim = emb_n[sel] @ emb_n[qi]
            order = np.lexsort((vids[sel], -sim))[:10]
            found[int(vids[qi])] = set(vids[sel][order].tolist())
        mark = " <-- current" if radius == PROBE_RADIUS else ""
        print(f"| {radius} | {recall_of(found, truth):.3f} | "
              f"{np.mean(perq):.1%} | {len(read_rows) / n:.1%}{mark} |")

    # ---- IVF top-k: candidates = vectors whose nearest list is probed.
    # Same training rule as q_ann_topk_ivf (queries.py): strided sample
    # of TRAIN_PER_LIST vectors per list, never the whole corpus; the
    # corpus assignment runs through the chunked nearest_centroid.
    n_lists = dynamic_buckets(n, 16, rows_per_group=125)
    if n_lists > MAX_TRAIN_LISTS:
        print(f"\n## IVF: n_lists={n_lists} > MAX_TRAIN_LISTS="
              f"{MAX_TRAIN_LISTS} — the registered query dispatches to "
              "the TWO-LEVEL quantizer here; this sweep measures the "
              "single-level rule only")
    train = _embedding_sample(path, cap=TRAIN_PER_LIST * n_lists)
    cents = ivf_centroids(train, n_lists=n_lists)
    assign = nearest_centroid(emb_n, cents)
    # probe orderings are needed ONLY at query rows — a full-corpus
    # (n × n_lists) argsort would be tens of GB at input-scaled n_lists
    qorder = np.argsort(-(emb_n[qsel] @ cents.T), axis=1)
    print(f"\n## IVF (knob NPROBE, current {NPROBE}; "
          f"{len(cents)} input-scaled lists, sample-trained)\n\n"
          "| nprobe | recall@10 | per-query read | union read |\n|---|---|---|---|")
    for nprobe in (1, 2, 3, 4, 6, 8):
        found, read_rows, perq = {}, set(), []
        for row, qi in enumerate(qsel):
            probed = qorder[row, :nprobe]
            sel = np.flatnonzero(np.isin(assign, probed))
            read_rows.update(sel.tolist())
            perq.append(len(sel) / n)
            sim = emb_n[sel] @ emb_n[qi]
            o = np.lexsort((vids[sel], -sim))[:10]
            found[int(vids[qi])] = set(vids[sel][o].tolist())
        mark = " <-- current" if nprobe == NPROBE else ""
        print(f"| {nprobe} | {recall_of(found, truth):.3f} | "
              f"{np.mean(perq):.1%} | {len(read_rows) / n:.1%}{mark} |")

    # ---- PQ: ADC over ALL codes (no pruning; the saving is 16B/vec).
    # Codebooks train on the strided sample exactly like q_ann_topk_pq
    # (books = pq_codebooks(_embedding_sample(path), k=pq_k_for(len(sample))))
    sample = _embedding_sample(path)  # cap = EMB_TRAIN_SAMPLE
    k_dyn = pq_k_for(len(sample))
    print(f"\n## PQ (knob pq_k_for(sample), here K={k_dyn}; "
          f"{len(sample)}-row training sample; M=16 -> 16B codes)\n\n"
          "| K | recall@10 | train vecs/centroid |\n|---|---|---|")
    for K in (32, 64, 128, 256):
        if len(sample) < K:
            print(f"| {K} | (skipped: sample<{K}) | — |")
            continue
        books = pq_codebooks(sample, k=K)
        codes = pq_encode(emb_n, books)
        m, _, dsub = books.shape
        found = {}
        for qi in qsel:
            lut = np.einsum("id,ikd->ik", emb_n[qi].reshape(m, dsub), books)
            score = lut[np.arange(m)[None, :], codes].sum(axis=1)
            o = np.lexsort((vids, -score))[:10]
            found[int(vids[qi])] = set(vids[o].tolist())
        mark = " <-- current" if K == k_dyn else ""
        print(f"| {K} | {recall_of(found, truth):.3f} | "
              f"{len(sample) // K}{mark} |")

    # ---- IVF near-dup pairs (dedup_embedding_ann): pair found iff the
    # two vectors co-occur in some list after top-p replication. Same
    # sample-trained quantizer as the registered query; top-p lists per
    # vector computed in bounded chunks (never a full n × n_lists
    # argsort on the driver).
    PMAX = 4
    n_lists_d = dynamic_buckets(n, 16, rows_per_group=10_000)
    dtrain = _embedding_sample(
        path, cap=max(EMB_TRAIN_SAMPLE, TRAIN_PER_LIST * n_lists_d)
    )
    dcents = ivf_centroids(dtrain, n_lists=n_lists_d)
    p_eff = min(PMAX, n_lists_d)
    dtop = np.empty((n, p_eff), dtype=np.int64)
    chunk = max(1, (1 << 22) // max(1, n_lists_d))
    for s0 in range(0, n, chunk):
        sc = emb_n[s0:s0 + chunk] @ dcents.T
        if n_lists_d > p_eff:
            part = np.argpartition(-sc, p_eff - 1, axis=1)[:, :p_eff]
        else:
            part = np.tile(np.arange(n_lists_d), (len(sc), 1))
        row = np.arange(len(sc))[:, None]
        order = np.argsort(-sc[row, part], axis=1)
        dtop[s0:s0 + chunk] = part[row, order]
    sims = emb_n @ emb_n.T
    iu = np.triu_indices(n, k=1)
    pair_mask = sims[iu] >= 0.4
    true_pairs = {(int(vids[min(a, b)]), int(vids[max(a, b)]))
                  for a, b in zip(iu[0][pair_mask], iu[1][pair_mask])}
    print(f"\n## IVF near-dup pairs (knob IVF_DEDUP_PROBES, current "
          f"{IVF_DEDUP_PROBES}; {n_lists_d} lists, cos>=0.4, "
          f"{len(true_pairs)} true pairs, sample-trained)\n\n"
          "| probes | pair recall | replication |\n|---|---|---|")
    for p in (2, 3, 4):
        pe = min(p, p_eff)
        # invert the (vector -> top-p lists) map in one pass
        flat = dtop[:, :pe].ravel()
        vec = np.repeat(np.arange(n, dtype=np.int64), pe)
        order = np.argsort(flat, kind="stable")
        fl, vc = flat[order], vec[order]
        heads = np.flatnonzero(np.concatenate([[True], fl[1:] != fl[:-1]]))
        bounds = np.concatenate([heads, [len(fl)]])
        got = set()
        for i in range(len(heads)):
            mm = np.sort(vc[bounds[i]:bounds[i + 1]])
            for ai, a in enumerate(mm):
                for b in mm[ai + 1:]:
                    if sims[a, b] >= 0.4:
                        got.add((int(vids[min(a, b)]), int(vids[max(a, b)])))
        rec = len(got & true_pairs) / max(1, len(true_pairs))
        mark = " <-- current" if p == IVF_DEDUP_PROBES else ""
        print(f"| {p} | {rec:.3f} | {p}x{mark} |")


if __name__ == "__main__":
    main()
