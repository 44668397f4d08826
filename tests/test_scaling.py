"""Input-scaled bucket counts (stages/scaling.py): the VERDICT r3
fix for fixed bucket constants — group size must stay bounded and
reduce parallelism must grow as the corpus grows, while results stay
bucket-count-INVARIANT (the property the multi-CPU oracle gate rests
on)."""

import numpy as np
import pyarrow as pa
import pytest

from prclz_ray.stages.scaling import (
    MAX_BUCKETS,
    TARGET_GROUP_ROWS,
    dynamic_buckets,
    parquet_rows,
)


def test_dynamic_buckets_floor_growth_cap():
    # below the crossover: the tuned test-scale floor, exactly
    assert dynamic_buckets(500, 64) == 64
    assert dynamic_buckets(64 * TARGET_GROUP_ROWS, 64) == 64
    # above: grows linearly with input rows → group size stays bounded
    n = 1000 * TARGET_GROUP_ROWS
    assert dynamic_buckets(n, 64) == 1000
    assert n / dynamic_buckets(n, 64) <= TARGET_GROUP_ROWS
    # monotone in n_rows
    bs = [dynamic_buckets(k * TARGET_GROUP_ROWS, 64) for k in (1, 100, 10_000)]
    assert bs == sorted(bs)
    # capped at the scheduler backstop
    assert dynamic_buckets(10**18, 64) == MAX_BUCKETS


def test_parquet_rows_footer_walk(tmp_path):
    import pyarrow.parquet as pq

    t = pa.table({"x": pa.array(range(123), pa.int64())})
    f1 = tmp_path / "a.parquet"
    pq.write_table(t, f1)
    d = tmp_path / "shards"
    d.mkdir()
    pq.write_table(t.slice(0, 23), d / "s0.parquet")
    pq.write_table(t.slice(23), d / "s1.parquet")
    assert parquet_rows(str(f1)) == 123
    assert parquet_rows(str(d)) == 123
    assert parquet_rows([str(f1), str(d)]) == 246


def test_results_invariant_to_bucket_count(ray_session):
    """line_dedup's output is identical under the default and a tiny
    forced bucket count — buckets move WHERE rows meet, never WHAT is
    computed (the contract that makes input-scaling safe)."""
    from functools import partial

    import ray.data

    from prclz_ray.stages.curation import (
        doc_line_rows,
        line_flag_rows,
        reassemble_docs,
    )

    rng = np.random.default_rng(7)
    texts = []
    dup_line = " ".join(f"w{i}" for i in range(10))
    for d in range(40):
        words = [f"t{d}_{i}" for i in range(int(rng.integers(5, 40)))]
        body = " ".join(words)
        texts.append(dup_line + " " + body if d % 3 == 0 else body)
    docs = pa.table(
        {"doc_id": pa.array(range(40), pa.int64()), "text": pa.array(texts)}
    )

    def run(lb, db):
        ds = ray.data.from_arrow(docs)
        rows = ds.map_batches(
            partial(doc_line_rows, n_buckets=lb), batch_format="pyarrow"
        )
        flagged = rows.groupby("lb").map_groups(
            partial(line_flag_rows, doc_buckets=db), batch_format="pyarrow"
        )
        out = flagged.groupby("db").map_groups(
            reassemble_docs, batch_format="pyarrow"
        )
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    a = run(1024, 256)
    b = run(3, 2)
    assert a.equals(b)
    assert (a.loc[a.doc_id % 3 == 0, "n_dropped"] >= 1).all()


def test_pagerank_buckets_scale_with_edges(ray_session):
    """pagerank derives its host-bucket count from the materialized
    edge count; the public knob (edge_buckets) threads through without
    changing results."""
    import ray.data

    from prclz_ray.stages.curation import pagerank

    links = pa.table(
        {
            "src": pa.array([f"h{i % 7}" for i in range(100)]),
            "dst": pa.array([f"h{(i * 3) % 7}" for i in range(100)]),
        }
    )
    a = (
        pagerank(ray.data.from_arrow(links), scale=10**6)
        .to_pandas().sort_values("host").reset_index(drop=True)
    )
    b = (
        pagerank(ray.data.from_arrow(links), scale=10**6, edge_buckets=3)
        .to_pandas().sort_values("host").reset_index(drop=True)
    )
    assert a.equals(b)


def test_pq_k_for_scaling_rule():
    """PQ codewords scale with the training sample: >= ~8 vectors per
    centroid, K a power of two in [32, 256] so codes stay uint8 and
    test-scale operating points match the documented sweep (BASELINE
    round 4: K=64 at n=500 -> recall .72, K=256 at n=2000 -> .74)."""
    from prclz_ray.stages.similarity import pq_k_for

    assert pq_k_for(500) == 64     # sf0.001 fixture (round-3 point)
    assert pq_k_for(2000) == 256   # sf0.1
    assert pq_k_for(100) == 32     # floor: tiny corpora
    ks = [pq_k_for(n) for n in (100, 300, 500, 1000, 2000, 10**6)]
    assert ks == sorted(ks)        # monotone in n
    assert all(32 <= k <= 256 and (k & (k - 1)) == 0 for k in ks)
    # degeneracy bound above the K=32 floor: >= 4 vectors per centroid
    # (the doubling rule stops once the NEXT K would drop below 8)
    assert all(
        n // pq_k_for(n) >= 4 for n in (300, 500, 2000, 10**6) if pq_k_for(n) > 32
    )


def test_shuffle_bucket_width_never_overflows():
    """Range-bucket width must be CEIL(HASH_SPAN / n): with the old
    floor width, the top (HASH_SPAN mod n) hash values landed in
    bucket index n — out of range for bucket_bases' sums array —
    whenever the input-scaled count was not a power of two."""
    from prclz_ray.stages.packing import HASH_SPAN

    for n in (3, 7, 256, 300, 1000, 1_000_003):
        width = -(-HASH_SPAN // n)
        assert (HASH_SPAN - 1) // width < n  # max hash stays in range
        # the floor width really was broken for non-powers-of-two
        if HASH_SPAN % n:
            assert (HASH_SPAN - 1) // (HASH_SPAN // n) >= n


def test_shuffle_key_rows_buckets_in_range(ray_session):
    import pyarrow as pa

    from prclz_ray.stages.packing import shuffle_key_rows

    batch = pa.table(
        {
            "doc_id": pa.array(list(range(200)), pa.int64()),
            "text": pa.array([f"doc text {i} body" for i in range(200)]),
        }
    )
    for n in (3, 300):  # non-power-of-two input-scaled counts
        sb = shuffle_key_rows(batch, n_buckets=n).column("sb").to_numpy()
        assert (sb >= 0).all() and (sb < n).all()


def test_embedding_sample_strided_and_capped(tmp_path):
    """The quantizer training sample takes row groups EVENLY across
    the file (a head sample is cluster-biased on crawl-ordered
    corpora) and respects the cap; under the cap it is the whole
    table bit-for-bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from prclz_ray.queries import _embedding_sample

    n, d = 1000, 4
    emb = [[float(i)] * d for i in range(n)]
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()), "embedding": emb})
    f = tmp_path / "emb.parquet"
    pq.write_table(t, f, row_group_size=100)  # 10 row groups

    whole = _embedding_sample(str(f), cap=n)
    assert whole.shape == (n, d) and whole[0, 0] == 0.0 and whole[-1, 0] == float(n - 1)

    s = _embedding_sample(str(f), cap=300)
    assert len(s) == 300
    # strided: rows come from row groups across the WHOLE file, not
    # just the head 3 groups (first values of each selected group)
    firsts = sorted(set(int(v) // 100 for v in s[:, 0]))
    assert max(firsts) >= 5, f"head-biased sample: groups {firsts}"


def test_reduce_width_floor_growth_cap():
    """VERDICT r4 §wrong.1: the repartition feeding a bounded-bucket
    reduce must widen with input rows (corpus/8 per reduce task at
    100 TB otherwise) while never exceeding the group count
    (schema-less empty-block hazard)."""
    from prclz_ray.stages.scaling import reduce_width

    # test scale: the tuned floor, exactly (behavior unchanged)
    assert reduce_width(5_000, 256, floor=8) == 8
    assert reduce_width(8 * TARGET_GROUP_ROWS, 256, floor=8) == 8
    # growth: partitions track rows/rows_per_task
    assert reduce_width(100 * TARGET_GROUP_ROWS, 256, floor=8) == 100
    # capped at the bucket count — partitions ≤ groups always
    assert reduce_width(10**15, 256, floor=8) == 256
    # monotone in rows
    ws = [reduce_width(k * TARGET_GROUP_ROWS, 10**6) for k in (1, 50, 5000)]
    assert ws == sorted(ws)
    # degenerate guard
    assert reduce_width(0, 256) >= 1


def test_rwidth_jwidth_scale_with_parquet_rows(tmp_path):
    """_rwidth/_jwidth read the SAME footer row count as _buckets and
    widen past the floor once rows×fanout exceed the per-task budget —
    the end-to-end wiring the fixed repartition(8) sites now use."""
    import pyarrow.parquet as pq

    from prclz_ray.queries import _jwidth, _rwidth

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")
    sf = str(tmp_path)

    # small input: floors hold (test-scale behavior identical)
    assert _rwidth(sf, 256) == 8
    assert _jwidth(sf) == 8
    # a fanout that pushes rows past the budget widens the reduce,
    # still capped by the bucket count
    big_fanout = 50 * TARGET_GROUP_ROWS // 1000
    assert _rwidth(sf, 256, fanout=big_fanout) == 50
    assert _rwidth(sf, 16, fanout=big_fanout) == 16  # cap
    assert _jwidth(sf, fanout=big_fanout) == 50      # joins: uncapped


def test_sessionize_bucket_group_matches_per_user():
    """The bucketed sessionizer (one Ray group per user-BUCKET) emits
    exactly the per-user semantics: per-user session indices, counts,
    and bounds — independent of how users interleave in the bucket."""
    from prclz_ray.stages.events import SESSION_GAP_US, sessionize_group

    gap = SESSION_GAP_US
    # two users interleaved, each with two sessions
    t = pa.table(
        {
            "user_id": pa.array([7, 3, 7, 3, 7, 3], pa.int64()),
            "ts": pa.array(
                [0, 100, 10, 200, 3 * gap, 3 * gap + 5], pa.int64()
            ),
            "ub": pa.array([1] * 6, pa.int64()),
        }
    )
    out = sessionize_group(t)
    rows = sorted(
        zip(
            out.column("user_id").to_pylist(),
            out.column("session_idx").to_pylist(),
            out.column("n_events").to_pylist(),
            out.column("start_us").to_pylist(),
            out.column("end_us").to_pylist(),
        )
    )
    assert rows == [
        (3, 0, 2, 100, 200),
        (3, 1, 1, 3 * gap + 5, 3 * gap + 5),
        (7, 0, 2, 0, 10),
        (7, 1, 1, 3 * gap, 3 * gap),
    ]
    # empty shuffle partition guard
    assert sessionize_group(t.slice(0, 0)).num_rows == 0
