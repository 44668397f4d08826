"""Corpus-curation kernels: line chunking/dedup, host caps, repetition
signals, TF-IDF top-k, connected components."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from prclz_ray.stages import curation as C


def _docs_table(texts, doc_ids=None):
    ids = doc_ids if doc_ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def _ref_lines(text):
    words = text.split(" ")
    return [
        " ".join(words[i : i + C.LINE_W]) for i in range(0, len(words), C.LINE_W)
    ]


def test_line_arrays_chunking_matches_reference():
    texts = [
        " ".join(f"w{i}" for i in range(25)),
        "single",
        " ".join(f"x{i}" for i in range(10)),
        "",
    ]
    t = _docs_table(texts)
    lines, line_doc, local = C._line_arrays(t)
    got = {}
    for s, d, l in zip(lines.to_pylist(), line_doc, local):
        got.setdefault(int(d), []).append((int(l), s))
    for d, text in enumerate(texts):
        exp = list(enumerate(_ref_lines(text)))
        assert sorted(got[d]) == exp, (d, got[d], exp)


def test_line_dedup_drops_corpus_duplicate_lines():
    dup = " ".join(f"d{i}" for i in range(C.LINE_W))
    uniq_a = " ".join(f"a{i}" for i in range(C.LINE_W))
    uniq_b = " ".join(f"b{i}" for i in range(C.LINE_W))
    texts = [f"{dup} {uniq_a}", f"{uniq_b} {dup}", dup]
    t = _docs_table(texts)
    rows = C.doc_line_rows(t)
    flagged = []
    for lb in np.unique(rows.column("lb").to_numpy(zero_copy_only=False)):
        flagged.append(C.line_flag_rows(rows.filter(pc.equal(rows.column("lb"), lb))))
    fl = pa.concat_tables(flagged)
    out = []
    for db in np.unique(fl.column("db").to_numpy(zero_copy_only=False)):
        out.append(C.reassemble_docs(fl.filter(pc.equal(fl.column("db"), db))))
    res = pa.concat_tables(out).sort_by([("doc_id", "ascending")])
    assert res.column("clean_text").to_pylist() == [uniq_a, uniq_b, ""]
    assert res.column("n_lines").to_pylist() == [2, 2, 1]
    assert res.column("n_dropped").to_pylist() == [1, 1, 1]
    # empty-group passthrough keeps the schema
    assert C.line_flag_rows(rows.slice(0, 0)).schema == fl.schema


def test_host_rank_keep_caps_per_host_by_doc_id():
    hosts = ["h1"] * 5 + ["h2"] * 2
    ids = [9, 3, 7, 1, 5, 20, 21]
    g = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "host": pa.array(hosts)}
    )
    kept = C.host_rank_keep(g, cap=3)
    got = sorted(
        zip(kept.column("host").to_pylist(), kept.column("doc_id").to_pylist())
    )
    assert got == [("h1", 1), ("h1", 3), ("h1", 5), ("h2", 20), ("h2", 21)]


def test_repetition_signals_exact_values():
    # doc 0: two identical LINE_W-word lines -> dup_line_frac 1/2
    base = [f"t{i}" for i in range(C.LINE_W)]
    d0 = " ".join(base * 2)
    # doc 1: dominant bigram "a b" (2 of 3 bigrams), no dup lines
    d1 = "a b a b"
    t = _docs_table([d0, d1])
    out = C.repetition_signals(t).sort_by([("doc_id", "ascending")])
    line_len = len(" ".join(base))
    n0 = len(d0)
    assert out.column("n_lines").to_pylist() == [2, 1]
    assert out.column("dup_line_frac_x1000").to_pylist() == [1 * 1000 // 2, 0]
    assert out.column("dup_char_frac_x1000").to_pylist() == [
        line_len * 1000 // n0,
        0,
    ]
    # top bigram of d1: "a b" occurs twice, len 3 -> 6*1000//7
    assert out.column("top_bigram_frac_x1000").to_pylist()[1] == 6 * 1000 // len(d1)


def test_tf_score_and_topk_tie_break():
    # one word bucket: df complete inside
    g = pa.table(
        {
            "doc_id": pa.array([1, 1, 2, 2], pa.int64()),
            "word": pa.array(["aa", "bb", "aa", "cc"]),
            "tf": pa.array([2, 2, 1, 3], pa.int64()),
            "wb": pa.array([0, 0, 0, 0], pa.int64()),
        }
    )
    s = C.tf_score_rows(g)
    by = {
        (d, w): sc
        for d, w, sc in zip(
            s.column("doc_id").to_pylist(),
            s.column("word").to_pylist(),
            s.column("score").to_pylist(),
        )
    }
    # df(aa)=2, df(bb)=1, df(cc)=1
    assert by[(1, "aa")] == 2 * C.SCORE_SCALE // 2
    assert by[(1, "bb")] == 2 * C.SCORE_SCALE // 1
    assert by[(2, "cc")] == 3 * C.SCORE_SCALE // 1
    # topk with equal scores -> word-ascending tie break, rank 1-based
    eq = pa.table(
        {
            "doc_id": pa.array([7, 7, 7], pa.int64()),
            "word": pa.array(["zz", "mm", "aa"]),
            "tf": pa.array([1, 1, 1], pa.int64()),
            "score": pa.array([5, 5, 5], pa.int64()),
            "db": pa.array([0, 0, 0], pa.int64()),
        }
    )
    top = C.doc_topk(eq, k=2)
    assert top.column("word").to_pylist() == ["aa", "mm"]
    assert top.column("rank").to_pylist() == [1, 2]


def test_dup_span_merge_overlap_adjacent_separate():
    # doc 0: positions 1,3 overlap (g=5); 1..6 and 9 adjacent-gap merge
    # check: [1,6)+[3,8) -> [1,8); 9 -> [9,14): 2 spans, cover 7+5
    # doc 1: single flag; doc boundary must NOT merge with doc 0
    g = pa.table(
        {
            "doc_id": pa.array([0, 0, 0, 1], pa.int64()),
            "p": pa.array([1, 3, 9, 1], pa.int64()),
            "db": pa.array([0, 0, 0, 0], pa.int64()),
        }
    )
    out = C.dup_span_agg(g).sort_by([("doc_id", "ascending")])
    assert out.column("doc_id").to_pylist() == [0, 1]
    assert out.column("n_spans").to_pylist() == [2, 1]
    assert out.column("dup_word_cover").to_pylist() == [7 + 5, 5]
    # exactly-touching intervals merge: [1,6) + [6,11) -> one span
    t = pa.table(
        {
            "doc_id": pa.array([5, 5], pa.int64()),
            "p": pa.array([1, 6], pa.int64()),
            "db": pa.array([0, 0], pa.int64()),
        }
    )
    out2 = C.dup_span_agg(t)
    assert out2.column("n_spans").to_pylist() == [1]
    assert out2.column("dup_word_cover").to_pylist() == [10]


def test_ngram_bucket_topk_contains_global():
    # partial counts split across two "batches"; per-bucket topk union
    # must contain the true global topk regardless of split
    texts = ["a b c a b c a b c", "x y z x y z", "a b c x y z"]
    t = _docs_table(texts)
    p1 = C.ngram_partial_counts(t.slice(0, 2))
    p2 = C.ngram_partial_counts(t.slice(2, 1))
    merged = pa.concat_tables([p1, p2])
    cands = []
    for gb in np.unique(merged.column("gb").to_numpy(zero_copy_only=False)):
        cands.append(
            C.bucket_topk_grams(
                merged.filter(pc.equal(merged.column("gb"), gb)), k=3
            )
        )
    final = C.global_topk_grams(pa.concat_tables(cands), k=3)
    # brute force over the whole corpus
    import collections

    cnt = collections.Counter()
    for txt in texts:
        ws = txt.split(" ")
        for i in range(len(ws) - 2):
            cnt[" ".join(ws[i : i + 3])] += 1
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = list(zip(final.column("gram").to_pylist(), final.column("n").to_pylist()))
    assert got == exp


def test_connected_components_path_and_isolated(ray_session):
    import ray.data

    pairs = pa.table(
        {
            "doc_a": pa.array([0, 1, 2, 3, 4, 10], pa.int64()),
            "doc_b": pa.array([1, 2, 3, 4, 5, 11], pa.int64()),
        }
    )
    expected = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 10: 10, 11: 10}
    # both halves of the size-gated front door must agree — and the
    # distributed half must survive num_partitions >> distinct nodes
    # (input-scaled _jwidth callers; the internal clamp keeps reduce
    # partitions ≤ node groups, no schema-less empties)
    for threshold, nparts in (
        (C.LOCAL_CC_EDGES, 2),
        (0, 2),
        (0, 64),
    ):
        out = (
            C.connected_components(
                ray.data.from_arrow(pairs),
                num_partitions=nparts,
                local_threshold=threshold,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        got = dict(zip(out["doc_id"], out["cluster_id"]))
        assert got == expected, f"threshold={threshold} nparts={nparts}"


def test_connected_components_empty_pairs(ray_session):
    # an all-unique corpus yields zero LSH candidate pairs; the result
    # must be an empty, correctly-schemed table, not an ArrowInvalid
    # from joining a schema-less empty Dataset
    import ray.data

    pairs = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    out = C.connected_components(ray.data.from_arrow(pairs), num_partitions=2)
    assert sorted(out.schema().names) == ["cluster_id", "doc_id"]
    assert out.count() == 0


def test_dup_span_agg_large_doc_ids():
    # md5-int64-scale doc_ids must not overflow the doc-lift (dense
    # rank × stride, not doc_id × 2^32)
    big = np.int64(2**62)
    grp = pa.table(
        {
            "doc_id": pa.array([big, big, big, 5], pa.int64()),
            "p": pa.array([1, 3, 20, 1], pa.int64()),
            "db": pa.array([0, 0, 0, 0], pa.int64()),
        }
    )
    out = C.dup_span_agg(grp)
    got = {
        d: (c, s)
        for d, c, s in zip(
            out.column("doc_id").to_pylist(),
            out.column("dup_word_cover").to_pylist(),
            out.column("n_spans").to_pylist(),
        )
    }
    # doc big: positions 1,3 merge ([1,8) = 7 words), 20 separate (5)
    assert got == {5: (5, 1), int(big): (12, 2)}


def test_repetition_signals_rejects_non_ascii():
    with pytest.raises(ValueError, match="non-ASCII"):
        C.repetition_signals(pa.table({"doc_id": [1], "text": ["café au lait"]}))


def test_line_dedup_chain_matches_naive_reference():
    """Random corpora through doc_line_rows → line_flag_rows →
    reassemble_docs (single-bucket locally) vs a pure-Python model."""
    rng = np.random.RandomState(19)
    vocab = [f"w{i}" for i in range(12)]
    for trial in range(5):
        n = int(rng.randint(2, 30))
        texts = [
            " ".join(rng.choice(vocab, size=rng.randint(1, 35)))
            for _ in range(n)
        ]
        docs = _docs_table(texts)

        # reference: corpus-wide duplicate LINE_W-word lines dropped
        ref_lines = {d: _ref_lines(t) for d, t in enumerate(texts)}
        from collections import Counter

        df = Counter(l for ls in ref_lines.values() for l in ls)
        expect = {
            d: " ".join(l for l in ls if df[l] < 2)
            for d, ls in ref_lines.items()
        }

        rows = C.doc_line_rows(docs)
        flagged = C.line_flag_rows(rows)  # one bucket = whole corpus
        out = C.reassemble_docs(flagged)
        got = dict(
            zip(out["doc_id"].to_pylist(), out["clean_text"].to_pylist())
        )
        assert got == expect, f"trial {trial}"


def test_host_rank_keep_text_passes_text_through():
    g = pa.table(
        {
            "doc_id": pa.array([3, 1, 2, 9], pa.int64()),
            "host": pa.array(["a", "a", "a", "b"]),
            "text": pa.array(["t3", "t1", "t2", "t9"]),
        }
    )
    out = C.host_rank_keep_text(g, cap=2)
    got = sorted(zip(out["doc_id"].to_pylist(), out["text"].to_pylist()))
    assert got == [(1, "t1"), (2, "t2"), (9, "t9")]


def test_run_curate_resume(ray_session, tmp_path):
    """Kill-and-resume for the curation sink: delete two completed
    kb buckets, resume, output matches a clean run bit-for-bit."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from prclz_ray.pipelines.curate import run_curate
    from prclz_ray.state.manifest import Manifest

    SF = "/root/testdata/sf0.001"
    full = str(tmp_path / "full")
    res = str(tmp_path / "res")
    r1 = run_curate(SF, full, resume=False)
    r2 = run_curate(SF, res, resume=False)
    assert r1["rows"] == r2["rows"] > 0

    m = Manifest(res)
    victims = sorted(m.completed())[:2]  # job-tagged "kb<N>" keys
    for v in victims:
        shutil.rmtree(os.path.join(res, f"kb={v[2:]}"))
        os.remove(os.path.join(res, "_manifest", f"{v}.json"))

    r3 = run_curate(SF, res, resume=True)
    assert r3["skipped"] == len(Manifest(full).completed()) - 2
    assert r3["rows"] == r1["rows"]

    cols = ["doc_id", "clean_text"]
    a = pq.read_table(full, columns=cols).to_pandas().sort_values("doc_id")
    b = pq.read_table(res, columns=cols).to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["clean_text"].values == b["clean_text"].values).all()


def test_ccnet_tier_assign_exact_ntile():
    # host a: 7 docs → NTILE(3) sizes 3,2,2; host b: 2 docs → 1,1
    g = pa.table(
        {
            "doc_id": pa.array(list(range(9)), pa.int64()),
            "host": pa.array(["a"] * 7 + ["b"] * 2),
            "nw": pa.array([70, 60, 50, 40, 30, 20, 10, 5, 9], pa.int64()),
            "hb": pa.array([0] * 9, pa.int64()),
        }
    )
    out = C.ccnet_tier_assign(g)
    got = dict(zip(out["doc_id"].to_pylist(), out["tier"].to_pylist()))
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 8: 1, 7: 2}


def test_run_train_prep_manifest_and_resume(ray_session, tmp_path):
    """curate → pack → sharded manifest: windows are exactly SEQ_LEN
    except the last, every curated doc appears, and kill-and-resume
    reproduces the clean run bit-for-bit."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    from prclz_ray.pipelines.curate import run_train_prep
    from prclz_ray.stages.packing import SEQ_LEN
    from prclz_ray.state.manifest import Manifest

    SF = "/root/testdata/sf0.001"
    full = str(tmp_path / "full")
    res = str(tmp_path / "res")
    r1 = run_train_prep(SF, full, resume=False)
    assert r1["rows"] > 0
    t = pq.read_table(full).to_pandas()
    per_seq = t.groupby("seq_id")["tok_in_seq"].sum()
    assert (per_seq.iloc[:-1] == SEQ_LEN).all()  # full windows
    assert per_seq.index.max() + 1 == len(per_seq)  # contiguous seqs

    run_train_prep(SF, res, resume=False)
    m = Manifest(res)
    v = sorted(m.completed())[0]  # job-tagged "s<N>" key
    shutil.rmtree(os.path.join(res, f"shard={v[1:]}"))
    os.remove(os.path.join(res, "_manifest", f"{v}.json"))
    r3 = run_train_prep(SF, res, resume=True)
    assert r3["rows"] == r1["rows"]
    a = t.sort_values(["seq_id", "doc_id"]).reset_index(drop=True)
    b = (
        pq.read_table(res)
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert a[["seq_id", "doc_id", "tok_in_seq"]].equals(
        b[["seq_id", "doc_id", "tok_in_seq"]]
    )


def test_curate_and_train_prep_share_out_dir(ray_session, tmp_path):
    """Job-tagged manifest keys: running curate then train-prep into
    the SAME out_dir must not skip or corrupt each other (untagged
    integer keys previously collided — train-prep saw curate's kb
    rows as completed shards and wrote an empty manifest)."""
    from prclz_ray.pipelines.curate import run_curate, run_train_prep

    SF = "/root/testdata/sf0.001"
    shared = str(tmp_path / "shared")
    solo = str(tmp_path / "solo")
    run_curate(SF, shared, resume=False)
    r_shared = run_train_prep(SF, shared, resume=True)
    r_solo = run_train_prep(SF, solo, resume=False)
    assert r_shared["rows"] == r_solo["rows"] > 0
    assert r_shared["skipped"] == 0


def test_dedup_keep_min_keeps_first_doc_per_text():
    g = pa.table(
        {
            "doc_id": pa.array([5, 2, 7, 1], pa.int64()),
            "clean_text": pa.array(["x", "x", "y", "y"]),
            "kb": pa.array([0, 0, 0, 0], pa.int64()),
        }
    )
    out = C.dedup_keep_min(g)
    got = sorted(zip(out["doc_id"].to_pylist(), out["clean_text"].to_pylist()))
    assert got == [(1, "y"), (2, "x")]


def _pr_ref(links, iters=None):
    """Pure-python reference of the exact-integer PageRank contract."""
    iters = C.PR_ITERS if iters is None else iters
    w, outw = {}, {}
    hosts = set()
    for s, d in links:
        w[(s, d)] = w.get((s, d), 0) + 1
        outw[s] = outw.get(s, 0) + 1
        hosts.update((s, d))
    pr = {h: C.PR_SCALE for h in hosts}
    for _ in range(iters):
        acc = {h: 0 for h in hosts}
        for (s, d), wt in w.items():
            acc[d] += (C.PR_DAMP_NUM * pr[s] * wt) // (C.PR_DAMP_DEN * outw[s])
        pr = {h: C.PR_BASE + acc[h] for h in hosts}
    return pr


def test_pagerank_both_paths_match_reference(ray_session):
    import ray.data

    # skewed multigraph: repeated links (weights), a dangling-out host
    # ("sink" receives but never emits), a host with only self-relevant
    # fan-in, and an isolated pair
    links = [
        ("a", "b"), ("a", "b"), ("a", "c"),
        ("b", "c"), ("c", "a"),
        ("d", "sink"), ("e", "sink"), ("e", "sink"),
        ("x", "y"),
    ]
    t = pa.table(
        {
            "src": pa.array([s for s, _ in links]),
            "dst": pa.array([d for _, d in links]),
        }
    )
    exp = _pr_ref(links)
    for threshold in (C.LOCAL_PR_EDGES, 0):  # both front-door halves
        out = (
            C.pagerank(ray.data.from_arrow(t), num_partitions=2,
                       local_threshold=threshold)
            .to_pandas()
        )
        got = dict(zip(out["host"], out["pr"]))
        assert got == exp, f"threshold={threshold}"
    # sink accumulates but never emits (sink-drop variant); hosts with
    # no in-links sit exactly at PR_BASE after round 1
    assert exp["sink"] > C.PR_BASE
    assert exp["d"] == exp["e"] == exp["x"] == C.PR_BASE


def test_pagerank_empty_links(ray_session):
    import ray.data

    t = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    out = C.pagerank(ray.data.from_arrow(t), num_partitions=2)
    assert sorted(out.schema().names) == ["host", "pr"]
    assert out.count() == 0


def test_pagerank_overflow_guard():
    big = np.array([2**61], dtype=np.int64)
    with pytest.raises(OverflowError):
        C._pr_flow(big, np.array([100], dtype=np.int64), np.array([1], dtype=np.int64))


def test_surprisal_scorer_ranks_and_oov(ray_session):
    import ray

    from prclz_ray.stages.hashing import hash_strings62

    # vocab: "the" rank 1, "cat" rank 2 (k=2, OOV scores 3)
    vh = hash_strings62(pa.array(["the", "cat"]))
    vr = np.array([1, 2], dtype=np.int64)
    order = np.argsort(vh)
    ref = ray.put((vh[order], vr[order]))
    fn = C.make_surprisal_fn(ref, k=2)
    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["the cat sat", "the the"]),
        }
    )
    out = fn(batch)
    # doc 7: 1 + 2 + 3(oov) = 6, one oov; doc 8: 1 + 1 = 2, zero oov
    assert out.column("surprisal").to_pylist() == [6, 2]
    assert out.column("n_oov").to_pylist() == [1, 0]


def test_surprisal_scorer_empty_vocab(ray_session):
    import ray

    ref = ray.put((np.array([], dtype=np.int64), np.array([], dtype=np.int64)))
    fn = C.make_surprisal_fn(ref, k=4)
    batch = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b"])}
    )
    out = fn(batch)
    assert out.column("surprisal").to_pylist() == [10]  # 2 words x (k+1)
    assert out.column("n_oov").to_pylist() == [2]


def test_cluster_keep_best_ties_and_winners():
    g = pa.table(
        {
            "cluster_id": pa.array([1, 1, 1, 5, 5], pa.int64()),
            "doc_id": pa.array([10, 11, 12, 20, 21], pa.int64()),
            "score": pa.array([3, 7, 7, 2, 2], pa.int64()),
            "cb": pa.array([0, 0, 0, 0, 0], pa.int64()),
        }
    )
    out = C.cluster_keep_best(g)
    got = dict(zip(out.column("doc_id").to_pylist(), out.column("dropped").to_pylist()))
    # cluster 1: score tie 7/7 -> doc 11 wins (smaller id); cluster 5:
    # tie 2/2 -> doc 20 wins
    assert got == {10: 1, 11: 0, 12: 1, 20: 0, 21: 1}
    # empty group keeps schema
    assert C.cluster_keep_best(g.slice(0, 0)).schema == out.schema


def test_pagerank_distributed_tiny_graph(ray_session):
    # review regression: a 1-edge graph through the DISTRIBUTED path
    # with num_partitions >> groups must not die on schema-less empty
    # aggregate partitions feeding the joins
    import ray.data

    t = pa.table({"src": pa.array(["a"]), "dst": pa.array(["b"])})
    out = (
        C.pagerank(ray.data.from_arrow(t), num_partitions=8, local_threshold=0)
        .to_pandas()
    )
    got = dict(zip(out["host"], out["pr"]))
    exp_b = C.PR_BASE + (C.PR_DAMP_NUM * C.PR_BASE) // C.PR_DAMP_DEN
    assert got == {"a": C.PR_BASE, "b": exp_b}


def test_pagerank_distributed_many_hosts(ray_session):
    # 2000 hosts in a ring (h_i -> h_{i+1}) plus a hub absorbing from
    # every 10th host: exercises the bucketed shapes with hosts >>
    # HOST_BUCKETS and groups >> partitions; distributed must equal
    # the driver solver exactly
    import ray.data

    n = 2000
    src = [f"h{i}" for i in range(n)] + [f"h{i}" for i in range(0, n, 10)]
    dst = [f"h{(i + 1) % n}" for i in range(n)] + ["hub"] * (n // 10)
    t = pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    loc = C.pagerank(ray.data.from_arrow(t), num_partitions=4).to_pandas()
    dist = C.pagerank(
        ray.data.from_arrow(t), num_partitions=4, local_threshold=0
    ).to_pandas()
    l = dict(zip(loc["host"], loc["pr"]))
    d = dict(zip(dist["host"], dist["pr"]))
    assert l == d and len(l) == n + 1
    assert d["hub"] > C.PR_BASE


def test_pagerank_scale_parameter(ray_session):
    # a smaller per-host mass must flow through both paths identically
    # (the skewed-corpus knob: avoids the int64 overflow guard)
    import ray.data

    t = pa.table(
        {"src": pa.array(["a", "b", "c"]), "dst": pa.array(["b", "c", "a"])}
    )
    sc = 10**6
    base = (C.PR_DAMP_DEN - C.PR_DAMP_NUM) * sc // C.PR_DAMP_DEN
    for thr in (C.LOCAL_PR_EDGES, 0):
        out = C.pagerank(
            ray.data.from_arrow(t), num_partitions=2,
            local_threshold=thr, scale=sc,
        ).to_pandas()
        got = dict(zip(out["host"], out["pr"]))
        # 3-cycle: every host has one in/out edge; pr converges toward
        # base + 85% of the previous round's single in-flow
        pr = {h: sc for h in "abc"}
        for _ in range(C.PR_ITERS):
            pr = {
                h: base + (C.PR_DAMP_NUM * pr[p]) // C.PR_DAMP_DEN
                for h, p in (("b", "a"), ("c", "b"), ("a", "c"))
            }
        assert got == pr, thr


def test_pagerank_auto_scale_skewed_graph(ray_session):
    # a mass-concentrating graph (many sources, few receivers) raised
    # OverflowError at the pinned PR_SCALE; scale="auto" derives a
    # safe mass and both paths agree
    import ray.data

    src = [f"s{i}" for i in range(400)]
    dst = ["hub"] * 400  # all mass funnels into one host
    t = pa.table({"src": pa.array(src * 3), "dst": pa.array(dst * 3)})
    loc = C.pagerank(ray.data.from_arrow(t)).to_pandas()
    dist = C.pagerank(
        ray.data.from_arrow(t), local_threshold=0, num_partitions=4
    ).to_pandas()
    l = dict(zip(loc.host, loc.pr))
    d = dict(zip(dist.host, dist.pr))
    assert l == d and len(l) == 401
    assert l["hub"] > l["s0"]
    # auto never exceeds the documented default
    assert max(l.values()) * C.PR_DAMP_NUM * 3 < 2**63


def test_dup_spans_exact_catches_sub_gram_overlaps():
    """Lee et al. shape: a 40-char substring shared between two docs
    that spans ONE word — no repeated DUP_G-word gram exists, so
    dup_spans is blind to it; the char-window pass must find exactly
    the planted 40-char span in both docs."""
    import pyarrow as pa

    from prclz_ray.stages.curation import (
        char_window_rows,
        dup_flag_rows,
        dup_span_agg,
        dupx_flag_rows,
        dupx_span_agg,
        gram_pos_rows,
    )

    chunk = "qwertyuiopasdfghjklzxcvbnm0123456789abcd"  # 40 chars, 1 word
    assert len(chunk) == 40
    # boundary chars differ on BOTH sides of the planted chunk, so the
    # maximal shared substring is exactly the 40-char chunk
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    f"unique left1{chunk}2right tail alpha words",
                    f"other texts3{chunk}4more trailing stuff here",
                ]
            ),
        }
    )

    # word-gram path: NO repeated 5-gram → no spans (the gap)
    g = gram_pos_rows(t, n_buckets=1)
    assert dup_span_agg(dup_flag_rows(g, doc_buckets=1)).num_rows == 0

    # char-window path: exactly the planted 40-char span, both docs
    rows = char_window_rows(t, L=30, n_buckets=1)
    spans = dupx_span_agg(dupx_flag_rows(rows, doc_buckets=1), L=30)
    got = sorted(
        zip(
            spans.column("doc_id").to_pylist(),
            spans.column("dup_char_cover").to_pylist(),
            spans.column("n_spans").to_pylist(),
        )
    )
    assert got == [(1, 40, 1), (2, 40, 1)]

    # window rows are positionally exact: doc 1's chunk starts at char
    # 13 (1-based), so its first/last flagged windows are 13 and 23
    f = dupx_flag_rows(rows, doc_buckets=1)
    p1 = sorted(
        p for d, p in zip(
            f.column("doc_id").to_pylist(), f.column("p").to_pylist()
        ) if d == 1
    )
    assert p1[0] == 13 and p1[-1] == 13 + 40 - 30

    # a shared substring SHORTER than L is invisible (threshold holds)
    t29 = pa.table(
        {
            "doc_id": pa.array([5, 6], pa.int64()),
            "text": pa.array(
                [f"aaa1{chunk[:29]}2bbb padding words", f"ccc3{chunk[:29]}4ddd other words"]
            ),
        }
    )
    r29 = char_window_rows(t29, L=30, n_buckets=1)
    assert dupx_span_agg(dupx_flag_rows(r29, doc_buckets=1), L=30).num_rows == 0

    # degenerate inputs: empty batch and all-short docs emit typed empties
    empty = t.slice(0, 0)
    assert char_window_rows(empty).num_rows == 0
    short = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": pa.array(["tiny"])}
    )
    assert char_window_rows(short, L=30).num_rows == 0


# --- round-5 stage review regressions -----------------------------------------

def test_edge_weight_combine_pipe_in_host_names():
    # ('a|b' -> 'c') and ('a' -> 'b|c') must stay DISTINCT edges: a
    # '|'-joined regroup key would merge them into one double-weighted edge
    import pyarrow as pa

    from prclz_ray.stages.curation import edge_weight_combine

    g = pa.table(
        {
            "src": ["a|b", "a"],
            "dst": ["c", "b|c"],
            "w": pa.array([1, 1], pa.int64()),
            "eb": pa.array([0, 0], pa.int64()),
        }
    )
    out = edge_weight_combine(g)
    assert out.num_rows == 2
    assert sorted(out.column("w").to_pylist()) == [1, 1]
