"""Benchmark harness: headline spatial-join+tiling throughput.

Default run: flagship pipeline (pages → extract → geocode → index →
PIP join → kNN parcel) over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
with ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32), plus a
handful of secondary query timings. Prints ONE JSON line.

The documents table is small (5k rows at sf0.1), so the page stream is
deterministically amplified: replica r of doc d gets doc_id' =
d + r*N_DOCS, flowing through the same synth/geocode arithmetic — the
same 10^12-row-corpus shape at reduced scale, no external data.

--scaling: re-runs the headline join in fresh subprocesses at
num_cpus=8 and num_cpus=32 on identical input and reports both
throughputs + scaling efficiency (sandbox stand-in for N vs 4N nodes,
BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def _prepare_amplified(sf_dir: str, amplify: int, n_docs: int) -> str:
    """Materialize the amplified corpus ONCE as `amplify` real parquet
    shards (replica r shifts doc_id by r*n_docs) — the sandbox stand-in
    for the thousands of input files a 100 TB corpus has. Cached under
    /tmp; prepare time is excluded from the measured job."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import pyarrow as pa

    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    rows_per_shard = int(os.environ.get("GRAFT_ROWS_PER_SHARD", "25000"))
    fingerprint = f"{int(st.st_mtime)}_{st.st_size}_r{rows_per_shard}"
    out = f"/tmp/graft_bench/{name}_x{amplify}_{fingerprint}_v2"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(out, exist_ok=True)
        docs = pq.read_table(f"{sf_dir}/documents.parquet")
        # strip the pandas schema metadata: Ray's per-task schema-dedup
        # hashing chokes on the dict and prints a warning per task
        docs = docs.replace_schema_metadata(None)
        idx = docs.schema.get_field_index("doc_id")
        d = docs.column("doc_id")
        # ~25k rows per shard: fine enough that the 32-cpu run gets
        # ~12 task waves (wave-tail + skew cost measured 0.73 vs 0.80+
        # efficiency at 50k shards), coarse enough that per-task
        # overhead stays amortized (1000×5k shards measured 1.5× slower)
        reps_per_shard = max(1, rows_per_shard // n_docs)
        part = 0
        for r0 in range(0, amplify, reps_per_shard):
            chunk = [
                docs.set_column(idx, "doc_id", pc.add(d, r * n_docs))
                for r in range(r0, min(r0 + reps_per_shard, amplify))
            ]
            pq.write_table(pa.concat_tables(chunk), os.path.join(out, f"part-{part:05d}.parquet"))
            part += 1
        open(marker, "w").close()
    return out


def _amplified_pages(sf_dir: str, amplify: int, n_docs: int):
    """Amplified page stream (lazy Dataset): multi-file parquet read →
    synth → geocode → extract → cell index, all zero-copy Arrow."""
    from prclz_ray.io import read_parquet_clean
    from prclz_ray.stages.pages import extract_text, geocode, index_cells, synth_pages

    if amplify <= 1:
        ds = read_parquet_clean(f"{sf_dir}/documents.parquet")
    else:
        ds = read_parquet_clean(_prepare_amplified(sf_dir, amplify, n_docs))
    # same stage config as pipelines/flagship.joined_pages
    ds = ds.map_batches(synth_pages, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(geocode, batch_format="pyarrow", batch_size=8192)
    ds = ds.map_batches(extract_text, batch_format="pyarrow", batch_size=8192)
    return ds.map_batches(index_cells, batch_format="pyarrow", batch_size=8192)


def run_headline(sf_dir: str, amplify: int, num_cpus: int = 32, mode: str = "task") -> dict:
    """Joined rows/sec for the flagship join, fully streamed.

    ``mode="task"`` (default): stateless tasks + per-worker index cache.
    ``mode="actor"``: explicit actor pools for the join stages — the
    placement-controlled shape a real multi-node cluster would use;
    measured here as the second scaling data point (BASELINE.md)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from prclz_ray.pipelines.flagship import load_side_tables
    from prclz_ray.stages.spatial import (
        KNNAnchorActor,
        PIPJoinActor,
        make_knn_fn,
        make_pip_fn,
    )

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    blocks_ref, anchors_ref = load_side_tables()
    if amplify > 1:
        _prepare_amplified(sf_dir, amplify, n_docs)  # cached; not timed

    t0 = time.time()
    ds = _amplified_pages(sf_dir, amplify, n_docs)
    if mode == "actor":
        pool = (1, max(2, num_cpus // 2))  # two join stages share the node
        ds = ds.map_batches(
            PIPJoinActor, fn_constructor_args=(blocks_ref,), concurrency=pool,
            batch_size=8192, batch_format="pyarrow", num_cpus=1,
        )
        ds = ds.map_batches(
            KNNAnchorActor, fn_constructor_args=(anchors_ref,), concurrency=pool,
            batch_size=8192, batch_format="pyarrow", num_cpus=1,
        )
    else:
        ds = ds.map_batches(make_pip_fn(blocks_ref), batch_size=8192, batch_format="pyarrow")
        ds = ds.map_batches(make_knn_fn(anchors_ref), batch_size=8192, batch_format="pyarrow")
    # consume streaming: per-batch row counts summed (no driver pull)
    counted = ds.map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows])}), batch_format="pyarrow"
    ).sum("n")
    wall = time.time() - t0
    return {"rows": int(counted), "wall_s": wall, "rows_per_s": counted / wall}


HOT_MOD = 10  # doc_id % HOT_MOD != 0 → forced into ONE res-5 cell:
# 90% of the amplified stream lands on a single key — harsher than the
# corpus's natural 4-cluster skew; the salting mechanism must keep the
# reduce wave balanced or the hot reducer pins the whole job


def run_skew(sf_dir: str, amplify: int, num_cpus: int = 32) -> dict:
    """Hot-key torture: the salted count-by-cell aggregation
    (stages/skew.py — count pre-pass → make_salter → salted groupby →
    merge groupby) over the amplified page stream with 90% of rows
    forced into one cell. Wall time covers BOTH passes (the pre-pass
    is part of the mechanism). Asserts the hot cell actually fanned
    out and the counts are exact (salting is semantics-free)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from prclz_ray.stages.skew import hot_keys, key_counts, make_salter

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    if amplify > 1:
        _prepare_amplified(sf_dir, amplify, n_docs)  # cached; not timed
    total_rows = n_docs * max(1, amplify)
    hot_cell = 77_000_077  # arbitrary fixed key outside natural cells

    def force_hot(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        cell = b.column("cell_r5").to_numpy(zero_copy_only=False)
        forced = np.where(d % HOT_MOD != 0, hot_cell, cell)
        return b.set_column(
            b.schema.get_field_index("cell_r5"), "cell_r5",
            pa.array(forced, pa.int64()),
        )

    def stream():
        return _amplified_pages(sf_dir, amplify, n_docs).map_batches(
            force_hot, batch_format="pyarrow"
        )

    # group budget sized so the hot cell MUST salt: ≈ total/(4×cpus)
    hot_threshold = max(10_000, total_rows // (4 * num_cpus))
    t0 = time.time()
    counts = key_counts(stream(), "cell_r5").to_pandas()
    hot = hot_keys(counts, "cell_r5", hot_threshold)
    salted = stream().map_batches(
        make_salter("cell_r5", hot), batch_format="pyarrow"
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"cell_r5": batch.column("cell_r5"), "_salt": batch.column("_salt")}
        )
        return (
            t.group_by(["cell_r5", "_salt"])
            .aggregate([([], "count_all")])
            .rename_columns(["cell_r5", "_salt", "n"])
        )

    per_salt = (
        salted.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell_r5", "_salt"])
        .sum("n")
    )
    merged = (
        per_salt.map_batches(
            lambda b: pa.table(
                {"cell_r5": b.column("cell_r5"), "n": b.column("sum(n)")}
            ),
            batch_format="pyarrow",
        )
        .groupby("cell_r5")
        .sum("n")
        .to_pandas()
    )
    wall = time.time() - t0
    got_total = int(merged["sum(n)"].sum())
    got_hot = int(merged.loc[merged.cell_r5 == hot_cell, "sum(n)"].iloc[0])
    # doc_id' = d + r*n_docs covers [0, total_rows) exactly once
    want_hot = total_rows - len(range(0, total_rows, HOT_MOD))
    assert got_total == total_rows, (got_total, total_rows)
    assert got_hot == want_hot, (got_hot, want_hot)
    if want_hot > hot_threshold:  # warmup runs can be below the budget
        assert int(hot.get(hot_cell, 1)) > 1, "hot cell never salted — torture vacuous"
    return {
        "rows": total_rows,
        "wall_s": wall,
        "rows_per_s": total_rows / wall,
        "hot_fanout": int(hot.get(hot_cell, 1)),
    }


def run_secondary(sf_dir: str) -> dict:
    """Per-query wall times for the broader operator surface."""
    from prclz_ray.queries import QUERIES

    import ray.data

    picks = [
        "tile_rollup",
        "match_count_qc",
        "top_blocks",
        "knn_parcels_k3",
        "pip_join_holes",
        "blocks_periphery",
        "events_asof",
        "events_range",
        "dedup_exact",
        "dedup_minhash",
        "dedup_jaccard",
        "dedup_corpus",
        "ann_topk",
        "ann_topk_lsh",
        "doc_fingerprint",
        "quality_filter",
        "decontaminate",
        "line_dedup",
        "dedup_clusters",
        "tfidf_topk",
        "host_cap",
        "repetition_signals",
        "ngram_topk",
        "dup_spans",
        "seq_pack",
        "shuffle_rank",
        "lines_routed",
        "lines_sharded",
        "curate_corpus",
        "chunk_docs",
        "embedding_centroids",
        "dedup_delta",
        "ccnet_tiers",
        "canonical_urls",
        "robots_filter",
        "host_pagerank",
        "doc_surprisal",
        "train_pack",
        "ann_topk_pq",
        "dedup_embedding_ann",
        "media_pixels",
        "frame_pixels",
        "dedup_keep_best",
        "host_stats",
        "events_late",
        "blocks_buffered",
        "qc_report",
        "sessionize",
        "events_sliding",
        "lang_id_trigram",
        "zonal_raster",
        "blocks_diagonal",
        "lineitem_pricing",
        "segment_revenue",
        "events_hourly",
    ]
    out = {}
    for name in picks:
        t0 = time.time()
        res = QUERIES[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.to_pandas()
        out[name] = round(time.time() - t0, 3)
    return out


def single_run(sf_dir: str, num_cpus: int, amplify: int, secondary: bool,
               mode: str = "task", skew: bool = False) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
        try:
            from ray.data import DataContext

            DataContext.get_current().enable_progress_bars = False
        except Exception:
            pass
    if skew:
        run_skew(sf_dir, max(min(2, amplify), amplify // 8), num_cpus)  # warmup
        head = run_skew(sf_dir, amplify, num_cpus)
        second = run_skew(sf_dir, amplify, num_cpus)
        if second["wall_s"] < head["wall_s"]:
            head = second
        result = {
            "metric": "skewed salted count-by-cell wall seconds (throughput in rows_per_s)",
            "value": round(head["wall_s"], 3),
            "unit": "sec",
            "rows": head["rows"],
            "rows_per_s": round(head["rows_per_s"], 1),
            "hot_fanout": head["hot_fanout"],
            "queries": {"skew_salted_count": round(head["wall_s"], 3)},
            "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            "num_cpus": num_cpus,
            "amplify": amplify,
            "mode": "skew",
        }
        ray.shutdown()
        return result
    # warmup sized to touch EVERY worker process (amplify//8 → ≥ 2×cpus
    # shards at the default 2000): a 2-replica warmup left ~30 of 32
    # workers paying import + index build inside the timed run — a
    # ~2.5 s serial-looking floor that read as fake scaling loss
    run_headline(sf_dir, max(min(2, amplify), amplify // 8), num_cpus, mode)
    # best-of-2: single-node timing variance here is large (±40%)
    head = run_headline(sf_dir, amplify, num_cpus, mode)
    second = run_headline(sf_dir, amplify, num_cpus, mode)
    if second["wall_s"] < head["wall_s"]:
        head = second
    queries = {"flagship_join": round(head["wall_s"], 3)}
    if secondary:
        queries.update(run_secondary(sf_dir))
    result = {
        "metric": "spatial-join+tiling flagship wall seconds (throughput in rows_per_s)",
        "value": round(head["wall_s"], 3),
        "unit": "sec",
        "rows": head["rows"],
        "rows_per_s": round(head["rows_per_s"], 1),
        "queries": queries,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": num_cpus,
        "amplify": amplify,
        "mode": mode,
    }
    ray.shutdown()
    return result


def scaling_run(sf_dir: str, amplify: int, mode: str = "task",
                skew: bool = False) -> dict:
    """Same job at 8 and 32 CPUs in fresh processes; efficiency =
    rows/s(32) / (4 * rows/s(8))."""
    # explicit flag wins; else scale up. Match any spelling the parser
    # accepts (`--amplify N`, `--amplify=N`), not a literal-token sniff
    # that silently ignores the equals form.
    if not any(a == "--amplify" or a.startswith("--amplify=") for a in sys.argv):
        amplify = int(os.environ.get("GRAFT_SCALE_AMPLIFY", str(max(amplify, 2000))))

    def one(cpus: int) -> dict:
        time.sleep(5)  # let the previous Ray session finish teardown
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--json-only",
             "--num-cpus", str(cpus), "--amplify", str(amplify),
             "--mode", mode] + (["--skew"] if skew else []),
            env={**os.environ, "GRAFT_SF_DIR": sf_dir},
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not lines:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(
                f"scaling subprocess (num_cpus={cpus}) failed rc={proc.returncode}"
            )
        return json.loads(lines[-1])

    # single-node wall-clock variance swings single measurements by
    # ±40%; run each level three times (alternating, decorrelates
    # machine drift) and take the best per side
    results = {}
    for cpus in (8, 32, 8, 32, 8, 32):
        r = one(cpus)
        if cpus not in results or r["rows_per_s"] > results[cpus]["rows_per_s"]:
            results[cpus] = r
    r8, r32 = results[8]["rows_per_s"], results[32]["rows_per_s"]
    eff = r32 / (4 * r8)
    return {
        "metric": ("skewed " if skew else "")
        + "scaling efficiency (8→32 CPUs, fresh sessions)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "rows_per_s_8": r8,
        "rows_per_s_32": r32,
        "wall_s_8": results[8]["value"],
        "wall_s_32": results[32]["value"],
        "rows": results[32]["rows"],
        "queries": {"flagship_join_8cpu": results[8]["value"],
                    "flagship_join_32cpu": results[32]["value"]},
        "sf": results[32]["sf"],
        "num_cpus": 32,
        "mode": mode,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--json-only", action="store_true", help="suppress secondary queries")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR))
    # 2000 replicas = 10M rows at sf0.1: large enough that per-task
    # overhead amortizes (the 2M-row default under-reported sustained
    # throughput by ~2×); the scaling mode uses the same size
    ap.add_argument("--amplify", type=int,
                    default=int(os.environ.get("GRAFT_AMPLIFY", "2000")))
    ap.add_argument("--mode", choices=("task", "actor"),
                    default=os.environ.get("GRAFT_MODE", "task"),
                    help="join-stage execution: task (per-worker cache) or actor pools")
    ap.add_argument("--skew", action="store_true",
                    help="hot-key torture: salted count-by-cell with 90%% of rows on one cell")
    args = ap.parse_args()

    if args.scaling:
        result = scaling_run(args.sf_dir, args.amplify, args.mode, skew=args.skew)
    else:
        result = single_run(args.sf_dir, args.num_cpus, args.amplify,
                            secondary=not args.json_only, mode=args.mode,
                            skew=args.skew)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
