"""The flagship pipeline: pages → extract → geocode → index → PIP join
→ kNN parcel assignment (→ optional tile rollup), streaming end-to-end
with per-partition lineage manifests.

Target shape per SURVEY.md §3.4: every stage is a ``map_batches`` over
zero-copy Arrow; the polygon/anchor side tables are broadcast via
``ray.put`` once and indexed inside actor-pool workers; the wide
``html`` column is dropped at the extract stage before anything
shuffles; output is Hive-partitioned parquet by the res-5 cell key so
a killed run resumes per partition.
"""

from __future__ import annotations

import os
import time
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..stages.pages import pages_dataset
from ..stages.spatial import (
    KNNAnchorActor,
    PIPJoinActor,
    make_knn_fn,
    make_pip_fn,
    put_anchors_side,
    put_blocks_side,
)
from ..state.manifest import Manifest
from . import derive


def load_side_tables():
    """Blocks + parcels side tables (derived, cached) → broadcast refs."""
    blocks = pq.read_table(derive.blocks_path())
    parcels = pq.read_table(derive.parcels_path())
    return put_blocks_side(blocks), put_anchors_side(parcels)


def joined_pages(
    input_dir: str,
    *,
    blocks_ref=None,
    anchors_ref=None,
    pip_concurrency=(1, 4),
    knn_concurrency=(1, 4),
    batch_size: int = 8192,
    mode: str = "task",
    errors_dir: str | None = None,
) -> "ray.data.Dataset":
    """documents.parquet → joined pages Dataset (lazy, streaming).

    Columns out: doc_id, url, warc_ts, text, lang, n_chars, has_geo,
    lat_e6, lon_e6, cell_r5, cell_r7, block_id, gadm, parcel_id, dist2
    (+ ``extract_error`` when no ``errors_dir`` routes failures aside).

    ``mode="task"`` (default) runs the stateful join stages as tasks
    with a per-worker index cache (elastic, fastest single-node);
    ``mode="actor"`` uses explicit actor pools sized by the
    ``*_concurrency`` args (placement control on real clusters).
    """
    if blocks_ref is None or anchors_ref is None:
        blocks_ref, anchors_ref = load_side_tables()
    ds = pages_dataset(input_dir, batch_size=batch_size, errors_dir=errors_dir)
    if mode == "task":
        ds = ds.map_batches(
            make_pip_fn(blocks_ref), batch_size=batch_size, batch_format="pyarrow"
        )
        ds = ds.map_batches(
            make_knn_fn(anchors_ref), batch_size=batch_size, batch_format="pyarrow"
        )
        return ds
    ds = ds.map_batches(
        PIPJoinActor,
        fn_constructor_args=(blocks_ref,),
        concurrency=pip_concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )
    ds = ds.map_batches(
        KNNAnchorActor,
        fn_constructor_args=(anchors_ref,),
        concurrency=knn_concurrency,
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )
    return ds


def parquet_dir_rows(d: str) -> int:
    """Σ footer num_rows over a directory's parquet files (metadata
    only — the retry-safe way to count written rows)."""
    import glob

    return sum(
        pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(d, "*.parquet"))
    )


def _partition_counts(out_dir: str, prefix: str) -> dict:
    """Per-partition row counts from the written parquet FOOTERS only
    (`<out>/<prefix>=<key>/*.parquet` → Σ metadata.num_rows). Exact,
    idempotent under Ray task retries (a side-channel counter actor is
    not: a retried map task re-sends its counts), and reads kilobytes
    of metadata per file instead of the data pages — the full
    read-back this replaces doubled output I/O at 100 TB."""
    import glob

    return {
        d.rsplit("=", 1)[-1]: parquet_dir_rows(d)
        for d in glob.glob(os.path.join(out_dir, f"{prefix}=*"))
    }


def _write_run_metrics(out_dir: str, job: str, input_dir: str, stats: dict) -> None:
    """Append one JSON line per run to <out>/_manifest/_runs.jsonl —
    run-level metrics beside the per-partition lineage rows."""
    import json
    import time as _time

    path = os.path.join(out_dir, "_manifest", "_runs.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as fh:
        fh.write(json.dumps({"job": job, "input": input_dir, "ts": _time.time(), **stats}) + "\n")


def run_tiles(input_dir: str, out_dir: str, *, resume: bool = True) -> dict:
    """The raster-heatmap tiling job: flagship join → tile rollup →
    partitioned parquet (one directory per tile_x stripe) + manifest.
    The rollup result is small (one row per 1° tile), so lineage here
    is one manifest row per tile-x stripe.

    Idempotent and resumable like ``run_flagship``: stripe dirs absent
    from the (fingerprint-matching) manifest are stale partial output
    and are deleted; completed stripes are filtered out before the
    write, so re-running with the same out_dir never duplicates rows.
    """
    import glob
    import shutil

    import pyarrow.compute as pc

    from ..stages.rollup import tile_rollup

    t0 = time.time()
    manifest = Manifest(out_dir)

    # keys are JOB-TAGGED ("x<N>") and every set below is scoped to
    # THIS job's tag (the CLAUDE.md manifest invariant): an unscoped
    # unmark would eat the resume state of any other job sharing the
    # out_dir, and an unscoped done set would crash the int() parses
    def _mine(keys):
        return {
            k for k in keys
            if k.startswith("x") and k[1:].lstrip("-").isdigit()
        }

    done = _mine(manifest.completed(fingerprint=input_dir)) if resume else set()
    for d in glob.glob(os.path.join(out_dir, "tile_x=*")):
        if f"x{d.rsplit('=', 1)[-1]}" not in done:
            shutil.rmtree(d)
    for key in _mine(manifest.completed()) - done:
        manifest.unmark(key)  # stale rows of removed/partial stripes

    ds = tile_rollup(joined_pages(input_dir))
    if done:
        done_arr = pa.array(sorted(int(k[1:]) for k in done), pa.int64())
        ds = ds.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("tile_x"), value_set=done_arr))
            ),
            batch_format="pyarrow",
        )
    ds.write_parquet(out_dir, partition_cols=["tile_x"])
    all_counts = _partition_counts(out_dir, "tile_x")
    counts = {k: n for k, n in all_counts.items() if f"x{k}" not in done}
    wall = time.time() - t0
    for key, n in counts.items():
        manifest.mark(f"x{int(key)}", n, fingerprint=input_dir, wall_s=wall)
    stats = {
        # "tiles" is the TOTAL in the output (footer walk covers done +
        # new stripes — a fully-resumed run must not report 0), mirroring
        # run_flagship's rows/new_rows split
        "tiles": int(sum(all_counts.values())),
        "new_tiles": int(sum(counts.values())),
        "new_stripes": len(counts),
        "skipped": len(done),
        "wall_s": wall,
    }
    _write_run_metrics(out_dir, "tiles", input_dir, stats)
    return stats


def run_flagship(
    input_dir: str,
    out_dir: str,
    *,
    resume: bool = True,
    pip_concurrency=(1, 4),
    knn_concurrency=(1, 4),
    mode: str = "task",
) -> dict:
    """Run the flagship join and write partitioned parquet + manifest.

    Resumable AND crash-safe: partitions (res-5 cells) already in the
    manifest are filtered out before the join actors run; partition
    directories NOT in the manifest are stale output of a killed run
    (the manifest row is written only after a partition's files are
    durable) and are deleted before recomputing, so a resumed run never
    duplicates rows. Output is one Hive directory per cell. Returns
    {partitions, rows, wall_s, skipped}.

    ``mode="actor"`` runs the join stages as explicit actor pools sized
    by ``pip_concurrency``/``knn_concurrency`` (placement control on
    real clusters); the default task mode ignores those knobs (its
    per-worker cache self-sizes), so sizing a pool REQUIRES
    ``mode="actor"``.
    """
    import glob
    import shutil

    t0 = time.time()
    manifest = Manifest(out_dir)

    # this job's manifest keys are the BARE cell ids — scope every
    # done/unmark set to them (CLAUDE.md manifest invariant) so a
    # tagged job ("x<N>" tiles, "kb<N>" curate) sharing the out_dir
    # keeps its resume state and the int() parse below can't crash
    def _mine(keys):
        return {k for k in keys if k.lstrip("-").isdigit()}

    done = _mine(manifest.completed(fingerprint=input_dir)) if resume else set()

    # crash cleanup: any partition dir without a (fingerprint-matching)
    # manifest row is a partial write from a killed run — or a
    # completed partition of a DIFFERENT input — remove and recompute;
    # stale manifest rows (any fingerprint, not in done) go with it so
    # a later resume can never skip a partition whose data is gone
    for d in glob.glob(os.path.join(out_dir, "cell_r5=*")):
        key = d.rsplit("=", 1)[-1]
        if key not in done:
            shutil.rmtree(d)
    for key in _mine(manifest.completed()) - done:
        manifest.unmark(key)

    # extraction failures leave the stream as dead-letter parquet under
    # <out>/_errors (url + reason) instead of null-text rows in the
    # assignment table; file names are content-hashed → retry-idempotent
    ds = joined_pages(
        input_dir,
        pip_concurrency=pip_concurrency,
        knn_concurrency=knn_concurrency,
        mode=mode,
        errors_dir=os.path.join(out_dir, "_errors"),
    )
    if done:
        done_arr = pa.array(sorted(int(k) for k in done), pa.int64())

        def drop_done(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                pc.invert(pc.is_in(batch.column("cell_r5"), value_set=done_arr))
            )

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    # drop the heavy text column before the write shuffle: the joined
    # output is the assignment table, text lives in the source parquet
    ds = ds.drop_columns(["text"])
    ds.write_parquet(out_dir, partition_cols=["cell_r5"])

    # per-partition counts from parquet footers only (metadata, not a
    # data read-back; retry-safe unlike a streaming side counter)
    counts = _partition_counts(out_dir, "cell_r5")
    wall = time.time() - t0
    new_rows = 0
    for key, n in counts.items():
        if key not in done:
            manifest.mark(key, n, fingerprint=input_dir, wall_s=wall)
            new_rows += n
    stats = {
        "partitions": len(counts),  # footer walk covers done + new dirs
        "rows": int(sum(counts.values())),
        "new_rows": new_rows,
        "skipped": len(done),
        "wall_s": wall,
    }
    _write_run_metrics(out_dir, "flagship", input_dir, stats)
    return stats
