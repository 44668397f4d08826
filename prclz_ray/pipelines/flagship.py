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
from typing import Optional

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
) -> "ray.data.Dataset":
    """documents.parquet → joined pages Dataset (lazy, streaming).

    Columns out: doc_id, url, warc_ts, text, lang, n_chars, has_geo,
    lat_e6, lon_e6, cell_r5, cell_r7, block_id, gadm, parcel_id, dist2.

    ``mode="task"`` (default) runs the stateful join stages as tasks
    with a per-worker index cache (elastic, fastest single-node);
    ``mode="actor"`` uses explicit actor pools sized by the
    ``*_concurrency`` args (placement control on real clusters).
    """
    if blocks_ref is None or anchors_ref is None:
        blocks_ref, anchors_ref = load_side_tables()
    ds = pages_dataset(input_dir, batch_size=batch_size)
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


def _write_run_metrics(out_dir: str, job: str, input_dir: str, stats: dict) -> None:
    """Append one JSON line per run to <out>/_manifest/_runs.jsonl —
    run-level metrics beside the per-partition lineage rows."""
    import json
    import time as _time

    path = os.path.join(out_dir, "_manifest", "_runs.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as fh:
        fh.write(json.dumps({"job": job, "input": input_dir, "ts": _time.time(), **stats}) + "\n")


def run_tiles(input_dir: str, out_dir: str) -> dict:
    """The raster-heatmap tiling job: flagship join → tile rollup →
    partitioned parquet (one directory per tile_x stripe) + manifest.
    The rollup result is small (one row per 1° tile), so lineage here
    is one manifest row per tile-x stripe."""
    from ..stages.rollup import tile_rollup

    t0 = time.time()
    manifest = Manifest(out_dir)
    ds = tile_rollup(joined_pages(input_dir))
    ds.write_parquet(out_dir, partition_cols=["tile_x"])
    written = ray.data.read_parquet(out_dir).groupby("tile_x").count().to_pandas()
    wall = time.time() - t0
    for _, row in written.iterrows():
        manifest.mark(f"x{int(row['tile_x'])}", int(row["count()"]),
                      fingerprint=input_dir, wall_s=wall)
    stats = {
        "tiles": int(written["count()"].sum()),
        "stripes": len(written),
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
) -> dict:
    """Run the flagship join and write partitioned parquet + manifest.

    Resumable AND crash-safe: partitions (res-5 cells) already in the
    manifest are filtered out before the join actors run; partition
    directories NOT in the manifest are stale output of a killed run
    (the manifest row is written only after a partition's files are
    durable) and are deleted before recomputing, so a resumed run never
    duplicates rows. Output is one Hive directory per cell. Returns
    {partitions, rows, wall_s, skipped}.
    """
    import glob
    import shutil

    t0 = time.time()
    manifest = Manifest(out_dir)
    done = manifest.completed() if resume else set()

    # crash cleanup: any partition dir without a manifest row is a
    # partial write from a killed run — remove before recomputing
    for d in glob.glob(os.path.join(out_dir, "cell_r5=*")):
        key = d.rsplit("=", 1)[-1]
        if key not in done:
            shutil.rmtree(d)

    ds = joined_pages(
        input_dir, pip_concurrency=pip_concurrency, knn_concurrency=knn_concurrency
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

    # manifest rows: per-partition counts from the (small) written output
    written = ray.data.read_parquet(out_dir).groupby("cell_r5").count().to_pandas()
    wall = time.time() - t0
    new_rows = 0
    for _, row in written.iterrows():
        key = str(int(row["cell_r5"]))
        if key not in done:
            manifest.mark(key, int(row["count()"]), fingerprint=input_dir, wall_s=wall)
            new_rows += int(row["count()"])
    stats = {
        "partitions": len(written),
        "rows": int(written["count()"].sum()),
        "new_rows": new_rows,
        "skipped": len(done),
        "wall_s": wall,
    }
    _write_run_metrics(out_dir, "flagship", input_dir, stats)
    return stats
