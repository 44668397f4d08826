"""Curation job runner: the end-to-end webtext pipeline → partitioned
parquet + lineage manifest.

Same sink contract as ``run_flagship`` / ``run_tiles``
(pipelines/flagship.py): one Hive directory per partition (here the
input-scaled text-hash buckets ``kb``), a fingerprint-validated manifest row
per completed bucket, atomic tmp+rename manifest writes, and crash
cleanup that deletes partition dirs without a matching manifest row
before recomputing.

Resume semantics — stated honestly: completed buckets are filtered
out ONLY at the sink. The curation lineage (host ranks, corpus-wide
line frequencies, the dedup min) is CORPUS-COUPLED — every output
bucket is a function of the whole input — so a resumed run recomputes
the stream and re-skips finished buckets' writes. That is still worth
having: a crash mid-write never duplicates or loses rows, and the
recomputed stream is deterministic for the same input fingerprint, so
resumed output is bit-identical to a clean run. (Contrast the
flagship, whose per-row-independent join lets it skip compute too.)

Reference analogue: the reference resumes per-GADM work by completed-
set difference (`prclz/parcelization/midway_parcelization_residual.sh`);
the corpus-coupled variant here is the honest equivalent for
whole-corpus statistics.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.curation import KB_BUCKETS
from ..state.manifest import Manifest
from .flagship import _partition_counts, _write_run_metrics


def _make_with_kb(n_buckets: int):
    """Re-derive the text-hash bucket as the write partition column
    (dedup_keep_min consumed it; same hash → same value). The count is
    input-scaled like the pipeline's shuffle buckets, and deterministic
    for a given input — so resume sees the same partition layout."""

    def _with_kb(batch: pa.Table) -> pa.Table:
        from ..stages.hashing import hash_strings62

        ct = batch.column("clean_text")
        ct = ct.combine_chunks() if isinstance(ct, pa.ChunkedArray) else ct
        return batch.append_column(
            "kb", pa.array(hash_strings62(ct) % n_buckets, pa.int64())
        )

    return _with_kb


def run_curate(input_dir: str, out_dir: str, *, resume: bool = True) -> dict:
    """documents.parquet under ``input_dir`` → curated corpus at
    ``out_dir`` (Hive dirs ``kb=N``) + manifest. Returns
    {partitions, rows, new_rows, skipped, wall_s}."""
    from ..queries import q_curate_corpus

    t0 = time.time()
    manifest = Manifest(out_dir)

    # Manifest keys are JOB-TAGGED ("kb<N>") and every set below is
    # scoped to THIS job's tag, so curate and train-prep sharing an
    # out_dir can never consume or unmark each other's resume state
    def _mine(keys):
        return {k for k in keys if k.startswith("kb") and k[2:].isdigit()}

    done = _mine(manifest.completed(fingerprint=input_dir)) if resume else set()
    # crash cleanup: partition dirs without a fingerprint-matching
    # manifest row are partial writes (or another input's output)
    for d in glob.glob(os.path.join(out_dir, "kb=*")):
        if "kb" + d.rsplit("=", 1)[-1] not in done:
            shutil.rmtree(d)
    for key in _mine(manifest.completed()) - done:
        manifest.unmark(key)

    from ..stages.scaling import dynamic_buckets, parquet_rows

    kb_n = dynamic_buckets(
        parquet_rows(os.path.join(input_dir, "documents.parquet")), KB_BUCKETS
    )
    ds = q_curate_corpus(input_dir).map_batches(
        _make_with_kb(kb_n), batch_format="pyarrow"
    )
    if done:
        done_arr = pa.array(sorted(int(k[2:]) for k in done), pa.int64())
        ds = ds.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b.column("kb"), value_set=done_arr))
            ),
            batch_format="pyarrow",
        )
    ds.write_parquet(out_dir, partition_cols=["kb"])

    counts = _partition_counts(out_dir, "kb")  # parquet footers only
    wall = time.time() - t0
    new_rows = 0
    for key, n in counts.items():
        if f"kb{key}" not in done:
            manifest.mark(f"kb{key}", n, fingerprint=input_dir, wall_s=wall)
            new_rows += n
    stats = {
        "partitions": len(counts),
        "rows": int(sum(counts.values())),
        "new_rows": int(new_rows),
        "skipped": len(done),
        "wall_s": round(wall, 3),
    }
    _write_run_metrics(out_dir, "curate", input_dir, stats)
    return stats


SEQS_PER_SHARD = 256  # pack-manifest rows group into seq_id ranges


def run_train_prep(input_dir: str, out_dir: str, *, resume: bool = True) -> dict:
    """The full corpus→trainer artifact job: curation pipeline →
    sequence packing over the CLEANED text → pack manifest written as
    Hive ``shard=N`` dirs (contiguous seq_id ranges, so a loader
    streams shards in training order) + lineage manifest.

    Same sink-only resume contract as ``run_curate`` (the pack offsets
    are corpus-coupled through the prefix-sum scan); output is
    deterministic for a fixed input, so resumed and clean runs are
    bit-identical."""
    from ..queries import q_curate_corpus
    from ..stages.packing import pack_dataset, token_count_rows

    t0 = time.time()
    manifest = Manifest(out_dir)

    def _mine(keys):  # job tag "s<N>" — see run_curate's collision note
        return {k for k in keys if k.startswith("s") and k[1:].isdigit()}

    done = _mine(manifest.completed(fingerprint=input_dir)) if resume else set()
    for d in glob.glob(os.path.join(out_dir, "shard=*")):
        if "s" + d.rsplit("=", 1)[-1] not in done:
            shutil.rmtree(d)
    for key in _mine(manifest.completed()) - done:
        manifest.unmark(key)

    curated = q_curate_corpus(input_dir)
    tok = curated.map_batches(
        lambda b: token_count_rows(
            pa.table({"doc_id": b.column("doc_id"), "text": b.column("clean_text")})
        ),
        batch_format="pyarrow",
    ).materialize()
    stats: dict = {"skipped": len(done)}
    if tok.count() > 0:
        packed = pack_dataset(tok)

        def with_shard(b: pa.Table) -> pa.Table:
            s = b.column("seq_id").to_numpy(zero_copy_only=False)
            return b.append_column(
                "shard", pa.array(s // SEQS_PER_SHARD, pa.int64())
            )

        ds = packed.map_batches(with_shard, batch_format="pyarrow")
        if done:
            done_arr = pa.array(sorted(int(k[1:]) for k in done), pa.int64())
            ds = ds.map_batches(
                lambda b: b.filter(
                    pc.invert(pc.is_in(b.column("shard"), value_set=done_arr))
                ),
                batch_format="pyarrow",
            )
        ds.write_parquet(out_dir, partition_cols=["shard"])

    counts = _partition_counts(out_dir, "shard")
    wall = time.time() - t0
    new_rows = 0
    for key, n in counts.items():
        if f"s{key}" not in done:
            manifest.mark(f"s{key}", n, fingerprint=input_dir, wall_s=wall)
            new_rows += n
    stats.update(
        {
            "partitions": len(counts),
            "rows": int(sum(counts.values())),
            "new_rows": int(new_rows),
            "wall_s": round(wall, 3),
        }
    )
    _write_run_metrics(out_dir, "train_prep", input_dir, stats)
    return stats
