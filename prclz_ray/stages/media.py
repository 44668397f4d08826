"""Multimodal-column stages: opaque binary media + typed metadata.

Images/audio/video are opaque ``binary`` columns with a small typed
header; decode / feature-extract are actor-pool-shaped ``map_batches``
stages. The image/audio codec libraries are NOT in this container, so
``decode_pixels`` is a clearly-marked stub (NotImplementedError) — the
Ray-side plumbing (schema, header parse, batch sizing, output layout)
is real and oracle-tested.

Synthetic media: ``synth_media`` packs a deterministic header
(magic 'IMG1', big-endian u16 width/height) + the document text bytes
as payload, so every metadata field is recomputable in SQL.

Batch-size note for real payloads: a decoded 1080p RGB frame is ~6 MB;
batches must stay small (batch_size≈64) so batch × concurrency fits the
worker heap (SURVEY.md §4.2 memory row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"IMG1"


def synth_media(batch: pa.Table) -> pa.Table:
    """documents → media rows: header + utf-8 text payload.

    width  = 16 + doc_id % 240
    height = 16 + (doc_id // 7) % 240
    """
    doc_id = batch.column("doc_id")
    d = doc_id.to_numpy(zero_copy_only=False)
    w = (16 + d % 240).astype(np.int64)
    h = (16 + (d // 7) % 240).astype(np.int64)
    texts = batch.column("text").to_pylist()
    blobs = [
        MAGIC
        + int(w[i]).to_bytes(2, "big")
        + int(h[i]).to_bytes(2, "big")
        + texts[i].encode()
        for i in range(len(texts))
    ]
    return pa.table(
        {
            "doc_id": doc_id,
            "media": pa.array(blobs, pa.large_binary()),
            "media_type": pa.array(["image/synthetic"] * len(texts), pa.string()),
        }
    )


def _binary_view(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 data, int64 offsets) zero-copy view of a binary
    column — shares the buffer idiom with the hash family."""
    from .hashing import _flat_view

    return _flat_view(col, pa.large_binary())


def media_meta(batch: pa.Table) -> pa.Table:
    """Parse the typed header out of the binary column (the 'decode
    metadata' stage): width, height, payload bytes, payload checksum
    (sum of bytes mod 65536) — one vectorized pass over the flat Arrow
    buffer, no per-row Python."""
    data, off = _binary_view(batch.column("media"))
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    if (lens < 8).any():
        raise ValueError(f"bad media blob at row {int(np.argmax(lens < 8))}: length invalid")
    magic = np.frombuffer(MAGIC, dtype=np.uint8).astype(np.int64)
    d64 = data.astype(np.int64)
    for k in range(4):
        bad = d64[starts + k] != magic[k]
        if bad.any():
            raise ValueError(f"bad media blob at row {int(np.argmax(bad))}: magic invalid")
    width = d64[starts + 4] * 256 + d64[starts + 5]
    height = d64[starts + 6] * 256 + d64[starts + 7]
    csum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(d64)])
    checksum = (csum[ends] - csum[starts + 8]) % 65536
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "width": pa.array(width),
            "height": pa.array(height),
            "n_payload": pa.array(lens - 8),
            "checksum": pa.array(checksum),
        }
    )


class DecodeActor:
    """Actor-pool decode stage (the stateful-stage shape for real
    codecs: model/codec loaded once in __init__). Pixel decode is
    STUBBED — no image libs in this container."""

    def __init__(self):
        self.codec = None  # real: load libjpeg/ffmpeg/model weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "pixel decode requires an image codec library not present in "
            "this environment; metadata decode is media_meta()"
        )


def frame_sample_plan(batch: pa.Table, every_n: int = 10) -> pa.Table:
    """Video-style frame-sampling plan over the payload: byte offsets of
    every Nth 'frame' (payload stride = width bytes). The flat_map
    explode shape (one row per sampled frame), fully vectorized:
    per-row sample counts → repeat/arange segment expansion."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "frame": pa.array([], pa.int64()),
                "byte_off": pa.array([], pa.int64()),
            }
        )
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    data, off = _binary_view(batch.column("media"))
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    if (lens < 8).any():
        raise ValueError(f"bad media blob at row {int(np.argmax(lens < 8))}: length invalid")
    magic = np.frombuffer(MAGIC, dtype=np.uint8).astype(np.int64)
    d64 = data.astype(np.int64)
    for k in range(4):
        bad = d64[starts + k] != magic[k]
        if bad.any():
            raise ValueError(f"bad media blob at row {int(np.argmax(bad))}: magic invalid")
    width = d64[starts + 4] * 256 + d64[starts + 5]
    # clamp ONLY the frame-count division (guards divide-by-zero on a
    # degenerate width=0 header); byte_off uses the REAL header width
    # so offsets stay faithful to the container layout (width=0 rows
    # emit all their sampled frames at the payload start, offset 8)
    n_frames = np.maximum(lens - 8, 0) // np.maximum(width, 1)
    k = (n_frames + every_n - 1) // every_n  # sampled frames per row
    total = int(k.sum())
    row = np.repeat(np.arange(len(doc)), k)
    seg_start = np.repeat(np.concatenate([[0], np.cumsum(k)[:-1]]), k)
    frame = (np.arange(total) - seg_start) * every_n
    return pa.table(
        {
            "doc_id": pa.array(doc[row], pa.int64()),
            "frame": pa.array(frame, pa.int64()),
            "byte_off": pa.array(8 + frame * width[row], pa.int64()),
        }
    )
