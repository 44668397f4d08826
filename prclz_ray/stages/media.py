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


def media_meta(batch: pa.Table) -> pa.Table:
    """Parse the typed header out of the binary column (the 'decode
    metadata' stage): width, height, payload bytes, payload checksum
    (sum of bytes mod 65536) — all vectorized via numpy over the
    flattened buffer."""
    media = batch.column("media")
    blobs = media.to_pylist()
    n = len(blobs)
    width = np.empty(n, dtype=np.int64)
    height = np.empty(n, dtype=np.int64)
    n_payload = np.empty(n, dtype=np.int64)
    checksum = np.empty(n, dtype=np.int64)
    for i, b in enumerate(blobs):
        if len(b) < 8 or b[:4] != MAGIC:
            raise ValueError(f"bad media blob at row {i}: magic/length invalid")
        width[i] = int.from_bytes(b[4:6], "big")
        height[i] = int.from_bytes(b[6:8], "big")
        payload = np.frombuffer(b, dtype=np.uint8, offset=8)
        n_payload[i] = len(payload)
        checksum[i] = int(payload.sum(dtype=np.int64)) % 65536
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "width": pa.array(width),
            "height": pa.array(height),
            "n_payload": pa.array(n_payload),
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
    every Nth 'frame' (payload stride = width bytes). Demonstrates the
    flat_map explode shape (one row per sampled frame) without codecs."""
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
    media = batch.column("media").to_pylist()
    out_doc, out_frame, out_off = [], [], []
    for i, b in enumerate(media):
        if len(b) < 8 or b[:4] != MAGIC:
            raise ValueError(f"bad media blob at row {i}: magic/length invalid")
        width = int.from_bytes(b[4:6], "big")
        n_frames = max(0, (len(b) - 8)) // max(width, 1)
        for f in range(0, n_frames, every_n):
            out_doc.append(int(doc[i]))
            out_frame.append(f)
            out_off.append(8 + f * width)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "frame": pa.array(out_frame, pa.int64()),
            "byte_off": pa.array(out_off, pa.int64()),
        }
    )
