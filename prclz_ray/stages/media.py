"""Multimodal-column stages: opaque binary media + typed metadata.

Images/audio/video are opaque ``binary`` columns with a small typed
header; decode / feature-extract are actor-pool-shaped ``map_batches``
stages. Two synthetic containers exist so every stage is REAL and
oracle-checkable without codec wheels:

- 'IMG1' (``synth_media``): header + the document text bytes as an
  opaque payload — metadata-decode territory (``media_meta``,
  ``frame_sample_plan``).
- 'IMG2' (``synth_media_pixels``): header + an RLE-compressed 8-bit
  grayscale image whose pixels are a deterministic function of
  (doc_id, row, col) — so ``DecodeActor`` performs a REAL byte-level
  decode (run expansion, numpy) and the per-document pixel statistics
  are recomputable in closed-form SQL. Swapping the RLE codec for
  libjpeg/ffmpeg in ``DecodeActor.__init__`` is the only change a real
  deployment needs; schema, batch sizing and output layout are final.

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


# ---------------------------------------------------------------------------
# pixel container 'IMG2': RLE-compressed synthetic grayscale images

MAGIC2 = b"IMG2"
# pixel(r, c) = ((doc_id + r) * 31 + c // 8) % 256 — byte-group runs
# along each row, so RLE genuinely compresses (~8×) and the per-doc
# pixel statistics have a closed SQL form
PX_W_MOD = 16   # width  = 8 + doc_id % 16       (≤ 23 px)
PX_H_MOD = 16   # height = 8 + (doc_id // 3) % 16


def _rle_encode(v: np.ndarray) -> bytes:
    """8-bit RLE: (run_length u8 ∈ [1,255], value u8) pairs, runs > 255
    split — vectorized (run boundaries via diff, oversize runs via a
    repeat/arange chunk expansion)."""
    v = np.ascontiguousarray(v, dtype=np.uint8)
    if len(v) == 0:
        return b""
    starts = np.concatenate([[0], np.flatnonzero(v[1:] != v[:-1]) + 1])
    lens = np.diff(np.concatenate([starts, [len(v)]]))
    vals = v[starts]
    nch = -(-lens // 255)  # chunks per run
    tot = int(nch.sum())
    base = np.repeat(np.concatenate([[0], np.cumsum(nch)[:-1]]), nch)
    local = np.arange(tot, dtype=np.int64) - base
    rem = np.repeat(lens, nch) - local * 255
    pairs = np.empty(2 * tot, np.uint8)
    pairs[0::2] = np.minimum(rem, 255).astype(np.uint8)
    pairs[1::2] = np.repeat(vals, nch)
    return pairs.tobytes()


def rle_decode(payload: bytes) -> np.ndarray:
    """Inverse of ``_rle_encode`` for one payload (golden tests)."""
    b = np.frombuffer(payload, dtype=np.uint8)
    return np.repeat(b[1::2], b[0::2].astype(np.int64))


def synth_pixels(doc_id: int) -> np.ndarray:
    """The deterministic (h, w) grayscale image for one document."""
    w = 8 + doc_id % PX_W_MOD
    h = 8 + (doc_id // 3) % PX_H_MOD
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return (((doc_id + r) * 31 + c // 8) % 256).astype(np.uint8)


def synth_media_pixels(batch: pa.Table) -> pa.Table:
    """documents → 'IMG2' rows: header + RLE-encoded synthetic image.
    Fixture-side stage (per-row encode loop is fine here — the hot
    path is the decode side)."""
    doc_id = batch.column("doc_id")
    blobs = []
    for d in doc_id.to_numpy(zero_copy_only=False):
        img = synth_pixels(int(d))
        h, w = img.shape
        blobs.append(
            MAGIC2
            + int(w).to_bytes(2, "big")
            + int(h).to_bytes(2, "big")
            + _rle_encode(img.ravel())
        )
    return pa.table(
        {
            "doc_id": doc_id,
            "media": pa.array(blobs, pa.large_binary()),
            "media_type": pa.array(["image/rle8"] * len(blobs), pa.string()),
        }
    )


def _decode_batch_pixels(batch: pa.Table):
    """Vectorized batch RLE decode over the flat Arrow buffer: returns
    (doc ids, widths, heights, flat decoded pixels, pixels-per-doc).
    No per-row Python — run counts/values are gathered for the whole
    batch via a repeat/arange pair-index expansion, then one
    ``np.repeat`` materializes every document's pixels."""
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    data, off = _binary_view(batch.column("media"))
    starts, ends = off[:-1], off[1:]
    lens = ends - starts
    if (lens < 8).any() or ((lens - 8) % 2 != 0).any():
        raise ValueError(
            f"bad media blob at row {int(np.argmax((lens < 8) | ((lens - 8) % 2 != 0)))}: "
            "length invalid"
        )
    magic = np.frombuffer(MAGIC2, dtype=np.uint8).astype(np.int64)
    d64 = data.astype(np.int64)
    for k in range(4):
        bad = d64[starts + k] != magic[k]
        if bad.any():
            raise ValueError(f"bad media blob at row {int(np.argmax(bad))}: magic invalid")
    width = d64[starts + 4] * 256 + d64[starts + 5]
    height = d64[starts + 6] * 256 + d64[starts + 7]
    if (width * height == 0).any():
        # a zero-area image passes the pixel-count check (0 == 0·h) but
        # puts a repeated/terminal offset into the reduceat calls
        # downstream (wrong-doc px_max, or IndexError when last)
        raise ValueError(
            f"bad media blob at row {int(np.argmax(width * height == 0))}: "
            "zero-area image"
        )
    npairs = (lens - 8) // 2
    tot = int(npairs.sum())
    base = np.repeat(starts + 8, npairs)
    local = np.arange(tot, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(npairs)[:-1]]), npairs
    )
    cidx = base + 2 * local
    counts = d64[cidx]
    values = data[cidx + 1]  # keep uint8 — np.repeat below stays 1 B/px
    flat = np.repeat(values, counts)
    n_px = np.bincount(
        np.repeat(np.arange(len(doc)), npairs), weights=counts, minlength=len(doc)
    ).astype(np.int64)
    if (n_px != width * height).any():
        raise ValueError(
            f"bad media blob at row {int(np.argmax(n_px != width * height))}: "
            "decoded pixel count != header dims"
        )
    return doc, width, height, flat, n_px


class DecodeActor:
    """Actor-pool decode stage (the stateful-stage shape for real
    codecs: codec/model loaded once per actor in __init__, decode per
    batch in __call__). The synthetic 'IMG2' codec is byte-real RLE;
    a deployment swaps ``self.decode`` for libjpeg/ffmpeg and keeps
    the schema/batch plumbing unchanged."""

    def __init__(self):
        self.decode = _decode_batch_pixels  # real: bind the codec here

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "width": pa.array([], pa.int64()),
                    "height": pa.array([], pa.int64()),
                    "n_pixels": pa.array([], pa.int64()),
                    "px_sum": pa.array([], pa.int64()),
                    "px_max": pa.array([], pa.int64()),
                }
            )
        doc, width, height, flat, n_px = self.decode(batch)
        row_of = np.repeat(np.arange(len(doc)), n_px)
        px_sum = np.bincount(row_of, weights=flat, minlength=len(doc)).astype(np.int64)
        px_max = np.maximum.reduceat(
            flat.astype(np.int64), np.concatenate([[0], np.cumsum(n_px)[:-1]])
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "width": pa.array(width, pa.int64()),
                "height": pa.array(height, pa.int64()),
                "n_pixels": pa.array(n_px, pa.int64()),
                "px_sum": pa.array(px_sum, pa.int64()),
                "px_max": pa.array(px_max, pa.int64()),
            }
        )


def frame_pixel_sums(batch: pa.Table, every_n: int = 4) -> pa.Table:
    """Decoded-pixel frame sampling: decode the 'IMG2' image, treat each
    pixel ROW as a frame, keep every ``every_n``-th frame with its
    pixel-sum checksum. The decode→window composition a video pipeline
    runs per sampled frame, fully vectorized: one global
    ``add.reduceat`` at row offsets, then the sampled-row select."""
    if len(batch) == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "frame": pa.array([], pa.int64()),
                "row_sum": pa.array([], pa.int64()),
            }
        )
    doc, width, height, flat, n_px = _decode_batch_pixels(batch)
    # zero-area blobs already rejected by the decode
    n = len(doc)
    tot_rows = int(height.sum())
    img_of_row = np.repeat(np.arange(n), height)
    local_row = np.arange(tot_rows, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(height)[:-1]]), height
    )
    img_start = np.concatenate([[0], np.cumsum(n_px)[:-1]])
    row_off = img_start[img_of_row] + local_row * width[img_of_row]
    row_sums = np.add.reduceat(flat.astype(np.int64), row_off)
    keep = local_row % every_n == 0
    return pa.table(
        {
            "doc_id": pa.array(doc[img_of_row[keep]], pa.int64()),
            "frame": pa.array(local_row[keep], pa.int64()),
            "row_sum": pa.array(row_sums[keep], pa.int64()),
        }
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
