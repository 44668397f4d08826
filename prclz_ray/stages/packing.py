"""Distributed prefix-sum (scan) operators: sequence packing and
global shuffle ranks.

Trainer-facing steps that need a GLOBAL running total — something no
single `map_batches` can see. The engine's scan shape, Ray-Data-first:

1. project the scan input down to a tiny per-row table (drop text
   immediately — the scan state is (key, weight), ~24 B/row) and
   materialize it once, so the corpus is read exactly once;
2. range-bucket the key (``key // width`` — contiguous key ranges, so
   bucket order IS key order) and reduce per-bucket weight sums with a
   map-side partial + one bounded groupby (≤ PACK_BUCKETS groups);
3. the per-bucket totals — PACK_BUCKETS rows, bytes — come to the
   driver for an exclusive cumsum (the ONLY driver compute: O(buckets),
   independent of corpus size) and the base offsets broadcast via
   ``ray.put``;
4. one groupby(bucket) finishes the scan vectorized inside each range:
   sort by key, local cumsum + bucket base = exact global offsets.

On a 256-node cluster each range bucket is one reducer's worth of
(key, weight) rows — the documented assumption is a bucket's SCAN ROWS
fit one worker (the text never ships), same contract as every other
bounded-bucket shuffle in this repo.

Built on it:

- **sequence packing** (`seq_pack`): concatenate documents in doc_id
  order and cut fixed SEQ_LEN-token training windows; emit one row per
  (sequence, document) overlap — the pack manifest a loader needs to
  build attention-masked training batches. A document spanning a window
  boundary appears in both windows with its split token counts.
- **global shuffle rank** (`shuffle_rank`): deterministic training
  order = dense 1-based rank under ``(hash62(text), doc_id)`` — a
  reproducible corpus-wide shuffle with no RNG state, assigned without
  any single-node sort (hash ranges are uniform, so the range buckets
  are balanced by construction).

Reference analogue: the reference's per-country work ordering is a
driver-side sort (`midway/midway_blocks.py`); corpus-scale enumeration
is engine-new surface.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_strings62

SEQ_LEN = 128        # tokens per packed training sequence
PACK_BUCKETS = 256   # range buckets for the prefix-sum scan
HASH_SPAN = 1 << 62  # hash_strings62 codomain (for uniform range buckets)


from .hashing import arrow_combined as _combined
from .hashing import arrow_i64 as _i64


# ---------------------------------------------------------------------------
# scan machinery

def bucket_bases(rows, weight_col: str, bucket_col: str,
                 n_buckets: int = PACK_BUCKETS,
                 width: int | None = None) -> np.ndarray:
    """Exclusive prefix sum of per-bucket weight totals.

    One bounded groupby (≤ n_buckets groups) reduces the weights;
    the n_buckets-row result is the only thing the driver touches.
    Returns base[b] = total weight of all buckets < b (empty buckets
    contribute 0). ``width`` sizes the repartition feeding the reduce
    (the CLAUDE.md input-scaled reduce-width rule — with input-scaled
    bucket counts the partial stream stops compressing, so a fixed 8
    would make each reduce task hold ~stream/8 rows at 100 TB);
    default: reduce_width over the materialized row count."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({bucket_col: batch.column(bucket_col),
                      "w": batch.column(weight_col)})
        return (
            t.group_by(bucket_col)
            .aggregate([("w", "sum")])
            .rename_columns([bucket_col, "w"])
        )

    if width is None:
        from .scaling import reduce_width

        width = reduce_width(rows.count(), n_buckets)
    totals = (
        rows.map_batches(partial, batch_format="pyarrow")
        .repartition(width)  # floor keeps the measured small-scale
        # behavior (8 reduce tasks, not ~200 near-empty ones:
        # 5 s → 2 s); the width grows with the corpus past it
        .groupby(bucket_col)
        .sum("w")
        .to_pandas()  # ≤ n_buckets rows — bytes, not data
    )
    sums = np.zeros(n_buckets, dtype=np.int64)
    sums[totals[bucket_col].to_numpy()] = totals["sum(w)"].to_numpy()
    return np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)


# ---------------------------------------------------------------------------
# sequence packing

def compact_for_bucket_groupby(ds, scan_source, cap: int = 64, to: int = 16):
    """Small-scale latency guard before a bounded-bucket groupby: when
    the materialized scan source holds few blocks, collapse to ``to``
    partitions so the groupby runs ``to`` reduce tasks instead of ~200
    near-empty ones (measured 3.5 s → 1.8 s at test scale). At 100 TB
    the scan table has ≥ cap blocks and the extra all-to-all would
    cost more than it saves — skipped."""
    return ds.repartition(to) if scan_source.num_blocks() < cap else ds


def pack_dataset(tok):
    """Materialized (doc_id, nt) scan table → pack-manifest Dataset
    (seq_id, doc_id, tok_in_seq) — THE packing composition
    (empty-corpus guard, range-bucket width, bases broadcast,
    small-scale repartition guard) shared by q_seq_pack /
    q_train_pack / run_train_prep so its invariants live in one
    place."""
    import pyarrow as pa
    import ray

    if tok.count() == 0:
        # Empty corpus (e.g. curation filtered every document):
        # tok.max() would return None. Emit a typed empty manifest.
        return ray.data.from_arrow(
            pa.table(
                {
                    "seq_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "tok_in_seq": pa.array([], pa.int64()),
                }
            )
        )

    from .scaling import dynamic_buckets, reduce_width

    # scale the range-bucket count with the scan length: a fixed count
    # leaves group size = corpus / N (VERDICT r3); the driver still only
    # cumsums the n-buckets totals row
    n = tok.count()
    pb_n = dynamic_buckets(n, PACK_BUCKETS)
    rw = reduce_width(n, pb_n)
    # range anchored at the key MINIMUM so negative (md5-int64) ids
    # bucket correctly (see add_range_bucket)
    lo = tok.min("doc_id")
    width = (tok.max("doc_id") - lo) // pb_n + 1
    keyed = tok.map_batches(add_range_bucket(width, lo=lo), batch_format="pyarrow")
    bases_ref = ray.put(bucket_bases(keyed, "nt", "pb", n_buckets=pb_n, width=rw))

    return (
        compact_for_bucket_groupby(keyed, tok)
        .groupby("pb")
        .map_groups(make_pack_fn(bases_ref), batch_format="pyarrow")
        # when the compact gate skips the pre-repartition at scale, a
        # reduce partition with no pb groups emits a SCHEMA-LESS block
        # a map_batches re-type can never see (Ray skips zero-row
        # blocks) — launder by rebuilding blocks; the manifest is
        # 24 B/row, so the extra exchange is trivial
        .repartition(rw)
    )


def token_count_rows(batch: pa.Table) -> pa.Table:
    """documents → (doc_id, nt): whitespace token count. The text
    column dies here — only the 16 B/row scan state travels (the
    range bucket is attached afterwards by add_range_bucket, once the
    key range is known FROM this table, so the corpus is read once)."""
    text = pc.fill_null(batch.column("text"), "")
    nt = pc.list_value_length(pc.split_pattern(text, " "))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "nt": pc.cast(nt, pa.int64()),
        }
    )


def add_range_bucket(width: int, key: str = "doc_id", out: str = "pb",
                     lo: int = 0):
    """map_batches fn attaching the key-range scan bucket — a cheap
    map over the materialized scan state, never over the corpus.
    ``lo`` anchors the range: with md5-int64 keys (negative values,
    explicitly supported by the hash contract) an unanchored
    ``k // width`` yields bucket -1, which numpy SILENTLY wraps into
    the last bucket's slot in bucket_bases — corrupted offsets, no
    error. Callers pass the key minimum."""

    def add(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        return batch.append_column(out, _i64((k - lo) // width))

    return add


def make_pack_fn(bases_ref, seq_len: int = SEQ_LEN):
    """Group fn for one doc_id-range bucket: exact global token offsets
    (bucket base + local cumsum) → every (sequence, document) overlap,
    loop-free: spans explode by repeat/arange, overlap lengths by
    clamped window arithmetic."""
    import ray

    empty = pa.table(
        {
            "seq_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "tok_in_seq": pa.array([], pa.int64()),
        }
    )

    def pack(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        bases = ray.get(bases_ref)
        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        nt = g.column("nt").to_numpy(zero_copy_only=False)
        pb = int(g.column("pb")[0].as_py())
        st = bases[pb] + np.concatenate([[0], np.cumsum(nt)[:-1]])
        first = st // seq_len
        last = (st + nt - 1) // seq_len
        nspan = last - first + 1
        total = int(nspan.sum())
        doc_rep = np.repeat(np.arange(len(g), dtype=np.int64), nspan)
        local = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(nspan)[:-1]]), nspan
        )
        seq = first[doc_rep] + local
        lo = np.maximum(seq * seq_len, st[doc_rep])
        hi = np.minimum((seq + 1) * seq_len, (st + nt)[doc_rep])
        return pa.table(
            {
                "seq_id": _i64(seq),
                "doc_id": _combined(g.column("doc_id").take(pa.array(doc_rep))),
                "tok_in_seq": _i64(hi - lo),
            }
        )

    return pack


# ---------------------------------------------------------------------------
# RAG chunking: overlapping word windows, pure map-side

CHUNK_W = 40     # words per retrieval chunk
CHUNK_STRIDE = 30  # window stride (CHUNK_W - CHUNK_STRIDE words overlap)


def chunk_rows(batch: pa.Table, w: int = CHUNK_W, s: int = CHUNK_STRIDE) -> pa.Table:
    """documents → overlapping retrieval chunks (doc_id, chunk_idx,
    chunk_text): windows of ``w`` words at stride ``s``, the standard
    RAG/embedding prep step. Entirely map-side (each document chunks
    independently — no shuffle), loop-free: chunk counts explode by
    repeat/arange and every chunk's text is one ListArray slice over
    the shared flat word buffer + binary_join."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if batch.num_rows == 0:
        return empty
    text = pc.fill_null(batch.column("text"), "")
    words = pc.split_pattern(text, " ")
    flat_vals = _combined(pc.list_flatten(words))
    nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_start = np.concatenate([[0], np.cumsum(nw)])[:-1]
    nchunks = (nw + s - 1) // s  # starts k*s for k*s < nw; nw >= 1 always
    total = int(nchunks.sum())
    doc_rep = np.repeat(np.arange(len(nw), dtype=np.int64), nchunks)
    local = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(nchunks)[:-1]]), nchunks
    )
    c_lo = doc_start[doc_rep] + local * s
    c_hi = np.minimum(c_lo + w, (doc_start + nw)[doc_rep])
    # overlapping windows can't share one offsets vector (offsets must
    # be monotone), so gather each chunk's word indices explicitly —
    # the w/s overlap factor (~1.33×) is inherent to the output anyway
    clen = c_hi - c_lo
    out_off = np.concatenate([[0], np.cumsum(clen)])
    widx = (
        np.arange(int(out_off[-1]), dtype=np.int64)
        - np.repeat(out_off[:-1], clen)
        + np.repeat(c_lo, clen)
    )
    gathered = flat_vals.take(pa.array(widx))
    lists = pa.ListArray.from_arrays(pa.array(out_off, pa.int32()), gathered)
    chunk_text = _combined(pc.binary_join(lists, " "))
    return pa.table(
        {
            "doc_id": _combined(batch.column("doc_id").take(pa.array(doc_rep))),
            "chunk_idx": _i64(local),
            "chunk_text": chunk_text,
        }
    )


# ---------------------------------------------------------------------------
# global shuffle rank

def shuffle_key_rows(batch: pa.Table, n_buckets: int = PACK_BUCKETS) -> pa.Table:
    """documents → (doc_id, h, sb, one): the 62-bit content hash, its
    uniform range bucket, and the unit scan weight."""
    text = _combined(pc.fill_null(batch.column("text"), ""))
    h = hash_strings62(text)
    n = len(batch)
    # CEIL width: a floor width (HASH_SPAN // n) maps the top
    # (HASH_SPAN mod n) hash values to bucket index n — out of range
    # for bucket_bases' sums array — whenever the input-scaled count
    # is not a power of two
    width = -(-HASH_SPAN // n_buckets)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "h": _i64(h),
            "sb": _i64(h // width),
            "one": _i64(np.ones(n, dtype=np.int64)),
        }
    )


def make_rank_fn(bases_ref):
    """Group fn for one hash-range bucket: global 1-based rank under
    (h, doc_id) = bucket base + local dense position."""
    import ray

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "shuffle_pos": pa.array([], pa.int64()),
        }
    )

    def rank(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        bases = ray.get(bases_ref)
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        sb = int(g.column("sb")[0].as_py())
        pos = bases[sb] + np.arange(1, len(g) + 1, dtype=np.int64)
        return pa.table(
            {"doc_id": g.column("doc_id"), "shuffle_pos": _i64(pos)}
        )

    return rank
