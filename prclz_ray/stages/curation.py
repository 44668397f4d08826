"""Corpus-curation stages: host caps, line-level dedup, repetition
signals, near-dup clustering, TF-IDF keywords.

The operators a web-scale training-data pipeline runs AFTER extraction
and BEFORE tokenization, each expressed Ray-Data-first with the repo's
standard scale shapes:

- **host stats / host cap** (Common-Crawl-style per-site limits):
  map-side partial aggregation → one small groupby for the stats; a
  bounded-bucket shuffle on ``hash(host) % N`` for the per-host rank
  cap (never one Ray group per host — hosts are ~10^7 with heavy skew
  at web scale; the run-length rank inside the bucket is vectorized).
- **line-level dedup** (CCNet-style): documents → fixed-width word
  "lines" → corpus-wide duplicate-line detection via ONE shuffle on
  the line-hash bucket → flagged rows → ONE shuffle on the doc bucket
  to reassemble the cleaned text in line order. Two bounded
  all-to-alls, no broadcast line set, no driver compute.
- **repetition signals** (Gopher-style quality heuristics): per-doc
  duplicate-line and top-bigram character fractions — pure map-side,
  no shuffle, exact-integer ``x1000`` fractions so the DuckDB oracle
  hashes bit-for-bit.
- **connected components** over near-dup candidate pairs: iterative
  min-label propagation as Ray join+groupby rounds. Labels only ever
  decrease, so ``sum(label)`` is a strictly decreasing fixpoint
  witness — convergence detection is one tiny aggregate per round,
  no driver-side diff of the label table.
- **TF-IDF top-k terms**: per-doc term frequencies map-side (a doc is
  one row, so its words never straddle batches), document frequencies
  as a small groupby, one hash join tf⋈df, then a bounded-bucket
  per-doc top-k selection.

Lines are chunks of ``LINE_W`` consecutive words (the synthetic corpus
is single-line; at 100 TB the splitter would be ``\\n`` and nothing
downstream changes). Reference analogue: the reference dedups nodes /
edges / block ids (`prclz/utils.py:33-34`) — corpus-level text dedup
is engine-new surface.

All kernels are flat-Arrow/numpy vectorized; list offsets use int32
ListArray (a single batch holds < 2^31 words by construction —
``target_max_block_size`` caps blocks far below that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _sorted_runs
from .hashing import ensure_ascii, hash_strings, hash_strings62

LINE_W = 10          # words per "line" of the synthetic single-line corpus
# The *_BUCKETS constants below are FLOORS, not fixed counts: every
# stage takes an ``n_buckets``/``doc_buckets`` parameter and the query
# layer scales it with the input via stages/scaling.dynamic_buckets
# (group size stays ≈ worker budget at any corpus size; reduce
# parallelism grows with the data). Results are bucket-count-invariant.
LINE_BUCKETS = 1024  # floor: corpus-wide line-df shuffle
DOC_BUCKETS = 256    # floor: per-doc regrouping shuffle
HOST_BUCKETS = 64    # floor: per-host ranking shuffle
HOST_CAP = 15        # max documents kept per host (host_cap query)
KB_BUCKETS = 512     # floor: text-hash buckets for exact keep-min dedup
                     # — ALSO the curate sink's write-partition floor
                     # (pipelines/curate.py re-derives it with the same
                     # dynamic rule, so layout is input-deterministic)
TFIDF_K = 3          # top terms kept per document
WORD_BUCKETS = 64    # floor: document-frequency shuffle
SCORE_SCALE = 1_000_000  # tf-idf score = tf * SCALE // df (exact integer)


from .hashing import arrow_combined as _combined
from .hashing import arrow_i64 as _i64


def _split_words(batch: pa.Table):
    """(flat word array, word→row index, words-per-row) for the batch's
    ``text`` column, null-filled to '' (same equivalence the COALESCE
    oracle fragment would use)."""
    text = pc.fill_null(batch.column("text"), "")
    words = pc.split_pattern(text, " ")
    flat = _combined(pc.list_flatten(words))
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False).astype(np.int64)
    nw = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, par, nw


def _line_arrays(batch: pa.Table, words=None):
    """Chunk each doc's words into LINE_W-word lines, vectorized: the
    flat word array is re-grouped by computed line offsets (lines tile
    the flat array contiguously, so starts alone define the list) and
    joined per line. Returns (line strings, line→row index, line index
    within doc). ``words`` takes a precomputed ``_split_words`` triple
    so a caller that needs both views splits the corpus only once."""
    flat, _, nw = words if words is not None else _split_words(batch)
    n = len(batch)
    nlines = -(-nw // LINE_W)  # ceil; split('') == [''] so nw >= 1 always
    doc_word_start = np.concatenate([[0], np.cumsum(nw)])
    line_doc = np.repeat(np.arange(n, dtype=np.int64), nlines)
    line_cum = np.concatenate([[0], np.cumsum(nlines)])
    local = np.arange(int(nlines.sum()), dtype=np.int64) - line_cum[line_doc]
    starts = doc_word_start[line_doc] + local * LINE_W
    offsets = np.concatenate([starts, [doc_word_start[-1]]])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    return _combined(pc.binary_join(lists, " ")), line_doc, local


# ---------------------------------------------------------------------------
# line-level dedup (CCNet shape)

def doc_line_rows(batch: pa.Table, n_buckets: int = LINE_BUCKETS) -> pa.Table:
    """documents → one row per line with the bounded shuffle key
    ``lb = hash(line) % LINE_BUCKETS``."""
    lines, line_doc, local = _line_arrays(batch)
    doc_ids = _combined(batch.column("doc_id").take(pa.array(line_doc)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "line_idx": _i64(local),
            "line": lines,
            "lb": _i64(hash_strings(lines) % n_buckets),
        }
    )


def line_flag_rows(group: pa.Table, doc_buckets: int = DOC_BUCKETS) -> pa.Table:
    """One line-hash bucket: mark every occurrence of a line whose
    corpus-wide count is ≥ 2 (string-exact df inside the bucket — a
    line's occurrences all share its hash bucket). Rows pass through
    with the flag plus the next shuffle's doc bucket key."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "line_idx": pa.array([], pa.int64()),
            "line": pa.array([], pa.string()),
            "dup": pa.array([], pa.int64()),
            "db": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "line")
    counts = np.diff(run_start)
    dup = np.repeat(counts >= 2, counts).astype(np.int64)
    doc = g.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": g.column("doc_id"),
            "line_idx": g.column("line_idx"),
            "line": g.column("line"),
            "dup": _i64(dup),
            "db": _i64(doc % doc_buckets),
        }
    )


def reassemble_docs(group: pa.Table) -> pa.Table:
    """One doc bucket: rebuild each document's cleaned text from its
    kept lines in line order (vectorized: sort → per-doc kept-line
    lists → binary_join). Docs whose every line was dropped emit
    ``clean_text = ''`` (the COALESCE('') contract)."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.string()),
            "n_lines": pa.array([], pa.int64()),
            "n_dropped": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(
        group, sort_keys=[("doc_id", "ascending"), ("line_idx", "ascending")]
    )
    g = group.take(order)
    d = g.column("doc_id").to_numpy(zero_copy_only=False)
    dup = g.column("dup").to_numpy(zero_copy_only=False)
    run_start = np.concatenate([[0], np.flatnonzero(d[1:] != d[:-1]) + 1, [len(d)]])
    n_lines = np.diff(run_start)
    csum_dup = np.concatenate([[0], np.cumsum(dup)])
    n_dropped = csum_dup[run_start[1:]] - csum_dup[run_start[:-1]]
    keep = dup == 0
    kept_lines = _combined(g.column("line").filter(pa.array(keep)))
    kept_per_doc = n_lines - n_dropped
    offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept_lines)
    clean = _combined(pc.binary_join(lists, " "))
    return pa.table(
        {
            "doc_id": _i64(d[run_start[:-1]]),
            "clean_text": clean,
            "n_lines": _i64(n_lines),
            "n_dropped": _i64(n_dropped),
        }
    )


# ---------------------------------------------------------------------------
# host stats / cap

def host_partial_stats(batch: pa.Table, n_buckets: int = HOST_BUCKETS) -> pa.Table:
    """Map-side partial per-host (doc count, char sum) — the combiner
    half of the host_stats aggregate. COUNT(*) semantics (count_all,
    not count-non-null — a null n_chars row still counts, matching the
    oracle); partials leave keyed by the bounded host hash bucket so
    the reduce is ONE shuffle over HOST_BUCKETS groups, never a Ray
    group per host (~10^7 hosts at web scale — the CLAUDE.md
    tiny-groups rule)."""
    t = pa.table({"host": batch.column("source"), "n_chars": batch.column("n_chars")})
    agg = (
        t.group_by("host")
        .aggregate([([], "count_all"), ("n_chars", "sum")])
        .rename_columns(["host", "nd_", "ch_"])
    )
    host = _combined(agg.column("host"))
    return agg.set_column(0, "host", host).append_column(
        "hb", _i64(hash_strings(host) % n_buckets)
    )


def host_combine_stats(group: pa.Table) -> pa.Table:
    """One host bucket of partials: sum to final per-host (n_docs,
    sum_chars) — a host's partials all share its hash bucket, so the
    final stats are complete here (vectorized Arrow group_by inside
    the bucket)."""
    empty = pa.table(
        {
            "host": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
            "sum_chars": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    return (
        pa.table({"host": group.column("host"), "nd_": group.column("nd_"),
                  "ch_": group.column("ch_")})
        .group_by("host")
        .aggregate([("nd_", "sum"), ("ch_", "sum")])
        .rename_columns(["host", "n_docs", "sum_chars"])
    )


def host_cap_rows(batch: pa.Table, n_buckets: int = HOST_BUCKETS) -> pa.Table:
    """documents → (doc_id, host, hb) rows keyed by the bounded host
    hash bucket."""
    host = _combined(batch.column("source"))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "host": host,
            "hb": _i64(hash_strings(host) % n_buckets),
        }
    )


def _rank_cap(group: pa.Table, cap: int) -> pa.Table:
    """Shared rank-cap core: sort one host bucket by (host, doc_id),
    keep each host's first ``cap`` rows (vectorized run arithmetic),
    return the filtered table with ALL its columns."""
    g, run_start = _sorted_runs(group, "host")
    counts = np.diff(run_start)
    pos = np.arange(len(g), dtype=np.int64) - np.repeat(run_start[:-1], counts)
    return g.filter(pa.array(pos < cap))


def host_rank_keep(group: pa.Table, cap: int = HOST_CAP) -> pa.Table:
    """One host bucket: keep each host's first ``cap`` documents by
    doc_id (deterministic rank via run arithmetic, no per-host Python)."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "host": pa.array([], pa.string())}
    )
    if group.num_rows == 0:
        return empty
    return _rank_cap(group, cap).select(["doc_id", "host"])


def host_rank_keep_text(group: pa.Table, cap: int = HOST_CAP) -> pa.Table:
    """host_rank_keep variant for the end-to-end curation pipeline:
    same first-``cap``-docs-per-host rule, but the document TEXT rides
    through the host shuffle so the next stage needs no join back to
    the corpus (one bounded all-to-all carrying the corpus — the same
    tradeoff line_dedup makes)."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "host": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )
    if group.num_rows == 0:
        return empty
    return _rank_cap(group, cap).select(["doc_id", "host", "text"])


def dedup_keep_min(group: pa.Table, text_col: str = "clean_text") -> pa.Table:
    """One text-hash bucket: keep each distinct text's minimum-doc_id
    row (string-exact inside the bucket; a text's occurrences all
    share its hash bucket). The keep-first half of exact dedup, as a
    pipeline stage."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            text_col: pa.array([], pa.string()),
        }
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, text_col)  # (text, doc_id) asc
    heads = pa.array(run_start[:-1])
    return pa.table(
        {
            "doc_id": g.column("doc_id").take(heads),
            text_col: g.column(text_col).take(heads),
        }
    )


def ccnet_tier_rows(batch: pa.Table, n_buckets: int = HOST_BUCKETS) -> pa.Table:
    """documents → (doc_id, host, nw, hb): word count + the bounded
    host bucket for the per-host tier split."""
    host = _combined(batch.column("source"))
    text = pc.fill_null(batch.column("text"), "")
    nw = pc.cast(pc.list_value_length(pc.split_pattern(text, " ")), pa.int64())
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "host": host,
            "nw": nw,
            "hb": _i64(hash_strings(host) % n_buckets),
        }
    )


def ccnet_tier_assign(group: pa.Table, tiers: int = 3) -> pa.Table:
    """One host bucket: CCNet-style head/middle/tail split — each
    host's documents ranked by (quality proxy desc, doc_id) and cut
    into ``tiers`` NTILE groups (exact NTILE semantics: the first
    n % tiers groups take the extra row). Vectorized run arithmetic,
    no per-host Python."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "host": pa.array([], pa.string()),
            "tier": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(
        group,
        sort_keys=[
            ("host", "ascending"),
            ("nw", "descending"),
            ("doc_id", "ascending"),
        ],
    )
    g = group.take(order)
    h = g.column("host")
    neq = pc.not_equal(h.slice(1), h.slice(0, len(h) - 1)).to_numpy(
        zero_copy_only=False
    )
    run_start = np.concatenate([[0], np.flatnonzero(neq) + 1, [len(g)]])
    counts = np.diff(run_start)
    pos = np.arange(len(g), dtype=np.int64) - np.repeat(run_start[:-1], counts)
    n = np.repeat(counts, counts)
    q, r = n // tiers, n % tiers
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiers
    tier = np.where(pos < big, pos // np.maximum(q + 1, 1),
                    r + (pos - big) // np.maximum(q, 1))
    return pa.table(
        {
            "doc_id": g.column("doc_id"),
            "host": g.column("host"),
            "tier": _i64(tier + 1),
        }
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style)

def repetition_signals(batch: pa.Table) -> pa.Table:
    """Per-doc repetition quality signals, pure map-side:

    - ``dup_line_frac_x1000``  — beyond-first occurrences of repeated
      LINE_W-word lines / total lines
    - ``dup_char_frac_x1000``  — chars of those beyond-first line
      occurrences / doc chars
    - ``top_bigram_frac_x1000`` — occurrences×length of the most
      frequent word bigram / doc chars (ties → lexicographically
      first bigram, mirroring the oracle's ORDER BY c DESC, b)

    All floor-divided x1000 integers for bit-exact oracle parity.
    """
    n = len(batch)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_lines": pa.array([], pa.int64()),
            "dup_line_frac_x1000": pa.array([], pa.int64()),
            "dup_char_frac_x1000": pa.array([], pa.int64()),
            "top_bigram_frac_x1000": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    text = _combined(pc.fill_null(batch.column("text"), ""))
    # codepoint lengths here vs strlen() bytes in the oracle — gate on
    # the shared ASCII-only contract
    ensure_ascii(text, "repetition_signals")
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = np.maximum(n_chars, 1)  # '' guard: fractions of nothing are 0/1

    # --- duplicate lines within each doc (ONE split feeds both the
    # line view and the bigram pass below — the split dominates the
    # kernel's per-batch cost)
    words3 = _split_words(batch)
    lines, line_doc, _ = _line_arrays(batch, words=words3)
    lt = pa.table({"d": _i64(line_doc), "s": lines})
    g, run_start = _sorted_runs_2(lt, "d", "s")
    counts = np.diff(run_start)
    sl = pc.utf8_length(g.column("s")).to_numpy(zero_copy_only=False).astype(np.int64)
    run_doc = g.column("d").to_numpy(zero_copy_only=False)[run_start[:-1]]
    run_sl = sl[run_start[:-1]]
    n_lines = np.bincount(run_doc, weights=counts, minlength=n).astype(np.int64)
    dup_occ = np.bincount(run_doc, weights=counts - 1, minlength=n).astype(np.int64)
    dup_chars = np.bincount(
        run_doc, weights=(counts - 1) * run_sl, minlength=n
    ).astype(np.int64)

    # --- top bigram per doc
    flat, par, nw = words3
    m = len(flat)
    top_chars = np.zeros(n, dtype=np.int64)
    if m >= 2:
        valid = par[: m - 1] == par[1:]
        if valid.any():
            vmask = pa.array(valid)
            bg = _combined(
                pc.binary_join_element_wise(
                    flat.slice(0, m - 1).filter(vmask),
                    flat.slice(1, m - 1).filter(vmask),
                    " ",
                )
            )
            bt = pa.table({"d": _i64(par[: m - 1][valid]), "s": bg})
            gb, bstart = _sorted_runs_2(bt, "d", "s")
            bc = np.diff(bstart)
            bdoc = gb.column("d").to_numpy(zero_copy_only=False)[bstart[:-1]]
            bsl = pc.utf8_length(gb.column("s")).to_numpy(zero_copy_only=False).astype(
                np.int64
            )[bstart[:-1]]
            # first run per doc in (count desc, bigram asc) order: runs are
            # already bigram-asc within doc, so a stable sort on -count
            # keeps the lexicographically first among ties
            best = np.lexsort((np.arange(len(bc)), -bc, bdoc))
            first = np.concatenate(
                [[0], np.flatnonzero(bdoc[best][1:] != bdoc[best][:-1]) + 1]
            )
            sel = best[first]
            top_chars[bdoc[sel]] = bc[sel] * bsl[sel]

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_lines": _i64(n_lines),
            "dup_line_frac_x1000": _i64(dup_occ * 1000 // np.maximum(n_lines, 1)),
            "dup_char_frac_x1000": _i64(dup_chars * 1000 // n_chars),
            "top_bigram_frac_x1000": _i64(top_chars * 1000 // n_chars),
        }
    )


def _sorted_runs_2(t: pa.Table, k1: str, k2: str):
    """Sort by (k1, k2) and return (sorted table, run starts of equal
    (k1,k2) pairs) — the two-key sibling of dedup._sorted_runs."""
    order = pc.sort_indices(t, sort_keys=[(k1, "ascending"), (k2, "ascending")])
    g = t.take(order)
    a = g.column(k1)
    b = g.column(k2)
    neq = pc.or_(
        pc.not_equal(a.slice(1), a.slice(0, len(a) - 1)),
        pc.not_equal(b.slice(1), b.slice(0, len(b) - 1)),
    ).to_numpy(zero_copy_only=False)
    run_start = np.concatenate([[0], np.flatnonzero(neq) + 1, [t.num_rows]])
    return g, run_start


# ---------------------------------------------------------------------------
# TF-IDF top-k

def word_tf_rows(batch: pa.Table, n_buckets: int = WORD_BUCKETS) -> pa.Table:
    """documents → (doc_id, word, tf, wb) — per-doc term frequencies
    are complete map-side (one document per input row); ``wb`` is the
    bounded shuffle key for the document-frequency pass."""
    flat, par, _ = _split_words(batch)
    t = pa.table({"d": _i64(par), "word": flat})
    g, run_start = _sorted_runs_2(t, "d", "word")
    counts = np.diff(run_start)
    heads = run_start[:-1]
    doc_ids = _combined(
        batch.column("doc_id").take(
            pa.array(g.column("d").to_numpy(zero_copy_only=False)[heads])
        )
    )
    words = _combined(g.column("word").take(pa.array(heads)))
    return pa.table(
        {
            "doc_id": doc_ids,
            "word": words,
            "tf": _i64(counts),
            "wb": _i64(hash_strings(words) % n_buckets),
        }
    )


def tf_score_rows(group: pa.Table, doc_buckets: int = DOC_BUCKETS) -> pa.Table:
    """One word bucket of tf rows: a word's rows all share its hash
    bucket, so its document frequency is complete here — score =
    ``tf * SCORE_SCALE // df`` (exact integer), rows leave keyed by
    the per-doc top-k shuffle's doc bucket."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "word": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "db": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "word")
    counts = np.diff(run_start)
    df = np.repeat(counts, counts)
    tf = g.column("tf").to_numpy(zero_copy_only=False)
    d = g.column("doc_id").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": g.column("doc_id"),
            "word": g.column("word"),
            "tf": g.column("tf"),
            "score": _i64(tf * SCORE_SCALE // df),
            "db": _i64(d % doc_buckets),
        }
    )


def doc_topk(group: pa.Table, k: int = TFIDF_K) -> pa.Table:
    """One doc bucket of scored term rows → each doc's top-k terms by
    (score desc, word asc) with a 1-based rank column."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "word": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(
        group,
        sort_keys=[
            ("doc_id", "ascending"),
            ("score", "descending"),
            ("word", "ascending"),
        ],
    )
    g = group.take(order)
    d = g.column("doc_id").to_numpy(zero_copy_only=False)
    run_start = np.concatenate([[0], np.flatnonzero(d[1:] != d[:-1]) + 1, [len(d)]])
    counts = np.diff(run_start)
    pos = np.arange(len(d), dtype=np.int64) - np.repeat(run_start[:-1], counts)
    keep = pa.array(pos < k)
    g = pa.table(
        {
            "doc_id": g.column("doc_id"),
            "word": g.column("word"),
            "tf": g.column("tf"),
            "score": g.column("score"),
            "rank": _i64(pos + 1),
        }
    ).filter(keep)
    return g


# ---------------------------------------------------------------------------
# corpus n-gram statistics + duplicated-substring spans

NGRAM_N = 3          # words per n-gram for corpus-wide counting
NGRAM_TOPK = 20      # global top-k most frequent n-grams
GRAM_BUCKETS = 256   # shuffle-key buckets for n-gram counting
DUP_G = 5            # gram width for duplicated-substring detection
DUP_BUCKETS = 512    # shuffle-key buckets for the dup-gram df pass


def _gram_strings(flat, par: np.ndarray, n: int):
    """All n-word grams over the flat word array: n shifted slices
    joined element-wise, masked to grams that stay within one row.
    Returns (gram strings, gram→row index, flat start index of each
    gram) — loop-free in the gram count; positions come from the same
    mask so they can never misalign with the gram strings."""
    m = len(flat)
    z = np.zeros(0, dtype=np.int64)
    if m < n:
        return pa.array([], pa.string()), z, z
    valid = par[: m - n + 1] == par[n - 1 :]
    parts = [flat.slice(i, m - n + 1) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ").filter(pa.array(valid))
    return grams, par[: m - n + 1][valid], np.flatnonzero(valid)


def ngram_partial_counts(batch: pa.Table, n: int = NGRAM_N, n_buckets: int = GRAM_BUCKETS) -> pa.Table:
    """documents → map-side partial n-gram counts (gram, n, gb) — the
    combiner half of the corpus-wide count; one Arrow group_by per
    batch, never a row per occurrence on the wire."""
    empty = pa.table(
        {
            "gram": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "gb": pa.array([], pa.int64()),
        }
    )
    flat, par, _ = _split_words(batch)
    grams, _, _ = _gram_strings(flat, par, n)
    if len(grams) == 0:
        return empty
    agg = (
        pa.table({"gram": grams})
        .group_by("gram")
        .aggregate([([], "count_all")])
        .rename_columns(["gram", "n"])
    )
    g = _combined(agg.column("gram"))
    return pa.table(
        {
            "gram": g,
            "n": pc.cast(agg.column("n"), pa.int64()),
            "gb": _i64(hash_strings(g) % n_buckets),
        }
    )


def bucket_topk_grams(group: pa.Table, k: int = NGRAM_TOPK) -> pa.Table:
    """One gram bucket: sum partial counts per gram and keep the
    bucket's top-k by (count desc, gram asc). A gram lives in exactly
    one bucket, so the global top-k is contained in the union of
    per-bucket top-k candidates."""
    empty = pa.table(
        {"gram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )
    if group.num_rows == 0:
        return empty
    agg = (
        pa.table({"gram": group.column("gram"), "n": group.column("n")})
        .group_by("gram")
        .aggregate([("n", "sum")])
        .rename_columns(["gram", "n"])
    )
    srt = agg.sort_by([("n", "descending"), ("gram", "ascending")])
    return srt.slice(0, k)


def global_topk_grams(batch: pa.Table, k: int = NGRAM_TOPK) -> pa.Table:
    """Final selection over the ≤ GRAM_BUCKETS×k candidate rows (one
    small task after repartition(1))."""
    return batch.sort_by([("n", "descending"), ("gram", "ascending")]).slice(0, k)


def gram_pos_rows(batch: pa.Table, n: int = DUP_G, n_buckets: int = DUP_BUCKETS) -> pa.Table:
    """documents → one row per DUP_G-word gram occurrence with its
    1-based word position, keyed by the bounded gram-hash bucket."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "p": pa.array([], pa.int64()),
            "gram": pa.array([], pa.string()),
            "gb": pa.array([], pa.int64()),
        }
    )
    flat, par, nw = _split_words(batch)
    grams, vpar, valid_idx = _gram_strings(flat, par, n)
    if len(grams) == 0:
        return empty
    starts = np.concatenate([[0], np.cumsum(nw)])[:-1]
    pos = valid_idx - starts[vpar] + 1
    ids = _combined(batch.column("doc_id").take(pa.array(vpar)))
    return pa.table(
        {
            "doc_id": ids,
            "p": _i64(pos),
            "gram": grams,
            "gb": _i64(hash_strings(grams) % n_buckets),
        }
    )


def dup_flag_rows(group: pa.Table, doc_buckets: int = DOC_BUCKETS) -> pa.Table:
    """One gram bucket: keep occurrences of grams whose corpus-wide
    count is ≥ 2 (a gram's occurrences all share its hash bucket);
    survivors leave keyed by the per-doc span shuffle's doc bucket."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "p": pa.array([], pa.int64()),
            "db": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "gram")
    counts = np.diff(run_start)
    dup = pa.array(np.repeat(counts >= 2, counts))
    d = g.column("doc_id").filter(dup)
    dn = _combined(d).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": d,
            "p": g.column("p").filter(dup),
            "db": _i64(dn % doc_buckets),
        }
    )


def dup_span_agg(group: pa.Table, g: int = DUP_G) -> pa.Table:
    """One doc bucket of flagged gram positions → per-doc maximal
    duplicated spans, fully vectorized: positions are lifted to
    ``dense_doc_rank * stride + p`` (stride > max position + g) so a
    single global running-max interval merge can never join spans
    across documents. The DENSE rank — not doc_id itself — keeps the
    lift overflow-free for arbitrary int64 doc_ids (md5-hash ids
    included): rank ≤ rows-in-bucket and stride ≤ longest doc in
    words, so the product stays far under 2^63. Output: (doc_id,
    dup_word_cover, n_spans) for documents containing ≥ 1
    corpus-duplicated DUP_G-gram."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "dup_word_cover": pa.array([], pa.int64()),
            "n_spans": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(
        group, sort_keys=[("doc_id", "ascending"), ("p", "ascending")]
    )
    srt = group.take(order)
    d = srt.column("doc_id").to_numpy(zero_copy_only=False)
    p = srt.column("p").to_numpy(zero_copy_only=False)
    newdoc = np.concatenate([[True], d[1:] != d[:-1]])
    di = np.cumsum(newdoc) - 1  # dense doc rank within the sorted bucket
    stride = np.int64(int(p.max()) + g + 1)  # > any within-doc end offset
    if int(di[-1]) >= (1 << 62) // int(stride):
        # a raise, not an assert: python -O strips asserts and the
        # wrapped product would SILENTLY corrupt spans (_pr_flow
        # convention)
        raise OverflowError("dup_span_agg lift overflow")
    q = di * stride + p  # doc-lifted positions
    endmax = np.maximum.accumulate(q + g)
    newspan = np.concatenate([[True], q[1:] > endmax[:-1]])
    span_heads = np.flatnonzero(newspan)
    span_start = q[span_heads]
    span_end = np.concatenate([endmax[span_heads[1:] - 1], [endmax[-1]]])
    cover = span_end - span_start
    span_doc = d[span_heads]
    doc_start = np.concatenate(
        [[0], np.flatnonzero(span_doc[1:] != span_doc[:-1]) + 1, [len(span_doc)]]
    )
    n_spans = np.diff(doc_start)
    csum = np.concatenate([[0], np.cumsum(cover)])
    doc_cover = csum[doc_start[1:]] - csum[doc_start[:-1]]
    return pa.table(
        {
            "doc_id": _i64(span_doc[doc_start[:-1]]),
            "dup_word_cover": _i64(doc_cover),
            "n_spans": _i64(n_spans),
        }
    )


# ---------------------------------------------------------------------------
# suffix-granularity exact-substring dedup (Lee et al. 2022 shape)

DUP_L = 30  # minimum duplicated substring length in CHARS — the
# char-level analogue of Lee et al. 2022's 50-BPE-token threshold
# ("Deduplicating Training Data Makes Language Models Better"; their
# suffix-array pass catches overlaps the gram pass cannot). dup_spans
# works at DUP_G-WORD gram granularity, so a repeated substring
# shorter than DUP_G words (or straddling word boundaries differently)
# is invisible to it; this family seeds EVERY char position instead.
DUPX_BUCKETS = 512  # floor: window shuffle buckets (input-scaled)


def char_window_rows(
    batch: pa.Table, L: int = DUP_L, n_buckets: int = DUPX_BUCKETS
) -> pa.Table:
    """documents → one row per length-``L`` char window: (doc_id, p
    1-based char position, w window string, xb bounded shuffle
    bucket). The distributed stand-in for a suffix array: every
    duplicated substring of length ≥ L contains at least one aligned
    length-L window, so counting window multiplicity corpus-wide finds
    every such overlap. Rows ≈ corpus chars and each carries its
    L-byte window (the exactness contract — string equality, never
    hash equality, decides duplication; the ~L× shuffle blowup is the
    same price the oracle and the suffix array pay). Fully vectorized:
    one sliding view over the flat Arrow buffer, no per-row Python."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "p": pa.array([], pa.int64()),
            "w": pa.array([], pa.large_string()),
            "xb": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    text = pc.fill_null(batch.column("text"), "")
    data, offsets = ensure_ascii(text, "char_window_rows")
    lens = offsets[1:] - offsets[:-1]
    counts = np.maximum(lens - L + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return empty
    rep = np.repeat(np.arange(len(lens), dtype=np.int64), counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    flat_start = offsets[:-1][rep] + within
    # gather every window's bytes in one strided view + one fancy copy
    win = np.lib.stride_tricks.sliding_window_view(data, L)[flat_start]
    w_arr = pa.LargeStringArray.from_buffers(
        total,
        pa.py_buffer((np.arange(total + 1, dtype=np.int64) * L).tobytes()),
        pa.py_buffer(np.ascontiguousarray(win).tobytes()),
    )
    return pa.table(
        {
            "doc_id": _combined(batch.column("doc_id").take(pa.array(rep))),
            "p": _i64(within + 1),
            "w": w_arr,
            "xb": _i64(hash_strings(w_arr) % n_buckets),
        }
    )


def dupx_flag_rows(group: pa.Table, doc_buckets: int = DOC_BUCKETS) -> pa.Table:
    """One window bucket: keep positions of windows whose corpus-wide
    occurrence count is ≥ 2 (a window's occurrences all share its hash
    bucket; equality is decided on the STRING). Survivors leave keyed
    by the per-doc span shuffle's doc bucket — the window text dies
    here (8-byte rows travel on)."""
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "p": pa.array([], pa.int64()),
            "db": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    g, run_start = _sorted_runs(group, "w")
    counts = np.diff(run_start)
    dup = pa.array(np.repeat(counts >= 2, counts))
    d = g.column("doc_id").filter(dup)
    dn = _combined(d).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": d,
            "p": g.column("p").filter(dup),
            "db": _i64(dn % doc_buckets),
        }
    )


def dupx_span_agg(group: pa.Table, L: int = DUP_L) -> pa.Table:
    """One doc bucket of flagged window positions → per-doc maximal
    duplicated CHAR spans — dup_span_agg's interval-union machinery
    with window width L and char-cover naming."""
    return dup_span_agg(group, g=L).rename_columns(
        ["doc_id", "dup_char_cover", "n_spans"]
    )


# ---------------------------------------------------------------------------
# connected components over candidate pairs

CC_MAX_ROUNDS = 32  # propagation bound; star/clique-shaped LSH clusters
# converge in 2-3 rounds, and label chasing halves path lengths, so 32
# covers components of diameter ~2^31 — effectively a safety assert


LOCAL_CC_EDGES = 2_000_000  # ≤ this many (symmetrized) edges → solve
# locally: 2M × 16 B = 32 MB on the driver, milliseconds of numpy,
# versus 3+ distributed join+groupby rounds at ~3 s fixed latency each


def _cc_local(t: pa.Table) -> pa.Table:
    """Driver-side min-label propagation over a small symmetrized edge
    table: one ``np.minimum.at`` scatter per round + label chasing —
    O(E) per round, O(log diameter) rounds. Same output contract as
    the distributed loop (cluster_id = component min doc_id)."""
    node = t.column("node").to_numpy(zero_copy_only=False)
    nbr = t.column("nbr").to_numpy(zero_copy_only=False)
    ids, inv_node = np.unique(node, return_inverse=True)
    inv_nbr = np.searchsorted(ids, nbr)  # symmetrized: same node set
    lab = np.arange(len(ids), dtype=np.int64)
    for _ in range(CC_MAX_ROUNDS):
        new = lab.copy()
        np.minimum.at(new, inv_node, lab[inv_nbr])
        new = np.minimum(new, new[new])  # path-halving chase
        if np.array_equal(new, lab):
            break
        lab = new
    else:
        raise RuntimeError("_cc_local: no fixpoint in CC_MAX_ROUNDS")
    # at the fixpoint labels are already constant-per-component at the
    # component-min root: both edge directions are present, so
    # lab[u] == lab[v] across every edge and lab[lab] == lab
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(ids[lab], pa.int64()),
        }
    )


def connected_components(pairs, num_partitions: int = 8,
                         local_threshold: int = LOCAL_CC_EDGES):
    """(doc_a, doc_b) candidate-pair Dataset → (doc_id, cluster_id)
    with cluster_id = the component's minimum doc_id.

    Iterative min-label propagation, Ray-Data-native: each round is
    one hash join (edge endpoint → its label) + one groupby(min).
    Every table in the loop is O(edges) — nothing lands on the driver
    but a per-round 1-row aggregate. Labels never increase, so
    ``sum(label)`` strictly decreases until the fixpoint; equality of
    consecutive sums IS convergence (no join-diff needed).
    Pre-groupby ``repartition(num_partitions)`` keeps shuffle
    partitions ≤ group count — empty aggregate partitions emit
    partial-schema bundles that break the next round's join. Rounds are
    materialized — they are near-dup-pair-sized, not corpus-sized, and
    an unmaterialized loop would re-execute the whole lineage each
    round. Label chasing (joining labels with themselves) is folded in
    by symmetrizing edges and including self-labels in the min, giving
    the usual O(log diameter) convergence of simple label propagation
    with path halving.
    """

    def sym(b: pa.Table) -> pa.Table:
        a = _combined(b.column("doc_a"))
        c = _combined(b.column("doc_b"))
        return pa.table(
            {
                "node": pa.concat_arrays([a, c]),
                "nbr": pa.concat_arrays([c, a]),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if 0 < n_edges <= local_threshold:
        # size-gated local↔distributed front door (the A6 pattern):
        # the edge table is already materialized and counted; below the
        # threshold the driver solves it in milliseconds of numpy
        # instead of 3+ join+groupby rounds at seconds of fixed latency
        import ray

        t = pa.concat_tables(
            [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        )  # filter schema-less empties (CLAUDE.md concat rule)
        return ray.data.from_arrow(_cc_local(t))
    if n_edges == 0:
        # the round-1 join on a fully-empty, schema-less Dataset raises
        # ArrowInvalid (the docstring's empty-partition hazard, extreme
        # case) — and an empty pair set means no clusters by definition
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )

    def init_label(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            # eff0 is clamped by EDGE rows, which can still exceed the
            # distinct-NODE group count on dup-heavy pair sets — an
            # empty aggregate partition emits a schema-less block
            # (CLAUDE.md hazard); re-type it so the loop joins survive
            return pa.table(
                {"node": pa.array([], pa.int64()), "lbl": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "node": b.column("node"),
                "lbl": pc.min_element_wise(b.column("node"), b.column("min(nbr)")),
            }
        )

    # reduce width ≤ edge rows here (all we know pre-aggregate)…
    eff0 = max(1, min(num_partitions, n_edges))
    agg = (
        edges.repartition(eff0)
        .groupby("node")
        .min("nbr")
        .map_batches(init_label, batch_format="pyarrow")
        .materialize()
    )
    # …and ≤ DISTINCT NODES for every loop round: with input-scaled
    # num_partitions (callers pass _jwidth) a dup-heavy pair set can
    # have far fewer node groups than partitions — the schema-less
    # empty-aggregate hazard the docstring warns about. The laundering
    # repartition below ALSO consolidates away any schema-less empties
    # eff0 > groups left behind (Ray passes zero-row blocks through
    # map_batches UNCALLED, so init_label's re-type cannot reach them;
    # a repartition rebuilds blocks under the surviving schema —
    # probe-verified).
    eff = max(1, min(num_partitions, agg.count()))
    labels = agg.repartition(eff).materialize()
    prev = labels.sum("lbl")
    for _ in range(CC_MAX_ROUNDS):
        lbl_of_nbr = labels.map_batches(
            lambda b: pa.table({"nbr": b.column("node"), "nbr_lbl": b.column("lbl")}),
            batch_format="pyarrow",
        )
        via_edges = edges.join(
            lbl_of_nbr, join_type="inner", num_partitions=eff, on=("nbr",)
        ).map_batches(
            lambda b: pa.table({"node": b.column("node"), "lbl": b.column("nbr_lbl")}),
            batch_format="pyarrow",
        )
        # label chasing: node's label adopts its label's label
        lbl_of_lbl = labels.map_batches(
            lambda b: pa.table({"lbl": b.column("node"), "lbl2": b.column("lbl")}),
            batch_format="pyarrow",
        )
        via_chase = labels.join(
            lbl_of_lbl, join_type="inner", num_partitions=eff, on=("lbl",)
        ).map_batches(
            lambda b: pa.table({"node": b.column("node"), "lbl": b.column("lbl2")}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(via_edges)
            .union(via_chase)
            .repartition(eff)
            .groupby("node")
            .min("lbl")
            .map_batches(
                lambda b: pa.table(
                    {"node": b.column("node"), "lbl": b.column("min(lbl)")}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur = labels.sum("lbl")
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("connected_components: no fixpoint in CC_MAX_ROUNDS")
    return labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("node"), "cluster_id": b.column("lbl")}
        ),
        batch_format="pyarrow",
    )


# --- link-graph centrality: host PageRank ---------------------------------

PR_SCALE = 10**12     # initial per-host mass, integer micro-units; sized
# so DAMP_NUM * pr * w stays far inside int64 for any corpus whose total
# mass n_hosts * PR_SCALE is < ~2^56 / max-edge-weight (asserted per
# kernel call below — numpy would overflow silently where DuckDB errors)
PR_DAMP_NUM = 85      # damping 0.85 as an exact integer ratio
PR_DAMP_DEN = 100
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN
PR_ITERS = 3          # fixed iteration count — the oracle chains one
# CTE per round, so the contract is "PR after exactly k rounds", not
# "PR at convergence" (float PR never hashes bit-for-bit anyway)
EDGE_BUCKETS = 256    # shuffle-key buckets for (src,dst) weight combine
LOCAL_PR_EDGES = 2_000_000  # ≤ this many WEIGHTED host→host edges →
# solve on the driver (the CC front-door pattern: 2M × ~40 B = 80 MB,
# milliseconds of numpy, vs 2 joins + 1 groupby per round distributed)


def _key_runs(group: pa.Table, key_col: str):
    """(sorted table, run-start indices) for equal-key runs sorted by
    ``key_col`` alone — the `_sorted_runs` skeleton without the doc_id
    tiebreak, for reduces that are order-independent (sums)."""
    order = pc.sort_indices(group, sort_keys=[(key_col, "ascending")])
    g = group.take(order)
    s = _combined(g.column(key_col))
    neq = pc.not_equal(s.slice(1), s.slice(0, len(s) - 1)).to_numpy(
        zero_copy_only=False
    )
    run_start = np.concatenate([[0], np.flatnonzero(neq) + 1, [group.num_rows]])
    return g, run_start


def _pr_flow(pr_src: np.ndarray, w: np.ndarray, outw_src: np.ndarray) -> np.ndarray:
    """Exact-integer PageRank flow along weighted edges:
    ``(DAMP_NUM * pr(u) * w(u,v)) // (DAMP_DEN * outw(u))``. All
    operands are positive, so numpy's floor division and DuckDB's
    ``//`` agree; the product bound is asserted because numpy wraps
    silently on int64 overflow where DuckDB raises."""
    if len(pr_src) and int(pr_src.max()) * int(w.max()) * PR_DAMP_NUM >= 2**63:
        raise OverflowError("pagerank: PR_SCALE too large for this corpus mass")
    return (PR_DAMP_NUM * pr_src * w) // (PR_DAMP_DEN * outw_src)


def _pr_auto_scale(n_hosts: int, w_max: int) -> int:
    """Safe per-host initial mass for a given corpus: even if every
    round concentrated ALL mass on one host, the flow product
    DAMP_NUM · pr · w stays inside int64. Worst-case pr ≤ total mass
    = n_hosts · scale, so scale ≤ 2^62 / (DAMP_NUM · n_hosts · w_max).
    Floored at 10^6 so ranks keep 6 integer digits of resolution."""
    cap = (2**62) // (PR_DAMP_NUM * max(1, n_hosts) * max(1, w_max))
    return max(10**6, min(PR_SCALE, cap))


def _pr_local(wedges: pa.Table, iters: int = PR_ITERS,
              scale: int = PR_SCALE) -> pa.Table:
    """Driver-side PageRank over a small weighted edge table
    (src, dst, w): dictionary-encode hosts once, then per round one
    vectorized flow pass + one ``np.add.at`` scatter. Same output
    contract as the distributed loop (host, pr after ``iters`` rounds,
    dangling-in hosts at PR_BASE)."""
    src = _combined(wedges.column("src")).cast(pa.string())
    dst = _combined(wedges.column("dst")).cast(pa.string())
    enc = pc.dictionary_encode(pa.concat_arrays([src, dst]))
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = enc.dictionary
    m = len(wedges)
    si, di = idx[:m], idx[m:]
    w = wedges.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    outw = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(outw, si, w)
    ow_safe = np.maximum(outw, 1)  # dangling hosts emit nothing anyway
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // PR_DAMP_DEN
    pr = np.full(len(hosts), scale, dtype=np.int64)
    for _ in range(iters):
        flow = _pr_flow(pr[si], w, ow_safe[si])
        acc = np.zeros(len(hosts), dtype=np.int64)
        np.add.at(acc, di, flow)
        pr = base + acc
    return pa.table({"host": hosts, "pr": pa.array(pr, pa.int64())})


def edge_weight_rows(batch: pa.Table, n_buckets: int = EDGE_BUCKETS) -> pa.Table:
    """Map-side partial of the raw-link → weighted-edge combine:
    per-batch ``group_by(src, dst).count`` keyed by the bounded
    (src,dst) hash bucket — the reduce is ONE shuffle over
    EDGE_BUCKETS groups, never a Ray group per edge (host×host edges
    are ~10^9 at web scale; the CLAUDE.md tiny-groups rule)."""
    t = pa.table({"src": batch.column("src"), "dst": batch.column("dst")})
    agg = (
        t.group_by(["src", "dst"])
        .aggregate([([], "count_all")])
        .rename_columns(["src", "dst", "w"])
    )
    key = pc.binary_join_element_wise(agg.column("src"), agg.column("dst"), "|")
    return agg.append_column("eb", _i64(hash_strings(key) % n_buckets))


def edge_weight_combine(group: pa.Table) -> pa.Table:
    """Reduce half of the weighted-edge combine: vectorized regroup of
    one hash bucket's (src, dst, w) partials via sorted-run sums."""
    if group.num_rows == 0:
        # empty groups reach group fns on some Ray versions; _key_runs'
        # slice(0, -1) + reduceat both raise on 0 rows
        return pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string()),
             "w": pa.array([], pa.int64())}
        )
    # regroup on BOTH key columns: a '|'-joined string is ambiguous —
    # ('a|b','c') and ('a','b|c') would merge into one edge (the joined
    # key is still fine for the BUCKET hash, which only co-locates)
    g, runs = _sorted_runs_2(group, "src", "dst")
    w = g.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    sums = np.add.reduceat(np.ascontiguousarray(w), runs[:-1])
    first = runs[:-1]
    return pa.table(
        {
            "src": _combined(g.column("src")).take(pa.array(first)),
            "dst": _combined(g.column("dst")).take(pa.array(first)),
            "w": _i64(sums),
        }
    )


def pagerank(links, iters: int = PR_ITERS, num_partitions: int = 8,
             local_threshold: int = LOCAL_PR_EDGES,
             scale="auto", edge_buckets: int | None = None):
    """Raw link Dataset (src, dst) → (host, pr) after ``iters``
    exact-integer PageRank rounds over the weighted host graph.

    Web-curation use: crawl frontier prioritization and host quality
    weighting (the classic link-centrality signal next to the CCNet /
    Gopher content signals above). Shapes:

    - raw links → weighted edges: map-side partial count + ONE bounded
      EDGE_BUCKETS shuffle (host×host edges never become Ray groups);
    - out-weights: map-side partial + ONE bounded HOST_BUCKETS shuffle;
    - each round: ONE hash join (edge src → its pr) + ONE bounded
      HOST_BUCKETS groupby of the flow sums; hosts with no in-edges
      are kept at PR_BASE via a zero-contribution host-list union —
      never a driver-side host set.
    - size-gated local↔distributed front door (the connected_components
      / A6 pattern): ≤ ``local_threshold`` weighted edges solves on
      the driver in numpy with the identical flow contract (pytest
      asserts equality of both paths).
    - ``scale`` sets the per-host initial mass. The default "auto"
      derives it from (host count, max edge weight) via _pr_auto_scale
      so even a fully-concentrated skewed corpus (the web-scale norm)
      stays inside int64; pass an int to pin it (the host_pagerank
      oracle pins PR_SCALE — the fixture is small enough). The flow
      kernel still raises OverflowError rather than silently wrapping
      if a pinned scale is too large.

    Reference analogue: engine-new surface (the reference has no link
    graph); the iterative join+groupby shape mirrors
    ``connected_components`` above."""
    import ray

    from functools import partial

    from .scaling import dynamic_buckets

    # edge_buckets: callers with a known raw-link count pass a scaled
    # value (dynamic_buckets); None keeps the tuned test-scale floor
    ebk = EDGE_BUCKETS if edge_buckets is None else int(edge_buckets)
    wedges = (
        links.map_batches(
            partial(edge_weight_rows, n_buckets=ebk), batch_format="pyarrow"
        )
        .repartition(num_partitions)  # partitions ≤ groups: empty
        # aggregate partitions emit SCHEMA-LESS blocks that break both
        # the front-door concat and the per-round join (the CC hazard)
        .groupby("eb")
        .map_groups(edge_weight_combine, batch_format="pyarrow")
        .materialize()
    )
    n_edges = wedges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table({"host": pa.array([], pa.string()),
                      "pr": pa.array([], pa.int64())})
        )
    if scale == "auto":
        # both stats are one tiny aggregate over the materialized
        # weighted-edge table (hosts bounded by 2 × edges)
        w_max = wedges.max("w")
        n_hosts_bound = 2 * n_edges
        scale = _pr_auto_scale(n_hosts_bound, int(w_max))
    base = (PR_DAMP_DEN - PR_DAMP_NUM) * scale // PR_DAMP_DEN
    # host-bucket count for the per-round reduces, scaled to the
    # host-count bound (2 × edges) so a round's group stays worker-sized
    hbk = dynamic_buckets(2 * n_edges, HOST_BUCKETS)
    if n_edges <= local_threshold:
        tabs = [t for t in ray.get(wedges.to_arrow_refs()) if t.num_rows]
        return ray.data.from_arrow(
            _pr_local(pa.concat_tables(tabs), iters, scale)
        )

    # distributed path hygiene: clamp partition counts to the actual
    # row counts and re-block every reduce output — aggregate outputs
    # with more partitions than groups carry SCHEMA-LESS empty blocks
    # that intermittently break the hash joins below (the CLAUDE.md
    # empty-partition hazard, observed as ArrowInvalid at 8 cpus)
    def squeeze(ds, p):
        ds = ds.materialize()
        return ds.repartition(max(1, min(p, ds.count()))).materialize()

    eff = max(1, min(num_partitions, n_edges))
    wedges = wedges.repartition(eff).materialize()

    def outw_rows(b: pa.Table) -> pa.Table:
        agg = (
            pa.table({"src": b.column("src"), "w": b.column("w")})
            .group_by("src").aggregate([("w", "sum")])
            .rename_columns(["src", "ow"])
        )
        return agg.append_column(
            "hb", _i64(hash_strings(agg.column("src")) % hbk)
        )

    def outw_combine(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"src": pa.array([], pa.string()), "ow": pa.array([], pa.int64())}
            )
        g, runs = _key_runs(group, "src")
        ow = g.column("ow").to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(np.ascontiguousarray(ow), runs[:-1])
        return pa.table(
            {
                "src": _combined(g.column("src")).take(pa.array(runs[:-1])),
                "ow": _i64(sums),
            }
        )

    outw = squeeze(
        wedges.map_batches(outw_rows, batch_format="pyarrow")
        .repartition(eff)
        .groupby("hb")
        .map_groups(outw_combine, batch_format="pyarrow"),
        eff,
    )
    edges_den = wedges.join(
        outw, join_type="inner", num_partitions=eff, on=("src",)
    ).materialize()

    def host_zero_rows(b: pa.Table) -> pa.Table:
        hosts = pc.unique(
            pa.concat_arrays(
                [
                    _combined(b.column("src")).cast(pa.string()),
                    _combined(b.column("dst")).cast(pa.string()),
                ]
            )
        )
        return pa.table(
            {
                "host": hosts,
                "c": pa.array(np.zeros(len(hosts), dtype=np.int64), pa.int64()),
                "hb": _i64(hash_strings(hosts) % hbk),
            }
        )

    def dedup_hosts(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"host": pa.array([], pa.string()), "c": pa.array([], pa.int64()),
                 "hb": pa.array([], pa.int64())}
            )
        # host_zero_rows dedups per BATCH only; the round-0 pr table
        # must be globally one-row-per-host or the per-round edge⋈pr
        # join replicates every edge per duplicate row
        g, runs = _key_runs(group, "host")
        first = pa.array(runs[:-1])
        return pa.table(
            {
                "host": _combined(g.column("host")).take(first),
                "c": _combined(g.column("c")).take(first),
                "hb": _combined(g.column("hb")).take(first),
            }
        )

    zeros = squeeze(
        wedges.map_batches(host_zero_rows, batch_format="pyarrow")
        .repartition(eff)
        .groupby("hb")
        .map_groups(dedup_hosts, batch_format="pyarrow"),
        eff,
    )

    def sum_to_pr(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table(
                {"host": pa.array([], pa.string()), "pr": pa.array([], pa.int64())}
            )
        g, runs = _key_runs(group, "host")
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        sums = np.add.reduceat(np.ascontiguousarray(c), runs[:-1])
        return pa.table(
            {
                "host": _combined(g.column("host")).take(pa.array(runs[:-1])),
                "pr": _i64(base + sums),
            }
        )

    # round 0: every host at the initial mass
    pr = zeros.map_batches(
        lambda b: pa.table({"src": b.column("host"),
                            "pr": pa.array(np.full(len(b), scale,
                                                   dtype=np.int64), pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(iters):
        def flow_rows(b: pa.Table) -> pa.Table:
            prs = b.column("pr").to_numpy(zero_copy_only=False).astype(np.int64)
            w = b.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
            ow = b.column("ow").to_numpy(zero_copy_only=False).astype(np.int64)
            dst = _combined(b.column("dst"))
            return pa.table(
                {
                    "host": dst,
                    "c": _i64(_pr_flow(prs, w, ow)),
                    "hb": _i64(hash_strings(dst) % hbk),
                }
            )

        contribs = edges_den.join(
            pr, join_type="inner", num_partitions=eff, on=("src",)
        ).map_batches(flow_rows, batch_format="pyarrow")
        pr = squeeze(
            contribs.union(zeros)
            .repartition(eff)
            .groupby("hb")
            .map_groups(sum_to_pr, batch_format="pyarrow")
            .map_batches(
                lambda b: pa.table({"src": b.column("host"), "pr": b.column("pr")}),
                batch_format="pyarrow",
            ),
            eff,
        )
    return pr.map_batches(
        lambda b: pa.table({"host": b.column("src"), "pr": b.column("pr")}),
        batch_format="pyarrow",
    )


# --- corpus-statistics LM scoring (CCNet/KenLM-filter shape) --------------

VOCAB_K = 256  # ranked vocabulary size; every out-of-vocab word scores
# VOCAB_K + 1. Real CCNet uses a KenLM 5-gram perplexity; the integer
# surprisal-rank proxy keeps the exact same two-phase dataflow (global
# corpus statistics → broadcast → per-doc score) with a bit-exact
# DuckDB oracle (floats never hash bit-for-bit)


def make_surprisal_fn(vocab_ref, k: int = VOCAB_K):
    """Phase-2 scorer factory: ``vocab_ref`` is a ``ray.put`` of
    (sorted 62-bit word hashes, aligned ranks) — the T7 broadcast
    pattern, fetched zero-copy from plasma per task, never re-shipped
    per batch. Per batch: flat word split → vectorized searchsorted
    rank lookup → per-doc int64 scatter-adds. Hash-equality stands in
    for string equality (62-bit: collision odds ~n·K/2^62, far below
    any test or production corpus size)."""

    def score(batch: pa.Table) -> pa.Table:
        import ray

        vh, vr = ray.get(vocab_ref)
        flat, par, _ = _split_words(batch)
        h = hash_strings62(flat)
        n = len(batch)
        if len(vh):
            idx = np.clip(np.searchsorted(vh, h), 0, len(vh) - 1)
            hit = vh[idx] == h
            rank = np.where(hit, vr[idx], np.int64(k + 1))
        else:
            hit = np.zeros(len(h), dtype=bool)
            rank = np.full(len(h), k + 1, dtype=np.int64)
        surp = np.zeros(n, dtype=np.int64)
        np.add.at(surp, par, rank)
        noov = np.bincount(par[~hit], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "surprisal": _i64(surp),
                "n_oov": _i64(noov),
            }
        )

    return score


# --- near-dup representative selection (keep-best policy) -----------------

CLUSTER_BUCKETS = 64  # shuffle-key buckets for per-cluster argmax —
# clusters are ~corpus-count tiny groups at web scale (the CLAUDE.md
# tiny-groups rule), so the reduce is ONE bounded shuffle


def cluster_keep_best(group: pa.Table) -> pa.Table:
    """One cluster bucket: per cluster keep the member with the highest
    ``score`` (ties → smallest doc_id), flag the rest dropped.
    Vectorized: one sort + run-start diff; emits (doc_id, dropped) for
    the downstream anti-join union."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "dropped": pa.array([], pa.int64())}
    )
    if group.num_rows == 0:
        return empty
    order = pc.sort_indices(
        group,
        sort_keys=[
            ("cluster_id", "ascending"),
            ("score", "descending"),
            ("doc_id", "ascending"),
        ],
    )
    g = group.take(order)
    c = g.column("cluster_id").to_numpy(zero_copy_only=False)
    dropped = np.ones(len(c), dtype=np.int64)
    run_start = np.concatenate([[0], np.flatnonzero(c[1:] != c[:-1]) + 1])
    dropped[run_start] = 0  # the per-cluster winner
    return pa.table({"doc_id": g.column("doc_id"), "dropped": _i64(dropped)})
