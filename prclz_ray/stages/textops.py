"""Text-analysis stages for the training-data pipeline: token counting,
quality scoring, language-ID, document fingerprinting.

Each is a vectorized ``map_batches`` transform over the ``documents``
corpus with an exact-integer output contract so the DuckDB oracles hash
bit-for-bit (`__ray_entry__.py::oracle_sql`).

Hash family: the vectorized polynomial family in ``stages/hashing.py``
(flat-Arrow-buffer Horner with exact DuckDB ``list_reduce`` parity);
only the whole-text identity column still uses md5 (one digest/row).

Reference analogues: line feature-typing / tag classification
(`reblock/i_topology_utils.py:282-307`), QC match-rate counts
(`data_processing/split_geojson.py:159-190`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish token pattern: letter runs, digit runs, single punctuation
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# tiny per-language stopword profiles (language-ID n-gram heuristic at
# word granularity; deterministic and SQL-expressible)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}
LANG_ORDER = tuple(sorted(LANG_PROFILES))  # deterministic tie-break
UND = "und"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")

FP_GRAM = 8  # character n-gram width for the winnow-lite fingerprint




def token_counts(batch: pa.Table) -> pa.Table:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    text = batch.column("text")
    ws = pc.list_value_length(pc.split_pattern(text, " "))
    n_bpe = pc.count_substring_regex(text, BPE_RE)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_ws_tokens": pc.cast(ws, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
        }
    )


def quality_score(batch: pa.Table) -> pa.Table:
    """Quality features, exact-integer: word count, mean word length
    ×100 (floor), stopword hits, and a bucketed score."""
    text = batch.column("text")
    words = pc.split_pattern(text, " ")
    n_words = pc.cast(pc.list_value_length(words), pa.int64())
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    # mean word length ×100 = floor(100 * (n_chars - (n_words-1)) / n_words)
    letters = pc.subtract(n_chars, pc.subtract(n_words, 1))
    mean_wlen_x100 = pc.cast(
        pc.divide(pc.multiply(letters, 100), n_words), pa.int64()
    )
    flat = pc.list_flatten(words)
    is_stop = pc.is_in(flat, value_set=pa.array(list(STOPWORDS)))
    # per-row stopword hits via parent indices
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    hits = np.bincount(
        par, weights=is_stop.to_numpy(zero_copy_only=False), minlength=len(batch)
    ).astype(np.int64)
    nw = n_words.to_numpy(zero_copy_only=False)
    bucket = np.where(nw < 20, 0, np.where(nw < 60, 1, 2)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": n_words,
            "mean_wlen_x100": mean_wlen_x100,
            "stopword_hits": pa.array(hits),
            "quality_bucket": pa.array(bucket),
        }
    )


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-profile language ID: argmax profile hits, ties by
    language code order, all-zero → 'und'."""
    words = pc.split_pattern(batch.column("text"), " ")
    flat = pc.list_flatten(words)
    par = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    n = len(batch)
    scores = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
    for j, code in enumerate(LANG_ORDER):
        hit = pc.is_in(flat, value_set=pa.array(list(LANG_PROFILES[code])))
        scores[:, j] = np.bincount(
            par, weights=hit.to_numpy(zero_copy_only=False), minlength=n
        )
    best = np.argmax(scores, axis=1)  # first max → alphabetical tie-break
    pred = np.asarray(LANG_ORDER, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = UND
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(pred.tolist(), pa.string()),
            "lang_meta": batch.column("lang"),
        }
    )


# character-trigram profiles (ASCII-only so byte == char; the n-gram
# language-ID heuristic proper, vs the word-level lang_id above)
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "ing", "and", "ion", "ent"),
    "es": ("que", "los", "ado", "nte", "era"),
    "de": ("der", "sch", "ein", "ich", "und"),
    "fr": ("les", "ent", "que", "des", "eur"),
}
TRI_ORDER = tuple(sorted(TRIGRAM_PROFILES))


def _tri_codes(grams: tuple[str, ...]) -> np.ndarray:
    return np.array(
        [(ord(g[0]) << 16) | (ord(g[1]) << 8) | ord(g[2]) for g in grams],
        dtype=np.int64,
    )


def lang_id_trigram(batch: pa.Table) -> pa.Table:
    """Char-trigram language ID, vectorized over one flat byte view:
    all texts concatenate into a single uint8 array; trigram codes come
    from three shifted views; per-language hits sum by doc via
    bincount. Argmax with alphabetical tie-break; all-zero → 'und'.
    Byte lengths and the flat byte array come straight from the Arrow
    string buffer (``_string_view``) — no ``to_pylist`` / re-encode."""
    from .hashing import _string_view, ensure_ascii

    n = len(batch)
    # numpy side reads BYTES; the SQL oracle counts substr() CODEPOINT
    # trigrams — the shared ASCII gate (hashing.py contract) is what
    # makes them equivalent, so non-ASCII must raise, not diverge
    ensure_ascii(batch.column("text"), "lang_id_trigram")
    data, off = _string_view(batch.column("text"))
    lens = (off[1:] - off[:-1]).astype(np.int64)
    lo, hi = (int(off[0]), int(off[-1])) if len(off) else (0, 0)
    flat = data[lo:hi].astype(np.int64)
    total = len(flat)
    scores = np.zeros((n, len(TRI_ORDER)), dtype=np.int64)
    if total >= 3:
        codes = (flat[:-2] << 16) | (flat[1:-1] << 8) | flat[2:]
        # doc index per trigram-start position; positions whose trigram
        # crosses a doc boundary are masked out
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)[: total - 2]
        ends = starts + lens
        pos = np.arange(total - 2, dtype=np.int64)
        valid = pos + 3 <= ends[doc_of]
        for j, code in enumerate(TRI_ORDER):
            hit = np.isin(codes, _tri_codes(TRIGRAM_PROFILES[code])) & valid
            scores[:, j] = np.bincount(doc_of[hit], minlength=n)
    best = np.argmax(scores, axis=1)
    pred = np.asarray(TRI_ORDER, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = UND
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred3": pa.array(pred.tolist(), pa.string()),
            "top_score": pa.array(scores.max(axis=1)),
        }
    )


# PII scrubbing patterns (RE2 syntax — identical semantics in pyarrow
# and DuckDB regexp_replace); the synthetic corpus is ASCII so the
# simple character classes are exact
PII_PATTERNS = (
    (r"[a-z0-9.]+@[a-z0-9.]+[.][a-z]+", "[EMAIL]"),
    (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "[PHONE]"),
)


def redact_pii(batch: pa.Table) -> pa.Table:
    """PII redaction (the curation scrub step): replace email / phone
    patterns with typed placeholders, fully vectorized
    (`pc.replace_substring_regex`), plus a per-doc redaction count so
    downstream filters can drop PII-heavy pages."""
    orig = batch.column("text")
    text = orig
    total = np.zeros(len(batch), dtype=np.int64)
    for pat, repl in PII_PATTERNS:
        # counts on the ORIGINAL text (oracle parity: the SQL counts
        # every pattern over `text`, not the progressively-redacted
        # string — overlapping email/phone matches must agree)
        total += pc.count_substring_regex(orig, pat).to_numpy(zero_copy_only=False)
        text = pc.replace_substring_regex(text, pat, repl)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "clean_text": text,
            "n_redactions": pa.array(total),
        }
    )


def fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprints: whole-text md5 + winnow-lite (min over
    character FP_GRAM-gram polynomial hashes — the rolling-hash
    fingerprint). The gram pass is vectorized over the flat Arrow byte
    buffer: FP_GRAM shifted adds produce every gram hash at once, then
    a per-document ``minimum.reduceat`` (only the whole-text md5 column
    remains per-row — one digest per document)."""
    from .hashing import A_CHAR, P31, _powers, ensure_ascii, hash_strings

    texts_col = batch.column("text")
    if texts_col.null_count:
        # NULL text is a contract violation here, not a fillable case:
        # the oracle's md5(text) yields NULL where a COALESCE'd Ray
        # side would hash '' — raise (the ensure_ascii convention)
        raise ValueError(
            "fingerprint: null text rows (md5 oracle would be NULL; "
            "fill or drop nulls upstream)"
        )
    texts = texts_col.to_pylist()
    full = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    n = len(batch)
    mins = np.zeros(n, dtype=np.int64)
    if n:
        # gram pass hashes bytes, oracle hashes codepoints → shared gate
        data, offsets = ensure_ascii(texts_col, "fingerprint")
        starts, ends = offsets[:-1], offsets[1:]
        lens = ends - starts
        lo, hi = int(starts[0]), int(ends[-1])
        g = FP_GRAM
        big = np.flatnonzero(lens >= g)
        if len(big) and hi - lo >= g:
            b = data[lo:hi].astype(np.int64) + 1
            pw = _powers(g, A_CHAR, P31)
            m = hi - lo - g + 1
            roll = np.zeros(m, dtype=np.int64)
            for j in range(g):
                roll += b[j : m + j] * pw[g - 1 - j]  # < 257·2^31·g, int64-safe
            roll %= P31
            # per-doc min over its gram window [start, end-g+1), via
            # interleaved reduceat (segments are non-contiguous in roll)
            seg_a = starts[big] - lo
            seg_b = ends[big] - lo - g + 1
            roll2 = np.concatenate([roll, np.array([np.iinfo(np.int64).max], np.int64)])
            idx = np.empty(2 * len(big), dtype=np.int64)
            idx[0::2], idx[1::2] = seg_a, seg_b
            red = np.minimum.reduceat(roll2, idx)[0::2]
            mins[big] = red
        small = np.flatnonzero(lens < g)
        if len(small):
            mins[small] = hash_strings(texts_col.take(pa.array(small)))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_md5": pa.array(full, pa.string()),
            "min_gram_h": pa.array(mins, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-pipeline pre-dedup step)

def canonicalize_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Canonical URL per row, fully vectorized:

    1. strip the fragment (``#...``),
    2. pad a bare host with ``/`` so every URL has a path slot,
    3. lowercase the scheme and host ONLY (split on ``/`` with
       max_splits=3 — the path/query keeps its case),
    4. drop a leading ``www.`` from the host,
    5. remove ``utm_*`` query parameters — boundary-anchored
       ``([?&])utm_[^&]*&?`` so path segments or params merely
       containing "utm_" are untouched; the replace chains 3× (RE2
       has no lookbehind, and one global pass consumes the boundary
       of an immediately-following utm param — 3 passes clear ≥ 7
       consecutive trackers),
    6. tidy dangling ``?``/``&``.

    All steps are RE2 regex / list-element kernels with an identical
    regexp_replace chain in the SQL oracle (both engines use RE2).
    Output: (input passthrough id column, url, canon_url).
    """
    from .hashing import arrow_combined

    u = arrow_combined(batch.column(url_col))
    u0 = pc.replace_substring_regex(u, r"#.*$", "")
    # canonicalization is defined for ABSOLUTE URLs; relative hrefs
    # pass through fragment-stripped — previously one relative row
    # crashed the whole batch at the parts[3] gather. ANCHORED gate:
    # a scheme must precede any '/?#' — an unanchored '://' contains()
    # would misroute '/redirect?to=http://x.com' into the absolute
    # parse (and diverge from the oracle's identical anchored gate)
    is_abs = pc.match_substring_regex(u0, r"^[^/?#]+://")
    # pathless query: insert '/' before '?' so the query never rides
    # the host slot ('http://h?x' → 'http://h/?x'; the pattern needs
    # '//' so relative rows are untouched)
    ua = pc.replace_substring_regex(u0, r"^([^/?#]*//[^/?#]*)\?", r"\1/?")
    # bare scheme://host (no third '/') → give it an empty path
    bare = pc.and_(is_abs, pc.less(pc.count_substring(ua, "/"), 3))
    ua = pc.if_else(bare, pc.binary_join_element_wise(ua, "/", ""), ua)
    # non-absolute rows get a dummy so the fixed-index gather is safe;
    # their canon comes from the passthrough branch below
    ua = pc.if_else(is_abs, ua, pa.scalar("x://x/x"))
    parts = pc.split_pattern(ua, "/", max_splits=3)
    scheme = pc.utf8_lower(pc.list_element(parts, 0))
    host = pc.utf8_lower(pc.list_element(parts, 2))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    rest = pc.list_element(parts, 3)
    for _ in range(3):
        rest = pc.replace_substring_regex(rest, r"([?&])utm_[^&]*&?", r"\1")
    rest = pc.replace_substring_regex(rest, r"[?&]+$", "")
    canon = pc.binary_join_element_wise(scheme, "//", host, "/", rest, "")
    canon = pc.if_else(is_abs, canon, u0)
    out = pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "url": batch.column(url_col),
            "canon_url": canon,
        }
    )
    return out
