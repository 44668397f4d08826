"""Vectorized 64-bit polynomial hash family with exact DuckDB parity.

The round-1 engine hashed with per-row Python ``hashlib.md5`` (chosen
because DuckDB has ``md5()`` built in, so oracles hashed bit-for-bit).
That was the slowest stage on the bench — minhash alone cost as much as
the whole flagship join. This module replaces it with a batch-vectorized
polynomial (Horner) hash over the flat Arrow string buffer:

    H(s) = ((c_0+1)·A^(L-1) + (c_1+1)·A^(L-2) + ... + (c_{L-1}+1)) mod P
    H('') = 0

with A=131, P=2^31−1 (prime). The identical value is computable in
DuckDB SQL via ``list_reduce`` Horner over ``ord(substr(...))`` —
`sql_h31` emits that fragment — so every oracle still hashes
bit-for-bit. ASCII input is asserted (codepoint == byte); the synthetic
corpus is ASCII, and at 100 TB a byte-level variant drops the assert.

Salted family (for minhash signatures): g_k(s) = (a_k·H(s) + b_k) mod P
with fixed multipliers a_k derived from the Knuth constant — a classic
universal-hash family, vectorized as two numpy ops per salt.

A 62-bit digest for exact dedup combines two independent moduli:
``pair62(s) = H_{131,P31}(s)·2^31 + H_{137,P31B}(s)`` — collision space
2^62 (the single 31-bit hash would collide at 10^12 documents).

Everything here is pure numpy over the Arrow buffers — zero per-row
Python in the hot path. Reference analogue: the reference hashes with
Python ``hash()``/shapely WKB digests driver-side (`prclz/utils.py`);
this engine needs engine-grade vectorized hashing instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def arrow_i64(x: "np.ndarray") -> "pa.Array":
    """int64 Arrow array from any integer ndarray (no copy when the
    dtype already matches) — ONE home for the idiom (was triplicated
    across curation/packing/routing; drift risk)."""
    return pa.array(x.astype(np.int64, copy=False), pa.int64())


def arrow_combined(arr):
    """ChunkedArray → contiguous Array (no-op otherwise)."""
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr

P31 = 2_147_483_647   # 2^31 - 1, prime
P31B = 2_147_483_629  # 2^31 - 19, prime (second modulus for pair62)
A_CHAR = 131
A_CHAR2 = 137

_KNUTH = 2_654_435_761
N_SALTS = 8
SALT_A = tuple((_KNUTH * (2 * k + 1)) % P31 for k in range(N_SALTS))
SALT_B = tuple((_KNUTH * (k + 3) * 7919) % P31 for k in range(N_SALTS))

# growing power tables, keyed by (a, p)
_POW_CACHE: dict[tuple[int, int], np.ndarray] = {}

# cumsum of per-byte contributions stays < 2^31 · chunk bytes; keep the
# chunk under 2^31 bytes so the int64 cumsum cannot overflow
_MAX_CHUNK_BYTES = 1 << 30


def _powers(n: int, a: int, p: int) -> np.ndarray:
    """pw[k] = a^k mod p for k in [0, n]; cached and grown on demand."""
    key = (a, p)
    pw = _POW_CACHE.get(key)
    if pw is None or len(pw) <= n:
        m = max(n + 1, 1024)
        pw = np.empty(m, dtype=np.int64)
        pw[0] = 1
        for i in range(1, m):
            pw[i] = (pw[i - 1] * a) % p
        _POW_CACHE[key] = pw
    return pw


def _flat_view(arr, large_type) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 data, int64 offsets) zero-copy view of a string or
    binary Arrow array — the ONE place that knows the combine_chunks →
    large-type cast → offset-sliced buffer idiom."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(large_type)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, offsets


def _string_view(arr) -> tuple[np.ndarray, np.ndarray]:
    return _flat_view(arr, pa.large_string())


def _hash_segments(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, a: int, p: int
) -> np.ndarray:
    """Vectorized Horner hash of each [start, end) byte segment.

    Power-sum form of Horner: H = Σ (b_g+1)·a^(end-1-g) mod p, summed
    per segment with a cumsum-diff (empty-segment safe, unlike
    ``reduceat``). All intermediates bounded: contrib < p < 2^31, so an
    int64 cumsum is exact while the chunk holds < 2^31 bytes.
    """
    lo, hi = int(starts[0]) if len(starts) else 0, int(ends[-1]) if len(ends) else 0
    out = np.zeros(len(starts), dtype=np.int64)
    if hi - lo > _MAX_CHUNK_BYTES and len(starts) > 1:
        # split on segment boundaries, iteratively (a single over-large
        # segment falls through to the direct path — exact while the
        # string itself is < 2^32 bytes)
        i = 0
        while i < len(starts):
            j = int(np.searchsorted(ends, int(starts[i]) + _MAX_CHUNK_BYTES, side="right"))
            j = max(j, i + 1)
            out[i:j] = _hash_segments(data, starts[i:j], ends[i:j], a, p)
            i = j
        return out
    if hi == lo:
        return out
    b = data[lo:hi].astype(np.int64) + 1
    lens = ends - starts
    pw = _powers(int(lens.max()), a, p)
    e_per_byte = np.repeat(ends - 1, lens) - lo
    exp = e_per_byte - np.arange(hi - lo, dtype=np.int64)
    contrib = (b * pw[exp]) % p
    csum = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(contrib)])
    return ((csum[ends - lo] - csum[starts - lo]) % p).astype(np.int64)


def ensure_ascii(arr, who: str):
    """THE ASCII-only contract gate, shared by every kernel whose
    numpy side works on BYTES while its SQL oracle works on CODEPOINTS
    (identical only for ASCII — so non-ASCII raises instead of
    silently diverging). Returns the (data, offsets) flat view so
    callers don't re-slice. At 100 TB: switch the oracles to
    byte-level SQL and drop this one comparison pass — there is
    exactly one site to change."""
    data, offsets = _string_view(arr)
    lo, hi = (int(offsets[0]), int(offsets[-1])) if len(offsets) else (0, 0)
    if hi > lo and int(data[lo:hi].max()) > 127:
        raise ValueError(f"{who}: non-ASCII input breaks DuckDB oracle parity")
    return data, offsets


def hash_strings(arr, a: int = A_CHAR, p: int = P31) -> np.ndarray:
    """int64 polynomial hash per string (H('') = 0), fully vectorized;
    ASCII-only contract enforced via ensure_ascii."""
    data, offsets = ensure_ascii(arr, "hash_strings")
    return _hash_segments(data, offsets[:-1], offsets[1:], a, p)


def hash_strings62(arr) -> np.ndarray:
    """62-bit digest: H_{131,P31}·2^31 + H_{137,P31B} (exact-dedup key)."""
    h1 = hash_strings(arr, A_CHAR, P31)
    h2 = hash_strings(arr, A_CHAR2, P31B)
    return (h1 << 31) + h2


def salted(h: np.ndarray, k: int) -> np.ndarray:
    """g_k(h) = (a_k·h + b_k) mod P31, vectorized (int64-exact:
    a_k·h < 2^62)."""
    return (SALT_A[k] * h + SALT_B[k]) % P31


# ---------------------------------------------------------------------------
# DuckDB fragments computing the identical values

def sql_h31(expr: str, a: int = A_CHAR, p: int = P31) -> str:
    """SQL computing hash_strings(expr) for one string expression."""
    return (
        f"CASE WHEN {expr} = '' THEN 0 ELSE list_reduce("
        f"list_transform(range(1, strlen({expr}) + 1), "
        f"i -> CAST(ord(substr({expr}, CAST(i AS INT), 1)) + 1 AS BIGINT)), "
        f"(h, c) -> (h * {a} + c) % {p}) END"
    )


def sql_h62(expr: str) -> str:
    """SQL computing hash_strings62(expr)."""
    return (
        f"(({sql_h31(expr, A_CHAR, P31)}) * 2147483648 "
        f"+ ({sql_h31(expr, A_CHAR2, P31B)}))"
    )


def sql_salt_table() -> str:
    """VALUES table (salt, a, b) mirroring SALT_A/SALT_B, for use as
    ``... , ({sql_salt_table()}) AS salts`` with ``(a*h + b) % P31``."""
    rows = ", ".join(f"({k}, {SALT_A[k]}, {SALT_B[k]})" for k in range(N_SALTS))
    return f"SELECT * FROM (VALUES {rows}) AS _s(salt, a, b)"
