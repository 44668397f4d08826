"""Event-stream operators: sessionization, JSON props extraction.

The reference is strictly batch (SURVEY.md §2.9) — these are the
engine's windowed-aggregate custom operators for the events table,
expressed as groupby + sorted map_groups (the documented composition
for windows Ray Data lacks natively).

Partitioning assumption (documented per SURVEY.md custom-operator
rule): sessionization shuffles once on ``user_id``; a user's whole
history must fit one group. At 100 TB that holds for human-scale users;
pathological keys would need time-range pre-chunking.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def sessionize_group(group: pa.Table) -> pa.Table:
    """One user-BUCKET's events → session rows (gap > 30 min starts a
    new session). Users are regrouped vectorized inside the bucket
    (lexsort on (user_id, ts) + run boundaries) — one Ray group per
    bucket, never per user (the tiny-groups rule; a per-user groupby
    is billions of groups at web scale). Exact-integer output (µs
    epochs)."""
    if group.num_rows == 0:
        # empty shuffle partitions can reach a map_groups fn — the
        # [True]-seeded new_session mask would IndexError on 0 rows
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_us": pa.array([], pa.int64()),
                "end_us": pa.array([], pa.int64()),
                "duration_us": pa.array([], pa.int64()),
            }
        )
    uid = group.column("user_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
    ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((ts, uid))
    uid, ts = uid[order], ts[order]
    new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
    new_session = new_user | np.concatenate(
        [[True], np.diff(ts) > SESSION_GAP_US]
    )
    sess = np.cumsum(new_session) - 1  # 0-based GLOBAL session run id
    # per-user session index = global run id − the user's first run id
    user_run = np.cumsum(new_user) - 1
    first_sess_of_user = sess[new_user]
    sess_idx = (sess - first_sess_of_user[user_run])[new_session]
    starts = ts[new_session]
    # ts ascends within each session run, so reduceat-max = run last
    ends = np.maximum.reduceat(ts, np.flatnonzero(new_session))
    counts = np.bincount(sess)
    return pa.table(
        {
            "user_id": pa.array(uid[new_session], pa.int64()),
            "session_idx": pa.array(sess_idx.astype(np.int64)),
            "n_events": pa.array(counts.astype(np.int64)),
            "start_us": pa.array(starts),
            "end_us": pa.array(ends),
            "duration_us": pa.array(ends - starts),
        }
    )


SLIDE_STEP_US = 15 * 60 * 1_000_000   # 15-min step
SLIDE_WIDTH_US = 60 * 60 * 1_000_000  # 1-hour window


def sliding_window_counts(batch: pa.Table) -> pa.Table:
    """Sliding 1 h windows stepped 15 min, per event_type: each event
    belongs to exactly width/step = 4 windows, so the batch explodes
    ×4 into (type, window_start) rows pre-aggregated map-side — an
    order-independent formulation (no sort, late data lands in the
    right windows by construction). Empty windows are not emitted."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "window_us": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
    ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    k = SLIDE_WIDTH_US // SLIDE_STEP_US
    base = (ts // SLIDE_STEP_US) * SLIDE_STEP_US
    starts = base[:, None] - np.arange(k)[None, :] * SLIDE_STEP_US  # (n, 4)
    # ×k type column via Arrow take (dictionary-friendly, no Python list)
    rep = np.repeat(np.arange(len(ts), dtype=np.int64), k)
    t = pa.table(
        {
            "event_type": batch.column("event_type").take(pa.array(rep)),
            "window_us": pa.array(starts.ravel()),
        }
    )
    return (
        t.group_by(["event_type", "window_us"])
        .aggregate([([], "count_all")])
        .rename_columns(["event_type", "window_us", "n"])
    )


def extract_props_k(batch: pa.Table) -> pa.Table:
    """Parse the integer ``k`` out of the JSON ``props`` column —
    vectorized regex (per-record parser, M2 analogue).

    FLAT-PROPS CONTRACT (enforced, not assumed): the regex is only
    equivalent to the oracle's ``json_extract_string(props, '$.k')``
    on single-level objects with integer values. Nested objects (the
    regex would match an inner ``\"k\"`` the JSON path ignores) and
    non-integer ``k`` (regex truncates, SQL CAST errors) RAISE here
    instead of silently diverging — the ensure_ascii convention."""
    props = batch.column("props")
    # nesting is detected STRUCTURALLY: strip every quoted string
    # literal (escape-aware) first, so a flat object whose VALUE
    # contains a brace ({"k": 1, "msg": "use {}"}) is not
    # misclassified — only braces outside strings mark an inner object
    stripped = pc.replace_substring_regex(
        pc.fill_null(props, ""), r'"(?:[^"\\]|\\.)*"', ""
    )
    nested = pc.greater(pc.count_substring(stripped, "{"), 1)
    if pc.any(nested).as_py():
        raise ValueError(
            "extract_props_k: nested props object (flat contract; the "
            "regex parser and the JSON-path oracle would diverge)"
        )
    frac = pc.match_substring_regex(props, r'"k":\s*-?[0-9]+\.')
    if pc.any(frac).as_py():
        raise ValueError(
            "extract_props_k: non-integer k (regex would truncate "
            "where the oracle's CAST errors)"
        )
    # exponent (2e5: regex reads the mantissa) and quoted numerics
    # ("5": regex reads NULL) also diverge from the JSON-path oracle
    odd = pc.match_substring_regex(props, r'"k":\s*(?:-?[0-9]+[eE]|")')
    if pc.any(odd).as_py():
        raise ValueError(
            "extract_props_k: exponent or quoted k (regex and the "
            "JSON-path oracle would diverge)"
        )
    # a top-level ARRAY passes the one-brace nesting guard but the
    # '$.k' path reads NULL where the regex would match inside it
    nonobj = pc.invert(
        pc.match_substring_regex(pc.fill_null(props, "{}"), r"^\s*\{")
    )
    if pc.any(nonobj).as_py():
        raise ValueError(
            "extract_props_k: props must be a JSON object (flat contract)"
        )
    m = pc.extract_regex(props, r'"k":\s*(?P<k>-?[0-9]+)')
    k = pc.cast(pc.struct_field(m, "k"), pa.int64())
    # k stays NULL when props has no integer k — aggregates skip nulls,
    # matching SQL SUM semantics (oracle parity)
    return pa.table(
        {
            "event_id": batch.column("event_id"),
            "event_type": batch.column("event_type"),
            "k": k,
        }
    )


ASOF_BUCKETS = 64  # bounded shuffle key for the as-of join (user_id % N
# — the tiny-groups rule: one group per bucket, users regrouped
# vectorized inside the group fn, never one Ray group per user)


def add_user_bucket(batch: pa.Table, n_buckets: int = ASOF_BUCKETS) -> pa.Table:
    """Append ``ub = user_id % n_buckets`` — the as-of join's shuffle key."""
    u = batch.column("user_id").to_numpy(zero_copy_only=False)
    return batch.append_column("ub", pa.array(u % n_buckets, pa.int64()))


def asof_join_group(
    group: pa.Table, left_type: str = "purchase", right_type: str = "click"
) -> pa.Table:
    """One user-bucket → AS-OF join rows: each ``left_type`` event
    matched to the latest ``right_type`` event of the SAME user with
    ts ≤ its ts (DuckDB ``ASOF JOIN ... ON l.user_id = r.user_id AND
    l.ts >= r.ts`` semantics; lefts with no prior right are dropped —
    inner as-of). Vectorized across every user in the bucket: one
    lexsort on (user, ts, is_left) placing equal-ts rights BEFORE their
    lefts (ts ≥ includes equality), then a running maximum.accumulate
    of last-right-index, invalidated across user boundaries.

    Output is tie-safe: equal-ts rights differ only in event_id and the
    emitted columns (right ts, gap) are identical whichever is kept.
    """
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "right_ts_us": pa.array([], pa.int64()),
            "gap_us": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    typ = group.column("event_type")
    keep = pc.is_in(typ, value_set=pa.array([left_type, right_type]))
    g = group.filter(keep)
    if g.num_rows == 0:
        return empty
    u = g.column("user_id").to_numpy(zero_copy_only=False)
    ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = g.column("event_id").to_numpy(zero_copy_only=False)
    is_left = pc.equal(g.column("event_type"), left_type).to_numpy(zero_copy_only=False)
    order = np.lexsort((is_left, ts, u))  # rights sort before equal-ts lefts
    u, ts, eid, is_left = u[order], ts[order], eid[order], is_left[order]
    idx = np.arange(len(u), dtype=np.int64)
    last_right = np.maximum.accumulate(np.where(~is_left, idx, -1))
    ok = is_left & (last_right >= 0)
    ok[ok] &= u[last_right[ok]] == u[ok]  # right must be the same user's
    lr = last_right[ok]
    return pa.table(
        {
            "event_id": pa.array(eid[ok], pa.int64()),
            "user_id": pa.array(u[ok], pa.int64()),
            "right_ts_us": pa.array(ts[lr], pa.int64()),
            "gap_us": pa.array(ts[ok] - ts[lr], pa.int64()),
        }
    )


RANGE_WIN_US = 3_600_000_000  # 1 h lookback window for the range join


def range_join_group(
    group: pa.Table, left_type: str = "purchase", right_type: str = "click",
    window_us: int = RANGE_WIN_US,
) -> pa.Table:
    """One user-bucket → RANGE (interval) join counts: per ``left_type``
    event, the number of same-user ``right_type`` events with
    ts ∈ [left_ts − window, left_ts). Vectorized across every user in
    the bucket: rights sorted once by a packed (user, ts) int64 key,
    then TWO searchsorted calls give each left's window bounds — no
    per-user loop. Lefts with zero rights are kept (count 0), matching
    the LEFT-join + COUNT oracle."""
    empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "n_right": pa.array([], pa.int64()),
        }
    )
    if group.num_rows == 0:
        return empty
    typ = group.column("event_type")
    u = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    is_l = pc.equal(typ, left_type).to_numpy(zero_copy_only=False)
    is_r = pc.equal(typ, right_type).to_numpy(zero_copy_only=False)
    if not is_l.any():
        return empty
    tmin = int(ts.min())
    span = int(ts.max()) - tmin + 3  # offsets live in [1, span-1]
    # guard in PYTHON ints — a numpy int64 product would wrap before
    # the comparison could catch it
    if int(u.max()) * span >= (1 << 62):
        raise ValueError("range_join_group: user_id × ts-span exceeds int64 packing")
    ru, rts = u[is_r], ts[is_r]
    rkey = np.sort(ru * span + (rts - tmin + 1))
    lu, lts, lid = u[is_l], ts[is_l], eid[is_l]
    lo_off = np.maximum(lts - window_us, tmin - 1) - tmin + 1  # clamp ≥ 0
    lo = np.searchsorted(rkey, lu * span + lo_off, side="left")
    hi = np.searchsorted(rkey, lu * span + (lts - tmin + 1), side="left")
    return pa.table(
        {
            "event_id": pa.array(lid, pa.int64()),
            "user_id": pa.array(lu, pa.int64()),
            "n_right": pa.array(hi - lo, pa.int64()),
        }
    )


# --- watermark late-event detection (running-max prefix scan) -------------

WATERMARK_US = 5 * 60 * 1_000_000  # 5-min allowed lateness
LATE_BUCKETS = 256  # arrival-order range buckets for the max-scan


def late_bucket_rows(batch: pa.Table, n_buckets: int = LATE_BUCKETS) -> pa.Table:
    """Attach the synthetic arrival order and its range bucket. The
    corpus ts column is SORTED by event_id (a perfectly ordered
    stream has zero late events — vacuous), so arrival is
    deterministically scrambled: ``ak = (event_id·2654435761) mod 2³¹``
    — identical arithmetic in the oracle; a real stream would use the
    ingestion sequence number. ``lb = ak >> 23`` gives LATE_BUCKETS
    contiguous arrival ranges."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("late_bucket_rows: n_buckets must be a power of two")
    shift = 31 - (n_buckets.bit_length() - 1)
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    # int64 parity guard (the range_join_group / _pr_flow convention):
    # past ~3.47e9 numpy wraps silently where the DuckDB oracle errors,
    # and SQL % of a NEGATIVE id is negative where numpy's is not —
    # fail loudly outside the safe window instead of silently diverging
    if len(eid) and (int(eid.min()) < 0 or int(eid.max()) > (2**63 - 1) // 2654435761):
        raise ValueError(
            "late_bucket_rows: event_id outside the int64-safe window "
            "for the arrival-scramble multiply (oracle parity)"
        )
    ak = (eid * 2654435761) % 2**31
    return batch.append_column(
        "ak", pa.array(ak.astype(np.int64), pa.int64())
    ).append_column("lb", pa.array((ak >> shift).astype(np.int64), pa.int64()))


def bucket_max_ts(
    rows, n_buckets: int = LATE_BUCKETS, width: int = 8
) -> np.ndarray:
    """Exclusive running max of per-bucket ts maxima — the scan-shape
    reduce of `packing.bucket_bases` with the MAX monoid instead of
    SUM: one bounded groupby, ≤ n_buckets rows on the driver (the
    count is input-scaled — LATE_BUCKETS is only the floor).
    prior[b] = max ts of all buckets < b (INT64_MIN for bucket 0).

    ``width`` sizes the repartition feeding the reduce — pass the same
    input-scaled ``reduce_width`` value as the caller's own reduce (the
    partial stream is ≤ input-blocks × n_buckets tiny rows, so the
    corpus-row width is a safe over-estimate, capped at n_buckets)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "lb": batch.column("lb"),
                "m": batch.column("ts").cast(pa.int64()),
            }
        )
        return (
            t.group_by("lb").aggregate([("m", "max")]).rename_columns(["lb", "m"])
        )

    totals = (
        rows.map_batches(partial, batch_format="pyarrow")
        .repartition(max(1, min(int(width), int(n_buckets))))
        .groupby("lb")
        .max("m")
        .to_pandas()
    )
    maxes = np.full(n_buckets, np.iinfo(np.int64).min, dtype=np.int64)
    maxes[totals["lb"].to_numpy()] = totals["max(m)"].to_numpy()
    run = np.maximum.accumulate(maxes)
    return np.concatenate([[np.iinfo(np.int64).min], run[:-1]])


def make_late_finish(prior, watermark_us: int = WATERMARK_US):
    """One arrival bucket: sort by event_id, seed the running ts max
    with the prior buckets' max, flag events older than watermark
    behind the high-water mark. Emits ONLY the late rows.

    ``prior`` may be the bases array or a ``ray.ObjectRef`` to it —
    pass the ref: the array is n_buckets int64s and the bucket count
    is INPUT-SCALED, so closure-pickling it would re-ship it with
    every task instead of once per node (the bucket_bases broadcast
    pattern in stages/packing.py)."""
    cache: dict = {}

    def _prior() -> np.ndarray:
        if "p" not in cache:
            import ray

            cache["p"] = (
                ray.get(prior) if isinstance(prior, ray.ObjectRef) else prior
            )
        return cache["p"]

    def finish(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "wm_us": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        g = group.sort_by([("ak", "ascending"), ("event_id", "ascending")])
        t = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = int(g.column("lb")[0].as_py())
        wm = np.maximum(np.maximum.accumulate(t), _prior()[b])
        late = (wm - t) > watermark_us
        if not late.any():
            return empty
        sel = pa.array(late)
        return pa.table(
            {
                "event_id": g.column("event_id").filter(sel),
                "ts": g.column("ts").filter(sel),
                "wm_us": pa.array(wm[late], pa.int64()),
            }
        )

    return finish
