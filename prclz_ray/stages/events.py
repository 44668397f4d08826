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
    """One user's events → session rows (gap > 30 min starts a new
    session). Exact-integer output (µs epochs)."""
    ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.argsort(ts, kind="stable")
    ts = ts[order]
    new_session = np.concatenate([[True], np.diff(ts) > SESSION_GAP_US])
    sess = np.cumsum(new_session) - 1  # 0-based session index per event
    n_sessions = int(sess[-1]) + 1 if len(sess) else 0
    starts = ts[new_session]
    ends = np.maximum.reduceat(ts, np.flatnonzero(new_session))
    counts = np.bincount(sess, minlength=n_sessions)
    uid = group.column("user_id")[0].as_py()
    return pa.table(
        {
            "user_id": pa.array([uid] * n_sessions, pa.int64()),
            "session_idx": pa.array(np.arange(n_sessions)),
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
    types = batch.column("event_type").to_pylist()
    k = SLIDE_WIDTH_US // SLIDE_STEP_US
    base = (ts // SLIDE_STEP_US) * SLIDE_STEP_US
    starts = base[:, None] - np.arange(k)[None, :] * SLIDE_STEP_US  # (n, 4)
    t = pa.table(
        {
            "event_type": pa.array(np.repeat(types, k)),
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
    vectorized regex (per-record parser, M2 analogue)."""
    m = pc.extract_regex(batch.column("props"), r'"k":\s*(?P<k>-?[0-9]+)')
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
