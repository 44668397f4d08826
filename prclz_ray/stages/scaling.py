"""Input-scaled bucket counts for bounded-bucket shuffles.

Every wide step in this engine shuffles on a BOUNDED key (``hash(x) %
n_buckets``) and regroups vectorized inside each bucket group — never a
Ray group per distinct key (the tiny-groups pathology, CLAUDE.md). A
FIXED bucket count has the opposite failure at scale: group size =
corpus / n_buckets, unbounded in corpus size, and at most n_buckets-way
reduce parallelism on a big cluster (VERDICT r3 §wrong.2 — a 64-bucket
group over 100 TB is ~1.5 TB and cannot fit a worker).

``dynamic_buckets`` keeps each family's tuned test-scale constant as
the FLOOR (small inputs behave exactly as before — measured shuffle
latency there is bucket-count-bound, not size-bound) and grows the
count linearly with the rows entering the shuffle once groups would
exceed ``rows_per_group``:

    n_buckets = clamp(floor, ceil(n_rows / rows_per_group), MAX_BUCKETS)

Row counts come from ``parquet_rows`` — a parquet FOOTER metadata walk
(no data I/O; the retry-safe counting idiom of ``state/manifest.py``)
— optionally multiplied by a stage's fan-out factor (lines per doc,
shingles per doc) by the caller. Bucket counts are pipeline-build-time
values: results are invariant to them (oracle-checked — the gate runs
at multiple CPU counts), only group sizes and reduce parallelism move.
"""

from __future__ import annotations

import os

TARGET_GROUP_ROWS = 1_000_000  # rows per shuffle group ≈ one worker's
                               # comfortable in-memory sort/regroup
                               # (~100 MB at the engine's ~100 B rows)
MAX_BUCKETS = 1 << 20          # backstop: beyond ~10^6 groups the
                               # scheduler, not group size, dominates


def dynamic_buckets(
    n_rows: int, floor: int, rows_per_group: int = TARGET_GROUP_ROWS
) -> int:
    """Bucket count for a bounded-bucket shuffle over ``n_rows`` rows:
    ``floor`` (the family's tuned test-scale constant) until groups
    would exceed ``rows_per_group``, then linear growth."""
    need = -(-int(n_rows) // int(rows_per_group))  # ceil
    return int(min(MAX_BUCKETS, max(int(floor), need)))


def reduce_width(
    n_rows: int, n_buckets: int, floor: int = 8,
    rows_per_task: int = TARGET_GROUP_ROWS,
) -> int:
    """Partition count for the ``repartition`` feeding a bounded-bucket
    ``groupby().map_groups()`` (or a hash join's ``num_partitions``).

    The round-4 ``dynamic_buckets`` work bounds GROUP size, but a fixed
    ``repartition(8)`` before the reduce still caps reduce parallelism
    at 8 and makes each reduce task materialize corpus/8 rows (VERDICT
    r4 §wrong.1 — the last 100 TB scale-killer). Same shape as
    ``dynamic_buckets``: the tuned test-scale ``floor`` until a
    partition would exceed ``rows_per_task`` rows, then linear growth —
    CAPPED at ``n_buckets``, because partitions > groups emit
    schema-less empty blocks (the CLAUDE.md hazard)."""
    need = -(-int(n_rows) // int(rows_per_task))  # ceil
    return int(max(1, min(int(n_buckets), max(int(floor), need))))


def parquet_rows(paths) -> int:
    """Total row count of parquet file(s)/dir(s) from footer metadata
    only — one small read per file on the driver, no column data."""
    import pyarrow.parquet as pq

    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    total = 0
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            for f in sorted(os.listdir(p)):
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
        else:
            total += pq.ParquetFile(p).metadata.num_rows
    return total
