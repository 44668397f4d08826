"""Parquet read helper: metadata-clean Ray Data reads.

The driver-generated testdata parquet carries pandas schema metadata;
Ray's block-schema dedup cannot hash it and logs a per-task
``Failed to hash the schemas (for deduplication)`` warning on every
read task. Passing an explicit metadata-free ``schema=`` (one footer
read on the driver) removes the metadata from every downstream block —
zero data copies, warning-free logs, and the early-exit schema-dedup
path actually engages.
"""

from __future__ import annotations

import pyarrow as pa


def clean_schema(path: str, columns: list[str] | None = None) -> pa.Schema:
    """Metadata-free schema of a parquet file (optionally projected to
    ``columns``, in that order — matching read_parquet's projection)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):  # directory input: schema from any leaf file
        # walk nested layouts too (Hive-partitioned outputs keep their
        # leaves in subdirectories) and fail with the cause, not a bare
        # IndexError, when no leaf exists yet
        leaf = None
        for root, dirs, files in sorted(os.walk(path)):
            dirs.sort()
            pq_files = sorted(f for f in files if f.endswith(".parquet"))
            if pq_files:
                leaf = os.path.join(root, pq_files[0])
                break
        if leaf is None:
            raise FileNotFoundError(
                f"clean_schema: no .parquet leaf under directory {path!r}"
            )
        path = leaf
    sch = pq.read_schema(path)
    names = columns if columns is not None else sch.names
    return pa.schema([sch.field(n).remove_metadata() for n in names])


def read_parquet_clean(paths, columns: list[str] | None = None, **kw):
    """``ray.data.read_parquet`` with the pandas metadata stripped via
    an explicit schema (see module docstring). ``paths`` may be one
    path or a list of leaf files sharing one schema."""
    import ray.data

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    return ray.data.read_parquet(
        paths, columns=columns, schema=clean_schema(first, columns), **kw
    )
