"""Aggregation stages: raster-tile rollups, QC match counts with
zero-group backfill, and exact distributed quantiles.

Scale notes (SURVEY.md §2.5, §4):
  - every rollup pre-aggregates inside ``map_batches`` (partial
    combine) so the shuffle moves one row per (batch, key) instead of
    one per record — the Ray-native version of the reference's
    per-task groupbys (`process_worldpop.py:202-238`).
  - quantiles use a two-pass histogram selection (min/max + bucket
    counts, then an exact in-bucket select) instead of a full
    range-partition sort — the 100 TB-safe variant of
    `check_distance.py:62`'s sorted-array percentiles.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import world

TILE_E6 = 1_000_000  # 1° raster tiles


def add_tile_cols(batch: pa.Table) -> pa.Table:
    lat = batch.column("lat_e6").to_numpy(zero_copy_only=False)
    lon = batch.column("lon_e6").to_numpy(zero_copy_only=False)
    out = dict(zip(batch.column_names, batch.columns))
    out["tile_x"] = pa.array(lon // TILE_E6)
    out["tile_y"] = pa.array(lat // TILE_E6)
    return pa.table(out)


def partial_tile_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (tile_x, tile_y) → n_pages, sum_chars."""
    joined = batch.filter(pc.is_valid(batch.column("block_id")))
    if joined.num_rows == 0:
        return pa.table(
            {
                "tile_x": pa.array([], pa.int64()),
                "tile_y": pa.array([], pa.int64()),
                "n_pages": pa.array([], pa.int64()),
                "sum_chars": pa.array([], pa.int64()),
            }
        )
    g = joined.group_by(["tile_x", "tile_y"]).aggregate(
        [("doc_id", "count"), ("n_chars", "sum")]
    )
    return g.rename_columns(["tile_x", "tile_y", "n_pages", "sum_chars"])


def tile_rollup(joined_ds):
    """Full rollup: partial per-batch combine → small global groupby sum.

    Returns a Dataset of (tile_x, tile_y, n_pages, sum_chars,
    mean_chars); mean is one exact division of exact integer sums, so
    it hashes identically to the SQL oracle.
    """
    partial = joined_ds.map_batches(
        lambda b: partial_tile_agg(add_tile_cols(b)), batch_format="pyarrow"
    )
    final = partial.groupby(["tile_x", "tile_y"]).sum(["n_pages", "sum_chars"])
    final = final.map_batches(_finalize_tile, batch_format="pyarrow")
    return final


def _finalize_tile(batch: pa.Table) -> pa.Table:
    n = batch.column("sum(n_pages)")
    s = batch.column("sum(sum_chars)")
    return pa.table(
        {
            "tile_x": batch.column("tile_x"),
            "tile_y": batch.column("tile_y"),
            "n_pages": n,
            "sum_chars": s,
            "mean_chars": pc.divide(pc.cast(s, pa.float64()), pc.cast(n, pa.float64())),
        }
    )


# ---------------------------------------------------------------------------
# QC match counts (A3): per-gadm counts, zero groups backfilled, pages
# without geo in the NO_GADM_DISTRICT sentinel bucket
# (`data_processing/split_geojson.py:159-190` semantics)

def match_count_qc(joined_ds) -> pa.Table:
    """Returns the SMALL result table (one row per admin cell + sentinel)
    — the groupby shuffle is distributed, the zero-fill join runs on the
    101-row result driver-side."""
    def partial(batch: pa.Table) -> pa.Table:
        gadm = batch.column("gadm")
        key = pc.fill_null(gadm, world.SENTINEL_GADM)
        t = pa.table({"gadm_key": key})
        return t.group_by(["gadm_key"]).aggregate([([], "count_all")]).rename_columns(
            ["gadm_key", "n"]
        )

    partial_ds = joined_ds.map_batches(partial, batch_format="pyarrow")
    counts = partial_ds.groupby("gadm_key").sum("n").to_pandas()
    got: Dict[str, int] = dict(zip(counts["gadm_key"], counts["sum(n)"]))

    n_axis = world.N_GADM_AXIS  # one definition, shared with SQL_QC
    keys = [world.gadm_id_str(gx, gy) for gx in range(n_axis) for gy in range(n_axis)]
    keys.append(world.SENTINEL_GADM)
    return pa.table(
        {
            "gadm_key": keys,
            "n_pages": pa.array([int(got.get(k, 0)) for k in keys], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# exact distributed quantiles (discrete, DuckDB quantile_disc semantics:
# value at sorted index ceil(q*n) - 1)

def approx_quantiles_int(
    ds, col: str, qs: Sequence[float], sample_per_batch: int = 256
) -> List[int]:
    """Approximate quantiles in ONE pass: each batch contributes its
    systematic sample (``sample_per_batch`` evenly spaced order
    statistics, each weighted batch_size/sample), samples merge
    driver-side by weighted rank — the mergeable-sketch scale path for
    A6 (error ≤ ~1/sample_per_batch of rank). Deterministic."""

    def sample(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).copy()
        v.sort(kind="stable")
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], pa.int64()), "w": pa.array([], pa.float64())})
        k = min(sample_per_batch, n)
        idx = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
        return pa.table(
            {"v": pa.array(v[idx]), "w": pa.array(np.full(k, n / k, dtype=np.float64))}
        )

    merged = ds.select_columns([col]).map_batches(sample, batch_format="pyarrow").to_pandas()
    if len(merged) == 0:
        return [0 for _ in qs]
    merged = merged.sort_values("v")
    v = merged["v"].to_numpy()
    cum = np.cumsum(merged["w"].to_numpy())
    total = cum[-1]
    out = []
    for q in qs:
        target = q * total
        out.append(int(v[min(int(np.searchsorted(cum, target)), len(v) - 1)]))
    return out


EXACT_QUANTILE_LIMIT = 50_000_000  # rows: above this, the 8 B/row
# column materialization of the exact path stops being cheap relative
# to the one-pass sketch — approx becomes the default (A6 scale rule)


def quantiles_int(
    ds, col: str, qs: Sequence[float], n_rows_hint: int | None = None
) -> List[int]:
    """Front door for A6: EXACT histogram-select when the (caller-known)
    row count is under ``EXACT_QUANTILE_LIMIT``, the one-pass mergeable
    sketch beyond it — callers at test/oracle scale always get exact
    values, a 10^12-row pipeline never materializes the column."""
    if n_rows_hint is not None and n_rows_hint > EXACT_QUANTILE_LIMIT:
        return approx_quantiles_int(ds, col, qs)
    return exact_quantiles_int(ds, col, qs)


def exact_quantiles_int(ds, col: str, qs: Sequence[float], n_buckets: int = 4096) -> List[int]:
    """Exact discrete quantiles of an int64 column in two passes + one
    small filter, without a global sort.

    The upstream pipeline runs ONCE: the single int64 column is
    materialized first (8 B/row — bounded even at bench scale) and all
    passes (stats, histogram, in-bucket selects) reuse it."""
    import ray.data

    ds = ds.select_columns([col]).materialize()
    stats = ds.aggregate(
        ray.data.aggregate.Min(col), ray.data.aggregate.Max(col), ray.data.aggregate.Count(col)
    )
    lo, hi, n = stats[f"min({col})"], stats[f"max({col})"], stats[f"count({col})"]
    if n == 0:
        return [0 for _ in qs]
    if lo == hi:
        return [int(lo) for _ in qs]
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))

    def hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        b = (v - lo) // width
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": ub.astype(np.int64), "cnt": cnt.astype(np.int64)})

    hdf = ds.map_batches(hist, batch_format="pyarrow")
    hist_pd = hdf.groupby("bucket").sum("cnt").to_pandas().sort_values("bucket")
    buckets = hist_pd["bucket"].to_numpy()
    cnts = hist_pd["sum(cnt)"].to_numpy()
    cum = np.cumsum(cnts)

    # group quantiles by the histogram bucket they land in: ONE
    # filter+sort pass per DISTINCT bucket (p50/p95 sharing a bucket
    # previously re-scanned identical data)
    per_bucket: dict = {}
    for qi, q in enumerate(qs):
        target = math.ceil(q * n) - 1  # 0-based order statistic
        target = min(max(target, 0), n - 1)
        bi = int(np.searchsorted(cum, target + 1))
        per_bucket.setdefault(bi, []).append((qi, target))

    out: List[int] = [0] * len(qs)
    for bi, wants in per_bucket.items():
        b = int(buckets[bi])
        before = int(cum[bi - 1]) if bi > 0 else 0
        blo, bhi = lo + b * width, lo + (b + 1) * width - 1
        vals = ds.filter(
            expr=f"{col} >= {blo} and {col} <= {bhi}"
        ).to_pandas()[col].to_numpy()
        vals.sort(kind="stable")
        for qi, target in wants:
            out[qi] = int(vals[target - before])
    return out
