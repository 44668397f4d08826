"""Skew handling: count pre-pass + explicit key salting.

The page corpus is heavily skewed — 80% of geocoded pages land in 4
urban clusters (world.URBAN_CENTERS), the same skew the reference
handled with per-country hand-tuned harnesses
(`midway/single_gadm_harness.sh:26`). For shuffles keyed by cell, a hot
cell would pin one reducer; the engine's answer (SURVEY.md §4.2):

1. cheap COUNT pre-pass per key (itself a partial-aggregated groupby —
   skew-immune because combiners run map-side);
2. keys whose count exceeds ``hot_threshold`` get ``n_salts`` salts;
   rows route to ``(key, salt)`` with salt = row-hash % n_salts;
3. the salted groupby's results merge in a second, tiny groupby on the
   bare key.

``salted_count_by_cell`` demonstrates the full mechanism end-to-end and
is oracle-checked (the salt is semantics-free: counts must equal the
unsalted ones exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def key_counts(ds, key: str):
    """Pre-pass: exact per-key counts via map-side partial aggregation
    (one tiny shuffle of (key, n) rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key)})
        return t.group_by(key).aggregate([([], "count_all")]).rename_columns([key, "n"])

    return ds.map_batches(partial, batch_format="pyarrow").groupby(key).sum("n")


def hot_keys(counts_df, key: str, hot_threshold: int) -> dict:
    """Keys needing salting → salt fan-out, proportional to excess."""
    out = {}
    # iterrows over the DRIVER-SIDE hot-key count table (rows = salted
    # keys only, bounded by distinct hot keys — never corpus rows)
    for _, row in counts_df.iterrows():
        n = int(row["sum(n)"])
        if n > hot_threshold:
            out[row[key]] = int(np.ceil(n / hot_threshold))
    return out


def make_salter(key: str, hot: dict, salt_col: str = "_salt"):
    """map_batches fn: attach salt column — 0 for cold keys, row-index
    % fanout for hot ones. Fully vectorized: sorted hot-key array +
    searchsorted lookup, broadcast once; no Python loop over rows."""
    hot_keys_arr = np.array(sorted(hot), dtype=np.int64)
    hot_fanout = np.array([hot[k] for k in sorted(hot)], dtype=np.int64)
    hot_ref = ray.put((hot_keys_arr, hot_fanout))

    def add_salt(batch: pa.Table) -> pa.Table:
        hk, hf = ray.get(hot_ref)
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        salts = np.zeros(len(keys), dtype=np.int64)
        if len(hk):
            pos = np.searchsorted(hk, keys)
            pos_c = np.clip(pos, 0, len(hk) - 1)
            is_hot = hk[pos_c] == keys
            idx = np.arange(len(keys), dtype=np.int64)
            salts[is_hot] = idx[is_hot] % hf[pos_c[is_hot]]
        out = dict(zip(batch.column_names, batch.columns))
        out[salt_col] = pa.array(salts)
        return pa.table(out)

    return add_salt


def salted_count_by_cell(sf_dir: str, hot_threshold: int = 2000):
    """Pages per res-5 cell with explicit hot-cell salting: pre-pass →
    salt → groupby (cell, salt) → merge groupby (cell). The output is
    identical to an unsalted count — the oracle proves it."""
    from ..queries import _pages

    ds = _pages(sf_dir)
    counts = key_counts(ds, "cell_r5").to_pandas()
    hot = hot_keys(counts, "cell_r5", hot_threshold)

    salted = _pages(sf_dir).map_batches(
        make_salter("cell_r5", hot), batch_format="pyarrow"
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"cell_r5": batch.column("cell_r5"), "_salt": batch.column("_salt")})
        return (
            t.group_by(["cell_r5", "_salt"])
            .aggregate([([], "count_all")])
            .rename_columns(["cell_r5", "_salt", "n"])
        )

    per_salt = (
        salted.map_batches(partial, batch_format="pyarrow")
        .groupby(["cell_r5", "_salt"])
        .sum("n")
    )
    merged = per_salt.map_batches(
        lambda b: pa.table({"cell_r5": b.column("cell_r5"), "n": b.column("sum(n)")}),
        batch_format="pyarrow",
    ).groupby("cell_r5").sum("n")
    return merged.map_batches(
        lambda b: pa.table({"cell_r5": b.column("cell_r5"), "n_pages": b.column("sum(n)")}),
        batch_format="pyarrow",
    )
