"""Raster↔vector stage: zonal statistics over a tile-modeled raster.

The reference reads LandScan GeoTIFF windows per block and
area-weights cell values into zonal population
(`data_processing/process_worldpop.py:195-238` A5/G20; windowed reads
`:247-259` S11, handle reuse T6). The engine models the raster as a
deterministic tile table (tile pitch 0.25°, integer value per tile);
the windowed read becomes a broadcast lookup (the table is tiny
relative to the vector side — `ray.put` once, cached per worker), and
the zonal sum is exact integer: Σ value · overlap_area_µdeg².

Raster synth: value(tx, ty) = (tx*31 + ty*17) % 100 + 1 — recomputable
in SQL for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

TILE_E6 = 250_000  # 0.25° raster tile pitch in µdeg


def raster_value(tx, ty):
    return (tx * 31 + ty * 17) % 100 + 1


def zonal_sum_batch(batch: pa.Table) -> pa.Table:
    """Blocks → exact-integer zonal sums: for each block rectangle, sum
    value(tile) × overlap µdeg² over its ≤4 intersecting 0.25° tiles.
    Fully vectorized over (block, tile-corner) pairs."""
    xmin = batch.column("xmin_e6").to_numpy(zero_copy_only=False).astype(np.int64)
    ymin = batch.column("ymin_e6").to_numpy(zero_copy_only=False).astype(np.int64)
    xmax = batch.column("xmax_e6").to_numpy(zero_copy_only=False).astype(np.int64)
    ymax = batch.column("ymax_e6").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(xmin)

    tx0 = xmin // TILE_E6
    tx1 = (xmax - 1) // TILE_E6
    ty0 = ymin // TILE_E6
    ty1 = (ymax - 1) // TILE_E6
    # a 0.1° block intersects at most 2×2 of the 0.25° tiles
    zonal = np.zeros(n, dtype=np.int64)
    for dx in range(2):
        for dy in range(2):
            tx = tx0 + dx
            ty = ty0 + dy
            valid = (tx <= tx1) & (ty <= ty1)
            ox = np.minimum(xmax, (tx + 1) * TILE_E6) - np.maximum(xmin, tx * TILE_E6)
            oy = np.minimum(ymax, (ty + 1) * TILE_E6) - np.maximum(ymin, ty * TILE_E6)
            overlap = np.where(valid & (ox > 0) & (oy > 0), ox * oy, 0)
            zonal += raster_value(tx, ty) * overlap
    return pa.table(
        {
            "block_id": batch.column("block_id"),
            "zonal_weighted": pa.array(zonal),
        }
    )


def zonal_dataset():
    """blocks table → per-block zonal sums (lazy Dataset)."""
    import ray.data

    from ..pipelines import derive

    ds = ray.data.read_parquet(derive.blocks_path())
    return ds.map_batches(zonal_sum_batch, batch_format="pyarrow")
