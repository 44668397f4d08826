"""Raster↔vector stage: zonal statistics over a tile-table raster.

The reference reads LandScan GeoTIFF windows per block and
area-weights cell values into zonal population
(`data_processing/process_worldpop.py:195-238` A5/G20; windowed reads
`:247-259` S11, handle reuse T6). The engine models the raster as a
REAL parquet tile table (tile pitch 0.25°, integer value per tile,
`tiles_path()` — the S11 source): the windowed read becomes a
broadcast lookup — the table is read once, `ray.put` as a dense
(tx, ty) grid, and each worker materializes the handle once per
process (T6 handle reuse) — and the zonal sum is exact integer:
Σ value(tile) · overlap_area_µdeg² over the ≤4 tiles a block touches.

Raster synth: value(tx, ty) = (tx*31 + ty*17) % 100 + 1 — the tile
TABLE is generated from this formula (like every fixture source), and
the SQL oracle recomputes it; the join path reads only the table.

At 100 TB the tile table is Hive-partitioned by tile region and the
broadcast becomes per-partition: each shard task `ray.put`s only the
tiles overlapping its key range.
"""

from __future__ import annotations

from ..io import read_parquet_clean as _read_parquet_clean

import numpy as np
import pyarrow as pa

import ray

RASTER_TILE_E6 = 250_000  # 0.25° raster tile pitch in µdeg —
# named distinctly from rollup.TILE_E6 (the 1° rollup grid): two
# different pitches must never be one wrong-import apart


def raster_value(tx, ty):
    """The synth formula — used to GENERATE the tile table and by the
    SQL oracle; the engine's zonal path reads the table instead."""
    return (tx * 31 + ty * 17) % 100 + 1


def tiles_table() -> pa.Table:
    """The raster as a materialized tile table (S11 source)."""
    from .. import world

    n = world.N_GADM_AXIS * world.GADM_E6 // RASTER_TILE_E6  # tiles per axis
    tx, ty = np.meshgrid(np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64), indexing="ij")
    tx, ty = tx.ravel(), ty.ravel()
    return pa.table(
        {
            "tx": pa.array(tx),
            "ty": pa.array(ty),
            "value": pa.array(raster_value(tx, ty).astype(np.int64)),
        }
    )


def tiles_path() -> str:
    from ..pipelines.derive import _cached

    return _cached("raster_tiles", tiles_table)


def load_tiles_grid() -> "ray.ObjectRef":
    """Read the tile table and broadcast it as a dense value grid
    (one `ray.put` per session — the T6 raster-handle reuse)."""
    import pyarrow.parquet as pq

    t = pq.read_table(tiles_path())
    tx = t.column("tx").to_numpy(zero_copy_only=False)
    ty = t.column("ty").to_numpy(zero_copy_only=False)
    val = t.column("value").to_numpy(zero_copy_only=False)
    n = int(max(tx.max(), ty.max())) + 1
    grid = np.zeros((n, n), dtype=np.int64)
    grid[tx, ty] = val
    return ray.put(grid)


def make_zonal_fn(tiles_ref):
    """Zonal stage bound to the broadcast tile grid: for each block
    rectangle, sum value(tile) × overlap µdeg² over its ≤4
    intersecting 0.25° tiles. Fully vectorized; the grid handle is
    fetched zero-copy once per task from the local object store."""

    def zonal(batch: pa.Table) -> pa.Table:
        grid = ray.get(tiles_ref)
        nmax = grid.shape[0] - 1
        xmin = batch.column("xmin_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        ymin = batch.column("ymin_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        xmax = batch.column("xmax_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        ymax = batch.column("ymax_e6").to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(xmin)

        tx0 = xmin // RASTER_TILE_E6
        tx1 = (xmax - 1) // RASTER_TILE_E6
        ty0 = ymin // RASTER_TILE_E6
        ty1 = (ymax - 1) // RASTER_TILE_E6
        # a 0.1° block intersects at most 2×2 of the 0.25° tiles
        zonal_acc = np.zeros(n, dtype=np.int64)
        for dx in range(2):
            for dy in range(2):
                tx = tx0 + dx
                ty = ty0 + dy
                valid = (tx <= tx1) & (ty <= ty1)
                ox = np.minimum(xmax, (tx + 1) * RASTER_TILE_E6) - np.maximum(xmin, tx * RASTER_TILE_E6)
                oy = np.minimum(ymax, (ty + 1) * RASTER_TILE_E6) - np.maximum(ymin, ty * RASTER_TILE_E6)
                # tiles OUTSIDE the grid contribute nothing — the clip
                # is only gather-safety; without the bounds mask an
                # out-of-extent block would silently count the EDGE
                # tile's value for its missing tiles
                in_grid = (tx >= 0) & (tx <= nmax) & (ty >= 0) & (ty <= nmax)
                overlap = np.where(valid & in_grid & (ox > 0) & (oy > 0), ox * oy, 0)
                vals = grid[np.clip(tx, 0, nmax), np.clip(ty, 0, nmax)]
                zonal_acc += vals * overlap
        return pa.table(
            {
                "block_id": batch.column("block_id"),
                "zonal_weighted": pa.array(zonal_acc),
            }
        )

    return zonal


def zonal_dataset():
    """blocks table ⋈ raster tile table → per-block zonal sums (lazy)."""
    import ray.data

    from ..pipelines import derive
    from ..queries import _epoch_cached

    tiles_ref = _epoch_cached("raster_tiles_grid", load_tiles_grid)
    ds = _read_parquet_clean(derive.blocks_path())
    return ds.map_batches(make_zonal_fn(tiles_ref), batch_format="pyarrow")
