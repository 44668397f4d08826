"""Generate the DuckDB golden tables for the geometry-family queries.

The five geometry pipelines (reblock, reblock_interior,
block_complexity, complexity_hist, parcels_ladder) compute over the
DETERMINISTIC street/parcel fixtures — their outputs are independent
of sf_dir — but their semantics are not SQL-expressible, so they were
rows-only in the driver gate. This script freezes each output as a
parquet golden under ``goldens/`` (checked into the repo); the oracle
for each query is then ``SELECT * FROM read_parquet('<golden>')`` and
the driver gets full rows+schema+hash rows.

What pins the SEMANTICS is the pytest golden suite (ported from the
reference fixtures: `prclz/test_topology.py:112-161`,
`smoketests/smoketest_graph.py:20-41`, `midway/midway_complexity.py:57-60`);
what the parquet goldens add is bit-level regression detection through
the driver's hash gate. Regenerate ONLY after an intentional kernel
change whose pytest goldens were re-derived first:

    python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_QUERIES = [
    "reblock",
    "reblock_interior",
    "block_complexity",
    "complexity_hist",
    "parcels_ladder",
]

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens"
)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    qs = e.queries()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in GOLDEN_QUERIES:
        res = qs[name]("/root/testdata/sf0.001")
        # stay in Arrow end-to-end: a pandas round-trip coerces dtypes
        # (int64-with-nulls -> float64) and would bake a drifted golden
        # schema that permanently fails the hash gate. The row sort is
        # cosmetic only (selfcheck's value_hash canonicalizes order).
        if isinstance(res, pa.Table):
            t = res
        elif hasattr(res, "to_arrow_refs"):  # ray.data.Dataset
            parts = [x for x in ray.get(res.to_arrow_refs()) if x.num_rows]
            t = pa.concat_tables(parts)
        else:  # pandas.DataFrame
            t = pa.Table.from_pandas(res, preserve_index=False)
        t = t.combine_chunks().replace_schema_metadata(None)
        t = t.sort_by([(c, "ascending") for c in sorted(t.column_names)])
        out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        pq.write_table(t, out)
        print(f"{name}: {t.num_rows} rows -> {out}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
