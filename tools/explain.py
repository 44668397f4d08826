"""Per-operator stats for any named query — the perf feedback loop.

Usage: python tools/explain.py <query> [sf_dir]

Runs the query, materializes it, and prints Ray Data's per-operator
stats (task counts, remote wall/cpu, rows, bytes) so a slow stage is
visible immediately (the `ds.stats()` iteration loop the build brief
prescribes).
"""

from __future__ import annotations

import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from prclz_ray.queries import QUERIES as _Q

    if len(sys.argv) < 2 or sys.argv[1] not in _Q:
        print("usage: python tools/explain.py <query> [sf_dir]")
        print("queries:", ", ".join(sorted(_Q)))
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import ray.data

    res = _Q[name](sf_dir)
    if isinstance(res, ray.data.Dataset):
        mat = res.materialize()
        print(mat.stats())
        print(f"rows: {mat.count()}")
    else:
        print(f"(driver-side result, no Ray stats) rows: {res.num_rows}")
    ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
