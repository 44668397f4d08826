"""Replicates the driver's correctness gate locally: runs every
``queries()`` entry and its DuckDB oracle side-by-side and compares
row count, schema (column names), and an order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]

Set ``SELFCHECK_JSON=/path/out.json`` to also write the full per-query
result table in the driver's CORRECTNESS_r*.json format (rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err per entry)
— the committed round artifact covering ALL registry entries, since
the driver samples only a subset (VERDICT r4 §missing.1).
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    if len(df) == 0:
        return "empty"
    df = df[sorted(df.columns)].copy()
    # canonical row order: sort by all columns stringified
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        # SELFCHECK_CPUS: re-running the whole gate at a different
        # parallelism evidences partition-count independence (results
        # must not depend on how blocks split)
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("SELFCHECK_CPUS", "8")),
            include_dashboard=False,
        )

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()

    unknown = only - set(qs)
    if unknown:
        print(f"ERROR unknown query name(s): {sorted(unknown)}")
        print(f"valid: {sorted(qs)}")
        ray.shutdown()
        return 2

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    report: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"ERROR  {name}: {type(ex).__name__}: {ex}")
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"{type(ex).__name__}: {ex}",
            }
            n_fail += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ROWS   {name}: {len(got)} rows ({wall:.1f}s, rows-only: no oracle)")
            report[name] = {
                "rows_match": None, "schema_match": None,
                "hash_match": None, "spark_rows": len(got),
                "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"ERROR  {name} (oracle): {type(ex).__name__}: {ex}")
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(got),
                "oracle_rows": None,
                "err": f"oracle: {type(ex).__name__}: {ex}",
            }
            n_fail += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "MATCH " if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(got),
            "oracle_rows": len(want), "err": None,
        }
        if status == "MATCH ":
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"{status}{name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({wall:.1f}s)"
        )
        if not ok_cols:
            print(f"    got  cols: {sorted(got.columns)}")
            print(f"    want cols: {sorted(want.columns)}")
        elif not ok_hash and ok_rows:
            # best-effort diagnostic only: a non-sortable object column
            # must not abort the gate (the report still records the
            # MISMATCH either way)
            try:
                merged = got.sort_values(sorted(got.columns)).reset_index(drop=True).compare(
                    want[got.columns].sort_values(sorted(got.columns)).reset_index(drop=True)
                )
                print(f"    first diffs:\n{merged.head(5)}")
            except Exception as ex:
                print(f"    (diff display unavailable: {type(ex).__name__}: {ex})")
    print(f"\n{n_pass} matched, {n_fail} failed")
    out = os.environ.get("SELFCHECK_JSON")
    if out:
        import json

        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {out} ({len(report)} entries)")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
