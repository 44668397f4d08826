"""CLI entrypoint — the `ray job submit` surface.

    python -m prclz_ray flagship --input /root/testdata/sf0.001 \
        --output /tmp/joined [--no-resume] [--num-cpus N]
    python -m prclz_ray reblock --output /tmp/reblock [--block-limit N]
    python -m prclz_ray query <name> [--sf-dir DIR]
    python -m prclz_ray list

On a real cluster: `ray job submit -- python -m prclz_ray flagship ...`
(the config dataclass of SURVEY.md §2.10 is this argparse namespace).
Owns its Ray session (init if absent, shutdown at exit) — the library
itself never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="prclz_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship", help="run the spatial-join pipeline to parquet")
    f.add_argument("--input", required=True, help="dir containing documents.parquet")
    f.add_argument("--output", required=True, help="output dir (Hive-partitioned)")
    f.add_argument("--no-resume", action="store_true")
    f.add_argument("--num-cpus", type=int, default=None)

    t = sub.add_parser("tiles", help="run the raster-heatmap tiling job to parquet")
    t.add_argument("--input", required=True)
    t.add_argument("--output", required=True)
    t.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser("curate", help="run the end-to-end corpus-curation pipeline to parquet")
    c.add_argument("--input", required=True, help="dir containing documents.parquet")
    c.add_argument("--output", required=True, help="output dir (Hive-partitioned by kb)")
    c.add_argument("--no-resume", action="store_true")
    c.add_argument("--num-cpus", type=int, default=None)

    tp = sub.add_parser("train-prep", help="curate + sequence-pack into a sharded training manifest")
    tp.add_argument("--input", required=True, help="dir containing documents.parquet")
    tp.add_argument("--output", required=True, help="output dir (Hive-partitioned by shard)")
    tp.add_argument("--no-resume", action="store_true")
    tp.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser("query", help="run a named query and print row count + head")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--num-cpus", type=int, default=None)

    r = sub.add_parser("reblock", help="run the three-sink reblock writer")
    r.add_argument("--output", required=True, help="output dir (summary/ steiner_lines/ terminal_points/)")
    r.add_argument("--block-limit", type=int, default=None,
                   help="solve only the first N blocks (the reference's block_list)")
    r.add_argument("--num-cpus", type=int, default=None)

    qc = sub.add_parser("qc", help="render the corpus QC report (markdown + parquet rollups)")
    qc.add_argument("--input", required=True, help="sf_dir with the parquet tables")
    qc.add_argument("--output", required=True, help="artifact dir (QC_REPORT.md, qc_*.parquet)")
    qc.add_argument("--num-cpus", type=int, default=None)

    cp = sub.add_parser(
        "compose",
        help="chain registered document stages (prclz_ray.registry.DOC_STAGES) over documents.parquet",
    )
    cp.add_argument("--input", required=True, help="dir containing documents.parquet")
    cp.add_argument("--stages", required=True,
                    help="comma-separated registered stage names, applied in order")
    cp.add_argument("--output", default=None,
                    help="output parquet dir (omit to print row count + head)")
    cp.add_argument("--num-cpus", type=int, default=None)

    sub.add_parser("list", help="list query names (and registered stages)")

    args = ap.parse_args(argv)

    from .queries import QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            print(name)
        from .registry import DOC_STAGES

        print("-- stages (compose):", ",".join(DOC_STAGES.names()))
        return 0

    import ray

    started = False
    if not ray.is_initialized():
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
        started = True
    try:
        if args.cmd == "flagship":
            from .pipelines.flagship import run_flagship

            stats = run_flagship(args.input, args.output, resume=not args.no_resume)
            print(json.dumps(stats))
        elif args.cmd == "tiles":
            from .pipelines.flagship import run_tiles

            print(json.dumps(run_tiles(args.input, args.output)))
        elif args.cmd == "curate":
            from .pipelines.curate import run_curate

            print(json.dumps(run_curate(args.input, args.output,
                                        resume=not args.no_resume)))
        elif args.cmd == "train-prep":
            from .pipelines.curate import run_train_prep

            print(json.dumps(run_train_prep(args.input, args.output,
                                            resume=not args.no_resume)))
        elif args.cmd == "reblock":
            from .pipelines.reblock import run_reblock

            print(json.dumps(run_reblock(args.output, limit_blocks=args.block_limit)))
        elif args.cmd == "qc":
            from .pipelines.qc import run_qc_report

            print(json.dumps(run_qc_report(args.input, args.output)))
        elif args.cmd == "compose":
            from .io import read_parquet_clean
            from .registry import compose_stages

            ds = read_parquet_clean(f"{args.input}/documents.parquet")
            out = compose_stages(ds, args.stages.split(","))
            if args.output:
                out.write_parquet(args.output, min_rows_per_file=50_000)
                print(json.dumps({"stages": args.stages, "output": args.output}))
            else:
                # preview must not materialize the corpus on the driver
                n = out.count()
                print(f"{n} rows")
                print(out.limit(5).to_pandas().to_string())
        elif args.cmd == "query":
            import pandas as pd

            import ray.data

            res = QUERIES[args.name](args.sf_dir)
            if isinstance(res, ray.data.Dataset):
                df = res.to_pandas()
            elif isinstance(res, pd.DataFrame):
                df = res
            else:
                df = res.to_pandas()
            print(f"{len(df)} rows")
            print(df.head(10).to_string())
    finally:
        if started:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
