"""CLI entry point — the `ray job submit` surface of the engine.

    python -m htmlparsersharp_ray extract --input DIR --output DIR \
        [--n-buckets 64] [--salt-cap 10000] [--concurrency N] \
        [--batch-size 512] [--no-resume] [--num-cpus N]

    python -m htmlparsersharp_ray synth --turns 100000 --output DIR

CLI scripts OWN their Ray session (init + shutdown); library code never
does (driver contract, CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="htmlparsersharp_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_ext = sub.add_parser("extract", help="run the flagship extraction pipeline")
    p_ext.add_argument("--input", required=True)
    p_ext.add_argument("--output", required=True)
    p_ext.add_argument("--n-buckets", type=int, default=64)
    p_ext.add_argument("--salt-cap", type=int, default=10_000)
    p_ext.add_argument("--concurrency", type=int, default=None)
    p_ext.add_argument("--batch-size", type=int, default=512)
    p_ext.add_argument("--no-resume", action="store_true")
    p_ext.add_argument("--num-cpus", type=int, default=None)

    p_syn = sub.add_parser("synth", help="generate a synthetic transcript table")
    p_syn.add_argument("--turns", type=int, required=True)
    p_syn.add_argument("--output", required=True)
    p_syn.add_argument("--seed", type=int, default=42)

    args = parser.parse_args(argv)

    if args.cmd == "synth":
        from .sources.transcripts import generate_transcripts

        out = generate_transcripts(args.turns, args.output, seed=args.seed)
        print(json.dumps({"output": out, "turns": args.turns}))
        return 0

    import os

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus or os.cpu_count(),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.extract_pipeline import run_extract_pipeline

        ncpu = args.num_cpus or os.cpu_count()
        concurrency = args.concurrency or max(1, ncpu - max(1, ncpu // 6))
        manifest = run_extract_pipeline(
            args.input,
            args.output,
            n_buckets=args.n_buckets,
            salt_cap=args.salt_cap,
            concurrency=concurrency,
            batch_size=args.batch_size,
            resume=not args.no_resume,
        )
        print(
            json.dumps(
                {
                    "buckets_written": int(len(manifest)),
                    "rows": int(manifest["rows"].sum()) if len(manifest) else 0,
                    "output": args.output,
                }
            )
        )
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
