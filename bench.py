"""Benchmark harness (driver-run per round; BENCH_r{N}.json source).

Headline: flagship transcript extraction (parse+boilerplate-strip over the
synthesized transcript table scaled to the sf dir) — wall seconds and
turns/sec, plus a representative query subset.

    python bench.py                 # one JSON line on stdout
    python bench.py --scaling       # run at 8 and 32 CPUs in fresh
                                    # processes; report both + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from htmlparsersharp_ray.sources.transcripts import transcripts_for_sf
    from htmlparsersharp_ray.pipelines.extract_pipeline import run_extract_pipeline
    from htmlparsersharp_ray.pipelines import relational as r

    # ---- headline: flagship extraction -------------------------------------
    tdir = transcripts_for_sf(sf_dir)
    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.dataset as pads

    pads.dataset(tdir, format="parquet").head(1)

    out_dir = f"/tmp/graft_bench_out/{os.path.basename(tdir)}-{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)
    # leave headroom for the read/sort/write tasks: an actor pool that
    # reserves every CPU starves the other stages and the pipeline stalls
    pool = max(2, num_cpus - 2)
    t0 = time.time()
    manifest = run_extract_pipeline(
        tdir,
        out_dir,
        n_buckets=max(32, num_cpus * 2),
        concurrency=pool,
        batch_size=128,
        resume=False,
    )
    extract_sec = time.time() - t0
    n_turns = int(manifest["rows"].sum())

    # ---- query subset -------------------------------------------------------
    queries = {}
    for name, fn in [
        ("lineitem_agg", r.q_lineitem_agg),
        ("join_broadcast", r.q_join_broadcast),
        ("events_window", r.q_events_window),
        ("orders_topk", r.q_orders_topk),
    ]:
        t0 = time.time()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        queries[name] = round(time.time() - t0, 3)

    from htmlparsersharp_ray.stages.dedup import minhash_lsh_pairs
    import ray.data as rd

    t0 = time.time()
    minhash_lsh_pairs(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet")),
        jaccard_threshold=0.5,
    )
    queries["docs_minhash_pairs"] = round(time.time() - t0, 3)

    queries["extract_turns"] = round(extract_sec, 3)

    result = {
        "metric": "flagship extraction wall time (turns parse+extract+order+write)",
        "value": round(extract_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / extract_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Two parallelism levels in fresh processes: the sandbox stand-in for
    the N vs 4N node clusters the north_rule names (BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    tp_lo = r_lo["turns_per_sec"]
    tp_hi = r_hi["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (turns/sec at 8 vs 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "turns_per_sec_8": tp_lo,
        "turns_per_sec_32": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
