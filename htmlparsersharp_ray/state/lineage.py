"""Resumable-output lineage records (SURVEY.md §4.2 checkpoint/resume).

The reference has no checkpointing (strictly sequential,
reference: Program.cs:58-71); at 10^12-turn scale a failed run must skip
finished partitions. Layout:

    out_dir/
      bucket=0007/part.parquet      # one atomic file per key-range bucket
      _lineage/bucket-0007.json     # written AFTER the parquet rename

A bucket's parquet is written to a tmp path and os.rename()d (atomic on
one filesystem), then the lineage record is written. On restart,
``completed_buckets`` lists buckets with a lineage record; the pipeline
prunes their rows at the READ side, before any parsing work.
"""

from __future__ import annotations

import json
import os


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_buckets(out_dir: str) -> set[int]:
    ldir = lineage_dir(out_dir)
    if not os.path.isdir(ldir):
        return set()
    done = set()
    for fname in os.listdir(ldir):
        if fname.startswith("bucket-") and fname.endswith(".json"):
            try:
                done.add(int(fname[len("bucket-"):-len(".json")]))
            except ValueError:
                continue
    return done


def record_bucket(out_dir: str, bucket: int, meta: dict) -> None:
    ldir = lineage_dir(out_dir)
    os.makedirs(ldir, exist_ok=True)
    path = os.path.join(ldir, f"bucket-{bucket:04d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    os.rename(tmp, path)


def write_bucket_parquet(out_dir: str, bucket: int, table) -> str:
    """Atomically write one bucket's sorted output parquet."""
    import pyarrow.parquet as pq

    bdir = os.path.join(out_dir, f"bucket={bucket:04d}")
    os.makedirs(bdir, exist_ok=True)
    path = os.path.join(bdir, "part.parquet")
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.rename(tmp, path)
    return path
