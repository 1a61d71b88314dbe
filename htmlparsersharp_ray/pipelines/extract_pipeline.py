"""The flagship pipeline: transcripts parquet → extracted text/spans.

Boundary map (SURVEY.md §3.4):

    read_parquet(transcripts, columns=[conv_id, turn_idx, text])  # pruned read
      └─ add salted bucket column (vectorized, cheap)             # tasks
      └─ [resume] drop rows of completed buckets                  # pruned BEFORE parse
      └─ map_batches(HtmlExtractUDF, pyarrow, actor pool)         # the parse stage
      └─ groupby(bucket).map_groups(sort + atomic write + lineage)# one shuffle
      └─ manifest dataset (one row per bucket)                    # small result

Skew handling per north_rule: bucket = crc32(conv_id, turn_idx // salt_cap)
% n_buckets — conversations shorter than ``salt_cap`` land in exactly one
bucket (so a bucket file is fully sorted per conversation); the giant
conversation splits into deterministic turn-ranges across buckets, each
range sorted internally, with the ranges recorded in lineage. This is the
"salted groupby + per-partition size capping" the north rule names.

Sizing for 100 TB: n_buckets should be ~ input_bytes / 1 GiB so a bucket's
sorted table fits a worker heap; buckets are independent, so failures rerun
one bucket, and completed buckets are skipped at the read.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.parse_stage import HtmlExtractUDF
from ..state import lineage

DEFAULT_N_BUCKETS = 64
DEFAULT_SALT_CAP = 10_000
READ_COLUMNS = ["conv_id", "turn_idx", "text"]


def _bucket_of(conv_id: str, turn_idx: int, n_buckets: int, salt_cap: int) -> int:
    salt = turn_idx // salt_cap
    return zlib.crc32(f"{conv_id}#{salt}".encode()) % n_buckets


class AddBucket:
    """Vectorized-enough bucket assignment (crc32 is a C call per row)."""

    def __init__(self, n_buckets: int = DEFAULT_N_BUCKETS,
                 salt_cap: int = DEFAULT_SALT_CAP, skip_buckets=None):
        self.n_buckets = n_buckets
        self.salt_cap = salt_cap
        self.skip = frozenset(skip_buckets or ())

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        turns = batch.column("turn_idx").to_pylist()
        nb, cap = self.n_buckets, self.salt_cap
        crc = zlib.crc32
        buckets = [crc(f"{c}#{t // cap}".encode()) % nb for c, t in zip(convs, turns)]
        out = batch.append_column("bucket", pa.array(buckets, pa.int32()))
        if self.skip:
            keep = pa.array([b not in self.skip for b in buckets], pa.bool_())
            out = out.filter(keep)
        return out


class _CarryBucketExtract(HtmlExtractUDF):
    """Parse stage that carries the bucket column through."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch.drop_columns(["bucket"]))
        return out.append_column("bucket", batch.column("bucket"))


def _sort_write_group(out_dir: str):
    """Group fn for groupby(bucket): sort by (conv_id, turn_idx), write the
    bucket parquet atomically, record lineage, return a manifest row."""

    def fn(group: pa.Table) -> pa.Table:
        import hashlib

        bucket = group.column("bucket")[0].as_py()
        table = group.drop_columns(["bucket"]).sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        path = lineage.write_bucket_parquet(out_dir, bucket, table)
        text_hash = hashlib.md5(
            "\x1e".join(table.column("extracted_text").to_pylist()).encode()
        ).hexdigest()
        convs = table.column("conv_id")
        meta = {
            "bucket": bucket,
            "rows": table.num_rows,
            "conv_min": pc.min(convs).as_py() if table.num_rows else None,
            "conv_max": pc.max(convs).as_py() if table.num_rows else None,
            "text_md5": text_hash,
            "path": path,
        }
        lineage.record_bucket(out_dir, bucket, meta)
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "rows": pa.array([table.num_rows], pa.int64()),
                "text_md5": pa.array([text_hash], pa.string()),
            }
        )

    return fn


def run_extract_pipeline(
    input_dir: str,
    out_dir: str,
    n_buckets: int = DEFAULT_N_BUCKETS,
    salt_cap: int = DEFAULT_SALT_CAP,
    concurrency=None,
    batch_size: int = 256,
    resume: bool = True,
):
    """Run the flagship pipeline; returns the manifest as a pandas DataFrame
    (one row per bucket written this run)."""
    skip = lineage.completed_buckets(out_dir) if resume else set()
    if len(skip) >= n_buckets:
        import pandas as pd

        return pd.DataFrame({"bucket": [], "rows": [], "text_md5": []})
    ds = ray.data.read_parquet(input_dir, columns=READ_COLUMNS)
    ds = ds.map_batches(
        AddBucket(n_buckets, salt_cap, skip_buckets=skip),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        _CarryBucketExtract,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    manifest = ds.groupby("bucket").map_groups(
        _sort_write_group(out_dir), batch_format="pyarrow"
    )
    return manifest.to_pandas()


def extract_dataset(input_dir: str, concurrency=None, batch_size: int = 256):
    """Streaming extraction dataset (no ordering/writing) — for composition
    and for the driver's entry() smoke check."""
    ds = ray.data.read_parquet(input_dir, columns=READ_COLUMNS)
    return ds.map_batches(
        HtmlExtractUDF,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_sorted(input_dir: str, concurrency=None, batch_size: int = 256):
    """Test-scale helper: full extraction globally sorted by
    (conv_id, turn_idx) for golden comparison (SURVEY.md §2.6: a global
    sort is test-scale only; the scale path is per-bucket ordering)."""
    return extract_dataset(input_dir, concurrency, batch_size).sort(
        ["conv_id", "turn_idx"]
    )
