"""Arrow-IPC blob exchange — the scale shape for bucketed groupbys.

Ray Data's ``groupby`` is a sort-based all-to-all over RAW ROWS: a
pipeline that emits one row per (doc, gram) or (doc, bigram) pushes
tens of millions of tiny rows through the sort at corpus scale, and the
sort — not the per-bucket compute — becomes the wall (measured: the
1M-doc lm_score pass spent >80% of 86.7 s in the two exchanges).
Packing each batch's per-bucket slices into ONE Arrow-IPC blob per
(batch, bucket) makes the exchange sort ``blocks × occupied_buckets``
binary rows instead, while the per-bucket callable still sees exactly
the rows it would have seen (zero-parse IPC deserialize + concat).

This generalizes the two-sided exchange inside ``pipelines/joins.py``
(hash_join) and the flagship pipeline's disk shuffle
(extract_pipeline.py:97-215) into a reusable single-input primitive.
Reference n/a — engine-level utility.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.ipc

import ray.data


def serialize_table(table: pa.Table) -> bytes:
    """Arrow-IPC-stream bytes for ``table`` (schema included)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def deserialize_table(blob: bytes) -> pa.Table:
    """Inverse of :func:`serialize_table` (zero-parse IPC read)."""
    return pa.ipc.open_stream(pa.BufferReader(blob)).read_all()


def split_sorted(table: pa.Table, sorted_buckets: np.ndarray):
    """(bucket ids, IPC blobs) for a table whose rows are already
    sorted by ``sorted_buckets`` — the shared tail of every blob-pack
    path (here and joins.py::_to_exchange_rows)."""
    uniq, starts = np.unique(sorted_buckets, return_index=True)
    ends = np.append(starts[1:], len(sorted_buckets))
    blobs = [serialize_table(table.slice(lo, hi - lo))
             for lo, hi in zip(starts, ends)]
    return uniq, blobs


def bucket_group_map(ds: ray.data.Dataset, bucket_of, fn):
    """Bucketed ``groupby().map_groups`` with an Arrow-IPC BLOB
    exchange: the scale replacement for feeding millions of raw rows
    through Ray's sort-based groupby. Each input batch is split into
    per-bucket slices (``bucket_of(pa.Table) -> int64 array``, one
    vectorized call) and packed into ONE IPC blob per (batch, bucket),
    so the all-to-all sorts only ``blocks × occupied_buckets`` rows;
    ``fn(pandas DataFrame of the whole bucket) -> DataFrame`` then runs
    exactly like a map_groups callable. Blob rows carry the slice's
    schema, so empty buckets never reach ``fn`` and mixed-schema
    warnings don't arise. Same semantics as
    ``ds.map_batches(tag).groupby(b).map_groups(fn)`` — pytest-gated
    equivalence in tests/test_joins.py."""

    def pack(batch: pa.Table) -> pa.Table:
        batch = batch.replace_schema_metadata(None)
        if batch.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "blob": pa.array([], pa.large_binary())})
        buckets = np.asarray(bucket_of(batch), dtype=np.int64)
        order = np.argsort(buckets, kind="stable")
        uniq, blobs = split_sorted(batch.take(pa.array(order)),
                                   buckets[order])
        return pa.table({
            "bucket": pa.array(uniq.astype(np.int64)),
            "blob": pa.array(blobs, pa.large_binary()),
        })

    def unpack(group: pd.DataFrame) -> pd.DataFrame:
        tabs = [deserialize_table(b) for b in group["blob"]]
        df = pa.concat_tables(tabs).to_pandas()
        return fn(df)

    return (
        ds.map_batches(pack, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(unpack, batch_format="pandas")
    )


def checkpoint(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize AND CUT LINEAGE — mandatory for iterative pipelines
    that rebind a Dataset every round.

    ``materialize()`` alone is not enough: deriving a new Dataset from a
    MaterializedDataset still DEEP-COPIES its logical plan into the new
    plan, so a loop whose round r+1 references round r twice (state +
    a derived side) builds a plan tree that DOUBLES per round — measured
    on the k-core peel at sf0.01: round walls 1.0 → 2.5 → ... → 127 s
    (2^r) while every actual execution stayed under one second.
    Re-rooting the plan at the materialized blocks
    (``from_arrow_refs(to_arrow_refs())``) makes rounds flat
    (~0.8 s/round, 20 rounds in 16 s on the same input)."""
    return ray.data.from_arrow_refs(ds.materialize().to_arrow_refs())
