"""Alternate source formats for the transcripts table.

The reference's IO driver reads HTML from FILES and STRINGS
(SimpleHtmlParser.cs:42-58); this engine's canonical input is the
Parquet transcripts table. For "a user of the reference could switch"
completeness, these readers accept the same logical table from:

- **CSV** (RFC-4180: quoted fields, embedded newlines/commas in the
  HTML payload) — ``read_transcripts_csv``
- **JSONL** (one JSON object per row, ts as ISO-8601 string) —
  ``read_transcripts_jsonl``
- **a directory of raw .html files** (the reference's own input mode:
  one document per file; file stem becomes conv_id, turn_idx = 0) —
  ``read_html_dir``

Every reader returns a ``ray.data.Dataset`` with EXACTLY the canonical
schema (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us]) so the rest of the engine is
source-agnostic; round-trip equality vs the Parquet path is
pytest-gated (tests/test_sources.py).

Scale notes: CSV with embedded newlines cannot be split mid-file
(``newlines_in_values=True`` forces whole-file parsing), so shard CSV
inputs as many files — Ray parallelizes per file, same as the writers
here produce. JSONL and Parquet split naturally. ``read_html_dir``
reads bytes zero-copy per file; decoding is a vectorized Arrow cast in
the same task.
"""

from __future__ import annotations

import os

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

_STRING_COLS = ("conv_id", "role", "text", "tool")


def _normalize(batch: pa.Table) -> pa.Table:
    """Cast a raw-format batch to the canonical transcript schema:
    int32 turn_idx, timestamp[us] ts (ISO strings parse via Arrow
    cast), null strings → '' (formats without a null/empty distinction
    re-enter as the empty string the writers emitted)."""
    import pyarrow.compute as pc

    cols = {}
    for name in _STRING_COLS:
        col = batch.column(name)
        if col.null_count:
            col = pc.fill_null(col, "")
        cols[name] = col.cast(pa.string())
    cols["turn_idx"] = batch.column("turn_idx").cast(pa.int32())
    cols["ts"] = batch.column("ts").cast(pa.timestamp("us"))
    return pa.table({f.name: cols[f.name] for f in TRANSCRIPT_SCHEMA})


def read_transcripts_csv(path: str):
    """Transcripts from CSV file(s). Embedded newlines in the HTML
    payload require ``newlines_in_values`` (whole-file parse — shard
    inputs as many files for parallelism); empty strings stay strings
    (never null), matching the canonical table."""
    import ray.data
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            strings_can_be_null=False,
            column_types={"conv_id": pa.string(), "turn_idx": pa.int32(),
                          "role": pa.string(), "text": pa.string(),
                          "tool": pa.string(), "ts": pa.timestamp("us")},
        ),
    )
    return ds.map_batches(_normalize, batch_format="pyarrow")


def read_transcripts_jsonl(path: str):
    """Transcripts from JSON-lines file(s); ts travels as an ISO-8601
    string and parses via Arrow cast."""
    import ray.data

    ds = ray.data.read_json(path)
    return ds.map_batches(_normalize, batch_format="pyarrow")


def read_transcripts_jsonl_gz(path: str):
    """Transcripts from GZIP-compressed JSON-lines file(s)
    (``.jsonl.gz`` — the shape web-crawl dumps actually ship in):
    Arrow decompresses in the read task stream, so sharded ``.gz``
    inputs parallelize per file exactly like plain JSONL (a single
    giant ``.gz`` member is one task — shard crawl dumps as many
    files, same rule as the CSV reader's newline note)."""
    import ray.data

    ds = ray.data.read_json(
        path, arrow_open_stream_args={"compression": "gzip"})
    return ds.map_batches(_normalize, batch_format="pyarrow")


def read_html_dir(path: str):
    """Transcripts from a directory of raw ``.html`` files — the
    reference's own input mode (``Parse(path)``,
    SimpleHtmlParser.cs:54-58): one document per file, conv_id = file
    stem, turn_idx = 0, ts = the fixed corpus epoch. UTF-8 decode is a
    vectorized Arrow cast; a leading BOM is the parser's job
    (``preprocess``), exactly as the reference swallows it in its read
    loop (SimpleHtmlParser.cs:114-122)."""
    import ray.data

    from .transcripts import EPOCH_US

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        stems = [os.path.splitext(os.path.basename(p))[0]
                 for p in batch.column("path").to_pylist()]
        n = len(stems)
        return pa.table({
            "conv_id": pa.array(stems, pa.string()),
            "turn_idx": pa.array([0] * n, pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": batch.column("bytes").cast(pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array([EPOCH_US] * n, pa.timestamp("us")),
        })

    return ds.map_batches(to_rows, batch_format="pyarrow")


# --- writers (deterministic; used by the round-trip tests and the CLI) ----

def write_transcripts_csv(table: pa.Table, out_dir: str,
                          n_files: int = 4) -> str:
    from pyarrow import csv as pacsv

    os.makedirs(out_dir, exist_ok=True)
    rows_per = (table.num_rows + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * rows_per
        if lo >= table.num_rows:
            break
        hi = min(table.num_rows, lo + rows_per)
        pacsv.write_csv(table.slice(lo, hi - lo),
                        os.path.join(out_dir, f"part-{f:04d}.csv"))
    return out_dir


def write_transcripts_jsonl(table: pa.Table, out_dir: str,
                            n_files: int = 4) -> str:
    import json

    os.makedirs(out_dir, exist_ok=True)
    df = table.to_pandas()
    # ISO-8601 microsecond strings round-trip through the Arrow cast
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    rows_per = (len(df) + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * rows_per
        if lo >= len(df):
            break
        chunk = df.iloc[lo:lo + rows_per]
        with open(os.path.join(out_dir, f"part-{f:04d}.jsonl"), "w",
                  encoding="utf-8") as fh:
            for rec in chunk.to_dict(orient="records"):
                fh.write(json.dumps(rec, ensure_ascii=False))
                fh.write("\n")
    return out_dir


def write_transcripts_jsonl_gz(table: pa.Table, out_dir: str,
                               n_files: int = 4) -> str:
    """Deterministic gzip JSONL shards (mtime pinned to 0 in the gzip
    header so output bytes are content-only)."""
    import gzip
    import json

    os.makedirs(out_dir, exist_ok=True)
    df = table.to_pandas()
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    rows_per = (len(df) + n_files - 1) // n_files
    for f in range(n_files):
        lo = f * rows_per
        if lo >= len(df):
            break
        chunk = df.iloc[lo:lo + rows_per]
        dest = os.path.join(out_dir, f"part-{f:04d}.jsonl.gz")
        with open(dest, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb",
                               mtime=0) as fh:
                for rec in chunk.to_dict(orient="records"):
                    fh.write(json.dumps(rec, ensure_ascii=False)
                             .encode("utf-8"))
                    fh.write(b"\n")
    return out_dir


def write_html_dir(table: pa.Table, out_dir: str) -> str:
    """One ``<conv_id>-<turn_idx>.html`` file per row (reference-style
    corpus layout)."""
    os.makedirs(out_dir, exist_ok=True)
    convs = table.column("conv_id").to_pylist()
    idxs = table.column("turn_idx").to_pylist()
    texts = table.column("text").to_pylist()
    for cid, ti, text in zip(convs, idxs, texts):
        fname = os.path.join(out_dir, f"{cid}-{ti:06d}.html")
        with open(fname, "w", encoding="utf-8") as fh:
            fh.write(text)
    return out_dir
