"""htmlparsersharp_ray — a Ray-Data-native main-content extraction engine.

Reimplements the HTML5 parsing core of HtmlParserSharp (the C# port of the
Validator.nu parser; see /root/reference) from scratch in Python — a WHATWG
state-machine tokenizer fused with a tree builder (insertion modes,
active-formatting-element reconstruction, adoption agency, foster parenting,
foreign content) — and runs it as a batched per-turn transform over Arrow
record batches with Ray Data (`map_batches` actor pools, salted conv_id
partitioning, per-partition lineage/checkpoints).

Layout:
    html/       pure-Python HTML5 parser core (no Ray dependency)
    extract/    DOM -> main-content text/spans/metrics heuristics
    stages/     Ray Data map_batches stages (parse/extract, dedup, similarity,
                text analysis, multimodal stubs)
    sources/    transcript table synthesis + readers
    pipelines/  end-to-end pipelines (extraction, relational demos)
    state/      lineage / checkpoint records for resumable output
"""

__version__ = "0.2.0"

import logging as _logging


class _SchemaHashNoiseFilter(_logging.Filter):
    """Drop Ray Data's per-worker 'Failed to hash the schemas (for
    deduplication): unhashable type: dict' warning.

    Root cause is inside Ray, not this engine: every pandas-format stage
    output goes through ``pa.Table.from_pandas`` (ray.data pandas_block),
    which attaches the b'pandas' schema metadata dict, and pyarrow schemas
    with metadata are unhashable — so Ray's schema-dedup `set(schemas)`
    warns once per worker (harmless; it falls back to full unification).
    Arrow-format stages in this repo emit metadata-free (hashable)
    schemas; this filter silences only the known-spurious message for the
    pandas stages we cannot change. Installed at import so worker
    processes (which import this package for the UDFs) get it too.
    """

    # Each entry is a tuple of substrings that must ALL be present —
    # matching the FULL known message (ADVICE r2: a bare prefix match on
    # 'Error calculating size for column' would also hide genuine
    # size-estimation failures with a different root cause).
    _NOISE = (
        # pandas metadata dict makes schemas unhashable inside Ray
        ("Failed to hash the schemas", "unhashable type"),
        # Ray size-estimates empty pandas object columns with
        # np.vectorize, which rejects size-0 input; empty blocks are
        # normal for sparse join buckets. Ray formats the exception into
        # the message (pandas_block.py: "Error calculating size for
        # column '{col}': {e}"), so the vectorize detail is matchable.
        ("Error calculating size for column", "vectorize", "size 0"),
    )

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        msg = record.getMessage()
        return not any(all(pat in msg for pat in pats) for pats in self._NOISE)


for _name in (
    "ray.data._internal.arrow_ops.transform_pyarrow",
    "ray.data._internal.pandas_block",
):
    _logging.getLogger(_name).addFilter(_SchemaHashNoiseFilter())
