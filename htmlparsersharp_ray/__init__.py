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

    _NOISE = (
        # pandas metadata dict makes schemas unhashable inside Ray
        "Failed to hash the schemas",
        # Ray size-estimates empty pandas object columns with np.vectorize,
        # which rejects size-0 input; empty blocks are normal for sparse
        # join buckets
        "Error calculating size for column",
    )

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        msg = record.getMessage()
        return not any(pat in msg for pat in self._NOISE)


for _name in (
    "ray.data._internal.arrow_ops.transform_pyarrow",
    "ray.data._internal.pandas_block",
):
    _logging.getLogger(_name).addFilter(_SchemaHashNoiseFilter())
