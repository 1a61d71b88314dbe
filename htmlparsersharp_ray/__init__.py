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

__version__ = "0.1.0"
