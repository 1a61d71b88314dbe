"""The parse+extract stage: transcripts batch → extraction batch.

This is the engine's core operator (SURVEY.md §2.2-2.3 fused): each row's
``text`` is run through the HTML5 tokenizer+tree-builder and the
boilerplate extractor. It is a callable CLASS so `map_batches` runs it as
an actor pool — module-level tables (entities, element flags) are built
once per worker process at import, and per-actor state (compiled regexes,
reusable buffers) lives in ``__init__``, mirroring the reference's
parser-instance reuse (reference: SimpleHtmlParser.cs:75-91 Reset;
Tokenizer.cs:1087-1101 newAttributesEachTime=false).

Batch format is pyarrow end-to-end: zero-copy in, columnar out.
Parsing is inherently sequential per document, so the per-row loop here is
the *one* sanctioned Python loop in the hot path (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

from ..html.parser import parse
from ..extract.boilerplate import extract_main_content

# Per-row input cap: a hostile multi-MB turn must not stall a batch or blow
# an actor's heap (SURVEY.md §7.4.7). Truncation is recorded in metrics.
DEFAULT_MAX_TEXT_CHARS = 2_000_000

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("path", pa.string()),
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("tag", pa.string()),
        ]
    )
)
METRICS_TYPE = pa.struct(
    [
        ("nodes", pa.int64()),
        ("tokens", pa.int64()),
        ("parse_errors", pa.int32()),
        ("boilerplate_bytes", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("extracted_text", pa.string()),
        ("spans", SPAN_TYPE),
        ("doc_mode", pa.string()),
        ("metrics", METRICS_TYPE),
    ]
)


class HtmlExtractUDF:
    """map_batches(HtmlExtractUDF, batch_format="pyarrow",
    concurrency=N, batch_size=B) — the actor-pool parse stage."""

    def __init__(self, max_text_chars: int = DEFAULT_MAX_TEXT_CHARS,
                 scripting: bool = False):
        self.max_text_chars = max_text_chars
        self.scripting = scripting

    def _extract_raw(self, text: str):
        """Parse + extract one turn → (ExtractionResult, ParseResult,
        truncated). Shared by the dict view (extract_one) and the
        columnar batch builder (__call__)."""
        truncated = False
        if text is None:
            text = ""
        if len(text) > self.max_text_chars:
            text = text[: self.max_text_chars]
            truncated = True
        result = parse(text, scripting=self.scripting)
        ext = extract_main_content(result.root)
        return ext, result, truncated

    def extract_one(self, text: str):
        """Parse + extract a single turn; returns a plain dict of fields."""
        ext, result, truncated = self._extract_raw(text)
        return {
            "extracted_text": ext.text,
            "spans": [
                {"path": p, "start": s, "end": e, "tag": t}
                for (p, s, e, t) in ext.spans
            ],
            "doc_mode": result.doc_mode,
            "metrics": {
                "nodes": ext.nodes,
                "tokens": result.tokens,
                "parse_errors": result.errors,
                "boilerplate_bytes": ext.boilerplate_bytes,
                "truncated": truncated,
            },
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Columns build as FLAT arrays + a list-offsets array: the Arrow
        # wire layout is struct-of-arrays already, so building it directly
        # skips one Python dict per span/metrics row (the old builder's
        # main allocation churn — NOTES_r3 round-4 lead 2). Schema is
        # byte-identical to the previous per-dict builder.
        texts = batch.column("text").to_pylist()
        n = len(texts)
        extracted = []
        doc_modes = []
        nodes, tokens, errors, bbytes, trunc = [], [], [], [], []
        span_offsets = [0]
        paths, starts, ends, tags = [], [], [], []
        for text in texts:
            ext, result, truncated = self._extract_raw(text)
            extracted.append(ext.text)
            for (p, s, e, t) in ext.spans:
                paths.append(p)
                starts.append(s)
                ends.append(e)
                tags.append(t)
            span_offsets.append(len(paths))
            doc_modes.append(result.doc_mode)
            nodes.append(ext.nodes)
            tokens.append(result.tokens)
            errors.append(result.errors)
            bbytes.append(ext.boilerplate_bytes)
            trunc.append(truncated)
        spans_arr = pa.ListArray.from_arrays(
            pa.array(span_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(paths, pa.string()),
                    pa.array(starts, pa.int32()),
                    pa.array(ends, pa.int32()),
                    pa.array(tags, pa.string()),
                ],
                fields=list(SPAN_TYPE.value_type),
            ),
        )
        metrics_arr = pa.StructArray.from_arrays(
            [
                pa.array(nodes, pa.int64()),
                pa.array(tokens, pa.int64()),
                pa.array(errors, pa.int32()),
                pa.array(bbytes, pa.int64()),
                pa.array(trunc, pa.bool_()),
            ],
            fields=list(METRICS_TYPE),
        )
        assert len(spans_arr) == n
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx").cast(pa.int32()),
                "extracted_text": pa.array(extracted, type=pa.string()),
                "spans": spans_arr,
                "doc_mode": pa.array(doc_modes, type=pa.string()),
                "metrics": metrics_arr,
            }
        )


class LinkExtractUDF:
    """Link-graph extraction: parse each turn with the real HTML5 parser
    and emit one row per ``<a href>`` — (conv_id, turn_idx, href,
    anchor_text, in_content). The 1→N flat-map that builds a web link
    graph from raw HTML; ``in_content`` marks anchors OUTSIDE
    nav/header/footer/aside ancestry (boilerplate links vs editorial
    links — the signal link-based crawl frontiers weight by).

    Actor-pool stage (parser state amortizes per actor); the DOM walk is
    iterative (explicit stack — no recursion limit on deep markup).
    Reference parity: the reference parses and exposes the DOM
    (SimpleHtmlParser.cs); link extraction is an engine-level consumer
    of the same tree."""

    _BOILER = frozenset(("nav", "header", "footer", "aside"))

    def __init__(self, max_text_chars: int = DEFAULT_MAX_TEXT_CHARS):
        self.max_text_chars = max_text_chars

    def _links_of(self, text: str):
        from ..extract.boilerplate import _norm
        from ..html import parse
        from ..html.dom import Element, Text

        root = parse(text[: self.max_text_chars] if text else "").root
        out = []
        # iterative preorder: children pushed REVERSED so the LIFO pop
        # visits them in document order. Stack entries: (node, bdepth).
        stack = [(root, 0)]
        while stack:
            node, bdepth = stack.pop()
            if isinstance(node, Element):
                name = node.name
                if name in self._BOILER:
                    bdepth += 1
                if name == "a" and "href" in node.attrs:
                    # anchor text: Text descendants in document order
                    parts = []
                    tstack = list(reversed(node.children))
                    while tstack:
                        c = tstack.pop()
                        if isinstance(c, Text):
                            parts.append(c.data)
                        else:
                            tstack.extend(reversed(c.children))
                    out.append((node.attrs["href"], _norm("".join(parts)),
                                bdepth == 0))
            for child in reversed(node.children):
                stack.append((child, bdepth))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        turns = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        conv_o, turn_o, href_o, text_o, content_o = [], [], [], [], []
        for cid, tix, text in zip(convs, turns, texts):
            for href, anchor, in_content in self._links_of(text):
                conv_o.append(cid)
                turn_o.append(tix)
                href_o.append(href)
                text_o.append(anchor)
                content_o.append(in_content)
        return pa.table({
            "conv_id": pa.array(conv_o, pa.string()),
            "turn_idx": pa.array(turn_o, pa.int64()),
            "href": pa.array(href_o, pa.string()),
            "anchor_text": pa.array(text_o, pa.string()),
            "in_content": pa.array(content_o, pa.bool_()),
        })
