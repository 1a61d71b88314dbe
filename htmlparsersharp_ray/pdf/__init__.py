"""Minimal from-scratch PDF layer (north-rule "PDF/layout parse").

Two halves, both pure stdlib (zlib for FlateDecode):

- ``writer.render_pdf`` — deterministic text → PDF 1.4 bytes with a real
  layout pass (greedy word wrap, fixed leading, fixed lines-per-page,
  Flate-compressed content streams, classic xref + trailer).
- ``extractor.extract_text`` — a real PDF text extractor: object-syntax
  tokenizer, indirect-object scan (xref-recovery style), page-tree walk,
  stream filter decode (Flate / ASCIIHex; others raise honestly), and a
  content-stream text interpreter (BT/ET, Td/TD/Tm/T*/TL, Tj/TJ/'/")
  that reconstructs reading order from text positions (lines by y,
  chunks by x, gap-heuristic spaces).

Neither half knows about the other beyond the PDF spec: the extractor is
exercised in tests against hand-written PDFs (hex strings, TJ kerning,
out-of-order chunks, nested page trees, indirect /Length) — not only
against the writer's output.
"""

from htmlparsersharp_ray.pdf.extractor import PdfText, extract_text
from htmlparsersharp_ray.pdf.writer import render_pdf

__all__ = ["render_pdf", "extract_text", "PdfText"]
