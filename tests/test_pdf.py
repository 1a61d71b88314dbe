"""PDF layer tests: writer determinism + layout, extractor vs
HAND-WRITTEN adversarial PDFs (not only the writer's own output), the
honest capability boundary, and the Ray round-trip stage."""

from __future__ import annotations

import math
import zlib

import pytest

from htmlparsersharp_ray.pdf.extractor import PdfError, extract_text
from htmlparsersharp_ray.pdf.writer import (DEFAULT_LINES_PER_PAGE,
                                            DEFAULT_WRAP_CHARS, render_pdf,
                                            wrap_text)


# --- writer ↔ extractor round trip ------------------------------------------
@pytest.mark.parametrize("text", [
    "",
    "hello world",
    "a(b)c \\ back\\slash (nested (parens)) done",
    "tabs\tand\nnewlines\r\ncollapse like spaces",
    "café naïve résumé",       # Latin-1 accents
    "word " * 4000,                                # multi-page
    " leading and trailing   whitespace  ",
])
def test_roundtrip_normalized(text):
    got = extract_text(render_pdf(text)).text
    assert " ".join(got.split()) == " ".join(text.split())


def test_roundtrip_uncompressed():
    r = extract_text(render_pdf("plain stream body", compress=False))
    assert r.text == "plain stream body"
    assert r.n_pages == 1


def test_hard_broken_word_gains_whitespace():
    # a word longer than the column hard-breaks; the breaks re-extract
    # as whitespace (a line break IS whitespace in reading order)
    r = extract_text(render_pdf("x" * 500 + " tail"))
    assert r.text.split() == ["x" * 72] * 6 + ["x" * 68, "tail"]


def test_writer_deterministic_bytes():
    a = render_pdf("determinism check " * 100)
    b = render_pdf("determinism check " * 100)
    assert a == b


def test_writer_rejects_non_latin1():
    with pytest.raises(ValueError, match="Latin-1"):
        render_pdf("世界")


def test_layout_pagination_exact():
    # 10-char words at width 72 → 6 words/line ("w w w w w w" = 65
    # chars, a 7th would need 76); 40 lines/page
    words = ["w" * 10] * 1000
    lines = wrap_text(" ".join(words), DEFAULT_WRAP_CHARS)
    assert all(len(ln) <= DEFAULT_WRAP_CHARS for ln in lines)
    assert len(lines) == math.ceil(1000 / 6)
    r = extract_text(render_pdf(" ".join(words)))
    assert r.n_pages == math.ceil(len(lines) / DEFAULT_LINES_PER_PAGE)
    assert r.n_text_ops == len(lines)      # one Tj per line


# --- extractor vs hand-written PDFs ------------------------------------------
def _wrap_pdf(objects: dict[int, bytes]) -> bytes:
    """Assemble a minimal PDF file from raw object bodies (no xref —
    the extractor's recovery scan must not need one)."""
    buf = bytearray(b"%PDF-1.4\n")
    for num in sorted(objects):
        buf += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    buf += b"trailer\n<< /Size %d /Root 1 0 R >>\n%%%%EOF\n" % (
        max(objects) + 1)
    return bytes(buf)


def _page_objs(content: bytes, *, length: bytes | None = None) -> dict:
    if length is None:
        length = b"%d" % len(content)
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/MediaBox [ 0 0 612 792 ] >>"),
        4: (b"<< /Length " + length + b" >>\nstream\n" + content +
            b"\nendstream"),
    }


def test_hex_strings_and_escapes():
    content = (b"BT /F1 12 Tf 72 700 Td "
               b"<48656C6C6F2C20> Tj "          # "Hello, " in hex
               b"(w\\157rld \\(esc\\)\\\\) Tj " # octal + escapes
               b"ET")
    r = extract_text(_wrap_pdf(_page_objs(content)))
    assert r.text == "Hello, world (esc)\\"


def test_tj_array_kerning_spaces():
    # small kern offsets join; offsets beyond the threshold read as a
    # space (the standard extractor heuristic)
    content = (b"BT /F1 12 Tf 72 700 Td "
               b"[ (Hel) -50 (lo) -400 (world) ] TJ ET")
    r = extract_text(_wrap_pdf(_page_objs(content)))
    assert r.text == "Hello world"


def test_out_of_order_chunks_reading_order():
    # emitted bottom-line-first and right-chunk-first; layout must
    # reorder by y desc then x asc, and gap-insert the space
    content = (b"BT /F1 12 Tf "
               b"1 0 0 1 200 650 Tm (line) Tj "
               b"1 0 0 1 72 700 Tm (second) Tj "
               b"1 0 0 1 130 700 Tm (first) Tj "
               b"ET")
    r = extract_text(_wrap_pdf(_page_objs(content)))
    assert r.text == "second first\nline"


def test_quote_operator_and_leading():
    content = (b"BT /F1 12 Tf 14 TL 72 700 Td "
               b"(one) Tj (two) ' (three) ' ET")
    r = extract_text(_wrap_pdf(_page_objs(content)))
    assert r.text == "one\ntwo\nthree"


def test_nested_page_tree_and_content_array():
    c1, c2 = b"BT /F1 12 Tf 72 700 Td (alpha) Tj ET", \
             b"BT /F1 12 Tf 72 680 Td (beta) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 5 0 R 3 0 R ] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents [ 6 0 R 7 0 R ] "
            b"/MediaBox [ 0 0 612 792 ] >>"),
        5: b"<< /Type /Pages /Kids [ 4 0 R ] /Count 1 >>",   # nested
        4: (b"<< /Type /Page /Parent 5 0 R /Contents 6 0 R "
            b"/MediaBox [ 0 0 612 792 ] >>"),
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2), c2),
    }
    r = extract_text(_wrap_pdf(objs))
    assert r.n_pages == 2
    assert r.pages == ["alpha", "alpha\nbeta"]


def test_indirect_length_and_flate():
    raw = b"BT /F1 12 Tf 72 700 Td (compressed indirectly) Tj ET"
    data = zlib.compress(raw, 6)
    objs = _page_objs(b"")
    objs[4] = (b"<< /Length 5 0 R /Filter /FlateDecode >>\nstream\n" +
               data + b"\nendstream")
    objs[5] = b"%d" % len(data)
    r = extract_text(_wrap_pdf(objs))
    assert r.text == "compressed indirectly"


def test_obj_pattern_inside_stream_ignored():
    # binary stream data containing "9 0 obj" must not poison the scan
    poison = b"garbage 9 0 obj << /Type /Catalog >> binary"
    objs = _page_objs(b"BT /F1 12 Tf 72 700 Td (clean) Tj ET")
    objs[8] = (b"<< /Length %d >>\nstream\n%s\nendstream"
               % (len(poison), poison))
    r = extract_text(_wrap_pdf(objs))
    assert r.text == "clean"


def test_unknown_filter_raises_honestly():
    objs = _page_objs(b"xx")
    objs[4] = b"<< /Length 2 /Filter /DCTDecode >>\nstream\nxx\nendstream"
    with pytest.raises(NotImplementedError, match="DCTDecode"):
        extract_text(_wrap_pdf(objs))


def test_flate_predictor_raises_honestly():
    data = zlib.compress(b"BT ET", 6)
    objs = _page_objs(b"")
    objs[4] = (b"<< /Length %d /Filter /FlateDecode "
               b"/DecodeParms << /Predictor 12 >> >>\nstream\n" % len(data)
               + data + b"\nendstream")
    with pytest.raises(NotImplementedError, match="predictor"):
        extract_text(_wrap_pdf(objs))


def test_not_a_pdf_raises():
    with pytest.raises(PdfError, match="%PDF-"):
        extract_text(b"PK\x03\x04 this is a zip")


def test_page_tree_cycle_raises():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 2 0 R ] /Count 1 >>",
    }
    with pytest.raises(PdfError, match="cycle|deep"):
        extract_text(_wrap_pdf(objs))


# --- property tests -----------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_LATIN1 = st.characters(min_codepoint=1, max_codepoint=0xFF)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_LATIN1, max_size=400))
def test_property_roundtrip_normalized(text):
    # whole Latin-1 plane incl. control chars, parens, backslashes;
    # hypothesis words may exceed the wrap width, so compare against
    # the wrapped-lines projection (line breaks are whitespace)
    r = extract_text(render_pdf(text))
    assert r.text.split() == " ".join(wrap_text(text)).split()


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_LATIN1, max_size=400))
def test_property_extractor_never_raises_on_writer_output(text):
    for compress in (True, False):
        r = extract_text(render_pdf(text, compress=compress))
        assert r.n_pages >= 1


# --- Ray stage ----------------------------------------------------------------
def test_pdf_roundtrip_stage(ray_session):
    import pandas as pd
    import ray.data

    from htmlparsersharp_ray.stages.pdf_stage import pdf_roundtrip

    texts = ["alpha beta gamma", "", "one (two) three \\four",
             "word " * 900]
    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": list(range(len(texts))), "text": texts}))
    out = pdf_roundtrip(docs).to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "text", "n_pages", "n_text_ops"]
    for t, got, n_pages in zip(texts, out["text"], out["n_pages"]):
        assert got == " ".join(t.split())
        assert n_pages >= 1
    # the 900-word doc wraps to ceil(900/14)=65 lines → 2 pages
    assert out["n_pages"].tolist() == [1, 1, 1, 2]
