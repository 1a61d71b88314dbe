"""Chunk-boundary streaming feed (html/feed.py) equality gates.

The FeedParser must match the one-shot ``parse()`` BIT-FOR-BIT on any
chunking: same serialized tree, same error count, same doc mode, same
token count. The fixture corpus (tests/fixtures/*.dat — entities,
comments, doctypes, rawtext/rcdata, script escapes, EOF matrix, foreign
content) is the differential harness: every case parses at several
chunk sizes including 1 (every construct straddles a boundary).
"""

from __future__ import annotations

import glob
import os

import pytest

from htmlparsersharp_ray.html import parse, serialize_tree
from htmlparsersharp_ray.html.feed import FeedParser, parse_chunked

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


def _cases():
    """(input, ) pairs from every .dat fixture file (document cases
    only — fragment context cases exercise parse_fragment, which the
    feed does not wrap)."""
    out = []
    for path in sorted(glob.glob(os.path.join(FIXDIR, "*.dat"))):
        with open(path, encoding="utf-8") as f:
            body = f.read()
        for block in body.split("\n\n#data\n"):
            if block.startswith("#data\n"):
                block = block[len("#data\n"):]
            data, sep, rest = block.partition("\n#errors")
            if not sep:
                continue
            if "#document-fragment" in rest:
                continue
            out.append(bytes(data, "utf-8").decode("unicode_escape")
                       if "\\x" in data else data)
    return out


_ALL = _cases()


def _signature(result):
    return (serialize_tree(result.root), result.errors, result.doc_mode,
            result.tokens)


@pytest.mark.parametrize("chunk_size", [1, 2, 3, 7, 64])
def test_fixture_corpus_chunked_equals_whole(chunk_size, ray_session):
    assert len(_ALL) > 200  # the corpus really loaded
    mismatches = []
    for text in _ALL:
        whole = _signature(parse(text))
        chunked = _signature(parse_chunked(text, chunk_size))
        if whole != chunked:
            mismatches.append((chunk_size, text[:80], whole, chunked))
    assert not mismatches, mismatches[:5]


def test_crlf_straddles_chunk_boundary():
    text = "<pre>a\r\nb\rc</pre>"
    want = _signature(parse(text))
    for k in range(1, len(text)):
        fp = FeedParser()
        fp.feed(text[:k])
        fp.feed(text[k:])
        assert _signature(fp.finish()) == want, k


def test_bom_survives_empty_first_feed():
    """An empty feed() must not consume the one-time BOM strip
    (review-found edge)."""
    fp = FeedParser()
    fp.feed("")
    fp.feed("﻿<p>x")
    assert _signature(fp.finish()) == _signature(parse("﻿<p>x"))


def test_bom_only_stripped_at_stream_start():
    text = "﻿<p>a﻿b</p>"
    want = _signature(parse(text))
    for k in range(1, len(text)):
        assert _signature(parse_chunked(text, k)) == want, k


def test_script_escape_state_survives_boundaries():
    text = ("<script><!-- <script> alert('</script x>') </script>"
            "--></script><p>tail</p>")
    want = _signature(parse(text))
    for k in range(1, len(text)):
        assert _signature(parse_chunked(text, k)) == want, k


def test_rcdata_and_entities_across_boundaries():
    text = ("<title>a &amp; b &notin; c &#x41;&#66 d</title>"
            "<textarea>&amp</textarea><p>&amp x</p>")
    want = _signature(parse(text))
    for k in range(1, len(text)):
        assert _signature(parse_chunked(text, k)) == want, k


def test_quoted_gt_in_attributes_across_boundaries():
    text = ('<div data-x="a>b" data-y=\'c>d\' e=f"g>'
            '<a b=c="d>e">text</div>')
    want = _signature(parse(text))
    for k in range(1, len(text)):
        assert _signature(parse_chunked(text, k)) == want, k


def test_cdata_in_foreign_content_across_boundaries():
    text = "<svg><![CDATA[ x <b> y ]]></svg><p><![CDATA[bogus]]></p>"
    want = _signature(parse(text))
    for k in range(1, len(text)):
        assert _signature(parse_chunked(text, k)) == want, k


def test_unterminated_cdata_streams_with_bounded_carry():
    """Round 5 (VERDICT r4 item 3): a never-closed CDATA island in
    foreign content must STREAM through the resumable CDATA_SECTION
    state — carry bounded by the terminator-prefix holdback (≤ 2
    chars beyond the chunk), never the rest of the document — and the
    result must equal the one-shot parse bit-for-bit."""
    doc = "<svg><![CDATA[" + ("data ]] chu]nk " * (10_000_000 // 15))
    cs = 4096
    fp = FeedParser()
    max_carry = 0
    for off in range(0, len(doc), cs):
        fp.feed(doc[off:off + cs])
        max_carry = max(max_carry, len(fp.carry))
    got = fp.finish()
    want = parse(doc)
    assert max_carry <= cs + 2, max_carry
    assert _signature(got) == _signature(want)

    # terminator straddling every possible split point stays exact
    tail_doc = "<svg><![CDATA[abc]]]>x</svg>done"
    want_sig = _signature(parse(tail_doc))
    for k in range(1, len(tail_doc)):
        assert _signature(parse_chunked(tail_doc, k)) == want_sig, k


def test_unterminated_constructs_hit_real_eof():
    for text in ("<p>a<!-- never closed", "<title>open forever",
                 "<script>var x = '<", "<a href='unclosed",
                 "&#1234", "<!doctype html", "<"):
        want = _signature(parse(text))
        for k in (1, 2, 5):
            assert _signature(parse_chunked(text, k)) == want, (text, k)


_FUZZ_ATOMS = [
    "<p>", "</p>", "<div id=", "'x'", '"y>z"', ">", "text ", "&amp;", "&am",
    "&#65", "&#x4", "1;", "<!--", "-->", "--!>", "<!", "<!dOcTyPe html",
    "<![CDATA[", "]]>", "<script>", "</script>", "<title>", "</title>",
    "<textarea>", "</textarea>", "<style>", "</style>", "<xmp>", "</xmp>",
    "<svg>", "</svg>", "<math>", "</math>", "<table>", "<td>", "</table>",
    "<plaintext>", "<pre>\n", "\r\n", "\r", "\x00", "<", ">", "/", "=", "&",
    "<b><i>", "</b></i>", "<a href='", "<noscript>", "</noscript>",
    "<!-- <script> -->", "<script><!--", "--></script>", "</scr", "ipt>",
    "<iframe>", "</iframe>", "﻿", "é日本", "-", "--", "<sc", "ript>",
    "<ti", "tle>", "</ti", "tle >", "</title x=1>", "<template>",
    "</template>", "<select>", "<option>", "<frameset>", "</frameset>",
    "<noframes>", "</noframes>", "<desc>", "<foreignObject>",
    "<annotation-xml encoding=text/html>", "<mtext>",
    "<!doctype html public '", "x' 'y", "'>", '<a b=c="d>e">',
    '<a b="x"="y>',
]


def test_fuzz_markup_soup_random_chunkings():
    """Seeded differential fuzz: random atom-soup documents × random
    chunk splits must match the one-shot parse bit-for-bit. The full
    36k-parse campaign (seeds 42/1234, N=4000/12000) ran clean at
    review time; this seeded slice keeps the gate in CI time."""
    import random

    rng = random.Random(77)
    for _ in range(600):
        text = "".join(rng.choice(_FUZZ_ATOMS)
                       for _ in range(rng.randint(1, 30)))
        want = _signature(parse(text))
        for _ in range(2):
            fp = FeedParser()
            i = 0
            while i < len(text):
                step = rng.randint(1, 11)
                fp.feed(text[i:i + step])
                i += step
            assert _signature(fp.finish()) == want, repr(text)


def test_plaintext_nul_error_once_regardless_of_chunking():
    """PLAINTEXT is terminal → ONE text run → the NUL parse error fires
    once no matter how many chunks carry NULs (fuzz-found)."""
    text = "<plaintext>a\x00b\x00c\x00"
    want = _signature(parse(text))
    for k in range(1, len(text)):
        assert _signature(parse_chunked(text, k)) == want, k


def test_udf_giant_turn_not_truncated():
    """HtmlExtractUDF parses a >2M-char turn FULLY (the old cap would
    have cut it): truncated metric False and tail content present."""
    import pyarrow as pa

    from htmlparsersharp_ray.stages.parse_stage import HtmlExtractUDF

    body = "".join(f"<p>para {i}</p>" for i in range(200_000))
    html = f"<html><body>{body}<p>THE_VERY_END</p></body></html>"
    assert len(html) > 2_000_000
    udf = HtmlExtractUDF()
    out = udf(pa.table({
        "conv_id": pa.array(["c1"]),
        "turn_idx": pa.array([0], pa.int32()),
        "text": pa.array([html]),
    }))
    row = out.to_pylist()[0]
    assert row["metrics"]["truncated"] is False
    assert "THE_VERY_END" in row["extracted_text"]
    assert "para 199999" in row["extracted_text"]


def test_giant_document_parses_fully_in_chunks():
    """A multi-MB document streams through bounded chunks and loses
    nothing (the 2M-char truncation lift, VERDICT r3 item 4)."""
    body = "".join(f"<p id=x{i}>paragraph {i} &amp; more</p>"
                   for i in range(60_000))
    text = f"<html><head><title>t</title></head><body>{body}</body></html>"
    assert len(text) > 2_000_000
    fp = FeedParser()
    step = 1 << 20
    for off in range(0, len(text), step):
        fp.feed(text[off:off + step])
        # carry stays bounded by one construct, not the document
        assert len(fp.carry) < 4096
    result = fp.finish()
    text_nodes = 0
    stack = [result.root]
    while stack:
        node = stack.pop()
        kids = getattr(node, "children", ())
        stack.extend(kids)
        if node.__class__.__name__ == "Text":
            text_nodes += 1
    assert text_nodes >= 60_000
