"""Deterministic minimal PDF 1.4 writer with a real layout pass.

``render_pdf(text)`` wraps the text greedily at a fixed column width,
paginates at a fixed lines-per-page, and emits one content stream per
page (``BT .. Tf/TL/Td (line) Tj T* .. ET``). Output bytes are fully
deterministic (fixed object order, fixed zlib level) so rendered
corpora are content-addressable and re-runs are byte-stable.

Scope boundary: simple Type1/Helvetica text only, Latin-1 payloads
(PDF simple fonts are 8-bit); characters above U+00FF raise ValueError
honestly rather than silently mangling.
"""

from __future__ import annotations

import zlib

PAGE_WIDTH = 612
PAGE_HEIGHT = 792
MARGIN = 72
FONT_SIZE = 11
LEADING = 14

DEFAULT_WRAP_CHARS = 72
DEFAULT_LINES_PER_PAGE = 40


def wrap_text(text: str, width: int = DEFAULT_WRAP_CHARS) -> list[str]:
    """Greedy word wrap at ``width`` characters; words longer than the
    column are hard-broken. Whitespace runs collapse (the layout owns
    inter-word spacing), so extract(render(t)) == whitespace-normalized
    t for every word ≤ ``width`` chars; hard-broken oversized words
    re-extract with whitespace at the break points (inherent to layout
    text extraction — a line break IS whitespace in reading order)."""
    lines: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for word in text.split():
        while len(word) > width:          # hard-break oversized words
            if cur:
                lines.append(" ".join(cur))
                cur, cur_len = [], 0
            lines.append(word[:width])
            word = word[width:]
        if not word:
            continue
        add = len(word) + (1 if cur else 0)
        if cur_len + add > width:
            lines.append(" ".join(cur))
            cur, cur_len = [word], len(word)
        else:
            cur.append(word)
            cur_len += add
    if cur:
        lines.append(" ".join(cur))
    return lines


def _escape_string(s: str) -> bytes:
    """Latin-1 encode + escape for a PDF literal string."""
    try:
        raw = s.encode("latin-1")
    except UnicodeEncodeError as exc:
        raise ValueError(
            "render_pdf supports Latin-1 text only (simple 8-bit fonts); "
            f"got non-Latin-1 character: {exc.object[exc.start:exc.end]!r}"
        ) from None
    out = bytearray()
    for b in raw:
        if b in (0x28, 0x29, 0x5C):      # ( ) backslash
            out.append(0x5C)
            out.append(b)
        elif b in (0x0A, 0x0D, 0x09, 0x08, 0x0C):
            out += {0x0A: b"\\n", 0x0D: b"\\r", 0x09: b"\\t",
                    0x08: b"\\b", 0x0C: b"\\f"}[b]
        else:
            out.append(b)
    return bytes(out)


def _page_content(lines: list[str]) -> bytes:
    parts = [b"BT /F1 %d Tf %d TL %d %d Td" %
             (FONT_SIZE, LEADING, MARGIN, PAGE_HEIGHT - MARGIN)]
    first = True
    for line in lines:
        if not first:
            parts.append(b"T*")
        first = False
        parts.append(b"(" + _escape_string(line) + b") Tj")
    parts.append(b"ET")
    return b" ".join(parts)


def render_pdf(text: str, *, wrap_chars: int = DEFAULT_WRAP_CHARS,
               lines_per_page: int = DEFAULT_LINES_PER_PAGE,
               compress: bool = True) -> bytes:
    """Render ``text`` to deterministic single-font PDF bytes."""
    lines = wrap_text(text, wrap_chars)
    pages = [lines[i:i + lines_per_page]
             for i in range(0, len(lines), lines_per_page)] or [[]]

    # Object numbering: 1 Catalog, 2 Pages, 3 Font, then per page
    # (page obj, content obj) in document order.
    n_pages = len(pages)
    objs: dict[int, bytes] = {}
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (b"<< /Type /Pages /Kids [ " + kids +
               b" ] /Count %d >>" % n_pages)
    objs[3] = (b"<< /Type /Font /Subtype /Type1 "
               b"/BaseFont /Helvetica >>")
    for i, page_lines in enumerate(pages):
        page_num, content_num = 4 + 2 * i, 5 + 2 * i
        objs[page_num] = (
            b"<< /Type /Page /Parent 2 0 R "
            b"/MediaBox [ 0 0 %d %d ] " % (PAGE_WIDTH, PAGE_HEIGHT) +
            b"/Resources << /Font << /F1 3 0 R >> >> "
            b"/Contents %d 0 R >>" % content_num)
        data = _page_content(page_lines)
        if compress:
            data = zlib.compress(data, 6)   # fixed level: deterministic
            head = (b"<< /Length %d /Filter /FlateDecode >>" % len(data))
        else:
            head = b"<< /Length %d >>" % len(data)
        objs[content_num] = head + b"\nstream\n" + data + b"\nendstream"

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(buf)
    n_objs = max(objs) + 1
    buf += b"xref\n0 %d\n" % n_objs
    buf += b"0000000000 65535 f \n"
    for num in range(1, n_objs):
        buf += b"%010d 00000 n \n" % offsets[num]
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (n_objs, xref_at))
    return bytes(buf)
