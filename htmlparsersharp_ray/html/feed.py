"""Chunk-boundary streaming parse feed.

The reference tokenizes its input in buffer-sized pieces, suspending the
state machine at buffer boundaries (reference: SimpleHtmlParser.cs:93-162
tokenize loop, Tokenizer.cs:1303-1365 buffer suspension). This module is
the engine's equivalent at CONSTRUCT granularity: ``FeedParser.feed``
accepts arbitrary chunks, a conservative boundary scanner finds the
longest prefix in which every markup construct (tag, comment, doctype,
CDATA, character reference, significant raw-text sequence) is COMPLETE,
the real tokenizer consumes that prefix via ``run_span`` (never firing a
spurious EOF path), and the unconsumed tail carries into the next chunk.
``finish()`` runs the remaining carry through the normal EOF matrix.

Memory is O(chunk + largest single construct) — the same bound as the
reference, whose strBuf accumulates one token's text between buffer
loads. A pathological unterminated construct (a 50 MB comment) degrades
to buffering that construct, exactly as the reference's strBuf would.

The scanner never *interprets* markup — it only decides completeness.
Content-model switches (``<script>`` → script data, ``<title>`` →
RCDATA, foreign ``<svg><title>`` staying DATA…) are decided by the real
tree builder: the scanner STOPS after any complete construct that might
switch the content model, yields the prefix to the tokenizer, and
re-reads the tokenizer's actual state before continuing. That removes
every state-simulation hazard by construction.

Equality gate: tests/test_chunked_feed.py parses the whole fixture
corpus at chunk sizes 1..4096 and asserts serialization, error counts
and doc modes are identical to the one-shot ``parse``.
"""

from __future__ import annotations

import re

from .parser import ParseResult
from .tokenizer import (
    CDATA_SECTION,
    DATA,
    PLAINTEXT,
    RAWTEXT,
    RCDATA,
    SCRIPT_DATA,
    Tokenizer,
)
from .treebuilder import TreeBuilder

_MARKER = re.compile(r"[<&]")
_LT = re.compile(r"<")

# -- scan_data fast path (round 5, VERDICT r4 item 5) ----------------------
# Any substring that could make the tree builder switch the tokenizer out
# of DATA: a content-model-sensitive START-tag name followed by a name
# delimiter, or a CDATA opener. Case-insensitive throughout — the CDATA
# probe thereby also matches non-CDATA case variants, which merely
# disables the fast path (conservative; the slow loop decides).
_CM_ANCHOR = re.compile(
    r"<(?:title|textarea|style|xmp|iframe|noembed|noframes|script"
    r"|noscript|plaintext)[\t\n\f />]"
    r"|<!\[CDATA\[",
    re.I,
)

# One C-speed match consuming a RUN of plainly-complete DATA constructs —
# sound by construction: every alternative consumes exactly the span the
# per-construct loop would consume (verified by the chunking-equality
# fuzz gates), and anything irregular (ws before a quoted value, '=' in
# a tag name, '<!-->', partial constructs at the window edge…) simply
# fails the alternative and falls back to the per-construct loop from
# that position. Atomic groups kill the backtracking blowups the nested
# quantifiers would otherwise allow on doomed suffixes. Only valid in a
# window with NO _CM_ANCHOR match (no content-model switch possible).
_SAFE_RUN = re.compile(r"""
    (?: (?>[^<&]+)                                # plain text
      | </?(?>[A-Za-z][^\t\n\f\x20/>=]*)          # tag name ('=' declines)
        (?>(?:[\t\n\f\x20/]+                      # separators
              (?:[^\t\n\f\x20/><"'=]+             # attribute name
                 (?:=(?:"[^"]*"|'[^']*'           # =quoted value
                      |(?:[^\t\n\f\x20>"']        # =unquoted value: must
                          [^\t\n\f\x20>]*)?))?    #  not START with a quote
              )?
           )*)
        >
      | &(?>[A-Za-z0-9]+);                        # terminated named ref
      | <!--(?:>|->                               # abrupt-closing comment
           |(?>(?:[^-]|-(?!-!?>))*)--!?>)         # comment, first -->/--!>
      | &\#(?>[0-9]+);                            # terminated dec ref
      | &\#[xX](?>[0-9A-Fa-f]+);                  # terminated hex ref
    )+
""", re.X)
_DEC_RUN = re.compile(r"[0-9]+")
_HEX_RUN = re.compile(r"[0-9A-Fa-f]+")
_ALNUM_RUN = re.compile(r"[0-9A-Za-z]+")
_NAME_RUN = re.compile(r"[^\t\n\f />\x00]+")  # mirrors tokenizer tag names
_END_NAME = re.compile(r"[A-Za-z][^\t\n\f />]*")  # mirrors _END_TAG_NAME

# start tags that may make the tree builder switch the content model
# (title/textarea → RCDATA; style/xmp/iframe/noembed/noframes[/noscript]
# → RAWTEXT; script → script data; plaintext → PLAINTEXT). The scanner
# stops after any of these and lets the real tree builder decide — in
# foreign content it will NOT switch, and the scanner just continues in
# DATA.
_CM_SENSITIVE = frozenset((
    "title", "textarea", "style", "xmp", "iframe", "noembed",
    "noframes", "script", "noscript", "plaintext",
))

_WS = "\t\n\f "


def _tag_end(text: str, pos: int, n: int) -> int | None:
    """Index just past the '>' that really closes a tag whose name
    starts at ``pos``, or None if the tag is not complete in ``text``.

    A faithful miniature of the WHATWG attribute automaton: the ONLY
    job is deciding which '>' closes the tag, so it tracks exactly the
    states that control quoting — a quote character opens a quoted
    value only in before-attribute-value position (directly after an
    '=' that terminated an attribute name), never inside an unquoted
    value ('<a b=c"d>' closes at '>') and never after a closed quoted
    value ('<a b="x"="y>' closes at '>': the '=' reconsumes as a new
    attribute NAME per spec, so '"y' is name text)."""
    BETWEEN, NAME, AFTERNAME, AFTEREQ, UNQ, AFTERQ = range(6)
    state = NAME
    i = pos
    while i < n:
        c = text[i]
        if state == NAME:
            if c == ">":
                return i + 1
            if c == "=":
                state = AFTEREQ
            elif c in _WS:
                state = AFTERNAME
            elif c == "/":
                state = BETWEEN
        elif state == BETWEEN:
            if c == ">":
                return i + 1
            if c == "=":
                state = NAME  # unexpected-equals: starts a name
            elif c not in _WS and c != "/":
                state = NAME
        elif state == AFTERNAME:
            if c == ">":
                return i + 1
            if c == "=":
                state = AFTEREQ
            elif c == "/":
                state = BETWEEN
            elif c not in _WS:
                state = NAME
        elif state == AFTEREQ:
            if c == ">":
                return i + 1
            if c == '"' or c == "'":
                j = text.find(c, i + 1, n)
                if j == -1:
                    return None
                i = j
                state = AFTERQ
            elif c not in _WS:
                state = UNQ
        elif state == UNQ:
            if c == ">":
                return i + 1
            if c in _WS:
                state = BETWEEN
        else:  # AFTERQ
            if c == ">":
                return i + 1
            if c in _WS or c == "/":
                state = BETWEEN
            else:
                state = NAME  # incl. '=': reconsumed as a new name
        i += 1
    return None


def _entity_bounded(text: str, i: int, n: int) -> int | None:
    """'&' at ``i``: a position at/after the construct's true end with
    no markers skipped, or None when the reference could still grow
    past ``n`` (hold back)."""
    j = i + 1
    if j >= n:
        return None
    c = text[j]
    if c == "#":
        k = j + 1
        if k >= n:
            return None
        run = _HEX_RUN if text[k] in "xX" else _DEC_RUN
        if text[k] in "xX":
            k += 1
            if k >= n:
                return None
        m = run.match(text, k)
        if m is None:
            return k  # absence-of-digits: construct ends here
        if m.end() >= n:
            return None  # digits touch the boundary: could grow
        return m.end()  # ';' (if any) holds no markers
    m = _ALNUM_RUN.match(text, j)
    if m is None:
        return j  # bare '&' text
    if m.end() >= n:
        return None  # name run touches the boundary
    return m.end()


def _cdata_holdback(text: str, start: int, n: int) -> int:
    """Length of the longest suffix of ``text[start:n]`` that is a
    proper prefix of ']]>' — the characters that must carry to the next
    chunk because the terminator could complete across the boundary."""
    if text.endswith("]]", start, n):
        return 2
    if text.endswith("]", start, n):
        return 1
    return 0


class _Scanner:
    """State-aware completeness scanner; one instance per FeedParser so
    it can ask the sink about CDATA context exactly like the
    tokenizer does."""

    def __init__(self, tokenizer: Tokenizer):
        self.tok = tokenizer

    # -- DATA ---------------------------------------------------------------
    def scan_data(self, text: str, pos: int, n: int) -> int:
        """Return safe_end. ``safe_end == pos`` means hold everything
        back. The scanners RETURN EARLY after any construct whose
        interpretation depends on tree-builder state (content-model-
        sensitive tag, CDATA, rawtext end tag) — the feed loop then
        hands the prefix to the tokenizer and re-reads the real state
        before the next scan.

        Fast path (round 5): up to the next content-model anchor, one
        _SAFE_RUN regex match consumes a whole run of plainly-complete
        constructs at C speed; the per-construct loop handles whatever
        the regex declines and everything at/after the anchor."""
        p = pos
        fast_until = -1  # lazily (re)computed anchor bound
        while True:
            if p >= fast_until:
                m0 = _CM_ANCHOR.search(text, p, n)
                fast_until = m0.start() if m0 else n
            if p < fast_until:
                fm = _SAFE_RUN.match(text, p, fast_until)
                if fm is not None and fm.end() > p:
                    p = fm.end()
                    if p >= n:
                        return n
            m = _MARKER.search(text, p, n)
            if m is None:
                return n
            i = m.start()
            if text[i] == "&":
                e = _entity_bounded(text, i, n)
                if e is None:
                    return i
                p = e
                continue
            # '<'
            i1 = i + 1
            if i1 >= n:
                return i
            c = text[i1]
            if c == "!":
                if text[i:i + 9] == "<![CDATA[" or (
                        n - i < 9 and "<![CDATA[".startswith(text[i:n])):
                    # CDATA-vs-bogus depends on the tree builder's
                    # foreign-content state; if unfed constructs precede
                    # this position, yield them first so the sink is
                    # current before cdata_allowed() is consulted
                    if i > pos:
                        return i
                e, stop = self._bang(text, i, n)
                if e is None:
                    return i
                if stop:
                    return e
                p = e
            elif c == "/":
                i2 = i + 2
                if i2 >= n:
                    return i
                if text[i2].isascii() and text[i2].isalpha():
                    e = _tag_end(text, i2, n)
                    if e is None:
                        return i
                    p = e
                else:
                    # '</>' drops, else bogus comment: ends at first '>'
                    g = text.find(">", i2, n)
                    if g == -1:
                        return i
                    p = g + 1
            elif c.isascii() and c.isalpha():
                nm = _NAME_RUN.match(text, i1)
                name_end = nm.end() if nm else i1
                e = _tag_end(text, i1, n)
                if e is None:
                    return i
                if text[i1:name_end].lower() in _CM_SENSITIVE:
                    return e
                p = e
            elif c == "?":
                g = text.find(">", i1, n)
                if g == -1:
                    return i
                p = g + 1
            else:
                p = i1  # '<' is text
            # loop continues scanning from p

    def _bang(self, text: str, i: int, n: int):
        """Classify '<!' at ``i``. Returns (end | None, stop) — stop
        means the construct's handling consulted sink state (CDATA),
        so the prefix must be fed before scanning further."""
        if text.startswith("<!--", i):
            e1 = text.find("-->", i + 2, n)
            # a '--!>' ending matters only if it ends BEFORE the '-->'
            # end, so bound its search window by e1 — an unbounded
            # second scan made dense-comment buffers quadratic
            e2 = text.find("--!>", i + 4,
                           n if e1 == -1 else min(n, e1 + 4))
            ends = [x for x in (e1 + 3 if e1 != -1 else None,
                                e2 + 4 if e2 != -1 else None)
                    if x is not None]
            if not ends:
                return None, False
            return min(ends), False
        rest = text[i + 2:i + 9]
        if rest.lower() == "doctype":
            g = text.find(">", i + 2, n)
            if g == -1:
                return None, False
            return g + 1, False
        if rest == "[CDATA[":
            if self.tok.sink.cdata_allowed():
                g = text.find("]]>", i + 9, n)
                if g == -1:
                    # STREAM (round 5): no terminator in the buffer —
                    # feed the opener plus the available content now
                    # (the tokenizer enters the resumable CDATA_SECTION
                    # state; scan_cdata consumes the rest), holding
                    # back only a trailing prefix of ']]>' so the
                    # terminator can never straddle a boundary. A
                    # never-closed CDATA island no longer buffers the
                    # remainder of the document.
                    return max(i + 9, n - _cdata_holdback(text, i + 9, n)), True
                # yield: the tokenizer must process the CDATA while the
                # sink is still in the foreign context the scanner saw
                return g + 3, True
            g = text.find(">", i + 2, n)
            if g == -1:
                return None, False
            return g + 1, True
        # could this still become '<!--', '<!DOCTYPE' or '<![CDATA['
        # with more input? if the available tail is a prefix of any of
        # them, hold back; else it is a bogus comment ending at '>'
        tail = text[i:n]
        if len(tail) < 9 and (
            "<!--".startswith(tail)
            or "<!doctype".startswith(tail.lower())
            or "<![CDATA[".startswith(tail)
        ):
            return None, False
        g = text.find(">", i + 2, n)
        if g == -1:
            return None, False
        return g + 1, False

    # -- RCDATA / RAWTEXT ---------------------------------------------------
    def scan_rcdata(self, text: str, pos: int, n: int,
                    entities: bool) -> int:
        tok = self.tok
        expected = tok.expected_end_tag or tok.last_start_tag
        p = pos
        marker = _MARKER if entities else _LT
        while True:
            m = marker.search(text, p, n)
            if m is None:
                return n
            i = m.start()
            if text[i] == "&":
                e = _entity_bounded(text, i, n)
                if e is None:
                    return i
                p = e
                continue
            if not text.startswith("</", i):
                if i + 1 >= n:
                    return i  # lone '<' at boundary
                p = i + 1
                continue
            nm = _END_NAME.match(text, i + 2)
            if nm is None:
                if i + 2 >= n:
                    return i
                p = i + 2
                continue
            if nm.end() >= n:
                return i  # name touches boundary: could grow
            if expected is None or nm.group().lower() != expected:
                p = i + 1
                continue
            # appropriate end tag: whole tag must be complete
            e = _tag_end(text, i + 2, n)
            if e is None:
                return i
            return e  # yield: state returns to DATA

    # -- CDATA_SECTION ------------------------------------------------------
    def scan_cdata(self, text: str, pos: int, n: int) -> int:
        """Inside a CDATA section (resumable tokenizer state): consume
        to just past ']]>' when present, else everything except a
        trailing prefix of the terminator."""
        g = text.find("]]>", pos, n)
        if g != -1:
            return g + 3  # yield: the tokenizer returns to DATA
        return max(pos, n - _cdata_holdback(text, pos, n))

    # -- SCRIPT_DATA --------------------------------------------------------
    def scan_script(self, text: str, pos: int, n: int) -> int:
        """Script data incl. escape machinery. The tokenizer's escape
        sub-state is resumable across chunks (instance fields), so the
        only boundary hazards are '<'-anchored lookaheads (≤ 9 chars:
        '</script' + delimiter, '<script' + delimiter, '<!--') and the
        end-tag construct itself."""
        tok = self.tok
        expected = tok.expected_end_tag or "script"
        p = pos
        while True:
            m = _LT.search(text, p, n)
            if m is None:
                return n
            i = m.start()
            if n - i <= len(expected) + 3:
                # a partial '</script', '<script' or '<!--' could
                # complete in the next chunk
                return i
            if text.startswith("</", i):
                nm = _END_NAME.match(text, i + 2)
                if nm and nm.end() < n and nm.group().lower() == expected:
                    e = _tag_end(text, i + 2, n)
                    if e is None:
                        return i
                    # return early: whether this REALLY ends the
                    # depends on the escape sub-state — let the
                    # tokenizer decide and re-read the state after
                    return e
            p = i + 1


class FeedParser:
    """Incremental document parser: ``feed(chunk)`` any number of times,
    then ``finish()`` → ParseResult. Matches ``parse()`` bit-for-bit on
    any chunking (differential-gated over the fixture corpus).

    ``track_positions`` is not supported in chunked mode (offsets are
    chunk-relative); use ``parse()`` for locator output."""

    def __init__(self, scripting: bool = False,
                 ignore_comments: bool = False,
                 max_open_depth: int | None = 512,
                 max_nodes: int | None = 4_000_000):
        self.builder = TreeBuilder(scripting=scripting,
                                   ignore_comments=ignore_comments)
        self.builder.max_open_depth = max_open_depth
        self.builder.max_nodes = max_nodes
        self.tok = Tokenizer(self.builder)
        self.builder.tokenizer = self.tok
        self.scanner = _Scanner(self.tok)
        self.carry = ""
        self.cr_carry = False
        self.first = True
        self.finished = False

    def _preprocess_chunk(self, chunk: str) -> str:
        if self.first and chunk:
            # the one-time BOM strip must not be consumed by an EMPTY
            # first feed() — the stream start is the first nonempty
            # chunk (review-found edge)
            self.first = False
            if chunk.startswith("﻿"):
                chunk = chunk[1:]
        if self.cr_carry:
            # previous chunk ended in '\r' (held back): it folds with a
            # leading '\n' here, or becomes a lone-CR '\n' otherwise
            self.cr_carry = False
            if chunk.startswith("\n"):
                chunk = chunk[1:]
            chunk = "\n" + chunk
        if chunk.endswith("\r"):
            self.cr_carry = True
            chunk = chunk[:-1]
        if "\r" in chunk:
            chunk = chunk.replace("\r\n", "\n").replace("\r", "\n")
        return chunk

    def feed(self, chunk: str):
        if self.finished:
            raise ValueError("feed() after finish()")
        chunk = self._preprocess_chunk(chunk)
        buf = self.carry + chunk if self.carry else chunk
        n = len(buf)
        pos = 0
        tok = self.tok
        scanner = self.scanner
        while pos < n:
            state = tok.state
            if state == PLAINTEXT:
                end = n
            elif state == DATA:
                end = scanner.scan_data(buf, pos, n)
            elif state == RCDATA:
                end = scanner.scan_rcdata(buf, pos, n, True)
            elif state == RAWTEXT:
                end = scanner.scan_rcdata(buf, pos, n, False)
            elif state == CDATA_SECTION:
                end = scanner.scan_cdata(buf, pos, n)
            else:  # SCRIPT_DATA
                end = scanner.scan_script(buf, pos, n)
            if end == pos:
                break  # incomplete construct at pos: hold back
            seg = buf[pos:end]
            tok.run_span(seg, 0, len(seg))
            pos = end
            # loop re-reads tok.state (content model may have switched)
        self.carry = buf[pos:]

    def finish(self) -> ParseResult:
        if self.finished:
            raise ValueError("finish() called twice")
        self.finished = True
        tail = self.carry
        if self.cr_carry:
            tail += "\n"
        self.carry = ""
        self.tok.run(tail)  # genuine EOF matrix on the remainder
        b = self.builder
        result = ParseResult(b.doc, self.tok.errors + b.errors, b.doc.mode,
                             b.token_count, b.encoding_declared, None, None,
                             b.warnings)
        result.content_capped = b.depth_capped or b.node_capped
        return result


def parse_chunked(text: str, chunk_size: int,
                  scripting: bool = False,
                  ignore_comments: bool = False) -> ParseResult:
    """Parse via the chunked feed in ``chunk_size`` pieces — the bounded
    memory path for giant documents, and the differential harness for
    the equality gate."""
    fp = FeedParser(scripting=scripting, ignore_comments=ignore_comments)
    for off in range(0, len(text), chunk_size):
        fp.feed(text[off:off + chunk_size])
    return fp.finish()
