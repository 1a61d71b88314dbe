"""From-scratch PDF text extractor (layout parse) — pure stdlib.

Pipeline per document: byte-level object-syntax tokenizer → indirect-
object scan (xref-recovery style: every ``N G obj`` in the file is
parsed, later generations win, so broken/absent xref tables don't
matter) → trailer /Root → page-tree walk (/Pages//Kids recursion with
cycle guard) → per-page content-stream decode (none / FlateDecode /
ASCIIHexDecode; anything else raises NotImplementedError honestly) →
text-operator interpretation (BT/ET, Tf, TL, Td/TD/Tm/T*, Tj/TJ/'/")
tracking the text-line matrix → layout reconstruction: chunks grouped
into lines by y (±``LINE_Y_TOL``), lines sorted top-to-bottom, chunks
left-to-right, with a width-estimate gap heuristic deciding inter-chunk
spaces (no embedded font metrics in simple PDFs, so the standard
~0.5 em average-width estimate is used, as in pdfminer/pdftotext).

Strings decode as Latin-1 (simple 8-bit fonts); literal-string escape
handling (\\n \\( \\ddd, line continuations, nested parens) and hex
strings follow PDF 32000-1 §7.3.4.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMS = b"()<>[]{}/%"

LINE_Y_TOL = 2.0          # chunks within 2pt vertically = same line
AVG_CHAR_EM = 0.5         # Helvetica-ish average advance per char (em)
GAP_SPACE_EM = 0.25       # x gap beyond estimated width that means "space"
TJ_SPACE_MILLIEM = 180.0  # TJ kern offset (thousandths of em) that means "space"


class PdfError(ValueError):
    pass


@dataclass
class PdfText:
    text: str          # lines joined with \n, pages concatenated
    pages: list[str]   # per-page text
    n_pages: int
    n_text_ops: int    # Tj/TJ/'/" operators interpreted


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Name(str):
    """A /Name token (distinct from a string literal)."""


class _Keyword(str):
    """A bare keyword/operator token (obj, stream, Tj, ...)."""


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_KEYWORD_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


class _Lexer:
    """Tokenizer over PDF object syntax (PDF 32000-1 §7.2-7.3)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        data, pos, n = self.data, self.pos, len(self.data)
        while pos < n:
            c = data[pos]
            if c in WHITESPACE:
                pos += 1
            elif c == 0x25:  # % comment to EOL
                while pos < n and data[pos] not in (0x0A, 0x0D):
                    pos += 1
            else:
                break
        self.pos = pos

    def next_token(self):
        """Returns one of: int, float, bytes (string), _Name, _Keyword,
        list, dict, None-sentinel _Keyword('null'), or None at EOF."""
        self._skip_ws()
        data, pos, n = self.data, self.pos, len(self.data)
        if pos >= n:
            return None
        c = data[pos]
        if c == 0x28:                       # ( literal string
            return self._literal_string()
        if c == 0x3C:                       # < : dict or hex string
            if data[pos:pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == 0x5B:                       # [ array
            return self._array()
        if c == 0x5D:                       # ] — surfaced to callers
            self.pos += 1
            return _Keyword("]")
        if c == 0x3E and data[pos:pos + 2] == b">>":
            self.pos += 2
            return _Keyword(">>")
        if c == 0x2F:                       # /Name
            return self._name()
        if c == 0x7B or c == 0x7D:          # { } (PostScript procs)
            self.pos += 1
            return _Keyword(chr(c))
        m = _NUM_RE.match(data, pos)
        if m and (48 <= c <= 57 or c in (0x2B, 0x2D, 0x2E)):
            self.pos = m.end()
            s = m.group()
            return float(s) if b"." in s else int(s)
        m = _KEYWORD_RE.match(data, pos)
        if m:
            self.pos = m.end()
            return _Keyword(m.group().decode("latin-1"))
        raise PdfError(f"lexer stuck at byte {pos}: {data[pos:pos+8]!r}")

    def _literal_string(self) -> bytes:
        data, pos, n = self.data, self.pos + 1, len(self.data)
        out = bytearray()
        depth = 1
        while pos < n:
            c = data[pos]
            if c == 0x5C:                   # backslash escape
                pos += 1
                if pos >= n:
                    break
                e = data[pos]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\x0c"}[e]
                    pos += 1
                elif e in b"()\\":
                    out.append(e)
                    pos += 1
                elif 0x30 <= e <= 0x37:     # \ddd octal, 1-3 digits
                    oct_digits = bytearray()
                    while (pos < n and len(oct_digits) < 3
                           and 0x30 <= data[pos] <= 0x37):
                        oct_digits.append(data[pos])
                        pos += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                elif e in (0x0A, 0x0D):     # line continuation
                    pos += 1
                    if e == 0x0D and pos < n and data[pos] == 0x0A:
                        pos += 1
                else:                       # \x → x per spec
                    out.append(e)
                    pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
                out.append(c)
                pos += 1
            elif c == 0x0D:                 # raw EOL normalizes to \n
                out.append(0x0A)
                pos += 1
                if pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(c)
                pos += 1
        self.pos = pos
        return bytes(out)

    def _hex_string(self) -> bytes:
        data, pos, n = self.data, self.pos + 1, len(self.data)
        digits = bytearray()
        while pos < n and data[pos] != 0x3E:
            c = data[pos]
            if c not in WHITESPACE:
                digits.append(c)
            pos += 1
        self.pos = pos + 1
        if len(digits) % 2:
            digits.append(0x30)             # odd count: pad with 0
        try:
            return bytes.fromhex(digits.decode("ascii"))
        except ValueError as exc:
            raise PdfError(f"bad hex string: {exc}") from None

    def _name(self) -> _Name:
        data, pos, n = self.data, self.pos + 1, len(self.data)
        out = bytearray()
        while pos < n:
            c = data[pos]
            if c in WHITESPACE or c in DELIMS:
                break
            if c == 0x23 and pos + 2 < n:   # #xx hex escape
                try:
                    out.append(int(data[pos + 1:pos + 3], 16))
                    pos += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            pos += 1
        self.pos = pos
        return _Name(out.decode("latin-1"))

    def _array(self) -> list:
        self.pos += 1
        out = []
        while True:
            tok = self.next_token()
            if tok is None:
                raise PdfError("EOF inside array")
            if isinstance(tok, _Keyword):
                if tok == "]":
                    return out
                if tok == "R" and len(out) >= 2:
                    gen, num = out.pop(), out.pop()
                    if isinstance(num, int) and isinstance(gen, int):
                        out.append(_Ref(num))
                        continue
                    out += [num, gen]
                if tok in ("true", "false", "null"):
                    out.append({"true": True, "false": False,
                                "null": None}[tok])
                    continue
                raise PdfError(f"unexpected keyword {tok!r} in array")
            else:
                out.append(tok)

    def _dict(self) -> dict:
        self.pos += 2
        out: dict = {}
        pending: list = []
        while True:
            tok = self.next_token()
            if tok is None:
                raise PdfError("EOF inside dict")
            if isinstance(tok, _Keyword):
                if tok == ">>":
                    break
                if tok == "R" and len(pending) >= 2:
                    gen, num = pending.pop(), pending.pop()
                    pending.append(_Ref(num))
                    continue
                if tok in ("true", "false", "null"):
                    pending.append({"true": True, "false": False,
                                    "null": None}[tok])
                    continue
                raise PdfError(f"unexpected keyword {tok!r} in dict")
            pending.append(tok)
        # pending is an alternating key/value flat list
        it = iter(pending)
        for key in it:
            try:
                val = next(it)
            except StopIteration:
                break
            if isinstance(key, _Name):
                out[str(key)] = val
        return out

    def next_object(self):
        """Like next_token but folds trailing `N G R` reference triples
        at top level (needed when parsing object bodies)."""
        tok = self.next_token()
        if isinstance(tok, int):
            save = self.pos
            tok2 = self.next_token()
            if isinstance(tok2, int):
                save2 = self.pos
                tok3 = self.next_token()
                if isinstance(tok3, _Keyword) and tok3 == "R":
                    return _Ref(tok)
                self.pos = save2
                # push back is impossible for tok2; callers of
                # next_object only use it where a single object is
                # expected, so rewind fully:
                self.pos = save
                return tok
            self.pos = save
            return tok
        if isinstance(tok, _Keyword) and tok in ("true", "false", "null"):
            return {"true": True, "false": False, "null": None}[tok]
        return tok


class PdfDocument:
    """Parsed indirect-object map + page tree."""

    def __init__(self, data: bytes):
        self.data = data
        self.objects: dict[int, object] = {}
        self._scan_objects()
        self.root = self._find_root()

    # --- object scan (xref-recovery style) -------------------------------
    def _scan_objects(self) -> None:
        data = self.data
        covered_end = 0   # high-water mark of consumed stream bytes:
        # `N G obj` patterns DO occur inside compressed stream data at
        # corpus scale; any match starting inside a stream we already
        # read is binary noise, not an object.
        for m in _OBJ_RE.finditer(data):
            if m.start() < covered_end:
                continue
            num = int(m.group(1))
            lex = _Lexer(data, m.end())
            try:
                obj = lex.next_object()
            except PdfError:
                continue
            if isinstance(obj, dict):
                save = lex.pos
                tok = lex.next_token()
                if isinstance(tok, _Keyword) and tok == "stream":
                    raw, end_abs = self._read_stream_raw(lex, obj)
                    covered_end = max(covered_end, end_abs)
                    self.objects[num] = _Stream(obj, raw)
                    continue
                lex.pos = save
            self.objects[num] = obj

    def _read_stream_raw(self, lex: _Lexer, d: dict) -> tuple[bytes, int]:
        data = self.data
        pos = lex.pos
        # after `stream`: CRLF or LF, then exactly /Length bytes
        if data[pos:pos + 2] == b"\r\n":
            pos += 2
        elif data[pos:pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = d.get("Length")
        if isinstance(length, _Ref):
            length = self.objects.get(length.num)
        if isinstance(length, int) and 0 <= length <= len(data) - pos:
            end = pos + length
            tail = data[end:end + 20].lstrip(b"\r\n ")
            if tail.startswith(b"endstream"):
                return data[pos:end], end
        # /Length missing/wrong/indirect-forward: recover by scanning
        end = data.find(b"endstream", pos)
        if end < 0:
            raise PdfError("unterminated stream")
        return data[pos:end].rstrip(b"\r\n"), end

    # --- trailer / root ---------------------------------------------------
    def _find_root(self) -> dict:
        data = self.data
        root_ref = None
        for m in re.finditer(rb"trailer\b", data):
            lex = _Lexer(data, m.end())
            try:
                d = lex.next_token()
            except PdfError:
                continue
            if isinstance(d, dict) and "Root" in d:
                root_ref = d["Root"]        # last trailer wins
        if root_ref is None:                # fallback: scan for Catalog
            for obj in self.objects.values():
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    return obj
            raise PdfError("no trailer /Root and no /Catalog object")
        root = self.resolve(root_ref)
        if not isinstance(root, dict):
            raise PdfError("/Root does not resolve to a dictionary")
        return root

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, _Ref):
            obj = self.objects.get(obj.num)
            seen += 1
            if seen > 32:
                raise PdfError("reference cycle")
        return obj

    # --- page tree ---------------------------------------------------------
    def pages(self) -> list[dict]:
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node_obj, depth: int) -> None:
            if depth > 64:
                raise PdfError("page tree too deep")
            node = self.resolve(node_obj)
            if not isinstance(node, dict):
                return
            ident = id(node)
            if ident in seen:
                raise PdfError("page tree cycle")
            seen.add(ident)
            t = node.get("Type")
            if t == "Page":
                out.append(node)
            elif t == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid, depth + 1)

        walk(self.root.get("Pages"), 0)
        return out

    # --- stream decode ------------------------------------------------------
    def decoded_stream(self, s: _Stream) -> bytes:
        filters = s.d.get("Filter")
        if filters is None:
            return s.raw
        if not isinstance(filters, list):
            filters = [filters]
        parms = s.d.get("DecodeParms")
        if not isinstance(parms, list):
            parms = [parms] * len(filters)
        data = s.raw
        for f, p in zip(filters, parms):
            f = str(self.resolve(f))
            p = self.resolve(p)
            if f == "FlateDecode":
                if isinstance(p, dict) and int(p.get("Predictor", 1)) > 1:
                    raise NotImplementedError(
                        "FlateDecode predictors not supported")
                try:
                    data = zlib.decompress(data)
                except zlib.error as exc:
                    raise PdfError(f"bad Flate stream: {exc}") from None
            elif f == "ASCIIHexDecode":
                digits = bytes(
                    c for c in data.split(b">")[0] if c not in WHITESPACE)
                if len(digits) % 2:
                    digits += b"0"
                data = bytes.fromhex(digits.decode("ascii"))
            else:
                raise NotImplementedError(f"PDF filter {f} not supported")
        return data

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        parts = contents if isinstance(contents, list) else [contents]
        out = []
        for p in parts:
            p = self.resolve(p)
            if isinstance(p, _Stream):
                out.append(self.decoded_stream(p))
        return b"\n".join(out)


# --- content-stream text interpreter ----------------------------------------
_TEXT_OPS = frozenset(("Tj", "TJ", "'", '"'))


def _interpret_page(content: bytes) -> tuple[list[tuple[float, float, float, str]], int]:
    """Run the text operators of one page's content stream.

    Returns (chunks, n_text_ops) where each chunk is
    (y, x_start, x_end_estimate, text)."""
    lex = _Lexer(content)
    stack: list = []
    chunks: list[tuple[float, float, float, str]] = []
    n_ops = 0

    font_size = 12.0
    leading = 0.0
    # text-line matrix origin (we track translation only — rotation /
    # scale would need full CTM composition, out of scope for layout
    # text in simple documents)
    lx = ly = 0.0          # line start
    cx = cy = 0.0          # current position

    def emit(raw: bytes, x: float, y: float) -> float:
        text = raw.decode("latin-1")
        width = len(text) * AVG_CHAR_EM * font_size
        if text:
            chunks.append((y, x, x + width, text))
        return x + width

    while True:
        tok = lex.next_token()
        if tok is None:
            break
        if not isinstance(tok, _Keyword):
            stack.append(tok)
            continue
        op = str(tok)
        if op == "BT":
            lx = ly = cx = cy = 0.0
        elif op == "Tf" and len(stack) >= 2:
            font_size = float(stack[-1])
        elif op == "TL" and stack:
            leading = float(stack[-1])
        elif op == "Td" and len(stack) >= 2:
            lx += float(stack[-2])
            ly += float(stack[-1])
            cx, cy = lx, ly
        elif op == "TD" and len(stack) >= 2:
            leading = -float(stack[-1])
            lx += float(stack[-2])
            ly += float(stack[-1])
            cx, cy = lx, ly
        elif op == "Tm" and len(stack) >= 6:
            lx, ly = float(stack[-2]), float(stack[-1])
            cx, cy = lx, ly
        elif op == "T*":
            ly -= leading
            cx, cy = lx, ly
        elif op == "Tj" and stack:
            if isinstance(stack[-1], bytes):
                cx = emit(stack[-1], cx, cy)
                n_ops += 1
        elif op == "'" and stack:
            ly -= leading
            cx, cy = lx, ly
            if isinstance(stack[-1], bytes):
                cx = emit(stack[-1], cx, cy)
                n_ops += 1
        elif op == '"' and len(stack) >= 3:
            ly -= leading
            cx, cy = lx, ly
            if isinstance(stack[-1], bytes):
                cx = emit(stack[-1], cx, cy)
                n_ops += 1
        elif op == "TJ" and stack:
            if isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        cx = emit(el, cx, cy)
                    elif isinstance(el, (int, float)):
                        # kern offset in thousandths of em
                        if -el >= TJ_SPACE_MILLIEM:
                            chunks.append((cy, cx, cx, " "))
                        cx -= float(el) / 1000.0 * font_size
                n_ops += 1
        # every operator consumes its operands
        if op not in ("BT",):
            stack.clear()
    return chunks, n_ops


def _layout_lines(chunks: list[tuple[float, float, float, str]],
                  font_size_hint: float = 12.0) -> list[str]:
    """Group chunks into lines by y (tolerance), order top-to-bottom /
    left-to-right, join with gap-heuristic spaces."""
    if not chunks:
        return []
    chunks = sorted(chunks, key=lambda c: (-c[0], c[1]))
    lines: list[list[tuple[float, float, float, str]]] = []
    cur_y = None
    for ch in chunks:
        if cur_y is None or abs(ch[0] - cur_y) > LINE_Y_TOL:
            lines.append([ch])
            cur_y = ch[0]
        else:
            lines[-1].append(ch)
    out = []
    gap = GAP_SPACE_EM * font_size_hint
    for line in lines:
        line.sort(key=lambda c: c[1])
        buf = []
        prev_end = None
        for (_y, x0, x1, text) in line:
            if prev_end is not None and x0 - prev_end > gap and \
                    buf and not buf[-1].endswith(" ") and \
                    not text.startswith(" "):
                buf.append(" ")
            buf.append(text)
            prev_end = max(x1, prev_end if prev_end is not None else x1)
        out.append("".join(buf))
    return out


def extract_text(pdf: bytes) -> PdfText:
    """Parse a PDF and reconstruct its text in reading order."""
    if not pdf.lstrip()[:5].startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    doc = PdfDocument(pdf)
    pages_text: list[str] = []
    total_ops = 0
    for page in doc.pages():
        content = doc.page_content(page)
        chunks, n_ops = _interpret_page(content)
        total_ops += n_ops
        pages_text.append("\n".join(_layout_lines(chunks)))
    return PdfText(
        text="\n".join(p for p in pages_text if p),
        pages=pages_text,
        n_pages=len(pages_text),
        n_text_ops=total_ops,
    )
