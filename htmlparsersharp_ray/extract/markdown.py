"""HTML → Markdown conversion over the engine's DOM.

The modern training-corpus extraction target: pretraining pipelines
render pages to Markdown (headings/lists/links preserved as lightweight
structure) rather than flat text. This converter walks the DOM the REAL
HTML5 parser produced — so implied end tags, synthesized elements,
character references and case-folding are already resolved by spec
(reference surface: the whole parse stack; no counterpart operator in
the reference, which stops at the DOM).

Conversion rules (CommonMark-flavored, deliberately small):

- ``h1``-``h6`` → ``#``×n heading lines
- ``p`` → paragraph
- ``ul`` / ``ol`` → ``- item`` / ``1. item`` lines (one per ``li``)
- ``pre`` → fenced code block
- ``blockquote`` → ``> `` prefixed paragraph
- inline: ``a`` → ``[text](href)``, ``strong``/``b`` → ``**text**``,
  ``em``/``i`` → ``*text*``, ``code`` → `` `text` ``, ``br`` → newline
- ``script`` / ``style`` / ``template`` are dropped
- any other element is a transparent container: if it has block
  children it contributes a block sequence, else one paragraph
- blocks join with one blank line; text is kept verbatim (the input
  corpus controls whitespace — no lossy re-wrapping)
"""

from __future__ import annotations

from ..html.dom import Element, Text

_BLOCK = {"h1", "h2", "h3", "h4", "h5", "h6", "p", "ul", "ol", "pre",
          "blockquote", "table", "hr"}
_SKIP = {"script", "style", "template"}
_HEADING = {f"h{i}": i for i in range(1, 7)}


def _inline(node) -> str:
    parts = []
    for c in node.children:
        if isinstance(c, Text):
            parts.append(c.data)
            continue
        if not isinstance(c, Element) or c.name in _SKIP:
            continue
        n = c.name
        if n == "a":
            parts.append(f"[{_inline(c)}]({c.attrs.get('href', '')})")
        elif n in ("strong", "b"):
            parts.append(f"**{_inline(c)}**")
        elif n in ("em", "i"):
            parts.append(f"*{_inline(c)}*")
        elif n == "code":
            parts.append(f"`{_inline(c)}`")
        elif n == "br":
            parts.append("\n")
        else:
            parts.append(_inline(c))
    return "".join(parts)


def _blocks(node, out: list) -> None:
    """Append this container's markdown blocks to ``out``."""
    for c in node.children:
        if isinstance(c, Text):
            t = c.data.strip()
            if t:
                out.append(t)
            continue
        if not isinstance(c, Element) or c.name in _SKIP:
            continue
        n = c.name
        if n in _HEADING:
            out.append("#" * _HEADING[n] + " " + _inline(c).strip())
        elif n == "p":
            t = _inline(c).strip()
            if t:
                out.append(t)
        elif n in ("ul", "ol"):
            items = []
            num = 0
            for li in c.children:
                if isinstance(li, Element) and li.name == "li":
                    num += 1
                    pre = "- " if n == "ul" else f"{num}. "
                    items.append(pre + _inline(li).strip())
            if items:
                out.append("\n".join(items))
        elif n == "pre":
            out.append("```\n" + _inline(c).strip("\n") + "\n```")
        elif n == "blockquote":
            t = _inline(c).strip()
            if t:
                out.append("> " + t)
        elif n == "hr":
            out.append("---")
        else:
            # transparent container: block children → recurse,
            # inline-only → one paragraph
            if any(isinstance(g, Element) and
                   (g.name in _BLOCK or g.name in _SKIP or
                    g.name in ("div", "section", "article", "nav",
                               "header", "footer", "main", "aside"))
                   for g in c.children):
                _blocks(c, out)
            else:
                t = _inline(c).strip()
                if t:
                    out.append(t)


def dom_to_markdown(root) -> str:
    """Markdown for the ``<body>`` of a parsed document (or the whole
    node if no body is found — fragment use)."""
    body = None
    stack = [root]
    while stack:
        node = stack.pop()
        if isinstance(node, Element) and node.name == "body":
            body = node
            break
        stack.extend(reversed(node.children))
    out: list = []
    _blocks(body if body is not None else root, out)
    return "\n\n".join(out)
