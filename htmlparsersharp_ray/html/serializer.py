"""html5lib-tests tree-construction serializer.

Serializes a DOM (dom.py) into the public html5lib-tests ``#document``
format so fixtures can be written in the same style the Validator.nu
lineage of the reference parser is validated against
(reference: README.md:10 — the reference itself ships no tests; SURVEY.md §5).

Format (one node per line):
    | <html>
    |   <head>
    |   <body>
    |     "text"
    |     <!-- comment -->
    |     <svg svg>
    |       attr="value"            (attributes sorted, own lines)
    | <!DOCTYPE html "pub" "sys">
"""

from __future__ import annotations

from .dom import (
    Comment,
    Doctype,
    Document,
    DocumentFragment,
    Element,
    Text,
    HTML_NS,
    MATHML_NS,
    SVG_NS,
    XLINK_NS,
    XML_NS,
    XMLNS_NS,
)

_NS_PREFIX = {SVG_NS: "svg ", MATHML_NS: "math ", HTML_NS: ""}


def serialize_tree(root) -> str:
    """Serialize a Document/DocumentFragment into html5lib-tests format.
    Iterative walk — hostile nesting depth must not recurse."""
    lines = []
    # stack of (node, depth); children pushed in reverse for in-order output
    stack = [(child, 0) for child in reversed(root.children)]
    while stack:
        node, depth = stack.pop()
        indent = "| " + "  " * depth
        if isinstance(node, Element):
            prefix = _NS_PREFIX.get(node.namespace, "")
            lines.append(f"{indent}<{prefix}{node.name}>")
            # attr keys are stored as html5lib display names already
            # ("xlink href", "xml lang", ...); emit verbatim, sorted.
            for name, value in sorted(node.attrs.items()):
                lines.append(f'{indent}  {name}="{value}"')
            for child in reversed(node.children):
                stack.append((child, depth + 1))
            content = getattr(node, "content", None)
            if content is not None:  # <template>: html5lib "content" node
                # content line + its children go BEFORE regular children
                for child in reversed(content.children):
                    stack.append((child, depth + 2))
                lines.append(f"{indent}  content")
        elif isinstance(node, Text):
            lines.append(f'{indent}"{node.data}"')
        elif isinstance(node, Comment):
            lines.append(f"{indent}<!-- {node.data} -->")
        elif isinstance(node, Doctype):
            if node.public_id is None and node.system_id is None:
                if node.name:
                    lines.append(f"{indent}<!DOCTYPE {node.name}>")
                else:
                    lines.append(f"{indent}<!DOCTYPE >")
            else:
                pub = node.public_id or ""
                sys = node.system_id or ""
                lines.append(f'{indent}<!DOCTYPE {node.name or ""} "{pub}" "{sys}">')
    return "\n".join(lines)


# --- HTML serialization (parity with the reference's XML sink,
# reference: Program.cs:64-66 doc.Save; we emit HTML5, not XML) ---------

_VOID = frozenset(
    ["area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
     "hr", "img", "input", "keygen", "link", "meta", "param", "source",
     "track", "wbr"]
)
_RAWTEXT = frozenset(["style", "script", "xmp", "iframe", "noembed",
                      "noframes", "plaintext"])
_RCDATA = frozenset(["title", "textarea"])


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


def serialize_html(root) -> str:
    """Serialize a DOM to HTML5 text (the standard fragment-serialization
    algorithm). Raw-text element content is emitted verbatim; a DOM whose
    raw-text content contains its own end tag is not faithfully
    serializable (inherent to HTML, not a bug here)."""
    out = []
    append = out.append
    # iterative walk (hostile-depth safe, like the extraction walk)
    stack = [iter(root.children)]
    open_elements = [None]
    while stack:
        child = next(stack[-1], None)
        if child is None:
            stack.pop()
            el = open_elements.pop()
            if el is not None:
                append(f"</{el.name}>")
            continue
        cls = type(child)
        if cls is Text:
            parent = child.parent
            if isinstance(parent, Element) and parent.namespace == HTML_NS and (
                parent.name in _RAWTEXT or parent.name in _RCDATA
            ):
                append(child.data)
            else:
                append(_escape_text(child.data))
        elif cls is Comment:
            append(f"<!--{child.data}-->")
        elif cls is Doctype:
            append(f"<!DOCTYPE {child.name}>" if child.name else "<!DOCTYPE>")
        else:  # Element
            name = child.name
            append(f"<{name}")
            for aname, value in child.attrs.items():
                append(f' {aname}="{_escape_attr(value)}"')
            append(">")
            if not (child.namespace == HTML_NS and name in _VOID):
                content = getattr(child, "content", None)
                # <template> serializes its contents fragment (spec)
                stack.append(iter(
                    content.children if content is not None else child.children
                ))
                open_elements.append(child)
    return "".join(out)
