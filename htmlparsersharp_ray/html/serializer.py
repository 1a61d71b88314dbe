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
    """Serialize a Document/DocumentFragment into html5lib-tests format."""
    lines = []

    def walk(node, depth):
        indent = "| " + "  " * depth
        if isinstance(node, Element):
            prefix = _NS_PREFIX.get(node.namespace, "")
            lines.append(f"{indent}<{prefix}{node.name}>")
            # attr keys are stored as html5lib display names already
            # ("xlink href", "xml lang", ...); emit verbatim, sorted.
            for name, (_ns, value) in sorted(node.attrs.items()):
                lines.append(f'{indent}  {name}="{value}"')
            for child in node.children:
                walk(child, depth + 1)
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

    for child in root.children:
        walk(child, 0)
    return "\n".join(lines)
