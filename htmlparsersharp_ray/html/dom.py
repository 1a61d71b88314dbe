"""Lightweight slotted DOM for the HTML5 tree builder.

The reference builds a System.Xml DOM through 14 abstract tree primitives
(reference: Core/TreeBuilder.cs:5663-5696, Core/DomTreeBuilder.cs:38-213).
Here the tree is plain Python objects with __slots__ — cheap to allocate,
row-scoped (one tree per transcript turn), never crosses a Ray boundary.
Text nodes are coalesced on append, mirroring CoalescingTreeBuilder
(reference: Core/CoalescingTreeBuilder.cs:33-50).
"""

from __future__ import annotations

HTML_NS = "http://www.w3.org/1999/xhtml"
SVG_NS = "http://www.w3.org/2000/svg"
MATHML_NS = "http://www.w3.org/1998/Math/MathML"
XLINK_NS = "http://www.w3.org/1999/xlink"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XMLNS_NS = "http://www.w3.org/2000/xmlns/"


class Node:
    __slots__ = ("parent", "children")

    def __init__(self):
        self.parent = None
        self.children = []

    def append(self, child):
        child.parent = self
        self.children.append(child)

    def insert_before(self, child, ref):
        if ref is None:
            self.append(child)
            return
        idx = self.children.index(ref)
        child.parent = self
        self.children.insert(idx, child)

    def remove_child(self, child):
        self.children.remove(child)
        child.parent = None

    def append_text(self, data: str):
        """Append character data, coalescing with a trailing Text node.
        Coalescing ACCUMULATES parts lazily (list append) instead of
        ``str +=`` — entity-/escape-fragmented text runs would otherwise
        re-copy the run per fragment (O(run²) bytes of memory traffic,
        the 8→32 scaling wall's currency)."""
        if self.children and type(self.children[-1]) is Text:
            self.children[-1]._parts.append(data)
        else:
            self.append(Text(data))

    def insert_text_before(self, data: str, ref):
        """Insert character data before ``ref``, coalescing with the
        preceding sibling Text node if any (foster-text merge; reference:
        Core/DomTreeBuilder.cs:56-65)."""
        if ref is None:
            self.append_text(data)
            return
        idx = self.children.index(ref)
        if idx > 0 and type(self.children[idx - 1]) is Text:
            self.children[idx - 1]._parts.append(data)
        else:
            node = Text(data)
            node.parent = self
            self.children.insert(idx, node)


class Document(Node):
    __slots__ = ("mode",)

    def __init__(self):
        super().__init__()
        self.mode = "standards"  # standards | almost-standards | quirks


class DocumentFragment(Node):
    __slots__ = ()


class Element(Node):
    __slots__ = ("name", "namespace", "attrs", "attr_ns")

    def __init__(self, name: str, namespace: str = HTML_NS, attrs=None,
                 attr_ns=None):
        super().__init__()
        self.name = name
        self.namespace = namespace
        # attrs: dict mapping qualified display name -> value (plain
        # strings — the hot path allocates one dict per element, so no
        # per-attribute tuple wrapping). The RARE namespaced foreign
        # attributes (xlink:/xml:/xmlns:) record their namespace in the
        # separate attr_ns dict, which stays None for HTML elements.
        # The tree builder may ALIAS the token's attrs dict here;
        # element attrs never mutate after insertion except the
        # spec-mandated <html>/<body> duplicate-tag merge.
        self.attrs = attrs if attrs is not None else {}
        self.attr_ns = attr_ns

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<Element {self.name} ns={self.namespace.rsplit('/', 1)[-1]}>"


class TemplateElement(Element):
    """<template> with its separate *template contents* DocumentFragment
    (WHATWG template machinery — BEYOND the reference: Validator.nu 1.3.1
    predates <template>, /root/reference/README.md:10). Children parsed
    inside the element land in ``content``, never in ``children``."""

    __slots__ = ("content",)

    def __init__(self, name: str, namespace: str = HTML_NS, attrs=None):
        super().__init__(name, namespace, attrs)
        self.content = DocumentFragment()


class Text(Node):
    """Character data node with LAZY run accumulation: coalesced
    fragments collect in ``_parts`` and join once on first ``data``
    read (then stay joined). Readers see a plain string; writers that
    REPLACE the content assign ``data`` normally."""

    __slots__ = ("_parts",)

    def __init__(self, data: str):
        super().__init__()
        self._parts = [data]

    @property
    def data(self) -> str:
        parts = self._parts
        if len(parts) != 1:
            parts = ["".join(parts)]
            self._parts = parts
        return parts[0]

    @data.setter
    def data(self, value: str):
        self._parts = [value]


class Comment(Node):
    __slots__ = ("data",)

    def __init__(self, data: str):
        super().__init__()
        self.data = data


class Doctype(Node):
    __slots__ = ("name", "public_id", "system_id")

    def __init__(self, name: str, public_id, system_id):
        super().__init__()
        self.name = name
        self.public_id = public_id
        self.system_id = system_id
