"""Pure-Python HTML5 parsing core (WHATWG tokenizer + tree builder).

Re-expresses the parsing semantics of HtmlParserSharp
(/root/reference/HtmlParserSharp/Core/Tokenizer.cs,
/root/reference/HtmlParserSharp/Core/TreeBuilder.cs) as an original
Python implementation driven by the published WHATWG HTML standard.
No Ray dependency — the Ray stages in ``..stages`` wrap this.
"""

from .dom import Document, DocumentFragment, Element, Text, Comment, Doctype  # noqa: F401
from .serializer import serialize_html, serialize_tree  # noqa: F401


def parse(text, **kwargs):
    from .parser import parse as _parse
    return _parse(text, **kwargs)


def parse_fragment(text, context, **kwargs):
    from .parser import parse_fragment as _parse_fragment
    return _parse_fragment(text, context, **kwargs)
