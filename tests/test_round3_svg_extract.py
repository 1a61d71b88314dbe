"""Semantics tests for the foreign-content round trip (`extract_svg`):
case adjustment of SVG tag/attribute names, the foreignObject HTML
integration point, and acknowledged self-closing foreign elements.
"""

from __future__ import annotations

import pyarrow as pa

from htmlparsersharp_ray.stages.structured import (
    SvgExtractUDF,
    render_part_svgs,
)


def _part(keys):
    n = len(keys)
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(["ivory khaki blue"] * n),
        "p_brand": pa.array(["Brand#42"] * n),
        "p_size": pa.array([9] * n, pa.int32()),
    })


class TestExtractSvg:
    def test_all_styles_converge(self, ray_session):
        out = SvgExtractUDF()(render_part_svgs(_part([0, 1, 2]))).to_pandas()
        assert len(out) == 3
        for _, row in out.iterrows():
            assert row["viewbox"] == "0 0 9 9"
            assert row["island_text"] == "Brand#42"
            assert row["circle_r"] == "9"
            assert row["text_length"] == "9"
            assert row["label"] == "ivory khaki blue"

    def test_case_adjustment_is_load_bearing(self):
        # UPPERCASE source style must still produce the camelCase
        # names — a parser that lowercased foreign names would leave
        # attrs["viewBox"] / name "foreignObject" missing
        from htmlparsersharp_ray.html.dom import Element
        from htmlparsersharp_ray.html.parser import parse

        root = parse('<SVG VIEWBOX="0 0 1 1">'
                     '<FOREIGNOBJECT><B>x</B></FOREIGNOBJECT></SVG>').root
        names, attrs = [], {}
        stack = [root]
        while stack:
            n = stack.pop()
            for c in n.children:
                if isinstance(c, Element):
                    names.append(c.name)
                    attrs.update(c.attrs)
                    stack.append(c)
        assert "foreignObject" in names
        assert "viewBox" in attrs
        # the island's <b> is an HTML element again (integration pt)
        assert "b" in names

    def test_self_closing_circle_closes(self):
        # after <circle/>, the text element must be a SIBLING of the
        # circle, not its child
        from htmlparsersharp_ray.html.dom import Element
        from htmlparsersharp_ray.html.parser import parse

        root = parse("<svg><circle r='1'/><text>T</text></svg>").root
        stack = [root]
        svg = None
        while stack:
            n = stack.pop()
            if isinstance(n, Element) and n.name == "svg":
                svg = n
                break
            stack.extend(n.children)
        kids = [c.name for c in svg.children if isinstance(c, Element)]
        assert kids == ["circle", "text"]
        circle = [c for c in svg.children
                  if isinstance(c, Element) and c.name == "circle"][0]
        assert circle.children == []
