"""Semantics tests for the <template> round trip (`extract_template`):
content-fragment containment, head-parsed templates, nested-template
decoy exclusion.
"""

from __future__ import annotations

import pyarrow as pa

from htmlparsersharp_ray.stages.structured import (
    TemplateExtractUDF,
    element_text,
    render_order_templates,
)


def _orders(keys):
    n = len(keys)
    return pa.table({
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_orderstatus": pa.array(["F"] * n),
        "o_orderpriority": pa.array(["1-URGENT"] * n),
    })


class TestExtractTemplate:
    def test_all_styles_converge(self, ray_session):
        out = TemplateExtractUDF()(
            render_order_templates(_orders([0, 1, 2]))).to_pandas()
        assert len(out) == 3
        for _, row in out.iterrows():
            assert row["visible"] == "status F"
            assert row["templated"] == "prio 1-URGENT"

    def test_contents_do_not_leak_into_body(self):
        from htmlparsersharp_ray.html.dom import Element, Text
        from htmlparsersharp_ray.html.parser import parse

        root = parse("<div>vis</div>"
                     "<template><p>hidden</p></template>").root
        # body text contains only the visible div text
        body = None
        stack = [root]
        while stack:
            n = stack.pop()
            if isinstance(n, Element) and n.name == "body":
                body = n
                break
            stack.extend(n.children)
        assert element_text(body) == "vis"

    def test_nested_template_contents_excluded(self):
        from htmlparsersharp_ray.html.dom import TemplateElement
        from htmlparsersharp_ray.html.parser import parse

        root = parse("<template id=t-1><p>keep</p>"
                     "<template><p>decoy</p></template>"
                     "</template>").root
        stack = [root]
        outer = None
        while stack:
            n = stack.pop()
            if isinstance(n, TemplateElement) \
                    and n.attrs.get("id") == "t-1":
                outer = n
                break
            stack.extend(n.children)
        assert element_text(outer.content) == "keep"


class TestExtractRuby:
    def test_all_styles_converge(self, ray_session):
        from htmlparsersharp_ray.stages.structured import (
            RubyExtractUDF, render_nation_rubies)

        t = pa.table({
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["JAPAN"] * 3),
            "n_regionkey": pa.array([2] * 3, pa.int32()),
        })
        out = RubyExtractUDF()(render_nation_rubies(t)).to_pandas()
        assert len(out) == 3
        for _, row in out.iterrows():
            assert row["base"] == "JAPAN"
            assert row["anno"] == "reg 2"

    def test_implied_ends_make_siblings(self):
        from htmlparsersharp_ray.html.dom import Element
        from htmlparsersharp_ray.html.parser import parse
        from htmlparsersharp_ray.stages.structured import element_text

        root = parse("<ruby id=r-1><rb>base<rt>anno</ruby>").root
        stack, ruby = [root], None
        while stack:
            n = stack.pop()
            if isinstance(n, Element) and n.name == "ruby":
                ruby = n
                break
            stack.extend(n.children)
        kids = [c.name for c in ruby.children
                if isinstance(c, Element)]
        assert kids == ["rb", "rt"]
        texts = [element_text(c) for c in ruby.children
                 if isinstance(c, Element)]
        assert texts == ["base", "anno"]
