"""Round-4 hostile-input guards (SURVEY §7.4.7): Chromium-style
open-stack depth cap (512) + DOM node-count cap, both ON by default,
liftable with None. The depth cap is also what bounds every
scope-search scan — pre-cap, 1.8 MB of nested <div>s took >300 s
(O(depth²) in-scope walks); post-cap it parses in well under a
second.
"""

from __future__ import annotations

import time

from htmlparsersharp_ray.html import parse
from htmlparsersharp_ray.extract.boilerplate import extract_main_content


def test_deep_nest_bounded_time_and_text_preserved():
    t0 = time.time()
    r = parse("<div>" * 300_000 + "deep text")
    assert time.time() - t0 < 30  # pre-cap this exceeded 300 s
    assert r.content_capped
    assert "deep text" in extract_main_content(r.root).text


def test_depth_cap_liftable():
    html = "<i>" * 600 + "x"
    r = parse(html)
    assert r.content_capped
    r2 = parse(html, max_open_depth=None)
    assert not r2.content_capped


def test_cm_sensitive_elements_still_contain_their_text_at_cap():
    """<script> at the cap must still swallow its source as script
    data (dropping it would spill JS into extracted text)."""
    html = "<div>" * 600 + "<script>var hidden = 1;</script>visible"
    r = parse(html)
    assert r.content_capped
    text = extract_main_content(r.root).text
    assert "visible" in text
    assert "hidden" not in text


def test_node_cap_bounds_dom_and_flags():
    r = parse("<p>x</p>" * 5000, max_nodes=1000)
    assert r.content_capped
    n = 0
    stack = [r.root]
    while stack:
        node = stack.pop()
        n += 1
        stack.extend(getattr(node, "children", ()))
    assert n <= 1200  # cap + small slack, nowhere near 10k


def test_udf_truncated_metric_carries_cap_flag():
    import pyarrow as pa

    from htmlparsersharp_ray.stages.parse_stage import HtmlExtractUDF

    udf = HtmlExtractUDF()
    out = udf(pa.table({
        "conv_id": pa.array(["c"]),
        "turn_idx": pa.array([0], pa.int32()),
        "text": pa.array(["<div>" * 600 + "x"]),
    }))
    assert out.to_pylist()[0]["metrics"]["truncated"] is True


def test_normal_documents_unaffected():
    r = parse("<html><body>" + "<p>para</p>" * 400 + "</body></html>")
    assert not r.content_capped
    assert r.errors == 1  # missing doctype only
