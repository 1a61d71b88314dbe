"""Extraction-layer unit tests (no Ray): boilerplate scoring, spans,
metrics, hostile inputs."""

from __future__ import annotations

from htmlparsersharp_ray.html import parse
from htmlparsersharp_ray.extract import extract_main_content
from htmlparsersharp_ray.stages.parse_stage import HtmlExtractUDF


def _extract(html):
    return extract_main_content(parse(html).root)


def test_basic_extraction_and_spans():
    e = _extract("<body><h1>Title</h1><p>Para one.</p><p>Para two.</p></body>")
    assert e.text == "Title\nPara one.\nPara two."
    assert [s[3] for s in e.spans] == ["h1", "p", "p"]
    # span offsets index into extracted_text
    for path, start, end, tag in e.spans:
        assert e.text[start:end] in ("Title", "Para one.", "Para two.")
        assert path.startswith("/html[1]/body[1]/")


def test_script_style_dropped():
    e = _extract("<p>keep</p><script>var x=1;</script><style>p{}</style>")
    assert e.text == "keep"
    assert e.boilerplate_bytes > 0


def test_nav_footer_chrome_dropped():
    e = _extract(
        "<nav><a href=/>Home</a></nav><p>content body text</p>"
        "<footer>© corp</footer>"
    )
    assert e.text == "content body text"


def test_link_farm_dropped_article_kept():
    e = _extract(
        "<div><a href=1>l1</a> <a href=2>l2</a> <a href=3>l3</a></div>"
        "<p>This paragraph has plenty of ordinary prose around a single "
        "<a href=x>link</a> so it stays as main content despite the anchor.</p>"
    )
    assert "l1 l2 l3" not in e.text
    assert "ordinary prose" in e.text


def test_whitespace_normalized_except_pre():
    e = _extract("<p>a   b\n\nc</p><pre>  keep\n  exact</pre>")
    assert e.text == "a b c\n  keep\n  exact"


def test_foreign_content_excluded():
    e = _extract("<p>before</p><svg><desc>svg text</desc></svg><p>after</p>")
    assert e.text == "before\nafter"


def test_metrics_counts():
    e = _extract("<p>x</p>")
    assert e.nodes >= 4  # html, head, body, p, text


def test_hostile_deep_nesting_no_recursion_error():
    html = "<div>" * 5000 + "deep" + "</div>" * 5000
    e = _extract(html)
    assert "deep" in e.text


def test_udf_truncation():
    udf = HtmlExtractUDF(max_text_chars=100)
    row = udf.extract_one("<p>" + "x" * 500 + "</p>")
    assert row["metrics"]["truncated"] is True
    row2 = udf.extract_one("<p>short</p>")
    assert row2["metrics"]["truncated"] is False
    assert row2["extracted_text"] == "short"


def test_udf_empty_and_none():
    udf = HtmlExtractUDF()
    assert udf.extract_one("")["extracted_text"] == ""
    assert udf.extract_one(None)["extracted_text"] == ""


def test_link_extract_semantics(ray_session):
    """One row per <a href> in document order; nested markup inside the
    anchor contributes its text; anchors without href drop; nav/footer
    ancestry clears in_content; deep nesting inside content keeps it."""
    import pyarrow as pa

    from htmlparsersharp_ray.stages.parse_stage import LinkExtractUDF

    html = (
        "<nav><a href=/home>Home <b>now</b></a><a>no-href</a></nav>"
        "<div><p>intro <a href='http://x/y'>deep <i>link</i> text</a>"
        "</p></div>"
        "<footer><a href=/p>Privacy</a></footer>"
    )
    batch = pa.table({
        "conv_id": pa.array(["c1"]),
        "turn_idx": pa.array([0], pa.int64()),
        "text": pa.array([html]),
    })
    out = LinkExtractUDF()(batch).to_pandas()
    assert out["href"].tolist() == ["/home", "http://x/y", "/p"]
    assert out["anchor_text"].tolist() == ["Home now", "deep link text",
                                           "Privacy"]
    assert out["in_content"].tolist() == [False, True, False]


def test_link_extract_malformed_html(ray_session):
    """Links survive spec error recovery (unclosed tags, foster
    parenting) — the parser, not a regex, finds them."""
    import pyarrow as pa

    from htmlparsersharp_ray.stages.parse_stage import LinkExtractUDF

    html = "<table><tr><td><a href=/in-cell>cell</a><a href=/stray>s</a>"
    batch = pa.table({
        "conv_id": pa.array(["c"]),
        "turn_idx": pa.array([0], pa.int64()),
        "text": pa.array([html]),
    })
    out = LinkExtractUDF()(batch).to_pandas()
    assert out["href"].tolist() == ["/in-cell", "/stray"]


def _part_batch(keys, names=None):
    import pyarrow as pa

    n = len(keys)
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array(names or [f"name {k}" for k in keys]),
        "p_brand": pa.array([f"Brand#{k % 5}" for k in keys]),
        "p_type": pa.array(["STANDARD & <PLATED>"] * n),
        "p_size": pa.array([k % 50 for k in keys], pa.int32()),
        "p_retailprice": pa.array([900.05 + k for k in keys], pa.float64()),
    })


def test_table_roundtrip_all_styles():
    """Every markup style (closed / implied end tags / numeric char
    refs / in-row comments) round-trips exactly, including escaped
    metacharacters in cell text."""
    from htmlparsersharp_ray.stages.parse_stage import (
        TableExtractUDF, render_part_tables)

    batch = _part_batch([0, 1, 2, 3, 4, 5, 6, 7],
                        names=['a & b', 'c < d', 'e > f', 'g "h"',
                               'i  j', ' lead', 'trail ', 'plain'])
    html = render_part_tables(batch)
    out = TableExtractUDF()(html).to_pandas().sort_values("p_partkey")
    assert out["p_partkey"].tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert out["p_name"].tolist() == ['a & b', 'c < d', 'e > f', 'g "h"',
                                      'i  j', ' lead', 'trail ', 'plain']
    assert out["p_type"].unique().tolist() == ["STANDARD & <PLATED>"]
    assert out["p_size"].tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert out["price_cents"].tolist() == [
        90005 + 100 * k for k in range(8)]


def test_table_extract_skips_foster_text_header_caption():
    """Stray text inside <table> is foster-parented out (spec), <th>
    header rows and <caption> never become data rows."""
    from htmlparsersharp_ray.stages.parse_stage import TableExtractUDF
    import pyarrow as pa

    html = ("<table>STRAY<caption>cap</caption>"
            "<thead><tr><th>h1<th>h2</thead>"
            "<tr><td>1<td>x<td>B<td>T<td>2<td>300")
    out = TableExtractUDF()(pa.table({"html": [html]})).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "p_partkey"] == 1
    assert out.loc[0, "p_name"] == "x"
    assert out.loc[0, "price_cents"] == 300


def test_table_extract_first_table_only():
    """Only the first <table> in document order is the data table;
    trailing tables (e.g. layout chrome) are ignored."""
    from htmlparsersharp_ray.stages.parse_stage import TableExtractUDF
    import pyarrow as pa

    html = ("<table><tr><td>7<td>n<td>B<td>T<td>1<td>42</table>"
            "<table><tr><td>9<td>z<td>B<td>T<td>1<td>43</table>")
    out = TableExtractUDF()(pa.table({"html": [html]})).to_pandas()
    assert out["p_partkey"].tolist() == [7]
