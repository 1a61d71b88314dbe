"""Fixture corpus generator (run manually; output is hand-reviewed).

Authors the html5lib-tests-style corpus from FIXTURES.md §3: inputs are
written here; expected trees are produced by the parser, then REVIEWED
against the WHATWG spec before being committed. Regenerating and diffing
is the regression check; a diff means parser behavior changed.

Usage: python tests/gen_fixtures.py   (writes tests/fixtures/*.dat)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from htmlparsersharp_ray.html import parse, parse_fragment, serialize_tree  # noqa: E402

# category -> list of inputs (optionally (input, fragment_context) tuples)
CORPUS = {
    "entities": [
        "&amp; &AMP; &amp &lt;&gt;",
        "&notin; &notit; &not;in &NotEqual;",
        "&#65;&#x41;&#X41;",
        "&#128;&#159;&#x80;",          # C1 → Windows-1252 remap
        "&#0;x",                        # NUL NCR → U+FFFD
        "&#xD800; &#x110000; &#x10FFFF;",
        "&#x1F600;",                    # astral
        "&ampx &amp=y &ampe;",
        "&; &x; &",
        "&CounterClockwiseContourIntegral;",
        "<div title='&amp=a'>t</div>",
        "<div title='&ampx'>t</div>",
        "<div title='&not;x'>t</div>",
        "<div title='&notin'>t</div>",
        "&#38;#38;",
        "&GT&copy &copyx",
    ],
    "tags_attrs": [
        "<DIV CLASS='A'>x</DIV>",
        "<div a=1 a=2>dup</div>",
        "<div a = '1' b=\"2\" c=un-quoted d>x</div>",
        "<div a='1'b='2'>x</div>",
        "<br/><img src='x'/><input/>",
        "<div/>not self closing</div>",
        "</>stray",
        "<?pi data>x",
        "</div>only end",
        "<div =empty>x</div>",
        "<div a`b=c>x</div>",
        "<d-i.v>custom</d-i.v>",
        "<div\x00null>x",
        "<42>not a tag</42>",
    ],
    "comments_doctype": [
        "<!-- ok -->x",
        "<!--x<!--y-->z",
        "<!--a--!>b",
        "<!-->empty",
        "<!--->alsoempty",
        "<!---->x",
        "<!-- unterminated",
        "<!--- a ---->b",
        "<!DOCTYPE html>x",
        "<!doctype HTML>x",
        "<!DOCTYPEhtml>x",
        "<!DOCTYPE>x",
        "<!DOCTYPE html PUBLIC>x",
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.0//EN">x',
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "s">x',
        '<!DOCTYPE html SYSTEM "about:legacy-compat">x',
        '<!DOCTYPE html SYSTEM "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd">x',
        "<!DOCTYPE html BOGUS junk>x",
        "<!DOCTYPE html><!DOCTYPE html>x",
        "<!ELEMENT br EMPTY>x",
    ],
    "rawtext_rcdata": [
        "<title>a<b>&amp;</title>x",
        "<title>a</TITLE >x",
        "<textarea><div>&lt;</textarea>x",
        "<style>a { content: '</div>' }</style>x",
        "<style>s</style >x",
        "<xmp><b>&amp;</b></xmp>x",
        "<iframe><div></iframe>x",
        "<noembed><b></noembed>x",
        "<noframes><body></noframes>x",
        "<plaintext>rest<b>&amp;",
        "<title>unterminated",
        "<style>unterminated",
        "<textarea>\x00nul</textarea>",
        "<title>&notit;</title>",
    ],
    "script_data": [
        "<script>var a = 1 < 2;</script>x",
        "<script><!-- comment --></script>x",
        "<script><!-- <script>nested</script> --></script>x",
        "<script><!-- <script>no close --></script>x",
        "<script>a</script >x",
        "<script></scriptx</script>y",
        "<script>unterminated",
        "<script><!--unterminated",
        "<script>\x00</script>x",
        "<script>s</script><script>t</script>u",
    ],
    "implicit_structure": [
        "naked text",
        "<head><meta charset=utf-8></head>between<body>b",
        "<html lang=en><body>x",
        "<html><html lang=a class=b>x",
        "<body bgcolor=red>x<body class=c>",
        "</head>after head end",
        "</body>txt</html>tail",
        "<base href=/><link rel=x><meta name=y>",
        "  \t\n<!DOCTYPE html>  <html>x",
        "<head></head> <body>x</body>",
        "<br><head>late head</head>",
        "<noscript><link></noscript>body",
    ],
    "tables_foster": [
        "<table><tr><td>c</td></tr></table>",
        "<table>text<td>c</table>",
        "<table><td>implied row</table>",
        "<table><col width=1><tr><td>c</table>",
        "<table><colgroup><col></colgroup><tr><td>c</table>",
        "<table><caption>cap<tr><td>c</table>",
        "<table><thead><tr><th>h</thead><tbody><tr><td>b</table>",
        "<table><table><tr><td>inner</table>",
        "<table><form><input type=hidden></table>",
        "<table><b>bold<tr><td>c</table>",
        "<table><tr>x<td>c</td>y</tr></table>",
        "<div><table><tr><td><div>deep</table></div>",
        "<table><tbody><tfoot><thead><tr><td>x</table>",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        "<table><caption><p>p in caption</table>",
        "<td>loose cell",
        "<tr>loose row",
    ],
    "formatting": [
        "<b><i>x</b>y</i>",
        "<p>1<b>2<p>3</b>4",
        "<a>1<div>2<div>3</a>4",
        "<b>1<table><tr><td>2</td></tr></table>3</b>4",
        "<nobr>1<nobr>2</nobr>3",
        "<b><b><b><b>4b</b></b></b></b>x<b>y",
        "<font size=1><font size=1><font size=1><font size=1>ark</font>x",
        "<em><strong><code>x</em>y</code>z",
        "<div><b></div>after",
        "<b>1<div>2</b>3</div>",
        "<a href=a>1<p>2</a>3</p>",
        "<s><u>12</s>34</u>",
        "<b>A<table><tr><td>B</td></tr>C</table>D</b>",
    ],
    "implied_end": [
        "<p>a<p>b",
        "<ul><li>a<li>b</ul>c",
        "<dl><dt>t<dd>d<dt>t2</dl>",
        "<ol><li>1<ol><li>2</ol>3</ol>",
        "<p>a<div>b</div>",
        "</p>stray",
        "<li>loose li",
        "<h1>a<h2>b</h2>",
        "<h1>a</h3>b",
        "<p><li>x",
        "<optgroup><option>a<option>b<optgroup><option>c",
        "<ruby><rb>a<rb>b<rt>r<rp>(</ruby>",
        "<p>1<pre>2</pre>",
    ],
    "select": [
        "<select><option>a<option>b</select>after",
        "<select><optgroup><option>a<optgroup><option>b</select>",
        "<select><b><option>no b</select>",
        "<select><input>break",
        "<select><select>double",
        "<select><textarea>t",
        "<table><tr><td><select><td>next",
        "<table><select><tr>",
        "<select><option></optgroup>x",
        "<select><script>s</script>x</select>",
        "<select><keygen>k",
    ],
    "foreign": [
        "<svg><rect/></svg>x",
        "<svg><foreignObject><div>html</div></foreignObject></svg>",
        "<math><mi>x</mi><mo>+</mo></math>",
        "<math><annotation-xml encoding='text/html'><div>h</div></annotation-xml></math>",
        "<math><annotation-xml encoding='application/xhtml+xml'><div>h</div></annotation-xml></math>",
        "<math><annotation-xml><div>not ip</div></annotation-xml></math>",
        "<svg><clippath></clippath><lineargradient/></svg>",
        "<svg viewbox='0 0 1 1' preserveaspectratio='x'></svg>",
        "<math definitionurl='u'><mi dx=1></mi></math>",
        "<svg xlink:href='#a' xml:lang=en xmlns='s' xmlns:xlink='x'/>",
        "<svg><b>breakout</b></svg>",
        "<svg><font color=red>breakout</font></svg>",
        "<svg><font nonbreak=1>stays</font></svg>",
        "<math><mi><b>html in ip</b></mi></math>",
        "<svg><![CDATA[<raw> &amp;]]></svg>",
        "<div><![CDATA[not allowed]]></div>",
        "<svg><desc><b>html</b></desc></svg>",
        "<math><mglyph/><mi><mglyph/></mi></math>",
        "<svg><svg><rect/></svg></svg>",
        "<math><svg>no</svg></math>",
        "<math><annotation-xml><svg>yes</svg></annotation-xml></math>",
        "<svg><missing-glyph a=1>x</missing-glyph></svg>",
        "<SVG><RECT/></SVG>",
        "<svg></p>breakout2",
    ],
    "fragments": [
        ("<td>foo", "td"),
        ("<td>foo", "tr"),
        ("<td>foo<td>bar", "table"),
        ("<tr><td>a", "tbody"),
        ("<li>a<li>b", "ul"),
        ("text &amp; more", "div"),
        ("<p>unclosed", "div"),
        ("anything</title>after", "title"),
        ("raw</style>after", "style"),
        ("<!-- c --></script>after", "script"),
        ("<option>a<option>b", "select"),
        ("everything goes", "plaintext"),
        ("<div>block</div>", "p"),
        ("<html><head></head><body>b</body></html>", "html"),
        ("<col>", "colgroup"),
        ("<frame>", "frameset"),
        ("</div><div>x", "div"),
        ("<b>reopen", "b"),
        ("<svg><rect/>", "div"),
        ("<caption>c", "table"),
    ],
    # hand-verified against html5lib-tests expected output / spec walks
    "regression_html5lib": [
        "<p><b><div><marquee></p></b></div>",
        "<font><p>hello<b>cruel</font>world",
        "<b>1<i>2<p>3</b>4",
        "<h1>Hello<h2>World",
        "<a><p>X<a>Y</a>Z</p></a>",
        "<b><button>foo</b>bar",
        "<p><b><div><marquee></p></b></div>x",
        "<wbr><strike><code></strike><code></strike></code></code>",
        "<table><tr><p><td>",
        "<table><isindex></table>",
        # round-2 additions: classic adoption/formatting/table interplay
        "<a><b><a>x",
        "<p><b>bold</p>more",
        "<i>italic<table><tr><td>cell</td></tr></table>after",
        "<a href=a><div><a href=b></div>x",
        "<!DOCTYPE html><p><button>out<p>inner",
        "<i><p>one</i>two</p>",
        "<b><table><td><i>it</table>tail",
        "<p>1<s id=A>2<b id=B>3</p>4</s>5</b>6",
        "<select><table><tr>",
        "<table><td>A</tbody>B</table>",
        "<nobr><b>x<nobr>y",
        "<div><p><object><p>inner",
        "<svg><desc><div><svg><ul>a",
        "<math><mo><div>x",
        "<!doctype html><math></html>",
        "<table><tr><td></p><p></td></tr></table>",
        "<optgroup><option></optgroup>x",
        "<select><option><optgroup></option>y</select>",
        "<body></body><div>after body end",
        "<html><frameset></frameset></html> <p>after frameset",
        "<param><source><track>in body",
        "<table><tbody><a>1<tr>2</table>",
        "<a href=x><table><tr><td><a href=y>z</table>w",
        "  \t<frameset><frame></frameset>",
        "x<frameset><frame></frameset>",
        "<input type=hidden><frameset>",
        "<input type=text><frameset>",
        "<table><td><svg><desc><td>x",
        "<table><caption><table><tr><td>n</table>c</table>",
        "<table><caption>a</caption><caption>b<tr><td>c</table>",
        "<head><title>t</title></head><head><meta>",
        "<b><table><td></b><i></table>x",
        "<div><p><button><p>inner",
        "</strong></b></em></i></u></strike></s></blink></tt></pre></big></small></font></select></h1></h2></h3></h4></h5></h6></body></br></a></img></title></span></style></script></table></th></td></tr></frame></area></link></param></hr></input></col></base></meta></basefont></bgsound></embed></spacer></p></dd></dt></caption></colgroup></tbody></tfoot></thead></address></blockquote></center></dir></div></dl></fieldset></listing></menu></ol></ul></li></nobr></wbr></form></button></marquee></object></html></frameset></head></iframe></image></isindex></noembed></noframes></noscript></optgroup></option></plaintext></textarea>",
    ],
    "malformed_eof": [
        "<div",
        "<div ",
        "<div a",
        "<div a=",
        "<div a='x",
        "<div a=\"x",
        "<div a=x",
        "</div",
        "<!",
        "<!-",
        "<!--",
        "<!--a",
        "<!--a-",
        "<!--a--",
        "<!--a--!",
        "<!DOCTYPE",
        "<!DOCTYPE ",
        "<!DOCTYPE html",
        "<!DOCTYPE html PUBLIC 'x",
        "<!DOCTYPE html SYSTEM 'x",
        "<title>eof",
        "<script>eof",
        "<script><!--eof",
        "<script><!--<script>eof",
        "<table><tr><td>eof",
        "<select><option>eof",
        "<a><b><c>eof",
        "<svg><rect>eof",
        "x&",
        "x&a",
        "x&#",
        "x&#x",
        "<",
        "</",
        "<div class",
    ],
    "byte_hygiene": [
        "﻿<p>bom stripped</p>",
        "a\rb\r\nc\n\rd",
        "<pre>a\r\nb\rc</pre>",
        "nul\x00data",
        "<div a\x00b='c'>x",
        "<div a='b\x00c'>x",
        "<title>t\x00t</title>",
        "\x0bvertical tab is text",
        "\x0cform feed is space",
    ],
    "legacy": [
        "<isindex>",
        "<isindex prompt='P: ' action=/go name=n class=c>",
        "<image src=x>",
        "<frameset><frame><frame></frameset>",
        "<frameset cols='50%,50%'><frameset rows='1'><frame></frameset><frame></frameset>",
        "<frameset><noframes>alt</noframes></frameset>",
        "<body><frameset>ignored",
        "<frameset></frameset>after",
        "<marquee>m</marquee>",
        "<applet><param name=a>x</applet>",
        "<keygen>k",
        "<menu><li>a</menu>",
    ],
    # <template> content machinery (modern-spec parity beyond the
    # reference; cases modeled on html5lib-tests template.dat shapes,
    # expected trees hand-verified against the WHATWG spec walks)
    "template": [
        "<body><template>Hello</template>",
        "<template>Hello</template>",
        "<template></template><div>23</div>",
        "<template><div>Foo</div><div>Bar</div></template>",
        "<template><table></table></template>",
        "<template><tr><td>A</td></tr></template>",
        "<template><td>t</td></template>",
        "<template><col></template>",
        "<template><caption>c</caption></template>",
        "<template><tbody><tr><td>x</td></tr></tbody></template>",
        "<table><template><tr><td>C</td></tr></template></table>",
        "<table><tr><template><td>t</td></template></tr></table>",
        "<table><colgroup><template><col></template></colgroup></table>",
        "<table><tbody><template></template></tbody></table>",
        "<div><template><p>one<p>two</template></div>",
        "<template><template><b>deep</b></template></template>",
        "<template>unclosed",
        "</template>stray",
        "<template><a>x</a></template><a>y</a>",
        "<template><form><input name=q></form><div>second</div></template>",
        "<form><template><form></form></template></form>",
        "<template><select><option>o</select></template>",
        "<template><b>bold<template><i>it</i></template></b></template>",
        "<head></head><template>late</template>after",
        "<template>x<td>y</template>after",
        "<table>t<template>x</template></table>",
        "<template><style>p{}</style><script>s()</script></template>",
        "<template><!--c--><p>p</p></template>",
        ("<p>frag<td>cell", "template"),
        ("<tr><td>z</td></tr>", "template"),
    ],
}


def escape_dat(s: str) -> str:
    """Escape control characters so .dat files stay readable/diffable.
    Mirrored by tests.conftest.unescape_dat."""
    return (
        s.replace("\\", "\\\\")
        .replace("\x00", "\\0")
        .replace("\r", "\\r")
        .replace("\x0b", "\\v")
        .replace("\x0c", "\\f")
        .replace("﻿", "\\ufeff")
    )


def gen():
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    os.makedirs(outdir, exist_ok=True)
    for category, inputs in CORPUS.items():
        out = []
        for item in inputs:
            if isinstance(item, tuple):
                data, ctx = item
                result = parse_fragment(data, ctx)
            else:
                data, ctx = item, None
                result = parse(data)
            tree = serialize_tree(result.root)
            section = ["#data", escape_dat(data), "#errors", str(result.errors)]
            if ctx:
                section += ["#document-fragment", ctx]
            section += ["#document", escape_dat(tree)]
            out.append("\n".join(section))
        path = os.path.join(outdir, f"{category}.dat")
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n\n".join(out) + "\n")
        print(f"wrote {path} ({len(inputs)} cases)")


if __name__ == "__main__":
    gen()
