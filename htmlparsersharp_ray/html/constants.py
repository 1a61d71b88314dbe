"""Interned name tables and flag sets for the HTML5 parser.

The reference packs these as interned C# objects with flag bit-words
(reference: Core/ElementName.cs:38-95,814-1206 — 392 interned elements;
Core/AttributeName.cs:512-535 — ~600 attributes with per-namespace
variants). Python gets the same effect with module-level frozensets and
dicts built once per worker process; lookups are dict hits instead of the
reference's 5-bit-packed hash + binary search (Core/ElementName.cs:125-164).

All data below is from the published WHATWG HTML standard (the same spec
the reference implements).
"""

from __future__ import annotations

from .dom import MATHML_NS, SVG_NS, XLINK_NS, XML_NS, XMLNS_NS

# --- Element categories ---------------------------------------------------
# "Special" elements per WHATWG tree construction (reference flag SPECIAL,
# Core/ElementName.cs:49). The reference predates <template>; this engine
# implements the full template-contents insertion machinery (treebuilder
# IN_TEMPLATE + TemplateElement.content).
SPECIAL_HTML = frozenset("""
    address applet area article aside base basefont bgsound blockquote body
    br button caption center col colgroup dd details dir div dl dt embed
    fieldset figcaption figure footer form frame frameset h1 h2 h3 h4 h5 h6
    head header hgroup hr html iframe img input isindex li link listing main
    marquee menu meta nav noembed noframes noscript object ol p param
    plaintext pre script section select source style summary table tbody td
    template textarea tfoot th thead title tr track ul wbr xmp
""".split())

SPECIAL_MATHML = frozenset(["mi", "mo", "mn", "ms", "mtext", "annotation-xml"])
SPECIAL_SVG = frozenset(["foreignObject", "desc", "title"])

# Formatting elements (active formatting list candidates; reference
# dispatch groups B_OR_BIG_..., Core/DispatchGroup.cs).
FORMATTING = frozenset(
    ["a", "b", "big", "code", "em", "font", "i", "nobr", "s", "small",
     "strike", "strong", "tt", "u"]
)

# Scope definitions (reference: TreeBuilder.cs:4134-4236 scope searches).
DEFAULT_SCOPE = frozenset(
    ["applet", "caption", "html", "table", "td", "th", "marquee", "object",
     "template"]
)
LIST_ITEM_SCOPE_EXTRA = frozenset(["ol", "ul"])
BUTTON_SCOPE_EXTRA = frozenset(["button"])
TABLE_SCOPE = frozenset(["html", "table", "template"])
SELECT_SCOPE_NEGATED = frozenset(["optgroup", "option"])  # select scope: all EXCEPT these

# Elements whose end tags are implied (reference:
# TreeBuilder.cs:4238-4281 GenerateImpliedEndTags).
IMPLIED_END_TAGS = frozenset(["dd", "dt", "li", "optgroup", "option", "p", "rb", "rp", "rt", "rtc"])
IMPLIED_END_TAGS_THOROUGH = IMPLIED_END_TAGS | frozenset(
    ["caption", "colgroup", "tbody", "td", "tfoot", "th", "thead", "tr"]
)

# p-closing block starters handled as a group in the in-body mode.
CLOSE_P_BLOCKS = frozenset("""
    address article aside blockquote center details dialog dir div dl
    fieldset figcaption figure footer header hgroup main menu nav ol p
    section summary ul
""".split())

HEADINGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])

# Raw-text / RCDATA content models entered by the tree builder
# (reference: TreeBuilder.cs:1964-1972,2187-2236 content-model switches).
RCDATA_ELEMENTS = frozenset(["title", "textarea"])
RAWTEXT_ELEMENTS = frozenset(["style", "xmp", "iframe", "noembed", "noframes"])

# Void elements for serializer/extraction (never have children).
VOID_ELEMENTS = frozenset(
    ["area", "base", "basefont", "bgsound", "br", "col", "embed", "frame",
     "hr", "img", "input", "keygen", "link", "meta", "param", "source",
     "track", "wbr"]
)

# Foreign-content breakout tags: seeing one of these in SVG/MathML content
# pops back to HTML (reference: TreeBuilder.cs:1415-1506).
BREAKOUT = frozenset("""
    b big blockquote body br center code dd div dl dt em embed h1 h2 h3 h4
    h5 h6 head hr i img li listing menu meta nobr ol p pre ruby s small span
    strong strike sub sup table tt u ul var
""".split())

# --- Foreign content case adjustment -------------------------------------
# SVG camelCase element names (reference: ElementName camelCase variants,
# Core/ElementName.cs interned table).
SVG_ELEMENT_ADJUST = {
    "altglyph": "altGlyph", "altglyphdef": "altGlyphDef",
    "altglyphitem": "altGlyphItem", "animatecolor": "animateColor",
    "animatemotion": "animateMotion", "animatetransform": "animateTransform",
    "clippath": "clipPath", "feblend": "feBlend",
    "fecolormatrix": "feColorMatrix", "fecomponenttransfer": "feComponentTransfer",
    "fecomposite": "feComposite", "feconvolvematrix": "feConvolveMatrix",
    "fediffuselighting": "feDiffuseLighting",
    "fedisplacementmap": "feDisplacementMap", "fedistantlight": "feDistantLight",
    "fedropshadow": "feDropShadow", "feflood": "feFlood",
    "fefunca": "feFuncA", "fefuncb": "feFuncB", "fefuncg": "feFuncG",
    "fefuncr": "feFuncR", "fegaussianblur": "feGaussianBlur",
    "feimage": "feImage", "femerge": "feMerge", "femergenode": "feMergeNode",
    "femorphology": "feMorphology", "feoffset": "feOffset",
    "fepointlight": "fePointLight", "fespecularlighting": "feSpecularLighting",
    "fespotlight": "feSpotLight", "fetile": "feTile",
    "feturbulence": "feTurbulence", "foreignobject": "foreignObject",
    "glyphref": "glyphRef", "lineargradient": "linearGradient",
    "radialgradient": "radialGradient", "textpath": "textPath",
}

# SVG camelCase attribute names (reference: AttributeName SVG-mode locals,
# Core/AttributeName.cs:512-535).
SVG_ATTR_ADJUST = {
    "attributename": "attributeName", "attributetype": "attributeType",
    "basefrequency": "baseFrequency", "baseprofile": "baseProfile",
    "calcmode": "calcMode", "clippathunits": "clipPathUnits",
    "diffuseconstant": "diffuseConstant", "edgemode": "edgeMode",
    "filterunits": "filterUnits", "glyphref": "glyphRef",
    "gradienttransform": "gradientTransform", "gradientunits": "gradientUnits",
    "kernelmatrix": "kernelMatrix", "kernelunitlength": "kernelUnitLength",
    "keypoints": "keyPoints", "keysplines": "keySplines", "keytimes": "keyTimes",
    "lengthadjust": "lengthAdjust", "limitingconeangle": "limitingConeAngle",
    "markerheight": "markerHeight", "markerunits": "markerUnits",
    "markerwidth": "markerWidth", "maskcontentunits": "maskContentUnits",
    "maskunits": "maskUnits", "numoctaves": "numOctaves",
    "pathlength": "pathLength", "patterncontentunits": "patternContentUnits",
    "patterntransform": "patternTransform", "patternunits": "patternUnits",
    "pointsatx": "pointsAtX", "pointsaty": "pointsAtY", "pointsatz": "pointsAtZ",
    "preservealpha": "preserveAlpha", "preserveaspectratio": "preserveAspectRatio",
    "primitiveunits": "primitiveUnits", "refx": "refX", "refy": "refY",
    "repeatcount": "repeatCount", "repeatdur": "repeatDur",
    "requiredextensions": "requiredExtensions", "requiredfeatures": "requiredFeatures",
    "specularconstant": "specularConstant", "specularexponent": "specularExponent",
    "spreadmethod": "spreadMethod", "startoffset": "startOffset",
    "stddeviation": "stdDeviation", "stitchtiles": "stitchTiles",
    "surfacescale": "surfaceScale", "systemlanguage": "systemLanguage",
    "tablevalues": "tableValues", "targetx": "targetX", "targety": "targetY",
    "textlength": "textLength", "viewbox": "viewBox", "viewtarget": "viewTarget",
    "xchannelselector": "xChannelSelector", "ychannelselector": "yChannelSelector",
    "zoomandpan": "zoomAndPan",
}

# MathML attribute adjustment.
MATHML_ATTR_ADJUST = {"definitionurl": "definitionURL"}

# Foreign (namespaced) attribute adjustment: lowercase name ->
# (display qname, namespace).
FOREIGN_ATTR_ADJUST = {
    "xlink:actuate": ("xlink actuate", XLINK_NS),
    "xlink:arcrole": ("xlink arcrole", XLINK_NS),
    "xlink:href": ("xlink href", XLINK_NS),
    "xlink:role": ("xlink role", XLINK_NS),
    "xlink:show": ("xlink show", XLINK_NS),
    "xlink:title": ("xlink title", XLINK_NS),
    "xlink:type": ("xlink type", XLINK_NS),
    "xml:lang": ("xml lang", XML_NS),
    "xml:space": ("xml space", XML_NS),
    "xmlns": ("xmlns", XMLNS_NS),
    "xmlns:xlink": ("xmlns xlink", XMLNS_NS),
}

# MathML text integration points & HTML integration points
# (reference: HTML_INTEGRATION_POINT flag, Core/ElementName.cs:63).
MATHML_TEXT_INTEGRATION = frozenset(["mi", "mo", "mn", "ms", "mtext"])
SVG_HTML_INTEGRATION = frozenset(["foreignObject", "desc", "title"])


def is_html_integration_point(name: str, namespace: str, attrs) -> bool:
    if namespace == SVG_NS:
        return name in SVG_HTML_INTEGRATION
    if namespace == MATHML_NS and name == "annotation-xml":
        enc = attrs.get("encoding")
        if enc:
            return enc.lower() in ("text/html", "application/xhtml+xml")
    return False


# --- Doctype quirks tables ------------------------------------------------
# (reference: TreeBuilderConstants.cs:27-86; IsQuirky TreeBuilder.cs:4336-4387)
QUIRKY_PUBLIC_PREFIXES = tuple(p.lower() for p in [
    "+//Silmaril//dtd html Pro v0r11 19970101//",
    "-//AS//DTD HTML 3.0 asWedit + extensions//",
    "-//AdvaSoft Ltd//DTD HTML 3.0 asWedit + extensions//",
    "-//IETF//DTD HTML 2.0 Level 1//", "-//IETF//DTD HTML 2.0 Level 2//",
    "-//IETF//DTD HTML 2.0 Strict Level 1//",
    "-//IETF//DTD HTML 2.0 Strict Level 2//", "-//IETF//DTD HTML 2.0 Strict//",
    "-//IETF//DTD HTML 2.0//", "-//IETF//DTD HTML 2.1E//",
    "-//IETF//DTD HTML 3.0//", "-//IETF//DTD HTML 3.2 Final//",
    "-//IETF//DTD HTML 3.2//", "-//IETF//DTD HTML 3//",
    "-//IETF//DTD HTML Level 0//", "-//IETF//DTD HTML Level 1//",
    "-//IETF//DTD HTML Level 2//", "-//IETF//DTD HTML Level 3//",
    "-//IETF//DTD HTML Strict Level 0//", "-//IETF//DTD HTML Strict Level 1//",
    "-//IETF//DTD HTML Strict Level 2//", "-//IETF//DTD HTML Strict Level 3//",
    "-//IETF//DTD HTML Strict//", "-//IETF//DTD HTML//",
    "-//Metrius//DTD Metrius Presentational//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 2.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 2.0 Tables//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML Strict//",
    "-//Microsoft//DTD Internet Explorer 3.0 HTML//",
    "-//Microsoft//DTD Internet Explorer 3.0 Tables//",
    "-//Netscape Comm. Corp.//DTD HTML//",
    "-//Netscape Comm. Corp.//DTD Strict HTML//",
    "-//O'Reilly and Associates//DTD HTML 2.0//",
    "-//O'Reilly and Associates//DTD HTML Extended 1.0//",
    "-//O'Reilly and Associates//DTD HTML Extended Relaxed 1.0//",
    "-//SQ//DTD HTML 2.0 HoTMetaL + extensions//",
    "-//SoftQuad Software//DTD HoTMetaL PRO 6.0::19990601::extensions to HTML 4.0//",
    "-//SoftQuad//DTD HoTMetaL PRO 4.0::19971010::extensions to HTML 4.0//",
    "-//Spyglass//DTD HTML 2.0 Extended//",
    "-//Sun Microsystems Corp.//DTD HotJava HTML//",
    "-//Sun Microsystems Corp.//DTD HotJava Strict HTML//",
    "-//W3C//DTD HTML 3 1995-03-24//", "-//W3C//DTD HTML 3.2 Draft//",
    "-//W3C//DTD HTML 3.2 Final//", "-//W3C//DTD HTML 3.2//",
    "-//W3C//DTD HTML 3.2S Draft//", "-//W3C//DTD HTML 4.0 Frameset//",
    "-//W3C//DTD HTML 4.0 Transitional//",
    "-//W3C//DTD HTML Experimental 19960712//",
    "-//W3C//DTD HTML Experimental 970421//", "-//W3C//DTD W3 HTML//",
    "-//W3O//DTD W3 HTML 3.0//", "-//WebTechs//DTD Mozilla HTML 2.0//",
    "-//WebTechs//DTD Mozilla HTML//",
])
QUIRKY_PUBLIC_EXACT = frozenset(p.lower() for p in [
    "-//W3O//DTD W3 HTML Strict 3.0//EN//", "-/W3C/DTD HTML 4.0 Transitional/EN",
    "HTML",
])
QUIRKY_SYSTEM_EXACT = frozenset([
    "http://www.ibm.com/data/dtd/v11/ibmxhtml1-transitional.dtd".lower(),
])
# Quirky only when system id is missing:
QUIRKY_IF_NO_SYSTEM_PREFIXES = tuple(p.lower() for p in [
    "-//W3C//DTD HTML 4.01 Frameset//", "-//W3C//DTD HTML 4.01 Transitional//",
])
ALMOST_STANDARDS_PREFIXES = tuple(p.lower() for p in [
    "-//W3C//DTD XHTML 1.0 Frameset//", "-//W3C//DTD XHTML 1.0 Transitional//",
])

# --- Numeric character reference remaps -----------------------------------
# C1 control characters remapped through Windows-1252
# (reference: Core/NamedCharacters.cs:927 WINDOWS_1252; Tokenizer.cs:6538-6642).
WINDOWS_1252_REMAP = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}


def is_special(name: str, namespace: str) -> bool:
    from .dom import HTML_NS
    if namespace == HTML_NS:
        return name in SPECIAL_HTML
    if namespace == MATHML_NS:
        return name in SPECIAL_MATHML
    if namespace == SVG_NS:
        return name in SPECIAL_SVG
    return False
