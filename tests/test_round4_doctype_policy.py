"""Round-4: DoctypeExpectation policy matrix (reference:
Common/DoctypeExpectation.cs:39-68 + TreeBuilder.cs:400-607). The mode
computation is policy-invariant; the policy only controls which
doctypes additionally report an error or warning. Engine default is
"no-doctype-errors" (the survey mode — preserves all recorded fixture
error counts); the reference defaults to Html.
"""

from __future__ import annotations

import pytest

from htmlparsersharp_ray.html import parse

H5 = "<!DOCTYPE html>"
STRICT = ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN" '
          '"http://www.w3.org/TR/html4/strict.dtd">')
STRICT_NOSYS = '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN">'
TRANS = ('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
         '"http://www.w3.org/TR/html4/loose.dtd">')
TRANS_NOSYS = ('<!DOCTYPE html PUBLIC '
               '"-//W3C//DTD HTML 4.01 Transitional//EN">')
QUIRKY = '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 3.2 Final//EN">'
XHTML1 = ('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
          '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">')
LEGACY_COMPAT = '<!DOCTYPE html SYSTEM "about:legacy-compat">'


def _r(doctype, policy):
    return parse(doctype + "<p>x", collect_errors=True,
                 doctype_expectation=policy)


def test_mode_is_policy_invariant():
    for d, want in ((H5, "standards"), (STRICT, "standards"),
                    (TRANS, "almost-standards"), (QUIRKY, "quirks")):
        modes = {_r(d, p).doc_mode for p in (
            "html", "html401-strict", "html401-transitional", "auto",
            "no-doctype-errors")}
        assert modes == {want}, (d, modes)


def test_html_policy():
    assert _r(H5, "html").errors == 0
    assert _r(LEGACY_COMPAT, "html").errors == 0
    r = _r(QUIRKY, "html")
    assert any(c == "quirky-doctype" for _, _, c in r.error_details)
    r = _r(TRANS, "html")
    assert any(c == "almost-standards-doctype"
               for _, _, c in r.error_details)
    for d in (STRICT, STRICT_NOSYS, XHTML1):  # obsolete permitted: warn
        r = _r(d, "html")
        assert r.errors == 0 and r.warnings == 1, d
        assert any(c == "warning:obsolete-doctype"
                   for _, _, c in r.error_details)
    r = _r('<!DOCTYPE html SYSTEM "x">', "html")
    assert any(c == "legacy-doctype" for _, _, c in r.error_details)


def test_html401_strict_policy():
    assert _r(STRICT, "html401-strict").errors == 0
    r = _r(STRICT_NOSYS, "html401-strict")
    assert r.errors == 0 and r.warnings == 1
    r = _r(H5, "html401-strict")
    assert any(c == "not-html401-strict-doctype"
               for _, _, c in r.error_details)
    assert any(c == "quirky-doctype"
               for _, _, c in _r(QUIRKY, "html401-strict").error_details)


def test_html401_transitional_policy():
    assert _r(TRANS, "html401-transitional").errors == 0
    r = _r(H5, "html401-transitional")
    assert any(c == "not-html401-transitional-doctype"
               for _, _, c in r.error_details)
    # transitional WITHOUT system id is quirky per the mode tables
    r = _r(TRANS_NOSYS, "html401-transitional")
    assert r.doc_mode == "quirks"
    assert any(c == "quirky-doctype" for _, _, c in r.error_details)


def test_auto_policy():
    assert _r(H5, "auto").errors == 0
    assert _r(STRICT, "auto").errors == 0
    r = _r(STRICT_NOSYS, "auto")
    assert r.errors == 0 and r.warnings == 1  # missing prescribed sysid
    assert _r(TRANS, "auto").errors == 0  # trans+loose: warn-free almost
    r = _r('<!DOCTYPE html SYSTEM "x">', "auto")
    assert any(c == "legacy-doctype" for _, _, c in r.error_details)


def test_no_doctype_errors_default_and_unknown_policy():
    for d in (H5, STRICT, TRANS, QUIRKY):
        assert parse(d + "<p>x").errors == 0, d
    with pytest.raises(ValueError):
        parse("x", doctype_expectation="bogus")
