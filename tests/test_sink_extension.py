"""§2.7 extension surface: the tokenizer sink is pluggable — any object
with the ITokenHandler-shaped protocol can replace the tree builder
(reference: Common/ITokenHandler.cs:32; SURVEY.md §2.7)."""

from __future__ import annotations

from htmlparsersharp_ray.html.parser import preprocess
from htmlparsersharp_ray.html.tokenizer import Tokenizer, RCDATA, RAWTEXT, SCRIPT_DATA


class TokenStatsSink:
    """Streaming sink: counts tokens and collects text without building a
    DOM — the seam a custom extraction sink would use."""

    def __init__(self):
        self.start_tags = 0
        self.end_tags = 0
        self.comments = 0
        self.doctypes = 0
        self.text = []
        self.tokenizer = None

    def characters(self, s):
        self.text.append(s)

    def start_tag(self, name, attrs, self_closing):
        self.start_tags += 1
        if name in ("title", "textarea"):
            self.tokenizer.set_content_model(RCDATA, name)
        elif name in ("style", "xmp", "iframe", "noembed", "noframes"):
            self.tokenizer.set_content_model(RAWTEXT, name)
        elif name == "script":
            self.tokenizer.set_content_model(SCRIPT_DATA, name)

    def end_tag(self, name):
        self.end_tags += 1

    def comment(self, data):
        self.comments += 1

    def doctype(self, name, public_id, system_id, force_quirks):
        self.doctypes += 1

    def eof(self):
        pass

    def cdata_allowed(self):
        return False


def test_custom_sink_replaces_tree_builder():
    sink = TokenStatsSink()
    tok = Tokenizer(sink)
    sink.tokenizer = tok
    tok.run(preprocess("<!DOCTYPE html><p id=x>a<b>c</b></p><!-- n --><script>1<2</script>tail"))
    assert sink.doctypes == 1
    assert sink.start_tags == 3   # p, b, script
    assert sink.end_tags == 3     # b, p, script
    assert sink.comments == 1
    assert "".join(sink.text) == "ac1<2tail"
