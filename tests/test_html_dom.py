"""Parse->serialize golden pairs ported 1:1 from the reference
(/root/reference/tests/html-dom.rs:47-168). Fragment-parse with a <body>
context element, serialize the fragment content children-only (the
reference test serializes root.first_child() with html5ever's default
SerializeOpts, whose traversal scope is ChildrenOnly)."""

import pytest

from nipper_ray.html import parse_document, parse_fragment


def parse_and_serialize(html: str) -> str:
    t = parse_fragment(html, "body")
    root_children = t.children_ids(0)
    assert root_children
    return t.serialize(root_children[0], include_node=False)


GOLDENS = [
    ("empty", "", ""),
    ("fuzz", "<a a=\r\n", ""),
    ("smoke_test", "<p><i>Hello</i>, World!</p>", None),
    ("misnest", "<p><i>Hello!</p>, World!</i>",
     "<p><i>Hello!</i></p><i>, World!</i>"),
    ("attr_literal", "<base foo=\"<'>\">", None),
    ("attr_escape_amp", '<base foo="&amp;">', None),
    ("attr_escape_amp_2", "<base foo=&amp>", '<base foo="&amp;">'),
    ("attr_escape_nbsp", "<base foo=x y>", '<base foo="x&nbsp;y">'),
    ("attr_escape_quot", "<base foo='\"'>", '<base foo="&quot;">'),
    ("attr_escape_several", "<span foo=3 title='test \"with\" &amp;quot;'>",
     '<span foo="3" title="test &quot;with&quot; &amp;quot;"></span>'),
    ("text_literal", "<p>\"'\"</p>", None),
    ("text_escape_amp", "<p>&amp;</p>", None),
    ("text_escape_amp_2", "<p>&amp</p>", "<p>&amp;</p>"),
    ("text_escape_nbsp", "<p>x y</p>", "<p>x&nbsp;y</p>"),
    ("text_escape_lt", "<p>&lt;</p>", None),
    ("text_escape_gt", "<p>&gt;</p>", None),
    ("text_escape_gt2", "<p>></p>", "<p>&gt;</p>"),
    ("script_literal", "<script>(x & 1) < 2; y > \"foo\" + 'bar'</script>",
     None),
    ("style_literal", "<style>(x & 1) < 2; y > \"foo\" + 'bar'</style>",
     None),
    ("xmp_literal", "<xmp>(x & 1) < 2; y > \"foo\" + 'bar'</xmp>", None),
    ("iframe_literal", "<iframe>(x & 1) < 2; y > \"foo\" + 'bar'</iframe>",
     None),
    ("noembed_literal", "<noembed>(x & 1) < 2; y > \"foo\" + 'bar'</noembed>",
     None),
    ("noframes_literal",
     "<noframes>(x & 1) < 2; y > \"foo\" + 'bar'</noframes>", None),
    ("pre_lf_0", "<pre>foo bar</pre>", None),
    ("pre_lf_1", "<pre>\nfoo bar</pre>", "<pre>foo bar</pre>"),
    ("pre_lf_2", "<pre>\n\nfoo bar</pre>", "<pre>\nfoo bar</pre>"),
    ("textarea_lf_0", "<textarea>foo bar</textarea>", None),
    ("textarea_lf_1", "<textarea>\nfoo bar</textarea>",
     "<textarea>foo bar</textarea>"),
    ("textarea_lf_2", "<textarea>\n\nfoo bar</textarea>",
     "<textarea>\nfoo bar</textarea>"),
    ("listing_lf_0", "<listing>foo bar</listing>", None),
    ("listing_lf_1", "<listing>\nfoo bar</listing>",
     "<listing>foo bar</listing>"),
    ("listing_lf_2", "<listing>\n\nfoo bar</listing>",
     "<listing>\nfoo bar</listing>"),
    ("comment_1", "<p>hi <!--world--></p>", None),
    ("comment_2", "<p>hi <!-- world--></p>", None),
    ("comment_3", "<p>hi <!--world --></p>", None),
    ("comment_4", "<p>hi <!-- world --></p>", None),
    ("attr_ns_1", '<svg xmlns="bleh"></svg>', None),
    ("attr_ns_2", '<svg xmlns:foo="bleh"></svg>', None),
    ("attr_ns_3", '<svg xmlns:xlink="bleh"></svg>', None),
    ("attr_ns_4", '<svg xlink:href="bleh"></svg>', None),
]


@pytest.mark.parametrize("name,inp,exp", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_parse_serialize(name, inp, exp):
    if exp is None:
        exp = inp
    assert parse_and_serialize(inp) == exp


def test_doctype():
    t = parse_document("<!doctype html>")
    first = t.children_ids(0)[0]
    assert t.serialize(first, include_node=True) == "<!DOCTYPE html>"
