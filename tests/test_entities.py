"""Character-reference semantics pins (WHATWG named/numeric rules the
tokenizer must honor — these are the cases the serialization goldens
don't reach)."""

from nipper_ray.api import Document
from nipper_ray.html.entities import decode_charrefs


def test_legacy_prefix_longest_match_in_text():
    # "notin" without ';' is not a name; longest legacy prefix "not" wins
    assert decode_charrefs("&notin") == "¬in"
    assert decode_charrefs("&notin;") == "∉"
    assert decode_charrefs("&not") == "¬"
    assert decode_charrefs("&nosuchentity;") == "&nosuchentity;"


def test_attr_legacy_not_decoded_before_alnum_or_eq():
    # in attributes, a legacy (no-;) ref followed by '=' or alnum stays raw
    assert decode_charrefs("&not=1", in_attr=True) == "&not=1"
    assert decode_charrefs("&notx", in_attr=True) == "&notx"
    assert decode_charrefs("&not 1", in_attr=True) == "¬ 1"
    assert decode_charrefs("&not;=1", in_attr=True) == "¬=1"


def test_attr_rule_through_parser():
    d = Document('<a href="?a=1&not=2&amp;b=3">x</a>')
    assert d.select("a").attr("href") == "?a=1&not=2&b=3"
    d = Document("<p>&not=2</p>")
    assert d.select("p").text() == "¬=2"


def test_numeric_edge_cases():
    assert decode_charrefs("&#65;") == "A"
    assert decode_charrefs("&#x41;") == "A"
    assert decode_charrefs("&#0;") == "�"
    assert decode_charrefs("&#x110000;") == "�"
    assert decode_charrefs("&#128;") == "€"      # C1 remap
    assert decode_charrefs("&#xD800;") == "�"    # surrogate
    assert decode_charrefs("&#65") == "A"        # missing semicolon
    assert decode_charrefs("&#;") == "&#;"       # no digits
    assert decode_charrefs("&#x;") == "&#x;"


def test_rcdata_decodes_rawtext_does_not():
    d = Document("<title>&amp;</title><script>&amp;</script>")
    assert d.select("title").text() == "&"
    assert d.select("script").text() == "&amp;"
