"""Property-based robustness tests (hypothesis): the parser must never
crash, and serialization must reach a fixpoint after one round-trip
(parse(serialize(parse(x))) == serialize(parse(x)) — the normal-form
property html5 serialization guarantees for well-formed trees)."""

from hypothesis import given, settings, strategies as st

from nipper_ray.api import Document
from nipper_ray.html import parse_document

MARKUP_CHARS = st.sampled_from(list("<>&=\"' /!-abcdiv123\n\tpstyle"))
markup = st.text(MARKUP_CHARS, max_size=120)
any_text = st.text(max_size=120)


@settings(max_examples=200, deadline=None)
@given(markup)
def test_parser_never_crashes_markup_soup(s):
    d = Document(s)
    d.html()
    d.select("div, p, a[href], :root").text()


@settings(max_examples=100, deadline=None)
@given(any_text)
def test_parser_never_crashes_any_text(s):
    Document(s).html()


@settings(max_examples=150, deadline=None)
@given(markup)
def test_serialize_fixpoint(s):
    h1 = Document(s).html()
    h2 = Document(h1).html()
    assert Document(h2).html() == h2


@settings(max_examples=100, deadline=None)
@given(st.text(st.sampled_from(list("abc ,.!")), max_size=60))
def test_text_roundtrip_plain(s):
    # plain text (no markup chars) must survive parse byte-identically
    d = Document("<body><p>" + s + "</p></body>")
    assert d.select("p").text() == s


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["<div>", "</div>", "<b>", "</b>", "<i>", "</i>", "<p>", "</p>",
     "<table>", "</table>", "<tr>", "<td>", "x", " "]), max_size=25))
def test_misnesting_never_crashes(parts):
    s = "".join(parts)
    d = Document(s)
    d.html()
    d.select("div b i p td").text()


def test_attr_fast_slow_differential():
    """Tokenizer attribute fast path must be byte-identical to the
    spec-exact slow path on attribute soup."""
    import random

    import nipper_ray.html.tokenizer as T
    from nipper_ray.api import Document

    class NeverMatch:
        def match(self, *a):
            return None

    rng = random.Random(11)
    pieces = ["a", "b2", "data-x", "=", '"', "'", " ", "/", ">", "<",
              "&amp;", "&not", "v1", "=v", '="q w"', "='s'", '="&amp;"',
              "=x&notz", "\t"]
    for _ in range(600):
        attrs = "".join(rng.choice(pieces) for _ in range(rng.randint(0, 8)))
        html = "<p " + attrs + "><i>t</i>"
        fast = Document(html).html()
        saved = T._ATTR_FAST_RE
        T._ATTR_FAST_RE = NeverMatch()
        try:
            slow = Document(html).html()
        finally:
            T._ATTR_FAST_RE = saved
        assert fast == slow, html
