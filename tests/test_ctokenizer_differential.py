"""Differential: the C-assisted tokenizer front-end (ctokenizer.py over
_scan.c) must produce a DOM identical to the pure-Python tokenizer —
same serialization, same text(), same accumulated parse errors — on the
fixture pages, a battery of hand-picked tokenizer edge cases, and
deterministic adversarial soup.  Skips when no compiler is available."""

import glob
import os
import random

import pytest

import nipper_ray.html.ctokenizer as ct
from nipper_ray.html import cscan
from nipper_ray.html.tokenizer import Tokenizer
from nipper_ray.html.treebuilder import TreeBuilder

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

pytestmark = pytest.mark.skipif(cscan.get() is None,
                                reason="C scanner unavailable")


def _parse(html, use_c, fragment=None):
    real = ct.make_tokenizer
    if use_c:
        fn = cscan.get()
        ct.make_tokenizer = lambda sink, h: ct.CTokenizer(sink, h, fn)
    else:
        ct.make_tokenizer = lambda sink, h: Tokenizer(sink, h)
    try:
        tb = (TreeBuilder() if fragment is None
              else TreeBuilder(fragment_ctx=fragment))
        return tb.parse(html)
    finally:
        ct.make_tokenizer = real


def _check(html, fragment=None):
    a = _parse(html, use_c=False, fragment=fragment)
    b = _parse(html, use_c=True, fragment=fragment)
    assert a.serialize(0) == b.serialize(0), html[:200]
    assert a.errors == b.errors, html[:200]
    assert a.quirks_mode == b.quirks_mode, html[:200]


EDGE_CASES = [
    "",
    "plain text only",
    "a < b and c > d",
    "<",
    "</",
    "</>",
    "</ x>",
    "<a",
    "<a href",
    "<a href=",
    "<a href='unterminated",
    '<a href="unterminated',
    "<a href=val",
    "<a href=val>ok</a>",
    "<a href = spaced >x</a>",
    "<a a=1 a=2 A=3>dup</a>",
    "<a =weird x==y z>attr</a>",
    "<a/b c>slash in tag</a>",
    "<a/>self</a>",
    "<br/>",
    "<input type=text value='a&amp;b'>",
    "<p title='&notin; &not;in &#x41; &#65; &bogus;'>ents</p>",
    "t&amp;t &notit; &#x1F600; &#1114112; &#0;",
    "<!-- comment -->",
    "<!--->",
    "<!-->",
    "<!-- abrupt --!> tail",
    "<!-- unclosed",
    "<!doctype html>",
    "<!DOCTYPE HTML >",
    "<!doctype",
    # doctype ids (quirks decision plumbed through all three lanes)
    '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN">x',
    '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN" '
    '"http://www.w3.org/TR/html4/loose.dtd"><p>y',
    "<!DOCTYPE html SYSTEM 'about:legacy-compat'>z",
    '<!DOCTYPE html PUBLIC "unclosed',
    "<!DOCTYPE html PUBLIC>",
    "<!DOCTYPE html bogus junk><p>q",
    "<!doctypo x>",
    "<?php echo ?>",
    "<?>",
    "<!x bogus>",
    "<![CDATA[not allowed]]>",
    "<svg><![CDATA[<b>raw</b>]]></svg>",
    "<svg><![CDATA[unclosed",
    "<svg><rect/><foreignObject><p>html</p></foreignObject></svg>",
    "<math><mi>x</mi><annotation-xml encoding='text/html'><p>h</p>"
    "</annotation-xml></math>",
    "<script>var a = '<p>no tag';</script>after",
    "<script><!-- if (a<b) { document.write('<script>x<\\/script>'); }"
    " --></script>t",
    "<script>unclosed",
    "<script escaped><!-- </script> -->still?</script>",
    "<style>p > a { color: red }</style>",
    "<style>unclosed",
    "<title>T &amp; T</title>",
    "<title>unclosed",
    "<textarea>\nfirst-lf <b>not bold</b></textarea>",
    "<xmp><p>raw</p></xmp>",
    "<iframe><p>raw</p></iframe>",
    "<noembed>&amp;</noembed>",
    "<noframes><body></noframes>",
    "<noscript><p>x</p></noscript>",
    "<plaintext>everything<p>after</p> is text",
    "<PLAINTEXT>upper",
    "<ScRiPt>mixed</sCrIpT>x",
    "<TITLE>up</title>",
    "a\r\nb\rc",
    "<p \r\n class='x'>crlf in tag</p>",
    "héllo <b>wörld</b> 你好 <i title='é'>☃</i>",
    "é<é>é",
    "<a href='/x?a=1&b=2&amp;c=3'>q</a>",
    "<b><i>adoption</b>agency</i>",
    "<table><tr><td>c1<td>c2<tr><td>c3</table>",
    "<table>foster<tr>text</table>",
    "<ul><li>1<li>2<p>para",
    "<form><input><select><option>o1<option>o2</select></form>",
    "<template><tr><td>t</td></tr></template>",
    "<div " + " ".join("a%d=v%d" % (i, i) for i in range(50)) + ">many</div>",
    "<p>" + "x" * 100000 + "</p>",
    "<!--" + "-" * 7 + "-->",
    "<a b='c'd='e'>nospace</a>",
    "<a b=c/>selfish</a>",
    "<meta charset=utf-8><body>x",
    # reset-insertion-mode must ignore FOREIGN template/select elements
    # (svg "template" has no template_modes entry) — deep-fuzz find
    "<svg><template><title><select><select>",
    "<svg><select><select>",
    "<math><template><select>x",
]


def test_edge_cases_differential():
    for html in EDGE_CASES:
        _check(html)


def test_fixture_pages_differential():
    for p in glob.glob(os.path.join(FIXTURES, "*.html")):
        with open(p, encoding="utf-8", errors="replace") as f:
            _check(f.read())


def test_fragment_differential():
    for ctx in ("body", "template", "title", "textarea", "style",
                "script", "plaintext", "td", ""):
        _check("<b>x</b><!--c--><p>y<![CDATA[z]]>", fragment=ctx)


def test_goldens_pass_with_python_fallback():
    """The 42 reference goldens run through the C path by default (it
    wins make_tokenizer); pin the pure-Python fallback against the
    SAME expected outputs so a no-compiler environment keeps full
    conformance coverage."""
    from test_html_dom import GOLDENS

    real = ct.make_tokenizer
    ct.make_tokenizer = lambda sink, h: Tokenizer(sink, h)
    try:
        for name, inp, exp in GOLDENS:
            if exp is None:
                exp = inp
            t = TreeBuilder(fragment_ctx="body").parse(inp)
            root_children = t.children_ids(0)
            got = t.serialize(root_children[0], include_node=False)
            assert got == exp, name
    finally:
        ct.make_tokenizer = real


def test_adversarial_soup_differential():
    """Deterministic random soup over the tokenizer alphabet."""
    rng = random.Random(0xD1FF)
    atoms = ["<", ">", "/", "=", '"', "'", "&", "!", "-", "?", "[", "]",
             " ", "\t", "\n", "\f", "a", "B", "p", "1", "é",
             "中", "<p", "</p>", "<a href=", "&amp;", "<!--", "-->",
             "<script>", "</script>", "<title>", "</title>", "<svg>",
             "</svg>", "<![CDATA[", "]]>", "<!doctype html>", "<table>",
             "<td>", "<li>", "<b>", "</b>", "<plaintext>", "<textarea>",
             "</textarea>", "\r\n", "\r", "<math>", "</math>",
             "<template>", "</template>", "<select>", "<noscript>",
             "<xmp>", "</xmp>", "\x00"]
    for trial in range(300):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 60)))
        _check(html)


def test_large_attr_tag_buffer_growth():
    """A single tag larger than the scanner's initial record buffer
    exercises the grow-and-retry path."""
    html = ("<div " + " ".join("data-a%d='v%d'" % (i, i)
                               for i in range(9000)) + ">big</div>")
    _check(html)
