"""Differential pins for the C selector/text engine (fl_select_all /
fl_text in html/_fastlane.c) against the pure-Python matcher and
Tree._text_py.

Same discipline as test_fastlane_differential / test_ctokenizer_
differential: the C engine must be RESULT-IDENTICAL (same nid lists, in
order; same text strings) wherever it engages, and must decline (return
None) on arenas it cannot handle (mixed CNode/Python nodes after DOM
mutation) so the Python engine silently takes over.
"""

import random

import pytest

from nipper_ray.api import Document, _matches_dfs, _matches_dfs_py
from nipper_ray.css.lower import get_cprog, lower_ir
from nipper_ray.css.matcher import CompiledSelector, compile_selector
from nipper_ray.html import fastlane
from test_selector_differential import random_selector

FMT_TAGS = {"a", "b", "em"}


def wellformed_random_html(rng, n_elems=25):
    """random_html variant constrained to the error-free common path the
    C fast lane handles: never nests a formatting tag inside an open one
    of the same name (that triggers the adoption agency's error path and
    a Python-machine reparse)."""
    from test_selector_differential import CLASSES, TAGS

    out = []
    open_tags = []
    for _ in range(n_elems):
        action = rng.random()
        if action < 0.6 or not open_tags:
            tag = rng.choice(TAGS)
            if tag in FMT_TAGS and tag in open_tags:
                tag = "span"
            attrs = ""
            if rng.random() < 0.5:
                attrs += ' class="%s"' % " ".join(
                    rng.sample(CLASSES, rng.randint(1, 2)))
            if rng.random() < 0.3:
                attrs += ' id="i%d"' % rng.randint(0, 9)
            if rng.random() < 0.3:
                attrs += ' data-k="%s"' % rng.choice(["aa", "ab", "b c"])
            out.append("<%s%s>" % (tag, attrs))
            if tag != "link":  # void: never opened, never closed
                open_tags.append(tag)
            if rng.random() < 0.5:
                out.append(rng.choice(["txt", "more words", ""]))
        else:
            out.append("</%s>" % open_tags.pop())
    while open_tags:
        out.append("</%s>" % open_tags.pop())
    return "".join(out)

pytestmark = pytest.mark.skipif(
    fastlane.get() is None, reason="C fast lane unavailable")


def _mod():
    return fastlane.get()


def _cnode_tree(html):
    """Fast-lane-parsed tree (pure CNode arena), or None."""
    return fastlane.parse_document_fast(html)


def test_c_engine_engaged_on_simple_doc():
    """Canary: the C path actually runs (a regression to always-fallback
    would silently pass every differential below)."""
    t = _cnode_tree("<p class='a'>x</p><p>y</p>")
    assert t is not None
    assert type(t.nodes[0]).__name__ == "CNode"
    prog = get_cprog(compile_selector("p.a"))
    assert prog is not None
    res = _mod().select_all(t.nodes, (prog,), [0], True)
    assert res is not None and len(res[0]) == 1


@pytest.mark.parametrize("seed", range(30))
def test_cselect_random_docs(seed):
    rng = random.Random(seed + 74000)
    t = _cnode_tree(wellformed_random_html(rng))
    if t is None:
        pytest.skip("doc fell back to the Python machine")
    for _ in range(25):
        sel = random_selector(rng)
        compiled = CompiledSelector(sel)
        prog = get_cprog(compiled)
        assert prog is not None, sel
        res = _mod().select_all(t.nodes, (prog,), [0], True)
        assert res is not None
        assert res[0] == _matches_dfs_py(t, [0], compiled, True), sel


@pytest.mark.parametrize("seed", range(10))
def test_cselect_children_only_multi_roots(seed):
    """ChildrenOnly scope from multiple (possibly nested) roots — the
    dedup-across-roots semantics of Matches (matcher.rs:86-122)."""
    rng = random.Random(seed + 75000)
    t = _cnode_tree(wellformed_random_html(rng, n_elems=40))
    if t is None:
        pytest.skip("doc fell back to the Python machine")
    outer = CompiledSelector("div, ul, p")
    roots = _matches_dfs_py(t, [0], outer, True)
    if not roots:
        pytest.skip("no roots")
    for _ in range(20):
        sel = random_selector(rng)
        compiled = CompiledSelector(sel)
        prog = get_cprog(compiled)
        res = _mod().select_all(t.nodes, (prog,), roots, False)
        assert res is not None
        assert res[0] == _matches_dfs_py(t, roots, compiled, False), sel


EDGE_DOC = (
    "<html><head><title>T</title><link rel=x><style>p{}</style></head>"
    "<body>"
    "<p class='a\tb  c\x1fd'>ws</p>"
    "<p class='x\xa0y'>nbsp-class</p>"
    "<p data-k='AA-bb'>1</p><p data-k='aa'>2</p><p data-k=''>3</p>"
    "<p data-k='a b'>4</p><p data-k='caf\xe9'>5</p>"
    "<div id='d1'><span></span><!-- c --><span>s</span>tx<b></b></div>"
    "<ul><li>1<li>2<li class='b c'>3</ul>"
    "<a href='u'>anchor</a>"
    "<p></p><p>  </p>"
    "</body></html>"
)

EDGE_SELECTORS = [
    "*", ":root", ":scope", ":link", ":any-link", ":visited",
    "p", "P", "p.a", ".b", ".c", ".d", "[data-k]", "[data-k='aa']",
    "[data-k='AA' i]", "[data-k='AA-BB' i]", "[data-k|='AA']",
    "[data-k|='aa']", "[data-k|='AA' i]", "[data-k^='A']",
    "[data-k^='a' i]", "[data-k$='b']", "[data-k$='B' i]",
    "[data-k*='a-']", "[data-k*='A-' i]", "[data-k~='b']",
    "[data-k~='a b']", "[data-k~='']", "[data-k^='']", "[data-k$='']",
    "[data-k*='']", "[data-k='caf\xe9']", ".x", ".y", "p.x",
    ":empty", "p:empty", "span:empty", ":first-child", ":last-child",
    ":only-child", "li:first-child", "li:last-child",
    "li:nth-child(2)", "li:nth-child(odd)", "li:nth-child(even)",
    "li:nth-child(-n+2)", "li:nth-last-child(1)", "p:nth-of-type(3)",
    "span:first-of-type", "span:last-of-type", "b:only-of-type",
    "p:not(.a)", "p:not(.a, [data-k])", ":not(p)",
    "div > span", "div span", "head > title", "body p",
    "li + li", "li ~ li", "span + span", "span ~ b", "div + ul",
    "p + p", "ul > li:last-child", "* > p",
    "html body p.a, ul li.b, #d1 span",
    "#d1", "div#d1 span:first-child",
]


def test_cselect_edge_doc():
    t = _cnode_tree(EDGE_DOC)
    assert t is not None, "edge doc must take the fast lane"
    for sel in EDGE_SELECTORS:
        compiled = CompiledSelector(sel)
        prog = get_cprog(compiled)
        assert prog is not None, sel
        res = _mod().select_all(t.nodes, (prog,), [0], True)
        assert res is not None
        assert res[0] == _matches_dfs_py(t, [0], compiled, True), sel


def test_cselect_multi_program_matches_per_rule_python():
    """K programs in one DFS pass == K independent Python walks."""
    t = _cnode_tree(EDGE_DOC)
    sels = ["head title", "body", "a[href]", "li", ".b", "*"]
    compileds = [CompiledSelector(s) for s in sels]
    progs = [get_cprog(c) for c in compileds]
    assert all(p is not None for p in progs)
    res = _mod().select_all(t.nodes, progs, [0], True)
    assert res is not None
    for sel, compiled, got in zip(sels, compileds, res):
        assert got == _matches_dfs_py(t, [0], compiled, True), sel


FOREIGN_DOC = (
    "<html><head><title>T</title></head><body>"
    "<div id=i1 class='a b'><svg viewbox='0 0 4 4' class=icon>"
    "<circle cx=1/><g class=grp><rect/><text>lbl</text></g>"
    "<lineargradient id=lg><stop/></lineargradient>"
    "<a xlink:href=u><circle class=a/></a>"
    "<foreignObject><p class=a>inner<b>bold</b></p></foreignObject>"
    "<desc>d <span>s</span></desc><title>svgtitle</title></svg>"
    "text tail</div>"
    "<math><mi>x</mi><mo>+</mo><mrow><mn>4</mn></mrow>"
    "<annotation-xml encoding=text/html><ul><li class=a>q</li></ul>"
    "</annotation-xml><semantics definitionurl=d/></math>"
    "<p class=a>after</p><title>late</title></body></html>")

FOREIGN_SELECTORS = [
    "circle", "svg", "g", "rect", "text", "p", "title", "span",
    "linearGradient", "lineargradient",   # foreign types are case-exact
    "foreignObject", "foreignobject", "mi", "mrow", "annotation-xml",
    "*", ".a", ".icon", "#lg", "svg circle", "svg > g", "div svg *",
    "g + lineargradient", "a", "a[href]", "p.a", "body > p",
    "[viewbox]",      # svg attr adjusted to viewBox: lowercase must miss
    "[cx]", "circle[cx]", "svg .a", "foreignObject p", "desc span",
    "math mi", ":not(circle)", "svg :first-child", "p b",
    "div :last-child", "title:empty",
]


def test_cselect_foreign_arena():
    """The C selector engine over arenas with SVG/MathML nodes: type
    selectors are case-exact for foreign elements (matcher.py:167),
    attr names case-exact too (matcher.py:119) — result-identical to
    the Python matcher on every selector."""
    t = _cnode_tree(FOREIGN_DOC)
    assert t is not None, "foreign doc must take the fast lane"
    for sel in FOREIGN_SELECTORS:
        compiled = CompiledSelector(sel)
        prog = get_cprog(compiled)
        if prog is None:
            continue  # unlowerable: python engine handles it
        res = _mod().select_all(t.nodes, (prog,), [0], True)
        assert res is not None
        assert res[0] == _matches_dfs_py(t, [0], compiled, True), sel


def test_ctext_foreign_arena():
    t = _cnode_tree(FOREIGN_DOC)
    assert t is not None
    for nid in range(len(t.nodes)):
        got = _mod().text(t.nodes, nid)
        assert got is not None
        assert got == t._text_py(nid), nid


def test_cselect_foreign_random():
    """Random selectors over random foreign-bearing docs."""
    rng = random.Random(0xFE11)
    base = FOREIGN_DOC
    for trial in range(20):
        t = _cnode_tree(base if trial % 2 == 0
                        else wellformed_random_html(rng, n_elems=15)
                        + "<svg class=icon><g><circle cx=1/></g>"
                          "<desc><span class=a>x</span></desc></svg>")
        if t is None:
            continue
        for _ in range(20):
            sel = random_selector(rng)
            compiled = CompiledSelector(sel)
            prog = get_cprog(compiled)
            if prog is None:
                continue
            res = _mod().select_all(t.nodes, (prog,), [0], True)
            assert res is not None
            assert res[0] == _matches_dfs_py(t, [0], compiled, True), sel


def test_ctext_differential():
    t = _cnode_tree(EDGE_DOC)
    mod = _mod()
    for nid in range(len(t.nodes)):
        got = mod.text(t.nodes, nid)
        assert got is not None
        assert got == t._text_py(nid), nid


def test_ctext_document_quirk_and_random():
    rng = random.Random(4242)
    for _ in range(10):
        t = _cnode_tree(wellformed_random_html(rng, n_elems=30))
        if t is None:
            continue
        assert _mod().text(t.nodes, 0) == "" == t._text_py(0)
        for nid in range(len(t.nodes)):
            assert _mod().text(t.nodes, nid) == t._text_py(nid)


def test_mixed_arena_falls_back():
    """DOM mutation grafts Python nodes into a CNode arena: the C engine
    must decline and the public API must stay correct."""
    doc = Document("<div id='d'><p>a</p></div>")
    if type(doc.tree.nodes[0]).__name__ != "CNode":
        pytest.skip("doc fell back to the Python machine")
    doc.select("#d").append_html("<em class='n'>new</em>")
    assert any(type(n).__name__ != "CNode" for n in doc.tree.nodes)
    prog = get_cprog(compile_selector("em.n"))
    assert _mod().select_all(doc.tree.nodes, (prog,), [0], True) is None
    # text on the document node may answer "" (the Document quirk) without
    # walking; the mutated subtree itself must decline
    div = doc.select("#d").nids[0]
    assert _mod().text(doc.tree.nodes, div) is None
    assert doc.select("#d").text() == "anew"
    # public API transparently uses the Python engine
    assert doc.select("em.n").text() == "new"
    compiled = compile_selector("em.n, p")
    assert _matches_dfs(doc.tree, [0], compiled, True) \
        == _matches_dfs_py(doc.tree, [0], compiled, True)


def test_api_results_identical_with_and_without_cselect(monkeypatch):
    """Whole-API differential: select/try_select/nested select/text on a
    real page with the C engine on vs off."""
    import nipper_ray.css.lower as lower
    import nipper_ray.dom as dom
    from conftest import load_fixture

    html = load_fixture("page.html")
    sels = ["a[href]", "head title", "div p", "li:first-child",
            "p:not(.lead)", "*"]

    def snapshot():
        doc = Document(html)
        out = []
        for s in sels:
            sel = doc.select(s)
            out.append((s, list(sel.nids), sel.text()))
            nested = sel.select("a, b, span")
            out.append((s + " nested", list(nested.nids)))
        return out

    with_c = snapshot()
    monkeypatch.setenv("NIPPER_RAY_NO_CSELECT", "1")
    monkeypatch.setattr(lower, "_PROGS", {})
    monkeypatch.setattr(dom, "_CTEXT", None)
    monkeypatch.setattr(dom, "_CTEXT_TRIED", False)
    without_c = snapshot()
    monkeypatch.setattr(dom, "_CTEXT", None)
    monkeypatch.setattr(dom, "_CTEXT_TRIED", False)
    assert with_c == without_c


def test_unlowerable_ir_is_rejected_cleanly():
    """compile_program validates; garbage IR raises, never crashes."""
    mod = _mod()
    with pytest.raises((ValueError, TypeError)):
        mod.compile_program("nope")
    with pytest.raises((ValueError, TypeError)):
        mod.compile_program((("bad",), None))
    # a valid lowering round-trips
    ir = lower_ir(CompiledSelector("a.b:not([href^='x']) > *"))
    assert ir is not None
    assert mod.compile_program(ir) is not None
