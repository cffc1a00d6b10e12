"""Additional API-parity pins for reference behaviors not covered by the
ported test files (SURVEY.md §2 operator inventory completeness)."""

from nipper_ray.api import Document, Matcher

from conftest import load_fixture


def _doc():
    return Document(load_fixture("page.html"))


def test_first_last_get():
    d = _doc()
    sel = d.select("div.row-fluid")
    assert sel.first().length() == 1
    assert sel.last().length() == 1
    assert sel.first().nids[0] == sel.nids[0]
    assert sel.last().nids[0] == sel.nids[-1]
    assert sel.get(0) == sel.nids[0]
    assert sel.get(999) is None
    empty = d.select("zz")
    assert empty.first().length() == 0
    assert empty.last().length() == 0


def test_iter_yields_single_selections():
    d = _doc()
    sel = d.select("div.row-fluid")
    singles = list(sel.iter())
    assert len(singles) == sel.length()
    assert all(s.length() == 1 for s in singles)
    # DoubleEndedIterator parity: reversed iteration
    rev = list(reversed([s.nids[0] for s in singles]))
    assert rev == list(reversed(sel.nids))


def test_try_select_childrenonly_asymmetry():
    # Document::select uses IncludeNode (the root Document node itself is
    # tested -> :root matches it); try_select uses ChildrenOnly
    # (traversal.rs:35-49), so the root never matches.
    d = _doc()
    assert d.select(":root").length() == 1
    assert d.try_select(":root") is None


def test_node_name():
    d = _doc()
    assert d.select("h1").node_name() == "h1"
    assert d.select("zz").node_name() is None


def test_exists_size_alias():
    d = _doc()
    sel = d.select("div.row-fluid")
    assert sel.exists()
    assert sel.size() == sel.length() == 9
    assert not d.select("zz").exists()


def test_append_html():
    d = Document("<div id='box'><span>a</span></div>")
    sel = d.select("#box")
    sel.append_html("<p class='new'>b</p><p class='new'>c</p>")
    assert d.select("#box p.new").length() == 2
    assert d.select("#box").text() == "abc"


def test_append_selection():
    d = Document("<div id='a'><i>x</i></div><div id='b'></div>")
    src = d.select("#a i")
    dst = d.select("#b")
    dst.append_selection(src)
    assert d.select("#b i").length() == 1
    assert d.select("#a i").length() == 0  # moved, not copied


def test_remove():
    d = _doc()
    n_before = d.select("div").length()
    d.select("div.row-fluid").remove()
    assert d.select("div.row-fluid").length() == 0
    assert d.select("div").length() < n_before


def test_document_html_roundtrip():
    d = Document("<!DOCTYPE html><html><head><title>t</title></head>"
                 "<body><p>x</p></body></html>")
    h = d.html()
    assert h.startswith("<!DOCTYPE html>")
    assert "<p>x</p>" in h
    # reparse of serialization is stable (fixpoint)
    assert Document(h).html() == h


def test_matcher_select_matcher_on_selection():
    d = _doc()
    m = Matcher.new(".row-fluid")
    outer = d.select("div.hero-unit")
    assert outer.select_matcher(m).length() == 4


def test_is_matcher():
    d = _doc()
    m = Matcher.new("p")
    assert d.select(".footer p:nth-child(1)").is_matcher(m)


def test_attr_ops_selection_wide():
    d = Document('<a id="x" href="/1">1</a><a id="y" href="/2">2</a>')
    sel = d.select("a")
    sel.set_attr("rel", "nofollow")
    assert d.select('a[rel="nofollow"]').length() == 2
    sel.remove_attr("href")
    assert d.select("a[href]").length() == 0


def test_selector_grammar_extras():
    d = Document(
        "<ul><li id='a'>1</li><li class='x'>2</li><li>3</li></ul>"
        "<input type='checkbox' Disabled><p data-x='AbC'>t</p>")
    assert d.select("li:first-child").attr("id") == "a"
    assert d.select("li:last-child").text() == "3"
    assert d.select("li:nth-child(2n)").length() == 1
    assert d.select("li:nth-last-child(1)").text() == "3"
    assert d.select("li:not(.x)").length() == 2
    assert d.select("li:only-child").length() == 0
    assert d.select("[data-x='abc' i]").length() == 1
    assert d.select("[data-x^='Ab']").length() == 1
    assert d.select("[data-x$='bC']").length() == 1
    assert d.select("[data-x*='b']").length() == 1
    assert d.select("ul > li + li ~ li").text() == "3"
    assert d.select("li:first-of-type").text() == "1"
    assert d.select("p:last-of-type").length() == 1
    assert d.select("li:nth-of-type(3)").text() == "3"


def test_mutation_then_reserialize_roundtrip():
    # mutations leave a tree whose serialization reparses to a fixpoint
    d = Document(load_fixture("page2.html"))
    d.select("#main").set_html("<p class='x'>new <b>bold</b></p>")
    d.select("#nf2").remove()
    d.select("#nf3").add_class("zed")
    h1 = d.html()
    h2 = Document(h1).html()
    assert h2 == h1
    d2 = Document(h1)
    assert d2.select("#main p.x b").text() == "bold"
    assert d2.select("#nf2").length() == 0
    assert d2.select("#nf3.zed").length() == 1


def test_replace_with_html_multi_node_content():
    d = Document("<ul><li id='a'>1</li><li id='b'>2</li></ul>")
    d.select("#a").replace_with_html("<li>x</li><li>y</li>")
    assert d.select("ul li").length() == 3
    assert d.select("ul").text() == "xy2"


# -- data-model parity: PI nodes + doc.errors (reference document.rs) -------
def test_pi_node_roundtrip():
    """create_pi parity (reference document.rs:152-157): constructible,
    serialized as <?target contents>, invisible to text()."""
    from nipper_ray.api import Document
    from nipper_ray.dom import PI

    doc = Document("<html><body><p>hi</p></body></html>")
    t = doc.tree
    body = [n.id for n in t.nodes if n.kind == 4 and n.name == "body"][0]
    pi = t.new_pi("xml-stylesheet", 'href="a.css"')
    t.append_child(body, pi.id)
    assert t.nodes[pi.id].kind == PI
    assert '<?xml-stylesheet href="a.css">' in doc.html()
    assert doc.select("body").text() == "hi"  # PI skipped by text()


def test_parse_errors_accumulate():
    from nipper_ray.api import Document

    clean = Document("<!DOCTYPE html><html><head><title>t</title></head>"
                     "<body><p>ok</p></body></html>")
    assert clean.errors == []
    # stray doctype + misnested formatting + bogus comment + table text
    messy = Document("<!DOCTYPE html><b><i>x</b>y</i>"
                     "<!DOCTYPE html>"
                     "<?php echo 1 ?>"
                     "<table>loose<tr><td>c</td></tr></table>"
                     "<div></span></div>")
    msgs = set(messy.errors)
    assert any(m.startswith("misnested-tag") for m in msgs)
    assert "unexpected-doctype" in msgs
    assert "bogus-comment" in msgs
    assert "foster-parenting" in msgs
    assert any(m.startswith("unexpected-end-tag") for m in msgs)


def test_parse_errors_do_not_change_recovery():
    """Accumulation is observational: the parse tree is byte-identical
    to before (all 42 goldens still pass = the real guard)."""
    from nipper_ray.api import Document

    d = Document("<b><i>x</b>y</i>")
    assert len(d.errors) >= 1
    assert "<b><i>x</i></b><i>y</i>" in d.html()


def test_link_pseudo_class_is_link_quirk():
    """selectors 0.22 routes :link/:any-link through Element::is_link();
    reference element.rs:134-142 returns true iff local name == "link".
    So <link> matches, <a href> does NOT, and :visited never matches."""
    from nipper_ray.api import Document

    d = Document('<html><head><link rel="stylesheet" href="a.css">'
                 '<link rel="icon"></head>'
                 '<body><a href="/x">anchor</a>'
                 '<area href="/y"><div>t</div></body></html>')
    links = d.select(":any-link")
    assert links.length() == 2
    t = d.tree
    assert all(t.nodes[n].name == "link" for n in links.nodes())
    # :link behaves identically (all links are "unvisited" by default)
    assert d.select(":link").length() == 2
    # anchors/areas with href are NOT links under the reference quirk
    assert d.select("a:any-link").length() == 0
    assert d.select("area:link").length() == 0
    # :visited never matches, not even <link>
    assert d.select(":visited").length() == 0
    assert d.select("link:visited").length() == 0
    # compound usage: attribute filter composes
    assert d.select(':any-link[rel="icon"]').length() == 1


def test_try_select_any_link_asymmetry():
    """try_select(":any-link") is now a VALID selector: returns a
    Selection when it matches and None only when empty (the reference's
    try_select None-on-empty semantics), instead of raising."""
    from nipper_ray.api import Document

    d = Document("<html><head><link href=a></head><body></body></html>")
    sel = d.try_select(":any-link")
    assert sel is not None and sel.length() == 1
    assert d.try_select(":visited") is None  # matches nothing -> None
    no_link = Document("<html><body><a href=x>t</a></body></html>")
    assert no_link.try_select(":any-link") is None
