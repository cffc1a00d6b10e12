"""Selector / traversal / property / query / manipulation assertions ported
1:1 from the reference test suite:
/root/reference/tests/selection-{traversal,property,query,manipulation}.rs
plus the lib.rs doctest and the Document::text() quirk."""

import pytest

from nipper_ray.api import Document, Matcher
from nipper_ray.css.parser import SelectorError

from conftest import load_fixture


@pytest.fixture(scope="module")
def page():
    return load_fixture("page.html")


@pytest.fixture(scope="module")
def page2():
    return load_fixture("page2.html")


@pytest.fixture(scope="module")
def doc(page):
    return Document(page)


# -- selection-traversal.rs -------------------------------------------------

def test_select(doc):
    assert doc.select("div.row-fluid").length() == 9


def test_select_not_self(doc):
    assert doc.select("h1").select("h1").length() == 0


def test_select_invalid(doc):
    with pytest.raises(SelectorError):
        doc.select(":+ ^")


def test_select_big():
    docwiki = Document(load_fixture("rustwiki.html"))
    assert docwiki.select("li").length() == 420
    assert docwiki.select("span").length() == 706


def test_chained_select(doc):
    assert doc.select("div.hero-unit").select(".row-fluid").length() == 4


def test_chained_select_invalid(doc):
    with pytest.raises(SelectorError):
        doc.select("div.hero-unit").select("")


def test_children(doc):
    assert doc.select(".pvk-content").children().length() == 5


def test_parent(doc):
    assert doc.select(".container-fluid").parent().length() == 3


def test_parent_body(doc):
    assert doc.select("body").parent().length() == 1


def test_next(doc):
    assert doc.select("h1").next_sibling().length() == 1


def test_next2(doc):
    assert doc.select(".close").next_sibling().length() == 1


def test_next_none(doc):
    assert doc.select("small").next_sibling().length() == 0


NTH_DOC = """<!DOCTYPE html>
    <html lang="en">
        <head></head>

        <body>
            <div id="bggrad"></div>
            <div class="container container-header"></div>
            <div class="container container-main">
                <nav class="navbar navbar-default navbar-static-top"></nav>
                <div class="row">
                    <div class="col-xs-12"></div>
                    <div class="col-xs-12"></div>
                    <div class="col-md-10">
                        <a href="\\#">foo</a>
                    </div>
                </div>
            </div>
        </body>
    </html>"""


def test_nth_child():
    d = Document(NTH_DOC)
    sel = d.select("body > div.container.container-main > "
                   "div.row:nth-child(2) > div.col-md-10 > a")
    assert sel.length() == 1


# -- selection-property.rs --------------------------------------------------

def test_attr_exists(doc):
    assert doc.select("a").attr("href") is not None


def test_attr_or(doc):
    assert doc.select("a").attr_or("fake-attribute", "alternative") \
        == "alternative"
    assert doc.select("zz").attr_or("fake-attribute", "alternative") \
        == "alternative"


def test_attr_not_exist(doc):
    assert doc.select("div.row-fluid").attr("href") is None


def test_remove_attr(page2):
    d = Document(page2)
    sel = d.select("div")
    sel.remove_attr("id")
    assert sel.attr("id") is None


def test_set_attr(page2):
    d = Document(page2)
    sel = d.select("#main")
    sel.set_attr("id", "not-main")
    assert sel.attr("id") == "not-main"


def test_set_attr2(page2):
    d = Document(page2)
    sel = d.select("#main")
    sel.set_attr("foo", "bar")
    assert sel.attr("foo") == "bar"


def test_text(doc):
    assert doc.select("h1").text().strip() == "Provok.in"


def test_add_class(page2):
    d = Document(page2)
    sel = d.select("#main")
    sel.add_class("main main main")
    assert sel.attr("class") == "main"


def test_add_class_similar(page2):
    d = Document(page2)
    sel = d.select("#nf5")
    sel.add_class("odd")
    assert sel.has_class("odd")
    assert sel.has_class("odder")


def test_add_empty_class(page2):
    d = Document(page2)
    sel = d.select("#main")
    sel.add_class("")
    assert sel.attr("class") is None


def test_add_classes(page2):
    d = Document(page2)
    sel = d.select("#main")
    sel.add_class("a b")
    assert sel.has_class("a")
    assert sel.has_class("b")


def test_has_class(doc):
    assert doc.select("div").has_class("span12")


def test_has_class_none(doc):
    assert not doc.select("toto").has_class("toto")


def test_has_class_not_first(doc):
    assert doc.select(".alert").has_class("alert-error")


def test_remove_class(page2):
    d = Document(page2)
    sel = d.select("#nf1")
    sel.remove_class("one row")
    assert sel.has_class("even")
    assert not sel.has_class("one")
    assert not sel.has_class("row")


def test_remove_class_similar(page2):
    d = Document(page2)
    sel = d.select("#nf5, #nf6")
    assert sel.length() == 2
    sel.remove_class("odd")
    assert sel.has_class("odder")


# -- selection-query.rs -----------------------------------------------------

def test_is(doc):
    assert doc.select(".footer p:nth-child(1)").is_("p")


def test_is_invalid(doc):
    assert not doc.select(".footer p:nth-child(1)").is_("")


def test_is_selection(doc):
    sel = doc.select("div")
    sel2 = doc.select(".pvk-gutter")
    assert sel.is_selection(sel2)


def test_is_selection_not(doc):
    sel = doc.select("div")
    sel2 = doc.select("a")
    assert not sel.is_selection(sel2)


# -- selection-manipulation.rs ----------------------------------------------

def test_replace_with_html(page2):
    d = Document(page2)
    sel = d.select("#main,#foot")
    sel.replace_with_html('<div id="replace"></div>')
    assert d.select("#replace").length() == 2


def test_set_html(page2):
    d = Document(page2)
    q = d.select("#main, #foot")
    q.set_html('<div id="replace">test</div>')
    assert d.select("#replace").length() == 2
    assert d.select("#main, #foot").length() == 2
    assert q.text() == "testtest"


def test_set_html_no_match(page2):
    d = Document(page2)
    q = d.select("#notthere")
    q.set_html('<div id="replace">test</div>')
    assert d.select("#replace").length() == 0


def test_set_html_empty(page2):
    d = Document(page2)
    q = d.select("#main")
    q.set_html("")
    assert d.select("#main").length() == 1
    assert d.select("#main").children().length() == 0


def test_replace_with_selection(page2):
    d = Document(page2)
    s1 = d.select("#nf5")
    sel = d.select("#nf6")
    sel.replace_with_selection(s1)
    assert sel.is_("#nf6")
    assert d.select("#nf6").length() == 0
    assert d.select("#nf5").length() == 1


# -- misc reference-pinned behaviors ---------------------------------------

def test_document_text_quirk(page):
    # Document::text() always "" (dom_tree.rs:940-944 skips the root)
    assert Document(page).text() == ""


def test_lib_doctest():
    d = Document('<div><a href="/1">One</a><a href="/2">Two</a>'
                 '<a href="/3">Three</a></div>')
    assert d.select("a:nth-child(3)").text() == "Three"


def test_matcher_reuse():
    m = Matcher.new("div.x")
    assert m is not None
    d1 = Document('<div class="x">a</div>')
    d2 = Document('<div class="x">b</div><div class="x">c</div>')
    assert d1.select_matcher(m).length() == 1
    assert d2.select_matcher(m).length() == 2
    assert Matcher.new(":+ ^") is None


def test_try_select(doc):
    assert doc.try_select("div.row-fluid") is not None
    assert doc.try_select(":+ ^") is None
    assert doc.try_select("zzz") is None


def test_hacker_news_pattern():
    d = Document(load_fixture("hacker_news.html"))
    rows = d.select("tr.athing")
    assert rows.length() > 0
    for row in rows.iter():
        title = row.select(".title a").first()
        assert title.text().strip() != ""
