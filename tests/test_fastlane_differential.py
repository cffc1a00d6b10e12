"""Differential: the C whole-document fast lane (html/_fastlane.c via
html/fastlane.py) must either ABORT (return None -> Python fallback) or
produce an arena that is node-for-node IDENTICAL to the pure-Python
TreeBuilder — same ids, kinds, names, attrs, linkage, text, AND the
same accumulated parse errors (since the full adoption agency landed,
the lane handles the misnested-formatting and stray-end-tag ERROR
paths too, recording the identical Tree.errors strings in order).

Strictly stronger than serialize-equality: id-level identity pins the
fast lane to the exact creation order of the reference machine, which
keeps every downstream consumer (css matcher, api mutation, serializer)
oblivious to which lane produced the tree."""

import glob
import os
import pickle
import random

import pytest

from nipper_ray.html import fastlane
from nipper_ray.html.treebuilder import TreeBuilder

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

pytestmark = pytest.mark.skipif(fastlane.get() is None,
                                reason="fast lane unavailable")

FIELDS = ("id", "kind", "parent", "first_child", "last_child", "prev",
          "next", "name", "ns", "attrs", "data", "data2",
          "template_contents", "mathml_aip")


def _assert_same(fast, py, label):
    assert len(fast.nodes) == len(py.nodes), label
    for x, y in zip(fast.nodes, py.nodes):
        for f in FIELDS:
            assert getattr(x, f) == getattr(y, f), \
                "%s: node %d field %s: %r != %r" % (
                    label, y.id, f, getattr(x, f), getattr(y, f))
    assert fast.errors == py.errors, \
        "%s: errors %r != %r" % (label, fast.errors, py.errors)
    assert fast.quirks_mode == py.quirks_mode, \
        "%s: quirks %r != %r" % (label, fast.quirks_mode, py.quirks_mode)


def _check(html, label=None):
    """Returns True when the fast lane handled the input."""
    label = label or html[:120]
    fast = fastlane.parse_document_fast(html)
    py = TreeBuilder().parse(html)
    if fast is None:
        return False
    _assert_same(fast, py, label)
    # end-to-end sanity on the public reads
    assert fast.serialize(0) == py.serialize(0), label
    assert fast.text(0) == py.text(0), label
    return True


def test_edge_cases_differential():
    from test_ctokenizer_differential import EDGE_CASES

    handled = sum(1 for html in EDGE_CASES if _check(html))
    # every insertion mode + every tokenizer recovery path is native:
    # the WHOLE edge battery rides the lane
    assert handled == len(EDGE_CASES), handled


def test_fixture_pages_differential():
    for p in glob.glob(os.path.join(FIXTURES, "*.html")):
        with open(p, encoding="utf-8", errors="replace") as f:
            _check(f.read(), label=os.path.basename(p))


def test_all_fixture_pages_take_fast_lane():
    """With table-mode support every shipped real-world fixture page is
    error-free under the Python machine and must ride the C lane (the
    212KB rustwiki page and the table-soup hacker_news page included)."""
    for p in glob.glob(os.path.join(FIXTURES, "*.html")):
        with open(p, encoding="utf-8", errors="replace") as f:
            html = f.read()
        assert _check(html, label=os.path.basename(p)), os.path.basename(p)


def test_table_modes_differential():
    """IN_TABLE / TABLE_BODY / ROW / CELL / CAPTION / COLUMN_GROUP /
    TABLE_TEXT — whitespace-formatted tables are the common real-web
    shape and must not abort."""
    cases = [
        "<table><tr><td>x</td></tr></table>",
        "<table>\n<tr>\n<td>x</td>\n</tr>\n</table>",
        "<table><tbody>\n<tr><td>a</td><td>b</td></tr>\n"
        "<tr><td>c</td></tr>\n</tbody></table>",
        "<table>\n  <thead><tr><th>h1</th><th>h2</th></tr></thead>\n"
        "  <tbody><tr><td>c</td></tr></tbody>\n"
        "  <tfoot><tr><td>f</td></tr></tfoot>\n</table>",
        "<table><caption>cap <b>bold</b></caption><tr><td>x</td></tr>"
        "</table>",
        "<table><colgroup><col span=2><col></colgroup><tr><td>x</td>"
        "</tr></table>",
        "<table><tr><th>h<tr><td>d</table>after",
        "<p>before<table><tr><td><p>inner<table><tr><td>nested</td>"
        "</tr></table></td></tr></table>after",
        "<table><tr><td><ul><li>a<li>b</ul></td><td><b>f</b></td></tr>"
        "</table>",
        "<table><form><tr><td><input type=submit></td></tr></form>"
        "</table>",
        "<table><input type=hidden name=x><tr><td>y</td></tr></table>",
        "<table><script>var x=1;</script><tr><td>s</td></tr></table>",
        "<table><td>implied</table>",
        "<table><thead><tr><th>a</th></tr><tbody><tr><td>b</td></tr>"
        "</table>",
        "<table><tr><td>x<td>y<tr><td>z</table>",
        "<table><caption><p>para</caption><tr><td>x</td></tr></table>",
        "<b><table><tr><td>t</td></tr></table></b>tail",
        "<table></table>",
    ]
    for html in cases:
        assert _check(html), html  # error-free: must NOT abort


def test_table_soup_differential():
    """Deterministic soup over the table alphabet: the C lane either
    aborts or matches the Python machine arena-exactly."""
    rng = random.Random(0x7AB1E)
    atoms = ["<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
             "<th>", "</th>", "<tbody>", "</tbody>", "<thead>",
             "</thead>", "<tfoot>", "</tfoot>", "<caption>",
             "</caption>", "<colgroup>", "</colgroup>", "<col>",
             " ", "\n", "\t", "x", "<b>", "</b>", "<p>", "</p>",
             "<div>", "</div>", "<li>", "<ul>", "</ul>", "<form>",
             "</form>", "<input>", "<a href=x>", "</a>", "<script>",
             "</script>", "<!--", "-->", "&amp;", "<span>", "</span>",
             "<select>", "<template>", "<svg>", "<math>", "<button>",
             "</button>"]
    for trial in range(800):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 60)))
        _check(html, label="table soup %d" % trial)


FOSTER_CASES = [
    # fostered character tokens (non-ws table text)
    "<table>x<tr><td>y</td></tr></table>",
    "<table>abc</table>",
    "<table> x </table>",
    "<table><tbody>z<tr><td>c</td></tr></tbody></table>",
    "<table><tr>q<td>c</td></tr></table>",
    "a<table>b</table>c",
    "<table>1<table>2</table>3</table>",
    # fostered text merging with an existing text node before the table
    "pre<table>mid</table>",
    "pre<table>one<tr>two<td>x</td></table>",
    # fostered elements
    "<table><div>d</div><tr><td>x</td></tr></table>",
    "<table><b>bold</b><tr><td>x</td></tr></table>",
    "<table><p>para<tr><td>x</table>",
    "<table><tr><div>z</div><td>c</td></tr></table>",
    "<table><tbody><span>s</span><tr><td>c</td></tr></tbody></table>",
    "<table><br><tr><td>x</td></tr></table>",
    "<table><img src=u><tr><td>x</td></tr></table>",
    "<table><hr><tr><td>x</td></tr></table>",
    # formatting reconstruction under foster (afe active entries)
    "<b><table>x<tr><td>y</td></tr></table></b>",
    "<b>1<table>2<td>3</table>4",
    "<i><table><tr>t<td>c</td></tr></table></i>tail",
    "<a href=u><table>txt</table></a>",
    "<b><i><table>deep</table></i></b>",
    # fostered input (type != hidden) vs in-place hidden
    "<table><input type=text name=a><tr><td>x</td></tr></table>",
    "<table><input><tr><td>x</td></tr></table>",
    "<table><input type=HIDDEN><input type=text><td>x</table>",
    # adoption agency with a table-ish common ancestor (foster arm)
    "<table><b><tr><td>x</b>y</td></tr></table>",
    "<b><table><tr><td>c</td></tr>z</b></table>",
    "<table><a>1<tr>2</a><td>3</td></tr></table>",
    # end tags fostering / nested tables (the classic misnest)
    "<table><tr><td><table>inner</td></tr></table>",
    "<table><td>a<table>b<td>c</table>d</table>e",
    "<form><table>x<form><tr><td>y</table>",
    # table text split across comments / entities
    "<table>a<!--c-->b<tr><td>x</td></tr></table>",
    "<table>&amp;<tr><td>x</td></tr></table>",
    "<table>a&lt;b<td>x</table>",
]


def test_foster_parenting_differential():
    """Foster parenting in the C lane: non-ws table text, fostered
    start tags, reconstruction-under-foster, the agency's foster arm
    and fostered <input> — arena+errors identical to the Python
    machine (real-web table soup constantly hits these paths)."""
    handled = 0
    for html in FOSTER_CASES:
        if _check(html, label=html):
            handled += 1
    # with the foster arm native, the whole battery must ride the lane
    assert handled == len(FOSTER_CASES), handled


def test_foster_soup_differential():
    """Soup biased to text/formatting interleaved with table structure
    (the foster-heavy alphabet): abort or arena+errors identical."""
    rng = random.Random(0xF057E4)
    atoms = ["<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
             "<tbody>", "</tbody>", "<caption>", "</caption>",
             "x", "y", " ", "\n", "&amp;", "<!--c-->",
             "<b>", "</b>", "<i>", "</i>", "<a href=u>", "</a>",
             "<div>", "</div>", "<p>", "</p>", "<span>", "</span>",
             "<input>", "<input type=hidden>", "<br>", "<img>",
             "<form>", "</form>", "<th>", "</th>", "<col>",
             "<colgroup>", "</colgroup>"]
    for trial in range(800):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 50)))
        _check(html, label="foster soup %d" % trial)


FOREIGN_CASES = [
    # basic svg/math subtrees, self-closing foreign tags
    "<svg><circle cx=1 r=2/><rect/></svg>after",
    "<svg><g><path d=M0></g></svg>",
    "<math><mrow><mi>x</mi><mo>+</mo><mn>1</mn></mrow></math>",
    "<svg/>text",
    "<math/>x",
    "<p>a<svg><circle/>inner</svg>b</p>",
    # tag & attribute case adjustment
    "<svg><lineargradient id=g><stop/></lineargradient></svg>",
    "<svg><clippath><textpath/></clippath></svg>",
    "<svg><fegaussianblur stddeviation=2/></svg>",
    "<svg viewbox='0 0 1 1' preserveaspectratio=meet><rect/></svg>",
    "<svg><animatetransform attributename=x repeatcount=2/></svg>",
    # namespaced attribute adjustment
    "<svg><a xlink:href=u xlink:title=t>link</a></svg>",
    "<math xml:lang=en xml:space=preserve><mi>v</mi></math>",
    "<math><semantics definitionurl=d></semantics></math>",
    "<svg xmlns='http://www.w3.org/2000/svg' xmlns:xlink=xl><g/></svg>",
    # text, entities, comments inside foreign content
    "<svg>plain text</svg>",
    "<svg>&amp; &lt;esc&gt;</svg>",
    "<svg><!--note--><circle/></svg>",
    "<svg><text>label</text></svg>",
    # CDATA sections (foreign only)
    "<svg><![CDATA[x < y & z]]></svg>",
    "<svg><![CDATA[a]]b]]><rect/></svg>",
    "<svg><![CDATA[unterminated tail",
    "<svg><![CDATA[]]></svg>",
    "<math><mi><![CDATA[q]]></mi></math>",
    # rcdata/rawtext names are ORDINARY elements in foreign content
    "<svg><script>var x=1;</script></svg>",
    "<svg><style>.a{}</style></svg>",
    "<svg><title>t<rect/></title></svg>",
    # HTML integration points
    "<svg><foreignObject><div>html</div></foreignObject></svg>",
    "<svg><foreignobject><p>p1<p>p2</foreignobject></svg>",
    "<svg><desc><b>bold</b>text</desc></svg>",
    "<svg><desc><table><tr><td>c</td></tr></table></desc></svg>",
    "<math><annotation-xml encoding=text/html><p>para</p>"
    "</annotation-xml></math>",
    "<math><annotation-xml encoding=APPLICATION/XHTML+XML><div>d"
    "</div></annotation-xml></math>",
    "<math><annotation-xml><svg><circle/></svg></annotation-xml></math>",
    # MathML text integration points
    "<math><mtext><b>bold</b></mtext></math>",
    "<math><mi>x<mglyph/></mi></math>",
    "<math><mo><malignmark/></mo></math>",
    "<math><ms><svg><rect/></svg></ms></math>",
    # breakout tags
    "<svg><div>d</div>rest",
    "<svg><g><h1>heading",
    "<svg>a<b>c</b>",
    "<svg><font color=red>x</font>",
    "<svg><font size=1>y",
    "<svg><font nosuch=1>kept</font></svg>",
    "<math><mi><table><tr><td>t</td></tr></table>",
    "<svg><p>breakout</p></svg>text",
    "<svg><img src=u>",
    "<svg><br>",
    "<svg><span>s</span>",
    "<svg><var>v</var>",
    # non-breakout html-looking names stay foreign
    "<svg><tbody>x</tbody></svg>",
    "<svg><option>o</option></svg>done",
    "<svg><section>s</section></svg>",
    "<svg><form><input></form></svg>",
    # foreign end-tag matching (case-insensitive vs adjusted names)
    "<svg><g><circle></g></svg>",
    "<svg><clippath></clipPath>after",
    "<svg><foreignObject></FOREIGNOBJECT>tail",
    "<svg><g>unclosed",
    "<svg></p></svg>x",
    "<svg><g></div></g></svg>",
    # nesting foreign roots
    "<math><mi><svg><rect/></svg></mi></math>",
    "<svg><desc><svg><circle/></svg></desc></svg>",
    "<svg><desc><math><mi>m</mi></math></desc></svg>",
    # foster parenting x foreign
    "<table><svg><circle/></svg><tr><td>x</td></tr></table>",
    "<table><math><mi>q</mi></math><td>y</table>",
    "<table> <svg></svg> <tr><td>x</table>",
    # adoption agency with foreign elements on the stack
    "<b><svg>x</svg></b>tail",
    "<b><svg></b>y",
    "<p><b><svg><desc><i>q</b>done",
    "<a href=u><svg><a xlink:href=v>inner</a></svg></a>",
    # misc structure
    "<svg><h1>after breakout</h1></svg>",
    "<head><svg><g/></svg></head>body",
    "<svg><foo><bar>z</bar></foo></svg>",
    "<math><semantics><mrow/></semantics></math>",
    "<svg><mtext>not an ip here</mtext>t</svg>",
]


def test_foreign_content_differential():
    """SVG/MathML foreign content in the C lane: ns'd inserts, tag &
    attr case adjustment, xlink/xml namespaced attrs, CDATA, breakout
    tags, HTML/MathML-text integration points, foreign end-tag
    matching, and the interactions with foster parenting and the
    agency — arena+errors identical to the Python machine."""
    handled = 0
    for html in FOREIGN_CASES:
        if _check(html, label=html):
            handled += 1
    assert handled == len(FOREIGN_CASES), handled


def test_foreign_soup_differential():
    """Soup over the foreign+table+formatting alphabet: the C lane
    either aborts or matches the Python machine arena-exactly."""
    rng = random.Random(0xF0E16)
    atoms = ["<svg>", "</svg>", "<math>", "</math>", "<mi>", "</mi>",
             "<mtext>", "</mtext>", "<annotation-xml>",
             "<annotation-xml encoding=text/html>", "</annotation-xml>",
             "<foreignObject>", "</foreignObject>", "<desc>", "</desc>",
             "<title>", "</title>", "<circle/>", "<rect>", "</rect>",
             "<g>", "</g>", "<mglyph/>", "<font>", "<font color=c>",
             "</font>", "<div>", "</div>", "<p>", "</p>", "<b>", "</b>",
             "<i>", "</i>", "<table>", "</table>", "<tr>", "<td>",
             "</td>", "<option>", "</option>", "<span>", "</span>",
             "x", " ", "&amp;", "<![CDATA[c]]>", "<!--k-->",
             "<a xlink:href=u>", "</a>", "<script>", "</script>",
             "<tbody>", "</tbody>", "<h2>", "</h2>", "<input>",
             "<viewbox viewbox=1>", "<clippath>", "</clippath>"]
    for trial in range(800):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 50)))
        _check(html, label="foreign soup %d" % trial)


SELECT_CASES = [
    # option/optgroup stacking
    "<select><option>a<option>b</select>after",
    "<select><option>a</option></select>",
    "<select><optgroup label=g><option>x</optgroup><option>y</select>",
    "<select><option>a<optgroup><option>b</select>",
    "<select><optgroup><optgroup>x</select>",
    "<select><option selected value=v>t</select>",
    # hr inside select
    "<select><hr><option>x</select>",
    "<select><option>1<hr>2</select>",
    # nested select acts as </select>
    "<select><select>y",
    # input/keygen/textarea reset + reprocess
    "<select><input name=i>after</select>x",
    "<select><input/></select>x",
    "<select><keygen>k",
    "<select><textarea>raw&amp;</textarea></select>",
    # anything-else start tags are ignored
    "<select><div>ignored</select>kept",
    "<select><b>ign</b><option>x</select>",
    "<select><svg>ignored<option>o</select>",
    "<select><table><option>o</select>t",
    # characters insert directly (no reconstruction)
    "<select>text between<option>o</select>",
    "<select>&amp;<option>x</select>",
    "<select><!--c--><option>x</select>",
    # script is RAWTEXT even inside select
    "<select><script>var s=1;</script><option>s</select>",
    # end tags
    "<select><option>a</optgroup>b</select>",
    "<select><option><optgroup></option>c</select>",
    "<select></option>x",
    "<select></div></select>after",
    "<select><option>a</p>b</select>",
    "</select>stray",
    "<select><option>EOF",
    # formatting context around select
    "<b><select><option>x</select></b>tail",
    "<p><select><option>q</select>r",
    # select in table modes (fostered insert + select-in-table rules)
    "<table><select><option>x<tr><td>c</td></tr></table>",
    "<table><tr><td><select><option>o</td><td>p</table>",
    "<table><caption><select><option>c</caption>x</table>",
    "<table><select><table>nest",
    "<table><td><select><option>x</table>after",
    "<table><tbody><select><option>b</tbody></table>",
    "<table><tr><select><option>r<td>z</table>",
    "<table><select><tbody><td>y</table>",
    "<table><tr><td><select></table>tail",
    # select end via table-element end tags needs table scope
    "<table><select></td>ignored<option>k</table>",
    # option content is text-only (elements ignored)
    "<select><option><i>nope</i></option></select>",
]


def test_select_differential():
    """IN_SELECT / IN_SELECT_IN_TABLE in the C lane: option/optgroup
    stacking, hr, nested-select-as-end, input/textarea reset-and-
    reprocess, ignored anything-else, script-in-select, the
    select-in-table interactions and reset-mode — arena+errors
    identical to the Python machine."""
    handled = 0
    for html in SELECT_CASES:
        if _check(html, label=html):
            handled += 1
    assert handled == len(SELECT_CASES), handled


def test_select_soup_differential():
    """Soup over the select+table+formatting alphabet."""
    rng = random.Random(0x5E1EC7)
    atoms = ["<select>", "</select>", "<option>", "</option>",
             "<optgroup>", "</optgroup>", "<hr>", "<input>",
             "<input type=hidden>", "<keygen>", "<textarea>",
             "</textarea>", "<script>", "</script>", "<table>",
             "</table>", "<tr>", "</tr>", "<td>", "</td>", "<caption>",
             "</caption>", "<tbody>", "<b>", "</b>", "<div>", "</div>",
             "<p>", "</p>", "<svg>", "</svg>", "<option value=v>",
             "x", " ", "&amp;", "<!--c-->", "<br>", "<li>", "<ul>",
             "</ul>", "<span>", "</span>", "</h1>", "<h1>"]
    for trial in range(800):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 50)))
        _check(html, label="select soup %d" % trial)


APPLET_PLAINTEXT_CASES = [
    # applet/marquee/object: afe marker + default-scope boundary
    "<object><b>x</object>y",
    "<applet><i>a</applet>b",
    "<marquee>scroll</marquee>after",
    "<b><object><i>x</object>y</b>z",      # marker isolates formatting
    "<object><p>inner</object>outer",
    "<object></applet>ignored</object>k",  # name-exact scope/end
    "<applet><marquee>m</applet>tail",
    "<object>unclosed",
    "<b>1<marquee>2</b>3</marquee>4",      # agency can't cross the marker
    "<object><table><tr><td>c</td></tr></table></object>d",
    "<table><object>f</object><td>x</table>",   # fostered object
    "<svg><object>svg-object</object></svg>",   # breakout? object IS breakout? no
    "<object><svg><circle/></svg></object>",
    "<p><object><p>q",
    "</object>stray",
    "<select><object>ign</object><option>o</select>",
    # plaintext: everything after is literal text
    "<plaintext>raw <b>not bold</b> &amp; not an entity",
    "<p>para<plaintext></p>still text<div>",
    "<plaintext>",
    "a<plaintext>b",
    "<table><plaintext>x<tr>",             # fostered plaintext
]


def test_applet_marquee_object_plaintext_differential():
    """applet/marquee/object (afe markers, name-exact default-scope
    end tags) and plaintext (raw-to-EOF) in the C lane."""
    handled = 0
    for html in APPLET_PLAINTEXT_CASES:
        if _check(html, label=html):
            handled += 1
    assert handled == len(APPLET_PLAINTEXT_CASES), handled


TEMPLATE_CASES = [
    # content isolation into template_contents
    "<template>x</template>after",
    "<template><div>d</div></template>",
    "<div><template><p>a<p>b</template>tail</div>",
    "<template>plain &amp; text</template>",
    "<template></template>",
    "<body><template>late</template>",
    # nesting
    "<template><template>nested</template>x</template>y",
    "<template>a<template>b</template>c</template>d",
    # template modes: table tokens re-enter table modes inside contents
    "<template><tr><td>c</td></tr></template>",
    "<template><td>cell</td></template>",
    "<template><col></template>",
    "<template><caption>c</caption></template>",
    "<template><colgroup><col></colgroup></template>",
    "<template><tbody><tr><td>t</td></tr></tbody></template>",
    "<template><table><tr><td>q</td></tr></table></template>",
    # template inside real tables
    "<table><template><tr><td>x</td></tr></template></table>",
    "<table><tr><template><td>t</td></template><td>y</td></tr></table>",
    "<table><tbody><template><tr><td>z</template></tbody></table>",
    "<table><colgroup><template><col></template></colgroup></table>",
    "<table><template></template><tr><td>x</table>",
    # form pointer gates
    "<form><template><form>inner</form></template></form>",
    "<template><form>f</form></template><form>outer</form>",
    "<form>a</form><template><form>b</form></template>",
    "<form><template><form></form><input name=n></template></form>",
    # formatting / agency across the template marker
    "<b><template>x</b>y</template>z",
    "<template><b><p>q</b>done</template>",
    "<b>1<template>2</template>3</b>4",
    "<template><i>fmt</template>outside",
    # head-area templates
    "<head><template><meta></template></head>body",
    "<template><title>t</title></template>",
    "<html><head></head><template>t</template>",
    "<template><script>var x=1;</script></template>",
    "<template><style>.a{}</style></template>",
    # interactions with select / foreign / plaintext-free raw
    "<template><select><option>o</select></template>",
    "<template><svg><circle/></svg></template>",
    "<svg><template>foreign-template</template></svg>",
    "<template><textarea>raw</textarea></template>",
    # gated html/body/head inside template
    "<template><html lang=x>y</template>",
    "<template><body>b</body></template>",
    "<template><head>h</head></template>",
    # end tags inside template content
    "<template></div>ignored</template>k",
    "</template>stray",
    "<template><div>open</template>closed",
    # EOF with open templates
    "<template>unclosed",
    "<template><table><tr>eof",
    "<div><template><b>eof-fmt",
    # reset-mode after nested templates
    "<template><table><template><tr><td>a</template></table></template>",
    "<table><template><td>x</td></template><td>y</table>",
]


def test_template_differential():
    """<template> in the C lane: content isolation into the contents
    document, the template-modes stack, form/html/body pointer gates,
    afe-marker isolation, table-token re-entry, nested templates and
    the EOF pop-and-reprocess — arena+errors identical to the Python
    machine."""
    handled = 0
    for html in TEMPLATE_CASES:
        if _check(html, label=html):
            handled += 1
    assert handled == len(TEMPLATE_CASES), handled


def test_template_soup_differential():
    """Soup over the template+table+formatting+foreign alphabet."""
    rng = random.Random(0x7E3217)
    atoms = ["<template>", "</template>", "<table>", "</table>", "<tr>",
             "</tr>", "<td>", "</td>", "<tbody>", "<caption>",
             "</caption>", "<colgroup>", "<col>", "<form>", "</form>",
             "<input>", "<b>", "</b>", "<i>", "</i>", "<a href=u>",
             "</a>", "<div>", "</div>", "<p>", "</p>", "<select>",
             "</select>", "<option>", "<svg>", "</svg>", "<mi>",
             "<title>", "</title>", "<script>", "</script>", "<head>",
             "</head>", "<body>", "<html>", "x", " ", "&amp;",
             "<!--c-->", "<li>", "<ul>", "</ul>", "<span>", "</span>",
             "<h2>", "</h2>", "<br>", "<img>"]
    for trial in range(800):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 50)))
        _check(html, label="template soup %d" % trial)


FRAMESET_CASES = [
    # honored framesets (frameset_ok still true)
    "<frameset><frame src=a><frame src=b></frameset>",
    "<html><frameset cols='50%,50%'><frame></frameset></html>",
    "<head><title>t</title></head><frameset><frame></frameset>",
    "<frameset><frameset><frame></frameset><frame></frameset>after",
    "<frameset></frameset><noframes>nf</noframes>",
    "<frameset></frameset></html>tail-ws",
    "<frameset>ignored text<frame>more</frameset>",
    "<frameset> \n <frame> </frameset>",
    "<frameset><div>ignored</div><frame></frameset>",
    "<frameset>",
    "<frameset><frame>",
    "</frameset>stray",
    # body replacement when frameset_ok
    "<body bgcolor=x><frameset><frame></frameset>",
    " \n <frameset><frame></frameset>",   # leading ws keeps ok
    "<p></p><frameset>",                  # p sets ok false? (no text)
    # frameset_ok = false => ignored
    "text<frameset><frame></frameset>more",
    "<body>x</body><frameset>ign</frameset>y",
    "<div>d</div><frameset><frame></frameset>tail",
    "<br><frameset>f</frameset>",
    "<hr><frameset>f</frameset>",
    "<input><frameset>f</frameset>",
    "<input type=hidden><frameset><frame></frameset>",  # hidden keeps ok
    "<table><tr><td>c</td></tr></table><frameset>f</frameset>",
    "<textarea>t</textarea><frameset>f</frameset>",
    "<select><option>o</select><frameset>f</frameset>",
    "<img src=u><frameset>f</frameset>",
    "<li><frameset>f</frameset>",
    "<pre></pre><frameset>f</frameset>",
    "<button></button><frameset>f</frameset>",
    "<object></object><frameset>f</frameset>",
    "<iframe>i</iframe><frameset>f</frameset>",
    "<xmp>x</xmp><frameset>f</frameset>",
    "<svg>s</svg><frameset>f</frameset>",     # foreign non-ws text
    "<template>t</template><frameset><frame></frameset>",
    "<table>zz<td>q</table><frameset>f</frameset>",  # fostered text
    # ws-only content keeps frameset_ok true
    "<b> </b><frameset><frame></frameset>",
    "<p>  </p><frameset><frame></frameset>",
    # after-frameset modes
    "<frameset><frame></frameset></html><noframes>n</noframes>",
    "<frameset></frameset> ws <!--c-->",
    "<frameset></frameset></html> <!--c-->x",
    "<frameset><noframes>raw</noframes><frame></frameset>",
]


def test_frameset_differential():
    """frameset / after-frameset modes and exact frameset_ok tracking
    in the C lane — the LAST insertion-mode decline. Arena+errors
    identical to the Python machine on honored and ignored framesets."""
    handled = 0
    for html in FRAMESET_CASES:
        if _check(html, label=html):
            handled += 1
    assert handled == len(FRAMESET_CASES), handled


def test_frameset_soup_differential():
    rng = random.Random(0xF4A3E5)
    atoms = ["<frameset>", "</frameset>", "<frame>", "<noframes>",
             "</noframes>", "<body>", "</body>", "<html>", "</html>",
             "<head>", "</head>", "<div>", "</div>", "<p>", "</p>",
             "<b>", "</b>", "<table>", "</table>", "<td>", "<tr>",
             "<input>", "<input type=hidden>", "<br>", "<hr>", "<img>",
             "<select>", "</select>", "<option>", "<template>",
             "</template>", "<svg>", "</svg>", "<li>", "<button>",
             "</button>", "<pre>", "</pre>", "<textarea>", "</textarea>",
             "x", " ", "\n", "&amp;", "<!--c-->", "<title>", "</title>",
             "<iframe>", "</iframe>", "<xmp>", "</xmp>", "<object>",
             "</object>", "<marquee>", "</marquee>"]
    for trial in range(800):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 50)))
        _check(html, label="frameset soup %d" % trial)


BOGUS_COMMENT_CASES = [
    "</ x>after",
    "</>ignored",          # '</>' is silently dropped (no error)
    "</#bogus>tail",
    "</",
    "a</ b",
    "<?php echo 1 ?>x",
    "<?>y",
    "<?",
    "<!x>k",
    "<!>empty",
    "<!",
    "<!-",                 # not '--': bogus, not comment
    "<![CDATA[not-foreign]]>q",      # cdata outside foreign = bogus
    "<div><![CDATA[z]]></div>",
    "<!doctype html><p>x</p><!bogus>y",
    "<table></ foo><tr><td>c</table>",   # bogus comment in table modes
    "<select><?q></select>",
    "<svg></ p></svg>",                  # bogus inside foreign content
    "<template><?t></template>",
    "</ a>< /b>",          # second is literal text '< /b>'
]


def test_bogus_comment_differential():
    """Bogus-comment recovery (</x, <?, <!junk, CDATA-outside-foreign):
    parse error + raw comment node to '>' or EOF, per tokenizer
    _bogus_comment — previously an abort-to-Python path."""
    handled = 0
    for html in BOGUS_COMMENT_CASES:
        if _check(html, label=html):
            handled += 1
    assert handled == len(BOGUS_COMMENT_CASES), handled


def test_synthetic_corpus_no_fallback():
    """Every synthetic crawl page must take the fast lane (this is the
    hot path the lane exists for) and match the Python machine."""
    from nipper_ray.sources.synth import gen_page_html

    misses = 0
    for doc_id in range(40):
        html = gen_page_html(doc_id, "Lorem ipsum & <dolor> sit amet. "
                             * (doc_id + 1), 4000)
        if not _check(html, label="synth %d" % doc_id):
            misses += 1
    assert misses == 0


def test_goldens_full_document_differential():
    """Golden inputs reparsed as full documents (the goldens themselves
    are fragment-context; the fast lane only does documents)."""
    from test_html_dom import GOLDENS

    for name, inp, _exp in GOLDENS:
        _check(inp, label=name)


def test_adversarial_soup_differential():
    rng = random.Random(0xFA57)
    atoms = ["<", ">", "/", "=", '"', "'", "&", "!", "-", "?", "[", "]",
             " ", "\t", "\n", "\f", "a", "B", "p", "1", "é",
             "中", "<p", "</p>", "<a href=", "&amp;", "<!--", "-->",
             "<script>", "</script>", "<title>", "</title>", "<svg>",
             "</svg>", "<![CDATA[", "]]>", "<!doctype html>", "<table>",
             "<td>", "<li>", "<b>", "</b>", "<plaintext>", "<textarea>",
             "</textarea>", "\r\n", "\r", "<math>", "</math>",
             "<template>", "</template>", "<select>", "<noscript>",
             "<xmp>", "</xmp>", "\x00", "<ul>", "</ul>", "<div>",
             "</div>", "<pre>", "</pre>", "<h1>", "</h1>", "<form>",
             "</form>", "<input>", "<br>", "<hr>", "<em>", "</em>",
             "<button>", "</button>", "<ruby>", "<rt>", "</ruby>",
             "<dd>", "<dt>", "<dl>", "</dl>", "<option>", "<optgroup>",
             "</body>", "</html>", "<body>", "<head>", "</head>",
             "<html>", "<nobr>", "</nobr>", "<a>", "</a>"]
    for trial in range(500):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 80)))
        _check(html, label="soup %d" % trial)


def test_formatting_reconstruction_differential():
    """Active-formatting reconstruction across block boundaries — the
    hairiest part of the subset (afe + Noah's Ark + reconstruct)."""
    cases = [
        "<b>one<p>two</p>three</b>four",
        "<p><b>x</p><p>y</p>",            # reconstruct into second p
        "<li><b>x<li>y",                   # reconstruct into second li
        "<b><b><b><b>noah</b>",            # Noah's Ark cap
        "<b class=a><b class=a><b class=a><b class=a>n</b>",
        "<i>a<div>b</div>c</i>",
        "<a href=1>x<p>y",                 # a reconstructed into p
        "<em><strong>z</strong></em>",
        "<b>x</b><b>y</b>",
        "<u><s><small>deep</small></s></u>tail",
        "<p><code>c</p>after",
    ]
    for html in cases:
        handled = _check(html)
        assert handled, html  # all of these are error-free: must NOT abort


def test_adoption_agency_differential():
    """The full agency in C: misnested formatting, a-in-a, nobr-in-
    nobr, stray end tags — arena-identical INCLUDING Tree.errors."""
    cases = [
        "<b><i>x</b>y</i>",
        "<a href=1>x<a href=2>y</a>",
        "<p>1<b>2<i>3<p>4</b>5</i>6",
        "<div><a>x<div>y</a>z</div></div>",
        "<b>1<p>2</b>3</p>",
        "<nobr>a<nobr>b</nobr>c",
        "<nobr><span><nobr>x",
        "</div>",
        "<span></div>x</span>",
        "<b><em><i>deep</b>tail</em></i>end",
        "<a><b><a>inner</a></b></a>",
        "<b><b><i></b>one</i>",
        "<p><b><div>block</b></div>",
        "<u><p>a</u>b",
        "<a class=x>1<p><a class=y>2",      # a-in-a across a p
        "<i><ul><li>x</i>y</li></ul>",
        "<em>a<section>b</em>c</section>",
        "<s>1<h2>2</s>3</h2>",
        "<font color=r>f<div>g</font>h</div>",
        "<b>1<b>2</b>3</b>4</b>5",          # extra </b>
        "<code>c</em></code>",              # mismatched fmt end
    ]
    handled = 0
    for html in cases:
        if _check(html, label=html):
            handled += 1
    assert handled == len(cases), handled


def test_agency_soup_differential():
    """Soup biased to formatting misnesting: C either aborts or is
    arena+errors identical."""
    rng = random.Random(0xADAB7)
    atoms = ["<b>", "</b>", "<i>", "</i>", "<em>", "</em>", "<a href=x>",
             "<a>", "</a>", "<nobr>", "</nobr>", "<u>", "</u>",
             "<font>", "</font>", "<div>", "</div>", "<p>", "</p>",
             "<li>", "<ul>", "</ul>", "<span>", "</span>", "x", " ",
             "</h1>", "<h1>", "</div>", "</span>", "</li>", "</p>"]
    for trial in range(600):
        html = "".join(rng.choice(atoms)
                       for _ in range(rng.randrange(1, 40)))
        _check(html, label="agency soup %d" % trial)


NUL_CASES = [
    # body text: stripped (all-NUL returns before afe reconstruction)
    "a\x00b",
    "<p>\x00</p>done",
    "<b>z</b>\x00<i>q</i>",
    "<b>z</b>q\x00",
    "\x00",
    "x\x00",
    "<pre>\n\x00x</pre>",
    # foreign text: U+FFFD
    "<svg>a\x00b</svg>",
    "<svg>\x00</svg>",
    "<math><mrow>\x00</mrow></math>",
    "<svg><desc>\x00</desc></svg>",        # html ip: body strip rules
    "<svg><![CDATA[c\x00d]]></svg>",
    # table text: stripped at append; all-empty pending inserts nothing
    "<table>a\x00b<td>x</table>",
    "<table>\x00<td>x</table>",
    "<table> \x00 <tr><td>c</table>",
    # select: stripped but empty string still inserts a text node
    "<select>\x00</select>after",
    "<select>a\x00b<option>o</select>",
    # names / attrs / comments / raw text keep NULs verbatim
    "<p\x00q>x",
    "<p a\x00b=c>x",
    "<p a='v\x00w'>x",
    "<!--c\x00d-->tail",
    "<script>s\x00t</script>",
    "<textarea>r\x00s</textarea>",
    "<title>t\x00u</title>",
    "<template>\x00t</template>",
    "<option>\x00",
]


def test_nul_byte_differential():
    """NUL bytes take the per-context replacement paths natively now
    (strip in body/table/select, U+FFFD in foreign, verbatim in
    names/attrs/comments/raw text) — the input pre-screen is gone."""
    handled = 0
    for html in NUL_CASES:
        if _check(html, label=repr(html)):
            handled += 1
    assert handled == len(NUL_CASES), handled


def test_large_and_cap_edge_documents():
    """Realloc paths (open stack, afe, arena) and the documented input
    caps: large docs must stay arena-identical; cap overflows (attr
    count, tag-name length, template depth, name-cache saturation)
    must DECLINE cleanly, never diverge."""
    lane_cases = [
        "".join("<div class=c%d>" % i for i in range(2000)) + "x",
        "".join("<span>" for _ in range(3000)) + "t"
        + "".join("</span>" for _ in range(3000)),
        "".join("<b><i>" for _ in range(800)) + "q",
        "<div data-big='" + "v" * 50000 + "'>x</div>",
        "<" + "q" * 255 + ">x",          # max tag-name scratch
        "lorem ipsum &amp; dolor " * 8000,
        "".join("<table><tr><td>" for _ in range(200)) + "deep",
        "".join("<template>" for _ in range(63)) + "x",
        "<svg>" + "".join("<g>" for _ in range(2000)) + "leaf",
        "".join("<!--c%d-->" % i for i in range(4000)),
        "".join("<?pi%d>" % i for i in range(4000)),
        "<select>" + "".join("<option>o%d" % i for i in range(3000))
        + "</select>",
    ]
    for i, h in enumerate(lane_cases):
        assert _check(h, label="big-%d" % i), "big-%d declined" % i
    decline_cases = [
        "<div " + " ".join("a%d=v%d" % (i, i) for i in range(200))
        + ">w</div>",                     # > MAX_ATTRS
        "<" + "q" * 300 + ">x",           # tag name over scratch
        "".join("<template>" for _ in range(65)) + "x",  # depth cap
    ]
    for i, h in enumerate(decline_cases):
        assert not _check(h, label="cap-%d" % i), \
            "cap-%d unexpectedly took the lane" % i


def test_fastlane_through_api():
    """Document built on the fast lane supports the full Selection API
    including mutation (CNode is attribute-compatible with dom.Node)."""
    from nipper_ray.api import Document

    html = ("<!DOCTYPE html><html><head><title>T</title></head><body>"
            "<div id=main class='a b'><p>one</p><p>two</p>"
            "<a href='/x'>l</a></div></body></html>")
    doc = Document(html)
    # confirm the fast lane actually produced this tree
    mod = fastlane.get()
    assert any(type(n).__name__ == "CNode" for n in doc.tree.nodes), mod
    sel = doc.select("div#main > p")
    assert sel.length() == 2
    assert sel.text() == "onetwo"
    sel.add_class("added")
    assert "added" in doc.select("p").attr_or("class", "")
    doc.select("a").set_attr("href", "/y")
    assert doc.select("a").attr("href") == "/y"
    doc.select("p").remove()
    assert doc.select("p").length() == 0
    assert "two" not in doc.html()


def test_cnode_pickle_roundtrip():
    """CNode pickles into a plain Python Node (no extension needed on
    the unpickling side)."""
    t = fastlane.parse_document_fast("<p class=x>hi</p>")
    assert t is not None
    blob = pickle.dumps(t.nodes)
    nodes = pickle.loads(blob)
    for a, b in zip(t.nodes, nodes):
        assert type(b).__name__ == "Node"
        for f in FIELDS:
            assert getattr(a, f) == getattr(b, f)


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("NIPPER_RAY_NO_FASTLANE", "1")
    monkeypatch.setattr(fastlane, "_tried", False)
    monkeypatch.setattr(fastlane, "_mod", None)
    assert fastlane.get() is None
    assert fastlane.parse_document_fast("<p>x</p>") is None
    monkeypatch.setattr(fastlane, "_tried", False)
