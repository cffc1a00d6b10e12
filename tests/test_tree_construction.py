"""WHATWG tree-construction structural conformance (beyond the
reference's golden corpus): full-document parses serialized and
compared against the spec-mandated tree shapes."""

import pytest

from nipper_ray.html import parse_document

CASES = [
    ("table_section_closes", "<table><tbody><tfoot><thead>x</table>",
     "<html><head></head><body>x<table><tbody></tbody><tfoot></tfoot>"
     "<thead></thead></table></body></html>"),
    ("html_attrs_first_wins", "<html lang=a><html lang=b><body>x",
     '<html lang="a"><head></head><body>x</body></html>'),
    ("body_attrs_merge", "<body class=a><body id=b>x",
     '<html><head></head><body class="a" id="b">x</body></html>'),
    ("afe_marker_blocks_cell_end",
     "<b><table><td></b><i></table>x",
     "<html><head></head><body><b><table><tbody><tr><td><i></i></td>"
     "</tr></tbody></table>x</b></body></html>"),
    ("table_start_closes_p", "<p><table><p>in</table>after",
     "<html><head></head><body><p></p><p>in</p><table></table>after"
     "</body></html>"),
    ("form_pointer_blocks_second",
     "<form><table><form><tr><td>x</table>",
     "<html><head></head><body><form><table><tbody><tr><td>x</td>"
     "</tr></tbody></table></form></body></html>"),
    ("p_end_in_h1_inserts_empty_p", "<p>1<h1>2</p>3</h1>4",
     "<html><head></head><body><p>1</p><h1>2<p></p>3</h1>4"
     "</body></html>"),
    ("fostered_div_from_row", "<table><tr><div><td>c</table>",
     "<html><head></head><body><div></div><table><tbody><tr><td>c"
     "</td></tr></tbody></table></body></html>"),
    ("fostered_select_in_table", "<table><select><option>o</table>z",
     "<html><head></head><body><select><option>o</option></select>"
     "<table></table>z</body></html>"),
    ("select_in_cell", "<table><tr><td><select><option>c</table>t",
     "<html><head></head><body><table><tbody><tr><td><select>"
     "<option>c</option></select></td></tr></tbody></table>t"
     "</body></html>"),
    ("select_swallows_table", "<select><table><tr><td>x",
     "<html><head></head><body><select>x</select></body></html>"),
    ("ruby_rt_implied", "<ruby>a<rt>r</ruby>",
     "<html><head></head><body><ruby>a<rt>r</rt></ruby></body></html>"),
    ("nobr_sibling", "<nobr>1<nobr>2",
     "<html><head></head><body><nobr>1</nobr><nobr>2</nobr>"
     "</body></html>"),
    ("template_in_table",
     "<table><template><tr><td>t</td></tr></template></table>",
     "<html><head></head><body><table><template><tr><td>t</td></tr>"
     "</template></table></body></html>"),
    ("svg_desc_integration", "<svg><desc><b>bold</b></desc></svg>",
     "<html><head></head><body><svg><desc><b>bold</b></desc></svg>"
     "</body></html>"),
    ("mtext_integration", "<math><mtext><b>b</b></mtext></math>",
     "<html><head></head><body><math><mtext><b>b</b></mtext></math>"
     "</body></html>"),
    ("svg_script_foreign", "<svg><script>var x;</script></svg>after",
     "<html><head></head><body><svg><script>var x;</script></svg>"
     "after</body></html>"),
    ("frameset_noframes",
     "<frameset><frame></frameset><noframes>nf</noframes>",
     "<html><head></head><frameset><frame></frameset>"
     "<noframes>nf</noframes></html>"),
    ("frameset_after_body_ignored", "<body><frameset>x</frameset>",
     "<html><head></head><body>x</body></html>"),
    ("a_in_a_adoption", "<a>1<a>2</a>",
     "<html><head></head><body><a>1</a><a>2</a></body></html>"),
    ("button_closes_button", "<button>1<button>2",
     "<html><head></head><body><button>1</button><button>2</button>"
     "</body></html>"),
    ("option_optgroup_implied", "<option>a<optgroup>g<option>b",
     "<html><head></head><body><option>a</option><optgroup>g"
     "<option>b</option></optgroup></body></html>"),
    ("svg_title_not_rcdata", "<svg><title>t</title></svg>tail",
     "<html><head></head><body><svg><title>t</title></svg>tail"
     "</body></html>"),
    ("implied_tbody", "<table><tr><td>x</td></tr></table>",
     "<html><head></head><body><table><tbody><tr><td>x</td></tr>"
     "</tbody></table></body></html>"),
    ("foster_text", "<table>foo<tr><td>x</td></tr></table>",
     "<html><head></head><body>foo<table><tbody><tr><td>x</td></tr>"
     "</tbody></table></body></html>"),
    ("select_options", "<select><option>a<option>b</select>",
     "<html><head></head><body><select><option>a</option>"
     "<option>b</option></select></body></html>"),
    ("p_closed_by_div", "<p>a<div>b</div>",
     "<html><head></head><body><p>a</p><div>b</div></body></html>"),
    ("adoption_b_p", "<b>1<p>2</b>3</p>",
     "<html><head></head><body><b>1</b><p><b>2</b>3</p></body></html>"),
    ("li_implied_end", "<ul><li>a<li>b</ul>",
     "<html><head></head><body><ul><li>a</li><li>b</li></ul>"
     "</body></html>"),
    ("template_in_head", "<template><tr><td>x</td></tr></template>",
     "<html><head><template><tr><td>x</td></tr></template></head>"
     "<body></body></html>"),
    ("dt_dd", "<dl><dt>t<dd>d</dl>",
     "<html><head></head><body><dl><dt>t</dt><dd>d</dd></dl>"
     "</body></html>"),
    ("caption_col", "<table><caption>c</caption><col><tr><td>x</td></table>",
     "<html><head></head><body><table><caption>c</caption>"
     "<colgroup><col></colgroup><tbody><tr><td>x</td></tr></tbody>"
     "</table></body></html>"),
    ("svg_foreign_object",
     "<svg><circle cx='1'/><foreignObject><p>para</p></foreignObject></svg>",
     '<html><head></head><body><svg><circle cx="1"></circle>'
     "<foreignObject><p>para</p></foreignObject></svg></body></html>"),
    ("mathml_annotation",
     "<math><mi>x</mi><annotation-xml encoding='text/html'>"
     "<p>h</p></annotation-xml></math>",
     '<html><head></head><body><math><mi>x</mi>'
     '<annotation-xml encoding="text/html"><p>h</p></annotation-xml>'
     "</math></body></html>"),
    ("a_implicit_close", "<a href='1'>one<a href='2'>two",
     '<html><head></head><body><a href="1">one</a><a href="2">two</a>'
     "</body></html>"),
    ("nested_buttons", "<p>x<button>b<button>c</button>",
     "<html><head></head><body><p>x<button>b</button>"
     "<button>c</button></p></body></html>"),
    ("multi_cells", "<table><tr><td>a<td>b<tr><td>c</table>",
     "<html><head></head><body><table><tbody><tr><td>a</td><td>b</td>"
     "</tr><tr><td>c</td></tr></tbody></table></body></html>"),
    ("frameset", "<frameset><frame src='x'></frameset>",
     '<html><head></head><frameset><frame src="x"></frameset></html>'),
    ("explicit_head_body", "<head><meta><title>t</title></head><body>b",
     "<html><head><meta><title>t</title></head><body>b</body></html>"),
    ("adoption_multi_div", "<a>1<div>2<div>3</a>4",
     "<html><head></head><body><a>1</a><div><a>2</a><div><a>3</a>4"
     "</div></div></body></html>"),
    ("adoption_b_i", "<b><i></b></i>x",
     "<html><head></head><body><b><i></i></b>x</body></html>"),
    ("reconstruct_across_p", "<p>1<b>2<p>3",
     "<html><head></head><body><p>1<b>2</b></p><p><b>3</b></p>"
     "</body></html>"),
    ("formatting_spans_table", "<b>A<table><tr><td>B</td></tr></table>C</b>",
     "<html><head></head><body><b>A<table><tbody><tr><td>B</td></tr>"
     "</tbody></table>C</b></body></html>"),
    ("adoption_i_p", "<i><p>x</i>y</p>",
     "<html><head></head><body><i></i><p><i>x</i>y</p></body></html>"),
]


@pytest.mark.parametrize("name,inp,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_tree_construction(name, inp, expected):
    t = parse_document(inp)
    html_el = t.children_ids(0)[-1]
    assert t.serialize(html_el, include_node=True) == expected


def test_template_excluded_from_text():
    from nipper_ray.api import Document

    d = Document("<body>a<template>hidden</template>b</body>")
    assert d.select("body").text() == "ab"


def test_foster_text_order_in_text():
    # foster-parented text lands BEFORE the table in document order
    from nipper_ray.api import Document

    d = Document("<body><table>foo<tr><td>bar</td></tr></table></body>")
    assert d.select("body").text() == "foobar"
