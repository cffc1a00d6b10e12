"""Differential testing of the selector engine.

An independent left-to-right SET-BASED evaluator (expand candidate sets
through combinators, document-order iteration) is compared against the
production right-to-left backtracking matcher on randomized documents
and selectors. The two implementations share only the simple-selector
predicates' *specification*, not their evaluation strategy, so
structural bugs in either direction (backtracking, dedup, axis
traversal) surface as disagreements."""

import random

import pytest

from nipper_ray.api import Document
from nipper_ray.css.matcher import _match_compound
from nipper_ray.css.parser import parse_selector_list
from nipper_ray.dom import ELEMENT


# -- independent evaluator --------------------------------------------------
def _all_nodes(tree):
    order = []
    stack = [0]
    while stack:
        nid = stack.pop()
        order.append(nid)
        node = tree.nodes[nid]
        c = node.last_child
        while c != -1:
            stack.append(c)
            c = tree.nodes[c].prev
    return order


def _expand(tree, candidates, comb):
    out = set()
    nodes = tree.nodes
    if comb in ("+", "~"):
        # sibling axes are element-only on the LEFT side too: the
        # production matcher walks prev_sibling_element, which can
        # never land on a text/comment node
        candidates = {n for n in candidates if nodes[n].kind == ELEMENT}
    if comb == ">":
        for nid in candidates:
            c = nodes[nid].first_child
            while c != -1:
                out.add(c)
                c = nodes[c].next
    elif comb == " ":
        for nid in candidates:
            stack = [nid]
            while stack:
                cur = stack.pop()
                c = nodes[cur].first_child
                while c != -1:
                    out.add(c)
                    stack.append(c)
                    c = nodes[c].next
    elif comb == "+":
        # Right side of + may be a NON-element (universal/:empty match
        # non-elements; the production matcher walks prev_element_sibling
        # from the matched node).  Candidates on the right are exactly the
        # nodes whose prev_element_sibling == nid: every non-element
        # sibling up to and including the next element sibling.
        for nid in candidates:
            s = nodes[nid].next
            while s != -1:
                out.add(s)
                if nodes[s].kind == ELEMENT:
                    break
                s = nodes[s].next
    elif comb == "~":
        # Any following sibling (element or not) has nid somewhere in its
        # prev-element-sibling chain, since nid itself is an element.
        for nid in candidates:
            s = nodes[nid].next
            while s != -1:
                out.add(s)
                s = nodes[s].next
    return out


def setwise_select(tree, selector: str):
    """Left-to-right evaluation: S_0 = nodes matching compound_0;
    S_i = filter(expand(S_{i-1}, comb_i), compound_i)."""
    result = set()
    everything = _all_nodes(tree)
    for complex_sel in parse_selector_list(selector):
        cur = {n for n in everything
               if _match_compound(tree, n, complex_sel[0][1])}
        for comb, compound in complex_sel[1:]:
            cur = {n for n in _expand(tree, cur, comb)
                   if _match_compound(tree, n, compound)}
        result |= cur
    return result


# -- random generators ------------------------------------------------------
TAGS = ["div", "p", "span", "a", "b", "ul", "li", "em", "link"]
CLASSES = ["x", "y", "z", "row"]


def random_html(rng, n_elems=25):
    out = []
    open_tags = []
    for _ in range(n_elems):
        action = rng.random()
        if action < 0.6 or not open_tags:
            tag = rng.choice(TAGS)
            attrs = ""
            if rng.random() < 0.5:
                attrs += ' class="%s"' % " ".join(
                    rng.sample(CLASSES, rng.randint(1, 2)))
            if rng.random() < 0.3:
                attrs += ' id="i%d"' % rng.randint(0, 9)
            if rng.random() < 0.3:
                attrs += ' data-k="%s"' % rng.choice(["aa", "ab", "b c"])
            out.append("<%s%s>" % (tag, attrs))
            open_tags.append(tag)
            if rng.random() < 0.5:
                out.append(rng.choice(["txt", "more words", ""]))
        else:
            out.append("</%s>" % open_tags.pop())
    while open_tags:
        out.append("</%s>" % open_tags.pop())
    return "".join(out)


def random_selector(rng):
    def compound():
        parts = []
        if rng.random() < 0.7:
            parts.append(rng.choice(TAGS + ["*"]))
        choices = rng.randint(0, 2) if parts else rng.randint(1, 2)
        for _ in range(choices):
            kind = rng.random()
            if kind < 0.35:
                parts.append("." + rng.choice(CLASSES))
            elif kind < 0.5:
                parts.append("#i%d" % rng.randint(0, 9))
            elif kind < 0.7:
                parts.append(rng.choice(
                    ["[data-k]", '[data-k="aa"]', '[data-k^="a"]',
                     '[data-k~="b"]', '[data-k*="b"]']))
            else:
                parts.append(rng.choice(
                    [":first-child", ":last-child", ":nth-child(2)",
                     ":nth-child(odd)", ":only-child", ":empty",
                     ":not(.x)", ":first-of-type", ":nth-of-type(2)",
                     ":any-link", ":link", ":visited"]))
        return "".join(parts)

    sel = compound()
    for _ in range(rng.randint(0, 2)):
        sel += rng.choice([" ", " > ", " + ", " ~ "]) + compound()
    if rng.random() < 0.2:
        sel += ", " + compound()
    return sel


@pytest.mark.parametrize("seed", range(40))
def test_differential(seed):
    rng = random.Random(seed)
    doc = Document(random_html(rng))
    for _ in range(25):
        sel = random_selector(rng)
        got = set(doc.select(sel).nids)
        want = setwise_select(doc.tree, sel)
        assert got == want, (sel, sorted(got), sorted(want))


def test_differential_fixture_page():
    rng = random.Random(999)
    from conftest import load_fixture

    doc = Document(load_fixture("page.html"))
    for _ in range(60):
        sel = random_selector(rng)
        got = set(doc.select(sel).nids)
        want = setwise_select(doc.tree, sel)
        assert got == want, sel
