"""CSS selector matching engine with the reference's Element semantics.

Faithful to the `selectors` 0.22 matching behavior as bound by the
reference's Element impl (/root/reference/src/element.rs:13-218):

- matching is attempted on EVERY node kind the DFS visits (text, comment,
  document); non-element nodes fail name/attr/class tests but `*` matches
  unconditionally (selectors 0.22 ExplicitUniversalType);
- parent traversal uses the raw parent (including the Document node,
  element.rs:21-23); sibling axes skip non-element nodes
  (dom_tree.rs:709-744);
- `:root` matches the *document* node (element.rs:215-217);
- `:empty` means no element or text children (element.rs:207-212);
- type selectors compare the lowercased name for HTML-namespace elements
  and the original case for foreign (svg/mathml) elements;
- nth-* pseudo-classes count *element* siblings only.

The DFS (`Matches`) replicates /root/reference/src/matcher.rs:41-123:
lazy preorder, children of matched nodes still visited, dedup across
overlapping roots, IncludeNode vs ChildrenOnly scope.
"""

from __future__ import annotations

from ..dom import DOCUMENT, ELEMENT, TEXT, HTML_NS
from .parser import parse_selector_list


class CompiledSelector:
    """A parsed, reusable selector list (reference Matcher,
    matcher.rs:13-24)."""

    __slots__ = ("source", "selectors", "fast_names")

    def __init__(self, source: str):
        self.source = source
        self.selectors = parse_selector_list(source)
        # fast reject: if every complex selector's rightmost compound
        # has a type selector, a node whose tag is not among them can
        # never match — one set lookup instead of the full matcher
        names = set()
        for complex_sel in self.selectors:
            compound = complex_sel[-1][1]
            t = next((s for s in compound if s[0] == "type"), None)
            if t is None:
                names = None
                break
            names.add(t[1])
            names.add(t[2])
        self.fast_names = names

    def match_node(self, tree, nid: int) -> bool:
        if self.fast_names is not None:
            node = tree.nodes[nid]
            if node.kind != ELEMENT or node.name not in self.fast_names:
                return False
        for complex_sel in self.selectors:
            if _match_complex(tree, nid, complex_sel):
                return True
        return False


_CACHE: dict = {}


def compile_selector(source: str) -> CompiledSelector:
    """Compile with a process-wide cache (one compile per worker)."""
    sel = _CACHE.get(source)
    if sel is None:
        sel = CompiledSelector(source)
        if len(_CACHE) < 4096:
            _CACHE[source] = sel
    return sel


# ---------------------------------------------------------------------------
def _match_complex(tree, nid: int, parts) -> bool:
    return _match_parts(tree, nid, parts, len(parts) - 1)


def _match_parts(tree, nid: int, parts, idx: int) -> bool:
    comb, compound = parts[idx]
    if not _match_compound(tree, nid, compound):
        return False
    if idx == 0:
        return True
    prev_comb = comb  # combinator linking parts[idx-1] to parts[idx]
    nodes = tree.nodes
    if prev_comb == ">":
        parent = nodes[nid].parent
        return parent != -1 and _match_parts(tree, parent, parts, idx - 1)
    if prev_comb == " ":
        parent = nodes[nid].parent
        while parent != -1:
            if _match_parts(tree, parent, parts, idx - 1):
                return True
            parent = nodes[parent].parent
        return False
    if prev_comb == "+":
        sib = tree.prev_element_sibling(nid)
        return sib != -1 and _match_parts(tree, sib, parts, idx - 1)
    if prev_comb == "~":
        sib = tree.prev_element_sibling(nid)
        while sib != -1:
            if _match_parts(tree, sib, parts, idx - 1):
                return True
            sib = tree.prev_element_sibling(sib)
        return False
    raise AssertionError(prev_comb)


def _match_compound(tree, nid: int, compound) -> bool:
    node = tree.nodes[nid]
    for simple in compound:
        k = simple[0]
        if k == "type":
            if node.kind != ELEMENT:
                return False
            name = simple[2] if node.ns == HTML_NS else simple[1]
            if node.name != name:
                return False
        elif k == "universal":
            pass
        elif k == "id":
            if node.kind != ELEMENT:
                return False
            ok = False
            for a in node.attrs:
                if a[1] == "id" and a[2] == simple[1]:
                    ok = True
                    break
            if not ok:
                return False
        elif k == "class":
            if node.kind != ELEMENT:
                return False
            val = None
            for a in node.attrs:
                if a[1] == "class":
                    val = a[2]
                    break
            if val is None or simple[1] not in val.split():
                return False
        elif k == "attr":
            if not _match_attr(node, simple):
                return False
        elif k == "pseudo":
            if not _match_pseudo(tree, nid, node, simple[1]):
                return False
        elif k == "nth":
            if not _match_nth(tree, nid, node, simple[1], simple[2],
                              simple[3]):
                return False
        elif k == "not":
            for complex_sel in simple[1]:
                if _match_complex(tree, nid, complex_sel):
                    return False
        else:
            raise AssertionError(k)
    return True


def _match_attr(node, simple) -> bool:
    _, name, name_lower, op, value, ci = simple
    if node.kind != ELEMENT:
        return False
    want = name_lower if node.ns == HTML_NS else name
    actual = None
    for a in node.attrs:
        if a[1] == want:
            actual = a[2]
            break
    if actual is None:
        return False
    if op is None:
        return True
    if ci:
        actual = actual.lower()
        value = value.lower()
    if op == "=":
        return actual == value
    if op == "~=":
        if not value or any(c.isspace() for c in value):
            return False
        return value in actual.split()
    if op == "|=":
        return actual == value or actual.startswith(value + "-")
    if op == "^=":
        return bool(value) and actual.startswith(value)
    if op == "$=":
        return bool(value) and actual.endswith(value)
    if op == "*=":
        return bool(value) and value in actual
    raise AssertionError(op)


def _match_pseudo(tree, nid, node, name) -> bool:
    if name == "link" or name == "any-link":
        # selectors 0.22 evaluates :link/:any-link via Element::is_link();
        # the reference impl (element.rs:134-142) returns true iff the node
        # is an element whose LOCAL NAME is literally "link" (any namespace,
        # href irrelevant) — so <link> matches and <a href> does not.
        return node.kind == ELEMENT and node.name == "link"
    if name == "visited":
        # Default VisitedHandlingMode::AllLinksUnvisited: never matches.
        return False
    if name == "root" or name == "scope":
        # :root matches the Document node (element.rs:215-217); with no
        # explicit scope element, :scope behaves the same way.
        return node.kind == DOCUMENT
    if name == "empty":
        c = node.first_child
        nodes = tree.nodes
        while c != -1:
            k = nodes[c].kind
            if k == ELEMENT or k == TEXT:
                return False
            c = nodes[c].next
        return True
    if name == "first-child":
        return tree.prev_element_sibling(nid) == -1
    if name == "last-child":
        return tree.next_element_sibling(nid) == -1
    if name == "only-child":
        return (tree.prev_element_sibling(nid) == -1
                and tree.next_element_sibling(nid) == -1)
    if name == "first-of-type":
        return _nth_index(tree, nid, node, of_type=True, from_end=False) == 1
    if name == "last-of-type":
        return _nth_index(tree, nid, node, of_type=True, from_end=True) == 1
    if name == "only-of-type":
        return (_nth_index(tree, nid, node, True, False) == 1
                and _nth_index(tree, nid, node, True, True) == 1)
    raise AssertionError(name)


def _nth_index(tree, nid, node, of_type: bool, from_end: bool) -> int:
    nodes = tree.nodes
    idx = 1
    step = tree.next_element_sibling if from_end else tree.prev_element_sibling
    sib = step(nid)
    while sib != -1:
        if not of_type:
            idx += 1
        else:
            s = nodes[sib]
            if (node.kind == ELEMENT and s.kind == ELEMENT
                    and s.name == node.name and s.ns == node.ns):
                idx += 1
        sib = step(sib)
    return idx


def _match_nth(tree, nid, node, kind, a, b) -> bool:
    of_type = kind.endswith("of-type")
    from_end = "last" in kind
    if of_type and node.kind != ELEMENT:
        # is_same_type is false for non-elements (element.rs:84-95),
        # so the index is always 1
        idx = 1
    else:
        idx = _nth_index(tree, nid, node, of_type, from_end)
    if a == 0:
        return idx == b
    d = idx - b
    if a > 0:
        return d >= 0 and d % a == 0
    return d <= 0 and (-d) % (-a) == 0
