"""jQuery-style Document / Selection API with the reference's semantics.

Mirrors the observable API surface of the reference crate:

- ``Document.select`` / ``nip`` / ``try_select`` / ``select_matcher``
  (/root/reference/src/traversal.rs:15-58) — ``select`` raises on an
  invalid selector, ``try_select`` returns None on invalid OR zero
  matches and uses ChildrenOnly scope (the subtle asymmetry);
- ``Selection`` query/traversal/property/manipulation methods
  (/root/reference/src/{selection,traversal,property,query,manipulation}.rs);
- ``Matcher`` — precompiled selector reusable across documents
  (/root/reference/src/matcher.rs:13-24).

Trees are transient, UDF-local objects — nothing here touches Ray.
"""

from __future__ import annotations

from .css.lower import get_cprog
from .css.matcher import CompiledSelector, compile_selector
from .css.parser import SelectorError
from .dom import COMMENT, DOCUMENT, ELEMENT, TEXT, Tree
from .html.parser import parse_document, parse_fragment


class Matcher:
    """Precompiled CSS selector (reference Matcher, matcher.rs:13-24)."""

    def __init__(self, sel: str):
        self._c = CompiledSelector(sel)

    @classmethod
    def new(cls, sel: str):
        try:
            return cls(sel)
        except SelectorError:
            return None


def _matches_dfs(tree: Tree, roots, compiled: CompiledSelector,
                 include_node: bool):
    """Preorder DFS over root list (matcher.rs:86-122): children of
    matched nodes are still visited; dedup across overlapping roots.

    On pure-CNode arenas (C fast-lane parses) with a lowerable selector
    the whole walk runs in C (html/_fastlane.c fl_select_all), result-
    identical to the Python DFS below (pinned by
    tests/test_cselect_differential.py)."""
    prog = get_cprog(compiled)
    if prog is not None:
        from .html.fastlane import get

        mod = get()
        if mod is not None:
            res = mod.select_all(tree.nodes, (prog,), roots,
                                 include_node)
            if res is not None:
                return res[0]
    return _matches_dfs_py(tree, roots, compiled, include_node)


def _matches_dfs_py(tree: Tree, roots, compiled: CompiledSelector,
                    include_node: bool):
    seen = set()
    out = []
    nodes = tree.nodes
    for root in roots:
        if include_node:
            stack = [root]
        else:
            stack = list(reversed(tree.children_ids(root)))
        while stack:
            nid = stack.pop()
            c = nodes[nid].last_child
            while c != -1:
                stack.append(c)
                c = nodes[c].prev
            if compiled.match_node(tree, nid) and nid not in seen:
                seen.add(nid)
                out.append(nid)
    return out


class Document:
    """One parsed HTML document (reference Document, document.rs:19-56)."""

    __slots__ = ("tree",)

    def __init__(self, html: str = ""):
        self.tree = parse_document(html)

    @property
    def errors(self) -> list:
        """Recoverable parse errors accumulated during the parse
        (reference: Document.errors, document.rs:24,79-81)."""
        return self.tree.errors

    @property
    def quirks_mode(self) -> str:
        """'no-quirks' | 'limited-quirks' | 'quirks' — the document's
        quirks mode per the WHATWG initial-mode doctype rules
        (reference: Document.quirks_mode set via the set_quirks_mode
        TreeSink callback, document.rs:26-27,100-103).  Field parity
        only: no matching behavior depends on it (the reference
        matcher hardcodes NoQuirks, matcher.rs:26-38)."""
        return self.tree.quirks_mode

    # -- queries (traversal.rs:15-58) ----------------------------------
    def select(self, sel: str) -> "Selection":
        compiled = compile_selector(sel)  # raises SelectorError
        return Selection(self.tree,
                         _matches_dfs(self.tree, [0], compiled, True))

    nip = select

    def try_select(self, sel: str):
        try:
            compiled = compile_selector(sel)
        except SelectorError:
            return None
        nids = _matches_dfs(self.tree, [0], compiled, False)
        return Selection(self.tree, nids) if nids else None

    def select_matcher(self, matcher: Matcher) -> "Selection":
        return Selection(self.tree,
                         _matches_dfs(self.tree, [0], matcher._c, True))

    def select_compiled(self, compiled: CompiledSelector) -> "Selection":
        """Hot-path variant taking a pre-compiled selector directly."""
        return Selection(self.tree,
                         _matches_dfs(self.tree, [0], compiled, True))

    # -- properties (property.rs:5-15) ---------------------------------
    def html(self) -> str:
        return self.tree.serialize(0, include_node=True)

    def text(self) -> str:
        # faithful quirk: the DFS skips the Document root without
        # descending, so this is always "" (dom_tree.rs:940-944)
        return self.tree.text(0)

    def root(self) -> "Selection":
        return Selection(self.tree, [0])


class Selection:
    """Ordered, deduplicated set of matched nodes (selection.rs:7-9)."""

    __slots__ = ("tree", "nids")

    def __init__(self, tree: Tree, nids):
        self.tree = tree
        self.nids = nids

    # -- nested queries (traversal.rs:69-126) ---------------------------
    def select(self, sel: str) -> "Selection":
        compiled = compile_selector(sel)
        return Selection(self.tree,
                         _matches_dfs(self.tree, self.nids, compiled, False))

    nip = select

    def try_select(self, sel: str):
        try:
            compiled = compile_selector(sel)
        except SelectorError:
            return None
        nids = _matches_dfs(self.tree, self.nids, compiled, False)
        return Selection(self.tree, nids) if nids else None

    def select_matcher(self, matcher: Matcher) -> "Selection":
        return Selection(self.tree,
                         _matches_dfs(self.tree, self.nids, matcher._c,
                                      False))

    # -- predicates (query.rs:8-52) -------------------------------------
    def is_(self, sel: str) -> bool:
        try:
            compiled = compile_selector(sel)
        except SelectorError:
            return False
        return any(compiled.match_node(self.tree, n) for n in self.nids)

    def is_matcher(self, matcher: Matcher) -> bool:
        return any(matcher._c.match_node(self.tree, n) for n in self.nids)

    def is_selection(self, other: "Selection") -> bool:
        o = set(other.nids)
        return any(n in o for n in self.nids)

    # -- properties (property.rs:22-102) ---------------------------------
    def attr(self, name: str):
        if not self.nids:
            return None
        return self.tree.get_attr(self.nids[0], name)

    def attr_or(self, name: str, default: str) -> str:
        v = self.attr(name)
        return v if v is not None else default

    def attrs(self):
        """All attributes of the first node as (name, value) pairs
        (reference Node::attrs, dom_tree.rs:854-862)."""
        if not self.nids:
            return []
        node = self.tree.nodes[self.nids[0]]
        if node.kind != ELEMENT:
            return []
        return [(a[1], a[2]) for a in node.attrs]

    def set_attr(self, name: str, val: str) -> None:
        for n in self.nids:
            self.tree.set_attr(n, name, val)

    def remove_attr(self, name: str) -> None:
        for n in self.nids:
            self.tree.remove_attr(n, name)

    def add_class(self, class_: str) -> None:
        # set-union, space-joined; no-op on blank (dom_tree.rs:777-812)
        parts = [c for c in class_.split(" ") if c.strip()]
        if not parts:
            return
        uniq = list(dict.fromkeys(c.strip() for c in parts))
        for n in self.nids:
            node = self.tree.nodes[n]
            if node.kind != ELEMENT:
                continue
            cur = self.tree.get_attr(n, "class")
            if cur is None:
                self.tree.set_attr(n, "class", " ".join(uniq))
            else:
                val = cur
                for c in uniq:
                    if (" %s " % c) not in (" %s " % val):
                        val = val + " " + c
                self.tree.set_attr(n, "class", val)

    def remove_class(self, class_: str) -> None:
        removes = {c.strip() for c in class_.split(" ") if c.strip()}
        if not removes:
            return
        for n in self.nids:
            cur = self.tree.get_attr(n, "class")
            if cur is None:
                continue
            kept = [c for c in cur.split(" ") if c.strip()
                    and c.strip() not in removes]
            self.tree.set_attr(n, "class", " ".join(kept))

    def has_class(self, class_: str) -> bool:
        target = " %s " % class_.strip()
        for n in self.nids:
            cur = self.tree.get_attr(n, "class")
            if cur is not None and target in (" %s " % cur):
                return True
        return False

    def length(self) -> int:
        return len(self.nids)

    size = length
    __len__ = length

    def exists(self) -> bool:
        return bool(self.nids)

    def html(self) -> str:
        # first node only (property.rs:84-90)
        if not self.nids:
            return ""
        return self.tree.serialize(self.nids[0], include_node=True)

    def text(self) -> str:
        return "".join(self.tree.text(n) for n in self.nids)

    def node_name(self):
        if not self.nids:
            return None
        node = self.tree.nodes[self.nids[0]]
        return node.name if node.kind == ELEMENT else None

    # -- traversal (traversal.rs:140-242) --------------------------------
    def parent(self) -> "Selection":
        out, seen = [], set()
        for n in self.nids:
            p = self.tree.nodes[n].parent
            if p != -1 and p not in seen:
                seen.add(p)
                out.append(p)
        return Selection(self.tree, out)

    def children(self) -> "Selection":
        out, seen = [], set()
        for n in self.nids:
            for c in self.tree.children_ids(n):
                if c not in seen and self.tree.nodes[c].kind == ELEMENT:
                    seen.add(c)
                    out.append(c)
        return Selection(self.tree, out)

    def next_sibling(self) -> "Selection":
        out, seen = [], set()
        for n in self.nids:
            s = self.tree.next_element_sibling(n)
            if s != -1 and s not in seen:
                seen.add(s)
                out.append(s)
        return Selection(self.tree, out)

    next = next_sibling  # deprecated alias (traversal.rs:176-181)

    def prev_sibling(self) -> "Selection":
        out, seen = [], set()
        for n in self.nids:
            s = self.tree.prev_element_sibling(n)
            if s != -1 and s not in seen:
                seen.add(s)
                out.append(s)
        return Selection(self.tree, out)

    def first(self) -> "Selection":
        return Selection(self.tree, self.nids[:1])

    def last(self) -> "Selection":
        return Selection(self.tree, self.nids[-1:])

    def get(self, index: int):
        return self.nids[index] if 0 <= index < len(self.nids) else None

    def iter(self):
        for n in self.nids:
            yield Selection(self.tree, [n])

    __iter__ = iter

    def nodes(self):
        return list(self.nids)

    # -- manipulation (manipulation.rs:36-121) ----------------------------
    def remove(self) -> None:
        for n in self.nids:
            self.tree.remove_from_parent(n)

    def set_html(self, html: str) -> None:
        for n in self.nids:
            self.tree.remove_children(n)
        self.append_html(html)

    def append_html(self, html: str) -> None:
        for n in self.nids:
            frag = parse_fragment(html, "")
            self._graft_children(frag, n)

    def replace_with_html(self, html: str) -> None:
        for n in self.nids:
            frag = parse_fragment(html, "")
            self._graft_before(frag, n)
        self.remove()

    def replace_with_selection(self, sel: "Selection") -> None:
        for n in self.nids:
            for other in sel.nids:
                self.tree.insert_before(n, other)
        self.remove()

    def append_selection(self, sel: "Selection") -> None:
        for n in self.nids:
            for other in sel.nids:
                self.tree.append_child(n, other)

    # fragment grafting (arena merge; reference dom_tree.rs:264-428)
    def _import_subtree(self, frag: Tree, fid: int) -> int:
        fnode = frag.nodes[fid]
        if fnode.kind == ELEMENT:
            n = self.tree.new_element(fnode.name, fnode.ns,
                                     [list(a) for a in fnode.attrs])
            if fnode.template_contents != -1:
                tc = self.tree.new_node(DOCUMENT)
                n.template_contents = tc.id
                for c in frag.children_ids(fnode.template_contents):
                    self.tree.append_child(tc.id,
                                           self._import_subtree(frag, c))
        elif fnode.kind == TEXT:
            n = self.tree.new_text(fnode.data)
        elif fnode.kind == COMMENT:
            n = self.tree.new_comment(fnode.data)
        else:
            n = self.tree.new_node(fnode.kind)
            n.data = fnode.data
            n.data2 = fnode.data2
        if fnode.kind == ELEMENT:
            for c in frag.children_ids(fid):
                self.tree.append_child(n.id, self._import_subtree(frag, c))
        return n.id

    def _frag_top_ids(self, frag: Tree):
        root_children = frag.children_ids(0)
        if not root_children:
            return []
        return frag.children_ids(root_children[0])

    def _graft_children(self, frag: Tree, target: int) -> None:
        for fid in self._frag_top_ids(frag):
            self.tree.append_child(target, self._import_subtree(frag, fid))

    def _graft_before(self, frag: Tree, target: int) -> None:
        for fid in self._frag_top_ids(frag):
            self.tree.insert_before(target, self._import_subtree(frag, fid))
