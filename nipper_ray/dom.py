"""Arena DOM tree + HTML serializer + text extraction.

A from-scratch, pure-Python DOM with the same *observable semantics* as the
reference's arena tree (reference: /root/reference/src/dom_tree.rs:82-574):

- nodes live in a flat arena (``Tree.nodes`` list); ids are creation-ordered
  ints and are never freed or reused (dom_tree.rs:129-136);
- first_child/last_child/prev/next/parent int linkage (dom_tree.rs:566-574);
- ``remove_from_parent`` only unlinks, the node stays in the arena
  (dom_tree.rs:430-462);
- ``text()`` is an iterative preorder DFS that descends only into Element
  nodes and collects Text contents; Document/comment/doctype/PI nodes are
  skipped *without descending*, so ``Document.text() == ""``
  (dom_tree.rs:928-951);
- serialization follows html5ever's HtmlSerializer rules (escaping, void
  elements, raw-text elements, children-only for Document nodes:
  dom_tree.rs:1032-1088 and the golden pairs in tests/html-dom.rs).

This module is deliberately Ray-free: trees are transient objects that live
only inside a ``map_batches`` UDF (parse -> select -> extract -> drop).
"""

from __future__ import annotations

# node kinds
DOCUMENT = 0
DOCTYPE = 1
TEXT = 2
COMMENT = 3
ELEMENT = 4
PI = 5

HTML_NS = "html"
SVG_NS = "svg"
MATHML_NS = "mathml"

# C fast path for Tree.text over CNode arenas (html/_fastlane.c fl_text;
# returns None on mixed/Python arenas and the Python DFS runs instead)
_CTEXT = None
_CTEXT_TRIED = False


def _c_text_fn():
    global _CTEXT, _CTEXT_TRIED
    if not _CTEXT_TRIED:
        _CTEXT_TRIED = True
        import os

        if not os.environ.get("NIPPER_RAY_NO_CSELECT"):
            try:
                from .html.fastlane import get

                mod = get()
                if mod is not None:
                    _CTEXT = mod.text
            except Exception:
                _CTEXT = None
    return _CTEXT


# void elements: html5ever serializer emits no end tag for these
VOID_ELEMENTS = frozenset(
    "area base basefont bgsound br col embed frame hr img input keygen link "
    "menuitem meta param source track wbr".split()
)

# elements whose text children serialize unescaped (html5ever serializer)
RAW_TEXT_SER = frozenset(
    "style script xmp iframe noembed noframes plaintext noscript".split()
)


class Node:
    __slots__ = (
        "id", "kind", "parent", "first_child", "last_child", "prev", "next",
        "name", "ns", "attrs", "template_contents", "data", "data2",
        "mathml_aip",
    )

    def __init__(self, nid: int, kind: int):
        self.id = nid
        self.kind = kind
        self.parent = -1
        self.first_child = -1
        self.last_child = -1
        self.prev = -1
        self.next = -1
        self.name = None        # element local name (lowercased for html ns)
        self.ns = None          # "html" | "svg" | "mathml"
        self.attrs = None       # list[[attr_ns, local, value]]; attr_ns None for no-ns
        self.template_contents = -1  # template: separate document node id
        self.data = None        # text/comment contents; doctype name; PI target
        self.data2 = None       # PI contents; doctype (public, system)
        self.mathml_aip = False


def _node_from_state(ints, name, ns, attrs, data, data2, aip):
    """Unpickle helper for C fast-lane nodes (html/_fastlane.c
    CNode.__reduce__): reconstructs a plain Python Node so unpickling
    never requires the compiled extension."""
    n = Node(ints[0], ints[1])
    (_, _, n.parent, n.first_child, n.last_child, n.prev, n.next,
     n.template_contents) = ints
    n.name = name
    n.ns = ns
    n.attrs = attrs
    n.data = data
    n.data2 = data2
    n.mathml_aip = aip
    return n


class Tree:
    """Arena tree; root is always id 0 (a DOCUMENT node)."""

    __slots__ = ("nodes", "errors", "quirks_mode")

    def __init__(self):
        self.nodes = []
        # recoverable parse errors accumulated by the tree builder
        # (reference: Document.errors, document.rs:24,79-81)
        self.errors = []
        # 'no-quirks' | 'limited-quirks' | 'quirks'; default no-quirks
        # matches the reference's manipulation trees + fragment parses
        # (manipulation.rs:25); document parses overwrite it per the
        # WHATWG initial-mode rules (treebuilder.doctype_quirks)
        self.quirks_mode = "no-quirks"
        self.new_node(DOCUMENT)

    # -- construction -----------------------------------------------------
    def new_node(self, kind: int) -> Node:
        n = Node(len(self.nodes), kind)
        self.nodes.append(n)
        return n

    def new_element(self, name: str, ns: str = HTML_NS, attrs=None) -> Node:
        n = self.new_node(ELEMENT)
        n.name = name
        n.ns = ns
        n.attrs = attrs if attrs is not None else []
        return n

    def new_text(self, contents: str) -> Node:
        n = self.new_node(TEXT)
        n.data = contents
        return n

    def new_comment(self, contents: str) -> Node:
        n = self.new_node(COMMENT)
        n.data = contents
        return n

    def new_pi(self, target: str, contents: str) -> Node:
        """ProcessingInstruction node (reference create_pi,
        document.rs:152-157; NodeData::ProcessingInstruction,
        dom_tree.rs:980-983).  The HTML tokenizer never emits PIs
        (``<?`` becomes a bogus comment per spec), but the node kind is
        part of the reference data model: constructible, serialized as
        ``<?target contents>``, skipped by text()."""
        n = self.new_node(PI)
        n.data = target
        n.data2 = contents
        return n

    # -- linkage ----------------------------------------------------------
    def append_child(self, parent_id: int, child_id: int) -> None:
        nodes = self.nodes
        parent = nodes[parent_id]
        child = nodes[child_id]
        if child.parent != -1:
            self.remove_from_parent(child_id)
        last = parent.last_child
        if last == -1:
            parent.first_child = child_id
        else:
            nodes[last].next = child_id
            child.prev = last
        parent.last_child = child_id
        child.parent = parent_id
        child.next = -1

    def insert_before(self, sibling_id: int, new_id: int) -> None:
        """Insert new_id as previous sibling of sibling_id."""
        nodes = self.nodes
        sib = nodes[sibling_id]
        new = nodes[new_id]
        if new.parent != -1:
            self.remove_from_parent(new_id)
        prev = sib.prev
        new.prev = prev
        new.next = sibling_id
        new.parent = sib.parent
        sib.prev = new_id
        if prev != -1:
            nodes[prev].next = new_id
        elif sib.parent != -1:
            nodes[sib.parent].first_child = new_id

    def remove_from_parent(self, nid: int) -> None:
        nodes = self.nodes
        node = nodes[nid]
        parent, prev, nxt = node.parent, node.prev, node.next
        if parent != -1:
            p = nodes[parent]
            if p.first_child == nid:
                p.first_child = nxt
            if p.last_child == nid:
                p.last_child = prev
        if prev != -1:
            nodes[prev].next = nxt
        if nxt != -1:
            nodes[nxt].prev = prev
        node.parent = -1
        node.prev = -1
        node.next = -1

    def reparent_children(self, from_id: int, to_id: int) -> None:
        for cid in self.children_ids(from_id):
            self.append_child(to_id, cid)

    def remove_children(self, nid: int) -> None:
        for cid in self.children_ids(nid):
            self.remove_from_parent(cid)

    # -- traversal --------------------------------------------------------
    def children_ids(self, nid: int) -> list:
        out = []
        nodes = self.nodes
        c = nodes[nid].first_child
        while c != -1:
            out.append(c)
            c = nodes[c].next
        return out

    def next_element_sibling(self, nid: int) -> int:
        nodes = self.nodes
        c = nodes[nid].next
        while c != -1:
            if nodes[c].kind == ELEMENT:
                return c
            c = nodes[c].next
        return -1

    def prev_element_sibling(self, nid: int) -> int:
        nodes = self.nodes
        c = nodes[nid].prev
        while c != -1:
            if nodes[c].kind == ELEMENT:
                return c
            c = nodes[c].prev
        return -1

    # -- attributes (reference: dom_tree.rs:846-893) ----------------------
    def get_attr(self, nid: int, name: str):
        node = self.nodes[nid]
        if node.kind != ELEMENT:
            return None
        for a in node.attrs:
            if a[1] == name:
                return a[2]
        return None

    def set_attr(self, nid: int, name: str, value: str) -> None:
        node = self.nodes[nid]
        if node.kind != ELEMENT:
            return
        for a in node.attrs:
            if a[1] == name:
                a[2] = value
                return
        node.attrs.append([None, name, value])

    def remove_attr(self, nid: int, name: str) -> None:
        node = self.nodes[nid]
        if node.kind != ELEMENT:
            return
        node.attrs = [a for a in node.attrs if a[1] != name]

    # -- text (reference: dom_tree.rs:928-951) ----------------------------
    def text(self, nid: int) -> str:
        ctext = _c_text_fn()
        if ctext is not None:
            r = ctext(self.nodes, nid)
            if r is not None:
                return r
        return self._text_py(nid)

    def _text_py(self, nid: int) -> str:
        nodes = self.nodes
        out = []
        stack = [nid]
        while stack:
            cur = stack.pop()
            node = nodes[cur]
            kind = node.kind
            if kind == ELEMENT:
                c = node.last_child
                while c != -1:           # reversed push => preorder
                    stack.append(c)
                    c = nodes[c].prev
            elif kind == TEXT:
                out.append(node.data)
        return "".join(out)

    # -- serialization (html5ever HtmlSerializer semantics) ---------------
    def serialize(self, nid: int, include_node: bool = True) -> str:
        out = []
        self._serialize_into(out, nid, include_node)
        return "".join(out)

    def _serialize_into(self, out: list, nid: int, include_node: bool) -> None:
        nodes = self.nodes
        OPEN, CLOSE = 0, 1
        if include_node:
            stack = [(OPEN, nid)]
        else:
            stack = [(OPEN, c) for c in reversed(self.children_ids(nid))]
        while stack:
            op, arg = stack.pop()
            if op == CLOSE:
                out.append(arg)
                continue
            node = nodes[arg]
            kind = node.kind
            if kind == ELEMENT:
                name = node.name
                out.append("<")
                out.append(name)
                for ans, local, value in node.attrs:
                    out.append(" ")
                    out.append(_attr_qname(ans, local))
                    out.append('="')
                    out.append(escape_attr(value))
                    out.append('"')
                out.append(">")
                if name == "template" and node.template_contents != -1:
                    stack.append((CLOSE, "</template>"))
                    for c in reversed(self.children_ids(node.template_contents)):
                        stack.append((OPEN, c))
                    continue
                if node.ns == HTML_NS and name in VOID_ELEMENTS:
                    continue
                stack.append((CLOSE, "</%s>" % name))
                raw = node.ns == HTML_NS and name in RAW_TEXT_SER
                for c in reversed(self.children_ids(arg)):
                    if raw and nodes[c].kind == TEXT:
                        stack.append((CLOSE, nodes[c].data))
                    else:
                        stack.append((OPEN, c))
            elif kind == TEXT:
                out.append(escape_text(node.data))
            elif kind == COMMENT:
                out.append("<!--%s-->" % node.data)
            elif kind == DOCTYPE:
                out.append("<!DOCTYPE %s>" % node.data)
            elif kind == PI:
                out.append("<?%s %s>" % (node.data, node.data2))
            elif kind == DOCUMENT:
                # Document serializes children-only (dom_tree.rs:1071-1076)
                for c in reversed(self.children_ids(arg)):
                    stack.append((OPEN, c))


def _attr_qname(ans, local: str) -> str:
    if ans is None or ans == "":
        return local
    if ans == "xml":
        return "xml:" + local
    if ans == "xmlns":
        return "xmlns" if local == "xmlns" else "xmlns:" + local
    if ans == "xlink":
        return "xlink:" + local
    return local


def escape_text(s: str) -> str:
    if ("&" in s) or ("\xa0" in s) or ("<" in s) or (">" in s):
        s = s.replace("&", "&amp;").replace("\xa0", "&nbsp;")
        s = s.replace("<", "&lt;").replace(">", "&gt;")
    return s


def escape_attr(s: str) -> str:
    if ("&" in s) or ("\xa0" in s) or ('"' in s):
        s = s.replace("&", "&amp;").replace("\xa0", "&nbsp;")
        s = s.replace('"', "&quot;")
    return s
