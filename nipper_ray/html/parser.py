"""Parse entry points mirroring html5ever's parse_document / parse_fragment
as the reference uses them (/root/reference/src/document.rs:40-56 and
/root/reference/src/manipulation.rs:13-33)."""

from __future__ import annotations

from ..dom import Tree
from .fastlane import parse_document_fast
from .treebuilder import TreeBuilder


def parse_document(html: str) -> Tree:
    """Full-document parse (Document::from, document.rs:40-44).

    Tries the C whole-document fast lane first (html/_fastlane.c: the
    error-free common subset of the insertion-mode machine, arena-
    identical by construction and pinned by
    tests/test_fastlane_differential.py); anything outside the subset
    returns None and the pure-Python machine takes over.
    """
    tree = parse_document_fast(html)
    if tree is not None:
        return tree
    return TreeBuilder().parse(html)


def parse_fragment(html: str, context: str = "") -> Tree:
    """Fragment parse with a context element.

    The reference's manipulation macro uses an unnamed context element
    (manipulation.rs:29 — local_name!("")), which lands in the in-body
    insertion mode; the serialization goldens use context "body"
    (tests/html-dom.rs:13-18). The parsed content hangs off the
    synthetic <html> root element (first child of the root document).
    """
    return TreeBuilder(fragment_ctx=context).parse(html)


def fragment_content_ids(tree: Tree) -> list:
    """Top-level node ids of parsed fragment content (children of the
    synthetic html root; reference: dom_tree.rs:276-287 TRUE_ROOT_ID)."""
    root_children = tree.children_ids(0)
    if not root_children:
        return []
    return tree.children_ids(root_children[0])
