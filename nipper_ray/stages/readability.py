"""Readability-style main-content extraction as a Ray Data stage.

The reference ships a ~700-line readability example built on its
selector/mutation API (/root/reference/examples/readability.rs: script/
style removal -> unlikely-candidate removal -> paragraph scoring with
comma/length heuristics and link-density penalties -> top-candidate
selection). This module implements the same *published* content-scoring
approach (the widely documented Arc90 readability heuristic) from
scratch on our Document/Selection API — per-document state only, so the
whole algorithm runs UDF-locally inside ``map_batches`` exactly like the
extraction stage.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..api import Document
from ..dom import ELEMENT
from ..html.charset import decode_html

_UNLIKELY = re.compile(
    r"banner|combx|comment|community|disqus|extra|foot|header|legends|menu"
    r"|modal|related|remark|rss|shoutbox|sidebar|skyscraper|sponsor"
    r"|ad-break|agegate|pagination|pager|popup", re.I)
_MAYBE = re.compile(r"and|article|body|column|main|shadow", re.I)

_POSITIVE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text"
    r"|blog|story", re.I)
_NEGATIVE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media"
    r"|meta|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor"
    r"|shopping|tags|tool|widget", re.I)


def _class_weight(tree, nid) -> float:
    w = 0.0
    for attr in ("class", "id"):
        v = tree.get_attr(nid, attr)
        if v:
            if _NEGATIVE.search(v):
                w -= 25
            if _POSITIVE.search(v):
                w += 25
    return w


def _link_density(tree, nid) -> float:
    total = len(tree.text(nid))
    if total == 0:
        return 0.0
    link_len = 0
    stack = [nid]
    nodes = tree.nodes
    while stack:
        cur = stack.pop()
        n = nodes[cur]
        if n.kind == ELEMENT:
            if n.name == "a":
                link_len += len(tree.text(cur))
                continue
            c = n.first_child
            while c != -1:
                stack.append(c)
                c = nodes[c].next
    return link_len / total


def extract_article(html: str) -> dict:
    """Returns {title, article_text, score}. Deterministic."""
    doc = Document(html)
    title = doc.select("head title").text().strip()

    # strip non-content elements (reference: remove_script/remove_style)
    doc.select("script, style, noscript, template").remove()

    # drop unlikely candidates by class/id (reference grab_article)
    drop = []
    for sel in doc.select("*").iter():
        nid = sel.nids[0]
        node = doc.tree.nodes[nid]
        if node.kind != ELEMENT or node.name in ("html", "body"):
            continue
        ids = (doc.tree.get_attr(nid, "class") or "") + " " + \
              (doc.tree.get_attr(nid, "id") or "")
        if _UNLIKELY.search(ids) and not _MAYBE.search(ids):
            drop.append(nid)
    for nid in drop:
        doc.tree.remove_from_parent(nid)

    # score parents of text-bearing paragraphs
    scores: dict = {}
    tree = doc.tree
    for p in doc.select("p, td, pre").iter():
        nid = p.nids[0]
        text = tree.text(nid)
        if len(text) < 25:
            continue
        score = 1.0 + text.count(",") + min(len(text) // 100, 3)
        parent = tree.nodes[nid].parent
        if parent == -1:
            continue
        if parent not in scores:
            scores[parent] = _class_weight(tree, parent)
        scores[parent] += score
        grand = tree.nodes[parent].parent
        if grand != -1 and tree.nodes[grand].kind == ELEMENT:
            if grand not in scores:
                scores[grand] = _class_weight(tree, grand)
            scores[grand] += score / 2.0

    best_id, best_score = -1, 0.0
    for nid, sc in scores.items():
        sc = sc * (1.0 - _link_density(tree, nid))
        if sc > best_score:
            best_id, best_score = nid, sc
    if best_id == -1:
        body = doc.select("body")
        return {"title": title, "article_text": body.text().strip(),
                "score": 0.0}
    return {"title": title,
            "article_text": tree.text(best_id).strip(),
            "score": round(best_score, 3)}


class ReadabilityStage:
    """map_batches actor stage: url, html -> title, article_text, score."""

    def __init__(self, html_col: str = "html"):
        self.html_col = html_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import gc

        htmls = batch.column(self.html_col)
        titles, texts, scores = [], [], []
        gc_was = gc.isenabled()
        if gc_was:
            gc.disable()  # cycle-free DOM; see ExtractStage
        try:
            for i in range(len(htmls)):
                raw = htmls[i].as_py()
                try:
                    out = extract_article(decode_html(raw))
                except Exception:
                    out = {"title": "", "article_text": "", "score": -1.0}
                titles.append(out["title"])
                texts.append(out["article_text"])
                scores.append(out["score"])
        finally:
            if gc_was:
                gc.enable()
        return pa.table({
            "url": batch.column("url"),
            "title": pa.array(titles, pa.string()),
            "article_text": pa.array(texts, pa.string()),
            "score": pa.array(scores, pa.float64()),
        })
