"""Extraction stage: nipper-semantics parse + select as a Ray Data stage.

The whole reference pipeline (parse -> select -> text()/attr())
(/root/reference/examples/hacker_news.rs:1-14) runs *inside* one
``map_batches`` call: the DOM is a transient Python object that never
crosses a process boundary; blocks are zero-copy Arrow.

``ExtractStage`` is a callable class, so ``map_batches(ExtractStage, ...)``
runs it on an actor pool: the extraction-rule selectors are compiled once
per actor in ``__init__`` (the reference's precompiled ``Matcher`` reuse,
/root/reference/src/matcher.rs:13-24), not once per batch.

Rule kinds:
    text        concatenated text() of all matches (Selection::text)
    attr:NAME   attr of FIRST match (Selection::attr, property.rs:22-24)
    attrs:NAME  list of attr values over all matches that carry it
    html        serialized html of first match (Selection::html)
    count       number of matches (Selection::length)
    exists      any match (Selection::exists)
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from ..api import Document, Selection
from ..css.matcher import CompiledSelector
from ..html.charset import decode_html


def _select_all(tree, compileds, progs=None):
    """One preorder DFS evaluating every rule's selector per node —
    identical per-rule results to K separate Document.select DFS walks
    (from the single root each node is visited exactly once, so the
    cross-root dedup in the reference's Matches iterator is a no-op),
    at one tree traversal instead of K.

    Rules whose rightmost compound names a type (the usual case) are
    bucketed by that tag name, so a node consults only the rules that
    could possibly match it — O(1) dict probe instead of K matcher
    calls per node (same fast-name logic as match_node's reject).

    On pure-CNode arenas (C fast-lane parses) the whole multi-rule walk
    runs in one C pass (html/_fastlane.c fl_select_all), result-
    identical (tests/test_cselect_differential.py)."""
    from ..css.lower import get_cprog
    from ..dom import ELEMENT

    if progs is None:
        progs = [get_cprog(c) for c in compileds]
    if progs and all(p is not None for p in progs):
        from ..html.fastlane import get

        mod = get()
        if mod is not None:
            res = mod.select_all(tree.nodes, progs, (0,), True)
            if res is not None:
                return res

    results = [[] for _ in compileds]
    byname = {}
    universal = []
    for k, comp in enumerate(compileds):
        if comp.fast_names:
            for nm in comp.fast_names:
                byname.setdefault(nm, []).append((k, comp))
        else:
            universal.append((k, comp))
    nodes = tree.nodes
    stack = [0]
    while stack:
        nid = stack.pop()
        node = nodes[nid]
        c = node.last_child
        while c != -1:
            stack.append(c)
            c = nodes[c].prev
        if node.kind == ELEMENT:
            cands = byname.get(node.name)
            if cands is not None:
                for k, comp in cands:
                    if comp.match_node(tree, nid):
                        results[k].append(nid)
        for k, comp in universal:
            if comp.match_node(tree, nid):
                results[k].append(nid)
    return results


@dataclass(frozen=True)
class Rule:
    name: str
    selector: str
    kind: str  # text | attr:<n> | attrs:<n> | html | count | exists


DEFAULT_RULES = (
    Rule("title", "head title", "text"),
    Rule("body_text", "body", "text"),
    Rule("links", "a[href]", "attrs:href"),
    Rule("n_links", "a[href]", "count"),
)


def _rule_type(kind: str) -> pa.DataType:
    if kind == "count":
        return pa.int64()
    if kind == "exists":
        return pa.bool_()
    if kind.startswith("attrs:"):
        return pa.list_(pa.string())
    return pa.string()


class ExtractStage:
    """map_batches(ExtractStage, fn_constructor_kwargs={"rules": ...},
    batch_format="pyarrow", concurrency=N)."""

    def __init__(self, rules=DEFAULT_RULES, html_col: str = "html",
                 keep_cols=("url",), errors: str = "null"):
        self.rules = [r if isinstance(r, Rule) else Rule(*r) for r in rules]
        # compile once per actor
        self.compiled = [(r, CompiledSelector(r.selector)) for r in self.rules]
        self._compiled_list = [c for _, c in self.compiled]
        self.html_col = html_col
        self.keep_cols = tuple(keep_cols)
        self.errors = errors

    def __call__(self, batch: pa.Table) -> pa.Table:
        import gc

        html_list = batch.column(self.html_col).to_pylist()
        outs = {r.name: [] for r in self.rules}
        ok = []
        n_err = []
        # the DOM arena is cycle-free (int links), so the generational
        # GC only burns time scanning parse garbage (~13% of parse);
        # refcounting frees everything the moment each doc drops
        gc_was = gc.isenabled()
        if gc_was:
            gc.disable()
        try:
            self._extract_rows(html_list, outs, ok, n_err)
        finally:
            if gc_was:
                gc.enable()
        cols = {}
        for c in self.keep_cols:
            cols[c] = batch.column(c)
        for r in self.rules:
            cols[r.name] = pa.array(outs[r.name], _rule_type(r.kind))
        cols["parse_ok"] = pa.array(ok, pa.bool_())
        # recoverable parse errors per page (Document.errors — the
        # reference's errors vec surfaced as a quality signal column)
        cols["n_parse_errors"] = pa.array(n_err, pa.int64())
        return pa.table(cols)

    def _extract_rows(self, html_list, outs, ok, n_err):
        from ..css.lower import get_cprog
        from ..dom import _c_text_fn

        # per-batch hoists: lowered programs (dict probes + list build
        # were per-DOC before — ~8us/doc of pure overhead), the C text
        # kernel, the C module handle, and a flat (out_list, op,
        # argname) dispatch per rule
        progs = [get_cprog(c) for c in self._compiled_list]
        ctext = _c_text_fn()
        cmod = None
        if progs and all(p is not None for p in progs):
            from ..html.fastlane import get
            cmod = get()
        collect_attr = getattr(cmod, "collect_attr", None)
        dispatch = []
        for r, compiled in self.compiled:
            kind = r.kind
            if kind.startswith("attr:"):
                dispatch.append((outs[r.name], "attr", kind[5:]))
            elif kind.startswith("attrs:"):
                dispatch.append((outs[r.name], "attrs", kind[6:]))
            else:
                dispatch.append((outs[r.name], kind, None))
        for raw in html_list:
            try:
                doc = Document(decode_html(raw))
                ok.append(True)
                n_err.append(len(doc.errors))
            except Exception:
                if self.errors == "raise":
                    raise
                ok.append(False)
                n_err.append(-1)
                for r in self.rules:
                    outs[r.name].append(None)
                continue
            tree = doc.tree
            nodes = tree.nodes
            per_rule = None
            if cmod is not None:
                per_rule = cmod.select_all(nodes, progs, (0,), True)
            if per_rule is None:
                per_rule = _select_all(tree, self._compiled_list, progs)
            for (out, op, arg), nids in zip(dispatch, per_rule):
                if op == "text":
                    if ctext is not None:
                        parts = []
                        for nid in nids:
                            t = ctext(nodes, nid)
                            parts.append(tree.text(nid) if t is None
                                         else t)
                        out.append("".join(parts))
                    else:
                        out.append(
                            "".join(tree.text(n) for n in nids))
                elif op == "count":
                    out.append(len(nids))
                elif op == "exists":
                    out.append(bool(nids))
                elif op == "html":
                    out.append(tree.serialize(nids[0], include_node=True)
                               if nids else "")
                elif op == "attr":
                    out.append(tree.get_attr(nids[0], arg)
                               if nids else None)
                elif op == "attrs":
                    vals = None
                    if collect_attr is not None:
                        vals = collect_attr(nodes, nids, arg)
                    if vals is None:
                        vals = []
                        for nid in nids:
                            v = tree.get_attr(nid, arg)
                            if v is not None:
                                vals.append(v)
                    out.append(vals)
                else:
                    raise ValueError("unknown rule kind %r" % op)


def extract_pages(ds, rules=DEFAULT_RULES, keep_cols=("url",),
                  batch_size: int = 64, concurrency=None,
                  num_cpus: float = 1, use_actors: bool = False):
    """Attach the extraction stage to a pages Dataset.

    Default is stateless tasks with a *driver-compiled* stage instance:
    selectors are compiled once, the compiled object is shipped in the
    task spec and cached per worker process — same amortization as an
    actor pool with none of the pool ramp-up (which dominates short
    single-node runs). ``use_actors=True`` switches to an actor pool,
    the right shape when the stage holds heavyweight state (models) or
    on long-running cluster jobs.

    batch_size stays moderate because html rows can be large (100KB+
    pages: tests/fixtures/rustwiki.html is 218KB); the parse cost per
    row dwarfs per-batch overhead."""
    if use_actors:
        kwargs = dict(
            fn_constructor_kwargs={"rules": rules, "keep_cols": keep_cols},
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
        return ds.map_batches(ExtractStage, **kwargs)
    stage = ExtractStage(rules=rules, keep_cols=keep_cols)
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size,
                  num_cpus=num_cpus)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency  # caps concurrent tasks
    return ds.map_batches(stage, **kwargs)
