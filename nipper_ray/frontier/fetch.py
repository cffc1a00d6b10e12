"""Fetch stage (sandbox: deterministic synthetic fetch, no network).

The fetch stage is pluggable: production would issue HTTP GETs from an
actor pool with per-host connection reuse. In this sandbox the corpus is
addressable — a synthetic page's URL encodes its doc id, so the fetcher
regenerates the exact page bytes from the URL plus a broadcast copy of
the documents' body texts (ray.put once on the driver, ray.get once per
actor in __init__ — the broadcast-small-side pattern, never re-shipped
per batch)."""

from __future__ import annotations

import re

import pyarrow as pa
import ray

from ..sources.synth import EPOCH_MS, FIXTURE_NAMES, gen_page_html

_DOC_RE = re.compile(r"^https://h\d+\.example\.com/doc/(\d+)$")
_FIX_RE = re.compile(r"^https://fixtures\.example\.com/(.+)$")


def put_doc_texts(sf_dir: str, limit=None):
    """Broadcast the doc-id -> body-text mapping once."""
    import os

    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    if limit is not None:
        t = t.slice(0, limit)
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    return ray.put(texts), len(texts)


class SynthFetchStage:
    """map_batches actor stage: url -> (html, warc_ts, fetch_ok)."""

    def __init__(self, doc_texts_ref, n_docs: int, fixtures_dir=None):
        # lazy: as an actor this resolves once per actor; as a pickled
        # task instance it resolves once per worker process (the
        # deserialized callable is cached in the worker function table)
        self.ref = doc_texts_ref
        self.texts = None
        self.n_docs = n_docs
        self.fixtures = {}
        if fixtures_dir:
            import os
            for name in FIXTURE_NAMES:
                p = os.path.join(fixtures_dir, name)
                if os.path.exists(p):
                    with open(p, encoding="utf-8") as f:
                        self.fixtures[name] = f.read()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.texts is None:
            self.texts = ray.get(self.ref)
        urls = batch.column("url").to_pylist()
        htmls, tss, oks = [], [], []
        for u in urls:
            m = _DOC_RE.match(u)
            if m:
                doc_id = int(m.group(1))
                text = self.texts.get(doc_id)
                if text is None:
                    htmls.append(b"")
                    tss.append(EPOCH_MS)
                    oks.append(False)
                    continue
                htmls.append(
                    gen_page_html(doc_id, text, self.n_docs).encode("utf-8"))
                tss.append(EPOCH_MS + doc_id * 1000)
                oks.append(True)
                continue
            m = _FIX_RE.match(u)
            if m and m.group(1) in self.fixtures:
                htmls.append(self.fixtures[m.group(1)].encode("utf-8"))
                tss.append(EPOCH_MS)
                oks.append(True)
                continue
            htmls.append(b"")
            tss.append(EPOCH_MS)
            oks.append(False)
        out = batch.append_column("html", pa.array(htmls, pa.binary()))
        out = out.append_column("warc_ts",
                                pa.array(tss, pa.timestamp("ms")))
        out = out.append_column("fetch_ok", pa.array(oks, pa.bool_()))
        return out
