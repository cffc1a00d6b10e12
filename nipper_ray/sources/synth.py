"""Deterministic Common-Crawl-style `pages` corpus.

The authoritative input shape comes from BASELINE.json `input_hint`:

    pages(url: string, warc_ts: timestamp[ms], html: binary,
          text: string, lang: string)

Pages are synthesized deterministically (seed fixed at generation-rule
level, no wall clock, no RNG state across calls) from the driver-provided
`documents` table (/root/testdata/sf*/documents.parquet), so tests, the
correctness driver and the bench all run on the same derived corpus:

- each document row becomes one page; the URL encodes the doc id, so a
  sandbox "fetch" can regenerate the page content from its URL alone
  (the fetch stage is pluggable; production would do HTTP);
- hosts follow a skewed assignment (one hot host) to exercise the
  politeness / skew handling in the frontier;
- each page carries k deterministic outlinks to other synthetic URLs,
  giving a crawlable graph for frontier tests;
- a small slice of pages embeds the five reference fixture pages so the
  byte-identical text() invariant is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

N_HOSTS = 16
HOT_HOST_SHARE = 4  # doc_id % HOT_HOST_SHARE == 0 -> host 0 (skew)
LINKS_PER_PAGE = 8
EPOCH_MS = 1_500_000_000_000  # fixed epoch base, no wall clock

_FIXTURES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures")
FIXTURE_NAMES = ["page.html", "page2.html", "hacker_news.html",
                 "rustwiki.html", "wisburg.html"]


def host_for(doc_id: int) -> str:
    if doc_id % HOT_HOST_SHARE == 0:
        return "h0.example.com"
    return "h%d.example.com" % (1 + (doc_id * 2654435761) % (N_HOSTS - 1))


def page_url(doc_id: int) -> str:
    return "https://%s/doc/%d" % (host_for(doc_id), doc_id)


def outlink_ids(doc_id: int, n_docs: int, k: int = LINKS_PER_PAGE):
    # deterministic pseudo-random neighbors; duplicates on purpose
    # (the frontier must dedup them)
    out = []
    for i in range(k):
        out.append((doc_id * 7919 + i * 104729 + (i * i)) % n_docs)
    out.append((doc_id + 1) % n_docs)          # ring link keeps graph connected
    out.append((doc_id * 7919) % n_docs)       # duplicate of i=0 (dedup test)
    return out


def gen_page_html(doc_id: int, body_text: str, n_docs: int) -> str:
    """Deterministic page body. Content is a function of (doc_id,
    body_text, n_docs) only."""
    h = hashlib.sha256(b"page:%d" % doc_id).hexdigest()[:12]
    links = "\n".join(
        '      <li><a class="out" href="%s">link %d</a></li>'
        % (page_url(t), i) for i, t in enumerate(outlink_ids(doc_id, n_docs)))
    paras = "\n".join(
        "    <p>%s</p>" % seg for seg in _split_paras(body_text))
    return (
        "<!DOCTYPE html>\n"
        '<html lang="en">\n'
        "<head>\n"
        "  <meta charset=\"utf-8\">\n"
        "  <title>Doc %d — %s</title>\n"
        "  <script>var x = (1 < 2) && \"%s\";</script>\n"
        "</head>\n"
        "<body>\n"
        '  <nav class="top"><a href="https://%s/">home</a></nav>\n'
        '  <article id="main" class="content doc-%d">\n'
        "    <h1>Document %d</h1>\n"
        "%s\n"
        "  </article>\n"
        '  <ul class="links">\n'
        "%s\n"
        "  </ul>\n"
        '  <footer><small>corpus %s</small></footer>\n'
        "</body>\n"
        "</html>\n"
    ) % (doc_id, h, h, host_for(doc_id), doc_id % 10, doc_id, paras,
         links, h)


def _split_paras(text: str, width: int = 400):
    if not text:
        return ["(empty)"]
    return [text[i:i + width] for i in range(0, len(text), width)] or ["(empty)"]


def _load_fixture(name: str) -> str:
    with open(os.path.join(_FIXTURES_DIR, name), encoding="utf-8") as f:
        return f.read()


def build_pages_table(sf_dir: str, limit: int | None = None,
                      include_fixtures: bool = True,
                      repeat: int = 1) -> pa.Table:
    """Build the pages table for one scale factor, deterministically.

    ``repeat`` scales the page count: page doc_id r*n_docs+i reuses
    document i's text (distinct URL/links/title) — the bench knob."""
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    if limit is not None:
        docs = docs.slice(0, limit)
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    n_base = len(texts)
    n_docs = n_base * repeat

    urls, tss, htmls, page_texts, page_langs = [], [], [], [], []
    for doc_id in range(n_docs):
        text = texts[doc_id % n_base] or ""
        lang = langs[doc_id % n_base]
        urls.append(page_url(doc_id))
        tss.append(EPOCH_MS + doc_id * 1000)
        htmls.append(gen_page_html(doc_id, text, n_docs).encode("utf-8"))
        page_texts.append(text)
        page_langs.append(lang or "en")
    if include_fixtures:
        for i, name in enumerate(FIXTURE_NAMES):
            html = _load_fixture(name)
            urls.append("https://fixtures.example.com/%s" % name)
            tss.append(EPOCH_MS - (i + 1) * 1000)
            htmls.append(html.encode("utf-8"))
            page_texts.append("")
            page_langs.append("en")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("ms")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(page_texts, pa.string()),
        "lang": pa.array(page_langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def synth_pages_parquet(sf_dir: str, out_dir: str | None = None,
                        limit: int | None = None,
                        include_fixtures: bool = True,
                        row_group_size: int = 512,
                        repeat: int = 1, n_files: int = 16) -> str:
    """Materialize (once) the synthetic pages corpus for *sf_dir*.

    Output is cached under /tmp keyed by the source dir + limit. The
    corpus is SHARDED into n_files parquet files (like real Common
    Crawl segments): a single file means a single read task, which
    serializes the feed into the extraction pool and caps pipeline
    utilization at high worker counts. Row groups stay small so each
    file still splits into many blocks."""
    tag = "%s_l%s_r%d_f%d%s" % (os.path.basename(os.path.normpath(sf_dir)),
                                limit, repeat, n_files,
                                "" if include_fixtures else "_nofix")
    out_dir = out_dir or os.path.join("/tmp", "nipper_ray_pages", tag)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = build_pages_table(sf_dir, limit=limit,
                              include_fixtures=include_fixtures,
                              repeat=repeat)
    n = len(table)
    per = max(1, (n + n_files - 1) // n_files)
    for i, start in enumerate(range(0, n, per)):
        part = table.slice(start, per)
        tmp = os.path.join(out_dir, "pages_%04d.parquet.tmp" % i)
        pq.write_table(part, tmp, row_group_size=row_group_size)
        os.replace(tmp, os.path.join(out_dir,
                                     "pages_%04d.parquet" % i))
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir


def read_pages(sf_dir: str, limit: int | None = None,
               include_fixtures: bool = True, columns=None,
               repeat: int = 1, override_num_blocks=None):
    """ray.data.Dataset over the synthetic pages corpus (column-pruned).

    For corpora of LARGE pages (100KB+), pass override_num_blocks ~
    2-4x the CPU count: with few row groups per file the parquet
    reader otherwise produces too few blocks and parallelism collapses
    (measured: 7 -> 18.5 MB/s on the fixture-page mix)."""
    import ray.data as rd

    path = synth_pages_parquet(sf_dir, limit=limit,
                               include_fixtures=include_fixtures,
                               repeat=repeat)
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, columns=columns, **kwargs)
