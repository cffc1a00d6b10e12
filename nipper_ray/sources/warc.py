"""WARC source: read Common-Crawl-style WARC files into the pages shape.

From-scratch parser for the WARC/1.0 record format (ISO 28500, the
public Common Crawl container format): records are header blocks
(``WARC/1.0`` + name:value lines) followed by ``Content-Length`` bytes
of payload; ``response`` records carry an HTTP response whose body is
the page html. ``.warc.gz`` files use per-record gzip members, which
``gzip.decompress`` handles (it consumes concatenated members).

Ray mapping: ``ray.data.read_binary_files`` yields one row per WARC
file; a ``map_batches`` splitter explodes each file into page rows
(url, warc_ts, html). Parallelism comes from the file count — exactly
how Common Crawl segments are processed in practice (~1 GB per file,
tens of thousands of files per crawl).
"""

from __future__ import annotations

import gzip
import re

import pyarrow as pa

from .synth import PAGES_SCHEMA

_CRLF = b"\r\n"
_WARC_DATE_RE = re.compile(
    rb"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})")


def _parse_warc_date_ms(val: bytes) -> int:
    m = _WARC_DATE_RE.match(val.strip())
    if not m:
        return 0
    import calendar

    y, mo, d, h, mi, s = (int(x) for x in m.groups())
    return calendar.timegm((y, mo, d, h, mi, s, 0, 0, 0)) * 1000


def iter_warc_records(data: bytes):
    """Yield (headers: dict[bytes, bytes], payload: bytes) per record."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        block = data[pos:hdr_end]
        lines = block.split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            # not a record boundary: resync to the next WARC/ marker
            # (search from pos, not hdr_end — the marker may sit inside
            # the garbage-prefixed header block we just rejected)
            nxt = data.find(b"\r\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 2
            continue
        headers = {}
        for line in lines[1:]:
            colon = line.find(b":")
            if colon > 0:
                headers[line[:colon].strip().lower()] = line[colon + 1:].strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            length = 0
        payload_start = hdr_end + 4
        payload = data[payload_start:payload_start + length]
        yield headers, payload
        pos = payload_start + length


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record payload."""
    if payload.startswith(b"HTTP/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def warc_bytes_to_pages(data: bytes, warc_types=(b"response",)) -> pa.Table:
    """One WARC file's bytes -> pages-shaped Arrow table."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for headers, payload in iter_warc_records(data):
        if headers.get(b"warc-type", b"") not in warc_types:
            continue
        uri = headers.get(b"warc-target-uri")
        if not uri:
            continue
        urls.append(uri.decode("utf-8", "replace"))
        tss.append(_parse_warc_date_ms(headers.get(b"warc-date", b"")))
        htmls.append(_http_body(payload))
        texts.append("")
        langs.append("")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("ms")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def read_warc(paths):
    """ray.data.Dataset over WARC file(s) in the pages shape."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def split(batch: pa.Table) -> pa.Table:
        tables = [warc_bytes_to_pages(raw)
                  for raw in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else \
            pa.table({}, schema=PAGES_SCHEMA)

    return ds.map_batches(split, batch_format="pyarrow", batch_size=1)


def _iso_from_ms(ms: int) -> str:
    import time as _time

    t = _time.gmtime((ms or 0) // 1000)
    return ("%04d-%02d-%02dT%02d:%02d:%02dZ"
            % (t.tm_year, t.tm_mon, t.tm_mday,
               t.tm_hour, t.tm_min, t.tm_sec))


def write_warc_shards(pages_ds, out_dir: str,
                      gzip_members: bool = True,
                      batch_size: int = 512):
    """Distributed WARC sink: each task serializes its batch of pages
    (url, warc_ts, html) into ONE .warc[.gz] member file — the archival
    shape of a crawl (sharded output, one file per block, so a failed
    run can diff finished shards).  File names are content-addressed
    (md5 of the url list), so re-running a batch overwrites its own
    shard idempotently instead of duplicating records; writes are
    tmp+rename atomic.  Returns a Dataset of (path, n_records) rows —
    consume it (count/take) to drive the write."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        path = _write_one_shard(t, out_dir, gzip_members)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([len(t)], pa.int64())})

    return pages_ds.map_batches(write_batch, batch_format="pyarrow",
                                batch_size=batch_size)


def _write_one_shard(t: pa.Table, out_dir: str,
                     gzip_members: bool) -> str:
    import gzip as _gzip
    import hashlib
    import os

    urls = t.column("url").to_pylist()
    tss = t.column("warc_ts").to_pylist()
    htmls = t.column("html").to_pylist()
    recs = []
    for url, ts, html in zip(urls, tss, htmls):
        ms = int(ts.timestamp() * 1000) if hasattr(ts, "timestamp") \
            else int(ts or 0)
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"\r\n" + (html or b""))
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: " + url.encode() + b"\r\n"
               b"WARC-Date: " + _iso_from_ms(ms).encode() + b"\r\n"
               b"Content-Length: " + str(len(body)).encode()
               + b"\r\n\r\n" + body + b"\r\n\r\n")
        recs.append(_gzip.compress(rec) if gzip_members else rec)
    tag = hashlib.md5("\n".join(urls).encode()).hexdigest()[:16]
    name = "shard-%s.warc%s" % (tag, ".gz" if gzip_members else "")
    path = os.path.join(out_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"".join(recs))
    os.replace(tmp, path)
    return path


class WarcArchiveStage:
    """Pass-through archiving tee: writes each batch as one WARC shard
    (same format/idempotence as write_warc_shards) and returns the
    batch unchanged — slot it between fetch and extract so raw html is
    archived exactly once while the pipeline keeps streaming."""

    def __init__(self, out_dir: str, gzip_members: bool = True):
        import os

        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.gzip_members = gzip_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch):
            _write_one_shard(batch, self.out_dir, self.gzip_members)
        return batch


# -- deterministic WARC synthesis (tests / demos) ---------------------------
def write_warc(path: str, pages, gzip_members: bool = False) -> None:
    """pages: iterable of (url, date_iso, html_bytes)."""
    out = []
    for url, date_iso, html in pages:
        body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + html)
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Target-URI: " + url.encode() + b"\r\n"
               b"WARC-Date: " + date_iso.encode() + b"\r\n"
               b"Content-Length: " + str(len(body)).encode() + b"\r\n"
               b"\r\n" + body + b"\r\n\r\n")
        out.append(gzip.compress(rec) if gzip_members else rec)
    with open(path, "wb") as f:
        f.write(b"".join(out))
