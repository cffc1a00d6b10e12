"""JSONL pages source/sink — the interchange format web-text corpora
actually ship in (one JSON object per line, often .gz).

Parquet stays the SCALE format (column pruning, row-group splits);
JSONL exists to ingest/export third-party corpora.  JSON cannot carry
raw bytes or typed timestamps, so the page schema maps losslessly:

- ``html`` rides as UTF-8 text when the bytes decode cleanly (the
  overwhelmingly common case), else base64 with ``"html_b64": true``;
- ``warc_ts`` rides as epoch milliseconds (int).

Both directions are ``map_batches`` stages around Ray Data's native
JSON I/O, so reading streams block-by-block like every other source.
The reference has no file I/O at all (in-memory strings,
tests/data.rs:4-14) — this source is part of the engine's
beyond-reference surface, like WARC (sources/warc.py).
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc

from .synth import PAGES_SCHEMA


def _encode_batch(t: pa.Table) -> pa.Table:
    """pages schema -> JSON-safe columns (html as text-or-b64)."""
    html_txt, is_b64 = [], []
    for b in t.column("html").to_pylist():
        b = b or b""
        try:
            s = b.decode("utf-8", "strict")
            # surrogates survive a json round-trip only escaped; keep
            # the b64 lane for anything that is not plain valid UTF-8
            html_txt.append(s)
            is_b64.append(False)
        except UnicodeDecodeError:
            html_txt.append(base64.b64encode(b).decode("ascii"))
            is_b64.append(True)
    ts = pc.cast(pc.cast(t.column("warc_ts"), pa.int64()), pa.int64())
    return pa.table({
        "url": t.column("url"),
        "warc_ts_ms": ts,
        "html": pa.array(html_txt, pa.string()),
        "html_b64": pa.array(is_b64, pa.bool_()),
        "text": t.column("text"),
        "lang": t.column("lang"),
    })


def _decode_batch(t: pa.Table) -> pa.Table:
    """JSON-safe columns -> pages schema (PAGES_SCHEMA-typed)."""
    names = set(t.schema.names)
    n = len(t)
    txt = (t.column("html").to_pylist() if "html" in names
           else [""] * n)
    flags = (t.column("html_b64").to_pylist() if "html_b64" in names
             else [False] * n)
    html = [base64.b64decode(s or "") if f
            else (s or "").encode("utf-8")
            for s, f in zip(txt, flags)]
    ts_src = (t.column("warc_ts_ms") if "warc_ts_ms" in names
              else pa.array([0] * n, pa.int64()))
    return pa.table({
        "url": pc.cast(t.column("url"), pa.string()),
        "warc_ts": pc.cast(pc.cast(ts_src, pa.int64()),
                           pa.timestamp("ms")),
        "html": pa.array(html, pa.binary()),
        "text": (pc.cast(t.column("text"), pa.string())
                 if "text" in names
                 else pa.array([None] * n, pa.string())),
        "lang": (pc.cast(t.column("lang"), pa.string())
                 if "lang" in names
                 else pa.array([None] * n, pa.string())),
    }, schema=PAGES_SCHEMA)


def write_jsonl_shards(pages_ds, out_dir: str) -> None:
    """Sharded JSONL sink (one file per block, Ray-parallel writes) —
    resumable-output contract like every other sink here: write to a
    fresh directory per shard/partition of the input."""
    enc = pages_ds.map_batches(_encode_batch, batch_format="pyarrow")
    enc.write_json(out_dir)


def read_jsonl(paths, columns=None, override_num_blocks=None):
    """ray.data.Dataset over JSONL pages files (accepts the layout
    ``write_jsonl_shards`` produces and plain third-party JSONL with
    url/html[/text/lang] string fields).

    JSONL cannot prune columns at the read (that is what Parquet is
    for); ``columns=`` selects AFTER the typed decode."""
    import ray.data as rd

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    ds = rd.read_json(paths, **kwargs)
    ds = ds.map_batches(_decode_batch, batch_format="pyarrow")
    if columns is not None:
        ds = ds.select_columns(list(columns))
    return ds
