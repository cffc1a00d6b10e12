"""Composed training-data curation pipeline: the end-to-end shape a
100 TB pretraining-data run uses, built from the engine's own ops.

    read documents
      -> one vectorized stats pass (tokens / stop ratio / md5)
      -> cheap row filters FIRST (lang allowlist, token bounds,
         stopword floor) — selectivity before any shuffle
      -> exact-dedup keeper (groupby(md5) -> min doc_id), the single
         all-to-all exchange, run on the already-filtered survivors

Filter-then-dedup equals dedup-then-filter for full-text exact dup
(identical text => identical stats), and moves strictly fewer bytes
through the shuffle.  Every step is SQL-expressible, so the whole
composition is under the driver's hash-equality gate (see
__ray_entry__.oracle_sql()['curate']).
"""

from __future__ import annotations

import re

import pyarrow as pa

_TOK_RE = re.compile(r"[A-Za-z0-9_]+")
_STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that"
    .split())


def curate_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One pass: n_tokens, stop_ppm (integer ppm — float-free so the
    SQL oracle matches bit-for-bit) and the md5 content key."""
    import hashlib

    texts = batch.column(text_col).to_pylist()
    n_tok, stop_ppm, md5s = [], [], []
    for s in texts:
        s = s or ""
        toks = _TOK_RE.findall(s)
        n_tok.append(len(toks))
        if toks:
            n_stop = sum(1 for w in toks if w.lower() in _STOPWORDS)
            stop_ppm.append(n_stop * 1_000_000 // len(toks))
        else:
            stop_ppm.append(0)
        md5s.append(hashlib.md5(s.encode("utf-8")).hexdigest())
    out = batch.append_column("n_tokens", pa.array(n_tok, pa.int64()))
    out = out.append_column("stop_ppm", pa.array(stop_ppm, pa.int64()))
    return out.append_column("fp_md5", pa.array(md5s, pa.string()))


def curate(docs_ds, langs=("en",), min_tokens: int = 30,
           max_tokens: int = 120, min_stop_ppm: int = 50_000,
           id_col: str = "doc_id", text_col: str = "text",
           lang_col: str = "lang", id_type=pa.int64()):
    """Dataset[id, text(, lang)] -> curated Dataset[id, n_tokens]
    (the kept document ids with their token counts).  ``lang_col=None``
    skips the language filter (e.g. crawl pages carry no lang)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    lang_set = pa.array(list(langs), pa.string())

    def stats_and_filter(t: pa.Table) -> pa.Table:
        if lang_col is not None:
            t = t.filter(pc.is_in(t.column(lang_col),
                                  value_set=lang_set))
        if len(t) == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "n_tokens": pa.array([], pa.int64()),
                             "fp_md5": pa.array([], pa.string())})
        t = curate_stats_batch(t, text_col=text_col)
        keep = pc.and_(
            pc.and_(pc.greater_equal(t.column("n_tokens"),
                                     pa.scalar(min_tokens)),
                    pc.less_equal(t.column("n_tokens"),
                                  pa.scalar(max_tokens))),
            pc.greater_equal(t.column("stop_ppm"),
                             pa.scalar(min_stop_ppm)))
        return t.filter(keep).select([id_col, "n_tokens", "fp_md5"])

    filtered = docs_ds.map_batches(stats_and_filter,
                                   batch_format="pyarrow")
    # exact-dedup keeper: one narrow-key shuffle over survivors only
    agg = filtered.groupby("fp_md5").aggregate(
        Min(id_col, alias_name=id_col),
        Min("n_tokens", alias_name="n_tokens"))
    return agg.select_columns([id_col, "n_tokens"])


def curate_crawl_output(out_dir: str, min_tokens: int = 10,
                        max_tokens: int = 1_000_000,
                        min_stop_ppm: int = 0):
    """Crawl-to-training-data tail: read every fetched wave partition,
    curate on the extracted body text (token bounds + exact dedup by
    content, keeper = min url), write ``<out>/curated/`` Parquet.
    Returns (rows_written, curated_dir)."""
    import os

    import ray.data as rd

    pages = rd.read_parquet(os.path.join(out_dir, "pages"),
                            columns=["url", "body_text"])
    kept = curate(pages, lang_col=None, min_tokens=min_tokens,
                  max_tokens=max_tokens, min_stop_ppm=min_stop_ppm,
                  id_col="url", text_col="body_text",
                  id_type=pa.string())
    cur_dir = os.path.join(out_dir, "curated")
    os.makedirs(cur_dir, exist_ok=True)
    kept.write_parquet(cur_dir)
    import pyarrow.parquet as pq

    n = sum(pq.ParquetFile(os.path.join(cur_dir, f)).metadata.num_rows
            for f in os.listdir(cur_dir) if f.endswith(".parquet"))
    return n, cur_dir
