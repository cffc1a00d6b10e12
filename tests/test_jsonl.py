"""JSONL pages source/sink: lossless round-trip (UTF-8, CJK,
non-UTF-8 binary html via the b64 lane), third-party minimal JSONL,
and extract-pipeline equivalence with the Parquet source."""

import gzip
import json
import os

import pyarrow as pa
import pytest

from nipper_ray.sources import (PAGES_SCHEMA, read_jsonl, read_pages,
                                write_jsonl_shards)


def _pages_table():
    rows = [
        ("https://a.example.com/1", 1_600_000_000_000,
         b"<html><body><p>plain</p></body></html>", "plain", "en"),
        ("https://a.example.com/2", 1_600_000_001_000,
         "<html><title>通胀</title>".encode("utf-8"),
         "通胀", "zh"),
        ("https://a.example.com/3", 1_600_000_002_000,
         b"\xff\xfe<not utf8>\x80", None, None),  # b64 lane
        ("https://a.example.com/4", 0, b"", "", "und"),
    ]
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows],
                            pa.timestamp("ms")),
        "html": pa.array([r[2] for r in rows], pa.binary()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "lang": pa.array([r[4] for r in rows], pa.string()),
    }, schema=PAGES_SCHEMA)


def test_jsonl_roundtrip_lossless(ray_session, tmp_path):
    import ray.data as rd

    t = _pages_table()
    out = str(tmp_path / "pages_jsonl")
    write_jsonl_shards(rd.from_arrow(t), out)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert files  # sharded files on disk
    back = read_jsonl(out).to_pandas().sort_values(
        "url", ignore_index=True)
    orig = t.to_pandas().sort_values("url", ignore_index=True)
    assert list(back.columns) == list(orig.columns)
    for c in orig.columns:
        assert list(back[c]) == list(orig[c]), c
    # the non-UTF-8 row really went through the b64 lane
    raw = "\n".join(open(os.path.join(out, f)).read()
                    for f in files)
    recs = [json.loads(line) for line in raw.splitlines() if line]
    by_url = {r["url"]: r for r in recs}
    assert by_url["https://a.example.com/3"]["html_b64"] is True
    assert by_url["https://a.example.com/1"]["html_b64"] is False


def test_jsonl_third_party_minimal(ray_session, tmp_path):
    """Plain third-party JSONL (url + html strings only, gzipped) reads
    into the full typed pages schema with nulls for absent fields."""
    p = tmp_path / "corpus.jsonl.gz"
    rows = [{"url": "https://x.example.com/%d" % i,
             "html": "<p>doc %d</p>" % i} for i in range(5)]
    with gzip.open(p, "wt") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ds = read_jsonl(str(p))
    df = ds.to_pandas().sort_values("url", ignore_index=True)
    assert ds.schema().names == list(PAGES_SCHEMA.names)
    assert list(df["html"]) == [r["html"].encode() for r in rows]
    assert df["text"].isna().all() and df["lang"].isna().all()


def test_jsonl_extract_equals_parquet_source(ray_session, tmp_path):
    """The extract pipeline over a JSONL round-trip of the corpus
    produces byte-identical rows to the Parquet source."""
    from nipper_ray.stages import extract_pages

    ds = read_pages("/root/testdata/sf0.001",
                    columns=["url", "warc_ts", "html", "text", "lang"],
                    include_fixtures=True)
    out = str(tmp_path / "rt")
    write_jsonl_shards(ds, out)
    via_jsonl = (extract_pages(read_jsonl(out, columns=["url", "html"]),
                               batch_size=64)
                 .select_columns(["url", "title", "n_links"])
                 .to_pandas().sort_values("url", ignore_index=True))
    via_parquet = (extract_pages(
        read_pages("/root/testdata/sf0.001", columns=["url", "html"]),
        batch_size=64)
        .select_columns(["url", "title", "n_links"])
        .to_pandas().sort_values("url", ignore_index=True))
    assert via_jsonl.equals(via_parquet)
    assert len(via_jsonl) == 505
