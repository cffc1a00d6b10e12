"""WARC source: record parsing, gz members, and the Ray read path."""

import os

import pytest

from nipper_ray.sources.warc import (read_warc, warc_bytes_to_pages,
                                     write_warc)

PAGES = [
    ("https://a.example.com/1", "2020-01-02T03:04:05Z",
     b"<html><head><title>one</title></head><body><p>first</p></body></html>"),
    ("https://b.example.com/2", "2020-01-02T03:04:06Z",
     "<html><body>café</body></html>".encode("utf-8")),
    ("https://c.example.com/3", "2020-01-02T03:04:07Z",
     b"<html><body><a href='/x'>x</a></body></html>"),
]


@pytest.fixture(scope="module")
def warc_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    plain = os.path.join(d, "test.warc")
    gz = os.path.join(d, "test.warc.gz")
    write_warc(plain, PAGES)
    write_warc(gz, PAGES, gzip_members=True)
    return plain, gz


def test_parse_plain(warc_files):
    plain, _ = warc_files
    with open(plain, "rb") as f:
        t = warc_bytes_to_pages(f.read())
    assert t.column("url").to_pylist() == [p[0] for p in PAGES]
    assert t.column("html").to_pylist()[0].startswith(b"<html>")
    ts = t.column("warc_ts").to_pylist()
    assert ts[1].year == 2020 and ts[1].second == 6


def test_parse_gz_members(warc_files):
    plain, gz = warc_files
    with open(plain, "rb") as f:
        a = warc_bytes_to_pages(f.read())
    with open(gz, "rb") as f:
        b = warc_bytes_to_pages(f.read())
    assert a.equals(b)


def test_read_warc_pipeline(warc_files, ray_session):
    from nipper_ray.stages import extract_pages

    plain, gz = warc_files
    ds = read_warc([plain, gz])
    out = extract_pages(ds, batch_size=8).take_all()
    assert len(out) == 2 * len(PAGES)
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    one = by_url["https://a.example.com/1"]
    assert all(r["title"] == "one" for r in one)
    assert by_url["https://c.example.com/3"][0]["links"] == ["/x"]


def test_resync_on_garbage():
    with_garbage = b"JUNKJUNK\r\n" + open_file_bytes()
    t = warc_bytes_to_pages(with_garbage)
    assert len(t) == len(PAGES)


def open_file_bytes():
    import io

    buf = io.BytesIO()
    import tempfile

    p = tempfile.mktemp(suffix=".warc")
    write_warc(p, PAGES)
    with open(p, "rb") as f:
        data = f.read()
    os.unlink(p)
    return data


def test_fixture_byte_equality_through_warc(tmp_path, ray_session):
    """The reference text() invariant holds through the WARC path too:
    page.html ingested as a WARC response record extracts the same
    bytes as the kernel."""
    from nipper_ray.api import Document
    from nipper_ray.stages import Rule, extract_pages

    from conftest import load_fixture

    html = load_fixture("page.html")
    p = str(tmp_path / "fx.warc.gz")
    write_warc(p, [("https://fx.example.com/page", "2020-01-01T00:00:00Z",
                    html.encode("utf-8"))], gzip_members=True)
    ds = read_warc([p])
    out = extract_pages(ds, rules=(Rule("h1", "h1", "text"),
                                   Rule("body_text", "body", "text")),
                        batch_size=4).take_all()
    assert len(out) == 1
    doc = Document(html)
    assert out[0]["h1"] == doc.select("h1").text()
    assert out[0]["body_text"] == doc.select("body").text()
    assert out[0]["h1"].strip() == "Provok.in"


def test_warc_shard_sink_roundtrip(ray_session):
    """Distributed WARC sink -> read_warc round trip: byte-identical
    html per url; shard names content-addressed (idempotent rewrite)."""
    import glob
    import os
    import shutil

    from nipper_ray.sources import read_pages
    from nipper_ray.sources.warc import read_warc, write_warc_shards

    out = "/tmp/warc_shard_sink"
    shutil.rmtree(out, ignore_errors=True)
    pages = read_pages("/root/testdata/sf0.001", limit=60,
                       include_fixtures=False,
                       columns=["url", "warc_ts", "html"])
    res = write_warc_shards(pages, out, batch_size=16).to_pandas()
    assert res["n_records"].sum() == 60
    files = sorted(glob.glob(os.path.join(out, "*.warc.gz")))
    assert len(files) == len(res)
    back = read_warc(files).to_pandas().set_index("url")
    orig = pages.to_pandas().set_index("url")
    assert sorted(back.index) == sorted(orig.index)
    for u in orig.index:
        assert bytes(back.loc[u, "html"]) == bytes(orig.loc[u, "html"])
    # idempotence: re-running the sink rewrites the same shard set
    res2 = write_warc_shards(
        read_pages("/root/testdata/sf0.001", limit=60,
                   include_fixtures=False,
                   columns=["url", "warc_ts", "html"]),
        out, batch_size=16).to_pandas()
    assert sorted(glob.glob(os.path.join(out, "*.warc.gz"))) == files
