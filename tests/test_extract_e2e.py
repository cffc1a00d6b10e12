"""End-to-end Ray Data extraction: per-url extracted text byte-equality.

The invariant from BASELINE.json input_hint: the distributed pipeline's
extracted text per url must be byte-identical to the reference-semantics
kernel applied to the same html (the kernel itself is pinned by the
ported reference tests in test_selection.py / test_html_dom.py)."""

import pyarrow as pa
import pytest

from nipper_ray.api import Document
from nipper_ray.sources import read_pages, synth_pages_parquet
from nipper_ray.stages import ExtractStage, Rule, extract_pages

from conftest import load_fixture

SF = "/root/testdata/sf0.001"
LIMIT = 40

RULES = (
    Rule("title", "head title", "text"),
    Rule("body_text", "body", "text"),
    Rule("links", "a[href]", "attrs:href"),
    Rule("n_links", "a[href]", "count"),
    Rule("h1_text", "h1", "text"),
)


def kernel_extract(html_bytes: bytes):
    doc = Document(html_bytes.decode("utf-8", errors="replace"))
    return {
        "title": doc.select("head title").text(),
        "body_text": doc.select("body").text(),
        "links": [doc.tree.get_attr(n, "href")
                  for n in doc.select("a[href]").nids
                  if doc.tree.get_attr(n, "href") is not None],
        "n_links": doc.select("a[href]").length(),
        "h1_text": doc.select("h1").text(),
    }


@pytest.fixture(scope="module")
def extracted(ray_session):
    import pyarrow.parquet as pq

    path = synth_pages_parquet(SF, limit=LIMIT)
    raw = {r["url"]: r["html"]
           for r in pq.read_table(path).to_pylist()}
    ds = read_pages(SF, limit=LIMIT, columns=["url", "html"])
    out = extract_pages(ds, rules=RULES, batch_size=16,
                        concurrency=2).take_all()
    return raw, out


def test_rowcount(extracted):
    raw, out = extracted
    assert len(out) == len(raw) == LIMIT + 5  # + fixture pages


def test_text_byte_equality(extracted):
    raw, out = extracted
    for row in out:
        golden = kernel_extract(raw[row["url"]])
        assert row["title"] == golden["title"], row["url"]
        assert row["body_text"] == golden["body_text"], row["url"]
        assert row["links"] == golden["links"], row["url"]
        assert row["n_links"] == golden["n_links"], row["url"]
        assert row["h1_text"] == golden["h1_text"], row["url"]


def test_fixture_goldens_through_pipeline(extracted):
    _, out = extracted
    by_url = {r["url"]: r for r in out}
    page = by_url["https://fixtures.example.com/page.html"]
    assert page["h1_text"].strip() == "Provok.in"
    hn = by_url["https://fixtures.example.com/hacker_news.html"]
    assert hn["n_links"] > 100
    assert all(r["parse_ok"] for r in out)


def test_stage_unit_no_ray():
    # actor __init__ failures surface late in Ray; smoke the class directly
    stage = ExtractStage(rules=RULES)
    html = load_fixture("page.html").encode()
    batch = pa.table({"url": ["u1"], "html": [html]})
    out = stage(batch)
    assert out.column("h1_text")[0].as_py().strip() == "Provok.in"


def test_n_parse_errors_column(ray_session):
    """Document.errors surfaces as a per-page quality-signal column."""
    import pyarrow as pa
    import ray.data as rd

    from nipper_ray.stages import extract_pages

    pages = pa.table({
        "url": ["a", "b"],
        "html": ["<p>clean</p>".encode(),
                 "<b><i>x</b>y</i><table>loose<tr><td>c</table>".encode()],
    })
    out = extract_pages(rd.from_arrow(pages), batch_size=2).to_pandas()
    out = out.set_index("url")
    assert out.loc["a", "n_parse_errors"] == 0
    assert out.loc["b", "n_parse_errors"] > 0
