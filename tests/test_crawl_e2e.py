"""End-to-end crawl-loop invariants (FIXTURES.md §4):

- dedup: no URL fetched twice across waves; frontier wave k+1 contains
  each canonical URL at most once after the seen-set probe;
- ordering parity: two independent runs under the same seed list and
  politeness budget fetch the same URLs in the same deterministic order
  (priority desc, url asc within the wave cap);
- resume: killing after wave 0 and resuming from the checkpoint
  produces the same wave-1 fetch set without re-fetching wave 0.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from conftest import FIXTURES

SF = "/root/testdata/sf0.001"
KW = dict(num_shards=2, per_host_budget=20, wave_budget=80,
          extract_concurrency=1, pool_size=1, actor_cpus=0.45,
          fixtures_dir=FIXTURES)


def _seeds():
    from nipper_ray.sources.synth import page_url

    return [page_url(i) for i in range(0, 40, 5)]


def _fetched(out_dir, wave):
    d = os.path.join(out_dir, "pages", "wave=%d" % wave)
    rows = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(d, f),
                              columns=["url", "priority"])
            rows.extend(t.to_pylist())
    return rows


def _run(out_dir, waves=2, resume=False):
    from nipper_ray.frontier.scheduler import run_crawl

    shutil.rmtree(out_dir, ignore_errors=True) if not resume else None
    return run_crawl(SF, out_dir, _seeds(), waves=waves, resume=resume,
                     **KW)


@pytest.fixture(scope="module")
def crawl_a(ray_session):
    out = "/tmp/crawl_a"
    metrics = _run(out, waves=2)
    return out, metrics


def test_no_url_fetched_twice(crawl_a):
    out, metrics = crawl_a
    seen = set()
    for k in range(2):
        urls = [r["url"] for r in _fetched(out, k)]
        assert len(urls) == len(set(urls)), "dup within wave %d" % k
        dups = seen.intersection(urls)
        assert not dups, "re-fetched across waves: %s" % list(dups)[:5]
        seen.update(urls)
    from urllib.parse import urlsplit

    from nipper_ray.frontier.robots import RobotsCache

    rc = RobotsCache()
    allowed = [u for u in _seeds()
               if rc.allowed(urlsplit(u).hostname, urlsplit(u).path)]
    assert metrics[0]["pages_fetched"] == len(allowed)


def test_frontier_metrics_consistent(crawl_a):
    out, metrics = crawl_a
    for m in metrics:
        assert m["pages_fetched"] <= KW["wave_budget"]
        assert sum(m["seen_counts"]) >= m["pages_fetched"]


def test_ordering_parity(crawl_a, ray_session):
    out_a, _ = crawl_a
    out_b = "/tmp/crawl_b"
    _run(out_b, waves=2)
    for k in range(2):
        a = sorted(_fetched(out_a, k), key=lambda r: (-r["priority"],
                                                      r["url"]))
        b = sorted(_fetched(out_b, k), key=lambda r: (-r["priority"],
                                                      r["url"]))
        assert [r["url"] for r in a] == [r["url"] for r in b], \
            "wave %d fetch set/order differs" % k


def test_committed_golden_fetch_order(crawl_a):
    """Crawl-ordering parity against the committed golden list
    (FIXTURES.md §4): same seed list + politeness budget must reproduce
    the exact fetch set and (priority desc, url asc) order."""
    import json

    out, _ = crawl_a
    with open(os.path.join(FIXTURES, "crawl_order_golden.json")) as f:
        golden = json.load(f)
    for k in range(2):
        rows = sorted(_fetched(out, k),
                      key=lambda r: (-r["priority"], r["url"]))
        assert [r["url"] for r in rows] == golden["wave%d" % k], \
            "wave %d order drifted from committed golden" % k


def test_resume_from_checkpoint(crawl_a, ray_session):
    out_a, _ = crawl_a
    out_c = "/tmp/crawl_c"
    shutil.rmtree(out_c, ignore_errors=True)
    _run(out_c, waves=1)  # "killed" after wave 0's checkpoint
    wave0_before = {r["url"] for r in _fetched(out_c, 0)}
    metrics = _run(out_c, waves=2, resume=True)  # resumes at wave 1
    assert metrics[0]["wave"] == 1
    assert {r["url"] for r in _fetched(out_c, 0)} == wave0_before
    resumed = {r["url"] for r in _fetched(out_c, 1)}
    original = {r["url"] for r in _fetched(out_a, 1)}
    assert resumed == original
    assert not wave0_before.intersection(resumed)


def test_resume_after_midwave_crash(ray_session):
    """A wave that crashed AFTER writing partial pages/frontier output
    but BEFORE its checkpoint must re-run cleanly on resume: stale
    partial files are purged, not appended to (no duplicated rows)."""
    out = "/tmp/crawl_midcrash"
    clean = "/tmp/crawl_midcrash_ref"
    m_ref = _run(clean, waves=2)
    _run(out, waves=2)
    # simulate the crash: delete wave-1 checkpoint but leave its
    # (now untrusted) pages + next-frontier files on disk
    shutil.rmtree(os.path.join(out, "ckpt", "wave=1"))
    m2 = _run(out, waves=2, resume=True)
    assert [m["wave"] for m in m2] == [1]
    assert m2[0]["pages_fetched"] == m_ref[1]["pages_fetched"]
    got = sorted(r["url"] for r in _fetched(out, 1))
    want = sorted(r["url"] for r in _fetched(clean, 1))
    assert got == want  # no duplicates from stale partial files


def test_curate_crawl_output(crawl_a):
    """Crawl -> curated parquet tail: unique content only, token floor
    respected, keeper = min url per content hash."""
    import hashlib

    from nipper_ray.pipelines.curate import (_TOK_RE,
                                             curate_crawl_output)

    out, _ = crawl_a
    n, cur_dir = curate_crawl_output(out, min_tokens=1)
    t = pq.read_table(cur_dir)
    assert n == len(t) > 0
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == len(urls)
    # every kept url is the min url of its content group
    pages = pq.read_table(os.path.join(out, "pages"),
                          columns=["url", "body_text"])
    by_md5 = {}
    for u, b in zip(pages.column("url").to_pylist(),
                    pages.column("body_text").to_pylist()):
        if len(_TOK_RE.findall(b or "")) < 1:
            continue
        k = hashlib.md5((b or "").encode()).hexdigest()
        by_md5.setdefault(k, []).append(u)
    want = sorted(min(v) for v in by_md5.values())
    assert sorted(urls) == want


def test_crawl_warc_archive_tee(ray_session):
    """--warc-out tee: every fetched page's raw html is archived as
    WARC and readable back; the extracted pages output is unchanged."""
    import glob

    from nipper_ray.frontier.scheduler import run_crawl
    from nipper_ray.sources.warc import read_warc

    out = "/tmp/crawl_warc_tee"
    warc = os.path.join(out, "warc")
    shutil.rmtree(out, ignore_errors=True)
    m = run_crawl(SF, out, _seeds(), waves=1, warc_dir=warc, **KW)
    fetched = {r["url"] for r in _fetched(out, 0)}
    files = glob.glob(os.path.join(warc, "wave=0", "*.warc.gz"))
    assert files
    back = read_warc(files).to_pandas()
    assert set(back["url"]) == fetched == {
        u for u in set(back["url"])}
    assert m[0]["pages_fetched"] == len(back)


def test_exhausted_wave_short_circuit(ray_session):
    """A wave that selects 0 pages (wave_budget=0) must still produce a
    complete, resumable checkpoint and a TYPED empty next frontier —
    and the following wave must run the full pipeline over that empty
    frontier without schema loss (all-empty groupby outputs lose their
    schema otherwise)."""
    from nipper_ray.frontier.scheduler import FRONTIER_SCHEMA, run_crawl

    out = "/tmp/crawl_empty"
    shutil.rmtree(out, ignore_errors=True)
    kw = dict(KW, wave_budget=0)
    m = run_crawl(SF, out, _seeds(), waves=2, **kw)
    assert [w["pages_fetched"] for w in m] == [0, 0]
    assert [w["outlinks_discovered"] for w in m] == [0, 0]
    for k in (0, 1):
        assert os.path.exists(
            os.path.join(out, "ckpt", "wave=%d" % k, "_SUCCESS"))
        d = os.path.join(out, "frontier", "wave=%d" % (k + 1))
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert files
        t = pq.read_table(os.path.join(d, files[0]))
        assert t.schema.equals(FRONTIER_SCHEMA)
        assert len(t) == 0
    # resume across an exhausted checkpoint still works
    m2 = run_crawl(SF, out, _seeds(), waves=3, resume=True, **kw)
    assert len(m2) == 1 and m2[0]["wave"] == 2
