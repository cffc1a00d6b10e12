"""Politeness selection: the salted two-phase per-host top-B must equal
the single-phase top-B exactly (the skew optimization may not change
semantics), and ordering must be deterministic."""

import pyarrow as pa
import pytest

from nipper_ray.frontier.hashing import xxh64_str
from nipper_ray.frontier.politeness import select_wave


def _frontier_table(n_hot=400, n_cold=50):
    rows = {"url": [], "host": [], "url_hash": [], "priority": [],
            "depth": []}

    def add(url, host, prio):
        rows["url"].append(url)
        rows["host"].append(host)
        rows["url_hash"].append(xxh64_str(url))
        rows["priority"].append(prio)
        rows["depth"].append(1)

    # one hot host (skew) + several cold hosts
    for i in range(n_hot):
        add("https://hot.example.com/p/%04d" % i, "hot.example.com",
            1.0 / (1 + (i % 7)))
    for h in range(4):
        for i in range(n_cold):
            add("https://c%d.example.com/p/%04d" % (h, i),
                "c%d.example.com" % h, 0.5)
    return pa.table({
        "url": pa.array(rows["url"], pa.string()),
        "host": pa.array(rows["host"], pa.string()),
        "url_hash": pa.array(rows["url_hash"], pa.uint64()),
        "priority": pa.array(rows["priority"], pa.float64()),
        "depth": pa.array(rows["depth"], pa.int32()),
    })


@pytest.fixture(scope="module")
def frontier_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_frontier_table())


def _rows(ds):
    out = [(r["priority"], r["url"]) for r in ds.take_all()]
    return sorted(out, key=lambda x: (-x[0], x[1]))


def test_salted_equals_unsalted(frontier_ds):
    a = _rows(select_wave(frontier_ds, per_host_budget=30,
                          wave_budget=100, salted=True))
    b = _rows(select_wave(frontier_ds, per_host_budget=30,
                          wave_budget=100, salted=False))
    assert a == b
    assert len(a) == 100


def test_per_host_budget_enforced(frontier_ds):
    out = select_wave(frontier_ds, per_host_budget=10,
                      wave_budget=10_000).take_all()
    from collections import Counter

    per_host = Counter(r["host"] for r in out)
    assert all(v <= 10 for v in per_host.values())
    assert per_host["hot.example.com"] == 10


def test_deterministic_across_runs(frontier_ds):
    a = _rows(select_wave(frontier_ds, 25, 80))
    b = _rows(select_wave(frontier_ds, 25, 80))
    assert a == b


def test_select_wave_equals_bruteforce(frontier_ds):
    """The distributed selection (salted two-phase top-B + per-
    partition wave_budget truncation + capped sort/limit) equals the
    trivially-correct pandas reference: per-host (priority desc, url)
    head-B, then global (priority desc, url) head-K."""
    import pandas as pd

    df = _frontier_table().to_pandas()
    for B, K in ((30, 100), (10, 37), (400, 10_000), (1, 3)):
        ref = (df.sort_values(["priority", "url"],
                              ascending=[False, True], kind="mergesort")
               .groupby("host", sort=False).head(B)
               .sort_values(["priority", "url"],
                            ascending=[False, True], kind="mergesort")
               .head(K))
        want = sorted(zip(ref["priority"], ref["url"]),
                      key=lambda x: (-x[0], x[1]))
        for salted in (True, False):
            got = _rows(select_wave(frontier_ds, per_host_budget=B,
                                    wave_budget=K, salted=salted))
            assert got == want, (B, K, salted)


def test_crawl_delay_caps_wave_budget(ray_session):
    """A host advertising Crawl-delay gets its per-wave cap tightened
    to wave_period/delay requests (deterministic token model, no wall
    clock); hosts without a delay keep the full budget."""
    import pyarrow as pa
    import ray.data as rd

    from nipper_ray.frontier.politeness import (RobotsFilterStage,
                                                select_wave)
    from nipper_ray.frontier.hashing import xxh64_str

    def fetcher(host):
        if host == "slow.example.com":
            return "User-agent: *\nCrawl-delay: 60\n"
        return "User-agent: *\nDisallow:\n"

    rows = {"url": [], "host": [], "url_hash": [], "depth": [],
            "priority": []}
    for host in ("slow.example.com", "fast.example.com"):
        for i in range(20):
            u = "https://%s/p/%02d" % (host, i)
            rows["url"].append(u)
            rows["host"].append(host)
            rows["url_hash"].append(xxh64_str(u))
            rows["depth"].append(0)
            rows["priority"].append(1.0)
    t = pa.table({
        "url": pa.array(rows["url"]),
        "host": pa.array(rows["host"]),
        "url_hash": pa.array(rows["url_hash"], pa.uint64()),
        "depth": pa.array(rows["depth"], pa.int32()),
        "priority": pa.array(rows["priority"], pa.float64()),
    })
    stage = RobotsFilterStage()
    stage.cache.fetcher = fetcher
    ds = rd.from_arrow(t).map_batches(stage, batch_format="pyarrow")
    out = select_wave(ds, per_host_budget=15, wave_budget=100,
                      salted=False, wave_period_s=300.0).to_pandas()
    per_host = out.groupby("host").size().to_dict()
    # slow: min(15, 300//60) = 5; fast: full 15
    assert per_host == {"slow.example.com": 5, "fast.example.com": 15}
    # deterministic choice: the url-ascending head of each host
    slow = sorted(out[out.host == "slow.example.com"].url)
    assert slow == ["https://slow.example.com/p/%02d" % i
                    for i in range(5)]


def test_robots_stage_vectorized_matches_scalar():
    """The per-host vectorized rules matching inside RobotsFilterStage
    must agree row-for-row with the scalar RobotsRules.allowed
    evaluator, including longest-match precedence, Allow-on-tie,
    Crawl-delay surfacing, and the exotic-URL fallback."""
    import pyarrow as pa

    from nipper_ray.frontier.politeness import RobotsFilterStage
    from nipper_ray.frontier.robots import RobotsCache

    robots = {
        "a.com": ("User-agent: *\nDisallow: /doc/\nAllow: /doc/ok\n"
                  "Crawl-delay: 2\n"),
        "b.com": ("User-agent: *\nDisallow: /x\nAllow: /x\n"  # tie->Allow
                  "Disallow: /deep/path/\n"),
        "c.com": "User-agent: *\n",                 # no rules: allow all
        "d.com": "User-agent: *\nDisallow: /\n",    # deny all
    }

    def fetcher(host):
        return robots.get(host, "User-agent: *\n")

    urls = [
        "http://a.com/doc/1", "http://a.com/doc/ok/page",
        "http://a.com/other", "http://b.com/x", "http://b.com/xy",
        "http://b.com/deep/path/z", "http://b.com/deep/", 
        "http://c.com/anything", "http://d.com/", "http://d.com/p?q=1",
        "http://user@a.com:8080/doc/2",   # exotic: userinfo + port
        "http://A.COM/doc/3",             # uppercase host
        "ftp://c.com",                    # no path
    ]
    batch = pa.table({"url": pa.array(urls, pa.string())})
    stage = RobotsFilterStage()
    stage.cache = RobotsCache(fetcher=fetcher)
    out = stage(batch)

    # scalar reference over the same (host, path) extraction
    from urllib.parse import urlsplit

    ref = RobotsCache(fetcher=fetcher)
    want, want_delay = [], []
    for u in urls:
        sp = urlsplit(u)
        h, p = (sp.hostname or "").lower(), sp.path
        if ref.allowed(h, p):
            want.append(u)
            want_delay.append(ref.delay_for(h) or 0.0)
    assert out.column("url").to_pylist() == want
    assert out.column("crawl_delay_s").to_pylist() == want_delay
