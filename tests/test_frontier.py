"""Frontier unit tests: canonicalization, xxhash64, cuckoo filter."""

import numpy as np

from nipper_ray.frontier import CuckooFilter, canonicalize_url, xxh64


def test_xxh64_vectors():
    # published xxHash64 test vectors (seed 0)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


def test_xxh64_long_and_seed():
    data = b"x" * 100
    assert xxh64(data) == xxh64(data)
    assert xxh64(data, seed=1) != xxh64(data)


CANON_CASES = [
    ("HTTP://Example.COM:80/a/b#frag", "http://example.com/a/b"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/", "https://example.com:8443/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/p?q=1#x", "https://example.com/p?q=1"),
    ("https://example.com/%7euser", "https://example.com/~user"),
    ("https://example.com/a%2fb", "https://example.com/a%2Fb"),
    ("mailto:x@y.com", None),
    ("javascript:void(0)", None),
    ("ftp://example.com/f", None),
    ("/rel/path", None),
    ("", None),
]


def test_canonicalize_cases():
    for raw, exp in CANON_CASES:
        assert canonicalize_url(raw) == exp, raw


def test_canonicalize_relative():
    base = "https://example.com/a/b/c"
    assert canonicalize_url("../up", base=base) == "https://example.com/a/up"
    assert canonicalize_url("d?x=1", base=base) \
        == "https://example.com/a/b/d?x=1"
    assert canonicalize_url("#frag", base=base) == "https://example.com/a/b/c"
    assert canonicalize_url("//other.com/p", base=base) \
        == "https://other.com/p"


def test_cuckoo_probe_insert_idempotent():
    cf = CuckooFilter(10000)
    hs = [xxh64(b"u%d" % i) for i in range(5000)]
    mask = cf.check_and_add_many(hs)
    assert mask.sum() >= 4990  # tiny false-positive rate allowed
    assert not cf.check_and_add_many(hs).any()  # idempotent replay
    assert all(cf.contains_hash(h) for h in hs)  # no false negatives


def test_cuckoo_snapshot_byte_exact():
    cf = CuckooFilter(4096)
    hs = [xxh64(b"s%d" % i) for i in range(3000)]
    cf.check_and_add_many(hs)
    blob = cf.snapshot()
    cf2 = CuckooFilter.restore(blob)
    assert cf2.snapshot() == blob
    assert not cf2.check_and_add_many(hs).any()
    assert len(cf2) == len(cf)


def test_seen_shard_snapshot_compressed_and_legacy(ray_session):
    """Shard snapshots are zlib-wrapped (NRZ1 magic) — much smaller
    than the raw filter — and restore() accepts BOTH the wrapped form
    and a legacy raw blob (pre-round-5 checkpoints resume fine)."""
    import ray

    from nipper_ray.frontier.seen import SeenShard

    hs = np.array([xxh64(b"c%d" % i) for i in range(5000)],
                  dtype=np.uint64)
    s = SeenShard.remote(0, 1 << 18)
    ray.get(s.check_and_add.remote(hs))
    blob = ray.get(s.snapshot.remote())
    assert blob[:4] == b"NRZ1"
    raw = CuckooFilter(1 << 18)
    raw.check_and_add_many(hs)
    assert len(blob) < len(raw.snapshot()) // 4  # genuinely compressed
    # round-trip the wrapped form
    s2 = SeenShard.remote(0, 1 << 18)
    ray.get(s2.restore.remote(blob))
    assert not ray.get(s2.check_and_add.remote(hs)).any()
    # legacy raw snapshot restores through the same entry point
    s3 = SeenShard.remote(0, 1 << 18)
    ray.get(s3.restore.remote(raw.snapshot()))
    assert not ray.get(s3.check_and_add.remote(hs)).any()
    for a in (s, s2, s3):
        ray.kill(a)


def test_cuckoo_overflow_correctness():
    cf = CuckooFilter(64)  # force heavy load -> overflow path
    hs = [xxh64(b"o%d" % i) for i in range(1000)]
    cf.check_and_add_many(hs)
    assert all(cf.contains_hash(h) for h in hs)
    blob = cf.snapshot()
    cf2 = CuckooFilter.restore(blob)
    assert all(cf2.contains_hash(h) for h in hs)


def test_xxh64_batch_equals_scalar():
    import random

    import numpy as np

    from nipper_ray.frontier.hashing import xxh64_batch

    rng = random.Random(5)
    items = [bytes(rng.randrange(256) for _ in range(
        rng.choice([0, 1, 3, 4, 7, 8, 12, 15, 16, 31, 32, 33, 64, 100])))
        for _ in range(2000)]
    items += ["https://example.com/x", "", "abc"]
    vec = xxh64_batch(items)
    ref = np.array([xxh64(x.encode() if isinstance(x, str) else x)
                    for x in items], dtype=np.uint64)
    assert (vec == ref).all()
    vec7 = xxh64_batch(items, seed=7)
    ref7 = np.array([xxh64(x.encode() if isinstance(x, str) else x, 7)
                     for x in items], dtype=np.uint64)
    assert (vec7 == ref7).all()


def test_robots_parser():
    from nipper_ray.frontier.robots import (RobotsCache, parse_robots_txt)

    txt = ("# comment\n"
           "User-agent: special-bot\n"
           "Disallow: /\n"
           "\n"
           "User-agent: a\n"
           "User-agent: b\n"
           "Disallow: /x/\n"
           "Disallow: /y\n"
           "Allow: /x/ok\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /doc/7\n"
           "Disallow:\n")  # empty Disallow = allow all (ignored)
    assert parse_robots_txt(txt) == [("/doc/7", False)]
    assert parse_robots_txt(txt, "special-bot") == [("/", False)]
    assert parse_robots_txt(txt, "a") == [("/x/", False), ("/y", False),
                                          ("/x/ok", True)]
    assert parse_robots_txt(txt, "b") == parse_robots_txt(txt, "a")
    # Allow carve-outs: longest-match precedence, tie goes to Allow
    from nipper_ray.frontier.robots import RobotsRules

    rr = RobotsRules(parse_robots_txt(txt, "a"))
    assert not rr.allowed("/x/secret")
    assert rr.allowed("/x/ok/page")      # Allow /x/ok beats Disallow /x/
    assert not rr.allowed("/y/anything")
    assert rr.allowed("/z")
    tie = RobotsRules([("/p", False), ("/p", True)])
    assert tie.allowed("/page"[:2] + "x") and tie.allowed("/p")
    rc = RobotsCache()
    host = "h1.example.com"
    from nipper_ray.frontier.hashing import xxh64_str

    d = xxh64_str(host) % 10
    assert not rc.allowed(host, "/doc/%d" % d)
    assert not rc.allowed(host, "/doc/%d23" % d)
    assert rc.allowed(host, "/doc/%d" % ((d + 1) % 10))
    assert not rc.allowed(host, "/private/x")
    assert rc.allowed(host, "/other")


def test_robots_crawl_delay():
    from nipper_ray.frontier.robots import crawl_delay

    txt = ("User-agent: slowbot\n"
           "Crawl-delay: 10\n"
           "Disallow: /x\n"
           "\n"
           "User-agent: plainbot\n"
           "Disallow: /y\n"
           "\n"
           "User-agent: *\n"
           "Crawl-delay: 1.5\n")
    assert crawl_delay(txt, "slowbot") == 10.0
    # agent has its own group with no delay -> no * fallback
    assert crawl_delay(txt, "plainbot") is None
    assert crawl_delay(txt, "unknown") == 1.5
    assert crawl_delay("User-agent: *\nCrawl-delay: nope\n") is None
