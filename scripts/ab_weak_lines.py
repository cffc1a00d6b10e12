"""Interleaved re-measurement of the two round-3 'weak' bench lines
(crawl_2waves, embedding_neardup) with the host probe attached to every
trial — the repo's round-2/3 discipline: only same-process interleaved
numbers are evidence; cross-window walls are host weather.

Usage: python scripts/ab_weak_lines.py [trials]
Prints one JSON line with all raw trials + probes.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import NUM_CPUS, SF_DIR, bench_crawl, host_probe, _quiet  # noqa: E402


def main():
    import ray

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    _quiet()

    import __ray_entry__ as entry

    # warm the workers (first-execution fixed cost is not the claim
    # under test — the recorded baselines were warm-ish driver runs)
    entry.q_embedding_neardup(SF_DIR).count()

    rows = []
    for i in range(trials):
        p0 = host_probe()
        t0 = time.perf_counter()
        n = entry.q_embedding_neardup(SF_DIR).count()
        emb = round(time.perf_counter() - t0, 3)
        p1 = host_probe()
        dt, pages, phases = bench_crawl()
        crawl = round(dt, 3)
        p2 = host_probe()
        rows.append({"trial": i, "probe_before": p0,
                     "embedding_neardup_sec": emb, "emb_pairs": n,
                     "probe_mid": p1, "crawl_2waves_sec": crawl,
                     "crawl_pages": sum(pages), "crawl_phases": phases,
                     "probe_after": p2})
        print(json.dumps(rows[-1]), file=sys.stderr)
    ray.shutdown()
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print(json.dumps({
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "median_embedding_neardup_sec": med(
            [r["embedding_neardup_sec"] for r in rows]),
        "median_crawl_2waves_sec": med(
            [r["crawl_2waves_sec"] for r in rows]),
        "median_probe": med([r["probe_mid"] for r in rows]),
        "trials": rows,
    }))


if __name__ == "__main__":
    main()
