"""Steal-gated in-process re-measurement of the region_revenue join —
the one BENCH_r04 line that moved the wrong way round-over-round
(5.38 s vs the 3.5 s recorded baseline).  Per the repo's measurement
discipline, only same-process trials with the host probe AND a
/proc/stat steal trace attached are evidence; the question is whether
the regression is code or window weather.

Usage: python scripts/ab_region_revenue.py [trials]
Prints one JSON line: per-trial walls + probe + steal%, plus the
median over steal-clean (<5%) trials.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import NUM_CPUS, SF_DIR, _quiet, host_probe  # noqa: E402


def cpu_steal():
    v = [int(x) for x in open("/proc/stat").readline().split()[1:9]]
    return v[7], sum(v)


def main():
    import ray

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    _quiet()

    import __ray_entry__ as entry

    # one full untimed warm-up (worker spawn + imports are not the
    # claim under test — the 3.5 s baseline was a warm driver run)
    entry.q_region_revenue(SF_DIR).count()

    rows = []
    for i in range(trials):
        p0 = host_probe()
        s0, j0 = cpu_steal()
        t0 = time.perf_counter()
        n = entry.q_region_revenue(SF_DIR).count()
        dt = round(time.perf_counter() - t0, 3)
        s1, j1 = cpu_steal()
        steal = round(100.0 * (s1 - s0) / max(1, j1 - j0), 2)
        rows.append({"trial": i, "sec": dt, "groups": n,
                     "probe": p0, "steal_pct": steal})
        print(json.dumps(rows[-1]), file=sys.stderr)
    ray.shutdown()

    clean = [r for r in rows if r["steal_pct"] < 5.0] or rows
    med = sorted(r["sec"] for r in clean)[len(clean) // 2]
    print(json.dumps({
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "median_clean_sec": med,
        "n_clean": len(clean), "n_total": len(rows),
        "median_probe": sorted(r["probe"] for r in rows)[len(rows) // 2],
        "trials": rows,
    }))


if __name__ == "__main__":
    main()
