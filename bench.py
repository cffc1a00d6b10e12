"""Headline benchmark. Prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "rates": {...derived throughputs...}}

Pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1):
  extract        read pages corpus -> ExtractStage -> consume
                 (pages/sec: the nipper-semantics parse+select kernel)
  frontier_dedup 500k+ outlink URLs -> canonicalize+xxh64 ->
                 sharded-cuckoo probe+insert (URLs/sec)
  crawl          2 full frontier waves (robots+dedup+politeness+fetch+
                 extract+checkpoint)

`bench.py --scaling` runs the extract pipeline at two parallelism
levels (fresh processes, default num_cpus=2 vs 8 — see the pair-choice
note in scaling()) on the same corpus and reports throughput at both
plus scaling efficiency = (t_lo/t_hi)/(hi/lo), median over interleaved
pairs, with /proc/stat CPU-steal recorded per run and >5%-steal pairs
discarded+retried.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("GRAFT_PAGES_REPEAT", "10"))


def host_probe() -> float:
    """Fixed single-core probe for cross-window normalization: this
    sandbox is a slice of a shared host whose effective CPU speed
    swings 2-2.5x between minutes (see BASELINE.md round 3); recording
    the probe beside every wall time lets readers separate engine
    changes from host weather."""
    t0 = time.perf_counter()
    s = 0
    for i in range(5_000_000):
        s += i * i
    return round(time.perf_counter() - t0, 3)


def _quiet():
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray").setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def bench_extract(pages_path: str) -> tuple:
    import ray.data as rd

    from nipper_ray.stages import extract_pages

    def run():
        import shutil

        import pyarrow.parquet as pq

        out_dir = "/tmp/nipper_ray_bench/extract_out"
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        ds = rd.read_parquet(pages_path, columns=["url", "html"])
        out = extract_pages(ds, batch_size=256)
        # parallel sink — driver-side iter_batches would serialize the
        # whole output through one thread and cap scaling
        out.write_parquet(out_dir)
        return sum(
            pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
            for f in os.listdir(out_dir) if f.endswith(".parquet"))

    # warm-up: one full untimed run — a small limit() warms only the
    # few workers its tasks touch, leaving per-worker cold-start
    # (process spawn + imports + C-module load) inside the timed
    # region, which biases scaling pairs against the high-CPU run
    run()

    t0 = time.perf_counter()
    n = run()
    dt = time.perf_counter() - t0
    return dt, n


def bench_frontier_dedup(n_urls: int) -> tuple:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from nipper_ray.frontier.scheduler import CanonStage
    from nipper_ray.frontier.seen import DedupStage, SeenSet
    from nipper_ray.sources.synth import outlink_ids, page_url

    # deterministic raw frontier with duplicates (outlink graph)
    path = "/tmp/nipper_ray_bench/frontier_%d.parquet" % n_urls
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        n_pages = n_urls // 10
        urls, srcs = [], []
        for d in range(n_pages):
            src = page_url(d)
            for t in outlink_ids(d, n_pages):
                urls.append(page_url(t))
                srcs.append(src)
        t = pa.table({
            "url": pa.array(urls, pa.string()),
            "src_url": pa.array(srcs, pa.string()),
            "depth": pa.array([1] * len(urls), pa.int32()),
            "wave": pa.array([1] * len(urls), pa.int32()),
        })
        pq.write_table(t, path + ".tmp", row_group_size=16384)
        os.replace(path + ".tmp", path)

    seen = SeenSet(num_shards=8, capacity_per_shard=1 << 21)
    try:
        t0 = time.perf_counter()
        # stateless pickled stage instances (the crawl scheduler's own
        # shape) + blocks sized to the input: interleaved A/B vs the
        # 4-actor pool with the default split read 1.53 s vs 2.68 s
        # median (1.75x) and far lower variance — pool spawn and tiny
        # tasks were both inside the timed region (BASELINE round 5)
        ds = rd.read_parquet(
            path, override_num_blocks=max(1, min(256, n_urls // 8192)))
        ds = ds.map_batches(CanonStage(), batch_format="pyarrow",
                            batch_size=8192)
        ds = ds.map_batches(DedupStage(seen.shards),
                            batch_format="pyarrow", batch_size=8192)
        kept = ds.count()
        dt = time.perf_counter() - t0
        return dt, kept
    finally:
        seen.shutdown()


def bench_crawl(waves: int = 2) -> tuple:
    import shutil

    from nipper_ray.frontier.scheduler import run_crawl
    from nipper_ray.sources.synth import page_url

    out = "/tmp/nipper_ray_bench/crawl"
    shutil.rmtree(out, ignore_errors=True)
    seeds = [page_url(i) for i in range(0, 200, 2)]
    t0 = time.perf_counter()
    metrics = run_crawl(
        SF_DIR, out, seeds, waves=waves, num_shards=8,
        per_host_budget=400, wave_budget=3000,
        extract_concurrency=max(2, NUM_CPUS // 2),
        pool_size=max(2, NUM_CPUS // 8), actor_cpus=1.0,
        fixtures_dir=os.path.join(REPO, "tests", "fixtures"))
    dt = time.perf_counter() - t0
    pages = [m["pages_fetched"] for m in metrics]
    phases = [m["phase_sec"] for m in metrics]
    return dt, pages, phases


def bench_ops(queries: dict, rates: dict) -> None:
    """LLM-data ops over the sf tables: distributed minhash near-dup,
    exact ppjoin n-gram Jaccard, exact block-grid embedding near-dup,
    and the TPC-H-Q5-shaped hash-partitioned join (the __ray_entry__
    pipelines, timed)."""
    import __ray_entry__ as entry

    t0 = time.perf_counter()
    n = entry.q_minhash_neardup(SF_DIR).count()
    dt = time.perf_counter() - t0
    queries["minhash_neardup"] = round(dt, 3)
    rates["minhash_pairs_found"] = n

    t0 = time.perf_counter()
    n = entry.q_ngram_jaccard(SF_DIR).count()
    dt = time.perf_counter() - t0
    queries["ngram_jaccard"] = round(dt, 3)
    rates["ngram_pairs_found"] = n

    t0 = time.perf_counter()
    n = entry.q_embedding_neardup(SF_DIR).count()
    dt = time.perf_counter() - t0
    queries["embedding_neardup"] = round(dt, 3)
    rates["embedding_pairs_found"] = n

    t0 = time.perf_counter()
    n = entry.q_region_revenue(SF_DIR).count()
    dt = time.perf_counter() - t0
    queries["join_region_revenue"] = round(dt, 3)
    rates["join_groups"] = n


def main():
    import ray

    from nipper_ray.sources.synth import synth_pages_parquet

    # corpus prep is cached + untimed
    pages_path = synth_pages_parquet(SF_DIR, repeat=REPEAT)

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _quiet()

    queries = {}
    rates = {}

    dt, n_pages = bench_extract(pages_path)
    queries["extract"] = round(dt, 3)
    rates["extract_pages_per_sec"] = round(n_pages / dt, 1)

    if os.environ.get("GRAFT_BENCH_ONLY") == "extract":
        ray.shutdown()
        print(json.dumps({
            "metric": "pages/sec extraction (synthetic CC-style corpus, "
                      "%d pages)" % n_pages,
            "value": queries["extract"], "unit": "sec",
            "queries": queries, "sf": SF_DIR, "num_cpus": NUM_CPUS,
            "rates": rates,
        }))
        return

    n_urls = 200_000
    dt, kept = bench_frontier_dedup(n_urls)
    queries["frontier_dedup"] = round(dt, 3)
    rates["dedup_urls_per_sec"] = round(n_urls / dt, 1)
    rates["dedup_unique_kept"] = kept

    # 4 waves: wave 0 pays first-execution warmup; waves 1-3 are the
    # steady state whose pages/s projects to long crawls (the round-3
    # 2-wave line was warmup-dominated and weather-sensitive)
    dt, per_wave_pages, phases = bench_crawl(waves=4)
    queries["crawl_4waves"] = round(dt, 3)
    # phase-accounted 2-wave equivalent for round-over-round continuity
    # with the old crawl_2waves line (phases sum to ~99% of its wall)
    queries["crawl_2waves"] = round(
        sum(sum(p.values()) for p in phases[:2]), 3)
    crawled = sum(per_wave_pages)
    rates["crawl_pages_per_sec"] = round(crawled / dt, 1)
    warm_pages = sum(per_wave_pages[1:])
    warm_sec = sum(sum(p.values()) for p in phases[1:])
    rates["crawl_warm_pages_per_sec"] = round(warm_pages / warm_sec, 1)
    # per-wave phase split: shows the wall is fixed-overhead-bound at
    # this scale (see BASELINE.md round-3 attribution)
    rates["crawl_wave_phases"] = phases

    # headline value = the 3 crawl pipelines (comparable across rounds);
    # crawl_2waves is phase-DERIVED from the 4-wave run (not an extra
    # run), so it is excluded from the sum; the ops section below is
    # timed separately in `queries`
    headline = round(queries["extract"] + queries["frontier_dedup"]
                     + queries["crawl_4waves"], 3)
    bench_ops(queries, rates)

    ray.shutdown()

    from nipper_ray.html import cscan

    rates["host_probe_sec"] = host_probe()
    rates["cscan"] = cscan.get() is not None
    out = {
        "metric": "pages/sec extraction + frontier-dedup URLs/sec "
                  "(synthetic CC-style corpus, %d pages)" % n_pages,
        "value": headline,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rates": rates,
    }
    print(json.dumps(out))


def scaling():
    import subprocess

    def cpu_steal():
        """(steal_jiffies, total_jiffies) from /proc/stat line 1."""
        try:
            v = [int(x) for x in open("/proc/stat").readline().split()[1:9]]
            return v[7], sum(v)
        except Exception:
            return 0, 1

    def run(ncpu):
        # 8x corpus for scaling runs so per-core compute dominates the
        # fixed pipeline spin-up inside the timed region (4x stopped
        # being enough once the C selector engine halved per-page cost)
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_ONLY="extract")
        env.setdefault("GRAFT_PAGES_REPEAT", str(REPEAT * 8))
        s0, t0 = cpu_steal()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")], env=env,
            capture_output=True, text=True, check=True).stdout
        s1, t1 = cpu_steal()
        r = json.loads(out.strip().splitlines()[-1])
        r["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
        return r

    # Pair choice (round-4 investigation, BASELINE.md "Scaling evidence
    # round 4"): this sandbox is a 32-vCPU slice of a shared VM host.
    # Two machine-level artifacts pollute wall-clock pairs here:
    #   1. CPU-steal bursts — co-tenant load spikes stole up to 25% of
    #      cycles for a minute at a time; a trial that lands in a burst
    #      is garbage regardless of pairing.  Each run now records
    #      steal% from /proc/stat and a pair is retried when either
    #      side saw >5% steal.
    #   2. Memory-bandwidth saturation ≥~16 concurrent parse tasks:
    #      with the C parse+select kernel (~5x the bytes/s/core of the
    #      round-3 Python kernel) identical task sets cost 55-60
    #      core-sec at 4 workers but 70-105 core-sec at 16 in clean
    #      0%-steal windows — the box runs out of shared DRAM
    #      bandwidth, not the pipeline out of parallelism.  Adding
    #      cluster NODES adds DRAM with every 4 cores; co-scheduling 16
    #      tasks on one VM does not.  The default pair is therefore
    #      2 vs 8 — same 4x ratio, both levels in the machine's linear
    #      region.  The saturated 4v16 pair measured ~0.6-0.73 clean;
    #      both numbers are recorded in BASELINE.md.  Override with
    #      GRAFT_SCALE_LO/HI to reproduce either.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    trials = int(os.environ.get("GRAFT_SCALE_TRIALS", "3"))
    max_runs = trials * 2 + 3
    # Noise within one window hits BOTH parallelism levels, so trials
    # are interleaved (lo,hi) pairs and the reported efficiency is the
    # MEDIAN of the per-pair ratios; every raw trial is printed.
    pairs = []
    discarded = []
    probes = []
    runs_done = 0
    while len(pairs) < trials and runs_done < max_runs:
        probes.append(host_probe())
        r_lo = run(lo)
        r_hi = run(hi)
        runs_done += 2
        t_lo = r_lo["queries"]["extract"]
        t_hi = r_hi["queries"]["extract"]
        rec = {"sec_%d" % lo: t_lo, "sec_%d" % hi: t_hi,
               "eff": round((t_lo / t_hi) / (hi / lo), 3),
               "steal_pct": [r_lo["steal_pct"], r_hi["steal_pct"]]}
        if max(r_lo["steal_pct"], r_hi["steal_pct"]) > 5.0:
            discarded.append(rec)
        else:
            pairs.append(rec)
    if not pairs:  # every window was stolen; report what we have
        pairs, discarded = discarded, []
    effs = sorted(p["eff"] for p in pairs)
    median_eff = effs[len(effs) // 2]
    best = min(pairs, key=lambda p: abs(p["eff"] - median_eff))
    print(json.dumps({
        "pipeline": "extract",
        "sec_%d" % lo: best["sec_%d" % lo],
        "sec_%d" % hi: best["sec_%d" % hi],
        "paired_trials": pairs,
        "discarded_stolen_trials": discarded,
        "scaling_efficiency": median_eff,
        "host_probe_sec": probes,
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
