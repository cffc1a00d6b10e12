"""CLI crawl entry — the `ray job submit` shape for the wave loop.

    ray job submit -- python -m nipper_ray.crawl \
        --sf-dir /root/testdata/sf0.01 --out /tmp/crawl_out \
        --waves 3 --wave-budget 2000 --per-host-budget 200 \
        --seeds 0:200:2 [--resume]

Resumable: with --resume the job restores the cuckoo shard snapshots
from the last complete wave checkpoint and continues without
re-fetching (see frontier/scheduler.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def parse_seeds(spec: str):
    from .sources.synth import page_url

    if os.path.exists(spec):
        with open(spec) as f:
            return [line.strip() for line in f if line.strip()]
    try:
        start, stop, step = (int(x) for x in spec.split(":"))
    except ValueError:
        raise SystemExit(
            "error: --seeds must be an existing file of URLs or "
            "start:stop:step over doc ids (got %r)" % spec)
    return [page_url(i) for i in range(start, stop, step)]


def main(argv=None):
    ap = argparse.ArgumentParser(prog="nipper_ray.crawl")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seeds", default="0:100:2",
                    help="seed file path or start:stop:step over doc ids")
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--wave-budget", type=int, default=2000)
    ap.add_argument("--per-host-budget", type=int, default=200)
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--use-actors", action="store_true",
                    help="actor-pool stages (long-running cluster shape)")
    ap.add_argument("--curate", action="store_true",
                    help="after the waves: dedup + quality-filter the "
                         "extracted text into <out>/curated/ parquet")
    ap.add_argument("--warc-out", default=None,
                    help="archive raw fetched html as sharded .warc.gz "
                         "under this dir (tee between fetch and extract)")
    args = ap.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .frontier.scheduler import run_crawl

    fixtures = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures")
    metrics = run_crawl(
        args.sf_dir, args.out, parse_seeds(args.seeds), waves=args.waves,
        resume=args.resume, num_shards=args.num_shards,
        per_host_budget=args.per_host_budget,
        wave_budget=args.wave_budget, use_actors=args.use_actors,
        warc_dir=args.warc_out,
        fixtures_dir=fixtures if os.path.isdir(fixtures) else None)
    for m in metrics:
        # lineage lives in the checkpoint manifest; keep stdout concise
        print(json.dumps({k: v for k, v in m.items() if k != "lineage"}))
    if args.curate:
        from .pipelines.curate import curate_crawl_output

        n, cur_dir = curate_crawl_output(args.out)
        print(json.dumps({"curated_rows": n, "curated_dir": cur_dir}))
    if owns_ray:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
