"""Wave-based crawl scheduler: the end-to-end frontier loop.

Each wave is one streaming Dataset execution (SURVEY.md §3.3):

    read frontier/wave=k (Parquet)
      -> CanonStage            (canonicalize + xxh64 + host columns)
      -> RobotsFilterStage     (actor pool; robots cache in actor state)
      -> DedupStage            (sharded cuckoo-filter probe+insert)
      -> select_wave           (salted per-host top-B, global top-K)
      -> SynthFetchStage       (actor pool; broadcast corpus texts)
      -> ExtractStage          (nipper-semantics parse + a[href] links)
      -> write pages/wave=k    (Parquet partition)
    outlinks -> canonicalized -> frontier/wave=k+1 (Parquet partition)

Checkpoint/resume: after each wave, ckpt/wave=k/ holds the cuckoo shard
snapshots, wave metrics, per-partition lineage and a _SUCCESS marker
written last. ``run_crawl(resume=True)`` finds the last complete wave,
restores the shard filters byte-exactly and continues; pages fetched in
completed waves are never re-fetched.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.extract import ExtractStage, Rule
from ..state import checkpoint as ckpt
from .canonicalize import canonicalize_url, host_of
from .fetch import SynthFetchStage, put_doc_texts
from .hashing import xxh64_batch, xxh64_str
from .politeness import RobotsFilterStage, select_wave
from .seen import DedupStage, SeenSet

FRONTIER_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("host", pa.string()),
    ("url_hash", pa.uint64()),
    ("depth", pa.int32()),
    ("priority", pa.float64()),
    ("discovered_ts", pa.timestamp("ms")),
    ("src_url", pa.string()),
])

CRAWL_RULES = (
    Rule("title", "head title", "text"),
    Rule("body_text", "body", "text"),
    Rule("links", "a[href]", "attrs:href"),
)

_WAVE_TS0 = 1_600_000_000_000  # deterministic discovery timestamps


def _priority_for(depth: int) -> float:
    return round(1.0 / (1 + depth), 6)


def frontier_rows(urls, depth: int, src_urls=None, wave: int = 0):
    """Build canonical frontier rows (driver-side, for seeds/tests)."""
    rows = {"url": [], "host": [], "url_hash": [], "depth": [],
            "priority": [], "discovered_ts": [], "src_url": []}
    src_urls = src_urls or [""] * len(urls)
    for u, s in zip(urls, src_urls):
        cu = canonicalize_url(u, base=s or None)
        if cu is None:
            continue
        rows["url"].append(cu)
        rows["host"].append(host_of(cu))
        rows["url_hash"].append(xxh64_str(cu))
        rows["depth"].append(depth)
        rows["priority"].append(_priority_for(depth))
        rows["discovered_ts"].append(_WAVE_TS0 + wave * 1000)
        rows["src_url"].append(s)
    return pa.table(rows, schema=FRONTIER_SCHEMA)


def _host_of_canonical(url: str) -> str:
    """Host of an already-canonical URL (lowercased netloc, no userinfo):
    plain string slicing instead of a urlsplit round-trip."""
    start = url.index("//") + 2
    end = url.find("/", start)
    netloc = url[start:] if end < 0 else url[start:end]
    colon = netloc.find(":")
    return netloc if colon < 0 else netloc[:colon]


class CanonStage:
    """Canonicalize raw outlink rows into frontier rows.

    Vectorized fast lane: rows whose URL is already canonical (the
    common case — same regex as canonicalize._FAST_RE) are classified,
    host-extracted and timestamped entirely with Arrow C++ kernels and
    hashed with the batched xxh64; only the residue (relative links,
    uppercase, ports, percent-escapes) runs the per-row Python
    canonicalizer."""

    # keep in sync with canonicalize._FAST_RE (re2-compatible)
    _FAST_PAT = (r"^https?://[a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?"
                 r"/[^#%?\s]*(?:\?[^#%\s]+)?$")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if len(batch) == 0:
            return pa.table({k: [] for k in FRONTIER_SCHEMA.names},
                            schema=FRONTIER_SCHEMA)
        mask = pc.fill_null(
            pc.match_substring_regex(batch.column("url"), self._FAST_PAT),
            False)
        parts = []
        fast = batch.filter(mask)
        if len(fast):
            urls = fast.column("url")
            host = pc.struct_field(
                pc.extract_regex(urls, r"^https?://(?P<h>[^/]+)/"), "h")
            depth = pc.cast(fast.column("depth"), pa.int32())
            prio = pc.round(
                pc.divide(pa.scalar(1.0),
                          pc.add(pc.cast(depth, pa.float64()),
                                 pa.scalar(1.0))), ndigits=6)
            ts = pc.cast(
                pc.add(pc.multiply(pc.cast(fast.column("wave"),
                                           pa.int64()),
                                   pa.scalar(1000)),
                       pa.scalar(_WAVE_TS0)),
                pa.timestamp("ms"))
            hashes = xxh64_batch(urls.to_pylist())
            parts.append(pa.table({
                "url": urls,
                "host": host,
                "url_hash": pa.array(hashes, pa.uint64()),
                "depth": depth,
                "priority": prio,
                "discovered_ts": ts,
                "src_url": fast.column("src_url"),
            }, schema=FRONTIER_SCHEMA))
        slow = batch.filter(pc.invert(mask))
        if len(slow):
            parts.append(self._canon_rows_python(
                slow.column("url").to_pylist(),
                slow.column("src_url").to_pylist(),
                slow.column("depth").to_pylist(),
                slow.column("wave").to_pylist()))
        if not parts:
            return pa.table({k: [] for k in FRONTIER_SCHEMA.names},
                            schema=FRONTIER_SCHEMA)
        return pa.concat_tables(parts)

    @staticmethod
    def _canon_rows_python(urls, srcs, depths, waves) -> pa.Table:
        rows = {"url": [], "host": [], "depth": [],
                "priority": [], "discovered_ts": [], "src_url": []}
        memo = {}
        for u, s, d, w in zip(urls, srcs, depths, waves):
            key = (u, s)
            hit = memo.get(key)
            if hit is None:
                cu = canonicalize_url(u, base=s or None)
                hit = (cu, _host_of_canonical(cu) if cu else None)
                memo[key] = hit
            cu, host = hit
            if cu is None:
                continue
            rows["url"].append(cu)
            rows["host"].append(host)
            rows["depth"].append(d)
            rows["priority"].append(_priority_for(d))
            rows["discovered_ts"].append(_WAVE_TS0 + w * 1000)
            rows["src_url"].append(s)
        hashes = xxh64_batch(rows["url"])
        return pa.table({
            "url": pa.array(rows["url"], pa.string()),
            "host": pa.array(rows["host"], pa.string()),
            "url_hash": pa.array(hashes, pa.uint64()),
            "depth": pa.array(rows["depth"], pa.int32()),
            "priority": pa.array(rows["priority"], pa.float64()),
            "discovered_ts": pa.array(rows["discovered_ts"],
                                      pa.timestamp("ms")),
            "src_url": pa.array(rows["src_url"], pa.string()),
        }, schema=FRONTIER_SCHEMA)


def _write_ds(ds, path: str) -> int:
    # purge any partial output from a previous crashed attempt of this
    # wave: ray's write_parquet uses unique filenames, so re-running an
    # incomplete wave (one with no _SUCCESS checkpoint yet) would
    # otherwise APPEND beside stale files and duplicate rows on resume
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    # coalesce output files: tiny per-block files defeat the partitioned
    # layout (each reader task would open hundreds of 11-row files)
    try:
        ds.write_parquet(path, min_rows_per_file=10_000)
    except TypeError:  # older ray releases
        ds.write_parquet(path)
    return _count_parquet_dir(path)


def _partition_lineage(path: str) -> dict:
    """Per-partition lineage: output file -> row count."""
    return {f: pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path)) if f.endswith(".parquet")}


def _count_parquet_dir(path: str) -> int:
    return sum(pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
               for f in os.listdir(path) if f.endswith(".parquet"))


class CrawlJob:
    def __init__(self, sf_dir: str, out_dir: str, num_shards: int = 8,
                 per_host_budget: int = 50, wave_budget: int = 400,
                 shard_capacity: int = 1 << 20, limit=None,
                 extract_concurrency=4, fixtures_dir=None,
                 pool_size: int = 2, actor_cpus: float = 1.0,
                 use_actors: bool = False, warc_dir=None):
        self.sf_dir = sf_dir
        self.out_dir = out_dir
        self.num_shards = num_shards
        self.per_host_budget = per_host_budget
        self.wave_budget = wave_budget
        self.limit = limit
        self.extract_concurrency = extract_concurrency
        self.fixtures_dir = fixtures_dir
        self.pool_size = pool_size
        self.actor_cpus = actor_cpus
        self.use_actors = use_actors
        self.warc_dir = warc_dir
        self.seen = SeenSet(num_shards, shard_capacity)
        self.texts_ref, self.n_docs = put_doc_texts(sf_dir, limit=limit)

    # -- paths ----------------------------------------------------------
    def _pages_dir(self, k):
        return os.path.join(self.out_dir, "pages", "wave=%d" % k)

    def _frontier_dir(self, k):
        return os.path.join(self.out_dir, "frontier", "wave=%d" % k)

    def _ckpt_dir(self, k):
        return ckpt.ckpt_dir(self.out_dir, k)

    def last_complete_wave(self):
        return ckpt.last_complete_wave(self.out_dir)

    # -- lifecycle -------------------------------------------------------
    def seed(self, seed_urls):
        t = frontier_rows(seed_urls, depth=0, wave=0)
        d = self._frontier_dir(0)
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, os.path.join(d, "seed.parquet"))

    def resume(self):
        """Restore the seen set from the last complete wave's checkpoint.
        Returns the next wave index to run."""
        k = self.last_complete_wave()
        if k >= 0:
            self.seen.restore_from(
                ckpt.shard_paths(self._ckpt_dir(k), self.num_shards))
        return k + 1

    def _maybe_archive(self, wave, k: int):
        """Optional WARC tee between fetch and extract: raw html is
        archived as sharded .warc.gz exactly where a production crawler
        writes its archive, while the pipeline keeps streaming."""
        if self.warc_dir is None:
            return wave
        from ..sources.warc import WarcArchiveStage

        return wave.map_batches(
            WarcArchiveStage(os.path.join(self.warc_dir,
                                          "wave=%d" % k)),
            batch_format="pyarrow", batch_size=256)

    def run_wave(self, k: int) -> dict:
        import ray.data as rd

        t_wave0 = time.perf_counter()
        frontier_in = self._frontier_dir(k)
        n_in = _count_parquet_dir(frontier_in)
        # columns= prunes the read AND drops the hive partition column
        # ray.data infers from the wave=k directory name.
        # Block count sized to the frontier: the default 64-way split
        # turned a few-thousand-row frontier into 64 tiny tasks PER
        # OPERATOR (measured: ~17 ms of work per task under seconds of
        # scheduling) — ~2k rows per block keeps every stage's task
        # count proportional to real work, capped so huge frontiers
        # still fan out.
        nblocks = min(max(1, n_in // 2048), 256)
        ds = rd.read_parquet(frontier_in,
                             columns=list(FRONTIER_SCHEMA.names),
                             override_num_blocks=nblocks)
        keep = ("url", "host", "depth", "priority", "warc_ts", "fetch_ok")
        if self.use_actors:
            # actor-pool shape: the right fit for long-running cluster
            # crawls where pool ramp-up amortizes.
            # Caveat (ray issue 53727): fn_constructor_kwargs values that
            # are ObjectRefs (texts_ref) or actor handles (shard_handles)
            # are pinned in the object store; if that object is lost on a
            # node failure, actor RESTART fails even though fresh tasks
            # would succeed.  Handles/refs here are driver-owned (the
            # driver keeps them alive for the whole job), so restart only
            # breaks if the driver dies — at which point the wave re-runs
            # from the checkpoint anyway (see state/checkpoint.py).
            ds = ds.map_batches(RobotsFilterStage, batch_format="pyarrow",
                                concurrency=self.pool_size,
                                num_cpus=self.actor_cpus)
            ds = ds.map_batches(
                DedupStage, batch_format="pyarrow",
                fn_constructor_kwargs={"shard_handles": self.seen.shards},
                concurrency=self.pool_size, num_cpus=self.actor_cpus)
            wave = select_wave(ds, self.per_host_budget, self.wave_budget)
            wave = wave.map_batches(
                SynthFetchStage, batch_format="pyarrow", batch_size=64,
                fn_constructor_kwargs={
                    "doc_texts_ref": self.texts_ref, "n_docs": self.n_docs,
                    "fixtures_dir": self.fixtures_dir},
                concurrency=self.pool_size, num_cpus=self.actor_cpus)
            wave = self._maybe_archive(wave, k)
            wave = wave.map_batches(
                ExtractStage, batch_format="pyarrow", batch_size=32,
                fn_constructor_kwargs={"rules": CRAWL_RULES,
                                       "keep_cols": keep},
                concurrency=self.extract_concurrency,
                num_cpus=self.actor_cpus)
        else:
            # stateless-task shape: driver-constructed picklable stage
            # instances, cached per worker process; no pool ramp-up
            ds = ds.map_batches(RobotsFilterStage(),
                                batch_format="pyarrow")
            ds = ds.map_batches(DedupStage(self.seen.shards),
                                batch_format="pyarrow")
            wave = select_wave(ds, self.per_host_budget, self.wave_budget,
                               salted=n_in >= 50_000)
            wave = wave.map_batches(
                SynthFetchStage(self.texts_ref, self.n_docs,
                                self.fixtures_dir),
                batch_format="pyarrow", batch_size=256)
            wave = self._maybe_archive(wave, k)
            wave = wave.map_batches(
                ExtractStage(rules=CRAWL_RULES, keep_cols=keep),
                batch_format="pyarrow", batch_size=128)
        # one execution, two consumers: the materialized wave (bounded
        # by wave_budget rows, raw html already dropped by ExtractStage,
        # distributed + spillable) feeds BOTH the durable pages write
        # and the outlink pass — re-reading the just-written Parquet
        # cost a full second executor spin-up + a disk round trip per
        # wave.  Resume semantics are unchanged: _SUCCESS still goes
        # last, so a crash anywhere in the wave re-runs it whole.
        wave = wave.materialize()
        n_pages = _write_ds(wave, self._pages_dir(k))
        t_pipeline = time.perf_counter()

        # seen-set shards are final once the fetch pipeline is done
        # (only DedupStage mutates them): snapshot them — RPCs AND the
        # tens-of-MB file writes — on a background thread overlapping
        # the outlink pass
        ck_dir = self._ckpt_dir(k)
        os.makedirs(ck_dir, exist_ok=True)
        snap_finish = self.seen.snapshot_background(
            ckpt.shard_paths(ck_dir, self.num_shards))

        if n_pages == 0:
            # exhausted wave: an all-empty Dataset may have lost its
            # schema (groupby on empties), so emit the typed empty
            # frontier directly instead of running the outlink pass.
            # Purge first like _write_ds: a stale non-empty frontier
            # from a previous run must not survive beside it.
            d = self._frontier_dir(k + 1)
            if os.path.isdir(d):
                import shutil

                shutil.rmtree(d)
            os.makedirs(d, exist_ok=True)
            pq.write_table(FRONTIER_SCHEMA.empty_table(),
                           os.path.join(d, "empty.parquet"))
            n_frontier = 0
        else:
            # outlinks -> next wave's frontier partitions
            pages = wave.select_columns(["url", "links", "depth"])

            def explode(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                links = t.column("links")
                parents = pc.list_parent_indices(links)
                return pa.table({
                    "url": pc.cast(pc.list_flatten(links), pa.string()),
                    "src_url": pc.cast(
                        pc.take(t.column("url"), parents), pa.string()),
                    "depth": pc.cast(
                        pc.add(pc.take(t.column("depth"), parents), 1),
                        pa.int32()),
                    "wave": pa.array(
                        np.full(len(parents), k + 1, dtype=np.int32)),
                })

            out = pages.map_batches(explode, batch_format="pyarrow")
            out = out.map_batches(CanonStage(), batch_format="pyarrow")
            n_frontier = _write_ds(out, self._frontier_dir(k + 1))
        t_outlinks = time.perf_counter()

        metrics = self._wave_metrics(k, n_in, n_pages, n_frontier,
                                     frontier_in, t_wave0, t_pipeline,
                                     t_outlinks)
        ckpt.write_checkpoint(ck_dir, self.seen,
                              self.num_shards, metrics,
                              snapshot_finish=snap_finish)
        metrics["phase_sec"]["checkpoint"] = round(
            time.perf_counter() - t_outlinks, 2)
        # keep the persisted manifest consistent with the returned/bench
        # metrics (the checkpoint phase can only be timed after the fact)
        ckpt.amend_manifest(ck_dir, metrics)
        return metrics

    def _wave_metrics(self, k, n_in, n_pages, n_frontier, frontier_in,
                      t_wave0, t_pipeline, t_outlinks) -> dict:
        return {
            "wave": k,
            "frontier_in": n_in,
            "pages_fetched": n_pages,
            "outlinks_discovered": n_frontier,
            "seen_counts": self.seen.counts(),
            "pages_dir": self._pages_dir(k),
            "frontier_out": self._frontier_dir(k + 1),
            "lineage": {
                "frontier_in": _partition_lineage(frontier_in),
                "pages": _partition_lineage(self._pages_dir(k)),
                "frontier_next": _partition_lineage(
                    self._frontier_dir(k + 1)),
            },
            "phase_sec": {
                "fetch_extract_pipeline": round(t_pipeline - t_wave0, 2),
                "outlinks": round(t_outlinks - t_pipeline, 2),
            },
        }

    def shutdown(self):
        self.seen.shutdown()


def run_crawl(sf_dir: str, out_dir: str, seed_urls, waves: int = 3,
              resume: bool = False, **kw) -> list:
    """Run (or resume) a multi-wave crawl; returns per-wave metrics."""
    job = CrawlJob(sf_dir, out_dir, **kw)
    try:
        if resume:
            start = job.resume()
            if start == 0 and not os.path.exists(job._frontier_dir(0)):
                # nothing to resume from: behave like a fresh start
                job.seed(seed_urls)
        else:
            job.seed(seed_urls)
            start = 0
        out = []
        for k in range(start, waves):
            out.append(job.run_wave(k))
        return out
    finally:
        job.shutdown()
