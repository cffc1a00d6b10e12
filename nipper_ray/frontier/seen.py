"""Sharded URL-seen set: cuckoo-filter shards held in Ray actors.

This is the one place the engine drops below the Dataset API: the seen
set is a *shared mutable index* that must persist across waves and be
consulted/updated from every dedup task, which ``map_batches`` alone
cannot express (SURVEY.md §2.7). Design:

- S shard actors, shard routing by ``(url_hash >> 20) % S`` — stable
  across waves and resumes, so each shard's filter is authoritative for
  its hash space.  The 20-bit shift keeps the routing bits disjoint
  from both the cuckoo bucket index (low ~18 bits) and the fingerprint
  (bits 48-63): routing on the low bits would fix them per shard and
  collapse every shard's primary buckets to 1/S of its table;
- the dedup stage is a ``map_batches`` callable class holding the shard
  handles; per batch it partitions hashes by shard (numpy), issues one
  batched RPC per touched shard in parallel, and filters the batch by
  the returned new-masks;
- probe-then-insert is idempotent, so a Ray task retry that replays a
  batch cannot corrupt the set (it just sees duplicates);
- ``snapshot()/restore()`` round-trip each shard byte-exactly for the
  per-wave checkpoint.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One authoritative shard of the URL-seen set."""

    def __init__(self, shard_id: int, capacity: int):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.check_and_add_many(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.filter.contains_many(hashes)

    def snapshot(self) -> bytes:
        """zlib-wrapped byte-exact filter snapshot: the table is mostly
        zero at working fill levels, so the per-wave checkpoint shrinks
        ~10-30x; compression runs here in the actor (8-way parallel,
        off the driver) and also shrinks the object-store transfer."""
        import zlib

        return b"NRZ1" + zlib.compress(self.filter.snapshot(), 1)

    def restore(self, blob: bytes) -> None:
        import zlib

        if blob[:4] == b"NRZ1":
            blob = zlib.decompress(blob[4:])
        self.filter = CuckooFilter.restore(blob)

    def count(self) -> int:
        return len(self.filter)


class SeenSet:
    """Driver-side manager for the shard actors."""

    def __init__(self, num_shards: int = 8,
                 capacity_per_shard: int = 1 << 20):
        self.num_shards = num_shards
        self.shards = [SeenShard.remote(i, capacity_per_shard)
                       for i in range(num_shards)]

    def counts(self):
        return ray.get([s.count.remote() for s in self.shards])

    def snapshot_background(self, paths):
        """Snapshot the shards to *paths* on a background thread — the
        scheduler overlaps both the RPCs and the (tens-of-MB) file
        writes with the outlink pass; the seen set is mutated only by
        DedupStage, which finished with the fetch pipeline.  The driver
        thread spends the window blocked in Ray waits (GIL released),
        so the writer makes real progress.  Call ``.finish()`` before
        trusting the files (re-raises any writer failure, so a bad
        snapshot can never gain a _SUCCESS marker)."""
        import threading

        refs = [s.snapshot.remote() for s in self.shards]
        box = {}

        def work():
            try:
                self.snapshot_collect(refs, paths)
            except BaseException as e:  # re-raised in finish()
                box["exc"] = e

        th = threading.Thread(target=work, daemon=True)
        th.start()

        def finish():
            th.join()
            if "exc" in box:
                raise box["exc"]

        return finish

    @staticmethod
    def snapshot_collect(refs, paths):
        import os
        import threading

        blobs = ray.get(refs)
        # writer-unique tmp names: an orphaned background writer from a
        # failed wave attempt must never interleave with a retry's
        # writer on the same tmp file — os.replace stays atomic, so
        # whichever complete file is promoted last wins
        suffix = ".tmp.%d.%d" % (os.getpid(), threading.get_ident())
        for path, blob in zip(paths, blobs):
            tmp = path + suffix
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)

    def snapshot_to(self, paths):
        self.snapshot_collect([s.snapshot.remote() for s in self.shards],
                              paths)

    def restore_from(self, paths):
        refs = []
        for shard, path in zip(self.shards, paths):
            with open(path, "rb") as f:
                refs.append(shard.restore.remote(f.read()))
        ray.get(refs)

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []


class DedupStage:
    """map_batches stage: keep only rows whose url_hash is new.

    First occurrence wins (also within a batch); metadata of duplicate
    discoveries (src_url) is dropped with the duplicate row."""

    def __init__(self, shard_handles, hash_col: str = "url_hash"):
        self.handles = shard_handles
        self.num_shards = len(shard_handles)
        self.hash_col = hash_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        h = batch.column(self.hash_col).to_numpy(zero_copy_only=False)
        shard = ((h >> np.uint64(20))
                 % np.uint64(self.num_shards)).astype(np.int64)
        mask = np.zeros(len(h), dtype=bool)
        touched = np.unique(shard)
        refs, idxs = [], []
        for s in touched:
            idx = np.nonzero(shard == s)[0]
            idxs.append(idx)
            refs.append(self.handles[int(s)].check_and_add.remote(h[idx]))
        for idx, res in zip(idxs, ray.get(refs)):
            mask[idx] = res
        return batch.filter(pa.array(mask))
