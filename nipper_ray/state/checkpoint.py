"""Per-wave checkpoint state: cuckoo shard snapshots + wave manifest.

Layout (resumable-output contract, ray_guide "Sources & sinks"):

    <out>/ckpt/wave=K/
        seen_shard_<i>.bin   byte-exact cuckoo filter snapshots
        manifest.json        wave metrics + per-partition lineage
        _SUCCESS             written LAST; its presence marks the wave
                             complete (a killed job leaves no marker and
                             the wave re-runs idempotently on resume)
"""

from __future__ import annotations

import json
import os


def ckpt_dir(out_dir: str, wave: int) -> str:
    return os.path.join(out_dir, "ckpt", "wave=%d" % wave)


def shard_paths(ck: str, num_shards: int):
    return [os.path.join(ck, "seen_shard_%d.bin" % i)
            for i in range(num_shards)]


def write_checkpoint(ck: str, seen, num_shards: int, metrics: dict,
                     snapshot_finish=None) -> None:
    """Snapshot the seen-set shards and the manifest; the _SUCCESS
    marker goes last so partial checkpoints are never trusted.
    ``snapshot_finish`` joins an already-running background snapshot
    (SeenSet.snapshot_background) whose RPCs + file writes overlapped
    earlier driver work; it re-raises any writer failure, so a bad
    snapshot can never gain the marker."""
    os.makedirs(ck, exist_ok=True)
    if snapshot_finish is not None:
        snapshot_finish()
    else:
        seen.snapshot_to(shard_paths(ck, num_shards))
    with open(os.path.join(ck, "manifest.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    with open(os.path.join(ck, "_SUCCESS"), "w") as f:
        f.write("")


def amend_manifest(ck: str, metrics: dict) -> None:
    """Rewrite the manifest (e.g. to add the checkpoint-phase timing,
    which can only be measured after write_checkpoint returns).
    Atomic replace so a crash mid-amend never leaves a corrupt manifest
    behind an existing _SUCCESS marker."""
    tmp = os.path.join(ck, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=1)
    os.replace(tmp, os.path.join(ck, "manifest.json"))


def read_manifest(ck: str) -> dict:
    with open(os.path.join(ck, "manifest.json")) as f:
        return json.load(f)


def last_complete_wave(out_dir: str) -> int:
    """Highest wave index with a _SUCCESS marker; -1 if none."""
    k = -1
    while os.path.exists(os.path.join(ckpt_dir(out_dir, k + 1),
                                      "_SUCCESS")):
        k += 1
    return k
