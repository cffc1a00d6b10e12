"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar
metadata columns; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages. The decode *codecs* are NOT available
in this container (no PIL/ffmpeg), so the codec call is stubbed: with
``fake=True`` (default) a deterministic fake decoder exercises the real
Ray-side plumbing (schema, batch sizing, actor signature, output
layout); with ``fake=False`` the stage raises NotImplementedError at the
clearly-marked codec boundary.

Batch sizes stay small here on purpose: one decoded image row can be
megabytes, so ``batch_size * concurrency`` must fit the worker heap
(see ray_guide: memory-aware sizing for large binary payloads).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("n_bytes", pa.int64()),
])


def media_table_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministically wrap document text bytes as fake media payloads
    (the sandbox has no real media corpus)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    kinds = ["image", "audio", "video"]
    payloads = [(t or "").encode("utf-8") for t in texts]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/x-fake" for _ in ids], pa.string()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)


def _codec_decode(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """== CODEC BOUNDARY ==

    Real implementation would be PIL.Image.open / soundfile / pyav here.
    Neither library ships in this container."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/soundfile/pyav) are not available in this "
            "environment; run with fake=True for plumbing tests")
    # deterministic fake: payload bytes -> fixed-size uint8 'pixels'
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)


class MediaFeatureStage:
    """Actor stage: decode + featurize (mean/std/histogram summary).

    Real models would be loaded once per actor right here in __init__."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        means, stds, feats = [], [], []
        for kind, payload in zip(kinds, payloads):
            arr = _codec_decode(payload or b"", kind, self.fake)
            means.append(float(arr.mean()) if len(arr) else 0.0)
            stds.append(float(arr.std()) if len(arr) else 0.0)
            feats.append(arr[:16].tolist())
        out = pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
            "feat_mean": pa.array(means, pa.float64()),
            "feat_std": pa.array(stds, pa.float64()),
            "features": pa.array(feats, pa.list_(pa.float32(), 16)),
        })
        return out


class FrameSampleStage:
    """Actor stage: deterministic frame sampling for 'video' payloads —
    emits one row per sampled frame (flat_map-shaped output)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, kind, payload in zip(batch.column("media_id").to_pylist(),
                                      batch.column("kind").to_pylist(),
                                      batch.column("payload").to_pylist()):
            if kind != "video":
                continue
            payload = payload or b""
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                chunk = payload[f * step:(f + 1) * step]
                arr = _codec_decode(chunk, "image", self.fake)
                ids.append(mid)
                fidx.append(f)
                frames.append(arr[:8].tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_feat": pa.array(frames, pa.list_(pa.float32(), 8)),
        })
