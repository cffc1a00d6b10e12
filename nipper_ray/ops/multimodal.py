"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with sidecar
metadata columns; decode / feature-extract / frame-sample are
actor-pool ``map_batches`` stages.

The codec boundary is REAL for three public formats implemented from
scratch in ``ops/codecs.py`` (no PIL/ffmpeg in this container):
24-bit BMP images, 16-bit PCM WAV audio, and YUV4MPEG2 (Y4M)
uncompressed video.  ``media_table_from_documents`` synthesizes
genuine encoded payloads deterministically from document text (so
features are SQL-derivable for the oracle); ``MediaFeatureStage``
decodes them with the real parsers.  Formats this sandbox genuinely
cannot decode (JPEG/PNG/MP3/H.264...) still raise NotImplementedError
at the clearly-marked boundary.  ``fake=True`` keeps the legacy
deterministic fake decoder (payload-hash features) for plumbing tests
that need format-independent behavior.

Batch sizes stay small here on purpose: one decoded image row can be
megabytes, so ``batch_size * concurrency`` must fit the worker heap
(see ray_guide: memory-aware sizing for large binary payloads).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from .codecs import (decode_bmp, decode_wav, decode_y4m, encode_bmp,
                     encode_wav, encode_y4m)

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("mime", pa.string()),
    ("n_bytes", pa.int64()),
])

_MIMES = {"image": "image/bmp", "audio": "audio/x-wav",
          "video": "video/x-yuv4mpeg"}
_IMG_W = _IMG_H = 8          # 8x8 RGB BMP
_N_SAMPLES = 64              # WAV sample count
_N_FRAMES = 4                # Y4M frames


def _text_bytes(text: str) -> np.ndarray:
    b = np.frombuffer((text or " ").encode("utf-8"), dtype=np.uint8)
    return b if len(b) else np.array([32], dtype=np.uint8)


def media_table_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministically synthesize REAL encoded media payloads from
    document text (the sandbox has no media corpus): doc byte stream ->
    BMP pixels / WAV samples / Y4M luma planes, cycled.  Pure function
    of ``documents`` => the decoded features are SQL-derivable."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    kinds, payloads = [], []
    for did, text in zip(ids, texts):
        b = _text_bytes(text)
        kind = ("image", "audio", "video")[did % 3]
        kinds.append(kind)
        if kind == "image":
            idx = np.arange(_IMG_W * _IMG_H) % len(b)
            grey = b[idx].reshape(_IMG_H, _IMG_W)
            payloads.append(encode_bmp(
                np.repeat(grey[:, :, None], 3, axis=2)))
        elif kind == "audio":
            idx = np.arange(_N_SAMPLES) % len(b)
            samples = (b[idx].astype(np.int16) - 128) * 256
            payloads.append(encode_wav(samples, rate=8000))
        else:
            frames = []
            for f in range(_N_FRAMES):
                idx = (np.arange(_IMG_W * _IMG_H) + 7 * f) % len(b)
                frames.append(b[idx].reshape(_IMG_H, _IMG_W))
            payloads.append(encode_y4m(frames, _IMG_W, _IMG_H))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array([_MIMES[k] for k in kinds], pa.string()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    }, schema=MEDIA_SCHEMA)


def _codec_decode(payload: bytes, kind: str, fake: bool) -> np.ndarray:
    """== CODEC BOUNDARY ==

    Real path: sniff the container magic and parse with the
    from-scratch public-format codecs (ops/codecs.py).  Anything else
    (JPEG/PNG/MP3/...) genuinely has no decoder in this container and
    raises.  ``fake=True``: legacy deterministic payload-hash decoder
    (format-independent plumbing tests)."""
    if fake:
        digest = hashlib.blake2b(payload, digest_size=32).digest()
        return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    if payload[:2] == b"BM":
        return decode_bmp(payload).astype(np.int64).ravel()
    if payload[:4] == b"RIFF":
        samples, _rate = decode_wav(payload)
        return samples.astype(np.int64)
    if payload[:9] == b"YUV4MPEG2":
        frames, _w, _h = decode_y4m(payload)
        return np.concatenate([f.ravel() for f in frames]).astype(np.int64)
    raise NotImplementedError(
        "no decoder for this payload format in this environment "
        "(only BMP / WAV-PCM / Y4M are implemented from scratch; "
        "JPEG/PNG/MP3/H.264 would need PIL/soundfile/pyav)")


def _int_features(v: np.ndarray):
    """Exact integer-space mean/std (ppm) — identical on the SQL oracle
    side: ppm-mean is integer floor division, ppm-std floors the same
    IEEE double both engines compute from exact integer sums."""
    n = len(v)
    s1 = int(v.sum())
    s2 = int((v.astype(np.int64) ** 2).sum())
    mean_ppm = (s1 * 1_000_000) // n
    var = (n * s2 - s1 * s1) / (n * n)
    std_ppm = int(math.floor(math.sqrt(var) * 1_000_000))
    return mean_ppm, std_ppm


class MediaFeatureStage:
    """Actor stage: decode + featurize.

    Real models would be loaded once per actor right here in
    __init__.  With ``fake=False`` (default) payloads are decoded by
    the real BMP/WAV/Y4M parsers and features are exact integer-space
    statistics over the decoded values (pixels / PCM samples / luma)."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        means, stds, feats = [], [], []
        for kind, payload in zip(kinds, payloads):
            arr = _codec_decode(payload or b"", kind, self.fake)
            if self.fake:
                means.append(float(arr.mean()) if len(arr) else 0.0)
                stds.append(float(arr.std()) if len(arr) else 0.0)
            else:
                mean_ppm, std_ppm = _int_features(arr)
                means.append(mean_ppm)
                stds.append(std_ppm)
            feats.append(arr[:16].astype(np.float32).tolist())
        fm = (pa.array(means, pa.float64()) if self.fake
              else pa.array(means, pa.int64()))
        fs = (pa.array(stds, pa.float64()) if self.fake
              else pa.array(stds, pa.int64()))
        name_m = "feat_mean" if self.fake else "feat_mean_ppm"
        name_s = "feat_std" if self.fake else "feat_std_ppm"
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
            name_m: fm,
            name_s: fs,
            "features": pa.array(feats, pa.list_(pa.float32(), 16)),
        })


class FrameSampleStage:
    """Actor stage: deterministic frame sampling for 'video' payloads —
    emits one row per sampled frame (flat_map-shaped output).  Real
    path decodes the Y4M stream and samples evenly-spaced frames."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
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
            if self.fake:
                step = max(1, len(payload) // self.n_frames)
                for f in range(self.n_frames):
                    chunk = payload[f * step:(f + 1) * step]
                    arr = _codec_decode(chunk, "image", True)
                    ids.append(mid)
                    fidx.append(f)
                    frames.append(arr[:8].tolist())
            else:
                avail, _w, _h = decode_y4m(payload)
                k = min(self.n_frames, len(avail))
                for f in range(k):
                    # evenly spaced deterministic sample
                    src = (f * len(avail)) // k
                    ids.append(mid)
                    fidx.append(f)
                    frames.append(
                        avail[src].ravel()[:8].astype(np.float32).tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame_feat": pa.array(frames, pa.list_(pa.float32(), 8)),
        })
