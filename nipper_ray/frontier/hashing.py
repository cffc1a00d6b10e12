"""Pure-Python xxHash64 (public algorithm, xxhash.com spec).

The sandbox has no xxhash wheel; the frontier keys its URL-seen set by
xxh64(canonical_url) with a fixed seed, so the implementation must be
deterministic and stable across processes and resumes (SURVEY.md §7).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

_U64 = struct.Struct("<Q")
_U32 = struct.Struct("<I")


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc, inp):
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc, val):
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n < 32:
        # inlined short-input path (URLs are mostly < 32 bytes; avoiding
        # the _round/_rotl helper calls is a ~3x win on the hot path)
        h = (seed + _P5 + n) & _M
        i = 0
        while i + 8 <= n:
            k = _U64.unpack_from(data, i)[0]
            k = (k * _P2) & _M
            k = ((k << 31) | (k >> 33)) & _M
            h ^= (k * _P1) & _M
            h = (((h << 27) | (h >> 37)) & _M) * _P1 + _P4 & _M
            i += 8
        if i + 4 <= n:
            h ^= (_U32.unpack_from(data, i)[0] * _P1) & _M
            h = (((h << 23) | (h >> 41)) & _M) * _P2 + _P3 & _M
            i += 4
        while i < n:
            h ^= (data[i] * _P5) & _M
            h = (((h << 11) | (h >> 53)) & _M) * _P1 & _M
            i += 1
        h ^= h >> 33
        h = (h * _P2) & _M
        h ^= h >> 29
        h = (h * _P3) & _M
        h ^= h >> 32
        return h
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        i = 0
        limit = n - 32
        while i <= limit:
            v1 = _round(v1, _U64.unpack_from(data, i)[0])
            v2 = _round(v2, _U64.unpack_from(data, i + 8)[0])
            v3 = _round(v3, _U64.unpack_from(data, i + 16)[0])
            v4 = _round(v4, _U64.unpack_from(data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, _U64.unpack_from(data, i)[0])
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (_U32.unpack_from(data, i)[0] * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_str(s: str, seed: int = 0) -> int:
    return xxh64(s.encode("utf-8"), seed)


# ---------------------------------------------------------------------------
# batch (vectorized) xxh64: group inputs by byte length, compute each
# group as numpy uint64 lanes (multiplications wrap mod 2^64 natively).
# 20-50x over the scalar loop for URL-sized inputs; bit-identical to
# xxh64() (differential-tested).
# ---------------------------------------------------------------------------
import numpy as _np

_NP1 = _np.uint64(_P1)
_NP2 = _np.uint64(_P2)
_NP3 = _np.uint64(_P3)
_NP4 = _np.uint64(_P4)
_NP5 = _np.uint64(_P5)


def _rotl_v(x, r):
    r = _np.uint64(r)
    return (x << r) | (x >> (_np.uint64(64) - r))


def _round_v(acc, inp):
    acc = acc + inp * _NP2
    return _rotl_v(acc, 31) * _NP1


def _merge_round_v(h, v):
    h = h ^ _round_v(_np.uint64(0), v)
    return h * _NP1 + _NP4


def _u64_lane(mat, off):
    """(n,8) byte slice -> (n,) little-endian uint64."""
    return _np.ascontiguousarray(mat[:, off:off + 8]).view("<u8").ravel()


def _u32_lane(mat, off):
    return _np.ascontiguousarray(
        mat[:, off:off + 4]).view("<u4").ravel().astype(_np.uint64)


def _xxh64_fixed(mat: "_np.ndarray", seed: int) -> "_np.ndarray":
    """xxh64 of n same-length rows ((n, L) uint8 matrix)."""
    n, L = mat.shape
    sd = _np.uint64(seed)
    i = 0
    if L >= 32:
        v1 = _np.full(n, sd + _NP1 + _NP2, dtype=_np.uint64)
        v2 = _np.full(n, sd + _NP2, dtype=_np.uint64)
        v3 = _np.full(n, sd, dtype=_np.uint64)
        v4 = _np.full(n, sd - _NP1, dtype=_np.uint64)
        while i + 32 <= L:
            v1 = _round_v(v1, _u64_lane(mat, i))
            v2 = _round_v(v2, _u64_lane(mat, i + 8))
            v3 = _round_v(v3, _u64_lane(mat, i + 16))
            v4 = _round_v(v4, _u64_lane(mat, i + 24))
            i += 32
        h = (_rotl_v(v1, 1) + _rotl_v(v2, 7)
             + _rotl_v(v3, 12) + _rotl_v(v4, 18))
        h = _merge_round_v(h, v1)
        h = _merge_round_v(h, v2)
        h = _merge_round_v(h, v3)
        h = _merge_round_v(h, v4)
    else:
        h = _np.full(n, sd + _NP5, dtype=_np.uint64)
    h = h + _np.uint64(L)
    while i + 8 <= L:
        h = h ^ _round_v(_np.uint64(0), _u64_lane(mat, i))
        h = _rotl_v(h, 27) * _NP1 + _NP4
        i += 8
    if i + 4 <= L:
        h = h ^ (_u32_lane(mat, i) * _NP1)
        h = _rotl_v(h, 23) * _NP2 + _NP3
        i += 4
    while i < L:
        h = h ^ (mat[:, i].astype(_np.uint64) * _NP5)
        h = _rotl_v(h, 11) * _NP1
        i += 1
    h = h ^ (h >> _np.uint64(33))
    h = h * _NP2
    h = h ^ (h >> _np.uint64(29))
    h = h * _NP3
    h = h ^ (h >> _np.uint64(32))
    return h


def xxh64_fixed_rows(mat: "_np.ndarray", seed: int = 0) -> "_np.ndarray":
    """Vectorized xxh64 of n same-length byte rows ((n, L) uint8 matrix);
    bit-identical to ``xxh64(row.tobytes(), seed)`` per row."""
    if mat.shape[0] == 0:
        return _np.empty(0, dtype=_np.uint64)
    with _np.errstate(over="ignore"):
        return _xxh64_fixed(_np.ascontiguousarray(mat), seed)


def xxh64_batch(items, seed: int = 0) -> "_np.ndarray":
    """Vectorized xxh64 over a list of str/bytes -> uint64 array."""
    bs = [x.encode("utf-8") if isinstance(x, str) else x for x in items]
    out = _np.empty(len(bs), dtype=_np.uint64)
    by_len = {}
    for idx, b in enumerate(bs):
        by_len.setdefault(len(b), []).append(idx)
    with _np.errstate(over="ignore"):
        for L, idxs in by_len.items():
            if L == 0:
                out[idxs] = xxh64(b"", seed)
                continue
            mat = _np.frombuffer(
                b"".join(bs[i] for i in idxs),
                dtype=_np.uint8).reshape(len(idxs), L)
            out[idxs] = _xxh64_fixed(mat, seed)
    return out
