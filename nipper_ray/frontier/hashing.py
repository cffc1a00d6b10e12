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
