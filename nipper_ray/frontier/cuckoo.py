"""Deterministic cuckoo filter for the sharded URL-seen set.

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014 — public algorithm):
16-bit fingerprints, 4 slots per bucket, alternate bucket via
fp-hash XOR. Everything is deterministic (fixed seeds, counter-based
eviction choice, no RNG), so snapshot/restore across a resume is
byte-exact and inserts are idempotent under Ray task retries
(probe-then-insert; SURVEY.md §4.2).

An overflow set keeps correctness (no false negatives) if an insert
fails after MAX_KICKS evictions.
"""

from __future__ import annotations

import numpy as np

from .hashing import xxh64

SLOTS = 4
MAX_KICKS = 500
_FP_SEED = 0x9E3779B1

# fp (16-bit) -> xxh64(fp_bytes) XOR component for the alternate bucket,
# precomputed once so batch probes are pure numpy
_ALT_XOR = None


def _alt_xor_table() -> np.ndarray:
    global _ALT_XOR
    if _ALT_XOR is None:
        _ALT_XOR = np.fromiter(
            (xxh64(int(fp).to_bytes(2, "little"), _FP_SEED)
             for fp in range(1 << 16)),
            dtype=np.uint64, count=1 << 16)
    return _ALT_XOR


class CuckooFilter:
    def __init__(self, capacity: int):
        # power-of-two bucket count sized for ~95% occupancy headroom
        need = max(16, int(capacity / (SLOTS * 0.95)))
        b = 1
        while b < need:
            b <<= 1
        self.n_buckets = b
        self.mask = b - 1
        self.table = np.zeros((b, SLOTS), dtype=np.uint16)
        self.count = 0
        self.overflow = set()

    # -- key derivation -------------------------------------------------
    def _fp_and_index(self, h: int):
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        i1 = h & self.mask
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        return (i ^ (xxh64(fp.to_bytes(2, "little"), _FP_SEED))) & self.mask

    # -- ops ------------------------------------------------------------
    def contains_hash(self, h: int) -> bool:
        fp, i1 = self._fp_and_index(h)
        row = self.table[i1]
        if fp in row:
            return True
        i2 = self._alt_index(i1, fp)
        if fp in self.table[i2]:
            return True
        return h in self.overflow

    def add_hash(self, h: int) -> bool:
        """Insert; returns True if the hash was new (probe-then-insert,
        idempotent)."""
        if self.contains_hash(h):
            return False
        self._insert_new(h)
        return True

    def _insert_new(self, h: int) -> None:
        """Insert a hash already known (or assumed) absent."""
        fp, i1 = self._fp_and_index(h)
        if self._try_put(i1, fp):
            self.count += 1
            return True
        i2 = self._alt_index(i1, fp)
        if self._try_put(i2, fp):
            self.count += 1
            return True
        # evict: deterministic slot choice from the running count
        i = i2 if (self.count & 1) else i1
        cur_fp = fp
        chain = []  # (bucket, slot, displaced_fp) for rollback
        for kick in range(MAX_KICKS):
            slot = (self.count + kick) % SLOTS
            victim = int(self.table[i][slot])
            chain.append((i, slot, cur_fp))
            self.table[i][slot] = cur_fp
            cur_fp = victim
            i = self._alt_index(i, cur_fp)
            if self._try_put(i, cur_fp):
                self.count += 1
                return True
        # table saturated: roll the chain back so no victim is lost,
        # then keep the new hash exactly in the overflow set
        for bucket, slot, placed in reversed(chain):
            cur_fp, self.table[bucket][slot] = (
                int(self.table[bucket][slot]), cur_fp)
        self.overflow.add(h)
        self.count += 1
        return True

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        for s in range(SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def check_and_add_many(self, hashes) -> np.ndarray:
        """Batch probe+insert; returns a bool mask of which hashes were
        new (first occurrence wins within the batch).

        The probe — the common case at steady state, where most URLs
        are duplicates — is fully vectorized: fingerprints, both bucket
        indices (via the precomputed fp->alt-xor table) and slot
        membership are numpy ops. Only hashes that probe as *new* go
        through the scalar insert path, which re-checks (so duplicates
        within the batch resolve correctly)."""
        h = np.asarray(hashes, dtype=np.uint64)
        n = len(h)
        if n == 0:
            return np.zeros(0, dtype=bool)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mask64 = np.uint64(self.mask)
        i1 = (h & mask64).astype(np.int64)
        alt = _alt_xor_table()[fp.astype(np.int64)]
        i2 = ((i1.astype(np.uint64) ^ alt) & mask64).astype(np.int64)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.overflow:
            ov = self.overflow
            for idx in np.nonzero(~hit)[0]:
                if int(h[idx]) in ov:
                    hit[idx] = True
        out = np.zeros(n, dtype=bool)
        inserted = set()  # batch-local: duplicates within the batch
        for idx in np.nonzero(~hit)[0]:
            hv = int(h[idx])
            if hv in inserted:
                continue
            inserted.add(hv)
            self._insert_new(hv)
            out[idx] = True
        return out

    def contains_many(self, hashes) -> np.ndarray:
        """Vectorized membership probe (no insert) — same fingerprint /
        bucket math as check_and_add_many."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mask64 = np.uint64(self.mask)
        i1 = (h & mask64).astype(np.int64)
        alt = _alt_xor_table()[fp.astype(np.int64)]
        i2 = ((i1.astype(np.uint64) ^ alt) & mask64).astype(np.int64)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.overflow:
            ov = self.overflow
            for idx in np.nonzero(~hit)[0]:
                if int(h[idx]) in ov:
                    hit[idx] = True
        return hit

    def __len__(self):
        return self.count

    # -- snapshot / restore (byte-exact; resume support) -----------------
    def snapshot(self) -> bytes:
        ov = np.fromiter(sorted(self.overflow), dtype=np.uint64,
                         count=len(self.overflow))
        header = np.array([self.n_buckets, self.count, len(ov)],
                          dtype=np.uint64).tobytes()
        return header + self.table.tobytes() + ov.tobytes()

    @classmethod
    def restore(cls, blob: bytes) -> "CuckooFilter":
        hdr = np.frombuffer(blob[:24], dtype=np.uint64)
        n_buckets, count, n_ov = int(hdr[0]), int(hdr[1]), int(hdr[2])
        self = cls.__new__(cls)
        self.n_buckets = n_buckets
        self.mask = n_buckets - 1
        tb_end = 24 + n_buckets * SLOTS * 2
        self.table = np.frombuffer(
            blob[24:tb_end], dtype=np.uint16).reshape(n_buckets, SLOTS).copy()
        self.count = count
        self.overflow = set(
            int(x) for x in np.frombuffer(blob[tb_end:], dtype=np.uint64))
        return self
