"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (the 100 TB shapes):

- exact dedup = one content-hash ``map_batches`` (cheap, vectorized)
  followed by ONE ``groupby(hash)`` shuffle keeping the min doc_id per
  group — the only all-to-all exchange;
- MinHash: signatures are computed batch-local (shingle -> 64-bit hash
  -> per-permutation min, numpy); LSH banding explodes each doc into
  ``n_bands`` small (band_id, band_key, doc_id) rows, and the candidate
  groupby shuffles only those narrow rows, never the documents;
- candidate pairs are verified with true n-gram Jaccard only within
  buckets (pair count is bucket-bounded), then clustered by min-label
  union-find on the (small) pair list;
- SimHash gives a 64-bit near-dup key; bucketing by 16-bit bands of the
  simhash finds hamming-close candidates the same way.

All RNG-free: hash seeds are fixed constants.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")

# fixed odd multipliers for the k minhash "permutations": multiply-shift
# hashing h_j(x) = (a_j * (x XOR b_j)) mod 2^64 — numpy uint64 arithmetic
# wraps mod 2^64 natively, and odd multipliers make each map a bijection
# of the 64-bit space (well-mixed, unlike a near-monotonic a*x+b mod p)
_N_PERM = 64
_AS = np.array([((2 * i + 1) * 0x9E3779B97F4A7C15 | 1) & 0xFFFFFFFFFFFFFFFF
                for i in range(1, _N_PERM + 1)], dtype=np.uint64)
_BS = np.array([((i * i + 7) * 0xC2B2AE3D27D4EB4F) & 0xFFFFFFFFFFFFFFFF
                for i in range(1, _N_PERM + 1)], dtype=np.uint64)


def _shingle_hashes(text: str, n: int = 5) -> np.ndarray:
    """Word n-gram shingles -> stable 64-bit hashes."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < n:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + n])
                    for i in range(len(words) - n + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
    return out


def minhash_signature(text: str, n: int = 5) -> np.ndarray:
    return minhash_signatures_batch([text], n)[0]


def minhash_signatures_batch(texts, n: int = 5) -> np.ndarray:
    """Vectorized minhash for a batch: one (n_docs, N_PERM) matrix."""
    sigs = np.empty((len(texts), _N_PERM), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t, n)
            m = (sh[:, None] ^ _BS[None, :]) * _AS[None, :]  # wraps mod 2^64
            sigs[i] = m.min(axis=0)
    return sigs


def minhash_stage(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 5) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    sigs = minhash_signatures_batch(texts, n)
    return pa.table({
        id_col: batch.column(id_col),
        "minhash": pa.array(list(sigs), pa.list_(pa.uint64(), _N_PERM)),
    })


def lsh_bands_stage(batch: pa.Table, n_bands: int = 16,
                    id_col: str = "doc_id") -> pa.Table:
    """Explode signatures into (band_id, band_key, doc_id) rows."""
    rows_per = _N_PERM // n_bands
    ids = batch.column(id_col).to_pylist()
    sigs = batch.column("minhash").to_pylist()
    b_ids, b_keys, d_ids = [], [], []
    for did, sig in zip(ids, sigs):
        for b in range(n_bands):
            chunk = sig[b * rows_per:(b + 1) * rows_per]
            key = hashlib.blake2b(
                np.array(chunk, dtype=np.uint64).tobytes(),
                digest_size=8).hexdigest()
            b_ids.append(b)
            b_keys.append(key)
            d_ids.append(did)
    return pa.table({
        "band_id": pa.array(b_ids, pa.int32()),
        "band_key": pa.array(b_keys, pa.string()),
        id_col: pa.array(d_ids, pa.int64()),
    })


def candidate_pairs_from_band(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn over (band_id, band_key): emit unique id pairs."""
    ids = sorted(g["doc_id"].tolist())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []})
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


def ngram_jaccard(t1: str, t2: str, n: int = 5) -> float:
    s1 = set(_shingle_hashes(t1, n).tolist())
    s2 = set(_shingle_hashes(t2, n).tolist())
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter)


# -- simhash ----------------------------------------------------------------
def simhash64(text: str) -> int:
    words = _WORD_RE.findall((text or "").lower())
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        bits = np.unpackbits(
            np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8))
        acc += bits.astype(np.int64) * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= (1 << i)
    return out


def simhash_stage(batch: pa.Table, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hs = [simhash64(t) for t in texts]
    return pa.table({
        id_col: batch.column(id_col),
        "simhash": pa.array(hs, pa.uint64()),
    })


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# -- embedding near-dup ------------------------------------------------------
def embedding_neardup_pairs(emb_table: pa.Table, threshold: float = 0.95,
                            id_col: str = "vec_id") -> pa.Table:
    """Batch-local all-pairs cosine (numpy matmul); used per LSH bucket
    or per block at scale, full-batch in tests."""
    ids = np.asarray(emb_table.column(id_col).to_pylist())
    m = np.array(emb_table.column("embedding").to_pylist(),
                 dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    sims = mn @ mn.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    return pa.table({
        "a": pa.array(ids[iu[0][mask]], pa.int64()),
        "b": pa.array(ids[iu[1][mask]], pa.int64()),
        "cosine": pa.array(np.round(sims[iu][mask], 6), pa.float64()),
    })


# -- clustering (driver-side, provably small pair lists) --------------------
def union_find_clusters(pairs) -> dict:
    """Min-label union-find over candidate pairs; returns id->root."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}
