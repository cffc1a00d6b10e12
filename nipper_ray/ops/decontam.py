"""Benchmark decontamination: flag corpus documents whose word-n-gram
overlap with a reference ("benchmark") document set exceeds a
threshold — the standard pre-training hygiene pass that keeps eval
data out of the training corpus.

Scale shape: the benchmark side is small BY NATURE (eval suites are
thousands of documents, not billions), so its distinct shingle-hash
union is collected once and broadcast into the scoring stage; the
corpus side is a single embarrassingly-parallel ``map_batches`` pass —
no shuffle at all.  Membership tests are one ``np.searchsorted``
against the sorted benchmark array per batch; per-doc overlap counts
are one ``np.add.reduceat``.  Shingle construction (ASCII-folded word
3-grams, distinct, docs under n words dropped) is shared with the
minhash pipeline so the SQL oracle mirrors it exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import shingle_hashes_batch


def benchmark_shingle_hashes(ds, text_col: str = "text",
                             n: int = 3) -> np.ndarray:
    """Distinct shingle-hash union of the benchmark Dataset, as a
    sorted uint64 array (driver-held: benchmark sets are small)."""
    def stage(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        h, _ = shingle_hashes_batch(texts, n)
        return pa.table({"h": pa.array(np.unique(h), pa.uint64())})

    rows = ds.map_batches(stage, batch_format="pyarrow").take_all()
    if not rows:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array([r["h"] for r in rows], dtype=np.uint64))


class DecontamStage:
    """map_batches stage: per-doc distinct-shingle overlap against the
    broadcast benchmark hash set.  Emits (doc_id, n_shingles,
    n_overlap, overlap_ppm, contaminated); docs with fewer than n
    words are dropped (no shingles — mirrors the oracle filter)."""

    def __init__(self, bench_hashes: np.ndarray, n: int = 3,
                 threshold_ppm: int = 100_000,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.bench = np.asarray(bench_hashes, dtype=np.uint64)
        self.n = n
        self.threshold_ppm = threshold_ppm
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        all_h, off = shingle_hashes_batch(texts, self.n)
        uniq_parts = []
        uoff = [0]
        keep = []
        for i in range(len(texts)):
            seg = all_h[off[i]:off[i + 1]]
            if len(seg) == 0:
                continue
            u = np.unique(seg)
            uniq_parts.append(u)
            uoff.append(uoff[-1] + len(u))
            keep.append(i)
        if not keep:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_shingles": pa.array([], pa.int64()),
                "n_overlap": pa.array([], pa.int64()),
                "overlap_ppm": pa.array([], pa.int64()),
                "contaminated": pa.array([], pa.bool_())})
        cat = np.concatenate(uniq_parts)
        if len(self.bench):
            pos = np.searchsorted(self.bench, cat)
            pos = np.minimum(pos, len(self.bench) - 1)
            member = self.bench[pos] == cat
        else:
            member = np.zeros(len(cat), dtype=bool)
        starts = np.asarray(uoff[:-1], dtype=np.int64)
        n_ov = np.add.reduceat(member.astype(np.int64), starts)
        sizes = np.diff(np.asarray(uoff, dtype=np.int64))
        ppm = n_ov * 1_000_000 // sizes
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_shingles": pa.array(sizes, pa.int64()),
            "n_overlap": pa.array(n_ov, pa.int64()),
            "overlap_ppm": pa.array(ppm, pa.int64()),
            "contaminated": pa.array(ppm >= self.threshold_ppm,
                                     pa.bool_())})


def decontaminate(corpus_ds, bench_ds, n: int = 3,
                  threshold_ppm: int = 100_000,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Full pass: benchmark union (small, driver-held broadcast) then
    one shuffle-free scoring map over the corpus."""
    bench = benchmark_shingle_hashes(bench_ds, text_col, n)
    return corpus_ds.map_batches(
        DecontamStage(bench, n, threshold_ppm, id_col, text_col),
        batch_format="pyarrow", batch_size=256)
