"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the baseline. Query matrix is broadcast once
  (``ray.put``), each ``map_batches`` task does one float64 matmul of
  its batch against the queries and emits only its local top-k rows;
  the driver reduces the tiny per-block top-k lists. Nothing but
  (query_id, neighbor_id, sim) rows ever leave a task.
- LSH-bucketed variant (the scale path): random-hyperplane signatures
  (fixed seed) bucket the corpus; candidates are only scored within the
  query's bucket probes, turning the scan into a groupby over narrow
  rows. Recall is approximate by construction.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embedding_matrix(col) -> np.ndarray:
    """list<float> Arrow column -> (n, d) float64 matrix.

    Zero-copy flatten+reshape when the lists are equal-length and
    null-free (the normal embeddings layout); falls back to to_pylist
    for ragged input."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if col.null_count == 0 and (lens == lens[0]).all():
        vals = col.flatten().to_numpy(zero_copy_only=False)
        return vals.reshape(n, int(lens[0])).astype(np.float64,
                                                    copy=False)
    return np.array(col.to_pylist(), dtype=np.float64)


class BruteForceTopKStage:
    """map_batches actor stage: local top-k per query against one batch."""

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id"):
        import ray

        q = ray.get(queries_ref)  # once per actor (broadcast)
        self.q_ids = q["ids"]
        self.q_mat = _normalize(np.asarray(q["vectors"], dtype=np.float64))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _normalize(embedding_matrix(batch.column("embedding")))
        sims = self.q_mat @ m.T  # (n_queries, batch)
        k = min(self.k, sims.shape[1])
        # block-local selection must use the FINAL ranking order
        # (round(sim, 6) desc, neighbor_id asc), or a tie at the k
        # boundary can drop the candidate the global reduce would rank
        rsims = np.round(sims, 6)
        q_out, n_out, s_out = [], [], []
        for qi in range(sims.shape[0]):
            order = np.lexsort((ids, -rsims[qi]))[:k]
            for j in order:
                q_out.append(int(self.q_ids[qi]))
                n_out.append(int(ids[j]))
                s_out.append(float(rsims[qi, j]))
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "neighbor_id": pa.array(n_out, pa.int64()),
            "sim": pa.array(s_out, pa.float64()),
        })


def topk_reduce(rows, k: int):
    """Driver-side reduce of per-block candidates -> exact global top-k.

    Deterministic order: sim desc (rounded to 1e-6), neighbor_id asc."""
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (-round(r["sim"], 6), r["neighbor_id"]))
    out = {"query_id": [], "neighbor_id": [], "rank": []}
    for q in sorted(by_q):
        best = heapq.nsmallest(k, by_q[q])
        for rank, (_negsim, nid) in enumerate(best, 1):
            out["query_id"].append(q)
            out["neighbor_id"].append(nid)
            out["rank"].append(rank)
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
    })


def _score_stage(ds, queries_ref, k, concurrency, use_actors):
    """BruteForceTopKStage as stateless pickled instance (default —
    contention-free at low CPU counts, cached per worker) or as an
    actor pool (long-running-cluster shape)."""
    if use_actors:
        return ds.map_batches(
            BruteForceTopKStage, batch_format="pyarrow",
            batch_size=1024,
            fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
            concurrency=concurrency)
    return ds.map_batches(BruteForceTopKStage(queries_ref, k=k),
                          batch_format="pyarrow", batch_size=1024)


def brute_force_topk(ds, queries_ref, k: int = 10, concurrency=2,
                     use_actors: bool = False):
    """Full pipeline: Dataset[embeddings] -> exact top-k neighbor table."""
    cand = _score_stage(ds, queries_ref, k, concurrency, use_actors)
    return topk_reduce(cand.take_all(), k)


# -- LSH-bucketed ANN (scale path) -----------------------------------------
_N_PLANES = 16


def _planes(dim: int) -> np.ndarray:
    # fixed-seed random hyperplanes: deterministic across workers
    rng = np.random.RandomState(0xC0FFEE)
    return rng.standard_normal((_N_PLANES, dim))


class LshBucketStage:
    """Adds a 16-bit random-hyperplane bucket key per row."""

    def __init__(self, dim: int):
        self.planes = _planes(dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch.column("embedding"))
        bits = (m @ self.planes.T) > 0
        keys = np.zeros(len(m), dtype=np.int64)
        for b in range(_N_PLANES):
            keys |= bits[:, b].astype(np.int64) << b
        return batch.append_column("lsh_bucket",
                                   pa.array(keys, pa.int64()))


def _kmeans_cosine(sample: np.ndarray, k: int, iters: int = 10):
    """Deterministic spherical k-means: first-k rows init (no RNG),
    fixed Lloyd iterations, cosine assignment on normalized vectors."""
    sample = _normalize(sample.astype(np.float64))
    cent = sample[:k].copy()
    for _ in range(iters):
        assign = (sample @ cent.T).argmax(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def _hash_spread_sample(ds, sample_size: int,
                        id_col: str = "vec_id") -> np.ndarray:
    """Deterministic hash-spread codebook sample: the ``sample_size``
    rows with the globally smallest ``xxh64(id)``.  Uniform over the
    whole corpus regardless of file/block order — a head ``limit()``
    sample would be biased to whatever the first files contain.  The
    driver only ever holds the ~4x-oversampled survivor set."""
    from ..frontier.hashing import xxh64_fixed_rows

    n = ds.count()
    m = np.uint64(max(1, n // (4 * sample_size)))

    def pick(t: pa.Table) -> pa.Table:
        ids = (t.column(id_col).to_numpy(zero_copy_only=False)
               .astype(np.int64))
        h = xxh64_fixed_rows(
            np.ascontiguousarray(ids).view(np.uint8).reshape(len(ids), 8))
        mask = (h % m) == 0
        sub = t.filter(pa.array(mask))
        return pa.table({"_h": pa.array(h[mask], pa.uint64()),
                         "embedding": sub.column("embedding")})

    cand = ds.map_batches(pick, batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r["_h"])
    return np.array([r["embedding"] for r in cand[:sample_size]],
                    dtype=np.float64)


class IvfAssignStage:
    """Adds the nearest-centroid cell id per row (broadcast centroids
    ride in the pickled stage; one matmul per batch)."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(embedding_matrix(batch.column("embedding")))
        cell = (m @ self.centroids.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_cell", pa.array(cell, pa.int32()))


def ivf_topk(ds, queries_ref, k: int = 10, n_cells: int = 16,
             nprobe: int = 4, sample_size: int = 2048, concurrency=2,
             use_actors: bool = False):
    """IVF approximate top-k — the coarse-quantizer scale path: a
    deterministic k-means codebook from a bounded hash-spread sample
    (driver holds ~4x sample_size vectors, never the table), cell
    assignment as a map stage, and scoring only rows whose cell is
    among each query's ``nprobe`` nearest centroids.

    At 100 TB the assignment is a one-pass map (centroids broadcast),
    and the probe filter cuts the scored fraction to ~nprobe/n_cells;
    the per-block top-k + tiny driver reduce are shared with the
    brute-force path."""
    import ray

    s_mat = _hash_spread_sample(ds, sample_size)
    cent = _kmeans_cosine(s_mat, n_cells)

    q = ray.get(queries_ref)
    q_mat = _normalize(np.asarray(q["vectors"], dtype=np.float64))
    probes_per_q = np.argsort(-(q_mat @ cent.T), axis=1)[:, :nprobe]
    wanted = pa.array(sorted({int(c) for row in probes_per_q
                              for c in row}), pa.int32())

    assigned = ds.map_batches(IvfAssignStage(cent),
                              batch_format="pyarrow")
    filtered = assigned.map_batches(
        lambda t: t.filter(pa.compute.is_in(t.column("ivf_cell"),
                                            value_set=wanted)),
        batch_format="pyarrow")
    cand = _score_stage(filtered, queries_ref, k, concurrency,
                        use_actors)
    return topk_reduce(cand.take_all(), k)


def lsh_topk(ds, queries_ref, k: int = 10, probes: int = 2,
             dim: int = 64, concurrency=2, use_actors: bool = False):
    """Approximate top-k: score only rows in the query's bucket (plus
    nearest hamming-1 probe buckets)."""
    import ray

    q = ray.get(queries_ref)
    q_mat = np.asarray(q["vectors"], dtype=np.float64)
    planes = _planes(dim)
    proj = q_mat @ planes.T
    q_bits = proj > 0
    # margin-ordered multi-probe: flip the LEAST-confident bits (the
    # hyperplanes the query is closest to) — a boundary-straddling
    # near-dup differs from the query's bucket in exactly those bits
    probe_order = np.argsort(np.abs(proj), axis=1)
    wanted = set()
    for qi, row in enumerate(q_bits):
        key = 0
        for b in range(_N_PLANES):
            key |= int(row[b]) << b
        wanted.add(key)
        flips = probe_order[qi, :min(probes, _N_PLANES)]
        for flip in flips:
            wanted.add(key ^ (1 << int(flip)))
        # 2-bit probes over the two least-confident planes
        if len(flips) >= 2:
            wanted.add(key ^ (1 << int(flips[0])) ^ (1 << int(flips[1])))
    if use_actors:
        bucketed = ds.map_batches(
            LshBucketStage, batch_format="pyarrow",
            fn_constructor_kwargs={"dim": dim}, concurrency=concurrency)
    else:
        bucketed = ds.map_batches(LshBucketStage(dim),
                                  batch_format="pyarrow")
    wanted_arr = pa.array(sorted(wanted), pa.int64())
    filtered = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t.column("lsh_bucket"),
                             value_set=wanted_arr)),
        batch_format="pyarrow")
    cand = _score_stage(filtered, queries_ref, k, concurrency,
                        use_actors)
    return topk_reduce(cand.take_all(), k)
