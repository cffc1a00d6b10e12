"""Distributed connected components over a pair list — the clustering
tail of near-dup deduplication at scale.

Round 1 clustered candidate pairs driver-side (ops/dedup.py
union_find_clusters), which is fine while pair lists are provably
small; a 100 TB near-dup run can emit billions of pairs, so this is
the Dataset-native alternative: min-label propagation.

    edges   = pairs symmetrized + self-loops          (map_batches)
    labels0 = min neighbor per node                   (groupby min)
    iterate: push each node's label to its neighbors  (hash join)
             take the min per node                    (groupby min)
    until the label sum stops decreasing (labels are per-node
    monotone non-increasing, so an unchanged integer sum certifies a
    fixpoint) — converges in <= graph-diameter iterations.

Each iteration is one hash join + one groupby over (node, label)
rows only (16 B/node) — never the documents.  The per-iteration
``materialize()`` pins the small label table so the lazy plan doesn't
re-execute the whole chain every round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sym_edges(t: pa.Table) -> pa.Table:
    """(a, b) pairs -> symmetric edges + self-loops for both ends."""
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    u = np.concatenate([a, b, a, b])
    v = np.concatenate([b, a, a, b])  # self-loops keep isolated ends
    return pa.table({"u": pa.array(u, pa.int64()),
                     "v": pa.array(v, pa.int64())})


def connected_components(pairs_ds, max_iters: int = 25,
                         num_partitions: int = 4):
    """Dataset[(a, b)] -> Dataset[(doc_id, cluster_id)] where
    cluster_id is the minimum doc id of the connected component.
    Deterministic; every endpoint of every pair appears exactly once."""
    from ray.data.aggregate import Min, Sum

    from .join import hash_join

    edges = pairs_ds.map_batches(_sym_edges,
                                 batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return edges.map_batches(
            lambda t: pa.table({"doc_id": pa.array([], pa.int64()),
                                "cluster_id": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    labels = edges.groupby("u").aggregate(
        Min("v", alias_name="label")).materialize()

    def label_sum(lab) -> int:
        row = lab.aggregate(Sum("label", alias_name="s"))
        return int(row["s"])

    prev = label_sum(labels)
    for _ in range(max_iters):
        # neighbor label pull: edge (u, v) picks up label(v), then the
        # min over {label(v) for v in N(u)} (self-loop covers label(u))
        j = hash_join(edges, labels, on=("v",), right_on=("u",),
                      num_partitions=num_partitions)
        labels = j.groupby("u").aggregate(
            Min("label", alias_name="label")).materialize()
        cur = label_sum(labels)
        if cur == prev:  # labels are monotone non-increasing per node
            break
        prev = cur
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t.column("u"),
                            "cluster_id": t.column("label")}),
        batch_format="pyarrow")
