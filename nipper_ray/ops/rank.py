"""Distributed link-graph PageRank in EXACT integer arithmetic — the
crawl-frontier prioritization component (authority-weighted fetch
ordering) as an iterative Ray Data pipeline.

Scale shape: each iteration is ONE hash join (ranks -> edges on src)
plus ONE groupby(dst) sum — the same narrow-row iterate-until-done
pattern as ops/cc.py connected components; T iterations = 2T shuffles
over (node, int64) rows, never the pages.  Out-degrees ride on the
edge rows (computed in-batch at edge build, no extra shuffle).

Exactness discipline: ranks live in integer units of RANK_SCALE
(1e12); every update is floor arithmetic::

    r'(v) = (15 * (S // N)) // 100  +  (85 * sum_{u->v} r(u) // out(u)) // 100

so any engine (the DuckDB oracle unrolls the same T iterations as
chained CTEs) computes bit-identical ranks — no float-sum-order
hazards.  The deliberate floor "leakage" is identical on both sides.
Requires every node to have outdeg >= 1 (the synthetic ring link
guarantees it; real crawl graphs add dangling-node handling first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

RANK_SCALE = 1_000_000_000_000


def edges_from_docs_stage(batch: pa.Table, n_docs: int) -> pa.Table:
    """Deterministic outlink edges for a batch of documents (mirrors
    sources/synth.outlink_ids): per-src DISTINCT targets with the
    src's out-degree attached — all in-batch, no shuffle."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src_out, dst_out, deg_out = [], [], []
    k = 8  # sources/synth.LINKS_PER_PAGE
    i = np.arange(k, dtype=np.int64)
    for d in ids:
        tg = np.concatenate((
            (d * 7919 + i * 104729 + i * i) % n_docs,
            [(d + 1) % n_docs, (d * 7919) % n_docs]))
        tg = np.unique(tg)
        src_out.append(np.full(len(tg), d, dtype=np.int64))
        dst_out.append(tg)
        deg_out.append(np.full(len(tg), len(tg), dtype=np.int64))
    if not src_out:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64()),
                         "outdeg": pa.array([], pa.int64())})
    return pa.table({
        "src": pa.array(np.concatenate(src_out), pa.int64()),
        "dst": pa.array(np.concatenate(dst_out), pa.int64()),
        "outdeg": pa.array(np.concatenate(deg_out), pa.int64()),
    })


def pagerank(edges_ds, n_nodes: int, iters: int = 5,
             num_partitions: int = 8):
    """Integer PageRank over an edge Dataset (src, dst, outdeg).
    Returns Dataset (doc_id, rank_u) in RANK_SCALE units.

    Every node must appear as a dst (true for the synthetic ring
    graph); each iteration joins the current ranks to the edges and
    re-aggregates — the rank table is (n_nodes x 16B), the only state
    carried between iterations."""
    from ray.data.aggregate import Sum

    base = RANK_SCALE // n_nodes
    teleport = (15 * base) // 100

    ranks = None  # None = uniform r0 (skip the first join's rank leg)
    for _ in range(iters):
        if ranks is None:
            def contrib0(t: pa.Table) -> pa.Table:
                c = base // t.column("outdeg").to_numpy(
                    zero_copy_only=False)
                return pa.table({"dst": t.column("dst"),
                                 "c": pa.array(c, pa.int64())})

            contrib = edges_ds.map_batches(contrib0,
                                           batch_format="pyarrow")
        else:
            j = edges_ds.join(ranks, "inner", num_partitions,
                              on=("src",), right_on=("node",))

            def contrib_n(t: pa.Table) -> pa.Table:
                c = (t.column("rank_u").to_numpy(zero_copy_only=False)
                     // t.column("outdeg").to_numpy(
                         zero_copy_only=False))
                return pa.table({"dst": t.column("dst"),
                                 "c": pa.array(c, pa.int64())})

            contrib = j.map_batches(contrib_n, batch_format="pyarrow")
        agg = contrib.groupby("dst").aggregate(Sum("c", alias_name="c"))

        def finish(t: pa.Table) -> pa.Table:
            r = (teleport
                 + (85 * t.column("c").to_numpy(zero_copy_only=False))
                 // 100)
            return pa.table({"node": t.column("dst"),
                             "rank_u": pa.array(r, pa.int64())})

        ranks = agg.map_batches(finish, batch_format="pyarrow")
        ranks = ranks.materialize()  # iteration barrier: small table
    return ranks.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "rank_u": t.column("rank_u")}),
        batch_format="pyarrow")
