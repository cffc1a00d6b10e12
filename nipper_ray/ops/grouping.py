"""Partition-routed per-key map_groups.

``Dataset.groupby(keys).map_groups(fn)`` dispatches one executor task
bundle per KEY group (~2 ms each): exact and fine for hundreds of
groups, but a sessionization over 10^7 users or a politeness pass over
10^7 hosts would spend hours on dispatch alone.  ``routed_map_groups``
keeps the identical per-key semantics while bounding dispatches at
``n_parts``: keys are hash-routed to a ``pkey`` partition column, ONE
shuffle co-locates each key's rows exactly as before, and the per-key
``fn`` is applied inside the partition group via a pandas groupby
(~100 µs/group, 20× cheaper, and fully local).

Null keys are kept (Ray's ``groupby`` keeps null-key groups): the
routing hash maps null to a fixed sentinel and the in-partition pandas
groupby runs with ``dropna=False``.

Hot keys (one user/host with more rows than a worker's heap) are the
one partitioning assumption; ``salt=(col, n)`` turns on the exact
two-phase reduction proven for politeness top-B: phase 1 groups by
``keys + salt-bucket`` and applies ``fn`` to each sub-group, phase 2
regroups by ``keys`` alone and applies ``combine_fn`` (default: ``fn``
again) to the concatenated partials.  Exact whenever
``fn(concat(fn(parts))) == fn(whole)`` (top-N / min / max / any
combinable reduction), or when the caller supplies a merge-aware
``combine_fn`` (see ``q_session_windows``' time-bucketed variant).
``n=None`` uses the salt column's values directly as buckets (e.g. a
time-range bucket, which keeps each bucket time-contiguous); an
integer ``n`` hash-buckets the column.

The routing hash is xxh64 (deterministic across workers and runs);
numeric keys hash their little-endian bytes, strings their UTF-8.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..frontier.hashing import xxh64_batch, xxh64_fixed_rows

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
# Fixed sentinel for null keys: distinct from xxh64("") and from any
# value hash with overwhelming probability.
_NULL_HASH = np.uint64(0xA5A5A5A55A5A5A5A)


def _col_hash(col: pa.ChunkedArray) -> np.ndarray:
    """xxh64 per value; nulls map to a fixed sentinel."""
    null_mask = None
    if col.null_count:
        null_mask = col.is_null().to_numpy(zero_copy_only=False)
        col = col.fill_null("" if pa.types.is_string(col.type)
                            or pa.types.is_large_string(col.type) else 0)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        hc = xxh64_batch(col.to_pylist())
    else:
        vals = col.to_numpy(zero_copy_only=False)
        raw = np.ascontiguousarray(vals.astype(np.int64, copy=False))
        hc = xxh64_fixed_rows(raw.view(np.uint8).reshape(len(col), 8))
    if null_mask is not None:
        hc = np.where(null_mask, _NULL_HASH, hc)
    return hc


def _key_hash(t: pa.Table, keys) -> np.ndarray:
    h = np.zeros(len(t), dtype=np.uint64)
    for c in keys:
        h = (h * _GOLDEN) ^ _col_hash(t.column(c))
    return h


def routed_map_groups(ds, keys, fn, n_parts: int = 64,
                      drop_pkey: bool = True, salt=None, combine_fn=None):
    """Semantically identical to ``ds.groupby(keys).map_groups(fn,
    batch_format="pandas")`` with O(n_parts) executor dispatches.

    ``salt=(col, n)`` enables the exact two-phase hot-key reduction
    (see module docstring); requires ``fn`` combinable or an explicit
    ``combine_fn``.
    """
    keys = list(keys)

    if salt is not None:
        salt_col, n_buckets = salt

        def add_salted_pkey(t: pa.Table) -> pa.Table:
            if n_buckets is None:
                # raw column values are the bucket (caller guarantees a
                # low-cardinality, deterministic bucket column)
                sh = _col_hash(t.column(salt_col))
            else:
                sh = _col_hash(t.column(salt_col)) % np.uint64(n_buckets)
            pk = (((_key_hash(t, keys) * _GOLDEN) ^ sh) >> np.uint64(33)) \
                % np.uint64(n_parts)
            return (t.append_column("pkey",
                                    pa.array(pk.astype(np.int32)))
                     .append_column("_salt", pa.array(sh.view(np.int64))))

        def part_fn_salted(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["pkey"])
            outs = [fn(sub.drop(columns=["_salt"]))
                    for _, sub in g.groupby(keys + ["_salt"],
                                            dropna=False, sort=False)]
            return pd.concat(outs, ignore_index=True)

        routed = ds.map_batches(add_salted_pkey, batch_format="pyarrow")
        partials = routed.groupby("pkey").map_groups(
            part_fn_salted, batch_format="pandas")
        return routed_map_groups(partials, keys, combine_fn or fn,
                                 n_parts=n_parts, drop_pkey=drop_pkey)

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = ((_key_hash(t, keys) >> np.uint64(33))
              % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("pkey", pa.array(pk))

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["pkey"])
        outs = [fn(sub) for _, sub in g.groupby(keys, dropna=False,
                                                sort=False)]
        return pd.concat(outs, ignore_index=True)

    routed = ds.map_batches(add_pkey, batch_format="pyarrow")
    return routed.groupby("pkey").map_groups(part_fn,
                                             batch_format="pandas")
