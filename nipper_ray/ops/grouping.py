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

The routing hash is xxh64 (deterministic across workers and runs);
numeric keys hash their little-endian bytes, strings their UTF-8.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..frontier.hashing import xxh64_batch, xxh64_fixed_rows

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _key_hash(t: pa.Table, keys) -> np.ndarray:
    h = np.zeros(len(t), dtype=np.uint64)
    for c in keys:
        col = t.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type):
            hc = xxh64_batch(col.to_pylist())
        else:
            vals = col.to_numpy(zero_copy_only=False)
            raw = np.ascontiguousarray(vals.astype(np.int64,
                                                   copy=False))
            hc = xxh64_fixed_rows(
                raw.view(np.uint8).reshape(len(t), 8))
        h = (h * _GOLDEN) ^ hc
    return h


def routed_map_groups(ds, keys, fn, n_parts: int = 64,
                      drop_pkey: bool = True):
    """Semantically identical to ``ds.groupby(keys).map_groups(fn,
    batch_format="pandas")`` with O(n_parts) executor dispatches."""
    keys = list(keys)

    def add_pkey(t: pa.Table) -> pa.Table:
        pk = ((_key_hash(t, keys) >> np.uint64(33))
              % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("pkey", pa.array(pk))

    def part_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["pkey"])
        outs = [fn(sub) for _, sub in g.groupby(keys, sort=False)]
        return pd.concat(outs, ignore_index=True)

    routed = ds.map_batches(add_pkey, batch_format="pyarrow")
    return routed.groupby("pkey").map_groups(part_fn,
                                             batch_format="pandas")
