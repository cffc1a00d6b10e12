"""Join operators.

Two shapes, chosen by side size (ray_guide: joins at scale):

- ``broadcast_map`` — small side loaded ONCE into a plain dict /
  Arrow table on the driver, shipped by value inside a picklable stage
  (or via ``ray.put`` for bigger lookups) and probed per batch.  No
  shuffle at all; the right choice whenever one side fits a worker.
- ``hash_join`` — both sides large: hash-partition each side on the
  key into ``num_partitions`` and join matching partitions
  independently (Ray Data's native ``Dataset.join`` hash-shuffle).
  This is the all-to-all exchange; every byte of both sides moves, so
  prune columns *before* joining and pick num_partitions so a
  partition pair fits a worker heap (payload_bytes/num_partitions ≈
  100-500 MB at cluster scale).

Arrow/Acero restriction: non-key columns must be scalar types (no
list<> payloads) — pack list payloads to binary blobs first (see
ops/dedup.py minhash_neardup for the pattern).
"""

from __future__ import annotations


def hash_join(left, right, on, right_on=None, num_partitions: int = 8,
              how: str = "inner"):
    """Hash-partitioned large-large join of two Datasets.

    Thin, documented wrapper over ``Dataset.join`` so pipelines state
    their shuffle intent explicitly.  ``on``/``right_on`` are column
    tuples; ``right_on`` defaults to ``on``."""
    on = tuple(on) if not isinstance(on, str) else (on,)
    if right_on is None:
        right_on = on
    else:
        right_on = (tuple(right_on) if not isinstance(right_on, str)
                    else (right_on,))
    return left.join(right, how, num_partitions, on=on,
                     right_on=right_on)


def broadcast_map(ds, mapping: dict, key_col: str, out_col: str,
                  drop_missing: bool = False):
    """Broadcast lookup join: adds ``out_col = mapping[key_col]`` per
    row.  The dict rides inside the (picklable) stage closure — shipped
    once per worker, probed vectorized per batch."""
    import pyarrow as pa

    def apply(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        vals = [mapping.get(k) for k in keys]
        out = batch.append_column(out_col, pa.array(vals))
        if drop_missing:
            import pyarrow.compute as pc

            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    return ds.map_batches(apply, batch_format="pyarrow")
