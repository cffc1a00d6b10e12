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


def anti_join(left, right, on, right_on=None, num_partitions: int = 8):
    """Distributed anti join: left rows with NO match in right.

    The right side is reduced to (key, marker) rows before the
    shuffle — only keys move — then a left-outer ``Dataset.join``
    and a null-marker filter.  The classic NOT EXISTS shape for
    large-large sides (the frontier-vs-seen set uses the sharded
    cuckoo probe instead because its right side is a mutable index)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    on = tuple(on) if not isinstance(on, str) else (on,)
    right_on = (on if right_on is None
                else (tuple(right_on) if not isinstance(right_on, str)
                      else (right_on,)))

    def keys_only(t: pa.Table) -> pa.Table:
        # batch-local key dedup (combiner): bounds the left_outer
        # match multiplication to one row per key per batch
        d = t.select(list(right_on)).group_by(
            list(right_on)).aggregate([])
        cols = {c: d.column(c) for c in right_on}
        cols["__m"] = pa.array([1] * len(d), pa.int8())
        return pa.table(cols)

    r = right.map_batches(keys_only, batch_format="pyarrow")
    j = left.join(r, "left_outer", num_partitions, on=on,
                  right_on=right_on)
    return j.map_batches(
        lambda t: t.filter(pc.is_null(t.column("__m")))
        .drop_columns(["__m"]),
        batch_format="pyarrow")


def asof_join(left, right, by: str, on: str, right_cols,
              direction: str = "backward", inner: bool = True,
              right_tiebreak=None):
    """Distributed as-of join: for every left row, attach the right row
    with the same ``by`` key and the greatest ``on`` <= left.on
    (backward; "forward" = smallest >=).

    Ray Data has no native as-of join; this is the documented
    composition (groupby + sorted merge): both sides are tagged and
    aligned to one schema, ONE ``groupby(by)`` shuffle co-locates each
    key, and the per-group sorted merge is ``pandas.merge_asof``
    (vectorized).  Partitioning assumption: one key group (all left +
    right rows of a ``by`` value) fits a worker — salt hot keys by
    time-bucketing ``on`` upstream if that breaks.

    ``right_cols`` are the right-side payload columns carried onto the
    output (must not collide with left columns).  Ties on ``on`` pick
    the greatest ``right_tiebreak`` (default: last in (on,) order)."""
    import pandas as pd
    import pyarrow as pa

    def _pa_schema(ds):
        base = getattr(ds.schema(), "base_schema", None)
        if isinstance(base, pa.Schema):
            return ds, base
        # pandas-block dataset: normalize to Arrow blocks first
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        return ds, ds.schema().base_schema

    left, l_pa = _pa_schema(left)
    right, r_pa = _pa_schema(right)
    l_schema = list(l_pa.names)
    r_schema = [by, on] + list(right_cols)
    type_of = {}
    for sch in (l_pa, r_pa):
        for f in sch:
            type_of[f.name] = f.type
    all_payload = [c for c in l_schema if c != by] \
        + [c for c in right_cols]

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            cols = {by: t.column(by),
                    "_side": pa.array([side] * len(t), pa.int8())}
            src = l_schema if side == 0 else r_schema
            for c in all_payload + [on]:
                if c in cols:
                    continue
                cols[c] = (t.column(c) if c in src
                           else pa.nulls(len(t), type=type_of[c]))
            return pa.table(cols)

        return fn

    unioned = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    sort_r = [on] + (list(right_tiebreak) if right_tiebreak else [])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0]
        rg = g[g["_side"] == 1]
        lcols = [c for c in l_schema]
        rcols = [on] + list(right_cols)
        lg = lg[lcols].sort_values(on, kind="mergesort")
        rg = rg[rcols].sort_values(sort_r, kind="mergesort")
        # columns absent on the other side carry nulls through the
        # union, which promotes pandas ints to float — cast back on the
        # (null-free) per-side slices
        import pyarrow.types as pt

        for frame, cols in ((lg, lcols), (rg, rcols)):
            for c in cols:
                if (frame[c].dtype.kind == "f"
                        and pt.is_integer(type_of[c])
                        and not frame[c].isna().any()):
                    frame[c] = frame[c].astype(
                        type_of[c].to_pandas_dtype())
        if len(lg) == 0 or (inner and len(rg) == 0):
            # build the empty frame with the ORIGINAL arrow dtypes, not
            # the group frame's (whose ints were float-promoted by the
            # union nulls) — a float64-typed empty block would poison
            # the output schema merge
            return pd.DataFrame(
                {c: pd.Series(
                    [], dtype=type_of[c].to_pandas_dtype())
                 for c in lcols + list(right_cols)})
        if len(rg) == 0:
            out = lg.copy()
            for c in right_cols:
                out[c] = None
            return out
        out = pd.merge_asof(lg, rg, on=on, direction=direction,
                            allow_exact_matches=True)
        if inner:
            out = out.dropna(subset=list(right_cols))
            # unmatched-row NaNs promote int columns to float; restore
            for c in right_cols:
                out[c] = out[c].astype(rg[c].dtype)
        return out

    from .grouping import routed_map_groups

    # routed (bounded-dispatch) per-key groupby: millions of `by` keys
    # would otherwise cost one executor dispatch each
    return routed_map_groups(unioned, [by], merge)


def range_join_broadcast(ds, intervals, value_col: str,
                         tag_col: str = "band"):
    """Broadcast range (interval) join: each row matches every interval
    with ``lo <= value < hi`` — intervals may overlap, so a row can
    emit multiple output rows (the flat-map shape).

    ``intervals`` is a small list of ``(lo, hi, tag)`` broadcast inside
    the stage; matching is one vectorized comparison per interval per
    batch (O(k × batch) numpy, no shuffle).  For a LARGE interval side
    you would instead sort both sides and band-partition by range —
    not needed while the interval side fits a task."""
    import numpy as np
    import pyarrow as pa

    ivs = [(float(lo), float(hi), tag) for lo, hi, tag in intervals]

    def apply(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        parts = []
        for lo, hi, tag in ivs:
            mask = (v >= lo) & (v < hi)
            if mask.any():
                sub = batch.filter(pa.array(mask))
                parts.append(sub.append_column(
                    tag_col, pa.array([tag] * len(sub))))
        if not parts:
            empty = batch.slice(0, 0)
            return empty.append_column(
                tag_col, pa.array([], pa.string()))
        return pa.concat_tables(parts)

    return ds.map_batches(apply, batch_format="pyarrow")


def broadcast_map(ds, mapping: dict, key_col: str, out_col: str,
                  drop_missing: bool = False):
    """Broadcast lookup join: adds ``out_col = mapping[key_col]`` per
    row.  The mapping is materialized ONCE (driver-side) as a pair of
    Arrow arrays riding the stage closure; each batch is probed with
    ``pc.index_in`` + ``take`` — fully vectorized, no per-row Python.
    Missing keys map to null (then optionally dropped)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    key_arr = pa.array(list(mapping.keys()))
    val_arr = pa.array(list(mapping.values()))

    def apply(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        ks = (key_arr if key_arr.type == col.type
              else key_arr.cast(col.type))
        idx = pc.index_in(col, value_set=ks)
        out = batch.append_column(out_col, pc.take(val_arr, idx))
        if drop_missing:
            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    return ds.map_batches(apply, batch_format="pyarrow")
