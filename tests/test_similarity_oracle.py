"""Pins for the ann_lsh / ann_ivf SQL oracles (__ray_entry__).

The oracles re-derive both approximate ANN pipelines in DuckDB from
embedded VALUES tables (hyperplanes / codebook).  Their validity rests
on two facts pinned here:

1. every sign / ordering decision the SQL makes over float sums has a
   margin orders of magnitude above summation-order noise (~1e-13), at
   every shipped scale factor;
2. the Ray-free codebook recomputation (_ivf_oracle_centroids) is
   bitwise identical to the distributed _hash_spread_sample +
   _kmeans_cosine path the query runs.

Plus a DuckDB end-to-end equality at sf0.001 (the driver's own gate
covers sf0.01; scripts/check_oracles.py covers sf0.1).
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
# far above float64 summation-order noise (~1e-13 at these magnitudes)
MARGIN = 1e-8


def _matrix(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    col = t.column("embedding").combine_chunks()
    d = len(col[0])
    m = (col.flatten().to_numpy(zero_copy_only=False)
         .reshape(len(ids), d).astype(np.float64))
    return ids, m


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lsh_oracle_margins(sf_dir):
    from nipper_ray.ops.similarity import _planes

    ids, m = _matrix(sf_dir)
    proj = m @ _planes(m.shape[1]).T
    # bucket-bit signs (whole corpus) and the queries' probe ordering
    assert np.abs(proj).min() > MARGIN
    qa = np.sort(np.abs(proj[ids < 5]), axis=1)
    assert np.diff(qa, axis=1).min() > MARGIN


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ivf_oracle_margins(sf_dir):
    from __ray_entry__ import _ivf_oracle_centroids

    ids, m = _matrix(sf_dir)
    cent = _ivf_oracle_centroids(sf_dir)
    dots = np.sort(m @ cent.T, axis=1)
    # cell-assignment argmax margin (corpus) + probe ordering (queries)
    assert (dots[:, -1] - dots[:, -2]).min() > MARGIN
    qd = np.sort(m[ids < 5] @ cent.T, axis=1)
    assert np.diff(qd, axis=1).min() > MARGIN


def test_ivf_oracle_centroids_match_ray_path(ray_session):
    """The oracle's Ray-free codebook == the distributed one, bitwise."""
    import ray.data as rd

    from __ray_entry__ import _ivf_oracle_centroids
    from nipper_ray.ops.similarity import (_hash_spread_sample,
                                           _kmeans_cosine)

    sf_dir = "/root/testdata/sf0.001"
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    ray_cent = _kmeans_cosine(_hash_spread_sample(ds, 2048), 16)
    pure_cent = _ivf_oracle_centroids(sf_dir)
    assert ray_cent.shape == pure_cent.shape
    assert (ray_cent == pure_cent).all()


def test_ann_oracles_end_to_end_sf0001(ray_session):
    """q_ann_lsh / q_ann_ivf == their DuckDB oracles at sf0.001."""
    import duckdb

    os.environ["NIPPER_RAY_ORACLE_SF"] = "/root/testdata/sf0.001"
    try:
        import __ray_entry__ as entry

        sf_dir = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM read_parquet('%s')"
            % os.path.join(sf_dir, "embeddings.parquet"))
        oracles = entry.oracle_sql()
        for name, fn in (("ann_lsh", entry.q_ann_lsh),
                         ("ann_ivf", entry.q_ann_ivf)):
            mine = fn(sf_dir).to_pandas()
            gold = con.execute(oracles[name]).df()
            assert list(mine.columns) == list(gold.columns), name
            assert len(mine) == len(gold), name
            for c in mine.columns:
                assert (mine[c].values == gold[c].values).all(), (name, c)
    finally:
        os.environ.pop("NIPPER_RAY_ORACLE_SF", None)
