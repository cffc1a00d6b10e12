"""The actor-pool stage mode (the long-running-cluster shape) must
produce identical results to the stateless-task mode."""

import shutil

import pytest

from conftest import FIXTURES

SF = "/root/testdata/sf0.001"


def test_extract_actor_pool_equals_tasks(ray_session):
    from nipper_ray.sources import read_pages
    from nipper_ray.stages import extract_pages

    ds = read_pages(SF, limit=30, columns=["url", "html"])
    a = extract_pages(ds, batch_size=16, use_actors=True,
                      concurrency=2, num_cpus=0.4).take_all()
    ds = read_pages(SF, limit=30, columns=["url", "html"])
    b = extract_pages(ds, batch_size=16, use_actors=False).take_all()
    key = lambda r: r["url"]
    assert sorted(a, key=key) == sorted(b, key=key)


def test_crawl_actor_mode(ray_session):
    from nipper_ray.frontier.scheduler import run_crawl
    from nipper_ray.sources.synth import page_url

    out = "/tmp/crawl_actor_mode"
    shutil.rmtree(out, ignore_errors=True)
    seeds = [page_url(i) for i in range(0, 24, 4)]
    metrics = run_crawl(
        SF, out, seeds, waves=1, num_shards=2, per_host_budget=10,
        wave_budget=30, use_actors=True, pool_size=1, actor_cpus=0.4,
        extract_concurrency=1, fixtures_dir=FIXTURES)
    assert metrics[0]["pages_fetched"] > 0
    assert metrics[0]["outlinks_discovered"] > 0


def test_ann_actor_mode_matches_stateless(ray_session):
    """use_actors=True ANN path returns the identical top-k table."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from nipper_ray.ops.similarity import brute_force_topk

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t.column("vec_id"), pa.scalar(3)))
    qref = ray.put({"ids": t.column("vec_id").to_pylist(),
                    "vectors": t.column("embedding").to_pylist()})
    a = brute_force_topk(ds, qref, k=5, use_actors=False)
    b = brute_force_topk(ds, qref, k=5, concurrency=1, use_actors=True)
    assert a.to_pylist() == b.to_pylist()
