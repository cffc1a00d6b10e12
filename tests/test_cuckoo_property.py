"""Property: the vectorized batch probe/insert path must agree with
the scalar add_hash path for any hash sequence (including duplicates
and multi-batch splits)."""

from hypothesis import given, settings, strategies as st

from nipper_ray.frontier.cuckoo import CuckooFilter

hashes = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                  max_size=300)


@settings(max_examples=100, deadline=None)
@given(hashes, st.integers(min_value=1, max_value=5))
def test_vector_equals_scalar(hs, n_batches):
    scalar = CuckooFilter(1024)
    vector = CuckooFilter(1024)
    scalar_out = [scalar.add_hash(h) for h in hs]
    vector_out = []
    step = max(1, len(hs) // n_batches) if hs else 1
    for i in range(0, len(hs), step):
        vector_out.extend(vector.check_and_add_many(hs[i:i + step]))
    assert vector_out == scalar_out
    # both filters answer membership identically afterwards
    for h in hs:
        assert vector.contains_hash(h) == scalar.contains_hash(h) is True
    assert len(vector) == len(scalar)
    assert vector.snapshot() == scalar.snapshot()
