"""Batch vs scalar cuckoo-path properties.

The vectorized batch path probes the whole batch before inserting, so
within one batch a same-fingerprint-same-bucket collision between two
DISTINCT hashes produces one fewer false positive than the scalar
interleave would (strictly more accurate, not bit-identical). The
invariants that must hold regardless:

- no false negatives ever;
- an exact duplicate hash is rejected after its first acceptance;
- replaying the whole sequence returns all-False (idempotent);
- the filter never accepts a hash the scalar path would have accepted
  as new and then "forgets" it.
"""

from hypothesis import given, settings, strategies as st

from nipper_ray.frontier.cuckoo import CuckooFilter

hashes = st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                  max_size=300)


@settings(max_examples=100, deadline=None)
@given(hashes, st.integers(min_value=1, max_value=5))
def test_batch_invariants(hs, n_batches):
    vector = CuckooFilter(1024)
    out = []
    step = max(1, len(hs) // n_batches) if hs else 1
    for i in range(0, len(hs), step):
        out.extend(bool(x) for x in vector.check_and_add_many(hs[i:i + step]))
    # no false negatives
    for h in hs:
        assert vector.contains_hash(h)
    # exact duplicates: only the first occurrence may be accepted
    first_seen = {}
    for h, accepted in zip(hs, out):
        if h in first_seen:
            assert not accepted, "duplicate hash accepted twice"
        else:
            first_seen[h] = accepted
    # idempotent replay
    assert not vector.check_and_add_many(hs).any()
    # count equals number of accepted rows
    assert len(vector) == sum(out)
    # snapshot round-trips
    restored = CuckooFilter.restore(vector.snapshot())
    for h in hs:
        assert restored.contains_hash(h)


@settings(max_examples=50, deadline=None)
@given(hashes)
def test_scalar_batch_membership_agree(hs):
    """Distinct-hash acceptance may differ on false positives, but
    membership answers afterwards must agree for every inserted hash."""
    scalar = CuckooFilter(1024)
    vector = CuckooFilter(1024)
    for h in hs:
        scalar.add_hash(h)
    vector.check_and_add_many(hs)
    for h in hs:
        assert scalar.contains_hash(h) and vector.contains_hash(h)


def test_contains_many_matches_scalar():
    import numpy as np

    from nipper_ray.frontier.cuckoo import CuckooFilter

    f = CuckooFilter(256)  # tiny -> forces overflow too
    rng = np.random.RandomState(3)
    hs = rng.randint(0, 2**63, size=600, dtype=np.int64).astype(np.uint64)
    f.check_and_add_many(hs[:400])
    probe = np.concatenate([hs[:100], hs[400:]])
    got = f.contains_many(probe)
    want = np.array([f.contains_hash(int(h)) for h in probe], dtype=bool)
    assert (got == want).all()
    assert got[:100].all()  # inserted ones always found
