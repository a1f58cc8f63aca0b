"""Property-based cuckoo invariants under the DOCUMENTED deletion
contract (Fan et al. §3, quoted in insert_vec's docstring: an item
must have been inserted once per delete). For random interleaved
insert/delete sequences where deletes only target keys the multiset
model still holds, a false negative on a still-present key — the one
error class the crawl cannot absorb on the sketch-negative skip path —
must never occur, single-filter or sharded. Deleting ABSENT keys is
explicitly out of contract (delete_vec documents it may evict a
colliding member's fingerprint); the last test pins that it still
fails SAFE (no crash, never inflates the removed count).

Pure numpy/driver-side — no Spark session, so hypothesis can afford
many examples."""

from __future__ import annotations

from collections import Counter

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.operators.cuckoo import (
    BucketedCuckoo,
    CuckooFilter,
)

KEYS = st.integers(-(2**62), 2**62)

ops = st.lists(
    st.tuples(st.booleans(), st.lists(KEYS, min_size=1, max_size=30)),
    min_size=1,
    max_size=12,
)


def _run_contract_sequence(make_filter, sequence):
    """Apply the sequence, restricting each delete batch to keys the
    model still holds (refcount-aware), then assert every still-present
    key answers maybe-seen."""
    ck = make_filter()
    model = Counter()
    for is_insert, keys in sequence:
        if is_insert:
            ck.insert_vec(np.array(keys, dtype=np.int64))
            model.update(keys)
        else:
            eligible = []
            pending = Counter()
            for k in keys:
                if pending[k] < model[k]:
                    pending[k] += 1
                    eligible.append(k)
            if eligible:
                removed = ck.delete_vec(np.array(eligible, dtype=np.int64))
                # contract-compliant deletes always find their target
                assert removed == len(eligible)
                model.subtract(pending)
    present = [k for k, c in model.items() if c > 0]
    if present:
        got = ck.contains_vec(np.array(present, dtype=np.int64))
        missing = [k for k, hit in zip(present, got) if not hit]
        assert not missing, f"false negatives on present keys: {missing[:5]}"


@settings(max_examples=60, deadline=None)
@given(sequence=ops)
def test_single_filter_no_false_negatives_under_contract(sequence):
    _run_contract_sequence(lambda: CuckooFilter.sized_for(4096), sequence)


@settings(max_examples=60, deadline=None)
@given(sequence=ops, shards=st.sampled_from([2, 3, 8]))
def test_sharded_filter_no_false_negatives_under_contract(sequence, shards):
    _run_contract_sequence(
        lambda: BucketedCuckoo.sized_for(4096, shards), sequence
    )


@settings(max_examples=40, deadline=None)
@given(
    inserted=st.lists(KEYS, min_size=0, max_size=40),
    absent=st.lists(KEYS, min_size=1, max_size=40),
)
def test_delete_absent_fails_safe(inserted, absent):
    """Out-of-contract deletes (keys never inserted) must not crash,
    must never report more removals than requested, and must leave the
    filter usable (a later in-contract insert+query still works). The
    docstring's caveat — a colliding member may degrade to
    definitely-new — is the accepted cost; exactness rides the crawl's
    anti-join, not this."""
    ck = BucketedCuckoo.sized_for(4096, 4)
    if inserted:
        ck.insert_vec(np.array(inserted, dtype=np.int64))
    probe = [k for k in absent if k not in set(inserted)]
    if not probe:
        return
    removed = ck.delete_vec(np.array(probe, dtype=np.int64))
    assert 0 <= removed <= len(probe)
    ck.insert_vec(np.array([123456789], dtype=np.int64))
    assert ck.contains_vec(np.array([123456789], dtype=np.int64)).all()
