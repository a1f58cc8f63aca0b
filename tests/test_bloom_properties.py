"""Property-based Bloom-sketch algebra: the engine's resume and
warehouse-sketch paths lean on three invariants — no false negatives
ever; insertion order/batching irrelevance (a resume that replays
claims in any split must converge to the same sketch); and OR-fold
merge correctness (partition-wise partial bitmaps OR-folded must equal
the sequential build — the warehouse sketch's per-round delta append
IS this fold). The fixed tests pin known shapes; this randomizes keys,
splits, and bucket counts (including non-power-of-two B, the floored-
mod trap documented in BucketedBloom._bucket_of).

Pure numpy/driver-side — no Spark session."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.operators.bloom import (
    BucketedBloom,
    empty_bucketed,
    or_fold_bits,
)

KEYS = st.integers(-(2**62), 2**62)


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(KEYS, min_size=1, max_size=200),
    buckets=st.sampled_from([1, 2, 3, 7, 8]),
)
def test_no_false_negatives_any_bucket_count(keys, buckets):
    bb = empty_bucketed(buckets, expected_items=4096)
    bb.insert_vec(np.array(keys, dtype=np.int64))
    assert bb.contains_vec(np.array(keys, dtype=np.int64)).all()


@settings(max_examples=50, deadline=None)
@given(
    keys=st.lists(KEYS, min_size=1, max_size=200),
    split=st.integers(0, 200),
    buckets=st.sampled_from([2, 3, 8]),
)
def test_batch_split_is_bitmap_identical(keys, split, buckets):
    """Inserting in one batch vs any two-way split (resume replay)
    must produce byte-identical bitmaps — the sketch is a pure set
    union, no order effects."""
    arr = np.array(keys, dtype=np.int64)
    one = empty_bucketed(buckets, expected_items=4096)
    one.insert_vec(arr)
    cut = min(split, len(arr))
    two = empty_bucketed(buckets, expected_items=4096)
    two.insert_vec(arr[:cut])
    two.insert_vec(arr[cut:])
    for f1, f2 in zip(one.filters, two.filters):
        assert np.array_equal(f1.bits, f2.bits)


@settings(max_examples=50, deadline=None)
@given(
    parts=st.lists(
        st.lists(KEYS, min_size=0, max_size=60), min_size=1, max_size=5
    ),
    buckets=st.sampled_from([2, 3, 8]),
)
def test_or_fold_of_partials_equals_sequential_build(parts, buckets):
    """Per-partition partial sketches OR-folded per bucket == the
    sequential single-builder sketch, byte-identical — the algebra the
    distributed build and the warehouse delta-append both rely on."""
    seq = empty_bucketed(buckets, expected_items=4096)
    partials = []
    for keys in parts:
        p = empty_bucketed(buckets, expected_items=4096)
        if keys:
            arr = np.array(keys, dtype=np.int64)
            p.insert_vec(arr)
            seq.insert_vec(arr)
        partials.append(p)
    folded = BucketedBloom(
        num_buckets=buckets,
        filters=[
            type(seq.filters[0])(
                num_bits=seq.filters[b].num_bits,
                num_hashes=seq.filters[b].num_hashes,
                bits=or_fold_bits(
                    pd.Series([p.filters[b].bits.tobytes() for p in partials])
                ),
            )
            for b in range(buckets)
        ],
    )
    for f1, f2 in zip(seq.filters, folded.filters):
        assert np.array_equal(f1.bits, f2.bits)
