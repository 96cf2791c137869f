"""Cuckoo-filter URL-seen variant: membership, deletion, serialization,
and hypothesis property tests (no false negatives ever)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kermit_spark.cuckoo import CuckooFilter


def test_insert_contains_delete_roundtrip():
    f = CuckooFilter(1024)
    keys = np.arange(0, 2000, dtype=np.int64) * 7919
    f.insert(keys)
    assert f.contains(keys).all()
    # delete half; deleted keys (mostly) gone, kept keys all present
    f.delete(keys[:1000])
    assert f.contains(keys[1000:]).all()
    # fpp on unrelated keys stays small
    probe = np.arange(1, 20000, dtype=np.int64) * 104729 + 13
    fpp = f.contains(probe).mean()
    assert fpp < 0.05, fpp


def test_serialization_roundtrip():
    f = CuckooFilter(256)
    keys = np.arange(50, dtype=np.int64) * 31
    f.insert(keys)
    g = CuckooFilter.from_bytes(f.to_bytes(), 256)
    assert g.contains(keys).all()
    assert g.n_items == f.n_items


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=300, unique=True))
def test_no_false_negatives_property(keys):
    f = CuckooFilter(2048)
    arr = np.array(keys, dtype=np.int64)
    f.insert(arr)
    assert f.contains(arr).all()


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 2**40), min_size=2, max_size=200, unique=True),
)
def test_delete_keeps_remaining_property(keys):
    arr = np.array(keys, dtype=np.int64)
    half = len(arr) // 2
    f = CuckooFilter(2048)
    f.insert(arr)
    f.delete(arr[:half])
    # deletion must never remove entries for keys we did not delete
    assert f.contains(arr[half:]).all()
