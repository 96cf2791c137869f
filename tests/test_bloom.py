"""Partitioned Bloom URL-seen set (SURVEY §4.2): the safety property is
NO FALSE NEGATIVES — a URL the filter rejects must truly be absent, else the
URL-seen set silently diverges from the reference closure."""

import numpy as np

from kermit_spark.bloom import (
    BloomSpec,
    _probe_positions,
    _set_bits,
    _test_bits,
    bloom_prefilter,
    build_bloom,
    merge_bloom,
)

SPEC = BloomSpec(m_bits=1 << 14, k_hashes=7)


def test_numpy_kernel_roundtrip():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=500, dtype=np.int64)
    bits = np.zeros(SPEC.m_bits >> 3, dtype=np.uint8)
    _set_bits(bits, _probe_positions(keys, SPEC.m_bits, SPEC.k_hashes))
    # every inserted key tests positive (no false negatives, ever)
    assert _test_bits(bits, _probe_positions(keys, SPEC.m_bits, SPEC.k_hashes)).all()


def test_fpp_reasonable():
    rng = np.random.default_rng(11)
    keys = rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64)
    probe = rng.integers(-(2**62), 2**62, size=20000, dtype=np.int64)
    probe = np.setdiff1d(probe, keys)
    bits = np.zeros(SPEC.m_bits >> 3, dtype=np.uint8)
    _set_bits(bits, _probe_positions(keys, SPEC.m_bits, SPEC.k_hashes))
    fp = _test_bits(bits, _probe_positions(probe, SPEC.m_bits, SPEC.k_hashes)).mean()
    # 1000 keys in 16k bits = 0.49 bits/key load -> theoretical fpp ~2.3%
    assert fp < 0.10


def test_build_and_prefilter_no_false_negatives(spark):
    frontier = spark.createDataFrame(
        [(i % 4, i * 7919) for i in range(200)], "p int, url_hash long"
    )
    bloom = build_bloom(frontier, SPEC)
    # candidates: 100 present, 100 absent
    cands = spark.createDataFrame(
        [(i % 4, i * 7919) for i in range(100)]
        + [(i % 4, i * 7919 + 1) for i in range(100)],
        "p int, url_hash long",
    )
    tagged = bloom_prefilter(cands, bloom).collect()
    present = {(r["p"], r["url_hash"]): r["maybe_seen"] for r in tagged}
    for i in range(100):
        assert present[(i % 4, i * 7919)] is True  # all inserted -> maybe_seen


def test_prefilter_partition_without_blob_is_definitely_new(spark):
    bloom = build_bloom(
        spark.createDataFrame([(0, 123)], "p int, url_hash long"), SPEC
    )
    cands = spark.createDataFrame([(5, 999)], "p int, url_hash long")
    got = bloom_prefilter(cands, bloom).collect()
    assert got[0]["maybe_seen"] is False


def test_merge_is_incremental_union(spark):
    base = spark.createDataFrame([(0, 1), (0, 2), (1, 10)], "p int, url_hash long")
    bloom = build_bloom(base, SPEC)
    new = spark.createDataFrame([(0, 3), (2, 20)], "p int, url_hash long")
    merged = merge_bloom(bloom, new, SPEC)
    cands = spark.createDataFrame(
        [(0, 1), (0, 3), (1, 10), (2, 20)], "p int, url_hash long"
    )
    tagged = {(r["p"], r["url_hash"]): r["maybe_seen"] for r in bloom_prefilter(cands, merged).collect()}
    assert all(tagged.values()), tagged
    n = {r["p"]: r["n_items"] for r in merged.collect()}
    assert n == {0: 3, 1: 1, 2: 1}
