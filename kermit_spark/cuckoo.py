"""Partitioned cuckoo-filter URL-seen variant — supports deletion.

The north rule names "bloom/cuckoo URL-seen (cuckoo fallback for deletions)".
The engine's default is the Bloom set (bloom.py): the reference's
``UrlStore.reschedule`` flips status without un-seeing the URL
(/root/reference/src/kermit/QueueSystem.coffee:189-191), so nothing ever
needs deletion and Bloom's smaller/simpler bitset wins. This module provides
the cuckoo variant for deployments that DO evict (e.g. re-crawl policies that
age URLs out of the seen-set), with the same partitioned-blob layout and the
same prefilter contract (no false negatives for present keys; exactness via
anti-join).

Standard cuckoo filter (Fan et al., CoNEXT'14, public): 4-slot buckets,
8-bit fingerprints, partial-key cuckoo hashing — bucket2 = bucket1 XOR
hash(fingerprint). All operations vectorized with numpy over Arrow batches.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_EMPTY = 0  # fingerprints are 1..255; 0 marks an empty slot
_SLOTS = 4
_MAX_KICKS = 500


@dataclass
class CuckooFilter:
    """Single-partition filter over int64 keys (url_hash values)."""

    n_buckets: int

    def __post_init__(self):
        # power-of-two buckets so the XOR trick stays in range
        n = 1
        while n < self.n_buckets:
            n <<= 1
        self.n_buckets = n
        self.table = np.zeros((n, _SLOTS), dtype=np.uint8)
        self.n_items = 0

    # -- hashing -----------------------------------------------------------

    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)).astype(np.uint8)
        return np.where(fp == _EMPTY, np.uint8(1), fp)

    def _bucket1(self, keys: np.ndarray) -> np.ndarray:
        return (keys.astype(np.uint64) % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt_bucket(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        h = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((bucket.astype(np.uint64) ^ h) % np.uint64(self.n_buckets)).astype(np.int64)

    # -- operations --------------------------------------------------------

    def insert(self, keys: np.ndarray) -> int:
        """Insert keys; returns number inserted (raises if the filter is too
        full to place a key after MAX_KICKS evictions)."""
        fps = self._fingerprint(keys)
        b1s = self._bucket1(keys)
        inserted = 0
        for fp, b1 in zip(fps, b1s):
            if self._insert_one(np.uint8(fp), int(b1)):
                inserted += 1
        self.n_items += inserted
        return inserted

    def _insert_one(self, fp: np.uint8, b1: int) -> bool:
        b2 = int(self._alt_bucket(np.array([b1]), np.array([fp]))[0])
        for b in (b1, b2):
            empty = np.where(self.table[b] == _EMPTY)[0]
            if len(empty):
                self.table[b, empty[0]] = fp
                return True
        # cuckoo eviction loop
        rng = np.random.default_rng(int(fp) * 2654435761 % (2**32))  # deterministic per fp
        b = b1
        for _ in range(_MAX_KICKS):
            slot = int(rng.integers(_SLOTS))
            fp, self.table[b, slot] = self.table[b, slot], fp
            b = int(self._alt_bucket(np.array([b]), np.array([fp]))[0])
            empty = np.where(self.table[b] == _EMPTY)[0]
            if len(empty):
                self.table[b, empty[0]] = fp
                return True
        raise RuntimeError("cuckoo filter full — resize required")

    def contains(self, keys: np.ndarray) -> np.ndarray:
        fps = self._fingerprint(keys)
        b1 = self._bucket1(keys)
        b2 = self._alt_bucket(b1, fps)
        in1 = (self.table[b1] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, keys: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns number removed.
        (Deleting a never-inserted key can evict a colliding entry — the
        standard cuckoo caveat; callers only delete keys they inserted.)"""
        fps = self._fingerprint(keys)
        b1s = self._bucket1(keys)
        b2s = self._alt_bucket(b1s, fps)
        removed = 0
        for fp, b1, b2 in zip(fps, b1s, b2s):
            done = False
            for b in (int(b1), int(b2)):
                slots = np.where(self.table[b] == fp)[0]
                if len(slots):
                    self.table[b, slots[0]] = _EMPTY
                    removed += 1
                    done = True
                    break
            if done:
                continue
        self.n_items -= removed
        return removed

    # -- (de)serialization for catalog blobs -------------------------------

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, n_buckets: int) -> "CuckooFilter":
        f = cls(n_buckets)
        f.table = np.frombuffer(blob, dtype=np.uint8).reshape(f.n_buckets, _SLOTS).copy()
        f.n_items = int((f.table != _EMPTY).sum())
        return f
