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
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

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

    def _claim_empty_slots(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized bulk placement: write each fp into an empty slot of its
        bucket, one winner per (bucket, slot) per round (losers retry against
        the updated table — each round fills at least one contested slot, so
        the loop terminates). Returns the placed mask."""
        placed = np.zeros(len(buckets), dtype=bool)
        pending = np.arange(len(buckets))
        while len(pending):
            bb = buckets[pending]
            empties = self.table[bb] == _EMPTY  # (m, 4)
            has = empties.any(axis=1)
            if not has.any():
                break
            idx = pending[has]
            slot = empties[has].argmax(axis=1)
            key = bb[has] * _SLOTS + slot
            _, first = np.unique(key, return_index=True)
            winners, wslot = idx[first], slot[first]
            self.table[buckets[winners], wslot] = fps[winners]
            placed[winners] = True
            pending = idx[~np.isin(idx, winners)]
        return placed

    def insert(self, keys: np.ndarray) -> int:
        """Insert keys; returns number inserted (raises if the filter is too
        full to place a key after MAX_KICKS evictions). Bulk-vectorized:
        empty-slot placement in bucket1 then bucket2 handles ~everything at
        sane load factors; only keys finding both buckets full take the
        per-key cuckoo kick loop."""
        fps = self._fingerprint(keys)
        b1s = self._bucket1(keys)
        b2s = self._alt_bucket(b1s, fps)
        placed = self._claim_empty_slots(b1s, fps)
        rem = ~placed
        if rem.any():
            placed2 = self._claim_empty_slots(b2s[rem], fps[rem])
            placed[np.flatnonzero(rem)[placed2]] = True
        inserted = int(placed.sum())
        for i in np.flatnonzero(~placed):
            if self._insert_one(np.uint8(fps[i]), int(b1s[i])):
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

    def _clear_matching_slots(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Vectorized bulk deletion: clear ONE slot matching fp per request,
        one winner per (bucket, slot) per round (losers retry — a second
        request for the same fp either finds another matching slot next
        round or drops out). Returns the cleared mask."""
        cleared = np.zeros(len(buckets), dtype=bool)
        pending = np.arange(len(buckets))
        while len(pending):
            bb = buckets[pending]
            matches = self.table[bb] == fps[pending][:, None]  # (m, 4)
            has = matches.any(axis=1)
            if not has.any():
                break
            idx = pending[has]
            slot = matches[has].argmax(axis=1)
            key = bb[has] * _SLOTS + slot
            _, first = np.unique(key, return_index=True)
            winners, wslot = idx[first], slot[first]
            self.table[buckets[winners], wslot] = _EMPTY
            cleared[winners] = True
            pending = idx[~np.isin(idx, winners)]
        return cleared

    def delete(self, keys: np.ndarray) -> int:
        """Remove one matching fingerprint per key; returns number removed.
        (Deleting a never-inserted key can evict a colliding entry — the
        standard cuckoo caveat; callers only delete keys they inserted.)
        Bulk-vectorized like insert: bucket1 pass, then bucket2 for the
        remainder."""
        fps = self._fingerprint(keys)
        b1s = self._bucket1(keys)
        b2s = self._alt_bucket(b1s, fps)
        cleared = self._clear_matching_slots(b1s, fps)
        rem = ~cleared
        if rem.any():
            cleared2 = self._clear_matching_slots(b2s[rem], fps[rem])
            cleared[np.flatnonzero(rem)[cleared2]] = True
        removed = int(cleared.sum())
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


# ---------------------------------------------------------------------------
# Partitioned-blob layer (frontier url_seen integration)
#
# Cuckoo blobs ride the SAME url_seen table layout as Bloom blobs
# (bloom.BLOOM_SCHEMA): ``filter`` = the bucket table bytes, ``m_bits`` =
# n_buckets, and ``k_hashes = 0`` as the cuckoo marker (a Bloom filter always
# has k >= 1). That keeps the catalog, flush and collect plumbing shared.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CuckooSpec:
    """Buckets sized for the expected per-partition URL count at ~95% max
    load (4 slots/bucket)."""

    n_buckets: int = 1 << 17

    @staticmethod
    def for_capacity(n_keys_per_partition: int) -> "CuckooSpec":
        return CuckooSpec(n_buckets=max(1 << 8, int(n_keys_per_partition / (_SLOTS * 0.95))))


def _blob_row(p: int, f: CuckooFilter) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "p": [p],
            "filter": [f.to_bytes()],
            "n_items": [f.n_items],
            "m_bits": [f.n_buckets],
            "k_hashes": [0],
        }
    )


def build_cuckoo(frontier: DataFrame, spec: CuckooSpec) -> DataFrame:
    """One cuckoo blob per partition from (p, url_hash) rows — the
    O(frontier) rebuild path, distributed exactly like bloom.build_bloom.
    Insert placement is a per-key loop (the deletability price vs Bloom's
    vectorized OR); it runs inside executor Arrow groups, never on the
    driver."""
    from .bloom import BLOOM_SCHEMA

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        f = CuckooFilter(spec.n_buckets)
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        if len(h):
            f.insert(h)
        return _blob_row(int(pdf["p"].iloc[0]), f)

    return frontier.select("p", "url_hash").groupBy("p").applyInPandas(make, BLOOM_SCHEMA)


def merge_cuckoo(existing: DataFrame, new_rows: DataFrame, spec: CuckooSpec) -> DataFrame:
    """Insert new url_hashes into per-partition blobs (distributed fallback
    when the blob set exceeds the driver cap — bloom.merge_bloom analog)."""
    from .bloom import BLOOM_SCHEMA

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left):
            f = CuckooFilter.from_bytes(left["filter"].iloc[0], int(left["m_bits"].iloc[0]))
        else:
            f = CuckooFilter(spec.n_buckets)
        if len(right):
            f.insert(right["url_hash"].to_numpy(dtype=np.int64))
        return _blob_row(int(key[0]), f)

    return (
        existing.groupBy("p")
        .cogroup(new_rows.select("p", "url_hash").groupBy("p"))
        .applyInPandas(merge, BLOOM_SCHEMA)
    )


def filters_from_blobs(
    blobs: dict[int, tuple[np.ndarray, int, int]]
) -> dict[int, CuckooFilter]:
    """Rehydrate driver-held CuckooFilter objects from bloom.collect_blobs
    output ((bits, m_bits, k_hashes) with k_hashes == 0)."""
    return {p: CuckooFilter.from_bytes(bits.tobytes(), m) for p, (bits, m, _k) in blobs.items()}


def cuckoo_prefilter_filters(
    candidates: DataFrame, filters: dict[int, CuckooFilter]
) -> DataFrame:
    """Shuffle-free probe against driver-held filters (broadcast + scalar
    pandas UDF — bloom.bloom_prefilter_blobs analog). Tags ``maybe_seen``:
    False ⇒ definitely new (cuckoo has no false negatives for present
    keys); True ⇒ checked exactly by the anti-join."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(
        {p: (f.table.copy(), f.n_buckets) for p, f in filters.items()}
    )

    def probe(p: pd.Series, h: pd.Series) -> pd.Series:
        table = bc.value
        out = np.zeros(len(p), dtype=bool)
        pv = p.to_numpy(dtype=np.int64)
        hv = h.to_numpy(dtype=np.int64)
        for part in np.unique(pv):
            entry = table.get(int(part))
            if entry is None:
                continue
            bits, n_buckets = entry
            f = CuckooFilter.__new__(CuckooFilter)
            f.n_buckets = n_buckets
            f.table = bits
            mask = pv == part
            out[mask] = f.contains(hv[mask])
        return pd.Series(out)

    probe_udf = pandas_udf(probe, BooleanType())
    return candidates.withColumn("maybe_seen", probe_udf(F.col("p"), F.col("url_hash")))


def cuckoo_prefilter(candidates: DataFrame, blobs: DataFrame) -> DataFrame:
    """Cogroup probe for blob sets beyond the driver broadcast cap
    (bloom.bloom_prefilter analog): each Arrow group pairs the partition's
    candidate batch with its one blob."""
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        candidates.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )
    cand_cols = [f.name for f in candidates.schema.fields]

    def test(key, cand: pd.DataFrame, blob: pd.DataFrame) -> pd.DataFrame:
        if not len(cand):
            return pd.DataFrame(columns=cand_cols + ["maybe_seen"])
        if not len(blob) or blob["filter"].iloc[0] is None:
            cand = cand.copy()
            cand["maybe_seen"] = False
            return cand
        f = CuckooFilter.from_bytes(blob["filter"].iloc[0], int(blob["m_bits"].iloc[0]))
        cand = cand.copy()
        cand["maybe_seen"] = f.contains(cand["url_hash"].to_numpy(dtype=np.int64))
        return cand

    return candidates.groupBy("p").cogroup(blobs.groupBy("p")).applyInPandas(test, out_schema)


def insert_filters_inplace(
    filters: dict[int, CuckooFilter],
    parts: np.ndarray,
    hashes: np.ndarray,
    spec: CuckooSpec,
    counts: dict[int, int],
) -> None:
    """Driver-side steady-state maintenance: insert the wave's new
    (budget-bounded) keys into the held filters — bloom.merge_blobs_inplace
    analog; mutates ``filters`` and ``counts``."""
    for part in np.unique(parts):
        f = filters.get(int(part))
        if f is None:
            f = CuckooFilter(spec.n_buckets)
            filters[int(part)] = f
        mask = parts == part
        f.insert(hashes[mask])
        counts[int(part)] = f.n_items


def delete_filters_inplace(
    filters: dict[int, CuckooFilter],
    parts: np.ndarray,
    hashes: np.ndarray,
    counts: dict[int, int],
) -> None:
    """THE operation Bloom cannot do: remove evicted URLs' fingerprints in
    place — O(evicted), no rebuild. Callers only delete keys previously
    inserted (standard cuckoo deletion contract)."""
    for part in np.unique(parts):
        f = filters.get(int(part))
        if f is None:
            continue
        mask = parts == part
        f.delete(hashes[mask])
        counts[int(part)] = f.n_items
