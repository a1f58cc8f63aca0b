"""Cuckoo-filter URL-seen sketch — the deletable alternative to Bloom.

The north_rule names "Bloom/cuckoo-filter URL-seen set"; this is the
cuckoo half. Same role and API as :class:`operators.bloom.BloomFilter`
(``insert_vec`` / ``contains_vec`` — drop-in for
``prefiltered_anti_join`` and ``with_bloom_flag``), plus what Bloom
cannot do: ``delete_vec``. After ``DELETE /scraping/{id}`` the
scraping's URL hashes can leave the in-memory sketch, so a future
re-crawl of those URLs skips the pointless maybe-seen anti-join pass.
(Exactness never depended on this — the sketch is a pre-filter and
membership truth is always the left-anti join — but a sketch that only
grows degrades to all-maybe-seen over many crawl/delete cycles.)

Design (Fan et al., partial-key cuckoo hashing):
- ``b`` buckets of 4 fingerprint slots (uint16; 0 reserved = empty),
  bucket count a power of two so the partner-bucket XOR stays in range;
- fingerprint = top 16 bits of the xxhash64 (never 0);
- ``contains_vec`` is fully numpy-vectorized (both candidate buckets ×
  4 slots per query, no Python loop);
- ``insert_vec``/``delete_vec`` walk items in Python (cuckoo kicks are
  inherently sequential); at the crawl's per-round batch sizes
  (``bloom_driver_insert_max``) this is driver-side milliseconds.

Scale position: the sharded ``BucketedBloom`` remains the 10^10-URL
path (OR-mergeable shards, distributed build). The cuckoo filter covers
the moderate-scale warehouse that sees frequent scraping deletes; its
table is NOT OR-mergeable, so builds are driver-side inserts (bounded
by ``max_items`` at construction — choose Bloom past that).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_FP_MUL = np.uint64(0x5BD1E995)  # partner-bucket mix (standard choice)


def _next_pow2(n: int) -> int:
    return 1 << max(4, (n - 1).bit_length())


@dataclass
class CuckooFilter:
    num_buckets: int          # power of two
    table: np.ndarray         # (num_buckets, 4) uint16, 0 = empty
    count: int = 0

    # --- construction -----------------------------------------------------
    @classmethod
    def sized_for(cls, expected_items: int) -> "CuckooFilter":
        """~95% load factor at 4-slot buckets (the classic operating
        point); 16-bit fingerprints give fpp ≈ 2·4/2^16 ≈ 1.2e-4."""
        nb = _next_pow2(max(1, int(np.ceil(expected_items / (_SLOTS * 0.95)))))
        return cls(num_buckets=nb, table=np.zeros((nb, _SLOTS), dtype=np.uint16))

    # --- hashing ----------------------------------------------------------
    def _fp_and_buckets(
        self, hashes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        h = np.ascontiguousarray(hashes)
        if h.dtype != np.uint64:
            h = h.astype(np.int64).view(np.uint64)
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot
        mask = np.uint64(self.num_buckets - 1)
        b1 = (h & mask).astype(np.int64)
        b2 = self._partner(b1, fp)
        return fp, b1, b2

    def _partner(self, b: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = (fp.astype(np.uint64) * _FP_MUL) & np.uint64(self.num_buckets - 1)
        return (b.astype(np.uint64) ^ mix).astype(np.int64)

    # --- API (BloomFilter-compatible) -------------------------------------
    def contains_vec(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1, b2 = self._fp_and_buckets(np.asarray(hashes))
        fpc = fp[:, None]
        return ((self.table[b1] == fpc) | (self.table[b2] == fpc)).any(axis=1)

    def insert_vec(self, hashes: np.ndarray) -> None:
        """Idempotent insert (skips fingerprints already present in a
        candidate bucket — the seen-set is a set). Raises on table
        overflow rather than silently dropping (a dropped insert would
        be a FALSE NEGATIVE, the one error class the crawl can't absorb)."""
        if len(hashes) == 0:
            return
        fp, b1, b2 = self._fp_and_buckets(np.asarray(hashes))
        already = ((self.table[b1] == fp[:, None]) | (self.table[b2] == fp[:, None])).any(axis=1)
        t = self.table
        rng = np.random.default_rng(0xC0FFEE)  # deterministic kick choice
        for i in np.flatnonzero(~already):
            f, x, y = int(fp[i]), int(b1[i]), int(b2[i])
            placed = False
            for b in (x, y):
                empty = np.flatnonzero(t[b] == 0)
                if len(empty):
                    t[b, empty[0]] = f
                    placed = True
                    break
            if placed:
                self.count += 1
                continue
            # kick loop
            b = x
            for _ in range(_MAX_KICKS):
                s = int(rng.integers(_SLOTS))
                f, t[b, s] = int(t[b, s]), f
                b = int(
                    self._partner(np.array([b]), np.array([f], dtype=np.uint16))[0]
                )
                empty = np.flatnonzero(t[b] == 0)
                if len(empty):
                    t[b, empty[0]] = f
                    placed = True
                    break
            if not placed:
                raise RuntimeError(
                    f"cuckoo filter over capacity ({self.count} items, "
                    f"{self.num_buckets * _SLOTS} slots) — size it larger or "
                    "use the sharded Bloom for sets this big"
                )
            self.count += 1

    def delete_vec(self, hashes: np.ndarray) -> int:
        """Remove one matching fingerprint per hash (cuckoo's advantage
        over Bloom). Returns how many were found+removed. Deleting a
        never-inserted item is safe for EXACTNESS here (the sketch is a
        pre-filter) but may evict a colliding member's fingerprint —
        that member degrades to definitely-new and is re-checked by the
        exact anti-join, costing a shuffle row, not correctness."""
        if len(hashes) == 0:
            return 0
        fp, b1, b2 = self._fp_and_buckets(np.asarray(hashes))
        removed = 0
        t = self.table
        for i in range(len(fp)):
            f = fp[i]
            for b in (int(b1[i]), int(b2[i])):
                slots = np.flatnonzero(t[b] == f)
                if len(slots):
                    t[b, slots[0]] = 0
                    removed += 1
                    self.count -= 1
                    break
        return removed

    @property
    def load_factor(self) -> float:
        return self.count / (self.num_buckets * _SLOTS)
