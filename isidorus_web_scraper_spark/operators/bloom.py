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
``url_hash % B`` buckets and builds one bloom per bucket (bits sized
per bucket): ``BucketedBloom`` / ``build_bucketed_bloom`` below. Two
apply modes:

- broadcast (``with_bloom_flag`` — ``BucketedBloom`` is API-compatible
  with ``BloomFilter``): fine while the total bitmap budget fits an
  executor;
- cogrouped (``with_bloom_flag_cogrouped``): bitmaps live in a
  ``(bucket, bits)`` DataFrame, candidates cogroup with it per bucket,
  so each task holds exactly ONE bucket's bitmap — no driver collect,
  no global broadcast; this is the 10^10-URL path (total bitmap bytes
  spread across B tasks instead of resident everywhere).

Hashing is JVM-side ``xxhash64`` feeding numpy double-hashing
(h1 + i*h2 mod m).
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


def _floored_bucket(h: np.ndarray, num_buckets: int) -> np.ndarray:
    """``pmod(signed_hash, B)`` exactly as Spark computes it: numpy's %
    on int64 is floored mod, matching Catalyst's Pmod for positive B.
    ``h`` may arrive as uint64 (the positions pipeline's dtype) — view
    it back to the signed bits first."""
    h = np.ascontiguousarray(h)
    if h.dtype == np.uint64:
        h = h.view(np.int64)
    else:
        h = h.astype(np.int64)
    return h % np.int64(num_buckets)


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


@dataclass
class BucketedBloom:
    """B independent Bloom filters sharded by ``hash % B`` — the
    10^10-URL seen-set design (reference analog: the sharded Redis
    cluster a crawl of that size would need, `redis_client.go:44-50`).
    API-compatible with :class:`BloomFilter` (insert_vec/contains_vec)
    so every apply path accepts either."""

    num_buckets: int
    filters: list[BloomFilter]

    @property
    def total_bytes(self) -> int:
        return sum(f.bits.nbytes for f in self.filters)

    def _bucket_of(self, h: np.ndarray) -> np.ndarray:
        # Floored mod on the SIGNED hash — identical to Spark's
        # ``pmod(xxhash64, B)`` used by with_bloom_flag_cogrouped, for ANY
        # B (uint64 % B only agrees when 2^64 % B == 0, i.e. power-of-two
        # B; anything else silently probed the wrong bucket → false
        # negatives → re-crawled seen URLs).
        return _floored_bucket(h, self.num_buckets)

    def insert_vec(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = np.asarray(hashes).astype(np.uint64)
        b = self._bucket_of(h)
        # one vectorized insert per *present* bucket (≤ B passes)
        for bucket in np.unique(b):
            self.filters[bucket].insert_vec(h[b == bucket])

    def contains_vec(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = np.asarray(hashes).astype(np.uint64)
        b = self._bucket_of(h)
        out = np.zeros(len(h), dtype=bool)
        for bucket in np.unique(b):
            mask = b == bucket
            out[mask] = self.filters[bucket].contains_vec(h[mask])
        return out


def empty_bucketed(
    num_buckets: int, expected_items: int, fpp: float = 1e-3
) -> BucketedBloom:
    """B empty filters, each sized for its expected shard (items/B) —
    total bits ≈ the single-bitmap budget, but no single 2 GB object."""
    per = max(1, expected_items // num_buckets)
    m, k = optimal_params(per, fpp)
    return BucketedBloom(
        num_buckets=num_buckets,
        filters=[
            BloomFilter(num_bits=m, num_hashes=k, bits=np.zeros(m // 8, dtype=np.uint8))
            for _ in range(num_buckets)
        ],
    )


def _partial_bucket_bitmaps(
    df: DataFrame, hash_col: str, B: int, m: int, k: int
) -> DataFrame:
    """Per-partition (bucket, bits) partial bitmaps via mapInArrow —
    the map-side combine both sharded-build paths share. The shuffle
    that follows moves only bitmaps (≤ partitions × buckets-seen ×
    m/8 bytes), never rows."""
    nbytes = m // 8

    def per_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        local: dict[int, np.ndarray] = {}
        for batch in batches:
            h = batch.column(0).to_numpy(zero_copy_only=False).astype(np.uint64)
            if len(h) == 0:
                continue
            b = _floored_bucket(h, B)  # matches pmod() in cogrouped apply
            for bucket in np.unique(b):
                bits = local.setdefault(
                    int(bucket), np.zeros(nbytes, dtype=np.uint8)
                )
                pos = _positions(h[b == bucket], k, m).ravel()
                np.bitwise_or.at(
                    bits,
                    pos >> np.uint64(3),
                    (1 << (pos & np.uint64(7))).astype(np.uint8),
                )
        if local:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(list(local.keys()), type=pa.int32()),
                    pa.array([v.tobytes() for v in local.values()]),
                ],
                ["bucket", "bits"],
            )

    return df.select(F.col(hash_col).alias("h")).mapInArrow(
        per_partition, "bucket int, bits binary"
    )


def or_fold_bits(series) -> np.ndarray:
    """OR a column of equal-geometry bitmap blobs into one bitmap — the
    ONE merge rule for bloom bytes, shared by the delta builder, the
    cogrouped reader, and the engine's sketch fold (bitmaps OR-merge;
    readers fold every appended version of a bucket)."""
    bits = np.zeros(len(series.iloc[0]), dtype=np.uint8)
    for b in series:
        bits |= np.frombuffer(b, dtype=np.uint8)
    return bits


def bucketed_bloom_delta_df(
    df: DataFrame,
    hash_col: str,
    num_buckets: int,
    expected_items: int,
    fpp: float = 1e-3,
) -> DataFrame:
    """Distributed sharded build that returns a ``(bucket, num_bits,
    num_hashes, bits)`` DataFrame WITHOUT ever materializing a bitmap on
    the driver — the warehouse-persisted seen-sketch write path. Rows
    exist only for buckets ``df`` touched; Bloom bitmaps OR-merge, so a
    round's delta simply APPENDS to the sketch table and readers
    (``with_bloom_flag_cogrouped``) fold all versions of a bucket with
    bitwise OR inside the same task that applies them. ``expected_items``
    must stay constant across a warehouse's life (it fixes m and k —
    bitmaps of different geometry don't OR)."""
    import pandas as pd

    per = max(1, expected_items // num_buckets)
    m, k = optimal_params(per, fpp)
    parts = _partial_bucket_bitmaps(df, hash_col, num_buckets, m, k)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = or_fold_bits(pdf["bits"])
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "num_bits": [m],
                "num_hashes": [k],
                "bits": [bits.tobytes()],
            }
        )

    return parts.groupBy("bucket").applyInPandas(
        fold, "bucket int, num_bits long, num_hashes int, bits binary"
    )


def build_bucketed_bloom(
    df: DataFrame,
    hash_col: str,
    num_buckets: int,
    expected_items: int,
    fpp: float = 1e-3,
) -> BucketedBloom:
    """Distributed sharded build: each partition emits (bucket, bits)
    rows for the buckets it saw; per-bucket OR-merge via reduceByKey —
    the shuffle moves only bitmaps (B × m/8 bytes), never rows."""
    per = max(1, expected_items // num_buckets)
    m, k = optimal_params(per, fpp)
    nbytes = m // 8
    B = num_buckets
    parts = _partial_bucket_bitmaps(df, hash_col, B, m, k)
    merged = dict(
        parts.rdd.map(
            lambda r: (r.bucket, np.frombuffer(r.bits, dtype=np.uint8))
        ).reduceByKey(np.bitwise_or).collect()
    )
    return BucketedBloom(
        num_buckets=B,
        filters=[
            BloomFilter(
                num_bits=m,
                num_hashes=k,
                bits=np.array(
                    merged.get(i, np.zeros(nbytes, dtype=np.uint8)), dtype=np.uint8
                ),
            )
            for i in range(B)
        ],
    )


def bloom_bits_df(bloom: BucketedBloom, spark) -> DataFrame:
    """Materialize a BucketedBloom as a (bucket, num_bits, num_hashes,
    bits) DataFrame — the form the cogrouped apply (and an Iceberg-backed
    persistent seen-sketch table) consumes."""
    rows = [
        (i, f.num_bits, f.num_hashes, bytes(f.bits.tobytes()))
        for i, f in enumerate(bloom.filters)
    ]
    return spark.createDataFrame(
        rows, "bucket int, num_bits long, num_hashes int, bits binary"
    )


def with_bloom_flag_cogrouped(
    df: DataFrame,
    hash_col: str,
    bits_df: DataFrame,
    num_buckets: int,
    flag: str = "maybe_seen",
) -> DataFrame:
    """Per-bucket Bloom apply with NO broadcast and NO driver collect:
    candidates cogroup with the (bucket, bits) table, so each task holds
    exactly one bucket's bitmap. At 10^10 URLs the 2 GB of total bitmap
    lives as B shards across tasks instead of resident on every
    executor. Cost: one shuffle of the candidates by bucket — which the
    downstream seen anti-join (also keyed by url) would pay anyway.

    ``bits_df`` may hold SEVERAL rows per bucket (the warehouse-persisted
    sketch appends one delta bitmap per round): bitmaps OR-merge, so the
    apply folds all of a bucket's versions inside the task that probes
    it — the reader never needs a separate compaction pass to be
    correct (``fold`` in the engine just bounds row growth)."""
    import pandas as pd

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(flag, T.BooleanType(), False)]
    )
    with_bucket = df.withColumn(
        "__bucket",
        F.pmod(F.col(hash_col), F.lit(num_buckets)).cast("int"),
    )
    grouped = with_bucket.groupBy("__bucket").cogroup(
        bits_df.groupBy("bucket")
    )

    def apply(cand: pd.DataFrame, blm: pd.DataFrame) -> pd.DataFrame:
        cand = cand.drop(columns=["__bucket"])
        if cand.empty:
            return cand.assign(**{flag: pd.Series([], dtype=bool)})
        if blm.empty:  # no bitmap for this bucket ⇒ nothing seen
            return cand.assign(**{flag: False})
        bits = or_fold_bits(blm["bits"])
        filt = BloomFilter(
            num_bits=int(blm["num_bits"].iloc[0]),
            num_hashes=int(blm["num_hashes"].iloc[0]),
            bits=bits,
        )
        h = cand[hash_col].to_numpy().astype(np.uint64)
        return cand.assign(**{flag: filt.contains_vec(h)})

    return grouped.applyInPandas(apply, out_schema)


def with_bloom_flag(
    df: DataFrame, hash_col: str, bloom: "BloomFilter | BucketedBloom", flag: str = "maybe_seen"
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
    bloom: "BloomFilter | BucketedBloom | None",
    persist_handles: list[DataFrame] | None = None,
) -> DataFrame:
    """candidates LEFT ANTI seen, with the Bloom pre-filter routing
    definite-news around the shuffle. Falls back to a plain anti-join
    when no bloom is supplied.

    ``persist_handles``: when given, the flagged intermediate is
    persisted (it feeds both the definite-new and the maybe branch —
    without a cache the Arrow flag pass runs twice) and appended to the
    list so the caller can unpersist after materializing."""
    if bloom is None:
        return candidates.join(seen.select(keys), keys, "left_anti")
    flagged = with_bloom_flag(candidates, hash_col, bloom)
    if persist_handles is not None:
        flagged = flagged.persist()
        persist_handles.append(flagged)
    definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = maybe.join(seen.select(keys), keys, "left_anti")
    return definite_new.unionByName(checked)
