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

Semantics: a refcounted MULTISET, the standard deletable-cuckoo
contract — one fingerprint stored per insert, one removed per delete.
The engine inserts one row per (scraping, url) claim and deletes one
per claim row, so shared URLs survive another scraping's deletion
(set-idempotent inserts would turn those deletes into false negatives,
which ``prefiltered_anti_join``'s definite-new branch never re-checks).
On overflow the filter degrades to ``saturated`` (contains_vec →
all-True) rather than raising: pessimistic but exact, and a resumed
crawl isn't wedged by rebuilding the same over-capacity sketch.

Scale position: a single ``CuckooFilter`` covers the moderate-scale
warehouse (driver-side inserts, bounded by ``max_items``). Past that,
``BucketedCuckoo`` shards by ``hash % B`` exactly like
``operators.bloom.BucketedBloom``: cuckoo tables are NOT OR-mergeable,
but shards are DISJOINT by construction (each hash routes to exactly
one shard), so a distributed build assembles each shard independently
on executors (``build_bucketed_cuckoo`` — groupBy-bucket applyInPandas,
the shuffle moves hashes once) and the apply can run cogrouped
(``with_cuckoo_flag_cogrouped``) with each task holding exactly ONE
shard's table — no driver collect, no global broadcast: the 10^10-URL
deletable-sketch path. Deletes route to their shard driver-side.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

_log = logging.getLogger(__name__)

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
    saturated: bool = False   # over capacity → degrade to all-maybe-seen

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
        if self.saturated:
            # Degraded mode: answer maybe-seen for everything. Pure
            # pre-filter pessimism — the exact anti-join stays
            # authoritative, so correctness is preserved; only the
            # shuffle-skip optimization is lost.
            return np.ones(len(hashes), dtype=bool)
        fp, b1, b2 = self._fp_and_buckets(np.asarray(hashes))
        fpc = fp[:, None]
        return ((self.table[b1] == fpc) | (self.table[b2] == fpc)).any(axis=1)

    def insert_vec(self, hashes: np.ndarray) -> None:
        """MULTISET insert: one fingerprint stored per element, even for
        repeats (the standard deletable-cuckoo contract — Fan et al. §3:
        "to delete safely, an item must have been inserted once per
        deletion"). This is load-bearing, not waste: the engine inserts
        one row per (scraping, url) CLAIM and ``forget_scraping``
        deletes one per claim row, so a URL claimed by scrapings A and B
        holds two fingerprint copies and deleting A's leaves B's intact.
        A set-semantics (idempotent) insert would let A's delete evict
        the shared fingerprint and hand B's URL to the definite-new
        branch of ``prefiltered_anti_join`` — which BYPASSES the exact
        anti-join — i.e. a false negative, the one error class the crawl
        can't absorb. ``count``/``load_factor`` therefore track claim
        rows, and ``sized_for`` must be fed expected CLAIMS. A single
        fingerprint can occupy at most 8 slots (2 buckets × 4); past 8
        claims of one URL the insert saturates the filter (gracefully,
        below).

        On table overflow the filter DEGRADES instead of raising: it
        marks itself ``saturated`` and ``contains_vec`` answers all-True
        from then on. That is pure pre-filter pessimism — membership
        truth is always the exact anti-join — whereas an exception
        mid-crawl (after the round's commits are written) would wedge
        the crawl permanently, since resume rebuilds the same
        over-capacity filter and raises again. A dropped insert is still
        impossible: either the fingerprint is stored or the whole filter
        is pessimistic (no FALSE NEGATIVES either way)."""
        if len(hashes) == 0 or self.saturated:
            return
        fp, b1, b2 = self._fp_and_buckets(np.asarray(hashes))
        t = self.table
        rng = np.random.default_rng(0xC0FFEE)  # deterministic kick choice
        for i in range(len(fp)):
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
                self.saturated = True
                _log.warning(
                    "cuckoo filter over capacity (%d items, %d slots) — "
                    "degrading to all-maybe-seen (exactness preserved; the "
                    "anti-join is authoritative). Raise bloom_expected_urls "
                    "or switch to the sharded Bloom for sets this big.",
                    self.count,
                    self.num_buckets * _SLOTS,
                )
                return
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


@dataclass
class BucketedCuckoo:
    """B independent cuckoo shards keyed by floored ``hash % B`` (the
    SAME bucket function as BucketedBloom / the cogrouped apply's
    ``pmod`` — a mismatch would probe the wrong shard and manufacture
    false negatives). API-compatible with :class:`CuckooFilter`
    (insert_vec / contains_vec / delete_vec), so every engine apply
    path accepts either. Shards saturate independently: one hot shard
    degrading to all-maybe-seen leaves the other B-1 exact."""

    num_shards: int
    shards: list[CuckooFilter]

    @classmethod
    def sized_for(cls, expected_items: int, num_shards: int) -> "BucketedCuckoo":
        per = max(1, -(-expected_items // num_shards))
        return cls(
            num_shards=num_shards,
            shards=[CuckooFilter.sized_for(per) for _ in range(num_shards)],
        )

    @property
    def count(self) -> int:
        return sum(s.count for s in self.shards)

    @property
    def saturated(self) -> bool:
        return any(s.saturated for s in self.shards)

    def _shard_of(self, h: np.ndarray) -> np.ndarray:
        from .bloom import _floored_bucket

        return _floored_bucket(h, self.num_shards)

    def insert_vec(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h = np.asarray(hashes)
        b = self._shard_of(h)
        for shard in np.unique(b):
            self.shards[shard].insert_vec(h[b == shard])

    def contains_vec(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = np.asarray(hashes)
        b = self._shard_of(h)
        out = np.zeros(len(h), dtype=bool)
        for shard in np.unique(b):
            mask = b == shard
            out[mask] = self.shards[shard].contains_vec(h[mask])
        return out

    def delete_vec(self, hashes: np.ndarray) -> int:
        if len(hashes) == 0:
            return 0
        h = np.asarray(hashes)
        b = self._shard_of(h)
        return sum(
            self.shards[shard].delete_vec(h[b == shard]) for shard in np.unique(b)
        )


def build_bucketed_cuckoo(
    df, hash_col: str, num_shards: int, expected_items: int
) -> BucketedCuckoo:
    """Distributed sharded build: hashes shuffle ONCE to their shard's
    task; each task assembles its shard's whole table (shards are
    disjoint, so no merge problem despite cuckoo tables not being
    OR-mergeable); the driver collects B small tables, never raw rows.
    This is what a resume-time rebuild over a 10^10-row seen table runs
    instead of the single-filter driver insert loop."""
    import pandas as pd
    from pyspark.sql import functions as F

    per = max(1, -(-expected_items // num_shards))
    B = num_shards

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        ck = CuckooFilter.sized_for(per)
        ck.insert_vec(pdf["h"].to_numpy())
        return pd.DataFrame(
            {
                "bucket": [int(pdf["b"].iloc[0])],
                "num_buckets": [ck.num_buckets],
                "count": [ck.count],
                "saturated": [ck.saturated],
                "table": [ck.table.tobytes()],
            }
        )

    rows = (
        df.select(F.col(hash_col).alias("h"))
        .withColumn("b", F.pmod(F.col("h"), F.lit(B)).cast("int"))
        .groupBy("b")
        .applyInPandas(
            build_shard,
            "bucket int, num_buckets long, count long, saturated boolean, "
            "table binary",
        )
        .collect()
    )
    built = {r.bucket: r for r in rows}
    shards = []
    for i in range(B):
        r = built.get(i)
        if r is None:
            shards.append(CuckooFilter.sized_for(per))
        else:
            shards.append(
                CuckooFilter(
                    num_buckets=int(r.num_buckets),
                    table=np.frombuffer(r.table, dtype=np.uint16)
                    .reshape(-1, _SLOTS)
                    .copy(),
                    count=int(r["count"]),
                    saturated=bool(r.saturated),
                )
            )
    return BucketedCuckoo(num_shards=B, shards=shards)


def cuckoo_table_df(ck: BucketedCuckoo, spark):
    """Materialize a BucketedCuckoo as a (bucket, num_buckets, saturated,
    table) DataFrame — the form the cogrouped apply consumes (and the
    shape a persistent warehouse-backed sketch table would take)."""
    rows = [
        (i, s.num_buckets, bool(s.saturated), bytes(s.table.tobytes()))
        for i, s in enumerate(ck.shards)
    ]
    return spark.createDataFrame(
        rows, "bucket int, num_buckets long, saturated boolean, table binary"
    )


def with_cuckoo_flag_cogrouped(
    df, hash_col: str, table_df, num_shards: int, flag: str = "maybe_seen"
):
    """Per-shard cuckoo apply with NO broadcast and NO driver collect —
    the twin of bloom.with_bloom_flag_cogrouped: candidates cogroup with
    the (bucket, table) frame, each task holds exactly one shard's
    table. The candidate shuffle is keyed the same way the downstream
    seen anti-join shuffles, so it is not an extra pass at scale.

    ``table_df`` may hold several VERSIONS of a shard (the
    warehouse-persisted sketch appends a full updated shard per round —
    cuckoo tables don't OR-merge, so versions supersede rather than
    fold): when a ``seq`` column is present the apply probes the
    highest-seq row only."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(flag, T.BooleanType(), False)]
    )
    with_bucket = df.withColumn(
        "__bucket", F.pmod(F.col(hash_col), F.lit(num_shards)).cast("int")
    )
    grouped = with_bucket.groupBy("__bucket").cogroup(table_df.groupBy("bucket"))

    def apply(cand: pd.DataFrame, tbl: pd.DataFrame) -> pd.DataFrame:
        cand = cand.drop(columns=["__bucket"])
        if cand.empty:
            return cand.assign(**{flag: pd.Series([], dtype=bool)})
        if tbl.empty:  # no shard built ⇒ nothing seen in this bucket
            return cand.assign(**{flag: False})
        row = tbl.loc[current_shard_idx(tbl)]
        ck = CuckooFilter(
            num_buckets=int(row.num_buckets),
            table=np.frombuffer(row.table, dtype=np.uint16).reshape(-1, _SLOTS),
            saturated=bool(row.saturated),
        )
        h = cand[hash_col].to_numpy()
        return cand.assign(**{flag: ck.contains_vec(h)})

    return grouped.applyInPandas(apply, out_schema)


def current_shard_idx(tbl):
    """Index label of a shard's LIVE version among appended rows:
    max-``seq`` when the warehouse-sketch seq column exists (appended
    versions supersede — cuckoo tables don't OR-merge), else the single
    row. The ONE supersede rule, shared by the cogrouped reader, the
    distributed updater, and the engine's fold — reader, writer and
    compactor cannot drift."""
    return tbl["seq"].idxmax() if "seq" in tbl.columns else tbl.index[0]


# warehouse-persisted sketch row shape: one full shard table per
# version; `seq` is a warehouse-wide monotonically increasing write
# counter (rounds, deletes and folds each claim the next value), so
# "current shard" = max-seq row per bucket with no reliance on
# file-read order or round-number ties.
CUCKOO_SKETCH_SCHEMA = (
    "bucket int, num_buckets long, count long, saturated boolean, "
    "table binary, seq long"
)


def update_cuckoo_shards(
    hashes_df,
    sketch_df,
    num_shards: int,
    expected_per_shard: int,
    seq: int,
    op: str = "insert",
):
    """Distributed shard update — the warehouse-persisted sketch's write
    path (VERDICT r4 item 1: the driver never holds the sketch). The
    batch's hashes cogroup with the current sketch rows per bucket; each
    task folds its bucket to the latest version (max ``seq``), applies
    the insert/delete batch with the same :class:`CuckooFilter` code the
    driver path uses, and emits ONE updated full-shard row stamped
    ``seq``. Untouched buckets emit nothing (their old max-seq row stays
    current), so the per-round write volume is touched-shards only.

    Cuckoo tables don't OR-merge, so versions SUPERSEDE: readers (and
    the engine's fold) keep only the max-seq row per bucket. Reference
    analog: Redis holding the seen set out-of-process
    (workers/scraper/repositories/redis_client.go:44-50) — here the
    \"Redis\" is the warehouse table and the update is one cogrouped
    Spark pass."""
    import pandas as pd
    from pyspark.sql import functions as F

    B = num_shards
    hcol = hashes_df.columns[0]
    with_bucket = hashes_df.select(F.col(hcol).alias("h")).withColumn(
        "b", F.pmod(F.col("h"), F.lit(B)).cast("int")
    )
    # pre-filter the sketch side to the batch's touched buckets (≤ B
    # ints, bounded driver-side set): without it the cogroup shuffles
    # the ENTIRE sketch table just so untouched buckets can emit
    # nothing (review finding, round 5). A big crawl round's uniform
    # hashes touch every bucket (the filter is then a no-op IN-list),
    # but tail rounds, forget_scraping deletes, and small incremental
    # batches touch few — those stop paying O(sketch table) shuffle
    # per update. Buckets with hashes but no sketch row still cogroup
    # (the left side carries them) and seed a fresh filter, unchanged.
    touched = [
        int(r.b) for r in with_bucket.select("b").distinct().collect()
    ]
    sketch_touched = sketch_df.filter(F.col("bucket").isin(touched))
    grouped = with_bucket.groupBy("b").cogroup(sketch_touched.groupBy("bucket"))

    def apply(h_pdf: pd.DataFrame, s_pdf: pd.DataFrame) -> pd.DataFrame:
        if h_pdf.empty:  # untouched bucket: current version stays
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int32"),
                    "num_buckets": pd.Series([], dtype="int64"),
                    "count": pd.Series([], dtype="int64"),
                    "saturated": pd.Series([], dtype="bool"),
                    "table": pd.Series([], dtype=object),
                    "seq": pd.Series([], dtype="int64"),
                }
            )
        bucket = int(h_pdf["b"].iloc[0])
        if s_pdf.empty:
            ck = CuckooFilter.sized_for(expected_per_shard)
        else:
            row = s_pdf.loc[current_shard_idx(s_pdf)]
            ck = CuckooFilter(
                num_buckets=int(row.num_buckets),
                table=np.frombuffer(row.table, dtype=np.uint16)
                .reshape(-1, _SLOTS)
                .copy(),
                count=int(row["count"]),
                saturated=bool(row.saturated),
            )
        h = h_pdf["h"].to_numpy()
        if op == "insert":
            ck.insert_vec(h)
        elif op == "delete":
            ck.delete_vec(h)
        else:
            raise ValueError(f"unknown op {op!r}")
        return pd.DataFrame(
            {
                "bucket": [bucket],
                "num_buckets": [ck.num_buckets],
                "count": [ck.count],
                "saturated": [ck.saturated],
                "table": [ck.table.tobytes()],
                "seq": [seq],
            }
        )

    return grouped.applyInPandas(apply, CUCKOO_SKETCH_SCHEMA)
