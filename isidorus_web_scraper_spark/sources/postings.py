"""Posting-list search index: probe instead of scan.

The reference's search is an OpenSearch inverted index
(`workers/indexer/repositories/opensearch_repository.go:23-56`); our
`plans/api.py:search_pages` is a full ``contains()`` scan over pages —
correct, but at 100 TB every query rescans the corpus. This module is
the Spark-native inverted index:

- **build**: tokenize + explode + hash-aggregate → one row per
  (term, doc) with its frequency (the classic posting list; the same
  shape as ``plans/api.py:term_frequency``, which the reference's
  schema carries with no writer — init.sql:15-21);
- **layout**: Hive-partitioned by ``term_bucket =
  pmod(xxhash64(term), B)`` — a term probe reads 1/B of the index via
  Catalyst partition pruning (`PartitionFilters: [term_bucket = b]`),
  never the corpus;
- **probe**: filter the one bucket, then ``term = t`` inside it. Score
  is served straight from the index (frequency); highlight snippets
  need content and remain a point-retrieval of the FEW matched docs
  (broadcast semi-join), not a corpus scan.

The index is DERIVED data: appends per crawl round are plain parquet
appends (no warehouse commit protocol), and a torn write is repaired by
``rebuild`` from the pages table — the Iceberg analog would make these
appends transactional too, but losing an index never loses truth.

File-count budget: each round's write repartitions by term_bucket, so a
round adds ~1 file per touched bucket; an R-round crawl would leave ~R
files per bucket and a probe would open ~R files. ``compact_postings``
bounds that (the OpenSearch segment-merge analog —
`workers/indexer/repositories/opensearch_repository.go:23-56` never
pays per-round read costs because the engine folds segments
continuously): COMPLETED rounds fold into a per-bucket compacted store
(``compact-<hex>/term_bucket=B/``, one file per bucket, ``round``
demoted to a data column so the highlights join still works), and a
small meta pointer records ``folded_upto_round``. Readers take
compacted ∪ live-rounds-beyond-the-fold, so a probe opens O(1) files
per bucket regardless of crawl length. The (round, term_bucket) LIVE
layout stays load-bearing for exactly the rounds that can still roll
back: partial-round rollback = remove the round dir, and the fold only
ever covers rounds whose metrics committed (same bound rule as the
warehouse's W3 compaction). The meta swap is atomic (tmp +
``os.replace``); a crash mid-fold leaves the old pointer valid and the
reader's ``round > folded_upto_round`` filter makes folded-but-not-yet-
deleted round dirs invisible — no double counting.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TERM_BUCKETS = 64
_META = "_postings_meta.json"


def _term_bucket(term, buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(buckets)).cast("int")


def build_postings(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(ids..., text) → (ids..., term, frequency, term_bucket).

    Tokenization matches ``search_pages``'s TF definition (lowercase,
    split on single spaces) so index-served scores equal scan-served
    scores exactly."""
    return (
        df.select(
            *id_cols,
            F.explode(F.split(F.lower(F.col(text_col)), " ", -1)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(*id_cols, "term")
        .agg(F.count("*").alias("frequency"))
        .withColumn("term_bucket", _term_bucket(F.col("term"), buckets))
    )


def write_postings(
    postings: DataFrame,
    path: str,
    mode: str = "append",
    partition_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned append (one pass per crawl round). The
    repartition co-locates each bucket's rows so a round adds ~1 file
    per touched bucket instead of tasks×buckets tiny files. The engine
    passes ``["round", "term_bucket"]`` so a partial round rolls back
    by removing its ``round=N`` directory."""
    cols = partition_cols or ["term_bucket"]
    (
        postings.repartition("term_bucket")
        .write.partitionBy(*cols)
        .mode(mode)
        .parquet(path)
    )


def _read_meta(path: str) -> dict:
    p = os.path.join(path, _META)
    if not os.path.exists(p):
        return {"compact_dirs": [], "folded_upto_round": -1}
    with open(p) as f:
        meta = json.load(f)
    if "compact_dirs" not in meta:  # single-store layout (pre-leveled)
        meta["compact_dirs"] = [meta["compact_dir"]] if meta.get("compact_dir") else []
    return meta


def _swap_meta(path: str, meta: dict) -> None:
    p = os.path.join(path, _META)
    tmp = p + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)  # atomic on POSIX


def _live_round_dirs(path: str, above_round: int) -> list[tuple[int, str]]:
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = re.fullmatch(r"round=(\d+)", d)
        if m and int(m.group(1)) > above_round:
            out.append((int(m.group(1)), os.path.join(path, d)))
    return sorted(out)


def read_postings(spark: SparkSession, path: str) -> DataFrame:
    """The full index = compacted stores ∪ live (unfolded) round dirs.
    Live dirs are enumerated explicitly with ``basePath`` so ``round``
    stays a partition column AND folded-but-not-yet-GC'd dirs (crash
    window) are excluded by the ``folded_upto_round`` bound — never
    read twice. All scans partition-prune on ``term_bucket``.

    Several compacted stores can coexist (leveled: each periodic pass
    folds only the NEW rounds — W3's refold_compacted=False analog —
    so an R-round crawl holds ≤ R/K stores mid-crawl and finalize
    collapses them to one)."""
    meta = _read_meta(path)
    parts: list[DataFrame] = []
    for d in meta["compact_dirs"]:
        parts.append(spark.read.parquet(os.path.join(path, d)))
    live = _live_round_dirs(path, meta["folded_upto_round"])
    if live:
        parts.append(
            spark.read.option("basePath", path).parquet(
                *[p for (_r, p) in live]
            )
        )
    # bucket-only layout (no per-round rollback unit — standalone index
    # builds outside the crawl engine): term_bucket dirs sit at the root
    if os.path.isdir(path):
        tb = [
            os.path.join(path, d)
            for d in os.listdir(path)
            if re.fullmatch(r"term_bucket=\d+", d)
        ]
        if tb:
            parts.append(spark.read.option("basePath", path).parquet(*tb))
    if not parts:
        return spark.createDataFrame(
            [],
            "scraping_id long, url string, user_id long, round int, "
            "term string, frequency long, term_bucket int",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_postings(
    spark: SparkSession, path: str, upto_round: int, refold: bool = True
) -> None:
    """Fold completed rounds (≤ ``upto_round``) into a fresh per-bucket
    store — the OpenSearch segment-merge analog. ``round`` becomes a
    data column inside the folded files (probes and the highlights join
    read it unchanged); the live ``round=N`` dirs stay the rollback
    unit for rounds beyond the fold.

    ``refold=False`` (the engine's periodic cadence, W3's
    refold_compacted=False analog) folds ONLY the new rounds into an
    ADDITIONAL store: each pass's I/O is the K new rounds, so total
    periodic I/O stays linear in data written, at the cost of ≤ R/K
    coexisting stores mid-crawl. ``refold=True`` (finalize) also reads
    the existing stores and collapses everything to ONE store — one
    file per bucket regardless of crawl length.

    Crash-safe without the warehouse's commit machinery (the index is
    derived data): the meta pointer swap is atomic; before the swap
    readers see the old pointer + old live dirs, after it the
    ``folded_upto_round`` filter hides the folded dirs even if their
    GC below never ran."""
    meta = _read_meta(path)
    folded = meta["folded_upto_round"]
    live = [
        (r, p) for (r, p) in _live_round_dirs(path, folded) if r <= upto_round
    ]
    old_dirs = meta["compact_dirs"]
    if not live and not (refold and len(old_dirs) > 1):
        return
    parts: list[DataFrame] = []
    if live:
        parts.append(
            spark.read.option("basePath", path).parquet(
                *[p for (_r, p) in live]
            )
        )
    doomed_dirs = old_dirs if refold else []
    for d in doomed_dirs:
        parts.append(spark.read.parquet(os.path.join(path, d)))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    new_dir = f"compact-{uuid.uuid4().hex}"
    (
        df.repartition("term_bucket")
        .write.partitionBy("term_bucket")
        .parquet(os.path.join(path, new_dir))
    )
    kept = [] if refold else list(old_dirs)
    _swap_meta(
        path,
        {
            "compact_dirs": kept + [new_dir],
            "folded_upto_round": max(upto_round, folded),
        },
    )
    # GC after the swap: failures leave orphans readers already ignore
    for d in doomed_dirs:
        shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    for _r, p in live:
        shutil.rmtree(p, ignore_errors=True)
    surviving = set(kept + [new_dir])
    for d in os.listdir(path):  # orphaned folds from crashed attempts
        if d.startswith("compact-") and d not in surviving:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def buckets_of(spark: SparkSession, terms: list[str], buckets: int) -> list[int]:
    """The distinct term_bucket ids of ``terms`` — ONE tiny driver job
    (shared by every multi-term probe: gram candidates, BM25, phrase,
    and plans/api's AND search; the bucket list feeds a partition-
    pruning IN filter)."""
    return sorted(
        {
            int(r.b)
            for r in spark.createDataFrame(
                [(t,) for t in terms], "term string"
            )
            .select(_term_bucket(F.col("term"), buckets).alias("b"))
            .collect()
        }
    )


def probe_postings(
    spark: SparkSession,
    path: str,
    term: str,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """Read ONLY the term's bucket (partition pruning), then match the
    term inside it. ``.explain`` shows ``PartitionFilters:
    [term_bucket = <b>]`` — pinned by tests/test_postings.py."""
    t = term.lower()
    b = spark.range(1).select(_term_bucket(F.lit(t), buckets)).first()[0]
    return (
        read_postings(spark, path)
        .filter(F.col("term_bucket") == int(b))
        .filter(F.col("term") == t)
        .drop("term_bucket")
    )


# ---------------------------------------------------------------------------
# Character n-gram index: SUBSTRING search served by probe instead of
# scan. The token postings above give OpenSearch-analyzer (whole-token)
# parity; `plans/api.py:search_pages` is substring `contains()` — the
# classic way to index that is a trigram index (the design behind
# PostgreSQL pg_trgm and Google Code Search): index every distinct
# character 3-gram of each document; a query term of length ≥ 3 matches
# a doc only if the doc contains ALL of the term's 3-grams, so the
# candidate set = an AND-intersection of a handful of posting lists,
# then the FEW candidates are verified (and scored/highlighted) by
# point-retrieval — never a corpus scan. Grams are necessary, not
# sufficient ("abc…cde" contains grams of "abcde" without the
# substring), hence the verify step; terms shorter than the gram length
# keep the scan path (documented fence in search_pages_indexed_substring).
#
# The store REUSES the token-postings machinery wholesale — same
# (round, term_bucket) Hive layout (rollback = round-dir remove), same
# read_postings union, same compact_postings fold — because a gram row
# IS a posting row with term = the gram and frequency = 1 (distinct
# grams per doc; frequency is meaningless for AND-candidacy). Size is
# the known trigram trade-off: O(text bytes) rows before dedup, ~1 row
# per distinct (doc, gram) after — bigger than token postings but still
# linear, and shuffled/pruned identically.
# ---------------------------------------------------------------------------


def build_grams(
    df: DataFrame,
    id_cols: list[str],
    text_cols: list[str],
    n: int = 3,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(ids..., texts...) → (ids..., term=<n-gram>, frequency=1,
    term_bucket): one row per DISTINCT character n-gram across the given
    text columns (content + summary both feed the same gram set —
    ``search_pages`` matches either). Pure JVM higher-order functions:
    sequence → substr → array_distinct → explode; no Python touches a
    byte of text."""

    def grams(colname: str):
        c = F.lower(F.coalesce(F.col(colname), F.lit("")))
        # guard: sequence(1, len-n+1) with len < n would DESCEND
        return F.when(
            F.length(c) >= n,
            F.transform(
                F.sequence(F.lit(1), F.length(c) - (n - 1)),
                lambda i: c.substr(i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    allg = F.array_distinct(F.concat(*[grams(c) for c in text_cols]))
    return (
        df.select(*id_cols, F.explode(allg).alias("term"))
        .withColumn("frequency", F.lit(1).cast("long"))
        .withColumn("term_bucket", _term_bucket(F.col("term"), buckets))
    )


def probe_gram_candidates(
    spark: SparkSession,
    path: str,
    term: str,
    n: int = 3,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """Docs containing ALL of ``term``'s n-grams — the candidate
    superset for substring verification. Reads only the grams' buckets
    (partition pruning on an IN-list, one driver action computes the
    bucket ids with the same xxhash64 the writer used), then
    AND-intersects inside them with one hash aggregate: count distinct
    matched grams == number of query grams. Group keys = every id
    column the store carries (term/frequency/term_bucket are the only
    posting columns)."""
    t = term.lower()
    gs = sorted({t[i : i + n] for i in range(len(t) - n + 1)})
    if not gs:
        raise ValueError(f"term shorter than gram length {n}: {term!r}")
    bs = buckets_of(spark, gs, buckets)
    idx = (
        read_postings(spark, path)
        .filter(F.col("term_bucket").isin(bs))
        .filter(F.col("term").isin(gs))
    )
    group_cols = [
        c for c in idx.columns if c not in ("term", "frequency", "term_bucket")
    ]
    return (
        idx.groupBy(*group_cols)
        .agg(F.count_distinct("term").alias("_matched"))
        .filter(F.col("_matched") == len(gs))
        .drop("_matched")
    )



# ---------------------------------------------------------------------------
# BM25 served FROM the index (round 5): ranking without a corpus scan.
# The scan-path twin (dataset_queries.bm25_search) recomputes tf/dl/df
# from text per query; here every input comes from stores written at
# index-build time: tf from the probed term buckets, df by counting
# rows within them, dl from a (doc, dl) side store, and (N, sum_dl)
# from a meta file maintained incrementally on append — so a query
# touches only the query terms' buckets plus the doc-length join.
# OpenSearch does exactly this (per-segment postings + norms + global
# stats); the reference never scans documents to rank
# (`opensearch_repository.go:23-56`).
# ---------------------------------------------------------------------------

_DOCLEN_META = "_doclen_meta.json"


def write_doclens(
    df: DataFrame, id_cols: list[str], text_col: str, path: str
) -> None:
    """(ids..., dl) side store + {n, sum_dl} meta, written once at
    index build. dl = size(split(lower(text), ' ')) — the SAME token
    rule as build_postings WITHOUT the empty-token filter, because BM25
    length normalization counts positions, not distinct terms. Appends
    at scale add rows and bump the meta counters; this sandbox only
    needs the build-once shape."""
    dl = df.select(
        *id_cols,
        F.size(F.split(F.lower(F.col(text_col)), " ", -1)).alias("dl"),
    )
    dl.write.mode("overwrite").parquet(os.path.join(path, "doclens"))
    # aggregate the just-written store, not the source lineage — the
    # tokenize pass over the corpus runs once, the stats read a narrow
    # int column back
    row = (
        dl.sparkSession.read.parquet(os.path.join(path, "doclens"))
        .agg(F.count("*").alias("n"), F.sum("dl").alias("sum_dl"))
        .first()
    )
    meta_path = os.path.join(path, _DOCLEN_META)
    tmp = meta_path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"n": int(row["n"]), "sum_dl": int(row["sum_dl"])}, f)
    os.replace(tmp, meta_path)


def probe_bm25(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """Top-k (ids..., bm25) for a multi-term query, index-only:
    partition-pruned probe of the terms' buckets, df collected as ≤
    len(terms) driver-side ints (folded into the score expression as
    literals), dl joined from the side store, per-term contributions
    summed in the fixed ``terms`` order (bit-stable), top-k via
    TakeOrderedAndProject."""
    with open(os.path.join(path, _DOCLEN_META)) as f:
        meta = json.load(f)
    n, avgdl = meta["n"], meta["sum_dl"] / meta["n"]
    ts = [t.lower() for t in terms]
    # pivot on the DE-DUPED term list (duplicate terms would make two
    # identically-named columns and an ambiguous-reference error); the
    # contribution sum below still runs over the original `ts`, so a
    # repeated query term contributes twice — matching the scan path
    uniq = list(dict.fromkeys(ts))
    bs = buckets_of(spark, uniq, buckets)
    idx = (
        read_postings(spark, path)
        .filter(F.col("term_bucket").isin(bs))
        .filter(F.col("term").isin(uniq))
    )
    id_cols = [
        c
        for c in idx.columns
        if c not in ("term", "frequency", "term_bucket", "round")
    ]
    df_counts = {
        r.term: int(r.df)
        for r in idx.groupBy("term")
        .agg(F.count_distinct(*id_cols).alias("df"))
        .collect()
    }  # ≤ len(terms) rows — bounded driver-side set
    piv = (
        idx.groupBy(*id_cols)
        .pivot("term", uniq)
        .agg(F.first("frequency"))
    )
    dl = spark.read.parquet(os.path.join(path, "doclens"))
    joined = piv.join(dl, id_cols)

    def contrib(t: str):
        dft = df_counts.get(t, 0)
        idf = F.log(F.lit(1) + (F.lit(n) - dft + 0.5) / (F.lit(dft) + 0.5))
        tf = F.coalesce(F.col(f"`{t}`"), F.lit(0)).cast("double")
        norm = tf + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
        return idf * tf * (k1 + 1) / norm

    score = contrib(ts[0])
    for t in ts[1:]:
        score = score + contrib(t)
    return (
        joined.select(*id_cols, F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), *id_cols)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Positional postings (round 5): phrase search served by the index —
# the OpenSearch match_phrase analog (its postings carry positions for
# exactly this). A phrase "t0 t1 … tk" matches where the terms appear
# at CONSECUTIVE token positions; with per-(doc, term) sorted position
# arrays that's one array intersection: occurrence starts =
# pos(t0) ∩ (pos(t1)−1) ∩ … ∩ (pos(tk)−k). Probe reads only the phrase
# terms' buckets (same pruning as every other probe here), and the
# intersection runs as JVM higher-order array ops over the ≤ k pivoted
# rows per candidate doc — no content is read at all.
# ---------------------------------------------------------------------------


def build_positional_postings(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(ids..., text) → (ids..., term, positions sorted array<int>,
    term_bucket). Same tokenizer as build_postings (lowercase, split on
    single spaces, empty tokens dropped but POSITIONS COUNT THEM — the
    position is the token index in the full split, so phrase adjacency
    is judged on the original token stream)."""
    toks = df.select(
        *id_cols,
        F.posexplode(F.split(F.lower(F.col(text_col)), " ", -1)).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    return (
        toks.groupBy(*id_cols, "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .withColumn("term_bucket", _term_bucket(F.col("term"), buckets))
    )


def probe_phrase(
    spark: SparkSession,
    path: str,
    phrase: str,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(ids..., n_occurrences) for docs containing the exact phrase:
    bucket-pruned probe of the phrase's terms, pivot to one row per
    candidate doc, shift each term's positions back by its offset and
    intersect. Duplicate phrase terms ("do it do it") are handled by
    intersecting the SAME position array at two offsets."""
    ts = [t for t in phrase.lower().split(" ") if t != ""]
    if not ts:
        raise ValueError("empty phrase")
    uniq = sorted(set(ts))
    bs = buckets_of(spark, uniq, buckets)
    idx = (
        read_postings(spark, path)
        .filter(F.col("term_bucket").isin(bs))
        .filter(F.col("term").isin(uniq))
    )
    id_cols = [
        c
        for c in idx.columns
        if c not in ("term", "positions", "term_bucket", "round")
    ]
    piv = idx.groupBy(*id_cols).pivot("term", uniq).agg(F.first("positions"))
    def _shift(off: int):
        # closure factory: F.transform infers HOF arity from the
        # lambda's parameter count, so default-arg binding would turn
        # the lambda into an (element, index) callback
        return lambda p: p - off

    starts = None
    for off, t in enumerate(ts):
        shifted = F.transform(F.col(f"`{t}`"), _shift(off))
        starts = shifted if starts is None else F.array_intersect(starts, shifted)
    n = F.size(starts)
    return (
        piv.dropna()  # a doc missing any phrase term cannot match
        .select(*id_cols, n.alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def probe_near(
    spark: SparkSession,
    path: str,
    term_a: str,
    term_b: str,
    k: int = 3,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(ids..., min_dist, n_pairs) for docs where ``term_a`` and
    ``term_b`` co-occur within ``k`` token positions — NEAR/k served
    by the positional postings (the OpenSearch match_phrase slop
    analog). Candidates are docs holding BOTH terms (pivot + dropna on
    two bucket-pruned posting rows); the pairwise distances are JVM
    higher-order array ops over the two occurrence-sized position
    arrays, so document content is never read.

    Scale shape: the probe reads ≤2/B of the index (partition pruning
    on the two terms' buckets); per-candidate work is |pos_a|·|pos_b|
    on in-task arrays — bounded by the per-doc occurrence counts the
    tokenizer already capped, never a corpus join."""
    a, b = term_a.lower(), term_b.lower()
    if a == b:
        raise ValueError("proximity terms must differ (use probe_postings)")
    bs = buckets_of(spark, [a, b], buckets)
    idx = (
        read_postings(spark, path)
        .filter(F.col("term_bucket").isin(bs))
        .filter(F.col("term").isin([a, b]))
    )
    id_cols = [
        c
        for c in idx.columns
        if c not in ("term", "positions", "term_bucket", "round")
    ]
    piv = idx.groupBy(*id_cols).pivot("term", [a, b]).agg(F.first("positions"))
    pa, pb = F.col(f"`{a}`"), F.col(f"`{b}`")
    within = F.flatten(
        F.transform(
            pa,
            lambda x: F.filter(
                F.transform(pb, lambda y: F.abs(x - y)),
                lambda d: d <= F.lit(k),
            ),
        )
    )
    return (
        piv.dropna()  # a doc missing either term has no pairs
        .select(
            *id_cols,
            F.array_min(within).alias("min_dist"),
            F.size(within).alias("n_pairs"),
        )
        .filter(F.col("n_pairs") > 0)
    )
