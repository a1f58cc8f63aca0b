"""Training-data-pipeline operators over documents/embeddings.

Beyond the reference's own surface (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs — each expressed
Spark-first with a DuckDB oracle where SQL-expressible:

- deduplication: exact (hash-groupBy), MinHash+LSH banding, SimHash,
  n-gram Jaccard, embedding-cosine near-dup;
- similarity search: brute-force cosine top-k; sign-LSH bucketed ANN;
- text analysis: language-ID heuristic, quality scoring, token
  counting, document fingerprinting;
- events: tumbling-window aggregation, JSON prop extraction.

Hash functions are md5-based so Spark and DuckDB agree bit-for-bit
(md5 is standardized; xxhash64 is Spark-private). Cross-engine float
compares round to 5 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .driver_queries import query
from .sources.testdata import load

# ---------------------------------------------------------------------------
# shared column builders
# ---------------------------------------------------------------------------


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a bigint — engine-portable hash.
    DuckDB twin: ('0x' || substr(md5(x),1,15))::BIGINT"""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def words(c: Column) -> Column:
    return F.split(F.lower(c), " ", -1)


def word_ngrams(arr: Column, n: int) -> Column:
    """Word n-grams via slice-comprehension (JVM-side).
    DuckDB twin: [array_to_string(s[i:i+n-1], ' ') for i in range(...)]
    Guarded for short inputs: Spark's sequence(1, 0) counts DOWN
    ([1, 0] — then slice(arr, 0, n) throws), so arrays shorter than n
    return [] explicitly, matching the twin's empty comprehension."""
    return F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ntz_epoch_ms(c: Column) -> Column:
    """Milliseconds since 1970-01-01 00:00 of a TIMESTAMP_NTZ as pure
    wall-clock arithmetic — NO session-timezone interpretation.
    ``ntz.cast("timestamp")`` reads the wall-clock in the session zone,
    which shifts by the DST step for pairs straddling a transition (and
    is ambiguous inside fall-back overlaps): in America/New_York,
    01:30→03:30 across 2026-03-08 spring-forward measures 1 h via the
    cast but 2 h wall-clock. DuckDB's ``epoch_ms`` of a naive timestamp
    is zone-free, so only this form matches the oracles in every
    session zone (review finding, round 5)."""
    return F.timestamp_diff(
        "MILLISECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c
    )


# THE cosine expression (single source — functions/vector.py): the
# IVF index's byte-exact oracle parity depends on every consumer
# evaluating the identical expression tree
from .functions.vector import cosine  # noqa: E402,F401


_STOPWORDS = "the a of and to in is for on with"  # fixed tiny list

# ===========================================================================
# Deduplication
# ===========================================================================


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           count(*) AS n_dups,
           min(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) >= 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy, deterministic min-id winner (never
    dropDuplicates — nondeterministic winner under parallelism)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id")
    )


@query(
    "dedup_ngram_jaccard",
    """
    WITH sub AS (
      SELECT doc_id, lang,
             list_distinct([array_to_string(s[i:i+2], ' ')
                            for i in range(1, greatest(len(s) - 2, 0) + 1)]) AS grams
      FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS s
            FROM documents WHERE doc_id % 25 = 0)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / (len(a.grams) + len(b.grams)
                    - len(list_intersect(a.grams, b.grams))), 5) AS jaccard
    FROM sub a JOIN sub b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.grams, b.grams)) > 0
      AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / (len(a.grams) + len(b.grams)
             - len(list_intersect(a.grams, b.grams))) >= 0.2
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs on a same-lang blocked
    subset — the ORACLE COMPANION for the Jaccard arithmetic only. The
    enforced scale path is `dedup_lsh_verified_jaccard` below (LSH-band
    candidates → exact verify); this all-pairs variant exists so the
    verify formula is pinned independently of the candidate generator."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    sub = docs.select(
        "doc_id",
        "lang",
        F.array_distinct(word_ngrams(words(F.col("text")), 3)).alias("grams"),
    )
    a, b = sub.alias("a"), sub.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter((inter > 0) & (jac >= 0.2))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 5).alias("jaccard"),
        )
    )


_MINHASH_K = 8
_LSH_BANDS = 4  # 4 bands × 2 rows

# Universal-hash permutations: ONE md5 per gram (the expensive part),
# then k cheap integer maps h_i = (a_i·h + b_i) mod p (p = 2^31-1,
# h masked to 31 bits so a·h stays inside int64). 8× fewer md5
# invocations than hashing gram||seed per permutation — the minhash
# signature pass is the dedup workhorse at 100 TB. Constants are
# md5-derived module literals so both engines embed identical values.
_MH_PRIME = 2147483647  # 2^31 - 1
_MH_MASK = 2147483647


def _mh_params() -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(_MINHASH_K):
        d = hashlib.md5(f"minhash:{i}".encode()).digest()
        a = (int.from_bytes(d[:4], "big") % (_MH_PRIME - 1)) + 1
        b = int.from_bytes(d[4:8], "big") % _MH_PRIME
        out.append((a, b))
    return out


_MH_PARAMS = _mh_params()


def _minhash_sig_sql() -> str:
    terms = ", ".join(
        f"list_min([({a} * h + {b}) % {_MH_PRIME} for h in hs])"
        for a, b in _MH_PARAMS
    )
    return f"[{terms}]"


_MINHASH_SIG_CTES = f"""
    shingled AS (
      SELECT doc_id,
             list_distinct([array_to_string(s[i:i+2], ' ')
                            for i in range(1, greatest(len(s) - 2, 0) + 1)]) AS grams
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents)
    ),
    hashed AS (
      SELECT doc_id,
             [(('0x' || substr(md5(g), 1, 15))::BIGINT & {_MH_MASK}) for g in grams] AS hs
      FROM shingled WHERE len(grams) > 0
    ),
    minhash AS (
      SELECT doc_id, {_minhash_sig_sql()} AS sig FROM hashed
    ),
    bands AS (
      SELECT doc_id, band,
             md5(array_to_string(sig[band * 2 + 1 : band * 2 + 2], '|')) AS bucket
      FROM minhash, (SELECT unnest(range({_LSH_BANDS})) AS band)
    )
"""


def doc_grams_of(docs: DataFrame) -> DataFrame:
    """(doc_id, text, …) → (doc_id, grams): distinct word trigrams —
    the signature input of every LSH dedup path (batch, incremental,
    and the streaming ingest's per-batch probe)."""
    return docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(words(F.col("text")), 3)).alias("grams"),
    ).filter(F.size("grams") > 0)


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_grams_of over the sf_dir documents table — the shared
    input of the LSH banding pass and the exact-Jaccard verify pass."""
    return doc_grams_of(load(spark, sf_dir, "documents"))


def _lsh_bands(grams: DataFrame) -> DataFrame:
    """(doc_id, grams) → (doc_id, band, bucket) LSH banding rows."""
    # one md5 per gram, then k integer permutations (module comment at
    # _MH_PARAMS) — md5 is the dominant cost of the signature pass
    hashed = grams.select(
        "doc_id",
        F.transform(
            "grams",
            lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10)
            .cast("bigint")
            .bitwiseAND(F.lit(_MH_MASK)),
        ).alias("hs"),
    )
    def _perm(a: int, b: int):
        # closure factory: F.transform infers HOF arity from the
        # lambda's parameter count, so default-arg binding breaks it
        return lambda h: (h * F.lit(a) + F.lit(b)) % _MH_PRIME

    sig = hashed.select(
        "doc_id",
        F.array(
            *[
                F.array_min(F.transform("hs", _perm(a, b)))
                for a, b in _MH_PARAMS
            ]
        ).alias("sig"),
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).cast("long").alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[band * 2 + i].cast("string")
                                    for i in range(2)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for band in range(_LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def _band_pairs(bands: DataFrame) -> DataFrame:
    """Self-join band rows on (band, bucket) → candidate (doc_a, doc_b,
    shared_bands). Shuffle is per-bucket, never all-pairs."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.countDistinct("a.band").alias("shared_bands"))
    )


@query(
    "dedup_minhash_lsh",
    f"""
    WITH {_MINHASH_SIG_CTES}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(DISTINCT a.band) AS shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (md5-based permutations) + banded LSH:
    candidate pairs are docs sharing a band bucket — the scale path for
    near-dup at 10^10 docs (shuffle is per-bucket, never all-pairs)."""
    return _band_pairs(_lsh_bands(_doc_grams(spark, sf_dir)))


# shared by dedup_lsh_verified_jaccard and dedup_clusters — the same
# CTE chain the standalone minhash query uses
_MINHASH_SQL_CTES = _MINHASH_SIG_CTES


@query(
    "dedup_lsh_verified_jaccard",
    f"""
    WITH {_MINHASH_SQL_CTES},
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
             / (len(ga.grams) + len(gb.grams)
                - len(list_intersect(ga.grams, gb.grams))) AS jaccard
      FROM cands c
      JOIN shingled ga ON ga.doc_id = c.doc_a
      JOIN shingled gb ON gb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, round(jaccard, 5) AS jaccard
    FROM verified WHERE jaccard >= 0.2
    """,
)
def dedup_lsh_verified_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE production near-dup pipeline shape, end to end: MinHash-LSH
    banding generates candidates (per-bucket shuffle, never all-pairs),
    exact trigram Jaccard verifies only those candidates. This is the
    enforced scale path that `dedup_ngram_jaccard` (all-pairs on a
    blocked subset) oracle-checks the verify arithmetic for — at 10^10
    docs ONLY this composition runs."""
    from pyspark import StorageLevel

    # grams feed BOTH the banding pass and the verify join; bands feed
    # both sides of the candidate self-join. Persisting each runs the
    # parse+trigram scan and the md5-per-gram minhash pass ONCE instead
    # of three times (2 band sides + verify). MEMORY_AND_DISK spills at
    # 100 TB; at that scale this is the difference between one and three
    # full-corpus tokenize passes. The caches deliberately outlive this
    # call (the returned frame is lazy — unpersisting here would undo
    # the sharing): one-shot sessions (bench, the driver gate) release
    # them at exit, Spark evicts them LRU under storage pressure, and a
    # long-lived session that wants the memory back immediately calls
    # spark.catalog.clearCache() after collecting (as the plan-pin test
    # does).
    grams = _doc_grams(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    bands = _lsh_bands(grams).persist(StorageLevel.MEMORY_AND_DISK)
    cands = _band_pairs(bands).select("doc_a", "doc_b").distinct()
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    jac = inter.cast("double") / union
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .filter(jac >= 0.2)
        .select("doc_a", "doc_b", F.round(jac, 5).alias("jaccard"))
    )


@query(
    "dedup_simhash",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    wh AS (
      SELECT doc_id, word, count(*) AS cnt,
             ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
      FROM w GROUP BY doc_id, word
    ),
    sums AS (
      SELECT doc_id,
             sum(CASE WHEN (h >> 0) & 1 = 1 THEN cnt ELSE -cnt END) AS b0,\n             sum(CASE WHEN (h >> 1) & 1 = 1 THEN cnt ELSE -cnt END) AS b1,\n             sum(CASE WHEN (h >> 2) & 1 = 1 THEN cnt ELSE -cnt END) AS b2,\n             sum(CASE WHEN (h >> 3) & 1 = 1 THEN cnt ELSE -cnt END) AS b3,\n             sum(CASE WHEN (h >> 4) & 1 = 1 THEN cnt ELSE -cnt END) AS b4,\n             sum(CASE WHEN (h >> 5) & 1 = 1 THEN cnt ELSE -cnt END) AS b5,\n             sum(CASE WHEN (h >> 6) & 1 = 1 THEN cnt ELSE -cnt END) AS b6,\n             sum(CASE WHEN (h >> 7) & 1 = 1 THEN cnt ELSE -cnt END) AS b7,\n             sum(CASE WHEN (h >> 8) & 1 = 1 THEN cnt ELSE -cnt END) AS b8,\n             sum(CASE WHEN (h >> 9) & 1 = 1 THEN cnt ELSE -cnt END) AS b9,\n             sum(CASE WHEN (h >> 10) & 1 = 1 THEN cnt ELSE -cnt END) AS b10,\n             sum(CASE WHEN (h >> 11) & 1 = 1 THEN cnt ELSE -cnt END) AS b11,\n             sum(CASE WHEN (h >> 12) & 1 = 1 THEN cnt ELSE -cnt END) AS b12,\n             sum(CASE WHEN (h >> 13) & 1 = 1 THEN cnt ELSE -cnt END) AS b13,\n             sum(CASE WHEN (h >> 14) & 1 = 1 THEN cnt ELSE -cnt END) AS b14,\n             sum(CASE WHEN (h >> 15) & 1 = 1 THEN cnt ELSE -cnt END) AS b15
      FROM wh GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN b0 > 0 THEN 1 ELSE 0 END + CASE WHEN b1 > 0 THEN 2 ELSE 0 END + CASE WHEN b2 > 0 THEN 4 ELSE 0 END + CASE WHEN b3 > 0 THEN 8 ELSE 0 END + CASE WHEN b4 > 0 THEN 16 ELSE 0 END + CASE WHEN b5 > 0 THEN 32 ELSE 0 END + CASE WHEN b6 > 0 THEN 64 ELSE 0 END + CASE WHEN b7 > 0 THEN 128 ELSE 0 END + CASE WHEN b8 > 0 THEN 256 ELSE 0 END + CASE WHEN b9 > 0 THEN 512 ELSE 0 END + CASE WHEN b10 > 0 THEN 1024 ELSE 0 END + CASE WHEN b11 > 0 THEN 2048 ELSE 0 END + CASE WHEN b12 > 0 THEN 4096 ELSE 0 END + CASE WHEN b13 > 0 THEN 8192 ELSE 0 END + CASE WHEN b14 > 0 THEN 16384 ELSE 0 END + CASE WHEN b15 > 0 THEN 32768 ELSE 0 END AS BIGINT) AS simhash
    FROM sums
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc (weighted word hashes) packed into one
    BIGINT — sortable/hashable for the driver compare and how simhash
    is stored in practice. Kept SQL-small (16 bits) so the oracle stays
    exact; the Spark path generalizes to 64 bits by widening the range."""
    docs = load(spark, sf_dir, "documents")
    wh = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", md5_long(F.col("word")))
    )
    bit_sums = wh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
                ).otherwise(-F.col("cnt"))
            ).alias(f"b{b}")
            for b in range(16)
        ]
    )
    packed = None
    for b in range(16):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = bit if packed is None else packed + bit
    return bit_sums.select("doc_id", packed.cast("long").alias("simhash"))


@query(
    "dedup_embedding_cosine",
    """
    WITH sub AS (
      SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 4) AS cos
    FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) > 0.8
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over a subsample — oracle
    companion for the cosine threshold arithmetic. The enforced scale
    path is the multi-table LSH (`ann_lsh_multiprobe` buckets; planted
    near-dups collide with recall 1.0 —
    tests/test_driver_contract.py::test_lsh_planted_neardup_recall)."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    a, b = emb.alias("a"), emb.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos > 0.8)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cos"),
        )
    )


# ===========================================================================
# Similarity search (ANN)
# ===========================================================================


@query(
    "ann_bruteforce_topk",
    """
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding) AS cos
      FROM q JOIN embeddings e ON e.vec_id != q.qid
    )
    SELECT qid, vec_id AS neighbor, round(cos, 4) AS cos
    FROM (
      SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the correctness baseline): broadcast
    the query set, score JVM-side, window top-k per query."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = F.broadcast(q).join(emb, F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        cosine(F.col("qe"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", F.col("vec_id").alias("neighbor"), F.round("cos", 4).alias("cos"))
    )


@query(
    "ann_lsh_topk",
    """
    WITH b AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM b WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding) AS cos
      FROM q JOIN b e ON e.bucket = q.bucket AND e.vec_id != q.qid
    )
    SELECT qid, vec_id AS neighbor, round(cos, 4) AS cos
    FROM (
      SELECT qid, vec_id, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the scale path): candidates restricted to
    the query's hyperplane-sign bucket — per-bucket shuffle instead of
    all-pairs. Bucket = sign bits of the first 3 dims (a fixed, known
    hyperplane set keeps the oracle exact; random projections are a
    config away)."""
    emb = load(spark, sf_dir, "embeddings")
    bucket = (
        F.when(F.col("embedding")[0] > 0, 4).otherwise(0)
        + F.when(F.col("embedding")[1] > 0, 2).otherwise(0)
        + F.when(F.col("embedding")[2] > 0, 1).otherwise(0)
    )
    b = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(b, ["bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("qe"), F.col("embedding")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", F.col("vec_id").alias("neighbor"), F.round("cos", 4).alias("cos"))
    )


# ---------------------------------------------------------------------------
# Multi-table multi-probe sign-LSH: the production ANN path. L=8 hash
# tables × k=10 deterministic ±1 hyperplanes each (80 planes total,
# md5-seeded module constants embedded in BOTH engines' plans) over
# integer-quantized vectors — floor(x*1000) keeps every projection an
# exact integer in double arithmetic, so bucket bits agree bit-for-bit
# across Spark and DuckDB. Candidates = OR over tables of same-bucket
# points, plus the k Hamming-1 probes per table; scan fraction ≈
# L·(k+1)/2^k ≈ 8.6% of the corpus (vs n/8 for the 3-plane oracle twin
# above) — the OR-construction is what makes recall tunable (add
# tables) while each table stays sublinear. Measured on this synthetic
# corpus (isotropic random embeddings, mean top-1 cos 0.37 — a
# worst case for any LSH): recall@5 = 0.34 at 8.9% candidates ≈ 3.8×
# better than random sampling; on planted near-duplicates (cos ≥ 0.99,
# the dedup workload) table collision recall is 1.0
# (tests/test_driver_contract.py::test_lsh_planted_neardup_recall).
# ---------------------------------------------------------------------------

_N_TABLES = 8
_K_PLANES = 10
_EMB_DIM = 64


def _plane_weights() -> list[list[list[float]]]:
    import hashlib

    return [
        [
            [
                1.0
                if hashlib.md5(f"plane:{t}:{j}:{i}".encode()).digest()[0] % 2 == 0
                else -1.0
                for i in range(_EMB_DIM)
            ]
            for j in range(_K_PLANES)
        ]
        for t in range(_N_TABLES)
    ]


_PLANES = _plane_weights()
_PROBE_MASKS = [0] + [1 << j for j in range(_K_PLANES)]  # self + Hamming-1


def _quantized_col(emb: Column) -> Column:
    return F.transform(emb, lambda x: F.floor(x.cast("double") * 1000).cast("double"))


def _bucket_cols_from_qv(qv: Column) -> list[Column]:
    """One bucket per hash table over a quantized vector column.
    (Runtime dedup of the shared quantize step is handled by codegen
    subexpression elimination either way — the split exists for plan
    readability; wall time is dominated by compiling the L×k-plane
    generated method, amortized at real row counts.)"""
    out = []
    for table in _PLANES:
        bucket = F.lit(0)
        for j, w in enumerate(table):
            warr = F.array(*[F.lit(v) for v in w])
            proj = F.aggregate(
                F.zip_with(qv, warr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        out.append(bucket)
    return out


def _bucket_cols(emb: Column) -> list[Column]:
    """One bucket per hash table, all from a single quantized vector."""
    return _bucket_cols_from_qv(_quantized_col(emb))


def _buckets_sql() -> str:
    """DuckDB twin: [bucket_t0, bucket_t1, ...] list expression."""
    tables = []
    for table in _PLANES:
        terms = []
        for j, w in enumerate(table):
            lit = "[" + ",".join(str(v) for v in w) + "]"
            terms.append(
                f"CASE WHEN list_dot_product(qv, {lit}) > 0 THEN {1 << j} ELSE 0 END"
            )
        tables.append("(" + " + ".join(terms) + ")")
    return "[" + ", ".join(tables) + "]"


_MULTIPROBE_SQL_BODY = f"""
    q0 AS (
      SELECT vec_id, embedding,
             list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS qv
      FROM embeddings
    ),
    bkt AS (
      SELECT vec_id, embedding, {{buckets_expr}} AS buckets FROM q0
    ),
    data_side AS (
      SELECT vec_id, t, buckets[t + 1] AS bucket
      FROM bkt, range({_N_TABLES}) r(t)
    ),
    probes AS (
      SELECT vec_id AS qid, t, xor(buckets[t + 1], m.mask) AS pb
      FROM bkt, range({_N_TABLES}) r(t),
           unnest({_PROBE_MASKS}) AS m(mask)
      WHERE vec_id < 10
    ),
    cand AS (
      SELECT DISTINCT p.qid, d.vec_id
      FROM probes p JOIN data_side d ON d.t = p.t AND d.bucket = p.pb
      WHERE d.vec_id != p.qid
    ),
    scored AS (
      SELECT c.qid, c.vec_id,
             list_cosine_similarity(q.embedding, e.embedding) AS cos
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.qid
      JOIN embeddings e ON e.vec_id = c.vec_id
    ),
    mp_topk AS (
      SELECT qid, vec_id, cos FROM (
        SELECT qid, vec_id, cos,
               row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    )
"""


def _multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    bkt = emb.select(
        "vec_id", "embedding", _quantized_col(F.col("embedding")).alias("qv")
    ).select(
        "vec_id",
        "embedding",
        F.array(*_bucket_cols_from_qv(F.col("qv"))).alias("buckets"),
    )
    data_side = bkt.select(
        "vec_id", F.posexplode("buckets").alias("t", "bucket")
    )
    probes = bkt.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.posexplode("buckets").alias("t", "b0"),
    ).select(
        "qid",
        "t",
        F.explode(
            F.array(*[F.col("b0").bitwiseXOR(F.lit(m)) for m in _PROBE_MASKS])
        ).alias("pb"),
    )
    # a candidate can collide in several tables/probes → DISTINCT before
    # the (expensive) cosine scoring; probe side is tiny → broadcast
    cand = (
        F.broadcast(probes)
        .join(data_side, (probes.t == data_side.t) & (probes.pb == data_side.bucket))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    qe = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "qid")
        .select("qid", "vec_id", cosine(F.col("qe"), F.col("embedding")).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "cos")
    )


@query(
    "ann_lsh_multiprobe",
    "WITH "
    + _MULTIPROBE_SQL_BODY.format(buckets_expr=_buckets_sql())
    + """
    SELECT qid, vec_id AS neighbor, round(cos, 4) AS cos FROM mp_topk
    """,
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table multi-probe sign-LSH top-5 (see module comment
    above) — the production ANN path; `ann_lsh_topk` (3 fixed planes)
    stays as the simpler oracle companion."""
    return _multiprobe_topk(spark, sf_dir).select(
        "qid", F.col("vec_id").alias("neighbor"), F.round("cos", 4).alias("cos")
    )


@query(
    "ann_multiprobe_recall",
    "WITH "
    + _MULTIPROBE_SQL_BODY.format(buckets_expr=_buckets_sql())
    + """
    , bf AS (
      SELECT qid, vec_id FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                          e.vec_id
               ) AS rn
        FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rn <= 5
    )
    SELECT count(*) AS n_truth,
           CAST(sum(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN m.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*), 4) AS recall_at_5
    FROM bf LEFT JOIN mp_topk m ON m.qid = bf.qid AND m.vec_id = bf.vec_id
    """,
)
def ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the multi-probe LSH vs exact brute force — the
    quality metric that justifies the approximate path (reported in
    BENCH/BASELINE.md; oracle-checked so the number itself is pinned)."""
    bf = ann_bruteforce_topk(spark, sf_dir).select("qid", F.col("neighbor").alias("vec_id"))
    mp = _multiprobe_topk(spark, sf_dir).select("qid", "vec_id").withColumn(
        "hit", F.lit(1)
    )
    joined = bf.join(mp, ["qid", "vec_id"], "left")
    return joined.agg(
        F.count("*").alias("n_truth"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))) / F.count("*"), 4
        ).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# IVF-flat ANN: the other classic scale path (inverted file index).
# Coarse quantizer = 1/50 sampled vectors as centroids (sampled-centroid
# IVF keeps everything deterministic — no float-order-dependent k-means
# means — so the oracle is exact); every vector lands in the cell of its
# nearest centroid; queries probe the nprobe=2 nearest cells and search
# them exactly. At 10^10 vectors with C=sqrt(n) cells this scans
# ~2·sqrt(n) candidates per query, and the cell assignment is one
# broadcast-join pass (n × C cosine compares, embarrassingly parallel).
# ---------------------------------------------------------------------------


@query(
    "ann_ivf_topk",
    """
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 50 = 0
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS qid, embedding AS qe, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < 10
      ) WHERE rn <= 2
    )
    SELECT qid, vec_id AS neighbor, round(cos, 4) AS cos FROM (
      SELECT q.qid, a.vec_id,
             list_cosine_similarity(q.qe, a.embedding) AS cos,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY list_cosine_similarity(q.qe, a.embedding) DESC, a.vec_id
             ) AS rn
      FROM qprobe q JOIN assign a ON a.cid = q.cid AND a.vec_id != q.qid
    ) WHERE rn <= 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat top-5: broadcast the (small) centroid set, window-pick
    each vector's cell, probe the query's 2 nearest cells, exact cosine
    within them. Cells are the shuffle key — never all-pairs."""
    emb = load(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "cid",
        cosine(F.col("embedding"), F.col("ce")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "embedding", "cid")
    qprobe = (
        ranked.filter((F.col("vec_id") < 10) & (F.col("rn") <= 2))
        .select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"), "cid"
        )
    )
    cand = (
        F.broadcast(qprobe)
        .join(assign, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("qe"), F.col("embedding")).alias("cos"))
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 5)
        .select("qid", F.col("vec_id").alias("neighbor"), F.round("cos", 4).alias("cos"))
    )


@query(
    "ann_ivf_recall",
    """
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id % 50 = 0
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
      ) WHERE rn = 1
    ),
    qprobe AS (
      SELECT vec_id AS qid, embedding AS qe, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.embedding, c.ce) DESC, c.cid
               ) AS rn
        FROM embeddings e CROSS JOIN cent c
        WHERE e.vec_id < 10
      ) WHERE rn <= 2
    ),
    ivf AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, a.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qe, a.embedding) DESC,
                          a.vec_id
               ) AS rn
        FROM qprobe q JOIN assign a ON a.cid = q.cid AND a.vec_id != q.qid
      ) WHERE rn <= 5
    ),
    bf AS (
      SELECT qid, vec_id FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
                          e.vec_id
               ) AS rn
        FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rn <= 5
    )
    SELECT count(*) AS n_truth,
           CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           round(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*), 4) AS recall_at_5
    FROM bf LEFT JOIN ivf i ON i.qid = bf.qid AND i.vec_id = bf.vec_id
    """,
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF-flat (nprobe=2) vs exact brute force — the same
    pinned quality metric ann_multiprobe_recall provides for the LSH
    path, closing the IVF family: topk + oracle-exact recall. On
    isotropic synthetic embeddings nprobe=2 over ~n/50 cells bounds the
    quality floor; real corpora cluster and read higher."""
    bf = ann_bruteforce_topk(spark, sf_dir).select(
        "qid", F.col("neighbor").alias("vec_id")
    )
    ivf = ann_ivf_topk(spark, sf_dir).select(
        "qid", F.col("neighbor").alias("vec_id")
    ).withColumn("hit", F.lit(1))
    joined = bf.join(ivf, ["qid", "vec_id"], "left")
    return joined.agg(
        F.count("*").alias("n_truth"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))) / F.count("*"), 4
        ).alias("recall_at_5"),
    )


@query(
    "events_sessionization",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                   OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                  THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    numbered AS (
      SELECT user_id, ts,
             CAST(sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS sess_id
      FROM marked
    )
    SELECT user_id, sess_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, sess_id
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH sessionization (30-min gap), the exact batch twin of the
    streaming applyInPandasWithState operator (streaming/events.py
    `sessionized` — same gap rule, same ordering). With this entry the
    loop closes three ways: stream == batch (pytest) and batch == SQL
    (this oracle). Classic lag → gap-flag → running-sum session ids —
    two window passes, one shuffle by user."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # millisecond epochs in BOTH engines: second-truncated casts would
    # disagree with DuckDB's fractional epoch at exact-gap boundaries;
    # zone-free NTZ arithmetic so DST session zones can't skew gaps
    ms = ntz_epoch_ms(F.col("ts"))
    gap = ms - F.lag(ms).over(w)
    marked = events.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1_800_000), 1).otherwise(0)
    )
    numbered = marked.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )


@query(
    "events_dedup_first_wins",
    """
    WITH ranked AS (
      SELECT user_id, event_type, event_id, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, event_type) AS n_total
      FROM events
    )
    SELECT user_id, event_type,
           event_id AS first_event_id, ts AS first_ts,
           CAST(n_total - 1 AS BIGINT) AS n_dropped
    FROM ranked WHERE rn = 1
    """,
)
def events_dedup_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH twin of the streaming dedup (streaming/events.py
    `dedup_stream`, dropDuplicatesWithinWatermark): first event per key
    wins, later arrivals are dropped — the reference's Redis seen-set
    first-wins semantics (`workers/scraper/repositories/redis_client.go:
    44-50`) in event form. Keyed on (user_id, event_type) so the synthetic
    events table actually HAS duplicates to drop; ties broken by
    (ts, event_id) for determinism. With this oracle plus the
    stream==batch parity pytest, the streaming operator's loop closes the
    same way sessionization's does."""
    events = load(spark, sf_dir, "events")
    keyw = Window.partitionBy("user_id", "event_type")
    w = keyw.orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .withColumn("n_total", F.count("*").over(keyw))
        .filter("rn = 1")
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            (F.col("n_total") - F.lit(1)).alias("n_dropped"),
        )
    )


# ===========================================================================
# Training-data pipeline: decontamination, PII scrubbing, sampling,
# near-dup clustering — the ops a 100-TB corpus build runs after dedup.
# ===========================================================================


@query(
    "decontaminate_benchmark",
    """
    WITH bench AS (
      SELECT doc_id, unnest(list_distinct(
               [array_to_string(s[i:i+4], ' ')
                for i in range(1, greatest(len(s) - 4, 0) + 1)])) AS gram
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents WHERE doc_id % 97 = 0)
    ),
    corpus AS (
      SELECT doc_id, unnest(list_distinct(
               [array_to_string(s[i:i+4], ' ')
                for i in range(1, greatest(len(s) - 4, 0) + 1)])) AS gram
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents WHERE doc_id % 97 != 0)
    )
    SELECT c.doc_id, count(DISTINCT c.gram) AS n_overlapping_grams
    FROM corpus c JOIN bench b ON b.gram = c.gram AND b.doc_id != c.doc_id
    GROUP BY c.doc_id
    """,
)
def decontaminate_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    5-gram with a held-out benchmark set (stand-in: every 97th doc).
    The join key is the GRAM (explode + hash-join) — per-gram shuffle,
    never doc-pairs. No forced broadcast: real benchmark sets are tiny
    (AQE broadcasts them from runtime size), but the stand-in is ~1% of
    the corpus — exploded to 5-grams that could be ~1 TB at 100 TB scale,
    and a hard-coded F.broadcast would model an executor OOM."""
    docs = load(spark, sf_dir, "documents")
    grams5 = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams(words(F.col("text")), 5))
        ).alias("gram"),
    )
    bench = grams5(docs.filter(F.col("doc_id") % 97 == 0))
    corpus = grams5(docs.filter(F.col("doc_id") % 97 != 0))
    return (
        corpus.join(bench.withColumnRenamed("doc_id", "bench_id"), "gram")
        .filter(F.col("bench_id") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_overlapping_grams"))
    )


@query(
    "pii_scrub",
    """
    WITH seeded AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 7 = 0
                          THEN ' contact user' || doc_id::VARCHAR ||
                               '@example.com or +1-555-01' ||
                               lpad((doc_id % 100)::VARCHAR, 2, '0')
                          ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           length(text) - length(
             regexp_replace(
               regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                              '<EMAIL>', 'g'),
               '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4,6}', '<PHONE>', 'g')
           ) AS bytes_redacted_delta,
           length(regexp_extract(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', 0))
             AS email_len
    FROM seeded
    WHERE doc_id % 7 = 0
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, phone numbers → placeholder tokens) as
    pure JVM regexp_replace — the redaction pass a training-corpus build
    runs over every document. PII is injected deterministically so the
    oracle can verify the exact redaction arithmetic."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or +1-555-01"),
                    F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4,6}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_re, "<EMAIL>"),
        phone_re,
        "<PHONE>",
    )
    return seeded.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        (F.length("text") - F.length(scrubbed)).alias("bytes_redacted_delta"),
        F.length(F.regexp_extract("text", email_re, 0)).alias("email_len"),
    )


@query(
    "stratified_sample",
    """
    WITH rated AS (
      SELECT doc_id, source,
             CASE source WHEN 'web' THEN 10 WHEN 'wiki' THEN 50
                         WHEN 'books' THEN 80 ELSE 25 END AS pct,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS h
      FROM documents
    )
    SELECT source, count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM rated WHERE h < pct
    GROUP BY source
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (per-source rates, hash-gated
    so reruns pick the SAME rows — reproducible corpus builds, no
    Bernoulli RNG). At 100 TB this is a full-scan filter with zero
    shuffle before the stats rollup."""
    docs = load(spark, sf_dir, "documents")
    pct = (
        F.when(F.col("source") == "web", 10)
        .when(F.col("source") == "wiki", 50)
        .when(F.col("source") == "books", 80)
        .otherwise(25)
    )
    h = md5_long(F.col("doc_id").cast("string")) % 100
    return (
        docs.withColumn("pct", pct)
        .withColumn("h", h)
        .filter(F.col("h") < F.col("pct"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
    )


@query(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_MINHASH_SQL_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS doc_id FROM edges),
    walk(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM verts
      UNION
      SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    )
    SELECT doc_id, min(reach) AS cluster_id,
           CASE WHEN doc_id = min(reach) THEN 1 ELSE 0 END AS keep
    FROM walk GROUP BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERING: connected components over the MinHash-LSH
    pair graph via iterative min-label propagation (run to fixpoint —
    O(component diameter) joins; dup components are shallow by nature).
    keep=1 marks the canonical survivor (min doc_id) per cluster — the
    row a dedup job retains. The DuckDB twin computes true components
    with a recursive CTE, pinning the fixpoint."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return _connected_components(pairs)


def _connected_components(
    pairs: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Min-label propagation over an undirected pair graph, with bounded
    plan depth: every iteration `localCheckpoint`s the labels, so the
    next join starts from a plan-truncated (materialized) DataFrame —
    persist() alone caches data but keeps the FULL lineage, and a deep
    component chain used to compile an N-join plan by iteration N.
    Each round does one hop of neighbor-min plus one pointer-jump
    (lbl ← label(lbl), path halving), so convergence is O(log diameter)
    — a 10^4-node chain needs ~15 rounds, not 10^4. `max_iters` is a
    fuse — raising instead of silently returning half-merged clusters."""
    edges = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        # checkpoint BEFORE the convergence check: the check's join and
        # the next iteration both reread the materialized blocks, and the
        # plan never grows past one iteration's shape
        hopped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias("lbl"),
        )
        # pointer jump: follow the label one more step (lbl ← lbl's own
        # current label). Every lbl IS a vertex id, so the self-join
        # always matches; least() keeps monotonicity.
        new_labels = (
            hopped.alias("a")
            .join(
                hopped.select(
                    F.col("doc_id").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("b"),
                "lbl",
                "left",
            )
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {max_iters} "
            "iterations — component diameter exceeds the label-propagation "
            "budget; use large-star/small-star for graphs this deep"
        )
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        F.when(F.col("doc_id") == F.col("lbl"), 1).otherwise(0).alias("keep"),
    )


@query(
    "dedup_keep_canonical",
    f"""
    WITH RECURSIVE {_MINHASH_SQL_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS doc_id FROM edges),
    walk(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM verts
      UNION
      SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ),
    clusters AS (
      SELECT doc_id, min(reach) AS cluster_id FROM walk GROUP BY doc_id
    ),
    tagged AS (
      SELECT d.lang,
             len(string_split(d.text, ' ')) AS n_words,
             CASE WHEN c.doc_id IS NULL OR c.cluster_id = d.doc_id
                  THEN 1 ELSE 0 END AS kept
      FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(kept) AS BIGINT) AS n_kept,
           CAST(count(*) - sum(kept) AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN kept = 1 THEN n_words ELSE 0 END) AS BIGINT)
             AS kept_words
    FROM tagged GROUP BY lang
    """,
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup pipeline: materialize what a dedup job
    actually ships. Near-dup clusters (LSH pairs → connected
    components) pick one canonical survivor per cluster (min doc_id);
    every unclustered doc survives by definition. Rolls up kept/dropped
    counts and surviving word volume per language — the corpus-level
    accounting a 100-TB dedup run reports. Scale shape: the clusters
    frame holds only docs that appear in a dup pair (dup-fraction ×
    corpus, typically ≪ corpus), so the left join broadcasts or
    AQE-shuffles on the small side; the rollup is a partial-agg
    hash-groupBy on lang."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    clusters = _connected_components(pairs).select("doc_id", "cluster_id")
    docs = load(spark, sf_dir, "documents")
    kept = F.when(
        F.col("cluster_id").isNull()
        | (F.col("cluster_id") == F.col("doc_id")),
        1,
    ).otherwise(0)
    tagged = (
        docs.join(clusters, "doc_id", "left")
        .select(
            "lang",
            F.size(F.split("text", " ", -1)).alias("n_words"),
            kept.alias("kept"),
        )
    )
    return tagged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("kept").alias("n_kept"),
        (F.count("*") - F.sum("kept")).alias("n_dropped"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_words")).otherwise(0)).alias(
            "kept_words"
        ),
    )


@query(
    "corpus_build",
    f"""
    WITH RECURSIVE {_MINHASH_SQL_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS doc_id FROM edges),
    walk(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM verts
      UNION
      SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach
    ),
    clusters AS (
      SELECT doc_id, min(reach) AS cluster_id FROM walk GROUP BY doc_id
    ),
    bench AS (
      SELECT doc_id, unnest(list_distinct(
               [array_to_string(s[i:i+4], ' ')
                for i in range(1, greatest(len(s) - 4, 0) + 1)])) AS gram
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents WHERE doc_id % 97 = 0)
    ),
    corpus AS (
      SELECT doc_id, unnest(list_distinct(
               [array_to_string(s[i:i+4], ' ')
                for i in range(1, greatest(len(s) - 4, 0) + 1)])) AS gram
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents WHERE doc_id % 97 != 0)
    ),
    contam AS (
      SELECT c.doc_id, count(DISTINCT c.gram) AS n_over
      FROM corpus c JOIN bench b ON b.gram = c.gram AND b.doc_id != c.doc_id
      GROUP BY c.doc_id
    ),
    scored AS (
      SELECT doc_id, source, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  w -> list_contains({_STOPWORDS.split()!r}, w)))
                  AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS stopword_ratio
      FROM documents
    ),
    staged AS (
      SELECT s.source, s.lang, s.n_words,
             CASE WHEN s.doc_id % 97 = 0 THEN 'benchmark'
                  WHEN NOT (s.n_words >= 20 AND s.n_chars >= 100
                            AND s.stopword_ratio >= 0.01) THEN 'quality'
                  WHEN cl.cluster_id IS NOT NULL
                       AND cl.cluster_id != s.doc_id THEN 'dup'
                  WHEN coalesce(ct.n_over, 0) >= 5 THEN 'contaminated'
                  ELSE 'kept' END AS stage
      FROM scored s
      LEFT JOIN clusters cl ON cl.doc_id = s.doc_id
      LEFT JOIN contam ct ON ct.doc_id = s.doc_id
    )
    SELECT source, lang, count(*) AS n_total,
           CAST(sum(CASE WHEN stage = 'benchmark' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_benchmark,
           CAST(sum(CASE WHEN stage = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_dropped,
           CAST(sum(CASE WHEN stage = 'dup' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_dropped,
           CAST(sum(CASE WHEN stage = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(sum(CASE WHEN stage = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN stage = 'kept' THEN n_words ELSE 0 END) AS BIGINT)
             AS kept_words
    FROM staged GROUP BY source, lang
    """,
)
def corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE END-TO-END PIPELINE: what a 100-TB training-corpus build
    actually runs, composed from the individually-oracled stages —
    benchmark holdout exclusion → quality gate (T5's thresholds) →
    near-dup canonical dedup (D2 pairs → D7 clusters, min-id survivor)
    → 5-gram decontamination (P1's overlap, drop at ≥5 shared grams) —
    with per-(source, lang) attribution of every drop. Stage rules are
    deterministic and order-fixed, so the whole composition
    value-matches the oracle. Scale shape: each stage is the already-
    audited plan (banded LSH, pointer-jump CC, gram-key shuffle); the
    final attribution is two small-side left joins + a hash rollup."""
    docs = load(spark, sf_dir, "documents")
    warr = F.split("text", " ", -1)
    n_words = F.size(warr)
    stop_ratio = (
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " ", -1),
                lambda w: F.array_contains(
                    F.array(*[F.lit(s) for s in _STOPWORDS.split()]), w
                ),
            )
        ).cast("double")
        / F.greatest(n_words, F.lit(1))
    )
    quality_ok = (
        (n_words >= 20) & (F.col("n_chars") >= 100) & (stop_ratio >= 0.01)
    )
    clusters = _connected_components(
        dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    ).select("doc_id", "cluster_id")
    contam = decontaminate_benchmark(spark, sf_dir).select(
        "doc_id", F.col("n_overlapping_grams").alias("n_over")
    )
    staged = (
        docs.select(
            "doc_id", "source", "lang", "n_chars", "text",
            n_words.alias("n_words"),
            quality_ok.alias("quality_ok"),
        )
        .join(clusters, "doc_id", "left")
        .join(contam, "doc_id", "left")
        .select(
            "source",
            "lang",
            "n_words",
            F.when(F.col("doc_id") % 97 == 0, "benchmark")
            .when(~F.col("quality_ok"), "quality")
            .when(
                F.col("cluster_id").isNotNull()
                & (F.col("cluster_id") != F.col("doc_id")),
                "dup",
            )
            .when(F.coalesce("n_over", F.lit(0)) >= 5, "contaminated")
            .otherwise("kept")
            .alias("stage"),
        )
    )
    def n(stage: str, col: str) -> Column:
        src = F.when(F.col("stage") == stage, F.col(col) if col else 1).otherwise(0)
        return F.sum(src).cast("bigint")

    return staged.groupBy("source", "lang").agg(
        F.count("*").alias("n_total"),
        n("benchmark", "").alias("n_benchmark"),
        n("quality", "").alias("n_quality_dropped"),
        n("dup", "").alias("n_dup_dropped"),
        n("contaminated", "").alias("n_contaminated"),
        n("kept", "").alias("n_kept"),
        n("kept", "n_words").alias("kept_words"),
    )


# ===========================================================================
# Multimodal media metadata (S3/S6 oracle coverage)
# ===========================================================================


@query(
    "media_metadata_rollup",
    """
    WITH refs AS (
      SELECT DISTINCT 'http://media.test/m' || (doc_id % 89)::VARCHAR ||
             CASE doc_id % 5 WHEN 0 THEN '.png' WHEN 1 THEN '.jpg?s=1'
                             WHEN 2 THEN '.mp4' WHEN 3 THEN '.wav'
                             ELSE '' END AS media_ref
      FROM documents
    ),
    meta AS (
      SELECT media_ref,
             coalesce(nullif(regexp_extract(media_ref,
               '\\.([A-Za-z0-9]{1,5})(\\?|$)', 1), ''), 'bin') AS ext
      FROM refs
    )
    SELECT CASE ext WHEN 'png' THEN 'image' WHEN 'jpg' THEN 'image'
                    WHEN 'mp4' THEN 'video' WHEN 'wav' THEN 'audio'
                    ELSE 'binary' END AS kind,
           ext,
           CASE ext WHEN 'png' THEN 'image/png' WHEN 'jpg' THEN 'image/jpeg'
                    WHEN 'mp4' THEN 'video/mp4' WHEN 'wav' THEN 'audio/wav'
                    ELSE 'application/octet-stream' END AS content_type,
           count(*) AS n_media,
           CAST(sum(256) AS BIGINT) AS total_bytes
    FROM meta
    GROUP BY 1, 2, 3
    """,
)
def media_metadata_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S6 media path, oracle-checked at the metadata level: refs →
    ``media_table`` (Arrow-batched payload fill + ext/kind/content-type
    inference, operators/multimodal.py) → rollup. The DuckDB twin
    recomputes the metadata rules independently, pinning ext inference
    (`extractor_service.go:109-129`), the kind/content-type maps and the
    deterministic payload sizing; payload BYTES are pinned separately by
    tests/test_multimodal.py (binary columns don't hash portably)."""
    from .operators.multimodal import media_table

    docs = load(spark, sf_dir, "documents")
    ref = F.concat(
        F.lit("http://media.test/m"),
        (F.col("doc_id") % 89).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(".png"))
        .when(F.col("doc_id") % 5 == 1, F.lit(".jpg?s=1"))
        .when(F.col("doc_id") % 5 == 2, F.lit(".mp4"))
        .when(F.col("doc_id") % 5 == 3, F.lit(".wav"))
        .otherwise(F.lit("")),
    )
    media = media_table(docs.select(ref.alias("media_ref")).distinct())
    # unknown ext ⇒ NULL content_type in the table; roll up under the
    # serving default (same fallback data_url_col uses)
    media = media.withColumn(
        "content_type",
        F.coalesce("content_type", F.lit("application/octet-stream")),
    )
    return media.groupBy("kind", "ext", "content_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
    )


# ===========================================================================
# Text analysis
# ===========================================================================


@query(
    "text_quality",
    f"""
    SELECT doc_id,
           n_chars,
           len(string_split(text, ' ')) AS n_words,
           round(CAST(len(list_filter(string_split(lower(text), ' '),
                                      w -> list_contains({_STOPWORDS.split()!r}, w)))
                      AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1), 5) AS stopword_ratio,
           round(CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 5) AS punct_ratio
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: word count, stopword ratio, punctuation ratio —
    the usual pretraining heuristics, all JVM-side."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n_words = F.size(F.split(F.col("text"), " ", -1))
    stop = F.size(
        F.filter(
            ws,
            lambda w: F.array_contains(
                F.array(*[F.lit(s) for s in _STOPWORDS.split()]), w
            ),
        )
    )
    punct = F.length(F.regexp_replace(F.col("text"), "[A-Za-z0-9 ]", ""))
    return docs.select(
        "doc_id",
        "n_chars",
        n_words.alias("n_words"),
        F.round(stop.cast("double") / F.greatest(n_words, F.lit(1)), 5).alias(
            "stopword_ratio"
        ),
        F.round(
            punct.cast("double") / F.greatest(F.length("text"), F.lit(1)), 5
        ).alias("punct_ratio"),
    )


@query(
    "text_repetition",
    """
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sent AS (
      SELECT doc_id,
             [array_to_string(w[i*8+1 : i*8+8], ' ')
              for i in range(0, CAST(ceil(len(w) / 8.0) AS INT))] AS s
      FROM base
    ),
    seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 4 = 0 THEN list_concat(s, s[1:1]) ELSE s END AS s
      FROM sent
    )
    SELECT doc_id,
           CAST(len(s) AS BIGINT) AS n_sents,
           CAST(len(s) - len(list_distinct(s)) AS BIGINT) AS n_dup_sents,
           CASE WHEN (len(s) - len(list_distinct(s))) * 10 <= len(s) * 3
                THEN 1 ELSE 0 END AS keep
    FROM seeded
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of duplicate sentences
    per document (boilerplate/templated pages repeat themselves; >30%
    duplicate sentences ⇒ drop). The flat synthetic text has no sentence
    punctuation, so sentences are seeded deterministically (8-word
    chunks; every 4th doc repeats its first chunk) — identically in both
    engines, like pii_scrub seeds its PII. Integer keep-arithmetic
    (10·dups ≤ 3·sents) avoids float-division hash drift. Pure JVM:
    split + sequence/transform/slice higher-order ops, one columnar
    pass, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ", -1)
    nchunks = F.ceil(F.size(ws) / F.lit(8.0)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(F.slice(ws, i * 8 + 1, 8), " "),
    )
    seeded = F.when(
        F.col("doc_id") % 4 == 0, F.concat(sents, F.slice(sents, 1, 1))
    ).otherwise(sents)
    n = F.size(F.col("s"))
    nd = n - F.size(F.array_distinct(F.col("s")))
    return docs.select("doc_id", seeded.alias("s")).select(
        "doc_id",
        n.cast("long").alias("n_sents"),
        nd.cast("long").alias("n_dup_sents"),
        F.when(nd * 10 <= n * 3, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )


@query(
    "quality_gate",
    f"""
    WITH scored AS (
      SELECT doc_id, source, lang, n_chars,
             len(string_split(text, ' ')) AS n_words,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  w -> list_contains({_STOPWORDS.split()!r}, w)))
                  AS DOUBLE)
               / greatest(len(string_split(text, ' ')), 1) AS stopword_ratio
      FROM documents
    )
    SELECT source, lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN n_words >= 20 AND n_chars >= 100
                          AND stopword_ratio >= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN n_words >= 20 AND n_chars >= 100
                          AND stopword_ratio >= 0.01 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM scored
    GROUP BY source, lang
    """,
)
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed quality FILTER a corpus build actually applies
    (min words, min chars, min stopword ratio — Gopher/C4-style rules),
    rolled up per (source, lang) so the kept/dropped budget per stratum
    is auditable. Pure scan + hash-agg: zero extra shuffle at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n_words = F.size(F.split(F.col("text"), " ", -1))
    stop_ratio = F.size(
        F.filter(
            ws,
            lambda w: F.array_contains(
                F.array(*[F.lit(s) for s in _STOPWORDS.split()]), w
            ),
        )
    ).cast("double") / F.greatest(n_words, F.lit(1))
    keep = (
        (n_words >= 20) & (F.col("n_chars") >= 100) & (stop_ratio >= 0.01)
    ).cast("long")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_total"),
        F.sum(keep).cast("bigint").alias("n_kept"),
        F.sum(keep * F.col("n_chars")).cast("bigint").alias("kept_chars"),
    )


@query(
    "token_histogram",
    """
    SELECT CAST(floor(log2(greatest(len(string_split(text, ' ')), 1))) AS BIGINT)
             AS log2_tokens_bucket,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1
    """,
)
def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution in power-of-two buckets — the corpus
    shape diagnostic every tokenizer-budget plan starts from."""
    docs = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " ", -1))
    bucket = F.floor(F.log2(F.greatest(n_tokens, F.lit(1)))).cast("bigint")
    return docs.groupBy(bucket.alias("log2_tokens_bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).cast("bigint").alias("total_tokens"),
    )


@query(
    "text_tokens",
    r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letters / digits / single punctuation)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ", -1)).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
            )
        ).alias("bpe_ish_tokens"),
    )


@query(
    "text_langid",
    f"""
    SELECT doc_id, lang AS tagged_lang,
           CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                                          w -> list_contains({_STOPWORDS.split()!r}, w)))
                     AS DOUBLE)
                     / greatest(len(string_split(text, ' ')), 1) >= 0.05
                THEN 'en' ELSE 'unknown' END AS detected_lang
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-density n-gram-free classifier
    (deterministic, engine-portable). Real model would be a pandas UDF;
    the plumbing (per-doc classification column) is identical."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n_words = F.size(F.split(F.col("text"), " ", -1))
    stop_ratio = F.size(
        F.filter(
            ws,
            lambda w: F.array_contains(
                F.array(*[F.lit(s) for s in _STOPWORDS.split()]), w
            ),
        )
    ).cast("double") / F.greatest(n_words, F.lit(1))
    return docs.select(
        "doc_id",
        F.col("lang").alias("tagged_lang"),
        F.when(stop_ratio >= 0.05, F.lit("en"))
        .otherwise(F.lit("unknown"))
        .alias("detected_lang"),
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
                 string_split(lower(text), ' '))), ' ')) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct word set
    (order-insensitive near-exact dedup key)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.sort_array(F.array_distinct(words(F.col("text")))))
        ).alias("fingerprint"),
    )


# ===========================================================================
# Events: windowed aggregation + JSON props
# ===========================================================================


@query(
    "events_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation — the batch twin of the
    Structured Streaming query in streaming/ (same plan shape)."""
    events = load(spark, sf_dir, "events")
    # date_trunc on an NTZ column returns a session-tz TIMESTAMP, which
    # PySpark then renders in the SYSTEM tz — output columns must come
    # back to NTZ or any session-tz != system-tz driver shifts them
    return events.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@query(
    "events_sliding_window",
    """
    WITH panes AS (
      SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start,
             event_type, value
      FROM events, (SELECT unnest([0, 1]) AS k)
    )
    SELECT window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM panes
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING windows (size 2 h, slide 1 h) — the overlap shape
    tumbling can't express (trending/rate metrics look at the last K
    hours every hour). Batch twin of streaming.events.sliding_counts;
    tests/test_streaming.py pins a REAL watermarked stream against this
    result.

    Spark assigns each event to size/slide = 2 panes inside the window
    aggregate (an internal explode); the oracle makes the same fan-out
    explicit with unnest([0,1]). Value sums ride DECIMAL(18,2) so the
    overlap's double-counting stays exact in both engines. Scale shape:
    one hash aggregate over a 2× fanned-out frame — map-side partial
    aggregation absorbs the fan-out before the shuffle, so wire cost is
    O(distinct (window, type) per partition), not O(2·|events|)."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 hours", "1 hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            # window on an NTZ column yields NTZ bounds; cast pins the
            # contract if the reader ever infers a zoned timestamp
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_late_data_policy",
    """
    WITH e AS (
      SELECT event_id % 3 AS b, event_type,
             date_trunc('hour', ts) AS ws,
             epoch_ms(date_trunc('hour', ts)) + 3600000 AS wend_ms,
             epoch_ms(ts) AS ts_ms
      FROM events
    ),
    m AS (SELECT b, max(ts_ms) AS mx_ms FROM e GROUP BY b),
    w AS (SELECT b,
            max(mx_ms) OVER (ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
              - 3600000 AS evict_wm,
            max(mx_ms) OVER () - 3600000 AS final_wm
          FROM m),
    t AS (SELECT e.ws, e.event_type, e.wend_ms, w.evict_wm, w.final_wm
          FROM e JOIN w USING (b)),
    k AS (SELECT ws, event_type, count(*) AS n FROM t
          WHERE (evict_wm IS NULL OR wend_ms > evict_wm)
            AND wend_ms <= final_wm
          GROUP BY 1, 2),
    l AS (SELECT ws, event_type, count(*) AS n FROM t
          WHERE evict_wm IS NOT NULL AND wend_ms <= evict_wm
          GROUP BY 1, 2)
    SELECT coalesce(k.ws, l.ws) AS window_start,
           coalesce(k.event_type, l.event_type) AS event_type,
           CAST(coalesce(k.n, 0) AS BIGINT) AS n_events,
           CAST(coalesce(l.n, 0) AS BIGINT) AS n_late
    FROM k FULL OUTER JOIN l ON k.ws = l.ws AND k.event_type = l.event_type
    """,
)
def events_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data ACCOUNTING under Structured Streaming's exact
    micro-batch watermark semantics, as a batch query both engines can
    run: events split into 3 ordered micro-batches (event_id % 3); the
    watermark in effect during batch i is max(event time through batch
    i-1) - 1h; a row is DROPPED iff its hour-window end ≤ the watermark
    in effect during the PREVIOUS batch (the window was evicted at that
    batch's close — a row whose window is still in state always merges,
    however late); append mode emits exactly the windows whose end ≤
    the final watermark. Empirically pinned against a REAL
    streaming query in tests/test_streaming.py: the memory-sink rows
    equal this query's n_events>0 rows and the summed
    numRowsDroppedByWatermark equals Σ n_late — the drop accounting the
    stream itself never surfaces per-window.

    Scale: the watermark table is one 3-row aggregate (broadcast); the
    classify+count pass is a single hash aggregate over the events —
    the policy audit costs one scan regardless of stream length.

    All comparisons run in INTEGER epoch-ms: Spark's watermark is
    millisecond-granular (max event time truncated to ms), so a
    timestamp-typed policy would call a row inside the sub-ms gap
    dropped when the stream kept it (observed: 1 row in 60k at
    sf0.001)."""
    e = load(spark, sf_dir, "events").select(
        (F.col("event_id") % 3).cast("bigint").alias("b"),
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("ws"),
        ntz_epoch_ms(F.col("ts")).alias("ts_ms"),
    )
    e = e.withColumn("wend_ms", ntz_epoch_ms(F.col("ws")) + F.lit(3_600_000))
    m = e.groupBy("b").agg(F.max("ts_ms").alias("mx_ms"))
    # 3-row frame: the single-partition window is free
    wspec = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -2)
    w = m.select(
        "b",
        (F.max("mx_ms").over(wspec) - F.lit(3_600_000)).alias("evict_wm"),
    )
    fin = m.agg((F.max("mx_ms") - F.lit(3_600_000)).alias("final_wm"))
    t = e.join(F.broadcast(w), "b").crossJoin(F.broadcast(fin))
    kept = (
        t.filter(
            (
                F.col("evict_wm").isNull()
                | (F.col("wend_ms") > F.col("evict_wm"))
            )
            & (F.col("wend_ms") <= F.col("final_wm"))
        )
        .groupBy("ws", "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    late = (
        t.filter(
            F.col("evict_wm").isNotNull()
            & (F.col("wend_ms") <= F.col("evict_wm"))
        )
        .groupBy("ws", "event_type")
        .agg(F.count("*").alias("n_late"))
    )
    return (
        kept.join(late, ["ws", "event_type"], "full_outer")
        .select(
            F.col("ws").alias("window_start"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_late", F.lit(0)).alias("n_late"),
        )
    )


@query(
    "events_json_props",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON prop extraction + aggregation."""
    events = load(spark, sf_dir, "events")
    return events.groupBy(
        (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod")
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# A4 term frequency (legacy page_terms table, init.sql:15-21 — schema
# with no remaining writer; resurrected as the classic hash aggregate).
# ---------------------------------------------------------------------------
@query(
    "term_frequency",
    """
    SELECT word AS term, count(*) AS frequency, count(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
          FROM documents)
    WHERE word != ''
    GROUP BY word
    """,
)
def term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(
            F.count("*").alias("frequency"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Politeness budget as a relational operator: ≤K fetches per host per
# round, priority (depth DESC, url ASC) — the window-function rendition
# of the per-host priority queue (operators/politeness.py), here made
# DuckDB-checkable.
# ---------------------------------------------------------------------------
@query(
    "politeness_budget_topk",
    """
    WITH frontier AS (
      SELECT 'h' || (doc_id % 37)::VARCHAR || '.test' AS host,
             'http://h' || (doc_id % 37)::VARCHAR || '.test/p' ||
               doc_id::VARCHAR AS url,
             (doc_id % 3)::INTEGER AS depth
      FROM documents
    )
    SELECT host, url, depth,
           CASE WHEN rn <= 4 THEN 'fetch' ELSE 'defer' END AS action
    FROM (
      SELECT host, url, depth,
             row_number() OVER (PARTITION BY host
                                ORDER BY depth DESC, url) AS rn
      FROM frontier
    )
    """,
)
def politeness_budget_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(F.lit("h"), (F.col("doc_id") % 37).cast("string"), F.lit(".test")).alias("host"),
        F.concat(
            F.lit("http://h"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".test/p"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.col("doc_id") % 3).cast("int").alias("depth"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("depth"), F.asc("url"))
    return frontier.withColumn("rn", F.row_number().over(w)).select(
        "host",
        "url",
        "depth",
        F.when(F.col("rn") <= 4, F.lit("fetch")).otherwise(F.lit("defer")).alias("action"),
    )


# ===========================================================================
# Round-5 additions: temporal joins, substring-level dedup, budgeted
# sampling, rank statistics — the remaining relational shapes a corpus /
# telemetry pipeline hits that none of the queries above exercise.
# ===========================================================================


@query(
    "events_asof_join",
    """
    WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
    views AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT c.event_id AS click_event_id, c.user_id, c.ts AS click_ts,
           v.event_id AS view_event_id, v.ts AS view_ts,
           epoch_ms(c.ts) - epoch_ms(v.ts) AS lag_ms
    FROM clicks c LEFT JOIN LATERAL (
      SELECT event_id, ts FROM views v
      WHERE v.user_id = c.user_id AND v.ts <= c.ts
      ORDER BY ts DESC, event_id DESC LIMIT 1
    ) v ON TRUE
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each click is joined to the SAME user's most recent
    view at-or-before the click (ties on ts broken by max event_id;
    clicks with no prior view keep nulls) — the attribution /
    point-in-time-correctness join Spark has no native operator for.

    Spark-first rendition: union-tag both sides, ONE shuffle on
    user_id, then a running `last(ignorenulls)` window — linear scan
    per user, never the per-row range probe a naive
    `JOIN ... ON v.ts <= c.ts` plans (which Spark executes as a
    broadcast nested loop / cartesian-per-key: quadratic per user and
    un-runnable at 100 TB). At the same ts a view sorts before a click
    (kind 0 < 1) so `v.ts <= c.ts` boundary rows are visible, and
    among equal-ts views the max event_id sorts last — exactly the
    oracle's ORDER BY ts DESC, event_id DESC LIMIT 1."""
    return _asof_plan(load(spark, sf_dir, "events"))


def _asof_plan(events: DataFrame) -> DataFrame:
    """The as-of plan over an arbitrary events frame (separated so
    tests can drive crafted tie/boundary fixtures through the REAL
    plan, not a copy)."""
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("v_event_id"),
        F.col("ts").alias("v_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("v_event_id"),
        # NTZ like the source ts: a plain "timestamp" null would coerce
        # the whole union to session-tz timestamps, shifting collected
        # values on any non-UTC driver session
        F.lit(None).cast("timestamp_ntz").alias("v_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = views.unionByName(clicks).select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last("v_event_id", ignorenulls=True).over(w).alias("view_event_id"),
        F.last("v_ts", ignorenulls=True).over(w).alias("view_ts"),
    )
    return merged.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        "view_event_id",
        "view_ts",
        (
            # per-OPERAND ms truncation (like the oracle's epoch_ms),
            # not diff-then-truncate: .859335−.490348 truncates to
            # .368 as a single diff but 859−490=369 per-operand
            ntz_epoch_ms(F.col("ts")) - ntz_epoch_ms(F.col("view_ts"))
        ).alias("lag_ms"),
    )


@query(
    "events_attribution_join",
    """
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           epoch_ms(p.ts) - epoch_ms(v.ts) AS gap_ms
    FROM events p JOIN events v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND epoch_ms(p.ts) - epoch_ms(v.ts) <= 3600000
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
)
def events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: every (view → purchase) pair of the same user with
    the view in the hour before the purchase — the stream-stream-join
    workload (ad attribution, funnel stitching). The batch plan BINS
    the range like range_join_binned: a purchase's 1-hour lookback
    covers ≤2 hour buckets, so the purchase side explodes into its
    buckets and the join is a plain shuffled hash equi-join on
    (user, bucket) with the exact predicate as a residual — O(matches),
    never a per-user nested loop (which is what the oracle's inequality
    join plans, and what a 10^10-event attribution cannot afford).

    The STREAMING twin (tests/test_streaming.py) runs the same pairing
    as a real watermarked stream-stream interval join — Spark's state
    pruning bounds both sides by the watermark; end state == this batch
    result (pinned)."""
    _purchases, pairs = _attribution_binned(load(spark, sf_dir, "events"))
    return pairs


def _attribution_binned(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The binned attribution plan, shared by the inner and left-outer
    variants: returns (purchases, matched pairs)."""
    hour = lambda c: F.floor(c / F.lit(3_600_000))  # noqa: E731
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        ntz_epoch_ms(F.col("ts")).alias("v_ms"),
    ).withColumn("hr", hour(F.col("v_ms")))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        ntz_epoch_ms(F.col("ts")).alias("p_ms"),
    )
    binned_p = purchases.withColumn(
        "hr",
        F.explode(
            F.sequence(
                hour(F.col("p_ms") - F.lit(3_600_000)), hour(F.col("p_ms"))
            )
        ),
    )
    pairs = (
        binned_p.join(
            views,
            on=[
                binned_p.p_user == views.v_user,
                binned_p.hr == views.hr,
                views.v_ms <= binned_p.p_ms,
                binned_p.p_ms - views.v_ms <= F.lit(3_600_000),
            ],
        )
        .select(
            "purchase_id",
            "view_id",
            (F.col("p_ms") - F.col("v_ms")).alias("gap_ms"),
        )
    )
    return purchases, pairs


@query(
    "events_attribution_left",
    """
    SELECT p.event_id AS purchase_id,
           v.event_id AS view_id,
           epoch_ms(p.ts) - epoch_ms(v.ts) AS gap_ms
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts <= p.ts
     AND epoch_ms(p.ts) - epoch_ms(v.ts) <= 3600000
    """,
)
def events_attribution_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER attribution: every purchase, paired with each view of
    the same user in the prior hour — or a NULL view row if none
    exists (the unattributed-conversion report; inner-join attribution
    silently hides exactly the purchases a marketer most wants to see).

    Plan: the binned inner pairs (shared with events_attribution_join)
    UNION one NULL row per unmatched purchase via a left ANTI join on
    purchase_id — the standard decomposition that keeps the outer
    semantics while the expensive pairing stays a bucketed equi-join
    (a direct left-outer over the EXPLODED purchase side would emit
    one null per bucket, not per purchase). Scale: anti join is
    purchase-keyed, broadcast-able when matches are sparse.

    The STREAMING twin (tests/test_streaming.py) is a real watermarked
    stream-stream LEFT OUTER interval join: Spark emits the NULL rows
    only once the watermark passes a purchase's join window — the test
    appends a future flush sentinel so the finite stream's end state
    equals this batch result exactly."""
    events = load(spark, sf_dir, "events")
    purchases, pairs = _attribution_binned(events)
    unmatched = (
        purchases.join(pairs, "purchase_id", "left_anti")
        .select(
            "purchase_id",
            F.lit(None).cast("long").alias("view_id"),
            F.lit(None).cast("long").alias("gap_ms"),
        )
    )
    return pairs.unionByName(unmatched)


@query(
    "range_join_binned",
    """
    WITH errors AS (
      SELECT event_id AS error_event_id, user_id, ts
      FROM events WHERE event_type = 'error'
    )
    SELECT e.error_event_id, e.user_id, e.ts AS error_ts,
           count(x.event_id) AS n_in_window,
           CAST(coalesce(sum(CAST(x.value AS DECIMAL(18,2))), 0)
                AS DOUBLE) AS total_value
    FROM errors e LEFT JOIN events x
      ON x.user_id = e.user_id
     AND x.ts >= e.ts AND x.ts < e.ts + INTERVAL 1 HOUR
     AND x.event_id != e.error_event_id
    GROUP BY 1, 2, 3
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE join via hour-binning: for every error event, count/sum
    the same user's OTHER events inside [error_ts, error_ts + 1h) —
    the incident-window / interval-overlap join.

    The naive inequality join is what the oracle runs; Spark would
    plan it as a per-key nested loop (every error × every event of
    that user). The scale path BINS the range: each 1-hour window
    covers at most two hour buckets, so exploding the error side into
    its covered buckets and equi-joining on (user_id, hour_bucket)
    turns the plan into a plain shuffled hash join (2 rows per error,
    1 per event) with the exact range predicate applied as a residual
    filter — O(matches), no nested loop, AQE-skew-splittable. Sum runs
    over decimal(18,2) so both engines agree bit-for-bit."""
    return _range_binned_plan(load(spark, sf_dir, "events"))


def _range_binned_plan(events: DataFrame) -> DataFrame:
    """The binned range-join plan over an arbitrary events frame
    (separated for brute-force property tests)."""
    hour = lambda c: F.floor(ntz_epoch_ms(c) / F.lit(3_600_000))  # noqa: E731
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("error_ts"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
    )
    binned_errors = errors.withColumn(
        "hr", F.explode(F.sequence(hour(F.col("win_start")), hour(F.col("win_end"))))
    )
    binned_events = events.withColumn("hr", hour(F.col("ts")))
    matches = (
        binned_errors.join(
            binned_events,
            on=[
                binned_errors.e_user == binned_events.user_id,
                binned_errors.hr == binned_events.hr,
                binned_events.ts >= binned_errors.win_start,
                binned_events.ts < binned_errors.win_end,
                binned_events.event_id != binned_errors.error_event_id,
            ],
        )
        .groupBy("error_event_id")
        .agg(
            F.count("*").alias("n_in_window"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("val"),
        )
    )
    return errors.join(matches, on="error_event_id", how="left").select(
        "error_event_id",
        F.col("e_user").alias("user_id"),
        "error_ts",
        F.coalesce(F.col("n_in_window"), F.lit(0)).alias("n_in_window"),
        F.coalesce(F.col("val").cast("double"), F.lit(0.0)).alias("total_value"),
    )


@query(
    "dedup_exact_substring",
    """
    WITH sh AS (
      SELECT doc_id, unnest([{'pos': i, 'shingle': array_to_string(s[i:i+19], ' ')}
               for i in range(1, greatest(len(s) - 19, 0) + 1)],
               recursive := true)
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s FROM documents)
    ),
    ranked AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY shingle
                                ORDER BY doc_id, pos) AS rn
      FROM sh
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_shingles
      FROM ranked GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_shingles, 0) AS n_shingles,
           coalesce(a.dup_shingles, 0) AS dup_shingles
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup at shingle granularity (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    20-word shingle INSTANCE beyond the globally-first occurrence
    (first = min (doc_id, position)) is a duplicated span; per doc we
    report total instances and duplicated instances — the spans a
    substring-dedup pass would cut, including within-doc repeats.

    Plan: JVM-side sliding shingles (transform+slice, no Python), then
    the first instance per shingle via `min(struct(doc_id, pos))` — a
    hash aggregate that PARTIAL-combines map-side, unlike the oracle's
    row_number window, which would sort every instance of a hot
    shingle (boilerplate text can put one 20-gram in 10^8 docs) inside
    ONE task. The instances then hash-join back to the firsts
    (AQE-skew-splittable) and compare. Never all-pairs. At 100 TB you
    shuffle a 128-bit shingle hash (sha2 prefix) instead of the
    string — same plan shape, ~10 bytes/key; the suffix-array
    construction of the paper is equivalent to this first-instance
    pass for fixed shingle length."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.posexplode(word_ngrams(words(F.col("text")), 20)).alias("pos", "shingle"),
    )
    firsts = sh.groupBy("shingle").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    agg = (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(
                    F.struct("doc_id", "pos") != F.col("first"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("dup_shingles"),
        )
    )
    return docs.select("doc_id").join(agg, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
        F.coalesce(F.col("dup_shingles"), F.lit(0)).alias("dup_shingles"),
    )


TOKEN_BUDGET = 600  # tokens kept per source (the mixture weight knob)


@query(
    "token_budget_sample",
    f"""
    WITH t AS (
      SELECT source, doc_id,
             len(string_split(lower(text), ' ')) AS tok,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM documents
    ),
    c AS (
      SELECT *, coalesce(sum(tok) OVER (PARTITION BY source
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS before_tok
      FROM t
    )
    SELECT source, count(*) AS n_kept,
           CAST(sum(tok) AS BIGINT) AS tokens_kept,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM c WHERE before_tok < {TOKEN_BUDGET}
    GROUP BY source
    """,
)
def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGETED mixture sampling: per source, walk docs in
    deterministic hash order and keep each doc while the tokens
    accumulated BEFORE it are under the budget (so the doc that
    crosses the line is kept, reproducibly) — how corpus builds hit
    per-source token targets rather than per-source row counts.

    The oracle's single window (`sum() OVER (PARTITION BY source ORDER
    BY h)`) puts an entire source in ONE task — a non-starter when one
    source is 30 TB. The Spark plan is the exact TWO-PASS equivalent:
    (1) docs hash into 1024 ORDER-ALIGNED buckets (top 10 bits of the
    60-bit md5 key, so bucket order == hash order) and a tiny
    per-(source, bucket) rollup classifies each bucket — fully kept
    (prev_cum + bucket_tokens <= budget), fully dropped (prev_cum >=
    budget), or boundary; (2) only the ONE boundary bucket per source
    (~1/1024 of the data) pays an exact in-bucket window. Equality
    holds because every doc has >= 1 token, so "all before-sums in a
    fully-kept bucket are < budget" is exact, not approximate."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        "doc_id",
        F.size(words(F.col("text"))).alias("tok"),
        md5_long(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn("bucket", F.shiftright(F.col("h"), 50))
    per_bucket = t.groupBy("source", "bucket").agg(F.sum("tok").alias("btok"))
    wb = Window.partitionBy("source").orderBy("bucket")
    classified = per_bucket.withColumn(
        "prev_cum",
        F.coalesce(
            F.sum("btok").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn(
        "cls",
        F.when(F.col("prev_cum") >= TOKEN_BUDGET, F.lit("drop"))
        .when(F.col("prev_cum") + F.col("btok") <= TOKEN_BUDGET, F.lit("keep"))
        .otherwise(F.lit("boundary")),
    )
    joined = t.join(
        F.broadcast(classified.select("source", "bucket", "prev_cum", "cls")),
        on=["source", "bucket"],
    )
    win = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
    boundary_kept = (
        joined.filter(F.col("cls") == "boundary")
        .withColumn(
            "before_tok",
            F.col("prev_cum")
            + F.coalesce(
                F.sum("tok").over(win.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .filter(F.col("before_tok") < TOKEN_BUDGET)
        .select("source", "doc_id", "tok")
    )
    kept = joined.filter(F.col("cls") == "keep").select(
        "source", "doc_id", "tok"
    )
    return kept.unionByName(boundary_kept).groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("tok").cast("bigint").alias("tokens_kept"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@query(
    "events_value_percentiles",
    """
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                    THEN value END) AS p50,
           max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                    THEN value END) AS p90,
           max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                    THEN value END) AS p99
    FROM r GROUP BY event_type
    """,
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank statistics (nearest-rank / percentile_disc with the
    ceil convention): the kth smallest value per group — no
    interpolation arithmetic, so both engines return the identical
    stored double and the hash compare is exact.

    This exact sort-per-group is the correctness baseline; the 100-TB
    production path is `approx_percentile` (a single-pass mergeable
    KLL/GK sketch, no global sort), which this oracle exists to
    calibrate against. The kth VALUE is order-independent under ties,
    so the window needs no tie-break column."""
    events = load(spark, sf_dir, "events")
    kw = Window.partitionBy("event_type")
    w = kw.orderBy("value")
    r = events.select("event_type", "value").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("n", F.count("*").over(kw))

    def pick(p: float) -> Column:
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        )

    return r.groupBy("event_type").agg(
        pick(0.50).alias("p50"), pick(0.90).alias("p90"), pick(0.99).alias("p99")
    )


def _pagerank_sql() -> str:
    """Five chained PageRank iterations as SQL CTEs over the DIRECTED
    LSH pair graph — all arithmetic in scaled BIGINT (see
    pagerank_dup_graph)."""
    iters = []
    for k in range(1, 6):
        iters.append(
            f"""pr{k} AS (
      SELECT n.doc_id,
             CAST(150000000000 + (85 * coalesce(s.contrib, 0)) // 100
                  AS BIGINT) AS pr
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS doc_id, sum(p.pr // d.outdeg) AS contrib
        FROM edges e
        JOIN pr{k - 1} p ON p.doc_id = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.doc_id = n.doc_id
    )"""
        )
    chain = ",\n    ".join(iters)
    return f"""
    WITH {_MINHASH_SQL_CTES},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs),
    nodes AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs)
    ),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    pr0 AS (SELECT doc_id, CAST(1000000000000 AS BIGINT) AS pr FROM nodes),
    {chain}
    SELECT doc_id, pr FROM pr5
    """


@query(
    "hits_hub_authority",
    """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT doc_id AS src, (2 * doc_id + 1) % (SELECT n FROM nn) AS dst
        FROM documents
        UNION ALL
        SELECT doc_id, (3 * doc_id + 7) % (SELECT n FROM nn) FROM documents
      )
    ),
    nodes AS (SELECT doc_id FROM documents),
    h0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS h FROM nodes),
    a1r AS (SELECT e.dst AS doc_id, sum(h0.h) AS raw
            FROM edges e JOIN h0 ON h0.doc_id = e.src GROUP BY 1),
    a1 AS (SELECT n.doc_id,
                  CAST(coalesce((r.raw * 1000000) //
                       (SELECT max(raw) FROM a1r), 0) AS BIGINT) AS a
           FROM nodes n LEFT JOIN a1r r USING (doc_id)),
    h1r AS (SELECT e.src AS doc_id, sum(a1.a) AS raw
            FROM edges e JOIN a1 ON a1.doc_id = e.dst GROUP BY 1),
    h1 AS (SELECT n.doc_id,
                  CAST(coalesce((r.raw * 1000000) //
                       (SELECT max(raw) FROM h1r), 0) AS BIGINT) AS h
           FROM nodes n LEFT JOIN h1r r USING (doc_id)),
    a2r AS (SELECT e.dst AS doc_id, sum(h1.h) AS raw
            FROM edges e JOIN h1 ON h1.doc_id = e.src GROUP BY 1),
    a2 AS (SELECT n.doc_id,
                  CAST(coalesce((r.raw * 1000000) //
                       (SELECT max(raw) FROM a2r), 0) AS BIGINT) AS a
           FROM nodes n LEFT JOIN a2r r USING (doc_id)),
    h2r AS (SELECT e.src AS doc_id, sum(a2.a) AS raw
            FROM edges e JOIN a2 ON a2.doc_id = e.dst GROUP BY 1),
    h2 AS (SELECT n.doc_id,
                  CAST(coalesce((r.raw * 1000000) //
                       (SELECT max(raw) FROM h2r), 0) AS BIGINT) AS h
           FROM nodes n LEFT JOIN h2r r USING (doc_id))
    SELECT a2.doc_id, a2.a AS authority, h2.h AS hub
    FROM a2 JOIN h2 USING (doc_id)
    """,
)
def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities — PageRank's companion
    centrality, 2 full iterations over the deterministic 2-out link
    graph: authority(i) = Σ hub over in-edges, hub(j) = Σ authority
    over out-edges, renormalized each half-step.

    Cross-engine exactness: normalization is by the MAX score (L∞) as
    scaled-integer division — (raw · 10^6) div max — instead of the
    textbook L2 norm, whose sqrt/float-sum would drift by ulps between
    engines. Ordering and ratios are preserved; scores live in
    [0, 10^6]. Overflow bound: raw ≤ N·10^6, raw·10^6 ≤ N·10^12 —
    longs hold N up to ~9·10^6; beyond that drop SCALE or go
    decimal(38).

    Scale shape per half-step: one edge join shipping scores along
    edges + one hash agg by the far endpoint + a broadcast one-row max
    + a LEFT join from the node set (dangling nodes score 0) —
    O(iters) shuffles, AQE-skew-splittable, localCheckpoint-bounded
    plans exactly like pagerank_dup_graph."""
    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n"))
    edges = (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            ((2 * F.col("doc_id") + 1) % F.col("n")).alias("dst"),
        )
        .unionAll(
            docs.crossJoin(F.broadcast(n)).select(
                F.col("doc_id").alias("src"),
                ((3 * F.col("doc_id") + 7) % F.col("n")).alias("dst"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    return _hits_over_edges(edges, docs.select("doc_id"))


def _hits_over_edges(edges: DataFrame, nodes: DataFrame, iters: int = 2) -> DataFrame:
    """The iteration loop, separated so tests can drive crafted graphs
    (stars, chains) whose exact integer scores are hand-computable."""
    h = nodes.withColumn("h", F.lit(1_000_000).cast("long"))

    def _half(scores, score_col, from_col, to_col, out_col):
        raw = (
            edges.join(
                scores.select(F.col("doc_id").alias(from_col), score_col),
                from_col,
            )
            .groupBy(F.col(to_col).alias("doc_id"))
            .agg(F.sum(score_col).alias("raw"))
        )
        mx = raw.agg(F.max("raw").alias("mx"))
        return (
            nodes.join(raw, "doc_id", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "doc_id",
                F.coalesce(F.expr("(raw * 1000000) div mx"), F.lit(0))
                .cast("long")
                .alias(out_col),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(iters):
        a = _half(h, "h", "src", "dst", "a")
        h = _half(a, "a", "dst", "src", "h")
    return a.join(h, "doc_id").select(
        "doc_id", F.col("a").alias("authority"), F.col("h").alias("hub")
    )


@query("pagerank_dup_graph", _pagerank_sql())
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, damping 0.85) over the DIRECTED
    MinHash-LSH near-dup pair graph, oriented earlier-doc -> later
    duplicate — graph centrality as a first-class iterative operator:
    rank accumulates on the documents that keep getting re-duplicated
    downstream (the undirected variant is useless here — dup clusters
    are cliques, and PageRank is exactly uniform on regular graphs, so
    it could not distinguish a correct run from a broken one).

    Classic distributed PageRank: per iteration one join ships
    pr/outdeg along edges, one hash aggregate by destination, and a
    LEFT join from the node set keeps rank-sink nodes (no in-edges)
    alive at the teleport floor — O(iters) shuffles,
    AQE-skew-splittable, per-iteration localCheckpoint bounds plan
    depth exactly like dedup_clusters\' min-label loop.

    Cross-engine exactness: ranks are scaled 10^12 BIGINTs and every
    step is integer arithmetic (`div` here, `//` in DuckDB — operands
    are positive so floor == trunc) — float summation order can differ
    between engines, integer sums cannot."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return _pagerank_over_pairs(pairs)


def _pagerank_over_pairs(pairs: DataFrame, iters: int = 5) -> DataFrame:
    """The iteration loop, separated so tests can drive crafted graphs
    (chains, stars) whose exact integer ranks are hand-computable."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("doc_id"))
        .union(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    pr = nodes.withColumn("pr", F.lit(1_000_000_000_000))
    for _ in range(iters):
        prs = pr.select(F.col("doc_id").alias("src"), "pr")
        contrib = (
            edges.join(prs, "src")
            .join(deg, "src")
            .select("dst", F.expr("pr div outdeg").alias("c"))
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(contrib, "doc_id", "left")
            .select(
                "doc_id",
                F.expr(
                    "CAST(150000000000 + (85 * coalesce(contrib, 0)) div 100"
                    " AS BIGINT)"
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr


@query(
    "events_rollup",
    """
    SELECT coalesce(event_type, '(all)') AS event_type,
           coalesce(date_trunc('day', ts), TIMESTAMP '1900-01-01') AS day,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(grouping(event_type) AS BIGINT) AS g_type,
           CAST(grouping(date_trunc('day', ts)) AS BIGINT) AS g_day
    FROM events
    GROUP BY ROLLUP (event_type, date_trunc('day', ts))
    """,
)
def events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical OLAP rollup — (type, day) → (type) → grand total in
    ONE pass via grouping sets (Spark's Expand operator: each input row
    fans into its grouping-set combinations BEFORE the hash aggregate,
    so partial aggregation still combines map-side and the plan stays a
    single shuffle — vs three separate scans for the three levels).
    grouping() flags disambiguate "NULL because aggregated out" from a
    genuinely NULL dimension. Decimal sums for cross-engine equality."""
    events = load(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("timestamp_ntz")
    )
    rolled = events.rollup("event_type", "day").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.grouping("event_type").cast("bigint").alias("g_type"),
        F.grouping("day").cast("bigint").alias("g_day"),
    )
    # sentinel the aggregated-out dims: NULL-typed dimension columns
    # sort/compare poorly downstream, and the grouping flags already
    # carry the provenance
    return rolled.select(
        F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
        F.coalesce("day", F.lit("1900-01-01").cast("timestamp_ntz")).alias("day"),
        "n",
        "total_value",
        "g_type",
        "g_day",
    )


# ===========================================================================
# Clustering + robust fingerprinting (round 5)
# ===========================================================================
#
# kmeans_train / semdedup work on INTEGER-QUANTIZED embeddings
# (round(x * 2^20) as bigint): cross-row float sums are the one place
# the engines' summation order could diverge, so centroid accumulation
# happens in exact integer arithmetic and each update REQUANTIZES the
# mean back to the seed magnitude (values stay <= ~5.5e5 regardless of
# cluster size, so every dot product fits a bigint at any SF). Cosine
# itself is then a deterministic per-pair double expression over
# identical integers in both engines.

_QSCALE = 1048576  # 2^20

# long-form quantized embeddings + per-vector norms, shared by both
# oracles (dim is fixed at 64 by the generator; generate_series cannot
# take a lateral len() in DuckDB 1.0)
_Q_CTE = """
    q AS (
      SELECT vec_id, i AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1048576.0) AS BIGINT) AS v
      FROM embeddings, generate_series(1, 64) t(i)
    ),
    qn AS (SELECT vec_id, SUM(v * v) AS nq FROM q GROUP BY vec_id),
    c0 AS (SELECT vec_id AS cid, pos, v AS cv FROM q WHERE vec_id % 125 = 0)
"""


def _assign_sql(c: str, a: str) -> str:
    """One Lloyd assignment round: argmax cosine over centroids,
    ties to the lowest cid (never hit: a seed matches itself at
    exactly 1.0). Division order mirrors the Spark expression."""
    return f"""
    {c}n AS (SELECT cid, SUM(cv * cv) AS nc FROM {c} GROUP BY cid),
    {c}d AS (
      SELECT q.vec_id, c.cid, SUM(q.v * c.cv) AS dot
      FROM q JOIN {c} c ON q.pos = c.pos
      GROUP BY q.vec_id, c.cid
    ),
    {a} AS (
      SELECT vec_id, cid FROM (
        SELECT d.vec_id, d.cid,
               row_number() OVER (
                 PARTITION BY d.vec_id
                 ORDER BY CAST(d.dot AS DOUBLE)
                          / sqrt(CAST(qn.nq AS DOUBLE))
                          / sqrt(CAST(cn.nc AS DOUBLE)) DESC,
                          d.cid
               ) AS rn
        FROM {c}d d
        JOIN qn ON qn.vec_id = d.vec_id
        JOIN {c}n cn ON cn.cid = d.cid
      ) WHERE rn = 1
    )"""


def _update_sql(a: str, c: str) -> str:
    """Centroid update: exact integer sums, mean requantized via a
    deterministic double division + round (identical both engines)."""
    return f"""
    {a}sz AS (SELECT cid, count(*) AS n FROM {a} GROUP BY cid),
    {c} AS (
      SELECT m.cid, q.pos,
             CAST(round(CAST(SUM(q.v) AS DOUBLE) / any_value(s.n)) AS BIGINT) AS cv
      FROM q JOIN {a} m USING (vec_id) JOIN {a}sz s ON s.cid = m.cid
      GROUP BY m.cid, q.pos
    )"""


_KMEANS_SQL = (
    "WITH "
    + _Q_CTE
    + ","
    + _assign_sql("c0", "a1")
    + ","
    + _update_sql("a1", "c1")
    + ","
    + _assign_sql("c1", "a2")
    + ","
    + _update_sql("a2", "c2")
    + ","
    + _assign_sql("c2", "a3")
    + """
    SELECT cid AS cluster, count(*) AS n_members,
           SUM(vec_id) AS member_checksum,
           MIN(vec_id) AS min_member, MAX(vec_id) AS max_member
    FROM a3 GROUP BY cid
    """
)


def _quantize(emb: DataFrame) -> DataFrame:
    """(vec_id, qe array<long>, nq) — round(x * 2^20) per element."""
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.lit(1048576.0)).cast("long"),
        ).alias("qe"),
    )
    return q.withColumn(
        "nq",
        F.aggregate("qe", F.lit(0).cast("long"), lambda acc, v: acc + v * v),
    )


def _assign_step(q: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cid): nearest centroid by cosine; broadcast the K
    centroid arrays, fold the dot product JVM-side — no shuffle until
    the argmax window (keyed by vec_id, AQE-coalesced)."""
    dot = F.aggregate(
        F.zip_with("qe", "ce", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sim = (
        dot.cast("double")
        / F.sqrt(F.col("nq").cast("double"))
        / F.sqrt(F.col("nc").cast("double"))
    )
    scored = q.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", sim.alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def _centroid_update(q: DataFrame, assign: DataFrame) -> DataFrame:
    """(cid, ce array<long>, nc): per-position exact integer sums over
    members, requantized to the mean. posexplode -> one (cid, pos)
    hash agg (map-side combines) -> reassemble the K arrays."""
    members = assign.join(q.select("vec_id", "qe"), "vec_id")
    sums = members.select(
        "cid", F.posexplode("qe").alias("pos", "v")
    ).groupBy("cid", "pos").agg(F.sum("v").alias("s"))
    sizes = assign.groupBy("cid").agg(F.count("*").alias("n"))
    cv = sums.join(F.broadcast(sizes), "cid").select(
        "cid",
        "pos",
        F.round(F.col("s").cast("double") / F.col("n")).cast("long").alias("cv"),
    )
    cent = cv.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))),
            lambda s: s["cv"],
        ).alias("ce")
    )
    return cent.withColumn(
        "nc",
        F.aggregate("ce", F.lit(0).cast("long"), lambda acc, v: acc + v * v),
    )


@query("kmeans_train", _KMEANS_SQL)
def kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (3 assignments, 2 updates, K=4
    seeds at vec_id % 125 == 0) — the training half of the IVF path
    (ann_ivf_topk uses fixed centroids; this LEARNS them). Per round:
    one broadcast crossJoin + JVM fold for assignment, one posexplode
    hash-agg for the update — no all-pairs, no Python. At 100 TB the
    K*d centroid table stays driver-small while members never leave
    executors; integer quantization makes the result bit-stable under
    any row order or partitioning (float centroid sums would not be)."""
    emb = load(spark, sf_dir, "embeddings")
    q = _quantize(emb).persist()  # shared by all Lloyd rounds; lifetime
    # rule as dedup_lsh_verified_jaccard's caches: the returned frame is
    # lazy so unpersisting here would undo the sharing — one-shot
    # sessions release at exit, long-lived ones clearCache() after
    # collecting (review finding: the leak was undocumented)
    cent = (
        q.filter(F.col("vec_id") % 125 == 0)
        .select(F.col("vec_id").alias("cid"), F.col("qe").alias("ce"), F.col("nq").alias("nc"))
    )
    assign = None
    for it in range(3):
        assign = _assign_step(q, cent)
        if it < 2:
            cent = _centroid_update(q, assign)
    return assign.groupBy(F.col("cid").alias("cluster")).agg(
        F.count("*").alias("n_members"),
        F.sum("vec_id").alias("member_checksum"),
        F.min("vec_id").alias("min_member"),
        F.max("vec_id").alias("max_member"),
    )


_SEMDEDUP_SQL = (
    "WITH "
    + _Q_CTE
    + ","
    + _assign_sql("c0", "a1")
    + """,
    pd AS (
      SELECT qa.vec_id AS va, qb.vec_id AS vb, aa.cid,
             SUM(qa.v * qb.v) AS dot
      FROM q qa JOIN a1 aa ON aa.vec_id = qa.vec_id
      JOIN a1 ab ON ab.cid = aa.cid
      JOIN q qb ON qb.vec_id = ab.vec_id AND qb.pos = qa.pos
      WHERE qa.vec_id < qb.vec_id
      GROUP BY qa.vec_id, qb.vec_id, aa.cid
    ),
    dup AS (
      SELECT DISTINCT p.vb AS vec_id, p.cid
      FROM pd p
      JOIN qn na ON na.vec_id = p.va
      JOIN qn nb ON nb.vec_id = p.vb
      WHERE CAST(p.dot AS DOUBLE)
            / sqrt(CAST(na.nq AS DOUBLE))
            / sqrt(CAST(nb.nq AS DOUBLE)) >= 0.35
    )
    SELECT a.cid AS cluster, count(*) AS n_total,
           count(d.vec_id) AS n_dropped,
           COALESCE(SUM(d.vec_id), 0) AS dropped_checksum,
           SUM(a.vec_id) - COALESCE(SUM(d.vec_id), 0) AS kept_checksum
    FROM a1 a LEFT JOIN dup d ON d.vec_id = a.vec_id
    GROUP BY a.cid
    """
)


@query("semdedup", _SEMDEDUP_SQL)
def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then drop
    near-duplicates WITHIN each cluster only — clustering bounds the
    quadratic term to sum(c_k^2) instead of n^2, which is the entire
    scale story. One k-means assignment over the seed centroids, a
    cid-keyed self-join for in-cluster pairs (cos >= 0.35 on this
    isotropic synthetic corpus; real corpora use ~0.95+), higher
    vec_id of a pair drops, keep-side checksums pin the exact result.
    Parallelism note: seeds are vec_id % 125 == 0, so K grows with the
    corpus while E[cluster size] stays ~125 — per-cid pair work is
    bounded and the join key count scales with n (no 4-key skew trap;
    the K=4 look at test SF is an artifact of the 500-row table)."""
    emb = load(spark, sf_dir, "embeddings")
    q = _quantize(emb).persist()  # shared by all Lloyd rounds; lifetime
    # rule as dedup_lsh_verified_jaccard's caches: the returned frame is
    # lazy so unpersisting here would undo the sharing — one-shot
    # sessions release at exit, long-lived ones clearCache() after
    # collecting (review finding: the leak was undocumented)
    cent = (
        q.filter(F.col("vec_id") % 125 == 0)
        .select(F.col("vec_id").alias("cid"), F.col("qe").alias("ce"), F.col("nq").alias("nc"))
    )
    assign = _assign_step(q, cent)
    qa = q.join(assign, "vec_id")
    a = qa.select(
        F.col("vec_id").alias("va"), F.col("qe").alias("ea"),
        F.col("nq").alias("na"), "cid",
    )
    b = qa.select(
        F.col("vec_id").alias("vb"), F.col("qe").alias("eb"),
        F.col("nq").alias("nb"), "cid",
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sim = (
        dot.cast("double")
        / F.sqrt(F.col("na").cast("double"))
        / F.sqrt(F.col("nb").cast("double"))
    )
    dup = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .select("cid", "vb", sim.alias("sim"))
        .filter(F.col("sim") >= 0.35)
        .select("cid", F.col("vb").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(dup.withColumn("dropped", F.lit(1)), ["cid", "vec_id"], "left")
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.count("*").alias("n_total"),
            F.count("dropped").alias("n_dropped"),
            F.coalesce(F.sum(F.when(F.col("dropped") == 1, F.col("vec_id"))), F.lit(0)).alias("dropped_checksum"),
            (F.sum("vec_id") - F.coalesce(F.sum(F.when(F.col("dropped") == 1, F.col("vec_id"))), F.lit(0))).alias("kept_checksum"),
        )
    )


@query(
    "winnowing_fingerprint",
    """
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
    ),
    g0 AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 4 THEN
               list_transform(
                 generate_series(1, len(w) - 3),
                 i -> struct_pack(
                   pos := i - 1,
                   h := ('0x' || substr(md5(array_to_string(w[i:i+3], ' ')), 1, 15))::BIGINT
                        & 1099511627775))
             ELSE [] END AS items
      FROM base
    ),
    g AS (
      SELECT doc_id, u.pos AS pos,
             u.h * 1048576 + (1048575 - u.pos) AS comb,
             len(items) AS g_cnt
      FROM (SELECT doc_id, unnest(items) AS u, items FROM g0)
    ),
    wm AS (
      SELECT doc_id, pos, g_cnt,
             min(comb) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING
             ) AS wmin
      FROM g
    ),
    sel AS (
      SELECT DISTINCT doc_id, wmin
      FROM wm WHERE pos <= greatest(g_cnt - 5, 0)
    )
    SELECT s.doc_id,
           any_value(s.g_cnt) AS n_grams,
           count(*) AS n_fingerprints,
           SUM(s.wmin // 1048576) AS fp_checksum,
           MIN(s.wmin // 1048576) AS min_fp
    FROM (SELECT sel.doc_id, sel.wmin, w2.g_cnt
          FROM sel JOIN (SELECT DISTINCT doc_id, g_cnt FROM g) w2 USING (doc_id)) s
    GROUP BY s.doc_id
    """,
)
def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document sketch (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS fingerprint): hash every word 4-gram, slide a window of
    w=5 hashes, keep each window's minimum (rightmost on ties, encoded
    as hash*2^20 + (2^20-1-pos) so one integer min does both rules).
    Guarantees any shared run of >= w+k-1 words is detected — the
    robust near-dup sketch the rolling-hash text_fingerprint lacks.
    Pure JVM: split -> slice-comprehension grams -> md5 -> one window
    over (doc_id, pos) -> distinct -> agg on the same key, so the doc
    shuffle is paid once; per-doc width is capped by the tokenizer's
    100 KB text cap, so no straggler partitions at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.posexplode(word_ngrams(words(F.col("text")), 4)).alias("pos", "gram"),
    )
    mask = F.lit((1 << 40) - 1)
    g = grams.select(
        "doc_id",
        "pos",
        (
            md5_long(F.col("gram")).bitwiseAND(mask) * F.lit(_QSCALE)
            + (F.lit(_QSCALE - 1) - F.col("pos"))
        ).alias("comb"),
    )
    wdoc = Window.partitionBy("doc_id")
    wrun = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 4)
    wm = g.select(
        "doc_id",
        "pos",
        F.count("*").over(wdoc).alias("g_cnt"),
        F.min("comb").over(wrun).alias("wmin"),
    )
    sel = (
        wm.filter(F.col("pos") <= F.greatest(F.col("g_cnt") - 5, F.lit(0)))
        .select("doc_id", "g_cnt", "wmin")
        .distinct()
    )
    return sel.groupBy("doc_id").agg(
        F.first("g_cnt").alias("n_grams"),
        F.count("*").alias("n_fingerprints"),
        F.sum(F.expr("wmin div 1048576")).alias("fp_checksum"),
        F.min(F.expr("wmin div 1048576")).alias("min_fp"),
    )


# the indexed twin must reproduce ann_ivf_topk EXACTLY, so its oracle
# is literally the same SQL
from .driver_queries import ORACLE as _ORACLE_REG


@query("ann_ivf_indexed", _ORACLE_REG["ann_ivf_topk"])
def ann_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_ivf_topk served from a PERSISTED index instead of a
    per-query recompute: vectors stored once under cell=<cid> Hive
    partitions (sources/ann_ivf.py), the probe reads only each query's
    nprobe=2 nearest cells via partition pruning — same layout
    contract as the postings store for text. Same centroid rule
    (vec_id % 50 == 0), same tie rules, same output, same oracle."""
    from .sources.ann_ivf import build_ivf_index, probe_ivf
    from .sources.index_cache import cached_store

    path, built = cached_store(sf_dir, "ivf", "cells/_SUCCESS")
    if not built:
        emb = load(spark, sf_dir, "embeddings")
        cent = emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        )
        build_ivf_index(emb, cent, path)
    queries_df = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 10
    ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    return probe_ivf(spark, path, queries_df, nprobe=2, k=5)


@query(
    "media_payload_roundtrip",
    """
    SELECT 'http://media.test/img' || doc_id || '.png' AS media_ref,
           'image' AS kind,
           'image/png' AS content_type,
           CAST(256 AS BIGINT) AS n_bytes,
           repeat(sha256('http://media.test/img' || doc_id || '.png'), 8)
             AS payload_hex
    FROM documents
    """,
)
def media_payload_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end oracle for the multimodal payload path (M2's Arrow
    plumbing): media_table's mapInPandas must emit EXACTLY the spec'd
    bytes — payload = sha256(ref) repeated to 256 bytes — plus the
    URL-suffix ext inference and content-type mapping, byte-for-byte
    against a pure-SQL reconstruction (full hex equality, stronger
    than a hash: DuckDB 1.0 can't hash BLOBs but can build the hex)."""
    from .operators.multimodal import media_table

    refs = load(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("http://media.test/img"), F.col("doc_id"), F.lit(".png")
        ).alias("media_ref")
    )
    return media_table(refs).select(
        "media_ref",
        "kind",
        "content_type",
        "n_bytes",
        F.lower(F.hex("payload")).alias("payload_hex"),
    )


# ===========================================================================
# BM25 ranked search (round 5): the ranking half of §2.9. The
# reference's OpenSearch ranks matches with BM25
# (`workers/indexer/repositories/opensearch_repository.go:23-56` —
# Lucene's default similarity); our search_pages serves the matching
# SET with a naive-TF score (set parity is the §2.9 target). This
# operator implements the standard Robertson/Lucene BM25 formula
# itself — idf = ln(1 + (N - df + 0.5)/(df + 0.5)), k1=1.2, b=0.75 —
# as a first-class ranking operator, with both engines evaluating the
# per-term contributions in a FIXED left-to-right order (no float-sum
# order drift). Scale shape: one corpus pass computes (tf_t..., dl);
# the corpus stats (N, avgdl, df_t) are ONE scalar-aggregate row
# broadcast back (at 100 TB these are maintained incrementally in the
# postings meta instead of recomputed); top-k compiles to
# TakeOrderedAndProject — distributed partial top-k, never a global
# sort.
# ===========================================================================

_BM25_TERMS = ["join", "vector", "window"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_sql(project: str = "bm25") -> str:
    """BM25 top-10 oracle SQL. ``project`` picks the second output
    column: the score ("bm25", the bm25_search contract) or the rank
    ("rn" — consumed by _rrf_sql's lexical arm; parameterized here so
    the fusion oracle never string-edits this function's text)."""
    tf_cols = ",\n             ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{t}" for t in _BM25_TERMS
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _BM25_TERMS
    )
    contrib = " + ".join(
        f"(ln(1 + (s.n - s.df_{t} + 0.5) / (s.df_{t} + 0.5))"
        f" * b.tf_{t} * ({_BM25_K1} + 1)"
        f" / (b.tf_{t} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * b.dl / s.avgdl)))"
        for t in _BM25_TERMS
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
             {tf_cols},
             len(w) AS dl
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    ),
    s AS (
      SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM base
    ),
    scored AS (
      SELECT b.doc_id, {contrib} AS score
      FROM base b CROSS JOIN s
      WHERE {" + ".join(f"b.tf_{t}" for t in _BM25_TERMS)} > 0
    )
    SELECT doc_id, {"bm25" if project == "bm25" else "rn"} FROM (
      SELECT doc_id, round(score, 4) AS bm25,
             row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= 10
    """


@query("bm25_search", _bm25_sql())
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 over documents for the fixed query
    {join, vector, window}: one tokenize pass emits (tf_t..., dl), one
    scalar aggregate emits (N, avgdl, df_t...) and is cross-joined back
    (a 1-row broadcast), the score is a fixed-order sum of per-term
    contributions (bit-identical across partitionings — no shuffled
    float aggregation anywhere), and the top-10 runs as
    TakeOrderedAndProject (per-partition heads + driver merge)."""
    docs = load(spark, sf_dir, "documents")

    def tf(t: str) -> Column:
        return F.size(F.filter(F.col("w"), lambda x: x == F.lit(t)))

    base = docs.select("doc_id", words(F.col("text")).alias("w")).select(
        "doc_id",
        *[tf(t).alias(f"tf_{t}") for t in _BM25_TERMS],
        F.size("w").alias("dl"),
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    matched = base.filter(
        sum(F.col(f"tf_{t}") for t in _BM25_TERMS) > 0
    ).crossJoin(F.broadcast(stats))

    def contrib(t: str) -> Column:
        idf = F.log(
            1
            + (F.col("n") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        tf_c = F.col(f"tf_{t}")
        norm = tf_c + _BM25_K1 * (
            1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
        )
        return idf * tf_c * (_BM25_K1 + 1) / norm

    score = contrib(_BM25_TERMS[0])
    for t in _BM25_TERMS[1:]:
        score = score + contrib(t)
    return (
        matched.select("doc_id", F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


# ===========================================================================
# Incremental dedup (round 5): the production CADENCE of near-dup — a
# new batch arrives and is deduped against the EXISTING corpus via a
# persisted LSH index (sources/dedup_index.py), never re-signaturing
# the corpus. Batch = doc_id % 7 == 3, corpus = the rest; output = each
# new doc's best corpus match at jaccard >= 0.2. The oracle recomputes
# both sides from scratch — same bands, same verify — so it checks the
# persisted index serves exactly what a full recompute would.
# ===========================================================================


@query(
    "dedup_incremental_lsh",
    f"""
    WITH {_MINHASH_SIG_CTES},
    cands AS (
      SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS corpus_doc
      FROM bands n JOIN bands o ON n.band = o.band AND n.bucket = o.bucket
      WHERE n.doc_id % 7 = 3 AND o.doc_id % 7 != 3
    ),
    verified AS (
      SELECT c.new_doc, c.corpus_doc,
             CAST(len(list_intersect(gn.grams, go.grams)) AS DOUBLE)
             / (len(gn.grams) + len(go.grams)
                - len(list_intersect(gn.grams, go.grams))) AS jaccard
      FROM cands c
      JOIN shingled gn ON gn.doc_id = c.new_doc
      JOIN shingled go ON go.doc_id = c.corpus_doc
    )
    SELECT new_doc AS doc_id, corpus_doc AS dup_of, round(jaccard, 5) AS jaccard
    FROM (
      SELECT new_doc, corpus_doc, jaccard,
             row_number() OVER (
               PARTITION BY new_doc ORDER BY jaccard DESC, corpus_doc
             ) AS rn
      FROM verified WHERE jaccard >= 0.2
    ) WHERE rn = 1
    """,
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus dedup over a PERSISTED LSH index: the corpus
    bands + gram sets are written once (bucket-hash Hive partitions);
    the probe signatures only the batch, equi-joins its band rows
    against the pruned index partitions, and exact-verifies just the
    candidates. Batch work is linear in the BATCH — the corpus is never
    re-tokenized (at 10^10 docs this is the only affordable cadence;
    the full-corpus twin dedup_lsh_verified_jaccard stays the one-shot
    path)."""
    from .sources.dedup_index import build_dedup_index, probe_dedup_index
    from .sources.index_cache import cached_store

    path, built = cached_store(sf_dir, "dedupidx", "grams/_SUCCESS")
    if not built:
        corpus = _doc_grams(spark, sf_dir).filter(F.col("doc_id") % 7 != 3)
        build_dedup_index(_lsh_bands(corpus), corpus, path)
    batch = _doc_grams(spark, sf_dir).filter(F.col("doc_id") % 7 == 3)
    return probe_dedup_index(spark, path, _lsh_bands(batch), batch)


# ===========================================================================
# WARC ingest roundtrip (round 5): the web-scale input format. 16
# multi-record WARC files are synthesized JVM-side (sources/warc.py
# warc_records_col — records concatenated in doc_id order per file),
# then parsed back by the real Content-Length-driven record parser
# (parse_warc_files, mapInPandas over whole files). The oracle
# reconstructs the expected rows straight from documents — so the pair
# pins the full serialize→parse loop byte-for-byte, including payloads
# that contain CRLFs (the parser never scans bodies for delimiters).
# ===========================================================================


@query(
    "warc_roundtrip",
    """
    SELECT 'http://warc.test/doc' || doc_id AS url,
           200 AS http_status,
           'text/html' AS content_type,
           text AS payload
    FROM documents
    """,
)
def warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → serialized multi-record WARC files → parsed rows.
    Serialization is pure JVM (concat + octet_length); files parse
    independently in one mapInPandas (parallelism = file count, no
    shuffle after the 16-way group)."""
    from .sources.warc import parse_warc_files, warc_records_col

    docs = load(spark, sf_dir, "documents")
    recs = docs.select(
        (F.col("doc_id") % 16).alias("g"),
        F.struct(
            F.col("doc_id"),
            warc_records_col(
                F.concat(F.lit("http://warc.test/doc"), F.col("doc_id")),
                F.col("text"),
            ).alias("rec"),
        ).alias("s"),
    )
    files = recs.groupBy("g").agg(
        F.encode(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda s: s["rec"]
                ),
                "",
            ),
            "utf-8",
        ).alias("data")
    )
    return parse_warc_files(files.select("data"))


@query("bm25_indexed", None)  # oracle aliased below — same answer as the scan
def bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_search served ENTIRELY from the posting-list store: tf from
    the query terms' partition-pruned buckets, df counted inside them,
    dl from the doclens side store, (N, sum_dl) from the build-time
    meta — the only per-query corpus contact is the doc-length join.
    Same formula, same fixed contribution order, same top-10, same
    oracle SQL as the scan path (index changes what gets READ, never
    the answer)."""
    from .sources.index_cache import cached_store
    from .sources.postings import (
        build_postings,
        probe_bm25,
        write_doclens,
        write_postings,
    )

    docs = load(spark, sf_dir, "documents")
    path, built = cached_store(sf_dir, "postings", "_SUCCESS")
    if not built:
        write_postings(
            build_postings(docs, ["doc_id"], "text"), path, mode="overwrite"
        )
    if not cached_store(sf_dir, "postings", "_doclen_meta.json")[1]:
        write_doclens(docs, ["doc_id"], "text", path)
    return probe_bm25(spark, path, _BM25_TERMS, k=10)


_ORACLE_REG["bm25_indexed"] = _ORACLE_REG["bm25_search"]


# ===========================================================================
# C4-style global line dedup (round 5): remove every repeated LINE
# across the corpus, keeping only its first occurrence (C4's "we
# discard all but one of any three-sentence span occurring more than
# once" family, and CCNet's per-shard line dedup — the boilerplate
# killer: nav bars, footers, cookie banners repeat verbatim across a
# site). Lines = the same seeded 8-word chunks text_repetition uses
# (flat synthetic text has no newlines); docs with doc_id % 5 == 0 are
# additionally prefixed with one constant boilerplate line so the
# cross-doc path is exercised deterministically in both engines. Scale
# shape: one shuffle keyed by line (first-owner = min(doc,pos)
# aggregate + join back — at 10^10 docs the key becomes the line's
# 128-bit hash), one shuffle back by doc to reassemble; never all-pairs,
# no windows over unbounded partitions.
# ===========================================================================

_BOILERPLATE = "all rights reserved cookie notice navigation footer"


@query(
    "dedup_lines_global",
    f"""
    WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sent AS (
      SELECT doc_id,
             [array_to_string(w[i*8+1 : i*8+8], ' ')
              for i in range(0, CAST(ceil(len(w) / 8.0) AS INT))] AS s
      FROM base
    ),
    seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN list_concat(['{_BOILERPLATE}'], s) ELSE s END AS s
      FROM sent
    ),
    ex AS (
      SELECT doc_id, u.pos AS pos, u.sent AS sent
      FROM (
        SELECT doc_id,
               unnest([{{'pos': i, 'sent': s[i+1]}} for i in range(len(s))]) AS u
        FROM seeded
      )
    ),
    kept AS (
      SELECT doc_id, pos, sent FROM (
        SELECT doc_id, pos, sent,
               row_number() OVER (PARTITION BY sent ORDER BY doc_id, pos) AS rn
        FROM ex
      ) WHERE rn = 1
    )
    SELECT s.doc_id,
           CAST(len(s.s) AS BIGINT) AS n_lines,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(k.kept_text, '') AS kept_text
    FROM seeded s LEFT JOIN (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(sent, ' ' ORDER BY pos) AS kept_text
      FROM kept GROUP BY doc_id
    ) k ON k.doc_id = s.doc_id
    """,
)
def dedup_lines_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line dedup: explode seeded 8-word lines with
    position, pick each line's global first owner with ONE hash
    aggregate min(struct(doc_id, pos)) (never a window over the line's
    occurrence list — a boilerplate line with 10^8 copies stays a
    partial-aggregated key, not a single-task sort), join the owner
    back, reassemble surviving lines per doc in position order."""
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ", -1)
    nchunks = F.ceil(F.size(ws) / F.lit(8.0)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(F.slice(ws, i * 8 + 1, 8), " "),
    )
    seeded_col = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.array(F.lit(_BOILERPLATE)), sents),
    ).otherwise(sents)
    seeded = docs.select("doc_id", seeded_col.alias("s"))
    ex = seeded.select(
        "doc_id", F.posexplode("s").alias("pos", "sent")
    )
    owner = ex.groupBy("sent").agg(
        F.min(F.struct("doc_id", "pos")).alias("own")
    )
    kept = (
        ex.join(owner, "sent")
        .filter(
            (F.col("doc_id") == F.col("own.doc_id"))
            & (F.col("pos") == F.col("own.pos"))
        )
        .select("doc_id", "pos", "sent")
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "sent"))),
                lambda x: x["sent"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return seeded.join(reassembled, "doc_id", "left").select(
        "doc_id",
        F.size("s").cast("long").alias("n_lines"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )


@query(
    "phrase_search_indexed",
    """
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(len([i for i in range(1, len(w))
                     if w[i] = 'table' AND w[i+1] = 'hash']) AS INT)
             AS n_occurrences
    FROM w
    WHERE len([i for i in range(1, len(w))
               if w[i] = 'table' AND w[i+1] = 'hash']) > 0
    """,
)
def phrase_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search ("table hash") served by POSITIONAL postings
    (sources/postings.py build_positional_postings / probe_phrase — the
    OpenSearch match_phrase analog): occurrence starts = pos(t0) ∩
    (pos(t1)−1), computed as JVM array intersection over the phrase
    terms' bucket-pruned rows; document content is never read. The
    oracle scans the text directly, so the pair pins index-served
    phrase semantics against a from-scratch recount."""
    from .sources.index_cache import cached_store
    from .sources.postings import build_positional_postings, probe_phrase, write_postings

    path, built = cached_store(sf_dir, "postings-pos", "_SUCCESS")
    if not built:
        docs = load(spark, sf_dir, "documents")
        write_postings(
            build_positional_postings(docs, ["doc_id"], "text"),
            path,
            mode="overwrite",
        )
    return probe_phrase(spark, path, "table hash")


# ===========================================================================
# Sequence packing (round 5): the last step of a pretraining data
# pipeline — concatenate the corpus's token stream in a deterministic
# document order and cut it into fixed-size training chunks (the
# GPT-style "concat and chunk at block_size" packing). A doc whose
# tokens straddle a boundary contributes a slice to each chunk it
# overlaps; the output is the (doc, chunk) assignment table a loader
# shards by chunk_id. The global token offsets are a DISTRIBUTED
# prefix sum — range-partition by doc_id, per-partition running sums
# via a window over spark_partition_id() (each partition sorts only
# its own slice), then the ≤ P partition totals come to the driver and
# return as a broadcast offset join (the textbook two-pass scan; a
# single global ORDER BY window would funnel the corpus through one
# task). The oracle computes the same offsets with a global window —
# affordable at oracle scale, which is exactly why it can stay SQL.
# ===========================================================================

_PACK_BLOCK = 512  # tokens per training chunk


@query(
    "pack_sequences",
    f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
    ),
    c AS (
      SELECT doc_id, ntok,
             CAST(sum(ntok) OVER (ORDER BY doc_id) AS BIGINT) AS cend
      FROM t
    ),
    s AS (SELECT doc_id, cend - ntok AS cstart, cend FROM c)
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(greatest(cstart, chunk_id * {_PACK_BLOCK})
                - chunk_id * {_PACK_BLOCK} AS BIGINT) AS start_in_chunk,
           CAST(least(cend, (chunk_id + 1) * {_PACK_BLOCK})
                - greatest(cstart, chunk_id * {_PACK_BLOCK}) AS BIGINT)
             AS n_tokens
    FROM (
      SELECT doc_id, cstart, cend,
             unnest([i for i in range(cstart // {_PACK_BLOCK},
                                      (cend - 1) // {_PACK_BLOCK} + 1)])
               AS chunk_id
      FROM s
    )
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_in_chunk, n_tokens): concat-and-chunk
    packing at block_size=512 over doc_id order. Distributed prefix
    sum: range partitions each cumsum their own slice; the ≤ P
    partition totals (bounded driver-side set) come back as a
    broadcast offset join; chunk assignments explode from a JVM
    sequence — no global sort, no single-partition window anywhere."""
    B = _PACK_BLOCK
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ", -1)).cast("long").alias("ntok"),
    )
    parts = t.repartitionByRange(16, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w = Window.partitionBy("pid").orderBy("doc_id")
    local = parts.withColumn("local_end", F.sum("ntok").over(w))
    from pyspark import StorageLevel

    local = local.persist(StorageLevel.MEMORY_AND_DISK)
    totals = {
        int(r.pid): int(r.tot)
        for r in local.groupBy("pid").agg(F.max("local_end").alias("tot")).collect()
    }  # ≤ P rows — bounded driver-side set
    offs, acc = [], 0
    for pid in sorted(totals):
        offs.append((pid, acc))
        acc += totals[pid]
    off_df = spark.createDataFrame(offs, "pid int, off long")
    s = local.join(F.broadcast(off_df), "pid").select(
        "doc_id",
        (F.col("local_end") - F.col("ntok") + F.col("off")).alias("cstart"),
        (F.col("local_end") + F.col("off")).alias("cend"),
    )
    chunk = F.explode(
        F.sequence(
            F.floor(F.col("cstart") / B),
            F.floor((F.col("cend") - 1) / B),
        )
    ).alias("chunk_id")
    return s.select("doc_id", "cstart", "cend", chunk).select(
        "doc_id",
        F.col("chunk_id").cast("long"),
        (
            F.greatest(F.col("cstart"), F.col("chunk_id") * B)
            - F.col("chunk_id") * B
        ).cast("long").alias("start_in_chunk"),
        (
            F.least(F.col("cend"), (F.col("chunk_id") + 1) * B)
            - F.greatest(F.col("cstart"), F.col("chunk_id") * B)
        ).cast("long").alias("n_tokens"),
    )


# ===========================================================================
# BPE pair statistics (round 5): the inner loop of byte-pair-encoding
# tokenizer TRAINING is "count all adjacent symbol pairs, merge the
# most frequent" — at corpus scale the count is the expensive part and
# it's pure aggregation: explode adjacent pairs (JVM sequence over the
# token array, no Python), hash-aggregate counts (map-side partial
# combine), top-k via TakeOrderedAndProject. One merge round shown;
# training iterates count→merge with the same plan shape.
# ===========================================================================


@query(
    "bpe_top_pairs",
    """
    WITH w AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
    p AS (
      SELECT unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS pair
      FROM w
    )
    SELECT pair, n FROM (
      SELECT pair, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, pair) AS rn
      FROM p GROUP BY pair
    ) WHERE rn <= 20
    """,
)
def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent token pairs by corpus frequency — one BPE-train
    counting round. Pair explosion and counting never leave the JVM;
    ties break on the pair string so both engines pick identical rows."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


# ===========================================================================
# n-gram LM familiarity scoring (round 5): CCNet/Gopher filter corpora
# by language-model perplexity — docs whose n-grams the corpus LM finds
# improbable are gibberish/OCR noise. The log-prob sum is float-order-
# dependent, so this renders the filter INTEGERIZED: a doc's score is
# the sum of corpus-wide counts of its bigrams (the LM's raw evidence
# mass); mean-bigram-count < 2 (every bigram near-unique in the corpus)
# flags the doc. Exact integers end to end — the kept set is
# bit-identical across engines and partitionings, which a log2-based
# perplexity can never guarantee (libm ulp drift).
# ===========================================================================


@query(
    "lm_bigram_familiarity",
    """
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    p AS (
      SELECT doc_id,
             unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS pair
      FROM w
    ),
    c AS (SELECT pair, count(*) AS c FROM p GROUP BY pair)
    SELECT p.doc_id,
           count(*) AS n_bigrams,
           CAST(sum(c.c) AS BIGINT) AS familiarity_sum,
           sum(c.c) >= 2 * count(*) AS keep
    FROM p JOIN c USING (pair)
    GROUP BY p.doc_id
    """,
)
def lm_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram familiarity: train (count all corpus bigrams) and
    score (sum each doc's bigram counts) in one job. keep=false flags
    docs whose average bigram occurs < 2× corpus-wide — the integerized
    stand-in for a perplexity threshold. Docs with < 2 tokens have no
    bigrams and drop out (both engines).

    Scale: three hash shuffles over DISTINCT (doc, pair) rows, not raw
    occurrences — the per-doc pair count t folds first (one map-side-
    combined agg, materialized once via localCheckpoint so the corpus
    tokenizes once; plan-audited), the model is c = Σ t per pair over
    that frame, the join ships the deduplicated frame (AQE-sized; at
    100 TB the key becomes xxhash64(pair)), and the doc rollup sums
    t and t·c. No windows, no floats, no Python; a 10^8-copy
    boilerplate bigram is a partial-aggregated key, never one task's
    sort."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    pairs = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(ws, i), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    dp = (
        docs.select("doc_id", F.explode(pairs).alias("pair"))
        .groupBy("doc_id", "pair")
        .agg(F.count("*").alias("t"))
        .localCheckpoint(eager=True)
    )
    counts = dp.groupBy("pair").agg(F.sum("t").alias("c"))
    return (
        dp.join(counts, "pair")
        .groupBy("doc_id")
        .agg(
            F.sum("t").alias("n_bigrams"),
            F.sum(F.col("t") * F.col("c")).alias("familiarity_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "familiarity_sum",
            (F.col("familiarity_sum") >= 2 * F.col("n_bigrams")).alias("keep"),
        )
    )


# ===========================================================================
# Crawl-trap detection (round 5): calendar pages, session-id URLs and
# faceted-search explosions give one host an unbounded URL space over a
# handful of path TEMPLATES — the classic frontier-poisoning failure a
# production crawler must detect (and the reference, with no politeness
# at all, would walk into). Template = path with digit runs collapsed
# to '#'; a host whose URL count dwarfs its template count is a trap.
# ===========================================================================


@query(
    "crawl_trap_detection",
    """
    WITH urls AS (
      SELECT DISTINCT
        doc_id % 23 AS h,
        CASE WHEN (doc_id % 23) % 5 = 0
             THEN '/cal/' || (doc_id // 23)::VARCHAR
             ELSE '/' || CASE doc_id % 7
                    WHEN 0 THEN 'about' WHEN 1 THEN 'docs'
                    WHEN 2 THEN 'blog'  WHEN 3 THEN 'shop'
                    WHEN 4 THEN 'news'  WHEN 5 THEN 'team'
                    ELSE 'faq' END || '/' || (doc_id % 3)::VARCHAR
        END AS path
      FROM documents
    ),
    t AS (
      SELECT h, path, regexp_replace(path, '[0-9]+', '#', 'g') AS template
      FROM urls
    )
    SELECT 'h' || h::VARCHAR || '.test' AS host,
           count(DISTINCT path) AS n_urls,
           count(DISTINCT template) AS n_templates,
           count(DISTINCT path) >= 10
             AND count(DISTINCT path) >= 8 * count(DISTINCT template)
             AS is_trap
    FROM t GROUP BY h
    """,
)
def crawl_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL-space explosion detector: trap hosts serve ~n/23
    distinct numeric calendar paths collapsing to ONE template; healthy
    hosts serve ≤21 paths over 7 section templates. Flag = ≥10 URLs and
    ≥8× more URLs than templates — pure integer comparisons.

    Scale: one distinct + one hash aggregate per host (both map-side
    combined); the digit-collapse is a codegen'd regexp_replace. The
    engine consumes the flag as a politeness override (budget 0 /
    drop-host) — the frontier never materializes the trap's tail."""
    docs = load(spark, sf_dir, "documents")
    h = F.col("doc_id") % 23
    section = F.element_at(
        F.array(*[F.lit(x) for x in
                  ("about", "docs", "blog", "shop", "news", "team", "faq")]),
        (F.col("doc_id") % 7 + 1).cast("int"),
    )
    path = F.when(
        h % 5 == 0,
        F.concat(F.lit("/cal/"), F.expr("doc_id div 23").cast("string")),
    ).otherwise(
        F.concat(F.lit("/"), section, F.lit("/"), (F.col("doc_id") % 3).cast("string"))
    )
    urls = docs.select(h.alias("h"), path.alias("path")).distinct()
    t = urls.withColumn(
        "template", F.regexp_replace("path", "[0-9]+", "#")
    )
    return t.groupBy("h").agg(
        F.count_distinct("path").alias("n_urls"),
        F.count_distinct("template").alias("n_templates"),
    ).select(
        F.concat(F.lit("h"), F.col("h").cast("string"), F.lit(".test")).alias(
            "host"
        ),
        "n_urls",
        "n_templates",
        (
            (F.col("n_urls") >= 10)
            & (F.col("n_urls") >= 8 * F.col("n_templates"))
        ).alias("is_trap"),
    )


# ===========================================================================
# Funnel conversion (round 5): the ordered-step user journey (view →
# click → purchase, each step at-or-after the previous step's FIRST
# occurrence) — product analytics' workhorse query, and a shape the
# pure relational algebra handles without a per-user state machine.
# ===========================================================================


@query(
    "funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(epoch_ms(ts)) AS v_ms FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(epoch_ms(e.ts)) AS c_ms
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_ms(e.ts) >= v.v_ms
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(epoch_ms(e.ts)) AS p_ms
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= c.c_ms
      GROUP BY 1
    )
    SELECT v.user_id, v.v_ms, c.c_ms, p.p_ms,
           CAST(CASE WHEN p.p_ms IS NOT NULL THEN 3
                     WHEN c.c_ms IS NOT NULL THEN 2
                     ELSE 1 END AS INTEGER) AS stage
    FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: first view, first click at-or-after it, first
    purchase at-or-after that; stage = how deep the journey got. All
    integer epoch-ms.

    Scale: three conditional-min hash aggregates chained through joins
    on user_id — each intermediate is USER-cardinality (≪ events) and
    joins back as the small side; the events frame is filtered to the
    three step types and materialized once (localCheckpoint) so the
    corpus scans once, not per step. No windows, no per-user state
    machine, no event-order sort."""
    base = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", ntz_epoch_ms(F.col("ts")).alias("ms"))
        .localCheckpoint(eager=True)
    )
    v = (
        base.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ms").alias("v_ms"))
    )
    c = (
        base.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ms") >= F.col("v_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("c_ms"))
    )
    p = (
        base.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ms") >= F.col("c_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("p_ms"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "v_ms",
            "c_ms",
            "p_ms",
            F.when(F.col("p_ms").isNotNull(), 3)
            .when(F.col("c_ms").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("stage"),
        )
    )


# ===========================================================================
# Content-defined chunking (round 5): dedup STORAGE's counterpart to
# the dedup queries — Rabin/FastCDC-style boundaries that survive
# insertions (a fixed-size chunker re-aligns everything after an edit;
# a content-defined one shifts only the touched chunk). Boundary rule:
# a word position opens a new chunk iff md5(its 4-gram) % 64 == 0 —
# same gram family as winnowing, so expected chunk ≈ 64 words.
# ===========================================================================


@query(
    "cdc_chunking",
    """
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    g AS (
      SELECT doc_id, len(ws) AS n_words,
             [i for i in range(2, len(ws) - 2)
              if ('0x' || substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 15))::BIGINT % 64 = 0]
               AS bounds
      FROM w WHERE len(ws) >= 4
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(len(bounds) + 1 AS BIGINT) AS n_chunks,
           CAST(coalesce(list_sum(bounds), 0) AS BIGINT) AS boundary_checksum,
           CAST(n_words // (len(bounds) + 1) AS BIGINT) AS mean_chunk_words
    FROM g
    """,
)
def cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc content-defined chunk statistics: boundary positions
    (1-indexed gram starts, position 1 never a boundary — a chunk can't
    be empty), chunk count, boundary checksum (order-free identity of
    the chunking), integer mean chunk size. Docs shorter than one gram
    emit nothing (both engines).

    Scale: everything is a per-row JVM fold (transform + filter over
    the gram positions) — zero shuffles, zero Python; chunk identity at
    100 TB is then one hash agg over (doc, boundary-window) keys, the
    same shape as dedup_exact. Insert-stability is the design point:
    editing one word moves only boundaries whose 4-gram covers it."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    d = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") >= 4)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ",
        F.element_at(F.col("ws"), i),
        F.element_at(F.col("ws"), i + 1),
        F.element_at(F.col("ws"), i + 2),
        F.element_at(F.col("ws"), i + 3),
    )
    # sequence(2, size-3) counts DOWN when size == 4 (the word_ngrams
    # footgun): guard to the empty list like DuckDB's exclusive range
    bounds = F.when(
        F.size("ws") >= 5,
        F.filter(
            F.sequence(F.lit(2), F.size("ws") - 3),
            lambda i: md5_long(gram(i)) % 64 == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    g = d.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        bounds.alias("bounds"),
    )
    return g.select(
        "doc_id",
        "n_words",
        (F.size("bounds") + 1).cast("bigint").alias("n_chunks"),
        F.coalesce(
            F.aggregate(
                "bounds", F.lit(0).cast("bigint"), lambda a, b: a + b
            ),
            F.lit(0),
        ).alias("boundary_checksum"),
        F.expr("n_words div (size(bounds) + 1)")
        .cast("bigint")
        .alias("mean_chunk_words"),
    )


# ===========================================================================
# Triangle counting (round 5): the classic distributed-graph statistic
# (clustering coefficient's numerator, spam-farm detection on link
# graphs). Degree-ordered orientation bounds wedge explosion: each
# undirected edge points low-degree → high-degree (id tie-break), so a
# d-degree hub emits wedges only toward HIGHER-ranked neighbors —
# O(Σ d_out²) with d_out ≤ √(2m)-ish, the standard MapReduce-triangles
# bound — instead of a hub's d² wedges.
# ===========================================================================


@query(
    "triangle_count",
    """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    raw AS (
      SELECT doc_id AS a, (2 * doc_id + 1) % (SELECT n FROM nn) AS b
      FROM documents
      UNION ALL
      SELECT doc_id, (3 * doc_id + 7) % (SELECT n FROM nn) FROM documents
    ),
    und AS (
      SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM raw WHERE a != b
    ),
    deg AS (
      SELECT id, count(*) AS d FROM (
        SELECT u AS id FROM und UNION ALL SELECT v FROM und
      ) GROUP BY id
    ),
    ori AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
      FROM und e JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v
    ),
    wedge AS (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM ori e1 JOIN ori e2 ON e2.s = e1.t
    ),
    tri AS (
      -- orientation is a total order, so a wedge a->b->c closes only
      -- via the up-rank edge a->c: a plain equi-join, never a nested
      -- loop over an OR predicate
      SELECT w.a, w.b, w.c FROM wedge w
      JOIN ori e3 ON e3.s = w.a AND e3.t = w.c
    ),
    pern AS (
      SELECT id, count(*) AS n_triangles FROM (
        SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY id
    )
    SELECT id AS doc_id, CAST(n_triangles AS BIGINT) AS n_triangles
    FROM pern
    """,
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected 2-out graph.

    Plan: dedup to canonical undirected edges, orient each edge by
    (degree, id) ascending, one self-join on the middle vertex builds
    wedges, one equi-join on (a, c) closes them (rank is a total order,
    so the closing edge is always oriented a→c — never an OR-predicate
    nested loop), then the per-node explode+count. Three shuffle joins
    + two hash aggs, no windows; the orientation is what makes the
    wedge join survive a zipf hub at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n"))
    raw = (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("a"),
            ((2 * F.col("doc_id") + 1) % F.col("n")).alias("b"),
        )
        .unionAll(
            docs.crossJoin(F.broadcast(n)).select(
                F.col("doc_id").alias("a"),
                ((3 * F.col("doc_id") + 7) % F.col("n")).alias("b"),
            )
        )
        .filter(F.col("a") != F.col("b"))
    )
    return _triangle_counts(raw)


def _triangle_counts(raw: DataFrame) -> DataFrame:
    """Degree-ordered triangle counting over raw (a, b) edge rows —
    separated so tests can drive crafted graphs (K4, squares) with
    hand-countable triangles."""
    und = (
        raw.select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    e1 = ori.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = ori.select(F.col("s").alias("b"), F.col("t").alias("c"))
    wedge = e1.join(e2, "b")
    # the closing edge of wedge a->b->c is always oriented a->c (rank
    # is a total order), so the close is a plain equi-join on (a, c)
    e3 = ori.select(F.col("s").alias("a"), F.col("t").alias("c"))
    tri = wedge.join(e3, ["a", "c"]).select("a", "b", "c")
    return (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
        .select(F.col("id").alias("doc_id"), "n_triangles")
    )


# ===========================================================================
# Adaptive host throttling (round 5): the feedback half of politeness —
# a host's fetch budget follows its observed latency (slow host = small
# budget; the AIMD-ish curve every production crawler runs). Latencies
# are synthesized deterministically; p95 is the exact nearest-rank pick
# (events_value_percentiles' ceil convention), budget the banded map.
# ===========================================================================


@query(
    "redirect_resolution",
    """
    WITH RECURSIVE edges AS (
      SELECT doc_id AS src,
             CASE WHEN doc_id % 64 = 1 THEN doc_id + 1
                  ELSE doc_id - 1 END AS dst
      FROM documents WHERE doc_id % 8 <> 0
    ),
    w(src, cur, hops) AS (
      SELECT src, dst, 1 FROM edges
      UNION ALL
      SELECT w.src, e.dst, w.hops + 1
      FROM w JOIN edges e ON e.src = w.cur
      WHERE w.hops < 8
    ),
    resolved AS (
      SELECT src, arg_min(cur, hops) AS final_id,
             CAST(min(hops) AS BIGINT) AS hops
      FROM w WHERE cur NOT IN (SELECT src FROM edges)
      GROUP BY src
    )
    SELECT e.src AS src_id, r.final_id, r.hops,
           r.src IS NOT NULL AS resolved
    FROM edges e LEFT JOIN resolved r ON r.src = e.src
    """,
)
def redirect_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every redirect to its FINAL target + hop count over the
    deterministic redirect function-graph (src = every doc_id % 8 != 0;
    dst = id-1, except ids ≡ 1 (mod 64) point FORWARD to id+1, making
    every (64k+1, 64k+2) pair a 2-cycle that poisons the 64k+3..64k+7
    chains above it — the loop/unresolved path a real redirect resolver
    must survive). Hop cap 8, engine-side loop handling mirrored by the
    oracle's bounded recursion.

    This is the OFFLINE twin of CrawlConfig.follow_redirects (which
    resolves hops one crawl round at a time): given a captured redirect
    edge table — every crawl log has one — collapse chains before
    frontier expansion, dedup, or link-graph analytics.

    Scale shape: POINTER DOUBLING, not step-at-a-time walking — state
    after 2^k hops composes with itself (done rows pass through, live
    rows join on their current node), so an H-hop cap costs O(log H)
    self-joins/shuffles instead of O(H); each round is one equi-join +
    localCheckpoint (bounded lineage, AQE-skew-splittable), and a
    function graph keeps the frame at exactly one row per origin
    forever — no blow-up. The DuckDB oracle walks the same chains with
    bounded WITH RECURSIVE (its rowcount is O(H·|edges|); the doubling
    plan's is O(log H · |edges|) — the difference IS the scale story).
    """
    docs = load(spark, sf_dir, "documents")
    edges = (
        docs.filter(F.col("doc_id") % 8 != 0)
        .select(
            F.col("doc_id").alias("src"),
            F.when(F.col("doc_id") % 64 == 1, F.col("doc_id") + 1)
            .otherwise(F.col("doc_id") - 1)
            .alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    return _resolve_redirect_chains(edges, max_hops=8)


def _resolve_redirect_chains(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Pointer-doubling resolution over a function graph (each src has
    exactly one outgoing edge) — separated so tests can drive crafted
    chains/loops with hand-computable hop counts. Returns one row per
    src: (src_id, final_id, hops, resolved)."""
    srcs = edges.select(F.col("src").alias("s")).distinct()
    f = edges.join(srcs, edges["dst"] == srcs["s"], "left").select(
        "src",
        "dst",
        F.lit(1).cast("bigint").alias("steps"),
        F.col("s").isNull().alias("done"),
    )
    rounds = max(1, (max_hops - 1).bit_length())  # 2^rounds >= max_hops
    for _ in range(rounds):
        f = f.localCheckpoint(eager=True)
        live = f.filter(~F.col("done"))
        nxt = f.select(
            F.col("src").alias("j_src"),
            F.col("dst").alias("j_dst"),
            F.col("steps").alias("j_steps"),
            F.col("done").alias("j_done"),
        )
        advanced = (
            live.join(nxt, live["dst"] == nxt["j_src"])
            .select(
                "src",
                F.col("j_dst").alias("dst"),
                (F.col("steps") + F.col("j_steps")).alias("steps"),
                F.col("j_done").alias("done"),
            )
        )
        f = f.filter("done").unionByName(advanced)
    done = F.col("done") & (F.col("steps") <= max_hops)
    return f.select(
        F.col("src").alias("src_id"),
        F.when(done, F.col("dst")).alias("final_id"),
        F.when(done, F.col("steps")).alias("hops"),
        done.alias("resolved"),
    )


@query(
    "adaptive_host_throttle",
    """
    WITH probes AS (
      SELECT doc_id % 31 AS host,
             50 + ('0x' || substr(md5('lat:' || doc_id::VARCHAR), 1, 15))::BIGINT
                  % (50 + 60 * (doc_id % 31)) AS latency_ms
      FROM documents
    ),
    r AS (
      SELECT host, latency_ms,
             row_number() OVER (PARTITION BY host ORDER BY latency_ms) AS rn,
             count(*) OVER (PARTITION BY host) AS n
      FROM probes
    ),
    p AS (
      SELECT host,
             max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN latency_ms END) AS p95_ms
      FROM r GROUP BY host
    )
    SELECT host, p95_ms,
           CAST(CASE WHEN p95_ms < 200 THEN 16
                     WHEN p95_ms < 800 THEN 8
                     ELSE 2 END AS INTEGER) AS max_fetches_per_round
    FROM p
    """,
)
def adaptive_host_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host p95 fetch latency → politeness budget band (16 / 8 / 2)
    — the config row feeds schedule_round directly (same column name).
    Hosts are seeded with latency ranges that grow with host id, so the
    bands are genuinely exercised.

    Scale: exact nearest-rank p95 needs the per-host sort window (host
    cardinality ≪ probes; per-host width is the probe retention
    window, bounded); the 100-TB path swaps in approx_percentile's
    mergeable sketch — this exact row exists to calibrate it, like
    events_value_percentiles."""
    docs = load(spark, sf_dir, "documents")
    host = (F.col("doc_id") % 31).alias("host")
    lat = (
        F.lit(50)
        + md5_long(F.concat(F.lit("lat:"), F.col("doc_id").cast("string")))
        % (50 + 60 * (F.col("doc_id") % 31))
    ).alias("latency_ms")
    probes = docs.select(host, lat)
    kw = Window.partitionBy("host")
    r = probes.withColumn(
        "rn", F.row_number().over(kw.orderBy("latency_ms"))
    ).withColumn("n", F.count("*").over(kw))
    p = r.groupBy("host").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.95) * F.col("n")).cast("bigint"),
                F.col("latency_ms"),
            )
        ).alias("p95_ms")
    )
    return p.select(
        "host",
        "p95_ms",
        F.when(F.col("p95_ms") < 200, 16)
        .when(F.col("p95_ms") < 800, 8)
        .otherwise(2)
        .cast("int")
        .alias("max_fetches_per_round"),
    )


# ===========================================================================
# Retry/backoff scheduling (round 5): transient fetch failures (5xx,
# timeouts) retry with capped exponential backoff — the schedule the
# reference's bare http.Get (page_fetcher.go:14-20) lacks entirely.
# Each URL's failure count is synthesized deterministically (md5 gate,
# ~0-4 failures); the retry rounds are the prefix sums of min(2^i, 32),
# computed as ONE JVM aggregate fold per row — no iteration, no join.
# ===========================================================================


@query(
    "retry_backoff_schedule",
    """
    WITH f AS (
      SELECT doc_id,
             ('0x' || substr(md5('retry:' || doc_id::VARCHAR), 1, 15))::BIGINT
               % 8 AS gate
      FROM documents
    ),
    a AS (
      SELECT doc_id,
             CASE WHEN gate < 4 THEN 0 WHEN gate < 6 THEN 1
                  WHEN gate = 6 THEN 3 ELSE 5 END AS failures
      FROM f
    )
    SELECT doc_id, failures,
           failures >= 5 AS dead,
           CAST(CASE WHEN failures >= 5 THEN NULL
                ELSE coalesce(list_sum(
                  [least(2 ** i, 32) for i in range(1, failures + 1)]), 0)
                END AS BIGINT) AS wait_rounds,
           CAST(failures + 1 AS BIGINT) AS attempts
    FROM a
    """,
)
def retry_backoff_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL retry schedule under capped exponential backoff
    (min(2^attempt, 32) rounds between attempts, dead after 5
    failures): total wait = Σ of the per-attempt delays, NULL for dead
    URLs. All integer; the delay fold is a JVM transform+aggregate over
    a per-row sequence — zero joins, zero shuffles beyond the scan, so
    a 10^10-URL retry ledger prices at scan speed. The engine analog
    consumes this as frontier rows tagged with a future round (the
    crawl-delay machinery already defers by round arithmetic)."""
    docs = load(spark, sf_dir, "documents")
    gate = md5_long(
        F.concat(F.lit("retry:"), F.col("doc_id").cast("string"))
    ) % 8
    failures = (
        F.when(gate < 4, 0)
        .when(gate < 6, 1)
        .when(gate == 6, 3)
        .otherwise(5)
    )
    a = docs.select("doc_id", failures.alias("failures"))
    wait = F.aggregate(
        F.sequence(F.lit(1), F.col("failures")),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.least(F.pow(F.lit(2), i).cast("long"), F.lit(32)),
    )
    return a.select(
        "doc_id",
        "failures",
        (F.col("failures") >= 5).alias("dead"),
        F.when(F.col("failures") >= 5, F.lit(None).cast("bigint"))
        .otherwise(F.when(F.col("failures") == 0, F.lit(0)).otherwise(wait))
        .alias("wait_rounds"),
        (F.col("failures") + 1).cast("bigint").alias("attempts"),
    )


# ===========================================================================
# Rendezvous (HRW) routing (round 5): the fetcher-assignment shard map —
# every host goes to the worker with the highest hash(host, worker)
# score. The defining property (and the reason over mod-N): adding a
# worker moves a host ONLY to the new worker (≈1/(W+1) of hosts), never
# between old workers — re-sharding a 10^7-host frontier costs the
# minimum possible movement. Both the W=8 and W=9 maps are computed and
# the property is part of the oracled output.
# ===========================================================================


@query(
    "rendezvous_routing",
    """
    WITH hosts AS (
      SELECT DISTINCT 'h' || (doc_id % 97)::VARCHAR || '.test' AS host
      FROM documents
    ),
    scores AS (
      SELECT host, w.w,
             ('0x' || substr(md5(host || ':' || w.w::VARCHAR), 1, 15))::BIGINT
               AS score
      FROM hosts CROSS JOIN (SELECT unnest(range(9)) AS w) AS w
    ),
    pick AS (
      SELECT host,
             max_by(w, score) FILTER (WHERE w < 8) AS w8,
             max_by(w, score) AS w9
      FROM scores GROUP BY host
    )
    SELECT host, CAST(w8 AS BIGINT) AS w8, CAST(w9 AS BIGINT) AS w9,
           w8 != w9 AS moved,
           (w8 = w9) OR (w9 = 8) AS minimal_disruption
    FROM pick
    """,
)
def rendezvous_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-random-weight worker assignment per host at W=8 and W=9,
    plus the HRW invariant as a column: a host either keeps its worker
    or moves to the NEW worker (minimal_disruption is true for every
    row — also asserted in pytest so a broken hash can't silently pass
    as 'all moved somewhere').

    Scale: scores = hosts × W (W is small) computed columnar, the pick
    is one max_by hash aggregate (map-side combined) — no window, no
    shuffle beyond the host agg; md5-based scores match the DuckDB twin
    bit-for-bit (md5_long convention)."""
    docs = load(spark, sf_dir, "documents")
    hosts = docs.select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % 97).cast("string"), F.lit(".test")
        ).alias("host")
    ).distinct()
    workers = spark.range(9).select(F.col("id").cast("int").alias("w"))
    scores = hosts.crossJoin(F.broadcast(workers)).select(
        "host",
        "w",
        md5_long(
            F.concat(F.col("host"), F.lit(":"), F.col("w").cast("string"))
        ).alias("score"),
    )
    pick = scores.groupBy("host").agg(
        F.max_by("w", F.when(F.col("w") < 8, F.col("score"))).alias("w8"),
        F.max_by("w", "score").alias("w9"),
    )
    return pick.select(
        "host",
        F.col("w8").cast("bigint").alias("w8"),
        F.col("w9").cast("bigint").alias("w9"),
        (F.col("w8") != F.col("w9")).alias("moved"),
        ((F.col("w8") == F.col("w9")) | (F.col("w9") == 8)).alias(
            "minimal_disruption"
        ),
    )


# ===========================================================================
# TF-IDF keyword extraction (round 5): the classic per-doc top-k salient
# terms (tag clouds, index summaries, weak topic labels). idf is
# INTEGERIZED — floor((10^6 · N) / df) — instead of ln(N/df): libm log
# differs by ulps across engines and a float score can flip a rank; the
# scaled-rational idf preserves the df ordering exactly and both
# engines' integer division agrees bit-for-bit.
# ===========================================================================


@query(
    "tfidf_keywords",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM tf)
    SELECT doc_id, term, tf, score FROM (
      SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * ((1000000 * n.n) // df.df) AS score,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * ((1000000 * n.n) // df.df) DESC, tf.term
             ) AS rk
      FROM tf JOIN df USING (term) CROSS JOIN n
    ) WHERE rk <= 3
    """,
)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document, term-asc tie-break.

    Scale: tf = one (doc,term) hash agg, MATERIALIZED once
    (localCheckpoint) because three consumers read it (df agg, N agg,
    join probe) and Spark would otherwise re-tokenize the corpus per
    consumer (plan-audited: 2 parquet scans before, 1 after); df = one
    term agg over the materialized tf; N broadcasts as a one-row
    aggregate; the only window partitions by doc_id with per-doc width
    bounded by the 100 KB text cap — no global sort anywhere. At 100 TB
    the checkpoint becomes a persisted tf table and the join key
    xxhash64(term)."""
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(words(F.col("text"))).alias("term"))
    tf = (
        w.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = tf.agg(F.count_distinct("doc_id").alias("n"))
    score = F.col("tf") * F.expr("(1000000 * n) div df")
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "score")
    )


# ===========================================================================
# Anchor-text aggregation (round 5): the classic web-search signal the
# reference's link extractor feeds (extractor_service.go pulls hrefs;
# search engines describe a TARGET page by the text of links pointing
# AT it). Links are synthesized over the same deterministic 2-out graph
# as crawl_snapshot_delta; each link carries the source doc's leading
# 3 words as anchor text. Per target: link count, distinct anchor
# count, and the dominant anchor (count desc, anchor asc).
# ===========================================================================


@query(
    "anchor_text_rollup",
    """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    links AS (
      SELECT (2 * doc_id + 1) % (SELECT n FROM nn) AS target,
             array_to_string((string_split(lower(text), ' '))[1:3], ' ') AS anchor
      FROM documents
      UNION ALL
      SELECT (3 * doc_id + 7) % (SELECT n FROM nn),
             array_to_string((string_split(lower(text), ' '))[1:3], ' ')
      FROM documents
    ),
    pa AS (SELECT target, anchor, count(*) AS cnt FROM links GROUP BY 1, 2),
    ranked AS (
      SELECT target, anchor, cnt,
             row_number() OVER (
               PARTITION BY target ORDER BY cnt DESC, anchor
             ) AS rk,
             CAST(sum(cnt) OVER (PARTITION BY target) AS BIGINT) AS n_links,
             CAST(count(*) OVER (PARTITION BY target) AS BIGINT) AS n_anchors
      FROM pa
    )
    SELECT target, n_links, n_anchors, anchor AS top_anchor,
           cnt AS top_count
    FROM ranked WHERE rk = 1
    """,
)
def anchor_text_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text rollup with the dominant anchor picked by
    a min(struct) AGGREGATE, not a window: (-cnt, anchor) orders
    count-desc/anchor-asc, so the pick partial-aggregates map-side — a
    10^8-inlink hub never sorts in one task (the oracle's row_number
    window is the naive rendition). Two hash shuffles total:
    (target, anchor) counts, then the target rollup."""
    docs = load(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").alias("n"))
    anchor = F.concat_ws(" ", F.slice(words(F.col("text")), 1, 3))
    links = (
        docs.crossJoin(F.broadcast(n))
        .select(
            ((2 * F.col("doc_id") + 1) % F.col("n")).alias("target"),
            anchor.alias("anchor"),
        )
        .unionAll(
            docs.crossJoin(F.broadcast(n)).select(
                ((3 * F.col("doc_id") + 7) % F.col("n")).alias("target"),
                anchor.alias("anchor"),
            )
        )
    )
    pa = links.groupBy("target", "anchor").agg(F.count("*").alias("cnt"))
    best = F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("anchor").alias("a")))
    return (
        pa.groupBy("target")
        .agg(
            F.sum("cnt").alias("n_links"),
            F.count("*").alias("n_anchors"),
            best.alias("best"),
        )
        .select(
            "target",
            "n_links",
            "n_anchors",
            F.col("best.a").alias("top_anchor"),
            (-F.col("best.neg")).alias("top_count"),
        )
    )


# ===========================================================================
# Temperature-weighted source mixing (round 5): pretraining corpora are
# not sampled uniformly — rare sources are upweighted by sampling
# source s with probability ∝ n_s^α (α<1 flattens the mixture; the
# multilingual-BERT / XLM-R exponent trick). Rendered as a per-doc
# deterministic keep gate: keep_rate_s = sqrt(n_min / n_s) at α=0.5
# (the rarest source keeps 100%), gate = md5-uniform(doc) < rate.
# IEEE sqrt and division are correctly rounded in both engines and the
# gate compares against floor(rate·10^6) as an integer, so the kept
# set is bit-identical. Scale shape: one hash aggregate for the
# per-source counts (tiny — broadcast back), one columnar gate pass;
# no shuffle of the corpus itself.
# ===========================================================================


@query(
    "mixture_sample_alpha",
    """
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 < 6 THEN 'head'
                  WHEN doc_id % 10 < 9 THEN 'mid'
                  ELSE 'tail' END AS grp
      FROM documents
    ),
    counts AS (SELECT grp, count(*) AS n_s FROM tagged GROUP BY grp),
    m AS (SELECT min(n_s) AS n_min FROM counts),
    gated AS (
      SELECT d.grp,
             CASE WHEN ('0x' || substr(md5('mix:' || d.doc_id), 1, 15))::BIGINT % 1000000
                       < CAST(floor(sqrt(CAST(m.n_min AS DOUBLE) / c.n_s) * 1000000) AS BIGINT)
                  THEN 1 ELSE 0 END AS keep
      FROM tagged d JOIN counts c ON c.grp = d.grp CROSS JOIN m
    )
    SELECT grp,
           count(*) AS n_docs,
           CAST(sum(keep) AS BIGINT) AS n_kept
    FROM gated GROUP BY grp
    """,
)
def mixture_sample_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=0.5 source-temperature sampling over a seeded 60/30/10
    head/mid/tail mixture (the flat table's real sources are uniform,
    which would gate nothing): per-group keep rates from
    one broadcast count aggregate, per-doc md5 gates (same
    deterministic-gate machinery as stratified_sample), integerized
    rate comparison so both engines keep the identical doc set."""
    docs = load(spark, sf_dir, "documents")
    grp = (
        F.when(F.col("doc_id") % 10 < 6, F.lit("head"))
        .when(F.col("doc_id") % 10 < 9, F.lit("mid"))
        .otherwise(F.lit("tail"))
    )
    tagged = docs.select("doc_id", grp.alias("grp"))
    counts = tagged.groupBy("grp").agg(F.count("*").alias("n_s"))
    n_min = counts.agg(F.min("n_s").alias("n_min"))
    rate = F.floor(
        F.sqrt(F.col("n_min").cast("double") / F.col("n_s")) * 1000000
    ).cast("bigint")
    gate = md5_long(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
    keep = F.when(gate % 1000000 < rate, 1).otherwise(0)
    return (
        tagged.join(F.broadcast(counts), "grp")
        .crossJoin(F.broadcast(n_min))
        .select("grp", keep.alias("keep"))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_kept"),
        )
    )


# ===========================================================================
# Round-5 session-3 additions: freshness-driven recrawl scheduling,
# exact host budget apportionment, and interleaved span alignment —
# the crawl-lifecycle shapes (WHEN to refetch, HOW MUCH per host, and
# WHAT a media span means in context) none of the queries above cover.
# ===========================================================================


@query(
    "recrawl_schedule",
    """
    SELECT user_id AS page_id,
           count(*) AS n_observations,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS span_ms,
           CASE WHEN count(*) >= 2
                THEN (epoch_ms(max(ts)) - epoch_ms(min(ts))) // (count(*) - 1)
                ELSE 86400000 END AS mean_interval_ms,
           epoch_ms(max(ts)) +
           CASE WHEN count(*) >= 2
                THEN (epoch_ms(max(ts)) - epoch_ms(min(ts))) // (count(*) - 1)
                ELSE 86400000 END AS next_due_ms
    FROM events GROUP BY user_id
    """,
)
def recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven refetch scheduling (Cho & Garcia-Molina
    synchronization policy, simplest estimator): per page (events'
    user_id standing in as the page key, its event stream as the
    observed-change log), the Poisson-ish mean change interval
    span/(n-1) sets next_due = last_observed + mean_interval; pages
    with a single observation fall back to a 1-day default. All
    arithmetic is integer epoch-ms (zone-free ntz_epoch_ms, floor
    division) so both engines schedule the identical instant.

    Scale: ONE hash aggregate with map-side combine — the schedule for
    10^10 pages is a single shuffle of partial (count, min, max)
    triples; the due-check against the current round's clock is then a
    partition-local filter."""
    events = load(spark, sf_dir, "events")
    g = events.groupBy(F.col("user_id").alias("page_id")).agg(
        F.count("*").alias("n_observations"),
        (ntz_epoch_ms(F.max("ts")) - ntz_epoch_ms(F.min("ts"))).alias("span_ms"),
        ntz_epoch_ms(F.max("ts")).alias("last_ms"),
    )
    interval = (
        F.when(
            F.col("n_observations") >= 2,
            F.floor(F.col("span_ms") / (F.col("n_observations") - 1)),
        )
        .otherwise(F.lit(86_400_000))
        .cast("bigint")
    )
    return g.select(
        "page_id",
        "n_observations",
        "span_ms",
        interval.alias("mean_interval_ms"),
        (F.col("last_ms") + interval).alias("next_due_ms"),
    )


@query(
    "host_budget_allocation",
    """
    WITH hosts AS (
      SELECT doc_id % 37 AS host, count(*) AS queue_size
      FROM documents GROUP BY 1
    ),
    tot AS (SELECT sum(queue_size) AS q_total FROM hosts),
    base AS (
      SELECT host, queue_size,
             (1000 * queue_size) // q_total AS base,
             (1000 * queue_size) % q_total AS frac_num
      FROM hosts CROSS JOIN tot
    ),
    leftover AS (SELECT 1000 - sum(base) AS extra FROM base),
    ranked AS (
      SELECT b.host, b.queue_size, b.base, b.frac_num, l.extra,
             row_number() OVER (ORDER BY b.frac_num DESC, b.host ASC) AS rk
      FROM base b CROSS JOIN leftover l
    )
    SELECT host, queue_size,
           base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS budget
    FROM ranked
    """,
)
def host_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact largest-remainder (Hamilton) apportionment of a global
    per-round fetch budget (G=1000) across hosts proportional to their
    frontier queue sizes — the adaptive companion to the fixed per-host
    politeness budget (W2): Σ budget == G exactly, every host gets
    ⌊G·q/Q⌋ or that +1, and the +1s go to the largest fractional
    remainders. Remainders compare as INTEGERS ((G·q) mod Q — never a
    float quota), host-asc tie-break, so both engines hand the same
    hosts the same extra unit.

    This query runs the PRODUCTION operator
    (operators/politeness.allocate_global_budget) over a synthesized
    frontier — the DuckDB twin is the independent re-derivation, so the
    oracle gates the operator itself instead of a third copy of the
    formula that could drift. Hosts are zero-padded (h00..h36) so the
    operator's string host-asc tie-break and the oracle's integer one
    rank remainder ties identically.

    Scale: queue sizes = one map-side-combined hash agg over the
    frontier; everything after runs on the HOSTS table (distinct hosts
    ≪ URLs — the robots-gate bound), so the global remainder-rank
    window sorts a frame orders of magnitude smaller than the data,
    with Q and the leftover joining in as broadcast one-row aggregates."""
    from .operators.politeness import allocate_global_budget

    docs = load(spark, sf_dir, "documents")
    frontier = docs.select(
        F.lit(1).cast("long").alias("scraping_id"),
        F.lit(1).cast("long").alias("user_id"),
        F.format_string(
            "http://h%02d.test/p%d",
            (F.col("doc_id") % 37).cast("int"),
            F.col("doc_id").cast("long"),
        ).alias("url"),
        F.lit(2).alias("depth"),
        F.lit(0).alias("round"),
    )
    alloc = allocate_global_budget(frontier, 1000, None).select(
        F.regexp_extract("host", r"^h(\d+)\.test$", 1)
        .cast("bigint")
        .alias("host"),
        F.col("max_fetches_per_round").cast("bigint").alias("budget"),
    )
    hosts = docs.groupBy((F.col("doc_id") % 37).alias("host")).agg(
        F.count("*").alias("queue_size")
    )
    return hosts.join(alloc, "host").select("host", "queue_size", "budget")


@query(
    "caption_align",
    """
    WITH spans AS (
      SELECT d.doc_id, CAST(gs.k AS INTEGER) AS off,
             CASE WHEN (d.doc_id + gs.k) % 3 = 0 THEN 'image' ELSE 'text' END AS kind,
             'w' || d.doc_id::VARCHAR || '_' || gs.k::VARCHAR AS txt,
             'img' || d.doc_id::VARCHAR || '_' || gs.k::VARCHAR AS media_ref
      FROM documents d CROSS JOIN range(0, 7) AS gs(k)
      WHERE gs.k <= d.doc_id % 5 + 2
    )
    SELECT s.doc_id, s.off AS span_offset, s.media_ref,
           coalesce((SELECT t.txt FROM spans t
            WHERE t.doc_id = s.doc_id AND t.kind = 'text' AND t.off < s.off
            ORDER BY t.off DESC LIMIT 1), '') AS caption
    FROM spans s WHERE s.kind = 'image'
    """,
)
def caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-span caption alignment (the input_hint's text+media
    interleaving made load-bearing): every image span pairs with the
    NEAREST PRECEDING text span of its own document — the span-level
    analog of J3's image→latest-parent resolution, and the alignment a
    multimodal training pipeline runs to caption its images. The span
    sequence is synthesized deterministically per doc (3-7 spans, every
    (doc_id+k)%3==0 an image), the oracle re-derives it relationally
    and answers with a correlated last-before probe.

    Scale: the whole alignment is ONE JVM higher-order fold
    (F.aggregate) over each row's span array — a single forward scan
    carrying the last-seen text, zero shuffles, zero Python; the only
    wide-ish op is the final explode of per-doc results (narrow). A
    100-TB interleaved corpus captions itself at scan speed."""
    docs = load(spark, sf_dir, "documents")
    n = (F.col("doc_id") % 5 + 3).cast("int")

    def mk_span(k):
        return F.struct(
            F.when((F.col("doc_id") + k) % 3 == 0, F.lit("image"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            F.concat(
                F.lit("w"), F.col("doc_id").cast("string"), F.lit("_"), k.cast("string")
            ).alias("txt"),
            F.concat(
                F.lit("img"),
                F.col("doc_id").cast("string"),
                F.lit("_"),
                k.cast("string"),
            ).alias("media_ref"),
            k.cast("int").alias("off"),
        )

    spans = F.transform(F.sequence(F.lit(0), n - 1), mk_span)
    out_t = "array<struct<span_offset:int,media_ref:string,caption:string>>"
    acc0 = F.struct(
        F.lit(None).cast("string").alias("cap"),
        F.array().cast(out_t).alias("out"),
    )
    folded = F.aggregate(
        spans,
        acc0,
        lambda acc, s: F.when(
            s["kind"] == "text",
            F.struct(s["txt"].alias("cap"), acc["out"].alias("out")),
        ).otherwise(
            F.struct(
                acc["cap"].alias("cap"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            s["off"].alias("span_offset"),
                            s["media_ref"].alias("media_ref"),
                            acc["cap"].alias("caption"),
                        )
                    ),
                ).alias("out"),
            )
        ),
    )
    # caption '' = image precedes any text span (doc opens with an
    # image): a concrete sentinel, not NULL, so comparators that can't
    # order NULL against strings (the driver's sort) never see one
    return docs.select("doc_id", F.explode(folded["out"]).alias("s")).select(
        "doc_id",
        "s.span_offset",
        "s.media_ref",
        F.coalesce("s.caption", F.lit("")).alias("caption"),
    )


@query(
    "dedup_url_canonical",
    """
    WITH variants AS (
      SELECT doc_id,
             doc_id % 7 AS h,
             doc_id % 6 AS v
      FROM documents
    ),
    urls AS (
      SELECT doc_id,
             CASE v
               WHEN 0 THEN 'HTTP://Host' || h::VARCHAR || '.Test/a/b'
               WHEN 1 THEN 'http://host' || h::VARCHAR || '.test:80/a/b'
               WHEN 2 THEN 'https://HOST' || h::VARCHAR || '.TEST:443/a/b'
               WHEN 3 THEN 'http://host' || h::VARCHAR || '.test/a/b#frag'
               WHEN 4 THEN 'http://host' || h::VARCHAR || '.test/x/../a/b'
               ELSE        'http://host' || h::VARCHAR || '.test/./a/b'
             END AS url,
             CASE WHEN v = 2
                  THEN 'https://host' || h::VARCHAR || '.test/a/b'
                  ELSE 'http://host'  || h::VARCHAR || '.test/a/b'
             END AS canonical_url
      FROM variants
    )
    SELECT canonical_url,
           count(*) AS n_urls,
           count(DISTINCT url) AS n_spellings,
           min(url) AS first_spelling
    FROM urls GROUP BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-identity dedup through the pure-JVM canonicalizer
    (functions/url.py canonical_url_col — the claim-tagging / corpus-
    bucket-routing hash key) put under the ORACLE gate: six messy
    spellings per host (scheme/netloc case, default :80/:443 ports,
    fragments, `/../` and `/./` dot-segments) must collapse to the
    canonical the twin constructs BY HAND — the oracle never runs a
    canonicalizer, it knows what the answer must be, so any
    canonicalization drift breaks the hash compare.

    Scale: the canonicalizer is a whole-stage-codegen expression fold
    (zero Python); dedup is one hash aggregate on its output — the
    same shape the crawl's seen-set claim uses per round."""
    from .functions.url import canonical_url_col

    docs = load(spark, sf_dir, "documents")
    h = (F.col("doc_id") % 7).cast("string")
    v = F.col("doc_id") % 6
    url = (
        F.when(v == 0, F.concat(F.lit("HTTP://Host"), h, F.lit(".Test/a/b")))
        .when(v == 1, F.concat(F.lit("http://host"), h, F.lit(".test:80/a/b")))
        .when(v == 2, F.concat(F.lit("https://HOST"), h, F.lit(".TEST:443/a/b")))
        .when(v == 3, F.concat(F.lit("http://host"), h, F.lit(".test/a/b#frag")))
        .when(v == 4, F.concat(F.lit("http://host"), h, F.lit(".test/x/../a/b")))
        .otherwise(F.concat(F.lit("http://host"), h, F.lit(".test/./a/b")))
    )
    return (
        docs.select(url.alias("url"))
        .select("url", canonical_url_col("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_spellings"),
            F.min("url").alias("first_spelling"),
        )
    )


@query(
    "curriculum_bins",
    """
    WITH r AS (
      SELECT n_chars, row_number() OVER (ORDER BY n_chars) AS rn,
             count(*) OVER () AS n
      FROM documents
    ),
    cuts AS (
      SELECT max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN n_chars END) AS q1,
             max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN n_chars END) AS q2,
             max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN n_chars END) AS q3
      FROM r
    )
    SELECT CAST(1 + CAST(n_chars > q1 AS INTEGER)
                  + CAST(n_chars > q2 AS INTEGER)
                  + CAST(n_chars > q3 AS INTEGER) AS INTEGER) AS bin,
           count(*) AS n_docs,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents CROSS JOIN cuts
    GROUP BY 1
    """,
)
def curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: quartile buckets over a difficulty proxy
    (n_chars) with EXACT nearest-rank cutpoints (the same ceil
    convention as events_value_percentiles), then per-bin stats — the
    ordering stage of curriculum training-data layout.

    Scale: this exact form is the correctness baseline (one global
    rank window to find 3 cut VALUES). The 100-TB path swaps the
    window for `approx_percentile`'s mergeable sketch — the binning
    itself is already the scale shape: 3 cut values broadcast via a
    one-row cross join, assignment is pure arithmetic, and the rollup
    is a 4-group hash aggregate."""
    docs = load(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars")
    r = (
        docs.select("n_chars")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy()))
    )

    def pick(p: float, alias: str) -> Column:
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"),
                F.col("n_chars"),
            )
        ).alias(alias)

    cuts = r.agg(pick(0.25, "q1"), pick(0.50, "q2"), pick(0.75, "q3"))
    bin_col = (
        F.lit(1)
        + (F.col("n_chars") > F.col("q1")).cast("int")
        + (F.col("n_chars") > F.col("q2")).cast("int")
        + (F.col("n_chars") > F.col("q3")).cast("int")
    ).cast("int")
    return (
        docs.crossJoin(F.broadcast(cuts))
        .select(bin_col.alias("bin"), "n_chars")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# ===========================================================================
# Vocabulary fuzzy matching (SymSpell deletion-neighborhood index) — typo
# clustering / spell-candidate generation over a corpus vocabulary without
# an all-pairs edit-distance join
# ===========================================================================


@query(
    "symspell_fuzzy_pairs",
    r"""
    WITH vocab AS (
      SELECT DISTINCT t AS term FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
      ) WHERE regexp_matches(t, '^[a-z]{3,}$')
    )
    SELECT a.term AS term_a, b.term AS term_b,
           CAST(levenshtein(a.term, b.term) AS BIGINT) AS dist
    FROM vocab a JOIN vocab b ON a.term < b.term
    WHERE levenshtein(a.term, b.term) <= 2
    """,
)
def symspell_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vocabulary term pairs within edit distance <= 2 — the typo-
    correction / query-expansion primitive (SymSpell): candidates come
    from a DELETION-NEIGHBORHOOD equi-join, never an all-pairs
    levenshtein scan.

    SymSpell's invariant: lev(a, b) <= d implies the <=d-deletion
    neighborhoods of a and b intersect (delete from each side the
    positions an optimal alignment edits). Intersection is necessary
    but not sufficient ("ab"/"ba" share deletes at lev 2 margins), so
    candidates are verified with the real JVM levenshtein — the index
    prunes, the verify step restores exactness. The oracle brute-forces
    the a < b cross join with the same levenshtein (exactness is the
    contract; the PLAN is the difference).

    Scale shape: a 100-TB corpus vocabulary is ~10^7-10^8 terms — an
    all-pairs join is 10^14+ levenshtein calls; the deletion index is
    O(V * L^2) keys (L ~ 8 => ~40 keys/term), the join is a plain
    hash equi-join on the key, and verification touches only bucket
    cohabitants. All JVM: substr/sequence/transform build the
    neighborhoods, F.levenshtein verifies — zero Python."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(words(F.col("text"))).alias("term"))
        .filter(F.col("term").rlike(r"^[a-z]{3,}$"))
        .distinct()
    )
    t, L = F.col("term"), F.length("term")
    # substr is 1-based; substr(t, p, 0) == "" makes the edges exact
    d1 = F.transform(
        F.sequence(F.lit(1), L),
        lambda i: F.concat(F.substr(t, F.lit(1), i - 1), F.substr(t, i + 1, L)),
    )
    d2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L - 1),
            lambda i: F.transform(
                F.sequence(i + 1, L),
                lambda j: F.concat(
                    F.substr(t, F.lit(1), i - 1),
                    F.substr(t, i + 1, j - i - 1),
                    F.substr(t, j + 1, L),
                ),
            ),
        )
    )
    keyed = vocab.select(
        "term",
        F.explode(
            F.array_distinct(F.concat(F.array(t), d1, d2))
        ).alias("del_key"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.del_key") == F.col("b.del_key"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .select(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .distinct()  # many shared keys per true pair; verify each pair once
        .withColumn(
            "dist", F.levenshtein("term_a", "term_b").cast("bigint")
        )
        .filter(F.col("dist") <= 2)
    )


# ===========================================================================
# Heavy hitters (two-pass Misra-Gries) — frequent-term mining when the
# distinct-key space is too large to shuffle
# ===========================================================================


@query(
    "heavy_hitters",
    """
    WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
    g AS (SELECT ws[i] || ' ' || ws[i + 1] AS term
          FROM w, unnest(range(1, len(ws))) AS r(i)),
    tot AS (SELECT count(*) AS n FROM g)
    SELECT term, count(*) AS freq
    FROM g GROUP BY term
    HAVING count(*) * 600 > (SELECT n FROM tot)
    """,
)
def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters — every word bigram with frequency strictly
    above n/k (k=600) — via the classic TWO-PASS Misra-Gries scheme:

    pass 1 builds a k-counter MG summary PER PARTITION (mapInPandas:
    per-Arrow-batch exact counts folded with the Agarwal-et-al
    mergeable-summaries step — add pointwise, subtract the (k+1)-st
    largest, drop <= 0 — so each partition ships <= k candidate rows,
    error <= n_p/(k+1)); pass 2 exact-counts ONLY the candidate terms
    (broadcast semi-join) and keeps freq * k > n. Pigeonhole makes the
    union of partition summaries a SUPERSET of every global heavy
    hitter (freq > n/k => some partition has freq_p > n_p/k), and the
    exact second pass discards over-admitted candidates — so the output
    is EXACTLY {t : freq(t) * k > n}, independent of partitioning (a
    pytest pins repartition invariance).

    Scale shape: heavy-tailed n-gram spaces at 100 TB have |distinct|
    ~ |rows|; a plain groupBy shuffles every distinct key's partial
    aggregate, while this shuffles <= k rows per partition (the sketch)
    plus the candidate-row subset — the shuffle is bounded by the
    answer size, not the keyspace. The integer guard freq * k > n
    avoids float division in both engines."""
    import pandas as pd  # local: workers must not need this module

    k = 600
    docs = load(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(word_ngrams(words(F.col("text")), 2)).alias("term")
    )

    def mg_partition(batches):
        acc: dict = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for term, c in pdf["term"].value_counts().items():
                acc[term] = acc.get(term, 0) + int(c)
            if len(acc) > k:
                kth = sorted(acc.values(), reverse=True)[k]
                acc = {t: c - kth for t, c in acc.items() if c > kth}
        # one NULL-term row carries the partition's row count, so the
        # global n rides pass 1 instead of costing a third corpus scan
        # (review finding, round 5 session 5)
        if seen:
            yield pd.DataFrame(
                {"term": list(acc) + [None], "pn": [0] * len(acc) + [seen]}
            )

    summaries = grams.mapInPandas(
        mg_partition, "term string, pn long"
    ).localCheckpoint(eager=True)  # <= k+1 rows/partition; scanned twice
    candidates = summaries.filter(F.col("term").isNotNull()).select(
        "term"
    ).distinct()
    total = summaries.agg(F.sum("pn").alias("n"))
    return (
        grams.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * k > F.col("n"))
        .select("term", "freq")
    )


# ===========================================================================
# Distinct-count sketch (HyperLogLog, engine-portable) — cardinality at
# 100 TB without an exact-distinct shuffle
# ===========================================================================


@query(
    "hll_distinct_users",
    """
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hash
      FROM events
    ),
    reg AS (
      SELECT event_type, hash % 128 AS register,
             max(CASE WHEN hash // 128 > 0
                      THEN 53 - length(bin(hash // 128)) + 1
                      ELSE 54 END) AS rho
      FROM h GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type,
             count(*) AS n_present,
             sum((2::BIGINT) ^ (54 - rho))::BIGINT AS t_present
      FROM reg GROUP BY 1
    ),
    e AS (
      SELECT event_type,
             (t_present + (128 - n_present) * (2::BIGINT ^ 54))::BIGINT
               AS t_sum,
             128 - n_present AS v_empty
      FROM s
    )
    SELECT e.event_type,
           x.n_exact,
           e.t_sum,
           CASE WHEN 2.1111058772341745e+20 / e.t_sum <= 320.0
                     AND e.v_empty > 0
                THEN 128.0 * ln(128.0 / e.v_empty)
                ELSE 2.1111058772341745e+20 / e.t_sum END AS hll_estimate
    FROM e JOIN (
      SELECT event_type, count(DISTINCT user_id) AS n_exact
      FROM events GROUP BY 1
    ) x USING (event_type)
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type by a hand-rolled, ENGINE-PORTABLE
    HyperLogLog (m=128 registers, md5-derived hash: 7 low bits pick the
    register, rho = leading-zero rank of the 53-bit remainder), with
    the standard small-range linear-counting correction (raw < 2.5m and
    empty registers present => m*ln(m/V)). Exact count rides along so
    the sketch error is visible in the row.

    Spark's own approx_count_distinct is a (different, JVM-private)
    HLL++ — useless for a cross-engine oracle; this one is built from
    portable primitives (md5, bin-length, integer div/mod), so DuckDB
    computes the IDENTICAL registers and the float estimate reduces to
    one division (or one ln) of exact integers — deterministic to the
    comparator's rounding in both engines.

    Scale shape: registers are MAX-MERGEABLE — the groupBy(type,
    register) max(rho) does map-side partial max, so each partition
    ships <= m rows per group key regardless of row count, and the
    register table IS the resumable sketch state (OR-in new days by
    max). The exact-distinct column here is the oracle's luxury at
    sf0.01; at 100 TB only the sketch side runs. t_sum =
    sum_j 2^(54 - M_j) stays an exact bigint (<= 128 * 2^54 < 2^62),
    so all cross-engine arithmetic is integer until the final
    division."""
    events = load(spark, sf_dir, "events")
    hash_c = md5_long(F.col("user_id").cast("string"))
    h = events.select(
        "event_type",
        (hash_c % 128).alias("register"),
        # shiftright IS hash // 128 for the non-negative 60-bit hash —
        # a `/` here would round-trip through double (53-bit mantissa)
        # and flip rho at power-of-two boundaries vs the oracle's exact
        # integer division (review finding, round 5 session 5)
        F.shiftright(hash_c, 7).alias("rest"),
    )
    reg = h.groupBy("event_type", "register").agg(
        F.max(
            F.when(
                F.col("rest") > 0,
                F.lit(53) - F.length(F.bin("rest")) + F.lit(1),
            ).otherwise(F.lit(54))
        ).alias("rho")
    )
    two = F.lit(2).cast("bigint")
    s = reg.groupBy("event_type").agg(
        F.count("*").alias("n_present"),
        F.sum(F.pow(two, F.lit(54) - F.col("rho")).cast("bigint"))
        .cast("bigint")
        .alias("t_present"),
    )
    e = s.select(
        "event_type",
        (
            F.col("t_present")
            + (F.lit(128) - F.col("n_present"))
            * F.pow(two, F.lit(54)).cast("bigint")
        )
        .cast("bigint")
        .alias("t_sum"),
        (F.lit(128) - F.col("n_present")).alias("v_empty"),
    )
    raw = F.lit(2.1111058772341745e20) / F.col("t_sum")
    est = F.when(
        (raw <= 320.0) & (F.col("v_empty") > 0),
        F.lit(128.0) * F.log(F.lit(128.0) / F.col("v_empty")),
    ).otherwise(raw)
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        e.join(exact, "event_type")
        .select("event_type", "n_exact", "t_sum", est.alias("hll_estimate"))
    )


# ===========================================================================
# Community detection (synchronous label propagation) — the mode-of-
# neighbors semantics connected components can't express
# ===========================================================================


def _lpa_sql(rounds: int = 4) -> str:
    """Unrolled synchronous-LPA oracle (generated, like _pagerank_sql):
    one vote CTE + one argmax CTE per round."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(
            f"""
    v{i} AS (
      SELECT e.src AS id, l.label, count(*) AS c
      FROM bidir e JOIN l{i - 1} l ON l.id = e.dst
      GROUP BY 1, 2
    ),
    l{i} AS (
      SELECT id, label FROM (
        SELECT id, label,
               row_number() OVER (PARTITION BY id ORDER BY c DESC, label) rn
        FROM v{i}) WHERE rn = 1
    )"""
        )
    return f"""
    WITH nn AS (SELECT count(*) AS n FROM documents),
    und AS (
      SELECT doc_id AS u, doc_id + 1 AS v FROM documents
      WHERE doc_id % 16 <> 15 AND doc_id + 1 < (SELECT n FROM nn)
      UNION ALL
      SELECT doc_id, doc_id + 16 FROM documents
      WHERE doc_id % 64 = 0 AND doc_id + 16 < (SELECT n FROM nn)
    ),
    bidir AS (
      SELECT u AS src, v AS dst FROM und
      UNION ALL SELECT v, u FROM und
    ),
    l0 AS (SELECT doc_id AS id, doc_id AS label FROM documents),
    {",".join(steps)}
    SELECT id AS node_id, label AS community FROM l{rounds}
    """


@query("label_propagation", _lpa_sql(4))
def label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community labels after EXACTLY 4 synchronous label-propagation
    rounds over a planted block-chain graph (chains of 16 consecutive
    doc_ids + a bridge every 64): each round every node adopts the most
    frequent label among its neighbors, ties broken by MIN label — the
    fixed-round contract makes partial convergence part of the spec, so
    the result is deterministic without an unbounded fixpoint.

    vs dedup_clusters (pointer-jumping CC): LPA's vote is a MODE, not a
    min — it separates densely-knit blocks that CC would merge through
    a single bridge edge. The argmax is min(struct(-count, label)) — a
    plain aggregate, no per-node sort window.

    Scale shape: per round, one equi-join (labels onto the bidirected
    edge list) + two hash aggregates, all key-partitioned — O(E) per
    round with map-side partial counts, localCheckpoint bounds lineage
    exactly like the pagerank/HITS iterations. Rounds are a constant,
    so the whole plan is 4 shuffle stages, AQE-skew-splittable; no
    driver-side state."""
    docs = load(spark, sf_dir, "documents")
    n = docs.count()  # dense 0..n-1 ids (same contract as pagerank/CC)
    d = F.col("doc_id")
    und = (
        docs.filter((d % 16 != 15) & (d + 1 < n))
        .select(d.alias("u"), (d + 1).alias("v"))
        .unionByName(
            docs.filter((d % 64 == 0) & (d + 16 < n)).select(
                d.alias("u"), (d + 16).alias("v")
            )
        )
    )
    bidir = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint(eager=True)
    lbl = docs.select(d.alias("id"), d.alias("label"))
    for _ in range(4):
        votes = (
            bidir.join(lbl, bidir["dst"] == lbl["id"])
            .groupBy(F.col("src").alias("nid"), "label")
            .agg(F.count("*").alias("c"))
        )
        lbl = (
            votes.groupBy("nid")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l"))).alias("m"))
            .select(F.col("nid").alias("id"), F.col("m.l").alias("label"))
            .localCheckpoint(eager=True)
        )
    return lbl.select(F.col("id").alias("node_id"), F.col("label").alias("community"))


# ===========================================================================
# Cohort retention + integer-exact trend regression — the product-
# analytics pair every events warehouse serves
# ===========================================================================


@query(
    "cohort_retention",
    """
    WITH e AS (
      SELECT user_id, epoch_ms(ts) // 604800000 AS week FROM events
    ),
    first AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1)
    SELECT f.cohort_week,
           e.week - f.cohort_week AS week_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM e JOIN first f USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users bucketed by their FIRST active
    week (the cohort), counted again in every later week at offset k —
    the churn/stickiness readout. All integer arithmetic (absolute
    epoch-weeks, ms floor-division), so the engines agree exactly.

    Scale shape: one user-keyed aggregate (min week), one user-keyed
    equi-join back (co-partitioned — same key, AQE reuses the
    exchange), one (cohort, offset) count-distinct. No windows, no
    per-user state machine; user_id is the only shuffle key until the
    final small rollup."""
    events = load(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        F.floor(ntz_epoch_ms(F.col("ts")) / F.lit(604800000)).alias("week"),
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "events_trend_ols",
    """
    WITH b AS (
      SELECT event_type,
             CAST(epoch_ms(ts)
                  - epoch_ms(TIMESTAMP '2024-01-01') AS HUGEINT) AS t,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             sum(t) AS sx, sum(cents) AS sy,
             sum(t * cents) AS sxy, sum(t * t) AS sxx
      FROM b GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 864000.0
             AS slope_per_day
    FROM s
    """,
)
def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type least-squares trend (value per DAY) with the normal
    equations kept in EXACT integer arithmetic until one final double
    division: time is ms since a fixed baseline (small offsets keep
    t*t inside 128 bits), value is exact cents via DECIMAL(18,2), and
    the moment sums ride DECIMAL(38,0) in Spark / HUGEINT in DuckDB —
    the same integerization discipline as lm_bigram_familiarity.
    slope = (n*sxy - sx*sy)/(n*sxx - sx^2); x864000 converts cents/ms
    to value-units/day.

    Scale shape: ONE columnar pass — five map-side-combined partial
    sums per (partition, type), a shuffle of O(|types|) rows, zero
    joins/windows. This is the streaming-friendly form of regression
    (the moment sums are mergeable, so the same aggregate serves an
    incremental foreachBatch fold)."""
    events = load(spark, sf_dir, "events")
    d19 = "decimal(19,0)"
    b = events.select(
        "event_type",
        (
            ntz_epoch_ms(F.col("ts"))
            - ntz_epoch_ms(F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .cast(d19)
        .alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast(d19)
        .alias("cents"),
    )
    d38 = "decimal(38,0)"
    s = b.groupBy("event_type").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("t").cast(d38).alias("sx"),
        F.sum("cents").cast(d38).alias("sy"),
        F.sum((F.col("t") * F.col("cents")).cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("t") * F.col("t")).cast(d38)).cast(d38).alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d38)
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d38)
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (num.cast("double") / den.cast("double") * F.lit(864000.0)).alias(
            "slope_per_day"
        ),
    )


# ===========================================================================
# Boilerplate detection — per-site template text identified by within-host
# document frequency (the corpus-prep step before dedup/quality)
# ===========================================================================


@query(
    "boilerplate_detection",
    """
    WITH d AS (
      SELECT doc_id, doc_id % 25 AS host,
             string_split(lower(text), ' ') AS ws
      FROM documents
    ),
    g AS (
      SELECT DISTINCT doc_id, host, ws[i] || ' ' || ws[i + 1] AS gram
      FROM d, unnest(range(1, len(ws))) AS r(i)
    ),
    hostn AS (SELECT host, count(DISTINCT doc_id) AS n_docs FROM g GROUP BY 1),
    df AS (
      SELECT host, gram, count(*) AS hdf FROM g GROUP BY 1, 2
    ),
    boiler AS (
      SELECT df.host, df.gram
      FROM df JOIN hostn USING (host)
      WHERE df.hdf * 2 > hostn.n_docs
    )
    SELECT g.doc_id, g.host,
           count(*) AS n_grams,
           CAST(count(b.gram) AS BIGINT) AS n_boiler
    FROM g LEFT JOIN boiler b ON b.host = g.host AND b.gram = g.gram
    GROUP BY 1, 2
    """,
)
def boilerplate_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate text per synthetic site (host = doc_id %
    25): a bigram is BOILERPLATE for a host when it appears in a
    strict majority of that host's documents (hdf * 2 > n_docs —
    integer guard, no float threshold); each document then reports its
    distinct-bigram count and how many of those are boilerplate — the
    input to the nav/footer-stripping step every web corpus runs
    before dedup and quality scoring (re-used template text otherwise
    dominates near-dup signatures and poisons quality ratios).

    Scale shape: explode → per-doc DISTINCT (one gram-keyed shuffle
    with map-side combine) → (host, gram) document-frequency aggregate
    → join back on the same (host, gram) key, so AQE reuses the
    exchange; everything is keyed by gram/host — no all-pairs, no
    per-host collect. The within-host df is the classic boilerplate
    statistic (line-level in CCNet; bigram-level here keeps the oracle
    exact)."""
    docs = load(spark, sf_dir, "documents")
    g = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % 25).alias("host"),
            F.explode(word_ngrams(words(F.col("text")), 2)).alias("gram"),
        )
        .distinct()
    )
    hostn = g.groupBy("host").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    df = g.groupBy("host", "gram").agg(F.count("*").alias("hdf"))
    boiler = (
        df.join(hostn, "host")
        .filter(F.col("hdf") * 2 > F.col("n_docs"))
        .select("host", "gram", F.lit(1).alias("is_boiler"))
    )
    return (
        g.join(boiler, ["host", "gram"], "left")
        .groupBy("doc_id", "host")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )


@query(
    "warc_cdx_index",
    r"""
    WITH rec AS (
      SELECT doc_id, doc_id % 16 AS warc_file,
             'http://warc.test/doc' || doc_id AS url,
             'HTTP/1.1 200 OK' || e'\r\n' || 'Content-Type: text/html'
               || e'\r\n\r\n' || text AS http,
             text
      FROM documents
    ),
    full_rec AS (
      SELECT doc_id, warc_file, url,
             'WARC/1.0' || e'\r\n' || 'WARC-Type: response' || e'\r\n'
             || 'WARC-Target-URI: ' || url || e'\r\n'
             || 'WARC-Date: 2026-01-01T00:00:00Z' || e'\r\n'
             || 'WARC-Record-ID: <urn:md5:' || md5(url) || '>' || e'\r\n'
             || 'Content-Type: application/http; msgtype=response' || e'\r\n'
             || 'Content-Length: ' || CAST(strlen(http) AS VARCHAR)
             || e'\r\n\r\n' || http || e'\r\n\r\n' AS r,
             sha256(text) AS digest
      FROM rec
    )
    SELECT 'test,warc)/doc' || doc_id AS urlkey,
           url, warc_file,
           CAST(coalesce(sum(strlen(r)) OVER (
             PARTITION BY warc_file ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS rec_offset,
           CAST(strlen(r) AS BIGINT) AS rec_length,
           digest
    FROM full_rec
    """,
)
def warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDX index for warc_roundtrip's synthesized WARC files: one
    row per record with its container file, BYTE offset, byte length
    and payload sha256 — the (urlkey, file, offset, length, digest)
    tuple web archives use for random access (a CDX hit seeks straight
    to the record; no file scan). Offsets are a per-file prefix sum of
    serialized record lengths in concatenation (doc_id) order — pure
    window arithmetic over the SAME JVM serializer expression the
    roundtrip uses, so a byte-slice at (offset, length) is exactly the
    record (pinned byte-for-byte in tests/test_warc.py). urlkey is the
    SURT form of the fixed-host URL space.

    Scale shape: building CDX alongside the WARC write costs one
    window over data already partitioned by file — each partition's
    prefix sum is local (partitionBy = the file), no extra shuffle
    beyond the file grouping the writer needs anyway; lookups then hit
    a sorted, bucketable (urlkey → file, offset) table instead of
    scanning archives."""
    from .sources.warc import warc_records_col

    docs = load(spark, sf_dir, "documents")
    rec = warc_records_col(
        F.concat(F.lit("http://warc.test/doc"), F.col("doc_id")),
        F.col("text"),
    )
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 16).alias("warc_file"),
        F.concat(F.lit("http://warc.test/doc"), F.col("doc_id")).alias("url"),
        F.octet_length(rec).cast("bigint").alias("rec_length"),
        F.sha2(F.col("text"), 256).alias("digest"),
    )
    w = (
        Window.partitionBy("warc_file")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        F.concat(F.lit("test,warc)/doc"), F.col("doc_id")).alias("urlkey"),
        "url",
        "warc_file",
        F.coalesce(F.sum("rec_length").over(w), F.lit(0))
        .cast("bigint")
        .alias("rec_offset"),
        "rec_length",
        "digest",
    )


# ===========================================================================
# Multi-dimensional OLAP surface: CUBE grouping sets + PIVOT — the two
# reshaping operators a reporting layer asks of an analytics engine
# ===========================================================================


@query(
    "orders_cube",
    """
    SELECT year(o_orderdate) AS order_year,
           o_orderpriority AS priority,
           CAST(grouping(year(o_orderdate)) * 2
                + grouping(o_orderpriority) AS BIGINT) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderpriority)
    """,
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (order year, priority): all four grouping sets —
    cells, both one-dimension margins, and the grand total — in ONE
    aggregate. gid (the grouping_id bitmask) disambiguates a margin
    row from a hypothetical NULL dimension value, same encoding in
    both engines (bit 2 = year rolled up, bit 1 = priority).

    Scale shape: Spark expands CUBE internally (Expand node: 4 rows
    per input row) then runs a single hash aggregate — map-side
    partial aggregation collapses the expansion before the shuffle, so
    the wire carries O(distinct cells), not 4x|orders|; one shuffle
    for all four groupings vs four separate scans. Money sums ride
    DECIMAL(18,2) so margins are exact in both engines."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .cube("order_year", "priority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )


@query(
    "events_hourly_pivot",
    """
    SELECT hour(ts) AS hour_of_day,
           count(*) FILTER (event_type = 'click') AS n_click,
           count(*) FILTER (event_type = 'error') AS n_error,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup') AS n_signup,
           count(*) FILTER (event_type = 'view') AS n_view
    FROM events
    GROUP BY 1
    """,
)
def events_hourly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type count matrix via the DataFrame PIVOT
    operator — the long-to-wide reshape every reporting layer needs.
    The pivot VALUES are passed explicitly (the five types), which is
    the scale rule: without them Spark first runs a distinct scan to
    discover columns AND the output schema becomes data-dependent —
    with them it is one groupBy(hour) aggregate with five conditional
    counts, exactly the plan the oracle's FILTER clauses describe.
    Missing cells surface as 0, not NULL (count semantics)."""
    events = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = (
        events.select(F.hour("ts").alias("hour_of_day"), "event_type")
        .groupBy("hour_of_day")
        .pivot("event_type", types)
        .count()
    )
    return piv.select(
        "hour_of_day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}")
            for t in types
        ],
    )


@query(
    "training_shards",
    """
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    r AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rk
      FROM t
    )
    SELECT CAST((rk - 1) % 16 AS BIGINT) AS shard,
           count(*) AS n_docs,
           sum(n_tokens) AS total_tokens,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens
    FROM r GROUP BY 1
    """,
)
def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard assignment: docs ranked by token count
    (ties by doc_id) and dealt round-robin across 16 shards — the
    "sorted snake" dealing that keeps per-shard token totals within
    one max-doc of each other without sequential bin-packing; output
    is the per-shard manifest a trainer's data loader consumes.

    Scale shape: the global sort LOOKS like the bottleneck but is a
    rank-only pass over (doc_id, n_tokens) pairs — 16 bytes/doc, never
    the text; at 10^10 docs that's a ~160 GB range-partitioned sort of
    a projection, after which the shard id is a pure mod and the
    actual payload moves AT MOST once, partitioned by shard. (The
    fully-sortless alternative — hash dealing — loses the balance
    guarantee; this is the standard tradeoff, made explicit here.)"""
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(F.split("text", " ", -1)).alias("n_tokens")
    )
    rk = F.row_number().over(
        Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id"))
    )
    return (
        t.withColumn("shard", ((rk - 1) % 16).cast("bigint"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@query(
    "events_anomaly_zscore",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             count(*) AS n_days,
             sum(n_events) AS sx,
             sum(n_events * n_events) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT d.event_type, d.day, d.n_events,
           (s.n_days * d.n_events - s.sx)
             * (s.n_days * d.n_events - s.sx) AS z_num,
           4 * (s.n_days * s.sxx - s.sx * s.sx) AS z_den
    FROM daily d JOIN stats s USING (event_type)
    WHERE (s.n_days * d.n_events - s.sx)
            * (s.n_days * d.n_events - s.sx)
          > 4 * (s.n_days * s.sxx - s.sx * s.sx)
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry anomaly detection: daily event counts per type whose
    z-score exceeds 2, decided ENTIRELY in integers — z² > 4 rewrites
    to (n·x − Σx)² > 4·(n·Σxx − Σx²) (both sides integer products of
    counts), so no engine ever computes a mean, a variance, or a
    square root and the flagged set is bit-identical by construction.
    The z_num/z_den witnesses ride along so a consumer can rank by
    severity without re-deriving the moments. This is the alerting
    query a crawl operator runs over fetch_log/metrics telemetry
    (error spikes, throughput collapses); expressed over events so the
    oracle pins it.

    Scale shape: one (type, day) count aggregate (map-side combined),
    one tiny per-type moment rollup broadcast back onto the daily
    frame — two shuffles of rollup-sized frames; the raw events shuffle
    once. Counts at 10^10 rows still fit bigint (squares of daily
    counts ≤ (10^10)² need DECIMAL — at that scale cast the moment
    arithmetic to DECIMAL(38,0) exactly like events_trend_ols)."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("sx"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sxx"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    z_num = (
        (F.col("n_days") * F.col("n_events") - F.col("sx"))
        * (F.col("n_days") * F.col("n_events") - F.col("sx"))
    )
    z_den = 4 * (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        j.filter(z_num > z_den)
        .select(
            "event_type",
            F.col("day").cast("timestamp_ntz").alias("day"),
            "n_events",
            z_num.alias("z_num"),
            z_den.alias("z_den"),
        )
    )


@query(
    "vocab_coverage",
    """
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
    ),
    f AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rk,
             sum(c) OVER () AS total
      FROM f
    ),
    ks AS (SELECT unnest([8, 16, 24]) AS k)
    SELECT ks.k,
           sum(CASE WHEN r.rk <= ks.k THEN r.c ELSE 0 END) AS covered,
           CAST(max(r.total) AS BIGINT) AS total_tokens
    FROM r, ks
    GROUP BY ks.k
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary sizing: corpus token coverage of the top-k
    frequency-ranked vocabulary at k = 8/16/24 (the coverage curve that
    decides how large a vocab must be before <unk> rates are
    acceptable). Ties rank deterministically by (count desc, term).
    Counts stay integers end to end; the consumer divides covered /
    total_tokens itself.

    Scale shape: one token-keyed count aggregate, then ranking a frame
    whose size is |vocab| (already tiny relative to the corpus — the
    entire point of the curve) — the global sort never touches the
    corpus; the k-fan-out is a 3-row broadcast cross join. Same
    discipline as training_shards: sort the projection, not the
    payload."""
    docs = load(spark, sf_dir, "documents")
    f = (
        docs.select(F.explode(words(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    r = f.select(
        "c",
        F.row_number().over(
            Window.orderBy(F.col("c").desc(), F.col("t"))
        ).alias("rk"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    )
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(8), F.lit(16), F.lit(24))).alias("k")
    )
    return (
        r.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("k"), F.col("c")).otherwise(0))
            .alias("covered"),
            F.max("total").cast("bigint").alias("total_tokens"),
        )
    )

# The deterministic undirected "web" graph shared by kcore_linkfarm and
# graph_bfs_levels: three quadratic-collision generators (heavy-tailed
# organic layer) + a circulant farm over every 16th doc (planted dense
# subgraph, internal degree 10). SQL twin of _linkgraph_edges.
_LINKGRAPH_SQL_CTES = """nn AS (SELECT count(*) AS n FROM documents),
    gen AS (
      SELECT doc_id AS src, (doc_id * doc_id + 1) % n AS dst
      FROM documents, nn
      UNION ALL
      SELECT doc_id, ((doc_id * doc_id % n) * doc_id + 2) % n
      FROM documents, nn
      UNION ALL
      SELECT doc_id, (2 * doc_id + 1) % n FROM documents, nn
      UNION ALL
      SELECT doc_id,
             16 * (((doc_id // 16) + s.s) % (n // 16))
      FROM documents, nn, (SELECT unnest([1, 2, 3, 4, 5]) AS s) s
      WHERE doc_id % 16 = 0 AND n >= 16
    ),
    edges AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM gen WHERE src <> dst
    ),
    sym AS MATERIALIZED (
      SELECT a AS v, b AS w FROM edges
      UNION ALL SELECT b, a FROM edges
    )"""


def _linkgraph_edges(docs: DataFrame) -> DataFrame:
    """Spark twin of _LINKGRAPH_SQL_CTES' ``edges``: the distinct
    undirected pair list (a < b), checkpointed (it feeds iterative
    loops)."""
    nn = docs.agg(F.count("*").alias("n"))
    base = docs.crossJoin(F.broadcast(nn))
    did = F.col("doc_id")
    gens = [
        (did * did + 1) % F.col("n"),
        ((did * did % F.col("n")) * did + 2) % F.col("n"),
        (2 * did + 1) % F.col("n"),
    ]
    gen = None
    for g in gens:
        part = base.select(did.alias("src"), g.alias("dst"))
        gen = part if gen is None else gen.unionAll(part)
    # n >= 16 guard: with no farm nodes beyond doc 0, (n // 16) is 0
    # and the modulus would error in DuckDB (Spark's non-ANSI % 0
    # yields NULL and silently drops the row — engines must agree)
    farm = (
        base.filter((did % 16 == 0) & (F.col("n") >= 16))
        .select(
            did.alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(5))).alias("s"),
            F.col("n"),
        )
        .select(
            "src",
            (
                16
                * ((F.expr("src div 16") + F.col("s")) % F.expr("n div 16"))
            ).alias("dst"),
        )
    )
    gen = gen.unionAll(farm)
    return (
        gen.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _kcore_sql(k: int = 5, max_rounds: int = 12) -> str:
    """Bounded k-core peeling as unrolled CTE rounds (same generated-
    oracle pattern as _pagerank_sql). Both engines run the SAME round
    cap, so results agree even if some scale needed more rounds.
    MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    round references the previous alive set three times — un-
    materialized, the scan tree grows 3^rounds and exhausts fds."""
    rounds = []
    for r in range(1, max_rounds + 1):
        rounds.append(
            f"""deg{r} AS MATERIALIZED (
      SELECT s.v, count(*) AS c FROM sym s
      JOIN alive{r - 1} x ON x.doc_id = s.v
      JOIN alive{r - 1} y ON y.doc_id = s.w
      GROUP BY s.v
    ),
    rm{r} AS MATERIALIZED (
      SELECT a.doc_id FROM alive{r - 1} a
      LEFT JOIN deg{r} d ON d.v = a.doc_id
      WHERE coalesce(d.c, 0) < {k}
    ),
    alive{r} AS MATERIALIZED (
      SELECT doc_id FROM alive{r - 1}
      EXCEPT SELECT doc_id FROM rm{r}
    )"""
        )
    chain = ",\n    ".join(rounds)
    removed = "\n      UNION ALL ".join(
        f"SELECT doc_id, {r} AS removed_round FROM rm{r}"
        for r in range(1, max_rounds + 1)
    )
    return f"""
    WITH {_LINKGRAPH_SQL_CTES},
    alive0 AS MATERIALIZED (SELECT doc_id FROM documents),
    {chain},
    removed AS (
      {removed}
    )
    SELECT d.doc_id,
           CAST(r.removed_round AS BIGINT) AS removed_round,
           r.doc_id IS NULL AS in_core
    FROM documents d LEFT JOIN removed r ON r.doc_id = d.doc_id
    """


@query("kcore_linkfarm", _kcore_sql())
def kcore_linkfarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-farm detection by k-core peeling (k=5): repeatedly delete
    nodes of live-degree < k; what survives is the maximal subgraph
    where everyone keeps >= k live neighbours — the classic web-spam
    signal (dense mutual-link farms survive, organic periphery peels
    away shell by shell). The graph plants exactly that: three
    quadratic-collision generators give a heavy-tailed organic layer
    that cascades over ~9-10 peel rounds, plus a circulant "farm"
    (every 16th doc linked to its next five farm neighbours, internal
    degree 10) that the peel can never touch. Output per node: the
    peel round that removed it (NULL = core member) — the shell index,
    which pins the full cascade order, not just the final core.

    Both engines run the SAME bounded round cap (12; observed fixpoint
    is 9-10 at sf 0.001-0.1), so results agree by construction even
    before convergence; Spark additionally early-exits on an empty
    peel round.

    Scale shape: per round one hash agg over the LIVE symmetric edge
    list + two left-anti joins that shrink it — the edge frame only
    ever gets smaller, O(rounds) shuffles total, per-round
    localCheckpoint bounds lineage exactly like dedup_clusters'
    pointer-jumping loop. No window, no global sort; the removal-round
    union is `rounds` checkpointed fragments. At crawl scale the same
    loop runs on the real host link graph (cube overflow note: the
    cubic generator is testdata-only)."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    return _kcore_peel(edges, docs.select("doc_id"), k=5, max_rounds=12)


def _kcore_peel(
    edges: DataFrame, nodes: DataFrame, k: int, max_rounds: int
) -> DataFrame:
    """The peeling loop, separated so tests can drive crafted graphs
    (cliques, chains, stars) against a brute-force Python peeler.
    ``edges`` is the distinct undirected pair list (a < b); returns one
    row per node: (doc_id, removed_round, in_core)."""
    sym = (
        edges.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .localCheckpoint(eager=True)
    )
    alive = nodes.select("doc_id").localCheckpoint(eager=True)
    removed: DataFrame | None = None
    for r in range(1, max_rounds + 1):
        deg = sym.groupBy("v").agg(F.count("*").alias("c"))
        rm = (
            alive.join(deg, alive["doc_id"] == deg["v"], "left")
            .filter(F.coalesce(F.col("c"), F.lit(0)) < k)
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        if rm.isEmpty():
            break
        tagged = rm.select(
            "doc_id", F.lit(r).cast("bigint").alias("removed_round")
        )
        removed = tagged if removed is None else removed.unionByName(tagged)
        alive = alive.join(rm, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        sym = (
            sym.join(rm.withColumnRenamed("doc_id", "v"), "v", "left_anti")
            .join(rm.withColumnRenamed("doc_id", "w"), "w", "left_anti")
            .localCheckpoint(eager=True)
        )
    if removed is None:
        removed = nodes.select(
            "doc_id", F.lit(None).cast("bigint").alias("removed_round")
        ).limit(0)
    return (
        nodes.select("doc_id")
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "removed_round",
            F.col("removed_round").isNull().alias("in_core"),
        )
    )


@query(
    "events_gapfill",
    """
    WITH h AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS hour_idx FROM events
    ),
    c AS (
      SELECT event_type, hour_idx, count(*) AS n_events
      FROM h GROUP BY event_type, hour_idx
    ),
    span AS (
      SELECT event_type, min(hour_idx) AS h0, max(hour_idx) AS h1
      FROM h GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1)) AS hour_idx
      FROM span
    )
    SELECT g.event_type, g.hour_idx,
           CAST(coalesce(c.n_events, 0) AS BIGINT) AS n_events,
           c.hour_idx IS NULL AS is_gap
    FROM grid g LEFT JOIN c
      ON c.event_type = g.event_type AND c.hour_idx = g.hour_idx
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: a dense per-type hourly
    grid from each type's first to last observed hour, missing hours
    emitted as explicit zero rows (is_gap marks them) — the
    regularization every downstream window/trend/anomaly consumer
    assumes, done once here instead of NULL-handling everywhere.
    Hours are zone-free integer epoch-hour indexes (ntz_epoch_ms div
    3.6e6 ≙ epoch_ms // 3600000), so no engine ever interprets a
    timestamp.

    Scale shape: the grid is generated from a types-sized span frame
    (sequence+explode — O(types × span_hours) rows, data-independent
    of event count), then one left join against the hourly rollup on
    (type, hour). No window, no global sort; the only event-sized
    shuffle is the rollup itself. A sparse 100-TB event table gapfills
    in grid-size memory."""
    ev = load(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.floor(ntz_epoch_ms(F.col("ts")) / F.lit(3_600_000)).alias(
            "hour_idx"
        ),
    )
    c = h.groupBy("event_type", "hour_idx").agg(
        F.count("*").alias("n_raw")
    )
    span = h.groupBy("event_type").agg(
        F.min("hour_idx").alias("h0"), F.max("hour_idx").alias("h1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour_idx"),
    )
    return grid.join(c, ["event_type", "hour_idx"], "left").select(
        "event_type",
        "hour_idx",
        F.coalesce(F.col("n_raw"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("n_raw").isNull().alias("is_gap"),
    )


@query(
    "scd2_intervals",
    """
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER w AS prev,
             epoch_ms(ts) AS ts_ms
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    m AS (
      SELECT user_id, state, ts_ms,
             sum(CASE WHEN prev IS NULL OR prev <> state THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS island
      FROM o
    ),
    g AS (
      SELECT user_id, island, min(state) AS state,
             min(ts_ms) AS valid_from_ms,
             CAST(count(*) AS BIGINT) AS n_events
      FROM m GROUP BY user_id, island
    )
    SELECT user_id, state, valid_from_ms,
           lead(valid_from_ms)
             OVER (PARTITION BY user_id ORDER BY island) AS valid_to_ms,
           n_events,
           lead(valid_from_ms)
             OVER (PARTITION BY user_id ORDER BY island) IS NULL
             AS is_current
    FROM g
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each user's
    event-type stream into validity intervals — a new interval opens
    only when the state CHANGES (gaps-and-islands: lag-change flag →
    running-sum island id → per-island min/count), valid_to chains to
    the next interval's valid_from, the open interval is is_current.
    This is the standard dimension-table construction every warehouse
    repaints from an event log. Interval bounds are zone-free integer
    epoch-ms; (ts, event_id) breaks ordering ties deterministically.

    Scale shape: user_id is the ONLY shuffle key — both windows and
    the island rollup partition by it (one exchange, reused thrice by
    Catalyst); per-user sort width is that user's event count, never
    global. The island id needs no join-back: the running sum rides
    the same sorted pass that detected the change."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        "ts",
        "event_id",
        ntz_epoch_ms(F.col("ts")).alias("ts_ms"),
        F.lag("event_type").over(w).alias("prev"),
    )
    m = o.select(
        "user_id",
        "state",
        "ts_ms",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("state")), 1
            ).otherwise(0)
        )
        .over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("island"),
    )
    g = m.groupBy("user_id", "island").agg(
        F.min("state").alias("state"),
        F.min("ts_ms").alias("valid_from_ms"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    iw = Window.partitionBy("user_id").orderBy("island")
    nxt = F.lead("valid_from_ms").over(iw)
    return g.select(
        "user_id",
        "state",
        "valid_from_ms",
        nxt.alias("valid_to_ms"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


@query(
    "autocomplete_prefix",
    """
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents
    ),
    f AS (
      SELECT t AS term, count(*) AS c FROM toks
      WHERE length(t) >= 3 GROUP BY t
    ),
    r AS (
      SELECT substr(term, 1, 3) AS prefix, term, CAST(c AS BIGINT) AS c,
             row_number() OVER (PARTITION BY substr(term, 1, 3)
                                ORDER BY c DESC, term) AS rnk
      FROM f
    )
    SELECT prefix, rnk, term, c FROM r WHERE rnk <= 3
    """,
)
def autocomplete_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-ahead completion index: the top-3 corpus completions per
    3-char prefix, ranked (count desc, term) — the edge-n-gram index a
    search box queries on every keystroke (search-as-you-type's
    server-side table, built offline like OpenSearch's edge-ngram
    analyzer). Tokens shorter than the prefix are excluded.

    Scale shape: the corpus-sized work is one token-count hash agg;
    the rank window partitions the |vocab|-sized count frame by
    prefix (tiny groups, never the corpus). Generalizing to
    all-prefix-lengths is an explode over 1..len — output stays
    vocab-bounded. Serving is a broadcast-sized lookup table."""
    docs = load(spark, sf_dir, "documents")
    f = (
        docs.select(F.explode(words(F.col("text"))).alias("term"))
        .filter(F.length("term") >= 3)
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    pw = Window.partitionBy("prefix").orderBy(
        F.col("c").desc(), F.col("term")
    )
    return (
        f.select(F.substring("term", 1, 3).alias("prefix"), "term", "c")
        .withColumn("rnk", F.row_number().over(pw).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("prefix", "rnk", "term", "c")
    )

@query(
    "events_rfm",
    """
    WITH p AS (
      SELECT user_id, epoch_ms(ts) AS ms,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    u AS (
      SELECT user_id,
             (SELECT max(ms) FROM p) - max(ms) AS rec_ms,
             count(*) AS frequency,
             sum(cents) AS monetary
      FROM p GROUP BY user_id
    ),
    s AS (
      SELECT user_id,
             rec_ms // 86400000 AS recency_days,
             CAST(frequency AS BIGINT) AS frequency,
             CAST(monetary AS BIGINT) AS monetary_cents,
             CAST(ntile(5) OVER (ORDER BY rec_ms DESC, user_id)
                  AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY frequency ASC, user_id)
                  AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY monetary ASC, user_id)
                  AS BIGINT) AS m_score
      FROM u
    )
    SELECT user_id, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN r_score >= 4 THEN 'recent'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                ELSE 'other' END AS segment
    FROM s
    """,
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events: per-user
    recency (whole days since last purchase, measured from the
    dataset's last purchase so the query is reproducible), frequency,
    and exact-cents monetary (DECIMAL(18,2)→cents, integer sums —
    float summation order can differ between engines, integer sums
    cannot), then quintile scores via ntile(5) with a user_id
    tie-break (ntile assigns identical bucket boundaries in both
    engines given a total order) and the classic segment labels.

    Scale shape: events collapse to ONE user-sized frame in a single
    hash agg; the three ntile windows globally sort that frame, not
    the events (users ≪ events — and at 100-TB user counts the
    quintile cut-points come from approx_percentile instead, scores by
    broadcast range lookup; this exact ntile is the calibration
    oracle, same contract as events_value_percentiles)."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        ntz_epoch_ms(F.col("ts")).alias("ms"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("decimal(19,0)")
        .alias("cents"),
    )
    mx = p.agg(F.max("ms").alias("mx"))
    u = (
        p.groupBy("user_id")
        .agg(
            F.max("ms").alias("last_ms"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            (F.col("mx") - F.col("last_ms")).alias("rec_ms"),
            "frequency",
            "monetary",
        )
    )
    s = u.select(
        "user_id",
        F.expr("rec_ms div 86400000").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.col("monetary").cast("bigint").alias("monetary_cents"),
        F.ntile(5)
        .over(Window.orderBy(F.col("rec_ms").desc(), F.col("user_id")))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("frequency").asc(), F.col("user_id")))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").asc(), F.col("user_id")))
        .cast("bigint")
        .alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion"
        )
        .when(F.col("f_score") >= 4, "loyal")
        .when(F.col("r_score") >= 4, "recent")
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), "at_risk")
        .otherwise("other")
    )
    return s.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        seg.alias("segment"),
    )


@query(
    "ab_test_zprop",
    """
    WITH u AS (
      SELECT user_id, user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT
        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS n0,
        CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)
             AS HUGEINT) AS x0,
        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
        CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)
             AS HUGEINT) AS x1
      FROM u
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(x0 AS BIGINT) AS x0,
           CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
           CAST((x0 * n1 - x1 * n0) * (x0 * n1 - x1 * n0) * (n0 + n1)
                AS DOUBLE) AS z_num,
           CAST((x0 + x1) * (n0 + n1 - x0 - x1) * n0 * n1
                AS DOUBLE) AS z_den,
           (x0 * n1 - x1 * n0) * (x0 * n1 - x1 * n0) * (n0 + n1)
             > 4 * (x0 + x1) * (n0 + n1 - x0 - x1) * n0 * n1
             AS significant
    FROM v
    """,
)
def ab_test_zprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment (variant = user_id
    parity, conversion = any purchase): z² > 4 (|z| > 2, ~95%) decided
    ENTIRELY in integers by cross-multiplication —
    (x0·n1 − x1·n0)²·N > 4·x·(N−x)·n0·n1 with x = x0+x1, N = n0+n1 —
    no pooled-rate division, no sqrt, so the verdict is bit-identical
    across engines (same discipline as events_anomaly_zscore, extended
    to the two-sample statistic). z_num/z_den witnesses ride along for
    effect-size ranking. Intermediates ride DECIMAL(38,0) ≙ HUGEINT
    ((x·n)²·N needs ~84 bits at 10^6-user experiments; int64 would
    wrap silently).

    Scale shape: one user-keyed conversion agg (events collapse
    map-side), then a single conditional-aggregate rollup to ONE row —
    no join between variants, no second pass."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    d38 = "decimal(38,0)"
    v = u.select(
        (F.col("user_id") % 2).alias("variant"), "converted"
    ).agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast(d38)
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast(d38)
        .alias("x0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast(d38)
        .alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast(d38)
        .alias("x1"),
    )
    diff = F.col("x0") * F.col("n1") - F.col("x1") * F.col("n0")
    n = F.col("n0") + F.col("n1")
    x = F.col("x0") + F.col("x1")
    z_num = diff * diff * n
    z_den = x * (n - x) * F.col("n0") * F.col("n1")
    return v.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("x0").cast("bigint").alias("x0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.col("x1").cast("bigint").alias("x1"),
        # witnesses render as DOUBLE: the exact 38-digit decimals wrap
        # BIGINT at ~10^4-10^5 users (review finding), and both engines
        # round-to-nearest the SAME exact integer, so the doubles are
        # bit-identical — while the verdict itself stays all-integer
        z_num.cast("double").alias("z_num"),
        z_den.cast("double").alias("z_den"),
        (z_num > 4 * z_den).alias("significant"),
    )


@query(
    "documents_profile",
    """
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           CAST(count(*) - count(doc_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_val,
           CAST(max(doc_id) AS VARCHAR) AS max_val
    FROM documents
    UNION ALL
    SELECT 'lang', count(*),
           CAST(count(*) - count(lang) AS BIGINT),
           CAST(count(DISTINCT lang) AS BIGINT),
           min(lang), max(lang)
    FROM documents
    UNION ALL
    SELECT 'source', count(*),
           CAST(count(*) - count(source) AS BIGINT),
           CAST(count(DISTINCT source) AS BIGINT),
           min(source), max(source)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*),
           CAST(count(*) - count(n_chars) AS BIGINT),
           CAST(count(DISTINCT n_chars) AS BIGINT),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'text_len', count(*),
           CAST(count(*) - count(text) AS BIGINT),
           CAST(count(DISTINCT length(text)) AS BIGINT),
           CAST(min(length(text)) AS VARCHAR),
           CAST(max(length(text)) AS VARCHAR)
    FROM documents
    """,
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling rollup — the quality report every ingestion run
    stamps before data is trusted: per column (and derived text
    length) row count, null count, distinct count, min/max (stringified
    so the long format has one schema; bigint→string renders
    identically in both engines, character min/max is binary collation
    in both). The text column itself is profiled by LENGTH, not value,
    so the report stays bounded.

    Scale shape: ONE scan — every column's measures live in a single
    .agg() (the multi-countDistinct plans as one Expand over the same
    pass, never a re-read; a union of five per-column aggs would scan
    the table five times — review finding), then stack() pivots the
    one wide row to the long report. No row ever leaves as output; the
    report is O(columns)."""
    docs = load(spark, sf_dir, "documents")
    cols = [
        ("doc_id", F.col("doc_id")),
        ("lang", F.col("lang")),
        ("source", F.col("source")),
        ("n_chars", F.col("n_chars")),
        ("text_len", F.length("text")),
    ]
    aggs = [F.count("*").alias("n_rows")]
    for name, c in cols:
        aggs += [
            (F.count("*") - F.count(c)).cast("bigint").alias(f"null_{name}"),
            F.countDistinct(c).cast("bigint").alias(f"dist_{name}"),
            F.min(c).cast("string").alias(f"min_{name}"),
            F.max(c).cast("string").alias(f"max_{name}"),
        ]
    wide = docs.agg(*aggs)
    stack = ", ".join(
        f"'{name}', null_{name}, dist_{name}, min_{name}, max_{name}"
        for name, _ in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(col_name, n_null, n_distinct, min_val, max_val)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")

# ---------------------------------------------------------------------------
# TPC-H-style OLAP over the dimension tables (region/nation/supplier/
# part were otherwise unused inputs)
# ---------------------------------------------------------------------------
@query(
    "local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per nation from orders
    where the customer and the line's supplier share a nation, one
    region, one order year — the canonical star-schema join chain
    (region→nation→customer→orders→lineitem→supplier).

    Scale shape: region/nation/supplier are BROADCAST (the classic
    dim-table move — no shuffle for 3 of the 5 joins); the only big
    shuffles are fact-sized: orders⋈customer on custkey and
    lineitem⋈orders on orderkey, both with the date filter pushed to
    the orders scan (year prune) and the same-nation predicate applied
    as a join condition, not a post-filter. Revenue sums ride
    DECIMAL(18,4) exactly; the one double cast is the final render
    (same convention as top_orders_by_revenue)."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    cn = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == n.n_nationkey,
    )
    oc = o.join(cn, o.o_custkey == cn.c_custkey)
    lo = li.join(oc, li.l_orderkey == oc.o_orderkey)
    los = lo.join(
        F.broadcast(s),
        (s.s_suppkey == lo.l_suppkey) & (s.s_nationkey == lo.c_nationkey),
    )
    return los.groupBy("n_name").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue")
    )


@query(
    "promo_revenue_share",
    """
    SELECT EXTRACT(year FROM l_shipdate) * 100
             + EXTRACT(month FROM l_shipdate) AS ship_month,
           CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000
                AS BIGINT) AS promo_rev_x10000,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) * 10000
                AS BIGINT) AS total_rev_x10000
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): per ship month, promo-part revenue
    vs total revenue — reported as exact x10000 integer witnesses (the
    consumer divides; shipping the ratio itself would put a float
    division's ulps between the engines). Months are zone-free
    year*100+month ints from the NTZ ship date.

    Scale shape: ONE fact-sized join (lineitem⋈part on partkey, part
    BROADCAST — at 100 TB part is ~200M rows ≈ a few GB, still under
    the executor broadcast budget; beyond that it becomes the shuffle
    side of an AQE-chosen join) + one month-keyed rollup whose
    conditional promo sum rides the same pass. No second scan for the
    denominator."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("ship_month")
        )
        .agg(
            (
                F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                )
                * 10000
            )
            .cast("bigint")
            .alias("promo_rev_x10000"),
            (F.sum(rev) * 10000).cast("bigint").alias("total_rev_x10000"),
        )
    )

@query(
    "term_drift_chi2",
    """
    WITH toks AS (
      SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS snap,
             unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    f AS (
      SELECT t,
             CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS a,
             CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END)
                  AS HUGEINT) AS b
      FROM toks GROUP BY t
    ),
    tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM f)
    SELECT t AS term,
           CAST(a AS BIGINT) AS cnt_a, CAST(b AS BIGINT) AS cnt_b
    FROM f, tot
    WHERE (ta + tb) * (a * (tb - b) - b * (ta - a))
                    * (a * (tb - b) - b * (ta - a))
          > 4 * (a + b) * (ta - a + tb - b) * ta * tb
    """,
)
def term_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift detection between two corpus slices (here: the
    English slice vs the rest — in production, consecutive crawl
    snapshots): per term a 2x2 chi-square with cells (a, A−a, b, B−b),
    flagged when chi² > 4, decided ENTIRELY by integer
    cross-multiplication — N·(a·d − b·c)² > 4·(a+b)(c+d)·A·B — the
    two-sample drift monitor every distribution-shift alarm wants,
    bit-identical across engines (no expected-count division, no
    float). Intermediates ride DECIMAL(38,0) ≙ HUGEINT (the squared
    product wraps int64 beyond ~10^5-token slices); at true web scale
    the statistic switches to double — this exact twin calibrates it.

    Scale shape: one token-keyed count agg (conditional sums fold both
    slices in the same pass — no per-slice scan, no join between
    slices), then a 1-row broadcast of the totals onto the vocab-sized
    frame. Output is only the drifted terms."""
    docs = load(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    toks = docs.select(
        F.when(F.col("lang") == "en", 0).otherwise(1).alias("snap"),
        F.explode(words(F.col("text"))).alias("t"),
    )
    f = toks.groupBy("t").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast(d38)
        .alias("a"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast(d38)
        .alias("b"),
    )
    tot = f.agg(
        F.sum("a").cast(d38).alias("ta"), F.sum("b").cast(d38).alias("tb")
    )
    j = f.crossJoin(F.broadcast(tot))
    diff = F.col("a") * (F.col("tb") - F.col("b")) - F.col("b") * (
        F.col("ta") - F.col("a")
    )
    num = (F.col("ta") + F.col("tb")) * diff * diff
    den = (
        (F.col("a") + F.col("b"))
        * (F.col("ta") - F.col("a") + F.col("tb") - F.col("b"))
        * F.col("ta")
        * F.col("tb")
    )
    return j.filter(num > 4 * den).select(
        F.col("t").alias("term"),
        F.col("a").cast("bigint").alias("cnt_a"),
        F.col("b").cast("bigint").alias("cnt_b"),
    )

def _bfs_sql(max_levels: int = 6) -> str:
    """Multi-source BFS as unrolled MATERIALIZED-CTE frontier rounds
    over the shared link graph — the same bounded-round contract as
    _kcore_sql (observed eccentricity from the seed set is 4 at
    sf 0.001-0.1; cap 6 gives margin and both engines truncate
    identically if ever exceeded)."""
    rounds = []
    for r in range(1, max_levels + 1):
        rounds.append(
            f"""lvl{r} AS MATERIALIZED (
      SELECT DISTINCT s.w AS doc_id FROM sym s
      JOIN lvl{r - 1} f ON f.doc_id = s.v
      WHERE s.w NOT IN (SELECT doc_id FROM vis{r - 1})
    ),
    vis{r} AS MATERIALIZED (
      SELECT doc_id FROM vis{r - 1}
      UNION SELECT doc_id FROM lvl{r}
    )"""
        )
    chain = ",\n    ".join(rounds)
    levels = "\n      UNION ALL ".join(
        f"SELECT doc_id, {r} AS level FROM lvl{r}"
        for r in range(0, max_levels + 1)
    )
    return f"""
    WITH {_LINKGRAPH_SQL_CTES},
    lvl0 AS MATERIALIZED (
      SELECT doc_id FROM documents WHERE doc_id % 97 = 0
    ),
    vis0 AS MATERIALIZED (SELECT doc_id FROM lvl0),
    {chain},
    lv AS (
      {levels}
    )
    SELECT d.doc_id, CAST(lv.level AS BIGINT) AS level,
           lv.doc_id IS NOT NULL AS reached
    FROM documents d LEFT JOIN lv ON lv.doc_id = d.doc_id
    """


@query("graph_bfs_levels", _bfs_sql())
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS shortest-hop levels from a seed set (every
    97th doc) over the shared link graph — the pure-dataset twin of
    the crawl engine's frontier loop (level k = "round k of a crawl
    seeded at the seed set with infinite budget"), and the classic
    level-synchronous distributed SSSP for unweighted graphs. Output:
    hop distance per node, NULL/false if unreachable within the cap.

    Scale shape per level: one frontier⋈edges equi-join + one
    left-anti join against the visited set + distinct — frontier-sized
    work, never graph-sized; per-level localCheckpoint bounds lineage;
    driver early-exit on an empty frontier (observed depth 4, cap 6
    shared with the oracle so truncation agrees by construction).
    Visited stays distributed (anti-join, not a broadcast set) — the
    10^10-node path."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    seeds = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    return _bfs_levels(edges, docs.select("doc_id"), seeds, max_levels=6)


def _bfs_levels(
    edges: DataFrame,
    nodes: DataFrame,
    seeds: DataFrame,
    max_levels: int,
) -> DataFrame:
    """The frontier loop, separated so tests can drive crafted graphs
    (chains, disconnected components) with hand-computable levels."""
    sym = (
        edges.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .localCheckpoint(eager=True)
    )
    frontier = seeds.localCheckpoint(eager=True)
    visited = frontier
    out = frontier.select(
        "doc_id", F.lit(0).cast("bigint").alias("level")
    )
    for r in range(1, max_levels + 1):
        nxt = (
            sym.join(frontier.withColumnRenamed("doc_id", "v"), "v")
            .select(F.col("w").alias("doc_id"))
            .distinct()
            .join(visited, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(
            nxt.select("doc_id", F.lit(r).cast("bigint").alias("level"))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        nodes.join(out, "doc_id", "left")
        .select("doc_id", "level", F.col("level").isNotNull().alias("reached"))
    )


@query(
    "events_markov_transitions",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT event_type AS src_type, nxt AS dst_type, count(*) AS n
      FROM o WHERE nxt IS NOT NULL
      GROUP BY event_type, nxt
    )
    SELECT src_type, dst_type, CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (PARTITION BY src_type
                                   ORDER BY n DESC, dst_type)
                AS BIGINT) AS rnk
    FROM pairs
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behaviour: per
    (state, next-state) pair the observed count and the per-state rank
    — the "what do users do after X" table behind next-action
    prediction, funnel design, and anomaly-flow detection. Successor
    pairs come from a per-user lead() over the deterministic
    (ts, event_id) order (the same total order every sequence operator
    here uses).

    Scale shape: user_id is the only event-sized shuffle key (one
    window exchange); pairs collapse to a |states|² frame before the
    rank window touches anything. Raw counts ship instead of
    probabilities — the consumer divides by the row margin, keeping
    the output engine-exact integers."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = o.groupBy(
        F.col("event_type").alias("src_type"), F.col("nxt").alias("dst_type")
    ).agg(F.count("*").cast("bigint").alias("n"))
    rw = Window.partitionBy("src_type").orderBy(
        F.col("n").desc(), F.col("dst_type")
    )
    return pairs.select(
        "src_type",
        "dst_type",
        "n",
        F.row_number().over(rw).cast("bigint").alias("rnk"),
    )


# the deterministic DIRECTED page-link table shared by link_integrity
# and host_graph_reciprocity (2-out generators). SQL twin of _pagelinks.
_PAGELINKS_SQL_CTES = """nn AS (SELECT count(*) AS n FROM documents),
    links AS (
      SELECT src, dst FROM (
        SELECT doc_id AS src, (2 * doc_id + 1) % n AS dst
        FROM documents, nn
        UNION ALL
        SELECT doc_id, (3 * doc_id + 7) % n FROM documents, nn
      ) WHERE src <> dst
    )"""


def _pagelinks(docs: DataFrame) -> DataFrame:
    """Spark twin of _PAGELINKS_SQL_CTES: (src, dst) directed links."""
    nn = docs.agg(F.count("*").alias("n"))
    base = docs.crossJoin(F.broadcast(nn))
    return (
        base.select(
            F.col("doc_id").alias("src"),
            ((2 * F.col("doc_id") + 1) % F.col("n")).alias("dst"),
        )
        .unionAll(
            base.select(
                F.col("doc_id").alias("src"),
                ((3 * F.col("doc_id") + 7) % F.col("n")).alias("dst"),
            )
        )
        .filter(F.col("src") != F.col("dst"))
    )


@query(
    "link_integrity",
    f"""
    WITH {_PAGELINKS_SQL_CTES},
    fetched AS (SELECT doc_id FROM documents WHERE doc_id % 8 <> 0),
    dead AS (
      SELECT l.src, count(*) AS n_dead
      FROM links l
      JOIN fetched f ON f.doc_id = l.src
      LEFT JOIN fetched t ON t.doc_id = l.dst
      WHERE t.doc_id IS NULL
      GROUP BY l.src
    ),
    orphan AS (
      SELECT f.doc_id FROM fetched f
      WHERE NOT EXISTS (
        SELECT 1 FROM links l
        JOIN fetched s ON s.doc_id = l.src
        WHERE l.dst = f.doc_id
      )
    )
    SELECT f.doc_id % 31 AS host,
           count(*) AS n_pages,
           CAST(coalesce(sum(d.n_dead), 0) AS BIGINT) AS n_dead_links,
           CAST(sum(CASE WHEN o.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM fetched f
    LEFT JOIN dead d ON d.src = f.doc_id
    LEFT JOIN orphan o ON o.doc_id = f.doc_id
    GROUP BY f.doc_id % 31
    """,
)
def link_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-health audit over the crawl's link graph: per host the
    fetched-page count, DEAD outgoing links (target never fetched —
    the 404 report) and ORPHAN pages (no inbound link from any fetched
    page — unreachable except by sitemap/direct entry, the navigation
    gap report). The two classic webmaster integrity signals, from one
    link table + one fetched set.

    Scale shape: dead = links semi-joined to fetched sources then
    LEFT-anti'd on targets (two hash joins keyed by page id, no
    window); orphans = one NOT EXISTS anti-join on the inbound side;
    the final rollup is host-keyed. Every join key is the page id —
    co-partitionable end to end (AQE reuses the exchange)."""
    docs = load(spark, sf_dir, "documents")
    links = _pagelinks(docs)
    fetched = docs.filter(F.col("doc_id") % 8 != 0).select("doc_id")
    dead = (
        links.join(fetched.withColumnRenamed("doc_id", "src"), "src")
        .join(
            fetched.withColumnRenamed("doc_id", "dst"), "dst", "left_anti"
        )
        .groupBy("src")
        .agg(F.count("*").alias("n_dead"))
    )
    inbound = (
        links.join(fetched.withColumnRenamed("doc_id", "src"), "src")
        .select(F.col("dst").alias("doc_id"))
        .distinct()
    )
    orphan = fetched.join(inbound, "doc_id", "left_anti").select(
        "doc_id", F.lit(1).alias("is_orphan")
    )
    return (
        fetched.join(dead, fetched["doc_id"] == dead["src"], "left")
        .join(orphan, "doc_id", "left")
        .groupBy((F.col("doc_id") % 31).alias("host"))
        .agg(
            F.count("*").alias("n_pages"),
            F.coalesce(F.sum("n_dead"), F.lit(0))
            .cast("bigint")
            .alias("n_dead_links"),
            F.sum(F.coalesce(F.col("is_orphan"), F.lit(0)))
            .cast("bigint")
            .alias("n_orphans"),
        )
    )

@query(
    "dedup_containment",
    f"""
    WITH {_MINHASH_SQL_CTES},
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    v AS (
      SELECT c.doc_a, c.doc_b,
             CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT)
               AS inter,
             CAST(len(ga.grams) AS BIGINT) AS len_a,
             CAST(len(gb.grams) AS BIGINT) AS len_b
      FROM cands c
      JOIN shingled ga ON ga.doc_id = c.doc_a
      JOIN shingled gb ON gb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, inter, len_a, len_b
    FROM v WHERE inter * 10 >= 9 * least(len_a, len_b)
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-duplication: shingle containment of the smaller
    doc in the larger (inter / min(|A|,|B|) >= 0.9) over the SAME
    MinHash-LSH candidates as the Jaccard pipeline — catches
    quote-expansions, boilerplate-wrapped copies and supersets that
    symmetric Jaccard under-scores (a doc fully contained in one 3x
    its size has J ~ 0.33 but containment 1.0; Broder's containment
    companion to resemblance). The verdict is integer
    cross-multiplication (inter·10 >= 9·min) — no division ships, the
    witnesses (inter, len_a, len_b) ride along.

    Scale shape: identical to dedup_lsh_verified_jaccard — banded LSH
    candidates, never all-pairs; verify joins only candidate rows.
    (Caveat inherited from MinHash theory: LSH recall is tuned for
    resemblance, so extreme-size-ratio containments may not surface as
    candidates; a production superset hunt banding on the SMALL doc's
    shingles alone raises recall — same plan shape.)"""
    grams = _doc_grams(spark, sf_dir)
    cands = _band_pairs(_lsh_bands(grams)).select("doc_a", "doc_b").distinct()
    ga = grams.select(
        F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a")
    )
    gb = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("bigint")
    return (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("inter"),
            F.size("grams_a").cast("bigint").alias("len_a"),
            F.size("grams_b").cast("bigint").alias("len_b"),
        )
        .filter(
            F.col("inter") * 10 >= 9 * F.least("len_a", "len_b")
        )
    )

@query(
    "host_graph_reciprocity",
    f"""
    WITH {_PAGELINKS_SQL_CTES},
    hl AS (
      SELECT src % 31 AS sh, dst % 31 AS dh FROM links
      WHERE src % 31 <> dst % 31
    )
    SELECT least(sh, dh) AS host_a, greatest(sh, dh) AS host_b,
           CAST(sum(CASE WHEN sh < dh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ab,
           CAST(sum(CASE WHEN sh > dh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ba,
           sum(CASE WHEN sh < dh THEN 1 ELSE 0 END) > 0
             AND sum(CASE WHEN sh > dh THEN 1 ELSE 0 END) > 0
             AS reciprocal
    FROM hl GROUP BY least(sh, dh), greatest(sh, dh)
    """,
)
def host_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link-graph condensation with reciprocity: collapse
    the page graph to (host_a, host_b) with BOTH directed link counts
    on the unordered pair — mutual (reciprocal) host linking is the
    classic link-exchange/spam-ring signal, and the host graph is what
    Common-Crawl-scale web analysis actually ships (10^10 pages →
    10^7 hosts). Cross-host edges only; both directions fold in ONE
    aggregate via conditional sums on the unordered key (no self-join
    of the condensed graph to find reciprocal pairs).

    Scale shape: one page-sized projection to host pairs, one hash agg
    keyed by the unordered pair — output is |hosts|²-bounded. The
    page-level join disappears entirely: host ids derive from the page
    id, so condensation is a map, not a join."""
    docs = load(spark, sf_dir, "documents")
    links = _pagelinks(docs)
    hl = links.select(
        (F.col("src") % 31).alias("sh"), (F.col("dst") % 31).alias("dh")
    ).filter(F.col("sh") != F.col("dh"))
    fwd = F.sum(F.when(F.col("sh") < F.col("dh"), 1).otherwise(0))
    bwd = F.sum(F.when(F.col("sh") > F.col("dh"), 1).otherwise(0))
    return hl.groupBy(
        F.least("sh", "dh").alias("host_a"),
        F.greatest("sh", "dh").alias("host_b"),
    ).agg(
        fwd.cast("bigint").alias("n_ab"),
        bwd.cast("bigint").alias("n_ba"),
        ((fwd > 0) & (bwd > 0)).alias("reciprocal"),
    )


@query(
    "events_trigram_paths",
    """
    WITH o AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    p AS (
      SELECT e1, e2, e3, count(*) AS n
      FROM o WHERE e3 IS NOT NULL
      GROUP BY e1, e2, e3
    ),
    r AS (
      SELECT e1, e2, e3, CAST(n AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY n DESC, e1, e2, e3)
                  AS BIGINT) AS rnk
      FROM p
    )
    SELECT e1, e2, e3, n, rnk FROM r WHERE rnk <= 20
    """,
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the 20 most frequent 3-step behaviour paths
    (second-order extension of events_markov_transitions — first-order
    chains famously over-predict A→B→A ping-pongs that real journeys
    don't take). Successor pairs come from two lead() offsets over the
    same per-user (ts, event_id) total order every sequence operator
    shares — one window exchange serves both.

    Scale shape: user_id is the only event-sized shuffle; paths
    collapse to a |states|³-bounded frame before the global rank
    window touches anything (125 rows here; even 10^3 states is
    rank-able driver-side)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    p = o.groupBy("e1", "e2", "e3").agg(F.count("*").cast("bigint").alias("n"))
    rw = Window.orderBy(F.col("n").desc(), "e1", "e2", "e3")
    return (
        p.withColumn("rnk", F.row_number().over(rw).cast("bigint"))
        .filter(F.col("rnk") <= 20)
        .select("e1", "e2", "e3", "n", "rnk")
    )

@query(
    "order_priority_sla",
    """
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN l.first_ship_ms - epoch_ms(o.o_orderdate)
                              > 30 * CAST(86400000 AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
    FROM orders o
    JOIN (
      SELECT l_orderkey, min(epoch_ms(l_shipdate)) AS first_ship_ms
      FROM lineitem GROUP BY l_orderkey
    ) l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def order_priority_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4's shape with the columns this schema has: per order
    priority, how many orders shipped their FIRST line more than 30
    days after the order date — the fulfilment-SLA breach report. Day
    arithmetic is zone-free integer epoch-ms (no date-diff function
    whose week/day semantics could differ between engines).

    Scale shape: lineitem collapses to one row per order in a
    map-side-combining min agg BEFORE the join (never join the raw
    fact then aggregate — at 100 TB that ships every line item through
    the join shuffle instead of one row per order); then one
    orderkey-keyed join and a priority-sized rollup."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    first = li.groupBy("l_orderkey").agg(
        F.min(ntz_epoch_ms(F.col("l_shipdate"))).alias("first_ship_ms")
    )
    late = (
        F.col("first_ship_ms") - ntz_epoch_ms(F.col("o_orderdate"))
        > 30 * 86_400_000
    )
    return (
        o.join(first, first.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("n_late"),
        )
    )


@query(
    "market_basket_lift",
    """
    WITH ol AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_type AS t
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM ol),
    s1 AS (SELECT t, count(*) AS s FROM ol GROUP BY t),
    pairs AS (
      SELECT a.t AS type_a, b.t AS type_b, count(*) AS s_ab
      FROM ol a JOIN ol b ON a.ok = b.ok AND a.t < b.t
      GROUP BY a.t, b.t
    )
    SELECT p.type_a, p.type_b,
           CAST(p.s_ab AS BIGINT) AS support_ab,
           CAST(sa.s AS BIGINT) AS support_a,
           CAST(sb.s AS BIGINT) AS support_b,
           CAST(nb.n_baskets AS BIGINT) AS n_baskets,
           p.s_ab * nb.n_baskets > sa.s * sb.s AS positive_lift
    FROM pairs p
    JOIN s1 sa ON sa.t = p.type_a
    JOIN s1 sb ON sb.t = p.type_b
    CROSS JOIN nb
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over orders (baskets = orders, items =
    part types): pairwise co-occurrence support plus the LIFT verdict
    decided entirely in integers — lift(A,B) > 1 ⇔ s_ab·N > s_a·s_b,
    no probability division ever computed; all four witnesses ride
    along so the consumer can rank by exact rational lift. The
    association-rule primer every recommender bootstrap runs.

    Scale shape: baskets first collapse to DISTINCT (order, type) —
    the within-basket pair self-join is keyed on the basket id and its
    width is bounded by the ITEM-TYPE vocabulary per basket (6 types
    here; never line-item fan-out). Supports and the basket count ride
    broadcast-sized frames onto the |types|²-bounded pair table."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    ol = (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_type").alias("t"))
        .distinct()
    )
    nb = ol.agg(F.countDistinct("ok").alias("n_baskets"))
    s1 = ol.groupBy("t").agg(F.count("*").alias("s"))
    a = ol.select(F.col("ok"), F.col("t").alias("type_a"))
    b = ol.select(F.col("ok"), F.col("t").alias("type_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("s_ab"))
    )
    sa = s1.select(F.col("t").alias("type_a"), F.col("s").alias("sa"))
    sb = s1.select(F.col("t").alias("type_b"), F.col("s").alias("sb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("s_ab").cast("bigint").alias("support_ab"),
            F.col("sa").cast("bigint").alias("support_a"),
            F.col("sb").cast("bigint").alias("support_b"),
            F.col("n_baskets").cast("bigint").alias("n_baskets"),
            (F.col("s_ab") * F.col("n_baskets") > F.col("sa") * F.col("sb"))
            .alias("positive_lift"),
        )
    )

@query(
    "bootstrap_poisson_means",
    """
    WITH reps AS (SELECT unnest(generate_series(1, 16)) AS b),
    w AS (
      SELECT r.b,
             CASE WHEN h < 3679 THEN 0
                  WHEN h < 7358 THEN 1
                  WHEN h < 9197 THEN 2
                  WHEN h < 9810 THEN 3
                  ELSE 4 END AS wt,
             cents
      FROM (
        SELECT event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
      ) e, reps r,
      LATERAL (SELECT ('0x' || substr(md5(r.b::VARCHAR || ':'
                       || e.event_id::VARCHAR), 1, 15))::BIGINT % 10000
               AS h) x
    )
    SELECT b,
           CAST(sum(wt * cents) AS BIGINT) AS sum_cents,
           CAST(sum(wt) AS BIGINT) AS n_resampled
    FROM w GROUP BY b
    """,
)
def bootstrap_poisson_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED bootstrap: 16 Poisson(1) resample replicates of
    purchase value in ONE pass — each row contributes to replicate b
    with weight ~ Poisson(1), drawn deterministically from
    md5(b:event_id) against the integer-threshold pmf (3679/3679/1839/
    613/rest out of 10^4 ≙ e^{-1}/k!). Per replicate the integer
    witnesses (sum_cents, n_resampled) ship; the consumer's replicate
    means' spread IS the CI. This is the standard way to bootstrap at
    scale — multinomial resampling needs the global N and a shared
    draw; Poisson bootstrap needs neither, so it maps cleanly.

    Scale shape: one corpus scan, a 16-way broadcast fan-out BEFORE a
    map-side-combining agg (the shuffle carries 16 partial rows per
    task, not 16x the data). Exact cents, no float summation."""
    ev = load(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    reps = spark.range(1, 17).select(F.col("id").cast("bigint").alias("b"))
    h = (
        md5_long(
            F.concat(
                F.col("b").cast("string"),
                F.lit(":"),
                F.col("event_id").cast("string"),
            )
        )
        % 10000
    )
    wt = (
        F.when(h < 3679, 0)
        .when(h < 7358, 1)
        .when(h < 9197, 2)
        .when(h < 9810, 3)
        .otherwise(4)
    )
    return (
        e.crossJoin(F.broadcast(reps))
        .select("b", wt.alias("wt"), "cents")
        .groupBy("b")
        .agg(
            F.sum(F.col("wt") * F.col("cents"))
            .cast("bigint")
            .alias("sum_cents"),
            F.sum("wt").cast("bigint").alias("n_resampled"),
        )
    )


@query(
    "join_skew_profile",
    """
    WITH k AS (
      SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY l_orderkey
    ),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c, l_orderkey) AS rn,
             count(*) OVER () AS nk
      FROM k
    )
    SELECT CAST(max(nk) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS total_rows,
           CAST(max(c) AS BIGINT) AS max_rows_per_key,
           CAST(max(CASE WHEN rn = CAST(ceil(0.99 * nk) AS BIGINT)
                         THEN c END) AS BIGINT) AS p99_rows_per_key
    FROM r
    """,
)
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit for the fact table's hottest join key
    (lineitem.l_orderkey): key count, total rows, max and exact
    nearest-rank p99 rows-per-key — the numbers that decide whether a
    join needs AQE skew splitting, salting, or nothing (skew factor =
    max/avg; avg = total_rows/n_keys, the consumer divides the shipped
    integers). Every serious pipeline profiles this before picking a
    join strategy; at 10^10 rows a blind shuffle join on a key whose
    max bucket is 10^6x the median is a straggler factory.

    Scale shape: one map-side-combining count agg collapses the fact
    table to the KEY frame; the rank window sorts keys, not rows (keys
    ≪ rows; at extreme key cardinality swap approx_percentile — the
    exact rank here is its calibration twin, same contract as
    events_value_percentiles)."""
    li = load(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").alias("c"))
    r = k.select(
        "c",
        F.row_number()
        .over(Window.orderBy("c", "l_orderkey"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("nk"),
    )
    return r.agg(
        F.max("nk").cast("bigint").alias("n_keys"),
        F.sum("c").cast("bigint").alias("total_rows"),
        F.max("c").cast("bigint").alias("max_rows_per_key"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.99) * F.col("nk")).cast("bigint"),
                F.col("c"),
            )
        )
        .cast("bigint")
        .alias("p99_rows_per_key"),
    )

@query(
    "events_mad_outliers",
    """
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    m AS (
      SELECT event_type,
             max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS median_cents
      FROM med GROUP BY event_type
    ),
    dev AS (
      SELECT v.event_type, v.cents,
             abs(v.cents - m.median_cents) AS ad
      FROM v JOIN m USING (event_type)
    ),
    mad_r AS (
      SELECT event_type, ad,
             row_number() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             max(CASE WHEN rn = (n + 1) // 2 THEN ad END) AS mad_cents
      FROM mad_r GROUP BY event_type
    )
    SELECT d.event_type, m.median_cents, mad.mad_cents,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(CASE WHEN d.ad * 10 > 74 * mad.mad_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d
    JOIN m USING (event_type)
    JOIN mad USING (event_type)
    GROUP BY d.event_type, m.median_cents, mad.mad_cents
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation — the
    mean/variance-free complement to events_anomaly_zscore (a single
    wild value drags a mean-based z; the median and MAD shrug it off).
    Per type: exact lower-median of cents, exact MAD, and the outlier
    count under the standard |x−med| > 3.5·MAD·0.6745-ish rule folded
    to integers (ad·10 > 74·MAD ≙ threshold 7.4 ≈ 3.5/0.4726 — any
    fixed rational works; the point is NO float ever decides). Exact
    cents via DECIMAL(18,2); lower median ((n+1)//2 nearest rank) is
    tie-stable without averaging two middles.

    Scale shape: two per-type sort windows (median, then MAD) over
    type-partitioned frames + one broadcast of the 2-row-per-type
    med/MAD onto the deviation pass; at 100-TB swap approx_percentile
    for both medians — this exact twin calibrates it (same contract as
    events_value_percentiles / adaptive_host_throttle)."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        kw = Window.partitionBy("event_type")
        r = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(kw.orderBy(col)).alias("rn"),
            F.count("*").over(kw).alias("n"),
        )
        return r.groupBy("event_type").agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col(col)
                )
            ).alias(out)
        )

    m = lower_median(v, "cents", "median_cents")
    dev = v.join(F.broadcast(m), "event_type").select(
        "event_type",
        "cents",
        F.abs(F.col("cents") - F.col("median_cents")).alias("ad"),
    )
    mad = lower_median(dev, "ad", "mad_cents")
    return (
        dev.join(F.broadcast(m), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_cents", "mad_cents")
        .agg(
            F.count("*").cast("bigint").alias("n_values"),
            F.sum(
                F.when(
                    F.col("ad") * 10 > 74 * F.col("mad_cents"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )

@query(
    "events_wow_change",
    """
    WITH w AS (
      SELECT event_type, epoch_ms(ts) // 604800000 AS week,
             count(*) AS n
      FROM events GROUP BY event_type, epoch_ms(ts) // 604800000
    )
    SELECT event_type, week, CAST(n AS BIGINT) AS n,
           CAST(lag(n) OVER (PARTITION BY event_type ORDER BY week)
                AS BIGINT) AS prev_n,
           CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY week)
                AS BIGINT) AS delta
    FROM w
    """,
)
def events_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movement report: per type the weekly count, the
    previous week's count and the raw delta (integer witnesses; the
    consumer divides for percent change — shipping the ratio would put
    a float division between the engines). Weeks are zone-free integer
    epoch-weeks. The report every metrics dashboard opens with.

    Scale shape: events collapse to a (types × weeks) frame in one
    map-side-combining agg; the lag window sorts that rollup, never
    the events."""
    ev = load(spark, sf_dir, "events")
    w = ev.groupBy(
        "event_type",
        F.floor(ntz_epoch_ms(F.col("ts")) / F.lit(604_800_000)).alias("week"),
    ).agg(F.count("*").alias("n"))
    lw = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("n").over(lw)
    return w.select(
        "event_type",
        "week",
        F.col("n").cast("bigint").alias("n"),
        prev.cast("bigint").alias("prev_n"),
        (F.col("n") - prev).cast("bigint").alias("delta"),
    )


@query(
    "text_dup_ngram_fraction",
    """
    WITH occ AS (
      SELECT doc_id, g
      FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS ws
        FROM documents
      ), LATERAL (
        SELECT unnest([array_to_string(ws[i:i+2], ' ')
                       for i in range(1, len(ws) - 1)]) AS g
      )
    ),
    per AS (
      SELECT doc_id, g, count(*) AS c FROM occ GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
             AS dup_occ,
           CAST(sum(c) AS BIGINT) AS total_occ,
           sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 10 > 2 * sum(c)
             AS flagged
    FROM per GROUP BY doc_id
    """,
)
def text_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style duplicated-n-gram quality signal: per
    doc, the fraction of word-3-gram OCCURRENCES whose gram repeats
    within the doc (dup_occ/total_occ > 0.2 flags the doc, decided by
    integer cross-multiplication dup·10 > 2·total) — catches
    template/spam pages whose sentence-level twin (text_repetition)
    misses sub-sentence loops. Occurrence-counting is the exact,
    well-defined variant of Gopher's 'chars in duplicated n-grams'
    (interval-union char accounting is ambiguous under overlap; the
    occurrence ratio orders documents identically).

    Scale shape: one explode + one (doc, gram)-keyed count + one
    doc-keyed rollup — all map-side-combining aggs keyed by doc;
    no join, no window, no cross-doc state (the signal is per-doc, so
    it shards perfectly)."""
    docs = load(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(word_ngrams(words(F.col("text")), 3)).alias("g"),
    )
    per = occ.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    dup = F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
    tot = F.sum("c")
    return per.groupBy("doc_id").agg(
        dup.cast("bigint").alias("dup_occ"),
        tot.cast("bigint").alias("total_occ"),
        (dup * 10 > 2 * tot).alias("flagged"),
    )


@query(
    "search_multi_term_and",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, t
      FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
        FROM documents
      )
      WHERE t IN ('scan', 'data', 'query')
    )
    SELECT doc_id FROM toks GROUP BY doc_id HAVING count(*) = 3
    """,
)
def search_multi_term_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND search by COUNTING — the posting-list intersection
    every inverted index serves (docs containing ALL query terms):
    distinct (doc, term) hits filtered to the query vocabulary, then
    one doc-keyed count with HAVING = |terms| — intersection without
    any self-join (k-way intersection as one aggregate, the standard
    trick when term lists are too big to broadcast).

    Scale shape: the term filter prunes the explode output to query
    terms only BEFORE the distinct (tiny frame); one doc-keyed agg.
    Against the real postings store this is a 3-partition pruned read
    + the same counting agg (plans/api.search_pages_indexed shape)."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.explode(words(F.col("text"))).alias("t")
        )
        .filter(F.col("t").isin("scan", "data", "query"))
        .distinct()
    )
    return (
        toks.groupBy("doc_id")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") == 3)
        .select("doc_id")
    )

@query(
    "events_pareto_share",
    """
    WITH u AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id
    ),
    r AS (
      SELECT c,
             row_number() OVER (ORDER BY c DESC, user_id) AS rk,
             count(*) OVER () AS nu,
             sum(c) OVER () AS total
      FROM u
    ),
    cum AS (
      SELECT (rk * 10 - 1) // nu + 1 AS decile, c, total
      FROM r
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(max(total) AS BIGINT) AS total_events
    FROM cum GROUP BY decile
    """,
)
def events_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-concentration (Pareto) curve: users ranked by event
    count, bucketed into activity deciles (top decile = heaviest
    users), each decile's event share shipped as integer witnesses
    (n_events / total_events — the 80/20 check that decides whether
    per-user skew needs salting, and whom a rate limiter actually
    limits). Decile assignment is pure integer arithmetic on the rank
    ((rk·10−1) div n + 1), so bucket boundaries are identical across
    engines — ntile would also work, but this form makes the boundary
    rule explicit.

    Scale shape: events collapse to the user frame in one agg; the
    rank window sorts users, not events; the decile rollup is 10
    rows."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count("*").alias("c"))
    r = u.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("user_id")))
        .alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("nu"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    )
    return (
        r.select(
            (F.expr("(rk * 10 - 1) div nu") + 1).cast("bigint").alias("decile"),
            "c",
            "total",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_events"),
            F.max("total").cast("bigint").alias("total_events"),
        )
    )


@query(
    "events_error_bursts",
    """
    WITH m AS (
      SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n_errors
      FROM events WHERE event_type = 'error'
      GROUP BY epoch_ms(ts) // 3600000
    ),
    tot AS (SELECT sum(n_errors) AS te, count(*) AS th FROM m),
    hot AS (
      SELECT hour, n_errors FROM m, tot WHERE n_errors * th > 2 * te
    ),
    isl AS (
      SELECT hour, n_errors,
             hour - row_number() OVER (ORDER BY hour) AS grp
      FROM hot
    )
    SELECT min(hour) AS start_hour,
           max(hour) AS end_hour,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(n_errors) AS BIGINT) AS n_errors
    FROM isl GROUP BY grp
    HAVING count(*) >= 2
    """,
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection: maximal runs of CONSECUTIVE hours each
    carrying more than 2x the average hourly error count, reported
    when the run lasts >= 2 hours — gaps-and-islands-by-subtraction
    (hour − rank is constant exactly within a consecutive run), how
    you find incident windows in telemetry without a self-join or a
    state machine. The threshold is RELATIVE and integer-decided
    (n·total_hours > 2·total_errors — no average ever divided), so
    the gate scale-adapts instead of hard-coding a rate.

    Scale shape: errors collapse to the hour rollup first (map-side
    agg), a 1-row totals broadcast gates hot hours BEFORE the window,
    the rank window sorts the hot-hour frame (≤ span hours, data-
    independent of event volume), and bursts are one more rollup. The
    streaming twin is a session window with a 1-hour gap — this batch
    form is its backfill/audit query."""
    ev = load(spark, sf_dir, "events")
    m = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            F.floor(ntz_epoch_ms(F.col("ts")) / F.lit(3_600_000)).alias("hour")
        )
        .agg(F.count("*").alias("n_errors"))
    )
    tot = m.agg(
        F.sum("n_errors").alias("te"), F.count("*").alias("th")
    )
    hot = m.crossJoin(F.broadcast(tot)).filter(
        F.col("n_errors") * F.col("th") > 2 * F.col("te")
    )
    isl = hot.select(
        "hour",
        "n_errors",
        (F.col("hour") - F.row_number().over(Window.orderBy("hour"))).alias(
            "grp"
        ),
    )
    return (
        isl.groupBy("grp")
        .agg(
            F.min("hour").alias("start_hour"),
            F.max("hour").alias("end_hour"),
            F.count("*").cast("bigint").alias("n_hours"),
            F.sum("n_errors").cast("bigint").alias("n_errors"),
        )
        .filter(F.col("n_hours") >= 2)
        .drop("grp")
        .select("start_hour", "end_hour", "n_hours", "n_errors")
    )

@query(
    "daily_revenue_7d",
    """
    WITH d AS (
      SELECT epoch_ms(o_orderdate) // 86400000 AS day,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY epoch_ms(o_orderdate) // 86400000
    )
    SELECT day, rev_cents,
           CAST(sum(rev_cents) OVER (ORDER BY day
                                     RANGE BETWEEN 6 PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
             AS rev_7d_cents,
           CAST(count(*) OVER (ORDER BY day
                               RANGE BETWEEN 6 PRECEDING
                               AND CURRENT ROW) AS BIGINT)
             AS days_in_window
    FROM d
    """,
)
def daily_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue — the moving-window report every revenue
    dashboard draws — via a RANGE frame over integer epoch-days (RANGE,
    not ROWS: missing days must still bound the window by VALUE, or a
    gap silently widens the trailing week — the classic moving-average
    bug). The 7-day SUM ships with the in-window day count as integer
    witnesses; the consumer divides for the average. Exact cents via
    DECIMAL(18,2).

    Scale shape: orders collapse to the day frame in one agg; the
    range window sorts days, not orders (span-bounded,
    data-independent). An unpartitioned window over a DAY frame is a
    single-task sort of a tiny projection — at multi-year spans
    partition by year with a 6-day overlap carry, same results."""
    o = load(spark, sf_dir, "orders")
    d = o.groupBy(
        F.floor(ntz_epoch_ms(F.col("o_orderdate")) / F.lit(86_400_000)).alias(
            "day"
        )
    ).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return d.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("rev_7d_cents"),
        F.count("*").over(w).cast("bigint").alias("days_in_window"),
    )


@query(
    "events_inactive_churn",
    """
    WITH span AS (
      SELECT min(epoch_ms(ts)) AS t0, max(epoch_ms(ts)) AS t1 FROM events
    ),
    u AS (
      SELECT user_id,
             min(epoch_ms(ts)) AS first_ms,
             max(epoch_ms(ts)) AS last_ms,
             count(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT u.user_id,
           CAST(u.n_events AS BIGINT) AS n_events,
           (span.t1 - u.last_ms) // 86400000 AS days_silent,
           u.first_ms < span.t0 + 7 * CAST(86400000 AS BIGINT)
             AS early_adopter
    FROM u, span
    WHERE u.last_ms < span.t1 - CAST(86400000 AS BIGINT)
    """,
)
def events_inactive_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn surface: users silent for the dataset's final day —
    per churned user the activity volume, exact days-silent, and
    whether they were an early adopter (first seen in week one) — the
    input table every retention intervention ranks. Pure integer
    epoch-ms arithmetic against the dataset's own span (reproducible,
    no wall-clock).

    Scale shape: one user-keyed agg collapses events; the global span
    is a 1-row broadcast onto the user frame. No window, no join
    larger than users."""
    ev = load(spark, sf_dir, "events")
    ms = ntz_epoch_ms(F.col("ts"))
    span = ev.agg(F.min(ms).alias("t0"), F.max(ms).alias("t1"))
    u = ev.groupBy("user_id").agg(
        F.min(ms).alias("first_ms"),
        F.max(ms).alias("last_ms"),
        F.count("*").alias("n_events"),
    )
    week = 7 * F.lit(86_400_000).cast("bigint")
    return (
        u.crossJoin(F.broadcast(span))
        .filter(F.col("last_ms") < F.col("t1") - F.lit(86_400_000).cast("bigint"))
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.expr("(t1 - last_ms) div 86400000").alias("days_silent"),
            (F.col("first_ms") < F.col("t0") + week).alias("early_adopter"),
        )
    )


@query(
    "nation_trade_balance",
    """
    WITH rev AS (
      SELECT c.c_nationkey AS cust_nation, s.s_nationkey AS supp_nation,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS r
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY c.c_nationkey, s.s_nationkey
    ),
    outb AS (
      SELECT supp_nation AS nation, sum(r) AS sold
      FROM rev WHERE cust_nation <> supp_nation GROUP BY supp_nation
    ),
    inb AS (
      SELECT cust_nation AS nation, sum(r) AS bought
      FROM rev WHERE cust_nation <> supp_nation GROUP BY cust_nation
    )
    SELECT n.n_nationkey AS nation, n.n_name,
           CAST(coalesce(o.sold, 0) AS BIGINT) AS exported_x10000,
           CAST(coalesce(i.bought, 0) AS BIGINT) AS imported_x10000,
           CAST(coalesce(o.sold, 0) - coalesce(i.bought, 0) AS BIGINT)
             AS balance_x10000
    FROM nation n
    LEFT JOIN outb o ON o.nation = n.n_nationkey
    LEFT JOIN inb i ON i.nation = n.n_nationkey
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7's economics generalized: per nation, cross-nation
    revenue SOLD (as supplier nation) vs BOUGHT (as customer nation)
    and the trade balance — exact x10000 integer money end to end.
    Same-nation trade is excluded from both sides, so the global
    balance sums to zero (a built-in consistency check the oracle
    inherits).

    Scale shape: ONE fact pass builds the (cust_nation, supp_nation)
    revenue matrix — nations² rows — with customer/supplier joins
    keyed by the fact's own keys (supplier broadcast; orders⋈customer
    pre-joined on custkey); both rollups and the nation LEFT joins
    then run on the matrix, which is broadcast-sized at any corpus
    scale."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    rev = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("cust_nation"),
            F.col("s_nationkey").alias("supp_nation"),
        )
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("r")
        )
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    outb = rev.groupBy(F.col("supp_nation").alias("nation")).agg(
        F.sum("r").alias("sold")
    )
    inb = rev.groupBy(F.col("cust_nation").alias("nation")).agg(
        F.sum("r").alias("bought")
    )
    return (
        n.select(F.col("n_nationkey").alias("nation"), "n_name")
        .join(outb, "nation", "left")
        .join(inb, "nation", "left")
        .select(
            "nation",
            "n_name",
            F.coalesce("sold", F.lit(0)).cast("bigint").alias("exported_x10000"),
            F.coalesce("bought", F.lit(0))
            .cast("bigint")
            .alias("imported_x10000"),
            (F.coalesce("sold", F.lit(0)) - F.coalesce("bought", F.lit(0)))
            .cast("bigint")
            .alias("balance_x10000"),
        )
    )

@query(
    "warc_revisit_records",
    f"""
    WITH cdx AS ({_ORACLE_REG["warc_cdx_index"]}),
    recap AS (
      SELECT digest, urlkey, warc_file + 16 AS warc_file,
             rec_offset, rec_length
      FROM cdx
      WHERE CAST(regexp_extract(urlkey, '([0-9]+)$', 1) AS BIGINT) % 5 = 0
    ),
    caps AS (
      SELECT digest, urlkey, warc_file, rec_offset, rec_length FROM cdx
      UNION ALL
      SELECT digest, urlkey, warc_file, rec_offset, rec_length FROM recap
    ),
    r AS (
      SELECT digest, urlkey, warc_file, rec_length,
             row_number() OVER (PARTITION BY digest
                                ORDER BY warc_file, rec_offset) AS rn,
             count(*) OVER (PARTITION BY digest) AS n,
             sum(rec_length) OVER (PARTITION BY digest) AS tot
      FROM caps
    )
    SELECT digest,
           CAST(n AS BIGINT) AS n_records,
           urlkey AS canonical_urlkey,
           warc_file AS canonical_file,
           CAST(tot - rec_length AS BIGINT) AS bytes_saved
    FROM r WHERE rn = 1 AND n >= 2
    """,
)
def warc_revisit_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC revisit-record planning: URL-agnostic content dedup over
    the archive's CDX by payload digest — every digest stored more
    than once keeps its FIRST copy (archive order: file, then offset)
    as the canonical response and the rest become revisit stubs, the
    exact WARC-Type: revisit mechanism web archives use; bytes_saved
    is the storage the rewrite reclaims. The capture space models a
    second crawl pass that re-captured every 5th doc unchanged
    (mirror files +16) — the recrawl situation that produces
    revisits; digests collide because content, not URL+date, keys
    them. Composes the CDX operator
    (the oracle literally embeds warc_cdx_index's SQL as a CTE — one
    definition, two consumers).

    Scale shape: one digest-keyed window over the CDX (index-sized,
    never archive-sized — that is the point of CDX); first-copy choice
    is deterministic archive order, no dropDuplicates."""
    cdx = warc_cdx_index(spark, sf_dir).select(
        "digest", "urlkey", "warc_file", "rec_offset", "rec_length"
    )
    recap = cdx.filter(
        F.regexp_extract(F.col("urlkey"), "([0-9]+)$", 1).cast("bigint") % 5
        == 0
    ).withColumn("warc_file", F.col("warc_file") + 16)
    caps = cdx.unionByName(recap)
    kw = Window.partitionBy("digest")
    r = caps.select(
        "digest",
        "urlkey",
        "warc_file",
        "rec_length",
        F.row_number()
        .over(kw.orderBy("warc_file", "rec_offset"))
        .alias("rn"),
        F.count("*").over(kw).alias("n"),
        F.sum("rec_length").over(kw).alias("tot"),
    )
    return r.filter((F.col("rn") == 1) & (F.col("n") >= 2)).select(
        "digest",
        F.col("n").cast("bigint").alias("n_records"),
        F.col("urlkey").alias("canonical_urlkey"),
        F.col("warc_file").alias("canonical_file"),
        (F.col("tot") - F.col("rec_length")).cast("bigint").alias("bytes_saved"),
    )

@query(
    "events_dow_hour_profile",
    """
    SELECT ((epoch_ms(ts) // 86400000) + 4) % 7 AS dow,
           (epoch_ms(ts) % 86400000) // 3600000 AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality heatmap: event volume by (day-of-week,
    hour-of-day) — the 7x24 profile capacity planning and anomaly
    baselines are built from. Day-of-week is PURE integer arithmetic
    ((epoch_day + 4) % 7 — 1970-01-01 was a Thursday, which lands at
    4, so the encoding is 0 = Sunday .. 6 = Saturday):
    date-part functions route through locale/zone rules that differ
    between engines, integer epoch math cannot.

    Scale shape: one map-side-combining agg straight to a 168-row
    frame; nothing else."""
    ev = load(spark, sf_dir, "events")
    ms = ntz_epoch_ms(F.col("ts"))
    return (
        ev.groupBy(
            ((F.floor(ms / F.lit(86_400_000)) + 4) % 7).alias("dow"),
            F.floor((ms % 86_400_000) / F.lit(3_600_000)).alias(
                "hour_of_day"
            ),
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )


@query(
    "returns_by_supplier",
    """
    WITH s AS (
      SELECT l_suppkey,
             count(*) AS n_lines,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS n_returned
      FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (
      SELECT sum(n_lines) AS tl, sum(n_returned) AS tr FROM s
    )
    SELECT s.l_suppkey,
           CAST(s.n_lines AS BIGINT) AS n_lines,
           CAST(s.n_returned AS BIGINT) AS n_returned,
           s.n_returned * tot.tl > 2 * tot.tr * s.n_lines AS flagged
    FROM s, tot
    """,
)
def returns_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier quality audit: per-supplier return rate with the
    outlier verdict decided by integer cross-multiplication against
    the GLOBAL rate (returned·TL > 2·TR·lines ⇔ supplier rate > 2x
    corpus rate) — the relative-threshold pattern (events_error_bursts,
    term_drift_chi2) applied to marketplace trust & safety. Witnesses
    ship; no rate is ever divided.

    Scale shape: one supplier-keyed map-side agg + a 1-row totals
    broadcast. The fact table is touched once."""
    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
    )
    tot = s.agg(
        F.sum("n_lines").alias("tl"), F.sum("n_returned").alias("tr")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "l_suppkey",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_returned").cast("bigint").alias("n_returned"),
        (
            F.col("n_returned") * F.col("tl")
            > 2 * F.col("tr") * F.col("n_lines")
        ).alias("flagged"),
    )


@query(
    "eventid_gap_audit",
    """
    WITH r AS (
      SELECT event_id,
             event_id - row_number() OVER (ORDER BY event_id) AS grp
      FROM events
    ),
    runs AS (
      SELECT grp, min(event_id) AS run_start, max(event_id) AS run_end
      FROM r GROUP BY grp
    ),
    gaps AS (
      SELECT run_end AS gap_after,
             lead(run_start) OVER (ORDER BY run_start) - run_end - 1
               AS gap_len
      FROM runs
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(gap_len), 0) AS BIGINT) AS missing_ids,
           CAST(max(gap_len) AS BIGINT) AS largest_gap
    FROM gaps WHERE gap_len IS NOT NULL AND gap_len > 0
    """,
)
def eventid_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-completeness audit: gaps in the event_id sequence —
    how many holes, how many ids missing, the largest hole — the CDC /
    log-shipping integrity check that catches a dropped partition or a
    truncated batch before anything downstream trusts the table.
    Contiguous runs found by the id − rank constant (gaps-and-islands
    again); the gap list is the lead() difference between consecutive
    runs.

    Scale shape: the rank window is the only event-sized operation
    (one sort by a monotone key — at 100 TB this audits per shard:
    partition by id-range bucket and union the 3-number rollups; the
    cross-bucket boundary gaps fall out of the bucket min/max frame).
    Runs and gaps are tiny frames."""
    ev = load(spark, sf_dir, "events")
    r = ev.select(
        "event_id",
        (
            F.col("event_id") - F.row_number().over(Window.orderBy("event_id"))
        ).alias("grp"),
    )
    runs = r.groupBy("grp").agg(
        F.min("event_id").alias("run_start"),
        F.max("event_id").alias("run_end"),
    )
    gaps = runs.select(
        (
            F.lead("run_start").over(Window.orderBy("run_start"))
            - F.col("run_end")
            - 1
        ).alias("gap_len")
    ).filter(F.col("gap_len").isNotNull() & (F.col("gap_len") > 0))
    return gaps.agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.coalesce(F.sum("gap_len"), F.lit(0))
        .cast("bigint")
        .alias("missing_ids"),
        F.max("gap_len").cast("bigint").alias("largest_gap"),
    )

@query(
    "langid_confusion",
    """
    WITH p AS (
      SELECT lang AS tagged_lang,
           CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> list_contains(string_split('the a of and to in is for on with', ' '), w)))
                  AS DOUBLE)
                / greatest(len(string_split(text, ' ')), 1) >= 0.05
                THEN 'en' ELSE 'unknown' END AS detected_lang
      FROM documents
    )
    SELECT tagged_lang, detected_lang, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY tagged_lang, detected_lang
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a first-class operator: the confusion
    matrix of the langid heuristic against the corpus's tagged labels
    — per (true, predicted) cell counts, from which precision/recall/
    F1 per class are exact rationals the consumer computes (no float
    ships). The eval harness every model-in-the-loop pipeline runs
    after text_langid-style scoring; same contract as
    ann_multiprobe_recall (pin quality with an exact integer audit).

    Scale shape: the per-doc predict column (pure JVM higher-order
    functions, identical expression to text_langid) + one
    |labels|²-bounded hash agg."""
    pred = text_langid(spark, sf_dir)
    return pred.groupBy("tagged_lang", "detected_lang").agg(
        F.count("*").cast("bigint").alias("n")
    )


@query(
    "dedup_threshold_sweep",
    f"""
    WITH v AS ({_ORACLE_REG["dedup_lsh_verified_jaccard"]}),
    ts AS (SELECT unnest([2, 4, 6, 8]) AS threshold_x10)
    SELECT ts.threshold_x10,
           CAST(sum(CASE WHEN v.jaccard * 10 >= ts.threshold_x10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
    FROM ts, v
    GROUP BY ts.threshold_x10
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-sensitivity curve for the production near-dup
    pipeline: how many verified candidate pairs survive at Jaccard
    0.2/0.4/0.6/0.8 — the tuning table that decides where to set the
    dedup cut before a 100-TB run deletes the wrong tail. Composes the
    verified pipeline (the oracle embeds its SQL as a CTE — one
    definition, two consumers, same pattern as warc_revisit_records);
    comparisons run on the pipeline's own round(_,5) values, already
    proven bit-identical across engines by its hash-matching oracle.

    Scale shape: the expensive part (LSH candidates + exact verify)
    runs ONCE; the sweep is a 4-row broadcast cross join + conditional
    counts over the verified pair frame (candidate-sized, never
    corpus-sized)."""
    v = dedup_lsh_verified_jaccard(spark, sf_dir)
    ts = spark.range(1).select(
        F.explode(F.array(*[F.lit(t) for t in (2, 4, 6, 8)])).alias(
            "threshold_x10"
        )
    )
    return (
        v.crossJoin(F.broadcast(ts))
        .groupBy("threshold_x10")
        .agg(
            F.sum(
                F.when(
                    F.col("jaccard") * 10 >= F.col("threshold_x10"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pairs")
        )
    )

@query(
    "events_new_vs_returning",
    """
    WITH u AS (
      SELECT user_id, min(epoch_ms(ts) // 604800000) AS first_week
      FROM events GROUP BY user_id
    ),
    w AS (
      SELECT e.user_id, epoch_ms(e.ts) // 604800000 AS week,
             u.first_week
      FROM events e JOIN u ON u.user_id = e.user_id
      GROUP BY e.user_id, epoch_ms(e.ts) // 604800000, u.first_week
    )
    SELECT week,
           CAST(sum(CASE WHEN week = first_week THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN week > first_week THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM w GROUP BY week
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per week, users active for the FIRST time vs
    returning — the new/returning split every growth dashboard leads
    with (cohort_retention's triangle collapsed to its top edge plus
    the comeback mass). Weeks are zone-free integer epoch-weeks.

    Scale shape: user_id is the only event-sized shuffle key (first-
    week agg + the distinct-active rollup co-partition on it — one
    exchange, AQE-reused); the weekly split aggregates the user-week
    frame, never raw events."""
    ev = load(spark, sf_dir, "events")
    week = F.floor(ntz_epoch_ms(F.col("ts")) / F.lit(604_800_000))
    u = ev.groupBy("user_id").agg(F.min(week).alias("first_week"))
    w = (
        ev.select("user_id", week.alias("week"))
        .distinct()
        .join(u, "user_id")
    )
    return w.groupBy("week").agg(
        F.sum(F.when(F.col("week") == F.col("first_week"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("week") > F.col("first_week"), 1).otherwise(0))
        .cast("bigint")
        .alias("returning_users"),
    )

@query(
    "segment_revenue_share",
    """
    SELECT c.c_mktsegment,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT)
             AS revenue_x10000
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def segment_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment (the classic GTM rollup; last unused
    input column — every testdata table and column now feeds at least
    one oracled operator): distinct-order counts + exact x10000
    integer revenue per c_mktsegment.

    Scale shape: one fact pass; orders⋈customer co-partition on
    custkey before the lineitem join ships revenue by orderkey; the
    rollup is |segments|-sized. The distinct-order count rides the
    same agg (count-distinct expands map-side)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_orderkey").cast("bigint").alias("n_orders"),
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("revenue_x10000"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H completion family (round 5 session 7): the remaining classic
# OLAP shapes expressible over the available columns (no partsupp /
# commitdate / shipmode in the testdata, so Q2/Q11/Q12/Q16/Q20/Q21 are
# out of reach by schema; Q3≙top_orders_by_revenue, Q1≙pricing_summary,
# Q4≙order_priority_sla, Q5/Q7/Q14 landed in session 6). Reference
# analog: the API's result/search endpoints compose the same
# filter→join→rollup shapes (api/services/db_service.py,
# api/services/search_service.py).
# ---------------------------------------------------------------------------
@query(
    "forecast_revenue_change",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                * 10000 AS BIGINT) AS revenue_delta_x10000,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): revenue given up to discounts
    in one ship year for mid-band discounts on small quantities —
    the canonical scan-only query: zero joins, zero shuffles beyond
    the 2-row final agg.

    Scale shape: everything rides predicate pushdown — all three
    filters reach the parquet scan (year range prunes row groups via
    min/max stats; discount band and quantity cap drop pages), and
    column pruning reads 4 of 11 lineitem columns. At 100 TB this is
    the query that proves the scan path: no exchange, one partial agg
    per task, one 1-row reduce. Discounts are exact 0.01 multiples
    from the same parquet doubles in both engines, so the BETWEEN
    band cannot straddle an ulp."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,4)"
                    )
                )
                * 10000
            )
            .cast("bigint")
            .alias("revenue_delta_x10000"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "nation_market_share",
    """
    SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
           n2.n_name AS supp_nation,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT)
             AS nation_rev_x10000
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    GROUP BY 1, 2
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): per order year, each supplier
    nation's revenue from ECONOMY parts sold to ASIA-region customers
    — exact x10000 witnesses (the share divides a year's rows by
    their sum; shipping the division would cross-engine-ulp).

    Scale shape: FIVE of the six joins broadcast (region, both nation
    legs, supplier, and the type-filtered part slice — at 100 TB the
    part filter keeps ~1/6 of parts, still dim-sized); the only
    fact-fact shuffle is lineitem⋈orders on orderkey. The p_type and
    r_name predicates are join conditions, so Catalyst prunes part
    and region before the broadcast, not after the join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    cust_asia = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == n.n_nationkey,
    ).select("c_custkey")
    supp_nat = F.broadcast(
        s.join(n2, s.s_nationkey == F.col("n2_nationkey")).select(
            "s_suppkey", "supp_nation"
        )
    )
    lo = li.join(o, o.o_orderkey == li.l_orderkey)
    return (
        lo.join(cust_asia, lo.o_custkey == cust_asia.c_custkey)
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(supp_nat, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            "supp_nation",
        )
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("nation_rev_x10000")
        )
    )


@query(
    "product_type_profit",
    """
    SELECT n.n_name AS supp_nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT)
             AS profit_x10000
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: the testdata carries no
    ps_supplycost, so profit is the gross-revenue proxy
    extendedprice·(1−discount) — the join/rollup shape (the point of
    Q9: a name-LIKE part prune fanned across every supplier nation ×
    order year) is unchanged. Exact x10000 witnesses.

    Scale shape: part is pruned by the LIKE before a BROADCAST (the
    substring predicate can't push to parquet stats, but column
    pruning still reads only p_partkey/p_name); supplier⋈nation is a
    broadcast chain; lineitem⋈orders on orderkey is the one big
    shuffle. The part prune runs FIRST so the fact rows that survive
    to the shuffle are only the ~red ones."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    sn = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == li.l_partkey)
        .join(sn, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, o.o_orderkey == F.col("l_orderkey"))
        .groupBy(
            "supp_nation", F.year("o_orderdate").cast("bigint").alias("o_year")
        )
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("profit_x10000")
        )
    )


@query(
    "returned_item_report",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT)
             AS lost_rev_x10000
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    ORDER BY lost_rev_x10000 DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one order half-year. Integer witnesses make
    the top-k tiebreak exact (equal revenues order by custkey, and
    equality is a bigint compare, not a double one).

    Scale shape: the date filter pushes to the orders scan and the
    returnflag filter to the lineitem scan BEFORE their orderkey
    shuffle (the two prunes drop ~92% and ~67% of fact rows
    respectively); nation broadcasts; the top-20 is a
    TakeOrderedAndProject, not a global sort."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("lost_rev_x10000")
        )
        .orderBy(F.desc("lost_rev_x10000"), "c_custkey")
        .limit(20)
    )


@query(
    "customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of per-customer
    order counts with non-urgent orders only — the LEFT join keeps
    zero-order customers in the 0 bucket (the part an inner-join
    rendition silently drops).

    Scale shape: the priority filter prunes orders pre-join; the
    custkey shuffle feeds count(o_orderkey) (null-skipping, so the
    left-miss rows count 0 without a COALESCE pass); the second
    rollup is histogram-sized. No distinct, no window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "top_supplier_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT)
               AS total_rev_x10000
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev_x10000
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev_x10000 = (SELECT max(total_rev_x10000) FROM rev)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) hitting the max quarterly
    revenue — the scalar-subquery-against-own-aggregate shape. Ties
    all surface (integer equality), matching the spec's intent.

    Scale shape: ONE lineitem pass (date-pruned scan → suppkey
    rollup); the max is a 1-row aggregate of the supplier-sized rev
    frame, joined back BROADCAST (the idiomatic Spark scalar
    subquery: no second fact scan, no window over a single
    partition); supplier join also broadcast-sized."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        (
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            * 10000
        )
        .cast("bigint")
        .alias("total_rev_x10000")
    )
    mx = rev.agg(F.max("total_rev_x10000").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev_x10000 == mx.mx)
        .join(F.broadcast(s), s.s_suppkey == rev.l_suppkey)
        .select("s_suppkey", "s_name", "total_rev_x10000")
    )


@query(
    "small_qty_order_revenue",
    """
    WITH pq AS (
      SELECT l_partkey,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             count(*) AS n_lines
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) * 10000
                AS BIGINT) AS small_rev_x10000,
           count(*) AS n_small_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * pq.n_lines < pq.sum_qty
    """,
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lines of
    one brand whose quantity is below 20% of that part's average —
    the correlated-aggregate-per-group shape. The avg compare is
    integer cross-multiplied (qty·5·n < Σqty: quantities are integral
    doubles ≤ 50, so bigint casts are exact and no engine ever
    divides), eliminating the float-boundary flip TPC-H's 0.2*avg
    invites.

    Scale shape: the per-part aggregate reuses lineitem's partkey
    shuffle; its result is part-sized, so the join back to the
    brand-pruned fact slice is AQE-broadcastable. The brand prune
    broadcasts FIRST, so pq could also be computed over just that
    brand's parts at 100 TB (kept global here to mirror the spec's
    subquery scope)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.count("*").alias("n_lines"),
    )
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == li.l_partkey)
        .join(pq, F.col("pq_partkey") == li.l_partkey)
        .filter(
            F.col("l_quantity").cast("bigint") * 5 * F.col("n_lines")
            < F.col("sum_qty")
        )
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) * 10000)
            .cast("bigint")
            .alias("small_rev_x10000"),
            F.count("*").alias("n_small_lines"),
        )
    )


@query(
    "large_volume_customers",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(q.sum_qty AS BIGINT) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    ) q
    JOIN orders o ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line
    quantity exceeds 250 (the group-HAVING-then-join shape; 250 sits
    at the ~99th percentile of this corpus's per-order sums, matching
    the spec's intent of a rare-order report). Prices ship as exact
    cents; quantities are integral doubles so the bigint render is
    exact.

    Scale shape: the HAVING collapses lineitem to a tiny orderkey set
    BEFORE any join — at 100 TB the qualifying set is thousands of
    rows, so both subsequent joins are AQE-broadcast of the SMALL
    side into the fact scans, not fact shuffles. The quantity rollup
    reuses lineitem's natural orderkey clustering."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    q = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        q.join(o, o.o_orderkey == q.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("totalprice_cents"),
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


@query(
    "brand_size_discount_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT)
             AS disc_rev_x10000,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def brand_size_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue from three OR-ed
    brand/size/quantity bands — the disjunctive-predicate join that
    exercises how the optimizer splits a mixed OR across the two
    sides.

    Scale shape: Catalyst derives the part-side implication
    (brand ∈ {12,23,34} AND size ≤ 35) and pushes it below the join,
    so part is pruned to 3 brands before its BROADCAST; the residual
    OR evaluates post-join on the surviving rows only. The
    lineitem-side implication (quantity ≤ 30) likewise pushes to the
    fact scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(band).agg(
        (
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            * 10000
        )
        .cast("bigint")
        .alias("disc_rev_x10000"),
        F.count("*").alias("n_lines"),
    )


@query(
    "dormant_customer_balance",
    """
    WITH bal AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ),
    pos AS (
      SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
             count(*) AS n_pos
      FROM bal WHERE bal_cents > 0
    )
    SELECT n.n_name,
           count(*) AS n_dormant,
           CAST(sum(b.bal_cents) AS BIGINT) AS dormant_cents
    FROM bal b
    JOIN nation n ON n.n_nationkey = b.c_nationkey
    CROSS JOIN pos
    WHERE b.bal_cents * pos.n_pos > pos.sum_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = b.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n.n_name
    """,
)
def dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: customers with an
    above-average positive balance and NO recent orders (the testdata
    has no c_phone, so the country-code grouping becomes the nation
    rollup, and "no orders at all" — empty at this density — becomes
    "no orders since 2000-01-01"). The avg compare is integer
    cross-multiplied over exact cents (bal·n > Σ), so no engine
    divides and no float boundary can flip membership.

    Scale shape: the scalar aggregate is 1 row broadcast back; the
    anti-join against date-pruned orders is the same left_anti the
    crawl's seen-check uses (at 100 TB the date prune keeps the
    recent slice small, and AQE turns the anti-join broadcast);
    nation broadcasts."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    bal = c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    pos = bal.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").cast("bigint").alias("sum_cents"),
        F.count("*").alias("n_pos"),
    )
    rich = bal.crossJoin(F.broadcast(pos)).filter(
        F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents")
    )
    dormant = rich.join(
        o.select("o_custkey"), rich.c_custkey == o.o_custkey, "left_anti"
    )
    return (
        dormant.join(F.broadcast(n), n.n_nationkey == dormant.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_dormant"),
            F.sum("bal_cents").cast("bigint").alias("dormant_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Text-classifier training + sketch family additions (round 5 session 7)
# ---------------------------------------------------------------------------
@query(
    "naive_bayes_model",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    cnt AS (
      SELECT lang, token, count(*) AS c_lt
      FROM toks GROUP BY 1, 2
    ),
    totals AS (
      SELECT lang, CAST(sum(c_lt) AS BIGINT) AS total_l FROM cnt GROUP BY 1
    ),
    vocab AS (
      SELECT count(DISTINCT token) AS vocab_size FROM toks
    )
    SELECT cnt.lang, cnt.token, cnt.c_lt, totals.total_l, vocab.vocab_size
    FROM cnt JOIN totals ON totals.lang = cnt.lang
    CROSS JOIN vocab
    WHERE cnt.c_lt >= 20
    """,
)
def naive_bayes_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes TRAINING as a rollup: the model IS the
    (lang, token) count table plus per-lang token totals and the
    global vocab size — everything a consumer needs for Laplace
    log-probs ((c+1)/(total+V)); no float ever ships (the classifier
    eval itself is langid_confusion's contract). Rows gate at
    count ≥ 20 to keep the published model head-sized.

    Scale shape: ONE token explode feeds the (lang, token) rollup
    map-side; per-lang totals fold the count frame (vocab-sized, not
    corpus-sized); vocab size is a 1-row broadcast. At 100 TB the
    only corpus-sized op is the explode+partial-agg — the classic
    wordcount shard."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(words(F.col("text"))).alias("token")
    )
    cnt = toks.groupBy("lang", "token").agg(F.count("*").alias("c_lt"))
    totals = cnt.groupBy("lang").agg(
        F.sum("c_lt").cast("bigint").alias("total_l")
    )
    vocab = toks.agg(F.countDistinct("token").alias("vocab_size"))
    return (
        cnt.filter(F.col("c_lt") >= 20)
        .join(F.broadcast(totals), "lang")
        .crossJoin(F.broadcast(vocab))
        .select("lang", "token", "c_lt", "total_l", "vocab_size")
    )


@query(
    "lexical_complexity",
    """
    WITH base AS (
      SELECT doc_id,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_distinct(string_split(lower(text), ' ')))
               AS n_distinct_tokens,
             len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_tokens, n_distinct_tokens, n_syllables,
           CAST(n_distinct_tokens * 2 > n_tokens AS BOOLEAN) AS is_diverse,
           CAST(n_syllables * 10 > n_tokens * 15 AS BOOLEAN) AS is_complex
    FROM base
    """,
)
def lexical_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical complexity: type-token diversity and a
    vowel-group syllable proxy (the readability half of
    Flesch-Kincaid that survives a corpus with no sentence
    punctuation — grade formulas' words-per-sentence term is
    degenerate here and documented out). Both flags are integer
    cross-multiplied (distinct·2 > n; syll·10 > 15·n ⇔ avg
    syllables/word > 1.5), so no ratio ever crosses engines.

    Scale shape: pure per-row JVM expressions (split / array_distinct
    / regexp_count) — no explode, no shuffle, shards perfectly; the
    syllable regex runs once over the lowered text, not per token."""
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    n_tokens = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    n_syll = F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_syll.alias("n_syllables"),
        (n_distinct * 2 > n_tokens).alias("is_diverse"),
        (n_syll * 10 > n_tokens * 15).alias("is_complex"),
    )


@query(
    "proximity_search",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS lst FROM documents
    ),
    pa AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(lst, (x, i) -> CASE WHEN x = 'join' THEN i END),
               p -> p IS NOT NULL)) AS pos
      FROM toks
    ),
    pb AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(lst, (x, i) -> CASE WHEN x = 'hash' THEN i END),
               p -> p IS NOT NULL)) AS pos
      FROM toks
    )
    SELECT pa.doc_id,
           min(abs(pa.pos - pb.pos)) AS min_dist,
           count(*) AS n_pairs
    FROM pa JOIN pb ON pb.doc_id = pa.doc_id
                   AND abs(pa.pos - pb.pos) <= 3
    GROUP BY 1
    """,
)
def proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity search ("join" NEAR/3 "hash"): documents where the two
    terms co-occur within 3 token positions, with the closest
    distance and the within-window pair count — the positional step
    up from search_multi_term_and's boolean AND (SURVEY §2.9's
    search family). Distances are position DIFFERENCES, so DuckDB's
    1-based lambda ordinals and Spark's 0-based posexplode agree
    without an offset.

    Scale shape: only MATCHING tokens survive the explode (the
    isin filter sits directly on the generator output, so the
    per-term position frames are occurrence-sized, not
    corpus-sized); the doc-keyed band join runs on those small
    frames. The index-served twin is ``proximity_search_indexed``
    (sources/postings.py probe_near over the positional store) —
    this scan path is its oracle-parity baseline."""
    docs = load(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(words(F.col("text"))).alias("pos", "token"),
    ).filter(F.col("token").isin("join", "hash"))
    pa = pos.filter(F.col("token") == "join").select(
        "doc_id", F.col("pos").alias("pos_a")
    )
    pb = pos.filter(F.col("token") == "hash").select(
        F.col("doc_id").alias("doc_id_b"), F.col("pos").alias("pos_b")
    )
    return (
        pa.join(
            pb,
            (pa.doc_id == pb.doc_id_b)
            & (F.abs(pa.pos_a - pb.pos_b) <= 3),
        )
        .groupBy("doc_id")
        .agg(
            F.min(F.abs(F.col("pos_a") - F.col("pos_b"))).alias("min_dist"),
            F.count("*").alias("n_pairs"),
        )
    )


@query(
    "count_min_sketch",
    """
    WITH cnt AS (
      SELECT t, count(*) AS c
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS t
            FROM documents)
      GROUP BY t
    ),
    rws AS (SELECT unnest(['0', '1', '2', '3']) AS r),
    cells AS (
      SELECT rws.r,
             ('0x' || substr(md5(rws.r || ':' || cnt.t), 1, 15))::BIGINT % 64
               AS col,
             CAST(sum(cnt.c) AS BIGINT) AS counter
      FROM cnt CROSS JOIN rws
      GROUP BY 1, 2
    ),
    top10 AS (
      SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 10
    )
    SELECT top10.t AS token,
           CAST(top10.c AS BIGINT) AS exact_count,
           min(cells.counter) AS cms_estimate
    FROM top10
    CROSS JOIN rws
    JOIN cells ON cells.r = rws.r
       AND cells.col = ('0x' || substr(md5(rws.r || ':' || top10.t), 1, 15))::BIGINT % 64
    GROUP BY 1, 2
    """,
)
def count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d=4 rows × w=64 columns, md5 row-salted
    hashes): CMS point estimates vs exact counts for the top-10
    tokens — the mergeable heavy-hitter sketch next to
    hll_distinct_users (cardinality) and heavy_hitters (exact
    twin). The estimate is min over rows of the hashed cell, and
    CMS's one-sided guarantee (estimate ≥ exact) is visible in the
    output columns. All integer; hashes are the engine-portable
    md5-prefix bigints (non-negative 60-bit, so % ≡ pmod).

    Scale shape: the only corpus-sized op is the wordcount explode;
    the 4-way row fan-out runs on the VOCAB-sized count frame and
    collapses to 256 cells map-side — at 100 TB per-shard sketches
    would sum cell-wise (CMS is linear), which is this exact plan
    with a partial agg. Probes join the 10-row top-k against the
    256-cell frame, both broadcast."""
    docs = load(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(words(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    rws = spark.range(4).select(F.col("id").cast("string").alias("r"))
    cell_col = F.pmod(
        md5_long(F.concat(F.col("r"), F.lit(":"), F.col("t"))), F.lit(64)
    )
    cells = (
        cnt.crossJoin(F.broadcast(rws))
        .groupBy("r", cell_col.alias("col"))
        .agg(F.sum("c").cast("bigint").alias("counter"))
    )
    top10 = cnt.orderBy(F.desc("c"), "t").limit(10)
    probes = top10.crossJoin(F.broadcast(rws)).select(
        F.col("t").alias("token"),
        F.col("c").cast("bigint").alias("exact_count"),
        F.col("r").alias("pr"),
        F.pmod(
            md5_long(F.concat(F.col("r"), F.lit(":"), F.col("t"))), F.lit(64)
        ).alias("pcol"),
    )
    return (
        probes.join(
            cells,
            (cells.r == probes.pr) & (cells.col == probes.pcol),
        )
        .groupBy("token", "exact_count")
        .agg(F.min("counter").alias("cms_estimate"))
    )


@query(
    "proximity_search_indexed",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS lst FROM documents
    ),
    pa AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(lst, (x, i) -> CASE WHEN x = 'join' THEN i END),
               p -> p IS NOT NULL)) AS pos
      FROM toks
    ),
    pb AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(lst, (x, i) -> CASE WHEN x = 'hash' THEN i END),
               p -> p IS NOT NULL)) AS pos
      FROM toks
    )
    SELECT pa.doc_id,
           min(abs(pa.pos - pb.pos)) AS min_dist,
           count(*) AS n_pairs
    FROM pa JOIN pb ON pb.doc_id = pa.doc_id
                   AND abs(pa.pos - pb.pos) <= 3
    GROUP BY 1
    """,
)
def proximity_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/3 search served by the POSITIONAL postings store
    (sources/postings.py probe_near — the OpenSearch match_phrase
    slop analog): same answer as ``proximity_search``, but pa/pb come
    from two bucket-pruned posting rows and the distance test runs as
    JVM array ops over the stored position arrays — document content
    is never read. The oracle recounts from raw text, so the pair
    pins index-served proximity against a from-scratch scan (the
    same contract as search_indexed / phrase_search_indexed).
    Reuses the phrase query's cached positional store: one index,
    two probe types."""
    from .sources.index_cache import cached_store
    from .sources.postings import (
        build_positional_postings,
        probe_near,
        write_postings,
    )

    path, built = cached_store(sf_dir, "postings-pos", "_SUCCESS")
    if not built:
        docs = load(spark, sf_dir, "documents")
        write_postings(
            build_positional_postings(docs, ["doc_id"], "text"),
            path,
            mode="overwrite",
        )
    return probe_near(spark, path, "join", "hash", 3)


# ---------------------------------------------------------------------------
# Personalized PageRank over the link graph (round 5 session 7): the
# crawl-prioritization variant of pagerank_dup_graph — teleport mass
# returns to a SEED set instead of everywhere, so rank measures
# proximity to the frontier's origin (the "focused crawl" ordering a
# production scheduler feeds from).
# ---------------------------------------------------------------------------
def _ppr_sql(iters: int = 4) -> str:
    """Unrolled PPR iterations over the shared link graph — generated
    like _pagerank_sql, MATERIALIZED per the kcore lesson (a CTE
    referenced by every round would otherwise inline into an
    exponential scan tree)."""
    rounds = []
    for k in range(1, iters + 1):
        rounds.append(
            f"""ppr{k} AS MATERIALIZED (
      SELECT n.v,
             CAST(CASE WHEN s.v IS NOT NULL THEN 150000000000 ELSE 0 END
                  + (85 * coalesce(c.contrib, 0)) // 100 AS BIGINT) AS pr
      FROM nodes n
      LEFT JOIN seeds s ON s.v = n.v
      LEFT JOIN (
        SELECT e.w AS v, sum(p.pr // d.outdeg) AS contrib
        FROM sym e
        JOIN ppr{k - 1} p ON p.v = e.v
        JOIN deg d ON d.v = e.v
        GROUP BY e.w
      ) c ON c.v = n.v
    )"""
        )
    chain = ",\n    ".join(rounds)
    return f"""
    WITH {_LINKGRAPH_SQL_CTES},
    nodes AS MATERIALIZED (SELECT DISTINCT v FROM sym),
    deg AS MATERIALIZED (SELECT v, count(*) AS outdeg FROM sym GROUP BY v),
    seeds AS MATERIALIZED (
      SELECT doc_id AS v FROM documents WHERE doc_id % 50 = 0
    ),
    ppr0 AS MATERIALIZED (
      SELECT n.v,
             CAST(CASE WHEN s.v IS NOT NULL
                  THEN 1000000000000 ELSE 0 END AS BIGINT) AS pr
      FROM nodes n LEFT JOIN seeds s ON s.v = n.v
    ),
    {chain}
    SELECT v AS doc_id, pr AS ppr FROM ppr{iters} WHERE pr > 0
    """


@query("personalized_pagerank", _ppr_sql())
def personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (4 iterations, damping 0.85, teleport to
    the doc_id%50 seed set) over the shared undirected link graph —
    rank mass diffuses FROM the seeds, so scores order pages by
    random-walk proximity to the crawl's origin (focused-crawl /
    related-page ranking; the global variant is pagerank_dup_graph).
    Nodes the walk hasn't reached stay at exactly 0 and drop out —
    the output is the reachable-within-4-hops neighborhood, scored.

    Scale shape: identical to classic distributed PageRank — per
    iteration one edge join ships pr/outdeg, one destination hash
    aggregate, localCheckpoint bounds plan depth; the seed flag rides
    a broadcast LEFT join. Exactness: scaled-10^12 BIGINT ranks,
    integer div only (operands non-negative, floor == trunc both
    engines)."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = (
        edges.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .localCheckpoint(eager=True)
    )
    nodes = sym.select("v").distinct().localCheckpoint(eager=True)
    deg = sym.groupBy("v").agg(F.count("*").alias("outdeg"))
    seeds = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("sv")
    )
    is_seed = F.col("sv").isNotNull()
    pr = nodes.join(F.broadcast(seeds), nodes.v == F.col("sv"), "left").select(
        "v",
        F.when(is_seed, F.lit(1_000_000_000_000))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pr"),
    )
    for _ in range(4):
        prs = pr.select(F.col("v").alias("pv"), "pr")
        contrib = (
            sym.join(prs, sym.v == F.col("pv"))
            .join(deg, "v")
            .select("w", F.expr("pr div outdeg").alias("c"))
            .groupBy(F.col("w").alias("cv"))
            .agg(F.sum("c").alias("contrib"))
        )
        pr = (
            nodes.join(F.broadcast(seeds), nodes.v == F.col("sv"), "left")
            .join(contrib, nodes.v == F.col("cv"), "left")
            .select(
                "v",
                (
                    F.when(is_seed, F.lit(150_000_000_000))
                    .otherwise(F.lit(0))
                    .cast("bigint")
                    + F.expr("(85 * coalesce(contrib, 0)) div 100")
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr.filter(F.col("pr") > 0).select(
        F.col("v").alias("doc_id"), F.col("pr").alias("ppr")
    )


@query(
    "events_ewma_halflife",
    """
    WITH span AS (
      SELECT max(epoch_ms(ts) // 86400000) AS last_day FROM events
    ),
    daily AS (
      SELECT event_type,
             CAST(epoch_ms(ts) // 86400000
                  - (SELECT last_day FROM span) + 29 AS BIGINT) AS di,
             count(*) AS c
      FROM events
      WHERE epoch_ms(ts) // 86400000 > (SELECT last_day FROM span) - 30
      GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(sum(c * (CAST(1 AS BIGINT) << di)) AS BIGINT)
             AS ewma_num_x2p29,
           CAST(sum(c) AS BIGINT) AS n_events
    FROM daily
    GROUP BY event_type
    """,
)
def events_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily activity (half-life = 1 day) per
    event type over the trailing 30 days — the recency-weighted rate
    a throttler or trend detector actually wants. The weights are
    EXACT powers of two (day d of 0..29 weighs 2^d), so the EWMA
    numerator is one integer witness (denominator 2^29 is the
    consumer's constant; yesterday counts literally half of today —
    no float decay constant to disagree about, no summation-order
    ulps).

    Scale shape: events collapse to the (type × 30 days) frame
    map-side; the span end is a 1-row broadcast; the weighted sum
    rides the same rollup via shiftleft. Overflow headroom:
    c·2^29·30 stays under 2^63 until ~5·10^8 events/day/type."""
    ev = load(spark, sf_dir, "events")
    day = (ntz_epoch_ms(F.col("ts")) / F.lit(86_400_000)).cast("bigint")
    ev = ev.select("event_type", day.alias("d"))
    span = ev.agg(F.max("d").alias("last_day"))
    daily = (
        ev.crossJoin(F.broadcast(span))
        .filter(F.col("d") > F.col("last_day") - 30)
        .groupBy(
            "event_type",
            (F.col("d") - F.col("last_day") + 29).alias("di"),
        )
        .agg(F.count("*").alias("c"))
    )
    return daily.groupBy("event_type").agg(
        F.sum(F.col("c") * F.expr("shiftleft(CAST(1 AS BIGINT), CAST(di AS INT))"))
        .cast("bigint")
        .alias("ewma_num_x2p29"),
        F.sum("c").cast("bigint").alias("n_events"),
    )


@query(
    "url_directory_rollup",
    """
    WITH urls AS (
      SELECT doc_id,
             'h' || (doc_id % 7) || '.test' AS host,
             '/' || source AS p1,
             '/' || source || '/d' || (doc_id % 13) AS p2
      FROM documents
    ),
    pref AS (
      SELECT host, p1 AS prefix, 1 AS depth FROM urls
      UNION ALL
      SELECT host, p2, 2 FROM urls
    )
    SELECT host, prefix, CAST(depth AS INT) AS depth,
           count(*) AS n_pages
    FROM pref
    GROUP BY 1, 2, 3
    """,
)
def url_directory_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-space profiling: page counts per (host, path-prefix) at
    every directory depth — the hierarchical rollup a crawl operator
    reads to find hotspot directories before they become traps
    (crawl_trap_detection's digit-collapse is the per-round online
    gate; this is the offline census). URLs derive deterministically
    from doc identity, same convention as robots_rules' synthesized
    corpus.

    Scale shape: prefixes explode to depth≤2 rows per page (bounded
    fan-out, map-side), then one hash rollup — the explode+agg
    wordcount shard; no join, no window. At 100 TB partition the
    output by host for the per-host operator dashboards."""
    docs = load(spark, sf_dir, "documents")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".test"))
    p1 = F.concat(F.lit("/"), F.col("source"))
    p2 = F.concat(
        F.lit("/"),
        F.col("source"),
        F.lit("/d"),
        (F.col("doc_id") % 13).cast("string"),
    )
    pref = docs.select(
        host.alias("host"),
        F.explode(
            F.array(
                F.struct(p1.alias("prefix"), F.lit(1).alias("depth")),
                F.struct(p2.alias("prefix"), F.lit(2).alias("depth")),
            )
        ).alias("x"),
    ).select("host", "x.prefix", "x.depth")
    return pref.groupBy("host", "prefix", "depth").agg(
        F.count("*").alias("n_pages")
    )


@query(
    "table_checksum",
    """
    SELECT source,
           count(*) AS n_rows,
           CAST(sum(('0x' || substr(md5(
                  doc_id || '|' || lang || '|' || n_chars), 1, 15))::BIGINT
                % 1000000000000) AS BIGINT) AS checksum
    FROM documents
    GROUP BY source
    """,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint per source partition: the
    anti-entropy checksum two replicas (or a source and its migrated
    copy) compare to find divergent partitions without shipping rows
    — sum of per-row md5 bigints (mod 10^12 so a 10^6-row partition
    stays far from int64 overflow). Addition commutes, so the
    checksum is insensitive to row order and partitioning — exactly
    why it beats any hash-of-concatenation.

    Scale shape: one scan, per-row JVM md5, map-side partial sums —
    the cheapest possible full-table audit; at 100 TB run per
    partition and compare manifests, shipping only (partition,
    checksum) pairs."""
    docs = load(spark, sf_dir, "documents")
    h = F.pmod(
        md5_long(
            F.concat_ws(
                "|",
                F.col("doc_id").cast("string"),
                F.col("lang"),
                F.col("n_chars").cast("string"),
            )
        ),
        F.lit(1_000_000_000_000),
    )
    return docs.groupBy("source").agg(
        F.count("*").alias("n_rows"),
        F.sum(h).cast("bigint").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Link-graph local structure + sketch algebra (round 5 session 7)
# ---------------------------------------------------------------------------
@query(
    "clustering_coefficient",
    f"""
    WITH {_LINKGRAPH_SQL_CTES},
    deg AS MATERIALIZED (SELECT v, count(*) AS degree FROM sym GROUP BY v),
    wedge AS (
      SELECT s1.v, s1.w AS u, s2.w AS w2
      FROM sym s1 JOIN sym s2 ON s2.v = s1.v AND s1.w < s2.w
    ),
    tri AS (
      SELECT wedge.v, count(*) AS n_tri
      FROM wedge JOIN edges e ON e.a = wedge.u AND e.b = wedge.w2
      GROUP BY 1
    )
    SELECT d.v AS doc_id,
           CAST(d.degree AS BIGINT) AS degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_triangles,
           4 * coalesce(t.n_tri, 0) >= d.degree * (d.degree - 1)
             AS is_clustered
    FROM deg d LEFT JOIN tri t ON t.v = d.v
    """,
)
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL clustering coefficient per node over the shared link
    graph (triangle_count is the global census; this is the per-node
    cohesion signal that separates tight communities from hub spam).
    The coefficient itself is n_tri / C(degree,2) — both witnesses
    ship as integers and the cc ≥ 0.5 flag is cross-multiplied
    (4·tri ≥ deg·(deg−1)), so no engine divides.

    Scale shape: wedges = one self-join of the symmetric adjacency on
    the center vertex (Σdeg² rows — the standard triangle-counting
    bound; at 100 TB cap hub degrees or sample wedges per the
    Cohen-style estimators), closed by one join against the a<b edge
    list, then a center-keyed count. Everything hash-joins; no
    windows."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    deg = sym.groupBy("v").agg(F.count("*").alias("degree"))
    s2 = sym.select(F.col("v").alias("v2"), F.col("w").alias("w2"))
    wedge = sym.join(
        s2, (F.col("v2") == F.col("v")) & (F.col("w") < F.col("w2"))
    ).select("v", F.col("w").alias("u"), "w2")
    tri = (
        wedge.join(
            edges, (edges.a == F.col("u")) & (edges.b == F.col("w2"))
        )
        .groupBy(F.col("v").alias("tv"))
        .agg(F.count("*").alias("n_tri"))
    )
    return deg.join(tri, deg.v == F.col("tv"), "left").select(
        F.col("v").alias("doc_id"),
        F.col("degree").cast("bigint").alias("degree"),
        F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_triangles"),
        (
            4 * F.coalesce("n_tri", F.lit(0))
            >= F.col("degree") * (F.col("degree") - 1)
        ).alias("is_clustered"),
    )


@query(
    "link_prediction_common_neighbors",
    f"""
    WITH {_LINKGRAPH_SQL_CTES},
    wedge AS (
      SELECT s1.w AS u, s2.w AS w2
      FROM sym s1 JOIN sym s2 ON s2.v = s1.v AND s1.w < s2.w
    ),
    cand AS (
      SELECT u, w2, count(*) AS n_common
      FROM wedge
      GROUP BY 1, 2
    )
    SELECT c.u AS doc_a, c.w2 AS doc_b, c.n_common
    FROM cand c
    LEFT JOIN edges e ON e.a = c.u AND e.b = c.w2
    WHERE e.a IS NULL
    ORDER BY c.n_common DESC, c.u, c.w2
    LIMIT 20
    """,
)
def link_prediction_common_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Link prediction by common-neighbor count: the top-20
    NON-adjacent node pairs sharing the most neighbors — the classic
    "pages that should link" / related-domain primitive (the simplest
    of the Liben-Nowell–Kleinberg predictors; Jaccard/Adamic-Adar are
    the same wedge frame with per-endpoint degree witnesses).
    Deterministic top-k: integer count desc, then (a, b).

    Scale shape: the SAME Σdeg²-bounded wedge self-join as
    clustering_coefficient, collapsed map-side to candidate pairs,
    then one anti-join against the edge list removes already-linked
    pairs; the top-20 is TakeOrderedAndProject. At 100 TB bound hub
    degrees (drop or sample centers above a cap) — the standard
    wedge-sampling move."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    s2 = sym.select(F.col("v").alias("v2"), F.col("w").alias("w2"))
    cand = (
        sym.join(s2, (F.col("v2") == F.col("v")) & (F.col("w") < F.col("w2")))
        .groupBy(F.col("w").alias("u"), "w2")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        cand.join(
            edges, (edges.a == cand.u) & (edges.b == cand.w2), "left_anti"
        )
        .select(
            F.col("u").alias("doc_a"),
            F.col("w2").alias("doc_b"),
            "n_common",
        )
        .orderBy(F.desc("n_common"), "doc_a", "doc_b")
        .limit(20)
    )


@query(
    "hll_union_merge",
    """
    WITH h AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hash
      FROM events
    ),
    per_type AS (
      SELECT event_type, hash % 128 AS register,
             max(CASE WHEN hash // 128 > 0
                      THEN 53 - length(bin(hash // 128)) + 1
                      ELSE 54 END) AS rho
      FROM h GROUP BY 1, 2
    ),
    merged AS (
      SELECT register, max(rho) AS rho FROM per_type GROUP BY 1
    ),
    direct AS (
      SELECT hash % 128 AS register,
             max(CASE WHEN hash // 128 > 0
                      THEN 53 - length(bin(hash // 128)) + 1
                      ELSE 54 END) AS rho
      FROM h GROUP BY 1
    )
    SELECT count(*) AS n_registers,
           CAST(sum(d.rho) AS BIGINT) AS rho_sum_direct,
           CAST(sum(m.rho) AS BIGINT) AS rho_sum_merged,
           CAST(count(*) FILTER (WHERE m.rho = d.rho) AS BIGINT)
             AS n_matching
    FROM direct d JOIN merged m USING (register)
    """,
)
def hll_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL MERGEABILITY, pinned as a query: per-event-type register
    tables max-merged == the register table computed over the union
    directly (n_matching == n_registers in the output row). This is
    THE property that makes the sketch a 100-TB operator — per-shard
    / per-day sketches fold by register max with no re-scan — and
    the reason hll_distinct_users' register table can be resumable
    state. Same portable md5 register/rho construction as
    hll_distinct_users (m=128, 7 low bits route, rho = leading-zero
    rank of the 53-bit rest).

    Scale shape: both pipelines are map-side partial-max rollups
    bounded by m registers per group; the comparison joins two
    ≤128-row frames."""
    events = load(spark, sf_dir, "events")
    hash_c = md5_long(F.col("user_id").cast("string"))
    h = events.select(
        "event_type",
        (hash_c % 128).alias("register"),
        F.shiftright(hash_c, 7).alias("rest"),
    )
    rho = F.max(
        F.when(
            F.col("rest") > 0, F.lit(53) - F.length(F.bin("rest")) + F.lit(1)
        ).otherwise(F.lit(54))
    ).alias("rho")
    per_type = h.groupBy("event_type", "register").agg(rho)
    merged = per_type.groupBy("register").agg(
        F.max("rho").alias("m_rho")
    )
    direct = h.groupBy("register").agg(rho)
    return (
        direct.join(merged, "register")
        .agg(
            F.count("*").alias("n_registers"),
            F.sum("rho").cast("bigint").alias("rho_sum_direct"),
            F.sum("m_rho").cast("bigint").alias("rho_sum_merged"),
            F.sum(F.when(F.col("m_rho") == F.col("rho"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_matching"),
        )
    )


# ---------------------------------------------------------------------------
# Quantized ANN + exact set-similarity join (round 5 session 7)
# ---------------------------------------------------------------------------
@query(
    "ann_int8_topk",
    """
    WITH q8 AS (
      SELECT vec_id,
             list_transform(embedding, x -> CASE
               WHEN CAST(round(x * 10000) AS BIGINT) >= 0
               THEN (CAST(round(x * 10000) AS BIGINT) * 127) // 10000
               ELSE -((-CAST(round(x * 10000) AS BIGINT) * 127) // 10000)
             END) AS qv
      FROM embeddings
    ),
    queries AS (SELECT vec_id AS qid, qv AS qq FROM q8 WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, e.vec_id,
             CAST(list_sum(list_transform(q.qq, (x, i) -> x * e.qv[i]))
                  AS BIGINT) AS dot
      FROM queries q JOIN q8 e ON e.vec_id != q.qid
    )
    SELECT qid, vec_id AS neighbor, dot
    FROM (
      SELECT qid, vec_id, dot,
             row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
               AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized ANN (the FAISS SQ8 memory-bandwidth move): every
    embedding quantizes to [-127,127] ints (fixed scale 127/1.0 —
    values sit in ±0.5; per-vector scales would add a witness column,
    same plan), and top-5 neighbors rank by the EXACT INTEGER dot
    product — at 100 TB this is 4× less scan bandwidth and SIMD int8
    dots, with re-ranking of the short list in float32 as the
    (optional) second stage. Quantization goes through round(x·10^4)
    bigints and a truncating div emulated identically in both engines
    (DuckDB // floors, Spark div truncates — sign-split so both
    truncate toward zero), so scores carry zero float ulps.

    Scale shape: same broadcast-queries × corpus scan as
    ann_bruteforce_topk; the win is the element width. The integer
    dot is one zip_with+aggregate, codegen'd JVM-side."""
    emb = load(spark, sf_dir, "embeddings")

    def quant(x):
        xi = F.round(x * 10000).cast("bigint")
        mag = F.floor(F.abs(xi) * 127 / 10000).cast("bigint")
        return F.when(xi < 0, -mag).otherwise(mag)

    q8 = emb.select(
        "vec_id", F.transform("embedding", quant).alias("qv")
    )
    queries = q8.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qq")
    )
    dot = F.aggregate(
        F.zip_with("qq", "qv", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(queries)
        .join(q8, F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", dot.alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", F.col("vec_id").alias("neighbor"), "dot")
    )


@query(
    "dedup_prefix_filter",
    """
    WITH sub AS (
      SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents WHERE doc_id % 10 = 0
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
             CAST(len(a.toks) AS BIGINT) + len(b.toks)
               - len(list_intersect(a.toks, b.toks)) AS n_union
      FROM sub a JOIN sub b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, n_inter, CAST(n_union AS BIGINT) AS n_union
    FROM pairs
    WHERE n_inter * 5 >= 3 * n_union
    """,
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-set similarity join (Jaccard ≥ 0.6) by PREFIX
    FILTERING (AllPairs/PPJoin): sort each doc's distinct tokens by
    ascending global frequency; any pair with J ≥ t MUST share a
    token in the first |x|−⌈t·|x|⌉+1 of them, so prefix-token
    collisions are a LOSSLESS candidate set — unlike MinHash-LSH
    there are no false negatives, which is why the oracle is plain
    brute force over the same subset and equality (not recall) is
    the contract. The ceil is integer ((3·sz+4) div 5) and the
    verify is cross-multiplied (inter·5 ≥ 3·union): no floats.

    Scale shape: candidate volume is bounded by rare-token collision
    lists (the frequency-ascending order puts the RAREST tokens in
    the prefix — hot tokens never generate pairs); the verify joins
    token-set arrays for candidate pairs only. The same blocked
    subset as dedup_ngram_jaccard keeps the oracle's all-pairs
    affordable; the Spark side never goes all-pairs."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    sets = docs.select(
        "doc_id", F.array_distinct(words(F.col("text"))).alias("toks")
    ).localCheckpoint(eager=True)
    tok = sets.select(
        "doc_id", F.explode("toks").alias("token")
    )
    freq = tok.groupBy("token").agg(F.count("*").alias("df"))
    ranked = tok.join(freq, "token").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "token")
        ),
    )
    sz = sets.select(
        "doc_id", F.size("toks").cast("bigint").alias("sz")
    )
    pref = (
        ranked.join(sz, "doc_id")
        # prefix_len = sz - ceil(0.6*sz) + 1 = sz - (3*sz+4) div 5 + 1
        .filter(
            F.col("rn")
            <= F.col("sz") - F.expr("(3 * sz + 4) div 5") + 1
        )
        .select("doc_id", "token")
    )
    cand = (
        pref.alias("pa")
        .join(
            pref.alias("pb"),
            (F.col("pa.token") == F.col("pb.token"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id")),
        )
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    inter = F.size(F.array_intersect("ta", "tb")).cast("bigint")
    union = (
        F.size("ta").cast("bigint") + F.size("tb").cast("bigint") - inter
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("n_inter"),
            union.alias("n_union"),
        )
        .filter(F.col("n_inter") * 5 >= 3 * F.col("n_union"))
    )


# ===========================================================================
# Model-evaluation and distribution-audit family (round 5, session 7).
# Every statistic below is reduced to integer witnesses first; the only
# doubles emitted are final ratios computed from those identical
# integers in both engines, rounded to 6 dp.
# ===========================================================================


@query(
    "score_auc",
    """
    WITH s AS (
      SELECT n_chars AS score,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS n_neg
      FROM documents GROUP BY n_chars
    ),
    c AS (
      SELECT n_pos, n_neg,
             CAST(coalesce(sum(n_neg) OVER (
               ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS neg_below
      FROM s
    )
    SELECT CAST(sum(n_pos) AS BIGINT) AS n_pos,
           CAST(sum(n_neg) AS BIGINT) AS n_neg,
           CAST(sum(2 * n_pos * neg_below + n_pos * n_neg) AS BIGINT)
             AS auc_num2,
           round(sum(2 * n_pos * neg_below + n_pos * n_neg)
                 / (2.0 * sum(n_pos) * sum(n_neg)), 6) AS auc
    FROM c
    """,
)
def score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based AUC (Mann-Whitney U) of a score column predicting a
    binary label — here n_chars predicting lang='en' — WITHOUT the
    all-pairs join: group rows by score value, then one ordered window
    gives, per distinct score, how many negatives rank strictly below.
    2*AUC*P*N = 2*sum(pos_s * neg_below_s) + sum(pos_s * neg_s) (ties
    count half), all integers, so both engines agree bit-for-bit and
    the single emitted double is one division of identical integers.

    Scale shape: the window sorts DISTINCT score values (bounded by
    value cardinality, not row count); everything before it is one
    map-side-combinable agg. The classic sklearn formulation sorts all
    rows; this sorts the value histogram."""
    docs = load(spark, sf_dir, "documents")
    s = docs.groupBy(F.col("n_chars").alias("score")).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("bigint")
        .alias("n_neg"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = s.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0))
        .cast("bigint")
        .alias("neg_below"),
    )
    num2 = F.sum(
        2 * F.col("n_pos") * F.col("neg_below")
        + F.col("n_pos") * F.col("n_neg")
    )
    return c.agg(
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("n_neg").cast("bigint").alias("n_neg"),
        num2.cast("bigint").alias("auc_num2"),
        F.round(
            num2 / (2.0 * F.sum("n_pos") * F.sum("n_neg")), 6
        ).alias("auc"),
    )


@query(
    "calibration_bins",
    """
    SELECT CAST((n_chars % 1000) // 100 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(sum(n_chars % 1000) AS BIGINT) AS sum_score_milli,
           round(sum(n_chars % 1000) / (1000.0 * count(*)), 6)
             AS mean_score,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS pos_rate
    FROM documents GROUP BY 1
    """,
)
def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: a [0,1) pseudo-probability (here
    (n_chars mod 1000)/1000 — deterministic, engine-portable) bucketed
    into 10 equal bins; per bin the mean predicted score vs the
    observed positive rate. A calibrated model's bins sit on the
    diagonal. Integer witnesses (n, n_pos, sum of milli-scores) carry
    the exactness; the two doubles are divisions of those integers.

    Scale shape: one map-side-combinable groupBy on a 10-value key —
    no window, no join, partial aggregation does all the work."""
    docs = load(spark, sf_dir, "documents")
    milli = F.col("n_chars") % 1000
    pos = F.when(F.col("lang") == "en", 1).otherwise(0)
    return (
        docs.groupBy(F.expr("(n_chars % 1000) div 100").cast("bigint").alias("bin"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(pos).cast("bigint").alias("n_pos"),
            F.sum(milli).cast("bigint").alias("sum_score_milli"),
            F.round(F.sum(milli) / (1000.0 * F.count("*")), 6).alias(
                "mean_score"
            ),
            F.round(
                F.sum(pos) / F.count("*").cast("double"), 6
            ).alias("pos_rate"),
        )
    )


@query(
    "feature_psi",
    """
    WITH b AS (
      SELECT least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
             CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b
      FROM events GROUP BY 1
    ),
    t AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM b)
    SELECT bin, n_a, n_b,
           round(((n_a + 1.0) / (ta + 10.0) - (n_b + 1.0) / (tb + 10.0))
                 * ln(((n_a + 1.0) / (ta + 10.0))
                      / ((n_b + 1.0) / (tb + 10.0))), 6) AS psi_term
    FROM b, t
    """,
)
def feature_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index terms between two event populations
    (even vs odd event_id — the champion/challenger split) over 10
    fixed-width value bins with +1 Laplace smoothing: psi_term =
    (p−q)·ln(p/q) per bin; the PSI is their sum (>0.2 = drifted).
    Distinct from term_drift_chi2: PSI is the industry drift score for
    NUMERIC feature distributions; chi² tests token categoricals.

    Integer bin counts are exact in both engines; p and q are built
    from those integers by identical double arithmetic, so the 6 dp
    round agrees. One groupBy on a 10-value key + a broadcast of the
    two totals — partial agg does all the work at 100 TB."""
    ev = load(spark, sf_dir, "events")
    b = ev.groupBy(
        F.least(F.floor(F.col("value") / 50).cast("bigint"), F.lit(9).cast("bigint")).alias("bin")
    ).agg(
        F.sum(F.when(F.col("event_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("event_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    t = b.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    p = (F.col("n_a") + 1.0) / (F.col("ta") + 10.0)
    q = (F.col("n_b") + 1.0) / (F.col("tb") + 10.0)
    return b.crossJoin(F.broadcast(t)).select(
        "bin",
        "n_a",
        "n_b",
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


@query(
    "kmv_distinct",
    """
    WITH h AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events
    ),
    bottom AS (SELECT hv FROM h ORDER BY hv LIMIT 8),
    k AS (SELECT CAST(count(*) AS BIGINT) AS k_actual,
                 CAST(max(hv) AS BIGINT) AS h_k
          FROM bottom)
    SELECT k_actual, h_k,
           round((k_actual - 1) * (1152921504606846976.0 / h_k), 3)
             AS est_distinct,
           (SELECT CAST(count(*) AS BIGINT) FROM h) AS exact_distinct
    FROM k
    """,
)
def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / k-minimum-values) distinct-count sketch over
    event users: keep the k=8 smallest DISTINCT 60-bit md5 hashes; the
    kth smallest estimates density, D ≈ (k−1)·2^60/h_k. The third
    sketch family next to HLL (hll_distinct_users) and the count-min
    (count_min_sketch): KMV is the one whose bottom-k set also
    supports set-EXPRESSION estimates (union=merge bottom-k,
    intersection via Jaccard on the sketches).

    h_k and k_actual are exact integers in both engines (md5 is
    standardized); the estimate is one identical double expression of
    them. Scale shape: distinct-hash then a k-row ORDER BY LIMIT —
    Spark's TakeOrderedAndProject, a per-partition top-k merged on the
    driver, never a full sort. The exact_distinct witness is the
    audit column a production sketch would drop."""
    ev = load(spark, sf_dir, "events")
    h = ev.select(
        md5_long(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    bottom = h.orderBy("hv").limit(8)
    k = bottom.agg(
        F.count("*").cast("bigint").alias("k_actual"),
        F.max("hv").cast("bigint").alias("h_k"),
    )
    exact = h.agg(F.count("*").cast("bigint").alias("exact_distinct"))
    return k.crossJoin(F.broadcast(exact)).select(
        "k_actual",
        "h_k",
        F.round(
            (F.col("k_actual") - 1)
            * (F.lit(1152921504606846976.0) / F.col("h_k")),
            3,
        ).alias("est_distinct"),
        "exact_distinct",
    )


@query(
    "changepoint_cusum",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    c AS (
      SELECT day, n,
             CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(count(*) OVER () AS BIGINT) AS nd,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM d
    )
    SELECT day, n, cum,
           CAST(abs(nd * cum - t * total) AS BIGINT) AS d_stat
    FROM c
    """,
)
def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint localisation over the daily error-count series via
    the centered cumulative sum: D_t = |N·C_t − t·T| peaks at the day
    the rate shifts (the integer-scaled CUSUM statistic — the max-D_t
    day is the estimated changepoint, and D's shape distinguishes a
    step from a trend). Pure integers end-to-end: N·C_t and t·T are
    products of counts, so no float enters the statistic at all —
    unlike the textbook mean-centered CUSUM this needs no division.

    Scale shape: events collapse to one row per day first (partial
    agg); the windows then order ~days rows, not events."""
    ev = load(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(
            (ntz_epoch_ms(F.col("ts")) / F.lit(86400000))
            .cast("bigint")
            .alias("day")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wo = Window.orderBy("day")
    wall = Window.partitionBy()
    c = d.select(
        "day",
        "n",
        F.sum("n").over(wo).cast("bigint").alias("cum"),
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.count("*").over(wall).cast("bigint").alias("nd"),
        F.sum("n").over(wall).cast("bigint").alias("total"),
    )
    return c.select(
        "day",
        "n",
        "cum",
        F.abs(
            F.col("nd") * F.col("cum") - F.col("t") * F.col("total")
        )
        .cast("bigint")
        .alias("d_stat"),
    )


@query(
    "revenue_gini",
    """
    WITH r AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT rev,
             CAST(row_number() OVER (ORDER BY rev, o_custkey)
                  AS BIGINT) AS rn
      FROM r
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(rev) AS BIGINT) AS total_cents,
           CAST(sum(rn * rev) AS BIGINT) AS rank_weighted_cents,
           round((2.0 * sum(rn * rev) - (count(*) + 1.0) * sum(rev))
                 / (CAST(count(*) AS DOUBLE) * sum(rev)), 6) AS gini
    FROM rk
    """,
)
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the
    single-number companion to events_pareto_share's decile curve.
    Money goes to integer cents first; the closed form
    G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) over ascending-sorted revenue
    needs only the rank-weighted integer sum. Ties: ranks come from
    row_number over (rev, custkey), and Σ i·x_i over a tied group is
    x·Σi — invariant to intra-tie order, so both engines agree even
    though their sorts differ.

    Scale shape: orders collapse to one row per customer (partial
    agg), the window sorts customers not orders, then one global agg."""
    orders = load(spark, sf_dir, "orders")
    r = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    rk = r.select(
        "rev",
        F.row_number()
        .over(Window.orderBy("rev", "o_custkey"))
        .cast("bigint")
        .alias("rn"),
    )
    n = F.count("*")
    s = F.sum("rev")
    w = F.sum(F.col("rn") * F.col("rev"))
    return rk.agg(
        n.cast("bigint").alias("n_customers"),
        s.cast("bigint").alias("total_cents"),
        w.cast("bigint").alias("rank_weighted_cents"),
        F.round(
            (2.0 * w - (n + F.lit(1.0)) * s) / (n.cast("double") * s), 6
        ).alias("gini"),
    )


@query(
    "events_interarrival",
    """
    WITH d AS (
      SELECT epoch_ms(ts)
             - lag(epoch_ms(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
               ) AS delta_ms
      FROM events
    )
    SELECT CAST(length(bin(delta_ms)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(delta_ms) AS BIGINT) AS sum_delta_ms,
           CAST(min(delta_ms) AS BIGINT) AS min_delta_ms,
           CAST(max(delta_ms) AS BIGINT) AS max_delta_ms
    FROM d WHERE delta_ms IS NOT NULL AND delta_ms > 0
    GROUP BY 1
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-time distribution on a log2 grid: lag()
    inside each user's (ts, event_id)-ordered stream gives the gap in
    ms; the bucket is the bit-length of the integer gap
    (length(bin(x)) = floor(log2 x)+1 — integer-exact in both engines,
    no float log). The histogram shape separates bot-like constant
    cadence from human heavy-tailed cadence and sizes sessionization
    timeouts empirically (events_sessionization hardcodes 1800 s; this
    shows where the real gap mass sits).

    Scale shape: one user-partitioned window (the same shuffle key
    sessionization uses), then a map-side-combinable rollup onto ~40
    buckets. The (ts, event_id) total order inside the window is the
    repo-wide discipline for cross-engine lag parity."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ems = ntz_epoch_ms(F.col("ts"))
    d = ev.select((ems - F.lag(ems).over(w)).alias("delta_ms"))
    return (
        d.filter(F.col("delta_ms").isNotNull() & (F.col("delta_ms") > 0))
        .groupBy(
            F.length(F.bin(F.col("delta_ms")))
            .cast("bigint")
            .alias("log2_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("delta_ms").cast("bigint").alias("sum_delta_ms"),
            F.min("delta_ms").cast("bigint").alias("min_delta_ms"),
            F.max("delta_ms").cast("bigint").alias("max_delta_ms"),
        )
    )


@query(
    "source_entropy",
    """
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(n) AS BIGINT) AS total_docs,
           round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6)
             AS entropy_nats,
           CAST((max(n) * 1000000) // sum(n) AS BIGINT)
             AS max_share_ppm
    FROM c
    """,
)
def source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of the corpus source distribution via
    the aggregation-friendly identity H = ln T − Σ n·ln n / T — one
    pass over per-source counts, no per-row p_i materialisation. The
    diversity dial a training-data mix is tuned by (entropy falling
    round-over-round = one source is eating the crawl); max_share_ppm
    is the integer witness of the dominant source's share.

    Integer counts are exact; ln over identical integers rounds
    identically at 6 dp. Scale: one partial-agg groupBy + one
    single-row rollup."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n")
    )
    t = F.sum("n")
    return c.agg(
        F.count("*").cast("bigint").alias("n_sources"),
        t.cast("bigint").alias("total_docs"),
        F.round(
            F.log(t) - F.sum(F.col("n") * F.log("n")) / t, 6
        ).alias("entropy_nats"),
        F.expr("(max(n) * 1000000) div sum(n)")
        .cast("bigint")
        .alias("max_share_ppm"),
    )


@query(
    "zipf_slope",
    """
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    f AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok
      WHERE term <> '' GROUP BY term
    ),
    top AS (
      SELECT c,
             CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT)
               AS rk
      FROM f ORDER BY c DESC, term LIMIT 100
    ),
    xy AS (
      SELECT ln(rk) AS x, ln(c) AS y FROM top
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x)), 6)
             AS zipf_slope,
           round((sum(y) - ((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * sum(x * x) - sum(x) * sum(x))) * sum(x))
                 / count(*), 6) AS intercept
    FROM xy
    """,
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS slope of ln(freq) on ln(rank)
    over the top-100 terms. Natural text sits near −1; generated or
    template-heavy corpora flatten — a one-number corpus-health check
    next to vocab_coverage's curve. Rank ties break by term so both
    engines pick the identical top-100 set; x/y are ln of identical
    integers and the OLS closed form is the same double expression
    tree on both sides.

    Scale shape: the term count is a partial-agg groupBy; the top-100
    is TakeOrderedAndProject (per-partition heap, driver merge of
    k=100), never a global sort of the vocabulary."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(words(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    f = tok.groupBy("term").agg(F.count("*").cast("bigint").alias("c"))
    top = (
        f.orderBy(F.col("c").desc(), "term")
        .limit(100)
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), "term"))
            .cast("bigint")
            .alias("rk"),
        )
    )
    xy = top.select(F.log("rk").alias("x"), F.log("c").alias("y"))
    nn = F.count("*")
    slope = (nn * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")) / (
        nn * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")
    )
    return xy.agg(
        nn.cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.sum("y") - slope * F.sum("x")) / nn, 6).alias(
            "intercept"
        ),
    )


@query(
    "opic_priority",
    """
    WITH """ + _LINKGRAPH_SQL_CTES + """,
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY v
    ),
    give AS (
      SELECT s.w AS node, CAST(1000000 // d.d AS BIGINT) AS cash
      FROM sym s JOIN deg d ON s.v = d.v
    )
    SELECT node, CAST(sum(cash) AS BIGINT) AS opic_cash,
           CAST(count(*) AS BIGINT) AS n_contributors
    FROM give GROUP BY node
    ORDER BY opic_cash DESC, node LIMIT 20
    """,
)
def opic_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One OPIC cash-distribution step (Abiteboul's On-line Page
    Importance Computation — the frontier-prioritisation scheme real
    crawlers use INSTEAD of full PageRank, because it needs no global
    iteration): every node starts with 10^6 micro-cash and pays
    floor(10^6/outdeg) to each out-neighbour; a node's received cash
    is its fetch priority. Integer floor-division end-to-end — no
    damping float, so both engines agree bit-for-bit. Companion to
    personalized_pagerank: OPIC is what the crawl loop would actually
    consult per round.

    Scale shape: one degree agg + one join on the edge list + one
    groupBy — all partial-aggregable; top-20 is a driver-merged heap."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    deg = sym.groupBy("v").agg(F.count("*").cast("bigint").alias("d"))
    give = sym.join(deg, "v").select(
        F.col("w").alias("node"),
        F.expr("1000000 div d").cast("bigint").alias("cash"),
    )
    return (
        give.groupBy("node")
        .agg(
            F.sum("cash").cast("bigint").alias("opic_cash"),
            F.count("*").cast("bigint").alias("n_contributors"),
        )
        .orderBy(F.col("opic_cash").desc(), "node")
        .limit(20)
    )


@query(
    "two_hop_reach",
    """
    WITH """ + _LINKGRAPH_SQL_CTES + """,
    seeds AS (SELECT v FROM sym WHERE v % 97 = 0 GROUP BY v),
    one AS (
      SELECT s.v AS seed, y.w AS nb
      FROM seeds s JOIN sym y ON y.v = s.v GROUP BY s.v, y.w
    ),
    two AS (
      SELECT o.seed, y.w AS nb2
      FROM one o JOIN sym y ON y.v = o.nb GROUP BY o.seed, y.w
    ),
    reach AS (
      SELECT seed, nb AS node FROM one
      UNION
      SELECT seed, nb2 FROM two
    )
    SELECT r.seed,
           CAST((SELECT count(*) FROM one o WHERE o.seed = r.seed)
                AS BIGINT) AS n_1hop,
           CAST(sum(CASE WHEN r.node <> r.seed THEN 1 ELSE 0 END)
                AS BIGINT) AS n_2hop
    FROM reach r GROUP BY r.seed
    """,
)
def two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop neighbourhood size per seed node (every 97th node):
    |N(v)| and |N(N(v)) ∪ N(v) \\ {v}| — the friend-of-friend reach
    that upper-bounds how fast a BFS frontier explodes from a seed
    (the 2-hop count is the round-2 frontier the crawl's depth gate
    would admit) and flags supernode hubs before they skew a shuffle.
    Distinct from graph_bfs_levels: this measures the SIZE profile of
    every seed simultaneously via set algebra, not level assignment.

    Scale shape: two self-joins on the symmetric edge list, each
    followed by distinct-style group-bys that partial-aggregate; no
    iteration, no driver loop. Exact integers only."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    seeds = sym.filter(F.col("v") % 97 == 0).select("v").distinct()
    one = (
        seeds.alias("s")
        .join(sym.alias("y"), F.col("y.v") == F.col("s.v"))
        .select(F.col("s.v").alias("seed"), F.col("y.w").alias("nb"))
        .distinct()
    )
    two = (
        one.alias("o")
        .join(sym.alias("y"), F.col("y.v") == F.col("o.nb"))
        .select(F.col("o.seed").alias("seed"), F.col("y.w").alias("nb2"))
        .distinct()
    )
    reach = one.select("seed", F.col("nb").alias("node")).union(
        two.select("seed", F.col("nb2").alias("node"))
    ).distinct()
    n1 = one.groupBy("seed").agg(
        F.count("*").cast("bigint").alias("n_1hop")
    )
    return (
        reach.groupBy("seed")
        .agg(
            F.sum(F.when(F.col("node") != F.col("seed"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_2hop")
        )
        .join(n1, "seed")
        .select("seed", "n_1hop", "n_2hop")
    )


@query(
    "embedding_dim_stats",
    """
    WITH e AS (
      SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, generate_series(1, 64) t(i)
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(v), 4) AS mean_v,
           round(avg(v * v), 4) AS mean_sq,
           round(min(v), 4) AS min_v,
           round(max(v), 4) AS max_v
    FROM e GROUP BY 1
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moment profile of the embedding matrix — the
    whitening / dead-dimension audit an ANN index build runs first
    (a dimension with ~zero variance wastes IVF centroids; a huge-mean
    dimension dominates unnormalised L2). posexplode flattens the
    array column JVM-side; DuckDB's twin indexes the list against a
    generate_series. min/max are order-independent floats (exact);
    mean and mean-square are sums of ~N doubles rounded to 4 dp,
    inside the repo's cross-engine float discipline.

    Scale shape: explode → 64-key partial-aggregable groupBy; at 100
    TB this is the canonical map-side-combine shape (64 cells per
    task regardless of row count)."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        F.posexplode(F.col("embedding")).alias("dim", "v0")
    ).select("dim", F.col("v0").cast("double").alias("v"))
    return e.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("v"), 4).alias("mean_v"),
        F.round(F.avg(F.col("v") * F.col("v")), 4).alias("mean_sq"),
        F.round(F.min("v"), 4).alias("min_v"),
        F.round(F.max("v"), 4).alias("max_v"),
    )


# ===========================================================================
# Hybrid retrieval + sampling + audit family (round 5, session 7).
# ===========================================================================


def _rrf_sql() -> str:
    """Oracle: BM25 top-10 (the bm25_search pipeline, projected to its
    rank via ``_bm25_sql("rn")``) fused with the cosine top-10 to vec
    0's embedding by reciprocal-rank fusion, joined on
    doc_id == vec_id."""
    lex = _bm25_sql("rn")
    return f"""
    WITH lex AS ({lex}),
    qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    sem AS (
      SELECT vec_id AS doc_id, rn FROM (
        SELECT e.vec_id,
               row_number() OVER (
                 ORDER BY round(list_cosine_similarity(q.qe, e.embedding), 4)
                          DESC, e.vec_id
               ) AS rn
        FROM embeddings e CROSS JOIN qv q
        WHERE e.vec_id <> 0
      ) WHERE rn <= 10
    )
    SELECT doc_id,
           CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(sem_rank AS BIGINT) AS sem_rank,
           round(rrf, 6) AS rrf
    FROM (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             l.rn AS lex_rank, s.rn AS sem_rank,
             coalesce(1.0 / (60 + l.rn), 0)
             + coalesce(1.0 / (60 + s.rn), 0) AS rrf
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
    )
    ORDER BY rrf DESC, doc_id LIMIT 10
    """


@query("hybrid_search_rrf", _rrf_sql())
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009,
    the standard lexical+vector fusion in production search) of the
    BM25 top-10 (bm25_search's exact pipeline) and the cosine top-10
    to a fixed query vector, joined on the shared id space —
    score = Σ 1/(60+rank). Rank lists are integers (both arms break
    ties by id on a 4 dp-rounded score, the repo's float-order
    discipline), so the fused score is the same two-term double sum in
    both engines.

    Scale shape: each arm is already bounded (TakeOrderedAndProject
    top-10); the fusion is a full outer join of two 10-row frames —
    driver-trivial regardless of corpus size."""
    emb = load(spark, sf_dir, "embeddings")

    lex = (
        bm25_search(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), "doc_id"))
            .cast("bigint")
            .alias("lex_rank"),
        )
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe")
    )
    sem = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(10)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), "doc_id"))
            .cast("bigint")
            .alias("sem_rank"),
        )
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf0"),
    )
    return (
        fused.orderBy(F.desc("rrf0"), "doc_id")
        .limit(10)
        .select(
            "doc_id", "lex_rank", "sem_rank",
            F.round("rrf0", 6).alias("rrf"),
        )
    )


@query(
    "weighted_sample_es",
    """
    WITH k AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % 1000000 + 1) / 1000001.0)
             / n_chars AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, w, round(es_key, 9) AS es_key
    FROM k ORDER BY es_key DESC, doc_id LIMIT 20
    """,
)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement by the Efraimidis-
    Spirakis one-pass reservoir (2006): each row draws u∈(0,1) and
    keeps key u^(1/w); the top-k keys ARE a w-proportional sample —
    the way a training-data pipeline samples documents by length/
    quality weight in one scan, no prefix-sum pass. Ordering by
    ln(u)/w is monotone-equivalent and better-conditioned; u comes
    from the repo's md5 discipline so the 'randomness' is reproducible
    and both engines compute the identical double from identical
    integers.

    Scale shape: one scan + TakeOrderedAndProject top-k (per-partition
    heap, driver merge of k rows) — the canonical distributed
    reservoir."""
    docs = load(spark, sf_dir, "documents")
    u = (md5_long(F.col("doc_id").cast("string")) % 1000000 + 1) / F.lit(
        1000001.0
    )
    k = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("w"),
        (F.log(u) / F.col("n_chars")).alias("es_key0"),
    )
    return (
        # rank on the ROUNDED key (the repo's round-before-rank float
        # discipline): DuckDB's ORDER BY binds the select alias — the
        # 9-dp round — so Spark must rank on the same value or a
        # boundary tie at the top-20 cut could pick different rows
        k.orderBy(F.desc(F.round("es_key0", 9)), "doc_id")
        .limit(20)
        .select("doc_id", "w", F.round("es_key0", 9).alias("es_key"))
    )


@query(
    "benford_audit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(count(*)) OVER () AS BIGINT) AS total
      FROM d GROUP BY digit
    )
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford,
           round((CAST(n AS DOUBLE) / total
                  - ln(1.0 + 1.0 / digit) / ln(10.0))
                 * (CAST(n AS DOUBLE) / total
                    - ln(1.0 + 1.0 / digit) / ln(10.0))
                 * total / (ln(1.0 + 1.0 / digit) / ln(10.0)), 6)
             AS chi2_term
    FROM c
    """,
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order amounts: leading-digit frequencies
    vs log10(1+1/d), with per-digit chi² contributions (Σ chi2_term
    against chi²₈ flags fabricated or capped amounts — the classic
    forensic data-quality check). The leading digit comes from the
    CENTS integer's decimal string, so binning is exact in both
    engines; observed/expected/chi² are identical double expressions
    of the integer counts.

    Scale shape: one map-side-combinable groupBy onto 9 cells; the
    window for the total runs over 9 rows."""
    orders = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    d = orders.filter(F.col("o_totalprice") > 0).select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    c = c.select(
        "digit",
        "n",
        F.sum("n").over(Window.partitionBy()).cast("bigint").alias("total"),
    )
    obs = F.col("n").cast("double") / F.col("total")
    exp_p = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return c.select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed"),
        F.round(exp_p, 6).alias("benford"),
        F.round((obs - exp_p) * (obs - exp_p) * F.col("total") / exp_p, 6)
        .alias("chi2_term"),
    )


@query(
    "event_type_pmi",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM events),
    cx AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM ut GROUP BY 1
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ca.c AS n_a, cb.c AS n_b,
           round(ln(CAST(n.nu AS DOUBLE) * p.n_both / (ca.c * cb.c)), 6)
             AS pmi
    FROM pairs p
    JOIN cx ca ON ca.event_type = p.type_a
    JOIN cx cb ON cb.event_type = p.type_b
    CROSS JOIN n
    """,
)
def event_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types at user
    granularity: PMI = ln(N·c_xy / (c_x·c_y)) over users-having-type
    sets — positive = the types co-occur in the same users more than
    independence predicts (the feature-co-occurrence signal behind
    market_basket_lift, but information-theoretic and symmetric-set
    based rather than order-basket based). All counts are exact
    integers; the single double is one ln of their ratio.

    Scale shape: distinct (user, type) collapses events first (the
    frame is bounded by users × type-cardinality); the pair self-join
    keys on user_id — at 100 TB the per-user type set is tiny, so this
    is a skew-free shuffle, and the type marginals broadcast."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("nu")
    )
    cx = ut.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("c")
    )
    pairs = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    ca = cx.select(
        F.col("event_type").alias("type_a"), F.col("c").alias("n_a")
    )
    cb = cx.select(
        F.col("event_type").alias("type_b"), F.col("c").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.log(
                    F.col("nu").cast("double")
                    * F.col("n_both")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@query(
    "degree_assortativity",
    """
    WITH """ + _LINKGRAPH_SQL_CTES + """,
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY v
    ),
    xy AS (
      SELECT da.d AS x, db.d AS y
      FROM sym s JOIN deg da ON da.v = s.v JOIN deg db ON db.v = s.w
    )
    SELECT CAST(count(*) AS BIGINT) AS n_dir_edges,
           CAST(sum(x) AS BIGINT) AS sum_x,
           CAST(sum(x * y) AS BIGINT) AS sum_xy,
           CAST(sum(x * x) AS BIGINT) AS sum_xx,
           round((count(*) * sum(x * y) - sum(x) * sum(y))
                 / (count(*) * CAST(sum(x * x) AS DOUBLE)
                    - CAST(sum(x) AS DOUBLE) * sum(x)), 6)
             AS assortativity
    FROM xy
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all directed edge slots — positive = hubs
    link to hubs (social nets), negative = hubs link to leaves (the
    web, and what a link farm distorts; companion diagnostic to
    kcore_linkfarm). Over the symmetric edge list x/y marginals are
    equal, so r reduces to integer sums Σx, Σxy, Σx² and one double
    division — exact witnesses, no float accumulation.

    Scale shape: degree agg + two broadcast-joinable lookups on the
    edge list + one global sum — every stage partial-aggregates; at
    100 TB the degree table is the only shuffle."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    deg = sym.groupBy("v").agg(F.count("*").cast("bigint").alias("d"))
    da = deg.select(F.col("v"), F.col("d").alias("x"))
    db = deg.select(F.col("v").alias("w"), F.col("d").alias("y"))
    xy = sym.join(da, "v").join(db, "w").select("x", "y")
    nn = F.count("*")
    sx = F.sum("x")
    sy = F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    return xy.agg(
        nn.cast("bigint").alias("n_dir_edges"),
        sx.cast("bigint").alias("sum_x"),
        sxy.cast("bigint").alias("sum_xy"),
        sxx.cast("bigint").alias("sum_xx"),
        F.round(
            (nn * sxy - sx * sy)
            / (nn * sxx.cast("double") - sx.cast("double") * sx),
            6,
        ).alias("assortativity"),
    )


@query(
    "ship_latency_histogram",
    """
    SELECT CAST(floor(datediff('day', o.o_orderdate, l.l_shipdate) / 7)
                AS BIGINT) AS week_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(datediff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS sum_days,
           CAST(min(datediff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS min_days,
           CAST(max(datediff('day', o.o_orderdate, l.l_shipdate))
                AS BIGINT) AS max_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution on a weekly grid — the SLA
    shape behind order_priority_sla's breach count. floor() (not
    truncate-toward-zero) buckets negative latencies consistently in
    both engines (Spark's int div truncates, DuckDB's // floors — the
    repo's signed-bucket discipline is to floor a double division
    explicitly). Day deltas are exact integers; every emitted column
    is an integer.

    Scale shape: the fact-to-fact join keys on l_orderkey (AQE picks
    the strategy; orders is the smaller side) and the rollup
    partial-aggregates onto ~hundreds of week cells."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.floor(days / 7).cast("bigint").alias("week_bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(days).cast("bigint").alias("sum_days"),
            F.min(days).cast("bigint").alias("min_days"),
            F.max(days).cast("bigint").alias("max_days"),
        )
    )


@query(
    "sprt_sequential",
    """
    WITH s AS (
      SELECT t, k,
             k * ln(5.0 / 3.0) + (t - k) * ln(15.0 / 17.0) AS llr
      FROM (
        SELECT row_number() OVER (ORDER BY ts, event_id) AS t,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 OVER (ORDER BY ts, event_id) AS k
        FROM events
      )
    ),
    c AS (
      SELECT *, 1 AS pr FROM s
      WHERE llr >= ln(19.0) OR llr <= -ln(19.0)
      ORDER BY t LIMIT 1
    ),
    f AS (SELECT *, 0 AS pr FROM s ORDER BY t DESC LIMIT 1)
    SELECT CASE WHEN llr >= ln(19.0) THEN 'accept_h1'
                WHEN llr <= -ln(19.0) THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           CAST(t AS BIGINT) AS n_obs,
           CAST(k AS BIGINT) AS n_success,
           round(llr, 6) AS llr
    FROM (SELECT * FROM c UNION ALL SELECT * FROM f)
    ORDER BY pr DESC LIMIT 1
    """,
)
def sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability-ratio test over the event stream:
    H0 p=0.15 vs H1 p=0.25 purchase rate, α=β=0.05 — stop at the FIRST
    observation where the log-likelihood ratio crosses ±ln(19). The
    sequential answer an experimentation platform gives INSTEAD of the
    fixed-horizon z-test (ab_test_zprop): same decision quality at a
    fraction of the sample. LLR_t = k·ln(p1/p0) + (t−k)·ln(q1/q0) is a
    function of two exact integer cumsums in the repo's (ts, event_id)
    total order, so the crossing index is identical in both engines.

    Scale shape: ONE global ordered window (inherently sequential —
    that's the statistic, not the implementation's fault); production
    would shard by experiment key. The crossing pick is two bounded
    limit-1 scans."""
    ev = load(spark, sf_dir, "events")
    wo = Window.orderBy("ts", "event_id")
    s = ev.select(
        F.row_number().over(wo).alias("t"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(wo)
        .alias("k"),
    ).select(
        "t",
        "k",
        (
            F.col("k") * F.log(F.lit(5.0) / 3.0)
            + (F.col("t") - F.col("k")) * F.log(F.lit(15.0) / 17.0)
        ).alias("llr"),
    )
    bound = F.log(F.lit(19.0))
    crossed = (F.col("llr") >= bound) | (F.col("llr") <= -bound)
    # ONE TakeOrdered pass over the windowed frame (the global sort is
    # the query's heaviest stage — filtering and re-sorting it twice
    # would execute that window twice): crossed rows sort first by
    # ascending t (the FIRST crossing); if none crossed, -t ascending
    # puts the LAST observation on top.
    return (
        s.orderBy(
            F.desc(crossed),
            F.when(crossed, F.col("t")).otherwise(-F.col("t")),
        )
        .limit(1)
        .select(
            F.when(F.col("llr") >= bound, "accept_h1")
            .when(F.col("llr") <= -bound, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
            F.col("t").cast("bigint").alias("n_obs"),
            F.col("k").cast("bigint").alias("n_success"),
            F.round("llr", 6).alias("llr"),
        )
    )


@query(
    "info_gain_lang_source",
    """
    WITH sl AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    parts AS (
      SELECT sum(n * ln(n)) AS e_sl,
             sum(n) AS nn FROM sl
    ),
    es AS (
      SELECT sum(n * ln(n)) AS e_s
      FROM (SELECT source, sum(n) AS n FROM sl GROUP BY source)
    ),
    el AS (
      SELECT sum(n * ln(n)) AS e_l
      FROM (SELECT lang, sum(n) AS n FROM sl GROUP BY lang)
    )
    SELECT CAST(nn AS BIGINT) AS n_docs,
           round((e_sl - e_s - e_l + nn * ln(nn)) / nn, 6) AS mi_nats,
           round((e_sl - e_s - e_l + nn * ln(nn))
                 / (nn * ln(nn) - e_l), 6) AS ig_ratio
    FROM parts, es, el
    """,
)
def info_gain_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between corpus source and language —
    information gain of the source feature for predicting lang, via
    the count identity MI = [Σn_sl·ln n_sl − Σn_s·ln n_s − Σn_l·ln n_l
    + N·ln N]/N (one pass over the contingency counts, no per-cell
    probabilities). ig_ratio normalizes by H(lang) (the uncertainty
    coefficient): 1 = source determines language, 0 = independent —
    the feature-selection score a training-mix curator reads next to
    source_entropy.

    Scale shape: one (source, lang) groupBy partial-aggregates the
    corpus; the three entropy sums run over that tiny contingency
    frame, then one-row frames broadcast-combine."""
    docs = load(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n")
    )
    parts = sl.agg(
        F.sum(F.col("n") * F.log("n")).alias("e_sl"),
        F.sum("n").alias("nn"),
    )
    es = (
        sl.groupBy("source")
        .agg(F.sum("n").alias("n"))
        .agg(F.sum(F.col("n") * F.log("n")).alias("e_s"))
    )
    el = (
        sl.groupBy("lang")
        .agg(F.sum("n").alias("n"))
        .agg(F.sum(F.col("n") * F.log("n")).alias("e_l"))
    )
    mi_num = (
        F.col("e_sl") - F.col("e_s") - F.col("e_l")
        + F.col("nn") * F.log("nn")
    )
    return (
        parts.crossJoin(F.broadcast(es))
        .crossJoin(F.broadcast(el))
        .select(
            F.col("nn").cast("bigint").alias("n_docs"),
            F.round(mi_num / F.col("nn"), 6).alias("mi_nats"),
            F.round(
                mi_num / (F.col("nn") * F.log("nn") - F.col("e_l")), 6
            ).alias("ig_ratio"),
        )
    )


@query(
    "host_mirror_detection",
    """
    WITH fp AS (
      SELECT DISTINCT source,
             CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 256
               AS fingerprint
      FROM documents
    ),
    sz AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM fp GROUP BY source
    ),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM fp a JOIN fp b
        ON a.fingerprint = b.fingerprint AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b, s.n_shared,
           za.n AS n_a, zb.n AS n_b,
           CAST((s.n_shared * 1000000)
                // (za.n + zb.n - s.n_shared) AS BIGINT) AS jaccard_ppm
    FROM shared s
    JOIN sz za ON za.source = s.source_a
    JOIN sz zb ON zb.source = s.source_b
    WHERE s.n_shared * 5 >= za.n
    """,
)
def host_mirror_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection: hosts (sources) whose content-fingerprint
    SETS overlap heavily are mirrors/scraped copies — the host-level
    dedup a crawler runs so it stops fetching the same site twice.
    Fingerprint here = md5(text) folded to 256 buckets (the pluggable
    slot where production uses text_fingerprint's simhash); overlap =
    bucket-set intersection via one fingerprint-keyed self-join, flag
    at intersection ≥ 20% of |A| (cross-multiplied integers), Jaccard
    shipped as exact ppm.

    Scale shape: per-host fingerprint sets collapse through DISTINCT
    (map-side), the join keys on fingerprint (collision lists, never
    host pairs all-pairs), and host sizes broadcast back — the same
    candidate-bounding shape as dedup_prefix_filter, lifted from
    documents to hosts."""
    docs = load(spark, sf_dir, "documents")
    fp = docs.select(
        "source", (md5_long(F.col("text")) % 256).alias("fingerprint")
    ).distinct()
    sz = fp.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    shared = (
        fp.alias("a")
        .join(
            fp.alias("b"),
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    za = sz.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    zb = sz.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(za), "source_a")
        .join(F.broadcast(zb), "source_b")
        .filter(F.col("n_shared") * 5 >= F.col("n_a"))
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("(n_shared * 1000000) div (n_a + n_b - n_shared)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


@query(
    "time_to_convert",
    """
    WITH v AS (
      SELECT user_id, min(epoch_ms(ts)) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, min(epoch_ms(ts)) AS first_purchase
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    d AS (
      SELECT p.first_purchase - v.first_view AS delta_ms
      FROM v JOIN p ON v.user_id = p.user_id
      WHERE p.first_purchase > v.first_view
    )
    SELECT CAST(length(bin(delta_ms)) AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(delta_ms) AS BIGINT) AS sum_delta_ms
    FROM d GROUP BY 1
    """,
)
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: first 'view' → first 'purchase'
    per user, on the same bit-length log2 grid as events_interarrival
    (no float log). The funnel_conversion companion: that counts WHO
    converts, this measures HOW LONG conversion takes — the metric
    that decides attribution-window length (events_attribution_join
    hardcodes one; this is where the number comes from).

    Scale shape: two map-side-combinable per-user min aggs (same
    user_id shuffle key), an inner join on the user frame (≪ events),
    and a ~40-cell rollup."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(ems).alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(ems).alias("first_purchase"))
    )
    d = (
        v.join(p, "user_id")
        .filter(F.col("first_purchase") > F.col("first_view"))
        .select((F.col("first_purchase") - F.col("first_view")).alias("delta_ms"))
    )
    return d.groupBy(
        F.length(F.bin(F.col("delta_ms"))).cast("bigint").alias("log2_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("delta_ms").cast("bigint").alias("sum_delta_ms"),
    )


@query(
    "label_margin_audit",
    """
    WITH sub AS (
      SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 = 0
    ),
    pairs AS (
      SELECT CASE WHEN a.label = b.label THEN 'intra' ELSE 'inter' END
               AS pair_kind,
             list_cosine_similarity(a.embedding, b.embedding) AS cos
      FROM sub a JOIN sub b ON a.vec_id < b.vec_id
    )
    SELECT pair_kind,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(cos), 4) AS mean_cos,
           round(min(cos), 4) AS min_cos,
           round(max(cos), 4) AS max_cos
    FROM pairs GROUP BY pair_kind
    """,
)
def label_margin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label separation: mean/min/max cosine WITHIN a
    label class vs ACROSS classes over a deterministic 10% subsample —
    the margin audit run before trusting labels for SemDeDup-style
    clustering or a kNN classifier (intra ≈ inter means the embedding
    does not encode the label and knn_classifier_accuracy will be
    noise). Same subsample discipline as dedup_embedding_cosine; at
    100 TB the pair frame is bounded by the sample, never the corpus.

    min/max are order-independent (exact floats); the mean rounds at
    4 dp inside the repo's cross-engine float discipline."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    a, b = emb.alias("a"), emb.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.when(F.col("a.label") == F.col("b.label"), "intra")
        .otherwise("inter")
        .alias("pair_kind"),
        cos.alias("cos"),
    )
    return pairs.groupBy("pair_kind").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.avg("cos"), 4).alias("mean_cos"),
        F.round(F.min("cos"), 4).alias("min_cos"),
        F.round(F.max("cos"), 4).alias("max_cos"),
    )


@query(
    "knn_classifier_accuracy",
    """
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe, label AS true_label
      FROM embeddings WHERE vec_id < 50
    ),
    nb AS (
      SELECT qid, true_label, label FROM (
        SELECT q.qid, q.true_label, e.label,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC,
                          e.vec_id
               ) AS rn
        FROM q JOIN embeddings e ON e.vec_id != q.qid
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT qid, true_label, label,
             CAST(count(*) AS BIGINT) AS c
      FROM nb GROUP BY qid, true_label, label
    ),
    pred AS (
      SELECT qid, true_label, label AS pred_label FROM (
        SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY c DESC, label
        ) AS v
        FROM votes
      ) WHERE v = 1
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM pred GROUP BY 1
    """,
)
def knn_classifier_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification accuracy (k=5, majority vote, smallest-label
    tie-break) per true class over 50 held-out-as-query vectors — the
    end-to-end quality gate that tells you whether the embedding +
    neighbor search are good enough to LABEL data, composing the exact
    brute-force scan (at scale: swap in ann_ivf_indexed — its recall
    row bounds the accuracy drop). Deterministic everywhere a float
    could tie: neighbor rank breaks by vec_id, the vote by label.

    Scale shape: broadcast queries × corpus scan, per-query top-k
    window, then two tiny rollups — identical to ann_bruteforce_topk's
    audited plan plus a vote."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("true_label"),
    )
    scored = F.broadcast(q).join(emb, F.col("vec_id") != F.col("qid")).select(
        "qid",
        "true_label",
        "label",
        "vec_id",
        cosine(F.col("qe"), F.col("embedding")).alias("cos"),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    nb = scored.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= 5
    )
    votes = nb.groupBy("qid", "true_label", "label").agg(
        F.count("*").cast("bigint").alias("c")
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("c"), F.asc("label"))
    pred = (
        votes.withColumn("v", F.row_number().over(wv))
        .filter(F.col("v") == 1)
        .select("qid", "true_label", F.col("label").alias("pred_label"))
    )
    return pred.groupBy(
        F.col("true_label").cast("bigint").alias("true_label")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )


@query(
    "seasonal_anomaly",
    """
    WITH slot AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
             (epoch_ms(ts) // 3600000) % 24 AS hour,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT dow, hour,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS q
      FROM slot GROUP BY dow, hour
    )
    SELECT CAST(t.day AS BIGINT) AS day,
           CAST(t.dow AS BIGINT) AS dow,
           CAST(t.hour AS BIGINT) AS hour,
           t.x, b.n_days, b.s,
           round((b.n_days * t.x - b.s)
                 / sqrt(CAST(b.n_days * b.q - b.s * b.s AS DOUBLE)), 4)
             AS z
    FROM slot t JOIN base b ON b.dow = t.dow AND b.hour = t.hour
    WHERE b.n_days * b.q > b.s * b.s
      AND (b.n_days * t.x - b.s) * (b.n_days * t.x - b.s)
          > 2 * (b.n_days * b.q - b.s * b.s)
    """,
)
def seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: each (day, hour) load
    compares against ITS OWN weekday-hour baseline (Monday-9am vs the
    other Monday-9ams), so the daily/weekly cycle that drowns
    events_anomaly_zscore's flat baseline is removed. The z² > 2 gate (k²
    tuned so the near-flat synthetic series still yields a watch list)
    is evaluated in PURE INTEGERS — z² > k² ⇔ (n·x−S)² > k²(nQ−S²), no
    float in the decision, engines agree on the flagged set
    bit-for-bit; the shipped z is one double over those integers.
    dow is zone-free epoch-day arithmetic (0=Thursday+4 ⇒ 0=Sunday —
    the repo's dow discipline).

    Scale shape: events collapse to hour slots (partial agg), the
    baseline is a 168-row frame that broadcast-joins back."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    slot = ev.groupBy(
        (ems / F.lit(86400000)).cast("bigint").alias("day"),
        (((ems / F.lit(86400000)).cast("bigint") + 4) % 7).alias("dow"),
        ((ems / F.lit(3600000)).cast("bigint") % 24).alias("hour"),
    ).agg(F.count("*").cast("bigint").alias("x"))
    base = slot.groupBy("dow", "hour").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    j = slot.join(F.broadcast(base), ["dow", "hour"])
    dev = F.col("n_days") * F.col("x") - F.col("s")
    var = F.col("n_days") * F.col("q") - F.col("s") * F.col("s")
    return (
        j.filter((var > 0) & (dev * dev > 2 * var))
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.col("dow").cast("bigint").alias("dow"),
            F.col("hour").cast("bigint").alias("hour"),
            "x",
            "n_days",
            "s",
            F.round(dev / F.sqrt(var.cast("double")), 4).alias("z"),
        )
    )


@query(
    "ann_int8_recall",
    """
    WITH q8 AS (
      SELECT vec_id,
             list_transform(embedding, x -> CASE
               WHEN CAST(round(x * 10000) AS BIGINT) >= 0
               THEN (CAST(round(x * 10000) AS BIGINT) * 127) // 10000
               ELSE -((-CAST(round(x * 10000) AS BIGINT) * 127) // 10000)
             END) AS qv
      FROM embeddings
    ),
    i8 AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY CAST(list_sum(
                   list_transform(q.qq, (x, i) -> x * e.qv[i])) AS BIGINT)
                   DESC, e.vec_id
               ) AS rn
        FROM (SELECT vec_id AS qid, qv AS qq FROM q8 WHERE vec_id < 10) q
        JOIN q8 e ON e.vec_id != q.qid
      ) WHERE rn <= 5
    ),
    bf AS (
      SELECT qid, vec_id FROM (
        SELECT q.vec_id AS qid, e.vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding, e.embedding)
                          DESC, e.vec_id
               ) AS rn
        FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
        WHERE q.vec_id < 10
      ) WHERE rn <= 5
    )
    SELECT count(*) AS n_truth,
           CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           round(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 / count(*), 4) AS recall_at_5
    FROM bf LEFT JOIN i8 i ON i.qid = bf.qid AND i.vec_id = bf.vec_id
    """,
)
def ann_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the int8-quantized scan vs exact float cosine — the
    quality gate that closes the int8 family the way
    ann_multiprobe_recall / ann_ivf_recall close LSH and IVF: every
    ANN variant in the repo now ships topk + a pinned recall row.
    Quantization error is the ONLY gap here (same exhaustive scan), so
    this isolates what 4× bandwidth costs in neighbor fidelity.
    Note int8 ranks by unnormalised integer dot while truth ranks by
    cosine — on near-unit-norm synthetic vectors they mostly agree;
    the recall number is exactly the norm-skew + rounding loss."""
    bf = ann_bruteforce_topk(spark, sf_dir).select(
        "qid", F.col("neighbor").alias("vec_id")
    )
    i8 = (
        ann_int8_topk(spark, sf_dir)
        .select("qid", F.col("neighbor").alias("vec_id"))
        .withColumn("hit", F.lit(1))
    )
    joined = bf.join(i8, ["qid", "vec_id"], "left")
    return joined.agg(
        F.count("*").alias("n_truth"),
        F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        F.round(
            F.sum(F.coalesce("hit", F.lit(0))) / F.count("*"), 4
        ).alias("recall_at_5"),
    )


@query(
    "dedup_cluster_sizes",
    f"""
    SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(size) AS BIGINT) AS n_docs
    FROM (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
      FROM ({_ORACLE_REG["dedup_clusters"]})
      GROUP BY cluster_id
    ) GROUP BY size
    """,
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution — the audit read before
    running dedup_keep_canonical: a heavy tail here (one giant
    component) means the LSH bands are glueing unrelated docs and the
    drop rate is about to spike; healthy corpora show sizes 2-4. One
    rollup on top of dedup_clusters' component output, so the oracle
    is the SAME recursive-CTE truth wrapped in two GROUP BYs.

    Scale shape: the component frame is ≪ corpus (only banded docs);
    both rollups partial-aggregate."""
    comp = dedup_clusters(spark, sf_dir)
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("size")
    )
    return sizes.groupBy("size").agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("size").cast("bigint").alias("n_docs"),
    )


@query(
    "event_type_correlation",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    xy AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(a.n) AS BIGINT) AS sx,
             CAST(sum(b.n) AS BIGINT) AS sy,
             CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
             CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
             CAST(sum(b.n * b.n) AS BIGINT) AS syy
      FROM d a JOIN d b
        ON a.day = b.day AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_days, sx, sy, sxy,
           round((n_days * sxy - sx * sy)
                 / sqrt((n_days * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        * (n_days * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * sy)), 6) AS pearson_r
    FROM xy
    """,
)
def event_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of DAILY VOLUMES between every event-type
    pair — the temporal co-movement companion to event_type_pmi's
    user-set co-occurrence (errors correlating with purchases day over
    day is an incident signal PMI can't see). All five moment sums are
    exact integers off one day×type rollup; r is one double expression
    of them.

    Scale shape: events collapse to the ~days×types frame first; the
    pair join runs on that tiny frame (day-keyed), never on events."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    d = ev.groupBy(
        (ems / F.lit(86400000)).cast("bigint").alias("day"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    a, b = d.alias("a"), d.alias("b")
    xy = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum("a.n").cast("bigint").alias("sx"),
            F.sum("b.n").cast("bigint").alias("sy"),
            F.sum(F.col("a.n") * F.col("b.n")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.n") * F.col("a.n")).cast("bigint").alias("sxx"),
            F.sum(F.col("b.n") * F.col("b.n")).cast("bigint").alias("syy"),
        )
    )
    nn = F.col("n_days")
    r = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (nn * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
        * (nn * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
    )
    return xy.select(
        "type_a", "type_b", "n_days", "sx", "sy", "sxy",
        F.round(r, 6).alias("pearson_r"),
    )


@query(
    "user_mix_outliers",
    """
    WITH ut AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    un AS (SELECT user_id, CAST(sum(o) AS BIGINT) AS n FROM ut GROUP BY 1),
    g AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS t,
             CAST(sum(sum(o)) OVER () AS BIGINT) AS tt
      FROM ut GROUP BY event_type
    ),
    terms AS (
      SELECT u.user_id, un.n,
             (u.o * g.tt - un.n * g.t)
             * (u.o * g.tt - un.n * g.t)
             / (CAST(un.n AS DOUBLE) * g.t * g.tt) AS term
      FROM ut u JOIN un ON un.user_id = u.user_id
      JOIN g ON g.event_type = u.event_type
    )
    SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
           round(sum(term), 6) AS chi2
    FROM terms GROUP BY user_id
    ORDER BY round(sum(term), 6) DESC, user_id LIMIT 20
    """,
)
def user_mix_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral outliers: top-20 users whose event-type MIX deviates
    most from the population mix, scored by chi² — the bot/abuse
    screen a crawl-traffic or product-analytics pipeline runs (a
    scraper is 99% 'view'; a card-tester is 99% 'purchase'). Each term
    is (o·T − n·t)²/(n·t·T) — numerator an exact integer, one double
    division — so ranking ties break on the 6 dp-rounded score then
    user_id, engine-identical.

    Scale shape: the user×type frame partial-aggregates events; the
    5-row global mix broadcasts back; top-20 is a driver-merged heap.
    Note chi² here is a RANKING score, not a test (per-user n varies);
    the z/χ² tests live in ab_test_zprop / term_drift_chi2."""
    ev = load(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("o")
    )
    un = ut.groupBy("user_id").agg(F.sum("o").cast("bigint").alias("n"))
    g = ut.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("t"))
    g = g.select(
        "event_type",
        "t",
        F.sum("t").over(Window.partitionBy()).cast("bigint").alias("tt"),
    )
    dev = F.col("o") * F.col("tt") - F.col("n") * F.col("t")
    terms = (
        ut.join(un, "user_id")
        .join(F.broadcast(g), "event_type")
        .select(
            "user_id",
            "n",
            (dev * dev / (F.col("n").cast("double") * F.col("t") * F.col("tt")))
            .alias("term"),
        )
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.round(F.sum("term"), 6).alias("chi2"),
        )
        .orderBy(F.desc("chi2"), "user_id")
        .limit(20)
    )


@query(
    "segment_median_order",
    """
    WITH c AS (
      SELECT c.c_mktsegment AS segment,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
             o.o_orderkey
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    r AS (
      SELECT segment, cents,
             row_number() OVER (
               PARTITION BY segment ORDER BY cents, o_orderkey
             ) AS rn,
             count(*) OVER (PARTITION BY segment) AS n
      FROM c
    )
    SELECT segment,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN rn * 2 = n OR rn * 2 = n + 1
                         OR rn * 2 = n + 2
                    THEN cents ELSE 0 END)
                // sum(CASE WHEN rn * 2 = n OR rn * 2 = n + 1
                            OR rn * 2 = n + 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS median_cents
    FROM r GROUP BY segment
    """,
)
def segment_median_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median order value per market segment via rank selection:
    the middle element (odd n) or the floor-mean of the two middle
    elements (even n — rn·2 ∈ {n, n+2}; odd picks rn·2 = n+1), chosen
    by integer rank arithmetic on cents, so no percentile-
    interpolation semantics need to match across engines (DuckDB's
    quantile_cont and Spark's percentile interpolate differently —
    rank selection sidesteps the whole class). Ties order by
    (cents, orderkey): the selected VALUES are tie-invariant.

    Scale shape: one segment-partitioned sort (5 partitions at any
    scale — the window frame is the segment, keyed shuffle); at 100 TB
    a t-digest approximation would replace the exact sort, traded
    consciously."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    c = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    r = c.select(
        "segment",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("segment")).alias("n"),
    )
    mid = (
        (F.col("rn") * 2 == F.col("n"))
        | (F.col("rn") * 2 == F.col("n") + 1)
        | (F.col("rn") * 2 == F.col("n") + 2)
    )
    r = r.withColumn("mid", mid)
    return r.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        # integer floor-div on BOTH sides: a double division here would
        # hit the cast-rounding split (DuckDB CAST rounds half-even,
        # Spark truncates) on every even-n .5 midpoint
        F.expr(
            "sum(CASE WHEN mid THEN cents ELSE 0 END)"
            " div sum(CASE WHEN mid THEN 1 ELSE 0 END)"
        )
        .cast("bigint")
        .alias("median_cents"),
    )


@query(
    "rich_club_coefficient",
    """
    WITH """ + _LINKGRAPH_SQL_CTES + """,
    deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY v
    ),
    ks AS (SELECT unnest([2, 4, 6, 8]) AS k),
    rich AS (
      SELECT k.k, d.v
      FROM deg d JOIN ks k ON d.d > k.k
    ),
    re AS (
      SELECT a.k, CAST(count(*) AS BIGINT) AS e_rich
      FROM edges e
      JOIN rich a ON a.v = e.a
      JOIN rich b ON b.v = e.b AND b.k = a.k
      GROUP BY a.k
    ),
    rn AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_rich FROM rich GROUP BY k
    )
    SELECT rn.k AS k, rn.n_rich, coalesce(re.e_rich, 0) AS e_rich,
           CAST(coalesce(re.e_rich, 0) * 2000000
                // (rn.n_rich * (rn.n_rich - 1)) AS BIGINT)
             AS phi_ppm
    FROM rn LEFT JOIN re ON re.k = rn.k
    WHERE rn.n_rich > 1
    """,
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) = 2·E_k / (N_k(N_k−1)): how densely
    the nodes of degree > k link to EACH OTHER — a rising φ(k) is the
    elite-interconnection signature (link farms and citation cartels
    show it; assortativity gives the trend, this gives the density per
    threshold). Exact integers end-to-end, φ shipped as ppm via
    integer floor-div.

    Scale shape: the degree table joins the a<b edge list twice
    (broadcast-sized at any realistic k) and everything rolls up to
    four k rows."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    deg = sym.groupBy("v").agg(F.count("*").cast("bigint").alias("d"))
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(4), F.lit(6), F.lit(8))).alias("k")
    )
    rich = deg.crossJoin(F.broadcast(ks)).filter(
        F.col("d") > F.col("k")
    ).select("k", "v")
    ra = rich.select(F.col("k"), F.col("v").alias("a"))
    rb = rich.select(F.col("k").alias("k2"), F.col("v").alias("b2"))
    re_ = (
        edges.join(ra, "a")
        .join(rb, (F.col("b") == F.col("b2")) & (F.col("k") == F.col("k2")))
        .groupBy("k")
        .agg(F.count("*").cast("bigint").alias("e_rich"))
    )
    rn = rich.groupBy("k").agg(F.count("*").cast("bigint").alias("n_rich"))
    return (
        rn.join(re_, "k", "left")
        .filter(F.col("n_rich") > 1)
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_rich",
            F.coalesce("e_rich", F.lit(0)).cast("bigint").alias("e_rich"),
            F.expr(
                "(coalesce(e_rich, 0) * 2000000)"
                " div (n_rich * (n_rich - 1))"
            )
            .cast("bigint")
            .alias("phi_ppm"),
        )
    )


@query(
    "dau_mau_stickiness",
    """
    WITH ud AS (
      SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    mau AS (
      SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
      FROM days d JOIN ud u
        ON u.day BETWEEN d.day - 27 AND d.day
      GROUP BY d.day
    )
    SELECT CAST(a.day AS BIGINT) AS day, a.dau, m.mau,
           CAST(a.dau * 1000000 // m.mau AS BIGINT) AS stickiness_ppm
    FROM dau a JOIN mau m ON m.day = a.day
    """,
)
def dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-28-day MAU / stickiness per day — the product
    engagement headline. The distinct-user trailing window can't run
    as a range frame (COUNT DISTINCT over a window isn't partial-
    aggregable), so the MAU joins the (user, day) frame against the
    DAY spine on a 28-day band — the join fans out each user-day to
    ≤28 spine days, then one distinct-agg per day. Stickiness ships as
    exact ppm.

    Scale shape: events collapse to (user, day) first (the big win);
    the band join's fan-out is bounded by 28× that frame, at 100 TB
    replaced by an HLL-register per day max-merged over the window
    (hll_union_merge pins that identity)."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    ud = ev.select(
        (ems / F.lit(86400000)).cast("bigint").alias("day"), "user_id"
    ).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    spine = days.select(F.col("day").alias("sday"))
    mau = (
        spine.join(
            ud,
            (F.col("day") >= F.col("sday") - 27)
            & (F.col("day") <= F.col("sday")),
        )
        .groupBy("sday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    return (
        dau.join(mau, dau.day == mau.sday)
        .select(
            F.col("day").cast("bigint").alias("day"),
            "dau",
            "mau",
            F.expr("(dau * 1000000) div mau").cast("bigint").alias(
                "stickiness_ppm"
            ),
        )
    )


@query(
    "abc_classification",
    """
    WITH pr AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    r AS (
      SELECT l_partkey, rev,
             CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey)
                  AS BIGINT) AS cum,
             CAST(sum(rev) OVER () AS BIGINT) AS total
      FROM pr
    )
    SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                WHEN cum * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS revenue_cents
    FROM r GROUP BY 1
    """,
)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering ≤80% of cumulative revenue, B to 95%, C the
    tail — the slice-the-catalog rule behind stocking policy (and the
    categorical cousin of events_pareto_share's deciles). Class
    boundaries compare cum·100 ≤ total·k in pure integers (cents), so
    membership is engine-exact; ranking ties break by partkey and the
    per-class SUMS are tie-order-invariant.

    Scale shape: lineitem collapses to one row per part (partial agg);
    the running sum sorts parts, not lineitems; output is 3 rows."""
    li = load(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    wo = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = pr.select(
        "rev",
        F.sum("rev").over(wo).cast("bigint").alias("cum"),
        F.sum("rev").over(Window.partitionBy()).cast("bigint").alias("total"),
    )
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return r.groupBy(cls.alias("abc_class")).agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
    )


@query(
    "events_autocorr_lag1",
    """
    WITH d AS (
      SELECT event_type, epoch_ms(ts) // 86400000 AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.n) AS BIGINT) AS sx,
             CAST(sum(b.n) AS BIGINT) AS sy,
             CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
             CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
             CAST(sum(b.n * b.n) AS BIGINT) AS syy
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND b.day = a.day + 1
      GROUP BY 1
    )
    SELECT event_type, n_pairs, sx, sy, sxy,
           CASE WHEN n_pairs * sxx - sx * sx > 0
                 AND n_pairs * syy - sy * sy > 0
                THEN round((n_pairs * sxy - sx * sy)
                     / sqrt((n_pairs * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * sx)
                            * (n_pairs * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * sy)), 6)
           END AS autocorr_lag1
    FROM p
    """,
)
def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily-volume series —
    the memory/momentum diagnostic (traffic that predicts tomorrow from
    today vs white noise) completing the co-movement family:
    event_type_correlation is cross-type at lag 0, this is within-type
    at lag 1. Pairs are CALENDAR-consecutive days (b.day = a.day + 1;
    a gap breaks the pair rather than splicing non-adjacent days), the
    five moment sums are exact integers off the day×type rollup, r is
    one double expression of them, and degenerate (constant) series
    return NULL via an integer variance gate instead of dividing by
    zero.

    Scale shape: events collapse to the ~days×types frame first
    (map-side combined); the self-join and moments run on that tiny
    frame keyed by (type, day) — never on raw events."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    d = ev.groupBy(
        "event_type", (ems / F.lit(86400000)).cast("bigint").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    a, b = d.alias("a"), d.alias("b")
    p = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.day") == F.col("a.day") + 1),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("a.n").cast("bigint").alias("sx"),
            F.sum("b.n").cast("bigint").alias("sy"),
            F.sum(F.col("a.n") * F.col("b.n")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.n") * F.col("a.n")).cast("bigint").alias("sxx"),
            F.sum(F.col("b.n") * F.col("b.n")).cast("bigint").alias("syy"),
        )
    )
    nn = F.col("n_pairs")
    varx = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nn * F.col("syy") - F.col("sy") * F.col("sy")
    r = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        varx.cast("double") * vary.cast("double")
    )
    return p.select(
        "event_type", "n_pairs", "sx", "sy", "sxy",
        F.when((varx > 0) & (vary > 0), F.round(r, 6)).alias("autocorr_lag1"),
    )


@query(
    "events_fano_burstiness",
    """
    WITH bounds AS (
      SELECT min(epoch_ms(ts) // 3600000) AS h0,
             max(epoch_ms(ts) // 3600000) AS h1
      FROM events
    ),
    spine AS (
      SELECT t.event_type, s.h
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) s
    ),
    c AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS h,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    filled AS (
      SELECT spine.event_type, COALESCE(c.n, 0) AS n
      FROM spine LEFT JOIN c
        ON spine.event_type = c.event_type AND spine.h = c.h
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(n) AS BIGINT) AS total,
           CAST(sum(n * n) AS BIGINT) AS sum_sq,
           round((count(*) * CAST(sum(n * n) AS DOUBLE)
                  - CAST(sum(n) AS DOUBLE) * sum(n))
                 / (CAST(count(*) AS DOUBLE) * sum(n)), 6) AS fano
    FROM filled
    GROUP BY event_type
    """,
)
def events_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, population var/mean) of each
    event type's HOURLY arrival counts over the full shared hour spine
    — THE burstiness test against the Poisson null: fano ≈ 1 is
    memoryless traffic, ≫ 1 is bursty (incidents, batch jobs), ≪ 1 is
    metronomic (heartbeats). The spine INCLUDES silent hours (a type
    that fires 1000 events in one hour of a thousand-hour window is
    maximally bursty — dropping its 999 zero hours would read it as
    constant), so counts left-join a generated [min, max] hour series
    shared across types. n, Σx, Σx² stay integers; fano is one double
    expression of them ((n·Σx² − (Σx)²) / (n·Σx)).

    Scale shape: events collapse to the hours×types count frame
    (map-side combined); the spine is sequence+explode of one global
    min/max row cross-joined with the distinct-types broadcast — spine
    length is the TIME RANGE, independent of event volume, and the
    left join runs on (type, hour) keys of that bounded frame."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    hour = (ems / F.lit(3600000)).cast("bigint")
    c = ev.groupBy("event_type", hour.alias("h")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    bounds = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    spine_h = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("h")
    )
    types = ev.select("event_type").distinct()
    spine = spine_h.crossJoin(F.broadcast(types))
    filled = spine.join(c, ["event_type", "h"], "left").select(
        "event_type", F.coalesce("n", F.lit(0)).alias("n")
    )
    g = filled.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.sum("n").cast("bigint").alias("total"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_sq"),
    )
    fano = (
        F.col("n_hours") * F.col("sum_sq").cast("double")
        - F.col("total").cast("double") * F.col("total")
    ) / (F.col("n_hours").cast("double") * F.col("total"))
    return g.select(
        "event_type", "n_hours", "total", "sum_sq",
        F.round(fano, 6).alias("fano"),
    )


@query(
    "orders_rollup",
    """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP margins over (priority, status): detail
    rows, per-priority subtotals, and the grand total in ONE pass,
    each level tagged by the grouping-set bitmask (gid 0 / 1 / 3 —
    Spark's grouping_id and DuckDB's two-argument GROUPING agree on
    the encoding). Completes the OLAP reshaping surface next to
    orders_cube (all 2^k sets) and the explicit-values PIVOT: ROLLUP
    is the drill-down hierarchy shape, k+1 sets not 2^k. Revenue in
    integer cents.

    Scale shape: Spark expands rollup into partial-aggregable grouping
    sets — one map-side-combined shuffle keyed by (priority, status,
    gid); no second pass over orders for the subtotal levels."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            # grouping_id() must live inside the rollup aggregate
            F.grouping_id().cast("bigint").alias("gid"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("revenue_cents"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "gid", "n_orders",
            "revenue_cents",
        )
    )


@query(
    "brand_supplier_hhi",
    """
    WITH rev AS (
      SELECT p.p_brand, l.l_suppkey,
             CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS r
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    t AS (
      SELECT p_brand, l_suppkey, r,
             CAST(sum(r) OVER (PARTITION BY p_brand) AS BIGINT) AS total
      FROM rev
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(max(total) AS BIGINT) AS total_cents,
           CAST(sum(((r * 10000) // total) * r // total) AS BIGINT) AS hhi_bp,
           CAST(sum(((r * 10000) // total) * r // total) AS BIGINT) > 2500
             AS concentrated
    FROM t
    GROUP BY p_brand
    """,
)
def brand_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per brand —
    the antitrust-style market-structure stat next to revenue_gini's
    inequality curve: HHI in basis points = Σ over suppliers of
    (share·10000·share), > 2500 flagged concentrated (the DOJ merger
    threshold). Each term is STAGED integer floor-division —
    ((rev·10000) div total)·rev div total — so the metric is engine-
    exact with no 128-bit intermediate (rev² would overflow int64 at
    scale; the staged form peaks at rev·10⁴) and both engines run the
    byte-identical expression.

    Scale shape: lineitem joins the small part dim (broadcast) and
    collapses to one row per (brand, supplier) map-side; the share
    window partitions by brand over that collapsed frame, never over
    lineitems."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )
    w = Window.partitionBy("p_brand")
    t = rev.withColumn("total", F.sum("r").over(w).cast("bigint"))
    term = F.expr("((r * 10000) div total) * r div total")
    g = t.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        F.max("total").cast("bigint").alias("total_cents"),
        F.sum(term).cast("bigint").alias("hhi_bp"),
    )
    return g.select(
        "p_brand", "n_suppliers", "total_cents", "hhi_bp",
        (F.col("hhi_bp") > 2500).alias("concentrated"),
    )


@query(
    "vocab_hapax_rate",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    f AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000 // count(*)
                AS BIGINT) AS hapax_permille
    FROM f
    GROUP BY lang
    """,
)
def vocab_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena rate per language: the fraction (permille,
    integer floor) of each language's vocabulary that occurs exactly
    once in the corpus — the Zipf-tail richness stat that predicts
    <unk>/OOV pressure on a tokenizer where vocab_coverage's head
    curve can't see it (a fat hapax tail means the next shard brings
    mostly new types). Same ' '-split token law as the vocab_coverage
    / text_tokens family; all counts integers.

    Scale shape: one (lang, token)-keyed count aggregate off the
    exploded corpus (map-side combined), then a per-lang rollup of the
    vocab-sized frame — the corpus is touched once; the rollup frame
    is |vocab|, already small relative to tokens."""
    docs = load(spark, sf_dir, "documents")
    f = (
        docs.select("lang", F.explode(words(F.col("text"))).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    g = f.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("n_hapax"),
    )
    return g.select(
        "lang", "n_vocab", "n_hapax",
        F.expr("n_hapax * 1000 div n_vocab").cast("bigint").alias(
            "hapax_permille"
        ),
    )


@query(
    "host_error_breaker",
    """
    WITH ledger AS (
      SELECT doc_id % 53 AS host,
             CASE WHEN ('0x' || substr(md5('err:' || doc_id::VARCHAR), 1, 15))
                       ::BIGINT % 100 < doc_id % 53
                  THEN 1 ELSE 0 END AS err
      FROM documents
    ),
    agg AS (
      SELECT host, CAST(count(*) AS BIGINT) AS attempts,
             CAST(sum(err) AS BIGINT) AS errors
      FROM ledger GROUP BY host
    )
    SELECT host, attempts, errors,
           (attempts >= 20 AND errors * 2 >= attempts) AS cooling
    FROM agg
    """,
)
def host_error_breaker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The failure circuit breaker's decision table (W41,
    operators/politeness.cooling_hosts) as an oracled query: per host,
    attempts, transient errors, and the trip flag — errors·2 ≥ attempts
    (threshold 1/2 cross-multiplied to integers, exactly the rational
    NUM/DEN gate the engine runs) with a min-attempts floor of 20 so a
    flaky singleton can't trip. Hosts are doc_id % 53 with a
    deterministic md5 error gate whose rate grows with host id
    (~host%), so the threshold is genuinely exercised on both sides of
    the boundary.

    Scale shape: identical to the engine path — one map-side-combined
    hash agg over the attempt ledger, output a hosts-level frame that
    broadcasts into the scheduler's config join."""
    docs = load(spark, sf_dir, "documents")
    host = (F.col("doc_id") % 53).alias("host")
    err = (
        md5_long(F.concat(F.lit("err:"), F.col("doc_id").cast("string"))) % 100
        < F.col("doc_id") % 53
    ).cast("int")
    agg = docs.select(host, err.alias("err")).groupBy("host").agg(
        F.count("*").cast("bigint").alias("attempts"),
        F.sum("err").cast("bigint").alias("errors"),
    )
    return agg.select(
        "host", "attempts", "errors",
        (
            (F.col("attempts") >= 20)
            & (F.col("errors") * 2 >= F.col("attempts"))
        ).alias("cooling"),
    )


@query(
    "supplier_balance_winsorized",
    """
    WITH s AS (
      SELECT s_nationkey, s_suppkey,
             CAST(round(s_acctbal * 100) AS BIGINT) AS cents
      FROM supplier
    ),
    r AS (
      SELECT s_nationkey, cents,
             row_number() OVER (PARTITION BY s_nationkey
                                ORDER BY cents, s_suppkey) AS rn,
             count(*) OVER (PARTITION BY s_nationkey) AS n
      FROM s
    ),
    b AS (
      SELECT s_nationkey, cents, n,
             max(CASE WHEN rn = (n + 9) // 10 THEN cents END)
               OVER (PARTITION BY s_nationkey) AS lo,
             max(CASE WHEN rn = (9 * n + 9) // 10 THEN cents END)
               OVER (PARTITION BY s_nationkey) AS hi
      FROM r
    )
    SELECT s_nationkey,
           CAST(max(n) AS BIGINT) AS n_suppliers,
           CAST(max(lo) AS BIGINT) AS lo_cents,
           CAST(max(hi) AS BIGINT) AS hi_cents,
           CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT)
             AS winsorized_sum_cents
    FROM b
    GROUP BY s_nationkey
    """,
)
def supplier_balance_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized account-balance rollup per nation: balances clipped at
    the exact nearest-rank p10/p90 (1-indexed ranks ceil(n/10) and
    ceil(9n/10) — pure integer rank arithmetic, (cents, suppkey) total
    order) before summing — the robust-mean companion to
    events_mad_outliers (MAD rejects outliers; winsorizing CAPS them,
    the estimator audit dashboards actually plot). The winsorized SUM
    ships with n; the consumer divides (an integer mean would need
    floor-vs-trunc agreement on possibly-negative sums — div truncates
    in Spark, // floors in DuckDB, so no quotient crosses engines).

    Scale shape: the windows partition by nation over the supplier dim
    (already small); at warehouse scale the exact nearest-rank bounds
    swap for approx_percentile's mergeable sketch — this exact row is
    its calibration, like events_value_percentiles."""
    s = load(spark, sf_dir, "supplier").select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.col("s_acctbal") * 100).cast("bigint").alias("cents"),
    )
    wp = Window.partitionBy("s_nationkey")
    wo = wp.orderBy("cents", "s_suppkey")
    r = (
        s.withColumn("rn", F.row_number().over(wo))
        .withColumn("n", F.count("*").over(wp))
        .withColumn(
            "lo",
            F.max(
                F.when(F.col("rn") == F.expr("(n + 9) div 10"), F.col("cents"))
            ).over(wp),
        )
        .withColumn(
            "hi",
            F.max(
                F.when(
                    F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("cents")
                )
            ).over(wp),
        )
    )
    return r.groupBy("s_nationkey").agg(
        F.max("n").cast("bigint").alias("n_suppliers"),
        F.max("lo").cast("bigint").alias("lo_cents"),
        F.max("hi").cast("bigint").alias("hi_cents"),
        F.sum(F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi")))
        .cast("bigint")
        .alias("winsorized_sum_cents"),
    )


@query(
    "word_burstiness",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    f AS (
      SELECT t, CAST(count(*) AS BIGINT) AS cf,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY t
    )
    SELECT t AS word, cf, df, CAST(cf * 1000 // df AS BIGINT)
             AS burstiness_permille
    FROM f
    ORDER BY cf DESC, t
    LIMIT 12
    """,
)
def word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale word burstiness for the top-12 collection-frequency
    words: cf/df in permille — a word that appears 3000 times per
    thousand containing docs clumps (content word), ~1000 spreads
    evenly (function word). The doc-frequency dial that separates
    topical terms from glue where raw frequency (vocab_coverage's
    ranking) can't. Ties rank by (cf desc, word); counts are integers
    and the ratio is floor permille.

    Scale shape: one exploded (word, doc)-keyed pass: cf is a plain
    count, df a distinct count over the (t, doc_id) pairs (exact here
    as the burstiness definition requires; the corpus-scale screen
    would pre-dedup (t, doc_id) map-side). Top-12 is
    TakeOrderedAndProject on the vocab-sized frame — no global sort."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(words(F.col("text"))).alias("t"))
    f = toks.groupBy("t").agg(
        F.count("*").cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    return (
        f.select(
            F.col("t").alias("word"),
            "cf",
            "df",
            F.expr("cf * 1000 div df").cast("bigint").alias(
                "burstiness_permille"
            ),
        )
        .orderBy(F.desc("cf"), "word")
        .limit(12)
    )


@query(
    "revenue_drawdown",
    """
    WITH d AS (
      SELECT epoch_ms(o_orderdate) // 86400000 AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev
      FROM orders GROUP BY 1
    ),
    r AS (
      SELECT day, rev,
             CAST(max(rev) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS peak,
             CAST(count(*) OVER () AS BIGINT) AS n_days
      FROM d
    )
    SELECT day AS worst_day, n_days, peak AS peak_cents, rev AS revenue_cents,
           CAST(peak - rev AS BIGINT) AS drawdown_cents
    FROM r
    ORDER BY peak - rev DESC, day
    LIMIT 1
    """,
)
def revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series: the worst decline
    from any prior peak day (running max) to a later day — the
    finance-style health stat that a week-over-week delta
    (events_wow_change) smooths over, and the running-extrema window
    shape the family didn't have. One row out: the worst day (earliest
    on ties), its drawdown, the peak it fell from, n_days. All cents
    integers.

    Scale shape: orders collapse to one row per day first (map-side
    combined); the running-max window and the top-1 sort run on the
    days-sized frame — bounded by the calendar, not the order volume.
    The deliberately-global window orders ~10³ rows at any SF."""
    o = load(spark, sf_dir, "orders")
    ems = ntz_epoch_ms(F.col("o_orderdate"))
    d = o.groupBy(
        (ems / F.lit(86400000)).cast("bigint").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = d.select(
        "day",
        "rev",
        F.max("rev").over(w).cast("bigint").alias("peak"),
        F.count("*").over(Window.partitionBy()).cast("bigint").alias("n_days"),
    )
    return (
        r.select(
            F.col("day").alias("worst_day"),
            "n_days",
            F.col("peak").alias("peak_cents"),
            F.col("rev").alias("revenue_cents"),
            (F.col("peak") - F.col("rev")).cast("bigint").alias(
                "drawdown_cents"
            ),
        )
        .orderBy(F.desc("drawdown_cents"), "worst_day")
        .limit(1)
    )


@query(
    "transition_entropy",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT event_type AS src_type, nxt AS dst_type,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE nxt IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT src_type,
           CAST(sum(n) AS BIGINT) AS total,
           CAST(count(*) AS BIGINT) AS n_next_types,
           round(log2(sum(n)) - sum(n * log2(n)) / sum(n), 6)
             AS entropy_bits
    FROM pairs
    GROUP BY src_type
    """,
)
def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-action entropy per state: H(next | src) in bits
    over the SAME per-user (ts, event_id)-ordered successor pairs as
    events_markov_transitions — the one-number summary of how
    predictable behaviour is after each event type (0 = deterministic
    funnel step, log2(5) = uniform). Uses the aggregation-friendly
    identity H = log2 T − Σ n·log2 n / T off integer pair counts
    (source_entropy's discipline), so the only doubles are the final
    expression over exact integers.

    Scale shape: user_id is the only event-sized shuffle (the lead
    window); entropy aggregates the |states|² pair frame."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = o.groupBy(
        F.col("event_type").alias("src_type"), F.col("nxt").alias("dst_type")
    ).agg(F.count("*").cast("bigint").alias("n"))
    t = F.sum("n")
    return pairs.groupBy("src_type").agg(
        t.cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_next_types"),
        F.round(
            F.log2(t) - F.sum(F.col("n") * F.log2("n")) / t, 6
        ).alias("entropy_bits"),
    )


@query(
    "events_user_overlap_jaccard",
    """
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS nu
      FROM ut GROUP BY event_type
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_inter
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, ta.nu AS n_a, tb.nu AS n_b, i.n_inter,
           CAST(i.n_inter * 1000 // (ta.nu + tb.nu - i.n_inter) AS BIGINT)
             AS jaccard_permille
    FROM inter i
    JOIN tot ta ON ta.event_type = i.type_a
    JOIN tot tb ON tb.event_type = i.type_b
    """,
)
def events_user_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between event types as exact user-set Jaccard
    (permille, integer floor) — the SIZE-NORMALIZED companion to
    event_type_pmi (PMI says 'more often together than chance'; Jaccard
    says 'how much of either audience is shared', which is what
    capacity planning and feature bundling actually read). Integer
    end-to-end: intersection from a user-keyed self-join of the
    deduped (user, type) frame, union by inclusion-exclusion.

    Scale shape: events collapse to distinct (user, type) first (one
    map-side-combined dedup — the frame is ≤ users×5); the self-join
    shuffles on user_id once; per-type totals broadcast back onto the
    ≤10-row pair frame."""
    ev = load(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    tot = ut.groupBy("event_type").agg(F.count("*").cast("bigint").alias("nu"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    ta = tot.select(
        F.col("event_type").alias("type_a"), F.col("nu").alias("n_a")
    )
    tb = tot.select(
        F.col("event_type").alias("type_b"), F.col("nu").alias("n_b")
    )
    j = inter.join(F.broadcast(ta), "type_a").join(F.broadcast(tb), "type_b")
    return j.select(
        "type_a", "type_b", "n_a", "n_b", "n_inter",
        F.expr("n_inter * 1000 div (n_a + n_b - n_inter)")
        .cast("bigint")
        .alias("jaccard_permille"),
    )


@query(
    "segment_interpurchase_median",
    """
    WITH o AS (
      SELECT c.c_mktsegment AS segment, o_custkey,
             epoch_ms(o_orderdate) // 86400000 AS day, o_orderkey
      FROM orders JOIN customer c ON o_custkey = c.c_custkey
    ),
    g AS (
      SELECT segment,
             lead(day) OVER (PARTITION BY o_custkey
                             ORDER BY day, o_orderkey) - day AS gap,
             o_orderkey
      FROM o
    ),
    gaps AS (SELECT segment, gap, o_orderkey FROM g WHERE gap IS NOT NULL),
    r AS (
      SELECT segment, gap,
             row_number() OVER (PARTITION BY segment
                                ORDER BY gap, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY segment) AS n
      FROM gaps
    )
    SELECT segment, CAST(max(n) AS BIGINT) AS n_gaps,
           CAST(sum(CASE WHEN rn * 2 IN (n, n + 1, n + 2) THEN gap
                         ELSE 0 END)
                // sum(CASE WHEN rn * 2 IN (n, n + 1, n + 2) THEN 1
                            ELSE 0 END) AS BIGINT) AS median_gap_days
    FROM r
    GROUP BY segment
    """,
)
def segment_interpurchase_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median inter-purchase gap (days) per market segment: gaps
    from a per-customer lead() over the (day, orderkey) total order,
    median by the same integer rank selection as segment_median_order
    (middle element / floor-mean of the two middles — sidesteps
    cross-engine percentile interpolation). The repurchase-cadence
    number behind replenishment-cycle and churn-window tuning, and
    events_interarrival's per-entity analog on the orders table.

    Scale shape: one customer-keyed window (the only order-sized
    shuffle) produces gaps; the median sort partitions by segment over
    the gaps frame (5 partitions at any scale); at 100 TB the exact
    rank selection trades to a t-digest, calibrated by this row."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    ems = ntz_epoch_ms(F.col("o_orderdate"))
    o = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_custkey",
        (ems / F.lit(86400000)).cast("bigint").alias("day"),
        "o_orderkey",
    )
    wc = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    g = o.select(
        "segment",
        (F.lead("day").over(wc) - F.col("day")).alias("gap"),
        "o_orderkey",
    ).filter(F.col("gap").isNotNull())
    w = Window.partitionBy("segment").orderBy("gap", "o_orderkey")
    r = g.select(
        "segment",
        "gap",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("segment")).alias("n"),
    ).withColumn(
        "mid",
        (F.col("rn") * 2 == F.col("n"))
        | (F.col("rn") * 2 == F.col("n") + 1)
        | (F.col("rn") * 2 == F.col("n") + 2),
    )
    return r.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.expr(
            "sum(CASE WHEN mid THEN gap ELSE 0 END)"
            " div sum(CASE WHEN mid THEN 1 ELSE 0 END)"
        )
        .cast("bigint")
        .alias("median_gap_days"),
    )


@query(
    "word_pmi_top",
    """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    cf AS (SELECT t, CAST(count(*) AS BIGINT) AS dfq FROM toks GROUP BY t),
    top AS (SELECT t, dfq FROM cf ORDER BY dfq DESC, t LIMIT 20),
    pw AS (SELECT toks.doc_id, toks.t, top.dfq FROM toks JOIN top USING (t)),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    pairs AS (
      SELECT a.t AS word_a, b.t AS word_b,
             CAST(max(a.dfq) AS BIGINT) AS df_a,
             CAST(max(b.dfq) AS BIGINT) AS df_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM pw a JOIN pw b ON a.doc_id = b.doc_id AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT word_a, word_b, df_a, df_b, n_both, n_docs,
           round(log2(CAST(n_both AS DOUBLE) * n_docs / (df_a * df_b)), 6)
             AS pmi_bits
    FROM pairs, nn
    """,
)
def word_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information (bits) between the top-20
    document-frequency words, over doc-level co-occurrence — the word-
    association miner (collocations vs independent glue) that
    event_type_pmi runs on behaviour and this runs on text. Candidates
    are BOUNDED FIRST (top-20 by df, ties by word — ≤190 pairs), so
    the pair join never touches the vocabulary square; integer
    witnesses (df_a, df_b, n_both, n_docs) carry exactness and PMI is
    one double expression of them.

    Scale shape: one deduped (doc, word) pass; top-20 is
    TakeOrderedAndProject on the vocab frame; the semi-join back
    broadcasts 20 words; the pair self-join shuffles only the
    top-word postings (≤ 20·docs rows, doc-keyed)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("t")
    ).distinct()
    cf = toks.groupBy("t").agg(F.count("*").cast("bigint").alias("dfq"))
    top = cf.orderBy(F.desc("dfq"), "t").limit(20)
    pw = toks.join(F.broadcast(top), "t")
    n_docs = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    a, b = pw.alias("a"), pw.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .groupBy(F.col("a.t").alias("word_a"), F.col("b.t").alias("word_b"))
        .agg(
            F.max("a.dfq").cast("bigint").alias("df_a"),
            F.max("b.dfq").cast("bigint").alias("df_b"),
            F.count("*").cast("bigint").alias("n_both"),
        )
    )
    pmi = F.log2(
        F.col("n_both").cast("double")
        * F.col("n_docs")
        / (F.col("df_a") * F.col("df_b"))
    )
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "word_a", "word_b", "df_a", "df_b", "n_both", "n_docs",
        F.round(pmi, 6).alias("pmi_bits"),
    )


@query(
    "ngram_novelty_rate",
    """
    WITH occ AS (
      SELECT DISTINCT doc_id, g
      FROM (
        SELECT doc_id, string_split(lower(text), ' ') AS ws
        FROM documents
      ), LATERAL (
        SELECT unnest([array_to_string(ws[i:i+2], ' ')
                       for i in range(1, len(ws) - 1)]) AS g
      )
    ),
    first AS (
      SELECT g, CAST(min(doc_id) AS BIGINT) AS first_doc
      FROM occ GROUP BY g
    )
    SELECT occ.doc_id % 10 AS doc_bucket,
           CAST(count(*) AS BIGINT) AS grams,
           CAST(sum(CASE WHEN occ.doc_id = f.first_doc THEN 1 ELSE 0 END)
                AS BIGINT) AS novel,
           CAST(sum(CASE WHEN occ.doc_id = f.first_doc THEN 1 ELSE 0 END)
                * 1000 // count(*) AS BIGINT) AS novelty_permille
    FROM occ JOIN first f USING (g)
    GROUP BY occ.doc_id % 10
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per doc-id bucket, the permille of each
    document's DISTINCT word-3-grams whose FIRST corpus occurrence (min
    doc_id — the ingestion-order proxy) is that document — the
    diminishing-returns dial dataset curation reads (novelty falling
    toward zero means additional shards of this source mostly repeat
    what the corpus already has; the incremental-value complement of
    dedup's yes/no duplicate verdict). Integer end-to-end.

    Scale shape: one exploded distinct (doc, gram) pass; first
    occurrences are a gram-keyed min aggregate (map-side combined); the
    attribution join is gram-keyed on the same shuffle layout
    (ReuseExchange-friendly); output collapses to 10 buckets."""
    docs = load(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(word_ngrams(words(F.col("text")), 3)).alias("g"),
    ).distinct()
    first = occ.groupBy("g").agg(
        F.min("doc_id").cast("bigint").alias("first_doc")
    )
    j = occ.join(first, "g")
    novel = (F.col("doc_id") == F.col("first_doc")).cast("long")
    g = j.groupBy((F.col("doc_id") % 10).alias("doc_bucket")).agg(
        F.count("*").cast("bigint").alias("grams"),
        F.sum(novel).cast("bigint").alias("novel"),
    )
    return g.select(
        "doc_bucket", "grams", "novel",
        F.expr("novel * 1000 div grams").cast("bigint").alias(
            "novelty_permille"
        ),
    )


@query(
    "events_anova_dow",
    """
    WITH v AS (
      SELECT event_type,
             (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    g AS (
      SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM v GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS k_groups,
           CAST(sum(n) AS BIGINT) AS n_total,
           CASE WHEN count(*) > 1 AND sum(n) > count(*)
                 AND sum(CAST(ss AS DOUBLE))
                     - sum(CAST(s AS DOUBLE) * s / n) > 0
                THEN round(((sum(CAST(s AS DOUBLE) * s / n)
                             - CAST(sum(s) AS DOUBLE) * sum(s) / sum(n))
                            / (count(*) - 1))
                           / ((sum(CAST(ss AS DOUBLE))
                               - sum(CAST(s AS DOUBLE) * s / n))
                              / (sum(n) - count(*))), 6)
           END AS f_stat
    FROM g
    GROUP BY event_type
    """,
)
def events_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic per event type for a day-of-week
    effect on event VALUE (cents): between-group mean square over
    within-group mean square off the per-(type, dow) moment sums — the
    variance-decomposition member of the test family (z-prop compares
    two proportions, chi² compares counts; ANOVA asks whether a
    CONTINUOUS metric differs across k groups). F ≈ 1 means weekday is
    noise; large F means the metric moves by weekday. dow uses the
    epoch-day + 4 mod 7 convention (1970-01-01 = Thursday; 0=Sunday),
    matching the repo's other dow queries. Moment sums are exact
    integers (cents); F is one double expression of them.

    Scale shape: events collapse to the ≤ types×7 moment frame in one
    map-side-combined pass; the F arithmetic runs on that frame."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    v = ev.select(
        "event_type",
        ((ems / F.lit(86400000)).cast("bigint") + 4) % 7,
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).toDF("event_type", "dow", "cents")
    g = v.groupBy("event_type", "dow").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    sd = F.col("s").cast("double")
    within_num = F.sum(F.col("ss").cast("double")) - F.sum(
        sd * F.col("s") / F.col("n")
    )
    between = (
        F.sum(sd * F.col("s") / F.col("n"))
        - F.sum("s").cast("double") * F.sum("s") / F.sum("n")
    ) / (F.count("*") - 1)
    within = within_num / (F.sum("n") - F.count("*"))
    # degenerate-grouping guard: k=1 (all events on one weekday),
    # n=k (one event per group) or an all-constant metric make a
    # denominator 0 — Spark's double/0 is NULL while DuckDB's is
    # inf/nan, so the guard must decide BEFORE the division on both
    # sides (review finding, session 8)
    ok = (
        (F.count("*") > 1)
        & (F.sum("n") > F.count("*"))
        & (within_num > 0)
    )
    return g.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("k_groups"),
        F.sum("n").cast("bigint").alias("n_total"),
        F.when(ok, F.round(between / within, 6)).alias("f_stat"),
    )


@query(
    "domain_budget_allocation",
    """
    WITH f AS (
      SELECT 'http://h' || (doc_id % 23) || '.d' || (doc_id % 7)
             || '.test/p' || doc_id AS url,
             'h' || (doc_id % 23) || '.d' || (doc_id % 7) || '.test' AS host
      FROM documents
    ),
    q AS (SELECT host, CAST(count(*) AS BIGINT) AS q FROM f GROUP BY host),
    d AS (
      SELECT host, q,
             regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
      FROM q
    ),
    ham AS (
      SELECT host, q, domain,
             CAST(sum(q) OVER (PARTITION BY domain) AS BIGINT) AS qd
      FROM d
    ),
    b AS (
      SELECT host, domain, q, qd,
             (50 * q) // qd AS base, (50 * q) % qd AS fr
      FROM ham
    ),
    e AS (
      SELECT host, base, fr,
             50 - sum(base) OVER (PARTITION BY domain) AS extra,
             row_number() OVER (PARTITION BY domain
                                ORDER BY fr DESC, host) AS rk
      FROM b
    )
    SELECT host,
           CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)
             AS budget
    FROM e
    """,
)
def domain_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-scoped budget apportionment (W42) as an oracled query:
    the PRODUCTION operator (operators/politeness
    .domain_budget_override) runs over a synthesized 161-host / 7-
    domain frontier with the per-domain default budget 50, and the
    DuckDB twin re-derives the exact per-domain Hamilton rule
    independently — integer quotas ((G·q) div Q_d), remainder units to
    the largest (G·q) mod Q_d with host-asc tie-break, Σ per domain ==
    G exactly. Gates the operator itself, not a third copy of the
    formula.

    Scale: one map-side-combined queue rollup; every window partitions
    by domain over the HOSTS frame (≪ URLs); output is hosts-sized."""
    from .operators.politeness import domain_budget_override

    docs = load(spark, sf_dir, "documents")
    frontier = docs.select(
        F.lit(1).cast("long").alias("scraping_id"),
        F.lit(1).cast("long").alias("user_id"),
        F.format_string(
            "http://h%d.d%d.test/p%d",
            (F.col("doc_id") % 23).cast("int"),
            (F.col("doc_id") % 7).cast("int"),
            F.col("doc_id").cast("long"),
        ).alias("url"),
        F.lit(2).alias("depth"),
        F.lit(0).alias("round"),
    )
    alloc = domain_budget_override(frontier, None, default_budget=50)
    return alloc.select(
        "host",
        F.col("max_fetches_per_round").cast("bigint").alias("budget"),
    )


@query(
    "label_centroid_shift",
    """
    WITH e AS (
      SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, generate_series(1, 64) t(i)
    ),
    lc AS (
      SELECT label, dim, CAST(count(*) AS BIGINT) AS n, sum(v) AS s
      FROM e GROUP BY 1, 2
    ),
    g AS (
      SELECT dim, sum(s) / sum(n) AS gc FROM lc GROUP BY dim
    )
    SELECT lc.label,
           CAST(max(lc.n) AS BIGINT) AS n_vecs,
           round(sqrt(sum((lc.s / lc.n - g.gc) * (lc.s / lc.n - g.gc))), 4)
             AS centroid_shift
    FROM lc JOIN g USING (dim)
    GROUP BY lc.label
    """,
)
def label_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid shift: the L2 distance between each
    label's centroid and the corpus centroid — the class-separability /
    drift dial read before training a classifier on the embedding
    space (labels whose centroids sit on top of the global mean carry
    no linear signal; a centroid that MOVES between snapshots is
    distribution drift, feature_psi's geometric cousin). Same
    posexplode / generate_series twin pair and 4-dp float discipline
    as embedding_dim_stats.

    Scale shape: explode → (label, dim)-keyed partial-aggregable
    sums (labels×64 rows out); the global centroid folds that same
    frame per dim; the distance join runs labels×64 against 64 —
    nothing downstream of the first agg scales with corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select("label", "dim", F.col("v").cast("double").alias("v"))
    lc = e.groupBy("label", "dim").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("v").alias("s")
    )
    g = lc.groupBy("dim").agg((F.sum("s") / F.sum("n")).alias("gc"))
    d = F.col("s") / F.col("n") - F.col("gc")
    return (
        lc.join(g, "dim")
        .groupBy("label")
        .agg(
            F.max("n").cast("bigint").alias("n_vecs"),
            F.round(F.sqrt(F.sum(d * d)), 4).alias("centroid_shift"),
        )
    )


@query(
    "part_price_size_correlation",
    """
    WITH v AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             CAST(p_size AS BIGINT) AS sz
      FROM part
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS s_price,
           CAST(sum(sz) AS BIGINT) AS s_size,
           round((count(*) * CAST(sum(cents * sz) AS DOUBLE)
                  - CAST(sum(cents) AS DOUBLE) * sum(sz))
                 / sqrt((count(*) * CAST(sum(cents * cents) AS DOUBLE)
                         - CAST(sum(cents) AS DOUBLE) * sum(cents))
                        * (count(*) * CAST(sum(sz * sz) AS DOUBLE)
                           - CAST(sum(sz) AS DOUBLE) * sum(sz))), 6)
             AS pearson_r
    FROM v
    """,
)
def part_price_size_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between part retail price (cents) and size
    over the part dim — the column-pair profiling stat (does a catalog
    attribute carry price signal?) that completes the correlation
    family: event_type_correlation is series-vs-series,
    events_autocorr_lag1 is series-vs-lagged-self, this is
    column-vs-column in one table. All five moment sums exact
    integers; r one double expression, single row out.

    Scale shape: one map-side-combined aggregate over the dim table —
    no shuffle wider than the 1-row result."""
    pt = load(spark, sf_dir, "part")
    v = pt.select(
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        F.col("p_size").cast("bigint").alias("sz"),
    )
    a = v.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s_price"),
        F.sum("sz").cast("bigint").alias("s_size"),
        F.sum(F.col("cents") * F.col("sz")).cast("bigint").alias("sxy"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("sxx"),
        F.sum(F.col("sz") * F.col("sz")).cast("bigint").alias("syy"),
    )
    nn = F.col("n")
    r = (nn * F.col("sxy").cast("double") - F.col("s_price").cast("double") * F.col("s_size")) / F.sqrt(
        (nn * F.col("sxx").cast("double") - F.col("s_price").cast("double") * F.col("s_price"))
        * (nn * F.col("syy").cast("double") - F.col("s_size").cast("double") * F.col("s_size"))
    )
    return a.select("n", "s_price", "s_size", F.round(r, 6).alias("pearson_r"))


@query(
    "ks_two_sample",
    """
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS grp
      FROM orders
    ),
    s AS (
      SELECT cents,
             CAST(sum(grp) AS BIGINT) AS c_a,
             CAST(sum(1 - grp) AS BIGINT) AS c_b
      FROM v GROUP BY 1
    ),
    c AS (
      SELECT CAST(sum(c_a) OVER (ORDER BY cents) AS BIGINT) AS cum_a,
             CAST(sum(c_b) OVER (ORDER BY cents) AS BIGINT) AS cum_b
      FROM s
    ),
    t AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
                 CAST(sum(c_b) AS BIGINT) AS n_b FROM s)
    SELECT t.n_a, t.n_b,
           CAST(max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT)
             AS ks_num,
           CASE WHEN t.n_a > 0 AND t.n_b > 0
                THEN round(max(abs(c.cum_a * t.n_b - c.cum_b * t.n_a))
                           / (CAST(t.n_a AS DOUBLE) * t.n_b), 6)
           END AS ks_d
    FROM c, t
    GROUP BY t.n_a, t.n_b
    """,
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the order-value
    distributions of high-priority (1-URGENT/2-HIGH) and other orders
    — the standard "did the distribution shift?" gate run between two
    cohorts (or two crawl snapshots) before trusting a downstream
    model. Exact, not binned: the ECDF gap is evaluated at every
    distinct value. The max runs over the INTEGER cross-multiplied gap
    |cum_a*n_b - cum_b*n_a| (never a float subtraction), so both
    engines agree bit-for-bit and ks_d is one division of identical
    integers.

    Scale shape: rows fold to the per-distinct-value histogram first
    (map-side combinable), the one window sorts DISTINCT cents values
    only — the same sorted-histogram move as score_auc — and totals
    ride a 1-row broadcast. Nothing after the first agg scales with
    row count."""
    orders = load(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("grp"),
    )
    s = v.groupBy("cents").agg(
        F.sum("grp").cast("bigint").alias("c_a"),
        F.sum(1 - F.col("grp")).cast("bigint").alias("c_b"),
    )
    t = s.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    c = s.select(
        F.sum("c_a").over(w).cast("bigint").alias("cum_a"),
        F.sum("c_b").over(w).cast("bigint").alias("cum_b"),
    )
    gap = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("n_a", "n_b")
        .agg(
            F.max(gap).cast("bigint").alias("ks_num"),
            # empty-cohort guard decided BEFORE the division on both
            # sides (0/0 is NULL in Spark but NaN in DuckDB)
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round(
                    F.max(gap)
                    / (F.col("n_a").cast("double") * F.col("n_b")),
                    6,
                ),
            ).alias("ks_d"),
        )
    )


@query(
    "spearman_price_size",
    """
    WITH v AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
             CAST(p_size AS BIGINT) AS sz
      FROM part
    ),
    rx AS (
      SELECT cents,
             2 * coalesce(sum(count(*)) OVER (
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + count(*) + 1 AS r2
      FROM v GROUP BY cents
    ),
    ry AS (
      SELECT sz,
             2 * coalesce(sum(count(*)) OVER (
               ORDER BY sz
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + count(*) + 1 AS r2
      FROM v GROUP BY sz
    ),
    r AS (
      SELECT CAST(rx.r2 AS BIGINT) AS a, CAST(ry.r2 AS BIGINT) AS b
      FROM v JOIN rx USING (cents) JOIN ry USING (sz)
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(a) AS BIGINT) AS sum_r2x,
           CAST(sum(b) AS BIGINT) AS sum_r2y,
           CASE WHEN count(*) * sum(a * a) - sum(a) * sum(a) > 0
                 AND count(*) * sum(b * b) - sum(b) * sum(b) > 0
                THEN round((count(*) * CAST(sum(a * b) AS DOUBLE)
                            - CAST(sum(a) AS DOUBLE) * sum(b))
                           / sqrt((count(*) * CAST(sum(a * a) AS DOUBLE)
                                   - CAST(sum(a) AS DOUBLE) * sum(a))
                                  * (count(*) * CAST(sum(b * b) AS DOUBLE)
                                     - CAST(sum(b) AS DOUBLE) * sum(b))),
                           6)
           END AS spearman_rho
    FROM r
    """,
)
def spearman_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of part price vs size — the
    monotone-association twin of part_price_size_correlation (Pearson
    sees only linear signal; rank correlation is the robust profiling
    default under outliers/nonlinearity). Tie-average ranks are kept
    EXACT by doubling: 2*avg_rank = 2*count_below + count_eq + 1 is an
    integer, and Pearson is affine-invariant, so rho computed on the
    doubled ranks is identical. All five moment sums are exact
    integers; the emitted double is one expression over them.

    Scale shape: each rank map is a sorted-DISTINCT-value window
    (value-histogram cardinality, not row count) joined back on the
    value key — two hash joins, then one map-side-combined moment
    aggregate. At 100-TB n the doubled-rank cubes need > 63 bits:
    switch the moment sums to DECIMAL(38) or center ranks first; at
    bench scale (n <= 2*10^5) the largest sum is < 4n^3 ~ 2^45."""
    pt = load(spark, sf_dir, "part")
    v = pt.select(
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
        F.col("p_size").cast("bigint").alias("sz"),
    )

    def rank_map(col: str):
        g = v.groupBy(col).agg(F.count("*").alias("cnt"))
        w = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return g.select(
            col,
            (
                2 * F.coalesce(F.sum("cnt").over(w), F.lit(0))
                + F.col("cnt")
                + 1
            )
            .cast("bigint")
            .alias(f"r2_{col}"),
        )

    r = (
        v.join(rank_map("cents"), "cents")
        .join(rank_map("sz"), "sz")
        .select(F.col("r2_cents").alias("a"), F.col("r2_sz").alias("b"))
    )
    agg = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sum_r2x"),
        F.sum("b").cast("bigint").alias("sum_r2y"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
    )
    nn = F.col("n")
    rho = (
        nn * F.col("sab").cast("double")
        - F.col("sum_r2x").cast("double") * F.col("sum_r2y")
    ) / F.sqrt(
        (
            nn * F.col("saa").cast("double")
            - F.col("sum_r2x").cast("double") * F.col("sum_r2x")
        )
        * (
            nn * F.col("sbb").cast("double")
            - F.col("sum_r2y").cast("double") * F.col("sum_r2y")
        )
    )
    # zero-variance guard on exact INTEGER witnesses, decided before
    # the division on both sides (Spark 0/0 is NULL, DuckDB NaN)
    ok = (
        nn * F.col("saa") - F.col("sum_r2x") * F.col("sum_r2x") > 0
    ) & (nn * F.col("sbb") - F.col("sum_r2y") * F.col("sum_r2y") > 0)
    return agg.select(
        "n",
        "sum_r2x",
        "sum_r2y",
        F.when(ok, F.round(rho, 6)).alias("spearman_rho"),
    )


@query(
    "js_divergence_lang",
    """
    WITH c AS (
      SELECT lang,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)
               AS BIGINT) AS cb
      FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb FROM c)
    SELECT t.na, t.nb,
           CAST(count(*) AS BIGINT) AS n_langs,
           CASE WHEN t.na > 0 AND t.nb > 0 THEN round(sum(
             0.5 * (CASE WHEN c.ca > 0 THEN
               (CAST(c.ca AS DOUBLE) / greatest(t.na, 1))
               * log2(2.0 * (CAST(c.ca AS DOUBLE) / greatest(t.na, 1))
                      / (CAST(c.ca AS DOUBLE) / greatest(t.na, 1)
                         + CAST(c.cb AS DOUBLE) / greatest(t.nb, 1)))
               ELSE 0 END)
             + 0.5 * (CASE WHEN c.cb > 0 THEN
               (CAST(c.cb AS DOUBLE) / greatest(t.nb, 1))
               * log2(2.0 * (CAST(c.cb AS DOUBLE) / greatest(t.nb, 1))
                      / (CAST(c.ca AS DOUBLE) / greatest(t.na, 1)
                         + CAST(c.cb AS DOUBLE) / greatest(t.nb, 1)))
               ELSE 0 END)
           ), 6) END AS js_div
    FROM c, t
    GROUP BY t.na, t.nb
    """,
)
def js_divergence_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence (log2, so bounded in [0,1]) between
    the language mixes of the even- and odd-doc_id corpus halves — the
    symmetric, finite distribution-distance used to compare two crawl
    snapshots or two shards before mixing them into one training set
    (feature_psi's bounded cousin; KL alone blows up on zero bins).
    Zero-count bins contribute exactly their defined 0 limit on their
    own side. Per-lang terms are identical float expressions over
    exact integer counts in both engines; only the <=n_langs-term sum
    is float, rounded to 6 dp like the entropy family.

    Scale shape: one map-side-combinable (lang)-keyed count agg; the
    divergence folds the lang histogram (vocabulary-sized, not
    corpus-sized) with totals on a 1-row broadcast."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("doc_id") % 2 == 0, 0).otherwise(1))
        .cast("bigint")
        .alias("cb"),
    )
    t = c.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    # greatest(n,1) denominators: if a half is empty its per-lang
    # counts are all 0, so the value is unchanged — but ANSI mode
    # would throw on the 0-divisor INSIDE the sum before the outer
    # guard could skip it (the guard still NULLs the result)
    p = F.col("ca").cast("double") / F.greatest(F.col("na"), F.lit(1))
    q = F.col("cb").cast("double") / F.greatest(F.col("nb"), F.lit(1))
    term = 0.5 * F.when(
        F.col("ca") > 0, p * F.log2(2.0 * p / (p + q))
    ).otherwise(0.0) + 0.5 * F.when(
        F.col("cb") > 0, q * F.log2(2.0 * q / (p + q))
    ).otherwise(0.0)
    return (
        c.crossJoin(F.broadcast(t))
        .groupBy("na", "nb")
        .agg(
            F.count("*").cast("bigint").alias("n_langs"),
            # empty-half guard decided before the per-term divisions
            # land (Spark 0/0 is NULL, DuckDB NaN)
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.round(F.sum(term), 6),
            ).alias("js_div"),
        )
    )


@query(
    "adamic_adar_top",
    f"""
    WITH {_LINKGRAPH_SQL_CTES},
    deg AS (SELECT v, count(*) AS degree FROM sym GROUP BY 1),
    wedge AS (
      SELECT s1.v AS ctr, s1.w AS u, s2.w AS w2
      FROM sym s1 JOIN sym s2 ON s2.v = s1.v AND s1.w < s2.w
    ),
    cand AS (
      SELECT w.u, w.w2,
             CAST(count(*) AS BIGINT) AS n_common,
             CAST(sum(CAST(round(1000000.0 / ln(d.degree)) AS BIGINT))
               AS BIGINT) AS aa_micro
      FROM wedge w JOIN deg d ON d.v = w.ctr
      GROUP BY 1, 2
    )
    SELECT c.u AS doc_a, c.w2 AS doc_b, c.n_common, c.aa_micro,
           round(c.aa_micro / 1000000.0, 6) AS aa_score
    FROM cand c
    LEFT JOIN edges e ON e.a = c.u AND e.b = c.w2
    WHERE e.a IS NULL
    ORDER BY c.aa_micro DESC, c.u, c.w2
    LIMIT 20
    """,
)
def adamic_adar_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction: top-20 non-adjacent pairs scored
    by sum(1/ln(degree)) over their common neighbors — the
    degree-discounted upgrade of link_prediction_common_neighbors (a
    shared hub says little; a shared degree-2 page says a lot). Wedge
    centers always have degree >= 2, so ln(degree) >= ln 2 and the
    term is finite. Deterministic top-k: each center's 1/ln(degree)
    weight is quantized to INTEGER micro-units (round(1e6/ln(d)) — a
    per-distinct-degree constant, not an accumulation), so the summed
    score and the sort key are exact integers in both engines
    regardless of partial-agg addition order, ties broken by
    (doc_a, doc_b); aa_score is one division of identical integers
    (review finding, session 9: a float-sum sort key near the rank-20
    boundary could cut different row sets per engine/run).

    Scale shape: the same sigma-deg^2-bounded wedge self-join as the
    common-neighbor query, one broadcast-sized degree join on the
    center, map-side-combinable (u, w2) fold, anti-join against
    edges, TakeOrderedAndProject top-20. Hub-degree caps bound the
    wedge count at 100 TB exactly as documented there."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("w")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
    deg = sym.groupBy("v").agg(F.count("*").alias("degree"))
    s2 = sym.select(F.col("v").alias("v2"), F.col("w").alias("w2"))
    wedge = sym.join(
        s2, (F.col("v2") == F.col("v")) & (F.col("w") < F.col("w2"))
    ).select(F.col("v").alias("ctr"), F.col("w").alias("u"), "w2")
    cand = (
        wedge.join(deg, deg.v == F.col("ctr"))
        .groupBy("u", "w2")
        .agg(
            F.count("*").cast("bigint").alias("n_common"),
            F.sum(
                F.round(
                    1000000.0 / F.log(F.col("degree").cast("double"))
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("aa_micro"),
        )
    )
    return (
        cand.join(
            edges, (edges.a == cand.u) & (edges.b == cand.w2), "left_anti"
        )
        .select(
            F.col("u").alias("doc_a"),
            F.col("w2").alias("doc_b"),
            "n_common",
            "aa_micro",
            F.round(F.col("aa_micro") / 1000000.0, 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_micro"), "doc_a", "doc_b")
        .limit(20)
    )


@query(
    "precision_recall_sweep",
    """
    WITH m AS (
      SELECT CAST(max(n_chars) // 8 AS BIGINT) AS step FROM documents
    ),
    grid AS (
      SELECT CAST(k * m.step AS BIGINT) AS threshold
      FROM m, generate_series(1, 8) AS gs(k)
    ),
    lab AS (
      SELECT n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    )
    SELECT g.threshold,
           CAST(sum(CASE WHEN lab.score >= g.threshold AND lab.y = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN lab.score >= g.threshold AND lab.y = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN lab.score < g.threshold AND lab.y = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           round(sum(CASE WHEN lab.score >= g.threshold AND lab.y = 1
                          THEN 1 ELSE 0 END)
                 / greatest(CAST(sum(CASE WHEN lab.score >= g.threshold
                                          THEN 1 ELSE 0 END) AS DOUBLE),
                            1.0), 6) AS precision,
           round(sum(CASE WHEN lab.score >= g.threshold AND lab.y = 1
                          THEN 1 ELSE 0 END)
                 / greatest(CAST(sum(CASE WHEN lab.y = 1
                                          THEN 1 ELSE 0 END) AS DOUBLE),
                            1.0), 6) AS recall
    FROM grid g, lab
    GROUP BY 1
    """,
)
def precision_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall at 8 evenly spaced thresholds over the same
    score/label pair as score_auc (n_chars predicting lang='en') — the
    operating-point sweep read AFTER the AUC says the score has
    signal, to pick the threshold a production filter will actually
    run. The grid is integer (k * max//8), counts are exact integers,
    and precision/recall are single divisions of identical integers
    (greatest(..,1) guards the empty-side limit identically in both
    engines).

    Scale shape: the naive form is an 8x cross join; this one stays
    because the grid is a CONSTANT 8 rows broadcast against the
    row-level fold — one pass over the table, map-side combinable to
    8 groups. A per-distinct-score histogram + window (as in
    score_auc) is the move if the grid ever grows to thousands of
    thresholds."""
    docs = load(spark, sf_dir, "documents")
    m = docs.agg(
        (F.max("n_chars") / 8).cast("bigint").alias("step")
    )
    grid = m.select(
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("k"), "step"
    ).select((F.col("k") * F.col("step")).cast("bigint").alias("threshold"))
    lab = docs.select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    hit = F.col("score") >= F.col("threshold")
    j = lab.crossJoin(F.broadcast(grid))
    tp = F.sum(F.when(hit & (F.col("y") == 1), 1).otherwise(0))
    fp = F.sum(F.when(hit & (F.col("y") == 0), 1).otherwise(0))
    fn = F.sum(F.when((~hit) & (F.col("y") == 1), 1).otherwise(0))
    pred_pos = F.sum(F.when(hit, 1).otherwise(0))
    pos = F.sum(F.col("y"))
    return j.groupBy("threshold").agg(
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        F.round(
            tp / F.greatest(pred_pos.cast("double"), F.lit(1.0)), 6
        ).alias("precision"),
        F.round(
            tp / F.greatest(pos.cast("double"), F.lit(1.0)), 6
        ).alias("recall"),
    )


@query(
    "cohens_kappa_langid",
    """
    WITH p AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> list_contains(string_split('the a of and to in is for on with', ' '), w)))
                  AS DOUBLE)
                / greatest(len(string_split(text, ' ')), 1) >= 0.05
                THEN 1 ELSE 0 END AS yhat
      FROM documents
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y * yhat) AS BIGINT) AS tp,
             CAST(sum((1 - y) * (1 - yhat)) AS BIGINT) AS tn,
             CAST(sum(y) AS BIGINT) AS pos_true,
             CAST(sum(yhat) AS BIGINT) AS pos_pred
      FROM p
    )
    SELECT n, tp, tn,
           CASE WHEN n * n - (pos_true * pos_pred
                              + (n - pos_true) * (n - pos_pred)) <> 0
                THEN round((n * (tp + tn)
                            - (pos_true * pos_pred
                               + (n - pos_true) * (n - pos_pred)))
                           / CAST(n * n - (pos_true * pos_pred
                                           + (n - pos_true) * (n - pos_pred))
                                  AS DOUBLE), 6)
           END AS kappa
    FROM c
    """,
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the langid heuristic's en/not-en call and
    the tagged label — chance-corrected agreement, the single scalar
    that says whether langid_confusion's diagonal beats the base rate
    (raw accuracy flatters any classifier on an imbalanced corpus).
    Clearing the fractions gives kappa = (n*(tp+tn) - E) / (n^2 - E)
    with E = pos_true*pos_pred + neg_true*neg_pred — numerator and
    denominator are exact integers, one guarded division ships (the
    denominator is 0 only when either rater is constant, where kappa
    is undefined — NULL in both engines).

    Scale shape: the same pure-JVM predict expression as text_langid
    folded map-side to five integers; nothing scales past one row."""
    pred = text_langid(spark, sf_dir)
    p = pred.select(
        F.when(F.col("tagged_lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("detected_lang") == "en", 1).otherwise(0).alias("yhat"),
    )
    c = p.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("tp"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("bigint")
        .alias("tn"),
        F.sum("y").cast("bigint").alias("pos_true"),
        F.sum("yhat").cast("bigint").alias("pos_pred"),
    )
    e = F.col("pos_true") * F.col("pos_pred") + (
        F.col("n") - F.col("pos_true")
    ) * (F.col("n") - F.col("pos_pred"))
    den = F.col("n") * F.col("n") - e
    num = F.col("n") * (F.col("tp") + F.col("tn")) - e
    return c.select(
        "n",
        "tp",
        "tn",
        F.when(den != 0, F.round(num / den.cast("double"), 6)).alias(
            "kappa"
        ),
    )


@query(
    "mann_kendall_trend",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(coalesce(sum(CASE WHEN d2.rev > d1.rev THEN 1
                                    WHEN d2.rev < d1.rev THEN -1
                                    ELSE 0 END), 0)
               AS BIGINT) AS s_stat
      FROM d d1 JOIN d d2 ON d1.day < d2.day
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT count(*) AS t FROM d GROUP BY rev HAVING count(*) > 1)
    )
    SELECT n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie_term AS BIGINT) AS var18,
           CASE WHEN n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                     - ties.tie_term > 0
                THEN round((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                                 WHEN s.s_stat < 0 THEN s.s_stat + 1
                                 ELSE 0 END)
                           / sqrt((n.n_days * (n.n_days - 1)
                                   * (2 * n.n_days + 5) - ties.tie_term)
                                  / 18.0), 6)
           END AS z_score
    FROM n, s, ties
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily-revenue series —
    the nonparametric "is this drifting?" gate for dashboards and
    crawl-volume monitors (no normality or linearity assumed, unlike
    a regression slope). S = sum of pairwise signs and the
    tie-corrected 18*Var(S) are exact integers; the continuity-
    corrected z is one guarded double expression over them (NULL when
    the variance degenerates: n < 2 or all days equal).

    Scale shape: rows fold to the CALENDAR-sized daily frame first
    (map-side combinable); the pairwise self-join is days^2, bounded
    by the date range — never row count (the classic O(n log n)
    inversion-count rewrite applies if the calendar ever gets big).
    Tie groups fold the same small frame."""
    orders = load(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    d2 = d.select(F.col("day").alias("day2"), F.col("rev").alias("rev2"))
    s = d.join(d2, F.col("day") < F.col("day2")).agg(
        F.coalesce(
            F.sum(
                F.when(F.col("rev2") > F.col("rev"), 1)
                .when(F.col("rev2") < F.col("rev"), -1)
                .otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = d.agg(F.count("*").cast("bigint").alias("n_days"))
    t = F.col("t")
    ties = (
        d.groupBy("rev")
        .agg(F.count("*").alias("t"))
        .filter(t > 1)
        .agg(
            F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0))
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    s_adj = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return (
        n.crossJoin(s)
        .crossJoin(ties)
        .select(
            "n_days",
            "s_stat",
            var18.cast("bigint").alias("var18"),
            F.when(
                var18 > 0,
                F.round(s_adj / F.sqrt(var18 / 18.0), 6),
            ).alias("z_score"),
        )
    )


@query(
    "cramers_v_type_dow",
    """
    WITH o AS (
      SELECT event_type,
             (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
          FROM o GROUP BY 1),
    c AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
                 CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows,
                 CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cols
          FROM o)
    SELECT t.n, t.n_rows, t.n_cols,
           CASE WHEN least(t.n_rows, t.n_cols) > 1 AND t.n > 0
                THEN round(sqrt(greatest(
                       t.n * (sum(CAST(o.obs AS DOUBLE) * o.obs
                                  / (r.rt * c.ct)) - 1.0), 0.0)
                     / (CAST(t.n AS DOUBLE)
                        * (least(t.n_rows, t.n_cols) - 1))), 6)
           END AS cramers_v
    FROM o JOIN r USING (event_type) JOIN c USING (dow), t
    GROUP BY t.n, t.n_rows, t.n_cols
    """,
)
def cramers_v_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between event type and day-of-week — the bounded
    [0,1] effect size behind user_mix_outliers' chi-square cells (a
    significant chi-square on big n can still be a negligible
    association; V is what you compare across table sizes). Uses the
    identity chi2 = n*(sum obs^2/(row*col) - 1), so each cell ships
    one float term over exact integers; V is one guarded sqrt (NULL
    on a degenerate 1xK table, max(..,0) clamps the -1e-16 float
    residue of an exactly-independent table).

    Scale shape: rows fold once to the types x 7 contingency cells;
    margins and totals fold that same small frame — the only
    row-count-sized work is the first map-side-combined agg. dow
    uses the repo's portable epoch-day + 4 mod 7 convention (V is
    label-permutation-invariant, but the shared convention keeps the
    contingency partition byte-identical across engines)."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    o = ev.groupBy(
        "event_type",
        (((ems / F.lit(86400000)).cast("bigint") + 4) % 7).alias("dow"),
    ).agg(F.count("*").cast("bigint").alias("obs"))
    r = o.groupBy("event_type").agg(
        F.sum("obs").cast("bigint").alias("rt")
    )
    c = o.groupBy("dow").agg(F.sum("obs").cast("bigint").alias("ct"))
    t = o.agg(
        F.sum("obs").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("n_rows"),
        F.countDistinct("dow").cast("bigint").alias("n_cols"),
    )
    term = F.col("obs").cast("double") * F.col("obs") / (
        F.col("rt") * F.col("ct")
    )
    k = F.least(F.col("n_rows"), F.col("n_cols"))
    chi2 = F.col("n") * (F.sum(term) - 1.0)
    return (
        o.join(r, "event_type")
        .join(c, "dow")
        .crossJoin(F.broadcast(t))
        .groupBy("n", "n_rows", "n_cols")
        .agg(
            F.when(
                (k > 1) & (F.col("n") > 0),
                F.round(
                    F.sqrt(
                        F.greatest(chi2, F.lit(0.0))
                        / (F.col("n").cast("double") * (k - 1))
                    ),
                    6,
                ),
            ).alias("cramers_v")
        )
        .select("n", "n_rows", "n_cols", "cramers_v")
    )


@query(
    "theils_u_type_dow",
    """
    WITH o AS (
      SELECT event_type,
             (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
          FROM o GROUP BY 1),
    c AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    hx AS (
      SELECT sum(-(CAST(rt AS DOUBLE) / t.n)
                 * log2(CAST(rt AS DOUBLE) / t.n)) AS h_x
      FROM r, t
    ),
    mi AS (
      SELECT sum((CAST(o.obs AS DOUBLE) / t.n)
                 * log2(CAST(o.obs AS DOUBLE) * t.n
                        / (r.rt * CAST(c.ct AS DOUBLE)))) AS mi
      FROM o JOIN r USING (event_type) JOIN c USING (dow), t
    )
    SELECT t.n, round(hx.h_x, 6) AS h_type,
           CASE WHEN hx.h_x > 0
                THEN round(greatest(mi.mi, 0) / hx.h_x, 6)
           END AS theils_u
    FROM t, hx, mi
    """,
)
def theils_u_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(event_type | dow) — the
    NORMALIZED, asymmetric companion of cramers_v_type_dow: what
    fraction of the event-type entropy does knowing the weekday
    remove (U = I(X;Y)/H(X), bounded [0,1], comparable across
    tables where raw mutual information is not). H(X) and I fold
    the same contingency frame as Cramér's V; the only division is
    guarded by H(X) > 0 (a single event type has zero entropy and
    U is undefined — NULL in both engines); max(mi, 0) clamps the
    -1e-16 float residue of exact independence.

    Scale shape: one map-side-combinable agg to the types x 7 cells;
    margins, H, and I fold that same small frame — identical to
    cramers_v_type_dow's shape."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    o = ev.groupBy(
        "event_type",
        (((ems / F.lit(86400000)).cast("bigint") + 4) % 7).alias("dow"),
    ).agg(F.count("*").cast("bigint").alias("obs"))
    r = o.groupBy("event_type").agg(
        F.sum("obs").cast("bigint").alias("rt")
    )
    c = o.groupBy("dow").agg(F.sum("obs").cast("bigint").alias("ct"))
    t = o.agg(F.sum("obs").cast("bigint").alias("n"))
    p_r = F.col("rt").cast("double") / F.col("n")
    hx = r.crossJoin(F.broadcast(t)).agg(
        F.sum(-p_r * F.log2(p_r)).alias("h_x")
    )
    mi_term = (F.col("obs").cast("double") / F.col("n")) * F.log2(
        F.col("obs").cast("double")
        * F.col("n")
        / (F.col("rt") * F.col("ct").cast("double"))
    )
    mi = (
        o.join(r, "event_type")
        .join(c, "dow")
        .crossJoin(F.broadcast(t))
        .agg(F.sum(mi_term).alias("mi"))
    )
    return (
        t.crossJoin(hx)
        .crossJoin(mi)
        .select(
            "n",
            F.round(F.col("h_x"), 6).alias("h_type"),
            F.when(
                F.col("h_x") > 0,
                F.round(
                    F.greatest(F.col("mi"), F.lit(0.0)) / F.col("h_x"), 6
                ),
            ).alias("theils_u"),
        )
    )


@query(
    "mcnemar_langid",
    """
    WITH p AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> list_contains(string_split('the a of and to in is for on with', ' '), w)))
                  AS DOUBLE)
                / greatest(len(string_split(text, ' ')), 1) >= 0.05
                THEN 1 ELSE 0 END AS yhat
      FROM documents
    ),
    d AS (
      SELECT CAST(sum(y * (1 - yhat)) AS BIGINT) AS b,
             CAST(sum((1 - y) * yhat) AS BIGINT) AS c
      FROM p
    )
    SELECT b, c,
           CASE WHEN b + c > 0
                THEN round(CAST(greatest(abs(b - c) - 1, 0)
                                * greatest(abs(b - c) - 1, 0) AS DOUBLE)
                           / (b + c), 6)
           END AS chi2_cc
    FROM d
    """,
)
def mcnemar_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the langid heuristic vs the tagged label —
    the paired-rater DISAGREEMENT test that kappa can't give (kappa
    measures agreement level; McNemar asks whether the two error
    directions b = misses and c = false alarms are symmetric, i.e.
    whether the heuristic is biased toward one direction). Edwards
    continuity-corrected chi2 = (|b-c|-1)^2/(b+c) over two exact
    integer discordant counts, the correction clamped at 0 so b = c
    reads as exactly no asymmetry; NULL when there are no discordant
    pairs (the statistic is undefined, not zero).

    Scale shape: the same one-pass fold as cohens_kappa_langid — two
    map-side-combined integers, one guarded division on one row."""
    pred = text_langid(spark, sf_dir)
    p = pred.select(
        F.when(F.col("tagged_lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("detected_lang") == "en", 1).otherwise(0).alias("yhat"),
    )
    d = p.agg(
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("c"),
    )
    diff = F.greatest(F.abs(F.col("b") - F.col("c")) - 1, F.lit(0))
    return d.select(
        "b",
        "c",
        F.when(
            F.col("b") + F.col("c") > 0,
            F.round(
                (diff * diff).cast("double") / (F.col("b") + F.col("c")), 6
            ),
        ).alias("chi2_cc"),
    )


@query(
    "runs_test_revenue",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    m AS (SELECT median(rev) AS med FROM d),
    s AS (
      SELECT day, CASE WHEN rev > m.med THEN 1 ELSE 0 END AS sgn
      FROM d, m WHERE CAST(rev AS DOUBLE) <> m.med
    ),
    r AS (
      SELECT CAST(count(*) AS BIGINT) AS n_obs,
             CAST(coalesce(sum(sgn), 0) AS BIGINT) AS n1,
             CAST(CASE WHEN count(*) = 0 THEN 0
                       ELSE 1 + coalesce(sum(CASE WHEN sgn <> prev
                                              THEN 1 ELSE 0 END), 0)
                  END AS BIGINT) AS runs
      FROM (SELECT sgn, lag(sgn) OVER (ORDER BY day) AS prev FROM s)
    )
    SELECT n_obs, n1, CAST(n_obs - n1 AS BIGINT) AS n2, runs,
           CASE WHEN n1 > 0 AND n_obs - n1 > 0
                     AND 2 * n1 * (n_obs - n1)
                         * (2 * n1 * (n_obs - n1) - n_obs) > 0
                THEN round((runs - (2.0 * n1 * (n_obs - n1) / n_obs + 1))
                           / sqrt(2.0 * n1 * (n_obs - n1)
                                  * (2 * n1 * (n_obs - n1) - n_obs)
                                  / (CAST(n_obs AS DOUBLE) * n_obs
                                     * (n_obs - 1))), 6)
           END AS z_score
    FROM r
    """,
)
def runs_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue vs its median — the
    randomness gate that complements mann_kendall_trend (MK detects
    monotone drift; the runs test detects ANY serial structure:
    clustering of high/low days reads as too-few runs, alternation
    as too-many). Median-equal days drop (standard dichotomization),
    n1/n2/R are exact integers over the day-ordered sign sequence
    (one lag window on the calendar-sized frame), z one guarded
    double (NULL when either side is empty or Var(R)'s integer
    numerator 2*n1*n2*(2*n1*n2 - n) degenerates, e.g. n1 = n2 = 1).
    Both engines interpolate the even-n median as the midpoint of the
    two central BIGINTs — exactly representable, so the > cut and the
    <> drop agree bitwise.

    Scale shape: rows fold map-side to the calendar frame; the global
    order window runs on days, never row count."""
    orders = load(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    m = d.agg(F.expr("percentile(rev, 0.5)").alias("med"))
    s = (
        d.crossJoin(F.broadcast(m))
        .filter(F.col("rev").cast("double") != F.col("med"))
        .select(
            "day",
            F.when(F.col("rev") > F.col("med"), 1).otherwise(0).alias("sgn"),
        )
    )
    w = Window.orderBy("day")
    seq = s.select("sgn", F.lag("sgn").over(w).alias("prev"))
    r = seq.agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.coalesce(F.sum("sgn"), F.lit(0)).cast("bigint").alias("n1"),
        F.when(F.count("*") == 0, F.lit(0))
        .otherwise(
            1
            + F.coalesce(
                F.sum(F.when(F.col("sgn") != F.col("prev"), 1).otherwise(0)),
                F.lit(0),
            )
        )
        .cast("bigint")
        .alias("runs"),
    )
    n1 = F.col("n1")
    n2 = F.col("n_obs") - n1
    var_num = 2 * n1 * n2 * (2 * n1 * n2 - F.col("n_obs"))
    mu = 2.0 * n1 * n2 / F.col("n_obs") + 1
    sigma = F.sqrt(
        var_num
        / (
            F.col("n_obs").cast("double")
            * F.col("n_obs")
            * (F.col("n_obs") - 1)
        )
    )
    return r.select(
        "n_obs",
        "n1",
        n2.cast("bigint").alias("n2"),
        "runs",
        F.when(
            (n1 > 0) & (n2 > 0) & (var_num > 0),
            F.round((F.col("runs") - mu) / sigma, 6),
        ).alias("z_score"),
    )


@query(
    "kaplan_meier_repurchase",
    """
    WITH o2 AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    f AS (SELECT o_custkey, min(d) AS first_d FROM o2 GROUP BY 1),
    nxt AS (
      SELECT o2.o_custkey, min(o2.d) AS second_d
      FROM o2 JOIN f USING (o_custkey)
      WHERE o2.d > f.first_d GROUP BY 1
    ),
    mx AS (SELECT max(d) AS horizon FROM o2),
    durs AS (
      SELECT CASE WHEN nxt.second_d IS NOT NULL
                  THEN date_diff('day', f.first_d, nxt.second_d)
                  ELSE date_diff('day', f.first_d, mx.horizon) END AS dur,
             CASE WHEN nxt.second_d IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM f LEFT JOIN nxt USING (o_custkey), mx
    ),
    evs AS (SELECT dur AS t, CAST(count(*) AS BIGINT) AS d
            FROM durs WHERE ev = 1 GROUP BY 1),
    allc AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                    CAST(sum(ev) AS BIGINT) AS events_total FROM durs),
    h AS (SELECT dur, CAST(count(*) AS BIGINT) AS cnt
          FROM durs GROUP BY 1),
    cum AS (
      SELECT dur, coalesce(sum(cnt) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS c_lt
      FROM h
    ),
    km0 AS (
      SELECT evs.t, evs.d,
             allc.n_total - cum.c_lt AS n_risk
      FROM evs JOIN cum ON cum.dur = evs.t, allc
    ),
    km AS (
      SELECT t,
             CASE WHEN max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
                       OVER (ORDER BY t) = 1
                  THEN 0.0
                  ELSE exp(sum(CASE WHEN d < n_risk
                               THEN ln(1 - CAST(d AS DOUBLE) / n_risk)
                               ELSE 0.0 END) OVER (ORDER BY t))
             END AS s
      FROM km0
    )
    SELECT hz.hz, allc.n_total, allc.events_total,
           round(coalesce(min(km.s), 1.0), 6) AS survival
    FROM (VALUES (30), (60), (90)) hz(hz)
    LEFT JOIN km ON km.t <= hz.hz, allc
    GROUP BY hz.hz, allc.n_total, allc.events_total
    """,
)
def kaplan_meier_repurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of 'time to repeat purchase' (days from a
    customer's first order day to their next DISTINCT order day),
    right-censored at the dataset horizon for single-day customers —
    the censoring-correct answer to 'what fraction repurchase within
    30/60/90 days?' (a naive fraction undercounts: customers who
    appeared recently haven't HAD 90 days). d_t and the at-risk
    n_t = N - #(dur < t) are exact integers per distinct duration;
    S(t) folds as exp of the ordered cumulative sum of ln(1 - d/n)
    (deterministic order = one canonical float result in both
    engines), with an exact-integer flag forcing S = 0 from the first
    time d = n_risk so neither engine evaluates ln(0).

    Scale shape: rows fold to per-customer firsts/seconds (two
    map-side-combinable aggs + one self-join on o_custkey), then to
    the DISTINCT-duration frame (bounded by the calendar span, never
    customers); both windows run on that small frame. Horizons are a
    3-row VALUES broadcast."""
    orders = load(spark, sf_dir, "orders")
    o2 = orders.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    f = o2.groupBy("o_custkey").agg(F.min("d").alias("first_d"))
    nxt = (
        o2.join(f, "o_custkey")
        .filter(F.col("d") > F.col("first_d"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("second_d"))
    )
    mx = o2.agg(F.max("d").alias("horizon"))
    durs = (
        f.join(nxt, "o_custkey", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("second_d").isNotNull(),
                F.datediff(F.col("second_d"), F.col("first_d")),
            )
            .otherwise(F.datediff(F.col("horizon"), F.col("first_d")))
            .alias("dur"),
            F.when(F.col("second_d").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    evs = (
        durs.filter(F.col("ev") == 1)
        .groupBy(F.col("dur").alias("t"))
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    allc = durs.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum("ev").cast("bigint").alias("events_total"),
    )
    h = durs.groupBy("dur").agg(F.count("*").cast("bigint").alias("cnt"))
    w_lt = (
        Window.orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = h.select(
        "dur",
        F.coalesce(F.sum("cnt").over(w_lt), F.lit(0)).alias("c_lt"),
    )
    km0 = (
        evs.join(cum, evs.t == cum.dur)
        .crossJoin(F.broadcast(allc.select("n_total")))
        .select(
            "t", "d", (F.col("n_total") - F.col("c_lt")).alias("n_risk")
        )
    )
    w_t = Window.orderBy("t")
    zero_flag = F.max(
        F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_t)
    log_term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    km = km0.select(
        "t",
        F.when(zero_flag == 1, F.lit(0.0))
        .otherwise(F.exp(F.sum(log_term).over(w_t)))
        .alias("s"),
    )
    hz = spark.createDataFrame([(30,), (60,), (90,)], "hz int")
    return (
        hz.join(km, km.t <= hz.hz, "left")
        .groupBy("hz")
        .agg(F.round(F.coalesce(F.min("s"), F.lit(1.0)), 6).alias("survival"))
        .crossJoin(F.broadcast(allc))
        .select("hz", "n_total", "events_total", "survival")
    )


@query(
    "odds_ratio_langid",
    """
    WITH p AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
           CASE WHEN CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> list_contains(string_split('the a of and to in is for on with', ' '), w)))
                  AS DOUBLE)
                / greatest(len(string_split(text, ' ')), 1) >= 0.05
                THEN 1 ELSE 0 END AS yhat
      FROM documents
    ),
    c AS (
      SELECT CAST(sum(y * yhat) AS BIGINT) AS a,
             CAST(sum(y * (1 - yhat)) AS BIGINT) AS b,
             CAST(sum((1 - y) * yhat) AS BIGINT) AS c,
             CAST(sum((1 - y) * (1 - yhat)) AS BIGINT) AS d
      FROM p
    )
    SELECT a, b, c, d,
           CASE WHEN b * c > 0
                THEN round(CAST(a AS DOUBLE) * d / (b * c), 6)
           END AS odds_ratio,
           CASE WHEN a * b * c * d > 0
                THEN round(exp(ln(CAST(a AS DOUBLE) * d / (b * c))
                               - 1.959964 * sqrt(1.0/a + 1.0/b
                                                 + 1.0/c + 1.0/d)), 6)
           END AS ci_lo,
           CASE WHEN a * b * c * d > 0
                THEN round(exp(ln(CAST(a AS DOUBLE) * d / (b * c))
                               + 1.959964 * sqrt(1.0/a + 1.0/b
                                                 + 1.0/c + 1.0/d)), 6)
           END AS ci_hi
    FROM c
    """,
)
def odds_ratio_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagnostic odds ratio of the langid heuristic (ad/bc over the
    2x2 confusion cells) with the Woolf 95% log-normal CI — the
    effect-size-with-uncertainty read of the same table kappa and
    McNemar score (kappa: agreement level; McNemar: error-direction
    bias; OR: discriminative strength, CI: is it resolvable from this
    sample). Four exact map-side integers; OR guarded by bc > 0, the
    CI by all four cells > 0 (Woolf's variance 1/a+1/b+1/c+1/d needs
    every cell) — NULL in both engines otherwise.

    Scale shape: one map-side-combinable fold to four integers; every
    float step happens on the single result row."""
    pred = text_langid(spark, sf_dir)
    p = pred.select(
        F.when(F.col("tagged_lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("detected_lang") == "en", 1).otherwise(0).alias("yhat"),
    )
    cells = p.agg(
        F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("a"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("y")) * F.col("yhat")).cast("bigint").alias("c"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat")))
        .cast("bigint")
        .alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    or_ = a.cast("double") * d / (b * c)
    half = 1.959964 * F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    all_pos = a * b * c * d > 0
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.when(b * c > 0, F.round(or_, 6)).alias("odds_ratio"),
        F.when(all_pos, F.round(F.exp(F.log(or_) - half), 6)).alias("ci_lo"),
        F.when(all_pos, F.round(F.exp(F.log(or_) + half), 6)).alias("ci_hi"),
    )


@query(
    "turning_points_revenue",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    seq AS (
      SELECT rev,
             lag(rev) OVER (ORDER BY day) AS prv,
             lead(rev) OVER (ORDER BY day) AS nxt
      FROM d
    ),
    r AS (
      SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n,
             CAST(coalesce(sum(CASE WHEN (rev > prv AND rev > nxt)
                                      OR (rev < prv AND rev < nxt)
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS t_pts
      FROM seq WHERE prv IS NOT NULL AND nxt IS NOT NULL
    )
    SELECT n, t_pts,
           CASE WHEN n >= 3
                THEN round((t_pts - 2.0 * (n - 2) / 3)
                           / sqrt((16.0 * n - 29) / 90), 6)
           END AS z_score
    FROM r
    """,
)
def turning_points_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points randomness test on the daily revenue series —
    counts strict local maxima/minima; an i.i.d. series has
    E[T] = 2(n-2)/3, Var(T) = (16n-29)/90, so too few turns reads as
    smooth trend/cycles and too many as alternation (the third lens
    after mann_kendall's drift and runs_test's clustering; each is
    blind to what the others see). T is an exact integer from one
    lag/lead window over the calendar frame (strict inequalities:
    tied neighbors are not turns, identically in both engines); z is
    one guarded double (NULL when n < 3 means no interior point).

    Scale shape: map-side fold to the calendar frame, one
    days-bounded window, constants on the single result row."""
    orders = load(spark, sf_dir, "orders")
    d = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    w = Window.orderBy("day")
    seq = d.select(
        "rev",
        F.lag("rev").over(w).alias("prv"),
        F.lead("rev").over(w).alias("nxt"),
    )
    is_turn = (
        (F.col("rev") > F.col("prv")) & (F.col("rev") > F.col("nxt"))
    ) | ((F.col("rev") < F.col("prv")) & (F.col("rev") < F.col("nxt")))
    t_pts = (
        seq.filter(F.col("prv").isNotNull() & F.col("nxt").isNotNull())
        .agg(
            F.coalesce(
                F.sum(F.when(is_turn, 1).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("t_pts")
        )
    )
    n = d.agg(F.count("*").cast("bigint").alias("n"))
    nn = F.col("n")
    return (
        n.crossJoin(t_pts)
        .select(
            "n",
            "t_pts",
            F.when(
                nn >= 3,
                F.round(
                    (F.col("t_pts") - 2.0 * (nn - 2) / 3)
                    / F.sqrt((16.0 * nn - 29) / 90),
                    6,
                ),
            ).alias("z_score"),
        )
    )


@query(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    tf AS (
      SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4)
               AS tfidf
      FROM tf JOIN df USING (word), n
    )
    SELECT doc_id, word, tfidf, rnk FROM (
      SELECT doc_id, word, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by tf-idf — the classic keyword
    extractor BM25 doesn't give (bm25_search ranks DOCS for a fixed
    query; this ranks TERMS per doc over the whole vocabulary, the
    'what is this page about' column a crawl dashboard shows). House
    float discipline (the bm25 move): score rounded to 4 decimals
    BEFORE ranking, word-asc tiebreak, so the top-3 cut is identical
    in both engines even where ln() differs in the last ulp.

    Scale shape: one tokenize-explode pass folds to the (doc, word)
    tf frame map-side; df folds that to the vocabulary-sized frame
    (broadcastable — at web scale join tf back via broadcast, it is
    the classic two-shuffle TF-IDF); the top-3 window partitions by
    doc_id, so no global sort anywhere."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("word")
    )
    tf = tok.groupBy("doc_id", "word").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df = tf.groupBy("word").agg(F.count("*").cast("bigint").alias("df"))
    n = docs.agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.join(df, "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                4,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "word", "tfidf", "rnk")
    )


@query(
    "lorenz_revenue_deciles",
    """
    WITH c AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT rev, ntile(10) OVER (ORDER BY rev, o_custkey) AS decile
      FROM c
    ),
    g AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS customers,
             CAST(sum(rev) AS BIGINT) AS revenue_cents
      FROM d GROUP BY 1
    ),
    t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS total FROM g)
    SELECT decile, customers, revenue_cents,
           CASE WHEN t.total <> 0
                THEN round(CAST(sum(revenue_cents)
                                OVER (ORDER BY decile) AS DOUBLE)
                           / t.total, 6)
           END AS cum_share
    FROM g, t
    """,
)
def lorenz_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of customer revenue by decile — the
    curve POINTS behind the scalar Gini already in the set (how much
    of total revenue do the bottom k/10 of customers hold; the
    top-decile row is the '10% of customers are X% of revenue'
    dashboard line). Deciles assigned by ntile over the total order
    (rev, custkey) — both engines give the first n mod 10 buckets one
    extra row, so bucket boundaries are byte-identical; revenue in
    exact integer cents; the only float is the final guarded share.

    Scale shape: rows fold map-side to the customer frame; ntile is
    the one global sort (rank-partition by range at cluster scale);
    the decile rollup and cumulative window run on 10 rows."""
    orders = load(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    d = c.select(
        "rev",
        F.ntile(10).over(Window.orderBy("rev", "o_custkey")).alias("decile"),
    )
    g = d.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("customers"),
        F.sum("rev").cast("bigint").alias("revenue_cents"),
    )
    t = g.agg(F.sum("revenue_cents").cast("bigint").alias("total"))
    w = Window.orderBy("decile")
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "customers",
            "revenue_cents",
            F.when(
                F.col("total") != 0,
                F.round(
                    F.sum("revenue_cents").over(w).cast("double")
                    / F.col("total"),
                    6,
                ),
            ).alias("cum_share"),
        )
    )


@query(
    "quantile_histogram_sketch",
    """
    WITH v AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    s AS (
      SELECT event_type, min(c) AS min_c, max(c) AS max_c,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY 1
    ),
    b AS (
      SELECT v.event_type,
             CAST(((v.c - s.min_c) * 64) // (s.max_c - s.min_c + 1)
               AS BIGINT) AS bucket
      FROM v JOIN s USING (event_type)
    ),
    h AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bucket,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
               AS BIGINT) AS cum
      FROM h
    ),
    q AS (
      SELECT s.event_type, CAST(t.q_pct AS BIGINT) AS q_pct, s.n,
             s.min_c, s.max_c,
             CAST((s.n * t.q_pct + 99) // 100 AS BIGINT) AS k
      FROM s, (VALUES (50), (90), (99)) AS t(q_pct)
    ),
    pick AS (
      SELECT q.event_type, q.q_pct, q.n, q.k, q.min_c, q.max_c,
             CAST(min(cum.bucket) AS BIGINT) AS bucket
      FROM q JOIN cum ON cum.event_type = q.event_type AND cum.cum >= q.k
      GROUP BY 1, 2, 3, 4, 5, 6
    ),
    exact AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY c) AS rk
      FROM v
    )
    SELECT p.event_type, p.q_pct, p.n, p.k, p.bucket,
           CAST(p.min_c + (p.bucket * (p.max_c - p.min_c + 1) + 63) // 64
             AS BIGINT) AS bucket_lo_cents,
           CAST(p.min_c
                + ((p.bucket + 1) * (p.max_c - p.min_c + 1) - 1) // 64
             AS BIGINT) AS bucket_hi_cents,
           e.c AS exact_cents,
           e.c BETWEEN
             p.min_c + (p.bucket * (p.max_c - p.min_c + 1) + 63) // 64
             AND p.min_c
                 + ((p.bucket + 1) * (p.max_c - p.min_c + 1) - 1) // 64
             AS sketch_contains_exact
    FROM pick p
    JOIN exact e ON e.event_type = p.event_type AND e.rk = p.k
    """,
)
def quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width quantile histogram — the QUANTILE member of
    the sketch family (HLL cardinality, count-min frequency, KMV
    distinct, Misra-Gries heavy hitters): per event_type, a 64-bucket
    integer-cents histogram locates p50/p90/p99 to within one bucket,
    and the query surfaces the sketch's guarantee as a column —
    ``sketch_contains_exact`` compares against the true order statistic
    and must be TRUE on every row (the k-th smallest value lives in the
    first bucket whose cumulative count reaches k, by construction).

    Everything that decides anything is integer: cents, bucket ids via
    a floored non-negative division (operands bounded far below the
    2^53 exactness cliff, per the repo's bucket discipline), rank
    targets k = ceil(q·n) in pure integer form, bucket edges by the
    exact ceil/floor identities. row_number tie order is irrelevant —
    the value at rank k is the order statistic whatever the tie
    permutation.

    Scale shape: the histogram is ONE map-side-combinable fold to
    ≤ 64·|types| cells after a min/max/count fold — the 100-TB path
    (and the sketch is mergeable: per-shard histograms add cell-wise,
    exactly like the HLL register max — so at cluster scale the exact-
    rank join below is replaced by reading the quantile straight off
    the merged histogram). The exact order statistic is the small-SF
    verification twin: it needs the full sort the sketch exists to
    avoid, so it is the oracle-side check, not the scale path."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    s = ev.groupBy("event_type").agg(
        F.min("c").alias("min_c"),
        F.max("c").alias("max_c"),
        F.count("*").cast("bigint").alias("n"),
    )
    rng = F.col("max_c") - F.col("min_c") + F.lit(1)
    b = ev.join(F.broadcast(s), "event_type").select(
        "event_type",
        F.floor(((F.col("c") - F.col("min_c")) * 64) / rng)
        .cast("bigint")
        .alias("bucket"),
    )
    h = b.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    wc = Window.partitionBy("event_type").orderBy("bucket")
    cum = h.select(
        "event_type",
        "bucket",
        F.sum("cnt").over(wc).cast("bigint").alias("cum"),
    )
    q = s.crossJoin(
        spark.range(1).select(
            F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias(
                "q_pct"
            )
        )
    ).select(
        "event_type",
        F.col("q_pct").cast("bigint"),
        "n",
        "min_c",
        "max_c",
        F.floor((F.col("n") * F.col("q_pct") + 99) / 100)
        .cast("bigint")
        .alias("k"),
    )
    pick = (
        q.join(cum, "event_type")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("event_type", "q_pct", "n", "k", "min_c", "max_c")
        .agg(F.min("bucket").cast("bigint").alias("bucket"))
    )
    wr = Window.partitionBy("event_type").orderBy("c")
    exact = ev.select(
        "event_type", "c", F.row_number().over(wr).alias("rk")
    )
    lo = F.col("min_c") + F.floor(
        (F.col("bucket") * rng + 63) / F.lit(64)
    ).cast("bigint")
    hi = F.col("min_c") + F.floor(
        ((F.col("bucket") + 1) * rng - 1) / F.lit(64)
    ).cast("bigint")
    return (
        pick.join(
            exact,
            (pick.event_type == exact.event_type) & (pick.k == exact.rk),
        )
        .drop(exact.event_type)
        .select(
            "event_type",
            "q_pct",
            "n",
            "k",
            "bucket",
            lo.alias("bucket_lo_cents"),
            hi.alias("bucket_hi_cents"),
            F.col("c").alias("exact_cents"),
            F.col("c").between(lo, hi).alias("sketch_contains_exact"),
        )
    )


@query(
    "quantile_histogram_merge",
    """
    WITH v AS (
      SELECT event_type, event_id % 2 AS shard,
             CAST(round(value * 100) AS BIGINT) AS c
      FROM events
    ),
    s AS (
      SELECT event_type, min(c) AS min_c, max(c) AS max_c
      FROM v GROUP BY 1
    ),
    b AS (
      SELECT v.event_type, v.shard,
             CAST(((v.c - s.min_c) * 64) // (s.max_c - s.min_c + 1)
               AS BIGINT) AS bucket
      FROM v JOIN s USING (event_type)
    ),
    direct AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2
    ),
    per_shard AS (
      SELECT event_type, shard, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM b GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT event_type, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
      FROM per_shard GROUP BY 1, 2
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN d.cnt = m.cnt THEN 1 ELSE 0 END)
             AS BIGINT) AS n_matching
    FROM direct d
    JOIN merged m ON m.event_type = d.event_type AND m.bucket = d.bucket
    GROUP BY 1
    """,
)
def quantile_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram MERGEABILITY pinned as a query (the K6 hll_union_merge
    pattern): per-shard (event_id % 2) histograms folded cell-wise must
    equal the direct whole-table histogram — n_matching == n_cells on
    every row. This is the property that makes
    quantile_histogram_sketch a 100-TB operator: per-executor/day
    histograms ADD, so quantiles of an arbitrary union of shards come
    off a sum of ≤ 64·|types| cells with no re-scan. Bucket edges come
    from the globally-folded min/max (min/max are themselves mergeable
    folds — the real two-pass shape)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 2).alias("shard"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    s = ev.groupBy("event_type").agg(
        F.min("c").alias("min_c"), F.max("c").alias("max_c")
    )
    rng = F.col("max_c") - F.col("min_c") + F.lit(1)
    b = ev.join(F.broadcast(s), "event_type").select(
        "event_type",
        "shard",
        F.floor(((F.col("c") - F.col("min_c")) * 64) / rng)
        .cast("bigint")
        .alias("bucket"),
    )
    direct = b.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    merged = (
        b.groupBy("event_type", "shard", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .groupBy("event_type", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return (
        direct.alias("d")
        .join(
            merged.alias("m"),
            (F.col("d.event_type") == F.col("m.event_type"))
            & (F.col("d.bucket") == F.col("m.bucket")),
        )
        .groupBy(F.col("d.event_type").alias("event_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(
                F.when(F.col("d.cnt") == F.col("m.cnt"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_matching"),
        )
    )


@query(
    "kmv_set_ops",
    """
    WITH a AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events WHERE event_type = 'purchase'
    ),
    sa AS (SELECT hv FROM a ORDER BY hv LIMIT 16),
    sb AS (SELECT hv FROM b ORDER BY hv LIMIT 16),
    th AS (SELECT least((SELECT max(hv) FROM sa),
                        (SELECT max(hv) FROM sb)) AS theta),
    uni AS (SELECT CAST(count(*) AS BIGINT) AS n_union
            FROM (SELECT hv FROM sa UNION SELECT hv FROM sb) u, th
            WHERE u.hv <= th.theta),
    itr AS (SELECT CAST(count(*) AS BIGINT) AS n_inter
            FROM (SELECT hv FROM sa INTERSECT SELECT hv FROM sb) i, th
            WHERE i.hv <= th.theta),
    aon AS (SELECT CAST(count(*) AS BIGINT) AS n_a_only
            FROM (SELECT hv FROM sa EXCEPT SELECT hv FROM sb) x, th
            WHERE x.hv <= th.theta),
    ex AS (SELECT
      (SELECT CAST(count(*) AS BIGINT)
       FROM (SELECT hv FROM a UNION SELECT hv FROM b)) AS exact_union,
      (SELECT CAST(count(*) AS BIGINT)
       FROM (SELECT hv FROM a INTERSECT SELECT hv FROM b)) AS exact_inter)
    SELECT th.theta AS theta, n_union, n_inter, n_a_only,
           round(n_union * (1152921504606846976.0 / th.theta), 3)
             AS est_union,
           round(n_inter * (1152921504606846976.0 / th.theta), 3)
             AS est_inter,
           round(n_a_only * (1152921504606846976.0 / th.theta), 3)
             AS est_a_only,
           exact_union, exact_inter
    FROM th, uni, itr, aon, ex
    """,
)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set-expression estimates from two KMV sketches —
    the set-operation half kmv_distinct's docstring promises: A =
    click users, B = purchase users, each summarized by its k=16
    smallest distinct 60-bit md5 hashes. theta = min(h_k(A), h_k(B));
    because a bottom-k sketch contains EVERY hash of its set at or
    below its own h_k >= theta, the sub-theta region of each sketch is
    an exact uniform sample of its set, so sketch-level UNION /
    INTERSECT / EXCEPT restricted to hv <= theta are exact there and
    n/theta (hashes uniform on [0, 2^60)) estimates each expression's
    cardinality — the estimator that lets a crawl compare seen-sets of
    two shards without ever joining them. All decisions are integer
    (hash compares, set ops, counts); the three estimates are one
    identical double expression each; exact_union/exact_inter are the
    audit columns a production sketch would drop (exact at hash
    granularity, collisions ~2^-60).

    Scale shape: per set, distinct-hash then ORDER BY LIMIT k —
    Spark's TakeOrderedAndProject (per-partition top-k, driver merge
    of k*P rows), never a full sort; every set op after that runs on
    <= 2k rows. The exact audit is the only full-width join and exists
    only for the oracle."""
    ev = load(spark, sf_dir, "events")

    def hashes(t: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .select(
                md5_long(F.col("user_id").cast("string")).alias("hv")
            )
            .distinct()
        )

    a, b = hashes("click"), hashes("purchase")
    sa, sb = a.orderBy("hv").limit(16), b.orderBy("hv").limit(16)
    theta = (
        sa.agg(F.max("hv").alias("ta"))
        .crossJoin(sb.agg(F.max("hv").alias("tb")))
        .select(F.least("ta", "tb").alias("theta"))
    )

    def below(df: DataFrame, name: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(theta))
            .filter(F.col("hv") <= F.col("theta"))
            .agg(F.count("*").cast("bigint").alias(name))
        )

    n_union = below(sa.union(sb).distinct(), "n_union")
    n_inter = below(sa.intersect(sb), "n_inter")
    n_a_only = below(sa.join(sb, "hv", "left_anti"), "n_a_only")
    exact = (
        a.union(b)
        .distinct()
        .agg(F.count("*").cast("bigint").alias("exact_union"))
        .crossJoin(
            a.intersect(b).agg(
                F.count("*").cast("bigint").alias("exact_inter")
            )
        )
    )
    scale = F.lit(1152921504606846976.0) / F.col("theta")
    return (
        theta.crossJoin(n_union)
        .crossJoin(n_inter)
        .crossJoin(n_a_only)
        .crossJoin(exact)
        .select(
            "theta",
            "n_union",
            "n_inter",
            "n_a_only",
            F.round(F.col("n_union") * scale, 3).alias("est_union"),
            F.round(F.col("n_inter") * scale, 3).alias("est_inter"),
            F.round(F.col("n_a_only") * scale, 3).alias("est_a_only"),
            "exact_union",
            "exact_inter",
        )
    )


@query(
    "theil_sen_slope",
    """
    WITH d AS (
      SELECT (year(CAST(o_orderdate AS DATE)) * 12
              + month(CAST(o_orderdate AS DATE))) AS m,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS rev
      FROM orders GROUP BY 1
    ),
    p AS (
      SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.m - a.m) AS slope
      FROM d a JOIN d b ON b.m > a.m
    ),
    sl AS (SELECT median(slope) AS slope FROM p),
    ic AS (SELECT median(CAST(d.rev AS DOUBLE) - sl.slope * d.m) AS icept
           FROM d, sl)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_months,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_pairs,
           round(sl.slope, 6) AS slope_cents_per_month,
           round(ic.icept, 6) AS intercept_cents
    FROM sl, ic
    """,
)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue: slope = median of
    all pairwise slopes (rev_j - rev_i)/(j - i), intercept = median of
    (rev_m - slope*m) — the estimator that tolerates up to ~29%
    outlier months, complementing events_trend_ols (least squares,
    outlier-fragile) and mann_kendall_trend (direction only, no
    magnitude). Revenue is exact integer cents per month, the month
    index exact integers, so every pairwise slope is one double
    division of identical integer operands in both engines; both
    engines interpolate even-n medians as the midpoint of two
    identical doubles. Outputs rounded; n_months/n_pairs are the
    integer audit.

    Scale shape: rows fold map-side to the calendar-month frame
    (O(months) after one shuffle); the pairwise self-join is bounded
    by the time dimension squared (~3k pairs for 7 years) regardless
    of corpus size — Theil-Sen's O(n^2) is over AGGREGATE months,
    never raw rows."""
    orders = load(spark, sf_dir, "orders")
    dt = F.col("o_orderdate").cast("date")
    d = orders.groupBy(
        (F.year(dt) * 12 + F.month(dt)).alias("m")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev")
    )
    p = (
        d.alias("a")
        .join(d.alias("b"), F.col("b.m") > F.col("a.m"))
        .select(
            (
                (F.col("b.rev") - F.col("a.rev")).cast("double")
                / (F.col("b.m") - F.col("a.m"))
            ).alias("slope")
        )
    )
    sl = p.agg(F.percentile("slope", F.lit(0.5)).alias("slope"))
    ic = (
        d.crossJoin(F.broadcast(sl))
        .select(
            (
                F.col("rev").cast("double")
                - F.col("slope") * F.col("m")
            ).alias("resid")
        )
        .agg(F.percentile("resid", F.lit(0.5)).alias("icept"))
    )
    counts = d.agg(
        F.count("*").cast("bigint").alias("n_months")
    ).crossJoin(p.agg(F.count("*").cast("bigint").alias("n_pairs")))
    return (
        counts.crossJoin(sl)
        .crossJoin(ic)
        .select(
            "n_months",
            "n_pairs",
            F.round("slope", 6).alias("slope_cents_per_month"),
            F.round("icept", 6).alias("intercept_cents"),
        )
    )


@query(
    "k_anonymity_audit",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS l
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(min(n) AS BIGINT) AS k_min,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_lt_k,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(min(l) AS BIGINT) AS l_min,
           CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_lt_l
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table — the
    privacy gate a training-data release pipeline runs BEFORE export,
    complementing pii_scrub (which redacts surface strings; this
    measures linkage risk). Quasi-identifier = (nation, market
    segment); a row is re-identifiable when its QI group has fewer
    than k=5 members, and a group leaks its sensitive attribute
    (account-balance sign) when all members share one value (l<2).
    Outputs the release-decision integers: smallest group (k_min),
    violating groups and rows at risk at k=5, minimum diversity and
    l<2 group count. Every column is an exact integer fold of group
    sizes — nothing engine-sensitive.

    Scale shape: one groupBy on the QI (map-side combined), then a
    second fold over |QI-combination| rows — bounded by the QI
    domain's cross product, never the corpus. At 100 TB the same two
    folds audit any column set; the count-distinct is over a
    2-value flag, so it stays a partial aggregate."""
    cust = load(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct(
            F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("l"),
    )
    return g.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.min("n").cast("bigint").alias("k_min"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_lt_k"),
        F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("l").cast("bigint").alias("l_min"),
        F.sum(F.when(F.col("l") < 2, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_lt_l"),
    )


@query(
    "token_fertility",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CASE WHEN sum(len(string_split(text, ' '))) > 0
                THEN round(CAST(sum(len(text)) AS DOUBLE)
                           / sum(len(string_split(text, ' '))), 4)
           END AS chars_per_token
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: characters consumed per
    whitespace token — the budget-planning audit that tells a
    pretraining pipeline how unevenly its token quota buys text
    across languages (high fertility = more chars per token = cheaper
    per character). Counts are exact integers (code-point length and
    whitespace-split arity agree between engines, including the
    ''→[''] single-token edge); the ratio is one guarded double.

    Scale shape: two integer partial aggregates per (partition, lang)
    — a shuffle of O(|langs|) rows, no joins; the same fold serves an
    incremental foreachBatch ingest."""
    docs = load(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " ", -1))
    g = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.sum(toks).cast("bigint").alias("n_tokens"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_chars",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens"), 4
            ),
        ).alias("chars_per_token"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Decorrelated-subquery join family (round 5 session 14): the remaining
# TPC-H shapes whose reference formulation is a correlated subquery —
# each re-expressed as the join/window plan Catalyst's decorrelation
# would produce, so the physical strategy is explicit instead of
# optimizer-dependent. (Q1/Q3/Q5/Q7/Q8/Q9/Q10/Q13-Q15/Q17-Q19/Q22
# shapes already exist under descriptive names.)
# ---------------------------------------------------------------------------


@query(
    "min_cost_supplier",
    """
    WITH eu AS (
      SELECT s.s_suppkey, s.s_name FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
                    AND r.r_name = 'EUROPE'
    ),
    px AS (
      SELECT l.l_partkey, eu.s_name,
             min(l.l_extendedprice) AS supp_min
      FROM lineitem l JOIN eu ON eu.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    best AS (
      SELECT l_partkey, min(supp_min) AS best FROM px GROUP BY 1
    )
    SELECT p.p_partkey, p.p_name, px.s_name,
           CAST(round(px.supp_min * 100) AS BIGINT) AS price_cents
    FROM px JOIN best USING (l_partkey)
    JOIN part p ON p.p_partkey = px.l_partkey
    WHERE px.supp_min = best.best AND p.p_size <= 10
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to the reduced schema
    (no partsupp: a supplier's offer price for a part = the min
    l_extendedprice it ever shipped that part at): for each small part
    (p_size <= 10), every EUROPE supplier tied at the part's lowest
    price. Q2's correlated `WHERE ps_supplycost = (SELECT min(...))`
    becomes a groupwise-min picked by a WINDOW over the per-(part,
    supplier) aggregate — one shuffle on l_partkey serves both the
    min and the filter, where the classic decorrelation (aggregate +
    self-join back) would re-shuffle the same rows twice. No
    arithmetic touches the compared double (min/= only), so the float
    boundary is engine-stable; cents render is the only cast.

    Scale shape: supplier⨝nation⨝region is a broadcast dim chain
    pre-filtered to one region BEFORE touching the fact table;
    lineitem shuffles once on l_partkey; part joins broadcast
    (size-pruned). Ties keep all rows — no arbitrary first()."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    eu = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey", "s_name")
    px = (
        li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
        .groupBy("l_partkey", "s_name")
        .agg(F.min("l_extendedprice").alias("supp_min"))
    )
    w = Window.partitionBy("l_partkey")
    winners = px.withColumn("best", F.min("supp_min").over(w)).filter(
        F.col("supp_min") == F.col("best")
    )
    return winners.join(
        F.broadcast(p), p.p_partkey == winners.l_partkey
    ).select(
        "p_partkey",
        "p_name",
        "s_name",
        F.round(F.col("supp_min") * 100).cast("bigint").alias("price_cents"),
    )


@query(
    "important_part_share",
    """
    WITH rev AS (
      SELECT l.l_partkey,
             CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_x10000
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
                    AND n.n_name = 'NATION_3'
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(rev_x10000) AS BIGINT) AS total_x10000,
             count(*) AS n_parts
      FROM rev
    )
    SELECT rev.l_partkey AS p_partkey, rev.rev_x10000
    FROM rev CROSS JOIN tot
    WHERE rev.rev_x10000 * tot.n_parts > 2 * tot.total_x10000
    """,
)
def important_part_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock), adapted (no partsupp: a part's
    stake with NATION_3's suppliers = its shipped revenue from them):
    parts whose revenue exceeds 2x the average part's — Q11's
    `HAVING sum(...) > (SELECT sum(...) * fraction)` scalar
    correlation. Q11's literal fraction is scale-dependent by design
    (0.0001/SF); a fixed-string oracle needs a scale-free threshold,
    so the share compare is against the mean, cross-multiplied over
    exact x10000 integers (rev*n > 2*total) — no engine divides,
    no float boundary.

    Scale shape: the scalar aggregate is one row cross-joined back
    (broadcast nested loop over a 1-row build side — Spark's literal
    rendering of the decorrelated plan); the per-part rollup is the
    only fact shuffle; supplier/nation broadcast pre-filtered to one
    nation."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    rev = (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            (
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,4)")
                )
                * 10000
            )
            .cast("bigint")
            .alias("rev_x10000")
        )
    )
    tot = rev.agg(
        F.sum("rev_x10000").cast("bigint").alias("total_x10000"),
        F.count("*").alias("n_parts"),
    )
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(
            F.col("rev_x10000") * F.col("n_parts")
            > 2 * F.col("total_x10000")
        )
        .select(F.col("l_partkey").alias("p_partkey"), "rev_x10000")
    )


@query(
    "part_supplier_diversity",
    """
    SELECT p.p_brand, p.p_type,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct suppliers
    able to supply each (brand, type) bracket, excluding one part
    type and excluding blacklisted suppliers — Q16's `NOT IN (SELECT
    ... FROM supplier WHERE complaints)` (no s_comment here, so the
    complaint proxy is a negative account balance; vacuous at
    sf0.001, selective at 0.01+, which the oracle mirrors exactly).

    Scale shape: the NOT IN is a LEFT ANTI against a tiny filtered
    build side — broadcast, never a shuffle (NOT IN's null-trap
    doesn't apply: s_suppkey is a non-null key, so anti-join is
    exactly equivalent); part joins broadcast with the type exclusion
    pushed to its scan; the distinct-count is the one fact shuffle,
    partials combining map-side on (brand, type, suppkey)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "excess_shipment_suppliers",
    """
    WITH ps AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(sum(l.l_quantity) AS BIGINT) AS q
      FROM lineitem l JOIN part pa ON pa.p_partkey = l.l_partkey
      WHERE pa.p_name LIKE '%rod'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, CAST(sum(q) AS BIGINT) AS tq FROM ps GROUP BY 1
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM ps JOIN tot USING (l_partkey)
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
                  AND r.r_name = 'EUROPE'
    WHERE 2 * ps.q > tot.tq
    """,
)
def excess_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted (no partsupp
    availqty: "holds excess stock" = shipped MORE THAN HALF of a
    part's total 1996 volume): EUROPE suppliers who dominated any
    rod-named part. Q20's doubly-nested correlated chain
    (`ps_availqty > (SELECT 0.5*sum(l_quantity) WHERE same part+supp)`)
    decorrelates into one per-(part,supplier) rollup reused twice: a
    window total over it replaces the inner aggregate, and the
    half-share compare is integer (2q > total; quantities are whole).

    Scale shape: the name-pattern part prune broadcasts into the fact
    scan; ONE shuffle on l_partkey serves the rollup, the window
    total, and the share filter; the surviving (supplier) set is
    tiny, so the supplier/nation/region identification is a broadcast
    semi-join chain; DISTINCT dedups winners across parts (a supplier
    can dominate several)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    pa = load(spark, sf_dir, "part").filter(F.col("p_name").like("%rod"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("q"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("tq", F.sum("q").over(w))
        .filter(2 * F.col("q") > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    eu = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == n.n_nationkey,
    )
    return dominant.join(
        F.broadcast(eu), dominant.l_suppkey == eu.s_suppkey
    ).select("s_suppkey", "s_name")


@query(
    "waiting_supplier_audit",
    """
    WITH ol AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    per_order AS (
      SELECT l_orderkey, count(*) AS n_supps,
             CAST(sum(late) AS BIGINT) AS n_late
      FROM ol GROUP BY 1
    )
    SELECT ol.l_suppkey AS s_suppkey,
           CAST(count(*) AS BIGINT) AS numwait
    FROM ol JOIN per_order USING (l_orderkey)
    WHERE ol.late = 1 AND per_order.n_supps > 1 AND per_order.n_late = 1
    GROUP BY 1
    """,
)
def waiting_supplier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted (no
    l_commitdate/receiptdate: "late" = shipped > 365 days after the
    order date): per supplier, finished multi-supplier orders where
    it was the SOLE late supplier. Q21's EXISTS (another supplier's
    line) + NOT EXISTS (another supplier's LATE line) double
    correlation decorrelates into one per-(order, supplier) late
    flag and two window counts over it — `n_supps > 1` IS the
    EXISTS, `n_late = 1` (with this supplier late) IS the NOT
    EXISTS — turning two correlated fact-table probes into a single
    extra aggregation on the partitioning already in hand.

    Scale shape: ONE fact shuffle — the explicit hash(l_orderkey)
    repartition after the (broadcast at this SF) orders join. It is
    deliberately on l_orderkey alone, not the (orderkey, suppkey)
    grouping pair: HashPartitioning(l_orderkey) satisfies the
    rollup's ClusteredDistribution (subset rule), so the groupBy, the
    window counts, AND the sole-late filter all run in that one
    partitioning — left to itself Catalyst picks hash(orderkey,
    suppkey) for the rollup and must re-exchange for the window
    (verified: 3 Exchanges without the hint, 2 with). The final
    per-supplier count is output-sized. The 365-day lateness gate is
    timestamp arithmetic both engines evaluate identically on NTZ
    values."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    ol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = ol.select(
        "l_orderkey",
        "l_suppkey",
        "late",
        F.count("*").over(w).alias("n_supps"),
        F.sum("late").over(w).cast("bigint").alias("n_late"),
    )
    return (
        flagged.filter(
            (F.col("late") == 1)
            & (F.col("n_supps") > 1)
            & (F.col("n_late") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )


@query(
    "harmonic_centrality_landmarks",
    f"""
    WITH RECURSIVE {_LINKGRAPH_SQL_CTES},
    landmarks AS (SELECT doc_id AS l FROM documents WHERE doc_id % 131 = 0),
    walk(v, l, d) AS (
      SELECT l, l, 0 FROM landmarks
      UNION
      SELECT sym.w, walk.l, walk.d + 1
      FROM walk JOIN sym ON sym.v = walk.v
      WHERE walk.d < 4
    ),
    dist AS (
      SELECT v, l, min(d) AS d FROM walk GROUP BY 1, 2
    )
    SELECT v AS doc_id,
           CAST(count(*) AS BIGINT) AS n_landmarks,
           CAST(sum(60 // d) AS BIGINT) AS harmonic_x60
    FROM dist WHERE d > 0
    GROUP BY 1
    """,
)
def harmonic_centrality_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-approximated harmonic centrality over the shared link
    graph: C(v) = sum over landmark set L (every 131st doc) of 1/d(v,l)
    within 4 hops — the centrality that, unlike closeness, is defined
    on disconnected graphs (unreachable landmarks contribute 0, not
    infinity), and the standard way to make centrality tractable at
    graph scale (exact all-pairs is O(V·E); landmarks make it
    O(|L|·E)). Complements the spectral family (pagerank/HITS) and the
    structural one (k-core, triangles) with a DISTANCE-based member.
    Scores are exact integers: d <= 4, so 1/d rides x60 (60/d whole
    for d in 1..4) and the cap is shared with the oracle by
    construction.

    Scale shape: level-synchronous multi-source BFS carrying (node,
    landmark) pairs — per level ONE frontier⋈edges equi-join on v and
    one left-anti against the (v, l) visited set, both
    frontier-sized, never |V|x|L|-sized (only REACHED pairs ever
    materialize); per-level localCheckpoint bounds lineage exactly
    like graph_bfs_levels; state is bounded by the hop cap. First-hit
    depth IS the shortest distance (BFS invariant), so no min() fold
    is needed — each (v, l) is emitted once, at its first level."""
    docs = load(spark, sf_dir, "documents")
    edges = _linkgraph_edges(docs)
    sym = (
        edges.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .localCheckpoint(eager=True)
    )
    frontier = (
        docs.filter(F.col("doc_id") % 131 == 0)
        .select(F.col("doc_id").alias("v"), F.col("doc_id").alias("l"))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    hits = None
    for d in range(1, 5):
        nxt = (
            sym.join(frontier.select("v", "l"), "v")
            .select(F.col("w").alias("v"), "l")
            .distinct()
            .join(visited, ["v", "l"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        scored = nxt.select(
            "v", "l", F.lit(60 // d).cast("bigint").alias("h_x60")
        )
        hits = scored if hits is None else hits.unionByName(scored)
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    if hits is None:  # degenerate: no landmark has any edge
        return docs.select(
            F.col("doc_id"),
            F.lit(0).cast("bigint").alias("n_landmarks"),
            F.lit(0).cast("bigint").alias("harmonic_x60"),
        ).limit(0)
    return hits.groupBy(F.col("v").alias("doc_id")).agg(
        F.count("*").cast("bigint").alias("n_landmarks"),
        F.sum("h_x60").cast("bigint").alias("harmonic_x60"),
    )


@query(
    "split_leakage_audit",
    f"""
    WITH {_MINHASH_SIG_CTES},
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CASE WHEN ('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 15))
                     ::BIGINT % 10 = 0
                THEN doc_a ELSE doc_b END AS test_doc
    FROM cands
    WHERE (('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 15))
             ::BIGINT % 10 = 0)
       <> (('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 15))
             ::BIGINT % 10 = 0)
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split leakage gate: near-duplicate candidate pairs
    that STRADDLE a deterministic 90/10 hash split (exactly one side
    in test) — the audit a pretraining pipeline runs before trusting
    held-out eval numbers, because a test doc whose near-twin sits in
    train leaks the answer (same failure decontaminate_benchmark
    catches against EXTERNAL benchmarks, here against the pipeline's
    OWN split). Candidates come from the same MinHash-LSH banding the
    dedup family uses; the fold is a pure md5 expression of doc_id
    (the stratified_sample convention), so membership is reproducible
    across engines, runs, and re-partitions.

    Scale shape: the only join is the per-bucket LSH band self-join
    (never all-pairs); the fold gate is a scalar expression on the
    candidate rows — ZERO extra joins or shuffles on top of the
    banding pass (fold(doc) is a function of doc_id, not a lookup).
    Emitting the leaking pairs (with the test-side doc) rather than a
    count is deliberate: the remediation — move or drop the test doc
    — needs the pair list."""
    pairs = _band_pairs(_lsh_bands(_doc_grams(spark, sf_dir))).select(
        "doc_a", "doc_b"
    )
    in_test = lambda c: md5_long(c.cast("string")) % 10 == 0  # noqa: E731
    return pairs.filter(
        in_test(F.col("doc_a")) != in_test(F.col("doc_b"))
    ).select(
        "doc_a",
        "doc_b",
        F.when(in_test(F.col("doc_a")), F.col("doc_a"))
        .otherwise(F.col("doc_b"))
        .alias("test_doc"),
    )


# ===========================================================================
# Round-5 session 14: rank statistics + richness estimation + audit family
# ===========================================================================


@query(
    "mann_whitney_u",
    """
    WITH o AS (
      SELECT CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    v AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(g) AS BIGINT) AS cnt1
      FROM o GROUP BY cents
    ),
    r AS (
      SELECT cnt, cnt1,
             CAST(coalesce(sum(cnt) OVER (
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c_lt
      FROM v
    ),
    s AS (
      SELECT CAST(sum(cnt1) AS HUGEINT) AS n1,
             CAST(sum(cnt) AS HUGEINT) AS n,
             CAST(sum(cnt1 * (2 * c_lt + cnt + 1)) AS HUGEINT) AS two_r1,
             CAST(sum(cnt * cnt * cnt - cnt) AS HUGEINT) AS sum_t
      FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n - n1 AS BIGINT) AS n2,
           CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS two_u1,
           CAST(sum_t AS BIGINT) AS tie_term,
           CASE WHEN n1 * (n - n1) > 0 AND n * (n * n - 1) - sum_t > 0
                THEN round(
                  3.0 * CAST(two_r1 - n1 * (n1 + 1) - n1 * (n - n1)
                             AS DOUBLE)
                      * CAST(two_r1 - n1 * (n1 + 1) - n1 * (n - n1)
                             AS DOUBLE)
                      * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                  / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                     * CAST(n * (n * n - 1) - sum_t AS DOUBLE)), 6)
           END AS z2,
           CASE WHEN n1 * (n - n1) > 0 AND n * (n * n - 1) - sum_t > 0
                THEN 3.0 * CAST(two_r1 - n1 * (n1 + 1) - n1 * (n - n1)
                               AS DOUBLE)
                        * CAST(two_r1 - n1 * (n1 + 1) - n1 * (n - n1)
                               AS DOUBLE)
                        * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                     / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
                        * CAST(n * (n * n - 1) - sum_t AS DOUBLE))
                     > 3.8416
           END AS significant
    FROM s
    """,
)
def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (tie-corrected normal
    approximation): do URGENT-priority orders have stochastically
    larger totals than the rest? The nonparametric complement to
    ks_two_sample — KS asks 'same distribution?', U asks the ranked
    'which side is larger?' without assuming normality of the heavily
    right-skewed price column.

    All rank arithmetic is integer-exact: ranks live DOUBLED
    (2·avg_rank = 2·c_lt + t + 1 is an integer even where midranks are
    .5), so 2R1, 2U1 and the tie term Σ(t³−t) are exact. The |z|>1.96
    verdict evaluates z² = 3·diff²·N(N−1)/(n1·n2·(N³−N−ΣT)) as ONE
    double expression of those exact integers — each factor cast
    individually, the identical IEEE tree in both engines, with
    exact-INTEGER guards (n1·n2 > 0, tie denominator > 0) deciding
    reachability before any division. The fully-cross-multiplied
    DECIMAL(38,0) form was rejected in review: 1875·diff²·N(N−1)
    exceeds 38 digits one scale step above the tested envelope and
    the engines fail differently there (DuckDB raises on HUGEINT
    overflow, Spark nulls).

    Scale shape: one hash-agg to the DISTINCT-price frame (bounded by
    price resolution, not rows), one window over that small frame, one
    scalar rollup to a single row. The corpus is touched once."""
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.when(F.col("o_orderpriority").startswith("1-"), 1)
        .otherwise(0)
        .alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v = o.groupBy("cents").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("g").cast("bigint").alias("cnt1"),
    )
    w_lt = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = v.select(
        "cnt",
        "cnt1",
        F.coalesce(F.sum("cnt").over(w_lt), F.lit(0)).alias("c_lt"),
    )
    d38 = "decimal(38,0)"
    s = r.agg(
        F.sum("cnt1").cast(d38).alias("n1"),
        F.sum("cnt").cast(d38).alias("n"),
        F.sum(
            F.col("cnt1") * (2 * F.col("c_lt") + F.col("cnt") + 1)
        ).cast(d38).alias("two_r1"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).cast(d38).alias("sum_t"),
    )
    n1, n = F.col("n1"), F.col("n")
    n2 = n - n1
    two_u1 = F.col("two_r1") - n1 * (n1 + 1)
    diff = two_u1 - n1 * n2
    tie_den = n * (n * n - 1) - F.col("sum_t")
    # the verdict is z² > 1.96² with z² computed as ONE double
    # expression of the exact integer components (each cast to double
    # individually, the identical tree in the oracle): the earlier
    # cross-multiplied DECIMAL(38,0) form 1875·diff²·N(N−1) overflows
    # one scale step above sf0.1's envelope and the engines fail
    # DIFFERENTLY there (DuckDB raises, Spark nulls) — review
    # finding, session 14. Guards stay exact-integer.
    guard = (n1 * n2 > 0) & (tie_den > 0)
    z2 = (
        F.lit(3.0)
        * diff.cast("double")
        * diff.cast("double")
        * n.cast("double")
        * (n.cast("double") - 1)
        / (
            n1.cast("double")
            * n2.cast("double")
            * tie_den.cast("double")
        )
    )
    return s.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        two_u1.cast("bigint").alias("two_u1"),
        F.col("sum_t").cast("bigint").alias("tie_term"),
        F.when(guard, F.round(z2, 6)).alias("z2"),
        F.when(guard, z2 > 3.8416).alias("significant"),
    )


@query(
    "chao1_vocab_estimate",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    f AS (
      SELECT lang, t, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           round(count(*)
                 + CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                        * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
                        AS DOUBLE)
                   / (2 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)),
                 6) AS chao1_est
    FROM f
    GROUP BY lang
    """,
)
def chao1_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 species-richness estimate of the UNSEEN vocabulary per
    language — the capture-recapture answer to 'how big is the
    vocabulary really, given what this corpus sampled?'. Uses the
    bias-corrected form V + f1(f1−1)/(2(f2+1)), which is finite even
    when no token occurs exactly twice (f2 = 0) — no guard branch
    needed, the +1 IS the estimator. Complements vocab_hapax_rate
    (which reports the f1 share) by turning the (f1, f2) tail into an
    extrapolated total; same ' '-split token law as the whole
    text_tokens family. f1(f1−1) is exact integer arithmetic; the one
    division happens once per language row.

    Scale shape: identical to vocab_hapax_rate — one (lang, token)
    count agg (map-side combined) over the exploded corpus, then a
    per-lang rollup of the vocab-sized frame."""
    docs = load(spark, sf_dir, "documents")
    f = (
        docs.select("lang", F.explode(words(F.col("text"))).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    g = f.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("f1"),
        F.sum((F.col("c") == 2).cast("bigint")).cast("bigint").alias("f2"),
    )
    return g.select(
        "lang",
        "n_vocab",
        "f1",
        "f2",
        F.round(
            F.col("n_vocab")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1)),
            6,
        ).alias("chao1_est"),
    )


@query(
    "simpsons_paradox_audit",
    """
    WITH li AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_quantity) AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS y
      FROM lineitem
    ),
    g AS (
      SELECT grp, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy
      FROM li GROUP BY grp
    ),
    sgn AS (
      SELECT grp, n,
             CASE WHEN n * sxy - sx * sy > 0 THEN 1
                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS s,
             CAST(n * sxy - sx * sy AS DOUBLE) AS slope_num
      FROM g
    ),
    pooled AS (
      SELECT CAST('ALL' AS VARCHAR) AS grp, sum(n) AS n,
             CASE WHEN sum(n) * sum(sxy) - sum(sx) * sum(sy) > 0 THEN 1
                  WHEN sum(n) * sum(sxy) - sum(sx) * sum(sy) < 0 THEN -1
                  ELSE 0 END AS s,
             CAST(sum(n) * sum(sxy) - sum(sx) * sum(sy) AS DOUBLE)
               AS slope_num
      FROM (SELECT n, sx, sy, sxy FROM g) t
    ),
    flag AS (
      SELECT (SELECT min(s) FROM sgn) = (SELECT max(s) FROM sgn)
             AND (SELECT min(s) FROM sgn) <> 0
             AND (SELECT min(s) FROM sgn) <> (SELECT s FROM pooled)
             AS paradox
    )
    SELECT u.grp, CAST(u.n AS BIGINT) AS n_rows,
           u.s AS slope_sign, u.slope_num, flag.paradox
    FROM (SELECT grp, n, s, slope_num FROM sgn
          UNION ALL
          SELECT grp, n, s, slope_num FROM pooled) u
    CROSS JOIN flag
    """,
)
def simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit of the quantity→revenue association:
    per return-flag stratum AND pooled, the SIGN of the OLS slope
    numerator n·Σxy − Σx·Σy (x = quantity, y = discounted revenue in
    10^-4 dollars so every sum is an exact integer), plus a corpus
    paradox flag — TRUE iff all strata agree on a nonzero sign that
    the pooled sign contradicts. The canonical aggregation-bias gate a
    pipeline runs before trusting a pooled correlation: a reversed
    pooled sign means the stratum mix, not the relationship, drives
    the headline number. Every decision is integer (HUGEINT /
    DECIMAL(38,0): n·Σxy ≈ 10^22 at sf0.1); slope_num doubles are
    witnesses cast from the same exact integers.

    Scale shape: one map-side-combinable agg to the strata frame
    (|return flags| rows); the pooled row re-folds those sums — the
    corpus is touched exactly once, and the paradox flag is a
    broadcast of a 1-row frame."""
    li = load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    rows = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity")).cast("bigint").alias("x"),
        (
            F.round(F.col("l_extendedprice") * 100).cast("bigint")
            * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
        ).alias("y"),
    )
    g = rows.groupBy("grp").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
    )

    def _sign(num: Column) -> Column:
        return (
            F.when(num > 0, 1).when(num < 0, -1).otherwise(0)
        ).cast("int")

    num_g = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    sgn = g.select(
        "grp",
        F.col("n").cast("bigint").alias("n_rows"),
        _sign(num_g).alias("slope_sign"),
        num_g.cast("double").alias("slope_num"),
    )
    p = g.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxy").alias("sxy"),
    )
    num_p = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    pooled = p.select(
        F.lit("ALL").alias("grp"),
        F.col("n").cast("bigint").alias("n_rows"),
        _sign(num_p).alias("slope_sign"),
        num_p.cast("double").alias("slope_num"),
    )
    flag = (
        sgn.agg(
            F.min("slope_sign").alias("mn"), F.max("slope_sign").alias("mx")
        )
        .crossJoin(
            F.broadcast(pooled.select(F.col("slope_sign").alias("ps")))
        )
        .select(
            (
                (F.col("mn") == F.col("mx"))
                & (F.col("mn") != 0)
                & (F.col("mn") != F.col("ps"))
            ).alias("paradox")
        )
    )
    return sgn.unionByName(pooled).crossJoin(F.broadcast(flag))


@query(
    "logrank_test",
    """
    WITH o2 AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    f AS (SELECT o_custkey, min(d) AS first_d FROM o2 GROUP BY o_custkey),
    nxt AS (
      SELECT o2.o_custkey, min(o2.d) AS second_d
      FROM o2 JOIN f ON o2.o_custkey = f.o_custkey
      WHERE o2.d > f.first_d
      GROUP BY o2.o_custkey
    ),
    hz AS (SELECT max(d) AS horizon FROM o2),
    durs AS (
      SELECT CASE WHEN nxt.second_d IS NOT NULL
                  THEN datediff('day', f.first_d, nxt.second_d)
                  ELSE datediff('day', f.first_d, hz.horizon) END AS dur,
             CASE WHEN nxt.second_d IS NOT NULL THEN 1 ELSE 0 END AS ev,
             CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
      FROM f
      LEFT JOIN nxt ON f.o_custkey = nxt.o_custkey
      JOIN customer c ON f.o_custkey = c.c_custkey
      CROSS JOIN hz
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(g) AS BIGINT) AS n1_all,
             CAST(sum(ev * g) AS BIGINT) AS events1
      FROM durs
    ),
    byt AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(g) AS BIGINT) AS cnt1,
             CAST(sum(ev) AS BIGINT) AS d,
             CAST(sum(ev * g) AS BIGINT) AS d1
      FROM durs GROUP BY dur
    ),
    risk AS (
      SELECT dur, d, d1,
             tot.n_all - CAST(coalesce(sum(cnt) OVER (
               ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n,
             tot.n1_all - CAST(coalesce(sum(cnt1) OVER (
               ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n1
      FROM byt CROSS JOIN tot
    ),
    terms AS (
      SELECT dur,
             CAST(d1 AS DOUBLE) - d * n1 / n AS oe,
             CASE WHEN n > 1
                  THEN d * (n1 / n) * ((n - n1) / n) * (n - d)
                       / (n - 1)
                  ELSE 0.0 END AS v
      FROM risk WHERE d >= 1
    ),
    folded AS (
      SELECT sum(oe) OVER w AS oe_sum, sum(v) OVER w AS v_sum,
             row_number() OVER (ORDER BY dur DESC) AS rn
      FROM terms
      WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT CAST(tot.n1_all AS BIGINT) AS n1_total,
           CAST(tot.n_all - tot.n1_all AS BIGINT) AS n2_total,
           tot.events1,
           round(folded.oe_sum, 6) AS o_minus_e,
           round(folded.v_sum, 6) AS var_sum,
           CASE WHEN folded.v_sum > 0
                THEN round(folded.oe_sum * folded.oe_sum / folded.v_sum, 6)
           END AS chi2,
           CASE WHEN folded.v_sum > 0
                THEN round(folded.oe_sum * folded.oe_sum / folded.v_sum, 6)
                     > 3.841459 END AS significant
    FROM folded CROSS JOIN tot WHERE folded.rn = 1
    """,
)
def logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test: does the BUILDING market segment repurchase on a
    different schedule than everyone else? The two-group comparison
    that kaplan_meier_repurchase's single curve can't make —
    censoring-correct (a naive repurchase-rate compare ignores that
    recent first-time customers haven't HAD time), summing O−E and the
    hypergeometric variance over the distinct event times.

    Determinism discipline: at-risk counts n, n1 and event counts d,
    d1 are exact integers per time (cumulative-count windows); the
    per-time float terms d·n1/n and the variance use the identical
    IEEE expression tree in both engines (multiplication/division are
    correctly-rounded, so each term is bit-identical); the two sums
    fold as ordered cumulative windows over dur — ONE canonical
    addition order, never an unordered SUM whose float fold Spark
    doesn't pin. χ²>3.841459 (1 df, 95%) compares rounded values.

    Scale shape: the duration build is kaplan_meier's (two
    map-side-combinable aggs + a custkey self-join + a broadcast
    1-row horizon) plus one broadcast-sized customer-segment join;
    all windows run on the DISTINCT-duration frame (calendar-bounded,
    never customer-bounded)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    o2 = orders.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    f = o2.groupBy("o_custkey").agg(F.min("d").alias("first_d"))
    nxt = (
        o2.join(f, "o_custkey")
        .filter(F.col("d") > F.col("first_d"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("second_d"))
    )
    hz = o2.agg(F.max("d").alias("horizon"))
    durs = (
        f.join(nxt, "o_custkey", "left")
        .join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"),
                F.when(F.col("c_mktsegment") == "BUILDING", 1)
                .otherwise(0)
                .alias("g"),
            ),
            "o_custkey",
        )
        .crossJoin(F.broadcast(hz))
        .select(
            F.when(
                F.col("second_d").isNotNull(),
                F.datediff(F.col("second_d"), F.col("first_d")),
            )
            .otherwise(F.datediff(F.col("horizon"), F.col("first_d")))
            .alias("dur"),
            F.when(F.col("second_d").isNotNull(), 1).otherwise(0).alias("ev"),
            "g",
        )
    )
    tot = durs.agg(
        F.count("*").cast("bigint").alias("n_all"),
        F.sum("g").cast("bigint").alias("n1_all"),
        F.sum(F.col("ev") * F.col("g")).cast("bigint").alias("events1"),
    )
    byt = durs.groupBy("dur").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("g").cast("bigint").alias("cnt1"),
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(F.col("ev") * F.col("g")).cast("bigint").alias("d1"),
    )
    w_lt = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = byt.crossJoin(F.broadcast(tot)).select(
        "dur",
        "d",
        "d1",
        (
            F.col("n_all")
            - F.coalesce(F.sum("cnt").over(w_lt), F.lit(0))
        ).alias("n"),
        (
            F.col("n1_all")
            - F.coalesce(F.sum("cnt1").over(w_lt), F.lit(0))
        ).alias("n1"),
    )
    terms = risk.filter(F.col("d") >= 1).select(
        "dur",
        (
            F.col("d1").cast("double")
            - F.col("d") * F.col("n1") / F.col("n")
        ).alias("oe"),
        F.when(
            F.col("n") > 1,
            F.col("d")
            * (F.col("n1") / F.col("n"))
            * ((F.col("n") - F.col("n1")) / F.col("n"))
            * (F.col("n") - F.col("d"))
            / (F.col("n") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("v"),
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = terms.select(
        F.sum("oe").over(w_cum).alias("oe_sum"),
        F.sum("v").over(w_cum).alias("v_sum"),
        F.row_number().over(Window.orderBy(F.desc("dur"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    chi2 = F.col("oe_sum") * F.col("oe_sum") / F.col("v_sum")
    return folded.crossJoin(F.broadcast(tot)).select(
        F.col("n1_all").cast("bigint").alias("n1_total"),
        (F.col("n_all") - F.col("n1_all")).cast("bigint").alias("n2_total"),
        "events1",
        F.round("oe_sum", 6).alias("o_minus_e"),
        F.round("v_sum", 6).alias("var_sum"),
        F.when(F.col("v_sum") > 0, F.round(chi2, 6)).alias("chi2"),
        F.when(F.col("v_sum") > 0, F.round(chi2, 6) > 3.841459).alias(
            "significant"
        ),
    )


@query(
    "ucb_host_selection",
    """
    WITH ledger AS (
      SELECT doc_id % 53 AS host,
             CASE WHEN ('0x' || substr(md5('err:' || CAST(doc_id AS VARCHAR)),
                        1, 15))::BIGINT % 100 >= doc_id % 53
                  THEN 1 ELSE 0 END AS ok
      FROM documents
    ),
    h AS (
      SELECT host, CAST(count(*) AS BIGINT) AS attempts,
             CAST(sum(ok) AS BIGINT) AS successes
      FROM ledger GROUP BY host
    ),
    tot AS (SELECT CAST(sum(attempts) AS BIGINT) AS n_total FROM h),
    scored AS (
      SELECT host, attempts, successes,
             CAST(successes AS DOUBLE) / attempts
               + sqrt(2 * ln(CAST(tot.n_total AS DOUBLE)) / attempts)
               AS ucb
      FROM h CROSS JOIN tot
    )
    SELECT CAST(row_number() OVER (ORDER BY ucb DESC, host) AS INT) AS rank,
           host, attempts, successes, round(ucb, 6) AS ucb_score
    FROM scored
    QUALIFY row_number() OVER (ORDER BY ucb DESC, host) <= 10
    """,
)
def ucb_host_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 bandit scores for crawl host selection: which hosts should
    the next round's budget explore? score = success rate +
    sqrt(2·ln(N)/n_i) — the optimism bonus sends budget to hosts the
    crawler has barely probed even when their observed rate is
    mediocre, the regret-bounded alternative to the breaker's
    pure-threshold verdict (same deterministic attempt/error ledger as
    host_error_breaker: host = doc_id % 53, md5 error gate).

    Determinism: attempts/successes are exact map-side integers; the
    ln/sqrt floats come from identical IEEE expression trees (ln is
    within 1 ulp across libm implementations — adjacent hosts' scores
    differ at ~1e-3, six orders above the ulp, and the output rounds
    to 6 dp; host breaks exact float ties). Top-10 by (score, host).

    Scale shape: one hash agg to the hosts frame, a 1-row broadcast
    total, one window over |hosts| rows — the ledger is touched
    once; at 10^7 hosts the window becomes a top-k rank over an
    already-small aggregate, never over attempts."""
    docs = load(spark, sf_dir, "documents")
    host = (F.col("doc_id") % 53).alias("host")
    ok = (
        md5_long(F.concat(F.lit("err:"), F.col("doc_id").cast("string")))
        % 100
        >= F.col("doc_id") % 53
    ).cast("int")
    h = docs.select(host, ok.alias("ok")).groupBy("host").agg(
        F.count("*").cast("bigint").alias("attempts"),
        F.sum("ok").cast("bigint").alias("successes"),
    )
    tot = h.agg(F.sum("attempts").cast("bigint").alias("n_total"))
    scored = h.crossJoin(F.broadcast(tot)).select(
        "host",
        "attempts",
        "successes",
        (
            F.col("successes").cast("double") / F.col("attempts")
            + F.sqrt(
                2 * F.log(F.col("n_total").cast("double"))
                / F.col("attempts")
            )
        ).alias("ucb"),
    )
    w = Window.orderBy(F.desc("ucb"), F.asc("host"))
    return (
        scored.select(
            F.row_number().over(w).cast("int").alias("rank"),
            "host",
            "attempts",
            "successes",
            F.round("ucb", 6).alias("ucb_score"),
        )
        .filter(F.col("rank") <= 10)
    )


@query(
    "benjamini_hochberg",
    """
    WITH e AS (
      SELECT event_type,
             CASE WHEN value > 50.0 THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    t AS (
      SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(hit) AS HUGEINT) AS x
      FROM e GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(n) AS HUGEINT) AS nn, CAST(sum(x) AS HUGEINT) AS xx,
             CAST(count(*) AS BIGINT) AS m
      FROM t
    ),
    z AS (
      SELECT event_type, n, x, m,
             CASE WHEN xx * (nn - xx) * n * (nn - n) > 0 THEN
               sqrt(CAST((x * (nn - n) - (xx - x) * n)
                         * (x * (nn - n) - (xx - x) * n) * nn AS DOUBLE)
                    / CAST(xx * (nn - xx) * n * (nn - n) AS DOUBLE))
             END AS zval
      FROM t CROSS JOIN tot
    ),
    p AS (
      SELECT event_type, n, x, m, zval,
             (1.0 / (1.0 + 0.3275911 * (zval * 0.7071067811865476)))
             * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (zval * 0.7071067811865476)))
               * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (zval * 0.7071067811865476)))
                 * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (zval * 0.7071067811865476)))
                   * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (zval * 0.7071067811865476)))
                     * 1.061405429))))
             * exp(-(zval * 0.7071067811865476) * (zval * 0.7071067811865476))
               AS pval
      FROM z
    ),
    ranked AS (
      SELECT event_type, n, x, m, zval, pval,
             CAST(row_number() OVER (ORDER BY pval, event_type) AS INT) AS k,
             CASE WHEN round(pval, 9) <= 0.05 * row_number()
                    OVER (ORDER BY pval, event_type) / m
                  THEN 1 ELSE 0 END AS under
      FROM p
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
           round(zval, 6) AS z, round(pval, 6) AS p_value, k,
           max(under) OVER (ORDER BY k ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING) = 1 AS reject
    FROM ranked
    """,
)
def benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-event-type slice
    tests: for each type, a two-proportion z of P(value > 50) vs the
    REST of the corpus, converted to a two-sided-ish upper-tail
    p = erfc(z/√2) and passed through the BH step-up (reject all
    k ≤ max{k : p(k) ≤ α·k/m}, α = 0.05) — the multiple-comparisons
    gate that stops a 'which slices shifted?' sweep from crying wolf
    m·α of the time (feature_psi and term_drift_chi2 report raw
    per-slice statistics; this is the corpus-level decision rule).

    Determinism: counts are exact integers; z² is the exact-integer
    rational diff²·N / (X(N−X)·n·n_rest) evaluated as ONE double
    division; erfc uses the Abramowitz-Stegun 7.1.26 polynomial —
    pure +,*,/ plus one exp — written as the IDENTICAL expression
    tree in both engines (the polynomial's 1.5e-7 absolute error is a
    property of the APPROXIMATION, shared exactly by both sides). The
    BH compare uses round(p, 9) so a sub-ulp exp() divergence cannot
    flip a verdict; step-up = a running max over the k-ordered frame.

    Scale shape: one map-side agg to the m-row type frame; everything
    after is windows over m rows with a 1-row broadcast total."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    t = ev.select(
        "event_type",
        F.when(F.col("value") > 50.0, 1).otherwise(0).alias("hit"),
    ).groupBy("event_type").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("hit").cast(d38).alias("x"),
    )
    tot = t.agg(
        F.sum("n").alias("nn"),
        F.sum("x").alias("xx"),
        F.count("*").cast("bigint").alias("m"),
    )
    j = t.crossJoin(F.broadcast(tot))
    diff = F.col("x") * (F.col("nn") - F.col("n")) - (
        F.col("xx") - F.col("x")
    ) * F.col("n")
    den = (
        F.col("xx")
        * (F.col("nn") - F.col("xx"))
        * F.col("n")
        * (F.col("nn") - F.col("n"))
    )
    # den = 0 only GLOBALLY (all-hit / no-hit corpus, or a single
    # type): every row nulls together, so the k-order tiebreak is
    # event_type alone in both engines — no mixed NULL ordering
    zval = F.when(
        den > 0,
        F.sqrt((diff * diff * F.col("nn")).cast("double") / den.cast("double")),
    )
    z = j.select("event_type", "n", "x", "m", zval.alias("zval"))
    xs = F.col("zval") * F.lit(0.7071067811865476)
    tpoly = 1.0 / (1.0 + F.lit(0.3275911) * xs)
    pval = (
        tpoly
        * (
            F.lit(0.254829592)
            + tpoly
            * (
                F.lit(-0.284496736)
                + tpoly
                * (
                    F.lit(1.421413741)
                    + tpoly
                    * (F.lit(-1.453152027) + tpoly * F.lit(1.061405429))
                )
            )
        )
        * F.exp(-xs * xs)
    )
    p = z.select("event_type", "n", "x", "m", "zval", pval.alias("pval"))
    w_k = Window.orderBy("pval", "event_type")
    ranked = p.select(
        "event_type",
        "n",
        "x",
        "zval",
        "pval",
        F.row_number().over(w_k).cast("int").alias("k"),
        F.when(
            F.round("pval", 9)
            <= F.lit(0.05) * F.row_number().over(w_k) / F.col("m"),
            1,
        )
        .otherwise(0)
        .alias("under"),
    )
    w_up = Window.orderBy("k").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return ranked.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("x").cast("bigint").alias("x"),
        F.round("zval", 6).alias("z"),
        F.round("pval", 6).alias("p_value"),
        "k",
        (F.max("under").over(w_up) == 1).alias("reject"),
    )


@query(
    "shapley_attribution",
    """
    WITH u AS (
      SELECT user_id,
             CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               + 2 * max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
               + 8 * max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS INT) AS mask,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS x
      FROM u GROUP BY mask
    ),
    masks AS (
      SELECT CAST(range AS INT) AS mask,
             coalesce(obs.n, 0) AS n, coalesce(obs.x, 0) AS x,
             CASE WHEN coalesce(obs.n, 0) > 0
                  THEN CAST(coalesce(obs.x, 0) AS DOUBLE) / obs.n
                  ELSE 0.0 END AS v
      FROM range(16) LEFT JOIN obs ON CAST(range AS INT) = obs.mask
    ),
    ch AS (
      SELECT * FROM (VALUES ('click', 1), ('error', 2),
                            ('signup', 4), ('view', 8)) t(channel, bit)
    ),
    terms AS (
      SELECT ch.channel, s.mask,
             CASE ((s.mask >> 0) & 1) + ((s.mask >> 1) & 1)
                + ((s.mask >> 2) & 1) + ((s.mask >> 3) & 1)
               WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
               * (si.v - s.v) AS term
      FROM ch
      JOIN masks s ON (s.mask & ch.bit) = 0
      JOIN masks si ON si.mask = s.mask + ch.bit
    ),
    folded AS (
      SELECT channel,
             sum(term) OVER (PARTITION BY channel ORDER BY mask
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS acc,
             row_number() OVER (PARTITION BY channel ORDER BY mask DESC)
               AS rn
      FROM terms
    ),
    exposure AS (
      SELECT ch.channel,
             CAST(sum(m.n) AS BIGINT) AS n_exposed,
             CAST(sum(m.x) AS BIGINT) AS conv_exposed
      FROM ch JOIN masks m ON (m.mask & ch.bit) <> 0
      GROUP BY ch.channel
    )
    SELECT folded.channel, exposure.n_exposed, exposure.conv_exposed,
           round(folded.acc / 24.0, 6) AS shapley_value
    FROM folded JOIN exposure ON folded.channel = exposure.channel
    WHERE folded.rn = 1
    """,
)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value attribution of conversions to the four
    pre-purchase channels: each user's exposure set is a 4-bit mask,
    the coalition value v(S) is the conversion rate of users exposed
    to EXACTLY S (unobserved coalitions contribute v = 0, the
    exact-exposure convention — documented, same on both sides), and
    φ_channel = Σ_{S∌i} |S|!(3−|S|)!·(v(S∪i) − v(S)) / 4! — the
    marginal-contribution average that last-touch / linear attribution
    (events_attribution_join family) cannot justify axiomatically.
    The factorial weights arrive PRE-MULTIPLIED by 4! so they're the
    exact integers {6,2,2,6}; the only floats are the v rates (one
    division per observed mask, IEEE-identical) and the per-channel
    fold, which runs as an ORDERED cumulative window over mask — one
    canonical addition order in both engines.

    Scale shape: one user-keyed mask agg (map-side combined), one
    16-row mask rollup; everything after is joins/windows over frames
    of size 16, 4, and 64 — the corpus is touched once. Channel count
    is the only exponent: 2^|channels| coalition rows, fine for the
    ≤20-channel attribution sets this is used on."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 2 * F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
            + 4
            * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            + 8 * F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
        )
        .cast("int")
        .alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    obs = u.groupBy("mask").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("x"),
    )
    all_masks = spark.range(16).select(F.col("id").cast("int").alias("mask"))
    masks = (
        all_masks.join(obs, "mask", "left")
        .select(
            "mask",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("x", F.lit(0)).alias("x"),
        )
        .select(
            "mask",
            "n",
            "x",
            F.when(
                F.col("n") > 0, F.col("x").cast("double") / F.col("n")
            )
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
    )
    ch = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    s = masks.select(
        F.col("mask").alias("smask"), F.col("v").alias("sv")
    )
    si = masks.select(
        F.col("mask").alias("simask"), F.col("v").alias("siv")
    )
    popcount = (
        F.shiftright(F.col("smask"), 0).bitwiseAND(1)
        + F.shiftright(F.col("smask"), 1).bitwiseAND(1)
        + F.shiftright(F.col("smask"), 2).bitwiseAND(1)
        + F.shiftright(F.col("smask"), 3).bitwiseAND(1)
    )
    weight = (
        F.when(popcount == 0, 6)
        .when(popcount == 1, 2)
        .when(popcount == 2, 2)
        .otherwise(6)
    )
    terms = (
        ch.join(F.broadcast(s), s.smask.bitwiseAND(ch.bit) == 0)
        .join(F.broadcast(si), F.col("simask") == F.col("smask") + F.col("bit"))
        .select(
            "channel",
            F.col("smask").alias("mask"),
            (weight * (F.col("siv") - F.col("sv"))).alias("term"),
        )
    )
    w_cum = Window.partitionBy("channel").orderBy("mask").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_last = Window.partitionBy("channel").orderBy(F.desc("mask"))
    folded = terms.select(
        "channel",
        F.sum("term").over(w_cum).alias("acc"),
        F.row_number().over(w_last).alias("rn"),
    ).filter(F.col("rn") == 1)
    exposure = (
        ch.join(F.broadcast(masks), masks.mask.bitwiseAND(ch.bit) != 0)
        .groupBy("channel")
        .agg(
            F.sum("n").cast("bigint").alias("n_exposed"),
            F.sum("x").cast("bigint").alias("conv_exposed"),
        )
    )
    return folded.join(exposure, "channel").select(
        "channel",
        "n_exposed",
        "conv_exposed",
        F.round(F.col("acc") / 24.0, 6).alias("shapley_value"),
    )


@query(
    "kruskal_wallis",
    """
    WITH o AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    v AS (
      SELECT cents, grp, CAST(count(*) AS BIGINT) AS cnt
      FROM o GROUP BY cents, grp
    ),
    tv AS (
      SELECT cents, CAST(sum(cnt) AS BIGINT) AS tcnt
      FROM v GROUP BY cents
    ),
    r AS (
      SELECT cents, tcnt,
             CAST(coalesce(sum(tcnt) OVER (
               ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c_lt
      FROM tv
    ),
    g AS (
      SELECT v.grp, CAST(sum(v.cnt) AS BIGINT) AS n_j,
             CAST(sum(v.cnt * (2 * r.c_lt + r.tcnt + 1)) AS HUGEINT)
               AS two_r
      FROM v JOIN r ON v.cents = r.cents
      GROUP BY v.grp
    ),
    tot AS (
      SELECT CAST(sum(n_j) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS m,
             CAST((SELECT sum(tcnt * tcnt * tcnt - tcnt) FROM tv)
               AS BIGINT) AS sum_t
      FROM g
    ),
    folded AS (
      SELECT sum(CAST(two_r * two_r AS DOUBLE) / n_j) OVER (
               ORDER BY grp ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS acc,
             row_number() OVER (ORDER BY grp DESC) AS rn
      FROM g
    ),
    h AS (
      SELECT tot.n, tot.m, tot.sum_t,
             3.0 * folded.acc / (tot.n * (tot.n + 1))
               - 3 * (tot.n + 1) AS h_raw
      FROM folded CROSS JOIN tot WHERE folded.rn = 1
    )
    SELECT n, m, sum_t AS tie_term,
           CASE WHEN sum_t < n * n * n - n
                THEN round(h_raw / (1.0 - CAST(sum_t AS DOUBLE)
                                          / (n * n * n - n)), 6)
           END AS h,
           CASE WHEN sum_t < n * n * n - n THEN
             round(h_raw / (1.0 - CAST(sum_t AS DOUBLE)
                                  / (n * n * n - n)), 6)
             > CASE m - 1 WHEN 1 THEN 3.841459 WHEN 2 THEN 5.991465
                          WHEN 3 THEN 7.814728 WHEN 4 THEN 9.487729
                          ELSE NULL END
           END AS significant
    FROM h
    """,
)
def kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test across ALL five order priorities — the
    k-group generalization of mann_whitney_u (one ranked test instead
    of 10 pairwise comparisons, which is exactly the multiple-testing
    trap benjamini_hochberg exists to patch). Doubled midranks keep
    2R_j and the tie term Σ(t³−t) exact integers ((2R_j)² rides
    HUGEINT/DECIMAL(38,0): ~10^19 at sf0.1); the per-group terms
    (2R_j)²/n_j fold as an ORDERED cumulative window over the k-row
    group frame (one canonical float order), H = [3·Σ/(N(N+1)) −
    3(N+1)] / (1 − ΣT/(N³−N)) with the all-tied corpus guarded by the
    exact integer compare ΣT < N³−N (division never evaluated when the
    correction is 0). The χ² critical value is a df-indexed CASE
    (df ≤ 4 here; NULL verdict beyond the table, never a wrong one).

    Scale shape: one hash-agg to the distinct-(value, group) frame,
    one window over distinct values, one k-row fold — identical to
    mann_whitney_u's footprint with a groups dimension."""
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v = o.groupBy("cents", "grp").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    tv = v.groupBy("cents").agg(F.sum("cnt").cast("bigint").alias("tcnt"))
    w_lt = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    r = tv.select(
        "cents",
        "tcnt",
        F.coalesce(F.sum("tcnt").over(w_lt), F.lit(0)).alias("c_lt"),
    )
    d38 = "decimal(38,0)"
    g = (
        v.join(r, "cents")
        .groupBy("grp")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_j"),
            F.sum(F.col("cnt") * (2 * F.col("c_lt") + F.col("tcnt") + 1))
            .cast(d38)
            .alias("two_r"),
        )
    )
    ties = tv.agg(
        F.sum(
            F.col("tcnt") * F.col("tcnt") * F.col("tcnt") - F.col("tcnt")
        )
        .cast("bigint")
        .alias("sum_t")
    )
    tot = g.agg(
        F.sum("n_j").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("m"),
    ).crossJoin(F.broadcast(ties))
    w_cum = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_last = Window.orderBy(F.desc("grp"))
    folded = g.select(
        F.sum(
            (F.col("two_r") * F.col("two_r")).cast("double") / F.col("n_j")
        )
        .over(w_cum)
        .alias("acc"),
        F.row_number().over(w_last).alias("rn"),
    ).filter(F.col("rn") == 1)
    h_raw = (
        F.lit(3.0) * F.col("acc") / (F.col("n") * (F.col("n") + 1))
        - 3 * (F.col("n") + 1)
    )
    n3n = F.col("n") * F.col("n") * F.col("n") - F.col("n")
    h_val = F.round(
        h_raw / (F.lit(1.0) - F.col("sum_t").cast("double") / n3n), 6
    )
    crit = (
        F.when(F.col("m") - 1 == 1, 3.841459)
        .when(F.col("m") - 1 == 2, 5.991465)
        .when(F.col("m") - 1 == 3, 7.814728)
        .when(F.col("m") - 1 == 4, 9.487729)
    )
    return folded.crossJoin(F.broadcast(tot)).select(
        "n",
        "m",
        F.col("sum_t").alias("tie_term"),
        F.when(F.col("sum_t") < n3n, h_val).alias("h"),
        F.when(F.col("sum_t") < n3n, h_val > crit).alias("significant"),
    )


@query(
    "fleiss_kappa_langid",
    """
    WITH r AS (
      SELECT CAST(
               CASE WHEN 20 * len(list_filter(string_split(lower(text), ' '),
                      w -> list_contains(string_split(
                        'the a of and to in is for on with', ' '), w)))
                    >= len(string_split(lower(text), ' '))
                    THEN 1 ELSE 0 END
             + CASE WHEN 100 * len(list_filter(string_split(lower(text), ' '),
                      w -> list_contains(string_split(
                        'the a of and to in is for on with', ' '), w)))
                    >= 3 * len(string_split(lower(text), ' '))
                    THEN 1 ELSE 0 END
             + CASE WHEN position(' the ' IN ' ' || lower(text) || ' ') > 0
                    THEN 1 ELSE 0 END AS BIGINT) AS n1
      FROM documents
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(n1) AS HUGEINT) AS t1,
             CAST(sum(n1 * n1 + (3 - n1) * (3 - n1) - 3) AS HUGEINT) AS a
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(t1 AS BIGINT) AS votes_en,
           CAST(3 * n - t1 AS BIGINT) AS votes_not_en,
           CASE WHEN 2 * (9 * n * n - t1 * t1 - (3 * n - t1) * (3 * n - t1))
                     <> 0
                THEN round(CAST(3 * n * a
                                - 2 * (t1 * t1 + (3 * n - t1) * (3 * n - t1))
                                AS DOUBLE)
                           / CAST(2 * (9 * n * n - t1 * t1
                                  - (3 * n - t1) * (3 * n - t1)) AS DOUBLE),
                           6)
           END AS fleiss_kappa
    FROM s
    """,
)
def fleiss_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over THREE deterministic language-ID raters
    (stopword ratio ≥ 5% and ≥ 3% — both cross-multiplied to integer
    predicates 20·stop ≥ tot and 100·stop ≥ 3·tot — plus a padded
    ' the ' substring probe): the n-rater agreement statistic
    cohens_kappa_langid can't express. With n = 3 raters and 2
    categories the whole statistic collapses to integers — per doc
    only the en-vote count v ∈ {0..3} matters, P̄ = Σ(v² + (3−v)² −
    3)/(6N) and P̄e = (T1² + T0²)/(9N²), so κ = (3N·A − 2(T1²+T0²)) /
    (2(9N² − T1² − T0²)) is ONE double division of two exact integers
    (DECIMAL(38,0)/HUGEINT: 9N² wraps int64 exactly at the 10^9-doc
    scale this is for). Unanimous single-category corpora drive the
    denominator to 0 — guarded by the integer compare, NULL in both
    engines.

    Scale shape: one map-side-combinable agg over the corpus; the
    kappa arithmetic runs on a 1-row frame. No joins, no windows."""
    docs = load(spark, sf_dir, "documents")
    stoparr = F.split(F.lit(_STOPWORDS), " ", -1)
    ws = words(F.col("text"))
    stop = F.size(
        F.filter(ws, lambda w: F.array_contains(stoparr, w))
    ).cast("bigint")
    tot = F.size(ws).cast("bigint")
    v = (
        F.when(20 * stop >= tot, 1).otherwise(0)
        + F.when(100 * stop >= 3 * tot, 1).otherwise(0)
        + F.when(
            F.instr(
                F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")),
                " the ",
            )
            > 0,
            1,
        ).otherwise(0)
    ).cast("bigint")
    d38 = "decimal(38,0)"
    s = docs.select(v.alias("n1")).agg(
        F.count("*").cast(d38).alias("n"),
        F.sum("n1").cast(d38).alias("t1"),
        F.sum(
            F.col("n1") * F.col("n1")
            + (3 - F.col("n1")) * (3 - F.col("n1"))
            - 3
        )
        .cast(d38)
        .alias("a"),
    )
    n, t1, a = F.col("n"), F.col("t1"), F.col("a")
    t0 = 3 * n - t1
    den = 2 * (9 * n * n - t1 * t1 - t0 * t0)
    num = 3 * n * a - 2 * (t1 * t1 + t0 * t0)
    return s.select(
        n.cast("bigint").alias("n_docs"),
        t1.cast("bigint").alias("votes_en"),
        t0.cast("bigint").alias("votes_not_en"),
        F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("fleiss_kappa"),
    )


@query(
    "dedup_savings_report",
    f"""
    WITH toks AS (
      SELECT doc_id, source, md5(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
      FROM documents
    ),
    exact_keep AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ),
    lsh AS (SELECT doc_id, keep FROM ({_ORACLE_REG["dedup_clusters"]}) c),
    flags AS (
      SELECT t.doc_id, t.source, t.tokens,
             CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS keep_exact,
             CASE WHEN lsh.doc_id IS NULL OR lsh.keep = 1
                  THEN 1 ELSE 0 END AS keep_lsh
      FROM toks t
      LEFT JOIN exact_keep e ON t.doc_id = e.doc_id
      LEFT JOIN lsh ON t.doc_id = lsh.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS tokens_total,
           CAST(sum(keep_exact) AS BIGINT) AS docs_after_exact,
           CAST(sum(keep_exact * tokens) AS BIGINT) AS tokens_after_exact,
           CAST(sum(keep_lsh) AS BIGINT) AS docs_after_lsh,
           CAST(sum(keep_lsh * tokens) AS BIGINT) AS tokens_after_lsh,
           CAST((sum(tokens) - sum(keep_lsh * tokens)) * 1000
                // sum(tokens) AS BIGINT) AS lsh_savings_permille
    FROM flags GROUP BY source
    """,
)
def dedup_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup SAVINGS report a pretraining pipeline reads before
    choosing its dedup tier: per source, document and token counts
    surviving (a) exact dedup (min-doc_id winner per md5(text), the
    dedup_exact law) and (b) near-dup cluster dedup (one canonical
    doc per MinHash-LSH connected component, the dedup_clusters law —
    unclustered docs survive by definition), with the token savings
    as an exact floored permille. Composes the two dedup families
    into the budget number ('LSH dedup buys 4.1% fewer tokens —
    worth the cluster pass?') instead of pair lists.

    Scale shape: the exact tier is one hash agg; the LSH tier is the
    pointer-jumping CC the cluster query already bounds (banded
    candidates, never all-pairs); this report adds two broadcastable
    keep-set joins and one per-source rollup on top. Token counts
    ride the same ' '-split law as text_tokens.

    Oracle note: the cluster CTE is dedup_clusters' own registered
    oracle embedded verbatim, so the two queries can never drift."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ", -1)).cast("bigint").alias(
            "tokens"
        ),
        F.md5("text").alias("h"),
    )
    exact_keep = toks.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    lsh = dedup_clusters(spark, sf_dir).select("doc_id", "keep")
    flags = (
        toks.join(
            exact_keep.select("doc_id", F.lit(1).alias("keep_exact")),
            "doc_id",
            "left",
        )
        .join(lsh, "doc_id", "left")
        .select(
            "source",
            "tokens",
            F.coalesce("keep_exact", F.lit(0)).alias("keep_exact"),
            F.when(
                F.col("keep").isNull() | (F.col("keep") == 1), 1
            )
            .otherwise(0)
            .alias("keep_lsh"),
        )
    )
    return flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("tokens_total"),
        F.sum("keep_exact").cast("bigint").alias("docs_after_exact"),
        F.sum(F.col("keep_exact") * F.col("tokens"))
        .cast("bigint")
        .alias("tokens_after_exact"),
        F.sum("keep_lsh").cast("bigint").alias("docs_after_lsh"),
        F.sum(F.col("keep_lsh") * F.col("tokens"))
        .cast("bigint")
        .alias("tokens_after_lsh"),
        F.expr(
            "(sum(tokens) - sum(keep_lsh * tokens)) * 1000 div sum(tokens)"
        )
        .cast("bigint")
        .alias("lsh_savings_permille"),
    )


@query(
    "negative_sampling_contrastive",
    f"""
    WITH {_MINHASH_SIG_CTES},
    coll AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    cand AS (
      SELECT d.doc_id AS anchor, i.i AS neg_slot,
             (d.doc_id + 1
              + ('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR)
                                    || ':' || CAST(i.i AS VARCHAR)), 1, 15)
                )::BIGINT % (nn.n - 1)) % nn.n AS neg
      FROM documents d
      CROSS JOIN nn
      CROSS JOIN (SELECT unnest([0, 1]) AS i) i
      WHERE nn.n > 1
    )
    SELECT anchor, neg_slot, neg
    FROM cand
    WHERE NOT EXISTS (
      SELECT 1 FROM coll
      WHERE coll.doc_a = least(cand.anchor, cand.neg)
        AND coll.doc_b = greatest(cand.anchor, cand.neg)
    )
    """,
)
def negative_sampling_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negative pairs with an LSH near-dup
    veto: per anchor doc, two pseudo-random partners drawn by pure
    hash arithmetic over the DENSE doc_id ring — neg = (id + 1 +
    md5('neg:'||id||':'||slot) mod (N−1)) mod N, structurally ≠
    anchor since the offset lives in [1, N−1] — then any pair that
    collides in a MinHash-LSH band is dropped, because a 'negative'
    that is actually a near-duplicate of its anchor teaches the
    embedding model the exact opposite of the truth (the same
    candidate law the dedup family uses, here as a VETO).

    Determinism/scale: sampling is a scalar hash expression — zero
    shuffles, reproducible across runs/partitions (stratified_sample
    convention); the veto is one left-anti join against the banded
    candidate set (never all-pairs), orientation-normalized with
    least/greatest. The N > 1 gate keeps the modulus positive —
    single-doc corpora emit an EMPTY pair set in both engines.

    Ring note: doc_id density is a property of this corpus layout; a
    sparse-id corpus would first zipWithIndex/row_number into a dense
    ring (one extra window), same law after."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    nn = docs.agg(F.count("*").cast("bigint").alias("n"))
    cand = (
        docs.crossJoin(F.broadcast(nn))
        .filter(F.col("n") > 1)
        .select(
            F.col("doc_id").alias("anchor"),
            F.explode(F.array(F.lit(0), F.lit(1))).alias("neg_slot"),
            "n",
        )
        .select(
            "anchor",
            "neg_slot",
            (
                (
                    F.col("anchor")
                    + 1
                    + md5_long(
                        F.concat(
                            F.lit("neg:"),
                            F.col("anchor").cast("string"),
                            F.lit(":"),
                            F.col("neg_slot").cast("string"),
                        )
                    )
                    % (F.col("n") - 1)
                )
                % F.col("n")
            ).alias("neg"),
        )
    )
    coll = _band_pairs(_lsh_bands(_doc_grams(spark, sf_dir))).select(
        "doc_a", "doc_b"
    )
    return cand.join(
        coll,
        (F.least(F.col("anchor"), F.col("neg")) == F.col("doc_a"))
        & (F.greatest(F.col("anchor"), F.col("neg")) == F.col("doc_b")),
        "left_anti",
    )


@query(
    "jains_fairness_index",
    """
    WITH h AS (
      SELECT doc_id % 53 AS host, CAST(count(*) AS BIGINT) AS x
      FROM documents GROUP BY doc_id % 53
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n_hosts,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(max(x) AS BIGINT) AS max_x,
             CAST(min(x) AS BIGINT) AS min_x
      FROM h
    )
    SELECT CAST(n_hosts AS BIGINT) AS n_hosts,
           CAST(sx AS BIGINT) AS total_fetches,
           min_x, max_x,
           round(CAST(sx * sx AS DOUBLE)
                 / CAST(n_hosts * sxx AS DOUBLE), 6) AS jain_index
    FROM s
    """,
)
def jains_fairness_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jain's fairness index of the per-host fetch allocation —
    J = (Σx)²/(n·Σx²) over the same host ledger the breaker and UCB
    queries read: 1.0 means the politeness scheduler spread the budget
    perfectly evenly, 1/n means one host ate everything. The scalar
    the domain_budget_allocation and adaptive_host_throttle knobs are
    ultimately tuned against (skew in = unfair out), and the first
    number to check when a crawl 'slows down' because a hot host
    monopolized the rounds. Both sums are exact integers
    (HUGEINT/DECIMAL(38,0): Σx² ≈ 10^17 at 10^9 fetches over 10^4
    hosts); J is ONE double division of two exact integers. Σx > 0
    whenever any host exists, so no guard branch is reachable on a
    nonempty ledger (an EMPTY ledger still emits one row — ungrouped
    aggregates always do — with n_hosts = 0 and NULL stats, the same
    in both engines).

    Scale shape: one map-side-combinable hash agg to the hosts frame,
    one scalar rollup. The ledger is touched once."""
    docs = load(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    h = docs.groupBy((F.col("doc_id") % 53).alias("host")).agg(
        F.count("*").cast("bigint").alias("x")
    )
    s = h.agg(
        F.count("*").cast(d38).alias("n_hosts"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
        F.max("x").cast("bigint").alias("max_x"),
        F.min("x").cast("bigint").alias("min_x"),
    )
    return s.select(
        F.col("n_hosts").cast("bigint").alias("n_hosts"),
        F.col("sx").cast("bigint").alias("total_fetches"),
        "min_x",
        "max_x",
        F.round(
            (F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n_hosts") * F.col("sxx")).cast("double"),
            6,
        ).alias("jain_index"),
    )


@query(
    "hash_uniformity_audit",
    """
    WITH b AS (
      SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 256 AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    ),
    dense AS (
      SELECT CAST(range AS BIGINT) AS bucket, coalesce(b.cnt, 0) AS cnt
      FROM range(256) LEFT JOIN b ON CAST(range AS BIGINT) = b.bucket
    ),
    cum AS (
      SELECT bucket,
             CAST(sum(cnt) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS c,
             CAST((SELECT sum(cnt) FROM dense) AS BIGINT) AS n
      FROM dense
    ),
    d AS (
      SELECT CAST(max(abs(256 * c - (bucket + 1) * n)) AS HUGEINT)
               AS d_num,
             CAST(max(n) AS HUGEINT) AS n
      FROM cum
    )
    SELECT CAST(n AS BIGINT) AS n_keys,
           CAST(d_num AS BIGINT) AS d_num,
           round(CAST(d_num AS DOUBLE) / CAST(256 * n AS DOUBLE), 6)
             AS ks_d,
           1000000 * d_num * d_num
             > CAST(1844164 AS HUGEINT) * 65536 * n AS nonuniform
    FROM d
    """,
)
def hash_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS goodness-of-fit of the md5 bucket hash against the uniform
    law — the audit behind EVERY sketch and shard in this engine (the
    Bloom/cuckoo shards, the LSH bands, the stratified/md5 sample
    gates, the postings term buckets all assume hash(key) % B is
    uniform; a biased hash silently skews every one of them). The KS
    statistic over the 256-bucket ECDF is exact: D·256N =
    max|256·cum_b − (b+1)·N| is an integer, and the 95% rejection
    D > 1.358/√N cross-multiplies to the pure-integer verdict
    10^6·D_num² > 1844164·65536·N (1.358² = 1.844164 exact) — no
    sqrt, no division, bit-identical across engines; ks_d rides along
    rounded.

    Scale shape: one hash agg to 256 buckets, a 256-row densify +
    cumulative window, one scalar rollup. The corpus is touched
    once."""
    docs = load(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    b = docs.groupBy(
        (md5_long(F.col("doc_id").cast("string")) % 256).alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("cnt"))
    dense = (
        spark.range(256)
        .select(F.col("id").cast("bigint").alias("bucket"))
        .join(b, "bucket", "left")
        .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    tot = dense.agg(F.sum("cnt").cast("bigint").alias("n"))
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dense.select(
        "bucket", F.sum("cnt").over(w_cum).alias("c")
    ).crossJoin(F.broadcast(tot))
    d = cum.agg(
        F.max(
            F.abs(256 * F.col("c") - (F.col("bucket") + 1) * F.col("n"))
        )
        .cast(d38)
        .alias("d_num"),
        F.max("n").cast(d38).alias("n"),
    )
    return d.select(
        F.col("n").cast("bigint").alias("n_keys"),
        F.col("d_num").cast("bigint").alias("d_num"),
        F.round(
            F.col("d_num").cast("double") / (256 * F.col("n")).cast("double"),
            6,
        ).alias("ks_d"),
        (
            F.lit(1000000).cast(d38) * F.col("d_num") * F.col("d_num")
            > F.lit(1844164).cast(d38) * 65536 * F.col("n")
        ).alias("nonuniform"),
    )


@query(
    "postings_gap_stats",
    """
    WITH posting AS (
      SELECT DISTINCT t, doc_id
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
            FROM documents)
    ),
    gaps AS (
      SELECT ('0x' || substr(md5(t), 1, 15))::BIGINT % 16 AS term_bucket,
             doc_id - lag(doc_id) OVER (PARTITION BY t ORDER BY doc_id)
               AS gap
      FROM posting
    )
    SELECT term_bucket,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(gap) AS BIGINT) AS gap_sum,
           CAST(max(gap) AS BIGINT) AS max_gap,
           round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS mean_gap
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY term_bucket
    """,
)
def postings_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-id gap statistics per posting-list term bucket — the
    compression-planning number for the postings index
    (sources/postings.py): delta-encoded posting lists cost
    ~log2(gap) bits per entry, so mean/max gap per term bucket says
    which buckets compress well and which (hapax-heavy, huge-gap)
    should stay raw. Gaps are exact integer differences over each
    term's doc_id-ordered posting list (one lag window partitioned by
    term); the per-bucket rollup sums exact integers, with ONE
    division per bucket row for the mean. First postings (no
    predecessor) are excluded by the NULL gap filter in both engines.

    Scale shape: distinct (term, doc) pairs → one window partitioned
    by term (the shuffle the index build already pays) → a 16-row
    rollup. Bucket = md5(term) % 16, the SAME routing law the real
    postings index partitions by, so these stats map 1:1 onto its
    Hive layout."""
    docs = load(spark, sf_dir, "documents")
    posting = (
        docs.select(
            "doc_id", F.explode(words(F.col("text"))).alias("t")
        )
        .distinct()
    )
    w = Window.partitionBy("t").orderBy("doc_id")
    gaps = posting.select(
        (md5_long(F.col("t")) % 16).alias("term_bucket"),
        (F.col("doc_id") - F.lag("doc_id").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("term_bucket").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("gap_sum"),
        F.max("gap").cast("bigint").alias("max_gap"),
        F.round(
            F.sum("gap").cast("double") / F.count("*"), 6
        ).alias("mean_gap"),
    )


@query(
    "doc_length_lognormal_fit",
    """
    WITH lens AS (
      SELECT n_chars AS len, CAST(count(*) AS BIGINT) AS cnt
      FROM documents WHERE n_chars > 0 GROUP BY n_chars
    ),
    folded AS (
      SELECT sum(cnt) OVER w AS n,
             sum(cnt * ln(CAST(len AS DOUBLE))) OVER w AS s1,
             sum(cnt * ln(CAST(len AS DOUBLE))
                     * ln(CAST(len AS DOUBLE))) OVER w AS s2,
             row_number() OVER (ORDER BY len DESC) AS rn
      FROM lens
      WINDOW w AS (ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    med AS (
      SELECT min(len) AS sample_median
      FROM (
        SELECT len,
               sum(cnt) OVER (ORDER BY len ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS c,
               (SELECT sum(cnt) FROM lens) AS n
        FROM lens
      ) t
      WHERE 2 * c >= n
    )
    SELECT CAST(folded.n AS BIGINT) AS n_docs,
           round(folded.s1 / folded.n, 6) AS mu,
           round(sqrt(greatest(folded.s2 / folded.n
                 - (folded.s1 / folded.n) * (folded.s1 / folded.n),
                 0.0)), 6) AS sigma,
           round(exp(folded.s1 / folded.n), 6) AS fitted_median,
           CAST(med.sample_median AS BIGINT) AS sample_median
    FROM folded CROSS JOIN med WHERE folded.rn = 1
    """,
)
def doc_length_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal method-of-moments fit of the document-length
    distribution — the parametric summary a shard planner uses to
    size batches and predict tail lengths (web doc lengths are
    canonically lognormal-ish; a fitted median far from the sample
    median says the tail assumption is wrong, which matters when
    maxPartitionBytes is tuned to E[len]). Lengths collapse to the
    DISTINCT-length frame first (exact integer counts; bounded by the
    length domain, never by docs), so the ln/ln² moment sums fold as
    ORDERED cumulative windows over that small frame — one canonical
    float order in both engines. The variance is clamped at 0 before
    the sqrt (greatest(·,0) on BOTH sides): under a constant-length
    corpus the two moment terms cancel to a ±1-ulp residual whose
    sign is formally unspecified, and the clamp keeps σ = 0 instead
    of NaN. The sample median is the exact order statistic
    (2·cum ≥ N on integers).

    Scale shape: one hash agg to the distinct-length frame, windows
    over that frame only, a 1-row output."""
    docs = load(spark, sf_dir, "documents")
    lens = (
        docs.filter(F.col("n_chars") > 0)
        .groupBy(F.col("n_chars").alias("len"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    lnl = F.log(F.col("len").cast("double"))
    w_cum = Window.orderBy("len").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = lens.select(
        F.sum("cnt").over(w_cum).alias("n"),
        F.sum(F.col("cnt") * lnl).over(w_cum).alias("s1"),
        F.sum(F.col("cnt") * lnl * lnl).over(w_cum).alias("s2"),
        F.row_number().over(Window.orderBy(F.desc("len"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    tot = lens.agg(F.sum("cnt").alias("nn"))
    med = (
        lens.select(
            "len", F.sum("cnt").over(w_cum).alias("c")
        )
        .crossJoin(F.broadcast(tot))
        .filter(2 * F.col("c") >= F.col("nn"))
        .agg(F.min("len").alias("sample_median"))
    )
    mu = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    return folded.crossJoin(F.broadcast(med)).select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(mu, 6).alias("mu"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("sigma"),
        F.round(F.exp(mu), 6).alias("fitted_median"),
        F.col("sample_median").cast("bigint").alias("sample_median"),
    )


@query(
    "wilson_host_ranking",
    """
    WITH ledger AS (
      SELECT doc_id % 53 AS host,
             CASE WHEN ('0x' || substr(md5('err:' || CAST(doc_id AS VARCHAR)),
                        1, 15))::BIGINT % 100 >= doc_id % 53
                  THEN 1 ELSE 0 END AS ok
      FROM documents
    ),
    h AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ok) AS BIGINT) AS x
      FROM ledger GROUP BY host
    ),
    scored AS (
      SELECT host, n, x,
             ((CAST(x AS DOUBLE) + 1.9208) / (n + 3.8416)
              - (1.96 / (n + 3.8416))
                * sqrt(CAST(x AS DOUBLE) * (n - x) / n + 0.9604))
               AS lo
      FROM h
    )
    SELECT CAST(row_number() OVER (ORDER BY lo DESC, host) AS INT) AS rank,
           host, n AS attempts, x AS successes,
           round(lo, 6) AS wilson_lower
    FROM scored
    QUALIFY row_number() OVER (ORDER BY lo DESC, host) <= 10
    """,
)
def wilson_host_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosts ranked by the Wilson score LOWER bound of their fetch
    success rate (z = 1.96) — the small-sample-honest ranking: a host
    that is 2/2 ranks BELOW a host that is 90/100, because the
    interval, not the point estimate, is what you'd bet a crawl
    budget on. The pessimistic complement to ucb_host_selection's
    optimism (UCB explores uncertain hosts; Wilson trusts proven
    ones — schedulers use UCB to probe and Wilson to commit).
    lower = (x + z²/2)/(n + z²) − z/(n + z²)·√(x(n−x)/n + z²/4) with
    the z constants pre-folded to exact literals (1.9208, 3.8416,
    0.9604); all inputs exact integers, the float tree identical in
    both engines, scores separated far above ulp scale, host breaks
    exact ties, output rounded to 6 dp.

    Scale shape: one hash agg to the hosts frame + one top-k window
    over it — same footprint as ucb_host_selection."""
    docs = load(spark, sf_dir, "documents")
    host = (F.col("doc_id") % 53).alias("host")
    ok = (
        md5_long(F.concat(F.lit("err:"), F.col("doc_id").cast("string")))
        % 100
        >= F.col("doc_id") % 53
    ).cast("int")
    h = docs.select(host, ok.alias("ok")).groupBy("host").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("x"),
    )
    lo = (
        (F.col("x").cast("double") + 1.9208) / (F.col("n") + 3.8416)
        - (F.lit(1.96) / (F.col("n") + 3.8416))
        * F.sqrt(
            F.col("x").cast("double")
            * (F.col("n") - F.col("x"))
            / F.col("n")
            + 0.9604
        )
    )
    w = Window.orderBy(F.desc("lo"), F.asc("host"))
    return (
        h.select("host", "n", "x", lo.alias("lo"))
        .select(
            F.row_number().over(w).cast("int").alias("rank"),
            "host",
            F.col("n").alias("attempts"),
            F.col("x").alias("successes"),
            F.round("lo", 6).alias("wilson_lower"),
        )
        .filter(F.col("rank") <= 10)
    )


@query(
    "char_entropy_lang",
    """
    WITH chars AS (
      SELECT lang, unnest(string_split(lower(text), '')) AS ch
      FROM documents
    ),
    c AS (
      SELECT lang, ch, CAST(count(*) AS BIGINT) AS cnt
      FROM chars GROUP BY lang, ch
    ),
    folded AS (
      SELECT lang,
             sum(cnt) OVER w AS t,
             sum(cnt * ln(CAST(cnt AS DOUBLE))) OVER w AS s,
             count(*) OVER w AS n_distinct,
             row_number() OVER (PARTITION BY lang ORDER BY ch DESC) AS rn
      FROM c
      WINDOW w AS (PARTITION BY lang ORDER BY ch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT lang, CAST(t AS BIGINT) AS n_chars_total,
           CAST(n_distinct AS BIGINT) AS n_distinct_chars,
           round(ln(CAST(t AS DOUBLE)) - s / t, 6) AS entropy_nats
    FROM folded WHERE rn = 1
    """,
)
def char_entropy_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character entropy per language (nats) — the
    alphabet-level signal the word-level family (word_burstiness,
    zipf_slope, source_entropy) can't see: languages and scripts have
    characteristic character entropies, and a corpus slice whose
    entropy drifts from its language's band is boilerplate, encoding
    damage, or mislabeled text. Computed as H = ln(T) − Σc·ln(c)/T
    over EXACT per-(lang, char) integer counts (the same
    empty-delimiter split law in both engines, verified single-char
    lists), with the Σc·ln(c) fold as an ORDERED cumulative window
    over the alphabet-sized frame — one canonical float order. A
    single-character alphabet cancels to exactly 0 (ln T − T·ln T/T:
    same double subtracted from itself).

    Scale shape: one (lang, char) hash agg off the exploded corpus
    (map-side combined; the frame is |langs|·|alphabet|), windows
    over that small frame only."""
    docs = load(spark, sf_dir, "documents")
    c = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), "", -1)).alias("ch"),
        )
        .groupBy("lang", "ch")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w_cum = Window.partitionBy("lang").orderBy("ch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_last = Window.partitionBy("lang").orderBy(F.desc("ch"))
    folded = c.select(
        "lang",
        F.sum("cnt").over(w_cum).alias("t"),
        F.sum(F.col("cnt") * F.log(F.col("cnt").cast("double")))
        .over(w_cum)
        .alias("s"),
        F.count("*").over(w_cum).alias("n_distinct"),
        F.row_number().over(w_last).alias("rn"),
    ).filter(F.col("rn") == 1)
    return folded.select(
        "lang",
        F.col("t").cast("bigint").alias("n_chars_total"),
        F.col("n_distinct").cast("bigint").alias("n_distinct_chars"),
        F.round(
            F.log(F.col("t").cast("double")) - F.col("s") / F.col("t"), 6
        ).alias("entropy_nats"),
    )


@query(
    "source_overlap_matrix",
    f"""
    WITH v AS ({_ORACLE_REG["dedup_lsh_verified_jaccard"]}),
    srcs AS (SELECT doc_id, source FROM documents),
    labeled AS (
      SELECT least(sa.source, sb.source) AS src_a,
             greatest(sa.source, sb.source) AS src_b,
             v.doc_a, v.doc_b, sa.source AS s_of_a, sb.source AS s_of_b
      FROM v
      JOIN srcs sa ON sa.doc_id = v.doc_a
      JOIN srcs sb ON sb.doc_id = v.doc_b
    ),
    pairs AS (
      SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs
      FROM labeled GROUP BY src_a, src_b
    ),
    sides AS (
      SELECT src_a, src_b, doc_a AS doc, s_of_a AS s FROM labeled
      UNION ALL
      SELECT src_a, src_b, doc_b, s_of_b FROM labeled
    ),
    covered AS (
      SELECT src_a, src_b,
             CAST(count(DISTINCT CASE WHEN s = src_a THEN doc END)
               AS BIGINT) AS docs_a_covered,
             CAST(count(DISTINCT CASE WHEN s = src_b THEN doc END)
               AS BIGINT) AS docs_b_covered
      FROM sides GROUP BY src_a, src_b
    ),
    totals AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
      GROUP BY source
    )
    SELECT p.src_a, p.src_b, p.n_pairs,
           c.docs_a_covered, c.docs_b_covered,
           CAST(c.docs_a_covered * 1000 // ta.n AS BIGINT)
             AS share_a_permille,
           CAST(c.docs_b_covered * 1000 // tb.n AS BIGINT)
             AS share_b_permille
    FROM pairs p
    JOIN covered c ON p.src_a = c.src_a AND p.src_b = c.src_b
    JOIN totals ta ON ta.source = p.src_a
    JOIN totals tb ON tb.source = p.src_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The source-overlap matrix a dataset-mixing decision reads:
    for every (source, source) pair — diagonal included, that's
    internal duplication — the number of VERIFIED near-dup pairs
    crossing them, how many docs of each side are covered by a
    near-twin on the other, and those covered counts as exact floored
    permille of each source's size ('12% of source B is already in
    source A — weight it down before training'). Composes the
    enforced LSH→verify pipeline (dedup_lsh_verified_jaccard's
    registered oracle embedded verbatim, zero drift) with two
    broadcast-sized source joins; on the diagonal both covered
    columns equal the distinct docs in same-source pairs by
    construction (documented).

    Scale shape: everything downstream of the verified-pairs frame is
    |sources|²-bounded; the expensive step is the banding+verify pass
    the dedup family already pays (and caches)."""
    v = dedup_lsh_verified_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    docs = load(spark, sf_dir, "documents")
    srcs = docs.select("doc_id", "source")
    labeled = (
        v.join(
            srcs.select(
                F.col("doc_id").alias("doc_a"),
                F.col("source").alias("s_of_a"),
            ),
            "doc_a",
        )
        .join(
            srcs.select(
                F.col("doc_id").alias("doc_b"),
                F.col("source").alias("s_of_b"),
            ),
            "doc_b",
        )
        .select(
            F.least("s_of_a", "s_of_b").alias("src_a"),
            F.greatest("s_of_a", "s_of_b").alias("src_b"),
            "doc_a",
            "doc_b",
            "s_of_a",
            "s_of_b",
        )
    )
    pairs = labeled.groupBy("src_a", "src_b").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    sides = labeled.select(
        "src_a", "src_b", F.col("doc_a").alias("doc"), F.col("s_of_a").alias("s")
    ).unionByName(
        labeled.select(
            "src_a",
            "src_b",
            F.col("doc_b").alias("doc"),
            F.col("s_of_b").alias("s"),
        )
    )
    covered = sides.groupBy("src_a", "src_b").agg(
        F.countDistinct(
            F.when(F.col("s") == F.col("src_a"), F.col("doc"))
        )
        .cast("bigint")
        .alias("docs_a_covered"),
        F.countDistinct(
            F.when(F.col("s") == F.col("src_b"), F.col("doc"))
        )
        .cast("bigint")
        .alias("docs_b_covered"),
    )
    totals = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return (
        pairs.join(covered, ["src_a", "src_b"])
        .join(
            F.broadcast(
                totals.select(
                    F.col("source").alias("src_a"), F.col("n").alias("na")
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                totals.select(
                    F.col("source").alias("src_b"), F.col("n").alias("nb")
                )
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_pairs",
            "docs_a_covered",
            "docs_b_covered",
            F.expr("docs_a_covered * 1000 div na")
            .cast("bigint")
            .alias("share_a_permille"),
            F.expr("docs_b_covered * 1000 div nb")
            .cast("bigint")
            .alias("share_b_permille"),
        )
    )


@query(
    "lsh_candidate_precision",
    f"""
    WITH {_MINHASH_SQL_CTES},
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.doc_a,
             CASE WHEN CAST(len(list_intersect(ga.grams, gb.grams))
                    AS DOUBLE)
                  / (len(ga.grams) + len(gb.grams)
                     - len(list_intersect(ga.grams, gb.grams))) >= 0.2
                  THEN 1 ELSE 0 END AS hit
      FROM cands c
      JOIN shingled ga ON ga.doc_id = c.doc_a
      JOIN shingled gb ON gb.doc_id = c.doc_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(hit) AS BIGINT) AS n_verified,
           CAST(count(*) - sum(hit) AS BIGINT) AS n_false_positives,
           CASE WHEN count(*) > 0
                THEN CAST(sum(hit) * 1000 // count(*) AS BIGINT)
           END AS precision_permille
    FROM verified
    """,
)
def lsh_candidate_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRECISION of the LSH banding stage: of all candidate pairs
    the bands emit, how many survive exact-Jaccard verification at
    the 0.2 threshold — THE tuning number for the (bands, rows)
    trade-off, because the verify join's cost is proportional to
    candidates and a precision collapse (too few rows per band) makes
    the 'never all-pairs' promise hollow in practice even though it
    holds in form. Counts are exact integers; precision is an exact
    floored permille, count-guarded for gram-free corpora (both
    engines NULL).

    Scale shape: the same banding self-join + verify join the dedup
    family pays (bounded by candidates, never all-pairs), folded to a
    single row map-side."""
    from pyspark.sql.functions import array_intersect, size

    grams = _doc_grams(spark, sf_dir)
    cands = _band_pairs(_lsh_bands(grams)).select("doc_a", "doc_b")
    ga = grams.select(
        F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a")
    )
    gb = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b")
    )
    inter = size(array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = (
        size(F.col("grams_a")) + size(F.col("grams_b")) - inter
    )
    verified = (
        cands.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            F.when(
                inter.cast("double") / union >= 0.2, 1
            )
            .otherwise(0)
            .alias("hit")
        )
    )
    return verified.agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum("hit").cast("bigint").alias("n_verified"),
        (F.count("*") - F.sum("hit")).cast("bigint").alias(
            "n_false_positives"
        ),
        F.when(
            F.count("*") > 0,
            F.expr("sum(hit) * 1000 div count(*)").cast("bigint"),
        ).alias("precision_permille"),
    )


@query(
    "ranker_agreement_spearman",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> w = 'vector')) AS BIGINT) AS tf,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df
      FROM base
    ),
    m AS (
      SELECT doc_id, tf, dl, n, avgdl, df,
             ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS bm25,
             tf * ln(CAST(n AS DOUBLE) / df) AS tfidf
      FROM base CROSS JOIN stats WHERE tf > 0
    ),
    ranked AS (
      SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r1,
             row_number() OVER (ORDER BY tfidf DESC, doc_id) AS r2
      FROM m
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS nm,
             CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
      FROM ranked
    )
    SELECT 'vector' AS term, nm AS n_matched, sum_d2,
           CASE WHEN nm >= 2
                THEN round(CAST(nm * nm * nm - nm - 6 * sum_d2 AS DOUBLE)
                           / (nm * nm * nm - nm), 6)
           END AS spearman_rho
    FROM s
    """,
)
def ranker_agreement_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do BM25 and plain TF-IDF agree on how to rank the docs matching
    the query term 'vector'? Spearman ρ between the two rankings — the
    IR-eval number that says whether the cheaper scorer is a safe
    fallback for this corpus (ρ → 1: skip the BM25 length
    normalization; ρ low: the corpus has the length skew BM25 exists
    for). Ranks are positional row_numbers with doc_id as the
    deterministic tiebreak (the cross-engine-exact convention — both
    scorers are identical IEEE trees, so the orderings match
    bit-for-bit), which makes Σd² an exact integer and
    ρ = (n³−n−6Σd²)/(n³−n) ONE double division of two exact integers;
    n < 2 guarded NULL.

    Scale shape: one tokenize pass to (tf, dl), a 1-row broadcast
    stats frame, two rank windows over the MATCHED frame only (df
    docs, not the corpus)."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.size(F.filter(F.col("w"), lambda x: x == F.lit("vector")))
        .cast("bigint")
        .alias("tf"),
        F.size("w").cast("bigint").alias("dl"),
    )
    stats = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum((F.col("tf") > 0).cast("bigint")).cast("bigint").alias("df"),
    )
    m = base.filter(F.col("tf") > 0).crossJoin(F.broadcast(stats))
    bm25 = (
        F.log(
            1
            + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        * F.col("tf")
        * 2.2
        / (
            F.col("tf")
            + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
        )
    )
    tfidf = F.col("tf") * F.log(
        F.col("n").cast("double") / F.col("df")
    )
    scored = m.select(bm25.alias("bm25"), tfidf.alias("tfidf"), "doc_id")
    ranked = scored.select(
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.desc("tfidf"), F.asc("doc_id")))
        .alias("r2"),
    )
    s = ranked.agg(
        F.count("*").cast("bigint").alias("nm"),
        F.sum(
            (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
        )
        .cast("bigint")
        .alias("sum_d2"),
    )
    n3n = F.col("nm") * F.col("nm") * F.col("nm") - F.col("nm")
    return s.select(
        F.lit("vector").alias("term"),
        F.col("nm").alias("n_matched"),
        "sum_d2",
        F.when(
            F.col("nm") >= 2,
            F.round(
                (n3n - 6 * F.col("sum_d2")).cast("double") / n3n, 6
            ),
        ).alias("spearman_rho"),
    )


@query(
    "mutual_nn_pairs",
    """
    WITH b AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN 4 ELSE 0 END
              + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
              + CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END) AS bucket
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS src, e.vec_id AS dst,
             list_cosine_similarity(a.embedding, e.embedding) AS cos
      FROM b a JOIN b e ON e.bucket = a.bucket AND e.vec_id <> a.vec_id
    ),
    top1 AS (
      SELECT src, dst, cos FROM (
        SELECT src, dst, cos,
               row_number() OVER (PARTITION BY src
                                  ORDER BY cos DESC, dst) AS rn
        FROM scored
      ) t WHERE rn = 1
    )
    SELECT t1.src AS vec_a, t1.dst AS vec_b, round(t1.cos, 4) AS cos
    FROM top1 t1
    JOIN top1 t2 ON t1.dst = t2.src AND t2.dst = t1.src
    WHERE t1.src < t1.dst
    """,
)
def mutual_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL nearest-neighbor pairs within sign-LSH buckets — the
    bitext/parallel-pair mining primitive: a pair where each vector is
    the other's top-1 is a far stronger match signal than a one-sided
    top-k hit (one-sided NN is asymmetric; hubs collect neighbors
    they don't reciprocate). Candidates are restricted to the same
    3-bit hyperplane-sign bucket as the whole ann_lsh family (per-
    bucket shuffle, never global all-pairs); top-1 per vector by
    (cos desc, vec_id) — the family's deterministic-order convention
    over identical IEEE cosine trees — then one self-join keeps only
    reciprocated pairs, orientation-normalized by vec_id.

    Scale shape: within-bucket pairing (the bucket law bounds the
    quadratic term), one rank window per side, one top1⋈top1 join on
    a frame of |vectors| rows."""
    emb = load(spark, sf_dir, "embeddings")
    bucket = (
        F.when(F.col("embedding")[0] > 0, 4).otherwise(0)
        + F.when(F.col("embedding")[1] > 0, 2).otherwise(0)
        + F.when(F.col("embedding")[2] > 0, 1).otherwise(0)
    )
    b = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    a = b.select(
        F.col("vec_id").alias("src"),
        F.col("embedding").alias("ea"),
        "bucket",
    )
    e = b.select(
        F.col("vec_id").alias("dst"),
        F.col("embedding").alias("eb"),
        F.col("bucket").alias("bucket2"),
    )
    scored = a.join(
        e,
        (F.col("bucket") == F.col("bucket2"))
        & (F.col("src") != F.col("dst")),
    ).select(
        "src", "dst", cosine(F.col("ea"), F.col("eb")).alias("cos")
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos"), F.asc("dst"))
    top1 = (
        scored.select(
            "src", "dst", "cos", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    t2 = top1.select(
        F.col("src").alias("src2"), F.col("dst").alias("dst2")
    )
    return (
        top1.join(
            t2,
            (F.col("dst") == F.col("src2"))
            & (F.col("dst2") == F.col("src")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(
            F.col("src").alias("vec_a"),
            F.col("dst").alias("vec_b"),
            F.round("cos", 4).alias("cos"),
        )
    )


@query(
    "join_cardinality_audit",
    """
    WITH k AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(count(*) AS HUGEINT) AS d,
             CAST(sum(c * c) AS HUGEINT) AS exact_rows
      FROM k
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(d AS BIGINT) AS n_keys,
           CAST(exact_rows AS BIGINT) AS exact_join_rows,
           CASE WHEN d > 0 THEN CAST(n * n // d AS BIGINT) END
             AS uniform_estimate,
           CASE WHEN d > 0 AND n > 0
                THEN CAST(exact_rows * 1000 // (n * n // d) AS BIGINT)
           END AS ratio_permille
    FROM s
    """,
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost-based optimizer's join-cardinality estimate, audited:
    for the events-table self-join on user_id, the textbook uniform
    estimate |A|·|B|/ndv(key) versus the EXACT output size Σ_k c_k²
    — their ratio (exact floored permille) IS the skew correction
    (1 + CV²) the uniformity assumption drops, and a ratio far above
    1000 is the number that explains why 'the optimizer said 10^9
    rows, the join produced 10^11' (complements join_skew_profile's
    per-key view with the single number the PLANNER got wrong). All
    counts exact; N² rides HUGEINT/DECIMAL(38,0) (10^20 at 10^10
    rows); both divisions are integer-floored; empty-table guarded
    NULL.

    Scale shape: one map-side-combining key agg, one scalar rollup —
    the estimate audit costs ~nothing next to the join it predicts."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    k = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("c"))
    s = k.agg(
        F.sum("c").cast(d38).alias("n"),
        F.count("*").cast(d38).alias("d"),
        F.sum(F.col("c") * F.col("c")).cast(d38).alias("exact_rows"),
    )
    est = F.expr("CAST(n * n div d AS decimal(38,0))")
    return s.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("d").cast("bigint").alias("n_keys"),
        F.col("exact_rows").cast("bigint").alias("exact_join_rows"),
        F.when(F.col("d") > 0, est.cast("bigint")).alias(
            "uniform_estimate"
        ),
        F.when(
            (F.col("d") > 0) & (F.col("n") > 0),
            F.expr(
                "CAST(exact_rows * 1000 div CAST(n * n div d AS"
                " decimal(38,0)) AS BIGINT)"
            ),
        ).alias("ratio_permille"),
    )


@query(
    "cliffs_delta",
    """
    WITH o AS (
      SELECT CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    v AS (
      SELECT cents,
             CAST(sum(g) AS BIGINT) AS cnt1,
             CAST(sum(1 - g) AS BIGINT) AS cnt0
      FROM o GROUP BY cents
    ),
    r AS (
      SELECT cnt1, cnt0,
             CAST(coalesce(sum(cnt0) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c0_lt,
             CAST(coalesce(sum(cnt0) OVER (ORDER BY cents
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               AS BIGINT) AS c0_gt
      FROM v
    ),
    s AS (
      SELECT CAST(sum(cnt1) AS HUGEINT) AS n1,
             CAST(sum(cnt0) AS HUGEINT) AS n0,
             CAST(sum(cnt1 * c0_lt) AS HUGEINT) AS wins,
             CAST(sum(cnt1 * c0_gt) AS HUGEINT) AS losses
      FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
           CAST(wins AS BIGINT) AS wins, CAST(losses AS BIGINT) AS losses,
           CASE WHEN n1 * n0 > 0
                THEN round(CAST(wins - losses AS DOUBLE)
                           / CAST(n1 * n0 AS DOUBLE), 6) END AS delta,
           CASE WHEN n1 * n0 = 0 THEN NULL
                WHEN abs(wins - losses) * 1000 < 147 * n1 * n0
                  THEN 'negligible'
                WHEN abs(wins - losses) * 1000 < 330 * n1 * n0
                  THEN 'small'
                WHEN abs(wins - losses) * 1000 < 474 * n1 * n0
                  THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM s
    """,
)
def cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal EFFECT SIZE for urgent-vs-rest order
    totals — the 'how much larger, practically?' companion to
    mann_whitney_u's 'is it significant?' (at web scale everything is
    significant; δ says whether anyone should care).
    δ = (#(x>y) − #(x<y))/(n1·n0) with wins/losses computed exactly
    from the distinct-value frame (group-1 count at each value × the
    OTHER group's strictly-below / strictly-above cumulative windows
    — ties contribute to neither side, the Cliff convention); the
    standard magnitude bands (0.147/0.33/0.474) are decided by the
    exact integer cross-compare |wins−losses|·1000 vs band·n1·n0 —
    the label can never disagree with the rounded δ across engines.

    Scale shape: identical to mann_whitney_u — one agg to the
    distinct-price frame, two cumulative windows over it, one scalar
    rollup."""
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.when(F.col("o_orderpriority").startswith("1-"), 1)
        .otherwise(0)
        .alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    v = o.groupBy("cents").agg(
        F.sum("g").cast("bigint").alias("cnt1"),
        F.sum(1 - F.col("g")).cast("bigint").alias("cnt0"),
    )
    w_lt = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    w_gt = Window.orderBy("cents").rowsBetween(1, Window.unboundedFollowing)
    r = v.select(
        "cnt1",
        F.coalesce(F.sum("cnt0").over(w_lt), F.lit(0)).alias("c0_lt"),
        F.coalesce(F.sum("cnt0").over(w_gt), F.lit(0)).alias("c0_gt"),
        "cnt0",
    )
    d38 = "decimal(38,0)"
    s = r.agg(
        F.sum("cnt1").cast(d38).alias("n1"),
        F.sum("cnt0").cast(d38).alias("n0"),
        F.sum(F.col("cnt1") * F.col("c0_lt")).cast(d38).alias("wins"),
        F.sum(F.col("cnt1") * F.col("c0_gt")).cast(d38).alias("losses"),
    )
    prod = F.col("n1") * F.col("n0")
    wl = F.abs(F.col("wins") - F.col("losses")) * 1000
    return s.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n0").cast("bigint").alias("n0"),
        F.col("wins").cast("bigint").alias("wins"),
        F.col("losses").cast("bigint").alias("losses"),
        F.when(
            prod > 0,
            F.round(
                (F.col("wins") - F.col("losses")).cast("double")
                / prod.cast("double"),
                6,
            ),
        ).alias("delta"),
        F.when(prod == 0, F.lit(None).cast("string"))
        .when(wl < 147 * prod, "negligible")
        .when(wl < 330 * prod, "small")
        .when(wl < 474 * prod, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


@query(
    "cochran_armitage_trend",
    """
    WITH e AS (
      SELECT CAST(hour(ts) AS BIGINT) AS w,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    h AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS x
      FROM e GROUP BY w
    ),
    s AS (
      SELECT CAST(sum(n) AS HUGEINT) AS nn,
             CAST(sum(x) AS HUGEINT) AS xx,
             CAST(sum(w * x) AS HUGEINT) AS swx,
             CAST(sum(w * n) AS HUGEINT) AS swn,
             CAST(sum(w * w * n) AS HUGEINT) AS swwn
      FROM h
    )
    SELECT CAST(nn AS BIGINT) AS n_events,
           CAST(xx AS BIGINT) AS n_hits,
           CAST(nn * swx - xx * swn AS DOUBLE) AS t_num,
           CAST(xx AS DOUBLE) * CAST(nn - xx AS DOUBLE)
             * CAST(nn * swwn - swn * swn AS DOUBLE) AS t_den,
           CASE WHEN xx > 0 AND xx < nn
                 AND nn * swwn - swn * swn > 0
                THEN CAST(nn AS DOUBLE)
                     * CAST(nn * swx - xx * swn AS DOUBLE)
                     * CAST(nn * swx - xx * swn AS DOUBLE)
                     / (CAST(xx AS DOUBLE) * CAST(nn - xx AS DOUBLE)
                        * CAST(nn * swwn - swn * swn AS DOUBLE))
                     > 3.8416
           END AS significant
    FROM s
    """,
)
def cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in the purchase
    proportion across the ordered hour-of-day scores 0..23 — the
    ordered-slices member of the proportion-test family: ab_test_zprop
    compares two slices, benjamini_hochberg sweeps m unordered slices,
    CA asks 'does the rate climb with the hour?' using the ordering
    itself (more powerful than chi-square when the alternative is
    monotone). The z² > 1.96² verdict evaluates
    z² = N·(N·Σwx − X·Σwn)² / (X(N−X)(N·Σw²n − (Σwn)²)) as ONE double
    expression of the exact integer components (identical IEEE tree
    both engines) behind exact-INTEGER guards on each factor —
    the fully-cross-multiplied decimal form was rejected in review
    (it wraps 38 digits above the tested envelope with divergent
    engine failure modes). Degenerate slices (all-hit / no-hit /
    single hour) fail a guard → NULL verdict in both engines.

    Scale shape: one map-side agg to the 24-row hour frame, one
    scalar rollup — the corpus is touched once."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    h = ev.select(
        F.hour("ts").cast("bigint").alias("w"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    ).groupBy("w").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("x"),
    )
    s = h.agg(
        F.sum("n").cast(d38).alias("nn"),
        F.sum("x").cast(d38).alias("xx"),
        F.sum(F.col("w") * F.col("x")).cast(d38).alias("swx"),
        F.sum(F.col("w") * F.col("n")).cast(d38).alias("swn"),
        F.sum(F.col("w") * F.col("w") * F.col("n")).cast(d38).alias("swwn"),
    )
    nn, xx = F.col("nn"), F.col("xx")
    t_num = nn * F.col("swx") - xx * F.col("swn")
    var_w = nn * F.col("swwn") - F.col("swn") * F.col("swn")
    # verdict as ONE double expression of the exact integer
    # components (identical tree in the oracle), with exact-integer
    # guards on each factor — the fully-cross-multiplied
    # 625·N·t_num² DECIMAL(38,0) form overflows above the tested
    # envelope with DIVERGENT engine failure modes (review finding,
    # session 14; same fix as mann_whitney_u); t_den is likewise a
    # double PRODUCT because the integer product X(N−X)·var wraps at
    # 10^10 events even though each factor fits
    t_den_d = (
        xx.cast("double") * (nn - xx).cast("double") * var_w.cast("double")
    )
    guard = (xx > 0) & (xx < nn) & (var_w > 0)
    z2 = (
        nn.cast("double")
        * t_num.cast("double")
        * t_num.cast("double")
        / t_den_d
    )
    return s.select(
        nn.cast("bigint").alias("n_events"),
        xx.cast("bigint").alias("n_hits"),
        t_num.cast("double").alias("t_num"),
        t_den_d.alias("t_den"),
        F.when(guard, z2 > 3.8416).alias("significant"),
    )


@query(
    "negative_binomial_fit",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    t AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT t.event_type, u.user_id,
             CAST(coalesce(k.c, 0) AS BIGINT) AS c
      FROM t CROSS JOIN u
      LEFT JOIN (
        SELECT event_type, user_id, count(*) AS c
        FROM events GROUP BY event_type, user_id
      ) k ON k.event_type = t.event_type AND k.user_id = u.user_id
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS nu,
             CAST(sum(c) AS HUGEINT) AS s1,
             CAST(sum(c * c) AS HUGEINT) AS s2
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(nu AS BIGINT) AS n_users,
           CAST(s1 AS BIGINT) AS n_events,
           round(CAST(s1 AS DOUBLE) / CAST(nu AS DOUBLE), 6) AS mean_c,
           round(CAST(nu * s2 - s1 * s1 AS DOUBLE)
                 / CAST(nu * nu AS DOUBLE), 6) AS var_c,
           nu * s2 - s1 * s1 > nu * s1 AS overdispersed,
           CASE WHEN nu * s2 - s1 * s1 > nu * s1
                THEN round(CAST(s1 * s1 AS DOUBLE)
                           / CAST(nu * s2 - s1 * s1 - nu * s1 AS DOUBLE), 6)
           END AS nb_r,
           CASE WHEN nu * s2 - s1 * s1 > 0
                THEN round(CAST(nu * s1 AS DOUBLE)
                           / CAST(nu * s2 - s1 * s1 AS DOUBLE), 6)
           END AS nb_p
    FROM s
    """,
)
def negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial method-of-moments fit of per-user event
    counts by type (zeros INCLUDED via the type × user densify —
    fitting only active users truncates the distribution and biases r
    upward): the overdispersion model behind events_fano_burstiness's
    verdict — Fano says 'not Poisson', the NB fit says WHICH
    clumped-arrivals model and with what parameters (r, p feed
    synthetic-load generators and tail forecasts). Every decision is
    integer: overdispersion is the exact compare N·S2 − S1² > N·S1
    (var > mean cross-multiplied), and both estimators collapse to
    single exact-integer ratios — r = S1²/(N·S2 − S1² − N·S1),
    p = N·S1/(N·S2 − S1²) — so each output is ONE double division
    (HUGEINT/DECIMAL(38,0): N·S2 ≈ 10^21 at 10^9 users). Poisson-or-
    under slices get NULL r (the guard IS the model check).

    Scale shape: one (type, user) count agg over OBSERVED pairs plus
    a 1-row broadcast user-universe count — the zero rows the
    statistics need are accounted for algebraically (they contribute
    nothing to S1/S2), never materialized; the oracle runs the
    explicit densify as the independent formulation."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    # the zero-densify is ALGEBRAIC, not material: zero counts add
    # nothing to S1/S2 and the user universe is one global scalar, so
    # the engine aggregates only the OBSERVED (type, user) frame and
    # broadcasts countDistinct(user_id) as nu — identical output to
    # the oracle's explicit types x users densify at a fraction of
    # the rows (review finding, session 14)
    u = ev.agg(F.countDistinct("user_id").cast(d38).alias("nu"))
    k = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("bigint").alias("c")
    )
    s = k.groupBy("event_type").agg(
        F.sum("c").cast(d38).alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast(d38).alias("s2"),
    ).crossJoin(F.broadcast(u))
    nu, s1, s2 = F.col("nu"), F.col("s1"), F.col("s2")
    var_num = nu * s2 - s1 * s1
    return s.select(
        "event_type",
        nu.cast("bigint").alias("n_users"),
        s1.cast("bigint").alias("n_events"),
        F.round(s1.cast("double") / nu.cast("double"), 6).alias("mean_c"),
        F.round(var_num.cast("double") / (nu * nu).cast("double"), 6).alias(
            "var_c"
        ),
        (var_num > nu * s1).alias("overdispersed"),
        F.when(
            var_num > nu * s1,
            F.round(
                (s1 * s1).cast("double")
                / (var_num - nu * s1).cast("double"),
                6,
            ),
        ).alias("nb_r"),
        F.when(
            var_num > 0,
            F.round((nu * s1).cast("double") / var_num.cast("double"), 6),
        ).alias("nb_p"),
    )


@query(
    "hill_tail_index",
    """
    WITH o AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, o_orderkey) AS rn
      FROM o
    ),
    thr AS (SELECT cents AS t FROM ranked WHERE rn = 101),
    folded AS (
      SELECT sum(ln(CAST(ranked.cents AS DOUBLE) / thr.t)) OVER (
               ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS s,
             row_number() OVER (ORDER BY rn DESC) AS last_rn
      FROM ranked CROSS JOIN thr WHERE rn <= 100
    )
    SELECT 100 AS k, CAST(thr.t AS BIGINT) AS threshold_cents,
           CASE WHEN folded.s > 0 THEN round(100.0 / folded.s, 6) END
             AS hill_alpha
    FROM folded CROSS JOIN thr WHERE folded.last_rn = 1
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index of order totals
    (k = 100 upper order statistics against the 101st as threshold)
    — the continuous-tail cousin of zipf_slope's rank-frequency fit
    and the number that decides whether means/variances of the value
    column are even finite-sample-stable (α ≤ 2: variance is a lie;
    α ≤ 1: so is the mean — at which point every average in a report
    is noise). Order statistics are exact ((cents desc, orderkey)
    row_number — deterministic under ties); the log-sum folds as an
    ORDERED cumulative window over the 100-row top frame; α = k/Σ is
    one division, guarded by Σ > 0 (an all-tied top emits NULL, not
    inf, in both engines). Corpora with n ≤ k+1 emit an empty frame
    (no 101st statistic exists) identically on both sides.

    Scale shape: a top-(k+1) rank (TakeOrderedAndProject shape — heads
    per partition, driver merge) then windows over k rows only."""
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    ranked = o.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), F.asc("o_orderkey")))
        .alias("rn"),
    ).filter(F.col("rn") <= 101)
    thr = ranked.filter(F.col("rn") == 101).select(
        F.col("cents").alias("t")
    )
    w_cum = Window.orderBy("rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = (
        ranked.filter(F.col("rn") <= 100)
        .crossJoin(F.broadcast(thr))
        .select(
            F.sum(
                F.log(F.col("cents").cast("double") / F.col("t"))
            )
            .over(w_cum)
            .alias("s"),
            F.row_number().over(Window.orderBy(F.desc("rn"))).alias(
                "last_rn"
            ),
        )
        .filter(F.col("last_rn") == 1)
    )
    return folded.crossJoin(F.broadcast(thr)).select(
        F.lit(100).alias("k"),
        F.col("t").cast("bigint").alias("threshold_cents"),
        F.when(F.col("s") > 0, F.round(100.0 / F.col("s"), 6)).alias(
            "hill_alpha"
        ),
    )


@query(
    "sessionization_timeout_sensitivity",
    """
    WITH g AS (
      SELECT epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      FROM events
    ),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events),
    b AS (
      SELECT CAST(coalesce(sum(CASE WHEN gap_ms > 900000 THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS b900,
             CAST(coalesce(sum(CASE WHEN gap_ms > 1800000 THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS b1800,
             CAST(coalesce(sum(CASE WHEN gap_ms > 3600000 THEN 1 ELSE 0 END),
                  0) AS BIGINT) AS b3600
      FROM g WHERE gap_ms IS NOT NULL
    )
    SELECT t.timeout_s, u.n_users,
           CASE t.timeout_s WHEN 900 THEN b.b900
                            WHEN 1800 THEN b.b1800
                            ELSE b.b3600 END AS n_breaks,
           u.n_users + CASE t.timeout_s WHEN 900 THEN b.b900
                                        WHEN 1800 THEN b.b1800
                                        ELSE b.b3600 END AS n_sessions
    FROM (SELECT unnest([900, 1800, 3600]) AS timeout_s) t
    CROSS JOIN u CROSS JOIN b
    """,
)
def sessionization_timeout_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How sensitive is the session count to the inactivity timeout?
    One row per candidate threshold (15/30/60 min): sessions =
    users + strict-gap breaks — the ops question ('is 30 minutes
    special, or does the curve say any knob value gives the same
    story?') that events_sessionization's single fixed threshold
    can't answer, answered WITHOUT running the stateful sessionizer
    three times: one lag window computes every user's gaps once, and
    each threshold is a conditional count over the same gap frame
    (gap > T strictly, the sessionizer's convention). Everything is
    exact integers on zone-free epoch milliseconds (the ntz_epoch_ms
    discipline — DuckDB's epoch_ms twin).

    Scale shape: ONE per-user lag window (the shuffle sessionization
    already pays) + one 3×|gaps| conditional rollup; thresholds are a
    3-row broadcast."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        (
            ntz_epoch_ms(F.col("ts"))
            - F.lag(ntz_epoch_ms(F.col("ts"))).over(w)
        ).alias("gap_ms")
    ).filter(F.col("gap_ms").isNotNull())
    u = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    # scalar break counts (an agg on an EMPTY gap frame still yields
    # one row, so all-singleton-user corpora report n_sessions =
    # n_users instead of vanishing)
    def breaks(t_s: int) -> Column:
        return (
            F.coalesce(
                F.sum(
                    F.when(F.col("gap_ms") > t_s * 1000, 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"b{t_s}")
        )

    b = g.agg(breaks(900), breaks(1800), breaks(3600))
    t = spark.createDataFrame(
        [(900,), (1800,), (3600,)], "timeout_s int"
    )
    nb = (
        F.when(F.col("timeout_s") == 900, F.col("b900"))
        .when(F.col("timeout_s") == 1800, F.col("b1800"))
        .otherwise(F.col("b3600"))
    )
    return (
        t.crossJoin(F.broadcast(u))
        .crossJoin(F.broadcast(b))
        .select(
            "timeout_s",
            "n_users",
            nb.alias("n_breaks"),
            (F.col("n_users") + nb).cast("bigint").alias("n_sessions"),
        )
    )


@query(
    "eb_shrunk_host_rates",
    """
    WITH ledger AS (
      SELECT doc_id % 53 AS host,
             CASE WHEN ('0x' || substr(md5('err:' || CAST(doc_id AS VARCHAR)),
                        1, 15))::BIGINT % 100 >= doc_id % 53
                  THEN 1 ELSE 0 END AS ok
      FROM documents
    ),
    h AS (
      SELECT host, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ok) AS BIGINT) AS x
      FROM ledger GROUP BY host
    ),
    folded AS (
      SELECT count(*) OVER w AS nh,
             sum(CAST(x AS DOUBLE) / n) OVER w AS sr,
             sum((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n))
               OVER w AS srr,
             row_number() OVER (ORDER BY host DESC) AS rn
      FROM h
      WINDOW w AS (ORDER BY host ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    prior AS (
      SELECT sr / nh AS mbar,
             CASE WHEN nh > 1 AND srr - sr * sr / nh > 0
                  THEN (srr - sr * sr / nh) / (nh - 1) END AS s2
      FROM folded WHERE rn = 1
    ),
    strength AS (
      SELECT mbar,
             CASE WHEN s2 IS NOT NULL
                       AND mbar * (1.0 - mbar) / s2 - 1.0 > 0
                  THEN mbar * (1.0 - mbar) / s2 - 1.0 END AS m
      FROM prior
    )
    SELECT h.host, h.n AS attempts, h.x AS successes,
           round(CAST(h.x AS DOUBLE) / h.n, 6) AS raw_rate,
           CASE WHEN strength.m IS NOT NULL
                THEN round((h.x + strength.mbar * strength.m)
                           / (h.n + strength.m), 6)
           END AS shrunk_rate
    FROM h CROSS JOIN strength
    """,
)
def eb_shrunk_host_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrunken per-host success rates (beta-binomial
    method of moments): each host's rate pulled toward the cross-host
    mean with strength M = m̄(1−m̄)/s² − 1 — the third member of the
    scheduling triad (UCB explores, Wilson lower-bounds one host,
    EB ranks the whole fleet on borrowed strength so a 1/1 host
    doesn't outrank a 95/100 one). The prior moments fold as ORDERED
    cumulative windows over the 53-row host frame (one canonical
    float order); the method's two degeneracies — a single host
    (no between variance) and under-dispersion (s² ≥ m̄(1−m̄), M ≤ 0,
    the beta prior does not exist) — are guarded to NULL shrunk rates
    in both engines, raw rates still reported.

    Scale shape: one hash agg to hosts, windows over |hosts| only,
    prior as a 1-row broadcast — at 10^7 hosts the fold frame is the
    only window and it's the already-aggregated one."""
    docs = load(spark, sf_dir, "documents")
    host = (F.col("doc_id") % 53).alias("host")
    ok = (
        md5_long(F.concat(F.lit("err:"), F.col("doc_id").cast("string")))
        % 100
        >= F.col("doc_id") % 53
    ).cast("int")
    h = docs.select(host, ok.alias("ok")).groupBy("host").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("x"),
    )
    rate = F.col("x").cast("double") / F.col("n")
    w_cum = Window.orderBy("host").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = h.select(
        F.count("*").over(w_cum).alias("nh"),
        F.sum(rate).over(w_cum).alias("sr"),
        F.sum(rate * rate).over(w_cum).alias("srr"),
        F.row_number().over(Window.orderBy(F.desc("host"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    s2 = (F.col("srr") - F.col("sr") * F.col("sr") / F.col("nh")) / (
        F.col("nh") - 1
    )
    prior = folded.select(
        (F.col("sr") / F.col("nh")).alias("mbar"),
        F.when(
            (F.col("nh") > 1)
            & (
                F.col("srr") - F.col("sr") * F.col("sr") / F.col("nh")
                > 0
            ),
            s2,
        ).alias("s2"),
    )
    m_expr = F.col("mbar") * (F.lit(1.0) - F.col("mbar")) / F.col("s2") - 1.0
    strength = prior.select(
        "mbar",
        F.when(F.col("s2").isNotNull() & (m_expr > 0), m_expr).alias("m"),
    )
    return h.crossJoin(F.broadcast(strength)).select(
        "host",
        F.col("n").alias("attempts"),
        F.col("x").alias("successes"),
        F.round(rate, 6).alias("raw_rate"),
        F.when(
            F.col("m").isNotNull(),
            F.round(
                (F.col("x") + F.col("mbar") * F.col("m"))
                / (F.col("n") + F.col("m")),
                6,
            ),
        ).alias("shrunk_rate"),
    )


@query(
    "heaps_law_fit",
    """
    WITH dtok AS (
      SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok
      FROM documents
    ),
    ids AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,
             (SELECT count(*) FROM dtok) AS nd
      FROM dtok
    ),
    cut AS (
      SELECT CAST(p.p AS INT) AS decile, ids.doc_id AS cutoff_doc
      FROM (SELECT unnest(range(1, 11)) AS p) p
      JOIN ids ON ids.rn = (p.p * ids.nd) // 10
    ),
    tf AS (
      SELECT t, min(doc_id) AS fdoc
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
            FROM documents)
      GROUP BY t
    ),
    pts AS (
      SELECT c.decile, c.cutoff_doc,
             (SELECT CAST(sum(tok) AS BIGINT) FROM dtok
              WHERE doc_id <= c.cutoff_doc) AS t_tokens,
             (SELECT CAST(count(*) AS BIGINT) FROM tf
              WHERE fdoc <= c.cutoff_doc) AS v_vocab
      FROM cut c
    ),
    folded AS (
      SELECT count(*) OVER w AS np,
             sum(ln(CAST(t_tokens AS DOUBLE))) OVER w AS sx,
             sum(ln(CAST(v_vocab AS DOUBLE))) OVER w AS sy,
             sum(ln(CAST(t_tokens AS DOUBLE))
                 * ln(CAST(v_vocab AS DOUBLE))) OVER w AS sxy,
             sum(ln(CAST(t_tokens AS DOUBLE))
                 * ln(CAST(t_tokens AS DOUBLE))) OVER w AS sxx,
             row_number() OVER (ORDER BY decile DESC) AS last_rn
      FROM pts
      WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ),
    fit AS (
      SELECT CASE WHEN np * sxx - sx * sx > 0
                  THEN round((np * sxy - sx * sy)
                             / (np * sxx - sx * sx), 6) END AS beta,
             CASE WHEN np * sxx - sx * sx > 0
                  THEN round(exp((sy - (np * sxy - sx * sy)
                                       / (np * sxx - sx * sx) * sx)
                                 / np), 6) END AS k_est
      FROM folded WHERE last_rn = 1
    )
    SELECT pts.decile, CAST(pts.cutoff_doc AS BIGINT) AS cutoff_doc,
           pts.t_tokens, pts.v_vocab, fit.beta, fit.k_est
    FROM pts CROSS JOIN fit
    """,
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law fit V = K·Tᵝ of vocabulary growth over corpus-prefix
    deciles — the GROWTH member of the vocabulary family: zipf_slope
    describes the frequency head, chao1 extrapolates the unseen total,
    Heaps' β predicts how fast the next shard of tokens buys new types
    (β≈1: every shard is mostly new vocabulary — tokenizer tables and
    dedup shingle spaces keep growing; β≈0.5: the canonical web-text
    regime). Prefixes are doc_id-ordered; each decile point is an
    EXACT pair (Σ tokens, #types-first-seen) decided by integer
    compares against the exact decile-rank cutoff doc; the ln-ln OLS
    folds over the 10-point frame in decile order (one canonical
    float order), denominator-guarded (a degenerate all-in-one-decile
    corpus yields NULL fit, points still reported).

    Scale shape: one doc-level token-count frame, one token-first
    frame (min over the exploded corpus, map-side combined), 10
    conditional rollups via a broadcast cutoff list. The only global
    sort is the row_number over the DOC frame to find 10 exact rank
    cutoffs — at 10^9 docs swap in approx_percentile cutoffs (the
    join_skew_profile contract: exact here IS the calibration twin)."""
    docs = load(spark, sf_dir, "documents")
    dtok = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ", -1))
        .cast("bigint")
        .alias("tok"),
    )
    nd = dtok.agg(F.count("*").alias("nd"))
    ids = dtok.select("doc_id").select(
        "doc_id",
        F.row_number().over(Window.orderBy("doc_id")).alias("rn"),
    ).crossJoin(F.broadcast(nd))
    p = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    # broadcast the 10-row (decile, rank) side and keep the |docs|
    # rank frame distributed — broadcasting ids itself is an OOM
    # hazard at 10^9 docs (review finding, session 14)
    cutranks = p.crossJoin(F.broadcast(nd)).select(
        "decile", F.expr("decile * nd div 10").alias("cut_rn")
    )
    cut = ids.join(
        F.broadcast(cutranks), F.col("rn") == F.col("cut_rn")
    ).select("decile", F.col("doc_id").alias("cutoff_doc"))
    tf = (
        docs.select(
            "doc_id", F.explode(words(F.col("text"))).alias("t")
        )
        .groupBy("t")
        .agg(F.min("doc_id").alias("fdoc"))
    )
    t_pts = (
        dtok.crossJoin(F.broadcast(cut))
        .filter(F.col("doc_id") <= F.col("cutoff_doc"))
        .groupBy("decile", "cutoff_doc")
        .agg(F.sum("tok").cast("bigint").alias("t_tokens"))
    )
    v_pts = (
        tf.crossJoin(F.broadcast(cut))
        .filter(F.col("fdoc") <= F.col("cutoff_doc"))
        .groupBy("decile")
        .agg(F.count("*").cast("bigint").alias("v_vocab"))
    )
    pts = t_pts.join(v_pts, "decile")
    lx = F.log(F.col("t_tokens").cast("double"))
    ly = F.log(F.col("v_vocab").cast("double"))
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    folded = pts.select(
        F.count("*").over(w_cum).alias("np"),
        F.sum(lx).over(w_cum).alias("sx"),
        F.sum(ly).over(w_cum).alias("sy"),
        F.sum(lx * ly).over(w_cum).alias("sxy"),
        F.sum(lx * lx).over(w_cum).alias("sxx"),
        F.row_number().over(Window.orderBy(F.desc("decile"))).alias(
            "last_rn"
        ),
    ).filter(F.col("last_rn") == 1)
    den = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    fit = folded.select(
        F.when(den > 0, F.round(beta, 6)).alias("beta"),
        F.when(
            den > 0,
            F.round(
                F.exp((F.col("sy") - beta * F.col("sx")) / F.col("np")), 6
            ),
        ).alias("k_est"),
    )
    return pts.crossJoin(F.broadcast(fit)).select(
        "decile",
        F.col("cutoff_doc").cast("bigint").alias("cutoff_doc"),
        "t_tokens",
        "v_vocab",
        "beta",
        "k_est",
    )


@query(
    "ljung_box_portmanteau",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d),
    lagged AS (
      SELECT l.k,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.n) AS BIGINT) AS sx,
             CAST(sum(b.n) AS BIGINT) AS sy,
             CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
             CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
             CAST(sum(b.n * b.n) AS BIGINT) AS syy
      FROM (SELECT unnest(range(1, 8)) AS k) l
      JOIN d a ON true
      JOIN d b ON b.day = a.day + l.k
      GROUP BY l.k
    ),
    rho AS (
      SELECT k, n_pairs,
             CASE WHEN n_pairs * sxx - sx * sx > 0
                   AND n_pairs * syy - sy * sy > 0
                  THEN (n_pairs * sxy - sx * sy)
                       / sqrt((n_pairs * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * sx)
                              * (n_pairs * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * sy))
             END AS r
      FROM lagged
    ),
    folded AS (
      SELECT sum(CASE WHEN rho.r IS NULL OR nd.n_days - rho.k <= 0
                      THEN NULL
                      ELSE rho.r * rho.r / (nd.n_days - rho.k) END)
               OVER (ORDER BY rho.k ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS s,
             count(*) OVER (ORDER BY rho.k ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS n_lags_seen,
             sum(CASE WHEN rho.r IS NULL OR nd.n_days - rho.k <= 0
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY rho.k ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS n_bad,
             row_number() OVER (ORDER BY rho.k DESC) AS last_rn,
             nd.n_days
      FROM rho CROSS JOIN nd
    ),
    q AS (
      SELECT CASE WHEN n_bad = 0 AND n_lags_seen = 7
                  THEN round(n_days * (n_days + 2) * s, 6) END AS q_stat,
             n_days
      FROM folded WHERE last_rn = 1
    )
    SELECT rho.k AS lag, rho.n_pairs, round(rho.r, 6) AS rho,
           q.n_days, q.q_stat,
           CASE WHEN q.q_stat IS NOT NULL
                THEN q.q_stat > 14.067140 END AS significant
    FROM rho CROSS JOIN q
    """,
)
def ljung_box_portmanteau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test over lags 1..7 of the GLOBAL daily
    event-count series — the 'is there ANY serial structure?' gate
    that events_autocorr_lag1's single lag can't close (a weekly
    cycle hides at lag 7 with a flat lag 1): Q = n(n+2)·Σ ρ²_k/(n−k)
    vs χ²₇ at 95% (14.067140). Each lag's ρ is the calendar-
    consecutive pairwise Pearson over exact integer moment sums (the
    lag-1 query's law extended to a lag list); Σ folds as an ORDERED
    window over the 7-row lag frame; Q is NULL — never a partial sum
    — if any lag's variance gate fails or n ≤ 7, with per-lag ρ rows
    still reported.

    Scale shape: events collapse map-side to the days frame; the lag
    join and every window run on frames of ≤ days and 7 rows."""
    ev = load(spark, sf_dir, "events")
    d = ev.select(
        (ntz_epoch_ms(F.col("ts")) / F.lit(86400000))
        .cast("bigint")
        .alias("day")
    ).groupBy("day").agg(F.count("*").cast("bigint").alias("n"))
    nd = d.agg(F.count("*").cast("bigint").alias("n_days"))
    lags = spark.range(1, 8).select(F.col("id").cast("bigint").alias("k"))
    a = d.select(F.col("day").alias("da"), F.col("n").alias("na"))
    b = d.select(F.col("day").alias("db"), F.col("n").alias("nb"))
    lagged = (
        lags.join(a)
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("na").cast("bigint").alias("sx"),
            F.sum("nb").cast("bigint").alias("sy"),
            F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("sxy"),
            F.sum(F.col("na") * F.col("na")).cast("bigint").alias("sxx"),
            F.sum(F.col("nb") * F.col("nb")).cast("bigint").alias("syy"),
        )
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    r = (
        (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / F.sqrt(
            (
                F.col("n_pairs") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
            * (
                F.col("n_pairs") * F.col("syy").cast("double")
                - F.col("sy").cast("double") * F.col("sy")
            )
        )
    )
    rho = lagged.select(
        "k",
        "n_pairs",
        F.when((vx > 0) & (vy > 0), r).alias("r"),
    )
    w_cum = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bad = (
        F.col("r").isNull() | (F.col("n_days") - F.col("k") <= 0)
    ).cast("int")
    term = F.when(
        bad == 0,
        F.col("r") * F.col("r") / (F.col("n_days") - F.col("k")),
    )
    folded = (
        rho.crossJoin(F.broadcast(nd))
        .select(
            F.sum(term).over(w_cum).alias("s"),
            F.count("*").over(w_cum).alias("n_lags_seen"),
            F.sum(bad).over(w_cum).alias("n_bad"),
            F.row_number().over(Window.orderBy(F.desc("k"))).alias(
                "last_rn"
            ),
            "n_days",
        )
        .filter(F.col("last_rn") == 1)
    )
    q = folded.select(
        F.when(
            (F.col("n_bad") == 0) & (F.col("n_lags_seen") == 7),
            F.round(
                F.col("n_days") * (F.col("n_days") + 2) * F.col("s"), 6
            ),
        ).alias("q_stat"),
        "n_days",
    )
    return rho.crossJoin(F.broadcast(q)).select(
        F.col("k").alias("lag"),
        "n_pairs",
        F.round("r", 6).alias("rho"),
        "n_days",
        "q_stat",
        F.when(
            F.col("q_stat").isNotNull(), F.col("q_stat") > 14.067140
        ).alias("significant"),
    )


@query(
    "skyline_parts",
    """
    WITH p AS (
      SELECT p_partkey, p_brand,
             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS psize
      FROM part
    )
    SELECT a.p_brand, a.p_partkey, a.price_cents, a.psize
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.p_brand = a.p_brand
        AND q.price_cents <= a.price_cents AND q.psize >= a.psize
        AND (q.price_cents < a.price_cents OR q.psize > a.psize)
    )
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-front) operator: per brand, the parts no other
    part dominates on (price ↓, size ↑) — the multi-objective
    shortlist query (\"show me every part where nothing is both
    cheaper AND bigger\") that top-k by any single weighted score
    cannot express, and a missing operator CLASS until now. The naive
    form is a quadratic NOT-EXISTS dominance self-join (the oracle
    runs exactly that, pinning the semantics); the engine computes it
    with TWO WINDOWS and zero joins: survive iff size > max(size)
    over STRICTLY cheaper rows (a RANGE frame to 1-cent-PRECEDING on
    the integer price axis — ties excluded exactly) and size equals
    the max within the same (brand, price) group (equal-price
    dominance; exact duplicates both survive, neither dominates).
    Every compare is exact-integer; output order-free.

    Scale shape: one hash partition by brand + in-partition sort —
    the same exchange a per-brand rollup pays; dominance resolves in
    the sorted pass, O(n log n) against the O(n²) textbook join."""
    part = load(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_brand",
        F.round(F.col("p_retailprice") * 100)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("psize"),
    )
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "price_cents")
    w = p.select(
        "p_brand",
        "p_partkey",
        "price_cents",
        "psize",
        F.max("psize").over(w_cheaper).alias("best_cheaper"),
        F.max("psize").over(w_same).alias("best_same_price"),
    )
    return w.filter(
        (
            F.col("best_cheaper").isNull()
            | (F.col("psize") > F.col("best_cheaper"))
        )
        & (F.col("psize") == F.col("best_same_price"))
    ).select("p_brand", "p_partkey", "price_cents", "psize")


@query(
    "sequence_pattern_match",
    """
    WITH s AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'click' THEN 'c'
                                        WHEN 'view' THEN 'v'
                                        WHEN 'purchase' THEN 'p'
                                        WHEN 'signup' THEN 's'
                                        ELSE 'e' END,
                        '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM s),
    pat AS (
      SELECT * FROM (VALUES
        ('direct_purchase', '^p'),
        ('view_to_purchase', 'v[^p]*p'),
        ('error_before_purchase', 'e[^p]*p'),
        ('never_purchased', '^[^p]*$')) t(pattern, rx)
    )
    SELECT pat.pattern,
           CAST(sum(CASE WHEN regexp_matches(s.seq, pat.rx)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN regexp_matches(s.seq, pat.rx)
                         THEN 1 ELSE 0 END) * 1000 // tot.n_total
                AS BIGINT) AS share_permille
    FROM pat CROSS JOIN tot CROSS JOIN s
    GROUP BY pat.pattern, tot.n_total
    """,
)
def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex pattern matching over each user's
    full event-type SEQUENCE — the behavioral-pattern operator class
    the funnel family only special-cases (funnel_conversion fixes one
    ordered chain; a regex asks arbitrary questions: 'purchase as the
    FIRST touch', 'a view eventually converting', 'an error on the
    path to purchase', 'never bought at all' — each one row here).
    Sequences are deterministic strings (events folded per user in
    (ts, event_id) order — the sessionizer's tiebreak law — via
    sort_array-of-struct on the Spark side and ORDER BY string_agg in
    the oracle); the four patterns use only regex constructs with
    identical semantics in Java regex and RE2 (anchors, literal
    classes, negated classes, star). Shares are exact floored
    permille of the user universe.

    Scale shape: ONE user-keyed fold (the shuffle any per-user op
    pays; string length = that user's event count), then 4 regex
    predicates evaluated JVM-side over the users frame — patterns are
    a 4-row broadcast, never a second pass over events."""
    ev = load(spark, sf_dir, "events")
    letter = (
        F.when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    s = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), letter.alias("l")
            ).alias("st"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("st")),
                    lambda x: x["l"],
                ),
                "",
            ).alias("seq")
        )
    )
    tot = s.agg(F.count("*").cast("bigint").alias("n_total"))
    pat = spark.createDataFrame(
        [
            ("direct_purchase", "^p"),
            ("view_to_purchase", "v[^p]*p"),
            ("error_before_purchase", "e[^p]*p"),
            ("never_purchased", "^[^p]*$"),
        ],
        "pattern string, rx string",
    )
    hit = F.expr("CASE WHEN seq rlike rx THEN 1 ELSE 0 END")
    return (
        F.broadcast(pat)
        .crossJoin(F.broadcast(tot))
        .join(s)
        .groupBy("pattern", "n_total")
        .agg(F.sum(hit).cast("bigint").alias("n_users"))
        .select(
            "pattern",
            "n_users",
            F.expr("n_users * 1000 div n_total")
            .cast("bigint")
            .alias("share_permille"),
        )
    )


@query(
    "abc_xyz_matrix",
    """
    WITH li AS (
      SELECT l_partkey,
             epoch_ms(l_shipdate) // 2592000000 AS m,
             CAST(round(l_quantity) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS rev
      FROM lineitem
    ),
    months AS (SELECT DISTINCT m FROM li),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM months),
    pm AS (
      SELECT l_partkey, m, CAST(sum(q) AS BIGINT) AS q
      FROM li GROUP BY l_partkey, m
    ),
    parts AS (SELECT DISTINCT l_partkey FROM li),
    dense AS (
      SELECT p.l_partkey, coalesce(pm.q, 0) AS q
      FROM parts p CROSS JOIN months mo
      LEFT JOIN pm ON pm.l_partkey = p.l_partkey AND pm.m = mo.m
    ),
    xyz AS (
      SELECT l_partkey,
             CAST(sum(q) AS HUGEINT) AS s1,
             CAST(sum(q * q) AS HUGEINT) AS s2
      FROM dense GROUP BY l_partkey
    ),
    xyz_c AS (
      SELECT xyz.l_partkey,
             CASE WHEN s1 = 0 THEN 'Z'
                  WHEN 4 * (nm.n_months * s2 - s1 * s1) < s1 * s1 THEN 'X'
                  WHEN nm.n_months * s2 - s1 * s1 < s1 * s1 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM xyz CROSS JOIN nm
    ),
    pr AS (
      SELECT l_partkey, CAST(sum(rev) AS BIGINT) AS rev
      FROM li GROUP BY l_partkey
    ),
    abc AS (
      SELECT l_partkey,
             CASE WHEN cum * 100 <= total * 80 THEN 'A'
                  WHEN cum * 100 <= total * 95 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM (
        SELECT l_partkey, rev,
               CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey)
                    AS BIGINT) AS cum,
               CAST(sum(rev) OVER () AS BIGINT) AS total
        FROM pr
      )
    )
    SELECT abc.abc_class, xyz_c.xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM abc JOIN xyz_c ON abc.l_partkey = xyz_c.l_partkey
    GROUP BY 1, 2
    """,
)
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC×XYZ stocking-policy matrix: value classes (the
    abc_classification 80/95 cumulative-revenue law, reused verbatim)
    crossed with demand-VARIABILITY classes — X: CV < 0.5 (steady,
    forecastable), Y: CV < 1, Z: lumpy — because an A-value part with
    Z-variability needs a completely different safety stock than an
    A/X one. Variability is decided in EXACT integers: with monthly
    quantity sums S1, S2 over the month-DENSIFIED per-part series
    (zero months included — skipping them understates variability,
    the same truncation trap negative_binomial_fit documents),
    CV² < 1/4 ⟺ 4(M·S2 − S1²) < S1² and CV² < 1 ⟺ M·S2 − S1² < S1²
    — no mean, no sqrt, no division anywhere in the verdict
    (HUGEINT/DECIMAL(38,0) intermediates).

    Scale shape: one fact-table rollup to (part, month), part-level
    aggs over OBSERVED rows only (the zero months the CV needs enter
    through the broadcast month count M, never as materialized rows —
    the oracle's explicit densify is the independent twin), and the
    ABC rank window over the parts frame — the fact table is touched
    once."""
    li = load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    base = li.select(
        "l_partkey",
        (ntz_epoch_ms(F.col("l_shipdate")) / F.lit(2592000000))
        .cast("bigint")
        .alias("m"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("rev"),
    )
    months = base.select("m").distinct()
    nm = months.agg(F.count("*").cast("bigint").alias("n_months"))
    pm = base.groupBy("l_partkey", "m").agg(
        F.sum("q").cast("bigint").alias("q")
    )
    # zero months are accounted for algebraically (they add nothing
    # to S1/S2; M comes from the broadcast month count), so the
    # engine aggregates only OBSERVED (part, month) rows — the oracle
    # keeps the explicit densify as the independent formulation
    # (review finding, session 14)
    xyz = pm.groupBy("l_partkey").agg(
        F.sum("q").cast(d38).alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast(d38).alias("s2"),
    )
    var_num = F.col("n_months") * F.col("s2") - F.col("s1") * F.col("s1")
    s1sq = F.col("s1") * F.col("s1")
    xyz_c = xyz.crossJoin(F.broadcast(nm)).select(
        "l_partkey",
        F.when(F.col("s1") == 0, "Z")
        .when(4 * var_num < s1sq, "X")
        .when(var_num < s1sq, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    pr = base.groupBy("l_partkey").agg(
        F.sum("rev").cast("bigint").alias("rev")
    )
    w_cum = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    abc = pr.select(
        "l_partkey",
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_all).alias("total"),
    ).select(
        "l_partkey",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        abc.join(xyz_c, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(F.count("*").cast("bigint").alias("n_parts"))
    )


@query(
    "sample_size_power_calc",
    """
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS x
      FROM events WHERE event_type = 'purchase'
    ),
    d AS (SELECT unnest([0.01::DOUBLE, 0.02::DOUBLE, 0.05::DOUBLE])
            AS delta)
    SELECT d.delta,
           round(CAST(base.x AS DOUBLE) / base.n, 6) AS p_base,
           CASE WHEN base.n > 0
                 AND CAST(base.x AS DOUBLE) / base.n + d.delta < 1.0
                THEN CAST(ceil(
                  pow(1.959964 * sqrt(2 * ((CAST(base.x AS DOUBLE) / base.n
                         + d.delta / 2)
                        * (1 - (CAST(base.x AS DOUBLE) / base.n
                                + d.delta / 2))))
                      + 0.841621 * sqrt(
                          CAST(base.x AS DOUBLE) / base.n
                          * (1 - CAST(base.x AS DOUBLE) / base.n)
                          + (CAST(base.x AS DOUBLE) / base.n + d.delta)
                            * (1 - (CAST(base.x AS DOUBLE) / base.n
                                    + d.delta))),
                      2) / (d.delta * d.delta)) AS BIGINT)
           END AS n_per_arm
    FROM d CROSS JOIN base
    """,
)
def sample_size_power_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planner: purchase events PER ARM needed to
    detect an absolute lift of {1, 2, 5} points over the observed
    high-value-purchase rate P(value > 50 | purchase) at α = 0.05
    (two-sided) and 80% power — the question a team asks BEFORE
    ab_test_zprop can say anything ('how long must this run?'),
    answered from the corpus's own baseline:
    n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁ + p₂q₂))²/δ² with the normal
    quantiles as exact shared literals (1.959964, 0.841621). The
    baseline x/n is exact; each candidate-delta row evaluates one
    identical IEEE expression; p₂ ≥ 1 rows are guarded NULL (no such
    experiment exists). The ceil lands mid-range of the float (the
    expression is nowhere near an integer boundary for real rates) —
    output also carries p_base so the reader can recompute.

    Scale shape: one filtered scalar agg, then a 3-row VALUES
    cross-join against a 1-row baseline."""
    ev = load(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") == "purchase").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    d = spark.createDataFrame(
        [(0.01,), (0.02,), (0.05,)], "delta double"
    )
    p1 = F.col("x").cast("double") / F.col("n")
    p2 = p1 + F.col("delta")
    pbar = p1 + F.col("delta") / 2
    expr_n = F.ceil(
        F.pow(
            F.lit(1.959964) * F.sqrt(2 * (pbar * (1 - pbar)))
            + F.lit(0.841621)
            * F.sqrt(p1 * (1 - p1) + p2 * (1 - p2)),
            F.lit(2),
        )
        / (F.col("delta") * F.col("delta"))
    ).cast("bigint")
    return d.crossJoin(F.broadcast(base)).select(
        "delta",
        F.round(p1, 6).alias("p_base"),
        F.when((F.col("n") > 0) & (p2 < 1.0), expr_n).alias("n_per_arm"),
    )


@query(
    "welch_mean_ztest",
    """
    WITH s AS (
      SELECT
        CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                      ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1
                      ELSE 0 END) AS BIGINT) AS n2,
        sum(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS HUGEINT) ELSE 0 END) AS s11,
        sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS HUGEINT) ELSE 0 END) AS s12,
        sum(CASE WHEN o_orderpriority = '1-URGENT'
                 THEN CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS HUGEINT)
                      * CAST(round(o_totalprice * 100) AS BIGINT)
                 ELSE 0 END) AS s21,
        sum(CASE WHEN o_orderpriority = '5-LOW'
                 THEN CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS HUGEINT)
                      * CAST(round(o_totalprice * 100) AS BIGINT)
                 ELSE 0 END) AS s22
      FROM orders
    )
    SELECT n1, n2,
           CASE WHEN n1 > 0
                THEN round(CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
           END AS mean1_cents,
           CASE WHEN n2 > 0
                THEN round(CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
           END AS mean2_cents,
           CASE WHEN n1 > 1 AND n2 > 1
                 AND (n1 * s21 - s11 * s11 > 0
                      OR n2 * s22 - s12 * s12 > 0)
                THEN round(
                  (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
                  * (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
                     - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
                  / (CAST(n1 * s21 - s11 * s11 AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                        * (CAST(n1 AS DOUBLE) - 1))
                     + CAST(n2 * s22 - s12 * s12 AS DOUBLE)
                       / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          * (CAST(n2 AS DOUBLE) - 1))), 6)
           END AS z2,
           CASE WHEN n1 > 1 AND n2 > 1
                 AND (n1 * s21 - s11 * s11 > 0
                      OR n2 * s22 - s12 * s12 > 0)
                THEN (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
                      - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     * (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)
                        - CAST(s12 AS DOUBLE) / CAST(n2 AS DOUBLE))
                     / (CAST(n1 * s21 - s11 * s11 AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                           * (CAST(n1 AS DOUBLE) - 1))
                        + CAST(n2 * s22 - s12 * s12 AS DOUBLE)
                          / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                             * (CAST(n2 AS DOUBLE) - 1)))
                     > 3.8416
           END AS significant
    FROM s
    """,
)
def welch_mean_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance z-test on MEAN order value, urgent vs
    low priority — the parametric twin of mann_whitney_u (same
    cohorts; MW asks about stochastic dominance of ranks, Welch about
    the difference of means — a long right tail can flip one verdict
    and not the other, which is why a pipeline carries both). All
    moments are exact integers over cents (n, Σx, Σx² per cohort, one
    map-side-combinable pass, Σx² products cast to DECIMAL(38,0)
    BEFORE the sum — Σx² ≈ 10^23 at 10^9 orders, far past BIGINT);
    z² = diff² / (v1/n1 + v2/n2) with vᵢ/nᵢ = (nᵢΣx²−(Σx)²)/(nᵢ²(nᵢ−1))
    is evaluated as ONE double expression of those exact integers —
    each factor cast individually, the identical IEEE tree in both
    engines (mann_whitney_u discipline) — behind exact-INTEGER
    reachability guards: nᵢ > 1 and at least one nonzero variance
    numerator (two zero-variance cohorts have an undefined z even
    when the means differ).

    Scale shape: one conditional-aggregation pass over the fact
    table to six scalars; the verdict is driver-free arithmetic on a
    1-row frame."""
    o = load(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    low = F.col("o_orderpriority") == "5-LOW"
    s = o.agg(
        F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(low, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(urgent, c.cast(d38)).otherwise(F.lit(0).cast(d38)))
        .alias("s11"),
        F.sum(F.when(low, c.cast(d38)).otherwise(F.lit(0).cast(d38)))
        .alias("s12"),
        F.sum(
            F.when(urgent, c.cast(d38) * c).otherwise(F.lit(0).cast(d38))
        ).alias("s21"),
        F.sum(
            F.when(low, c.cast(d38) * c).otherwise(F.lit(0).cast(d38))
        ).alias("s22"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    s11, s12 = F.col("s11"), F.col("s12")
    s21, s22 = F.col("s21"), F.col("s22")
    v1n = n1 * s21 - s11 * s11
    v2n = n2 * s22 - s12 * s12
    m1 = s11.cast("double") / n1.cast("double")
    m2 = s12.cast("double") / n2.cast("double")
    diff = m1 - m2
    se2 = v1n.cast("double") / (
        n1.cast("double") * n1.cast("double") * (n1.cast("double") - 1)
    ) + v2n.cast("double") / (
        n2.cast("double") * n2.cast("double") * (n2.cast("double") - 1)
    )
    z2 = diff * diff / se2
    guard = (n1 > 1) & (n2 > 1) & ((v1n > 0) | (v2n > 0))
    return s.select(
        "n1",
        "n2",
        F.when(n1 > 0, F.round(m1, 6)).alias("mean1_cents"),
        F.when(n2 > 0, F.round(m2, 6)).alias("mean2_cents"),
        F.when(guard, F.round(z2, 6)).alias("z2"),
        F.when(guard, z2 > 3.8416).alias("significant"),
    )


@query(
    "g_test_independence",
    """
    WITH o AS (
      SELECT event_type,
             (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt
          FROM o GROUP BY 1),
    c AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS ct FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
                 CAST((SELECT count(*) FROM r) AS BIGINT) AS n_rows,
                 CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cols
          FROM o),
    terms AS (
      SELECT o.event_type, o.dow, t.n, t.n_rows, t.n_cols,
             sum(CAST(o.obs AS DOUBLE)
                 * ln(CAST(o.obs AS DOUBLE) * CAST(t.n AS DOUBLE)
                      / (CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE))))
               OVER (ORDER BY o.event_type, o.dow
                     ROWS UNBOUNDED PRECEDING) AS acc,
             row_number()
               OVER (ORDER BY o.event_type DESC, o.dow DESC) AS last_rn
      FROM o JOIN r USING (event_type) JOIN c USING (dow), t
    ),
    g AS (
      SELECT n, n_rows, n_cols,
             (n_rows - 1) * (n_cols - 1) AS df,
             2.0 * acc AS g_stat
      FROM terms WHERE last_rn = 1
    )
    SELECT n, df,
           round(g_stat, 6) AS g_stat,
           CASE WHEN df > 0 THEN round(
             CAST(df AS DOUBLE)
             * (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                + 1.6448536269514722
                  * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE))))
             * (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                + 1.6448536269514722
                  * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE))))
             * (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                + 1.6448536269514722
                  * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE)))), 6)
           END AS crit_95,
           CASE WHEN df > 0 THEN
             round(g_stat, 6) > round(
               CAST(df AS DOUBLE)
               * (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                  + 1.6448536269514722
                    * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE))))
               * (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                  + 1.6448536269514722
                    * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE))))
               * (1.0 - 2.0 / (9.0 * CAST(df AS DOUBLE))
                  + 1.6448536269514722
                    * sqrt(2.0 / (9.0 * CAST(df AS DOUBLE)))), 6)
           END AS significant
    FROM g
    """,
)
def g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood-ratio) of independence for event type ×
    day-of-week — the information-theoretic member of the
    independence family (chi-square ≈ its second-order Taylor
    expansion; G is additive across nested partitions, which the
    chi-square members cramers_v/theils_u are not, and
    2n·MI(nats) = G exactly, tying it to info_gain_lang_source).
    Contingency cells and margins are exact integers; each observed
    cell ships one term obs·ln(obs·N/(R·C)) (absent cells contribute
    exactly 0 by the 0·ln0 = 0 limit, so only observed cells are
    touched), and G folds as an ORDERED cumulative window over the
    ≤ types×7 cell frame — the identical IEEE addition order in both
    engines (no shuffled float sum). The 95% verdict compares against
    the Wilson–Hilferty chi-square critical value
    df·(1 − 2/(9df) + z₉₅·√(2/(9df)))³ — a closed-form expression
    tree evaluated identically in both engines (benjamini_hochberg's
    erfc discipline), cubed by explicit self-multiplication; both
    sides of the compare are rounded to 6 dp first so a sub-ulp ln()
    divergence cannot flip the verdict.

    Scale shape: one map-side-combinable agg to the bounded cell
    frame; margins, the ordered fold and the verdict all ride that
    small frame. dow uses the repo's portable epoch-day + 4 mod 7
    convention."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    o = ev.groupBy(
        "event_type",
        (((ems / F.lit(86400000)).cast("bigint") + 4) % 7).alias("dow"),
    ).agg(F.count("*").cast("bigint").alias("obs"))
    r = o.groupBy("event_type").agg(
        F.sum("obs").cast("bigint").alias("rt")
    )
    c = o.groupBy("dow").agg(F.sum("obs").cast("bigint").alias("ct"))
    t = o.agg(
        F.sum("obs").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("n_rows"),
        F.countDistinct("dow").cast("bigint").alias("n_cols"),
    )
    cells = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "dow")
        .crossJoin(F.broadcast(t))
    )
    term = F.col("obs").cast("double") * F.log(
        F.col("obs").cast("double")
        * F.col("n").cast("double")
        / (F.col("rt").cast("double") * F.col("ct").cast("double"))
    )
    w_acc = Window.orderBy("event_type", "dow").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_last = Window.orderBy(F.desc("event_type"), F.desc("dow"))
    folded = cells.select(
        "n",
        "n_rows",
        "n_cols",
        F.sum(term).over(w_acc).alias("acc"),
        F.row_number().over(w_last).alias("last_rn"),
    ).filter(F.col("last_rn") == 1)
    df_ = (F.col("n_rows") - 1) * (F.col("n_cols") - 1)
    g_stat = F.lit(2.0) * F.col("acc")
    dfd = df_.cast("double")
    wh = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dfd)
        + F.lit(1.6448536269514722)
        * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dfd))
    )
    crit = dfd * wh * wh * wh
    return folded.select(
        "n",
        df_.cast("bigint").alias("df"),
        F.round(g_stat, 6).alias("g_stat"),
        F.when(df_ > 0, F.round(crit, 6)).alias("crit_95"),
        F.when(df_ > 0, F.round(g_stat, 6) > F.round(crit, 6)).alias(
            "significant"
        ),
    )


@query(
    "ols_two_factor",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x2
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT li.x1, li.x2,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x1 AS HUGEINT)) AS sx1,
             sum(CAST(x2 AS HUGEINT)) AS sx2,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x1 AS HUGEINT) * x1) AS s11,
             sum(CAST(x2 AS HUGEINT) * x2) AS s22,
             sum(CAST(x1 AS HUGEINT) * x2) AS s12,
             sum(CAST(x1 AS HUGEINT) * y) AS s1y,
             sum(CAST(x2 AS HUGEINT) * y) AS s2y,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM j
    ),
    d AS (
      SELECT n, sy, s1y, s2y, syy,
             CAST(n AS DOUBLE) AS nd, CAST(sx1 AS DOUBLE) AS a1,
             CAST(sx2 AS DOUBLE) AS a2, CAST(sy AS DOUBLE) AS ay,
             CAST(s11 AS DOUBLE) AS a11, CAST(s22 AS DOUBLE) AS a22,
             CAST(s12 AS DOUBLE) AS a12, CAST(s1y AS DOUBLE) AS a1y,
             CAST(s2y AS DOUBLE) AS a2y, CAST(syy AS DOUBLE) AS ayy
      FROM m
    ),
    k AS (
      SELECT n, sy, s1y, s2y, syy, nd, ay, a1y, a2y, ayy,
             nd * (a11 * a22 - a12 * a12)
               - a1 * (a1 * a22 - a12 * a2)
               + a2 * (a1 * a12 - a11 * a2) AS det,
             ay * (a11 * a22 - a12 * a12)
               - a1 * (a1y * a22 - a12 * a2y)
               + a2 * (a1y * a12 - a11 * a2y) AS det0,
             nd * (a1y * a22 - a12 * a2y)
               - ay * (a1 * a22 - a12 * a2)
               + a2 * (a1 * a2y - a1y * a2) AS det1,
             nd * (a11 * a2y - a1y * a12)
               - a1 * (a1 * a2y - a1y * a2)
               + ay * (a1 * a12 - a11 * a2) AS det2
      FROM d
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           CASE WHEN det <> 0.0 THEN round(det0 / det, 6) END AS b0,
           CASE WHEN det <> 0.0 THEN round(det1 / det, 6) END AS b1,
           CASE WHEN det <> 0.0 THEN round(det2 / det, 6) END AS b2,
           CASE WHEN det <> 0.0 AND n * syy - sy * sy > 0
                THEN round(1.0 - (ayy - ((det0 / det) * ay
                                         + (det1 / det) * a1y
                                         + (det2 / det) * a2y))
                                 / (ayy - ay * ay / nd), 6)
           END AS r2
    FROM k
    """,
)
def ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-regressor OLS with intercept — order value (cents) on
    (n_lineitems, total quantity) — solved in closed form by Cramer's
    rule over the 3×3 normal equations: the multiple-regression
    member events_trend_ols (single regressor) left open, and the
    join-then-regress shape every feature-attribution job runs. The
    nine moment sums (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y,
    Σyy) are exact integers (products cast to DECIMAL(38,0)/HUGEINT
    before summing — Σy² ≈ 10^21 at sf0.1 already passes BIGINT); the
    four 3×3 determinants are evaluated as DOUBLE expression trees of
    the individually-cast exact moments — NOT as cross-multiplied
    decimals, which wrap 38 digits near 10^9 rows with divergent
    engine failure modes (mann_whitney_u review lesson applied at
    design time). Coefficients are single divisions; R² reuses the
    same b̂ doubles so both engines walk one tree; det ≠ 0 (collinear
    regressors) and SST > 0 (exact-integer guard n·Σyy > (Σy)²) gate
    reachability.

    Scale shape: one lineitem rollup (map-side combinable), one
    orderkey equi-join (AQE-broadcastable at dim scale), one
    moments pass to a 1-row frame — the verdict is arithmetic."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    lir = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("x1"),
        F.sum(F.round("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("x2"),
    )
    j = o.join(lir, o.o_orderkey == lir.l_orderkey).select(
        "x1",
        "x2",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    m = j.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(x1.cast(d38)).alias("sx1"),
        F.sum(x2.cast(d38)).alias("sx2"),
        F.sum(y.cast(d38)).alias("sy"),
        F.sum(x1.cast(d38) * x1).alias("s11"),
        F.sum(x2.cast(d38) * x2).alias("s22"),
        F.sum(x1.cast(d38) * x2).alias("s12"),
        F.sum(x1.cast(d38) * y).alias("s1y"),
        F.sum(x2.cast(d38) * y).alias("s2y"),
        F.sum(y.cast(d38) * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    a1, a2, ay = (
        F.col("sx1").cast("double"),
        F.col("sx2").cast("double"),
        F.col("sy").cast("double"),
    )
    a11, a22, a12 = (
        F.col("s11").cast("double"),
        F.col("s22").cast("double"),
        F.col("s12").cast("double"),
    )
    a1y, a2y, ayy = (
        F.col("s1y").cast("double"),
        F.col("s2y").cast("double"),
        F.col("syy").cast("double"),
    )
    det = (
        nd * (a11 * a22 - a12 * a12)
        - a1 * (a1 * a22 - a12 * a2)
        + a2 * (a1 * a12 - a11 * a2)
    )
    det0 = (
        ay * (a11 * a22 - a12 * a12)
        - a1 * (a1y * a22 - a12 * a2y)
        + a2 * (a1y * a12 - a11 * a2y)
    )
    det1 = (
        nd * (a1y * a22 - a12 * a2y)
        - ay * (a1 * a22 - a12 * a2)
        + a2 * (a1 * a2y - a1y * a2)
    )
    det2 = (
        nd * (a11 * a2y - a1y * a12)
        - a1 * (a1 * a2y - a1y * a2)
        + ay * (a1 * a12 - a11 * a2)
    )
    ok = det != 0.0
    sst_guard = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    r2 = 1.0 - (ayy - (b0 * ay + b1 * a1y + b2 * a2y)) / (
        ayy - ay * ay / nd
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.when(ok, F.round(b0, 6)).alias("b0"),
        F.when(ok, F.round(b1, 6)).alias("b1"),
        F.when(ok, F.round(b2, 6)).alias("b2"),
        F.when(ok & sst_guard, F.round(r2, 6)).alias("r2"),
    )


@query(
    "interval_union_coverage",
    """
    WITH iv AS (
      SELECT user_id,
             epoch_ms(ts) AS s,
             epoch_ms(ts) + greatest(CAST(round(value * 1000) AS BIGINT),
                                     0) AS e,
             event_id
      FROM events
    ),
    flagged AS (
      SELECT user_id, s, e, event_id,
             CASE WHEN max(e) OVER (PARTITION BY user_id
                                    ORDER BY s, e, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) IS NULL
                    OR s > max(e) OVER (PARTITION BY user_id
                                        ORDER BY s, e, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id
                                   ORDER BY s, e, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island_id,
             min(s) AS ms, max(e) AS me
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(me - ms) AS BIGINT) AS covered_ms,
           CAST(max(me) - min(ms) AS BIGINT) AS span_ms
    FROM merged GROUP BY 1
    """,
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL UNION (coalesce-overlaps) per user: each event opens an
    activity interval [ts, ts + value·1s); overlapping or touching
    intervals merge into islands, and the rollup reports exact covered
    milliseconds vs raw span — the classic 'total time on site'
    operator that a naive sum(duration) double-counts and
    sessionization (gap-based, point events) cannot express, because
    here events carry DURATIONS that can nest (a long interval fully
    containing later short ones: max-end-so-far, not lag(e), is what
    detects containment — the textbook lag-based merge is WRONG for
    nested intervals and the oracle pins the cummax form). Island
    detection is one ordered window per user (new island ⟺ start
    strictly after the running max end; ties at the boundary merge,
    both engines); all arithmetic is exact integer milliseconds.

    Both the flag window and the island accumulation walk ONE total
    order (s, e, event_id) — a flag computed under one tiebreak and
    accumulated under another silently reassigns tied-start rows to
    islands they never touch (caught in this query's own review
    before it shipped); the unique event_id tiebreak makes every
    row's cumulative flag sum deterministic even under fully tied
    (s, e).

    Scale shape: one hash partition by user + in-partition sort (the
    same exchange sessionization pays), two small aggs — no join, no
    self-join; the quadratic overlap join the textbook answer runs is
    replaced by the sorted pass."""
    ev = load(spark, sf_dir, "events")
    ems = ntz_epoch_ms(F.col("ts"))
    iv = ev.select(
        "user_id",
        ems.alias("s"),
        (
            ems
            + F.greatest(
                F.round(F.col("value") * 1000).cast("bigint"), F.lit(0)
            )
        ).alias("e"),
        "event_id",
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_acc = (
        Window.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island").over(w_acc).alias("island_id"),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return merged.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum(F.col("me") - F.col("ms")).cast("bigint").alias("covered_ms"),
        (F.max("me") - F.min("ms")).cast("bigint").alias("span_ms"),
    )


def _min_reach(
    nodes: DataFrame, edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """(doc_id, lbl) where lbl = min node id that REACHES doc_id along
    the directed edges (every node reaches itself). Min-label
    propagation along in-edges, accelerated by pointer jumping —
    sound for DIRECTED reachability because it composes true facts:
    lbl(v)=u certifies u→*v and lbl(u)=w certifies w→*u, hence w→*v.
    At the fixpoint lbl(v) ≤ every in-neighbor's lbl, so labels are
    non-increasing along any path and lbl(v) is exactly the min over
    reachers. Same plan-depth discipline as _connected_components:
    localCheckpoint every round, O(log diameter) convergence,
    max_iters as a raising fuse."""
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        hopped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(F.col("lbl"), F.coalesce("nlbl", F.col("lbl"))).alias(
                "lbl"
            ),
        )
        new_labels = (
            hopped.alias("a")
            .join(
                hopped.select(
                    F.col("doc_id").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("b"),
                "lbl",
                "left",
            )
            .select(
                "doc_id",
                F.least(
                    F.col("lbl"), F.coalesce("lbl2", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"directed min-reach did not converge in {max_iters} "
            "iterations — graph diameter exceeds the propagation budget"
        )
    return labels


def _scc_ids(docs: DataFrame, max_outer: int = 16) -> DataFrame:
    """(doc_id, scc_id) over the directed page graph via the
    two-direction min-label COLORING algorithm: per round, fwd(v) =
    min node reaching v and bwd(v) = min node v reaches; fwd(v) ==
    bwd(v) == c certifies c→*v AND v→*c, i.e. v ∈ SCC(c) — those
    nodes are assigned and peeled, and the remainder re-colors.
    Progress is guaranteed (the global min m of the remainder always
    has fwd(m) = bwd(m) = m), and rounds ≈ the number of SCC 'layers'
    below the running min — 2 on this corpus's two-component graph,
    O(tens) on web-shaped graphs with a giant core (Broder's bowtie).
    max_outer raises rather than returning a partial assignment."""
    edges_all = _pagelinks(docs).localCheckpoint(eager=True)
    remaining = docs.select("doc_id").localCheckpoint(eager=True)
    assigned = None
    for _ in range(max_outer):
        if remaining.isEmpty():
            break
        e = (
            edges_all.join(
                remaining.select(F.col("doc_id").alias("src")), "src"
            )
            .join(remaining.select(F.col("doc_id").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        fwd = _min_reach(remaining, e).withColumnRenamed("lbl", "fwd")
        bwd = _min_reach(
            remaining,
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ).withColumnRenamed("lbl", "bwd")
        both = fwd.join(bwd, "doc_id").localCheckpoint(eager=True)
        found = both.filter(F.col("fwd") == F.col("bwd")).select(
            "doc_id", F.col("fwd").alias("scc_id")
        )
        assigned = (
            found if assigned is None else assigned.unionAll(found)
        ).localCheckpoint(eager=True)
        remaining = (
            both.filter(F.col("fwd") != F.col("bwd"))
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"SCC coloring did not converge in {max_outer} rounds"
        )
    return assigned


_SCC_SQL_CTES = """reach(src, dst) AS (
      SELECT src, dst FROM links
      UNION
      SELECT r.src, l.dst FROM reach r JOIN links l ON l.src = r.dst
    ),
    mutual AS (
      SELECT a.src AS v, a.dst AS u
      FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
    ),
    sccid AS (
      SELECT d.doc_id,
             least(d.doc_id, coalesce(min(m.u), d.doc_id)) AS scc_id
      FROM documents d LEFT JOIN mutual m ON m.v = d.doc_id
      GROUP BY d.doc_id
    ),
    sizes AS (SELECT scc_id, count(*) AS sz FROM sccid GROUP BY scc_id)"""


@query(
    "scc_page_graph",
    f"""
    WITH RECURSIVE {_PAGELINKS_SQL_CTES},
    {_SCC_SQL_CTES}
    SELECT CAST(sz AS BIGINT) AS scc_size,
           CAST(count(*) AS BIGINT) AS n_sccs,
           CAST(min(scc_id) AS BIGINT) AS min_scc_id
    FROM sizes GROUP BY sz
    """,
)
def scc_page_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRONGLY connected components of the directed page-link graph —
    the directed twin of dedup_clusters' undirected CC, and the
    operator web-graph analysis is built on (mutual reachability is
    what makes a link ring a ring; undirected CC collapses every
    drive-by link into a false cluster). Engine: the two-direction
    min-label coloring algorithm (_scc_ids) — per peel round, two
    pointer-jumped min-reach propagations and an equality filter; the
    oracle computes ground truth from the transitive closure
    (recursive CTE → mutual-pair min), pinning the fixpoint. Output
    is the SCC size histogram — this corpus's generator graph
    resolves to exactly two SCCs (a 20%/80% split at every SF), which
    the histogram exposes at a glance.

    Scale shape: each round is O(E) joins with plan depth clamped by
    localCheckpoint; pointer jumping makes propagation O(log D). The
    closure the oracle builds (O(V·V) pairs) is exactly what the
    engine NEVER materializes — labels carry one id per node, the
    10^10-page-safe representation."""
    docs = load(spark, sf_dir, "documents")
    scc = _scc_ids(docs)
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("sz"))
    return sizes.groupBy("sz").agg(
        F.count("*").cast("bigint").alias("n_sccs"),
        F.min("scc_id").cast("bigint").alias("min_scc_id"),
    ).select(
        F.col("sz").cast("bigint").alias("scc_size"),
        "n_sccs",
        "min_scc_id",
    )


@query(
    "bowtie_decomposition",
    f"""
    WITH RECURSIVE {_PAGELINKS_SQL_CTES},
    {_SCC_SQL_CTES},
    core AS (
      SELECT scc_id FROM sizes ORDER BY sz DESC, scc_id LIMIT 1
    ),
    corenodes AS (
      SELECT doc_id FROM sccid
      WHERE scc_id = (SELECT scc_id FROM core)
    ),
    to_core AS (
      SELECT DISTINCT r.src AS v
      FROM reach r JOIN corenodes c ON r.dst = c.doc_id
    ),
    from_core AS (
      SELECT DISTINCT r.dst AS v
      FROM reach r JOIN corenodes c ON r.src = c.doc_id
    ),
    cls AS (
      SELECT d.doc_id,
             CASE WHEN s.scc_id = (SELECT scc_id FROM core) THEN 'core'
                  WHEN t.v IS NOT NULL THEN 'in'
                  WHEN f.v IS NOT NULL THEN 'out'
                  ELSE 'tendril_or_disconnected' END AS component
      FROM documents d
      JOIN sccid s ON s.doc_id = d.doc_id
      LEFT JOIN to_core t ON t.v = d.doc_id
      LEFT JOIN from_core f ON f.v = d.doc_id
    )
    SELECT component, CAST(count(*) AS BIGINT) AS n_pages
    FROM cls GROUP BY component
    """,
)
def bowtie_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder's WEB BOW-TIE over the page graph: CORE = the largest
    SCC (tie → min scc_id), IN = pages that reach the core, OUT =
    pages the core reaches, TENDRIL_OR_DISCONNECTED = the rest — the
    canonical macro-structure question a crawl answers about the web
    it fetched ('how much of what we crawled can even route back to
    the hub?'). A non-core page can never be both IN and OUT (it
    would be in the core SCC), so the classes partition exactly.

    Engine: SCC from _scc_ids, then each reachability side is ONE
    pointer-jumped min-reach with a VIRTUAL node −1 wired to the core
    (−1 → core in the forward graph marks core-reaches-v; −1 → core
    in the REVERSED graph marks v-reaches-core): −1 is the global
    min, so 'marked' is simply lbl == −1, and the boolean BFS that
    would cost O(D) unaccelerated rounds inherits min-reach's
    O(log D) pointer jumping for free. The oracle classifies from the
    transitive closure.

    Scale shape: three label propagations (SCC's two + one per
    direction), all localCheckpoint-clamped, no closure
    materialization; the core row is a 1-row broadcast."""
    docs = load(spark, sf_dir, "documents")
    nodes = docs.select("doc_id")
    edges = _pagelinks(docs).localCheckpoint(eager=True)
    scc = _scc_ids(docs).localCheckpoint(eager=True)
    sizes = scc.groupBy("scc_id").agg(F.count("*").alias("sz"))
    core_row = sizes.orderBy(F.desc("sz"), F.asc("scc_id")).limit(1)
    core_nodes = scc.join(
        F.broadcast(core_row.select("scc_id")), "scc_id"
    ).select("doc_id")
    virt = nodes.sparkSession.range(1).select(
        F.lit(-1).cast("long").alias("doc_id")
    )
    nodes_v = nodes.unionAll(virt)
    fwd_edges = edges.unionAll(
        core_nodes.select(
            F.lit(-1).cast("long").alias("src"), F.col("doc_id").alias("dst")
        )
    )
    rev_edges = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    ).unionAll(
        core_nodes.select(
            F.lit(-1).cast("long").alias("src"), F.col("doc_id").alias("dst")
        )
    )
    from_core = (
        _min_reach(nodes_v, fwd_edges)
        .filter(F.col("doc_id") >= 0)
        .select("doc_id", (F.col("lbl") == -1).alias("f"))
    )
    to_core = (
        _min_reach(nodes_v, rev_edges)
        .filter(F.col("doc_id") >= 0)
        .select("doc_id", (F.col("lbl") == -1).alias("t"))
    )
    cls = (
        scc.join(F.broadcast(core_row.select(F.col("scc_id").alias("core_id"))))
        .join(to_core, "doc_id")
        .join(from_core, "doc_id")
        .select(
            F.when(F.col("scc_id") == F.col("core_id"), "core")
            .when(F.col("t"), "in")
            .when(F.col("f"), "out")
            .otherwise("tendril_or_disconnected")
            .alias("component")
        )
    )
    return cls.groupBy("component").agg(
        F.count("*").cast("bigint").alias("n_pages")
    )


@query(
    "scc_condensation_dag",
    f"""
    WITH RECURSIVE {_PAGELINKS_SQL_CTES},
    {_SCC_SQL_CTES}
    SELECT CAST(sa.scc_id AS BIGINT) AS src_scc,
           CAST(sb.scc_id AS BIGINT) AS dst_scc,
           CAST(count(*) AS BIGINT) AS n_links
    FROM links l
    JOIN sccid sa ON sa.doc_id = l.src
    JOIN sccid sb ON sb.doc_id = l.dst
    WHERE sa.scc_id <> sb.scc_id
    GROUP BY 1, 2
    """,
)
def scc_condensation_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONDENSATION of the page graph: collapse each SCC to one
    node and keep only cross-SCC edges with their link multiplicity —
    always a DAG (a cycle between condensation nodes would merge the
    SCCs), and the frame every downstream DAG algorithm (topological
    ordering, critical-path, dependency rollups) starts from; on this
    corpus it also certifies, in data, that the two components the
    SCC histogram shows are genuinely disconnected (empty result) —
    while the 3-node pin graph yields its one bridge edge.

    Scale shape: the SCC labels join onto the edge list twice (both
    broadcast-able at host-graph scale — the condensation is the
    10^7-node frame, not the 10^10-page one) and fold by the label
    pair; no closure, no self-join of the condensation."""
    docs = load(spark, sf_dir, "documents")
    edges = _pagelinks(docs)
    scc = _scc_ids(docs).localCheckpoint(eager=True)
    sa = scc.select(
        F.col("doc_id").alias("src"), F.col("scc_id").alias("src_scc")
    )
    sb = scc.select(
        F.col("doc_id").alias("dst"), F.col("scc_id").alias("dst_scc")
    )
    return (
        edges.join(sa, "src")
        .join(sb, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .groupBy("src_scc", "dst_scc")
        .agg(F.count("*").cast("bigint").alias("n_links"))
        .select(
            F.col("src_scc").cast("bigint"),
            F.col("dst_scc").cast("bigint"),
            "n_links",
        )
    )


@query(
    "wl_graph_fingerprint",
    f"""
    WITH {_PAGELINKS_SQL_CTES},
    c0 AS (
      SELECT d.doc_id,
             CAST(coalesce(o.dg, 0) AS VARCHAR) AS color
      FROM documents d
      LEFT JOIN (SELECT src, count(*) AS dg FROM links GROUP BY src) o
        ON o.src = d.doc_id
    ),
    n1 AS (
      SELECT l.src, string_agg(c.color, ',' ORDER BY c.color) AS nb
      FROM links l JOIN c0 c ON c.doc_id = l.dst
      GROUP BY l.src
    ),
    c1 AS (
      SELECT c0.doc_id,
             md5(c0.color || '|' || coalesce(n1.nb, '')) AS color
      FROM c0 LEFT JOIN n1 ON n1.src = c0.doc_id
    ),
    n2 AS (
      SELECT l.src, string_agg(c.color, ',' ORDER BY c.color) AS nb
      FROM links l JOIN c1 c ON c.doc_id = l.dst
      GROUP BY l.src
    ),
    c2 AS (
      SELECT c1.doc_id,
             md5(c1.color || '|' || coalesce(n2.nb, '')) AS color
      FROM c1 LEFT JOIN n2 ON n2.src = c1.doc_id
    )
    SELECT color AS wl_color, CAST(count(*) AS BIGINT) AS n_nodes
    FROM c2 GROUP BY color
    """,
)
def wl_graph_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-dimensional Weisfeiler–Lehman color refinement (2 rounds)
    over the directed page graph: color₀ = out-degree, colorₜ₊₁ =
    md5(colorₜ ‖ sorted out-neighbor colors) — the graph-structure
    FINGERPRINT operator (two graphs with different WL color
    histograms are certainly non-isomorphic; near-identical
    histograms across crawl snapshots mean the topology didn't move
    even if ids did). The color histogram is the output — the
    canonical form that makes snapshot-to-snapshot structural diff a
    set compare, the structural complement of crawl_snapshot_delta's
    content diff. The sorted-neighbor-multiset string is the WL
    injection step: sort_array(collect_list) on the Spark side,
    string_agg(ORDER BY) in the oracle — identical canonical strings
    (hex colors contain no commas), md5 identical bytes.

    Scale shape: each round is one groupBy(src) fold of neighbor
    colors plus one left join back — 2 rounds, no iteration to
    fixpoint (WL stabilizes in ≤ diameter rounds; 2 is the standard
    kernel depth), no closure. Color strings stay O(out-degree);
    md5 re-compresses every round so payloads never grow."""
    docs = load(spark, sf_dir, "documents")
    edges = _pagelinks(docs).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("dg"))
    colors = (
        docs.select("doc_id")
        .join(deg, docs.doc_id == deg.src, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dg"), F.lit(0)).cast("string").alias("color"),
        )
    )
    for _ in range(2):
        nb = (
            edges.join(
                colors.select(
                    F.col("doc_id").alias("dst"), F.col("color").alias("c")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(
                F.array_join(F.sort_array(F.collect_list("c")), ",").alias(
                    "nb"
                )
            )
        )
        colors = (
            colors.join(nb, colors.doc_id == nb.src, "left")
            .select(
                "doc_id",
                F.md5(
                    F.concat(
                        F.col("color"),
                        F.lit("|"),
                        F.coalesce(F.col("nb"), F.lit("")),
                    )
                ).alias("color"),
            )
        )
    return colors.groupBy(F.col("color").alias("wl_color")).agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


@query(
    "difference_in_differences",
    """
    WITH d AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS treat,
             epoch_ms(ts) // 86400000 AS day,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    win AS (
      SELECT (min(day) + max(day) + 1) // 2 AS mid FROM d
    ),
    cells AS (
      SELECT treat,
             CASE WHEN d.day >= win.mid THEN 1 ELSE 0 END AS post,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(y AS HUGEINT)) AS s1,
             sum(CAST(y AS HUGEINT) * y) AS s2
      FROM d CROSS JOIN win GROUP BY 1, 2
    ),
    w AS (
      SELECT
        max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
        max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
        max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
        max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
        max(CASE WHEN treat = 0 AND post = 0 THEN s1 END) AS a00,
        max(CASE WHEN treat = 0 AND post = 1 THEN s1 END) AS a01,
        max(CASE WHEN treat = 1 AND post = 0 THEN s1 END) AS a10,
        max(CASE WHEN treat = 1 AND post = 1 THEN s1 END) AS a11,
        max(CASE WHEN treat = 0 AND post = 0 THEN s2 END) AS b00,
        max(CASE WHEN treat = 0 AND post = 1 THEN s2 END) AS b01,
        max(CASE WHEN treat = 1 AND post = 0 THEN s2 END) AS b10,
        max(CASE WHEN treat = 1 AND post = 1 THEN s2 END) AS b11
      FROM cells
    )
    SELECT n00, n01, n10, n11,
           CASE WHEN n00 > 0 AND n01 > 0 AND n10 > 0 AND n11 > 0
                THEN round((CAST(a11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                            - CAST(a10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                           - (CAST(a01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                              - CAST(a00 AS DOUBLE) / CAST(n00 AS DOUBLE)),
                           6)
           END AS did_cents,
           CASE WHEN n00 > 1 AND n01 > 1 AND n10 > 1 AND n11 > 1
                 AND (n00 * b00 - a00 * a00 > 0
                      OR n01 * b01 - a01 * a01 > 0
                      OR n10 * b10 - a10 * a10 > 0
                      OR n11 * b11 - a11 * a11 > 0)
                THEN round(
                  ((CAST(a11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                    - CAST(a10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                   - (CAST(a01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                      - CAST(a00 AS DOUBLE) / CAST(n00 AS DOUBLE)))
                  * ((CAST(a11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                      - CAST(a10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                     - (CAST(a01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                        - CAST(a00 AS DOUBLE) / CAST(n00 AS DOUBLE)))
                  / (CAST(n00 * b00 - a00 * a00 AS DOUBLE)
                     / (CAST(n00 AS DOUBLE) * CAST(n00 AS DOUBLE)
                        * (CAST(n00 AS DOUBLE) - 1))
                     + CAST(n01 * b01 - a01 * a01 AS DOUBLE)
                       / (CAST(n01 AS DOUBLE) * CAST(n01 AS DOUBLE)
                          * (CAST(n01 AS DOUBLE) - 1))
                     + CAST(n10 * b10 - a10 * a10 AS DOUBLE)
                       / (CAST(n10 AS DOUBLE) * CAST(n10 AS DOUBLE)
                          * (CAST(n10 AS DOUBLE) - 1))
                     + CAST(n11 * b11 - a11 * a11 AS DOUBLE)
                       / (CAST(n11 AS DOUBLE) * CAST(n11 AS DOUBLE)
                          * (CAST(n11 AS DOUBLE) - 1))), 6)
           END AS z2,
           CASE WHEN n00 > 1 AND n01 > 1 AND n10 > 1 AND n11 > 1
                 AND (n00 * b00 - a00 * a00 > 0
                      OR n01 * b01 - a01 * a01 > 0
                      OR n10 * b10 - a10 * a10 > 0
                      OR n11 * b11 - a11 * a11 > 0)
                THEN ((CAST(a11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                       - CAST(a10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                      - (CAST(a01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                         - CAST(a00 AS DOUBLE) / CAST(n00 AS DOUBLE)))
                     * ((CAST(a11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                         - CAST(a10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                        - (CAST(a01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                           - CAST(a00 AS DOUBLE) / CAST(n00 AS DOUBLE)))
                     / (CAST(n00 * b00 - a00 * a00 AS DOUBLE)
                        / (CAST(n00 AS DOUBLE) * CAST(n00 AS DOUBLE)
                           * (CAST(n00 AS DOUBLE) - 1))
                        + CAST(n01 * b01 - a01 * a01 AS DOUBLE)
                          / (CAST(n01 AS DOUBLE) * CAST(n01 AS DOUBLE)
                             * (CAST(n01 AS DOUBLE) - 1))
                        + CAST(n10 * b10 - a10 * a10 AS DOUBLE)
                          / (CAST(n10 AS DOUBLE) * CAST(n10 AS DOUBLE)
                             * (CAST(n10 AS DOUBLE) - 1))
                        + CAST(n11 * b11 - a11 * a11 AS DOUBLE)
                          / (CAST(n11 AS DOUBLE) * CAST(n11 AS DOUBLE)
                             * (CAST(n11 AS DOUBLE) - 1)))
                     > 3.8416
           END AS significant
    FROM w
    """,
)
def difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over a 2×2 (treat × pre/post) design —
    the causal-inference member the A/B family is missing (ab_test_*
    randomize at assignment time; DiD is what you run when treatment
    arrived as a POLICY at a point in time and the control cohort
    carries the trend): treat = user parity, post = the second half
    of the observation window (midpoint from exact integer epoch-day
    min/max, ceil-rounded identically via (min+max+1) DIV 2). Each
    cell folds to exact integers (n, Σy, Σy² in cents, products cast
    wide before summing); the estimate (m̄₁₁−m̄₁₀)−(m̄₀₁−m̄₀₀) and the
    four-cell Welch-style z² are single double trees of those
    integers (welch_mean_ztest discipline), gated by exact-integer
    guards: all cells populated for the estimate, all n > 1 plus at
    least one positive variance numerator for the verdict.

    Scale shape: one pass to 4 cells (map-side combinable, the
    1-row day-window broadcast joined in), then scalar arithmetic."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    day = (ntz_epoch_ms(F.col("ts")) / F.lit(86400000)).cast("bigint")
    d = ev.select(
        (F.col("user_id") % 2).cast("bigint").alias("treat"),
        day.alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    win = d.agg(
        ((F.min("day") + F.max("day") + 1) / 2)
        .cast("bigint")
        .alias("mid")
    )
    cells = (
        d.crossJoin(F.broadcast(win))
        .groupBy(
            "treat",
            F.when(F.col("day") >= F.col("mid"), 1).otherwise(0).alias(
                "post"
            ),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("y").cast(d38)).alias("s1"),
            F.sum(F.col("y").cast(d38) * F.col("y")).alias("s2"),
        )
    )

    def cell(col: str, tr: int, po: int) -> Column:
        return F.max(
            F.when((F.col("treat") == tr) & (F.col("post") == po), F.col(col))
        )

    w = cells.agg(
        *[
            cell("n", t, p).alias(f"n{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        *[
            cell("s1", t, p).alias(f"a{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
        *[
            cell("s2", t, p).alias(f"b{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
        ],
    )

    def m(t: int, p: int) -> Column:
        return F.col(f"a{t}{p}").cast("double") / F.col(
            f"n{t}{p}"
        ).cast("double")

    def vnum(t: int, p: int) -> Column:
        return F.col(f"n{t}{p}") * F.col(f"b{t}{p}") - F.col(
            f"a{t}{p}"
        ) * F.col(f"a{t}{p}")

    def vterm(t: int, p: int) -> Column:
        nd = F.col(f"n{t}{p}").cast("double")
        return vnum(t, p).cast("double") / (nd * nd * (nd - 1))

    did = (m(1, 1) - m(1, 0)) - (m(0, 1) - m(0, 0))
    se2 = vterm(0, 0) + vterm(0, 1) + vterm(1, 0) + vterm(1, 1)
    z2 = did * did / se2
    all_pop = (
        (F.col("n00") > 0)
        & (F.col("n01") > 0)
        & (F.col("n10") > 0)
        & (F.col("n11") > 0)
    )
    guard = (
        (F.col("n00") > 1)
        & (F.col("n01") > 1)
        & (F.col("n10") > 1)
        & (F.col("n11") > 1)
        & (
            (vnum(0, 0) > 0)
            | (vnum(0, 1) > 0)
            | (vnum(1, 0) > 0)
            | (vnum(1, 1) > 0)
        )
    )
    return w.select(
        "n00",
        "n01",
        "n10",
        "n11",
        F.when(all_pop, F.round(did, 6)).alias("did_cents"),
        F.when(guard, F.round(z2, 6)).alias("z2"),
        F.when(guard, z2 > 3.8416).alias("significant"),
    )


def _markov_stationary_sql(iters: int = 6) -> str:
    """K chained power-iteration steps as SQL CTEs over the event-type
    transition matrix — all arithmetic scaled-integer (see
    markov_stationary_power)."""
    chain = []
    for k in range(1, iters + 1):
        chain.append(
            f"""p{k} AS (
      SELECT s.state,
             CAST(coalesce(f.flow, 0)
                  + CASE WHEN mm.src IS NULL THEN p.pi ELSE 0 END
                  AS BIGINT) AS pi
      FROM states s
      LEFT JOIN (
        SELECT t.dst AS state,
               CAST(sum((CAST(p.pi AS HUGEINT) * t.n) // mo.m)
                    AS BIGINT) AS flow
        FROM trans t
        JOIN p{k - 1} p ON p.state = t.src
        JOIN m mo ON mo.src = t.src
        GROUP BY t.dst
      ) f ON f.state = s.state
      LEFT JOIN p{k - 1} p ON p.state = s.state
      LEFT JOIN m mm ON mm.src = s.state
    )"""
        )
    joined = ",\n    ".join(chain)
    return f"""
    WITH o AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n
      FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    m AS (SELECT src, CAST(sum(n) AS BIGINT) AS m FROM trans GROUP BY 1),
    states AS (SELECT DISTINCT event_type AS state FROM events),
    ns AS (SELECT count(*) AS c FROM states),
    p0 AS (
      SELECT state, CAST(1000000000000 // c AS BIGINT) AS pi
      FROM states, ns
    ),
    {joined}
    SELECT state, pi AS pi_scaled,
           CAST(row_number() OVER (ORDER BY pi DESC, state) AS BIGINT)
             AS rnk
    FROM p{iters}
    """


@query("markov_stationary_power", _markov_stationary_sql())
def markov_stationary_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behaviour Markov chain via
    6 power-iteration steps from uniform — the long-run occupancy the
    raw transition matrix (events_markov_transitions) only implies:
    "where do users SPEND their sessions", the number behind cache
    sizing and capacity planning per event surface.

    Cross-engine exactness (pagerank_dup_graph discipline): mass is a
    scaled 10^12 BIGINT; each step ships (pi·n) div m along the
    transition edges — the product cast DECIMAL(38,0)/HUGEINT BEFORE
    multiplying (pi·n ≤ 10^12·|events| overflows BIGINT) — and integer
    sums are order-independent where float sums are not. States with
    no observed successor (possible in tiny slices where a type only
    appears sequence-final) keep their own mass — the self-loop
    convention, so total mass never leaks.

    Scale shape: ONE event-sized shuffle (the per-user lead window);
    everything after lives on the |states|² transition frame — the
    6 join+agg steps are broadcast-sized. The same loop at a 10^10-row
    event log still pays only the one window exchange."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = (
        o.groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    m = trans.groupBy("src").agg(F.sum("n").cast("bigint").alias("m"))
    states = (
        ev.select(F.col("event_type").alias("state"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ns = states.agg(F.count("*").alias("c"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        "state", F.expr("CAST(1000000000000 div c AS BIGINT)").alias("pi")
    )
    has_out = m.select(F.col("src").alias("state"), F.lit(1).alias("has_out"))
    for _ in range(6):
        flow = (
            trans.join(
                pi.select(F.col("state").alias("src"), "pi"), "src"
            )
            .join(m, "src")
            .select(
                F.col("dst").alias("state"),
                F.expr(
                    "CAST((CAST(pi AS DECIMAL(38,0)) * n) div m AS BIGINT)"
                ).alias("c"),
            )
            .groupBy("state")
            .agg(F.sum("c").cast("bigint").alias("flow"))
        )
        pi = (
            states.join(flow, "state", "left")
            .join(pi, "state", "left")
            .join(has_out, "state", "left")
            .select(
                "state",
                (
                    F.coalesce(F.col("flow"), F.lit(0))
                    + F.when(F.col("has_out").isNull(), F.col("pi")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("bigint")
                .alias("pi"),
            )
        )
    rw = Window.orderBy(F.col("pi").desc(), "state")
    return pi.select(
        "state",
        F.col("pi").alias("pi_scaled"),
        F.row_number().over(rw).cast("bigint").alias("rnk"),
    )


@query(
    "source_modularity",
    f"""
    WITH {_PAGELINKS_SQL_CTES},
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM links
    ),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
    comm AS (SELECT doc_id, source FROM documents),
    deg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT a AS doc_id FROM und UNION ALL SELECT b FROM und
      ) GROUP BY 1
    ),
    dc AS (
      SELECT c.source, CAST(sum(d.d) AS BIGINT) AS d_c
      FROM deg d JOIN comm c USING (doc_id) GROUP BY 1
    ),
    ec AS (
      SELECT ca.source, CAST(count(*) AS BIGINT) AS e_c
      FROM und u
      JOIN comm ca ON ca.doc_id = u.a
      JOIN comm cb ON cb.doc_id = u.b
      WHERE ca.source = cb.source
      GROUP BY 1
    )
    SELECT d.source,
           coalesce(e.e_c, 0) AS within_edges,
           d.d_c AS degree_sum,
           CASE WHEN mm.m > 0 THEN round(
             CAST(4 * mm.m * coalesce(e.e_c, 0) - d.d_c * d.d_c AS DOUBLE)
             / CAST(4 * mm.m * mm.m AS DOUBLE), 6)
           END AS q_contrib
    FROM dc d LEFT JOIN ec e USING (source) CROSS JOIN mm
    """,
)
def source_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the SOURCE partition over the page-link
    graph — "does linking stay within a crawl source?": per community
    the within-edge count, degree sum, and its additive contribution
    to Q = Σ_c [e_c/m − (d_c/2m)²] (sum the q_contrib column for the
    scalar). Positive total ⇒ sources are link-communities (crawl
    frontiers can shard by source without cutting many edges);
    ≈0 ⇒ the attribute is independent of topology. Unlike
    label_propagation this scores a GIVEN partition, closing the
    community family: detect (label_propagation) then QUANTIFY (here).

    Exactness: edges undirected via DISTINCT(least, greatest); the
    contribution is one double division of two exact integers,
    (4·m·e_c − d_c²) / 4m², guarded on m > 0 (a 1-document corpus has
    no links).

    Scale shape: two joins ship community labels along edges (each a
    doc_id-keyed shuffle an AQE skew split handles), degree/within
    counts are map-side-combinable aggs, and the 1-row m frame
    broadcasts. No all-pairs term anywhere."""
    docs = load(spark, sf_dir, "documents")
    links = _pagelinks(docs)
    und = (
        links.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    mm = und.agg(F.count("*").cast("bigint").alias("m"))
    comm = docs.select("doc_id", "source")
    deg = (
        und.select(F.col("a").alias("doc_id"))
        .unionAll(und.select(F.col("b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    dc = (
        deg.join(comm, "doc_id")
        .groupBy("source")
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    ec = (
        und.join(
            comm.select(F.col("doc_id").alias("a"), F.col("source").alias("sa")),
            "a",
        )
        .join(
            comm.select(F.col("doc_id").alias("b"), F.col("source").alias("sb")),
            "b",
        )
        .filter(F.col("sa") == F.col("sb"))
        .groupBy(F.col("sa").alias("source"))
        .agg(F.count("*").cast("bigint").alias("e_c"))
    )
    ecz = F.coalesce(F.col("e_c"), F.lit(0))
    return (
        dc.join(ec, "source", "left")
        .crossJoin(F.broadcast(mm))
        .select(
            "source",
            ecz.alias("within_edges"),
            F.col("d_c").alias("degree_sum"),
            F.when(
                F.col("m") > 0,
                F.round(
                    (4 * F.col("m") * ecz - F.col("d_c") * F.col("d_c")).cast(
                        "double"
                    )
                    / (4 * F.col("m") * F.col("m")).cast("double"),
                    6,
                ),
            ).alias("q_contrib"),
        )
    )


@query(
    "jarque_bera_normality",
    """
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT))
               AS s1,
             sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                 * CAST(round(value * 100) AS BIGINT)) AS s2,
             sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                 * CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS s3,
             sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
                 * CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT)) AS s4
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT event_type, n,
             n > 3 AND n * s2 - s1 * s1 > 0 AS ok,
             CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS r1,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
      FROM s
    ),
    c AS (
      SELECT event_type, n, ok, nd,
             r2 - r1 * r1 AS mu2,
             r3 - 3 * r1 * r2 + 2 * (r1 * r1 * r1) AS mu3,
             r4 - 4 * r1 * r3 + 6 * ((r1 * r1) * r2)
                - 3 * ((r1 * r1) * (r1 * r1)) AS mu4
      FROM d
    ),
    k AS (
      SELECT event_type, n, ok, nd,
             CASE WHEN ok THEN mu3 / (mu2 * sqrt(mu2)) END AS skew,
             CASE WHEN ok THEN mu4 / (mu2 * mu2) - 3 END AS kx
      FROM c
    )
    SELECT event_type, n,
           CASE WHEN ok THEN round(skew, 6) END AS skewness,
           CASE WHEN ok THEN round(kx, 6) END AS kurtosis_excess,
           CASE WHEN ok
                THEN round(nd * (skew * skew + kx * kx / 4) / 6, 6)
           END AS jb,
           CASE WHEN ok
                THEN nd * (skew * skew + kx * kx / 4) / 6 > 5.991465
           END AS normal_rejected
    FROM k
    """,
)
def jarque_bera_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type — the moment-based
    normality gate (JB = n/6·(S² + K²/4), S skewness, K excess
    kurtosis, χ²₂ critical 5.991) that says whether z-score anomaly
    thresholds (events_anomaly_zscore) and Welch verdicts are even
    meaningful for this slice: a heavy-tailed type needs the MAD or
    rank path instead.

    Exactness discipline: raw moments Σy..Σy⁴ over cents are exact
    integers (products cast DECIMAL(38,0)/HUGEINT BEFORE summing —
    y⁴ ≈ 10²⁴ at 10⁶-cent values, far past BIGINT); central moments,
    S, K and JB are then ONE layered double tree of those integers
    (the welch_mean_ztest discipline, staged via named intermediate
    columns so both engines build the identical IEEE tree), behind
    the exact-integer guard n > 3 AND n·Σy² − (Σy)² > 0 (a constant
    slice has no defined moments).

    Scale shape: one map-side-combinable pass over the fact table to
    |types| rows of 5 integers; all the statistics are driver-free
    arithmetic on that frame."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    y = F.round(F.col("value") * 100).cast("bigint")
    yd = y.cast(d38)
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(yd).alias("s1"),
        F.sum(yd * y).alias("s2"),
        F.sum(yd * y * y).alias("s3"),
        F.sum(yd * y * y * y).alias("s4"),
    )
    nd = F.col("n").cast("double")
    d = s.select(
        "event_type",
        "n",
        ((F.col("n") > 3) & (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1") > 0)).alias("ok"),
        nd.alias("nd"),
        (F.col("s1").cast("double") / nd).alias("r1"),
        (F.col("s2").cast("double") / nd).alias("r2"),
        (F.col("s3").cast("double") / nd).alias("r3"),
        (F.col("s4").cast("double") / nd).alias("r4"),
    )
    r1, r2, r3, r4 = (F.col(x) for x in ("r1", "r2", "r3", "r4"))
    c = d.select(
        "event_type",
        "n",
        "ok",
        "nd",
        (r2 - r1 * r1).alias("mu2"),
        (r3 - 3 * r1 * r2 + 2 * (r1 * r1 * r1)).alias("mu3"),
        (
            r4 - 4 * r1 * r3 + 6 * ((r1 * r1) * r2) - 3 * ((r1 * r1) * (r1 * r1))
        ).alias("mu4"),
    )
    mu2, mu3, mu4 = (F.col(x) for x in ("mu2", "mu3", "mu4"))
    # the divisions are gated INSIDE this stage (not just at the final
    # projection): ANSI mode raises on mu2 = 0 for a constant slice if
    # the expression ever evaluates (degenerate pin:
    # test_jarque_bera_constant_slice)
    okc = F.col("ok")
    k = c.select(
        "event_type",
        "n",
        "ok",
        "nd",
        F.when(okc, mu3 / (mu2 * F.sqrt(mu2))).alias("skew"),
        F.when(okc, mu4 / (mu2 * mu2) - 3).alias("kx"),
    )
    skew, kx = F.col("skew"), F.col("kx")
    jb = F.col("nd") * (skew * skew + kx * kx / 4) / 6
    ok = F.col("ok")
    return k.select(
        "event_type",
        "n",
        F.when(ok, F.round(skew, 6)).alias("skewness"),
        F.when(ok, F.round(kx, 6)).alias("kurtosis_excess"),
        F.when(ok, F.round(jb, 6)).alias("jb"),
        F.when(ok, jb > 5.991465).alias("normal_rejected"),
    )


@query(
    "levene_test",
    """
    WITH o AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    g1 AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(y AS HUGEINT)) AS BIGINT) AS s_g
      FROM o GROUP BY grp
    ),
    z AS (
      SELECT o.grp, g1.n_g, abs(g1.n_g * o.y - g1.s_g) AS z
      FROM o JOIN g1 USING (grp)
    ),
    g AS (
      SELECT grp, n_g,
             sum(CAST(z AS HUGEINT)) AS a_g,
             sum(CAST(z AS HUGEINT) * z) AS b_g
      FROM z GROUP BY grp, n_g
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             CAST(max(CASE WHEN n_g * b_g - a_g * a_g > 0 THEN 1
                           ELSE 0 END) AS BIGINT) AS any_var
      FROM g
    ),
    zbar_f AS (
      SELECT sum(CAST(a_g AS DOUBLE) / (CAST(n_g AS DOUBLE)
                                        * CAST(n_g AS DOUBLE))
                 * CAST(n_g AS DOUBLE)) OVER (
               ORDER BY grp ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS sum_group_means,
             row_number() OVER (ORDER BY grp DESC) AS rn
      FROM g
    ),
    zbar AS (
      SELECT zbar_f.sum_group_means / CAST(tot.n AS DOUBLE) AS zb
      FROM zbar_f CROSS JOIN tot WHERE zbar_f.rn = 1
    ),
    folded AS (
      SELECT
        sum(CAST(n_g AS DOUBLE)
            * (CAST(a_g AS DOUBLE) / (CAST(n_g AS DOUBLE)
                                      * CAST(n_g AS DOUBLE)) - zbar.zb)
            * (CAST(a_g AS DOUBLE) / (CAST(n_g AS DOUBLE)
                                      * CAST(n_g AS DOUBLE)) - zbar.zb))
          OVER (ORDER BY grp ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS num,
        sum(CAST(b_g AS DOUBLE) / (CAST(n_g AS DOUBLE)
                                   * CAST(n_g AS DOUBLE))
            - (CAST(a_g AS DOUBLE) * CAST(a_g AS DOUBLE))
              / (CAST(n_g AS DOUBLE) * CAST(n_g AS DOUBLE)
                 * CAST(n_g AS DOUBLE))) OVER (
          ORDER BY grp ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW) AS den,
        row_number() OVER (ORDER BY grp DESC) AS rn
      FROM g CROSS JOIN zbar
    )
    SELECT tot.n, tot.k,
           CASE WHEN tot.k > 1 AND tot.n > tot.k AND tot.any_var = 1
                THEN round(CAST(tot.n - tot.k AS DOUBLE)
                           / CAST(tot.k - 1 AS DOUBLE)
                           * folded.num / folded.den, 6)
           END AS w,
           CASE WHEN tot.k > 1 AND tot.n > tot.k AND tot.any_var = 1
                THEN CAST(tot.n - tot.k AS DOUBLE)
                     / CAST(tot.k - 1 AS DOUBLE)
                     * folded.num / folded.den
                     > CASE tot.k - 1
                         WHEN 1 THEN 3.841459 WHEN 2 THEN 2.9957325
                         WHEN 3 THEN 2.6049093 WHEN 4 THEN 2.3719323
                         ELSE NULL END
           END AS heteroscedastic
    FROM folded CROSS JOIN tot WHERE folded.rn = 1
    """,
)
def levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test (mean-centered) for variance homogeneity across
    the five order priorities — the PRECONDITION check for every
    equal-variance assumption upstream: kruskal_wallis compares
    locations, welch_mean_ztest already pays the unequal-variance
    correction, and this is the test that says whether the plain
    pooled-variance shortcut would have been safe.

    Exactness: the absolute deviation |y − ȳ_g| is kept exact by
    scaling per group — z = |n_g·y − Σy_g| is an INTEGER (the float
    mean never materializes); per group A = Σz and B = Σz² are exact
    integer sums (cast HUGEINT/DECIMAL(38,0) before summing). Every
    within-group float quantity is then a ratio of those integers
    (Z̄_g = A/n_g², Σ(Z−Z̄_g)² = B/n_g² − A²/n_g³), and the k-row
    cross-group sums fold as ORDERED cumulative windows over the
    group frame (kruskal_wallis's canonical-float-order discipline).
    W = (N−k)/(k−1) · Σn_g(Z̄_g−Z̄)² / ΣΣ(Z−Z̄_g)², verdict vs the
    large-N F approximation χ²_{k−1}/(k−1) (df-indexed CASE, NULL
    beyond the table), guarded by exact-integer checks: k > 1,
    N > k, and at least one positive within-group variance numerator
    n_g·B − A².

    Scale shape: one agg to (n_g, Σy), one broadcast join back, one
    agg to (A, B) — two map-side-combinable passes over the fact
    table; everything after lives on the k-row frame."""
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    d38 = "decimal(38,0)"
    g1 = o.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum(F.col("y").cast(d38)).cast("bigint").alias("s_g"),
    )
    z = o.join(F.broadcast(g1), "grp").select(
        "grp",
        "n_g",
        F.abs(F.col("n_g") * F.col("y") - F.col("s_g")).alias("z"),
    )
    g = z.groupBy("grp", "n_g").agg(
        F.sum(F.col("z").cast(d38)).alias("a_g"),
        F.sum(F.col("z").cast(d38) * F.col("z")).alias("b_g"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("k"),
        F.max(
            F.when(
                F.col("n_g") * F.col("b_g") - F.col("a_g") * F.col("a_g") > 0,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("any_var"),
    )
    nd = F.col("n_g").cast("double")
    ad = F.col("a_g").cast("double")
    bd = F.col("b_g").cast("double")
    w_cum = Window.orderBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_last = Window.orderBy(F.desc("grp"))
    zbar_f = g.select(
        F.sum(ad / (nd * nd) * nd).over(w_cum).alias("sum_group_means"),
        F.row_number().over(w_last).alias("rn"),
    ).filter(F.col("rn") == 1)
    zbar = zbar_f.crossJoin(F.broadcast(tot)).select(
        (F.col("sum_group_means") / F.col("n").cast("double")).alias("zb")
    )
    folded = (
        g.crossJoin(F.broadcast(zbar))
        .select(
            F.sum(
                nd
                * (ad / (nd * nd) - F.col("zb"))
                * (ad / (nd * nd) - F.col("zb"))
            )
            .over(w_cum)
            .alias("num"),
            F.sum(bd / (nd * nd) - (ad * ad) / (nd * nd * nd))
            .over(w_cum)
            .alias("den"),
            F.row_number().over(w_last).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    res = folded.crossJoin(F.broadcast(tot))
    ok = (
        (F.col("k") > 1)
        & (F.col("n") > F.col("k"))
        & (F.col("any_var") == 1)
    )
    w_stat = (
        (F.col("n") - F.col("k")).cast("double")
        / (F.col("k") - 1).cast("double")
        * F.col("num")
        / F.col("den")
    )
    crit = (
        F.when(F.col("k") - 1 == 1, 3.841459)
        .when(F.col("k") - 1 == 2, 2.9957325)
        .when(F.col("k") - 1 == 3, 2.6049093)
        .when(F.col("k") - 1 == 4, 2.3719323)
    )
    return res.select(
        "n",
        "k",
        F.when(ok, F.round(w_stat, 6)).alias("w"),
        F.when(ok, w_stat > crit).alias("heteroscedastic"),
    )


@query(
    "durbin_watson_orders",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT y,
             CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
      FROM daily
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(t) AS BIGINT) AS st,
             CAST(sum(t * t) AS BIGINT) AS st2,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(t * y) AS BIGINT) AS sty
      FROM t
    ),
    coef AS (
      SELECT n, n * st2 - st * st AS d,
             n * sty - st * sy AS bd,
             sy * st2 - st * sty AS ad
      FROM s
    ),
    e AS (
      SELECT t.t, coef.n, coef.d,
             coef.d * t.y - coef.ad - coef.bd * t.t AS de
      FROM t CROSS JOIN coef
    ),
    l AS (
      SELECT n, d, de,
             lag(de) OVER (ORDER BY t) AS de_prev
      FROM e
    ),
    agg AS (
      SELECT n, d,
             sum(CAST(de AS HUGEINT) * de) AS ss,
             sum(CASE WHEN de_prev IS NOT NULL
                      THEN CAST(de - de_prev AS HUGEINT) * (de - de_prev)
                      ELSE CAST(0 AS HUGEINT) END) AS sd
      FROM l GROUP BY n, d
    )
    SELECT n AS n_days,
           CASE WHEN n > 2 AND d > 0 AND ss > 0
                THEN round(CAST(sd AS DOUBLE) / CAST(ss AS DOUBLE), 6)
           END AS dw,
           CASE WHEN n > 2 AND d > 0 AND ss > 0
                THEN round(1 - CAST(sd AS DOUBLE)
                               / CAST(ss AS DOUBLE) / 2, 6)
           END AS rho_hat,
           CASE WHEN n > 2 AND d > 0 AND ss > 0
                THEN CAST(sd AS DOUBLE) / CAST(ss AS DOUBLE) < 1.5
           END AS positive_autocorr
    FROM agg
    """,
)
def durbin_watson_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on the residuals of the daily
    order-count linear trend — the serial-correlation gate behind
    events_trend_ols and forecast_revenue_change: an OLS trend whose
    residuals autocorrelate (DW ≪ 2) has understated standard errors,
    so trend "significance" upstream is optimistic; DW ≈ 2 clears it.

    Exactness: the OLS residual is kept exact by SCALING by the
    normal-equation determinant — D·e_t = D·y_t − aD − bD·t where
    D = nΣt²−(Σt)², bD = nΣty−ΣtΣy, aD = ΣyΣt²−ΣtΣty are exact
    BIGINTs (counts/day bound every product well under 2^63); DW is
    then the ratio of two exact integer sums Σ(Δ(De))²/Σ(De)²
    (D² cancels; squares ride HUGEINT/DECIMAL(38,0)) evaluated as one
    double division. ρ̂ = 1 − DW/2; the verdict flags DW < 1.5 (the
    conventional positive-autocorrelation screen; exact dL/dU bounds
    are n-indexed tables out of scope). Guards: n > 2, D > 0
    (degenerate single-day series), Σ(De)² > 0 (a perfectly linear
    series has no residual to test) — all exact-integer compares.

    Scale shape: one agg to the day frame (bounded by the calendar),
    a 1-row broadcast of the five OLS sums, one lag window over days.
    The fact-table pass is a single map-side-combinable count."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    t = daily.select(
        "y",
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("bigint")
        .alias("t"),
    )
    s = t.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("st2"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sty"),
    )
    coef = s.select(
        "n",
        (F.col("n") * F.col("st2") - F.col("st") * F.col("st")).alias("d"),
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).alias("bd"),
        (F.col("sy") * F.col("st2") - F.col("st") * F.col("sty")).alias("ad"),
    )
    e = t.crossJoin(F.broadcast(coef)).select(
        "t",
        "n",
        "d",
        (F.col("d") * F.col("y") - F.col("ad") - F.col("bd") * F.col("t")).alias(
            "de"
        ),
    )
    d38 = "decimal(38,0)"
    lw = Window.orderBy("t")
    l = e.select("n", "d", "de", F.lag("de").over(lw).alias("de_prev"))
    diff = F.col("de") - F.col("de_prev")
    agg = l.groupBy("n", "d").agg(
        F.sum(F.col("de").cast(d38) * F.col("de")).alias("ss"),
        F.sum(
            F.when(
                F.col("de_prev").isNotNull(), diff.cast(d38) * diff
            ).otherwise(F.lit(0).cast(d38))
        ).alias("sd"),
    )
    ok = (F.col("n") > 2) & (F.col("d") > 0) & (F.col("ss") > 0)
    dw = F.col("sd").cast("double") / F.col("ss").cast("double")
    return agg.select(
        F.col("n").alias("n_days"),
        F.when(ok, F.round(dw, 6)).alias("dw"),
        F.when(ok, F.round(1 - dw / 2, 6)).alias("rho_hat"),
        F.when(ok, dw < 1.5).alias("positive_autocorr"),
    )


@query(
    "decision_stump_train",
    """
    WITH o AS (
      SELECT n_chars AS y,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lab
      FROM documents
    ),
    v AS (
      SELECT y, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(lab) AS BIGINT) AS pos
      FROM o GROUP BY y
    ),
    c AS (
      SELECT y,
             CAST(sum(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS nl,
             CAST(sum(pos) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS al
      FROM v
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(lab) AS BIGINT) AS a
      FROM o
    ),
    scored AS (
      SELECT c.y AS threshold, c.nl, c.al, tot.n, tot.a,
             (CAST(c.al AS DOUBLE) * CAST(c.al AS DOUBLE)
              + CAST(c.nl - c.al AS DOUBLE) * CAST(c.nl - c.al AS DOUBLE))
               / CAST(c.nl AS DOUBLE)
             + (CAST(tot.a - c.al AS DOUBLE) * CAST(tot.a - c.al AS DOUBLE)
                + CAST((tot.n - c.nl) - (tot.a - c.al) AS DOUBLE)
                  * CAST((tot.n - c.nl) - (tot.a - c.al) AS DOUBLE))
               / CAST(tot.n - c.nl AS DOUBLE) AS purity
      FROM c CROSS JOIN tot
      WHERE c.nl < tot.n
    ),
    best AS (
      SELECT threshold, nl, al, n, a, purity,
             row_number() OVER (ORDER BY purity DESC, threshold) AS rn
      FROM scored
    )
    SELECT threshold, nl AS n_left, n - nl AS n_right,
           al AS pos_left, a - al AS pos_right,
           round((CAST(n AS DOUBLE) - purity) / CAST(n AS DOUBLE), 6)
             AS gini_split,
           round(1 - (CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                      + CAST(n - a AS DOUBLE) * CAST(n - a AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
             AS gini_root
    FROM best WHERE rn = 1
    """,
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a one-split decision stump — is-English by document
    length — the simplest useful model the corpus pipeline trains
    (naive_bayes_model is its multi-feature sibling; a stump is what
    a quality-gate threshold IS, here chosen optimally instead of by
    hand): over every candidate threshold y ≤ t, pick the split
    minimizing weighted Gini impurity.

    Exactness: per-candidate class counts (n_L, a_L) are exact-integer
    cumulative windows over the distinct-value frame; minimizing
    impurity = maximizing purity = (a_L²+b_L²)/n_L + (a_R²+b_R²)/n_R,
    evaluated as ONE double tree of those integers (identical IEEE
    bits both engines, so the argmax row_number agrees), deterministic
    tiebreak on the lower threshold. The last cumulative row (empty
    right side) is excluded by the exact compare n_L < N, which also
    guards both divisions; a single-valued feature yields zero
    candidates and an empty result in both engines.

    Scale shape: one hash-agg to the distinct-(value) frame, one
    cumulative window over it (|distinct values| rows — bounded, not
    corpus-sized), a 1-row broadcast of class totals. At 10^10 docs
    swap the exact distinct frame for the quantile-histogram sketch's
    bin edges (quantile_histogram_sketch) — same plan, bounded
    candidates."""
    docs = load(spark, sf_dir, "documents")
    o = docs.select(
        F.col("n_chars").alias("y"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("lab"),
    )
    v = o.groupBy("y").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("lab").cast("bigint").alias("pos"),
    )
    w_cum = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        "y",
        F.sum("cnt").over(w_cum).cast("bigint").alias("nl"),
        F.sum("pos").over(w_cum).cast("bigint").alias("al"),
    )
    tot = o.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("a"),
    )
    ald = F.col("al").cast("double")
    bld = (F.col("nl") - F.col("al")).cast("double")
    ard = (F.col("a") - F.col("al")).cast("double")
    brd = ((F.col("n") - F.col("nl")) - (F.col("a") - F.col("al"))).cast(
        "double"
    )
    scored = (
        c.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
        .select(
            F.col("y").alias("threshold"),
            "nl",
            "al",
            "n",
            "a",
            (
                (ald * ald + bld * bld) / F.col("nl").cast("double")
                + (ard * ard + brd * brd)
                / (F.col("n") - F.col("nl")).cast("double")
            ).alias("purity"),
        )
    )
    best = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.orderBy(F.col("purity").desc(), "threshold")
        ),
    ).filter(F.col("rn") == 1)
    ad = F.col("a").cast("double")
    nd = F.col("n").cast("double")
    nad = (F.col("n") - F.col("a")).cast("double")
    return best.select(
        "threshold",
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        F.col("al").alias("pos_left"),
        (F.col("a") - F.col("al")).alias("pos_right"),
        F.round((nd - F.col("purity")) / nd, 6).alias("gini_split"),
        F.round(1 - (ad * ad + nad * nad) / (nd * nd), 6).alias("gini_root"),
    )


@query(
    "pettitt_changepoint",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    tv AS (
      SELECT y, CAST(count(*) AS BIGINT) AS tcnt FROM daily GROUP BY y
    ),
    r AS (
      SELECT y, tcnt,
             CAST(coalesce(sum(tcnt) OVER (
               ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS c_lt
      FROM tv
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    u AS (
      SELECT daily.day,
             CAST(sum(2 * r.c_lt + r.tcnt + 1) OVER (
               ORDER BY daily.day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT)
             - CAST(row_number() OVER (ORDER BY daily.day) AS BIGINT)
               * (nn.n + 1) AS u2
      FROM daily JOIN r USING (y) CROSS JOIN nn
    ),
    best AS (
      SELECT day, abs(u2) AS k,
             row_number() OVER (ORDER BY abs(u2) DESC, day) AS rn
      FROM u
    )
    SELECT nn.n AS n_days, best.day AS change_day,
           best.k AS k_stat,
           6 * CAST(best.k AS DOUBLE) * CAST(best.k AS DOUBLE)
             > 3.688879
               * (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)
                  * CAST(nn.n AS DOUBLE)
                  + CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE))
             AS significant
    FROM best CROSS JOIN nn WHERE best.rn = 1
    """,
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's rank-based changepoint test on daily order volume —
    the nonparametric twin of changepoint_cusum (CUSUM reacts to mean
    shifts in the VALUES and inherits their tails; Pettitt ranks
    first, so one crazy day can't fake a regime change): the day t
    maximizing |U_t|, U_t = Σ_{i≤t}Σ_{j>t} sgn(y_i − y_j), is the
    most likely split point.

    Exactness: by the midrank identity Σ_j sgn(y_i−y_j) = 2m_i−(n+1)
    (2m = 2·count_less + ties + 1, an integer even at half-integer
    midranks), U_t folds EXACTLY to (Σ_{i≤t} 2m_i) − t(n+1) — exact
    integers end-to-end (mann_whitney_u's machinery pointed at a
    cumulative window); K = max|U| is engine-exact and the argmax
    tiebreaks on the earlier day. The verdict evaluates the classic
    approximation p ≈ 2exp(−6K²/(n³+n²)) < 0.05 as one double
    compare (6K² > ln40·(n³+n²)) of exact integers. A constant
    series has every U_t = 0 — K = 0, first day, not significant —
    with no division anywhere to guard.

    Scale shape: one agg to the day frame, one ranks window over
    distinct values, one cumulative window over days (calendar-
    bounded), a 1-row n broadcast. The fact-table pass is a single
    map-side-combinable count."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    tv = daily.groupBy("y").agg(F.count("*").cast("bigint").alias("tcnt"))
    w_lt = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    r = tv.select(
        "y",
        "tcnt",
        F.coalesce(F.sum("tcnt").over(w_lt), F.lit(0))
        .cast("bigint")
        .alias("c_lt"),
    )
    nn = daily.agg(F.count("*").cast("bigint").alias("n"))
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = (
        daily.join(r, "y")
        .crossJoin(F.broadcast(nn))
        .select(
            "day",
            (
                F.sum(2 * F.col("c_lt") + F.col("tcnt") + 1)
                .over(w_cum)
                .cast("bigint")
                - F.row_number().over(Window.orderBy("day")).cast("bigint")
                * (F.col("n") + 1)
            ).alias("u2"),
        )
    )
    best = u.select(
        "day",
        F.abs(F.col("u2")).alias("k"),
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("u2")).desc(), "day"))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    return best.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        F.col("day").alias("change_day"),
        F.col("k").alias("k_stat"),
        (
            F.lit(6) * kd * kd
            > F.lit(3.688879) * (nd * nd * nd + nd * nd)
        ).alias("significant"),
    )


@query(
    "kendall_tau_topk",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> w = 'vector')) AS BIGINT) AS tf,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df
      FROM base
    ),
    m AS (
      SELECT doc_id,
             ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS bm25,
             tf * ln(CAST(n AS DOUBLE) / df) AS tfidf
      FROM base CROSS JOIN stats WHERE tf > 0
    ),
    ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r1,
             row_number() OVER (ORDER BY tfidf DESC, doc_id) AS r2
      FROM m
    ),
    topk AS (SELECT r1, r2 FROM ranked WHERE r1 <= 100),
    pairs AS (
      SELECT CAST(sum(CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN a.r2 > b.r2 THEN 1 ELSE 0 END)
               AS BIGINT) AS d
      FROM topk a JOIN topk b ON a.r1 < b.r1
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM topk)
    SELECT kk.k, coalesce(pairs.c, 0) AS concordant,
           coalesce(pairs.d, 0) AS discordant,
           CASE WHEN kk.k >= 2
                THEN round(CAST(coalesce(pairs.c, 0)
                                - coalesce(pairs.d, 0) AS DOUBLE)
                           / (CAST(kk.k AS DOUBLE)
                              * (CAST(kk.k AS DOUBLE) - 1) / 2), 6)
           END AS kendall_tau
    FROM pairs CROSS JOIN kk
    """,
)
def kendall_tau_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ between the BM25 and TF-IDF orderings of the top
    100 BM25 results for 'vector' — the pairwise-inversion companion
    of ranker_agreement_spearman (ρ weights displacement
    quadratically and is dominated by big jumps; τ counts HOW MANY
    pairs flipped — the number a reranker's swap budget actually
    answers to). Scoped to the served page (top-k), because that is
    where ranking disagreement costs anything.

    Exactness: both scorers are identical IEEE trees, so the
    positional row_number ranks (doc_id tiebreak) match bit-for-bit
    across engines; concordant/discordant counts are then exact
    integers from tie-free rank permutations and
    τ = (C−D)/(k(k−1)/2) is one double division, guarded on k ≥ 2
    (the empty-pairs frame coalesces to 0s).

    Scale shape: the quadratic pair join is over the k=100-row frame
    — 4,950 pairs at ANY corpus size, broadcast-joined; everything
    corpus-sized is the same single tokenize pass + rank windows the
    spearman twin pays. An all-matched-docs τ would be O(df²) and is
    deliberately not offered."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.size(F.filter(F.col("w"), lambda x: x == F.lit("vector")))
        .cast("bigint")
        .alias("tf"),
        F.size("w").cast("bigint").alias("dl"),
    )
    stats = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum((F.col("tf") > 0).cast("bigint")).cast("bigint").alias("df"),
    )
    m = base.filter(F.col("tf") > 0).crossJoin(F.broadcast(stats))
    bm25 = (
        F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    tfidf = F.col("tf") * F.log(F.col("n").cast("double") / F.col("df"))
    ranked = m.select(bm25.alias("bm25"), tfidf.alias("tfidf"), "doc_id").select(
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.desc("tfidf"), F.asc("doc_id")))
        .alias("r2"),
    )
    topk = ranked.filter(F.col("r1") <= 100).localCheckpoint(eager=True)
    a = topk.select(F.col("r1").alias("ar1"), F.col("r2").alias("ar2"))
    b = topk.select(F.col("r1").alias("br1"), F.col("r2").alias("br2"))
    pairs = a.join(F.broadcast(b), F.col("ar1") < F.col("br1")).agg(
        F.sum(F.when(F.col("ar2") < F.col("br2"), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(F.col("ar2") > F.col("br2"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    kk = topk.agg(F.count("*").cast("bigint").alias("k"))
    cz = F.coalesce(F.col("c"), F.lit(0))
    dz = F.coalesce(F.col("d"), F.lit(0))
    kd = F.col("k").cast("double")
    return pairs.crossJoin(F.broadcast(kk)).select(
        "k",
        cz.alias("concordant"),
        dz.alias("discordant"),
        F.when(
            F.col("k") >= 2,
            F.round((cz - dz).cast("double") / (kd * (kd - 1) / 2), 6),
        ).alias("kendall_tau"),
    )


@query(
    "gumbel_daily_max",
    """
    WITH daily AS (
      SELECT o_orderdate AS day,
             max(CAST(round(o_totalprice * 100) AS BIGINT)) AS mx
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(mx AS HUGEINT)) AS s1,
             sum(CAST(mx AS HUGEINT) * mx) AS s2,
             CAST(max(mx) AS BIGINT) AS grand_max
      FROM daily
    ),
    d AS (
      SELECT n, grand_max,
             n > 1 AND n * s2 - s1 * s1 > 0 AS ok,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
             CAST(n * s2 - s1 * s1 AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var
      FROM s
    ),
    p AS (
      SELECT n, grand_max, ok, mean,
             CASE WHEN ok THEN sqrt(6 * var) / 3.141592653589793 END
               AS beta
      FROM d
    )
    SELECT n AS n_days, grand_max AS max_cents,
           CASE WHEN ok THEN round(mean - 0.5772156649015329 * beta, 6)
           END AS mu_cents,
           CASE WHEN ok THEN round(beta, 6) END AS beta_cents,
           CASE WHEN ok THEN round(
             1 - exp(-exp(-(CAST(grand_max AS DOUBLE)
                            - (mean - 0.5772156649015329 * beta))
                          / beta)), 6)
           END AS p_next_day_exceeds_max
    FROM p
    """,
)
def gumbel_daily_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel (extreme-value type I) fit to the DAILY MAXIMUM order
    value by method of moments — the block-maxima member of the tail
    family (hill_tail_index fits the tail exponent of ALL values;
    Gumbel models the distribution of per-period RECORDS, which is
    what capacity limits and fraud ceilings are set against):
    β = √(6·Var)/π, μ = mean − γ·β, and the operational number
    P(tomorrow's max exceeds the all-time max) = 1 − exp(−exp(−(M−μ)/β)).

    Exactness: per-day maxima are exact integer cents (max of
    integers), their moments exact HUGEINT/DECIMAL(38,0) sums; μ, β
    and the exceedance probability are one layered double tree of
    those integers (population variance (nΣx²−S²)/n², γ and π as
    fixed literals), guarded by the exact-integer witnesses n > 1 and
    nΣx² − S² > 0 (one day, or identical maxima every day, fit
    nothing).

    Scale shape: one map-side-combinable max per day, one 1-row
    moment agg over the calendar-bounded day frame."""
    orders = load(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("mx")
    )
    s = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("mx").cast(d38)).alias("s1"),
        F.sum(F.col("mx").cast(d38) * F.col("mx")).alias("s2"),
        F.max("mx").cast("bigint").alias("grand_max"),
    )
    nd = F.col("n").cast("double")
    d = s.select(
        "n",
        "grand_max",
        (
            (F.col("n") > 1)
            & (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1") > 0)
        ).alias("ok"),
        (F.col("s1").cast("double") / nd).alias("mean"),
        (
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (nd * nd)
        ).alias("var"),
    )
    p = d.select(
        "n",
        "grand_max",
        "ok",
        "mean",
        F.when(
            F.col("ok"), F.sqrt(6 * F.col("var")) / F.lit(3.141592653589793)
        ).alias("beta"),
    )
    ok = F.col("ok")
    mu = F.col("mean") - 0.5772156649015329 * F.col("beta")
    pex = 1 - F.exp(
        -F.exp(-(F.col("grand_max").cast("double") - mu) / F.col("beta"))
    )
    return p.select(
        F.col("n").alias("n_days"),
        F.col("grand_max").alias("max_cents"),
        F.when(ok, F.round(mu, 6)).alias("mu_cents"),
        F.when(ok, F.round(F.col("beta"), 6)).alias("beta_cents"),
        F.when(ok, F.round(pex, 6)).alias("p_next_day_exceeds_max"),
    )


@query(
    "goodman_kruskal_lambda",
    """
    WITH o AS (
      SELECT event_type,
             (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    colmax AS (
      SELECT dow, CAST(max(obs) AS BIGINT) AS mx FROM o GROUP BY dow
    ),
    rowmarg AS (
      SELECT event_type, CAST(sum(obs) AS BIGINT) AS rt FROM o GROUP BY 1
    ),
    t AS (
      SELECT CAST((SELECT sum(obs) FROM o) AS BIGINT) AS n,
             CAST((SELECT sum(mx) FROM colmax) AS BIGINT) AS sum_colmax,
             CAST((SELECT max(rt) FROM rowmarg) AS BIGINT) AS max_row
    )
    SELECT n, sum_colmax, max_row,
           CASE WHEN n - max_row > 0
                THEN round(CAST(sum_colmax - max_row AS DOUBLE)
                           / CAST(n - max_row AS DOUBLE), 6)
           END AS lambda_type_given_dow
    FROM t
    """,
)
def goodman_kruskal_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman-Kruskal λ for predicting event type from day-of-week —
    the PROPORTIONAL-REDUCTION-IN-ERROR member that completes the
    categorical-association trio (cramers_v_type_dow is the χ²-based
    effect size, theils_u_type_dow the information-theoretic one; λ
    is the operational one: "guessing the modal type per weekday
    beats always guessing the global modal type by λ of the errors").
    λ = (Σ_dow max_type n_cells − max_type n_row) / (n − max_type
    n_row).

    Exactness: every term is an exact integer (cell counts, per-column
    maxima, the modal row margin — integer max/sum have no ordering
    sensitivity); λ is ONE double division, guarded by the exact
    compare n − max_row > 0 (a single-type corpus has no errors to
    reduce — λ undefined, NULL both engines). Day-of-week is the
    zone-free integer law (epoch_ms // day + 4) % 7 shared with
    cramers_v/theils_u.

    Scale shape: one map-side-combinable agg to the |types|×7 cell
    frame; maxima, margins and λ are arithmetic on that broadcast-
    sized frame."""
    ev = load(spark, sf_dir, "events")
    dow = ((ntz_epoch_ms(F.col("ts")) / F.lit(86400000)).cast("bigint") + 4) % 7
    o = ev.groupBy(F.col("event_type"), dow.alias("dow")).agg(
        F.count("*").cast("bigint").alias("obs")
    )
    colmax = o.groupBy("dow").agg(F.max("obs").cast("bigint").alias("mx"))
    rowmarg = o.groupBy("event_type").agg(
        F.sum("obs").cast("bigint").alias("rt")
    )
    t = (
        o.agg(F.sum("obs").cast("bigint").alias("n"))
        .crossJoin(
            F.broadcast(
                colmax.agg(F.sum("mx").cast("bigint").alias("sum_colmax"))
            )
        )
        .crossJoin(
            F.broadcast(rowmarg.agg(F.max("rt").cast("bigint").alias("max_row")))
        )
    )
    ok = F.col("n") - F.col("max_row") > 0
    return t.select(
        "n",
        "sum_colmax",
        "max_row",
        F.when(
            ok,
            F.round(
                (F.col("sum_colmax") - F.col("max_row")).cast("double")
                / (F.col("n") - F.col("max_row")).cast("double"),
                6,
            ),
        ).alias("lambda_type_given_dow"),
    )


@query(
    "yule_k_richness",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    f AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c
          FROM toks GROUP BY 1, 2)
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_vocab,
           CASE WHEN sum(c) > 0
                THEN round(10000.0
                           * CAST(sum(CAST(c AS HUGEINT) * c)
                                  - sum(c) AS DOUBLE)
                           / (CAST(sum(c) AS DOUBLE)
                              * CAST(sum(c) AS DOUBLE)), 6)
           END AS yule_k
    FROM f GROUP BY lang
    """,
)
def yule_k_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K lexical-repetitiveness characteristic per language —
    the length-invariant member of the vocabulary family (hapax rate
    and Chao1 move with corpus size; K = 10⁴(Σc² − N)/N² is a
    repeat-probability and stays put as the corpus grows, which makes
    it the right cross-language and cross-snapshot comparison knob:
    high K = repetitive/templated text, low K = rich prose).

    Exactness: the frequency spectrum identity Σm²V(m) = Σ_types c²
    means K needs only per-type counts — Σc and Σc² are exact
    integers (Σc² on HUGEINT/DECIMAL(38,0)); K is ONE double division
    behind the exact N > 0 witness. Same ' '-split token law as the
    hapax/coverage/fertility family.

    Scale shape: one (lang, token) count agg off the tokenize
    explode, one map-side-combinable rollup per language."""
    docs = load(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    f = (
        docs.select("lang", F.explode(words(F.col("text"))).alias("t"))
        .groupBy("lang", "t")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    agg = f.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_vocab"),
        F.sum(F.col("c").cast(d38) * F.col("c")).alias("s2"),
    )
    nd = F.col("n_tokens").cast("double")
    return agg.select(
        "lang",
        "n_tokens",
        "n_vocab",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.lit(10000.0)
                * (F.col("s2") - F.col("n_tokens")).cast("double")
                / (nd * nd),
                6,
            ),
        ).alias("yule_k"),
    )


@query(
    "feature_correlation_matrix",
    """
    WITH li AS (
      SELECT l_orderkey,
             CAST(count(*) AS BIGINT) AS x1,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x2
      FROM lineitem GROUP BY 1
    ),
    j AS (
      SELECT li.x1, li.x2,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS y
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    ),
    m AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST(x1 AS HUGEINT)) AS sx1,
             sum(CAST(x2 AS HUGEINT)) AS sx2,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(x1 AS HUGEINT) * x1) AS s11,
             sum(CAST(x2 AS HUGEINT) * x2) AS s22,
             sum(CAST(x1 AS HUGEINT) * x2) AS s12,
             sum(CAST(x1 AS HUGEINT) * y) AS s1y,
             sum(CAST(x2 AS HUGEINT) * y) AS s2y,
             sum(CAST(y AS HUGEINT) * y) AS syy
      FROM j
    )
    SELECT 'price~lines' AS pair, CAST(n AS BIGINT) AS n,
           CASE WHEN n * syy - sy * sy > 0 AND n * s11 - sx1 * sx1 > 0
                THEN round(CAST(n * s1y - sx1 * sy AS DOUBLE)
                           / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                                  * CAST(n * s11 - sx1 * sx1 AS DOUBLE)), 6)
           END AS r
    FROM m
    UNION ALL
    SELECT 'price~qty', CAST(n AS BIGINT),
           CASE WHEN n * syy - sy * sy > 0 AND n * s22 - sx2 * sx2 > 0
                THEN round(CAST(n * s2y - sx2 * sy AS DOUBLE)
                           / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                                  * CAST(n * s22 - sx2 * sx2 AS DOUBLE)), 6)
           END
    FROM m
    UNION ALL
    SELECT 'lines~qty', CAST(n AS BIGINT),
           CASE WHEN n * s11 - sx1 * sx1 > 0 AND n * s22 - sx2 * sx2 > 0
                THEN round(CAST(n * s12 - sx1 * sx2 AS DOUBLE)
                           / sqrt(CAST(n * s11 - sx1 * sx1 AS DOUBLE)
                                  * CAST(n * s22 - sx2 * sx2 AS DOUBLE)), 6)
           END
    FROM m
    """,
)
def feature_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pairwise Pearson correlation matrix of the order
    feature triple (total price, lineitem count, total quantity) from
    ONE pass — the collinearity screen that belongs in front of
    ols_two_factor (two highly-correlated regressors make its Cramer
    determinant nearly singular and the coefficients meaningless;
    this is the number that says so beforehand), generalizing
    part_price_size_correlation's single pair to the matrix every
    feature-selection step wants.

    Exactness: the same nine exact integer moment sums as
    ols_two_factor (products on HUGEINT/DECIMAL(38,0) before
    summing); each r = (nΣab−ΣaΣb)/√((nΣa²−(Σa)²)(nΣb²−(Σb)²)) is
    one double tree per pair behind BOTH exact-integer variance
    witnesses (a constant feature yields NULL for its pairs, never
    0/0).

    Scale shape: one lineitem rollup + one order join feed a single
    map-side-combinable 10-scalar agg; the matrix is a 3-row constant
    fold of that 1-row frame."""
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    li = lineitem.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("x1"),
        F.sum(F.round(F.col("l_quantity")).cast("bigint"))
        .cast("bigint")
        .alias("x2"),
    )
    j = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "x1",
        "x2",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    c38 = lambda c: F.col(c).cast(d38)
    m = j.agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(c38("x1")).alias("sx1"),
        F.sum(c38("x2")).alias("sx2"),
        F.sum(c38("y")).alias("sy"),
        F.sum(c38("x1") * F.col("x1")).alias("s11"),
        F.sum(c38("x2") * F.col("x2")).alias("s22"),
        F.sum(c38("x1") * F.col("x2")).alias("s12"),
        F.sum(c38("x1") * F.col("y")).alias("s1y"),
        F.sum(c38("x2") * F.col("y")).alias("s2y"),
        F.sum(c38("y") * F.col("y")).alias("syy"),
    ).localCheckpoint(eager=True)

    def pearson_row(label, sab, sa, sb, saa, sbb):
        n = F.col("n")
        va = n * F.col(saa) - F.col(sa) * F.col(sa)
        vb = n * F.col(sbb) - F.col(sb) * F.col(sb)
        cov = n * F.col(sab) - F.col(sa) * F.col(sb)
        return m.select(
            F.lit(label).alias("pair"),
            F.col("n").cast("bigint").alias("n"),
            F.when(
                (va > 0) & (vb > 0),
                F.round(
                    cov.cast("double")
                    / F.sqrt(va.cast("double") * vb.cast("double")),
                    6,
                ),
            ).alias("r"),
        )

    return (
        pearson_row("price~lines", "s1y", "sx1", "sy", "s11", "syy")
        .unionByName(
            pearson_row("price~qty", "s2y", "sx2", "sy", "s22", "syy")
        )
        .unionByName(
            pearson_row("lines~qty", "s12", "sx1", "sx2", "s11", "s22")
        )
    )


@query(
    "hurst_exponent",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    t AS (
      SELECT y, CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
      FROM daily
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
    lsd AS (
      SELECT DISTINCT nn.n // denom AS l
      FROM (SELECT unnest([16, 8, 4, 2]) AS denom) CROSS JOIN nn
      WHERE nn.n // denom >= 4
    ),
    seg AS (
      SELECT lsd.l, t.t // lsd.l AS seg, t.t, t.y
      FROM t CROSS JOIN lsd CROSS JOIN nn
      WHERE t.t // lsd.l < nn.n // lsd.l
    ),
    segsum AS (
      SELECT l, seg, CAST(sum(y) AS BIGINT) AS s,
             CAST(sum(y * y) AS BIGINT) AS s2
      FROM seg GROUP BY 1, 2
    ),
    z AS (
      SELECT seg.l, seg.seg,
             CAST(sum(seg.l * seg.y - ss.s) OVER (
               PARTITION BY seg.l, seg.seg ORDER BY seg.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS zk
      FROM seg JOIN segsum ss USING (l, seg)
    ),
    rs AS (
      SELECT l, seg, CAST(max(zk) - min(zk) AS BIGINT) AS zrange
      FROM z GROUP BY 1, 2
    ),
    lnrs AS (
      SELECT rs.l, rs.seg,
             CASE WHEN ss.l * ss.s2 - ss.s * ss.s > 0 AND rs.zrange > 0
                  THEN ln(CAST(rs.zrange AS DOUBLE)
                          / sqrt(CAST(ss.l * ss.s2 - ss.s * ss.s
                                      AS DOUBLE)))
             END AS v
      FROM rs JOIN segsum ss USING (l, seg)
    ),
    pl_f AS (
      SELECT l,
             sum(v) OVER (PARTITION BY l ORDER BY seg
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc,
             count(v) OVER (PARTITION BY l ORDER BY seg
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnt,
             row_number() OVER (PARTITION BY l ORDER BY seg DESC) AS rn
      FROM lnrs
    ),
    pts AS (
      SELECT l, ln(CAST(l AS DOUBLE)) AS x, acc / cnt AS yv
      FROM pl_f WHERE rn = 1 AND cnt > 0
    ),
    fold AS (
      SELECT count(*) OVER w AS m,
             sum(x) OVER w AS sx, sum(yv) OVER w AS sy,
             sum(x * yv) OVER w AS sxy, sum(x * x) OVER w AS sxx,
             row_number() OVER (ORDER BY l DESC) AS rn
      FROM pts
      WINDOW w AS (ORDER BY l
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT nn.n AS n_days, fold.m AS n_scales,
           CASE WHEN fold.m >= 2
                THEN round((fold.m * fold.sxy - fold.sx * fold.sy)
                           / (fold.m * fold.sxx - fold.sx * fold.sx), 6)
           END AS hurst,
           CASE WHEN fold.m >= 2
                THEN (fold.m * fold.sxy - fold.sx * fold.sy)
                     / (fold.m * fold.sxx - fold.sx * fold.sx) > 0.5
           END AS persistent
    FROM fold CROSS JOIN nn WHERE fold.rn = 1
    """,
)
def hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily order volume by classic rescaled-range
    (R/S) analysis over four block sizes (n/16, n/8, n/4, n/2) — the
    long-range-dependence member of the time-series family
    (autocorr_lag1 sees one step, ljung_box seven; H answers whether
    deviations COMPOUND across months: H > 0.5 persistent trends,
    H < 0.5 mean-reverting, and H ≈ 1 is the self-similar burstiness
    word_burstiness measures per term): H = OLS slope of
    mean ln(R/S) on ln(block size).

    Exactness: within a block everything is scaled-integer — the
    cumulative deviation Z_k = Σ(L·y − Σy) is an exact integer
    window, R = max Z − min Z and the variance witness L·Σy² − (Σy)²
    are exact integers — so ln(R/S) = ln(R/√V) is one double tree per
    block; per-scale means and the 4-point OLS slope fold as ORDERED
    cumulative windows (the canonical-float-order discipline). Flat
    blocks (V = 0 or R = 0, undefined ln) are excluded by exact
    integer witnesses ON BOTH SIDES — the mean is over defined blocks
    only; scales shorter than 4 days are dropped, and H needs ≥ 2
    distinct scale points (distinct ln L makes the OLS denominator
    strictly positive — no division guard needed beyond m ≥ 2).

    Scale shape: one agg to the calendar-bounded day frame; blocks
    explode that frame ×4 (still calendar-bounded); per-block windows
    partition by (scale, block) — no corpus-sized shuffle beyond the
    daily rollup's."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    t = daily.select(
        "y",
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("bigint")
        .alias("t"),
    ).localCheckpoint(eager=True)
    nn = t.agg(F.count("*").cast("bigint").alias("n"))
    lsd = (
        spark.createDataFrame([(16,), (8,), (4,), (2,)], "denom int")
        .crossJoin(F.broadcast(nn))
        .select(F.expr("n div denom").alias("l"))
        .filter(F.col("l") >= 4)
        .distinct()
    )
    seg = (
        t.crossJoin(F.broadcast(lsd))
        .crossJoin(F.broadcast(nn))
        .filter(F.expr("t div l") < F.expr("n div l"))
        .select("l", F.expr("t div l").alias("seg"), "t", "y")
    )
    segsum = seg.groupBy("l", "seg").agg(
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("s2"),
    )
    w_z = (
        Window.partitionBy("l", "seg")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    z = seg.join(segsum, ["l", "seg"]).select(
        "l",
        "seg",
        F.sum(F.col("l") * F.col("y") - F.col("s"))
        .over(w_z)
        .cast("bigint")
        .alias("zk"),
    )
    rs = z.groupBy("l", "seg").agg(
        (F.max("zk") - F.min("zk")).cast("bigint").alias("zrange")
    )
    vwit = F.col("l") * F.col("s2") - F.col("s") * F.col("s")
    lnrs = rs.join(segsum, ["l", "seg"]).select(
        "l",
        "seg",
        F.when(
            (vwit > 0) & (F.col("zrange") > 0),
            F.log(F.col("zrange").cast("double") / F.sqrt(vwit.cast("double"))),
        ).alias("v"),
    )
    w_pl = (
        Window.partitionBy("l")
        .orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pl_f = lnrs.select(
        "l",
        F.sum("v").over(w_pl).alias("acc"),
        F.count("v").over(w_pl).alias("cnt"),
        F.row_number()
        .over(Window.partitionBy("l").orderBy(F.desc("seg")))
        .alias("rn"),
    ).filter((F.col("rn") == 1) & (F.col("cnt") > 0))
    pts = pl_f.select(
        "l",
        F.log(F.col("l").cast("double")).alias("x"),
        (F.col("acc") / F.col("cnt")).alias("yv"),
    )
    w_fold = Window.orderBy("l").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fold = pts.select(
        F.count("*").over(w_fold).alias("m"),
        F.sum("x").over(w_fold).alias("sx"),
        F.sum("yv").over(w_fold).alias("sy"),
        F.sum(F.col("x") * F.col("yv")).over(w_fold).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w_fold).alias("sxx"),
        F.row_number().over(Window.orderBy(F.desc("l"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return fold.crossJoin(F.broadcast(nn)).select(
        F.col("n").alias("n_days"),
        F.col("m").alias("n_scales"),
        F.when(F.col("m") >= 2, F.round(slope, 6)).alias("hurst"),
        F.when(F.col("m") >= 2, slope > 0.5).alias("persistent"),
    )


@query(
    "markov_entropy_rate",
    f"""
    WITH pi AS (
      SELECT state, pi_scaled FROM ({_markov_stationary_sql()})
    ),
    o2 AS (
      SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs2 AS (
      SELECT event_type AS src, nxt AS dst, CAST(count(*) AS BIGINT) AS n
      FROM o2 WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    ent AS (
      SELECT src,
             log2(CAST(sum(n) AS DOUBLE))
               - sum(n * log2(CAST(n AS DOUBLE)))
                 / CAST(sum(n) AS DOUBLE) AS h
      FROM pairs2 GROUP BY src
    ),
    terms AS (
      SELECT pi.state,
             CAST(pi.pi_scaled AS DOUBLE) / 1000000000000.0
               * coalesce(ent.h, 0.0) AS term
      FROM pi LEFT JOIN ent ON ent.src = pi.state
    ),
    fold AS (
      SELECT sum(term) OVER (ORDER BY state
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc,
             count(*) OVER (ORDER BY state
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m,
             row_number() OVER (ORDER BY state DESC) AS rn
      FROM terms
    )
    SELECT m AS n_states, round(acc, 6) AS entropy_rate_bits
    FROM fold WHERE rn = 1
    """,
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the user-behaviour Markov chain —
    H = Σ_s π_s·H(next|s) bits per step, the stationary-weighted
    average of transition_entropy's per-state numbers: the single
    compressibility/predictability scalar for the whole behaviour
    stream (how many bits a next-action predictor must emit per
    event, weighted by where users actually spend time — composing
    E69's π with the conditional entropies instead of letting hot
    states with chaotic exits hide behind cold deterministic ones).

    Exactness: π comes from the scaled-integer power iteration
    (markov_stationary_power's oracle embedded verbatim — zero
    drift); per-state H uses the aggregation-friendly identity
    log₂T − Σ n·log₂n / T over exact integer pair counts
    (transition_entropy's discipline, ≤|states| float terms);
    the cross-state Σ π_s·H_s folds as an ORDERED cumulative window
    over the state frame. Successor-free states carry H = 0 (the
    self-loop convention their π already assumes — absorbing means
    perfectly predictable).

    Scale shape: one per-user lead window is the only event-sized
    shuffle (shared shape with E69/transition_entropy); everything
    downstream lives on |states|-bounded frames."""
    ev = load(spark, sf_dir, "events")
    pi = markov_stationary_power(spark, sf_dir).select("state", "pi_scaled")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = o.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count("*").cast("bigint").alias("n"))
    t = F.sum("n")
    ent = pairs.groupBy("src").agg(
        (
            F.log2(t.cast("double"))
            - F.sum(F.col("n") * F.log2(F.col("n").cast("double")))
            / t.cast("double")
        ).alias("h")
    )
    terms = pi.join(ent, pi.state == ent.src, "left").select(
        "state",
        (
            F.col("pi_scaled").cast("double") / F.lit(1000000000000.0)
            * F.coalesce(F.col("h"), F.lit(0.0))
        ).alias("term"),
    )
    w_cum = Window.orderBy("state").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fold = terms.select(
        F.sum("term").over(w_cum).alias("acc"),
        F.count("*").over(w_cum).alias("m"),
        F.row_number().over(Window.orderBy(F.desc("state"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    return fold.select(
        F.col("m").alias("n_states"),
        F.round(F.col("acc"), 6).alias("entropy_rate_bits"),
    )


@query(
    "embedding_anisotropy",
    """
    WITH ranked AS (
      SELECT vec_id, embedding,
             row_number() OVER (ORDER BY vec_id) AS rn
      FROM embeddings
    ),
    lim AS (SELECT * FROM ranked WHERE rn <= 512),
    pairs AS (
      SELECT (a.rn - 1) // 2 AS p,
             round(list_cosine_similarity(a.embedding, b.embedding), 6)
               AS cos
      FROM lim a JOIN lim b ON b.rn = a.rn + 1 AND a.rn % 2 = 1
    ),
    fold AS (
      SELECT sum(cos) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc,
             count(*) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m,
             row_number() OVER (ORDER BY p DESC) AS rn
      FROM pairs
    )
    SELECT CAST(m AS BIGINT) AS n_pairs,
           round(acc / m, 6) AS mean_cosine,
           acc / m > 0.01 AS anisotropic
    FROM fold WHERE rn = 1
    """,
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy probe of the embedding space: mean cosine between
    256 deterministic disjoint vector pairs (consecutive by vec_id) —
    the 'narrow cone' diagnostic (Ethayarajh-style): isotropic
    embeddings average ≈ 0 cosine between unrelated pairs; a clearly
    positive mean says cosine scores are inflated corpus-wide and the
    ANN family's absolute thresholds (dedup_embedding_cosine's cut,
    IVF cell margins) need recalibrating against this baseline.

    Exactness: cosines ride the shared expression pair (functions/
    vector.cosine vs list_cosine_similarity — the ann family's pinned
    equivalence), each rounded to 6 dp BEFORE the mean so a sub-ulp
    engine divergence is quenched per pair (a worst-case flip moves
    the 256-pair mean by ~4e-9, invisible at the rounded output); the
    mean folds as an ORDERED cumulative window over the pair frame.

    Scale shape: the probe frame is top-512-by-id
    (TakeOrderedAndProject — k rows cross the wire at any corpus
    size), pairs join rank k to k+1, everything downstream is a
    256-row fold. A corpus-wide mean would be an unordered float
    aggregation — deliberately not offered; widen by raising the
    probe size, not by unbounding it."""
    emb = load(spark, sf_dir, "embeddings")
    ranked = emb.select(
        "vec_id",
        "embedding",
        F.row_number().over(Window.orderBy("vec_id")).alias("rn"),
    ).filter(F.col("rn") <= 512)
    a = ranked.filter(F.col("rn") % 2 == 1).select(
        ((F.col("rn") - 1) / 2).cast("bigint").alias("p"),
        F.col("rn").alias("arn"),
        F.col("embedding").alias("ea"),
    )
    b = ranked.select(F.col("rn").alias("brn"), F.col("embedding").alias("eb"))
    pairs = a.join(b, a.arn + 1 == b.brn).select(
        "p", F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos")
    )
    w_cum = Window.orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fold = pairs.select(
        F.sum("cos").over(w_cum).alias("acc"),
        F.count("*").over(w_cum).alias("m"),
        F.row_number().over(Window.orderBy(F.desc("p"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    return fold.select(
        F.col("m").cast("bigint").alias("n_pairs"),
        F.round(F.col("acc") / F.col("m"), 6).alias("mean_cosine"),
        (F.col("acc") / F.col("m") > 0.01).alias("anisotropic"),
    )


@query(
    "bloom_fpp_audit",
    """
    WITH members AS (SELECT doc_id AS x FROM documents),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM members),
    mpos AS (
      SELECT DISTINCT pos FROM (
        SELECT CAST(('0x' || substr(md5(x::VARCHAR || '|' || k::VARCHAR),
                     1, 15))::BIGINT % 65536 AS BIGINT) AS pos
        FROM members CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
      )
    ),
    nbits AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM mpos),
    probes AS (
      SELECT doc_id + 1000000007 AS x FROM documents
    ),
    ppos AS (
      SELECT x,
             CAST(('0x' || substr(md5(x::VARCHAR || '|' || k::VARCHAR),
                   1, 15))::BIGINT % 65536 AS BIGINT) AS pos,
             k
      FROM probes CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
    ),
    hits AS (
      SELECT p.x, CAST(count(*) AS BIGINT) AS nhit
      FROM (SELECT DISTINCT x, pos FROM ppos) p
      JOIN mpos USING (pos)
      GROUP BY p.x
    ),
    kdist AS (
      SELECT x, CAST(count(DISTINCT pos) AS BIGINT) AS kx FROM ppos
      GROUP BY x
    ),
    fp AS (
      SELECT CAST(sum(CASE WHEN h.nhit = kd.kx THEN 1 ELSE 0 END)
             AS BIGINT) AS n_fp
      FROM kdist kd LEFT JOIN hits h USING (x)
    )
    SELECT nn.n AS n_members, nbits.bits_set,
           coalesce(fp.n_fp, 0) AS observed_fp,
           CASE WHEN nn.n > 0
                THEN round(CAST(coalesce(fp.n_fp, 0) AS DOUBLE)
                           / CAST(nn.n AS DOUBLE), 6)
           END AS observed_rate,
           CASE WHEN nn.n > 0
                THEN round(
                  (1 - exp(-4.0 * CAST(nn.n AS DOUBLE) / 65536.0))
                  * (1 - exp(-4.0 * CAST(nn.n AS DOUBLE) / 65536.0))
                  * (1 - exp(-4.0 * CAST(nn.n AS DOUBLE) / 65536.0))
                  * (1 - exp(-4.0 * CAST(nn.n AS DOUBLE) / 65536.0)), 6)
           END AS expected_rate
    FROM nn CROSS JOIN nbits CROSS JOIN fp
    """,
)
def bloom_fpp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-filter false-positive law itself under the oracle
    gate: build an m=65536-bit, k=4 filter over the doc_id member set
    with portable md5 position hashing, probe it with a disjoint
    non-member set, and compare the OBSERVED false-positive rate to
    the textbook (1−e^{−kn/m})^k — the engine-health row that
    certifies, in data, the fpp budget operators/bloom.py's seen-set
    pre-filter promises the crawl (same family as
    hash_uniformity_audit: the audit of an assumption every sketch
    rides).

    Exactness: the filter is a DISTINCT position set and a probe is a
    false positive iff ALL its distinct positions (kx ≤ 4 — two probe
    hashes can collide, counted once on both sides) hit — semi-join +
    exact integer counts end-to-end; only the expected-rate formula
    is floating point (one identical exp tree). Guarded on n > 0.

    Scale shape: positions are bounded by m = 65536 (broadcast side);
    member/probe hashing is one codegen'd md5 pass each; the hit join
    is probe-positions ⋈ broadcast bit-set. At 10^10 members raise m
    with the same plan (the bit-set side stays the small one)."""
    docs = load(spark, sf_dir, "documents")
    ks = spark.createDataFrame([(0,), (1,), (2,), (3,)], "k int")

    def pos(xcol):
        return F.conv(
            F.substring(
                F.md5(F.concat(xcol.cast("string"), F.lit("|"), F.col("k").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint") % 65536

    members = docs.select(F.col("doc_id").alias("x"))
    nn = members.agg(F.count("*").cast("bigint").alias("n"))
    mpos = (
        members.crossJoin(F.broadcast(ks))
        .select(pos(F.col("x")).alias("pos"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbits = mpos.agg(F.count("*").cast("bigint").alias("bits_set"))
    ppos = (
        docs.select((F.col("doc_id") + 1000000007).alias("x"))
        .crossJoin(F.broadcast(ks))
        .select("x", pos(F.col("x")).alias("pos"))
    )
    pdist = ppos.distinct()
    hits = (
        pdist.join(F.broadcast(mpos), "pos")
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("nhit"))
    )
    kdist = pdist.groupBy("x").agg(
        F.count("*").cast("bigint").alias("kx")
    )
    fp = kdist.join(hits, "x", "left").agg(
        F.sum(F.when(F.col("nhit") == F.col("kx"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_fp")
    )
    nd = F.col("n").cast("double")
    one_bit = 1 - F.exp(F.lit(-4.0) * nd / F.lit(65536.0))
    fpz = F.coalesce(F.col("n_fp"), F.lit(0))
    return (
        nn.crossJoin(F.broadcast(nbits))
        .crossJoin(F.broadcast(fp))
        .select(
            F.col("n").alias("n_members"),
            "bits_set",
            fpz.alias("observed_fp"),
            F.when(
                F.col("n") > 0, F.round(fpz.cast("double") / nd, 6)
            ).alias("observed_rate"),
            F.when(
                F.col("n") > 0,
                F.round(one_bit * one_bit * one_bit * one_bit, 6),
            ).alias("expected_rate"),
        )
    )


@query(
    "hash_collision_audit",
    """
    WITH h AS (
      SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hv
      FROM documents
    ),
    g AS (SELECT hv, CAST(count(*) AS BIGINT) AS c FROM h GROUP BY hv),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c * (c - 1) // 2) AS BIGINT) AS colliding_pairs
      FROM g
    )
    SELECT n, n_distinct, colliding_pairs,
           round(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)
                 / 2305843009213693952.0 / 2, 6) AS expected_pairs,
           colliding_pairs = 0 AS unique_keyspace
    FROM s
    """,
)
def hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Birthday-bound audit of the 60-bit md5_long key — the
    assumption the dedup/claim/bucket machinery rides silently (a
    colliding key silently MERGES two distinct documents in every
    hash-keyed dedup and seen-set path): exact observed colliding
    pairs Σ c(c−1)/2 from one groupBy against the birthday
    expectation n(n−1)/2^61, plus the unique_keyspace flag the
    pipeline wants to see TRUE. Sister row to hash_uniformity_audit
    (uniformity says buckets balance; this says identities don't
    merge).

    Exactness: collision counts are exact integers off one hash agg;
    the expectation is one double tree (2^61 literal). At n = 10^9
    the expectation is ~0.2 — this audit stays meaningful exactly
    until the corpus outgrows the key, which is the point.

    Scale shape: one map-side-combinable count per hash value, one
    1-row rollup."""
    docs = load(spark, sf_dir, "documents")
    g = docs.select(
        md5_long(F.col("doc_id").cast("string")).alias("hv")
    ).groupBy("hv").agg(F.count("*").cast("bigint").alias("c"))
    s = g.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("bigint").alias(
            "colliding_pairs"
        ),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        "n_distinct",
        "colliding_pairs",
        F.round(
            nd * (nd - 1) / F.lit(2305843009213693952.0) / 2, 6
        ).alias("expected_pairs"),
        (F.col("colliding_pairs") == 0).alias("unique_keyspace"),
    )


@query(
    "degree_powerlaw_mle",
    f"""
    WITH {_PAGELINKS_SQL_CTES},
    deg AS (
      SELECT dst, CAST(count(*) AS BIGINT) AS d
      FROM links GROUP BY dst
    ),
    elig AS (SELECT d FROM deg WHERE d >= 2),
    fold AS (
      SELECT CAST(count(*) OVER w AS BIGINT) AS m,
             sum(ln(CAST(d AS DOUBLE) / 1.5)) OVER w AS slog,
             row_number() OVER (ORDER BY d DESC, rowid DESC) AS rn
      FROM (SELECT d, row_number() OVER (ORDER BY d) AS rowid FROM elig)
      WINDOW w AS (ORDER BY d, rowid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT m AS n_tail, round(slog, 6) AS sum_log,
           CASE WHEN m > 0 AND slog > 0
                THEN round(1 + CAST(m AS DOUBLE) / slog, 6)
           END AS alpha_hat
    FROM fold WHERE rn = 1
    """,
)
def degree_powerlaw_mle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law (Pareto) MLE for the page IN-degree tail —
    the graph-side member of the heavy-tail triangle (zipf_slope fits
    words, hill_tail_index fits order values; this fits the degree
    distribution every hub/authority and crawl-prioritization
    assumption rests on): α̂ = 1 + m / Σ ln(d / (dmin − ½)) over
    degrees d ≥ dmin = 2 (the Clauset-Shalizi-Newman continuity
    correction, dmin − ½ = 1.5 as a shared literal). α ≤ 2 means the
    mean degree is tail-dominated and uniform host budgets are wrong
    by construction.

    Exactness: degrees are exact integers off one edge agg; the
    Σ ln(d/1.5) folds as an ORDERED cumulative window over the
    eligible-degree frame (deterministic (d, rowid) order on both
    sides); α̂ is one double division behind the guards m > 0 (empty
    tail) and Σ > 0 — the latter can never trip on a nonempty tail
    (every term is ≥ ln(2/1.5) > 0) and exists only so the division
    is structurally unreachable without a defined denominator.

    Scale shape: one in-degree agg over the edge list (the shuffle
    every degree query pays); the fold runs over eligible-degree ROWS
    (tail-sized here). At 10^10 edges collapse equal degrees to
    (d, count) weights first — the same estimator as a
    |distinct d|-row fold."""
    docs = load(spark, sf_dir, "documents")
    links = _pagelinks(docs)
    deg = links.groupBy("dst").agg(F.count("*").cast("bigint").alias("d"))
    elig = deg.filter(F.col("d") >= 2).select(
        "d", F.row_number().over(Window.orderBy("d")).alias("rowid")
    )
    w_cum = Window.orderBy("d", "rowid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fold = elig.select(
        F.count("*").over(w_cum).cast("bigint").alias("m"),
        F.sum(F.log(F.col("d").cast("double") / F.lit(1.5)))
        .over(w_cum)
        .alias("slog"),
        F.row_number()
        .over(Window.orderBy(F.desc("d"), F.desc("rowid")))
        .alias("rn"),
    ).filter(F.col("rn") == 1)
    return fold.select(
        F.col("m").alias("n_tail"),
        F.round(F.col("slog"), 6).alias("sum_log"),
        F.when(
            (F.col("m") > 0) & (F.col("slog") > 0),
            F.round(1 + F.col("m").cast("double") / F.col("slog"), 6),
        ).alias("alpha_hat"),
    )


_SIMHASH_SQL_CTES = """w AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    wh AS (
      SELECT doc_id, word, count(*) AS cnt,
             ('0x' || substr(md5(word), 1, 15))::BIGINT AS h
      FROM w GROUP BY doc_id, word
    ),
    sums AS (
      SELECT doc_id,
             sum(CASE WHEN (h >> 0) & 1 = 1 THEN cnt ELSE -cnt END) AS b0,
             sum(CASE WHEN (h >> 1) & 1 = 1 THEN cnt ELSE -cnt END) AS b1,
             sum(CASE WHEN (h >> 2) & 1 = 1 THEN cnt ELSE -cnt END) AS b2,
             sum(CASE WHEN (h >> 3) & 1 = 1 THEN cnt ELSE -cnt END) AS b3,
             sum(CASE WHEN (h >> 4) & 1 = 1 THEN cnt ELSE -cnt END) AS b4,
             sum(CASE WHEN (h >> 5) & 1 = 1 THEN cnt ELSE -cnt END) AS b5,
             sum(CASE WHEN (h >> 6) & 1 = 1 THEN cnt ELSE -cnt END) AS b6,
             sum(CASE WHEN (h >> 7) & 1 = 1 THEN cnt ELSE -cnt END) AS b7,
             sum(CASE WHEN (h >> 8) & 1 = 1 THEN cnt ELSE -cnt END) AS b8,
             sum(CASE WHEN (h >> 9) & 1 = 1 THEN cnt ELSE -cnt END) AS b9,
             sum(CASE WHEN (h >> 10) & 1 = 1 THEN cnt ELSE -cnt END) AS b10,
             sum(CASE WHEN (h >> 11) & 1 = 1 THEN cnt ELSE -cnt END) AS b11,
             sum(CASE WHEN (h >> 12) & 1 = 1 THEN cnt ELSE -cnt END) AS b12,
             sum(CASE WHEN (h >> 13) & 1 = 1 THEN cnt ELSE -cnt END) AS b13,
             sum(CASE WHEN (h >> 14) & 1 = 1 THEN cnt ELSE -cnt END) AS b14,
             sum(CASE WHEN (h >> 15) & 1 = 1 THEN cnt ELSE -cnt END) AS b15
      FROM wh GROUP BY doc_id
    ),
    sh AS (
      SELECT doc_id,
             CAST(CASE WHEN b0 > 0 THEN 1 ELSE 0 END
                + CASE WHEN b1 > 0 THEN 2 ELSE 0 END
                + CASE WHEN b2 > 0 THEN 4 ELSE 0 END
                + CASE WHEN b3 > 0 THEN 8 ELSE 0 END
                + CASE WHEN b4 > 0 THEN 16 ELSE 0 END
                + CASE WHEN b5 > 0 THEN 32 ELSE 0 END
                + CASE WHEN b6 > 0 THEN 64 ELSE 0 END
                + CASE WHEN b7 > 0 THEN 128 ELSE 0 END
                + CASE WHEN b8 > 0 THEN 256 ELSE 0 END
                + CASE WHEN b9 > 0 THEN 512 ELSE 0 END
                + CASE WHEN b10 > 0 THEN 1024 ELSE 0 END
                + CASE WHEN b11 > 0 THEN 2048 ELSE 0 END
                + CASE WHEN b12 > 0 THEN 4096 ELSE 0 END
                + CASE WHEN b13 > 0 THEN 8192 ELSE 0 END
                + CASE WHEN b14 > 0 THEN 16384 ELSE 0 END
                + CASE WHEN b15 > 0 THEN 32768 ELSE 0 END AS BIGINT)
               AS simhash
      FROM sums
    )"""


@query(
    "simhash_precision",
    f"""
    WITH {_SIMHASH_SQL_CTES},
    bands AS (
      SELECT doc_id, simhash, band,
             (simhash >> (band * 4)) & 15 AS key
      FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sa, b.simhash AS sb
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    ham AS (
      SELECT doc_a, doc_b,
             CAST((xor(sa, sb) >> 0) & 1 AS BIGINT)
             + ((xor(sa, sb) >> 1) & 1) + ((xor(sa, sb) >> 2) & 1)
             + ((xor(sa, sb) >> 3) & 1) + ((xor(sa, sb) >> 4) & 1)
             + ((xor(sa, sb) >> 5) & 1) + ((xor(sa, sb) >> 6) & 1)
             + ((xor(sa, sb) >> 7) & 1) + ((xor(sa, sb) >> 8) & 1)
             + ((xor(sa, sb) >> 9) & 1) + ((xor(sa, sb) >> 10) & 1)
             + ((xor(sa, sb) >> 11) & 1) + ((xor(sa, sb) >> 12) & 1)
             + ((xor(sa, sb) >> 13) & 1) + ((xor(sa, sb) >> 14) & 1)
             + ((xor(sa, sb) >> 15) & 1) AS hd
      FROM cand
    ),
    close AS (SELECT doc_a, doc_b FROM ham WHERE hd <= 3),
    dsize AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM wh GROUP BY 1
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS i
      FROM close c
      JOIN wh a ON a.doc_id = c.doc_a
      JOIN wh b ON b.doc_id = c.doc_b AND b.word = a.word
      GROUP BY 1, 2
    ),
    v AS (
      SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS inter,
             sa.sz + sb.sz - coalesce(i.i, 0) AS uni
      FROM close c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN dsize sa ON sa.doc_id = c.doc_a
      JOIN dsize sb ON sb.doc_id = c.doc_b
    ),
    s AS (
      SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
             CAST(count(*) AS BIGINT) AS n_close,
             CAST(sum(CASE WHEN 5 * inter >= uni THEN 1 ELSE 0 END)
               AS BIGINT) AS n_verified
      FROM v
    )
    SELECT n_candidates, n_close, coalesce(n_verified, 0) AS n_verified,
           CASE WHEN n_close > 0
                THEN coalesce(n_verified, 0) * 1000 // n_close
           END AS precision_permille
    FROM s
    """,
)
def simhash_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRECISION of the SimHash near-dup tier — the D10 tuning number
    (lsh_candidate_precision) pointed at the OTHER sketch:
    pigeonhole-block candidates (4 bands of 4 bits; Hamming ≤ 3 over
    16 bits forces ≥ 1 identical band, so the band join provably
    recalls every close pair — never all-pairs), exact XOR-popcount
    Hamming cut, then exact word-set Jaccard ≥ 0.2 as the truth gate
    (5·|∩| ≥ |∪| cross-multiplied — no division). A precision
    collapse here means 16 bits is too few for this corpus and the
    Spark-side 64-bit widening dedup_simhash's docstring promises is
    due.

    Exactness: everything is integer — bit sums, packed hashes, band
    keys, Hamming, set sizes, the floored permille; Jaccard's union
    comes from |A| + |B| − |∩| (per-doc distinct-word sizes), so no
    per-pair full join materializes.

    Scale shape: one tokenize agg (shared with dedup_simhash), a
    16-row-per-doc band explode, per-band self-join bounded by bucket
    sizes (16 values per band key), and a verify join bounded by the
    CLOSE pair count — the LSH-then-verify discipline end to end."""
    docs = load(spark, sf_dir, "documents")
    wh = (
        docs.select("doc_id", F.explode(words(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", md5_long(F.col("word")))
        .localCheckpoint(eager=True)
    )
    bit_sums = wh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")
                ).otherwise(-F.col("cnt"))
            ).alias(f"b{b}")
            for b in range(16)
        ]
    )
    packed = None
    for b in range(16):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = bit if packed is None else packed + bit
    sh = bit_sums.select(
        "doc_id", packed.cast("long").alias("simhash")
    ).localCheckpoint(eager=True)
    bandv = spark.createDataFrame([(0,), (1,), (2,), (3,)], "band int")
    bands = sh.crossJoin(F.broadcast(bandv)).select(
        "doc_id",
        "simhash",
        "band",
        F.expr("shiftright(simhash, band * 4) & 15").alias("key"),
    )
    a = bands.select(
        F.col("band").alias("ab"),
        F.col("key").alias("ak"),
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sa"),
    )
    b2 = bands.select(
        F.col("band").alias("bb"),
        F.col("key").alias("bk"),
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sb"),
    )
    cand = (
        a.join(
            b2,
            (F.col("ab") == F.col("bb"))
            & (F.col("ak") == F.col("bk"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
        .localCheckpoint(eager=True)
    )
    x = F.col("sa").bitwiseXOR(F.col("sb"))
    hd = None
    for b in range(16):
        t = F.shiftright(x, b).bitwiseAND(F.lit(1))
        hd = t if hd is None else hd + t
    close = cand.select(
        "doc_a", "doc_b", hd.cast("bigint").alias("hd")
    ).filter(F.col("hd") <= 3)
    dsize = wh.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("sz"))
    inter = (
        close.join(
            wh.select(F.col("doc_id").alias("doc_a"), "word"), "doc_a"
        )
        .join(
            wh.select(F.col("doc_id").alias("doc_b"), "word"),
            ["doc_b", "word"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("i"))
    )
    v = (
        close.join(inter, ["doc_a", "doc_b"], "left")
        .join(
            dsize.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")),
            "doc_a",
        )
        .join(
            dsize.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")),
            "doc_b",
        )
        .select(
            F.coalesce(F.col("i"), F.lit(0)).alias("inter"),
            (F.col("sza") + F.col("szb") - F.coalesce(F.col("i"), F.lit(0))).alias(
                "uni"
            ),
        )
    )
    ncand = cand.agg(F.count("*").cast("bigint").alias("n_candidates"))
    s = v.agg(
        F.count("*").cast("bigint").alias("n_close"),
        F.sum(F.when(5 * F.col("inter") >= F.col("uni"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_verified"),
    )
    nv = F.coalesce(F.col("n_verified"), F.lit(0))
    return s.crossJoin(F.broadcast(ncand)).select(
        "n_candidates",
        "n_close",
        nv.alias("n_verified"),
        F.when(
            F.col("n_close") > 0,
            F.expr("coalesce(n_verified, 0) * 1000 div n_close"),
        ).alias("precision_permille"),
    )


@query(
    "eta_squared_dow",
    """
    WITH daily AS (
      SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    d AS (
      SELECT (epoch_ms(day) // 86400000 + 4) % 7 AS dow, y FROM daily
    ),
    g AS (
      SELECT dow, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(y) AS BIGINT) AS a_g
      FROM d GROUP BY dow
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS s,
             sum(CAST(y AS HUGEINT) * y) AS s2
      FROM d
    ),
    fold AS (
      SELECT sum(CAST(a_g AS DOUBLE) * CAST(a_g AS DOUBLE)
                 / CAST(n_g AS DOUBLE)) OVER (
               ORDER BY dow ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS acc,
             row_number() OVER (ORDER BY dow DESC) AS rn
      FROM g
    )
    SELECT tot.n AS n_days,
           CASE WHEN tot.n * tot.s2 - tot.s * tot.s > 0
                THEN round(
                  (fold.acc - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                              / CAST(tot.n AS DOUBLE))
                  / (CAST(tot.s2 AS DOUBLE)
                     - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                       / CAST(tot.n AS DOUBLE)), 6)
           END AS eta_squared,
           CASE WHEN tot.n * tot.s2 - tot.s * tot.s > 0
                THEN (fold.acc - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                                 / CAST(tot.n AS DOUBLE))
                     / (CAST(tot.s2 AS DOUBLE)
                        - CAST(tot.s AS DOUBLE) * CAST(tot.s AS DOUBLE)
                          / CAST(tot.n AS DOUBLE)) > 0.14
           END AS strong_seasonality
    FROM fold CROSS JOIN tot WHERE fold.rn = 1
    """,
)
def eta_squared_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """η² (eta-squared) of day-of-week on daily order volume — the
    EFFECT-SIZE companion to events_anova_dow's F-test (a significant
    F on 2,400 days can be a trivial effect; η² = SS_between/SS_total
    is the fraction of daily-volume variance the weekday actually
    explains, with Cohen's 0.14 'large' as the verdict line): the
    capacity-planning number behind 'do we staff by weekday'.

    Exactness: group sums and the variance witness n·Σy² − S² are
    exact integers; Σ_g A_g²/n_g folds as an ORDERED cumulative
    window over the ≤7-row dow frame (kruskal_wallis's canonical
    float order); η² is one layered double tree of exact integers
    behind the exact witness (a constant series has no variance to
    explain — NULL both engines). Zone-free integer dow law shared
    with E38/E39/E75.

    Scale shape: one map-side-combinable daily count, one 7-row agg,
    one 1-row total — nothing after the rollup touches the fact
    table."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    d38 = "decimal(38,0)"
    d = daily.select(
        (((ntz_epoch_ms(F.col("day")) / F.lit(86400000)).cast("bigint") + 4) % 7)
        .alias("dow"),
        "y",
    )
    g = d.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("y").cast("bigint").alias("a_g"),
    )
    tot = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y").cast(d38) * F.col("y")).alias("s2"),
    )
    w_cum = Window.orderBy("dow").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fold = g.select(
        F.sum(
            F.col("a_g").cast("double")
            * F.col("a_g").cast("double")
            / F.col("n_g").cast("double")
        )
        .over(w_cum)
        .alias("acc"),
        F.row_number().over(Window.orderBy(F.desc("dow"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    res = fold.crossJoin(F.broadcast(tot))
    ok = F.col("n") * F.col("s2") - F.col("s") * F.col("s") > 0
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    eta = (F.col("acc") - sd * sd / nd) / (
        F.col("s2").cast("double") - sd * sd / nd
    )
    return res.select(
        F.col("n").alias("n_days"),
        F.when(ok, F.round(eta, 6)).alias("eta_squared"),
        F.when(ok, eta > 0.14).alias("strong_seasonality"),
    )


@query(
    "dedup_chaining_audit",
    f"""
    WITH comp AS (
      SELECT doc_id, cluster_id FROM ({_ORACLE_REG["dedup_clusters"]})
    ),
    sizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
      FROM comp GROUP BY 1 HAVING count(*) >= 2
    ),
    vp AS (
      SELECT doc_a, doc_b
      FROM ({_ORACLE_REG["dedup_lsh_verified_jaccard"]})
    ),
    direct AS (
      SELECT ca.cluster_id, CAST(count(*) AS BIGINT) AS direct_pairs
      FROM vp
      JOIN comp ca ON ca.doc_id = vp.doc_a
      JOIN comp cb ON cb.doc_id = vp.doc_b
       AND cb.cluster_id = ca.cluster_id
      GROUP BY 1
    )
    SELECT s.cluster_id, s.size,
           coalesce(d.direct_pairs, 0) AS direct_pairs,
           s.size * (s.size - 1) // 2 - coalesce(d.direct_pairs, 0)
             AS chained_pairs,
           coalesce(d.direct_pairs, 0) = s.size * (s.size - 1) // 2
             AS fully_connected
    FROM sizes s LEFT JOIN direct d USING (cluster_id)
    """,
)
def dedup_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSITIVITY audit of the near-dup clusters: per connected
    component, how many of its C(size,2) member pairs are DIRECTLY
    verified-similar vs merely CHAINED through intermediates — the
    known failure mode of CC-based dedup (A≈B≈C glues A to C even
    when sim(A,C) fails the cut; a canonical-survivor drop then
    deletes documents nothing was ever directly similar to). A
    cluster with chained_pairs > 0 is where dedup_keep_canonical's
    drop list needs human eyes; fully_connected clusters are safe by
    construction. Composes the two registered oracles verbatim
    (dedup_clusters' recursive-CTE components ⋈
    dedup_lsh_verified_jaccard's verified pairs — zero drift).

    Exactness: everything is exact integers — component sizes, the
    arithmetic C(size,2) (never materialized as a pair join), and the
    direct-pair count from one membership join of the ALREADY-bounded
    verified-pair set.

    Scale shape: two broadcastable joins of verified pairs onto the
    component frame (both ≪ corpus — only banded docs appear), one
    rollup; the quadratic quantity exists only as arithmetic."""
    comp = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    comp = comp.localCheckpoint(eager=True)
    sizes = (
        comp.groupBy("cluster_id")
        .agg(F.count("*").cast("bigint").alias("size"))
        .filter(F.col("size") >= 2)
    )
    vp = dedup_lsh_verified_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    direct = (
        vp.join(
            comp.select(
                F.col("doc_id").alias("doc_a"),
                F.col("cluster_id").alias("ca"),
            ),
            "doc_a",
        )
        .join(
            comp.select(
                F.col("doc_id").alias("doc_b"),
                F.col("cluster_id").alias("cb"),
            ),
            "doc_b",
        )
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("cluster_id"))
        .agg(F.count("*").cast("bigint").alias("direct_pairs"))
    )
    dz = F.coalesce(F.col("direct_pairs"), F.lit(0))
    total = F.expr("size * (size - 1) div 2")
    return sizes.join(direct, "cluster_id", "left").select(
        "cluster_id",
        "size",
        dz.alias("direct_pairs"),
        (total - dz).cast("bigint").alias("chained_pairs"),
        (dz == total).alias("fully_connected"),
    )


@query(
    "nelson_aalen_hazard",
    """
    WITH o2 AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders
    ),
    f AS (SELECT o_custkey, min(d) AS first_d FROM o2 GROUP BY 1),
    nxt AS (
      SELECT o2.o_custkey, min(o2.d) AS second_d
      FROM o2 JOIN f USING (o_custkey)
      WHERE o2.d > f.first_d GROUP BY 1
    ),
    mx AS (SELECT max(d) AS horizon FROM o2),
    durs AS (
      SELECT CASE WHEN nxt.second_d IS NOT NULL
                  THEN date_diff('day', f.first_d, nxt.second_d)
                  ELSE date_diff('day', f.first_d, mx.horizon) END AS dur,
             CASE WHEN nxt.second_d IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM f LEFT JOIN nxt USING (o_custkey), mx
    ),
    evs AS (SELECT dur AS t, CAST(count(*) AS BIGINT) AS d
            FROM durs WHERE ev = 1 GROUP BY 1),
    allc AS (SELECT CAST(count(*) AS BIGINT) AS n_total,
                    CAST(sum(ev) AS BIGINT) AS events_total FROM durs),
    h AS (SELECT dur, CAST(count(*) AS BIGINT) AS cnt
          FROM durs GROUP BY 1),
    cum AS (
      SELECT dur, coalesce(sum(cnt) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS c_lt
      FROM h
    ),
    na0 AS (
      SELECT evs.t, evs.d,
             allc.n_total - cum.c_lt AS n_risk
      FROM evs JOIN cum ON cum.dur = evs.t, allc
    ),
    na AS (
      SELECT t,
             sum(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY t) AS ch
      FROM na0
    )
    SELECT hz.hz, allc.n_total, allc.events_total,
           round(coalesce(max(na.ch), 0.0), 6) AS cum_hazard,
           round(exp(-coalesce(max(na.ch), 0.0)), 6) AS na_survival
    FROM (VALUES (30), (60), (90)) hz(hz)
    LEFT JOIN na ON na.t <= hz.hz, allc
    GROUP BY hz.hz, allc.n_total, allc.events_total
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of time-to-repeat-purchase at
    30/60/90 days — the HAZARD-scale member completing the survival
    trio (kaplan_meier = product-limit survival, logrank = two-group
    comparison; NA's H(t) = Σ d/n is the additive form hazard models
    regress on, and exp(−H) vs the KM curve bounds the discrete-event
    approximation error — the Fleming-Harrington estimator is always
    ≥ KM). Shares the exact duration/censoring machinery of
    kaplan_meier_repurchase verbatim (identical CTEs through n_risk).

    Exactness: d_t and at-risk counts are exact integers off the
    distinct-duration frame; H folds the per-time d/n terms as an
    ORDERED cumulative window (one canonical float order), reported
    by horizon via max-over-matching (H is monotone, so max = the
    last defined value; an event-free horizon coalesces to exactly
    0). n_risk ≥ d ≥ 1 on every event row by construction — no
    division guard is reachable.

    Scale shape: two customer-keyed aggs + one distinct-duration
    window — the KM plan with exp/ln traded for one running sum."""
    orders = load(spark, sf_dir, "orders")
    o2 = orders.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    f = o2.groupBy("o_custkey").agg(F.min("d").alias("first_d"))
    nxt = (
        o2.join(f, "o_custkey")
        .filter(F.col("d") > F.col("first_d"))
        .groupBy("o_custkey")
        .agg(F.min("d").alias("second_d"))
    )
    mx = o2.agg(F.max("d").alias("horizon"))
    durs = (
        f.join(nxt, "o_custkey", "left")
        .crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("second_d").isNotNull(),
                F.datediff(F.col("second_d"), F.col("first_d")),
            )
            .otherwise(F.datediff(F.col("horizon"), F.col("first_d")))
            .cast("bigint")
            .alias("dur"),
            F.when(F.col("second_d").isNotNull(), 1).otherwise(0).alias("ev"),
        )
        .localCheckpoint(eager=True)
    )
    evs = (
        durs.filter(F.col("ev") == 1)
        .groupBy(F.col("dur").alias("t"))
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    allc = durs.agg(
        F.count("*").cast("bigint").alias("n_total"),
        F.sum("ev").cast("bigint").alias("events_total"),
    )
    h = durs.groupBy("dur").agg(F.count("*").cast("bigint").alias("cnt"))
    w_lt = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "dur",
        F.coalesce(F.sum("cnt").over(w_lt), F.lit(0)).alias("c_lt"),
    )
    na0 = (
        evs.join(cum, evs.t == cum.dur)
        .crossJoin(F.broadcast(allc))
        .select("t", "d", (F.col("n_total") - F.col("c_lt")).alias("n_risk"))
    )
    w_na = Window.orderBy("t")
    na = na0.select(
        "t",
        F.sum(F.col("d").cast("double") / F.col("n_risk"))
        .over(w_na)
        .alias("ch"),
    )
    hz = spark.createDataFrame([(30,), (60,), (90,)], "hz int")
    joined = hz.join(na, na.t <= hz.hz, "left").crossJoin(F.broadcast(allc))
    return joined.groupBy("hz", "n_total", "events_total").agg(
        F.round(F.coalesce(F.max("ch"), F.lit(0.0)), 6).alias("cum_hazard"),
        F.round(F.exp(-F.coalesce(F.max("ch"), F.lit(0.0))), 6).alias(
            "na_survival"
        ),
    )


@query(
    "rbo_ranker_agreement",
    """
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                  w -> w = 'vector')) AS BIGINT) AS tf,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl,
             CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df
      FROM base
    ),
    m AS (
      SELECT doc_id,
             ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * 2.2
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS bm25,
             tf * ln(CAST(n AS DOUBLE) / df) AS tfidf
      FROM base CROSS JOIN stats WHERE tf > 0
    ),
    ranked AS (
      SELECT row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r1,
             row_number() OVER (ORDER BY tfidf DESC, doc_id) AS r2
      FROM m
    ),
    mr AS (
      SELECT CAST(greatest(r1, r2) AS BIGINT) AS mrank FROM ranked
    ),
    cnt AS (
      SELECT mrank, CAST(count(*) AS BIGINT) AS c FROM mr
      WHERE mrank <= 100 GROUP BY mrank
    ),
    spine AS (SELECT unnest(generate_series(1, 100)) AS d),
    xd AS (
      SELECT spine.d,
             CAST(coalesce(sum(cnt.c) OVER (ORDER BY spine.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS BIGINT) AS x
      FROM spine LEFT JOIN cnt ON cnt.mrank = spine.d
    ),
    fold AS (
      SELECT sum(exp((d - 1) * ln(0.9)) * CAST(x AS DOUBLE) / d)
               OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS acc,
             row_number() OVER (ORDER BY d DESC) AS rn
      FROM xd
    )
    SELECT CAST(100 AS BIGINT) AS k,
           round(0.1 * acc, 6) AS rbo_100
    FROM fold WHERE rn = 1
    """,
)
def rbo_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p = 0.9, truncated at depth 100) between
    the BM25 and TF-IDF rankings — the TOP-WEIGHTED member completing
    the ranker-agreement trio (Spearman weights all positions equally,
    Kendall counts raw inversions; RBO = (1−p)Σp^{d−1}·|A_d∩B_d|/d
    weights depth d by p^{d−1}, which matches how users read result
    lists and, unlike both, is defined for indefinite rankings).

    Exactness: the per-depth prefix overlap collapses to exact
    integers via max(r1, r2) — a doc is in BOTH prefixes at depth d
    iff its max rank ≤ d — so X_d is one cumulative window over the
    depth spine; p^{d−1} is written exp((d−1)·ln 0.9) as the
    identical tree both engines (sub-ulp exp noise summed over 100
    terms is ~1e-14, quenched by round-6) and the weighted sum folds
    ordered. Empty match frame ⇒ every X_d = 0 ⇒ RBO exactly 0, no
    guard needed.

    Scale shape: same one tokenize pass + two rank windows as the
    spearman/kendall twins; everything after lives on the 100-row
    spine."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", words(F.col("text")).alias("w")
    ).select(
        "doc_id",
        F.size(F.filter(F.col("w"), lambda x: x == F.lit("vector")))
        .cast("bigint")
        .alias("tf"),
        F.size("w").cast("bigint").alias("dl"),
    )
    stats = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum((F.col("tf") > 0).cast("bigint")).cast("bigint").alias("df"),
    )
    m = base.filter(F.col("tf") > 0).crossJoin(F.broadcast(stats))
    bm25 = (
        F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf")
        * 2.2
        / (F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")))
    )
    tfidf = F.col("tf") * F.log(F.col("n").cast("double") / F.col("df"))
    ranked = m.select(bm25.alias("bm25"), tfidf.alias("tfidf"), "doc_id").select(
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.desc("tfidf"), F.asc("doc_id")))
        .alias("r2"),
    )
    cnt = (
        ranked.select(
            F.greatest(F.col("r1"), F.col("r2")).cast("bigint").alias("mrank")
        )
        .filter(F.col("mrank") <= 100)
        .groupBy("mrank")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    spine = spark.range(1, 101).select(F.col("id").alias("d"))
    w_cum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    xd = spine.join(cnt, spine.d == cnt.mrank, "left").select(
        "d",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0))
        .cast("bigint")
        .alias("x"),
    )
    term = (
        F.exp((F.col("d") - 1) * F.log(F.lit(0.9)))
        * F.col("x").cast("double")
        / F.col("d")
    )
    fold = xd.select(
        F.sum(term).over(w_cum).alias("acc"),
        F.row_number().over(Window.orderBy(F.desc("d"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    return fold.select(
        F.lit(100).cast("bigint").alias("k"),
        F.round(F.lit(0.1) * F.col("acc"), 6).alias("rbo_100"),
    )


@query(
    "hub_attack_robustness",
    f"""
    WITH RECURSIVE {_PAGELINKS_SQL_CTES},
    und AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM links
    ),
    indeg AS (
      SELECT dst, CAST(count(*) AS BIGINT) AS d FROM links GROUP BY dst
    ),
    hubs AS (
      SELECT dst AS hub FROM (
        SELECT dst, row_number() OVER (ORDER BY d DESC, dst) AS rn
        FROM indeg
      ) WHERE rn <= 5
    ),
    e1 AS (
      SELECT a AS src, b AS dst FROM und
      UNION ALL SELECT b, a FROM und
    ),
    v1 AS (SELECT DISTINCT src AS doc_id FROM e1),
    walk1(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM v1
      UNION
      SELECT w.doc_id, e.dst FROM walk1 w JOIN e1 e ON e.src = w.reach
    ),
    comp1 AS (
      SELECT doc_id, min(reach) AS cid FROM walk1 GROUP BY doc_id
    ),
    lcc1 AS (
      SELECT CAST(max(sz) AS BIGINT) AS lcc,
             CAST(count(*) AS BIGINT) AS n_comp FROM (
        SELECT cid, count(*) AS sz FROM comp1 GROUP BY cid
      )
    ),
    und2 AS (
      SELECT u.a, u.b FROM und u
      WHERE NOT EXISTS (SELECT 1 FROM hubs h WHERE h.hub = u.a)
        AND NOT EXISTS (SELECT 1 FROM hubs h WHERE h.hub = u.b)
    ),
    e2 AS (
      SELECT a AS src, b AS dst FROM und2
      UNION ALL SELECT b, a FROM und2
    ),
    v2 AS (SELECT DISTINCT src AS doc_id FROM e2),
    walk2(doc_id, reach) AS (
      SELECT doc_id, doc_id FROM v2
      UNION
      SELECT w.doc_id, e.dst FROM walk2 w JOIN e2 e ON e.src = w.reach
    ),
    comp2 AS (
      SELECT doc_id, min(reach) AS cid FROM walk2 GROUP BY doc_id
    ),
    lcc2 AS (
      SELECT CAST(coalesce(max(sz), 0) AS BIGINT) AS lcc FROM (
        SELECT cid, count(*) AS sz FROM comp2 GROUP BY cid
      )
    ),
    nv AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM v1)
    SELECT nv.n_nodes, lcc1.lcc AS lcc_before, lcc2.lcc AS lcc_after,
           CASE WHEN lcc1.lcc > 0
                THEN lcc2.lcc * 1000 // lcc1.lcc
           END AS retained_permille
    FROM nv CROSS JOIN lcc1 CROSS JOIN lcc2
    """,
)
def hub_attack_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted-attack robustness of the page graph (Albert-Jeong-
    Barabási): remove the top-5 in-degree hubs and measure how much
    of the largest connected component survives — THE macro question
    for a crawler's frontier health (scale-free graphs shatter under
    hub removal but shrug off random loss; retained_permille says
    which regime this web is in, and how exposed the crawl is to a
    few hub hosts going dark). Complements the bow-tie (static
    structure) with a perturbation read.

    Exactness: hubs are a deterministic top-5 (in-degree desc, id
    tiebreak); both component passes are the engine's pointer-jumped
    min-label CC against the oracle's recursive-closure ground truth
    (dedup_clusters' pinned pattern, run before AND after the cut);
    sizes and the floored permille are exact integers, guarded on a
    nonempty pre-attack component.

    Scale shape: two CC runs (O(log diameter) rounds each,
    per-iteration localCheckpoint), one degree agg, a 5-row broadcast
    anti-join for the cut. The closure-style oracle is the TEST
    harness; the engine path never materializes reachability."""
    docs = load(spark, sf_dir, "documents")
    links = _pagelinks(docs).localCheckpoint(eager=True)
    und = (
        links.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    indeg = links.groupBy("dst").agg(F.count("*").cast("bigint").alias("d"))
    hubs = (
        indeg.select(
            "dst",
            F.row_number()
            .over(Window.orderBy(F.desc("d"), F.asc("dst")))
            .alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select(F.col("dst").alias("hub"))
    )
    pairs1 = und.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    comp1 = _connected_components(pairs1).select("doc_id", F.col("cluster_id"))
    lcc1 = (
        comp1.groupBy("cluster_id")
        .agg(F.count("*").alias("sz"))
        .agg(F.max("sz").cast("bigint").alias("lcc_before"))
    )
    und2 = (
        und.join(F.broadcast(hubs), und.a == F.col("hub"), "left_anti")
        .join(F.broadcast(hubs), F.col("b") == F.col("hub"), "left_anti")
    )
    pairs2 = und2.select(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
    comp2 = _connected_components(pairs2)
    lcc2 = (
        comp2.groupBy("cluster_id")
        .agg(F.count("*").alias("sz"))
        .agg(F.coalesce(F.max("sz"), F.lit(0)).cast("bigint").alias("lcc_after"))
    )
    nv = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .distinct()
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
    )
    return (
        nv.crossJoin(F.broadcast(lcc1))
        .crossJoin(F.broadcast(lcc2))
        .select(
            "n_nodes",
            "lcc_before",
            "lcc_after",
            F.when(
                F.col("lcc_before") > 0,
                F.expr("lcc_after * 1000 div lcc_before"),
            ).alias("retained_permille"),
        )
    )


@query(
    "market_basket_triples",
    """
    WITH ol AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_type AS t
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM ol),
    s1 AS (SELECT t, count(*) AS s FROM ol GROUP BY t),
    triples AS (
      SELECT a.t AS type_a, b.t AS type_b, c.t AS type_c,
             count(*) AS s_abc
      FROM ol a
      JOIN ol b ON a.ok = b.ok AND a.t < b.t
      JOIN ol c ON a.ok = c.ok AND b.t < c.t
      GROUP BY 1, 2, 3
      HAVING count(*) >= 3
    )
    SELECT tr.type_a, tr.type_b, tr.type_c,
           CAST(tr.s_abc AS BIGINT) AS support_abc,
           CAST(sa.s AS BIGINT) AS support_a,
           CAST(sb.s AS BIGINT) AS support_b,
           CAST(sc.s AS BIGINT) AS support_c,
           CAST(nb.n_baskets AS BIGINT) AS n_baskets,
           CAST(tr.s_abc AS HUGEINT) * nb.n_baskets * nb.n_baskets
             > CAST(sa.s AS HUGEINT) * sb.s * sc.s AS positive_lift3
    FROM triples tr
    JOIN s1 sa ON sa.t = tr.type_a
    JOIN s1 sb ON sb.t = tr.type_b
    JOIN s1 sc ON sc.t = tr.type_c
    CROSS JOIN nb
    """,
)
def market_basket_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-itemset market-basket affinity — the next rung of the
    association-rule ladder above market_basket_lift's pairs (a
    bundle recommendation needs the TRIPLE support; pair lifts can
    all be positive while the triple never co-occurs): per ordered
    type-triple the support (floor 3 prunes noise) and the lift-3
    verdict decided entirely in integers — lift(A,B,C) > 1 ⇔
    s_abc·N² > s_a·s_b·s_c (products on HUGEINT/DECIMAL(38,0):
    (1.5·10⁵)³ passes BIGINT at sf1 already), all witnesses shipped
    so the consumer ranks by exact rational lift.

    Scale shape: the triple self-join is keyed on the basket id with
    width bounded by the per-basket TYPE vocabulary (6 types ⇒ ≤ 20
    triples/basket — combinatorics of the domain, not line-item
    fan-out); supports broadcast onto the |types|³-bounded frame."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    d38 = "decimal(38,0)"
    ol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_type").alias("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nb = ol.select("ok").distinct().agg(
        F.count("*").cast("bigint").alias("n_baskets")
    )
    s1 = ol.groupBy("t").agg(F.count("*").cast("bigint").alias("s"))
    a = ol.select("ok", F.col("t").alias("ta"))
    b = ol.select("ok", F.col("t").alias("tb"))
    c = ol.select("ok", F.col("t").alias("tc"))
    triples = (
        a.join(b, "ok")
        .filter(F.col("ta") < F.col("tb"))
        .join(c, "ok")
        .filter(F.col("tb") < F.col("tc"))
        .groupBy(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("tc").alias("type_c"),
        )
        .agg(F.count("*").cast("bigint").alias("s_abc"))
        .filter(F.col("s_abc") >= 3)
    )
    sa = s1.select(F.col("t").alias("type_a"), F.col("s").alias("support_a"))
    sb = s1.select(F.col("t").alias("type_b"), F.col("s").alias("support_b"))
    sc = s1.select(F.col("t").alias("type_c"), F.col("s").alias("support_c"))
    return (
        triples.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .join(F.broadcast(sc), "type_c")
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            "type_c",
            F.col("s_abc").alias("support_abc"),
            "support_a",
            "support_b",
            "support_c",
            "n_baskets",
            (
                F.col("s_abc").cast(d38)
                * F.col("n_baskets")
                * F.col("n_baskets")
                > F.col("support_a").cast(d38)
                * F.col("support_b")
                * F.col("support_c")
            ).alias("positive_lift3"),
        )
    )


def _hitting_time_sql(iters: int = 6) -> str:
    chain = []
    for k in range(1, iters + 1):
        chain.append(
            f"""h{k} AS (
      SELECT n.doc_id,
             CASE WHEN n.doc_id = 0 THEN CAST(0 AS BIGINT)
                  WHEN f.s IS NULL THEN p.h + 1048576
                  ELSE CAST(1048576 + f.s // f.od AS BIGINT)
             END AS h
      FROM nodes n
      LEFT JOIN (
        SELECT l.src, sum(p.h) AS s, count(*) AS od
        FROM links l JOIN h{k - 1} p ON p.doc_id = l.dst
        GROUP BY l.src
      ) f ON f.src = n.doc_id
      LEFT JOIN h{k - 1} p ON p.doc_id = n.doc_id
    )"""
        )
    joined = ",\n    ".join(chain)
    return f"""
    WITH {_PAGELINKS_SQL_CTES},
    nodes AS (SELECT doc_id FROM documents),
    h0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS h FROM nodes),
    {joined}
    SELECT doc_id, h AS hit6_x2p20,
           CAST(row_number() OVER (ORDER BY h DESC, doc_id) AS BIGINT)
             AS rnk
    FROM h{iters}
    """


@query("hitting_time_to_root", _hitting_time_sql())
def hitting_time_to_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated expected hitting time of a uniform random surf to
    the root page (doc 0) — the VALUE-ITERATION operator class
    (expected-cost dynamic programming on a graph) the centrality
    family doesn't cover: PageRank asks where a surfer accumulates,
    hitting time asks how many clicks AWAY each page is in
    expectation, the number behind 'how discoverable is this page
    from the home page' and crawl-depth budgeting. Six Bellman
    updates h ← 1 + mean over out-neighbors (root absorbing at 0, so
    h_k is the k-step truncated expectation — a monotone lower bound
    of the true hitting time; pages that cannot reach the root just
    grow toward the horizon).

    Cross-engine exactness (markov_stationary_power discipline):
    h is scaled 2^20 fixed-point and every update is integer — the
    neighbor mean is Σh div outdeg (floor on both engines), the +1
    is +2^20. Nodes with no out-edges advance one full step into
    themselves per iteration (+2^20) — a dangling page can never
    reach the root, and its value growing WITH the horizon is exactly
    the unreachable signal (a keep-value convention would make it
    read as sitting at the root). The deterministic rank column makes the output a
    ready 'deepest pages' report.

    Scale shape: per iteration one join ships h along edges + one
    hash agg by source + a LEFT join from the node set — O(iters)
    shuffles, the same plan family as pagerank/HITS, with
    per-iteration localCheckpoint bounding plan depth."""
    docs = load(spark, sf_dir, "documents")
    links = _pagelinks(docs).localCheckpoint(eager=True)
    nodes = docs.select("doc_id").localCheckpoint(eager=True)
    h = nodes.withColumn("h", F.lit(0).cast("bigint"))
    for _ in range(6):
        flow = (
            links.join(
                h.select(F.col("doc_id").alias("dst"), "h"), "dst"
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.sum("h").alias("s"), F.count("*").alias("od"))
        )
        h = (
            nodes.join(flow, "doc_id", "left")
            .join(h.select("doc_id", F.col("h").alias("ph")), "doc_id", "left")
            .select(
                "doc_id",
                F.when(F.col("doc_id") == 0, F.lit(0).cast("bigint"))
                .when(F.col("s").isNull(), F.col("ph") + 1048576)
                .otherwise(
                    (F.lit(1048576) + F.expr("s div od")).cast("bigint")
                )
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return h.select(
        "doc_id",
        F.col("h").alias("hit6_x2p20"),
        F.row_number()
        .over(Window.orderBy(F.desc("h"), F.asc("doc_id")))
        .cast("bigint")
        .alias("rnk"),
    )


@query(
    "unit_price_drift",
    """
    WITH lm AS (
      SELECT p.p_type AS t,
             CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
               AS BIGINT) AS m,
             CAST(round(l.l_extendedprice * 100) AS BIGINT) AS e,
             CAST(round(l.l_quantity) AS BIGINT) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    g AS (
      SELECT t, m,
             CAST(sum(CAST(e AS HUGEINT)) AS BIGINT) AS te,
             CAST(sum(q) AS BIGINT) AS tq
      FROM lm GROUP BY t, m
    ),
    l AS (
      SELECT t, m, te, tq,
             lag(te) OVER (PARTITION BY t ORDER BY m) AS pe,
             lag(tq) OVER (PARTITION BY t ORDER BY m) AS pq
      FROM g
    )
    SELECT t AS part_type, m AS month_idx,
           CASE WHEN tq > 0
                THEN round(CAST(te AS DOUBLE) / CAST(tq AS DOUBLE), 6)
           END AS unit_price_cents,
           CASE WHEN pe IS NULL OR tq = 0 OR pq = 0 THEN NULL
                WHEN CAST(te AS HUGEINT) * pq > CAST(pe AS HUGEINT) * tq
                  THEN CAST(1 AS BIGINT)
                WHEN CAST(te AS HUGEINT) * pq < CAST(pe AS HUGEINT) * tq
                  THEN CAST(-1 AS BIGINT)
                ELSE CAST(0 AS BIGINT)
           END AS mom_direction
    FROM l
    """,
)
def unit_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly unit-price drift per part type — the price-monitoring
    operator (is STEEL getting more expensive per unit, independent
    of volume?): per (type, month) the quantity-weighted unit price
    and a month-over-month direction verdict that never divides —
    price_t > price_{t−1} ⇔ E_t·Q_{t−1} > E_{t−1}·Q_t
    cross-multiplied over exact integer cents/quantity sums
    (HUGEINT/DECIMAL(38,0) headroom: E·Q ≈ 10^15 at sf0.1, 10^19 at
    sf10 — wide before it matters). The displayed unit price is the
    only division, guarded on Q > 0; the first month of a type and
    zero-quantity edges report NULL direction.

    Scale shape: one map-side-combinable rollup to the (6 types ×
    84 months) frame off the part join (broadcast dim); the lag
    window runs on that bounded frame."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    d38 = "decimal(38,0)"
    lm = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.col("p_type").alias("t"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1)
        .cast("bigint")
        .alias("m"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("e"),
        F.round(F.col("l_quantity")).cast("bigint").alias("q"),
    )
    g = lm.groupBy("t", "m").agg(
        F.sum(F.col("e").cast(d38)).cast("bigint").alias("te"),
        F.sum("q").cast("bigint").alias("tq"),
    )
    w = Window.partitionBy("t").orderBy("m")
    l = g.select(
        "t",
        "m",
        "te",
        "tq",
        F.lag("te").over(w).alias("pe"),
        F.lag("tq").over(w).alias("pq"),
    )
    cur = F.col("te").cast(d38) * F.col("pq")
    prv = F.col("pe").cast(d38) * F.col("tq")
    return l.select(
        F.col("t").alias("part_type"),
        F.col("m").alias("month_idx"),
        F.when(
            F.col("tq") > 0,
            F.round(F.col("te").cast("double") / F.col("tq").cast("double"), 6),
        ).alias("unit_price_cents"),
        F.when(
            F.col("pe").isNull() | (F.col("tq") == 0) | (F.col("pq") == 0),
            F.lit(None).cast("bigint"),
        )
        .when(cur > prv, F.lit(1))
        .when(cur < prv, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mom_direction"),
    )


@query(
    "cohort_ltv_curve",
    """
    WITH om AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
               AS BIGINT) AS m,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    first_m AS (
      SELECT o_custkey, min(m) AS m0 FROM om GROUP BY 1
    ),
    sizes AS (
      SELECT m0, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first_m GROUP BY m0
    ),
    rev AS (
      SELECT f.m0, om.m - f.m0 AS age,
             CAST(sum(CAST(om.cents AS HUGEINT)) AS BIGINT) AS r
      FROM om JOIN first_m f USING (o_custkey)
      GROUP BY 1, 2
    )
    SELECT rev.m0 AS cohort_month, rev.age AS age_months,
           sizes.cohort_size,
           CAST(sum(rev.r) OVER (PARTITION BY rev.m0 ORDER BY rev.age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_revenue_cents
    FROM rev JOIN sizes USING (m0)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: cumulative revenue per
    acquisition cohort (first-order month) by age in months — the
    REVENUE companion to cohort_retention's headcount triangle (the
    LTV curve is what acquisition spend is actually justified
    against; retention can hold while basket size collapses and only
    this curve notices). Every number is an exact integer: cohort
    assignment by integer month index, per-(cohort, age) revenue
    sums on HUGEINT/DECIMAL(38,0), the running curve an exact
    cumulative window over ages within each cohort.

    Scale shape: one first-order agg (customer-keyed), one
    (cohort × age)-keyed revenue rollup off the same join, and the
    cumsum window runs on the cohorts×ages-bounded frame (84² at 7
    years), not on orders."""
    orders = load(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    om = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    first_m = om.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = first_m.groupBy("m0").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    rev = (
        om.join(first_m, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("age"))
        .agg(F.sum(F.col("cents").cast(d38)).cast("bigint").alias("r"))
    )
    w = (
        Window.partitionBy("m0")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rev.join(sizes, "m0").select(
        F.col("m0").alias("cohort_month"),
        F.col("age").alias("age_months"),
        "cohort_size",
        F.sum("r").over(w).cast("bigint").alias("cum_revenue_cents"),
    )


@query(
    "lang_vocab_overlap",
    """
    WITH toks AS (
      SELECT DISTINCT lang, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    vs AS (SELECT lang, CAST(count(*) AS BIGINT) AS v FROM toks GROUP BY 1),
    inter AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b,
             CAST(count(*) AS BIGINT) AS shared
      FROM toks a JOIN toks b ON a.t = b.t AND a.lang < b.lang
      GROUP BY 1, 2
    )
    SELECT i.lang_a, i.lang_b, i.shared,
           va.v AS vocab_a, vb.v AS vocab_b,
           i.shared * 1000 // (va.v + vb.v - i.shared)
             AS jaccard_permille
    FROM inter i
    JOIN vs va ON va.lang = i.lang_a
    JOIN vs vb ON vb.lang = i.lang_b
    """,
)
def lang_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language vocabulary overlap matrix: per language pair the
    shared-type count and vocabulary Jaccard (floored permille) — the
    script-contamination / code-switching detector the per-language
    stats can't see (a high en↔fr overlap means mislabeled docs or
    boilerplate leaking across the langid gate, and it's exactly what
    inflates langid_confusion's off-diagonals). Natural companion to
    source_overlap_matrix (sources × near-dups; here languages ×
    vocabulary).

    Exactness: all integers — distinct (lang, token) sets, the
    pairwise intersection via one token-keyed join, union by
    |A|+|B|−|∩|, floored permille. The pair frame is |langs|²-bounded
    (10 rows at 5 languages); a nonempty pair always has union ≥ 1,
    so the division needs no guard.

    Scale shape: one tokenize distinct (the vocab family's shared
    agg), a token-keyed self-join whose width is the number of
    LANGUAGES sharing a token (≤ |langs|), two broadcast size joins."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select("lang", F.explode(words(F.col("text"))).alias("t"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    vs = toks.groupBy("lang").agg(F.count("*").cast("bigint").alias("v"))
    a = toks.select(F.col("lang").alias("lang_a"), "t")
    b = toks.select(F.col("lang").alias("lang_b"), "t")
    inter = (
        a.join(b, "t")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").cast("bigint").alias("shared"))
    )
    va = vs.select(F.col("lang").alias("lang_a"), F.col("v").alias("vocab_a"))
    vb = vs.select(F.col("lang").alias("lang_b"), F.col("v").alias("vocab_b"))
    return (
        inter.join(F.broadcast(va), "lang_a")
        .join(F.broadcast(vb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            "shared",
            "vocab_a",
            "vocab_b",
            F.expr(
                "shared * 1000 div (vocab_a + vocab_b - shared)"
            ).alias("jaccard_permille"),
        )
    )


@query(
    "growth_accounting_monthly",
    """
    WITH um AS (
      SELECT DISTINCT user_id,
             CAST((epoch_ms(ts) // 86400000 + 719468) // 30 AS BIGINT)
               AS m
      FROM events
    ),
    f AS (SELECT user_id, min(m) AS m0 FROM um GROUP BY 1),
    lagged AS (
      SELECT um.user_id, um.m, f.m0,
             lag(um.m) OVER (PARTITION BY um.user_id ORDER BY um.m)
               AS pm
      FROM um JOIN f USING (user_id)
    ),
    classes AS (
      SELECT m,
             CAST(sum(CASE WHEN m = m0 THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(sum(CASE WHEN m > m0 AND pm = m - 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS retained,
             CAST(sum(CASE WHEN m > m0 AND pm < m - 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS resurrected
      FROM lagged GROUP BY m
    ),
    churn AS (
      SELECT pm + 1 AS m, CAST(count(*) AS BIGINT) AS churned
      FROM (
        SELECT user_id, m AS pm,
               lead(m) OVER (PARTITION BY user_id ORDER BY m) AS nm
        FROM um
      ) WHERE nm IS NULL OR nm > pm + 1
      GROUP BY pm + 1
    ),
    mx AS (SELECT max(m) AS last_m FROM um)
    SELECT c.m AS month_idx, c.new_users, c.retained, c.resurrected,
           coalesce(ch.churned, 0) AS churned_in,
           CASE WHEN coalesce(ch.churned, 0) > 0
                THEN (c.new_users + c.resurrected) * 1000
                     // coalesce(ch.churned, 0)
           END AS quick_ratio_permille
    FROM classes c
    LEFT JOIN churn ch ON ch.m = c.m
    CROSS JOIN mx
    WHERE c.m <= mx.last_m
    """,
)
def growth_accounting_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly growth accounting — the 4-class active-user ledger
    (Social-Capital style) that events_new_vs_returning and
    events_inactive_churn each show one face of: per 30-day month
    index, NEW (first month ever), RETAINED (also active previous
    month), RESURRECTED (active, gap behind them), and CHURNED-IN
    (users whose streak ended the month before — lead-gap law, so a
    user churns exactly once per gap), plus the quick ratio
    (new+resurrected)/churned as a floored permille. The classes
    partition each month's actives exactly: new + retained +
    resurrected = MAU(m).

    Exactness: months are integer 30-day buckets off zone-free epoch
    days (the +719468 offset keeps bucket edges away from the data's
    era so sf slices agree); classification is pure integer
    lag/lead arithmetic on the distinct user-month frame; the quick
    ratio divides only behind the churned > 0 witness.

    Scale shape: one distinct to user-months, one user-keyed
    min-agg + two user-partitioned windows (the same exchange), a
    month-keyed rollup — nothing after the distinct touches event
    rows."""
    ev = load(spark, sf_dir, "events")
    day = (ntz_epoch_ms(F.col("ts")) / F.lit(86400000)).cast("bigint")
    um = (
        ev.select(
            "user_id",
            ((day + 719468) / F.lit(30)).cast("bigint").alias("m"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    f = um.groupBy("user_id").agg(F.min("m").alias("m0"))
    w = Window.partitionBy("user_id").orderBy("m")
    lagged = um.join(f, "user_id").select(
        "user_id", "m", "m0", F.lag("m").over(w).alias("pm")
    )
    classes = lagged.groupBy("m").agg(
        F.sum(F.when(F.col("m") == F.col("m0"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(
            F.when(
                (F.col("m") > F.col("m0")) & (F.col("pm") == F.col("m") - 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when(
                (F.col("m") > F.col("m0")) & (F.col("pm") < F.col("m") - 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    churn = (
        um.select(
            "user_id", F.col("m").alias("pm"), F.lead("m").over(w).alias("nm")
        )
        .filter(F.col("nm").isNull() | (F.col("nm") > F.col("pm") + 1))
        .groupBy((F.col("pm") + 1).alias("m"))
        .agg(F.count("*").cast("bigint").alias("churned"))
    )
    mx = um.agg(F.max("m").alias("last_m"))
    chz = F.coalesce(F.col("churned"), F.lit(0))
    return (
        classes.join(churn, "m", "left")
        .crossJoin(F.broadcast(mx))
        .filter(F.col("m") <= F.col("last_m"))
        .select(
            F.col("m").alias("month_idx"),
            "new_users",
            "retained",
            "resurrected",
            chz.alias("churned_in"),
            F.when(
                chz > 0,
                F.expr(
                    "(new_users + resurrected) * 1000 "
                    "div coalesce(churned, 0)"
                ),
            ).alias("quick_ratio_permille"),
        )
    )


@query(
    "p_chart_late_shipments",
    """
    WITH first_ship AS (
      SELECT l_orderkey, min(epoch_ms(l_shipdate)) AS ship_ms
      FROM lineitem GROUP BY 1
    ),
    o AS (
      SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
               AS BIGINT) AS m,
             CASE WHEN fs.ship_ms - epoch_ms(o.o_orderdate)
                       > CAST(30 AS BIGINT) * 86400000
                  THEN 1 ELSE 0 END AS late
      FROM orders o JOIN first_ship fs ON fs.l_orderkey = o.o_orderkey
    ),
    g AS (
      SELECT m, CAST(count(*) AS BIGINT) AS n_i,
             CAST(sum(late) AS BIGINT) AS x_i
      FROM o GROUP BY m
    ),
    tot AS (
      SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(x_i) AS BIGINT) AS x
      FROM g
    )
    SELECT g.m AS month_idx, g.n_i, g.x_i,
           g.x_i * 1000 // g.n_i AS late_permille,
           CASE WHEN tot.x > 0 AND tot.x < tot.n THEN
             CAST(g.x_i AS HUGEINT) * tot.n - CAST(tot.x AS HUGEINT) * g.n_i
             > 0
             AND (CAST(g.x_i AS HUGEINT) * tot.n
                  - CAST(tot.x AS HUGEINT) * g.n_i)
                 * (CAST(g.x_i AS HUGEINT) * tot.n
                    - CAST(tot.x AS HUGEINT) * g.n_i)
               > 9 * CAST(tot.x AS HUGEINT) * (tot.n - tot.x) * g.n_i
           END AS above_ucl,
           CASE WHEN tot.x > 0 AND tot.x < tot.n THEN
             CAST(g.x_i AS HUGEINT) * tot.n - CAST(tot.x AS HUGEINT) * g.n_i
             < 0
             AND (CAST(g.x_i AS HUGEINT) * tot.n
                  - CAST(tot.x AS HUGEINT) * g.n_i)
                 * (CAST(g.x_i AS HUGEINT) * tot.n
                    - CAST(tot.x AS HUGEINT) * g.n_i)
               > 9 * CAST(tot.x AS HUGEINT) * (tot.n - tot.x) * g.n_i
           END AS below_lcl
    FROM g CROSS JOIN tot
    """,
)
def p_chart_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p-chart (attribute control chart) on the monthly late-shipment
    proportion — the statistical-process-control member the anomaly
    family is missing (z-score/MAD/CUSUM watch a VALUE series; a
    p-chart watches a PROPORTION with per-month sample-size-aware 3σ
    limits, the Shewhart law a fulfilment dashboard actually runs):
    late = first line shipped > 30 days after order (E-SLA's law),
    limits p̄ ± 3√(p̄(1−p̄)/n_i) from the pooled rate.

    Exactness: the 3σ verdict never computes the sqrt — out-of-
    control ⇔ (x_i·N − X·n_i)² > 9·X(N−X)·n_i with the sign split
    into above/below columns, all on HUGEINT/DECIMAL(38,0) exact
    integers ((x·N)² ≈ 10²¹ at sf1), behind the degenerate witness
    0 < X < N (an all-late or never-late process has no binomial
    width — NULL both engines). The displayed rate is a floored
    permille.

    Scale shape: lineitem collapses map-side to one min per order
    BEFORE the join (the E-SLA discipline); months fold to a
    calendar-bounded frame with a 1-row pooled broadcast."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    d38 = "decimal(38,0)"
    first_ship = li.groupBy("l_orderkey").agg(
        F.min(ntz_epoch_ms(F.col("l_shipdate"))).alias("ship_ms")
    )
    om = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("m"),
        F.when(
            F.col("ship_ms") - ntz_epoch_ms(F.col("o_orderdate"))
            > 30 * 86400000,
            1,
        )
        .otherwise(0)
        .alias("late"),
    )
    g = om.groupBy("m").agg(
        F.count("*").cast("bigint").alias("n_i"),
        F.sum("late").cast("bigint").alias("x_i"),
    )
    tot = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("x_i").cast("bigint").alias("x"),
    )
    res = g.crossJoin(F.broadcast(tot))
    diff = F.col("x_i").cast(d38) * F.col("n") - F.col("x").cast(d38) * F.col(
        "n_i"
    )
    thresh = (
        F.lit(9) * F.col("x").cast(d38) * (F.col("n") - F.col("x")) * F.col("n_i")
    )
    ok = (F.col("x") > 0) & (F.col("x") < F.col("n"))
    return res.select(
        F.col("m").alias("month_idx"),
        "n_i",
        "x_i",
        F.expr("x_i * 1000 div n_i").alias("late_permille"),
        F.when(ok, (diff > 0) & (diff * diff > thresh)).alias("above_ucl"),
        F.when(ok, (diff < 0) & (diff * diff > thresh)).alias("below_lcl"),
    )


@query(
    "c_chart_error_days",
    """
    WITH d AS (
      SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
      FROM events WHERE event_type = 'error'
    ),
    g AS (SELECT day, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY day),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_days
      FROM g
    )
    SELECT g.day, g.c,
           CAST(g.c AS HUGEINT) * tot.n_days - tot.total > 0
             AS above_mean,
           (CAST(g.c AS HUGEINT) * tot.n_days - tot.total)
             * (CAST(g.c AS HUGEINT) * tot.n_days - tot.total)
             > 9 * CAST(tot.total AS HUGEINT) * tot.n_days
             AS out_of_control
    FROM g CROSS JOIN tot
    WHERE (CAST(g.c AS HUGEINT) * tot.n_days - tot.total)
          * (CAST(g.c AS HUGEINT) * tot.n_days - tot.total)
          > 9 * CAST(tot.total AS HUGEINT) * tot.n_days
    """,
)
def c_chart_error_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c-chart on daily error counts — the COUNT-side Shewhart
    control chart next to the p-chart's proportions (c-charts assume
    Poisson: limits c̄ ± 3√c̄; a day outside them is a special-cause
    incident, not noise — the SPC-grade answer where
    events_anomaly_zscore's z-threshold assumes normality that
    events_fano_burstiness may have already disproven). Emits ONLY
    the out-of-control days (the incident list a pager wants).

    Exactness: the 3σ verdict is sqrt-free — |c_i·D − C|² > 9·C·D on
    HUGEINT/DECIMAL(38,0) exact integers — and the above/below sign
    rides along; an error-free corpus yields an empty day frame and
    an empty result in both engines, no guard needed.

    Scale shape: one filtered map-side daily count, a 1-row pooled
    broadcast, the flag filter on the calendar-bounded frame."""
    ev = load(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    g = (
        ev.filter(F.col("event_type") == "error")
        .select(
            (ntz_epoch_ms(F.col("ts")) / F.lit(86400000))
            .cast("bigint")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = g.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    res = g.crossJoin(F.broadcast(tot))
    diff = F.col("c").cast(d38) * F.col("n_days") - F.col("total")
    thresh = F.lit(9) * F.col("total").cast(d38) * F.col("n_days")
    return res.filter(diff * diff > thresh).select(
        "day",
        "c",
        (diff > 0).alias("above_mean"),
        (diff * diff > thresh).alias("out_of_control"),
    )


@query(
    "burrows_delta_sources",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    mfw AS (
      SELECT w FROM (
        SELECT w, count(*) AS c,
               row_number() OVER (ORDER BY count(*) DESC, w) AS rn
        FROM toks GROUP BY w
      ) WHERE rn <= 10
    ),
    st AS (SELECT source, CAST(count(*) AS BIGINT) AS t
           FROM toks GROUP BY source),
    sw AS (
      SELECT toks.source, toks.w, CAST(count(*) AS BIGINT) AS c
      FROM toks JOIN mfw USING (w) GROUP BY 1, 2
    ),
    fr AS (
      SELECT st.source, mfw.w,
             CAST(coalesce(sw.c, 0) AS DOUBLE) / CAST(st.t AS DOUBLE) AS f
      FROM st CROSS JOIN mfw
      LEFT JOIN sw ON sw.source = st.source AND sw.w = mfw.w
    ),
    mu_f AS (
      SELECT w,
             sum(f) OVER (PARTITION BY w ORDER BY source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc,
             count(*) OVER (PARTITION BY w ORDER BY source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
             row_number() OVER (PARTITION BY w ORDER BY source DESC)
               AS rn
      FROM fr
    ),
    mu AS (SELECT w, acc / s AS mu, s FROM mu_f WHERE rn = 1),
    var_f AS (
      SELECT fr.w,
             sum((fr.f - mu.mu) * (fr.f - mu.mu)) OVER (
               PARTITION BY fr.w ORDER BY fr.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vacc,
             row_number() OVER (PARTITION BY fr.w
                                ORDER BY fr.source DESC) AS rn
      FROM fr JOIN mu USING (w)
    ),
    sig AS (
      SELECT var_f.w, sqrt(var_f.vacc / mu.s) AS sigma
      FROM var_f JOIN mu USING (w) WHERE var_f.rn = 1
        AND var_f.vacc > 0
    ),
    z AS (
      SELECT fr.source, fr.w, (fr.f - mu.mu) / sig.sigma AS z
      FROM fr JOIN mu USING (w) JOIN sig USING (w)
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b, a.w,
             abs(a.z - b.z) AS dz
      FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    ),
    fold AS (
      SELECT source_a, source_b,
             sum(dz) OVER (PARTITION BY source_a, source_b ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc,
             count(*) OVER (PARTITION BY source_a, source_b ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m,
             row_number() OVER (PARTITION BY source_a, source_b
                                ORDER BY w DESC) AS rn
      FROM pairs
    )
    SELECT source_a, source_b, CAST(m AS BIGINT) AS n_words,
           round(acc / m, 6) AS delta
    FROM fold WHERE rn = 1
    """,
)
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta between crawl sources — the STYLOMETRY operator
    (authorship/agency attribution over most-frequent-word profiles):
    z-score each source's relative frequency of the corpus's top-10
    words, Delta(a,b) = mean |z_a − z_b| — low Delta = same editorial
    hand/template farm (a de-biasing and spam-network signal the
    near-dup tiers can't see, because style survives paraphrase that
    defeats shingling).

    Exactness: frequencies are ratios of exact integers cast once;
    per-word means, variances and per-pair Delta all fold as ORDERED
    cumulative windows over BOUNDED frames (sources, top-10 words,
    |sources|² pairs — never corpus-sized floats); zero-variance
    words (identical rational frequency everywhere ⇒ exactly-0
    accumulated variance in both engines) are excluded by the same
    rule on both sides before any division.

    Scale shape: one tokenize pass feeds the top-10 window and the
    (source, word) rollup; everything after is arithmetic on
    ≤ |sources|·10-row frames."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(words(F.col("text"))).alias("w")
    ).localCheckpoint(eager=True)
    mfw = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("w")))
            .alias("rn"),
        )
        .filter(F.col("rn") <= 10)
        .select("w")
    )
    st = toks.groupBy("source").agg(F.count("*").cast("bigint").alias("t"))
    sw = (
        toks.join(F.broadcast(mfw), "w")
        .groupBy("source", "w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    fr = (
        st.crossJoin(F.broadcast(mfw))
        .join(sw, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0)).cast("double")
                / F.col("t").cast("double")
            ).alias("f"),
        )
        .localCheckpoint(eager=True)
    )
    w_cum = (
        Window.partitionBy("w")
        .orderBy("source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_last = Window.partitionBy("w").orderBy(F.desc("source"))
    mu = (
        fr.select(
            "w",
            F.sum("f").over(w_cum).alias("acc"),
            F.count("*").over(w_cum).alias("s"),
            F.row_number().over(w_last).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("w", (F.col("acc") / F.col("s")).alias("mu"), "s")
    )
    var_f = (
        fr.join(F.broadcast(mu), "w")
        .select(
            "w",
            "s",
            F.sum((F.col("f") - F.col("mu")) * (F.col("f") - F.col("mu")))
            .over(w_cum)
            .alias("vacc"),
            F.row_number().over(w_last).alias("rn"),
        )
        .filter((F.col("rn") == 1) & (F.col("vacc") > 0))
    )
    sig = var_f.select(
        "w", F.sqrt(F.col("vacc") / F.col("s")).alias("sigma")
    )
    z = fr.join(F.broadcast(mu), "w").join(F.broadcast(sig), "w").select(
        "source", "w", ((F.col("f") - F.col("mu")) / F.col("sigma")).alias("z")
    )
    a = z.select(F.col("source").alias("source_a"), "w", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "w", F.col("z").alias("zb"))
    pairs = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .select(
            "source_a", "source_b", "w", F.abs(F.col("za") - F.col("zb")).alias("dz")
        )
    )
    w_p = (
        Window.partitionBy("source_a", "source_b")
        .orderBy("w")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_pl = Window.partitionBy("source_a", "source_b").orderBy(F.desc("w"))
    fold = pairs.select(
        "source_a",
        "source_b",
        F.sum("dz").over(w_p).alias("acc"),
        F.count("*").over(w_p).alias("m"),
        F.row_number().over(w_pl).alias("rn"),
    ).filter(F.col("rn") == 1)
    return fold.select(
        "source_a",
        "source_b",
        F.col("m").cast("bigint").alias("n_words"),
        F.round(F.col("acc") / F.col("m"), 6).alias("delta"),
    )


@query(
    "gini_mean_difference",
    """
    WITH o AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    v AS (
      SELECT grp, x, CAST(count(*) AS BIGINT) AS c
      FROM o GROUP BY grp, x
    ),
    cum AS (
      SELECT grp, x, c,
             CAST(coalesce(sum(c) OVER (PARTITION BY grp ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS c_lt,
             CAST(coalesce(sum(CAST(x AS HUGEINT) * c) OVER (
               PARTITION BY grp ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS HUGEINT) AS s_lt
      FROM v
    ),
    g AS (
      SELECT grp,
             CAST(sum(c) AS BIGINT) AS n,
             sum(CAST(x AS HUGEINT) * c) AS s,
             sum(CAST(x AS HUGEINT) * c * c_lt - c * s_lt) AS cross_sum
      FROM cum GROUP BY grp
    )
    SELECT grp AS priority, n,
           CASE WHEN n > 1
                THEN round(2 * CAST(cross_sum AS DOUBLE)
                           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)),
                           6)
           END AS gmd_cents,
           CASE WHEN n > 1 AND s > 0
                THEN round(CAST(cross_sum AS DOUBLE)
                           / ((CAST(n AS DOUBLE) - 1) * CAST(s AS DOUBLE)),
                           6)
           END AS gini
    FROM g
    """,
)
def gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference (and the Gini coefficient it implies) of
    order value per priority — the PAIRWISE-dispersion member of the
    robust family (stddev squares outliers in, MAD ignores shape
    between quartiles; GMD = E|X−X'| weighs every pair once and
    Gini = GMD/2μ is its scale-free form — here per priority,
    complementing revenue_gini's customer-level Lorenz read).

    Exactness: the O(n²) pairwise sum collapses to the exact sorted
    identity Σ_{i<j}|x_i−x_j| = Σ_v [x_v·c_v·C_lt − c_v·S_lt] over
    the distinct-value frame (two cumulative windows, all integers
    on HUGEINT/DECIMAL(38,0)); GMD and Gini are one guarded double
    division each (n > 1, S > 0 — a single order has no pairs).

    Scale shape: one hash-agg to distinct (priority, cents), two
    windows partitioned by priority over that frame — the
    mann_whitney/kruskal exchange, never an all-pairs join."""
    orders = load(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    o = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    v = o.groupBy("grp", "x").agg(F.count("*").cast("bigint").alias("c"))
    w_lt = (
        Window.partitionBy("grp")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = v.select(
        "grp",
        "x",
        "c",
        F.coalesce(F.sum("c").over(w_lt), F.lit(0)).cast("bigint").alias("c_lt"),
        F.coalesce(
            F.sum(F.col("x").cast(d38) * F.col("c")).over(w_lt),
            F.lit(0).cast(d38),
        ).alias("s_lt"),
    )
    g = cum.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("x").cast(d38) * F.col("c")).alias("s"),
        F.sum(
            F.col("x").cast(d38) * F.col("c") * F.col("c_lt")
            - F.col("c") * F.col("s_lt")
        ).alias("cross_sum"),
    )
    nd = F.col("n").cast("double")
    return g.select(
        F.col("grp").alias("priority"),
        "n",
        F.when(
            F.col("n") > 1,
            F.round(2 * F.col("cross_sum").cast("double") / (nd * (nd - 1)), 6),
        ).alias("gmd_cents"),
        F.when(
            (F.col("n") > 1) & (F.col("s") > 0),
            F.round(
                F.col("cross_sum").cast("double")
                / ((nd - 1) * F.col("s").cast("double")),
                6,
            ),
        ).alias("gini"),
    )


@query(
    "dominant_cycle_detect",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT l.k,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.n) AS BIGINT) AS sx,
             CAST(sum(b.n) AS BIGINT) AS sy,
             CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
             CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
             CAST(sum(b.n * b.n) AS BIGINT) AS syy
      FROM (SELECT unnest(range(2, 15)) AS k) l
      JOIN d a ON true
      JOIN d b ON b.day = a.day + l.k
      GROUP BY l.k
    ),
    rho AS (
      SELECT k, n_pairs,
             (n_pairs * sxy - sx * sy)
               / sqrt((n_pairs * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * sx)
                      * (n_pairs * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * sy)) AS r
      FROM lagged
      WHERE n_pairs * sxx - sx * sx > 0
        AND n_pairs * syy - sy * sy > 0
    ),
    best AS (
      SELECT k, n_pairs, r,
             row_number() OVER (ORDER BY r DESC, k) AS rn
      FROM rho
    )
    SELECT CAST(k AS BIGINT) AS dominant_lag_days, n_pairs,
           round(r, 6) AS rho, k = 7 AS weekly
    FROM best WHERE rn = 1
    """,
)
def dominant_cycle_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-cycle detection on the daily event series: the lag in
    2..14 days with the HIGHEST calendar-aligned autocorrelation —
    the 'which period?' answer after ljung_box says 'some serial
    structure exists' (a portmanteau can't name the cycle; staffing
    and anomaly baselines need the number, and weekly=true is the
    expected corpus answer a pipeline asserts on).

    Exactness: per-lag Pearson over exact integer moment sums on
    calendar-consecutive pairs (ljung_box's machinery widened to lags
    2..14), degenerate lags excluded by the exact integer variance
    witnesses BEFORE any division; the argmax orders identical IEEE
    doubles (bit-equal both engines) with the shorter lag as
    tiebreak. A constant or too-short series excludes every lag and
    returns an empty result in both engines.

    Scale shape: one daily rollup, a 13-lag × day-frame join keyed on
    the calendar (bounded), a 13-row argmax window."""
    ev = load(spark, sf_dir, "events")
    d = (
        ev.select(
            (ntz_epoch_ms(F.col("ts")) / F.lit(86400000))
            .cast("bigint")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    ks = spark.range(2, 15).select(F.col("id").cast("int").alias("k"))
    a = d.select(F.col("day").alias("da"), F.col("n").alias("na"))
    b = d.select(F.col("day").alias("db"), F.col("n").alias("nb"))
    lagged = (
        ks.crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("na").cast("bigint").alias("sx"),
            F.sum("nb").cast("bigint").alias("sy"),
            F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("sxy"),
            F.sum(F.col("na") * F.col("na")).cast("bigint").alias("sxx"),
            F.sum(F.col("nb") * F.col("nb")).cast("bigint").alias("syy"),
        )
    )
    vx = F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")
    r = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (
            F.col("n_pairs") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (
            F.col("n_pairs") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    rho = lagged.filter((vx > 0) & (vy > 0)).select(
        "k", "n_pairs", r.alias("r")
    )
    best = rho.select(
        "k",
        "n_pairs",
        "r",
        F.row_number().over(Window.orderBy(F.desc("r"), F.asc("k"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("k").cast("bigint").alias("dominant_lag_days"),
        "n_pairs",
        F.round(F.col("r"), 6).alias("rho"),
        (F.col("k") == 7).alias("weekly"),
    )


@query(
    "segment_migration_matrix",
    """
    WITH spans AS (
      SELECT (min(epoch_ms(o_orderdate) // 86400000)
              + max(epoch_ms(o_orderdate) // 86400000) + 1) // 2 AS mid
      FROM orders
    ),
    halves AS (
      SELECT o_custkey,
             CASE WHEN epoch_ms(o_orderdate) // 86400000
                       >= (SELECT mid FROM spans)
                  THEN 1 ELSE 0 END AS half,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    spend AS (
      SELECT o_custkey, half,
             CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT) AS s
      FROM halves GROUP BY 1, 2
    ),
    terc AS (
      SELECT o_custkey, half,
             CAST(ntile(3) OVER (PARTITION BY half
                                 ORDER BY s, o_custkey) AS BIGINT) AS t
      FROM spend
    )
    SELECT a.t AS tercile_from, b.t AS tercile_to,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM terc a JOIN terc b
      ON a.o_custkey = b.o_custkey AND a.half = 0 AND b.half = 1
    GROUP BY 1, 2
    """,
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration matrix: spend terciles in the
    first half of the observation window vs the second (the 3×3
    'did our best customers stay our best customers' transition
    table behind churn-risk and upsell targeting — cohort_retention
    tracks presence, this tracks RANK movement; a heavy 3→1 cell is
    the early-warning revenue_gini only shows after the fact).

    Exactness: the window midpoint is the exact integer ceil-day
    (difference_in_differences' law); per-half spend sums are exact
    integers; tercile assignment is ntile over the (spend, custkey)
    TOTAL order — byte-identical buckets in both engines
    (lorenz_revenue_deciles' pinned convention); the matrix counts
    only customers active in BOTH halves (one self-join on the
    customer key).

    Scale shape: one fact rollup to (customer, half), two ntile
    windows partitioned by half, one customer-keyed join to the
    ≤ 9-row matrix."""
    orders = load(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    day = (ntz_epoch_ms(F.col("o_orderdate")) / F.lit(86400000)).cast("bigint")
    with_day = orders.select(
        "o_custkey",
        day.alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    spans = with_day.agg(
        ((F.min("day") + F.max("day") + 1) / 2).cast("bigint").alias("mid")
    )
    halves = with_day.crossJoin(F.broadcast(spans)).select(
        "o_custkey",
        F.when(F.col("day") >= F.col("mid"), 1).otherwise(0).alias("half"),
        "cents",
    )
    spend = halves.groupBy("o_custkey", "half").agg(
        F.sum(F.col("cents").cast(d38)).cast("bigint").alias("s")
    )
    terc = spend.select(
        "o_custkey",
        "half",
        F.ntile(3)
        .over(Window.partitionBy("half").orderBy("s", "o_custkey"))
        .cast("bigint")
        .alias("t"),
    )
    a = terc.filter(F.col("half") == 0).select(
        "o_custkey", F.col("t").alias("tercile_from")
    )
    b = terc.filter(F.col("half") == 1).select(
        "o_custkey", F.col("t").alias("tercile_to")
    )
    return (
        a.join(b, "o_custkey")
        .groupBy("tercile_from", "tercile_to")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


@query(
    "woe_information_value",
    """
    WITH e AS (
      SELECT CAST((epoch_ms(ts) % 86400000) // 3600000 AS BIGINT) AS hr,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
      FROM events
    ),
    g AS (
      SELECT hr, CAST(sum(good) AS BIGINT) AS gi,
             CAST(sum(1 - good) AS BIGINT) AS bi
      FROM e GROUP BY hr
    ),
    tot AS (
      SELECT CAST(sum(gi) AS BIGINT) AS gt, CAST(sum(bi) AS BIGINT) AS bt
      FROM g
    ),
    woe AS (
      SELECT g.hr, g.gi, g.bi, tot.gt, tot.bt,
             CASE WHEN g.gi > 0 AND g.bi > 0 AND tot.gt > 0 AND tot.bt > 0
                  THEN ln((CAST(g.gi AS DOUBLE) * tot.bt)
                          / (CAST(g.bi AS DOUBLE) * tot.gt))
             END AS w
      FROM g CROSS JOIN tot
    ),
    iv_f AS (
      SELECT sum(CASE WHEN w IS NOT NULL
                      THEN (CAST(gi AS DOUBLE) * bt - CAST(bi AS DOUBLE) * gt)
                           / (CAST(gt AS DOUBLE) * bt) * w END)
               OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS iv,
             sum(CASE WHEN w IS NOT NULL THEN 1 ELSE 0 END)
               OVER (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS used,
             row_number() OVER (ORDER BY hr DESC) AS rn
      FROM woe
    )
    SELECT woe.hr AS hour, woe.gi AS n_purchase, woe.bi AS n_other,
           round(woe.w, 6) AS woe,
           round(iv_f.iv, 6) AS information_value,
           CAST(iv_f.used AS BIGINT) AS iv_bins_used
    FROM woe CROSS JOIN iv_f WHERE iv_f.rn = 1
    """,
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning + information value of hour-of-day
    for predicting purchases — the credit-scoring feature-screening
    operator (WoE is the log-odds encoding a scorecard feeds its
    regression; IV = Σ(g%−b%)·WoE is the keep/drop number: < 0.02
    useless, > 0.3 strong). Completes the feature-evaluation family
    (info_gain is entropy-based and symmetric; WoE/IV is the
    odds-based, direction-carrying form modelers actually encode
    with).

    Exactness: bin counts and margins are exact integers; WoE is one
    guarded log of an integer ratio (bins with zero goods OR zero
    bads are excluded by exact witnesses on both sides — the
    standard practice — and reported NULL with the used-bin count
    alongside); the IV folds as an ORDERED cumulative window over
    the 24-row hour frame and rides every row for a one-result
    read.

    Scale shape: one map-side conditional agg to 24 rows; all else
    is arithmetic on that frame."""
    ev = load(spark, sf_dir, "events")
    hr = ((ntz_epoch_ms(F.col("ts")) % 86400000) / F.lit(3600000)).cast(
        "bigint"
    )
    e = ev.select(
        hr.alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("good"),
    )
    g = e.groupBy("hr").agg(
        F.sum("good").cast("bigint").alias("gi"),
        F.sum(1 - F.col("good")).cast("bigint").alias("bi"),
    )
    tot = g.agg(
        F.sum("gi").cast("bigint").alias("gt"),
        F.sum("bi").cast("bigint").alias("bt"),
    )
    ok = (
        (F.col("gi") > 0)
        & (F.col("bi") > 0)
        & (F.col("gt") > 0)
        & (F.col("bt") > 0)
    )
    w = F.log(
        (F.col("gi").cast("double") * F.col("bt"))
        / (F.col("bi").cast("double") * F.col("gt"))
    )
    woe = g.crossJoin(F.broadcast(tot)).select(
        "hr", "gi", "bi", "gt", "bt", F.when(ok, w).alias("w")
    )
    term = (
        (F.col("gi").cast("double") * F.col("bt") - F.col("bi").cast("double") * F.col("gt"))
        / (F.col("gt").cast("double") * F.col("bt"))
        * F.col("w")
    )
    w_cum = Window.orderBy("hr").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    iv_f = woe.select(
        F.sum(F.when(F.col("w").isNotNull(), term)).over(w_cum).alias("iv"),
        F.sum(F.when(F.col("w").isNotNull(), 1).otherwise(0))
        .over(w_cum)
        .alias("used"),
        F.row_number().over(Window.orderBy(F.desc("hr"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    return woe.crossJoin(F.broadcast(iv_f)).select(
        F.col("hr").alias("hour"),
        F.col("gi").alias("n_purchase"),
        F.col("bi").alias("n_other"),
        F.round(F.col("w"), 6).alias("woe"),
        F.round(F.col("iv"), 6).alias("information_value"),
        F.col("used").cast("bigint").alias("iv_bins_used"),
    )


@query(
    "cumulative_gains_curve",
    """
    WITH s AS (
      SELECT doc_id, n_chars AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS decile
      FROM documents
    ),
    g AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS pos
      FROM s GROUP BY decile
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(pos) AS BIGINT) AS pt
      FROM g
    ),
    c AS (
      SELECT g.decile, g.n, g.pos,
             CAST(sum(g.n) OVER (ORDER BY g.decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(sum(g.pos) OVER (ORDER BY g.decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_pos
      FROM g
    )
    SELECT c.decile, c.n, c.pos, c.cum_pos,
           CASE WHEN tot.pt > 0
                THEN c.cum_pos * 1000 // tot.pt END AS gain_permille,
           CASE WHEN tot.pt > 0 AND c.cum_n > 0
                THEN (c.cum_pos * tot.nt * 1000)
                     // (CAST(tot.pt AS HUGEINT) * c.cum_n)
           END AS cum_lift_permille
    FROM c CROSS JOIN tot
    """,
)
def cumulative_gains_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift-chart deciles for the length→is-English
    scorer — the targeting-economics read that completes the
    model-eval family (score_auc summarizes ranking in one number,
    calibration_bins checks probability honesty; the gains curve
    answers the operational question 'if we only act on the top k%,
    what fraction of positives do we capture and at what lift?').

    Exactness: deciles are ntile over the (score DESC, doc_id) TOTAL
    order (byte-identical buckets — the E45/E89 convention, ties
    broken by id so equal scores split deterministically); per-decile
    counts, cumulative captures and the floored permille gain/lift
    ratios are exact integers end-to-end (the lift numerator rides
    HUGEINT/DECIMAL(38,0)). Division guarded on a positives-free or
    empty corpus.

    Scale shape: one global ntile window (a TOTAL sort — at 10^10
    rows swap for range-partitioned bucketing by pre-computed score
    quantiles, same downstream frame), one 10-row rollup, one
    cumulative window on 10 rows."""
    docs = load(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    s = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        F.ntile(10)
        .over(Window.orderBy(F.desc("n_chars"), F.asc("doc_id")))
        .cast("bigint")
        .alias("decile"),
    )
    g = s.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("pt"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "decile",
        "n",
        "pos",
        F.sum("n").over(w_cum).cast("bigint").alias("cum_n"),
        F.sum("pos").over(w_cum).cast("bigint").alias("cum_pos"),
    )
    return c.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n",
        "pos",
        "cum_pos",
        F.when(F.col("pt") > 0, F.expr("cum_pos * 1000 div pt")).alias(
            "gain_permille"
        ),
        F.when(
            (F.col("pt") > 0) & (F.col("cum_n") > 0),
            F.expr(
                "CAST((CAST(cum_pos AS DECIMAL(38,0)) * nt * 1000) div "
                "(CAST(pt AS DECIMAL(38,0)) * cum_n) AS BIGINT)"
            ),
        ).alias("cum_lift_permille"),
    )


@query(
    "cramer_von_mises",
    """
    WITH o AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS a,
             CAST(round(o_totalprice * 100) AS BIGINT) AS x
      FROM orders
    ),
    v AS (
      SELECT x,
             CAST(sum(a) AS BIGINT) AS ca,
             CAST(sum(1 - a) AS BIGINT) AS cb
      FROM o GROUP BY x
    ),
    tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2
      FROM v
    ),
    c AS (
      SELECT x, ca, cb,
             CAST(sum(ca) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS f1,
             CAST(sum(cb) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS f2
      FROM v
    ),
    u AS (
      SELECT tot.n1, tot.n2,
             sum((CAST(c.f1 AS HUGEINT) * tot.n2
                  - CAST(c.f2 AS HUGEINT) * tot.n1)
                 * (CAST(c.f1 AS HUGEINT) * tot.n2
                    - CAST(c.f2 AS HUGEINT) * tot.n1)
                 * (c.ca + c.cb)) AS num
      FROM c CROSS JOIN tot
      GROUP BY tot.n1, tot.n2
    )
    SELECT n1, n2,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round(CAST(num AS DOUBLE)
                           / (CAST(n1 AS DOUBLE) * n2
                              * (CAST(n1 AS DOUBLE) + n2)
                              * (CAST(n1 AS DOUBLE) + n2)), 6)
           END AS t_stat,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN CAST(num AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * n2
                        * (CAST(n1 AS DOUBLE) + n2)
                        * (CAST(n1 AS DOUBLE) + n2)) > 0.461
           END AS distributions_differ
    FROM u
    """,
)
def cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises test (urgent vs rest on order
    value) — the INTEGRATED-distance member completing the
    distribution-comparison trio (KS reacts to the single worst ECDF
    gap; Mann-Whitney to rank shift; CvM integrates the squared gap
    over the whole pooled sample, catching spread/shape differences a
    matched-median KS misses): T = Σ_pooled (F₁−F₂)²·w / (n₁n₂N²)
    with w = pooled multiplicity at each distinct value.

    Exactness: the ECDF gap at each distinct value is the exact
    integer cross-difference f₁·n₂ − f₂·n₁ (cumulative windows over
    the distinct-value frame — KS's machinery, squared and summed
    instead of maxed); the numerator Σ(f₁n₂−f₂n₁)²·(c₁+c₂) rides
    HUGEINT/DECIMAL(38,0) (≈10^26 at sf0.1) and T is ONE guarded
    double division. The 0.461 large-sample 5% critical value is the
    standard CvM table constant; empty cohorts report NULL.

    Scale shape: one hash-agg to distinct values, one cumulative
    window, one 1-row rollup — identical footprint to ks_two_sample."""
    orders = load(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    o = orders.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("a"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
    )
    v = o.groupBy("x").agg(
        F.sum("a").cast("bigint").alias("ca"),
        F.sum(1 - F.col("a")).cast("bigint").alias("cb"),
    )
    tot = v.agg(
        F.sum("ca").cast("bigint").alias("n1"),
        F.sum("cb").cast("bigint").alias("n2"),
    )
    w_cum = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = v.select(
        "x",
        "ca",
        "cb",
        F.sum("ca").over(w_cum).cast("bigint").alias("f1"),
        F.sum("cb").over(w_cum).cast("bigint").alias("f2"),
    )
    diff = F.col("f1").cast(d38) * F.col("n2") - F.col("f2").cast(d38) * F.col(
        "n1"
    )
    u = (
        c.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.sum(diff * diff * (F.col("ca") + F.col("cb"))).alias("num"))
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    t = F.col("num").cast("double") / (
        n1d * F.col("n2") * (n1d + F.col("n2")) * (n1d + F.col("n2"))
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return u.select(
        "n1",
        "n2",
        F.when(ok, F.round(t, 6)).alias("t_stat"),
        F.when(ok, t > 0.461).alias("distributions_differ"),
    )


@query(
    "lead_lag_xcorr",
    """
    WITH d AS (
      SELECT epoch_ms(ts) // 86400000 AS day,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS p
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT l.k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.c) AS BIGINT) AS sx,
             CAST(sum(b.p) AS BIGINT) AS sy,
             CAST(sum(a.c * b.p) AS BIGINT) AS sxy,
             CAST(sum(a.c * a.c) AS BIGINT) AS sxx,
             CAST(sum(b.p * b.p) AS BIGINT) AS syy
      FROM (SELECT unnest(range(-7, 8)) AS k) l
      JOIN d a ON true
      JOIN d b ON b.day = a.day + l.k
      GROUP BY l.k
    ),
    rho AS (
      SELECT k, n,
             (n * sxy - sx * sy)
               / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                      * (n * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * sy)) AS r
      FROM lagged
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ),
    best AS (
      SELECT k, n, r, row_number() OVER (ORDER BY r DESC, k) AS rn
      FROM rho
    )
    SELECT CAST(k AS BIGINT) AS best_lag_days, n AS n_pairs,
           round(r, 6) AS rho,
           k > 0 AS clicks_lead
    FROM best WHERE rn = 1
    """,
)
def lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily click and purchase
    volume over lags −7..+7 — the 'which series LEADS, and by how
    many days?' operator (event_type_correlation reports same-day
    co-movement; a positive best lag here means clicks predict
    purchases k days out, the number a demand-forecast feature
    actually encodes; negative would mean purchases lead, i.e. the
    funnel intuition is wrong for this corpus).

    Exactness: per-lag Pearson on exact integer moment sums over
    calendar-aligned day pairs (dominant_cycle_detect's machinery
    pointed across two series), degenerate lags excluded by exact
    integer variance witnesses before any division, argmax over
    bit-identical doubles with the smaller lag as tiebreak.

    Scale shape: one daily two-counter rollup, a 15-lag ×
    calendar-bounded join, a 15-row argmax window."""
    ev = load(spark, sf_dir, "events")
    d = (
        ev.select(
            (ntz_epoch_ms(F.col("ts")) / F.lit(86400000))
            .cast("bigint")
            .alias("day"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("ic"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("ip"),
        )
        .groupBy("day")
        .agg(
            F.sum("ic").cast("bigint").alias("c"),
            F.sum("ip").cast("bigint").alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    ks = spark.range(-7, 8).select(F.col("id").cast("int").alias("k"))
    a = d.select(F.col("day").alias("da"), F.col("c").alias("xa"))
    b = d.select(F.col("day").alias("db"), F.col("p").alias("yb"))
    lagged = (
        ks.crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("xa").cast("bigint").alias("sx"),
            F.sum("yb").cast("bigint").alias("sy"),
            F.sum(F.col("xa") * F.col("yb")).cast("bigint").alias("sxy"),
            F.sum(F.col("xa") * F.col("xa")).cast("bigint").alias("sxx"),
            F.sum(F.col("yb") * F.col("yb")).cast("bigint").alias("syy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (
            F.col("n") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx")
        )
        * (
            F.col("n") * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy")
        )
    )
    rho = lagged.filter((vx > 0) & (vy > 0)).select("k", "n", r.alias("r"))
    best = rho.select(
        "k",
        "n",
        "r",
        F.row_number().over(Window.orderBy(F.desc("r"), F.asc("k"))).alias("rn"),
    ).filter(F.col("rn") == 1)
    return best.select(
        F.col("k").cast("bigint").alias("best_lag_days"),
        F.col("n").alias("n_pairs"),
        F.round(F.col("r"), 6).alias("rho"),
        (F.col("k") > 0).alias("clicks_lead"),
    )
