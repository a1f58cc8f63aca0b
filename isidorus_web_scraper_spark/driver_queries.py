"""Driver-contract queries: Spark rendition + DuckDB oracle SQL per operator.

Each entry renders one operator class from SURVEY.md §2 over the
/root/testdata tables so the driver can verify it against DuckDB at
sf=0.01 (CORRECTNESS gate). The crawl loop itself is exercised on the
span-structured corpus in tests/; here each of its constituent operators
(fetch-join, seen anti-join, first-wins dedup, window top-1, counts,
search, assembly, BFS reachability) is expressed over the flat tables.

Conventions (driver compare = row-count + schema + value-hash on
name-sorted columns):
- every computed column is aliased identically in Spark and SQL;
- money aggregates go through DECIMAL(18,2) (double sums can differ in
  the last ulp between engines);
- every query has a deterministic total ORDER-insensitive result set
  (the driver sorts), but LIMIT queries order by a unique key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources.testdata import load

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, sql: str | None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: crawl-shaped aggregation over the documents corpus
# (per-source stats — the observability rollup of SURVEY.md §2.4/A2).
# ---------------------------------------------------------------------------
@query(
    "flagship_doc_stats",
    """
    SELECT source,
           count(*) AS n_docs,
           sum(n_chars) AS total_chars,
           count(DISTINCT lang) AS n_langs,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY source
    """,
)
def flagship_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# J1 fetch-join: frontier ⋈ documents on doc id; missing doc = fetch error
# (page_fetcher.go:14-20 / scraper_service.go:117-127). Frontier is a
# deterministic synthetic round: every 7th doc id plus ids beyond the
# corpus (the 404 path). Broadcast of the small frontier side.
# ---------------------------------------------------------------------------
@query(
    "fetch_join",
    """
    WITH n AS (SELECT count(*) AS n FROM documents),
    frontier AS (
      SELECT (i * 7) % (2 * (SELECT n FROM n)) AS url_id, 2 AS depth
      FROM (SELECT unnest(range(200)) AS i)
    )
    SELECT f.url_id,
           CASE WHEN d.doc_id IS NULL THEN 404 ELSE 200 END AS status,
           coalesce(d.n_chars, 0) AS n_chars
    FROM frontier f LEFT JOIN documents d ON f.url_id = d.doc_id
    """,
)
def fetch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    frontier = spark.range(200).select(
        ((F.col("id") * 7) % (2 * n)).alias("url_id"), F.lit(2).alias("depth")
    )
    fetched = F.broadcast(frontier).join(
        docs, frontier.url_id == docs.doc_id, "left"
    )
    return fetched.select(
        "url_id",
        F.when(F.col("doc_id").isNull(), F.lit(404)).otherwise(F.lit(200)).alias("status"),
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# J2 seen-set anti-join: candidates LEFT ANTI seen per scraping
# (Redis SAdd check-and-set, scraper_service.go:258-277). Seen = every
# 3rd doc; candidates = docs with n_chars > 200.
# ---------------------------------------------------------------------------
@query(
    "seen_antijoin",
    """
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.n_chars > 200
      AND NOT EXISTS (
        SELECT 1 FROM documents s WHERE s.doc_id % 3 = 0 AND s.doc_id = d.doc_id
      )
    """,
)
def seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    candidates = docs.filter(F.col("n_chars") > 200)
    return candidates.join(seen, "doc_id", "left_anti").select("doc_id", "source")


# ---------------------------------------------------------------------------
# Synthetic link graph over the flat documents table (deterministic):
# each doc links to (2d+1) mod n and (3d+7) mod n. Used by the dedup,
# links_count and BFS queries below so crawl-loop operators are
# DuckDB-checkable without the span corpus.
# ---------------------------------------------------------------------------
_EDGES_SQL = """
    edges AS (
      SELECT doc_id AS src, (2 * doc_id + 1) % (SELECT count(*) FROM documents) AS dst
      FROM documents
      UNION ALL
      SELECT doc_id AS src, (3 * doc_id + 7) % (SELECT count(*) FROM documents) AS dst
      FROM documents
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    e1 = docs.select(
        F.col("doc_id").alias("src"), ((2 * F.col("doc_id") + 1) % n).alias("dst")
    )
    e2 = docs.select(
        F.col("doc_id").alias("src"), ((3 * F.col("doc_id") + 7) % n).alias("dst")
    )
    return e1.unionAll(e2)


# ---------------------------------------------------------------------------
# J2 first-wins claim: one winner per discovered URL = min (src) —
# deterministic replacement for the reference's queue-race winner
# (SURVEY.md §3.1 ordering note). Aggregate, never dropDuplicates.
# ---------------------------------------------------------------------------
@query(
    "first_wins_dedup",
    f"""
    WITH {_EDGES_SQL}
    SELECT dst AS url_id, min(src) AS claimed_by, count(*) AS n_paths
    FROM edges
    GROUP BY dst
    """,
)
def first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _edges(spark, sf_dir)
        .groupBy(F.col("dst").alias("url_id"))
        .agg(F.min("src").alias("claimed_by"), F.count("*").alias("n_paths"))
    )


# ---------------------------------------------------------------------------
# A2 links_count per source page (writer_service.go:57-63 DynamoDB ADD).
# ---------------------------------------------------------------------------
@query(
    "links_count",
    f"""
    WITH {_EDGES_SQL}
    SELECT src AS page_id, count(*) AS links_count
    FROM edges GROUP BY src
    """,
)
def links_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _edges(spark, sf_dir)
        .groupBy(F.col("src").alias("page_id"))
        .agg(F.count("*").alias("links_count"))
    )


# ---------------------------------------------------------------------------
# O3/J3 latest-wins window: latest event per user
# (db_repository.go:60-63 Order("scraped_at DESC").First()).
# ---------------------------------------------------------------------------
@query(
    "latest_page_pick",
    """
    SELECT user_id, event_id AS latest_event_id, event_type AS latest_type
    FROM (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def latest_page_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("event_type").alias("latest_type"),
        )
    )


# ---------------------------------------------------------------------------
# §2.9 search: term filter over content + naive TF score
# (search_service.py:17-59; score = term frequency, not BM25 — parity
# target is the matching set, SURVEY.md §2.9).
# ---------------------------------------------------------------------------
@query(
    "search_term",
    """
    SELECT doc_id,
           len(list_filter(string_split(lower(text), ' '), x -> x = 'join')) AS tf
    FROM documents
    WHERE lower(text) LIKE '%join%'
    """,
)
def search_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.lower(F.col("text")).contains("join")).select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " ", -1), lambda x: x == F.lit("join")
            )
        ).alias("tf"),
    )


# ---------------------------------------------------------------------------
# O2 pagination: newest-first offset/limit (db_repository.py:61).
# ---------------------------------------------------------------------------
@query(
    "pagination",
    """
    SELECT doc_id, source FROM documents
    ORDER BY doc_id DESC LIMIT 25 OFFSET 50
    """,
)
def pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.orderBy(F.desc("doc_id")).select("doc_id", "source").offset(50).limit(25)


# ---------------------------------------------------------------------------
# J7 result assembly: per-source sorted list of doc urls
# (prefetch_related images → collect_list(struct), db_repository.py:80-104;
# string list here so the hash compare is engine-stable).
# ---------------------------------------------------------------------------
@query(
    "result_assembly",
    """
    SELECT source,
           count(*) AS n_pages,
           array_to_string(list_sort(array_agg(doc_id)), ',') AS page_ids
    FROM documents
    GROUP BY source
    """,
)
def result_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_pages"),
        F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias("page_ids"),
    )


# ---------------------------------------------------------------------------
# §3.1 BFS reachability to depth 3 over the synthetic edge graph — the
# crawl loop's core expressed as iterative joins (Spark) vs WITH
# RECURSIVE (DuckDB). first_depth = min hop count (BFS first-wins).
# ---------------------------------------------------------------------------
@query(
    "crawl_bfs_depth3",
    f"""
    WITH RECURSIVE {_EDGES_SQL},
    bfs(url_id, depth) AS (
      SELECT CAST(0 AS BIGINT) AS url_id, CAST(0 AS INTEGER) AS depth
      UNION ALL
      SELECT e.dst, b.depth + 1
      FROM bfs b JOIN edges e ON e.src = b.url_id
      WHERE b.depth < 3
    )
    SELECT url_id, min(depth) AS first_depth FROM bfs GROUP BY url_id
    """,
)
def crawl_bfs_depth3(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    edges.persist()
    seen = spark.createDataFrame([(0, 0)], "url_id long, first_depth int")
    frontier = seen
    for depth in range(1, 4):
        frontier = (
            frontier.join(edges, frontier.url_id == edges.src)
            .select(F.col("dst").alias("url_id"), F.lit(depth).alias("first_depth"))
            .distinct()
            .join(seen.select("url_id"), "url_id", "left_anti")
        )
        seen = seen.unionAll(frontier)
    result = seen.groupBy("url_id").agg(F.min("first_depth").alias("first_depth"))
    return result
