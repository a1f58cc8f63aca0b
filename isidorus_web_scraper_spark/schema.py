"""Canonical schemas for every table in the engine.

Spark renditions of the reference's five stores (SURVEY.md §1.3):
SQS message structs (`workers/scraper/domain/models.go:4-43`), the
Postgres DDL (`infra/postgres/init.sql:1-40`), the DynamoDB job item
(`api/services/scraper_service.py:65-74`), the OpenSearch doc shape
(`workers/indexer/repositories/opensearch_repository.go:24-31`), and the
Redis visited set (`workers/scraper/domain/constants.go:4-6`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- the simulated web: interleaved text+media spans (BASELINE input_hint) ---
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # 'text' | 'link' | 'image'
        T.StructField("text", T.StringType(), True),        # set for kind='text'
        T.StructField("media_ref", T.StringType(), True),   # href/src verbatim for link/image
        T.StructField("offset", T.IntegerType(), False),    # 0-based document order
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),     # the page URL
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# --- frontier round (SQS ScrapeMessage, models.go:4-9) ---
FRONTIER = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),     # remaining-depth budget
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- seen set (Redis scrape:{id}:visited) ---
SEEN = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),        # RAW url string = identity (ref has no canonicalization)
        T.StructField("url_hash", T.LongType(), False),     # xxhash64(canonical) for partitioning/bloom only
        T.StructField("first_depth", T.IntegerType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- crawls (scrapings table, init.sql:1-5) ---
CRAWLS = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

# --- pages (scraped_pages, init.sql:7-13) ---
PAGES = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("content", T.StringType(), True),     # ≤100KB text (scraper_service.go:149-155)
        T.StructField("summary", T.StringType(), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- links adjacency list (page_links, init.sql:32-37) — ALL hrefs, incl. relative ---
LINKS = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("source_url", T.StringType(), False),
        T.StructField("target_url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- images (page_images, init.sql:23-30) ---
IMAGES = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("page_url", T.StringType(), False),
        T.StructField("image_url", T.StringType(), False),
        T.StructField("explanation", T.StringType(), True),
        T.StructField("s3_path", T.StringType(), True),     # deterministic content-hash key
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- jobs (DynamoDB scraping_jobs item) ---
JOBS = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),     # PENDING | COMPLETED (writer/domain/constants.go:5-6)
        T.StructField("links_count", T.LongType(), False),
        T.StructField("created_round", T.IntegerType(), False),
        T.StructField("completed_round", T.IntegerType(), True),
    ]
)

# --- full-text index (OpenSearch scraped_pages doc, opensearch_repository.go:24-31) ---
INDEX_DOCS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- fetch log (error path of page_fetcher.go:14-20 / scraper_service.go:117-127) ---
FETCH_LOG = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("status", T.IntegerType(), False),    # 200 | 404 (doc missing)
        T.StructField("error", T.StringType(), True),
    ]
)

# --- politeness config (north_rule addition; no reference analog) ---
POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("max_fetches_per_round", T.IntegerType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("robots_allow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_rounds", T.IntegerType(), False),
    ]
)

# --- per-round, per-partition lineage metrics (north_rule) ---
METRICS = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("urls_in", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("fetch_errors", T.LongType(), False),
        T.StructField("links_extracted", T.LongType(), False),
        T.StructField("new_urls", T.LongType(), False),
        T.StructField("deferred", T.LongType(), False),
        T.StructField("robots_blocked", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# per-PARTITION lineage rows (CrawlConfig.per_partition_metrics): one
# row per task partition of a round's parsed frame; partition sums tie
# out to that round's METRICS row (fetched/fetch_errors/links_extracted;
# attempted = fetched + fetch_errors).
METRICS_PARTS = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("attempted", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("fetch_errors", T.LongType(), False),
        T.StructField("links_extracted", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# --- media store (S3 blob sink, s3_repository.go / extractor_service.go:65-75) ---
# robots.txt payloads discovered by the crawl itself (north_rule robots
# mandate; no reference analog — page_fetcher.go has no robots handling).
# One row per host probed; robots_txt NULL = probe 404'd (recorded so the
# host is never re-probed).
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("robots_txt", T.StringType(), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# parsed *-section rules per host (functions/robots.py), appended
# incrementally alongside the raw payloads: the scheduler's config read
# is a plain table scan, not a per-round reparse of every robots file
# ever fetched.
ROBOTS_RULES = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("max_fetches_per_round", T.IntegerType(), True),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("robots_allow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_rounds", T.IntegerType(), True),
        T.StructField("round", T.IntegerType(), False),
    ]
)

MEDIA_STORE = T.StructType(
    [
        T.StructField("scraping_id", T.LongType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("s3_path", T.StringType(), False),    # {scraping_id}/{sha2(ref)}.{ext}
        T.StructField("content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes (multimodal column)
    ]
)

# WARC archive sink (CrawlConfig.archive_warc): one archive file per
# row of a binary column + the byte-offset CDX that random-accesses it
WARC_STORE = T.StructType(
    [
        T.StructField("warc_file", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

WARC_CDX = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_file", T.LongType(), False),
        T.StructField("digest", T.StringType(), True),
        T.StructField("rec_offset", T.LongType(), False),
        T.StructField("rec_length", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

# Warehouse table registry: name -> (schema, partition columns)
TABLES: dict[str, tuple[T.StructType, list[str]]] = {
    "documents": (DOCUMENTS, []),
    "frontier": (FRONTIER, ["round"]),
    "seen": (SEEN, []),
    "crawls": (CRAWLS, []),
    "pages": (PAGES, ["round"]),
    "links": (LINKS, ["round"]),
    "images": (IMAGES, ["round"]),
    "jobs": (JOBS, []),
    "index_docs": (INDEX_DOCS, ["round"]),
    "fetch_log": (FETCH_LOG, ["round"]),
    "politeness": (POLITENESS, []),
    "robots": (ROBOTS, ["round"]),
    "robots_rules": (ROBOTS_RULES, ["round"]),
    "metrics": (METRICS, []),
    "metrics_parts": (METRICS_PARTS, ["round"]),
    "media_store": (MEDIA_STORE, []),
    "warc_store": (WARC_STORE, ["round"]),
    "warc_cdx": (WARC_CDX, ["round"]),
}
