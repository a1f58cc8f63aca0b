"""The crawl plan: iterative BFS DataFrame rounds with atomic commits.

Spark rendition of the reference's event loop (SURVEY.md §3.1):
one round = one generation of the SQS frontier queue; the Redis pending
counter disappears (loop runs until the frontier is empty); every
round's outputs are committed atomically to the warehouse, so a killed
crawl resumes byte-identically from the last committed round.

Round pipeline (reference stage → Spark op):
  frontier_r                      SQS poll loop          warehouse read
  → robots discovery (optional)   (absent in reference)  probe new hosts, parse columnar
  → politeness gate               (absent in reference)  per-host window fn (or mapInPandas)
  → fetch                         http.Get               join vs documents / generator resolver
  → parse                         Go tokenizer walk      columnar span expressions
  → pages/links/images/index      4-queue fan-out        4 DataFrame appends
  → candidates (http*, depth>0)   filter + SAdd loop     filter + first-wins agg
  → new = anti-join seen          Redis SAdd batch       Bloom pre-filter + left-anti
  → seen += new; frontier_{r+1}   SQS sends              2 appends, commit round

With a batch ``page_fn`` (pd.Series[url] → pd.Series[spans]) the first
three stages FUSE into
one host-partitioned mapInPandas pass (politeness decision + fetch +
parse per pandas batch): one Arrow round-trip and one shuffle on the
round's critical path instead of three round-trips and two shuffles
(BENCH §9 residual). The per-host budget caps the heavy rows per host,
bounding the host-layout's skew exposure; semantics are pinned
end-state-identical to the staged path by tests/test_crawl.py.

Scale design decisions (each with its 100-TB rationale):
- fetch-join broadcasts whichever side is small (a crawl round is
  usually ≪ corpus; AQE handles the flip) and the parsed round is
  repartitioned by xxhash64(canonical url) so hot-host pages spread
  across executors (salting, SURVEY.md §4.2);
- the seen-set anti-join only shuffles Bloom-positive candidates; the
  Bloom bitmap is maintained incrementally (OR of per-round builds) —
  no full seen-table rescan per round;
- per-round warehouse writes double as lineage truncation (iterative
  loops otherwise accrete unbounded plans);
- all row-level logic is columnar or Arrow-vectorized; the engine makes
  zero per-row Python calls — page_fn's batch contract means even the
  fused fetch is one Python call per Arrow batch (what the corpus does
  inside that call is its own business: the synthetic generator derives
  pages per URL, exactly like one http.Get per URL).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.spans import content_col, images_col, links_col, location_col
from ..functions.spark_udfs import make_explain_image_udf, make_summarize_udf
from ..functions.url import url_hash_col
from ..operators.bloom import (
    BloomFilter,
    BucketedBloom,
    build_bloom,
    build_bucketed_bloom,
    prefiltered_anti_join,
)
from ..operators.politeness import (
    ACTION_DEFER,
    ACTION_FETCH,
    ACTION_ROBOTS,
    schedule_round,
)
from ..schema import FRONTIER, SEEN
from ..sources.warehouse import Warehouse


# warehouse table holding the persisted sharded seen-sketch (one row
# per shard version; bloom rows OR-fold, cuckoo rows supersede by seq)
SKETCH_TABLE = "seen_sketch"

# sketch_store='auto' flips to the warehouse-persisted sketch at this
# expected-URL sizing: the driver-resident footprint is ~17 bits/URL
# (measured, BENCH/r5_sketch_rss.json), so 2^28 expected URLs is
# ~580 MB of driver RSS — past the point where holding it in the
# driver (and re-shipping it per round) is sane on any cluster.
AUTO_WH_SKETCH_URLS = 1 << 28


@dataclass
class CrawlConfig:
    default_budget: int = 8
    use_bloom: bool = True
    bloom_expected_urls: int = 1 << 20
    bloom_fpp: float = 1e-3
    # >1 ⇒ sharded seen-sketch: one bloom per url_hash%B bucket. At
    # 10^10 URLs a single bitmap is ~2 GB (unbroadcastable); bucketing
    # keeps every bitmap shard small (operators/bloom.py scale note).
    bloom_buckets: int = 8
    # "broadcast": whole sketch rides to every task (fine while total
    # bitmap bytes fit an executor). "cogrouped": candidates cogroup
    # with a (bucket, bits) table so each task holds exactly ONE
    # shard's bitmap — the 10^10-URL apply path (requires
    # bloom_buckets > 1).
    bloom_apply: str = "broadcast"
    # "bloom" (default): OR-mergeable, distributed build. "cuckoo":
    # DELETABLE sketch (operators/cuckoo.py) — forget_scraping() evicts
    # a deleted scraping's URL fingerprints so the pre-filter doesn't
    # degrade to all-maybe-seen over many crawl/delete cycles. With
    # bloom_buckets > 1 the cuckoo shards by url_hash%B too (disjoint
    # shards ⇒ distributed rebuild + cogrouped apply — the 10^10-URL
    # deletable path); per-round incremental inserts stay driver-side
    # either way (cuckoo tables don't OR-merge).
    seen_sketch: str = "bloom"
    # "driver" (default): the sketch lives in driver memory between
    # rounds and is rebuilt from `seen` on resume. "warehouse": the
    # sharded sketch PERSISTS as the `seen_sketch` warehouse table —
    # per round the engine appends bloom delta bitmaps (OR-mergeable)
    # or updated cuckoo shards (max-seq wins) DISTRIBUTED, the flag
    # apply cogroups candidates straight with the table, and resume
    # READS the table instead of rescanning 10^10 seen rows. The driver
    # never materializes a shard: at 10^10 URLs that removes ~25 GB of
    # driver RSS and the per-round driver→executor sketch ship, the
    # last driver-side bottleneck (VERDICT r4 item 1; reference analog:
    # Redis holds the seen set out-of-process, redis_client.go:44-50).
    # Requires bloom_buckets > 1 (the table IS the shard layout).
    # "auto": resolves at engine construction — warehouse once the
    # sizing implies a GB-scale driver footprint (the measured
    # ~17 bits/URL of BENCH §17), driver below it, so the 10^10-URL
    # configuration persists out-of-process WITHOUT opting in while
    # small crawls keep the zero-I/O driver sketch.
    sketch_store: str = "driver"
    max_rounds: int = 64  # runaway bound PER run() call (counter is cumulative)
    summarizer_enabled: bool = True       # WithFeatureFlags (scraper_service.go:217-256)
    image_extractor_enabled: bool = True
    indexer_enabled: bool = True
    llm_provider: str = "mock"
    # salt/spread heavy parse rounds (staged path only; the fused path
    # keeps the host layout — the per-host budget bounds its skew)
    repartition_parsed: int | None = None
    # adaptive round sizing: small rounds run with few partitions (a
    # 200-row round on 32 shuffle partitions is pure task overhead);
    # big rounds scale back up to the cluster's parallelism
    target_rows_per_task: int = 4000
    # fetch/parse is compute-heavy (Arrow UDF + span folds): spread it
    # wider than the shuffle sizing would suggest
    target_rows_per_fetch_task: int = 512
    max_parallelism: int | None = None
    bloom_driver_insert_max: int = 200_000
    # bloom-prefilter APPLY gate: while the driver-known |seen| is below
    # this, the claims anti-join runs plain (the Arrow flag pass + its
    # cache + the two-branch union cost more than the small anti-join
    # they route around); the sketch is still MAINTAINED every round,
    # so crossing the threshold mid-crawl flips to the prefiltered path
    # with a current sketch. Scale-adaptive by construction: at 10^6+
    # seen rows the anti-join's seen-side scan/shuffle dominates and
    # the prefilter pays for itself; the warehouse-sketch path (the
    # 10^10 design) is not gated — its cogrouped apply IS its read path.
    bloom_apply_min_seen: int = 1 << 20
    # staged-path scheduler, three equivalence-tested impls:
    # "vectorized" (mapInPandas carried-counter — DEFAULT: won the
    # interleaved table-corpus A/B 4/4 trials, BENCH §16), "window"
    # (pure JVM window fn — zero Python stages in the whole round:
    # pick when Python workers are unavailable/undesirable or Arrow
    # memory is the constraint), "grouped" (applyInPandas spec). The
    # fused page_fn path always uses vectorized (the fetch needs the
    # pandas stage anyway).
    politeness_impl: str = "vectorized"
    # frontier scheduling priority WITHIN a depth level when the
    # per-host budget truncates: "depth" (default — pure BFS order,
    # first-discovered first) or "indegree" (OPIC-lite: URLs with more
    # discovered inlinks fetch first — the importance rule production
    # crawlers schedule by instead of full PageRank). Indegree comes
    # from one groupBy over the committed `links` table joined onto the
    # round's frontier; it reorders fetch-vs-defer only — the claim
    # set, depth gate, and end state of a budget-unconstrained crawl
    # are untouched (pytest-pinned). At 10^10 URLs the links rollup
    # would be kept as an incrementally-merged count table instead of
    # re-aggregated; the per-round agg is the correctness-first form.
    frontier_priority: str = "depth"
    media_store_enabled: bool = False     # S6: persist media payloads (extractor_service.go:55-107)
    # discover robots.txt from the crawl itself (north_rule mandate; the
    # reference skips robots entirely — page_fetcher.go:14-20): at the
    # START of each round, hosts newly present in the frontier get
    # http://<host>/robots.txt fetched through the SAME corpus machinery
    # (documents join / resolver / page_fn), parsed columnar
    # (functions/robots.py), persisted to the `robots` table (resume-
    # safe), and unioned into the scheduler's politeness config — a
    # pre-built `politeness` table still wins per host. Off by default
    # because the synthetic benches serve no robots files (every new
    # host would pay a pointless 404 probe); real crawls should enable.
    discover_robots: bool = False
    # maintain the posting-list search index (sources/postings.py)
    # incrementally: each round appends its fetched pages' term
    # frequencies, Hive-partitioned by (round, term_bucket) — a term
    # search probes 1/B of the index instead of scanning pages
    # (plans/api.py:search_pages_indexed). Round-partitioned so partial
    # rounds roll back by directory remove. Off by default: it adds a
    # tokenize+shuffle to every round; the scan-based search needs no
    # index.
    index_postings: bool = False
    postings_term_buckets: int = 64
    # maintain the character n-gram (substring) index incrementally too
    # (sources/postings.py build_grams — the pg_trgm analog): each round
    # appends its pages' distinct content+summary grams under the same
    # (round, term_bucket) layout, so search_pages_indexed_substring
    # serves search_pages' substring semantics from a probe and the
    # scan path becomes oracle-only. Off by default: grams are the
    # larger index (O(text bytes) before dedup).
    index_grams: bool = False
    gram_len: int = 3
    # fold completed rounds' per-round commits every K rounds (Iceberg
    # rewrite_data_files analog) — a 64-round crawl otherwise leaves
    # ~64×P files per table and every seen-table read reopens them all.
    # None disables. Periodic passes never refold prior compactions
    # (linear total I/O); _finalize does one full collapse.
    compact_every_rounds: int | None = 16
    # per-PARTITION lineage rows alongside the per-round metrics row
    # (north_rule "per-partition lineage + metrics", SURVEY §7 step 5):
    # one metrics_parts row per task partition of the round's parsed
    # frame — (partition_id, attempted, fetched, fetch_errors,
    # links_extracted, round). Computed as one extra aggregate over the
    # round's already-cached frame, submitted on the same concurrent
    # wall as every other write; partition sums tie out to the round
    # row (pytest-pinned). Off by default: round-level observability is
    # free, partition-level costs one extra job per round.
    per_partition_metrics: bool = False
    # adaptive crawl-wide backpressure: apportion ONE global per-round
    # fetch budget across the round's hosts ∝ frontier queue size
    # (exact Hamilton rule, operators/politeness.allocate_global_budget)
    # instead of the same static per-host cap everywhere. Composes with
    # robots/static politeness (min(static, allocation); robots rules
    # and crawl-delay carry through). None = off.
    global_budget: int | None = None
    # crawl-trap defense: per round, hosts whose frontier URL space
    # explodes over a handful of path templates (digit-collapsed —
    # calendars, session ids, facets) get robots_disallow=['/'] forced
    # into the config, so their rows hard-drop through the existing
    # robots machinery and the frontier drains instead of deferring
    # forever (operators/politeness.detect_trap_hosts/trap_override).
    # Off by default: the synthetic corpora's '/p<N>.html' paths
    # collapse to one template per host, so EVERY host would flag —
    # the thresholds target real URL spaces.
    detect_traps: bool = False
    trap_min_urls: int = 10
    trap_url_template_ratio: int = 8
    # per-host failure circuit breaker: a host whose TRANSIENT-error
    # (5xx) share of fetch attempts over the last error_backoff_rounds
    # rounds reaches error_backoff_threshold (with at least
    # error_backoff_min_attempts attempts — one flaky URL on a small
    # host must not trip it) gets its budget forced to 0 for this
    # round: its frontier rows DEFER (never drop) and re-schedule once
    # the trip round leaves the window — the half-open probe then
    # either succeeds or re-trips. Derived EACH ROUND from the
    # committed fetch_log (the same attempts ledger the retry cap
    # reads), so the breaker is stateless in the driver and
    # resume-safe for free; composes with retry_max_attempts (a 503'd
    # URL's retry now lands AFTER the cooldown instead of hammering
    # the struggling host next round). None = off (reference parity:
    # page_fetcher.go has no failure handling at all).
    error_backoff_threshold: float | None = None
    error_backoff_min_attempts: int = 4
    error_backoff_rounds: int = 2
    # budget grouping key: "host" (default — every hostname gets its
    # own max_fetches_per_round) or "domain" (W42 — the budget is
    # keyed by REGISTRABLE DOMAIN and Hamilton-apportioned across the
    # domain's frontier hosts ∝ eligible queue size, so a subdomain
    # farm shares ONE budget instead of minting a fresh allowance per
    # vanity subdomain; the rule production crawlers queue by —
    # BUbiNG's pay-level domain, Heritrix's authority queues). Domain
    # budgets come from config rows FLAGGED with the optional boolean
    # column domain_budget=true whose `host` is the domain string
    # (the explicit flag keeps an apex host's own row — a static
    # promise or a breaker zero — from being reinterpreted as the
    # whole farm's cap); default_budget applies PER DOMAIN otherwise.
    # Unflagged host rows still bound their own hosts
    # (min(host, allocation)); robots and
    # crawl-delay stay host-scoped as RFC 9309 scopes them. The
    # registrable domain is the host's last `domain_labels` labels
    # (functions/url.domain_col — a PSL stand-in, no suffix data in
    # this environment).
    budget_scope: str = "host"
    domain_labels: int = 2
    # transient-failure retry: a failed fetch re-enters the NEXT round's
    # frontier (riding the deferred branch — no re-claim, no schema
    # change) until the URL has been attempted retry_max_attempts times
    # TOTAL; the committed fetch_log is the attempts ledger, so the cap
    # survives resume for free. 0 = off (reference parity:
    # page_fetcher.go drops failures permanently). Termination: every
    # failed attempt adds a ledger row, so a permanently-dead URL stops
    # after the cap.
    retry_max_attempts: int = 0
    # follow 301s: a fetch that answers with a redirect span (see
    # corpus.page_spans(redirects=True)) logs status=301 and its
    # Location re-enters the claims pipeline at the SAME depth (the
    # target IS this fetch, not a deeper hop) — it anti-joins `seen`
    # like any link, so redirect LOOPS terminate structurally: every
    # URL is claimed at most once per scraping, a guarantee strictly
    # stronger than the 10-hop cap Go's http.Client applies while
    # following Locations transparently (page_fetcher.go's http.Get).
    # Off by default only because each hop costs a crawl round here;
    # when off, 301s still log but dead-end (a client with redirect
    # following disabled).
    follow_redirects: bool = False
    # conditional refetch (If-Modified-Since with a strong validator =
    # content sha256): when a fetched page's content hash equals the
    # latest copy already stored in `pages` (ANY prior scraping), the
    # fetch logs 304 and the stored summary is REUSED — the summarizer
    # (an LLM call per page in the reference,
    # summarizer_factory.go-analog) never sees unchanged content (its
    # input column is NULL-masked for 304 rows, so even a pandas-UDF
    # provider does no per-row work). Links/images/index rows still
    # flow (the body is in hand here; the modeled saving is the derived
    # LLM/recompute work, which at 100 TB recrawls dominates). Off by
    # default: it adds one pages probe join per round.
    conditional_fetch: bool = False
    # seed from robots.txt `Sitemap:` directives at host discovery
    # (requires discover_robots; locs enter the normal claims pipeline
    # attributed to the host's introducing frontier row at depth-1)
    sitemap_seeding: bool = False
    # WARC archive sink: serialize each round's captures (one per URL)
    # into `warc_store` blobs + a byte-offset `warc_cdx` index — the
    # Common-Crawl-style archival output next to the analytic tables
    archive_warc: bool = False
    warc_files_per_round: int = 4
    # transient-outage injector (tests/chaos): a boolean SQL expression
    # over (url, round, ...) evaluated on the resolved frame; rows where
    # it is FALSE are treated as fetch failures (status 503) even though
    # the corpus resolved them — the deterministic stand-in for network
    # flakiness that a static corpus cannot otherwise express.
    availability_sql: str | None = None
    debug_timing: bool = False


def _round_pred(updates: DataFrame):
    """Commit-pruning predicate for round-keyed merges: updates only
    carry specific round values, so commits tagged with any OTHER round
    provably match nothing and stay byte-identical (enrichment messages
    are small — the collect is bounded by the batch size)."""
    rounds = {
        r["round"] for r in updates.select("round").distinct().collect()
    }

    def pred(props: dict) -> bool:
        rng = Warehouse._round_range(props)  # handles compacted spans too
        if rng is None:
            return True  # untagged: can't prove unaffected
        return any(rng[0] <= r <= rng[1] for r in rounds)

    return pred


@dataclass
class RoundStats:
    round: int
    urls_in: int
    fetched: int
    fetch_errors: int
    links_extracted: int
    new_urls: int
    deferred: int
    robots_blocked: int
    wall_ms: int


@dataclass
class CrawlEngine:
    """One engine instance = one warehouse (may host many scrapings)."""

    spark: SparkSession
    warehouse_root: str
    documents: DataFrame | None = None       # materialized corpus (doc_id, spans)
    resolver: object | None = None           # or: callable(to_fetch DF) -> DF with spans
    # or: BATCH ``pd.Series[url] -> pd.Series[spans]`` (null = 404) —
    # activates the FUSED schedule+fetch+parse pass (one Arrow
    # round-trip and ONE Python call per batch per round)
    page_fn: object | None = None
    politeness: DataFrame | None = None
    config: CrawlConfig = field(default_factory=CrawlConfig)

    def __post_init__(self):
        import os

        # sketch_store='auto' resolves here, once per engine: warehouse
        # when the sizing implies a GB-scale driver sketch AND a
        # sharded layout exists to persist; driver otherwise. The
        # resolved value is what every later check sees.
        if self.config.sitemap_seeding and not self.config.discover_robots:
            raise ValueError(
                "sitemap_seeding requires discover_robots (sitemaps are "
                "found via the robots.txt probe)"
            )
        if self.config.frontier_priority not in ("depth", "indegree"):
            # fail fast: run_round only tests == "indegree", so a typo
            # ("opic", "in-degree") would otherwise silently crawl in
            # plain BFS order with the feature apparently enabled
            raise ValueError(
                "frontier_priority must be 'depth' or 'indegree', got "
                f"{self.config.frontier_priority!r}"
            )
        if self.config.error_backoff_threshold is not None and not (
            1e-6 <= self.config.error_backoff_threshold <= 1
            and self.config.error_backoff_rounds >= 1
            and self.config.error_backoff_min_attempts >= 1
        ):
            # fail fast: a threshold of 0 would trip every host that
            # fetched anything (errors·den ≥ attempts·0 is always
            # true — and cooling_hosts' rational conversion collapses
            # anything below 1e-6 to that same 0/1, hence the floor),
            # a 0-round window reads an empty ledger, and a 0
            # min-attempts floor trips on a single flaky 503 — each
            # crawls "successfully" with the breaker silently wrong
            raise ValueError(
                "error_backoff_threshold must be in [1e-6, 1] with "
                "error_backoff_rounds >= 1 and "
                "error_backoff_min_attempts >= 1, got "
                f"{self.config.error_backoff_threshold!r} / "
                f"{self.config.error_backoff_rounds!r} / "
                f"{self.config.error_backoff_min_attempts!r}"
            )
        if self.config.budget_scope not in ("host", "domain") or (
            self.config.budget_scope == "domain"
            and self.config.domain_labels < 1
        ):
            raise ValueError(
                "budget_scope must be 'host' or 'domain' (with "
                "domain_labels >= 1), got "
                f"{self.config.budget_scope!r} / "
                f"{self.config.domain_labels!r}"
            )
        if self.config.sketch_store == "auto":
            self.config.sketch_store = (
                "warehouse"
                if self.config.use_bloom
                and self.config.bloom_buckets > 1
                and self.config.bloom_expected_urls >= AUTO_WH_SKETCH_URLS
                else "driver"
            )
        self.wh = Warehouse(self.spark, self.warehouse_root)
        self._bloom: BloomFilter | BucketedBloom | None = None
        # driver-known |seen| estimate (exact: seeds + per-round n_new):
        # gates the bloom-prefilter APPLY (config.bloom_apply_min_seen).
        # None = unknown (bare run_round on a resumed engine) -> apply.
        self._seen_est: int | None = None
        # robots steady-state gate (VERDICT r4 "what's wrong" #3): the
        # probed-host set rides the driver (bounded by DISTINCT HOSTS —
        # orders of magnitude below URLs; 10^7 hosts ≈ a few hundred MB,
        # nothing like the sketch's 25 GB), loaded once per engine from
        # the robots table. _next_round_hosts carries the ONLY hosts the
        # next frontier can introduce (hosts of this round's new_urls —
        # deferred rows' hosts were probed when first seen), so a
        # steady-state round skips the frontier distinct, the robots
        # read and the isEmpty probe entirely: zero Spark actions.
        self._robots_probed: set[str] | None = None
        self._next_round_hosts: set[str] | None = None
        self._summarize = make_summarize_udf(self.config.llm_provider)
        self._explain = make_explain_image_udf(self.config.llm_provider)
        # derived (rebuildable) posting-list + n-gram indexes — live
        # beside the warehouse tables but outside the commit protocol
        self.postings_path = os.path.join(self.warehouse_root, "postings_store")
        self.grams_path = os.path.join(self.warehouse_root, "grams_store")

    # ------------------------------------------------------------------ init
    def start(self, seeds: list[tuple[int, int, str, int]]) -> None:
        """seeds: (scraping_id, user_id, url, depth). Mirrors POST /scrape:
        crawls row + PENDING job + seed frontier message + seed self-mark
        into seen (`api/services/scraper_service.py:50-85`; SAdd
        `scraper_service.go:93-94`). One seed per scraping_id, as in the
        reference (jobs are keyed by scraping_id alone)."""
        ids = [s for (s, _u, _url, _d) in seeds]
        if len(set(ids)) != len(ids):
            raise ValueError("scraping_id must be unique per seed")
        # rounds are GLOBAL per warehouse (they continue from the last
        # metrics commit), so seeds must enter the frontier at the round
        # the loop will actually run next — and created_round must record
        # it, or delete_scraping's [created_round, completed_round]
        # commit-pruning window starts at 0 and never prunes commits from
        # earlier scrapings sharing this warehouse.
        r0 = self._next_round()
        # new seeds can introduce hosts the steady-state robots gate's
        # carried set has never seen (streaming crawl enqueues mid-life)
        # — force the next round to re-derive hosts from its frontier
        self._next_round_hosts = None
        crawls = self.spark.createDataFrame(
            [(s, u, url, d) for (s, u, url, d) in seeds],
            "scraping_id long, user_id long, url string, depth int",
        ).coalesce(self._round_parallelism(len(seeds)))
        self.wh.append("crawls", crawls)
        self.wh.append(
            "jobs",
            crawls.select(
                "scraping_id",
                "url",
                "depth",
                F.lit("PENDING").alias("status"),
                F.lit(0).cast("long").alias("links_count"),
                F.lit(r0).alias("created_round"),
                F.lit(None).cast("int").alias("completed_round"),
            ),
        )
        frontier0 = crawls.select(
            "scraping_id",
            "user_id",
            "url",
            "depth",
            F.lit(r0).alias("round"),
        )
        self.wh.append("frontier", frontier0, {"round": r0})
        self.wh.append(
            "seen",
            frontier0.select(
                "scraping_id",
                "url",
                url_hash_col("url").alias("url_hash"),
                F.col("depth").alias("first_depth"),
                F.lit(r0).alias("round"),
            ),
            {"round": r0},
        )
        # Mid-life start (the streaming crawl enqueues seeds into a
        # running engine): an ALREADY-BUILT sketch predates these seeds,
        # so a link cycling back to a seed would be sketch-negative —
        # "definitely new", bypassing the exact anti-join — and get
        # refetched. OR the seed self-marks in now. Fresh engines skip
        # both branches: run() builds/inits the sketch from `seen`,
        # which already includes the seeds.
        seed_hashes = frontier0.select(url_hash_col("url").alias("url_hash"))
        self._seen_est = (self._seen_est or 0) + len(seeds)
        if self._use_wh_sketch:
            if self.wh.exists(SKETCH_TABLE):
                # tagged r0-1 like the init commit: re-running round r0
                # (rollback) must not drop the seeds' marks — their seen
                # rows survive that rollback too
                self._sketch_append_round(seed_hashes, r0 - 1, len(seeds))
        elif self._bloom is not None:
            self._or_into_bloom(seed_hashes, len(seeds))

    # ----------------------------------------------------------------- fetch
    def _fetch(self, to_fetch: DataFrame) -> DataFrame:
        """frontier ⋈ documents (J1). Missing doc = the fetch-error path
        (`scraper_service.go:117-127`). In resolver mode the web is a
        deterministic function — no join, no materialized corpus."""
        if self.resolver is not None:
            fetched = self.resolver(to_fetch)
        else:
            cols = self.documents.columns
            payload = "spans" if "spans" in cols else "html"
            docs = self.documents.select(
                F.col("doc_id").alias("url"), payload
            )
            fetched = to_fetch.join(docs, "url", "left")
        if "html" in fetched.columns:
            # raw-HTML corpus: tokenize with the real parser UDF
            # (the reference's per-byte parse path, scraper_service.go:129-202)
            from ..functions.spark_udfs import parse_html_udf

            fetched = fetched.withColumn(
                "spans",
                F.when(
                    F.col("html").isNotNull(), parse_html_udf(F.col("html"))
                ),
            ).drop("html")
        return fetched

    def _resolve_payload(self, df: DataFrame) -> DataFrame:
        """Append the corpus's RAW payload column (spans or html) to
        ``df`` rows keyed by ``url`` — the robots probe path, which must
        NOT run the HTML tokenizer (robots.txt is plain text; a real
        crawler never HTML-parses it)."""
        if self.page_fn is not None:
            import pyspark.sql.types as T

            from ..schema import SPAN

            fn = self.page_fn
            out_schema = T.StructType(
                list(df.schema.fields)
                + [T.StructField("spans", T.ArrayType(SPAN), True)]
            )

            def gen(batches):
                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["spans"] = fn(pdf["url"]).to_numpy(dtype=object)
                    yield pdf

            return df.mapInPandas(gen, out_schema)
        if self.resolver is not None:
            return self.resolver(df)
        cols = self.documents.columns
        payload = "spans" if "spans" in cols else "html"
        return df.join(
            self.documents.select(F.col("doc_id").alias("url"), payload),
            "url",
            "left",
        )

    @staticmethod
    def _payload_text(resolved: DataFrame):
        """RAW text of a resolved payload row — the corpus-agnostic
        read used by the robots and sitemap probes (html corpora carry
        the file verbatim; span corpora refold text spans in document
        order)."""
        if "html" in resolved.columns:
            return F.col("html")
        return F.array_join(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
                lambda s: s["text"],
            ),
            "\n",
        )

    # ----------------------------------------------------------- robots
    def _discover_robots(
        self, frontier: DataFrame, round_no: int
    ) -> DataFrame | None:
        """Probe http://<host>/robots.txt for hosts not yet probed (the
        `robots` table records every outcome, 404s included, so each
        host is probed exactly once per warehouse — resume-safe). Runs
        at the START of the round so a host's rules apply to its very
        first fetch, like a real crawler; the reference has no robots
        handling at all (page_fetcher.go:14-20).

        With ``sitemap_seeding`` on, returns the sitemap-discovered
        frontier candidates for this round's NEW hosts (columns match
        the link-candidate shape; run_round unions them into the same
        first-wins + seen-anti-join claims pipeline, so sitemap entries
        dedup against spidered links for free). Probe-once-per-host
        falls out of the robots gate: a host's sitemaps are only ever
        read in the round that first probed it.

        Steady-state cost: the probed-host set is driver-resident
        (loaded ONCE per engine) and the previous round's wall already
        collected the only hosts this frontier can introduce, so a
        round with no new hosts returns after a pure driver set
        difference — no frontier distinct, no robots-table read, no
        isEmpty action (VERDICT r4 "what's wrong" #3)."""
        from ..functions.url import host_col

        if self._robots_probed is None:  # first round of this engine
            self._robots_probed = (
                {r.host for r in self.wh.read("robots").select("host").collect()}
                if self.wh.exists("robots")
                else set()
            )
        if self._next_round_hosts is not None:
            cand = self._next_round_hosts - self._robots_probed
        else:
            # first round / resume / standalone run_round: the frontier
            # is the only source of truth for its hosts
            cand = {
                r.host
                for r in frontier.select(host_col("url").alias("host"))
                .filter(F.col("host").isNotNull())
                .distinct()
                .collect()
            } - self._robots_probed
        cand.discard(None)
        if not cand:
            return None
        to_fetch = self.spark.createDataFrame(
            [(h,) for h in sorted(cand)], "host string"
        ).select(
            "host",
            F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt")).alias(
                "url"
            ),
        )
        resolved = self._resolve_payload(to_fetch)
        txt = self._payload_text(resolved)
        from ..functions.robots import politeness_from_robots

        raw = resolved.select(
            "host", txt.alias("robots_txt"), F.lit(round_no).alias("round")
        ).persist()
        sm_cands: DataFrame | None = None
        try:
            self.wh.append("robots", raw, {"round": round_no})
            # parse ONCE, at discovery, only for this round's new hosts —
            # the per-round scheduler read is then a plain table scan
            # instead of reparsing every robots file ever fetched
            rules = politeness_from_robots(
                raw.filter(F.col("robots_txt").isNotNull())
            ).withColumn("round", F.lit(round_no))
            self.wh.append("robots_rules", rules, {"round": round_no})
            if self.config.sitemap_seeding:
                sm_cands = self._seed_from_sitemaps(raw, frontier, round_no)
        finally:
            raw.unpersist()
        self._robots_probed |= cand
        return sm_cands

    def _seed_from_sitemaps(
        self, raw: DataFrame, frontier: DataFrame, round_no: int
    ) -> DataFrame | None:
        """Turn the newly-probed hosts' ``Sitemap:`` directives into
        frontier candidates: fetch each advertised sitemap through the
        SAME corpus machinery as pages, recurse ONE level into
        <sitemapindex> shards (the 50k-URL protocol cap shape), and
        attribute every <loc> to EVERY scraping with a frontier row on
        that host this round, at that scraping's max remaining depth −
        1, exactly as if the loc were a link parsed from its page (a
        depth-0 introducer seeds nothing, like the link depth gate;
        per-scraping attribution mirrors the link pipeline, where each
        scraping claims candidates independently — a min-scraping rule
        would starve co-tenant scrapings of the host's sitemap pages
        forever, since the host probes once per warehouse). Resume
        safety rides the robots rollback: run() drops a partial
        round's robots commit (_rollback_partial) and invalidates the
        probed-host cache, so a crash between the robots append and
        the round's claims re-probes AND re-seeds. Loc extraction is a
        lenient regexp, not strict xpath: a real crawler must survive
        malformed XML and a sitemap URL that resolves to an HTML page
        (the standalone sitemap_parse queries keep the strict-xpath
        form; this is the fault-tolerant engine path).

        Scale: runs only on new-host rounds; two bounded fetch-joins
        (sitemaps, then index children) + one regexp explode,
        checkpointed once so the claims stage never re-joins the
        corpus. The candidates then ride the normal claims pipeline —
        sitemap floods dedup/claim like any link burst."""
        from ..functions.robots import robots_sitemaps
        from ..functions.url import host_col

        loc_re = F.lit(r"<loc>\s*([^<\s]+)\s*</loc>")

        def locs_of(xml_df: DataFrame) -> DataFrame:
            return xml_df.select(
                "host",
                F.col("url").alias("sitemap_url"),
                F.explode(
                    F.regexp_extract_all(F.col("xml"), loc_re, F.lit(1))
                ).alias("loc"),
            )

        sm_urls = robots_sitemaps(raw).select(
            "host", F.col("sitemap_url").alias("url")
        )
        lvl1 = self._resolve_payload(sm_urls)
        lvl1 = lvl1.select(
            "host", "url", self._payload_text(lvl1).alias("xml")
        ).filter(F.col("xml").isNotNull())
        l1 = locs_of(lvl1)
        # <sitemapindex> locs name CHILD SITEMAPS, not pages: fetch and
        # parse them; <urlset> locs are the page seeds directly
        is_idx = F.col("xml").contains("<sitemapindex")
        pages1 = l1.join(
            lvl1.filter(~is_idx).select("host", F.col("url").alias("sitemap_url")),
            ["host", "sitemap_url"],
        )
        children = l1.join(
            lvl1.filter(is_idx).select("host", F.col("url").alias("sitemap_url")),
            ["host", "sitemap_url"],
        ).select("host", F.col("loc").alias("url"))
        lvl2 = self._resolve_payload(children)
        lvl2 = lvl2.select(
            "host", "url", self._payload_text(lvl2).alias("xml")
        ).filter(F.col("xml").isNotNull())
        locs = (
            pages1.unionByName(locs_of(lvl2))
            .filter(F.col("loc").startswith("http"))  # P4, same as links
            .localCheckpoint(eager=True)  # claims must not re-join corpus
        )
        # introducers: EVERY scraping with a frontier row on the host,
        # each at its own max remaining depth (FIFO parity with link
        # claims; user constant per scraping)
        intro = (
            frontier.select(
                "scraping_id",
                "user_id",
                "depth",
                host_col("url").alias("host"),
            )
            .groupBy("host", "scraping_id")
            .agg(F.max("user_id").alias("user_id"), F.max("depth").alias("depth"))
        )
        return (
            locs.join(intro, "host")
            .filter(F.col("depth") > 0)  # depth gate (P6)
            .select(
                "scraping_id",
                "user_id",
                F.lit(round_no).alias("round"),
                F.col("sitemap_url").alias("parent_url"),
                (F.col("depth") - 1).alias("child_depth"),
                F.col("loc").alias("url"),
            )
        )

    def _politeness_for_round(self) -> DataFrame:
        """The scheduler's config = user-provided politeness (wins per
        host) ∪ rules parsed at discovery time (the `robots_rules`
        table — each host's file was parsed exactly once, in the round
        that probed it). The union broadcasts into the scheduler."""
        disc = self.wh.read("robots_rules").drop("round")
        if self.politeness is None:
            return disc
        # allowMissingColumns: user-provided configs may predate the
        # robots_allow column (discovered rules always carry it) —
        # missing side fills NULL = no allow rules
        return self.politeness.unionByName(
            disc.join(self.politeness.select("host"), "host", "left_anti"),
            allowMissingColumns=True,
        )

    @contextlib.contextmanager
    def _timed(self, label: str):
        t = time.monotonic()
        yield
        if self.config.debug_timing:
            print(f"      [{label}] {time.monotonic() - t:.2f}s", flush=True)

    def _round_parallelism(self, urls_in: int) -> int:
        cfg = self.config
        max_par = cfg.max_parallelism or self.spark.sparkContext.defaultParallelism
        return max(1, min(max_par, -(-urls_in // cfg.target_rows_per_task)))

    # ----------------------------------------------------------------- round
    def run_round(self, round_no: int, urls_in: int | None = None) -> RoundStats:
        """One BFS round. ``urls_in`` is the exact frontier size carried
        forward from the previous round (new_urls + deferred) — passing
        it skips the per-round count() action (part of the constant-plan
        driver-floor fix, BENCH §6 item 1); None ⇒ count once (first
        round / resume)."""
        t0 = time.monotonic()
        cfg = self.config
        with self._timed("frontier read (plan)"):
            frontier = self.wh.read("frontier", {"round": round_no})
        if urls_in is None:
            urls_in = frontier.count()
        if cfg.frontier_priority == "indegree":
            # OPIC-lite importance: discovered-inlink count per URL so
            # far, left-joined onto the frontier as the schedulers'
            # optional `priority` column (_priority_keys slots it
            # between depth and the url tie-break). Unlinked rows
            # (seeds, sitemap entries) keep priority 0.
            inlinks = (
                self.wh.read("links")
                .select("scraping_id", F.col("target_url").alias("url"))
                .groupBy("scraping_id", "url")
                .agg(F.count("*").cast("long").alias("priority"))
            )
            frontier = frontier.join(
                inlinks, ["scraping_id", "url"], "left"
            ).withColumn("priority", F.coalesce("priority", F.lit(0)))
        pol = self.politeness
        sm_cands: DataFrame | None = None
        if cfg.discover_robots:
            with self._timed("robots discovery"):
                sm_cands = self._discover_robots(frontier, round_no)
            pol = self._politeness_for_round()
        if cfg.detect_traps:
            # URL-space explosions become hard robots blocks BEFORE the
            # budget apportionment, so a trap's queue never eats budget
            from ..operators.politeness import trap_override

            pol = trap_override(
                frontier, pol, cfg.trap_min_urls, cfg.trap_url_template_ratio
            )
        if cfg.error_backoff_threshold is not None:
            # failure circuit breaker (W41): hosts that answered mostly
            # 5xx in the trailing window cool down (budget 0 ⇒ defer).
            # The window read filters the ROUND DATA COLUMN, not a
            # round-exact pruned read — recent fetch_log commits may
            # already be folded by periodic compaction (the retry
            # ledger reads the same way); parquet row-group stats on
            # `round` keep the scan O(recent files). Applied BEFORE the
            # global-budget allocation so min(static, alloc) sees the 0
            # — a cooling host's queue still counts toward allocation
            # shares (its rows are eligible, just budget-starved); its
            # unused share defers demand, it doesn't leak fetches.
            from ..operators.politeness import backoff_override, cooling_hosts

            recent = self.wh.read("fetch_log").filter(
                (F.col("round") >= F.lit(round_no - int(cfg.error_backoff_rounds)))
                & (F.col("round") < F.lit(round_no))
            )
            pol = backoff_override(
                cooling_hosts(
                    recent,
                    cfg.error_backoff_threshold,
                    cfg.error_backoff_min_attempts,
                ),
                pol,
            )
        if cfg.budget_scope == "domain":
            # W42: budgets keyed by registrable domain, apportioned
            # across the domain's hosts (exact Hamilton) — emits an
            # ordinary host-keyed config, so the schedulers are
            # untouched. Runs AFTER the breaker (a cooling host's
            # budget-0 row survives via min(host, allocation)) and
            # BEFORE the global budget (which min-composes on top).
            from ..operators.politeness import domain_budget_override

            pol = domain_budget_override(
                frontier, pol, cfg.default_budget, cfg.domain_labels
            )
        if cfg.global_budget is not None:
            # adaptive backpressure: ONE global budget apportioned
            # across this round's hosts ∝ queue size (Hamilton rule);
            # composes with robots/static config — see
            # operators/politeness.allocate_global_budget
            from ..operators.politeness import allocate_global_budget

            pol = allocate_global_budget(frontier, cfg.global_budget, pol)
        _t_plan = time.monotonic()
        parts = self._round_parallelism(urls_in)
        self.spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        max_par = cfg.max_parallelism or self.spark.sparkContext.defaultParallelism
        fetch_parts = max(
            1, min(max_par, -(-urls_in // cfg.target_rows_per_fetch_task))
        )

        if self.page_fn is not None:
            # FUSED path (BENCH §9): schedule + fetch + parse in ONE
            # host-partitioned pandas pass — one Arrow round-trip and one
            # shuffle per round instead of three round-trips and two
            # shuffles. The fused stage IS the fetch stage, so the host
            # shuffle runs at the fetch stage's width. The span folds run
            # in the SAME stage and ONE spans-free frame is cached — the
            # round never stores raw spans (a second page-size cache pass
            # would re-saturate the memory bus the fusion just relieved).
            from ..operators.politeness import fetch_all_fused

            if pol is None and cfg.default_budget >= 10**9:
                pre = frontier.select(
                    "scraping_id", "user_id", "url", "depth", "round"
                )
                if fetch_parts > parts:
                    pre = pre.repartition(fetch_parts)
                fused = fetch_all_fused(pre, self.page_fn)
            else:
                fused = schedule_round(
                    frontier,
                    pol,
                    round_no,
                    cfg.default_budget,
                    # fusion requires the vectorized impl (the fetch call
                    # needs the pandas stage anyway)
                    impl="vectorized",
                    page_fn=self.page_fn,
                    n_parts=max(parts, fetch_parts),
                )
            avail = (
                F.expr(cfg.availability_sql)
                if cfg.availability_sql
                else F.lit(True)
            )
            resolved_c = (F.col("action") == F.lit(ACTION_FETCH)) & F.col(
                "spans"
            ).isNotNull()
            scheduled = (
                # a redirect answer carries a Location instead of a body:
                # it is neither ok (no content/links) nor an error
                fused.withColumn(
                    "location", F.when(resolved_c & avail, location_col("spans"))
                )
                .withColumn(
                    "ok", resolved_c & avail & F.col("location").isNull()
                )
                # resolved by the corpus but transiently unavailable
                # (availability_sql): a 503, retryable
                .withColumn("transient", resolved_c & ~avail)
                .withColumn("content", F.when(F.col("ok"), content_col("spans")))
                .withColumn("links", F.when(F.col("ok"), links_col("spans")))
                .withColumn("images", F.when(F.col("ok"), images_col("spans")))
                .drop("spans")
                .persist()
            )
            # parsed = the fetch rows, straight off the shared cache (no
            # second persist — filters over cached blocks are free)
            parsed = scheduled.filter(F.col("action") == ACTION_FETCH).drop(
                "action", "host"
            )
        else:
            if pol is None and cfg.default_budget >= 10**9:
                # permissive fast path (reference parity: no politeness at
                # all) — skips the per-host applyInPandas shuffle entirely
                scheduled = frontier.select(
                    "scraping_id",
                    "user_id",
                    "depth",
                    "round",
                    "url",
                    F.lit(None).cast("string").alias("host"),
                    F.lit(ACTION_FETCH).alias("action"),
                ).persist()
            else:
                scheduled = schedule_round(
                    frontier,
                    pol,
                    round_no,
                    cfg.default_budget,
                    impl=cfg.politeness_impl,
                ).persist()
            to_fetch = scheduled.filter(F.col("action") == ACTION_FETCH).drop(
                "action", "host"
            )
            if fetch_parts > parts:
                to_fetch = to_fetch.repartition(fetch_parts)

            fetched = self._fetch(to_fetch)
            if cfg.repartition_parsed:
                fetched = fetched.repartition(
                    cfg.repartition_parsed, url_hash_col("url")
                )
            avail = (
                F.expr(cfg.availability_sql)
                if cfg.availability_sql
                else F.lit(True)
            )
            parsed = (
                fetched.withColumn(
                    "location",
                    F.when(
                        F.col("spans").isNotNull() & avail,
                        location_col("spans"),
                    ),
                )
                .withColumn(
                    "ok",
                    F.col("spans").isNotNull()
                    & avail
                    & F.col("location").isNull(),
                )
                .withColumn(
                    "transient", F.col("spans").isNotNull() & ~avail
                )
                .withColumn("content", F.when(F.col("ok"), content_col("spans")))
                .withColumn("links", F.when(F.col("ok"), links_col("spans")))
                .withColumn("images", F.when(F.col("ok"), images_col("spans")))
                .drop("spans")
                .persist()
            )

        # ---- conditional refetch (If-Modified-Since twin) ----
        cond_latest = None
        if cfg.conditional_fetch:
            # latest stored copy per refetched URL (any scraping): the
            # probe carries only (url, hash, summary) — never cached
            # page content — and is semi-joined to THIS round's URLs
            # BEFORE the hash projection (Catalyst collapses projections
            # but never reorders a Project below a Join above it, so a
            # sha2-then-join shape would read and hash every stored body
            # each round; join-then-sha2 bounds the hashed bytes by the
            # round — review finding, round 5 session 5). Production
            # refinement: persist a content_hash column in `pages` and
            # bucket by url hash so the probe prunes to touched buckets
            # (corpus_store's shape); here the hash is computed on read.
            stored = self.wh.read("pages").join(
                parsed.filter("ok").select("url").distinct(), "url"
            ).select(
                "url",
                F.sha2(F.col("content"), 256).alias("prior_hash"),
                F.col("summary").alias("prior_summary"),
                F.col("round").alias("prior_round"),
                F.col("scraping_id").alias("prior_scraping"),
            )
            cond_latest = (
                stored
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("url").orderBy(
                            F.col("prior_round").desc(),
                            F.col("prior_scraping").desc(),
                        )
                    ),
                )
                .filter(F.col("rn") == 1)
                .select("url", "prior_hash", "prior_summary")
                .persist()
            )
            enriched = parsed.join(cond_latest, "url", "left")
        else:
            enriched = parsed.withColumn(
                "prior_hash", F.lit(None).cast("string")
            ).withColumn("prior_summary", F.lit(None).cast("string"))
        enriched = enriched.withColumn(
            "not_modified",
            F.col("ok")
            & F.coalesce(
                F.sha2(F.col("content"), 256) == F.col("prior_hash"),
                F.lit(False),
            ),
        )

        # NOTE constant-plan rounds: every output tags its round from the
        # frontier rows' `round` COLUMN, never a per-round literal — the
        # generated stage code is byte-identical across rounds, so the
        # JVM codegen cache hits instead of recompiling every round
        # (BENCH §6 item 1; the commit props dict is driver-side only).
        fetch_log = enriched.select(
            "scraping_id",
            "url",
            "round",
            F.when(F.col("not_modified"), F.lit(304))
            .when(F.col("ok"), F.lit(200))
            .when(F.col("transient"), F.lit(503))
            .when(F.col("location").isNotNull(), F.lit(301))
            .otherwise(F.lit(404))
            .alias("status"),
            # a 301 is not an error: NULL keeps it out of the retry
            # ledger's prior-failure count (error IS NOT NULL)
            F.when(F.col("ok") | F.col("location").isNotNull(),
                   F.lit(None).cast("string"))
            .when(F.col("transient"), F.lit("transient error"))
            .otherwise(F.lit("fetch error"))
            .alias("error"),
        )

        retries = None
        if cfg.retry_max_attempts > 0:
            # manifest snapshot taken NOW (before the wall appends this
            # round's fetch_log), so prior_fails counts EARLIER rounds
            # only: attempts so far = prior + 1 (this one)
            prior = (
                self.wh.read("fetch_log")
                .filter(F.col("error").isNotNull())
                .groupBy("scraping_id", "url")
                .agg(F.count("*").alias("prior_fails"))
            )
            retries = (
                # only transient (503) failures retry: a corpus miss
                # (404) is permanent by construction
                parsed.filter(F.col("transient"))
                .join(prior, ["scraping_id", "url"], "left")
                .filter(
                    F.coalesce(F.col("prior_fails"), F.lit(0)) + 1
                    < F.lit(int(cfg.retry_max_attempts))
                )
                .select("scraping_id", "user_id", "url", "depth", "round")
            )

        # summary computed ONCE here as a single expression shared by
        # the pages writer and the gram indexer. NOTE this is one
        # expression over one cache, but the two writers are separate
        # JOBS that each re-evaluate it above the cached blocks — so a
        # genuinely NONDETERMINISTIC summarizer provider still needs
        # grams built from committed pages rows (read-back); every
        # provider this environment ships is deterministic (mock =
        # constant JVM expr, network = constant fallback).
        #
        # 304 reuse gate: reuse needs a summary to actually EXIST in
        # the stored copy (prior crawl may have run with the summarizer
        # disabled — unchanged content must not pin its summary to NULL
        # forever); empty content legitimately summarizes to NULL, so
        # reusing NULL there is exact. Reused rows NULL-mask the
        # summarizer's input, so no provider (JVM or pandas-UDF) does
        # per-row work on unchanged content.
        reuse = F.col("not_modified") & (
            F.col("prior_summary").isNotNull() | (F.length("content") == 0)
        )
        ok = enriched.filter("ok").withColumn(
            "summary",
            F.when(reuse, F.col("prior_summary")).otherwise(
                F.when(
                    (F.length("content") > 0) & F.lit(cfg.summarizer_enabled),
                    self._summarize(F.when(~reuse, F.col("content"))),
                )
            ),
        )

        pages = ok.select(
            "scraping_id",
            "url",
            "content",
            "summary",
            "round",
        )

        links = ok.select(
            "scraping_id",
            F.col("url").alias("source_url"),
            F.explode_outer("links").alias("target_url"),
            "round",
        ).filter(F.col("target_url").isNotNull())

        if cfg.image_extractor_enabled:
            images = (
                ok.select(
                    "scraping_id",
                    F.col("url").alias("page_url"),
                    F.explode("images").alias("image_url"),
                    "round",
                )
                .withColumn(
                    "ext",  # P9 extension inference (extractor_service.go:109-129)
                    F.coalesce(
                        F.nullif(
                            F.regexp_extract(
                                "image_url", r"\.([A-Za-z0-9]{1,5})(?:\?|$)", 1
                            ),
                            F.lit(""),
                        ),
                        F.lit("bin"),
                    ),
                )
                .select(
                    "scraping_id",
                    "page_url",
                    "image_url",
                    self._explain("image_url").alias("explanation"),
                    F.concat_ws(
                        "/",
                        F.col("scraping_id").cast("string"),
                        F.concat(F.sha2(F.col("image_url"), 256), F.lit("."), F.col("ext")),
                    ).alias("s3_path"),  # deterministic key replaces uuid (extractor_service.go:66)
                    "round",
                )
            )
        else:
            images = None

        media = None
        if cfg.image_extractor_enabled and cfg.media_store_enabled and images is not None:
            # S6 blob sink: payload bytes under the deterministic
            # content-hash key (replaces uuid S3 keys,
            # extractor_service.go:65-75; fake download — no network)
            from ..operators.multimodal import media_table

            media = (
                media_table(
                    images.select(F.col("image_url").alias("media_ref")).distinct()
                )
                .join(
                    images.select(
                        "scraping_id",
                        F.col("image_url").alias("media_ref"),
                        "s3_path",
                    ).distinct(),
                    "media_ref",
                )
                .select("scraping_id", "media_ref", "s3_path", "content_type", "payload")
            )

        # index_docs is normalized: content lives once, in `pages` —
        # the search plan joins it back (plans/api.py). Duplicating the
        # content column doubled the round's write volume for nothing.
        index_docs = (
            ok.select(
                "url",
                F.lit(None).cast("string").alias("content"),
                F.lit(None).cast("string").alias("summary"),
                "scraping_id",
                "user_id",
                "round",
            )
            if cfg.indexer_enabled
            else None
        )

        # ---- WARC archive sink (ISO 28500): one capture per URL per
        # round, serialized by the SAME JVM expression the ingest
        # parser and the CDX oracle pin byte-for-byte. Blobs are one
        # row per archive file of a binary column (the 100-TB object-
        # store shape — sources/warc.py module docstring); the CDX rows
        # carry byte offsets from a per-file prefix-sum window, so a
        # reader seeks records without scanning archives. Both tables
        # ride the normal wall + rollback.
        warc_blobs = warc_cdx = None
        if cfg.archive_warc:
            from ..sources.warc import warc_records_col

            cap = ok.select("url", "content").distinct()
            rec = cap.select(
                "url",
                # pmod, not %: xxhash64 is signed and % keeps the sign —
                # signed buckets would double the file count with
                # negative ids (same rule as every bucket in the repo)
                F.pmod(url_hash_col("url"), cfg.warc_files_per_round).alias(
                    "warc_file"
                ),
                warc_records_col(
                    F.col("url"), F.coalesce(F.col("content"), F.lit(""))
                ).alias("r"),
                F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias(
                    "digest"
                ),
            )
            ww = Window.partitionBy("warc_file").orderBy("url")
            warc_cdx = rec.select(
                "url",
                "warc_file",
                "digest",
                F.coalesce(
                    F.sum(F.octet_length("r")).over(
                        ww.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("rec_offset"),
                F.octet_length("r").cast("long").alias("rec_length"),
                F.lit(round_no).alias("round"),
            )
            warc_blobs = rec.withColumn(
                "round", F.lit(round_no)
            ).groupBy("warc_file", "round").agg(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.sort_array(
                                F.collect_list(F.struct("url", "r"))
                            ),
                            lambda x: x["r"],
                        ),
                        "",
                    ),
                    "UTF-8",
                ).alias("data")
            )

        # ---- recursion: candidates → first-wins → anti-join seen (J2) ----
        candidates = (
            ok.filter(F.col("depth") > 0)  # depth gate (P6)
            .select(
                "scraping_id",
                "user_id",
                "round",
                F.col("url").alias("parent_url"),
                (F.col("depth") - 1).alias("child_depth"),
                F.explode("links").alias("url"),
            )
            .filter(F.col("url").startswith("http"))  # P4
        )
        if cfg.follow_redirects:
            # 301 Locations ride the SAME claims pipeline as links but at
            # UNCHANGED depth (the target is this fetch's answer, not a
            # deeper hop) and past the depth gate (a depth-0 redirect
            # still resolves). The seen anti-join then claims each hop
            # once per scraping — redirect loops drain structurally.
            candidates = candidates.unionByName(
                parsed.filter(F.col("location").isNotNull())
                .select(
                    "scraping_id",
                    "user_id",
                    "round",
                    F.col("url").alias("parent_url"),
                    F.col("depth").alias("child_depth"),
                    F.col("location").alias("url"),
                )
                .filter(F.col("url").startswith("http"))
            )
        if sm_cands is not None:
            # sitemap-discovered seeds (new-host rounds only) claim
            # through the same first-wins + anti-join as spidered links
            candidates = candidates.unionByName(sm_cands)
        # intra-round first-wins: FIFO parity = earliest-discovered parent
        # wins ⇒ max remaining depth; provenance = min parent (deterministic
        # aggregate, never dropDuplicates — SURVEY.md §7 hard-parts)
        claims = candidates.groupBy("scraping_id", "url").agg(
            F.max("child_depth").alias("depth"),
            F.min("parent_url").alias("via"),
            F.max("user_id").alias("user_id"),
            F.max("round").alias("round"),  # constant within a round
        )
        claims = claims.withColumn("url_hash", url_hash_col("url"))

        seen = self.wh.read("seen")
        to_unpersist: list[DataFrame] = []
        from ..operators.cuckoo import BucketedCuckoo

        if (
            cfg.use_bloom
            and not self._use_wh_sketch
            and self._bloom is None
            and self.wh.exists("seen")
        ):
            # bare run_round on a fresh engine (resume tests, external
            # round drivers): the driver sketch must init from `seen`
            # HERE, not only in run() — this round's or-in would
            # otherwise seed a sketch missing the seeds' (and prior
            # rounds') hashes, and a later back-link to those URLs
            # reads "definitely new", BYPASSES the exact anti-join and
            # re-fetches (observed: a self-linking seed refetched at
            # round 2). The warehouse-sketch path carries the same
            # guard for the same reason (above).
            self._bloom = self._build_bloom(seen)

        if self._use_wh_sketch:
            # warehouse-persisted sketch: the (bucket, …) shard table is
            # read straight from the warehouse and candidates cogroup
            # with it — no driver-resident sketch, no broadcast. Multi-
            # version fold (bloom OR / cuckoo max-seq) happens inside
            # the same task that probes the bucket. The init-from-seen
            # must happen HERE if it hasn't yet (not only in run()): a
            # bare run_round would otherwise create the table via the
            # round's delta append with the seeds' hashes missing — a
            # pre-filter false negative, which the definite-new branch
            # turns into a duplicate crawl.
            if not self.wh.exists(SKETCH_TABLE):
                self._init_warehouse_sketch(round_no)
            sketch_tbl = self.wh.read(SKETCH_TABLE)
            if cfg.seen_sketch == "cuckoo":
                from ..operators.cuckoo import with_cuckoo_flag_cogrouped

                flagged = with_cuckoo_flag_cogrouped(
                    claims, "url_hash", sketch_tbl, cfg.bloom_buckets
                ).persist()
            else:
                from ..operators.bloom import with_bloom_flag_cogrouped

                flagged = with_bloom_flag_cogrouped(
                    claims, "url_hash", sketch_tbl, cfg.bloom_buckets
                ).persist()
            to_unpersist.append(flagged)
            definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
            checked = maybe.join(
                seen.select("scraping_id", "url"), ["scraping_id", "url"], "left_anti"
            )
            new_urls = definite_new.unionByName(checked).persist()
        elif (
            cfg.use_bloom
            and self._apply_bloom_prefilter
            and cfg.bloom_apply == "cogrouped"
            and isinstance(self._bloom, (BucketedBloom, BucketedCuckoo))
        ):
            # 10^10-URL apply: sketch shards as a (bucket, bytes) table,
            # candidates cogrouped per bucket — no broadcast of the
            # sketch, each task holds exactly one shard
            if isinstance(self._bloom, BucketedCuckoo):
                from ..operators.cuckoo import (
                    cuckoo_table_df,
                    with_cuckoo_flag_cogrouped,
                )

                flagged = with_cuckoo_flag_cogrouped(
                    claims,
                    "url_hash",
                    cuckoo_table_df(self._bloom, self.spark),
                    self._bloom.num_shards,
                ).persist()
            else:
                from ..operators.bloom import (
                    bloom_bits_df,
                    with_bloom_flag_cogrouped,
                )

                flagged = with_bloom_flag_cogrouped(
                    claims,
                    "url_hash",
                    bloom_bits_df(self._bloom, self.spark),
                    self._bloom.num_buckets,
                ).persist()
            to_unpersist.append(flagged)
            definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
            checked = maybe.join(
                seen.select("scraping_id", "url"), ["scraping_id", "url"], "left_anti"
            )
            new_urls = definite_new.unionByName(checked).persist()
        else:
            new_urls = prefiltered_anti_join(
                claims,
                seen,
                ["scraping_id", "url"],
                "url_hash",
                self._bloom
                if cfg.use_bloom and self._apply_bloom_prefilter
                else None,
                persist_handles=to_unpersist,
            ).persist()

        deferred = scheduled.filter(F.col("action") == ACTION_DEFER)
        next_frontier = new_urls.select(
            "scraping_id",
            "user_id",
            "url",
            "depth",
            (F.col("round") + 1).alias("round"),
        ).unionByName(
            deferred.select(
                "scraping_id",
                "user_id",
                "url",
                "depth",
                (F.col("round") + 1).alias("round"),
            )
        )
        if retries is not None:
            # retried rows ride the deferred branch: already claimed at
            # discovery, so no seen write and no re-claim
            next_frontier = next_frontier.unionByName(
                retries.select(
                    "scraping_id",
                    "user_id",
                    "url",
                    "depth",
                    (F.col("round") + 1).alias("round"),
                )
            )
        seen_new = new_urls.select(
            "scraping_id",
            "url",
            "url_hash",
            F.col("depth").alias("first_depth"),
            (F.col("round") + 1).alias("round"),
        )

        # ONE concurrent wall: every fan-out write, the claim pipeline
        # and both stats aggregates are independent given the cached
        # `parsed` (per-block cache locks make concurrent first
        # materialization safe) — submit them all as concurrent Spark
        # jobs from driver threads. seen/frontier depend on new_urls, so
        # their chain materializes it first, then writes both in
        # parallel. The serial plan-compile + commit wall was the
        # scaling bottleneck (BENCH §5/§6); each table has its own
        # manifest, so commits don't contend.
        from concurrent.futures import ThreadPoolExecutor

        def _w(table, df):
            if df is not None:
                t = time.monotonic()
                self.wh.append(table, df, {"round": round_no})
                if cfg.debug_timing:
                    print(
                        f"        [write {table}] {time.monotonic() - t:.2f}s",
                        flush=True,
                    )

        def _claim_chain() -> int:
            # n_new rides the seen WRITE as an Observation metric
            # (seen_new is 1:1 with new_urls) instead of a separate
            # count() job that serialized ahead of both writes: the
            # writes themselves materialize the new_urls cache at full
            # width (per-block cache locks make the concurrent first
            # materialization safe — the same contract the parsed-cache
            # writers rely on), so the chain is max(write, write), not
            # count + max(write, write).
            from pyspark.sql import Observation

            t = time.monotonic()
            obs = Observation()
            seen_obs = seen_new.observe(obs, F.count(F.lit(1)).alias("n"))
            with ThreadPoolExecutor(max_workers=2) as p2:
                fs = [
                    p2.submit(
                        self.wh.append,
                        "seen",
                        seen_obs,
                        {"round": round_no + 1},
                    ),
                    p2.submit(
                        self.wh.append,
                        "frontier",
                        next_frontier,
                        {"round": round_no + 1},
                    ),
                ]
                for f in fs:
                    f.result()
            n = int(obs.get["n"])
            if cfg.debug_timing:
                print(
                    f"        [claims chain] {time.monotonic() - t:.2f}s",
                    flush=True,
                )
            return n

        def _write_postings() -> None:
            # incremental inverted index (S7's OpenSearch-indexer analog,
            # opensearch_repository.go:23-56): this round's pages fold
            # into (term, doc, frequency) posting rows under
            # round=N/term_bucket=B dirs — searches probe one bucket,
            # partial rounds roll back by directory remove
            from ..sources.postings import build_postings, write_postings

            write_postings(
                build_postings(
                    ok.select("scraping_id", "url", "user_id", "round", "content"),
                    ["scraping_id", "url", "user_id", "round"],
                    "content",
                    cfg.postings_term_buckets,
                ),
                self.postings_path,
                partition_cols=["round", "term_bucket"],
            )

        def _write_grams() -> None:
            # incremental substring (n-gram) index: distinct content +
            # summary grams per page under the same (round, term_bucket)
            # layout — rollback/compaction ride the postings machinery.
            # `summary` is the SAME column expression the pages writer
            # selects (computed once on `ok`), evaluated off the cached
            # parsed blocks. INVARIANT (unchanged from the pre-refactor
            # shape): this write is a separate JOB from the pages write,
            # so the expression is re-EVALUATED even though it is no
            # longer re-STATED — a nondeterministic summarizer provider
            # must instead build grams from the COMMITTED pages rows
            # (read-back after the pages future completes). True for no
            # provider this environment ships.
            from ..sources.postings import build_grams, write_postings

            src = ok.select(
                "scraping_id",
                "url",
                "user_id",
                "round",
                "content",
                "summary",
            )
            write_postings(
                build_grams(
                    src,
                    ["scraping_id", "url", "user_id", "round"],
                    ["content", "summary"],
                    cfg.gram_len,
                    cfg.postings_term_buckets,
                ),
                self.grams_path,
                partition_cols=["round", "term_bucket"],
            )

        metrics_parts = None
        if cfg.per_partition_metrics:
            # per-partition lineage: aggregate the round's CACHED parsed
            # frame by physical task partition — no extra scan of source
            # data, no shuffle wider than one row per partition. `round`
            # rides as a column (constant-plan rule).
            metrics_parts = parsed.groupBy(
                F.spark_partition_id().alias("partition_id")
            ).agg(
                F.count("*").alias("attempted"),
                F.sum(F.col("ok").cast("long")).alias("fetched"),
                F.sum(
                    ((~F.col("ok")) & F.col("location").isNull()).cast("long")
                ).alias("fetch_errors"),
                F.sum(
                    F.when(F.col("ok"), F.size("links")).otherwise(F.lit(0))
                ).alias("links_extracted"),
                F.max("round").alias("round"),
            )

        if cfg.debug_timing:
            print(f"      [plan build] {time.monotonic() - _t_plan:.2f}s", flush=True)
        # NOTE writer width: coalescing the parsed-derived writers to
        # row-count-sized outputs was tried (guide §6) and reverted —
        # a coalesced writer that wins the race to an unmaterialized
        # cache block computes the fused fetch+parse for MANY blocks in
        # ONE task, serializing the round's hottest stage (measured:
        # the pages write became the wall's gate). The claim-chain's
        # seen/frontier writes ARE coalesced: they run after new_urls
        # is cache-materialized by the count, so sizing there is free.
        with self._timed("round fan-out (single wall)"):
            with ThreadPoolExecutor(max_workers=10) as pool:
                # claims + stat aggregates submit FIRST: they scan the
                # cache at full width, so the fused fetch+parse blocks
                # materialize wide even though the writers are coalesced
                claims_fut = pool.submit(_claim_chain)
                parsed_fut = pool.submit(
                    lambda: parsed.agg(
                        F.sum(F.col("ok").cast("long")).alias("fetched"),
                        # 301s are neither fetched nor errors — their
                        # outcome is the target fetch, next round
                        F.sum(
                            ((~F.col("ok")) & F.col("location").isNull())
                            .cast("long")
                        ).alias("errors"),
                        F.sum(
                            F.when(F.col("ok"), F.size("links")).otherwise(
                                F.lit(0)
                            )
                        ).alias("links"),
                    ).first()
                )
                sched_fut = pool.submit(
                    lambda: scheduled.agg(
                        F.sum(
                            (F.col("action") == ACTION_DEFER).cast("long")
                        ).alias("deferred"),
                        F.sum(
                            (F.col("action") == ACTION_ROBOTS).cast("long")
                        ).alias("robots"),
                    ).first()
                )
                futs = [
                    pool.submit(_w, "fetch_log", fetch_log),
                    pool.submit(_w, "pages", pages),
                    pool.submit(_w, "links", links),
                    pool.submit(_w, "images", images),
                    pool.submit(_w, "index_docs", index_docs),
                    pool.submit(_w, "media_store", media),
                    claims_fut,
                    parsed_fut,
                    sched_fut,
                ]
                if metrics_parts is not None:
                    futs.append(pool.submit(_w, "metrics_parts", metrics_parts))
                if warc_blobs is not None:
                    # appended AFTER the positional block: results[6..8]
                    # are harvested by index
                    futs.append(pool.submit(_w, "warc_store", warc_blobs))
                    futs.append(pool.submit(_w, "warc_cdx", warc_cdx))
                if cfg.index_postings and cfg.indexer_enabled:
                    futs.append(pool.submit(_write_postings))
                if cfg.index_grams and cfg.indexer_enabled:
                    futs.append(pool.submit(_write_grams))
                retry_fut = None
                if retries is not None:
                    # retried rows are next-round frontier work the
                    # scheduler aggregates don't see — count them on the
                    # wall so run()'s carried urls_in stays exact (an
                    # all-retries round must not read as drained)
                    retry_fut = pool.submit(retries.count)
                    futs.append(retry_fut)
                host_fut = None
                if cfg.discover_robots:
                    # the only hosts the NEXT frontier can introduce are
                    # this round's new_urls' hosts (deferred rows were
                    # probed when first seen) — collect them on the wall
                    # (over the cached new_urls) so the next round's
                    # discovery is a pure driver set difference
                    from ..functions.url import host_col

                    host_fut = pool.submit(
                        lambda: {
                            r.host
                            for r in new_urls.select(
                                host_col("url").alias("host")
                            )
                            .distinct()
                            .collect()
                        }
                    )
                    futs.append(host_fut)
                results = [f.result() for f in futs]
        n_new = results[6]
        parsed_agg = results[7]
        sched_agg = results[8]
        if self._seen_est is not None:
            self._seen_est += n_new
        n_retries = retry_fut.result() if retry_fut is not None else 0
        if host_fut is not None:
            self._next_round_hosts = host_fut.result()

        if self.config.use_bloom:
            if self._use_wh_sketch:
                with self._timed("sketch append"):
                    self._sketch_append_round(new_urls, round_no, n_new)
            else:
                with self._timed("bloom or-in"):
                    self._or_into_bloom(new_urls, n_new)

        stats = RoundStats(
            round=round_no,
            urls_in=urls_in,
            fetched=parsed_agg["fetched"] or 0,
            fetch_errors=parsed_agg["errors"] or 0,
            links_extracted=parsed_agg["links"] or 0,
            new_urls=n_new,
            # retries are "try again next round" work, the same carried-
            # frontier semantics as politeness deferral — counting them
            # here keeps run()'s urls_in = new_urls + deferred exact
            deferred=(sched_agg["deferred"] or 0) + n_retries,
            robots_blocked=sched_agg["robots"] or 0,
            wall_ms=int((time.monotonic() - t0) * 1000),
        )
        _t_m = time.monotonic()
        # one driver-resident row: the pyarrow direct append skips a
        # whole createDataFrame + parquet Spark job per round (~0.4 s
        # measured — warehouse.append_rows docstring)
        self.wh.append_rows(
            "metrics",
            [
                (
                    -1,
                    stats.round,
                    stats.urls_in,
                    stats.fetched,
                    stats.fetch_errors,
                    stats.links_extracted,
                    stats.new_urls,
                    stats.deferred,
                    stats.robots_blocked,
                    stats.wall_ms,
                )
            ],
            "scraping_id long, round int, urls_in long, fetched long, "
            "fetch_errors long, links_extracted long, new_urls long, "
            "deferred long, robots_blocked long, wall_ms long",
            {"round": round_no},
        )
        if cfg.debug_timing:
            print(f"      [metrics write] {time.monotonic() - _t_m:.2f}s", flush=True)
        scheduled.unpersist()
        parsed.unpersist()
        if cond_latest is not None:
            cond_latest.unpersist()
        new_urls.unpersist()
        for df in to_unpersist:
            df.unpersist()
        return stats

    def _build_bloom(self, df: DataFrame) -> "BloomFilter | BucketedBloom":
        cfg = self.config
        if cfg.seen_sketch == "cuckoo":
            if cfg.bloom_buckets > 1:
                # sharded deletable sketch: shards are disjoint, so the
                # build runs distributed (one shuffle of hashes, each
                # task assembles its shard) and the apply can cogroup —
                # the 10^10-URL path with deletion support
                from ..operators.cuckoo import build_bucketed_cuckoo

                return build_bucketed_cuckoo(
                    df, "url_hash", cfg.bloom_buckets, cfg.bloom_expected_urls
                )
            if cfg.bloom_apply == "cogrouped":
                raise ValueError(
                    "cogrouped (no-broadcast) apply requires a sharded "
                    "sketch: set bloom_buckets > 1"
                )
            from ..operators.cuckoo import CuckooFilter

            ck = CuckooFilter.sized_for(cfg.bloom_expected_urls)
            ck.insert_vec(
                df.select("url_hash").toPandas()["url_hash"].to_numpy()
            )
            return ck
        if cfg.bloom_buckets > 1:
            return build_bucketed_bloom(
                df,
                "url_hash",
                cfg.bloom_buckets,
                cfg.bloom_expected_urls,
                cfg.bloom_fpp,
            )
        return build_bloom(
            df, "url_hash", cfg.bloom_expected_urls, cfg.bloom_fpp
        )

    def _or_into_bloom(self, new_urls: DataFrame, n_new: int) -> None:
        import numpy as np

        from ..operators.cuckoo import BucketedCuckoo, CuckooFilter

        if isinstance(self._bloom, (CuckooFilter, BucketedCuckoo)):
            # cuckoo tables don't OR-merge, so incremental round inserts
            # are driver-side even for the sharded variant (per-round
            # batches are small next to the table); the distributed
            # build covers full rebuilds (resume over a huge seen table)
            self._bloom.insert_vec(
                new_urls.select("url_hash").toPandas()["url_hash"].to_numpy()
            )
            return
        if self._bloom is not None and n_new <= self.config.bloom_driver_insert_max:
            # small batch: one collect beats a distributed build+merge
            # (insert_vec handles both single and bucketed sketches)
            hashes = (
                new_urls.select("url_hash").toPandas()["url_hash"].to_numpy()
            )
            self._bloom.insert_vec(hashes)
            return
        add = self._build_bloom(new_urls)
        if self._bloom is None:
            self._bloom = add
        elif isinstance(self._bloom, BucketedBloom):
            for mine, theirs in zip(self._bloom.filters, add.filters):
                mine.bits = np.bitwise_or(mine.bits, theirs.bits)
        else:
            self._bloom.bits = np.bitwise_or(self._bloom.bits, add.bits)

    # ------------------------------------------- warehouse-persisted sketch
    @property
    def _apply_bloom_prefilter(self) -> bool:
        """Whether the driver-sketch pre-filter should gate THIS round's
        anti-join: yes once the driver-known |seen| reaches
        ``bloom_apply_min_seen`` (or is unknown — bare ``run_round`` on
        a resumed engine, where applying is the safe default). Below
        the threshold the plain anti-join is cheaper than the Arrow
        flag pass + cache + two-branch union; the sketch itself is
        still maintained every round so the flip sees a current one."""
        return (
            self._seen_est is None
            or self._seen_est >= self.config.bloom_apply_min_seen
        )

    @property
    def _use_wh_sketch(self) -> bool:
        return self.config.use_bloom and self.config.sketch_store == "warehouse"

    def _cuckoo_per_shard(self) -> int:
        cfg = self.config
        return max(1, -(-cfg.bloom_expected_urls // cfg.bloom_buckets))

    def _next_sketch_seq(self) -> int:
        return int(self.wh.last_prop(SKETCH_TABLE, "seq", -1)) + 1

    def _sketch_append_round(
        self, new_urls: DataFrame, round_no: int, n_new: int
    ) -> None:
        """Commit this round's claims into the persisted sketch,
        DISTRIBUTED (the driver touches no shard bytes):

        - bloom: build the round's delta bitmaps (mapInArrow partials →
          per-bucket OR) and APPEND them — bitmaps OR-merge, so readers
          fold all of a bucket's rows; write volume = touched buckets'
          bitmaps only;
        - cuckoo: cogroup the hashes with the current shard rows and
          append UPDATED full shards stamped with the next seq —
          versions supersede (cuckoo tables don't OR).

        The commit carries the round tag, so _rollback_partial's
        standard rule reverts a half-written round's sketch exactly like
        its other outputs."""
        if n_new == 0:
            return
        cfg = self.config
        if cfg.seen_sketch == "cuckoo":
            from ..operators.cuckoo import (
                CUCKOO_SKETCH_SCHEMA,
                update_cuckoo_shards,
            )

            seq = self._next_sketch_seq()
            cur = (
                self.wh.read(SKETCH_TABLE)
                if self.wh.exists(SKETCH_TABLE)
                else self.spark.createDataFrame([], CUCKOO_SKETCH_SCHEMA)
            )
            upd = update_cuckoo_shards(
                new_urls.select("url_hash"),
                cur,
                cfg.bloom_buckets,
                self._cuckoo_per_shard(),
                seq=seq,
            )
            self.wh.append(SKETCH_TABLE, upd, {"round": round_no, "seq": seq})
        else:
            from ..operators.bloom import bucketed_bloom_delta_df

            delta = bucketed_bloom_delta_df(
                new_urls,
                "url_hash",
                cfg.bloom_buckets,
                cfg.bloom_expected_urls,
                cfg.bloom_fpp,
            )
            self.wh.append(SKETCH_TABLE, delta, {"round": round_no})

    def _init_warehouse_sketch(self, next_round: int) -> None:
        """First run with sketch_store='warehouse' (or migration of an
        existing warehouse): build the initial sketch from the committed
        `seen` table, distributed, and commit it tagged round-1 so every
        future rollback (rounds ≥ next_round) leaves it standing. On
        RESUME the table already exists and this is a no-op — that is
        the point: no rebuild-from-seen scan."""
        cfg = self.config
        if self.wh.exists(SKETCH_TABLE) or not self.wh.exists("seen"):
            return
        seen_hashes = self.wh.read("seen").select("url_hash")
        props = {"round": next_round - 1, "init": True}
        if cfg.seen_sketch == "cuckoo":
            from ..operators.cuckoo import (
                CUCKOO_SKETCH_SCHEMA,
                update_cuckoo_shards,
            )

            props["seq"] = 0
            upd = update_cuckoo_shards(
                seen_hashes,
                self.spark.createDataFrame([], CUCKOO_SKETCH_SCHEMA),
                cfg.bloom_buckets,
                self._cuckoo_per_shard(),
                seq=0,
            )
            self.wh.append(SKETCH_TABLE, upd, props)
        else:
            from ..operators.bloom import bucketed_bloom_delta_df

            self.wh.append(
                SKETCH_TABLE,
                bucketed_bloom_delta_df(
                    seen_hashes,
                    "url_hash",
                    cfg.bloom_buckets,
                    cfg.bloom_expected_urls,
                    cfg.bloom_fpp,
                ),
                props,
            )

    def _fold_sketch(self) -> None:
        """Bound the sketch table's row growth: fold every bucket's
        versions into one row (bloom: bitwise OR; cuckoo: keep the
        max-seq version) and overwrite the table. Correctness never
        depends on this — readers fold in-task — it keeps an R-round
        crawl's sketch reads from opening R commits. Runs only between
        rounds (the sketch has exactly one writer, the round loop), and
        the folded commit carries no round tag, so rollback of LATER
        partial rounds leaves it untouched (folded rounds are complete
        by construction — the fold runs after their metrics commit)."""
        import pandas as pd

        if not self.wh.exists(SKETCH_TABLE):
            return
        df = self.wh.read(SKETCH_TABLE)
        if self.config.seen_sketch == "cuckoo":
            from ..operators.cuckoo import (
                CUCKOO_SKETCH_SCHEMA,
                current_shard_idx,
            )

            def fold(pdf: pd.DataFrame) -> pd.DataFrame:
                # same supersede rule the cogrouped reader and the
                # distributed updater apply
                return pdf.loc[[current_shard_idx(pdf)]]

            out = df.groupBy("bucket").applyInPandas(fold, CUCKOO_SKETCH_SCHEMA)
            props = {"compacted": True, "seq": self._next_sketch_seq() - 1}
        else:
            from ..operators.bloom import or_fold_bits

            def fold(pdf: pd.DataFrame) -> pd.DataFrame:
                # same OR rule the delta builder and cogrouped reader use
                return pd.DataFrame(
                    {
                        "bucket": [int(pdf["bucket"].iloc[0])],
                        "num_bits": [int(pdf["num_bits"].iloc[0])],
                        "num_hashes": [int(pdf["num_hashes"].iloc[0])],
                        "bits": [or_fold_bits(pdf["bits"]).tobytes()],
                    }
                )

            out = df.groupBy("bucket").applyInPandas(
                fold, "bucket int, num_bits long, num_hashes int, bits binary"
            )
            props = {"compacted": True}
        self.wh.overwrite(SKETCH_TABLE, out, props)

    # ------------------------------------------------------------------ loop
    def run(self, start_round: int | None = None) -> list[RoundStats]:
        cfg = self.config
        r = self._next_round() if start_round is None else start_round
        self._rollback_partial(r)
        if self._use_wh_sketch:
            if cfg.bloom_buckets <= 1:
                raise ValueError(
                    "sketch_store='warehouse' requires bloom_buckets > 1 "
                    "(the warehouse table IS the shard layout)"
                )
            # no-op on resume: the committed table is the sketch (no
            # rebuild-from-seen scan — the whole point of persisting it)
            self._init_warehouse_sketch(r)
        elif cfg.use_bloom and self._bloom is None and self.wh.exists("seen"):
            self._bloom = self._build_bloom(self.wh.read("seen"))
        all_stats: list[RoundStats] = []
        orig_shuffle = self.spark.conf.get("spark.sql.shuffle.partitions")
        # exact frontier size carried between rounds (next frontier =
        # new_urls ∪ deferred, both unioned without dedup) — replaces the
        # per-round isEmpty + count actions. None = unknown (first round).
        urls_in: int | None = None
        # max_rounds is a PER-INVOCATION budget, not an absolute round
        # ceiling: the warehouse round counter is cumulative across the
        # engine's life, so a long-lived streaming deployment (many
        # run() calls, one warehouse) would otherwise hit the absolute
        # cap and silently stop fetching while still committing epochs
        # (review finding, round 5). Each run() gets max_rounds rounds
        # from wherever the counter stands; interrupt/resume tests keep
        # their meaning (a fresh engine at round 0 stops at max_rounds).
        end_round = r + cfg.max_rounds
        try:
            while r < end_round:
                if urls_in == 0:
                    break
                if urls_in is None and self.wh.read(
                    "frontier", {"round": r}
                ).isEmpty():
                    break
                stats = self.run_round(r, urls_in)
                all_stats.append(stats)
                urls_in = stats.new_urls + stats.deferred
                if (
                    cfg.compact_every_rounds
                    and (r + 1) % cfg.compact_every_rounds == 0
                ):
                    with self._timed("auto-compact"):
                        self._compact_tables(r, refold=False)
                r += 1
        finally:
            self.spark.conf.set("spark.sql.shuffle.partitions", orig_shuffle)
        self._finalize()
        return all_stats

    def resume(self) -> list[RoundStats]:
        """Resume from the last committed round: rebuild the Bloom from
        the committed seen table and continue (reference analog: SQS
        redelivery after worker crash, made exactly-once by the atomic
        per-round commits — SURVEY.md §2.10)."""
        return self.run(start_round=None)

    def _next_round(self) -> int:
        # round_max: a compacted metrics commit keeps its span as
        # round_min/round_max props (warehouse.compact), so compaction
        # never resets the global round counter
        done = [
            p.get("round", p.get("round_max"))
            for p in self.wh.commit_props("metrics")
            if "round" in p or "round_max" in p
        ]
        return (max(done) + 1) if done else 0

    def _rollback_partial(self, next_round: int) -> None:
        """Drop commits from a partially-executed round so re-running it
        is idempotent (the metrics commit is the round's completion
        marker; anything tagged beyond it is partial)."""
        # the partial round's robots commits are about to be dropped —
        # invalidate the driver caches so those hosts get re-probed and
        # the next round re-reads its frontier for hosts
        self._robots_probed = None
        self._next_round_hosts = None
        for table in (
            "fetch_log",
            "pages",
            "links",
            "images",
            "index_docs",
            "media_store",
            "warc_store",
            "warc_cdx",
            "robots",
            "robots_rules",
            "metrics",
            # metrics_parts commits on the wall BEFORE the round's
            # metrics completion marker, so a crash in between leaves a
            # partial-round commit this drop covers
            "metrics_parts",
            # the persisted sketch follows the standard rule: a partial
            # round's shard append is dropped with the round's other
            # outputs (the init commit is tagged round-1 and survives;
            # folded commits are untagged and cover complete rounds only)
            SKETCH_TABLE,
        ):
            self.wh.remove_commits(
                table, lambda p: p.get("round", -1) >= next_round
            )
        if self.config.index_postings or self.config.index_grams:
            # the postings/grams stores are round-partitioned precisely
            # so a partial round rolls back as a directory remove
            import os
            import re
            import shutil

            for store in (self.postings_path, self.grams_path):
                if not os.path.isdir(store):
                    continue
                for d in os.listdir(store):
                    m = re.fullmatch(r"round=(\d+)", d)
                    if m and int(m.group(1)) >= next_round:
                        shutil.rmtree(
                            os.path.join(store, d), ignore_errors=True
                        )
        for table in ("seen", "frontier"):
            # round r writes seen/frontier tagged r+1; start() tags 0
            self.wh.remove_commits(
                table, lambda p: p.get("round", -1) >= next_round + 1
            )

    def _compact_tables(self, completed_round: int, refold: bool) -> None:
        """Fold completed rounds' commits (round tags ≤ completed_round;
        seen/frontier write round+1 tags, so their bound is one higher).
        Safe mid-crawl: rollback/pruned reads only target rounds beyond
        the fold bound, and delete pruning still works off the folded
        commit's round_min/round_max span."""
        for table in (
            "fetch_log",
            "pages",
            "links",
            "images",
            "index_docs",
            "media_store",
            "warc_store",
            "warc_cdx",
            "robots",
            "robots_rules",
            "metrics",
            "metrics_parts",
        ):
            if self.wh.exists(table):
                self.wh.compact(
                    table,
                    upto_round=completed_round + 1,
                    refold_compacted=refold,
                )
        if self.wh.exists("seen"):
            # seen is read UNFILTERED each round, so even the freshest
            # (round+1-tagged) commits are foldable
            self.wh.compact(
                "seen", upto_round=completed_round + 2, refold_compacted=refold
            )
        if self.wh.exists("frontier"):
            # frontier round r+1 is the NEXT round's pruned read — folding
            # it would hide it (compacted commits drop the round tag);
            # only consumed rounds (≤ completed_round) fold
            self.wh.compact(
                "frontier", upto_round=completed_round + 1, refold_compacted=refold
            )
        if self._use_wh_sketch:
            # semantic fold (OR / max-seq), not a blind concat — bounds
            # sketch reads at one row per bucket
            self._fold_sketch()
        if self.config.index_postings or self.config.index_grams:
            # OpenSearch segment-merge analog: fold completed rounds'
            # posting/gram files per bucket. Periodic passes (refold=
            # False) fold only the NEW rounds into an additional store —
            # linear total I/O, ≤ R/K stores mid-crawl; finalize
            # (refold=True) collapses everything to one store so probes
            # open O(1) files per bucket regardless of crawl length.
            # Rounds that can still roll back (> completed_round) stay
            # as live round dirs.
            from ..sources.postings import compact_postings

            if self.config.index_postings:
                compact_postings(
                    self.spark,
                    self.postings_path,
                    upto_round=completed_round,
                    refold=refold,
                )
            if self.config.index_grams:
                compact_postings(
                    self.spark,
                    self.grams_path,
                    upto_round=completed_round,
                    refold=refold,
                )

    def forget_scraping(self, scraping_id: int, user_id: int) -> None:
        """DELETE /scraping/{id} plus sketch maintenance: with the
        cuckoo seen-sketch, the scraping's URL fingerprints leave the
        in-memory pre-filter too (Bloom can't delete; its sketch decays
        to all-maybe-seen across crawl/delete cycles — exactness is
        unaffected either way, the anti-join stays authoritative).
        The sketch is a refcounted multiset — one fingerprint per seen
        ROW — so a URL another scraping also claimed keeps that
        scraping's copy: no shared-URL eviction, no false negatives
        (operators/cuckoo.py insert_vec)."""
        from ..operators.cuckoo import BucketedCuckoo, CuckooFilter

        cfg = self.config
        wh_cuckoo = self._use_wh_sketch and cfg.seen_sketch == "cuckoo"
        hashes = None
        staged_hashes = None
        if wh_cuckoo and self.wh.exists(SKETCH_TABLE):
            # Stage the doomed hashes to a scratch parquet BEFORE the
            # delete rewrites the seen files (a lazy plan over them
            # would read post-delete data), but apply the sketch delete
            # AFTER delete_scraping commits: a crash in between leaves
            # fingerprints lingering (harmless maybe-seen pessimism),
            # never the reverse window where fingerprints are gone while
            # seen rows remain (a pre-filter false negative — the one
            # error class the definite-new branch can't absorb).
            import tempfile

            staged_hashes = tempfile.mkdtemp(prefix="iws-forget-")
            self.wh.read("seen").filter(
                F.col("scraping_id") == scraping_id
            ).select("url_hash").write.mode("overwrite").parquet(staged_hashes)
        elif isinstance(self._bloom, (CuckooFilter, BucketedCuckoo)):
            hashes = (
                self.wh.read("seen")
                .filter(F.col("scraping_id") == scraping_id)
                .select("url_hash")
                .toPandas()["url_hash"]
                .to_numpy()
            )
        from .api import delete_scraping

        delete_scraping(self.wh, scraping_id, user_id)
        if staged_hashes is not None:
            import shutil

            from ..operators.cuckoo import update_cuckoo_shards

            try:
                seq = self._next_sketch_seq()
                upd = update_cuckoo_shards(
                    self.spark.read.parquet(staged_hashes),
                    self.wh.read(SKETCH_TABLE),
                    cfg.bloom_buckets,
                    self._cuckoo_per_shard(),
                    seq=seq,
                    op="delete",
                )
                self.wh.append(
                    SKETCH_TABLE,
                    upd,
                    {"round": self._next_round() - 1, "seq": seq},
                )
            finally:
                shutil.rmtree(staged_hashes, ignore_errors=True)
        elif hashes is not None and self._bloom is not None:
            self._bloom.delete_vec(hashes)

    # ---------------------------------------------------------- enrichment
    def enrich(
        self,
        summaries: DataFrame | None = None,
        explanations: DataFrame | None = None,
    ) -> None:
        """Out-of-order enrichment (J3/J4/J5): late summary /
        image-explanation messages arriving AFTER their page may have
        been re-scraped (a newer round appended another row for the same
        (scraping_id, url)). The reference's writer resolves each
        message to the LATEST page version before writing
        (`workers/writer/repositories/db_repository.go:58-96`:
        ``Order("scraped_at DESC").First()``, then the image upsert on
        (page_id, s3_path) ``:70-96``). Spark rendition: window top-1
        over pages by round DESC (J3), then MERGE (J4/J5) keyed to that
        latest version.

        summaries:    (scraping_id, url, summary)
        explanations: (scraping_id, page_url, s3_path, image_url,
                       explanation)
        """
        pages = self.wh.read("pages")
        w = Window.partitionBy("scraping_id", "url").orderBy(F.desc("round"))
        latest = (
            pages.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("scraping_id", "url", F.col("round").alias("latest_round"))
        )
        # ORDER MATTERS: the images merge reads `latest` (a plan over
        # the pages files); the pages merge REWRITES those files — so
        # images must merge first, pages last.
        if explanations is not None:
            # J4: image upsert on (page, s3_path) AT the latest page
            # version — updates that version's row if the extractor
            # already wrote it, inserts a fresh row bound to the latest
            # version otherwise (the FirstOrCreate race rendition).
            upd = (
                explanations.withColumnRenamed("page_url", "url")
                .join(F.broadcast(latest), ["scraping_id", "url"])
                .select(
                    "scraping_id",
                    F.col("url").alias("page_url"),
                    "image_url",
                    "explanation",
                    "s3_path",
                    F.col("latest_round").alias("round"),
                )
            )
            self.wh.merge(
                "images",
                upd,
                ["scraping_id", "page_url", "s3_path", "round"],
                commit_pred=_round_pred(upd),
                # enrichment happens after the crawl: snapshots at any
                # completed round must fail loudly, not show the new rows
                asof_valid_from=self._next_round(),
            )
        if summaries is not None:
            # J5: summary lands on the latest page version only; older
            # versions keep theirs. merge coalesces column-wise, so
            # content stays untouched.
            upd = (
                summaries.join(F.broadcast(latest), ["scraping_id", "url"])
                .select(
                    "scraping_id",
                    "url",
                    F.lit(None).cast("string").alias("content"),
                    "summary",
                    F.col("latest_round").alias("round"),
                )
            )
            self.wh.merge(
                "pages",
                upd,
                ["scraping_id", "url", "round"],
                commit_pred=_round_pred(upd),
                asof_valid_from=self._next_round(),
            )

    # -------------------------------------------------------------- finalize
    def _finalize(self) -> None:
        """Job completion: status=COMPLETED + links_count (A2) — the
        Spark MERGE replacing the Redis pending-counter protocol
        (`dynamo_client.go:56-106`, `writer_service.go:57-63`)."""
        last_round = self._next_round() - 1
        counts = (
            self.wh.read("links")
            .groupBy("scraping_id")
            .agg(F.count("*").alias("links_count"))
        )
        jobs = self.wh.read("jobs")
        updates = (
            jobs.select("scraping_id", "url", "depth", "created_round")
            .join(counts, "scraping_id", "left")
            .select(
                "scraping_id",
                "url",
                "depth",
                F.lit("COMPLETED").alias("status"),
                F.coalesce("links_count", F.lit(0)).alias("links_count"),
                "created_round",
                F.lit(max(last_round, 0)).alias("completed_round"),
            )
        )
        # completion belongs to the last round: read_asof('jobs', last)
        # sees COMPLETED, earlier snapshots fail loudly (the whole-table
        # merge rewrote history below that bound)
        self.wh.merge(
            "jobs", updates, ["scraping_id"], asof_valid_from=max(last_round, 0)
        )
        if self.config.compact_every_rounds:
            # full collapse (refold=True): post-completion reads open ~1
            # commit per table instead of rounds×P files
            self._compact_tables(last_round, refold=True)
