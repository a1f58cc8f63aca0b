"""spark-submit entry point: run a crawl from the command line.

The cluster deployment path (north_rule: ``spark-submit --py-files``):

    spark-submit --master <cluster> --py-files iws_pkg.zip crawl_cli.py \\
        --warehouse /data/crawl1 --seed http://h0.test/p0.html --depth 3 \\
        --corpus /data/corpus_parquet --budget 64

Corpus modes: --corpus <partitioned parquet path> (point-lookup fetch),
or --synthetic-hosts N (generator-backed synthetic web). Resume by
rerunning with the same --warehouse (picks up after the last committed
round).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")

from isidorus_web_scraper_spark.corpus import make_html_resolver  # noqa: E402
from isidorus_web_scraper_spark.plans.crawl import (  # noqa: E402
    CrawlConfig,
    CrawlEngine,
)
from isidorus_web_scraper_spark.session import get_spark  # noqa: E402
from isidorus_web_scraper_spark.sources.corpus_store import (  # noqa: E402
    make_partitioned_fetcher,
)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--seed", action="append", default=[],
                    help="seed URL (repeatable); scraping ids are assigned 1..n")
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--user-id", type=int, default=1)
    ap.add_argument("--corpus", help="bucket-partitioned corpus parquet path")
    ap.add_argument("--corpus-buckets", type=int, default=64)
    ap.add_argument("--synthetic-hosts", type=int,
                    help="generator-backed synthetic web instead of --corpus")
    ap.add_argument("--budget", type=int, default=8,
                    help="fetches per round per budget key: per host, or per registrable domain when --budget-scope domain (Hamilton-split across its hosts)")
    ap.add_argument("--max-rounds", type=int, default=64)
    ap.add_argument("--discover-robots", action="store_true",
                    help="probe /robots.txt for new hosts each round and "
                    "enforce the parsed rules (probe-once, resume-safe)")
    ap.add_argument("--index-postings", action="store_true",
                    help="maintain the posting-list search index "
                    "incrementally (sources/postings.py)")
    ap.add_argument("--sitemap-seeding", action="store_true",
                    help="seed from robots.txt Sitemap: directives at "
                    "host discovery (requires --discover-robots)")
    ap.add_argument("--follow-redirects", action="store_true",
                    help="re-enqueue 301 Locations through the claims "
                    "pipeline at unchanged depth")
    ap.add_argument("--conditional-fetch", action="store_true",
                    help="hash-validated 304s reuse stored summaries "
                    "on recrawl")
    ap.add_argument("--archive-warc", action="store_true",
                    help="emit per-round WARC blobs + byte-offset CDX "
                    "(warc_store / warc_cdx tables)")
    ap.add_argument("--warc-files-per-round", type=int, default=4)
    ap.add_argument("--retry-max-attempts", type=int, default=0,
                    help="transient-failure refetch attempts (503s)")
    ap.add_argument("--error-backoff-threshold", type=float, default=None,
                    help="per-host circuit breaker: 5xx share of the "
                    "trailing window's attempts that trips a cooldown "
                    "(e.g. 0.5); off when omitted")
    ap.add_argument("--error-backoff-rounds", type=int, default=2,
                    help="cooldown length (rounds) after a breaker trip")
    ap.add_argument("--error-backoff-min-attempts", type=int, default=4,
                    help="attempts floor before the breaker may trip")
    ap.add_argument("--budget-scope", choices=["host", "domain"],
                    default="host",
                    help="budget key: per hostname, or per registrable "
                    "domain Hamilton-apportioned across its hosts "
                    "(subdomain farms share one budget)")
    ap.add_argument("--domain-labels", type=int, default=2,
                    help="registrable domain = the host's last N labels")
    ap.add_argument("--frontier-priority", choices=["depth", "indegree"],
                    default="depth",
                    help="budget-truncation order within a depth level: "
                    "depth (BFS, first-discovered) or indegree "
                    "(OPIC-lite: most-linked-to URLs fetch first)")
    ap.add_argument("--resume", action="store_true",
                    help="continue an existing warehouse (no new seeds)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark("iws-crawl", master=args.master)
    if args.synthetic_hosts:
        resolver = make_html_resolver(
            n_hosts=args.synthetic_hosts, base=args.synthetic_hosts
        )
    elif args.corpus:
        resolver = make_partitioned_fetcher(args.corpus, args.corpus_buckets)
    else:
        ap.error("one of --corpus / --synthetic-hosts is required")

    eng = CrawlEngine(
        spark,
        args.warehouse,
        resolver=resolver,
        config=CrawlConfig(
            default_budget=args.budget,
            max_rounds=args.max_rounds,
            discover_robots=args.discover_robots,
            index_postings=args.index_postings,
            sitemap_seeding=args.sitemap_seeding,
            follow_redirects=args.follow_redirects,
            conditional_fetch=args.conditional_fetch,
            archive_warc=args.archive_warc,
            warc_files_per_round=args.warc_files_per_round,
            retry_max_attempts=args.retry_max_attempts,
            error_backoff_threshold=args.error_backoff_threshold,
            error_backoff_rounds=args.error_backoff_rounds,
            error_backoff_min_attempts=args.error_backoff_min_attempts,
            budget_scope=args.budget_scope,
            domain_labels=args.domain_labels,
            frontier_priority=args.frontier_priority,
        ),
    )
    if args.resume:
        stats = eng.resume()
    else:
        if not args.seed:
            ap.error("--seed required unless --resume")
        eng.start(
            [(i + 1, args.user_id, url, args.depth) for i, url in enumerate(args.seed)]
        )
        stats = eng.run()

    print(
        json.dumps(
            {
                "rounds": len(stats),
                "fetched": sum(s.fetched for s in stats),
                "new_urls": sum(s.new_urls for s in stats),
                "fetch_errors": sum(s.fetch_errors for s in stats),
                "deferred": sum(s.deferred for s in stats),
                "wall_ms": sum(s.wall_ms for s in stats),
            }
        )
    )


if __name__ == "__main__":
    main()
