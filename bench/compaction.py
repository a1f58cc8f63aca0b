#!/usr/bin/env python
"""Auto-compaction A/B (BENCH/BASELINE.md auto-compact section).

A long crawl leaves ~rounds×P parquet files per table; every read-side
query (search, result assembly, the next round's seen scan) reopens all
of them. This measures a 16-round crawl with auto-compaction off vs on
(fold every 4 rounds + finalize full collapse):

- crawl wall (compaction is extra write I/O — the cost side),
- read-side latency: full-scan aggregates over pages/seen/links, 3
  trials each (the benefit side),
- file counts per table (the mechanism),
- end-state row counts must match exactly (safety; pytest pins full
  end-state equality separately).

A budget-throttled single-host frontier stretches the crawl to many
rounds: budget B per round over an N-page host ⇒ ~N/B rounds.

Usage: python bench/compaction.py [--seeds 64] [--budget 192]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isidorus_web_scraper_spark.corpus import make_page_fn, page_url  # noqa: E402
from isidorus_web_scraper_spark.plans.crawl import (  # noqa: E402
    CrawlConfig,
    CrawlEngine,
)
from isidorus_web_scraper_spark.session import get_spark  # noqa: E402

N_HOSTS = 8
HOST_BASE = 4096  # h0 has 4096 pages — the budget throttle's runway

READ_QUERIES = {
    "pages_scan_agg": lambda wh: wh.read("pages")
    .selectExpr("count(*) c", "sum(length(content)) b")
    .first(),
    "seen_scan": lambda wh: wh.read("seen").selectExpr("count(*) c").first(),
    "links_group": lambda wh: wh.read("links")
    .groupBy("scraping_id")
    .count()
    .collect(),
}


def run_arm(spark, compact_every, seeds, budget, depth):
    wh_dir = tempfile.mkdtemp(prefix="iws-compactab-")
    eng = CrawlEngine(
        spark,
        wh_dir,
        page_fn=make_page_fn(n_hosts=N_HOSTS, base=HOST_BASE),
        politeness=spark.createDataFrame(
            [("h0.test", budget, [], 0)],
            "host string, max_fetches_per_round int, "
            "robots_disallow array<string>, crawl_delay_rounds int",
        ),
        config=CrawlConfig(
            default_budget=budget,
            bloom_expected_urls=1 << 16,
            max_rounds=64,
            compact_every_rounds=compact_every,
        ),
    )
    eng.start([(s, 1, page_url(0, s), depth) for s in range(seeds)])
    t0 = time.monotonic()
    stats = eng.run()
    crawl_wall = time.monotonic() - t0

    reads = {}
    for name, q in READ_QUERIES.items():
        trials = []
        for _ in range(3):
            t = time.monotonic()
            q(eng.wh)
            trials.append(time.monotonic() - t)
        reads[name] = round(statistics.median(trials), 3)
    files = {
        t: len(glob.glob(os.path.join(wh_dir, t, "commit-*", "*.parquet")))
        for t in ("pages", "links", "seen", "frontier", "metrics")
    }
    end_state = {
        t: eng.wh.read(t).count() for t in ("pages", "links", "seen", "images")
    }
    shutil.rmtree(wh_dir, ignore_errors=True)
    return {
        "rounds": len(stats),
        "fetched": sum(s.fetched for s in stats),
        "crawl_sec": round(crawl_wall, 2),
        "read_median_sec": reads,
        "parquet_files": files,
        "end_state_rows": end_state,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=64)
    ap.add_argument("--budget", type=int, default=192)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()
    spark = get_spark(
        "compact-ab", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    out = {}
    for label, every in (("no_compaction", None), ("compact_every_4", 4)):
        out[label] = run_arm(spark, every, args.seeds, args.budget, args.depth)
    a, b = out["no_compaction"], out["compact_every_4"]
    assert a["end_state_rows"] == b["end_state_rows"], (
        a["end_state_rows"], b["end_state_rows"],
    )
    out["read_speedup"] = {
        k: round(a["read_median_sec"][k] / b["read_median_sec"][k], 2)
        for k in a["read_median_sec"]
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
