#!/usr/bin/env python
"""Round-phase breakdown of the bench crawl (debug_timing=True) —
same workload as bench.py crawl_bench, evidence collector for r6."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isidorus_web_scraper_spark.corpus import make_page_fn, page_url
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from isidorus_web_scraper_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PY_CAP = int(os.environ.get("SPARK_GRAFT_PY_STAGE_CAP", "16"))
N_SEEDS = int(os.environ.get("SPARK_GRAFT_CRAWL_SEEDS", "8192"))
DEPTH = int(os.environ.get("SPARK_GRAFT_CRAWL_DEPTH", "3"))
BUDGET = int(os.environ.get("SPARK_GRAFT_CRAWL_BUDGET", "4096"))
N_HOSTS = 65536
HOST_BASE = 65536

spark = get_spark("iws-crawl-debug", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
wh_dir = tempfile.mkdtemp(prefix="iws-crawldbg-")
eng = CrawlEngine(
    spark,
    wh_dir,
    page_fn=make_page_fn(n_hosts=N_HOSTS, base=HOST_BASE, mode="html"),
    resolver=None,
    politeness=spark.createDataFrame(
        [("h0.test", BUDGET, [], 0)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int",
    ),
    config=CrawlConfig(
        default_budget=BUDGET,
        bloom_expected_urls=1 << 18,
        max_rounds=DEPTH + 6,
        max_parallelism=min(CPUS, PY_CAP),
        politeness_impl="vectorized",
        compact_every_rounds=None,
        debug_timing=True,
    ),
)
seeds = [(h, 1, page_url(h % 4096, h // 4096), DEPTH) for h in range(N_SEEDS)]
eng.start(seeds)
t0 = time.monotonic()
stats = eng.run()
wall = time.monotonic() - t0
for s in stats:
    print(
        f"round {s.round}: urls_in={s.urls_in} fetched={s.fetched} "
        f"new={s.new_urls} wall={s.wall_ms / 1000.0:.2f}s",
        flush=True,
    )
print(f"TOTAL {wall:.2f}s  urls/s={sum(s.fetched for s in stats) / wall:.0f}")
import shutil

shutil.rmtree(wh_dir, ignore_errors=True)
