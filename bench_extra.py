#!/usr/bin/env python
"""Per-query isolation profiler (guide §1.4): times each benched query
with the noop sink (computation only, no collect-to-driver cost) and
dumps ``explain("formatted")`` for plan auditing.

Usage:
  python bench_extra.py [query ...]        # default: the bench.py list
  SPARK_GRAFT_PLAN_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=_before \
      python bench_extra.py                # also write plan files

Prints one JSON line: {"queries": {name: [t1, t2, ...]}, "sf": ...}.
bench.py itself is FROZEN for driver measurement; this file is the
round-6 optimization evidence collector only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from isidorus_web_scraper_spark.driver_queries import QUERIES  # noqa: E402
from isidorus_web_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))
PLAN_DIR = os.environ.get("SPARK_GRAFT_PLAN_DIR", "")
PLAN_SUFFIX = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "_before")

DEFAULT_QUERIES = [
    "flagship_doc_stats",
    "crawl_bfs_depth3",
    "latest_page_pick",
    "dedup_lsh_verified_jaccard",
    "decontaminate_benchmark",
    "events_sessionization",
    "text_quality",
    "events_asof_join",
    "dedup_exact_substring",
    "kmeans_train",
    "winnowing_fingerprint",
    "dedup_incremental_lsh",
    "bm25_indexed",
    "caption_align",
    "lm_bigram_familiarity",
    "hits_hub_authority",
    "heavy_hitters",
    "symspell_fuzzy_pairs",
    "kcore_linkfarm",
    "local_supplier_volume",
    "nation_market_share",
    "personalized_pagerank",
    "knn_classifier_accuracy",
    "hybrid_search_rrf",
    "events_fano_burstiness",
    "vocab_hapax_rate",
    "scc_page_graph",
    "hurst_exponent",
    "anderson_darling_uniform",
    "host_graph_diameter",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark(
        "iws-bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )

    # one-time index-store builds (outside timed region, same as bench.py)
    from isidorus_web_scraper_spark.sources.index_cache import cached_store

    for name, store, marker in (
        ("dedup_incremental_lsh", "dedupidx", "grams/_SUCCESS"),
        ("bm25_indexed", "postings", "_doclen_meta.json"),
    ):
        if name in names and not cached_store(SF_DIR, store, marker)[1]:
            QUERIES[name](spark, SF_DIR).collect()

    # session warmup (untimed): first query in a session pays one-time
    # codegen/shuffle/Arrow init (~3-5 s) — bench.py's crawl absorbs it
    # there; absorb it here so rep-1 numbers are comparable
    QUERIES["flagship_doc_stats"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        df = QUERIES[name](spark, SF_DIR)
        if PLAN_DIR:
            os.makedirs(PLAN_DIR, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(PLAN_DIR, f"{name}{PLAN_SUFFIX}.txt"), "w"
            ) as f:
                f.write(plan)
        samples = []
        for _ in range(REPS):
            # fresh plan per rep: shared caches persist across reps (as
            # in bench.py's serial run), but no result memoization.
            # The BUILD is inside the timed region: iterative queries
            # (scc, kcore, sweeps) run their eager localCheckpoint
            # loops at DataFrame-build time — bench.py times them too.
            t0 = time.monotonic()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        timings[name] = samples
        spark.sparkContext.setJobDescription(None)
        print(f"## {name}: {samples}", file=sys.stderr)

    print(json.dumps({"queries": timings, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
