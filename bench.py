#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Components:
- ``crawl``: the flagship metric — URLs fetched+deduped over a
  generator-backed synthetic web (zipf hot-host skew, politeness budget
  enforced, Bloom seen-set pre-filter on), reported as
  ``extra.crawl_urls_per_sec``;
- three representative driver-contract queries at $SPARK_GRAFT_SF_DIR.

Scaling-efficiency evidence (north_rule N vs 4N executors) is produced
by ``bench/scaling.py``, which runs THIS workload at local[8] vs
local[32] — see BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from isidorus_web_scraper_spark.corpus import (  # noqa: E402
    make_html_resolver,
    make_page_fn,
    make_resolver,
    page_url,
)
from isidorus_web_scraper_spark.driver_queries import QUERIES  # noqa: E402
from isidorus_web_scraper_spark.plans.crawl import (  # noqa: E402
    CrawlConfig,
    CrawlEngine,
)
from isidorus_web_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Python-UDF-stage parallelism cap. local[32] emulates one absurdly
# wide executor; real clusters run 4-8-core executors precisely because
# per-JVM memory bandwidth saturates (this host: 32 workers 4.9k URLs/s,
# 16 workers 9.7k, 8 workers 8.8k — BENCH/BASELINE.md §12). 16 = this
# host's measured saturation knee; the engine itself takes it as plain
# config (CrawlConfig.max_parallelism).
PY_CAP = int(os.environ.get("SPARK_GRAFT_PY_STAGE_CAP", "16"))
N_SEEDS = int(os.environ.get("SPARK_GRAFT_CRAWL_SEEDS", "8192"))
DEPTH = int(os.environ.get("SPARK_GRAFT_CRAWL_DEPTH", "3"))
N_HOSTS = 65536
HOST_BASE = 65536  # host0 has 64k pages; zipf address space ≈ 320k pages
BUDGET = int(os.environ.get("SPARK_GRAFT_CRAWL_BUDGET", "4096"))
SKEW = os.environ.get("SPARK_GRAFT_SKEW", "0") == "1"      # all seeds on the hot host
SALT = os.environ.get("SPARK_GRAFT_CRAWL_SALT", "0") == "1"  # salted repartition of parse
# "html" = fetch returns raw HTML, tokenized by the real parser UDF
# (realistic, compute-bound); "spans" = pre-tokenized corpus; "table" =
# the 100-TB input_hint shape: a MATERIALIZED bucket-partitioned
# raw-HTML documents store (sources/corpus_store.py), fetched by
# partition-pruned broadcast join — generated once into /tmp and reused
# across trials (generation excluded from crawl timing)
MODE = os.environ.get("SPARK_GRAFT_CRAWL_MODE", "html")
# table-mode scheduler A/B: "vectorized" (mapInPandas, engine default —
# won the 4/4 interleaved A/B at the table shape, BENCH/BASELINE.md §16)
# vs "window" (pure JVM, selectable for zero-Python rounds) vs "grouped"
POL_IMPL = os.environ.get("SPARK_GRAFT_POLITENESS_IMPL", "vectorized")
# 1 (default): fused schedule+fetch+parse — one Arrow round-trip and one
# shuffle per round. 0: staged resolver path (A/B control, r2 baseline).
FUSE = os.environ.get("SPARK_GRAFT_FUSE", "1") == "1"
# 1: crawl + host_health only (fast interleaved A/B loops); queries skipped
CRAWL_ONLY = os.environ.get("SPARK_GRAFT_CRAWL_ONLY", "0") == "1"
# "driver" (default, r1-r4-comparable) vs "warehouse": persist the
# sharded seen-sketch as the seen_sketch table (distributed delta
# appends + cogrouped table-fed apply; the 10^10-URL lifecycle path).
# A/B'd in BENCH/BASELINE.md §17.
SKETCH_STORE = os.environ.get("SPARK_GRAFT_SKETCH_STORE", "driver")
# shard count when SKETCH_STORE=warehouse (must be >1: the table IS the
# shard layout)
SKETCH_BUCKETS = int(os.environ.get("SPARK_GRAFT_SKETCH_BUCKETS", "32"))
BENCH_QUERIES = [
    "flagship_doc_stats",
    "crawl_bfs_depth3",
    "latest_page_pick",
    # training-data pipeline representatives (regression-tracked per round)
    "dedup_lsh_verified_jaccard",
    "decontaminate_benchmark",
    "events_sessionization",
    "text_quality",
    # r5 additions: temporal as-of join, substring-level dedup,
    # clustering (3 Lloyd rounds) and the winnowing sketch
    "events_asof_join",
    "dedup_exact_substring",
    "kmeans_train",
    "winnowing_fingerprint",
    "dedup_incremental_lsh",
    "bm25_indexed",
    # r5 session 3: the zero-shuffle JVM span fold representative
    "caption_align",
    # r5 session 4: the corpus-wide bigram LM (two corpus-scale
    # shuffles + a pair-keyed join) and the iterative graph centrality
    "lm_bigram_familiarity",
    "hits_hub_authority",
    # r5 session 5: the two-pass Misra-Gries sketch (mapInPandas pass 1
    # + broadcast-candidate exact pass 2) and the deletion-index join
    "heavy_hitters",
    "symspell_fuzzy_pairs",
    # r5 session 6: the bounded iterative peel (k-core, ~10 driver-
    # gated rounds over a shrinking edge frame) and the 5-way
    # broadcast-dim star join (TPC-H Q5 shape)
    "kcore_linkfarm",
    "local_supplier_volume",
    # r5 session 7: the 6-way broadcast star with one fact-fact shuffle
    # (TPC-H Q8 shape) and seed-teleport iterative diffusion (PPR)
    "nation_market_share",
    "personalized_pagerank",
    # r5 session 7 (late): the broadcast-scan kNN vote composite (the
    # ann_bruteforce plan + two rollups) and the two-arm hybrid
    # retrieval fusion (BM25 corpus pass + cosine top-k + 10x10 join)
    "knn_classifier_accuracy",
    "hybrid_search_rrf",
    # r5 session 8: the generated-spine left join (hour sequence ×
    # broadcast types — spine length independent of event volume) and
    # the corpus-explode vocab rollup (hapax tail)
    "events_fano_burstiness",
    "vocab_hapax_rate",
    # r5 sessions 14-15: the directed-SCC pointer-jumping peel (the
    # heaviest iterative graph op) and the multi-scale R/S block
    # analysis (4x block-partitioned cumulative windows off one rollup)
    "scc_page_graph",
    "hurst_exponent",
    # r5 session 16: the exact-ECDF global-sort fold (one total-order
    # window over the corpus — the honest cost ceiling of the
    # goodness-of-fit family) and the double-sweep condensed-graph BFS
    # (2x8 checkpointed frontier rounds on the host graph)
    "anderson_darling_uniform",
    "host_graph_diameter",
]


def _table_corpus_path(spark) -> str:
    """Materialize (once, cached in /tmp across trials) the synthetic
    web as a bucket-partitioned raw-HTML store — the table-backed fetch
    path's input."""
    from isidorus_web_scraper_spark.corpus import generate_documents_html
    from isidorus_web_scraper_spark.sources.corpus_store import (
        write_partitioned_corpus,
    )

    path = os.path.join(
        tempfile.gettempdir(), f"iws-bench-corpus-{N_HOSTS}-{HOST_BASE}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = generate_documents_html(
            spark, n_hosts=N_HOSTS, base=HOST_BASE, partitions=CPUS
        )
        write_partitioned_corpus(docs, path)
    return path


def crawl_bench(
    spark, depth: int | None = None, n_seeds: int | None = None
) -> tuple[float, dict]:
    depth = DEPTH if depth is None else depth
    n_seeds = N_SEEDS if n_seeds is None else n_seeds
    wh_dir = tempfile.mkdtemp(prefix="iws-bench-")
    if MODE == "table":
        from isidorus_web_scraper_spark.sources.corpus_store import (
            make_partitioned_fetcher,
        )

        page_fn, resolver = None, make_partitioned_fetcher(
            _table_corpus_path(spark)
        )
    else:
        page_fn = (
            make_page_fn(n_hosts=N_HOSTS, base=HOST_BASE, mode=MODE)
            if FUSE
            else None
        )
        resolver = (
            None
            if FUSE
            else make_html_resolver(n_hosts=N_HOSTS, base=HOST_BASE)
            if MODE == "html"
            else make_resolver(n_hosts=N_HOSTS, base=HOST_BASE)
        )
    eng = CrawlEngine(
        spark,
        wh_dir,
        page_fn=page_fn,
        resolver=resolver,
        politeness=spark.createDataFrame(
            # explicit budget row for the hot host + permissive default
            [("h0.test", BUDGET, [], 0)],
            "host string, max_fetches_per_round int, "
            "robots_disallow array<string>, crawl_delay_rounds int",
        ),
        config=CrawlConfig(
            default_budget=BUDGET,
            bloom_expected_urls=1 << 18,
            max_rounds=depth + 6,
            repartition_parsed=CPUS if SALT else None,
            max_parallelism=min(CPUS, PY_CAP),
            politeness_impl=POL_IMPL,
            sketch_store=SKETCH_STORE,
            **(
                {"bloom_buckets": SKETCH_BUCKETS}
                if SKETCH_STORE == "warehouse"
                else {}
            ),
            # crawl metric = the round loop (r1/r2-comparable); the
            # finalize full-collapse is a completed-crawl I/O amortization,
            # A/B'd separately in BENCH/BASELINE.md (auto-compact section)
            compact_every_rounds=None,
        ),
    )
    if SKEW:
        # hot-host stress: every seed on host 0 (zipf head)
        seeds = [(h, 1, page_url(0, h), depth) for h in range(n_seeds)]
    else:
        seeds = [
            (h, 1, page_url(h % 4096, h // 4096), depth) for h in range(n_seeds)
        ]
    eng.start(seeds)
    t0 = time.monotonic()
    stats = eng.run()
    wall = time.monotonic() - t0
    fetched = sum(s.fetched for s in stats)
    deduped = sum(s.new_urls for s in stats)
    # ~2 GB of warehouse per run; repeated bench invocations would fill
    # the disk (ENOSPC mid-trial skews measurements)
    import shutil

    shutil.rmtree(wh_dir, ignore_errors=True)
    # marginal rate: the biggest round's own pages/s. Fixed per-round
    # costs (codegen compile, worker spawn, commit bookkeeping) dominate
    # small/short crawls and dilute the aggregate rate; grid-scale
    # crawls are marginal-rate-dominated, so health probes gate on this.
    big = max(stats, key=lambda s: s.fetched, default=None)
    marginal = (
        round(big.fetched / (big.wall_ms / 1000.0), 1)
        if big and big.wall_ms
        else 0.0
    )
    return wall, {
        "crawl_rounds": len(stats),
        "crawl_urls_fetched": fetched,
        "crawl_urls_deduped": deduped,
        "crawl_urls_per_sec": round(fetched / wall, 1) if wall else 0.0,
        "crawl_marginal_pages_per_sec": marginal,
    }


def _purepy_chunk(args: tuple) -> int:
    # same workload as bench/scaling.py's control (kept in sync; the
    # bench/ dir can't be imported as a package here — bench.py shadows
    # the name)
    lo, hi = args
    from isidorus_web_scraper_spark.corpus import page_html, page_url
    from isidorus_web_scraper_spark.functions.html_tokenize import tokenize_html

    n = 0
    for h in range(lo, hi):
        html = page_html(
            page_url(h % 4096, h // 4096),
            n_hosts=65536, base=65536, links_out=8,
            big_page_every=1000, fatness=8,
        )
        if html is not None:
            n += len(tokenize_html(html))
    return n


def host_health() -> dict:
    """Pre-flight host-health control, run BEFORE Spark starts: the
    crawl's own fetch+parse work (generate HTML + tokenize) in plain
    multiprocessing. This VM's co-tenant memory-bus pressure is
    invisible to /proc/stat and has produced 3-5× swings on identical
    binaries (BENCH/BASELINE.md §14, VERDICT r3); the control gives
    every BENCH_r*.json an absolute same-workload yardstick so a
    degraded window is visible IN the artifact instead of reading as a
    code regression. The band lives in BENCH/host_band.json (recorded
    on a healthy run); healthy=false means absolute numbers in this
    file are void — compare only same-session A/Bs."""
    import multiprocessing as mp

    procs, n_pages = 8, 16_000
    chunks = [
        (i * n_pages // procs, (i + 1) * n_pages // procs) for i in range(procs)
    ]
    t = time.monotonic()
    with mp.Pool(procs) as pool:
        pool.map(_purepy_chunk, chunks)
    rate = round(n_pages / (time.monotonic() - t), 1)
    band_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH", "host_band.json")
    band = None
    if os.path.exists(band_path):
        with open(band_path) as f:
            band = json.load(f).get("purepy_8p_pages_per_sec_band")
    return {
        "purepy_8p_pages_per_sec": rate,
        "band": band,
        "healthy": (band is None) or (rate >= band[0]),
    }


def main() -> None:
    health = host_health()
    spark = get_spark("iws-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

    timings: dict[str, float] = {}
    t0 = time.monotonic()
    wall, extra = crawl_bench(spark)
    timings["crawl"] = round(wall, 3)

    if not CRAWL_ONLY:
        # index-backed queries: when their store is missing, run once
        # untimed so the one-time build (corpus LSH index /
        # postings+doclens) lands outside the timed probe — the number
        # tracked round-over-round is the steady-state probe cost. When
        # the store already exists the warm-up is skipped (it would be
        # a duplicate full probe).
        from isidorus_web_scraper_spark.sources.index_cache import cached_store

        for name, store, marker in (
            ("dedup_incremental_lsh", "dedupidx", "grams/_SUCCESS"),
            ("bm25_indexed", "postings", "_doclen_meta.json"),
        ):
            if not cached_store(SF_DIR, store, marker)[1]:
                QUERIES[name](spark, SF_DIR).collect()

    for name in [] if CRAWL_ONLY else BENCH_QUERIES:
        t = time.monotonic()
        QUERIES[name](spark, SF_DIR).collect()
        timings[name] = round(time.monotonic() - t, 3)

    total = round(time.monotonic() - t0, 3)
    # post-run control: a pre-flight-only gate can stamp healthy=true on
    # an artifact whose measurements straddled a mid-run host collapse
    # (observed in r4: 2x swings both directions within one session,
    # VERDICT r4 "What's wrong" #2). healthy requires BOTH samples in
    # band — a mid-run collapse now voids the artifact that contains it.
    health_post = host_health()
    # Spark-shaped probe (2026-08-17 evidence, BENCH/BASELINE.md §19):
    # a window stamped purepy-healthy pre AND post recorded the crawl at
    # 532 urls/s — 1/6 of the same code's same-week pace. CPU-rate
    # controls cannot see Spark-shaped host degradation, so the stamp
    # carries a depth-1 crawl's rate too: readers compare it against the
    # floor (degraded windows read ~300-600; healthy local[32] sessions
    # project 2000+) to adjudicate whether a bad headline number is code
    # or host. Runs AFTER `total` is computed — timings are unaffected.
    # CRAWL_ONLY callers (scaling grids, interleaved A/B loops) invoke
    # bench.py many times with their own per-trial controls — skip the
    # probe there so arms stay cheap and r1-r4-comparable.
    health = {
        "pre": health,
        "post": health_post,
        "healthy": health["healthy"] and health_post["healthy"],
    }
    if not CRAWL_ONLY:
        _, probe_extra = crawl_bench(spark, depth=1, n_seeds=4096)
        probe_rate = probe_extra["crawl_urls_per_sec"]
        probe_marginal = probe_extra["crawl_marginal_pages_per_sec"]
        # gate on the MARGINAL rate (biggest round's pages/s): the
        # short probe's aggregate is fixed-cost-diluted; the headline
        # crawl is marginal-rate-dominated. Floor calibrated for the
        # default local[32]: degraded windows read well under 1500,
        # healthy sessions 4000+.
        probe_min = float(
            os.environ.get("SPARK_GRAFT_SPARK_PROBE_MIN", "2500")
        )
        health.update(
            spark_probe_urls_per_sec=probe_rate,
            spark_probe_marginal_pages_per_sec=probe_marginal,
            spark_probe_min=probe_min,
            spark_healthy=probe_marginal >= probe_min,
            healthy=health["healthy"] and probe_marginal >= probe_min,
        )
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
                "host_health": health,
            }
        )
    )


if __name__ == "__main__":
    main()
