"""Crawl-loop end-state equality vs the pure-Python reference simulator
(FIXTURES.md §3/§5): fixture jobs from the reference's own e2e + unit
tests, plus a synthetic-corpus crawl, politeness deferral, and
resume-from-checkpoint."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.corpus import (
    GOLDEN_HTML,
    golden_documents,
    generate_documents,
    page_spans,
    all_urls,
)
from isidorus_web_scraper_spark.functions.html_tokenize import tokenize_html
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

from .reference_sim import MOCK_EXPLANATION, MOCK_SUMMARY, crawl_sim

MOCK = "http://mock-website:8000"


def golden_corpus_dict():
    return {
        url: [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in tokenize_html(html)
        ]
        for url, html in GOLDEN_HTML.items()
    }


def run_engine(spark, tmp_path, seeds, documents, config=None, politeness=None):
    # reference-parity config: permissive budget (the reference has no
    # politeness, FIXTURES.md §4) so BFS round == hop count
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        documents=documents,
        politeness=politeness,
        config=config
        or CrawlConfig(bloom_expected_urls=4096, default_budget=1_000_000_000),
    )
    eng.start(seeds)
    stats = eng.run()
    return eng, stats


def spark_end_state(eng):
    pages = {
        (r.scraping_id, r.url): (r.content, r.summary, r.round)
        for r in eng.wh.read("pages").collect()
    }
    seen = {(r.scraping_id, r.url) for r in eng.wh.read("seen").collect()}
    links = sorted(
        (r.scraping_id, r.source_url, r.target_url)
        for r in eng.wh.read("links").collect()
    )
    images = sorted(
        (r.scraping_id, r.page_url, r.image_url, r.explanation)
        for r in eng.wh.read("images").collect()
    )
    jobs = {
        r.scraping_id: (r.status, r.links_count) for r in eng.wh.read("jobs").collect()
    }
    return pages, seen, links, images, jobs


def assert_matches_sim(eng, sim, seed_depths):
    pages, seen, links, images, jobs = spark_end_state(eng)
    sim_pages = {(s, u): (c, d) for (s, u, c, d) in sim.pages}
    assert set(pages) == set(sim_pages), (
        f"page sets differ: only-spark={set(pages) - set(sim_pages)} "
        f"only-sim={set(sim_pages) - set(pages)}"
    )
    for key, (content, summary, rnd) in pages.items():
        sim_content, sim_depth = sim_pages[key]
        assert content == sim_content, f"content differs for {key}"
        # BFS round == hops == seed_depth - remaining_depth
        assert rnd == seed_depths[key[0]] - sim_depth, f"round differs for {key}"
        expected_summary = sim.summaries.get(key)
        assert summary == expected_summary, f"summary differs for {key}"
    assert seen == sim.seen
    assert links == sorted(sim.links)
    assert images == sorted(sim.images)
    assert jobs == sim.jobs


# ---------------------------------------------------------------------------
# Fixture job 1: mock/index depth 2 — e2e runner.py:229-246 (2 pages, 1 image)
# ---------------------------------------------------------------------------
def test_mock_site_depth2(spark, tmp_path):
    seeds = [(1, 10, f"{MOCK}/index.html", 2)]
    eng, _ = run_engine(spark, tmp_path, seeds, golden_documents(spark))
    sim = crawl_sim(golden_corpus_dict(), [(1, f"{MOCK}/index.html", 2)])
    assert_matches_sim(eng, sim, {1: 2})
    pages, _, _, images, jobs = spark_end_state(eng)
    assert len(pages) == 2  # index + page2 (cycle back to index deduped)
    assert len(images) == 1
    assert images[0][2] == f"{MOCK}/darth.png"
    assert images[0][3] == MOCK_EXPLANATION
    assert all(p[1] == MOCK_SUMMARY for p in pages.values())
    assert jobs[1][0] == "COMPLETED"


# ---------------------------------------------------------------------------
# Fixture job 2: cycle_a depth 5 — exactly 2 pages (runner.py:282-315)
# ---------------------------------------------------------------------------
def test_cycle_detection_depth5(spark, tmp_path):
    seeds = [(2, 10, f"{MOCK}/cycle_a.html", 5)]
    eng, stats = run_engine(spark, tmp_path, seeds, golden_documents(spark))
    sim = crawl_sim(golden_corpus_dict(), [(2, f"{MOCK}/cycle_a.html", 5)])
    assert_matches_sim(eng, sim, {2: 5})
    pages, seen, _, _, _ = spark_end_state(eng)
    assert len(pages) == 2
    assert seen == {(2, f"{MOCK}/cycle_a.html"), (2, f"{MOCK}/cycle_b.html")}
    # loop terminated by dedup, not by depth exhaustion
    assert len(stats) <= 3


# ---------------------------------------------------------------------------
# Fixture job 3: fetch-error seed — 0 pages, job still COMPLETED
# (scraper_service_test.go:642-668)
# ---------------------------------------------------------------------------
def test_fetch_error_seed(spark, tmp_path):
    seeds = [(3, 10, "http://missing.test/404.html", 2)]
    eng, _ = run_engine(spark, tmp_path, seeds, golden_documents(spark))
    sim = crawl_sim(golden_corpus_dict(), [(3, "http://missing.test/404.html", 2)])
    assert_matches_sim(eng, sim, {3: 2})
    pages, _, _, _, jobs = spark_end_state(eng)
    assert pages == {}
    assert jobs[3] == ("COMPLETED", 0)
    log = eng.wh.read("fetch_log").collect()
    assert [(r.status, r.error) for r in log] == [(404, "fetch error")]


# ---------------------------------------------------------------------------
# Fixture job 4: depth 0 — 1 page, no recursion (scraper_service_test.go:338-371)
# ---------------------------------------------------------------------------
def test_depth0_no_recursion(spark, tmp_path):
    seeds = [(4, 10, f"{MOCK}/index.html", 0)]
    eng, _ = run_engine(spark, tmp_path, seeds, golden_documents(spark))
    sim = crawl_sim(golden_corpus_dict(), [(4, f"{MOCK}/index.html", 0)])
    assert_matches_sim(eng, sim, {4: 0})
    pages, seen, links, _, _ = spark_end_state(eng)
    assert set(pages) == {(4, f"{MOCK}/index.html")}
    # depth-0 page: links recorded, but NOT claimed into seen
    assert seen == {(4, f"{MOCK}/index.html")}
    assert len(links) == 1


# ---------------------------------------------------------------------------
# Synthetic corpus crawl (zipf hosts) vs simulator — multi-round BFS
# with dedup over a real link graph, plus a second concurrent scraping.
# ---------------------------------------------------------------------------
def test_synthetic_corpus_crawl(spark, tmp_path):
    n_hosts = 6
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    corpus = {u: page_spans(u, n_hosts=n_hosts) for u in all_urls(n_hosts)}
    seeds = [
        (10, 1, "http://h0.test/p0.html", 3),
        (11, 2, "http://h1.test/p0.html", 2),
    ]
    eng, stats = run_engine(spark, tmp_path, seeds, docs)
    sim = crawl_sim(corpus, [(10, "http://h0.test/p0.html", 3), (11, "http://h1.test/p0.html", 2)])
    assert_matches_sim(eng, sim, {10: 3, 11: 2})
    assert len(stats) >= 3


# ---------------------------------------------------------------------------
# Politeness: budget=1 host defers without re-claiming; robots blocks.
# ---------------------------------------------------------------------------
def test_politeness_deferral_and_robots(spark, tmp_path):
    n_hosts = 4
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    politeness = spark.createDataFrame(
        [("h0.test", 1, [], 0), ("h1.test", 8, ["/p1.html"], 0)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        documents=docs,
        politeness=politeness,
        config=CrawlConfig(bloom_expected_urls=4096, max_rounds=40),
    )
    eng.start([(20, 1, "http://h0.test/p0.html", 3)])
    stats = eng.run()
    pages, seen, _, _, _ = spark_end_state(eng)
    # budget forces h0 fetches to spread: no round fetched >1 h0 page
    per_round_h0 = {}
    for r in eng.wh.read("pages").collect():
        if r.url.startswith("http://h0.test"):
            per_round_h0[r.round] = per_round_h0.get(r.round, 0) + 1
    assert per_round_h0 and all(v == 1 for v in per_round_h0.values())
    # robots: blocked path never fetched even if discovered
    blocked = [u for (_s, u) in seen if u == "http://h1.test/p1.html"]
    fetched_blocked = [k for k in pages if k[1] == "http://h1.test/p1.html"]
    assert fetched_blocked == []
    # every page fetched exactly once (deferral never double-claims)
    urls = [r.url for r in eng.wh.read("pages").collect()]
    assert len(urls) == len(set(urls))
    assert sum(s.deferred for s in stats) > 0


# ---------------------------------------------------------------------------
# Resume-from-checkpoint: kill after round 0, resume with a NEW engine,
# end state must equal an uninterrupted run.
# ---------------------------------------------------------------------------
def test_resume_equals_uninterrupted(spark, tmp_path):
    n_hosts = 5
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [(30, 1, "http://h0.test/p0.html", 3)]

    cfg = lambda: CrawlConfig(bloom_expected_urls=4096, default_budget=1_000_000_000)
    full = CrawlEngine(
        spark, str(tmp_path / "wh_full"), documents=docs, config=cfg()
    )
    full.start(seeds)
    full.run()

    part = CrawlEngine(
        spark, str(tmp_path / "wh_part"), documents=docs, config=cfg()
    )
    part.start(seeds)
    part.run_round(0)  # "crash" after round 0's commit

    resumed = CrawlEngine(  # fresh engine: bloom must rebuild from seen
        spark, str(tmp_path / "wh_part"), documents=docs, config=cfg()
    )
    resumed.resume()

    assert spark_end_state(resumed) == spark_end_state(full)


# ---------------------------------------------------------------------------
# Auto-compaction: folding completed rounds mid-crawl must not change the
# end state, must shrink the manifest, and must leave resume + delete
# working (round spans survive as round_min/round_max props).
# ---------------------------------------------------------------------------
def test_autocompact_preserves_end_state_and_resume(spark, tmp_path):
    n_hosts = 5
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [(40, 1, "http://h0.test/p0.html", 3)]

    base = CrawlConfig(
        bloom_expected_urls=4096,
        default_budget=1_000_000_000,
        compact_every_rounds=None,  # control: no compaction at all
    )
    full = CrawlEngine(spark, str(tmp_path / "wh_plain"), documents=docs, config=base)
    full.start(seeds)
    full.run()

    aggressive = CrawlConfig(
        bloom_expected_urls=4096,
        default_budget=1_000_000_000,
        compact_every_rounds=1,  # fold after EVERY round
    )
    comp = CrawlEngine(spark, str(tmp_path / "wh_comp"), documents=docs, config=aggressive)
    comp.start(seeds)
    comp.run()
    assert spark_end_state(comp) == spark_end_state(full)
    # post-finalize manifests are collapsed: ≤2 commits per table
    for table in ("pages", "links", "seen", "metrics"):
        n = len(comp.wh._read_manifest(table)["commits"])
        assert n <= 2, f"{table} still has {n} commits after full refold"

    # crash mid-crawl right after an auto-compaction, then resume
    part = CrawlEngine(spark, str(tmp_path / "wh_part"), documents=docs, config=aggressive)
    part.start(seeds)
    part.run_round(0)
    part._compact_tables(0, refold=False)  # what the loop does post-round
    resumed = CrawlEngine(spark, str(tmp_path / "wh_part"), documents=docs, config=aggressive)
    resumed.resume()
    assert spark_end_state(resumed) == spark_end_state(full)

    # delete after compaction still removes every row of the scraping
    from isidorus_web_scraper_spark.plans.api import delete_scraping

    delete_scraping(comp.wh, 40, 1)
    for table in ("pages", "links", "images", "seen", "frontier", "fetch_log"):
        if comp.wh.exists(table):
            left = comp.wh.read(table).filter("scraping_id = 40").count()
            assert left == 0, f"{table}: {left} rows survived delete"


# ---------------------------------------------------------------------------
# Fused schedule+fetch+parse (page_fn) must be END-STATE IDENTICAL to the
# staged resolver path — permissive AND under politeness budgets/robots.
# ---------------------------------------------------------------------------
def test_fused_page_fn_equals_resolver_mode(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import make_html_resolver, make_page_fn

    n_hosts = 5
    seeds = [(60, 1, "http://h0.test/p0.html", 3)]
    cfgf = lambda: CrawlConfig(  # noqa: E731
        bloom_expected_urls=4096, default_budget=1_000_000_000
    )
    a = CrawlEngine(
        spark, str(tmp_path / "wa"),
        resolver=make_html_resolver(n_hosts=n_hosts), config=cfgf(),
    )
    a.start(seeds)
    a.run()
    b = CrawlEngine(
        spark, str(tmp_path / "wb"),
        page_fn=make_page_fn(n_hosts=n_hosts), config=cfgf(),
    )
    b.start(seeds)
    b.run()
    assert spark_end_state(b) == spark_end_state(a)


def test_fused_page_fn_equals_resolver_under_politeness(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import make_html_resolver, make_page_fn

    n_hosts = 4
    politeness = spark.createDataFrame(
        [("h0.test", 1, [], 0), ("h1.test", 8, ["/p1.html"], 0), ("h2.test", 2, [], 1)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    seeds = [(61, 1, "http://h0.test/p0.html", 3)]
    cfgf = lambda: CrawlConfig(bloom_expected_urls=4096, max_rounds=40)  # noqa: E731
    a = CrawlEngine(
        spark, str(tmp_path / "wa"),
        resolver=make_html_resolver(n_hosts=n_hosts),
        politeness=politeness, config=cfgf(),
    )
    a.start(seeds)
    stats_a = a.run()
    b = CrawlEngine(
        spark, str(tmp_path / "wb"),
        page_fn=make_page_fn(n_hosts=n_hosts),
        politeness=politeness, config=cfgf(),
    )
    b.start(seeds)
    stats_b = b.run()
    assert spark_end_state(b) == spark_end_state(a)
    # identical deferral/robots behavior round by round
    assert [(s.deferred, s.robots_blocked, s.fetched) for s in stats_b] == [
        (s.deferred, s.robots_blocked, s.fetched) for s in stats_a
    ]


# ---------------------------------------------------------------------------
# Media GC: deleting a scraping must leave ZERO orphaned media payloads —
# the S3 batch-delete parity (deletion_service.py:64-129 deletes the
# image objects, not just the DB rows).
# ---------------------------------------------------------------------------
def test_delete_scraping_leaves_no_orphaned_media(spark, tmp_path):
    from isidorus_web_scraper_spark.plans.api import delete_scraping

    seeds = [
        (50, 1, f"{MOCK}/index.html", 2),
        (51, 2, f"{MOCK}/index.html", 2),  # second owner, same site
    ]
    eng, _ = run_engine(
        spark,
        tmp_path,
        seeds,
        golden_documents(spark),
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            media_store_enabled=True,
        ),
    )
    media_before = eng.wh.read("media_store")
    assert media_before.filter("scraping_id = 50").count() > 0
    total_bytes_51 = (
        media_before.filter("scraping_id = 51")
        .selectExpr("sum(length(payload)) b").first()["b"]
    )
    delete_scraping(eng.wh, 50, 1)
    media = eng.wh.read("media_store")
    # zero rows AND zero payload bytes left for the deleted scraping
    assert media.filter("scraping_id = 50").count() == 0
    # every surviving media row is still referenced by an images row
    # (no orphans in either direction after the cascade)
    orphans = media.join(
        eng.wh.read("images").select("scraping_id", "s3_path"),
        ["scraping_id", "s3_path"],
        "left_anti",
    ).count()
    assert orphans == 0
    # the other scraping's payloads are untouched byte-for-byte in total
    total_bytes_51_after = (
        media.filter("scraping_id = 51")
        .selectExpr("sum(length(payload)) b").first()["b"]
    )
    assert total_bytes_51_after == total_bytes_51


# ---------------------------------------------------------------------------
# Raw-HTML resolver mode: the engine tokenizes fetched HTML with the
# real parser UDF; end state must match the simulator run over the
# tokenizer's own output for the same pages.
# ---------------------------------------------------------------------------
def test_html_resolver_mode(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import make_html_resolver, page_html

    n_hosts = 4
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        resolver=make_html_resolver(n_hosts=n_hosts, fatness=1),
        config=CrawlConfig(bloom_expected_urls=4096, default_budget=1_000_000_000),
    )
    seeds = [(40, 1, "http://h0.test/p0.html", 2)]
    eng.start(seeds)
    eng.run()

    corpus = {}
    for u in all_urls(n_hosts):
        html = page_html(u, n_hosts=n_hosts, fatness=1)
        corpus[u] = [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in tokenize_html(html)
        ]
    sim = crawl_sim(corpus, [(40, "http://h0.test/p0.html", 2)])
    assert_matches_sim(eng, sim, {40: 2})


# ---------------------------------------------------------------------------
# Malformed-but-http-prefixed hrefs must not kill a round: they get
# claimed (startswith "http"), fail to fetch (404 path), crawl completes
# (ANSI parse_url would otherwise throw — pinned regression).
# ---------------------------------------------------------------------------
def test_malformed_href_survives(spark, tmp_path):
    docs = spark.createDataFrame(
        [(
            "http://ok.test/p0",
            [
                {"kind": "text", "text": "hello", "media_ref": None, "offset": 0},
                {"kind": "link", "text": None, "media_ref": "http://[bad-url", "offset": 1},
            ],
        )],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    politeness = spark.createDataFrame(
        [("ok.test", 8, [], 0)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "wh"), documents=docs, politeness=politeness,
        config=CrawlConfig(bloom_expected_urls=1024),
    )
    eng.start([(60, 1, "http://ok.test/p0", 2)])
    stats = eng.run()
    assert sum(s.fetch_errors for s in stats) == 1  # the malformed link 404s
    pages, seen, _, _, jobs = spark_end_state(eng)
    assert set(pages) == {(60, "http://ok.test/p0")}
    assert (60, "http://[bad-url") in seen  # claimed with its raw string
    assert jobs[60][0] == "COMPLETED"


# ---------------------------------------------------------------------------
# J3/J4/J5 out-of-order enrichment: a summary / image explanation
# arriving AFTER the page was re-scraped must land on the LATEST page
# version (db_repository.go:58-96 Order("scraped_at DESC").First() +
# image upsert on (page_id, s3_path)).
# ---------------------------------------------------------------------------
def test_out_of_order_enrichment(spark, tmp_path):
    from isidorus_web_scraper_spark.sources.warehouse import Warehouse

    eng = CrawlEngine(spark, str(tmp_path / "wh"))
    wh: Warehouse = eng.wh
    # page re-scraped: round 0 and round 2 versions of the same url,
    # committed per round (as the crawl does) so merge pruning is visible
    for sid, url, content, summary, rnd in [
        (1, "http://a.test/p", "old content", "old summary", 0),
        (1, "http://a.test/q", "other", None, 1),
        (1, "http://a.test/p", "new content", None, 2),
    ]:
        wh.append(
            "pages",
            spark.createDataFrame(
                [(sid, url, content, summary, rnd)],
                "scraping_id long, url string, content string, summary string, round int",
            ),
            {"round": rnd},
        )
    pages_dirs_before = {
        c["props"].get("round"): c["dir"]
        for c in wh._read_manifest("pages")["commits"]
    }
    # extractor already wrote an image row for the ROUND-2 version, and
    # one stale row for the round-0 version
    wh.append(
        "images",
        spark.createDataFrame(
            [
                (1, "http://a.test/p", "http://a.test/i.png", None, "1/abc.png", 2),
                (1, "http://a.test/p", "http://a.test/i.png", "stale", "1/abc.png", 0),
            ],
            "scraping_id long, page_url string, image_url string, "
            "explanation string, s3_path string, round int",
        ),
    )
    eng.enrich(
        summaries=spark.createDataFrame(
            [(1, "http://a.test/p", "late summary")],
            "scraping_id long, url string, summary string",
        ),
        explanations=spark.createDataFrame(
            [
                # update path: (page, s3_path) exists at the latest version
                (1, "http://a.test/p", "1/abc.png", "http://a.test/i.png", "late expl"),
                # insert path: fresh s3_path binds to the latest version
                (1, "http://a.test/p", "1/def.jpg", "http://a.test/j.jpg", "fresh expl"),
            ],
            "scraping_id long, page_url string, s3_path string, "
            "image_url string, explanation string",
        ),
    )
    pages = {
        (r.url, r.round): (r.content, r.summary)
        for r in wh.read("pages").collect()
    }
    # latest version got the summary, its content untouched
    assert pages[("http://a.test/p", 2)] == ("new content", "late summary")
    # the OLD version keeps its own summary (no cross-version bleed)
    assert pages[("http://a.test/p", 0)] == ("old content", "old summary")
    assert pages[("http://a.test/q", 1)] == ("other", None)
    images = {
        (r.s3_path, r.round): r.explanation for r in wh.read("images").collect()
    }
    assert images[("1/abc.png", 2)] == "late expl"   # updated at latest
    assert images[("1/abc.png", 0)] == "stale"       # old version untouched
    assert images[("1/def.jpg", 2)] == "fresh expl"  # inserted at latest
    assert len(images) == 3
    # merge pruning: only the latest-round commit was rewritten; the
    # round-0 and round-1 page commits are byte-identical (same dirs)
    pages_dirs_after = {
        c["props"].get("round"): c["dir"]
        for c in wh._read_manifest("pages")["commits"]
    }
    assert pages_dirs_after[0] == pages_dirs_before[0]
    assert pages_dirs_after[1] == pages_dirs_before[1]
    assert pages_dirs_after[2] != pages_dirs_before[2]


# ---------------------------------------------------------------------------
# The cogrouped (no-broadcast) Bloom apply must produce the exact same
# crawl end state as the broadcast path — the 10^10-URL seen-set apply
# is a drop-in (operators/bloom.py scale note).
# ---------------------------------------------------------------------------
def test_cogrouped_bloom_apply_equals_broadcast(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents

    n_hosts = 6
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [(70, 1, "http://h0.test/p0.html", 3)]

    ends = {}
    for mode in ("broadcast", "cogrouped"):
        eng = CrawlEngine(
            spark,
            str(tmp_path / f"wh-{mode}"),
            documents=docs,
            config=CrawlConfig(
                bloom_expected_urls=4096,
                default_budget=1_000_000_000,
                bloom_buckets=8,
                bloom_apply=mode,
                # force the bloom to actually gate from round 1 on
                bloom_driver_insert_max=200_000,
            ),
        )
        eng.start(seeds)
        eng.run()
        ends[mode] = spark_end_state(eng)
    assert ends["broadcast"] == ends["cogrouped"]


def test_fused_table_corpus_equals_staged(spark, tmp_path):
    """Table-backed corpus (the 100-TB input_hint shape): the pure-JVM
    window scheduler — which removes the round's only Arrow pass — must
    be end-state identical to the vectorized mapInPandas scheduler,
    under politeness budgets/robots/delay."""
    from isidorus_web_scraper_spark.corpus import all_urls, page_html

    n_hosts = 4
    docs = spark.createDataFrame(
        [(u, page_html(u, n_hosts=n_hosts)) for u in all_urls(n_hosts)],
        "doc_id string, html string",
    )
    politeness = spark.createDataFrame(
        [("h0.test", 2, [], 0), ("h1.test", 8, ["/p1.html"], 0), ("h2.test", 2, [], 1)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    seeds = [(80, 1, "http://h0.test/p0.html", 3)]

    def arm(name, impl):
        eng = CrawlEngine(
            spark, str(tmp_path / name), documents=docs, politeness=politeness,
            config=CrawlConfig(
                bloom_expected_urls=4096, max_rounds=40, politeness_impl=impl
            ),
        )
        eng.start(seeds)
        stats = eng.run()
        return eng, stats

    w, stats_w = arm("ww", "window")
    v, stats_v = arm("wv", "vectorized")
    assert spark_end_state(w) == spark_end_state(v)
    assert [(s.deferred, s.robots_blocked, s.fetched) for s in stats_w] == [
        (s.deferred, s.robots_blocked, s.fetched) for s in stats_v
    ]


# ---------------------------------------------------------------------------
# Per-partition lineage (north_rule; CrawlConfig.per_partition_metrics):
# every round's metrics_parts rows tie out EXACTLY to its metrics row —
# fetched/fetch_errors/links_extracted sums match, attempted sums to
# fetched+errors — and rows exist for every completed round. Also runs
# a politeness config so deferred rows (absent from parsed) are proven
# NOT to leak into partition rows.
# ---------------------------------------------------------------------------
def test_per_partition_metrics_tie_out(spark, tmp_path):
    n_hosts = 6
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [(10, 1, "http://h0.test/p0.html", 3)]
    eng, stats = run_engine(
        spark,
        tmp_path,
        seeds,
        docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=3,  # forces deferrals: attempted < urls_in
            per_partition_metrics=True,
        ),
    )
    rounds = {s.round: s for s in stats}
    parts = eng.wh.read("metrics_parts").collect()
    assert parts, "no metrics_parts rows written"
    by_round: dict[int, list] = {}
    for p in parts:
        by_round.setdefault(p["round"], []).append(p)
    assert set(by_round) == set(rounds)
    for r, rows in by_round.items():
        s = rounds[r]
        assert sum(p.fetched for p in rows) == s.fetched
        assert sum(p.fetch_errors for p in rows) == s.fetch_errors
        assert sum(p.links_extracted for p in rows) == s.links_extracted
        assert sum(p.attempted for p in rows) == s.fetched + s.fetch_errors
        if s.deferred:
            # deferred rows never reach the parsed frame
            assert sum(p.attempted for p in rows) == s.urls_in - s.deferred - s.robots_blocked


# ---------------------------------------------------------------------------
# Adaptive global budget (CrawlConfig.global_budget): every round
# fetches EXACTLY min(G, eligible frontier) URLs — Hamilton
# apportionment across hosts — deferral carries the rest and the crawl
# terminates with the frontier drained. The end state is a SUBSET of
# the permissive crawl's (deferral can reorder discovery so a URL is
# first-claimed via a longer path with less remaining depth — the same
# race semantics as the reference's queue — so subtrees may truncate,
# but nothing outside the permissive reachable set ever appears, and
# nothing is fetched twice).
# ---------------------------------------------------------------------------
def test_global_budget_backpressure(spark, tmp_path):
    n_hosts = 4
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [(30, 1, "http://h0.test/p0.html", 3)]
    G = 3
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh_g"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096, global_budget=G, max_rounds=60
        ),
    )
    eng.start(seeds)
    stats = eng.run()
    for s in stats:
        eligible = s.urls_in - s.robots_blocked
        assert s.fetched + s.fetch_errors == min(G, eligible), s
    assert sum(s.deferred for s in stats) > 0  # backpressure engaged
    assert stats[-1].new_urls + stats[-1].deferred == 0  # drained, not capped
    ref = CrawlEngine(
        spark,
        str(tmp_path / "wh_ref"),
        documents=docs,
        config=CrawlConfig(bloom_expected_urls=4096, default_budget=10**9),
    )
    ref.start(seeds)
    ref.run()
    pages, seen, _, _, _ = spark_end_state(eng)
    ref_pages, ref_seen, _, _, _ = spark_end_state(ref)
    assert set(pages) <= set(ref_pages) and seen <= ref_seen
    # identical content for every page both crawls fetched (round differs)
    for k, (content, summary, _r) in pages.items():
        assert (content, summary) == ref_pages[k][:2]
    # no double fetch under deferral
    urls = [r.url for r in eng.wh.read("pages").collect()]
    assert len(urls) == len(set(urls))


def test_global_budget_composes_with_static_cap(spark):
    from isidorus_web_scraper_spark.operators.politeness import (
        allocate_global_budget,
    )

    frontier = spark.createDataFrame(
        [(1, 1, f"http://h{i % 3}.test/p{i}", 2, 0) for i in range(30)],
        "scraping_id long, user_id long, url string, depth int, round int",
    )
    static = spark.createDataFrame(
        [("h0.test", 1, ["/blocked"], 2)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    out = {r.host: r for r in allocate_global_budget(frontier, 9, static).collect()}
    # Σ of the raw allocation is G: with equal 10-URL queues each host
    # gets 3, then h0's static cap 1 binds (min(static, alloc))
    assert out["h0.test"].max_fetches_per_round == 1
    assert out["h1.test"].max_fetches_per_round == 3
    assert out["h2.test"].max_fetches_per_round == 3
    # robots + delay carry through; absent hosts get no-robots defaults
    assert out["h0.test"].robots_disallow == ["/blocked"]
    assert out["h0.test"].crawl_delay_rounds == 2
    assert out["h1.test"].robots_disallow is None
    assert out["h1.test"].crawl_delay_rounds == 0


def test_global_budget_skips_ineligible_rows(spark):
    """Apportionment counts ELIGIBLE rows only: a host whose frontier is
    all robots-blocked, or whose crawl-delay defers this round, gets no
    allocation (those rows never fetch — budget spent there is wasted,
    under-fetching everyone else) but its config row still carries
    through so schedule_round keeps enforcing its robots rules."""
    from isidorus_web_scraper_spark.operators.politeness import (
        allocate_global_budget,
        schedule_round,
        ACTION_FETCH,
    )

    # h0: 100 URLs, every path robots-blocked. h1: 100 eligible URLs.
    # h2: 100 URLs but crawl_delay defers round 1. G=100 must land
    # entirely on h1 — the round fetches exactly min(G, eligible)=100.
    frontier = spark.createDataFrame(
        [(1, 1, f"http://h{h}.test/p{i}", 2, 1) for h in range(3) for i in range(100)],
        "scraping_id long, user_id long, url string, depth int, round int",
    )
    config = spark.createDataFrame(
        [
            ("h0.test", None, ["/p"], 0),
            ("h2.test", None, None, 1),  # delay 1 ⇒ fetch only on even rounds
        ],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    pol = allocate_global_budget(frontier, 100, config)
    out = {r.host: r for r in pol.collect()}
    assert out["h0.test"].max_fetches_per_round == 0
    assert out["h2.test"].max_fetches_per_round == 0
    assert out["h1.test"].max_fetches_per_round == 100
    # config survives a zero-eligible host: h0's rows stay blocked
    assert out["h0.test"].robots_disallow == ["/p"]
    tagged = schedule_round(frontier, pol, round_no=1).collect()
    fetches = [r for r in tagged if r.action == ACTION_FETCH]
    assert len(fetches) == 100
    assert {r.host for r in fetches} == {"h1.test"}


def test_global_budget_exact_integer_quota(spark):
    """Hamilton quotas are exact longs (div/mod), never a double: at
    G·q ≥ 2^53 a float quotient can round across an integer boundary,
    breaking Σ==G. Pin with queue sizes big enough that G·q needs
    >53 bits (simulated via a pre-aggregated... frontier rows are real
    but small; the budget supplies the magnitude)."""
    from isidorus_web_scraper_spark.operators.politeness import (
        allocate_global_budget,
    )

    # 3 hosts with co-prime queue sizes; G huge so G·q > 2^53.
    rows = []
    sizes = {"h0": 7, "h1": 11, "h2": 13}
    for h, n in sizes.items():
        rows += [(1, 1, f"http://{h}.test/p{i}", 2, 0) for i in range(n)]
    frontier = spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )
    G = (1 << 53) + 12345  # G·q up to ~1.2e17, well past double exactness
    out = {
        r.host: r.max_fetches_per_round
        for r in allocate_global_budget(frontier, G, None).collect()
    }
    assert sum(out.values()) == G
    # largest-remainder base floor is exact: alloc within 1 of G·q/Q
    total_q = sum(sizes.values())
    for h, n in sizes.items():
        base = (G * n) // total_q
        assert out[f"{h}.test"] in (base, base + 1)


def test_trap_override_blocks_only_trap_hosts(spark):
    """trap.test explodes 40 URLs over one '/cal/#' template -> its rows
    hard-drop as robots_blocked (frontier drains; a zero budget would
    defer forever); ok.test's 12 URLs over 4 alpha templates pass, and
    its existing config (budget, robots) survives the override."""
    from isidorus_web_scraper_spark.operators.politeness import (
        ACTION_FETCH,
        ACTION_ROBOTS,
        schedule_round,
        trap_override,
    )

    rows = [(1, 1, f"http://trap.test/cal/{i}", 2, 0) for i in range(40)]
    secs = ("about", "docs", "blog", "shop")
    rows += [
        (1, 1, f"http://ok.test/{secs[i % 4]}/{i % 3}", 2, 0) for i in range(12)
    ]
    frontier = spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )
    static = spark.createDataFrame(
        [("ok.test", 5, ["/blog"], 0)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    pol = trap_override(frontier, static)
    acts = {}
    for r in schedule_round(frontier, pol, 0).collect():
        acts.setdefault((r.host, r.action), 0)
        acts[(r.host, r.action)] += 1
    assert acts[("trap.test", ACTION_ROBOTS)] == 40
    assert ("trap.test", ACTION_FETCH) not in acts
    # ok.test: /blog rows still robots-blocked by its own config,
    # budget 5 enforced on the rest
    assert acts[("ok.test", ACTION_ROBOTS)] == 3  # i%4==2 -> 3 rows
    assert acts[("ok.test", ACTION_FETCH)] == 5
    # with no pre-existing config the trap rows are still built
    pol2 = trap_override(frontier, None)
    got = {r.host: r.robots_disallow for r in pol2.collect()}
    assert got == {"trap.test": ["/"]}


def test_detect_traps_crawl_terminates_without_livelock(spark, tmp_path):
    """Engine knob: the synthetic corpus's '/p<N>.html' paths collapse
    to one template per host, so once a host's frontier slice reaches
    the threshold its rows hard-drop — the crawl must TERMINATE with
    the frontier drained (blocked, not deferred-forever) and fetch a
    subset of the permissive crawl's pages."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(61, 1, "http://h0.test/p0.html", 3)]
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh_trap"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            detect_traps=True,
            trap_min_urls=10,
            max_rounds=40,
        ),
    )
    eng.start(seeds)
    stats = eng.run()
    assert stats[-1].new_urls + stats[-1].deferred == 0  # drained
    assert sum(s.robots_blocked for s in stats) > 0  # traps actually hit
    ref = CrawlEngine(
        spark,
        str(tmp_path / "wh_ref_trap"),
        documents=docs,
        config=CrawlConfig(bloom_expected_urls=4096),
    )
    ref.start(seeds)
    ref.run()
    pages, _, _, _, _ = spark_end_state(eng)
    ref_pages, _, _, _, _ = spark_end_state(ref)
    assert set(pages) <= set(ref_pages)
    for k, (content, summary, _r) in pages.items():
        assert (content, summary) == ref_pages[k][:2]


def test_retry_transient_failure_succeeds_next_round(spark, tmp_path):
    """A 503 (availability injector) re-enters the next round's frontier
    and succeeds: end pages equal the healthy crawl's (content and
    summary), the victim page lands one round later, and the ledger
    shows 503 -> 200. No double fetch, no re-claim."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(71, 1, "http://h0.test/p0.html", 3)]
    cfg = CrawlConfig(
        bloom_expected_urls=4096,
        default_budget=10**9,
        retry_max_attempts=3,
        availability_sql="NOT (url LIKE '%h0.test/p1.html' AND round <= 1)",
    )
    eng = CrawlEngine(spark, str(tmp_path / "wh_r"), documents=docs, config=cfg)
    eng.start(seeds)
    stats = eng.run()
    ref = CrawlEngine(
        spark,
        str(tmp_path / "wh_h"),
        documents=docs,
        config=CrawlConfig(bloom_expected_urls=4096, default_budget=10**9),
    )
    ref.start(seeds)
    ref.run()
    pages, seen, _, _, jobs = spark_end_state(eng)
    ref_pages, ref_seen, _, _, _ = spark_end_state(ref)
    assert set(pages) == set(ref_pages)
    for k, (content, summary, _r) in pages.items():
        assert (content, summary) == ref_pages[k][:2]
    assert seen == ref_seen
    assert jobs[71][0] == "COMPLETED"
    log = sorted(
        (r.round, r.status)
        for r in eng.wh.read("fetch_log")
        .filter("url = 'http://h0.test/p1.html'")
        .collect()
    )
    assert log == [(1, 503), (2, 200)]
    # the victim page committed in round 2, one later than healthy
    assert pages[(71, "http://h0.test/p1.html")][2] == 2
    assert ref_pages[(71, "http://h0.test/p1.html")][2] == 1
    # retries were accounted as carried work (deferred) in round 1
    assert {s.round: s.deferred for s in stats}[1] >= 1
    # no double fetch
    urls = [r.url for r in eng.wh.read("pages").collect()]
    assert len(urls) == len(set(urls))


def test_retry_attempts_cap_terminates(spark, tmp_path):
    """A permanently-503 URL stops after retry_max_attempts total
    attempts (the committed fetch_log is the ledger) and the crawl
    drains instead of retrying forever."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(72, 1, "http://h0.test/p0.html", 2)]
    cfg = CrawlConfig(
        bloom_expected_urls=4096,
        default_budget=10**9,
        retry_max_attempts=3,
        availability_sql="NOT (url LIKE '%h0.test/p1.html')",
    )
    eng = CrawlEngine(spark, str(tmp_path / "wh_c"), documents=docs, config=cfg)
    eng.start(seeds)
    stats = eng.run()
    assert stats[-1].new_urls + stats[-1].deferred == 0  # drained
    log = eng.wh.read("fetch_log").filter(
        "url = 'http://h0.test/p1.html'"
    ).collect()
    assert len(log) == 3 and all(r.status == 503 for r in log)
    assert (72, "http://h0.test/p1.html") not in {
        (r.scraping_id, r.url) for r in eng.wh.read("pages").collect()
    }


# ---------------------------------------------------------------------------
# frontier_priority='indegree' (OPIC-lite): when the per-host budget
# truncates, the URL with more committed inlinks fetches FIRST; the
# crawled set (pages/seen/links) is identical to BFS-order — priority
# reorders rounds, never membership.
# ---------------------------------------------------------------------------
def test_frontier_priority_indegree(spark, tmp_path):
    def t(text, off):
        return {"kind": "text", "text": text, "media_ref": None, "offset": off}

    def l(url, off):
        return {"kind": "link", "text": None, "media_ref": url, "offset": off}

    a, z = "http://slow.test/a", "http://slow.test/z"
    m1, m2 = "http://hub.test/m1", "http://hub.test/m2"
    docs = spark.createDataFrame(
        [
            ("http://hub.test/seed", [t("s", 0), l(m1, 1), l(m2, 2)]),
            (m1, [t("m1", 0), l(a, 1), l(z, 2)]),
            (m2, [t("m2", 0), l(z, 1)]),
            (a, [t("a", 0)]),
            (z, [t("z", 0)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    politeness = spark.createDataFrame(
        [("slow.test", 1, [], 0), ("hub.test", 8, [], 0)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int",
    )
    # by round 2, committed links give indegree(z)=2 (m1+m2) vs
    # indegree(a)=1 — slow.test's budget of 1 must pick z first under
    # indegree priority, a first under BFS url order
    ends = {}
    rounds = {}
    for prio in ("depth", "indegree"):
        eng = CrawlEngine(
            spark,
            str(tmp_path / f"wh_{prio}"),
            documents=docs,
            politeness=politeness,
            config=CrawlConfig(
                bloom_expected_urls=1024, frontier_priority=prio
            ),
        )
        eng.start([(70, 1, "http://hub.test/seed", 3)])
        eng.run()
        pages, seen, links, _, jobs = spark_end_state(eng)
        # round-insensitive end state: (keys, content) + seen + links
        ends[prio] = (
            {k: v[0] for k, v in pages.items()}, seen, links,
        )
        rounds[prio] = {k[1]: v[2] for k, v in pages.items()}
    assert ends["depth"] == ends["indegree"]  # same crawl, different order
    assert rounds["depth"][a] < rounds["depth"][z]      # BFS: a first
    assert rounds["indegree"][z] < rounds["indegree"][a]  # OPIC: z first


def test_frontier_priority_validated(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="frontier_priority"):
        CrawlEngine(
            spark,
            str(tmp_path / "wh"),
            documents=golden_documents(spark),
            config=CrawlConfig(frontier_priority="opic"),
        )


def test_bare_run_round_inits_driver_sketch_no_refetch(spark, tmp_path):
    """Regression (round-5 session 8): driving rounds with bare
    run_round() on a fresh engine left the driver bloom to be seeded by
    round 0's _or_into_bloom — WITHOUT the seeds' hashes. A later page
    linking back to the seed then read "definitely new", bypassed the
    exact anti-join and re-fetched it (observed: seed refetched at
    round 2 with n_hosts=2). run_round must init the sketch from `seen`
    like run() does (the warehouse-sketch path already did)."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(83, 1, "http://h0.test/p0.html", 3)]
    cfg = lambda: CrawlConfig(bloom_expected_urls=4096, default_budget=10**9)

    eng = CrawlEngine(spark, str(tmp_path / "wh_bare"), documents=docs, config=cfg())
    eng.start(seeds)
    r = 0
    while not eng.wh.read("frontier", {"round": r}).isEmpty():
        eng.run_round(r)
        r += 1
    # every URL fetched exactly once per scraping
    log = [(x.scraping_id, x.url) for x in eng.wh.read("fetch_log").collect()]
    assert len(log) == len(set(log))
    full = CrawlEngine(spark, str(tmp_path / "wh_run"), documents=docs, config=cfg())
    full.start(seeds)
    full.run()
    # jobs excluded: the bare-round driver never calls _finalize(), so
    # its job row legitimately stays PENDING
    assert spark_end_state(eng)[:4] == spark_end_state(full)[:4]
