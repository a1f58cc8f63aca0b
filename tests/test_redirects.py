"""301 redirect following (CrawlConfig.follow_redirects).

Reference analog: the Go fetcher uses a plain ``http.Get``
(`workers/scraper/services/page_fetcher.go:14-20`), so Go's
http.Client chases Location headers transparently (up to 10 hops)
before the scraper ever sees a body. Our batch analog makes each hop
explicit: the fetch answers with a redirect span, the engine logs 301
and re-enqueues the Location at UNCHANGED depth through the claims
pipeline — loop safety comes from the seen-claim set (each URL fetched
at most once per scraping), strictly stronger than a hop cap.
"""

from __future__ import annotations

from isidorus_web_scraper_spark.corpus import (
    make_resolver,
    page_url,
    redirect_url,
)
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine


def _cfg(**kw) -> CrawlConfig:
    return CrawlConfig(
        bloom_expected_urls=4096, default_budget=1_000_000_000, **kw
    )


def _run(spark, tmp_path, name, seeds, redirects, follow):
    eng = CrawlEngine(
        spark,
        str(tmp_path / name),
        resolver=make_resolver(n_hosts=4, redirects=redirects),
        config=_cfg(follow_redirects=follow),
    )
    eng.start(seeds)
    eng.run()
    return eng


def _fetch_log(eng):
    return {
        r.url: (r.status, r.error) for r in eng.wh.read("fetch_log").collect()
    }


def test_redirect_loop_terminates(spark, tmp_path):
    # r3 -> r4 -> r3: a 2-cycle (corpus.redirect_target). The second
    # visit to r3 anti-joins `seen` away, so the frontier drains after
    # exactly two 301 fetches and zero pages.
    eng = _run(spark, tmp_path, "loop", [(1, 1, redirect_url(0, 3), 5)], True, True)
    log = _fetch_log(eng)
    assert log == {
        redirect_url(0, 3): (301, None),
        redirect_url(0, 4): (301, None),
    }
    assert eng.wh.read("pages").count() == 0
    assert {r.url for r in eng.wh.read("seen").collect()} == {
        redirect_url(0, 3),
        redirect_url(0, 4),
    }


def test_redirect_chain_resolves_across_rounds(spark, tmp_path):
    # r5 -> r16 -> p16: a 2-hop chain; the seed is depth 0, so the
    # redirect hops must bypass the depth gate (the target IS the
    # answer to the depth-0 fetch) while the landed page still must
    # not recurse.
    eng = _run(spark, tmp_path, "chain", [(1, 1, redirect_url(0, 5), 0)], True, True)
    log = _fetch_log(eng)
    assert log[redirect_url(0, 5)] == (301, None)
    assert log[redirect_url(0, 16)] == (301, None)
    assert log[page_url(0, 16)][0] == 200
    pages = eng.wh.read("pages").collect()
    assert {p.url for p in pages} == {page_url(0, 16)}
    # depth 0: the landed page's links never entered the frontier
    assert len(log) == 3


def test_follow_off_logs_301_and_dead_ends(spark, tmp_path):
    eng = _run(spark, tmp_path, "off", [(1, 1, redirect_url(0, 5), 3)], True, False)
    assert _fetch_log(eng) == {redirect_url(0, 5): (301, None)}
    assert eng.wh.read("pages").count() == 0
    # a 301 is neither a fetch nor an error in the round metrics
    m = eng.wh.read("metrics").collect()
    assert sum(r.fetched for r in m) == 0
    assert sum(r.fetch_errors for r in m) == 0


def test_redirect_crawl_equals_direct_crawl(spark, tmp_path):
    # Equivalence twin: redirects=True emits ~25% of links via one-hop
    # redirect URLs; redirects="resolved" draws the IDENTICAL rng
    # sequence but emits the resolved page URL directly. With depth >=
    # the reachable diameter, a follow-redirects crawl must land on
    # exactly the same pages with identical content/summary.
    seeds = [(1, 1, page_url(0, 0), 10)]
    via = _run(spark, tmp_path, "via", seeds, True, True)
    direct = _run(spark, tmp_path, "direct", seeds, "resolved", True)

    def pages_of(eng):
        return {
            r.url: (r.content, r.summary)
            for r in eng.wh.read("pages").collect()
        }

    pv, pd_ = pages_of(via), pages_of(direct)
    assert set(pv) == set(pd_)
    assert pv == pd_
    assert len(pv) > 5  # non-trivial reachability
    # the via-crawl additionally claimed the redirect hop URLs
    seen_via = {r.url for r in via.wh.read("seen").collect()}
    seen_direct = {r.url for r in direct.wh.read("seen").collect()}
    assert seen_direct - seen_via == set()
    assert all("/r" in u for u in seen_via - seen_direct)
