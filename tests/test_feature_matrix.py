"""Feature-interaction crawl: robots discovery + sitemap seeding +
WARC archiving + postings indexing + redirect following ON TOGETHER —
each feature is pinned in isolation elsewhere; this pins that their
round-loop hooks compose (same wall, same claims pipeline, same
rollback tables) without stepping on each other."""

from __future__ import annotations

from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from isidorus_web_scraper_spark.sources.warc import parse_warc_files


def _html(links, body="text"):
    return (
        f"<html><body><p>{body}</p>"
        + "".join(f'<a href="{u}">l</a>' for u in links)
        + "</body></html>"
    )


def test_all_round5_features_compose(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                "User-agent: *\nDisallow: /blocked\n"
                "Sitemap: http://h0.test/sitemap.xml\n",
            ),
            (
                "http://h0.test/sitemap.xml",
                '<?xml version="1.0"?><urlset>'
                "<url><loc>http://h0.test/orphan.html</loc></url>"
                "</urlset>",
            ),
            # seed links: one ok, one robots-blocked (redirect spans
            # exist only in resolver corpora — follow_redirects stays
            # ON here to pin its empty-frame path composes too)
            (
                "http://h0.test/p0.html",
                _html(
                    [
                        "http://h0.test/p1.html",
                        "http://h0.test/blocked/x.html",
                    ],
                    "root searchword",
                ),
            ),
            ("http://h0.test/p1.html", _html([], "leaf searchword")),
            ("http://h0.test/blocked/x.html", _html([], "must not fetch")),
            ("http://h0.test/orphan.html", _html([], "sitemap only searchword")),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            max_rounds=10,
            discover_robots=True,
            sitemap_seeding=True,
            follow_redirects=True,
            archive_warc=True,
            warc_files_per_round=2,
            index_postings=True,
        ),
    )
    eng.start([(50, 1, "http://h0.test/p0.html", 2)])
    eng.run()

    pages = {r.url: r.content for r in eng.wh.read("pages").collect()}
    # ok links + sitemap orphan fetched; robots-blocked is not
    assert set(pages) == {
        "http://h0.test/p0.html",
        "http://h0.test/p1.html",
        "http://h0.test/orphan.html",
    }
    # the archive carries exactly the fetched captures
    got = {
        (r.url, r.payload)
        for r in parse_warc_files(
            eng.wh.read("warc_store").select("data")
        ).collect()
    }
    assert got == {(u, c) for u, c in pages.items()}
    # the postings index serves a token present in seed AND
    # sitemap-seeded pages (index saw both discovery paths)
    from isidorus_web_scraper_spark.plans.api import search_pages_indexed

    hits = {
        r.url
        for r in search_pages_indexed(
            eng.wh, "searchword", 1, eng.postings_path
        ).collect()
    }
    assert hits == {
        "http://h0.test/p0.html",
        "http://h0.test/p1.html",
        "http://h0.test/orphan.html",
    }


def test_traps_breaker_retries_compose(spark, tmp_path):
    """Session-7/8 features ON together: detect_traps hard-blocks a
    12-URL template host in the same crawl where the circuit breaker
    defers a 503 host through its cooldown and retries recover it —
    plus conditional_fetch + WARC + postings hooks active on the same
    wall. Pins that the trap drop, the breaker's deferral ledger, and
    the retry re-claim don't step on each other's frontier/claims
    tables, and that the sinks see exactly the fetched set."""
    trap_links = [f"http://trap.test/t{i}.html" for i in range(1, 13)]
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/p0.html",
                _html(
                    ["http://h0.test/p1.html", "http://down.test/d0.html"]
                    + trap_links,
                    "root needleword",
                ),
            ),
            ("http://h0.test/p1.html", _html([], "leaf needleword")),
            ("http://down.test/d0.html", _html([], "flaky needleword")),
        ]
        + [(u, _html([], "trap filler")) for u in trap_links],
        "doc_id string, html string",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w2"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=10**9,
            max_rounds=24,
            detect_traps=True,
            trap_min_urls=10,
            retry_max_attempts=8,
            error_backoff_threshold=0.5,
            error_backoff_min_attempts=1,
            error_backoff_rounds=2,
            conditional_fetch=True,
            archive_warc=True,
            index_postings=True,
            availability_sql=(
                "NOT (url LIKE 'http://down.test%' AND round <= 2)"
            ),
        ),
    )
    eng.start([(90, 1, "http://h0.test/p0.html", 2)])
    stats = eng.run()

    # drained, not livelocked, with all three hook families active
    assert stats[-1].new_urls + stats[-1].deferred == 0
    pages = {r.url: r.content for r in eng.wh.read("pages").collect()}
    assert set(pages) == {
        "http://h0.test/p0.html",
        "http://h0.test/p1.html",
        "http://down.test/d0.html",
    }
    # trap host: every templated URL blocked, zero fetch attempts
    assert sum(s.robots_blocked for s in stats) >= 12
    trap_log = eng.wh.read("fetch_log").filter(
        "url LIKE 'http://trap.test%'"
    ).collect()
    assert trap_log == []
    # breaker: the 503s all land in one round T, zero attempts during
    # the 2-round cooldown, recovery at T+3 (retries alone would have
    # re-attempted every round)
    log = sorted(
        (r.round, r.status)
        for r in eng.wh.read("fetch_log")
        .filter("url = 'http://down.test/d0.html'")
        .collect()
    )
    fail_rounds = {r for (r, s) in log if s == 503}
    t = min(fail_rounds)
    assert fail_rounds == {t}
    attempted = {r for (r, _s) in log}
    assert t + 1 not in attempted and t + 2 not in attempted
    assert (t + 3, 200) in log
    # WARC sink captured exactly the fetched pages
    got = {
        (r.url, r.payload)
        for r in parse_warc_files(
            eng.wh.read("warc_store").select("data")
        ).collect()
    }
    assert got == {(u, c) for u, c in pages.items()}
    # postings index serves all three fetched pages, none of the trap
    from isidorus_web_scraper_spark.plans.api import search_pages_indexed

    hits = {
        r.url
        for r in search_pages_indexed(
            eng.wh, "needleword", 1, eng.postings_path
        ).collect()
    }
    assert hits == set(pages)
