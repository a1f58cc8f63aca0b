"""CrawlConfig.sitemap_seeding: robots.txt ``Sitemap:`` directives
discovered by the robots probe turn into frontier candidates through
the SAME claims pipeline as spidered links — unlinked pages become
reachable, sitemap-index shards recurse one level, a depth-0
introducer seeds nothing, malformed sitemap payloads are survived,
and sitemap entries dedup against links (one fetch per URL)."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine


def _cfg(**kw):
    kw.setdefault("max_rounds", 10)
    kw.setdefault("discover_robots", True)
    kw.setdefault("sitemap_seeding", True)
    return CrawlConfig(bloom_expected_urls=4096, **kw)


def _html(links):
    return (
        "<html><body><p>text</p>"
        + "".join(f'<a href="{u}">l</a>' for u in links)
        + "</body></html>"
    )


def _urlset(urls):
    return (
        '<?xml version="1.0"?><urlset>'
        + "".join(f"<url><loc>{u}</loc></url>" for u in urls)
        + "</urlset>"
    )


def _smindex(urls):
    return (
        '<?xml version="1.0"?><sitemapindex>'
        + "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in urls)
        + "</sitemapindex>"
    )


def _pages(eng):
    return {r.url for r in eng.wh.read("pages").collect()}


def test_sitemap_seeds_unlinked_pages(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                "User-agent: *\nSitemap: http://h0.test/sitemap.xml\n",
            ),
            (
                "http://h0.test/sitemap.xml",
                _urlset(
                    ["http://h0.test/orphan1.html", "http://h0.test/orphan2.html"]
                ),
            ),
            ("http://h0.test/p0.html", _html([])),  # links to nothing
            ("http://h0.test/orphan1.html", _html([])),
            ("http://h0.test/orphan2.html", _html([])),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=_cfg())
    eng.start([(70, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    assert _pages(eng) == {
        "http://h0.test/p0.html",
        "http://h0.test/orphan1.html",
        "http://h0.test/orphan2.html",
    }
    # attribution: sitemap locs enter at introducer depth - 1 (the
    # link rule), on the seeding round's NEXT frontier
    fr = {r.url: r for r in eng.wh.read("frontier").collect()}
    for u in ("http://h0.test/orphan1.html", "http://h0.test/orphan2.html"):
        assert fr[u].depth == 1 and fr[u].scraping_id == 70
    # seeding off (robots discovery still on): orphans unreachable
    eng2 = CrawlEngine(
        spark,
        str(tmp_path / "w2"),
        documents=docs,
        config=_cfg(sitemap_seeding=False),
    )
    eng2.start([(70, 1, "http://h0.test/p0.html", 2)])
    eng2.run()
    assert _pages(eng2) == {"http://h0.test/p0.html"}


def test_sitemap_index_recurses_one_level(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                "Sitemap: http://h0.test/smindex.xml\n",
            ),
            (
                "http://h0.test/smindex.xml",
                _smindex(
                    ["http://h0.test/sm0.xml", "http://h0.test/sm1.xml"]
                ),
            ),
            ("http://h0.test/sm0.xml", _urlset(["http://h0.test/a.html"])),
            ("http://h0.test/sm1.xml", _urlset(["http://h0.test/b.html"])),
            ("http://h0.test/p0.html", _html([])),
            ("http://h0.test/a.html", _html([])),
            ("http://h0.test/b.html", _html([])),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=_cfg())
    eng.start([(71, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    assert _pages(eng) == {
        "http://h0.test/p0.html",
        "http://h0.test/a.html",
        "http://h0.test/b.html",
    }


def test_depth0_introducer_seeds_nothing(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                "Sitemap: http://h0.test/sitemap.xml\n",
            ),
            (
                "http://h0.test/sitemap.xml",
                _urlset(["http://h0.test/orphan.html"]),
            ),
            ("http://h0.test/p0.html", _html([])),
            ("http://h0.test/orphan.html", _html([])),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=_cfg())
    eng.start([(72, 1, "http://h0.test/p0.html", 0)])
    eng.run()
    assert _pages(eng) == {"http://h0.test/p0.html"}


def test_malformed_and_missing_sitemaps_survived(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                # one sitemap resolves to an HTML page, one 404s
                "Sitemap: http://h0.test/not-xml.html\n"
                "Sitemap: http://h0.test/missing.xml\n",
            ),
            ("http://h0.test/not-xml.html", _html(["http://h0.test/x.html"])),
            ("http://h0.test/p0.html", _html([])),
            ("http://h0.test/x.html", _html([])),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=_cfg())
    eng.start([(73, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    # no <loc> anywhere: nothing seeded, crawl completes cleanly
    assert _pages(eng) == {"http://h0.test/p0.html"}


def test_sitemap_and_link_dedup_single_fetch(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                "Sitemap: http://h0.test/sitemap.xml\n",
            ),
            (
                "http://h0.test/sitemap.xml",
                _urlset(["http://h0.test/both.html", "http://h0.test/p0.html"]),
            ),
            # p0 ALSO links to both.html; and the sitemap lists the seed
            ("http://h0.test/p0.html", _html(["http://h0.test/both.html"])),
            ("http://h0.test/both.html", _html([])),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=_cfg())
    eng.start([(74, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    rows = eng.wh.read("pages").collect()
    assert {r.url for r in rows} == {
        "http://h0.test/p0.html",
        "http://h0.test/both.html",
    }
    assert len(rows) == 2  # claimed once each, despite two discovery paths


def test_cotenant_scrapings_both_get_sitemap_seeds(spark, tmp_path):
    # two scrapings introduce the same host in the same round: EACH
    # must receive the sitemap locs (per-scraping claim isolation —
    # the host probes once, but attribution fans out per scraping)
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/robots.txt",
                "Sitemap: http://h0.test/sitemap.xml\n",
            ),
            (
                "http://h0.test/sitemap.xml",
                _urlset(["http://h0.test/orphan.html"]),
            ),
            ("http://h0.test/p0.html", _html([])),
            ("http://h0.test/p1.html", _html([])),
            ("http://h0.test/orphan.html", _html([])),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=_cfg())
    eng.start(
        [
            (80, 1, "http://h0.test/p0.html", 2),
            (81, 2, "http://h0.test/p1.html", 2),
        ]
    )
    eng.run()
    by_scraping = {}
    for r in eng.wh.read("pages").collect():
        by_scraping.setdefault(r.scraping_id, set()).add(r.url)
    assert "http://h0.test/orphan.html" in by_scraping[80]
    assert "http://h0.test/orphan.html" in by_scraping[81]


def test_sitemap_seeding_requires_discover_robots(spark, tmp_path):
    with pytest.raises(ValueError, match="discover_robots"):
        CrawlEngine(
            spark,
            str(tmp_path / "w"),
            documents=spark.createDataFrame(
                [("http://h0.test/p0.html", _html([]))],
                "doc_id string, html string",
            ),
            config=CrawlConfig(sitemap_seeding=True, discover_robots=False),
        )
