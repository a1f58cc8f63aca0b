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
