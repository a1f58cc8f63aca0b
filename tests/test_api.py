"""API-plan parity: GET /scraping results assembly, search, deletion —
over a real crawl of the reference mock website (e2e runner.py
expectations)."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.corpus import golden_documents
from isidorus_web_scraper_spark.plans import api
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

from .reference_sim import MOCK_EXPLANATION, MOCK_SUMMARY

MOCK = "http://mock-website:8000"


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("apiwh")),
        documents=golden_documents(spark),
        config=CrawlConfig(bloom_expected_urls=4096, default_budget=10**9),
    )
    eng.start(
        [
            (1, 10, f"{MOCK}/index.html", 2),
            (2, 10, f"{MOCK}/cycle_a.html", 5),
            (3, 77, "http://site1.com", 1),
        ]
    )
    eng.run()
    return eng


def test_get_full_scraping(spark, crawled):
    rows = {r.scraping_id: r for r in api.get_full_scraping(crawled.wh).collect()}
    assert rows[1].status == "COMPLETED"
    assert rows[1].links_count == 2  # index→page2, page2→index
    assert rows[1].seed_summary == MOCK_SUMMARY
    assert rows[2].status == "COMPLETED"
    assert rows[3].user_id == 77


def test_results_assembly_url_sorted(spark, crawled):
    res = api.get_scraping_results(crawled.wh, 1).collect()
    urls = [r.url for r in res]
    assert urls == sorted(urls)  # O1: url-sorted, not crawl-ordered
    assert urls == [f"{MOCK}/index.html", f"{MOCK}/page2.html"]
    index_row = res[0]
    assert [i["image_url"] for i in index_row.images] == [f"{MOCK}/darth.png"]
    assert index_row.images[0]["explanation"] == MOCK_EXPLANATION
    assert res[1].images == []
    assert res[0].summary == MOCK_SUMMARY


def test_list_scrapings_pagination(spark, crawled):
    rows = api.list_scrapings(crawled.wh, user_id=10, offset=0, limit=1).collect()
    assert len(rows) == 1 and rows[0].scraping_id == 2  # newest first (O2)
    rows2 = api.list_scrapings(crawled.wh, user_id=10, offset=1, limit=5).collect()
    assert [r.scraping_id for r in rows2] == [1]


def test_search(spark, crawled):
    hits = api.search_pages(crawled.wh, "Kubernetes", 10).collect()
    assert [h.url for h in hits] == [f"{MOCK}/index.html"]
    assert len(hits[0].highlights) >= 1
    assert "kubernetes" in hits[0].highlights[0].lower()
    # user filter: user 77 doesn't see user 10's pages
    assert api.search_pages(crawled.wh, "Kubernetes", 77).count() == 0
    # top-3 highlight cap
    assert all(len(h.highlights) <= 3 for h in hits)


def test_term_frequency(spark, crawled):
    tf = {
        (r.url, r.term): r.frequency
        for r in api.term_frequency(crawled.wh)
        .filter("scraping_id = 1")
        .collect()
    }
    assert tf[(f"{MOCK}/index.html", "the")] >= 2


def test_delete_scraping(spark, crawled):
    with pytest.raises(PermissionError):
        api.delete_scraping(crawled.wh, 3, user_id=10)  # wrong owner (J10)
    api.delete_scraping(crawled.wh, 3, user_id=77)
    assert crawled.wh.read("pages").filter("scraping_id = 3").count() == 0
    assert crawled.wh.read("crawls").filter("scraping_id = 3").count() == 0
    # other scrapings untouched
    assert crawled.wh.read("pages").filter("scraping_id = 1").count() == 2
    with pytest.raises(KeyError):
        api.delete_scraping(crawled.wh, 3, user_id=77)  # already gone
