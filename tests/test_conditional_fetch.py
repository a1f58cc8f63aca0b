"""Conditional refetch (CrawlConfig.conditional_fetch): hash-based
If-Modified-Since with content sha256 as the strong validator.

A recrawl whose page content matches the latest stored copy logs 304
and REUSES the stored summary — the summarizer (the reference's
per-page LLM call, `workers/page_summarizer/services/
summarizer_factory.py:31-100`) must do zero per-row work on unchanged
content. Proven here with an accumulator-counting pandas-UDF provider:
its non-null input count stays 0 across an all-unchanged recrawl.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.corpus import make_resolver, page_url
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine


def _engine(spark, wh, follow=False, conditional=False):
    return CrawlEngine(
        spark,
        wh,
        resolver=make_resolver(n_hosts=4),
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            conditional_fetch=conditional,
        ),
    )


def _counting_summarizer(spark):
    acc = spark.sparkContext.accumulator(0)

    @F.pandas_udf("string")
    def summarize(content: pd.Series) -> pd.Series:
        acc.add(int(content.notna().sum()))
        return content.map(lambda c: "RECOMPUTED" if c else None)

    return acc, lambda col: summarize(F.col(col) if isinstance(col, str) else col)


def test_unchanged_recrawl_is_all_304_and_skips_summarizer(spark, tmp_path):
    wh = str(tmp_path / "wh")
    first = _engine(spark, wh)
    first.start([(1, 1, page_url(0, 0), 3)])
    first.run()
    pages1 = {
        r.url: (r.content, r.summary)
        for r in first.wh.read("pages").collect()
    }
    assert len(pages1) > 5

    second = _engine(spark, wh, conditional=True)
    acc, second._summarize = _counting_summarizer(spark)
    second.start([(2, 1, page_url(0, 0), 3)])
    second.run()

    log2 = {
        r.url: r.status
        for r in second.wh.read("fetch_log")
        .filter(F.col("scraping_id") == 2)
        .collect()
    }
    fetched2 = {u for u, s in log2.items() if s in (200, 304)}
    assert fetched2 == set(pages1)  # same corpus, same reachability
    assert all(log2[u] == 304 for u in fetched2), "unchanged pages must 304"

    # stored summary reused byte-for-byte; summarizer saw ZERO rows
    pages2 = {
        r.url: (r.content, r.summary)
        for r in second.wh.read("pages")
        .filter(F.col("scraping_id") == 2)
        .collect()
    }
    assert pages2 == pages1
    assert acc.value == 0, "summarizer ran on unchanged content"


def test_new_urls_still_200_and_get_summarized(spark, tmp_path):
    wh = str(tmp_path / "wh")
    first = _engine(spark, wh)
    first.start([(1, 1, page_url(0, 0), 0)])  # depth 0: one page stored
    first.run()

    second = _engine(spark, wh, conditional=True)
    acc, second._summarize = _counting_summarizer(spark)
    # same old seed + a never-crawled page on another host (one seed
    # per scraping_id — reference contract — so two scrapings)
    second.start([(2, 1, page_url(0, 0), 0), (3, 1, page_url(3, 1), 0)])
    second.run()

    log2 = {
        r.url: r.status
        for r in second.wh.read("fetch_log")
        .filter(F.col("scraping_id").isin(2, 3))
        .collect()
    }
    assert log2[page_url(0, 0)] == 304
    assert log2[page_url(3, 1)] == 200
    new_summary = (
        second.wh.read("pages")
        .filter(
            (F.col("scraping_id") == 3) & (F.col("url") == page_url(3, 1))
        )
        .collect()[0]
        .summary
    )
    assert new_summary == "RECOMPUTED"  # fresh page went through the UDF
    assert acc.value >= 1


def test_304_does_not_pin_missing_summary(spark, tmp_path):
    # crawl 1 stores pages WITHOUT summaries (summarizer disabled);
    # an unchanged-content recrawl must still COMPUTE them — reuse
    # requires a stored summary to exist (review finding, r5 s5)
    wh = str(tmp_path / "wh")
    first = CrawlEngine(
        spark,
        wh,
        resolver=make_resolver(n_hosts=4),
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=False,
        ),
    )
    first.start([(1, 1, page_url(0, 0), 1)])
    first.run()
    assert all(
        r.summary is None for r in first.wh.read("pages").collect()
    )

    second = _engine(spark, wh, conditional=True)
    acc, second._summarize = _counting_summarizer(spark)
    second.start([(2, 1, page_url(0, 0), 1)])
    second.run()
    log2 = {
        r.url: r.status
        for r in second.wh.read("fetch_log")
        .filter(F.col("scraping_id") == 2)
        .collect()
    }
    assert all(s == 304 for s in log2.values())  # content IS unchanged
    pages2 = [
        r.summary
        for r in second.wh.read("pages")
        .filter(F.col("scraping_id") == 2)
        .collect()
    ]
    assert pages2 and all(s == "RECOMPUTED" for s in pages2)
    assert acc.value >= len(pages2)
