"""Posting-list search index (sources/postings.py + plans/api.py
search_pages_indexed): probe correctness, partition pruning (no corpus
scan for ranking), engine round-incremental maintenance, and
scan-parity for whole-token terms."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.sources.postings import (
    build_postings,
    probe_postings,
    write_postings,
)


def test_build_probe_roundtrip_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "u1", "spark crawl spark index"),
            (1, "u2", "crawl crawl partition"),
            (2, "u3", "index spark"),
        ],
        "scraping_id long, url string, text string",
    )
    p = build_postings(df, ["scraping_id", "url"], "text", buckets=16)
    path = str(tmp_path / "idx")
    write_postings(p, path)

    got = {
        (r.scraping_id, r.url): r.frequency
        for r in probe_postings(spark, path, "spark", 16).collect()
    }
    assert got == {(1, "u1"): 2, (2, "u3"): 1}
    assert probe_postings(spark, path, "absent-term", 16).count() == 0

    # the probe plan must show partition pruning on term_bucket — the
    # scan reads 1/B of the index, never the corpus
    plan = (
        probe_postings(spark, path, "spark", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan


def test_engine_indexed_search_equals_scan(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.api import (
        search_pages,
        search_pages_indexed,
    )
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    docs = generate_documents(spark, n_hosts=5).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=False,  # scan search also matches summary;
            index_postings=True,       # the index serves content tokens
        ),
    )
    eng.start([(95, 1, "http://h0.test/p0.html", 3)])
    eng.run()

    # 'partition' is a corpus vocabulary word with no superstring word,
    # so token search == substring search here (see search_pages_indexed
    # docstring for the general token-vs-substring distinction)
    scan = {
        (r.url, r.scraping_id, r.score, tuple(r.highlights))
        for r in search_pages(eng.wh, "partition", 1).collect()
    }
    probe = {
        (r.url, r.scraping_id, r.score, tuple(r.highlights))
        for r in search_pages_indexed(
            eng.wh, "partition", 1, eng.postings_path
        ).collect()
    }
    assert probe == scan and len(scan) > 0

    # ACL: other users see nothing
    assert (
        search_pages_indexed(eng.wh, "partition", 99, eng.postings_path).count()
        == 0
    )

    # partial-round rollback removes the round's postings directory
    rounds = sorted(
        int(d.split("=")[1])
        for d in os.listdir(eng.postings_path)
        if d.startswith("round=")
    )
    assert rounds and rounds[0] == 0
    eng._rollback_partial(rounds[-1])
    left = {
        int(d.split("=")[1])
        for d in os.listdir(eng.postings_path)
        if d.startswith("round=")
    }
    assert left == set(rounds[:-1])
    docs.unpersist()
