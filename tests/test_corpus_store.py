"""Partition-pruned point-lookup fetch: correctness + pruning proof."""

from __future__ import annotations

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.corpus import all_urls, generate_documents, page_spans
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from isidorus_web_scraper_spark.sources.corpus_store import (
    make_partitioned_fetcher,
    pruned_corpus_for,
    write_partitioned_corpus,
)

from .reference_sim import crawl_sim


def test_pruning_reads_fewer_files(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=8)
    path = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, path, buckets=16)
    full_files = len(spark.read.parquet(path).inputFiles())

    frontier = spark.createDataFrame(
        [("http://h0.test/p0.html",), ("http://h1.test/p0.html",)], "url string"
    )
    pruned = pruned_corpus_for(spark, path, frontier, buckets=16)
    # files actually scanned (inputFiles() reports the unpruned relation)
    read_files = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert read_files <= 2 < full_files
    # partition filter visible in the physical plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "doc_bucket" in plan
    # pruned subset still contains the requested docs
    got = {r.doc_id for r in pruned.select("doc_id").collect()}
    assert {"http://h0.test/p0.html", "http://h1.test/p0.html"} <= got


def test_crawl_over_partitioned_corpus_matches_sim(spark, tmp_path):
    n_hosts = 5
    docs = generate_documents(spark, n_hosts=n_hosts)
    path = str(tmp_path / "corpus")
    write_partitioned_corpus(docs, path, buckets=8)

    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        resolver=make_partitioned_fetcher(path, buckets=8),
        config=CrawlConfig(bloom_expected_urls=4096, default_budget=10**9),
    )
    eng.start([(50, 1, "http://h0.test/p0.html", 2)])
    eng.run()

    corpus = {u: page_spans(u, n_hosts=n_hosts) for u in all_urls(n_hosts)}
    sim = crawl_sim(corpus, [(50, "http://h0.test/p0.html", 2)])
    pages = {
        (r.scraping_id, r.url) for r in eng.wh.read("pages").collect()
    }
    assert pages == {(s, u) for (s, u, _c, _d) in sim.pages}
    seen = {(r.scraping_id, r.url) for r in eng.wh.read("seen").collect()}
    assert seen == sim.seen
