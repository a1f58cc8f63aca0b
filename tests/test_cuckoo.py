"""Cuckoo seen-sketch (operators/cuckoo.py): exactness properties,
deletion (the capability Bloom lacks), and engine integration
(seen_sketch='cuckoo' crawls end-state-identical to Bloom; deleting a
scraping evicts its fingerprints)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.operators.cuckoo import CuckooFilter


def _hashes(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.xxhash64("id").alias("h"))
        .toPandas()["h"]
        .to_numpy()
    )


def test_no_false_negatives_and_fpp(spark):
    member = _hashes(spark, 0, 20_000)
    ck = CuckooFilter.sized_for(20_000)
    ck.insert_vec(member)
    assert ck.contains_vec(member).all()  # zero false negatives
    outside = _hashes(spark, 20_000, 60_000)
    fp = ck.contains_vec(outside).mean()
    # 16-bit fingerprints, 2 buckets x 4 slots: fpp ~ 1.2e-4
    assert fp < 0.005, f"false-positive rate too high: {fp}"
    assert 0.5 < ck.load_factor <= 0.96


def test_insert_idempotent(spark):
    h = _hashes(spark, 0, 5_000)
    ck = CuckooFilter.sized_for(5_000)
    ck.insert_vec(h)
    n = ck.count
    ck.insert_vec(h)  # re-insert: set semantics, no slot growth
    assert ck.count == n
    assert ck.contains_vec(h).all()


def test_delete_removes_only_targets(spark):
    a = _hashes(spark, 0, 5_000)
    b = _hashes(spark, 5_000, 10_000)
    ck = CuckooFilter.sized_for(10_000)
    ck.insert_vec(a)
    ck.insert_vec(b)
    removed = ck.delete_vec(a)
    assert removed == len(a)
    # deleted items gone (rare same-bucket+fingerprint aliases may linger)
    assert ck.contains_vec(a).mean() < 0.01
    # survivors keep zero-false-negative EXCEPT where a shared
    # (bucket, fingerprint) alias with a deleted item evicted them —
    # documented pre-filter degradation, must be vanishingly rare
    assert ck.contains_vec(b).mean() > 0.999


def test_overflow_raises_not_drops(spark):
    ck = CuckooFilter.sized_for(100)
    import pytest

    with pytest.raises(RuntimeError):
        ck.insert_vec(_hashes(spark, 0, 10_000))


def test_prefiltered_anti_join_exact_with_cuckoo(spark):
    from isidorus_web_scraper_spark.operators.bloom import prefiltered_anti_join

    seen = spark.range(1_000).select(
        F.lit(1).alias("scraping_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    ).withColumn("url_hash", F.xxhash64("url"))
    candidates = spark.range(500, 2_000).select(
        F.lit(1).alias("scraping_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    ).withColumn("url_hash", F.xxhash64("url"))
    ck = CuckooFilter.sized_for(1_000)
    ck.insert_vec(seen.select("url_hash").toPandas()["url_hash"].to_numpy())
    new = prefiltered_anti_join(
        candidates, seen, ["scraping_id", "url"], "url_hash", ck
    )
    got = sorted(r.url for r in new.collect())
    assert got == sorted(f"u{i}" for i in range(1_000, 2_000))


def test_engine_cuckoo_equals_bloom_and_forget(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    from .test_crawl import spark_end_state

    n_hosts = 5
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [
        (70, 1, "http://h0.test/p0.html", 2),
        (71, 2, "http://h1.test/p0.html", 2),
    ]
    mk = lambda sketch, wh: CrawlEngine(  # noqa: E731
        spark,
        str(tmp_path / wh),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            seen_sketch=sketch,
        ),
    )
    bl = mk("bloom", "wb")
    bl.start(seeds)
    bl.run()
    ck = mk("cuckoo", "wc")
    ck.start(seeds)
    ck.run()
    assert spark_end_state(ck) == spark_end_state(bl)

    from isidorus_web_scraper_spark.operators.cuckoo import CuckooFilter

    assert isinstance(ck._bloom, CuckooFilter)
    before = ck._bloom.count
    n70 = ck.wh.read("seen").filter("scraping_id = 70").count()
    assert n70 > 0
    ck.forget_scraping(70, 1)
    # rows gone from the warehouse AND fingerprints gone from the sketch
    assert ck.wh.read("seen").filter("scraping_id = 70").count() == 0
    assert ck._bloom.count == before - n70
    # the other scraping's URLs still pre-filter as maybe-seen
    other = (
        ck.wh.read("seen").filter("scraping_id = 71")
        .select("url_hash").toPandas()["url_hash"].to_numpy()
    )
    assert ck._bloom.contains_vec(other).mean() > 0.99