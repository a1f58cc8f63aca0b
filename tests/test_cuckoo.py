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


def test_insert_is_refcounted_multiset(spark):
    # Deletable-cuckoo contract: one fingerprint stored PER INSERT, one
    # removed per delete. Two claims of the same URL (scrapings A and B)
    # must survive deleting one of them — set-semantics insert would
    # make A's delete evict B's membership (a false negative that
    # bypasses the exact anti-join via the definite-new branch).
    h = _hashes(spark, 0, 2_000)
    ck = CuckooFilter.sized_for(5_000)
    ck.insert_vec(h)
    n = ck.count
    ck.insert_vec(h)  # second claim of every URL
    assert ck.count == 2 * n
    assert ck.delete_vec(h) == n  # forget claim set A...
    assert ck.contains_vec(h).all()  # ...B's claims still maybe-seen
    assert ck.delete_vec(h) == n
    assert not ck.contains_vec(h).any() or ck.contains_vec(h).mean() < 0.01


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


def test_overflow_degrades_to_saturated_not_raises(spark):
    # Over capacity the filter must NOT raise (a mid-crawl exception after
    # the round's commits land wedges resume permanently) and must NOT
    # drop inserts silently (false negatives). It degrades: saturated=True
    # and contains_vec answers all-True — pessimistic but exact.
    ck = CuckooFilter.sized_for(100)
    h = _hashes(spark, 0, 10_000)
    ck.insert_vec(h)
    assert ck.saturated
    assert ck.contains_vec(h).all()
    # never-inserted items are also maybe-seen in degraded mode
    assert ck.contains_vec(_hashes(spark, 50_000, 50_100)).all()
    # further inserts are no-ops, not errors
    ck.insert_vec(_hashes(spark, 20_000, 20_100))


def test_insert_batch_with_duplicates_refcounts(spark):
    # Duplicate hashes within one batch (several scrapings claiming the
    # same URL in one round) each store a fingerprint; delete accounting
    # is exact per claim.
    import numpy as np

    ck = CuckooFilter.sized_for(1_000)
    h = _hashes(spark, 0, 100)
    ck.insert_vec(np.concatenate([h, h, h]))
    assert ck.count == 300
    assert ck.contains_vec(h).all()
    assert ck.delete_vec(np.concatenate([h, h, h])) == 300
    assert ck.count == 0


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

    from isidorus_web_scraper_spark.operators.cuckoo import BucketedCuckoo

    # default bloom_buckets=8 ⇒ the sharded deletable sketch
    assert isinstance(ck._bloom, BucketedCuckoo)
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


def test_bucketed_cuckoo_equals_single(spark):
    # same members, same answers (modulo shard-local fpp) — and the
    # sharded build (distributed, groupBy-bucket) must equal routing the
    # same hashes through driver-side shard inserts.
    from isidorus_web_scraper_spark.operators.cuckoo import (
        BucketedCuckoo,
        build_bucketed_cuckoo,
    )

    member = _hashes(spark, 0, 20_000)
    drv = BucketedCuckoo.sized_for(20_000, 8)
    drv.insert_vec(member)
    df = spark.range(20_000).select(F.xxhash64("id").alias("url_hash"))
    dist = build_bucketed_cuckoo(df, "url_hash", 8, 20_000)
    assert dist.count == drv.count == 20_000
    assert dist.contains_vec(member).all()
    assert drv.contains_vec(member).all()
    outside = _hashes(spark, 20_000, 60_000)
    assert dist.contains_vec(outside).mean() < 0.005
    # deletes route to the right shard
    a = member[:5_000]
    assert drv.delete_vec(a) == len(a)
    assert drv.contains_vec(member[5_000:]).all()
    assert drv.contains_vec(a).mean() < 0.01


def test_cuckoo_cogrouped_apply_matches_broadcast(spark):
    from isidorus_web_scraper_spark.operators.cuckoo import (
        build_bucketed_cuckoo,
        cuckoo_table_df,
        with_cuckoo_flag_cogrouped,
    )

    seen = spark.range(5_000).select(F.xxhash64("id").alias("url_hash"))
    ck = build_bucketed_cuckoo(seen, "url_hash", 8, 5_000)
    cand = spark.range(2_500, 7_500).select(
        F.col("id"), F.xxhash64("id").alias("url_hash")
    )
    flagged = with_cuckoo_flag_cogrouped(
        cand, "url_hash", cuckoo_table_df(ck, spark), ck.num_shards
    )
    got = {r.id: r.maybe_seen for r in flagged.collect()}
    h = cand.toPandas()
    want = dict(zip(h["id"], ck.contains_vec(h["url_hash"].to_numpy())))
    assert got == want
    # no false negatives: every truly-seen candidate flagged
    assert all(got[i] for i in range(2_500, 5_000))


def test_engine_cuckoo_cogrouped_equals_bloom(spark, tmp_path):
    # the full 10^10-tier combo: sharded cuckoo + cogrouped (no
    # broadcast) apply, end-state identical to the default bloom engine
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    from .test_crawl import spark_end_state

    docs = generate_documents(spark, n_hosts=4).persist()
    seeds = [(75, 1, "http://h0.test/p0.html", 2)]
    mk = lambda wh, **kw: CrawlEngine(  # noqa: E731
        spark,
        str(tmp_path / wh),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096, default_budget=1_000_000_000, **kw
        ),
    )
    bl = mk("wb")
    bl.start(seeds)
    bl.run()
    ck = mk("wc", seen_sketch="cuckoo", bloom_apply="cogrouped")
    ck.start(seeds)
    ck.run()
    assert spark_end_state(ck) == spark_end_state(bl)
    docs.unpersist()
