"""Bloom seen-set pre-filter: no false negatives (exactness of the
crawl depends on it), sane fpp, distributed/driver builds agree."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.operators.bloom import (
    build_bloom,
    optimal_params,
    prefiltered_anti_join,
    with_bloom_flag,
)


def test_no_false_negatives_and_fpp(spark):
    df = spark.range(20_000).select(F.xxhash64("id").alias("h"))
    bloom = build_bloom(df, "h", expected_items=20_000, fpp=1e-3)
    member = df.toPandas()["h"].to_numpy()
    assert bloom.contains_vec(member).all()  # zero false negatives
    outside = (
        spark.range(20_000, 60_000).select(F.xxhash64("id").alias("h"))
        .toPandas()["h"].to_numpy()
    )
    fp = bloom.contains_vec(outside).mean()
    assert fp < 0.01, f"false-positive rate too high: {fp}"


def test_driver_insert_matches_distributed_build(spark):
    df = spark.range(5_000).select(F.xxhash64("id").alias("h"))
    dist = build_bloom(df, "h", expected_items=5_000, fpp=1e-3)
    m, k = optimal_params(5_000, 1e-3)
    from isidorus_web_scraper_spark.operators.bloom import BloomFilter

    drv = BloomFilter(m, k, np.zeros(m // 8, dtype=np.uint8))
    drv.insert_vec(df.toPandas()["h"].to_numpy())
    assert (dist.bits == drv.bits).all()


def test_prefiltered_anti_join_exact(spark):
    seen = spark.range(1_000).select(
        F.lit(1).alias("scraping_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    ).withColumn("url_hash", F.xxhash64("url"))
    candidates = spark.range(500, 2_000).select(
        F.lit(1).alias("scraping_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    ).withColumn("url_hash", F.xxhash64("url"))
    bloom = build_bloom(seen, "url_hash", 1_000, 1e-3)
    new = prefiltered_anti_join(
        candidates, seen, ["scraping_id", "url"], "url_hash", bloom
    )
    got = sorted(r.url for r in new.collect())
    want = sorted(f"u{i}" for i in range(1_000, 2_000))
    assert got == want  # bloom is a pre-filter only: result is exact


def test_flag_column(spark):
    df = spark.range(100).select(F.xxhash64("id").alias("h"))
    bloom = build_bloom(df.filter("h % 2 = 0"), "h", 100, 1e-3)
    flagged = with_bloom_flag(df, "h", bloom)
    rows = flagged.collect()
    # every inserted hash must be flagged maybe_seen
    for r in rows:
        if r.h % 2 == 0:
            assert r.maybe_seen


# ---------------------------------------------------------------- bucketed


def test_bucketed_no_false_negatives_and_size_bound(spark):
    from isidorus_web_scraper_spark.operators.bloom import (
        build_bucketed_bloom,
        optimal_params,
    )

    n, B = 40_000, 16
    df = spark.range(n).select(F.xxhash64("id").alias("h"))
    bb = build_bucketed_bloom(df, "h", B, expected_items=n, fpp=1e-3)
    member = df.toPandas()["h"].to_numpy()
    assert bb.contains_vec(member).all()  # zero false negatives
    outside = (
        spark.range(n, 3 * n).select(F.xxhash64("id").alias("h"))
        .toPandas()["h"].to_numpy()
    )
    assert bb.contains_vec(outside).mean() < 0.01
    # size bound: each shard is sized for n/B items, so no bitmap comes
    # anywhere near the single-filter size — THE broadcastability claim
    m_single, _ = optimal_params(n, 1e-3)
    for f in bb.filters:
        assert f.bits.nbytes <= (m_single // 8) // B + 64
    assert bb.total_bytes <= (m_single // 8) + 64 * B


def test_bucketed_equals_single_on_anti_join(spark):
    """The sharded sketch must route EXACTLY like the single bitmap
    through prefiltered_anti_join (result is exact either way — this
    pins that the plumbing accepts both)."""
    from isidorus_web_scraper_spark.operators.bloom import build_bucketed_bloom

    seen = spark.range(1_000).select(
        F.lit(1).alias("scraping_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    ).withColumn("url_hash", F.xxhash64("url"))
    candidates = spark.range(500, 2_000).select(
        F.lit(1).alias("scraping_id"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    ).withColumn("url_hash", F.xxhash64("url"))
    single = build_bloom(seen, "url_hash", 1_000, 1e-3)
    bucketed = build_bucketed_bloom(seen, "url_hash", 8, 1_000, 1e-3)
    want = sorted(
        r.url
        for r in prefiltered_anti_join(
            candidates, seen, ["scraping_id", "url"], "url_hash", single
        ).collect()
    )
    got = sorted(
        r.url
        for r in prefiltered_anti_join(
            candidates, seen, ["scraping_id", "url"], "url_hash", bucketed
        ).collect()
    )
    assert got == want == sorted(f"u{i}" for i in range(1_000, 2_000))


def test_bucketed_driver_insert_matches_distributed(spark):
    from isidorus_web_scraper_spark.operators.bloom import (
        build_bucketed_bloom,
        empty_bucketed,
    )

    df = spark.range(5_000).select(F.xxhash64("id").alias("h"))
    dist = build_bucketed_bloom(df, "h", 8, expected_items=5_000, fpp=1e-3)
    drv = empty_bucketed(8, 5_000, 1e-3)
    drv.insert_vec(df.toPandas()["h"].to_numpy())
    for a, b in zip(dist.filters, drv.filters):
        assert (a.bits == b.bits).all()


def test_cogrouped_apply_equals_broadcast(spark):
    """The no-broadcast cogrouped apply (the 10^10-URL path: each task
    holds one bucket's bitmap) flags exactly like the broadcast path."""
    from isidorus_web_scraper_spark.operators.bloom import (
        bloom_bits_df,
        build_bucketed_bloom,
        with_bloom_flag_cogrouped,
    )

    B = 8
    seen = spark.range(2_000).select(F.xxhash64("id").alias("h"))
    bb = build_bucketed_bloom(seen, "h", B, 2_000, 1e-3)
    cands = spark.range(1_000, 5_000).select(
        F.col("id").alias("cid"), F.xxhash64("id").alias("h")
    )
    broadcast_flags = {
        r.cid: r.maybe_seen for r in with_bloom_flag(cands, "h", bb).collect()
    }
    bits = bloom_bits_df(bb, spark)
    cogroup_flags = {
        r.cid: r.maybe_seen
        for r in with_bloom_flag_cogrouped(cands, "h", bits, B).collect()
    }
    assert cogroup_flags == broadcast_flags


def test_bucketing_agrees_for_non_power_of_two_B(spark):
    """Regression: Spark pmod(signed, B) vs numpy uint64 % B disagree for
    any B that isn't a power of two (half of xxhash64 outputs are
    negative). A mismatch sends candidates to the wrong bucket's bitmap
    → Bloom FALSE NEGATIVES → seen URLs re-crawled. Pin agreement for
    odd/prime B on all three paths: distributed build, driver insert,
    cogrouped apply."""
    from isidorus_web_scraper_spark.operators.bloom import (
        bloom_bits_df,
        build_bucketed_bloom,
        empty_bucketed,
        with_bloom_flag_cogrouped,
    )

    for B in (7, 13):
        seen = spark.range(3_000).select(F.xxhash64("id").alias("h"))
        bb = build_bucketed_bloom(seen, "h", B, 3_000, 1e-3)
        member = seen.toPandas()["h"].to_numpy()
        # zero false negatives through the broadcast path
        assert bb.contains_vec(member).all(), f"B={B}: broadcast FN"
        # driver-insert build must land in the same buckets
        drv = empty_bucketed(B, 3_000, 1e-3)
        drv.insert_vec(member)
        for a, b in zip(bb.filters, drv.filters):
            assert (a.bits == b.bits).all(), f"B={B}: bucket routing split"
        # cogrouped apply (pmod bucketing) must flag every member
        cands = spark.range(3_000).select(
            F.col("id").alias("cid"), F.xxhash64("id").alias("h")
        )
        flags = with_bloom_flag_cogrouped(
            cands, "h", bloom_bits_df(bb, spark), B
        ).collect()
        assert all(r.maybe_seen for r in flags), f"B={B}: cogrouped FN"
