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
