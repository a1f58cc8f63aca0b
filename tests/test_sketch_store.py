"""Warehouse-persisted seen-sketch (sketch_store='warehouse'):

The sharded Bloom/cuckoo sketch lives as the `seen_sketch` warehouse
table instead of driver memory — per-round updates run distributed
(bloom: OR-mergeable delta bitmaps appended; cuckoo: full updated
shards superseding by seq), the flag apply cogroups candidates straight
with the table, and resume READS the table instead of rebuilding from
the seen rows (VERDICT r4 item 1; reference analog: Redis holds the
seen set out-of-process, workers/scraper/repositories/redis_client.go:44-50).

Pinned here: end-state parity vs driver mode for both sketch kinds,
resume-without-rebuild, partial-round sketch rollback, distributed
cuckoo deletion, and fold bounding sketch reads at one row per bucket.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.corpus import generate_documents
from isidorus_web_scraper_spark.plans.crawl import (
    SKETCH_TABLE,
    CrawlConfig,
    CrawlEngine,
)

from .test_crawl import spark_end_state

SEEDS = [(70, 1, "http://h0.test/p0.html", 3)]


def _cfg(**overrides) -> CrawlConfig:
    base = dict(
        bloom_expected_urls=4096,
        bloom_buckets=4,
        default_budget=1_000_000_000,
        compact_every_rounds=None,
    )
    base.update(overrides)
    return CrawlConfig(**base)


def _run(spark, root, docs, cfg, seeds=SEEDS):
    eng = CrawlEngine(spark, str(root), documents=docs, config=cfg)
    eng.start(seeds)
    eng.run()
    return eng


def test_warehouse_bloom_equals_driver(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=5).persist()
    driver = _run(spark, tmp_path / "wa", docs, _cfg())
    wh = _run(spark, tmp_path / "wb", docs, _cfg(sketch_store="warehouse"))
    assert spark_end_state(wh) == spark_end_state(driver)
    assert wh.wh.exists(SKETCH_TABLE)
    # the driver never materialized a sketch object
    assert wh._bloom is None


def test_warehouse_cuckoo_equals_driver(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=5).persist()
    driver = _run(spark, tmp_path / "wa", docs, _cfg(seen_sketch="cuckoo"))
    wh = _run(
        spark,
        tmp_path / "wb",
        docs,
        _cfg(seen_sketch="cuckoo", sketch_store="warehouse"),
    )
    assert spark_end_state(wh) == spark_end_state(driver)
    rows = wh.wh.read(SKETCH_TABLE).collect()
    assert {r.bucket for r in rows} <= set(range(4))
    assert all(not r.saturated for r in rows)
    assert wh._bloom is None


def test_resume_reads_sketch_without_rebuild(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=5).persist()
    full = _run(spark, tmp_path / "wh_full", docs, _cfg(sketch_store="warehouse"))

    cfg = _cfg(sketch_store="warehouse")
    part = CrawlEngine(spark, str(tmp_path / "wh_part"), documents=docs, config=cfg)
    part.start(SEEDS)
    part.run_round(0)  # "crash" after round 0's commit

    resumed = CrawlEngine(
        spark, str(tmp_path / "wh_part"), documents=docs, config=cfg
    )
    before = len(resumed.wh._read_manifest(SKETCH_TABLE)["commits"])
    init_commits_before = [
        p for p in resumed.wh.commit_props(SKETCH_TABLE) if p.get("init")
    ]
    resumed.resume()
    assert spark_end_state(resumed) == spark_end_state(full)
    # resume did NOT re-run the init build: still exactly one init
    # commit, and no commit was replaced before the loop continued
    init_commits_after = [
        p for p in resumed.wh.commit_props(SKETCH_TABLE) if p.get("init")
    ]
    assert init_commits_after == init_commits_before
    after = len(resumed.wh._read_manifest(SKETCH_TABLE)["commits"])
    assert after >= before  # appended new rounds, never rebuilt from scratch


def test_partial_round_sketch_rolls_back(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=5).persist()
    cfg = _cfg(sketch_store="warehouse")
    eng = _run(spark, tmp_path / "wh", docs, cfg)
    next_round = eng._next_round()
    # simulate a crash window: a sketch commit written for a round whose
    # metrics never committed
    ghost = eng.wh.read(SKETCH_TABLE).limit(1)
    eng.wh.append(SKETCH_TABLE, ghost, {"round": next_round})
    tagged = [
        p for p in eng.wh.commit_props(SKETCH_TABLE) if p.get("round") == next_round
    ]
    assert tagged
    resumed = CrawlEngine(spark, str(tmp_path / "wh"), documents=docs, config=cfg)
    resumed.resume()
    tagged = [
        p
        for p in resumed.wh.commit_props(SKETCH_TABLE)
        if p.get("round") == next_round
    ]
    assert not tagged, "partial-round sketch commit survived rollback"


def test_forget_scraping_deletes_fingerprints_distributed(spark, tmp_path):
    from isidorus_web_scraper_spark.operators.cuckoo import (
        with_cuckoo_flag_cogrouped,
    )

    docs = generate_documents(spark, n_hosts=6).persist()
    cfg = _cfg(seen_sketch="cuckoo", sketch_store="warehouse")
    seeds = [
        (81, 1, "http://h0.test/p0.html", 2),
        (82, 1, "http://h3.test/p0.html", 2),
    ]
    eng = _run(spark, tmp_path / "wh", docs, cfg, seeds=seeds)

    seen = eng.wh.read("seen").persist()
    h82 = seen.filter("scraping_id = 82").select("url_hash")
    # the corpus cross-links hosts, so the two crawls share some URLs:
    # split 81's claims into exclusive and shared — the refcounted
    # multiset must evict the former and KEEP the latter (82 still
    # holds its own fingerprint copy; evicting it would be a false
    # negative for 82's future anti-join skip)
    h81_only = (
        seen.filter("scraping_id = 81")
        .select("url_hash")
        .join(h82, "url_hash", "left_anti")
    )
    h81_shared = (
        seen.filter("scraping_id = 81")
        .select("url_hash")
        .join(h82.distinct(), "url_hash", "left_semi")
    )
    assert h81_only.count() > 1 and h82.count() > 1

    def flags(hashes_df):
        out = with_cuckoo_flag_cogrouped(
            hashes_df, "url_hash", eng.wh.read(SKETCH_TABLE), cfg.bloom_buckets
        )
        return [r.maybe_seen for r in out.collect()]

    assert all(flags(h81_only)) and all(flags(h82))
    eng.forget_scraping(81, 1)
    # 81-exclusive fingerprints left the persisted sketch (an fpp-level
    # residue of ~1e-4 makes a stray True astronomically unlikely at
    # this set size)...
    assert not any(flags(h81_only))
    # ...while every claim 82 holds — shared URLs included — survives
    assert all(flags(h82))
    if h81_shared.count():
        assert all(flags(h81_shared))
    seen.unpersist()


def test_fold_bounds_sketch_rows(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=5).persist()
    plain = _run(spark, tmp_path / "wa", docs, _cfg())
    folded = _run(
        spark,
        tmp_path / "wb",
        docs,
        _cfg(sketch_store="warehouse", compact_every_rounds=1),
    )
    assert spark_end_state(folded) == spark_end_state(plain)
    # post-finalize full collapse: one commit, one row per touched bucket
    assert len(folded.wh._read_manifest(SKETCH_TABLE)["commits"]) == 1
    rows = folded.wh.read(SKETCH_TABLE).groupBy("bucket").count().collect()
    assert all(r["count"] == 1 for r in rows)


def test_warehouse_cuckoo_fold_keeps_latest(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=5).persist()
    plain = _run(spark, tmp_path / "wa", docs, _cfg(seen_sketch="cuckoo"))
    folded = _run(
        spark,
        tmp_path / "wb",
        docs,
        _cfg(
            seen_sketch="cuckoo",
            sketch_store="warehouse",
            compact_every_rounds=1,
        ),
    )
    assert spark_end_state(folded) == spark_end_state(plain)
    df = folded.wh.read(SKETCH_TABLE)
    per_bucket = df.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    assert all(r.n == 1 for r in per_bucket)


def test_warehouse_sketch_requires_shards(spark, tmp_path):
    import pytest

    docs = generate_documents(spark, n_hosts=3).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh"),
        documents=docs,
        config=_cfg(sketch_store="warehouse", bloom_buckets=1),
    )
    eng.start(SEEDS)
    with pytest.raises(ValueError, match="bloom_buckets"):
        eng.run()


def test_auto_store_resolves_by_sizing(spark, tmp_path):
    """sketch_store='auto': GB-scale sizings persist to the warehouse
    without opting in; small sizings keep the zero-I/O driver sketch;
    an unsharded config can't persist (no shard layout) so it stays
    driver-side whatever the sizing."""
    from isidorus_web_scraper_spark.plans.crawl import AUTO_WH_SKETCH_URLS

    def resolved(**over):
        eng = CrawlEngine(
            spark, str(tmp_path / "auto"), config=_cfg(sketch_store="auto", **over)
        )
        return eng.config.sketch_store

    assert resolved() == "driver"  # 4096 expected urls
    assert (
        resolved(bloom_expected_urls=AUTO_WH_SKETCH_URLS) == "warehouse"
    )
    assert (
        resolved(bloom_expected_urls=AUTO_WH_SKETCH_URLS, bloom_buckets=1)
        == "driver"
    )
    assert (
        resolved(bloom_expected_urls=AUTO_WH_SKETCH_URLS, use_bloom=False)
        == "driver"
    )
