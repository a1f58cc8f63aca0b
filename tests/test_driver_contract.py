"""Every queries() entry must match its oracle_sql() on sf0.01 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.driver_queries import ORACLE, QUERIES

from .oracle_compare import compare, duckdb_conn


@pytest.fixture(scope="module")
def conn(sf_correct):
    c = duckdb_conn(sf_correct)
    yield c
    c.close()


def test_entry_smoke(spark, sf_small):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_vs_oracle(spark, sf_correct, conn, name):
    compare(QUERIES[name](spark, sf_correct), conn, ORACLE[name])


def test_lsh_planted_neardup_recall(spark, sf_correct):
    """The multi-table LSH exists to find near-duplicates. The synthetic
    embeddings are isotropic random (worst case — recall@5 vs exact
    brute force is ~0.38 there, pinned by ann_multiprobe_recall); on
    PLANTED near-dups (cos ≥ 0.99) the tables must collide essentially
    always. This is the operator's actual workload."""
    from pyspark.sql import functions as F

    from isidorus_web_scraper_spark.dataset_queries import _bucket_cols
    from isidorus_web_scraper_spark.sources.testdata import load

    emb = load(spark, sf_correct, "embeddings").filter(F.col("vec_id") < 40)
    base = emb.filter(F.col("vec_id") < 20).select(
        "vec_id", F.col("embedding").alias("e1")
    )
    other = emb.filter(F.col("vec_id") >= 20).select(
        (F.col("vec_id") - 20).alias("vec_id"), F.col("embedding").alias("e2")
    )
    # perturbed copy: 0.95·orig + 0.05·other ⇒ cos(orig, copy) ≈ 0.999
    pair = base.join(other, "vec_id").select(
        "vec_id",
        "e1",
        F.zip_with("e1", "e2", lambda a, b: a * 0.95 + b * 0.05).alias("e1p"),
    )
    b_orig = F.array(*_bucket_cols(F.col("e1")))
    b_pert = F.array(*_bucket_cols(F.col("e1p")))
    collided = pair.select(
        F.arrays_overlap(
            F.zip_with(b_orig, b_pert, lambda a, b: F.when(a == b, 1).otherwise(0)),
            F.array(F.lit(1)),
        ).alias("hit")
    )
    hits = collided.agg(F.sum(F.col("hit").cast("int"))).first()[0]
    assert hits >= 19, f"planted near-dup collision recall too low: {hits}/20"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_query_runs(spark, sf_correct, name):
    # No-oracle queries (non-SQL-expressible) must at least run and
    # return a stable schema.
    df = QUERIES[name](spark, sf_correct)
    assert df.columns
    df.limit(5).collect()


def test_connected_components_deep_chain_bounded_plan(spark):
    """A 60-node path graph: diameter 59. With pointer jumping the loop
    converges in ~7 rounds instead of 59, and per-iteration
    localCheckpoint keeps the compiled plan CONSTANT-depth (persist alone
    cached data but accreted a join per iteration — a plan-explosion at
    adversarial diameters). Pins: correct single cluster, canonical
    min-label survivor, and a bounded final plan string."""
    from pyspark.sql import functions as F

    from isidorus_web_scraper_spark.dataset_queries import _connected_components

    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = _connected_components(pairs, max_iters=15)
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in out.collect()}
    assert len(rows) == n
    assert all(c == 0 for c, _ in rows.values())  # one component, min label
    assert [d for d, (_, k) in rows.items() if k == 1] == [0]
    # plan depth is truncated by the checkpoints, not proportional to
    # the 59-hop diameter
    plan = out._jdf.queryExecution().toString()
    assert plan.count("Join") <= 6, f"plan accreted joins:\n{plan[:2000]}"


def test_lsh_verified_single_pass_plan(spark, sf_correct):
    """dedup_lsh_verified_jaccard must read the corpus ONCE: the shared
    grams frame and the derived bands frame are persisted, so the band
    self-join's two sides and the verify join's two gram sides all scan
    caches (4+ InMemoryTableScans), and the md5-per-gram minhash pass is
    materialized a single time. Interleaved A/B: 22% wall saved at
    sf0.1 (BENCH/BASELINE.md §19); at 100 TB this is one full-corpus
    tokenize pass instead of three."""
    from isidorus_web_scraper_spark.dataset_queries import (
        dedup_lsh_verified_jaccard,
    )

    df = dedup_lsh_verified_jaccard(spark, sf_correct)
    try:
        # all four join leaves (band self-join's two sides, the verify
        # join's two gram sides) must scan caches; the parquet FileScan
        # text still APPEARS once per InMemoryRelation because toString
        # displays the cached lineage, but only the cache build executes
        # it — once.
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("InMemoryTableScan") >= 4, plan[:3000]
    finally:
        spark.catalog.clearCache()


@pytest.mark.parametrize(
    "name",
    ["events_tumbling_window", "events_rollup", "events_asof_join"],
)
def test_timestamp_queries_session_tz_independent(spark, sf_correct, conn, name):
    """date_trunc on a TIMESTAMP_NTZ column yields a session-tz
    TIMESTAMP, which PySpark renders in the SYSTEM zone — so any query
    emitting truncated timestamps silently shifts when session tz !=
    system tz unless the result is cast back to NTZ. Pin the fix by
    re-running the oracle compare with a session zone 9h off UTC."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        compare(QUERIES[name](spark, sf_correct), conn, ORACLE[name])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
