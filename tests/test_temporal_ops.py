"""Edge pins for the round-5 temporal/sampling operators that the
sf0.01 oracle rows cannot exercise: equal-timestamp as-of ties (the
synthetic events have microsecond timestamps, so ties never occur in
the data), the short-input n-gram guard, and the token-budget two-pass
plan's equivalence to the naive single-window spec at budgets that land
exactly on bucket boundaries."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.dataset_queries import (
    md5_long,
    word_ngrams,
    words,
)

TS = datetime.datetime  # noqa: N816 - alias for fixture brevity


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _asof(spark, events):
    """Drive the REAL shipped plan (dataset_queries._asof_plan),
    projected to the columns these pins assert on."""
    from isidorus_web_scraper_spark.dataset_queries import _asof_plan

    return _asof_plan(events).select(
        F.col("click_event_id").alias("event_id"), "view_event_id"
    )


def test_asof_equal_ts_view_is_visible(spark):
    """v.ts <= c.ts is INCLUSIVE: a view stamped at exactly the click's
    timestamp must win over an earlier view."""
    t0 = TS(2024, 1, 1, 12, 0, 0)
    t1 = TS(2024, 1, 1, 12, 30, 0)
    rows = [
        (1, 7, "view", t0),
        (2, 7, "view", t1),  # same instant as the click
        (3, 7, "click", t1),
    ]
    got = {r.event_id: r.view_event_id for r in _asof(spark, _events(spark, rows)).collect()}
    assert got == {3: 2}


def test_asof_equal_ts_tie_picks_max_event_id(spark):
    """Two views at the identical instant: the max event_id wins (the
    oracle's ORDER BY ts DESC, event_id DESC LIMIT 1)."""
    t = TS(2024, 1, 1, 12, 0, 0)
    rows = [
        (5, 7, "view", t),
        (9, 7, "view", t),
        (2, 7, "view", t),
        (10, 7, "click", t),
    ]
    got = {r.event_id: r.view_event_id for r in _asof(spark, _events(spark, rows)).collect()}
    assert got == {10: 9}


def test_asof_no_prior_view_is_null(spark):
    t0 = TS(2024, 1, 1, 12, 0, 0)
    t1 = TS(2024, 1, 1, 13, 0, 0)
    rows = [
        (1, 7, "click", t0),  # before any view
        (2, 7, "view", t1),
        (3, 8, "click", t1),  # user with no views at all
    ]
    got = {r.event_id: r.view_event_id for r in _asof(spark, _events(spark, rows)).collect()}
    assert got == {1: None, 3: None}


@pytest.mark.parametrize(
    ("text", "n", "expected"),
    [
        ("a b c", 2, ["a b", "b c"]),
        ("a b c", 3, ["a b c"]),
        ("a b c", 4, []),  # shorter than n: the sequence(1,0) guard
        ("", 5, []),  # split('') -> [''] (len 1)
        ("a", 1, ["a"]),
    ],
)
def test_word_ngrams_short_inputs(spark, text, n, expected):
    row = spark.range(1).select(
        word_ngrams(words(F.lit(text)), n).alias("g")
    ).collect()[0]
    assert row.g == expected


def _naive_budget_keep(docs, budget):
    """The oracle's spec: single window per source, keep while the
    tokens BEFORE the doc (hash order) are under budget."""
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.withColumn(
            "before_tok",
            F.coalesce(
                F.sum("tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .filter(F.col("before_tok") < budget)
        .select("source", "doc_id")
    )


def _two_pass_keep(docs, budget):
    """The shipped two-pass bucket plan (dataset_queries.token_budget_
    sample) parameterized by budget, returning kept doc ids."""
    t = docs.withColumn("bucket", F.shiftright(F.col("h"), 50))
    per_bucket = t.groupBy("source", "bucket").agg(F.sum("tok").alias("btok"))
    wb = Window.partitionBy("source").orderBy("bucket")
    classified = per_bucket.withColumn(
        "prev_cum",
        F.coalesce(
            F.sum("btok").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    ).withColumn(
        "cls",
        F.when(F.col("prev_cum") >= budget, F.lit("drop"))
        .when(F.col("prev_cum") + F.col("btok") <= budget, F.lit("keep"))
        .otherwise(F.lit("boundary")),
    )
    joined = t.join(
        F.broadcast(classified.select("source", "bucket", "prev_cum", "cls")),
        on=["source", "bucket"],
    )
    win = Window.partitionBy("source", "bucket").orderBy("h", "doc_id")
    boundary = (
        joined.filter(F.col("cls") == "boundary")
        .withColumn(
            "before_tok",
            F.col("prev_cum")
            + F.coalesce(
                F.sum("tok").over(win.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .filter(F.col("before_tok") < budget)
        .select("source", "doc_id")
    )
    return joined.filter(F.col("cls") == "keep").select(
        "source", "doc_id"
    ).unionByName(boundary)


@pytest.mark.parametrize("budget", [1, 37, 600, 10**9])
def test_token_budget_two_pass_equals_naive_window(spark, sf_correct, budget):
    """The two-pass bucket classification must reproduce the naive
    window EXACTLY at every budget: smaller than any doc (budget=1
    keeps exactly the hash-first doc per source), mid-bucket, the
    shipped default, and larger than the corpus (keeps everything)."""
    from isidorus_web_scraper_spark.sources.testdata import load

    docs = load(spark, sf_correct, "documents").select(
        "source",
        "doc_id",
        F.size(words(F.col("text"))).alias("tok"),
        md5_long(F.col("doc_id").cast("string")).alias("h"),
    )
    naive = {tuple(r) for r in _naive_budget_keep(docs, budget).collect()}
    two_pass = {tuple(r) for r in _two_pass_keep(docs, budget).collect()}
    assert two_pass == naive
    if budget == 1:
        # exactly one doc per source survives
        per_source = {}
        for s, _ in naive:
            per_source[s] = per_source.get(s, 0) + 1
        assert set(per_source.values()) == {1}
    if budget == 10**9:
        assert len(naive) == docs.count()


# ---------------------------------------------------------------------------
# Seeded brute-force comparisons: coarse 10-minute timestamp grid over a
# 3-hour span forces what sf0.01's microsecond data never produces —
# equal-ts ties, view==click instants, and events landing EXACTLY on the
# +1h range boundary (the < vs <= edge of the binned join).
# ---------------------------------------------------------------------------


def _random_events(seed: int, n: int = 200):
    import random

    rng = random.Random(seed)
    rows = []
    for eid in range(n):
        rows.append(
            (
                eid,
                rng.randrange(6),  # few users -> dense per-user histories
                rng.choice(["view", "click", "error", "other"]),
                TS(2024, 1, 1) + datetime.timedelta(minutes=10 * rng.randrange(19)),
            )
        )
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_matches_bruteforce(spark, seed):
    rows = _random_events(seed)
    expected = {}
    for eid, uid, et, ts in rows:
        if et != "click":
            continue
        cands = [
            (v_ts, v_eid)
            for v_eid, v_uid, v_et, v_ts in rows
            if v_et == "view" and v_uid == uid and v_ts <= ts
        ]
        expected[eid] = max(cands)[1] if cands else None
    got = {
        r.event_id: r.view_event_id
        for r in _asof(spark, _events(spark, rows)).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_range_join_matches_bruteforce(spark, seed):
    from isidorus_web_scraper_spark.dataset_queries import _range_binned_plan

    rows = _random_events(seed)
    one_h = datetime.timedelta(hours=1)
    expected = {}
    for eid, uid, et, ts in rows:
        if et != "error":
            continue
        n = sum(
            1
            for x_eid, x_uid, _, x_ts in rows
            if x_uid == uid and ts <= x_ts < ts + one_h and x_eid != eid
        )
        expected[eid] = n
    # the plan wants a value column; constant 0 keeps the count the
    # only degree of freedom under test here
    events = _events(spark, rows).withColumn("value", F.lit(0.0))
    got = {
        r.error_event_id: r.n_in_window
        for r in _range_binned_plan(events).collect()
    }
    assert got == expected


def test_epoch_arithmetic_is_dst_proof(spark):
    """Crafted spring-forward straddle (America/New_York, 2026-03-08):
    wall-clock arithmetic must measure 01:30→03:30 as 2 h. The old
    `ntz.cast("timestamp")` path read the wall-clocks in the session
    zone and measured 1 h (review finding)."""
    from pyspark.sql import functions as F

    from isidorus_web_scraper_spark.dataset_queries import ntz_epoch_ms

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("2026-03-08 01:30:00", "2026-03-08 03:30:00")],
            "a string, b string",
        ).select(
            F.col("a").cast("timestamp_ntz").alias("a"),
            F.col("b").cast("timestamp_ntz").alias("b"),
        )
        got = df.select(
            (ntz_epoch_ms(F.col("b")) - ntz_epoch_ms(F.col("a"))).alias("ms")
        ).first().ms
        assert got == 7_200_000, got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
