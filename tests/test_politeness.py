"""Scheduler implementation equivalence: the vectorized mapInPandas
scheduler must produce exactly the same actions as the literal
groupBy(host).applyInPandas priority queue."""

from __future__ import annotations

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.operators.politeness import schedule_round


def _frontier(spark, n=500, hosts=23, round_no=0):
    # the scheduler reads the round from the rows (constant-plan rounds)
    # — the crawl engine always keeps row round == round_no
    rows = [
        (1, 1, f"http://h{i % hosts}.test/p{i}.html", 1 + i % 3, round_no)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )


def _politeness(spark):
    return spark.createDataFrame(
        [
            ("h0.test", 3, ["/p1"], 0),
            ("h1.test", 1, [], 1),      # crawl_delay: fetch only on even rounds
            ("h2.test", 100, ["/"], 0),  # fully robots-blocked
        ],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )


def _collect(df):
    return sorted(
        (r.url, r.action) for r in df.select("url", "action").collect()
    )


def test_vectorized_equals_grouped_equals_window(spark):
    pol = _politeness(spark)
    for round_no in (0, 1):
        frontier = _frontier(spark, round_no=round_no)
        a = _collect(schedule_round(frontier, pol, round_no, 4, impl="vectorized"))
        b = _collect(schedule_round(frontier, pol, round_no, 4, impl="grouped"))
        c = _collect(schedule_round(frontier, pol, round_no, 4, impl="window"))
        d = _collect(
            schedule_round(
                frontier, pol, round_no, 4, impl="salted", salt_shards=3
            )
        )
        assert a == b, f"impl mismatch at round {round_no}"
        assert a == c, f"window impl mismatch at round {round_no}"
        assert a == d, f"salted impl mismatch at round {round_no}"


def test_window_impl_no_politeness_config(spark):
    # politeness=None: every host takes the default budget; the window
    # impl must agree with the pandas impls there too (null-host
    # sentinel included).
    rows = [
        (1, 1, f"http://h{i % 5}.test/p{i}.html", 1, 0) for i in range(60)
    ] + [(1, 1, "http://", 1, 0)]  # malformed → null host sentinel
    frontier = spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )
    a = _collect(schedule_round(frontier, None, 0, 4, impl="vectorized"))
    c = _collect(schedule_round(frontier, None, 0, 4, impl="window"))
    d = _collect(
        schedule_round(frontier, None, 0, 4, impl="salted", salt_shards=3)
    )
    assert a == c
    assert a == d


def test_salted_impl_hot_host(spark):
    # the skew case the salted impl exists for: one zipf-head host
    # carrying most of the round. Fetch set (the order-sensitive part)
    # must equal the global window impl's exactly, at several shard
    # counts including S=1 (degenerate: stage 1 IS the global rank) and
    # S > rows-per-host (every shard holds ~1 row).
    rows = [
        (1, 1, f"http://hot.test/p{i:04d}.html", 1 + i % 3, 0)
        for i in range(400)
    ] + [(1, 1, f"http://h{i}.test/x.html", 1, 0) for i in range(20)]
    frontier = spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )
    pol = spark.createDataFrame(
        [("hot.test", 5, ["/p001"], 0)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    ref = _collect(schedule_round(frontier, pol, 0, 4, impl="window"))
    for s in (1, 4, 1024):
        got = _collect(
            schedule_round(frontier, pol, 0, 4, impl="salted", salt_shards=s)
        )
        assert got == ref, f"salted(S={s}) diverged"


def test_salted_impl_plan_is_pure_jvm_one_shuffle(spark):
    # pure JVM like the window impl, and the two union branches must
    # REUSE the one (host, salt) exchange rather than shuffling twice
    frontier = _frontier(spark, n=50, hosts=3)
    df = schedule_round(frontier, _politeness(spark), 0, 4, impl="salted")
    df.collect()  # AQE resolves exchange reuse only in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Pandas" not in plan, plan
    assert "ReusedExchange" in plan, plan


def test_window_impl_plan_is_pure_jvm(spark):
    # the whole decision must stay JVM-side: no Python evaluation
    # (ArrowEvalPython/FlatMapsInPandas) anywhere in the plan
    frontier = _frontier(spark, n=50, hosts=3)
    plan = (
        schedule_round(frontier, _politeness(spark), 0, 4, impl="window")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Pandas" not in plan, plan


def test_budget_and_robots_semantics(spark):
    frontier = _frontier(spark, n=200, hosts=4)
    pol = _politeness(spark)
    out = schedule_round(frontier, pol, 0, 4, impl="vectorized")
    per = (
        out.groupBy("host", "action").count().collect()
    )
    d = {(r.host, r.action): r["count"] for r in per}
    assert d.get(("h0.test", "fetch"), 0) <= 3          # budget
    assert ("h2.test", "fetch") not in d                 # robots blocks all
    assert d.get(("h2.test", "robots_blocked"), 0) == 50
    assert d.get(("h3.test", "fetch"), 0) == 4           # default budget
    # delay host: round 0 fetches (0 % 2 == 0)
    assert d.get(("h1.test", "fetch"), 0) == 1
    frontier1 = _frontier(spark, n=200, hosts=4, round_no=1)
    out1 = schedule_round(frontier1, pol, 1, 4, impl="vectorized")
    d1 = {
        (r.host, r.action): r["count"]
        for r in out1.groupBy("host", "action").count().collect()
    }
    assert ("h1.test", "fetch") not in d1                # delayed round
    assert d1.get(("h1.test", "defer"), 0) == 50


def test_salted_equals_window_on_mixed_round_frontier(spark):
    # rows of ONE host carrying different rounds, so delay_ok varies
    # within the host: delayed rows must still consume rank slots
    # (the window impl's rank counts every non-blocked preceding row)
    rows = [
        (1, 1, f"http://hot.test/p{i:03d}.html", 1, i % 2) for i in range(40)
    ]
    frontier = spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )
    pol = spark.createDataFrame(
        [("hot.test", 3, [], 1)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    ref = _collect(schedule_round(frontier, pol, 0, 4, impl="window"))
    got = _collect(
        schedule_round(frontier, pol, 0, 4, impl="salted", salt_shards=3)
    )
    assert got == ref


def _frontier_prio(spark, n=200, hosts=11, round_no=0):
    """Frontier with a priority column: priority = i % 7 (varies within
    every host and depth level)."""
    rows = [
        (1, 1, f"http://h{i % hosts}.test/p{i}.html", 1 + i % 3, round_no,
         i % 7)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "scraping_id long, user_id long, url string, depth int, round int, "
        "priority long",
    )


def test_priority_column_equivalence_across_impls(spark):
    # all four impls must consume the optional priority column through
    # the same (depth DESC, priority DESC, url) order
    pol = _politeness(spark)
    frontier = _frontier_prio(spark)
    a = _collect(schedule_round(frontier, pol, 0, 2, impl="vectorized"))
    b = _collect(schedule_round(frontier, pol, 0, 2, impl="grouped"))
    c = _collect(schedule_round(frontier, pol, 0, 2, impl="window"))
    d = _collect(
        schedule_round(frontier, pol, 0, 2, impl="salted", salt_shards=3)
    )
    assert a == b == c == d


def test_priority_reorders_within_depth_only(spark):
    # same host, same depth, budget 1: the higher-priority URL fetches
    # even though the other sorts first by url; a DEEPER url still
    # beats any priority (priority slots BELOW depth).
    rows = [
        (1, 1, "http://h0.test/a.html", 1, 0, 0),   # url-first, low prio
        (1, 1, "http://h0.test/z.html", 1, 0, 5),   # high prio, same depth
        (1, 1, "http://h1.test/a.html", 1, 0, 9),   # high prio, shallow
        (1, 1, "http://h1.test/z.html", 2, 0, 0),   # deeper wins anyway
    ]
    frontier = spark.createDataFrame(
        rows,
        "scraping_id long, user_id long, url string, depth int, round int, "
        "priority long",
    )
    for impl in ("vectorized", "grouped", "window", "salted"):
        acts = dict(_collect(schedule_round(frontier, None, 0, 1, impl=impl)))
        assert acts["http://h0.test/z.html"] == "fetch", impl
        assert acts["http://h0.test/a.html"] == "defer", impl
        assert acts["http://h1.test/z.html"] == "fetch", impl
        assert acts["http://h1.test/a.html"] == "defer", impl


def test_no_priority_column_order_unchanged(spark):
    # absent the column, actions are identical to a frame that carries
    # constant priority (the keys degenerate to (depth DESC, url))
    pol = _politeness(spark)
    base = _frontier(spark)
    withc = base.withColumn("priority", F.lit(0).cast("long"))
    a = _collect(schedule_round(base, pol, 0, 2, impl="window"))
    b = _collect(schedule_round(withc, pol, 0, 2, impl="window"))
    assert a == b
