"""Per-host failure circuit breaker (W41, CrawlConfig.error_backoff_*):
hosts answering mostly 5xx cool down for error_backoff_rounds rounds
(budget 0 ⇒ defer, never drop), then half-open-probe again. Derived
each round from the committed fetch_log, so resume needs no state.

The reference has no failure handling at all (its http.Get error path
just drops the page, page_fetcher.go:14-20); the breaker composes with
this repo's retry ledger: a 503'd URL's retry lands AFTER the cooldown
instead of hammering the struggling host on the very next round."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.corpus import generate_documents
from isidorus_web_scraper_spark.operators.politeness import (
    backoff_override,
    cooling_hosts,
)
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

from .test_crawl import spark_end_state


def _log_df(spark, rows):
    return spark.createDataFrame(
        rows, "scraping_id long, url string, round int, status int, error string"
    )


def test_cooling_hosts_threshold_and_min_attempts(spark):
    log = _log_df(
        spark,
        # h0: 3/4 transient -> trips at threshold 0.5
        [(1, "http://h0.test/p0.html", 0, 503, "transient error"),
         (1, "http://h0.test/p1.html", 0, 503, "transient error"),
         (1, "http://h0.test/p2.html", 0, 503, "transient error"),
         (1, "http://h0.test/p3.html", 0, 200, None),
         # h1: 2/4 transient -> exactly AT threshold 0.5 (>= trips)
         (1, "http://h1.test/p0.html", 0, 503, "transient error"),
         (1, "http://h1.test/p1.html", 0, 503, "transient error"),
         (1, "http://h1.test/p2.html", 0, 200, None),
         (1, "http://h1.test/p3.html", 0, 200, None),
         # h2: 1/4 transient -> below threshold
         (1, "http://h2.test/p0.html", 0, 503, "transient error"),
         (1, "http://h2.test/p1.html", 0, 200, None),
         (1, "http://h2.test/p2.html", 0, 200, None),
         (1, "http://h2.test/p3.html", 0, 200, None),
         # h3: 3/3 transient but below min_attempts=4 -> no trip
         (1, "http://h3.test/p0.html", 0, 503, "transient error"),
         (1, "http://h3.test/p1.html", 0, 503, "transient error"),
         (1, "http://h3.test/p2.html", 0, 503, "transient error"),
         # h4: all 404 (permanent) -> 404s are NOT host-health errors
         (1, "http://h4.test/p0.html", 0, 404, "fetch error"),
         (1, "http://h4.test/p1.html", 0, 404, "fetch error"),
         (1, "http://h4.test/p2.html", 0, 404, "fetch error"),
         (1, "http://h4.test/p3.html", 0, 404, "fetch error")],
    )
    got = {r.host for r in cooling_hosts(log, 0.5, 4).collect()}
    assert got == {"h0.test", "h1.test"}
    # min_attempts=3 admits h3 too
    got3 = {r.host for r in cooling_hosts(log, 0.5, 3).collect()}
    assert got3 == {"h0.test", "h1.test", "h3.test"}


def test_backoff_override_composition(spark):
    cooling = spark.createDataFrame([("h0.test",), ("h9.test",)], "host string")
    pol = spark.createDataFrame(
        [("h0.test", 7, ["/private"], 1), ("h1.test", 3, [], 0)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int",
    )
    out = {r.host: r for r in backoff_override(cooling, pol).collect()}
    # cooling host present in config: budget forced 0, robots/delay kept
    assert out["h0.test"].max_fetches_per_round == 0
    assert list(out["h0.test"].robots_disallow) == ["/private"]
    assert out["h0.test"].crawl_delay_rounds == 1
    # cooling host absent from config: fresh budget-0 row
    assert out["h9.test"].max_fetches_per_round == 0
    assert out["h9.test"].robots_disallow is None
    # non-cooling host untouched
    assert out["h1.test"].max_fetches_per_round == 3
    # None config: only cooling rows, budget 0
    none_out = {r.host: r for r in backoff_override(cooling, None).collect()}
    assert set(none_out) == {"h0.test", "h9.test"}
    assert all(r.max_fetches_per_round == 0 for r in none_out.values())


def _h1_log(eng):
    return sorted(
        (r.round, r.status)
        for r in eng.wh.read("fetch_log")
        .filter("url LIKE 'http://h1.test%'")
        .collect()
    )


def test_breaker_trips_defers_and_recovers(spark, tmp_path):
    """h1 is down (503) through round 2. The breaker trips on the first
    failed round T, h1 pays ZERO attempts during the 2-round cooldown
    (rounds T+1, T+2 — without the breaker, retries re-attempt every
    round), half-open-probes at T+3 and succeeds. End pages/seen equal
    the breaker-off crawl (the breaker only delays, never drops), and
    the retry ledger shows the breaker SAVED attempts."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(80, 1, "http://h0.test/p0.html", 3)]

    def cfg(breaker: bool) -> CrawlConfig:
        return CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=10**9,
            retry_max_attempts=8,
            max_rounds=24,
            availability_sql="NOT (url LIKE 'http://h1.test%' AND round <= 2)",
            **(
                dict(
                    error_backoff_threshold=0.5,
                    error_backoff_min_attempts=1,
                    error_backoff_rounds=2,
                )
                if breaker
                else {}
            ),
        )

    eng = CrawlEngine(spark, str(tmp_path / "wh_b"), documents=docs, config=cfg(True))
    eng.start(seeds)
    eng.run()
    ref = CrawlEngine(spark, str(tmp_path / "wh_n"), documents=docs, config=cfg(False))
    ref.start(seeds)
    ref.run()

    log = _h1_log(eng)
    rounds_attempted = {r for (r, _s) in log}
    # trip round T: the first (failed) h1 attempt round
    t = min(r for (r, s) in log if s == 503)
    # every 503 is in round T — the breaker stopped further attempts
    # until the probe, which succeeded (T >= 1 so T+3 > 2 = downtime)
    assert {r for (r, s) in log if s == 503} == {t}
    # cooldown: zero h1 attempts while round T stays in the window
    assert t + 1 not in rounds_attempted and t + 2 not in rounds_attempted
    # half-open probe right after the cooldown succeeds
    assert (t + 3, 200) in log
    # breaker-off control DID hammer the host during the cooldown rounds
    ref_503_rounds = {r for (r, s) in _h1_log(ref) if s == 503}
    assert len(ref_503_rounds) > 1
    # the breaker saved ledger attempts host-wide
    assert len(log) < len(_h1_log(ref))

    pages, seen, links, _, _ = spark_end_state(eng)
    ref_pages, ref_seen, ref_links, _, _ = spark_end_state(ref)
    assert set(pages) == set(ref_pages)
    for k, (content, summary, _r) in pages.items():
        assert (content, summary) == ref_pages[k][:2]
    assert seen == ref_seen
    assert links == ref_links


def test_breaker_min_attempts_gate(spark, tmp_path):
    """A host whose window never reaches min_attempts keeps fetching —
    the breaker must not trip on a single flaky URL."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(81, 1, "http://h0.test/p0.html", 3)]
    cfg = CrawlConfig(
        bloom_expected_urls=4096,
        default_budget=10**9,
        retry_max_attempts=8,
        max_rounds=24,
        availability_sql="NOT (url LIKE 'http://h1.test%' AND round <= 2)",
        error_backoff_threshold=0.5,
        error_backoff_min_attempts=10**6,  # unreachable
        error_backoff_rounds=2,
    )
    eng = CrawlEngine(spark, str(tmp_path / "wh_g"), documents=docs, config=cfg)
    eng.start(seeds)
    eng.run()
    log = _h1_log(eng)
    t = min(r for (r, _s) in log)
    rounds = {r for (r, _s) in log}
    # retries kept attempting on the very next rounds (no cooldown ever)
    assert t + 1 in rounds and t + 2 in rounds


def test_breaker_resume_mid_cooldown(spark, tmp_path):
    """Crash after the trip round, resume with a fresh engine: the
    breaker re-derives the cooldown from the committed fetch_log and
    the end state equals the uninterrupted crawl's."""
    docs = generate_documents(spark, n_hosts=2).persist()
    seeds = [(82, 1, "http://h0.test/p0.html", 3)]

    def cfg() -> CrawlConfig:
        return CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=10**9,
            retry_max_attempts=8,
            max_rounds=24,
            availability_sql="NOT (url LIKE 'http://h1.test%' AND round <= 2)",
            error_backoff_threshold=0.5,
            error_backoff_min_attempts=1,
            error_backoff_rounds=2,
        )

    full = CrawlEngine(spark, str(tmp_path / "wh_f"), documents=docs, config=cfg())
    full.start(seeds)
    full.run()

    part = CrawlEngine(spark, str(tmp_path / "wh_p"), documents=docs, config=cfg())
    part.start(seeds)
    part.run_round(0)
    part.run_round(1)  # the trip round commits, then "crash"

    resumed = CrawlEngine(spark, str(tmp_path / "wh_p"), documents=docs, config=cfg())
    resumed.resume()

    assert spark_end_state(resumed) == spark_end_state(full)
    # the cooldown held across the restart: no attempts in the two
    # rounds after the (re-derived) trip round
    log = _h1_log(resumed)
    rounds = {r for (r, _s) in log}
    t = min(r for (r, s) in log if s == 503)
    assert t + 1 not in rounds and t + 2 not in rounds


def test_breaker_config_validation(spark, tmp_path):
    docs = generate_documents(spark, n_hosts=1)
    for bad in (dict(error_backoff_threshold=0.0),
                dict(error_backoff_threshold=1.5),
                # below the 1e-6 rational-conversion floor: would
                # collapse to 0/1 and trip every host (review finding)
                dict(error_backoff_threshold=1e-9),
                dict(error_backoff_threshold=0.5, error_backoff_rounds=0),
                # 0 min-attempts trips on a single flaky 503
                dict(error_backoff_threshold=0.5,
                     error_backoff_min_attempts=0)):
        with pytest.raises(ValueError, match="error_backoff"):
            CrawlEngine(
                spark,
                str(tmp_path / "wh_v"),
                documents=docs,
                config=CrawlConfig(bloom_expected_urls=64, **bad),
            )


def test_cooling_hosts_rejects_sub_floor_threshold(spark):
    log = _log_df(spark, [(1, "http://h0.test/p0.html", 0, 503, "t")])
    with pytest.raises(ValueError, match="rational-conversion floor"):
        cooling_hosts(log, 1e-9, 1)
