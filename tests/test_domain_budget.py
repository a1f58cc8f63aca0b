"""Domain-scoped politeness budgets (W42,
CrawlConfig.budget_scope='domain'): a registrable domain's budget is
Hamilton-apportioned across its frontier hosts, so a subdomain farm
shares ONE allowance instead of escaping the per-host cap with a fresh
budget per vanity subdomain."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.functions.url import domain_col
from isidorus_web_scraper_spark.operators.politeness import (
    domain_budget_override,
)
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from isidorus_web_scraper_spark.schema import DOCUMENTS

from .test_crawl import spark_end_state

FARM = [f"{c}.spam.test" for c in "abcdefghijklmnopqrstuvwxyz"]


def _farm_documents(spark):
    """A hub page fanning out to one page per farm subdomain, plus an
    unrelated host; every leaf is a plain text page."""
    text = [{"kind": "text", "text": "hello", "media_ref": None, "offset": 0}]
    hub_spans = [
        {
            "kind": "link",
            "text": None,
            "media_ref": f"http://{h}/p0.html",
            "offset": i,
        }
        for i, h in enumerate(FARM + ["other.test"])
    ]
    rows = [("http://hub.test/p0.html", hub_spans)] + [
        (f"http://{h}/p0.html", text) for h in FARM + ["other.test"]
    ]
    return spark.createDataFrame(rows, DOCUMENTS)


def test_domain_col_labels(spark):
    df = spark.createDataFrame(
        [("a.b.spam.test",), ("spam.test",), ("localhost",)], "h string"
    )
    got = [r[0] for r in df.select(domain_col("h", 2)).collect()]
    assert got == ["spam.test", "spam.test", "localhost"]


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "scraping_id long, user_id long, url string, depth int, round int"
    )


def test_domain_allocation_exact_hamilton(spark):
    """3 hosts of one domain with queues 5/3/2 share a domain budget of
    7: quotas floor(7*q/10) = 3/2/1 + one remainder unit to the largest
    fraction (a: 35%10=5, b: 21%10=1, c: 14%10=4 -> a gets it)."""
    rows = []
    for host, n in [("a.spam.test", 5), ("b.spam.test", 3), ("c.spam.test", 2),
                    ("solo.test", 4)]:
        rows += [(1, 1, f"http://{host}/p{i}.html", 1, 0) for i in range(n)]
    pol = spark.createDataFrame(
        [("spam.test", 7, [], 0, True)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, "
        "domain_budget boolean",
    )
    out = {
        r.host: r.max_fetches_per_round
        for r in domain_budget_override(
            _frontier(spark, rows), pol, default_budget=100
        ).collect()
    }
    assert out["a.spam.test"] == 4  # 3 + the remainder unit
    assert out["b.spam.test"] == 2
    assert out["c.spam.test"] == 1
    # sum == the domain budget exactly
    assert out["a.spam.test"] + out["b.spam.test"] + out["c.spam.test"] == 7
    # an unrelated single-host domain takes the default budget whole
    assert out["solo.test"] == 100
    # the flagged domain row is consumed here, never emitted as a host
    # config (the apex, if crawled, is just another farm member)
    assert "spam.test" not in out


def test_domain_allocation_host_row_still_binds(spark):
    """A host-keyed budget row bounds its own host below its domain
    share (min(host, allocation)) — a breaker budget-0 row survives."""
    rows = [(1, 1, f"http://{h}/p{i}.html", 1, 0)
            for h in ("a.spam.test", "b.spam.test") for i in range(4)]
    pol = spark.createDataFrame(
        [("spam.test", 6, [], 0, True), ("a.spam.test", 0, [], 0, False)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, "
        "domain_budget boolean",
    )
    out = {
        r.host: r.max_fetches_per_round
        for r in domain_budget_override(
            _frontier(spark, rows), pol, default_budget=100
        ).collect()
    }
    assert out["a.spam.test"] == 0  # host row wins below the share
    assert out["b.spam.test"] == 3  # its own share, not the freed units


def test_farm_crawl_shares_one_domain_budget(spark, tmp_path):
    """Crawl the 26-subdomain farm with domain budget 4: every round
    fetches exactly 4 farm pages (never 26), the farm drains over
    ceil(26/4) rounds, and the end state equals the unconstrained
    crawl's (deferred, never dropped)."""
    docs = _farm_documents(spark).persist()
    seeds = [(90, 1, "http://hub.test/p0.html", 1)]
    pol = spark.createDataFrame(
        [("spam.test", 4, [], 0, True)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, "
        "domain_budget boolean",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "wh_farm"),
        documents=docs,
        politeness=pol,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=10**9,
            budget_scope="domain",
            max_rounds=16,
        ),
    )
    eng.start(seeds)
    eng.run()
    per_round = {}
    for r in eng.wh.read("fetch_log").collect():
        if ".spam.test" in r.url:
            per_round[r.round] = per_round.get(r.round, 0) + 1
    assert per_round, "farm never fetched"
    assert all(v <= 4 for v in per_round.values()), per_round
    assert sum(per_round.values()) == 26  # every farm page exactly once
    assert len(per_round) == 7  # ceil(26/4) rounds to drain
    # the unrelated host was NOT throttled by the farm's budget
    other = [r.round for r in eng.wh.read("fetch_log").collect()
             if "other.test" in r.url]
    assert other == [1]

    ref = CrawlEngine(
        spark,
        str(tmp_path / "wh_ref"),
        documents=docs,
        config=CrawlConfig(bloom_expected_urls=4096, default_budget=10**9),
    )
    ref.start(seeds)
    ref.run()
    pages, seen, links, _, _ = spark_end_state(eng)
    rpages, rseen, rlinks, _, _ = spark_end_state(ref)
    assert set(pages) == set(rpages)
    for k, (content, summary, _r) in pages.items():
        assert (content, summary) == rpages[k][:2]
    assert seen == rseen and links == rlinks


def test_apex_host_override_never_becomes_domain_cap(spark):
    """Regression (session-8 review): a breaker budget-0 row for a
    cooling APEX host (hostname with exactly domain_labels labels)
    must zero THAT host only — before the explicit domain_budget flag,
    it was reinterpreted as the whole domain's total budget and the
    healthy subdomains deferred for the cooldown."""
    from isidorus_web_scraper_spark.operators.politeness import (
        backoff_override,
    )

    pol = spark.createDataFrame(
        [("shop.test", 6, [], 0, True)],
        "host string, max_fetches_per_round int, "
        "robots_disallow array<string>, crawl_delay_rounds int, "
        "domain_budget boolean",
    )
    cooling = spark.createDataFrame([("shop.test",)], "host string")
    pol2 = backoff_override(cooling, pol)
    # the flagged domain cap survived the breaker untouched
    caps = {
        (r.host, bool(r.domain_budget)): r.max_fetches_per_round
        for r in pol2.collect()
    }
    assert caps[("shop.test", True)] == 6   # the domain cap
    assert caps[("shop.test", False)] == 0  # the apex host's own zero
    rows = [(1, 1, f"http://{h}/p{i}.html", 1, 0)
            for h, n in [("www.shop.test", 4), ("img.shop.test", 4),
                         ("shop.test", 2)]
            for i in range(n)]
    out = {
        r.host: r.max_fetches_per_round
        for r in domain_budget_override(
            _frontier(spark, rows), pol2, default_budget=100
        ).collect()
    }
    # healthy subdomains share the domain budget (2+1 base + remainder)
    assert out["www.shop.test"] == 2
    assert out["img.shop.test"] == 3
    # the cooling apex is budget-0 via min(host row, allocation)
    assert out["shop.test"] == 0


def test_budget_scope_validation(spark, tmp_path):
    docs = _farm_documents(spark)
    for bad in (dict(budget_scope="pld"),
                dict(budget_scope="domain", domain_labels=0)):
        with pytest.raises(ValueError, match="budget_scope"):
            CrawlEngine(
                spark,
                str(tmp_path / "wh_v"),
                documents=docs,
                config=CrawlConfig(bloom_expected_urls=64, **bad),
            )
