"""robots.txt parser (functions/robots.py): section semantics, the
allow-all empty-Disallow idiom, crawl-delay, and the politeness-table
bridge. The robots_rules oracle covers the bulk arithmetic; these pin
the RFC-ish edge cases."""

from __future__ import annotations

from isidorus_web_scraper_spark.functions.robots import (
    parse_robots,
    politeness_from_robots,
)


def _robots_df(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def test_sections_and_directives(spark):
    txt = "\n".join(
        [
            "# comment",
            "User-agent: *",
            "Disallow: /private",
            "disallow: /tmp",          # case-insensitive directive
            "Crawl-delay: 3",
            "",
            "User-agent: evilbot",
            "Disallow: /",             # must NOT leak into *
            "Crawl-delay: 99",
            "User-Agent: *",           # reopened * section
            "Disallow: /later",
        ]
    )
    out = parse_robots(_robots_df(spark, [("a.test", txt)])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.host == "a.test"
    assert r.robots_disallow == ["/later", "/private", "/tmp"]
    assert r.crawl_delay_rounds == 3  # evilbot's 99 ignored


def test_empty_disallow_is_allow_all(spark):
    # "Disallow:" with no path is the RFC allow-all idiom — contributes
    # no prefix (a naive parse would block everything or emit '')
    txt = "User-agent: *\nDisallow:\nDisallow: /x"
    r = parse_robots(_robots_df(spark, [("a.test", txt)])).collect()[0]
    assert r.robots_disallow == ["/x"]


def test_no_star_section_drops_host(spark):
    txt = "User-agent: googlebot\nDisallow: /x"
    assert parse_robots(_robots_df(spark, [("a.test", txt)])).count() == 0


def test_directive_before_any_agent_ignored(spark):
    txt = "Disallow: /orphan\nUser-agent: *\nDisallow: /x"
    r = parse_robots(_robots_df(spark, [("a.test", txt)])).collect()[0]
    assert r.robots_disallow == ["/x"]


def test_politeness_from_robots_feeds_scheduler(spark):
    """The bridge yields the exact politeness schema and the scheduler
    enforces the parsed rules (robots block + crawl-delay deferral)."""
    from isidorus_web_scraper_spark.operators.politeness import (
        ACTION_DEFER,
        ACTION_FETCH,
        ACTION_ROBOTS,
        schedule_round,
    )

    txt = "User-agent: *\nDisallow: /blocked\nCrawl-delay: 1"
    pol = politeness_from_robots(_robots_df(spark, [("h0.test", txt)]))
    assert pol.columns == [
        "host", "max_fetches_per_round", "robots_disallow", "robots_allow",
        "crawl_delay_rounds",
    ]
    frontier = spark.createDataFrame(
        [
            (1, 1, "http://h0.test/blocked/page.html", 2, 0),
            (1, 1, "http://h0.test/ok.html", 2, 0),
            (1, 1, "http://h0.test/also_ok.html", 2, 1),  # off-round: delay=1
        ],
        "scraping_id long, user_id long, url string, depth int, round int",
    )
    acts = {
        r.url: r.action
        for r in schedule_round(frontier, pol, 0, default_budget=10).collect()
    }
    assert acts["http://h0.test/blocked/page.html"] == ACTION_ROBOTS
    assert acts["http://h0.test/ok.html"] == ACTION_FETCH  # round 0, delay ok
    assert acts["http://h0.test/also_ok.html"] == ACTION_DEFER  # round 1 % 2 != 0


def test_allow_parsed_per_section(spark):
    txt = "\n".join(
        [
            "User-agent: *",
            "Disallow: /private",
            "Allow: /private/public",
            "allow: /open",            # case-insensitive directive
            "User-agent: evilbot",
            "Allow: /evil-only",       # must NOT leak into *
        ]
    )
    r = parse_robots(_robots_df(spark, [("a.test", txt)])).collect()[0]
    assert r.robots_disallow == ["/private"]
    assert r.robots_allow == ["/open", "/private/public"]


def test_allow_longest_match_precedence(spark):
    """RFC 9309 §2.2.2: the most specific (longest) matching rule wins;
    Allow wins equal-length ties; the decision is the scheduler's own
    robots_blocked_col for every impl."""
    from isidorus_web_scraper_spark.operators.politeness import (
        ACTION_FETCH,
        ACTION_ROBOTS,
        schedule_round,
    )

    txt = "\n".join(
        [
            "User-agent: *",
            "Disallow: /private",
            "Allow: /private/public",
            "Disallow: /private/public/secret",
            "Allow: /tie",
            "Disallow: /tie",
        ]
    )
    pol = politeness_from_robots(_robots_df(spark, [("a.test", txt)]))
    cases = {
        "http://a.test/private/x": ACTION_ROBOTS,       # disallow only
        "http://a.test/private/public/x": ACTION_FETCH,  # allow longer
        "http://a.test/private/public/secret/x": ACTION_ROBOTS,  # deepest
        "http://a.test/tie/x": ACTION_FETCH,             # tie -> allow
        "http://a.test/elsewhere": ACTION_FETCH,         # no rule
    }
    frontier = spark.createDataFrame(
        [(1, 1, u, 2, 0) for u in cases],
        "scraping_id long, user_id long, url string, depth int, round int",
    )
    for impl in ("vectorized", "window", "grouped", "salted"):
        got = {
            r.url: r.action
            for r in schedule_round(frontier, pol, 0, impl=impl).collect()
        }
        assert got == cases, impl


def test_allow_only_host_kept(spark):
    # a *-section with ONLY Allow directives must still yield a config
    # row (so the allow rules reach the scheduler), not drop the host
    txt = "User-agent: *\nAllow: /only"
    out = parse_robots(_robots_df(spark, [("a.test", txt)])).collect()
    assert len(out) == 1
    assert out[0].robots_allow == ["/only"]
    assert out[0].robots_disallow == []
