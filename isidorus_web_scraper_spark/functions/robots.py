"""robots.txt parsing as a columnar DataFrame op.

The reference crawler fetches with a bare ``http.Get`` and NO robots
handling (`workers/scraper/repositories/page_fetcher.go:14-20`); the
north_rule mandates per-host politeness incl. robots. The politeness
scheduler (operators/politeness.py) consumes a pre-parsed per-host
config table; this module produces that table FROM raw robots.txt
payloads — all JVM-columnar (posexplode + regexp + window), zero Python.

Semantics (documented simplification of RFC 9309 grouping): a directive
belongs to the MOST RECENT preceding ``User-agent`` line; only the
``*`` agent's rules are kept (this crawler sends no product token).
Parsed per host:

- ``Disallow: <prefix>`` → path-prefix blocklist (empty Disallow — the
  allow-all idiom — contributes nothing, matching its RFC meaning);
- ``Allow: <prefix>`` → path-prefix allowlist; the scheduler resolves
  Allow-vs-Disallow by RFC 9309 §2.2.2 longest-match precedence (most
  specific rule wins, Allow wins equal-length ties) — see
  ``operators.politeness.robots_blocked_col``;
- ``Crawl-delay: <n>`` → ``crawl_delay_rounds`` (the round-granular
  rendition of the de-facto extension);
- comments (``#``) and unknown directives are ignored by construction
  (the regexes match nothing).

At 100 TB scale this runs once per politeness refresh over a
robots-payload table (one row per host — tiny next to the corpus), and
the result broadcasts into the scheduler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UA_RE = r"(?i)^user-agent:\s*(\S+)"
_DIS_RE = r"(?i)^disallow:\s*(\S+)"
_ALLOW_RE = r"(?i)^allow:\s*(\S+)"
_DELAY_RE = r"(?i)^crawl-delay:\s*([0-9]+)"


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, robots_disallow array<string>,
    robots_allow array<string>, crawl_delay_rounds long). Hosts whose
    file yields no ``*``-section directives drop out (callers coalesce
    to the permissive default, exactly like hosts with no robots.txt at
    all)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    marked = lines.select(
        "host",
        "pos",
        F.nullif(F.regexp_extract(F.trim("line"), _UA_RE, 1), F.lit("")).alias("ua"),
        F.nullif(F.regexp_extract(F.trim("line"), _DIS_RE, 1), F.lit("")).alias("dis"),
        F.nullif(F.regexp_extract(F.trim("line"), _ALLOW_RE, 1), F.lit("")).alias(
            "alw"
        ),
        F.nullif(F.regexp_extract(F.trim("line"), _DELAY_RE, 1), F.lit(""))
        .cast("long")
        .alias("delay"),
    )
    w = Window.partitionBy("host").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sect = marked.withColumn("cur_ua", F.last("ua", ignorenulls=True).over(w))
    star = sect.filter(
        (F.col("cur_ua") == "*")
        & (
            F.col("dis").isNotNull()
            | F.col("alw").isNotNull()
            | F.col("delay").isNotNull()
        )
    )
    return star.groupBy("host").agg(
        # collect_list drops nulls (delay-only rows contribute nothing)
        F.sort_array(F.array_distinct(F.collect_list("dis"))).alias(
            "robots_disallow"
        ),
        F.sort_array(F.array_distinct(F.collect_list("alw"))).alias(
            "robots_allow"
        ),
        F.coalesce(F.max("delay"), F.lit(0)).cast("long").alias(
            "crawl_delay_rounds"
        ),
    )


def politeness_from_robots(
    robots: DataFrame,
    default_budget: int | None = None,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Raw robots payloads → the politeness config table the crawl
    engine broadcasts (host, max_fetches_per_round, robots_disallow,
    robots_allow, crawl_delay_rounds). ``default_budget=None`` leaves
    the budget NULL so the scheduler applies its own default."""
    rules = parse_robots(robots, host_col, text_col)
    return rules.select(
        "host",
        F.lit(default_budget).cast("int").alias("max_fetches_per_round"),
        "robots_disallow",
        "robots_allow",
        F.col("crawl_delay_rounds").cast("int"),
    )


_SITEMAP_RE = r"(?i)^sitemap:\s*(\S+)"


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) → (host, sitemap_url): the ``Sitemap:``
    directives. Per RFC 9309 these are GLOBAL — valid anywhere in the
    file, independent of User-agent grouping — so no section window is
    needed: one posexplode + regexp, distinct per host. Feeds the
    sitemap seed-discovery path (driver_queries.sitemap_parse parses
    the files these point at)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    )
    return (
        lines.select(
            "host",
            F.nullif(
                F.regexp_extract(F.trim("line"), _SITEMAP_RE, 1), F.lit("")
            ).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url").isNotNull())
        .distinct()
    )
