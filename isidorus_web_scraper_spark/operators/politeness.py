"""Per-host politeness: robots rules, crawl-delay, fetch budget.

The reference has ZERO politeness — a bare ``http.Get`` with no
robots.txt, no rate limit, no timeout
(`workers/scraper/repositories/page_fetcher.go:14-20`). The north_rule
mandates it, so this is an addition: a per-host priority queue enforced
inside ``groupBy(host).applyInPandas``, with robots rules broadcast as
a small config table.

Semantics per round:
- robots: RFC 9309 §2.2.2 longest-match precedence over the host's
  Allow/Disallow prefixes (``robots_blocked_col``) — the most specific
  matching rule decides, Allow wins equal-length ties; a blocked URL is
  dropped (action='robots_blocked') — it was already claimed into
  the seen set at discovery (matching the reference where SAdd precedes
  enqueue), so it is never re-attempted;
- crawl-delay: a host with ``crawl_delay_rounds=d`` fetches only on
  rounds where ``round % (d+1) == 0``; off-rounds defer the whole host;
- budget: at most ``max_fetches_per_round`` URLs per host per round,
  priority = (depth DESC, url ASC) — deeper remaining budget means
  discovered earlier (BFS), so first-discovered wins ties
  deterministically; the remainder is deferred to the next round's
  frontier *without re-claiming* (SURVEY.md §7 hard-parts).
- optional importance priority: a frontier that carries a ``priority``
  column (long, higher = sooner; the engine derives it from link
  indegree when ``CrawlConfig.frontier_priority='indegree'`` — the
  OPIC-lite rule real crawlers schedule by) injects it BETWEEN depth
  and url: order = (depth DESC, priority DESC, url ASC). Every impl
  consumes it through the same ``_priority_keys`` helper, so the
  four schedulers stay equivalence-comparable with or without it.

Deferral keeps the URL's remaining ``depth`` unchanged — politeness
delays the fetch, it does not consume crawl depth.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.url import host_col, path_col

DEFAULT_BUDGET = 8  # FIXTURES.md §4 default

ACTION_FETCH = "fetch"
ACTION_DEFER = "defer"
ACTION_ROBOTS = "robots_blocked"


def _priority_keys(cols) -> list:
    """The per-host queue order, shared by all scheduler impls:
    (depth DESC[, priority DESC], url ASC). The optional ``priority``
    column slots between BFS depth and the deterministic url
    tie-break so importance reorders only WITHIN a depth level —
    BFS semantics (and the first-wins claim) are untouched."""
    keys = [F.desc("depth")]
    if "priority" in cols:
        keys.append(F.desc("priority"))
    keys.append(F.asc("url"))
    return keys


def robots_blocked_col(path, disallow, allow):
    """RFC 9309 §2.2.2 longest-match precedence as ONE pure-JVM
    expression: the most specific (longest) matching rule decides;
    Allow wins equal-length ties; no matching rule ⇒ not blocked.
    NULL path (malformed URL) matches nothing ⇒ not blocked, matching
    the legacy fillna(False) semantics. This is THE block decision —
    every scheduler impl and the allocation eligibility share it."""

    def longest(rules):
        return F.coalesce(
            F.array_max(
                F.transform(
                    F.filter(
                        F.coalesce(rules, F.array()),
                        lambda p: path.startswith(p),
                    ),
                    F.length,
                )
            ),
            F.lit(-1),
        )

    return longest(disallow) > longest(allow)


def schedule_round(
    frontier: DataFrame,
    politeness: DataFrame | None,
    round_no: int,
    default_budget: int = DEFAULT_BUDGET,
    impl: str = "vectorized",
    page_fn=None,
    n_parts: int | None = None,
    salt_shards: int = 16,
) -> DataFrame:
    """Tag each frontier row with action ∈ {fetch, defer, robots_blocked}.

    ``politeness`` is the small per-host config table (broadcast); hosts
    absent from it get the permissive default (budget=default, no
    robots, no delay) — the reference-parity configuration.

    Three implementations with identical semantics (equivalence-tested):
    - ``vectorized`` (staged default — won the interleaved table-corpus
      A/B 4/4 trials, BENCH §16): repartition+sort by host, then ONE
      ``mapInPandas`` pass per partition with per-host counts carried
      across Arrow batches. One Python call per ~10k-row batch. Required
      (and forced) for ``page_fn`` fusion — the fetch call needs a
      Python stage anyway.
    - ``window``: the priority queue as a pure-JVM window function —
      eligible-rank = running count of non-blocked rows per host in
      ``_priority_keys`` order ((depth DESC[, priority DESC], url)),
      fetch iff rank < budget ∧ delay-round.
      ZERO Python anywhere in the round for table-backed corpora: pick
      it when Python workers are unavailable or Arrow memory is the
      binding constraint (measured ~22% slower than vectorized at
      local[32] — the sort+WindowExec costs more than the Arrow
      round-trip saves at that shape).
    - ``grouped``: the literal ``groupBy(host).applyInPandas`` priority
      queue. Same answer, but per-group pandas overhead makes it ~10×
      slower when rounds span thousands of hosts — kept as the
      executable spec of the per-host queue semantics.
    - ``salted``: the hot-host-proof variant (north_rule: "salted
      repartitioning to break hot-host skew"). Every other impl ships a
      host's ENTIRE frontier slice into one partition (window sort /
      pandas group) — at 10^10 URLs a zipf-head host is a 10^8-row
      straggler task just to tag defers. Salted runs an exact two-stage
      top-k, all JVM: stage 1 ranks eligible rows within ``(host,
      salt=xxhash64(url)%S)`` shards — a row outside its shard's
      top-``budget`` can never be in the host's top-``budget``, so at
      most ``budget·S`` candidates per host survive; stage 2 re-ranks
      only those few per host. Max partition slice drops from
      max-host-size to max-host-size/S (stage 1) + budget·S (stage 2).
      The two union branches (candidates, the rest) share the one
      ``(host, salt)`` shuffle via ReuseExchange; the extra cost is one
      local re-sort. Equivalence with ``window`` is pytest-pinned and
      oracle-pinned (politeness_schedule_salted).

    ``page_fn`` (vectorized impl only): a BATCH fetch+parse function
    (``pd.Series[url] -> pd.Series[spans]``, null = 404) FUSED into the
    same pandas pass — rows tagged
    fetch are resolved in place and the output gains a ``spans`` column
    (null for defer/robots/missing). This removes one shuffle and two
    Arrow round-trips from the crawl round's critical path (the BENCH §9
    residual): schedule → repartition → resolve-mapInPandas →
    parse-pandas-UDF collapses into one host-partitioned stream. The
    per-host budget bounds how many rows per host pay the heavy fetch,
    so the host-hash layout's skew exposure is budget-capped; deferred
    rows pass through at columnar cost. ``n_parts`` widens the host
    shuffle to the fetch stage's target parallelism (the fused stage IS
    the fetch stage)."""
    # null hosts (malformed-but-http-prefixed hrefs) get a sentinel:
    # pandas groupby drops null keys, which would defer such URLs
    # FOREVER (livelock); with the sentinel they take the default
    # budget, fetch once, and die on the 404 path like the reference's
    # http.Get error (page_fetcher.go:14-20).
    f = frontier.withColumn(
        "host", F.coalesce(host_col("url"), F.lit("\x00invalid"))
    ).withColumn("path", path_col("url"))
    if politeness is not None:
        f = f.join(F.broadcast(politeness), "host", "left")
    else:
        f = (
            f.withColumn("max_fetches_per_round", F.lit(None).cast("int"))
            .withColumn("robots_disallow", F.lit(None).cast("array<string>"))
            .withColumn("crawl_delay_rounds", F.lit(None).cast("int"))
        )
    if "robots_allow" not in f.columns:
        # disallow-only configs (static tables, legacy callers) predate
        # the Allow column; absent ⇒ no allow rules
        f = f.withColumn("robots_allow", F.lit(None).cast("array<string>"))
    f = (
        f.withColumn(
            "budget", F.coalesce("max_fetches_per_round", F.lit(default_budget))
        )
        .withColumn("delay", F.coalesce("crawl_delay_rounds", F.lit(0)))
        .withColumn(
            "blocked",
            # RFC 9309 longest-match Allow/Disallow precedence — the one
            # block decision every impl below consumes
            robots_blocked_col(
                F.col("path"), F.col("robots_disallow"), F.col("robots_allow")
            ),
        )
    )

    # round comes from the frontier rows, not a plan literal — keeps the
    # generated stage code identical across rounds (codegen cache hit)
    f = f.withColumn(
        "delay_ok", F.col("round") % (F.col("delay") + 1) == 0
    )

    out_schema = (
        "scraping_id long, user_id long, url string, depth int, round int, "
        "host string, action string"
    )
    if page_fn is not None:
        if impl != "vectorized":
            raise ValueError("page_fn fusion requires the vectorized impl")
        from ..schema import SPAN
        from pyspark.sql import types as T

        out_schema = T.StructType(
            [
                T.StructField("scraping_id", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("url", T.StringType()),
                T.StructField("depth", T.IntegerType()),
                T.StructField("round", T.IntegerType()),
                T.StructField("host", T.StringType()),
                T.StructField("action", T.StringType()),
                T.StructField("spans", T.ArrayType(SPAN), True),
            ]
        )

    if impl == "window":
        if page_fn is not None:
            raise ValueError("page_fn fusion requires the vectorized impl")
        from pyspark.sql import Window as W

        # eligible-rank: how many non-blocked rows precede this one in
        # the host's priority order. ROWS-framed running sum == the
        # carried counter in the vectorized impl; the shuffle is the
        # same host hash-partitioning, but the decision compiles into
        # whole-stage codegen — no Python, no Arrow.
        w = (
            W.partitionBy("host")
            .orderBy(*_priority_keys(f.columns))
            .rowsBetween(W.unboundedPreceding, -1)
        )
        rank = F.coalesce(
            F.sum((~F.col("blocked")).cast("long")).over(w), F.lit(0)
        )
        action = (
            F.when(F.col("blocked"), F.lit(ACTION_ROBOTS))
            .when(
                F.col("delay_ok") & (rank < F.col("budget")),
                F.lit(ACTION_FETCH),
            )
            .otherwise(F.lit(ACTION_DEFER))
        )
        return f.select(
            "scraping_id",
            "user_id",
            "url",
            "depth",
            "round",
            "host",
            action.alias("action"),
        )

    if impl == "salted":
        if page_fn is not None:
            raise ValueError("page_fn fusion requires the vectorized impl")
        from pyspark.sql import Window as W

        # stage 1: eligible-rank WITHIN a (host, salt) shard. Sound
        # pruning: the eligible rows preceding row r in r's shard are a
        # subset of those preceding it host-globally, so shard_rank <=
        # global rank — any row with global eligible-rank < budget has
        # shard_rank < budget and survives. Candidacy deliberately does
        # NOT test delay_ok: the window impl's rank counts EVERY
        # non-blocked preceding row (delayed or not), so delayed rows
        # must keep consuming stage-2 rank slots for the fetch sets to
        # match even on frontiers where round (hence delay_ok) varies
        # within a host; delay_ok gates the final action only.
        f2 = f.withColumn(
            "salt", F.pmod(F.xxhash64("url"), F.lit(int(salt_shards)))
        )
        w1 = (
            W.partitionBy("host", "salt")
            .orderBy(*_priority_keys(f.columns))
            .rowsBetween(W.unboundedPreceding, -1)
        )
        s1 = f2.withColumn(
            "shard_rank",
            F.coalesce(
                F.sum((~F.col("blocked")).cast("long")).over(w1), F.lit(0)
            ),
        )
        is_cand = (~F.col("blocked")) & (F.col("shard_rank") < F.col("budget"))
        # stage 2: the host window runs over <= budget*salt_shards rows
        # per host — the first `budget` candidates in _priority_keys
        # order ((depth DESC[, priority DESC], url) — the same total
        # order stage 1 ranked by, which is what makes the two-stage
        # top-k an identity) ARE the host's global top-budget (any
        # candidate ranked before them here also precedes them
        # globally).
        w2 = W.partitionBy("host").orderBy(*_priority_keys(f.columns))
        decided = (
            s1.filter(is_cand)
            .withColumn("rn", F.row_number().over(w2))
            .withColumn(
                "action",
                F.when(
                    F.col("delay_ok") & (F.col("rn") <= F.col("budget")),
                    F.lit(ACTION_FETCH),
                ).otherwise(F.lit(ACTION_DEFER)),
            )
        )
        # the isNotNull() term is a no-op on values (delay_ok is never
        # null) — it exists so this branch REFERENCES delay_ok: with it,
        # both union branches prune to the same column set, their
        # (host, salt) exchanges canonicalize identically, and
        # ReuseExchange ships the round's rows once (plan-pinned).
        others = s1.filter(~is_cand).withColumn(
            "action",
            F.when(
                F.col("blocked") & F.col("delay_ok").isNotNull(),
                F.lit(ACTION_ROBOTS),
            )
            .when(F.col("blocked"), F.lit(ACTION_ROBOTS))
            .otherwise(
                F.lit(ACTION_DEFER)
            ),
        )
        cols = [
            "scraping_id", "user_id", "url", "depth", "round", "host",
            "action",
        ]
        return decided.select(cols).unionByName(others.select(cols))

    if impl == "vectorized":
        if n_parts is None:
            n_parts = int(f.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        pre = f.repartition(n_parts, "host").sortWithinPartitions(
            # queue order: first-discovered first (optionally importance
            # between depth and the url tie-break — _priority_keys)
            "host", *_priority_keys(f.columns)
        )

        def sched(batches):
            import numpy as np

            # O(1) carried state: rows are host-sorted within the
            # partition, so a host's rows are CONTIGUOUS — the only host
            # that can span an Arrow-batch boundary is the previous
            # batch's tail. Carrying (tail_host, tail_count) instead of
            # a per-host dict keeps scheduler memory flat even at
            # 10^7-host rounds (BENCH §6 item 3).
            last_host: str | None = None
            last_count = 0

            for pdf in batches:
                if pdf.empty:
                    continue
                blocked = pdf["blocked"].fillna(False).to_numpy(dtype=bool)
                delay_ok = pdf["delay_ok"].to_numpy(dtype=bool)
                budget = pdf["budget"].to_numpy()
                hosts = pdf["host"].to_numpy()
                elig = pd.Series(~blocked, index=pdf.index)
                # eligible-rank = carry-in (head rows continuing the
                # previous batch's tail host) + eligible rows above this
                # one in priority order within the batch
                cum_elig = (
                    elig.groupby(pdf["host"], sort=False).cumsum().to_numpy()
                    - elig.to_numpy()
                )
                carry = (
                    np.where(hosts == last_host, last_count, 0)
                    if last_host is not None
                    else 0
                )
                rank = carry + cum_elig
                action = np.where(
                    blocked,
                    ACTION_ROBOTS,
                    np.where(
                        delay_ok & (rank < budget), ACTION_FETCH, ACTION_DEFER
                    ),
                )
                tail_host = hosts[-1]
                tail_total = int(elig.to_numpy()[hosts == tail_host].sum())
                last_count = (
                    last_count + tail_total if tail_host == last_host else tail_total
                )
                last_host = tail_host
                out = {
                    "scraping_id": pdf["scraping_id"],
                    "user_id": pdf["user_id"],
                    "url": pdf["url"],
                    "depth": pdf["depth"],
                    "round": pdf["round"],
                    "host": pdf["host"],
                    "action": action,
                }
                if page_fn is not None:
                    # fused fetch+parse: resolve ONLY the fetch rows, in
                    # ONE batch call per Arrow batch (the page_fn contract
                    # is pd.Series[url] -> pd.Series[spans]) — the heavy
                    # work per host is budget-capped, defer/robots rows
                    # cost nothing
                    spans = np.full(len(pdf), None, dtype=object)
                    fetch_idx = np.flatnonzero(action == ACTION_FETCH)
                    if len(fetch_idx):
                        resolved = page_fn(
                            pdf["url"].iloc[fetch_idx].reset_index(drop=True)
                        )
                        spans[fetch_idx] = resolved.to_numpy(dtype=object)
                    out["spans"] = spans
                yield pd.DataFrame(out)

        return pre.mapInPandas(sched, out_schema)

    if page_fn is not None:
        raise ValueError("unreachable: fusion guard above")  # pragma: no cover

    def per_host(pdf: pd.DataFrame) -> pd.DataFrame:
        # priority queue: first-discovered first (depth desc, url asc),
        # importance between them when the frontier carries it
        if "priority" in pdf.columns:
            pdf = pdf.sort_values(
                ["depth", "priority", "url"], ascending=[False, False, True]
            )
        else:
            pdf = pdf.sort_values(["depth", "url"], ascending=[False, True])
        budget = int(pdf["budget"].iloc[0])
        delay = int(pdf["delay"].iloc[0])
        blocked = pdf["blocked"].fillna(False).to_numpy()
        action = pd.Series(ACTION_DEFER, index=pdf.index)
        if int(pdf["round"].iloc[0]) % (delay + 1) == 0:
            eligible = ~blocked
            fetch_idx = pdf.index[eligible][:budget]
            action.loc[fetch_idx] = ACTION_FETCH
        action[blocked] = ACTION_ROBOTS
        return pd.DataFrame(
            {
                "scraping_id": pdf["scraping_id"],
                "user_id": pdf["user_id"],
                "depth": pdf["depth"],
                "round": pdf["round"],
                "url": pdf["url"],
                "host": pdf["host"],
                "action": action,
            }
        )

    return f.groupBy("host").applyInPandas(per_host, out_schema)


def fetch_all_fused(frontier: DataFrame, page_fn) -> DataFrame:
    """Permissive twin of the fused path (no politeness config,
    effectively unbounded budget — reference parity): every row fetches,
    resolved in ONE mapInPandas with NO host shuffle at all (one batch
    page_fn call per Arrow batch). The caller
    picks the partitioning (repartition to the fetch stage's width)."""
    from pyspark.sql import types as T

    from ..schema import SPAN

    out_schema = T.StructType(
        [
            T.StructField("scraping_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("depth", T.IntegerType()),
            T.StructField("round", T.IntegerType()),
            T.StructField("host", T.StringType()),
            T.StructField("action", T.StringType()),
            T.StructField("spans", T.ArrayType(SPAN), True),
        ]
    )

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "scraping_id": pdf["scraping_id"],
                    "user_id": pdf["user_id"],
                    "url": pdf["url"],
                    "depth": pdf["depth"],
                    "round": pdf["round"],
                    "host": None,
                    "action": ACTION_FETCH,
                    "spans": page_fn(pdf["url"]).to_numpy(dtype=object),
                }
            )

    return frontier.mapInPandas(gen, out_schema)


def detect_trap_hosts(
    frontier: DataFrame, min_urls: int = 10, ratio: int = 8
) -> DataFrame:
    """Frontier-poisoning detector: hosts whose distinct-URL count
    dwarfs their distinct path-TEMPLATE count (digit runs collapsed to
    '#') are URL-space explosions — calendars, session ids, faceted
    search. Returns the flagged hosts (one column, ``host``).

    Scale: one distinct + one map-side-combined hash aggregate over the
    frontier; the collapse is a codegen'd regexp_replace. Thresholds
    are tuned for real URL spaces — a synthetic corpus whose every path
    is '/p<N>.html' collapses to one template per host and flags
    everywhere, which is the detector working as specified."""
    f = frontier.select(
        F.coalesce(host_col("url"), F.lit("\x00invalid")).alias("host"),
        F.coalesce(path_col("url"), F.lit("")).alias("path"),
    )
    t = f.withColumn("template", F.regexp_replace("path", "[0-9]+", "#"))
    agg = t.groupBy("host").agg(
        F.count_distinct("path").alias("n_urls"),
        F.count_distinct("template").alias("n_templates"),
    )
    return agg.filter(
        (F.col("n_urls") >= int(min_urls))
        & (F.col("n_urls") >= int(ratio) * F.col("n_templates"))
    ).select("host")


def trap_override(
    frontier: DataFrame,
    politeness: DataFrame | None,
    min_urls: int = 10,
    ratio: int = 8,
) -> DataFrame | None:
    """Compose trap detection into the politeness config: flagged hosts
    get ``robots_disallow=['/']`` with allow rules stripped — their
    rows become robots_blocked (hard-dropped, frontier drains) through
    the existing block machinery rather than deferred forever by a
    zero budget. Non-trap hosts' config passes through untouched; a
    trap host's budget/delay are preserved (moot under the block, but
    the row stays honest if the flag is later lifted)."""
    traps = detect_trap_hosts(frontier, min_urls, ratio)
    return _override_hosts(
        traps,
        politeness,
        {
            "robots_disallow": F.array(F.lit("/")),
            "robots_allow": F.lit(None).cast("array<string>"),
        },
    )


def _override_hosts(
    hosts: DataFrame, politeness: DataFrame | None, overrides: dict
) -> DataFrame:
    """Compose a host-set override into a politeness config — the ONE
    implementation of the pattern trap_override and backoff_override
    share (a drift between two copies would break their unionByName
    only on the path that composes both): listed hosts get the
    ``overrides`` columns replaced (column name → Column; keys absent
    carry the host's configured value through, crawl-delay coalesced
    to 0); unlisted hosts pass untouched; a listed host absent from
    the config gets a fresh permissive row with the overrides
    applied. Extra config columns beyond the standard four (e.g. the
    optional ``domain_budget`` marker) carry through unchanged —
    dropping them here would break the later override in a composed
    chain. Rows FLAGGED ``domain_budget=true`` are domain caps, not
    host configs, and are never overridden: a cooling apex host must
    zero ITS OWN row, not the cap of every subdomain sharing its name
    (review finding, session 8)."""
    defaults = {
        "max_fetches_per_round": F.lit(None).cast("int"),
        "robots_disallow": F.lit(None).cast("array<string>"),
        "robots_allow": F.lit(None).cast("array<string>"),
        "crawl_delay_rounds": F.lit(0),
    }
    if politeness is None:
        return hosts.select(
            "host",
            *[overrides.get(k, v).alias(k) for k, v in defaults.items()],
        )
    pol = politeness
    if "robots_allow" not in pol.columns:
        pol = pol.withColumn("robots_allow", F.lit(None).cast("array<string>"))
    if "domain_budget" in pol.columns:
        is_dom = F.coalesce("domain_budget", F.lit(False))
        dom = pol.filter(is_dom)
        host_side = pol.filter(~is_dom).drop("domain_budget")
        out = _override_hosts(hosts, host_side, overrides)
        # the marker was dropped for the recursive host-side pass
        # (unflagged/NULL rows are all false anyway) — restore it so
        # the union types and the downstream domain/host split stay
        # well-defined
        return out.withColumn("domain_budget", F.lit(False)).unionByName(dom)
    carry = {
        k: (
            F.coalesce("crawl_delay_rounds", F.lit(0))
            if k == "crawl_delay_rounds"
            else F.col(k)
        )
        for k in pol.columns
        if k != "host"
    }
    keep = pol.join(hosts, "host", "left_anti")
    rows = hosts.join(pol, "host", "left").select(
        "host", *[overrides.get(k, v).alias(k) for k, v in carry.items()]
    )
    return keep.unionByName(rows)


def allocate_global_budget(
    frontier: DataFrame, global_budget: int, politeness: DataFrame | None = None
) -> DataFrame:
    """Adaptive per-round politeness: apportion ONE global fetch budget
    across this round's hosts proportional to their frontier queue
    sizes — exact largest-remainder (Hamilton) rule, remainders
    compared as integers ((G·q) mod Q), host-asc tie-break. Returns a
    politeness config frame for ``schedule_round`` (the crawl-wide
    backpressure knob the static per-host budget can't express: total
    fetch rate stays G per round no matter how wide the frontier gets).

    Composition with an existing config: robots_disallow and
    crawl_delay_rounds carry through unchanged; a host with a static
    ``max_fetches_per_round`` gets ``min(static, allocation)`` so the
    global cap never overrides a politeness promise.

    Queue sizes count ELIGIBLE rows only — rows robots-blocked by the
    config, and hosts whose crawl-delay defers this round, never fetch,
    so apportioning budget over them would under-fetch everyone else
    (a 100-blocked-URL host would eat half the budget and waste it).
    Eligibility uses the same blocked/delay expressions as
    ``schedule_round``, so allocation and consumption agree row for row.

    Invariants (pytest-pinned): Σ allocation == G exactly while at
    least one row is eligible, and while G ≤ #eligible every allocation
    ≤ its host's eligible queue size (so the round fetches exactly
    min(G, #eligible) URLs; deferral carries the rest). Quotas are
    exact integers (``div``/``mod`` on longs, never a float) — valid
    while G·q < 2^63, i.e. any realistic budget over a 10^10 frontier.

    Scale: queue sizes are one map-side-combined hash agg over the
    frontier (the politeness config joins in broadcast, as it does in
    schedule_round); everything downstream runs on the HOSTS table
    (distinct hosts ≪ URLs — the robots-gate bound), so the
    remainder-rank window sorts a bounded frame; Q and the leftover
    join in as broadcast one-row aggregates, and the result is itself
    the small broadcast side of schedule_round's config join."""
    from pyspark.sql import Window

    g = F.lit(int(global_budget))
    # host key must be byte-identical to schedule_round's, or the
    # sentinel rows would miss their allocation and fall back to the
    # permissive default
    f = frontier.withColumn(
        "host", F.coalesce(host_col("url"), F.lit("\x00invalid"))
    )
    if politeness is not None:
        f = f.withColumn("path", path_col("url")).join(
            F.broadcast(politeness), "host", "left"
        )
        if "robots_allow" not in f.columns:
            f = f.withColumn("robots_allow", F.lit(None).cast("array<string>"))
        blocked = robots_blocked_col(
            F.col("path"), F.col("robots_disallow"), F.col("robots_allow")
        )
        delay_ok = (
            F.col("round") % (F.coalesce("crawl_delay_rounds", F.lit(0)) + 1)
            == 0
        )
        eligible = (~blocked) & delay_ok
    else:
        eligible = F.lit(True)
    # every frontier host keeps a row (q may be 0): a host whose rows
    # are all blocked/deferred still needs its config carried through,
    # or schedule_round would fall back to the permissive default and
    # fetch the very rows robots forbids
    hosts = f.groupBy("host").agg(F.sum(eligible.cast("long")).alias("q"))
    tot = hosts.agg(F.sum("q").alias("q_total"))
    gq = (g.cast("long") * F.col("q")).alias("gq")
    base = (
        hosts.crossJoin(F.broadcast(tot))
        .select("host", "q_total", gq)
        .select(
            "host",
            # exact long division: floor((G·q)/Q) without a double in
            # the path (q_total=0 ⇒ nothing eligible ⇒ all-zero quota)
            F.when(F.col("q_total") == 0, F.lit(0))
            .otherwise(F.expr("gq div q_total"))
            .alias("base"),
            F.when(F.col("q_total") == 0, F.lit(0))
            .otherwise(F.col("gq") % F.col("q_total"))
            .alias("frac"),
        )
    )
    leftover = base.agg(
        # a zero-eligible round allocates nothing (extra stays 0, not G)
        F.when(F.sum("base") + F.sum("frac") == 0, F.lit(0))
        .otherwise(g - F.sum("base"))
        .alias("extra")
    )
    rk = F.row_number().over(Window.orderBy(F.desc("frac"), F.asc("host")))
    alloc = (
        base.crossJoin(F.broadcast(leftover))
        .withColumn("rk", rk)
        .select(
            "host",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )
    if politeness is None:
        return alloc.select(
            "host",
            F.col("alloc").alias("max_fetches_per_round"),
            F.lit(None).cast("array<string>").alias("robots_disallow"),
            F.lit(None).cast("array<string>").alias("robots_allow"),
            F.lit(0).alias("crawl_delay_rounds"),
        )
    allow_out = (
        F.col("robots_allow")
        if "robots_allow" in politeness.columns
        else F.lit(None).cast("array<string>").alias("robots_allow")
    )
    return (
        alloc.join(politeness, "host", "left")
        .select(
            "host",
            F.when(
                F.col("max_fetches_per_round").isNotNull(),
                F.least("max_fetches_per_round", "alloc"),
            )
            .otherwise(F.col("alloc"))
            .alias("max_fetches_per_round"),
            "robots_disallow",
            allow_out,
            F.coalesce("crawl_delay_rounds", F.lit(0)).alias(
                "crawl_delay_rounds"
            ),
        )
    )


def cooling_hosts(
    fetch_log: DataFrame, threshold: float, min_attempts: int = 4
) -> DataFrame:
    """Hosts in failure cooldown: the share of TRANSIENT (5xx) outcomes
    among a host's fetch attempts in the given (already round-windowed)
    ``fetch_log`` slice reaches ``threshold``, over at least
    ``min_attempts`` attempts — one flaky URL on a small host must not
    trip the breaker. 404s do NOT count: a corpus miss is a property of
    the URL, not of the host's health (the reference drops them
    permanently, page_fetcher.go:14-20), whereas 5xx means the server
    itself is struggling and SHOULD slow the crawler down — the classic
    half-open circuit breaker, and the same transient/permanent split
    the retry ledger already draws (``error = 'transient error'``).

    The rate gate is integer-exact: ``threshold`` is converted to a
    rational NUM/DEN once on the driver and the comparison runs as
    ``errors·DEN ≥ attempts·NUM`` on longs — no float in the
    distributed plan, so the trip decision is bit-stable across
    partitionings.

    Scale: one map-side-combined hash agg over the window's attempts
    (bounded: Σ per-round budgets × window rounds), output is a
    hosts-level frame (≪ URLs) that broadcasts into the scheduler's
    config join like every other politeness source."""
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    if num < 1:
        # a sub-1e-6 threshold collapses to 0/1 and the gate
        # errors·den ≥ attempts·0 trips EVERY host — refuse rather
        # than silently throttling the whole crawl (the engine's
        # config validation enforces ≥ 1e-6 for the same reason)
        raise ValueError(
            f"error-backoff threshold {threshold!r} is below the "
            "1e-6 rational-conversion floor"
        )
    f = fetch_log.withColumn(
        "host", F.coalesce(host_col("url"), F.lit("\x00invalid"))
    )
    agg = f.groupBy("host").agg(
        F.count("*").alias("attempts"),
        F.sum((F.col("status") >= 500).cast("long")).alias("errors"),
    )
    return agg.filter(
        (F.col("attempts") >= F.lit(int(min_attempts)))
        & (F.col("errors") * F.lit(int(den)) >= F.col("attempts") * F.lit(int(num)))
    ).select("host")


def backoff_override(
    cooling: DataFrame, politeness: DataFrame | None
) -> DataFrame:
    """Compose the circuit breaker into the politeness config: cooling
    hosts get ``max_fetches_per_round=0`` — their frontier rows DEFER
    (budget truncation, not a drop) and re-schedule when the cooldown
    expires. Robots rules and crawl-delay carry through unchanged, so a
    robots-blocked row still hard-drops during the cooldown (the
    frontier must drain) and a later-lifted breaker leaves the host's
    config exactly as configured. Non-cooling hosts pass through
    untouched; a cooling host absent from the config gets a fresh row
    (budget 0, permissive otherwise)."""
    return _override_hosts(
        cooling, politeness, {"max_fetches_per_round": F.lit(0)}
    )


def domain_budget_override(
    frontier: DataFrame,
    politeness: DataFrame | None,
    default_budget: int,
    labels: int = 2,
) -> DataFrame:
    """Domain-scoped politeness budgets (W42,
    CrawlConfig.budget_scope='domain'): the per-round fetch budget is
    keyed by REGISTRABLE DOMAIN, not host — a subdomain farm
    (a.spam.test … z.spam.test) shares ONE budget instead of escaping
    the per-host cap with a fresh allowance per vanity subdomain (the
    reason production crawlers queue by pay-level domain — BUbiNG's
    PLD, Heritrix's authority queues).

    Semantics: each domain's budget comes from a config row FLAGGED
    ``domain_budget=true`` whose ``host`` is the domain string
    (``default_budget`` per domain otherwise); the optional boolean
    column makes the split EXPLICIT — without it, any host-keyed row
    whose hostname happens to have exactly ``labels`` labels (an apex
    host's static promise, or a breaker budget-0 row for a cooling
    apex) would be silently reinterpreted as the whole domain's cap
    (review finding, session 8). Unflagged rows are ordinary host
    configs; flagged rows are consumed here and do NOT reach
    ``schedule_round`` as host rows (the apex host, if crawled, is
    just another farm member sharing the allocation). The budget is
    apportioned across the domain's frontier hosts proportional to
    their ELIGIBLE queue sizes by the exact largest-remainder
    (Hamilton) rule — integer quotas, (frac DESC, host ASC) tie-break,
    Σ allocations == the domain budget while any row is eligible. The
    output is an ordinary HOST-keyed config for ``schedule_round``
    (the four scheduler impls are untouched); a host-keyed config row
    still bounds its own host (min(host budget, allocation) — so a
    breaker budget-0 or a static per-host promise survives), and
    robots / crawl-delay carry through host-keyed as RFC 9309 scopes
    them.
    Apportioned-split enforces the politeness invariant that matters —
    at most B fetches per domain per round — while keeping each host's
    queue a single per-host priority queue; the deferred remainder
    carries exactly as under host scope.

    Eligibility reuses schedule_round's own blocked/delay expressions,
    so allocation and consumption agree row for row; a host in breaker
    cooldown still counts eligible (its share defers demand — the same
    documented caveat as allocate_global_budget).

    Scale: one map-side-combined queue rollup over the frontier; all
    windows partition by domain over the HOSTS frame (≪ URLs); domain
    budgets broadcast-join; the result is itself the broadcast side of
    schedule_round's config join."""
    from pyspark.sql import Window

    from ..functions.url import domain_col

    f = frontier.withColumn(
        "host", F.coalesce(host_col("url"), F.lit("\x00invalid"))
    )
    pol = politeness
    dom_rows = None
    if pol is not None:
        if "robots_allow" not in pol.columns:
            pol = pol.withColumn(
                "robots_allow", F.lit(None).cast("array<string>")
            )
        # the explicit domain/host split: only rows FLAGGED
        # domain_budget=true are domain caps; everything else is an
        # ordinary host config (an apex host's own row — a static
        # promise or a breaker zero — must never become the farm cap)
        if "domain_budget" in pol.columns:
            is_dom = F.coalesce("domain_budget", F.lit(False))
            dom_rows = pol.filter(is_dom).drop("domain_budget")
            pol = pol.filter(~is_dom).drop("domain_budget")
        f = f.withColumn("path", path_col("url")).join(
            F.broadcast(pol), "host", "left"
        )
        blocked = robots_blocked_col(
            F.col("path"), F.col("robots_disallow"), F.col("robots_allow")
        )
        delay_ok = (
            F.col("round") % (F.coalesce("crawl_delay_rounds", F.lit(0)) + 1)
            == 0
        )
        eligible = (~blocked) & delay_ok
    else:
        eligible = F.lit(True)
    hosts = f.groupBy("host").agg(F.sum(eligible.cast("long")).alias("q"))
    hosts = hosts.withColumn("domain", domain_col(F.col("host"), labels))
    if dom_rows is not None:
        dbud = dom_rows.select(
            F.col("host").alias("domain"),
            F.col("max_fetches_per_round").alias("dg"),
        )
        hosts = hosts.join(F.broadcast(dbud), "domain", "left")
    else:
        hosts = hosts.withColumn("dg", F.lit(None).cast("int"))
    hosts = hosts.withColumn(
        "g", F.coalesce("dg", F.lit(int(default_budget))).cast("long")
    )
    wd = Window.partitionBy("domain")
    hosts = hosts.withColumn("qd", F.sum("q").over(wd))
    # exact integer Hamilton per domain (the per-group window twin of
    # allocate_global_budget's single-row aggregate form — different
    # plan shape, same arithmetic; both are oracle-gated)
    hosts = hosts.withColumn(
        "base",
        F.when(F.col("qd") == 0, F.lit(0)).otherwise(
            F.expr("(g * q) div qd")
        ),
    ).withColumn(
        "frac",
        F.when(F.col("qd") == 0, F.lit(0)).otherwise(
            (F.col("g") * F.col("q")) % F.col("qd")
        ),
    )
    hosts = hosts.withColumn(
        "extra",
        F.when(F.col("qd") == 0, F.lit(0)).otherwise(
            F.col("g") - F.sum("base").over(wd)
        ),
    ).withColumn(
        "rk",
        F.row_number().over(wd.orderBy(F.desc("frac"), F.asc("host"))),
    )
    alloc = (
        F.col("base") + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
    ).cast("int")
    if pol is None:
        return hosts.select(
            "host",
            alloc.alias("max_fetches_per_round"),
            F.lit(None).cast("array<string>").alias("robots_disallow"),
            F.lit(None).cast("array<string>").alias("robots_allow"),
            F.lit(0).alias("crawl_delay_rounds"),
        )
    allocated = hosts.select("host", alloc.alias("alloc"))
    out = allocated.join(pol, "host", "left").select(
        "host",
        F.when(
            F.col("max_fetches_per_round").isNotNull(),
            F.least("max_fetches_per_round", "alloc"),
        )
        .otherwise(F.col("alloc"))
        .alias("max_fetches_per_round"),
        "robots_disallow",
        "robots_allow",
        F.coalesce("crawl_delay_rounds", F.lit(0)).alias("crawl_delay_rounds"),
    )
    # config rows for hosts outside this round's frontier (incl. the
    # domain-budget rows themselves) pass through untouched — later
    # rounds and robots carriers still need them
    missing = pol.join(allocated.select("host"), "host", "left_anti")
    return out.unionByName(missing)
