"""Property-based scheduler equivalence: for RANDOM frontiers and
politeness configs, all four schedule_round implementations
(vectorized mapInPandas, literal grouped applyInPandas, pure-JVM
window, salted hot-host) must emit identical (url, action) multisets.
The fixed-fixture equivalence tests (test_politeness.py) pin known
shapes; this hunts the shapes nobody thought of — duplicate URLs,
zero budgets, all-blocked hosts, empty configs, delay/round
interactions."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.operators.politeness import schedule_round

HOSTS = [f"h{i}.test" for i in range(5)]

frontier_rows = st.lists(
    st.tuples(
        st.integers(0, 4),      # host index
        st.integers(0, 9),      # path index (duplicates allowed)
        st.integers(0, 3),      # depth
    ),
    min_size=1,
    max_size=40,
)

pol_rows = st.lists(
    st.tuples(
        st.integers(0, 4),                        # host index
        st.integers(0, 3),                        # budget
        st.sets(st.sampled_from(["/p0", "/p1", "/"]), max_size=2),
        st.integers(0, 2),                        # crawl_delay_rounds
    ),
    max_size=5,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frontier=frontier_rows, pol=pol_rows, round_no=st.integers(0, 2))
def test_all_impls_equal_on_random_shapes(spark, frontier, pol, round_no):
    fdf = spark.createDataFrame(
        [
            (1, 1, f"http://{HOSTS[h]}/p{p}.html", d, round_no)
            for (h, p, d) in frontier
        ],
        "scraping_id long, user_id long, url string, depth int, round int",
    )
    pdf = (
        spark.createDataFrame(
            [
                (HOSTS[h], budget, sorted(dis), delay)
                for (h, budget, dis, delay) in pol
            ],
            "host string, max_fetches_per_round int, "
            "robots_disallow array<string>, crawl_delay_rounds int",
        )
        if pol
        else None
    )

    def run(impl, **kw):
        return sorted(
            (r.url, r.action)
            for r in schedule_round(
                fdf, pdf, round_no, 2, impl=impl, **kw
            )
            .select("url", "action")
            .collect()
        )

    a = run("vectorized")
    assert a == run("grouped")
    assert a == run("window")
    assert a == run("salted", salt_shards=3)


def _py_schedule(frontier, pol, round_no, default_budget):
    """Independent twin of the documented scheduler contract: blocked
    (longest-match disallow) => robots_blocked regardless of budget or
    delay; off-delay-round => whole host defers; else per-host priority
    (depth DESC, url ASC) fetches up to budget, remainder defers."""
    cfg = {HOSTS[h]: (b, sorted(dis), delay) for (h, b, dis, delay) in pol}
    by_host: dict[str, list[tuple[str, int]]] = {}
    for h, p, d in frontier:
        by_host.setdefault(HOSTS[h], []).append(
            (f"http://{HOSTS[h]}/p{p}.html", d)
        )
    out = []
    for host, items in by_host.items():
        budget, dis, delay = cfg.get(host, (default_budget, [], 0))
        delay_ok = round_no % (delay + 1) == 0
        nonblocked = []
        for url, depth in items:
            path = "/" + url.split("//", 1)[1].split("/", 1)[1]
            blocked = (
                max((len(r) for r in dis if path.startswith(r)), default=-1)
                > -1  # no allow rules in this strategy; any match blocks
            )
            if blocked:
                out.append((url, "robots_blocked"))
            else:
                nonblocked.append((url, depth))
        nonblocked.sort(key=lambda t: (-t[1], t[0]))
        for rank, (url, _depth) in enumerate(nonblocked):
            out.append(
                (url, "fetch" if delay_ok and rank < budget else "defer")
            )
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(frontier=frontier_rows, pol=pol_rows, round_no=st.integers(0, 2))
def test_scheduler_equals_python_twin(spark, frontier, pol, round_no):
    # mutual equivalence (above) can't catch a bug shared by all four
    # impls; this pins the SEMANTICS against an independent rendition
    fdf = spark.createDataFrame(
        [
            (1, 1, f"http://{HOSTS[h]}/p{p}.html", d, round_no)
            for (h, p, d) in frontier
        ],
        "scraping_id long, user_id long, url string, depth int, round int",
    )
    pdf = (
        spark.createDataFrame(
            [
                (HOSTS[h], budget, sorted(dis), delay)
                for (h, budget, dis, delay) in pol
            ],
            "host string, max_fetches_per_round int, "
            "robots_disallow array<string>, crawl_delay_rounds int",
        )
        if pol
        else None
    )
    got = sorted(
        (r.url, r.action)
        for r in schedule_round(fdf, pdf, round_no, 2, impl="vectorized")
        .select("url", "action")
        .collect()
    )
    assert got == _py_schedule(frontier, pol, round_no, 2)
