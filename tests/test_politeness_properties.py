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
