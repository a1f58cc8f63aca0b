"""Property-based connected-components parity: the pointer-jumping
min-label propagation (dataset_queries._connected_components) must
assign every node of a RANDOM undirected graph the min doc_id of its
true component (and keep=1 exactly on that canonical node), checked
against an independent union-find. The fixed tests pin a deep chain's
plan shape; this searches arbitrary topologies — multi-component
forests, cycles, stars, bridges."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.dataset_queries import _connected_components

_edge = (
    st.tuples(st.integers(0, 15), st.integers(0, 15))
    .filter(lambda e: e[0] != e[1])
    .map(lambda e: (min(e), max(e)))
)


def _union_find_min_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for members in comp.values():
        lo = min(members)
        for n in members:
            out[n] = lo
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(_edge, min_size=1, max_size=25))
def test_cc_labels_equal_union_find_on_random_graphs(spark, edges):
    pairs = spark.createDataFrame(
        sorted(set(edges)), "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in _connected_components(pairs).collect()
    }
    want_lbl = _union_find_min_labels(edges)
    want = {n: (lo, 1 if n == lo else 0) for n, lo in want_lbl.items()}
    assert got == want
