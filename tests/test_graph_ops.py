"""pagerank_dup_graph pins: the sf0.01 oracle covers the LSH graph
(mostly small cliques — few distinct rank values), so these drive the
iteration loop over crafted IRREGULAR graphs whose exact integer ranks
a pure-Python mirror computes independently."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.dataset_queries import _pagerank_over_pairs

SCALE = 10**12
TELEPORT = 150_000_000_000


def _ref_pagerank(pairs: list[tuple[int, int]], iters: int = 5) -> dict[int, int]:
    nodes = sorted({x for e in pairs for x in e})
    outdeg: dict[int, int] = {}
    for a, _ in pairs:
        outdeg[a] = outdeg.get(a, 0) + 1
    pr = {n: SCALE for n in nodes}
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for a, b in pairs:
            contrib[b] += pr[a] // outdeg[a]
        pr = {n: TELEPORT + (85 * contrib[n]) // 100 for n in nodes}
    return pr


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (3, 4)],  # chain: rank grows down the chain
        [(1, 2), (1, 3), (1, 4), (2, 3)],  # star + chord: irregular degrees
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5)],  # diamond-ish DAG
    ],
)
def test_pagerank_matches_integer_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: r.pr for r in _pagerank_over_pairs(df).collect()}
    assert got == _ref_pagerank(pairs)
    # sanity: irregular graphs must actually discriminate
    assert len(set(got.values())) > 1


def test_pagerank_source_sits_at_teleport_floor(spark):
    """A node with no in-edges ends at exactly the teleport constant
    (the LEFT-join dangling path), and must still be present."""
    df = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = {r.doc_id: r.pr for r in _pagerank_over_pairs(df).collect()}
    assert got[1] == TELEPORT
    assert set(got) == {1, 2, 3}


def test_hits_star_graph_exact(spark):
    """Star hub->3 leaves: the hub is the unique hub (score 10^6, leaves
    0) and the leaves are the equal authorities (10^6 each, hub 0) —
    the integer L-infinity renormalization keeps equal scores EXACTLY
    equal through both iterations."""
    from isidorus_web_scraper_spark.dataset_queries import _hits_over_edges

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    got = {
        r.doc_id: (r.authority, r.hub)
        for r in _hits_over_edges(edges, nodes).collect()
    }
    assert got[0] == (0, 1_000_000)
    for leaf in (1, 2, 3):
        assert got[leaf] == (1_000_000, 0)


def test_hits_chain_decays(spark):
    """Chain 0->1->2: node 1 is both hub and authority; the terminal
    node 2's authority reflects 1's hub score, node 0 has authority 0
    (nothing points at it)."""
    from isidorus_web_scraper_spark.dataset_queries import _hits_over_edges

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    got = {
        r.doc_id: (r.authority, r.hub)
        for r in _hits_over_edges(edges, nodes).collect()
    }
    assert got[0][0] == 0          # no in-edges
    assert got[2][1] == 0          # no out-edges
    assert got[1][0] == got[1][1]  # symmetric position in the chain
    assert max(v[0] for v in got.values()) == 1_000_000
    assert max(v[1] for v in got.values()) == 1_000_000


def test_triangle_counts_k4_and_square(spark):
    """K4: every node sits in C(3,2)=3 triangles; a 4-cycle without
    diagonals has none; duplicate/reversed raw edges collapse."""
    from isidorus_web_scraper_spark.dataset_queries import _triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]  # both dirs
    got = {
        r.doc_id: r.n_triangles
        for r in _triangle_counts(
            spark.createDataFrame(k4, "a long, b long")
        ).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    square = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert (
        _triangle_counts(spark.createDataFrame(square, "a long, b long")).count()
        == 0
    )
    # one diagonal -> two triangles sharing it: 0-1-2 and 0-2-3
    got2 = {
        r.doc_id: r.n_triangles
        for r in _triangle_counts(
            spark.createDataFrame(square + [(0, 2)], "a long, b long")
        ).collect()
    }
    assert got2 == {0: 2, 2: 2, 1: 1, 3: 1}
