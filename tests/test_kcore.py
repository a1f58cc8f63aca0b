"""Brute-force pin for _kcore_peel: seeded random graphs plus crafted
structures (a clique that must survive, a chain that must fully peel,
an isolated node) resolved by the Spark loop must match an independent
pure-Python peeler — including the exact removal ROUND of every node,
not just final core membership.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.dataset_queries import _kcore_peel


def _python_peel(nodes, pairs, k, max_rounds):
    adj = {v: set() for v in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(nodes)
    removed_at = {}
    for r in range(1, max_rounds + 1):
        rm = {v for v in alive if sum(1 for u in adj[v] if u in alive) < k}
        if not rm:
            break
        for v in rm:
            removed_at[v] = r
        alive -= rm
    return {v: removed_at.get(v) for v in nodes}


def _spark_peel(spark, nodes, pairs, k, max_rounds):
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    ).distinct()
    node_df = spark.createDataFrame([(v,) for v in nodes], "doc_id long")
    out = _kcore_peel(edges, node_df, k=k, max_rounds=max_rounds)
    rows = out.collect()
    assert all(r.in_core == (r.removed_round is None) for r in rows)
    return {r.doc_id: r.removed_round for r in rows}


def test_crafted_graph_exact_rounds(spark):
    # 6-clique (3-core survivors) + a 10-chain hanging off it (peels
    # inward one node per round from the free end) + an isolated node
    nodes = list(range(17))
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    pairs += [(5 + i, 6 + i) for i in range(10)]  # chain 5-6-...-15
    want = _python_peel(nodes, pairs, 3, 12)
    got = _spark_peel(spark, nodes, pairs, 3, 12)
    assert got == want
    assert all(got[v] is None for v in range(5))  # clique core survives
    assert got[16] == 1  # isolated node drops immediately
    assert got[15] == 1 and got[6] is not None  # chain peels


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(20260818)
    for trial, (n, m, k) in enumerate([(60, 110, 3), (80, 200, 4)]):
        nodes = list(range(n))
        pairs = set()
        while len(pairs) < m:
            a, b = rng.randrange(n), rng.randrange(n)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        want = _python_peel(nodes, sorted(pairs), k, 15)
        got = _spark_peel(spark, nodes, sorted(pairs), k, 15)
        assert got == want, f"trial {trial}"


def test_round_cap_truncates_identically(spark):
    # a 7-chain at k=2 needs 3 peel rounds; cap at 2 leaves the middle
    # node alive in BOTH implementations (bounded-peel contract)
    nodes = list(range(7))
    pairs = [(i, i + 1) for i in range(6)]
    want = _python_peel(nodes, pairs, 2, 2)
    got = _spark_peel(spark, nodes, pairs, 2, 2)
    assert got == want
    assert got[3] is None  # survived only because of the cap
