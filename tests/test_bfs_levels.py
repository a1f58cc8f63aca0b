"""Brute-force pin for _bfs_levels: seeded random graphs plus crafted
shapes (chain, disconnected component, multi-seed tie) must match an
independent pure-Python BFS — exact hop level per node, NULL beyond
the level cap or for unreachable nodes.
"""

from __future__ import annotations

import random
from collections import deque

from isidorus_web_scraper_spark.dataset_queries import _bfs_levels


def _python_bfs(nodes, pairs, seeds, max_levels):
    adj = {v: set() for v in nodes}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        v = q.popleft()
        if dist[v] >= max_levels:
            continue
        for u in adj[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    return {v: dist.get(v) for v in nodes}


def _spark_bfs(spark, nodes, pairs, seeds, max_levels):
    edges = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "a long, b long"
    ).distinct()
    node_df = spark.createDataFrame([(v,) for v in nodes], "doc_id long")
    seed_df = spark.createDataFrame([(v,) for v in seeds], "doc_id long")
    out = _bfs_levels(edges, node_df, seed_df, max_levels=max_levels)
    rows = out.collect()
    assert all(r.reached == (r.level is not None) for r in rows)
    return {r.doc_id: r.level for r in rows}


def test_crafted_levels(spark):
    # chain 0-1-...-9 seeded at 0 and 9 (tie meets in the middle),
    # plus a disconnected pair {20, 21}
    nodes = list(range(10)) + [20, 21]
    pairs = [(i, i + 1) for i in range(9)] + [(20, 21)]
    want = _python_bfs(nodes, pairs, [0, 9], 6)
    got = _spark_bfs(spark, nodes, pairs, [0, 9], 6)
    assert got == want
    assert got[4] == 4 and got[5] == 4  # meet-in-the-middle
    assert got[20] is None and got[21] is None  # unreachable


def test_level_cap_truncates_identically(spark):
    nodes = list(range(8))
    pairs = [(i, i + 1) for i in range(7)]
    want = _python_bfs(nodes, pairs, [0], 3)
    got = _spark_bfs(spark, nodes, pairs, [0], 3)
    assert got == want
    assert got[3] == 3 and got[4] is None  # cut exactly at the cap


def test_random_graph_matches_bruteforce(spark):
    rng = random.Random(20260818)
    n = 70
    nodes = list(range(n))
    pairs = set()
    while len(pairs) < 120:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    seeds = [0, 1]
    want = _python_bfs(nodes, sorted(pairs), seeds, 8)
    got = _spark_bfs(spark, nodes, sorted(pairs), seeds, 8)
    assert got == want
