"""Brute-force pin for _resolve_redirect_chains (pointer doubling):
a seeded random function graph resolved by the Spark plan must match
an independent pure-Python hop-by-hop walk, including loops, long
chains at the hop cap, and self-loops.
"""

from __future__ import annotations

import random

from isidorus_web_scraper_spark.dataset_queries import (
    _resolve_redirect_chains,
)


def _python_resolve(edges: dict[int, int], max_hops: int):
    out = {}
    srcs = set(edges)
    for s in srcs:
        cur, hops = edges[s], 1
        while cur in srcs and hops <= max_hops:
            cur = edges[cur]
            hops += 1
        if cur in srcs or hops > max_hops:  # capped mid-chain or loop
            out[s] = (None, None, False)
        else:
            out[s] = (cur, hops, True)
    return out


def test_pointer_doubling_matches_bruteforce_walk(spark):
    rng = random.Random(20260818)
    edges = {}
    # random function graph over 0..399: chains, merges, cycles
    for s in range(0, 400, 1):
        if s % 7 == 0:
            continue  # holes = terminal nodes
        edges[s] = rng.randrange(400)
    edges[11] = 11  # explicit self-loop
    # explicit long chain 300->301->...->312 (crosses the hop cap)
    for i in range(300, 312):
        edges[i] = i + 1
    edges.pop(312, None)

    for max_hops in (3, 8):
        want = _python_resolve(edges, max_hops)
        df = spark.createDataFrame(
            [(s, d) for s, d in edges.items()], "src long, dst long"
        )
        got = {
            r.src_id: (r.final_id, r.hops, r.resolved)
            for r in _resolve_redirect_chains(df, max_hops=max_hops).collect()
        }
        assert set(got) == set(want)
        assert got == want, {
            k: (got[k], want[k]) for k in want if got[k] != want[k]
        }
