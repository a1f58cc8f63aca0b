#!/usr/bin/env python
"""Seen-sketch store A/B: driver-resident vs warehouse-persisted.

VERDICT r4 item 1 delivered the warehouse-persisted sketch
(`sketch_store='warehouse'`) with flat driver RSS
(BENCH/r5_sketch_rss.json); this measures its THROUGHPUT cost on the
headline generator crawl, interleaved in one session (D W D W ...),
medians reported, per-run pre+post host controls stamped by bench.py.

The expected shape: warehouse mode adds one distributed delta-build +
table append per round and feeds the flag apply from the table instead
of a driver broadcast — O(touched buckets) extra I/O per round, no
extra shuffle (the delta build reuses the claim aggregation's hash
partitioning). The A/B tells us what that costs at bench scale so the
driver default stays honest.

Usage: python bench/sketch_ab.py [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaling  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=8192)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    results: dict[str, list[float]] = {"driver": [], "warehouse": []}
    for trial in range(args.trials):
        for store in ("driver", "warehouse"):
            env = {
                "SPARK_GRAFT_CRAWL_ONLY": "1",
                "SPARK_GRAFT_SKETCH_STORE": store,
                "SPARK_GRAFT_SKETCH_BUCKETS": str(args.buckets),
            }
            r = scaling.run_once(args.cpus, args.seeds, env)
            thr = r["extra"]["crawl_urls_per_sec"]
            hh = r.get("host_health", {})
            results[store].append(thr)
            print(
                f"trial {trial} {store}: {thr} urls/s "
                f"({r['extra']['crawl_urls_fetched']} urls, "
                f"{r['queries']['crawl']}s, "
                f"host {hh.get('pre', hh).get('purepy_8p_pages_per_sec')}"
                f"/{hh.get('post', {}).get('purepy_8p_pages_per_sec')} p/s "
                f"healthy={hh.get('healthy')})",
                flush=True,
            )
    summary = {
        "metric": "crawl urls/s by sketch_store (interleaved medians)",
        "trials": args.trials,
        "seeds": args.seeds,
        "cpus": args.cpus,
        "buckets": args.buckets,
        "driver": results["driver"],
        "warehouse": results["warehouse"],
        "median_driver": statistics.median(results["driver"]),
        "median_warehouse": statistics.median(results["warehouse"]),
        "warehouse_over_driver": round(
            statistics.median(results["warehouse"])
            / statistics.median(results["driver"]),
            3,
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
