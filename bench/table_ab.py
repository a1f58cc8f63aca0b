#!/usr/bin/env python
"""Table-backed corpus scheduler A/B (round-4 verdict item 3).

The 100-TB input shape is a materialized documents table
(`BASELINE.json input_hint`); its crawl round is: politeness schedule →
partition-pruned broadcast fetch-join → columnar parse. The A/B
compares the scheduler arms on that path, interleaved in one session:

- ``window``  — pure-JVM window function (zero Python stages in the
  whole round; staged-path default since round 4);
- ``vectorized`` — the mapInPandas carried-counter scheduler (one Arrow
  round-trip per round).

Uses bench.py MODE=table (bucket-partitioned raw-HTML store, generated
once into /tmp and reused across trials). Crawl-only; per-run
host_health stamped by bench.py.

Usage: python bench/table_ab.py [--trials 4]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

sys.path.insert(0, "/root/repo/bench")
import scaling  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=8192)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    results: dict[str, list[float]] = {"window": [], "vectorized": []}
    for trial in range(args.trials):
        for impl in ("window", "vectorized"):
            env = {
                "SPARK_GRAFT_CRAWL_MODE": "table",
                "SPARK_GRAFT_POLITENESS_IMPL": impl,
                "SPARK_GRAFT_CRAWL_ONLY": "1",
            }
            r = scaling.run_once(args.cpus, args.seeds, env)
            thr = r["extra"]["crawl_urls_per_sec"]
            hh = r.get("host_health", {})
            results[impl].append(thr)
            print(
                f"trial {trial} {impl}: {thr} urls/s "
                f"({r['extra']['crawl_urls_fetched']} urls, "
                f"{r['queries']['crawl']}s, "
                f"host {hh.get('pre', hh).get('purepy_8p_pages_per_sec')}"
                f"/{hh.get('post', {}).get('purepy_8p_pages_per_sec')} p/s "
                f"healthy={hh.get('healthy')})",
                flush=True,
            )
    summary = {
        impl: {"median": statistics.median(v), "trials": v}
        for impl, v in results.items()
    }
    summary["window_over_vectorized"] = round(
        summary["window"]["median"] / summary["vectorized"]["median"], 3
    )
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
