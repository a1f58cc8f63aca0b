#!/usr/bin/env python
"""Driver-RSS evidence for the warehouse-persisted seen-sketch
(VERDICT r4 item 1): the point of ``sketch_store='warehouse'`` is that
the driver never materializes a shard, so driver memory no longer
scales with ``bloom_expected_urls``.

Protocol: run the SAME tiny crawl (a handful of URLs — sketch memory is
governed by the filter's sizing, not by row count) twice per expected-
size point, once with ``sketch_store='driver'`` and once with
``'warehouse'``, in a FRESH subprocess each (so RSS attribution is
clean), and record the driver process's peak RSS (ru_maxrss) plus the
on-disk size of the ``seen_sketch`` table. Expectation: driver-mode RSS
grows with the configured sketch size (all B shards resident +
the per-round OR), warehouse-mode RSS stays flat and the bytes show up
on disk instead — at 10^10 URLs (≈25 GB of shards) that difference is
the driver's life.

Usage: python bench/sketch_rss.py [--expected 2**24 2**26 ...]
Writes one JSON line per (mode, expected) to stdout and a summary
object at the end; paste the summary into BENCH/BASELINE.md §17.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, resource, shutil, sys, tempfile
sys.path.insert(0, "@@REPO@@")
from pyspark.sql import SparkSession

mode, expected = sys.argv[1], int(sys.argv[2])
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "6g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from isidorus_web_scraper_spark.corpus import generate_documents
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

root = tempfile.mkdtemp(prefix="iws-rss-")
docs = generate_documents(spark, n_hosts=4).persist()
docs.count()
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
eng = CrawlEngine(
    spark,
    root,
    documents=docs,
    config=CrawlConfig(
        bloom_expected_urls=expected,
        bloom_buckets=64,
        default_budget=1_000_000_000,
        summarizer_enabled=False,
        sketch_store=mode,
    ),
)
eng.start([(1, 1, "http://h0.test/p0.html", 2)])
eng.run()
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
sketch_dir = os.path.join(root, "seen_sketch")
disk = 0
for dp, _dn, fns in os.walk(sketch_dir):
    disk += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
print(
    "CHILD_RESULT "
    + json.dumps(
        {
            "mode": mode,
            "expected_urls": expected,
            "driver_peak_rss_mb": round(peak / 1024, 1),
            "rss_after_baseline_mb": round((peak - base) / 1024, 1),
            "sketch_disk_mb": round(disk / 2**20, 1),
        }
    )
)
shutil.rmtree(root, ignore_errors=True)
spark.stop()
"""


def run_child(mode: str, expected: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.replace("@@REPO@@", REPO), mode, str(expected)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT ") :])
    raise RuntimeError(f"child failed ({mode}, {expected}):\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--expected",
        nargs="+",
        type=lambda s: int(eval(s, {"__builtins__": {}})),  # allows 2**26
        default=[2**22, 2**24, 2**26],
    )
    args = ap.parse_args()
    rows = []
    for expected in args.expected:
        for mode in ("driver", "warehouse"):
            r = run_child(mode, expected)
            rows.append(r)
            print(json.dumps(r), flush=True)
    by = {(r["mode"], r["expected_urls"]): r for r in rows}
    summary = {
        "metric": "driver peak RSS (MB) by sketch_store at growing bloom_expected_urls",
        "points": [
            {
                "expected_urls": e,
                "driver_mode_rss_mb": by[("driver", e)]["driver_peak_rss_mb"],
                "warehouse_mode_rss_mb": by[("warehouse", e)]["driver_peak_rss_mb"],
                "warehouse_sketch_disk_mb": by[("warehouse", e)]["sketch_disk_mb"],
            }
            for e in args.expected
        ],
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
