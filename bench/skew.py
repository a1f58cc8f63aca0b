#!/usr/bin/env python
"""Hot-host skew stress: per-partition spread with and without salting.

A zipf(1.2) frontier concentrates on the head host; the politeness
scheduler necessarily partitions by host (budget semantics), so the
stage AFTER it inherits a layout where one partition holds the hot
host's entire round. The engine's salted repartition
(``xxhash64(canonical url)``) re-spreads before the expensive
fetch+parse. This script measures both layouts:

- per-partition row counts (max/mean = skew factor) feeding the parse,
- wall time of the fetch+parse stage under each layout,

and prints one JSON line for BENCH/BASELINE.md.

Usage: python bench/skew.py [--rows 120000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from isidorus_web_scraper_spark.corpus import make_html_resolver, page_url, pages_per_host  # noqa: E402
from isidorus_web_scraper_spark.functions.spans import content_col, links_col  # noqa: E402
from isidorus_web_scraper_spark.functions.spark_udfs import parse_html_udf  # noqa: E402
from isidorus_web_scraper_spark.functions.url import url_hash_col  # noqa: E402
from isidorus_web_scraper_spark.operators.politeness import ACTION_FETCH, schedule_round  # noqa: E402
from isidorus_web_scraper_spark.session import get_spark  # noqa: E402

N_HOSTS = 65536
BASE = 65536


def zipf_frontier(spark, rows: int):
    """URLs drawn zipf-ish: host h gets ~pages_per_host(h) of the rows —
    the head host dominates, like real crawl frontiers."""
    urls, h = [], 0
    while len(urls) < rows and h < N_HOSTS:
        take = min(pages_per_host(h, BASE), rows - len(urls))
        urls.extend(page_url(h, p) for p in range(take))
        h += 1
    return spark.createDataFrame(
        [(i, 1, u, 1, 0) for i, u in enumerate(urls)],
        "scraping_id long, user_id long, url string, depth int, round int",
    )


def parse_stage(df):
    return (
        df.withColumn("spans", parse_html_udf(F.col("html")))
        .drop("html")
        .withColumn("content", content_col("spans"))
        .withColumn("links", links_col("spans"))
        .agg(F.sum(F.length("content")), F.sum(F.size("links")))
    )


def partition_spread(df):
    counts = [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    mean = sum(counts) / max(len(counts), 1)
    return {
        "partitions": len(counts),
        "max_rows": max(counts, default=0),
        "mean_rows": round(mean, 1),
        "skew_factor": round(max(counts, default=0) / mean, 2) if mean else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=120_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(
        "iws-skew", master=f"local[{args.cores}]", shuffle_partitions=args.cores
    )
    frontier = zipf_frontier(spark, args.rows)
    politeness = spark.createDataFrame(
        [("h0.test", 10**9, [], 0)],
        "host string, max_fetches_per_round int, robots_disallow array<string>, "
        "crawl_delay_rounds int",
    )
    scheduled = (
        schedule_round(frontier, politeness, 0, 10**9)
        .filter(F.col("action") == ACTION_FETCH)
        .drop("action")
        .persist()
    )
    scheduled.count()
    resolve = make_html_resolver(n_hosts=N_HOSTS, base=BASE)

    out = {"rows": args.rows, "cores": args.cores}
    for label, df in (
        ("unsalted_host_layout", scheduled),          # inherits hash(host)
        (
            "salted_url_hash",
            scheduled.repartition(args.cores, url_hash_col("url")),
        ),
    ):
        fetched = resolve(df).persist()
        spread = partition_spread(fetched)
        t = time.monotonic()
        parse_stage(fetched).collect()
        wall = round(time.monotonic() - t, 2)
        fetched.unpersist()
        out[label] = {"parse_wall_sec": wall, **spread}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
