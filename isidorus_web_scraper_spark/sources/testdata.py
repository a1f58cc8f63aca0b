"""Loaders for the driver-generated parquet tables under /root/testdata.

Tables: region nation customer supplier part orders lineitem events
documents embeddings (TESTDATA.md). These are the correctness-gate
inputs; the crawl engine's span-structured corpus is generated
separately by ``corpus.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (applicationId, path) -> lazy DataFrame. Re-reading the same static
# parquet table re-lists its files and re-reads the footer schema on
# the DRIVER every single time (~50-150 ms per call); a serial bench
# run touches the same handful of tables dozens of times. Reusing the
# analyzed relation keeps its FileIndex, which is exactly Spark's own
# filesourcePartitionFileCache idea (guide §6) applied at the API
# level. This caches NO data and NO results — the plan stays lazy and
# every action still computes from the parquet inputs; the testdata
# dirs are immutable by contract (TESTDATA.md), so the listing can
# never go stale. Keyed by applicationId so a fresh session never sees
# another session's relations.
_RELATION_CACHE: dict[tuple[str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, f"{sf_dir}/{name}.parquet")
    df = _RELATION_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(key[1])
        _RELATION_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
