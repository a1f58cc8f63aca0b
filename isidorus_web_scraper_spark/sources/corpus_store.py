"""Bucket-partitioned corpus store: point-lookup fetch at 100 TB.

The naive fetch-join (`frontier ⋈ documents`) scans the WHOLE corpus
every round — correct, but at 100 TB each round would re-read 100 TB to
fetch a few million pages. The scale design:

- the corpus is written partitioned by ``doc_bucket =
  pmod(xxhash64(canonical(doc_id)), B)`` (Hive-style directories, the
  parquet stand-in for Iceberg bucket partitioning);
- at fetch time the round's frontier is hashed with the SAME function,
  its distinct buckets are collected to the driver (≤ B ints), and the
  corpus read is filtered to those buckets — Catalyst partition-pruning
  turns the scan into O(|touched buckets|) file reads;
- the join then runs with the frontier broadcast.

`.explain` check: the scan shows ``PartitionFilters: [doc_bucket IN
(...)]`` and ``inputFiles()`` shrinks accordingly (pinned in
tests/test_corpus_store.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url import url_hash_col

DEFAULT_BUCKETS = 64


def bucket_col(url: F.Column | str, buckets: int) -> F.Column:
    return F.pmod(url_hash_col(url), F.lit(buckets)).cast("int")


def write_partitioned_corpus(
    documents: DataFrame, path: str, buckets: int = DEFAULT_BUCKETS
) -> None:
    """documents(doc_id, spans|html) → Hive-partitioned parquet."""
    (
        documents.withColumn("doc_bucket", bucket_col("doc_id", buckets))
        .repartition("doc_bucket")
        .write.partitionBy("doc_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def pruned_corpus_for(
    spark: SparkSession,
    path: str,
    frontier: DataFrame,
    buckets: int = DEFAULT_BUCKETS,
    url_col: str = "url",
) -> DataFrame:
    """Read only the corpus buckets the frontier touches.

    The distinct-bucket collect is tiny (≤ B ints) and buys partition
    pruning on the corpus scan — the Spark rendition of a point-lookup
    fetch."""
    touched = [
        r[0]
        for r in frontier.select(
            bucket_col(url_col, buckets).alias("b")
        )
        .distinct()
        .collect()
    ]
    corpus = spark.read.parquet(path)
    return corpus.filter(F.col("doc_bucket").isin(touched)).drop("doc_bucket")


def make_partitioned_fetcher(path: str, buckets: int = DEFAULT_BUCKETS):
    """CrawlEngine resolver backed by the partitioned store: prune →
    broadcast-join the frontier round."""

    def fetch(to_fetch: DataFrame) -> DataFrame:
        spark = to_fetch.sparkSession
        to_fetch = to_fetch.persist()  # hashed twice (bucket set + join)
        docs = pruned_corpus_for(spark, path, to_fetch, buckets)
        payload = "spans" if "spans" in docs.columns else "html"
        # left-preserved side can't be broadcast; the pruned corpus
        # subset is the shuffled side and AQE picks the strategy
        return to_fetch.join(
            docs.select(F.col("doc_id").alias("url"), payload), "url", "left"
        )

    return fetch
