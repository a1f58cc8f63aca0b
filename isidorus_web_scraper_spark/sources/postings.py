"""Posting-list search index: probe instead of scan.

The reference's search is an OpenSearch inverted index
(`workers/indexer/repositories/opensearch_repository.go:23-56`); our
`plans/api.py:search_pages` is a full ``contains()`` scan over pages —
correct, but at 100 TB every query rescans the corpus. This module is
the Spark-native inverted index:

- **build**: tokenize + explode + hash-aggregate → one row per
  (term, doc) with its frequency (the classic posting list; the same
  shape as ``plans/api.py:term_frequency``, which the reference's
  schema carries with no writer — init.sql:15-21);
- **layout**: Hive-partitioned by ``term_bucket =
  pmod(xxhash64(term), B)`` — a term probe reads 1/B of the index via
  Catalyst partition pruning (`PartitionFilters: [term_bucket = b]`),
  never the corpus;
- **probe**: filter the one bucket, then ``term = t`` inside it. Score
  is served straight from the index (frequency); highlight snippets
  need content and remain a point-retrieval of the FEW matched docs
  (broadcast semi-join), not a corpus scan.

The index is DERIVED data: appends per crawl round are plain parquet
appends (no warehouse commit protocol), and a torn write is repaired by
``rebuild`` from the pages table — the Iceberg analog would make these
appends transactional too, but losing an index never loses truth.

File-count budget: each round's write repartitions by term_bucket, so a
round adds ~1 file per touched bucket; an R-round crawl leaves ~R files
per bucket and a probe opens ~R files. The (round, term_bucket) layout
is load-bearing (partial-round rollback = remove the round dir; the
round partition value feeds the highlights join), so cross-round
folding would have to rewrite round into data columns and break both —
for long crawls, ``plans/api.py:rebuild_postings`` into a fresh path is
the compaction story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TERM_BUCKETS = 64


def _term_bucket(term, buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(buckets)).cast("int")


def build_postings(
    df: DataFrame,
    id_cols: list[str],
    text_col: str,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """(ids..., text) → (ids..., term, frequency, term_bucket).

    Tokenization matches ``search_pages``'s TF definition (lowercase,
    split on single spaces) so index-served scores equal scan-served
    scores exactly."""
    return (
        df.select(
            *id_cols,
            F.explode(F.split(F.lower(F.col(text_col)), " ", -1)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy(*id_cols, "term")
        .agg(F.count("*").alias("frequency"))
        .withColumn("term_bucket", _term_bucket(F.col("term"), buckets))
    )


def write_postings(
    postings: DataFrame,
    path: str,
    mode: str = "append",
    partition_cols: list[str] | None = None,
) -> None:
    """Hive-partitioned append (one pass per crawl round). The
    repartition co-locates each bucket's rows so a round adds ~1 file
    per touched bucket instead of tasks×buckets tiny files. The engine
    passes ``["round", "term_bucket"]`` so a partial round rolls back
    by removing its ``round=N`` directory."""
    cols = partition_cols or ["term_bucket"]
    (
        postings.repartition("term_bucket")
        .write.partitionBy(*cols)
        .mode(mode)
        .parquet(path)
    )


def probe_postings(
    spark: SparkSession,
    path: str,
    term: str,
    buckets: int = DEFAULT_TERM_BUCKETS,
) -> DataFrame:
    """Read ONLY the term's bucket (partition pruning), then match the
    term inside it. ``.explain`` shows ``PartitionFilters:
    [term_bucket = <b>]`` — pinned by tests/test_postings.py."""
    t = term.lower()
    b = spark.range(1).select(_term_bucket(F.lit(t), buckets)).first()[0]
    return (
        spark.read.parquet(path)
        .filter(F.col("term_bucket") == int(b))
        .filter(F.col("term") == t)
        .drop("term_bucket")
    )

