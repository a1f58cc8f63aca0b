"""Persisted MinHash-LSH dedup index: dedup a NEW batch against the
existing corpus without re-reading the corpus.

The full-corpus dedup queries (dataset_queries.py dedup_minhash_lsh /
dedup_lsh_verified_jaccard) recompute every signature per run — right
for a one-shot pass, wrong for the production cadence, where a crawl
delivers a fresh batch every round and the question is "which of THESE
docs already exist?". At 100 TB re-signaturing the corpus per batch is
the dominant cost; this store amortizes it to once:

- **build**: write the corpus's LSH band rows and its trigram-gram sets
  once. Bands are Hive-partitioned by ``bb = pmod(xxhash64(bucket), B)``
  — the same layout trick as the postings store — so a probe that only
  touches some band buckets reads only those partitions. Gram sets are
  partitioned the same way by doc-hash for the verify join.
- **probe**: signature the new batch only (its own tokenize pass —
  linear in the BATCH, not the corpus), equi-join its band rows against
  the index's (candidates, per-bucket shuffle, never all-pairs), then
  verify candidates with exact trigram Jaccard against the stored gram
  sets and keep each new doc's best corpus match. The index partitions
  actually read are pruned to the batch's touched ``bb`` values (≤ B
  ints collected driver-side — a bounded set, same budget rule as the
  corpus store's bucket fetch).

Append story at scale: a batch that survives dedup joins the corpus by
APPENDING its band rows and gram sets into the same Hive layout (plain
partitioned appends — derived data, rebuildable from the corpus like
the postings store), so the index grows with the corpus and no batch
ever pays a corpus-wide pass.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_BB = 64


def _bb(col, buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def build_dedup_index(
    bands: DataFrame,
    grams: DataFrame,
    path: str,
    buckets: int = DEFAULT_BB,
) -> None:
    """Persist the corpus side: ``bands/`` = (doc_id, band, bucket)
    partitioned by bucket-hash, ``grams/`` = (doc_id, grams) partitioned
    by doc-hash (so the verify join's index side is also prunable when
    the candidate set is concentrated)."""
    (
        bands.withColumn("bb", _bb(F.col("bucket"), buckets))
        .repartition("bb")
        .write.partitionBy("bb")
        .mode("overwrite")
        .parquet(os.path.join(path, "bands"))
    )
    (
        grams.withColumn("db", _bb(F.col("doc_id"), buckets))
        .repartition("db")
        .write.partitionBy("db")
        .mode("overwrite")
        .parquet(os.path.join(path, "grams"))
    )


def probe_dedup_index(
    spark: SparkSession,
    path: str,
    new_bands: DataFrame,
    new_grams: DataFrame,
    threshold: float = 0.2,
    buckets: int = DEFAULT_BB,
) -> DataFrame:
    """(new bands, new grams) → (doc_id, dup_of, jaccard): each new
    doc's best corpus match at ``jaccard >= threshold`` (ties → lowest
    corpus doc_id). Index reads prune to the batch's touched ``bb``
    partitions; the verify joins only the candidate pairs.

    The batch frames are persisted here: ``new_bands`` feeds the
    touched-bucket collect AND the candidates join, ``new_grams`` feeds
    the signature lineage AND the verify join — without the cache the
    batch's tokenize+md5+minhash pass would run three times per probe.
    Same cache-lifetime rule as dedup_lsh_verified_jaccard: one-shot
    sessions release at exit, long-lived ones clearCache() after
    collecting."""
    from pyspark import StorageLevel

    new_bands = new_bands.persist(StorageLevel.MEMORY_AND_DISK)
    new_grams = new_grams.persist(StorageLevel.MEMORY_AND_DISK)
    touched = [
        int(r.bb)
        for r in new_bands.select(
            _bb(F.col("bucket"), buckets).alias("bb")
        )
        .distinct()
        .collect()
    ]  # ≤ `buckets` ints — bounded driver-side set
    idx_bands = (
        spark.read.parquet(os.path.join(path, "bands"))
        .filter(F.col("bb").isin(touched))
        .select(F.col("doc_id").alias("corpus_doc"), "band", "bucket")
    )
    cands = (
        new_bands.select(F.col("doc_id").alias("new_doc"), "band", "bucket")
        .join(idx_bands, ["band", "bucket"])
        .select("new_doc", "corpus_doc")
        .distinct()
    )
    ng = new_grams.select(
        F.col("doc_id").alias("new_doc"), F.col("grams").alias("grams_n")
    )
    og = spark.read.parquet(os.path.join(path, "grams")).select(
        F.col("doc_id").alias("corpus_doc"), F.col("grams").alias("grams_o")
    )
    inter = F.size(F.array_intersect("grams_n", "grams_o"))
    union = F.size("grams_n") + F.size("grams_o") - inter
    jac = inter.cast("double") / union
    verified = (
        cands.join(ng, "new_doc")
        .join(og, "corpus_doc")
        .select("new_doc", "corpus_doc", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("new_doc").orderBy(
        F.desc("jaccard"), F.asc("corpus_doc")
    )
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("new_doc").alias("doc_id"),
            F.col("corpus_doc").alias("dup_of"),
            F.round("jaccard", 5).alias("jaccard"),
        )
    )


def append_to_dedup_index(
    bands: DataFrame,
    grams: DataFrame,
    path: str,
    buckets: int = DEFAULT_BB,
) -> None:
    """Fold a deduped batch into the corpus index — plain partitioned
    appends into the same Hive layout (derived data; a torn write is
    repaired by rebuilding from the corpus)."""
    (
        bands.withColumn("bb", _bb(F.col("bucket"), buckets))
        .repartition("bb")
        .write.partitionBy("bb")
        .mode("append")
        .parquet(os.path.join(path, "bands"))
    )
    (
        grams.withColumn("db", _bb(F.col("doc_id"), buckets))
        .repartition("db")
        .write.partitionBy("db")
        .mode("append")
        .parquet(os.path.join(path, "grams"))
    )
