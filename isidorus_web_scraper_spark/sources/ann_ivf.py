"""Partitioned IVF-flat ANN index: the persisted, pruning-served twin
of `dataset_queries.ann_ivf_topk` (which recomputes cell assignment on
every call).

Layout under ``<path>/``:

- ``centroids/``  — the K coarse centroids (cid, embedding); K ~ n/50
  here, broadcast-small by construction at any SF.
- ``cells/cell=<cid>/``  — every vector stored under its nearest
  centroid (Hive partition on ``cell``).

A probe picks each query's ``nprobe`` nearest centroids from the
centroid table, then reads ONLY those cell directories — the parquet
scan's ``PartitionFilters: [cell IN (...)]`` makes probe cost
O(touched cells / K) of the index, the same contract the postings
store (`sources/postings.py`) and the bucketed corpus store pin for
text. The probed-cell set is a bounded driver-side collect
(``n_queries * nprobe`` ints), like the postings bucket pick.

At 100 TB: cells are written once (one assignment shuffle), probes
never rescan the corpus, and adding vectors is an append into their
cell partitions — the vector-side analog of OpenSearch's inverted
index in the reference (workers/indexer/repositories/
opensearch_repository.go stores docs once, queries hit posting lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# single-source cosine (functions/vector.py): byte-exact parity with
# ann_ivf_topk requires the identical expression tree on both paths
from ..functions.vector import cosine as _cosine  # noqa: E402


def assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell): nearest centroid by cosine, ties to
    the lowest cid — the EXACT expression ann_ivf_topk uses, so the
    indexed path reproduces its results bit-for-bit."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        "cid",
        _cosine(F.col("embedding"), F.col("ce")).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("cell"))
    )


def build_ivf_index(emb: DataFrame, centroids: DataFrame, path: str) -> None:
    """One assignment shuffle, then a partitioned write. ``centroids``
    is (cid, ce array<float>)."""
    centroids.withColumnRenamed("ce", "embedding").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")
    assign_cells(emb, centroids).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")


def probe_ivf(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """(qid, neighbor, cos): exact cosine top-k within each query's
    ``nprobe`` nearest cells. Only the probed cell partitions are
    scanned (plan pinned in tests/test_ann_ivf.py)."""
    cent = spark.read.parquet(f"{path}/centroids").select(
        "cid", F.col("embedding").alias("ce")
    )
    ranked = queries.crossJoin(F.broadcast(cent)).select(
        "qid",
        "qe",
        "cid",
        _cosine(F.col("qe"), F.col("ce")).alias("sim"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("cid"))
    qprobe = (
        ranked.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("qid", "qe", F.col("cid").alias("cell"))
    )
    # bounded driver collect: n_queries * nprobe ints — this literal
    # list is what lets the scan prune to the touched partitions
    touched = sorted({r.cell for r in qprobe.select("cell").distinct().collect()})
    cells = spark.read.parquet(f"{path}/cells").filter(
        F.col("cell").isin(touched)
    )
    cand = (
        F.broadcast(qprobe)
        .join(cells, "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            _cosine(F.col("qe"), F.col("embedding")).alias("cos"),
        )
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor"),
            F.round("cos", 4).alias("cos"),
        )
    )
