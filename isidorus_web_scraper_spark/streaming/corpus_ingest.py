"""Streaming corpus ingestion with incremental dedup.

The production cadence `dataset_queries.dedup_incremental_lsh`
demonstrates one batch of is, in steady state, a STREAM: document
batches arrive continuously, each is deduped against the corpus index,
and survivors join the corpus. This module runs that loop under
Structured Streaming — ``foreachBatch`` drives exactly the same
probe/append primitives the batch path uses (sources/dedup_index.py),
so stream and batch semantics are one code path (tested equal:
tests/test_streaming.py::test_streaming_ingest_equals_sequential).

Exactly-once notes (same framing as streaming/crawl_stream.py):
- per-batch DECISIONS go to ``out_dir/batch_id=N`` with overwrite —
  a replayed epoch rewrites its own directory, idempotent;
- the index APPEND is not idempotent on its own — a crash between the
  append and the checkpoint commit would re-append on replay. The
  batch path has the same property (derived data, rebuildable from the
  corpus); a production deployment puts the append behind the
  warehouse's commit protocol exactly like the crawl engine's
  postings. This module documents the boundary rather than hiding it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id long, text string"


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    index_path: str,
    out_dir: str,
    batch_id: int,
    threshold: float = 0.2,
) -> None:
    """One epoch: probe the batch against the corpus index, record a
    keep/dup decision per doc, fold the SURVIVORS' signatures into the
    index. Duplicates never enter the index — exactly the batch path's
    contract."""
    from ..dataset_queries import _lsh_bands, doc_grams_of
    from ..sources.dedup_index import append_to_dedup_index, probe_dedup_index

    from pyspark import StorageLevel

    grams = doc_grams_of(batch_df).persist(StorageLevel.MEMORY_AND_DISK)
    bands = _lsh_bands(grams).persist(StorageLevel.MEMORY_AND_DISK)
    dups = probe_dedup_index(
        spark, index_path, bands, grams, threshold=threshold
    ).persist(StorageLevel.MEMORY_AND_DISK)
    decisions = batch_df.select("doc_id").join(dups, "doc_id", "left").select(
        "doc_id",
        F.col("dup_of").isNotNull().alias("is_dup"),
        "dup_of",
        "jaccard",
    )
    decisions.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch_id={batch_id}")
    )
    dup_ids = dups.select("doc_id")
    append_to_dedup_index(
        bands.join(dup_ids, "doc_id", "left_anti"),
        grams.join(dup_ids, "doc_id", "left_anti"),
        index_path,
    )
    for df in (grams, bands, dups):
        df.unpersist()


def run_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.2,
) -> None:
    """Drain ``input_dir`` (one parquet file per arriving batch,
    ``maxFilesPerTrigger=1`` so epochs follow file order) through the
    incremental-dedup loop with an ``availableNow`` trigger."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest_batch(
                spark, df, index_path, out_dir, bid, threshold
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
