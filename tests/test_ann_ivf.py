"""Persisted IVF index: pruning proof + equality with the recompute
path (`ann_ivf_topk`). Mirrors the corpus-store/postings pruning pins:
the probe's parquet scan must touch ONLY the probed cell partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.sources.ann_ivf import (
    assign_cells,
    build_ivf_index,
    probe_ivf,
)
from isidorus_web_scraper_spark.sources.testdata import load

SF = "/root/testdata/sf0.001"


def _build(spark, tmp_path) -> str:
    emb = load(spark, SF, "embeddings")
    cent = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, cent, path)
    return path


def test_probe_equals_recompute(spark, tmp_path):
    from isidorus_web_scraper_spark.dataset_queries import ann_ivf_topk

    path = _build(spark, tmp_path)
    queries = load(spark, SF, "embeddings").filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    got = sorted(map(tuple, probe_ivf(spark, path, queries).collect()))
    want = sorted(map(tuple, ann_ivf_topk(spark, SF).collect()))
    assert got == want


def test_probe_prunes_to_touched_cells(spark, tmp_path):
    path = _build(spark, tmp_path)
    emb = load(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    probe = probe_ivf(spark, path, queries, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan  # probe scan is pruned
    # input_file_name can't span the probe's multi-source join, so pin
    # the file-level claim on the same isin-shaped read the probe does:
    # it must touch only the filtered partitions' files
    full = spark.read.parquet(f"{path}/cells")
    total_cells = full.select("cell").distinct().count()
    assert total_cells > 6  # 3 queries x nprobe=2 genuinely prunes
    first_cell = full.select("cell").first()[0]
    pruned = full.filter(F.col("cell").isin([int(first_cell)]))
    scanned = {
        r.f.split("cell=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert scanned == {str(first_cell)}


def test_index_append_new_vectors(spark, tmp_path):
    """Adding vectors = assign + APPEND into their cell partitions;
    the index never rewrites, and the appended vector is findable."""
    path = _build(spark, tmp_path)
    emb = load(spark, SF, "embeddings")
    cent = spark.read.parquet(f"{path}/centroids").select(
        "cid", F.col("embedding").alias("ce")
    )
    # clone vec 7 as a new id — its top-1 neighbor must be vec 7
    newbie = emb.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    assign_cells(newbie, cent).write.mode("append").partitionBy(
        "cell"
    ).parquet(f"{path}/cells")
    q = newbie.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    top = probe_ivf(spark, path, q, nprobe=2, k=1).collect()
    assert len(top) == 1 and top[0].neighbor == 7 and top[0].cos == 1.0
