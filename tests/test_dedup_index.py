"""Persisted LSH dedup index (sources/dedup_index.py): probe pruning,
the append lifecycle, and best-match semantics."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.dataset_queries import _doc_grams, _lsh_bands
from isidorus_web_scraper_spark.sources.dedup_index import (
    append_to_dedup_index,
    build_dedup_index,
    probe_dedup_index,
)

SF = "/root/testdata/sf0.001"


def _split(spark):
    grams = _doc_grams(spark, SF)
    corpus = grams.filter(F.col("doc_id") % 7 != 3)
    batch = grams.filter(F.col("doc_id") % 7 == 3)
    return corpus, batch


def test_probe_prunes_band_partitions_and_matches_self_after_append(spark):
    corpus, batch = _split(spark)
    path = tempfile.mkdtemp(prefix="iws-dedupidx-test-")
    try:
        build_dedup_index(_lsh_bands(corpus), corpus, path)

        # pruning pin: the bands read must carry a PartitionFilters
        # entry on bb (the batch's touched bucket-hash partitions)
        probe = probe_dedup_index(spark, path, _lsh_bands(batch), batch)
        plan = probe._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert any(
            "PartitionFilters" in ln and "bb" in ln
            for ln in plan.splitlines()
        ), plan

        before = {r.doc_id for r in probe.collect()}

        # append lifecycle: fold the batch in; every batch doc must now
        # match ITSELF at jaccard 1.0 (best match, ties broken low —
        # its own id wins unless an exact-dup corpus doc has a lower id)
        append_to_dedup_index(_lsh_bands(batch), batch, path)
        after = probe_dedup_index(
            spark, path, _lsh_bands(batch), batch
        ).collect()
        got = {r.doc_id: (r.dup_of, r.jaccard) for r in after}
        batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
        assert set(got) == batch_ids  # every batch doc now has a match
        for doc_id, (dup_of, jac) in got.items():
            assert jac == 1.0 or doc_id in before, (doc_id, dup_of, jac)
            if dup_of == doc_id:
                assert jac == 1.0
    finally:
        shutil.rmtree(path, ignore_errors=True)
