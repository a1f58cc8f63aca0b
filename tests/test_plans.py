"""Physical-plan shape pins: the scale properties README claims are
asserted, not assumed. If a refactor silently turns a broadcast into a
sort-merge join or un-pushes a filter, these fail."""

from __future__ import annotations

from isidorus_web_scraper_spark.driver_queries import QUERIES


def _plan(spark, name, sf_dir, mode="formatted") -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_flagship_column_pruning(spark, sf_correct):
    plan = _plan(spark, "flagship_doc_stats", sf_correct)
    # the documents scan must read only the 3 referenced columns
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    for ln in scan:
        assert "text" not in ln, f"flagship reads the text column: {ln}"


def test_pricing_summary_filter_pushdown(spark, sf_correct):
    plan = _plan(spark, "pricing_summary", sf_correct)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), (
        "shipdate predicate not pushed to the parquet scan:\n" + "\n".join(pushed)
    )


def test_decontaminate_broadcasts_benchmark_side(spark, sf_correct):
    plan = _plan(spark, "decontaminate_benchmark", sf_correct)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_fetch_join_broadcasts_frontier(spark, sf_correct):
    plan = _plan(spark, "fetch_join", sf_correct)
    assert "BroadcastHashJoin" in plan, plan


def test_ann_queries_push_query_filter(spark, sf_correct):
    for name in ("ann_lsh_multiprobe", "ann_ivf_topk"):
        plan = _plan(spark, name, sf_correct)
        assert any(
            "LessThan(vec_id,10)" in ln
            for ln in plan.splitlines()
            if "PushedFilters" in ln
        ), f"{name}: vec_id<10 not pushed to scan"
