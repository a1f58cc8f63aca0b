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


def test_decontaminate_join_strategy_is_aqe_chosen(spark, sf_correct):
    """No FORCED broadcast of the benchmark side: the stand-in bench set
    is ~1% of the corpus (≈1 TB of exploded 5-grams at 100 TB) and a
    hard-coded F.broadcast models an executor OOM. The logical plan must
    carry no broadcast hint; at sf0.01 the bench side is small at
    runtime, so AQE's FINAL plan still picks a broadcast join — pin
    both."""
    df = QUERIES["decontaminate_benchmark"](spark, sf_correct)
    logical = df._jdf.queryExecution().logical().toString()
    assert "ResolvedHint" not in logical and "BROADCAST" not in logical, logical
    df.collect()  # materialize so AQE finalizes the plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final, final


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


def test_bm25_topk_is_take_ordered_not_global_sort(spark, sf_correct):
    # the top-10 must compile to TakeOrderedAndProject (per-partition
    # heads + driver merge), never a full Sort; the 1-row stats frame
    # must come in as a broadcast join
    plan = _plan(spark, "bm25_search", sf_correct)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_bm25_indexed_probes_pruned_buckets(spark, sf_correct):
    # the index-served BM25 must read only the query terms' term_bucket
    # partitions and keep the distributed top-k
    plan = _plan(spark, "bm25_indexed", sf_correct)
    assert "TakeOrderedAndProject" in plan, plan
    assert any(
        "PartitionFilters" in ln and "term_bucket" in ln
        for ln in plan.splitlines()
    ), plan


def test_q5_star_dims_broadcast_and_date_pushdown(spark, sf_correct):
    """local_supplier_volume: region/nation/supplier are broadcast (3
    of 5 joins shuffle-free) and the order-year filter reaches the
    orders parquet scan."""
    plan = _plan(spark, "local_supplier_volume", sf_correct)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln for ln in pushed), (
        "order-date window not pushed:\n" + "\n".join(pushed)
    )


def test_q14_part_broadcast(spark, sf_correct):
    plan = _plan(spark, "promo_revenue_share", sf_correct)
    assert "BroadcastHashJoin" in plan, plan


def test_sla_prunes_lineitem_columns(spark, sf_correct):
    """order_priority_sla: the lineitem scan must read ONLY the join
    key and ship date (the fact collapses map-side before the join —
    a scan dragging price/quantity columns through would be wrong)."""
    plan = _plan(spark, "order_priority_sla", sf_correct)
    scans = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "l_orderkey" in ln
    ]
    assert scans, plan
    for ln in scans:
        assert "l_extendedprice" not in ln and "l_quantity" not in ln, ln


def test_profile_is_single_scan(spark, sf_correct):
    """documents_profile: ONE parquet scan feeding one Expand — the
    union-of-five-aggs shape (5 scans) is the regression this pins."""
    df = QUERIES["documents_profile"](spark, sf_correct)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    assert "Expand" in plan, plan


def test_market_basket_dims_broadcast(spark, sf_correct):
    plan = _plan(spark, "market_basket_lift", sf_correct)
    # part joins broadcast; supports/totals broadcast onto pairs
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_score_auc_no_allpairs_join(spark, sf_correct):
    """The Mann-Whitney AUC must come from the score histogram + one
    window — never the textbook pos×neg pair join."""
    plan = _plan(spark, "score_auc", sf_correct)
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan
    # only n_chars + lang are read
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            assert "text" not in ln, ln


def test_hybrid_rrf_arms_are_take_ordered(spark, sf_correct):
    """Both retrieval arms are bounded top-k (per-partition heaps),
    so the fusion join is a 10x10 frame regardless of corpus size."""
    plan = _plan(spark, "hybrid_search_rrf", sf_correct)
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_event_type_pmi_marginals_broadcast(spark, sf_correct):
    plan = _plan(spark, "event_type_pmi", sf_correct)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_seasonal_anomaly_baseline_broadcast(spark, sf_correct):
    """The 168-row weekday-hour baseline joins back as a broadcast;
    events collapse to hour slots via partial aggregation first."""
    plan = _plan(spark, "seasonal_anomaly", sf_correct)
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan or "HashAggregate" in plan, plan


def test_weighted_sample_is_take_ordered(spark, sf_correct):
    """The ES reservoir is one scan + TakeOrderedAndProject — a global
    sort here would be the O(n log n) mistake the sketch avoids."""
    plan = _plan(spark, "weighted_sample_es", sf_correct)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", ""), plan


def test_kmv_bottom_k_is_take_ordered(spark, sf_correct):
    plan = _plan(spark, "kmv_distinct", sf_correct)
    assert "TakeOrderedAndProject" in plan, plan


def test_knn_accuracy_broadcasts_queries(spark, sf_correct):
    plan = _plan(spark, "knn_classifier_accuracy", sf_correct)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_word_burstiness_top_k_is_take_ordered(spark, sf_correct):
    """Top-12 by collection frequency must be TakeOrderedAndProject on
    the vocab-sized frame — a global Sort of the vocabulary would be
    the O(V log V) mistake at corpus scale."""
    plan = _plan(spark, "word_burstiness", sf_correct)
    assert "TakeOrderedAndProject" in plan, plan


def test_brand_hhi_part_dim_broadcast(spark, sf_correct):
    plan = _plan(spark, "brand_supplier_hhi", sf_correct)
    assert "BroadcastHashJoin" in plan, plan


def test_fano_spine_types_broadcast(spark, sf_correct):
    """The hour spine × event-types expansion must broadcast the tiny
    distinct-types side — shuffling the generated spine against 5 types
    would add a pointless exchange to a frame whose size is the time
    range."""
    plan = _plan(spark, "events_fano_burstiness", sf_correct)
    assert (
        "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    ), plan


def test_autocorr_moments_off_day_rollup(spark, sf_correct):
    """The lag-1 self-join must run on the day×type rollup, not raw
    events: every parquet scan feeding a join must pass through a
    HashAggregate FIRST — a join of two raw event scans (the O(n²)
    shuffle mistake) would show a Scan with no aggregate between it
    and the join node."""
    plan = _plan(spark, "events_autocorr_lag1", sf_correct)
    tree = plan.split("\n\n")[0].splitlines()
    join_lines = [
        i for i, ln in enumerate(tree) if "Join" in ln
    ]
    assert join_lines, plan
    for i, ln in enumerate(tree):
        if "Scan parquet" not in ln:
            continue
        # walk UP the child chain (toward the root, earlier lines):
        # an aggregate must appear before any join does
        between = tree[:i]
        # nearest enclosing join above this scan
        joins_above = [j for j in join_lines if j < i]
        if not joins_above:
            continue
        j = max(joins_above)
        assert any(
            "HashAggregate" in x for x in between[j + 1 : i]
        ), f"scan at tree line {i} feeds the join un-aggregated:\n" + "\n".join(tree)


def _tree_lines(plan: str) -> list:
    """The physical-plan tree section as (indent, text) pairs; indent
    is the column of the node marker, so a node's subtree is the run
    of following lines with strictly greater indent."""
    out = []
    for ln in plan.split("\n\n")[0].splitlines():
        for marker in ("+- ", ":- "):
            i = ln.find(marker)
            if i >= 0:
                out.append((i, ln))
                break
        else:
            if ln.strip() and "Physical Plan" not in ln:
                out.append((0, ln))
    return out


def test_word_pmi_candidates_bounded_first(spark, sf_correct):
    """PMI candidates must bound to the broadcast top-20 BEFORE the
    pair self-join — joining the raw exploded (doc, word) frame against
    itself would square the vocabulary. Structural pin: every join
    whose subtree contains a Generate (the corpus explode) must also
    contain a TakeOrderedAndProject below it (the old markers-exist
    assertion was vacuously true — session-8 review)."""
    plan = _plan(spark, "word_pmi_top", sf_correct)
    tree = _tree_lines(plan)
    joins = [i for i, (_d, ln) in enumerate(tree) if "Join" in ln]
    assert joins, plan
    for j in joins:
        depth = tree[j][0]
        sub = []
        for d, ln in tree[j + 1:]:
            if d <= depth:
                break
            sub.append(ln)
        if any("Generate" in ln for ln in sub):
            assert any("TakeOrderedAndProject" in ln for ln in sub), (
                "join over an unbounded exploded frame:\n"
                + "\n".join(ln for _d, ln in tree)
            )
