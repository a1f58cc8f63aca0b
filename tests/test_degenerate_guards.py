"""Degenerate-slice pins for the session-9 statistics queries.

The oracle rows prove Spark==DuckDB on the real testdata, where both
cohorts exist and variances are positive. These fixtures exercise the
guarded branches the testdata can't reach — empty cohort (KS), zero
variance (Spearman), empty corpus half (JS divergence) — where an
unguarded division diverges between engines (Spark's non-ANSI double/0
is NULL; DuckDB's IEEE default is NaN/inf). The guard must decide on
exact integer witnesses BEFORE the division on both sides, so both
engines emit the same NULL (review finding, session 9; same class as
the session-8 ANOVA guard).
"""

from __future__ import annotations

import duckdb

from isidorus_web_scraper_spark.driver_queries import ORACLE, QUERIES

from .oracle_compare import compare


def _conn_with(views: dict[str, str]) -> duckdb.DuckDBPyConnection:
    # Spark writes a DIRECTORY named <table>.parquet; DuckDB needs the
    # part-file glob (the real testdata is single files, so
    # oracle_compare.duckdb_conn doesn't)
    conn = duckdb.connect()
    for name, path in views.items():
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{path}/*.parquet'"
        )
    return conn


def test_ks_two_sample_empty_cohort(spark, tmp_path):
    # every order is low-priority: the high-priority cohort is empty,
    # n_a = 0, and ks_d must be NULL in BOTH engines (not NULL-vs-NaN)
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "5-LOW") for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["ks_two_sample"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_a == 0 and row.n_b == 6
    assert row.ks_d is None
    compare(df, _conn_with({"orders": path}), ORACLE["ks_two_sample"])


def test_spearman_zero_variance(spark, tmp_path):
    # constant price: the x-rank variance witness is exactly 0 and
    # spearman_rho must be NULL in both engines
    path = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [(i, 10.0, 1 + i) for i in range(5)],
        "p_partkey long, p_retailprice double, p_size int",
    ).write.parquet(path)
    df = QUERIES["spearman_price_size"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 5
    assert row.spearman_rho is None
    compare(df, _conn_with({"part": path}), ORACLE["spearman_price_size"])


def test_js_divergence_empty_half(spark, tmp_path):
    # only odd doc_ids: the even half is empty (na = 0) and js_div
    # must be NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(2 * i + 1, "en" if i % 2 else "fr") for i in range(4)],
        "doc_id long, lang string",
    ).write.parquet(path)
    df = QUERIES["js_divergence_lang"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.na == 0 and row.nb == 4
    assert row.js_div is None
    compare(df, _conn_with({"documents": path}), ORACLE["js_divergence_lang"])


def test_spearman_healthy_slice_nonnull(spark, tmp_path):
    # guard must NOT fire on a varying slice: ties on both columns,
    # rho well-defined and equal across engines
    path = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [(1, 10.0, 3), (2, 10.0, 1), (3, 20.0, 4), (4, 30.0, 4), (5, 25.0, 2)],
        "p_partkey long, p_retailprice double, p_size int",
    ).write.parquet(path)
    df = QUERIES["spearman_price_size"](spark, str(tmp_path))
    assert df.collect()[0].spearman_rho is not None
    compare(df, _conn_with({"part": path}), ORACLE["spearman_price_size"])


def test_cohens_kappa_constant_raters(spark, tmp_path):
    # every doc tagged en AND stopword-saturated (detected en): both
    # raters are the constant 1, pe = 1, and kappa's integer
    # denominator n^2 - E is exactly 0 -> NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "en", "the the the and of") for i in range(5)],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    df = QUERIES["cohens_kappa_langid"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 5 and row.tp == 5 and row.tn == 0
    assert row.kappa is None
    compare(df, _conn_with({"documents": path}), ORACLE["cohens_kappa_langid"])


def test_mann_kendall_single_day(spark, tmp_path):
    # one calendar day: n_days = 1, so 18*Var(S) = n(n-1)(2n+5) = 0
    # and the z-score must be NULL in both engines (no sqrt(0) division)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    day = datetime.date(2026, 3, 1)
    spark.createDataFrame(
        [(i, day, 100.0 + i) for i in range(4)],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["mann_kendall_trend"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 1 and row.s_stat == 0 and row.var18 == 0
    assert row.z_score is None
    compare(df, _conn_with({"orders": path}), ORACLE["mann_kendall_trend"])


def test_cramers_v_one_row_table(spark, tmp_path):
    # a single event_type makes a 1xK contingency table:
    # min(rows, cols) - 1 = 0, V undefined -> NULL in both engines
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, "click", base + datetime.timedelta(days=i)) for i in range(6)],
        "event_id long, event_type string, ts timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["cramers_v_type_dow"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 6 and row.n_rows == 1 and row.n_cols == 6
    assert row.cramers_v is None
    compare(df, _conn_with({"events": path}), ORACLE["cramers_v_type_dow"])


def test_theils_u_single_type(spark, tmp_path):
    # one event_type: H(event_type) = -1*log2(1) = exactly 0, U
    # undefined -> NULL in both engines (no 0/0)
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, "click", base + datetime.timedelta(days=i)) for i in range(6)],
        "event_id long, event_type string, ts timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["theils_u_type_dow"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 6 and row.h_type == 0.0
    assert row.theils_u is None
    compare(df, _conn_with({"events": path}), ORACLE["theils_u_type_dow"])


def test_mcnemar_no_discordant_pairs(spark, tmp_path):
    # perfect agreement: b = c = 0, the statistic is undefined (not
    # zero) -> NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "en", "the the the and of") for i in range(5)],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    df = QUERIES["mcnemar_langid"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.b == 0 and row.c == 0
    assert row.chi2_cc is None
    compare(df, _conn_with({"documents": path}), ORACLE["mcnemar_langid"])


def test_runs_test_two_days(spark, tmp_path):
    # two unequal days: one above / one below the midpoint median,
    # n1 = n2 = 1 makes Var(R)'s integer numerator 2*1*1*(2-2) = 0
    # -> z NULL in both engines (runs itself is still the exact 2)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [
            (1, datetime.date(2026, 3, 1), 100.0),
            (2, datetime.date(2026, 3, 2), 200.0),
        ],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["runs_test_revenue"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_obs == 2 and row.n1 == 1 and row.n2 == 1 and row.runs == 2
    assert row.z_score is None
    compare(df, _conn_with({"orders": path}), ORACLE["runs_test_revenue"])


def test_kaplan_meier_survival_hits_zero(spark, tmp_path):
    # every customer repurchases at the same duration: at that event
    # time d = n_risk, and the exact-integer zero flag must force
    # S = 0 in both engines WITHOUT either evaluating ln(0)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    d1, d2 = datetime.date(2026, 3, 1), datetime.date(2026, 3, 5)
    spark.createDataFrame(
        [(1, 10, d1, 1.0), (2, 10, d2, 1.0), (3, 20, d1, 1.0), (4, 20, d2, 1.0)],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["kaplan_meier_repurchase"](spark, str(tmp_path))
    rows = {r.hz: r for r in df.collect()}
    assert rows[30].n_total == 2 and rows[30].events_total == 2
    assert all(rows[hz].survival == 0.0 for hz in (30, 60, 90))
    compare(df, _conn_with({"orders": path}), ORACLE["kaplan_meier_repurchase"])


def test_odds_ratio_empty_discordant_cells(spark, tmp_path):
    # perfect agreement: b = c = 0, so bc = 0 and both the OR and the
    # Woolf CI are undefined -> NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "en", "the the the and of") for i in range(5)],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    df = QUERIES["odds_ratio_langid"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.a == 5 and row.b == 0 and row.c == 0 and row.d == 0
    assert row.odds_ratio is None and row.ci_lo is None and row.ci_hi is None
    compare(df, _conn_with({"documents": path}), ORACLE["odds_ratio_langid"])


def test_turning_points_two_days(spark, tmp_path):
    # two days have no interior point: T = 0 exactly and z must be
    # NULL in both engines (n < 3 guard)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [
            (1, datetime.date(2026, 3, 1), 100.0),
            (2, datetime.date(2026, 3, 2), 200.0),
        ],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["turning_points_revenue"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 2 and row.t_pts == 0
    assert row.z_score is None
    compare(df, _conn_with({"orders": path}), ORACLE["turning_points_revenue"])


def test_lorenz_zero_total_revenue(spark, tmp_path):
    # all-zero prices: integer total is exactly 0 and every decile's
    # cum_share must be NULL in both engines (no 0/0)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, i, datetime.date(2026, 3, 1), 0.0) for i in range(10)],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["lorenz_revenue_deciles"](spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 10
    assert all(r.revenue_cents == 0 and r.cum_share is None for r in rows)
    compare(df, _conn_with({"orders": path}), ORACLE["lorenz_revenue_deciles"])


def test_tfidf_rounded_tie_breaks_on_word(spark, tmp_path):
    # two terms with identical (tf, df) tie exactly after rounding:
    # the word-asc tiebreak must pick the same top-3 cut in both
    # engines (the float never decides alone)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [
            (1, "zebra apple zebra apple mango"),
            (2, "kiwi kiwi plum plum plum"),
        ],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["tfidf_top_terms"](spark, str(tmp_path))
    got = {(r.doc_id, r.rnk): r.word for r in df.collect()}
    # doc 1: apple/zebra tie at tf=2 (same df=1) -> apple first
    assert got[(1, 1)] == "apple" and got[(1, 2)] == "zebra"
    compare(df, _conn_with({"documents": path}), ORACLE["tfidf_top_terms"])


def test_quantile_sketch_constant_values(spark, tmp_path):
    # all values equal: range collapses to 1 cent, every row lands in
    # bucket 0, and the containment invariant must still hold exactly
    import datetime

    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [
            (i, datetime.datetime(2026, 3, 1, 12, 0, 0), i, "click", 7.5, "{}")
            for i in range(9)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["quantile_histogram_sketch"](spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 3  # one per quantile target
    assert all(
        r.bucket == 0
        and r.exact_cents == 750
        and r.bucket_lo_cents <= 750 <= r.bucket_hi_cents
        and r.sketch_contains_exact
        for r in rows
    )
    compare(
        df, _conn_with({"events": path}), ORACLE["quantile_histogram_sketch"]
    )


def test_kmv_set_ops_empty_side(spark, tmp_path):
    # no purchase events: B's sketch is empty, so its h_k is NULL and
    # theta must fall back to h_k(A) (both engines' least() SKIPS
    # NULLs — the property this pin protects); intersection is 0 and
    # the union estimate degrades to A's own KMV estimate
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(i, i, "click") for i in range(20)],
        "event_id long, user_id long, event_type string",
    ).write.parquet(path)
    df = QUERIES["kmv_set_ops"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.theta is not None  # least() skipped the NULL side
    assert row.n_inter == 0 and row.n_a_only == row.n_union
    assert row.exact_inter == 0 and row.exact_union == 20
    compare(df, _conn_with({"events": path}), ORACLE["kmv_set_ops"])


def test_theil_sen_single_month(spark, tmp_path):
    # one calendar month: zero pairwise slopes — the slope median and
    # the intercept must be NULL in BOTH engines (median of an empty
    # frame), never a crash or a NaN-vs-NULL split
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "1994-03-15") for i in range(4)],
        "o_orderkey long, o_totalprice double, o_orderdate string",
    ).write.parquet(path)
    df = QUERIES["theil_sen_slope"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_months == 1 and row.n_pairs == 0
    assert row.slope_cents_per_month is None
    assert row.intercept_cents is None
    compare(df, _conn_with({"orders": path}), ORACLE["theil_sen_slope"])


def test_mann_whitney_empty_cohort_and_all_ties(spark, tmp_path):
    # all-low-priority (n1 = 0) AND every total identical (pure ties):
    # both integer guards fail (n1*n2 = 0 and the tie denominator is
    # 0), so z2 and significant are NULL in both engines — the
    # division is never evaluated
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0, "5-LOW") for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["mann_whitney_u"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 0 and row.n2 == 6
    assert row.two_u1 == 0
    assert row.z2 is None and row.significant is None
    compare(df, _conn_with({"orders": path}), ORACLE["mann_whitney_u"])


def test_mann_whitney_all_tied_mixed_groups(spark, tmp_path):
    # both cohorts present but every value tied: midranks make
    # 2U1 = n1*n2 exactly (diff = 0) while the tie term equals
    # N^3 - N, so the tie-denominator guard fails -> NULL verdict
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0, "1-URGENT" if i % 2 == 0 else "5-LOW") for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["mann_whitney_u"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 3 and row.n2 == 3
    assert row.two_u1 == row.n1 * row.n2  # 2U1 = n1*n2 exactly
    assert row.tie_term == 6 ** 3 - 6
    assert row.z2 is None and row.significant is None
    compare(df, _conn_with({"orders": path}), ORACLE["mann_whitney_u"])


def test_chao1_no_doubletons_and_no_singletons(spark, tmp_path):
    # lang 'aa': every token unique (f2 = 0) — the bias-corrected
    # +1 denominator keeps chao1 finite with NO guard branch;
    # lang 'bb': every token repeated (f1 = 0) — chao1 == V exactly
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [
            (1, "alpha beta gamma", "aa", "s", 16),
            (2, "delta epsilon", "aa", "s", 13),
            (3, "x y x y", "bb", "s", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["chao1_vocab_estimate"](spark, str(tmp_path))
    rows = {r.lang: r for r in df.collect()}
    aa, bb = rows["aa"], rows["bb"]
    assert aa.f2 == 0 and aa.f1 == 5
    assert aa.chao1_est == 5 + (5 * 4) / 2.0  # finite, = 15.0
    assert bb.f1 == 0 and bb.chao1_est == float(bb.n_vocab)
    compare(df, _conn_with({"documents": path}), ORACLE["chao1_vocab_estimate"])


def test_simpsons_single_stratum_no_paradox(spark, tmp_path):
    # one stratum: pooled == the stratum, so the paradox flag must be
    # FALSE even though all strata trivially agree on the sign
    path = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        [(1.0 * q, 100.0 * q, 0.0, "A") for q in range(1, 6)],
        "l_quantity double, l_extendedprice double, l_discount double,"
        " l_returnflag string",
    ).write.parquet(path)
    df = QUERIES["simpsons_paradox_audit"](spark, str(tmp_path))
    rows = {r.grp: r for r in df.collect()}
    assert rows["A"].slope_sign == 1 and rows["ALL"].slope_sign == 1
    assert all(r.paradox is False for r in rows.values())
    compare(
        df, _conn_with({"lineitem": path}), ORACLE["simpsons_paradox_audit"]
    )


def test_simpsons_constructed_reversal_flags(spark, tmp_path):
    # the textbook reversal: within each stratum y DECREASES in x, but
    # stratum B sits at both higher x and higher y, so the pooled slope
    # sign flips positive — paradox must be TRUE on every output row
    rows = [
        # stratum A: x in {1,2}, y falls 100 -> 90
        (1.0, 1.00, 0.0, "A"),
        (2.0, 0.90, 0.0, "A"),
        # stratum B: x in {10,11}, y falls 1000 -> 990 (but >> A's y)
        (10.0, 10.00, 0.0, "B"),
        (11.0, 9.90, 0.0, "B"),
    ]
    path = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double,"
        " l_returnflag string",
    ).write.parquet(path)
    df = QUERIES["simpsons_paradox_audit"](spark, str(tmp_path))
    got = {r.grp: r for r in df.collect()}
    assert got["A"].slope_sign == -1 and got["B"].slope_sign == -1
    assert got["ALL"].slope_sign == 1
    assert all(r.paradox is True for r in got.values())
    compare(
        df, _conn_with({"lineitem": path}), ORACLE["simpsons_paradox_audit"]
    )


def test_logrank_single_group(spark, tmp_path):
    # every customer is BUILDING: n1 = n at every time, the variance
    # terms are exactly 0, and chi2/significant must be NULL in BOTH
    # engines (0/0 never evaluated — the guard decides on v_sum > 0)
    opath = f"{tmp_path}/orders.parquet"
    cpath = f"{tmp_path}/customer.parquet"
    spark.createDataFrame(
        [(i, i % 3, f"2026-01-{1 + i:02d}") for i in range(8)],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(i, "BUILDING") for i in range(3)],
        "c_custkey long, c_mktsegment string",
    ).write.parquet(cpath)
    df = QUERIES["logrank_test"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n2_total == 0 and row.chi2 is None and row.significant is None
    compare(
        df,
        _conn_with({"orders": opath, "customer": cpath}),
        ORACLE["logrank_test"],
    )


def test_logrank_no_repurchases(spark, tmp_path):
    # nobody repurchases: zero event times, the terms frame is empty,
    # and both engines return an EMPTY result (0 rows == 0 rows)
    opath = f"{tmp_path}/orders.parquet"
    cpath = f"{tmp_path}/customer.parquet"
    spark.createDataFrame(
        [(i, i, "2026-01-05") for i in range(4)],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(i, "BUILDING" if i % 2 == 0 else "MACHINERY") for i in range(4)],
        "c_custkey long, c_mktsegment string",
    ).write.parquet(cpath)
    df = QUERIES["logrank_test"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df,
        _conn_with({"orders": opath, "customer": cpath}),
        ORACLE["logrank_test"],
    )


def test_ucb_single_attempt_hosts(spark, tmp_path):
    # N = 1 total attempt: ln(1) = 0, the bonus vanishes exactly and
    # the score is the bare success rate — no NaN, no negative sqrt
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(53, "t", "en", "s", 1)],  # doc 53 -> host 0
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["ucb_host_selection"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.host == 0 and row.attempts == 1
    assert row.ucb_score == float(row.successes)
    compare(df, _conn_with({"documents": path}), ORACLE["ucb_host_selection"])


def test_bh_no_hits_all_null(spark, tmp_path):
    # value never exceeds 50: the pooled denominator is exactly 0 in
    # every row's test, z/p are NULL in both engines (integer guard
    # BEFORE the division), k falls back to the event_type tiebreak,
    # and nothing is rejected
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(i, 1.0 + i, ["view", "click"][i % 2]) for i in range(8)],
        "event_id long, value double, event_type string",
    ).write.parquet(path)
    df = QUERIES["benjamini_hochberg"](spark, str(tmp_path))
    rows = df.collect()
    assert all(r.z is None and r.p_value is None for r in rows)
    assert all(r.reject is False for r in rows)
    compare(df, _conn_with({"events": path}), ORACLE["benjamini_hochberg"])


def test_bh_constructed_shift_rejects(spark, tmp_path):
    # one type sits entirely above 50, one entirely below, two mixed:
    # BH must reject the extreme types and spare the unshifted ones
    rows = []
    for i in range(40):
        rows.append((len(rows), 90.0, "hot"))
        rows.append((len(rows), 10.0, "cold"))
        rows.append((len(rows), 90.0 if i % 2 == 0 else 10.0, "mid_a"))
        rows.append((len(rows), 90.0 if i % 2 == 1 else 10.0, "mid_b"))
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows, "event_id long, value double, event_type string"
    ).write.parquet(path)
    df = QUERIES["benjamini_hochberg"](spark, str(tmp_path))
    got = {r.event_type: r.reject for r in df.collect()}
    assert got["hot"] is True and got["cold"] is True
    assert got["mid_a"] is False and got["mid_b"] is False
    compare(df, _conn_with({"events": path}), ORACLE["benjamini_hochberg"])


def test_shapley_unobserved_coalitions(spark, tmp_path):
    # only 'click' is ever seen: v is nonzero on exactly one mask, so
    # phi_click = 6*(0.5 - 0)/24 = 0.125 exactly, and every OTHER
    # channel's phi is the pure removal penalty 2*(0 - 0.5)/24
    rows = [
        (1, 1, "click", 0.0), (2, 1, "purchase", 0.0),  # converter
        (3, 2, "click", 0.0),                            # non-converter
    ]
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).write.parquet(path)
    df = QUERIES["shapley_attribution"](spark, str(tmp_path))
    got = {r.channel: r.shapley_value for r in df.collect()}
    assert got["click"] == 0.125
    for other in ("error", "signup", "view"):
        assert got[other] == round(-1 / 24, 6)
    compare(df, _conn_with({"events": path}), ORACLE["shapley_attribution"])


def test_shapley_efficiency_on_full_universe(spark, tmp_path):
    # every coalition observed with v(S) = popcount(S)/4: symmetry
    # forces phi = 0.25 per channel and efficiency gives
    # sum(phi) = v(full) - v(empty) = 1
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    rows = []
    for mask in range(16):
        for k in range(4):  # 4 users per mask, popcount(mask) convert
            uid = mask * 4 + k
            for name, b in bits.items():
                if mask & b:
                    rows.append((len(rows), uid, name, 0.0))
            if k < bin(mask).count("1"):
                rows.append((len(rows), uid, "purchase", 0.0))
            if not mask:  # mask-0 users need SOME row to exist
                rows.append((len(rows), uid, "other", 0.0))
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).write.parquet(path)
    df = QUERIES["shapley_attribution"](spark, str(tmp_path))
    got = {r.channel: r.shapley_value for r in df.collect()}
    assert all(v == 0.25 for v in got.values()), got
    compare(df, _conn_with({"events": path}), ORACLE["shapley_attribution"])


def test_kruskal_wallis_single_group(spark, tmp_path):
    # one priority class: H is identically 0 (the rank sum IS the
    # total), df = 0 falls outside the critical table -> NULL verdict
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "3-MEDIUM") for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["kruskal_wallis"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.m == 1 and row.h == 0.0 and row.significant is None
    compare(df, _conn_with({"orders": path}), ORACLE["kruskal_wallis"])


def test_kruskal_wallis_all_tied(spark, tmp_path):
    # every total identical: the tie correction is exactly 0 and the
    # integer guard sum_t < N^3-N must emit NULL h in BOTH engines
    # without evaluating the division
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0, ["1-URGENT", "5-LOW"][i % 2]) for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["kruskal_wallis"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.tie_term == 6 ** 3 - 6
    assert row.h is None and row.significant is None
    compare(df, _conn_with({"orders": path}), ORACLE["kruskal_wallis"])


def test_fleiss_kappa_unanimous_corpus(spark, tmp_path):
    # every rater says 'en' on every doc: chance agreement is exactly 1
    # and the denominator 2(9N^2 - T1^2 - T0^2) is exactly 0 — kappa
    # must be NULL in both engines (integer guard, never 0/0)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "the the the of and", "en", "s", 18) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["fleiss_kappa_langid"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.votes_en == 12 and row.votes_not_en == 0
    assert row.fleiss_kappa is None
    compare(
        df, _conn_with({"documents": path}), ORACLE["fleiss_kappa_langid"]
    )


def test_fleiss_kappa_perfect_split_agreement(spark, tmp_path):
    # raters agree perfectly on a half-en half-not corpus: kappa = 1
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "the the of and to", "en", "s", 17),
         (1, "zz qq rr ss tt uu vv ww xx yy zz qq rr ss tt uu vv ww xx yy"
             " zz qq rr ss tt uu vv ww xx yy zz qq rr ss", "xx", "s", 50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["fleiss_kappa_langid"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.votes_en == 3 and row.votes_not_en == 3
    assert row.fleiss_kappa == 1.0
    compare(
        df, _conn_with({"documents": path}), ORACLE["fleiss_kappa_langid"]
    )


def test_negative_sampling_single_doc_empty(spark, tmp_path):
    # N = 1: the ring has no other member; the N > 1 gate must emit an
    # EMPTY pair set in both engines (never a mod-0)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "only document here", "en", "s", 18)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["negative_sampling_contrastive"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df,
        _conn_with({"documents": path}),
        ORACLE["negative_sampling_contrastive"],
    )


def test_dedup_savings_all_unique_no_savings(spark, tmp_path):
    # no duplicates at all: every doc survives both tiers and the
    # savings permille is exactly 0
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, f"totally unique document number {i} with words", "en", "s", 40)
         for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["dedup_savings_report"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_docs == row.docs_after_exact == row.docs_after_lsh == 5
    assert row.lsh_savings_permille == 0
    compare(
        df, _conn_with({"documents": path}), ORACLE["dedup_savings_report"]
    )


def test_jain_single_host_perfect_fairness(spark, tmp_path):
    # one host: (sum x)^2 / (1 * sum x^2) = 1 exactly
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(53 * i, "t", "en", "s", 1) for i in range(4)],  # all host 0
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["jains_fairness_index"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_hosts == 1 and row.jain_index == 1.0
    compare(
        df, _conn_with({"documents": path}), ORACLE["jains_fairness_index"]
    )


def test_hash_uniformity_one_key_flags_nothing(spark, tmp_path):
    # a single key concentrates all mass in one bucket, but with N = 1
    # the KS critical value 1.358/sqrt(1) exceeds any possible D —
    # the verdict must be FALSE (the test has no power, not a bug)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(7, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["hash_uniformity_audit"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_keys == 1 and row.nonuniform is False
    compare(
        df, _conn_with({"documents": path}), ORACLE["hash_uniformity_audit"]
    )


def test_postings_gap_single_occurrence_terms(spark, tmp_path):
    # every term occurs in exactly one doc: no term has a second
    # posting, every gap is NULL, and both engines emit an EMPTY frame
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "aaa bbb", "en", "s", 7), (1, "ccc ddd", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["postings_gap_stats"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"documents": path}), ORACLE["postings_gap_stats"]
    )


def test_lognormal_constant_length_sigma_zero(spark, tmp_path):
    # every doc the same length: the two moment terms cancel to a
    # +-1-ulp residual; the greatest(.,0) clamp must keep sigma = 0
    # (not NaN) and fitted median == the one length (up to rounding)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "t", "en", "s", 64) for i in range(5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["doc_length_lognormal_fit"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.sigma == 0.0 and row.sample_median == 64
    assert abs(row.fitted_median - 64.0) < 1e-5
    compare(
        df,
        _conn_with({"documents": path}),
        ORACLE["doc_length_lognormal_fit"],
    )


def test_wilson_small_n_ranks_below_proven(spark, tmp_path):
    # host A: 2/2 perfect but tiny; host B: 90/100 proven.
    # the Wilson LOWER bound must rank B above A (the whole point)
    rows = []
    # host 1 (doc_id % 53 == 1): choose doc_ids where the md5 gate is ok
    import hashlib
    def ok(doc_id):
        h = int(hashlib.md5(f"err:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % 100 >= doc_id % 53
    a_ids = [d for d in range(1, 5000, 53) if ok(d)][:2]         # host 1, 2 ok
    b_pool = [d for d in range(2, 300000, 53)]                    # host 2
    b_ok = [d for d in b_pool if ok(d)][:90]
    b_bad = [d for d in b_pool if not ok(d)][:10]
    for d in a_ids + b_ok + b_bad:
        rows.append((d, "t", "en", "s", 1))
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["wilson_host_ranking"](spark, str(tmp_path))
    got = {r.host: r for r in df.collect()}
    assert got[1].attempts == 2 and got[1].successes == 2
    assert got[2].attempts == 100 and got[2].successes == 90
    assert got[2].rank < got[1].rank  # proven beats perfect-but-tiny
    compare(
        df, _conn_with({"documents": path}), ORACLE["wilson_host_ranking"]
    )


def test_char_entropy_single_char_alphabet(spark, tmp_path):
    # a one-character alphabet must give exactly 0 nats in both
    # engines (ln T - T ln T / T: the same double minus itself)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "aaaa", "zz", "s", 4), (1, "aa", "zz", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["char_entropy_lang"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_distinct_chars == 1 and row.entropy_nats == 0.0
    compare(
        df, _conn_with({"documents": path}), ORACLE["char_entropy_lang"]
    )


def test_lsh_precision_gram_free_corpus(spark, tmp_path):
    # every doc shorter than a trigram: zero candidates; the count
    # guard yields (0, NULL, NULL, NULL) identically in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "one two", "en", "s", 7) for i in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["lsh_candidate_precision"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_candidates == 0 and row.precision_permille is None
    compare(
        df,
        _conn_with({"documents": path}),
        ORACLE["lsh_candidate_precision"],
    )


def test_source_overlap_no_near_dups_empty(spark, tmp_path):
    # no two docs share trigrams: the verified-pair set is empty and
    # the overlap matrix is EMPTY in both engines
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red orange yellow green blue indigo",
    ]
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, t, "en", f"src{i}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["source_overlap_matrix"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"documents": path}), ORACLE["source_overlap_matrix"]
    )


def test_source_overlap_diagonal_internal_dup(spark, tmp_path):
    # two identical docs in ONE source: the diagonal row counts the
    # internal duplication, both covered columns = 2, share = 1000
    path = f"{tmp_path}/documents.parquet"
    t = "the quick brown fox jumps over the lazy dog again"
    spark.createDataFrame(
        [(0, t, "en", "web", 50), (1, t, "en", "web", 50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["source_overlap_matrix"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.src_a == row.src_b == "web" and row.n_pairs == 1
    assert row.docs_a_covered == row.docs_b_covered == 2
    assert row.share_a_permille == 1000
    compare(
        df, _conn_with({"documents": path}), ORACLE["source_overlap_matrix"]
    )


def test_ranker_agreement_single_match(spark, tmp_path):
    # exactly one doc matches the term: n^3 - n = 0, rho undefined ->
    # NULL in both engines (integer guard before the division)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "vector engines ftw", "en", "s", 18),
         (1, "nothing to see", "en", "s", 14)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["ranker_agreement_spearman"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_matched == 1 and row.spearman_rho is None
    compare(
        df,
        _conn_with({"documents": path}),
        ORACLE["ranker_agreement_spearman"],
    )


def test_mutual_nn_singleton_buckets_empty(spark, tmp_path):
    # each vector alone in its sign bucket: no candidates, EMPTY result
    path = f"{tmp_path}/embeddings.parquet"
    spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 0.5], 0), (1, [-1.0, -1.0, -1.0, 0.5], 1)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(path)
    df = QUERIES["mutual_nn_pairs"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"embeddings": path}), ORACLE["mutual_nn_pairs"]
    )


def test_mutual_nn_reciprocal_pair_found(spark, tmp_path):
    # three vectors in one bucket: a and b are near-identical, c is
    # off-axis; (a, b) must be mutual, c's one-sided pick must NOT emit
    path = f"{tmp_path}/embeddings.parquet"
    spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 0.0], 0),
         (1, [1.0, 1.0, 1.0, 0.05], 0),
         (2, [1.0, 1.0, 1.0, 5.0], 0)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(path)
    df = QUERIES["mutual_nn_pairs"](spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1
    assert (rows[0].vec_a, rows[0].vec_b) == (0, 1)
    compare(
        df, _conn_with({"embeddings": path}), ORACLE["mutual_nn_pairs"]
    )


def test_join_cardinality_uniform_keys_ratio_1000(spark, tmp_path):
    # perfectly uniform keys: the uniformity assumption is EXACT and
    # the audit ratio is exactly 1000 permille
    import datetime
    base = datetime.datetime(2026, 3, 1)
    rows = [(i, base, i % 4, "view", 1.0, "{}") for i in range(16)]
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["join_cardinality_audit"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_rows == 16 and row.n_keys == 4
    assert row.exact_join_rows == row.uniform_estimate == 64
    assert row.ratio_permille == 1000
    compare(
        df, _conn_with({"events": path}), ORACLE["join_cardinality_audit"]
    )


def test_cliffs_delta_empty_group_null(spark, tmp_path):
    # no urgent orders: n1*n0 = 0 -> delta NULL, magnitude NULL
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "5-LOW") for i in range(4)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["cliffs_delta"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 0 and row.delta is None and row.magnitude is None
    compare(df, _conn_with({"orders": path}), ORACLE["cliffs_delta"])


def test_cliffs_delta_total_separation_large(spark, tmp_path):
    # every urgent total above every low total: delta = +1, 'large';
    # ties contribute to neither side (Cliff convention)
    path = f"{tmp_path}/orders.parquet"
    rows = [(i, 100.0 + i, "5-LOW") for i in range(3)] + [
        (10 + i, 900.0 + i, "1-URGENT") for i in range(3)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["cliffs_delta"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.delta == 1.0 and row.magnitude == "large"
    assert row.wins == 9 and row.losses == 0
    compare(df, _conn_with({"orders": path}), ORACLE["cliffs_delta"])


def test_cochran_armitage_single_hour_null(spark, tmp_path):
    # all events in one hour: N*Sw2n - (Swn)^2 = 0 -> verdict NULL in
    # both engines (no trend is even definable)
    import datetime
    base = datetime.datetime(2026, 3, 1, 9, 30, 0)
    rows = [(i, base, i, "purchase" if i % 2 else "view", 1.0, "{}")
            for i in range(6)]
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["cochran_armitage_trend"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.t_den == 0.0 and row.significant is None
    compare(
        df, _conn_with({"events": path}), ORACLE["cochran_armitage_trend"]
    )


def test_negative_binomial_poisson_slice_null_r(spark, tmp_path):
    # every user has EXACTLY one 'view' event: var = 0 < mean, the
    # overdispersion gate is false and nb_r must be NULL (nb_p too:
    # var = 0); the zero-densify is exercised by the 'click' type
    # (one active user among three)
    import datetime
    base = datetime.datetime(2026, 3, 1)
    rows = [(i, base, i, "view", 1.0, "{}") for i in range(3)]
    rows.append((10, base, 0, "click", 1.0, "{}"))
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["negative_binomial_fit"](spark, str(tmp_path))
    got = {r.event_type: r for r in df.collect()}
    assert got["view"].overdispersed is False and got["view"].nb_r is None
    assert got["view"].nb_p is None  # var exactly 0
    assert got["click"].n_users == 3 and got["click"].n_events == 1
    compare(
        df, _conn_with({"events": path}), ORACLE["negative_binomial_fit"]
    )


def test_hill_small_corpus_empty(spark, tmp_path):
    # n <= k+1: the 101st order statistic doesn't exist; both engines
    # emit an EMPTY frame (never a partial-k estimate)
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "5-LOW") for i in range(50)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["hill_tail_index"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"orders": path}), ORACLE["hill_tail_index"])


def test_hill_tied_top_null_alpha(spark, tmp_path):
    # 150 identical totals: every log ratio is exactly 0, the sum is
    # 0, and alpha must be NULL (not inf) in both engines
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 500.0, "5-LOW") for i in range(150)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["hill_tail_index"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.threshold_cents == 50000 and row.hill_alpha is None
    compare(df, _conn_with({"orders": path}), ORACLE["hill_tail_index"])


def test_sessionization_sensitivity_singleton_users(spark, tmp_path):
    # every user has exactly one event: zero gaps, and the session
    # count must equal the user count at EVERY threshold (the scalar
    # agg keeps its one row on an empty gap frame)
    import datetime
    base = datetime.datetime(2026, 3, 1, 9, 0, 0)
    rows = [(i, base, i, "view", 1.0, "{}") for i in range(5)]
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["sessionization_timeout_sensitivity"](spark, str(tmp_path))
    rows_out = df.collect()
    assert len(rows_out) == 3
    assert all(r.n_breaks == 0 and r.n_sessions == 5 for r in rows_out)
    compare(
        df,
        _conn_with({"events": path}),
        ORACLE["sessionization_timeout_sensitivity"],
    )


def test_eb_shrinkage_single_host_null(spark, tmp_path):
    # one host: no between-host variance exists, the beta prior is
    # undefined, shrunk_rate NULL while raw_rate still reports
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(53 * i, "t", "en", "s", 1) for i in range(6)],  # all host 0
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["eb_shrunk_host_rates"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.host == 0 and row.raw_rate is not None
    assert row.shrunk_rate is None
    compare(
        df, _conn_with({"documents": path}), ORACLE["eb_shrunk_host_rates"]
    )


def test_heaps_single_doc_null_fit(spark, tmp_path):
    # one document: the only surviving decile point makes all T_p
    # equal, the OLS denominator is 0 -> beta/k_est NULL in both
    # engines, the surviving point still reported
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(7, "alpha beta gamma delta", "en", "s", 22)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["heaps_law_fit"](spark, str(tmp_path))
    rows = df.collect()
    # deciles with floor(p*N/10) = 0 have no rank cutoff and drop out:
    # with N = 1 only decile 10 survives — in BOTH engines
    assert len(rows) == 1 and rows[0].decile == 10
    assert all(r.beta is None and r.k_est is None for r in rows)
    assert all(r.t_tokens == 4 and r.v_vocab == 4 for r in rows)
    compare(df, _conn_with({"documents": path}), ORACLE["heaps_law_fit"])


def test_ljung_box_short_series_null_q(spark, tmp_path):
    # 5 distinct days: lags 5..7 have no pairs at all (missing rows),
    # so the 7-lag portmanteau must be NULL — never a partial-sum Q
    import datetime
    rows = []
    for day in range(5):
        for j in range(3 + day):
            rows.append(
                (len(rows),
                 datetime.datetime(2026, 3, 1 + day, 8 + j),
                 j, "view", 1.0, "{}")
            )
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["ljung_box_portmanteau"](spark, str(tmp_path))
    out = df.collect()
    assert all(r.q_stat is None and r.significant is None for r in out)
    assert len(out) < 7  # the missing lags ARE the reason
    compare(
        df, _conn_with({"events": path}), ORACLE["ljung_box_portmanteau"]
    )


def test_skyline_exact_duplicates_both_survive(spark, tmp_path):
    # two parts identical on (price, size): neither dominates the
    # other (no strict edge), BOTH are on the front; a strictly worse
    # part is out; a cheaper-but-smaller part stays (incomparable)
    path = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [
            (1, "B1", 10.00, 20),
            (2, "B1", 10.00, 20),   # exact duplicate of 1
            (3, "B1", 10.00, 15),   # dominated (same price, smaller)
            (4, "B1", 12.00, 18),   # dominated by 1 (pricier, smaller)
            (5, "B1", 8.00, 10),    # survives: cheaper, incomparable
        ],
        "p_partkey long, p_brand string, p_retailprice double, p_size int",
    ).write.parquet(path)
    df = QUERIES["skyline_parts"](spark, str(tmp_path))
    keys = sorted(r.p_partkey for r in df.collect())
    assert keys == [1, 2, 5]
    compare(df, _conn_with({"part": path}), ORACLE["skyline_parts"])


def test_skyline_single_part_survives(spark, tmp_path):
    path = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [(9, "B2", 5.00, 1)],
        "p_partkey long, p_brand string, p_retailprice double, p_size int",
    ).write.parquet(path)
    df = QUERIES["skyline_parts"](spark, str(tmp_path))
    assert df.count() == 1
    compare(df, _conn_with({"part": path}), ORACLE["skyline_parts"])


def test_sequence_pattern_constructed_paths(spark, tmp_path):
    # hand-built sequences with KNOWN matches per pattern, including a
    # same-timestamp pair broken by event_id (the deterministic-order
    # law) whose order decides the 'direct_purchase' verdict
    import datetime
    t0 = datetime.datetime(2026, 3, 1, 9, 0, 0)
    dt = datetime.timedelta(minutes=1)
    rows = [
        # user 0: p first (same ts as the view — event_id orders p first)
        (0, t0, 0, "purchase", 1.0, "{}"),
        (1, t0, 0, "view", 1.0, "{}"),
        # user 1: v ... p (with an error before the purchase)
        (2, t0, 1, "view", 1.0, "{}"),
        (3, t0 + dt, 1, "error", 1.0, "{}"),
        (4, t0 + 2 * dt, 1, "purchase", 1.0, "{}"),
        # user 2: clicks only
        (5, t0, 2, "click", 1.0, "{}"),
        (6, t0 + dt, 2, "click", 1.0, "{}"),
    ]
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["sequence_pattern_match"](spark, str(tmp_path))
    got = {r.pattern: (r.n_users, r.share_permille) for r in df.collect()}
    assert got["direct_purchase"] == (1, 333)      # user 0 only
    assert got["view_to_purchase"] == (1, 333)     # user 1 only
    assert got["error_before_purchase"] == (1, 333)
    assert got["never_purchased"] == (1, 333)      # user 2
    compare(
        df, _conn_with({"events": path}), ORACLE["sequence_pattern_match"]
    )


def test_abc_xyz_zero_demand_and_constant_demand(spark, tmp_path):
    # part 1 ships every month with IDENTICAL quantity -> CV = 0 -> X;
    # part 2 ships once in 3 months (lumpy) -> CV^2 = 2 > 1 -> Z.
    # ABC note: with one part carrying ~all revenue its OWN cumulative
    # already exceeds the 95% cut, so the abc_classification law
    # (reused verbatim) files BOTH parts under C — the pin asserts
    # that boundary convention rather than an intuitive 'A'
    import datetime
    rows = []
    # 40-day spacing guarantees three DISTINCT 30-day epoch buckets
    d0 = datetime.datetime(2026, 1, 10)
    dates = [d0 + datetime.timedelta(days=40 * m) for m in range(3)]
    for d in dates:
        rows.append((1, d, 10.0, 5000.0))
    # part 2 ships once, ON one of part 1's dates (no extra bucket)
    rows.append((2, dates[1], 5.0, 10.0))
    path = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        rows,
        "l_partkey long, l_shipdate timestamp_ntz, l_quantity double,"
        " l_extendedprice double",
    ).write.parquet(path)
    df = QUERIES["abc_xyz_matrix"](spark, str(tmp_path))
    got = {(r.abc_class, r.xyz_class): r.n_parts for r in df.collect()}
    assert got == {("C", "X"): 1, ("C", "Z"): 1}
    compare(df, _conn_with({"lineitem": path}), ORACLE["abc_xyz_matrix"])


def test_power_calc_saturated_baseline_null(spark, tmp_path):
    # every purchase is high-value: p_base = 1.0, p2 > 1 for every
    # delta, all rows guarded NULL (no such experiment exists)
    import datetime
    base = datetime.datetime(2026, 3, 1)
    rows = [(i, base, i, "purchase", 90.0, "{}") for i in range(5)]
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(path)
    df = QUERIES["sample_size_power_calc"](spark, str(tmp_path))
    rows_out = df.collect()
    assert all(r.p_base == 1.0 and r.n_per_arm is None for r in rows_out)
    compare(
        df, _conn_with({"events": path}), ORACLE["sample_size_power_calc"]
    )


def test_welch_empty_and_zero_variance_cohorts(spark, tmp_path):
    # all-low-priority: n1 = 0 fails the n1 > 1 guard -> NULL z2 in
    # both engines (mean1 also NULL via its own n1 > 0 guard)
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0, "5-LOW") for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["welch_mean_ztest"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 0 and row.n2 == 6
    assert row.mean1_cents is None and row.z2 is None
    assert row.significant is None
    compare(df, _conn_with({"orders": path}), ORACLE["welch_mean_ztest"])


def test_welch_both_cohorts_constant(spark, tmp_path):
    # both cohorts present but EACH is constant: both variance
    # numerators are exactly 0, se^2 would be 0/x + 0/x = 0 and
    # diff^2/0 diverges between engines -> the integer guard must
    # yield NULL even though the means differ
    path = f"{tmp_path}/orders.parquet"
    rows = [(i, 100.0, "1-URGENT") for i in range(3)] + [
        (10 + i, 200.0, "5-LOW") for i in range(3)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["welch_mean_ztest"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 3 and row.n2 == 3
    assert row.mean1_cents == 10000.0 and row.mean2_cents == 20000.0
    assert row.z2 is None and row.significant is None
    compare(df, _conn_with({"orders": path}), ORACLE["welch_mean_ztest"])


def test_g_test_single_row_table(spark, tmp_path):
    # one event type only: df = (1-1)*(n_cols-1) = 0 -> crit/verdict
    # NULL; G itself is exactly 0 (each cell's term is
    # obs*ln(obs*N/(N*obs)) = obs*ln(1) = 0) in both engines
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [
            (i, f"2026-01-0{1 + i % 3} 00:00:00", 1, "click", 1.0, "{}")
            for i in range(6)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP_NTZ) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(path)
    df = QUERIES["g_test_independence"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.df == 0
    assert row.g_stat == 0.0
    assert row.crit_95 is None and row.significant is None
    compare(df, _conn_with({"events": path}), ORACLE["g_test_independence"])


def test_ols_collinear_regressors(spark, tmp_path):
    # every order has exactly one lineitem with quantity 1: x1 == x2
    # for all rows, the normal matrix is singular, det = 0.0 exactly
    # in both engines -> all coefficients and r2 NULL, never a
    # divide-by-zero discrepancy
    opath = f"{tmp_path}/orders.parquet"
    lpath = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        [(i, 100.0 + 7 * i) for i in range(5)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(i, 1.0) for i in range(5)],
        "l_orderkey long, l_quantity double",
    ).write.parquet(lpath)
    df = QUERIES["ols_two_factor"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_orders == 5
    assert row.b0 is None and row.b1 is None and row.b2 is None
    assert row.r2 is None
    compare(
        df,
        _conn_with({"orders": opath, "lineitem": lpath}),
        ORACLE["ols_two_factor"],
    )


def test_interval_union_nested_and_tied_starts(spark, tmp_path):
    # user 1: [0,100] contains [10,20], and [30,200] overlaps the
    # FIRST interval's end, not the lag row's -> cummax (not lag)
    # must merge all three into ONE island, covered = 200
    # user 2: [0,5] then two TIED starts [10,30] and [10,12] -- the
    # single-total-order fix's scenario: both tied rows must land in
    # the SAME island (2 islands, covered 5 + 20 = 25); the pre-review
    # mixed-order form filed [10,12] into the [0,5] island (covered 32)
    path = f"{tmp_path}/events.parquet"
    rows = [
        (1, 0.0, 100.0),
        (2, 10.0, 10.0),
        (3, 30.0, 170.0),
    ]
    rows2 = [(11, 0.0, 5.0), (12, 10.0, 20.0), (13, 10.0, 2.0)]
    data = [
        (eid, f"2026-01-01 00:00:{int(s):02d}", 1, "click", dur, "{}")
        for eid, s, dur in rows
    ] + [
        (eid, f"2026-01-01 00:00:{int(s):02d}", 2, "click", dur, "{}")
        for eid, s, dur in rows2
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP_NTZ) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(path)
    df = QUERIES["interval_union_coverage"](spark, str(tmp_path))
    got = {r.user_id: (r.n_islands, r.covered_ms, r.span_ms) for r in df.collect()}
    assert got[1] == (1, 200_000, 200_000)
    assert got[2] == (2, 25_000, 30_000)
    compare(
        df,
        _conn_with({"events": path}),
        ORACLE["interval_union_coverage"],
    )


def test_scc_and_bowtie_three_node_graph(spark, tmp_path):
    # doc_ids {0,1,2} under the generator edge law produce edges
    # 0->1, 1->0, 2->1: SCCs {0,1} and {2}, and 2 reaches the core
    # without being reached -> a genuinely multi-class bowtie (the
    # real corpus's two components are disconnected, so 'in' is
    # reachable only through this pin)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame([(0,), (1,), (2,)], "doc_id long").write.parquet(
        path
    )
    scc = QUERIES["scc_page_graph"](spark, str(tmp_path))
    got = sorted(map(tuple, scc.collect()))
    assert got == [(1, 1, 2), (2, 1, 0)]
    compare(scc, _conn_with({"documents": path}), ORACLE["scc_page_graph"])

    bow = QUERIES["bowtie_decomposition"](spark, str(tmp_path))
    gotb = sorted(map(tuple, bow.collect()))
    assert gotb == [("core", 2), ("in", 1)]
    compare(
        bow, _conn_with({"documents": path}), ORACLE["bowtie_decomposition"]
    )

    # condensation: the single cross-SCC bridge 2->1 folds to one DAG
    # edge (scc 2 -> scc 0, multiplicity 1); on the REAL corpus the
    # condensation is empty (the two components are disconnected), so
    # this pin is the only nonempty exercise of the edge fold
    dag = QUERIES["scc_condensation_dag"](spark, str(tmp_path))
    assert sorted(map(tuple, dag.collect())) == [(2, 0, 1)]
    compare(
        dag, _conn_with({"documents": path}), ORACLE["scc_condensation_dag"]
    )


def test_scc_single_node_no_edges(spark, tmp_path):
    # n=1: every generated edge is a filtered self-loop; the SCC set
    # is one singleton and the bowtie is all core (the largest -- and
    # only -- SCC), with both reachability propagations converging on
    # an empty edge frame in one round
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame([(0,)], "doc_id long").write.parquet(path)
    scc = QUERIES["scc_page_graph"](spark, str(tmp_path))
    assert sorted(map(tuple, scc.collect())) == [(1, 1, 0)]
    compare(scc, _conn_with({"documents": path}), ORACLE["scc_page_graph"])
    bow = QUERIES["bowtie_decomposition"](spark, str(tmp_path))
    assert sorted(map(tuple, bow.collect())) == [("core", 1)]
    compare(
        bow, _conn_with({"documents": path}), ORACLE["bowtie_decomposition"]
    )


def test_wl_fingerprint_tiny_graphs(spark, tmp_path):
    # 3-node graph: node 0 emits a DOUBLE edge to 1 (both generator
    # laws land on 1), so the multiset fold must keep duplicates;
    # node 2 has out-degree 1 into the {0,1} cycle. All three end in
    # distinct WL colors. Single-node graph: no edges -> the empty
    # neighbor-list coalesce('') path, one color.
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame([(0,), (1,), (2,)], "doc_id long").write.parquet(
        path
    )
    df = QUERIES["wl_graph_fingerprint"](spark, str(tmp_path))
    rows = df.collect()
    assert sorted(r.n_nodes for r in rows) == [1, 1, 1]
    assert len({r.wl_color for r in rows}) == 3
    compare(
        df, _conn_with({"documents": path}), ORACLE["wl_graph_fingerprint"]
    )

    path1 = f"{tmp_path}/solo/documents.parquet"
    spark.createDataFrame([(0,)], "doc_id long").write.parquet(path1)
    df1 = QUERIES["wl_graph_fingerprint"](spark, f"{tmp_path}/solo")
    assert [r.n_nodes for r in df1.collect()] == [1]
    compare(
        df1,
        _conn_with({"documents": path1}),
        ORACLE["wl_graph_fingerprint"],
    )


def test_did_single_day_and_constant_values(spark, tmp_path):
    # single-day corpus: mid = day, every event lands post=1, the two
    # pre cells are absent -> estimate and verdict NULL in both
    # engines (counts for missing cells are NULL too: the pivot is a
    # conditional max, not a coalesced sum)
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [
            (i, "2026-01-01 10:00:00", i, "click", 5.0, "{}")
            for i in range(8)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP_NTZ) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(path)
    df = QUERIES["difference_in_differences"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n00 is None and row.n10 is None
    assert row.n01 == 4 and row.n11 == 4
    assert row.did_cents is None and row.z2 is None
    compare(
        df,
        _conn_with({"events": path}),
        ORACLE["difference_in_differences"],
    )

    # two days, constant value everywhere: all four cells populated
    # (did = 0.0 exactly) but every variance numerator is exactly 0,
    # so z2/verdict are NULL while the estimate reports
    path2 = f"{tmp_path}/flat/events.parquet"
    spark.createDataFrame(
        [
            (i, f"2026-01-0{1 + i // 4} 10:00:00", i % 4, "click", 5.0, "{}")
            for i in range(8)
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP_NTZ) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).write.parquet(path2)
    df2 = QUERIES["difference_in_differences"](spark, f"{tmp_path}/flat")
    row2 = df2.collect()[0]
    assert (row2.n00, row2.n01, row2.n10, row2.n11) == (2, 2, 2, 2)
    assert row2.did_cents == 0.0
    assert row2.z2 is None and row2.significant is None
    compare(
        df2,
        _conn_with({"events": path2}),
        ORACLE["difference_in_differences"],
    )


def test_markov_stationary_no_transitions(spark, tmp_path):
    # one event per user: no successor pairs, every state is dangling
    # and keeps its own (uniform) mass through all 6 iterations
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [
            (i, i, t, base + datetime.timedelta(days=i))
            for i, t in enumerate(["click", "view", "buy"])
        ],
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["markov_stationary_power"](spark, str(tmp_path))
    rows = {r.state: r.pi_scaled for r in df.collect()}
    assert rows == {
        "click": 1_000_000_000_000 // 3,
        "view": 1_000_000_000_000 // 3,
        "buy": 1_000_000_000_000 // 3,
    }
    compare(df, _conn_with({"events": path}), ORACLE["markov_stationary_power"])


def test_markov_stationary_absorbing_chain(spark, tmp_path):
    # A -> B once, B absorbing (dangling keeps its mass): after one
    # step ALL of A's mass is in B; mass is conserved exactly
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [
            (0, 0, "a", base),
            (1, 0, "b", base + datetime.timedelta(hours=1)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["markov_stationary_power"](spark, str(tmp_path))
    rows = {r.state: r.pi_scaled for r in df.collect()}
    assert rows["a"] == 0
    assert rows["b"] == 1_000_000_000_000  # 2 * (10^12 // 2)
    compare(df, _conn_with({"events": path}), ORACLE["markov_stationary_power"])


def test_source_modularity_two_docs(spark, tmp_path):
    # 2 docs, one undirected edge (0,1): same source -> e_c=1, d_c=2,
    # q = (4*1*1 - 4)/4 = 0 exactly (a single within-community edge
    # is exactly what degree chance predicts at m=1)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "web"), (1, "web")], "doc_id long, source string"
    ).write.parquet(path)
    df = QUERIES["source_modularity"](spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].within_edges == 1 and rows[0].degree_sum == 2
    assert rows[0].q_contrib == 0.0
    compare(df, _conn_with({"documents": path}), ORACLE["source_modularity"])


def test_jarque_bera_constant_slice(spark, tmp_path):
    # constant value within a type: variance witness n*s2 - s1^2 == 0,
    # skew/kurtosis/jb NULL in both engines; a small varying type with
    # n <= 3 is also guarded (moments need n > 3)
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [(i, "flat", 5.0, base) for i in range(6)] + [
        (10 + i, "tiny", float(i), base) for i in range(3)
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["jarque_bera_normality"](spark, str(tmp_path))
    got = {r.event_type: r for r in df.collect()}
    assert got["flat"].n == 6 and got["flat"].jb is None
    assert got["tiny"].n == 3 and got["tiny"].jb is None
    compare(df, _conn_with({"events": path}), ORACLE["jarque_bera_normality"])


def test_levene_all_constant_groups(spark, tmp_path):
    # every group constant: all within-group deviations are exactly 0,
    # any_var = 0 and W is NULL in both engines (0/0 never evaluated)
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0, "1-URGENT" if i % 2 else "5-LOW") for i in range(8)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["levene_test"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 8 and row.k == 2
    assert row.w is None and row.heteroscedastic is None
    compare(df, _conn_with({"orders": path}), ORACLE["levene_test"])


def test_levene_single_group(spark, tmp_path):
    # k = 1: between-group df is 0, W undefined -> NULL in both engines
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "5-LOW") for i in range(5)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["levene_test"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.k == 1 and row.w is None
    compare(df, _conn_with({"orders": path}), ORACLE["levene_test"])


def test_durbin_watson_single_day(spark, tmp_path):
    # all orders on one day: n = 1, the trend determinant D = 0 and
    # DW is NULL in both engines
    import datetime

    path = f"{tmp_path}/orders.parquet"
    day = datetime.datetime(2026, 3, 1)
    spark.createDataFrame(
        [(i, day) for i in range(4)],
        "o_orderkey long, o_orderdate timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["durbin_watson_orders"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 1 and row.dw is None
    compare(df, _conn_with({"orders": path}), ORACLE["durbin_watson_orders"])


def test_durbin_watson_perfect_trend(spark, tmp_path):
    # daily counts exactly linear (1,2,3,4 orders/day): every residual
    # is exactly 0, ss = 0 and DW is NULL in both engines (not 0/0)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    rows = []
    k = 0
    for d in range(4):
        for _ in range(d + 1):
            rows.append((k, base + datetime.timedelta(days=d)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["durbin_watson_orders"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 4 and row.dw is None
    compare(df, _conn_with({"orders": path}), ORACLE["durbin_watson_orders"])


def test_decision_stump_single_value(spark, tmp_path):
    # one distinct feature value: no candidate split (the only
    # cumulative row has an empty right side) -> 0 rows, both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, 100, "en" if i % 2 else "fr") for i in range(6)],
        "doc_id long, n_chars long, lang string",
    ).write.parquet(path)
    df = QUERIES["decision_stump_train"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"documents": path}), ORACLE["decision_stump_train"])


def test_decision_stump_perfect_split(spark, tmp_path):
    # short docs all 'fr', long docs all 'en': the optimal threshold
    # separates them perfectly and both child nodes are pure
    path = f"{tmp_path}/documents.parquet"
    rows = [(i, 10 + i, "fr") for i in range(4)] + [
        (10 + i, 100 + i, "en") for i in range(4)
    ]
    spark.createDataFrame(
        rows, "doc_id long, n_chars long, lang string"
    ).write.parquet(path)
    df = QUERIES["decision_stump_train"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.threshold == 13 and row.gini_split == 0.0
    assert row.pos_left == 0 and row.pos_right == 4
    compare(df, _conn_with({"documents": path}), ORACLE["decision_stump_train"])


def test_pettitt_constant_series(spark, tmp_path):
    # constant daily counts: every doubled midrank equals n+1, so
    # U_t = 0 for all t -> K = 0, earliest day, not significant
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    rows = [
        (3 * d + j, base + datetime.timedelta(days=d))
        for d in range(5)
        for j in range(3)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["pettitt_changepoint"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 5 and row.k_stat == 0
    assert row.change_day == base and row.significant is False
    compare(df, _conn_with({"orders": path}), ORACLE["pettitt_changepoint"])


def test_pettitt_step_series(spark, tmp_path):
    # a clean step (1,1,1 -> 5,5,5): |U| peaks exactly at the last
    # pre-step day (t=3: all 9 cross pairs negative -> U_3 = -9,
    # K = 9)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    rows = []
    k = 0
    for d in range(6):
        for _ in range(1 if d < 3 else 5):
            rows.append((k, base + datetime.timedelta(days=d)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["pettitt_changepoint"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 6
    assert row.change_day == base + datetime.timedelta(days=2)
    assert row.k_stat == 9
    compare(df, _conn_with({"orders": path}), ORACLE["pettitt_changepoint"])


def test_kendall_tau_single_match(spark, tmp_path):
    # one matching doc: k = 1, no pairs -> counts coalesce to 0 and
    # tau is NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "vector search"), (1, "plain text"), (2, "other words")],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["kendall_tau_topk"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.k == 1 and row.concordant == 0 and row.discordant == 0
    assert row.kendall_tau is None
    compare(df, _conn_with({"documents": path}), ORACLE["kendall_tau_topk"])


def test_kendall_tau_identical_rankings(spark, tmp_path):
    # two matched docs with different tf: BM25 and TF-IDF order them
    # the same way -> C=1, D=0, tau = 1 exactly
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [
            (0, "vector vector vector search"),
            (1, "vector text here now"),
            (2, "other words entirely filler"),
        ],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["kendall_tau_topk"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.k == 2 and row.kendall_tau == 1.0
    compare(df, _conn_with({"documents": path}), ORACLE["kendall_tau_topk"])


def test_gumbel_identical_daily_maxima(spark, tmp_path):
    # same max every day: variance witness n*s2 - s1^2 == 0, the fit
    # is NULL in both engines
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    rows = [
        (2 * d + j, 100.0 + j, base + datetime.timedelta(days=d))
        for d in range(4)
        for j in range(2)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["gumbel_daily_max"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 4 and row.max_cents == 10100
    assert row.mu_cents is None and row.p_next_day_exceeds_max is None
    compare(df, _conn_with({"orders": path}), ORACLE["gumbel_daily_max"])


def test_lambda_single_type(spark, tmp_path):
    # one event type: the modal row IS the whole table, n - max_row = 0
    # and lambda is NULL in both engines
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, "click", base + datetime.timedelta(days=i)) for i in range(6)],
        "event_id long, event_type string, ts timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["goodman_kruskal_lambda"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 6 and row.max_row == 6
    assert row.lambda_type_given_dow is None
    compare(df, _conn_with({"events": path}), ORACLE["goodman_kruskal_lambda"])


def test_lambda_perfect_predictor(spark, tmp_path):
    # each weekday maps to exactly one type: per-column maxima sum to
    # n, lambda = (n - max_row)/(n - max_row) = 1 exactly
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 2, 12, 0, 0)  # a Monday
    rows = []
    for d in range(4):
        for j in range(3):
            rows.append(
                (3 * d + j, f"type{d}", base + datetime.timedelta(days=d))
            )
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["goodman_kruskal_lambda"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 12 and row.sum_colmax == 12
    assert row.lambda_type_given_dow == 1.0
    compare(df, _conn_with({"events": path}), ORACLE["goodman_kruskal_lambda"])


def test_yule_k_all_distinct_tokens(spark, tmp_path):
    # every token unique: Sum(c^2) == N so K = 0 exactly (no repeats)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "en", "alpha beta gamma"), (1, "en", "delta epsilon zeta")],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    df = QUERIES["yule_k_richness"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_tokens == 6 and row.n_vocab == 6 and row.yule_k == 0.0
    compare(df, _conn_with({"documents": path}), ORACLE["yule_k_richness"])


def test_correlation_matrix_constant_feature(spark, tmp_path):
    # every order has exactly 1 lineitem with qty 7: the x1 and x2
    # variance witnesses are 0, so every pair touching them is NULL
    # while price~... pairs involving only y would need variance too
    opath = f"{tmp_path}/orders.parquet"
    lpath = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i) for i in range(5)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(i, 7.0) for i in range(5)],
        "l_orderkey long, l_quantity double",
    ).write.parquet(lpath)
    df = QUERIES["feature_correlation_matrix"](spark, str(tmp_path))
    got = {r.pair: r.r for r in df.collect()}
    assert got == {"price~lines": None, "price~qty": None, "lines~qty": None}
    compare(
        df,
        _conn_with({"orders": opath, "lineitem": lpath}),
        ORACLE["feature_correlation_matrix"],
    )


def test_hurst_short_series(spark, tmp_path):
    # 8 days: every scale candidate n//denom is < 4 except n//2 = 4,
    # leaving ONE scale point -> m = 1 < 2 and H is NULL in both
    # engines (slope needs two scales)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    rows = []
    k = 0
    for d in range(8):
        for _ in range((d % 3) + 1):
            rows.append((k, base + datetime.timedelta(days=d)))
            k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["hurst_exponent"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 8 and row.n_scales == 1
    assert row.hurst is None and row.persistent is None
    compare(df, _conn_with({"orders": path}), ORACLE["hurst_exponent"])


def test_entropy_rate_deterministic_chain(spark, tmp_path):
    # a -> b -> a -> b ... : every transition is deterministic, every
    # per-state H is exactly 0, so the rate is exactly 0 bits/step
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (i, 0, "a" if i % 2 == 0 else "b", base + datetime.timedelta(hours=i))
        for i in range(8)
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["markov_entropy_rate"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_states == 2 and row.entropy_rate_bits == 0.0
    compare(df, _conn_with({"events": path}), ORACLE["markov_entropy_rate"])


def test_entropy_rate_no_transitions(spark, tmp_path):
    # one event per user: no successor pairs anywhere; every state is
    # dangling (H = 0 by the absorbing convention) -> rate exactly 0
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    spark.createDataFrame(
        [(i, i, t, base) for i, t in enumerate(["x", "y", "z"])],
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["markov_entropy_rate"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_states == 3 and row.entropy_rate_bits == 0.0
    compare(df, _conn_with({"events": path}), ORACLE["markov_entropy_rate"])


def test_anisotropy_odd_tail_vector(spark, tmp_path):
    # 5 vectors: ranks pair (1,2) and (3,4); rank 5 has no partner and
    # is dropped -> exactly 2 pairs in both engines; identical vectors
    # in a pair give cosine exactly 1
    path = f"{tmp_path}/embeddings.parquet"
    spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.0, 1.0]),
            (4, [1.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    ).write.parquet(path)
    df = QUERIES["embedding_anisotropy"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_pairs == 2 and row.mean_cosine == 1.0
    assert row.anisotropic is True
    compare(df, _conn_with({"embeddings": path}), ORACLE["embedding_anisotropy"])


def test_bloom_fpp_tiny_filter(spark, tmp_path):
    # 4 members in a 65536-bit filter: expected fpp ~ (1-e^-0.000244)^4
    # ~ 3.5e-15 — observed false positives must be 0 and the rates
    # must agree between engines exactly (same md5 position law)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i,) for i in range(4)], "doc_id long"
    ).write.parquet(path)
    df = QUERIES["bloom_fpp_audit"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_members == 4 and row.observed_fp == 0
    assert row.bits_set <= 16
    compare(df, _conn_with({"documents": path}), ORACLE["bloom_fpp_audit"])


def test_hash_collision_no_collisions(spark, tmp_path):
    # distinct small ids: the 60-bit keyspace cannot collide at n=6;
    # unique_keyspace TRUE, expectation ~ 6.5e-18
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    ).write.parquet(path)
    df = QUERIES["hash_collision_audit"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 6 and row.n_distinct == 6
    assert row.colliding_pairs == 0 and row.unique_keyspace is True
    compare(df, _conn_with({"documents": path}), ORACLE["hash_collision_audit"])


def test_degree_powerlaw_empty_graph(spark, tmp_path):
    # a single document: both 2-out generator edges are self-loops and
    # are dropped, the link graph is EMPTY, no in-degree reaches
    # dmin=2 -> zero eligible rows and an empty result in BOTH engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "web")], "doc_id long, source string"
    ).write.parquet(path)
    df = QUERIES["degree_powerlaw_mle"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"documents": path}), ORACLE["degree_powerlaw_mle"])


def test_degree_powerlaw_two_docs_tail(spark, tmp_path):
    # 2 docs: both generator edges land on dst=1 (in-degree exactly
    # dmin=2), the tail is the single degree d=2 and
    # alpha = 1 + 1/ln(2/1.5) exactly
    import math

    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "web"), (1, "web")], "doc_id long, source string"
    ).write.parquet(path)
    df = QUERIES["degree_powerlaw_mle"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_tail == 1
    assert row.alpha_hat == round(1 + 1 / math.log(2 / 1.5), 6)
    compare(df, _conn_with({"documents": path}), ORACLE["degree_powerlaw_mle"])


def test_simhash_precision_identical_docs(spark, tmp_path):
    # three identical docs + one unrelated: the identical trio shares
    # a simhash (Hamming 0, Jaccard 1) -> 3 close pairs all verified,
    # precision exactly 1000 permille
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [
            (0, "spark window join scan"),
            (1, "spark window join scan"),
            (2, "spark window join scan"),
            (3, "entirely different words here altogether now"),
        ],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["simhash_precision"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_close >= 3 and row.n_verified >= 3
    assert row.precision_permille is not None
    compare(df, _conn_with({"documents": path}), ORACLE["simhash_precision"])


def test_eta_squared_constant_series(spark, tmp_path):
    # identical daily counts: the total-variance witness is exactly 0
    # and eta^2 is NULL in both engines (nothing to explain)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    rows = [
        (2 * d + j, base + datetime.timedelta(days=d))
        for d in range(7)
        for j in range(2)
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["eta_squared_dow"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_days == 7
    assert row.eta_squared is None and row.strong_seasonality is None
    compare(df, _conn_with({"orders": path}), ORACLE["eta_squared_dow"])


def test_chaining_audit_no_clusters(spark, tmp_path):
    # all-unique docs: no LSH pairs, no components of size >= 2,
    # empty result in BOTH engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["dedup_chaining_audit"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"documents": path}), ORACLE["dedup_chaining_audit"])


def test_chaining_audit_identical_pair(spark, tmp_path):
    # two identical docs: one cluster of size 2, its single pair is
    # directly verified (jaccard 1) -> chained_pairs 0, fully connected
    path = f"{tmp_path}/documents.parquet"
    txt = "spark window join scan merge sort table batch stream dup"
    spark.createDataFrame(
        [(0, txt), (1, txt)], "doc_id long, text string"
    ).write.parquet(path)
    df = QUERIES["dedup_chaining_audit"](spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].size == 2 and rows[0].direct_pairs == 1
    assert rows[0].chained_pairs == 0 and rows[0].fully_connected is True
    compare(df, _conn_with({"documents": path}), ORACLE["dedup_chaining_audit"])


def test_nelson_aalen_no_repurchases(spark, tmp_path):
    # every customer orders exactly once: zero events, every horizon
    # reports H = 0 and survival exactly 1
    import datetime

    path = f"{tmp_path}/orders.parquet"
    base = datetime.datetime(2026, 3, 1)
    spark.createDataFrame(
        [(i, 100 + i, base + datetime.timedelta(days=i)) for i in range(5)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["nelson_aalen_hazard"](spark, str(tmp_path))
    rows = {r.hz: r for r in df.collect()}
    assert rows[30].events_total == 0
    assert rows[30].cum_hazard == 0.0 and rows[30].na_survival == 1.0
    compare(df, _conn_with({"orders": path}), ORACLE["nelson_aalen_hazard"])


def test_rbo_no_matches(spark, tmp_path):
    # no doc contains the query term: both rankings are empty, every
    # prefix overlap is 0 and RBO is exactly 0 in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["rbo_ranker_agreement"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.k == 100 and row.rbo_100 == 0.0
    compare(df, _conn_with({"documents": path}), ORACLE["rbo_ranker_agreement"])


def test_hub_attack_shatters_star(spark, tmp_path):
    # n=6 docs: the 2-out generator makes a sparse graph where the
    # top hubs carry most connectivity; pin cross-engine parity and
    # the exact-integer permille identity on whatever it computes
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "web") for i in range(6)], "doc_id long, source string"
    ).write.parquet(path)
    df = QUERIES["hub_attack_robustness"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.lcc_before >= row.lcc_after
    if row.retained_permille is not None:
        assert row.retained_permille == row.lcc_after * 1000 // row.lcc_before
    compare(df, _conn_with({"documents": path}), ORACLE["hub_attack_robustness"])


def test_hub_attack_empty_after(spark, tmp_path):
    # 2 docs, single edge (0,1): node 1 is the top hub; removing the
    # top-5 hubs leaves no edges -> lcc_after = 0, retained 0
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "web"), (1, "web")], "doc_id long, source string"
    ).write.parquet(path)
    df = QUERIES["hub_attack_robustness"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_nodes == 2 and row.lcc_before == 2
    assert row.lcc_after == 0 and row.retained_permille == 0
    compare(df, _conn_with({"documents": path}), ORACLE["hub_attack_robustness"])


def test_triples_single_type_baskets(spark, tmp_path):
    # every order contains one part type: no triple (or pair) can
    # form -> empty result in BOTH engines
    opath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [(i, i % 3) for i in range(9)], "l_orderkey long, l_partkey long"
    ).write.parquet(opath)
    spark.createDataFrame(
        [(i, "STEEL") for i in range(3)], "p_partkey long, p_type string"
    ).write.parquet(ppath)
    df = QUERIES["market_basket_triples"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df,
        _conn_with({"lineitem": opath, "part": ppath}),
        ORACLE["market_basket_triples"],
    )


def test_hitting_time_root_absorbing(spark, tmp_path):
    # the root always reports 0 through every iteration; every other
    # node is at least one step (2^20 scaled) away
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "web") for i in range(5)], "doc_id long, source string"
    ).write.parquet(path)
    df = QUERIES["hitting_time_to_root"](spark, str(tmp_path))
    rows = {r.doc_id: r.hit6_x2p20 for r in df.collect()}
    assert rows[0] == 0
    assert all(v >= 1048576 for k, v in rows.items() if k != 0)
    compare(df, _conn_with({"documents": path}), ORACLE["hitting_time_to_root"])


def test_unit_price_first_month_null_direction(spark, tmp_path):
    # a single month per type: lag is NULL, direction NULL; equal
    # unit prices across two months give direction exactly 0
    import datetime

    lpath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    m1 = datetime.datetime(2026, 3, 10)
    m2 = datetime.datetime(2026, 4, 10)
    spark.createDataFrame(
        [
            (0, 0, 2.0, 20.0, m1),
            (1, 0, 4.0, 40.0, m2),  # same 10.0 unit price
        ],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_shipdate timestamp_ntz",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(0, "STEEL")], "p_partkey long, p_type string"
    ).write.parquet(ppath)
    df = QUERIES["unit_price_drift"](spark, str(tmp_path))
    rows = sorted(df.collect(), key=lambda r: r.month_idx)
    assert rows[0].mom_direction is None
    assert rows[1].mom_direction == 0
    assert rows[0].unit_price_cents == 1000.0
    compare(
        df,
        _conn_with({"lineitem": lpath, "part": ppath}),
        ORACLE["unit_price_drift"],
    )


def test_cohort_ltv_single_cohort(spark, tmp_path):
    # all customers start the same month: one cohort, the curve is a
    # plain running total over ages with exact integer cents
    import datetime

    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [
            (0, 1, 10.0, datetime.datetime(2026, 1, 5)),
            (1, 2, 20.0, datetime.datetime(2026, 1, 15)),
            (2, 1, 30.0, datetime.datetime(2026, 2, 5)),
            (3, 2, 40.0, datetime.datetime(2026, 3, 5)),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["cohort_ltv_curve"](spark, str(tmp_path))
    rows = {r.age_months: r for r in df.collect()}
    assert rows[0].cohort_size == 2 and rows[0].cum_revenue_cents == 3000
    assert rows[1].cum_revenue_cents == 6000
    assert rows[2].cum_revenue_cents == 10000
    compare(df, _conn_with({"orders": path}), ORACLE["cohort_ltv_curve"])


def test_vocab_overlap_disjoint_languages(spark, tmp_path):
    # no shared token between the two languages: the pair row is
    # absent entirely (inner join on shared tokens) in BOTH engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "en", "alpha beta"), (1, "fr", "gamma delta")],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    df = QUERIES["lang_vocab_overlap"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"documents": path}), ORACLE["lang_vocab_overlap"])


def test_vocab_overlap_identical_vocab(spark, tmp_path):
    # identical vocabularies: jaccard exactly 1000 permille
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "en", "alpha beta"), (1, "fr", "beta alpha")],
        "doc_id long, lang string, text string",
    ).write.parquet(path)
    df = QUERIES["lang_vocab_overlap"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.shared == 2 and row.jaccard_permille == 1000
    compare(df, _conn_with({"documents": path}), ORACLE["lang_vocab_overlap"])


def test_growth_accounting_ledger_identity(spark, tmp_path):
    # crafted 3-bucket stream: user A active all three months
    # (retained x2), user B active first and third (resurrected),
    # user C first month only (churned into month 2); classes must
    # partition each month's actives and the churn law must fire once
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 1, 15)  # all within stable buckets
    rows = []
    eid = 0

    def add(uid, day_offset):
        nonlocal eid
        rows.append((eid, uid, "e", base + datetime.timedelta(days=day_offset)))
        eid += 1

    for off in (0, 30, 60):
        add(1, off)          # user 1: every bucket
    add(2, 0); add(2, 60)    # user 2: gap in the middle
    add(3, 0)                # user 3: first bucket only
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["growth_accounting_monthly"](spark, str(tmp_path))
    got = {r.month_idx: r for r in df.collect()}
    ms = sorted(got)
    assert len(ms) == 3
    m0, m1, m2 = ms
    assert got[m0].new_users == 3
    assert got[m1].retained == 1 and got[m1].churned_in == 2
    assert got[m2].retained == 1 and got[m2].resurrected == 1
    # quick ratio in month 2: (0 new + 0 res) / 2 churned -> 0
    assert got[m1].quick_ratio_permille == 0
    compare(df, _conn_with({"events": path}), ORACLE["growth_accounting_monthly"])


def test_p_chart_never_late_process(spark, tmp_path):
    # every order ships same-day: X = 0, the binomial width witness
    # 0 < X < N fails and both limit columns are NULL in both engines
    import datetime

    opath = f"{tmp_path}/orders.parquet"
    lpath = f"{tmp_path}/lineitem.parquet"
    day = datetime.datetime(2026, 3, 1)
    spark.createDataFrame(
        [(i, day) for i in range(4)],
        "o_orderkey long, o_orderdate timestamp_ntz",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(i, day) for i in range(4)],
        "l_orderkey long, l_shipdate timestamp_ntz",
    ).write.parquet(lpath)
    df = QUERIES["p_chart_late_shipments"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.x_i == 0 and row.late_permille == 0
    assert row.above_ucl is None and row.below_lcl is None
    compare(
        df,
        _conn_with({"orders": opath, "lineitem": lpath}),
        ORACLE["p_chart_late_shipments"],
    )


def test_c_chart_flags_spike_day(spark, tmp_path):
    # 9 quiet days of 1 error + one day with 60: c-bar ~ 6.9,
    # 3*sqrt(c-bar) ~ 7.9 -> only the spike day exceeds UCL; quiet
    # days are inside the limits and the result is exactly one row
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for d in range(9):
        rows.append((eid, "error", base + datetime.timedelta(days=d)))
        eid += 1
    for _ in range(60):
        rows.append((eid, "error", base + datetime.timedelta(days=9)))
        eid += 1
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["c_chart_error_days"](spark, str(tmp_path))
    rows_out = df.collect()
    assert len(rows_out) == 1
    assert rows_out[0].c == 60 and rows_out[0].above_mean is True
    compare(df, _conn_with({"events": path}), ORACLE["c_chart_error_days"])


def test_burrows_delta_identical_styles(spark, tmp_path):
    # two sources with identical word distributions: every word has
    # zero cross-source variance, the sigma frame is empty and the
    # result has no rows in BOTH engines (no z-scores to compare)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "a", "x y z"), (1, "b", "x y z")],
        "doc_id long, source string, text string",
    ).write.parquet(path)
    df = QUERIES["burrows_delta_sources"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"documents": path}), ORACLE["burrows_delta_sources"]
    )


def test_gmd_constant_group(spark, tmp_path):
    # constant prices: every pair differs by 0 -> GMD exactly 0 and
    # gini exactly 0; a single-order group reports NULLs
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0, "5-LOW") for i in range(4)] + [(9, 50.0, "1-URGENT")],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["gini_mean_difference"](spark, str(tmp_path))
    got = {r.priority: r for r in df.collect()}
    assert got["5-LOW"].gmd_cents == 0.0 and got["5-LOW"].gini == 0.0
    assert got["1-URGENT"].gmd_cents is None
    compare(df, _conn_with({"orders": path}), ORACLE["gini_mean_difference"])


def test_gmd_two_values_exact(spark, tmp_path):
    # two orders at 10.00 and 30.00: GMD = |3000-1000| * 2/(2*1) =
    # 2000 cents exactly; gini = 2000/(2*mean)/... = cross/(1*4000) = 0.5
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(0, 10.0, "5-LOW"), (1, 30.0, "5-LOW")],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["gini_mean_difference"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.gmd_cents == 2000.0 and row.gini == 0.5
    compare(df, _conn_with({"orders": path}), ORACLE["gini_mean_difference"])


def test_dominant_cycle_constant_series(spark, tmp_path):
    # identical daily counts: every lag's variance witness is 0,
    # every candidate excluded -> empty result in BOTH engines
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (3 * d + j, "click", base + datetime.timedelta(days=d))
        for d in range(20)
        for j in range(3)
    ]
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["dominant_cycle_detect"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"events": path}), ORACLE["dominant_cycle_detect"])


def test_dominant_cycle_finds_planted_week(spark, tmp_path):
    # plant a clean 7-day cycle (weekend spikes): lag 7 must win
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 2, 12, 0, 0)
    rows = []
    eid = 0
    for d in range(42):
        count = 10 if d % 7 in (5, 6) else 2
        for _ in range(count):
            rows.append((eid, "click", base + datetime.timedelta(days=d)))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["dominant_cycle_detect"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.dominant_lag_days == 7 and row.weekly is True
    compare(df, _conn_with({"events": path}), ORACLE["dominant_cycle_detect"])


def test_segment_migration_stable_ranks(spark, tmp_path):
    # three customers with unchanged relative spend across halves:
    # the matrix is exactly diagonal (1->1, 2->2, 3->3 each n=1)
    import datetime

    path = f"{tmp_path}/orders.parquet"
    h1 = datetime.datetime(2026, 1, 10)
    h2 = datetime.datetime(2026, 3, 10)
    rows = [
        (0, 1, 10.0, h1), (1, 2, 20.0, h1), (2, 3, 30.0, h1),
        (3, 1, 11.0, h2), (4, 2, 21.0, h2), (5, 3, 31.0, h2),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["segment_migration_matrix"](spark, str(tmp_path))
    got = {(r.tercile_from, r.tercile_to): r.n_customers for r in df.collect()}
    assert got == {(1, 1): 1, (2, 2): 1, (3, 3): 1}
    compare(df, _conn_with({"orders": path}), ORACLE["segment_migration_matrix"])


def test_woe_degenerate_bins(spark, tmp_path):
    # one hour has only purchases (bi=0), another only views (gi=0):
    # both WoE NULL, excluded from IV; a mixed hour carries the IV
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 0, 30, 0)
    rows = []
    eid = 0

    def add(hour, etype, n):
        nonlocal eid
        for _ in range(n):
            rows.append(
                (eid, etype, base + datetime.timedelta(hours=hour))
            )
            eid += 1

    add(1, "purchase", 3)            # pure-good bin
    add(2, "view", 4)                # pure-bad bin
    add(3, "purchase", 2); add(3, "view", 2)  # mixed
    add(4, "purchase", 1); add(4, "view", 5)  # mixed
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["woe_information_value"](spark, str(tmp_path))
    got = {r.hour: r for r in df.collect()}
    assert got[1].woe is None and got[2].woe is None
    assert got[3].woe is not None and got[3].iv_bins_used == 2
    compare(df, _conn_with({"events": path}), ORACLE["woe_information_value"])


def test_gains_curve_no_positives(spark, tmp_path):
    # zero English docs: gain/lift guarded NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, "fr", 100 + i) for i in range(20)],
        "doc_id long, lang string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["cumulative_gains_curve"](spark, str(tmp_path))
    rows = df.collect()
    assert all(r.gain_permille is None for r in rows)
    compare(df, _conn_with({"documents": path}), ORACLE["cumulative_gains_curve"])


def test_gains_curve_perfect_separation(spark, tmp_path):
    # long docs all English, short all French, 20 docs -> decile 1-5
    # capture all 10 positives: gain hits 1000 by decile 5 and lift
    # in decile 1 is exactly 2000 permille
    path = f"{tmp_path}/documents.parquet"
    rows = [(i, "en", 1000 + i) for i in range(10)] + [
        (10 + i, "fr", 100 + i) for i in range(10)
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long"
    ).write.parquet(path)
    df = QUERIES["cumulative_gains_curve"](spark, str(tmp_path))
    got = {r.decile: r for r in df.collect()}
    assert got[1].cum_lift_permille == 2000
    assert got[5].gain_permille == 1000
    assert got[10].gain_permille == 1000
    compare(df, _conn_with({"documents": path}), ORACLE["cumulative_gains_curve"])


def test_cvm_empty_cohort(spark, tmp_path):
    # no urgent orders: n1 = 0, T guarded NULL in both engines
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, 100.0 + i, "5-LOW") for i in range(6)],
        "o_orderkey long, o_totalprice double, o_orderpriority string",
    ).write.parquet(path)
    df = QUERIES["cramer_von_mises"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 0 and row.t_stat is None
    compare(df, _conn_with({"orders": path}), ORACLE["cramer_von_mises"])


def test_cvm_identical_distributions(spark, tmp_path):
    # both cohorts identical: every ECDF cross-difference where both
    # cohorts are balanced... with equal values the gap is exactly 0
    # at every pooled point, T exactly 0
    path = f"{tmp_path}/orders.parquet"
    rows = []
    k = 0
    for v in (10.0, 20.0, 30.0):
        rows.append((k, v, "1-URGENT")); k += 1
        rows.append((k, v, "5-LOW")); k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    ).write.parquet(path)
    df = QUERIES["cramer_von_mises"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.t_stat == 0.0 and row.distributions_differ is False
    compare(df, _conn_with({"orders": path}), ORACLE["cramer_von_mises"])


def test_lead_lag_planted_lead(spark, tmp_path):
    # purchases copy the click series shifted 3 days later: the
    # cross-correlation must peak at lag +3 with clicks_lead True
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    series = [2, 9, 4, 7, 1, 8, 3, 6, 2, 9, 5, 7, 2, 8, 4, 6, 1, 9, 3, 7]
    rows = []
    eid = 0
    for d, n in enumerate(series):
        for _ in range(n):
            rows.append((eid, "click", base + datetime.timedelta(days=d)))
            eid += 1
        for _ in range(n):  # same counts, 3 days later
            rows.append(
                (eid, "purchase", base + datetime.timedelta(days=d + 3))
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["lead_lag_xcorr"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.best_lag_days == 3 and row.clicks_lead is True
    assert row.rho == 1.0
    compare(df, _conn_with({"events": path}), ORACLE["lead_lag_xcorr"])


def test_dn_retention_horizon_censoring(spark, tmp_path):
    # a 9-day dataset: no user is eligible for D30 (denominator 0 ->
    # NULL rate); a user returning exactly on day 7 counts for D7;
    # day 8 does not count for D7
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (0, 1, base), (1, 1, base + datetime.timedelta(days=7)),
        (2, 2, base), (3, 2, base + datetime.timedelta(days=8)),
        (4, 3, base + datetime.timedelta(days=1)),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["dn_retention"](spark, str(tmp_path))
    got = {r.day_n: r for r in df.collect()}
    assert got[30].n_eligible == 0 and got[30].retention_permille is None
    assert got[7].n_retained == 1 and got[7].n_eligible == 3
    assert got[1].n_retained == 0
    compare(df, _conn_with({"events": path}), ORACLE["dn_retention"])


def test_session_affinity_splits_on_gap(spark, tmp_path):
    # one user, two events 31 minutes apart: they land in DIFFERENT
    # sessions, so no pair forms -> empty result; 29 minutes apart
    # would co-occur (pinned via a second user)
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (0, 1, "click", base),
        (1, 1, "purchase", base + datetime.timedelta(minutes=31)),
        (2, 2, "click", base),
        (3, 2, "purchase", base + datetime.timedelta(minutes=29)),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["session_type_affinity"](spark, str(tmp_path))
    rows_out = df.collect()
    assert len(rows_out) == 1  # only user 2's session pairs the types
    assert rows_out[0].support_ab == 1 and rows_out[0].n_sessions == 3
    compare(df, _conn_with({"events": path}), ORACLE["session_type_affinity"])


def test_supplier_dependency_single_customer(spark, tmp_path):
    # one supplier, one customer: dependency exactly 1000 permille and
    # majority_dependent True; tie between two equal customers picks
    # the min key deterministically
    lpath = f"{tmp_path}/lineitem.parquet"
    opath = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(0, 7, 50.0), (1, 7, 50.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(0, 101), (1, 102)], "o_orderkey long, o_custkey long"
    ).write.parquet(opath)
    df = QUERIES["supplier_customer_dependency"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_customers == 2 and row.top_cust == 101
    assert row.dependency_permille == 500 and row.majority_dependent is False
    compare(
        df,
        _conn_with({"lineitem": lpath, "orders": opath}),
        ORACLE["supplier_customer_dependency"],
    )


def test_keep_best_quality_prefers_longest(spark, tmp_path):
    # two identical-text docs with different n_chars metadata: the
    # quality keep picks the longer one, the min-id keep would pick
    # doc 0 -> differs_from_min_id True when lengths invert ids
    path = f"{tmp_path}/documents.parquet"
    txt = "spark window join scan merge sort table batch stream dup"
    spark.createDataFrame(
        [(0, txt, 50), (1, txt, 90)],
        "doc_id long, text string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["dedup_keep_best_quality"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.size == 2 and row.keep_doc == 1 and row.keep_chars == 90
    assert row.min_id_doc == 0 and row.differs_from_min_id is True
    compare(
        df, _conn_with({"documents": path}), ORACLE["dedup_keep_best_quality"]
    )


def test_conversion_depth_zero_bucket(spark, tmp_path):
    # a purchase-only user has path_depth 0 and converts; a view-only
    # user has depth 1 and does not
    import datetime

    path = f"{tmp_path}/events.parquet"
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (0, 1, "purchase", base),
        (1, 2, "view", base),
        (2, 3, "view", base), (3, 3, "click", base), (4, 3, "purchase", base),
    ]
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["conversion_by_path_depth"](spark, str(tmp_path))
    got = {r.path_depth: r for r in df.collect()}
    assert got[0].n_users == 1 and got[0].conversion_permille == 1000
    assert got[1].n_users == 1 and got[1].conversion_permille == 0
    assert got[2].n_users == 1 and got[2].conversion_permille == 1000
    compare(df, _conn_with({"events": path}), ORACLE["conversion_by_path_depth"])


def test_cuped_exact_theta_and_zero_variance(spark, tmp_path):
    import datetime

    path = f"{tmp_path}/events.parquet"
    d0 = datetime.datetime(2026, 3, 1, 12, 0, 0)
    d1 = datetime.datetime(2026, 3, 2, 12, 0, 0)
    # 3 users, post = exactly 2x pre (in cents): theta = 2, rho2 = 1
    rows = []
    for uid, v in [(1, 10.0), (2, 20.0), (3, 40.0)]:
        rows.append((uid * 10, uid, "view", d0, v))
        rows.append((uid * 10 + 1, uid, "view", d1, 2 * v))
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double",
    ).write.parquet(path)
    df = QUERIES["cuped_adjustment"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_users == 3 and row.theta == 2.0 and row.rho2 == 1.0
    assert row.useful is True
    compare(df, _conn_with({"events": path}), ORACLE["cuped_adjustment"])

    # single user: var(X) = 0 exactly -> every output guarded NULL
    path2 = f"{tmp_path}/solo/events.parquet"
    spark.createDataFrame(
        [(0, 1, "view", d0, 5.0), (1, 1, "view", d1, 9.0)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double",
    ).write.parquet(path2)
    df2 = QUERIES["cuped_adjustment"](spark, f"{tmp_path}/solo")
    r2 = df2.collect()[0]
    assert r2.n_users == 1 and r2.theta is None and r2.rho2 is None
    assert r2.useful is None
    compare(
        df2, _conn_with({"events": path2}), ORACLE["cuped_adjustment"]
    )


def test_friedman_all_tied_blocks_and_known_q(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    # every type has the same count within each day -> den = 0 -> NULL
    path = f"{tmp_path}/events.parquet"
    rows, eid = [], 0
    for day in range(3):
        ts = datetime.datetime(2026, 3, 1 + day, 8, 0, 0)
        for t in ("view", "click"):
            for _ in range(4):
                rows.append((eid, 1, t, ts, 1.0))
                eid += 1
    spark.createDataFrame(rows, sch).write.parquet(path)
    df = QUERIES["friedman_test"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_blocks == 3 and row.k_treatments == 2
    assert row.q_den == 0 and row.q is None and row.significant is None
    compare(df, _conn_with({"events": path}), ORACLE["friedman_test"])

    # clean untied k=2, n=3: click > view every day -> perfect split,
    # Q = n(k-1) = 3 (classic 12/(nk(k+1))*Sum R_j^2 - 3n(k+1) with
    # R_view = 3, R_click = 6), below the df=1 critical 3.841
    path2 = f"{tmp_path}/clean/events.parquet"
    rows2, eid = [], 0
    for day in range(3):
        ts = datetime.datetime(2026, 3, 1 + day, 8, 0, 0)
        for t, c in (("view", 1), ("click", 2 + day)):
            for _ in range(c):
                rows2.append((eid, 1, t, ts, 1.0))
                eid += 1
    spark.createDataFrame(rows2, sch).write.parquet(path2)
    df2 = QUERIES["friedman_test"](spark, f"{tmp_path}/clean")
    r2 = df2.collect()[0]
    assert r2.n_blocks == 3 and r2.k_treatments == 2
    assert r2.q == 3.0 and r2.significant is False
    compare(df2, _conn_with({"events": path2}), ORACLE["friedman_test"])


def test_price_elasticity_guard_and_unit_slope(spark, tmp_path):
    # brand B1: price doubles (100 -> 200 cents), qty halves (4 -> 2)
    # -> log-log slope exactly -1.0, elastic False (strictly < -1
    # required); brand B2: one distinct price -> npx guard -> NULL
    lpath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [(1, 4.0, 4.0, 0.0), (2, 2.0, 4.0, 0.0),
         (3, 5.0, 5.0, 0.0), (3, 5.0, 5.0, 0.0)],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(1, "B1"), (2, "B1"), (3, "B2")],
        "p_partkey long, p_brand string",
    ).write.parquet(ppath)
    df = QUERIES["price_elasticity_brand"](spark, str(tmp_path))
    got = {r.brand: r for r in df.collect()}
    assert got["B1"].elasticity == -1.0 and got["B1"].elastic is False
    assert got["B2"].n_lines == 2 and got["B2"].elasticity is None
    assert got["B2"].elastic is None
    compare(
        df,
        _conn_with({"lineitem": lpath, "part": ppath}),
        ORACLE["price_elasticity_brand"],
    )


def test_triad_census_no_triangle_and_known_census(spark, tmp_path):
    # n=3 docs: derived host pairs (0,1) and (1,2) only — no triangle,
    # so the permille guard must emit NULL in both engines
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(3)], "doc_id long, text string"
    ).write.parquet(path)
    df = QUERIES["triad_census_directed"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_triangles == 0 and row.cyclic_permille is None
    compare(
        df, _conn_with({"documents": path}), ORACLE["triad_census_directed"]
    )

    # n=7 docs: brute-force census of the derived tournament gives
    # 3 triangles, 2 cyclic (enumerated offline) -> permille 666
    path2 = f"{tmp_path}/seven/documents.parquet"
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(7)], "doc_id long, text string"
    ).write.parquet(path2)
    df2 = QUERIES["triad_census_directed"](spark, f"{tmp_path}/seven")
    r2 = df2.collect()[0]
    assert r2.n_triangles == 3 and r2.n_cyclic == 2
    assert r2.n_transitive == 1 and r2.cyclic_permille == 666
    compare(
        df2, _conn_with({"documents": path2}), ORACLE["triad_census_directed"]
    )


def test_anderson_darling_matches_brute_force(spark, tmp_path):
    # independent recompute: hashlib md5 + math.log over 5 docs must
    # land on the same A2 (same integer-derived u inputs, IEEE ops)
    import hashlib
    import math

    import pytest

    path = f"{tmp_path}/documents.parquet"
    ids = [0, 1, 2, 3, 4]
    spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id long, text string"
    ).write.parquet(path)
    us = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 1048576
         + 0.5) / 1048576.0
        for i in ids
    )
    n = len(us)
    s = sum(
        (2 * (i + 1) - 1) * math.log(us[i])
        + (2 * n - 2 * (i + 1) + 1) * math.log(1 - us[i])
        for i in range(n)
    )
    expect = -n - s / n
    df = QUERIES["anderson_darling_uniform"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_docs == 5
    assert row.a2 == pytest.approx(expect, abs=1e-5)
    assert row.reject_uniform is (expect > 2.492)
    compare(
        df,
        _conn_with({"documents": path}),
        ORACLE["anderson_darling_uniform"],
    )


def test_slo_burn_page_and_calendar_gap(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    path = f"{tmp_path}/events.parquet"
    rows, eid = [], 0
    # day 0: 2 errors / 10 events (20% > 2x budget); week = day alone
    # -> page True. day 10: clean, and its RANGE week must NOT reach
    # back to day 0 across the gap (rows-frame would).
    d0 = datetime.datetime(2026, 3, 1, 9, 0, 0)
    for i in range(10):
        rows.append((eid, 1, "error" if i < 2 else "view", d0, 1.0))
        eid += 1
    d10 = d0 + datetime.timedelta(days=10)
    for i in range(4):
        rows.append((eid, 1, "view", d10, 1.0))
        eid += 1
    spark.createDataFrame(rows, sch).write.parquet(path)
    df = QUERIES["slo_burn_rate"](spark, str(tmp_path))
    got = {r.day - min(x.day for x in df.collect()): r
           for r in df.collect()}
    assert got[0].burn_1d_permille == 4000 and got[0].page is True
    assert got[10].n_7d == 4 and got[10].err_7d == 0
    assert got[10].burn_7d_permille == 0 and got[10].page is False
    compare(df, _conn_with({"events": path}), ORACLE["slo_burn_rate"])


def test_srm_detected_on_one_sided_assignment(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    ts = datetime.datetime(2026, 3, 1, 9, 0, 0)
    # all-even user ids: n1 = 0, chi2 = N -> SRM fires
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(i, 2 * i, "view", ts, 1.0) for i in range(10)], sch
    ).write.parquet(path)
    df = QUERIES["srm_check"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n0 == 10 and row.n1 == 0 and row.chi2 == 10.0
    assert row.srm_detected is True
    compare(df, _conn_with({"events": path}), ORACLE["srm_check"])

    # balanced 5/5: chi2 = 0, no SRM
    path2 = f"{tmp_path}/ok/events.parquet"
    spark.createDataFrame(
        [(i, i, "view", ts, 1.0) for i in range(10)], sch
    ).write.parquet(path2)
    df2 = QUERIES["srm_check"](spark, f"{tmp_path}/ok")
    r2 = df2.collect()[0]
    assert r2.chi2 == 0.0 and r2.srm_detected is False
    compare(df2, _conn_with({"events": path2}), ORACLE["srm_check"])


def test_aa_calibration_all_splits_degenerate(spark, tmp_path):
    import datetime

    # zero conversions anywhere: every split's pooled variance is 0,
    # all 20 verdicts NULL -> n_decided = 0 and the permille/verdict
    # stay NULL in BOTH engines (integer x div 0 is NULL on both)
    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    ts = datetime.datetime(2026, 3, 1, 9, 0, 0)
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(i, i, "view", ts, 1.0) for i in range(8)], sch
    ).write.parquet(path)
    df = QUERIES["aa_test_calibration"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_splits == 20 and row.n_decided == 0 and row.n_sig is None
    assert row.sig_permille is None and row.miscalibrated is None
    compare(
        df, _conn_with({"events": path}), ORACLE["aa_test_calibration"]
    )


def test_diameter_edge_free_and_known_path(spark, tmp_path):
    # single doc: no host edges -> zero rows in BOTH engines (the
    # seeded-FROM guard; a scalar-subquery formulation would emit a
    # NULL-filled row instead)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "doc 0")], "doc_id long, text string"
    ).write.parquet(path)
    df = QUERIES["host_graph_diameter"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"documents": path}), ORACLE["host_graph_diameter"]
    )

    # n=3 docs: derived host graph is the path 0-1-2, so the double
    # sweep finds far=2 from seed 0 and ecc(2)=2 back to far2=0
    path2 = f"{tmp_path}/three/documents.parquet"
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(3)], "doc_id long, text string"
    ).write.parquet(path2)
    df2 = QUERIES["host_graph_diameter"](spark, f"{tmp_path}/three")
    r2 = df2.collect()[0]
    assert r2.seed_host == 0 and r2.far_host == 2 and r2.far2_host == 0
    assert r2.diameter_lb == 2 and r2.n_hosts == 3 and r2.n_reached == 3
    assert r2.disconnected is False
    compare(
        df2, _conn_with({"documents": path2}), ORACLE["host_graph_diameter"]
    )


def test_stratified_ate_positivity_and_exact_adjustment(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    ts = datetime.datetime(2026, 3, 1, 9, 0, 0)
    # both users treated (odd ids): no control anywhere -> crude,
    # adjusted and sign_flip all guarded NULL in both engines
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(0, 1, "view", ts, 2.0), (1, 3, "view", ts, 4.0)], sch
    ).write.parquet(path)
    df = QUERIES["stratified_ate"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_users == 2 and row.n_overlap == 0
    assert row.crude_diff_cents is None
    assert row.adjusted_ate_cents is None and row.sign_flip is None
    compare(df, _conn_with({"events": path}), ORACLE["stratified_ate"])

    # hand-built composition bias: stratum0 diff=200c (w=2), stratum1
    # diff=400c (w=3) -> adjusted=(2*200+3*400)/5=320; crude=2300/3-350
    # =416.666667 (extra treated user in the high band inflates it)
    path2 = f"{tmp_path}/adj/events.parquet"
    rows = [
        (0, 1, "view", ts, 3.0),                      # t=1, s0, y=300
        (1, 2, "view", ts, 1.0),                      # t=0, s0, y=100
        (2, 3, "view", ts, 4.0), (3, 3, "view", ts, 6.0),   # t=1, s1, 1000
        (4, 4, "view", ts, 2.0), (5, 4, "view", ts, 4.0),   # t=0, s1, 600
        (6, 5, "view", ts, 5.0), (7, 5, "view", ts, 5.0),   # t=1, s1, 1000
    ]
    spark.createDataFrame(rows, sch).write.parquet(path2)
    df2 = QUERIES["stratified_ate"](spark, f"{tmp_path}/adj")
    r2 = df2.collect()[0]
    assert r2.n_users == 5 and r2.n_overlap == 5
    assert r2.crude_diff_cents == 416.666667
    assert r2.adjusted_ate_cents == 320.0 and r2.sign_flip is False
    compare(df2, _conn_with({"events": path2}), ORACLE["stratified_ate"])


def test_tukey_df_zero_and_separated_groups(spark, tmp_path):
    # every row its own group: N = k, df = 0 -> the MSW row drops and
    # the query emits ZERO pair rows in both engines (no div-by-zero)
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(1, "1-URGENT", 100.0), (2, "2-HIGH", 200.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["tukey_hsd_priority"](spark, str(tmp_path))
    assert df.count() == 0
    compare(df, _conn_with({"orders": path}), ORACLE["tukey_hsd_priority"])

    # zero within-variance, clean separation: significant True with
    # exact mean difference; then huge within-variance, tiny diff:
    # False
    path2 = f"{tmp_path}/sep/orders.parquet"
    spark.createDataFrame(
        [(1, "A", 100.0), (2, "A", 100.0), (3, "B", 200.0),
         (4, "B", 200.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.parquet(path2)
    df2 = QUERIES["tukey_hsd_priority"](spark, f"{tmp_path}/sep")
    r2 = df2.collect()[0]
    assert r2.grp_a == "A" and r2.grp_b == "B"
    assert r2.diff_cents == 10000.0 and r2.significant is True
    compare(
        df2, _conn_with({"orders": path2}), ORACLE["tukey_hsd_priority"]
    )

    path3 = f"{tmp_path}/noisy/orders.parquet"
    spark.createDataFrame(
        [(1, "A", 0.0), (2, "A", 10000.0), (3, "B", 1.0),
         (4, "B", 10001.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.parquet(path3)
    df3 = QUERIES["tukey_hsd_priority"](spark, f"{tmp_path}/noisy")
    r3 = df3.collect()[0]
    assert r3.diff_cents == 100.0 and r3.significant is False
    compare(
        df3, _conn_with({"orders": path3}), ORACLE["tukey_hsd_priority"]
    )


def test_capture_recapture_disjoint_and_full_overlap(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    d0 = datetime.datetime(2026, 3, 1, 9, 0, 0)
    d9 = datetime.datetime(2026, 3, 10, 9, 0, 0)
    # disjoint day cohorts: m = 0 -> Lincoln-Petersen NULL, Chapman
    # finite (3*3//1 - 1 = 8 against 4 true users -> 2000 permille)
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(0, 1, "view", d0, 1.0), (1, 2, "view", d0, 1.0),
         (2, 3, "view", d9, 1.0), (3, 4, "view", d9, 1.0)],
        sch,
    ).write.parquet(path)
    df = QUERIES["capture_recapture_users"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n1 == 2 and row.n2 == 2 and row.m == 0
    assert row.lincoln_petersen is None and row.chapman_estimate == 8
    assert row.chapman_vs_true_permille == 2000
    compare(
        df, _conn_with({"events": path}), ORACLE["capture_recapture_users"]
    )

    # full overlap: both estimators hit the truth exactly
    path2 = f"{tmp_path}/same/events.parquet"
    spark.createDataFrame(
        [(0, 1, "view", d0, 1.0), (1, 2, "view", d0, 1.0),
         (2, 1, "view", d9, 1.0), (3, 2, "view", d9, 1.0)],
        sch,
    ).write.parquet(path2)
    df2 = QUERIES["capture_recapture_users"](spark, f"{tmp_path}/same")
    r2 = df2.collect()[0]
    assert r2.m == 2 and r2.chapman_estimate == 2
    assert r2.lincoln_petersen == 2 and r2.chapman_vs_true_permille == 1000
    compare(
        df2, _conn_with({"events": path2}),
        ORACLE["capture_recapture_users"],
    )


def test_median_ci_small_n_and_degenerate_spread(spark, tmp_path):
    # n = 5: k = floor((5 - 1.96*sqrt(5))/2) = 0 -> CI guarded NULL,
    # median still exact
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(i, float(100 + i)) for i in range(5)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(path)
    df = QUERIES["median_ci_order_stats"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n == 5 and row.k == 0 and row.median_cents == 10200
    assert row.ci_lo_cents is None and row.ci_hi_cents is None
    compare(
        df, _conn_with({"orders": path}), ORACLE["median_ci_order_stats"]
    )

    # 100 identical values: the interval degenerates to the point
    path2 = f"{tmp_path}/const/orders.parquet"
    spark.createDataFrame(
        [(i, 250.0) for i in range(100)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(path2)
    df2 = QUERIES["median_ci_order_stats"](spark, f"{tmp_path}/const")
    r2 = df2.collect()[0]
    assert r2.k == 40 and r2.median_cents == 25000
    assert r2.ci_lo_cents == 25000 and r2.ci_hi_cents == 25000
    compare(
        df2, _conn_with({"orders": path2}), ORACLE["median_ci_order_stats"]
    )


def test_optimal_threshold_perfect_separation(spark, tmp_path):
    # en docs score high, non-en low: t=10 gives cost 0 and beats
    # both constant classifiers
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "a", "xx", 5), (1, "b", "xx", 6),
         (2, "c", "en", 10), (3, "d", "en", 20)],
        "doc_id long, text string, lang string, n_chars long",
    ).write.parquet(path)
    df = QUERIES["optimal_threshold_cost"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.best_threshold == 10 and row.cost == 0
    assert row.tp == 2 and row.fp == 0 and row.fn == 0 and row.tn == 2
    assert row.beats_constant is True
    compare(
        df, _conn_with({"documents": path}), ORACLE["optimal_threshold_cost"]
    )

    # all-positive corpus: always-positive already costs 0, so the
    # sweep cannot strictly beat the constant classifier
    path2 = f"{tmp_path}/allpos/documents.parquet"
    spark.createDataFrame(
        [(0, "a", "en", 5), (1, "b", "en", 9)],
        "doc_id long, text string, lang string, n_chars long",
    ).write.parquet(path2)
    df2 = QUERIES["optimal_threshold_cost"](spark, f"{tmp_path}/allpos")
    r2 = df2.collect()[0]
    assert r2.cost == 0 and r2.cost_always_positive == 0
    assert r2.beats_constant is False
    compare(
        df2, _conn_with({"documents": path2}),
        ORACLE["optimal_threshold_cost"],
    )


def test_group_sequential_early_stop_and_null_interim(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    d0 = datetime.datetime(2026, 3, 1, 9, 0, 0)
    d1 = datetime.datetime(2026, 3, 2, 9, 0, 0)
    # zero interim conversions: interim verdict NULL (pooled variance
    # 0), early_stop coalesces to False; final look separates cleanly
    path = f"{tmp_path}/events.parquet"
    rows, eid = [], 0
    for uid in range(1, 9):
        rows.append((eid, uid, "view", d0, 1.0)); eid += 1
        if uid % 2 == 1:
            rows.append((eid, uid, "purchase", d1, 1.0)); eid += 1
    spark.createDataFrame(rows, sch).write.parquet(path)
    df = QUERIES["group_sequential_looks"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_interim == 8 and row.x_interim == 0
    assert row.interim_significant is None and row.early_stop is False
    assert row.final_significant is True and row.reject_null is True
    compare(
        df, _conn_with({"events": path}), ORACLE["group_sequential_looks"]
    )

    # all 6 treated users convert AT the interim (6v6, 0 control
    # conversions): z^2 clears even the 2.963 OBF interim bar
    path2 = f"{tmp_path}/early/events.parquet"
    rows2, eid = [], 0
    for uid in range(1, 13):
        rows2.append((eid, uid, "view", d0, 1.0)); eid += 1
        if uid % 2 == 1:
            rows2.append((eid, uid, "purchase", d0, 1.0)); eid += 1
        rows2.append((eid, uid, "view", d1, 1.0)); eid += 1
    spark.createDataFrame(rows2, sch).write.parquet(path2)
    df2 = QUERIES["group_sequential_looks"](spark, f"{tmp_path}/early")
    r2 = df2.collect()[0]
    assert r2.interim_significant is True and r2.early_stop is True
    assert r2.reject_null is True
    compare(
        df2, _conn_with({"events": path2}),
        ORACLE["group_sequential_looks"],
    )


def test_rayleigh_point_mass_and_antipodal_balance(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    # all events in hour 0: rbar = 1 exactly (cos 0 = 1, sin 0 = 0),
    # Z = n, maximal rejection, circular mean hour 0
    path = f"{tmp_path}/events.parquet"
    h0 = datetime.datetime(2026, 3, 1, 0, 30, 0)
    spark.createDataFrame(
        [(i, 1, "view", h0, 1.0) for i in range(10)], sch
    ).write.parquet(path)
    df = QUERIES["rayleigh_hour_uniformity"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_events == 10 and row.rayleigh_z == 10.0
    assert row.mean_hour == 0.0 and row.reject_uniform is True
    compare(
        df, _conn_with({"events": path}),
        ORACLE["rayleigh_hour_uniformity"],
    )

    # balanced antipodal hours (0 and 12): the resultant cancels,
    # Z rounds to 0, no rejection — the wrap-around case a linear
    # variance test misreads as maximal spread
    path2 = f"{tmp_path}/anti/events.parquet"
    h12 = datetime.datetime(2026, 3, 1, 12, 30, 0)
    rows = [(i, 1, "view", h0, 1.0) for i in range(5)]
    rows += [(5 + i, 1, "view", h12, 1.0) for i in range(5)]
    spark.createDataFrame(rows, sch).write.parquet(path2)
    df2 = QUERIES["rayleigh_hour_uniformity"](spark, f"{tmp_path}/anti")
    r2 = df2.collect()[0]
    assert r2.rayleigh_z == 0.0 and r2.reject_uniform is False
    compare(
        df2, _conn_with({"events": path2}),
        ORACLE["rayleigh_hour_uniformity"],
    )


def test_price_index_unmatched_and_exact_doubling(spark, tmp_path):
    import datetime

    sch = (
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp_ntz"
    )
    d0 = datetime.datetime(2026, 1, 1)
    d1 = datetime.datetime(2026, 6, 1)
    # part 1 only in the first month, part 2 only in the last: no
    # matched basket -> zero rows in both engines
    path = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        [(1, 2.0, 4.0, 0.0, d0), (2, 2.0, 4.0, 0.0, d1)], sch
    ).write.parquet(path)
    df = QUERIES["price_index_fisher"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"lineitem": path}), ORACLE["price_index_fisher"]
    )

    # one matched part, same quantity, price exactly doubles:
    # L = P = Fisher = 2.0
    path2 = f"{tmp_path}/dbl/lineitem.parquet"
    spark.createDataFrame(
        [(1, 2.0, 4.0, 0.0, d0), (1, 2.0, 8.0, 0.0, d1)], sch
    ).write.parquet(path2)
    df2 = QUERIES["price_index_fisher"](spark, f"{tmp_path}/dbl")
    r2 = df2.collect()[0]
    assert r2.n_matched_parts == 1
    assert r2.laspeyres == 2.0 and r2.paasche == 2.0 and r2.fisher == 2.0
    assert r2.inflating is True
    compare(
        df2, _conn_with({"lineitem": path2}), ORACLE["price_index_fisher"]
    )


def test_shift_share_identity_and_entry_nation(spark, tmp_path):
    import datetime

    d0 = datetime.datetime(2026, 1, 1)
    d1 = datetime.datetime(2026, 6, 1)
    opath = f"{tmp_path}/orders.parquet"
    cpath = f"{tmp_path}/customer.parquet"
    npath = f"{tmp_path}/nation.parquet"
    # nation A: 2 orders @100 then 3 @150 -> volume (3-2)*10000 =
    # 10000, rate 3*(15000-10000) = 15000, delta 25000 (exact
    # identity); nation B: entry (last month only) -> NULL effects
    spark.createDataFrame(
        [(1, 1, 100.0, d0), (2, 1, 100.0, d0),
         (3, 1, 150.0, d1), (4, 1, 150.0, d1), (5, 1, 150.0, d1),
         (6, 2, 99.0, d1)],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(1, 10), (2, 20)], "c_custkey long, c_nationkey long"
    ).write.parquet(cpath)
    spark.createDataFrame(
        [(10, "ALPHA"), (20, "BETA")], "n_nationkey long, n_name string"
    ).write.parquet(npath)
    df = QUERIES["shift_share_decomposition"](spark, str(tmp_path))
    got = {r.nation: r for r in df.collect()}
    a = got["ALPHA"]
    assert a.n0 == 2 and a.n1 == 3 and a.delta_cents == 25000
    assert a.volume_effect == 10000.0 and a.rate_effect == 15000.0
    b = got["BETA"]
    assert b.n0 == 0 and b.delta_cents == 9900
    assert b.volume_effect is None and b.rate_effect is None
    compare(
        df,
        _conn_with({"orders": opath, "customer": cpath, "nation": npath}),
        ORACLE["shift_share_decomposition"],
    )


def test_textrank_fixed_point_and_star(spark, tmp_path):
    # a single symmetric pair is PageRank's fixed point: both words
    # hold exactly the initial 10^9 scaled rank through every
    # iteration (teleport 0.15 + 0.85 * full neighbor rank)
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "alpha beta")], "doc_id long, text string"
    ).write.parquet(path)
    df = QUERIES["textrank_keywords"](spark, str(tmp_path))
    got = {r.word: r.rank_scaled for r in df.collect()}
    assert got == {"alpha": 1_000_000_000, "beta": 1_000_000_000}
    compare(
        df, _conn_with({"documents": path}), ORACLE["textrank_keywords"]
    )

    # hub-and-spokes: the hub outranks every spoke, symmetric spokes
    # (b, c) tie exactly, and the one-word corpus yields zero rows
    path2 = f"{tmp_path}/star/documents.parquet"
    spark.createDataFrame(
        [(0, "a hub b hub c hub")], "doc_id long, text string"
    ).write.parquet(path2)
    df2 = QUERIES["textrank_keywords"](spark, f"{tmp_path}/star")
    got2 = {r.word: r.rank_scaled for r in df2.collect()}
    assert got2["hub"] > got2["b"] == got2["c"] > got2["a"]
    compare(
        df2, _conn_with({"documents": path2}), ORACLE["textrank_keywords"]
    )

    path3 = f"{tmp_path}/solo/documents.parquet"
    spark.createDataFrame(
        [(0, "loner")], "doc_id long, text string"
    ).write.parquet(path3)
    df3 = QUERIES["textrank_keywords"](spark, f"{tmp_path}/solo")
    assert df3.count() == 0
    compare(
        df3, _conn_with({"documents": path3}), ORACLE["textrank_keywords"]
    )


def test_cluster_lang_purity_cross_lingual(spark, tmp_path):
    # three identical texts (en, en, xx) form one cluster: majority
    # en at 666 permille, cross_lingual True; an en-only pair stays
    # pure at 1000
    path = f"{tmp_path}/documents.parquet"
    t1 = "spark window join scan merge sort table batch stream dup"
    t2 = "totally different words about crawling parsing and storage"
    spark.createDataFrame(
        [(0, t1, "en"), (1, t1, "en"), (2, t1, "xx"),
         (10, t2, "en"), (11, t2, "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(path)
    df = QUERIES["dedup_cluster_lang_purity"](spark, str(tmp_path))
    rows = {r.cluster_id: r for r in df.collect()}
    tri = rows[0]
    assert tri.size == 3 and tri.n_langs == 2
    assert tri.majority_lang == "en" and tri.purity_permille == 666
    assert tri.cross_lingual is True
    duo = rows[10]
    assert duo.size == 2 and duo.purity_permille == 1000
    assert duo.cross_lingual is False
    compare(
        df, _conn_with({"documents": path}),
        ORACLE["dedup_cluster_lang_purity"],
    )


def test_benford_second_digit_gate_and_extraction(spark, tmp_path):
    # every value below 10 cents: no second digit exists anywhere ->
    # zero rows in both engines (the n > 0 gate)
    path = f"{tmp_path}/orders.parquet"
    spark.createDataFrame(
        [(1, 0.05), (2, 0.09)], "o_orderkey long, o_totalprice double"
    ).write.parquet(path)
    df = QUERIES["benford_second_digit"](spark, str(tmp_path))
    assert df.count() == 0
    compare(
        df, _conn_with({"orders": path}), ORACLE["benford_second_digit"]
    )

    # 12 / 345 / 6789 cents: second digits 2, 4, 7 — n counts only
    # the eligible values and the chi2 is engine-identical
    path2 = f"{tmp_path}/mix/orders.parquet"
    spark.createDataFrame(
        [(1, 0.12), (2, 3.45), (3, 67.89), (4, 0.07)],
        "o_orderkey long, o_totalprice double",
    ).write.parquet(path2)
    df2 = QUERIES["benford_second_digit"](spark, f"{tmp_path}/mix")
    r2 = df2.collect()[0]
    assert r2.n_values == 3 and r2.chi2 is not None
    compare(
        df2, _conn_with({"orders": path2}), ORACLE["benford_second_digit"]
    )


def test_tukey_fences_zero_iqr(spark, tmp_path):
    # over half the mass on one value: IQR = 0 and the fences
    # collapse to the point — the lone extreme value is both a
    # whisker outlier and far-out, with no division anywhere
    path = f"{tmp_path}/orders.parquet"
    rows = [(i, 1.0) for i in range(10)] + [(10, 100.0)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    ).write.parquet(path)
    df = QUERIES["tukey_fences_outliers"](spark, str(tmp_path))
    r = df.collect()[0]
    assert r.n == 11 and r.q1_cents == 100 and r.q3_cents == 100
    assert r.iqr_cents == 0 and r.n_low == 0
    assert r.n_high == 1 and r.n_far_out == 1
    compare(
        df, _conn_with({"orders": path}), ORACLE["tukey_fences_outliers"]
    )


def test_bounce_rate_gap_boundary(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    base = datetime.datetime(2026, 3, 1, 9, 0, 0)
    # user 1: two events 31 min apart -> two one-event sessions, both
    # bounces; user 2: 29 min apart -> ONE two-event session, not a
    # bounce (the 30-min fence is strict >)
    path = f"{tmp_path}/events.parquet"
    rows = [
        (0, 1, "view", base, 1.0),
        (1, 1, "view", base + datetime.timedelta(minutes=31), 1.0),
        (2, 2, "view", base, 1.0),
        (3, 2, "view", base + datetime.timedelta(minutes=29), 1.0),
    ]
    spark.createDataFrame(rows, sch).write.parquet(path)
    df = QUERIES["session_bounce_rate"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_sessions == 3 and row.n_bounces == 2
    assert row.bounce_permille == 666
    compare(df, _conn_with({"events": path}), ORACLE["session_bounce_rate"])


def test_user_entropy_specialist_vs_generalist(spark, tmp_path):
    import datetime

    import pytest

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    ts = datetime.datetime(2026, 3, 1, 9, 0, 0)
    # user 1: 4 views (specialist, H = 0); user 2: 2 views + 2 clicks
    # (H = ln 2) -> mean entropy ln(2)/2, one single-type user
    path = f"{tmp_path}/events.parquet"
    rows = [(i, 1, "view", ts, 1.0) for i in range(4)]
    rows += [(4, 2, "view", ts, 1.0), (5, 2, "view", ts, 1.0),
             (6, 2, "click", ts, 1.0), (7, 2, "click", ts, 1.0)]
    spark.createDataFrame(rows, sch).write.parquet(path)
    df = QUERIES["user_type_entropy"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_users == 2 and row.n_single_type == 1
    import math

    assert row.mean_entropy_nats == pytest.approx(
        math.log(2) / 2, abs=1e-6
    )
    compare(df, _conn_with({"events": path}), ORACLE["user_type_entropy"])


def test_kendalls_w_perfect_and_all_tied(spark, tmp_path):
    # two sources ranked identically by all three metrics: W = 1.0
    # exactly; chi2 = 3 at df=1 stays under 3.841 -> not significant
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "x" * 10, "en", "A", 10),
         (1, "y" * 40, "en", "B", 40), (2, "z" * 60, "xx", "B", 60)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(path)
    df = QUERIES["kendalls_w_sources"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_items == 2 and row.w == 1.0 and row.significant is False
    compare(
        df, _conn_with({"documents": path}), ORACLE["kendalls_w_sources"]
    )

    # identical metrics everywhere: every ranking fully tied, the
    # tie-corrected denominator is 0 exactly -> W and verdict NULL
    path2 = f"{tmp_path}/tied/documents.parquet"
    spark.createDataFrame(
        [(0, "x" * 10, "en", "A", 10), (1, "y" * 10, "en", "B", 10)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.parquet(path2)
    df2 = QUERIES["kendalls_w_sources"](spark, f"{tmp_path}/tied")
    r2 = df2.collect()[0]
    assert r2.w_den == 0 and r2.w is None and r2.significant is None
    compare(
        df2, _conn_with({"documents": path2}), ORACLE["kendalls_w_sources"]
    )


def test_imr_chart_spike_and_single_day(spark, tmp_path):
    import datetime

    base = datetime.datetime(2026, 3, 1)
    path = f"{tmp_path}/orders.parquet"
    rows = [(i, 1.0, base + datetime.timedelta(days=i)) for i in range(9)]
    rows.append((9, 100.0, base + datetime.timedelta(days=9)))
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["imr_control_chart"](spark, str(tmp_path))
    got = sorted(df.collect(), key=lambda r: r.day)
    assert [r.out_of_control for r in got] == [False] * 9 + [True]
    assert got[9].moving_range == 9900 and got[0].moving_range is None
    compare(df, _conn_with({"orders": path}), ORACLE["imr_control_chart"])

    # single day: no moving range exists -> verdict guarded NULL
    path2 = f"{tmp_path}/one/orders.parquet"
    spark.createDataFrame(
        [(0, 5.0, base)],
        "o_orderkey long, o_totalprice double, o_orderdate timestamp_ntz",
    ).write.parquet(path2)
    df2 = QUERIES["imr_control_chart"](spark, f"{tmp_path}/one")
    r2 = df2.collect()[0]
    assert r2.out_of_control is None and r2.moving_range is None
    compare(
        df2, _conn_with({"orders": path2}), ORACLE["imr_control_chart"]
    )


def test_association_rules_certain_and_direction(spark, tmp_path):
    # A appears in 2 baskets, always with B; B appears alone once
    # more: A->B is certain (conviction NULL, flag True) while B->A
    # has confidence 666 permille — direction matters
    lpath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 2)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "p_partkey long, p_type string"
    ).write.parquet(ppath)
    df = QUERIES["association_rules"](spark, str(tmp_path))
    got = {(r.ante, r.cons): r for r in df.collect()}
    ab = got[("A", "B")]
    assert ab.s_ab == 2 and ab.s_ante == 2
    assert ab.confidence_permille == 1000 and ab.rule_certain is True
    # B rides in EVERY basket: conf = 1 but lift is exactly 1 too —
    # a universal consequent can never show positive lift
    assert ab.conviction is None and ab.positive_lift is False
    ba = got[("B", "A")]
    assert ba.confidence_permille == 666 and ba.rule_certain is False
    # conviction(B->A) = (3-2)*3 / (3*(3-2)) = 1.0 exactly
    assert ba.conviction == 1.0
    compare(
        df,
        _conn_with({"lineitem": lpath, "part": ppath}),
        ORACLE["association_rules"],
    )


def test_lang_assortativity_zero_and_single_lang(spark, tmp_path):
    # 3-doc graph (edges 0->1 x2, 1->0, 2->1) with langs en/en/xx:
    # E*diag = 4*3 equals Sum(A_i*B_i) = 12 exactly -> r = 0.0, the
    # no-association fixed point, decided on exact integers
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "a", "en"), (1, "b", "en"), (2, "c", "xx")],
        "doc_id long, text string, lang string",
    ).write.parquet(path)
    df = QUERIES["lang_assortativity"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_edges == 4 and row.n_same_lang == 3
    assert row.r_num == 0 and row.assortativity == 0.0
    assert row.assortative is False
    compare(
        df, _conn_with({"documents": path}), ORACLE["lang_assortativity"]
    )

    # single-language graph: denominator exactly 0 (everything is
    # trivially same-lang) -> r and the verdict guard to NULL
    path2 = f"{tmp_path}/mono/documents.parquet"
    spark.createDataFrame(
        [(0, "a", "en"), (1, "b", "en"), (2, "c", "en")],
        "doc_id long, text string, lang string",
    ).write.parquet(path2)
    df2 = QUERIES["lang_assortativity"](spark, f"{tmp_path}/mono")
    r2 = df2.collect()[0]
    assert r2.r_den == 0 and r2.assortativity is None
    assert r2.assortative is None
    compare(
        df2, _conn_with({"documents": path2}), ORACLE["lang_assortativity"]
    )


def test_broker_centrality_path_and_no_open_pairs(spark, tmp_path):
    # 3-doc path graph 0-1-2: host 1 is the ONLY broker of the open
    # pair (0, 2); hosts 0 and 2 broker nothing and emit no row
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(3)], "doc_id long, text string"
    ).write.parquet(path)
    df = QUERIES["host_broker_centrality"](spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].host == 1 and rows[0].brokerage == 1
    assert rows[0].exclusive_brokerage == 1
    compare(
        df, _conn_with({"documents": path}),
        ORACLE["host_broker_centrality"],
    )

    # 2 hosts, one edge: no wedge exists at all -> zero rows
    path2 = f"{tmp_path}/two/documents.parquet"
    spark.createDataFrame(
        [(0, "a"), (1, "b")], "doc_id long, text string"
    ).write.parquet(path2)
    df2 = QUERIES["host_broker_centrality"](spark, f"{tmp_path}/two")
    assert df2.count() == 0
    compare(
        df2, _conn_with({"documents": path2}),
        ORACLE["host_broker_centrality"],
    )


def test_half_sample_stability_extremes(spark, tmp_path):
    import hashlib

    lpath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    # brand A tiny lines, brand B huge lines, 16 each: any hash split
    # ranks B above A in both halves -> rho = 1.0 exactly
    rows = []
    for i in range(16):
        rows.append((100 + i, 1, 1, 1.0))
        rows.append((200 + i, 1, 2, 10000.0))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_extendedprice double",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "p_partkey long, p_brand string"
    ).write.parquet(ppath)
    # precondition: every (brand, half) cell is non-empty under md5
    for base in (100, 200):
        halves = {
            int(hashlib.md5(f"{base + i}:1".encode()).hexdigest()[:15], 16)
            % 2
            for i in range(16)
        }
        assert halves == {0, 1}
    df = QUERIES["half_sample_rank_stability"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_brands == 2 and row.spearman_rho == 1.0
    assert row.stable is True
    compare(
        df,
        _conn_with({"lineitem": lpath, "part": ppath}),
        ORACLE["half_sample_rank_stability"],
    )

    # single brand: zero rank variance -> rho guarded NULL
    lpath2 = f"{tmp_path}/one/lineitem.parquet"
    ppath2 = f"{tmp_path}/one/part.parquet"
    spark.createDataFrame(
        [(100 + i, 1, 1, 5.0) for i in range(8)],
        "l_orderkey long, l_linenumber long, l_partkey long, "
        "l_extendedprice double",
    ).write.parquet(lpath2)
    spark.createDataFrame(
        [(1, "A")], "p_partkey long, p_brand string"
    ).write.parquet(ppath2)
    df2 = QUERIES["half_sample_rank_stability"](spark, f"{tmp_path}/one")
    r2 = df2.collect()[0]
    assert r2.n_brands == 1 and r2.spearman_rho is None
    assert r2.stable is None
    compare(
        df2,
        _conn_with({"lineitem": lpath2, "part": ppath2}),
        ORACLE["half_sample_rank_stability"],
    )


def test_hhi_trend_concentrating_and_single_month(spark, tmp_path):
    import datetime

    sch = (
        "l_suppkey long, l_extendedprice double, l_shipdate timestamp_ntz"
    )
    d0 = datetime.datetime(2026, 1, 1)
    d1 = datetime.datetime(2026, 6, 1)
    # month 1: two equal suppliers (HHI 5000 bp); month 2: one
    # supplier (HHI 10000) -> S = +1, concentrating True
    path = f"{tmp_path}/lineitem.parquet"
    spark.createDataFrame(
        [(1, 50.0, d0), (2, 50.0, d0), (1, 80.0, d1)], sch
    ).write.parquet(path)
    df = QUERIES["supplier_hhi_trend"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_months == 2 and row.s_stat == 1
    assert row.hhi_first == 5000 and row.hhi_last == 10000
    assert row.concentrating is True
    compare(df, _conn_with({"lineitem": path}), ORACLE["supplier_hhi_trend"])

    # single month: no pair to trend over -> verdict NULL
    path2 = f"{tmp_path}/one/lineitem.parquet"
    spark.createDataFrame([(1, 50.0, d0)], sch).write.parquet(path2)
    df2 = QUERIES["supplier_hhi_trend"](spark, f"{tmp_path}/one")
    r2 = df2.collect()[0]
    assert r2.n_months == 1 and r2.s_stat == 0
    assert r2.concentrating is None
    compare(
        df2, _conn_with({"lineitem": path2}), ORACLE["supplier_hhi_trend"]
    )


def test_time_decay_credit_conservation(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    d = lambda k: datetime.datetime(2026, 3, 1 + k, 12, 0, 0)  # noqa: E731
    # purchase on day 2 with a view on day 0 (w=1/4) and a click on
    # day 2 (w=1): click gets 0.8, view 0.2 — and credits sum to 1
    path = f"{tmp_path}/events.parquet"
    rows = [
        (0, 1, "view", d(0), 1.0),
        (1, 1, "click", d(2), 1.0),
        (2, 1, "purchase", d(2), 1.0),
    ]
    spark.createDataFrame(rows, sch).write.parquet(path)
    df = QUERIES["time_decay_attribution"](spark, str(tmp_path))
    got = {r.channel: r.credit for r in df.collect()}
    assert got == {"click": 0.8, "view": 0.2}
    compare(
        df, _conn_with({"events": path}),
        ORACLE["time_decay_attribution"],
    )

    # a purchase with NO touch in the 7-day window contributes no
    # row at all (stale view 10 days earlier)
    path2 = f"{tmp_path}/stale/events.parquet"
    spark.createDataFrame(
        [(0, 1, "view", d(0), 1.0),
         (1, 1, "purchase", d(10), 1.0)], sch
    ).write.parquet(path2)
    df2 = QUERIES["time_decay_attribution"](spark, f"{tmp_path}/stale")
    assert df2.count() == 0
    compare(
        df2, _conn_with({"events": path2}),
        ORACLE["time_decay_attribution"],
    )


def test_funnel_significance_no_clicks_guard(spark, tmp_path):
    import datetime

    sch = (
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double"
    )
    ts = datetime.datetime(2026, 3, 1, 9, 0, 0)
    # views only: step 1 is 0 permille and every step-2 readout is
    # guarded NULL (no division by the empty click cohort)
    path = f"{tmp_path}/events.parquet"
    spark.createDataFrame(
        [(i, i, "view", ts, 1.0) for i in range(4)], sch
    ).write.parquet(path)
    df = QUERIES["funnel_step_significance"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_view == 4 and row.n_click == 0
    assert row.step1_permille == 0 and row.step2_permille is None
    assert row.second_step_worse is None
    assert row.drop_gap_significant is None
    compare(
        df, _conn_with({"events": path}),
        ORACLE["funnel_step_significance"],
    )

    # clean separated funnel: 8 viewers, 4 clickers, 0 purchases —
    # step2 (0/4) is worse than step1 (4/8) but n is too small for
    # significance
    path2 = f"{tmp_path}/drop/events.parquet"
    rows, eid = [], 0
    for uid in range(8):
        rows.append((eid, uid, "view", ts, 1.0)); eid += 1
        if uid < 4:
            rows.append(
                (eid, uid, "click",
                 ts + datetime.timedelta(minutes=1), 1.0))
            eid += 1
    spark.createDataFrame(rows, sch).write.parquet(path2)
    df2 = QUERIES["funnel_step_significance"](spark, f"{tmp_path}/drop")
    r2 = df2.collect()[0]
    assert r2.step1_permille == 500 and r2.step2_permille == 0
    assert r2.second_step_worse is True
    assert r2.drop_gap_significant is False
    compare(
        df2, _conn_with({"events": path2}),
        ORACLE["funnel_step_significance"],
    )


def test_query_likelihood_absent_term_guard(spark, tmp_path):
    # 'vector' and 'window' never occur: their collection model is 0
    # and both engines must contribute exactly 0 (not -inf vs NULL);
    # ranking falls to the 'join' term — more mentions, higher score
    path = f"{tmp_path}/documents.parquet"
    spark.createDataFrame(
        [(0, "join join scan"), (1, "join scan merge"), (2, "scan merge")],
        "doc_id long, text string",
    ).write.parquet(path)
    df = QUERIES["query_likelihood_search"](spark, str(tmp_path))
    rows = df.collect()
    assert [r.doc_id for r in rows] == [0, 1]
    assert rows[0].ql_score > rows[1].ql_score
    compare(
        df, _conn_with({"documents": path}),
        ORACLE["query_likelihood_search"],
    )


def test_p_alive_calibrated_per_customer(spark, tmp_path):
    import datetime

    d = lambda k: datetime.datetime(2026, 1, 1) + datetime.timedelta(  # noqa: E731
        days=k
    )
    path = f"{tmp_path}/orders.parquet"
    # horizon T = day 100. cust 1: weekly buyer (days 0,7,14) silent
    # 86 days -> dead. cust 2: ~annual cadence (days 0,90) silent 10
    # -> alive ((100-90)*1 < 2*90). cust 3: single order -> NULL.
    rows = [
        (1, 1, d(0)), (2, 1, d(7)), (3, 1, d(14)),
        (4, 2, d(0)), (5, 2, d(90)),
        (6, 3, d(100)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz"
    ).write.parquet(path)
    df = QUERIES["p_alive_heuristic"](spark, str(tmp_path))
    row = df.collect()[0]
    assert row.n_customers == 3 and row.n_repeat == 2
    assert row.n_alive == 1 and row.n_dormant == 1
    assert row.alive_permille_of_repeat == 500
    compare(df, _conn_with({"orders": path}), ORACLE["p_alive_heuristic"])


def test_backlog_aging_buckets_and_no_open(spark, tmp_path):
    import datetime

    d = lambda k: datetime.datetime(2026, 1, 1) + datetime.timedelta(  # noqa: E731
        days=k
    )
    path = f"{tmp_path}/orders.parquet"
    # horizon = day 400 (a closed order sets it). open orders aged
    # 0, 60, 200, 400 land in the four buckets exactly
    rows = [
        (1, "O", 100.0, d(400)), (2, "O", 100.0, d(340)),
        (3, "O", 100.0, d(200)), (4, "O", 100.0, d(0)),
        (5, "F", 999.0, d(400)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz",
    ).write.parquet(path)
    df = QUERIES["order_backlog_aging"](spark, str(tmp_path))
    got = {r.age_bucket: r for r in df.collect()}
    assert set(got) == {"0-30", "31-90", "91-365", "365+"}
    assert all(r.n_orders == 1 and r.share_permille == 250
               for r in got.values())
    compare(df, _conn_with({"orders": path}), ORACLE["order_backlog_aging"])

    # all closed: zero rows in both engines
    path2 = f"{tmp_path}/closed/orders.parquet"
    spark.createDataFrame(
        [(1, "F", 50.0, d(0))],
        "o_orderkey long, o_orderstatus string, o_totalprice double, "
        "o_orderdate timestamp_ntz",
    ).write.parquet(path2)
    df2 = QUERIES["order_backlog_aging"](spark, f"{tmp_path}/closed")
    assert df2.count() == 0
    compare(
        df2, _conn_with({"orders": path2}), ORACLE["order_backlog_aging"]
    )


def test_borda_fusion_dominant_supplier(spark, tmp_path):
    import datetime

    d0 = datetime.datetime(2026, 1, 1)
    lpath = f"{tmp_path}/lineitem.parquet"
    opath = f"{tmp_path}/orders.parquet"
    # supplier 1 dominates every metric (more revenue, ships same
    # day, no returns); supplier 2 loses all three: perfect sweep is
    # 2x(n-1) per metric x3 = 6*2 - 3*2 = 6 vs 6*2 - 3*4 = 0
    spark.createDataFrame(
        [(1, 1, 100.0, "N", d0),
         (2, 2, 10.0, "R", d0 + datetime.timedelta(days=30))],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_returnflag string, l_shipdate timestamp_ntz",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(1, d0), (2, d0)],
        "o_orderkey long, o_orderdate timestamp_ntz",
    ).write.parquet(opath)
    df = QUERIES["borda_supplier_ranking"](spark, str(tmp_path))
    rows = df.collect()
    assert [r.suppkey for r in rows] == [1, 2]
    assert rows[0].borda2x == 6 and rows[1].borda2x == 0
    compare(
        df,
        _conn_with({"lineitem": lpath, "orders": opath}),
        ORACLE["borda_supplier_ranking"],
    )


def test_substitute_pairs_either_or(spark, tmp_path):
    # 40 baskets, types X and Y each in 20, NEVER together: the
    # never-co-occurring pair enters via the dense join (s_ab = 0)
    # and the chi-square (=N=40) clears 3.84 -> one substitute pair
    lpath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    rows = []
    for ok in range(40):
        rows.append((ok, 1 if ok % 2 == 0 else 2))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(1, "X"), (2, "Y")], "p_partkey long, p_type string"
    ).write.parquet(ppath)
    df = QUERIES["substitute_pairs"](spark, str(tmp_path))
    rows2 = df.collect()
    assert len(rows2) == 1
    r = rows2[0]
    assert (r.type_a, r.type_b) == ("X", "Y") and r.support_ab == 0
    assert r.support_a == 20 and r.support_b == 20 and r.n_baskets == 40
    compare(
        df,
        _conn_with({"lineitem": lpath, "part": ppath}),
        ORACLE["substitute_pairs"],
    )

    # independent co-occurrence (every basket has both): dev = 0 and
    # the universal-type witnesses exclude it -> zero rows
    lpath2 = f"{tmp_path}/both/lineitem.parquet"
    spark.createDataFrame(
        [(ok, pk) for ok in range(6) for pk in (1, 2)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(lpath2)
    import shutil

    shutil.copytree(ppath, f"{tmp_path}/both/part.parquet")
    df2 = QUERIES["substitute_pairs"](spark, f"{tmp_path}/both")
    assert df2.count() == 0
    compare(
        df2,
        _conn_with({"lineitem": lpath2,
                    "part": f"{tmp_path}/both/part.parquet"}),
        ORACLE["substitute_pairs"],
    )


def test_brand_loyalty_switcher_vs_loyalist(spark, tmp_path):
    import datetime

    d = lambda k: datetime.datetime(2026, 1, 1) + datetime.timedelta(  # noqa: E731
        days=k
    )
    opath = f"{tmp_path}/orders.parquet"
    lpath = f"{tmp_path}/lineitem.parquet"
    ppath = f"{tmp_path}/part.parquet"
    # cust 1: A -> A -> A (two loyal transitions); cust 2: A -> B
    # (one defection from A); cust 3: single order, no transition
    spark.createDataFrame(
        [(1, 1, d(0)), (2, 1, d(1)), (3, 1, d(2)),
         (4, 2, d(0)), (5, 2, d(1)), (6, 3, d(0))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz",
    ).write.parquet(opath)
    spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1), (5, 2), (6, 1)],
        "l_orderkey long, l_partkey long",
    ).write.parquet(lpath)
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "p_partkey long, p_brand string"
    ).write.parquet(ppath)
    df = QUERIES["brand_loyalty_transition"](spark, str(tmp_path))
    got = {r.brand: r for r in df.collect()}
    assert got["A"].n_transitions == 3 and got["A"].n_retained == 2
    assert got["A"].loyalty_permille == 666
    assert "B" not in got  # B is never a transition SOURCE
    compare(
        df,
        _conn_with({"orders": opath, "lineitem": lpath, "part": ppath}),
        ORACLE["brand_loyalty_transition"],
    )
