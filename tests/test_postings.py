"""Posting-list search index (sources/postings.py + plans/api.py
search_pages_indexed): probe correctness, partition pruning (no corpus
scan for ranking), engine round-incremental maintenance, and
scan-parity for whole-token terms."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.sources.postings import (
    build_postings,
    probe_postings,
    write_postings,
)


def test_build_probe_roundtrip_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "u1", "spark crawl spark index"),
            (1, "u2", "crawl crawl partition"),
            (2, "u3", "index spark"),
        ],
        "scraping_id long, url string, text string",
    )
    p = build_postings(df, ["scraping_id", "url"], "text", buckets=16)
    path = str(tmp_path / "idx")
    write_postings(p, path)

    got = {
        (r.scraping_id, r.url): r.frequency
        for r in probe_postings(spark, path, "spark", 16).collect()
    }
    assert got == {(1, "u1"): 2, (2, "u3"): 1}
    assert probe_postings(spark, path, "absent-term", 16).count() == 0

    # the probe plan must show partition pruning on term_bucket — the
    # scan reads 1/B of the index, never the corpus
    plan = (
        probe_postings(spark, path, "spark", 16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan


def test_engine_indexed_search_equals_scan(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.api import (
        search_pages,
        search_pages_indexed,
    )
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    docs = generate_documents(spark, n_hosts=5).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=False,  # scan search also matches summary;
            index_postings=True,       # the index serves content tokens
            compact_every_rounds=None,  # keep live round dirs for the
            # rollback assertions below (folding is pinned separately)
        ),
    )
    eng.start([(95, 1, "http://h0.test/p0.html", 3)])
    eng.run()

    # 'partition' is a corpus vocabulary word with no superstring word,
    # so token search == substring search here (see search_pages_indexed
    # docstring for the general token-vs-substring distinction)
    scan = {
        (r.url, r.scraping_id, r.score, tuple(r.highlights))
        for r in search_pages(eng.wh, "partition", 1).collect()
    }
    probe = {
        (r.url, r.scraping_id, r.score, tuple(r.highlights))
        for r in search_pages_indexed(
            eng.wh, "partition", 1, eng.postings_path
        ).collect()
    }
    assert probe == scan and len(scan) > 0

    # ACL: other users see nothing
    assert (
        search_pages_indexed(eng.wh, "partition", 99, eng.postings_path).count()
        == 0
    )

    # partial-round rollback removes the round's postings directory
    rounds = sorted(
        int(d.split("=")[1])
        for d in os.listdir(eng.postings_path)
        if d.startswith("round=")
    )
    assert rounds and rounds[0] == 0
    eng._rollback_partial(rounds[-1])
    left = {
        int(d.split("=")[1])
        for d in os.listdir(eng.postings_path)
        if d.startswith("round=")
    }
    assert left == set(rounds[:-1])
    docs.unpersist()


# ---------------------------------------------------------------------------
# Compaction (OpenSearch segment-merge analog): completed rounds fold into
# a per-bucket compacted store; probes open O(1) files per bucket; rounds
# beyond the fold keep their rollback-unit dirs; the crash window between
# meta swap and dir GC never double-counts.
# ---------------------------------------------------------------------------
def _round_postings(spark, rnd, docs):
    df = spark.createDataFrame(
        [(sid, u, 1, rnd, text) for (sid, u, text) in docs],
        "scraping_id long, url string, user_id long, round int, text string",
    )
    return build_postings(
        df, ["scraping_id", "url", "user_id", "round"], "text", buckets=8
    )


def test_compaction_bounds_probe_files(spark, tmp_path):
    from isidorus_web_scraper_spark.sources.postings import compact_postings

    path = str(tmp_path / "idx")
    for rnd in range(6):
        write_postings(
            _round_postings(
                spark, rnd, [(1, f"u{rnd}", f"spark round{rnd} spark index")]
            ),
            path,
            partition_cols=["round", "term_bucket"],
        )
    before = {
        (r.scraping_id, r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    }
    assert len(before) == 6

    compact_postings(spark, path, upto_round=3)
    after = {
        (r.scraping_id, r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    }
    assert after == before  # fold changes layout, never content
    # live dirs: exactly the foldable rounds are gone
    live = {d for d in os.listdir(path) if d.startswith("round=")}
    assert live == {"round=4", "round=5"}
    # the probe's file budget is bounded (partition pruning is pinned
    # below; inputFiles() reports pre-pruning so we assert the LAYOUT):
    # the bucket holds exactly 1 compacted file + ≤1 per unfolded round
    b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("spark")), F.lit(8)).cast("int")
    ).first()[0]

    def bucket_files(store: str) -> int:
        d = os.path.join(path, store, f"term_bucket={b}")
        if not os.path.isdir(d):
            return 0
        return len([f for f in os.listdir(d) if f.endswith(".parquet")])

    from isidorus_web_scraper_spark.sources.postings import _read_meta

    meta = _read_meta(path)
    assert len(meta["compact_dirs"]) == 1
    assert bucket_files(meta["compact_dirs"][0]) == 1
    assert all(bucket_files(d) <= 1 for d in live)

    # second fold re-folds the store + remaining rounds into one
    compact_postings(spark, path, upto_round=5)
    final = {
        (r.scraping_id, r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    }
    assert final == before
    assert not [d for d in os.listdir(path) if d.startswith("round=")]
    meta = _read_meta(path)
    assert len(meta["compact_dirs"]) == 1
    assert bucket_files(meta["compact_dirs"][0]) == 1  # O(1) regardless of rounds

    # partition pruning survives the union plan (both stores prune)
    plan = (
        probe_postings(spark, path, "spark", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan


def test_compaction_crash_window_never_double_counts(spark, tmp_path):
    import shutil

    from isidorus_web_scraper_spark.sources.postings import compact_postings

    path = str(tmp_path / "idx")
    for rnd in range(3):
        write_postings(
            _round_postings(spark, rnd, [(1, f"u{rnd}", "spark spark")]),
            path,
            partition_cols=["round", "term_bucket"],
        )
    keep = str(tmp_path / "keep")
    shutil.copytree(os.path.join(path, "round=1"), keep)
    compact_postings(spark, path, upto_round=2)
    # simulate a crash between the meta swap and the dir GC: a folded
    # round dir reappears on disk — the folded_upto_round bound must
    # keep it invisible
    shutil.copytree(keep, os.path.join(path, "round=1"))
    got = {
        (r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    }
    assert got == {("u0", 0): 2, ("u1", 1): 2, ("u2", 2): 2}


def test_engine_finalize_folds_postings(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.api import (
        search_pages,
        search_pages_indexed,
    )
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    docs = generate_documents(spark, n_hosts=5).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=False,
            index_postings=True,
            compact_every_rounds=16,  # finalize runs the full fold
        ),
    )
    eng.start([(96, 1, "http://h0.test/p0.html", 3)])
    eng.run()

    # all rounds folded; index-served search still equals the scan
    assert not [
        d for d in os.listdir(eng.postings_path) if d.startswith("round=")
    ]
    scan = {
        (r.url, r.scraping_id, r.score, tuple(r.highlights))
        for r in search_pages(eng.wh, "partition", 1).collect()
    }
    probe = {
        (r.url, r.scraping_id, r.score, tuple(r.highlights))
        for r in search_pages_indexed(
            eng.wh, "partition", 1, eng.postings_path
        ).collect()
    }
    assert probe == scan and len(scan) > 0
    docs.unpersist()


# ---------------------------------------------------------------------------
# Character n-gram (substring) index — pg_trgm/Code-Search design: AND
# of trigram posting lists → verified point-retrieval. Must equal the
# search_pages scan EXACTLY, including substring-only matches (tf=0)
# and summary-only matches; short terms delegate to the scan.
# ---------------------------------------------------------------------------
def test_gram_candidates_are_and_of_grams(spark, tmp_path):
    from isidorus_web_scraper_spark.sources.postings import (
        build_grams,
        probe_gram_candidates,
    )

    df = spark.createDataFrame(
        [
            (1, "abcde"),          # contains all grams of "abcde"
            (2, "abc xx cde"),     # grams abc+cde but NOT bcd → candidate iff AND holds
            (3, "zzzzz"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "g")
    write_postings(build_grams(df, ["doc_id"], ["text"], 3, 8), path)
    got = {r.doc_id for r in probe_gram_candidates(spark, path, "abcde", 3, 8).collect()}
    assert got == {1}  # doc 2 lacks "bcd"; AND-intersection rejects it
    # gram probe prunes partitions like the token probe
    plan = (
        probe_gram_candidates(spark, path, "abcde", 3, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "term_bucket" in plan, plan


def test_engine_substring_search_equals_scan(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.api import (
        search_pages,
        search_pages_indexed_substring,
    )
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    docs = generate_documents(spark, n_hosts=5).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=True,  # grams must cover summary matches too
            index_grams=True,
            compact_every_rounds=16,  # finalize folds the grams store
        ),
    )
    eng.start([(97, 1, "http://h0.test/p0.html", 3)])
    eng.run()

    def rows(df):
        return {
            (r.url, r.scraping_id, r.score, tuple(r.highlights))
            for r in df.collect()
        }

    # token term, substring-only term (inside "partition"/"politeness" —
    # scores are 0, match purely by contains), and a term absent entirely
    for term in ("partition", "artiti", "olite", "qqqqq"):
        scan = rows(search_pages(eng.wh, term, 1))
        probe = rows(
            search_pages_indexed_substring(eng.wh, term, 1, eng.grams_path)
        )
        assert probe == scan, term
    assert len(rows(search_pages(eng.wh, "artiti", 1))) > 0  # non-vacuous

    # short term: no grams to intersect — delegates to the scan
    assert rows(
        search_pages_indexed_substring(eng.wh, "we", 1, eng.grams_path)
    ) == rows(search_pages(eng.wh, "we", 1))

    # finalize folded the grams store: no live round dirs remain
    assert not [
        d for d in os.listdir(eng.grams_path) if d.startswith("round=")
    ]
    docs.unpersist()


def test_gram_rollback_removes_partial_round(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    docs = generate_documents(spark, n_hosts=3).persist()
    cfg = CrawlConfig(
        bloom_expected_urls=4096,
        default_budget=1_000_000_000,
        summarizer_enabled=False,
        index_grams=True,
        compact_every_rounds=None,  # keep live round dirs visible
    )
    eng = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=cfg)
    eng.start([(98, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    rounds = sorted(
        d for d in os.listdir(eng.grams_path) if d.startswith("round=")
    )
    assert rounds  # incremental writes happened
    # simulate a torn round: drop the last round's metrics commit, keep
    # its gram dir — _rollback_partial must remove exactly that dir
    last = max(int(d.split("=")[1]) for d in rounds)
    eng.wh.remove_commits("metrics", lambda p: p.get("round", -1) >= last)
    resumed = CrawlEngine(spark, str(tmp_path / "w"), documents=docs, config=cfg)
    resumed._rollback_partial(resumed._next_round())
    left = sorted(
        d for d in os.listdir(eng.grams_path) if d.startswith("round=")
    )
    assert left == [d for d in rounds if int(d.split("=")[1]) < last]
    docs.unpersist()


def test_leveled_compaction_linear_io(spark, tmp_path):
    """refold=False (the engine's periodic cadence): each pass folds
    ONLY the new rounds into an additional store — W3's
    refold_compacted=False analog. Content never changes; finalize's
    refold=True collapses all stores to one."""
    from isidorus_web_scraper_spark.sources.postings import (
        _read_meta,
        compact_postings,
    )

    path = str(tmp_path / "idx")
    for rnd in range(6):
        write_postings(
            _round_postings(spark, rnd, [(1, f"u{rnd}", "spark spark")]),
            path,
            partition_cols=["round", "term_bucket"],
        )
    before = {
        (r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    }

    compact_postings(spark, path, upto_round=1, refold=False)
    compact_postings(spark, path, upto_round=3, refold=False)
    meta = _read_meta(path)
    assert len(meta["compact_dirs"]) == 2  # levels coexist, no re-read
    assert {d for d in os.listdir(path) if d.startswith("round=")} == {
        "round=4",
        "round=5",
    }
    assert {
        (r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    } == before

    # a refold pass with NO new live rounds still collapses the levels
    compact_postings(spark, path, upto_round=3, refold=True)
    meta = _read_meta(path)
    assert len(meta["compact_dirs"]) == 1
    assert {
        (r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    } == before

    compact_postings(spark, path, upto_round=5, refold=True)
    meta = _read_meta(path)
    assert len(meta["compact_dirs"]) == 1
    assert not [d for d in os.listdir(path) if d.startswith("round=")]
    assert {
        (r.url, r.round): r.frequency
        for r in probe_postings(spark, path, "spark", 8).collect()
    } == before


def test_phrase_probe_duplicate_terms_and_gaps(spark, tmp_path):
    from isidorus_web_scraper_spark.sources.postings import (
        build_positional_postings,
        probe_phrase,
        write_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "do it do it now"),
            (2, "do it and do it"),
            (3, "do do it"),
            (4, "it do"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pos")
    write_postings(
        build_positional_postings(docs, ["doc_id"], "text"), path,
        mode="overwrite",
    )
    # duplicate-term phrase: the SAME position array intersects at two
    # offsets — only doc 1 has the full consecutive run
    got = {
        r.doc_id: r.n_occurrences
        for r in probe_phrase(spark, path, "do it do it").collect()
    }
    assert got == {1: 1}
    got2 = {
        r.doc_id: r.n_occurrences
        for r in probe_phrase(spark, path, "do it").collect()
    }
    assert got2 == {1: 2, 2: 2, 3: 1}


def test_indexed_and_search_equals_scan_intersection(spark, tmp_path):
    from isidorus_web_scraper_spark.plans.api import (
        search_pages,
        search_pages_indexed_and,
    )
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine

    docs = generate_documents(spark, n_hosts=5).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=False,
            index_postings=True,
        ),
    )
    eng.start([(96, 1, "http://h0.test/p0.html", 3)])
    eng.run()

    # conjunction == intersection of the single-term scan results,
    # scored by the sum of the per-term scores ('partition'/'bloom'
    # are corpus vocabulary words with no superstring word, so token
    # search == substring scan)
    terms = ["partition", "bloom"]
    per_term = [
        {r.url: r.score for r in search_pages(eng.wh, t, 1).collect()}
        for t in terms
    ]
    want = {
        url: per_term[0][url] + per_term[1][url]
        for url in set(per_term[0]) & set(per_term[1])
    }
    got = {
        r.url: r.score
        for r in search_pages_indexed_and(
            eng.wh, terms, 1, eng.postings_path
        ).collect()
    }
    assert got == want and len(want) > 0

    # duplicate query terms collapse to set semantics
    dup = {
        r.url: r.score
        for r in search_pages_indexed_and(
            eng.wh, ["bloom", "partition", "bloom"], 1, eng.postings_path
        ).collect()
    }
    assert dup == want

    # a never-indexed term empties the conjunction; ACL isolates users
    assert (
        search_pages_indexed_and(
            eng.wh, ["partition", "zzzznotaword"], 1, eng.postings_path
        ).count()
        == 0
    )
    assert (
        search_pages_indexed_and(
            eng.wh, terms, 99, eng.postings_path
        ).count()
        == 0
    )


def test_probe_near_semantics(spark, tmp_path):
    from isidorus_web_scraper_spark.sources.postings import (
        build_positional_postings,
        probe_near,
        write_postings,
    )
    import pytest

    docs = spark.createDataFrame(
        [
            (1, "a x x b"),          # dist 3: on the k boundary
            (2, "a x x x b"),        # dist 4: outside NEAR/3
            (3, "b a"),              # dist 1, order-insensitive
            (4, "a q a q b q b"),    # dists |0-4|,|0-6|,|2-4|,|2-6| → only 2 within
            (5, "a only here"),      # missing b → excluded
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "pos")
    write_postings(
        build_positional_postings(docs, ["doc_id"], "text"), path,
        mode="overwrite",
    )
    got = {
        r.doc_id: (r.min_dist, r.n_pairs)
        for r in probe_near(spark, path, "a", "b", 3).collect()
    }
    assert got == {1: (3, 1), 3: (1, 1), 4: (2, 1)}
    with pytest.raises(ValueError):
        probe_near(spark, path, "a", "a", 3)


def test_search_pages_near_over_engine_index(spark, tmp_path):
    from isidorus_web_scraper_spark.corpus import generate_documents
    from isidorus_web_scraper_spark.plans.api import (
        rebuild_positional_postings,
        search_pages_near,
    )
    from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pyspark.sql import functions as F

    docs = generate_documents(spark, n_hosts=5).persist()
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            default_budget=1_000_000_000,
            summarizer_enabled=False,
        ),
    )
    eng.start([(97, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    pos_path = str(tmp_path / "pos-index")
    rebuild_positional_postings(eng.wh, pos_path)

    a, b, k = "partition", "bloom", 5
    got = {
        (r.url, r.scraping_id): (r.min_dist, r.n_pairs)
        for r in search_pages_near(eng.wh, a, b, 1, pos_path, k).collect()
    }

    # scan-path recount straight from pages content
    pages = eng.wh.read("pages")
    pos = pages.select(
        "url",
        "scraping_id",
        F.posexplode(F.split(F.lower("content"), " ", -1)).alias(
            "pos", "token"
        ),
    ).filter(F.col("token").isin(a, b))
    pa = pos.filter(F.col("token") == a).selectExpr(
        "url", "scraping_id", "pos AS pos_a"
    )
    pb = pos.filter(F.col("token") == b).selectExpr(
        "url AS url_b", "scraping_id AS sid_b", "pos AS pos_b"
    )
    want = {
        (r.url, r.scraping_id): (r.min_dist, r.n_pairs)
        for r in pa.join(
            pb,
            (pa.url == pb.url_b)
            & (pa.scraping_id == pb.sid_b)
            & (F.abs(pa.pos_a - pb.pos_b) <= k),
        )
        .groupBy("url", "scraping_id")
        .agg(
            F.min(F.abs(F.col("pos_a") - F.col("pos_b"))).alias("min_dist"),
            F.count("*").alias("n_pairs"),
        )
        .collect()
    }
    assert got == want and len(want) > 0

    # ACL: another user sees nothing
    assert search_pages_near(eng.wh, a, b, 99, pos_path, k).count() == 0
