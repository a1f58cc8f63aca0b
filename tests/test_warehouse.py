"""Warehouse semantics: atomic commits, MERGE upserts (J4/J5 analog),
predicate delete (J9), partial-round rollback."""

from __future__ import annotations

from isidorus_web_scraper_spark.sources.warehouse import Warehouse


def _wh(spark, tmp_path, name="wh"):
    return Warehouse(spark, str(tmp_path / name))


def test_append_and_props_pruning(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.append("pages", spark.createDataFrame(
        [(1, "u1", "c", None, 0)],
        "scraping_id long, url string, content string, summary string, round int",
    ), {"round": 0})
    wh.append("pages", spark.createDataFrame(
        [(1, "u2", "c", None, 1)],
        "scraping_id long, url string, content string, summary string, round int",
    ), {"round": 1})
    assert wh.read("pages").count() == 2
    assert [r.url for r in wh.read("pages", {"round": 1}).collect()] == ["u2"]


def test_merge_upsert_preserves_untouched_columns(spark, tmp_path):
    # J5: summary arrives for an existing page — update summary, keep
    # content (db_repository.go:101-118)
    wh = _wh(spark, tmp_path)
    wh.append("pages", spark.createDataFrame(
        [(1, "u1", "body", None, 0), (1, "u2", "body2", None, 0)],
        "scraping_id long, url string, content string, summary string, round int",
    ))
    updates = spark.createDataFrame(
        [(1, "u1", None, "the summary", None), (1, "u3", "new", None, 1)],
        "scraping_id long, url string, content string, summary string, round int",
    )
    wh.merge("pages", updates, ["scraping_id", "url"])
    rows = {r.url: r for r in wh.read("pages").collect()}
    assert rows["u1"].summary == "the summary"
    assert rows["u1"].content == "body"   # untouched column preserved
    assert rows["u2"].summary is None     # unmatched current row intact
    assert rows["u3"].content == "new"    # not-matched → insert


def test_delete_where(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    wh.append("links", spark.createDataFrame(
        [(1, "a", "b", 0), (2, "a", "c", 0)],
        "scraping_id long, source_url string, target_url string, round int",
    ))
    wh.delete_where("links", "scraping_id = 1")
    assert [r.scraping_id for r in wh.read("links").collect()] == [2]


def test_remove_commits_rollback(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    for rnd in (0, 1, 2):
        wh.append("frontier", spark.createDataFrame(
            [(1, 1, f"u{rnd}", 1, rnd)],
            "scraping_id long, user_id long, url string, depth int, round int",
        ), {"round": rnd})
    wh.remove_commits("frontier", lambda p: p.get("round", -1) >= 2)
    assert sorted(r.url for r in wh.read("frontier").collect()) == ["u0", "u1"]
    # manifest swap is atomic: re-reading still works
    assert wh.last_prop("frontier", "round") == 1


def test_overwrite_gc_and_empty_read(spark, tmp_path):
    wh = _wh(spark, tmp_path)
    df = spark.createDataFrame([(1, 1, "u", 1, 0)],
        "scraping_id long, user_id long, url string, depth int, round int")
    wh.append("frontier", df)
    wh.overwrite("frontier", df.limit(0))
    assert wh.read("frontier").count() == 0
    # unknown-but-schema'd table reads as empty with the right schema
    assert wh.read("seen").columns[0] == "scraping_id"


def test_delete_where_commit_pruning(spark, tmp_path):
    """delete_where with commit_pred must leave non-matching commits
    byte-identical (zero I/O — same staging dirs in the manifest) and
    rewrite only the matching ones, preserving their props."""
    from isidorus_web_scraper_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for rnd, sid in [(0, 1), (1, 1), (2, 2), (3, 2)]:
        wh.append(
            "pages",
            spark.createDataFrame(
                [(sid, f"http://s{sid}.test/r{rnd}", "c", None, rnd)],
                "scraping_id long, url string, content string, "
                "summary string, round int",
            ),
            {"round": rnd},
        )
    before = {
        c["props"]["round"]: c["dir"]
        for c in wh._read_manifest("pages")["commits"]
    }
    # delete scraping 1, which only wrote in rounds 0-1
    wh.delete_where(
        "pages", "scraping_id = 1", commit_pred=lambda p: p.get("round", 99) <= 1
    )
    after = {
        c["props"]["round"]: c["dir"]
        for c in wh._read_manifest("pages")["commits"]
    }
    assert after[2] == before[2] and after[3] == before[3]  # untouched dirs
    assert after[0] != before[0] and after[1] != before[1]  # rewritten
    rows = wh.read("pages").collect()
    assert sorted(r.scraping_id for r in rows) == [2, 2]
    # round props survived the rewrite: pruned reads still work
    assert wh.read("pages", {"round": 2}).count() == 1


def test_compact_collapses_commits(spark, tmp_path):
    from isidorus_web_scraper_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for rnd in range(6):
        wh.append(
            "links",
            spark.createDataFrame(
                [(1, f"http://s.test/{rnd}", f"http://t.test/{rnd}", rnd)],
                "scraping_id long, source_url string, target_url string, round int",
            ),
            {"round": rnd},
        )
    assert len(wh._read_manifest("links")["commits"]) == 6
    before = sorted(map(tuple, wh.read("links").collect()))
    import pytest

    # round tags are load-bearing: compact refuses without a bound
    with pytest.raises(ValueError):
        wh.compact("links", target_files=1)
    wh.compact("links", target_files=1, upto_round=6)
    manifest = wh._read_manifest("links")
    assert len(manifest["commits"]) == 1
    # the folded commit keeps its round span so delete pruning windows
    # and _next_round survive compaction
    assert manifest["commits"][0]["props"] == {
        "compacted": True, "round_min": 0, "round_max": 5
    }
    assert sorted(map(tuple, wh.read("links").collect())) == before
    import glob, os
    files = glob.glob(
        os.path.join(str(tmp_path / "wh"), "links", "commit-*", "*.parquet")
    )
    assert len(files) == 1  # bin-packed to one file


def test_compact_partial_and_refold(spark, tmp_path):
    """upto_round folds only completed rounds; refold_compacted=False
    leaves prior compactions alone (the in-crawl periodic mode); a later
    full refold collapses everything."""
    wh = _wh(spark, tmp_path)
    for rnd in range(6):
        wh.append(
            "links",
            spark.createDataFrame(
                [(1, f"http://s.test/{rnd}", f"http://t.test/{rnd}", rnd)],
                "scraping_id long, source_url string, target_url string, round int",
            ),
            {"round": rnd},
        )
    before = sorted(map(tuple, wh.read("links").collect()))
    wh.compact("links", upto_round=3, refold_compacted=False)
    m = wh._read_manifest("links")
    # rounds 0-2 folded, 3-5 untouched
    assert len(m["commits"]) == 4
    spans = [c["props"] for c in m["commits"] if c["props"].get("compacted")]
    assert spans == [{"compacted": True, "round_min": 0, "round_max": 2}]
    # a second periodic pass must NOT refold the compacted commit
    wh.compact("links", upto_round=5, refold_compacted=False)
    m = wh._read_manifest("links")
    assert len(m["commits"]) == 3  # [0-2], [3-4], round-5
    assert sorted(map(tuple, wh.read("links").collect())) == before
    # full refold collapses to one commit spanning everything
    wh.compact("links", upto_round=6, refold_compacted=True)
    m = wh._read_manifest("links")
    assert len(m["commits"]) == 1
    assert m["commits"][0]["props"] == {
        "compacted": True, "round_min": 0, "round_max": 5
    }
    assert sorted(map(tuple, wh.read("links").collect())) == before


def test_merge_insert_commits_carry_round_tags(spark, tmp_path):
    """Enrichment-inserted rows keep their round tag: a later round-pruned
    merge/delete must still see the commit as potentially matching its
    round (an untagged {} commit would be rewritten forever AND invisible
    to round-pruned reads)."""
    wh = _wh(spark, tmp_path)
    wh.append(
        "pages",
        spark.createDataFrame(
            [(1, "u1", "body", None, 0)],
            "scraping_id long, url string, content string, summary string, round int",
        ),
        {"round": 0},
    )
    updates = spark.createDataFrame(
        [(1, "u1", None, "s1", 0), (1, "u2", "new", None, 0), (1, "u3", "new3", None, 2)],
        "scraping_id long, url string, content string, summary string, round int",
    )
    wh.merge(
        "pages",
        updates,
        ["scraping_id", "url", "round"],
        commit_pred=lambda p: p.get("round") in (None, 0, 2),
    )
    props = [c["props"] for c in wh._read_manifest("pages")["commits"]]
    rounds = [p.get("round") for p in props]
    assert 0 in rounds and 2 in rounds
    assert None not in rounds
    # every rewrite/insert carries the asof poison flag (no round bound
    # was passed), so snapshot reads can't mistake it for history
    assert all(p.get("merged") or "asof_valid_from" in p for p in props)
    # pruned reads see the inserted rows under their round
    assert sorted(r.url for r in wh.read("pages", {"round": 0}).collect()) == ["u1", "u2"]
    assert [r.url for r in wh.read("pages", {"round": 2}).collect()] == ["u3"]


def test_merge_does_not_drop_concurrent_append(spark, tmp_path):
    """A commit appended while a merge is rewriting must survive the
    merge's manifest swap (the CAS graft): the crawl's threaded fan-out
    racing enrich() was the data-loss scenario."""
    import threading

    wh = _wh(spark, tmp_path)
    schema = "scraping_id long, url string, content string, summary string, round int"
    wh.append(
        "pages",
        spark.createDataFrame([(1, "u1", "body", None, 0)], schema),
        {"round": 0},
    )

    # monkeypatch _stage to append a racing commit mid-merge, inside the
    # window between the merge's manifest snapshot and its final swap
    orig_stage = wh._stage
    raced = threading.Event()

    def racing_stage(table, df):
        if not raced.is_set():
            raced.set()
            orig_append(
                "pages",
                spark.createDataFrame([(9, "u-racer", "r", None, 7)], schema),
                {"round": 7},
            )
        return orig_stage(table, df)

    orig_append = wh.append
    wh._stage = racing_stage
    try:
        updates = spark.createDataFrame([(1, "u1", None, "s1", 0)], schema)
        wh.merge(
            "pages",
            updates,
            ["scraping_id", "url", "round"],
            commit_pred=lambda p: p.get("round") in (None, 0),
        )
    finally:
        wh._stage = orig_stage
    rows = {r.url: r for r in wh.read("pages").collect()}
    assert rows["u1"].summary == "s1"          # merge applied
    assert "u-racer" in rows                   # concurrent append survived
    assert wh.read("pages", {"round": 7}).count() == 1


def test_merge_nopred_does_not_drop_concurrent_append(spark, tmp_path):
    """The no-commit_pred merge path (small tables: jobs) must give the
    same CAS guarantee: engine B's start() append racing engine A's
    _finalize merge on a shared warehouse must survive — the old
    overwrite()-based path dropped it from the manifest AND deleted its
    data dir."""
    import threading

    wh = _wh(spark, tmp_path)
    schema = "scraping_id long, url string, content string, summary string, round int"
    wh.append(
        "pages",
        spark.createDataFrame([(1, "u1", "body", None, 0)], schema),
        {"round": 0},
    )

    orig_stage = wh._stage
    raced = threading.Event()

    def racing_stage(table, df):
        if not raced.is_set():
            raced.set()
            orig_append(
                "pages",
                spark.createDataFrame([(9, "u-racer", "r", None, 7)], schema),
                {"round": 7},
            )
        return orig_stage(table, df)

    orig_append = wh.append
    wh._stage = racing_stage
    try:
        updates = spark.createDataFrame([(1, "u1", None, "s1", 0)], schema)
        wh.merge("pages", updates, ["scraping_id", "url", "round"])
    finally:
        wh._stage = orig_stage
    rows = {r.url: r for r in wh.read("pages").collect()}
    assert rows["u1"].summary == "s1"          # merge applied
    assert "u-racer" in rows                   # concurrent append survived
    assert wh.read("pages", {"round": 7}).count() == 1


def test_round_exact_read_refuses_folded_round(spark, tmp_path):
    """compact() past a still-live round must not let a round-exact
    pruned read silently return the unfolded subset — read() raises."""
    import pytest

    wh = _wh(spark, tmp_path)
    schema = "scraping_id long, url string, content string, summary string, round int"
    for rd in range(3):
        wh.append(
            "frontier_t",
            spark.createDataFrame([(1, f"u{rd}", "c", None, rd)], schema),
            {"round": rd},
        )
    # fold rounds 0..1 (upto_round=2): round-exact reads of 0/1 now hit
    # the compacted span and must refuse; round 2 still works.
    wh.compact("frontier_t", upto_round=2)
    assert wh.read("frontier_t", {"round": 2}).count() == 1
    with pytest.raises(RuntimeError, match="folded into compacted commit"):
        wh.read("frontier_t", {"round": 1})
    # unpruned reads are unaffected
    assert wh.read("frontier_t").count() == 3


def test_read_asof_snapshot(spark, tmp_path):
    """read_asof = the table as of the end of round R: newer commits'
    FILES are never opened (inputFiles pin), untagged init commits
    always qualify, and a compaction folding across the asof boundary
    fails loudly instead of returning a silent subset."""
    import pytest

    wh = _wh(spark, tmp_path)
    schema = (
        "scraping_id long, url string, content string, summary string, round int"
    )
    wh.append(  # untagged init commit (start()-style)
        "pages", spark.createDataFrame([(1, "seed", "c", None, -1)], schema)
    )
    for r in range(4):
        wh.append(
            "pages",
            spark.createDataFrame([(1, f"u{r}", "c", None, r)], schema),
            {"round": r},
        )
    snap = wh.read_asof("pages", 1)
    assert sorted(x.url for x in snap.collect()) == ["seed", "u0", "u1"]
    # manifest pruning, not a filter: round 2-3 files never touched
    assert len(snap.inputFiles()) < len(wh.read("pages").inputFiles())
    # full read unaffected
    assert wh.read("pages").count() == 5
    # fold rounds 0..2 (upto_round is exclusive) into one compacted
    # commit: asof at the fold's max (or beyond) still works; asof
    # INSIDE the span fails loudly
    wh.compact("pages", upto_round=3)
    assert sorted(x.url for x in wh.read_asof("pages", 2).collect()) == [
        "seed", "u0", "u1", "u2",
    ]
    assert wh.read_asof("pages", 3).count() == 5
    with pytest.raises(RuntimeError, match="asof"):
        wh.read_asof("pages", 1)


def test_read_asof_refuses_rewritten_commits(spark, tmp_path):
    """A merge/delete rewrites committed files in place: their contents
    are post-rewrite, so a snapshot read below the rewrite's round bound
    (or at any bound when the rewriter passed none) must fail loudly —
    the round tag alone would silently pass new rows off as history."""
    import pytest

    wh = _wh(spark, tmp_path)
    schema = (
        "scraping_id long, url string, content string, summary string, round int"
    )
    for r in range(3):
        wh.append(
            "pages",
            spark.createDataFrame([(1, f"u{r}", "c", None, r)], schema),
            {"round": r},
        )
    # enrich round-1 rows during "round 3": stamped asof_valid_from=3
    upd = spark.createDataFrame([(1, "u1", None, "sum", 1)], schema)
    wh.merge(
        "pages",
        upd,
        ["scraping_id", "url", "round"],
        commit_pred=lambda p: p.get("round") == 1,
        asof_valid_from=3,
    )
    # bounds below the rewrite refuse (they would include the commit)
    with pytest.raises(RuntimeError, match="rewritten in place"):
        wh.read_asof("pages", 1)
    with pytest.raises(RuntimeError, match="rewritten in place"):
        wh.read_asof("pages", 2)
    # round-0 snapshot never touches the rewritten commit: still fine
    assert [x.url for x in wh.read_asof("pages", 0).collect()] == ["u0"]
    # at/after the stamp the snapshot is the real table state
    assert sorted(
        (x.url, x.summary) for x in wh.read_asof("pages", 3).collect()
    ) == [("u0", None), ("u1", "sum"), ("u2", None)]
    # compaction must not launder the stamp away
    wh.compact("pages", upto_round=3, refold_compacted=True)
    with pytest.raises(RuntimeError, match="rewritten in place"):
        wh.read_asof("pages", 2)
    assert wh.read_asof("pages", 3).count() == 3
    # an UNSTAMPED rewrite (legacy whole-table merge) poisons every bound
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    wh2.append(
        "jobs",
        spark.createDataFrame(
            [(1, "s", 1, "PENDING", 0, 0, None)],
            "scraping_id long, url string, depth int, status string, "
            "links_count long, created_round int, completed_round int",
        ),
        {"round": 0},
    )
    wh2.merge(
        "jobs",
        spark.createDataFrame(
            [(1, "s", 1, "COMPLETED", 2, 0, 1)],
            "scraping_id long, url string, depth int, status string, "
            "links_count long, created_round int, completed_round int",
        ),
        ["scraping_id"],
    )
    with pytest.raises(RuntimeError, match="no round bound"):
        wh2.read_asof("jobs", 99)


def test_append_rows_driver_path_unions_with_spark_commits(spark, tmp_path):
    """append_rows (driver-side pyarrow write — the per-round metrics
    path) must produce commits that read back seamlessly alongside
    Spark-written commits, with identical schema and round pruning."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ddl = (
        "scraping_id long, round int, urls_in long, fetched long, "
        "fetch_errors long, links_extracted long, new_urls long, "
        "deferred long, robots_blocked long, wall_ms long"
    )
    wh.append(
        "metrics",
        spark.createDataFrame([(-1, 0, 5, 5, 0, 10, 4, 0, 0, 123)], ddl),
        {"round": 0},
    )
    wh.append_rows(
        "metrics", [(-1, 1, 4, 4, 0, 8, 0, 0, 0, 456)], ddl, {"round": 1}
    )
    allrows = wh.read("metrics")
    assert allrows.schema == spark.createDataFrame([], ddl).schema
    got = sorted((r.round, r.urls_in, r.wall_ms) for r in allrows.collect())
    assert got == [(0, 5, 123), (1, 4, 456)]
    only1 = wh.read("metrics", {"round": 1}).collect()
    assert [(r.round, r.wall_ms) for r in only1] == [(1, 456)]
