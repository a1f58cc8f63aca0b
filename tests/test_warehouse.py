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
    wh.compact("links", target_files=1)
    manifest = wh._read_manifest("links")
    assert len(manifest["commits"]) == 1
    assert manifest["commits"][0]["props"] == {"compacted": True}
    assert sorted(map(tuple, wh.read("links").collect())) == before
    import glob, os
    files = glob.glob(
        os.path.join(str(tmp_path / "wh"), "links", "commit-*", "*.parquet")
    )
    assert len(files) == 1  # bin-packed to one file
