"""CrawlConfig.archive_warc: the crawl's WARC archive sink. The
warc_store blobs must parse back (via the real ingest parser) to
exactly the crawled pages; the warc_cdx byte offsets must slice each
record out of its blob byte-exactly; offsets must tile each file.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from isidorus_web_scraper_spark.sources.warc import parse_warc_files


def _html(links, body="payload text"):
    return (
        f"<html><body><p>{body}</p>"
        + "".join(f'<a href="{u}">l</a>' for u in links)
        + "</body></html>"
    )


def _crawl(spark, tmp_path, **cfg_kw):
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/p0.html",
                _html(
                    ["http://h0.test/p1.html", "http://h1.test/p2.html"],
                    "root page",
                ),
            ),
            ("http://h0.test/p1.html", _html([], "one \r\n WARC/1.0 trap")),
            ("http://h1.test/p2.html", _html([], "two")),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            max_rounds=10,
            archive_warc=True,
            warc_files_per_round=2,
            **cfg_kw,
        ),
    )
    eng.start([(60, 1, "http://h0.test/p0.html", 2)])
    eng.run()
    return eng


def test_archive_parses_back_to_pages(spark, tmp_path):
    eng = _crawl(spark, tmp_path)
    blobs = eng.wh.read("warc_store")
    parsed = parse_warc_files(blobs.select("data"))
    got = {(r.url, r.payload) for r in parsed.collect()}
    want = {
        (r.url, r.content) for r in eng.wh.read("pages").collect()
    }
    assert got == want and len(want) == 3
    # one capture per URL even with multiple discovery paths
    assert parsed.count() == 3


def test_cdx_offsets_slice_records_byte_exactly(spark, tmp_path):
    eng = _crawl(spark, tmp_path)
    blobs = {
        (r["round"], r.warc_file): bytes(r.data)
        for r in eng.wh.read("warc_store").collect()
    }
    cdx = eng.wh.read("warc_cdx").collect()
    assert len(cdx) == 3
    seen_urls = set()
    for row in cdx:
        blob = blobs[(row["round"], row.warc_file)]
        rec = blob[row.rec_offset : row.rec_offset + row.rec_length]
        assert rec.startswith(b"WARC/1.0\r\n")
        assert f"WARC-Target-URI: {row.url}\r\n".encode() in rec
        one = parse_warc_files(
            spark.createDataFrame([(rec,)], "data binary")
        ).collect()
        assert len(one) == 1 and one[0].url == row.url
        seen_urls.add(row.url)
    assert len(seen_urls) == 3
    # offsets tile every file exactly: sum of lengths == blob size
    by_file: dict = {}
    for row in cdx:
        k = (row["round"], row.warc_file)
        by_file.setdefault(k, 0)
        by_file[k] += row.rec_length
    for k, total in by_file.items():
        assert total == len(blobs[k])


def test_digest_matches_content_sha256(spark, tmp_path):
    import hashlib

    eng = _crawl(spark, tmp_path)
    contents = {
        r.url: r.content for r in eng.wh.read("pages").collect()
    }
    for row in eng.wh.read("warc_cdx").collect():
        want = hashlib.sha256(contents[row.url].encode()).hexdigest()
        assert row.digest == want


def test_warc_file_ids_are_pmod_nonnegative(spark, tmp_path):
    eng = _crawl(spark, tmp_path)
    files = {r.warc_file for r in eng.wh.read("warc_cdx").collect()}
    assert all(0 <= f < 2 for f in files)  # warc_files_per_round=2


def test_delete_scraping_gcs_warc_archive(spark, tmp_path):
    from isidorus_web_scraper_spark.plans.api import delete_scraping

    # scraping 61 owns p0/p1/p2 via links; scraping 62 independently
    # seeds p2 — after deleting 61, p2's capture must SURVIVE (still
    # referenced) while p0/p1's content becomes unrecoverable
    docs = spark.createDataFrame(
        [
            (
                "http://h0.test/p0.html",
                _html(
                    ["http://h0.test/p1.html", "http://h1.test/p2.html"],
                    "root page",
                ),
            ),
            ("http://h0.test/p1.html", _html([], "secret-to-forget")),
            ("http://h1.test/p2.html", _html([], "shared page")),
        ],
        "doc_id string, html string",
    )
    eng = CrawlEngine(
        spark,
        str(tmp_path / "w"),
        documents=docs,
        config=CrawlConfig(
            bloom_expected_urls=4096,
            max_rounds=10,
            archive_warc=True,
            warc_files_per_round=2,
        ),
    )
    eng.start(
        [
            (61, 1, "http://h0.test/p0.html", 2),
            (62, 2, "http://h1.test/p2.html", 1),
        ]
    )
    eng.run()
    before = b"".join(
        bytes(r.data) for r in eng.wh.read("warc_store").collect()
    )
    assert b"secret-to-forget" in before and b"shared page" in before

    delete_scraping(eng.wh, 61, 1)

    blobs = {
        (r["round"], r.warc_file): bytes(r.data)
        for r in eng.wh.read("warc_store").collect()
    }
    archive = b"".join(blobs.values())
    assert b"secret-to-forget" not in archive  # forgotten content gone
    assert b"root page" not in archive
    assert b"shared page" in archive  # still referenced by scraping 62
    cdx = eng.wh.read("warc_cdx").collect()
    assert {r.url for r in cdx} == {"http://h1.test/p2.html"}
    # rewritten offsets still slice + tile byte-exactly
    by_file: dict = {}
    for row in cdx:
        blob = blobs[(row["round"], row.warc_file)]
        rec = blob[row.rec_offset : row.rec_offset + row.rec_length]
        assert rec.startswith(b"WARC/1.0\r\n")
        assert f"WARC-Target-URI: {row.url}\r\n".encode() in rec
        k = (row["round"], row.warc_file)
        by_file[k] = by_file.get(k, 0) + row.rec_length
    for k, total in by_file.items():
        assert total == len(blobs[k])
    # parse-back equals the surviving pages
    from isidorus_web_scraper_spark.sources.warc import parse_warc_files

    got = {
        (r.url, r.payload)
        for r in parse_warc_files(
            eng.wh.read("warc_store").select("data")
        ).collect()
    }
    want = {
        (r.url, r.content) for r in eng.wh.read("pages").collect()
    }
    assert got == want
