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
