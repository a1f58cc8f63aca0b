"""WARC parser robustness (sources/warc.py): Content-Length-driven
parsing, record skipping, malformed input."""

from __future__ import annotations

import pytest

from isidorus_web_scraper_spark.sources.warc import _parse_one


def _record(url: str, payload: str, wtype: str = "response") -> bytes:
    http = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{payload}"
    body = http if wtype == "response" else payload
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
        f"Content-Length: {len(body.encode('utf-8'))}\r\n\r\n"
        f"{body}\r\n\r\n"
    ).encode("utf-8")


def test_payload_containing_warc_magic_and_crlfs():
    # a body that LOOKS like a record boundary must not split the
    # record — Content-Length, not delimiter scanning, drives the walk
    evil = "before\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nafter"
    data = _record("http://a.test/1", evil) + _record("http://a.test/2", "ok")
    rows = _parse_one(data)
    assert [r[0] for r in rows] == ["http://a.test/1", "http://a.test/2"]
    assert rows[0][3] == evil


def test_non_response_records_skipped():
    data = (
        _record("", "software: test", wtype="warcinfo")
        + _record("http://a.test/req", "GET / HTTP/1.1", wtype="request")
        + _record("http://a.test/3", "hello")
    )
    rows = _parse_one(data)
    assert len(rows) == 1
    assert rows[0] == ("http://a.test/3", 200, "text/html", "hello")


def test_multibyte_payload_content_length_is_bytes():
    payload = "héllo wörld — ¶"  # multi-byte UTF-8
    rows = _parse_one(_record("http://a.test/u", payload) * 2)
    assert len(rows) == 2 and rows[0][3] == payload


def test_malformed_raises():
    with pytest.raises(ValueError, match="malformed"):
        _parse_one(b"NOT-A-WARC\r\n\r\n")


def test_cdx_offsets_slice_exact_records(spark, sf_small):
    """A CDX row's (file, offset, length) must slice the container
    bytes to EXACTLY one record: parse the slice alone and get the
    row's url, with the payload matching the digest's preimage."""
    import hashlib

    from pyspark.sql import functions as F

    from isidorus_web_scraper_spark.dataset_queries import warc_cdx_index
    from isidorus_web_scraper_spark.sources.warc import (
        _parse_one,
        warc_records_col,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    recs = docs.select(
        (F.col("doc_id") % 16).alias("g"),
        F.struct(
            F.col("doc_id"),
            warc_records_col(
                F.concat(F.lit("http://warc.test/doc"), F.col("doc_id")),
                F.col("text"),
            ).alias("rec"),
        ).alias("s"),
    )
    files = {
        r.g: r.data.encode("utf-8")
        for r in recs.groupBy("g")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("s")), lambda s: s["rec"]
                ),
                "",
            ).alias("data")
        )
        .collect()
    }
    cdx = warc_cdx_index(spark, sf_small).collect()
    assert len(cdx) == docs.count()
    for row in cdx:
        blob = files[row.warc_file]
        sl = blob[row.rec_offset : row.rec_offset + row.rec_length]
        parsed = _parse_one(sl)
        assert len(parsed) == 1
        url, status, _ctype, payload = parsed[0]
        assert url == row.url and status == 200
        assert hashlib.sha256(payload.encode("utf-8")).hexdigest() == row.digest
    # offsets tile each file exactly: sum of lengths == file size
    by_file = {}
    for row in cdx:
        by_file.setdefault(row.warc_file, []).append(row)
    for g, rows in by_file.items():
        rows.sort(key=lambda r: r.rec_offset)
        assert rows[0].rec_offset == 0
        for a, b in zip(rows, rows[1:]):
            assert a.rec_offset + a.rec_length == b.rec_offset
        assert rows[-1].rec_offset + rows[-1].rec_length == len(files[g])
