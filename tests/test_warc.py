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
