"""URL canonicalization (partitioning identity) + host extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.functions.url import canonicalize, host_col


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM/a/b", "http://example.com/a/b"),
        ("http://example.com:80/x", "http://example.com/x"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),
        ("http://example.com/a/../b", "http://example.com/b"),
        ("http://example.com/a/./b", "http://example.com/a/b"),
        ("http://example.com/a#frag", "http://example.com/a"),
        ("http://example.com", "http://example.com/"),
        ("http://example.com/a?q=1#f", "http://example.com/a?q=1"),
    ],
)
def test_canonicalize(raw, canon):
    assert canonicalize(raw) == canon


def test_seen_identity_is_raw_not_canonical():
    # the reference's seen set keys the RAW href string
    # (scraper_service.go:263-276) — canonicalization is for
    # partitioning only; two spellings stay distinct seen entries
    assert canonicalize("http://A.com/x") == canonicalize("http://a.com/x")
    assert "http://A.com/x" != "http://a.com/x"


def test_host_col(spark):
    df = spark.createDataFrame(
        [("http://H7.Test:8080/p1.html",), ("not a url",)], "url string"
    )
    hosts = [r[0] for r in df.select(host_col("url")).collect()]
    assert hosts[0] == "h7.test"
    assert hosts[1] is None
