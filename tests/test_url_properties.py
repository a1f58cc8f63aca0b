"""Property-based canonicalizer parity: the pure-JVM canonical_url_col
must equal the plain-Python canonicalize() byte-for-byte on RANDOM
crawl-admissible URLs (absolute http/https composed from adversarial
parts: mixed-case schemes/hosts, default and odd ports, dot-segments,
empty segments, queries and fragments in odd positions) — the fixed
list in test_url.py pins known traps; this searches the space between
them. Also pins canonicalize() idempotence: the canonical form must be
a fixed point, or re-canonicalizing at different pipeline stages would
split one URL's partition identity."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.functions.url import (
    canonical_url_col,
    canonicalize,
)

scheme = st.sampled_from(["http", "HTTP", "https", "Https"])
label = st.sampled_from(["a", "B", "ex-1", "WWW"])
host = st.lists(label, min_size=1, max_size=3).map(".".join)
port = st.sampled_from(["", ":80", ":443", ":8080", ":080"])
seg = st.sampled_from(["a", "B", ".", "..", "", "p1", "%2E", "a b"])
path = st.lists(seg, min_size=0, max_size=4).map(
    lambda segs: "/" + "/".join(segs) if segs else ""
)
query = st.sampled_from(["", "?q=1", "?a?b", "?"])
fragment = st.sampled_from(["", "#f", "#a#b", "#"])

url = st.builds(
    lambda s, h, po, pa, q, f: f"{s}://{h}{po}{pa}{q}{f}",
    scheme,
    host,
    port,
    path,
    query,
    fragment,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(url, min_size=1, max_size=40))
def test_jvm_equals_python_on_random_urls(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.c for r in df.select(canonical_url_col("url").alias("c")).collect()
    ]
    want = [canonicalize(u) for u in urls]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(u=url)
def test_canonicalize_is_idempotent(u):
    c = canonicalize(u)
    assert canonicalize(c) == c
