"""Property-based WARC roundtrip: the JVM serializer
(sources/warc.py:warc_records_col) concatenated into a file and walked
by the Content-Length-driven Python parser (_parse_one) must recover
every (url, payload) exactly, for RANDOM payloads composed of
adversarial fragments — record magic, bare CRLFs, header-lookalike
lines, multi-byte UTF-8 — interleaved with non-response records the
parser must skip. The fixed tests pin each trap once through a Python
serializer twin; this crosses the real JVM writer against the parser
on their combinations."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from isidorus_web_scraper_spark.sources.warc import _parse_one, warc_records_col

from .test_warc import _record

_FRAGMENTS = [
    "",
    "plain",
    "\r\n",
    "\r\n\r\n",
    "WARC/1.0",
    "WARC-Type: response",
    "Content-Length: 3",
    "HTTP/1.1 200 OK",
    "héllo—wörld ¶",
    "\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n",
]
_payload = st.lists(
    st.sampled_from(_FRAGMENTS), min_size=0, max_size=5
).map("".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    payloads=st.lists(_payload, min_size=1, max_size=6),
    skip_positions=st.sets(st.integers(0, 6), max_size=3),
)
def test_jvm_serializer_python_parser_roundtrip(spark, payloads, skip_positions):
    rows = [(f"http://h.test/p{i}.html", p) for i, p in enumerate(payloads)]
    recs = [
        r.rec
        for r in spark.createDataFrame(rows, "url string, payload string")
        .select(warc_records_col(F.col("url"), F.col("payload")).alias("rec"))
        .collect()
    ]
    # splice skippable non-response records between response records
    data = b""
    for i, rec in enumerate(recs):
        if i in skip_positions:
            data += _record("", "software: x", wtype="warcinfo")
            data += _record(f"http://h.test/req{i}", "GET / HTTP/1.1", wtype="request")
        data += rec.encode("utf-8")
    got = [(r[0], r[1], r[3]) for r in _parse_one(data)]
    assert got == [(u, 200, p) for (u, p) in rows]
