"""WARC ingest: parse web-archive files into a pages DataFrame.

The reference crawls live HTTP (`page_fetcher.go:14-20`); the
web-scale twin of that input is a WARC dump (Common Crawl's format —
ISO 28500): concatenated records, each a header block terminated by
CRLFCRLF with a ``Content-Length``-delimited body, response records
carrying an embedded HTTP/1.1 message. This module gives the engine
that ingest path:

- ``parse_warc_files``: binary WARC file blobs → one row per response
  record (url, http_status, content_type, payload). The parser is
  Content-Length-driven — it never scans the body for delimiters, so
  payloads containing ``WARC/1.0`` or bare CRLFs parse correctly —
  and runs in ``mapInPandas`` (Arrow batches of whole files; per-file
  work is pure streaming over bytes). At 100 TB each WARC file is one
  row of a binary column read straight off the object store; files
  parse independently, so parallelism = file count and no shuffle
  happens until after extraction.
- ``warc_records_col``: the serializer twin (pure JVM concat /
  octet_length arithmetic) used by the roundtrip oracle and by tests
  to synthesize valid WARC bytes deterministically — real dumps come
  from disk, not from this.

Scope fence: gzip members (``.warc.gz`` is per-record gzip) are not
decoded here — the container has no splittable-gzip codec; at scale
that step is the same ``mapInPandas`` with ``zlib`` per member. The
byte-level record grammar is the real one.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_DATE = "2026-01-01T00:00:00Z"  # fixed: determinism over realism


def warc_records_col(url: Column, payload: Column) -> Column:
    """One serialized WARC/1.0 response record (string column, CRLF
    line ends): headers, then an embedded HTTP/1.1 200 message whose
    byte length is the record's Content-Length — all JVM concat and
    octet_length, no Python."""
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), payload
    )
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit(f"\r\nWARC-Date: {WARC_DATE}\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(url),
        F.lit(">\r\nContent-Type: application/http; msgtype=response\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )


PARSED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _parse_one(data: bytes) -> list[tuple]:
    """Stream one WARC file: records are (headers CRLFCRLF body) with
    body length = Content-Length, followed by CRLFCRLF. Non-response
    records (warcinfo, request, metadata) are skipped, not errors."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC record at byte {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(
                f"malformed WARC record at byte {pos}: unterminated headers"
            )
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError(
                f"malformed WARC record at byte {pos}: no Content-Length"
            )
        body_start = hdr_end + 4
        body_len = int(headers["content-length"])
        body = data[body_start : body_start + body_len]
        rec_pos, pos = pos, body_start + body_len  # trailing CRLFCRLF eaten above
        if headers.get("warc-type") != "response":
            continue
        # embedded HTTP message: status line, headers, CRLFCRLF, payload
        http_hdr_end = body.find(b"\r\n\r\n")
        if http_hdr_end < 0:
            raise ValueError(
                f"malformed WARC record at byte {rec_pos}: response body "
                "has no HTTP header terminator"
            )
        http_lines = body[:http_hdr_end].decode("utf-8").split("\r\n")
        status = int(http_lines[0].split(" ")[1])
        ctype = ""
        for line in http_lines[1:]:
            k, _, v = line.partition(":")
            if k.strip().lower() == "content-type":
                ctype = v.strip()
        out.append(
            (
                headers.get("warc-target-uri", ""),
                status,
                ctype,
                body[http_hdr_end + 4 :].decode("utf-8"),
            )
        )
    return out


def parse_warc_files(files: DataFrame, data_col: str = "data") -> DataFrame:
    """``(… , data: binary)`` → one row per response record. Files are
    independent: the ``mapInPandas`` batch yields all records of each
    file with no cross-file state, so the operator scales with file
    count and preserves no ordering beyond within-file record order."""

    def gen(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf[data_col]:
                rows.extend(_parse_one(bytes(blob)))
            yield pd.DataFrame(
                rows, columns=["url", "http_status", "content_type", "payload"]
            )

    return files.mapInPandas(gen, PARSED_SCHEMA)
