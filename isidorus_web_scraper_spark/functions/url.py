"""URL canonicalization + host extraction.

The reference has NO canonicalization — the raw href string is the
seen-set identity (`scraper_service.go:263-276`), and no per-host logic
at all (`page_fetcher.go:14-20`). Per the north_rule we add both, but
ONLY for partitioning/salting/politeness:

- ``canonical_url`` (vectorized pandas UDF): lowercase scheme+host,
  strip fragment, resolve dot-segments, drop default ports — feeds
  ``xxhash64`` for partition keys and Bloom membership;
- ``with_host`` uses JVM-side ``parse_url`` (no Python) for the
  politeness grouping key.

Seen-set identity stays the raw string so the final URL-seen set
matches the reference exactly (SURVEY.md §2.8/F12).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize(url: str) -> str:
    """Pure-Python canonical form (also used by the corpus generator)."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme in _DEFAULT_PORTS and netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    path = parts.path or "/"
    # resolve dot-segments (RFC 3986 §5.2.4)
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
        else:
            out.append(seg)
    path = "/".join(out)
    if not path.startswith("/"):
        path = "/" + path
    return urlunsplit((scheme, netloc, path, parts.query, ""))


@F.pandas_udf(T.StringType())
def canonical_url(urls: pd.Series) -> pd.Series:
    return urls.map(canonicalize)


def host_col(url: Column | str) -> Column:
    """JVM-side host extraction (politeness grouping / skew salting).
    try_parse_url: ANSI mode makes parse_url THROW on malformed URLs —
    a single bad href must not kill a crawl round (the reference's
    fetcher just errors that one URL, page_fetcher.go:14-20)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def path_col(url: Column | str) -> Column:
    """Null-safe path extraction (robots prefix matching)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit("/"))


def url_hash_col(url: Column | str) -> Column:
    """Partition/Bloom key: xxhash64 over the canonical form."""
    c = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(canonical_url(c))
