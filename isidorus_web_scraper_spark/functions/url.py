"""URL canonicalization + host extraction.

The reference has NO canonicalization — the raw href string is the
seen-set identity (`scraper_service.go:263-276`), and no per-host logic
at all (`page_fetcher.go:14-20`). Per the north_rule we add both, but
ONLY for partitioning/salting/politeness:

- ``canonical_url_col`` (pure JVM — round 5; the earlier pandas UDF is
  gone): lowercase scheme+host, strip fragment, resolve dot-segments,
  drop default ports — feeds ``xxhash64`` for partition keys and Bloom
  membership. ``canonicalize`` remains as the plain-Python reference
  implementation (corpus generator + the byte-equality pin in
  tests/test_url.py);
- host/path extraction uses JVM-side ``try_parse_url`` (no Python) for
  the politeness grouping key.

Seen-set identity stays the raw string so the final URL-seen set
matches the reference exactly (SURVEY.md §2.8/F12).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import Column
from pyspark.sql import functions as F

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


def domain_col(host: Column | str, labels: int = 2) -> Column:
    """Registrable-domain approximation: the host's last ``labels``
    dot-separated labels (``a.b.spam.test`` → ``spam.test``) — the
    grouping key for domain-scoped politeness budgets
    (CrawlConfig.budget_scope='domain'). Hosts with fewer labels pass
    through whole (substring_index semantics). A real deployment would
    swap in the Public Suffix List (co.uk et al.); no PSL data ships in
    this environment, so the label count is a config knob instead —
    the one JVM expression keeps the scheduler zero-Python."""
    c = F.col(host) if isinstance(host, str) else host
    return F.substring_index(c, ".", -int(labels))


def canonical_url_col(url: Column | str) -> Column:
    """Pure-JVM canonicalizer — the zero-Python twin of
    ``canonicalize`` for ABSOLUTE http(s) URLs (the only shape the
    crawl admits past the absolute-link predicate, P4): lowercase
    scheme+netloc, drop the fragment, strip default ports, resolve
    dot-segments (RFC 3986 §5.2.4) with an ``F.aggregate`` fold over
    the split path, keep the query. String surgery on the raw value
    (substring_index / regexp_extract), NOT parse_url — Hive URL
    parsing has its own edge semantics and this must match the Python
    reference byte-for-byte (equivalence pinned by
    tests/test_url.py over fixtures + 400 seeded random URLs).
    Embedded tab/CR/LF are removed first — the same sanitization
    ``urlsplit`` applies (WHATWG unsafe bytes), so whitespace-bearing
    hrefs hash identically in both impls.

    Domain fence: inputs NOT matching ``^scheme://`` (e.g. the
    malformed ``http:/a`` or bare ``httpfoo`` strings the crawl's
    permissive startswith('http') predicate can admit) pass through
    UNCHANGED, where ``canonicalize`` would normalize them through
    urlsplit. That divergence only means such a string groups with
    nothing but its own exact spelling — the seen-set identity is the
    raw string anyway, and a deterministic per-spelling hash is all the
    partition/Bloom key needs (pinned by
    test_jvm_canonicalizer_fallback_is_passthrough)."""
    raw = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(raw, "[\\t\\r\\n]", "")
    defrag = F.substring_index(c, "#", 1)
    scheme = F.lower(F.regexp_extract(defrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    # everything after '://' (scheme match is non-empty on the http(s)
    # domain; the outer when() guards the rest)
    rest = F.substring(defrag, F.length(scheme) + 4, F.lit(2147483647))
    netloc_raw = F.substring_index(F.substring_index(rest, "/", 1), "?", 1)
    netloc = F.lower(netloc_raw)
    netloc = (
        F.when(
            (scheme == "http") & netloc.endswith(":80"),
            F.substring(netloc, 1, F.length(netloc) - 3),
        )
        .when(
            (scheme == "https") & netloc.endswith(":443"),
            F.substring(netloc, 1, F.length(netloc) - 4),
        )
        .otherwise(netloc)
    )
    path_and_query = F.substring(
        rest, F.length(netloc_raw) + 1, F.lit(2147483647)
    )
    qpos = F.instr(path_and_query, "?")
    raw_path = F.when(qpos > 0, F.substring(path_and_query, 1, qpos - 1)).otherwise(
        path_and_query
    )
    query = F.when(
        qpos > 0, F.substring(path_and_query, qpos + 1, F.lit(2147483647))
    ).otherwise(F.lit(""))
    path0 = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    # dot-segment fold: '.' dropped, '..' pops, else append — exactly
    # canonicalize()'s loop, as an aggregate over the split segments
    folded = F.aggregate(
        F.split(path0, "/", -1),
        F.array().cast("array<string>"),
        lambda acc, seg: F.when(seg == ".", acc)
        .when(seg == "..", F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))))
        .otherwise(F.concat(acc, F.array(seg))),
    )
    joined = F.array_join(folded, "/")
    path = F.when(joined.startswith("/"), joined).otherwise(
        F.concat(F.lit("/"), joined)
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https"), rebuilt).otherwise(c)


def url_hash_col(url: Column | str) -> Column:
    """Partition/Bloom key: xxhash64 over the canonical form — all
    JVM (the pandas-UDF canonicalizer would put a Python stage inside
    every round's claim tagging and every corpus-bucket route)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(canonical_url_col(c))
