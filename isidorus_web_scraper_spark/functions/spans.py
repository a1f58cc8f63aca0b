"""JVM-side (whole-stage-codegen) operations over interleaved span arrays.

The reference walks the HTML token stream imperatively
(`scraper_service.go:129-202`); once the document is a
``spans: array<struct<kind,text,media_ref,offset>>`` column these walks
become pure columnar expressions — no Python in the hot path at all
(stricter than the input_hint's pandas-UDF floor).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .html_tokenize import TEXT_CAP


def content_col(spans: Column | str) -> Column:
    """Assemble page text with the reference's 100 KB pre-append byte cap
    (`scraper_service.go:149-155`): fold text spans in document order,
    appending ``text + ' '`` while accumulated length < cap."""
    c = F.col(spans) if isinstance(spans, str) else spans
    texts = F.filter(c, lambda s: s["kind"] == F.lit("text"))
    folded = F.aggregate(
        texts,
        F.struct(
            F.lit("").alias("acc"), F.lit(0).cast("long").alias("len")
        ),
        lambda acc, s: F.when(
            acc["len"] < F.lit(TEXT_CAP),
            F.struct(
                F.concat(acc["acc"], s["text"], F.lit(" ")).alias("acc"),
                (acc["len"] + F.octet_length(s["text"]) + 1).alias("len"),
            ),
        ).otherwise(acc),
        lambda acc: acc["acc"],
    )
    return folded


def links_col(spans: Column | str) -> Column:
    """All hrefs in document order, verbatim — incl. relative/mailto/#
    (`scraper_service.go:163-168`; ALL are recorded, `:204-211`)."""
    c = F.col(spans) if isinstance(spans, str) else spans
    return F.transform(
        F.filter(c, lambda s: s["kind"] == F.lit("link")), lambda s: s["media_ref"]
    )


def images_col(spans: Column | str) -> Column:
    """All img srcs in document order (`scraper_service.go:169-173`)."""
    c = F.col(spans) if isinstance(spans, str) else spans
    return F.transform(
        F.filter(c, lambda s: s["kind"] == F.lit("image")), lambda s: s["media_ref"]
    )


def location_col(spans: Column | str) -> Column:
    """The 301 Location, if this fetch answered with a redirect span
    (corpus.redirect_target — the batch stand-in for the Location
    header Go's http.Client chases transparently, up to 10 hops, under
    `page_fetcher.go`'s plain http.Get). NULL for ordinary pages.
    ``F.get`` (0-based) is the ANSI-safe probe: it returns NULL on an
    empty filter result where ``element_at`` would raise."""
    c = F.col(spans) if isinstance(spans, str) else spans
    return F.get(
        F.filter(c, lambda s: s["kind"] == F.lit("redirect")), F.lit(0)
    )["media_ref"]


def crawlable_links_col(spans: Column | str) -> Column:
    """Links eligible for recursion: ``strings.HasPrefix(link, "http")``
    (`scraper_service.go:264`; test `scraper_service_test.go:410-446`)."""
    return F.filter(links_col(spans), lambda x: x.startswith("http"))
