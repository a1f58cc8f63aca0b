"""Span-sequence golden tests — the BASELINE per-row invariant.

Expectations below are HAND-DERIVED from the reference tokenizer walk
(`workers/scraper/services/scraper_service.go:129-202`, golang.org/x/net
/html event semantics) over the reference's own fixtures — they are
literals, not calls into the implementation, so they pin the port.
Notation: T=text span, L=link, I=image.
"""

from __future__ import annotations

from isidorus_web_scraper_spark.corpus import GOLDEN_HTML
from isidorus_web_scraper_spark.functions.html_tokenize import (
    page_content,
    tokenize_html,
)


def T(s):
    return ("text", s, None)


def L(href):
    return ("link", None, href)


def I(src):
    return ("image", None, src)


def spans_of(url):
    return [(k, t, m) for (k, t, m, _o) in tokenize_html(GOLDEN_HTML[url])]


def offsets_of(url):
    return [o for (_k, _t, _m, o) in tokenize_html(GOLDEN_HTML[url])]


def test_full_flow_snippet():
    # scraper_service_test.go:97-105
    assert spans_of("http://site1.com") == [
        T("Hello World"),
        L("http://site2.com"),
        T("Link"),
        I("http://img.com/a.jpg"),
    ]


def test_offsets_are_document_order():
    assert offsets_of("http://site1.com") == [0, 1, 2, 3]
    assert offsets_of(f"http://mock-website:8000/index.html") == list(range(19))


def test_non_http_links_all_recorded():
    # scraper_service_test.go:410-446 — every href recorded verbatim
    assert spans_of("http://nonhttp.test") == [
        L("/relative"),
        T("R"),
        L("#anchor"),
        T("A"),
        L("mailto:a@b.c"),
        T("M"),
        L("javascript:void(0)"),
        T("J"),
    ]


def test_script_style_suppressed():
    # scraper_service_test.go:596-640 — no text from script/style regions
    assert spans_of("http://scriptstyle.test") == [
        T("\n\t\t"),        # html→head
        T("\n\t\t\t"),      # head→style
        T("\n\t\t\t"),      # /style→script
        T("\n\t\t"),        # /script→/head
        T("\n\t\t"),        # /head→body
        T("\n\t\t\t"),      # body→p
        T("Visible content"),
        T("\n\t\t"),        # /p→/body
        T("\n\t"),          # /body→/html
    ]
    content = page_content(tokenize_html(GOLDEN_HTML["http://scriptstyle.test"]))
    assert "sensitive_variable" not in content
    assert "color: red" not in content
    assert "Visible content" in content


def test_self_closing_tags():
    # scraper_service_test.go:733-787 — <a/>, <img/> record; <script/> is a no-op
    assert spans_of("http://selfclosing.test") == [
        T("\n\t\t"),
        I("http://img.com/1.jpg"),
        T("\n\t\t"),
        L("http://site2.com"),
        T("\n\t\t"),
        T("\n\t"),  # text AFTER <script/> is kept: flag not toggled
    ]


def test_mock_index_page():
    # tests/e2e/mock_website/index.html — full 19-span sequence
    assert spans_of("http://mock-website:8000/index.html") == [
        T("\n"),
        T("\n\n"),
        T("\n    "),
        T("Mock Website - Home"),
        T("\n"),
        T("\n\n"),
        T("\n    "),
        T("Welcome to the Mock Website"),
        T("\n    "),
        T("We are learning about LocalStack and Kubernetes."),
        T("\n    "),
        T("Here is a link to the "),
        L("http://mock-website:8000/page2.html"),
        T("Second Page"),
        T("."),
        T("\n    "),
        I("http://mock-website:8000/darth.png"),
        T("\n"),
        T("\n\n"),
    ]


def test_cycle_pages():
    assert spans_of("http://mock-website:8000/cycle_a.html") == [
        T("\n\n"),
        T("\n    "),
        T("Cycle Page A"),
        T("\n    "),
        T("This page links to Cycle Page B."),
        T("\n    "),
        L("http://mock-website:8000/cycle_b.html"),
        T("Go to Page B"),
        T("\n"),
        T("\n\n"),
    ]
    links_b = [m for (k, _t, m) in spans_of("http://mock-website:8000/cycle_b.html") if k == "link"]
    assert links_b == ["http://mock-website:8000/cycle_a.html"]


def test_text_cap_100kb():
    # scraper_service_test.go:702-731 — cap checked BEFORE append
    spans = tokenize_html(GOLDEN_HTML["http://large.test"])
    assert [(k, len(t or "")) for (k, t, _m, _o) in spans] == [("text", 100_005)]
    content = page_content(spans)
    assert 100_000 <= len(content) < 100_020


def test_empty_page():
    # scraper_service_test.go:802
    assert tokenize_html(GOLDEN_HTML["http://empty.test"]) == []
    assert page_content([]) == ""
