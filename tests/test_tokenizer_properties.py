"""Property-based tests for the tokenizer parity surface.

The golden tests (test_tokenizer.py) pin hand-derived literal span
sequences from the reference's fixtures; these pin the INVARIANTS the
port must hold over arbitrary input — the reference tokenizer walk
(`workers/scraper/services/scraper_service.go:129-202`) never crashes
on malformed HTML (golang.org/x/net/html is lenient), suppresses
script/style text statefully, records hrefs verbatim, and caps
assembled content at 100 KB checked-before-append."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.functions.html_tokenize import (
    TEXT_CAP,
    extract_links,
    page_content,
    tokenize_html,
)

# text with no markup metacharacters (tag/entity starts) so generated
# structure stays where we put it; the raw-soup test below covers the
# metacharacter space
_plain = st.text(
    alphabet=st.characters(blacklist_characters="<>&\x00", blacklist_categories=("Cs",)),
    max_size=40,
)
_href = st.text(
    alphabet="abcdefghij:/._-#?", min_size=1, max_size=30
)


@st.composite
def _html_doc(draw):
    parts = draw(
        st.lists(
            st.one_of(
                _plain,
                _href.map(lambda h: f'<a href="{h}">x</a>'),
                _href.map(lambda s: f'<img src="{s}"/>'),
                _plain.map(lambda t: f"<p>{t}</p>"),
                _plain.map(lambda t: f"<script>{t}</script>"),
                _plain.map(lambda t: f"<style>{t}</style>"),
                _plain.map(lambda t: f"<!--{t}-->"),
                st.just("<script/>"),
            ),
            max_size=12,
        )
    )
    return "".join(parts)


@given(_html_doc())
@settings(max_examples=150, deadline=None)
def test_span_stream_invariants(doc):
    spans = tokenize_html(doc)
    assert spans == tokenize_html(doc)  # deterministic
    assert [s[3] for s in spans] == list(range(len(spans)))  # offsets = doc order
    for kind, text, ref, _ in spans:
        assert kind in ("text", "link", "image")
        if kind == "text":
            assert text is not None and ref is None and text != ""
        else:
            assert text is None and ref is not None


@given(st.text(max_size=200))
@settings(max_examples=150, deadline=None)
def test_never_raises_on_raw_soup(doc):
    # the reference tokenizer is lenient on malformed input; so are we
    spans = tokenize_html(doc)
    for _, _, _, off in spans:
        assert off >= 0


@given(prefix=_plain, inner=_plain, suffix=_plain, tag=st.sampled_from(["script", "style"]))
@settings(max_examples=100, deadline=None)
def test_script_style_text_suppressed(prefix, inner, suffix, tag):
    marker = "ZQXJK" + inner  # unique-ish, metacharacter-free
    doc = f"{prefix}<{tag}>{marker}</{tag}>{suffix}"
    texts = [t for k, t, _, _ in tokenize_html(doc) if k == "text"]
    assert not any(marker in t for t in texts)


@given(hrefs=st.lists(_href, max_size=8))
@settings(max_examples=100, deadline=None)
def test_links_recorded_verbatim_in_order(hrefs):
    doc = "".join(f'<a href="{h}">t</a>' for h in hrefs)
    spans = tokenize_html(doc)
    assert extract_links(spans) == hrefs


@given(texts=st.lists(st.text(alphabet="ab ", min_size=1, max_size=20), max_size=60))
@settings(max_examples=100, deadline=None)
def test_content_cap_checked_before_append(texts):
    spans = [("text", t, None, i) for i, t in enumerate(texts)]
    content = page_content(spans)
    n = len(content.encode("utf-8"))
    # cap is checked BEFORE each append: the pre-append length is < CAP,
    # so the final length is < CAP + (last span's bytes + 1)
    assert n < TEXT_CAP + 21
    # and content is exactly the kept prefix joined with trailing spaces
    if texts and n < TEXT_CAP:
        assert content == "".join(t + " " for t in texts)
