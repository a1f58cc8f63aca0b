"""HTML → interleaved span tokenizer, a faithful Python port of the
reference's Go tokenizer walk (`workers/scraper/services/scraper_service.go:129-202`).

Semantics reproduced exactly (each backed by a reference test):
- text runs outside <script>/<style> become ``kind='text'`` spans; text
  inside script/style is suppressed via stateful flags
  (`scraper_service.go:145-161, 175-181`; test `scraper_service_test.go:596-640`);
- every ``<a href>`` (start OR self-closing tag) emits a ``kind='link'``
  span with the href **verbatim** — relative, mailto:, javascript:, #
  included (`scraper_service.go:163-168`; test `:410-446`);
- every ``<img src>`` emits ``kind='image'`` (`:169-173`);
- self-closing ``<script/>`` does NOT toggle the in-script flag
  (`:184-188`; test `:733-787`);
- ``offset`` is the 0-based document-order event index;
- content assembly (`page_content``) appends ``text + " "`` per text
  span while the accumulated length is < 100,000 bytes — cap checked
  BEFORE the append, so final length lands in [100000, 100020) for the
  reference's oversized fixture (`:149-155`; test `:702-731`).

Used three ways: inside the vectorized Arrow UDF (`spark_udfs.py`),
by the corpus generator for raw-HTML fixtures, and is itself pinned by
hand-coded golden span sequences in tests/test_tokenizer.py (the
expectations there are literals, not calls to this code).
"""

from __future__ import annotations

from html.parser import HTMLParser

TEXT_CAP = 100_000  # scraper_service.go:151


class _SpanParser(HTMLParser):
    """Event-stream parser mirroring golang.org/x/net/html tokenizer events.

    html.parser may deliver one contiguous raw-text run as several
    handle_data calls (entity boundaries, buffering); the Go tokenizer
    emits one TextToken per contiguous run, so consecutive data chunks
    are buffered and flushed as a single span at the next tag event.
    """

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.spans: list[tuple[str, str | None, str | None]] = []
        self._in_script = False
        self._in_style = False
        self._text_buf: list[str] = []

    def _flush_text(self):
        if self._text_buf:
            self.spans.append(("text", "".join(self._text_buf), None))
            self._text_buf = []

    def handle_data(self, data):
        if not self._in_script and not self._in_style and data:
            self._text_buf.append(data)

    def handle_starttag(self, tag, attrs):
        self._flush_text()
        if tag == "script":
            self._in_script = True
        elif tag == "style":
            self._in_style = True
        elif tag == "a":
            for k, v in attrs:
                if k == "href":
                    self.spans.append(("link", None, v if v is not None else ""))
        elif tag == "img":
            for k, v in attrs:
                if k == "src":
                    self.spans.append(("image", None, v if v is not None else ""))

    def handle_endtag(self, tag):
        self._flush_text()
        if tag == "script":
            self._in_script = False
        elif tag == "style":
            self._in_style = False

    def handle_startendtag(self, tag, attrs):
        # SelfClosingTagToken path: <script/> must NOT toggle the flag
        # (scraper_service.go:184-188); <a/> and <img/> still record.
        self._flush_text()
        if tag in ("a", "img"):
            self.handle_starttag(tag, attrs)

    def handle_comment(self, data):
        self._flush_text()

    def handle_decl(self, decl):
        self._flush_text()

    def handle_pi(self, data):
        self._flush_text()

    def finish(self):
        self._flush_text()


def tokenize_html(html: str) -> list[tuple[str, str | None, str | None, int]]:
    """Return the interleaved span sequence (kind, text, media_ref, offset)."""
    p = _SpanParser()
    p.feed(html)
    p.close()
    p.finish()
    return [(k, t, m, i) for i, (k, t, m) in enumerate(p.spans)]


def page_content(spans) -> str:
    """Assemble page text exactly like the reference builder
    (scraper_service.go:149-155): append ``text + ' '`` per text span
    while current length < TEXT_CAP (checked before the append)."""
    parts: list[str] = []
    length = 0
    for span in spans:
        kind = span[0] if isinstance(span, tuple) else span["kind"]
        if kind != "text":
            continue
        text = span[1] if isinstance(span, tuple) else span["text"]
        if length < TEXT_CAP:
            parts.append(text)
            parts.append(" ")
            # Go's strings.Builder.Len() counts BYTES, not runes.
            length += len(text.encode("utf-8")) + 1
    return "".join(parts)


def extract_links(spans) -> list[str]:
    return [
        (s[2] if isinstance(s, tuple) else s["media_ref"])
        for s in spans
        if (s[0] if isinstance(s, tuple) else s["kind"]) == "link"
    ]


def extract_images(spans) -> list[str]:
    return [
        (s[2] if isinstance(s, tuple) else s["media_ref"])
        for s in spans
        if (s[0] if isinstance(s, tuple) else s["kind"]) == "image"
    ]
