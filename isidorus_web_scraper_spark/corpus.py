"""Deterministic synthetic web corpus (FIXTURES.md §1-2).

Two forms, same page function:

1. **Materialized**: ``generate_documents(spark, ...)`` builds the
   `documents` table (input_hint schema) for tests/bench.
2. **Generator-backed** ("the web as a function"): ``page_spans(url)``
   derives a page purely from the URL string, so the crawl engine can
   resolve fetches for a 10^10-URL address space via ``mapInPandas``
   without ever materializing the corpus (SURVEY.md §7 stage 5).

Host sizes follow zipf(s) — the hot-host skew the salted repartition
and politeness machinery exist for. All randomness is
``random.Random(xxhash-of-url)``-seeded: same URL ⇒ same page, on any
executor, forever.

Golden raw-HTML fixtures re-encode the reference's e2e mock website
(`tests/e2e/mock_website/*.html`) and unit-test snippets
(`workers/scraper/services/scraper_service_test.go`) verbatim.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.html_tokenize import tokenize_html
from .schema import DOCUMENTS

# ---------------------------------------------------------------------------
# Synthetic web: URL space + pure page function
# ---------------------------------------------------------------------------

_WORDS = (
    "spark crawl frontier fetch parse extract link image span host page "
    "queue filter bloom shuffle partition salt skew depth round seed web "
    "graph index summary politeness robots budget token text media data"
).split()


def _seed_for(url: str) -> int:
    return int.from_bytes(hashlib.sha256(url.encode()).digest()[:8], "big")


def pages_per_host(host_idx: int, base: int = 64, s: float = 1.2) -> int:
    """Zipf-ish host size: host 0 is hot, tail hosts are tiny."""
    return max(1, int(base / ((host_idx + 1) ** s)))


def host_name(host_idx: int) -> str:
    return f"h{host_idx}.test"


def page_url(host_idx: int, page_idx: int) -> str:
    return f"http://{host_name(host_idx)}/p{page_idx}.html"


def seed_url(n_hosts: int = 20) -> str:
    return page_url(0, 0)


def redirect_url(host_idx: int, j: int) -> str:
    """A 301 address: ``/r<j>.html`` resolves via :func:`redirect_target`."""
    return f"http://{host_name(host_idx)}/r{j}.html"


def redirect_target(host_idx: int, j: int, base: int = 64) -> str:
    """Where ``/r<j>.html`` points — pure function of (host, j):

    - ``j % 16 == 3`` → ``r(j+1)`` and ``j % 16 == 4`` → ``r(j-1)``:
      every (16k+3, 16k+4) pair is a 2-cycle (a redirect LOOP — the
      engine must terminate on these via its seen-claim set);
    - ``j % 16 == 5`` → ``r(j+11)`` whose ``(j+11) % 16 == 0`` resolves
      to a page: a 2-hop CHAIN;
    - anything else → ``page_url(host, j % pages_per_host(host))``.
    """
    m = j % 16
    if m == 3:
        return redirect_url(host_idx, j + 1)
    if m == 4:
        return redirect_url(host_idx, j - 1)
    if m == 5:
        return redirect_url(host_idx, j + 11)
    return page_url(host_idx, j % pages_per_host(host_idx, base))


def _redirect_j_for(tp: int, pages: int) -> int | None:
    """Smallest j ≡ tp (mod pages) that one-hop-resolves to page tp
    (j % 16 ∉ {3,4,5}), or None when no such j exists in 16 steps
    (possible when pages % 16 == 0 and tp % 16 ∈ {3,4,5})."""
    for m in range(16):
        j = tp + m * pages
        if j % 16 not in (3, 4, 5):
            return j
    return None


def page_spans(
    url: str,
    n_hosts: int = 20,
    links_out: int = 8,
    big_page_every: int = 1000,
    base: int = 64,
    redirects: bool | str = False,
) -> list[dict] | None:
    """The page behind ``url``, or None (404) if outside the address space.

    Pure function of the URL — deterministic across executors/runs.
    Span stream mimics reference tokenizer output: interleaved text,
    link (10% relative/non-http) and image spans with document-order
    offsets.

    ``redirects`` (default False — the frozen r1-r4 corpus, byte-
    identical): when truthy, the host also serves ``/r<j>.html``
    addresses that answer with a single ``kind='redirect'`` span whose
    ``media_ref`` is :func:`redirect_target` (the simulated 301
    Location), and ~25% of emitted page links route via a one-hop
    redirect to the SAME target page. ``redirects="resolved"`` draws
    the identical rng sequence but emits the resolved page URL
    directly — the equivalence twin for testing that a
    follow-redirects crawl reaches exactly the pages a direct-link
    crawl reaches.
    """
    if not url.startswith("http://h"):
        return None
    if redirects and ".test/r" in url:
        try:
            hpart, jpart = url[len("http://h") :].split(".test/r")
            h = int(hpart)
            j = int(jpart.removesuffix(".html"))
        except ValueError:
            return None
        if h < 0 or h >= n_hosts or j < 0:
            return None
        return [
            {
                "kind": "redirect",
                "text": None,
                "media_ref": redirect_target(h, j, base),
                "offset": 0,
            }
        ]
    if ".test/p" not in url:
        return None
    try:
        hpart, ppart = url[len("http://h") :].split(".test/p")
        h = int(hpart)
        p = int(ppart.removesuffix(".html"))
    except ValueError:
        return None
    if h < 0 or h >= n_hosts or p < 0 or p >= pages_per_host(h, base):
        return None

    rng = random.Random(_seed_for(url))
    spans: list[dict] = []
    off = 0

    def emit(kind, text=None, media_ref=None):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    # one oversized page per big_page_every exercises the 100KB cap path
    if big_page_every and rng.randrange(big_page_every) == 0:
        emit("text", "x" * 100_005)
    for _ in range(rng.randint(1, 20)):
        emit("text", " ".join(rng.choices(_WORDS, k=rng.randint(3, 12))))
    n_links = rng.randint(0, links_out)
    for _ in range(n_links):
        r = rng.random()
        if r < 0.10:  # recorded but never crawled (scraper_service.go:264)
            emit(
                "link",
                media_ref=rng.choice(
                    ["/relative/x", "#anchor", "mailto:a@b.test", "javascript:void(0)"]
                ),
            )
        else:
            # mostly same-host links, some cross-host toward hot hosts
            if r < 0.75:
                th = h
            else:
                th = rng.randrange(n_hosts)
                th = min(th, rng.randrange(n_hosts))  # bias to hot hosts
            tp = rng.randrange(pages_per_host(th, base))
            target = page_url(th, tp)
            if redirects:
                # same rng sequence for True and "resolved": the draw
                # happens either way, only the emitted string differs
                if rng.random() < 0.25:
                    j = _redirect_j_for(tp, pages_per_host(th, base))
                    if j is not None and redirects is True:
                        target = redirect_url(th, j)
            emit("link", media_ref=target)
    for _ in range(rng.randint(0, 3)):
        emit("image", media_ref=f"http://img{h}.test/i{rng.randrange(50)}.png")
    return spans


def all_urls(n_hosts: int = 20, base: int = 64) -> list[str]:
    return [
        page_url(h, p)
        for h in range(n_hosts)
        for p in range(pages_per_host(h, base))
    ]


def generate_documents(
    spark: SparkSession, n_hosts: int = 20, partitions: int = 8
) -> DataFrame:
    """Materialize the synthetic web as a `documents` DataFrame
    (distributed generation: URLs are parallelized, pages derived on
    executors via the pure page function)."""
    urls = all_urls(n_hosts)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "spans": pdf["doc_id"].map(
                        lambda u: page_spans(u, n_hosts=n_hosts)
                    ),
                }
            )

    base = spark.createDataFrame(
        [(u,) for u in urls], "doc_id string"
    ).repartition(partitions)
    return base.mapInPandas(gen, DOCUMENTS)


def generate_documents_html(
    spark: SparkSession,
    n_hosts: int = 20,
    base: int = 64,
    partitions: int = 8,
    links_out: int = 8,
    big_page_every: int = 1000,
    fatness: int = 8,
) -> DataFrame:
    """Materialize the synthetic web as a raw-HTML `documents` table
    (doc_id, html) — the table-backed corpus shape (BASELINE input_hint)
    for the staged fetch-join path; generation is distributed like
    :func:`generate_documents`."""
    urls = all_urls(n_hosts, base)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "html": pdf["doc_id"].map(
                        lambda u: page_html(
                            u, n_hosts=n_hosts, base=base, links_out=links_out,
                            big_page_every=big_page_every, fatness=fatness,
                        )
                    ),
                }
            )

    base_df = spark.createDataFrame(
        [(u,) for u in urls], "doc_id string"
    ).repartition(partitions)
    return base_df.mapInPandas(gen, "doc_id string, html string")


def make_resolver(
    n_hosts: int = 20,
    base: int = 64,
    links_out: int = 8,
    big_page_every: int = 1000,
    redirects: bool | str = False,
):
    """Generator-backed fetch: resolve frontier URLs to spans *on the
    executors* with the pure page function — no corpus scan, no join.
    This is the 10^10-address-space path (SURVEY.md §7 stage 5): fetch
    cost is O(|frontier round|) regardless of the web's size."""
    import pyspark.sql.types as T

    from .schema import SPAN

    def resolve(to_fetch):
        out_schema = T.StructType(
            list(to_fetch.schema.fields)
            + [T.StructField("spans", T.ArrayType(SPAN), True)]
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["spans"] = pdf["url"].map(
                    lambda u: page_spans(
                        u,
                        n_hosts=n_hosts,
                        links_out=links_out,
                        big_page_every=big_page_every,
                        base=base,
                        redirects=redirects,
                    )
                )
                yield pdf

        return to_fetch.mapInPandas(gen, out_schema)

    return resolve


def _page_html_from_spans(url: str, spans: list[dict], fatness: int) -> str:
    """Reference renderer: CPython ``random.Random`` draws (kept as the
    byte-parity oracle for the vectorized path and as the fallback for
    the measure-zero seeds the fast path cannot reproduce)."""
    rng = random.Random(_seed_for(url) ^ 0xBEEF)
    parts = ["<html><head><title>", url, "</title></head><body>"]
    for s in spans:
        if s["kind"] == "text":
            parts.append("<p>")
            parts.append(s["text"])
            # pad with extra deterministic sentences for realistic size
            for _ in range(fatness):
                parts.append(" " + " ".join(rng.choices(_WORDS, k=12)))
            parts.append("</p>")
        elif s["kind"] == "link":
            parts.append(f'<a href="{s["media_ref"]}">')
            parts.append(" ".join(rng.choices(_WORDS, k=3)))
            parts.append("</a>")
        else:
            parts.append(f'<img src="{s["media_ref"]}"/>')
    parts.append("</body></html>")
    return "".join(parts)


_WORDS_ARR = None  # lazy numpy mirror of _WORDS (import-light)
_RS = None  # reused RandomState: construction is ~225us, re-seeding ~18us


def page_html(
    url: str,
    n_hosts: int = 20,
    links_out: int = 8,
    big_page_every: int = 1000,
    base: int = 64,
    fatness: int = 8,
) -> str | None:
    """Render the synthetic page as raw HTML (the realistic-bench form:
    the engine then runs the actual tokenizer UDF over it, like the
    reference parses fetched bytes). ``fatness`` multiplies text volume
    so page sizes land in the real-web 5–30 KB range.

    BYTE-IDENTICAL fast path (r6): the renderer's rng only ever calls
    ``choices(_WORDS, k)`` — i.e. ``floor(random()·n)`` per word — and
    CPython's ``random.Random(seed)`` seeds MT19937 via init_by_array
    over the 32-bit words of the seed, exactly what numpy's
    ``RandomState(uint32-key-array)`` does for multi-word keys. All
    draws for a page are therefore generated with ONE vectorized
    ``random_sample`` + fancy index (~3x faster per page; this is the
    crawl bench's hottest Python loop). Multi-word keys are guaranteed
    for the sha256-derived 64-bit seeds except when seed < 2^32
    (probability 2^-32 per URL), where numpy falls back to scalar
    seeding with a DIFFERENT stream — those pages take the reference
    renderer, so output is byte-identical always (pinned by
    tests/test_corpus_fastpath.py)."""
    spans = page_spans(
        url, n_hosts=n_hosts, links_out=links_out,
        big_page_every=big_page_every, base=base,
    )
    if spans is None:
        return None
    seed = _seed_for(url) ^ 0xBEEF
    if seed < (1 << 32):  # 1-word init_by_array key: numpy diverges
        return _page_html_from_spans(url, spans, fatness)
    import numpy as np

    global _WORDS_ARR, _RS
    if _WORDS_ARR is None:
        _WORDS_ARR = np.array(_WORDS)
        _RS = np.random.RandomState()
    key, s = [], seed
    while s:
        key.append(s & 0xFFFFFFFF)
        s >>= 32
    rs = _RS
    # re-seeding a reused RandomState with the uint32 key array is the
    # same init_by_array as constructing fresh (parity-pinned) at ~1/10
    # the cost; Python workers are single-threaded per task, so module
    # reuse is race-free
    rs.seed(np.array(key, dtype=np.uint32))
    n_text = sum(1 for sp in spans if sp["kind"] == "text")
    n_link = sum(1 for sp in spans if sp["kind"] == "link")
    total = n_text * fatness * 12 + n_link * 3
    if total:
        idx = (rs.random_sample(total) * float(len(_WORDS))).astype(np.int64)
        words = _WORDS_ARR[idx].tolist()
    else:
        words = []
    pos = 0
    pad = 12 * fatness
    parts = ["<html><head><title>", url, "</title></head><body>"]
    for sp in spans:
        if sp["kind"] == "text":
            parts.append("<p>")
            parts.append(sp["text"])
            # one join per span: " s1w1..s1w12" + " s2w1.." concatenated
            # is byte-equal to " " + all pad words space-joined
            if pad:
                parts.append(" " + " ".join(words[pos:pos + pad]))
                pos += pad
            parts.append("</p>")
        elif sp["kind"] == "link":
            parts.append(f'<a href="{sp["media_ref"]}">')
            parts.append(" ".join(words[pos:pos + 3]))
            pos += 3
            parts.append("</a>")
        else:
            parts.append(f'<img src="{sp["media_ref"]}"/>')
    parts.append("</body></html>")
    return "".join(parts)


def make_page_fn(
    n_hosts: int = 20,
    base: int = 64,
    links_out: int = 8,
    big_page_every: int = 1000,
    fatness: int = 8,
    mode: str = "html",
    redirects: bool | str = False,
):
    """BATCH fetch+parse callable (``pd.Series[url] -> pd.Series[spans]``,
    null = 404) for the FUSED schedule+fetch+parse operator
    (operators/politeness.py): the whole fetch/parse runs inside the
    politeness pass's pandas batches — one Arrow round-trip per round
    instead of three (schedule, resolve, parse) and no inter-stage
    shuffle. The contract is batch-at-a-time so the engine makes ONE
    Python call per Arrow batch and the corpus implementation vectorizes
    internally however it can; this synthetic corpus necessarily derives
    each page from its URL one at a time (the simulated analog of one
    ``http.Get`` per URL, `page_fetcher.go:14-20`). ``mode='html'``
    renders the synthetic page and runs the REAL tokenizer (identical
    output to resolver-mode parse_html_udf); ``mode='spans'`` skips the
    render. Redirects (see :func:`page_spans`) exist only in the spans
    form — a 301 is a status line + Location header, not a parseable
    body, so the html renderer has nothing to render for one."""
    if redirects is True and mode == "html":
        raise ValueError("redirects require mode='spans'")
    if mode == "spans":
        def fn_spans(urls: pd.Series) -> pd.Series:
            return urls.map(
                lambda u: page_spans(
                    u, n_hosts=n_hosts, links_out=links_out,
                    big_page_every=big_page_every, base=base,
                    redirects=redirects,
                )
            )

        return fn_spans

    def one(u: str):
        h = page_html(
            u, n_hosts=n_hosts, base=base, links_out=links_out,
            big_page_every=big_page_every, fatness=fatness,
        )
        if h is None:
            return None
        return [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in tokenize_html(h)
        ]

    def fn(urls: pd.Series) -> pd.Series:
        return urls.map(one)

    return fn


def make_golden_page_fn():
    """Batch ``pd.Series[url] -> pd.Series[spans]`` over the golden
    fixture pages (tests)."""

    def one(u: str):
        h = GOLDEN_HTML.get(u)
        if h is None:
            return None
        return [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in tokenize_html(h)
        ]

    def fn(urls: pd.Series) -> pd.Series:
        return urls.map(one)

    return fn


def make_html_resolver(
    n_hosts: int = 20,
    base: int = 64,
    links_out: int = 8,
    big_page_every: int = 1000,
    fatness: int = 8,
):
    """Generator-backed fetch returning RAW HTML — the engine tokenizes
    it with parse_html_udf, exercising the real parse path at scale."""
    import pyspark.sql.types as T

    def resolve(to_fetch):
        out_schema = T.StructType(
            list(to_fetch.schema.fields)
            + [T.StructField("html", T.StringType(), True)]
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["html"] = pdf["url"].map(
                    lambda u: page_html(
                        u,
                        n_hosts=n_hosts,
                        base=base,
                        links_out=links_out,
                        big_page_every=big_page_every,
                        fatness=fatness,
                    )
                )
                yield pdf

        return to_fetch.mapInPandas(gen, out_schema)

    return resolve


# ---------------------------------------------------------------------------
# Golden raw-HTML fixtures (reference-verbatim; FIXTURES.md §2)
# ---------------------------------------------------------------------------

MOCK_BASE = "http://mock-website:8000"

GOLDEN_HTML: dict[str, str] = {
    # tests/e2e/mock_website/index.html
    f"{MOCK_BASE}/index.html": """<!DOCTYPE html>
<html>

<head>
    <title>Mock Website - Home</title>
</head>

<body>
    <h1>Welcome to the Mock Website</h1>
    <p>We are learning about LocalStack and Kubernetes.</p>
    <p>Here is a link to the <a href="http://mock-website:8000/page2.html">Second Page</a>.</p>
    <img src="http://mock-website:8000/darth.png" alt="Darth Vader">
</body>

</html>""",
    # tests/e2e/mock_website/page2.html
    f"{MOCK_BASE}/page2.html": """<!DOCTYPE html>
<html>

<head>
    <title>Mock Website - Page 2</title>
</head>

<body>
    <h1>This is Page 2</h1>
    <p>This page talks about Cloud Computing and Serverless architectures.</p>
    <p>Go back <a href="http://mock-website:8000/index.html">Home</a>.</p>
</body>

</html>""",
    # tests/e2e/mock_website/cycle_a.html
    f"{MOCK_BASE}/cycle_a.html": """<html>

<body>
    <h1>Cycle Page A</h1>
    <p>This page links to Cycle Page B.</p>
    <a href="http://mock-website:8000/cycle_b.html">Go to Page B</a>
</body>

</html>""",
    # tests/e2e/mock_website/cycle_b.html
    f"{MOCK_BASE}/cycle_b.html": """<html>

<body>
    <h1>Cycle Page B</h1>
    <p>This page links back to Cycle Page A (Cycle!).</p>
    <a href="http://mock-website:8000/cycle_a.html">Go back to Page A</a>
</body>

</html>""",
    # scraper_service_test.go:97-105 (full-flow snippet)
    "http://site1.com": (
        '<html><body><p>Hello World</p><a href="http://site2.com">Link</a>'
        '<img src="http://img.com/a.jpg"/></body></html>'
    ),
    # scraper_service_test.go:422-427 (non-HTTP links)
    "http://nonhttp.test": (
        '<html><body><a href="/relative">R</a><a href="#anchor">A</a>'
        '<a href="mailto:a@b.c">M</a><a href="javascript:void(0)">J</a></body></html>'
    ),
    # scraper_service_test.go:608-622 (script/style suppression)
    "http://scriptstyle.test": """<html>
\t\t<head>
\t\t\t<style>
\t\t\t\tbody { color: red; }
\t\t\t\t.hidden { display: none; }
\t\t\t</style>
\t\t\t<script>
\t\t\t\tvar secret = "sensitive_variable";
\t\t\t\tconsole.log("runtime_code");
\t\t\t</script>
\t\t</head>
\t\t<body>
\t\t\t<p>Visible content</p>
\t\t</body>
\t</html>""",
    # scraper_service_test.go:746-750 (self-closing tags)
    "http://selfclosing.test": """<html><body>
\t\t<img src="http://img.com/1.jpg" />
\t\t<a href="http://site2.com" />
\t\t<script src="test.js" />
\t</body></html>""",
    # scraper_service_test.go:713-715 (100KB cap)
    "http://large.test": "<html><body><p>" + "a" * 100_005 + "</p></body></html>",
    # scraper_service_test.go:802 (empty page)
    "http://empty.test": "<html></html>",
}


def golden_documents(spark: SparkSession) -> DataFrame:
    """Golden fixtures as a span-ized `documents` DataFrame (via the
    tokenizer port — golden *expectations* in tests are hand-coded)."""
    rows = [
        (
            url,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": o}
                for (k, t, m, o) in tokenize_html(html)
            ],
        )
        for url, html in GOLDEN_HTML.items()
    ]
    return spark.createDataFrame(rows, DOCUMENTS)
