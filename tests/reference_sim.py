"""Pure-Python oracle: verbatim `ProcessMessage` semantics
(`workers/scraper/services/scraper_service.go:86-312`) over an in-memory
corpus, single FIFO worker — the e2e configuration, whose behavior is
the deterministic member of the reference's behavior family
(SURVEY.md §3.1). pytest compares the Spark crawl's end state to this.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from isidorus_web_scraper_spark.functions.html_tokenize import page_content

MOCK_SUMMARY = "Mocked summary for testing"
MOCK_EXPLANATION = "Mocked explanation for testing"


@dataclass
class SimResult:
    # (scraping_id, url) insertion-ordered as processed (crawl order)
    pages: list[tuple[int, str, str, int]] = field(default_factory=list)  # +content +hop
    seen: set[tuple[int, str]] = field(default_factory=set)
    links: list[tuple[int, str, str]] = field(default_factory=list)
    images: list[tuple[int, str, str, str]] = field(default_factory=list)
    index: list[tuple[int, str, str]] = field(default_factory=list)
    summaries: dict[tuple[int, str], str] = field(default_factory=dict)
    jobs: dict[int, tuple[str, int]] = field(default_factory=dict)  # status, links_count
    fetch_errors: list[tuple[int, str]] = field(default_factory=list)


def crawl_sim(
    corpus: dict[str, list[dict]],
    seeds: list[tuple[int, str, int]],  # (scraping_id, url, depth)
    summarizer_enabled: bool = True,
    image_extractor_enabled: bool = True,
) -> SimResult:
    """corpus: doc_id -> spans (list of dicts with kind/text/media_ref/offset).
    Missing doc_id = fetch error (page_fetcher error path)."""
    res = SimResult()
    for scraping_id, url, depth in seeds:
        queue: deque[tuple[str, int]] = deque([(url, depth)])
        links_count = 0
        hop = 0  # rounds for observability; queue FIFO == BFS rounds here
        while queue:
            cur_url, cur_depth = queue.popleft()
            # SAdd self-mark (scraper_service.go:93-94)
            res.seen.add((scraping_id, cur_url))
            spans = corpus.get(cur_url)
            if spans is None:
                # fetch error: no page/links/index, pending still decrements
                res.fetch_errors.append((scraping_id, cur_url))
                continue
            content = page_content(spans)
            links = [s["media_ref"] for s in spans if s["kind"] == "link"]
            images = [s["media_ref"] for s in spans if s["kind"] == "image"]

            res.pages.append((scraping_id, cur_url, content, cur_depth))
            for link in links:  # ALL links recorded (scraper_service.go:204-214)
                res.links.append((scraping_id, cur_url, link))
            links_count += len(links)
            res.index.append((scraping_id, cur_url, content))
            if summarizer_enabled and len(content) > 0:
                res.summaries[(scraping_id, cur_url)] = MOCK_SUMMARY
            if image_extractor_enabled:
                for img in images:
                    res.images.append((scraping_id, cur_url, img, MOCK_EXPLANATION))

            # recursion (scraper_service.go:258-302)
            if cur_depth > 0:
                for link in links:
                    if link.startswith("http"):
                        if (scraping_id, link) not in res.seen:
                            res.seen.add((scraping_id, link))
                            queue.append((link, cur_depth - 1))
        res.jobs[scraping_id] = ("COMPLETED", links_count)
    return res
