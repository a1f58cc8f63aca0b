"""Vectorized (Arrow-batched) pandas UDFs — the only Python in the plan.

Three UDF families, mirroring the reference's extension points
(SURVEY.md §2.11):
- ``parse_html_udf``: raw HTML → interleaved span array (the Go
  tokenizer port, for raw-HTML fixture ingestion; generated corpora are
  already span-ized);
- ``summarize_udf`` / ``explain_image_udf``: the LLM provider factory
  (`workers/page_summarizer/services/summarizer_factory.py:31-100`,
  `workers/image_explainer/services/explainer_factory.py:27-84`) with
  the deterministic mock provider as default — the only provider used in
  any verification path (e2e asserts the mock strings,
  `tests/e2e/runner/runner.py:264-280`). Real providers need network —
  stubbed behind NotImplementedError.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import SPAN
from .html_tokenize import tokenize_html

SPAN_ARRAY_TYPE = T.ArrayType(SPAN)

# mock provider strings (summarizer_factory.py:16-23, explainer_factory.py:22)
MOCK_SUMMARY = "Mocked summary for testing"
MOCK_EXPLANATION = "Mocked explanation for testing"
SUMMARY_UNAVAILABLE = "Summary unavailable"       # summarizer_factory.py:98-100
EXPLANATION_UNAVAILABLE = "Explanation unavailable"  # explainer_factory.py:82-84
SUMMARIZER_WORD_CAP = 1500                        # summarizer_factory.py:72-77


@F.pandas_udf(SPAN_ARRAY_TYPE)
def parse_html_udf(html: pd.Series) -> pd.Series:
    # null html (fetch-error rows) must pass through: pandas UDFs see
    # the whole Arrow batch even when wrapped in F.when(...)
    return html.map(
        lambda h: None
        if h is None
        else [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in tokenize_html(h)
        ]
    )


def _summarize_one(content: str, provider: str) -> str | None:
    if not content:
        return None  # reference never sends empty content (scraper_service.go:232)
    words = content.split()  # 1500-word truncation, summarizer_factory.py:72-77
    _truncated = " ".join(words[:SUMMARIZER_WORD_CAP])
    if provider == "mock":
        return MOCK_SUMMARY
    if provider in ("openai", "gemini", "anthropic", "ollama", "huggingface"):
        # network-backed providers are unavailable in this environment;
        # the reference maps any invoke failure to the fallback string
        return SUMMARY_UNAVAILABLE
    return SUMMARY_UNAVAILABLE


def make_summarize_udf(provider: str = "mock"):
    """Returns a callable(column) -> Column.

    The mock provider (the only one any verification path uses — its
    output is a constant string) compiles to a PURE JVM expression: the
    page content never crosses the Arrow boundary and no Python worker
    runs, which removes a full content pass per crawl round. Real
    providers get the pandas UDF (Arrow-batched; the 1500-word
    truncation prepares the provider prompt, summarizer_factory.py:72-77).
    """
    if provider == "mock":
        def summarize_mock(content) -> F.Column:
            c = F.col(content) if isinstance(content, str) else content
            return F.when(F.length(c) > 0, F.lit(MOCK_SUMMARY))

        return summarize_mock

    @F.pandas_udf(T.StringType())
    def summarize_udf(content: pd.Series) -> pd.Series:
        return content.map(lambda c: _summarize_one(c, provider))

    return summarize_udf


def make_explain_image_udf(provider: str = "mock"):
    """Same contract and same JVM fast path as make_summarize_udf."""
    if provider == "mock":
        def explain_mock(media_ref) -> F.Column:
            c = F.col(media_ref) if isinstance(media_ref, str) else media_ref
            return F.when(c.isNotNull(), F.lit(MOCK_EXPLANATION))

        return explain_mock

    @F.pandas_udf(T.StringType())
    def explain_image_udf(media_ref: pd.Series) -> pd.Series:
        return pd.Series([EXPLANATION_UNAVAILABLE] * len(media_ref))

    return explain_image_udf
