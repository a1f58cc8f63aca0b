"""Property-based postings-index parity: probes over random corpora
must equal plain-Python scans of the same texts. The fixed tests in
test_postings.py pin known traps (duplicate phrase terms, gaps,
compaction layouts); this searches the space between them with random
small-vocabulary documents — small vocab so term collisions, repeats,
and co-occurrence are dense — including EMPTY tokens (double spaces),
which occupy positions but never match (the documented positional
contract, sources/postings.py:build_positional_postings).

Also pins fold-invariance at RANDOM fold points: compact_postings must
never change any probe's result set, whatever rounds it folds and
whether it refolds prior stores."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.sources.postings import (
    build_positional_postings,
    build_postings,
    compact_postings,
    probe_near,
    probe_phrase,
    probe_postings,
    write_postings,
)

_B = 8
_VOCAB = ["aa", "bb", "abc", "bcd", "ab", "zz", "AB"]
_word = st.sampled_from(_VOCAB + [""])  # "" ⇒ double space in the text
_text = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_docs = st.lists(_text, min_size=1, max_size=8)


def _full_split(text: str) -> list[str]:
    """The tokenizer twin: lowercase, split on single spaces, empties
    KEPT (they hold positions, never match)."""
    return text.lower().split(" ")


def _tf(text: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for t in _full_split(text):
        if t:
            out[t] = out.get(t, 0) + 1
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=_docs,
    rounds=st.lists(st.integers(0, 2), min_size=8, max_size=8),
    terms=st.lists(
        st.sampled_from(_VOCAB + ["nosuch"]), min_size=1, max_size=2,
        unique=True,
    ),
    fold_upto=st.integers(0, 2),
    refold=st.booleans(),
)
def test_token_probe_parity_and_fold_invariance(
    spark, docs, rounds, terms, fold_upto, refold
):
    rows = [
        (i, f"u{i}", rounds[i], text) for i, text in enumerate(docs)
    ]
    # anchor doc: guarantees the store is non-empty whatever hypothesis
    # draws (an all-empty corpus writes no round dirs to probe)
    rows.append((999, "u999", 0, "aa bb abc"))
    df = spark.createDataFrame(
        rows, "doc_id long, url string, round int, text string"
    )
    path = tempfile.mkdtemp(prefix="iws_postprop_")
    try:
        for rnd in sorted({r for (_i, _u, r, _t) in rows}):
            write_postings(
                build_postings(
                    df.filter(f"round = {rnd}"),
                    ["doc_id", "url", "round"],
                    "text",
                    buckets=_B,
                ),
                path,
                partition_cols=["round", "term_bucket"],
            )

        def probe_all() -> dict:
            return {
                term: {
                    (r.doc_id, r.round): r.frequency
                    for r in probe_postings(spark, path, term, _B).collect()
                }
                for term in terms
            }

        want = {
            term: {
                (i, rnd): tf[term.lower()]
                for (i, _u, rnd, text) in rows
                if (tf := _tf(text)).get(term.lower())
            }
            for term in terms
        }
        before = probe_all()
        assert before == want
        compact_postings(spark, path, upto_round=fold_upto, refold=refold)
        assert probe_all() == before  # fold changes layout, never content
    finally:
        shutil.rmtree(path, ignore_errors=True)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=_docs,
    phrase_words=st.lists(
        st.sampled_from(_VOCAB), min_size=1, max_size=3
    ),
    near=st.tuples(
        st.sampled_from(_VOCAB[:4]), st.sampled_from(_VOCAB[2:6]),
        st.integers(0, 3),
    ),
)
def test_phrase_and_near_probe_parity(spark, docs, phrase_words, near):
    rows = [(i, text) for i, text in enumerate(docs)]
    rows.append((999, "aa bb abc bcd"))  # non-empty-store anchor
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = tempfile.mkdtemp(prefix="iws_posprop_")
    try:
        write_postings(
            build_positional_postings(df, ["doc_id"], "text", buckets=_B),
            path,
            mode="overwrite",
        )

        phrase = " ".join(phrase_words)
        ph = [w.lower() for w in phrase_words]
        want_phrase = {}
        for i, text in rows:
            full = _full_split(text)
            n = sum(
                1
                for s in range(len(full) - len(ph) + 1)
                if full[s : s + len(ph)] == ph
            )
            if n:
                want_phrase[i] = n
        got_phrase = {
            r.doc_id: r.n_occurrences
            for r in probe_phrase(spark, path, phrase, _B).collect()
        }
        assert got_phrase == want_phrase

        a, b, k = near
        if a.lower() == b.lower():
            return  # probe_near rejects identical terms by contract
        want_near = {}
        for i, text in rows:
            full = _full_split(text)
            pa = [p for p, t in enumerate(full) if t == a.lower()]
            pb = [p for p, t in enumerate(full) if t == b.lower()]
            dists = [abs(x - y) for x in pa for y in pb if abs(x - y) <= k]
            if dists:
                want_near[i] = (min(dists), len(dists))
        got_near = {
            r.doc_id: (r.min_dist, r.n_pairs)
            for r in probe_near(spark, path, a, b, k, _B).collect()
        }
        assert got_near == want_near
    finally:
        shutil.rmtree(path, ignore_errors=True)
