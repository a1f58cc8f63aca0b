"""Crafted-fixture pins for the frequency/vocabulary sketch operators
(heavy_hitters / symspell_fuzzy_pairs). Their DuckDB oracle rows prove
Spark==SQL at sf0.01; these prove the INTENDED semantics on adversarial
shapes the testdata can't exhibit: partitioning-invariance of the
two-pass Misra-Gries output, and the deletion-index verify step
rejecting false candidates (shared delete keys at levenshtein > 2).
"""

from __future__ import annotations

from collections import Counter

from isidorus_web_scraper_spark.dataset_queries import (
    heavy_hitters,
    symspell_fuzzy_pairs,
)


def _write_docs(spark, path, texts, n_files):
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(n_files).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )


def _skewed_texts():
    """Zipf-ish bigram stream: 'hot hot' dominates, a mid tier sits
    just around n/k, and a long unique tail forces MG evictions at
    k=600 (distinct bigrams >> k)."""
    texts = []
    texts += ["hot " * 400] * 30  # 'hot hot' x ~12k
    for m in range(40):
        texts.append((f"mid{m} " * 60))  # 'midM midM' x ~59 each
    tail = " ".join(f"t{i} u{i}" for i in range(3000))  # unique bigrams
    texts.append(tail)
    return texts


def test_heavy_hitters_partition_invariant(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    texts = _skewed_texts()
    _write_docs(spark, a, texts, 1)
    _write_docs(spark, b, texts, 13)  # different pass-1 summaries

    got_a = {(r.term, r.freq) for r in heavy_hitters(spark, a).collect()}
    got_b = {(r.term, r.freq) for r in heavy_hitters(spark, b).collect()}
    assert got_a == got_b  # the exact second pass erases sketch noise

    # and both equal the definition {t : freq(t) * k > n}
    grams = Counter()
    for t in texts:
        ws = t.lower().split(" ")
        grams.update(f"{x} {y}" for x, y in zip(ws, ws[1:]))
    n = sum(grams.values())
    want = {(t, c) for t, c in grams.items() if c * 600 > n}
    assert got_a == want
    assert ("hot hot", grams["hot hot"]) in got_a
    assert all(not t.startswith("t1 ") for t, _ in got_a)  # tail is out


def test_symspell_verify_kills_false_candidates(spark, tmp_path):
    # 'xyabc' and 'abcxy' SHARE the 2-deletion key 'abc' (both delete
    # their x,y) but sit at levenshtein 4 — the index admits the pair,
    # the verify step must reject it. 'abcd'/'bacd' (transposition,
    # lev 2) and 'abcd'/'abc' (1 delete) must survive.
    d = str(tmp_path / "v")
    _write_docs(spark, d, ["xyabc abcxy abcd bacd abc zzzzzzz"], 1)
    got = {
        (r.term_a, r.term_b, r.dist)
        for r in symspell_fuzzy_pairs(spark, d).collect()
    }
    assert ("abcd", "bacd", 2) in got
    assert ("abc", "abcd", 1) in got
    assert not any(
        {p[0], p[1]} == {"xyabc", "abcxy"} for p in got
    ), "false candidate survived the levenshtein verify"
    assert all(p[2] <= 2 for p in got)
