"""Crafted-fixture pins for the round-5 clustering/fingerprinting trio
(kmeans_train / semdedup / winnowing_fingerprint). The DuckDB oracle
rows prove Spark==SQL; these prove both equal the INTENDED semantics:
Lloyd's converges to planted clusters, SemDeDup only compares within a
cluster, and winnowing matches an independent pure-Python reference.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from isidorus_web_scraper_spark.dataset_queries import (
    _assign_step,
    _centroid_update,
    _quantize,
)

DIM = 8


def _emb(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _planted(n_per=6, noise=0.02):
    """4 well-separated clusters: axis directions 0..3, tiny noise
    deterministic in the vec_id (no RNG — repeatable everywhere)."""
    rows = []
    vid = 0
    for c in range(4):
        for j in range(n_per):
            # quadratic-in-vid pattern: no two vids share a noise
            # vector (a linear pattern mod small m made exact clones)
            v = [
                noise * (((vid * vid * 13 + k * 29) % 101) - 50) / 50.0
                for k in range(DIM)
            ]
            v[c] += 1.0
            rows.append((vid, v))
            vid += 1
    return rows


def test_lloyd_recovers_planted_clusters(spark):
    """Seeds = one member of each planted cluster; one assignment
    round must put every vector with its plant, and the updated
    (requantized-mean) centroid must keep that assignment stable."""
    rows = _planted()
    q = _quantize(_emb(spark, rows))
    # seed with the FIRST member of each cluster (vec_id 0, 6, 12, 18)
    cent = q.filter(F.col("vec_id") % 6 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("qe").alias("ce"),
        F.col("nq").alias("nc"),
    )
    a1 = _assign_step(q, cent)
    got = {r.vec_id: r.cid for r in a1.collect()}
    assert got == {vid: (vid // 6) * 6 for vid, _ in rows}
    cent2 = _centroid_update(q, a1)
    a2 = _assign_step(q, cent2)
    assert {r.vec_id: r.cid for r in a2.collect()} == got


def test_assignment_is_partition_invariant(spark):
    """The quantized-integer design exists so the result cannot depend
    on row order or partitioning: repartitioned input, same answer."""
    rows = _planted(noise=0.4)  # noisy enough that ties would show
    base = _emb(spark, rows)
    q1 = _quantize(base.coalesce(1))
    q2 = _quantize(base.repartition(7, "vec_id"))
    cent = q1.filter(F.col("vec_id") % 6 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("qe").alias("ce"),
        F.col("nq").alias("nc"),
    )
    c1 = _centroid_update(q1, _assign_step(q1, cent))
    c2 = _centroid_update(q2, _assign_step(q2, cent))
    assert sorted(map(tuple, c1.select("cid", "ce").collect())) == sorted(
        map(tuple, c2.select("cid", "ce").collect())
    )


def test_semdedup_only_compares_within_cluster(spark):
    """Two IDENTICAL vectors planted in different clusters must both
    survive (SemDeDup's defining property); an identical pair inside
    one cluster drops the higher vec_id. Uses the internal steps with
    fixture seeds (the query itself binds seeds to vec_id % 125)."""
    from isidorus_web_scraper_spark import dataset_queries as dq

    rows = _planted()
    # vec 24: clone of vec 1 (cluster 0) shifted to cluster-2 direction
    clone_other = [x for x in rows[1][1]]
    clone_other[0] -= 1.0
    clone_other[2] += 1.0
    rows.append((24, clone_other))
    # vec 25: exact clone of vec 2 inside cluster 0
    rows.append((25, list(rows[2][1])))
    emb = _emb(spark, rows)

    q = dq._quantize(emb)
    cent = q.filter(F.col("vec_id").isin(0, 6, 12, 18)).select(
        F.col("vec_id").alias("cid"),
        F.col("qe").alias("ce"),
        F.col("nq").alias("nc"),
    )
    assign = dq._assign_step(q, cent)
    amap = {r.vec_id: r.cid for r in assign.collect()}
    assert amap[24] == 12 and amap[1] == 0  # clones landed apart
    qa = q.join(assign, "vec_id")
    a = qa.select(
        F.col("vec_id").alias("va"), F.col("qe").alias("ea"),
        F.col("nq").alias("na"), "cid",
    )
    b = qa.select(
        F.col("vec_id").alias("vb"), F.col("qe").alias("eb"),
        F.col("nq").alias("nb"), "cid",
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sim = (
        dot.cast("double")
        / F.sqrt(F.col("na").cast("double"))
        / F.sqrt(F.col("nb").cast("double"))
    )
    dup = (
        a.join(b, "cid")
        .filter(F.col("va") < F.col("vb"))
        .select("cid", "vb", sim.alias("sim"))
        .filter(F.col("sim") >= 0.9999)
        .select(F.col("vb").alias("vec_id"))
        .distinct()
    )
    dropped = {r.vec_id for r in dup.collect()}
    assert 25 in dropped  # in-cluster exact clone of vec 2
    assert 24 not in dropped  # cross-cluster clone of vec 1 survives


# --- winnowing: independent pure-Python reference ---------------------


def _md5_40(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) & ((1 << 40) - 1)


def _winnow_ref(text: str, k: int = 4, w: int = 5):
    """Fingerprints as the set of (pos, hash) selected by standard
    winnowing (rightmost minimal hash per window)."""
    ws = text.lower().split(" ")
    grams = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
    hs = [_md5_40(g) for g in grams]
    if not hs:
        return set(), 0
    sel = set()
    n_windows = max(len(hs) - w, 0) + 1
    for s in range(n_windows):
        win = hs[s : s + w]
        m = min(win)
        # rightmost occurrence of the min
        off = max(i for i, h in enumerate(win) if h == m)
        sel.add((s + off, m))
    return sel, len(hs)


def test_winnowing_matches_pure_python_reference(spark, monkeypatch):
    from isidorus_web_scraper_spark import dataset_queries as dq

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d",  # exactly one gram
        "a b c",  # shorter than k -> no grams, no output row
        "x y z w x y z w x y z w x y z w",  # heavy repetition (ties)
        "one two three four five six seven eight nine ten",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    monkeypatch.setattr(dq, "load", lambda _s, _d, _t: docs)
    got = {
        r.doc_id: (r.n_grams, r.n_fingerprints, r.fp_checksum, r.min_fp)
        for r in dq.winnowing_fingerprint(spark, "unused").collect()
    }
    for i, t in enumerate(texts):
        sel, n_grams = _winnow_ref(t)
        if not sel:
            assert i not in got
            continue
        hashes = [h for _pos, h in sel]
        assert got[i] == (n_grams, len(sel), sum(hashes), min(hashes)), t


def test_pack_sequences_chunks_are_gapless_and_full(spark):
    # packing invariants: every chunk except the last carries exactly
    # block_size tokens, slices within a chunk tile it without gaps,
    # and the grand total equals the corpus token count
    from pyspark.sql import functions as F

    from isidorus_web_scraper_spark.dataset_queries import (
        _PACK_BLOCK,
        pack_sequences,
    )
    from isidorus_web_scraper_spark.sources.testdata import load

    sf = "/root/testdata/sf0.001"
    out = pack_sequences(spark, sf)
    per_chunk = {
        int(r.chunk_id): int(r.tot)
        for r in out.groupBy("chunk_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    last = max(per_chunk)
    for cid, tot in per_chunk.items():
        assert tot == _PACK_BLOCK or cid == last, (cid, tot)
    assert set(per_chunk) == set(range(last + 1))  # no holes
    total = load(spark, sf, "documents").select(
        F.sum(F.size(F.split("text", " ", -1)))
    ).first()[0]
    assert sum(per_chunk.values()) == total


def test_host_budget_allocation_invariants(spark):
    """Hamilton apportionment guarantees the oracle-equality check can't
    see (both engines run the same formula, so a shared bug would pass):
    Σ budget == G exactly, and every host gets its floor quota or +1."""
    from isidorus_web_scraper_spark.dataset_queries import host_budget_allocation

    rows = host_budget_allocation(spark, "/root/testdata/sf0.001").collect()
    total_q = sum(r.queue_size for r in rows)
    assert sum(r.budget for r in rows) == 1000
    for r in rows:
        base = (1000 * r.queue_size) // total_q
        assert r.budget in (base, base + 1), (r.host, r.budget, base)


def test_recrawl_schedule_due_after_last_observation(spark):
    from isidorus_web_scraper_spark.dataset_queries import (
        ntz_epoch_ms,
        recrawl_schedule,
    )
    from isidorus_web_scraper_spark.sources.testdata import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    last = {
        r.page_id: r.last_ms
        for r in load(spark, sf, "events")
        .groupBy(F.col("user_id").alias("page_id"))
        .agg(ntz_epoch_ms(F.max("ts")).alias("last_ms"))
        .collect()
    }
    for r in recrawl_schedule(spark, sf).collect():
        # span 0 (all observations share one timestamp) ⇒ interval 0 ⇒
        # due immediately at the last observation, not strictly after
        if r.span_ms == 0 and r.n_observations >= 2:
            assert r.next_due_ms == last[r.page_id]
        else:
            assert r.next_due_ms > last[r.page_id]
        assert r.mean_interval_ms >= 1 or r.span_ms == 0


def test_lm_bigram_familiarity_crafted(spark, monkeypatch):
    """Exact integer semantics: a doc whose bigrams are shared scores
    high; a gibberish doc (all corpus-unique bigrams) scores the floor
    (every bigram counts at least itself) and is dropped by keep."""
    from isidorus_web_scraper_spark import dataset_queries as dq

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),       # bigrams: 'the cat', 'cat sat'
            (1, "the cat ran"),       # shares 'the cat'
            (2, "zq xv qj"),          # unique bigrams only
            (3, "one"),               # <2 tokens: no output row
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(dq, "load", lambda _s, _d, _t: docs)
    got = {
        r.doc_id: (r.n_bigrams, r.familiarity_sum, r.keep)
        for r in dq.lm_bigram_familiarity(spark, "unused").collect()
    }
    # doc 0: 'the cat' appears 2x corpus-wide, 'cat sat' 1x -> sum 3
    assert got[0] == (2, 3, False)  # 3 < 2*2
    assert got[1] == (2, 3, False)
    assert got[2] == (2, 2, False)  # the gibberish floor: each counts itself
    assert 3 not in got
    # a heavily-shared bigram flips keep
    docs2 = spark.createDataFrame(
        [(i, "the cat sat") for i in range(4)], "doc_id long, text string"
    )
    monkeypatch.setattr(dq, "load", lambda _s, _d, _t: docs2)
    got2 = {r.doc_id: r.keep for r in dq.lm_bigram_familiarity(spark, "u").collect()}
    assert all(got2.values())  # every bigram occurs 4x >= 2*mean


def test_tfidf_keywords_rare_term_wins(spark, monkeypatch):
    """Integerized idf preserves the tf-idf ordering: a term unique to
    one doc outranks a corpus-wide stopword even at lower tf."""
    from isidorus_web_scraper_spark import dataset_queries as dq

    docs = spark.createDataFrame(
        [
            (0, "common common common rare"),
            (1, "common filler words here"),
            (2, "common more filler text"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(dq, "load", lambda _s, _d, _t: docs)
    rows = dq.tfidf_keywords(spark, "unused").collect()
    top0 = sorted(
        (r for r in rows if r.doc_id == 0), key=lambda r: -r.score
    )
    # doc 0: 'rare' df=1 -> idf 3_000_000; 'common' tf=3, df=3 -> idf
    # 1_000_000 -> both score 3_000_000; term-asc tie-break puts
    # 'common' first in rank but both must be present
    assert {r.term for r in top0} == {"common", "rare"}
    assert all(r.score == 3_000_000 for r in top0)
    # every doc emits at most 3 keywords
    from collections import Counter

    assert max(Counter(r.doc_id for r in rows).values()) <= 3


def test_anchor_text_rollup_dominant_anchor(spark, monkeypatch):
    """min(struct(-cnt, anchor)) picks the most frequent anchor with
    anchor-asc tie-break — the aggregate the 10^8-inlink hub needs
    instead of a window sort."""
    from isidorus_web_scraper_spark import dataset_queries as dq

    # n=4: doc i links to (2i+1)%4 and (3i+7)%4
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma x"),
            (1, "alpha beta gamma y"),
            (2, "delta words here z"),
            (3, "delta words here w"),
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(dq, "load", lambda _s, _d, _t: docs)
    got = {
        r.target: (r.n_links, r.n_anchors, r.top_anchor, r.top_count)
        for r in dq.anchor_text_rollup(spark, "unused").collect()
    }
    # every doc emits 2 links -> 8 links over 4 targets
    assert sum(v[0] for v in got.values()) == 8
    for target, (n_links, n_anchors, top_anchor, top_count) in got.items():
        assert n_anchors <= n_links
        assert top_count >= 1
    # target 3 <- doc0 (3*0+7)%4, doc1 (2*1+1), doc3 (2*3+1)%4: anchors
    # 'alpha beta gamma' x2 (docs 0,1) beat 'delta words here' x1
    assert got[3] == (3, 2, "alpha beta gamma", 2)


def test_crawl_trap_flags_exactly_the_trap_hosts(spark):
    from isidorus_web_scraper_spark.dataset_queries import crawl_trap_detection

    rows = crawl_trap_detection(spark, "/root/testdata/sf0.001").collect()
    traps = {r.host for r in rows if r.is_trap}
    assert traps == {f"h{h}.test" for h in (0, 5, 10, 15, 20)}
    for r in rows:
        if r.is_trap:
            assert r.n_templates == 1  # every calendar path collapses
        else:
            assert r.n_urls <= 21 and r.n_templates == 7


def test_rendezvous_minimal_disruption_property(spark):
    """The HRW invariant: growing W=8 -> W=9 moves a host ONLY to the
    new worker, and roughly 1/9 of hosts move (not 0 — a hash that
    ignores the worker would trivially 'satisfy' the invariant)."""
    from isidorus_web_scraper_spark.dataset_queries import rendezvous_routing

    rows = rendezvous_routing(spark, "/root/testdata/sf0.001").collect()
    assert all(r.minimal_disruption for r in rows)
    moved = [r for r in rows if r.moved]
    assert all(r.w9 == 8 for r in moved)
    assert 0 < len(moved) < len(rows) / 3  # ~1/9 expected
    # every old worker actually owns hosts (balanced enough at 97 hosts)
    assert len({r.w8 for r in rows}) == 8
