"""Property-based interrupt/resume equivalence: for RANDOM
configuration points (seen-sketch kind × sketch store × compaction
cadence × politeness budget), random seed sets, and a random interrupt
round, a crawl interrupted at a round boundary and resumed by a FRESH
engine must end in exactly the state of an uninterrupted run.
test_crawl.py pins single points of this space (interrupt after round
0, driver bloom, no budget pressure); this searches the interactions —
e.g. warehouse-persisted cuckoo shards + per-round compaction + a
budget small enough that deferred URLs span the interrupt.

The partial run mirrors run()'s loop (round stats carry urls_in,
optional auto-compaction) but never finalizes — a crash doesn't."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.corpus import generate_documents, page_url
from isidorus_web_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
from isidorus_web_scraper_spark.schema import DOCUMENTS

from .reference_sim import crawl_sim
from .test_crawl import assert_matches_sim, spark_end_state

_seed = st.tuples(
    st.integers(0, 9),  # host pick (mod n_hosts)
    st.integers(0, 4),  # page index (every host has ≥5 pages at base=64)
    st.integers(1, 3),  # depth
)

_cfg_point = st.fixed_dictionaries(
    {
        "seen_sketch": st.sampled_from(["bloom", "cuckoo"]),
        "sketch_store": st.sampled_from(["driver", "warehouse"]),
        "compact_every_rounds": st.sampled_from([None, 1]),
        "default_budget": st.sampled_from([2, 1_000_000_000]),
    }
)


def _run_partial(eng: CrawlEngine, rounds: int) -> None:
    """run()'s loop, stopped after ``rounds`` completed rounds, no
    finalize — the boundary-crash shape resume() must recover from."""
    if eng._use_wh_sketch:
        eng._init_warehouse_sketch(0)
    urls_in = None
    for i in range(rounds):
        if urls_in == 0:
            return
        if urls_in is None and eng.wh.read("frontier", {"round": i}).isEmpty():
            return
        stats = eng.run_round(i, urls_in)
        urls_in = stats.new_urls + stats.deferred
        ce = eng.config.compact_every_rounds
        if ce and (i + 1) % ce == 0:
            eng._compact_tables(i, refold=False)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_hosts=st.integers(3, 5),
    raw_seeds=st.lists(_seed, min_size=1, max_size=2, unique=True),
    interrupt_after=st.integers(1, 3),  # completed rounds before the "crash"
    point=_cfg_point,
)
def test_interrupt_resume_equals_uninterrupted(
    spark, n_hosts, raw_seeds, interrupt_after, point
):
    docs = generate_documents(spark, n_hosts=n_hosts).persist()
    seeds = [
        (100 + i, 1, page_url(h % n_hosts, p), d)
        for i, (h, p, d) in enumerate(raw_seeds)
    ]
    cfg = lambda: CrawlConfig(  # noqa: E731
        bloom_expected_urls=4096, bloom_buckets=8, **point
    )
    root = tempfile.mkdtemp(prefix="iws_prop_")
    try:
        full = CrawlEngine(spark, f"{root}/full", documents=docs, config=cfg())
        full.start(seeds)
        full.run()

        part = CrawlEngine(spark, f"{root}/part", documents=docs, config=cfg())
        part.start(seeds)
        _run_partial(part, interrupt_after)

        resumed = CrawlEngine(  # fresh engine: sketch must come back
            spark, f"{root}/part", documents=docs, config=cfg()
        )
        resumed.resume()

        assert spark_end_state(resumed) == spark_end_state(full)
    finally:
        docs.unpersist()
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Randomized engine-vs-reference-simulator parity: the fixed sim tests
# crawl the deterministic synthetic web / golden fixtures; this draws
# ARBITRARY small link graphs — dangling links (fetch errors), non-http
# refs, cycles, duplicate links, multi-seed overlaps — and demands full
# end-state equality (pages+content+round, seen, links, images, jobs)
# against the pure-Python ProcessMessage twin (tests/reference_sim.py).
# ---------------------------------------------------------------------------

_POOL = [f"http://h{k}.test/p{j}.html" for k in range(3) for j in range(3)]
_MISSING = ["http://h9.test/void0.html", "http://h9.test/void1.html"]
_NONHTTP = ["ftp://x/y.bin", "page2.html"]
_IMGS = ["http://h0.test/a.png", "http://h1.test/b.png"]

_span = st.one_of(
    st.sampled_from(["alpha", "beta", "gamma"]).map(
        lambda t: {"kind": "text", "text": t, "media_ref": ""}
    ),
    st.sampled_from(_POOL + _MISSING + _NONHTTP).map(
        lambda u: {"kind": "link", "text": "", "media_ref": u}
    ),
    st.sampled_from(_IMGS).map(
        lambda u: {"kind": "image", "text": "", "media_ref": u}
    ),
)
_corpus = st.dictionaries(
    st.sampled_from(_POOL), st.lists(_span, min_size=0, max_size=5),
    max_size=9,
)
_sim_seed = st.tuples(
    st.sampled_from(_POOL + _MISSING[:1]), st.integers(0, 3)
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_corpus, raw_seeds=st.lists(_sim_seed, min_size=1, max_size=2))
def test_engine_matches_reference_sim_on_random_graphs(
    spark, corpus, raw_seeds
):
    corpus = {
        url: [dict(s, offset=i) for i, s in enumerate(spans)]
        for url, spans in corpus.items()
    }
    docs = spark.createDataFrame(list(corpus.items()), DOCUMENTS)
    seeds = [
        (201 + i, 1, url, depth) for i, (url, depth) in enumerate(raw_seeds)
    ]
    root = tempfile.mkdtemp(prefix="iws_simprop_")
    try:
        eng = CrawlEngine(
            spark,
            f"{root}/wh",
            documents=docs,
            config=CrawlConfig(
                bloom_expected_urls=4096, default_budget=1_000_000_000
            ),
        )
        eng.start(seeds)
        eng.run()
        sim = crawl_sim(corpus, [(sid, url, d) for (sid, _u, url, d) in seeds])
        assert_matches_sim(
            eng, sim, {sid: d for (sid, _u, _url, d) in seeds}
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
