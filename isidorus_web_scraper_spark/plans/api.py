"""Read-side API plans: the Spark renditions of the reference's
FastAPI endpoints (SURVEY.md §3.2-3.3).

Each function is a single DataFrame expression over the warehouse —
the N+1 per-row DynamoDB gets and ORM prefetches of the reference
collapse into broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.warehouse import Warehouse

# ---------------------------------------------------------------------------
# GET /scraping/{id} — status + metadata merge (J6, J8;
# api/services/scraper_service.py:87-138)
# ---------------------------------------------------------------------------


def get_full_scraping(wh: Warehouse, scraping_id: int | None = None) -> DataFrame:
    """crawls ⋈ jobs (Dynamo-metadata merge, coalesce per field) ⋈
    seed-page summary (J8: pages at the seed url)."""
    crawls = wh.read("crawls")
    jobs = wh.read("jobs").select(
        "scraping_id", "status", "links_count", "completed_round"
    )
    seed_pages = wh.read("pages").select(
        "scraping_id", "url", F.col("summary").alias("seed_summary")
    )
    out = (
        crawls.join(F.broadcast(jobs), "scraping_id", "left")
        .join(seed_pages, ["scraping_id", "url"], "left")
        .select(
            "scraping_id",
            "user_id",
            "url",
            "depth",
            F.coalesce("status", F.lit("PENDING")).alias("status"),  # defaulting :121-134
            F.coalesce("links_count", F.lit(0)).alias("links_count"),
            "completed_round",
            "seed_summary",
        )
    )
    if scraping_id is not None:
        out = out.filter(F.col("scraping_id") == scraping_id)
    return out


# ---------------------------------------------------------------------------
# GET /scraping/{id} results — pages with nested images, url-sorted
# (J7/O1; api/repositories/db_repository.py:80-104)
# ---------------------------------------------------------------------------


def get_scraping_results(wh: Warehouse, scraping_id: int) -> DataFrame:
    pages = wh.read("pages").filter(F.col("scraping_id") == scraping_id)
    images = wh.read("images").filter(F.col("scraping_id") == scraping_id)
    img_lists = (
        images.groupBy(F.col("page_url").alias("url"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("image_url", "explanation"))
            ).alias("images")
        )
    )
    return (
        pages.join(img_lists, "url", "left")
        .select(
            "url",
            "summary",
            F.coalesce("images", F.array()).alias("images"),
            "round",
        )
        .orderBy("url")  # API order is url-sorted, not crawl-ordered (O1)
    )


# ---------------------------------------------------------------------------
# GET /scrapings — newest-first pagination (O2; db_repository.py:61)
# ---------------------------------------------------------------------------


def list_scrapings(
    wh: Warehouse, user_id: int, offset: int = 0, limit: int = 20
) -> DataFrame:
    return (
        get_full_scraping(wh)
        .filter(F.col("user_id") == user_id)
        .orderBy(F.desc("scraping_id"))
        .offset(offset)
        .limit(limit)
    )


# ---------------------------------------------------------------------------
# GET /search?t= — term search with naive TF rank + top-3 highlights
# (§2.9/O4; api/services/search_service.py:17-59)
# ---------------------------------------------------------------------------


def search_pages(wh: Warehouse, term: str, user_id: int) -> DataFrame:
    """Filter on content OR summary (multi_match analog) + user term,
    TF-scored, with up to 3 highlight snippets around the term.
    Set-of-matching-URLs parity is the goal; BM25 scores are not
    (different engine, SURVEY.md §2.9)."""
    t = term.lower()
    # index_docs carries identity+acl; content/summary live in `pages`
    # (normalized store — the join replaces OpenSearch's materialized doc)
    docs = wh.read("index_docs").select("scraping_id", "url", "user_id")
    pages = wh.read("pages").select(
        "scraping_id", "url", "content", F.col("summary").alias("page_summary")
    )
    matched = (
        docs.join(pages, ["scraping_id", "url"], "left")
        .filter(F.col("user_id") == user_id)
        .filter(
            F.lower("content").contains(t)
            | F.lower(F.coalesce("page_summary", F.lit(""))).contains(t)
        )
    )
    tf = F.size(
        F.filter(
            F.split(F.lower("content"), " ", -1), lambda w: w == F.lit(t)
        )
    )
    # \Q...\E makes the user term literal (reference treats terms
    # literally; raw interpolation of e.g. 'c++' would be an invalid
    # or wrong pattern). \E inside the term is the only escape hole —
    # close it by splitting the quote around it.
    quoted = "\\Q" + t.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    highlights = F.slice(
        F.regexp_extract_all(
            F.col("content"),
            F.lit(f"(?i).{{0,30}}{quoted}.{{0,30}}"),
            0,
        ),
        1,
        3,  # highlights[:3] (search_service.py:55)
    )
    return matched.select(
        "url",
        "scraping_id",
        tf.alias("score"),
        highlights.alias("highlights"),
    ).orderBy(F.desc("score"), "url")


def search_pages_indexed(
    wh: Warehouse,
    term: str,
    user_id: int,
    postings_path: str,
    term_buckets: int = 64,
    highlights: bool = True,
) -> DataFrame:
    """Index-served search: probe the posting-list store
    (sources/postings.py) instead of scanning pages — the Spark
    rendition of the reference's OpenSearch inverted index
    (`opensearch_repository.go:23-56`). The probe reads 1/B of the
    index (partition pruning on term_bucket); scores come straight from
    the stored frequencies, so no pages scan happens for ranking.

    Semantics note: the index serves TOKEN search (term must appear as
    a whitespace token — OpenSearch-analyzer parity), while
    ``search_pages`` is SUBSTRING contains over content-or-summary.
    For whole-token terms the two agree and the pytest pins it; for
    substring queries keep the scan path.

    ``highlights=True`` adds snippet extraction by retrieving content
    for ONLY the matched docs (matched set broadcast into the pages
    join — a point retrieval in an Iceberg url-bucketed layout, never a
    ranking scan)."""
    from ..sources.postings import probe_postings

    t = term.lower()
    matched = (
        probe_postings(wh.spark, postings_path, t, term_buckets)
        .filter(F.col("user_id") == user_id)
        .select(
            "url", "scraping_id", "round", F.col("frequency").alias("score")
        )
    )
    if not highlights:
        return matched.select("url", "scraping_id", "score").orderBy(
            F.desc("score"), "url"
        )
    quoted = "\\Q" + t.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    pages = wh.read("pages").select("scraping_id", "url", "round", "content")
    hl = F.slice(
        F.regexp_extract_all(
            F.col("content"), F.lit(f"(?i).{{0,30}}{quoted}.{{0,30}}"), 0
        ),
        1,
        3,
    )
    return (
        pages.join(
            F.broadcast(matched), ["scraping_id", "url", "round"]
        )
        .select("url", "scraping_id", "score", hl.alias("highlights"))
        .orderBy(F.desc("score"), "url")
    )


def search_pages_indexed_and(
    wh: Warehouse,
    terms: list[str],
    user_id: int,
    postings_path: str,
    term_buckets: int = 64,
) -> DataFrame:
    """Conjunctive (boolean AND) search served by the postings store:
    docs containing ALL query terms, scored by summed term frequency.
    The k-way posting-list intersection is ONE counting aggregate
    (HAVING countDistinct(term) = k) — never a self-join per term, the
    standard move when posting lists are too large to broadcast.

    Scale shape: a SINGLE pruned index read covers every query term —
    partition pruning on `term_bucket IN (buckets of the terms)` reads
    at most k/B of the index (the per-term buckets in one scan instead
    of k probes), the term IN-filter lands on that pruned scan, then
    one doc-keyed agg. Duplicate query terms collapse (set semantics,
    like any boolean retriever)."""
    from ..sources.postings import buckets_of, read_postings

    spark = wh.spark
    ts = sorted({t.lower() for t in terms})
    if not ts:
        raise ValueError("search_pages_indexed_and needs at least one term")
    buckets = buckets_of(spark, ts, term_buckets)
    pruned = (
        read_postings(spark, postings_path)
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(ts))
        .filter(F.col("user_id") == user_id)
    )
    return (
        pruned.groupBy("url", "scraping_id", "round")
        .agg(
            F.countDistinct("term").alias("k"),
            F.sum("frequency").alias("score"),
        )
        .filter(F.col("k") == len(ts))
        .select("url", "scraping_id", "score")
        .orderBy(F.desc("score"), "url")
    )


def search_pages_indexed_substring(
    wh: Warehouse,
    term: str,
    user_id: int,
    grams_path: str,
    term_buckets: int = 64,
    gram_len: int = 3,
) -> DataFrame:
    """SUBSTRING search served by the character n-gram index
    (sources/postings.py build_grams — the pg_trgm / Code-Search
    design): candidate docs = AND-intersection of the term's gram
    posting lists (bucket-pruned probe, one hash aggregate), then the
    FEW candidates are verified + scored + highlighted by broadcast
    point-retrieval of their pages rows. Output and semantics are
    EXACTLY ``search_pages`` (substring over content-or-summary, token
    TF score, top-3 snippets) — the index changes what gets READ, never
    the answer; with it the scan path becomes oracle-only (VERDICT r4
    stretch 7).

    Fence: a term shorter than the gram length has no grams to
    intersect — delegate to the scan (the reference's OpenSearch
    edge-ngram analyzers bottom out the same way)."""
    t = term.lower()
    if len(t) < gram_len:
        return search_pages(wh, term, user_id)
    from ..sources.postings import probe_gram_candidates

    cand = (
        probe_gram_candidates(wh.spark, grams_path, t, gram_len, term_buckets)
        .filter(F.col("user_id") == user_id)
        .select("scraping_id", "url", "round")
    )
    pages = wh.read("pages").select(
        "scraping_id",
        "url",
        "round",
        "content",
        F.col("summary").alias("page_summary"),
    )
    verified = pages.join(F.broadcast(cand), ["scraping_id", "url", "round"]).filter(
        F.lower("content").contains(t)
        | F.lower(F.coalesce("page_summary", F.lit(""))).contains(t)
    )
    tf = F.size(
        F.filter(F.split(F.lower("content"), " ", -1), lambda w: w == F.lit(t))
    )
    quoted = "\\Q" + t.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    highlights = F.slice(
        F.regexp_extract_all(
            F.col("content"), F.lit(f"(?i).{{0,30}}{quoted}.{{0,30}}"), 0
        ),
        1,
        3,
    )
    return verified.select(
        "url",
        "scraping_id",
        tf.alias("score"),
        highlights.alias("highlights"),
    ).orderBy(F.desc("score"), "url")


def search_pages_near(
    wh: Warehouse,
    term_a: str,
    term_b: str,
    user_id: int,
    pos_postings_path: str,
    k: int = 3,
    term_buckets: int = 64,
) -> DataFrame:
    """Proximity (NEAR/k) search served by the POSITIONAL postings
    store: pages where the two terms co-occur within ``k`` token
    positions, ranked by within-window pair count then closest
    distance — the positional step up from
    ``search_pages_indexed_and`` (whose boolean AND ignores where in
    the page the terms sit). Semantics twin: the scan-path
    ``proximity_search`` query in dataset_queries.py recomputes the
    same answer from raw text; the oracle row pins them equal.

    Scale shape: delegate to ``probe_near`` (≤2/B of the index read,
    per-candidate array work), then a user ACL filter on the
    candidate-sized frame — content is never read."""
    from ..sources.postings import probe_near

    hits = probe_near(
        wh.spark, pos_postings_path, term_a, term_b, k, term_buckets
    ).filter(F.col("user_id") == user_id)
    return hits.select("url", "scraping_id", "min_dist", "n_pairs").orderBy(
        F.desc("n_pairs"), "min_dist", "url"
    )


def rebuild_positional_postings(
    wh: Warehouse, pos_postings_path: str, term_buckets: int = 64
) -> None:
    """Rebuild the positional (phrase/NEAR) index from pages — same
    derived-data contract as ``rebuild_postings``."""
    from ..sources.postings import build_positional_postings, write_postings

    pages = wh.read("pages")
    docs = wh.read("index_docs").select("scraping_id", "url", "round", "user_id")
    src = pages.join(docs, ["scraping_id", "url", "round"], "left").select(
        "scraping_id", "url", "user_id", "round", "content"
    )
    write_postings(
        build_positional_postings(
            src, ["scraping_id", "url", "user_id", "round"], "content",
            term_buckets,
        ),
        pos_postings_path,
        mode="overwrite",
        partition_cols=["round", "term_bucket"],
    )


def rebuild_postings(
    wh: Warehouse, postings_path: str, term_buckets: int = 64
) -> None:
    """Full index rebuild from the pages table (overwrite) — the repair
    path for a torn incremental append; the index is derived data, so
    losing it never loses truth."""
    from ..sources.postings import build_postings, write_postings

    pages = wh.read("pages")
    docs = wh.read("index_docs").select("scraping_id", "url", "round", "user_id")
    src = pages.join(docs, ["scraping_id", "url", "round"], "left").select(
        "scraping_id", "url", "user_id", "round", "content"
    )
    write_postings(
        build_postings(
            src, ["scraping_id", "url", "user_id", "round"], "content",
            term_buckets,
        ),
        postings_path,
        mode="overwrite",
        partition_cols=["round", "term_bucket"],
    )


def rebuild_grams(
    wh: Warehouse, grams_path: str, term_buckets: int = 64, gram_len: int = 3
) -> None:
    """Full rebuild of the substring (n-gram) index from pages —
    same repair story as ``rebuild_postings``; grams cover content AND
    summary because ``search_pages`` matches either."""
    from ..sources.postings import build_grams, write_postings

    pages = wh.read("pages")
    docs = wh.read("index_docs").select("scraping_id", "url", "round", "user_id")
    src = pages.join(docs, ["scraping_id", "url", "round"], "left").select(
        "scraping_id", "url", "user_id", "round", "content", "summary"
    )
    write_postings(
        build_grams(
            src,
            ["scraping_id", "url", "user_id", "round"],
            ["content", "summary"],
            gram_len,
            term_buckets,
        ),
        grams_path,
        mode="overwrite",
        partition_cols=["round", "term_bucket"],
    )


# ---------------------------------------------------------------------------
# DELETE /scraping/{id} — ownership check + cascading predicate deletes
# (J9/J10; deletion_service.py:30-58; batching unnecessary in Spark)
# ---------------------------------------------------------------------------

_DELETE_TABLES = [
    "pages",
    "links",
    "images",
    "index_docs",
    "seen",
    "frontier",  # consumed queue rows still name the scraping's URLs
    "fetch_log",
    "jobs",
    "media_store",
    "crawls",
]


def delete_scraping(wh: Warehouse, scraping_id: int, user_id: int) -> None:
    owner = (
        wh.read("crawls")
        .filter(F.col("scraping_id") == scraping_id)
        .select("user_id")
        .first()
    )
    if owner is None:
        raise KeyError(f"scraping {scraping_id} not found")
    if owner["user_id"] != user_id:
        raise PermissionError("403: not the owner")  # J10 (scraper_service.py:196-203)
    # commit pruning: the scraping only wrote rows in rounds
    # [created_round, completed_round (+1 for seen/frontier tags)] —
    # commits tagged outside that window are kept byte-identical.
    # This is what keeps a delete from rewriting a 100-TB table.
    job = (
        wh.read("jobs")
        .filter(F.col("scraping_id") == scraping_id)
        .select("created_round", "completed_round")
        .first()
    )
    if job is not None:
        lo = job["created_round"] or 0
        hi = job["completed_round"]
        hi = (hi + 1) if hi is not None else None  # seen/frontier tag r+1

        def in_window(props: dict) -> bool:
            # compacted commits carry a round_min/round_max span instead
            # of a single tag — prune on interval overlap
            rng = Warehouse._round_range(props)
            if rng is None:
                return True  # untagged commit: can't prove unaffected
            r_min, r_max = rng
            return r_max >= lo and (hi is None or r_min <= hi)

    else:
        in_window = None
    for table in _DELETE_TABLES:
        if wh.exists(table):
            wh.delete_where(
                table, f"scraping_id = {scraping_id}", commit_pred=in_window
            )
    # the WARC archive has no scraping_id to bind a predicate to (blobs
    # aggregate captures across scrapings); GC it by reference instead
    gc_warc_archive(wh)


def gc_warc_archive(wh: Warehouse) -> None:
    """Garbage-collect the WARC archive (CrawlConfig.archive_warc)
    against the pages table: a capture survives while ANY remaining
    scraping's pages row references its URL; once unreferenced, its
    record is spliced OUT of the archive and the file's CDX offsets are
    recomputed — the archive twin of the media-GC semi-join (J9; a
    deleted scraping's content must not stay byte-addressable through
    warc_cdx). IDEMPOTENT and standalone: it recomputes
    unreferenced-ness from current state, so re-running repairs a crash
    between the cdx and blob rewrites (delete_scraping calls it; an
    operator can too, after bulk deletes).

    Scale shape: the dropped set comes from one cdx⋈pages anti-join
    (index-sized); only AFFECTED (round, warc_file) blobs are read and
    rewritten — kept records are byte-SLICED out of the old blob via
    their cdx offsets (no re-serialization, no pages scan), offsets
    recomputed by the same prefix-sum window the sink used. Unaffected
    archive commits are never touched (delete prunes on the affected
    rounds)."""
    if not (wh.exists("warc_store") and wh.exists("warc_cdx")):
        return
    cdx = wh.read("warc_cdx")
    referenced = wh.read("pages").select("url").distinct()
    dropped = cdx.join(referenced, "url", "left_anti")
    aff = [
        (r.warc_file, r["round"])
        for r in dropped.select("warc_file", "round").distinct().collect()
    ]
    if not aff:
        return
    aff_df = wh.spark.createDataFrame(
        aff, "warc_file long, round int"
    )
    blobs = wh.read("warc_store").join(
        F.broadcast(aff_df), ["warc_file", "round"]
    )
    kept = (
        cdx.join(referenced, "url")
        .join(F.broadcast(aff_df), ["warc_file", "round"])
        .join(blobs, ["warc_file", "round"])
        .select(
            "warc_file",
            "round",
            "url",
            "digest",
            F.expr(
                "decode(substring(data, rec_offset + 1, rec_length), 'UTF-8')"
            ).alias("r"),
        )
    )
    ww = Window.partitionBy("warc_file", "round").orderBy("url")
    new_cdx = kept.select(
        "url",
        "warc_file",
        "digest",
        F.coalesce(
            F.sum(F.octet_length("r")).over(
                ww.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("rec_offset"),
        F.octet_length("r").cast("long").alias("rec_length"),
        "round",
    ).localCheckpoint(eager=True)
    new_blobs = (
        kept.groupBy("warc_file", "round")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("url", "r"))),
                        lambda x: x["r"],
                    ),
                    "",
                ),
                "UTF-8",
            ).alias("data")
        )
        .localCheckpoint(eager=True)
    )
    rounds = sorted({r for (_f, r) in aff})
    pred = " OR ".join(
        "(round = {r} AND warc_file IN ({fs}))".format(
            r=r,
            fs=", ".join(str(f) for (f, rr) in aff if rr == r),
        )
        for r in rounds
    )

    def affected_commit(props: dict) -> bool:
        rng = Warehouse._round_range(props)
        if rng is None:
            return True
        return any(rng[0] <= r <= rng[1] for r in rounds)

    for table, rebuilt in (("warc_cdx", new_cdx), ("warc_store", new_blobs)):
        wh.delete_where(table, pred, commit_pred=affected_commit)
        for r in rounds:
            part = rebuilt.filter(F.col("round") == r)
            if not part.isEmpty():
                wh.append(table, part, {"round": r})


# ---------------------------------------------------------------------------
# A4 (optional/legacy): term-frequency table — schema exists in the
# reference with no remaining writer (init.sql:15-21); resurrected here
# as the classic hash-aggregate.
# ---------------------------------------------------------------------------


def term_frequency(wh: Warehouse) -> DataFrame:
    pages = wh.read("pages")
    return (
        pages.select(
            "scraping_id",
            "url",
            F.explode(F.split(F.lower("content"), r"\s+", -1)).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("scraping_id", "url", "term")
        .agg(F.count("*").alias("frequency"))
    )
