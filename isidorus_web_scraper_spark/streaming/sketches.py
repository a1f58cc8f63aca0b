"""Streaming Misra-Gries heavy hitters — the frequent-terms monitor
for a live crawl/ingest stream.

The batch twin is ``dataset_queries.heavy_hitters`` (two-pass MG:
per-partition k-counter summaries, exact verify of the candidate
union). This module runs PASS 1 incrementally under Structured
Streaming: every micro-batch contributes per-partition MG summaries
(bounded: ≤ k rows per partition, computed distributed), which fold
into one driver-resident k-counter accumulator with the same
Agarwal-et-al mergeable-summaries step — add pointwise, subtract the
(k+1)-st largest, drop ≤ 0. Mergeability gives the invariant the test
pins: after ANY number of batches, the accumulator's key set is a
SUPERSET of every term with global frequency > n/(k+1), so the exact
``finalize`` pass (frequency-count ONLY the ≤ k candidates, keep
freq·k > n) returns exactly the batch answer.

State bound: the driver holds ≤ k counters and one integer, whatever
the stream length — the sketch-sized-state property that makes a
frequent-terms monitor feasible where a streaming groupBy-count's
state is the unbounded keyspace.

Reference analog: the reference has no streaming analytics at all
(workers consume SQS one message at a time); this is the Spark-native
capability the north rule's "continuous frontier" reading implies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dataset_queries import word_ngrams, words


def _term_col(text: Column) -> Column:
    """The shared bigram law of the heavy-hitters family."""
    return F.explode(word_ngrams(words(text), 2)).alias("term")


def mg_partition_summaries(terms: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of a (term) frame: ≤ k
    candidate rows per partition plus one NULL-term row carrying the
    partition's row count (same wire shape as the batch query's
    pass 1 — the summary is bounded by k, never by the keyspace)."""
    import pandas as pd

    def mg(batches):
        acc: dict = {}
        seen = 0
        for pdf in batches:
            seen += len(pdf)
            for term, c in pdf["term"].value_counts().items():
                acc[term] = acc.get(term, 0) + int(c)
            if len(acc) > k:
                kth = sorted(acc.values(), reverse=True)[k]
                acc = {t: c - kth for t, c in acc.items() if c > kth}
        if seen:
            yield pd.DataFrame(
                {
                    "term": list(acc) + [None],
                    "c": list(acc.values()) + [0],
                    "pn": [0] * len(acc) + [seen],
                }
            )

    return terms.mapInPandas(mg, "term string, c long, pn long")


def fold_mg(acc: dict, rows, k: int) -> int:
    """Fold collected summary rows into the running k-counter dict
    (in place); returns the batch's row-count contribution. The
    subtract step keeps len(acc) ≤ k after every fold."""
    n_batch = 0
    for r in rows:
        if r["term"] is None:
            n_batch += int(r["pn"])
        else:
            acc[r["term"]] = acc.get(r["term"], 0) + int(r["c"])
    if len(acc) > k:
        kth = sorted(acc.values(), reverse=True)[k]
        for t in list(acc):
            acc[t] -= kth
            if acc[t] <= 0:
                del acc[t]
    return n_batch


class StreamingHeavyHitters:
    """foreachBatch sink state: a running MG accumulator + total n.

    Use: ``stream.writeStream.foreachBatch(hh.process)...``; after the
    stream drains, ``hh.finalize(spark, corpus)`` runs the exact
    second pass over the full corpus restricted to the ≤ k candidates.
    """

    def __init__(self, k: int):
        self.k = k
        self.acc: dict = {}
        self.n = 0

    def process(self, batch_df: DataFrame, _batch_id: int) -> None:
        terms = batch_df.select(_term_col(F.col("text")))
        rows = mg_partition_summaries(terms, self.k).collect()
        self.n += fold_mg(self.acc, rows, self.k)

    def candidates(self) -> list[str]:
        return sorted(self.acc)

    def finalize(self, spark: SparkSession, corpus: DataFrame) -> DataFrame:
        """Exact pass: count candidate terms over the corpus, keep the
        strict heavy hitters freq·k > n (integer compare — same law as
        the batch query)."""
        cand = spark.createDataFrame(
            [(t,) for t in self.candidates()] or [(None,)], "term string"
        ).filter(F.col("term").isNotNull())
        counts = (
            corpus.select(_term_col(F.col("text")))
            .join(F.broadcast(cand), "term")
            .groupBy("term")
            .agg(F.count("*").cast("bigint").alias("freq"))
        )
        return counts.filter(
            F.col("freq") * self.k > F.lit(self.n)
        ).select("term", "freq")


class StreamingKMV:
    """Bounded-state distinct-count monitor: the KMV (bottom-k)
    sketch of ``dataset_queries.kmv_distinct`` fed incrementally by
    foreachBatch. Each micro-batch contributes its own DISTINCT
    bottom-k hash set (a TakeOrderedAndProject per batch — k rows
    cross the wire, never the keyspace); the driver merge is the KMV
    union law — set-union the hashes, keep the k smallest. State is
    ≤ k integers for any stream length, and because bottom-k union is
    exactly mergeable the end state is IDENTICAL to the batch sketch
    of the full corpus (not merely close — the test pins equality of
    h_k and the estimate)."""

    def __init__(self, k: int = 8):
        self.k = k
        self.hashes: set[int] = set()

    def process(self, batch_df: DataFrame, _batch_id: int) -> None:
        from ..dataset_queries import md5_long

        rows = (
            batch_df.select(
                md5_long(F.col("user_id").cast("string")).alias("hv")
            )
            .distinct()
            .orderBy("hv")
            .limit(self.k)
            .collect()
        )
        self.hashes.update(r.hv for r in rows)
        if len(self.hashes) > self.k:
            self.hashes = set(sorted(self.hashes)[: self.k])

    def estimate(self) -> tuple[int, int, float]:
        """(k_actual, h_k, est_distinct) — the batch query's exact
        output law: D ≈ (k−1)·2^60/h_k."""
        ks = sorted(self.hashes)
        k_actual = len(ks)
        h_k = ks[-1] if ks else 0
        est = (
            (k_actual - 1) * (1152921504606846976.0 / h_k) if h_k else 0.0
        )
        return k_actual, h_k, round(est, 3)


class StreamingEWMA:
    """Bounded-state recency-weighted activity monitor: the streaming
    twin of ``dataset_queries.events_ewma_halflife``. The batch law's
    weights are EXACT powers of two over the trailing 30 days, which
    makes the sketch exactly mergeable the way KMV is: state is the
    per-(type, day) count dict PRUNED to the trailing 30 days of the
    max day seen so far — pruning is safe because the max day only
    grows, so a pruned day can never re-enter the window — and
    ``finalize`` recomputes the integer weighted sum from those
    counts, landing on the IDENTICAL (ewma_num_x2p29, n_events) rows
    as the batch query (integers; the test pins equality, not
    closeness).

    Per micro-batch, the stream side does one distributed
    (type, day) rollup and collects the BOUNDED result
    (≤ |types| × days-in-batch rows — never event rows); driver state
    is ≤ |types| × 30 integers for any stream length."""

    def __init__(self, window_days: int = 30):
        self.window = window_days
        self.counts: dict = {}  # (event_type, day) -> count
        self.last_day: int | None = None

    def process(self, batch_df: DataFrame, _batch_id: int) -> None:
        from ..dataset_queries import ntz_epoch_ms

        day = (ntz_epoch_ms(F.col("ts")) / F.lit(86_400_000)).cast("bigint")
        rows = (
            batch_df.select("event_type", day.alias("d"))
            .groupBy("event_type", "d")
            .agg(F.count("*").cast("bigint").alias("c"))
            .collect()
        )
        for r in rows:
            key = (r.event_type, int(r.d))
            self.counts[key] = self.counts.get(key, 0) + int(r.c)
            if self.last_day is None or int(r.d) > self.last_day:
                self.last_day = int(r.d)
        if self.last_day is None:
            # empty first micro-batch (watermark advancement / no new
            # data): nothing to prune yet — the old unguarded cutoff
            # arithmetic raised TypeError and killed the stream
            # (ADVICE r5)
            return
        cutoff = self.last_day - self.window
        self.counts = {
            (t, d): c for (t, d), c in self.counts.items() if d > cutoff
        }

    def finalize(self) -> dict:
        """{event_type: (ewma_num_x2p29, n_events)} — the batch law:
        day d in the trailing window weighs 2^(d - last_day + window-1),
        all integers (bit-identical to events_ewma_halflife at the
        default window=30, whose oracle fixes the exponent span 0..29;
        deriving the offset from the window keeps any other window_days
        consistent instead of shifting by a negative count — ADVICE r5)."""
        out: dict = {}
        if self.last_day is None:
            return out
        for (t, d), c in self.counts.items():
            if d <= self.last_day - self.window:
                continue
            di = d - self.last_day + self.window - 1
            num, n = out.get(t, (0, 0))
            out[t] = (num + c * (1 << di), n + c)
        return out
