"""Structured-Streaming-driven crawl: the continuous-frontier reading
of the brief (VERDICT r4 stretch 8).

The reference's scraper is event-driven — workers long-poll SQS and
each message starts/extends a crawl
(`workers/scraper/main.go` + `queues/sqs_client.go`); the batch engine
(`plans/crawl.py`) replaces the queue with iterative rounds. This
module closes the loop: seed messages arrive CONTINUOUSLY as files
dropped into a directory (the SQS long-poll analog — a file is a
message batch; swap in a Kafka source on a real cluster, the
foreachBatch body is source-agnostic), and ``foreachBatch`` drives the
SAME batch engine. Streaming adds *delivery*, never new crawl
semantics: given the same messages, the end state equals the batch
crawl's (pinned by tests/test_streaming.py).

Exactly-once story, layered:
- ACROSS batches: the file source's checkpoint means each message
  batch enters ``foreachBatch`` once per successful epoch;
- WITHIN a batch: the engine's own round-commit protocol
  (metrics-commit = completion marker, partial-round rollback) makes a
  crash mid-crawl resumable;
- REDELIVERY (crash after the engine committed but before the epoch
  committed): ``foreachBatch`` re-runs the batch — seeds already in
  the ``jobs`` table are dropped (scraping_id is the idempotency key,
  exactly the reference's jobs-keyed-by-scraping semantics), and
  ``engine.run()`` over an already-drained frontier is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SEED_SCHEMA = "scraping_id long, user_id long, url string, depth int"


def process_seed_batch(engine, batch_df: DataFrame, batch_id: int) -> None:
    """The foreachBatch body: enqueue the batch's NEW seed messages
    (idempotent on scraping_id — redelivered batches no-op) and drain
    the frontier with the batch engine. The collect is driver-sized by
    construction: seed messages are tiny control-plane rows (the SQS
    message body, scraper_service.py:50-85), never crawl data."""
    rows = batch_df.collect()
    if not rows:
        engine.run()
        return
    existing: set[int] = set()
    if engine.wh.exists("jobs"):
        existing = {
            r.scraping_id
            for r in engine.wh.read("jobs").select("scraping_id").collect()
        }
    # idempotency must also hold WITHIN a batch: at-least-once delivery
    # can land a producer retry in the same micro-batch as its original
    # (two files, one availableNow trigger) — first message wins, the
    # duplicate no-ops instead of tripping engine.start's uniqueness check
    seeds = []
    for r in rows:
        if r.scraping_id not in existing:
            existing.add(r.scraping_id)
            seeds.append((r.scraping_id, r.user_id, r.url, r.depth))
    if seeds:
        engine.start(seeds)
    engine.run()


def run_streaming_crawl(
    engine,
    seeds_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
):
    """Drain all currently-available seed files through the engine
    (``availableNow`` trigger — the test/cron shape; a production
    deployment would drop the trigger and long-poll like the reference
    workers). Returns after the stream drains."""
    spark = engine.spark
    reader = spark.readStream.schema(SEED_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(seeds_path)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: process_seed_batch(engine, df, bid)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
