"""Streaming/batch parity + stateful sessionization."""

from __future__ import annotations

import pandas as pd
import pytest

from isidorus_web_scraper_spark.dataset_queries import events_tumbling_window
from isidorus_web_scraper_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    sessionized,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_small, tmp_path_factory):
    """Testdata events written as 3 files — 3 micro-batches."""
    d = tmp_path_factory.mktemp("events_stream")
    events = spark.read.parquet(f"{sf_small}/events.parquet")
    events.filter("event_id % 3 = 0").coalesce(1).write.parquet(str(d / "f0"))
    events.filter("event_id % 3 = 1").coalesce(1).write.parquet(str(d / "f1"))
    events.filter("event_id % 3 = 2").coalesce(1).write.parquet(str(d / "f2"))
    # flatten: move part files up so the dir is one stream source
    import glob
    import shutil

    out = tmp_path_factory.mktemp("events_flat")
    for i, f in enumerate(sorted(glob.glob(str(d / "f*" / "*.parquet")))):
        shutil.copy(f, out / f"chunk{i}.parquet")
    return str(out)


def test_stream_equals_batch(spark, sf_small, event_stream_dir, tmp_path):
    stream = read_event_stream(spark, event_stream_dir)
    assert stream.isStreaming
    run_to_memory(
        windowed_counts(stream), "win_counts", str(tmp_path / "ckpt"), "complete"
    )
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.table("win_counts").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in events_tumbling_window(spark, sf_small).collect()
    }
    assert got == want


def test_sessionization_stateful(spark, event_stream_dir, tmp_path):
    stream = read_event_stream(spark, event_stream_dir)
    run_to_memory(
        sessionized(stream), "sessions", str(tmp_path / "ckpt2"), "append"
    )
    sessions = spark.table("sessions").toPandas()
    if len(sessions) == 0:
        pytest.skip("no closed sessions in fixture — state plumbing still exercised")
    # sessions are well-formed: start <= end, positive counts
    assert (sessions.session_start <= sessions.session_end).all()
    assert (sessions.n_events >= 1).all()
    # gap property: within a user, consecutive closed sessions are >30min apart
    for _uid, grp in sessions.sort_values("session_start").groupby("user_id"):
        starts = grp.session_start.to_list()
        ends = grp.session_end.to_list()
        for i in range(1, len(starts)):
            assert (starts[i] - ends[i - 1]) > pd.Timedelta(minutes=30)


def test_dedup_stream_drops_cross_batch_duplicates(spark, sf_small, tmp_path):
    """dedup_stream = the seen-set in streaming form: an event_id seen
    in an earlier micro-batch must not be emitted again."""
    import glob
    import shutil

    from isidorus_web_scraper_spark.streaming.events import dedup_stream

    events = spark.read.parquet(f"{sf_small}/events.parquet").limit(200)
    d = tmp_path / "dup_stream"
    # batch 0: events as-is; batch 1: the SAME events again (pure dups)
    events.coalesce(1).write.parquet(str(d / "b0"))
    events.coalesce(1).write.parquet(str(d / "b1"))
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "b*" / "*.parquet")))):
        shutil.copy(f, flat / f"chunk{i}.parquet")

    stream = read_event_stream(spark, str(flat))
    out = dedup_stream(stream, ["event_id"], lateness="10 days")
    run_to_memory(out, "dedup_out", str(tmp_path / "ckpt"), mode="append")
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)), "duplicates leaked through"
    assert sorted(ids) == sorted(r.event_id for r in events.collect())
