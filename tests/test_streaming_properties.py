"""Property-based streaming sessionization parity: a real
applyInPandasWithState stream over RANDOM event batches must emit
exactly the closed sessions of an independent Python twin of the
documented state machine (streaming/events.py:_sessionize — 30-min
gap closes, within-batch events process in ts order, state carries the
open session across micro-batches, the final open session is never
emitted). The fixed test (test_streaming.py:test_sessionization_stateful)
checks well-formedness on one fixture; this pins exact emission —
including cross-batch out-of-order arrivals, which MERGE into the open
session (end = max) rather than reopening history."""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.streaming.events import (
    read_event_stream,
    run_to_memory,
    sessionized,
)

_GAP_MS = 30 * 60 * 1000
_BASE_MS = 1_700_000_000_000  # fixed epoch base, minutes offset on top

# (user_id 0-2, minutes 0-200): 30-min gaps are common but not certain
_event = st.tuples(st.integers(0, 2), st.integers(0, 200))
_batches = st.lists(
    st.lists(_event, min_size=1, max_size=6), min_size=1, max_size=3
)


def _ms(minutes: int) -> int:
    return _BASE_MS + minutes * 60_000


def py_closed_sessions(batches):
    """Twin of the operator's contract: per micro-batch, each user's
    events in ts order feed the (start, end, n) state; a gap > 30 min
    closes and emits; the open session survives in state unemitted."""
    state: dict[int, list[int] | None] = {}
    out = []
    for batch in batches:
        by_user: dict[int, list[int]] = {}
        for u, m in batch:
            by_user.setdefault(u, []).append(_ms(m))
        for u, mss in by_user.items():
            cur = state.get(u)
            for ms in sorted(mss):
                if cur is None:
                    cur = [ms, ms, 1]
                elif ms - cur[1] <= _GAP_MS:
                    cur[1] = max(cur[1], ms)
                    cur[2] += 1
                else:
                    out.append((u, cur[0], cur[1], cur[2]))
                    cur = [ms, ms, 1]
            state[u] = cur
    return sorted(out)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_batches)
def test_stream_sessionization_equals_python_twin(spark, tmp_path_factory, batches):
    root = str(tmp_path_factory.mktemp("sess_prop"))
    d = os.path.join(root, "stream")
    os.makedirs(d)
    for b, batch in enumerate(batches):
        pdf = pd.DataFrame(
            {
                "event_id": range(len(batch)),
                "ts": [pd.Timestamp(_ms(m), unit="ms") for (_u, m) in batch],
                "user_id": [u for (u, _m) in batch],
                "event_type": "x",
                "value": 0.0,
                "props": "{}",
            }
        )
        tmpd = os.path.join(root, f"_b{b}")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(tmpd)
        dst = os.path.join(d, f"chunk{b}.parquet")
        shutil.copy(glob.glob(os.path.join(tmpd, "*.parquet"))[0], dst)
        os.utime(dst, (1_000_000 + b, 1_000_000 + b))  # batch order = b

    name = f"sess_prop_{uuid.uuid4().hex[:8]}"
    run_to_memory(
        sessionized(read_event_stream(spark, d)),
        name,
        os.path.join(root, "ckpt"),
        "append",
    )
    got = sorted(
        (
            int(r.user_id),
            int(r.session_start.value // 1_000_000),
            int(r.session_end.value // 1_000_000),
            int(r.n_events),
        )
        for r in spark.table(name).toPandas().itertuples()
    )
    assert got == py_closed_sessions(batches)
