"""Model-based warehouse property test: a RANDOM sequence of
append / merge / commit-pruned delete_where / compact ops, applied to
both the real Warehouse and a plain-Python commit-list model that
re-implements the documented contracts (sources/warehouse.py), must
stay observably identical after EVERY op:

- full read (multiset of rows),
- round-exact pruned read at a random round — including the loud
  failure when the round was folded into a compacted span,
- read_asof at a random bound — including the loud failures for
  rewritten commits (merged / asof_valid_from stamps) and for
  compacted spans straddling the bound,
- the manifest's props multiset (round tags, compacted spans, rewrite
  stamps) — the structural state every future prune decision reads.

The fixed tests in test_warehouse.py pin each op alone; this searches
their interleavings (merge-then-compact stamp laundering, delete
windows over folded spans, refold vs periodic cadence)."""

from __future__ import annotations

import json
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from isidorus_web_scraper_spark.sources.warehouse import Warehouse

# ------------------------------------------------------------- model


def _round_range(props):
    if "round" in props:
        return props["round"], props["round"]
    if "round_min" in props and "round_max" in props:
        return props["round_min"], props["round_max"]
    return None


def _stamp(props, avf):
    out = dict(props)
    if avf is None:
        out["merged"] = True
    else:
        out["asof_valid_from"] = max(int(avf), int(out.get("asof_valid_from", -1)))
    return out


class Model:
    """Commit-list twin of the Warehouse's documented semantics."""

    def __init__(self):
        self.commits: list[dict] = []  # {"props": dict, "rows": [(k, v)]}

    def append(self, rows, rnd):
        self.commits.append({"props": {"round": rnd}, "rows": list(rows)})

    def merge_all(self, updates: dict, avf):
        cur = [r for c in self.commits for r in c["rows"]]
        matched = {k for (k, _v) in cur}
        new_rows = [(k, updates[k] if k in updates else v) for (k, v) in cur]
        inserts = [(k, v) for k, v in updates.items() if k not in matched]
        self.commits = [
            {"props": _stamp({}, avf), "rows": new_rows + inserts}
        ]

    def delete_where(self, pred_props, pred_row, avf):
        if not any(pred_props(c["props"]) for c in self.commits):
            return
        for c in self.commits:
            if pred_props(c["props"]):
                c["rows"] = [r for r in c["rows"] if not pred_row(r)]
                c["props"] = _stamp(c["props"], avf)

    def compact(self, upto_round, refold):
        commits = self.commits
        tagged = any(
            "round" in c["props"] or "round_max" in c["props"] for c in commits
        )
        if tagged:
            doomed = []
            for c in commits:
                if not refold and c["props"].get("compacted"):
                    continue
                rng = _round_range(c["props"])
                if rng is not None and rng[1] < upto_round:
                    doomed.append(c)
        else:
            doomed = [
                c
                for c in commits
                if refold or not c["props"].get("compacted")
            ]
        if len(doomed) < 2:
            return
        rows = [r for c in doomed for r in c["rows"]]
        spans = [_round_range(c["props"]) for c in doomed]
        props: dict = {"compacted": True}
        if any(s is not None for s in spans):
            props["round_min"] = min(s[0] for s in spans if s is not None)
            props["round_max"] = max(s[1] for s in spans if s is not None)
        if any(c["props"].get("merged") for c in doomed):
            props["merged"] = True
        avf = [
            c["props"]["asof_valid_from"]
            for c in doomed
            if "asof_valid_from" in c["props"]
        ]
        if avf:
            props["asof_valid_from"] = max(avf)
        doomed_ids = {id(c) for c in doomed}
        kept = [c for c in commits if id(c) not in doomed_ids]
        self.commits = [{"props": props, "rows": rows}] + kept

    # --- observations -----------------------------------------------
    def read_all(self):
        return sorted(r for c in self.commits for r in c["rows"])

    def read_round(self, r):
        for c in self.commits:
            rng = _round_range(c["props"])
            if (
                c["props"].get("compacted")
                and rng is not None
                and rng[0] <= r <= rng[1]
                and c["props"].get("round") != r
            ):
                raise RuntimeError("folded")
        return sorted(
            r2
            for c in self.commits
            if c["props"].get("round") == r
            for r2 in c["rows"]
        )

    def read_asof(self, b):
        keep = []
        for c in self.commits:
            rng = _round_range(c["props"])
            qualifies = rng is None or rng[1] <= b
            if qualifies and (
                c["props"].get("merged")
                or c["props"].get("asof_valid_from", b) > b
            ):
                raise RuntimeError("rewritten")
            if rng is None or rng[1] <= b:
                keep.append(c)
            elif c["props"].get("compacted") and rng[0] <= b:
                raise RuntimeError("straddles")
        return sorted(r for c in keep for r in c["rows"])

    def props_multiset(self):
        return sorted(
            json.dumps(c["props"], sort_keys=True) for c in self.commits
        )


# ----------------------------------------------------------- ops

_rows = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 99)), min_size=1, max_size=4
)
_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(
        st.just("merge"),
        st.dictionaries(st.integers(0, 6), st.integers(100, 199), max_size=3),
    ),
    st.tuples(
        st.just("delete"),
        st.integers(0, 2),  # key % 3 == j
        st.integers(0, 4),  # window lo
        st.integers(0, 3),  # window height (hi = lo + h)
        st.booleans(),      # stamp with a round bound vs bare 'merged'
    ),
    st.tuples(
        st.just("compact"), st.integers(0, 6), st.booleans()
    ),
)


def _collect(df):
    if not df.columns:  # no matching commits on an untyped test table
        return []
    return sorted((r.key, r.val) for r in df.select("key", "val").collect())


def _observe(fn):
    try:
        return ("ok", fn())
    except (RuntimeError, ValueError) as e:
        return ("raise", type(e).__name__)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ops=st.lists(_op, min_size=3, max_size=7),
    probe_round=st.integers(0, 5),
    probe_bound=st.integers(0, 5),
)
def test_warehouse_equals_model(spark, ops, probe_round, probe_bound):
    root = tempfile.mkdtemp(prefix="iws_whprop_")
    wh = Warehouse(spark, root)
    model = Model()
    rnd = 0
    try:
        # seed commit so every read path has data and a schema
        seed = [(0, 1), (1, 2)]
        wh.append(
            "t",
            spark.createDataFrame(seed, "key long, val long"),
            props={"round": rnd},
        )
        model.append(seed, rnd)
        rnd += 1

        for op in ops:
            if op[0] == "append":
                rows = op[1]
                wh.append(
                    "t",
                    spark.createDataFrame(rows, "key long, val long"),
                    props={"round": rnd},
                )
                model.append(rows, rnd)
                rnd += 1
            elif op[0] == "merge":
                upd = op[1]
                if not upd:
                    continue
                wh.merge(
                    "t",
                    spark.createDataFrame(
                        list(upd.items()), "key long, val long"
                    ),
                    ["key"],
                    asof_valid_from=rnd,
                )
                model.merge_all(upd, rnd)
            elif op[0] == "delete":
                _, j, lo, h, bounded = op
                hi = lo + h
                avf = hi if bounded else None

                def pred_props(p, lo=lo, hi=hi):
                    rng = _round_range(p)
                    return rng is None or (rng[1] >= lo and rng[0] <= hi)

                wh.delete_where(
                    "t",
                    f"key % 3 = {j}",
                    commit_pred=pred_props,
                    asof_valid_from=avf,
                )
                model.delete_where(
                    pred_props, lambda r, j=j: r[0] % 3 == j, avf
                )
            else:  # compact
                _, upto, refold = op
                wh.compact("t", upto_round=upto, refold_compacted=refold)
                model.compact(upto, refold)

            # --- observable parity after every op -----------------
            assert _collect(wh.read("t")) == model.read_all()
            assert _observe(
                lambda: _collect(wh.read("t", {"round": probe_round}))
            ) == _observe(lambda: model.read_round(probe_round))
            assert _observe(
                lambda: _collect(wh.read_asof("t", probe_bound))
            ) == _observe(lambda: model.read_asof(probe_bound))
            got_props = sorted(
                json.dumps(c["props"], sort_keys=True)
                for c in wh._read_manifest("t")["commits"]
            )
            assert got_props == model.props_multiset()
    finally:
        shutil.rmtree(root, ignore_errors=True)
