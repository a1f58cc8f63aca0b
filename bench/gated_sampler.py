#!/usr/bin/env python
"""Round-long gated scaling sampler (VERDICT r4 item 2).

Loops for the whole round: every --period seconds, run the cheap
pre-flight purepy control; when the host is purepy-HEALTHY (control
N->4N efficiency >= --health-min AND the 8-proc absolute rate is in
the recorded quiet band) confirm with a ~1-min pinned depth-1 Spark
crawl probe (--spark-probe-min urls/s; the purepy control alone is
blind to Spark-shaped degradation — see spark_probe's docstring), and
only then fire the full pinned interleaved grid (bench/scaling.py
protocol). Append every probe + grid outcome to
BENCH/r5_sampler.jsonl; stop on the first grid whose median
efficiency >= 0.8 (or engine/control >= 0.95 with control >= 0.8)
with healthy pre+per-trial controls, writing it to
BENCH/scaling_success.json.

Coordination: skips probes while /tmp/iws_busy exists — the developer
touches it during their own Spark-heavy test runs so self-inflicted
load is not recorded as co-tenant degradation — and, as a backstop for
runs nobody flags, while a bench.py or pytest process is live on this
machine (the per-round BENCH_r{N} artifact is produced by an external
driver that does not know about the flag; a pinned probe landing inside
its 2-minute window would skew the round's official numbers).
"""

from __future__ import annotations

import argparse
import datetime
import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUSY_FLAG = "/tmp/iws_busy"
LOG = os.path.join(REPO, "BENCH", "r5_sampler.jsonl")
SUCCESS = os.path.join(REPO, "BENCH", "scaling_success.json")

spec = importlib.util.spec_from_file_location(
    "scaling", os.path.join(REPO, "bench", "scaling.py")
)
scaling = importlib.util.module_from_spec(spec)
sys.modules["scaling"] = scaling
spec.loader.exec_module(scaling)


def foreign_spark_work() -> bool:
    """True while someone else's measurement-sensitive work is live:
    a ``bench.py`` run (the external per-round driver produces the
    official BENCH_r{N} artifact without touching the busy flag) or a
    ``pytest`` suite. Cheap /proc scan; own process tree excluded by
    name (this file and scaling.py never match either pattern)."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                toks = f.read().decode(errors="replace").split("\0")
        except OSError:
            continue
        # token-wise, not substring over the joined line: shell wrappers
        # quoting unrelated commands must not read as live bench runs
        for i, t in enumerate(toks):
            base = t.rsplit("/", 1)[-1]
            if base in ("bench.py", "pytest"):
                return True
            if t == "pytest" and i and toks[i - 1] == "-m":
                return True
        # any live Spark JVM is foreign at check time — our own probes
        # and grids only start after this returns False, so an ad-hoc
        # driver-sim/explain session that never touched the busy flag
        # can't silently crush a probe inside a healthy window (it did,
        # 2026-08-18 11:16Z — the first in-band window in days)
        names = [t.rsplit("/", 1)[-1] for t in toks]
        if "java" in names and any("spark" in t.lower() for t in toks):
            return True
    return False


def log(rec: dict) -> None:
    rec["ts"] = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe(small: int, big: int) -> dict:
    band = None
    band_path = os.path.join(REPO, "BENCH", "host_band.json")
    if os.path.exists(band_path):
        with open(band_path) as f:
            band = json.load(f)["purepy_8p_pages_per_sec_band"]
    # in-band check MUST use the band's own shape (bench.py
    # host_health: 8 procs, 16k pages, spawn included) — the original
    # 8k-page probe read ~2/3 of the band-comparable rate (spawn
    # amortization) and tagged healthy hosts out-of-band all round.
    r8 = scaling.run_purepy_control(8, n_pages=16_000)
    # efficiency control: warmed pools, timed work only, equal
    # pages-per-proc — a fixed ~1 s spawn over different walls at N vs
    # 4N otherwise reads as false inefficiency (~0.79 on an idle host).
    rs = scaling.run_purepy_control(small, n_pages=4_000 * small, warm=True)
    rb = scaling.run_purepy_control(big, n_pages=4_000 * big, warm=True)
    eff = (rb / rs) / (big / small)
    return {
        "rate_8p": round(r8, 1),
        "rate_small": round(rs, 1),
        "rate_big": round(rb, 1),
        "control_eff": round(eff, 3),
        "in_band": band is None or r8 >= band[0],
        "band": band,
    }


def spark_probe(big: int) -> tuple[float, float]:
    """Second-stage gate: a SHORT pinned depth-1 crawl at local[big]
    (~25 s of Spark work + startup). The 2026-08-17 grids proved the
    purepy control is blind to Spark-shaped degradation: three voided
    grids ran with purepy efficiency 0.85-1.07 and in-band absolute
    rates while the pinned Spark arms sat at 1/3 of their same-day
    recorded pace (local[8] 940 urls/s vs a 3065 urls/s local[4] that
    morning) and swung 2.4x between trials. Only a Spark-shaped probe
    predicts Spark-shaped throughput; this one costs ~1 min and its
    rate gates the 30-min grid."""
    r = scaling.run_once(
        big,
        4096,
        {
            "SPARK_GRAFT_FUSE": "1",
            "SPARK_GRAFT_CRAWL_ONLY": "1",
            "SPARK_GRAFT_CRAWL_DEPTH": "1",
        },
        pin=True,
    )
    return (
        float(r["extra"]["crawl_urls_per_sec"]),
        float(r["extra"].get("crawl_marginal_pages_per_sec", 0.0)),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--period", type=int, default=420)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--big", type=int, default=4)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=8192)
    ap.add_argument("--health-min", type=float, default=0.75)
    ap.add_argument("--max-hours", type=float, default=6.0)
    ap.add_argument(
        "--spark-probe-min",
        type=float,
        default=3000.0,
        help="minimum pinned local[big] depth-1 MARGINAL crawl rate "
        "(biggest round's pages/s) to fire the grid; calibration "
        "2026-08-17: 1529 in the degraded window that voided three "
        "purepy-healthy grids (aggregate 602-680), ~4000+ projected "
        "for the morning window that recorded pinned local[4]=3065 "
        "aggregate (see BENCH/BASELINE.md §19)",
    )
    args = ap.parse_args()

    deadline = time.monotonic() + args.max_hours * 3600
    while time.monotonic() < deadline:
        if os.path.exists(BUSY_FLAG) or foreign_spark_work():
            time.sleep(60)
            continue
        p = probe(args.small, args.big)
        healthy = p["in_band"] and p["control_eff"] >= args.health_min
        log({"kind": "probe", "healthy": healthy, **p})
        if not healthy:
            time.sleep(args.period)
            continue

        # stage 2: purepy-healthy — confirm with the Spark-shaped probe
        # before paying for a 30-min grid (purepy alone passed three
        # grids that Spark arms then voided). The gate is the MARGINAL
        # rate (biggest round's own pages/s): fixed per-round costs
        # dominate the short probe's aggregate, while grid-scale crawls
        # are marginal-rate-dominated — a probe aggregate of ~660 read
        # identically in a window whose marginal rate was healthy and
        # one whose grid collapsed.
        sp, sp_marginal = spark_probe(args.big)
        sp_ok = sp_marginal >= args.spark_probe_min
        log({"kind": "spark_probe", "rate": round(sp, 1),
             "marginal": round(sp_marginal, 1),
             "min": args.spark_probe_min, "ok": sp_ok})
        if not sp_ok:
            time.sleep(args.period)
            continue

        # healthy window — fire the full strict pinned grid as a
        # subprocess so its own pre-flight re-verifies immediately
        # before the Spark arms launch
        cmd = [
            sys.executable,
            os.path.join(REPO, "bench", "scaling.py"),
            "--pin", "--strict", "--skip-skew",
            "--small", str(args.small), "--big", str(args.big),
            "--trials", str(args.trials), "--seeds", str(args.seeds),
            "--health-min", str(args.health_min),
        ]
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=5400, cwd=REPO
            )
        except subprocess.TimeoutExpired:
            # a degraded host can stretch the grid past the cap (6 arms
            # × up to 1800 s + controls) — that is a FAILED grid, not a
            # reason to kill the round-long watch
            log({"kind": "grid", "outcome": "timeout"})
            time.sleep(args.period)
            continue
        summary = None
        buf = []
        for line in out.stdout.splitlines():
            if buf or line.startswith("{"):
                buf.append(line)
        if buf:
            try:
                summary = json.loads("\n".join(buf))
            except json.JSONDecodeError:
                summary = None
        if summary is None or "aborted" in summary:
            log({"kind": "grid", "outcome": "aborted-degraded",
                 "detail": summary, "tail": out.stdout[-500:]})
            time.sleep(args.period)
            continue
        arm = summary.get("fused", {})
        passed = bool(arm.get("pass")) and summary["host_health"]["healthy"]
        log({"kind": "grid", "outcome": "pass" if passed else "fail",
             "summary": summary})
        if passed:
            with open(SUCCESS, "w") as f:
                json.dump(summary, f, indent=2)
            log({"kind": "done", "success": True})
            return
        time.sleep(args.period)
    log({"kind": "done", "success": False})


if __name__ == "__main__":
    main()
