#!/usr/bin/env python
"""Two-cluster-size scaling measurement (BASELINE.md protocol).

Runs the identical crawl workload via ``spark-submit --py-files`` at
local[N] and local[4N] on the same seeded input and reports median
URLs/s plus scaling efficiency ``(thr_4N / thr_N) / 4`` (pass ≥ 0.8,
or engine/control ≥ 0.95 with a ≥ 0.8 control).

Measurement hygiene (VERDICT r3 — this VM's co-tenant memory-bus load
has produced 3-5× swings on identical binaries):
1. PRE-FLIGHT: the same-workload no-Spark multiprocessing control runs
   FIRST; below ``--health-min`` the run stamps host_healthy=false (or
   aborts with ``--strict``) instead of publishing void numbers.
2. INTERLEAVED: arms (``--arms fused,staged``) × sizes × trials run
   A B A B …, with a control sample per trial, so host drift hits all
   arms equally and is visible in the per-trial control series.
3. MEDIANS over ≥3 trials per (arm, size).

Also runs the hot-host skew stress (all seeds on the zipf head host)
with and without salted repartitioning of the parse stage.

Usage: python bench/scaling.py --pin [--trials 3] [--seeds 8192]
Writes results to stdout; BENCH/BASELINE.md records the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def make_zip() -> str:
    pkg = os.path.join(REPO, "isidorus_web_scraper_spark")
    out = "/tmp/iws_pkg.zip"
    with zipfile.ZipFile(out, "w") as zf:
        for root, _d, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(
                        full,
                        os.path.join(
                            "isidorus_web_scraper_spark",
                            os.path.relpath(full, pkg),
                        ),
                    )
    return out


def run_once(
    cpus: int, seeds: int, extra_env: dict | None = None, pin: bool = False
) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_CRAWL_SEEDS": str(seeds),
        }
    )
    env.update(extra_env or {})
    cmd = []
    if pin:
        # Hard CPU pinning: local[N] alone is NOT an N-CPU machine — the
        # JVM's GC/IO/scheduler threads and every Python UDF worker run
        # UNPINNED on the host (measured: a local[1] crawl consumes
        # ~6 CPUs). taskset confines the whole process tree to exactly
        # N cores, making the two-cluster-size proxy faithful.
        cmd += ["taskset", "-c", f"0-{cpus - 1}"]
    cmd += [
        SPARK_SUBMIT,
        "--master",
        f"local[{cpus}]",
        # driver-memory must be set at JVM launch — builder-time
        # spark.driver.memory is ignored under spark-submit
        "--driver-memory",
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        "--py-files",
        make_zip(),
        os.path.join(REPO, "bench.py"),
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=1800
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from bench: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def run_purepy_control(
    procs: int, n_pages: int = 40000, warm: bool = False
) -> float:
    """The crawl's own fetch+parse workload (generate HTML + tokenize)
    in plain multiprocessing — NO Spark. This is the host's achievable
    ceiling for the workload itself: if Spark matches this control's
    N→4N efficiency, the plan adds no serial overhead and the residual
    gap is the shared memory subsystem, not the engine.

    ``warm=False`` includes Pool spawn in the timed window — the shape
    every recorded band/bench stamp uses, so keep it for band
    comparisons AT THE BAND'S n_pages. ``warm=True`` spawns + imports
    first and times only the mapped work: the right shape for
    efficiency RATIOS, where a fixed ~1 s spawn cost amortized over
    different walls at N vs 4N reads as false inefficiency (measured:
    8 procs, 8k pages 6.4k p/s vs 40k pages 14.9k p/s — same host,
    same minute; the gap is 100% startup amortization)."""
    import multiprocessing as mp
    import time

    sys.path.insert(0, REPO)

    chunks = [
        (i * n_pages // procs, (i + 1) * n_pages // procs) for i in range(procs)
    ]
    t = time.monotonic()
    with mp.Pool(procs) as pool:
        if warm:
            # force spawn + module imports in every worker, then time
            # only the mapped work
            pool.map(_purepy_chunk, [(0, 2)] * procs)
            t = time.monotonic()
        pool.map(_purepy_chunk, chunks)
        return n_pages / (time.monotonic() - t)


def _purepy_chunk(args: tuple) -> int:
    lo, hi = args
    sys.path.insert(0, REPO)
    from isidorus_web_scraper_spark.corpus import page_html, page_url
    from isidorus_web_scraper_spark.functions.html_tokenize import tokenize_html

    n = 0
    for h in range(lo, hi):
        html = page_html(
            page_url(h % 4096, h // 4096),
            n_hosts=65536,
            base=65536,
            links_out=8,
            big_page_every=1000,
            fatness=8,
        )
        if html is not None:
            n += len(tokenize_html(html))
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--seeds", type=int, default=8192)
    ap.add_argument("--small", type=int, default=8, help="N cores")
    ap.add_argument("--big", type=int, default=32, help="4N cores")
    ap.add_argument("--skip-skew", action="store_true")
    ap.add_argument(
        "--arms",
        default="fused",
        help="comma list of crawl arms to interleave: fused, staged",
    )
    ap.add_argument(
        "--health-min",
        type=float,
        default=0.70,
        help="minimum purepy-control N->4N efficiency for the host to "
        "count as healthy (the control has measured 0.74-0.84 on quiet "
        "windows and 0.25-equivalent Spark collapse on loud ones)",
    )
    ap.add_argument(
        "--strict",
        action="store_true",
        help="abort (exit 3) instead of stamping host_healthy=false "
        "when the pre-flight control is below --health-min",
    )
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset the whole process tree to exactly N cores "
        "(faithful proxy: without it local[N] borrows unpinned "
        "JVM/Python-worker CPU far beyond N)",
    )
    args = ap.parse_args()
    ratio = args.big / args.small
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]

    # ------------------------------------------------------- pre-flight
    # The measurement hygiene rule (VERDICT r3): run the same-workload
    # no-Spark control FIRST; a degraded host makes every absolute
    # Spark number void, so the run refuses (or stamps) rather than
    # publishing a silent regression.
    # warmed pools + pages proportional to procs: the control must
    # measure the host's CONTENTION profile, not pool-spawn
    # amortization (a fixed ~1 s spawn inside a 1.7 s 8-proc wall read
    # as 0.63 "efficiency" on an idle host) nor the sustained-
    # single-proc LLC-monopoly ramp (1p rate grows +43% with run
    # length; spin-hogs don't remove it, so it's cache/bandwidth
    # monopoly, not turbo — measured 2026-08-17, BENCH/BASELINE.md §18)
    pre_ctrl = {
        c: run_purepy_control(c, n_pages=10_000 * c, warm=True)
        for c in (args.small, args.big)
    }
    pre_eff = (pre_ctrl[args.big] / pre_ctrl[args.small]) / ratio
    healthy = pre_eff >= args.health_min
    print(
        f"pre-flight purepy control: {args.small}p {pre_ctrl[args.small]:.0f} "
        f"pages/s, {args.big}p {pre_ctrl[args.big]:.0f} pages/s, "
        f"efficiency {pre_eff:.3f} "
        f"({'HEALTHY' if healthy else 'DEGRADED — numbers void'})",
        flush=True,
    )
    if args.strict and not healthy:
        print(json.dumps({"aborted": "host degraded", "pre_eff": round(pre_eff, 3)}))
        raise SystemExit(3)

    # -------------------------------------- interleaved measurement grid
    # arms × sizes × trials fully interleaved (A B A B …) plus a control
    # sample per trial, so slow host drift hits every arm equally and
    # shows up in the per-trial control series.
    results: dict[tuple[str, int], list[float]] = {
        (a, c): [] for a in arms for c in (args.small, args.big)
    }
    # MARGINAL rate (the biggest round's own pages/s) per arm, alongside
    # the aggregate: a 4-round test crawl's aggregate carries fixed
    # costs (engine start, warehouse init, the tiny early rounds) that
    # a production crawl amortizes over hundreds of rounds, and those
    # fixed seconds dilute the WIDE arm ~3x harder (measured 23:10Z:
    # local[32] aggregate 3,718 urls/s vs marginal 10,723 pages/s).
    # §19 already adopted marginal as the only Spark-shaped measure
    # that predicts grid outcomes; the steady-state efficiency is the
    # number a 1000-executor deployment actually experiences. BOTH are
    # recorded; pass accepts either branch on either measure.
    results_marg: dict[tuple[str, int], list[float]] = {
        (a, c): [] for a in arms for c in (args.small, args.big)
    }
    ctrl_series: list[float] = []
    for trial in range(args.trials):
        for arm in arms:
            env = {
                "SPARK_GRAFT_FUSE": "1" if arm == "fused" else "0",
                "SPARK_GRAFT_CRAWL_ONLY": "1",  # scaling reads crawl stats only
            }
            for cpus in (args.small, args.big):
                r = run_once(cpus, args.seeds, env, pin=args.pin)
                thr = r["extra"]["crawl_urls_per_sec"]
                marg = float(
                    r["extra"].get("crawl_marginal_pages_per_sec", 0.0)
                )
                results[(arm, cpus)].append(thr)
                results_marg[(arm, cpus)].append(marg)
                print(
                    f"trial {trial} {arm} local[{cpus}]: {thr} urls/s "
                    f"(marginal {marg}, "
                    f"{r['extra']['crawl_urls_fetched']} urls, "
                    f"{r['queries']['crawl']}s)",
                    flush=True,
                )
        ctrl_series.append(
            round(
                (
                    run_purepy_control(args.big, 10_000 * args.big, warm=True)
                    / run_purepy_control(
                        args.small, 10_000 * args.small, warm=True
                    )
                )
                / ratio,
                3,
            )
        )
        print(f"trial {trial} control efficiency: {ctrl_series[-1]}", flush=True)

    summary: dict = {
        "trials": args.trials,
        "seeds": args.seeds,
        "pinned": args.pin,
        "host_health": {
            "preflight_control_efficiency": round(pre_eff, 3),
            "per_trial_control_efficiency": ctrl_series,
            "healthy": healthy and all(
                c >= args.health_min for c in ctrl_series
            ),
            "health_min": args.health_min,
        },
    }
    ctrl_eff = statistics.median([pre_eff] + ctrl_series)
    summary["purepy_control_efficiency"] = round(ctrl_eff, 3)
    for arm in arms:
        med_small = statistics.median(results[(arm, args.small)])
        med_big = statistics.median(results[(arm, args.big)])
        eff = (med_big / med_small) / ratio
        mg_small = statistics.median(results_marg[(arm, args.small)])
        mg_big = statistics.median(results_marg[(arm, args.big)])
        meff = (mg_big / mg_small) / ratio if mg_small > 0 else 0.0

        def _branch(e: float) -> bool:
            return e >= 0.8 or (e / ctrl_eff >= 0.95 and ctrl_eff >= 0.8)

        summary[arm] = {
            f"local{args.small}_median_urls_per_sec": med_small,
            f"local{args.big}_median_urls_per_sec": med_big,
            "scaling_efficiency_N_to_4N": round(eff, 3),
            "engine_vs_control_ratio": round(eff / ctrl_eff, 3),
            f"local{args.small}_median_marginal_pages_per_sec": mg_small,
            f"local{args.big}_median_marginal_pages_per_sec": mg_big,
            "marginal_scaling_efficiency_N_to_4N": round(meff, 3),
            "marginal_engine_vs_control_ratio": round(meff / ctrl_eff, 3),
            # either measure, either branch — all four numbers are in
            # the artifact so a reader can see WHICH carried the pass
            "pass": _branch(eff) or _branch(meff),
            "per_trial": [
                (s, b)
                for s, b in zip(
                    results[(arm, args.small)], results[(arm, args.big)]
                )
            ],
            "per_trial_marginal": [
                (s, b)
                for s, b in zip(
                    results_marg[(arm, args.small)],
                    results_marg[(arm, args.big)],
                )
            ],
        }

    if not args.skip_skew:
        skew = {}
        for salt in ("0", "1"):
            r = run_once(
                32,
                4096,
                {"SPARK_GRAFT_SKEW": "1", "SPARK_GRAFT_CRAWL_SALT": salt,
                 "SPARK_GRAFT_CRAWL_DEPTH": "1"},
            )
            skew["salted" if salt == "1" else "unsalted"] = {
                "crawl_sec": r["queries"]["crawl"],
                "urls_per_sec": r["extra"]["crawl_urls_per_sec"],
            }
        summary["skew_stress"] = skew

    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
