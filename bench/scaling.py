#!/usr/bin/env python
"""Two-cluster-size scaling measurement (BASELINE.md protocol).

Runs the identical crawl workload via ``spark-submit --py-files`` at
local[8] (N) and local[32] (4N) on the same seeded input, 3 trials
each, and reports median URLs/s plus scaling efficiency
``(thr_4N / thr_N) / 4`` (pass ≥ 0.8). Also runs the hot-host skew
stress (all seeds on the zipf head host) with and without salted
repartitioning of the parse stage.

Usage: python bench/scaling.py [--trials 3] [--seeds 8192]
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


def run_purepy_control(procs: int, n_pages: int = 40000) -> float:
    """The crawl's own fetch+parse workload (generate HTML + tokenize)
    in plain multiprocessing — NO Spark. This is the host's achievable
    ceiling for the workload itself: if Spark matches this control's
    N→4N efficiency, the plan adds no serial overhead and the residual
    gap is the shared memory subsystem, not the engine."""
    import multiprocessing as mp
    import time

    sys.path.insert(0, REPO)

    chunks = [
        (i * n_pages // procs, (i + 1) * n_pages // procs) for i in range(procs)
    ]
    t = time.monotonic()
    with mp.Pool(procs) as pool:
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
        "--pin",
        action="store_true",
        help="taskset the whole process tree to exactly N cores "
        "(faithful proxy: without it local[N] borrows unpinned "
        "JVM/Python-worker CPU far beyond N)",
    )
    args = ap.parse_args()

    results: dict[int, list[float]] = {args.small: [], args.big: []}
    for trial in range(args.trials):
        for cpus in (args.small, args.big):
            r = run_once(cpus, args.seeds, pin=args.pin)
            thr = r["extra"]["crawl_urls_per_sec"]
            results[cpus].append(thr)
            print(
                f"trial {trial} local[{cpus}]: {thr} urls/s "
                f"({r['extra']['crawl_urls_fetched']} urls, "
                f"{r['queries']['crawl']}s)",
                flush=True,
            )
    med_small = statistics.median(results[args.small])
    med_big = statistics.median(results[args.big])
    ratio = args.big / args.small
    eff = (med_big / med_small) / ratio
    summary = {
        f"local{args.small}_median_urls_per_sec": med_small,
        f"local{args.big}_median_urls_per_sec": med_big,
        "scaling_efficiency_N_to_4N": round(eff, 3),
        "pass": eff >= 0.8,
        "trials": args.trials,
        "seeds": args.seeds,
        "pinned": args.pin,
    }

    # workload-ceiling control: same fetch+parse work, no Spark
    ctrl = {
        c: statistics.median(
            run_purepy_control(c) for _ in range(args.trials)
        )
        for c in (args.small, args.big)
    }
    ctrl_eff = (ctrl[args.big] / ctrl[args.small]) / ratio
    summary["purepy_control_pages_per_sec"] = {
        str(c): round(v, 1) for c, v in ctrl.items()
    }
    summary["purepy_control_efficiency"] = round(ctrl_eff, 3)
    summary["spark_vs_control_efficiency_ratio"] = round(eff / ctrl_eff, 3)

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
