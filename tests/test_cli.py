"""Smoke tests for the spark-submit entry point (crawl_cli.main) — the
north_rule's deployment path. In-process: get_spark's getOrCreate
reuses the pytest session, so the flags-to-CrawlConfig wiring and the
JSON contract are exercised without a second JVM."""

from __future__ import annotations

import json

import pytest

from isidorus_web_scraper_spark.crawl_cli import main


def _run(capsys, argv: list[str]) -> dict:
    main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_synthetic_crawl_and_resume(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh_cli")
    res = _run(
        capsys,
        ["--warehouse", wh, "--synthetic-hosts", "2",
         "--seed", "http://h0.test/p0.html", "--depth", "1",
         "--budget", "1000000", "--max-rounds", "8"],
    )
    assert res["rounds"] >= 2 and res["fetched"] >= 1
    # resume on a drained warehouse: no new rounds, valid JSON
    res2 = _run(capsys, ["--warehouse", wh, "--synthetic-hosts", "2",
                         "--resume"])
    assert res2["rounds"] == 0 and res2["fetched"] == 0


def test_cli_breaker_flags_reach_config(spark, tmp_path, capsys):
    """--error-backoff-* must reach CrawlConfig: an invalid threshold
    fails the engine's own validation, proving the flag isn't dropped
    on the floor (and a valid one crawls clean)."""
    wh = str(tmp_path / "wh_cli_b")
    with pytest.raises(ValueError, match="error_backoff"):
        main(["--warehouse", wh, "--synthetic-hosts", "2",
              "--seed", "http://h0.test/p0.html", "--depth", "0",
              "--error-backoff-threshold", "1e-9"])
    res = _run(
        capsys,
        ["--warehouse", str(tmp_path / "wh_cli_c"), "--synthetic-hosts", "2",
         "--seed", "http://h0.test/p0.html", "--depth", "0",
         "--error-backoff-threshold", "0.5"],
    )
    assert res["fetched"] == 1


def test_cli_requires_corpus_mode_and_seed(spark, tmp_path, capsys):
    with pytest.raises(SystemExit):
        main(["--warehouse", str(tmp_path / "w1"),
              "--seed", "http://h0.test/p0.html"])  # no corpus mode
    with pytest.raises(SystemExit):
        main(["--warehouse", str(tmp_path / "w2"),
              "--synthetic-hosts", "2"])  # no seed, no --resume
