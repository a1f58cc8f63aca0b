"""SparkSession factory with scale-appropriate defaults.

Local-mode knobs are tuned for the sandbox (single JVM, 32 threads,
128 GiB); the same settings translate to multi-executor clusters where
AQE + adaptive skew-join handle runtime re-planning. Nothing here is
sandbox-specific except the master default.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local-mode equivalent of
    ``spark-submit --py-files``) so UDFs resolve regardless of cwd."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            pkg_name, os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "isidorus_web_scraper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``shuffle_partitions`` defaults to the core count: on local mode a
    200-partition shuffle just adds scheduling overhead; on a real
    cluster callers pass cores*2..3. AQE coalesces downward at runtime
    either way.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    n_shuffle = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~15 KB/page rows make the 10k-row default a ~150 MB Arrow
        # batch — terrible pipelining between the JVM and Python
        # workers; 1k rows measured 0.54→0.67 on 2→8 parse scaling
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE r6: spark.sql.join.preferSortMergeJoin=false (+ the AQE
        # SMJ→SHJ rewrite threshold) was tried per guide §9 and REVERTED
        # on an interleaved A/B: shuffled-hash was consistently 10-40%
        # slower on this workload's join shapes (ppr 3.8→6.1 s, knn
        # 2.3→3.7 s, hits 2.0→2.3 s) — per-partition hash-table builds
        # beat the sorts only when partitions are large; here AQE's
        # coalesced partitions are small and the sort is cheap.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark
