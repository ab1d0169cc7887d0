"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (single JVM, local[N]) but every conf here is the one
you'd set on a 1000-executor cluster too: AQE with skew-join handling,
runtime bloom-filter joins for large anti-joins, Arrow for every
Python-boundary crossing, UTC session time zone (oracle comparisons).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "webscraper_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    task_cpus: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism; defaults to $SPARK_GRAFT_CPUS or all cores.
    shuffle_partitions: defaults to cores (local mode: ~1 partition/core —
    the 200 default over-parallelizes small data and under-parallelizes big).
    task_cpus: spark.task.cpus. Crawl sessions set 2: every fetch+extract
    task really occupies TWO cores (a JVM thread feeding Arrow batches and a
    Python UDF worker), and declaring that stops the scheduler from running
    2x more tasks than the machine has cores — measured 3x wall-clock on the
    wave job at local[32] (124s -> 42s at sf0.4). The same declaration is
    what you'd ship on a real cluster for a Python-UDF-bound pipeline.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        # (WS_NO_AQE=1 disables it — used to A/B plan-stability issues.)
        .config("spark.sql.adaptive.enabled", "false" if os.environ.get("WS_NO_AQE") == "1" else "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", os.environ.get("WS_AQE_COALESCE", "true"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter pushdown for big joins (the J1 anti-join path).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Arrow everywhere Python touches data.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1024-row Arrow batches: at ~3KB/page a batch is ~3MB — resident in
        # LLC while ~40 regex passes sweep it. 4096-row batches (~12MB)
        # thrash the cache and hammer the (shared, saturating) memory bus:
        # measured on the sf0.4 crawl, local[8]: 50.4s @4096 -> 42.8s @1024;
        # 512 (45.4s) and 16384 (52.1s) are both worse. Batch size is a
        # per-core-cache constant, not a data-scale knob — 1024 holds at
        # 100TB too.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("WS_ARROW_BATCH", "1024"))
        # Deterministic timestamps for oracle comparison (duckdb is UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Local mode: the driver is the only JVM; give it the memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Broadcast only genuinely small sides: large broadcast builds are
        # single-threaded on the driver and scale with data — the seen-set
        # anti-joins must shuffle (parallel) instead once they grow.
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        # Hash join over sort-merge where possible: wave joins are
        # equi-joins on url with no useful ordering; sorting page rows is
        # wasted work.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    if task_cpus is not None:
        builder = builder.config("spark.task.cpus", str(task_cpus))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
