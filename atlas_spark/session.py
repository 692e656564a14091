"""SparkSession construction with scale-oriented defaults.

Single place where the engine's Spark configuration lives so tests,
the bench harness and the CLI all agree.  On a real cluster the same
builder is used via ``spark-submit --py-files``; locally ``master``
defaults to ``local[N]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB design point, scaled down sanely for
# local runs.  Shuffle partitions are set ≈ cores locally; on a real
# cluster AQE coalesces them, so a higher static number is fine.
_BASE_CONF = {
    # AQE: runtime re-planning, skew-join splitting, partition coalescing.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas interchange (vectorized UDF surface).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Don't let tiny local parquet files explode into thousands of tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Deterministic timestamps in tests.
    "spark.sql.session.timeZone": "UTC",
    # Reading a bucketed table passes every live file as its own root
    # path; above 32 paths Spark launches a DISTRIBUTED file-listing
    # job (parallelPartitionDiscovery) — a whole scheduled job to
    # stat() a few dozen local files, ~0.5-1 s of serialized driver
    # time per epoch on the merge's existing-side read.  Local stat is
    # cheap; keep listing on the driver far past any per-epoch file
    # count (a real cluster against S3 may want this lower again).
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "8192",
    # CollectLimit defaults to scanning reduce partitions incrementally
    # (1, then ×4, …) — for the merge's bounded winner collect that is
    # up to 3 SEQUENTIAL reduce waves of driver-serialized scheduling
    # per epoch.  The bound is a memory guard, not a top-k: scan every
    # partition in one round.
    "spark.sql.limit.initialNumPartitions": "10000",
    # zstd: measured −47% table size at equal-or-better replay speed
    # vs snappy on the content-heavy corpus — at 100 TB that is the
    # scan-IO budget.
    "spark.sql.parquet.compression.codec": "zstd",
    # Quieter local runs.
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}

# local[N] runs driver+executors in ONE JVM whose default heap is 1g —
# 32 concurrent sort/window tasks OOM or GC-thrash under it.  Empirical
# sweep on this box: 1g → GC-bound, 48g → G1 region/commit pathology
# (5× slower); 8–16g with ParallelGC and a pinned -Xms is the sweet
# spot (window stage 14.5s → 1.5s at local[32]).  Overridable via
# ATLAS_SPARK_DRIVER_MEM.
_DRIVER_MEM = os.environ.get("ATLAS_SPARK_DRIVER_MEM", "16g")
_GC_OPTS = f"-XX:+UseParallelGC -Xms{_DRIVER_MEM}"


def get_spark(
    app_name: str = "atlas_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``.  ``shuffle_partitions`` defaults to the local core
    count so small-scale runs don't pay 200-partition scheduling tax;
    cluster deployments should pass an explicit larger value (AQE
    coalesces the excess).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        n = _parse_local_cores(master)
        shuffle_partitions = n if n else 200

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    conf["spark.driver.memory"] = _DRIVER_MEM
    conf["spark.driver.extraJavaOptions"] = _GC_OPTS
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _parse_local_cores(master: str) -> int | None:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return None
    return None
