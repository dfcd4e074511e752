"""SparkSession factory tuned for the local[N] test/bench environment.

At cluster scale the same settings apply, except ``spark.driver.memory``
(executors have their own memory) and ``local[...]`` master. AQE is on so
skewed shuffles re-plan at runtime; shuffle partitions default to the core
count locally (the 200 default over-parallelizes small local data and
under-parallelizes 100 TB — at scale this is set per-job or left to AQE).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "climate_data_pipeline_spark",
              cpus: str | int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(str(cpus)), 8)
        except ValueError:
            # '*' (all cores): use the actual core count — a fixed 32
            # here would cap every shuffle at 32 tasks on bigger hosts
            # (AQE only coalesces down, never up)
            shuffle_partitions = max(os.cpu_count() or 8, 8)
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # the 1MB default floor folds any few-MB shuffle into 1-2
        # tasks, serializing CPU-heavy post-shuffle stages (Arrow
        # rerank kernels most of all) on a 32-core host; 128k keeps
        # parallelismFirst actually parallel on small-but-hot
        # exchanges. At cluster scale partitions sit at the 64MB
        # advisory size, so the floor never binds there.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "128k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local test files are single ~1-20MB parquets; the 128MB default
        # split packs each table into 1-3 tasks and starves the cores.
        # At cluster scale files are sized to the default — tune per-job.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_MAX_PARTITION_BYTES", "4m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def enable_runtime_filters(spark: SparkSession,
                           creation_threshold: str = "64MB",
                           application_threshold: str = "10GB") -> None:
    """Turn on runtime bloom-filter semi-join reduction.

    For selective fact-fact joins (neither side broadcastable) Spark can
    build a bloom filter over the filtered side's join keys and push a
    ``might_contain`` probe into the other side's SCAN — rows that can't
    match never enter the shuffle. At 100 TB this is the difference
    between shuffling the full fact table and shuffling only the ~x% that
    survives the other side's predicate, with zero extra shuffles (the
    filter ships via broadcast).

    ``creation_threshold`` caps the build side's estimated size (too big a
    build side makes a useless saturated filter); ``application_threshold``
    is the minimum application-side scan size worth protecting. Defaults
    are conservative; tests lower them to force the rewrite on small data.
    """
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        creation_threshold)
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold", application_threshold)
