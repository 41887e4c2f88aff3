"""SparkSession factory with scale-appropriate defaults.

Replaces the reference's process-level knobs (async semaphore,
``max_concurrent_requests`` — reference ``src/processor.py:82-84``,
``config/default_config.yaml:17-21``) with Spark task parallelism + AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xdan_dqa_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for this engine.

    Defaults target local[N] testing but every setting is the one you'd
    ship to a 1000-executor cluster: AQE on (runtime coalesce + skew-join
    splitting), Arrow on (the two pandas UDFs are Arrow-batched), bounded
    Arrow batch size so large ``html`` blobs don't blow executor memory
    (SURVEY.md §7 risk list).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N]: one JVM — match cores. On a real cluster this is set to
        # ~2-3x total executor cores via spark-submit conf instead.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html:binary rows can be large — cap Arrow batch row count so a
        # batch of raw pages stays well under executor memory at 100 TB.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
