"""Per-partition lineage + batch metrics (A1/A5 + §2.6).

Re-expresses the reference's batch metrics (``calculate_batch_metrics``
``src/processor.py:404-421``: average/min/max score, success rate) and its
run-summary stats (``src/cli.py:119-139``) as ONE aggregation over the
scored DataFrame, grouped by physical partition id — each Spark partition
is the analogue of a reference "batch", so lineage is per-unit-of-work
and a resumed run can prove which partitions committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(scored: DataFrame, run_id: str) -> DataFrame:
    """One lineage row per physical partition of the scored output."""
    return (
        scored.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum((~F.col("keep")).cast("long")).alias("n_drop"),
            F.sum(F.when(F.col("score").isNull(), 1).otherwise(0)).alias("n_error"),
            F.sum(F.col("scrub_count").cast("long")).alias("scrub_count"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.avg("score").alias("avg_score"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
        .select(
            "run_id", "part_id", "n_docs", "n_keep", "n_drop", "n_error",
            "scrub_count", "min_score", "max_score", "avg_score", "committed_at",
        )
    )


def batch_metrics(scored: DataFrame) -> DataFrame:
    """Whole-run metrics row (reference src/processor.py:404-421 shape)."""
    return scored.agg(
        F.count("*").alias("total_items"),
        F.avg("score").alias("average_score"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
        F.avg(F.col("keep").cast("double")).alias("success_rate"),
        F.sum(F.col("scrub_count").cast("long")).alias("scrub_count"),
    )
