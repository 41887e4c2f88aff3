"""Bucketed interval (range) join: points ⋈ intervals containing them.

A naive ``points.join(intervals, (t >= lo) & (t <= hi))`` has no equi
key, so Spark plans a BroadcastNestedLoopJoin (or a cartesian) — O(|P|·|I|)
work that is unrunnable at web scale. The scalable re-expression is
TIME BUCKETIZATION (the same trick Databricks' range-join hints and
GeoSpark's grid joins use): floor each point's time into a fixed-width
bucket, explode each interval into the buckets it overlaps, equi-join
on the bucket id, then refine with the exact range predicate. Work
becomes O(|P| + Σ interval_spans + matches) with ONE hash shuffle.

A (point, interval) pair can only meet in the point's own bucket, so
the output needs no dedup. Pick ``bucket_width`` near the typical
interval length: too small explodes long intervals into many buckets,
too large degrades the equi-join's selectivity toward all-pairs (both
are linear-factor costs, never correctness bugs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    by_cols: list[str] | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= time <= end`` (inclusive ends), optionally also equi-keyed
    on ``by_cols`` (columns present on BOTH sides, e.g. a user key —
    composing the bucket with a real key sharpens the shuffle further).
    ``time_col``/``start_col``/``end_col`` are integral scalars (epoch
    micros recommended); other columns must not collide across sides."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(int(bucket_width))
    p = points.withColumn("_bkt", F.floor(F.col(time_col) / w))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    out = p.join(i, ["_bkt", *(by_cols or [])]).filter(
        (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) <= F.col(end_col))
    )
    return out.drop("_bkt")
