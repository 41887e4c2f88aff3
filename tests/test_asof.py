"""As-of join vs hand-computed matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from xdan_dqa_spark.operators.asof import asof_join


def _frames(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, "lid long, k long, t long")
    right = spark.createDataFrame(rrows, "k long, t long, rid long, v double")
    return left, right


def _run(left, right):
    out = asof_join(left, right, key_col="k", time_col="t",
                    value_cols=["rid", "v"], tie_col="rid")
    return {r["lid"]: (r["rid"], r["v"]) for r in out.collect()}


def test_asof_basic_and_inclusive(spark):
    left, right = _frames(
        spark,
        [(1, 1, 5), (2, 1, 10), (3, 1, 4), (4, 2, 100)],
        [(1, 5, 50, 1.5), (1, 8, 51, 2.5), (2, 200, 52, 3.5)],
    )
    got = _run(left, right)
    assert got[1] == (50, 1.5)        # equal timestamp matches (<=)
    assert got[2] == (51, 2.5)        # latest prior, not first
    assert got[3] == (None, None)     # nothing at or before t=4
    assert got[4] == (None, None)     # right exists only later


def test_asof_tie_break_and_null_shadowing(spark):
    left, right = _frames(
        spark,
        [(1, 1, 10), (2, 1, 30)],
        # two right rows at the same (k, t): highest rid wins
        [(1, 10, 7, 1.0), (1, 10, 9, 2.0),
         # later right row with NULL value must SHADOW the older one
         (1, 20, 11, None)],
    )
    got = _run(left, right)
    assert got[1] == (9, 2.0)
    assert got[2] == (11, None)


def test_asof_partitioning_invariant(spark):
    left, right = _frames(
        spark,
        [(i, i % 7, i * 3) for i in range(200)],
        [(k, t, 1000 + k * 50 + t, float(t)) for k in range(7) for t in range(0, 600, 50)],
    )
    a = sorted(_run(left, right).items())
    b = sorted(_run(left.repartition(13), right.repartition(5)).items())
    assert a == b
