"""Bucketed interval join vs brute-force matches."""

from __future__ import annotations

import pytest

from xdan_dqa_spark.operators.rangejoin import interval_join


def _run(spark, points, intervals, width, by=None):
    p = spark.createDataFrame(points, "pid long, k long, t long")
    i = spark.createDataFrame(intervals, "iid long, k long, lo long, hi long")
    out = interval_join(p, i, time_col="t", start_col="lo", end_col="hi",
                        bucket_width=width, by_cols=by)
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def _brute(points, intervals, keyed):
    return sorted(
        (pid, iid)
        for pid, pk, t in points
        for iid, ik, lo, hi in intervals
        if lo <= t <= hi and (pk == ik or not keyed)
    )


def test_interval_join_matches_bruteforce_all_widths(spark):
    points = [(i, i % 3, i * 7) for i in range(60)]
    # intervals spanning 0, 1, and many buckets, incl. inclusive ends
    intervals = [(0, 0, 10, 10), (1, 1, 5, 30), (2, 2, 0, 400),
                 (3, 0, 350, 420), (4, 1, 100, 101)]
    want = _brute(points, intervals, keyed=True)
    assert want  # fixture sanity: joins are non-trivial
    for width in (1, 7, 64, 1000):
        got = _run(spark, points, intervals, width, by=["k"])
        assert got == want, f"width={width}"
        assert len(got) == len(set(got))  # no per-bucket duplicates


def test_interval_join_unkeyed_and_validation(spark):
    points = [(1, 0, 50)]
    intervals = [(9, 99, 0, 100)]  # different k — matches only unkeyed
    assert _run(spark, points, intervals, 32) == [(1, 9)]
    assert _run(spark, points, intervals, 32, by=["k"]) == []
    with pytest.raises(ValueError):
        _run(spark, points, intervals, 0)
