"""Gap-based sessionization vs hand-computed sessions."""

from __future__ import annotations

import datetime as dt

from xdan_dqa_spark.operators.sessions import sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, "view", 1.0)
         for i, (u, s) in enumerate(rows)],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double",
    )


def test_sessionize_hand_computed(spark):
    # user 1: events at 0s, 100s, 2000s (gap>1800 → new session), 2100s
    # user 2: single event
    df = _events(spark, [(1, 0), (1, 100), (1, 2000), (1, 2100), (2, 50)])
    got = {(r["user_id"], r["session_seq"]): (r["n_events"], r["duration_sec"])
           for r in sessionize(df, gap_sec=1800).collect()}
    assert got == {
        (1, 1): (2, 100.0),
        (1, 2): (2, 100.0),
        (2, 1): (1, 0.0),
    }


def test_sessionize_boundary_gap_not_new(spark):
    # exactly gap_sec apart → SAME session (strict > breaks)
    df = _events(spark, [(1, 0), (1, 1800)])
    rows = sessionize(df, gap_sec=1800).collect()
    assert len(rows) == 1 and rows[0]["n_events"] == 2


def test_sessionize_partitioning_invariant_and_cap(spark):
    df = _events(spark, [(u, s * 60) for u in range(5) for s in range(40)])
    a = sorted(map(tuple, sessionize(df).collect()))
    b = sorted(map(tuple, sessionize(df.repartition(11)).collect()))
    assert a == b
    capped = sessionize(df, max_events_per_user=10)
    assert capped.agg({"n_events": "sum"}).collect()[0][0] == 5 * 10
