"""Resume semantics: a partially-committed run continues without
re-scoring, and the resumed result equals the single-run output
(FIXTURES.md §6; reference checkpoint behavior src/data_transformer.py:320-341)."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from xdan_dqa_spark.operators.resume import committed_ids, last_wins_dedup, resume_filter
from xdan_dqa_spark.pipeline import score_webtext, with_doc_id


def test_resume_no_rescore_and_identical_final(spark, webtext, tmp_path):
    out = str(tmp_path / "scored")
    inp = with_doc_id(webtext)

    # Partial run: commit roughly half the ids (simulates a killed job that
    # committed some partitions).
    part1 = inp.filter(F.pmod(F.col("doc_id"), 2) == 0)
    score_webtext(part1).write.mode("append").parquet(out)
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < webtext.count()

    # Resumed run: anti-join against committed snapshot.
    committed = committed_ids(spark, out)
    remainder = resume_filter(inp, committed)
    # zero overlap → nothing is re-scored
    assert remainder.join(committed, "doc_id", "left_semi").count() == 0
    score_webtext(remainder).write.mode("append").parquet(out)

    # Final table == single-run output, row for row.
    resumed = (
        spark.read.parquet(out)
        .select("url", "keep", "score", "scrubbed_text")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    single = (
        score_webtext(inp)
        .select("url", "keep", "score", "scrubbed_text")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(resumed, single)


def test_committed_ids_missing_path(spark, tmp_path):
    assert committed_ids(spark, str(tmp_path / "nope")) is None


def test_last_wins_dedup(spark):
    df = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", "old"), (1, "2025-01-02 00:00:00", "new"),
         (2, "2025-01-01 00:00:00", "only")],
        "doc_id long, warc_ts string, v string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    got = {r["doc_id"]: r["v"] for r in last_wins_dedup(df).collect()}
    assert got == {1: "new", 2: "only"}


def test_bucketed_resume_no_exchange_on_committed_side(spark, webtext, tmp_path):
    """write_scored_bucketed stores the doc_id shuffle once: the resume
    anti-join's committed side is a bucketed scan with NO Exchange in the
    plan (forced to sort-merge so a broadcast can't mask the proof),
    while the same join against plain parquet shuffles BOTH sides. The
    resumed remainder is identical either way."""
    from xdan_dqa_spark.operators.resume import committed_ids_table
    from xdan_dqa_spark.pipeline import score_webtext, with_doc_id
    from xdan_dqa_spark.sources.sinks import write_scored_bucketed

    inp = with_doc_id(webtext.limit(400))
    scored = score_webtext(inp.limit(250))
    table = "scored_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # DROP only covers tables the CURRENT catalog knows; an interrupted
    # earlier run can leave the managed location on disk, which
    # saveAsTable refuses to reuse (LOCATION_ALREADY_EXISTS).
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, table), ignore_errors=True)
    write_scored_bucketed(scored, table, n_buckets=8)
    plain = str(tmp_path / "plain")
    scored.write.parquet(plain)

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum("Exchange hashpartitioning" in ln for ln in plan.split("\n"))

    committed = committed_ids_table(spark, table)
    assert committed is not None
    bucketed_join = inp.join(committed.hint("merge"), "doc_id", "left_anti")
    plain_join = inp.join(
        spark.read.parquet(plain).select("doc_id").hint("merge"),
        "doc_id", "left_anti",
    )
    assert n_exchanges(bucketed_join) == 1   # input side only
    assert n_exchanges(plain_join) == 2      # both sides shuffle
    a = sorted(r[0] for r in bucketed_join.select("doc_id").collect())
    b = sorted(r[0] for r in plain_join.select("doc_id").collect())
    assert a == b and len(a) > 0
    spark.sql(f"DROP TABLE IF EXISTS {table}")
