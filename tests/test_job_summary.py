"""End-of-run stats table (reference ``src/cli.py:119-139``): the
summarize_run fold over lineage rows, the printed table shape, and the
spark-submit job end-to-end through a real subprocess."""

from __future__ import annotations

import os
import re
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_summarize_run_fields(spark, webtext):
    from xdan_dqa_spark.operators.metrics import (
        format_summary_table,
        partition_metrics,
        summarize_run,
    )
    from xdan_dqa_spark.pipeline import score_webtext, with_doc_id

    scored = score_webtext(with_doc_id(webtext))
    pm = partition_metrics(scored, "run-x").cache()
    s = summarize_run(pm, "run-x", wall_sec=2.0)
    assert s["total_items"] == 800
    assert s["total_items"] == s["successfully_processed"] + s["filtered_items"]
    assert 0.0 < s["success_rate_pct"] < 100.0
    assert s["items_per_second"] == 400.0
    assert s["failed_items"] == 0  # deterministic stack: no error lane rows
    # an unknown run_id folds to zeros, not a crash
    z = summarize_run(pm, "no-such-run", wall_sec=1.0)
    assert z["total_items"] == 0 and z["success_rate_pct"] == 0.0
    table = format_summary_table(s)
    for label in ("Total Items", "Successfully Processed", "Failed Items",
                  "Filtered Items", "Success Rate", "Processing Time",
                  "Items per Second"):
        assert label in table
    pm.unpersist()


def test_job_subprocess_end_to_end(tmp_path):
    """spark-submit lifecycle in a clean process: synth input → scored +
    metrics parquet + stats table + RESULT line."""
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "quality_filter_job.py"),
         "--input", "synth:300", "--output", str(tmp_path / "out"),
         "--run-id", "it-1", "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Processing Results — it-1" in out.stdout
    m = re.search(r"Total Items\s+(\d+)", out.stdout)
    assert m and int(m.group(1)) == 300
    m = re.search(r"RESULT run_id=it-1 committed_docs=(\d+) keep_rate=([0-9.]+)",
                  out.stdout)
    assert m and int(m.group(1)) == 300
    assert (tmp_path / "out" / "scored").exists()
    assert (tmp_path / "out" / "metrics").exists()


def test_rerun_same_run_id_summary_counts_only_this_invocation(tmp_path):
    """A --resume rerun that reuses the run_id must print THIS
    invocation's stats (0 newly scored docs), not the accumulated
    metrics rows of every invocation sharing the run_id — the summary
    folds the in-memory lineage frame, not the appended parquet."""
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    args = [sys.executable, os.path.join(REPO, "jobs", "quality_filter_job.py"),
            "--input", "synth:200", "--output", str(tmp_path / "out"),
            "--run-id", "rr-1", "--master", "local[4]"]
    first = subprocess.run(args, capture_output=True, text=True,
                           timeout=600, env=env, cwd=REPO)
    assert first.returncode == 0, first.stderr[-2000:]
    m = re.search(r"Total Items\s+(\d+)", first.stdout)
    assert m and int(m.group(1)) == 200
    rerun = subprocess.run(args + ["--resume"], capture_output=True,
                           text=True, timeout=600, env=env, cwd=REPO)
    assert rerun.returncode == 0, rerun.stderr[-2000:]
    m = re.search(r"Total Items\s+(\d+)", rerun.stdout)
    assert m and int(m.group(1)) == 0
    # cumulative view unchanged: still 200 committed docs, no duplicates
    m = re.search(r"RESULT run_id=rr-1 committed_docs=(\d+)", rerun.stdout)
    assert m and int(m.group(1)) == 200


def test_resume_missing_bucketed_table_fails(tmp_path):
    """--resume --bucketed-table with no committed table must ERROR (wrong
    metastore / mistyped table ⇒ silent full re-append), unless the user
    explicitly claims a fresh run."""
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4",
           "XDAN_DQA_WAREHOUSE": str(tmp_path / "wh")}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "quality_filter_job.py"),
         "--input", "synth:50", "--output", str(tmp_path / "out"),
         "--resume", "--bucketed-table", "no_such_scored_tbl",
         "--master", "local[2]"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode != 0
    assert "does not exist in the metastore" in (out.stderr + out.stdout)


def test_fd_violations_census(spark):
    from xdan_dqa_spark.operators.metrics import fd_violations

    df = spark.createDataFrame(
        [("u1", "en"), ("u1", "en"), ("u1", "fr"),   # violates: 2 langs
         ("u2", "en"), ("u2", "en"),                  # clean
         ("u3", "de")],                               # clean singleton
        "url string, lang string",
    )
    got = fd_violations(df, "url", "lang").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["url"], r["n_rows"], r["n_distinct_rhs"]) == ("u1", 3, 2)


def test_dedup_job_subprocess_end_to_end(tmp_path):
    """jobs/dedup_job.py lifecycle in a clean process: synth corpus
    (20% exact + 10% near dups) → survivors + report parquet + RESULT
    line. Exact method must drop exactly the byte-identical copies
    (survivors distinct by text); the report's accounting must add up."""
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"),
         "--input", "synth:400", "--output", str(tmp_path / "dd"),
         "--method", "exact", "--run-id", "dd-1", "--master", "local[4]"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"RESULT run_id=dd-1 method=exact n_input=(\d+) "
                  r"n_kept=(\d+)", out.stdout)
    assert m and int(m.group(1)) == 400
    n_kept = int(m.group(2))
    assert 0 < n_kept < 400

    import duckdb

    dd = str(tmp_path / "dd")
    n_rows, n_texts = duckdb.sql(
        f"SELECT count(*), count(DISTINCT text) FROM '{dd}/deduped/*.parquet'"
    ).fetchone()
    assert n_rows == n_kept == n_texts          # survivors text-distinct
    rep = duckdb.sql(
        f"SELECT n_input, n_kept, n_dropped FROM '{dd}/report/*.parquet'"
    ).fetchone()
    assert rep == (400, n_kept, 400 - n_kept)
