"""spark-submit entrypoint: score → keep/drop → scrub → write + metrics.

The Spark-native equivalent of the reference's ``scripts/run_assessment.py``
/ ``src/cli.py process_dataset`` lifecycle (SURVEY.md §3): one lazy
DataFrame chain, idempotent parquet appends, id-anti-join resume.

Usage:
    spark-submit --py-files xdan_dqa_spark.zip jobs/quality_filter_job.py \
        --input synth:2000 --output /tmp/out --min-score 6.0 [--resume]

``--input`` is a parquet path of webtext shape (url, warc_ts, html, text,
lang), or ``synth:N`` to generate the deterministic N-row fixture table.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="webtext parquet path, or synth:N for the fixture table")
    p.add_argument("--output", required=True, help="output root dir")
    p.add_argument("--run-id", default="run-001")
    p.add_argument("--min-score", type=float, default=6.0)
    p.add_argument("--langs", default="", help="comma list of allowed langs (empty=all)")
    p.add_argument("--resume", action="store_true",
                   help="anti-join against committed output; score only new ids")
    p.add_argument("--partitions", type=int, default=0,
                   help="salted repartition width (0 = leave input partitioning)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from xdan_dqa_spark.session import get_spark
    from xdan_dqa_spark.pipeline import score_webtext, salted_repartition
    from xdan_dqa_spark.operators.score import QualityConfig
    from xdan_dqa_spark.operators.metrics import partition_metrics
    from xdan_dqa_spark.operators.resume import committed_ids, resume_filter
    from xdan_dqa_spark.pipeline import with_doc_id

    spark = get_spark("quality_filter_job", master=args.master)
    t0 = time.time()

    if args.input.startswith("synth:"):
        from xdan_dqa_spark.synth import webtext_df

        df = webtext_df(spark, int(args.input.split(":", 1)[1]))
    else:
        df = spark.read.parquet(args.input)

    if args.partitions:
        df = salted_repartition(df, args.partitions)

    out_scored = f"{args.output}/scored"
    out_metrics = f"{args.output}/metrics"

    df = with_doc_id(df)
    if args.resume:
        committed = committed_ids(spark, out_scored)
        df = resume_filter(df, committed)

    cfg = QualityConfig(
        min_score=args.min_score,
        allowed_langs=tuple(x for x in args.langs.split(",") if x),
    )
    scored = score_webtext(df, cfg)

    scored.write.mode("append").parquet(out_scored)
    # Lineage from the same deterministic plan (pure UDFs + pure exprs →
    # re-evaluation yields identical rows to what was just committed).
    pm = partition_metrics(scored, args.run_id)
    pm.write.mode("append").parquet(out_metrics)

    from pyspark.sql import functions as F

    stats = (
        spark.read.parquet(out_scored)
        .agg(
            F.count("doc_id").alias("n"),
            F.avg(F.col("keep").cast("double")).alias("keep_rate"),
        )
        .collect()[0]
    )
    wall = time.time() - t0
    print(
        f"RESULT run_id={args.run_id} committed_docs={stats['n']} "
        f"keep_rate={stats['keep_rate']:.4f} wall_sec={wall:.2f} "
        f"docs_per_sec={(stats['n'] / wall):.1f}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
