"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The flagship measurement is the BASELINE.json north metric — docs/sec of
the full keep-drop+scrub pipeline over a deterministic synthetic webtext
table (written to parquet first so the timing excludes generation).
Remaining entries time representative operators from SURVEY.md §2 on the
driver-provided sf tables. Execution is forced with the noop sink
(full compute, no output-disk artifact).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WEBTEXT_ROWS = int(os.environ.get("BENCH_WEBTEXT_ROWS", "40000"))
WEBTEXT_PARQUET = f"/tmp/bench_webtext_{WEBTEXT_ROWS}.parquet"


def force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from pyspark.sql import functions as F

    from xdan_dqa_spark.pipeline import score_webtext, salted_repartition, with_doc_id
    from xdan_dqa_spark.plans import entry_queries as eq
    from xdan_dqa_spark.session import get_spark
    from xdan_dqa_spark.synth import make_webtext

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    # Materialize the webtext input once (generation excluded from timing).
    if not os.path.exists(WEBTEXT_PARQUET):
        pdf = make_webtext(WEBTEXT_ROWS).drop(columns=["_kind"])
        from xdan_dqa_spark.schemas import WEBTEXT_SCHEMA

        spark.createDataFrame(pdf, schema=WEBTEXT_SCHEMA).repartition(
            CPUS * 2
        ).write.mode("overwrite").parquet(WEBTEXT_PARQUET)

    timings: dict[str, float] = {}

    def bench(name: str, thunk) -> None:
        t0 = time.time()
        thunk()
        timings[name] = round(time.time() - t0, 3)

    # ---- flagship: full pipeline over webtext (extract→score→scrub) ----
    webtext = spark.read.parquet(WEBTEXT_PARQUET)
    # warmup: JVM + python workers + parquet footer caches
    force(score_webtext(salted_repartition(with_doc_id(webtext), CPUS * 2)).limit(2000))

    bench(
        "pipeline_webtext",
        lambda: force(score_webtext(salted_repartition(with_doc_id(webtext), CPUS * 2))),
    )
    docs_per_sec = round(WEBTEXT_ROWS / timings["pipeline_webtext"], 1)

    # ---- representative operators on the sf tables ----
    ops = [
        "p4_weighted_score",
        "f1_keep_filter",
        "a1_batch_metrics",
        "a5_lineitem_summary",
        "j1_anti_join_resume",
        "j2_last_wins_dedup",
        "dedup_exact",
        "dedup_wordset",
        "dedup_minhash_pairs",
        "dedup_simhash",
        "lang_id_heuristic",
        "p7_scrub",
        "token_count",
        "knn_bruteforce",
        "embedding_neardup",
        "pipeline_score_documents",
    ]
    for name in ops:
        fn = eq.QUERIES[name]
        bench(name, lambda fn=fn: force(fn(spark, SF_DIR)))

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "keep-drop+scrub docs/sec + operator suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "webtext_rows": WEBTEXT_ROWS,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
