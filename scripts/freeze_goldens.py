"""Freeze golden labels for the webtext pipeline (FIXTURES.md §2).

Runs the PINNED rule stack over the deterministic seed-42 webtext table
and commits the expected outputs. Golden labels exist to catch
regressions, threshold drift, and partition-boundary bugs — they are the
"reference labels" of BASELINE.json (the reference repo has no webtext
labels of its own; its scoring is a remote LLM over Alpaca data — see
SURVEY.md §7 risks).

Re-run ONLY when the scoring contract intentionally changes:
    python scripts/freeze_goldens.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_ROWS = 800
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "golden_labels.parquet")


def main() -> None:
    from xdan_dqa_spark.session import get_spark
    from xdan_dqa_spark.synth import webtext_df
    from xdan_dqa_spark.pipeline import score_webtext

    spark = get_spark("freeze_goldens", master="local[4]")
    scored = score_webtext(webtext_df(spark, GOLDEN_ROWS))
    pdf = (
        scored.select(
            "url", "keep", "pred_lang", "score",
            "extracted_text", "scrubbed_text", "scrub_count",
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pdf.to_parquet(GOLDEN_PATH, index=False)
    print(f"froze {len(pdf)} golden rows → {GOLDEN_PATH}")
    print(pdf["keep"].value_counts())
    spark.stop()


if __name__ == "__main__":
    main()
