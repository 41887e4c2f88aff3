"""8-way DataCategory classifier: hand-computed labels, tie-breaks,
fallback, and pipeline wiring (SURVEY.md §5 test strategy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xdan_dqa_spark.functions.category import (
    CATEGORY_MARKERS,
    CATEGORY_PRIORITY,
    DEFAULT_CATEGORY,
    category_expr,
)


def _label(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(category_expr(F.col("text")).alias("c")).collect()[0]["c"]


def test_clear_winners(spark):
    assert _label(spark, "def foo import os return x") == "CODE_GENERATION"
    assert _label(spark, "therefore the proof holds hence thus") == "REASONING"
    assert _label(spark, "step one then follow install the tool") == "INSTRUCTION_FOLLOWING"
    assert _label(spark, "summary of the analysis and conclusion") == "ANALYSIS_SUMMARY"
    assert _label(spark, "once upon a time a story of a novel") == "CREATIVE_WRITING"
    assert _label(spark, "hello thanks please call me") == "CONVERSATION"
    assert _label(spark, "the image shows a video frame photo") == "MULTIMODAL_UNDERSTANDING"
    assert _label(spark, "what is the answer to the question") == "KNOWLEDGE_QA"


def test_fallback_and_empty(spark):
    assert _label(spark, "zzz qqq unrelated-words") == DEFAULT_CATEGORY
    assert _label(spark, "") == DEFAULT_CATEGORY
    assert _label(spark, None) == DEFAULT_CATEGORY


def test_tie_break_priority(spark):
    # one CODE marker vs one KNOWLEDGE marker: CODE wins (earlier priority)
    assert _label(spark, "def what") == "CODE_GENERATION"
    # REASONING beats CONVERSATION on a 1-1 tie
    assert _label(spark, "because you") == "REASONING"


def test_case_insensitive_and_counting(spark):
    # 2 CONVERSATION hits vs 1 CODE hit
    assert _label(spark, "Hello THANKS def") == "CONVERSATION"
    # every token occurrence counts (exact token-equality semantics)
    assert _label(spark, "you a you a you def import") == "CONVERSATION"
    assert _label(spark, "you you you def import") == "CONVERSATION"


def test_every_category_reachable_and_enum_closed(spark):
    # each lexicon's own markers classify to that category
    for cat, markers in CATEGORY_MARKERS.items():
        text = " ".join(markers[:3]) + " " + " ".join(markers[:3])
        assert _label(spark, text) == cat, cat
    assert set(CATEGORY_MARKERS) == set(CATEGORY_PRIORITY)
    assert len(CATEGORY_PRIORITY) == 8


def test_pipeline_carries_category_and_token_info(scored):
    cols = scored.columns
    assert "category" in cols and "token_info" in cols
    row = scored.select("category", "token_info").first()
    assert row["category"] in CATEGORY_PRIORITY
    ti = row["token_info"]
    assert ti["total_tokens"] == ti["input_tokens"] + ti["output_tokens"]
    assert ti["currency"] == "CNY"
    assert ti["estimated_cost"] >= 0.0


def test_allowed_categories_filter(spark, webtext):
    from xdan_dqa_spark.operators.score import QualityConfig
    from xdan_dqa_spark.pipeline import score_webtext

    cfg = QualityConfig(allowed_categories=("CODE_GENERATION",))
    scored = score_webtext(webtext, cfg)
    bad = scored.filter(F.col("keep") & (F.col("category") != "CODE_GENERATION"))
    assert bad.count() == 0
