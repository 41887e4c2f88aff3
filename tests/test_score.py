"""Scoring operator properties: normalization clamp, weighted-sum bounds,
threshold monotonicity, per-kind discrimination (SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xdan_dqa_spark.operators.score import QualityConfig, normalize_score
from xdan_dqa_spark.pipeline import score_webtext


def test_normalize_clamps_high_only(spark):
    df = spark.createDataFrame([(12.0,), (9.9,), (-1.0,), (0.0,)], "x double")
    got = [r[0] for r in df.select(normalize_score(F.col("x"))).collect()]
    assert got == [10.0, 9.9, -1.0, 0.0]  # reference keeps ≤0 as-is (src/processor.py:302-311)


def test_score_bounds(scored):
    row = scored.agg(F.min("score"), F.max("score")).collect()[0]
    assert row[0] >= 0.0 and row[1] <= 10.0


def test_threshold_monotonicity(spark, webtext):
    """Raising min_score can only shrink the keep set."""
    k6 = score_webtext(webtext, QualityConfig(min_score=6.0)).filter("keep")
    k8 = score_webtext(webtext, QualityConfig(min_score=8.0)).filter("keep")
    urls6 = {r[0] for r in k6.select("url").collect()}
    urls8 = {r[0] for r in k8.select("url").collect()}
    assert urls8 <= urls6


def test_kind_discrimination(spark):
    """The rule stack separates the synthetic row kinds as designed."""
    from xdan_dqa_spark.synth import webtext_df

    df = webtext_df(spark, 800, with_kind=True)
    rates = {
        r["_kind"]: r["kr"]
        for r in score_webtext(df)
        .groupBy("_kind")
        .agg(F.avg(F.col("keep").cast("double")).alias("kr"))
        .collect()
    }
    assert rates["clean"] >= 0.98
    for bad in ["duplines", "stuffing", "symbols", "wronglang", "short"]:
        assert rates[bad] <= 0.02, f"{bad} keep rate {rates[bad]}"
    assert rates["pii"] >= 0.5  # pii rows are kept (then scrubbed), minus zh-tag mismatches


def test_allowed_langs_filter(spark, webtext):
    only_en = score_webtext(webtext, QualityConfig(allowed_langs=("en",)))
    kept = only_en.filter("keep").select("pred_lang").distinct().collect()
    assert {r[0] for r in kept} <= {"en"}
