"""Language-ID UDF: accuracy on ground-truth fixture rows + determinism."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from xdan_dqa_spark.functions.langid import predict_lang_pandas


def test_langid_accuracy_on_clean_docs(spark):
    from xdan_dqa_spark.synth import webtext_df
    from xdan_dqa_spark.functions.langid import langid_udf

    df = webtext_df(spark, 800, with_kind=True).filter(F.col("_kind") == "clean")
    got = df.select(
        (langid_udf(F.col("text"))["lang"] == F.col("lang")).cast("double").alias("ok")
    ).agg(F.avg("ok")).collect()[0][0]
    assert got >= 0.98, f"clean-doc langid accuracy {got}"


def test_langid_known_samples():
    samples = {
        "en": "the cat is on the table and they are very happy about this",
        "es": "el perro está en la casa que fue de sus padres porque sí",
        "fr": "le chat est dans la maison avec je ne sais pas quoi de plus",
        "de": "der hund ist in dem haus und das ist nicht sehr schön für sich",
        "zh": "的一是不了人我在有他这为之大来以个中上们",
    }
    out = predict_lang_pandas(pd.Series(list(samples.values())))
    assert list(out["lang"]) == list(samples.keys())
    assert (out["lang_score"] > 0.3).all()


def test_langid_empty_and_noise():
    out = predict_lang_pandas(pd.Series(["", "12345 67890", "@@@@"]))
    assert list(out["lang"]) == ["und", "und", "und"]
    assert (out["lang_score"] == 0.0).all()


def test_langid_batch_invariance():
    """Same text → same prediction regardless of batch neighbors."""
    t = "the cat is on the table with the dog"
    a = predict_lang_pandas(pd.Series([t]))
    b = predict_lang_pandas(pd.Series(["el perro grande", t, "der hund"]))
    assert a["lang"][0] == b["lang"][1]
    assert a["lang_score"][0] == b["lang_score"][1]
