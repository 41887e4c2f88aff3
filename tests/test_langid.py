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


def test_langid_script_routing():
    """Non-latin script routing: ko by hangul, ja by kana (even when
    kanji-heavy), zh stays zh on pure han, ru by cyrillic, ar by arabic —
    and a latin doc with a small foreign quote keeps its latin label."""
    samples = {
        "ko": "그리고 하지만 있는 것이 수 있다 없다 한다 그리고 저는",
        "ja": "日本語のテキストはかなと漢字をまぜて書きます",
        "zh": "的一是不了人我在有他这为之大来以个中上们到说国和",
        "ru": "и в не на что он она это как мы по но из за то все так",
        "ar": "في من على أن إلى عن مع هذا هذه التي الذي كان لا ما",
    }
    out = predict_lang_pandas(pd.Series(list(samples.values())))
    assert list(out["lang"]) == list(samples.keys())
    assert (out["lang_score"] > 0.3).all()
    # kana presence beats han mass: a mostly-kanji sentence with real kana
    # is Japanese, never Chinese
    mixed = "日本経済新聞の記事です"  # kanji-heavy, kana 'の'+'です'
    assert predict_lang_pandas(pd.Series([mixed]))["lang"][0] == "ja"
    # a latin doc quoting two russian words stays latin
    quoted = (
        "the cat is on the table and they are very happy about this "
        "because he said да нет and left the room with the dog"
    )
    assert predict_lang_pandas(pd.Series([quoted]))["lang"][0] == "en"
    # ...and a latin doc with a sprinkle of kana terms stays latin too
    # (the ja rule needs substantial CJK mass, not just kana presence)
    sprinkled = (
        "the new anime series they call すごい is on the table for review "
        "and this is what the critics have been saying about the show"
    )
    assert predict_lang_pandas(pd.Series([sprinkled]))["lang"][0] == "en"


def test_langid_batch_invariance():
    """Same text → same prediction regardless of batch neighbors."""
    t = "the cat is on the table with the dog"
    a = predict_lang_pandas(pd.Series([t]))
    b = predict_lang_pandas(pd.Series(["el perro grande", t, "der hund"]))
    assert a["lang"][0] == b["lang"][1]
    assert a["lang_score"][0] == b["lang_score"][1]
