"""Golden end-to-end fixtures: F1 ≥ 0.99 on keep/drop + byte-identical
extracted/scrubbed text per url (BASELINE.json decision/text fidelity)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from .conftest import FIXTURES_DIR

GOLDEN = os.path.join(FIXTURES_DIR, "golden_labels.parquet")


@pytest.fixture(scope="module")
def golden() -> pd.DataFrame:
    if not os.path.exists(GOLDEN):
        pytest.skip("goldens not frozen yet — run scripts/freeze_goldens.py")
    return pd.read_parquet(GOLDEN).set_index("url")


@pytest.fixture(scope="module")
def fresh(scored) -> pd.DataFrame:
    return (
        scored.select(
            "url", "keep", "pred_lang", "score",
            "extracted_text", "scrubbed_text", "scrub_count",
        )
        .toPandas()
        .set_index("url")
    )


def test_row_coverage(golden, fresh):
    assert set(fresh.index) == set(golden.index)


def test_keep_f1(golden, fresh):
    g = golden["keep"].reindex(fresh.index)
    p = fresh["keep"]
    tp = int((g & p).sum())
    fp = int((~g & p).sum())
    fn = int((g & ~p).sum())
    f1 = 2 * tp / (2 * tp + fp + fn) if tp else 0.0
    assert f1 >= 0.99, f"keep/drop F1 {f1:.4f} (tp={tp} fp={fp} fn={fn})"


def test_scores_exact(golden, fresh):
    joined = golden.join(fresh, lsuffix="_g")
    mismatch = joined[joined["score_g"] != joined["score"]]
    assert len(mismatch) == 0, mismatch.head()


def test_pred_lang_exact(golden, fresh):
    joined = golden.join(fresh, lsuffix="_g")
    bad = joined[joined["pred_lang_g"] != joined["pred_lang"]]
    assert len(bad) == 0, bad.head()


def test_extracted_text_byte_identical(golden, fresh):
    joined = golden.join(fresh, lsuffix="_g")
    bad = joined[joined["extracted_text_g"] != joined["extracted_text"]]
    assert len(bad) == 0, bad.index[:5].tolist()


def test_scrubbed_text_byte_identical(golden, fresh):
    joined = golden.join(fresh, lsuffix="_g")
    bad = joined[joined["scrubbed_text_g"] != joined["scrubbed_text"]]
    assert len(bad) == 0, bad.index[:5].tolist()
    bad_c = joined[joined["scrub_count_g"] != joined["scrub_count"]]
    assert len(bad_c) == 0


def test_partitioning_invariance(spark, webtext):
    """Same keep decisions under a different partitioning — catches
    partition-boundary bugs in the UDF batching."""
    from xdan_dqa_spark.pipeline import score_webtext

    a = score_webtext(webtext).select("url", "keep", "score").toPandas().set_index("url").sort_index()
    b = (
        score_webtext(webtext.repartition(13))
        .select("url", "keep", "score")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    pd.testing.assert_frame_equal(a, b)


def test_uid64_md5_matches_python(spark):
    import hashlib

    from xdan_dqa_spark.pipeline import uid64_md5

    df = spark.createDataFrame(
        [("web", 7), ("web", -3), ("news", 7)], "source string, doc_id long"
    )
    got = {(r["source"], r["doc_id"]): r["uid"]
           for r in df.select("source", "doc_id",
                              uid64_md5("source", "doc_id").alias("uid")).collect()}
    for (src, did), uid in got.items():
        want = int(hashlib.md5(f"{src}:{did}".encode()).hexdigest()[:15], 16)
        assert uid == want
    assert len(set(got.values())) == 3
