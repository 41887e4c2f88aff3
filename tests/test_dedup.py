"""Dedup operators: exact, word-set, MinHash-LSH, SimHash."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xdan_dqa_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    minhash_candidate_pairs,
    minhash_dedup,
    simhash_dedup,
    wordset_dedup,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),   # exact dup of 1
    (3, "today the quick brown fox jumps over the lazy dog near the river bank"),   # rotation (near-dup)
    (4, "a completely different document about spark query engines and shuffles"),
    (5, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # 1-word change
    (6, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    kept = sorted(r[0] for r in exact_dedup(docs).select("doc_id").collect())
    assert kept == [1, 3, 4, 5, 6]  # 2 collapses into 1


def test_wordset_dedup(docs):
    kept = sorted(r[0] for r in wordset_dedup(docs).select("doc_id").collect())
    # 2 (exact) and 3 (reordering, same word multiset→set) collapse into 1
    assert kept == [1, 4, 5, 6]


def test_minhash_candidates_contain_near_dups(docs):
    pairs = {(r["a"], r["b"]) for r in minhash_candidate_pairs(docs).collect()}
    assert (1, 2) in pairs           # identical docs always collide
    assert (1, 3) in pairs or (1, 5) in pairs  # near-dups collide w.h.p.


def test_jaccard_verify_scores(docs):
    pairs = minhash_candidate_pairs(docs)
    verified = {(r["a"], r["b"]): r["jaccard"] for r in
                jaccard_verify(docs, pairs, threshold=0.5).collect()}
    assert verified.get((1, 2)) == 1.0
    for (a, b), j in verified.items():
        assert j >= 0.5


def test_minhash_dedup_drops_near_dups(docs):
    kept = sorted(r[0] for r in minhash_dedup(docs, threshold=0.5).select("doc_id").collect())
    assert 1 in kept and 4 in kept and 6 in kept
    assert 2 not in kept             # exact dup dropped
    assert len(kept) <= 4            # at least 3 and/or 5 also dropped


def test_simhash_dedup(docs):
    kept = sorted(r[0] for r in simhash_dedup(docs, max_hamming=3).select("doc_id").collect())
    assert 2 not in kept             # identical fingerprint
    assert 1 in kept and 4 in kept and 6 in kept


def test_minhash_scales_on_documents_table(spark):
    """Runs on the driver-provided documents table without blowup."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_candidate_pairs(docs, "text", "doc_id")
    n = pairs.count()
    total = docs.count()
    assert n < total * total / 4     # nowhere near all-pairs
