"""StructuredPromptItem envelope + multi-generation fan-out
(reference src/models.py:222-257, distillable/pipeline.py:33-37)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xdan_dqa_spark.operators.cot import (
    ANALYZE_BODY,
    SOLVE_BODY,
    VERIFY_BODY,
    fan_out_generations,
    to_structured_prompt,
)


def test_envelope_shape_and_context_concat(spark):
    df = spark.createDataFrame(
        [(1, "explain X", "some context", "the answer"),
         (2, "explain Y", "", "another answer"),
         (3, "explain Z", None, "third answer")],
        "doc_id long, instr string, ctx string, out string",
    )
    shaped = to_structured_prompt(
        df, instruction=F.col("instr"), input_=F.col("ctx"), output=F.col("out")
    )
    rows = {r["doc_id"]: r for r in shaped.collect()}
    # question = instruction + "\nContext: " + input only when input non-empty
    assert rows[1]["question"] == "explain X\nContext: some context"
    assert rows[2]["question"] == "explain Y"
    assert rows[3]["question"] == "explain Z"
    c = rows[1]["components"]
    assert (c["analyze"], c["solve"], c["verify"]) == (
        ANALYZE_BODY, SOLVE_BODY, VERIFY_BODY)
    assert c["solution"] == "the answer"
    m = rows[1]["cot_metadata"]
    assert m["original_format"] == "webtext"
    assert m["original_instruction"] == "explain X"
    assert m["original_output"] == "the answer"


def test_fan_out_rows_and_seeds(spark):
    df = spark.createDataFrame([(10,), (11,)], "doc_id long")
    out = fan_out_generations(df, n_generations=4).collect()
    assert len(out) == 8
    seeds = sorted(r["gen_seed"] for r in out)
    # pmod(id, 2^60)·n + idx; small positive ids fold to themselves
    assert seeds == [40, 41, 42, 43, 44, 45, 46, 47]
    assert sorted({r["gen_idx"] for r in out}) == [0, 1, 2, 3]


def test_fan_out_xxhash64_scale_ids(spark):
    """Documented composition: fan-out AFTER with_doc_id, whose xxhash64
    ids span the full signed-64 range. A raw id×n multiply overflows —
    and under Spark's default ANSI mode aborts the job — so the seed must
    be derived overflow-safely (ADVICE r3)."""
    from xdan_dqa_spark.operators.cot import GEN_SEED_BOUND
    from xdan_dqa_spark.pipeline import with_doc_id

    df = spark.createDataFrame(
        [("https://a.example/x",), ("https://b.example/y",)], "url string"
    )
    out = fan_out_generations(with_doc_id(df), n_generations=4).collect()
    assert len(out) == 8
    ids = {r["doc_id"] for r in out}
    # the fixture really does exercise full-range (negative) hash ids
    assert any(i < 0 for i in ids) or any(i > GEN_SEED_BOUND for i in ids)
    seeds = [r["gen_seed"] for r in out]
    assert len(set(seeds)) == 8                      # distinct per (doc, gen)
    assert all(0 <= s < GEN_SEED_BOUND * 4 + 4 for s in seeds)


def test_enhanced_analysis_structs(spark):
    """EnhancedStructuredPromptItem (reference src/models.py:258-339):
    typed analysis structs, threshold suggestions, scrubbed improved
    answer, and the f-string-shaped analyze component."""
    from xdan_dqa_spark.operators.cot import to_enhanced_structured_prompt

    df = spark.createDataFrame(
        [
            # short question -> "add context"; short answer -> "expand";
            # PII in answer -> scrub suggestion + scrubbed improved_answer
            ("Sum?", "Contact me at bob@example.com for the answer."),
            # long clean pair -> no suggestions, quality saturates
            ("Explain " + "in detail " * 60, "line\n" * 60 + "w " * 400),
        ],
        "instr string, out string",
    )
    rows = to_enhanced_structured_prompt(
        df, instruction=F.col("instr"), output=F.col("out")
    ).collect()

    by_q = {r["question_analysis"]["original_question"][:4]: r for r in rows}
    short, long_ = by_q["Sum?"], by_q["Expl"]
    qa, aa = short["question_analysis"], short["answer_analysis"]
    assert qa["original_question"] == "Sum?"
    assert "add context to the question" in qa["improvement_suggestions"]
    assert "expand the answer with supporting detail" in aa["improvement_suggestions"]
    assert "remove sensitive or flagged content" in aa["improvement_suggestions"]
    assert "bob@example.com" not in aa["improved_answer"]       # scrubbed
    assert short["components"]["solution"] == aa["improved_answer"]
    assert short["components"]["analyze"].startswith("Question analysis:")

    lqa, laa = long_["question_analysis"], long_["answer_analysis"]
    assert lqa["improvement_suggestions"] == [] or (
        lqa["improvement_suggestions"] == ["tighten the question"])
    assert laa["improvement_suggestions"] == []
    assert laa["answer_quality"]["completeness"] == 10.0
    assert laa["answer_quality"]["logic"] == 10.0
    # improved question is whitespace-collapsed and becomes `question`
    assert "  " not in long_["question"]
    assert long_["question"] == lqa["improved_question"]


def test_fan_out_wide_n_dynamic_fold(spark):
    """n > 8 folds into ⌊(2^63-1)/n⌋ instead of raising (the former hard
    cap broke callers with modest ids) — still overflow-safe under ANSI
    mode for full-range xxhash64 ids."""
    from xdan_dqa_spark.pipeline import with_doc_id

    df = spark.createDataFrame(
        [("https://a.example/x",), ("https://b.example/y",)], "url string"
    )
    out = fan_out_generations(with_doc_id(df), n_generations=16).collect()
    assert len(out) == 32
    seeds = [r["gen_seed"] for r in out]
    assert len(set(seeds)) == 32
    assert all(0 <= s <= (1 << 63) - 1 for s in seeds)
    # n <= 8 keeps the frozen 2^60 fold (oracle-twin & seed stability)
    small = fan_out_generations(
        spark.createDataFrame([(10,)], "doc_id long"), n_generations=4
    ).collect()
    assert sorted(r["gen_seed"] for r in small) == [40, 41, 42, 43]


def test_fan_out_rejects_absurd_n(spark):
    """Sanity cap: a corrupted config (n past 2^20) fails with a clear
    ValueError instead of a pmod-by-zero NULL (the fold bound reaches 0
    at n >= 2^63) or a sequence() explode OOM."""
    import pytest

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="n_generations"):
        fan_out_generations(df, n_generations=(1 << 20) + 1)
    # the cap itself is allowed
    assert fan_out_generations(df, n_generations=4).count() == 4
