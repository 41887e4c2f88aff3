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
