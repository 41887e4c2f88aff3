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
    # id*n + idx is collision-free across (doc, generation)
    assert seeds == [40, 41, 42, 43, 44, 45, 46, 47]
    assert sorted({r["gen_idx"] for r in out}) == [0, 1, 2, 3]
