"""Structured CoT record envelope (reference ``src/models.py:222-339``).

The reference's largest data-model family — ``StructuredPromptItem``
(question + Analyze/Solve/Verify/Solution components + provenance
metadata, built deterministically by ``from_alpaca_item``,
``src/models.py:233-257``) — re-expressed as a pure Column reshape: the
LLM-rewrite variants (``QuestionAnalysis``/``AnswerAnalysis``) are out of
scope per SURVEY.md §1.1, but the envelope SHAPE and the deterministic
from-item transformation are carried so a reference user can emit the
same record family from this engine.

The alpaca mapping onto the webtext/documents model: ``instruction`` ↦ a
templated prompt over the document's source, ``input`` ↦ the document
text (context), ``output`` ↦ the document text — mirroring
``from_alpaca_item``'s ``question = instruction (+ "\\nContext: " +
input)`` concatenation and its FIXED Analyze/Solve/Verify component
strings (``src/models.py:243-247``) with ``Solution = output``.

Everything is string concat + literals — whole-stage codegen, and an
exact DuckDB twin exists (see entry_queries ``SQL_COT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed component bodies — reference src/models.py:243-247 verbatim shape
# (deterministic strings, not LLM output).
ANALYZE_BODY = (
    "- Key aspects identified\n- Scope defined\n- Evaluation criteria established"
)
SOLVE_BODY = (
    "- Systematic examination\n- Evidence provided\n- Multiple perspectives considered"
)
VERIFY_BODY = (
    "- Comprehensiveness checked\n- Arguments validated\n- Objectivity assessed"
)


def question_col(instruction: Column, input_: Column | None) -> Column:
    """``question = instruction`` + optional ``"\\nContext: " + input``
    (reference src/models.py:236-239: the Context line is appended only
    when ``item.input`` is non-empty)."""
    if input_ is None:
        return instruction
    return F.when(
        input_.isNotNull() & (input_ != ""),
        F.concat(instruction, F.lit("\nContext: "), input_),
    ).otherwise(instruction)


def to_structured_prompt(
    df: DataFrame,
    instruction: Column,
    output: Column,
    input_: Column | None = None,
    original_format: str = "webtext",
    template: str = "analyze-solve-verify",
) -> DataFrame:
    """Adds the ``StructuredPromptItem`` envelope as typed nested columns:

    * ``question``   string
    * ``components`` struct<analyze,solve,verify,solution: string>
      (the reference's Dict[str,str] with its four fixed keys — a typed
      struct rather than a map so Parquet/Iceberg get real columns and
      column pruning instead of opaque map blobs at 100 TB)
    * ``cot_metadata`` struct<original_format, transformation_template,
      original_instruction, original_input, original_output: string>
      (reference metadata dict, src/models.py:248-256)
    """
    return df.withColumns({
        "question": question_col(instruction, input_),
        "components": F.struct(
            F.lit(ANALYZE_BODY).alias("analyze"),
            F.lit(SOLVE_BODY).alias("solve"),
            F.lit(VERIFY_BODY).alias("verify"),
            output.alias("solution"),
        ),
        "cot_metadata": F.struct(
            F.lit(original_format).alias("original_format"),
            F.lit(template).alias("transformation_template"),
            instruction.alias("original_instruction"),
            (input_ if input_ is not None else F.lit("")).alias("original_input"),
            output.alias("original_output"),
        ),
    })


# gen_seed bound: ids are pmod-folded into [0, 2^60) before the ×n fan-out
# multiply, so the largest seed (2^60-1)·n + (n-1) stays far inside int64
# even for full-range xxhash64 doc ids (the pipeline's with_doc_id),
# which would overflow — and abort the job under ANSI mode — if
# multiplied raw.
GEN_SEED_BOUND = 1 << 60


def fan_out_generations(df: DataFrame, n_generations: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """Multi-generation fan-out (reference ``distillable/pipeline.py:33-37``
    ``num_generations=4``): N candidate rows per input row via a
    generation-index explode — the deterministic engine replaces the LLM
    generation itself, but downstream consumers keep the
    N-outputs-per-input row shape and a per-candidate deterministic seed
    (``gen_seed = pmod(id, 2^60)·n + idx``: overflow-safe for full-range
    xxhash64 ids, oracle-portable arithmetic, distinct per gen_idx of the
    same doc, and distinct across docs unless their ids are congruent
    mod 2^60 — negligible for an RNG-seed use).

    Explode of a literal array is narrow — no shuffle; output rows = n×input.
    """
    n = int(n_generations)
    if n < 1 or n > 8:
        raise ValueError(f"n_generations must be in [1, 8], got {n}")
    gens = F.explode(
        F.sequence(F.lit(0), F.lit(n - 1))
    ).alias("gen_idx")
    return df.select("*", gens).withColumn(
        "gen_seed",
        F.pmod(F.col(id_col).cast("long"), F.lit(GEN_SEED_BOUND))
        * F.lit(n) + F.col("gen_idx"),
    )
