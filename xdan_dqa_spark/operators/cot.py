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

from ..functions.tokenize import NONWS_PLUS, WS_PLUS

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


def _collapse_ws(c: Column) -> Column:
    return F.regexp_replace(F.trim(c), WS_PLUS, " ")


def _wc(c: Column) -> Column:
    """whitespace word count as double (0 for null/empty)."""
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(NONWS_PLUS)).cast("double")


def _ramp10(x: Column, full_at: float) -> Column:
    """0..10 linear ramp, saturating at ``full_at``, 3dp.

    3dp, not 1dp: every ramp here steps in multiples of 0.025 (integer
    signal / decimal denominator), which is EXACT at 3 decimals — so the
    round is tie-free and Spark's HALF_UP agrees bit-for-bit with
    DuckDB's decimal-aware round in the oracle twin. At 1dp the same
    values land on .x5 ties where the engines disagree."""
    return F.round(F.lit(10.0) * F.least(x / F.lit(full_at), F.lit(1.0)), 3)


def to_enhanced_structured_prompt(
    df: DataFrame,
    instruction: Column,
    output: Column,
    input_: Column | None = None,
    original_format: str = "webtext",
    template: str = "analyze-solve-verify",
) -> DataFrame:
    """``EnhancedStructuredPromptItem`` (reference ``src/models.py:284-339``):
    the StructuredPromptItem envelope EXTENDED with typed
    ``question_analysis`` / ``answer_analysis`` structs
    (``QuestionAnalysis``/``AnswerAnalysis``, ``src/models.py:258-282``).

    The reference fills the analysis fields with LLM rewrites; this engine
    carries the exact SCHEMA with a deterministic fill (same policy as
    ``to_structured_prompt``): quality sub-scores are saturating ramps over
    text-shape signals, improvement suggestions are threshold rules (the
    P10 pattern, operators/score.py ``suggestion_structs``), the improved
    question is the whitespace-normalized original, and the improved
    answer is the PII/profanity-SCRUBBED original — a real deterministic
    improvement wired to the engine's scrubber. Everything is codegen'd
    string/number exprs with an exact DuckDB twin (``cot_enhanced``).

    Output columns:

    * ``question`` string — the IMPROVED question (reference
      ``from_alpaca_item``: ``question = question_analysis.improved_question``)
    * ``question_analysis`` struct<original_question: string,
      question_quality: struct<clarity, specificity, reasonableness: double>,
      improvement_suggestions: array<string>, improved_question: string>
    * ``answer_analysis`` struct<original_answer: string,
      answer_quality: struct<completeness, accuracy, logic: double>,
      improvement_suggestions: array<string>, improved_answer: string>
    * ``components`` struct<analyze, solve, verify, solution: string> —
      analyze/solve COMPOSED from the analysis fields exactly in the
      reference's from_alpaca_item f-string shape (src/models.py:312-330)
    * ``cot_metadata`` — same provenance struct as ``to_structured_prompt``
    """
    from ..functions.scrub import scrub_expr

    q = question_col(instruction, input_)
    qw, qc = _wc(q), F.length(F.coalesce(q, F.lit(""))).cast("double")
    a = F.coalesce(output, F.lit(""))
    aw, ac = _wc(a), F.length(a).cast("double")
    a_lines = F.length(F.regexp_replace(a, r"[^\n]", "")).cast("double") + F.lit(1.0)

    # question_quality: clarity saturates with enough words to parse the
    # ask, specificity with enough characters of constraint, and
    # reasonableness is their midpoint (deterministic composite).
    clarity = _ramp10(qw, 20.0)
    specificity = _ramp10(qc, 200.0)
    reasonableness = F.round((clarity + specificity) / F.lit(2.0), 3)
    q_sugg = F.filter(
        F.array(
            F.when(qw < F.lit(8.0), F.lit("add context to the question")),
            F.when(qc > F.lit(500.0), F.lit("tighten the question")),
        ),
        lambda x: x.isNotNull(),
    )
    improved_q = _collapse_ws(q)

    # answer_quality: completeness with body length, accuracy with enough
    # words to substantiate, logic with multi-line structure.
    completeness = _ramp10(ac, 400.0)
    accuracy = _ramp10(aw, 50.0)
    logic = _ramp10(a_lines, 5.0)
    improved_a = scrub_expr(a)
    a_sugg = F.filter(
        F.array(
            F.when(ac < F.lit(200.0), F.lit("expand the answer with supporting detail")),
            F.when(improved_a != a, F.lit("remove sensitive or flagged content")),
        ),
        lambda x: x.isNotNull(),
    )

    fmt = lambda c: F.format_string("%.3f", c)  # tie-free at 3dp (see _ramp10)
    analyze_body = F.concat(
        F.lit("Question analysis:\n- Original question: "), q,
        F.lit("\n- Question quality: clarity: "), fmt(clarity),
        F.lit(", specificity: "), fmt(specificity),
        F.lit(", reasonableness: "), fmt(reasonableness),
        F.lit("\n- Suggestions: "), F.array_join(q_sugg, "; "),
        F.lit("\n- Improved question: "), improved_q,
        F.lit("\n\nAnswer analysis:\n- Answer quality: completeness: "), fmt(completeness),
        F.lit(", accuracy: "), fmt(accuracy),
        F.lit(", logic: "), fmt(logic),
        F.lit("\n- Suggestions: "), F.array_join(a_sugg, "; "),
    )
    solve_body = F.concat(
        F.lit("Based on the improved question and analysis, provide the solution:\n"),
        improved_a,
    )

    return df.withColumns({
        "question": improved_q,
        "question_analysis": F.struct(
            q.alias("original_question"),
            F.struct(
                clarity.alias("clarity"),
                specificity.alias("specificity"),
                reasonableness.alias("reasonableness"),
            ).alias("question_quality"),
            q_sugg.alias("improvement_suggestions"),
            improved_q.alias("improved_question"),
        ),
        "answer_analysis": F.struct(
            a.alias("original_answer"),
            F.struct(
                completeness.alias("completeness"),
                accuracy.alias("accuracy"),
                logic.alias("logic"),
            ).alias("answer_quality"),
            a_sugg.alias("improvement_suggestions"),
            improved_a.alias("improved_answer"),
        ),
        "components": F.struct(
            analyze_body.alias("analyze"),
            solve_body.alias("solve"),
            F.lit(VERIFY_BODY).alias("verify"),
            improved_a.alias("solution"),
        ),
        "cot_metadata": F.struct(
            F.lit(original_format).alias("original_format"),
            F.lit(template).alias("transformation_template"),
            instruction.alias("original_instruction"),
            (input_ if input_ is not None else F.lit("")).alias("original_input"),
            output.alias("original_output"),
        ),
    })


# gen_seed bound: ids are pmod-folded into [0, bound) before the ×n
# fan-out multiply so the largest seed (bound-1)·n + (n-1) fits int64 —
# full-range xxhash64 doc ids (the pipeline's with_doc_id) would overflow
# (and abort the job under ANSI mode) if multiplied raw. For n ≤ 8 the
# bound is fixed at 2^60 ((2^60-1)·8 + 7 = 2^63-1 exactly), keeping seed
# values stable for the common fan-outs and their oracle twins; larger n
# folds into ⌊(2^63-1)/n⌋ instead of being rejected.
GEN_SEED_BOUND = 1 << 60


def fan_out_generations(df: DataFrame, n_generations: int = 4,
                        id_col: str = "doc_id") -> DataFrame:
    """Multi-generation fan-out (reference ``distillable/pipeline.py:33-37``
    ``num_generations=4``): N candidate rows per input row via a
    generation-index explode — the deterministic engine replaces the LLM
    generation itself, but downstream consumers keep the
    N-outputs-per-input row shape and a per-candidate deterministic seed
    (``gen_seed = pmod(id, bound)·n + idx`` with ``bound = 2^60`` for
    n ≤ 8, else ``⌊(2^63-1)/n⌋``: overflow-safe for full-range xxhash64
    ids, oracle-portable arithmetic, distinct per gen_idx of the same
    doc, and distinct across docs unless their ids are congruent mod
    bound — negligible for an RNG-seed use).

    Explode of a literal array is narrow — no shuffle; output rows = n×input.
    """
    n = int(n_generations)
    if n < 1:
        raise ValueError(f"n_generations must be >= 1, got {n}")
    if n > (1 << 20):
        # generous sanity bound: a corrupted config fails with a clear
        # message instead of a pmod-by-zero (n >= 2^63 folds the seed
        # bound to 0) or a sequence() explode OOM long before that
        raise ValueError(f"n_generations must be <= {1 << 20}, got {n}")
    bound = GEN_SEED_BOUND if n <= 8 else ((1 << 63) - 1) // n
    gens = F.explode(
        F.sequence(F.lit(0), F.lit(n - 1))
    ).alias("gen_idx")
    return df.select("*", gens).withColumn(
        "gen_seed",
        F.pmod(F.col(id_col).cast("long"), F.lit(bound))
        * F.lit(n) + F.col("gen_idx"),
    )
