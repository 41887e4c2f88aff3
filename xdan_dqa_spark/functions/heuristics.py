"""Gopher/C4-style heuristic quality rules as pure Column expressions.

These are the deterministic replacement for the reference's LLM-scored
quality dimensions (reference ``src/processor.py:148-186`` builds an LLM
prompt; ``config/quality_metrics.yaml`` defines the five dimensions).
Here every signal is a JVM-side expression — whole-stage-codegen'd,
no Python in the loop, so they cost ~nothing at 100 TB.

Rule provenance (public): Gopher (Rae et al. 2021 §A1.1) and C4
(Raffel et al. 2020 §2.2) heuristic filters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenize import NONWS, WS, WS_CHARS, WS_PLUS

# Union of high-frequency stopwords for the space-segmented languages we
# classify; used for the stopword-ratio rule (Gopher requires >=2 of a
# small stopword set; we use a ratio for a graded signal). Non-latin
# entries (ru/ar/ko — all space-segmented) cannot match latin-script text,
# so extending the set never moves latin goldens; unsegmented scripts
# (zh/ja) use the CJK-ratio clarity branch instead (operators/score.py).
STOPWORDS = sorted(
    {
        # en
        "the", "and", "of", "to", "in", "is", "that", "with", "for", "was",
        "on", "as", "are", "this", "be", "have", "from", "they", "which",
        # es
        "el", "la", "los", "las", "que", "de", "en", "un", "una", "por",
        "con", "para", "como", "más", "pero", "sus", "fue", "esta",
        # fr
        "le", "les", "des", "une", "et", "qui", "dans", "ce", "il", "ne",
        "sur", "se", "pas", "plus", "par", "je", "avec", "tout", "mais",
        # de
        "der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
        "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
        # ru
        "и", "в", "не", "на", "что", "он", "она", "это", "как", "мы",
        "по", "но", "из", "за", "то", "все", "так", "его", "же", "от",
        # ar
        "في", "من", "على", "أن", "إلى", "عن", "مع", "هذا", "هذه", "التي",
        "الذي", "كان", "لا", "ما", "أو", "ثم", "قد", "كل",
        # ko (frequent standalone function words; particles are suffixes
        # and never match with word boundaries, so they are not listed)
        "그리고", "하지만", "있는", "없는", "같은", "또는", "저는", "그는",
        "것이", "수", "있다", "없다", "한다", "했다",
    }
)

SYMBOL_CLASS = r"[@#$%^&*{}<>|\\~`=+]"
CJK_CLASS = r"[一-鿿぀-ヿ]"


def words_col(text: Column) -> Column:
    """Whitespace tokenization; empty tokens from leading/trailing
    whitespace are dropped (JVM trim only strips ASCII space)."""
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), WS_PLUS), lambda w: F.length(w) > 0
    )


def n_chars(text: Column) -> Column:
    return F.length(F.coalesce(text, F.lit(""))).cast("double")


def n_words(words: Column) -> Column:
    return F.size(words).cast("double")


# Java \s == [ \t\n\x0B\f\r]: the literal char set for translate-based
# whitespace stripping (translate is a single-pass char map — no regex).
_WS_CHARS = " \t\n\x0b\f\r"


def mean_word_len(text: Column, words: Column) -> Column:
    """Mean token length; 0 for empty docs. Gopher keeps mean in [3, 10].

    Σ(token lengths) == count of non-whitespace chars == length after
    translate-deleting the 6 Java-\\s chars — pure length arithmetic
    (codegen), no regex pass, no interpreted aggregate HOF."""
    non_ws = F.length(F.translate(F.coalesce(text, F.lit("")), _WS_CHARS, ""))
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        non_ws.cast("double") / F.size(words)
    )


# One compiled alternation; (?iU) = case-insensitive + unicode word classes
# (plain \b is ASCII-\w-based and never matches at a leading 'ü').
_STOPWORD_RE = r"(?iU)\b(?:" + "|".join(STOPWORDS) + r")\b"


def stopword_ratio(text: Column, words: Column) -> Column:
    """Stopword hits per token (latin langs) — a single regexp_count pass
    (JVM, codegen) instead of a per-token lambda with a 70-way
    array_contains (~10x slower)."""
    hits = F.regexp_count(F.coalesce(text, F.lit("")), F.lit(_STOPWORD_RE))
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        F.least(hits.cast("double") / F.size(words), F.lit(1.0))
    )


# The symbol class as a literal char list for translate (== SYMBOL_CLASS).
_SYMBOL_CHARS = "@#$%^&*{}<>|\\~`=+"


def symbol_ratio(text: Column, words: Column) -> Column:
    """Symbol-to-word ratio (Gopher drops >0.1 for #/ellipsis; we use a
    wider symbol class suited to web spam). Counted as a length diff after
    translate-deleting the class — identical to regexp_count(SYMBOL_CLASS)
    but a single char-map pass instead of a Java-regex scan (~3x)."""
    t = F.coalesce(text, F.lit(""))
    syms = (F.length(t) - F.length(F.translate(t, _SYMBOL_CHARS, ""))).cast("double")
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(syms / F.size(words))


def dup_line_frac(text: Column) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier line
    (C4/Gopher duplicate-line filter).

    One greedy regex split on ``\\s*\\n\\s*`` yields the trimmed lines with
    blank lines already merged into the separator (consecutive newlines
    collapse), so the per-line trim/filter lambdas (interpreted HOFs,
    measured +6.7s/240k docs at local[16]) reduce to a native
    ``array_remove`` of the at-most-two boundary empties.

    Line-equality semantics (intentional, frozen in the goldens): lines
    compare after a FULL Java-\\s trim at line boundaries — '  foo' and
    '\\tfoo' are duplicates of 'foo'. This differs from an ASCII-space-only
    trim() formulation and is the better duplicate definition for web text
    (indentation noise shouldn't defeat the filter)."""
    lines = F.array_remove(
        F.split(F.coalesce(text, F.lit("")), f"{WS}*\\n{WS}*"), ""
    )
    n = F.size(lines)
    return F.when(n <= 1, F.lit(0.0)).otherwise(
        (n - F.size(F.array_distinct(lines))).cast("double") / n
    )


def alpha_ratio(text: Column, words: Column) -> Column:
    """Fraction of tokens containing at least one letter (any script).
    Gopher requires >=80% of words to contain an alphabetic character.

    Tokens are maximal ``\\S+`` runs, so one regexp_count of
    ``[^\\p{L}\\s]*\\p{L}\\S*`` (first letter of a token, then the rest)
    matches exactly once per letter-bearing token — a single JVM regex
    scan instead of a per-token interpreted rlike lambda (measured
    +4.1s → +0.9s /240k docs at local[16]).

    The whitespace class is spelled explicitly (tokenize.WS_CHARS — the
    ASCII Java-\\s set) so a "token" here is exactly one words_col token;
    no (?U)-style Unicode class may widen it: with
    (?U) a token containing U+00A0 (extract.py emits it for &nbsp;) counts
    twice and the ratio can exceed 1.0. \\p{L} is Unicode-letter-aware
    regardless of the flag."""
    hits = F.regexp_count(
        F.coalesce(text, F.lit("")),
        F.lit(r"[^\p{L}" + WS_CHARS + r"]*\p{L}" + NONWS + "*"),
    )
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(words)
    )


def n_cjk(text: Column) -> Column:
    """Absolute CJK character count (length floor for unsegmented scripts,
    the zh analogue of Gopher's min-word-count rule)."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(CJK_CLASS)).cast("double")


def cjk_ratio(text: Column) -> Column:
    """Fraction of characters that are CJK — the zh-aware stand-in for
    stopword coverage on unsegmented scripts."""
    t = F.coalesce(text, F.lit(""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        F.regexp_count(t, F.lit(CJK_CLASS)).cast("double") / F.length(t)
    )


def distinct_word_ratio(words: Column) -> Column:
    """|distinct lowercased tokens| / |tokens| — low values flag keyword
    stuffing (Gopher's repeated-n-gram family, n=1). Native array_distinct,
    O(n) codegen — the max-single-token-frequency variant needs an O(n²)
    interpreted nested HOF and was the single slowest expr in the plan."""
    lowered = F.transform(words, lambda w: F.lower(w))
    return F.when(F.size(words) == 0, F.lit(1.0)).otherwise(
        F.size(F.array_distinct(lowered)).cast("double") / F.size(words)
    )


def heuristic_columns(text: Column, words: Column | None = None) -> dict[str, Column]:
    """All heuristic signals for one text column.

    Pass ``words`` as a materialized column reference when computing many
    signals over the same text (the pipeline does): a bare attribute is
    "cheap" to Catalyst, so CollapseProject dedups it, whereas an inline
    ``words_col`` subtree is re-evaluated per referencing signal."""
    w = words if words is not None else words_col(text)
    return {
        "n_chars": n_chars(text),
        "n_words": n_words(w),
        "mean_word_len": mean_word_len(text, w),
        "stopword_ratio": stopword_ratio(text, w),
        "symbol_ratio": symbol_ratio(text, w),
        "dup_line_frac": dup_line_frac(text),
        "alpha_ratio": alpha_ratio(text, w),
        "cjk_ratio": cjk_ratio(text),
        "n_cjk": n_cjk(text),
        "distinct_word_ratio": distinct_word_ratio(w),
    }
