"""Schema constants (SURVEY.md §1.2 type mapping).

Mirrors the reference's record contract — ``AlpacaItem``
(``src/models.py:126-145``), ``ProcessedItem`` (``src/models.py:147-158``),
``QualityMetrics`` (``src/models.py:17-45``) — re-typed for the
Common-Crawl-style webtext input of BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input table (BASELINE.json input_hint): Common-Crawl-style web pages.
WEBTEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Quality vector — fixed-key struct (not MapType) so Catalyst can prune
# individual metric columns. Replaces QualityMetrics' five LLM dimensions
# (reference src/models.py:17-45) with deterministic signals.
QUALITY_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("n_chars", T.DoubleType(), True),
        T.StructField("n_words", T.DoubleType(), True),
        T.StructField("mean_word_len", T.DoubleType(), True),
        T.StructField("stopword_ratio", T.DoubleType(), True),
        T.StructField("symbol_ratio", T.DoubleType(), True),
        T.StructField("dup_line_frac", T.DoubleType(), True),
        T.StructField("alpha_ratio", T.DoubleType(), True),
        T.StructField("lang_score", T.DoubleType(), True),
        T.StructField("ppl", T.DoubleType(), True),
    ]
)

LANGID_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), True),
        T.StructField("lang_score", T.DoubleType(), True),
    ]
)

# Token-accounting envelope (TokenInfo, reference src/data_types.py:6-12).
TOKEN_INFO_SCHEMA = T.StructType(
    [
        T.StructField("input_tokens", T.LongType(), True),
        T.StructField("output_tokens", T.LongType(), True),
        T.StructField("total_tokens", T.LongType(), True),
        T.StructField("estimated_cost", T.DoubleType(), True),
        T.StructField("currency", T.StringType(), True),
    ]
)

# Fired improvement rules (ImprovementSuggestion, reference
# src/models.py:165-169).
SUGGESTION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("aspect", T.StringType(), False),
            T.StructField("suggestion", T.StringType(), False),
            T.StructField("priority", T.IntegerType(), False),
        ]
    )
)

# Scored output row = input + these (ProcessedItem analogue,
# reference src/models.py:147-158).
SCORED_EXTRA_FIELDS = [
    ("doc_id", T.LongType()),          # xxhash64(url) — replaces ts-string id src/processor.py:223-227
    ("extracted_text", T.StringType()),
    ("pred_lang", T.StringType()),
    ("quality_metrics", QUALITY_METRICS_SCHEMA),
    ("category", T.StringType()),       # 8-way DataCategory label (src/models.py:6-15)
    ("improvement_suggestions", SUGGESTION_SCHEMA),
    ("score", T.DoubleType()),
    ("keep", T.BooleanType()),
    ("scrubbed_text", T.StringType()),  # processed_output analogue
    ("scrub_count", T.IntegerType()),
    ("token_info", TOKEN_INFO_SCHEMA),  # TokenInfo envelope (src/data_types.py:6-12)
]

# Per-partition lineage/metrics table (FIXTURES.md §5; mirrors batch
# metrics of reference src/processor.py:404-421).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_keep", T.LongType(), False),
        T.StructField("n_drop", T.LongType(), False),
        T.StructField("n_error", T.LongType(), False),
        T.StructField("scrub_count", T.LongType(), False),
        T.StructField("min_score", T.DoubleType(), True),
        T.StructField("max_score", T.DoubleType(), True),
        T.StructField("avg_score", T.DoubleType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)
