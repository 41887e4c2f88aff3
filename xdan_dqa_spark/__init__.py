"""xdan_dqa_spark — a from-scratch PySpark-native data-quality engine.

Re-expresses the capabilities of xiechengmude/xDAN-DataQualityAssessment
(per-document quality scoring, keep/drop filtering, categorization,
text scrubbing, weighted scoring, batch metrics, dedup, checkpoint/resume,
lineage — see /root/reference, SURVEY.md) as a deterministic, Spark-first
pipeline: heuristic rules as pure Column expressions, language-ID and
n-gram perplexity as vectorized Arrow pandas UDFs, PII/toxicity scrub as
a JVM regexp_replace chain. No per-row Python anywhere in the hot path.
"""

__version__ = "0.1.0"
