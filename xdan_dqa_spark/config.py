"""YAML job configuration — the reference's config surface, Spark-mapped.

The reference is entirely YAML-driven: ``scripts/run_assessment.py:38-45``
loads ``config/default_config.yaml`` (datasets with ``field_mapping`` /
``num_samples``, OpenAI pricing, output naming) and
``src/models.py:47-60`` loads dimension weights from
``config/quality_metrics.yaml``. This module accepts that exact shape and
maps it onto the engine's dataclasses:

  datasets[i]            → SourceConfig (path/fmt/field_mapping/num_samples)
  quality_metrics.*.weight → QualityConfig dimension weights, via the
                           documented reference↔deterministic mapping
                           (correctness→w_fluency, clarity→w_clarity,
                           context_awareness→w_lang, engagement→w_clean,
                           reasoning_depth→w_structure)
  openai.pricing         → QualityConfig price/currency fields
  quality / filter keys  → min_score, allowed langs/categories
  output                 → output dir, save format, task name

Unknown keys are ignored (the reference carries LLM-client settings that
have no deterministic analogue).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from .operators.score import QualityConfig
from .sources.readers import SourceConfig

# reference quality_metrics.yaml name -> QualityConfig weight field
_WEIGHT_FIELDS = {
    "correctness": "w_fluency",
    "clarity": "w_clarity",
    "context_awareness": "w_lang",
    "engagement": "w_clean",
    "reasoning_depth": "w_structure",
}


@dataclass(frozen=True)
class JobConfig:
    """Everything a quality-filter run needs, resolved from YAML."""

    sources: tuple[SourceConfig, ...] = ()
    quality: QualityConfig = QualityConfig()
    output_dir: str = "outputs"
    save_format: str = "parquet"       # reference output.save_format
    task_name: str = "task_quality"    # reference file_naming.task_name
    combine_datasets: bool = True      # reference dataset_common


def _source_from_entry(entry: dict) -> SourceConfig:
    mapping = {
        k: v for k, v in (entry.get("field_mapping") or {}).items() if v
    }
    n = int(entry.get("num_samples") or 0)
    return SourceConfig(
        path=entry.get("path") or entry.get("name") or "",
        fmt=entry.get("format") or entry.get("fmt") or "parquet",
        field_mapping=mapping,
        num_samples=0 if n < 0 else n,  # reference: -1 means "all"
    )


def parse_config(doc: dict) -> JobConfig:
    """Map a parsed reference-shaped YAML document onto JobConfig."""
    doc = doc or {}
    quality = QualityConfig()

    # dimension weights (quality_metrics.yaml shape: {name: {weight: x}})
    weights = {}
    for name, spec in (doc.get("quality_metrics") or {}).items():
        if name in _WEIGHT_FIELDS and isinstance(spec, dict) and "weight" in spec:
            weights[_WEIGHT_FIELDS[name]] = float(spec["weight"])
    if weights:
        quality = replace(quality, **weights)

    # pricing (default_config.yaml openai.pricing shape)
    pricing = ((doc.get("openai") or {}).get("pricing")) or {}
    if pricing:
        quality = replace(
            quality,
            price_in_per_million=float(pricing.get("input_price_per_million", 1.0)),
            price_out_per_million=float(pricing.get("output_price_per_million", 2.0)),
            currency=str(pricing.get("currency", "CNY")),
        )

    # engine-side filter settings (our extension block; reference passes
    # min_score/categories per CLI call, src/processor.py:423-435)
    q = doc.get("quality") or doc.get("filter") or {}
    updates = {}
    if "min_score" in q:
        updates["min_score"] = float(q["min_score"])
    if "allowed_langs" in q:
        updates["allowed_langs"] = tuple(q["allowed_langs"])
    if "allowed_categories" in q:
        updates["allowed_categories"] = tuple(q["allowed_categories"])
    if "require_lang_match" in q:
        updates["require_lang_match"] = bool(q["require_lang_match"])
    if updates:
        quality = replace(quality, **updates)

    sources = tuple(_source_from_entry(e) for e in doc.get("datasets") or [])

    out = doc.get("output") or {}
    naming = out.get("file_naming") or {}
    common = doc.get("dataset_common") or {}
    return JobConfig(
        sources=sources,
        quality=quality,
        output_dir=str(out.get("base_dir", "outputs")),
        save_format=str(out.get("save_format", "parquet")),
        task_name=str(naming.get("task_name", "task_quality")),
        combine_datasets=bool(common.get("combine_datasets", True)),
    )


def load_config(path: str) -> JobConfig:
    """Load a YAML config file (reference run_assessment.py:38-45 shape)."""
    import yaml

    with open(path, encoding="utf-8") as f:
        return parse_config(yaml.safe_load(f))
