"""YAML config loader: the reference's default_config.yaml /
quality_metrics.yaml shape must drive SourceConfig + QualityConfig."""

from __future__ import annotations

import os
import textwrap

from xdan_dqa_spark.config import load_config, parse_config

REFERENCE_SHAPED = """
openai:
  model_name: "some-model"
  pricing:
    input_price_per_million: 1.5
    output_price_per_million: 3.0
    currency: "USD"

datasets:
  - name: "{src_path}"
    config: ""
    split: "train"
    num_samples: 5
    field_mapping:
      url: "page_url"
      text: "content"
  - name: "{src_path}"
    num_samples: -1
    field_mapping: {{}}

dataset_common:
  shuffle_seed: 42
  combine_datasets: true

quality_metrics:
  reasoning_depth: {{weight: 0.2, description: "x"}}
  correctness: {{weight: 0.3}}
  clarity: {{weight: 0.2}}
  context_awareness: {{weight: 0.15}}
  engagement: {{weight: 0.15}}

quality:
  min_score: 5.5
  allowed_langs: [en, es]
  allowed_categories: [KNOWLEDGE_QA, CODE_GENERATION]

output:
  base_dir: "outputs"
  save_format: "parquet"
  file_naming:
    task_name: "my-task"
    include_timestamp: true
"""


def test_parse_reference_shaped_yaml(tmp_path):
    cfgfile = tmp_path / "conf.yaml"
    cfgfile.write_text(REFERENCE_SHAPED.format(src_path="/data/in.parquet"))
    jc = load_config(str(cfgfile))

    assert len(jc.sources) == 2
    s0, s1 = jc.sources
    assert s0.path == "/data/in.parquet"
    assert s0.field_mapping == {"url": "page_url", "text": "content"}
    assert s0.num_samples == 5
    assert s1.num_samples == 0          # -1 means "all"

    q = jc.quality
    assert q.min_score == 5.5
    assert q.allowed_langs == ("en", "es")
    assert q.allowed_categories == ("KNOWLEDGE_QA", "CODE_GENERATION")
    assert q.w_fluency == 0.3 and q.w_structure == 0.2
    assert q.price_in_per_million == 1.5 and q.currency == "USD"

    assert jc.output_dir == "outputs"
    assert jc.save_format == "parquet"
    assert jc.task_name == "my-task"


def test_parse_empty_config_gives_defaults():
    jc = parse_config({})
    assert jc.sources == ()
    assert jc.quality.min_score == 6.0
    assert jc.combine_datasets is True


def test_config_drives_pipeline(spark, webtext, tmp_path):
    """End to end: YAML → SourceConfig scan with field mapping + sampling →
    score_webtext under the YAML QualityConfig."""
    from xdan_dqa_spark.pipeline import score_webtext
    from xdan_dqa_spark.sources.readers import read_many

    # write a renamed-column input the field_mapping must fix
    src = os.path.join(tmp_path, "in.parquet")
    webtext.withColumnRenamed("url", "page_url").withColumnRenamed(
        "text", "content"
    ).write.parquet(src)

    cfgfile = tmp_path / "conf.yaml"
    cfgfile.write_text(
        textwrap.dedent(
            f"""
            datasets:
              - name: "{src}"
                num_samples: 100
                field_mapping:
                  url: "page_url"
                  text: "content"
            quality:
              min_score: 7.0
              allowed_categories: [KNOWLEDGE_QA, CONVERSATION, REASONING]
            """
        )
    )
    jc = load_config(str(cfgfile))
    df = read_many(spark, list(jc.sources))
    assert df.count() == 100
    assert {"url", "text", "lang"} <= set(df.columns)

    scored = score_webtext(df, jc.quality)
    rows = scored.select("keep", "score", "category").collect()
    for r in rows:
        if r["keep"]:
            assert r["score"] >= 7.0
            assert r["category"] in ("KNOWLEDGE_QA", "CONVERSATION", "REASONING")
