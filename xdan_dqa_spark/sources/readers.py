"""Input connectors: scan, field mapping, sampling, multi-source union.

Spark-native re-expression of the reference's data-loading surface
(SURVEY.md §2.1):

  S1  dataset scan            reference ``src/data_loader.py:70-107``
  S2  bounded streaming take  reference ``src/utils/dataset_utils.py:214-259``
  S3  deterministic sampling  reference ``src/data_loader.py:97-100`` (seed 42)
  S7  config-driven mapping   reference ``src/data_loader.py:109-141``
  U1  multi-dataset union     reference ``src/data_loader.py:56-68``

Every connector returns a lazy DataFrame — scans stream per-partition,
filters/projections push into the parquet reader (the reference's
"streaming=True" early-stop is Catalyst's LocalLimit pushdown here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import WEBTEXT_SCHEMA


@dataclass(frozen=True)
class SourceConfig:
    """One input dataset (analogue of a ``datasets:`` YAML entry in the
    reference's ``config/default_config.yaml:30-41``)."""

    path: str
    fmt: str = "parquet"              # parquet | json (jsonl) | csv
    # Rename arbitrary source columns onto the engine schema, e.g.
    # {"url": "page_url", "text": "content"} maps page_url -> url.
    field_mapping: dict[str, str] = field(default_factory=dict)
    num_samples: int = 0              # 0 = all rows (reference semantics)
    options: dict[str, str] = field(default_factory=dict)


def apply_field_mapping(df: DataFrame, mapping: dict[str, str],
                        absorb_metadata: bool = False,
                        metadata_col: str = "metadata") -> DataFrame:
    """S7: pure projection/rename — target column <- source column.

    Default: unmapped source columns pass through as bare columns.
    ``absorb_metadata=True`` instead folds every unmapped column into ONE
    ``metadata`` map<string,string> column (values cast to string, keys
    in sorted order so the column is deterministic) — the reference's
    dynamic ``metadata`` dict absorption (``src/data_loader.py:116-125``)
    as a typed Spark column. ``metadata_to_json`` gives the JSON-encoded
    form the reference publishes (``scripts/run_assessment.py:190-196``).

    A map, not a struct, on purpose: heterogeneous Alpaca-style datasets
    have per-dataset leftover columns, and a union across them needs one
    stable schema — map<string,string> is that schema.
    """
    if not mapping and not absorb_metadata:
        return df
    cols = []
    for target, source in mapping.items():
        if source not in df.columns:
            raise ValueError(f"field_mapping: source column {source!r} not in input")
        cols.append(F.col(source).alias(target))
    leftover = [c for c in df.columns
                if c not in mapping.values() and c not in mapping]
    if absorb_metadata:
        if metadata_col in mapping:
            raise ValueError(f"metadata_col {metadata_col!r} collides with a mapped target")
        entries = [x for c in sorted(leftover)
                   for x in (F.lit(c), F.col(c).cast("string"))]
        meta = (F.create_map(*entries) if entries
                else F.create_map().cast("map<string,string>"))
        return df.select(*cols, meta.alias(metadata_col))
    return df.select(*cols, *[F.col(c) for c in leftover])


def metadata_to_json(metadata_col: str = "metadata") -> F.Column:
    """JSON-encode the absorbed metadata map for publishing (reference
    ``scripts/run_assessment.py:190-196`` json.dumps of the item's
    metadata dict). ``to_json`` keeps the map's (sorted) entry order."""
    return F.to_json(F.col(metadata_col))


def deterministic_sample(df: DataFrame, n: int, key_col: str = "url") -> DataFrame:
    """S3: take-N that is stable across runs AND cluster layouts.

    The reference shuffles with seed=42 then takes range(n) — positional,
    so any input reorder changes the sample. Ours orders by a hash of a
    stable key: same rows selected no matter the partitioning. The sort
    is a top-N (Spark TakeOrderedAndProject), not a full global sort.
    """
    if n <= 0:
        return df
    return df.orderBy(F.xxhash64(F.col(key_col)), F.col(key_col)).limit(n)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    pct: dict[str, int] | None = None,
    default_pct: int = 10,
) -> DataFrame:
    """S3 variant: per-stratum deterministic sampling (e.g. keep 5% of
    the dominant language, 20% of the tail languages when rebalancing a
    training mix).

    The bucket is ``md5(key) mod 100`` — a pure map-side filter, no
    shuffle, stable across runs, cluster layouts, and engines (md5 is
    engine-portable, unlike xxhash64, so the selected SET is
    oracle-checkable). Rates are integer percents per stratum value.
    """
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(100),
    )
    rate: F.Column = F.lit(int(default_pct))
    for value, r in (pct or {}).items():
        rate = F.when(F.col(strata_col) == value, F.lit(int(r))).otherwise(rate)
    return df.filter(bucket < rate)


def read_source(spark: SparkSession, cfg: SourceConfig,
                enforce_webtext: bool = False) -> DataFrame:
    """S1/S2: one lazy scan. ``enforce_webtext`` pins the input_hint schema
    (url, warc_ts, html, text, lang) so bad upstream types fail at plan
    time, not mid-job."""
    reader = spark.read
    for k, v in cfg.options.items():
        reader = reader.option(k, v)
    if cfg.fmt == "parquet":
        df = reader.parquet(cfg.path)
    elif cfg.fmt == "json":
        df = (reader.schema(WEBTEXT_SCHEMA) if enforce_webtext and not cfg.field_mapping
              else reader).json(cfg.path)
    elif cfg.fmt == "csv":
        df = reader.option("header", "true").csv(cfg.path)
    else:
        raise ValueError(f"unsupported format {cfg.fmt!r}")

    df = apply_field_mapping(df, cfg.field_mapping)
    if enforce_webtext:
        missing = [f.name for f in WEBTEXT_SCHEMA.fields if f.name not in df.columns]
        if missing:
            raise ValueError(f"input at {cfg.path} missing columns {missing}")
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in WEBTEXT_SCHEMA.fields]
        )
    if cfg.num_samples:
        df = deterministic_sample(df, cfg.num_samples)
    return df


def read_many(spark: SparkSession, cfgs: list[SourceConfig],
              enforce_webtext: bool = True) -> DataFrame:
    """U1: union across configured datasets by column NAME (the reference
    extends a list per dataset; positional union would silently mismatch
    reordered columns)."""
    dfs = [read_source(spark, c, enforce_webtext) for c in cfgs]
    if not dfs:
        raise ValueError("no sources configured")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def weighted_reservoir_topk(df: DataFrame, k: int, weight_col: str,
                            id_col: str = "doc_id") -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows
    (Efraimidis–Spirtakis A-Res, 2006): each row draws a deterministic
    pseudo-uniform u from its id hash and scores key = ln(u)/w; the k
    LARGEST keys are the sample. Inclusion probability is proportional
    to weight WITHOUT replacement — the property rate-based sampling
    (stratified_hash_sample, quality-weighted s3) cannot give you when
    the budget is an exact row count.

    Determinism discipline: u = (h + 0.5)/2^60 with h the 60-bit
    md5-derived hash of the id — no RNG, reproducible across runs,
    engines, cluster sizes; ln and the division are single fixed IEEE
    ops on identical inputs, so even the rank boundary is
    engine-portable (ties additionally broken by id). Zero/negative
    weights are excluded (they cannot be sampled — documented, not
    silent: a weight of 0 has key -inf in the limit).

    Scale shape: the selection is a global top-k — Spark plans
    TakeOrderedAndProject (per-partition heaps, O(k) state each, no
    global sort); the key is map-side arithmetic on the scan."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("wrs:"), F.col(id_col).cast("string"))),
                    1, 15), 16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("wrs_key", F.round(key, 12))
        .orderBy(F.desc("wrs_key"), F.asc(id_col))
        .limit(k)
    )
