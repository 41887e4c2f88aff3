"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference keeps one long-lived in-process accumulator per run —
``ProcessingStats`` (``src/models.py:191-219``) updated item-by-item and
printed at the end (``src/cli.py:119-139``). Its streaming analogue is a
KEYED, RESTART-SAFE running aggregate: per-host cumulative quality
counters that survive micro-batch boundaries AND process restarts,
because the state lives in Spark's state store under the streaming
checkpoint, not in Python memory.

This is the custom-stateful-operator surface (SURVEY.md §2.5): windowed
aggs cover time-bucketed metrics; ``applyInPandasWithState`` covers
arbitrary per-key state machines (running counters here; session windows,
cross-batch dedup, or drift detectors follow the same shape). State is
Arrow-batched per key group — no row-at-a-time Python.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    from pyspark.sql.streaming import StreamingQuery

from ..operators.score import QualityConfig
from ..pipeline import score_webtext, with_doc_id
from .stream import webtext_stream

_OUT_SCHEMA = (
    "host string, docs_seen long, kept long, keep_rate double, scrub_total long"
)
_STATE_SCHEMA = "docs long, kept long, scrub long"


def host_column(url: F.Column | str = "url") -> F.Column:
    """Registrable-host extraction from a url column (pure expr)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-z]+://([^/]+)", 1)


def _update_host_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one host into the running
    (docs, kept, scrub) counters and emit the updated snapshot."""
    docs, kept, scrub = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        docs += len(pdf)
        kept += int(pdf["keep"].sum())
        scrub += int(pdf["scrub_count"].sum())
    state.update((docs, kept, scrub))
    yield pd.DataFrame(
        [{
            "host": key[0],
            "docs_seen": docs,
            "kept": kept,
            "keep_rate": (kept / docs) if docs else 0.0,
            "scrub_total": scrub,
        }]
    )


def host_quality_state(scored: DataFrame) -> DataFrame:
    """Per-host cumulative quality counters over a (streaming) DataFrame
    with ``url``/``keep``/``scrub_count`` columns. Emits one updated
    snapshot row per host per micro-batch; state is keyed by host in the
    state store (shuffled once per batch on the group key — counters, not
    rows, are what persists)."""
    rows = scored.select(
        host_column("url").alias("host"), "keep", "scrub_count"
    )
    return rows.groupBy("host").applyInPandasWithState(
        _update_host_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_state_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: QualityConfig | None = None,
    available_now: bool = True,
) -> "StreamingQuery":
    """Score a growing webtext directory and maintain restart-safe
    per-host cumulative counters. Each micro-batch appends that batch's
    updated host snapshots (tagged with batch_id) to ``output_dir``; the
    LATEST snapshot per host is the current state. Restarting with the
    same checkpoint resumes the counters — they live in the state store,
    not the driver."""
    cfg = cfg or QualityConfig()
    scored = score_webtext(with_doc_id(webtext_stream(spark, input_dir)), cfg)
    updates = host_quality_state(scored)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(output_dir)

    writer = (
        updates.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_host_state(spark: SparkSession, output_dir: str) -> DataFrame:
    """Current per-host state = the last emitted snapshot per host."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.desc("batch_id"))
    return (
        spark.read.parquet(output_dir)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
