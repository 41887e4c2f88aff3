"""Multimodal plumbing: schema, mapInPandas batching, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xdan_dqa_spark.operators.multimodal import (
    EMBED_DIM,
    MEDIA_META_SCHEMA,
    frame_sample,
    media_features,
    try_real_decoders,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes(range(256)) * 4, ("image/png", 16, 16, None)),
        (2, b"\x00" * 128, ("image/jpeg", 8, 8, None)),
        (3, b"abcdef" * 100, ("video/mp4", 64, 48, 3500)),
        (4, None, ("image/png", 0, 0, None)),
    ]
    return spark.createDataFrame(
        rows,
        schema="doc_id long, payload binary, media_meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )


def test_decoder_is_stubbed_here():
    assert not try_real_decoders()  # container ships no codec libs


def test_media_features_schema_and_determinism(media):
    out = media_features(media)
    a = {r["doc_id"]: r for r in out.collect()}
    b = {r["doc_id"]: r for r in media_features(media.repartition(3)).collect()}
    assert set(a) == {1, 2, 3, 4}
    for k in a:
        assert a[k]["embedding"] == b[k]["embedding"]  # partition-invariant
        assert len(a[k]["embedding"]) == EMBED_DIM
    assert a[1]["n_bytes"] == 1024
    assert a[1]["byte_entropy"] == pytest.approx(8.0)  # uniform bytes
    assert a[2]["byte_entropy"] == 0.0                 # constant bytes
    assert a[4]["n_bytes"] == 1                        # null payload stub


def test_frame_sample_grid(media):
    out = frame_sample(media.filter(F.col("doc_id") == 3), every_ms=1000)
    rows = sorted(r["frame_ms"] for r in out.collect())
    assert rows == [0, 1000, 2000, 3000]  # duration 3500ms @ 1s grid
    checks = {r["frame_ms"]: r["frame_checksum"] for r in out.collect()}
    assert len(set(checks.values())) >= 2  # frames differ by timestamp slice


def test_frame_sample_zero_duration(media):
    out = frame_sample(media.filter(F.col("doc_id") == 1), every_ms=1000)
    assert [r["frame_ms"] for r in out.collect()] == [0]
