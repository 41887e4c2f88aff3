"""HTML→text extraction: byte-exact pinned-algorithm goldens."""

from __future__ import annotations

from pyspark.sql import functions as F

from xdan_dqa_spark.functions.extract import extract_text

CASES = [
    (
        b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body><h1>H</h1><p>body text</p>"
        b"<!-- c --></body></html>",
        "T\nH\nbody text",
    ),
    (b"<p>a&amp;b &lt;tag&gt; &#39;q&#39;</p>", "a&b <tag> 'q'"),
    (b"<div>x</div><div>y</div>", "x\ny"),
    (b"line1<br>line2<br/>line3", "line1\nline2\nline3"),
    (b"   spaced    out\t\ttext   ", "spaced out text"),
    (b"", ""),
    (None, ""),
    (b"no tags at all", "no tags at all"),
    # invalid utf-8 byte → U+FFFD replacement, never an exception
    (b"ok \xff bytes", "ok � bytes"),
    # nested/sloppy script close
    (b"<script type='x'>a<b</script >after", "after"),
]


def test_extract_goldens():
    for raw, expected in CASES:
        assert extract_text(raw) == expected, f"extract({raw!r})"


def test_extract_udf_matches_function(spark, webtext):
    """UDF output is byte-identical to the driver-side function per url."""
    from xdan_dqa_spark.functions.extract import extract_text_udf

    sample = webtext.limit(60)
    got = sample.select("url", extract_text_udf(F.col("html")).alias("t")).toPandas()
    raw = sample.select("url", "html").toPandas()
    oracle = {r["url"]: extract_text(r["html"]) for _, r in raw.iterrows()}
    for _, r in got.iterrows():
        assert r["t"] == oracle[r["url"]]


def test_extract_deterministic():
    raw = b"<html><body><p>stable &amp; pinned</p></body></html>"
    assert extract_text(raw) == extract_text(raw) == "stable & pinned"
