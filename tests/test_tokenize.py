"""Cross-engine tokenization parity fuzz: the explicit whitespace class
(functions/tokenize.py) must split ARBITRARY whitespace-ridden text
identically in Spark (Java regex) and DuckDB (RE2) — the property the
oracle value-hash compares rely on. Seeded, not hypothesis-driven: one
Spark job over the whole batch keeps the test O(seconds)."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from xdan_dqa_spark.functions.tokenize import WS_PLUS
from xdan_dqa_spark.plans.entry_queries import _WORDS_WS_SQL

_WS = [" ", "\t", "\n", "\x0B", "\f", "\r"]
_CHARS = "abcXYZ09.,!é中"


def _random_texts(n: int, seed: int = 20260818) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, 12)):
            if rng.random() < 0.45:
                parts.append("".join(rng.choices(_WS, k=rng.randint(1, 3))))
            else:
                parts.append("".join(rng.choices(_CHARS, k=rng.randint(1, 6))))
        out.append("".join(parts))
    return out


def test_ws_tokenization_matches_duckdb_on_random_text(spark):
    texts = _random_texts(300)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    spark_toks = {
        r["doc_id"]: r["toks"]
        for r in df.select(
            "doc_id",
            F.filter(F.split(F.coalesce("text", F.lit("")), WS_PLUS),
                     lambda w: F.length(w) > 0).alias("toks"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    duck_toks = dict(con.execute(
        f"SELECT doc_id, {_WORDS_WS_SQL} FROM documents"
    ).fetchall())
    assert spark_toks == duck_toks
