"""Deterministic synthetic webtext table (FIXTURES.md §1).

Generates the Common-Crawl-style input table of BASELINE.json's
input_hint — ``(url, warc_ts, html, text, lang)`` — fully deterministic
under seed=42 so golden fixtures are stable across runs and machines.

Row mix exercises every rule in the pipeline:
  ~60% clean prose, ~10% too-short, ~5% symbol-heavy, ~5% duplicate-line
  heavy, ~5% stopword-free keyword stuffing, ~5% wrong-lang body,
  ~10% PII/profanity-bearing (scrub targets). One "heavy" host owns ~20%
  of rows so salted repartitioning is observable (SURVEY.md §7 risk list).
"""

from __future__ import annotations

import datetime as dt
import html as _html
import math

import numpy as np
import pandas as pd

# Small per-language word pools — enough signal for the char-n-gram
# langid scorer; vocabulary is generic public wordlists.
WORDS = {
    "en": (
        "the quick brown fox jumps over lazy dog and with that this from have "
        "been were they which their would there what about when time people "
        "could other than then some these more herself through government "
        "world school still house country really think found answer because"
    ).split(),
    "es": (
        "el la los las que de en un una por con para como más pero sus le ya "
        "o fue este ha sí porque esta entre cuando muy sin sobre también me "
        "hasta hay donde quien desde todo nos durante todos uno les ni contra "
        "otros ese eso ante ellos e esto mí antes algunos qué unos yo otro"
    ).split(),
    "fr": (
        "le la les de des un une et en que qui dans ce il ne sur se pas plus "
        "pouvoir par je avec tout faire son mettre autre on mais nous comme "
        "ou si leur y dire elle devoir avant deux même prendre aussi celui "
        "donner bien où fois vous encore nouveau aller cela entre premier"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei "
        "einer um am sind noch wie einem über einen so zum war haben nur oder "
        "aber vor zur bis mehr durch man sein wurde sei schön wenig zwischen"
    ).split(),
}
ZH_CHARS = list("的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于就下得可你年生自会那后能对着事其里所去行过家十用发天如然作方成者多日都三小军二无同么经")

PII_EMAILS = ["john.doe@example.com", "alice_smith99@mail-test.org", "bob+spam@web.co.uk"]
PII_PHONES = ["(555) 123-4567", "555-987-6543", "+1 212 555 0199"]
PII_SSNS = ["123-45-6789", "987-65-4321"]
PROFANITY = ["damn", "hell", "crap", "bastard"]

HOSTS = ["heavyhost.com"] + [f"site{i:02d}.example.org" for i in range(30)]


def _sentence(rng: np.random.Generator, lang: str, n: int) -> str:
    if lang == "zh":
        return "".join(rng.choice(ZH_CHARS, size=n)) + "。"
    w = rng.choice(WORDS[lang], size=n)
    return " ".join(w).capitalize() + "."


def _clean_doc(rng: np.random.Generator, lang: str) -> str:
    n_sent = int(rng.integers(5, 15))
    return " ".join(_sentence(rng, lang, int(rng.integers(8, 20))) for _ in range(n_sent))


def make_webtext(n_rows: int = 2000, seed: int = 42) -> pd.DataFrame:
    """Build the deterministic webtext pandas DataFrame (driver-side)."""
    rng = np.random.default_rng(seed)
    langs = ["en", "es", "fr", "de", "zh"]
    base_ts = dt.datetime(2025, 1, 10, 0, 0, 0)

    rows = []
    for i in range(n_rows):
        # Zipf-skewed hosts: heavyhost.com gets ~20% of rows.
        host = HOSTS[0] if rng.random() < 0.20 else str(rng.choice(HOSTS[1:]))
        url = f"https://{host}/page/{i:06d}"
        ts = base_ts + dt.timedelta(seconds=int(rng.integers(0, 5 * 86400)))
        lang = langs[i % 5]
        kind_p = rng.random()
        if kind_p < 0.60:
            kind, text = "clean", _clean_doc(rng, lang)
        elif kind_p < 0.70:
            kind, text = "short", _sentence(rng, lang, int(rng.integers(2, 6)))[:49]
        elif kind_p < 0.75:
            kind = "symbols"
            body = _clean_doc(rng, lang)
            syms = " ".join(rng.choice(list("@#$%^&*{}<>|\\~`=+"), size=len(body.split()) // 2))
            text = body + " " + syms
        elif kind_p < 0.80:
            kind = "duplines"
            line = _sentence(rng, lang, 10)
            uniq = [_sentence(rng, lang, 10) for _ in range(4)]
            text = "\n".join(uniq + [line] * 6)
        elif kind_p < 0.85:
            kind = "stuffing"
            # keyword stuffing: no stopwords, repeated rare tokens
            kw = ["zirconium", "blockchain", "seo", "crypto", "casino", "pills"]
            text = " ".join(str(rng.choice(kw)) for _ in range(int(rng.integers(60, 120))))
        elif kind_p < 0.90:
            kind = "wronglang"
            other = langs[(i + 2) % 5]
            text = _clean_doc(rng, other)  # body disagrees with `lang` tag
        else:
            kind = "pii"
            body = _clean_doc(rng, "en" if lang == "zh" else lang)
            inserts = [
                f"Contact: {rng.choice(PII_EMAILS)}",
                f"Call {rng.choice(PII_PHONES)} now.",
                f"SSN {rng.choice(PII_SSNS)} on file.",
                f"That {rng.choice(PROFANITY)} thing again.",
            ]
            k = int(rng.integers(1, 4))
            text = body + " " + " ".join(inserts[:k])
        title = f"Doc {i} — {host}"
        heading = f"Document number {i}"
        html_doc = (
            "<html><head><title>%s</title>"
            "<script>var x = 1;</script><style>p{color:red}</style></head>"
            "<body><h1>%s</h1><p>%s</p><!-- comment --></body></html>"
            % (_html.escape(title), _html.escape(heading), _html.escape(text).replace("\n", "</p><p>"))
        )
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": html_doc.encode("utf-8"),
                "text": text,
                "lang": lang,
                "_kind": kind,  # ground-truth row kind, test-only column
            }
        )
    return pd.DataFrame(rows)


def webtext_df(spark, n_rows: int = 2000, seed: int = 42, with_kind: bool = False):
    """Webtext as a Spark DataFrame (Arrow-converted from the driver pdf).

    At real scale this table is an Iceberg scan; the synthetic path exists
    only because the sandbox has no external data (BASELINE.json mandate).
    """
    pdf = make_webtext(n_rows, seed)
    if not with_kind:
        pdf = pdf.drop(columns=["_kind"])
    from .schemas import WEBTEXT_SCHEMA

    schema = WEBTEXT_SCHEMA
    if with_kind:
        import pyspark.sql.types as T

        schema = T.StructType(WEBTEXT_SCHEMA.fields + [T.StructField("_kind", T.StringType())])
    n_parts = max(4, int(math.sqrt(n_rows / 250)))
    return spark.createDataFrame(pdf, schema=schema).repartition(n_parts)
