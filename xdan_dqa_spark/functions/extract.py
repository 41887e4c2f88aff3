"""Deterministic HTML→text extraction as an Arrow pandas UDF.

The reference consumes pre-extracted fields (``src/data_loader.py:128-133``);
our input is raw ``html:binary`` (BASELINE.json input_hint), so extraction
is the first pipeline stage. The algorithm is PINNED — any change breaks
the byte-identical-text-per-url contract (SURVEY.md §7) and must re-freeze
the golden fixtures.

Pinned algorithm (v1):
  1. UTF-8 decode, errors='replace'
  2. drop <script>/<style> elements and <!-- comments -->
  3. block-level close tags (</p> </div> </li> </h1..6> </tr> <br>) → '\n'
  4. strip remaining tags
  5. HTML entity unescape
  6. collapse horizontal whitespace, trim lines, collapse blank lines, strip

Python ``re`` is used ONLY here (inside one Arrow-batched UDF); the scrub
stage stays JVM-side so exactly one regex engine owns each contract.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRIPT_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_RE = re.compile(r"(?i)<(?:br\s*/?|/p|/div|/li|/tr|/h[1-6]|/title)\s*>")
_TAG_RE = re.compile(r"<[^>]*>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v]+")
_BLANKS_RE = re.compile(r"\n\s*\n+")


def extract_text(raw: bytes | None) -> str:
    """Pinned HTML→text extraction for one page (pure, deterministic)."""
    if raw is None:
        return ""
    s = raw.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    s = _HSPACE_RE.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _BLANKS_RE.sub("\n", s)
    return s.strip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    # Parsing is irreducibly per-document; it stays Arrow-batched and is
    # the one stage allowed to call Python re (see module docstring).
    return html.map(extract_text)
