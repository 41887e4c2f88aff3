"""Perplexity model: discrimination, degenerate inputs, batch invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd

from xdan_dqa_spark.functions.perplexity import ppl_batch

IN_DOMAIN = "the quick brown fox jumps over the lazy dog and with that this from have been"
GARBAGE = "zxqwk jvvpt qqqzz xkcd7 mmmnb zzzyx"
STUFFING = "zirconium blockchain seo crypto casino pills " * 8


def test_in_domain_beats_garbage():
    out = ppl_batch(pd.Series([IN_DOMAIN, GARBAGE, STUFFING]))
    assert out[0] < 20.0, f"in-domain ppl {out[0]}"
    assert out[1] > 10 * out[0]
    assert out[2] > 10 * out[0]


def test_degenerate_inputs():
    out = ppl_batch(pd.Series(["", "a", "ab", None]))
    assert (out >= 1e6 - 1).all()  # too short to score → worst ppl


def test_batch_invariance():
    a = ppl_batch(pd.Series([IN_DOMAIN]))
    b = ppl_batch(pd.Series([GARBAGE, IN_DOMAIN, "", STUFFING]))
    assert a[0] == b[1]


def test_single_vs_many_rows():
    texts = [IN_DOMAIN, GARBAGE, STUFFING, "el perro en la casa que fue de sus"]
    singles = np.array([ppl_batch(pd.Series([t]))[0] for t in texts])
    batched = ppl_batch(pd.Series(texts)).to_numpy()
    assert np.allclose(singles, batched)


def test_truncation_cap():
    """Texts longer than MAX_CHARS score on the prefix only."""
    long = IN_DOMAIN * 100
    a = ppl_batch(pd.Series([long]))
    assert np.isfinite(a[0]) and a[0] < 50.0
