"""Perplexity models: discrimination, degenerate inputs, batch invariance,
and the per-language model family (CCNet LID→per-lang-LM dispatch)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from xdan_dqa_spark.functions.perplexity import (
    PPL_CALIBRATION,
    _lang_sentences,
    ppl_batch,
    ppl_batch_by_lang,
)

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


# ---------------------------------------------------------- per-language

# latin four + zh (pooled-excluded extension langs appended — each has its
# own frozen model + calibration; see perplexity.EXT_LANGS)
LANGS = ("en", "es", "fr", "de", "zh", "ja", "ko", "ru", "ar")


def _held_out(lang: str) -> str:
    return "".join(_lang_sentences(lang, seed=2025, n_sents=3))[:200]


def test_own_model_beats_cross_language_within_script():
    """Within the latin set — the languages the LID can actually confuse —
    each language's in-domain text scores better under ITS model than
    under any other latin model, calibrated by each model's frozen good
    level (the comparison the fluency ramp makes). zh is excluded both
    ways: cross-SCRIPT text is fully unknown to the other model, and
    add-k backoff prices total ignorance at only ~vocab-size per char,
    so raw cross-script ppl is meaningless — which is fine, because the
    LID routes by script evidence before any LM runs (langid._cjk_frac)
    and zh text can never reach a latin model in the pipeline."""
    latin = ["en", "es", "fr", "de"]
    for lang in latin:
        text = pd.Series([_held_out(lang)])
        own = ppl_batch_by_lang(text, pd.Series([lang]))[0] / PPL_CALIBRATION[lang][0]
        for other in latin:
            if other == lang:
                continue
            cross = (
                ppl_batch_by_lang(text, pd.Series([other]))[0]
                / PPL_CALIBRATION[other][0]
            )
            assert own < cross, (lang, other, own, cross)


def test_calibration_centers_held_out_text():
    """Held-out in-domain ppl lands near the frozen good level for EVERY
    language (within the good..bad ramp), so a typical clean doc of any
    covered language gets a high fluency score — the reason calibration
    is per-language."""
    for lang in LANGS:
        good, bad = PPL_CALIBRATION[lang]
        texts = pd.Series([_held_out(lang), "".join(_lang_sentences(lang, 2026, 3))[:200]])
        ppls = ppl_batch_by_lang(texts, pd.Series([lang, lang]))
        assert (ppls < good * 2.0).all(), (lang, list(ppls), good)
        assert (ppls < bad).all()


def test_by_lang_batch_invariance():
    """Per-language scores don't depend on batch composition or on what
    other languages share the batch."""
    texts = [_held_out(la) for la in LANGS] + [GARBAGE, ""]
    langs = list(LANGS) + ["en", "und"]
    batched = ppl_batch_by_lang(pd.Series(texts), pd.Series(langs)).to_numpy()
    singles = np.array([
        ppl_batch_by_lang(pd.Series([t]), pd.Series([la]))[0]
        for t, la in zip(texts, langs)
    ])
    # allclose, not array_equal: numpy reduceat's pairwise block reduction
    # shifts rounding by ~1 ULP when the block layout changes (same
    # tolerance the pooled-model invariance test uses).
    assert np.allclose(batched, singles, rtol=1e-12, atol=0.0)


def test_unknown_lang_falls_back_to_pooled():
    a = ppl_batch_by_lang(pd.Series([IN_DOMAIN]), pd.Series(["und"]))[0]
    b = ppl_batch_by_lang(pd.Series([IN_DOMAIN]), pd.Series(["xx"]))[0]
    c = ppl_batch(pd.Series([IN_DOMAIN]))[0]
    assert a == b == c
