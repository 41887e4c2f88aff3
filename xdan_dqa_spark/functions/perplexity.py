"""KenLM-style character-trigram perplexity as a numpy-vectorized pandas UDF.

Deterministic replacement for the reference's LLM "fluency" judgment
(the reasoning_depth/correctness dimensions of ``src/models.py:17-45``).
A frozen add-k-smoothed char-trigram language model in the CCNet/KenLM
tradition (Wenzek et al. 2020), shrunk to an embedded seed corpus so the
sandbox needs no model download.

Execution shape: the whole Arrow batch is scored with numpy only —
texts are concatenated to one uint32 codepoint array, trigram keys are
formed by shifted-polynomial hashing, log-probs come from one
``np.searchsorted`` into the frozen sorted key table, and per-document
entropies fall out of ``np.add.reduceat``. No per-row Python.

The model table is built once per Python worker at module import
(executors import the shipped package), i.e. broadcast-by-closure.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..synth import WORDS, ZH_CHARS
from .ngram_core import (
    MAX_CHARS,
    EncodedBatch,
    bi_keys as _bi_keys,
    encode_batch,
    lookup as _lookup,
    segment_sums,
    tri_keys as _tri_keys,
)


def _build_model() -> tuple[np.ndarray, np.ndarray, float]:
    """Frozen trigram model from the embedded multilingual seed corpus."""
    rng = np.random.default_rng(7)  # frozen: part of the model definition
    corpus_parts = []
    for lang, words in WORDS.items():
        # Deterministic shuffled pseudo-sentences — covers intra-word AND
        # cross-word (boundary) trigrams of the vocabulary.
        ws = np.array(words)
        for _ in range(200):
            rng.shuffle(ws)
            corpus_parts.append(" ".join(ws[: rng.integers(8, 30)]).lower() + ". ")
    corpus_parts.append("".join(ZH_CHARS) * 3)
    corpus = " ".join(corpus_parts)

    codes = np.frombuffer(corpus.encode("utf-32-le"), dtype=np.uint32)
    k = 0.1  # add-k smoothing
    vocab = len(np.unique(codes)) + 1

    tri_u, tri_c = np.unique(_tri_keys(codes), return_counts=True)
    bi_u, bi_c = np.unique(_bi_keys(codes), return_counts=True)
    bi_logc = np.log2(bi_c + k * vocab)

    # Conditional P(c3 | c1 c2) = (count(tri)+k) / (count(bi_prefix)+k·V).
    # Trigram log-num stored; denominators looked up per prefix at score
    # time so unseen-trigram/seen-prefix and unseen-prefix cases both get
    # proper add-k backoff mass.
    tri_lognum = np.log2(tri_c + k)
    default_lognum = float(math.log2(k))
    default_bi_logc = float(math.log2(k * vocab))
    return (
        tri_u, tri_lognum.astype(np.float64), default_lognum,
        bi_u, bi_logc.astype(np.float64), default_bi_logc,
    )


(_TRI_KEYS, _TRI_LOGNUM, _DEF_TRI, _BI_KEYS_T, _BI_LOGC, _DEF_BI) = _build_model()


def ppl_encoded(enc: EncodedBatch) -> pd.Series:
    """Perplexity for one encoded batch (see ngram_core.encode_batch)."""
    if enc.tri is None:  # degenerate batch — mirror the original edge cases
        total_codes = int(enc.lens.sum()) + 2 * max(enc.n_docs - 1, 0)
        fill = 0.0 if total_codes == 0 else 1.0
        return pd.Series(np.full(enc.n_docs, fill), index=enc.index)

    lognum = _lookup(enc.tri, _TRI_KEYS, _TRI_LOGNUM, _DEF_TRI)
    logden = _lookup(enc.bi, _BI_KEYS_T, _BI_LOGC, _DEF_BI)
    # Zero out trigrams that span the NUL separators between docs.
    lp = np.where(enc.spans, 0.0, lognum - logden)
    sums = segment_sums(lp, enc)
    entropy = -sums / enc.n_tris
    ppl = np.power(2.0, np.clip(entropy, 0.0, 30.0))
    ppl = np.where(enc.lens < 3, 1e6, ppl)  # degenerate docs → worst ppl
    return pd.Series(ppl, index=enc.index)


def ppl_batch(s: pd.Series) -> pd.Series:
    """Perplexity for a batch of texts, numpy end-to-end."""
    txt = s.fillna("").str.lower().str.slice(0, MAX_CHARS)
    return ppl_encoded(encode_batch(txt))


@F.pandas_udf(T.DoubleType())
def ppl_udf(text: pd.Series) -> pd.Series:
    return ppl_batch(text)
