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

MAX_CHARS = 512  # score at most this many chars per doc (plenty for a ppl signal)
_P1, _P2 = np.uint64(1000003), np.uint64(4294967291)


def _tri_keys(codes: np.ndarray) -> np.ndarray:
    """Hash every consecutive codepoint triple to a uint64 key."""
    c = codes.astype(np.uint64)
    return c[:-2] * _P1 * _P2 + c[1:-1] * _P2 + c[2:]


def _bi_keys(codes: np.ndarray) -> np.ndarray:
    """Hash every consecutive codepoint pair to a uint64 key (prefix
    bigrams for the conditional model)."""
    c = codes.astype(np.uint64)
    return c[:-1] * _P2 + c[1:]


def _lookup(keys: np.ndarray, table_keys: np.ndarray, table_vals: np.ndarray,
            default: float) -> np.ndarray:
    idx = np.searchsorted(table_keys, keys)
    idx_c = np.clip(idx, 0, max(len(table_keys) - 1, 0))
    if len(table_keys) == 0:
        return np.full(len(keys), default)
    return np.where(table_keys[idx_c] == keys, table_vals[idx_c], default)


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


def ppl_batch(s: pd.Series) -> pd.Series:
    """Perplexity for a batch of texts, numpy end-to-end."""
    txt = s.fillna("").str.lower().str.slice(0, MAX_CHARS)
    joined = "\x00\x00".join(txt.tolist())  # NUL pad kills cross-doc trigrams
    if not joined:
        return pd.Series(np.zeros(len(s)), index=s.index)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = txt.str.len().to_numpy()

    if len(codes) < 3:
        return pd.Series(np.full(len(s), 1.0), index=s.index)

    tri = _tri_keys(codes)
    bi = _bi_keys(codes)[:-1]  # prefix bigram of each trigram
    lognum = _lookup(tri, _TRI_KEYS, _TRI_LOGNUM, _DEF_TRI)
    logden = _lookup(bi, _BI_KEYS_T, _BI_LOGC, _DEF_BI)
    lp = lognum - logden
    # Zero out trigrams that span the NUL separators (contain codepoint 0).
    is_nul = codes == 0
    spans = is_nul[:-2] | is_nul[1:-1] | is_nul[2:]
    lp = np.where(spans, 0.0, lp)

    # Document boundaries in trigram space.
    starts = np.zeros(len(s), dtype=np.int64)
    if len(s) > 1:
        starts[1:] = np.cumsum(lens + 2)[:-1]
    # reduceat everywhere (sequential accumulation) — a pairwise .sum()
    # fallback would round differently and break batch invariance.
    starts = np.minimum(starts, max(len(lp) - 1, 0))
    sums = np.add.reduceat(lp, starts) if len(lp) else np.zeros(len(s))
    n_tris = np.maximum(lens - 2, 1)
    entropy = -sums / n_tris
    ppl = np.power(2.0, np.clip(entropy, 0.0, 30.0))
    ppl = np.where(lens < 3, 1e6, ppl)  # degenerate docs → worst ppl
    return pd.Series(ppl, index=s.index)


@F.pandas_udf(T.DoubleType())
def ppl_udf(text: pd.Series) -> pd.Series:
    return ppl_batch(text)
