"""Shared numpy char-n-gram machinery for language-ID and perplexity.

Both models operate on the same representation: the Arrow batch's texts
are lowercased, truncated to ``MAX_CHARS``, joined with NUL separators
and decoded to one uint32 codepoint array; trigram/bigram keys come from
shifted-polynomial hashing. Computing that representation ONCE per batch
and feeding both scorers (see ``functions/fused.py``) halves the
batch-preparation cost relative to independent UDFs.

Everything here is deterministic and allocation-lean: no per-row Python,
no regex — numpy ufuncs, ``searchsorted`` and ``add.reduceat`` only.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

MAX_CHARS = 512  # score at most this many chars per doc (plenty of signal)
_P1, _P2 = np.uint64(1000003), np.uint64(4294967291)


def tri_keys(codes: np.ndarray) -> np.ndarray:
    """Hash every consecutive codepoint triple to a uint64 key."""
    c = codes.astype(np.uint64)
    return c[:-2] * _P1 * _P2 + c[1:-1] * _P2 + c[2:]


def bi_keys(codes: np.ndarray) -> np.ndarray:
    """Hash every consecutive codepoint pair to a uint64 key."""
    c = codes.astype(np.uint64)
    return c[:-1] * _P2 + c[1:]


def lookup(keys: np.ndarray, table_keys: np.ndarray, table_vals: np.ndarray,
           default: float) -> np.ndarray:
    """Sorted-table lookup: one searchsorted + one gather per call."""
    if len(table_keys) == 0:
        return np.full(len(keys), default)
    idx = np.searchsorted(table_keys, keys)
    idx_c = np.clip(idx, 0, len(table_keys) - 1)
    return np.where(table_keys[idx_c] == keys, table_vals[idx_c], default)


@dataclass
class EncodedBatch:
    """One Arrow batch, encoded once for all n-gram scorers.

    ``tri``/``spans``/``starts`` are None when the whole batch has fewer
    than 3 codepoints (scorers handle the degenerate case themselves).
    """

    n_docs: int
    lens: np.ndarray            # per-doc char count (post-truncation)
    index: pd.Index             # original Series index
    codes: np.ndarray | None    # joined uint32 codepoints (NUL-separated)
    tri: np.ndarray | None      # trigram keys over the joined array
    bi: np.ndarray | None       # prefix-bigram key per trigram
    spans: np.ndarray | None    # True where a trigram crosses a doc boundary
    starts: np.ndarray | None   # per-doc segment start in trigram space
    n_tris: np.ndarray | None   # max(lens-2, 1) per doc

    def code_segment_sums(self, values: np.ndarray) -> np.ndarray:
        """Per-doc sums of a per-CODEPOINT array (codes-space segments)."""
        starts = np.zeros(self.n_docs, dtype=np.int64)
        if self.n_docs > 1:
            starts[1:] = np.cumsum(self.lens + 2)[:-1]
        starts = np.minimum(starts, max(len(values) - 1, 0))
        return np.add.reduceat(values, starts) if len(values) else np.zeros(self.n_docs)


def encode_batch(txt: pd.Series) -> EncodedBatch:
    """Encode a normalized (lowercased, truncated) text Series.

    The joined-with-NUL layout and all offset arithmetic mirror the
    original per-UDF implementation bit-for-bit — batch invariance of the
    downstream scores depends on it.
    """
    joined = "\x00\x00".join(txt.tolist())  # NUL pad kills cross-doc trigrams
    lens = txt.str.len().to_numpy()
    n = len(txt)
    if not joined:
        return EncodedBatch(n, lens, txt.index, None, None, None, None, None, None)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if len(codes) < 3:
        return EncodedBatch(n, lens, txt.index, codes, None, None, None, None, None)

    tri = tri_keys(codes)
    bi = bi_keys(codes)[:-1]  # prefix bigram of each trigram
    is_nul = codes == 0
    spans = is_nul[:-2] | is_nul[1:-1] | is_nul[2:]

    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        starts[1:] = np.cumsum(lens + 2)[:-1]
    starts = np.minimum(starts, max(len(tri) - 1, 0))
    n_tris = np.maximum(lens - 2, 1)
    return EncodedBatch(n, lens, txt.index, codes, tri, bi, spans, starts, n_tris)


def segment_sums(values: np.ndarray, enc: EncodedBatch) -> np.ndarray:
    """Per-doc sums of a per-trigram array (sequential reduceat — a
    pairwise ``.sum()`` would round differently and break invariance)."""
    return np.add.reduceat(values, enc.starts) if len(values) else np.zeros(enc.n_docs)
