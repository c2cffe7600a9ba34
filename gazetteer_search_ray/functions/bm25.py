"""Okapi BM25 scoring — the similarity the reference delegates to ES.

The reference's ES 6.2.3 mapping declares plain ``text`` fields with no
custom similarity (``es_mappings/addr_row.json:41-121``), so documents are
scored by Lucene's default BM25 with k1=1.2, b=0.75:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score    = sum_t idf(t) * tfn(t, d)

Conventions fixed here once and reused by BOTH the engine and every
oracle (FIXTURES.md §3):

* all arithmetic in float64;
* per-query summation over terms in ascending term order (ties between
  engines then differ only by ulps; compared values are rounded);
* tie-break: (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return np.log1p((n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)) in float64."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


def term_scores(
    tf: np.ndarray,
    dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-posting BM25 contribution of one term (vectorized)."""
    return float(idf(df, n_docs)) * tf_norm(tf, dl, avgdl, k1, b)


def block_upper_bound(
    max_tf: np.ndarray,
    min_dl: np.ndarray,
    df: int,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-block score upper bound from (max_tf, min_dl) skip metadata.

    tfn is increasing in tf and decreasing in dl, so
    ``tfn(max_tf, min_dl) >= tfn(tf_d, dl_d)`` for every doc d in the
    block — a valid block-max bound computable without global stats at
    index time (global df / avgdl are applied here, at query time).
    """
    return float(idf(df, n_docs)) * tf_norm(max_tf, min_dl, avgdl, k1, b)
