"""Brute-force BM25 oracle — the independent ground truth (SURVEY.md §5).

Pure Python/numpy, no shared code with the engine except the analyzer
(sharing the analyzer is the point: the reference's import and query
paths share IndexAnalyzer the same way) and the BM25 constants.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

K1, B = 1.2, 0.75


class BruteIndex:
    def __init__(self, docs: dict[int, list[str]]):
        """docs: doc_id -> raw token list (with duplicates)."""
        self.tf = {d: Counter(toks) for d, toks in docs.items()}
        self.dl = {d: len(toks) for d, toks in docs.items()}
        self.n = len(docs)
        self.avgdl = sum(self.dl.values()) / self.n if self.n else 0.0
        self.df: Counter = Counter()
        for c in self.tf.values():
            self.df.update(c.keys())

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

    def score(self, doc: int, term: str) -> float:
        tf = self.tf[doc].get(term, 0)
        if tf == 0:
            return 0.0
        dl = self.dl[doc]
        return self.idf(term) * tf * (K1 + 1.0) / (
            tf + K1 * (1.0 - B + B * dl / self.avgdl)
        )

    def matches_or(self, terms: list[str]) -> dict[int, float]:
        out: dict[int, float] = {}
        for d in self.tf:
            s = 0.0
            hit = False
            for t in terms:
                sc = self.score(d, t)
                if self.tf[d].get(t, 0) > 0:
                    hit = True
                s += sc
            if hit:
                out[d] = s
        return out

    def matches_and(self, terms: list[str]) -> dict[int, float]:
        return {
            d: s
            for d, s in self.matches_or(terms).items()
            if all(self.tf[d].get(t, 0) > 0 for t in terms)
        }

    def matches_msm(self, terms: list[str], m: int) -> dict[int, float]:
        return {
            d: s
            for d, s in self.matches_or(terms).items()
            if sum(1 for t in terms if self.tf[d].get(t, 0) > 0) >= m
        }

    @staticmethod
    def topk(matches: dict[int, float], k: int):
        items = sorted(matches.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return (
            np.array([d for d, _ in items], dtype=np.int64),
            np.array([s for _, s in items], dtype=np.float64),
        )
