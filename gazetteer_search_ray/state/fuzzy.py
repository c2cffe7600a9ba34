"""Deletion-neighborhood (SymSpell-style) edit-distance-1 term index.

The reference's fuzzy match (Q2, ``builders/MatchPart.java:19-81``,
``fuzziness("1")``) expands a query term to every dictionary term within
edit distance 1.  A linear dictionary scan is O(|vocab|) per query —
the round-1 latency cliff at code-corpus vocabulary sizes.  This index
is O(len(term)) per lookup:

* build: for every dictionary term, register each of its 1-character
  deletions (and the term itself) in a hash map delete → term ids;
* lookup(q): candidates = exact hit ∪ dictionary∩deletes1(q) (deletion)
  ∪ index[q] (insertion) ∪ index[d] for d ∈ deletes1(q) (substitution
  and shared-delete collisions), then verify each with the exact ed≤1
  predicate — the same predicate the scan used, so results are
  identical to the linear scan (differentially tested).

Memory is Σ len(term) map entries (~10× vocab) — the scale path the
reader switches to above ``SCAN_CUTOFF`` terms; below it the plain scan
is cheaper to set up.
"""

from __future__ import annotations

import numpy as np


def ed1(a: str, b: str) -> bool:
    """True iff edit distance(a, b) ≤ 1 (substitution/insert/delete)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _deletes1(t: str) -> list[str]:
    return [t[:i] + t[i + 1 :] for i in range(len(t))]


class DeletionNeighborhoodIndex:
    """ed≤1 candidate index over a FIXED sorted vocabulary."""

    def __init__(self, sorted_terms: list[str]):
        self.terms = sorted_terms
        self._vocab = {t: i for i, t in enumerate(sorted_terms)}
        by_delete: dict[str, list[int]] = {}
        for i, t in enumerate(sorted_terms):
            for d in _deletes1(t):
                lst = by_delete.get(d)
                if lst is None:
                    by_delete[d] = [i]
                else:
                    lst.append(i)
        self._by_delete = by_delete

    def lookup(self, term: str, max_results: int = 50) -> list[str]:
        """Dictionary terms with ed(term, t) ≤ 1, sorted, capped —
        identical to a verified linear scan of the sorted vocabulary."""
        cand: set[int] = set()
        hit = self._vocab.get(term)
        if hit is not None:
            cand.add(hit)
        buckets = self._by_delete.get(term)
        if buckets:
            cand.update(buckets)
        for d in _deletes1(term):
            h = self._vocab.get(d)
            if h is not None:
                cand.add(h)
            b = self._by_delete.get(d)
            if b:
                cand.update(b)
        out = []
        for i in sorted(cand):
            t = self.terms[i]
            if ed1(term, t):
                out.append(t)
                if len(out) >= max_results:
                    break
        return out
