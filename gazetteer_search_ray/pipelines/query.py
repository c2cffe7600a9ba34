"""Query engine: boolean BM25 plans + block-max pruned top-k.

Reimplements the reference's ES query composition (SURVEY.md §2.4) over
the explicit index:

* plan nodes mirror the ES query parts the reference builds —
  ``Bool`` (``builders/BooleanPart.java``), ``Term``/multi-term match
  (``builders/MatchPart.java``), ``Prefix`` (``builders/PrefixPart.java``),
  ``DisMax`` (``builders/DisMaxUnion.java``), terms filters
  (``builders/TermsPart.java``), function/script score
  (``builders/FunctionScorePart.java``, ``CustomScore.java``);
* the disjunctive top-k path uses **block-max dynamic pruning**
  (MaxScore/WAND family): terms are processed in descending
  upper-bound order, and once the remaining terms' bounds cannot beat
  the running threshold their postings are only *gathered* for current
  candidates via block-selective decode (``codec.decode_blocks``) —
  blocks whose block-max bound cannot matter are never decoded;
* the coalesce cascade (``api/search/ESCoalesce.java:30-64``) runs plan
  variants in order and returns the first non-empty top-k.

All arithmetic is float64; ranking ties break (score desc, doc_id asc)
— the conventions pinned in ``functions/bm25.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..functions import bm25
from ..functions.codec import decode_blocks
from ..state.reader import IndexReader, TermPostings

EMPTY_I = np.empty(0, dtype=np.int64)
EMPTY_F = np.empty(0, dtype=np.float64)


# ---------------------------------------------------------------------------
# plan nodes
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    """Single-term BM25 leaf.  ``field`` scopes the term to an extra
    indexed field (reference multi-field mapping: name/street/locality
    score as separate ES text fields with separate length norms,
    ``es_mappings/addr_row.json:41-121``); None = the main content
    field.  Field-scoped terms live in the same postings segments under
    the ``<field>\\x1e<term>`` key and score with the FIELD's dl/avgdl.
    """

    term: str
    boost: float = 1.0
    field: Optional[str] = None


@dataclass(frozen=True)
class Prefix:
    """Constant-score prefix match (reference Q3: unscored)."""

    prefix: str
    boost: float = 1.0
    max_expansions: int = 128


@dataclass(frozen=True)
class Bool:
    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()
    filter: tuple = ()
    minimum_should_match: int = 0
    boost: float = 1.0
    name: Optional[str] = None


@dataclass(frozen=True)
class DisMax:
    children: tuple
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScore:
    child: object
    score: float = 1.0


@dataclass(frozen=True)
class ColumnFilter:
    """Non-scoring doc-store predicate (reference Q4/Q13 analog:
    keyword terms filter / structured repo-lang filters)."""

    column: str
    values: tuple


@dataclass(frozen=True)
class RangeFilter:
    """Non-scoring numeric range predicate on a doc-store column
    (reference Q7's ``housenumber_number ∈ [n−16, n+16]`` branch,
    ``builders/HousenumbersPart.java:42-81``)."""

    column: str
    lo: float
    hi: float


@dataclass(frozen=True)
class Fuzzy:
    """Edit-distance-1 term expansion (reference Q2 ``fuzziness("1")``,
    ``builders/MatchPart.java:19-81``): the union of postings of every
    dictionary term within Damerau-Levenshtein distance ≤ 1, each
    scored by its own BM25 (like ES's rewritten fuzzy query)."""

    term: str
    boost: float = 1.0
    max_expansions: int = 50


@dataclass(frozen=True)
class FunctionScore:
    """score' = score * doc_prior * weight (reference Q6:
    ``_score * base_score * w`` — DisMaxUnion.java:42-45)."""

    child: object
    weight: float = 1.0
    prior_column: str = "base_score"


# ---------------------------------------------------------------------------
# sorted-array set/score algebra (all exact, all vectorized)
# ---------------------------------------------------------------------------


def _union_sum(parts: list[tuple[np.ndarray, np.ndarray]]):
    parts = [p for p in parts if p[0].size]
    if not parts:
        return EMPTY_I, EMPTY_F
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    u, inv = np.unique(docs, return_inverse=True)
    acc = np.zeros(u.size, dtype=np.float64)
    np.add.at(acc, inv, scores)
    return u, acc


def _union_counts(parts: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    parts = [p for p in parts if p.size]
    if not parts:
        return EMPTY_I, EMPTY_I
    docs = np.concatenate(parts)
    return np.unique(docs, return_counts=True)


def _union_max(parts, tie_breaker: float):
    parts = [p for p in parts if p[0].size]
    if not parts:
        return EMPTY_I, EMPTY_F
    docs = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    u, inv = np.unique(docs, return_inverse=True)
    mx = np.full(u.size, -np.inf)
    np.maximum.at(mx, inv, scores)
    if tie_breaker:
        s = np.zeros(u.size)
        np.add.at(s, inv, scores)
        mx = mx + tie_breaker * (s - mx)
    return u, mx


def _intersect(a_docs, a_scores, b_docs, b_scores):
    """Intersection of two SORTED unique doc arrays via searchsorted —
    O(m log n), no re-sort (np.intersect1d would sort the concat)."""
    if a_docs.size == 0 or b_docs.size == 0:
        return EMPTY_I, EMPTY_F
    if a_docs.size < b_docs.size:
        a_docs, a_scores, b_docs, b_scores = b_docs, b_scores, a_docs, a_scores
    idx = np.searchsorted(a_docs, b_docs)
    idx_c = np.minimum(idx, a_docs.size - 1)
    hit = a_docs[idx_c] == b_docs
    return b_docs[hit], a_scores[idx_c[hit]] + b_scores[hit]


def _in_sorted(docs: np.ndarray, members: np.ndarray) -> np.ndarray:
    """Boolean mask: docs[i] ∈ members (both sorted unique)."""
    if members.size == 0:
        return np.zeros(docs.size, dtype=bool)
    idx = np.minimum(np.searchsorted(members, docs), members.size - 1)
    return members[idx] == docs


def _gather_scores(docs, src_docs, src_scores):
    """Scores of ``docs`` found in (src_docs sorted, src_scores); 0 else."""
    out = np.zeros(docs.size, dtype=np.float64)
    idx = np.searchsorted(src_docs, docs)
    idx_c = np.minimum(idx, max(src_docs.size - 1, 0))
    if src_docs.size:
        hit = src_docs[idx_c] == docs
        out[hit] = src_scores[idx_c[hit]]
    return out


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


class QueryEngine:
    def __init__(self, reader: IndexReader, k1: float = bm25.K1, b: float = bm25.B):
        self.reader = reader
        self.k1 = k1
        self.b = b
        self._term_eval_cache: dict[tuple[str, float], tuple] = {}
        self._filter_cache: dict[tuple, np.ndarray] = {}
        self._ub_cache: dict[str, float] = {}
        self._pos_cache: dict[str, np.ndarray] = {}
        # leaf cache for the float32 approximate pre-pass: child key →
        # (doc positions int32, scores float32, max score).  Halves the
        # per-query scatter/read bytes vs the float64 arrays — the
        # engine's per-query memory traffic is THE scaling bottleneck on
        # bandwidth-bound machines (round-3 finding); exactness is
        # restored by a float64 rescore of the ±bound candidate band.
        from collections import OrderedDict

        self._leaf32_cache: OrderedDict[tuple, tuple] = OrderedDict()
        self._leaf32_bytes: int = 0
        # byte (not count) budget: one df≈n leaf at the 32M-doc shard
        # bound pins ~0.5 GB of positions+f32+f64 arrays, so a count cap
        # alone can exceed the per-actor accumulator budget 1000×
        self.leaf32_budget: int = 1 << 30
        # A/B switch for the float32 pre-pass (bench evidence + safety
        # valve); results are bit-identical either way
        self.approx32: bool = True
        # top-k request cache (the ES shard-request-cache analog,
        # IndicesRequestCache): plan nodes are frozen dataclasses →
        # hashable; the index is immutable under a reader, so caching
        # (plan, k) → (docs, scores) is exact.  Real query streams are
        # Zipfian — repeated plans should cost a dict hit, not a fresh
        # accumulator pass.  LRU-bounded; set topk_cache_size=0 to
        # disable (bench cache-off mode).
        self._topk_cache: OrderedDict[tuple, tuple] = OrderedDict()
        self.topk_cache_size: int = 4096
        # dense-vector cache for VERY hot leaves (df·8 ≥ n): per leaf a
        # full-width float32 score vector + uint8 presence vector, so
        # the per-query accumulate is a pure SIMD `acc += vec` / `cnt +=
        # pres` instead of a fancy-index scatter (~20× fewer ns/element
        # measured on 300k-df terms).  Size-budgeted: at 32M-doc shards
        # one vector is 128 MB, so only the hottest few terms fit — the
        # rest stay on the scatter path, same results.
        self._densevec_cache: OrderedDict[tuple, tuple] = OrderedDict()
        self._densevec_bytes: int = 0
        self.densevec_budget: int = 1 << 30
        # reusable dense accumulator (one per engine ≙ per actor); the
        # dense path is only entered when the accumulator fits the
        # per-actor budget (float64/doc: 32M docs ≙ 256 MB) — giant
        # shards stay on the sparse pruned path however hot the terms
        self.dense_doc_cap: int = 32_000_000
        self._acc: np.ndarray | None = None
        # term → GLOBAL doc frequency, injected by a sharded-query
        # coordinator (ES dfs_query_then_fetch analog): a shard actor's
        # local postings see only local df, but BM25 IDF must use the
        # cross-shard df for rank-identity with an unsharded index.
        # Assign (don't mutate in place) — the setter fingerprints the
        # map so the request cache never crosses df epochs.
        self._df_override: dict[str, int] = {}
        self._df_fp: frozenset | None = None

    @property
    def df_override(self) -> dict[str, int]:
        return self._df_override

    @df_override.setter
    def df_override(self, value: dict[str, int]) -> None:
        self._df_override = dict(value)
        # folded into the _topk_cache key: a cached top-k computed under
        # one global-df map must not serve a query under another
        self._df_fp = frozenset(self._df_override.items()) or None

    def _df(self, term: str, tp: TermPostings) -> int:
        return self._df_override.get(term, tp.df)

    @staticmethod
    def _term_key(node: Term) -> str:
        """Posting-dictionary key of a Term leaf: plain term for the
        main content field, ``<field>\\x1e<term>`` for extra fields."""
        from ..stages.tokenize import FIELD_SEP

        return node.term if node.field is None else \
            node.field + FIELD_SEP + node.term

    # -- term scoring ----------------------------------------------------

    def _score_tf(self, docs: np.ndarray, tfs: np.ndarray, df: int,
                  field: str | None = None) -> np.ndarray:
        dl = self.reader.dl_of(docs, field)
        return bm25.term_scores(
            tfs, dl, df, self.reader.n_docs, self.reader.avgdl_of(field),
            self.k1, self.b
        )

    def seed_term(self, term: str, docs: np.ndarray, tfs: np.ndarray,
                  df: int) -> None:
        """Warm the term caches from externally-decoded postings — the
        shared-warm path: one pool actor decodes, the arrays travel the
        object store once, and every actor seeds zero-copy views
        instead of re-reading + re-decoding the row groups.  Scoring
        runs locally through the exact ``eval_term`` arithmetic, so
        seeded and self-computed results are bit-identical."""
        df_eff = self.df_override.get(term, df)
        key = (term, 1.0, df_eff)
        if key not in self._term_eval_cache and \
                len(self._term_eval_cache) < 1024:
            self._term_eval_cache[key] = (
                docs, self._score_tf(docs, tfs, df_eff))

    def eval_term(self, node: Term):
        tkey = self._term_key(node)
        tp = self.reader.posting(tkey)
        df = self._df(tkey, tp) if tp is not None else 0
        # cache key includes the effective df so coordinator-injected
        # global stats (sharded mode) never serve stale scores
        key = (tkey, node.boost, df)
        hit = self._term_eval_cache.get(key)
        if hit is not None:
            return hit
        if tp is None:
            res = (EMPTY_I, EMPTY_F)
        else:
            docs, tfs = self.reader.decode_all(tp)
            res = (docs,
                   node.boost * self._score_tf(docs, tfs, df, node.field))
        if len(self._term_eval_cache) < 1024:
            self._term_eval_cache[key] = res
        return res

    # -- generic exact evaluation ---------------------------------------

    def evaluate(self, node) -> tuple[np.ndarray, np.ndarray]:
        """(sorted doc_ids, float64 scores) of every matching doc."""
        if isinstance(node, Term):
            return self.eval_term(node)
        if isinstance(node, Prefix):
            ckey = ("__prefix__" + node.prefix, float(node.boost) * 1e9 + node.max_expansions)
            hit = self._term_eval_cache.get(ckey)
            if hit is not None:
                return hit
            res = self._eval_prefix(node)
            if len(self._term_eval_cache) < 1024:
                self._term_eval_cache[ckey] = res
            return res
        if isinstance(node, ConstantScore):
            docs, _ = self.evaluate(node.child)
            return docs, np.full(docs.size, float(node.score))
        if isinstance(node, ColumnFilter):
            key = ("col", node.column, node.values)
            docs = self._filter_cache.get(key)
            if docs is None:
                docs = self.reader.docs_matching(node.column, node.values)
                if len(self._filter_cache) < 256:
                    self._filter_cache[key] = docs
            return docs, np.zeros(docs.size)
        if isinstance(node, RangeFilter):
            key = ("rng", node.column, node.lo, node.hi)
            docs = self._filter_cache.get(key)
            if docs is None:
                docs = self.reader.docs_in_range(node.column, node.lo, node.hi)
                if len(self._filter_cache) < 256:
                    self._filter_cache[key] = docs
            return docs, np.zeros(docs.size)
        if isinstance(node, Fuzzy):
            terms = self.reader.fuzzy_terms(node.term, node.max_expansions)
            parts = [self.eval_term(Term(t, node.boost)) for t in terms]
            return _union_sum(parts)
        if isinstance(node, DisMax):
            parts = [self.evaluate(c) for c in node.children]
            docs, scores = _union_max(parts, node.tie_breaker)
            return docs, scores * node.boost
        if isinstance(node, FunctionScore):
            docs, scores = self.evaluate(node.child)
            if docs.size:
                prior = self.reader.column_of(docs, node.prior_column).astype(np.float64)
                scores = scores * prior * node.weight
            return docs, scores
        if isinstance(node, Bool):
            return self._eval_bool(node)
        raise TypeError(f"unknown plan node {type(node)}")

    def _eval_prefix(self, node: Prefix):
        terms = self.reader.prefix_terms(node.prefix, node.max_expansions)
        doc_sets = []
        for t in terms:
            tp = self.reader.posting(t)
            if tp:
                doc_sets.append(self.reader.decode_all(tp)[0])
        if not doc_sets:
            return EMPTY_I, EMPTY_F
        u = np.unique(np.concatenate(doc_sets))
        return u, np.full(u.size, float(node.boost))

    # -- dense boolean evaluation (hot-term fast path) -------------------

    def _positions_for(self, child, docs: np.ndarray) -> np.ndarray:
        """Doc-store row positions of a child's match docs; cached for
        Term/Prefix leaves (the recurring cascade children)."""
        if isinstance(child, Term):
            return self._term_positions(self._term_key(child), docs)
        if isinstance(child, Prefix):
            key = "\x00pfx\x00" + child.prefix
            pos = self._pos_cache.get(key)
            if pos is None:
                pos = np.searchsorted(self.reader.doc_ids, docs)
                if len(self._pos_cache) < 4096:
                    self._pos_cache[key] = pos
            return pos
        return np.searchsorted(self.reader.doc_ids, docs)

    def _bool_mass(self, node: Bool) -> int:
        """Posting mass of the Term leaves (cheap upper-bound signal
        for choosing dense vs sorted-merge evaluation)."""
        mass = 0
        for child in (*node.must, *node.should):
            if isinstance(child, Term):
                tp = self.reader.posting(self._term_key(child))
                if tp is not None:
                    mass += tp.df
        return mass

    def _eval_bool_dense(self, node: Bool):
        """Dense-array boolean evaluation: scores scatter into one
        accumulator over the doc space, set logic becomes boolean-array
        ops — no sorts, no searchsorted merges (each leaf's positions
        are cached).  Exact same results and float summation order as
        the sorted-merge path (differentially tested); engaged only when
        the posting mass rivals the doc space, where sorted merges are
        memory-bandwidth-bound (the round-1 QPS-scaling bottleneck)."""
        n = self.reader.doc_ids.size
        # re-entrancy guard: a nested Bool child evaluated below may
        # itself take the dense path — only the outermost call may use
        # the shared scratch buffers
        reentrant = getattr(self, "_acc_busy", False)
        if reentrant:
            acc = np.zeros(n, dtype=np.float64)
        else:
            if self._acc is None or self._acc.size != n:
                self._acc = np.zeros(n, dtype=np.float64)
            acc = self._acc
            acc.fill(0.0)
            self._acc_busy = True
        try:
            return self._eval_bool_dense_inner(node, acc, n, reentrant)
        finally:
            if not reentrant:
                self._acc_busy = False

    def _eval_bool_dense_inner(self, node: Bool, acc, n: int, reentrant: bool):
        if len(node.must) == 1:
            # presence needs no counter: one bool scatter
            cd, cs = self.evaluate(node.must[0])
            pos = self._positions_for(node.must[0], cd)
            acc[pos] += cs
            mask = np.zeros(n, dtype=bool)
            mask[pos] = True
        elif node.must:
            cnt = np.zeros(n, dtype=np.int16)
            for child in node.must:
                cd, cs = self.evaluate(child)
                pos = self._positions_for(child, cd)
                cnt[pos] += 1
                acc[pos] += cs
            mask = cnt == len(node.must)
        else:
            mask = None

        for child in node.filter:
            fd, _ = self.evaluate(child)
            fmask = np.zeros(n, dtype=bool)
            fmask[self._positions_for(child, fd)] = True
            mask = fmask if mask is None else (mask & fmask)

        acc_s = None
        if node.should:
            # separate should accumulator so the float sum is
            # (Σmust) + (Σshould) — bit-identical to the sparse path's
            # `scores += gather(should_union)` association
            if node.must:
                if reentrant:
                    acc_s = np.zeros(n, dtype=np.float64)
                else:
                    if getattr(self, "_acc2", None) is None or self._acc2.size != n:
                        self._acc2 = np.zeros(n, dtype=np.float64)
                    acc_s = self._acc2
                    acc_s.fill(0.0)
            else:
                acc_s = acc
            s_cnt = np.zeros(n, dtype=np.int16) if (
                node.minimum_should_match > 0 or mask is None
            ) else None
            for child in node.should:
                sd, ss = self.evaluate(child)
                pos = self._positions_for(child, sd)
                acc_s[pos] += ss
                if s_cnt is not None:
                    s_cnt[pos] += 1
            if mask is None:
                eff = max(1, node.minimum_should_match)
                mask = s_cnt >= eff
            elif node.minimum_should_match > 0:
                mask = mask & (s_cnt >= node.minimum_should_match)

        if mask is None:
            return EMPTY_I, EMPTY_F

        for child in node.must_not:
            nd, _ = self.evaluate(child)
            if nd.size:
                mask[self._positions_for(child, nd)] = False

        hit = np.flatnonzero(mask)
        scores = acc[hit].copy()
        if acc_s is not None and acc_s is not acc:
            scores += acc_s[hit]
        if node.boost != 1.0:
            scores *= node.boost
        return self.reader.doc_ids[hit], scores

    def _eval_bool(self, node: Bool):
        # single-clause rewriting (the ES query-planner identity): a
        # bool with exactly one scoring clause IS that clause — serves
        # straight from the leaf cache, no accumulators, no merges
        if (len(node.must) == 1 and not node.filter and not node.should
                and not node.must_not):
            d, s = self.evaluate(node.must[0])
            return (d, s * node.boost) if node.boost != 1.0 else (d, s)
        if (len(node.should) == 1 and not node.must and not node.filter
                and not node.must_not and node.minimum_should_match <= 1):
            d, s = self.evaluate(node.should[0])
            return (d, s * node.boost) if node.boost != 1.0 else (d, s)
        # dense fast path: worthwhile once the leaves' posting mass is a
        # sizeable fraction of the doc space (hot-term conjunctions /
        # disjunctions); tiny queries stay on the sorted-merge path
        n = self.reader.doc_ids.size
        if (
            getattr(self, "dense_enabled", True)
            and 0 < n <= self.dense_doc_cap
            and self._bool_mass(node) * 4 >= n
        ):
            return self._eval_bool_dense(node)
        docs: np.ndarray | None = None
        scores: np.ndarray | None = None
        if node.must:
            parts = [self.evaluate(c) for c in node.must]
            # membership: intersect smallest-first (cheapest); scores:
            # summed in ORIGINAL child order over the final doc set so
            # the float summation order stays the pinned convention
            order = sorted(range(len(parts)), key=lambda i: parts[i][0].size)
            docs = parts[order[0]][0]
            for i in order[1:]:
                docs = docs[_in_sorted(docs, parts[i][0])]
                if docs.size == 0:
                    return EMPTY_I, EMPTY_F
            if docs.size == 0:
                return EMPTY_I, EMPTY_F
            scores = np.zeros(docs.size, dtype=np.float64)
            for pd_, ps_ in parts:
                scores += _gather_scores(docs, pd_, ps_)

        for child in node.filter:
            fd, _ = self.evaluate(child)
            if docs is None:
                docs, scores = fd, np.zeros(fd.size)
            else:
                hit = _in_sorted(docs, fd)
                docs, scores = docs[hit], scores[hit]
            if docs.size == 0:
                return EMPTY_I, EMPTY_F

        if node.should:
            sparts = [self.evaluate(c) for c in node.should]
            s_docs, s_scores = _union_sum(sparts)
            msm = node.minimum_should_match
            if docs is None:
                # pure disjunction: msm defaults to 1
                eff = max(1, msm)
                if eff > 1:
                    c_docs, counts = _union_counts([p[0] for p in sparts])
                    keep = c_docs[counts >= eff]
                    docs = keep
                    scores = _gather_scores(keep, s_docs, s_scores)
                else:
                    docs, scores = s_docs, s_scores
            else:
                # should adds score but doesn't constrain — unless msm>0
                if msm > 0:
                    c_docs, counts = _union_counts([p[0] for p in sparts])
                    ok = c_docs[counts >= msm]
                    hit = _in_sorted(docs, ok)
                    docs, scores = docs[hit], scores[hit]
                if docs.size:
                    scores = scores + _gather_scores(docs, s_docs, s_scores)

        if docs is None:
            return EMPTY_I, EMPTY_F

        for child in node.must_not:
            nd, _ = self.evaluate(child)
            if nd.size:
                mask = ~_in_sorted(docs, nd)
                docs, scores = docs[mask], scores[mask]

        return docs, scores * node.boost

    # -- matched-part attribution (reference `_name` tags) ----------------

    def named_parts(self, node) -> list[tuple[str, object]]:
        """All named sub-plans, in plan order (reference: ``_name`` tags
        on query parts, ``builders/BooleanPart.java:8-103`` — they drive
        ``matched_queries`` in hits, ``api/ResultsWrapper.java:27-40``,
        and the Q16 trim)."""
        out: list[tuple[str, object]] = []

        def walk(n):
            if isinstance(n, Bool):
                if n.name:
                    out.append((n.name, n))
                for group in (n.must, n.should, n.must_not, n.filter):
                    for c in group:
                        walk(c)
            elif isinstance(n, DisMax):
                for c in n.children:
                    walk(c)
            elif isinstance(n, (ConstantScore, FunctionScore)):
                walk(n.child)

        walk(node)
        return out

    def matched_queries(self, node, docs: np.ndarray) -> list[list[str]]:
        """Per-doc list of named-part names the doc matches — the
        engine-level ``matched_queries`` bookkeeping."""
        names = self.named_parts(node)
        flags = []
        for name, part in names:
            pd_, _ = self.evaluate(part)
            flags.append((name, _in_sorted(docs, pd_)))
        return [
            [name for name, m in flags if m[i]] for i in range(docs.size)
        ]

    # -- top-k -----------------------------------------------------------

    def _topk(self, docs: np.ndarray, scores: np.ndarray, k: int,
              secondary: np.ndarray | None = None):
        """(score desc[, secondary asc], doc_id asc) tie-break,
        vectorized.  ``secondary`` (aligned with docs) is the analog of
        the reference's secondary geo-distance sort
        (``api/search/ESCoalesce.java:50``)."""
        if docs.size == 0:
            return docs, scores
        if docs.size > k:
            # keep every doc tied with the kth score so the tie-break
            # keys are applied over the full tie group (rank-identity)
            kth = -np.partition(-scores, k - 1)[k - 1]
            mask = scores >= kth
            docs, scores = docs[mask], scores[mask]
            if secondary is not None:
                secondary = secondary[mask]
        keys = (docs, -scores) if secondary is None else (docs, secondary, -scores)
        order = np.lexsort(keys)[:k]
        return docs[order], scores[order]

    def top_k_sorted(self, node, k: int = 20, secondary_col: str | None = None):
        """Top-k with a secondary doc-store sort key (score desc,
        column asc, doc_id asc) — Q15's geoDistanceSort analog."""
        if secondary_col is None:
            return self.top_k(node, k)
        full_docs, full_scores = self.evaluate(node)
        if full_docs.size == 0:
            return full_docs, full_scores
        sec_all = (
            self.reader.dl_of(full_docs)
            if secondary_col == "dl"
            else self.reader.column_of(full_docs, secondary_col)
        ).astype(np.float64)
        return self._topk(full_docs, full_scores, k, secondary=sec_all)

    def top_k_geo_sorted(self, node, k: int = 20,
                         origin: tuple[float, float] = (0.0, 0.0),
                         lat_col: str = "lat", lon_col: str = "lon"):
        """Top-k with a TRUE haversine secondary sort: (score desc,
        great-circle distance from ``origin`` asc, doc_id asc) — the
        reference's ``geoDistanceSort("centroid")``
        (``api/search/ESCoalesce.java:50``) over lat/lon doc-store
        columns (carried by ``DOCMETA_CARRY`` when present in the
        corpus)."""
        from ..functions.geo import haversine_km

        full_docs, full_scores = self.evaluate(node)
        if full_docs.size == 0:
            return full_docs, full_scores
        lat = self.reader.column_of(full_docs, lat_col).astype(np.float64)
        lon = self.reader.column_of(full_docs, lon_col).astype(np.float64)
        dist = haversine_km(lat, lon, origin[0], origin[1])
        return self._topk(full_docs, full_scores, k, secondary=dist)

    def top_k(self, node, k: int = 20) -> tuple[np.ndarray, np.ndarray]:
        """Top-k of any plan, through the LRU request cache (callers
        must not mutate the returned arrays — slice/copy instead)."""
        ckey = None
        if self.topk_cache_size:
            try:
                ckey = (node, k, self._df_fp)
                hit = self._topk_cache.get(ckey)
            except TypeError:  # unhashable custom node
                ckey, hit = None, None
            if hit is not None:
                self._topk_cache.move_to_end(ckey)
                return hit
        res = self._top_k_uncached(node, k)
        if ckey is not None:
            self._topk_cache[ckey] = res
            if len(self._topk_cache) > self.topk_cache_size:
                self._topk_cache.popitem(last=False)
        return res

    def _top_k_uncached(self, node, k: int) -> tuple[np.ndarray, np.ndarray]:
        if (
            isinstance(node, Bool)
            and node.should
            and not node.must
            and not node.must_not
            and node.minimum_should_match <= 1
            and all(isinstance(c, Term) for c in node.should)
            and node.boost == 1.0
        ):
            if not node.filter:
                return self.top_k_disjunction([c for c in node.should], k)
            if node.minimum_should_match == 1 and all(
                isinstance(f, (ColumnFilter, RangeFilter)) for f in node.filter
            ):
                # msm==0 stays on the exact path: filter-only docs score 0
                # but ARE hits there (should adds score, doesn't constrain)
                # — the pruned disjunction would drop them
                # filtered disjunction: the MaxScore loop runs over the
                # filter-restricted posting arrays (the round-1 fallback
                # was exhaustive evaluate for any Bool with filters)
                fdocs: np.ndarray | None = None
                for f in node.filter:
                    fd, _ = self.evaluate(f)
                    fdocs = fd if fdocs is None else fd[_in_sorted(fd, fdocs)]
                    if fdocs.size == 0:
                        return EMPTY_I, EMPTY_F
                return self.top_k_disjunction(
                    [c for c in node.should], k, filter_docs=fdocs
                )
        if isinstance(node, Bool):
            res = self._topk_bool_approx(node, k)
            if res is not None:
                return res
        docs, scores = self.evaluate(node)
        return self._topk(docs, scores, k)

    # -- block-max pruned disjunction (MaxScore/WAND family) -------------

    def _term_ub(self, tp: TermPostings, df: int | None = None,
                 field: str | None = None) -> float:
        df = tp.df if df is None else df
        ub = 0.0
        for p in tp.parts:
            if len(p["block_max_tf"]):
                b_ub = bm25.block_upper_bound(
                    p["block_max_tf"], p["block_min_dl"], df,
                    self.reader.n_docs, self.reader.avgdl_of(field),
                    self.k1, self.b,
                )
                ub = max(ub, float(np.max(b_ub)))
        return ub

    def _gather_term(self, tp: TermPostings, cand: np.ndarray, boost: float,
                     df: int | None = None,
                     field: str | None = None) -> np.ndarray:
        """Scores of ``cand`` docs for this term, decoding only the
        blocks that contain a candidate (block-selective skip read)."""
        out = np.zeros(cand.size, dtype=np.float64)
        for p in tp.parts:
            last = p["block_last_doc"]
            if len(last) == 0:
                continue
            # block index that could contain each candidate
            bidx = np.searchsorted(last, cand)
            valid = bidx < len(last)
            sel = np.unique(bidx[valid])
            if sel.size == 0:
                continue
            d, t = decode_blocks(p, sel, self.reader.block_size)
            idx = np.searchsorted(d, cand)
            idx_c = np.minimum(idx, d.size - 1)
            hit = (d[idx_c] == cand) & valid
            if hit.any():
                sc = self._score_tf(d[idx_c[hit]], t[idx_c[hit]],
                                    tp.df if df is None else df, field)
                out[hit] += boost * sc
        return out

    def _term_positions(self, term: str, docs: np.ndarray) -> np.ndarray:
        """Row positions of a term's (sorted) posting docs in the doc
        store — cached per term, so the dense path pays the searchsorted
        once per (actor, term), not per query."""
        pos = self._pos_cache.get(term)
        if pos is None:
            pos = np.searchsorted(self.reader.doc_ids, docs)
            if self.reader.doc_ids.size < 2**31:
                pos = pos.astype(np.int32)  # halves scatter-read bytes
            if len(self._pos_cache) < 4096:
                self._pos_cache[term] = pos
        return pos

    # -- float32 pre-pass (exact after float64 candidate rescore) --------

    _F32EPS = float(np.finfo(np.float32).eps)

    def _leaf32(self, child):
        """(positions, scores float32, smax, docs, scores float64) of a
        Term/Prefix leaf, cached.  The float32 copy halves the per-query
        scatter-read bytes — per-query memory traffic over hot-term
        arrays is the engine's scaling bottleneck on bandwidth-bound
        machines (round-3 measurement); the float64 originals stay
        referenced for the exact candidate rescore."""
        if isinstance(child, Term):
            tkey = self._term_key(child)
            tp = self.reader.posting(tkey)
            df = self._df(tkey, tp) if tp is not None else 0
            key = ("T", tkey, child.boost, df)
        elif isinstance(child, Prefix):
            key = ("P", child.prefix, child.boost, child.max_expansions)
        else:
            return None
        hit = self._leaf32_cache.get(key)
        if hit is not None:
            self._leaf32_cache.move_to_end(key)
            return hit
        d, s = self.evaluate(child)
        pos = self._positions_for(child, d)
        res = (pos, s.astype(np.float32),
               float(s.max()) if s.size else 0.0, d, s)
        nbytes = pos.nbytes + res[1].nbytes + d.nbytes + s.nbytes
        if nbytes <= self.leaf32_budget:
            while self._leaf32_bytes + nbytes > self.leaf32_budget \
                    and self._leaf32_cache:
                _, old = self._leaf32_cache.popitem(last=False)
                self._leaf32_bytes -= (old[0].nbytes + old[1].nbytes
                                       + old[3].nbytes + old[4].nbytes)
            self._leaf32_cache[key] = res
            self._leaf32_bytes += nbytes
        return res

    def _leaf_dense(self, child, lf) -> tuple | None:
        """(float32 score vector over the doc space, uint8 presence
        vector) for a hot leaf, cached under the dense-vector budget;
        None when the leaf is too rare to pay off or the budget is
        spent (caller scatters instead)."""
        n = self.reader.doc_ids.size
        pos = lf[0]
        if pos.size * 8 < n:
            return None
        if isinstance(child, Term):
            tkey = self._term_key(child)
            tp = self.reader.posting(tkey)
            df = self._df(tkey, tp) if tp is not None else 0
            # effective df in the key (mirrors _leaf32): a dense vector
            # baked under one coordinator-injected global df must not
            # serve a query running under another
            key = ("T", tkey, child.boost, df)
        elif isinstance(child, Prefix):
            key = ("P", child.prefix, child.boost, child.max_expansions)
        else:
            return None
        hit = self._densevec_cache.get(key)
        if hit is not None:
            self._densevec_cache.move_to_end(key)
            return hit
        need = n * 5  # 4B score + 1B presence
        if need > self.densevec_budget:
            return None
        while self._densevec_bytes + need > self.densevec_budget \
                and self._densevec_cache:
            self._densevec_cache.popitem(last=False)  # LRU evict
            self._densevec_bytes -= need  # entries are uniform n*5
        vec = np.zeros(n, dtype=np.float32)
        vec[pos] = lf[1]
        pres = np.zeros(n, dtype=np.uint8)
        pres[pos] = 1
        self._densevec_cache[key] = (vec, pres)
        self._densevec_bytes += need
        return vec, pres

    def _select_band(self, acc: np.ndarray, mask, k: int, bound: float):
        """Candidate positions from the float32 accumulator WITHOUT
        materializing the full hit list: zero out non-mask slots (every
        masked doc has a positive score — all leaves are non-negative
        BM25/constant scores and the mask requires ≥1 scoring match),
        then one partition for the approximate kth and one flatnonzero
        over the band.  Docs within 2×bound of the kth survive, so the
        exact top-k and its ties always reach the float64 rescore."""
        if mask is not None:
            np.multiply(acc, mask, out=acc)
        n = acc.size
        if n > k:
            # kth over the FULL array: zeros rank below every real match
            # (scores are positive), so kth > 0 ⟺ ≥k matches exist — no
            # separate count_nonzero pass
            kth = float(np.partition(acc, n - k)[n - k])
            thr = kth - 2.0 * bound
            if kth > 0 and thr > 0:
                # one ulp down so the float32 compare can't exclude a
                # boundary candidate
                t32 = np.nextafter(np.float32(thr), np.float32(-np.inf))
                return np.flatnonzero(acc >= t32)
        cand = np.flatnonzero(acc)
        return cand if cand.size else None

    def _acc32_buf(self, n: int) -> np.ndarray:
        buf = getattr(self, "_acc32", None)
        if buf is None or buf.size != n:
            self._acc32 = buf = np.zeros(n, dtype=np.float32)
        else:
            buf.fill(0.0)
        return buf

    def _cnt8_buf(self, n: int) -> np.ndarray:
        buf = getattr(self, "_cnt8", None)
        if buf is None or buf.size != n:
            self._cnt8 = buf = np.zeros(n, dtype=np.uint8)
        else:
            buf.fill(0)
        return buf

    def _rescore_exact(self, cand: np.ndarray, leaves_must: list,
                       leaves_should: list = ()) -> np.ndarray:
        """Float64 scores of candidate positions with the pinned float
        association: must children summed in child order, should children
        summed into their own accumulator in child order, then added as
        ONE addend — exactly the sparse path's ``Σmust +
        gather(union_sum(should))`` and the dense path's ``acc[hit] +
        acc_s[hit]``, so the result is bit-identical to both."""
        docs = self.reader.doc_ids[cand]
        scores = np.zeros(docs.size, dtype=np.float64)
        for _child, lf in leaves_must:
            scores += _gather_scores(docs, lf[3], lf[4])
        if leaves_should:
            s_acc = np.zeros(docs.size, dtype=np.float64)
            for _child, lf in leaves_should:
                s_acc += _gather_scores(docs, lf[3], lf[4])
            if leaves_must:
                scores += s_acc
            else:
                scores = s_acc
        return scores

    def _topk_bool_approx(self, node: Bool, k: int):
        """Exact top-k of a hot Bool plan through the float32 pre-pass:
        approximate dense accumulation (float32 scores, uint8 counters —
        ~half the scatter bytes of the float64 dense path), then an
        exact float64 rescore of only the ±bound candidate band around
        the approximate kth score.  Returns None when the plan shape
        doesn't qualify (caller falls back to the exact dense/sparse
        paths).  Output is bit-identical to exhaustive evaluation
        (differentially tested)."""
        n = self.reader.doc_ids.size
        if not self.approx32 or not getattr(self, "dense_enabled", True) \
                or not (0 < n <= self.dense_doc_cap):
            return None
        scoring = [*node.must, *node.should]
        # single scoring clause: the _eval_bool rewrite serves it straight
        # from the leaf cache — cheaper than any accumulator
        if (len(scoring) < 2
                or len(scoring) > 64
                or not all(isinstance(c, (Term, Prefix)) for c in scoring)
                or not all(isinstance(f, (ColumnFilter, RangeFilter))
                           for f in node.filter)
                or not all(isinstance(c, (Term, Prefix, ColumnFilter,
                                          RangeFilter))
                           for c in node.must_not)):
            return None
        if self._bool_mass(node) * 4 < n:
            return None  # rare terms: sparse merges are cheaper
        if node.filter and not node.must and node.minimum_should_match <= 0:
            # exact paths return filter-matching docs with score 0 when
            # no should clause hits (should adds score, doesn't
            # constrain); the candidate band is built from nonzero
            # accumulator slots and would drop them — fall back
            return None
        leaves_m = [(c, self._leaf32(c)) for c in node.must]
        leaves_s = [(c, self._leaf32(c)) for c in node.should]

        acc = self._acc32_buf(n)

        def accumulate(child, lf, cnt):
            dv = self._leaf_dense(child, lf)
            if dv is not None:  # SIMD adds, no fancy-index scatter
                np.add(acc, dv[0], out=acc)
                if cnt is not None:
                    np.add(cnt, dv[1], out=cnt)
            else:
                acc[lf[0]] += lf[1]
                if cnt is not None:
                    cnt[lf[0]] += 1

        if len(leaves_m) == 1:
            c0, lf0 = leaves_m[0]
            dv = self._leaf_dense(c0, lf0)
            if dv is not None:
                np.add(acc, dv[0], out=acc)
                mask = dv[1] != 0
            else:
                acc[lf0[0]] += lf0[1]
                mask = np.zeros(n, dtype=bool)
                mask[lf0[0]] = True
        elif leaves_m:
            cnt = self._cnt8_buf(n)
            for c, lf in leaves_m:
                accumulate(c, lf, cnt)
            mask = cnt == len(leaves_m)
        else:
            mask = None

        for child in node.filter:
            fd, _ = self.evaluate(child)
            fmask = np.zeros(n, dtype=bool)
            fmask[self._positions_for(child, fd)] = True
            mask = fmask if mask is None else (mask & fmask)

        if leaves_s:
            s_cnt = None
            if node.minimum_should_match > 0 or mask is None:
                s_cnt = np.zeros(n, dtype=np.uint8)
            for c, lf in leaves_s:
                accumulate(c, lf, s_cnt)
            if mask is None:
                mask = s_cnt >= max(1, node.minimum_should_match)
            elif node.minimum_should_match > 0:
                mask = mask & (s_cnt >= node.minimum_should_match)

        if mask is None:
            return EMPTY_I, EMPTY_F

        for child in node.must_not:
            nd, _ = self.evaluate(child)
            if nd.size:
                mask[self._positions_for(child, nd)] = False

        smax_sum = sum(lf[2] for _c, lf in (*leaves_m, *leaves_s))
        bound = 4.0 * len(scoring) * self._F32EPS * smax_sum
        cand = self._select_band(acc, mask, k, bound)
        if cand is None:
            return EMPTY_I, EMPTY_F
        scores = self._rescore_exact(cand, leaves_m, leaves_s)
        if node.boost != 1.0:
            scores *= node.boost
        return self._topk(self.reader.doc_ids[cand], scores, k)

    def _topk_dense(self, infos, k: int, filter_docs: np.ndarray | None):
        """Dense-accumulator disjunction through the float32 pre-pass:
        one float32 slot per doc, scores scattered with fancy-index adds
        (posting doc sets are unique per term), exact float64 rescore of
        the candidate band.  No sorts, no concatenations — per-query
        memory traffic is Σdf half-width scatter writes + one linear
        scan (the round-1 QPS-scaling bottleneck, halved again in
        round 4).  Rescore summation order = UB order, matching the
        pruned path's pinned convention."""
        n = self.reader.doc_ids.size
        if not self.approx32:  # legacy float64 accumulator (A/B baseline)
            if self._acc is None or self._acc.size != n:
                self._acc = np.zeros(n, dtype=np.float64)
            acc64 = self._acc
            acc64.fill(0.0)
            for node, tp, _ub in infos:
                d, s = self.eval_term(node)
                if d.size:
                    acc64[self._term_positions(self._term_key(node), d)] += s
            if filter_docs is not None:
                keep = np.zeros(n, dtype=bool)
                keep[np.searchsorted(self.reader.doc_ids, filter_docs)] = True
                hit = np.flatnonzero((acc64 != 0.0) & keep)
            else:
                hit = np.flatnonzero(acc64)
            return self._topk(self.reader.doc_ids[hit], acc64[hit].copy(), k)
        acc = self._acc32_buf(n)
        leaves = []
        smax_sum = 0.0
        for node, tp, _ub in infos:
            lf = self._leaf32(node)
            leaves.append((node, lf))
            dv = self._leaf_dense(node, lf)
            if dv is not None:
                np.add(acc, dv[0], out=acc)
            elif lf[0].size:
                acc[lf[0]] += lf[1]
            smax_sum += lf[2]
        mask = None
        if filter_docs is not None:
            mask = np.zeros(n, dtype=bool)
            mask[np.searchsorted(self.reader.doc_ids, filter_docs)] = True
        bound = 4.0 * len(leaves) * self._F32EPS * smax_sum
        cand = self._select_band(acc, mask, k, bound)
        if cand is None:
            return EMPTY_I, EMPTY_F
        scores = self._rescore_exact(cand, leaves)
        return self._topk(self.reader.doc_ids[cand], scores, k)

    def top_k_disjunction(self, terms: list[Term], k: int = 20,
                          filter_docs: np.ndarray | None = None):
        """Exact top-k of a sum-of-BM25 disjunction with MaxScore-style
        dynamic pruning + block-selective decoding.

        Invariant: a doc absent from all fully-evaluated terms has score
        ≤ sum of remaining upper bounds; once that sum < θ (current kth
        score), remaining terms are only gathered for known candidates.
        Result is identical to exhaustive evaluation (tested).
        ``filter_docs`` (sorted) restricts the disjunction to a
        non-scoring filter set (Q4/Q13 filters) while keeping pruning.
        """
        infos = []
        for node in terms:
            tkey = self._term_key(node)
            tp = self.reader.posting(tkey)
            if tp is not None:
                df = self._df(tkey, tp)
                ub_key = (tkey, df)
                ub = self._ub_cache.get(ub_key)
                if ub is None:
                    ub = self._term_ub(tp, df, node.field)
                    if len(self._ub_cache) < 8192:
                        self._ub_cache[ub_key] = ub
                infos.append((node, tp, node.boost * ub))
        if not infos:
            return EMPTY_I, EMPTY_F
        infos.sort(key=lambda x: -x[2])
        # hot disjunctions (posting mass ≳ doc space) score faster through
        # the dense accumulator than through sort-based merges; rare-term
        # queries stay on the pruned sparse path below
        total_df = sum(tp.df for _, tp, _ in infos)
        if (total_df * 4 >= self.reader.n_docs > 0
                and self.reader.doc_ids.size <= self.dense_doc_cap):
            return self._topk_dense(infos, k, filter_docs)
        ubs = np.array([x[2] for x in infos])
        docs = EMPTY_I
        scores = EMPTY_F
        theta = -np.inf
        i = 0
        for i, (node, tp, ub) in enumerate(infos):
            remaining = float(ubs[i:].sum())
            if scores.size >= k:
                theta = np.partition(scores, scores.size - k)[scores.size - k]
                # STRICT: a doc scoring exactly `remaining` could still
                # tie with the kth and win the doc_id tie-break
                if theta > remaining:
                    break
            # eval_term caches (docs, scores) per term — the decoded
            # arrays are reused across the whole replay instead of
            # re-paying varbyte decode + BM25 per query
            d, s = self.eval_term(node)
            if filter_docs is not None:
                m = _in_sorted(d, filter_docs)
                d, s = d[m], s[m]
            docs, scores = _union_sum([(docs, scores), (d, s)])
        else:
            i = len(infos)

        # gather phase: remaining terms contribute only to candidates
        if i < len(infos) and docs.size:
            rem_ub = float(ubs[i:].sum())
            cand_mask = scores + rem_ub >= theta
            cand = docs[cand_mask]
            cand_scores = scores[cand_mask].copy()
            for node, tp, _ub in infos[i:]:
                cand_scores += self._gather_term(
                    tp, cand, node.boost,
                    self._df(self._term_key(node), tp), node.field
                )
            docs, scores = cand, cand_scores
        return self._topk(docs, scores, k)
