"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is first-wins distinct-by-name (M15/Q11);
training-data pipelines at 100 TB need the full family.  Design rules:

* signatures are computed per batch, fully vectorized (one blake2b per
  token via a cached vocabulary dict, then numpy for the permutations);
* candidate generation is a ``groupby(band_id, band_hash)`` shuffle of
  SMALL signature rows — document text never travels through the
  shuffle;
* candidate pairs are verified from the signatures (estimate) or, for
  :func:`ngram_jaccard_pairs`, exactly from broadcast shingle sets
  (``ray.put`` once — valid while the shingle table fits the object
  store; at larger scale verification becomes a doc_id-bucketed join).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_hash64(tokens: list[str]) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in tokens
        ],
        dtype=np.uint64,
    )


def _shingles(text: str, n: int) -> list[str]:
    toks = (text or "").lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def add_sha256(ds, text_col: str = "text", out_col: str = "sha256"):
    def f(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256((x or "").encode("utf-8", "surrogatepass")).hexdigest()
            for x in t[text_col].to_pylist()
        ]
        return t.append_column(out_col, pa.array(hs, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partitioned exact dedup: keeper (min id) + group size per
    distinct content hash.  The groupby ships 80-byte hash rows, never
    the content."""
    from ray.data.aggregate import Count, Min

    hashed = add_sha256(ds.select_columns([id_col, text_col]), text_col)
    return (
        hashed.select_columns([id_col, "sha256"])
        .groupby("sha256")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="dup_count"))
    )


class MinHasher:
    """Per-batch MinHash signatures (actor state: permutation params)."""

    def __init__(self, num_perm: int = 64, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col
        self._token_cache: dict[str, int] = {}

    def _sig(self, text: str) -> np.ndarray:
        sh = set(_shingles(text, self.shingle_n))
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.uint64)
        cache = self._token_cache
        miss = [s for s in sh if s not in cache]
        if miss:
            for s, h in zip(miss, _stable_hash64(miss)):
                cache[s] = int(h)
        hs = np.array([cache[s] for s in sh], dtype=np.uint64)
        # universal hashing family (a*h + b) mod p, min per permutation
        vals = (hs[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self._sig(x) for x in t[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "sig": pa.array([s.astype(np.int64).tolist() for s in sigs],
                                 pa.list_(pa.int64())),
            }
        )


def minhash_signatures(ds, num_perm=64, shingle_n=3, text_col="text",
                       id_col="doc_id", concurrency: int = 2):
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _pairs_from_buckets(keys: np.ndarray, ids: np.ndarray,
                        max_bucket: int = 1000) -> np.ndarray:
    """All within-bucket (a<b) pairs, vectorized: sort by key, detect
    runs, expand each run's upper triangle.  NEVER a per-group Python
    callback — Ray's map_groups costs ~10ms/group, fatal at 10^4+
    buckets (measured)."""
    order = np.lexsort((ids, keys))
    k, i = keys[order], ids[order]
    heads = np.concatenate(([0], np.flatnonzero(np.diff(k) != 0) + 1, [k.size]))
    out_a, out_b = [], []
    for s, e in zip(heads[:-1], heads[1:]):
        n = e - s
        if n < 2 or n > max_bucket:
            continue
        ia, ib = np.triu_indices(n, k=1)
        out_a.append(i[s + ia])
        out_b.append(i[s + ib])
    if not out_a:
        return np.empty((0, 2), dtype=np.int64)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return np.unique(np.stack([lo, hi], axis=1), axis=0)


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle → minhash (distributed ``map_batches`` actor pool, the heavy
    stage) → banding + bucket-pair generation + signature verification
    on the collected signature table (num_perm×8B per doc — small by
    construction; at larger N the banding becomes a sorted-run pass like
    the postings merge, with the same vectorized run expansion).
    Returns columns (doc_a, doc_b, est_jaccard), doc_a < doc_b.
    """
    sigs = minhash_signatures(ds, num_perm, shingle_n, text_col, id_col)
    sig_tbl = sigs.to_pandas()
    ids = sig_tbl[id_col].to_numpy().astype(np.int64)
    sig_mat = np.array(sig_tbl["sig"].tolist(), dtype=np.int64)
    if ids.size == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "est_jaccard": pd.Series([], dtype="float64")})
    rows_per = num_perm // bands
    pair_set = []
    for b in range(bands):
        chunk = sig_mat[:, b * rows_per : (b + 1) * rows_per].astype(np.uint64)
        acc = np.zeros(ids.size, dtype=np.uint64)
        for c in range(rows_per):
            acc = acc * np.uint64(1099511628211) + chunk[:, c]
        pair_set.append(_pairs_from_buckets(acc.astype(np.int64), ids))
    pairs = np.unique(np.concatenate(pair_set), axis=0)
    if pairs.size == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "est_jaccard": pd.Series([], dtype="float64")})
    pos = {int(d): j for j, d in enumerate(ids)}
    ia = np.array([pos[int(d)] for d in pairs[:, 0]])
    ib = np.array([pos[int(d)] for d in pairs[:, 1]])
    est = (sig_mat[ia] == sig_mat[ib]).mean(axis=1)
    keep = est >= threshold
    return (
        pd.DataFrame(
            {"doc_a": pairs[keep, 0], "doc_b": pairs[keep, 1], "est_jaccard": est[keep]}
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


class SimHasher:
    """64-bit SimHash over token hashes (actor-pool stage)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[str, int] = {}

    def _hash(self, text: str) -> int:
        toks = (text or "").lower().split()
        if not toks:
            return 0
        cache = self._cache
        miss = [t for t in set(toks) if t not in cache]
        if miss:
            for t, h in zip(miss, _stable_hash64(miss)):
                cache[t] = int(h)
        hs = np.array([cache[t] for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = [self._hash(x) for x in t[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "simhash": pa.array(np.array(hs, dtype=np.uint64).astype(np.int64)),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", concurrency: int = 2):
    """Near-dup pairs by SimHash: 4×16-bit band grouping guarantees any
    pair with hamming ≤ 3 shares at least one exact band (pigeonhole);
    verify hamming within buckets.  Columns (doc_a, doc_b, hamming)."""
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    sig_tbl = sigs.to_pandas()
    ids = sig_tbl[id_col].to_numpy().astype(np.int64)
    hs = sig_tbl["simhash"].to_numpy().astype(np.uint64)
    if ids.size == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    pair_set = []
    for b in range(4):
        key = ((hs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        pair_set.append(_pairs_from_buckets(key, ids, max_bucket=2000))
    pairs = np.unique(np.concatenate(pair_set), axis=0)
    if pairs.size == 0:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    pos = {int(d): j for j, d in enumerate(ids)}
    ia = np.array([pos[int(d)] for d in pairs[:, 0]])
    ib = np.array([pos[int(d)] for d in pairs[:, 1]])
    x = hs[ia] ^ hs[ib]
    # vectorized popcount via byte-view + bit-count table
    ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)
    keep = ham <= max_hamming
    return (
        pd.DataFrame(
            {"doc_a": pairs[keep, 0], "doc_b": pairs[keep, 1], "hamming": ham[keep]}
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def ngram_jaccard_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
):
    """Exact n-gram Jaccard over MinHash-LSH candidates.

    Candidates from :func:`minhash_lsh_pairs` (low threshold), verified
    exactly against broadcast shingle sets.  Columns
    (doc_a, doc_b, jaccard ≥ threshold)."""
    import ray

    cands = minhash_lsh_pairs(
        ds, num_perm=num_perm, bands=bands, shingle_n=n,
        threshold=min(0.3, threshold), text_col=text_col, id_col=id_col,
    )
    sh_tbl = ds.select_columns([id_col, text_col]).to_pandas()
    shingle_map = {
        int(d): set(_shingles(t, n))
        for d, t in zip(sh_tbl[id_col], sh_tbl[text_col])
    }
    out_a, out_b, out_j = [], [], []
    for da, db in zip(cands["doc_a"], cands["doc_b"]):
        sa, sb = shingle_map[int(da)], shingle_map[int(db)]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(int(da))
            out_b.append(int(db))
            out_j.append(j)
    return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})
